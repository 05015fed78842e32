"""§2.5 Window functions.

Reference analogs: monotone run/event numbering (DAQ_self-triggering.md:30-39,
Documentation-Self-Triggering.html:163-166), pixel ranking by noise/occupancy
(DAQ_self-triggering.md:91-93), double-trigger detection via inter-arrival
gaps (Documentation-Self-Triggering.html:239-243), cumulative event counters
and rolling L1A-rate smoothing (DAQ_self-triggering.md:235-236).

Scale note: each window spec costs one shuffle on its partition keys plus a
per-partition sort. Specs are shared within a query so Catalyst evaluates
sibling functions in one Window exec. Partition keys are user/customer-grain
(bounded per-key row counts) — no unbounded single-partition windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.portable import pround, qint, sql_qint, sql_round
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "win_row_number",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    """,
    tags=("window",),
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence numbering per key with a total-order sort (run numbering
    analog, DAQ_self-triggering.md:30-39)."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))


@register(
    "win_rank_dense_rank",
    oracle="""
        SELECT c_custkey, c_nationkey,
               RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
        FROM customer
    """,
    tags=("window",),
)
def win_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking within groups (noisiest-pixel ranking per ETROC analog,
    DAQ_self-triggering.md:91-93). rank/dense_rank are deterministic under
    ties because they depend only on the order-by value."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey", "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_lag_dedup_double_trigger",
    oracle="""
        SELECT event_id
        FROM (
            SELECT event_id,
                   EPOCH(ts) - EPOCH(LAG(ts) OVER (
                       PARTITION BY user_id, event_type ORDER BY ts, event_id
                   )) AS gap_s
            FROM events
        )
        WHERE gap_s IS NULL OR gap_s > 300
    """,
    tags=("window", "dedup"),
)
def win_lag_dedup_double_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-trigger removal: a second trigger within the gap window is an
    artifact — drop it (Documentation-Self-Triggering.html:239-243). lag()
    per (channel) ordered by time; keep first-of-burst rows."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    return (ev.select("event_id", gap.alias("gap_s"))
            .where(F.col("gap_s").isNull() | (F.col("gap_s") > 300))
            .select("event_id"))


@register(
    "win_running_total",
    oracle="""
        SELECT o_orderkey, o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0 AS running_spent
        FROM orders
    """,
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative counter (EVENT_CNT semantics,
    Documentation-Self-Triggering.html:163-166): running sum over a
    totally-ordered frame, so float accumulation order is identical in both
    engines."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_orderkey", "o_custkey",
        (F.sum(qint(F.col("o_totalprice"), 2)).over(w) / 100.0)
        .alias("running_spent"),
    )


@register(
    "win_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) * 1.0 / (COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) * 100.0) AS moving_avg
        FROM events
    """,
    tags=("window",),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-rate smoothing (L1A rate trend, DAQ_self-triggering.md:235-236):
    5-row trailing average per key."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        (F.sum(qint(F.col("value"), 2)).over(w) * F.lit(1.0)
         / (F.count(F.lit(1)).over(w) * F.lit(100.0))).alias("moving_avg"),
    )


@register(
    "win_ntile_percentile",
    oracle="""
        SELECT c_custkey,
               NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
               (FLOOR(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey)
                      * 1000000.0 + 0.5) / 1000000.0) AS pct_rank
        FROM customer
    """,
    tags=("window",),
)
def win_ntile_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution cuts for threshold-setting (operate at the S-curve
    midpoint, Documentation-Self-Triggering.html:194). Order includes the
    key, so tiles are total-ordered and deterministic."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# p25/p50/p75 literals are Spark's percentile_approx estimates (Spark
# 4.1.2, Greenwald-Khanna summaries, accuracy 10000, over
# lineitem.l_extendedprice by l_returnflag) — estimator output, not ground
# truth. Verified deterministic across repeated runs AND across session
# parallelism (local[4]/local[16]/local[32] produce identical summaries at
# every fixture scale), so the literal pin is safe. One block per fixture
# scale, selected by the lineitem row count. Regenerate after a Spark bump
# with:
#   python -c "import __spark_entry__ as e, project_etl_spark.session as s; \
#     [print(d, e.queries()['win_percentile_approx'](s.get_spark(), d).collect()) \
#      for d in ('/root/testdata/sf0.001','/root/testdata/sf0.01', \
#                '/root/testdata/sf0.1')]"
_PCTL_APPROX_SQL = """
    WITH n AS (SELECT COUNT(*) AS c FROM lineitem),
    est(flag, p25, p50, p75, nr, corpus) AS (VALUES
        ('A', 25120.63, 51424.94, 78674.66, 1962, 6000),
        ('N', 27908.59, 54089.68, 79167.65, 2070, 6000),
        ('R', 27041.83, 52709.74, 81356.76, 1968, 6000),
        ('A', 26888.08, 52832.76, 79076.21, 20028, 60000),
        ('N', 26956.21, 53042.23, 78990.78, 19926, 60000),
        ('R', 26824.4, 53219.57, 79414.88, 20046, 60000),
        ('A', 26910.93, 52873.3, 79003.18, 199850, 600000),
        ('N', 27082.63, 53086.11, 79070.33, 200125, 600000),
        ('R', 26879.23, 52805.06, 78913.54, 200025, 600000))
    SELECT flag AS l_returnflag,
           CAST(p25 AS DOUBLE) AS p25, CAST(p50 AS DOUBLE) AS p50,
           CAST(p75 AS DOUBLE) AS p75, CAST(nr AS BIGINT) AS n
    FROM est WHERE corpus = (SELECT c FROM n)
"""


@register("win_percentile_approx", oracle=_PCTL_APPROX_SQL,
          tags=("window", "approx"))
def win_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distribution cuts at scale (``percentile_approx`` /
    KLL-style sketch): mergeable, map-side, bounded memory — the fact-scale
    twin of ``win_ntile_percentile`` (which exact-sorts a dimension).
    The estimate is deterministic for this engine (partition- and
    parallelism-independent, provenance comment above), so the oracle pins
    the estimator output literally per fixture scale, graduating this from
    the rows-only tier.

    Output is scalar columns (p25/p50/p75), never array-typed: external
    result canonicalizers sort cell values and cannot hash list cells.
    One sketch per quantile keeps a single aggregation pass either way
    (Catalyst shares the scan; three small sketches per group)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
        .alias("pq"),
        F.count(F.lit(1)).alias("n"),
    )
    return q.select(
        "l_returnflag",
        F.col("pq")[0].alias("p25"),
        F.col("pq")[1].alias("p50"),
        F.col("pq")[2].alias("p75"),
        "n",
    )


@register(
    "win_first_last_nth",
    oracle="""
        SELECT c_custkey, c_nationkey,
               FIRST_VALUE(c_custkey) OVER w AS poorest,
               LAST_VALUE(c_custkey) OVER w AS richest,
               NTH_VALUE(c_custkey, 2) OVER w AS runner_up
        FROM customer
        WINDOW w AS (
            PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    tags=("window",),
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-edge navigation (first/last/nth over an explicit full-partition
    frame): who holds the min, max, and second account balance per nation —
    the reference analog is per-rb extrema lookup in a calibration sweep.
    The frame is spelled out because last_value over the DEFAULT frame
    (unbounded preceding .. current row) is the current row — a classic
    silent-wrong-answer; the total order (c_acctbal, c_custkey) makes every
    edge deterministic. Integer keys only: nothing to round, the row is
    hash-exact by construction."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return c.select(
        "c_custkey", "c_nationkey",
        F.first("c_custkey").over(w).alias("poorest"),
        F.last("c_custkey").over(w).alias("richest"),
        F.nth_value("c_custkey", 2).over(w).alias("runner_up"))


@register(
    "win_cume_dist_percent_rank",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               CUME_DIST() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_quantity) AS cd,
               PERCENT_RANK() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_quantity) AS pr
        FROM lineitem
    """,
    tags=("window", "rank"),
)
def win_cume_dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions — cume_dist (fraction of peers
    at-or-below, peer groups share a value) and percent_rank
    ((rank-1)/(n-1)) — per return-flag over quantity, with heavy ties so
    the ANSI peer-group semantics are actually exercised. Both are exact
    quotients of window-frame integer counts, so the doubles hash-match
    across engines with no rounding discipline needed. One window shuffle
    keyed by the partition column; no global sort."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"))


@register(
    "win_interpolate_linear",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
            FROM events
        ),
        samples AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   (CAST(SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT))
                         AS BIGINT) / (COUNT(*) * 1e2)) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, CAST(ts AS DATE)
        ),
        spine AS (
            SELECT u.user_id,
                   CAST(UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM (SELECT DISTINCT user_id FROM samples) u, bounds b
        ),
        grid AS (
            SELECT s.user_id, s.day,
                   (s.day - DATE '1970-01-01') AS dn, p.v
            FROM spine s LEFT JOIN samples p
              ON s.user_id = p.user_id AND s.day = p.day
        ),
        carried AS (
            SELECT user_id, day, dn, v,
                   last_value(v IGNORE NULLS) OVER wb AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN dn END
                              IGNORE NULLS) OVER wb AS pd,
                   first_value(v IGNORE NULLS) OVER wf AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN dn END
                               IGNORE NULLS) OVER wf AS nd
            FROM grid
            WINDOW wb AS (PARTITION BY user_id ORDER BY dn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY dn
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, CAST(dn AS BIGINT) AS epoch_day,
               (FLOOR((CASE WHEN v IS NOT NULL THEN v
                            WHEN pv IS NULL THEN nv
                            WHEN nv IS NULL THEN pv
                            ELSE pv + (nv - pv) * (dn - pd) * 1e0 / (nd - pd)
                       END) * 1e6 + 5e-1) / 1e6) AS value_interp,
               CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS is_observed
        FROM carried
    """,
    tags=("window", "timeseries"),
)
def win_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with linear interpolation — the environment
    time series (HV VMon/IMon, temperatures, DAQ_self-triggering.md:249-263)
    regularized onto a gap-free daily grid: observed days keep their
    (averaged) sample, interior gaps interpolate linearly between the
    bracketing observations, and edges carry the nearest value. The spine
    is users x days (bounded: span-days per user, never event-count);
    prev/next carries are two frame-bounded window passes per user
    (``last/first ignorenulls`` — exactly the as-of union trick flattened
    onto a grid), so the whole query is two shuffles on user_id and no
    join bigger than spine-left-join-samples. Both prev-value and
    prev-day come from the same rows, so they cannot stitch different
    observations together."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(F.min(F.to_date("ts")).alias("d0"),
                    F.max(F.to_date("ts")).alias("d1"))
    samples = (ev.where(F.col("event_type") == "purchase")
               .groupBy("user_id", F.to_date("ts").alias("day"))
               .agg((F.sum(qint(F.col("value"), 2))
                     / (F.count(F.lit(1)) * F.lit(1e2))).alias("v")))
    users = samples.select("user_id").distinct()
    spine = (users.crossJoin(F.broadcast(bounds))
             .select("user_id",
                     F.explode(F.sequence("d0", "d1")).alias("day")))
    grid = (spine.join(samples, ["user_id", "day"], "left")
            .select("user_id", "day",
                    F.datediff("day", F.lit("1970-01-01")).alias("dn"), "v"))
    wb = (Window.partitionBy("user_id").orderBy("dn")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy("dn")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    marker = F.when(F.col("v").isNotNull(), F.col("dn"))
    carried = grid.select(
        "user_id", "dn", "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(marker, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(marker, ignorenulls=True).over(wf).alias("nd"))
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(F.col("pv").isNull(), F.col("nv"))
              .when(F.col("nv").isNull(), F.col("pv"))
              .otherwise(F.col("pv") + (F.col("nv") - F.col("pv"))
                         * (F.col("dn") - F.col("pd")) * F.lit(1.0)
                         / (F.col("nd") - F.col("pd"))))
    return carried.select(
        "user_id", F.col("dn").cast("long").alias("epoch_day"),
        pround(interp, 6).alias("value_interp"),
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("is_observed"))


_GAPS_SQL = """
WITH days AS (
    SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
), isl AS (
    SELECT o_custkey, d,
           date_diff('day', DATE '1990-01-01', d)
               - row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS grp
    FROM days
)
SELECT o_custkey AS custkey,
       strftime(MIN(d), '%Y-%m-%d') AS d_lo,
       strftime(MAX(d), '%Y-%m-%d') AS d_hi,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM isl GROUP BY o_custkey, grp HAVING COUNT(*) >= 2
"""


@register("win_gaps_islands", oracle=_GAPS_SQL, tags=("window", "islands"))
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous activity streaks per key — the
    contiguous-run-number bookkeeping of the acquisition loop
    (runs are consecutive integers, one per 30 s window,
    DAQ_self-triggering.md:30-39; a gap means a lost/aborted run the
    watchdog must not wait for). Classic value-minus-row_number trick:
    within a key, consecutive days share ``day_index - row_number()``, so
    one window pass + one aggregate finds every maximal streak [d_lo,
    d_hi] with its length — no self-join, no recursion.

    Scale: the window partitions by customer (bounded per-key history), so
    no global sort anywhere — unlike the textbook single-ORDER-BY islands
    query, this shape survives a corpus-sized key space."""
    ensure_deterministic(spark)
    od = table(spark, sf_dir, "orders")
    days = od.select("o_custkey", F.to_date("o_orderdate").alias("d")).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = days.select(
        "o_custkey", "d",
        (F.datediff(F.col("d"), F.lit("1990-01-01"))
         - F.row_number().over(w)).alias("grp"))
    return (isl.groupBy("o_custkey", "grp")
            .agg(F.date_format(F.min("d"), "yyyy-MM-dd").alias("d_lo"),
                 F.date_format(F.max("d"), "yyyy-MM-dd").alias("d_hi"),
                 F.count(F.lit(1)).alias("n_days"))
            .where(F.col("n_days") >= 2)
            .select(F.col("o_custkey").alias("custkey"),
                    "d_lo", "d_hi", "n_days"))


_EWMA_ALPHA, _EWMA_K = 0.3, 12

#: identical double constants inlined into BOTH engines (e-notation parses
#: as DOUBLE in Spark SQL and DuckDB alike) — computing (1-a)^k at runtime
#: would let the two engines' pow() differ by an ulp near a rounding edge.
_EWMA_WEIGHTS = [_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k
                 for k in range(_EWMA_K + 1)]


def _ewma_sql() -> str:
    lag_cols = ", ".join(
        f"lag(cnt, {k}) OVER (PARTITION BY event_type ORDER BY h) AS x{k}"
        for k in range(1, _EWMA_K + 1))
    num = " + ".join(
        (f"cnt * {_EWMA_WEIGHTS[0]:.17e}" if k == 0 else
         f"CASE WHEN x{k} IS NOT NULL THEN x{k} * {_EWMA_WEIGHTS[k]:.17e} "
         f"ELSE 0e0 END")
        for k in range(_EWMA_K + 1))
    den = " + ".join(
        (f"{_EWMA_WEIGHTS[0]:.17e}" if k == 0 else
         f"CASE WHEN x{k} IS NOT NULL THEN {_EWMA_WEIGHTS[k]:.17e} "
         f"ELSE 0e0 END")
        for k in range(_EWMA_K + 1))
    return f"""
WITH series AS (
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), lags AS (
    SELECT event_type, h, cnt, {lag_cols} FROM series
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M') AS hour,
       CAST(cnt AS BIGINT) AS cnt,
       FLOOR((({num}) / ({den})) * 1e6 + 5e-1) / 1e6 AS ewma
FROM lags
"""


@register("win_ewma", oracle=_ewma_sql(), tags=("window", "timeseries"))
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the hourly rate series —
    the standard monitoring smoother (recent samples dominate, old noise
    decays geometrically; the L1A rate trend of
    DAQ_self-triggering.md:235-236 with a principled memory). The
    textbook recursive form y_t = a*x_t + (1-a)*y_{t-1} is a sequential
    scan; this is the TRUNCATED convolution form — 12 lags cover >99% of
    the mass at alpha=0.3 — which is one window pass of bounded width,
    parallel over keys, with NULL-aware weight renormalization at series
    edges (the same treatment pandas ``ewm(adjust=True)`` applies).
    Weights are precomputed doubles inlined identically into both
    engines, and the weighted sum is one fixed-order IEEE chain —
    hash-exact at 1e-6 quantization."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    series = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("event_type").orderBy("h")
    lags = series.select(
        "event_type", "h", "cnt",
        *[F.lag("cnt", k).over(w).alias(f"x{k}")
          for k in range(1, _EWMA_K + 1)])
    num = None
    den = None
    for k in range(_EWMA_K + 1):
        wgt = _EWMA_WEIGHTS[k]
        xk = F.col("cnt") if k == 0 else F.col(f"x{k}")
        term = F.when(xk.isNotNull(), xk * F.lit(wgt)).otherwise(F.lit(0.0))
        dterm = F.when(xk.isNotNull(), F.lit(wgt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return lags.select(
        "event_type", F.date_format("h", "yyyy-MM-dd HH:mm").alias("hour"),
        "cnt", pround(num / den, 6).alias("ewma"))


# --------------------------------------------------------------------------
# win_running_distinct — running COUNT(DISTINCT) via first-occurrence flags
# --------------------------------------------------------------------------

_RUN_DISTINCT_SQL = """
WITH e AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events
),
flagged AS (
    SELECT event_id, user_id, event_type, tus,
           CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY tus, event_id) = 1
                THEN 1 ELSE 0 END AS first_seen
    FROM e
)
SELECT event_id, user_id, event_type,
       CAST(SUM(first_seen) OVER (
            PARTITION BY user_id ORDER BY tus, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
FROM flagged
"""


@register("win_running_distinct", oracle=_RUN_DISTINCT_SQL,
          tags=("window", "distinct"))
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user — the window SQL
    cannot express directly (DISTINCT is not a sliding-frame aggregate
    in either engine), lowered to the standard first-occurrence trick:
    flag each (user, type)'s first event via row_number, then a running
    sum of flags. The census every breadth-of-engagement metric ("how
    many distinct actions has this user tried by time t") builds on.

    Scale shape: both windows hash-partition on user_id (the second
    additionally sub-keys by type for the row_number) — two narrow
    shuffles, each partition sorting only its own user's events, never a
    global order. Ties are pinned by (ts, event_id) in both engines so
    the running count is deterministic row for row."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("tus"))
    wf = (Window.partitionBy("user_id", "event_type")
          .orderBy("tus", "event_id"))
    flagged = e.select(
        "event_id", "user_id", "event_type", "tus",
        F.when(F.row_number().over(wf) == 1, 1).otherwise(0)
        .alias("first_seen"))
    wrun = (Window.partitionBy("user_id").orderBy("tus", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return flagged.select(
        "event_id", "user_id", "event_type",
        F.sum("first_seen").over(wrun).cast("long")
        .alias("distinct_types_so_far"))


# --------------------------------------------------------------------------
# win_rolling_slope — trailing-frame OLS trend per key
# --------------------------------------------------------------------------

_SLOPE_K = 8

_ROLLING_SLOPE_SQL = f"""
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) AS tus,
           CAST(FLOOR(value * 1e6 + 5e-1) AS BIGINT) AS vq
    FROM events
),
r AS (
    SELECT event_id, user_id, tus, vq,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
f AS (
    SELECT event_id, user_id, rn,
           CAST(COUNT(*) OVER t AS BIGINT) AS k,
           CAST(SUM(vq) OVER t AS BIGINT) AS sy,
           CAST(SUM(rn) OVER t AS BIGINT) AS sx,
           CAST(SUM(rn * vq) OVER t AS BIGINT) AS sxy,
           CAST(SUM(rn * rn) OVER t AS BIGINT) AS sxx
    FROM r
    WINDOW t AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN {_SLOPE_K - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, k,
       CASE WHEN k < 2 THEN NULL
            ELSE CAST(FLOOR((CAST(k AS DOUBLE) * sxy
                             - CAST(sx AS DOUBLE) * sy)
                            / (CAST(k AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx)
                            * 1e3 + 5e-1) AS BIGINT) END AS slope_milli
FROM f
"""


@register("win_rolling_slope", oracle=_ROLLING_SLOPE_SQL,
          tags=("window", "timeseries"))
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend: the least-squares slope of `value` over the
    trailing {k}-event frame per user — the time-series trend detector
    that moving averages can't give (a flat average hides a ramp;
    monitoring stacks alert on slope sign flips). Uses the shift
    invariance of the OLS slope: the regressor is the ABSOLUTE
    per-user row number (slope is unchanged by shifting x by a
    constant), so all four frame sums are plain windowed SUMs of exact
    int64 products — no per-frame re-centering, no UDF, and the only
    float math is the one fixed-order closing division (micro-quantized
    value units in, milli-quantized slope out).

    Scale shape: ONE user_id shuffle serves both windows (the row_number
    and the trailing frame share partitioning/order); each partition
    sorts only its own user's events. Products stay exact: rn·vq ≤
    ~10⁹·10⁹ needs rn and value bounded, which per-user event counts
    and micro-quantized bounded metrics give by construction."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", F.unix_micros("ts").alias("tus"),
                  F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
                  .cast("long").alias("vq"))
    wr = Window.partitionBy("user_id").orderBy("tus", "event_id")
    r = e.select("event_id", "user_id", "vq",
                 F.row_number().over(wr).cast("long").alias("rn"))
    wt = (Window.partitionBy("user_id").orderBy("rn")
          .rowsBetween(-(_SLOPE_K - 1), Window.currentRow))
    f = r.select(
        "event_id", "user_id", "rn",
        F.count(F.lit(1)).over(wt).cast("long").alias("k"),
        F.sum("vq").over(wt).cast("long").alias("sy"),
        F.sum("rn").over(wt).cast("long").alias("sx"),
        F.sum(F.col("rn") * F.col("vq")).over(wt).cast("long").alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).over(wt).cast("long").alias("sxx"))
    slope = ((F.col("k").cast("double") * F.col("sxy")
              - F.col("sx").cast("double") * F.col("sy"))
             / (F.col("k").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx")))
    return f.select(
        "event_id", "user_id", "k",
        F.when(F.col("k") < 2, F.lit(None).cast("long"))
        .otherwise(F.floor(slope * F.lit(1e3) + F.lit(0.5)).cast("long"))
        .alias("slope_milli"))


win_rolling_slope.__doc__ = win_rolling_slope.__doc__.format(k=_SLOPE_K)


# --------------------------------------------------------------------------
# win_time_weighted_avg — duration-weighted (TWAP-style) mean per key
# --------------------------------------------------------------------------

_TWAP_SQL = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS tus,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS vc
    FROM events
),
seg AS (
    SELECT user_id, vc,
           (LEAD(tus) OVER (PARTITION BY user_id ORDER BY tus) - tus)
               // 1000 AS dur_ms
    FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_ms) AS BIGINT) AS span_ms,
       CAST(SUM(vc * dur_ms) AS BIGINT) AS weighted_cents_ms,
       CAST((2000 * SUM(vc * dur_ms) + SUM(dur_ms))
            // (2 * SUM(dur_ms)) AS BIGINT) AS twap_millicents
FROM seg WHERE dur_ms IS NOT NULL
GROUP BY user_id
"""


@register("win_time_weighted_avg", oracle=_TWAP_SQL,
          tags=("window", "timeseries"))
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the TWAP construction): each observation
    holds until the NEXT one, so its weight is the gap to the successor
    — the correct mean for irregularly-sampled state (sensor readings,
    prices, gauge metrics), where the arithmetic mean `win_moving_avg`
    computes over-weights bursts of rapid updates. One lead() window
    builds the holding segments; the weighted mean is exact integer
    arithmetic end to end (cent values x millisecond durations,
    round-half-up milli-cent output), the last open-ended observation
    per key excluded identically in both engines. The closing mean is
    milli-cent precision: the x2000 rounding multiplier keeps the
    numerator inside int64 even for year-long spans (a x2e6 micro
    variant overflowed at fixture scale — caught by the oracle gate).

    Scale shape: one user_id shuffle (the lead window), then a
    map-side-combinable per-user reduce. Weights are MILLISECOND
    durations precisely so the weighted sums stay int64-safe (cent x µs
    products overflowed already at fixture scale — same class as the
    Welch incident, caught before registration by the sf0.1 rule)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", F.unix_micros("ts").alias("tus"),
                  F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5))
                  .cast("long").alias("vc"))
    w = Window.partitionBy("user_id").orderBy("tus")
    seg = e.select("user_id", "vc",
                   F.expr("(lead(tus) over (partition by user_id order by"
                          " tus) - tus) div 1000").alias("dur_ms"))
    return (seg.where(F.col("dur_ms").isNotNull())
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_segments"),
                 F.sum("dur_ms").cast("long").alias("span_ms"),
                 F.sum(F.col("vc") * F.col("dur_ms")).cast("long")
                 .alias("weighted_cents_ms"),
                 F.expr("cast((2000 * sum(vc * dur_ms) + sum(dur_ms))"
                        " div (2 * sum(dur_ms)) as bigint)")
                 .alias("twap_millicents")))


# --------------------------------------------------------------------------
# shared daily feeders (ONE spelling for every daily-grid window operator)
# --------------------------------------------------------------------------

def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, rev_kd): daily order revenue in exact integer kilodollars —
    the ONE Spark spelling of the `_BOLL_DAILY_DUCK` feeder, shared by
    the Bollinger/record-high/drawdown family so the cents rounding can
    never desynchronize between them."""
    o = table(spark, sf_dir, "orders")
    return (o.select(F.expr("unix_micros(cast(o_orderdate as timestamp))"
                            " div 86400000000").cast("long").alias("day"),
                     F.expr("cast(floor(o_totalprice * 1e2 + 5e-1)"
                            " as bigint)").alias("cents"))
            .groupBy("day")
            .agg(F.expr("cast(sum(cents) div 100000 as bigint)")
                 .alias("rev_kd")))


def _daily_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, x): daily error-event counts, eagerly checkpointed — the
    ONE Spark spelling of the `_THEIL_DAILY_DUCK` feeder shared by the
    Theil-Sen / Mann-Kendall pair (both consume it more than once)."""
    ev = table(spark, sf_dir, "events")
    return (ev.where(F.col("event_type") == "error")
            .select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                    .alias("day"))
            .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x"))
            .localCheckpoint(eager=True))


# --------------------------------------------------------------------------
# win_bollinger_bands — rolling mean ± 2σ envelope with breach flags
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, rev_kd) — daily revenue in exact
#: integer kilodollars). Window sums and sums-of-squares are exact
#: int64 (kd² sums stay < 2^62 past 1000x today's daily revenue), so
#: the mean/σ closes are fixed-order doubles; GREATEST(·, 0) absorbs
#: the one-ulp negative a zero-variance window can round to.
_BOLL_BODY = """
WITH w AS (
    SELECT day, rev_kd,
           CAST(SUM(rev_kd) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
           CAST(SUM(rev_kd * rev_kd) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS q,
           CAST(COUNT(*) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n
    FROM {d}
)
SELECT day, rev_kd, n,
       CAST(FLOOR(s * 1e0 / n * 1e3 + 5e-1) AS BIGINT) AS mean_milli,
       CAST(FLOOR(sqrt(GREATEST((q * 1e0 - s * 1e0 * s / n) / n, 0e0))
            * 1e3 + 5e-1) AS BIGINT) AS sigma_milli,
       CASE WHEN rev_kd * 1e0 > s * 1e0 / n
                 + 2e0 * sqrt(GREATEST((q * 1e0 - s * 1e0 * s / n) / n,
                                       0e0)) THEN 1
            WHEN rev_kd * 1e0 < s * 1e0 / n
                 - 2e0 * sqrt(GREATEST((q * 1e0 - s * 1e0 * s / n) / n,
                                       0e0)) THEN -1
            ELSE 0 END AS breach
FROM w
"""

_BOLL_DAILY_DUCK = """(
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                // 100000 AS BIGINT) AS rev_kd
    FROM orders GROUP BY 1
)"""


@register("win_bollinger_bands", oracle=_BOLL_BODY.format(d=_BOLL_DAILY_DUCK),
          tags=("window", "timeseries", "anomaly"))
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (Bollinger 1980s) over the daily revenue series:
    trailing-7-day mean ± 2σ envelope plus a breach flag (+1 above, −1
    below) — the volatility-adaptive anomaly detector that complements
    `win_moving_avg` (level only), `win_rolling_slope` (trend only) and
    `win_cusum_change` (small persistent shifts): a band breach flags a
    SINGLE day that is extreme relative to its own recent volatility,
    which a fixed threshold over- or under-fires on heteroscedastic
    series. Partial leading windows use the true window count n, not 7.

    Determinism: daily revenue quantizes to exact integer kilodollars
    BEFORE windowing (cents sum → div 1e5), so the rolling Σx and Σx²
    are exact int64 in any order; mean/σ/band tests are fixed-order
    doubles (the σ subexpression repeated verbatim so both engines fold
    identically), with GREATEST(·,0) absorbing the one-ulp negative a
    zero-variance window can round to (the sqrt(<0) lesson from
    `ext_fdr_bh`).

    Scale shape: the corpus reduces to one row per day FIRST (map-side
    combinable), so the unpartitioned ORDER BY day window runs over the
    report-sized daily series (~2.4k rows for 6.5 years) — the
    documented exception class for global windows. At 100 TB the daily
    grid is unchanged; only the first reduce grows."""
    ensure_deterministic(spark)
    _daily_revenue(spark, sf_dir).createOrReplaceTempView("boll_daily")
    return spark.sql(_BOLL_BODY.format(d="boll_daily"))


# --------------------------------------------------------------------------
# win_theil_sen — robust median-of-slopes trend over the daily series
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, x) — the daily error-count reduce).
#: All pairwise slopes quantize to exact micro integers; the median is
#: an exact order statistic (the doubled-median trick keeps it integer
#: until one final floor-halving that is a true floor on both engines).
_THEIL_BODY = """
WITH p AS (
    SELECT CAST(FLOOR((b.x - a.x) * 1e0 / (b.day - a.day) * 1e6 + 5e-1)
                AS BIGINT) AS slope_micro
    FROM {d} a JOIN {d} b ON b.day > a.day
),
r AS (
    SELECT slope_micro,
           ROW_NUMBER() OVER (ORDER BY slope_micro) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM p
),
med AS (
    SELECT MAX(n) AS n_pairs,
           CAST(FLOOR((MAX(CASE WHEN rn = CAST(FLOOR((n + 1) / 2e0)
                                               AS BIGINT)
                               THEN slope_micro END)
                       + MAX(CASE WHEN rn = CAST(FLOOR((n + 2) / 2e0)
                                                 AS BIGINT)
                                 THEN slope_micro END)) / 2e0) AS BIGINT)
               AS slope_med_micro
    FROM r
),
ic AS (
    SELECT d.x * 1000000 - m.slope_med_micro * d.day AS int_micro,
           m.slope_med_micro, m.n_pairs
    FROM {d} d CROSS JOIN med m
),
ir AS (
    SELECT int_micro, slope_med_micro, n_pairs,
           ROW_NUMBER() OVER (ORDER BY int_micro) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM ic
)
SELECT MAX(n) AS n_days, MAX(n_pairs) AS n_pairs,
       MAX(slope_med_micro) AS slope_med_micro,
       CAST(FLOOR((MAX(CASE WHEN rn = CAST(FLOOR((n + 1) / 2e0) AS BIGINT)
                           THEN int_micro END)
                   + MAX(CASE WHEN rn = CAST(FLOOR((n + 2) / 2e0)
                                             AS BIGINT)
                             THEN int_micro END)) / 2e0) AS BIGINT)
           AS intercept_med_micro
FROM ir
"""

_THEIL_DAILY_DUCK = """(
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events WHERE event_type = 'error' GROUP BY 1
)"""


@register("win_theil_sen", oracle=_THEIL_BODY.format(d=_THEIL_DAILY_DUCK),
          tags=("window", "timeseries", "robust"))
def win_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend (Theil 1950, Sen 1968) over the daily
    error-count series: the MEDIAN of all pairwise slopes plus the
    median intercept — the estimator that shrugs off the outlier days
    that bend `win_rolling_slope`'s least-squares line (up to 29% of
    the points can be arbitrarily corrupted before the slope moves).
    The robust/OLS slope disagreement is itself the data-quality alarm.

    Determinism: every pairwise slope quantizes to an exact micro
    integer before ranking; medians are exact order statistics with the
    doubled-median average floored via FLOOR(x/2e0) — a true floor for
    negative slopes on both engines (the `win_holt_linear` division
    lesson). Intercept residuals x·1e6 − slope·day are pure int64.

    Scale shape: the corpus reduces to one row per day FIRST, so the
    all-pairs join runs on the ~30-row daily table (~435 pairs) — the
    classic O(n²) estimator made scale-safe by aggregating before
    pairing, the same move as `ext_kendall_tau`."""
    ensure_deterministic(spark)
    _daily_error_counts(spark, sf_dir).createOrReplaceTempView("theil_daily")
    return spark.sql(_THEIL_BODY.format(d="theil_daily"))


# --------------------------------------------------------------------------
# win_stl_lite — trend / day-of-week seasonal / residual decomposition
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, x) — daily order counts). Trend is a
#: centered 7-day MA in exact milli (integer window sums / true window
#: count); the seasonal component is the day-of-week mean of the
#: detrended series; residual z-scores close over quantized sums.
_STL_BODY = """
WITH t AS (
    SELECT day, x,
           CAST(FLOOR(SUM(x) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1e3
                 / COUNT(*) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) + 5e-1)
                AS BIGINT) AS trend_milli
    FROM {d}
),
d2 AS (
    SELECT day, x, trend_milli,
           CAST(x * 1000 - trend_milli AS BIGINT) AS detr_milli,
           CAST(day % 7 AS BIGINT) AS dow
    FROM t
),
s AS (
    SELECT day, x, trend_milli, detr_milli, dow,
           CAST(FLOOR(SUM(detr_milli) OVER (PARTITION BY dow) * 1e0
                      / COUNT(*) OVER (PARTITION BY dow) + 5e-1)
                AS BIGINT) AS seasonal_milli
    FROM d2
),
r AS (
    SELECT day, x, trend_milli, seasonal_milli,
           CAST(detr_milli - seasonal_milli AS BIGINT) AS resid_milli
    FROM s
),
v AS (
    SELECT day, x, trend_milli, seasonal_milli, resid_milli,
           CAST(SUM(CAST(FLOOR(resid_milli * 1e0 * resid_milli / 1e6)
                         AS BIGINT)) OVER () AS BIGINT) AS ssq,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM r
)
SELECT day, x, trend_milli, seasonal_milli, resid_milli,
       CASE WHEN ssq = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(resid_milli / 1e3 / sqrt(ssq * 1e0 / n)
                            * 1e3 + 5e-1) AS BIGINT) END AS resid_z_milli
FROM v
"""

_STL_DAILY_DUCK = """(
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
)"""


@register("win_stl_lite", oracle=_STL_BODY.format(d=_STL_DAILY_DUCK),
          tags=("window", "timeseries", "decompose"))
def win_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition (the one-pass "STL-lite"
    every ops dashboard runs before reaching for real STL): trend =
    centered 7-day moving average, seasonal = day-of-week mean of the
    detrended series, residual = what's left, plus a residual z-score —
    the anomaly signal AFTER trend and weekly rhythm are explained
    away, which is what a raw z-score (`agg_seasonal_anomaly` handles
    the hour-of-week version) conflates. One query yields all three
    components per day, ready for plotting or alert thresholds.

    Determinism: the daily counts are exact integers; trend is integer
    window sums over the true (partial-edge) window count, milli-
    quantized; detrended and residual values are pure int64; the one
    global σ closes over per-row squares quantized to unit scale before
    summing; every double expression is fixed-order shared text.

    Scale shape: the corpus reduces to one row per day FIRST (map-side
    combinable), so all three window passes (centered MA, day-of-week
    partition, global σ) run over the report-sized daily grid (~2.4k
    rows) — the documented exception class for global windows."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    d = (o.select(F.expr("unix_micros(cast(o_orderdate as timestamp))"
                         " div 86400000000").cast("long").alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    d.createOrReplaceTempView("stl_daily")
    return spark.sql(_STL_BODY.format(d="stl_daily"))


# --------------------------------------------------------------------------
# agg_runs_test — Wald-Wolfowitz runs test on daily up/down moves
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, x)). Signs, run breaks, and counts
#: are exact integers from two lag windows; E[R], Var[R], z close in
#: one fixed-order expression each.
_RUNS_BODY = """
WITH m AS (
    SELECT day, x,
           x - LAG(x) OVER (ORDER BY day) AS diff
    FROM {d}
),
sgn AS (
    SELECT day, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS s
    FROM m WHERE diff IS NOT NULL AND diff <> 0
),
brk AS (
    SELECT s,
           CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL THEN 1
                WHEN LAG(s) OVER (ORDER BY day) <> s THEN 1
                ELSE 0 END AS is_break
    FROM sgn
),
c AS (
    SELECT CAST(SUM(is_break) AS BIGINT) AS r,
           CAST(SUM(s) AS BIGINT) AS n1,
           CAST(SUM(1 - s) AS BIGINT) AS n0
    FROM brk
)
SELECT r AS n_runs, n1 AS n_up, n0 AS n_down,
       CAST(FLOOR((2e0 * n1 * n0 / (n1 + n0) + 1e0) * 1e3 + 5e-1)
            AS BIGINT) AS expected_runs_milli,
       CAST(FLOOR((r - (2e0 * n1 * n0 / (n1 + n0) + 1e0))
                  / sqrt(2e0 * n1 * n0 * (2e0 * n1 * n0 - n1 - n0)
                         / ((n1 + n0) * 1e0 * (n1 + n0)
                            * (n1 + n0 - 1e0)))
                  * 1e3 + 5e-1) AS BIGINT) AS z_milli
FROM c
WHERE n1 > 0 AND n0 > 0 AND n1 + n0 > 1
"""


@register("agg_runs_test", oracle=_RUNS_BODY.format(d=_STL_DAILY_DUCK),
          tags=("agg", "stats", "timeseries"))
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (1940) on the daily order-count
    up/down sequence: too FEW runs means momentum/trending, too MANY
    means oscillation — the randomness check that validates the i.i.d.
    assumption every control-chart threshold (`win_cusum_change`,
    `win_bollinger_bands`) quietly makes. Zero-change days are dropped
    (the standard treatment); the z-score closes against the exact
    conditional mean and variance of the run count.

    Determinism: signs, run breaks, and n_up/n_down are exact integers
    from two lag windows over the daily grid; E[R] and z are single
    fixed-order IEEE expressions, milli-quantized.

    Scale shape: corpus reduces to the daily grid FIRST; both lag
    windows and the final 1-row reduce run over ~2.4k rows."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    d = (o.select(F.expr("unix_micros(cast(o_orderdate as timestamp))"
                         " div 86400000000").cast("long").alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    d.createOrReplaceTempView("runs_daily")
    return spark.sql(_RUNS_BODY.format(d="runs_daily"))


# --------------------------------------------------------------------------
# win_record_highs — running-maximum record tracking over daily revenue
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, rev_kd)). Pure integer window
#: algebra: strict-preceding running max, record flags, and the
#: conditional running max of record days.
_RECORDS_BODY = """
WITH w AS (
    SELECT day, rev_kd,
           MAX(rev_kd) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
    FROM {d}
),
f AS (
    SELECT day, rev_kd, prev_max,
           CASE WHEN prev_max IS NULL OR rev_kd > prev_max
                THEN 1 ELSE 0 END AS is_record
    FROM w
)
SELECT day, rev_kd,
       CAST(GREATEST(COALESCE(prev_max, rev_kd), rev_kd) AS BIGINT)
           AS running_max,
       is_record,
       CAST(day - MAX(CASE WHEN is_record = 1 THEN day END)
                  OVER (ORDER BY day) AS BIGINT) AS days_since_record
FROM f
"""


@register("win_record_highs",
          oracle=_RECORDS_BODY.format(d=_BOLL_DAILY_DUCK),
          tags=("window", "timeseries"))
def win_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record tracking over the daily revenue series: the running
    all-time high, a flag for record-setting days, and the drought
    length (days since the last record) — the "new high-water mark"
    census behind growth dashboards and capacity planning (records
    cluster in growth phases; a lengthening drought is the earliest
    plateau signal, visible long before a moving average turns). The
    strict-preceding frame makes day one a record by definition and
    ties NON-records (a tie does not beat the high).

    Determinism: pure integer window algebra end to end — running
    maxima, flags, and the conditional running max of record days; no
    floating point at all.

    Scale shape: corpus reduces to the daily grid FIRST; both windows
    run over the report-sized series (~2.4k rows)."""
    ensure_deterministic(spark)
    _daily_revenue(spark, sf_dir).createOrReplaceTempView("records_daily")
    return spark.sql(_RECORDS_BODY.format(d="records_daily"))


# --------------------------------------------------------------------------
# win_max_drawdown — peak-to-trough loss over the cumulative revenue curve
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, rev_kd)). Cumulative sum, running
#: peak, per-day drawdown, and the global maximum with its day — all
#: pure integer window algebra.
_DRAWDOWN_BODY = """
WITH c AS (
    SELECT day, rev_kd,
           CAST(SUM(rev_kd) OVER (ORDER BY day) AS BIGINT) AS cum
    FROM {d}
),
p AS (
    SELECT day, rev_kd, cum,
           CAST(MAX(cum) OVER (ORDER BY day) AS BIGINT) AS peak
    FROM c
),
dd AS (
    SELECT day, rev_kd, cum, peak,
           CAST(peak - cum AS BIGINT) AS drawdown
    FROM p
),
mx AS (
    SELECT day, drawdown, peak,
           ROW_NUMBER() OVER (ORDER BY drawdown DESC, day) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_days
    FROM dd
)
SELECT n_days, day AS trough_day, drawdown AS max_drawdown_kd, peak
       , CASE WHEN peak = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR(drawdown * 1e6 / peak) AS BIGINT) END
           AS drawdown_of_peak_micro
FROM mx WHERE rn = 1
"""


@register("win_max_drawdown",
          oracle=_DRAWDOWN_BODY.format(d=_BOLL_DAILY_DUCK),
          tags=("window", "timeseries"))
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown over the cumulative daily-revenue curve: the
    deepest peak-to-trough fall, its trough day, and the fall as a
    share of the peak — the risk metric every cumulative KPI chart
    implies but dashboards rarely compute (`win_record_highs` tracks
    new highs; drawdown quantifies how BAD the stretches between them
    got, which is what capacity buffers and cash-flow planning key on).
    On an always-positive daily series the drawdown is 0 by
    construction — the interesting version tracks net flows; swap the
    feeder and the query is unchanged.

    Determinism: pure integer window algebra (cumsum, running peak,
    difference) with a total-order tie-break on the argmax; the one
    share close is integer floor division guarded at peak = 0.

    Scale shape: day-reduce FIRST, then three chained windows over the
    report-sized daily grid."""
    ensure_deterministic(spark)
    _daily_revenue(spark, sf_dir).createOrReplaceTempView("dd_daily")
    return spark.sql(_DRAWDOWN_BODY.format(d="dd_daily"))


# --------------------------------------------------------------------------
# agg_seasonality_strength — Wang-Smyth-Hyndman decomposition features
# --------------------------------------------------------------------------

#: shared body ({d} = daily feeder): reuses the STL-lite component
#: algebra, then closes with the two strength features
#:   F_seasonal = max(0, 1 - var(resid)/var(detrended))
#:   F_trend    = max(0, 1 - var(resid)/var(deseasonalized))
#: from centered variances over quantized per-row squares (GREATEST
#: absorbs quantization-negative variances; zero-variance denominators
#: return 0 identically on both engines).
_SEASONAL_STRENGTH_BODY = """
WITH t AS (
    SELECT day, x,
           CAST(FLOOR(SUM(x) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1e3
                 / COUNT(*) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) + 5e-1)
                AS BIGINT) AS trend_milli
    FROM {d}
),
d2 AS (
    SELECT day, x, trend_milli,
           CAST(x * 1000 - trend_milli AS BIGINT) AS detr_milli,
           CAST(day % 7 AS BIGINT) AS dow
    FROM t
),
s AS (
    SELECT day, x, detr_milli,
           CAST(FLOOR(SUM(detr_milli) OVER (PARTITION BY dow) * 1e0
                      / COUNT(*) OVER (PARTITION BY dow) + 5e-1)
                AS BIGINT) AS seasonal_milli
    FROM d2
),
r AS (
    SELECT detr_milli,
           CAST(detr_milli - seasonal_milli AS BIGINT) AS resid_milli,
           CAST(x * 1000 - seasonal_milli AS BIGINT) AS deseas_milli
    FROM s
),
v AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(resid_milli) AS BIGINT) AS s_r,
           CAST(SUM(detr_milli) AS BIGINT) AS s_d,
           CAST(SUM(deseas_milli) AS BIGINT) AS s_z,
           CAST(SUM(CAST(FLOOR(resid_milli * 1e0 * resid_milli / 1e6)
                         AS BIGINT)) AS BIGINT) AS q_r,
           CAST(SUM(CAST(FLOOR(detr_milli * 1e0 * detr_milli / 1e6)
                         AS BIGINT)) AS BIGINT) AS q_d,
           CAST(SUM(CAST(FLOOR(deseas_milli * 1e0 * deseas_milli / 1e6)
                         AS BIGINT)) AS BIGINT) AS q_z
    FROM r
),
f AS (
    SELECT n,
           GREATEST(q_r * 1e0 - CAST(s_r AS DOUBLE) * s_r / (n * 1e6),
                    0e0) AS v_r,
           GREATEST(q_d * 1e0 - CAST(s_d AS DOUBLE) * s_d / (n * 1e6),
                    0e0) AS v_d,
           GREATEST(q_z * 1e0 - CAST(s_z AS DOUBLE) * s_z / (n * 1e6),
                    0e0) AS v_z
    FROM v
)
SELECT n,
       CASE WHEN v_d <= 0e0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(GREATEST(1e0 - v_r / v_d, 0e0) * 1e6 + 5e-1)
                 AS BIGINT) END AS seasonal_strength_micro,
       CASE WHEN v_z <= 0e0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(GREATEST(1e0 - v_r / v_z, 0e0) * 1e6 + 5e-1)
                 AS BIGINT) END AS trend_strength_micro
FROM f
"""

_SEASONAL_DAILY_DUCK = """(
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
)"""


@register("agg_seasonality_strength",
          oracle=_SEASONAL_STRENGTH_BODY.format(d=_SEASONAL_DAILY_DUCK),
          tags=("agg", "timeseries", "stats"))
def agg_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality and trend strength (Wang, Smyth & Hyndman 2006 — the
    decomposition features behind every large-scale forecastability
    triage, e.g. M4/feasts): F_seasonal = max(0, 1 − var(remainder)/
    var(detrended)) and F_trend = max(0, 1 − var(remainder)/
    var(deseasonalized)) over the daily event series, from the SAME
    component algebra as `win_stl_lite` (per-day components there; the
    two scalars a fleet-wide triage stores per series here). Near-zero
    strengths say "don't bother with Holt, persistence wins" — the
    upstream gate for `agg_forecast_backtest`.

    Determinism: components are exact int64 milli; centered variances
    close over quantized per-row squares with GREATEST absorbing
    quantization-negative values (the `ext_fdr_bh` sqrt(<0) lesson) —
    identically spelled on both engines.

    Scale shape: day-reduce FIRST, the STL window passes over the
    report-sized grid, ONE 1-row close."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    d.createOrReplaceTempView("strength_daily")
    return spark.sql(_SEASONAL_STRENGTH_BODY.format(d="strength_daily"))


# --------------------------------------------------------------------------
# win_rolling_correlation — trailing-14-day Pearson between two metrics
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, x, y) — daily order count and daily
#: revenue in kilodollars). All five moment sums are exact int64 window
#: sums; the correlation closes in one fixed-order expression with
#: GREATEST absorbing the zero-variance round-off edge.
_ROLLCORR_BODY = """
WITH w AS (
    SELECT day, x, y,
           CAST(COUNT(*) OVER win AS BIGINT) AS n,
           CAST(SUM(x) OVER win AS BIGINT) AS sx,
           CAST(SUM(y) OVER win AS BIGINT) AS sy,
           CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
           CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
           CAST(SUM(y * y) OVER win AS BIGINT) AS syy
    FROM {d}
    WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day, x, y,
       CASE WHEN (n * 1e0 * sxx - sx * 1e0 * sx) <= 0e0
              OR (n * 1e0 * syy - sy * 1e0 * sy) <= 0e0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR((n * 1e0 * sxy - sx * 1e0 * sy)
                            / sqrt(GREATEST(n * 1e0 * sxx
                                            - sx * 1e0 * sx, 0e0)
                                   * GREATEST(n * 1e0 * syy
                                              - sy * 1e0 * sy, 0e0))
                            * 1e3 + 5e-1) AS BIGINT) END AS corr_milli
FROM w WHERE n = 14
"""

_ROLLCORR_DAILY_DUCK = """(
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                // 100000 AS BIGINT) AS y
    FROM orders GROUP BY 1
)"""


@register("win_rolling_correlation",
          oracle=_ROLLCORR_BODY.format(d=_ROLLCORR_DAILY_DUCK),
          tags=("window", "timeseries", "stats"))
def win_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-14-day Pearson correlation between daily order VOLUME
    and daily REVENUE — the rolling coupling monitor: the two normally
    move together (corr near 1), and a window where they decouple means
    ticket size shifted (mix change, pricing event, whale orders) long
    before either univariate monitor (`win_bollinger_bands`,
    `win_rolling_slope`) fires. `agg_corr_regr` gives the corpus-wide
    number; this localizes WHEN the relationship changed. Named-WINDOW
    syntax shares the frame across all five moment sums (one window
    exec on both engines).

    Determinism: all five moments are exact int64 window sums over
    integer daily metrics; the correlation close is one fixed-order
    expression, zero-variance windows returning 0 identically on both
    engines (GREATEST absorbs the one-ulp negative).

    Scale shape: day-reduce FIRST; one window pass over the
    report-sized grid. Full windows only (n = 14) — partial leading
    windows are not comparable numbers."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    d = (o.select(F.expr("unix_micros(cast(o_orderdate as timestamp))"
                         " div 86400000000").cast("long").alias("day"),
                  F.expr("cast(floor(o_totalprice * 1e2 + 5e-1) as bigint)")
                  .alias("cents"))
         .groupBy("day")
         .agg(F.count(F.lit(1)).cast("long").alias("x"),
              F.expr("cast(sum(cents) div 100000 as bigint)").alias("y")))
    d.createOrReplaceTempView("rollcorr_daily")
    return spark.sql(_ROLLCORR_BODY.format(d="rollcorr_daily"))


# --------------------------------------------------------------------------
# agg_mann_kendall_trend — non-parametric monotone-trend test
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, x)). S, the tie terms, and the
#: variance numerator are exact integers from the aggregated pair
#: table; the continuity-corrected z closes in one fixed-order
#: expression per branch.
_MK_BODY = """
WITH p AS (
    SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END
               AS sgn
    FROM {d} a JOIN {d} b ON b.day > a.day
),
s AS (
    SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat FROM p
),
t AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM {d} GROUP BY x
),
v AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_term
    FROM t
)
SELECT s.s_stat, v.n,
       CAST((v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_term) / 18 AS DOUBLE)
           AS var_s,
       CASE WHEN s.s_stat > 0
            THEN CAST(FLOOR((s.s_stat - 1)
                 / sqrt((v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_term)
                        / 18e0) * 1e3 + 5e-1) AS BIGINT)
            WHEN s.s_stat < 0
            THEN CAST(FLOOR((s.s_stat + 1)
                 / sqrt((v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_term)
                        / 18e0) * 1e3 + 5e-1) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS z_milli
FROM s CROSS JOIN v
WHERE v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_term > 0
"""


@register("agg_mann_kendall_trend",
          oracle=_MK_BODY.format(d=_THEIL_DAILY_DUCK),
          tags=("agg", "timeseries", "stats"))
def agg_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test (Mann 1945, Kendall 1975) over
    the daily error-count series: S = Σ sign(x_j − x_i) over ordered
    day pairs, tie-corrected variance, and the continuity-corrected z —
    the hypothesis-test HALF of the robust-trend pair whose estimation
    half is `win_theil_sen` (the two are quoted together in every
    environmental/ops trend report: MK says IS there a monotone trend,
    Theil-Sen says how steep). Distribution-free: no normality or
    linearity assumed, outlier days move S by at most ±(n−1).

    Determinism: S, tie terms t(t−1)(2t+5), and the variance numerator
    are exact integers (DIV-free: the /18 happens once in a double with
    shared text); the z branches are single fixed-order expressions,
    milli-quantized.

    Scale shape: corpus reduces to the daily grid FIRST (the Theil-Sen
    feeder, same eager checkpoint); the O(n²) sign-pair join runs on
    ~30 rows; tie counting is one groupBy over distinct values."""
    ensure_deterministic(spark)
    _daily_error_counts(spark, sf_dir).createOrReplaceTempView("mk_daily")
    return spark.sql(_MK_BODY.format(d="mk_daily"))


# --------------------------------------------------------------------------
# win_rsi — Wilder's relative strength index over the daily revenue series
# --------------------------------------------------------------------------

#: shared body ({d} supplies (day, rev_kd) — the same exact-integer
#: kilodollar daily feeder as Bollinger/drawdown/record-highs, so the
#: TA family can never desynchronize on rounding). Gains/losses are
#: integer day-over-day diffs; the trailing-14 sums are exact int64
#: window sums; the RSI close 100·G/(G+L) is one fixed-order double,
#: milli-quantized. Rows need 14 non-null diffs (the first series row
#: has none) and a non-flat window (G+L>0 — RSI is 0/0-undefined on a
#: constant series; the WHERE guard is spelled identically in both
#: engines, the kappa/GMM degenerate-divide discipline).
_RSI_BODY = """
WITH dd AS (
    SELECT day, rev_kd,
           rev_kd - LAG(rev_kd) OVER (ORDER BY day) AS diff
    FROM {d}
),
w AS (
    SELECT day, rev_kd, diff,
           CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
                OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT
                      ROW) AS BIGINT) AS g,
           CAST(SUM(CASE WHEN diff < 0 THEN 0 - diff ELSE 0 END)
                OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT
                      ROW) AS BIGINT) AS l,
           CAST(COUNT(diff) OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS n_diffs
    FROM dd
)
SELECT day, rev_kd, g AS gain_kd, l AS loss_kd,
       CAST(FLOOR(1e2 * g / (g + l) * 1e3 + 5e-1) AS BIGINT) AS rsi_milli
FROM w
WHERE n_diffs = 14 AND g + l > 0
"""


@register("win_rsi", oracle=_RSI_BODY.format(d=_BOLL_DAILY_DUCK),
          tags=("window", "timeseries", "momentum"))
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Wilder 1978, SMA variant) over the
    daily revenue series: 100·G/(G+L) where G/L are the trailing-14-day
    sums of up-moves and down-moves — the bounded momentum oscillator
    that completes the TA window family (`win_bollinger_bands` measures
    dispersion, `win_max_drawdown` damage, `win_record_highs` peaks;
    RSI measures one-sided drift pressure: >70 overbought, <30
    oversold in the classic reading). The SMA variant (plain window
    sums) is chosen over Wilder's recursive EMA smoothing because it
    stays a pure window expression — no sequential recursion — and the
    overbought/oversold semantics are equivalent for audit purposes.

    Determinism: the feeder reduces revenue to exact integer
    kilodollars; diffs and trailing sums are exact int64 window
    algebra; the single close is a fixed-order double, milli-quantized.
    Degenerate guard: flat 14-day windows (G+L=0) are excluded by a
    WHERE spelled identically in both engines (0/0 is Spark-NaN vs
    DuckDB-error).

    Scale shape: corpus → one row per day FIRST (map-side-combinable
    reduce), then report-sized unpartitioned windows (~2.4k rows) —
    the documented global-window exception class. At 100 TB only the
    first reduce grows."""
    ensure_deterministic(spark)
    _daily_revenue(spark, sf_dir).createOrReplaceTempView("rsi_daily")
    return spark.sql(_RSI_BODY.format(d="rsi_daily"))


# --------------------------------------------------------------------------
# win_hurst_exponent — rescaled-range (R/S) long-memory estimate
# --------------------------------------------------------------------------

#: shared body ({d} supplies the bounded (day, x BIGINT) daily-count
#: table; `//` rewrites to `div` for Spark — operands are non-negative,
#: where DuckDB floor-division and Spark truncation agree). All block
#: statistics stay INTEGER until one sqrt/division per block:
#: w·cumsum - i·blocksum is the cumulative deviate scaled by w (exact),
#: and w·Σx² - (Σx)² = w²·σ² (exact), so R/S = range(yw)/sqrt(A) uses
#: only the bit-exact sqrt on exact int64 inputs — never an
#: order-dependent double window sum.
_HURST_BODY = """
WITH ts AS (
    SELECT day, x,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM {d}
),
wspec AS (
    SELECT CAST(5 AS BIGINT) AS w UNION ALL SELECT 10 UNION ALL SELECT 15
),
b AS (
    SELECT w.w, ts.x, ts.t,
           (ts.t - 1) // w.w AS blk,
           (ts.t - 1) % w.w + 1 AS i
    FROM ts CROSS JOIN wspec w
),
p AS (
    SELECT w, blk, i, x,
           CAST(SUM(x) OVER (PARTITION BY w, blk ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cs,
           CAST(SUM(x) OVER (PARTITION BY w, blk) AS BIGINT) AS s1,
           CAST(SUM(x * x) OVER (PARTITION BY w, blk) AS BIGINT) AS s2,
           CAST(COUNT(*) OVER (PARTITION BY w, blk) AS BIGINT) AS bn
    FROM b
),
y AS (
    SELECT w, blk, w * cs - i * s1 AS yw, w * s2 - s1 * s1 AS a
    FROM p WHERE bn = w
),
rs AS (
    SELECT w, blk,
           CAST(FLOOR((GREATEST(MAX(yw), 0) - LEAST(MIN(yw), 0)) * 1e0
                      / SQRT(MAX(a) * 1e0) * 1e6 + 5e-1) AS BIGINT) AS q
    FROM y WHERE a > 0 GROUP BY w, blk
),
agg AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(FLOOR(SUM(q) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
               AS rs_micro
    FROM rs GROUP BY w
),
piv AS (
    SELECT MAX(CASE WHEN w = 5 THEN n_blocks END) AS nb5,
           MAX(CASE WHEN w = 10 THEN n_blocks END) AS nb10,
           MAX(CASE WHEN w = 15 THEN n_blocks END) AS nb15,
           MAX(CASE WHEN w = 5 THEN rs_micro END) AS q5,
           MAX(CASE WHEN w = 10 THEN rs_micro END) AS q10,
           MAX(CASE WHEN w = 15 THEN rs_micro END) AS q15
    FROM agg
),
lp AS (
    SELECT nb5, nb10, nb15, q5, q10, q15,
           LN(q5 * 1e0 / 1e6) AS r5,
           LN(q10 * 1e0 / 1e6) AS r10,
           LN(q15 * 1e0 / 1e6) AS r15,
           (LN(5e0) + LN(10e0) + LN(15e0)) / 3e0 AS lb
    FROM piv WHERE q5 > 0 AND q10 > 0 AND q15 > 0
)
SELECT nb5 AS n_blocks_w5, nb10 AS n_blocks_w10, nb15 AS n_blocks_w15,
       q5 AS rs_w5_micro, q10 AS rs_w10_micro, q15 AS rs_w15_micro,
       CAST(FLOOR(((LN(5e0) - lb) * (r5 - (r5 + r10 + r15) / 3e0)
                   + (LN(10e0) - lb) * (r10 - (r5 + r10 + r15) / 3e0)
                   + (LN(15e0) - lb) * (r15 - (r5 + r10 + r15) / 3e0))
                  / ((LN(5e0) - lb) * (LN(5e0) - lb)
                     + (LN(10e0) - lb) * (LN(10e0) - lb)
                     + (LN(15e0) - lb) * (LN(15e0) - lb))
                  * 1e3 + 5e-1) AS BIGINT) AS hurst_milli
FROM lp
"""

_HURST_DAYS_DUCK = """(
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
)"""


@register("win_hurst_exponent",
          oracle=_HURST_BODY.format(d=_HURST_DAYS_DUCK),
          tags=("window", "timeseries", "longmemory"))
def win_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    & Wallis 1969): split the daily event-count series into blocks of
    w ∈ {{5, 10, 15}}, compute each block's rescaled range
    R/S = range(cumulative deviations)/σ, and fit the log-log slope of
    the block-averaged R/S against w — H ≈ 0.5 for a memoryless series,
    H > 0.5 for persistent long-memory load (traffic that trends), H <
    0.5 for mean-reverting. The long-memory gauge beside the trend
    (Mann-Kendall), break (binseg) and shift (CUSUM) detectors: it asks
    not WHERE the series changed but whether bursts CLUSTER — the
    property that decides if capacity planning can use Poisson
    arithmetic or must model correlated load.

    Determinism: with cs/s1/s2 exact int64 (order-free window sums),
    each block's deviate series w·cs - i·s1 and variance scale
    w·Σx² - (Σx)² are exact integers, so R/S = range/sqrt(A) touches
    doubles only in the bit-exact sqrt and one division, quantized
    per block before integer averaging; the 3-point log-log regression
    is a fixed-order scalar expression (never a SUM over double rows).
    Zero-variance blocks drop via `a > 0` identically in both engines;
    the output row vanishes only if a whole window size has no valid
    blocks.

    Scale shape: one day reduce (map-side combinable), then windows
    PARTITIONED BY (w, blk) over the ≤3·|days| bounded expansion — the
    3-row wspec cross is constant fan-out, and everything after the
    day table is metadata-scale. x² headroom: fine to ~3e9 events/day;
    past that, lower the day counts to kilo-events first (the
    `agg_changepoint_binseg` note)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    d.createOrReplaceTempView("hurst_days")
    sql = _HURST_BODY.format(d="hurst_days").replace("//", " div ")
    return spark.sql(sql)


# --------------------------------------------------------------------------
# win_page_hinkley — sequential mean-shift drift detector
# --------------------------------------------------------------------------

#: {day} = engine day-index spelling. delta = 0.5 (milli 500);
#: lambda = 3x the global daily mean — scale-adaptive like the CUSUM
#: thresholds.
_PH_BODY = """
WITH d AS (
    SELECT {day} AS day, CAST(COUNT(*) AS BIGINT) AS x
    FROM events WHERE event_type = 'click' GROUP BY 1
),
c AS (
    SELECT day, x,
           CAST(SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
           CAST(SUM(x) OVER () AS BIGINT) AS gs,
           CAST(COUNT(*) OVER () AS BIGINT) AS gn
    FROM d
),
m AS (
    SELECT day, x, i, gs, gn,
           CAST(FLOOR(cum * 1e3 / i + 5e-1) AS BIGINT) AS mu_milli,
           CAST(SUM(1000 * x
                    - CAST(FLOOR(cum * 1e3 / i + 5e-1) AS BIGINT)
                    - 500) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS m_milli
    FROM c
),
g AS (
    SELECT day, x, mu_milli, m_milli,
           3 * CAST(FLOOR(gs * 1e3 / gn + 5e-1) AS BIGINT) AS lam_milli,
           CAST(MIN(m_milli) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS mmin
    FROM m
),
ph AS (
    SELECT day, x, mu_milli, m_milli - mmin AS ph_milli,
           CASE WHEN m_milli - mmin > lam_milli THEN 1 ELSE 0 END AS alarm
    FROM g
)
SELECT day, x, mu_milli, ph_milli, alarm,
       MIN(CASE WHEN alarm = 1 THEN day END) OVER () AS first_alarm_day
FROM ph
"""

_PH_DAY_DUCK = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
_PH_DAY_SPARK = "cast(unix_micros(ts) div 86400000000 as bigint)"


@register("win_page_hinkley", oracle=_PH_BODY.format(day=_PH_DAY_DUCK),
          tags=("window", "anomaly", "sequential"))
def win_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-INCREASE drift detector (Page 1954, the PH
    variant; Gama et al. 2014 survey) over the daily click series:
    m_t = sum_{i<=t}(x_i - mu_i - delta) with mu_i the RUNNING mean,
    PH_t = m_t - min_{i<=t} m_i, alarm when PH_t exceeds 3x the global
    daily mean — the streaming-drift standard beside `win_cusum_change`
    (CUSUM tracks shifts against a FIXED target and needs the max(0,·)
    recursion; PH self-references the running mean, which makes it the
    detector you deploy when no baseline period exists, and its
    prefix-decomposable form needs NO recursion at all).

    Determinism: the running mean milli-quantizes per day BEFORE
    entering the integer cumulative sum (order is the total order on
    the integer day — no ties, no float reduction anywhere); the
    running min and the threshold are exact int64; |m_t| is bounded by
    1500*sum(x) so milli holds int64 to ~6e15 events.

    Scale shape: ONE map-side-combinable day reduce, then window
    algebra over the ~report-length day table — identical envelope to
    the CUSUM/Bollinger/RSI family."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("ph_events")
    return spark.sql(_PH_BODY.format(day=_PH_DAY_SPARK)
                     .replace("FROM events", "FROM ph_events"))


# --------------------------------------------------------------------------
# win_kalman_local_level — recursive local-level Kalman filter (daily)
# --------------------------------------------------------------------------

#: shared recursion body ({day} = engine epoch-day expression). The
#: daily observation is an exact cents-sum / count rational; the
#: filter recursion (Q = 0.01, R = 1, x0 = first z, P0 = 1) is the
#: SAME fixed scalar IEEE sequence on both engines — each step reads
#: only the previous step's (x, P), so there is no reduction-order
#: freedom anywhere — and the emitted level/gain milli-quantize.
#: the day-series CTE (corpus-scaled reduce) — the Spark builder
#: materializes this ONCE via localCheckpoint so the recursion below
#: joins a day-count-sized cached table instead of re-running the
#: corpus reduce every iteration (the executed plan is pinned to have
#: zero parquet scans inside the loop body)
_KALMAN_DAYS = """
WITH z AS (
    SELECT {day} AS day,
           CAST(SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1
)
SELECT day, cents / 1e2 / n AS obs,
       ROW_NUMBER() OVER (ORDER BY day) AS rn
FROM z
"""

_KALMAN_BODY = """
WITH RECURSIVE s AS ({days}),
kf(rn, day, obs, x, p) AS (
    SELECT rn, day, obs, obs, 1e0 FROM s WHERE rn = 1
    UNION ALL
    SELECT s.rn, s.day, s.obs,
           kf.x + ((kf.p + 1e-2) / (kf.p + 1e-2 + 1e0)) * (s.obs - kf.x),
           (1e0 - (kf.p + 1e-2) / (kf.p + 1e-2 + 1e0)) * (kf.p + 1e-2)
    FROM kf JOIN s ON s.rn = kf.rn + 1
)
SELECT day,
       CAST(FLOOR(obs * 1e3 + 5e-1) AS BIGINT) AS obs_milli,
       CAST(FLOOR(x * 1e3 + 5e-1) AS BIGINT) AS level_milli,
       CAST(FLOOR((p + 1e-2) / (p + 1e-2 + 1e0) * 1e6 + 5e-1) AS BIGINT)
           AS next_gain_micro
FROM kf
"""

_KALMAN_DAY_DUCK = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
_KALMAN_DAY_SPARK = "cast(unix_micros(ts) div 86400000000 as bigint)"


@register("win_kalman_local_level",
          oracle=_KALMAN_BODY.format(
              days=_KALMAN_DAYS.format(src="events",
                                       day=_KALMAN_DAY_DUCK).strip()),
          tags=("win", "timeseries"))
def win_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter (Kalman 1960; the structural time-series
    "random walk + noise" model, Harvey 1989) over the daily mean event
    value: per day, the filtered level, the innovation-corrected
    observation, and the NEXT-step Kalman gain (the model's own
    report of how much it still trusts new data vs its state). The
    optimal-smoothing upgrade of `win_ewma` — the gain ADAPTS (high
    while P is large, converging to the steady-state Riccati fixed
    point) instead of being a fixed alpha; `win_holt_linear` adds trend
    but neither carries uncertainty. The DuckDB oracle keeps the
    engine-native WITH RECURSIVE body — no driver loop, no Python
    state on either side.

    Determinism: daily observations are exact cents-sum/count
    rationals; each filter step is a fixed scalar IEEE chain on the
    previous step's (x, P) only — sequential by construction, no
    merge-order freedom — and outputs milli/micro-quantize once.

    Scale shape: ONE map-side-combinable groupBy(day) reduces the
    corpus to the bounded day dimension; the filter then runs on
    day-count rows (30 here). At 100 TB the only corpus-scaled stage
    is still that first reduce.

    Spark-side lowering (optimization round 12): the ~30-level
    recursion ran as ~30 sequential micro-jobs of per-level scheduling
    overhead (~5.3 s at sf0.1); the same (x, P) recurrence now
    left-folds over the collected day array via `seqfold.fold_states`
    — ONE job, the identical IEEE operation sequence per step (the
    fold lambda is _KALMAN_BODY's recursive term with kf. re-keyed to
    the accumulator), so the double state is bit-identical.

    Reference basis: the reference's per-interval rate smoothing and
    baseline tracking (Documentation-Self-Triggering.html:194-239);
    filter from Kalman 1960 / Harvey 1989 (public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("kalman_events")
    days = spark.sql(_KALMAN_DAYS.format(
        src="kalman_events", day=_KALMAN_DAY_SPARK))
    return fold_states(
        days.select("rn", "day", "obs"), ["rn", "day", "obs"],
        init_sql="named_struct('x', {r0}.obs, 'p', 1e0)",
        step_sql="named_struct("
                 "'x', {acc}.x + (({acc}.p + 1e-2) / ({acc}.p + 1e-2 + 1e0))"
                 " * (t.obs - {acc}.x), "
                 "'p', (1e0 - ({acc}.p + 1e-2) / ({acc}.p + 1e-2 + 1e0))"
                 " * ({acc}.p + 1e-2))",
        out_sql=["e.t.day AS day",
                 "CAST(FLOOR(e.t.obs * 1e3 + 5e-1) AS BIGINT) AS obs_milli",
                 "CAST(FLOOR(e.s.x * 1e3 + 5e-1) AS BIGINT) AS level_milli",
                 "CAST(FLOOR((e.s.p + 1e-2) / (e.s.p + 1e-2 + 1e0) * 1e6"
                 " + 5e-1) AS BIGINT) AS next_gain_micro"])


# --------------------------------------------------------------------------
# win_garch_volatility — GARCH(1,1) conditional variance recursion (daily)
# --------------------------------------------------------------------------

#: shared recursion body over the checkpointed day series ({days}): the
#: innovation eps is the daily mean's deviation from the global mean
#: (both exact quantized-integer rationals); the variance recursion
#: sigma2_t = omega + alpha*eps_{t-1}^2 + beta*sigma2_{t-1} with
#: (omega, alpha, beta) = (0.5, 0.2, 0.7) initializes at eps_1^2 and is
#: a fixed scalar IEEE chain per step — sequential by construction.
_GARCH_DAYS = """
WITH z AS (
    SELECT {day} AS day,
           CAST(SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1
),
m AS (
    SELECT day, cents / 1e2 / n AS obs,
           ROW_NUMBER() OVER (ORDER BY day) AS rn
    FROM z
),
mu AS (
    SELECT CAST(SUM(CAST(FLOOR(obs * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
               / 1e6 / COUNT(*) AS mu
    FROM m
)
SELECT m.rn, m.day, (m.obs - mu.mu) AS eps
FROM m CROSS JOIN mu
"""

_GARCH_BODY = """
WITH RECURSIVE s AS ({days}),
g(rn, day, eps, sig2) AS (
    SELECT rn, day, eps, eps * eps FROM s WHERE rn = 1
    UNION ALL
    SELECT s.rn, s.day, s.eps,
           5e-1 + 2e-1 * g.eps * g.eps + 7e-1 * g.sig2
    FROM g JOIN s ON s.rn = g.rn + 1
)
SELECT day,
       CAST(FLOOR(eps * 1e3 + 5e-1) AS BIGINT) AS eps_milli,
       CAST(FLOOR(sig2 * 1e3 + 5e-1) AS BIGINT) AS sig2_milli,
       CAST(FLOOR(SQRT(sig2) * 1e3 + 5e-1) AS BIGINT) AS vol_milli
FROM g
"""


@register("win_garch_volatility",
          oracle=_GARCH_BODY.format(
              days=_GARCH_DAYS.format(src="events",
                                      day=_KALMAN_DAY_DUCK).strip()),
          tags=("win", "timeseries"))
def win_garch_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GARCH(1,1) conditional-variance filter (Bollerslev 1986) over the
    daily mean event value's innovations: per day the realized
    innovation, the conditional variance sigma2_t = omega +
    alpha*eps_{t-1}^2 + beta*sigma2_{t-1}, and the volatility sqrt.
    The variance-tracking sibling of `win_kalman_local_level` (which
    tracks the LEVEL with fixed noise; GARCH tracks the NOISE itself) —
    the monitoring primitive for "did the metric become unstable"
    questions that a fixed Bollinger band answers wrongly under
    volatility clustering. The DuckDB oracle keeps the engine-native
    WITH RECURSIVE body, same machinery as the Kalman query.

    Determinism: daily innovations are exact quantized-integer
    rationals around a quantized-integer global mean; each variance
    step is a fixed scalar IEEE chain on the previous row only;
    outputs milli-quantize once.

    Scale shape: the corpus reduces ONCE to the day dimension; the
    filter runs on day-count rows.

    Spark-side lowering (optimization round 12): the ~30-level
    recursion ran as ~30 sequential micro-jobs of per-level scheduling
    overhead (~4.6 s at sf0.1); the same (eps, sigma2) recurrence now
    left-folds over the collected day array via `seqfold.fold_states`
    — ONE job, the identical IEEE operation sequence per step (the
    fold lambda is _GARCH_BODY's recursive term with g. re-keyed to
    the accumulator), so the double state is bit-identical, and the
    recursion-era coalesce(1).localCheckpoint becomes unnecessary
    (the day table is consumed exactly once).

    Reference basis: baseline-noise variance tracking per interval
    (Documentation-Self-Triggering.html:194-239); model from
    Bollerslev 1986 (public)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("garch_events")
    # day series via the Kalman feeder (one corpus reduce), then the
    # global mean as an UNBOUNDED window instead of _GARCH_DAYS' mu CTE
    # + cross join (whose re-reference cost a second corpus scan): the
    # same exact-integer quantized sum / 1e6 / count arithmetic, one
    # scan total; the single-partition exchange is shared with the rn
    # window already present in the feeder.
    m = spark.sql(_KALMAN_DAYS.format(src="garch_events",
                                      day=_KALMAN_DAY_SPARK))
    days = m.select(
        "rn", "day",
        (F.col("obs") - F.expr(
            "cast(sum(cast(floor(obs * 1e6 + 5e-1) as bigint)) over ()"
            " as bigint) / 1e6 / count(1) over ()")).alias("eps"))
    return fold_states(
        days.select("rn", "day", "eps"), ["rn", "day", "eps"],
        init_sql="named_struct('eps', {r0}.eps, 'sig2',"
                 " {r0}.eps * {r0}.eps)",
        step_sql="named_struct('eps', t.eps, "
                 "'sig2', 5e-1 + 2e-1 * {acc}.eps * {acc}.eps"
                 " + 7e-1 * {acc}.sig2)",
        out_sql=["e.t.day AS day",
                 "CAST(FLOOR(e.t.eps * 1e3 + 5e-1) AS BIGINT) AS eps_milli",
                 "CAST(FLOOR(e.s.sig2 * 1e3 + 5e-1) AS BIGINT)"
                 " AS sig2_milli",
                 "CAST(FLOOR(SQRT(e.s.sig2) * 1e3 + 5e-1) AS BIGINT)"
                 " AS vol_milli"])


# --------------------------------------------------------------------------
# win_crosscorr_lagged — lead/lag cross-correlation of two daily series
# --------------------------------------------------------------------------

#: shared body ({day} = engine epoch-day expression). Series A = daily
#: purchase count, B = daily mean event value; for each lag in -3..3
#: the PAIRED moments quantize per day at 1e3 before exact integer
#: sums, and the Pearson close rescales every sum ONCE (the /1e3) so
#: the formula sees consistent units.
_CCF_BODY = """
WITH z AS (
    SELECT {day} AS day,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
           CAST(SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1
),
m AS (SELECT day, CAST(a AS DOUBLE) AS a, cents / 1e2 / n AS b FROM z),
lags AS (SELECT l FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
         t(l)),
p AS (
    SELECT l.l, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(x.a * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sa,
           CAST(SUM(CAST(FLOOR(y.b * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sb,
           CAST(SUM(CAST(FLOOR(x.a * y.b * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sab,
           CAST(SUM(CAST(FLOOR(x.a * x.a * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS saa,
           CAST(SUM(CAST(FLOOR(y.b * y.b * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sbb
    FROM lags l JOIN m x ON TRUE JOIN m y ON y.day = x.day + l.l
    GROUP BY l.l
)
SELECT l AS lag, n,
       CAST(FLOOR((n * (sab / 1e3) - (sa / 1e3) * (sb / 1e3))
            / SQRT((n * (saa / 1e3) - (sa / 1e3) * (sa / 1e3))
                   * (n * (sbb / 1e3) - (sb / 1e3) * (sb / 1e3)))
            * 1e6 + 5e-1) AS BIGINT) AS ccf_micro
FROM p
WHERE n > 1
  AND (n * (saa / 1e3) - (sa / 1e3) * (sa / 1e3)) > 0e0
  AND (n * (sbb / 1e3) - (sb / 1e3) * (sb / 1e3)) > 0e0
"""


@register("win_crosscorr_lagged",
          oracle=_CCF_BODY.format(src="events", day=_KALMAN_DAY_DUCK),
          tags=("win", "timeseries"))
def win_crosscorr_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation function (Box & Jenkins 1970) between
    the daily purchase count and the daily mean event value at lags -3
    to +3: does activity LEAD value or follow it, and by how many days?
    The two-series member of the time-series census —
    `agg_autocorr` correlates a series with itself;
    `win_rolling_correlation` tracks contemporaneous co-movement; the
    CCF's asymmetry across lags is the causal-direction hint that
    decides which series belongs on the right-hand side of a forecast.

    Determinism: both daily series are exact quantized-integer
    rationals; per-lag paired moments quantize per day at 1e3 before
    exact integer sums (any partitioning); each lag's Pearson close is
    one fixed-order IEEE chain with all sums rescaled once.

    Scale shape: ONE map-side-combinable groupBy(day) reduces the
    corpus; the 7-row lag grid crosses the bounded day table and the
    lag pairing is an equi-join on (day + l). Nothing after the first
    reduce scales with the corpus.

    Reference basis: lead/lag comparison of channel-rate series
    (Documentation-Self-Triggering.html:194-239); CCF from Box &
    Jenkins 1970 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ccf_events")
    return spark.sql(_CCF_BODY.format(src="ccf_events",
                                      day=_KALMAN_DAY_SPARK))


# --------------------------------------------------------------------------
# win_periodogram — Schuster periodogram of the daily revenue series
# --------------------------------------------------------------------------

#: epoch-day seams for l_shipdate (the lineitem twin of the events pair
#: above — DuckDB `epoch_us // us_per_day`, Spark `unix_micros div`).
_PGRAM_DAY_DUCK = "CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)"
_PGRAM_DAY_SPARK = ("cast(unix_micros(cast(l_shipdate as timestamp))"
                    " div 86400000000 as bigint)")

#: shared body ({day} = engine epoch-day expression). The daily revenue
#: series reduces the fact table once (cent-quantized integer sums); the
#: 6-row literal period grid crosses the BOUNDED day table; per-(day,
#: period) Fourier terms quanti-scale at 1e-2 before exact integer sums,
#: and each period's power close is one fixed-order IEEE chain.
_PGRAM_BODY = """
WITH day AS (
    SELECT {day} AS d,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1e0 - l_discount) * 1e2
                               + 5e-1) AS BIGINT)) AS BIGINT) AS rev_c
    FROM {src}
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1995-07-01'
    GROUP BY 1
),
st AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(rev_c AS DOUBLE)) AS mu
    FROM day
),
grid AS (SELECT p FROM (VALUES (2), (3), (5), (7), (14), (30)) t(p)),
terms AS (
    SELECT g.p,
           CAST(FLOOR((CAST(d.rev_c AS DOUBLE) - s.mu)
                      * COS(2e0 * PI() * (d.d % g.p) / g.p)
                      * 1e-2 + 5e-1) AS BIGINT) AS ct,
           CAST(FLOOR((CAST(d.rev_c AS DOUBLE) - s.mu)
                      * SIN(2e0 * PI() * (d.d % g.p) / g.p)
                      * 1e-2 + 5e-1) AS BIGINT) AS sn
    FROM day d JOIN grid g ON TRUE JOIN st s ON TRUE
)
SELECT p AS period,
       CAST(FLOOR((CAST(SUM(ct) AS DOUBLE) * SUM(ct)
                   + CAST(SUM(sn) AS DOUBLE) * SUM(sn))
                  / (SELECT n FROM st) * 1e-4 + 5e-1) AS BIGINT)
           AS power_u
FROM terms
GROUP BY p
ORDER BY p
"""


@register("win_periodogram",
          oracle=_PGRAM_BODY.format(src="lineitem", day=_PGRAM_DAY_DUCK),
          tags=("win", "timeseries"))
def win_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram (Schuster 1898) of the daily revenue series
    at candidate periods {2, 3, 5, 7, 14, 30} days: spectral power
    I(p) = (|sum x_t cos(2 pi t/p)|^2 + |sum x_t sin(2 pi t/p)|^2) / n
    over the mean-centered series. The frequency-domain member of the
    seasonality census — `agg_seasonality_strength` measures one known
    cycle's variance share, `win_stl_lite` decomposes it; the
    periodogram FINDS the cycle by scanning candidate periods (the
    weekly peak dominates here, as the shipping calendar plants).

    Determinism: the daily series is an exact cent-quantized integer
    reduce; mu is one exact-integer-sum division (identical double both
    engines); each (day, period) Fourier term is a fixed-order IEEE
    chain centi-scaled to integers before order-free exact sums; the
    power close is one fixed-order chain per period. Engine libm
    cos/sin agreement is the `join_geo_grid_neighbors` precedent
    (quantization absorbs last-ulp wiggle away from boundaries).

    Scale shape: ONE map-side-combinable groupBy(day) reduces the
    fact table (filter pushed to the parquet scan); the 6-row literal
    period grid crosses only the bounded day table (allowlisted
    constant-bounded cross). Nothing after the first reduce scales
    with the corpus.

    Reference basis: periodic-structure scans over per-interval rate
    series (Documentation-Self-Triggering.html:194-239); periodogram
    from Schuster 1898 (public)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pgram_lineitem")
    return spark.sql(_PGRAM_BODY.format(src="pgram_lineitem",
                                        day=_PGRAM_DAY_SPARK))


# --------------------------------------------------------------------------
# win_unit_root_adf — Dickey-Fuller unit-root probe of the daily series
# --------------------------------------------------------------------------

#: shared body ({day} = engine epoch-day expression): the daily mean
#: value series, the one-day-lag pairing, and the Dickey-Fuller
#: regression dy_t = gamma * y_{t-1} + eps with OLS gamma and its
#: t-statistic — paired moments 1e3-quantized per day before exact
#: integer sums, closes fixed-order.
_ADF_BODY = """
WITH day AS (
    SELECT {day} AS d,
           CAST(SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1
),
m AS (SELECT d, cents / 1e2 / n AS y FROM day),
p AS (
    SELECT a.d, b.y AS ylag, a.y - b.y AS dy
    FROM m a JOIN m b ON a.d = b.d + 1
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(ylag * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sx,
           CAST(SUM(CAST(FLOOR(dy * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sy,
           CAST(SUM(CAST(FLOOR(ylag * ylag * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sxx,
           CAST(SUM(CAST(FLOOR(ylag * dy * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sxy,
           CAST(SUM(CAST(FLOOR(dy * dy * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS syy
    FROM p
)
SELECT n,
       CAST(FLOOR((n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
                  / (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3))
                  * 1e6 + 5e-1) AS BIGINT) AS gamma_micro,
       CAST(FLOOR(
           ((n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
            / (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)))
           / SQRT(
               ((n * (syy / 1e3) - (sy / 1e3) * (sy / 1e3)
                 - ((n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
                    * (n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3)))
                   / (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)))
                / (n - 2))
               / (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)) * n)
           * 1e3 + 5e-1) AS BIGINT) AS t_stat_milli
FROM mom
WHERE n > 2 AND (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)) > 0e0
  AND (n * (syy / 1e3) - (sy / 1e3) * (sy / 1e3))
      * (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3))
      > (n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
        * (n * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
"""


@register("win_unit_root_adf",
          oracle=_ADF_BODY.format(src="events", day=_KALMAN_DAY_DUCK),
          tags=("win", "timeseries"))
def win_unit_root_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root probe (Dickey & Fuller 1979, the
    no-constant-no-trend form): regress the daily mean-value first
    difference on the lagged level, dy_t = gamma * y_{t-1} + eps. A
    gamma near 0 (t-stat above the DF critical band) says the series
    is a random walk — differencing is mandatory before any of the
    stationarity-assuming tools downstream; strongly negative gamma
    says mean reversion. The missing prerequisite check of the
    time-series family: `win_hurst_exponent` measures long memory,
    `agg_mann_kendall_trend` tests monotone drift; DF answers the
    is-it-even-stationary question that decides whether levels or
    differences feed the Holt/ARIMA-class forecasters.

    Determinism: the daily series is an exact quantized-integer
    rational; the lag pairing is an integer equi-join; paired moments
    1e3-quantize per day before exact integer sums; the OLS slope and
    its t-statistic are each one fixed-order IEEE chain (the shared
    five-sum regression algebra of `win_rolling_slope`).

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the lag
    join and the close run over the bounded day table. Nothing after
    the first reduce scales with the corpus.

    Reference basis: rate-stability gating before trend alarms
    (Documentation-Self-Triggering.html:194-239); test from Dickey &
    Fuller 1979 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("adf_events")
    return spark.sql(_ADF_BODY.format(src="adf_events",
                                      day=_KALMAN_DAY_SPARK))


# --------------------------------------------------------------------------
# win_pacf_durbin — partial autocorrelation via Durbin-Levinson
# --------------------------------------------------------------------------

#: shared body ({day} = engine epoch-day expression): ACF at lags
#: 1..3 of the daily event-count series, then the Durbin-Levinson
#: recursion unrolled to the lag-3 partial autocorrelations.
_PACF_BODY = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
st AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(c AS DOUBLE)) AS mu,
           SUM((CAST(c AS DOUBLE) - (SELECT AVG(CAST(c AS DOUBLE))
                                     FROM day))
               * (CAST(c AS DOUBLE) - (SELECT AVG(CAST(c AS DOUBLE))
                                       FROM day))) AS c0
    FROM day
),
lagk AS (
    SELECT k.l,
           SUM((CAST(a.c AS DOUBLE) - s.mu)
               * (CAST(b.c AS DOUBLE) - s.mu)) AS ck
    FROM (SELECT l FROM (VALUES (1), (2), (3)) t(l)) k
    JOIN day a ON TRUE
    JOIN day b ON b.d = a.d + k.l
    JOIN st s ON TRUE
    GROUP BY k.l
),
r AS (
    SELECT MAX(CASE WHEN l = 1 THEN ck END)
               / (SELECT c0 FROM st) AS r1,
           MAX(CASE WHEN l = 2 THEN ck END)
               / (SELECT c0 FROM st) AS r2,
           MAX(CASE WHEN l = 3 THEN ck END)
               / (SELECT c0 FROM st) AS r3
    FROM lagk
),
dl AS (
    SELECT r1, r2, r3,
           r1 AS p1,
           (r2 - r1 * r1) / (1e0 - r1 * r1) AS p2,
           r1 * (1e0 - (r2 - r1 * r1) / (1e0 - r1 * r1)) AS phi21
    FROM r
)
SELECT CAST(FLOOR(r1 * 1e6 + 5e-1) AS BIGINT) AS acf1_micro,
       CAST(FLOOR(r2 * 1e6 + 5e-1) AS BIGINT) AS acf2_micro,
       CAST(FLOOR(r3 * 1e6 + 5e-1) AS BIGINT) AS acf3_micro,
       CAST(FLOOR(p1 * 1e6 + 5e-1) AS BIGINT) AS pacf1_micro,
       CAST(FLOOR(p2 * 1e6 + 5e-1) AS BIGINT) AS pacf2_micro,
       CAST(FLOOR((r3 - phi21 * r2 - p2 * r1)
                  / (1e0 - phi21 * r1 - p2 * r2) * 1e6 + 5e-1)
            AS BIGINT) AS pacf3_micro
FROM dl
WHERE 1e0 - r1 * r1 > 0e0
  AND ABS(1e0 - phi21 * r1 - p2 * r2) > 1e-12
"""


@register("win_pacf_durbin",
          oracle=_PACF_BODY.format(src="events", day=_KALMAN_DAY_DUCK),
          tags=("win", "timeseries"))
def win_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations of the daily event-count series at
    lags 1-3 via the Durbin-Levinson recursion (Durbin 1960; Box &
    Jenkins' AR-order identification tool): pacf(k) is the lag-k
    correlation AFTER regressing out lags 1..k-1 — the statistic
    whose cutoff picks the AR order, where the raw ACF
    (`agg_autocorr`) decays and cannot. Completes the Box-Jenkins
    identification kit: ACF (`agg_autocorr`), stationarity gate
    (`win_unit_root_adf`), spectral scan (`win_periodogram`), and now
    the AR-order probe.

    Determinism: the daily series is exact integer counts; mu and
    the centered products derive from exact integer sums in
    fixed-order chains (the lag pairing is an integer equi-join);
    the unrolled Durbin-Levinson algebra is one scalar IEEE chain;
    degenerate denominators are guarded on the same doubles both
    engines compute.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the
    3-row lag grid crosses only the bounded day table (allowlisted);
    everything after is scalar algebra.

    Reference basis: autoregressive structure identification on
    per-interval rate series (Documentation-Self-Triggering.html:
    194-239); recursion from Durbin 1960 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("pacf_events")
    return spark.sql(_PACF_BODY.format(src="pacf_events",
                                       day=_KALMAN_DAY_SPARK))


# --------------------------------------------------------------------------
# win_ljung_box — portmanteau whiteness test of the daily event series
# --------------------------------------------------------------------------

#: shared body ({day} = engine epoch-day expression over events.ts).
#: The centered series is integer-scaled by n (z_t = c_t*n - S, an
#: exact int64 with zero mean), so every lag covariance is an exact
#: integer sum; the five autocorrelations and the Q statistic are one
#: fixed-order scalar IEEE chain (each lag pulled into its own column
#: via MAX(CASE), never a float SUM over an unordered set).
_LJUNG_BOX_BODY = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
    FROM day
),
z AS (
    SELECT day.d, day.c * t.n - t.s AS z
    FROM day JOIN tot t ON TRUE
),
c0 AS (SELECT CAST(SUM(z * z) AS BIGINT) AS c0 FROM z),
lagk AS (
    SELECT k.l, CAST(SUM(a.z * b.z) AS BIGINT) AS ck
    FROM (SELECT l FROM (VALUES (1), (2), (3), (4), (5)) t(l)) k
    JOIN z a ON TRUE
    JOIN z b ON b.d = a.d + k.l
    GROUP BY k.l
),
r AS (
    SELECT t.n,
           MAX(CASE WHEN l = 1 THEN ck END) * 1e0 / c0.c0 AS r1,
           MAX(CASE WHEN l = 2 THEN ck END) * 1e0 / c0.c0 AS r2,
           MAX(CASE WHEN l = 3 THEN ck END) * 1e0 / c0.c0 AS r3,
           MAX(CASE WHEN l = 4 THEN ck END) * 1e0 / c0.c0 AS r4,
           MAX(CASE WHEN l = 5 THEN ck END) * 1e0 / c0.c0 AS r5
    FROM lagk JOIN c0 ON TRUE JOIN tot t ON TRUE
    WHERE c0.c0 > 0
    GROUP BY t.n, c0.c0
)
SELECT n, CAST(5 AS BIGINT) AS df,
       CAST(FLOOR(r1 * 1e6 + 5e-1) AS BIGINT) AS acf1_micro,
       CAST(FLOOR(r5 * 1e6 + 5e-1) AS BIGINT) AS acf5_micro,
       CAST(FLOOR(n * (n + 2e0)
                  * (r1 * r1 / (n - 1e0) + r2 * r2 / (n - 2e0)
                     + r3 * r3 / (n - 3e0) + r4 * r4 / (n - 4e0)
                     + r5 * r5 / (n - 5e0)) * 1e6 + 5e-1) AS BIGINT)
           AS q_lb_micro
FROM r
WHERE n > 5
"""


@register("win_ljung_box",
          oracle=_LJUNG_BOX_BODY.format(src="events", day=_KALMAN_DAY_DUCK),
          tags=("win", "timeseries"))
def win_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over the first five autocorrelations of
    the daily event-count series (Ljung & Box 1978): Q = n(n+2)
    sum_{k=1..5} rho_k^2/(n-k), the is-this-noise gate the Box-Jenkins
    kit was missing — ACF (`agg_autocorr`) and PACF (`win_pacf_durbin`)
    identify structure lag by lag, the ADF gate (`win_unit_root_adf`)
    tests stationarity, and Ljung-Box tests ALL low lags jointly, which
    is how residuals are certified white after a model fit
    (`agg_forecast_backtest`'s residual stream is the intended input at
    scale).

    Determinism: the centered series is integer-scaled by n (z = c*n -
    S, exact int64, zero mean), so c0 and every lag covariance are
    exact integer sums; the five rho_k and the Q close are one
    fixed-order scalar chain with each lag in its own MAX(CASE) column
    (never a float SUM across an unordered lag set). Degenerate
    constant series (c0 = 0) and too-short series (n <= 5) are guarded
    on integers.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the
    5-row lag grid joins only the bounded day table (allowlisted
    broadcast); everything after is 1-row algebra. Nothing downstream
    scales with the corpus.

    Reference basis: per-interval trigger-rate whiteness checks
    (Documentation-Self-Triggering.html:194-239); statistic from Ljung
    & Box 1978 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ljung_events")
    return spark.sql(_LJUNG_BOX_BODY.format(src="ljung_events",
                                            day=_KALMAN_DAY_SPARK))
