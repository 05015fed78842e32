"""§2.2/§2.3/§2.4/§2.5/§2.8 — round-4 SQL-surface completions.

Reshape (UNPIVOT), statistical aggregates by exact moment algebra,
LATERAL joins, correlated subqueries, time-based RANGE frames and
calendar densification: the remaining ANSI-SQL surface a user of a
general engine expects beyond the reference's own operator list. Each is
declared through Catalyst (no Python in any hot path) and hash-checked
against DuckDB under the portable-determinism discipline of
``portable.py`` (integer moment sums; identical IEEE scalar expressions).

Reference analogs: wide->long reshape is the heatmap-matrix inverse
(DAQ_self-triggering.md:92), correlation/regression-by-aggregates is the
S-curve operating-point fit generalized (Documentation-Self-Triggering.html:194),
the calendar densification is the dense 16x16 grid densification
(DAQ_self-triggering.md:85) applied to the time axis, and the trailing
RANGE frame is the L1A rate monitor over a true time horizon
(DAQ_self-triggering.md:235-236).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.portable import exact_sum, pround, qint, sql_exact_sum, sql_round
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "reshape_unpivot",
    oracle="""
        WITH wide AS (
            SELECT c_nationkey,
                   CAST(COUNT(*) AS DOUBLE) AS n_customers,
                   (CAST(SUM(CAST(FLOOR(c_acctbal * 1e2 + 5e-1) AS BIGINT))
                         AS BIGINT) / 1e2) AS total_acctbal,
                   (CAST(SUM(CAST(FLOOR(c_acctbal * 1e2 + 5e-1) AS BIGINT))
                         AS BIGINT) / (COUNT(*) * 1e2)) AS avg_acctbal
            FROM customer GROUP BY c_nationkey
        )
        SELECT c_nationkey, metric, value
        FROM wide UNPIVOT (value FOR metric IN
                           (n_customers, total_acctbal, avg_acctbal))
    """,
    tags=("reshape",),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long melt (``unpivot``/``stack``): the inverse of the pivot
    heatmap (DAQ_self-triggering.md:92) and the canonical export shape for
    metric stores. Aggregate once per nation, then emit one (metric, value)
    row per measure. Scale: the unpivot itself is a row-local Expand —
    no shuffle beyond the one aggregation; output is measures x groups,
    never data-sized."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        exact_sum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        (F.sum(qint(F.col("c_acctbal"), 2))
         / (F.count(F.lit(1)) * F.lit(100.0))).alias("avg_acctbal"),
    )
    return wide.unpivot(
        ["c_nationkey"], ["n_customers", "total_acctbal", "avg_acctbal"],
        "metric", "value")


@register(
    "agg_corr_regr",
    oracle=f"""
        WITH m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(xq) AS DOUBLE) AS sx,
                   CAST(SUM(yq) AS DOUBLE) AS sy,
                   CAST(SUM(xq * xq) AS DOUBLE) AS sxx,
                   CAST(SUM(yq * yq) AS DOUBLE) AS syy,
                   CAST(SUM(xq * yq) AS DOUBLE) AS sxy
            FROM (
                SELECT l_returnflag,
                       CAST(FLOOR(l_quantity * 1e2 + 5e-1) AS BIGINT) AS xq,
                       CAST(FLOOR(l_extendedprice + 5e-1) AS BIGINT) AS yq
                FROM lineitem
            )
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               {sql_round('(n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)} AS corr_qty_price,
               {sql_round('((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e2', 4)} AS regr_slope,
               {sql_round('(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n', 4)} AS regr_intercept
        FROM m
    """,
    tags=("agg", "stats"),
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + least-squares line per group by exact moment algebra —
    the S-curve operating-point regression generalized
    (Documentation-Self-Triggering.html:194). The built-in ``corr``/``regr_*``
    aggregates sum doubles in partial-aggregation order, which is not
    reproducible across engines; instead the five moments are exact int64
    sums of per-row quantized values (quantity in cents, price in dollars),
    and corr/slope/intercept are single fixed-order IEEE expressions over
    those exact integers — bit-identical on any engine, any partitioning.
    Scale: one partial->final hash aggregate, six map-side-combinable sums;
    the slope rescale (*1e2) undoes the cent quantization of x."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        qint(F.col("l_quantity"), 2).alias("xq"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long").alias("yq"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xq").cast("double").alias("sx"),
        F.sum("yq").cast("double").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).cast("double").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).cast("double").alias("syy"),
        F.sum(F.col("xq") * F.col("yq")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope_q = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        pround((n * sxy - sx * sy)
               / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        .alias("corr_qty_price"),
        pround(slope_q * F.lit(100.0), 4).alias("regr_slope"),
        pround((sy - slope_q * sx) / n, 4).alias("regr_intercept"),
    )


@register(
    "join_lateral",
    oracle="""
        SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n CROSS JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """,
    tags=("join", "lateral"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — "the two
    richest customers of every nation", the per-outer-row derived table
    every analyst reaches for. Catalyst decorrelates it into
    WindowGroupLimit (partial top-k before the shuffle, map-side) + one
    broadcast hash join — no nested loop, no per-row re-execution; the
    lateral is planning sugar over the same top-k-per-group physical plan
    that survives 100 TB. Total-order tie-break (acctbal DESC, custkey)
    keeps the LIMIT deterministic."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "nation").createOrReplaceTempView("t_lat_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("t_lat_customer")
    return spark.sql("""
        SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        FROM t_lat_nation n JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM t_lat_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """)


_SUBQUERY_SQL = """
    SELECT c.c_custkey,
           (SELECT n_name FROM {nation} WHERE n_nationkey = c.c_nationkey)
               AS nation_name,
           c.c_acctbal
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'O')
      AND c.c_nationkey IN (SELECT n_nationkey
                            FROM {nation} n JOIN {region} r
                              ON n.n_regionkey = r.r_regionkey
                            WHERE r.r_name = 'ASIA')
      AND NOT EXISTS (SELECT 1 FROM {orders} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice > 3e5)
"""


@register(
    "subquery_correlated",
    oracle=_SUBQUERY_SQL.format(nation="nation", region="region",
                                customer="customer", orders="orders"),
    tags=("subquery",),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery surface in one statement: a scalar subquery
    in the projection, EXISTS / NOT EXISTS membership probes and an
    uncorrelated IN list — the same SQL text runs on Spark SQL and DuckDB
    (the readiness-set logic of the watchdog, DAQ_self-triggering.md:284,
    written the way a SQL user writes it). Catalyst decorrelates every one
    of them to joins: the scalar subquery and IN list become broadcast
    hash joins, EXISTS/NOT EXISTS become left-semi/left-anti — nothing
    re-executes per row, so the shape is cluster-safe as-is."""
    ensure_deterministic(spark)
    for t in ("nation", "region", "customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"t_sq_{t}")
    return spark.sql(_SUBQUERY_SQL.format(
        nation="t_sq_nation", region="t_sq_region",
        customer="t_sq_customer", orders="t_sq_orders"))


@register(
    "win_range_time_frame",
    oracle="""
        SELECT event_id, user_id,
               SUM(CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT)) OVER w / 1e2
                   AS trailing_1h_value,
               CAST(COUNT(*) OVER w AS BIGINT) AS trailing_1h_n
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
        )
    """,
    tags=("window", "range-frame"),
)
def win_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True time-horizon trailing window: per-user sum/count of the last
    hour of events — a RANGE frame over epoch seconds, not a row count
    (the L1A rate monitor, DAQ_self-triggering.md:235-236, over wall
    clock). RANGE semantics include all peer rows of the current order
    value, so ties need no tie-break to be deterministic; the summed
    measure is integer-quantized so accumulation order is irrelevant.
    One shuffle on user_id + one per-partition sort — same cost class as
    any window; the frame bound is evaluated by binary search per row,
    not a rescan."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").cast("long"))
         .rangeBetween(-3600, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        (F.sum(qint(F.col("value"), 2)).over(w) / F.lit(100.0))
        .alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


@register(
    "fn_sequence_calendar",
    oracle=f"""
        WITH rng AS (
            SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
                   CAST(MAX(o_orderdate) AS DATE) AS d1
            FROM orders
        ),
        days AS (
            SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM rng
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   COUNT(*) AS n_orders,
                   {sql_exact_sum('o_totalprice', 2)} AS revenue
            FROM orders GROUP BY 1
        )
        SELECT d.day, COALESCE(daily.n_orders, 0) AS n_orders,
               COALESCE(daily.revenue, 0e0) AS revenue
        FROM days d LEFT JOIN daily ON d.day = daily.day
    """,
    tags=("function", "calendar"),
)
def fn_sequence_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a gap-free daily series over the data's own
    date span, zero-filled where no orders landed — the dense 16x16 grid
    densification (DAQ_self-triggering.md:85) applied to the time axis,
    and the shape every monitoring dashboard needs (a missing day must
    read 0, not vanish). ``sequence()`` + explode generates the spine from
    a 1-row min/max aggregate (broadcast — the spine is tiny however big
    the fact table), then a left join attaches the real daily rollup."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    rng = o.agg(F.min(F.to_date("o_orderdate")).alias("d0"),
                F.max(F.to_date("o_orderdate")).alias("d1"))
    days = rng.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  exact_sum(F.col("o_totalprice"), 2).alias("revenue")))
    return (days.join(daily, "day", "left")
            .select("day",
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                    F.coalesce("revenue", F.lit(0.0)).alias("revenue")))


_ACF_SQL = """
WITH series AS (
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT event_type, cnt,
           lead(cnt, 1) OVER (PARTITION BY event_type ORDER BY h) AS y1,
           lead(cnt, 2) OVER (PARTITION BY event_type ORDER BY h) AS y2,
           lead(cnt, 3) OVER (PARTITION BY event_type ORDER BY h) AS y3
    FROM series
), k AS (
    SELECT event_type, lag, n_pairs,
           CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
           CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
           CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy
    FROM (
        SELECT event_type, l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs, COUNT(*) AS n,
               SUM(cnt) AS sx,
               SUM(CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2 ELSE y3 END) AS sy,
               SUM(cnt * cnt) AS sxx,
               SUM(CASE l.lag WHEN 1 THEN y1 * y1 WHEN 2 THEN y2 * y2
                   ELSE y3 * y3 END) AS syy,
               SUM(cnt * CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2 ELSE y3 END)
                   AS sxy
        FROM lagged, (SELECT unnest([1, 2, 3]) AS lag) l
        WHERE CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2 ELSE y3 END IS NOT NULL
        GROUP BY 1, 2
    )
)
SELECT event_type, CAST(lag AS INT) AS lag, n_pairs,
       (FLOOR(((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1e6 + 5e-1)
        / 1e6) AS acf
FROM k
"""


@register("agg_autocorr", oracle=_ACF_SQL, tags=("agg", "timeseries"))
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of the hourly event-rate series per event
    type — the periodicity check on the L1A trigger-rate monitor
    (DAQ_self-triggering.md:235-236): a detector retriggering on its own
    dead-time echo shows up as structure in the ACF. Same exact-moment
    discipline as ``agg_corr_regr``: hourly counts are integers, the five
    moments per (type, lag) are exact int64 sums, and each ACF value is one
    fixed-order IEEE expression over them — bit-identical cross-engine.

    Plan: one windowed lead pass over the (tiny, aggregated) series, then
    ``stack`` melts the three lags so a SINGLE partial->final aggregate
    computes all moments (no per-lag re-scan). The series table is
    |types| x |hours| — metadata-sized relative to the event log, so the
    per-type window sort is never the bottleneck; the event-log scan
    feeding it is a map-side-combinable count."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    series = (ev.groupBy("event_type",
                         F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = series.select(
        "event_type", "cnt",
        *[F.lead("cnt", k).over(w).alias(f"y{k}") for k in (1, 2, 3)])
    melted = (lagged
              .selectExpr("event_type", "cnt",
                          "stack(3, 1, y1, 2, y2, 3, y3) AS (lag, y)")
              .where(F.col("y").isNotNull()))
    m = melted.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cnt").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("cnt") * F.col("y")).cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "event_type", F.col("lag").cast("int").alias("lag"),
        n.cast("long").alias("n_pairs"),
        pround((n * sxy - sx * sy)
               / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        .alias("acf"))


_SCD2_SQL = """
WITH marked AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
           lag(o_orderpriority) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
    FROM orders
), changes AS (
    SELECT * FROM marked WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(strftime(lead(o_orderdate) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                '%Y-%m-%d'), '9999-12-31') AS valid_to,
       lead(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
           AS is_current
FROM changes
QUALIFY custkey % 100 = 0
"""


@register("reshape_scd2", oracle=_SCD2_SQL, tags=("reshape", "dimension"))
def reshape_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse an event history
    into attribute validity intervals ``[valid_from, valid_to)`` with an
    open current row — how the run-log's mutable per-run config snapshots
    (DAQ_self-triggering.md:46-51) become a queryable history table.
    Change points come from one ``lag`` pass (value differs from
    predecessor), interval ends from one ``lead`` pass over the change
    points; total order within a key is (date, orderkey) so same-day
    updates are deterministic. The % 100 projection keeps the published
    slice small; the windows run over the full history.

    Scale: two window passes over the SAME (custkey)-partitioned sort —
    Catalyst reuses one shuffle+sort for both; no self-join, no global
    sort. The sentinel 9999-12-31 open end keeps the output joinable with
    BETWEEN at any as-of date."""
    ensure_deterministic(spark)
    od = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = od.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev"))
    changes = marked.where(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
    return (changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd"),
            F.lit("9999-12-31")).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"))
        .where(F.col("custkey") % 100 == 0))


_COHORT_SQL = """
WITH firsts AS (
    SELECT user_id, date_trunc('day', MIN(ts)) AS c0 FROM events GROUP BY 1
), act AS (
    SELECT e.user_id, f.c0,
           date_diff('day', f.c0, date_trunc('day', e.ts)) AS offset_days
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(c0, '%Y-%m-%d') AS cohort_day,
       CAST(offset_days AS INT) AS offset_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM act WHERE offset_days <= 3 GROUP BY 1, 2
"""


_FUNNEL_SQL = """
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS ts1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS ts2
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.ts1
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS ts3
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT 1 AS stage, 'view' AS stage_name,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
        UNION ALL
        SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM t2
        UNION ALL
        SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM t3
    )
    SELECT stage, stage_name, n_users,
           (FLOOR(n_users * 1.0
                  / LAG(n_users, 1, n_users) OVER (ORDER BY stage)
                  * 1e6 + 5e-1) / 1e6) AS conv_from_prev,
           (FLOOR(n_users * 1.0
                  / FIRST_VALUE(n_users) OVER (ORDER BY stage)
                  * 1e6 + 5e-1) / 1e6) AS conv_from_start
    FROM counts
"""


@register("agg_event_funnel", oracle=_FUNNEL_SQL,
          tags=("agg", "analytics", "funnel"))
def agg_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED event funnel (view -> click -> purchase) — the other
    product-analytics staple next to cohort retention, and the sequence
    primitive engines ship as funnel()/windowFunnel(): a user counts at
    stage k only if the stages happened IN ORDER (first view, then the
    first click strictly after it, then the first purchase strictly after
    that — not mere per-stage existence). Shape: one min-aggregate per
    stage with a join back to the previous stage's frontier timestamp —
    each stage is a per-user hash aggregate plus an equi-join against a
    |users|-sized (broadcastable) frontier, so a k-stage funnel is k
    bounded passes, never a per-user event sort. The 3-row census carries
    quantized step and cumulative conversion rates."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    t1 = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("ts1")))
    t2 = (ev.where(F.col("event_type") == "click")
          .join(t1, "user_id").where(F.col("ts") > F.col("ts1"))
          .groupBy("user_id").agg(F.min("ts").alias("ts2")))
    t3 = (ev.where(F.col("event_type") == "purchase")
          .join(t2, "user_id").where(F.col("ts") > F.col("ts2"))
          .groupBy("user_id").agg(F.min("ts").alias("ts3")))
    counts = (
        t1.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.lit(1).alias("stage"), F.lit("view").alias("stage_name"),
                "n_users")
        .unionByName(
            t2.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(F.lit(2).alias("stage"),
                    F.lit("view>click").alias("stage_name"), "n_users"))
        .unionByName(
            t3.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(F.lit(3).alias("stage"),
                    F.lit("view>click>purchase").alias("stage_name"),
                    "n_users")))
    w = Window.orderBy("stage")
    return counts.select(
        "stage", "stage_name", "n_users",
        pround(F.col("n_users") * F.lit(1.0)
               / F.coalesce(F.lag("n_users", 1).over(w),
                            F.col("n_users")), 6).alias("conv_from_prev"),
        pround(F.col("n_users") * F.lit(1.0)
               / F.first("n_users").over(w), 6).alias("conv_from_start"))


@register("agg_cohort_retention", oracle=_COHORT_SQL,
          tags=("agg", "analytics"))
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the product-analytics staple: users grouped by
    their FIRST active day, then distinct-active counts at each day
    offset (the retention curve's raw matrix, offsets 0..3). For the
    reference this is module-commissioning survival: of the channels
    first seen in run-day d, how many still fire k days on
    (DAQ_self-triggering.md:30-39 run cadence). Shape: one min-aggregate
    for cohort assignment, one equi-join back (self-broadcastable — the
    cohort table is |users|), one distinct-count aggregate — every stage
    partial/final, no window at all."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("DAY", F.min("ts")).alias("c0"))
    act = (ev.join(firsts, "user_id")
           .select("user_id", "c0",
                   F.datediff(F.date_trunc("DAY", F.col("ts")), F.col("c0"))
                   .alias("offset_days")))
    return (act.groupBy(F.date_format("c0", "yyyy-MM-dd").alias("cohort_day"),
                        "offset_days")
            .agg(F.count_distinct("user_id").alias("n_active"))
            .where(F.col("offset_days") <= 3))


# --------------------------------------------------------------------------
# reshape_transpose — DataFrame.transpose (Spark 4.0)
# --------------------------------------------------------------------------

_TRANSPOSE_ORACLE = """
WITH a AS (
    SELECT l_returnflag AS f,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS DOUBLE)
               AS qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                AS DOUBLE) AS rev_cents
    FROM lineitem GROUP BY 1
)
SELECT 'n' AS key,
       MAX(CASE WHEN f = 'A' THEN n END) AS "A",
       MAX(CASE WHEN f = 'N' THEN n END) AS "N",
       MAX(CASE WHEN f = 'R' THEN n END) AS "R"
FROM a
UNION ALL
SELECT 'qty',
       MAX(CASE WHEN f = 'A' THEN qty END),
       MAX(CASE WHEN f = 'N' THEN qty END),
       MAX(CASE WHEN f = 'R' THEN qty END)
FROM a
UNION ALL
SELECT 'rev_cents',
       MAX(CASE WHEN f = 'A' THEN rev_cents END),
       MAX(CASE WHEN f = 'N' THEN rev_cents END),
       MAX(CASE WHEN f = 'R' THEN rev_cents END)
FROM a
"""


# --------------------------------------------------------------------------
# agg_ohlc_resample — time-bucket OHLC downsampling (min_by / max_by)
# --------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH e AS (
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_h,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS cents,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
    FROM events
)
SELECT event_type, bucket_h,
       arg_min(cents, ord_key) AS open_c,
       MAX(cents)              AS high_c,
       MIN(cents)              AS low_c,
       arg_max(cents, ord_key) AS close_c,
       COUNT(*)                AS n_events
FROM e
GROUP BY 1, 2
"""


@register("agg_ohlc_resample", oracle=_OHLC_ORACLE, tags=("agg", "timeseries"))
def agg_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to open/high/low/close bars per
    (event_type, hour) — the canonical resample every monitoring and
    market pipeline runs. "First/last value in the bucket" is expressed
    with ``min_by``/``max_by`` over a total ordering key, NOT a window
    sort: the whole bar is one hash aggregation with map-side partials,
    so no per-bucket row sort ever happens. The ordering key is a
    zero-padded ``(epoch_us, event_id)`` string because both engines
    order VARCHAR identically and DuckDB's ``arg_min`` takes no struct
    key; ``event_id`` breaks hypothetical timestamp ties
    deterministically. Values quantized to integer cents per the
    portable-determinism discipline (portable.py).

    Reference analog: the per-spill rate history downsampled to the
    monitoring cadence (DAQ_self-triggering.md:235-236).

    Scale shape: ONE shuffle on (event_type, bucket) with partial
    aggregation; at 100 TB the bucket count is time-bounded (8,760
    buckets/type/year), so the reduced side is tiny regardless of input
    row count — this is the aggregation shape you want instead of a
    ``row_number() OVER (PARTITION BY bucket ORDER BY ts)`` pair, which
    would sort every event twice."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("long")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"))
    e = ev.select("event_type",
                  F.date_trunc("hour", "ts").alias("bucket_h"),
                  cents.alias("cents"), ord_key.alias("ord_key"))
    return (e.groupBy("event_type", "bucket_h")
            .agg(F.min_by("cents", "ord_key").alias("open_c"),
                 F.max("cents").alias("high_c"),
                 F.min("cents").alias("low_c"),
                 F.max_by("cents", "ord_key").alias("close_c"),
                 F.count(F.lit(1)).cast("long").alias("n_events")))


@register("reshape_transpose", oracle=_TRANSPOSE_ORACLE,
          tags=("reshape", "sql"))
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0): flip a small per-flag metric
    summary so METRICS become rows and the three return flags become
    columns — the report layout every summary table ends up in, now an
    engine primitive instead of a hand-written unpivot+pivot pair (the
    oracle spells out exactly that manual expansion, proving the sugar).
    Transpose is defined only for frames whose value columns share a
    common type, so the metrics are pre-cast to DOUBLE (integer cents
    stay exact in a double far beyond fixture scale — < 2^53).

    Scale shape: transpose COLLECTS the first column to name the output
    columns, i.e. it is a driver-sized operation by contract — correct
    here because the input is the |flags|-row aggregate of a distributed
    pass, never a fact table; the heavy work (partial/final agg with the
    pushed-down scan) happens before the flip. Input ordered by flag so
    the emitted column order is deterministic."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    agg = (li.groupBy(F.col("l_returnflag").alias("f"))
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.sum(F.floor(F.col("l_quantity") + F.lit(0.5))
                      .cast("long")).cast("double").alias("qty"),
                F.sum(F.floor(F.col("l_extendedprice") * F.lit(1e2)
                              + F.lit(0.5)).cast("long")).cast("double")
                .alias("rev_cents"))
           .orderBy("f"))
    return agg.transpose()


# --------------------------------------------------------------------------
# agg_attribution_last_touch — marketing attribution over the event stream
# --------------------------------------------------------------------------

_ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds

_ATTRIB_SQL = f"""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS cents,
           last_value(CASE WHEN event_type IN ('click', 'view')
                           THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_us,
           last_value(CASE WHEN event_type IN ('click', 'view')
                           THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type
    FROM events
)
SELECT CASE WHEN touch_us IS NOT NULL
             AND ts_us - touch_us <= {_ATTRIB_WINDOW_US}
            THEN touch_type ELSE 'none' END AS attributed_to,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM e
WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("agg_attribution_last_touch", oracle=_ATTRIB_SQL,
          tags=("agg", "timeseries"))
def agg_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: credit each purchase to the most
    recent click/view by the same user within a 7-day lookback, else
    'none' — the canonical marketing-analytics query, and the single-
    table sibling of the union+window as-of join (`join_asof`): because
    touches and conversions live in ONE ordered stream, the "find my
    latest preceding touch" step is a conditional ``last(..., ignore
    nulls)`` running window, NOT a range join — no pair blowup, no
    second shuffle.

    Determinism: the window orders by (epoch_us, event_id) — a total
    order — and both the touch timestamp and its type are picked by the
    SAME frame, so they always come from the same touch row; the 7-day
    horizon compares exact integer microseconds; revenue is integer
    cents.

    Scale shape: one shuffle on user_id (bounded per-user history),
    one running window, then a 3-row aggregation. At 100 TB this is
    the shape you want — the naive alternative (purchases range-joined
    to touches) shuffles twice and fans out per (purchase × touch)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"), "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col("event_type").isin("click", "view")
    e = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("long")
        .alias("cents"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w).alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w).alias("touch_type"))
    attributed = F.when(
        F.col("touch_us").isNotNull()
        & ((F.col("ts_us") - F.col("touch_us")) <= _ATTRIB_WINDOW_US),
        F.col("touch_type")).otherwise(F.lit("none"))
    return (e.where(F.col("event_type") == "purchase")
            .groupBy(attributed.alias("attributed_to"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"),
                 F.sum("cents").cast("long").alias("revenue_cents")))


# --------------------------------------------------------------------------
# agg_market_basket_lift — association rules over order baskets
# --------------------------------------------------------------------------

_BASKET_MIN_AB, _BASKET_TOPK = 5, 15

_BASKET_SQL = f"""
WITH items AS (
    SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM items),
freq AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_with FROM items GROUP BY 1
),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_ab
    FROM items a JOIN items b
      ON a.okey = b.okey AND a.brand < b.brand
    GROUP BY 1, 2
),
scored AS (
    SELECT p.brand_a, p.brand_b, fa.n_with AS n_a, fb.n_with AS n_b,
           p.n_ab, n.n_orders,
           CAST(FLOOR(CAST(p.n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
                      * 1e6 + 5e-1) AS BIGINT) AS support_micro,
           CAST(FLOOR(CAST(p.n_ab AS DOUBLE) / CAST(fa.n_with AS DOUBLE)
                      * 1e6 + 5e-1) AS BIGINT) AS conf_micro,
           CAST(FLOOR(CAST(p.n_ab * n.n_orders AS DOUBLE)
                      / CAST(fa.n_with * fb.n_with AS DOUBLE)
                      * 1e6 + 5e-1) AS BIGINT) AS lift_micro
    FROM pairs p
    JOIN freq fa ON p.brand_a = fa.brand
    JOIN freq fb ON p.brand_b = fb.brand
    CROSS JOIN n
    WHERE p.n_ab >= {_BASKET_MIN_AB}
)
SELECT brand_a, brand_b, n_a, n_b, n_ab, support_micro, conf_micro,
       lift_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift_micro DESC, brand_a,
                                   brand_b) AS rk
      FROM scored)
WHERE rk <= {_BASKET_TOPK}
"""


@register("agg_market_basket_lift", oracle=_BASKET_SQL,
          tags=("agg", "association"))
def agg_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant 1994, the
    Apriori support/confidence frame plus lift): which part brands
    co-occur in the same order more than independence predicts. Emits
    the top-15 brand pairs by lift with their exact support counts —
    the recommender/assortment primitive every retail warehouse runs.

    The pair generation is the TEXTBOOK bounded self-join: distinct
    (order, brand) first — so fan-out per order is C(basket,2) with
    basket ≈ a few brands, NEVER lineitem² — then an equi-join on the
    order key with `brand_a < brand_b` deduplicating orientations.
    Support/confidence/lift are single IEEE divisions of exact int64
    counts, micro-quantized; the top-k has a total-order tie-break.

    Scale shape: one dimension hash join (part side broadcast-eligible),
    one distinct reduce, one co-partitioned self-join on okey, two
    vocabulary-sized frequency joins, one |pairs|-row window. At 100 TB
    the order-keyed self-join stays linear in baskets because the
    per-key width is basket-bounded by schema."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    items = (li.join(part, li.l_partkey == part.p_partkey)
             .select(F.col("l_orderkey").alias("okey"),
                     F.col("p_brand").alias("brand"))
             .distinct()
             # four consumers (both self-join sides, freq, n): materialize
             # the basket table once instead of re-running join+distinct
             .localCheckpoint(eager=True))
    n = items.agg(F.count_distinct("okey").cast("long").alias("n_orders"))
    freq = items.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_with"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (a.join(b, (F.col("a.okey") == F.col("b.okey"))
                    & (F.col("a.brand") < F.col("b.brand")))
             .groupBy(F.col("a.brand").alias("brand_a"),
                      F.col("b.brand").alias("brand_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
             .where(F.col("n_ab") >= _BASKET_MIN_AB))
    fa = freq.select(F.col("brand").alias("brand_a"),
                     F.col("n_with").alias("n_a"))
    fb = freq.select(F.col("brand").alias("brand_b"),
                     F.col("n_with").alias("n_b"))
    q6 = lambda e: F.floor(e * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (pairs.join(F.broadcast(fa), "brand_a")
              .join(F.broadcast(fb), "brand_b")
              .crossJoin(F.broadcast(n))
              .select("brand_a", "brand_b", "n_a", "n_b", "n_ab",
                      q6(F.col("n_ab").cast("double")
                         / F.col("n_orders").cast("double"))
                      .alias("support_micro"),
                      q6(F.col("n_ab").cast("double")
                         / F.col("n_a").cast("double")).alias("conf_micro"),
                      q6((F.col("n_ab") * F.col("n_orders")).cast("double")
                         / (F.col("n_a") * F.col("n_b")).cast("double"))
                      .alias("lift_micro")))
    w = Window.orderBy(F.col("lift_micro").desc(), "brand_a", "brand_b")
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= _BASKET_TOPK).drop("rk"))


# --------------------------------------------------------------------------
# agg_sessionize_events — 30-minute-gap sessionization census
# --------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSIONIZE_SQL = f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS tus
    FROM events
),
flagged AS (
    SELECT user_id, tus,
           CASE WHEN LAG(tus) OVER w IS NULL
                  OR tus - LAG(tus) OVER w > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tus)
),
sessions AS (
    SELECT user_id, tus,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
),
per AS (
    SELECT user_id, sid,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(tus) - MIN(tus) AS BIGINT) AS span_us
    FROM sessions GROUP BY user_id, sid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(SUM(span_us) AS BIGINT) AS active_us
FROM per GROUP BY user_id
"""


@register("agg_sessionize_events", oracle=_SESSIONIZE_SQL,
          tags=("agg", "analytics", "session"))
def agg_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min) — the classic
    lag-flag-then-running-sum lowering of session windows (the batch twin
    of `stream_session_window`'s native session aggregation, and the
    per-user census behind every product-analytics "sessions per user /
    events per session" report). Timestamps work in exact epoch
    microseconds end to end, so every comparison and span is integer
    arithmetic.

    Scale shape: ONE user_id shuffle serves both windows (lag and the
    running session counter share the same partition/order), then two
    map-side-combinable aggregations on (user, session) and (user). Each
    user's partition sorts only its own events — no global sort; for a
    mega-user the same contract lowers to the session-window native
    aggregation (`F.session_window`) which needs no per-user sort at
    all."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", F.unix_micros("ts").alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus")
    flagged = e.select(
        "user_id", "tus",
        F.when(F.lag("tus").over(w).isNull()
               | ((F.col("tus") - F.lag("tus").over(w))
                  > F.lit(_SESSION_GAP_US)), 1).otherwise(0)
        .alias("new_session"))
    wrun = (Window.partitionBy("user_id").orderBy("tus")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sessions = flagged.select(
        "user_id", "tus", F.sum("new_session").over(wrun).alias("sid"))
    per = (sessions.groupBy("user_id", "sid")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                (F.max("tus") - F.min("tus")).cast("long").alias("span_us")))
    return (per.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
                 F.sum("n_events").cast("long").alias("n_events"),
                 F.max("n_events").cast("long").alias("max_session_events"),
                 F.sum("span_us").cast("long").alias("active_us")))


# --------------------------------------------------------------------------
# agg_seasonality_profile — hour-of-week activity/value profile
# --------------------------------------------------------------------------

_SEASONALITY_SQL = """
WITH e AS (
    SELECT isodow(ts) - 1 AS dow, CAST(hour(ts) AS INT) AS hr,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS vc
    FROM events
),
per AS (
    SELECT CAST(dow AS INT) AS dow, hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(vc) AS BIGINT) AS sum_cents
    FROM e GROUP BY dow, hr
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n FROM per)
SELECT p.dow, p.hr, p.n_events, p.sum_cents,
       CAST((2000000 * p.sum_cents + p.n_events)
            // (2 * p.n_events) AS BIGINT) AS mean_value_centimicro,
       CAST((2000 * p.n_events + t.n) // (2 * t.n) AS BIGINT)
           AS share_permille
FROM per p, tot t
"""


@register("agg_seasonality_profile", oracle=_SEASONALITY_SQL,
          tags=("agg", "analytics", "timeseries"))
def agg_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile — the 7x24 activity/value grid
    behind anomaly baselines and capacity planning ("is Tuesday 14:00
    unusually quiet *for a Tuesday 14:00*"): per (day-of-week, hour)
    cell, event count, exact cent totals, round-half-up mean value and
    traffic share. Day-of-week uses Spark ``weekday`` == DuckDB
    ``isodow - 1`` (Monday=0) — the one calendar convention the two
    engines can share exactly; the UTC session pin makes hour extraction
    identical.

    Scale shape: ONE map-side-combinable reduce onto at most 168 cells;
    the share denominator re-aggregates those cells (no second scan).
    The follow-on anomaly test (observed vs cell baseline) is a
    broadcast join of this grid against the live window."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select(F.weekday("ts").cast("int").alias("dow"),
                  F.hour("ts").cast("int").alias("hr"),
                  F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5))
                  .cast("long").alias("vc"))
    per = (e.groupBy("dow", "hr")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("vc").cast("long").alias("sum_cents"))
           .localCheckpoint(eager=False))   # feeds output + the total
    tot = per.agg(F.sum("n_events").cast("long").alias("tot_n"))
    return (per.crossJoin(F.broadcast(tot))
            .select("dow", "hr", "n_events", "sum_cents",
                    F.expr("cast((2000000 * sum_cents + n_events)"
                           " div (2 * n_events) as bigint)")
                    .alias("mean_value_centimicro"),
                    F.expr("cast((2000 * n_events + tot_n)"
                           " div (2 * tot_n) as bigint)")
                    .alias("share_permille")))


# --------------------------------------------------------------------------
# agg_seasonal_anomaly — hour instances vs their hour-of-week baseline
# --------------------------------------------------------------------------

_SEASONAL_ANOM_TOPK = 15

_SEASONAL_ANOM_SQL = f"""
WITH e AS (
    SELECT CAST(isodow(ts) - 1 AS INT) AS dow, CAST(hour(ts) AS INT) AS hr,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id
    FROM events
),
inst AS (
    SELECT dow, hr, hour_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM e GROUP BY dow, hr, hour_id
),
cell AS (
    SELECT dow, hr,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS s1,
           CAST(SUM(n * n) AS BIGINT) AS s2
    FROM inst GROUP BY dow, hr
),
z AS (
    SELECT i.hour_id, i.dow, i.hr, i.n,
           CAST(FLOOR((i.n - CAST(c.s1 AS DOUBLE) / c.k)
                      / sqrt(GREATEST((c.s2 - CAST(c.s1 AS DOUBLE) * c.s1
                                       / c.k) / c.k, 1e0))
                      * 1e6 + 5e-1) AS BIGINT) AS z_micro
    FROM inst i JOIN cell c ON i.dow = c.dow AND i.hr = c.hr
    WHERE c.k >= 2
)
SELECT hour_id, dow, hr, n, z_micro
FROM z
ORDER BY abs(z_micro) DESC, hour_id
LIMIT {_SEASONAL_ANOM_TOPK}
"""


@register("agg_seasonal_anomaly", oracle=_SEASONAL_ANOM_SQL,
          tags=("agg", "analytics", "anomaly"))
def agg_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection — `agg_seasonality_profile`'s follow-on
    stage made concrete: each CALENDAR HOUR's event count is z-scored
    against its own hour-of-week cell's distribution (a Tuesday-14:00
    instance compared only to other Tuesday-14:00s), and the top
    deviations surface with their cell context. This baseline-relative
    form is the alert that absolute thresholds can't give: a quiet
    Sunday 3 AM count that would be normal for Monday noon still flags.

    Determinism: cell mean/variance from exact int64 count sums (counts,
    never measures — no quantization needed), one fixed-order z
    expression, z micro-quantized BEFORE the |z| top-k comparator; the
    population variance is floored at 1 (a count-noise unit) so
    constant cells cannot divide by zero — spelled identically in both
    engines.

    Scale shape: one (dow, hr, hour_id) map-side-combinable reduce, a
    168-cell re-aggregation of those rows, a broadcast-sized join back,
    and a TakeOrderedAndProject top-k. The corpus is touched once."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select(F.weekday("ts").cast("int").alias("dow"),
                  F.hour("ts").cast("int").alias("hr"),
                  F.expr("unix_micros(ts) div 3600000000").cast("long")
                  .alias("hour_id"))
    inst = (e.groupBy("dow", "hr", "hour_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .localCheckpoint(eager=False))   # feeds the cell grain + join
    cell = (inst.groupBy("dow", "hr")
            .agg(F.count(F.lit(1)).cast("long").alias("k"),
                 F.sum("n").cast("long").alias("s1"),
                 F.sum(F.col("n") * F.col("n")).cast("long").alias("s2")))
    mean = F.col("s1").cast("double") / F.col("k")
    var = (F.col("s2") - F.col("s1").cast("double") * F.col("s1")
           / F.col("k")) / F.col("k")
    z = (F.col("n") - mean) / F.sqrt(F.greatest(var, F.lit(1.0)))
    return (inst.join(F.broadcast(cell.where(F.col("k") >= 2)),
                      ["dow", "hr"])
            .select("hour_id", "dow", "hr", "n",
                    F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("z_micro"))
            .orderBy(F.abs(F.col("z_micro")).desc(), "hour_id")
            .limit(_SEASONAL_ANOM_TOPK))


# --------------------------------------------------------------------------
# agg_funnel_latency — time-to-convert between ordered funnel stages
# --------------------------------------------------------------------------

_FUNNEL_LATENCY_SQL = """
WITH t1 AS (
    SELECT user_id, MIN(ts) AS ts1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, MIN(e.ts) AS ts2
    FROM events e JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.ts1
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, MIN(e.ts) AS ts3
    FROM events e JOIN t2 ON e.user_id = t2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
    GROUP BY e.user_id
),
d AS (
    SELECT 'view>click' AS step,
           CAST(epoch_us(t2.ts2) - epoch_us(t1.ts1) AS BIGINT) AS lat_us
    FROM t1 JOIN t2 ON t1.user_id = t2.user_id
    UNION ALL
    SELECT 'click>purchase' AS step,
           CAST(epoch_us(t3.ts3) - epoch_us(t2.ts2) AS BIGINT) AS lat_us
    FROM t2 JOIN t3 ON t2.user_id = t3.user_id
),
r AS (
    SELECT step, lat_us,
           ROW_NUMBER() OVER (PARTITION BY step
                              ORDER BY lat_us, lat_us) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY step) AS BIGINT) AS k
    FROM d
)
SELECT step, MAX(k) AS n_users,
       CAST(MIN(lat_us) AS BIGINT) AS min_us,
       CAST(MAX(CASE WHEN rn = (k + 1) // 2 THEN lat_us END) AS BIGINT)
           AS median_lower_us,
       CAST(MAX(lat_us) AS BIGINT) AS max_us,
       CAST((2 * SUM(lat_us) + MAX(k)) // (2 * MAX(k)) AS BIGINT)
           AS mean_us
FROM r GROUP BY step
"""


@register("agg_funnel_latency", oracle=_FUNNEL_LATENCY_SQL,
          tags=("agg", "analytics", "funnel"))
def agg_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between ordered funnel stages — the latency half
    `agg_event_funnel`'s conversion counts leave out (product teams act
    on "how LONG from first view to first strictly-later click", not
    just how many): per step, user count, min/lower-median/mean/max
    latency in exact integer microseconds. The median is the exact
    lower order statistic (rank ⌈k/2⌉ per step, deterministic tie order)
    — no interpolation, no floats anywhere in the whole query.

    Scale shape: the same k bounded frontier passes as the funnel (per
    stage: one user-keyed min-aggregate plus a \\|users\\|-sized
    broadcastable join); the latency table is \\|users\\| rows per step,
    so the per-step rank window sorts user-count rows, never events."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    t1 = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("ts1")))
    t2 = (ev.where(F.col("event_type") == "click")
          .join(t1, "user_id").where(F.col("ts") > F.col("ts1"))
          .groupBy("user_id").agg(F.min("ts").alias("ts2")))
    t3 = (ev.where(F.col("event_type") == "purchase")
          .join(t2.select("user_id", "ts2"), "user_id")
          .where(F.col("ts") > F.col("ts2"))
          .groupBy("user_id").agg(F.min("ts").alias("ts3")))
    d = (t1.join(t2, "user_id")
         .select(F.lit("view>click").alias("step"),
                 (F.unix_micros("ts2") - F.unix_micros("ts1"))
                 .cast("long").alias("lat_us"))
         .unionByName(
             t2.join(t3, "user_id")
             .select(F.lit("click>purchase").alias("step"),
                     (F.unix_micros("ts3") - F.unix_micros("ts2"))
                     .cast("long").alias("lat_us"))))
    w = Window.partitionBy("step").orderBy("lat_us", "lat_us")
    wk = Window.partitionBy("step")
    r = d.select("step", "lat_us",
                 F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(wk).cast("long").alias("k"))
    return (r.groupBy("step")
            .agg(F.max("k").alias("n_users"),
                 F.min("lat_us").cast("long").alias("min_us"),
                 F.max(F.when(F.col("rn") == F.expr("(k + 1) div 2"),
                              F.col("lat_us")).otherwise(None))
                 .cast("long").alias("median_lower_us"),
                 F.max("lat_us").cast("long").alias("max_us"),
                 F.expr("cast((2 * sum(lat_us) + max(k))"
                        " div (2 * max(k)) as bigint)").alias("mean_us")))


# --------------------------------------------------------------------------
# agg_ship_latency — order-to-ship latency percentiles per priority
# --------------------------------------------------------------------------

_SHIP_LATENCY_SQL = """
WITH d AS (
    SELECT o.o_orderpriority AS priority,
           CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                // 86400000000 AS BIGINT) AS lat_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
),
g AS (
    SELECT priority, lat_days, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM d GROUP BY priority, lat_days
),
r AS (
    SELECT priority, lat_days, cnt,
           COALESCE(SUM(cnt) OVER (PARTITION BY priority ORDER BY lat_days
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cb,
           CAST(SUM(cnt) OVER (PARTITION BY priority) AS BIGINT) AS n
    FROM g
)
SELECT priority, MAX(n) AS n_lines,
       CAST(MIN(lat_days) AS BIGINT) AS min_days,
       CAST(MAX(CASE WHEN cb < (n + 1) // 2
                      AND cb + cnt >= (n + 1) // 2
                     THEN lat_days END) AS BIGINT) AS p50_days,
       CAST(MAX(CASE WHEN cb * 100 < n * 95
                      AND (cb + cnt) * 100 >= n * 95
                     THEN lat_days END) AS BIGINT) AS p95_days,
       CAST(MAX(lat_days) AS BIGINT) AS max_days,
       CAST((2000 * SUM(lat_days * cnt) + MAX(n))
            // (2 * MAX(n)) AS BIGINT) AS mean_days_milli
FROM r GROUP BY priority
"""


@register("agg_ship_latency", oracle=_SHIP_LATENCY_SQL,
          tags=("agg", "analytics", "latency"))
def agg_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority — the SLA
    report every fulfillment/ops dashboard leads with: exact integer-day
    latencies, per-priority min / exact p50 / exact p95 / max / milli
    mean. Percentiles are EXACT without ranking any row: latencies
    reduce to a (priority, days) value-count table (days are bounded),
    and the order statistic is the value whose cumulative band straddles
    the rank threshold — integer comparisons only (the `ext_quality_auc`
    midrank discipline applied to percentile lookup).

    Scale shape: one fact-dimension equi-join (orderkey), one
    map-side-combinable (priority, days) reduce, windows over the
    ~\\|priorities\\|·\\|distinct days\\| reduced table. The corpus is
    scanned once; nothing row-level is ever sorted."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    d = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .where(F.col("l_shipdate") >= F.col("o_orderdate"))
         .select(F.col("o_orderpriority").alias("priority"),
                 F.expr("(unix_micros(cast(l_shipdate as timestamp))"
                        " - unix_micros(cast(o_orderdate as timestamp)))"
                        " div 86400000000").cast("long")
                 .alias("lat_days")))
    g = (d.groupBy("priority", "lat_days")
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
         .localCheckpoint(eager=False))   # feeds both windows + the agg
    wcum = (Window.partitionBy("priority").orderBy("lat_days")
            .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("priority")
    r = g.select("priority", "lat_days", "cnt",
                 F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("cb"),
                 F.sum("cnt").over(wall).cast("long").alias("n"))
    half = F.expr("(n + 1) div 2")
    return (r.groupBy("priority")
            .agg(F.max("n").alias("n_lines"),
                 F.min("lat_days").cast("long").alias("min_days"),
                 F.max(F.when((F.col("cb") < half)
                              & (F.col("cb") + F.col("cnt") >= half),
                              F.col("lat_days"))).cast("long")
                 .alias("p50_days"),
                 F.max(F.when((F.col("cb") * 100 < F.col("n") * 95)
                              & ((F.col("cb") + F.col("cnt")) * 100
                                 >= F.col("n") * 95),
                              F.col("lat_days"))).cast("long")
                 .alias("p95_days"),
                 F.max("lat_days").cast("long").alias("max_days"),
                 F.expr("cast((2000 * sum(lat_days * cnt) + max(n))"
                        " div (2 * max(n)) as bigint)")
                 .alias("mean_days_milli")))


# --------------------------------------------------------------------------
# agg_new_vs_returning — daily active users split by first-seen day
# --------------------------------------------------------------------------

_NEW_RET_SQL = """
WITH e AS (
    SELECT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
    FROM events
),
active AS (SELECT DISTINCT user_id, day FROM e),
first AS (SELECT user_id, MIN(day) AS first_day FROM active GROUP BY user_id)
SELECT a.day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(CASE WHEN f.first_day = a.day THEN 1 END) AS BIGINT)
           AS n_new,
       CAST(COUNT(CASE WHEN f.first_day < a.day THEN 1 END) AS BIGINT)
           AS n_returning
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY a.day
"""


@register("agg_new_vs_returning", oracle=_NEW_RET_SQL,
          tags=("agg", "analytics"))
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into new vs returning — the topline
    growth metric next to `agg_cohort_retention`'s cohort matrix (this
    is the daily scalar the dashboard leads with; the cohort matrix is
    its diagnosis view). A user is NEW on exactly their first active
    day (min epoch-day, exact integer arithmetic) and RETURNING on every
    later active day.

    Scale shape: one (user, day) distinct reduce, one per-user min
    re-aggregation of those rows, one user-keyed equi-join back
    (broadcastable at bounded user counts, plain shuffle otherwise),
    one day-keyed reduce. The event table is scanned once; no windows."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id",
                  F.expr("unix_micros(ts) div 86400000000").cast("long")
                  .alias("day"))
    active = e.distinct().localCheckpoint(eager=False)  # feeds both grains
    first = active.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (active.join(first, "user_id")
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("n_active"),
                 F.count_if(F.col("first_day") == F.col("day"))
                 .cast("long").alias("n_new"),
                 F.count_if(F.col("first_day") < F.col("day"))
                 .cast("long").alias("n_returning")))


# --------------------------------------------------------------------------
# win_rank_movers — day-over-day volume-rank migration per event type
# --------------------------------------------------------------------------

_RANK_MOVERS_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
    FROM events
),
per AS (
    SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM e GROUP BY day, event_type
),
r AS (
    SELECT day, event_type, n,
           CAST(ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY n DESC, event_type) AS INT)
               AS rk
    FROM per
),
d AS (
    SELECT day, event_type, n, rk,
           LAG(rk) OVER (PARTITION BY event_type ORDER BY day) AS prev_rk
    FROM r
)
SELECT day, event_type, n, rk,
       CAST(prev_rk - rk AS INT) AS rank_delta
FROM d WHERE prev_rk IS NOT NULL AND prev_rk <> rk
"""


@register("win_rank_movers", oracle=_RANK_MOVERS_SQL,
          tags=("window", "analytics", "rank"))
def win_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-migration ("movers") report: event types ranked by daily
    volume, emitting only the (day, type) cells whose rank CHANGED from
    the previous day with the signed delta — the leaderboard-diff every
    trending/anomaly dashboard renders, here with fully deterministic
    ties (volume desc, then name).

    Scale shape: the corpus reduces to a (day, type) count grid first,
    so BOTH windows (per-day ranking, per-type day-lag) run over grid
    rows — bounded by days x types, never event-scale. One scan, one
    reduce, two cheap grid windows."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    per = (ev.select("event_type",
                     F.expr("unix_micros(ts) div 86400000000")
                     .cast("long").alias("day"))
           .groupBy("day", "event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wd = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    r = per.select("day", "event_type", "n",
                   F.row_number().over(wd).cast("int").alias("rk"))
    wt = Window.partitionBy("event_type").orderBy("day")
    d = r.select("day", "event_type", "n", "rk",
                 F.lag("rk").over(wt).alias("prev_rk"))
    return (d.where(F.col("prev_rk").isNotNull()
                    & (F.col("prev_rk") != F.col("rk")))
            .select("day", "event_type", "n", "rk",
                    (F.col("prev_rk") - F.col("rk")).cast("int")
                    .alias("rank_delta")))


# --------------------------------------------------------------------------
# agg_event_transitions — per-user event-type transition (Sankey) matrix
# --------------------------------------------------------------------------

_TRANSITIONS_SQL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
    FROM events
),
p AS (
    SELECT user_id, event_type AS to_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY tus, event_id) AS from_type
    FROM e
),
t AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
),
m AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM t
      GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n,
       CAST((2000 * t.n + m.n_from) // (2 * m.n_from) AS BIGINT)
           AS p_permille
FROM t JOIN m ON t.from_type = m.from_type
"""


@register("agg_event_transitions", oracle=_TRANSITIONS_SQL,
          tags=("agg", "analytics", "markov"))
def agg_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix — the Sankey/Markov census behind
    user-flow diagrams and next-action models: per ordered (from, to)
    pair of consecutive events within a user's timeline, the count and
    the row-normalized transition probability in exact round-half-up
    permille. Deterministic ordering ties on (ts, event_id) in both
    engines.

    Scale shape: one user_id shuffle for the lag window (each partition
    sorts only its own user's events), then a map-side-combinable
    reduce onto the \\|types\\|² grid and a grid-sized row-margin join.
    The corpus is touched once."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type",
                  F.unix_micros("ts").alias("tus"), "event_id")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    p = e.select("user_id", F.col("event_type").alias("to_type"),
                 F.lag("event_type").over(w).alias("from_type"))
    t = (p.where(F.col("from_type").isNotNull())
         .groupBy("from_type", "to_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"))
         .localCheckpoint(eager=False))   # feeds the margin + the output
    m = t.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return (t.join(m, "from_type")
            .select("from_type", "to_type", "n",
                    F.expr("cast((2000 * n + n_from) div (2 * n_from)"
                           " as bigint)").alias("p_permille")))


# --------------------------------------------------------------------------
# agg_slo_burn_rate — error-budget burn rate over rolling windows
# --------------------------------------------------------------------------

_SLO_TARGET_PERMILLE = 150   # "error" event share budget: 15%

_SLO_BURN_SQL = f"""
WITH e AS (
    SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
    FROM events
),
h AS (
    SELECT hour_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(is_err) AS BIGINT) AS n_err
    FROM e GROUP BY hour_id
),
w AS (
    SELECT hour_id, n, n_err,
           CAST(SUM(n) OVER (ORDER BY hour_id ROWS BETWEEN 5 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_6h,
           CAST(SUM(n_err) OVER (ORDER BY hour_id ROWS BETWEEN 5 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS err_6h
    FROM h
)
SELECT hour_id, n, n_err,
       CAST((2000 * n_err + n) // (2 * n) AS BIGINT) AS rate_permille,
       CAST((2000000 * n_err + n * {_SLO_TARGET_PERMILLE})
            // (2 * n * {_SLO_TARGET_PERMILLE}) AS BIGINT)
           AS burn_1h_milli,
       CAST((2000000 * err_6h + n_6h * {_SLO_TARGET_PERMILLE})
            // (2 * n_6h * {_SLO_TARGET_PERMILLE}) AS BIGINT)
           AS burn_6h_milli,
       CASE WHEN (2000000 * n_err + n * {_SLO_TARGET_PERMILLE})
                 // (2 * n * {_SLO_TARGET_PERMILLE}) >= 2000
             AND (2000000 * err_6h + n_6h * {_SLO_TARGET_PERMILLE})
                 // (2 * n_6h * {_SLO_TARGET_PERMILLE}) >= 2000
            THEN 1 ELSE 0 END AS page_alert
FROM w
"""


@register("agg_slo_burn_rate", oracle=_SLO_BURN_SQL,
          tags=("agg", "analytics", "slo"))
def agg_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate with multi-window alerting (the Google
    SRE workbook pattern): per hour, the error-event share against a
    {t}‰ budget as a burn-rate multiple (1.0 = burning exactly the
    budget), over both the 1 h and trailing 6 h windows, with the page
    condition = BOTH windows burning ≥ 2x — the construction that pages
    on real sustained burn but not on a single noisy hour. All rates
    and burn multiples are exact round-half-up integer milli-units; the
    alert predicate is integer comparisons spelled identically in both
    engines.

    Scale shape: the corpus reduces to one row per hour first, so the
    trailing-window frame runs over \\|hours\\| rows; at fleet scale the
    same query shards by (service, hour) and the global window becomes
    per-service. One scan, one reduce, one bounded window."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    e = ev.select(F.expr("unix_micros(ts) div 3600000000").cast("long")
                  .alias("hour_id"),
                  F.when(F.col("event_type") == "error", 1).otherwise(0)
                  .alias("is_err"))
    h = (e.groupBy("hour_id")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("is_err").cast("long").alias("n_err"))
         .localCheckpoint(eager=False))   # feeds the frame + the output
    wf = Window.orderBy("hour_id").rowsBetween(-5, Window.currentRow)
    w = h.select("hour_id", "n", "n_err",
                 F.sum("n").over(wf).cast("long").alias("n_6h"),
                 F.sum("n_err").over(wf).cast("long").alias("err_6h"))
    T = _SLO_TARGET_PERMILLE
    burn1 = F.expr(f"(2000000 * n_err + n * {T}) div (2 * n * {T})")
    burn6 = F.expr(f"(2000000 * err_6h + n_6h * {T})"
                   f" div (2 * n_6h * {T})")
    return w.select(
        "hour_id", "n", "n_err",
        F.expr("cast((2000 * n_err + n) div (2 * n) as bigint)")
        .alias("rate_permille"),
        burn1.cast("long").alias("burn_1h_milli"),
        burn6.cast("long").alias("burn_6h_milli"),
        F.when((burn1 >= 2000) & (burn6 >= 2000), 1).otherwise(0)
        .alias("page_alert"))


agg_slo_burn_rate.__doc__ = agg_slo_burn_rate.__doc__.format(
    t=_SLO_TARGET_PERMILLE)


# --------------------------------------------------------------------------
# ext_session_paths — top session journey prefixes (first 3 steps)
# --------------------------------------------------------------------------

_SESSION_PATHS_TOPK = 12

_SESSION_PATHS_SQL = f"""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
    FROM events
),
flagged AS (
    SELECT user_id, event_type, tus, event_id,
           CASE WHEN LAG(tus) OVER w IS NULL
                  OR tus - LAG(tus) OVER w > {30 * 60 * 1_000_000}
                THEN 1 ELSE 0 END AS new_session
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
sess AS (
    SELECT user_id, event_type, tus, event_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus,
                                  event_id ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
),
stepped AS (
    SELECT user_id, sid, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, sid
                              ORDER BY tus, event_id) AS step
    FROM sess
),
paths AS (
    SELECT user_id, sid,
           MAX(CASE WHEN step = 1 THEN event_type END)
           || '>' || COALESCE(MAX(CASE WHEN step = 2 THEN event_type END),
                              '(end)')
           || '>' || COALESCE(MAX(CASE WHEN step = 3 THEN event_type END),
                              '(end)') AS path
    FROM stepped WHERE step <= 3
    GROUP BY user_id, sid
),
t AS (
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths
    GROUP BY path
),
tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS n FROM t)
SELECT path, n_sessions,
       CAST((2000 * n_sessions + tt.n) // (2 * tt.n) AS BIGINT)
           AS share_permille
FROM t, tot tt
ORDER BY n_sessions DESC, path
LIMIT {_SESSION_PATHS_TOPK}
"""


@register("ext_session_paths", oracle=_SESSION_PATHS_SQL,
          tags=("ext", "analytics", "session"))
def ext_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session journeys — the first three steps of each 30-minute
    session concatenated into a path string ('view>click>purchase'),
    censused and ranked: the entry-flow report product teams read
    before funnels are even defined (funnels assume you KNOW the path;
    this discovers it). Short sessions pad with '(end)', making
    path-length information explicit. Reuses `agg_sessionize_events`'
    gap-flag lowering; the first-3 extraction is conditional MAX per
    step (no ordered string aggregation, whose tie semantics differ
    between engines).

    Scale shape: one user_id shuffle serves the gap flag, the session
    counter, and the per-session step rank (same partition/order); the
    path census is a map-side-combinable reduce on the path string and
    the top-k lowers to TakeOrderedAndProject."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type",
                  F.unix_micros("ts").alias("tus"), "event_id")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = e.select(
        "user_id", "event_type", "tus", "event_id",
        F.when(F.lag("tus").over(w).isNull()
               | ((F.col("tus") - F.lag("tus").over(w))
                  > F.lit(30 * 60 * 1_000_000)), 1).otherwise(0)
        .alias("new_session"))
    wrun = (Window.partitionBy("user_id").orderBy("tus", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = flagged.select("user_id", "event_type", "tus", "event_id",
                          F.sum("new_session").over(wrun).alias("sid"))
    ws = Window.partitionBy("user_id", "sid").orderBy("tus", "event_id")
    stepped = sess.select("user_id", "sid", "event_type",
                          F.row_number().over(ws).alias("step"))
    step = lambda k: F.max(F.when(F.col("step") == k,  # noqa: E731
                                  F.col("event_type")))
    paths = (stepped.where(F.col("step") <= 3)
             .groupBy("user_id", "sid")
             .agg(F.concat(
                 step(1), F.lit(">"),
                 F.coalesce(step(2), F.lit("(end)")), F.lit(">"),
                 F.coalesce(step(3), F.lit("(end)"))).alias("path")))
    t = (paths.groupBy("path")
         .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
         .localCheckpoint(eager=False))   # feeds total + top-k
    tot = t.agg(F.sum("n_sessions").cast("long").alias("n"))
    return (t.crossJoin(F.broadcast(tot))
            .select("path", "n_sessions",
                    F.expr("cast((2000 * n_sessions + n) div (2 * n)"
                           " as bigint)").alias("share_permille"))
            .orderBy(F.col("n_sessions").desc(), "path")
            .limit(_SESSION_PATHS_TOPK))


# --------------------------------------------------------------------------
# agg_rfm_segments — recency / frequency / monetary customer segmentation
# --------------------------------------------------------------------------

_RFM_SQL = """
WITH per AS (
    SELECT o_custkey AS cust,
           CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
mx AS (SELECT CAST(MAX(last_us) AS BIGINT) AS now_us FROM per),
scored AS (
    SELECT cust, freq, cents,
           CAST((m.now_us - last_us) // 86400000000 AS BIGINT) AS rec_days,
           NTILE(5) OVER (ORDER BY last_us DESC, cust) AS r_score,
           NTILE(5) OVER (ORDER BY freq DESC, cust) AS f_score,
           NTILE(5) OVER (ORDER BY cents DESC, cust) AS m_score
    FROM per, mx m
),
seg AS (
    SELECT CASE
             WHEN r_score <= 2 AND f_score <= 2 THEN 'champions'
             WHEN r_score <= 2 THEN 'recent'
             WHEN f_score <= 2 THEN 'loyal_lapsing'
             WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
             ELSE 'regular' END AS segment,
           freq, cents, rec_days
    FROM scored
)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(freq) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST((2000 * SUM(rec_days) + COUNT(*)) // (2 * COUNT(*))
            AS BIGINT) AS mean_recency_days_milli
FROM seg GROUP BY segment
"""


@register("agg_rfm_segments", oracle=_RFM_SQL,
          tags=("agg", "analytics", "segmentation"))
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic recency/frequency/monetary
    customer cut: per customer, last-order recency, order count, and
    cent-exact revenue; NTILE(5) scores on each axis (deterministic
    ties on the key) folded into named segments (champions / recent /
    loyal-lapsing / at-risk / regular), censused with revenue mass and
    exact milli-day mean recency. 'Now' is the corpus max order date,
    so the query is reproducible rather than wall-clock-dependent.

    Scale shape: orders reduce to one row per customer FIRST, so the
    three ranking windows run over the customer dimension (the
    `win_ntile_percentile` contract: dimension-sized global sorts; at
    extreme customer counts swap NTILE for approx-quantile boundary
    scoring). One fact scan, one reduce, dimension windows."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    per = (o.groupBy(F.col("o_custkey").alias("cust"))
           .agg(F.max(F.expr("unix_micros(cast(o_orderdate as timestamp))"))
                .cast("long").alias("last_us"),
                F.count(F.lit(1)).cast("long").alias("freq"),
                F.sum(F.floor(F.col("o_totalprice") * F.lit(1e2)
                              + F.lit(0.5)).cast("long")).cast("long")
                .alias("cents"))
           .localCheckpoint(eager=False))   # feeds max-date + scoring
    mx = per.agg(F.max("last_us").cast("long").alias("now_us"))
    scored = (per.crossJoin(F.broadcast(mx))
              .select("cust", "freq", "cents",
                      F.expr("(now_us - last_us) div 86400000000")
                      .cast("long").alias("rec_days"),
                      F.ntile(5).over(Window.orderBy(
                          F.col("last_us").desc(), "cust")).alias("r_score"),
                      F.ntile(5).over(Window.orderBy(
                          F.col("freq").desc(), "cust")).alias("f_score"),
                      F.ntile(5).over(Window.orderBy(
                          F.col("cents").desc(), "cust")).alias("m_score")))
    seg = scored.select(
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2),
               "champions")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular").alias("segment"),
        "freq", "cents", "rec_days")
    return (seg.groupBy("segment")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.sum("freq").cast("long").alias("n_orders"),
                 F.sum("cents").cast("long").alias("revenue_cents"),
                 F.expr("cast((2000 * sum(rec_days) + count(1))"
                        " div (2 * count(1)) as bigint)")
                 .alias("mean_recency_days_milli")))


# --------------------------------------------------------------------------
# agg_markov_attribution — removal-effect channel attribution
# --------------------------------------------------------------------------

_MARKOV_ITERS = 6
_MARKOV_CHANNELS = ("view", "click", "signup", "error")

#: journey-to-transition-matrix prelude, shared verbatim by both engines
#: ({e} supplies (user_id, event_type, tus, event_id)). Journeys truncate
#: at the first purchase; output is the removal-dimension x transition
#: matrix (rm, src, dst, c, tot) — bounded by 5 x |types|² regardless of
#: corpus size.
_MARKOV_PRE = """
WITH w1 AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY tus, event_id) AS rn
    FROM {e}
),
w2 AS (
    SELECT user_id, event_type, rn,
           MIN(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id) AS conv_rn
    FROM w1
),
pre AS (
    SELECT user_id, event_type, rn, conv_rn
    FROM w2 WHERE conv_rn IS NULL OR rn < conv_rn
),
pre2 AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS prn,
           CASE WHEN conv_rn IS NULL THEN 0 ELSE 1 END AS has_conv
    FROM pre
),
tr AS (
    SELECT event_type AS src,
           COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                           ORDER BY prn),
                    CASE WHEN has_conv = 1 THEN 'CONV' ELSE 'DROP' END)
               AS dst
    FROM pre2
    UNION ALL
    SELECT 'START' AS src, event_type AS dst FROM pre2 WHERE prn = 1
    UNION ALL
    SELECT 'START' AS src, 'CONV' AS dst FROM w2
    WHERE conv_rn = 1 AND rn = 1
),
trans AS (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2
),
probs AS (
    SELECT src, dst, c,
           CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT) AS tot
    FROM trans
),
rms AS ({rms})
SELECT r.rm, p.src, p.dst, p.c, p.tot
FROM rms r JOIN probs p ON p.src <> r.rm AND p.dst <> 'DROP'
"""


def _markov_rms() -> str:
    return " UNION ALL ".join(
        f"SELECT '{c}' AS rm" for c in ("NONE",) + _MARKOV_CHANNELS)


def _markov_iter_body() -> str:
    """Absorption iterations + close, shared verbatim ({m} supplies the
    (rm, src, dst, c, tot) matrix). One CTE per iteration — standard SQL
    forbids aggregation in a recursive member — each step pico-quantizing
    the P(s,t)·p(t) contributions before the integer sum so both engines
    accumulate identically."""
    its = []
    prev = "p0"
    for k in range(1, _MARKOV_ITERS + 1):
        its.append(f"""it{k} AS (
    SELECT * FROM (
        SELECT m.rm, m.src AS state,
               CAST(SUM(CAST(FLOOR(m.c * 1e0 / m.tot * p.p * 1e12 + 5e-1)
                             AS BIGINT)) AS BIGINT) / 1e12 AS p
        FROM m JOIN {prev} p ON p.rm = m.rm AND p.state = m.dst
        GROUP BY m.rm, m.src
    ) UNION ALL SELECT rm, 'CONV' AS state, 1e0 AS p FROM rmd
)""")
        prev = f"it{k}"
    return f"""
WITH m AS ({{m}}),
rmd AS (SELECT DISTINCT rm FROM m),
p0 AS (SELECT rm, 'CONV' AS state, 1e0 AS p FROM rmd),
{",".join(its)},
rfin AS (SELECT rm, p FROM it{_MARKOV_ITERS} WHERE state = 'START'),
res AS (
    SELECT d.rm, COALESCE(x.p, 0e0) AS p
    FROM rmd d LEFT JOIN rfin x ON x.rm = d.rm
),
eff AS (
    SELECT c.rm AS channel,
           CAST(FLOOR(b.p * 1e6 + 5e-1) AS BIGINT) AS conv_base_micro,
           CAST(FLOOR(c.p * 1e6 + 5e-1) AS BIGINT) AS conv_removed_micro,
           CAST(FLOOR((b.p - c.p) / b.p * 1e6 + 5e-1) AS BIGINT)
               AS removal_micro
    FROM res c JOIN res b ON b.rm = 'NONE'
    WHERE c.rm <> 'NONE' AND b.p > 0e0
)
SELECT channel, conv_base_micro, conv_removed_micro, removal_micro,
       CASE WHEN SUM(removal_micro) OVER () = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(removal_micro * 1e6
                            / (SUM(removal_micro) OVER ()) + 5e-1)
                 AS BIGINT) END AS share_micro
FROM eff
"""


def _markov_body() -> str:
    """Full shared body ({e} supplies the event feed) — used directly by
    the oracle and the planted tests; the Spark builder splits at the
    matrix boundary to materialize the bounded `m` once."""
    pre = _MARKOV_PRE.format(e="{e}", rms=_markov_rms())
    return _markov_iter_body().format(m=pre)


_MARKOV_E_DUCK = """(
    SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
)"""


@register("agg_markov_attribution",
          oracle=_markov_body().format(e=_MARKOV_E_DUCK),
          tags=("agg", "analytics", "markov", "iterative"))
def agg_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014): per
    channel, how much of the baseline conversion probability disappears
    if the channel is removed from the first-order journey chain —
    the data-driven alternative to `agg_attribution_last_touch`, which
    structurally over-credits the final touch. Journeys run per user in
    (ts, event_id) order and truncate at the first purchase; removal
    makes a channel absorbing-without-conversion (its outgoing mass is
    lost), and conversion probability from START is evaluated by 6
    unrolled absorption iterations over the aggregated transition
    matrix — one CTE per step, since standard SQL forbids aggregation
    inside a recursive member on BOTH engines. Emits base/removed
    conversion, removal effect, and the normalized attribution share.

    Determinism: transition counts are exact integers; each iteration
    pico-quantizes P(s,t)·p(t) contributions before the integer sum
    (the `ext_pagerank_iter` discipline); all closes are fixed-order
    doubles micro-quantized. A channel whose removal DISCONNECTS
    START from conversion leaves no START row in the final iteration —
    the outer join against the removal dimension reads that absence as
    conversion 0 (removal effect 100%), the answer a fully-mediating
    channel must get (caught by self-review; the corpus never
    disconnects, so the differential suite alone could not see it).

    Scale shape: one user_id-partitioned window pass builds journey
    edges (each partition sorts only its own user's events), one
    map-side-combinable reduce onto the ≤ |types|² grid. The Spark side
    EAGERLY MATERIALIZES that bounded matrix before the iterations —
    Spark expands CTEs per reference, so without it each of the 6
    unrolled steps re-derived the full journey pipeline (measured at
    sf0.1: ~12.6 s -> ~4 s warm); every iteration then runs on the
    constant-bounded matrix, corpus-size-independent."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.select("user_id", "event_type",
              F.unix_micros("ts").alias("tus"), "event_id") \
        .createOrReplaceTempView("markov_e")
    m = spark.sql(_MARKOV_PRE.format(e="markov_e", rms=_markov_rms())) \
        .coalesce(1).localCheckpoint(eager=True)
    m.createOrReplaceTempView("markov_m")
    return spark.sql(_markov_iter_body().format(m="SELECT * FROM markov_m"))


# --------------------------------------------------------------------------
# agg_funnel_windowed — conversion funnel with a max-gap constraint
# --------------------------------------------------------------------------

_FUNNEL_GAP_US = 24 * 3600 * 1000000

#: shared body ({e} supplies (user_id, event_type, tus)). Same shape as
#: `agg_event_funnel` but each step must land within 24h of the
#: previous one — the unconstrained funnel credits conversions weeks
#: later, which product analytics never counts.
_FUNNEL_WINDOWED_SQL = f"""
WITH t1 AS (
    SELECT user_id, MIN(tus) AS t1 FROM {{e}}
    WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, MIN(e.tus) AS t2
    FROM {{e}} e JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.tus > t1.t1
      AND e.tus <= t1.t1 + {_FUNNEL_GAP_US}
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, MIN(e.tus) AS t3
    FROM {{e}} e JOIN t2 ON e.user_id = t2.user_id
    WHERE e.event_type = 'purchase' AND e.tus > t2.t2
      AND e.tus <= t2.t2 + {_FUNNEL_GAP_US}
    GROUP BY e.user_id
),
counts AS (
    SELECT 1 AS stage, 'signup' AS stage_name,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
    UNION ALL
    SELECT 2, 'signup>click_24h', CAST(COUNT(*) AS BIGINT) FROM t2
    UNION ALL
    SELECT 3, 'signup>click>purchase_24h', CAST(COUNT(*) AS BIGINT)
    FROM t3
),
base AS (SELECT MAX(CASE WHEN stage = 1 THEN n_users END) AS n1
         FROM counts)
SELECT c.stage, c.stage_name, c.n_users,
       CAST(FLOOR((2000 * c.n_users + b.n1) / (2e0 * b.n1)) AS BIGINT)
           AS of_entry_permille
FROM counts c CROSS JOIN base b
"""


@register("agg_funnel_windowed",
          oracle=_FUNNEL_WINDOWED_SQL.format(
              e="(SELECT user_id, event_type, epoch_us(ts) AS tus"
                " FROM events)"),
          tags=("agg", "analytics", "funnel"))
def agg_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-constrained conversion funnel: signup → click → purchase
    where each step must follow the previous within 24 HOURS — the
    funnel product analytics actually reports. `agg_event_funnel`'s
    unconstrained ordering credits a purchase weeks after the click;
    the windowed form is what distinguishes a working activation flow
    from coincidental later activity, and the unconstrained-minus-
    windowed gap is itself the "slow burn" metric.

    Determinism: step times are exact integer microseconds (min-
    aggregates); the of-entry conversion uses exact round-half-up
    permille integer algebra.

    Scale shape: three user-keyed min-aggregates, each a
    map-side-combinable groupBy co-partitioned on user_id (Catalyst
    reuses the exchange), then a 3-row census. No windows, no
    per-event state."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.select("user_id", "event_type",
              F.unix_micros("ts").alias("tus")) \
        .createOrReplaceTempView("fw_events")
    return spark.sql(_FUNNEL_WINDOWED_SQL.format(e="fw_events"))


# --------------------------------------------------------------------------
# agg_cohort_ltv — cumulative revenue per signup cohort by age
# --------------------------------------------------------------------------

#: shared body ({e} supplies (user_id, event_type, tus, value)). Weeks
#: via FLOOR(tus / 6048e8) — a true floor in identical text on both
#: engines; purchase values quantize to exact cents before any sum.
_COHORT_LTV_SQL = """
WITH u AS (
    SELECT user_id,
           CAST(FLOOR(MIN(tus) / 6048e8) AS BIGINT) AS cohort_wk
    FROM {e} GROUP BY user_id
),
p AS (
    SELECT u.cohort_wk,
           CAST(FLOOR(e.tus / 6048e8) AS BIGINT) - u.cohort_wk AS age_wk,
           CAST(FLOOR(e.value * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {e} e JOIN u ON e.user_id = u.user_id
    WHERE e.event_type = 'purchase'
),
g AS (
    SELECT cohort_wk, age_wk,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM p GROUP BY cohort_wk, age_wk
),
sz AS (
    SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY cohort_wk
)
SELECT g.cohort_wk, g.age_wk, s.n_users, g.n_purchases, g.cents,
       CAST(SUM(g.cents) OVER (PARTITION BY g.cohort_wk
                               ORDER BY g.age_wk) AS BIGINT) AS cum_cents,
       CAST(FLOOR(SUM(g.cents) OVER (PARTITION BY g.cohort_wk
                                     ORDER BY g.age_wk)
                  * 1e3 / s.n_users + 5e-1) AS BIGINT)
           AS ltv_millicents_per_user
FROM g JOIN sz s ON g.cohort_wk = s.cohort_wk
"""


@register("agg_cohort_ltv",
          oracle=_COHORT_LTV_SQL.format(
              e="(SELECT user_id, event_type, epoch_us(ts) AS tus, value"
                " FROM events)"),
          tags=("agg", "analytics", "cohort"))
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: per signup-week cohort (a user's
    first event week), the cumulative purchase revenue by cohort age in
    weeks, normalized per cohort member — the money sibling of
    `agg_cohort_retention` (which counts ACTIVITY; LTV is what finance
    actually plots against acquisition cost, and flattening curves
    localize the cohorts where monetization decayed). Cents-exact,
    including users who never purchase (they dilute the per-user
    denominator, as they must).

    Determinism: week bucketing is FLOOR over exact integer
    microseconds (identical text both engines — integer `div`/`//`
    semantics never enter); revenue quantizes to exact cents before any
    sum; the running LTV is an integer window sum with one fixed-order
    per-user close.

    Scale shape: one groupBy(user_id) for cohorts, one user-keyed
    broadcast-or-shuffle join to tag purchases, one map-side-combinable
    (cohort, age) reduce, then windows on the bounded cohort × age
    grid."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.select("user_id", "event_type",
              F.unix_micros("ts").alias("tus"), "value") \
        .createOrReplaceTempView("ltv_events")
    return spark.sql(_COHORT_LTV_SQL.format(e="ltv_events"))


# --------------------------------------------------------------------------
# agg_price_elasticity — log-log demand slope per brand
# --------------------------------------------------------------------------

#: shared body ({li} = lineitem view/subquery joined to part's brand).
#: The zipf-slope OLS discipline: ln terms AND their products quantize
#: to micro integers PER ROW before the sums, so the moment matrix is
#: exact int64 in any order; the slope close is one fixed-order double.
_ELASTICITY_SQL = """
WITH j AS (
    SELECT p.p_brand AS brand,
           CAST(l.l_quantity AS DOUBLE) AS qty,
           CAST(l.l_extendedprice AS DOUBLE)
               / CAST(l.l_quantity AS DOUBLE) AS unit_price
    FROM {li} l JOIN {pt} p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
),
q AS (
    SELECT brand,
           CAST(FLOOR(LN(unit_price) * 1e6 + 5e-1) AS BIGINT) AS xq,
           CAST(FLOOR(LN(qty) * 1e6 + 5e-1) AS BIGINT) AS yq,
           CAST(FLOOR(LN(unit_price) * LN(qty) * 1e6 + 5e-1) AS BIGINT)
               AS xyq,
           CAST(FLOOR(LN(unit_price) * LN(unit_price) * 1e6 + 5e-1)
                AS BIGINT) AS xxq
    FROM j
),
m AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
           CAST(SUM(xyq) AS BIGINT) AS sxy,
           CAST(SUM(xxq) AS BIGINT) AS sxx
    FROM q GROUP BY brand
)
SELECT brand, n,
       CAST(FLOOR((n * (sxy * 1e-6) - (sx * 1e-6) * (sy * 1e-6))
                  / (n * (sxx * 1e-6) - (sx * 1e-6) * (sx * 1e-6))
                  * 1e3 + 5e-1) AS BIGINT) AS elasticity_milli,
       CAST(FLOOR(((sy * 1e-6) - (n * (sxy * 1e-6)
                                  - (sx * 1e-6) * (sy * 1e-6))
                                 / (n * (sxx * 1e-6)
                                    - (sx * 1e-6) * (sx * 1e-6))
                                 * (sx * 1e-6)) / n * 1e3 + 5e-1)
            AS BIGINT) AS intercept_milli
FROM m
WHERE n > 1 AND n * (sxx * 1e-6) - (sx * 1e-6) * (sx * 1e-6) > 0
"""


@register("agg_price_elasticity",
          oracle=_ELASTICITY_SQL.format(li="lineitem", pt="part"),
          tags=("agg", "analytics", "stats"))
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) over line items — the log-log
    regression whose slope IS the elasticity estimate economists quote
    (−1.2 means a 1% price rise costs 1.2% volume). Per-brand slopes
    flag the products where discounting actually moves volume, feeding
    the same pricing reviews as `composite_promo_revenue`. Completes
    the regression family: `agg_corr_regr` fits levels, `ext_zipf_slope`
    fits ranks, this fits the economist's pair.

    Determinism: the zipf-slope discipline — every ln term AND product
    quantizes to micro integers per row before summation (exact int64
    moment matrix in any order; ln is cross-engine bit-exact here,
    unlike trig); slope and intercept close in single fixed-order
    expressions. Degenerate brands (no price variation) are excluded
    identically on both engines.

    Scale shape: one partkey equi-join with the broadcast-sized part
    dim, then ONE map-side-combinable groupBy(brand) of five integer
    moments — the classic big-fact × small-dim aggregate."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("elast_li")
    table(spark, sf_dir, "part").createOrReplaceTempView("elast_pt")
    return spark.sql(_ELASTICITY_SQL.format(li="elast_li", pt="elast_pt"))


# --------------------------------------------------------------------------
# agg_interpurchase_time — inter-order gap distribution per repeat customer
# --------------------------------------------------------------------------

#: shared body ({o} supplies (o_custkey, day)). Gaps are exact integer
#: days from a per-customer lag; the report is a gap-band census plus
#: exact integer median via the doubled-median order statistic.
_INTERPURCHASE_SQL = """
WITH s AS (
    SELECT o_custkey, day,
           day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day)
               AS gap_d
    FROM {o}
),
g AS (SELECT gap_d FROM s WHERE gap_d IS NOT NULL AND gap_d > 0),
r AS (
    SELECT gap_d, ROW_NUMBER() OVER (ORDER BY gap_d) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM g
),
med AS (
    SELECT MAX(n) AS n_gaps,
           CAST(FLOOR((MAX(CASE WHEN rn = CAST(FLOOR((n + 1) / 2e0)
                                               AS BIGINT)
                               THEN gap_d END)
                       + MAX(CASE WHEN rn = CAST(FLOOR((n + 2) / 2e0)
                                                 AS BIGINT)
                                 THEN gap_d END)) / 2e0) AS BIGINT)
               AS median_gap_d
    FROM r
),
bands AS (
    SELECT CASE WHEN gap_d <= 30 THEN '01_within_month'
                WHEN gap_d <= 90 THEN '02_within_quarter'
                WHEN gap_d <= 365 THEN '03_within_year'
                ELSE '04_over_year' END AS band,
           gap_d
    FROM g
)
SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(b.gap_d) AS BIGINT) AS min_gap_d,
       CAST(MAX(b.gap_d) AS BIGINT) AS max_gap_d,
       MAX(m.n_gaps) AS total_gaps,
       MAX(m.median_gap_d) AS median_gap_d,
       CAST(FLOOR(COUNT(*) * 1e6 / MAX(m.n_gaps) + 5e-1) AS BIGINT)
           AS share_micro
FROM bands b CROSS JOIN med m
GROUP BY b.band
"""


@register("agg_interpurchase_time",
          oracle=_INTERPURCHASE_SQL.format(
              o="(SELECT o_custkey, CAST(epoch_us(o_orderdate)"
                " // 86400000000 AS BIGINT) AS day FROM orders)"),
          tags=("agg", "analytics", "cohort"))
def agg_interpurchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time distribution: per repeat customer, the gaps
    between consecutive order days (per-customer lag), reported as a
    month/quarter/year band census with the exact median gap — the
    purchase-rhythm number behind every churn definition ("inactive"
    only means something relative to the typical gap; defining churn at
    90 days when the median gap IS 90 days mislabels half the base) and
    the replenishment-cycle input to `agg_rfm_segments`' recency cuts.
    Same-day repeat orders (gap 0) are excluded as basket splits.

    Determinism: gaps are exact integer days from a per-customer lag;
    the median is the exact doubled-median order statistic (the
    `win_theil_sen` idiom); band census and share close over exact
    integers.

    Scale shape: one custkey-partitioned lag window (each partition
    sorts only its own customer's orders — bounded per key), then a
    4-band census; the single global order statistic is rank-via-
    ordered-window at fixture scale (at 100 TB: approx_percentile, the
    same swap as `ext_conformal_interval`)."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    o.select("o_custkey",
             F.expr("unix_micros(cast(o_orderdate as timestamp))"
                    " div 86400000000").cast("long").alias("day")) \
        .createOrReplaceTempView("ipt_orders")
    return spark.sql(_INTERPURCHASE_SQL.format(o="ipt_orders"))


# --------------------------------------------------------------------------
# agg_segment_migration — revenue-tercile flows between time halves
# --------------------------------------------------------------------------

#: shared body ({o} supplies (o_custkey, day, cents)). The timeline
#: splits at the integer midpoint day; per half, customers rank into
#: revenue terciles with a total-order NTILE; the migration matrix is
#: a per-customer full outer join with 'absent' for one-sided rows.
_SEG_MIGRATION_SQL = """
WITH b AS (
    SELECT CAST(FLOOR((MIN(day) + MAX(day)) / 2e0) AS BIGINT) AS mid
    FROM {o}
),
h AS (
    SELECT o.o_custkey,
           CASE WHEN o.day <= b.mid THEN 1 ELSE 2 END AS half,
           o.cents
    FROM {o} o CROSS JOIN b
),
c AS (
    SELECT half, o_custkey, CAST(SUM(cents) AS BIGINT) AS cents
    FROM h GROUP BY half, o_custkey
),
s AS (
    SELECT half, o_custkey,
           CASE NTILE(3) OVER (PARTITION BY half
                               ORDER BY cents DESC, o_custkey)
                WHEN 1 THEN 'T1_top' WHEN 2 THEN 'T2_mid'
                ELSE 'T3_low' END AS seg
    FROM c
),
m AS (
    SELECT COALESCE(a.seg, 'absent') AS seg_h1,
           COALESCE(z.seg, 'absent') AS seg_h2
    FROM (SELECT o_custkey, seg FROM s WHERE half = 1) a
    FULL OUTER JOIN (SELECT o_custkey, seg FROM s WHERE half = 2) z
      ON a.o_custkey = z.o_custkey
)
SELECT seg_h1, seg_h2, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(FLOOR(COUNT(*) * 1e6 / SUM(COUNT(*)) OVER () + 5e-1)
            AS BIGINT) AS share_micro
FROM m GROUP BY seg_h1, seg_h2
"""


@register("agg_segment_migration",
          oracle=_SEG_MIGRATION_SQL.format(
              o="(SELECT o_custkey,"
                " CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)"
                " AS day,"
                " CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)"
                " AS cents FROM orders)"),
          tags=("agg", "analytics", "cohort"))
def agg_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment migration: split the order timeline at its
    midpoint, rank customers into revenue terciles in EACH half
    (total-order NTILE), and count the tercile→tercile flows including
    churn-in/churn-out ('absent' on either side) — the Sankey matrix
    behind "are our top customers the same people they were last
    period?", the follow-up question `agg_rfm_segments` (one snapshot)
    and `win_rank_movers` (individual movers) each answer half of.
    Diagonal mass = a stable base; heavy top→absent flow is the revenue
    risk a point-in-time segmentation never shows.

    Determinism: the midpoint split and per-customer cent sums are
    exact integers; NTILE over a total order (cents desc, custkey) is
    deterministic on both engines; the matrix census is exact counting
    with one fixed-order share close.

    Scale shape: one custkey-half reduce (map-side combinable), a
    per-half window over the CUSTOMER dimension, one customer-keyed
    full outer join, and a ≤16-row census."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    o.select("o_custkey",
             F.expr("unix_micros(cast(o_orderdate as timestamp))"
                    " div 86400000000").cast("long").alias("day"),
             F.expr("cast(floor(o_totalprice * 1e2 + 5e-1) as bigint)")
             .alias("cents")) \
        .createOrReplaceTempView("seg_orders")
    return spark.sql(_SEG_MIGRATION_SQL.format(o="seg_orders"))


# --------------------------------------------------------------------------
# agg_hdr_latency_quantiles — log-bucketed quantile sketch with exact twin
# --------------------------------------------------------------------------

#: shared body ({d} supplies (gap_ms) — per-user inter-event gaps in
#: whole milliseconds). The sketch is HDR-histogram-style quarter-log2
#: bucketing: bucket = floor(4·log2(gap)), guaranteeing <= 2^(1/4)-1
#: ~ 19% relative error by construction; bucket counts are the ONLY
#: corpus-scaled state (map-side-combinable, mergeable across shards —
#: the production path). The exact twin reduces gaps to a (value,
#: count) grid first (bounded by the value RANGE in ms, not the corpus)
#: so both quantile reads are window algebra over reduced tables.
#: Cross-engine: LN/EXP are the measured-bit-exact transcendentals
#: (never POWER, whose libm rounding is not pinned); both engines
#: compute identical doubles hence identical FLOORs.
_HDR_BODY = """
WITH gaps AS (SELECT gap_ms FROM {d} WHERE gap_ms >= 1),
n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gaps),
b AS (
    SELECT CAST(FLOOR(LN(gap_ms * 1e0) / LN(2e0) * 4e0) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM gaps GROUP BY 1
),
bc AS (
    SELECT bucket, CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
    FROM b
),
v AS (SELECT gap_ms, CAST(COUNT(*) AS BIGINT) AS cnt FROM gaps GROUP BY 1),
vc AS (
    SELECT gap_ms, CAST(SUM(cnt) OVER (ORDER BY gap_ms) AS BIGINT) AS cum
    FROM v
),
tgt AS (
    SELECT q_permille,
           CAST(FLOOR((q_permille * n0.n + 999) / 1e3) AS BIGINT) AS k,
           n0.n AS n_gaps
    FROM (SELECT CAST(500 AS INT) AS q_permille UNION ALL
          SELECT CAST(950 AS INT) UNION ALL
          SELECT CAST(990 AS INT)) q, n0
),
est AS (
    SELECT t.q_permille, t.n_gaps,
           (SELECT MIN(bucket) FROM bc WHERE cum >= t.k) AS bucket,
           (SELECT MIN(gap_ms) FROM vc WHERE cum >= t.k) AS exact_ms
    FROM tgt t
)
SELECT q_permille, n_gaps, bucket,
       CAST(FLOOR(EXP((bucket + 5e-1) / 4e0 * LN(2e0)) * 1e3 + 5e-1)
            AS BIGINT) AS est_ms_milli,
       exact_ms,
       CAST(FLOOR(ABS(EXP((bucket + 5e-1) / 4e0 * LN(2e0)) - exact_ms)
                  / exact_ms * 1e3 + 5e-1) AS BIGINT) AS rel_err_milli
FROM est
"""

_HDR_GAPS_DUCK = """(
    SELECT CAST((epoch_us(ts) - LAG(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
                       event_id)) // 1000 AS BIGINT) AS gap_ms
    FROM events
)"""


@register("agg_hdr_latency_quantiles",
          oracle=_HDR_BODY.format(d=_HDR_GAPS_DUCK),
          tags=("agg", "sketch", "latency", "slo"))
def agg_hdr_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of per-user inter-event gaps via an HDR-histogram-
    style log-bucketed sketch (Tene's HdrHistogram idea: fixed relative
    error from logarithmic bucketing), reported NEXT TO the exact order
    statistic and the realized relative error — the latency-quantile
    primitive the SLO family (`agg_slo_burn_rate`, `agg_funnel_latency`,
    `agg_ship_latency`) needs at 100 TB, where an exact global quantile
    means sorting the corpus but a 120-row bucket table merges
    associatively across any number of shards.

    Quarter-log2 buckets (bucket = floor(4·log2(gap_ms))) bound the
    relative error at 2^(1/4)-1 ~ 19% by construction; the planted test
    pins the realized error under that bound. The exact twin reduces
    gaps to a (value, count) grid FIRST — bounded by the gap range in
    milliseconds, never the corpus — so this query is also the sketch's
    own accuracy report (the `ext_minhash_accuracy` /
    `ext_ann_recall_report` pattern: every estimator ships with its
    error gauge).

    Determinism: gaps are exact integer milliseconds from a total-order
    window (epoch_us, event_id); bucket indices and quantile reads are
    FLOOR over LN/EXP expressions spelled identically in both engines
    (LN/EXP are the measured-bit-exact transcendentals; POWER is not
    used — libm pow rounding is not pinned cross-engine).

    Scale shape: one partitioned LAG window (co-partitioned by user),
    then TWO map-side-combinable reduces (bucket counts; value grid);
    quantile reads are windows over those reduced tables. The sketch
    path state is ~120 buckets regardless of corpus size."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"),
                                              "event_id")
    gaps = ev.select(
        ((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
         / F.lit(1000)).cast("long").alias("gap_ms"))
    gaps.createOrReplaceTempView("hdr_gaps")
    return spark.sql(_HDR_BODY.format(d="hdr_gaps"))


# --------------------------------------------------------------------------
# ext_sketch_shard_merge_audit — mergeability gate + shard skew for the
# HDR latency sketch
# --------------------------------------------------------------------------

#: shared body ({d} supplies (shard, gap_ms)). Builds the quarter-log2
#: bucket sketch PER SHARD, merges the fragments (SUM over shards),
#: and compares bucket-for-bucket against the single-pass global
#: sketch — the same operational gate `sink_dedup_index_merge` applies
#: to the dedup index (merge output hash-gated equal to a full
#: rebuild). Alongside the gate it reports per-shard latency skew:
#: each shard's own p95 read, against the global p95.
_SKETCH_MERGE_BODY = """
WITH g AS (SELECT shard, gap_ms FROM {d} WHERE gap_ms >= 1),
per AS (
    SELECT shard,
           CAST(FLOOR(LN(gap_ms * 1e0) / LN(2e0) * 4e0) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM g GROUP BY 1, 2
),
merged AS (
    SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cnt FROM per GROUP BY 1
),
gsk AS (
    SELECT CAST(FLOOR(LN(gap_ms * 1e0) / LN(2e0) * 4e0) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM g GROUP BY 1
),
agree AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM merged) AS n_m,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM gsk) AS n_g,
           (SELECT CAST(SUM(CASE WHEN m.cnt = gl.cnt THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM merged m JOIN gsk gl ON m.bucket = gl.bucket) AS n_eq
),
sc AS (
    SELECT shard, bucket,
           CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY bucket)
                AS BIGINT) AS cum,
           CAST(SUM(cnt) OVER (PARTITION BY shard) AS BIGINT) AS n
    FROM per
),
p95 AS (
    SELECT shard, CAST(MIN(bucket) AS BIGINT) AS p95_bucket
    FROM sc WHERE cum >= CAST(FLOOR((95 * n + 99) / 1e2) AS BIGINT)
    GROUP BY shard
),
gc AS (
    SELECT bucket,
           CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM gsk) AS n
    FROM gsk
),
gp95 AS (
    SELECT CAST(MIN(bucket) AS BIGINT) AS g_bucket
    FROM gc WHERE cum >= CAST(FLOOR((95 * n + 99) / 1e2) AS BIGINT)
)
SELECT s.shard, s.n_gaps, s.n_buckets, p.p95_bucket,
       CAST(FLOOR(EXP((p.p95_bucket + 5e-1) / 4e0 * LN(2e0)) * 1e3
                  + 5e-1) AS BIGINT) AS p95_est_ms_milli,
       gp.g_bucket AS global_p95_bucket,
       CASE WHEN a.n_m = a.n_g AND a.n_eq = a.n_m THEN 1 ELSE 0 END
           AS merge_clean
FROM (SELECT shard, CAST(SUM(cnt) AS BIGINT) AS n_gaps,
             CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM per GROUP BY shard) s
JOIN p95 p ON s.shard = p.shard, gp95 gp, agree a
"""

_SKETCH_GAPS_DUCK = """(
    SELECT user_id % 4 AS shard,
           CAST((epoch_us(ts) - LAG(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts),
                       event_id)) // 1000 AS BIGINT) AS gap_ms
    FROM events
)"""


@register("ext_sketch_shard_merge_audit",
          oracle=_SKETCH_MERGE_BODY.format(d=_SKETCH_GAPS_DUCK),
          tags=("ext", "sketch", "latency", "ops"))
def ext_sketch_shard_merge_audit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Mergeability gate for the HDR-style latency sketch: build the
    quarter-log2 bucket histogram independently per shard (user_id % 4
    — in production, per ingest partition or per day), merge the
    fragments by bucket-wise SUM, and verify the merged sketch equals
    the single-pass global sketch bucket-for-bucket (`merge_clean`) —
    the same operational contract `sink_dedup_index_merge` enforces for
    the dedup index (incremental maintenance must be bit-equal to a
    rebuild). The audit doubles as a shard-skew report: each shard's
    own p95 read next to the global p95 answers "is one partition
    slow?" before anyone pages — the per-shard grain
    `ext_shard_skew_report` gives for storage, here for latency.

    Determinism: buckets are FLOOR over the bit-exact LN; all counts
    and cumulative reads are exact integer algebra; the only double
    close is the shared EXP representative, milli-quantized.

    Scale shape: ONE (shard, bucket) map-side-combinable reduce (~4x30
    rows) carries everything; merge, global twin, quantile reads and
    the agreement census are algebra over that reduced table. The
    audit costs one aggregation regardless of corpus size — exactly
    why log-bucket sketches are the 100 TB latency answer."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"),
                                              "event_id")
    gaps = ev.select(
        (F.col("user_id") % 4).alias("shard"),
        ((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
         / F.lit(1000)).cast("long").alias("gap_ms"))
    gaps.createOrReplaceTempView("sketch_merge_gaps")
    return spark.sql(_SKETCH_MERGE_BODY.format(d="sketch_merge_gaps"))


# --------------------------------------------------------------------------
# agg_changepoint_binseg — single binary-segmentation change point
# --------------------------------------------------------------------------

#: shared body ({d} supplies the bounded (day, x) daily-count table —
#: identical text on both engines). Prefix sums are EXACT int64 window
#: sums (order-free), so the per-candidate SSE algebra is a fixed-order
#: double close over exact integers — never an order-dependent double
#: window sum (DuckDB's segment-tree window accumulation would not match
#: Spark's running order on doubles).
_BINSEG_BODY = """
WITH p AS (
    SELECT day, x,
           CAST(SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS s1,
           CAST(SUM(x * x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT) AS s2,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           CAST(SUM(x) OVER () AS BIGINT) AS s1t,
           CAST(SUM(x * x) OVER () AS BIGINT) AS s2t,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM {d}
),
c AS (
    SELECT day, t, n, s1, s1t,
           (s2 - s1 * 1e0 * s1 / t)
               + (s2t - s2 - (s1t - s1) * 1e0 * (s1t - s1) / (n - t)) AS sse,
           s2t - s1t * 1e0 * s1t / n AS sse0
    FROM p WHERE t < n
)
SELECT CAST(day AS BIGINT) AS split_day,
       t AS split_idx, n AS n_days,
       CAST(FLOOR(s1 * 1e3 / t + 5e-1) AS BIGINT) AS mean_left_milli,
       CAST(FLOOR((s1t - s1) * 1e3 / (n - t) + 5e-1) AS BIGINT)
           AS mean_right_milli,
       CAST(FLOOR((sse0 - sse) * 1e3 + 5e-1) AS BIGINT) AS gain_milli
FROM c
ORDER BY CAST(FLOOR(sse * 1e3 + 5e-1) AS BIGINT) ASC, day ASC
LIMIT 1
"""

_BINSEG_DAYS_DUCK = """(
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
)"""


@register("agg_changepoint_binseg",
          oracle=_BINSEG_BODY.format(d=_BINSEG_DAYS_DUCK),
          tags=("agg", "anomaly", "timeseries"))
def agg_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One binary-segmentation step (Scott & Knott 1974; the standard
    first move of every changepoint stack, PELT included): over the
    daily event-count series, pick the split day t that minimizes
    SSE_left + SSE_right — equivalently maximizes the between-segment
    variance reduction ("the traffic level changed HERE"). Emits the
    argmin split with both segment means and the SSE gain; recursing on
    each side (re-invoking on the sub-ranges) yields the full binseg
    tree. Complements the sequential detectors: `win_cusum_change`
    accumulates a known-direction shift, `agg_mann_kendall_trend` tests
    monotone drift, THIS finds the single best retrospective break.

    Determinism: the corpus reduces to one (day, x) row per day first;
    prefix sums s1/s2 are exact int64 window sums over the bounded day
    table; each candidate's SSE is a fixed-order double expression on
    those integers; the argmin orders by milli-quantized SSE with a day
    tie-break. The ~30-row single-partition windows are metadata-scale.

    Scale shape: one map-side-combinable day reduce, then window algebra
    over ≤|days| rows — scan-speed at any corpus size. Headroom: the
    fixture's x² sums fit int64 up to ~3e9 events/day; for 100 TB-scale
    feeds (≈2e10 events/day) lower the day counts to kilo-events before
    squaring (same contract, coarser units) — documented rather than
    silently double-summed, keeping the cross-engine exactness."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    d.createOrReplaceTempView("binseg_days")
    return spark.sql(_BINSEG_BODY.format(d="binseg_days"))


# --------------------------------------------------------------------------
# agg_retention_halflife — log-linear decay fit over first-cohort retention
# --------------------------------------------------------------------------

#: shared body ({wk} = engine's epoch-week expression). The fit uses the
#: two-point log slope b = (ln r3 - ln r1)/2 over weeks 1 and 3 —
#: fixed-order algebra on exact retained/cohort integer ratios; the
#: degenerate cases (no week-1 or week-3 activity, or non-decaying
#: r3 >= r1 where a half-life is undefined) yield NULL slope/half-life
#: identically in both engines.
_RETHL_BODY = """
WITH wk AS (
    SELECT DISTINCT user_id, {wk} AS w FROM events
),
base AS (SELECT CAST(MIN(w) AS BIGINT) AS wmin FROM wk),
u AS (SELECT user_id, CAST(MIN(w) AS BIGINT) AS w0
      FROM wk GROUP BY user_id),
cohort AS (
    SELECT u.user_id FROM u CROSS JOIN base WHERE u.w0 = base.wmin
),
n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cohort),
ret AS (
    SELECT CAST(wk.w - b.wmin AS BIGINT) AS k,
           CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS retained
    FROM wk JOIN cohort c ON wk.user_id = c.user_id
    CROSS JOIN base b
    GROUP BY 1
),
piv AS (
    SELECT MAX(CASE WHEN k = 1 THEN retained END) AS r1,
           MAX(CASE WHEN k = 2 THEN retained END) AS r2,
           MAX(CASE WHEN k = 3 THEN retained END) AS r3
    FROM ret
)
SELECT n0.n AS cohort_users, p.r1, p.r2, p.r3,
       CAST(FLOOR(p.r1 * 1e6 / n0.n + 5e-1) AS BIGINT) AS r1_micro,
       CAST(FLOOR(p.r2 * 1e6 / n0.n + 5e-1) AS BIGINT) AS r2_micro,
       CAST(FLOOR(p.r3 * 1e6 / n0.n + 5e-1) AS BIGINT) AS r3_micro,
       CASE WHEN p.r1 > 0 AND p.r3 > 0 AND p.r3 < p.r1 THEN
           CAST(FLOOR((LN(p.r3 * 1e0 / n0.n) - LN(p.r1 * 1e0 / n0.n))
                      / 2e0 * 1e6 + 5e-1) AS BIGINT)
       END AS slope_micro,
       CASE WHEN p.r1 > 0 AND p.r3 > 0 AND p.r3 < p.r1 THEN
           CAST(FLOOR((0e0 - LN(2e0))
                      / ((LN(p.r3 * 1e0 / n0.n) - LN(p.r1 * 1e0 / n0.n))
                         / 2e0) * 7e0 * 1e3 + 5e-1) AS BIGINT)
       END AS halflife_days_milli
FROM piv p CROSS JOIN n0
"""

_RETHL_WK_DUCK = "CAST(epoch_us(ts) // 604800000000 AS BIGINT)"
_RETHL_WK_SPARK = "CAST(unix_micros(ts) div 604800000000 AS BIGINT)"


@register("agg_retention_halflife",
          oracle=_RETHL_BODY.format(wk=_RETHL_WK_DUCK),
          tags=("agg", "retention", "timeseries"))
def agg_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life of the first weekly cohort: weekly retention
    r_k for k = 1..3, the exponential-decay slope b from the two-point
    log fit (ln r_3 - ln r_1)/2, and the implied half-life
    -ln 2 / b in days — the single number growth teams quote from the
    retention curve that `agg_cohort_retention` tabulates (this is the
    FIT layer above that table, the same relationship
    `agg_retention_halflife` : `agg_cohort_retention` =
    `ext_zipf_slope` : term frequencies). First-cohort restriction
    keeps every week fully observed inside the 30-day fixture window —
    no censoring correction needed; multi-cohort triangles belong to
    the retention table query.

    Determinism: retained/cohort counts are exact integers; the slope
    and half-life are fixed-order closes over the bit-exact LN, with
    the degenerate topologies (empty week 1 or 3, non-decaying curve
    where a half-life is undefined) yielding NULL via identical CASE
    guards in both engines.

    Scale shape: one DISTINCT (user, week) reduce, a per-user MIN, a
    broadcast-scalar cohort filter, and a ≤4-row pivot — all map-side
    combinable; no windows, no corpus-sized state."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("rethl_events")
    sql = (_RETHL_BODY.format(wk=_RETHL_WK_SPARK)
           .replace("FROM events", "FROM rethl_events"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# agg_price_index_fisher — Laspeyres / Paasche / Fisher price indices
# --------------------------------------------------------------------------

#: shared body: per-(part, year) unit values and quantities for the
#: base (1995) and comparison (2000) years, inner-joined on part (the
#:  matched-basket requirement), then the four cross-valued baskets
#: cent-quantized per part before exact integer sums.
_FISHER_BODY = """
WITH py AS (
    SELECT l_partkey AS pk, year(l_shipdate) AS y,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS val_c,
           CAST(FLOOR(SUM(l_quantity) + 5e-1) AS BIGINT) AS qty
    FROM {src}
    WHERE year(l_shipdate) IN (1995, 2000)
    GROUP BY 1, 2
),
m AS (
    SELECT b.pk,
           CAST(b.val_c AS DOUBLE) / (1e2 * b.qty) AS p0,
           CAST(c.val_c AS DOUBLE) / (1e2 * c.qty) AS p1,
           b.qty AS q0, c.qty AS q1
    FROM py b JOIN py c ON b.pk = c.pk AND b.y = 1995 AND c.y = 2000
),
terms AS (
    SELECT CAST(FLOOR(p0 * q0 * 1e2 + 5e-1) AS BIGINT) AS p0q0,
           CAST(FLOOR(p1 * q0 * 1e2 + 5e-1) AS BIGINT) AS p1q0,
           CAST(FLOOR(p0 * q1 * 1e2 + 5e-1) AS BIGINT) AS p0q1,
           CAST(FLOOR(p1 * q1 * 1e2 + 5e-1) AS BIGINT) AS p1q1
    FROM m
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(FLOOR(CAST(SUM(p1q0) AS DOUBLE) / SUM(p0q0) * 1e6 + 5e-1)
            AS BIGINT) AS laspeyres_micro,
       CAST(FLOOR(CAST(SUM(p1q1) AS DOUBLE) / SUM(p0q1) * 1e6 + 5e-1)
            AS BIGINT) AS paasche_micro,
       CAST(FLOOR(SQRT((CAST(SUM(p1q0) AS DOUBLE) / SUM(p0q0))
                       * (CAST(SUM(p1q1) AS DOUBLE) / SUM(p0q1)))
                  * 1e6 + 5e-1) AS BIGINT) AS fisher_micro
FROM terms
"""


@register("agg_price_index_fisher",
          oracle=_FISHER_BODY.format(src="lineitem"),
          tags=("agg", "business"))
def agg_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-basket price indices between 1995 and 2000: Laspeyres
    (base-year basket — what the 1995 quantities would cost at 2000
    unit values), Paasche (current-year basket), and Fisher's ideal
    index (their geometric mean, the superlative index national
    statistics offices publish). Unit value per (part, year) is the
    quantity-weighted average price; only parts traded in BOTH years
    enter (the matched-model rule). Complements `agg_price_elasticity`
    (demand response) with the price-LEVEL measurement.

    Determinism: per-(part, year) unit values are exact quantized
    rationals; the four basket terms cent-quantize per part before
    order-free exact integer sums; the three index closes are each one
    fixed-order IEEE chain.

    Scale shape: ONE map-side-combinable groupBy(part, year) reduce
    with the two-year filter pushed to the parquet scan, a self-join
    on part (shuffle bounded by the part dimension, not the fact
    table), then a scalar close. AQE handles any hot-part skew.

    Reference basis: cross-configuration rate-ratio benchmarking
    (Documentation-Self-Triggering.html:194-239); index formulas from
    Fisher 1922 (public)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("fisher_lineitem")
    return spark.sql(_FISHER_BODY.format(src="fisher_lineitem"))


# --------------------------------------------------------------------------
# agg_negbin_dispersion — overdispersion census of the daily event counts
# --------------------------------------------------------------------------

#: epoch-day seams for events.ts.
_NB_DAY_DUCK = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
_NB_DAY_SPARK = "cast(unix_micros(ts) div 86400000000 as bigint)"

#: shared body ({day} = engine epoch-day): per-type daily counts,
#: mean/variance, variance-mean ratio, and the negative-binomial
#: method-of-moments fit r = mu^2/(v - mu), p = mu/v where the data
#: are actually overdispersed (NULL where Poisson or under-dispersed).
_NEGBIN_BODY = """
WITH day AS (
    SELECT event_type, {day} AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY event_type, d
),
m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS s2
    FROM day GROUP BY event_type
),
g AS (
    SELECT event_type, nd,
           CAST(s AS DOUBLE) / nd AS mu,
           (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / nd) / (nd - 1)
               AS v
    FROM m WHERE nd > 1
)
SELECT event_type, nd,
       CAST(FLOOR(mu * 1e3 + 5e-1) AS BIGINT) AS mean_milli,
       CAST(FLOOR(v * 1e3 + 5e-1) AS BIGINT) AS var_milli,
       CAST(FLOOR(v / mu * 1e6 + 5e-1) AS BIGINT) AS vmr_micro,
       CASE WHEN v > mu THEN
           CAST(FLOOR(mu * mu / (v - mu) * 1e3 + 5e-1) AS BIGINT)
           ELSE NULL END AS nb_r_milli,
       CASE WHEN v > mu THEN
           CAST(FLOOR(mu / v * 1e6 + 5e-1) AS BIGINT)
           ELSE NULL END AS nb_p_micro
FROM g
ORDER BY event_type
"""


@register("agg_negbin_dispersion",
          oracle=_NEGBIN_BODY.format(src="events", day=_NB_DAY_DUCK),
          tags=("agg", "stats", "timeseries"))
def agg_negbin_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion census of daily event counts per type: the
    variance-mean ratio (1 = Poisson) and, where counts are actually
    overdispersed, the negative-binomial method-of-moments fit
    r = mu^2 / (v - mu), p = mu / v (Anscombe 1950) — the parameters
    every burst-aware capacity model and anomaly threshold needs
    where a Poisson assumption under-alarms. The count-data sibling
    of `ext_burstiness` (which gauges token counts): VMR > 1 types
    get an NB fit, VMR <= 1 types get NULLs — the split itself is
    the diagnostic (regular traffic vs bursty traffic).

    Determinism: daily counts are exact integers; per-type moments
    are exact integer sums; mean, variance, VMR and the MoM closes
    are fixed-order chains; the overdispersion gate compares the
    same doubles on both engines.

    Scale shape: ONE map-side-combinable groupBy(type, day) reduce,
    one bounded groupBy(type) reduce, scalar closes. Nothing after
    the first reduce scales with the corpus.

    Reference basis: per-channel rate-stability classification
    (Documentation-Self-Triggering.html:194-239); fit from Anscombe
    1950 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("negbin_events")
    return spark.sql(_NEGBIN_BODY.format(src="negbin_events",
                                         day=_NB_DAY_SPARK))
