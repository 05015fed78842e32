"""Spark 4 SQL-dialect surfaces (round 5): recursive CTEs, pipe syntax,
named-parameter queries, SQL-defined functions, and SQL scripting.

These are the dialect features a user coming from any modern warehouse
expects of a complete engine. Each query executes the NEW surface on the
Spark side and is hash-checked against a classic-SQL DuckDB twin — for the
recursive CTE the recursion itself is portable, so both engines run the
same WITH RECURSIVE shape.

Reference analogs: the recursive closure generalizes the watchdog's
follow-the-chain run merging (DAQ_self-triggering.md:288-301) and mirrors
``ext_dedup_connected_components``'s iterative closure as engine-native
recursion; the scripting loop is the calibration sweep's imperative
driver (module_test_sw's threshold scans, DAQ_self-triggering.md:85-97)
re-expressed inside the SQL engine; SQL UDFs are the config-derived
formula snippets (threshold = baseline + offset, MD:334) shared between
queries without a Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_etl_spark.io import table
from project_etl_spark.operators.llm_dedup import (
    _LSH_PAIRS_SQL,
    _MINHASH_SIGS_SQL,
    _SHINGLES_SQL,
    jaccard_via_lsh,
)
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

_REC_BODY = """
WITH RECURSIVE paths(src, dst, depth) AS (
    SELECT doc_a, doc_b, 1 FROM {pairs}
    UNION ALL
    SELECT p.src, e.doc_b, p.depth + 1
    FROM paths p JOIN {pairs} e ON e.doc_a = p.dst
    WHERE p.depth < 3
)
SELECT src, depth, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM paths GROUP BY src, depth
"""

_REC_ORACLE = f"""
WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_LSH_PAIRS_SQL},
paths AS (
    SELECT doc_a AS src, doc_b AS dst, 1 AS depth FROM pairs
    UNION ALL
    SELECT p.src, e.doc_b, p.depth + 1
    FROM paths p JOIN pairs e ON e.doc_a = p.dst
    WHERE p.depth < 3
)
SELECT src, depth, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM paths GROUP BY src, depth
"""


@register("sql_recursive_cte", oracle=_REC_ORACLE,
          tags=("sql", "recursive", "graph"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (``WITH RECURSIVE``, Spark 4.1): depth-bounded path
    census over the verified near-dup graph — per source document, how many
    length-1/2/3 forward chains leave it (doc_a < doc_b orientation makes
    the walk a DAG, so the path count is finite and exact). The SAME
    recursion shape runs on both engines; only the anchor table differs
    (temp view here, inlined LSH pipeline in the oracle). The depth guard
    in the recursive step is the termination contract — at scale each
    iteration is one equi-join + union, the same ladder
    ``ext_dedup_connected_components`` builds by hand, now engine-managed."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    pairs = (jaccard_via_lsh(docs, threshold=0.5, rows_per_band=2)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
    pairs.createOrReplaceTempView("sql5_dup_pairs")
    return spark.sql(_REC_BODY.format(pairs="sql5_dup_pairs"))


_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
           AS rev_cents
FROM lineitem WHERE l_quantity >= 5
GROUP BY 1, 2
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "dialect"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (``|>``, Spark 4.0): the pricing-summary flagship
    written as a top-to-bottom pipeline — FROM |> WHERE |> EXTEND |>
    AGGREGATE |> ORDER BY — the linear dataflow dialect that matches how
    the DAQ pipeline is described stage by stage (DAQ_self-triggering.md:96-272).
    Same Catalyst plan as the classic form (the oracle): pipe stages are
    pure surface syntax, so pushdown/partial-aggregation behavior is
    unchanged; the hash match proves dialect equivalence."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sql5_lineitem")
    return spark.sql("""
        FROM sql5_lineitem
        |> WHERE l_quantity >= 5
        |> EXTEND CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS cents
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n, SUM(cents) AS rev_cents
           GROUP BY l_returnflag, l_linestatus
    """)


_PARAM_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
           AS cents
FROM orders WHERE o_orderstatus = 'F' AND o_totalprice < 150000e0
GROUP BY 1
"""


@register("sql_parameterized", oracle=_PARAM_ORACLE, tags=("sql", "dialect"))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``spark.sql(..., args=...)``): the injection-safe
    way to thread runtime thresholds into query text — the engine-side
    analog of the reference's TOML-driven run parameters (offset maps,
    DAQ_self-triggering.md:395-416) reaching a query without string
    formatting. Parameters bind as typed literals BEFORE analysis, so
    Catalyst constant-folds and pushes them down exactly like hand-written
    literals (the oracle is the literal twin)."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("sql5_orders")
    return spark.sql(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)"
        " AS cents "
        "FROM sql5_orders WHERE o_orderstatus = :status "
        "AND o_totalprice < :cap GROUP BY o_orderpriority",
        args={"status": "F", "cap": 150000.0})


_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1e0 - l_discount)) * 1e2 + 5e-1)
                     AS BIGINT)) AS BIGINT) AS disc_cents
FROM lineitem GROUP BY 1
"""


@register("fn_sql_udf", oracle=_SQL_UDF_ORACLE, tags=("fn", "sql", "udf"))
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (``CREATE FUNCTION ... RETURN expr``, Spark 4):
    the portable cents quantizer and the discounted-price formula declared
    ONCE as engine-level functions and composed in a query — shared formula
    snippets (threshold = baseline + offset, DAQ_self-triggering.md:334)
    without a Python UDF's serialization wall. SQL UDFs inline into the
    plan at analysis time: the aggregate below stays whole-stage codegen
    with map-side partials, bit-identical to the hand-inlined oracle."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sql5_li_udf")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sql5_cents(x DOUBLE) "
              "RETURNS BIGINT RETURN CAST(FLOOR(x * 1e2 + 5e-1) AS BIGINT)")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION "
              "sql5_disc_price(p DOUBLE, d DOUBLE) "
              "RETURNS DOUBLE RETURN p * (1e0 - d)")
    return spark.sql("""
        SELECT l_returnflag,
               CAST(SUM(sql5_cents(sql5_disc_price(l_extendedprice,
                                                   l_discount))) AS BIGINT)
                   AS disc_cents
        FROM sql5_li_udf GROUP BY l_returnflag
    """)


_SCRIPT_ORACLE = """
SELECT CAST(5 AS INT) AS n_iters,
       CAST(SUM(c) AS BIGINT) AS total_above FROM (
  SELECT (SELECT COUNT(*) FROM events
          WHERE value > CAST(POW(2e0, i) AS DOUBLE)) AS c
  FROM (SELECT unnest([0, 1, 2, 3, 4]) AS i)
)
"""


@register("sql_scripting", oracle=_SCRIPT_ORACLE, tags=("sql", "scripting"))
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (``BEGIN ... END`` with DECLARE/WHILE/SET, Spark 4.0):
    a five-step doubling threshold sweep over the event stream — the
    calibration scan loop (threshold DAC sweep,
    DAQ_self-triggering.md:85-97) driven INSIDE the engine instead of a
    Python for-loop, with loop state in session variables. Each iteration
    is a full distributed count; the script returns the accumulated census
    as its final statement's DataFrame. The oracle unrolls the loop as a
    lateral over the threshold list."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("sql5_events")
    return spark.sql("""
        BEGIN
          DECLARE i INT DEFAULT 0;
          DECLARE tot BIGINT DEFAULT 0;
          WHILE i < 5 DO
            SET tot = tot + (SELECT COUNT(*) FROM sql5_events
                             WHERE value > CAST(POW(2e0, i) AS DOUBLE));
            SET i = i + 1;
          END WHILE;
          SELECT CAST(5 AS INT) AS n_iters, tot AS total_above;
        END
    """)


_LCA_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
            AS BIGINT) AS price_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT)) // 100
            AS BIGINT) AS price_dollars,
       CAST((SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT)) // 100)
            % 1000 AS BIGINT) AS dollars_mod_k
FROM lineitem GROUP BY 1
"""


@register("sql_lateral_column_alias", oracle=_LCA_ORACLE,
          tags=("sql", "dialect"))
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing an
    alias defined EARLIER IN THE SAME SELECT — ``price_cents`` feeds
    ``price_dollars`` feeds ``dollars_mod_k`` without a wrapping subquery
    or repeated expression text, the ergonomic surface for the chained
    derived-metric style every reporting query falls into. Catalyst
    inlines the alias chain during analysis, so the plan is identical to
    the fully-expanded form (the oracle spells the expansion out — a hash
    match proves the sugar is pure surface syntax)."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lca_lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) AS price_cents,
               price_cents DIV 100 AS price_dollars,
               price_dollars % 1000 AS dollars_mod_k
        FROM lca_lineitem GROUP BY l_returnflag
    """)


_GBA_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS BIGINT) AS qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ALL ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GBA_ORACLE, tags=("sql", "dialect"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` (Spark 3.4+/4.0): the
    pricing-summary flagship with grouping keys INFERRED from the select
    list — every non-aggregate item becomes a key — and the result ordered
    by the full column tuple, no positional lists to keep in sync as the
    select list evolves. The exact same dialect text runs on both engines
    (DuckDB originated the syntax), so the hash match pins Spark's key
    inference against an independent implementation. Analysis-time sugar
    only: the physical plan is the classic partial-agg/exchange/final-agg
    ladder with the shipdate predicate pushed to the parquet scan."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("gba_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT))
                    AS BIGINT) AS qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM gba_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY ALL ORDER BY ALL
    """)


# --------------------------------------------------------------------------
# win_cusum_change — CUSUM change detection via recursive CTE
# --------------------------------------------------------------------------

#: shared recursive body ({h} supplies (rn, day, x, mean_milli,
#: slack_milli, h_milli) — identical text on both engines).
_CUSUM_BODY = """
WITH RECURSIVE c AS (
    SELECT rn, day, x, mean_milli, slack_milli, h_milli,
           CAST(GREATEST(0, 1000 * x - mean_milli - slack_milli)
                AS BIGINT) AS s
    FROM {h} WHERE rn = 1
    UNION ALL
    SELECT h.rn, h.day, h.x, h.mean_milli, h.slack_milli, h.h_milli,
           CAST(GREATEST(0, c.s + 1000 * h.x - h.mean_milli
                            - h.slack_milli) AS BIGINT)
    FROM {h} h JOIN c ON h.rn = c.rn + 1
)
SELECT day, x AS n_errors, s AS cusum_milli,
       CASE WHEN s > h_milli THEN 1 ELSE 0 END AS alarm
FROM c
"""

_CUSUM_HOURLY_DUCK = """(
    WITH e AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events WHERE event_type = 'error'
    ),
    d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY day),
    p AS (SELECT CAST((2000 * SUM(x) + COUNT(*)) // (2 * COUNT(*))
                      AS BIGINT) AS mean_milli FROM d)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
           d.day, d.x, p.mean_milli,
           CAST(p.mean_milli // 4 AS BIGINT) AS slack_milli,
           CAST(p.mean_milli * 2 AS BIGINT) AS h_milli
    FROM d, p
)"""


@register("win_cusum_change", oracle=_CUSUM_BODY.format(h=_CUSUM_HOURLY_DUCK),
          tags=("window", "anomaly", "recursive"))
def win_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954) over the daily
    error-count series: S_t = max(0, S_{t-1} + x_t − target − slack) —
    the sequential statistic that accumulates SMALL persistent shifts a
    per-point z-score never flags (a 20% elevation for a week trips
    CUSUM long before any single day looks anomalous). The max(0, ·)
    recurrence is NOT prefix-sum decomposable, so no window frame can
    express it — this is the honest use case for the recursive CTE on
    BOTH engines (Spark 4's WITH RECURSIVE and DuckDB's, one shared
    body), with target = corpus mean, slack = mean/4, threshold =
    2·mean, all exact milli-unit integers so the recursion is pure
    int arithmetic.

    Scale shape: the corpus reduces to one row per day FIRST (map-side
    combinable), so the sequential recursion runs over ~30 rows —
    recursion depth equals the report length, never the data size (the
    fixture spans 30 days at every sf; Spark's recursion-level limit of
    100 bounds the contract, documented).

    Spark-side lowering (optimization round 12): the oracle keeps the
    shared WITH RECURSIVE body, but on Spark the ~30-level recursion ran
    as ~30 sequential micro-jobs whose per-level scheduling overhead was
    the whole cost (~5.8 s at sf0.1, constant in data volume). The same
    recurrence now left-folds over the collected day array with the
    `aggregate` higher-order function (`seqfold.fold_states`) — ONE job,
    same per-step int arithmetic in the same order, bit-identical by
    construction (state is exact int64 throughout)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    d = (ev.where(F.col("event_type") == "error")
         .select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                 .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    # corpus mean as an UNBOUNDED window over the day table instead of the
    # old agg + broadcast cross-join: same exact-integer arithmetic
    # (int64 SUM is order-independent), but the day reduce now has ONE
    # consumer — no lazy checkpoint, no second lineage, one scan total;
    # the single-partition exchange is shared with the rn window.
    h = (d.select(F.row_number().over(Window.orderBy("day")).cast("long")
                  .alias("rn"),
                  "day", "x",
                  F.expr("cast((2000 * sum(x) over () + count(1) over ())"
                         " div (2 * count(1) over ()) as bigint)")
                  .alias("mean_milli"))
         .select("rn", "day", "x", "mean_milli",
                 F.expr("cast(mean_milli div 4 as bigint)")
                 .alias("slack_milli"),
                 (F.col("mean_milli") * 2).cast("long").alias("h_milli")))
    # init/step are the recursion body's own expressions (base term and
    # recursive term of _CUSUM_BODY) with c.s -> {acc}.s, h.* -> t.*
    return fold_states(
        h, ["rn", "day", "x", "mean_milli", "slack_milli", "h_milli"],
        init_sql="named_struct('s', CAST(GREATEST(0, 1000 * {r0}.x"
                 " - {r0}.mean_milli - {r0}.slack_milli) AS BIGINT))",
        step_sql="named_struct('s', CAST(GREATEST(0, {acc}.s + 1000 * t.x"
                 " - t.mean_milli - t.slack_milli) AS BIGINT))",
        out_sql=["e.t.day AS day", "e.t.x AS n_errors",
                 "e.s.s AS cusum_milli",
                 "CASE WHEN e.s.s > e.t.h_milli THEN 1 ELSE 0 END AS alarm"])


# --------------------------------------------------------------------------
# agg_survival_km — Kaplan-Meier time-to-conversion with right censoring
# --------------------------------------------------------------------------

#: shared recursive body ({r} supplies (rn, dur_d, d_cnt, c_cnt,
#: at_risk) — identical text on both engines). The KM product
#: S_t = prod(1 - d_i/n_i) is NOT frame-decomposable without log/exp
#: round-trips, so the recursion multiplies the factors in the one
#: fixed order both engines share.
_KM_BODY = """
WITH RECURSIVE km AS (
    SELECT rn, dur_d, d_cnt, c_cnt, at_risk,
           1e0 - d_cnt * 1e0 / at_risk AS s
    FROM {r} WHERE rn = 1
    UNION ALL
    SELECT t.rn, t.dur_d, t.d_cnt, t.c_cnt, t.at_risk,
           km.s * (1e0 - t.d_cnt * 1e0 / t.at_risk)
    FROM {r} t JOIN km ON t.rn = km.rn + 1
)
SELECT dur_d, d_cnt AS n_events, c_cnt AS n_censored, at_risk,
       CAST(FLOOR(s * 1e6 + 5e-1) AS BIGINT) AS survival_micro
FROM km
"""

_KM_RISK_DUCK = """(
    WITH u AS (
        SELECT user_id,
               CAST((epoch_us(COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                  AND value >= 75e0 THEN ts END), MAX(ts)))
                     - epoch_us(MIN(ts))) // 86400000000 AS BIGINT) AS dur_d,
               CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                             AND value >= 75e0 THEN ts END) IS NULL
                    THEN 0 ELSE 1 END AS ev
        FROM events GROUP BY user_id
    ),
    t AS (
        SELECT dur_d, CAST(SUM(ev) AS BIGINT) AS d_cnt,
               CAST(SUM(1 - ev) AS BIGINT) AS c_cnt
        FROM u GROUP BY dur_d
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY dur_d) AS BIGINT) AS rn,
           dur_d, d_cnt, c_cnt,
           CAST(SUM(d_cnt + c_cnt) OVER (ORDER BY dur_d DESC)
                AS BIGINT) AS at_risk
    FROM t
)"""


@register("agg_survival_km", oracle=_KM_BODY.format(r=_KM_RISK_DUCK),
          tags=("agg", "stats", "recursive"))
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator (Kaplan & Meier 1958) for
    time-to-conversion with RIGHT CENSORING: per user, the event is the
    first high-value purchase (value >= 75) measured in days since the
    user\'s first event; users who never convert are censored at their
    last observed activity. This is the estimator product analysts use
    for "what fraction of users has converted by day k" — naive
    percentiles over converted users only (the `agg_funnel_latency`
    shape) are biased optimistic because they silently drop the
    never-converted mass; KM is the unbiased answer, and the same
    machinery reads as churn analysis with event = churn.

    The KM product Π(1 − dᵢ/nᵢ) over ordered event times is not
    prefix-decomposable in plain window algebra without exp/ln
    round-trips, so the DuckDB oracle keeps the shared WITH RECURSIVE
    body — each engine multiplies the same factors in the same order;
    at-risk counts, events and censorings per day are exact integers,
    only the survival close is a fixed-order double.

    Scale shape: the corpus reduces FIRST (one map-side-combinable
    groupBy(user_id), then a daily life table bounded by the
    observation window — ~30 rows), so recursion depth is the report
    length, never the data size; Spark\'s default recursion limit of
    100 bounds the contract (a daily table over a month sits well
    inside it; a year-long window would bucket to weeks).

    Spark-side lowering (optimization round 12): the ~30-level
    recursion ran as ~30 sequential micro-jobs (~5.3 s of per-level
    scheduling at sf0.1); the same fixed-order product now left-folds
    over the collected life-table array via `seqfold.fold_states` —
    ONE job, the identical IEEE multiplication sequence
    s := s * (1 - d/n) in the identical order, so the double state is
    bit-identical to the recursion's."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    conv = F.min(F.when((F.col("event_type") == "purchase")
                        & (F.col("value") >= 75.0), F.col("ts")))
    u = (ev.groupBy("user_id")
         .agg(((F.unix_micros(F.coalesce(conv, F.max("ts")))
                - F.unix_micros(F.min("ts")))
               / F.lit(86400000000)).cast("long").alias("dur_d"),
              F.when(conv.isNull(), 0).otherwise(1).alias("ev")))
    t = (u.groupBy("dur_d")
         .agg(F.sum("ev").cast("long").alias("d_cnt"),
              F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_cnt")))
    r = t.select(F.row_number().over(Window.orderBy("dur_d"))
                 .cast("long").alias("rn"),
                 "dur_d", "d_cnt", "c_cnt",
                 F.sum(F.col("d_cnt") + F.col("c_cnt"))
                 .over(Window.orderBy(F.col("dur_d").desc()))
                 .cast("long").alias("at_risk"))
    # init/step are _KM_BODY's base and recursive terms with km.s ->
    # {acc}.s, t.* staying t.* — the same factors in the same order
    return fold_states(
        r, ["rn", "dur_d", "d_cnt", "c_cnt", "at_risk"],
        init_sql="named_struct('s', 1e0 - {r0}.d_cnt * 1e0 / {r0}.at_risk)",
        step_sql="named_struct('s',"
                 " {acc}.s * (1e0 - t.d_cnt * 1e0 / t.at_risk))",
        out_sql=["e.t.dur_d AS dur_d", "e.t.d_cnt AS n_events",
                 "e.t.c_cnt AS n_censored", "e.t.at_risk AS at_risk",
                 "CAST(FLOOR(e.s.s * 1e6 + 5e-1) AS BIGINT)"
                 " AS survival_micro"])


# --------------------------------------------------------------------------
# win_holt_linear — Holt's double exponential smoothing via recursive CTE
# --------------------------------------------------------------------------

#: shared recursive body ({h} supplies (rn, day, x)). With
#: alpha = beta = 1/2 the level/trend updates are
#:   l_t = (1000*x_t + l_{t-1} + b_{t-1}) / 2
#:   b_t = (l_t - l_{t-1} + b_{t-1}) / 2
#: kept EXACT by flooring each halving via FLOOR(expr / 2e0) — floor
#: (not truncate-toward-zero) on both engines even for negative trend
#: values, where integer `div` semantics differ between them.
#: the recursion alone (shared by the smoother and its backtest twin).
_HOLT_REC = """
WITH RECURSIVE h AS (
    SELECT rn, day, x,
           CAST(1000 * x AS BIGINT) AS l_milli,
           CAST(0 AS BIGINT) AS b_milli
    FROM {h} WHERE rn = 1
    UNION ALL
    SELECT t.rn, t.day, t.x,
           CAST(FLOOR((1000 * t.x + h.l_milli + h.b_milli) / 2e0)
                AS BIGINT),
           CAST(FLOOR((CAST(FLOOR((1000 * t.x + h.l_milli + h.b_milli)
                                  / 2e0) AS BIGINT)
                       - h.l_milli + h.b_milli) / 2e0) AS BIGINT)
    FROM {h} t JOIN h ON t.rn = h.rn + 1
)"""

_HOLT_BODY = _HOLT_REC + """
SELECT day, x AS n_events, l_milli AS level_milli, b_milli AS trend_milli,
       CAST(l_milli + b_milli AS BIGINT) AS forecast_next_milli
FROM h
"""

#: Spark-side fold twin of _HOLT_REC (seqfold lowering): the SAME level
#: and trend expressions as the recursive term, re-keyed h./hw. -> the
#: fold's previous-state struct ({acc}) — one textual source of truth
#: for the halving/floor arithmetic, so the fold cannot drift from the
#: oracle recursion.
_HOLT_FOLD_L = ("CAST(FLOOR((1000 * t.x + {acc}.l_milli + {acc}.b_milli)"
                " / 2e0) AS BIGINT)")
_HOLT_FOLD_INIT = ("named_struct('l_milli', CAST(1000 * {r0}.x AS BIGINT),"
                   " 'b_milli', CAST(0 AS BIGINT))")
_HOLT_FOLD_STEP = ("named_struct('l_milli', " + _HOLT_FOLD_L
                   + ", 'b_milli', CAST(FLOOR((" + _HOLT_FOLD_L
                   + " - {acc}.l_milli + {acc}.b_milli) / 2e0) AS BIGINT))")

_HOLT_DAILY_DUCK = """(
    WITH e AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ),
    d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY day)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn, day, x
    FROM d
)"""


@register("win_holt_linear", oracle=_HOLT_BODY.format(h=_HOLT_DAILY_DUCK),
          tags=("window", "timeseries", "recursive"))
def win_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957,
    alpha = beta = 1/2) over the daily event-count series: a level AND a
    trend state per day, plus the one-step-ahead forecast level+trend —
    the classical forecaster that `win_ewma` (level only, no trend) and
    `win_rolling_slope` (trend only, fixed window) each give half of.
    Under-forecast vs actual is the capacity-planning alarm.

    Both recurrences entangle (l_t needs b_{t-1}, b_t needs l_t and
    l_{t-1}), so no window frame expresses them — the DuckDB oracle
    keeps the shared recursive body. State stays in exact milli-unit
    integers; each alpha/beta halving floors via FLOOR(expr / 2e0),
    which is a true floor for NEGATIVE trend values on both engines
    (integer `div` truncates toward zero on Spark but floors on DuckDB
    — the one place their integer division semantics diverge).

    Scale shape: the corpus reduces to one row per day FIRST (map-side
    combinable), recursion depth = report length (~30), constant in
    data volume.

    Spark-side lowering (optimization round 12): the ~30-level
    recursion ran as ~30 sequential micro-jobs (~5.1 s of per-level
    scheduling at sf0.1); the same recurrence now left-folds over the
    collected day array via `seqfold.fold_states` (`_HOLT_FOLD_STEP`
    is _HOLT_REC's recursive term verbatim, re-keyed hw -> acc) — ONE
    job, exact-int state, bit-identical by construction, and the
    eager day-table checkpoint becomes unnecessary (one consumer)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    h = d.select(F.row_number().over(Window.orderBy("day")).cast("long")
                 .alias("rn"), "day", "x")
    return fold_states(
        h, ["rn", "day", "x"],
        init_sql=_HOLT_FOLD_INIT, step_sql=_HOLT_FOLD_STEP,
        out_sql=["e.t.day AS day", "e.t.x AS n_events",
                 "e.s.l_milli AS level_milli", "e.s.b_milli AS trend_milli",
                 "CAST(e.s.l_milli + e.s.b_milli AS BIGINT)"
                 " AS forecast_next_milli"])


# --------------------------------------------------------------------------
# sql_filter_clause — per-aggregate FILTER (WHERE ...) modifiers
# --------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS BIGINT)
           AS n_bulk,
       CAST(SUM(CASE WHEN l_discount > 5e-2
                THEN CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT)
                END) AS BIGINT) AS discounted_cents,
       CAST(COUNT(DISTINCT CASE WHEN l_tax > 0 THEN l_suppkey END)
            AS BIGINT) AS n_taxed_suppliers
FROM lineitem GROUP BY l_returnflag
"""


@register("sql_filter_clause", oracle=_FILTER_ORACLE,
          tags=("sql", "dialect"))
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 aggregate FILTER clause (`agg(x) FILTER (WHERE p)`)
    — one scan producing several differently-conditioned aggregates,
    the idiom warehouse users write instead of CASE-inside-agg (clearer
    intent, and the planner sees the predicate as a predicate). Mixes
    plain, FILTERed, and FILTERed-DISTINCT aggregates in one GROUP BY.
    The oracle is the classic CASE-expression twin: the hash match
    proves the dialect form is pure surface syntax — same partial
    aggregation, same whole-stage codegen, no extra scan.

    Scale shape: ONE map-side-combinable pass; the DISTINCT branch adds
    the standard expand-then-two-phase plan, still one scan."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("flt_li")
    return spark.sql("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)
                   AS n_bulk,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1)
                             AS BIGINT))
                    FILTER (WHERE l_discount > 5e-2) AS BIGINT)
                   AS discounted_cents,
               CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0)
                    AS BIGINT) AS n_taxed_suppliers
        FROM flt_li GROUP BY l_returnflag
    """)


# --------------------------------------------------------------------------
# sql_identifier_clause — injection-safe templated table/column names
# --------------------------------------------------------------------------

_IDENTIFIER_ORACLE = """
SELECT o_orderpriority AS dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
            AS BIGINT) AS cents
FROM orders GROUP BY o_orderpriority
"""


@register("sql_identifier_clause", oracle=_IDENTIFIER_ORACLE,
          tags=("sql", "dialect"))
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause (Spark 3.4+): table AND column names
    supplied as bound parameters instead of string-formatted SQL — the
    injection-safe way to write "group this table by that column"
    template queries (a metrics layer or dbt-style macro engine does
    this constantly; string interpolation of identifiers is the classic
    SQL-injection vector `sql_parameterized` only half-closes, since
    named parameters bind VALUES, not names). The identifier binds at
    parse time, so Catalyst resolves, prunes, and pushes down exactly
    as if the name were written literally — proven by the hash match
    against the literal twin.

    Scale shape: identical plan to the literal query — one map-side
    combinable aggregate."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("ident_orders")
    return spark.sql(
        "SELECT IDENTIFIER(:dim) AS dim, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(IDENTIFIER(:val) * 1e2 + 5e-1) AS BIGINT)) "
        "AS BIGINT) AS cents "
        "FROM IDENTIFIER(:tab) GROUP BY IDENTIFIER(:dim)",
        args={"dim": "o_orderpriority", "val": "o_totalprice",
              "tab": "ident_orders"})


# --------------------------------------------------------------------------
# agg_forecast_backtest — walk-forward evaluation of the Holt forecaster
# --------------------------------------------------------------------------

#: shared body ({h} supplies the same (rn, day, x) feeder as
#: `win_holt_linear`): rerun the recursion, then score every one-step-
#: ahead forecast against the NEXT day's actual, with the naive
#: persistence forecast (tomorrow = today) as the baseline. The scoring
#: tail below ({hsrc} = the smoothed day table) is shared between the
#: oracle (recursion feeder) and the Spark fold lowering.
_BACKTEST_SCORE = """
f AS (
    SELECT day, x,
           CAST(l_milli + b_milli AS BIGINT) AS fc_milli,
           CAST(1000 * x AS BIGINT) AS naive_milli,
           LEAD(x) OVER (ORDER BY day) AS x_next
    FROM {hsrc}
),
e AS (
    SELECT CAST(ABS(1000 * x_next - fc_milli) AS BIGINT) AS err_holt,
           CAST(ABS(1000 * x_next - naive_milli) AS BIGINT) AS err_naive
    FROM f WHERE x_next IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       CAST(FLOOR(SUM(err_holt) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS mae_holt_milli,
       CAST(FLOOR(SUM(err_naive) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS mae_naive_milli,
       CASE WHEN SUM(err_naive) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR((1e0 - SUM(err_holt) * 1e0 / SUM(err_naive))
                            * 1e6 + 5e-1) AS BIGINT) END AS skill_micro
FROM e
"""

_BACKTEST_BODY = _HOLT_REC + "," + _BACKTEST_SCORE.format(hsrc="h")


@register("agg_forecast_backtest",
          oracle=_BACKTEST_BODY.format(h=_HOLT_DAILY_DUCK),
          tags=("agg", "timeseries", "eval", "recursive"))
def agg_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the Holt forecaster: every day's
    one-step-ahead forecast (level + trend, from the SAME shared
    recursion as `win_holt_linear` — the two can never drift) is scored
    against the next day's actual, with the naive persistence forecast
    (tomorrow = today) as baseline, closing with MAE for both and the
    skill score 1 − MAE_holt/MAE_naive. A forecaster nobody backtests
    is a liability; skill ≤ 0 says "your smoother loses to copying
    yesterday" — the first gate any forecasting pipeline must pass,
    evaluated walk-forward (each forecast uses only prior days, which
    the recursion guarantees by construction).

    Determinism: the recursion state is exact milli integers, forecast
    errors are exact int64, and the MAE/skill closes are single
    fixed-order expressions; the zero-baseline edge (constant series)
    returns skill 0 identically on both engines.

    Scale shape: identical to `win_holt_linear` (day-reduce first,
    report-length fold over the day table) plus one LEAD window and a
    1-row reduce over ~30 rows.

    Spark-side lowering (optimization round 12): same seqfold fold as
    `win_holt_linear` (the two still share `_HOLT_FOLD_STEP`, so they
    still can never drift), then the shared `_BACKTEST_SCORE` tail over
    the folded day table — one job instead of ~30 recursion levels
    (~6.6 s -> sub-second at sf0.1)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    h = d.select(F.row_number().over(Window.orderBy("day")).cast("long")
                 .alias("rn"), "day", "x")
    smoothed = fold_states(
        h, ["rn", "day", "x"],
        init_sql=_HOLT_FOLD_INIT, step_sql=_HOLT_FOLD_STEP,
        out_sql=["e.t.day AS day", "e.t.x AS x",
                 "e.s.l_milli AS l_milli", "e.s.b_milli AS b_milli"])
    smoothed.createOrReplaceTempView("backtest_daily")
    return spark.sql("WITH " + _BACKTEST_SCORE.format(hsrc="backtest_daily"))


# --------------------------------------------------------------------------
# sql_session_variables — DECLARE VARIABLE / SET VAR across statements
# --------------------------------------------------------------------------

_SESSVAR_ORACLE = """
WITH cap AS (
    SELECT CAST((2 * SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS cap_cents
    FROM orders
)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above,
       MAX(c.cap_cents) AS cap_cents
FROM orders o CROSS JOIN cap c
WHERE CAST(FLOOR(o.o_totalprice * 1e2 + 5e-1) AS BIGINT) > c.cap_cents
GROUP BY o.o_orderpriority
"""


@register("sql_session_variables", oracle=_SESSVAR_ORACLE,
          tags=("sql", "dialect"))
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (``DECLARE VARIABLE`` / ``SET VAR``,
    Spark 4.0): a threshold computed by ONE statement and consumed by
    ANOTHER — the cross-statement state that scripts, notebooks, and
    dashboard parameter panes rely on (`sql_scripting`'s DECLARE lives
    inside one BEGIN..END block; a session variable survives between
    top-level statements, which is the actual warehouse idiom). Here
    the mean order value in exact cents is SET from an aggregate
    subquery, then referenced by name in a second query's predicate;
    the oracle is the single-statement CTE twin, so the hash match
    proves the variable round-trip loses nothing.

    Scale shape: the SET VAR aggregate is one map-side-combinable pass
    collapsed to ONE driver-held scalar (exactly what a variable is
    for); the consumer query then constant-folds it like a literal —
    no runtime join against the threshold at all."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_cap_cents BIGINT DEFAULT 0")
    spark.sql("""
        SET VAR sv_cap_cents = (
            SELECT CAST((2 * SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1)
                                      AS BIGINT)) + COUNT(*))
                        DIV (2 * COUNT(*)) AS BIGINT)
            FROM sv_orders)
    """)
    return spark.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above,
               sv_cap_cents AS cap_cents
        FROM sv_orders
        WHERE CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
              > sv_cap_cents
        GROUP BY o_orderpriority, sv_cap_cents
    """)


# --------------------------------------------------------------------------
# sql_unpivot_native — native UNPIVOT clause (one body, both engines)
# --------------------------------------------------------------------------

#: shared body ({src} = lineitem view): Spark 3.4+ and DuckDB parse the
#: same UNPIVOT (val FOR metric IN (...)) clause, so the text is shared
#: verbatim and the hash match pins Spark's wide->long lowering against
#: an independent parser's.
_UNPIVOT_BODY = """
WITH w AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS BIGINT)
               AS qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
               AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM {src} GROUP BY l_returnflag
)
SELECT l_returnflag, metric, val
FROM w UNPIVOT (val FOR metric IN (qty, rev_cents, n_items))
"""


@register("sql_unpivot_native",
          oracle=_UNPIVOT_BODY.format(src="lineitem"),
          tags=("sql", "dialect", "reshape"))
def sql_unpivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native SQL ``UNPIVOT`` clause (SPARK-39877, Spark 3.4+) —
    the dialect-surface twin of ``reshape_unpivot`` (which lowers the
    same wide→long reshape through ``stack()``): a per-returnflag
    measure table unpivots into (key, metric, value) rows. Both
    engines parse the identical clause text, so the oracle exercises
    DuckDB's own UNPIVOT implementation against Spark's Expand-based
    lowering — a parser-to-parser differential, the same methodology
    as `sql_pipe_syntax`/`sql_group_by_all`.

    Scale shape: the wide table is group-cardinality-sized (3 rows);
    UNPIVOT lowers to an Expand over it — constant work after one
    map-side-combinable reduce with the money sums quantized to exact
    cents."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("unpv_lineitem")
    return spark.sql(_UNPIVOT_BODY.format(src="unpv_lineitem"))


# --------------------------------------------------------------------------
# agg_survival_nelson_aalen — cumulative-hazard twin of the KM estimator
# --------------------------------------------------------------------------

#: shared tail over the SAME life table as `agg_survival_km` ({r}
#: supplies (rn, dur_d, d_cnt, c_cnt, at_risk)). Unlike the KM product,
#: the Nelson-Aalen sum H_t = sum(d_i/n_i) IS prefix-decomposable: each
#: time's hazard increment nano-quantizes (deterministic per-row IEEE)
#: and the running sum is an exact integer window — no recursion needed.
_NA_BODY = """
SELECT dur_d, d_cnt AS n_events, c_cnt AS n_censored, at_risk,
       CAST(SUM(CAST(FLOOR(d_cnt * 1e9 / at_risk + 5e-1) AS BIGINT))
            OVER (ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cumhaz_nano,
       CAST(FLOOR(EXP(0e0 - SUM(CAST(FLOOR(d_cnt * 1e9 / at_risk + 5e-1)
                                     AS BIGINT))
                      OVER (ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) / 1e9) * 1e6 + 5e-1)
            AS BIGINT) AS breslow_survival_micro
FROM {r}
"""


@register("agg_survival_nelson_aalen",
          oracle=_NA_BODY.format(r=_KM_RISK_DUCK),
          tags=("agg", "stats"))
def agg_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
    1978) on the SAME right-censored time-to-conversion life table as
    `agg_survival_km`: H_t = sum over event times of d_i/n_i, plus the
    Breslow survival exp(-H_t). The hazard-scale twin of KM — H_t is
    the quantity that adds across strata and feeds proportional-hazard
    reasoning ("day 3's conversion intensity doubled"), and
    exp(-H) >= KM's product pointwise, a containment the planted test
    pins. Where the KM product needs engine-native recursion
    (non-decomposable without exp/ln round-trips), the NA SUM is
    prefix-decomposable: one window, no recursion — the pair
    demonstrates both closes over one shared life table.

    Determinism: the life table is the exact integer KM fragment; each
    hazard increment d_i/n_i nano-quantizes per row before the exact
    integer running-sum window; the Breslow close exponentiates the
    identical quantized double on both engines.

    Scale shape: identical to KM's — one groupBy(user) reduce, one
    daily life table bounded by the observation window (~30 rows), a
    window over it. No recursion, so not even the depth bound applies.

    Reference basis: cumulative failure-intensity accounting per
    interval (Documentation-Self-Triggering.html:194-239); estimator
    from Nelson 1972 / Aalen 1978 (public)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    conv = F.min(F.when((F.col("event_type") == "purchase")
                        & (F.col("value") >= 75.0), F.col("ts")))
    u = (ev.groupBy("user_id")
         .agg(((F.unix_micros(F.coalesce(conv, F.max("ts")))
                - F.unix_micros(F.min("ts")))
               / F.lit(86400000000)).cast("long").alias("dur_d"),
              F.when(conv.isNull(), 0).otherwise(1).alias("ev")))
    t = (u.groupBy("dur_d")
         .agg(F.sum("ev").cast("long").alias("d_cnt"),
              F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_cnt")))
    r = (t.select(F.row_number().over(Window.orderBy("dur_d"))
                  .cast("long").alias("rn"),
                  "dur_d", "d_cnt", "c_cnt",
                  F.sum(F.col("d_cnt") + F.col("c_cnt"))
                  .over(Window.orderBy(F.col("dur_d").desc()))
                  .cast("long").alias("at_risk")))
    r.createOrReplaceTempView("na_risk")
    return spark.sql(_NA_BODY.format(r="na_risk"))


# --------------------------------------------------------------------------
# agg_logrank_test — two-cohort survival-curve comparison
# --------------------------------------------------------------------------

#: engine seams for the per-user duration (days from first event to
#: conversion-or-censoring) — DuckDB epoch_us // vs Spark unix_micros
#: div, the `agg_survival_km` convention.
_LOGRANK_DUR_DUCK = ("CAST((epoch_us(COALESCE(MIN(CASE WHEN event_type ="
                     " 'purchase' AND value >= 75e0 THEN ts END),"
                     " MAX(ts))) - epoch_us(MIN(ts))) // 86400000000"
                     " AS BIGINT)")
_LOGRANK_DUR_SPARK = ("CAST((unix_micros(COALESCE(MIN(CASE WHEN"
                      " event_type = 'purchase' AND value >= 75e0 THEN"
                      " ts END), MAX(ts))) - unix_micros(MIN(ts)))"
                      " div 86400000000 AS BIGINT)")

#: shared body ({dur} = engine duration expression): the two-cohort
#: life table (cohort = user parity), per-event-time hypergeometric
#: expectation and variance, and the log-rank chi-square close.
_LOGRANK_BODY = """
WITH u AS (
    SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
           {dur} AS dur_d,
           CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                         AND value >= 75e0 THEN ts END) IS NULL
                THEN 0 ELSE 1 END AS ev
    FROM {src} GROUP BY user_id
),
lt AS (
    SELECT dur_d,
           CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
               AS d1,
           CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM u GROUP BY dur_d
),
risk AS (
    SELECT dur_d, d1, d,
           CAST(SUM(c1) OVER (ORDER BY dur_d DESC) AS BIGINT) AS n1,
           CAST(SUM(c) OVER (ORDER BY dur_d DESC) AS BIGINT) AS n
    FROM lt
),
terms AS (
    SELECT dur_d, d1, d, n1, n,
           CAST(FLOOR(CAST(d AS DOUBLE) * n1 / n * 1e6 + 5e-1) AS BIGINT)
               AS e1_micro,
           CASE WHEN n > 1 THEN
               CAST(FLOOR(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
                          * (1e0 - CAST(n1 AS DOUBLE) / n)
                          * (n - d) / (n - 1) * 1e6 + 5e-1) AS BIGINT)
               ELSE 0 END AS v_micro
    FROM risk WHERE d > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
       CAST(SUM(d1) AS BIGINT) AS o1,
       CAST(SUM(e1_micro) AS BIGINT) AS e1_micro,
       CAST(SUM(v_micro) AS BIGINT) AS v_micro,
       CAST(FLOOR((CAST(SUM(d1) AS DOUBLE) - SUM(e1_micro) / 1e6)
                  * (CAST(SUM(d1) AS DOUBLE) - SUM(e1_micro) / 1e6)
                  / (SUM(v_micro) / 1e6) * 1e3 + 5e-1) AS BIGINT)
           AS chi2_milli
FROM terms
HAVING SUM(v_micro) > 0
"""


@register("agg_logrank_test",
          oracle=_LOGRANK_BODY.format(src="events",
                                      dur=_LOGRANK_DUR_DUCK),
          tags=("agg", "stats", "survival"))
def agg_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the two user-parity cohorts'
    time-to-conversion curves — the standard answer to "are these two
    survival curves DIFFERENT?" that `agg_survival_km` /
    `agg_survival_nelson_aalen` (which only estimate one curve) leave
    open. At each event time the observed cohort-1 conversions d1 are
    compared against the hypergeometric expectation d * n1/n given the
    at-risk sets; chi2 = (O1 - E1)^2 / V with the standard conditional
    variance. The same machinery as `ext_mantel_haenszel` (it IS
    Mantel-Haenszel applied to the sequence of risk-set tables), here
    over event TIMES rather than strata.

    Determinism: the life table is exact integer counting; at-risk
    sets are exact descending cumulative sums; per-time expectation
    and variance terms micro-quantize from fixed-order chains before
    exact integer sums; the close is one chain, NULL-guarded on V.

    Scale shape: one groupBy(user) reduce, one groupBy(day) reduce,
    two windows over the bounded day dimension, a scalar close.
    Nothing after the first reduce scales with the corpus.

    Reference basis: paired-configuration lifetime comparison over
    the run ledger (Documentation-Self-Triggering.html:194-239); test
    from Mantel 1966 / Peto & Peto 1972 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("logrank_events")
    return spark.sql(_LOGRANK_BODY.format(src="logrank_events",
                                          dur=_LOGRANK_DUR_SPARK))


# --------------------------------------------------------------------------
# win_holt_winters — additive triple exponential smoothing (weekly season)
# --------------------------------------------------------------------------

#: the three entangled updates at alpha = beta = gamma = 1/2, inlined
#: because SQL cannot reference select-list aliases; every halving
#: floors via FLOOR(expr / 2e0) (true floor for negative values on
#: both engines — the win_holt_linear lesson):
#:   l_t = (1000·x_t - s_{t-7} + l + b) / 2
#:   b_t = (l_t - l + b) / 2
#:   s_t = (1000·x_t - l_t + s_{t-7}) / 2
_HW_LV = ("CAST(FLOOR((1000 * t.x - hw.s1 + hw.l_milli + hw.b_milli) "
          "/ 2e0) AS BIGINT)")
_HW_BV = (f"CAST(FLOOR(({_HW_LV} - hw.l_milli + hw.b_milli) / 2e0) "
          "AS BIGINT)")
_HW_SV = (f"CAST(FLOOR((1000 * t.x - {_HW_LV} + hw.s1) / 2e0) "
          "AS BIGINT)")

#: shared recursive body ({h} supplies (rn, day, x)). The row at level
#: t stores the POST-state: level/trend after day t plus the rolling
#: last-seven seasonals s1..s7 = days (t-6 .. t), so level t+1 reads
#: its 7-days-ago seasonal as hw.s1 and rotates (s2..s7, s_new). Init:
#: l = 1000·x_1, b = 0, all seasonals 0 (day 1's own update is
#: identically 0 under this init, so the all-zero base row IS the
#: post-state).
_HW_REC = f"""
WITH RECURSIVE hw AS (
    SELECT rn, day, x,
           CAST(1000 * x AS BIGINT) AS l_milli,
           CAST(0 AS BIGINT) AS b_milli,
           CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2,
           CAST(0 AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4,
           CAST(0 AS BIGINT) AS s5, CAST(0 AS BIGINT) AS s6,
           CAST(0 AS BIGINT) AS s7
    FROM {{h}} WHERE rn = 1
    UNION ALL
    SELECT t.rn, t.day, t.x,
           {_HW_LV}, {_HW_BV},
           hw.s2, hw.s3, hw.s4, hw.s5, hw.s6, hw.s7, {_HW_SV}
    FROM {{h}} t JOIN hw ON t.rn = hw.rn + 1
)"""

_HW_BODY = _HW_REC + """
SELECT day, x AS n_events, l_milli AS level_milli, b_milli AS trend_milli,
       s7 AS seasonal_milli,
       CAST(l_milli + b_milli + s1 AS BIGINT) AS forecast_next_milli
FROM hw
"""

#: Spark-side fold twin of _HW_REC (seqfold lowering): the IDENTICAL
#: level/trend/seasonal expressions (_HW_LV/_HW_BV/_HW_SV), re-keyed
#: hw. -> the fold's previous-state struct — one textual source of
#: truth, so the fold cannot drift from the oracle recursion.
_HW_FOLD_INIT = ("named_struct('l_milli', CAST(1000 * {r0}.x AS BIGINT),"
                 " 'b_milli', CAST(0 AS BIGINT), "
                 + ", ".join(f"'s{i}', CAST(0 AS BIGINT)"
                             for i in range(1, 8)) + ")")
_HW_FOLD_STEP = ("named_struct('l_milli', "
                 + _HW_LV.replace("hw.", "{acc}.")
                 + ", 'b_milli', " + _HW_BV.replace("hw.", "{acc}.")
                 + ", 's1', {acc}.s2, 's2', {acc}.s3, 's3', {acc}.s4,"
                 " 's4', {acc}.s5, 's5', {acc}.s6, 's6', {acc}.s7, 's7', "
                 + _HW_SV.replace("hw.", "{acc}.") + ")")

_HW_DAILY_DUCK = """(
    WITH e AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ),
    d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY day)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn, day, x
    FROM d
)"""


@register("win_holt_winters", oracle=_HW_BODY.format(h=_HW_DAILY_DUCK),
          tags=("window", "timeseries", "recursive"))
def win_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple exponential smoothing (Winters
    1960; alpha = beta = gamma = 1/2, season length 7) over the daily
    event-count series: level, trend AND a weekly seasonal state per
    day, plus the one-step-ahead forecast level + trend + seasonal.
    Completes the exponential-smoothing ladder — `win_ewma` (level),
    `win_holt_linear` (level + trend), this (level + trend + season) —
    and is the member that stops mistaking every Sunday dip for a
    trend change, which is what the capacity alarm built on Holt
    linear does weekly.

    The three recurrences entangle (l_t needs s_{t-7}; s_t needs l_t),
    and the seasonal reference reaches SEVEN levels back — carried as
    a rolling 7-column state vector rotated each level, because a
    recursive CTE may reference its own relation only once per level
    (both engines). One body shared verbatim; state stays exact
    milli-unit integers with every halving floored via FLOOR(x / 2e0)
    (true floor for negative trend/seasonal values on both engines,
    where integer div semantics differ). Zero-seasonal init is the
    documented choice: day 1's own seasonal update is identically 0
    under it, and the state converges within ~2 cycles — the honest
    behavior to show for a 4-cycle fixture (classical first-cycle
    initialization is a 7-row change to the base term).

    Scale shape: the corpus reduces to one row per day FIRST
    (map-side combinable); recursion depth = report length (~30),
    constant in data volume.

    Spark-side lowering (optimization round 12): the ~30-level
    recursion ran as ~30 sequential micro-jobs of pure scheduling
    overhead; the same 9-field state recurrence now left-folds over
    the collected day array via `seqfold.fold_states`
    (`_HW_FOLD_STEP` reuses _HW_LV/_HW_BV/_HW_SV verbatim) — ONE job,
    exact-int state, bit-identical by construction.

    Reference basis: rate forecasting with a periodic duty cycle under
    the reuse-thresholds regime (DAQ_self-triggering.md:84-97);
    method from Holt 1957 / Winters 1960 (public)."""
    ensure_deterministic(spark)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project_etl_spark.operators.seqfold import fold_states

    ev = table(spark, sf_dir, "events")
    d = (ev.select(F.expr("unix_micros(ts) div 86400000000").cast("long")
                   .alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))
    h = d.select(F.row_number().over(Window.orderBy("day")).cast("long")
                 .alias("rn"), "day", "x")
    return fold_states(
        h, ["rn", "day", "x"],
        init_sql=_HW_FOLD_INIT, step_sql=_HW_FOLD_STEP,
        out_sql=["e.t.day AS day", "e.t.x AS n_events",
                 "e.s.l_milli AS level_milli", "e.s.b_milli AS trend_milli",
                 "e.s.s7 AS seasonal_milli",
                 "CAST(e.s.l_milli + e.s.b_milli + e.s.s1 AS BIGINT)"
                 " AS forecast_next_milli"])
