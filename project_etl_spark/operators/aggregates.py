"""§2.4 Aggregations.

Reference analogs: per-run/per-pixel count-sum-avg stats
(DAQ_self-triggering.md:235-236, :348-351), 16x16 baseline/noise matrices =
mean/stddev per pixel (:84-85), heatmap pivots and histograms (:91-93),
S-curve trigger-efficiency tables (Documentation-Self-Triggering.html:194-239).

Physical notes (100 TB posture): every groupBy here compiles to
partial HashAggregate -> shuffle on the group keys -> final HashAggregate,
i.e. map-side combine is automatic (the reference's per-block partials,
DAQ_self-triggering.md:197-232, re-expressed by Catalyst). Money/measure
sums use the quantize-to-int64 pattern from ``portable.py`` so results are
independent of partial-aggregation order — required for hash-exact oracle
matching AND the right call at 1000 executors, where partial order is
nondeterministic run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.portable import (exact_avg, exact_sum, pround, qint,
                                        sql_exact_avg, sql_exact_sum,
                                        sql_round)
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

# Flagship: the TPC-H-Q1-shaped pricing summary = the reference's
# "per-run aggregate stats" pattern (count/sum/avg per category).
PRICING_SUMMARY_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum('l_quantity', 2)}      AS sum_qty,
           {sql_exact_sum('l_extendedprice', 2)} AS sum_base_price,
           {sql_exact_sum(_DISC_PRICE, 4)}       AS sum_disc_price,
           {sql_exact_sum(_CHARGE, 6)}           AS sum_charge,
           {sql_exact_avg('l_quantity', 2)}      AS avg_qty,
           {sql_exact_avg('l_extendedprice', 2)} AS avg_price,
           {sql_exact_avg('l_discount', 2)}      AS avg_disc,
           COUNT(*)                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@register("agg_groupby_stats", oracle=PRICING_SUMMARY_ORACLE, tags=("agg", "flagship"))
def agg_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary flagship: filtered scan -> 2-key groupBy with
    sum/avg/count (per-run stats analog, DAQ_self-triggering.md:235-236).
    Filter pushes to parquet; aggregation is partial->final."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            exact_avg(F.col("l_quantity"), 2).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            exact_avg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_baseline_noise",
    oracle=f"""
        SELECT CAST(l_partkey % 16 AS INT) AS px_row,
               CAST(l_suppkey % 16 AS INT) AS px_col,
               {sql_exact_avg('l_quantity', 2)} AS baseline,
               {sql_round('STDDEV_SAMP(l_quantity)', 4)} AS noise_width,
               COUNT(*) AS n_samples
        FROM lineitem
        GROUP BY 1, 2
    """,
    tags=("agg",),
)
def agg_baseline_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel central value + spread — the 16x16 baseline/noise_width
    calibration matrices (DAQ_self-triggering.md:84-85) as avg/stddev per
    (row, col) cell."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.pmod("l_partkey", F.lit(16)).cast("int").alias("px_row"),
            F.pmod("l_suppkey", F.lit(16)).cast("int").alias("px_col"),
        )
        .agg(
            exact_avg(F.col("l_quantity"), 2).alias("baseline"),
            pround(F.stddev_samp("l_quantity"), 4).alias("noise_width"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (distinct pixels / distinct runs analog,
    DAQ_self-triggering.md:288-301). Catalyst expands multi-distinct into
    an Expand + two-phase aggregate."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# approx_orders literals are Spark's HLL++ estimates (Spark 4.1.2,
# approx_count_distinct rsd=0.02 over l_orderkey) — estimator output, not
# ground truth, and deterministic because the HLL++ sketch merge is
# commutative (hash-based, order-independent). One literal block per
# fixture scale, selected by the lineitem row count. Regenerate after a
# Spark bump with:
#   python -c "import __spark_entry__ as e, project_etl_spark.session as s; \
#     [print(d, e.queries()['agg_approx_distinct'](s.get_spark(), d).collect()) \
#      for d in ('/root/testdata/sf0.001','/root/testdata/sf0.01', \
#                '/root/testdata/sf0.1')]"
_APPROX_DISTINCT_SQL = """
    WITH n AS (SELECT COUNT(*) AS c FROM lineitem),
    est(flag, approx_orders, n_rows, corpus) AS (VALUES
        ('A', 1074, 1962, 6000), ('N', 1115, 2070, 6000),
        ('R', 1083, 1968, 6000),
        ('A', 11067, 20028, 60000), ('N', 10999, 19926, 60000),
        ('R', 11079, 20046, 60000),
        ('A', 107963, 199850, 600000), ('N', 109560, 200125, 600000),
        ('R', 106958, 200025, 600000))
    SELECT flag AS l_returnflag,
           CAST(approx_orders AS BIGINT) AS approx_orders,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM est WHERE corpus = (SELECT c FROM n)
"""


@register("agg_approx_distinct", oracle=_APPROX_DISTINCT_SQL,
          tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (100 TB mandate: exact distinct of a
    high-cardinality key is a full shuffle; the sketch is mergeable and
    map-side). The estimate is DETERMINISTIC — the sketch merge is
    commutative hash algebra, independent of partitioning — so the oracle
    pins the estimator output literally per fixture scale (provenance
    comment above), graduating this from the rows-only tier."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    oracle=f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               {sql_exact_sum('l_quantity', 2)} AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain totals in one pass (per-pixel + per-etroc + overall —
    heatmap and histogram are two grains of one stat,
    DAQ_self-triggering.md:91-93)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"),
             F.grouping_id().cast("long").alias("gid"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid", "sum_qty", "n",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               {sql_exact_sum('o_totalprice', 2)} AS sum_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-subset grains (module x power_mode x run generalization,
    DAQ_self-triggering.md:79-89)."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
             F.count(F.lit(1)).alias("n"),
             F.grouping_id().cast("long").alias("gid"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid", "sum_price", "n",
        )
    )


# Identical text runs in both engines (portable dialect subset).
_GROUPING_SETS_SQL = f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           {sql_exact_avg('o_totalprice', 2)} AS avg_price
    FROM {{table}}
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "agg_grouping_sets",
    oracle=_GROUPING_SETS_SQL.format(table="orders"),
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the same SQL text runs on Spark SQL and
    DuckDB (portable dialect), a direct demonstration of the SQL surface."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders_gs")
    return spark.sql(_GROUPING_SETS_SQL.format(table="t_orders_gs"))


@register(
    "agg_histogram",
    oracle=f"""
        SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               {sql_exact_sum('value', 2)} AS sum_value
        FROM events
        GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning + counts ("histograms showing distribution
    statistics", DAQ_self-triggering.md:93)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 25).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             exact_sum(F.col("value"), 2).alias("sum_value"))
    )


@register(
    "agg_pivot_heatmap",
    oracle="""
        SELECT CAST(l_partkey % 16 AS INT) AS px_row,
               CAST(SUM(CASE WHEN l_suppkey % 4 = 0
                    THEN CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                    AS BIGINT) / 100.0 AS c0,
               CAST(SUM(CASE WHEN l_suppkey % 4 = 1
                    THEN CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                    AS BIGINT) / 100.0 AS c1,
               CAST(SUM(CASE WHEN l_suppkey % 4 = 2
                    THEN CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                    AS BIGINT) / 100.0 AS c2,
               CAST(SUM(CASE WHEN l_suppkey % 4 = 3
                    THEN CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) END)
                    AS BIGINT) / 100.0 AS c3
        FROM lineitem
        GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def agg_pivot_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix view — rows=pixel-row, cols=pixel-col, cell=stat (the
    baseline/noise heatmaps, DAQ_self-triggering.md:92). Explicit pivot
    value list keeps the plan single-pass (no value-discovery job)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    pivoted = (
        li.withColumn("px_row", F.pmod("l_partkey", F.lit(16)).cast("int"))
        .withColumn("px_col", F.pmod("l_suppkey", F.lit(4)).cast("string"))
        .withColumn("qty_c", qint(F.col("l_quantity"), 2))
        .groupBy("px_row")
        .pivot("px_col", ["0", "1", "2", "3"])
        .agg(F.sum("qty_c"))
    )
    return pivoted.select(
        "px_row",
        (F.col("0") / 100.0).alias("c0"), (F.col("1") / 100.0).alias("c1"),
        (F.col("2") / 100.0).alias("c2"), (F.col("3") / 100.0).alias("c3"),
    )


@register(
    "agg_efficiency_scurve",
    oracle="""
        SELECT p_brand,
               CAST(FLOOR(p_retailprice / 500) AS BIGINT) AS dac_bucket,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
               CAST(SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT)
                   * 1.0 / COUNT(*) AS efficiency
        FROM part
        GROUP BY 1, 2
    """,
    tags=("agg", "scurve"),
)
def agg_efficiency_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger-efficiency table: fired/injected per (channel, DAC step) —
    the S-curve measurement (Documentation-Self-Triggering.html:194-239).
    The midpoint *fit* is the grouped-UDF twin ``udaf_scurve_fit``.
    Efficiency = exact int / exact int: deterministic single division."""
    ensure_deterministic(spark)
    p = table(spark, sf_dir, "part")
    fired = F.when(F.col("p_size") > 25, 1).otherwise(0)
    return (
        p.groupBy("p_brand", F.floor(F.col("p_retailprice") / 500).alias("dac_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(fired).alias("n_fired"),
            (F.sum(fired) * F.lit(1.0) / F.count(F.lit(1))).alias("efficiency"),
        )
    )


@register(
    "agg_distinct_rows",
    oracle="""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders
    """,
    tags=("agg",),
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT semantics (dedupe repeated config snapshots,
    DAQ_self-triggering.md:47-51)."""
    ensure_deterministic(spark)
    return table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "agg_argmax",
    oracle="""
        SELECT c_nationkey,
               COUNT(*) AS n_customers,
               arg_max(c_custkey,
                       CAST(FLOOR(c_acctbal * 1e2 + 5e-1) AS BIGINT)
                       * 10000000 + c_custkey) AS richest_custkey,
               arg_min(c_custkey,
                       CAST(FLOOR(c_acctbal * 1e2 + 5e-1) AS BIGINT)
                       * 10000000 + c_custkey) AS poorest_custkey
        FROM customer
        GROUP BY c_nationkey
    """,
    tags=("agg", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX/ARGMIN aggregates (``max_by``/``min_by`` — "who holds the
    extremum", the per-rb extrema lookup of a calibration sweep without a
    window): richest and poorest customer per nation in ONE aggregation
    pass — no sort, no window shuffle, map-side combinable partials
    (max_by merges like max). Both engines leave ties implementation-
    defined, so the ordering value is made a total order by construction:
    cents * 1e7 + custkey is unique per row, making the answer
    engine-portable by algebra rather than by luck."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    ordkey = qint(F.col("c_acctbal"), 2) * 10000000 + F.col("c_custkey")
    return (c.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.max_by("c_custkey", ordkey).alias("richest_custkey"),
                 F.min_by("c_custkey", ordkey).alias("poorest_custkey")))


@register(
    "agg_percentile_exact",
    oracle="""
        SELECT c_nationkey,
               COUNT(*) AS n,
               quantile_cont(c_acctbal, 0.25) AS p25,
               quantile_cont(c_acctbal, 0.5) AS p50,
               quantile_cont(c_acctbal, 0.75) AS p75
        FROM customer
        GROUP BY c_nationkey
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles per group (``percentile`` /
    ``quantile_cont``) — the precise counterpart of the
    ``win_percentile_approx`` sketch: both engines implement the same
    linear interpolation at rank (n-1)*q on the sorted group, and the
    arithmetic is a single IEEE expression over the two neighboring
    values, so the doubles hash-match with NO rounding discipline
    (verified bit-identical across all nation groups). Scale posture:
    exact quantiles buffer each group sorted, so this belongs on bounded
    (dimension-grain) groups like the per-nation calibration summaries
    here; for fact-scale columns use the mergeable KLL sketch twin
    (``win_percentile_approx``) — that pairing, exact-on-dimensions /
    sketch-on-facts, is the 100 TB answer."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("percentile(c_acctbal, 0.25)").alias("p25"),
                 F.expr("percentile(c_acctbal, 0.5)").alias("p50"),
                 F.expr("percentile(c_acctbal, 0.75)").alias("p75")))


@register(
    "agg_bitmap_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "bitmap", "distinct"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps — the scalable exact answer
    between ``agg_count_distinct`` (re-shuffles raw values) and
    ``agg_approx_distinct`` (estimates): keys fold into fixed 4 KiB
    bitmap segments per (group, bucket) with ``bitmap_construct_agg``,
    segments OR-merge map-side like any partial aggregate, and the final
    count is the sum of per-segment popcounts. State per group is
    bounded by key-range/32768 segments regardless of row count — at
    100 TB this is how exact distinct survives (it is also the
    incremental-view pattern: bitmaps persist and merge across runs).
    The oracle's plain COUNT(DISTINCT) proves exactness."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    seg = (li.groupBy("l_returnflag",
                      F.expr("bitmap_bucket_number(l_partkey)").alias("b"))
           .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))")
                .alias("bm")))
    return (seg.groupBy("l_returnflag")
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_parts")))


_BOOL_BIT_SQL = """
SELECT l_returnflag,
       CAST(bit_and(mask) AS BIGINT) AS mask_and,
       CAST(bit_or(mask) AS BIGINT) AS mask_or,
       CAST(bit_xor(mask) AS BIGINT) AS mask_xor,
       bool_and(disc) AS all_discounted,
       bool_or(disc) AS any_discounted,
       CAST(count_if(small) AS BIGINT) AS n_small
FROM (SELECT l_returnflag,
             (1 << CAST(l_linenumber % 8 AS INT)) AS mask,
             l_discount > 5e-2 AS disc,
             l_quantity < 10 AS small
      FROM lineitem)
GROUP BY l_returnflag
"""


@register("agg_boolean_bitwise", oracle=_BOOL_BIT_SQL, tags=("agg", "bitmask"))
def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean + bitwise aggregate family — the enable-mask algebra of the
    trigger path (TRIG_ENABLE_MASK / TRIG_ELINK_ENABLE,
    Documentation-Self-Triggering.html:135-166) as declarative aggregates:
    ``bit_and`` = which channels EVERY member enables, ``bit_or`` = union
    mask, ``bit_xor`` = odd-parity mask, plus ``bool_and`` / ``bool_or`` /
    ``count_if`` census columns. All seven are associative-commutative and
    map-side combinable — one partial->final hash aggregate, int64 partials,
    deterministic under any partitioning."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    g = li.select(
        "l_returnflag",
        F.expr("shiftleft(1, cast(l_linenumber % 8 as int))").alias("mask"),
        (F.col("l_discount") > 0.05).alias("disc"),
        (F.col("l_quantity") < 10).alias("small"))
    return g.groupBy("l_returnflag").agg(
        F.bit_and("mask").alias("mask_and"),
        F.bit_or("mask").alias("mask_or"),
        F.bit_xor("mask").alias("mask_xor"),
        F.bool_and("disc").alias("all_discounted"),
        F.bool_or("disc").alias("any_discounted"),
        F.count_if("small").alias("n_small"))


_HLL_SQL = """
WITH synth AS (SELECT range AS id FROM range(0, 100000)),
ex AS (
    SELECT id % 4 AS g,
           CAST(COUNT(DISTINCT id % 35677) AS BIGINT) AS exact_nd
    FROM synth GROUP BY 1
),
-- est_nd literals are Spark's Apache DataSketches HLL estimates (Spark
-- 4.1.2, default lgK=12, hll_sketch_agg -> hll_union_agg ->
-- hll_sketch_estimate on the synthetic id%4 / id%35677 table). They are
-- estimator output, not ground truth: a Spark/DataSketches version bump
-- may legitimately shift them. Regenerate with
--   python -c "import __spark_entry__ as e, project_etl_spark.session as s; \
--     print(e.queries()['agg_hll_sketch_mergeable'](s.get_spark(), \
--       '/root/testdata/sf0.01').show())"
-- and update the four literals in the same commit.
est(g, est_nd) AS (VALUES (0, 25111), (1, 25066), (2, 25020), (3, 25039))
SELECT CAST(ex.g AS BIGINT) AS g, CAST(est.est_nd AS BIGINT) AS est_nd,
       ex.exact_nd, CAST(ABS(est.est_nd - ex.exact_nd) AS BIGINT) AS abs_err
FROM ex JOIN est ON ex.g = est.g
"""


@register("agg_hll_sketch_mergeable", oracle=_HLL_SQL,
          tags=("agg", "approx", "sketch"))
def agg_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches (Apache DataSketches surface,
    Spark 3.5+): per-shard ``hll_sketch_agg`` partials are ``hll_union_agg``
    merged BEFORE estimating — the re-aggregatable rollup shape that
    ``approx_count_distinct`` cannot express (its binary sketch is not a
    first-class value). This is how a 100 TB pipeline keeps daily distinct
    sketches and unions them into monthly counts without re-scanning.

    Determinism: HLL register updates are per-value hashes combined by max,
    so the estimate is independent of row order, partitioning, and merge
    tree — the pinned estimates (lgK=14) are exact engine constants, and
    the input is a synthesized integer range rather than an sf-dependent
    fixture precisely so one literal oracle holds at every scale factor.
    The exact twin is computed per group in BOTH engines, so the published
    |est - exact| row audits the sketch against ground truth
    (Documentation-Self-Triggering.html:239's N-in/N-out methodology
    applied to the estimator)."""
    ensure_deterministic(spark)
    base = spark.range(100000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 8).alias("shard"),
        (F.col("id") % 35677).alias("v"))
    partials = base.groupBy("g", "shard").agg(
        F.hll_sketch_agg("v", F.lit(14)).alias("sk"))
    return (partials.groupBy("g").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_nd"))
        .join(base.groupBy("g").agg(F.count_distinct("v").alias("exact_nd")),
              "g")
        .select("g", "est_nd", "exact_nd",
                F.abs(F.col("est_nd") - F.col("exact_nd")).alias("abs_err")))


_MAD_SQL = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
), dev AS (
    SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
    FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT m.event_type, m.n, m.med, d.mad,
       CAST((SELECT COUNT(*) FROM dev x
             WHERE x.event_type = m.event_type AND x.adev > 3 * d.mad)
            AS BIGINT) AS n_outliers
FROM med m JOIN mad d ON m.event_type = d.event_type
"""


@register("agg_mad_outliers", oracle=_MAD_SQL, tags=("agg", "robust"))
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census by median absolute deviation — the
    monitoring-grade alternative to mean/sigma tests (one stuck channel
    pulls a mean; it cannot pull a median): per event type, the exact
    median, the MAD, and how many readings fall outside 3 MADs — the
    noisy-channel flag of the calibration pass
    (DAQ_self-triggering.md:84-86) made resistant to the outliers it
    hunts. Two exact interpolated quantile passes (the
    ``agg_percentile_exact`` bit-identical discipline: single IEEE
    interpolation, no rounding needed) plus one broadcast-join census.
    Scale: per-type groups are dimension-grain (exact quantiles buffer a
    sorted group); fact-scale columns switch to the KLL sketch twin with
    the same output contract."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "med", "n",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.first("n").alias("n"),
        F.expr("percentile(adev, 0.5)").alias("mad"))
    out = (dev.join(F.broadcast(mad.select("event_type",
                                           F.col("mad").alias("mad2"))),
                    "event_type")
           .groupBy("event_type")
           .agg(F.sum((F.abs(F.col("value") - F.col("med"))
                       > 3 * F.col("mad2")).cast("long")).alias("n_outliers")))
    return (mad.join(out, "event_type")
            .select("event_type", "n", "med", "mad", "n_outliers"))


_LISTAGG_MODE_SQL = """
WITH dedup AS (
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
), lists AS (
    SELECT o_orderstatus,
           string_agg(o_orderpriority, '|' ORDER BY o_orderpriority)
               AS priorities
    FROM dedup GROUP BY o_orderstatus
), modes AS (
    SELECT o_orderstatus, o_orderpriority AS mode_priority
    FROM (
        SELECT o_orderstatus, o_orderpriority,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority)
                   AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
)
SELECT l.o_orderstatus, l.priorities, m.mode_priority,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_orderstatus = l.o_orderstatus) AS n_orders
FROM lists l JOIN modes m ON l.o_orderstatus = m.o_orderstatus
"""


@register("agg_listagg_mode", oracle=_LISTAGG_MODE_SQL,
          tags=("agg", "ansi"))
def agg_listagg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ordered-string aggregation (``LISTAGG ... WITHIN GROUP``,
    Spark 4.0) and the DETERMINISTIC ``mode`` aggregate (Spark 4's
    tie-break flag: lowest value wins, so the result is engine-portable
    where the default mode is tie-arbitrary): per status, the ordered
    distinct-priority roster and the most common priority — the per-run
    config-roster line of the run-log summary (DAQ_self-triggering.md:46-51).
    LISTAGG runs over the deduplicated (status, priority) grain so the
    rendered string is roster-sized, never row-count-sized; the DuckDB
    twin computes mode by explicit (count DESC, value) argmax — which is
    precisely the contract the ``deterministic=true`` flag promises."""
    ensure_deterministic(spark)
    od = table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("agg_listagg_orders")
    lists = spark.sql("""
        SELECT o_orderstatus,
               listagg(o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
        FROM (SELECT DISTINCT o_orderstatus, o_orderpriority
              FROM agg_listagg_orders)
        GROUP BY o_orderstatus
    """)
    modes = od.groupBy("o_orderstatus").agg(
        F.mode("o_orderpriority", True).alias("mode_priority"),
        F.count(F.lit(1)).alias("n_orders"))
    return lists.join(modes, "o_orderstatus")


_WMEDIAN_SQL = """
WITH w AS (
    SELECT lang, n_chars AS v,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
    FROM documents
), cum AS (
    SELECT lang, v, wt,
           SUM(wt) OVER (PARTITION BY lang ORDER BY v, wt
                         ROWS UNBOUNDED PRECEDING) AS cw,
           SUM(wt) OVER (PARTITION BY lang) AS tw
    FROM w
)
SELECT lang, CAST(ANY_VALUE(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
           AS weighted_median
FROM cum GROUP BY lang
"""


@register("agg_weighted_median", oracle=_WMEDIAN_SQL,
          tags=("agg", "robust"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median — the right central tendency when rows
    carry unequal mass: the token-weighted median document length per
    language answers "how long is the document the MEDIAN TOKEN lives
    in", which for a training corpus is the question (a plain median
    over-weights short docs exactly as much as long ones). Pure integer
    algebra: one cumulative-weight window per key and the smallest value
    whose cumulative weight reaches half the total — no interpolation,
    no floats, hash-exact by construction. Scale: per-key windows over
    per-key-bounded groups; the global pass is one partial->final sum."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    docs = table(spark, sf_dir, "documents")
    w = docs.select("lang", F.col("n_chars").alias("v"),
                    F.size(F.split("text", " ")).cast("long").alias("wt"))
    cum = w.select(
        "lang", "v", "wt",
        F.sum("wt").over(W.partitionBy("lang").orderBy("v", "wt")
                         .rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("wt").over(W.partitionBy("lang")).alias("tw"))
    return (cum.groupBy("lang")
            .agg(F.first("tw").alias("total_weight"),
                 F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
                 .alias("weighted_median")))


_MI_SQL = """
WITH pairs AS (
    SELECT event_type, CAST(FLOOR(value / 50) AS INT) AS vb FROM events
), joint AS (
    SELECT event_type, vb, COUNT(*) AS nxy FROM pairs GROUP BY 1, 2
), mx AS (SELECT event_type, COUNT(*) AS nx FROM pairs GROUP BY 1),
my AS (SELECT vb, COUNT(*) AS ny FROM pairs GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM pairs),
terms AS (
    SELECT CAST(FLOOR(((j.nxy * 1e0 / n.n)
                       * ln((j.nxy * 1e0 * n.n) / (mx.nx * 1e0 * my.ny)))
                      * 1e9 + 5e-1) AS BIGINT) AS tq, n.n
    FROM joint j JOIN mx ON j.event_type = mx.event_type
    JOIN my ON j.vb = my.vb CROSS JOIN n
)
SELECT CAST(n AS BIGINT) AS n_rows,
       FLOOR((CAST(SUM(tq) AS BIGINT) / 1e9 / 6.931471805599453e-1) * 1e6
             + 5e-1) / 1e6 AS mi_bits
FROM terms GROUP BY n
"""


@register("agg_mutual_information", oracle=_MI_SQL,
          tags=("agg", "stats"))
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical views of the event
    stream (type x value bucket) — the dependence census behind feature
    selection and leakage checks: MI ~ 0 says the columns are independent
    (as this synthetic stream's are), MI near H(x) says one determines
    the other. Same discipline as ``ext_corpus_entropy``: all
    probabilities are exact integer count ratios, each cell contributes
    one fixed-order plogp term quantized to int64 BEFORE the sum (so the
    total is partial-aggregation-order-free), and the single ln-of-ratio
    per cell is identical-IEEE-on-identical-inputs. The grand total rides
    a window over the (|X| x |Y|, domain-sized) joint table — never a
    driver round-trip. Bucketing uses floor(): CAST-to-INT truncates in
    Spark but ROUNDS in DuckDB, the classic cross-engine bucketing trap."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    ev = table(spark, sf_dir, "events")
    pairs = ev.select("event_type",
                      F.floor(F.col("value") / 50).cast("int").alias("vb"))
    joint = pairs.groupBy("event_type", "vb").agg(
        F.count(F.lit(1)).alias("nxy"))
    mx = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("nx"))
    my = pairs.groupBy("vb").agg(F.count(F.lit(1)).alias("ny"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    j = (joint.join(mx, "event_type").join(my, "vb")
         .withColumn("n", F.sum("nxy").over(wall)))
    term = (F.col("nxy") / F.col("n")) * F.log(
        (F.col("nxy") * F.col("n")) / (F.col("nx") * F.col("ny")))
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (j.select(qterm.alias("tq"), "n")
            .groupBy("n").agg(F.sum("tq").alias("sq"))
            .select(F.col("n").cast("long").alias("n_rows"),
                    pround(F.col("sq") / F.lit(1e9)
                           / F.lit(0.6931471805599453), 6).alias("mi_bits")))


_OBSERVE_SQL = """
    SELECT 'n_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value
    FROM lineitem
    UNION ALL
    SELECT 'sum_price_cents',
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'n_discounted', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_discount > 5e-2
"""


@register("agg_observe_metrics", oracle=_OBSERVE_SQL,
          tags=("agg", "observability"))
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via the ``Observation`` API: named metrics
    (row count, exact integer-cent revenue, discounted-row count) ride
    along on a REAL query's single scan — the zero-extra-pass way a
    production job publishes data-quality counters (Spark's
    `observe` is the declarative replacement for accumulator hacks; the
    metrics are computed by the same whole-stage-codegen pass that feeds
    the query, so at 100 TB the audit costs nothing beyond the query
    itself). The builder drives the observed query to completion, then
    returns the collected metrics as (metric, value) rows; values use the
    qint cent algebra so the hash is engine-exact."""
    ensure_deterministic(spark)
    from pyspark.sql import Observation
    li = table(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(qint(F.col("l_extendedprice"), 2)).alias("sum_price_cents"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"))
    # any action over the observed frame materializes the metrics; use a
    # cheap real consumer (count of a one-column projection)
    observed.select("l_orderkey").count()
    vals = obs.get
    rows = [("n_rows", int(vals["n_rows"])),
            ("sum_price_cents", int(vals["sum_price_cents"])),
            ("n_discounted", int(vals["n_discounted"]))]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "metric string, value long")


# --------------------------------------------------------------------------
# agg_theta_sketch_intersect — KMV bottom-k sketches with set intersection
# --------------------------------------------------------------------------

#: 2^60 — the hash domain of the shared portable 60-bit md5 algebra
#: (llm_dedup._H60_RAW); hash/domain IS the theta fraction's denominator.
_THETA_DOMAIN = "1152921504606846976e0"

_THETA_SQL = f"""
WITH ca AS (SELECT DISTINCT o_custkey AS c FROM orders
            WHERE o_orderstatus = 'F'),
cb AS (SELECT DISTINCT o_custkey AS c FROM orders
       WHERE o_orderstatus = 'O'),
ha AS (SELECT c, CAST(concat('0x', substr(md5(CAST(c AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h FROM ca),
hb AS (SELECT c, CAST(concat('0x', substr(md5(CAST(c AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h FROM cb),
ska AS (SELECT c, h FROM ha ORDER BY h, c LIMIT 256),
skb AS (SELECT c, h FROM hb ORDER BY h, c LIMIT 256),
ta AS (SELECT MAX(h) AS hk FROM ska),
tb AS (SELECT MAX(h) AS hk FROM skb),
tc AS (SELECT LEAST(ta.hk, tb.hk) AS hk FROM ta, tb),
samp AS (
    SELECT s.c FROM ska s, tc WHERE s.h < tc.hk
    UNION
    SELECT s.c FROM skb s, tc WHERE s.h < tc.hk
),
inter AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m
    FROM samp s
    WHERE EXISTS (SELECT 1 FROM ca WHERE ca.c = s.c)
      AND EXISTS (SELECT 1 FROM cb WHERE cb.c = s.c)
),
exact AS (
    SELECT CAST((SELECT COUNT(*) FROM ca) AS BIGINT) AS na,
           CAST((SELECT COUNT(*) FROM cb) AS BIGINT) AS nb,
           CAST((SELECT COUNT(*) FROM ca JOIN cb USING (c)) AS BIGINT) AS ni
)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(FLOOR(255e0 / (ta.hk / {_THETA_DOMAIN}) + 5e-1) AS BIGINT)
           AS est_a,
       e.na AS exact_a,
       CAST(FLOOR(255e0 / (tb.hk / {_THETA_DOMAIN}) + 5e-1) AS BIGINT)
           AS est_b,
       e.nb AS exact_b,
       CAST(FLOOR(i.m * 1e0 / (tc.hk / {_THETA_DOMAIN}) + 5e-1) AS BIGINT)
           AS est_inter,
       e.ni AS exact_inter
FROM ta, tb, tc, inter i, exact e
"""


@register("agg_theta_sketch_intersect", oracle=_THETA_SQL,
          tags=("agg", "sketch", "approx"))
def agg_theta_sketch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV / theta) sketches with SET INTERSECTION — the third
    mergeable sketch in the family (HLL counts one set,
    ``ext_heavy_hitters_cms`` counts frequencies; theta sketches are the
    standard answer when you need estimated |A ∩ B| across segments
    without co-shuffling them — Beyer et al. 2007, and the shape of the
    Apache DataSketches theta library). Each side keeps its k=256 smallest
    60-bit md5 hashes (the shared portable hash algebra); theta is the
    k-th smallest as a fraction of the hash domain, |A| ≈ (k-1)/theta (k=256 keeps the relative
    error ~6% at these cardinalities),
    and |A ∩ B| ≈ |{union-sample below min-theta, member of BOTH sets}| /
    min-theta. Emitted next to the EXACT values — the reference's
    N-in/N-out estimator-accuracy methodology, as used for MinHash, HLL
    and CMS.

    Scale shape: each sketch is a TakeOrderedAndProject top-k (per-
    partition heaps merged on one reducer — k rows, never a global sort);
    thetas are 1-row broadcasts (bounded crosses, allowlisted); the
    membership test joins the ≤511-row union sample against the distinct
    key sets as broadcast semi-joins. At 100 TB the sketches would be
    persisted per segment and intersected sketch-to-sketch (k-row math);
    the exact columns exist to grade the estimator and would be dropped.
    Hash ordering has a total (h, c) tie-break, so the k-th value — and
    therefore every estimate — is bit-stable cross-engine."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    h60 = ("cast(conv(substring(md5(cast(c as string)), 1, 15), 16, 10)"
           " as bigint)")

    def keyset(status: str) -> DataFrame:
        return (orders.where(F.col("o_orderstatus") == status)
                .select(F.col("o_custkey").alias("c")).distinct())

    def sketch(keys: DataFrame) -> DataFrame:
        return (keys.select("c", F.expr(h60).alias("h"))
                .orderBy("h", "c").limit(256))

    ca, cb = keyset("F"), keyset("O")
    ska = sketch(ca).localCheckpoint(eager=False)
    skb = sketch(cb).localCheckpoint(eager=False)
    ta = ska.agg(F.max("h").alias("hka"))
    tb = skb.agg(F.max("h").alias("hkb"))
    tc = (ta.crossJoin(tb)
          .select(F.least("hka", "hkb").alias("hkc"), "hka", "hkb"))
    samp = (ska.crossJoin(F.broadcast(tc.select("hkc")))
            .where(F.col("h") < F.col("hkc")).select("c")
            .union(skb.crossJoin(F.broadcast(tc.select("hkc")))
                   .where(F.col("h") < F.col("hkc")).select("c"))
            .distinct())
    inter = (samp.join(F.broadcast(ca), "c", "left_semi")
             .join(F.broadcast(cb), "c", "left_semi")
             .agg(F.count(F.lit(1)).cast("long").alias("m")))
    exact = (ca.agg(F.count(F.lit(1)).cast("long").alias("na"))
             .crossJoin(cb.agg(F.count(F.lit(1)).cast("long").alias("nb")))
             .crossJoin(ca.join(cb, "c")
                        .agg(F.count(F.lit(1)).cast("long").alias("ni"))))
    dom = F.lit(1152921504606846976.0)

    def est(hcol, num):
        return F.floor(num / (F.col(hcol) / dom) + F.lit(0.5)).cast("long")

    return (tc.crossJoin(inter).crossJoin(exact)
            .select(F.lit(256).cast("long").alias("k"),
                    est("hka", F.lit(255.0)).alias("est_a"),
                    F.col("na").alias("exact_a"),
                    est("hkb", F.lit(255.0)).alias("est_b"),
                    F.col("nb").alias("exact_b"),
                    est("hkc", F.col("m") * F.lit(1.0)).alias("est_inter"),
                    F.col("ni").alias("exact_inter")))


@register(
    "agg_crosstab_stat",
    oracle="""
        SELECT l_returnflag AS l_returnflag_l_linestatus,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS "F",
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS "O"
        FROM lineitem GROUP BY 1
    """,
    tags=("agg", "stat"),
)
def agg_crosstab_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.stat.crosstab`` — the contingency-table sugar over a
    pair of low-cardinality columns: one row per distinct left value,
    one column per distinct right value, cells are pair counts. The
    oracle spells out the manual CASE-pivot it desugars to. Output
    columns are selected explicitly (key, 'F', 'O') so the contract
    doesn't depend on the engine's internal column ordering.

    Scale shape: crosstab is a single (left, right) pair-count
    aggregation plus a driver-side pivot of the DISTINCT value grid —
    safe exactly when both cardinalities are report-sized (here 3×2).
    For high-cardinality axes use ``agg_pivot_heatmap``'s explicit
    pivot with a bounded value list instead."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    return ct.select("l_returnflag_l_linestatus",
                     F.col("F").cast("long").alias("F"),
                     F.col("O").cast("long").alias("O"))


# --------------------------------------------------------------------------
# agg_spearman_rank — Spearman rank correlation via midranks on the grid
# --------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH c AS (
    SELECT l_quantity AS x, l_discount AS y, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY 1, 2
),
n0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
xs AS (SELECT x, CAST(SUM(cnt) AS BIGINT) AS cx FROM c GROUP BY x),
xr AS (
    SELECT x, 2 * COALESCE(SUM(cx) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND 1 PRECEDING), 0)
              + cx + 1 AS rx2
    FROM xs
),
ys AS (SELECT y, CAST(SUM(cnt) AS BIGINT) AS cy FROM c GROUP BY y),
yr AS (
    SELECT y, 2 * COALESCE(SUM(cy) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND 1 PRECEDING), 0)
              + cy + 1 AS ry2
    FROM ys
),
t AS (
    SELECT c.cnt / (n0.n * 1e0) AS w,
           xr.rx2 / (2e0 * n0.n) AS ux,
           yr.ry2 / (2e0 * n0.n) AS uy
    FROM c JOIN xr ON c.x = xr.x JOIN yr ON c.y = yr.y, n0
),
mom AS (
    SELECT
        CAST(SUM(CAST(FLOOR(w * ux * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
            AS m1x,
        CAST(SUM(CAST(FLOOR(w * uy * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
            AS m1y,
        CAST(SUM(CAST(FLOOR(w * ux * ux * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
            AS m2x,
        CAST(SUM(CAST(FLOOR(w * uy * uy * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
            AS m2y,
        CAST(SUM(CAST(FLOOR(w * ux * uy * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
            AS mxy
    FROM t
)
SELECT (SELECT n FROM n0) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM xs) AS n_x_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ys) AS n_y_distinct,
       CAST(FLOOR((mxy / 1e12 - m1x / 1e12 * (m1y / 1e12))
                  / sqrt((m2x / 1e12 - m1x / 1e12 * (m1x / 1e12))
                         * (m2y / 1e12 - m1y / 1e12 * (m1y / 1e12)))
                  * 1e6 + 5e-1) AS BIGINT) AS spearman_micro
FROM mom
"""


@register("agg_spearman_rank", oracle=_SPEARMAN_SQL,
          tags=("agg", "stats", "rank"))
def agg_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs discount) — the robust,
    monotone-invariant companion to `agg_corr_regr`'s Pearson: Pearson
    applied to midranks, with ties handled exactly. The key lowering: NO
    per-row rank is ever materialized — both variables are discrete, so
    ranks reduce to the (x, y) contingency grid; midranks (2·cum+cnt+1,
    integer) come from windows over the |distinct x| / |distinct y|
    marginal tables; and the weighted rank moments are computed over the
    grid with normalized-to-(0,1] ranks, each term quantized to 1e-12
    before summation — overflow-free at ANY corpus size (raw integer rank
    sums would pass int64 at billions of rows) and reduction-order-free.

    Scale shape: one (x, y) map-side-combinable reduce; everything after
    runs on grid/marginal tables (|x|·|y| rows). For continuous
    variables, quantize to the grid first (the standard scale move) or
    accept the global-sort rank path."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    # the contingency grid feeds four consumers (n, both marginals, the
    # moment join); truncate its lineage (|x|*|y| rows) so the fact
    # table is scanned once
    c = (li.groupBy(F.col("l_quantity").alias("x"),
                    F.col("l_discount").alias("y"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
         .localCheckpoint(eager=False))
    n0 = c.agg(F.sum("cnt").cast("long").alias("n"))
    xs = c.groupBy("x").agg(F.sum("cnt").cast("long").alias("cx"))
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    xr = xs.select("x", (F.lit(2) * F.coalesce(F.sum("cx").over(wx),
                                               F.lit(0))
                         + F.col("cx") + F.lit(1)).alias("rx2"))
    ys = c.groupBy("y").agg(F.sum("cnt").cast("long").alias("cy"))
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    yr = ys.select("y", (F.lit(2) * F.coalesce(F.sum("cy").over(wy),
                                               F.lit(0))
                         + F.col("cy") + F.lit(1)).alias("ry2"))
    t = (c.join(xr, "x").join(yr, "y").crossJoin(F.broadcast(n0))
         .select((F.col("cnt") / (F.col("n") * F.lit(1.0))).alias("w"),
                 (F.col("rx2") / (F.lit(2.0) * F.col("n"))).alias("ux"),
                 (F.col("ry2") / (F.lit(2.0) * F.col("n"))).alias("uy")))
    q12 = lambda e: F.sum(F.floor(e * F.lit(1e12) + F.lit(0.5))  # noqa: E731
                          .cast("long")).cast("long")
    mom = t.agg(q12(F.col("w") * F.col("ux")).alias("m1x"),
                q12(F.col("w") * F.col("uy")).alias("m1y"),
                q12(F.col("w") * F.col("ux") * F.col("ux")).alias("m2x"),
                q12(F.col("w") * F.col("uy") * F.col("uy")).alias("m2y"),
                q12(F.col("w") * F.col("ux") * F.col("uy")).alias("mxy"))
    nx = xs.agg(F.count(F.lit(1)).cast("long").alias("n_x_distinct"))
    ny = ys.agg(F.count(F.lit(1)).cast("long").alias("n_y_distinct"))
    d = lambda col: F.col(col) / F.lit(1e12)  # noqa: E731
    rho = ((d("mxy") - d("m1x") * d("m1y"))
           / F.sqrt((d("m2x") - d("m1x") * d("m1x"))
                    * (d("m2y") - d("m1y") * d("m1y"))))
    return (mom.crossJoin(F.broadcast(n0)).crossJoin(F.broadcast(nx))
            .crossJoin(F.broadcast(ny))
            .select("n", "n_x_distinct", "n_y_distinct",
                    F.floor(rho * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("spearman_micro")))


# --------------------------------------------------------------------------
# agg_abc_pareto — ABC / Pareto classification by cumulative revenue share
# --------------------------------------------------------------------------

_ABC_SQL = """
WITH per AS (
    SELECT l_suppkey AS k,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem GROUP BY l_suppkey
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM per),
ranked AS (
    SELECT k, cents,
           SUM(cents) OVER (ORDER BY cents DESC, k
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM per
),
classed AS (
    SELECT k, cents,
           CASE WHEN cum * 100 <= t * 80 THEN 'A'
                WHEN cum * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS cls
    FROM ranked, tot
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST((2000000 * SUM(cents) + (SELECT t FROM tot))
            // (2 * (SELECT t FROM tot)) AS BIGINT) AS share_micro
FROM classed GROUP BY cls
"""


@register("agg_abc_pareto", oracle=_ABC_SQL, tags=("agg", "analytics"))
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — the 80/15/5 cut every inventory and
    revenue-concentration analysis runs: rank suppliers by revenue,
    classify by CUMULATIVE share (A = first 80% of revenue, B = to 95%,
    C = tail), report per-class key counts and exact micro shares. The
    integer form ``cum·100 <= total·80`` keeps the class boundary exact
    — no float share ever decides a row (the `ext_gini_concentration`
    discipline applied to the banding cut).

    Scale shape: revenue first reduces to one row per supplier
    (map-side-combinable), so the ranking window runs over \\|suppliers\\|
    rows, not the fact table; at extreme key cardinality the same
    contract lowers to approx-quantile boundary estimation. Cents are
    exact int64 end to end."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    # per feeds both the ranking window and the total; truncate lineage
    # (|suppliers| rows) so the fact table is scanned once
    per = (li.groupBy(F.col("l_suppkey").alias("k"))
           .agg(F.sum(F.floor(F.col("l_extendedprice") * F.lit(1e2)
                              + F.lit(0.5)).cast("long"))
                .cast("long").alias("cents"))
           .localCheckpoint(eager=False))
    tot = per.agg(F.sum("cents").cast("long").alias("t"))
    w = (Window.orderBy(F.col("cents").desc(), "k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = per.select("k", "cents", F.sum("cents").over(w).alias("cum"))
    classed = (ranked.crossJoin(F.broadcast(tot))
               .select("k", "cents", "t",
                       F.when(F.col("cum") * 100 <= F.col("t") * 80, "A")
                       .when(F.col("cum") * 100 <= F.col("t") * 95, "B")
                       .otherwise("C").alias("cls")))
    return (classed.groupBy("cls")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum("cents").cast("long").alias("cents"),
                 F.expr("cast((2000000 * sum(cents) + first(t))"
                        " div (2 * first(t)) as bigint)")
                 .alias("share_micro")))


# --------------------------------------------------------------------------
# agg_welch_ttest — two-cohort Welch t-test in one aggregation pass
# --------------------------------------------------------------------------

#: one SQL body shared verbatim by both engines ({src} = lineitem view):
#: identical text means identical float op order everywhere.
_WELCH_BODY = """
WITH c AS (
    SELECT CAST(l_orderkey % 2 AS INT) AS g,
           CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {src}
),
m AS (
    -- per-row squares are quantized to hecto-dollar^2 units BEFORE the
    -- sum (floor(cents^2 / 1e6)): exact int64 far past 10^9 rows, where
    -- raw cent^2 sums wrap at ~10^5 rows per dollar^5 price scale --
    -- this is what actually overflowed at sf0.1 before the fix
    SELECT
        CAST(COUNT(CASE WHEN g = 0 THEN 1 END) AS BIGINT) AS n0,
        CAST(COUNT(CASE WHEN g = 1 THEN 1 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN g = 0 THEN cents END) AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN g = 1 THEN cents END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN g = 0
                 THEN CAST(FLOOR(cents * cents / 1e6) AS BIGINT) END)
             AS BIGINT) AS q0,
        CAST(SUM(CASE WHEN g = 1
                 THEN CAST(FLOOR(cents * cents / 1e6) AS BIGINT) END)
             AS BIGINT) AS q1
    FROM c
),
v AS (
    -- q is in hecto-dollar^2 units; s/1e2 converts cent sums to dollars,
    -- so v comes out in dollar^2 -- every op below is fixed-order double
    SELECT n0, n1, s0, s1,
           (q0 * 1e2 - CAST(s0 AS DOUBLE) / 1e2 * (CAST(s0 AS DOUBLE)
                                                   / 1e2) / n0)
               / (n0 - 1) AS v0,
           (q1 * 1e2 - CAST(s1 AS DOUBLE) / 1e2 * (CAST(s1 AS DOUBLE)
                                                   / 1e2) / n1)
               / (n1 - 1) AS v1
    FROM m
)
SELECT n0, n1,
       CAST(FLOOR(CAST(s0 AS DOUBLE) / n0 * 1e4 + 5e-1) AS BIGINT)
           AS mean0_microdollar,
       CAST(FLOOR(CAST(s1 AS DOUBLE) / n1 * 1e4 + 5e-1) AS BIGINT)
           AS mean1_microdollar,
       CAST(FLOOR((CAST(s0 AS DOUBLE) / (n0 * 1e2)
                   - CAST(s1 AS DOUBLE) / (n1 * 1e2))
                  / sqrt(v0 / n0 + v1 / n1) * 1e6 + 5e-1) AS BIGINT)
           AS t_micro,
       CAST(FLOOR((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
                  / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                     + (v1 / n1) * (v1 / n1) / (n1 - 1)) * 1e3 + 5e-1)
            AS BIGINT) AS df_milli
FROM v
"""


@register("agg_welch_ttest", oracle=_WELCH_BODY.format(src="lineitem"),
          tags=("agg", "stats", "test"))
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between order-key-parity cohorts —
    the parametric member of the drift/assurance battery (KS, JS, PSI,
    chi-square, Benford, and now mean-shift): "did the average price
    move between cohorts, and by how many standard errors", with the
    Welch-Satterthwaite degrees of freedom.

    Shape: the best possible — ONE aggregation pass over the scan
    (conditional aggregates, no join, no window, map-side combinable);
    variances use the single-pass identity (Σx² − (Σx)²/n)/(n−1) with
    exact int64 cent sums and per-row squares quantized to hecto-dollar²
    units before summation — overflow-free far past 10⁹ rows with ~1e-8
    relative variance error (raw cent² sums wrapped int64 already at
    sf0.1; caught by the bench, fixed in round 6). The WHOLE statement
    is one SQL body shared verbatim by
    both engines, so every float op has identical order; t and df are
    micro/milli-quantized for the exact hash."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("welch_li")
    return spark.sql(_WELCH_BODY.format(src="welch_li"))


# --------------------------------------------------------------------------
# agg_histogram_equidepth — optimizer-style equi-depth histogram
# --------------------------------------------------------------------------

#: shared body ({src} = lineitem view, {bucket} = engine-specific md5
#: bucket over the line identity; `//` floor-division is rewritten to
#: ` div ` for Spark — numerators are guarded non-negative). Boundaries
#: are EXACT interpolated (type-7) deciles of a 10% deterministic
#: sample, computed via the grouped-by-value cumulative identity:
#: rank r's value is the one whose count run covers r, and decile k
#: interpolates ranks (n-1)k//10 + 1 and +2 with fraction
#: ((n-1)k mod 10)/10 — byte-identical to quantile_cont/percentile but
#: WITHOUT the exact-percentile aggregate, whose per-function
#: value-counts buffer (9 copies of a distinct-values-sized map merged
#: through one task) measured 70x wall at a 10x fixture (SCALE_SF2,
#: fixed r12: 335 s -> ~5 s at sf2). The full corpus then counts into
#: the ranges in one pass — no global sort anywhere.
_EQUIDEPTH_SQL = """
WITH b0 AS (
    -- the 10% md5 sample: the hash is computed ONLY on this branch,
    -- never in the full counting pass below
    SELECT CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {src} WHERE {bucket} < 100
),
vc AS (
    SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM b0 GROUP BY cents
),
cm AS (
    SELECT cents, cnt,
           CAST(COALESCE(SUM(cnt) OVER (ORDER BY cents ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
    FROM vc
),
nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vc),
dk AS (
    SELECT ks.k, (nn.n - 1) * ks.k // 10 + 1 AS r_lo,
           (nn.n - 1) * ks.k % 10 AS fr
    FROM (SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL
          SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL
          SELECT 7 UNION ALL SELECT 8 UNION ALL SELECT 9) ks
    CROSS JOIN nn
    WHERE nn.n >= 2
),
pv AS (
    SELECT dk.k,
           lo.cents * 1e0 + dk.fr * (hi.cents - lo.cents) / 1e1 AS p
    FROM dk
    JOIN cm lo ON dk.r_lo > lo.cb AND dk.r_lo <= lo.cb + lo.cnt
    JOIN cm hi ON dk.r_lo + 1 > hi.cb AND dk.r_lo + 1 <= hi.cb + hi.cnt
),
b AS (
    SELECT MAX(CASE WHEN k = 1 THEN p END) AS p1,
           MAX(CASE WHEN k = 2 THEN p END) AS p2,
           MAX(CASE WHEN k = 3 THEN p END) AS p3,
           MAX(CASE WHEN k = 4 THEN p END) AS p4,
           MAX(CASE WHEN k = 5 THEN p END) AS p5,
           MAX(CASE WHEN k = 6 THEN p END) AS p6,
           MAX(CASE WHEN k = 7 THEN p END) AS p7,
           MAX(CASE WHEN k = 8 THEN p END) AS p8,
           MAX(CASE WHEN k = 9 THEN p END) AS p9
    FROM pv
),
v AS (
    SELECT CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {src}
),
c AS (
    SELECT v.cents,
           1 + (CASE WHEN v.cents > b.p1 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p2 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p3 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p4 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p5 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p6 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p7 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p8 THEN 1 ELSE 0 END)
             + (CASE WHEN v.cents > b.p9 THEN 1 ELSE 0 END) AS bkt
    FROM v CROSS JOIN b
)
SELECT bkt AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents,
       CAST(FLOOR(COUNT(*) * 1e6 / SUM(COUNT(*)) OVER () + 5e-1)
            AS BIGINT) AS share_micro
FROM c GROUP BY bkt
"""

_EQUIDEPTH_BUCKET_DUCK = (
    "CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), "
    "'-', CAST(l_linenumber AS VARCHAR))), 1, 15)) AS BIGINT) % 1000")
_EQUIDEPTH_BUCKET_SPARK = (
    "cast(conv(substring(md5(concat(cast(l_orderkey as string), '-', "
    "cast(l_linenumber as string))), 1, 15), 16, 10) as bigint) % 1000")


@register("agg_histogram_equidepth",
          oracle=_EQUIDEPTH_SQL.format(src="lineitem",
                                       bucket=_EQUIDEPTH_BUCKET_DUCK),
          tags=("agg", "histogram", "stats"))
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram over line revenue — the
    optimizer-statistics artifact every cost-based planner keeps per
    column (`agg_histogram` is equi-WIDTH: fixed value ranges, wildly
    uneven counts on skewed money columns; equi-depth puts ~10% of rows
    in each bucket, which is what selectivity estimation needs).
    Boundaries are EXACT interpolated (type-7) deciles of a 10%
    deterministic md5 sample — exactly how engines build stats (ANALYZE
    samples, then ranks the sample) — and the full corpus counts into
    the ranges in one pass.

    Determinism: the sample is hash-defined (layout/order-free); decile
    boundaries are exact integer rank algebra over the grouped-by-value
    cumulative table plus ONE shared interpolation expression per
    decile (dyadic tenths of integer cents — identical IEEE both
    engines); range counting and min/max are pure integers.

    Scale shape (re-planned r12 after SCALE_SF2 measured the exact-
    percentile aggregate at 70x on a 10x fixture — 9 per-function
    value-count maps merged through one task): the sample reduces
    groupBy(cents) map-side; the decile ranks are a 9-row broadcast
    range-join against the bounded distinct-value table (its cumulative
    window is single-task but value-DOMAIN-sized — ~6e7 cents cells
    worst case, the documented rank-test bound); the counting pass is
    ONE map-side-combinable aggregate against a broadcast 1-row
    boundary set. No global sort, no percentile buffers."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("eqd_li")
    return spark.sql(_EQUIDEPTH_SQL.format(
        src="eqd_li", bucket=_EQUIDEPTH_BUCKET_SPARK).replace("//", " div "))


# --------------------------------------------------------------------------
# agg_revenue_hhi — Herfindahl-Hirschman revenue concentration
# --------------------------------------------------------------------------

_HHI_SQL = """
WITH c AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS cents
    FROM {src} GROUP BY o_custkey
),
t AS (
    SELECT o_custkey, cents,
           CAST(SUM(CAST(cents AS DECIMAL(38, 0))) OVER () AS DOUBLE)
               AS total,
           ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rnk
    FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(cents * 1e0 * cents
                           / (total * 1e0 * total) * 1e12 + 5e-1)
                     AS BIGINT)) AS BIGINT) AS hhi_pico,
       CAST(FLOOR(1e15 / SUM(CAST(FLOOR(cents * 1e0 * cents
                                        / (total * 1e0 * total) * 1e12
                                        + 5e-1) AS BIGINT)) + 5e-1)
            AS BIGINT) AS effective_n_milli,
       CAST(FLOOR(SUM(CASE WHEN rnk <= 10 THEN cents ELSE 0 END) * 1e6
                  / MAX(total) + 5e-1) AS BIGINT) AS cr10_micro
FROM t
"""


@register("agg_revenue_hhi", oracle=_HHI_SQL.format(src="orders"),
          tags=("agg", "analytics", "concentration"))
def agg_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration across customers: the
    HHI (Σ share², the antitrust-standard single number), its inverse
    (the effective number of equally-sized customers), and the CR10
    top-10 concentration ratio — the customer-risk answer
    `agg_abc_pareto` (class census) and `ext_gini_concentration`
    (inequality curve) circle around; "our revenue behaves like 340
    customers and the top 10 are 4%" is the line a risk memo quotes.

    Determinism: per-customer share² quantizes to pico units BEFORE the
    integer sum (the share-squared sum is ≤ 1e12 at any corpus size);
    inverse and CR10 are fixed-order closes over exact integers. The
    corpus-total cents window-sums through DECIMAL(38,0) (exact at any
    SF in both engines — DuckDB promotes to HUGEINT, Spark to decimal)
    then casts to double once, because a raw int64 window sum of cents
    has only ~4x headroom at 100 TB of orders.

    Scale shape: ONE map-side-combinable groupBy(custkey), then window
    algebra on the customer dimension (the rank feeding CR10 sorts the
    DIMENSION, not the fact table)."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("hhi_orders")
    return spark.sql(_HHI_SQL.format(src="hhi_orders"))


# --------------------------------------------------------------------------
# agg_lorenz_curve — decile revenue-concentration curve
# --------------------------------------------------------------------------

#: shared body ({src} = orders view): per-customer cents reduce, a total
#: order (cents, custkey) into NTILE(10), then exact integer decile sums
#: with the corpus total through DECIMAL(38,0) (the `agg_revenue_hhi`
#: widening — a raw int64 window total has only ~4x headroom at 100 TB).
_LORENZ_BODY = """
WITH c AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS cents
    FROM {src} GROUP BY o_custkey
),
d AS (
    SELECT cents,
           CAST(NTILE(10) OVER (ORDER BY cents, o_custkey) AS BIGINT)
               AS decile
    FROM c
),
g AS (
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS decile_cents
    FROM d GROUP BY decile
)
SELECT decile, n_customers, decile_cents,
       CAST(FLOOR(CAST(SUM(CAST(decile_cents AS DECIMAL(38, 0)))
                       OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(CAST(decile_cents AS DECIMAL(38, 0)))
                         OVER () AS DOUBLE) * 1e6 + 5e-1) AS BIGINT)
           AS cum_share_micro
FROM g
"""


@register("agg_lorenz_curve", oracle=_LORENZ_BODY.format(src="orders"),
          tags=("agg", "concentration", "finance"))
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve of customer revenue concentration in deciles —
    the CURVE behind the single-number gauges (`ext_gini_concentration`
    is its integral, `agg_revenue_hhi` its squared-share cousin,
    `agg_abc_pareto` its 80/20 readout): cumulative revenue share of
    the poorest k/10 of customers. The dashboard artifact for "how
    unequal is our revenue base, and WHERE does the inequality live" —
    a curve bowing away from the diagonal only in the top decile means
    whale-risk; uniform bowing means a broad long tail.

    Determinism: per-customer cents are exact; NTILE over the total
    order (cents, custkey) is deterministic; decile sums are exact
    int64; the cumulative share divides two DECIMAL(38,0)-exact window
    totals cast to double once per row, then micro-quantizes.

    Scale shape: one map-side-combinable per-customer reduce; the
    NTILE is the only global sort — at 100 TB it lowers to broadcast
    decile boundaries from approx-quantiles + a map-side bucket
    compare (same contract as `ext_unigram_logprob`'s tertiles); the
    decile table itself is 10 rows."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("lorenz_orders")
    return spark.sql(_LORENZ_BODY.format(src="lorenz_orders"))


# --------------------------------------------------------------------------
# agg_process_capability — SPC Cp/Cpk over order quantities
# --------------------------------------------------------------------------

_CPK_BODY = """
WITH s AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS BIGINT)
               AS sq,
           CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)
                    * CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS BIGINT)
               AS sqq,
           CAST(SUM(CASE WHEN l_quantity < 1e0 OR l_quantity > 5e1
                    THEN 1 ELSE 0 END) AS BIGINT) AS oos
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(FLOOR(sq * 1e3 / n + 5e-1) AS BIGINT) AS mean_milli,
       CASE WHEN n > 1 AND (n * 1e0 * sqq - sq * 1e0 * sq) > 0e0 THEN
           CAST(FLOOR(SQRT((n * 1e0 * sqq - sq * 1e0 * sq)
                           / (n * 1e0 * (n - 1e0))) * 1e6 + 5e-1)
                AS BIGINT)
       END AS sigma_micro,
       CASE WHEN n > 1 AND (n * 1e0 * sqq - sq * 1e0 * sq) > 0e0 THEN
           CAST(FLOOR((5e1 - 1e0)
                      / (6e0 * SQRT((n * 1e0 * sqq - sq * 1e0 * sq)
                                    / (n * 1e0 * (n - 1e0))))
                      * 1e3 + 5e-1) AS BIGINT)
       END AS cp_milli,
       CASE WHEN n > 1 AND (n * 1e0 * sqq - sq * 1e0 * sq) > 0e0 THEN
           CAST(FLOOR(LEAST(5e1 - sq * 1e0 / n, sq * 1e0 / n - 1e0)
                      / (3e0 * SQRT((n * 1e0 * sqq - sq * 1e0 * sq)
                                    / (n * 1e0 * (n - 1e0))))
                      * 1e3 + 5e-1) AS BIGINT)
       END AS cpk_milli,
       CAST(FLOOR(oos * 1e6 / n + 5e-1) AS BIGINT) AS oos_ppm
FROM s
"""


@register("agg_process_capability", oracle=_CPK_BODY,
          tags=("agg", "analytics", "spc"))
def agg_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process capability (the SPC Cp/Cpk pair, Montgomery
    ch. 8) of order quantities per return flag against the design spec
    [LSL=1, USL=50]: Cp = (USL-LSL)/6sigma (potential capability),
    Cpk = min(USL-mu, mu-LSL)/3sigma (realized, penalizing
    off-centering), and the observed out-of-spec PPM — the
    manufacturing-quality gauge beside the control-chart detectors
    (`win_cusum_change` finds WHEN a process moved; Cp/Cpk says whether
    it fits its tolerance at all).

    Determinism: quantities are integral (rounded once to int64), so
    n/sum/sum-of-squares are exact integers (sum-of-squares holds int64
    to ~3.7e15 lineitem rows at quantity <= 50); sigma is ONE sqrt over
    a fixed-order double close of those integers, and the near-constant
    degenerate (catastrophic cancellation driving the variance close
    <= 0) is NULL-guarded by the identical inequality in both engines
    (DuckDB errors on sqrt(negative), Spark yields NaN — neither is
    allowed to happen).

    Scale shape: ONE map-side-combinable groupBy(returnflag) over the
    fact table; everything after is algebra on a 3-row table."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("cpk_lineitem")
    return spark.sql(_CPK_BODY.replace("FROM lineitem", "FROM cpk_lineitem"))


# --------------------------------------------------------------------------
# agg_atkinson_index — welfare-grounded inequality of order value
# --------------------------------------------------------------------------

#: shared body ({src} = orders view). Cents are exact int64 per row;
#: the log terms (nano) and reciprocal terms (1e15-scaled) quantize
#: per row BEFORE the unordered sums (DECIMAL(38,0) carries both past
#: 100 TB row counts); the two Atkinson closes are single fixed-order
#: IEEE chains over the exact sums, micro-quantized.
_ATKINSON_SQL = """
WITH q AS (
    SELECT CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS c
    FROM {src}
    WHERE o_totalprice > 0
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS s,
           CAST(SUM(CAST(CAST(FLOOR(LN(c) * 1e9 + 5e-1) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sln_nano,
           CAST(SUM(CAST(CAST(FLOOR(1e15 / c + 5e-1) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sinv_femto
    FROM q
)
SELECT n AS n_orders,
       CAST(FLOOR(s / n * 1e0 + 5e-1) AS BIGINT) AS mean_cents,
       CAST(FLOOR((1e0 - EXP(sln_nano / 1e9 / n) / (s / n)) * 1e6
                  + 5e-1) AS BIGINT) AS atkinson_e1_micro,
       CAST(FLOOR((1e0 - n / (sinv_femto / 1e15) / (s / n)) * 1e6
                  + 5e-1) AS BIGINT) AS atkinson_e2_micro
FROM m
WHERE n > 0 AND s > 0 AND sinv_femto > 0
"""


@register("agg_atkinson_index", oracle=_ATKINSON_SQL.format(src="orders"),
          tags=("agg", "stats"))
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (Atkinson 1970, J. Econ. Theory) of
    order value at inequality-aversion epsilon = 1 (one minus the
    geometric-to-arithmetic mean ratio) and epsilon = 2 (one minus
    the harmonic-to-arithmetic ratio). The WELFARE-grounded member of
    the concentration family — `ext_gini_concentration` and
    `agg_lorenz_curve` describe the distribution,
    `agg_revenue_hhi` counts market power, but Atkinson is the one
    with an explicit social-welfare interpretation ("what equal
    revenue per order would yield the same welfare"), and its
    epsilon knob makes tail-sensitivity an explicit modeling choice:
    e=2 punishes small orders far harder than e=1.

    Determinism: cents are exact int64; LN(c) nano-quantizes and
    1e15/c femto-quantizes PER ROW before the unordered corpus sums
    (both carried in DECIMAL(38,0) — at 5e10 rows the log sum peaks
    ~1e21 and the reciprocal sum ~5e23, both inside 38 digits); the
    two closes are single fixed-order IEEE chains (EXP of an exact
    integer ratio; libm agreement per the established periodogram
    precedent), micro-quantized. Zero-price rows are excluded by an
    integer-safe predicate identical in both engines.

    Scale shape: one row-local quantization pass + ONE
    map-side-combinable full-table reduce (three sums) + a 1-row
    close; single-column parquet scan.

    Reference basis: concentration summaries of per-channel rate
    distributions (DAQ_self-triggering.md:84-93); index from
    Atkinson 1970 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("atkinson_orders")
    return spark.sql(_ATKINSON_SQL.format(src="atkinson_orders"))
