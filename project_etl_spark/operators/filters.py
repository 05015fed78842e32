"""§2.2 Projections / filters / predicates.

Reference analogs: derived per-pixel threshold = baseline + offset
(DAQ_self-triggering.md:86), signal-over-threshold triggering
(DAQ_self-triggering.md:342-347), filler-frame suppression
(Documentation-Self-Triggering.html:51), per-bit enable masks
(Documentation-Self-Triggering.html:55, :135, :150).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.portable import pround, sql_round
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "project_derived",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               {sql_round('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)} AS charge,
               {sql_round('l_extendedprice * l_discount', 2)} AS disc_amount
        FROM lineitem
    """,
    tags=("projection",),
)
def project_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns (threshold = baseline + offset analog,
    DAQ_self-triggering.md:86). Pure narrow transformation: no shuffle."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount"))
               * (1 + F.col("l_tax")), 2).alias("charge"),
        pround(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("disc_amount"),
    )


@register(
    "filter_threshold",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 30 AND l_extendedprice > 50000
    """,
    tags=("filter",),
)
def filter_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-over-threshold predicate (DAQ_self-triggering.md:342-347).
    Both conjuncts are pushed to the parquet row-group reader."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 30) & (F.col("l_extendedprice") > 50000))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "filter_frame_kind",
    oracle="""
        SELECT event_id, event_type
        FROM events
        WHERE event_type <> 'view'
    """,
    tags=("filter",),
)
def filter_frame_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discriminator predicate: suppress the high-volume 'filler' class
    (Documentation-Self-Triggering.html:51) — here 'view' events."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") != "view").select("event_id", "event_type")


@register(
    "predicate_in_between_like",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
          AND c_acctbal BETWEEN 100 AND 9000
          AND c_name LIKE '%1%'
    """,
    tags=("filter",),
)
def predicate_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership + range + pattern predicates (run ranges
    DAQ_self-triggering.md:30-39; name patterns :293-301)."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
                & F.col("c_acctbal").between(100, 9000)
                & F.col("c_name").like("%1%"))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@register(
    "null_handling",
    oracle="""
        SELECT o.o_orderkey,
               COALESCE(MAX(l.l_quantity), -1.0) AS max_big_qty,
               COUNT(l.l_orderkey) AS n_big_items,
               MAX(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS had_null
        FROM orders o
        LEFT JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 47
        GROUP BY o.o_orderkey
    """,
    tags=("filter", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics on a nullable enrichment (runs lacking environment
    samples, DAQ_self-triggering.md:249-252): left join + coalesce + null
    predicates."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    joined = o.join(
        li.where(F.col("l_quantity") > 47),
        on=o["o_orderkey"] == li["l_orderkey"], how="left",
    )
    return joined.groupBy(o["o_orderkey"].alias("o_orderkey")).agg(
        F.coalesce(F.max("l_quantity"), F.lit(-1.0)).alias("max_big_qty"),
        F.count("l_orderkey").alias("n_big_items"),
        F.max(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias("had_null"),
    )


@register(
    "bitmask_select",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (l_orderkey >> 2) & 15 AS quad,
               l_orderkey & 3 AS lane
        FROM lineitem
        WHERE (l_orderkey & 3) = 1
    """,
    tags=("filter", "bitwise"),
)
def bitmask_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bit enable-mask selection (TRIG_ENABLE_MASK / TRIG_ELINK_ENABLE,
    Documentation-Self-Triggering.html:135, :150): bitwise AND/shift inside
    a filter, evaluated JVM-side in whole-stage codegen."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_orderkey").bitwiseAND(3)) == 1)
        .select(
            "l_orderkey", "l_linenumber",
            F.shiftright("l_orderkey", 2).bitwiseAND(15).alias("quad"),
            F.col("l_orderkey").bitwiseAND(3).alias("lane"),
        )
    )
