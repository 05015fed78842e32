"""§2.7 Set operations.

Reference analogs: merging per-run/per-rb datasets
(DAQ_self-triggering.md:288-301, :312), cross-run stability checks
(:137-272), acquired-but-not-merged deltas (:237, :306-314).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "set_union_all",
    oracle="""
        SELECT 'customer' AS side, c_custkey AS key, c_name AS name FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_suppkey AS key, s_name AS name FROM supplier
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation by name (the per-run merge, DAQ_self-triggering.md:288-301):
    ``unionByName`` — position-independent, no shuffle."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"))
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"))
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys active in both of two subsets (pixels active in both runs,
    DAQ_self-triggering.md:137-272). INTERSECT distinct semantics."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "set_except",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta set (acquired-but-not-merged runs — the watchdog's work list,
    DAQ_self-triggering.md:237, :306-314). EXCEPT distinct semantics."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    all_k = o.select("o_custkey")
    merged = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return all_k.subtract(merged)  # EXCEPT (distinct) semantics


@register(
    "set_except_all",
    oracle="""
        WITH counted AS (
            SELECT o_custkey FROM orders
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        )
        SELECT o_custkey, COUNT(*) AS n FROM counted GROUP BY o_custkey
    """,
    tags=("setop", "multiset"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (``exceptAll``): each occurrence counts — the
    per-EVENT delta (how many acquisitions per customer are still
    unmerged), where the distinct EXCEPT collapses to a membership test.
    Summarized per key so the hash check pins the multiplicities."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    all_k = o.select("o_custkey")
    merged = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return (all_k.exceptAll(merged)
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))


@register(
    "set_intersect_all",
    oracle="""
        WITH counted AS (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT o_custkey, COUNT(*) AS n FROM counted GROUP BY o_custkey
    """,
    tags=("setop", "multiset"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (``intersectAll``): min of per-side
    multiplicities — customers active in BOTH order states, weighted by
    how often, not just membership."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    open_k = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (open_k.intersectAll(filled)
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))


@register(
    "set_symmetric_diff",
    oracle="""
        WITH a AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderstatus = 'F'),
        b AS (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderstatus = 'O')
        SELECT o_custkey, 'a_only' AS side FROM (
            SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        UNION ALL
        SELECT o_custkey, 'b_only' FROM (
            SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    """,
    tags=("setop",),
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with side attribution — the reconciliation
    census: which keys exist in exactly ONE of two snapshots, and which
    side holds them (runs acquired but never merged vs merged entries
    whose source vanished, DAQ_self-triggering.md:237, :306-314). Two
    anti-joins over the same pair of deduped key sets, unioned with a
    side tag — completes the set family (union/intersect/except and
    their multiset ALL variants) with the one combinator they compose
    into."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return (a.subtract(b).withColumn("side", F.lit("a_only"))
            .unionByName(b.subtract(a).withColumn("side", F.lit("b_only"))))
