"""§2.6 Sorts / limits / top-k.

Reference analogs: deterministic per-(run, rb) output ordering
(DAQ_self-triggering.md:288-301), hottest/noisiest-pixel reports (:91-93).

Scale note: global ``orderBy(...).limit(k)`` compiles to
``TakeOrderedAndProject`` — per-partition top-k then a k-sized driver merge;
no global sort materializes. Per-group top-k uses a window filter, one
shuffle on the group key. Every limit has a total-order tie-break
(SURVEY.md §2 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "sort_multikey",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    tags=("sort",),
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total ordering with a bounding limit."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "topk_limit",
    oracle="""
        SELECT CAST(l_partkey % 16 AS INT) AS px_row,
               CAST(l_suppkey % 16 AS INT) AS px_col,
               COUNT(*) AS hits
        FROM lineitem
        GROUP BY 1, 2
        ORDER BY hits DESC, px_row, px_col
        LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k hottest pixels with total-order tie-break (metric DESC, row, col) —
    the noisiest-pixel report (DAQ_self-triggering.md:91-93)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.pmod("l_partkey", F.lit(16)).cast("int").alias("px_row"),
                   F.pmod("l_suppkey", F.lit(16)).cast("int").alias("px_col"))
        .agg(F.count(F.lit(1)).alias("hits"))
        .orderBy(F.col("hits").desc(), "px_row", "px_col")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM (
            SELECT o_orderstatus, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    tags=("sort", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (per-ETROC outputs, DAQ_self-triggering.md:92) via a
    row_number window filter with deterministic tie-break."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_orderstatus", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )

@register(
    "sort_limit_offset",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 5 OFFSET 10
    """,
    tags=("sort", "topk"),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated ordered read — ``DataFrame.offset`` (Spark 3.4+) under a
    total ordering, the "page 3 of the leaderboard" primitive. Spark
    compiles offset+limit over a sort into a (offset+limit)-sized
    top-k (``TakeOrderedAndProject`` with offset): each partition keeps
    at most 15 rows and the driver merge drops the first 10 — no global
    sort, no full materialization.

    Scale shape: cost grows with offset+limit, NOT with input size; the
    deterministic tie-break (price DESC, key) makes every page stable
    across runs and partitionings. Deep pagination (offset in the
    millions) is the anti-pattern at 100 TB — a keyset predicate
    (``WHERE price < last_seen``) replaces it; this operator is the
    bounded-page form."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(5)
    )
