"""§2.3 Joins — every flavor the reference's pipelines imply, plus the two
scale-sensitive helpers Spark lacks natively (as-of, bucketized range join).

Reference analogs: run <-> metadata enrichment (DAQ_self-triggering.md:246-263),
tiny config dimensions (:395-416), HV/temperature time-series attachment
(:249-263 — as-of and interval semantics), watchdog readiness sets
(:284, :306-314 — semi/anti), 16x16 grid densification (:85, :334).

Scale notes: equi-joins shuffle both sides on the key unless one side
broadcasts — dimensions here (nation/region/part/supplier at fixture scale;
config tables in the reference) are broadcast explicitly. Pure-inequality
joins would fall back to BroadcastNestedLoopJoin, which is O(n*m) and dies at
100 TB; the helpers below bucketize the domain so the planner sees an
equi-join on the bucket key and the inequality survives only as a residual
predicate over co-bucketed pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.portable import (exact_sum, pround, sql_exact_sum,
                                        sql_round)
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

# --------------------------------------------------------------------------
# Library helpers (importable; used by the registered queries below)
# --------------------------------------------------------------------------


def asof_join(left: DataFrame, right: DataFrame, *, on: str, left_ts: str,
              right_ts: str, right_cols: dict[str, str],
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``direction="backward"``, the default) or the
    earliest right row with ``right_ts >= left_ts`` (``"forward"``) within
    the same ``on`` partition.

    Reference semantics: "read HV to get the run's VMon/IMon" = nearest
    sample at-or-before run end (DAQ_self-triggering.md:249-253); the
    forward direction is the same lookup against the NEXT sample (the
    pandas ``merge_asof(direction=...)`` surface).

    Implementation: union the two streams with a side tag, one window sort
    per key, ``last(value, ignorenulls=True)`` carries the most recent right
    value forward onto left rows — for ``"forward"`` the window simply
    sorts time DESCENDING, so "most recent in traversal order" is the
    nearest later sample. One shuffle on the key, no range explosion —
    this scales linearly where a naive theta join is O(n*m). Ties (equal
    timestamps) resolve to the right row (side tag orders right before
    left at the same instant), matching DuckDB ``ASOF JOIN``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # The right payload is carried as ONE struct per right row, so a NULL
    # field in the latest right row stays NULL (per-column carries would
    # resurrect stale values and stitch different right rows together).
    payload = F.struct(*[F.col(src).alias(dst)
                         for src, dst in right_cols.items()])
    lt = (left.withColumn("__side", F.lit(1))
          .withColumn("__ts", F.col(left_ts))
          .withColumn("__r", F.lit(None).cast("string")))  # retyped in union
    # A NULL right_ts would sort FIRST in the ascending window and its
    # payload would carry onto every left row; ASOF semantics (ts >= b.ts)
    # never match NULL-ts rows, so drop them up front.
    rt = (right.where(F.col(right_ts).isNotNull())
          .select(F.col(on), F.col(right_ts).alias("__ts"),
                  payload.alias("__r"))
          .withColumn("__side", F.lit(0)))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    lt = lt.drop("__r")
    rt_struct_type = dict(rt.dtypes)["__r"]
    lt = lt.withColumn("__r", F.lit(None).cast(rt_struct_type))
    unioned = lt.unionByName(rt.select(*lt.columns))
    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (Window.partitionBy(on).orderBy(ts_order, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried_struct = F.last("__r", ignorenulls=True).over(w)
    keep = [c for c in left.columns]
    carried = [carried_struct.getField(dst).alias(dst)
               for dst in right_cols.values()]
    return (unioned.select(*keep, F.col("__side").alias("__side"), *carried)
            .where(F.col("__side") == 1).drop("__side"))


def bucketized_range_join(left: DataFrame, right: DataFrame, *, on: Column,
                          left_val: Column, right_val: Column,
                          lo: Column, hi: Column, bucket_width: int) -> DataFrame:
    """Range join ``right_val BETWEEN left_val + lo AND left_val + hi``
    (plus an optional equi-key ``on``) without a nested-loop plan.

    Both sides get an integer bucket ``floor(val / width)``; the left side
    explodes to every bucket its window overlaps, then an equi-join on
    (key, bucket) + residual range predicate runs as a plain shuffled hash
    join. Choose ``bucket_width >= hi - lo`` so each left row lands in at
    most 2 buckets.
    """
    n_buckets = 2  # width >= window span => window covers <= 2 buckets
    lb = (left
          .withColumn("__lv", left_val)
          .withColumn("__b0", F.floor((left_val + lo) / bucket_width))
          .withColumn("__b", F.explode(F.sequence(
              F.col("__b0"), F.col("__b0") + F.lit(n_buckets - 1))))
          .drop("__b0"))
    rb = right.withColumn("__rv", right_val).withColumn(
        "__b", F.floor(right_val / bucket_width))
    cond = (on & (lb["__b"] == rb["__b"])
            & (rb["__rv"] >= lb["__lv"] + lo) & (rb["__rv"] <= lb["__lv"] + hi))
    return lb.join(rb, cond, "inner")


# --------------------------------------------------------------------------
# Declared queries
# --------------------------------------------------------------------------


@register(
    "join_inner_equi",
    oracle="""
        SELECT n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension enrichment chain (hits -> run metadata keying,
    DAQ_self-triggering.md:246-263). lineitem⋈orders shuffles on orderkey;
    customer/nation broadcast under AQE thresholds."""
    ensure_deterministic(spark)
    li, o, c, n = (table(spark, sf_dir, t) for t in
                   ("lineitem", "orders", "customer", "nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_broadcast_dim",
    oracle="""
        SELECT p.p_brand, s.s_name,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(FLOOR(l.l_quantity * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) / 100.0 AS sum_qty
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size <= 40
        GROUP BY p.p_brand, s.s_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension join with explicit broadcast hints (config/module
    tables are tiny, DAQ_self-triggering.md:395-416): zero shuffle of the
    fact side — map-side hash joins feeding one aggregation."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 40)
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("p_brand", "s_name")
        .agg(F.count(F.lit(1)).alias("n_items"),
             exact_sum(F.col("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey,
               COUNT(o.o_orderkey) AS n_orders,
               COALESCE(CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) / 100.0, 0.0) AS total_spent
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
        GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer enrichment keeping unmatched keys (runs lacking
    environment samples, DAQ_self-triggering.md:249-252)."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    joined = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    return joined.groupBy(c["c_custkey"].alias("c_custkey")).agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(exact_sum(F.col("o_totalprice"), 2), F.lit(0.0))
        .alias("total_spent"),
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readiness-set membership (watchdog: which runs have their files,
    DAQ_self-triggering.md:284, :306-314): LEFT SEMI join — no payload from
    the probe side, no row multiplication."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readiness-set complement (runs acquired but not yet merged,
    DAQ_self-triggering.md:237, :306-314): LEFT ANTI join."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "join_range_interval",
    oracle="""
        SELECT e.event_id,
               COUNT(f.event_id) AS n_following
        FROM events e
        LEFT JOIN events f
          ON e.user_id = f.user_id
         AND f.ts > e.ts
         AND f.ts <= e.ts + INTERVAL 1 HOUR
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
    tags=("join", "range"),
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval attachment (samples within [start, finish] of a run,
    DAQ_self-triggering.md:249-263), via the bucketized helper: equi-join on
    (user, hour-bucket) + residual predicate — no nested-loop plan."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("double").alias("ts_s"))
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"),
        F.col("ts_s").alias("e_ts"))
    matched = bucketized_range_join(
        errors, ev.select(F.col("event_id").alias("f_id"),
                          F.col("user_id").alias("f_user"),
                          F.col("ts_s").alias("f_ts")),
        on=F.col("e_user") == F.col("f_user"),
        left_val=F.col("e_ts"), right_val=F.col("f_ts"),
        lo=F.lit(0.0), hi=F.lit(3600.0), bucket_width=3600,
    ).where(F.col("f_ts") > F.col("e_ts"))  # strict lower bound residual
    counts = matched.groupBy("e_id").agg(F.count(F.lit(1)).alias("n_following"))
    return (errors.join(counts, "e_id", "left")
            .select(F.col("e_id").alias("event_id"),
                    F.coalesce("n_following", F.lit(0)).alias("n_following")))


@register(
    "join_asof",
    oracle="""
        SELECT p.event_id,
               b.event_id AS prior_browse_id,
               b.bval AS prior_value
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (
            SELECT user_id, ts, MAX_BY(event_id, event_id) AS event_id,
                   (FLOOR(MAX_BY(value, event_id) * 100.0 + 0.5) / 100.0) AS bval
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY user_id, ts
        ) b ON p.user_id = b.user_id AND p.ts >= b.ts
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest browse event at-or-before each purchase (the HV
    VMon/IMon as-of lookup, DAQ_self-triggering.md:249-253), via the
    union+window ``asof_join`` helper. Right side pre-deduped to one row per
    (key, ts) with a deterministic max-event_id rule so ties are total."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    browse = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("b_id"),
             pround(F.max_by("value", "event_id"), 2).alias("b_val"))
    )
    out = asof_join(
        purchases, browse, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"b_id": "prior_browse_id", "b_val": "prior_value"},
    )
    return out.select("event_id", "prior_browse_id", "prior_value")


@register(
    "join_asof_forward",
    oracle="""
        SELECT p.event_id,
               b.event_id AS next_browse_id,
               b.bval AS next_value
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (
            SELECT user_id, ts, MAX_BY(event_id, event_id) AS event_id,
                   (FLOOR(MAX_BY(value, event_id) * 100.0 + 0.5) / 100.0) AS bval
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY user_id, ts
        ) b ON p.user_id = b.user_id AND p.ts <= b.ts
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: the earliest browse event at-or-after each
    purchase — the pandas ``merge_asof(direction="forward")`` surface, and
    the reference's "next environment sample after run start" lookup
    mirrored. Same union+window helper as ``join_asof``, with the window
    sorted time-descending; identical one-shuffle linear cost."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    browse = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("b_id"),
             pround(F.max_by("value", "event_id"), 2).alias("b_val"))
    )
    out = asof_join(
        purchases, browse, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"b_id": "next_browse_id", "b_val": "next_value"},
        direction="forward",
    )
    return out.select("event_id", "next_browse_id", "next_value")


@register(
    "join_cross_grid",
    oracle="""
        WITH grid AS (
            SELECT r.i AS px_row, c.i AS px_col
            FROM generate_series(0, 15) r(i)
            CROSS JOIN generate_series(0, 15) c(i)
        ),
        hits AS (
            SELECT CAST(l_partkey % 16 AS INT) AS px_row,
                   CAST(l_suppkey % 16 AS INT) AS px_col,
                   COUNT(*) AS hits
            FROM lineitem GROUP BY 1, 2
        )
        SELECT CAST(g.px_row AS INT) AS px_row,
               CAST(g.px_col AS INT) AS px_col,
               COALESCE(h.hits, 0) AS hits
        FROM grid g LEFT JOIN hits h
          ON g.px_row = h.px_row AND g.px_col = h.px_col
    """,
    tags=("join", "cross"),
)
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 16x16 pixel-grid densification (DAQ_self-triggering.md:85,
    :334): tiny crossJoin generates the grid, sparse aggregates left-join
    onto it, absent cells read 0."""
    ensure_deterministic(spark)
    rows = spark.range(16).select(F.col("id").cast("int").alias("px_row"))
    cols = spark.range(16).select(F.col("id").cast("int").alias("px_col"))
    grid = rows.crossJoin(cols)
    li = table(spark, sf_dir, "lineitem")
    hits = (
        li.groupBy(F.pmod("l_partkey", F.lit(16)).cast("int").alias("px_row"),
                   F.pmod("l_suppkey", F.lit(16)).cast("int").alias("px_col"))
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (grid.join(hits, ["px_row", "px_col"], "left")
            .select("px_row", "px_col",
                    F.coalesce("hits", F.lit(0)).alias("hits")))


@register(
    "join_theta",
    oracle="""
        SELECT a.event_id AS first_id, b.event_id AS second_id,
               a.user_id
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'purchase' AND b.event_type = 'purchase'
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 2 HOUR
    """,
    tags=("join", "theta"),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General non-equi pairing (coincidence matching between detector
    planes: |TOA_a - TOA_b| < delta, DAQ_self-triggering.md:339-353), bounded
    by the bucketized helper so the plan is an equi-join, not BNLJ."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("ts_s"))
    a = p.select(F.col("event_id").alias("first_id"),
                 F.col("user_id").alias("a_user"), F.col("ts_s").alias("a_ts"))
    b = p.select(F.col("event_id").alias("second_id"),
                 F.col("user_id").alias("b_user"), F.col("ts_s").alias("b_ts"))
    pairs = bucketized_range_join(
        a, b, on=F.col("a_user") == F.col("b_user"),
        left_val=F.col("a_ts"), right_val=F.col("b_ts"),
        lo=F.lit(0.0), hi=F.lit(7200.0), bucket_width=7200,
    ).where(F.col("b_ts") > F.col("a_ts"))
    return pairs.select("first_id", "second_id", F.col("a_user").alias("user_id"))


@register(
    "join_null_safe",
    oracle="""
        WITH a AS (
            SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE o_orderstatus END AS k,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        b AS (
            SELECT CASE WHEN l_linestatus = 'F' THEN NULL
                        ELSE l_linestatus END AS k,
                   COUNT(*) AS n_lineitems
            FROM lineitem GROUP BY 1
        )
        SELECT COALESCE(a.k, '<null>') AS k, a.n_orders, b.n_lineitems
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "nullsafe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of dropping out — the semantics a late-bound
    dimension join needs when 'unknown' must line up with 'unknown'. The
    fixtures carry no organic NULLs, so each side manufactures one NULL
    key group via NULLIF before joining. Catalyst plans ``<=>`` as an
    ordinary hash/sort-merge equi-join (null-safe keys still hash), so
    the scale story is identical to ``join_inner_equi`` — no nested-loop
    fallback, no skew beyond the real key distribution."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = (orders.groupBy(F.nullif(F.col("o_orderstatus"), F.lit("P"))
                        .alias("k"))
         .agg(F.count(F.lit(1)).alias("n_orders")))
    b = (li.groupBy(F.nullif(F.col("l_linestatus"), F.lit("F")).alias("kb"))
         .agg(F.count(F.lit(1)).alias("n_lineitems")))
    return (a.join(b, F.col("k").eqNullSafe(F.col("kb")))
            .select(F.coalesce(F.col("k"), F.lit("<null>")).alias("k"),
                    "n_orders", "n_lineitems"))


@register(
    "join_dynamic_partition_pruning",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 2)} AS total_price
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY o_orderstatus
    """,
    tags=("join", "pruning", "partition"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — THE star-join feature at 100 TB: the
    fact table is laid out partitioned on the join key, the dimension
    carries a selective filter whose surviving keys are only known at
    RUNTIME, and Catalyst injects a ``dynamicpruningexpression`` into the
    fact scan's PartitionFilters — so the fact side reads ONLY the
    partitions the filtered dimension names (1 of 3 here), instead of
    scanning everything and filtering post-join. The demo materializes
    both sides to scratch parquet first (DPP triggers on real file-source
    partitions, not in-memory frames); the plan shape is pinned by
    ``tests/test_plans.py::test_dpp_prunes_fact_partitions``. Hash-checked:
    the result equals a static filter on the source table."""
    ensure_deterministic(spark)
    from project_etl_spark.io import scratch_dir
    base = scratch_dir("dpp")
    fact_dir = os.path.join(base, "fact")
    dim_dir = os.path.join(base, "dim")
    (table(spark, sf_dir, "orders")
     .write.partitionBy("o_orderstatus").parquet(fact_dir))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [("F", 1), ("O", 2), ("P", 3)], 1),
        "st string, flag int").write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("flag") == 1)
    from project_etl_spark.portable import exact_sum
    return (fact.join(dim, fact["o_orderstatus"] == dim["st"])
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 exact_sum(F.col("o_totalprice"), 2).alias("total_price")))


@register(
    "join_runtime_bloom_filter",
    oracle=f"""
        SELECT l.l_returnflag,
               COUNT(*) AS n_items,
               {sql_exact_sum('l.l_extendedprice', 2)} AS total_price
        FROM lineitem l
        JOIN (SELECT o_orderkey FROM orders WHERE o_totalprice > 4e5) o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag
    """,
    tags=("join", "bloom", "runtime-filter"),
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pushdown — the OTHER runtime row-filtering
    feature beside dynamic partition pruning: for a shuffle join whose
    build side carries a selective predicate, Catalyst plants a
    ``bloom_filter_agg`` on the build keys and a ``might_contain`` probe
    on the fact side, so most non-matching fact rows die IN THE SCAN
    STAGE instead of crossing the shuffle — at 100 TB that is the
    difference between shuffling the full fact table and shuffling the
    ~match fraction. Local fixtures sit far below the feature's
    production thresholds, so the builder scopes the enabling confs
    (thresholds to demo values, broadcast off so a shuffle join exists),
    materializes the result under them, and ASSERTS the bloom pair is in
    the executed plan — a conf-scoped, self-verifying demo like the
    drained-micro-batch guard. Hash-checked against the plain join."""
    ensure_deterministic(spark)
    import contextlib
    import io

    from project_etl_spark.io import scratch_dir
    from project_etl_spark.operators.streaming_live import _conf_override
    out_dir = os.path.join(scratch_dir("bloomjoin"), "out")
    li = table(spark, sf_dir, "lineitem")
    big = (table(spark, sf_dir, "orders")
           .where(F.col("o_totalprice") > F.lit(4e5))
           .select("o_orderkey"))
    joined = (li.join(big, li["l_orderkey"] == big["o_orderkey"])
              .groupBy("l_returnflag")
              .agg(F.count(F.lit(1)).alias("n_items"),
                   exact_sum(F.col("l_extendedprice"), 2)
                   .alias("total_price")))
    with contextlib.ExitStack() as stack:
        for k, v in (
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
            ("spark.sql.optimizer.runtime.bloomFilter"
             ".applicationSideScanSizeThreshold", "0"),
            ("spark.sql.optimizer.runtime.bloomFilter"
             ".creationSideThreshold", "100MB"),
        ):
            stack.enter_context(_conf_override(spark, k, v))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        if "bloom_filter_agg" not in plan or "might_contain" not in plan:
            raise AssertionError(
                "runtime bloom filter did not inject into the join plan — "
                "optimizer conf regression?")
        joined.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


@register(
    "join_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        b AS (
            SELECT user_id, ts, MAX_BY(event_id, event_id) AS event_id,
                   (FLOOR(MAX_BY(value, event_id) * 100.0 + 0.5) / 100.0) AS bval
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY user_id, ts
        ),
        bk AS (
            SELECT p.event_id, p.ts, b.event_id AS bid, b.bval AS bv,
                   b.ts AS bts
            FROM p ASOF LEFT JOIN b
              ON p.user_id = b.user_id AND p.ts >= b.ts
        ),
        fw AS (
            SELECT p.event_id, b.event_id AS fid, b.bval AS fv, b.ts AS fts
            FROM p ASOF LEFT JOIN b
              ON p.user_id = b.user_id AND p.ts <= b.ts
        )
        SELECT bk.event_id,
               CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                    WHEN fts IS NULL THEN bid
                    WHEN bts IS NULL THEN fid
                    WHEN CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bts)) AS BIGINT)
                         <= CAST(FLOOR(EPOCH(fts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                    THEN bid ELSE fid END AS nearest_browse_id,
               CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                    WHEN fts IS NULL THEN bv
                    WHEN bts IS NULL THEN fv
                    WHEN CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bts)) AS BIGINT)
                         <= CAST(FLOOR(EPOCH(fts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                    THEN bv ELSE fv END AS nearest_value,
               CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                    WHEN fts IS NULL THEN 'backward'
                    WHEN bts IS NULL THEN 'forward'
                    WHEN CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bts)) AS BIGINT)
                         <= CAST(FLOOR(EPOCH(fts)) AS BIGINT)
                         - CAST(FLOOR(EPOCH(bk.ts)) AS BIGINT)
                    THEN 'backward' ELSE 'forward' END AS direction
        FROM bk JOIN fw ON bk.event_id = fw.event_id
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — pandas ``merge_asof(direction="nearest")``,
    completing the as-of family: each purchase picks whichever browse
    sample (latest-before vs earliest-after) sits closer in time, ties to
    the backward side. Composes the SAME union+window helper in both
    directions (two linear one-shuffle passes) and resolves the winner
    with integer-second distance algebra — still no range join, still no
    nested loop; the equi-join gluing the two carries is keyed on the
    unique left event_id."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    browse = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("b_id"),
             pround(F.max_by("value", "event_id"), 2).alias("b_val"))
    )
    back = asof_join(
        purchases, browse, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"b_id": "bid", "b_val": "bv", "ts": "bts"},
    )
    fwd = asof_join(
        purchases, browse, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"b_id": "fid", "b_val": "fv", "ts": "fts"},
        direction="forward",
    ).select("event_id", "fid", "fv", "fts")
    j = back.join(fwd, "event_id")
    sec = lambda c: F.col(c).cast("long")  # noqa: E731
    back_wins = (sec("ts") - sec("bts")) <= (sec("fts") - sec("ts"))
    pick = lambda b, f: (  # noqa: E731
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None))
        .when(F.col("fts").isNull(), b)
        .when(F.col("bts").isNull(), f)
        .when(back_wins, b).otherwise(f))
    return j.select(
        "event_id",
        pick(F.col("bid"), F.col("fid")).alias("nearest_browse_id"),
        pick(F.col("bv"), F.col("fv")).alias("nearest_value"),
        pick(F.lit("backward"), F.lit("forward")).alias("direction"))


@register(
    "join_interval_overlap",
    oracle="""
        WITH a AS (
            SELECT event_id AS a_id, user_id,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS a_s,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) + 1800 AS a_e
            FROM events WHERE event_type = 'purchase'
        ),
        b AS (
            SELECT event_id AS b_id, user_id,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS b_s,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) + 600 AS b_e
            FROM events WHERE event_type = 'view'
        )
        SELECT a.a_id, b.b_id,
               LEAST(a.a_e, b.b_e) - GREATEST(a.a_s, b.b_s)
                   AS overlap_seconds
        FROM a JOIN b ON a.user_id = b.user_id
                     AND a.a_s <= b.b_e AND b.b_s <= a.a_e
    """,
    tags=("join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — both sides are interval SETS (30-min
    purchase windows x 10-min view windows per user) and the result is
    every overlapping pair with its overlap length: the session-overlap /
    coincidence-window generalization of ``join_range_interval`` (which
    attaches points to one interval set). Spark plans a naive overlap
    predicate as a nested loop, so the helper shape is: two intervals
    overlap only if their starts sit within lenA + lenB of each other,
    hence with bucket width >= lenA + lenB the A-side start lands within
    one bucket of the B-side start — explode A to (bucket-1, bucket,
    bucket+1), equi-join on (user, bucket) + residual predicate, distinct.
    Scales as a plain shuffled hash join, candidate-bounded per bucket;
    DuckDB's native IEJoin proves the same answer from the naive form."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    len_a, len_b = 1800, 600
    width = len_a + len_b
    a = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("a_id"), "user_id",
                 F.col("ts").cast("long").alias("a_s"))
         .withColumn("a_e", F.col("a_s") + len_a))
    b = (ev.where(F.col("event_type") == "view")
         .select(F.col("event_id").alias("b_id"), "user_id",
                 F.col("ts").cast("long").alias("b_s"))
         .withColumn("b_e", F.col("b_s") + len_b))
    a_exp = a.withColumn(
        "bucket",
        F.explode(F.array(*[F.floor(F.col("a_s") / width) + F.lit(d)
                            for d in (-1, 0, 1)])))
    b_b = b.withColumn("bucket", F.floor(F.col("b_s") / width))
    pairs = (a_exp.join(b_b, ["user_id", "bucket"])
             .where((F.col("a_s") <= F.col("b_e"))
                    & (F.col("b_s") <= F.col("a_e")))
             .select("a_id", "b_id",
                     (F.least("a_e", "b_e") - F.greatest("a_s", "b_s"))
                     .alias("overlap_seconds"))
             .distinct())
    return pairs


@register(
    "join_hint_shuffle_hash",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name,
               CAST(FLOOR(s.s_acctbal * 1e2 + 5e-1) AS BIGINT) / 1e2
                   AS acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal > 0
    """,
    tags=("join", "hint"),
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINTS as a first-class surface: the same equi-join
    Catalyst would broadcast is forced onto SHUFFLE_HASH — the control a
    user reaches for when the optimizer's size estimate is wrong (a
    too-big "small" side OOMs the broadcast; a hint is cheaper than a
    config fight). The hint changes only the physical strategy, never the
    result, which is exactly what the unchanged oracle proves; the plan
    shape (ShuffledHashJoin, no BroadcastExchange) is pinned by
    tests/test_plans.py."""
    ensure_deterministic(spark)
    s = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    n = table(spark, sf_dir, "nation")
    return (s.join(n.hint("SHUFFLE_HASH"),
                   s["s_nationkey"] == n["n_nationkey"])
            .select("s_suppkey", "s_name", "n_name",
                    pround(F.col("s_acctbal"), 2).alias("acctbal")))


@register(
    "join_asof_tolerance",
    oracle="""
        SELECT p.event_id,
               CASE WHEN epoch(p.ts) - epoch(b.ts) <= 3600
                    THEN b.event_id END AS prior_browse_id,
               CASE WHEN epoch(p.ts) - epoch(b.ts) <= 3600
                    THEN b.bval END AS prior_value,
               COALESCE(epoch(p.ts) - epoch(b.ts) <= 3600, FALSE) AS within_tol
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (
            SELECT user_id, ts, MAX_BY(event_id, event_id) AS event_id,
                   (FLOOR(MAX_BY(value, event_id) * 100.0 + 0.5) / 100.0) AS bval
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY user_id, ts
        ) b ON p.user_id = b.user_id AND p.ts >= b.ts
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a MATCH TOLERANCE (pandas ``merge_asof(tolerance=)``):
    the latest browse at-or-before each purchase counts only if it is
    within one hour — a stale environment sample must NOT be attached to a
    run (the HV reading from yesterday says nothing about this run's bias,
    DAQ_self-triggering.md:249-253). Same one-shuffle union+window helper;
    the tolerance is a row-local post-filter that NULLs the carried payload
    (not a join-condition change), so the linear as-of plan is untouched."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    browse = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("b_id"),
             pround(F.max_by("value", "event_id"), 2).alias("b_val"))
    )
    out = asof_join(
        purchases, browse.withColumnRenamed("ts", "b_ts"),
        on="user_id", left_ts="ts", right_ts="b_ts",
        right_cols={"b_id": "prior_browse_id", "b_val": "prior_value",
                    "b_ts": "matched_ts"},
    )
    within = (F.col("ts").cast("long") - F.col("matched_ts").cast("long")
              <= 3600)
    return out.select(
        "event_id",
        F.when(within, F.col("prior_browse_id")).alias("prior_browse_id"),
        F.when(within, F.col("prior_value")).alias("prior_value"),
        F.coalesce(within, F.lit(False)).alias("within_tol"))


# --------------------------------------------------------------------------
# join_geo_grid_neighbors — spatial join via grid bucketing
# --------------------------------------------------------------------------

_GEO_PTS_SQL = """
SELECT user_id,
       CAST(40 + (user_id % 5) AS DOUBLE)
           + CAST((user_id * 37) % 1000 AS DOUBLE) / 1e4 AS lat,
       CAST(-100 + (user_id % 7) AS DOUBLE)
           + CAST((user_id * 73) % 1000 AS DOUBLE) / 1e4 AS lon
FROM (SELECT DISTINCT user_id FROM events)
"""

_GEO_HAVERSINE = """
           CAST(FLOOR(12742e0 * asin(sqrt(
               pow(sin(radians(lb - la) / 2e0), 2)
               + cos(radians(la)) * cos(radians(lb))
                 * pow(sin(radians(ob - oa) / 2e0), 2))) * 1e3 + 5e-1)
               AS BIGINT) AS dist_m
"""

_GEO_ORACLE = f"""
WITH pts AS ({_GEO_PTS_SQL}),
cells AS (
    SELECT user_id, lat, lon, dy.dy,
           CAST(floor(lat / 5e-2) AS BIGINT) AS cy,
           CAST(floor(lon / 5e-2) AS BIGINT) AS cx
    FROM pts, (SELECT unnest([-1, 0, 1]) AS dy) dy
),
reg AS (
    SELECT user_id, lat, lon, cy + dy AS gy, cx + dx.dx AS gx
    FROM cells, (SELECT unnest([-1, 0, 1]) AS dx) dx
),
home AS (
    SELECT user_id, lat, lon, CAST(floor(lat / 5e-2) AS BIGINT) AS gy,
           CAST(floor(lon / 5e-2) AS BIGINT) AS gx
    FROM pts
),
cand AS (
    SELECT DISTINCT a.user_id AS ua, a.lat AS la, a.lon AS oa,
                    b.user_id AS ub, b.lat AS lb, b.lon AS ob
    FROM reg a JOIN home b ON a.gy = b.gy AND a.gx = b.gx
    WHERE a.user_id < b.user_id
),
dist AS (
    SELECT ua, ub, {_GEO_HAVERSINE}
    FROM cand
)
SELECT ua AS user_a, ub AS user_b, dist_m
FROM dist WHERE dist_m <= 3000
"""


@register("join_geo_grid_neighbors", oracle=_GEO_ORACLE,
          tags=("join", "geo"))
def join_geo_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor join via grid bucketing — the geospatial family's
    scale pattern (the geohash/S2 trick every spatial engine lowers to):
    each point registers in its 3x3 neighborhood of 0.05-degree cells, the
    candidate join is a plain EQUI-join on the cell key (never a cross
    join over coordinates), and the exact haversine runs on candidates
    only — output pairs within 3 km. Detector-geometry analog: coincidence
    matching between telescope planes by hit position
    (DAQ_self-triggering.md:72-76), generalized to great-circle distance.

    Determinism: coordinates are integer-derived doubles; haversine is a
    single fixed-order sin/cos/asin chain quantized to whole meters, so
    both the candidate set (pure integers) and the verified pairs
    hash-match. At 100 TB: cell registration is a 9x row-local explode,
    the join shuffles on cell keys with hot cells handled like any skewed
    equi-join (salting/AQE), cost bounded by true neighbor density."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("geo_events")
    return spark.sql(f"""
WITH pts AS ({_GEO_PTS_SQL.replace("FROM events", "FROM geo_events")}),
cells AS (
    SELECT user_id, lat, lon,
           explode(array(-1, 0, 1)) AS dy,
           CAST(floor(lat / 5e-2) AS BIGINT) AS cy,
           CAST(floor(lon / 5e-2) AS BIGINT) AS cx
    FROM pts
),
reg AS (
    SELECT user_id, lat, lon, cy + dy AS gy, cx + dx AS gx
    FROM (SELECT *, explode(array(-1, 0, 1)) AS dx FROM cells)
),
home AS (
    SELECT user_id, lat, lon, CAST(floor(lat / 5e-2) AS BIGINT) AS gy,
           CAST(floor(lon / 5e-2) AS BIGINT) AS gx
    FROM pts
),
cand AS (
    SELECT DISTINCT a.user_id AS ua, a.lat AS la, a.lon AS oa,
                    b.user_id AS ub, b.lat AS lb, b.lon AS ob
    FROM reg a JOIN home b ON a.gy = b.gy AND a.gx = b.gx
    WHERE a.user_id < b.user_id
),
dist AS (
    SELECT ua, ub, {_GEO_HAVERSINE}
    FROM cand
)
SELECT ua AS user_a, ub AS user_b, dist_m
FROM dist WHERE dist_m <= 3000
""")


# --------------------------------------------------------------------------
# ext_join_skew_audit — join-key frequency audit (the pre-salting report)
# --------------------------------------------------------------------------

_SKEW_AUDIT_SQL = """
WITH k AS (
    SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt
        FROM k),
banded AS (
    SELECT CASE WHEN cnt = 1 THEN '1'
                WHEN cnt <= 10 THEN '2-10'
                WHEN cnt <= 100 THEN '11-100'
                WHEN cnt <= 1000 THEN '101-1000'
                ELSE '>1000' END AS freq_band,
           cnt
    FROM k
)
SELECT b.freq_band,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(b.cnt) AS BIGINT) AS row_mass,
       CAST((2000 * SUM(b.cnt) + t.n) // (2 * t.n) AS BIGINT)
           AS mass_permille,
       CAST(t.max_cnt AS BIGINT) AS corpus_max_key,
       CAST((2000000 * t.max_cnt * t.n_keys + t.n) // (2 * t.n)
            AS BIGINT) AS skew_ratio_micro
FROM banded b, tot t
GROUP BY b.freq_band, t.n, t.max_cnt, t.n_keys
"""


@register("ext_join_skew_audit", oracle=_SKEW_AUDIT_SQL,
          tags=("ext", "join", "audit"))
def ext_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the measurement that decides between a
    plain shuffled join, AQE skew splitting, and explicit salting
    (`join_skew_salted`) BEFORE the join runs: per key-frequency band,
    how many keys and how much row mass, plus the corpus-wide skew
    ratio max_key / mean_key (micro units) — a ratio near 1 means
    uniform keys (salting is pure overhead), a ratio in the thousands
    means one reducer will receive a partition thousands of times the
    average. The same report, run on the build side, also answers "is
    this dimension broadcastable".

    Scale shape: one map-side-combinable key reduce, a 1-row stats
    re-aggregation, and a 5-band census — strictly cheaper than any
    join it de-risks (the `ext_shingle_hot_audit` discipline applied to
    relational keys)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    k = (li.groupBy(F.col("l_partkey").alias("key"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
         .localCheckpoint(eager=False))   # feeds stats + banding
    tot = k.agg(F.sum("cnt").cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("cnt").cast("long").alias("max_cnt"))
    banded = k.select(
        F.when(F.col("cnt") == 1, "1")
        .when(F.col("cnt") <= 10, "2-10")
        .when(F.col("cnt") <= 100, "11-100")
        .when(F.col("cnt") <= 1000, "101-1000")
        .otherwise(">1000").alias("freq_band"), "cnt")
    return (banded.crossJoin(F.broadcast(tot))
            .groupBy("freq_band", "n", "max_cnt", "n_keys")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys_band"),
                 F.sum("cnt").cast("long").alias("row_mass"))
            .select("freq_band",
                    F.col("n_keys_band").alias("n_keys"),
                    "row_mass",
                    F.expr("cast((2000 * row_mass + n) div (2 * n)"
                           " as bigint)").alias("mass_permille"),
                    F.col("max_cnt").cast("long").alias("corpus_max_key"),
                    F.expr("cast((2000000 * max_cnt * n_keys + n)"
                           " div (2 * n) as bigint)")
                    .alias("skew_ratio_micro")))


@register(
    "join_hint_sort_merge",
    oracle="""
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "hint"),
)
def join_hint_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE hint — completing the strategy-hint surface next to
    `join_hint_shuffle_hash`: the same equi-join forced onto
    SortMergeJoin, the strategy a user pins when BOTH sides are large
    and sorted output amortizes downstream (or when shuffle-hash would
    build an over-budget hash table per task). The hint changes the
    physical strategy, never the result — the unchanged oracle proves
    it, and tests/test_plans.py pins the SortMergeJoin (no
    BroadcastExchange/ShuffledHashJoin) shape.

    Scale shape: sort-merge is THE shuffle-robust large-large join at
    100 TB — both sides exchange on o_custkey, external-sort, and
    stream-merge with no build-side memory cliff; the per-segment
    reduce after it is map-side combinable."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)) \
        .cast("long")
    return (o.join(c.hint("MERGE"), o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 F.sum(cents).cast("long").alias("rev_cents")))
