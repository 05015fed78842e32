"""Composite showcase queries — multi-operator pipelines in one plan,
the shapes a reference user actually runs (filter + multi-join + aggregate +
top-k), plus the two scale techniques that don't have a single-operator row
in SURVEY §2: salting a skewed join key, and bucket-pruned co-located joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.portable import exact_sum, pround, qint, sql_exact_sum
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "composite_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 1e4 + 5e-1) AS BIGINT)) AS BIGINT) / 1e4 AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    tags=("composite", "join", "topk"),
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: segment filter -> 3-way join -> revenue per order ->
    deterministic top-10. Selective dimension filters push to the scans; the
    bounded top-k avoids a global sort."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "composite_local_supplier_volume",
    oracle="""
        SELECT n.n_name, r.r_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 1e4 + 5e-1) AS BIGINT)) AS BIGINT) / 1e4 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'P'
        GROUP BY n.n_name, r.r_name
    """,
    tags=("composite", "join"),
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped: fact joined through a snowflake of broadcast dimensions
    plus one fact-fact shuffle join, rolled up by geography."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("n_name", "r_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# Skew salting
# ---------------------------------------------------------------------------

def salted_join(fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: fact rows get a random-free deterministic
    salt (hash of a discriminating column modulo n_salts... here: a
    monotonic row-derived salt via ``pmod(hash(all columns), n)``), the dim
    side replicates n_salts times, and the join key becomes (key, salt) —
    splitting one hot key's rows across n_salts reducers.

    AQE's skew-join split handles sort-merge skew automatically; explicit
    salting remains necessary for skewed *aggregations* and for joins whose
    hot key exceeds a single split. Result set is identical to the plain
    join (verified by the oracle of ``join_skew_salted``).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts)))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = salted_fact.join(replicated_dim, [key, "__salt"], how)
    return out.drop("__salt")


@register(
    "join_skew_salted",
    oracle="""
        SELECT o.o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l.l_quantity * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) / 1e2 AS sum_qty
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join producing results identical to the plain join —
    hash-checked against the unsalted oracle, proving salting is a pure
    physical rewrite."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, o, key="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("l_quantity"), 2).alias("sum_qty"))


@register(
    "join_bucketed_colocated",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n,
               {sql_exact_sum('l.l_quantity', 2)} AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "bucketing"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written ``bucketBy(8, key)`` so
    the join needs NO shuffle of either side (bucket-to-bucket task
    pairing) — the technique that amortizes one shuffle across every future
    join on that key at 100 TB. The bucketed round-trip must not change
    the data, so the result is hash-checked against the plain join."""
    import os

    from project_etl_spark.io import scratch_dir

    ensure_deterministic(spark)
    pid = os.getpid()
    wh = scratch_dir("bucketed")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    for name, df, key in (("b_lineitem", li, "l_orderkey"),
                          ("b_orders", o, "o_orderkey")):
        path = os.path.join(wh, name)
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(8, key).sortBy(key)
         .option("path", path).saveAsTable(f"project_etl_{name}_{pid}"))
    bl = spark.table(f"project_etl_b_lineitem_{pid}")
    bo = spark.table(f"project_etl_b_orders_{pid}")
    return (bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 exact_sum(F.col("l_quantity"), 2).alias("sum_qty")))


def observed_counts(df: DataFrame, name: str = "metrics") -> DataFrame:
    """Accumulator-style metrics (`observe()`): the monotone counters /
    status registers of the reference (EVENT_CNT-as-telemetry,
    Documentation-Self-Triggering.html:135-166) ride along with the job and
    are read from the listener/observation after an action — zero extra
    passes over the data."""
    from pyspark.sql import Observation
    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return out, obs


def salted_groupby_sum(df: DataFrame, key: str, value_cents,
                       n_salts: int = 16) -> DataFrame:
    """Skew-resistant aggregation: phase 1 aggregates on (key, salt) —
    splitting a hot key across n_salts reducers — phase 2 merges the
    partials per key. Identical results to a direct groupBy (integer cents
    make the merge exact); the shape that survives a key receiving half the
    dataset, where a single reducer would spill or die."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)))
    phase1 = (salted.groupBy(key, "__salt")
              .agg(F.sum(value_cents).alias("__part_sum"),
                   F.count(F.lit(1)).alias("__part_n")))
    return (phase1.groupBy(key)
            .agg(F.sum("__part_sum").alias("sum_cents"),
                 F.sum("__part_n").alias("n")))


@register(
    "agg_skew_salted_twophase",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) / 1e2 AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def agg_skew_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a deliberately low-cardinality key
    (3 values over the whole fact table — the worst skew shape), hash-checked
    identical to the direct groupBy oracle."""
    from project_etl_spark.portable import qint
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    out = salted_groupby_sum(
        li.withColumn("__c", qint(F.col("l_extendedprice"), 2)).drop("l_extendedprice"),
        key="l_returnflag", value_cents=F.col("__c"))
    return out.select("l_returnflag",
                      (F.col("sum_cents") / F.lit(100.0)).alias("sum_price"),
                      "n")


@register(
    "composite_large_volume_customer",
    oracle="""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING CAST(SUM(l_quantity) AS BIGINT) > 250
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(FLOOR(o.o_totalprice * 1e2 + 5e-1) AS BIGINT) / 1e2
                   AS totalprice,
               CAST(s.sum_qty AS BIGINT) AS sum_qty
        FROM orders o
        JOIN (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey) s
          ON o.o_orderkey = s.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("composite", "having", "topk"),
)
def composite_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: aggregate-then-filter (HAVING sum(qty) > threshold) ->
    semi-join the qualifying keys back against the fact -> enrich with the
    customer dimension -> deterministic top-20. The HAVING set is small by
    construction (heavy-volume orders), so it broadcasts into the semi
    join; the per-order quantity sums are map-side-combinable partials and
    the bounded top-k compiles to TakeOrderedAndProject, never a global
    sort."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    sums = (li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty")))
    big = sums.where(F.col("sum_qty") > 250).select("l_orderkey")
    return (o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"],
                   "left_semi")
            .join(sums, o["o_orderkey"] == sums["l_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"),
                    (F.floor(F.col("o_totalprice") * 1e2 + 5e-1)
                     .cast("bigint") / F.lit(1e2)).alias("totalprice"),
                    "sum_qty", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(20)
            .drop("o_totalprice"))


_Q10_ORACLE = f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_exact_sum('l.l_extendedprice * (1e0 - l.l_discount)', 2)}
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@register("composite_returned_item", oracle=_Q10_ORACLE,
          tags=("composite", "tpch"))
def composite_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: which customers returned the most revenue in a quarter
    — date-windowed fact filter -> 3-way join (customer broadcast-joined
    to its nation) -> per-customer revenue -> top 20 with a total-order
    tie-break. The returns triage report of the operations family (the
    lost-events per-run triage, DAQ_self-triggering.md:235-236,
    generalized). Revenue is the quantized exact sum; the LIMIT compiles
    to TakeOrderedAndProject, never a global sort."""
    ensure_deterministic(spark)
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    na = table(spark, sf_dir, "nation")
    rev = exact_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 2)
    return (li.where(F.col("l_returnflag") == "R")
            .join(od.where((F.col("o_orderdate") >= "1996-01-01")
                           & (F.col("o_orderdate") < "1996-04-01")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cu, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(na),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(rev.alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey").limit(20))


_Q14_ORACLE = """
    SELECT (FLOOR((1e2 * promo / total) * 1e6 + 5e-1) / 1e6)
               AS promo_revenue_pct
    FROM (
        SELECT
            CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN
                CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount) * 1e2
                           + 5e-1) AS BIGINT) ELSE 0 END) AS BIGINT) / 1e2
                AS promo,
            CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount) * 1e2
                          + 5e-1) AS BIGINT)) AS BIGINT) / 1e2 AS total
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-02-01'
    )
"""


@register("composite_promo_revenue", oracle=_Q14_ORACLE,
          tags=("composite", "tpch"))
def composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: promotion revenue share in a month — conditional
    aggregation OVER a join (the numerator is a CASE inside the same
    sum pass, never a second scan), part dimension broadcast. The
    month-window filter pushes to the fact scan. Both sums are quantized
    int64 (order-independent), and the final percentage is one fixed-order
    IEEE expression — the efficiency-ratio census of the trigger tables
    (fired/injected, Documentation-Self-Triggering.html:194-239) in
    revenue form."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    cents = qint(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 2)
    j = (li.where((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-02-01"))
         .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey")))
    agg = j.agg(
        (F.sum(F.when(F.col("p_type").startswith("PROMO"), cents)
               .otherwise(F.lit(0))) / F.lit(100.0)).alias("promo"),
        (F.sum(cents) / F.lit(100.0)).alias("total"))
    return agg.select(
        pround(F.lit(100.0) * F.col("promo") / F.col("total"), 6)
        .alias("promo_revenue_pct"))


# --------------------------------------------------------------------------
# composite_disjunctive_predicates — the Q19-shaped OR-of-ANDs revenue query
# --------------------------------------------------------------------------

_Q19_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount)
                               * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("composite_disjunctive_predicates", oracle=_Q19_ORACLE,
          tags=("composite", "tpch"))
def composite_disjunctive_predicates(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The TPC-H Q19 shape (discounted-revenue under an OR of
    bracket-AND predicates spanning BOTH join sides) — the classic
    optimizer stress for disjunctive pushdown: Catalyst factors the
    common conjuncts per side out of the OR, so the part scan keeps a
    brand IN-list + size range and the lineitem scan keeps the quantity
    envelope BEFORE the join, with the full disjunction evaluated as the
    join residual. Declared as one declarative filter — no manual
    union-of-three-queries rewrite, which at 100 TB would scan the fact
    table three times for what one pass answers."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(1, 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)))
    cents = F.sum(
        F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                * F.lit(1e2) + F.lit(0.5)).cast("long")).cast("long")
    return (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .where(cond)
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 cents.alias("revenue_cents")))


# --------------------------------------------------------------------------
# composite_market_share — the Q8-shaped national-market-share query
# --------------------------------------------------------------------------

_Q8_ORACLE = """
    WITH flat AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               sn.n_name AS supp_nation,
               CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount) * 1e2
                          + 5e-1) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    g AS (
        SELECT o_year, supp_nation,
               CAST(SUM(cents) AS BIGINT) AS nation_cents
        FROM flat GROUP BY o_year, supp_nation
    )
    SELECT o_year, supp_nation, nation_cents,
           CAST(FLOOR(nation_cents * 1e6
                      / SUM(nation_cents) OVER (PARTITION BY o_year)
                      + 5e-1) AS BIGINT) AS mkt_share_micro
    FROM g
"""


@register("composite_market_share", oracle=_Q8_ORACLE,
          tags=("composite", "tpch"))
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped national market share: every supplier nation's share of
    PROMO-part revenue sold into the ASIA market, per order year — the
    engine's deepest join tree (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈
    nation ⋈ customer ⋈ nation ⋈ region: 8 relations, the nation
    dimension twice under different roles) and therefore the join-
    REORDERING showpiece: declared in selectivity-agnostic order, the
    planner broadcasts all five dimension tables, pushes the region/
    type/date predicates to their scans, and keys the only real
    shuffles on the two fact joins (lineitem-orders, orders-customer).
    Exactly the plan a hand-scheduled engine has to hard-code per
    query, derived here by Catalyst from the declarative form.

    Determinism: revenue quantizes to exact cents per line before any
    sum; the share close is one fixed-order division per (year,
    nation) over the year's exact total (the window runs over the
    years x nations result grid, not the corpus).

    Scale shape at 100 TB: dimensions broadcast (region/nation always;
    part/supplier/customer degrade to shuffle joins past the
    threshold — AQE decides from runtime sizes); the fact-fact join is
    the one unavoidable big exchange, co-keyed on orderkey. No
    correlated subqueries, no row explosion beyond the join tree."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    r = table(spark, sf_dir, "region")
    cents = qint(F.col("l_extendedprice") * (F.lit(1.0)
                                             - F.col("l_discount")), 2)
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    flat = (
        li.join(o.where((F.col("o_orderdate") >= "1995-01-01")
                        & (F.col("o_orderdate") < "1997-01-01")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p.where(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              F.col("cn_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                "supp_nation", cents.alias("cents")))
    g = (flat.groupBy("o_year", "supp_nation")
         .agg(F.sum("cents").cast("long").alias("nation_cents")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("o_year")
    return g.select(
        "o_year", "supp_nation", "nation_cents",
        F.floor(F.col("nation_cents") * F.lit(1e6)
                / F.sum("nation_cents").over(w) + F.lit(0.5))
        .cast("long").alias("mkt_share_micro"))


# --------------------------------------------------------------------------
# composite_min_cost_supplier — the Q2-shaped correlated scalar-min query
# --------------------------------------------------------------------------

_Q2_ORACLE = """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                   AS cost_cents
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           ps.cost_cents
    FROM part p
    JOIN ps ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.cost_cents = (
          SELECT MIN(ps2.cost_cents)
          FROM ps ps2
          JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE r2.r_name = 'EUROPE' AND ps2.l_partkey = p.p_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 20
"""


@register("composite_min_cost_supplier", oracle=_Q2_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_min_cost_supplier(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q2-shaped minimum-cost-supplier: for every small LARGE-type part,
    the European supplier(s) offering it at the per-(part, supplier)
    minimum observed price — the classic correlated-scalar-MIN-subquery
    showpiece, and the decorrelation showcase: the oracle states the
    correlated form ("cost equals the minimum cost any European supplier
    quotes for THIS part"); this plan executes the WINDOW rewrite that
    strictly dominates both the naive per-row rescan and the
    aggregate-plus-self-join decorrelation: after the one fact-scale
    groupBy builds the (part, supplier) -> min-cents relation, the
    per-part scalar minimum is MIN() OVER (PARTITION BY partkey) on the
    Europe-filtered rows — the subtree is consumed once, so Spark's
    CTE re-expansion never re-runs the fact aggregation (the
    self-join form scans the fact table twice; this form scans it
    once).

    Scale shape at 100 TB: the only fact-scale work is the one
    groupBy(partkey, suppkey) MIN — map-side-combinable, shuffled once
    on its own key; the window re-shuffles only the (part,
    supplier)-cardinality survivors on partkey. supplier/nation/region
    broadcast; the bounded top-20 compiles to TakeOrderedAndProject,
    never a global sort. Costs quantize to exact integer cents BEFORE
    the MIN, so the scalar subquery boundary is int64-exact on both
    engines."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.min(qint(F.col("l_extendedprice"), 2)).alias("cost_cents")))
    eu = (ps.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    w = Window.partitionBy("l_partkey")
    return (eu.withColumn("min_cents", F.min("cost_cents").over(w))
            .where(F.col("cost_cents") == F.col("min_cents"))
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                    "cost_cents")
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(20))


# --------------------------------------------------------------------------
# composite_waiting_orders — the Q21-shaped chained EXISTS/NOT EXISTS query
# --------------------------------------------------------------------------

_Q21_ORACLE = """
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, n.n_name, COUNT(*) AS numwait
    FROM lo l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late = 1)
    GROUP BY s.s_name, n.n_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
"""


@register("composite_waiting_orders", oracle=_Q21_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped waiting-orders census: suppliers whose line was the
    SOLE late shipment (> 60 days after order date) in a finished
    multi-supplier order — the chained EXISTS / NOT EXISTS benchmark
    shape, TPC-H's most expensive query when executed literally
    (two correlated self-joins of the fact table).

    The oracle states the literal EXISTS/NOT EXISTS semantics. This
    plan executes the one-pass decorrelation instead of the
    semi-join + anti-join pair: per-order profiles computed as window
    functions over orderkey — (distinct suppliers, distinct LATE
    suppliers) via collect_set() OVER (PARTITION BY l_orderkey) — and
    for a late line l1 the two correlated predicates collapse exactly
    to
      EXISTS other-supplier line      <=>  n_supps >= 2
      NOT EXISTS other late supplier  <=>  n_late_supps == 1
    (l1's own supplier is late, so it accounts for the 1). That turns
    Q21's three passes over the fact table into ONE: the lineitem-
    orders join shuffles on l_orderkey and the window rides the same
    partitioning — no self-join, no re-expanded second scan (the
    groupBy-then-rejoin decorrelation would re-derive the fact join
    under Spark's CTE re-expansion). The collect_set state per order
    is bounded by suppliers-per-order, not order size.
    supplier/nation broadcast; the bounded top-20 compiles to
    TakeOrderedAndProject. All predicates are integer/date algebra —
    no floats anywhere."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    lo = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  F.when(F.col("l_shipdate")
                         > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                         1).otherwise(0).alias("is_late")))
    w = Window.partitionBy("l_orderkey")
    profiled = lo.select(
        "l_orderkey", "l_suppkey", "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
        F.size(F.collect_set(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))).over(w))
        .alias("n_late_supps"))
    return (profiled.where(F.col("is_late") == 1)
            .where((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_name", "n_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))


# --------------------------------------------------------------------------
# composite_small_quantity_revenue — the Q17-shaped correlated-AVG query
# --------------------------------------------------------------------------

_Q17_ORACLE = """
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS outlier_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#11' AND p.p_type = 'SMALL'
      AND l.l_quantity * 2e0 < (
          SELECT AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
"""


@register("composite_small_quantity_revenue", oracle=_Q17_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_small_quantity_revenue(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Q17-shaped small-quantity-outlier revenue: total revenue of
    lineitems whose quantity is under half the part's average quantity,
    for one brand/type slice — the correlated scalar-AVG subquery
    benchmark (TPC-H Q17's '20% of average quantity' probe).

    The oracle states the correlated form; this plan decorrelates to a
    window: join the fact to the broadcast part slice FIRST (every
    lineitem of a qualifying part survives, which is exactly the
    subquery's domain since it correlates only on partkey), then
    AVG(quantity) OVER (PARTITION BY partkey) and a row-local
    comparison — one fact pass, no per-part rescan, no self-join.
    Determinism: quantities are integral doubles (1..50), so partial
    sums are exact in IEEE and AVG is sum/count with one division —
    identical on both engines regardless of partitioning; revenue
    quantizes to exact cents before the SUM.

    Scale shape at 100 TB: the brand/type predicate broadcasts a tiny
    part slice into the fact scan (runtime row-group pruning via the
    join filter); the window shuffles only the qualifying parts'
    lineitems on partkey. Output is a single audit row."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL"))
    w = Window.partitionBy("l_partkey")
    joined = (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
              .withColumn("avg_qty", F.avg("l_quantity").over(w)))
    return (joined.where(F.col("l_quantity") * F.lit(2.0) < F.col("avg_qty"))
            .agg(F.sum(qint(F.col("l_extendedprice"), 2)).cast("long")
                 .alias("outlier_cents"),
                 F.count(F.lit(1)).alias("n_lines")))


# --------------------------------------------------------------------------
# composite_top_supplier — the Q15-shaped max-over-aggregate query
# --------------------------------------------------------------------------

_Q15_ORACLE = """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1e0 - l_discount)
                                   * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name, r.total_cents
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
"""


@register("composite_top_supplier", oracle=_Q15_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped top supplier: the supplier(s) with the maximum
    quarterly revenue — TPC-H's view-plus-scalar-MAX shape, and the
    tie-correct alternative to ORDER BY/LIMIT 1 (a LIMIT drops ties;
    the MAX equality keeps them, which is why Q15 is specified this
    way). Oracle states the scalar subquery; the plan computes the
    per-supplier revenue once and takes MAX() OVER () on the
    supplier-cardinality result — the bounded global window that
    replaces a second aggregation pass and a rejoin.

    Scale shape at 100 TB: one date-pruned fact scan into a map-side-
    combinable groupBy(suppkey); everything after is dimension-sized
    (the global window runs over the supplier-cardinality revenue
    table, never the fact). Exact integer cents end to end."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = (li.where((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(qint(F.col("l_extendedprice")
                           * (F.lit(1.0) - F.col("l_discount")), 2))
                .cast("long").alias("total_cents")))
    w = Window.partitionBy()
    return (rev.withColumn("max_cents", F.max("total_cents").over(w))
            .where(F.col("total_cents") == F.col("max_cents"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name", "total_cents"))


# --------------------------------------------------------------------------
# composite_lapsed_rich_customers — the Q22-shaped anti-join census
# --------------------------------------------------------------------------

_Q22_ORACLE = """
    WITH cutoff AS (
        SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0e0
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS total_bal_cents
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_mktsegment
"""


@register("composite_lapsed_rich_customers", oracle=_Q22_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_lapsed_rich_customers(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Q22-shaped lapsed-rich census: per market segment, customers
    whose balance beats the positive-balance average but who placed no
    RECENT order — TPC-H's global-customers shape: an uncorrelated
    scalar-AVG subquery feeding a filter plus a NOT EXISTS anti join.

    Plan: the cutoff is a 1-row aggregate broadcast across the
    customer scan (the bounded scalar cross the _BOUNDED_NLJ_OK policy
    exists for); NOT EXISTS lowers to LEFT ANTI against the date-
    pruned orders projection (the recency predicate pushes to the
    orders scan, so the anti build side is the recent slice, not
    history). Dimension-sized aggregation output (5 segments).

    Determinism: the AVG divides an exact integral-cents-scale sum?
    No — acctbals carry cents, so the mean is computed from the exact
    cents sum divided once (same spelled arithmetic both engines via
    plain AVG over identical doubles: every acctbal is an exact
     2-decimal double and their sum stays below 2^53 cents at any
    conceivable customer count, so partial-sum order cannot change
    the IEEE value)."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-06-01").select("o_custkey")
    cutoff = (c.where(F.col("c_acctbal") > 0.0)
              .agg(F.avg("c_acctbal").alias("avg_bal")))
    return (c.crossJoin(F.broadcast(cutoff))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_cust"),
                 F.sum(qint(F.col("c_acctbal"), 2)).cast("long")
                 .alias("total_bal_cents")))


# --------------------------------------------------------------------------
# composite_priority_checking — the Q4-shaped EXISTS semi-join census
# --------------------------------------------------------------------------

_Q4_ORACLE = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
"""


@register("composite_priority_checking", oracle=_Q4_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped priority checking: per order priority, how many orders
    of a quarter had at least one line shipped more than 30 days after
    the order date — the correlated-EXISTS census shape. EXISTS lowers
    to LEFT SEMI on orderkey with the cross-table date comparison as
    the join residual (one witness suffices, so the semi join never
    multiplies fact rows — the exact reason Q4 is specified with
    EXISTS rather than a join + DISTINCT).

    Scale shape at 100 TB: the quarter predicate prunes the orders
    scan; the semi join shuffles both sides on orderkey once;
    aggregation output is 5 rows. No DISTINCT, no row explosion."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (o.join(li,
                   (F.col("o_orderkey") == F.col("l_orderkey"))
                   & (F.col("l_shipdate")
                      > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


# --------------------------------------------------------------------------
# composite_shipmode_priority — the Q12-shaped conditional-count census
# --------------------------------------------------------------------------

_Q12_ORACLE = """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT',
                                                        '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
"""


@register("composite_shipmode_priority", oracle=_Q12_ORACLE,
          tags=("composite", "tpch"))
def composite_shipmode_priority(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q12-shaped late-shipment priority split: among lines shipped
    more than 60 days after their order, how many belong to
    urgent/high-priority orders vs the rest, per return flag — the
    pivoted conditional-count shape (both CASE branches ride ONE
    aggregation pass; the naive two-query alternative scans the join
    twice). The late-shipment predicate is a cross-table comparison,
    so it evaluates as the join residual; everything else is
    map-side-combinable integer counting into a 3-row result."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("long")
                 .alias("low_line_count")))


# --------------------------------------------------------------------------
# composite_customer_distribution — the Q13-shaped outer-join histogram
# --------------------------------------------------------------------------

_Q13_ORACLE = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    LIMIT 15
"""


@register("composite_customer_distribution", oracle=_Q13_ORACLE,
          tags=("composite", "tpch"))
def composite_customer_distribution(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Q13-shaped customer order-count distribution: how many customers
    placed 0, 1, 2, ... non-urgent orders — the LEFT OUTER JOIN shape
    whose entire point is the zero bucket (an inner join silently drops
    never-ordered customers; the filter must live in the JOIN CONDITION,
    not a WHERE, or the outer join collapses to inner). COUNT(o_orderkey)
    counts only matched rows, so unmatched customers land in c_count=0.

    Scale shape at 100 TB: one outer-join shuffle on custkey with the
    priority predicate pushed to the orders scan, a per-customer count
    (map-side combinable), then a count-of-counts over the tiny
    distinct-count domain. Top-15 compiles to TakeOrderedAndProject."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                              "o_orderpriority")
    per_cust = (c.join(o, (F.col("c_custkey") == F.col("o_custkey"))
                       & (F.col("o_orderpriority") != "1-URGENT"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
            .limit(15))


# --------------------------------------------------------------------------
# composite_parts_supplier_census — the Q16-shaped NOT-IN distinct census
# --------------------------------------------------------------------------

_Q16_ORACLE = """
    WITH psup AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, CAST(FLOOR(p.p_size / 1e1) AS BIGINT) AS size_bucket,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM psup ps JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0e0)
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p.p_brand, size_bucket
    LIMIT 20
"""


@register("composite_parts_supplier_census", oracle=_Q16_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_parts_supplier_census(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Q16-shaped parts/supplier relationship census: distinct supplier
    count per (brand, size bucket) for non-excluded parts, skipping
    blacklisted suppliers — the NOT IN + COUNT(DISTINCT) shape. The
    supplier-part relation is derived once as a DISTINCT over the fact
    table (the partsupp analog); NOT IN lowers to LEFT ANTI against the
    broadcast blacklist (safe here because s_suppkey is non-nullable —
    the NOT IN NULL trap does not arise, and the planted test pins the
    exclusion semantics).

    Scale shape at 100 TB: the DISTINCT pair reduce is the only
    fact-scale exchange (map-side combinable); part broadcast, the
    blacklist broadcast-anti, and the distinct-count aggregation runs
    over the pair relation, not the fact. Top-20 via
    TakeOrderedAndProject with a unique total order."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO"))
    bad = table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0).select("s_suppkey")
    pairs = li.distinct()
    return (pairs.join(F.broadcast(p),
                       F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(bad),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand",
                     F.floor(F.col("p_size") / F.lit(10.0)).cast("long")
                     .alias("size_bucket"))
            .agg(F.countDistinct("l_suppkey").cast("long")
                 .alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_bucket")
            .limit(20))


# --------------------------------------------------------------------------
# composite_dominant_supplier — the Q20-shaped nested-IN threshold query
# --------------------------------------------------------------------------

_Q20_ORACLE = """
    WITH vol AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    )
    SELECT s.s_name, n.n_name, CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM vol v
    JOIN part p ON v.l_partkey = p.p_partkey
    JOIN supplier s ON v.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'STANDARD'
      AND v.supp_qty * 2 > (SELECT CAST(SUM(v2.supp_qty) AS BIGINT)
                            FROM vol v2
                            WHERE v2.l_partkey = v.l_partkey)
    GROUP BY 1, 2
    ORDER BY n_dominated_parts DESC, s.s_name
    LIMIT 20
"""


@register("composite_dominant_supplier", oracle=_Q20_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_dominant_supplier(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Q20-shaped dominant-supplier audit: suppliers who shipped MORE
    THAN HALF of a STANDARD part's total yearly volume, counted per
    supplier — TPC-H Q20's correlated half-sum threshold (availqty >
    0.5 * sum(qty)) re-expressed over the fact-derived volume relation.
    The correlated scalar SUM decorrelates to SUM() OVER (PARTITION BY
    partkey) on the (part, supplier) volume table — the same
    window-over-aggregate pattern as the Q2/Q17 composites, one fact
    pass total. The part-type filter commutes with the window because
    part type is functionally dependent on partkey (every row of a
    partkey shares it), so the broadcast join runs BEFORE the window
    and the window input is already the pruned relation.

    Determinism: quantities are integral, so supp_qty and the per-part
    total are exact int64; the dominance predicate is pure integer
    algebra (supp_qty * 2 > total — no 0.5 float anywhere)."""
    from pyspark.sql.window import Window

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    vol = (li.where((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1997-01-01"))
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                .alias("supp_qty")))
    w = Window.partitionBy("l_partkey")
    return (vol.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .withColumn("part_total", F.sum("supp_qty").over(w))
            .where(F.col("supp_qty") * 2 > F.col("part_total"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_name", "n_name")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dominated_parts"))
            .orderBy(F.col("n_dominated_parts").desc(), "s_name")
            .limit(20))


# --------------------------------------------------------------------------
# composite_forecast_revenue — the Q6-shaped pushdown-only revenue probe
# --------------------------------------------------------------------------

_Q6_ORACLE = """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1e4 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS revenue_e4,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05e0 AND l_discount <= 0.07e0
      AND l_quantity < 24e0
"""


@register("composite_forecast_revenue", oracle=_Q6_ORACLE,
          tags=("composite", "tpch"))
def composite_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped forecast-revenue probe: the would-be revenue increase
    from eliminating small-quantity discounts in a year — TPC-H's pure
    filter-and-sum query, and therefore the PUSHDOWN benchmark: no
    join, no window, nothing between three range predicates and one
    map-side-combinable sum, so the entire query's cost is how much of
    the scan the engine avoids. All three predicates reach the parquet
    reader as PushedFilters (date + two numeric ranges -> row-group
    statistics pruning); the revenue sum quantizes to 1e-4 units
    per row first, so the single-row answer is int64-exact."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01")
                     & (F.col("l_discount") >= 0.05)
                     & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24.0))
            .agg(F.sum(qint(F.col("l_extendedprice") * F.col("l_discount"),
                            4)).cast("long").alias("revenue_e4"),
                 F.count(F.lit(1)).alias("n_lines")))


# --------------------------------------------------------------------------
# composite_nation_volume — the Q7-shaped bidirectional trade query
# --------------------------------------------------------------------------

_Q7_ORACLE = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1e0 - l.l_discount)
                               * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
               AS volume_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
"""


@register("composite_nation_volume", oracle=_Q7_ORACLE,
          tags=("composite", "tpch"))
def composite_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped bilateral trade volume: shipping volume between two
    named nations in BOTH directions, per shipment year — the shape
    whose disjunctive cross-side predicate (the (A,B)-or-(B,A) pair
    condition spans the supplier and customer legs) cannot be pushed to
    either scan whole, but its per-side implications CAN: each nation
    dimension is pre-filtered to the two named nations before
    broadcasting, so the join residual only resolves the pairing. The
    nation dimension appears twice under different roles (the Q8
    two-role pattern); the two fact-side joins (lineitem-orders,
    orders-customer) are the only real exchanges.

    Determinism: exact-cents quantization per line; the year key via
    EXTRACT on both engines over identical timestamps."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    sn = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    cn = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"))
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
            .where(((F.col("supp_nation") == pair[0])
                    & (F.col("cust_nation") == pair[1]))
                   | ((F.col("supp_nation") == pair[1])
                      & (F.col("cust_nation") == pair[0])))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.sum(qint(F.col("l_extendedprice")
                            * (F.lit(1.0) - F.col("l_discount")), 2))
                 .cast("long").alias("volume_cents")))


# --------------------------------------------------------------------------
# composite_product_profit — the Q9-shaped profit-by-nation-year query
# --------------------------------------------------------------------------

_Q9_ORACLE = """
    SELECT n.n_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1e0 - l.l_discount)
                      - p.p_retailprice * l.l_quantity / 1e1) * 1e2
                      + 5e-1) AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
"""


@register("composite_product_profit", oracle=_Q9_ORACLE,
          tags=("composite", "tpch"))
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped product-type profit: net profit (discounted revenue
    minus a retail-price-derived unit cost) per supplier nation and
    order year, for parts matching a name pattern — the profit-
    expression shape whose arithmetic SPANS THREE relations (lineitem
    price/discount/quantity, part cost, orders date), forcing the
    expression to evaluate post-join while the name LIKE still pushes
    into the part scan and prunes the broadcast build side.

    Determinism: the per-line profit expression is one fixed-order
    IEEE chain quantized to cents BEFORE the sum (the subtraction must
    quantize as a unit — quantizing revenue and cost separately would
    double the rounding error and diverge from the oracle's algebra).

    Scale shape at 100 TB: name-pruned part broadcast; supplier/nation
    broadcast; the lineitem-orders join is the one real exchange;
    output is nations x years."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") / F.lit(10.0))
    return (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("n_name",
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(qint(profit, 2)).cast("long").alias("profit_cents")))


# --------------------------------------------------------------------------
# composite_value_concentration — the Q11-shaped global-share HAVING query
# --------------------------------------------------------------------------

_Q11_ORACLE = """
    WITH pv AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 1e2 + 5e-1)
                             AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 0
        GROUP BY 1
    )
    SELECT p.l_partkey AS partkey, p.value_cents
    FROM pv p, (SELECT CAST(SUM(value_cents) AS BIGINT) AS total FROM pv) t
    WHERE CAST(p.value_cents AS DECIMAL(38,0)) * 1000
          > CAST(t.total AS DECIMAL(38,0))
    ORDER BY p.value_cents DESC, partkey
    LIMIT 25
"""


@register("composite_value_concentration", oracle=_Q11_ORACLE,
          tags=("composite", "tpch", "subquery"))
def composite_value_concentration(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Q11-shaped value concentration: parts holding more than 0.1% of
    one region's total shipped value — TPC-H's HAVING-against-a-global-
    fraction shape (sum(value) > fraction * sum-over-everything). The
    global total is a 1-row aggregate broadcast across the per-part
    value relation (the allowlisted bounded scalar cross) — NOT a
    global window, which would drag the full part cardinality through
    a single partition at 100 TB; the fraction compare is exact
    integer algebra (value * 1000 > total, no float share) computed in
    DECIMAL(38,0): a 100 TB corpus totals ~1.5e17 cents, and a
    degenerate concentration puts value near total, so value*1000 can
    exceed int64 — where DuckDB errors and Spark silently wraps (the
    round-8 headroom audit divergence class). DECIMAL keeps the
    product exact to 1e38 on both engines.

    Scale shape: one region-pruned fact groupBy(partkey) —
    map-side-combinable — then part-cardinality work only; top-25 via
    TakeOrderedAndProject with a unique total order."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    pv = (li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .groupBy("l_partkey")
          .agg(F.sum(qint(F.col("l_extendedprice"), 2)).cast("long")
               .alias("value_cents"))
          # pv feeds BOTH the total and the main branch: checkpoint the
          # part-cardinality reduce so the total does not re-derive the
          # fact scan (plan pinned to ONE lineitem scan in tests)
          .localCheckpoint(eager=True))
    total = pv.agg(F.sum("value_cents").cast("long").alias("total"))
    return (pv.crossJoin(F.broadcast(total))
            .where(F.col("value_cents").cast("decimal(38,0)") * 1000
                   > F.col("total").cast("decimal(38,0)"))
            .select(F.col("l_partkey").alias("partkey"), "value_cents")
            .orderBy(F.col("value_cents").desc(), "partkey")
            .limit(25))
