"""Round-10 operator tests: planted fixtures checked against pure-Python
textbook references for the two TPC-H-shape composites, including the
degenerate topologies the differential hash can never see (both engines
run the same SQL, so same-on-both semantic bugs need planted truth).
"""

from __future__ import annotations

import datetime

import pytest


def _drive(spark, sf_dir, fn, tables):
    """Run a composite builder against planted tables by monkeypatching
    the module-level loader (builders take (spark, sf_dir))."""
    import project_etl_spark.operators.composite as comp

    orig = comp.table
    comp.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        comp.table = orig


# ---------------------------------------------------------------------------
# composite_min_cost_supplier (Q2 shape)
# ---------------------------------------------------------------------------

def _q2_tables(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")],
        "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(10, "DE", 0), (11, "FR", 0), (12, "JP", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, "S_DE", 10, 50.0), (101, "S_FR", 11, 90.0),
         (102, "S_JP", 12, 10.0)],
        "s_suppkey int, s_name string, s_nationkey int, s_acctbal double")
    part = spark.createDataFrame(
        [(1, "Brand#1", "LARGE", 5),     # eligible, EU min unique
         (2, "Brand#2", "LARGE", 9),     # eligible, EU tie at min
         (3, "Brand#3", "LARGE", 20),    # size 20: filtered out
         (4, "Brand#4", "SMALL", 5),     # wrong type: filtered out
         (5, "Brand#5", "LARGE", 3)],    # only non-EU quotes: no row
        "p_partkey int, p_brand string, p_type string, p_size int")
    lineitem = spark.createDataFrame(
        [  # part 1: DE quotes 2.00 then 1.00 (min within pair), FR 2.00,
           # JP 0.50 — the cheaper NON-EU quote must not disqualify DE
         (1, 100, 2.00), (1, 100, 1.00), (1, 101, 2.00), (1, 102, 0.50),
           # part 2: DE and FR tie at 3.00 -> both rows survive
         (2, 100, 3.00), (2, 101, 3.00), (2, 102, 3.00),
           # parts 3/4 quoted but filtered by the part predicate
         (3, 100, 1.00), (4, 101, 1.00),
           # part 5: only JP quotes
         (5, 102, 1.00)],
        "l_partkey int, l_suppkey int, l_extendedprice double")
    return {"region": region, "nation": nation, "supplier": supplier,
            "part": part, "lineitem": lineitem}


def test_q2_planted_matches_textbook(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_min_cost_supplier)

    rows = _drive(spark, sf_dir, composite_min_cost_supplier,
                  _q2_tables(spark))
    got = {(r["p_partkey"], r["s_name"]): r["cost_cents"] for r in rows}
    # textbook: per-part min over EUROPEAN quotes only, min-per-pair first
    assert got == {(1, "S_DE"): 100,          # 1.00, not JP's 0.50
                   (2, "S_DE"): 300, (2, "S_FR"): 300}   # tie kept
    by_key = {(r["p_partkey"], r["s_name"]): r for r in rows}
    assert by_key[(1, "S_DE")]["n_name"] == "DE"
    assert by_key[(2, "S_FR")]["s_acctbal"] == 90.0


def test_q2_empty_when_no_european_supplier(spark, sf_dir):
    """Degenerate: every quote from outside the region -> empty result
    (no NULL-min rows leaking through the scalar-subquery boundary)."""
    from project_etl_spark.operators.composite import (
        composite_min_cost_supplier)

    t = _q2_tables(spark)
    t["region"] = spark.createDataFrame(
        [(1, "EUROPE")], "r_regionkey int, r_name string")  # only JP's region
    t["nation"] = spark.createDataFrame(
        [(12, "JP", 0)], "n_nationkey int, n_name string, n_regionkey int")
    assert _drive(spark, sf_dir, composite_min_cost_supplier, t) == []


# ---------------------------------------------------------------------------
# composite_waiting_orders (Q21 shape)
# ---------------------------------------------------------------------------

def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _q21_tables(spark):
    nation = spark.createDataFrame(
        [(10, "DE", 0), (11, "FR", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, "S_A", 10), (101, "S_B", 11)],
        "s_suppkey int, s_name string, s_nationkey int")
    orders = spark.createDataFrame(
        [(1, _ts("1996-01-01"), "F"),
         (2, _ts("1996-01-01"), "F"),
         (3, _ts("1996-01-01"), "F"),
         (4, _ts("1996-01-01"), "O"),   # not finished: excluded
         (5, _ts("1996-01-01"), "F")],
        "o_orderkey int, o_orderdate timestamp_ntz, o_orderstatus string")
    late = _ts("1996-06-01")      # > 60 days after orderdate
    ok = _ts("1996-01-15")
    lineitem = spark.createDataFrame(
        [  # order 1: A late, B on time -> A is the sole late shipper
         (1, 100, late), (1, 101, ok),
           # order 2: both late -> nobody counts
         (2, 100, late), (2, 101, late),
           # order 3: single-supplier order, late -> no EXISTS witness
         (3, 100, late), (3, 100, late),
           # order 4: would qualify but status 'O'
         (4, 100, late), (4, 101, ok),
           # order 5: A on time, B late TWICE -> B counts 2 lines
         (5, 100, ok), (5, 101, late), (5, 101, late)],
        "l_orderkey int, l_suppkey int, l_shipdate timestamp_ntz")
    return {"nation": nation, "supplier": supplier, "orders": orders,
            "lineitem": lineitem}


def test_q21_planted_matches_textbook(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_waiting_orders)

    rows = _drive(spark, sf_dir, composite_waiting_orders,
                  _q21_tables(spark))
    got = {r["s_name"]: (r["n_name"], r["numwait"]) for r in rows}
    # A: order 1 only (order 2 has another late supplier, order 3 has no
    # second supplier, order 4 isn't finished). B: both late lines of
    # order 5 count (COUNT(*) is over qualifying l1 LINES, per TPC-H).
    assert got == {"S_A": ("DE", 1), "S_B": ("FR", 2)}


def test_q21_all_single_supplier_orders_is_empty(spark, sf_dir):
    """Degenerate: no multi-supplier order anywhere -> the EXISTS leg
    kills every candidate, result is empty (not a NULL-count row)."""
    from project_etl_spark.operators.composite import (
        composite_waiting_orders)

    t = _q21_tables(spark)
    late = _ts("1996-06-01")
    t["lineitem"] = spark.createDataFrame(
        [(1, 100, late), (2, 101, late), (3, 100, late)],
        "l_orderkey int, l_suppkey int, l_shipdate timestamp_ntz")
    assert _drive(spark, sf_dir, composite_waiting_orders, t) == []


def test_q21_late_boundary_is_strict(spark, sf_dir):
    """Exactly 60 days is NOT late (strict >) — the boundary both
    engines must agree on, pinned here in planted data."""
    from project_etl_spark.operators.composite import (
        composite_waiting_orders)

    t = _q21_tables(spark)
    exactly_60 = _ts("1996-01-01") + datetime.timedelta(days=60)
    just_over = _ts("1996-01-01") + datetime.timedelta(days=60, seconds=1)
    t["lineitem"] = spark.createDataFrame(
        [(1, 100, just_over), (1, 101, exactly_60)],
        "l_orderkey int, l_suppkey int, l_shipdate timestamp_ntz")
    rows = _drive(spark, sf_dir, composite_waiting_orders, t)
    assert {r["s_name"]: r["numwait"] for r in rows} == {"S_A": 1}


def test_q2_q21_plan_shapes(spark, sf_dir):
    """Both composites must execute the one-fact-pass window rewrite:
    a Window over the decorrelation key, zero fact self-joins (at test
    scale AQE may broadcast the fact-fact join, so pin the absence of
    nested loops and the presence of Window + TakeOrderedAndProject)."""
    import contextlib
    import io

    from project_etl_spark.registry import load_all
    reg = load_all()
    for name in ("composite_min_cost_supplier", "composite_waiting_orders"):
        df = reg[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Window" in plan, name
        assert "TakeOrderedAndProject" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name


# ---------------------------------------------------------------------------
# composite_small_quantity_revenue (Q17 shape)
# ---------------------------------------------------------------------------

def test_q17_planted_matches_textbook(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_small_quantity_revenue)

    part = spark.createDataFrame(
        [(1, "Brand#11", "SMALL"), (2, "Brand#11", "SMALL"),
         (3, "Brand#99", "SMALL")],      # wrong brand: excluded
        "p_partkey int, p_brand string, p_type string")
    lineitem = spark.createDataFrame(
        [  # part 1: quantities 1,10,10,10 -> avg 7.75; only qty 1
           # qualifies (2 < 7.75); revenue = 5.00
         (1, 1.0, 5.00), (1, 10.0, 100.00), (1, 10.0, 100.00),
         (1, 10.0, 100.00),
           # part 2: 5,15 -> avg 10; 5*2 == 10 is NOT < 10 (strict)
         (2, 5.0, 50.00), (2, 15.0, 150.00),
           # part 3 would qualify but the brand filter drops it
         (3, 1.0, 999.00), (3, 10.0, 1.00)],
        "l_partkey int, l_quantity double, l_extendedprice double")
    rows = _drive(spark, sf_dir, composite_small_quantity_revenue,
                  {"part": part, "lineitem": lineitem})
    assert [(r["outlier_cents"], r["n_lines"]) for r in rows] == [(500, 1)]


# ---------------------------------------------------------------------------
# composite_top_supplier (Q15 shape)
# ---------------------------------------------------------------------------

def test_q15_keeps_ties_that_limit_one_would_drop(spark, sf_dir):
    from project_etl_spark.operators.composite import composite_top_supplier

    nation = spark.createDataFrame(
        [(10, "DE", 0)], "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, "S_A", 10), (101, "S_B", 10), (102, "S_C", 10)],
        "s_suppkey int, s_name string, s_nationkey int")
    inq = _ts("1996-02-01")
    out = _ts("1995-06-01")     # outside the quarter: must not count
    lineitem = spark.createDataFrame(
        [  # A and B tie at 100.00 in-quarter; C leads only if the
           # out-of-window row leaked in
         (100, inq, 100.00, 0.0), (101, inq, 50.00, 0.0),
         (101, inq, 50.00, 0.0),
         (102, inq, 10.00, 0.0), (102, out, 1000.00, 0.0)],
        "l_suppkey int, l_shipdate timestamp_ntz, "
        "l_extendedprice double, l_discount double")
    rows = _drive(spark, sf_dir, composite_top_supplier,
                  {"nation": nation, "supplier": supplier,
                   "lineitem": lineitem})
    got = {(r["s_name"], r["total_cents"]) for r in rows}
    assert got == {("S_A", 10000), ("S_B", 10000)}, (
        "the MAX-equality shape must keep BOTH tied suppliers")


# ---------------------------------------------------------------------------
# composite_lapsed_rich_customers (Q22 shape)
# ---------------------------------------------------------------------------

def test_q22_planted_matches_textbook(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_lapsed_rich_customers)

    # positive balances: 100, 200, 300 -> avg 200 (the -1000 customer
    # must NOT drag the cutoff down)
    customer = spark.createDataFrame(
        [(1, "BUILDING", 300.0),     # above avg, no recent order -> counts
         (2, "BUILDING", 300.0),     # above avg, HAS recent order -> out
         (3, "MACHINERY", 200.0),    # == avg: strict > excludes
         (4, "MACHINERY", 100.0),    # below avg
         (5, "FURNITURE", -1000.0)], # negative: excluded from avg AND result
        "c_custkey int, c_mktsegment string, c_acctbal double")
    orders = spark.createDataFrame(
        [(2, _ts("2001-01-01")),     # recent -> disqualifies customer 2
         (1, _ts("1999-01-01"))],    # old order: does NOT disqualify
        "o_custkey int, o_orderdate timestamp_ntz")
    rows = _drive(spark, sf_dir, composite_lapsed_rich_customers,
                  {"customer": customer, "orders": orders})
    got = {r["c_mktsegment"]: (r["n_cust"], r["total_bal_cents"])
           for r in rows}
    assert got == {"BUILDING": (1, 30000)}


# ---------------------------------------------------------------------------
# composite_priority_checking (Q4 shape)
# ---------------------------------------------------------------------------

def test_q4_semi_join_counts_each_order_once(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_priority_checking)

    orders = spark.createDataFrame(
        [(1, _ts("1996-02-01"), "1-URGENT"),   # 3 late lines -> counts ONCE
         (2, _ts("1996-02-01"), "1-URGENT"),   # no late line
         (3, _ts("1996-02-01"), "5-LOW"),      # 1 late line
         (4, _ts("1995-06-01"), "5-LOW")],     # late line, out of quarter
        "o_orderkey int, o_orderdate timestamp_ntz, o_orderpriority string")
    late, ok = _ts("1996-05-01"), _ts("1996-02-10")
    lineitem = spark.createDataFrame(
        [(1, late), (1, late), (1, late), (2, ok), (3, late), (4, late),
         # exactly 30 days is NOT late (strict >)
         (2, _ts("1996-02-01") + datetime.timedelta(days=30))],
        "l_orderkey int, l_shipdate timestamp_ntz")
    rows = _drive(spark, sf_dir, composite_priority_checking,
                  {"orders": orders, "lineitem": lineitem})
    got = {r["o_orderpriority"]: r["order_count"] for r in rows}
    assert got == {"1-URGENT": 1, "5-LOW": 1}


# ---------------------------------------------------------------------------
# composite_shipmode_priority (Q12 shape)
# ---------------------------------------------------------------------------

def test_q12_case_split_single_pass(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_shipmode_priority)

    orders = spark.createDataFrame(
        [(1, _ts("1996-01-01"), "1-URGENT"),
         (2, _ts("1996-01-01"), "2-HIGH"),
         (3, _ts("1996-01-01"), "5-LOW")],
        "o_orderkey int, o_orderdate timestamp_ntz, o_orderpriority string")
    late, ok = _ts("1996-06-01"), _ts("1996-01-15")
    lineitem = spark.createDataFrame(
        [(1, late, "A"), (2, late, "A"), (3, late, "A"),
         (3, late, "R"), (1, ok, "R")],       # on-time line excluded
        "l_orderkey int, l_shipdate timestamp_ntz, l_returnflag string")
    rows = _drive(spark, sf_dir, composite_shipmode_priority,
                  {"orders": orders, "lineitem": lineitem})
    got = {r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
           for r in rows}
    assert got == {"A": (2, 1), "R": (0, 1)}


# ---------------------------------------------------------------------------
# composite_customer_distribution (Q13 shape)
# ---------------------------------------------------------------------------

def test_q13_zero_bucket_survives_outer_join(spark, sf_dir):
    """The whole point of Q13's LEFT JOIN with the predicate in the
    join CONDITION: a customer with no orders, and a customer whose
    only order is urgent, must both land in the c_count=0 bucket (a
    WHERE would collapse the outer join to inner and drop them)."""
    from project_etl_spark.operators.composite import (
        composite_customer_distribution)

    customer = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "c_custkey int")
    orders = spark.createDataFrame(
        [(1, 100, "5-LOW"), (1, 101, "5-LOW"),    # cust 1: 2 counted
         (2, 102, "1-URGENT"),                    # cust 2: urgent-only -> 0
         (3, 103, "2-HIGH")],                     # cust 3: 1 counted
        "o_custkey int, o_orderkey int, o_orderpriority string")
    rows = _drive(spark, sf_dir, composite_customer_distribution,
                  {"customer": customer, "orders": orders})
    got = {r["c_count"]: r["custdist"] for r in rows}
    # cust 4 has no orders at all, cust 2 only an urgent one -> two zeros
    assert got == {0: 2, 1: 1, 2: 1}


# ---------------------------------------------------------------------------
# composite_parts_supplier_census (Q16 shape)
# ---------------------------------------------------------------------------

def test_q16_blacklist_and_distinct_pairs(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_parts_supplier_census)

    part = spark.createDataFrame(
        [(1, "Brand#11", "SMALL", 5), (2, "Brand#45", "SMALL", 5),
         (3, "Brand#11", "PROMO", 5), (4, "Brand#11", "SMALL", 15)],
        "p_partkey int, p_brand string, p_type string, p_size int")
    supplier = spark.createDataFrame(
        [(100, 50.0), (101, -1.0), (102, 10.0)],
        "s_suppkey int, s_acctbal double")
    lineitem = spark.createDataFrame(
        [  # part 1: suppliers 100 (twice -> distinct once), 101
           # (blacklisted), 102
         (1, 100), (1, 100), (1, 101), (1, 102),
           # part 2 (excluded brand) and 3 (excluded type)
         (2, 100), (3, 100),
           # part 4: size 15 -> bucket 1
         (4, 102)],
        "l_partkey int, l_suppkey int")
    rows = _drive(spark, sf_dir, composite_parts_supplier_census,
                  {"part": part, "supplier": supplier,
                   "lineitem": lineitem})
    got = {(r["p_brand"], r["size_bucket"]): r["supplier_cnt"] for r in rows}
    assert got == {("Brand#11", 0): 2,     # 100 + 102; 101 blacklisted
                   ("Brand#11", 1): 1}


# ---------------------------------------------------------------------------
# composite_dominant_supplier (Q20 shape)
# ---------------------------------------------------------------------------

def test_q20_dominance_is_strict_majority(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_dominant_supplier)

    nation = spark.createDataFrame(
        [(10, "DE", 0)], "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, "S_A", 10), (101, "S_B", 10)],
        "s_suppkey int, s_name string, s_nationkey int")
    part = spark.createDataFrame(
        [(1, "STANDARD"), (2, "STANDARD"), (3, "PROMO")],
        "p_partkey int, p_type string")
    d = _ts("1996-06-01")
    out = _ts("1997-06-01")        # outside the year window
    lineitem = spark.createDataFrame(
        [  # part 1: A ships 30 of 50 -> strict majority
         (1, 100, d, 30.0), (1, 101, d, 20.0),
           # part 2: exactly half each -> nobody dominates (strict >)
         (2, 100, d, 25.0), (2, 101, d, 25.0),
           # part 3: A dominates but PROMO type is filtered
         (3, 100, d, 99.0), (3, 101, d, 1.0),
           # out-of-window volume must not flip part 1
         (1, 101, out, 1000.0)],
        "l_partkey int, l_suppkey int, l_shipdate timestamp_ntz, "
        "l_quantity double")
    rows = _drive(spark, sf_dir, composite_dominant_supplier,
                  {"nation": nation, "supplier": supplier, "part": part,
                   "lineitem": lineitem})
    assert [(r["s_name"], r["n_dominated_parts"]) for r in rows] == \
        [("S_A", 1)]


# ---------------------------------------------------------------------------
# composite_forecast_revenue (Q6 shape)
# ---------------------------------------------------------------------------

def test_q6_boundaries_inclusive_exclusive(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_forecast_revenue)

    d = _ts("1996-06-01")
    lineitem = spark.createDataFrame(
        [  # qualifies: 100.00 * 0.05 = 5.0000
         (d, 0.05, 10.0, 100.00),
           # discount endpoints: 0.07 in, 0.04/0.08 out
         (d, 0.07, 10.0, 100.00), (d, 0.04, 10.0, 100.00),
         (d, 0.08, 10.0, 100.00),
           # quantity boundary: 24 is NOT < 24
         (d, 0.06, 24.0, 100.00), (d, 0.06, 23.0, 100.00),
           # date boundary: 1997-01-01 is out
         (_ts("1997-01-01"), 0.06, 10.0, 100.00)],
        "l_shipdate timestamp_ntz, l_discount double, l_quantity double, "
        "l_extendedprice double")
    rows = _drive(spark, sf_dir, composite_forecast_revenue,
                  {"lineitem": lineitem})
    # 5.00 + 7.00 + 6.00 in 1e-4 units
    assert [(r["revenue_e4"], r["n_lines"]) for r in rows] == [(180000, 3)]


# ---------------------------------------------------------------------------
# composite_nation_volume (Q7 shape)
# ---------------------------------------------------------------------------

def test_q7_keeps_both_directions_drops_others(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_nation_volume)

    nation = spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3)], "s_suppkey int, s_nationkey int")
    customer = spark.createDataFrame(
        [(200, 1), (201, 2), (202, 3)], "c_custkey int, c_nationkey int")
    orders = spark.createDataFrame(
        [(1, 201), (2, 200), (3, 202), (4, 200)],
        "o_orderkey int, o_custkey int")
    d96, d97 = _ts("1996-07-01"), _ts("1997-07-01")
    lineitem = spark.createDataFrame(
        [  # supp N1 -> cust N2, 1996 and 1997
         (1, 100, d96, 100.00, 0.0), (1, 100, d97, 50.00, 0.0),
           # supp N2 -> cust N1 (reverse direction)
         (2, 101, d96, 30.00, 0.0),
           # supp N1 -> cust N3: wrong pair
         (3, 100, d96, 999.00, 0.0),
           # intra-nation N1 -> N1: excluded
         (4, 100, d96, 999.00, 0.0)],
        "l_orderkey int, l_suppkey int, l_shipdate timestamp_ntz, "
        "l_extendedprice double, l_discount double")
    rows = _drive(spark, sf_dir, composite_nation_volume,
                  {"nation": nation, "supplier": supplier,
                   "customer": customer, "orders": orders,
                   "lineitem": lineitem})
    got = {(r["supp_nation"], r["cust_nation"], r["l_year"]):
           r["volume_cents"] for r in rows}
    assert got == {("NATION_1", "NATION_2", 1996): 10000,
                   ("NATION_1", "NATION_2", 1997): 5000,
                   ("NATION_2", "NATION_1", 1996): 3000}


# ---------------------------------------------------------------------------
# composite_product_profit (Q9 shape)
# ---------------------------------------------------------------------------

def test_q9_profit_expression_spans_three_relations(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_product_profit)

    nation = spark.createDataFrame(
        [(1, "DE", 0)], "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, 1)], "s_suppkey int, s_nationkey int")
    part = spark.createDataFrame(
        [(1, "red plate", 50.0), (2, "blue bolt", 50.0)],
        "p_partkey int, p_name string, p_retailprice double")
    orders = spark.createDataFrame(
        [(1, _ts("1996-03-01"))], "o_orderkey int, o_orderdate timestamp_ntz")
    lineitem = spark.createDataFrame(
        [  # profit = 200*(1-0.1) - 50*4/10 = 180 - 20 = 160.00
         (1, 1, 100, 200.00, 0.1, 4.0),
           # non-matching part name: excluded
         (1, 2, 100, 999.00, 0.0, 1.0)],
        "l_orderkey int, l_partkey int, l_suppkey int, "
        "l_extendedprice double, l_discount double, l_quantity double")
    rows = _drive(spark, sf_dir, composite_product_profit,
                  {"nation": nation, "supplier": supplier, "part": part,
                   "orders": orders, "lineitem": lineitem})
    assert [(r["n_name"], r["o_year"], r["profit_cents"]) for r in rows] \
        == [("DE", 1996, 16000)]


# ---------------------------------------------------------------------------
# composite_value_concentration (Q11 shape)
# ---------------------------------------------------------------------------

def test_q11_share_threshold_is_strict_and_regional(spark, sf_dir):
    from project_etl_spark.operators.composite import (
        composite_value_concentration)

    nation = spark.createDataFrame(
        [(1, "DE", 0), (2, "JP", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, 1), (101, 2)], "s_suppkey int, s_nationkey int")
    # regional (region 0) values: part 1 = 1.00, part 2 = 998.00,
    # part 3 = 1.00 -> total 1000.00; 0.1% threshold = 1.00 exactly:
    # parts 1/3 sit AT the threshold (strict > excludes), part 2 passes.
    # part 4's value comes only from the region-1 supplier: ignored.
    lineitem = spark.createDataFrame(
        [(1, 100, 1.00), (2, 100, 998.00), (3, 100, 1.00),
         (4, 101, 500.00)],
        "l_partkey int, l_suppkey int, l_extendedprice double")
    rows = _drive(spark, sf_dir, composite_value_concentration,
                  {"nation": nation, "supplier": supplier,
                   "lineitem": lineitem})
    assert [(r["partkey"], r["value_cents"]) for r in rows] == [(2, 99800)]


# ---------------------------------------------------------------------------
# ext_dp_histogram — release == true + Laplace(1) noise from md5 uniforms
# ---------------------------------------------------------------------------

def test_dp_histogram_matches_pure_python_mechanism(spark, sf_dir):
    import hashlib
    import math

    import project_etl_spark.operators.llm_curation as lc

    customer = spark.createDataFrame(
        [(i, "SEG_A" if i < 7 else "SEG_B") for i in range(10)],
        "c_custkey int, c_mktsegment string")
    orig = lc.table
    lc.table = lambda s, d, n: customer
    try:
        rows = {r["segment"]: r
                for r in lc.ext_dp_histogram(spark, sf_dir).collect()}
    finally:
        lc.table = orig

    def ref(segment, true_n):
        hb = int(hashlib.md5(segment.encode()).hexdigest()[:15], 16)
        u = hb / 1152921504606846976.0
        sign = 1.0 if u >= 0.5 else -1.0
        noise = -sign * math.log(max(1.0 - 2.0 * abs(u - 0.5), 1e-18))
        return (int(math.floor((true_n + noise) * 1e3 + 0.5)),
                int(math.floor(abs(noise) * 1e3 + 0.5)))

    assert rows["SEG_A"]["true_n"] == 7 and rows["SEG_B"]["true_n"] == 3
    for seg, n in (("SEG_A", 7), ("SEG_B", 3)):
        rel, nab = ref(seg, n)
        assert rows[seg]["released_milli"] == rel, seg
        assert rows[seg]["noise_abs_milli"] == nab, seg


def test_dp_histogram_noise_varies_and_is_laplace_scaled(spark, sf_dir):
    """Across the real segment cells the noise must not be constant
    (distinct md5 uniforms) and must stay within the inverse-CDF's
    practical envelope for 5 draws (|noise| < ln(2*16^15) ~ 35.6 at
    the 1e-18 guard, and typically ~1)."""
    import project_etl_spark.operators.llm_curation as lc

    rows = lc.ext_dp_histogram(spark, sf_dir).collect()
    noises = [r["noise_abs_milli"] for r in rows]
    assert len(set(noises)) > 1
    assert all(0 <= v < 36_000 for v in noises)
    signs = {r["released_milli"] - r["true_n"] * 1000 > 0 for r in rows}
    assert signs == {True, False}, "5 draws should produce both signs"


# ---------------------------------------------------------------------------
# ext_blocking_quality — hand-computed metrics incl. degenerates
# ---------------------------------------------------------------------------

def _mk_bq_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_blocking_quality_matches_hand_computation(spark, sf_dir):
    import project_etl_spark.operators.llm_dedup as ld

    # len<200 -> bucket 0 everywhere; blocks are the sources.
    # s0: 3 docs (A,A,B) -> block pairs 3; s1: 2 docs (A,C) -> 1 pair.
    # truth: text A appears 3x (2 in s0, 1 in s1) -> 3 true pairs,
    # co-blocked only the s0 pair -> completeness 1/3.
    docs = _mk_bq_docs(spark, [
        (1, "s0", "A"), (2, "s0", "A"), (3, "s0", "B"),
        (4, "s1", "A"), (5, "s1", "C")])
    orig = ld.table
    ld.table = lambda s, d, n: docs
    try:
        [r] = ld.ext_blocking_quality(spark, sf_dir).collect()
    finally:
        ld.table = orig
    assert r["n_docs"] == 5 and r["n_blocks"] == 2 and r["max_block"] == 3
    # reduction = 1 - 4/10; candidate precision = 1/4; completeness = 1/3
    assert r["reduction_micro"] == 600000
    assert r["candidate_precision_micro"] == 250000
    assert r["pairs_completeness_micro"] == 333333


def test_blocking_quality_no_duplicates_gives_null_completeness(
        spark, sf_dir):
    import project_etl_spark.operators.llm_dedup as ld

    docs = _mk_bq_docs(spark, [(1, "s0", "A"), (2, "s0", "B"),
                               (3, "s1", "C")])
    orig = ld.table
    ld.table = lambda s, d, n: docs
    try:
        [r] = ld.ext_blocking_quality(spark, sf_dir).collect()
    finally:
        ld.table = orig
    assert r["pairs_completeness_micro"] is None
    assert r["candidate_precision_micro"] == 0     # 0 co-blocked / 1 cand
    assert r["reduction_micro"] == 666667          # 1 - 1/3


# ---------------------------------------------------------------------------
# The "one fact pass" claims of the window rewrites, pinned as plan
# facts: exactly ONE physical scan of each fact relation (Spark's CTE
# re-expansion would show up here as a second Location line)
# ---------------------------------------------------------------------------

def test_composites_scan_each_fact_relation_once(spark, sf_dir):
    import contextlib
    import io

    from project_etl_spark.registry import load_all
    reg = load_all()

    def n_scans(name, rel):
        df = reg[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return sum(1 for ln in buf.getvalue().splitlines()
                   if ln.strip().startswith("Location:") and rel in ln)

    for name, rel in [
        ("composite_min_cost_supplier", "lineitem"),
        ("composite_waiting_orders", "lineitem"),
        ("composite_waiting_orders", "orders"),
        ("composite_small_quantity_revenue", "lineitem"),
        ("composite_dominant_supplier", "lineitem"),
        ("composite_top_supplier", "lineitem"),
        # 0 scans here: the part-cardinality pv reduce is eagerly
        # localCheckpoint-ed (one fact scan at build time), so the
        # final plan reads the checkpoint, not parquet
        ("composite_value_concentration", "lineitem"),
    ]:
        assert n_scans(name, rel) <= 1, (
            f"{name} scans {rel} more than once — a re-expanded "
            f"subtree (window rewrite / checkpoint regression)")
