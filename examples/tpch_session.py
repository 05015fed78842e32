#!/usr/bin/env python
"""End-to-end TPC-H-shape session on the Spark engine — all 22 classic
benchmark query shapes as one runnable script over the synthetic corpus:

    python examples/tpch_session.py [sf_dir]

Q1 is the flagship pricing-summary aggregation (the `entry()` query);
Q2-Q22 are the `composite_*` family, each executed through the
Spark-first rewrite its shape calls for — window decorrelation for the
correlated scalar subqueries (Q2/Q15/Q17/Q20), semi/anti lowering for
EXISTS/NOT IN (Q4/Q16/Q21/Q22), broadcast-pruned join trees
(Q3/Q5/Q7/Q8/Q9/Q10), one-pass conditional aggregation (Q12/Q14), the
outer-join zero-bucket histogram (Q13), pure pushdown (Q6), the
OR-of-brackets disjunction (Q19), and HAVING thresholds (Q11/Q18).
Every query is registered and hash-checked against DuckDB (one shared
implementation; see project_etl_spark/operators/composite.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_etl_spark.registry import load_all
from project_etl_spark.session import get_spark

#: shape number -> registered query (Q1 is the flagship entry() query)
SHAPES = [
    ("Q1", "agg_groupby_stats", "pricing summary (flagship entry())"),
    ("Q2", "composite_min_cost_supplier", "correlated scalar-MIN supplier"),
    ("Q3", "composite_shipping_priority", "segment top-revenue orders"),
    ("Q4", "composite_priority_checking", "EXISTS late-line order census"),
    ("Q5", "composite_local_supplier_volume", "snowflake revenue rollup"),
    ("Q6", "composite_forecast_revenue", "pure-pushdown revenue probe"),
    ("Q7", "composite_nation_volume", "bilateral nation trade volume"),
    ("Q8", "composite_market_share", "8-relation market share"),
    ("Q9", "composite_product_profit", "3-relation profit expression"),
    ("Q10", "composite_returned_item", "returned-revenue top customers"),
    ("Q11", "composite_value_concentration", "global-share HAVING"),
    ("Q12", "composite_shipmode_priority", "one-pass CASE priority split"),
    ("Q13", "composite_customer_distribution", "outer-join zero histogram"),
    ("Q14", "composite_promo_revenue", "promo revenue share"),
    ("Q15", "composite_top_supplier", "tie-correct scalar-MAX supplier"),
    ("Q16", "composite_parts_supplier_census", "NOT-IN distinct census"),
    ("Q17", "composite_small_quantity_revenue", "correlated scalar-AVG"),
    ("Q18", "composite_large_volume_customer", "HAVING volume top-k"),
    ("Q19", "composite_disjunctive_predicates", "OR-of-brackets revenue"),
    ("Q20", "composite_dominant_supplier", "half-sum dominance window"),
    ("Q21", "composite_waiting_orders", "EXISTS/NOT EXISTS sole-late"),
    ("Q22", "composite_lapsed_rich_customers", "scalar-AVG + anti join"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("tpch-session",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    print(f"(all 22 TPC-H query shapes over {sf_dir})\n")
    total = 0.0
    for shape, name, blurb in SHAPES:
        t0 = time.perf_counter()
        rows = reg[name].builder(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
        total += sec
        print(f"{shape:>4}  {name:<36} {len(rows):>6} rows"
              f"  {sec:6.2f}s  ({blurb})")
    print(f"\ntotal: {total:.2f}s for 22 shapes")


if __name__ == "__main__":
    main()
