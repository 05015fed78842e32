#!/usr/bin/env python
"""End-to-end service-analytics / SLO session on the Spark engine — the
latency-and-reliability surface as one runnable script over the
synthetic event stream:

    python examples/slo_session.py [sf_dir]

Stages: latency quantiles (the HDR-style log-bucket sketch against its
own exact twin + realized error) -> error-budget burn (multi-window
SRE alerting) -> event funnels (ordered steps, windowed conversion,
step latencies) -> session shape (sessionization, path census,
transition matrix) -> load seasonality (hour-of-week profile, seasonal
anomalies, day-over-day RSI momentum on revenue) -> drift gates
(KS / PSI / JS between timeline halves). Every stage is a registered,
hash-checked query (one shared implementation; see
project_etl_spark/operators/) — this script is the "a human would run
it" tour of the SLO family the per-query oracle suite checks one at a
time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_etl_spark.registry import load_all
from project_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("slo-session",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run(name: str, n: int = 20, **kw) -> None:
        print(f"== {name} ==")
        reg[name].builder(spark, sf_dir).show(n, **kw)

    print(f"(service-analytics / SLO session over {sf_dir})\n")

    print("-- 1. What does latency look like? sketch vs exact --")
    run("agg_hdr_latency_quantiles")
    run("ext_sketch_shard_merge_audit", 6)
    run("ext_source_length_quantiles", 10)
    run("agg_ship_latency", 5)

    print("-- 2. Are we burning error budget? --")
    run("agg_slo_burn_rate", 8)

    print("-- 3. Where do users drop off, and how fast do they move? --")
    run("agg_event_funnel")
    run("agg_funnel_windowed")
    run("agg_funnel_latency", 6)

    print("-- 4. What shape are the sessions? --")
    run("agg_sessionize_events", 6)
    run("ext_session_paths", 8)
    run("agg_event_transitions", 10)

    print("-- 5. Is the load pattern itself normal? --")
    run("agg_seasonality_profile", 8)
    run("agg_seasonal_anomaly", 6)
    run("win_rsi", 6)

    print("-- 6. Did the event mix drift between timeline halves? --")
    run("ext_drift_ks", 5, vertical=True)
    run("ext_psi_drift", 10)

    print("session complete — every stage above is hash-checked against "
          "DuckDB in tests/test_oracle.py")
    spark.stop()


if __name__ == "__main__":
    main()
