#!/usr/bin/env python
"""Scale-validation run for the round-12 wave 5-8 additions: execute the
data-sized new queries once at sf0.1 and once at the everything-10x sf2
fixture (tools/gen_scale_fixture2.py) in the SAME warm session,
recording wall seconds and shuffle read/write bytes per query from the
UI REST API. Emits SCALE_SF3.json.

The day-table family (KPSS, Newey-West, Granger, ...) reduces 10x the
orders rows into the SAME ~2400-day table — the expected signature is
near-flat wall with ~10x scan; the spatial pair scales with distinct
users (10x cells); Chapman's two band-join+verify passes are
candidate-bounded (the LSH flagship's scaling); Brunner-Munzel /
Lilliefors ride the value-domain bound. This artifact is the evidence.

Usage: python tools/scale_run3.py [sf2_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"

#: the wave 5-8 queries whose input actually grows with the fixture
#: (pure literal-grid closes like the RBP weight join still ride the
#: shared panel, so the two retrieval metrics are included as the
#: panel-cost representatives).
NAMES = [
    # day-table family over 10x orders (reduce-then-bounded-close)
    "ext_kpss_test", "ext_newey_west_slope", "ext_granger_lag1",
    "ext_breusch_godfrey", "ext_chow_test",
    # value-grid rank family over 10x documents
    "ext_brunner_munzel", "ext_lilliefors",
    # bounded pair-grid over 10x documents
    "ext_distance_correlation", "ext_gamma_concordance",
    # spatial grid over 10x users
    "ext_spatial_autocorr", "ext_getis_ord_hotspots",
    # retrieval panel over 10x embeddings
    "ext_rbp_eval", "ext_bpref_eval",
    # two-occasion LSH capture-recapture over 10x documents
    "ext_chapman_dedup_estimate",
]


def shuffle_totals(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return r, w


def main() -> None:
    sf2_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf2"

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4052")
             .config("spark.ui.retainedStages", "20000")
             .config("spark.driver.memory", "24g")
             .appName("scale_run3").getOrCreate())
    ui = "http://localhost:4052"

    from project_etl_spark.registry import load_all
    reg = load_all()

    for w in ("agg_groupby_stats", "join_inner_equi", "win_row_number"):
        reg[w].builder(spark, SF01).collect()

    out_path = os.path.join(ROOT, "SCALE_SF3.json")
    out: dict[str, dict] = {}
    for name in NAMES:
        rec: dict[str, dict] = {}
        for tag, d in (("sf0.1", SF01), ("sf2", sf2_dir)):
            r0, w0 = shuffle_totals(ui)
            t0 = time.monotonic()
            rows = len(reg[name].builder(spark, d).collect())
            sec = round(time.monotonic() - t0, 3)
            time.sleep(0.3)
            r1, w1 = shuffle_totals(ui)
            rec[tag] = {"sec": sec, "rows": rows,
                        "shuffle_read_bytes": r1 - r0,
                        "shuffle_write_bytes": w1 - w0}
        s0, s1 = rec["sf0.1"]["sec"], rec["sf2"]["sec"]
        rec["sec_ratio"] = round(s1 / s0, 2) if s0 > 0 else None
        b0 = rec["sf0.1"]["shuffle_write_bytes"]
        b1 = rec["sf2"]["shuffle_write_bytes"]
        rec["shuffle_write_ratio"] = round(b1 / b0, 2) if b0 > 0 else None
        out[name] = rec
        print(name, rec["sec_ratio"], rec["shuffle_write_ratio"], flush=True)

    art = {"fixture": sf2_dir, "scale_factor": 10, "status": "complete",
           "note": "round-12 wave 5-8 data-sized queries at the "
                   "everything-10x fixture (same construction as "
                   "SCALE_SF2); same warm session, single run each, "
                   "local[32].",
           "queries": out}
    with open(out_path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"-> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
