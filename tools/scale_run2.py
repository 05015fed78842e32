#!/usr/bin/env python
"""Relational scale-validation run (VERDICT r11 task 3): execute the
TPC-H-shape composite family and the heaviest relational aggs once at
sf0.1 and once at the everything-10x sf2 fixture
(tools/gen_scale_fixture2.py) in the SAME warm session, recording wall
seconds and shuffle read/write bytes per query from the UI REST API.
Emits SCALE_SF2.json.

The composites' broadcast thresholds and AQE behavior were untested
beyond sf0.1 (SCALE_SF1 scaled only documents/embeddings); this is the
artifact that shows how those plans behave when lineitem hits 6M rows.
Also measures the deg-capped Adamic-Adar (VERDICT r11 task 4) on the
10x documents side, with the uncapped census attempted LAST under the
remaining wall-clock budget (it densifies quadratically on the
synthetic small-vocab corpus — exactly why the capped variant exists).

Usage: python tools/scale_run2.py [sf2_dir]
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

#: named by VERDICT r11 task 3 beside the composite family (discovered
#: from the registry at runtime): the heaviest relational aggs.
EXTRA = [
    "agg_market_basket_lift",   # order-keyed basket self-join, 6M lineitem
    "agg_histogram_equidepth",  # decile interpolation + full-corpus count
    "win_running_distinct",     # two user-keyed windows over 1M events
    "ext_adamic_adar_capped",   # task 4: deg-capped wedge census at 10x docs
]

#: deliberately last, under whatever budget remains: the uncapped wedge
#: census SCALE_SF1 could not afford (quadratic densification on the
#: small-vocab corpus is the documented reason the capped variant is
#: the corpus-wide one).
LAST = ["ext_adamic_adar"]


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
             .config("spark.ui.port", "4051")
             .config("spark.ui.retainedStages", "20000")
             .config("spark.driver.memory", "24g")
             .appName("scale_run2").getOrCreate())
    ui = "http://localhost:4051"

    from project_etl_spark.registry import load_all
    reg = load_all()
    names = sorted(n for n in reg if n.startswith("composite_"))
    names += EXTRA + LAST

    # warm the JVM/JIT on unrelated light queries so the sf0.1-vs-sf2
    # comparison is steady-state, not first-run
    for w in ("agg_groupby_stats", "join_inner_equi", "win_row_number"):
        reg[w].builder(spark, SF01).collect()

    budget = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET_SEC", "2700"))
    started = time.monotonic()
    out_path = os.path.join(ROOT, "SCALE_SF2.json")
    out: dict[str, dict] = {}

    def flush(status: str) -> None:
        art = {"fixture": sf2_dir, "scale_factor": 10, "status": status,
               "note": "orders 150k->1.5M, lineitem 600k->6M (verbatim "
                       "10x replication with dense orderkey offsets; "
                       "dimensions fixed 1x, so per-customer fanout grows "
                       "10x), events 100k->1M (10x users, identical "
                       "per-user streams), documents/embeddings 10x as in "
                       "SCALE_SF1. Same warm session, single run each, "
                       "local[32]. Queries not present exceeded the "
                       "wall-clock budget.",
               "queries": out}
        with open(out_path, "w") as fh:
            json.dump(art, fh, indent=1)

    for name in names:
        if time.monotonic() - started > budget:
            print(f"budget exhausted before {name}; stopping")
            break
        rec: dict[str, dict] = {}
        for tag, d in (("sf0.1", SF01), ("sf2", sf2_dir)):
            r0, w0 = shuffle_totals(ui)
            t0 = time.monotonic()
            rows = len(reg[name].builder(spark, d).collect())
            sec = round(time.monotonic() - t0, 3)
            time.sleep(0.3)  # let the status store settle
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
        flush("running")
        print(f"{name:36s} sf0.1 {s0:7.2f}s -> sf2 {s1:7.2f}s "
              f"(x{rec['sec_ratio']}), shuffle w x{rec['shuffle_write_ratio']}",
              flush=True)

    flush("complete" if len(out) == len(names) else "budget-truncated")
    print(f"wrote SCALE_SF2.json ({len(out)}/{len(names)} queries)")


if __name__ == "__main__":
    main()
