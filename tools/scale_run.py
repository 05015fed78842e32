#!/usr/bin/env python
"""Scale-validation run: execute the heaviest registered queries once
at sf0.1 and once at the 10x sf1 fixture (tools/gen_scale_fixture.py)
in the SAME warm session, recording wall seconds and shuffle
read/write bytes per query from the UI REST API. Emits SCALE_SF1.json.

The point (VERDICT r10 task 5): SCALE.md's crossover/skew/bounded-
state claims are measured at sf0.1 — this artifact shows how the
heaviest plans actually scale when documents/embeddings grow 10x.
A query whose seconds or shuffle bytes grow super-linearly (>10x,
with slack for fixed overheads) gets a SCALE.md entry or a fix.

Usage: python tools/scale_run.py [sf1_dir] [n_heaviest]
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

#: top of BENCH_DETAIL_r10_builder.json restricted to queries whose
#: cost lives in documents/embeddings (the tables the sf1 fixture
#: scales 10x); TPC-H-fact-heavy queries are excluded because their
#: tables are symlinked 1x and would only measure noise.
HEAVIEST = [
    "ext_dup_embedding_cosine", "ext_curation_pipeline",
    "ext_pagerank_iter", "sink_dedup_index", "ext_cdc_chunking",
    "ext_dedup_connected_components", "ext_dedup_near_lsh_verified",
    "sink_dedup_index_merge", "sink_dedup_index_retract",
    "ext_dedup_incremental_indexed", "ext_lsh_band_sweep_indexed",
    "ext_dedup_method_census", "ext_lsh_band_sweep",
    "ext_dedup_census_indexed",
    # deliberately last: the wedge census densifies quadratically on
    # the synthetic small-vocab corpus (documented per-domain/sampled
    # trade at extreme scale) — may exceed any time budget at sf1
    "ext_adamic_adar",
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
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(HEAVIEST)
    names = HEAVIEST[:n]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4050")
             .config("spark.ui.retainedStages", "20000")
             .config("spark.driver.memory", "24g")
             .appName("scale_run").getOrCreate())
    ui = "http://localhost:4050"

    from project_etl_spark.registry import load_all
    reg = load_all()

    # warm the JVM/JIT on unrelated light queries so the sf0.1-vs-sf1
    # comparison is steady-state, not first-run
    for w in ("agg_groupby_stats", "join_inner_equi", "win_row_number"):
        reg[w].builder(spark, SF01).collect()

    budget = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET_SEC", "2400"))
    started = time.monotonic()
    out_path = os.path.join(ROOT, "SCALE_SF1.json")
    out: dict[str, dict] = {}

    def flush(status: str) -> None:
        art = {"fixture": sf1_dir, "scale_factor_docs": 10, "status": status,
               "note": "documents 5k->50k rows, embeddings 2k->20k rows; "
                       "other tables symlinked 1x from sf0.1. Same warm "
                       "session, single run each, local[32]. Queries not "
                       "present exceeded the wall-clock budget.",
               "queries": out}
        with open(out_path, "w") as fh:
            json.dump(art, fh, indent=1)

    for name in names:
        if time.monotonic() - started > budget:
            print(f"budget exhausted before {name}; stopping")
            break
        rec: dict[str, dict] = {}
        for tag, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            r0, w0 = shuffle_totals(ui)
            t0 = time.monotonic()
            rows = len(reg[name].builder(spark, d).collect())
            sec = round(time.monotonic() - t0, 3)
            time.sleep(0.3)  # let the status store settle
            r1, w1 = shuffle_totals(ui)
            rec[tag] = {"sec": sec, "rows": rows,
                        "shuffle_read_bytes": r1 - r0,
                        "shuffle_write_bytes": w1 - w0}
        s0, s1 = rec["sf0.1"]["sec"], rec["sf1"]["sec"]
        rec["sec_ratio"] = round(s1 / s0, 2) if s0 > 0 else None
        b0 = rec["sf0.1"]["shuffle_write_bytes"]
        b1 = rec["sf1"]["shuffle_write_bytes"]
        rec["shuffle_write_ratio"] = round(b1 / b0, 2) if b0 > 0 else None
        out[name] = rec
        flush("running")
        print(f"{name:36s} sf0.1 {s0:7.2f}s -> sf1 {s1:7.2f}s "
              f"(x{rec['sec_ratio']}), shuffle w x{rec['shuffle_write_ratio']}",
              flush=True)

    flush("complete" if len(out) == len(names) else "budget-truncated")
    print(f"wrote SCALE_SF1.json ({len(out)}/{len(names)} queries)")


if __name__ == "__main__":
    main()
