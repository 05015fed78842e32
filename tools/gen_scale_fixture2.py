#!/usr/bin/env python
"""Generate the sf2 scale-validation fixture: EVERYTHING 10x.

Round 11's SCALE_SF1 scaled only documents/embeddings (the dedup/ANN
side); the relational fact tables were symlinked 1x, so the TPC-H-shape
composites, the heavy relational aggs and the window families had never
run beyond sf0.1. This fixture closes that gap (VERDICT r11 task 3):

- orders:   150,000 -> 1,500,000 rows. Ten copies; copy c offsets
  o_orderkey by c * 150,000 (sf0.1 keys are dense 0..149999, so keys
  stay dense in 0..1.5M). All other columns replicate verbatim, so
  every per-order distribution (status/priority/date/price) is
  EXACTLY preserved; per-CUSTOMER fanout grows 10x (dimensions stay
  1x — the fixed-dims scaling regime, documented in SCALE_SF2.json).
- lineitem: 600,000 -> 6,000,000 rows. Same ten copies with the same
  l_orderkey offset, so order->lineitem join selectivity and per-order
  basket composition are bit-identical to sf0.1.
- events:   100,000 -> 1,000,000 rows. Ten copies; copy c offsets
  user_id by c * 10,000 and event_id by c * 100,000 — 10x MORE users
  with identical per-user event streams (window-partition sizes are
  preserved; this is how engagement data actually scales).
- documents/embeddings: delegated to tools/gen_scale_fixture.py
  (50,000 docs / 20,000 vectors, same construction as SCALE_SF1) so
  one fixture dir serves both query families and the deg-capped
  Adamic-Adar row can land in the same artifact.
- dimensions (region/nation/customer/supplier/part): symlinked 1x.

Deterministic: pure replication + fixed-seed doc/embedding generation,
no wall-clock. Output dir is scratch (default /tmp/spark_graft_sf2) —
only the measured SCALE_SF2.json is committed.
Usage:  python tools/gen_scale_fixture2.py [outdir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_scale_fixture as sf1  # noqa: E402  (documents/embeddings)

SF01 = "/root/testdata/sf0.1"
COPIES = 10


def _replicate(name: str, outdir: str, offsets: dict[str, int]) -> int:
    src = pq.read_table(os.path.join(SF01, f"{name}.parquet"))
    parts = []
    for c in range(COPIES):
        t = src
        for col, step in offsets.items():
            idx = t.column_names.index(col)
            t = t.set_column(idx, col, pc.add(t.column(col), c * step))
        parts.append(t)
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(outdir, f"{name}.parquet"))
    return out.num_rows


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf2"
    os.makedirs(outdir, exist_ok=True)
    n_ord = _replicate("orders", outdir, {"o_orderkey": 150_000})
    n_li = _replicate("lineitem", outdir, {"l_orderkey": 150_000})
    n_ev = _replicate("events", outdir,
                      {"user_id": 10_000, "event_id": 100_000})
    sf1.gen_documents(outdir)
    sf1.gen_embeddings(outdir)
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(outdir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"{outdir}: orders={n_ord}, lineitem={n_li}, events={n_ev}, "
          f"documents={sf1.N_DOCS}, embeddings={sf1.N_EMB}")


if __name__ == "__main__":
    main()
