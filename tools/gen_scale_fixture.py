#!/usr/bin/env python
"""Generate an sf1 scale-validation fixture (10x sf0.1) for the
heaviest query family (documents + embeddings), mirroring the driver
fixture's construction so dedup/LSH/ANN behavior carries over:

- documents: 50,000 rows (sf0.1 has 5,000). Same 31-word vocabulary,
  word-count uniform in [8, 105] (sf0.1 n_chars 44..577, avg ~297),
  lang mix en ~41% / {zh,es,fr,de} ~15% each, 20 uniform sources,
  exact-duplicate rate ~0.16% (sf0.1 had 8 dup texts in 5,000).
- embeddings: 20,000 rows (sf0.1 has 2,000), 64-dim float32, 10
  labels; per-label centroids and residual scale are ESTIMATED from
  the real sf0.1 table so cluster structure (IVF/k-means/SemDeDup
  behavior) is preserved at 10x.

All other tables are symlinked from sf0.1 so every registered query
can still run against the fixture dir (only documents/embeddings are
scaled; that is where the top-15 heaviest queries spend their time).

Deterministic: fixed seed, no wall-clock. Output dir is scratch
(default /tmp/spark_graft_sf1) — only the measured SCALE_SF1.json is
committed. Usage:  python tools/gen_scale_fixture.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
SEED = 1
N_DOCS = 50_000
N_EMB = 20_000
DIM = 64
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _vocab() -> list[str]:
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) w "
        f"FROM read_parquet('{SF01}/documents.parquet')) ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows]


def gen_documents(outdir: str) -> None:
    rng = np.random.default_rng(SEED)
    vocab = np.array(_vocab())
    n_words = rng.integers(8, 106, size=N_DOCS)
    texts = []
    for k in n_words:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=k)]))
    # plant exact duplicates at the sf0.1 rate (~0.16%): overwrite the
    # text of ~80 victim rows with an earlier row's text
    n_dup = int(round(N_DOCS * 8 / 5000))
    victims = rng.choice(np.arange(1, N_DOCS), size=n_dup, replace=False)
    for v in victims:
        texts[v] = texts[int(rng.integers(0, v))]
    langs = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=N_DOCS)])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))


def gen_embeddings(outdir: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    src = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
    labels0 = np.asarray(src.column("label"))
    vecs0 = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    centroids, scales = {}, {}
    for lbl in range(10):
        pts = vecs0[labels0 == lbl]
        centroids[lbl] = pts.mean(axis=0)
        scales[lbl] = (pts - centroids[lbl]).std(axis=0)
    labels = rng.integers(0, 10, size=N_EMB)
    vecs = np.empty((N_EMB, DIM), dtype=np.float32)
    for lbl in range(10):
        idx = np.where(labels == lbl)[0]
        vecs[idx] = centroids[lbl] + rng.standard_normal(
            (len(idx), DIM)).astype(np.float32) * scales[lbl]
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    })
    pq.write_table(tbl, os.path.join(outdir, "embeddings.parquet"))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    os.makedirs(outdir, exist_ok=True)
    gen_documents(outdir)
    gen_embeddings(outdir)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = os.path.join(outdir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"{outdir}: documents={N_DOCS}, embeddings={N_EMB} (seed={SEED})")


if __name__ == "__main__":
    main()
