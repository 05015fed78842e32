#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_flatness.parquet.

Replicates the JVM-side PCM payload assembly (`pcm_payloads`)
independently in pure Python over EVERY fixture scale and fingerprints
with the plain-loop pure-Python DFT twin `pcm_flatness_py`
(tools/spectral_twins.py) — fully independent of the numpy kernel the
query runs, so a kernel bug fails the fixture-backed oracle instead of
being baked into the fixture. Rows are keyed on (doc_id, md5(text)) —
the `ext_audio_spectral_flatness` oracle joins that key against the
registered documents view. RUN THIS whenever the driver regenerates
/root/testdata.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.spectral_twins import pcm_flatness_py
from tools.gen_golden_pcm import payload_for
from tools.gen_golden_ppm_stats import SF_DIRS

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_flatness.parquet")


def main() -> None:
    rows: dict[tuple[int, str], dict] = {}
    for sf_dir in SF_DIRS:
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
        for doc_id, text in zip(tbl["doc_id"].to_pylist(),
                                tbl["text"].to_pylist()):
            text_md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
            key = (doc_id, text_md5)
            if key in rows:
                continue
            m = pcm_flatness_py(payload_for(doc_id, text))
            m["doc_id"] = doc_id
            m["text_md5"] = text_md5
            rows[key] = m
    cols = ["doc_id", "text_md5", "n_frames", "mean_flatness_micro",
            "min_flatness_micro", "n_tonal_frames"]
    table = pa.table({c: [rows[k][c] for k in sorted(rows)] for c in cols})
    pq.write_table(table, OUT)
    print(f"{OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
