#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_gain.parquet.

Replicates the JVM-side PCM payload assembly (`pcm_payloads`)
independently in pure Python over EVERY fixture scale and computes the
per-clip int16 sum of squares with PLAIN PYTHON (struct unpack, no numpy,
no reuse of the `pcm_gain` kernel), keyed on (doc_id, md5(text)) — the
`ext_audio_gain_normalize` oracle joins that key against the registered
documents view. RUN THIS whenever the driver regenerates /root/testdata.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_golden_ppm_stats import SF_DIRS

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_gain.parquet")


def pcm_payload_py(doc_id: int, text: str) -> bytes:
    """Pure-Python twin of `pcm_payloads`."""
    n = 64 + doc_id % 64
    need = 2 * n
    smp = text.ljust(need)[:need].encode("utf-8")[:need]
    return f"PCM\n{n}\n".encode() + smp


def sum_sq_py(blob: bytes) -> tuple[int, int]:
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    n = int(blob[nl1 + 1:nl2])
    body = blob[nl2 + 1:nl2 + 1 + 2 * n]
    total = 0
    for (v,) in struct.iter_unpack("<h", body):
        total += v * v
    return n, total


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
            n, ss = sum_sq_py(pcm_payload_py(doc_id, text))
            rows[key] = {"doc_id": doc_id, "text_md5": text_md5,
                         "n_samples": n, "sum_sq": ss}
    schema = pa.schema([("doc_id", pa.int64()), ("text_md5", pa.string()),
                        ("n_samples", pa.int64()), ("sum_sq", pa.int64())])
    data = sorted(rows.values(), key=lambda r: (r["doc_id"], r["text_md5"]))
    pq.write_table(pa.Table.from_pylist(data, schema=schema), OUT,
                   compression="snappy")
    print(f"{OUT}: {len(data)} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
