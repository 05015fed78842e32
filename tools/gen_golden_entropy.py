#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_entropy.parquet.

Replicates the JVM-side PPM payload assembly (`ppm_payloads`) independently
in pure Python over EVERY fixture scale and computes the 16-bin luma
histogram entropy with PLAIN PYTHON LOOPS (no numpy, no reuse of the
`ppm_luma_entropy` kernel — the point of the twin), writing rows keyed on
(doc_id, md5(text)) — the `ext_image_entropy` oracle joins that key against
the registered documents view, so one SQL string is exact at any scale.
RUN THIS whenever the driver regenerates /root/testdata.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_golden_ppm_stats import SF_DIRS, payload_for

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_entropy.parquet")


def luma_entropy_py(blob: bytes) -> dict:
    """Pure-Python luma-entropy twin (loops, no numpy)."""
    assert blob[:2] == b"P6"
    idx = 2
    fields = []
    while len(fields) < 3:
        while blob[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while not blob[idx : idx + 1].isspace():
            idx += 1
        fields.append(int(blob[start:idx]))
    idx += 1
    width, height, _maxval = fields
    px = blob[idx : idx + width * height * 3]
    bins = [0] * 16
    n = 0
    for i in range(0, len(px), 3):
        luma = (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]) // 1000
        bins[luma >> 4] += 1
        n += 1
    h = 0.0
    for c in bins:
        if c > 0:
            h += c * math.log(n / c)
    return {"width": width, "height": height, "n_pixels": n,
            "n_bins_used": sum(1 for c in bins if c > 0),
            "h_micro": math.floor(h / n * 1e6 + 0.5)}


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
            rec = luma_entropy_py(payload_for(doc_id, text))
            rec["doc_id"] = doc_id
            rec["text_md5"] = text_md5
            rows[key] = rec
    cols = ["doc_id", "text_md5", "width", "height", "n_pixels",
            "n_bins_used", "h_micro"]
    table = pa.table({c: [rows[k][c] for k in sorted(rows)] for c in cols})
    pq.write_table(table, OUT)
    print(f"{OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
