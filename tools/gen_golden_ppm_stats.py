#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_ppm_stats.parquet.

Replicates the JVM-side PPM payload assembly (`ppm_payloads`) independently
in pure Python over EVERY fixture scale, decodes with the plain-loop
pure-Python twin `ppm_decode_py` (tools/spectral_twins.py — fully
independent of the numpy codec the query runs, so a codec bug fails the
fixture-backed oracle), and writes per-document pixel stats keyed on
(doc_id, md5(text)) — the `ext_multimodal_decode` oracle joins that key
against the registered documents view, so one SQL string is exact at any
scale. RUN THIS whenever the driver regenerates /root/testdata (the texts,
and therefore every payload byte, change with it).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.spectral_twins import ppm_decode_py

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_ppm_stats.parquet")


def payload_for(doc_id: int, text: str) -> bytes:
    """Pure-Python twin of `ppm_payloads`: width/height from the row,
    pixel bytes = utf-8 of the space-padded text, byte-truncated to
    exactly width*height*3."""
    w = 4 + doc_id % 5
    h = 4 + len(text) % 5
    need = w * h * 3
    px = text.ljust(need)[:need].encode("utf-8")[:need]
    return (f"P6\n{w} {h}\n255\n").encode() + px


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
            payload = payload_for(doc_id, text)
            m = ppm_decode_py(payload)
            rows[key] = {
                "doc_id": doc_id, "text_md5": text_md5,
                "width": m["width"], "height": m["height"],
                "maxval": m["maxval"],
                "mean_r": m["mean_r"], "mean_g": m["mean_g"],
                "mean_b": m["mean_b"],
                "luma_min": m["luma_min"], "luma_max": m["luma_max"],
                "n_bytes": len(payload),
            }
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text_md5", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("maxval", pa.int32()),
        ("mean_r", pa.float64()), ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
        ("luma_min", pa.float64()), ("luma_max", pa.float64()),
        ("n_bytes", pa.int64()),
    ])
    data = list(rows.values())
    table = pa.Table.from_pylist(data, schema=schema)
    pq.write_table(table, OUT)
    print(f"{OUT}: {len(data)} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
