#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_channel_hist.parquet.

Replicates the JVM-side PPM payload assembly (`ppm_payloads`) independently
in pure Python over EVERY fixture scale and computes per-channel 4-bin
histograms + the dominant channel with PLAIN PYTHON LOOPS (no numpy, no
reuse of the `ppm_channel_hist` kernel — the point of the twin), writing
rows keyed on (doc_id, md5(text)) — the `ext_image_channel_hist` oracle
joins that key against the registered documents view, so one SQL string is
exact at any scale. RUN THIS whenever the driver regenerates /root/testdata.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_golden_ppm_stats import SF_DIRS, payload_for

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_channel_hist.parquet")


def channel_hist_py(blob: bytes) -> dict:
    """Pure-Python channel histogram twin (loops, no numpy)."""
    # parse the P6 header: three whitespace-separated tokens after "P6"
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
    idx += 1                      # the single whitespace after maxval
    width, height, maxval = fields
    px = blob[idx : idx + width * height * 3]
    out = {"width": width, "height": height}
    totals = [0, 0, 0]
    for c, name in enumerate("rgb"):
        bins = [0, 0, 0, 0]
        for i in range(c, len(px), 3):
            v = px[i]
            bins[v >> 6] += 1
            totals[c] += v
        for b in range(4):
            out[f"{name}{b}"] = bins[b]
    best = 0
    for c in (1, 2):
        if totals[c] > totals[best]:
            best = c
    out["dominant_channel"] = best
    return out


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
            m = channel_hist_py(payload_for(doc_id, text))
            row = {"doc_id": doc_id, "text_md5": text_md5,
                   "width": m["width"], "height": m["height"]}
            for n in "rgb":
                for b in range(4):
                    row[f"{n}{b}"] = m[f"{n}{b}"]
            row["dominant_channel"] = m["dominant_channel"]
            rows[key] = row
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text_md5", pa.string()),
         ("width", pa.int32()), ("height", pa.int32())]
        + [(f"{n}{b}", pa.int64()) for n in "rgb" for b in range(4)]
        + [("dominant_channel", pa.int32())])
    data = sorted(rows.values(), key=lambda r: (r["doc_id"], r["text_md5"]))
    pq.write_table(pa.Table.from_pylist(data, schema=schema), OUT,
                   compression="snappy")
    print(f"{OUT}: {len(data)} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
