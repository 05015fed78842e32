#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_clipping.parquet.

Replicates the JVM-side PCM payload assembly (`pcm_payloads`) independently
in pure Python over EVERY fixture scale and computes the clipping/level
audit with plain int arithmetic (no numpy — a genuinely independent
implementation of `pcm_clipping`), keyed on (doc_id, md5(text)) so the
`ext_audio_clipping` oracle joins one SQL string exactly at any scale.
RUN THIS whenever the driver regenerates /root/testdata.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_golden_pcm import payload_for
from tools.gen_golden_ppm_stats import SF_DIRS

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_clipping.parquet")

CLIP_THRESHOLD = 30000


def clipping_for(blob: bytes) -> dict:
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    n = int(blob[nl1 + 1:nl2])
    body = blob[nl2 + 1:nl2 + 1 + 2 * n]
    x = list(struct.unpack(f"<{n}h", body))
    n_clipped = sum(1 for v in x if abs(v) >= CLIP_THRESHOLD)
    return {"n_samples": n, "n_clipped": n_clipped,
            "clip_permille": (2000 * n_clipped + n) // (2 * n),
            "peak_abs": max(abs(v) for v in x),
            "sum_samples": sum(x)}


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
            m = clipping_for(payload_for(doc_id, text))
            rows[key] = dict(doc_id=doc_id, text_md5=text_md5, **m)
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text_md5", pa.string()),
        ("n_samples", pa.int32()), ("n_clipped", pa.int32()),
        ("clip_permille", pa.int64()), ("peak_abs", pa.int32()),
        ("sum_samples", pa.int64()),
    ])
    data = sorted(rows.values(), key=lambda r: (r["doc_id"], r["text_md5"]))
    pq.write_table(pa.Table.from_pylist(data, schema=schema), OUT,
                   compression="snappy")
    print(f"{OUT}: {len(data)} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
