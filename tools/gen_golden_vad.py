#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_vad.parquet.

Replicates the JVM-side PCM payload assembly (`pcm_payloads`) independently
in pure Python over EVERY fixture scale and computes the voice-activity
segment census with plain int arithmetic (no numpy — a genuinely
independent implementation of the `pcm_vad` kernel), keyed on (doc_id,
md5(text)) so the `ext_audio_vad_segments` oracle joins one SQL string
exactly at any scale. RUN THIS whenever the driver regenerates
/root/testdata.
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
                   "tests", "fixtures", "golden_vad.parquet")


def vad_for(blob: bytes) -> dict:
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    n = int(blob[nl1 + 1:nl2])
    body = blob[nl2 + 1:nl2 + 1 + 2 * n]
    x = list(struct.unpack(f"<{n}h", body))
    n_frames = n // 16
    s = [sum(v * v for v in x[f * 16:(f + 1) * 16]) for f in range(n_frames)]
    total = sum(s)
    active = [e * n_frames > total for e in s]
    segments, run, first = [], 0, -1
    for i, a in enumerate(active):
        if a:
            run += 1
            if first < 0:
                first = i
        elif run:
            segments.append(run)
            run = 0
    if run:
        segments.append(run)
    return {"n_frames": n_frames, "n_active": sum(active),
            "n_segments": len(segments),
            "longest_segment": max(segments) if segments else 0,
            "first_active_frame": first}


def main() -> None:
    rows: dict = {}
    for sf_dir in SF_DIRS:
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
        for doc_id, text in zip(tbl["doc_id"].to_pylist(),
                                tbl["text"].to_pylist()):
            text_md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
            key = (doc_id, text_md5)
            if key in rows:
                continue
            m = vad_for(payload_for(doc_id, text))
            rows[key] = {"doc_id": doc_id, "text_md5": text_md5, **m}
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text_md5", pa.string()),
        ("n_frames", pa.int32()), ("n_active", pa.int32()),
        ("n_segments", pa.int32()), ("longest_segment", pa.int32()),
        ("first_active_frame", pa.int32()),
    ])
    table = pa.Table.from_pylist(list(rows.values()), schema=schema)
    pq.write_table(table, OUT)
    print(f"{OUT}: {table.num_rows} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
