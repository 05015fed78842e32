#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_pcm_energy.parquet.

Replicates the JVM-side PCM payload assembly (`pcm_payloads`) independently
in pure Python over EVERY fixture scale and computes the frame-energy
features with plain int arithmetic (no numpy — a genuinely independent
implementation), keyed on (doc_id, md5(text)) so the `ext_audio_energy`
oracle joins one SQL string exactly at any scale. RUN THIS whenever the
driver regenerates /root/testdata.
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
                   "tests", "fixtures", "golden_pcm_energy.parquet")


def payload_for(doc_id: int, text: str) -> bytes:
    n = 64 + doc_id % 64
    need = 2 * n
    smp = text.ljust(need)[:need].encode("utf-8")[:need]
    return f"PCM\n{n}\n".encode() + smp


def energy_for(blob: bytes) -> dict:
    nl1 = blob.index(b"\n")
    nl2 = blob.index(b"\n", nl1 + 1)
    n = int(blob[nl1 + 1:nl2])
    body = blob[nl2 + 1:nl2 + 1 + 2 * n]
    x = list(struct.unpack(f"<{n}h", body))
    n_frames = n // 16
    frame_sq = [sum(v * v for v in x[f * 16:(f + 1) * 16])
                for f in range(n_frames)]
    return {"n_samples": n, "n_frames": n_frames,
            "peak_abs": max(abs(v) for v in x),
            "total_sumsq": sum(frame_sq),
            "max_frame_sumsq": max(frame_sq)}


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
            e = energy_for(payload_for(doc_id, text))
            rows[key] = {"doc_id": doc_id, "text_md5": text_md5, **e}
    data = sorted(rows.values(), key=lambda r: (r["doc_id"], r["text_md5"]))
    pq.write_table(pa.Table.from_pylist(data), OUT)
    print(f"{OUT}: {len(data)} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
