#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_ahash.parquet.

Replicates the JVM-side PPM payload assembly (`ppm_payloads`) independently
in pure Python over EVERY fixture scale, fingerprints with the
plain-loop pure-Python twin `ppm_ahash_py` (tools/spectral_twins.py —
fully independent of the numpy kernel the query runs, so a kernel bug
fails the fixture-backed oracle), and writes per-document aHash rows
keyed on (doc_id, md5(text)) — the `ext_image_ahash` oracle joins that key
against the registered documents view, so one SQL string is exact at any
scale. RUN THIS whenever the driver regenerates /root/testdata.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.spectral_twins import ppm_ahash_py
from tools.gen_golden_ppm_stats import SF_DIRS, payload_for

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_ahash.parquet")


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
            m = ppm_ahash_py(payload_for(doc_id, text))
            rows[key] = {
                "doc_id": doc_id, "text_md5": text_md5,
                "width": m["width"], "height": m["height"],
                "ahash": m["ahash"], "n_set_bits": m["n_set_bits"],
            }
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text_md5", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("ahash", pa.int64()), ("n_set_bits", pa.int32()),
    ])
    table = pa.Table.from_pylist(list(rows.values()), schema=schema)
    pq.write_table(table, OUT)
    print(f"{OUT}: {table.num_rows} rows over {len(SF_DIRS)} scales")


if __name__ == "__main__":
    main()
