"""Golden small-input tests for the binary frame decode kernel
(SURVEY.md §5.2.3): hand-packed words with known fields must decode to exact
struct equality — the analog of the reference's ILA trace checks
(Documentation-Self-Triggering.html:51) and N-in/N-out validation
(HTML:239: 300 charges injected -> 300 L1As counted).
"""

from __future__ import annotations

import pytest

from project_etl_spark.decode import (build_hits, decode_run_files,
                                      encode_frames, write_run_file)

GOLDEN = [
    {"kind": "header", "elink": 2, "event_id": 41},
    {"kind": "data", "elink": 2, "row": 3, "col": 15, "toa": 1023, "tot": 511},
    {"kind": "data", "elink": 2, "row": 0, "col": 0, "toa": 0, "tot": 0},
    {"kind": "filler", "elink": 2},
    {"kind": "data", "elink": 2, "row": 7, "col": 8, "toa": 512, "tot": 256},
    {"kind": "trailer", "elink": 2},
]


def test_encode_shape():
    blob = encode_frames(GOLDEN)
    assert len(blob) == 5 * len(GOLDEN)


def test_golden_decode(spark, tmp_path):
    write_run_file(str(tmp_path), run=101, rb=0, frames=GOLDEN)
    out = decode_run_files(spark, str(tmp_path), drop_filler=False).collect()
    assert len(out) == len(GOLDEN)
    by_idx = {r["frame_index"]: r for r in out}
    assert all(r["run"] == 101 and r["rb"] == 0 for r in out)

    assert by_idx[0]["kind"] == "header" and by_idx[0]["event_id"] == 41
    d1 = by_idx[1]
    assert (d1["kind"], d1["row"], d1["col"], d1["toa"], d1["tot"]) == \
        ("data", 3, 15, 1023, 511)
    d2 = by_idx[2]
    assert (d2["row"], d2["col"], d2["toa"], d2["tot"]) == (0, 0, 0, 0)
    assert by_idx[3]["kind"] == "filler" and by_idx[3]["row"] is None
    d4 = by_idx[4]
    assert (d4["row"], d4["col"], d4["toa"], d4["tot"]) == (7, 8, 512, 256)
    assert by_idx[5]["kind"] == "trailer"


def test_filler_suppressed(spark, tmp_path):
    write_run_file(str(tmp_path), run=7, rb=1, frames=GOLDEN)
    out = decode_run_files(spark, str(tmp_path), drop_filler=True).collect()
    assert len(out) == len(GOLDEN) - 1
    assert all(r["kind"] != "filler" for r in out)


@pytest.mark.parametrize("n_injections", [1, 37, 300])
def test_n_in_n_out(spark, tmp_path, n_injections):
    """300 charges injected -> 300 hits counted (HTML:239)."""
    frames = [{"kind": "header", "elink": 0, "event_id": 1}]
    frames += [{"kind": "data", "elink": 0, "row": 5, "col": 6,
                "toa": 100 + i % 100, "tot": 50} for i in range(n_injections)]
    write_run_file(str(tmp_path), run=1, rb=0, frames=frames)
    hits = build_hits(decode_run_files(spark, str(tmp_path)))
    got = hits.collect()
    assert len(got) == n_injections
    assert all(r["event_id"] == 1 for r in got)


def test_event_building_multiple_l1as(spark, tmp_path):
    """Data frames attach to the latest preceding header (L1A grouping,
    DAQ_self-triggering.md:348-351)."""
    frames = [
        {"kind": "header", "elink": 0, "event_id": 10},
        {"kind": "data", "elink": 0, "row": 1, "col": 1, "toa": 5, "tot": 5},
        {"kind": "data", "elink": 0, "row": 2, "col": 2, "toa": 6, "tot": 6},
        {"kind": "header", "elink": 0, "event_id": 11},
        {"kind": "data", "elink": 0, "row": 3, "col": 3, "toa": 7, "tot": 7},
    ]
    write_run_file(str(tmp_path), run=2, rb=0, frames=frames)
    hits = build_hits(decode_run_files(spark, str(tmp_path))).collect()
    counts = {}
    for r in hits:
        counts[r["event_id"]] = counts.get(r["event_id"], 0) + 1
    assert counts == {10: 2, 11: 1}


def test_two_rb_files_metadata(spark, tmp_path):
    """(run, rb) recovery from file names (DAQ_self-triggering.md:293-294)."""
    write_run_file(str(tmp_path), run=5, rb=0, frames=GOLDEN)
    write_run_file(str(tmp_path), run=5, rb=1, frames=GOLDEN)
    out = decode_run_files(spark, str(tmp_path), drop_filler=False)
    pairs = {(r["run"], r["rb"]) for r in out.select("run", "rb").distinct().collect()}
    assert pairs == {(5, 0), (5, 1)}


class TestPpmCodec:
    """Byte-level golden tests for the pure-Python P6 PPM codec."""

    def test_golden_roundtrip_2x2(self):
        from project_etl_spark.operators.llm_multimodal import (
            ppm_decode, ppm_encode)
        # 2x2 image: red, green, blue, white
        px = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
        blob = ppm_encode(2, 2, px)
        assert blob == b"P6\n2 2\n255\n" + px
        m = ppm_decode(blob)
        assert (m["width"], m["height"], m["maxval"]) == (2, 2, 255)
        assert m["mean_r"] == (255 + 0 + 0 + 255) / 4
        assert m["mean_g"] == (0 + 255 + 0 + 255) / 4
        assert m["mean_b"] == (0 + 0 + 255 + 255) / 4
        # luminance: min is a pure-blue pixel, max is white
        assert m["luma_min"] == pytest.approx(255 * 0.114)
        assert m["luma_max"] == pytest.approx(255.0)

    def test_header_comments_and_whitespace(self):
        from project_etl_spark.operators.llm_multimodal import ppm_decode
        px = bytes(3)
        m = ppm_decode(b"P6\n# a comment\n  1\t1 # inline-ish\n255\n" + px)
        assert (m["width"], m["height"]) == (1, 1)

    def test_rejects_bad_inputs(self):
        import pytest
        from project_etl_spark.operators.llm_multimodal import (
            ppm_decode, ppm_encode)
        with pytest.raises(ValueError, match="empty"):
            ppm_decode(b"")
        with pytest.raises(ValueError, match="not a P6"):
            ppm_decode(b"P3\n1 1\n255\n abc")
        with pytest.raises(ValueError, match="truncated pixel"):
            ppm_decode(b"P6\n2 2\n255\n" + bytes(5))
        with pytest.raises(ValueError, match="pixel buffer"):
            ppm_encode(2, 2, bytes(5))

    def test_spark_payloads_are_real_ppms(self, spark):
        """The JVM-side payload assembly must produce byte-identical images
        to the Python encoder, end to end through decode_media."""
        from project_etl_spark.operators.llm_multimodal import (
            decode_media, ppm_decode, ppm_encode, ppm_payloads)
        docs = spark.createDataFrame(
            [(0, "hello world this is a document"), (7, "short"),
             (13, "x" * 500)],
            "doc_id long, text string")
        payloads = {r["doc_id"]: bytes(r["payload"])
                    for r in ppm_payloads(docs).collect()}
        for doc_id, text in [(0, "hello world this is a document"),
                             (7, "short"), (13, "x" * 500)]:
            w, h = 4 + doc_id % 5, 4 + len(text) % 5
            px = text.encode()[:w * h * 3].ljust(w * h * 3, b" ")
            assert payloads[doc_id] == ppm_encode(w, h, px), doc_id
        got = {r["doc_id"]: r for r in decode_media(ppm_payloads(docs)).collect()}
        ref = ppm_decode(payloads[7])
        assert got[7]["width"] == ref["width"]
        assert got[7]["mean_g"] == ref["mean_g"]
        assert got[7]["n_bytes"] == len(payloads[7])


def test_scan_binary_frames_matches_golden_fixture(spark):
    """End-to-end exactness for the binary scan path: the full pipeline
    (binaryFile scan -> numpy 40-bit decode -> event building) must equal
    the independently-computed golden parquet, byte for byte — the same
    comparison the external driver runs via the registered oracle."""
    import os as _os

    import pyarrow.parquet as pq

    from project_etl_spark.registry import load_all
    reg = load_all()
    got = sorted(tuple(r) for r in
                 reg["scan_binary_frames"].builder(spark, "unused").collect())
    fix = _os.path.join(_os.path.dirname(__file__), "fixtures",
                        "golden_frames.parquet")
    want = sorted(tuple(d.values()) for d in pq.read_table(fix).to_pylist())
    assert got == want


class TestPpmAhash:
    """Byte-level golden tests for the average-hash image fingerprint."""

    def test_golden_4x4_half_bright(self):
        from project_etl_spark.operators.llm_multimodal import (
            ppm_ahash, ppm_encode)
        # 4x4 image: top two rows white, bottom two rows black -> each pixel
        # is exactly one aHash block, top 8 bits set, bottom 8 clear
        px = bytes([255] * 4 * 2 * 3) + bytes([0] * 4 * 2 * 3)
        m = ppm_ahash(ppm_encode(4, 4, px))
        assert (m["width"], m["height"]) == (4, 4)
        assert m["ahash"] == 0x00FF
        assert m["n_set_bits"] == 8

    def test_uniform_image_has_zero_hash(self):
        from project_etl_spark.operators.llm_multimodal import (
            ppm_ahash, ppm_encode)
        # constant gray: no block exceeds the mean (strict >), all bits 0
        px = bytes([128] * 5 * 7 * 3)
        m = ppm_ahash(ppm_encode(5, 7, px))
        assert m["ahash"] == 0
        assert m["n_set_bits"] == 0

    def test_nonmultiple_dims_partition_all_pixels(self):
        from project_etl_spark.operators.llm_multimodal import (
            ppm_ahash, ppm_encode)
        # 6x5: blocks have unequal pixel counts; kernel must still assign
        # every pixel to exactly one of the 16 blocks (no crash, bits sane)
        px = bytes(range(6 * 5 * 3 % 256)) * 3
        px = (px * ((6 * 5 * 3) // len(px) + 1))[:6 * 5 * 3]
        m = ppm_ahash(ppm_encode(6, 5, px))
        assert 0 <= m["ahash"] < 1 << 16
        assert 0 <= m["n_set_bits"] <= 16
