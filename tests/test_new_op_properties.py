"""Semantic property tests for the round-5 operator additions: each test
plants a fixture where the operator's CLAIMED capability has a known
answer (shift-invariant chunking, bimodal thresholding, Benford
conformance, attribution windows, association lift, pair bias) and
asserts it — the behavioral check that hash-vs-oracle equality alone
cannot give, since oracle and builder could share a wrong formula."""

from __future__ import annotations

import os

import pytest

from project_etl_spark.registry import load_all

REGISTRY = load_all()


def _write(spark, tmp, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(tmp, f"{name}.parquet"))


WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu one two three four five "
         "six seven eight nine ten eleven twelve thirteen fourteen fifteen")


def test_cdc_chunking_is_shift_invariant(spark, tmp_path):
    """The LBFS property: prepending bytes re-cuts only the FIRST chunk;
    every later boundary is content-determined, so the two docs share
    chunks — a positional/fixed-stride scheme would share none."""
    base = (WORDS + " " + WORDS)  # ~480 chars -> ~15 expected boundaries
    rows = [(0, base, "en", "s0", len(base)),
            (1, "zzz " + base, "en", "s0", len(base) + 4)]
    _write(spark, str(tmp_path), "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    out = {r["doc_id"]: r for r in
           REGISTRY["ext_cdc_chunking"].builder(
               spark, str(tmp_path)).collect()}
    assert out[0]["n_chunks"] > 3  # boundaries actually fired
    assert out[0]["n_shared_chunks"] >= out[0]["n_chunks"] - 2
    assert out[1]["n_shared_chunks"] >= out[1]["n_chunks"] - 2


def test_otsu_threshold_splits_planted_bimodal(spark, tmp_path):
    """Two length clusters (bins ~3 and ~27): the chosen threshold must
    land strictly between them."""
    rows = [(i, "x", "en", "s0", 60) for i in range(30)]
    rows += [(100 + i, "x", "en", "s0", 500) for i in range(30)]
    _write(spark, str(tmp_path), "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    out = REGISTRY["ext_otsu_threshold"].builder(
        spark, str(tmp_path)).collect()
    chosen = [r["threshold_bin"] for r in out if r["is_otsu"]]
    assert len(chosen) == 1
    assert 60 // 18 < chosen[0] <= 500 // 18


def test_benford_separates_powerlaw_from_uniform(spark, tmp_path):
    """Multi-scale (log-uniform) amounts conform to Benford; fixed-scale
    uniform amounts do not — the chi-square must say so."""
    rows = []
    for i in range(2000):  # log-uniform over 4 decades
        rows.append((10.0 ** (1.0 + 4.0 * i / 2000.0), "A"))
    for i in range(2000):  # uniform in [100, 1000): flat first digit
        rows.append((100.0 + 900.0 * i / 2000.0, "B"))
    _write(spark, str(tmp_path), "lineitem", rows,
           "l_extendedprice double, l_returnflag string")
    out = REGISTRY["ext_benford_anomaly"].builder(
        spark, str(tmp_path)).collect()
    chi2 = {r["flag"]: r["chi2_micro"] for r in out}
    assert chi2["A"] < chi2["B"] / 10
    # uniform data under-represents digit 1 (301 permille expected)
    d1b = [r for r in out if r["flag"] == "B" and r["digit"] == 1][0]
    assert d1b["dev_permille"] < -100


def test_attribution_window_and_none_paths(spark, tmp_path):
    """Purchase after a click inside 7 days -> click; after the horizon
    -> none; with no preceding touch -> none; newest touch wins."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    h, d = dt.timedelta(hours=1), dt.timedelta(days=1)
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0 + h, 10, "view", 0.0, "{}"),          # newer touch
        (3, t0 + 2 * h, 10, "purchase", 5.0, "{}"),  # -> view (last touch)
        (4, t0 + 10 * d, 10, "purchase", 7.0, "{}"), # -> none (horizon)
        (5, t0, 20, "purchase", 9.0, "{}"),          # -> none (no touch)
    ]
    _write(spark, str(tmp_path), "events", rows,
           "event_id long, ts timestamp, user_id long, event_type string,"
           " value double, props string")
    out = {r["attributed_to"]: r for r in
           REGISTRY["agg_attribution_last_touch"].builder(
               spark, str(tmp_path)).collect()}
    assert out["view"]["n_purchases"] == 1
    assert out["view"]["revenue_cents"] == 500
    assert out["none"]["n_purchases"] == 2
    assert out["none"]["revenue_cents"] == 1600
    assert "click" not in out  # the older touch never wins


def test_basket_lift_orders_planted_association(spark, tmp_path):
    """Brands planted to co-occur (X,Y always together) must out-lift an
    incidental pair."""
    li, part = [], [(1, "BRAND#X"), (2, "BRAND#Y"), (3, "BRAND#Z")]
    for o in range(1, 11):          # X,Y always together
        li += [(o, 1), (o, 2)]
    for o in range(11, 16):         # Z alone
        li += [(o, 3)]
    for o in range(16, 21):         # Y,Z incidental
        li += [(o, 2), (o, 3)]
    _write(spark, str(tmp_path), "lineitem", li,
           "l_orderkey long, l_partkey long")
    _write(spark, str(tmp_path), "part", part,
           "p_partkey long, p_brand string")
    out = {(r["brand_a"], r["brand_b"]): r for r in
           REGISTRY["agg_market_basket_lift"].builder(
               spark, str(tmp_path)).collect()}
    xy = out[("BRAND#X", "BRAND#Y")]
    yz = out[("BRAND#Y", "BRAND#Z")]
    # lift(X,Y) = 10*20/(10*15) = 1.333; lift(Y,Z) = 5*20/(15*10) = 0.667
    assert xy["lift_micro"] == 1333333
    assert yz["lift_micro"] == 666667
    assert xy["conf_micro"] == 1000000  # X -> Y is a certainty


def test_preference_audit_counts_length_bias(spark, tmp_path):
    """Chosen = higher type-token ratio; the audit must count exactly the
    pairs where that winner is ALSO longer."""
    rows = [
        (0, "a b c d", "en", "s0", 7),          # TTR 1000, 4 toks -> chosen
        (1, "a a a a a a", "en", "s0", 11),     # TTR 166, 6 toks
        (2, "a b c d e f g h", "en", "s0", 15), # TTR 1000, 8 toks -> chosen
        (3, "a a", "en", "s0", 3),              # TTR 500, 2 toks
    ]
    _write(spark, str(tmp_path), "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    out = REGISTRY["ext_preference_pair_audit"].builder(
        spark, str(tmp_path)).collect()
    total = sum(r["n_pairs"] for r in out)
    longer = sum(r["n_chosen_longer"] for r in out)
    assert total == 2
    assert longer == 1  # only pair (2,3)'s winner is longer


def test_heaps_curve_is_monotone(spark, sf_dir):
    """Vocabulary and token totals must be nondecreasing along the
    cumulative checkpoints (first-occurrence accounting is consistent)."""
    rows = sorted(REGISTRY["ext_vocab_growth_heaps"].builder(
        spark, sf_dir).collect(), key=lambda r: r["cp_idx"])
    toks = [r["total_tokens"] for r in rows]
    vocab = [r["vocab_size"] for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    assert vocab[-1] <= toks[-1]
