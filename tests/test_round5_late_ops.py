"""Planted-data and invariant tests for the round-5 late operators:
JS-divergence drift, curriculum scheduling, nDCG ranking eval, NFC
normalization, PCA whitening, and the GROUP BY ALL dialect surface."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from project_etl_spark.registry import load_all


def test_jsd_bounds_and_self_divergence(spark, sf_dir):
    """JSD is bounded by ln 2 and non-negative; a source that IS the
    corpus-wide distribution scores ~0 (checked via the planted twin)."""
    rows = load_all()["ext_js_divergence"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["jsd"] <= math.log(2.0) + 1e-9


def test_jsd_planted_disjoint_vocab_closed_form():
    """Two sources with DISJOINT vocabularies and equal token mass: the
    corpus is G = (P+Q)/2, and JSD(P, G) has the closed form
    0.75 * ln(4/3) — on P's support g = p/2 so the mixture is 3p/4
    (terms ln(4/3) and 0.5*ln(2/3)), on Q's support the tail contributes
    0.5 * 0.5 * ln 2. The oracle (the shared twin of the builder) must
    reproduce it for both sources symmetrically."""
    rows = [(1, "aa bb cc dd aa bb cc dd", "en", "src_a", 0),
            (2, "ee ff gg hh ee ff gg hh", "en", "src_b", 0)]
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]))
    out = con.execute(load_all()["ext_js_divergence"].oracle).df()
    got = dict(zip(out["source"], out["jsd"]))
    expect = 0.75 * math.log(4.0 / 3.0)
    assert abs(got["src_a"] - got["src_b"]) < 1e-9
    assert abs(got["src_a"] - expect) < 1e-5


def test_curriculum_interleaves_buckets(spark, sf_dir):
    """Positions 1..3 must cover three distinct buckets (round-robin
    start) and within every bucket the difficulty must be non-decreasing
    along the schedule."""
    rows = load_all()["ext_curriculum_order"].builder(spark, sf_dir).collect()
    assert rows
    by_pos = sorted(rows, key=lambda r: r["position"])
    n = len(by_pos)
    assert {r["position"] for r in by_pos} == set(range(1, n + 1))
    assert {r["bucket"] for r in by_pos[:3]} == {1, 2, 3}
    last = {}
    for r in by_pos:
        b = r["bucket"]
        if b in last:
            assert r["awl_q"] >= last[b]
        last[b] = r["awl_q"]


def test_ndcg_in_unit_interval_and_monotone_vs_recall(spark, sf_dir):
    rows = load_all()["ext_ndcg_eval"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        if r["n_rel"] == 10:
            # every retrieved item relevant → any order is ideal
            assert abs(r["ndcg"] - 1.0) < 1e-6
        if r["n_rel"] == 0:
            assert r["ndcg"] == 0.0


def test_nfc_normalization_decomposed_cases_change(spark, sf_dir):
    rows = load_all()["ext_unicode_normalize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        m = r["doc_id"] % 3
        if m == 0:
            # e + COMBINING ACUTE collapses into U+00E9: one cp shorter
            assert r["changed"] and r["len_nfc"] == r["len_raw"] - 1
        elif m == 1:
            # ANGSTROM SIGN → Å: singleton substitution, same length
            assert r["changed"] and r["len_nfc"] == r["len_raw"]
        else:
            # already NFC: fixed point
            assert not r["changed"] and r["len_nfc"] == r["len_raw"]


def test_whitened_coordinates_have_unit_variance_zero_mean(spark, sf_dir):
    """The point of whitening: along each retained axis the coordinates
    must come out mean≈0, variance≈1 (sample variance, n-1)."""
    rows = load_all()["ext_embedding_whiten"].builder(spark, sf_dir).collect()
    assert rows
    by_k = {}
    for r in rows:
        by_k.setdefault(r["k"], []).append(r["z"])
    assert set(by_k) == {0, 1}
    for k, zs in by_k.items():
        n = len(zs)
        mean = sum(zs) / n
        var = sum((z - mean) ** 2 for z in zs) / (n - 1)
        assert abs(mean) < 1e-3, (k, mean)
        assert abs(var - 1.0) < 1e-2, (k, var)


def test_group_by_all_matches_explicit_grouping(spark, sf_dir):
    q = load_all()["sql_group_by_all"].builder(spark, sf_dir)
    import os
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    exp = (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.floor(F.col("l_quantity") + F.lit(0.5))
                      .cast("long")).cast("long").alias("qty"),
                F.sum(F.floor(F.col("l_extendedprice") * F.lit(1e2)
                              + F.lit(0.5)).cast("long")).cast("long")
                .alias("rev_cents")))
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, exp.collect()))


def test_logreg_loss_decreases_from_ln2(spark, sf_dir):
    """Iteration 1 starts from w=0 (p=0.5 everywhere, loss=ln 2); each
    recorded post-update loss must improve on the last."""
    rows = sorted(load_all()["ext_logreg_train_step"]
                  .builder(spark, sf_dir).collect(),
                  key=lambda r: r["iter"])
    assert [r["iter"] for r in rows] == [1, 2]
    assert rows[0]["avg_loss"] < math.log(2.0)
    assert rows[1]["avg_loss"] <= rows[0]["avg_loss"]
    for r in rows:
        for c in ("w_bias", "w_logtok", "w_awl"):
            assert math.isfinite(r[c])


def test_calibration_bins_are_consistent(spark, sf_dir):
    rows = load_all()["ext_quality_calibration_bins"] \
        .builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_pred"] <= 1.0
        assert 0.0 <= r["obs_rate"] <= 1.0
        # the bin's mean prediction must lie inside the bin's interval
        assert r["bin"] / 10 - 1e-6 <= r["avg_pred"] <= (r["bin"] + 1) / 10 \
            + 1e-6 or r["bin"] == 9


def test_vocab_coverage_is_monotone_to_one(spark, sf_dir):
    rows = sorted(load_all()["ext_vocab_coverage_curve"]
                  .builder(spark, sf_dir).collect(),
                  key=lambda r: r["vocab_size"])
    assert rows
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)
    assert abs(cov[-1] - 1.0) < 1e-6          # full vocab covers everything


def test_feature_hash_vectors_are_unit_norm(spark, sf_dir):
    rows = load_all()["ext_feature_hash_embed"] \
        .builder(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], 0.0)
        by_doc[r["doc_id"]] += r["v"] ** 2
    for d, sq in by_doc.items():
        assert abs(sq - 1.0) < 1e-3, (d, sq)


def test_kmeans_update_moves_centroids_and_covers_corpus(spark, sf_dir):
    """Every non-seed-query vector lands in exactly one cluster, and on a
    non-degenerate corpus each recomputed centroid moves a positive
    distance from its seed."""
    rows = load_all()["ext_kmeans_update_step"] \
        .builder(spark, sf_dir).collect()
    assert rows
    import os
    n_emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).count()
    assert sum(r["n_members"] for r in rows) == n_emb - 1   # vec 0 excluded
    for r in rows:
        assert r["movement"] > 0.0


def test_theta_sketch_estimates_are_close_and_bounded(spark, sf_dir):
    """KMV estimates must land within the k=256 error envelope of the
    exact values, and the intersection can never exceed either side."""
    r = load_all()["agg_theta_sketch_intersect"] \
        .builder(spark, sf_dir).collect()[0]
    for est, exact in ((r["est_a"], r["exact_a"]), (r["est_b"], r["exact_b"])):
        if exact > r["k"]:
            assert abs(est - exact) / exact < 0.25, (est, exact)
        else:
            assert est >= 0
    assert r["exact_inter"] <= min(r["exact_a"], r["exact_b"])
    assert r["est_inter"] >= 0


def test_epoch_shuffle_orders_decorrelate(spark, sf_dir):
    """Independent hash permutations: Spearman rho near 0, mean
    displacement near n/3, max displacement bounded by n-1."""
    r = load_all()["ext_epoch_shuffle_audit"] \
        .builder(spark, sf_dir).collect()[0]
    assert abs(r["spearman_rho"]) < 0.1
    assert 0.22 < r["mean_disp_frac"] < 0.45
    assert r["max_disp"] <= r["n_docs"] - 1


def test_transpose_round_trips_the_aggregate(spark, sf_dir):
    """Each metric row of the transposed frame must carry the same values
    as the corresponding column of the original aggregate."""
    import os
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = (li.groupBy(F.col("l_returnflag").alias("f"))
           .agg(F.count(F.lit(1)).cast("double").alias("n")).orderBy("f"))
    flags = [r["f"] for r in agg.collect()]
    out = {r["key"]: r for r in load_all()["reshape_transpose"]
           .builder(spark, sf_dir).collect()}
    assert set(out) == {"n", "qty", "rev_cents"}
    orig = {r["f"]: r["n"] for r in agg.collect()}
    for f in flags:
        assert out["n"][f] == orig[f]
