"""Planted-data and invariant tests for the round-7 operators: the Bloom
admission gate (no-false-negative contract), per-domain cap, cross-shard
leakage matrix, and hard-negative mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_etl_spark.registry import load_all


def test_bloom_gate_never_misses_planted_dup(spark):
    """A Bloom filter has no false negatives: a delta doc whose text is an
    exact (normalized) copy of an archive doc MUST be flagged, whatever
    the filter's occupancy. Unrelated delta docs may be false positives
    but n_missed must be structurally zero."""
    from project_etl_spark.operators.llm_dedup import bloom_gate_census

    rows = [(i, f"archive document number {i} with unique words w{i}")
            for i in range(50)]
    rows.append((100, "Archive Document Number 7 With Unique Words W7".lower()))
    rows.append((101, "a brand new never seen document"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bloom_gate_census(docs, F.col("doc_id") >= 100).collect()[0]
    assert out["n_delta"] == 2
    assert out["n_true_dup"] == 1
    assert out["n_missed"] == 0          # the Bloom contract
    assert out["n_flagged"] >= 1         # the planted dup is flagged


def test_bloom_gate_fixture_confusion_is_consistent(spark, sf_dir):
    q = load_all()["ext_dedup_bloom_gate"].builder(spark, sf_dir)
    r = q.collect()[0]
    assert r["n_missed"] == 0
    assert r["n_flagged"] == r["n_true_dup"] + r["n_false_pos"] - r["n_missed"] \
        or r["n_flagged"] == r["n_true_dup"] + r["n_false_pos"]
    assert r["n_flagged"] <= r["n_delta"]


def test_domain_cap_census(spark, sf_dir):
    rows = load_all()["ext_domain_cap"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(r["n_docs"], 15)
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]


def test_domain_cap_is_deterministic_under_repartition(spark, sf_dir):
    """The hash-rank selection must not depend on physical layout."""
    b = load_all()["ext_domain_cap"].builder
    a = sorted(map(tuple, b(spark, sf_dir).collect()))
    # same query over a repartitioned scan via a temp view is not directly
    # expressible through the builder; re-running must at least be stable
    assert a == sorted(map(tuple, b(spark, sf_dir).collect()))


def test_cross_shard_matrix_shape(spark, sf_dir):
    rows = load_all()["ext_cross_shard_dupes"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["shard_a"] < r["shard_b"] <= 3
        assert r["n_shared"] > 0
        assert 0.0 <= r["containment"] <= 1.0


def test_cross_shard_finds_planted_leak(spark):
    """Two docs in different shards sharing one 5-gram surface as exactly
    one (shard_a, shard_b) cell counting that n-gram."""
    from project_etl_spark.operators.llm_dedup import word_ngrams

    rows = [(0, "alpha beta gamma delta epsilon zeta"),      # shard 0
            (1, "eta theta iota kappa lambda mu"),           # shard 1
            (5, "alpha beta gamma delta epsilon omega")]     # shard 1, leak
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    gr = (word_ngrams(docs, 5)
          .select((F.col("doc_id") % 4).alias("shard"), "sh").distinct())
    a = gr.select(F.col("shard").alias("sa"), "sh")
    b = gr.select(F.col("shard").alias("sb"), "sh")
    shared = (a.join(b, "sh").where(F.col("sa") < F.col("sb"))
              .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("n")))
    got = {(r["sa"], r["sb"]): r["n"] for r in shared.collect()}
    assert got == {(0, 1): 1}   # exactly the planted 5-gram leak


def test_hard_negatives_contract(spark, sf_dir):
    """Every mined negative carries a label different from its query's,
    ranks are 1..5 per query in similarity order, and the top negative is
    the most similar cross-label vector."""
    rows = load_all()["ext_hard_negatives"].builder(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    from project_etl_spark.io import table
    labels = {r["vec_id"]: r["label"]
              for r in table(spark, sf_dir, "embeddings")
              .select("vec_id", "label").collect()}
    for qid, negs in by_q.items():
        assert sorted(n["rnk"] for n in negs) == list(range(1, len(negs) + 1))
        sims = [n["cosine_sim"] for n in sorted(negs, key=lambda n: n["rnk"])]
        assert sims == sorted(sims, reverse=True)
        for n in negs:
            assert labels[n["neg_vec_id"]] != labels[qid]
            assert n["neg_label"] == labels[n["neg_vec_id"]]


def test_cms_estimate_never_undercounts(spark, sf_dir):
    """Count-min's structural guarantee: collisions only ADD, so the
    estimate is >= the exact count for every reported token."""
    rows = load_all()["ext_heavy_hitters_cms"].builder(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_count"] >= r["true_count"]
        assert r["overcount"] == r["est_count"] - r["true_count"] >= 0


def test_knn_graph_rank_orders_similarity(spark, sf_dir):
    """Per-vector edges must be in non-increasing similarity order and
    never self-loop."""
    rows = load_all()["ext_knn_graph_lsh"].builder(spark, sf_dir).collect()
    assert rows
    by_v = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        by_v.setdefault(r["vec_id"], []).append((r["rnk"], r["cosine_sim"]))
    for edges in by_v.values():
        edges.sort()
        sims = [s for _, s in edges]
        assert sims == sorted(sims, reverse=True)
        assert [r for r, _ in edges] == list(range(1, len(edges) + 1))


def test_label_spread_preserves_seeds_and_provenance(spark, sf_dir):
    """Seeds keep their true label at round 0; propagated rows carry a
    positive vote count; nobody is assigned twice."""
    from project_etl_spark.io import table

    rows = load_all()["ext_label_spread_knn"].builder(spark, sf_dir).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    truth = {r["vec_id"]: r["label"]
             for r in table(spark, sf_dir, "embeddings").collect()}
    for r in rows:
        if r["src_round"] == 0:
            assert r["vec_id"] % 5 == 0
            assert r["label_pred"] == truth[r["vec_id"]]
            assert r["n_votes"] == 0
        else:
            assert r["vec_id"] % 5 != 0
            assert r["n_votes"] >= 1
