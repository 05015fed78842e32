"""Operator-quality tests for the round-6 additions: each test plants data
with a KNOWN right answer and asserts the operator finds it — the semantic
check that hash-vs-oracle consistency alone cannot give (both engines could
agree on a wrong algorithm)."""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(max_examples=10, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# bigram LM: word order must matter
# ---------------------------------------------------------------------------

def test_bigram_lm_penalizes_shuffled_text(spark):
    """Fluent docs repeating the corpus's dominant word ORDER must score a
    lower avg negative-log-likelihood than a doc built from the same
    unigram mass in scrambled order — the capability the bigram
    conditioning adds over the unigram signal."""
    from project_etl_spark.operators.llm_text import ext_bigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over fox quick lazy jumps brown the"
    rows = [(i, "en", " ".join([fluent] * 4)) for i in range(8)]
    rows.append((100, "en", " ".join([scrambled] * 4)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    docs.createOrReplaceTempView("_planted_bigram")

    # drive the registered builder's algebra directly on the planted corpus
    import project_etl_spark.operators.llm_text as lt
    from project_etl_spark.io import table as _table
    orig = lt.table
    lt.table = lambda s, d, n: docs  # noqa: E731 - scoped monkeypatch
    try:
        out = {r["doc_id"]: r["avg_nll"]
               for r in ext_bigram_logprob(spark, "unused").collect()}
    finally:
        lt.table = orig
    fluent_scores = [v for k, v in out.items() if k < 100]
    assert out[100] > max(fluent_scores)


# ---------------------------------------------------------------------------
# MMR: must pull from both planted clusters
# ---------------------------------------------------------------------------

def test_mmr_diversify_spans_planted_clusters(spark):
    """Two tight embedding clusters, query equidistant: plain top-k is
    dominated by whichever cluster edges out the other, but the MMR
    selection must include members of BOTH clusters."""
    import numpy as np

    from project_etl_spark.operators import llm_similarity as ls

    rng_base = np.eye(64)
    a, b = rng_base[0], rng_base[1]
    rows = [(0, ((a + b) / 2).tolist(), 0)]          # the query
    for i in range(1, 9):                             # cluster A: near axis 0
        v = a * 100 + rng_base[2 + i] * (1 + i)
        rows.append((i, v.tolist(), 0))
    for i in range(9, 17):                            # cluster B: near axis 1
        v = b * 100 + rng_base[10 + i] * (1 + i)
        rows.append((i, v.tolist(), 1))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int")
    orig = ls.table
    ls.table = lambda s, d, n: emb
    try:
        sel = ls.ext_mmr_diversify(spark, "unused").collect()
    finally:
        ls.table = orig
    picked = {r["vec_id"] for r in sel}
    assert len(sel) == 5
    assert picked & set(range(1, 9)), "no member of cluster A selected"
    assert picked & set(range(9, 17)), "no member of cluster B selected"


# ---------------------------------------------------------------------------
# VAD: exact segments on a hand-built clip
# ---------------------------------------------------------------------------

def test_pcm_vad_finds_planted_segments():
    """A clip with frames [quiet, LOUD, LOUD, quiet, LOUD, quiet] must
    yield exactly two segments, longest 2, first active frame 1."""
    from project_etl_spark.operators.llm_multimodal import pcm_vad

    frames = []
    for pattern in (10, 1000, 1000, 10, 1000, 10):
        frames += [pattern] * 16
    n = len(frames)
    blob = f"PCM\n{n}\n".encode() + struct.pack(f"<{n}h", *frames)
    m = pcm_vad(blob)
    assert m["n_frames"] == 6
    assert m["n_active"] == 3
    assert m["n_segments"] == 2
    assert m["longest_segment"] == 2
    assert m["first_active_frame"] == 1


# ---------------------------------------------------------------------------
# pHash: identical content collides, content changes flip it
# ---------------------------------------------------------------------------

def test_ppm_phash_properties():
    from project_etl_spark.operators.llm_multimodal import ppm_phash

    def ppm(pixels: bytes, w: int, h: int) -> bytes:
        return f"P6\n{w} {h}\n255\n".encode() + pixels

    base = bytes((i * 7) % 256 for i in range(8 * 8 * 3))
    m1 = ppm_phash(ppm(base, 8, 8))
    m2 = ppm_phash(ppm(base, 8, 8))
    assert m1 == m2                                   # deterministic
    assert 0 <= m1["phash"] < (1 << 15)
    # exactly 7 of 15 AC bits are strictly above the integer median unless
    # ties collapse; for this pattern assert the documented invariant
    assert m1["n_set_bits"] == 7
    flipped = bytes([255 - base[0]]) + base[1:]
    m3 = ppm_phash(ppm(flipped, 8, 8))
    assert m3["dc_q"] != m1["dc_q"] or m3["phash"] != m1["phash"]


# ---------------------------------------------------------------------------
# token budget allocator: exact reconciliation on random inputs
# ---------------------------------------------------------------------------

@SETTINGS
@given(counts=st.lists(st.integers(1, 10**7), min_size=2, max_size=6))
def test_hamilton_allocation_reconciles(spark, counts):
    """Largest-remainder apportionment: allocations are non-negative and
    sum EXACTLY to the budget for arbitrary domain token counts."""
    import project_etl_spark.operators.llm_text as lt

    docs = spark.createDataFrame(
        [(i, f"l{i}", "w " * 3) for i, _ in enumerate(counts)],
        "doc_id long, lang string, text string")
    # monkeypatch table() AND the token counts: synthesize a corpus whose
    # per-lang ws token count equals the drawn integers exactly
    rows = []
    did = 0
    for i, c in enumerate(counts):
        # one doc with c single-char tokens is enough (ws_count == c)
        rows.append((did, f"l{i}", " ".join(["w"] * min(c, 1000))))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    orig = lt.table
    lt.table = lambda s, d, n: docs
    try:
        out = lt.ext_token_budget_allocator(spark, "unused").collect()
    finally:
        lt.table = orig
    total_tokens = sum(r["n_tokens"] for r in out)
    budget = total_tokens // 2
    allocs = [r["alloc_tokens"] for r in out]
    assert all(a >= 0 for a in allocs)
    assert sum(allocs) == budget


# ---------------------------------------------------------------------------
# incremental dedup: equals the full pair list restricted to delta x corpus
# ---------------------------------------------------------------------------

def test_incremental_dedup_matches_full_restriction(spark):
    """On a planted corpus, the incremental (delta vs corpus) pair list
    must equal the FULL jaccard_via_lsh output restricted to pairs with
    exactly one endpoint in the delta (doc_id % 19 == 2)."""
    import project_etl_spark.operators.llm_dedup as ld

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(30):
        w = list(base)
        if i % 7 == 0:
            w[3] = f"var{i}"     # near-dups of the base text
        rows.append((i, " ".join(w)))
    rows.append((40, "totally different words " * 6))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = ld.jaccard_via_lsh(docs, threshold=0.5).collect()
    expect = {(min(a, b), max(a, b))
              for a, b in ((r["doc_a"], r["doc_b"]) for r in full)
              if (a % 19 == 2) != (b % 19 == 2)}
    orig = ld.table
    ld.table = lambda s, d, n: docs
    try:
        got = {(min(r["new_doc_id"], r["corpus_doc_id"]),
                max(r["new_doc_id"], r["corpus_doc_id"]))
               for r in ld.ext_dedup_incremental(spark, "unused").collect()}
    finally:
        ld.table = orig
    assert got == expect and got, "incremental pair list diverged"


# ---------------------------------------------------------------------------
# event funnel: ORDER must matter, not mere existence
# ---------------------------------------------------------------------------

def test_event_funnel_requires_order(spark):
    """User A completes view->click->purchase in order; user B has all
    three stages but clicked BEFORE viewing; user C never clicks. Only A
    may reach stage 3, and B must be excluded at stage 2 (existence-only
    logic would wrongly count B)."""
    import datetime as dt

    import project_etl_spark.operators.sql_surface as ss

    t = lambda m: dt.datetime(2025, 1, 1, 12, m)  # noqa: E731
    rows = [
        (1, "A", "view", t(0)), (2, "A", "click", t(1)),
        (3, "A", "purchase", t(2)),
        (4, "B", "click", t(0)), (5, "B", "view", t(1)),
        (6, "B", "purchase", t(2)),
        (7, "C", "view", t(0)), (8, "C", "purchase", t(1)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp")
    orig = ss.table
    ss.table = lambda s, d, n: ev
    try:
        out = {r["stage"]: r["n_users"]
               for r in ss.agg_event_funnel(spark, "unused").collect()}
    finally:
        ss.table = orig
    assert out == {1: 3, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# HITS: planted authority must out-rank the tail
# ---------------------------------------------------------------------------

def test_hits_bipartite_planted_authority(spark):
    """x is touched by every hub, y/z by one each: after two exact integer
    passes x's authority must dominate and rank first."""
    import datetime as dt

    import project_etl_spark.operators.llm_curation as lc

    t0 = dt.datetime(2025, 1, 1)
    rows = [(1, "A", "x", t0), (2, "A", "y", t0), (3, "B", "x", t0),
            (4, "C", "x", t0), (5, "C", "z", t0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp")
    orig = lc.table
    lc.table = lambda s, d, n: ev
    try:
        out = {r["event_type"]: (r["authority_score"], r["auth_rank"])
               for r in lc.ext_hits_bipartite(spark, "unused").collect()}
    finally:
        lc.table = orig
    # h1: A=deg(x)+deg(y)=3+1=4, B=3, C=3+1=4 ; a2: x=4+3+4=11, y=4, z=4
    # (total order: a2 desc then event_type, so the y/z tie ranks 2 then 3)
    assert out == {"x": (11, 1), "y": (4, 2), "z": (4, 3)}


# ---------------------------------------------------------------------------
# soft dedup: group members survive at ~1/g, singletons untouched
# ---------------------------------------------------------------------------

def test_soft_downweight_planted_group(spark):
    """A 10-copy group must keep only members whose md5 bucket < 100
    (p=1/10 each), while singleton docs are always kept — and the census
    reconciles with a direct evaluation of the same bucket predicate."""
    import hashlib

    import project_etl_spark.operators.llm_dedup as ld

    rows = [(i, "identical boilerplate page body") for i in range(10)]
    rows += [(100 + i, f"unique document number {i} body") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig = ld.table
    ld.table = lambda s, d, n: docs
    try:
        out = {r["gsize"]: (r["n_groups"], r["n_docs"], r["n_kept"])
               for r in ld.ext_dedup_soft_downweight(spark, "unused").collect()}
    finally:
        ld.table = orig

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1000

    expect_kept_10 = sum(1 for i in range(10) if bucket(i) < 100)
    assert out[10] == (1, 10, expect_kept_10)
    assert out[1] == (5, 5, 5)          # singletons always survive
