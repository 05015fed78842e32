"""Round-12 sixth-wave operator tests: planted fixtures checked against
pure-Python references for the retrieval (RBP / bpref) and spatial
(Moran-Geary / Getis-Ord) closes."""

from __future__ import annotations

import math


def _drive(spark, sf_dir, module, fn, tables):
    orig = module.table
    module.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        module.table = orig


# ---------------------------------------------------------------------------
# ext_rbp_eval / ext_bpref_eval — planted rankings on a one-query panel
# ---------------------------------------------------------------------------

def _planted_embeddings(spark, cosines, labels, q_label=1):
    """vec_id 0 is the only panel query (unit vector e1); candidate k
    (vec_id = k) is [c_k, sqrt(1-c_k^2), 0, ...] so its cosine to the
    query is EXACTLY c_k. labels[k-1] gives candidate k's label."""
    rows = [(0, [1.0] + [0.0] * 63, q_label)]
    for k, (c, lab) in enumerate(zip(cosines, labels), start=1):
        vec = [float(c), math.sqrt(max(0.0, 1.0 - c * c))] + [0.0] * 62
        rows.append((k, vec, lab))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


_RBP_W = [8 ** (k - 1) * 10 ** (12 - (k - 1)) for k in range(1, 11)]


def test_rbp_planted_ranks(spark, sf_dir):
    """12 candidates with strictly decreasing cosine; relevant (label 1)
    planted at ranks 1, 3 and 11 — rank 11 must NOT contribute, so
    rbp_pico = (w1 + w3)/5 exactly."""
    import project_etl_spark.operators.llm_curation as lc

    cos = [round(0.95 - 0.05 * k, 2) for k in range(12)]
    labels = [1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 1, 2]
    emb = _planted_embeddings(spark, cos, labels)
    r = _drive(spark, sf_dir, lc, lc.ext_rbp_eval, {"embeddings": emb})
    assert len(r) == 1 and r[0]["q_id"] == 0
    assert r[0]["n_rel_top10"] == 2
    assert r[0]["rbp_pico"] == (_RBP_W[0] + _RBP_W[2]) // 5


def test_rbp_all_relevant_hits_ceiling(spark, sf_dir):
    """All top-10 relevant: rbp = (1-p)(1 + ... + p^9) = 1 - p^10, so
    rbp_pico = 1e12 - 0.8^10 * 1e12 = 1e12 - 8^10 * 100."""
    import project_etl_spark.operators.llm_curation as lc

    cos = [round(0.95 - 0.05 * k, 2) for k in range(10)]
    emb = _planted_embeddings(spark, cos, [1] * 10)
    r = _drive(spark, sf_dir, lc, lc.ext_rbp_eval, {"embeddings": emb})
    assert r[0]["rbp_pico"] == sum(_RBP_W) // 5 == 10 ** 12 - 8 ** 10 * 100


def test_bpref_planted_ranks(spark, sf_dir):
    """Relevant at ranks 2 and 5 of 12 candidates (R = 2, N = 10):
    terms (1 - min(1,2)/min(2,10)) and (1 - min(3,2)/min(2,10)) =
    0.5 and 0.0 — mirrored through the micro-floor close."""
    import project_etl_spark.operators.llm_curation as lc

    cos = [round(0.95 - 0.05 * k, 2) for k in range(12)]
    labels = [2, 1, 2, 2, 1, 2, 2, 2, 2, 2, 2, 2]
    emb = _planted_embeddings(spark, cos, labels)
    r = _drive(spark, sf_dir, lc, lc.ext_bpref_eval, {"embeddings": emb})
    assert len(r) == 1
    row = r[0]
    assert (row["r_corpus"], row["n_rel_top10"]) == (2, 2)
    t1 = math.floor((1.0 - min(1, 2) * 1.0 / min(2, 10)) * 1e6 + 0.5)
    t2 = math.floor((1.0 - min(3, 2) * 1.0 / min(2, 10)) * 1e6 + 0.5)
    assert row["bpref10_micro"] == math.floor((t1 + t2) * 1.0 / 2 + 0.5)


def test_bpref_perfect_front_load_is_one(spark, sf_dir):
    """Both relevant candidates ranked 1-2: no nonrelevant above either,
    bpref = 1.0 exactly."""
    import project_etl_spark.operators.llm_curation as lc

    cos = [round(0.95 - 0.05 * k, 2) for k in range(12)]
    labels = [1, 1] + [2] * 10
    emb = _planted_embeddings(spark, cos, labels)
    r = _drive(spark, sf_dir, lc, lc.ext_bpref_eval, {"embeddings": emb})
    assert r[0]["bpref10_micro"] == 1_000_000


# ---------------------------------------------------------------------------
# ext_spatial_autocorr / ext_getis_ord_hotspots
# ---------------------------------------------------------------------------

def _cells_of(user_ids):
    """Mirror the shared SQL's deterministic lat/lon + 0.05-deg grid."""
    from collections import Counter

    cells = Counter()
    for uid in set(user_ids):
        lat = (40 + uid % 5) + ((uid * 37) % 1000) / 1e4
        lon = (-100 + uid % 7) + ((uid * 73) % 1000) / 1e4
        cells[(math.floor(lat / 5e-2), math.floor(lon / 5e-2))] += 1
    return cells


_OFF8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _spatial_ref(user_ids):
    xs = _cells_of(user_ids)
    n = len(xs)
    sx = sum(xs.values())
    u = {k: n * v - sx for k, v in xs.items()}
    wd, cr, df = 0, 0, 0
    for (gy, gx), ua in u.items():
        for dy, dx in _OFF8:
            ub = u.get((gy + dy, gx + dx))
            if ub is not None:
                wd += 1
                cr += ua * ub
                df += (ua - ub) ** 2
    den = sum(v * v for v in u.values())
    if wd == 0 or den == 0:
        return None
    return (n, wd,
            math.floor(n * 1.0 / wd * float(cr) / float(den) * 1e6 + 0.5),
            math.floor((n - 1.0) / (2.0 * wd) * float(df) / float(den)
                       * 1e6 + 0.5))


def _events_df(spark, user_ids):
    return spark.createDataFrame([(u,) for u in user_ids], "user_id long")


def test_spatial_autocorr_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    uids = list(range(1, 400))
    r = _drive(spark, sf_dir, lc, lc.ext_spatial_autocorr,
               {"events": _events_df(spark, uids)})[0]
    ref = _spatial_ref(uids)
    assert (r["n_cells"], r["w_dir"], r["moran_i_micro"],
            r["geary_c_micro"]) == ref


def test_spatial_autocorr_no_neighbors_guard(spark, sf_dir):
    """A single user occupies one cell: no neighbor pairs and zero
    variance — the guard must emit 0 rows, not divide by zero."""
    import project_etl_spark.operators.llm_curation as lc

    out = _drive(spark, sf_dir, lc, lc.ext_spatial_autocorr,
                 {"events": _events_df(spark, [7, 7, 7])})
    assert out == []


def test_getis_ord_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    uids = list(range(1, 400))
    got = [(r["gy"], r["gx"], r["wi"], r["ai"], r["gi_micro"])
           for r in _drive(spark, sf_dir, lc, lc.ext_getis_ord_hotspots,
                           {"events": _events_df(spark, uids)})]
    xs = _cells_of(uids)
    n = len(xs)
    sx = sum(xs.values())
    sxx = sum(v * v for v in xs.values())
    ref = []
    for (gy, gx) in xs:
        present = [xs.get((gy + dy, gx + dx))
                   for dy, dx in _OFF8 + [(0, 0)]]
        present = [p for p in present if p is not None]
        wi, ai = len(present), sum(present)
        if n > wi and n > 1 and n * sxx - sx * sx > 0:
            gi = ((n * ai - sx * wi)
                  / (math.sqrt(n * float(sxx) - sx * 1.0 * sx)
                     * math.sqrt((n * wi - wi * 1.0 * wi) / (n - 1.0))))
            ref.append((gy, gx, wi, ai, math.floor(gi * 1e6 + 0.5)))
    ref.sort(key=lambda t: (-t[4], t[0], t[1]))
    assert got == ref[:5]
    # top row really is the densest star neighborhood among the top-5
    assert got[0][4] == max(t[4] for t in ref)
