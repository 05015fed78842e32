"""Round-12 operator tests: planted fixtures checked against pure-Python
textbook references for the new queries. The differential suite proves
Spark == DuckDB; these prove both equal the TEXTBOOK (same-on-both
semantic bugs are invisible to the hash)."""

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
# ext_adamic_adar_capped — tail semantics on a planted edge list
# ---------------------------------------------------------------------------

def _aa_capped_reference(edges, cap):
    """Brute-force deg-capped AA over an undirected edge list (u < v):
    wedges count only through middle vertices of degree <= cap; the
    weight of a counted middle is its TRUE degree."""
    from collections import defaultdict

    nb = defaultdict(set)
    for u, v in edges:
        nb[u].add(v)
        nb[v].add(u)
    es = {tuple(sorted(e)) for e in edges}
    scores = {}
    nodes = sorted(nb)
    for i, a in enumerate(nodes):
        for c in nodes[i + 1:]:
            if (a, c) in es:
                continue
            common = {b for b in nb[a] & nb[c] if len(nb[b]) <= cap}
            if not common:
                continue
            micro = sum(math.floor(1e6 / math.log(len(nb[b])) + 0.5)
                        for b in common)
            scores[(a, c)] = (len(common), micro)
    return scores


def _run_capped_tail(spark, edges, cap):
    import project_etl_spark.operators.llm_curation as lc

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    df.createOrReplaceTempView("aac_cands")
    return {(r["doc_a"], r["doc_b"]): (r["n_common"], r["aa_micro"])
            for r in spark.sql(
                "WITH " + lc._AA_CAPPED_TAIL.format(cap=cap)
                .replace("FROM cands", "FROM aac_cands")).collect()}


def test_adamic_adar_capped_drops_hub_wedges(spark, sf_dir):
    """Hub 0 with 40 leaves (deg 40 > cap 32) plus a shared low-degree
    middle 100 between leaves 1 and 2: the ONLY surviving wedge is the
    one through 100 — every hub-mediated pair must vanish."""
    edges = [(0, k) for k in range(1, 41)] + [(1, 100), (2, 100)]
    got = _run_capped_tail(spark, edges, cap=32)
    ref = _aa_capped_reference(edges, cap=32)
    top = dict(sorted(ref.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15])
    assert got == top
    # (1, 2) survives via middle 100 only: n_common == 1, weight from
    # deg(100) == 2 (NOT from the hub)
    assert got[(1, 2)] == (1, math.floor(1e6 / math.log(2) + 0.5))
    # a pair whose only common neighbor is the hub is gone
    assert (3, 4) not in got


def test_adamic_adar_capped_equals_uncapped_below_cap(spark, sf_dir):
    """On a graph whose max degree is under the cap the capped census
    must equal the uncapped one wedge for wedge."""
    import project_etl_spark.operators.llm_curation as lc

    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (3, 4), (5, 6)]
    got = _run_capped_tail(spark, edges, cap=32)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    df.createOrReplaceTempView("aa_cands")
    uncapped = {(r["doc_a"], r["doc_b"]): (r["n_common"], r["aa_micro"])
                for r in spark.sql(
                    "WITH " + lc._AA_TAIL
                    .replace("FROM cands", "FROM aa_cands")).collect()}
    assert got == uncapped


def test_adamic_adar_capped_registered_cap_bounds_cost(spark, sf_dir):
    """The registered query (cap pinned at _AA_DEG_CAP) must run on the
    real corpus and agree with ext_adamic_adar wherever both emit a
    pair whose middles are all under the cap — sanity that wiring the
    shared tail through the temp view kept the semantics."""
    import project_etl_spark.operators.llm_curation as lc

    assert lc._AA_DEG_CAP == 32
    rows = lc.ext_adamic_adar_capped(spark, sf_dir).collect()
    assert len(rows) <= 15
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_common"] >= 1
        assert r["aa_micro"] >= r["n_common"] * math.floor(
            1e6 / math.log(32) + 0.5)  # every counted middle has deg<=32


# ---------------------------------------------------------------------------
# ext_bartlett_test
# ---------------------------------------------------------------------------

def test_bartlett_two_planted_groups(spark, sf_dir):
    """lang a = [1,2,3] (s2=1), lang b = [2,4,6,8] (s2=20/3): mirror the
    SQL's quantize-then-sum order exactly against the textbook close."""
    import project_etl_spark.operators.llm_curation as lc

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (2, 4, 6, 8)]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_bartlett_test,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_groups"] == 2 and r["n_rows"] == 7 and r["df_within"] == 5
    s2a, s2b = 1.0, (120.0 - 400.0 / 4) / 3.0
    sln = (math.floor(2.0 * math.log(s2a) * 1e6 + 0.5)
           + math.floor(3.0 * math.log(s2b) * 1e6 + 0.5))
    ssw_deci = (math.floor(2.0 * s2a * 10 + 0.5)
                + math.floor(3.0 * s2b * 10 + 0.5))
    invdf = math.floor(1e9 / 2 + 0.5) + math.floor(1e9 / 3 + 0.5)
    t_unc = 5 * math.log(ssw_deci / 1e1 / 5) - sln / 1e6
    c = 1.0 + (invdf / 1e9 - 1.0 / 5) / (3.0 * 1.0)
    assert r["t_uncorrected_milli"] == math.floor(t_unc * 1e3 + 0.5)
    assert r["chi2_milli"] == math.floor(t_unc / c * 1e3 + 0.5)
    assert r["df_chi2"] == 1


def test_bartlett_drops_zero_variance_groups(spark, sf_dir):
    """A constant group (variance 0) must be excluded by the integer
    n*q - s^2 > 0 predicate, not crash the log."""
    import project_etl_spark.operators.llm_curation as lc

    rows = ([("a", v) for v in (1, 2, 3)] + [("b", v) for v in (2, 4, 6)]
            + [("c", 5), ("c", 5), ("c", 5)])
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_bartlett_test,
                 {"documents": docs})
    assert len(out) == 1 and out[0]["n_groups"] == 2
    assert out[0]["n_rows"] == 6  # the constant group never enters


# ---------------------------------------------------------------------------
# ext_theils_u / ext_goodman_kruskal_lambda
# ---------------------------------------------------------------------------

def test_theils_u_perfect_and_independent(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # source determines lang exactly -> U = 1 in every direction
    rows = [("a", "s1", 1)] * 5 + [("b", "s2", 1)] * 5
    docs = spark.createDataFrame(rows, "lang string, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_theils_u, {"documents": docs})[0]
    assert r["u_lang_given_source_micro"] == 1000000
    assert r["u_source_given_lang_micro"] == 1000000
    assert r["u_symmetric_micro"] == 1000000

    # independent uniform 2x2 -> MI = 0 -> U = 0
    rows = [(lg, s, 1) for lg in ("a", "b") for s in ("s1", "s2")
            for _ in range(3)]
    docs = spark.createDataFrame(rows, "lang string, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_theils_u, {"documents": docs})[0]
    assert r["mi_nano"] == 0
    assert r["u_lang_given_source_micro"] == 0
    assert r["u_symmetric_micro"] == 0


def test_gk_lambda_textbook(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # source determines lang -> lambda(lang|source) = 1; margins equal
    rows = [("a", "s1", 1)] * 5 + [("b", "s2", 1)] * 5
    docs = spark.createDataFrame(rows, "lang string, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_goodman_kruskal_lambda,
               {"documents": docs})[0]
    assert r["lambda_lang_given_source_micro"] == 1000000
    assert r["lambda_source_given_lang_micro"] == 1000000

    # modes never move -> lambda = 0 despite real association:
    # both sources are majority-'a' (3:2 and 2:1)
    rows = ([("a", "s1", 1)] * 3 + [("b", "s1", 1)] * 2
            + [("a", "s2", 1)] * 2 + [("b", "s2", 1)] * 1)
    docs = spark.createDataFrame(rows, "lang string, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_goodman_kruskal_lambda,
               {"documents": docs})[0]
    # sum_smax = 3 + 2 = 5, max_l = n('a') = 5 -> lambda = 0
    assert r["lambda_lang_given_source_micro"] == 0


# ---------------------------------------------------------------------------
# ext_somers_d
# ---------------------------------------------------------------------------

def test_somers_d_bruteforce(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # one lang, four sources; x = total chars, y = doc count per source:
    # totals x = [10, 20, 20, 40], counts y = [1, 2, 2, 4]
    rows = []
    plan = {"s1": ([10], ), "s2": ([12, 8], ), "s3": ([15, 5], ),
            "s4": ([10, 10, 10, 10], )}
    for s, (chars,) in plan.items():
        for ch in chars:
            rows.append(("en", s, ch))
    docs = spark.createDataFrame(rows, "lang string, source string, "
                                       "n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_somers_d, {"documents": docs})
    assert len(out) == 1
    r = out[0]
    m = {"s1": (10, 1), "s2": (20, 2), "s3": (20, 2), "s4": (40, 4)}
    pairs = [(a, b) for i, a in enumerate(sorted(m)) for b in sorted(m)[i+1:]]
    nc = nd = tx = ty = 0
    for a, b in pairs:
        dx = m[a][0] - m[b][0]
        dy = m[a][1] - m[b][1]
        if dx * dy > 0:
            nc += 1
        if dx * dy < 0:
            nd += 1
        if dx == 0:
            tx += 1
        if dy == 0:
            ty += 1
    n0 = len(pairs)
    assert (r["n_pairs"], r["n_conc"], r["n_disc"]) == (n0, nc, nd)
    assert r["somers_d_y_given_x_micro"] == math.floor(
        (nc - nd) * 1e6 / (n0 - tx) + 0.5)
    assert r["somers_d_x_given_y_micro"] == math.floor(
        (nc - nd) * 1e6 / (n0 - ty) + 0.5)
    # the tie structure differs (one x-tie, one y-tie at different pairs
    # would break symmetry; here both have exactly one) — directional
    # denominators are n0 - ties on the INDEPENDENT axis
    assert tx == 1 and ty == 1


# ---------------------------------------------------------------------------
# ext_durbin_watson / ext_pettitt_test — day-series semantics
# ---------------------------------------------------------------------------

def _orders_from_day_counts(spark, counts):
    import datetime

    rows = []
    k = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((k, datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(days=d, hours=1)))
            k += 1
    return spark.createDataFrame(rows, "o_orderkey long, "
                                       "o_orderdate timestamp")


def test_durbin_watson_matches_python_reference(spark, sf_dir):
    """Mirror the SQL's exact pipeline (OLS close, per-day milli
    residuals, consecutive-pair numerator) in pure Python."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16]
    orders = _orders_from_day_counts(spark, counts)
    r = _drive(spark, sf_dir, lc, lc.ext_durbin_watson,
               {"orders": orders})[0]
    n = len(counts)
    ds = list(range(n))
    sd, sc = sum(ds), sum(counts)
    sdc = sum(d * c for d, c in zip(ds, counts))
    sdd = sum(d * d for d in ds)
    b = (n * 1.0 * sdc - sd * 1.0 * sc) / (n * 1.0 * sdd - sd * 1.0 * sd)
    a = (sc - b * sd) / n
    em = [math.floor((c - a - b * d) * 1e3 + 0.5)
          for d, c in zip(ds, counts)]
    den = sum(e * e for e in em)
    num = sum((em[i] - em[i - 1]) ** 2 for i in range(1, n))
    assert r["n_days"] == n and r["n_pairs"] == n - 1
    assert r["dw_milli"] == math.floor(num * 1e3 / den + 0.5)
    assert r["rho1_approx_milli"] == math.floor(
        (1.0 - num * 1.0 / den / 2.0) * 1e3 + 0.5)
    # alternating residuals around a rising trend -> strong negative
    # serial correlation -> DW well above 2
    assert r["dw_milli"] > 3000


def test_durbin_watson_perfect_trend_guarded(spark, sf_dir):
    """An exactly linear series has zero residuals — the den > 0 guard
    must return 0 rows, not divide by zero."""
    import project_etl_spark.operators.llm_curation as lc

    orders = _orders_from_day_counts(spark, [2, 4, 6, 8, 10])
    out = _drive(spark, sf_dir, lc, lc.ext_durbin_watson,
                 {"orders": orders})
    assert out == []


def test_pettitt_step_change(spark, sf_dir):
    """5 days at count 1 then 5 days at count 3: K = 25 at the 5th day,
    with the doubled-midrank algebra checked by hand (2r = 6 and 16)."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [1] * 5 + [3] * 5
    orders = _orders_from_day_counts(spark, counts)
    r = _drive(spark, sf_dir, lc, lc.ext_pettitt_test,
               {"orders": orders})[0]
    # U_t = 6t - 11t = -5t for t <= 5 -> |U_5| = 25 is the max
    assert r["n_days"] == 10
    assert r["k_stat"] == 25 and r["u_at_k"] == -25
    assert r["changepoint_day"] == 4  # 5th day, 0-based epoch-day index
    n = 10.0
    p = 2.0 * math.exp(-6.0 * 25 * 25 / (n * n * n + n * n))
    assert r["p_approx_micro"] == math.floor(p * 1e6 + 0.5)


def test_pettitt_tie_breaks_on_earliest_day(spark, sf_dir):
    """A symmetric bump gives |U| ties — the argmax must take the
    earliest day."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [1, 1, 3, 3, 1, 1]
    orders = _orders_from_day_counts(spark, counts)
    r = _drive(spark, sf_dir, lc, lc.ext_pettitt_test,
               {"orders": orders})[0]
    # brute-force the sweep with midranks
    vals = sorted(counts)
    import collections
    cnt = collections.Counter(counts)
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n = len(counts)
    s = 0
    best = None
    for t, c in enumerate(counts, start=1):
        if t == n:
            break
        s += r2[c]
        ut = s - t * (n + 1)
        key = (-abs(ut), t - 1)
        if best is None or key < best[0]:
            best = (key, ut, t - 1)
    assert r["k_stat"] == abs(best[1])
    assert r["changepoint_day"] == best[2]


# ---------------------------------------------------------------------------
# ext_err_eval — cascade semantics on a planted panel
# ---------------------------------------------------------------------------

def test_err_cascade_planted_ranking(spark, sf_dir):
    """Query 0 (label 0) against candidates ranked rel, irrel, rel:
    ERR = 1/(1*2) + 1/(3*4) exactly (dyadic terms)."""
    import project_etl_spark.operators.llm_curation as lc

    rows = [
        (0, [1.0, 0.0], 0),     # the query (vec_id % 100 == 0)
        (1, [2.0, 0.0], 0),     # cos 1.0    -> rank 1, relevant
        (2, [1.0, 1.0], 1),     # cos 0.7071 -> rank 2, irrelevant
        (3, [1.0, 2.0], 0),     # cos 0.4472 -> rank 3, relevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                      "label int")
    out = _drive(spark, sf_dir, lc, lc.ext_err_eval, {"embeddings": emb})
    assert len(out) == 1
    r = out[0]
    assert r["q_id"] == 0 and r["n_rel_top10"] == 2
    expect = (math.floor(1e6 / (1 * 2) + 0.5)
              + math.floor(1e6 / (3 * 4) + 0.5))
    assert r["err10_micro"] == expect
    # front-loading dominates: the rank-3 relevant adds only ~83k micro
    assert r["err10_micro"] < 2 * math.floor(1e6 / 2 + 0.5)


# ---------------------------------------------------------------------------
# ext_local_clustering — tail semantics on a planted edge list
# ---------------------------------------------------------------------------

def test_local_clustering_triangle_plus_pendant(spark, sf_dir):
    """Triangle 1-2-3 with pendant 3-4: C1 = C2 = 1, C3 = 1/3, node 4
    (deg 1) excluded."""
    import project_etl_spark.operators.llm_curation as lc

    edges = [(1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    df.createOrReplaceTempView("lcc_cands")
    got = {r["node"]: r for r in spark.sql(
        "WITH " + lc._LCC_TAIL.replace("FROM cands", "FROM lcc_cands")
    ).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["c_micro"] == 1000000 and got[1]["n_tri"] == 1
    assert got[2]["c_micro"] == 1000000
    assert got[3]["deg"] == 3 and got[3]["n_tri"] == 1
    assert got[3]["c_micro"] == math.floor(2e6 / 6 + 0.5)


# ---------------------------------------------------------------------------
# ext_diebold_mariano
# ---------------------------------------------------------------------------

def test_diebold_mariano_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [10, 12, 9, 14, 11, 13, 10, 12, 9, 15, 11, 14, 10, 13]
    orders = _orders_from_day_counts(spark, counts)
    r = _drive(spark, sf_dir, lc, lc.ext_diebold_mariano,
               {"orders": orders})[0]
    ds = []
    for t in range(7, len(counts)):
        e1 = abs(counts[t] - counts[t - 1])
        e7 = abs(counts[t] - counts[t - 7])
        ds.append(e1 - e7)
    n = len(ds)
    sd, sdd = sum(ds), sum(d * d for d in ds)
    assert r["n_days"] == n and r["sum_loss_diff"] == sd
    assert r["mean_loss_diff_milli"] == math.floor(sd * 1e3 / n + 0.5)
    mean = sd * 1.0 / n
    dm = mean / math.sqrt((sdd * 1.0 / n - mean * mean) / n)
    assert r["dm_milli"] == math.floor(dm * 1e3 + 0.5)


def test_diebold_mariano_constant_diff_guarded(spark, sf_dir):
    """If both forecasters always err identically the variance of the
    loss differential is 0 — the integer guard returns 0 rows."""
    import project_etl_spark.operators.llm_curation as lc

    # strictly increasing by 1: |e1| = 1, |e7| = 7 every day -> d = -6
    counts = list(range(10, 25))
    orders = _orders_from_day_counts(spark, counts)
    out = _drive(spark, sf_dir, lc, lc.ext_diebold_mariano,
                 {"orders": orders})
    assert out == []


# ---------------------------------------------------------------------------
# ext_kuiper_test
# ---------------------------------------------------------------------------

def test_kuiper_v_sums_both_one_sided_gaps(spark, sf_dir):
    """en = [1,1,4], rest = [2,3,3]: F1 leads low, F2 leads mid — KS
    sees only one side, Kuiper adds both."""
    import project_etl_spark.operators.llm_curation as lc

    rows = ([("en", v) for v in (1, 1, 4)]
            + [("zh", v) for v in (2, 3, 3)])
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_kuiper_test,
               {"documents": docs})[0]
    import bisect
    a, b = sorted([1, 1, 4]), sorted([2, 3, 3])
    vals = sorted(set(a) | set(b))
    dplus = max(bisect.bisect_right(a, v) / 3 - bisect.bisect_right(b, v) / 3
                for v in vals)
    dminus = max(bisect.bisect_right(b, v) / 3 - bisect.bisect_right(a, v) / 3
                 for v in vals)
    assert r["n1"] == 3 and r["n2"] == 3
    assert r["d_plus_micro"] == math.floor(dplus * 1e6 + 0.5)
    assert r["d_minus_micro"] == math.floor(dminus * 1e6 + 0.5)
    assert r["v_kuiper_micro"] == math.floor((dplus + dminus) * 1e6 + 0.5)
    # both sides contribute: V strictly exceeds each one-sided gap
    assert r["v_kuiper_micro"] > r["d_plus_micro"]
    assert r["v_kuiper_micro"] > r["d_minus_micro"]


# ---------------------------------------------------------------------------
# ext_bowker_test
# ---------------------------------------------------------------------------

def test_bowker_asymmetric_flow(spark, sf_dir):
    """6 users flow a->b, 2 users b->a, 1 user a->a: chi2 has one
    off-diagonal pair (6-2)^2/8 = 2, df = 1."""
    import datetime
    import project_etl_spark.operators.llm_curation as lc

    rows = []
    eid = 0

    def add_user(uid, first, last):
        nonlocal eid
        rows.append((eid, uid, first,
                     datetime.datetime(1970, 1, 1, 1)))
        eid += 1
        rows.append((eid, uid, last,
                     datetime.datetime(1970, 1, 2, 1)))
        eid += 1

    for u in range(6):
        add_user(u, "a", "b")
    for u in range(6, 8):
        add_user(u, "b", "a")
    add_user(8, "a", "a")
    ev = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "event_type string, ts timestamp")
    r = _drive(spark, sf_dir, lc, lc.ext_bowker_test, {"events": ev})[0]
    assert r["df"] == 1 and r["n_offdiag"] == 8
    assert r["chi2_micro"] == math.floor(16.0 / 8 * 1e6 + 0.5)
    assert r["chi2_milli"] == 2000


def test_bowker_first_last_tie_break(spark, sf_dir):
    """Two events at the SAME timestamp: event_id must break the tie
    (smaller id = first, larger id = last)."""
    import datetime
    import project_etl_spark.operators.llm_curation as lc

    t = datetime.datetime(1970, 1, 1, 1)
    rows = [(1, 0, "x", t), (2, 0, "y", t),
            (3, 1, "y", t), (4, 1, "x", t)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "event_type string, ts timestamp")
    r = _drive(spark, sf_dir, lc, lc.ext_bowker_test, {"events": ev})[0]
    # user 0: x->y, user 1: y->x — perfectly symmetric -> chi2 = 0
    assert r["df"] == 1 and r["chi2_micro"] == 0


# ---------------------------------------------------------------------------
# ext_hodges_lehmann
# ---------------------------------------------------------------------------

def test_hodges_lehmann_weighted_median_of_differences(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # en values {10 x2, 20 x1}, rest {1, 2}: diffs 8(w2) 9(w2) 18 19
    rows = ([("en", 10), ("en", 10), ("en", 20)]
            + [("zh", 1), ("zh", 2)])
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_hodges_lehmann,
               {"documents": docs})[0]
    assert r["n_pairs"] == 6
    # sorted diffs: 8,8,9,9,18,19 -> lower median (rank 3) = 9,
    # upper (rank 4) = 9
    assert (r["hl_lower"], r["hl_upper"]) == (9, 9)
    assert r["hl_shift_milli"] == 9000


def test_hodges_lehmann_even_split_averages(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # en {4, 8}, rest {1, 3}: diffs 1, 3, 5, 7 -> medians 3 and 5 -> 4.0
    rows = [("en", 4), ("en", 8), ("zh", 1), ("zh", 3)]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_hodges_lehmann,
               {"documents": docs})[0]
    assert (r["hl_lower"], r["hl_upper"]) == (3, 5)
    assert r["hl_shift_milli"] == 4000


# ---------------------------------------------------------------------------
# win_holt_winters — recursion semantics
# ---------------------------------------------------------------------------

def _hw_reference(counts):
    """Pure-Python replica of the shared recursion (alpha=beta=gamma=1/2,
    season 7, zero-seasonal init, milli floors)."""
    out = []
    l = 1000 * counts[0]
    b = 0
    s = [0] * 7  # seasonals of days (t-6 .. t), post-state
    out.append((counts[0], l, b, s[6], l + b + s[0]))
    for x in counts[1:]:
        lv = math.floor((1000 * x - s[0] + l + b) / 2.0)
        bv = math.floor((lv - l + b) / 2.0)
        sv = math.floor((1000 * x - lv + s[0]) / 2.0)
        s = s[1:] + [sv]
        l, b = lv, bv
        out.append((x, l, b, s[6], l + b + s[0]))
    return out


def test_holt_winters_matches_python_replica(spark, sf_dir):
    import datetime
    import project_etl_spark.operators.sql_dialect as sd

    counts = [10, 14, 9, 11, 16, 8, 7, 12, 15, 10, 12, 18, 9, 8, 13]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(days=d, hours=1)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r["day"]: r for r in _drive(
        spark, sf_dir, sd, sd.win_holt_winters, {"events": ev})}
    ref = _hw_reference(counts)
    assert len(got) == len(counts)
    for d, (x, l, b, sv, fc) in enumerate(ref):
        r = got[d]
        assert (r["n_events"], r["level_milli"], r["trend_milli"],
                r["seasonal_milli"], r["forecast_next_milli"]) \
            == (x, l, b, sv, fc), f"day {d}"


def test_holt_winters_seasonal_state_learns_weekly_pattern(spark, sf_dir):
    """A strict period-7 series: after two full cycles the one-step
    forecast tracks the actual next value to within the halving decay
    (the seasonal state has absorbed most of the cycle)."""
    import datetime
    import project_etl_spark.operators.sql_dialect as sd

    base = [10, 30, 10, 10, 50, 10, 10]
    counts = base * 4
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(days=d, hours=1)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(
        (r["day"], r["forecast_next_milli"]) for r in _drive(
            spark, sf_dir, sd, sd.win_holt_winters, {"events": ev}))
    # forecast made after day d predicts day d+1
    errs = [abs(got[d][1] - 1000 * counts[d + 1])
            for d in range(len(counts) - 1)]
    late = sum(errs[21:]) / len(errs[21:])
    early = sum(errs[:7]) / 7
    assert late < early / 2  # the seasonal state is doing real work


# ---------------------------------------------------------------------------
# ext_sign_test
# ---------------------------------------------------------------------------

def test_sign_test_counts_and_z(spark, sf_dir):
    """Six sources: four with the even half longer, two shorter —
    n+ = 4, n- = 2, z = 2/sqrt(6)."""
    import project_etl_spark.operators.llm_curation as lc

    rows = []
    for i, (odd_c, even_c) in enumerate(
            [(10, 20), (10, 30), (5, 9), (7, 8), (20, 10), (9, 5)]):
        rows.append((2 * i, f"s{i}", odd_c))      # rn 1 (odd position)
        rows.append((2 * i + 1, f"s{i}", even_c))  # rn 2 (even position)
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_sign_test, {"documents": docs})[0]
    assert (r["n_pairs"], r["n_plus"], r["n_minus"]) == (6, 4, 2)
    assert r["z_micro"] == math.floor(2 / math.sqrt(6.0) * 1e6 + 0.5)


def test_sign_test_drops_zero_diffs_like_wilcoxon(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    rows = [(0, "s0", 10), (1, "s0", 10),   # tied halves -> dropped
            (2, "s1", 5), (3, "s1", 9)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_sign_test, {"documents": docs})[0]
    assert r["n_pairs"] == 1 and r["n_plus"] == 1 and r["n_minus"] == 0


# ---------------------------------------------------------------------------
# ext_jarque_bera
# ---------------------------------------------------------------------------

def test_jarque_bera_symmetric_planted(spark, sf_dir):
    """[1,2,2,3]: skew exactly 0, excess kurtosis -1, JB = n/6 * 1/4."""
    import project_etl_spark.operators.llm_curation as lc

    rows = [("a", v) for v in (1, 2, 2, 3)]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_jarque_bera,
               {"documents": docs})[0]
    assert r["n_rows"] == 4
    assert r["skew_milli"] == 0
    assert r["excess_kurtosis_milli"] == -1000
    assert r["jb_milli"] == math.floor(4 / 6.0 * (1.0 / 4) * 1e3 + 0.5)


def test_jarque_bera_mirrors_python_moments(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    vals = [3, 7, 7, 8, 12, 40, 41, 5, 6, 6]
    rows = [("a", v) for v in vals]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_jarque_bera,
               {"documents": docs})[0]
    n = len(vals)
    mu = sum(vals) / n
    m2r = sum(v * v for v in vals) / n
    m3r = sum(v ** 3 for v in vals) / n
    m4r = sum(v ** 4 for v in vals) / n
    m2 = m2r - mu * mu
    m3 = m3r - 3.0 * mu * m2r + 2.0 * mu ** 3
    m4 = m4r - 4.0 * mu * m3r + 6.0 * mu * mu * m2r - 3.0 * mu ** 4
    s = m3 / m2 ** 1.5
    k = m4 / (m2 * m2) - 3.0
    assert r["skew_milli"] == math.floor(s * 1e3 + 0.5)
    assert r["excess_kurtosis_milli"] == math.floor(k * 1e3 + 0.5)
    assert r["jb_milli"] == math.floor(
        n / 6.0 * (s * s + k * k / 4.0) * 1e3 + 0.5)
    assert r["skew_milli"] > 0  # the planted heavy right tail


# ---------------------------------------------------------------------------
# ext_fdr_bky
# ---------------------------------------------------------------------------

def _bky_reference(per_source):
    """Pure-Python replica of the shared test chain + both stages.
    per_source: {source: (n, a)} with a = docs >= 300 chars."""
    tn = sum(n for n, _ in per_source.values())
    ta = sum(a for _, a in per_source.values())
    pv = {}
    for src, (n, a) in per_source.items():
        if not (n > 0 and tn - n > 0 and ta > 0 and tn - ta > 0):
            continue
        z = ((a / n - (ta - a) / (tn - n))
             / math.sqrt(ta / tn * (1 - ta / tn) * (1 / n + 1 / (tn - n))))
        zm = math.floor(z * 1e3 + 0.5)
        p = math.floor(min(1.0, 2.0 * math.exp(-(zm / 1e3) ** 2 / 2))
                       * 1e6 + 0.5)
        pv[src] = p
    ranked = sorted(pv, key=lambda s: (pv[s], s))
    m = len(ranked)
    prank = {s: i + 1 for i, s in enumerate(ranked)}
    r1 = max([prank[s] for s in ranked
              if pv[s] * 21 * m <= prank[s] * 1000000], default=0)
    r2 = max([prank[s] for s in ranked
              if pv[s] * 21 * (m - r1) <= prank[s] * 1000000], default=0)
    rbh = max([prank[s] for s in ranked
               if pv[s] * 20 * m <= prank[s] * 1000000], default=0)
    return {s: (prank[s], r1, int(prank[s] <= r2), int(prank[s] <= rbh))
            for s in ranked}


def test_bky_matches_python_replica_and_gains_power(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    # 3 shifted sources (all long docs), 9 null-ish sources (half long)
    spec = {}
    for i in range(3):
        spec[f"hot{i}"] = (40, 40)
    for i in range(9):
        spec[f"bg{i}"] = (40, 20)
    rows = []
    did = 0
    for src, (n, a) in spec.items():
        for j in range(n):
            rows.append((did, src, 400 if j < a else 100))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "n_chars long")
    got = {r["source"]: r for r in _drive(
        spark, sf_dir, lc, lc.ext_fdr_bky, {"documents": docs})}
    ref = _bky_reference(spec)
    assert set(got) == set(ref)
    for s, (prank, r1, rej_bky, rej_bh) in ref.items():
        r = got[s]
        assert (r["prank"], r["n_stage1_rejects"], r["rejected_bky"],
                r["rejected_bh"]) == (prank, r1, rej_bky, rej_bh), s
    # the three shifted sources must be stage-2 rejected
    assert all(got[f"hot{i}"]["rejected_bky"] == 1 for i in range(3))
    # adaptivity: with r1 > 0 the stage-2 level exceeds BH's, so the
    # BKY rejection set contains BH's
    if any(v[1] > 0 for v in ref.values()):
        assert all(r["rejected_bky"] >= r["rejected_bh"]
                   for r in got.values())


# ---------------------------------------------------------------------------
# ext_quade_test
# ---------------------------------------------------------------------------

def test_quade_matches_python_replica(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    langs = ["de", "en", "es", "fr", "zh"]
    # three complete blocks with increasing spread and a consistent
    # language ordering (en always biggest)
    grid = {
        "s1": {"de": 10, "en": 14, "es": 11, "fr": 12, "zh": 13},
        "s2": {"de": 20, "en": 40, "es": 25, "fr": 30, "zh": 35},
        "s3": {"de": 5, "en": 6, "es": 5, "fr": 5, "zh": 5},
    }
    rows = []
    did = 0
    for src, cells in grid.items():
        for lg, c in cells.items():
            rows.append((did, src, lg, c))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "lang string, n_chars long")
    r = _drive(spark, sf_dir, lc, lc.ext_quade_test, {"documents": docs})[0]
    # python replica (cell value = mean*1000 = c*1000 for 1-doc cells)
    import itertools
    v = {(s, lg): grid[s][lg] * 1000 for s in grid for lg in langs}
    rank_in_block = {}
    for s in grid:
        order = sorted(langs, key=lambda lg: (v[(s, lg)], lg))
        rr = {}
        for i, lg in enumerate(order):
            same = [x for x in langs if v[(s, x)] == v[(s, lg)]]
            rr[lg] = min(sorted(
                (v[(s, x)], x) for x in langs).index((v[(s, lg)], y))
                for y in same) + 1
        # RANK(): 1 + count of strictly-smaller (v, lang) tuples
        for lg in langs:
            rr[lg] = 1 + sum(1 for x in langs
                             if (v[(s, x)], x) < (v[(s, lg)], lg))
        rank_in_block[s] = rr
    spread = {s: max(v[(s, lg)] for lg in langs)
              - min(v[(s, lg)] for lg in langs) for s in grid}
    qrank = {s: 1 + sum(1 for t in grid
                        if (spread[t], t) < (spread[s], s)) for s in grid}
    s2x = {(s, lg): qrank[s] * (2 * rank_in_block[s][lg] - 6)
           for s in grid for lg in langs}
    tj = {lg: sum(s2x[(s, lg)] for s in grid) for lg in langs}
    a2 = sum(x * x for x in s2x.values())
    st = sum(t * t for t in tj.values())
    b = len(grid)
    assert (r["n_blocks"], r["n_treatments"]) == (b, 5)
    assert r["sum_tj2"] == st and r["sum_s2"] == a2
    f = (b - 1.0) * st / (b * 1.0 * a2 - st)
    assert r["quade_f_milli"] == math.floor(f * 1e3 + 0.5)
    assert r["quade_f_milli"] > 0  # the consistent ordering has signal
