"""Round-11 operator tests: planted fixtures checked against pure-Python
textbook references for the six new statistics/eval queries. The
differential suite proves Spark == DuckDB; these prove both equal the
TEXTBOOK (same-on-both semantic bugs are invisible to the hash)."""

from __future__ import annotations

import datetime
import math


def _drive(spark, sf_dir, module, fn, tables):
    orig = module.table
    module.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        module.table = orig


# ---------------------------------------------------------------------------
# win_ljung_box
# ---------------------------------------------------------------------------

def test_ljung_box_alternating_series(spark, sf_dir):
    """Alternating daily counts 1,3,1,3,... over 10 consecutive days:
    rho_k = (-0.9, 0.8, -0.7, 0.6, -0.5) exactly (integer covariance
    algebra), Q = 120 * (0.81/9 + 0.64/8 + 0.49/7 + 0.36/6 + 0.25/5)."""
    import project_etl_spark.operators.windows as win

    rows = []
    eid = 0
    for d in range(10):
        c = 1 if d % 2 == 0 else 3
        for _ in range(c):
            rows.append((eid, datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(days=d, hours=1)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = _drive(spark, sf_dir, win, win.win_ljung_box, {"events": events})
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10 and r["df"] == 5
    # mirror the SQL's IEEE expression order exactly
    n = 10.0
    rs = [-900 / 1000.0, 800 / 1000.0, -700 / 1000.0,
          600 / 1000.0, -500 / 1000.0]
    q = n * (n + 2.0) * (rs[0] * rs[0] / (n - 1.0)
                         + rs[1] * rs[1] / (n - 2.0)
                         + rs[2] * rs[2] / (n - 3.0)
                         + rs[3] * rs[3] / (n - 4.0)
                         + rs[4] * rs[4] / (n - 5.0))
    assert r["q_lb_micro"] == math.floor(q * 1e6 + 0.5)
    assert r["acf1_micro"] == math.floor(-0.9 * 1e6 + 0.5)


def test_ljung_box_constant_series_guarded(spark, sf_dir):
    """A constant series has c0 = 0 — the guard must return 0 rows, not
    a divide-by-zero NaN."""
    import project_etl_spark.operators.windows as win

    rows = [(i, datetime.datetime(1970, 1, 1)
             + datetime.timedelta(days=i)) for i in range(10)]
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = _drive(spark, sf_dir, win, win.win_ljung_box, {"events": events})
    assert out == []


# ---------------------------------------------------------------------------
# ext_friedman_kendall_w
# ---------------------------------------------------------------------------

def test_friedman_perfect_concordance(spark, sf_dir):
    """Three complete blocks ranking five languages identically:
    chi2 = b(k-1) = 12 and W = 1 exactly."""
    import project_etl_spark.operators.llm_curation as cur

    langs = ["de", "en", "es", "fr", "zh"]
    rows = [(f"s{s}", lang, 100 * (j + 1))
            for s in range(3) for j, lang in enumerate(langs)]
    docs = spark.createDataFrame(
        [(i, "x", lang, src, n) for i, (src, lang, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_friedman_kendall_w,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_blocks"] == 3 and r["n_treatments"] == 5
    assert r["friedman_chi2_micro"] == 12_000_000
    assert r["kendall_w_micro"] == 1_000_000


def test_friedman_drops_incomplete_blocks(spark, sf_dir):
    """A source missing a language is not a complete block and must not
    contaminate the rank sums."""
    import project_etl_spark.operators.llm_curation as cur

    langs = ["de", "en", "es", "fr", "zh"]
    rows = [(f"s{s}", lang, 100 * (j + 1))
            for s in range(3) for j, lang in enumerate(langs)]
    rows += [("s_partial", "en", 50), ("s_partial", "de", 999)]
    docs = spark.createDataFrame(
        [(i, "x", lang, src, n) for i, (src, lang, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_friedman_kendall_w,
                 {"documents": docs})
    assert out[0]["n_blocks"] == 3
    assert out[0]["kendall_w_micro"] == 1_000_000


# ---------------------------------------------------------------------------
# ext_krippendorff_alpha
# ---------------------------------------------------------------------------

def test_krippendorff_hand_computed(spark, sf_dir):
    """Four units with vote counts v = (3,1,1,3): alpha = 1 -
    (N-1)*sum v(3-v) / (2*n1*n0) = 1 - 11*4/64 = 0.3125; cross-checked
    against the first-principles D_o/D_e form in the comment."""
    import project_etl_spark.operators.llm_curation as cur

    # doc A: len 400, no digits, 20% spaces  -> votes (1,1,1), v=3
    ta = ("aaaa bbbb cccc dddd " * 20).rstrip() + " "
    ta = ta[:400]
    # doc B: len 300 all digits              -> votes (1,0,0), v=1
    tb = "1234567890" * 30
    # doc C: len 100, no digits, no spaces   -> votes (0,1,0), v=1
    tc = "c" * 100
    # doc D: len 250, no digits, ~16% spaces -> votes (1,1,1), v=3
    td = ("eeee " * 50)[:250]
    docs = spark.createDataFrame(
        [(0, ta, "en", "s", len(ta)), (1, tb, "en", "s", len(tb)),
         (2, tc, "en", "s", len(tc)), (3, td, "en", "s", len(td))],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_krippendorff_alpha,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_units"] == 4 and r["n_ones"] == 8 and r["n_zeros"] == 4
    assert r["d_obs"] == 4
    # D_o = 4/12, D_e = 2*8*4/(12*11) -> alpha = 1 - (1/3)/(64/132) = 0.3125
    assert r["alpha_micro"] == 312_500


def test_krippendorff_unanimous_guarded(spark, sf_dir):
    """All-identical perfect votes make expected disagreement zero —
    alpha is undefined and the guard must emit no row."""
    import project_etl_spark.operators.llm_curation as cur

    t = ("aaaa bbbb cccc dddd " * 20)[:400]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_krippendorff_alpha,
                 {"documents": docs})
    assert out == []


# ---------------------------------------------------------------------------
# ext_hosmer_lemeshow
# ---------------------------------------------------------------------------

def test_hosmer_lemeshow_pure_python_twin(spark, sf_dir):
    """20 docs with distinct lengths -> 10 deciles of 2; replicate the
    scorer, binning and chi-square closes in plain Python."""
    import project_etl_spark.operators.llm_curation as cur

    items = [(i, 10 * (i + 1), i % 3 == 0) for i in range(20)]
    docs = spark.createDataFrame(
        [(i, "x", "en" if en else "de", "s", c) for i, c, en in items],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_hosmer_lemeshow,
                 {"documents": docs})
    scored = sorted(
        (math.floor(1e6 / (1.0 + math.exp(-(c - 300.0) / 100.0)) + 0.5),
         i, 1 if en else 0) for i, c, en in items)
    chi2 = 0
    n_bins = 0
    for g in range(10):
        grp = scored[2 * g:2 * g + 2]
        n_g = len(grp)
        o1 = sum(y for _, _, y in grp)
        e1m = sum(p for p, _, _ in grp)
        if 0 < e1m < n_g * 1_000_000:
            e1 = e1m / 1e6
            t = (o1 - e1) * (o1 - e1) / (e1 * (1.0 - e1 / n_g))
            chi2 += math.floor(t * 1e6 + 0.5)
            n_bins += 1
    assert len(out) == 1
    assert out[0]["n_bins"] == n_bins
    assert out[0]["hl_chi2_micro"] == chi2


# ---------------------------------------------------------------------------
# ext_cochran_armitage
# ---------------------------------------------------------------------------

def test_cochran_armitage_linear_trend(spark, sf_dir):
    """5 doses x 4 docs with 0,1,2,3,4 positives: A = 200, B = 800,
    Z^2 = A^2*n/(R(n-R)B) = 10 exactly."""
    import project_etl_spark.operators.llm_curation as cur

    rows = []
    doc_id = 0
    for dose in range(5):          # doses 1..5 by length order
        for j in range(4):
            en = j < dose          # 0,1,2,3,4 positives per dose
            rows.append((doc_id, "x", "en" if en else "de", "s",
                         40 * dose + 10 * (j + 1)))
            doc_id += 1
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_cochran_armitage,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 20 and r["r"] == 10
    assert r["trend_num"] == 200
    assert r["z2_micro"] == 10_000_000


def test_cochran_armitage_degenerate_margin_guarded(spark, sf_dir):
    """All-positive response makes the variance zero — guard, no row."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 10 * (i + 1)) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_cochran_armitage,
                 {"documents": docs})
    assert out == []


# ---------------------------------------------------------------------------
# ext_map_mrr_eval
# ---------------------------------------------------------------------------

def test_map_mrr_hand_computed(spark, sf_dir):
    """One panel query with engineered cosines: relevants at ranks 1 and
    4 of 4 -> RR = 1, AP@10 = (1/1 + 2/4)/min(R=2,10) = 0.75."""
    import project_etl_spark.operators.llm_curation as cur

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 1),    # panel query (0 % 100 == 0)
         (1, [2.0, 0.0, 0.0, 0.0], 1),    # sim 1.0, relevant
         (2, [1.0, 1.0, 0.0, 0.0], 0),    # sim ~0.707
         (3, [0.0, 1.0, 0.0, 0.0], 0),    # sim 0
         (4, [-1.0, 0.0, 0.0, 0.0], 1)],  # sim -1, relevant
        "vec_id long, embedding array<float>, label int")
    out = _drive(spark, sf_dir, cur, cur.ext_map_mrr_eval,
                 {"embeddings": emb})
    assert len(out) == 1
    r = out[0]
    assert r["q_id"] == 0
    assert r["r_corpus"] == 2 and r["n_rel_top10"] == 2
    assert r["rr_micro"] == 1_000_000
    assert r["ap10_micro"] == 750_000


def test_map_mrr_no_relevant_reports_zero(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as cur

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 1),
         (1, [2.0, 0.0, 0.0, 0.0], 0),
         (2, [0.0, 1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int")
    out = _drive(spark, sf_dir, cur, cur.ext_map_mrr_eval,
                 {"embeddings": emb})
    assert len(out) == 1
    assert out[0]["rr_micro"] == 0
    assert out[0]["ap10_micro"] == 0
    assert out[0]["r_corpus"] == 0


# ---------------------------------------------------------------------------
# ext_page_trend
# ---------------------------------------------------------------------------

def test_page_trend_perfect_order(spark, sf_dir):
    """Perfectly concordant blocks in the hypothesized (alphabetical)
    order: L = b*sum j^2 = 165, E[L] = 135, Var = 75."""
    import project_etl_spark.operators.llm_curation as cur

    langs = ["de", "en", "es", "fr", "zh"]
    rows = [(f"s{s}", lang, 100 * (j + 1))
            for s in range(3) for j, lang in enumerate(langs)]
    docs = spark.createDataFrame(
        [(i, "x", lang, src, n) for i, (src, lang, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_page_trend,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_blocks"] == 3 and r["l_stat"] == 165 and r["l_mean"] == 135
    b, k = 3.0, 5.0
    z = (165 - b * k * (k + 1.0) * (k + 1.0) / 4.0) / math.sqrt(
        b * k * k * (k + 1.0) * (k * k - 1.0) / 144.0)
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# ext_gwet_ac1
# ---------------------------------------------------------------------------

def test_gwet_ac1_hand_computed(spark, sf_dir):
    """Same 4-unit fixture as the Krippendorff test (v = 3,1,1,3):
    Pa = 2/3, pi = 2/3, Pe = 4/9, AC1 = (2/3 - 4/9)/(1 - 4/9) = 0.4."""
    import project_etl_spark.operators.llm_curation as cur

    ta = ("aaaa bbbb cccc dddd " * 20)[:400]
    tb = "1234567890" * 30
    tc = "c" * 100
    td = ("eeee " * 50)[:250]
    docs = spark.createDataFrame(
        [(0, ta, "en", "s", len(ta)), (1, tb, "en", "s", len(tb)),
         (2, tc, "en", "s", len(tc)), (3, td, "en", "s", len(td))],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_gwet_ac1, {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_units"] == 4 and r["n_ones"] == 8
    n, n1, sq = 4, 8, 28
    pa = (sq - 3 * n) * 1.0 / (6.0 * n)
    pi = n1 * 1.0 / (3.0 * n)
    pe = 2.0 * pi * (1.0 - pi)
    assert r["pa_micro"] == math.floor(pa * 1e6 + 0.5)
    assert r["pe_micro"] == math.floor(pe * 1e6 + 0.5)
    assert r["ac1_micro"] == math.floor((pa - pe) / (1.0 - pe) * 1e6 + 0.5)
    assert r["ac1_micro"] == 400_000  # exactly 0.4


# ---------------------------------------------------------------------------
# ext_matthews_mcc
# ---------------------------------------------------------------------------

def test_mcc_hand_computed(spark, sf_dir):
    """Planted confusion tp=40 fp=10 fn=20 tn=30: MCC = 1000/sqrt(6e6),
    Youden J = 1000/2400."""
    import project_etl_spark.operators.llm_curation as cur

    rows = []
    i = 0
    for cnt, long_doc, en in ((40, True, True), (10, True, False),
                              (20, False, True), (30, False, False)):
        for _ in range(cnt):
            rows.append((i, "x", "en" if en else "de", "s",
                         400 if long_doc else 100))
            i += 1
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_matthews_mcc,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (40, 10, 20, 30)
    mcc = (40 * 1.0 * 30 - 10 * 1.0 * 20) / math.sqrt(
        (40 + 10 * 1.0) * (40 + 20) * (30 + 10) * (30 + 20))
    assert r["mcc_micro"] == math.floor(mcc * 1e6 + 0.5)
    j = (40 * 1.0 * 30 - 10 * 1.0 * 20) / ((40 + 20 * 1.0) * (30 + 10))
    assert r["youden_j_micro"] == math.floor(j * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# ext_cliffs_delta
# ---------------------------------------------------------------------------

def test_cliffs_delta_with_ties(spark, sf_dir):
    """en lengths {3,4,5} vs non-en {1,2,3}: 8 dominances, 1 tie, 0
    reversals -> delta = 8/9 exactly (ties counted half via midranks),
    magnitude 'large'."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 3), (1, "x", "en", "s", 4),
         (2, "x", "en", "s", 5), (3, "x", "de", "s", 1),
         (4, "x", "fr", "s", 2), (5, "x", "zh", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_cliffs_delta,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n1"] == 3 and r["n2"] == 3
    assert r["u1"] == 8.5                      # midrank U counts ties half
    assert r["delta_micro"] == math.floor(8.0 / 9.0 * 1e6 + 0.5)
    assert r["magnitude"] == "large"


# ---------------------------------------------------------------------------
# ext_fdr_by vs ext_fdr_bh
# ---------------------------------------------------------------------------

def test_by_is_stricter_than_bh(spark, sf_dir):
    """On identical per-source tests, BY's critical values are BH's
    divided by H_m — every BY rejection must also be a BH rejection and
    every BY critical value strictly smaller (m > 1)."""
    import project_etl_spark.operators.llm_curation as cur

    rows = []
    i = 0
    # three conforming sources + one deviant (all long docs)
    for src, n_long, n_short in (("a", 10, 10), ("b", 11, 9),
                                 ("c", 9, 11), ("deviant", 20, 0)):
        for _ in range(n_long):
            rows.append((i, "x", "en", src, 400)); i += 1
        for _ in range(n_short):
            rows.append((i, "x", "en", src, 100)); i += 1
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    bh = {r["source"]: r for r in _drive(spark, sf_dir, cur,
                                         cur.ext_fdr_bh,
                                         {"documents": docs})}
    by = {r["source"]: r for r in _drive(spark, sf_dir, cur,
                                         cur.ext_fdr_by,
                                         {"documents": docs})}
    assert set(bh) == set(by) == {"a", "b", "c", "deviant"}
    h = sum(math.floor(1e6 / i + 0.5) for i in range(1, 5)) / 1e6
    for s in by:
        assert by[s]["p_micro"] == bh[s]["p_micro"]
        assert by[s]["prank"] == bh[s]["prank"]
        expect_crit = math.floor(by[s]["prank"] * 5e4 / (4 * h))
        assert by[s]["crit_micro"] == expect_crit
        assert by[s]["crit_micro"] < bh[s]["crit_micro"]
        assert by[s]["rejected"] <= bh[s]["rejected"]


# ---------------------------------------------------------------------------
# ext_levene_mean
# ---------------------------------------------------------------------------

def test_levene_mean_hand_computed(spark, sf_dir):
    """Group en = {0,2,8,10} (spread), de = {5,5,5,5} (constant):
    between = 3.2e7 (milli^2), within = 4e6, W = 6 * 8 = 48."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 0), (1, "x", "en", "s", 2),
         (2, "x", "en", "s", 8), (3, "x", "en", "s", 10),
         (4, "x", "de", "s", 5), (5, "x", "de", "s", 5),
         (6, "x", "de", "s", 5), (7, "x", "de", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_levene_mean,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_groups"] == 2 and r["n_rows"] == 8
    assert r["levene_w_micro"] == 48_000_000


def test_levene_zero_within_guarded(spark, sf_dir):
    """Deviations identical within every group -> within = 0 -> no row."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 1), (1, "x", "en", "s", 9),
         (2, "x", "de", "s", 5), (3, "x", "de", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_levene_mean,
                 {"documents": docs})
    assert out == []


# ---------------------------------------------------------------------------
# ext_dunn_posthoc
# ---------------------------------------------------------------------------

def test_dunn_pooled_midranks_with_ties(spark, sf_dir):
    """en {3,4,5} vs de {1,2,3}: pooled midranks give rbar 4.8333 vs
    2.1667, tie term 6, variance factor 3.5 - 0.1 = 3.4."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 3), (1, "x", "en", "s", 4),
         (2, "x", "en", "s", 5), (3, "x", "de", "s", 1),
         (4, "x", "de", "s", 2), (5, "x", "de", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_dunn_posthoc,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["lang_a"] == "de" and r["lang_b"] == "en"
    assert r["n_a"] == 3 and r["n_b"] == 3
    # mirror the SQL expression: (rbar_a - rbar_b)/sqrt(var*(1/na+1/nb))
    r2_de, r2_en, n = 13.0, 29.0, 6.0   # doubled rank sums: 2*6.5, 2*14.5
    z = ((r2_de / (2.0 * 3) - r2_en / (2.0 * 3))
         / math.sqrt((n * (n + 1.0) / 12.0 - 6.0 / (12.0 * (n - 1.0)))
                     * (1.0 / 3 + 1.0 / 3)))
    assert r["z_milli"] == math.floor(z * 1e3 + 0.5)


# ---------------------------------------------------------------------------
# ext_icc_oneway
# ---------------------------------------------------------------------------

def test_icc_hand_computed(spark, sf_dir):
    """Same 4-unit fixture (v = 3,1,1,3): MSB = 16/36, MSW = 4/24,
    ICC(1,1) = (MSB - MSW)/(MSB + 2 MSW)."""
    import project_etl_spark.operators.llm_curation as cur

    ta = ("aaaa bbbb cccc dddd " * 20)[:400]
    tb = "1234567890" * 30
    tc = "c" * 100
    td = ("eeee " * 50)[:250]
    docs = spark.createDataFrame(
        [(0, ta, "en", "s", len(ta)), (1, tb, "en", "s", len(tb)),
         (2, tc, "en", "s", len(tc)), (3, td, "en", "s", len(td))],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_icc_oneway,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    n, q, vv, d = 4, 20, 8, 4
    msb = (n * q - vv * vv) * 1.0 / (3.0 * n * (n - 1.0))
    msw = d * 1.0 / (6.0 * n)
    assert r["msb_micro"] == math.floor(msb * 1e6 + 0.5)
    assert r["msw_micro"] == math.floor(msw * 1e6 + 0.5)
    assert r["icc_micro"] == math.floor((msb - msw) / (msb + 2.0 * msw)
                                        * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# ext_mood_median
# ---------------------------------------------------------------------------

def test_mood_median_hand_computed(spark, sf_dir):
    """en {3,4,5} vs other {1,2,3}: pooled lower median = 3, 2x2 =
    (2,0;1,3), chi2 = 6*36/72 = 3."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 3), (1, "x", "en", "s", 4),
         (2, "x", "en", "s", 5), (3, "x", "de", "s", 1),
         (4, "x", "fr", "s", 2), (5, "x", "zh", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_mood_median,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["pooled_median"] == 3
    assert (r["en_above"], r["other_above"]) == (2, 0)
    assert (r["en_at_or_below"], r["other_at_or_below"]) == (1, 3)
    assert r["chi2_micro"] == 3_000_000


# ---------------------------------------------------------------------------
# ext_cvm_two_sample
# ---------------------------------------------------------------------------

def test_cvm_hand_computed(spark, sf_dir):
    """Same fixture: weighted squared ECDF gaps sum to 126 (in
    (cum1*m - cum2*n)^2 units), T = 126/(6^3 * 9)."""
    import project_etl_spark.operators.llm_curation as cur

    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 3), (1, "x", "en", "s", 4),
         (2, "x", "en", "s", 5), (3, "x", "de", "s", 1),
         (4, "x", "fr", "s", 2), (5, "x", "zh", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_cvm_two_sample,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_en"] == 3 and r["n_other"] == 3
    t = 126.0 / ((3 + 3 * 1.0) * 6 * 6) / (3 * 1.0 * 3)
    assert r["cvm_t_nano"] == math.floor(t * 1e9 + 0.5)


# ---------------------------------------------------------------------------
# ext_wilcoxon_signed_rank
# ---------------------------------------------------------------------------

def test_wilcoxon_hand_computed(spark, sf_dir):
    """Planted diffs +10, -5, +3 (and one zero pair, dropped):
    |d| ranks 3k->1, 5k->2, 10k->3 -> W+ = 4, W- = 2,
    z = (4 - 3)/sqrt(3*4*7/24)."""
    import project_etl_spark.operators.llm_curation as cur

    rows = []
    i = 0
    # source a: positions 1..4 lengths 10,20,10,20 -> diff +10 (evens 20)
    for c in (10, 20, 10, 20):
        rows.append((i, "x", "en", "a", c)); i += 1
    # source b: 10,5,10,5 -> diff -5
    for c in (10, 5, 10, 5):
        rows.append((i, "x", "en", "b", c)); i += 1
    # source c: 10,13,10,13 -> diff +3
    for c in (10, 13, 10, 13):
        rows.append((i, "x", "en", "c", c)); i += 1
    # source d: 7,7,7,7 -> diff 0, dropped
    for c in (7, 7, 7, 7):
        rows.append((i, "x", "en", "d", c)); i += 1
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    out = _drive(spark, sf_dir, cur, cur.ext_wilcoxon_signed_rank,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 3
    assert r["w_plus"] == 4 and r["w_minus"] == 2
    n = 3.0
    z = (4 - n * (n + 1.0) / 4.0) / math.sqrt(
        n * (n + 1.0) * (2.0 * n + 1.0) / 24.0)
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# ext_forecast_naive_benchmarks
# ---------------------------------------------------------------------------

def test_forecast_naive_perfect_weekly(spark, sf_dir):
    """An exactly weekly-periodic daily series: seasonal-naive(7) error
    is ZERO (MASE = 0, U2 = 0) while naive(1) error is not."""
    import project_etl_spark.operators.llm_curation as cur

    pattern = [5, 1, 1, 1, 1, 1, 9]
    rows = []
    oid = 0
    for d in range(14):
        for _ in range(pattern[d % 7]):
            rows.append((oid, 0, "O", 10.0,
                         datetime.datetime(1995, 1, 1)
                         + datetime.timedelta(days=d), "1-URGENT"))
            oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    out = _drive(spark, sf_dir, cur, cur.ext_forecast_naive_benchmarks,
                 {"orders": orders})
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 7
    assert r["mae_snaive7_milli"] == 0
    assert r["mase_micro"] == 0 and r["theil_u2_micro"] == 0
    # naive(1) MAE over days 7..13: |5-9|+|1-5|+0+0+0+0+|9-1| = 16
    assert r["mae_naive1_milli"] == math.floor(16 * 1e3 / 7 + 0.5)


# ---------------------------------------------------------------------------
# ext_jonckheere_terpstra
# ---------------------------------------------------------------------------

def test_jt_perfect_ordering(spark, sf_dir):
    """Three ordered groups with fully separated values: JT = sum of
    all cross-pair counts = 12, mean = 6, var = 456/72."""
    import project_etl_spark.operators.llm_curation as cur

    rows = []
    oid = 0
    for prio, vals in (("1-URGENT", (0.01, 0.02)),
                       ("2-HIGH", (0.03, 0.04)),
                       ("3-MEDIUM", (0.05, 0.06))):
        for v in vals:
            rows.append((oid, 0, "O", v,
                         datetime.datetime(1995, 1, 1), prio))
            oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    out = _drive(spark, sf_dir, cur, cur.ext_jonckheere_terpstra,
                 {"orders": orders})
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 6
    assert r["jt_stat"] == 12
    assert r["jt_mean"] == 6.0
    # sn23 = sum n_g^2 (2 n_g + 3) = 3 * 4 * 7 = 84
    z = (12.0 - (6.0 * 1.0 * 6.0 - 12.0) / 4.0) / math.sqrt(
        (6.0 * 1.0 * 6.0 * (2.0 * 6.0 + 3.0) - 84.0) / 72.0)
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)


def test_jt_ties_count_half(spark, sf_dir):
    """Two groups sharing one tied value: JT = 2*1 + 0.5 (dominances
    2, one tie at 0.02)."""
    import project_etl_spark.operators.llm_curation as cur

    rows = [(0, 0, "O", 0.01, datetime.datetime(1995, 1, 1), "1-URGENT"),
            (1, 0, "O", 0.02, datetime.datetime(1995, 1, 1), "1-URGENT"),
            (2, 0, "O", 0.02, datetime.datetime(1995, 1, 1), "2-HIGH"),
            (3, 0, "O", 0.03, datetime.datetime(1995, 1, 1), "2-HIGH")]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    out = _drive(spark, sf_dir, cur, cur.ext_jonckheere_terpstra,
                 {"orders": orders})
    # doubled JT2 = 2*(#greater) + #ties = 2*3 + 1 = 7 -> JT = 3.5,
    # reported FLOOR(3.5 + 0.5) = 4
    assert out[0]["jt_stat"] == 4
