"""Round-12 seventh-wave operator tests: planted fixtures checked
against pure-Python textbook references (Brunner-Munzel, gamma,
OLS influence, VIF, Lilliefors)."""

from __future__ import annotations

import math


def _drive(spark, sf_dir, module, fn, tables):
    orig = module.table
    module.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        module.table = orig


def _docs(spark, rows):
    """rows = [(lang, n_chars), ...] -> minimal documents table."""
    return spark.createDataFrame(
        [(i, lang, "t", "s", n) for i, (lang, n) in enumerate(rows)],
        "doc_id long, lang string, text string, source string, n_chars long")


# ---------------------------------------------------------------------------
# ext_brunner_munzel
# ---------------------------------------------------------------------------

def _bm_ref(pairs):
    """pairs = [(is_en, value)] — mirror the doubled-midrank pipeline."""
    from collections import Counter

    cnt = Counter(v for _, v in pairs)
    cnta = Counter(v for a, v in pairs if a)
    r2m, r2am, r2bm = {}, {}, {}
    cum = cuma = cumb = 0
    for v in sorted(cnt):
        c = cnt[v]
        ca = cnta.get(v, 0)
        cb = c - ca
        r2m[v] = 2 * cum + c + 1
        r2am[v] = 2 * cuma + ca + 1
        r2bm[v] = 2 * cumb + cb + 1
        cum += c
        cuma += ca
        cumb += cb
    na = sum(cnta.values())
    nb = cum - na
    pa = [r2m[v] - r2am[v] for a, v in pairs if a]
    pb = [r2m[v] - r2bm[v] for a, v in pairs if not a]
    pa2, pb2 = sum(pa), sum(pb)
    qa4 = sum(p * p for p in pa)
    qb4 = sum(p * p for p in pb)
    if na * qa4 - pa2 * pa2 <= 0 or nb * qb4 - pb2 * pb2 <= 0:
        return None
    sa2 = (float(qa4) - pa2 * 1.0 * pa2 / na) / (4.0 * (na - 1))
    sb2 = (float(qb4) - pb2 * 1.0 * pb2 / nb) / (4.0 * (nb - 1))
    phat = pa2 * 1.0 / (2.0 * na) / nb
    t = (phat - 0.5) / math.sqrt(sa2 / (nb * 1.0 * nb * na)
                                 + sb2 / (na * 1.0 * na * nb))
    va = sa2 / (nb * 1.0 * nb) / na
    vb = sb2 / (na * 1.0 * na) / nb
    df = (va + vb) ** 2 / (va * va / (na - 1.0) + vb * vb / (nb - 1.0))
    return (na, nb, math.floor(phat * 1e6 + 0.5), math.floor(t * 1e3 + 0.5),
            math.floor(df * 1e3 + 0.5))


def test_brunner_munzel_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    pairs = [(True, v) for v in (5, 7, 7, 9, 12, 15)] \
        + [(False, v) for v in (3, 5, 6, 7, 8, 10, 11)]
    rows = [("en" if a else "de", v) for a, v in pairs]
    r = _drive(spark, sf_dir, lc, lc.ext_brunner_munzel,
               {"documents": _docs(spark, rows)})[0]
    ref = _bm_ref(pairs)
    assert (r["n_a"], r["n_b"], r["p_hat_micro"], r["t_milli"],
            r["df_milli"]) == ref


def test_brunner_munzel_direction_and_separation_guard(spark, sf_dir):
    """en shifted above de (overlapping): p_hat > 1/2 and t > 0; the
    mirrored shift flips both; PERFECT separation zeroes both placement
    variances (BM undefined — scipy returns inf there) and the
    DECIMAL guard must emit 0 rows instead."""
    import project_etl_spark.operators.llm_curation as lc

    hi = [("en", v) for v in (6, 8, 9, 11, 13)] \
        + [("de", v) for v in (1, 3, 5, 7, 9, 10)]
    r = _drive(spark, sf_dir, lc, lc.ext_brunner_munzel,
               {"documents": _docs(spark, hi)})[0]
    assert r["p_hat_micro"] > 500_000 and r["t_milli"] > 0
    lo = [("en", v) for v in (1, 3, 5, 7, 9)] \
        + [("de", v) for v in (6, 8, 9, 11, 13, 14)]
    r = _drive(spark, sf_dir, lc, lc.ext_brunner_munzel,
               {"documents": _docs(spark, lo)})[0]
    assert r["p_hat_micro"] < 500_000 and r["t_milli"] < 0
    sep = [("en", v) for v in (10, 11, 12, 14)] \
        + [("de", v) for v in (1, 2, 3, 5, 6)]
    out = _drive(spark, sf_dir, lc, lc.ext_brunner_munzel,
                 {"documents": _docs(spark, sep)})
    assert out == []


# ---------------------------------------------------------------------------
# ext_gamma_concordance
# ---------------------------------------------------------------------------

def _docs_src(spark, rows):
    """rows = [(lang, source, n_chars), ...]."""
    return spark.createDataFrame(
        [(i, lang, "t", src, n) for i, (lang, src, n) in enumerate(rows)],
        "doc_id long, lang string, text string, source string, n_chars long")


def test_gamma_ignores_ties_where_tau_shrinks(spark, sf_dir):
    """Three sources: chars 10/20/20, docs 1/2/3 — one concordant pair,
    one x-tied pair, one concordant: gamma = (2-0)/2 = 1 even though
    tau-b < 1 because of the tie."""
    import project_etl_spark.operators.llm_curation as lc

    rows = ([("en", "s1", 10)] + [("en", "s2", 10)] * 2
            + [("en", "s3", 4), ("en", "s3", 8), ("en", "s3", 8)])
    # per-source (chars, docs): s1=(10,1), s2=(20,2), s3=(20,3)
    r = _drive(spark, sf_dir, lc, lc.ext_gamma_concordance,
               {"documents": _docs_src(spark, rows)})
    assert len(r) == 1
    assert (r[0]["n_conc"], r[0]["n_disc"], r[0]["gamma_milli"]) == (2, 0, 1000)


def test_gamma_mixed_concordance(spark, sf_dir):
    """(10,3) (20,2) (30,1): all pairs discordant -> gamma = -1; add a
    concordant fourth source to move it to (1-3)/4."""
    import project_etl_spark.operators.llm_curation as lc

    rows = ([("de", "s1", 10)] * 1 + [("de", "s1", 0)] * 2
            + [("de", "s2", 20)] * 2 + [("de", "s3", 30)])
    # s1=(10,3), s2=(40,2), s3=(30,1): s1-s2 disc (x up, y down),
    # s1-s3 disc, s2-s3 conc (x down, y down)
    r = _drive(spark, sf_dir, lc, lc.ext_gamma_concordance,
               {"documents": _docs_src(spark, rows)})[0]
    assert (r["n_conc"], r["n_disc"]) == (1, 2)
    assert r["gamma_milli"] == math.floor((1 - 2) * 1e3 / 3 + 0.5)


# ---------------------------------------------------------------------------
# ext_ols_influence
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
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp")


def _influence_ref(counts):
    n = len(counts)
    ds = list(range(n))
    sd, sc = sum(ds), sum(counts)
    sdc = sum(d * c for d, c in zip(ds, counts))
    sdd = sum(d * d for d in ds)
    b = (n * 1.0 * sdc - sd * 1.0 * sc) / (n * 1.0 * sdd - sd * 1.0 * sd)
    em = {d: math.floor((c - (sc - b * sd) / n - b * d) * 1e3 + 0.5)
          for d, c in zip(ds, counts)}
    xs = {d: n * d - sd for d in ds}
    sxx = sum(x * x for x in xs.values())
    see = sum(v * v for v in em.values())
    out = []
    for d in ds:
        h = 1.0 / n + xs[d] * 1.0 * xs[d] / float(sxx)
        s2 = float(see) / 1e6 / (n - 2.0)
        if h < 1.0:
            ck = ((em[d] / 1e3) * (em[d] / 1e3) / (2.0 * s2 * (1.0 - h))
                  * (h / (1.0 - h)))
            out.append((d, em[d], math.floor(h * 1e6 + 0.5),
                        math.floor(ck * 1e6 + 0.5)))
    out.sort(key=lambda t: (-t[3], t[0]))
    return out[:5]


def test_ols_influence_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    got = [(r["d"], r["em"], r["lev_micro"], r["cooks_micro"])
           for r in _drive(spark, sf_dir, lc, lc.ext_ols_influence,
                           {"orders": _orders_from_day_counts(spark,
                                                              counts)})]
    assert got == _influence_ref(counts)


def test_ols_influence_names_the_planted_outlier(spark, sf_dir):
    """A clean trend with one 10x spike mid-series: the spike day must
    rank first by Cook's D."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [10 + d for d in range(15)]
    counts[7] = 120
    got = _drive(spark, sf_dir, lc, lc.ext_ols_influence,
                 {"orders": _orders_from_day_counts(spark, counts)})
    assert got[0]["d"] == 7
    assert got[0]["cooks_micro"] > 10 * got[1]["cooks_micro"]


# ---------------------------------------------------------------------------
# ext_vif_panel
# ---------------------------------------------------------------------------

def test_vif_matches_python_reference_and_flags_collinearity(spark, sf_dir):
    """x2 = 200*x1 + small wiggle (near-collinear), x3 independent:
    vif_qty and vif_price must blow up together while vif_disc stays
    near 1 — all values mirrored exactly."""
    import project_etl_spark.operators.llm_curation as lc

    qty = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    wig = [0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1]
    disc = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [(float(q), (200 * q + w) / 100.0, d / 1000.0)
            for q, w, d in zip(qty, wig, disc)]
    li = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double")
    r = _drive(spark, sf_dir, lc, lc.ext_vif_panel, {"lineitem": li})[0]
    n = len(qty)
    x1 = qty
    x2 = [200 * q + w for q, w in zip(qty, wig)]
    x3 = disc

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return ((n * float(sab) - float(sa) * float(sb))
                / math.sqrt((n * float(saa) - float(sa) ** 2)
                            * (n * float(sbb) - float(sb) ** 2)))

    r12, r13, r23 = corr(x1, x2), corr(x1, x3), corr(x2, x3)

    def vif(ra, rb, rc):
        return 1.0 / (1.0 - (ra * ra + rb * rb - 2.0 * ra * rb * rc)
                      / (1.0 - rc * rc))

    assert r["r12_nano"] == math.floor(r12 * 1e9 + 0.5)
    assert r["vif_qty_milli"] == math.floor(vif(r12, r13, r23) * 1e3 + 0.5)
    assert r["vif_price_milli"] == math.floor(vif(r12, r23, r13) * 1e3 + 0.5)
    assert r["vif_disc_milli"] == math.floor(vif(r13, r23, r12) * 1e3 + 0.5)
    assert r["vif_qty_milli"] > 100_000        # collinear pair explodes
    assert r["vif_disc_milli"] < 2_000         # independent regressor fine


# ---------------------------------------------------------------------------
# ext_lilliefors
# ---------------------------------------------------------------------------

def _phi_as(z):
    sign = 1 if z >= 0 else -1
    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
         + t * (-1.453152027 + t * 1.061405429)))) * math.exp(-x * x))
    return 0.5 * (1.0 + sign * (1.0 - y))


def _lillie_ref(values):
    from collections import Counter

    cnt = Counter(values)
    n = len(values)
    sx = sum(values)
    sxx = sum(v * v for v in values)
    cum = 0
    dmax = 0
    for v in sorted(cnt):
        c = cnt[v]
        zz = (v - sx * 1.0 / n) / math.sqrt(
            (float(sxx) - sx * 1.0 * sx / n) / (n - 1.0))
        ph = _phi_as(zz)
        up = math.floor(((cum + c) * 1.0 / n - ph) * 1e9 + 0.5)
        dn = math.floor((ph - cum * 1.0 / n) * 1e9 + 0.5)
        dmax = max(dmax, up, dn)
        cum += c
    return (n, dmax, math.floor(dmax / 1e9 * math.sqrt(n * 1.0) * 1e6 + 0.5))


def test_lilliefors_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    vals = [12, 15, 15, 18, 20, 21, 21, 21, 24, 27, 30, 35, 41, 19, 22]
    rows = [("en", v) for v in vals]
    r = _drive(spark, sf_dir, lc, lc.ext_lilliefors,
               {"documents": _docs(spark, rows)})[0]
    assert (r["n_rows"], r["d_nano"], r["d_sqrt_n_micro"]) \
        == _lillie_ref(vals)


def test_lilliefors_bimodal_beats_bellish(spark, sf_dir):
    """A two-cluster sample must sit farther from its fitted normal
    than a symmetric unimodal sample of the same size."""
    import project_etl_spark.operators.llm_curation as lc

    bimodal = [10, 10, 11, 11, 12, 12, 50, 50, 51, 51, 52, 52]
    bell = [28, 29, 30, 30, 31, 31, 31, 31, 32, 32, 33, 34]
    r_b = _drive(spark, sf_dir, lc, lc.ext_lilliefors,
                 {"documents": _docs(spark, [("en", v) for v in bimodal])})[0]
    r_n = _drive(spark, sf_dir, lc, lc.ext_lilliefors,
                 {"documents": _docs(spark, [("en", v) for v in bell])})[0]
    assert r_b["d_nano"] > r_n["d_nano"]


# ---------------------------------------------------------------------------
# ext_distance_correlation
# ---------------------------------------------------------------------------

def _dcor_ref(points):
    """points = [(x, y)] for ONE lang — mirror the n-cleared identity."""
    n = len(points)
    ax = [[abs(points[i][0] - points[j][0]) for j in range(n)]
          for i in range(n)]
    ay = [[abs(points[i][1] - points[j][1]) for j in range(n)]
          for i in range(n)]
    rax = [sum(row) for row in ax]
    ray = [sum(row) for row in ay]
    tax, tay = sum(rax), sum(ray)
    uxy = uxx = uyy = 0
    for i in range(n):
        for j in range(n):
            u = n * n * ax[i][j] - n * rax[i] - n * rax[j] + tax
            v = n * n * ay[i][j] - n * ray[i] - n * ray[j] + tay
            uxy += u * v
            uxx += u * u
            uyy += v * v
    if uxx <= 0 or uyy <= 0:
        return None
    top = float(uxy) if uxy > 0 else 0.0
    dcor = math.sqrt(math.sqrt(top * top / (float(uxx) * float(uyy))))
    return (n, math.floor(dcor * 1e6 + 0.5))


def _panel(spark, pts):
    """pts = [(x_chars_total, y_docs)] -> one doc row per count with
    per-source char totals split as x = y * base + rem."""
    rows = []
    i = 0
    for s, (x, y) in enumerate(pts):
        base, rem = divmod(x, y)
        for k in range(y):
            rows.append((i, "en", "t", f"s{s}", base + (1 if k < rem else 0)))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, "
              "n_chars long")


def test_dcor_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    pts = [(100, 1), (250, 2), (300, 4), (150, 3), (420, 5), (380, 2)]
    r = _drive(spark, sf_dir, lc, lc.ext_distance_correlation,
               {"documents": _panel(spark, pts)})
    assert len(r) == 1
    assert (r[0]["n_points"], r[0]["dcor_micro"]) == _dcor_ref(pts)


def test_dcor_sees_vshape_that_kendall_misses(spark, sf_dir):
    """y = |x - mid| is strongly dependent but non-monotone: dcor must
    be far from 0 there, and larger than on a decoupled panel."""
    import project_etl_spark.operators.llm_curation as lc

    vshape = [(100 * k, abs(k - 4) * 3 + 1) for k in range(9)]
    flat = [(100 * k, y) for k, y in
            zip(range(9), (5, 2, 6, 3, 5, 2, 6, 3, 5))]
    r_v = _drive(spark, sf_dir, lc, lc.ext_distance_correlation,
                 {"documents": _panel(spark, vshape)})[0]
    r_f = _drive(spark, sf_dir, lc, lc.ext_distance_correlation,
                 {"documents": _panel(spark, flat)})[0]
    assert r_v["dcor_micro"] > 500_000
    assert r_v["dcor_micro"] > r_f["dcor_micro"]


# ---------------------------------------------------------------------------
# ext_chapman_dedup_estimate
# ---------------------------------------------------------------------------

def test_chapman_saturated_detector(spark, sf_dir):
    """Two byte-identical docs (J = 1: every band catches them) among
    shingle-disjoint fillers: n1 = n2 = m = 1, N-hat = 1.000, SE 0."""
    import project_etl_spark.operators.llm_dedup as ld

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
        (2, "one two three four five six seven", "en", "s1", 30),
        (3, "red orange yellow green blue indigo", "en", "s2", 30),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    r = _drive(spark, sf_dir, ld, ld.ext_chapman_dedup_estimate,
               {"documents": docs})[0]
    assert (r["n_occ1"], r["n_occ2"], r["n_both"]) == (1, 1, 1)
    assert r["chapman_milli"] == 1000  # (2*2/2 - 1) = 1.000
    assert r["se_milli"] == 0


def test_chapman_close_is_internally_consistent(spark, sf_dir):
    """Whatever the corpus, the emitted estimate/SE must equal the
    Chapman formulas applied to the emitted counts (pins the close
    algebra to the counts, engine-independently)."""
    import project_etl_spark.operators.llm_dedup as ld
    from project_etl_spark.io import table as _table

    r = ld.ext_chapman_dedup_estimate(spark, sf_dir).collect()[0]
    n1, n2, m = r["n_occ1"], r["n_occ2"], r["n_both"]
    assert m <= min(n1, n2)
    est = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    se = math.sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                   / ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    assert r["chapman_milli"] == math.floor(est * 1e3 + 0.5)
    assert r["se_milli"] == math.floor(se * 1e3 + 0.5)
    assert r["chapman_milli"] >= math.floor(
        (max(n1, n2) - 0.5) * 1e3)  # N-hat >= each occasion's count


# ---------------------------------------------------------------------------
# ext_hoeffding_d
# ---------------------------------------------------------------------------

def _hoeffd_ref(points):
    n = len(points)
    if n <= 4:
        return None
    d1 = d2 = d3 = 0
    for i, (xi, yi) in enumerate(points):
        r2 = 1 + sum(2 if xj < xi else (1 if xj == xi else 0)
                     for xj, _ in points)
        s2 = 1 + sum(2 if yj < yi else (1 if yj == yi else 0)
                     for _, yj in points)
        q = 4
        for j, (xj, yj) in enumerate(points):
            if j == i:
                continue
            if xj < xi and yj < yi:
                q += 4
            elif xj == xi and yj < yi:
                q += 2
            elif xj < xi and yj == yi:
                q += 2
            elif xj == xi and yj == yi:
                q += 1
        d1 += (q - 4) * (q - 8)
        d2 += (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
        d3 += (r2 - 4) * (s2 - 4) * (q - 4)
    d = (30.0 * ((n - 2.0) * (n - 3.0) * d1 + float(d2)
                 - 2.0 * (n - 2.0) * float(d3))
         / (16.0 * n * (n - 1.0) * (n - 2.0) * (n - 3.0) * (n - 4.0)))
    return math.floor(d * 1e6 + 0.5)


def test_hoeffding_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    pts = [(100, 1), (250, 2), (300, 4), (150, 3), (420, 5), (380, 2),
           (90, 6), (510, 1)]
    r = _drive(spark, sf_dir, lc, lc.ext_hoeffding_d,
               {"documents": _panel(spark, pts)})
    assert len(r) == 1
    assert (r[0]["n_points"], r[0]["d_micro"]) == (8, _hoeffd_ref(pts))


def test_hoeffding_textbook_properties(spark, sf_dir):
    """Monotone no-tie dependence scores EXACTLY 1; a monotone
    transform of x leaves D unchanged (rank invariance) — the two
    properties that pin the formula transcription."""
    import project_etl_spark.operators.llm_curation as lc

    mono = [(50 * k, k) for k in range(1, 10)]
    r = _drive(spark, sf_dir, lc, lc.ext_hoeffding_d,
               {"documents": _panel(spark, mono)})[0]
    assert r["d_micro"] == 1_000_000
    cubed = [(k * k * k, y) for (_, y), k in zip(mono, range(1, 10))]
    r2 = _drive(spark, sf_dir, lc, lc.ext_hoeffding_d,
                {"documents": _panel(spark, cubed)})[0]
    assert r2["d_micro"] == 1_000_000
