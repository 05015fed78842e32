"""Round-12 second-wave operator tests: planted fixtures checked against
pure-Python textbook references. The differential suite proves Spark ==
DuckDB; these prove both equal the TEXTBOOK (same-on-both semantic bugs
are invisible to the hash)."""

from __future__ import annotations

import datetime as dt
import math


def _drive(spark, sf_dir, module, fn, tables):
    orig = module.table
    module.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        module.table = orig


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


# ---------------------------------------------------------------------------
# ext_stuart_maxwell
# ---------------------------------------------------------------------------

def _sm_events(spark, transitions):
    """One user per (first_class, last_class) transition: two events,
    the earlier carrying the first class, the later the last."""
    rep = {1: "click", 2: "purchase", 3: "error"}
    rows, uid, eid = [], 0, 0
    for (i, j), cnt in transitions.items():
        for _ in range(cnt):
            uid += 1
            rows.append((uid, (eid := eid + 1), rep[i], _ts(1)))
            rows.append((uid, (eid := eid + 1), rep[j], _ts(2)))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp")


def _sm_reference(transitions):
    n = [[0] * 4 for _ in range(4)]
    for (i, j), cnt in transitions.items():
        n[i][j] += cnt
    r = [sum(n[i][j] for j in (1, 2, 3)) for i in (0, 1, 2, 3)]
    c = [sum(n[i][j] for i in (1, 2, 3)) for j in (0, 1, 2, 3)]
    d1, d2 = r[1] - c[1], r[2] - c[2]
    s11 = r[1] + c[1] - 2 * n[1][1]
    s22 = r[2] + c[2] - 2 * n[2][2]
    s12 = -(n[1][2] + n[2][1])
    det = s11 * s22 - s12 * s12
    chi2 = (s22 * d1 * d1 - 2 * s12 * d1 * d2 + s11 * d2 * d2) / det
    return d1, d2, chi2


def test_stuart_maxwell_planted_shift(spark, sf_dir):
    """Strong browse->commit flow: marginals shift, chi2 matches the
    closed-form 2x2-inverse reference."""
    import project_etl_spark.operators.llm_curation as lc

    tr = {(1, 2): 10, (2, 1): 2, (1, 1): 5, (2, 2): 4, (3, 2): 3,
          (1, 3): 1}
    out = _drive(spark, sf_dir, lc, lc.ext_stuart_maxwell,
                 {"events": _sm_events(spark, tr)})
    assert len(out) == 1
    r = out[0]
    d1, d2, chi2 = _sm_reference(tr)
    assert r["n_users"] == sum(tr.values())
    assert r["d1"] == d1 and r["d2"] == d2 and r["df"] == 2
    assert r["chi2_milli"] == math.floor(chi2 * 1e3 + 0.5)


def test_stuart_maxwell_symmetric_is_zero(spark, sf_dir):
    """A perfectly symmetric flow (n_ij == n_ji) has equal marginals:
    chi2 must be exactly 0."""
    import project_etl_spark.operators.llm_curation as lc

    tr = {(1, 2): 4, (2, 1): 4, (1, 3): 2, (3, 1): 2, (2, 2): 3}
    out = _drive(spark, sf_dir, lc, lc.ext_stuart_maxwell,
                 {"events": _sm_events(spark, tr)})
    assert len(out) == 1
    assert out[0]["d1"] == 0 and out[0]["d2"] == 0
    assert out[0]["chi2_milli"] == 0


# ---------------------------------------------------------------------------
# ext_partial_correlation
# ---------------------------------------------------------------------------

def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double")


def _pc_reference(data):
    """Mirror the SQL: integer-quantized inputs, exact sums, fixed-order
    Pearson and partial closes."""
    q = [(int(x), math.floor(p * 1e2 + 0.5), math.floor(d * 1e2 + 0.5))
         for x, p, d in data]
    n = len(q)
    sx = float(sum(r[0] for r in q)); sy = float(sum(r[1] for r in q))
    sz = float(sum(r[2] for r in q))
    sxx = float(sum(r[0] * r[0] for r in q))
    syy = float(sum(r[1] * r[1] for r in q))
    szz = float(sum(r[2] * r[2] for r in q))
    sxy = float(sum(r[0] * r[1] for r in q))
    sxz = float(sum(r[0] * r[2] for r in q))
    syz = float(sum(r[1] * r[2] for r in q))
    rxy = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    rxz = (n * sxz - sx * sz) / math.sqrt(
        (n * sxx - sx * sx) * (n * szz - sz * sz))
    ryz = (n * syz - sy * sz) / math.sqrt(
        (n * syy - sy * sy) * (n * szz - sz * sz))
    rp = (rxy - rxz * ryz) / math.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    return rxy, rxz, ryz, rp


def test_partial_correlation_perfect_line_stays_perfect(spark, sf_dir):
    """y is an exact linear function of x: the marginal AND partial
    correlation (any z with |r_z| < 1) must both be exactly 1."""
    import project_etl_spark.operators.llm_curation as lc

    data = [(float(x), 2.0 * x, 0.01 * ((x % 3) + 1))
            for x in range(1, 9)]
    out = _drive(spark, sf_dir, lc, lc.ext_partial_correlation,
                 {"lineitem": _li(spark, data)})
    assert len(out) == 1
    assert out[0]["r_qty_price_micro"] == 1000000
    assert out[0]["r_partial_micro"] == 1000000


def test_partial_correlation_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    data = [(1.0, 10.11, 0.01), (2.0, 13.42, 0.03), (3.0, 11.07, 0.02),
            (4.0, 19.95, 0.05), (5.0, 17.31, 0.04), (6.0, 25.08, 0.07),
            (7.0, 21.64, 0.05), (8.0, 29.83, 0.09)]
    out = _drive(spark, sf_dir, lc, lc.ext_partial_correlation,
                 {"lineitem": _li(spark, data)})
    r = out[0]
    rxy, rxz, ryz, rp = _pc_reference(data)
    assert r["r_qty_price_micro"] == math.floor(rxy * 1e6 + 0.5)
    assert r["r_qty_disc_micro"] == math.floor(rxz * 1e6 + 0.5)
    assert r["r_price_disc_micro"] == math.floor(ryz * 1e6 + 0.5)
    assert r["r_partial_micro"] == math.floor(rp * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# ext_delta_method_ratio
# ---------------------------------------------------------------------------

def test_delta_ratio_exact_proportionality_has_zero_se(spark, sf_dir):
    """price = 2 dollars * qty exactly -> the ratio is deterministic,
    the delta-method variance collapses to 0 and the CI to a point."""
    import project_etl_spark.operators.llm_curation as lc

    data = [(float(x), 2.0 * x, 0.0) for x in (1, 2, 3, 5, 8)]
    out = _drive(spark, sf_dir, lc, lc.ext_delta_method_ratio,
                 {"lineitem": _li(spark, data)})
    r = out[0]
    assert r["ratio_micro"] == 200 * 1000000  # 200 cents per unit
    assert r["se_micro"] == 0
    assert r["ci_lo_micro"] == r["ratio_micro"] == r["ci_hi_micro"]


def test_delta_ratio_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    data = [(1.0, 3.07, 0.0), (2.0, 5.99, 0.0), (3.0, 10.01, 0.0),
            (4.0, 11.80, 0.0), (5.0, 16.25, 0.0), (6.0, 17.44, 0.0)]
    out = _drive(spark, sf_dir, lc, lc.ext_delta_method_ratio,
                 {"lineitem": _li(spark, data)})
    r = out[0]
    q = [(int(x), math.floor(p * 1e2 + 0.5)) for x, p, _ in data]
    n = len(q)
    sx = float(sum(a for a, _ in q)); sy = float(sum(b for _, b in q))
    sxx = float(sum(a * a for a, _ in q))
    syy = float(sum(b * b for _, b in q))
    sxy = float(sum(a * b for a, b in q))
    rr = sy / sx
    vy = (syy - sy * sy / n) / (n - 1.0)
    vx = (sxx - sx * sx / n) / (n - 1.0)
    cxy = (sxy - sx * sy / n) / (n - 1.0)
    mx = sx / n
    se = math.sqrt((vy - 2.0 * rr * cxy + rr * rr * vx) / (n * mx * mx))
    assert r["ratio_micro"] == math.floor(rr * 1e6 + 0.5)
    assert r["se_micro"] == math.floor(se * 1e6 + 0.5)
    assert r["ci_lo_micro"] == math.floor((rr - 1.96 * se) * 1e6 + 0.5)
    assert r["ci_hi_micro"] == math.floor((rr + 1.96 * se) * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# agg_atkinson_index
# ---------------------------------------------------------------------------

def _orders(spark, prices):
    return spark.createDataFrame([(p,) for p in prices],
                                 "o_totalprice double")


def test_atkinson_equality_is_zero(spark, sf_dir):
    import project_etl_spark.operators.aggregates as ag

    out = _drive(spark, sf_dir, ag, ag.agg_atkinson_index,
                 {"orders": _orders(spark, [100.0] * 4)})
    r = out[0]
    assert r["mean_cents"] == 10000
    assert r["atkinson_e1_micro"] == 0
    assert r["atkinson_e2_micro"] == 0


def test_atkinson_two_point_closed_form(spark, sf_dir):
    """[100, 400] dollars: A(1) = 1 - geo/mean = 1 - 200/250 = 0.2;
    A(2) = 1 - harmonic/mean = 1 - 160/250 = 0.36."""
    import project_etl_spark.operators.aggregates as ag

    out = _drive(spark, sf_dir, ag, ag.agg_atkinson_index,
                 {"orders": _orders(spark, [100.0, 400.0])})
    r = out[0]
    assert r["mean_cents"] == 25000
    assert abs(r["atkinson_e1_micro"] - 200000) <= 1
    assert abs(r["atkinson_e2_micro"] - 360000) <= 1


# ---------------------------------------------------------------------------
# ext_fisher_exact
# ---------------------------------------------------------------------------

def _docs_2x2(spark, a, b, c, d):
    """a = en&long, b = en&short, c = rest&long, d = rest&short."""
    rows = ([("en", 400)] * a + [("en", 100)] * b
            + [("de", 400)] * c + [("de", 100)] * d)
    return spark.createDataFrame(rows, "lang string, n_chars long")


def _fisher_exact_reference(a, b, c, d):
    """Exact hypergeometric tails via math.comb (unquantized)."""
    n, r1, c1 = a + b + c + d, a + b, a + c
    denom = math.comb(n, c1)

    def p(k):
        return math.comb(r1, k) * math.comb(n - r1, c1 - k) / denom

    klo, khi = max(0, r1 + c1 - n), min(r1, c1)
    pobs = p(a)
    two = sum(p(k) for k in range(klo, khi + 1) if p(k) <= pobs * (1 + 1e-9))
    left = sum(p(k) for k in range(klo, a + 1))
    right = sum(p(k) for k in range(a, khi + 1))
    return two, left, right


def test_fisher_exact_matches_hypergeometric(spark, sf_dir):
    """Fisher's classic lopsided 2x2 (8,2,1,9): quantized tails agree
    with the exact math.comb hypergeometric to 1e-6."""
    import project_etl_spark.operators.llm_curation as lc

    a, b, c, d = 8, 2, 1, 9
    out = _drive(spark, sf_dir, lc, lc.ext_fisher_exact,
                 {"documents": _docs_2x2(spark, a, b, c, d)})
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 20 and r["n_en"] == 10
    assert r["n_long"] == 9 and r["n_en_long"] == 8
    two, left, right = _fisher_exact_reference(a, b, c, d)
    assert abs(r["p_two_sided_pico"] / 1e12 - two) < 1e-6
    assert abs(r["p_left_pico"] / 1e12 - left) < 1e-6
    assert abs(r["p_right_pico"] / 1e12 - right) < 1e-6
    orr = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    assert r["or_haldane_micro"] == math.floor(orr * 1e6 + 0.5)


def test_fisher_exact_tails_partition(spark, sf_dir):
    """Left + right - observed must reconstruct the full support mass
    (= 1) on any table; independence-shaped tables are insignificant."""
    import project_etl_spark.operators.llm_curation as lc

    out = _drive(spark, sf_dir, lc, lc.ext_fisher_exact,
                 {"documents": _docs_2x2(spark, 5, 5, 5, 5)})
    r = out[0]
    total = (r["p_left_pico"] + r["p_right_pico"]) / 1e12
    pobs = r["p_obs_pico"] / 1e12 if "p_obs_pico" in r else None
    # left and right overlap exactly at k = a, so their union is
    # 1 + p(a); the two-sided mass on a symmetric table is 1.
    assert abs(r["p_two_sided_pico"] / 1e12 - 1.0) < 1e-6
    two, left, right = _fisher_exact_reference(5, 5, 5, 5)
    assert abs(total - (left + right)) < 1e-6
    assert pobs is None  # p_obs is not an output column


# ---------------------------------------------------------------------------
# ext_dagostino_k2
# ---------------------------------------------------------------------------

def _dk2_reference(xs):
    n = len(xs)
    s1 = sum(xs); s2 = sum(x * x for x in xs)
    s3 = sum(x ** 3 for x in xs); s4 = sum(x ** 4 for x in xs)
    m2 = s2 / n - (s1 / n) ** 2
    m3 = s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) ** 3
    m4 = (s4 / n - 4.0 * (s1 / n) * (s3 / n)
          + 6.0 * (s1 / n) ** 2 * (s2 / n) - 3.0 * (s1 / n) ** 4)
    g1 = m3 / (m2 * math.sqrt(m2))
    b2 = m4 / (m2 * m2)
    y = g1 * math.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    beta2 = (3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0)
             / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0)))
    w2 = math.sqrt(2.0 * (beta2 - 1.0)) - 1.0
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    zs = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))
    e = 3.0 * (n - 1.0) / (n + 1.0)
    v = (24.0 * n * (n - 2.0) * (n - 3.0)
         / ((n + 1.0) ** 2 * (n + 3.0) * (n + 5.0)))
    x = (b2 - e) / math.sqrt(v)
    sb1 = (6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))
           * math.sqrt(6.0 * (n + 3.0) * (n + 5.0)
                       / (n * 1.0 * (n - 2.0) * (n - 3.0))))
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    s = (1.0 - 2.0 / aa) / (1.0 + x * math.sqrt(2.0 / (aa - 4.0)))
    cr = math.copysign(math.exp(math.log(abs(s)) / 3.0), s) if s else 0.0
    zk = (1.0 - 2.0 / (9.0 * aa) - cr) / math.sqrt(2.0 / (9.0 * aa))
    return g1, b2, zs, zk


def test_dagostino_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    xs = [3, 5, 7, 8, 9, 10, 10, 11, 11, 12, 12, 12, 13, 13, 14, 15,
          17, 21, 30, 55, 80]
    docs = spark.createDataFrame([(x,) for x in xs], "n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_dagostino_k2,
                 {"documents": docs})
    assert len(out) == 1
    r = out[0]
    g1, b2, zs, zk = _dk2_reference(xs)
    assert r["skew_micro"] == math.floor(g1 * 1e6 + 0.5)
    assert r["kurtosis_micro"] == math.floor(b2 * 1e6 + 0.5)
    assert r["z_skew_milli"] == math.floor(zs * 1e3 + 0.5)
    assert r["z_kurt_milli"] == math.floor(zk * 1e3 + 0.5)
    assert r["k2_milli"] == math.floor((zs * zs + zk * zk) * 1e3 + 0.5)
    assert g1 > 1.0 and r["z_skew_milli"] > 2000  # clearly right-skewed


def test_dagostino_symmetric_sample_has_zero_skew_z(spark, sf_dir):
    """A perfectly symmetric sample: m3 = 0 exactly, so Y = 0 and the
    Johnson SU transform is exactly asinh(0) = 0."""
    import project_etl_spark.operators.llm_curation as lc

    xs = list(range(1, 26)) + list(range(1, 26))  # symmetric? no — uniform
    xs = [x for x in range(1, 26)] + [26 - x for x in range(1, 26)]
    docs = spark.createDataFrame([(x,) for x in xs], "n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_dagostino_k2,
                 {"documents": docs})
    assert out[0]["skew_micro"] == 0
    assert out[0]["z_skew_milli"] == 0


# ---------------------------------------------------------------------------
# ext_anderson_darling
# ---------------------------------------------------------------------------

def _ad_reference(en, rest):
    """Discrete Scholz-Stephens A2 at k = 2, mirroring the quantized
    per-block milli sum."""
    from collections import Counter

    ce, cr = Counter(en), Counter(rest)
    vals = sorted(set(en) | set(rest))
    n1, n = len(en), len(en) + len(rest)
    b = m = 0
    inner_milli = 0
    for v in vals:
        l1, l = ce.get(v, 0), ce.get(v, 0) + cr.get(v, 0)
        b += l; m += l1
        if b < n:
            d = float(n * m - n1 * b)
            inner_milli += math.floor(l * d * d / (b * 1.0 * (n - b))
                                      * 1e3 + 0.5)
    a2 = (1.0 / n1 + 1.0 / (n - n1)) / n * (inner_milli / 1e3)
    return math.floor(a2 * 1e6 + 0.5)


def _docs_two_groups(spark, en, rest):
    rows = [("en", v) for v in en] + [("de", v) for v in rest]
    return spark.createDataFrame(rows, "lang string, n_chars long")


def test_anderson_darling_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    en = [1, 3, 3, 5, 7, 9, 11, 11, 15]
    rest = [2, 3, 4, 6, 8, 10, 11, 14]
    out = _drive(spark, sf_dir, lc, lc.ext_anderson_darling,
                 {"documents": _docs_two_groups(spark, en, rest)})
    r = out[0]
    assert r["n_en"] == 9 and r["n_rest"] == 8 and r["h0_mean"] == 1
    assert r["a2_micro"] == _ad_reference(en, rest)


def test_anderson_darling_separated_vs_mixed(spark, sf_dir):
    """Disjoint supports must score far above the H0 mean of 1;
    identical samples far below it."""
    import project_etl_spark.operators.llm_curation as lc

    far = _drive(spark, sf_dir, lc, lc.ext_anderson_darling,
                 {"documents": _docs_two_groups(
                     spark, [1, 2, 3, 4, 5, 6], [11, 12, 13, 14, 15, 16])})
    same = _drive(spark, sf_dir, lc, lc.ext_anderson_darling,
                  {"documents": _docs_two_groups(
                      spark, [1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6])})
    assert far[0]["a2_micro"] > 3_000_000       # >> 1
    assert same[0]["a2_micro"] < 1_000_000      # << separated


# ---------------------------------------------------------------------------
# ext_ansari_bradley
# ---------------------------------------------------------------------------

def _ab_reference(en, rest):
    """Brute-force midrank Ansari-Bradley in DOUBLED score units,
    mirroring the per-block milli quantization."""
    from collections import Counter

    ce = Counter(en)
    call = Counter(en + rest)
    n = len(en) + len(rest)
    m1 = len(en)
    # doubled scores per position
    s2pos = [2 * min(r, n + 1 - r) for r in range(1, n + 1)]
    vals = sorted(call)
    b = 0
    t2_milli = 0
    stot2 = 0
    ssq_milli = 0
    for v in vals:
        l, l1 = call[v], ce.get(v, 0)
        block = s2pos[b:b + l]
        s2 = sum(block)
        av = s2 / l
        t2_milli += math.floor(l1 * av * 1e3 + 0.5)
        ssq_milli += math.floor(l * av * av * 1e3 + 0.5)
        stot2 += s2
        b += l
    e2 = m1 * stot2 / n
    var = (m1 * (n - m1)
           * (n * (ssq_milli / 1e3) - stot2 * 1.0 * stot2)
           / (n * 1.0 * n * (n - 1.0)))
    z = (t2_milli / 1e3 - e2) / math.sqrt(var)
    return (t2_milli, math.floor(e2 * 1e3 + 0.5),
            math.floor(z * 1e3 + 0.5))


def test_ansari_bradley_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    en = [10, 12, 14, 15, 16, 18, 20]          # tight around the middle
    rest = [1, 5, 8, 14, 22, 26, 30, 33]       # spread to both tails
    out = _drive(spark, sf_dir, lc, lc.ext_ansari_bradley,
                 {"documents": _docs_two_groups(spark, en, rest)})
    r = out[0]
    t2, e2, z = _ab_reference(en, rest)
    assert r["ab2_milli"] == t2
    assert r["e2_milli"] == e2
    assert r["z_milli"] == z
    assert z > 1000  # middle-concentrated group scores high


def test_ansari_bradley_ties_use_midranks(spark, sf_dir):
    """Heavy ties across groups: block averaging must reproduce the
    brute-force midrank reference exactly."""
    import project_etl_spark.operators.llm_curation as lc

    en = [5, 5, 5, 7, 7, 9]
    rest = [5, 7, 7, 7, 9, 9, 9]
    out = _drive(spark, sf_dir, lc, lc.ext_ansari_bradley,
                 {"documents": _docs_two_groups(spark, en, rest)})
    r = out[0]
    t2, e2, z = _ab_reference(en, rest)
    assert (r["ab2_milli"], r["e2_milli"], r["z_milli"]) == (t2, e2, z)


# ---------------------------------------------------------------------------
# ext_conover_squared_ranks
# ---------------------------------------------------------------------------

def _conover_reference(groups):
    """Brute-force Conover squared-ranks with lower medians, doubled
    midranks and exact integer sums (4x/16x scalings cancel)."""
    from collections import Counter

    devs = {}
    for g, xs in groups.items():
        srt = sorted(xs)
        med = srt[(len(srt) - 1) // 2]  # lower median = 2*cum >= n rule
        devs[g] = [abs(x - med) for x in xs]
    pooled = Counter()
    for ds in devs.values():
        pooled.update(ds)
    n = sum(pooled.values())
    mr2 = {}
    b = 0
    for u in sorted(pooled):
        l = pooled[u]
        mr2[u] = 2 * b + l + 1
        b += l
    sg = {g: sum(mr2[u] ** 2 for u in ds) for g, ds in devs.items()}
    stot4 = sum(pooled[u] * mr2[u] ** 2 for u in pooled)
    s16 = sum(pooled[u] * mr2[u] ** 4 for u in pooled)
    ssn = sum(s * s / len(devs[g]) for g, s in sg.items())
    sbar = stot4 / n
    t = (ssn - n * sbar * sbar) / ((s16 - n * sbar * sbar) / (n - 1.0))
    return math.floor(t * 1e3 + 0.5)


def test_conover_mirrors_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    groups = {"a": [10, 11, 12, 13, 14],        # tight
              "b": [1, 8, 12, 20, 31],          # wide
              "c": [5, 6, 9, 12, 12, 15]}       # medium, with ties
    rows = [(g, v) for g, xs in groups.items() for v in xs]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_conover_squared_ranks,
                 {"documents": docs})
    r = out[0]
    assert r["n_groups"] == 3 and r["df"] == 2
    assert r["n_rows"] == 16
    assert r["t_milli"] == _conover_reference(groups)
    assert r["t_milli"] > 0


def test_conover_equal_spread_is_small(spark, sf_dir):
    """Identical shapes shifted in location: deviations are identical,
    per-group squared-rank means coincide, T collapses toward 0."""
    import project_etl_spark.operators.llm_curation as lc

    groups = {"a": [10, 12, 14, 16, 18], "b": [110, 112, 114, 116, 118]}
    rows = [(g, v) for g, xs in groups.items() for v in xs]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    out = _drive(spark, sf_dir, lc, lc.ext_conover_squared_ranks,
                 {"documents": docs})
    assert out[0]["t_milli"] == 0  # identical deviation multisets
