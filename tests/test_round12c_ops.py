"""Round-12 third-wave operator tests: planted fixtures checked against
pure-Python textbook references for the serial-correlation /
stationarity closes. The differential suite proves Spark == DuckDB;
these prove both equal the TEXTBOOK (same-on-both semantic bugs are
invisible to the hash)."""

from __future__ import annotations

import math


def _drive(spark, sf_dir, module, fn, tables):
    orig = module.table
    module.table = lambda s, d, n: tables[n]
    try:
        return fn(spark, sf_dir).collect()
    finally:
        module.table = orig


def _orders_from_day_counts(spark, counts, price=None):
    """One fake order row per unit of count on consecutive epoch days;
    optional per-day price (same price for every order of the day)."""
    import datetime

    rows = []
    k = 0
    for d, c in enumerate(counts):
        p = 1.0 if price is None else float(price[d])
        for _ in range(c):
            rows.append((k, datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(days=d, hours=1), p))
            k += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double")


def _trend_residuals_milli(counts):
    """Mirror the shared SQL's OLS close + per-day milli residuals."""
    n = len(counts)
    ds = list(range(n))
    sd, sc = sum(ds), sum(counts)
    sdc = sum(d * c for d, c in zip(ds, counts))
    sdd = sum(d * d for d in ds)
    b = (n * 1.0 * sdc - sd * 1.0 * sc) / (n * 1.0 * sdd - sd * 1.0 * sd)
    return [math.floor((c - (sc - b * sd) / n - b * d) * 1e3 + 0.5)
            for d, c in zip(ds, counts)], b, sd, sc


def _trend_residuals_permille(counts):
    """Mirror the relative (per-mille-of-mean) residual quantization."""
    n = len(counts)
    ds = list(range(n))
    sd, sc = sum(ds), sum(counts)
    sdc = sum(d * c for d, c in zip(ds, counts))
    sdd = sum(d * d for d in ds)
    b = (n * 1.0 * sdc - sd * 1.0 * sc) / (n * 1.0 * sdd - sd * 1.0 * sd)
    return [math.floor((c - (sc - b * sd) / n - b * d) * (n * 1e3) / sc
                       + 0.5)
            for d, c in zip(ds, counts)]


# ---------------------------------------------------------------------------
# ext_cox_stuart
# ---------------------------------------------------------------------------

def test_cox_stuart_planted_trend(spark, sf_dir):
    """Strictly rising 9-day series: k = 5, m = 4 pairs, all positive;
    z = (2*4 - 4)/2 = 2."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    r = _drive(spark, sf_dir, lc, lc.ext_cox_stuart,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    assert (r["n_days"], r["n_pairs"], r["n_eff"], r["s_plus"]) == (9, 4, 4, 4)
    assert r["z_micro"] == math.floor(
        (2.0 * 4 - 4) / math.sqrt(4.0) * 1e6 + 0.5)


def test_cox_stuart_ties_drop_and_guard(spark, sf_dir):
    """Half-offset ties are dropped from n_eff; an all-constant series
    leaves n_eff = 0 and the guard must emit 0 rows."""
    import project_etl_spark.operators.llm_curation as lc

    # days 0-5: [4,9,2, 4,1,8] -> pairs (4,4)t,(9,1)-,(2,8)+ : n_eff=2
    counts = [4, 9, 2, 4, 1, 8]
    r = _drive(spark, sf_dir, lc, lc.ext_cox_stuart,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    assert (r["n_pairs"], r["n_eff"], r["s_plus"]) == (3, 2, 1)
    out = _drive(spark, sf_dir, lc, lc.ext_cox_stuart,
                 {"orders": _orders_from_day_counts(spark, [3] * 8)})
    assert out == []


# ---------------------------------------------------------------------------
# ext_bartels_rank
# ---------------------------------------------------------------------------

def _bartels_ref(counts):
    from collections import Counter

    n = len(counts)
    cnt = Counter(counts)
    r2map, cum = {}, 0
    for v in sorted(cnt):
        r2map[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    r2s = [r2map[c] for c in counts]
    num = sum((r2s[i] - r2s[i + 1]) ** 2 for i in range(n - 1))
    den = sum((x - (n + 1)) ** 2 for x in r2s)
    var = (4.0 * (n - 2) * (5.0 * n * n - 2.0 * n - 9.0)
           / (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0)))
    z = (num * 1.0 / den - 2.0) / math.sqrt(var)
    return (n, math.floor(num * 1e6 / den + 0.5),
            math.floor(z * 1e6 + 0.5))


def test_bartels_rank_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12]
    r = _drive(spark, sf_dir, lc, lc.ext_bartels_rank,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    assert (r["n_days"], r["rvn_micro"], r["z_micro"]) == _bartels_ref(counts)


def test_bartels_rank_monotone_vs_alternating(spark, sf_dir):
    """A monotone series has successive rank diffs of exactly 1 ->
    RVN far below 2 (trend); an alternating series pushes RVN above
    2 (negative dependence)."""
    import project_etl_spark.operators.llm_curation as lc

    mono = list(range(1, 13))
    r = _drive(spark, sf_dir, lc, lc.ext_bartels_rank,
               {"orders": _orders_from_day_counts(spark, mono)})[0]
    assert r["rvn_micro"] < 1_000_000 and r["z_micro"] < -2_000_000
    alt = [1, 12, 2, 11, 3, 10, 4, 9, 5, 8, 6, 7]
    r = _drive(spark, sf_dir, lc, lc.ext_bartels_rank,
               {"orders": _orders_from_day_counts(spark, alt)})[0]
    assert r["rvn_micro"] > 2_000_000


# ---------------------------------------------------------------------------
# ext_kpss_test
# ---------------------------------------------------------------------------

def _kpss_ref(counts):
    n = len(counts)
    sc = sum(counts)
    us = [n * c - sc for c in counts]
    pss, s = [], 0
    for u in us:
        s += u
        pss.append(s)
    ssum = sum(x * x for x in pss)
    g = [sum(us[t] * us[t - l] for t in range(l, n)) for l in range(5)]
    dv = n * (5 * g[0] + 2 * sum((5 - l) * g[l] for l in range(1, 5)))
    return (n, math.floor(5.0 * float(ssum) / float(dv) * 1e6 + 0.5))


def test_kpss_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [7, 9, 6, 11, 8, 13, 7, 15, 9, 16, 5, 12, 10, 8]
    r = _drive(spark, sf_dir, lc, lc.ext_kpss_test,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    assert (r["n_days"], r["kpss_micro"]) == _kpss_ref(counts)


def test_kpss_trend_rejects_harder_than_level(spark, sf_dir):
    """A strong trend inflates the partial sums: its KPSS must exceed a
    shuffled (level-stationary-ish) arrangement of the SAME values."""
    import project_etl_spark.operators.llm_curation as lc

    trend = [2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24]
    level = [2, 24, 4, 22, 6, 20, 8, 18, 10, 16, 12, 14]
    r_t = _drive(spark, sf_dir, lc, lc.ext_kpss_test,
                 {"orders": _orders_from_day_counts(spark, trend)})[0]
    r_l = _drive(spark, sf_dir, lc, lc.ext_kpss_test,
                 {"orders": _orders_from_day_counts(spark, level)})[0]
    assert r_t["kpss_micro"] > r_l["kpss_micro"]


# ---------------------------------------------------------------------------
# ext_breusch_godfrey
# ---------------------------------------------------------------------------

def _two_regressor_r2(trips):
    """R^2 of v on (a, b) from the three pairwise correlations —
    mirrors the shared SQL close exactly (same order)."""
    n1 = len(trips)
    sv = sum(t[0] for t in trips)
    sa = sum(t[1] for t in trips)
    sb = sum(t[2] for t in trips)
    svv = sum(t[0] * t[0] for t in trips)
    saa = sum(t[1] * t[1] for t in trips)
    sbb = sum(t[2] * t[2] for t in trips)
    sva = sum(t[0] * t[1] for t in trips)
    svb = sum(t[0] * t[2] for t in trips)
    sab = sum(t[1] * t[2] for t in trips)
    cvv = n1 * float(svv) - float(sv) * float(sv)
    caa = n1 * float(saa) - float(sa) * float(sa)
    cbb = n1 * float(sbb) - float(sb) * float(sb)
    cva = n1 * float(sva) - float(sv) * float(sa)
    cvb = n1 * float(svb) - float(sv) * float(sb)
    cab = n1 * float(sab) - float(sa) * float(sb)
    r1 = cva / math.sqrt(caa * cvv)
    r2 = cvb / math.sqrt(cbb * cvv)
    r12 = cab / math.sqrt(caa * cbb)
    return (r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12) / (1.0 - r12 * r12)


def test_breusch_godfrey_matches_python_reference(spark, sf_dir):
    """BG regresses e_t on (t, e_{t-1}): mirror residuals + R^2 close."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    r = _drive(spark, sf_dir, lc, lc.ext_breusch_godfrey,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    em, _, _, _ = _trend_residuals_milli(counts)
    n = len(counts)
    trips = [(em[i], i, em[i - 1]) for i in range(1, n)]  # (e, t, elag)
    rsq = _two_regressor_r2(trips)
    n1 = n - 1
    assert r["n_used"] == n1
    assert r["r2_nano"] == math.floor(rsq * 1e9 + 0.5)
    assert r["lm_micro"] == math.floor(n1 * rsq * 1e6 + 0.5)


def test_breusch_godfrey_ar_residuals_flagged(spark, sf_dir):
    """Counts built so residuals alternate strongly around the trend:
    |rho1| is large, so LM must be well above the chi2(1) 5% cut."""
    import project_etl_spark.operators.llm_curation as lc

    counts = [(10 + d) + (6 if d % 2 == 0 else -6) for d in range(16)]
    r = _drive(spark, sf_dir, lc, lc.ext_breusch_godfrey,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    assert r["lm_micro"] > 3_841_000  # chi2(1) 95% = 3.841


# ---------------------------------------------------------------------------
# ext_engle_arch_lm
# ---------------------------------------------------------------------------

def test_engle_arch_lm_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    r = _drive(spark, sf_dir, lc, lc.ext_engle_arch_lm,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    rm = _trend_residuals_permille(counts)
    n = len(counts)
    pairs = [(rm[i] * rm[i], rm[i - 1] * rm[i - 1]) for i in range(1, n)]
    n1 = len(pairs)
    sv = sum(p[0] for p in pairs)
    sl = sum(p[1] for p in pairs)
    svv = sum(p[0] * p[0] for p in pairs)
    sll = sum(p[1] * p[1] for p in pairs)
    svl = sum(p[0] * p[1] for p in pairs)
    rho = ((n1 * float(svl) - float(sv) * float(sl))
           / math.sqrt((n1 * float(svv) - float(sv) ** 2)
                       * (n1 * float(sll) - float(sl) ** 2)))
    assert r["n_used"] == n1
    assert r["r2_nano"] == math.floor(rho * rho * 1e9 + 0.5)
    assert r["lm_micro"] == math.floor(n1 * rho * rho * 1e6 + 0.5)


def test_engle_arch_lm_clustered_vs_flat_volatility(spark, sf_dir):
    """Persistent bursts (big deviations following big deviations) must
    score higher LM than the same deviations interleaved."""
    import project_etl_spark.operators.llm_curation as lc

    base = 20
    burst = [base + e for e in
             (9, -9, 10, -10, 9, -10, 1, -1, 1, -1, 1, -1, 9, -9, 10, -10)]
    flat = [base + e for e in
            (9, -1, 10, -1, 9, -1, 1, -9, 1, -10, 1, -9, 9, -1, 10, -10)]
    r_b = _drive(spark, sf_dir, lc, lc.ext_engle_arch_lm,
                 {"orders": _orders_from_day_counts(spark, burst)})[0]
    r_f = _drive(spark, sf_dir, lc, lc.ext_engle_arch_lm,
                 {"orders": _orders_from_day_counts(spark, flat)})[0]
    assert r_b["lm_micro"] > r_f["lm_micro"]


# ---------------------------------------------------------------------------
# ext_newey_west_slope
# ---------------------------------------------------------------------------

def _nw_ref(counts):
    n = len(counts)
    em, b, sd, sc = _trend_residuals_milli(counts)
    X = [n * d - sd for d in range(n)]
    w = [X[d] * em[d] for d in range(n)]
    see = sum(e * e for e in em)
    sxx = sum(x * x for x in X)
    g = [sum(w[t] * w[t - l] for t in range(l, n)) for l in range(5)]
    g5 = 5 * g[0] + 2 * sum((5 - l) * g[l] for l in range(1, 5))
    se_ols = n * math.sqrt(float(see) / 1e6 / (n - 2.0) / float(sxx))
    se_nw = n * math.sqrt(float(g5) / 5.0) / (1e3 * float(sxx))
    return (n, math.floor(b * 1e9 + 0.5), math.floor(se_ols * 1e9 + 0.5),
            math.floor(se_nw * 1e9 + 0.5),
            math.floor(se_nw / se_ols * 1e3 + 0.5))


def test_newey_west_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    r = _drive(spark, sf_dir, lc, lc.ext_newey_west_slope,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    ref = _nw_ref(counts)
    got = (r["n_days"], r["slope_nano"], r["se_ols_nano"],
           r["se_nw_nano"], r["ratio_milli"])
    assert got == ref


def test_newey_west_widens_under_positive_autocorr(spark, sf_dir):
    """Runs of same-sign residuals (positive autocorrelation) must give
    se_nw > se_ols; sign-alternating residuals must shrink it."""
    import project_etl_spark.operators.llm_curation as lc

    wave = (0, 3, 6, 7, 8, 7, 6, 3, 0, -3, -6, -7, -8, -7, -6, -3)
    runs = [(40 + d) + wave[d % 16] for d in range(32)]
    alt = [(40 + d) + (8 if d % 2 == 0 else -8) for d in range(32)]
    r_r = _drive(spark, sf_dir, lc, lc.ext_newey_west_slope,
                 {"orders": _orders_from_day_counts(spark, runs)})[0]
    r_a = _drive(spark, sf_dir, lc, lc.ext_newey_west_slope,
                 {"orders": _orders_from_day_counts(spark, alt)})[0]
    assert r_r["ratio_milli"] > 1000 > r_a["ratio_milli"]


# ---------------------------------------------------------------------------
# ext_chow_test
# ---------------------------------------------------------------------------

def _chow_ref(counts):
    n = len(counts)
    ds = list(range(n))

    def rss(idx):
        ng = len(idx)
        sdl = sum(ds[i] for i in idx)
        scl = sum(counts[i] for i in idx)
        sdcl = sum(ds[i] * counts[i] for i in idx)
        sddl = sum(ds[i] * ds[i] for i in idx)
        sccl = sum(counts[i] * counts[i] for i in idx)
        return ((float(sccl) - scl * 1.0 * scl / ng)
                - (sdcl * 1.0 - sdl * 1.0 * scl / ng) ** 2
                / (sddl * 1.0 - sdl * 1.0 * sdl / ng))

    h = n // 2
    r1, r2, rp = rss(range(h)), rss(range(h, n)), rss(range(n))
    f = ((rp - (r1 + r2)) / 2.0) / ((r1 + r2) / (n - 4.0))
    return (n, math.floor(rp * 1e3 + 0.5),
            math.floor((r1 + r2) * 1e3 + 0.5), math.floor(f * 1e6 + 0.5))


def test_chow_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    r = _drive(spark, sf_dir, lc, lc.ext_chow_test,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    ref = _chow_ref(counts)
    got = (r["n_days"], r["rss_pooled_milli"], r["rss_split_milli"],
           r["f_micro"])
    assert got == ref


def test_chow_detects_slope_break(spark, sf_dir):
    """Slope +1 then slope +5 (with small noise so no segment is an
    exact fit): the pooled fit is far worse than the split fits, so F
    must dwarf the no-break arrangement's."""
    import project_etl_spark.operators.llm_curation as lc

    noise = (1, 0, -1, 0, 1, 0, -1, 0)
    broken = [10 + d + noise[d] for d in range(8)] \
        + [18 + 5 * d + noise[d] for d in range(8)]
    steady = [10 + d + noise[d % 8] for d in range(16)]
    r_b = _drive(spark, sf_dir, lc, lc.ext_chow_test,
                 {"orders": _orders_from_day_counts(spark, broken)})[0]
    r_s = _drive(spark, sf_dir, lc, lc.ext_chow_test,
                 {"orders": _orders_from_day_counts(spark, steady)})[0]
    assert r_b["f_micro"] > 100 * max(r_s["f_micro"], 1)


# ---------------------------------------------------------------------------
# ext_white_test
# ---------------------------------------------------------------------------

def test_white_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    r = _drive(spark, sf_dir, lc, lc.ext_white_test,
               {"orders": _orders_from_day_counts(spark, counts)})[0]
    rm = _trend_residuals_permille(counts)
    n = len(counts)
    trips = [(rm[d] * rm[d], d, d * d) for d in range(n)]  # t anchored at 0
    rsq = _two_regressor_r2(trips)
    assert r["n_days"] == n
    assert r["r2_nano"] == math.floor(rsq * 1e9 + 0.5)
    assert r["lm_micro"] == math.floor(n * rsq * 1e6 + 0.5)


def test_white_flags_level_dependent_variance(spark, sf_dir):
    """Residual spread growing with the day index must score a higher
    LM than the same deviations shuffled evenly across time."""
    import project_etl_spark.operators.llm_curation as lc

    grow = [(20 + d) + e for d, e in enumerate(
        (0, 1, -1, 1, -2, 2, -3, 3, -5, 5, -8, 8, -11, 11, -14, 14))]
    even = [(20 + d) + e for d, e in enumerate(
        (-14, 14, -1, 1, -11, 11, -2, 2, -8, 8, -3, 3, -5, 5, 0, 1))]
    r_g = _drive(spark, sf_dir, lc, lc.ext_white_test,
                 {"orders": _orders_from_day_counts(spark, grow)})[0]
    r_e = _drive(spark, sf_dir, lc, lc.ext_white_test,
                 {"orders": _orders_from_day_counts(spark, even)})[0]
    assert r_g["lm_micro"] > r_e["lm_micro"]


# ---------------------------------------------------------------------------
# ext_granger_lag1
# ---------------------------------------------------------------------------

def _granger_ref(xs, ys):
    n = len(xs)
    trips = [(ys[i], ys[i - 1], xs[i - 1]) for i in range(1, n)]
    n1 = len(trips)
    sy = sum(t[0] for t in trips)
    sl = sum(t[1] for t in trips)
    sx = sum(t[2] for t in trips)
    syy = sum(t[0] * t[0] for t in trips)
    sll = sum(t[1] * t[1] for t in trips)
    sxx = sum(t[2] * t[2] for t in trips)
    syl = sum(t[0] * t[1] for t in trips)
    syx = sum(t[0] * t[2] for t in trips)
    slx = sum(t[1] * t[2] for t in trips)
    cyy = n1 * float(syy) - float(sy) ** 2
    cll = n1 * float(sll) - float(sl) ** 2
    cxx = n1 * float(sxx) - float(sx) ** 2
    cyl = n1 * float(syl) - float(sy) * float(sl)
    cyx = n1 * float(syx) - float(sy) * float(sx)
    clx = n1 * float(slx) - float(sl) * float(sx)
    r1 = cyl / math.sqrt(cll * cyy)
    r2 = cyx / math.sqrt(cxx * cyy)
    r12 = clx / math.sqrt(cll * cxx)
    r2r = r1 * r1
    r2u = (r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12) / (1.0 - r12 * r12)
    f = (r2u - r2r) * (n1 - 3.0) / (1.0 - r2u)
    return (n1, math.floor(r2r * 1e9 + 0.5), math.floor(r2u * 1e9 + 0.5),
            math.floor(f * 1e6 + 0.5))


def test_granger_matches_python_reference(spark, sf_dir):
    import project_etl_spark.operators.llm_curation as lc

    counts = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    price = [3.0, 7.0, 2.0, 9.0, 5.0, 8.0, 1.0, 6.0, 4.0, 10.0, 2.5,
             7.5, 3.5, 5.5]
    r = _drive(spark, sf_dir, lc, lc.ext_granger_lag1,
               {"orders": _orders_from_day_counts(spark, counts, price)})[0]
    ys = [c * math.floor(p * 100 + 0.5) for c, p in zip(counts, price)]
    ref = _granger_ref(counts, ys)
    got = (r["n_used"], r["r2_restricted_nano"],
           r["r2_unrestricted_nano"], r["f_micro"])
    assert got == ref


def test_granger_lagged_driver_beats_decoupled(spark, sf_dir):
    """Revenue built as y_t = 100 * x_{t-1} (plus a base) must yield a
    much larger F than revenue decoupled from the count series."""
    import project_etl_spark.operators.llm_curation as lc

    xs = [5, 9, 6, 11, 7, 13, 8, 15, 9, 16, 4, 12, 11, 6]
    n = len(xs)
    # price chosen so y_day = c * cents tracks x_{t-1}: p_d = x_{d-1}/c_d
    price_driven = [round(xs[d - 1] / xs[d], 2) if d else 1.0
                    for d in range(n)]
    price_flat = [3.1, 2.7, 4.2, 1.9, 3.8, 2.2, 4.7, 1.4, 3.3, 2.9,
                  4.1, 1.7, 3.6, 2.4]
    r_d = _drive(spark, sf_dir, lc, lc.ext_granger_lag1,
                 {"orders": _orders_from_day_counts(spark, xs,
                                                    price_driven)})[0]
    r_f = _drive(spark, sf_dir, lc, lc.ext_granger_lag1,
                 {"orders": _orders_from_day_counts(spark, xs,
                                                    price_flat)})[0]
    assert r_d["f_micro"] > r_f["f_micro"]
