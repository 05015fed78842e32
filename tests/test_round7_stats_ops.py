"""Planted-data tests for the round-7 non-parametric statistics pair:
Mann-Whitney U (tie-corrected rank-sum) and Kendall tau-b. Each test
computes the textbook statistic with an independent pure-Python midrank /
concordance implementation and checks the operator's grouped-by-value
algebra reproduces it exactly.
"""

from __future__ import annotations

import math


def _mwu_reference(a, b):
    """Textbook tie-corrected Mann-Whitney over cohorts a (EN) and b."""
    pooled = sorted((v, 0) for v in a) + sorted((v, 1) for v in b)
    pooled.sort(key=lambda t: t[0])
    n = len(pooled)
    ranks = {}
    i = 0
    tie_term = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0          # midrank of positions i+1..j
        ranks[pooled[i][0]] = mid
        t = j - i
        tie_term += t ** 3 - t
        i = j
    n_a, n_b = len(a), len(b)
    r_a = sum(ranks[v] for v in a)
    u = r_a - n_a * (n_a + 1) / 2.0
    var = n_a * n_b / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - n_a * n_b / 2.0) / math.sqrt(var)
    return n_a, n_b, int(2 * u), math.floor(z * 1e3 + 0.5)


def test_mann_whitney_matches_textbook_midranks(spark):
    from project_etl_spark.operators.llm_curation import _MWU_BODY

    # Heavy ties on purpose: EN lengths skew high, two shared values.
    en = [10, 10, 14, 14, 14, 20, 25, 25, 30]
    xx = [5, 7, 10, 10, 12, 14, 14, 18]
    rows = [(v, "en") for v in en] + [(v, "de") for v in xx]
    spark.createDataFrame(rows, "n_chars int, lang string") \
        .createOrReplaceTempView("mwu_planted")
    got = spark.sql(_MWU_BODY.format(src="mwu_planted")).collect()[0]
    n_a, n_b, u2, z_milli = _mwu_reference(en, xx)
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert got["u2"] == u2
    assert got["z_milli"] == z_milli


def test_mann_whitney_symmetric_cohorts_center_at_zero(spark):
    from project_etl_spark.operators.llm_curation import _MWU_BODY

    # Identical cohorts -> U exactly n_a*n_b/2, z exactly 0.
    vals = [3, 5, 5, 8, 13, 21]
    rows = [(v, "en") for v in vals] + [(v, "fr") for v in vals]
    spark.createDataFrame(rows, "n_chars int, lang string") \
        .createOrReplaceTempView("mwu_sym")
    got = spark.sql(_MWU_BODY.format(src="mwu_sym")).collect()[0]
    assert got["u2"] == len(vals) * len(vals)   # doubled U = 2 * n²/2
    assert got["z_milli"] == 0


def _tau_b_reference(pairs):
    """Textbook tau-b over (x, y) item pairs."""
    n0 = nc = nd = t1 = t2 = 0
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            (xa, ya), (xb, yb) = pairs[i], pairs[j]
            n0 += 1
            s = (xa - xb) * (ya - yb)
            if s > 0:
                nc += 1
            elif s < 0:
                nd += 1
            if xa == xb:
                t1 += 1
            if ya == yb:
                t2 += 1
    tau = (nc - nd) / math.sqrt((n0 - t1) * (n0 - t2))
    return n0, nc, nd, math.floor(tau * 1e3 + 0.5)


def test_kendall_tau_matches_textbook_concordance(spark):
    from project_etl_spark.operators.llm_curation import _KENDALL_BODY

    # One language, five sources; metric pairs include an x-tie and a
    # y-tie so the tau-b denominator correction is exercised.
    per_source = {
        "s1": [40, 60],          # x=100, y=2
        "s2": [100, 100, 100],   # x=300, y=3
        "s3": [150, 150],        # x=300, y=2  (x tie with s2, y tie s1)
        "s4": [500],             # x=500, y=1
        "s5": [80, 90, 95, 95],  # x=360, y=4
    }
    rows = [(n, "en", s) for s, lens in per_source.items() for n in lens]
    spark.createDataFrame(rows, "n_chars int, lang string, source string") \
        .createOrReplaceTempView("tau_planted")
    got = spark.sql(_KENDALL_BODY.format(src="tau_planted")).collect()
    assert len(got) == 1 and got[0]["lang"] == "en"
    pairs = [(sum(v), len(v)) for v in per_source.values()]
    n0, nc, nd, tau_milli = _tau_b_reference(pairs)
    r = got[0]
    assert (r["n_pairs"], r["n_conc"], r["n_disc"]) == (n0, nc, nd)
    assert r["tau_milli"] == tau_milli


def test_kendall_tau_excludes_fully_tied_language(spark):
    from project_etl_spark.operators.llm_curation import _KENDALL_BODY

    # Language 'zz' has every source contributing identical (x, y):
    # its tau-b denominator is 0, so the row must be excluded, while
    # the well-behaved language (x AND y both varying — doc count must
    # vary too, since y = COUNT(*)) survives.
    rows = [(100, "zz", f"s{i}") for i in range(4)]
    for i in range(1, 5):
        rows += [(10 * i, "en", f"s{i}")] * i
    spark.createDataFrame(rows, "n_chars int, lang string, source string") \
        .createOrReplaceTempView("tau_tied")
    langs = {r["lang"]
             for r in spark.sql(_KENDALL_BODY.format(src="tau_tied")).collect()}
    assert langs == {"en"}


def test_kendall_perfect_monotone_is_plus_minus_one(spark):
    from project_etl_spark.operators.llm_curation import _KENDALL_BODY

    # x strictly increasing with y -> tau = +1; anti-monotone -> tau = -1.
    # y = COUNT(*), so per-doc chars must grow fast enough that total
    # chars still rises while the doc count falls (10^i beats 5-i).
    rows = []
    for i in range(1, 5):
        rows += [(10 * i, "up", f"s{i}")] * i          # x and y both rise
        rows += [(10 ** i, "dn", f"s{i}")] * (5 - i)   # x rises, y falls
    spark.createDataFrame(rows, "n_chars int, lang string, source string") \
        .createOrReplaceTempView("tau_mono")
    got = {r["lang"]: r["tau_milli"]
           for r in spark.sql(_KENDALL_BODY.format(src="tau_mono")).collect()}
    assert got == {"up": 1000, "dn": -1000}
