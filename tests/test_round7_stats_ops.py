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


def _fleiss_reference(votes):
    """Textbook Fleiss' kappa for 3 raters, 2 categories; votes = list of
    per-item counts of category-1 assignments."""
    n = len(votes)
    p1 = sum(votes) / (3 * n)
    pbar = sum(v * v + (3 - v) * (3 - v) - 3 for v in votes) / (6 * n)
    pe = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (pbar - pe) / (1 - pe)
    return (math.floor(p1 * 1e6 + 0.5), math.floor(pbar * 1e6 + 0.5),
            math.floor(pe * 1e6 + 0.5), math.floor(kappa * 1e6 + 0.5))


def test_fleiss_kappa_matches_textbook(spark):
    from project_etl_spark.operators.llm_curation import _FLEISS_SQL

    # Craft docs hitting every vote count 0..3. Raters: length in
    # [200, 2000]; digits < 12% of chars; spaces >= 10% of chars.
    def doc(n_chars, digit_frac, space_frac):
        nd = int(n_chars * digit_frac)
        ns = int(n_chars * space_frac)
        return "1" * nd + " " * ns + "x" * (n_chars - nd - ns)

    texts = [doc(500, 0.0, 0.2),    # v = 3 (len ok, few digits, spacey)
             doc(500, 0.0, 0.2),
             doc(100, 0.0, 0.2),    # v = 2 (too short)
             doc(500, 0.5, 0.2),    # v = 2 (digit-heavy)
             doc(100, 0.5, 0.0),    # v = 0
             doc(3000, 0.5, 0.2),   # v = 1 (only spaces pass)
             ]
    rows = [(t, len(t)) for t in texts]
    spark.createDataFrame(rows, "text string, n_chars long") \
        .createOrReplaceTempView("fleiss_planted")
    sql = (_FLEISS_SQL
           .replace("FROM documents WHERE n_chars > 0",
                    "FROM fleiss_planted")
           .replace(", '', 'g')", ", '')"))
    got = spark.sql(sql).collect()[0]
    votes = [3, 3, 2, 2, 0, 1]
    p1, pbar, pe, kappa = _fleiss_reference(votes)
    assert got["n"] == len(votes)
    assert (got["p1_micro"], got["pbar_micro"]) == (p1, pbar)
    assert (got["pe_micro"], got["kappa_micro"]) == (pe, kappa)


def test_cramers_v_perfect_association_is_one(spark):
    from project_etl_spark.operators.llm_curation import _CRAMERS_SQL

    # flag determines status exactly -> V = 1, C = sqrt(chi2/(chi2+n)).
    rows = ([("A", "X")] * 30 + [("B", "Y")] * 20 + [("C", "Z")] * 10)
    spark.createDataFrame(rows, "l_returnflag string, l_linestatus string") \
        .createOrReplaceTempView("cram_perfect")
    got = spark.sql(_CRAMERS_SQL.format(src="cram_perfect")).collect()[0]
    assert got["n"] == 60 and got["dof"] == 4
    # chi2 = n * min(r-1, c-1) under perfect association -> V = 1
    assert got["v_micro"] == 1000000
    assert got["phi2_nano"] == 2 * 10 ** 9  # phi2 = chi2/n = min(r-1,c-1)


def test_cramers_v_independence_is_zero(spark):
    from project_etl_spark.operators.llm_curation import _CRAMERS_SQL

    # Exactly proportional rows -> every chi2 term is 0.
    rows = ([("A", "X")] * 20 + [("A", "Y")] * 10
            + [("B", "X")] * 40 + [("B", "Y")] * 20)
    spark.createDataFrame(rows, "l_returnflag string, l_linestatus string") \
        .createOrReplaceTempView("cram_indep")
    got = spark.sql(_CRAMERS_SQL.format(src="cram_indep")).collect()[0]
    assert got["chi2_micro"] == 0
    assert got["v_micro"] == 0 and got["c_micro"] == 0


def test_fdr_bh_flags_only_the_planted_shift(spark):
    from project_etl_spark.operators.llm_curation import _FDR_SQL

    # Nine null sources drawn from the same alternating lengths; one
    # source shifted far upward -> exactly that source is rejected, and
    # the rejected set is a prefix of the p-value ranking (step-up).
    rows = []
    for i in range(9):
        rows += [(100 + (j % 7), f"null_{i}") for j in range(50)]
    rows += [(5000 + (j % 7), "shifted") for j in range(50)]
    spark.createDataFrame(rows, "n_chars long, source string") \
        .createOrReplaceTempView("fdr_planted")
    out = spark.sql(_FDR_SQL.format(src="fdr_planted")).collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["shifted"]["rejected"] == 1
    assert sum(r["rejected"] for r in out) == 1
    # step-up coherence: rejected rows form a prefix of prank
    rejected_ranks = sorted(r["prank"] for r in out if r["rejected"])
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))
    # critical values are monotone in rank
    crits = [r["crit_micro"] for r in sorted(out, key=lambda r: r["prank"])]
    assert crits == sorted(crits)


def _km_reference(items):
    """Textbook KM over (dur, event) items; returns
    {dur: (d, c, at_risk, floor(S*1e6+0.5))} per distinct dur."""
    from collections import Counter
    d = Counter(t for t, e in items if e)
    c = Counter(t for t, e in items if not e)
    durs = sorted(set(d) | set(c))
    out, s = {}, 1.0
    for t in durs:
        at_risk = sum(v for u, v in d.items() if u >= t) \
            + sum(v for u, v in c.items() if u >= t)
        s = s * (1.0 - d[t] / at_risk)
        out[t] = (d[t], c[t], at_risk, math.floor(s * 1e6 + 0.5))
    return out


def test_survival_km_matches_textbook_product(spark):
    from project_etl_spark.operators.sql_dialect import _KM_BODY

    # Planted life table: events at days 1,1,3,5; censored at 2,4,5,6.
    items = [(1, True), (1, True), (3, True), (5, True),
             (2, False), (4, False), (5, False), (6, False)]
    ref = _km_reference(items)
    rows = []
    for i, (t, e) in enumerate(items):
        rows.append((t, 1 if e else 0, i))
    risk = spark.createDataFrame(rows, "dur_d long, ev int, i int")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    t = (risk.groupBy("dur_d")
         .agg(F.sum("ev").cast("long").alias("d_cnt"),
              F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_cnt")))
    r = t.select(F.row_number().over(Window.orderBy("dur_d"))
                 .cast("long").alias("rn"), "dur_d", "d_cnt", "c_cnt",
                 F.sum(F.col("d_cnt") + F.col("c_cnt"))
                 .over(Window.orderBy(F.col("dur_d").desc()))
                 .cast("long").alias("at_risk"))
    r.createOrReplaceTempView("km_planted")
    got = spark.sql(_KM_BODY.format(r="km_planted")).collect()
    assert len(got) == len(ref)
    for row in got:
        d, c, at_risk, s_micro = ref[row["dur_d"]]
        assert (row["n_events"], row["n_censored"]) == (d, c)
        assert row["at_risk"] == at_risk
        assert row["survival_micro"] == s_micro


def _bollinger_reference(series):
    """Textbook trailing-7 Bollinger over integer values."""
    out = []
    for i, v in enumerate(series):
        win = series[max(0, i - 6):i + 1]
        n = len(win)
        mean = sum(win) / n
        var = max((sum(x * x for x in win) - sum(win) ** 2 / n) / n, 0.0)
        sigma = math.sqrt(var)
        breach = 1 if v > mean + 2 * sigma else (-1 if v < mean - 2 * sigma
                                                 else 0)
        out.append((n, math.floor(mean * 1e3 + 0.5),
                    math.floor(sigma * 1e3 + 0.5), breach))
    return out


def test_bollinger_bands_match_textbook(spark):
    from project_etl_spark.operators.windows import _BOLL_BODY

    # Quiet series with one huge spike (breach +1) and, after the spike
    # has left the trailing-7 window, one crash (-1).
    series = [100, 102, 98, 101, 99, 100, 103, 500, 101, 99,
              100, 98, 102, 99, 101, 5]
    rows = [(i, v) for i, v in enumerate(series)]
    spark.createDataFrame(rows, "day long, rev_kd long") \
        .createOrReplaceTempView("boll_planted")
    got = {r["day"]: r for r in
           spark.sql(_BOLL_BODY.format(d="boll_planted")).collect()}
    ref = _bollinger_reference(series)
    for day, (n, mean_m, sigma_m, breach) in enumerate(ref):
        r = got[day]
        assert r["n"] == n
        assert r["mean_milli"] == mean_m, day
        assert r["sigma_milli"] == sigma_m, day
        assert r["breach"] == breach, day
    assert got[7]["breach"] == 1 and got[15]["breach"] == -1


def _holt_reference(xs):
    """Exact integer-milli Holt recursion with alpha = beta = 1/2."""
    out = []
    l, b = 1000 * xs[0], 0
    out.append((l, b))
    for x in xs[1:]:
        l_new = math.floor((1000 * x + l + b) / 2)
        b = math.floor((l_new - l + b) / 2)
        l = l_new
        out.append((l, b))
    return out


def test_holt_linear_matches_reference_recursion(spark):
    from project_etl_spark.operators.sql_dialect import _HOLT_BODY

    # Rising then falling series: trend goes positive, then NEGATIVE —
    # exercising the floor-vs-truncate division edge for b_milli < 0.
    xs = [10, 14, 18, 25, 30, 22, 9, 3, 1]
    rows = [(i + 1, i, x) for i, x in enumerate(xs)]
    spark.createDataFrame(rows, "rn long, day long, x long") \
        .createOrReplaceTempView("holt_planted")
    got = {r["day"]: r for r in
           spark.sql(_HOLT_BODY.format(h="holt_planted")).collect()}
    ref = _holt_reference(xs)
    assert any(b < 0 for _, b in ref)   # the negative-trend edge is hit
    for day, (l, b) in enumerate(ref):
        r = got[day]
        assert (r["level_milli"], r["trend_milli"]) == (l, b), day
        assert r["forecast_next_milli"] == l + b


def test_silhouette_simplified_matches_hand_geometry():
    """DuckDB-side planted check of the silhouette oracle: centroids on a
    line at x = 0/10/20/30, plus points at known distances, so every
    a/b/s value is hand-computable."""
    import duckdb
    from project_etl_spark.registry import load_all

    oracle = load_all()["ext_silhouette_simplified"].oracle
    con = duckdb.connect()

    def vec(x):
        return [float(x)] + [0.0] * 63

    rows = [(1, vec(0), 0), (2, vec(10), 0), (3, vec(20), 0),
            (4, vec(30), 0),
            (5, vec(1), 0),    # own c1: a=1, b=9  -> s = (9-1)/9
            (6, vec(4), 0),    # own c1: a=4, b=6  -> s = (6-4)/6
            (7, vec(24), 0),   # own c3 (tie-break): a=4, b=6
            ]
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    got = {r[0]: r for r in con.execute(oracle).fetchall()}

    def s_micro(a, b):
        a2, b2 = int(a * a * 1e9 + 0.5), int(b * b * 1e9 + 0.5)
        return math.floor((math.sqrt(b2) - math.sqrt(a2))
                          / math.sqrt(max(a2, b2)) * 1e6 + 0.5)

    # cluster 1: centroid itself (s=1e6), x=1 (8/9), x=4 (1/3)
    exp1 = [1000000, s_micro(1, 9), s_micro(4, 6)]
    assert got[1][1] == 3
    assert got[1][3] == math.floor(sum(exp1) / 3 + 0.5)
    assert got[1][2] == 1            # only x=4 has s < 0.5
    # cluster 3: centroid + x=24
    exp3 = [1000000, s_micro(4, 6)]
    assert got[3][1] == 2
    assert got[3][3] == math.floor(sum(exp3) / 2 + 0.5)
    # clusters 2 and 4: the lone centroid, s = 1, no boundary
    assert got[2][1:] == (1, 0, 1000000)
    assert got[4][1:] == (1, 0, 1000000)


def _textrank_reference(docs, vocab_size=60, topk=15):
    """Pure-Python twin of the quantized 2-iteration weighted TextRank."""
    from collections import Counter
    toks = []
    for d in docs:
        toks.extend(t for t in d.lower().split(" ") if t)
    uni = Counter(toks)
    vocab = set(t for t, _ in sorted(uni.items(),
                                     key=lambda kv: (-kv[1], kv[0]))
                [:vocab_size])
    ed = Counter()
    for d in docs:
        ws = [t for t in d.lower().split(" ") if t]
        for a, b in zip(ws, ws[1:]):
            if a in vocab and b in vocab and a != b:
                ed[(a, b)] += 1
    edges = Counter()
    for (a, b), c in ed.items():
        edges[(a, b)] += c
        edges[(b, a)] += c
    wdeg = Counter()
    for (a, _), c in edges.items():
        wdeg[a] += c
    n = float(len(wdeg))
    r = {t: 1.0 / n for t in wdeg}
    for _ in range(2):
        acc = {}
        for (a, b), c in edges.items():
            q = math.floor(r[a] * c / wdeg[a] * 1e12 + 0.5)
            acc[b] = acc.get(b, 0) + q
        r = {t: 0.15 / n + 0.85 * (sq / 1e12) for t, sq in acc.items()}
    ranked = sorted(((math.floor(v * 1e9 + 0.5), t) for t, v in r.items()),
                    key=lambda kv: (-kv[0], kv[1]))[:topk]
    return [(t, wdeg[t], rq) for rq, t in ranked]


def test_keyword_textrank_matches_reference_iteration():
    import duckdb
    from project_etl_spark.registry import load_all

    oracle = load_all()["ext_keyword_textrank"].oracle
    docs = ["the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog met the cat",
            "log and mat and cat",
            "dog log dog log cat"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, 'en', 's', ?)",
                    [(i, t, len(t)) for i, t in enumerate(docs)])
    got = con.execute(oracle).fetchall()
    ref = _textrank_reference(docs)
    assert [tuple(r) for r in got] == ref


def _markov_reference(journeys, channels=("view", "click", "signup",
                                          "error"), iters=6):
    """Pure-Python twin of the quantized removal-effect attribution.
    journeys: list of (event_type sequence, converted_bool) AFTER
    truncation at first purchase (purchase excluded from the sequence).
    """
    from collections import Counter
    trans = Counter()
    for seq, conv in journeys:
        if not seq:
            if conv:
                trans[("START", "CONV")] += 1
            continue
        trans[("START", seq[0])] += 1
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
        trans[(seq[-1], "CONV" if conv else "DROP")] += 1
    tot = Counter()
    for (s, _), c in trans.items():
        tot[s] += c

    def conv_prob(removed):
        p = {"CONV": 1.0}
        for _ in range(iters):
            acc = {}
            for (s, d), c in trans.items():
                if s == removed or d == "DROP":
                    continue
                if d in p:
                    q = math.floor(c / tot[s] * p[d] * 1e12 + 0.5)
                    acc[s] = acc.get(s, 0) + q
            p = {s: sq / 1e12 for s, sq in acc.items()}
            p["CONV"] = 1.0
        return p.get("START", 0.0)

    base = conv_prob(None)
    rows = {}
    eff = {}
    for ch in channels:
        pc = conv_prob(ch)
        eff[ch] = math.floor((base - pc) / base * 1e6 + 0.5)
        rows[ch] = (math.floor(base * 1e6 + 0.5),
                    math.floor(pc * 1e6 + 0.5), eff[ch])
    tot_eff = sum(eff.values())
    return {ch: rows[ch] + ((0 if tot_eff == 0 else
                             math.floor(eff[ch] * 1e6 / tot_eff + 0.5)),)
            for ch in channels}


def test_markov_attribution_matches_reference(spark):
    from project_etl_spark.operators.sql_surface import _markov_body

    # Journeys chosen so channels differ sharply: view leads to
    # conversion directly and via click; signup never converts.
    journeys = [
        (["view"], True),
        (["view"], True),
        (["view", "click"], True),
        (["click"], True),
        (["signup"], False),
        (["signup", "view"], False),
        ([], True),               # first event is the purchase itself
        (["error", "view"], True),
    ]
    rows = []
    eid = 0
    for uid, (seq, conv) in enumerate(journeys):
        for j, et in enumerate(seq):
            rows.append((uid, et, 1000 * (j + 1), eid)); eid += 1
        if conv:
            rows.append((uid, "purchase", 1000 * (len(seq) + 1), eid))
            eid += 1
    spark.createDataFrame(
        rows, "user_id long, event_type string, tus long, event_id long") \
        .createOrReplaceTempView("markov_planted")
    got = {r["channel"]: (r["conv_base_micro"], r["conv_removed_micro"],
                          r["removal_micro"], r["share_micro"])
           for r in spark.sql(_markov_body().format(e="markov_planted"))
           .collect()}
    assert got == _markov_reference(journeys)


def _theil_reference(days):
    """Textbook Theil-Sen with the operator's quantization."""
    pts = sorted(days.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (d1, x1), (d2, x2) = pts[i], pts[j]
            slopes.append(math.floor((x2 - x1) / (d2 - d1) * 1e6 + 0.5))
    slopes.sort()
    n = len(slopes)
    med2 = slopes[(n + 1) // 2 - 1] + slopes[(n + 2) // 2 - 1]
    slope = math.floor(med2 / 2)
    ints = sorted(x * 1000000 - slope * d for d, x in pts)
    m = len(ints)
    imed2 = ints[(m + 1) // 2 - 1] + ints[(m + 2) // 2 - 1]
    return len(pts), n, slope, math.floor(imed2 / 2)


def test_theil_sen_matches_textbook_and_resists_outlier(spark):
    from project_etl_spark.operators.windows import _THEIL_BODY

    # Perfect slope-3 line with one wild outlier day.
    days = {i: 3 * i + 10 for i in range(1, 10)}
    days[5] = 500
    spark.createDataFrame(list(days.items()), "day long, x long") \
        .createOrReplaceTempView("theil_planted")
    got = spark.sql(_THEIL_BODY.format(d="theil_planted")).collect()[0]
    n_days, n_pairs, slope, intercept = _theil_reference(days)
    assert (got["n_days"], got["n_pairs"]) == (n_days, n_pairs)
    assert got["slope_med_micro"] == slope
    assert got["intercept_med_micro"] == intercept
    # robustness: the outlier day leaves the median slope at exactly 3
    assert got["slope_med_micro"] == 3000000


def test_conformal_interval_planted_split(spark):
    from project_etl_spark.operators.llm_curation import _CONFORMAL_SQL

    # Deterministic planted split: bucket = doc_id % 1000, so doc_id
    # < 500 is calibration. One source, calibration mean = 100,
    # residuals 0/10/20/30 -> q = ceil((4+1)*0.9) = 5th smallest, but
    # only 4 residuals exist -> q is the max residual (30).
    rows = [(0, "s", 85), (1, "s", 95), (2, "s", 110), (3, "s", 120),
            (500, "s", 100),   # inside band
            (501, "s", 131),   # outside: |131-100| = 31 > 30
            (502, "s", 70),    # at band edge: |70-100| = 30 <= 30
            ]
    spark.createDataFrame(rows, "doc_id long, source string, n_chars long") \
        .createOrReplaceTempView("conf_planted")
    got = spark.sql(_CONFORMAL_SQL.format(
        src="conf_planted", bucket="doc_id % 1000")).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_cal"] == 4 and r["n_eval"] == 3
    # mean of 85,95,110,120 = 102.5 -> round-half-up milli = 102500
    assert r["q_milli"] == max(abs(v * 1000 - 102500)
                               for v in (85, 95, 110, 120))
    covered = sum(1 for v in (100, 131, 70)
                  if abs(v * 1000 - 102500) <= r["q_milli"])
    assert r["n_covered"] == covered
    assert r["coverage_micro"] == math.floor(covered * 1e6 / 3 + 0.5)


def test_simpson_diversity_two_even_langs(spark):
    from project_etl_spark.operators.llm_curation import _SIMPSON_SQL

    # 5+5 docs in two langs: D = 1 - 2*5*4/(10*9) = 1 - 40/90.
    rows = ([(100, "en", "even")] * 5 + [(100, "de", "even")] * 5
            + [(100, "en", "mono")] * 4)
    spark.createDataFrame(rows, "n_chars long, lang string, source string") \
        .createOrReplaceTempView("simp_planted")
    got = {r["source"]: r for r in
           spark.sql(_SIMPSON_SQL.format(src="simp_planted")).collect()}
    e = got["even"]
    assert (e["n_docs"], e["n_langs"]) == (10, 2)
    assert e["simpson_micro"] == math.floor((1 - 40 / 90) * 1e6 + 0.5)
    assert e["inv_simpson_milli"] == math.floor(90 / 40 * 1e3 + 0.5)
    assert e["berger_parker_micro"] == 500000
    m = got["mono"]     # monolingual: D = 0, effective languages = 1
    assert m["simpson_micro"] == 0
    assert m["inv_simpson_milli"] == 1000
    assert m["berger_parker_micro"] == 1000000


def test_kanonymity_census_planted_groups(spark):
    from project_etl_spark.operators.llm_curation import _KANON_SQL

    # Three QI groups of sizes 1, 3, 12 (same lang/source, different
    # length buckets). k=2 flags the singleton; k=5 flags 1+3; k=10
    # flags 1+3 too (12 >= 10).
    rows = ([(50,)] * 1 + [(150,)] * 3 + [(250,)] * 12)
    rows = [(v[0], "en", "s") for v in rows]
    spark.createDataFrame(rows, "n_chars long, lang string, source string") \
        .createOrReplaceTempView("kanon_planted")
    got = {r["k"]: r for r in
           spark.sql(_KANON_SQL.format(src="kanon_planted")).collect()}
    assert got[2]["n_violating_rows"] == 1
    assert got[2]["n_violating_groups"] == 1
    assert got[5]["n_violating_rows"] == 4
    assert got[5]["n_violating_groups"] == 2
    assert got[10]["n_violating_rows"] == 4
    assert got[10]["min_group_size"] == 1
    assert got[2]["violating_rows_micro"] == math.floor(1e6 / 16 + 0.5)
    # all three groups have a single n_chars%10 value -> low l-diversity
    assert got[2]["n_low_ldiv_groups"] == 3


def _stl_reference(series):
    """Pure-Python twin of the quantized STL-lite decomposition."""
    days = sorted(series)
    n = len(days)
    out = {}
    trend = {}
    for i, d in enumerate(days):
        win = [series[days[j]] for j in range(max(0, i - 3),
                                              min(n, i + 4))]
        trend[d] = math.floor(sum(win) * 1e3 / len(win) + 0.5)
    detr = {d: series[d] * 1000 - trend[d] for d in days}
    seas = {}
    for dow in set(d % 7 for d in days):
        grp = [detr[d] for d in days if d % 7 == dow]
        seas[dow] = math.floor(sum(grp) / len(grp) + 0.5)
    resid = {d: detr[d] - seas[d % 7] for d in days}
    ssq = sum(math.floor(r * r / 1e6) for r in resid.values())
    for d in days:
        z = (0 if ssq == 0 else
             math.floor(resid[d] / 1e3 / math.sqrt(ssq / n) * 1e3 + 0.5))
        out[d] = (trend[d], seas[d % 7], resid[d], z)
    return out


def test_stl_lite_recovers_planted_weekly_pattern(spark):
    from project_etl_spark.operators.windows import _STL_BODY

    # Flat level 100 + day-of-week bump [0,0,0,0,0,0,35] + one spike.
    series = {d: 100 + (35 if d % 7 == 6 else 0) for d in range(21)}
    series[10] = 300
    spark.createDataFrame(list(series.items()), "day long, x long") \
        .createOrReplaceTempView("stl_planted")
    got = {r["day"]: r for r in
           spark.sql(_STL_BODY.format(d="stl_planted")).collect()}
    ref = _stl_reference(series)
    for d, (tr, se, re_, z) in ref.items():
        r = got[d]
        assert r["trend_milli"] == tr, d
        assert r["seasonal_milli"] == se, d
        assert r["resid_milli"] == re_, d
        assert r["resid_z_milli"] == z, d
    # the spike day carries the largest |residual z|
    assert max(ref, key=lambda d: abs(ref[d][3])) == 10


def test_runs_test_alternating_series_has_max_runs(spark):
    from project_etl_spark.operators.windows import _RUNS_BODY

    # Strictly alternating up/down: every diff flips sign -> R = n1+n0.
    series = [(d, 100 + (7 if d % 2 else 0)) for d in range(13)]
    spark.createDataFrame(series, "day long, x long") \
        .createOrReplaceTempView("runs_planted")
    got = spark.sql(_RUNS_BODY.format(d="runs_planted")).collect()[0]
    n1, n0 = got["n_up"], got["n_down"]
    assert (n1, n0) == (6, 6)
    assert got["n_runs"] == n1 + n0       # maximum possible runs
    mu = 2 * n1 * n0 / (n1 + n0) + 1
    var = (2 * n1 * n0 * (2 * n1 * n0 - n1 - n0)
           / ((n1 + n0) ** 2 * (n1 + n0 - 1)))
    assert got["expected_runs_milli"] == math.floor(mu * 1e3 + 0.5)
    assert got["z_milli"] == math.floor(
        (got["n_runs"] - mu) / math.sqrt(var) * 1e3 + 0.5)
    assert got["z_milli"] > 0             # oscillation -> too many runs


def test_vocab_jaccard_sources_planted_overlap():
    import duckdb
    from project_etl_spark.registry import load_all

    oracle = load_all()["ext_vocab_jaccard_sources"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    docs = [("a b c d", "s1"), ("a b x y", "s2"), ("p q r s", "s3")]
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', ?, ?)",
        [(i, t, s, len(t)) for i, (t, s) in enumerate(docs)])
    got = {(r[0], r[1]): r for r in con.execute(oracle).fetchall()}
    # s1 = {a,b,c,d}, s2 = {a,b,x,y}: |∩| = 2, |∪| = 6 -> 333
    assert got[("s1", "s2")][2] == 2
    assert got[("s1", "s2")][5] == math.floor(2 * 1e3 / 6 + 0.5)
    # disjoint vocabularies never pair (inner join on shared tokens)
    assert ("s1", "s3") not in got and ("s2", "s3") not in got


def test_funnel_windowed_enforces_24h_gaps(spark):
    from project_etl_spark.operators.sql_surface import _FUNNEL_WINDOWED_SQL

    H = 3600 * 1000000
    rows = [
        # u1: full funnel inside the windows
        (1, "signup", 0), (1, "click", 2 * H), (1, "purchase", 20 * H),
        # u2: click arrives 30h after signup -> stops at stage 1
        (2, "signup", 0), (2, "click", 30 * H), (2, "purchase", 31 * H),
        # u3: click ok, purchase 25h after the click -> stops at stage 2
        (3, "signup", 0), (3, "click", 1 * H), (3, "purchase", 27 * H),
        # u4: signup only
        (4, "signup", 0),
    ]
    spark.createDataFrame(rows, "user_id long, event_type string, tus long") \
        .createOrReplaceTempView("fw_planted")
    got = {r["stage"]: r for r in
           spark.sql(_FUNNEL_WINDOWED_SQL.format(e="fw_planted")).collect()}
    assert got[1]["n_users"] == 4
    assert got[2]["n_users"] == 2        # u1 and u3
    assert got[3]["n_users"] == 1        # u1 only
    assert got[1]["of_entry_permille"] == 1000
    assert got[2]["of_entry_permille"] == 500
    assert got[3]["of_entry_permille"] == 250


def test_als_step_solves_planted_normal_equations(spark):
    from project_etl_spark.operators.llm_curation import _ALS_SQL

    # One user with counts: click x3 (j=1), purchase x2 (j=3),
    # view x5 (j=5). Hand-solve the ridge 2x2.
    rows = ([(1, "click")] * 3 + [(1, "purchase")] * 2 + [(1, "view")] * 5)
    spark.createDataFrame(rows, "user_id long, event_type string") \
        .createOrReplaceTempView("als_planted")
    got = spark.sql(_ALS_SQL.format(src="als_planted")).collect()[0]
    # moments: n=3 items, s_j=1+3+5=9, s_jj=1+9+25=35,
    # b1=3+2+5=10, b2=3*1+2*3+5*5=34
    n, s_j, s_jj, b1, b2 = 3, 9, 35, 10, 34
    det = (n + 0.1) * (s_jj + 0.1) - s_j * 1.0 * s_j
    p1 = ((s_jj + 0.1) * b1 - s_j * 1.0 * b2) / det
    p2 = ((n + 0.1) * b2 - s_j * 1.0 * b1) / det
    assert got["n_items"] == 3
    assert got["p1_micro"] == math.floor(p1 * 1e6 + 0.5)
    assert got["p2_micro"] == math.floor(p2 * 1e6 + 0.5)
    # sanity: the solve reproduces the ratings direction — predicted
    # r_hat(j) = p1 + p2*j must rank view (j=5) above click (j=1)
    assert p1 + 5 * p2 > p1 + 1 * p2


# ---------------------------------------------------------------------------
# Property-based checks: random corpora vs the pure-Python references
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_HYP = hyp_settings(max_examples=5, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])


@_HYP
@given(en=st.lists(st.integers(1, 40), min_size=2, max_size=25),
       de=st.lists(st.integers(1, 40), min_size=2, max_size=25))
def test_mwu_property_random_cohorts(spark, en, de):
    """The grouped-by-value algebra equals the textbook midrank form on
    arbitrary tie-heavy cohorts (not just the planted case)."""
    from project_etl_spark.operators.llm_curation import _MWU_BODY
    # degenerate: all values identical across both cohorts -> tie
    # variance 0 -> division by zero; the real corpus never is, and
    # the operator's WHERE guards only empty cohorts. Skip that draw.
    if len(set(en) | set(de)) == 1:
        return
    rows = [(v, "en") for v in en] + [(v, "de") for v in de]
    spark.createDataFrame(rows, "n_chars int, lang string") \
        .createOrReplaceTempView("mwu_hyp")
    got = spark.sql(_MWU_BODY.format(src="mwu_hyp")).collect()[0]
    n_a, n_b, u2, z_milli = _mwu_reference(en, de)
    assert (got["n_a"], got["n_b"], got["u2"]) == (n_a, n_b, u2)
    assert got["z_milli"] == z_milli


@_HYP
@given(items=st.lists(
    st.tuples(st.integers(0, 12), st.booleans()),
    min_size=1, max_size=30))
def test_km_property_random_life_tables(spark, items):
    """KM recursion equals the textbook product on arbitrary mixes of
    events and censorings, including all-censored-first shapes."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from project_etl_spark.operators.sql_dialect import _KM_BODY
    ref = _km_reference(items)
    risk = spark.createDataFrame(
        [(t, 1 if e else 0) for t, e in items], "dur_d long, ev int")
    t = (risk.groupBy("dur_d")
         .agg(F.sum("ev").cast("long").alias("d_cnt"),
              F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_cnt")))
    r = t.select(F.row_number().over(Window.orderBy("dur_d"))
                 .cast("long").alias("rn"), "dur_d", "d_cnt", "c_cnt",
                 F.sum(F.col("d_cnt") + F.col("c_cnt"))
                 .over(Window.orderBy(F.col("dur_d").desc()))
                 .cast("long").alias("at_risk"))
    r.createOrReplaceTempView("km_hyp")
    got = spark.sql(_KM_BODY.format(r="km_hyp")).collect()
    assert len(got) == len(ref)
    for row in got:
        d, c, at_risk, s_micro = ref[row["dur_d"]]
        assert (row["n_events"], row["n_censored"],
                row["at_risk"], row["survival_micro"]) \
            == (d, c, at_risk, s_micro)


@_HYP
@given(days=st.dictionaries(st.integers(0, 40), st.integers(0, 500),
                            min_size=2, max_size=15))
def test_theil_sen_property_random_series(spark, days):
    """Median-of-slopes equals the pure-Python reference on arbitrary
    integer series (negative slopes exercise the floor-halving)."""
    from project_etl_spark.operators.windows import _THEIL_BODY
    spark.createDataFrame(list(days.items()), "day long, x long") \
        .createOrReplaceTempView("theil_hyp")
    got = spark.sql(_THEIL_BODY.format(d="theil_hyp")).collect()[0]
    n_days, n_pairs, slope, intercept = _theil_reference(days)
    assert (got["n_days"], got["n_pairs"]) == (n_days, n_pairs)
    assert got["slope_med_micro"] == slope
    assert got["intercept_med_micro"] == intercept


@_HYP
@given(xs=st.lists(st.integers(0, 100), min_size=1, max_size=25))
def test_holt_property_random_series(spark, xs):
    """The recursive Holt state equals the exact integer recursion for
    arbitrary series (rises, crashes, zeros)."""
    from project_etl_spark.operators.sql_dialect import _HOLT_BODY
    rows = [(i + 1, i, x) for i, x in enumerate(xs)]
    spark.createDataFrame(rows, "rn long, day long, x long") \
        .createOrReplaceTempView("holt_hyp")
    got = {r["day"]: r for r in
           spark.sql(_HOLT_BODY.format(h="holt_hyp")).collect()}
    for day, (l, b) in enumerate(_holt_reference(xs)):
        assert (got[day]["level_milli"], got[day]["trend_milli"]) == (l, b)


def test_power_analysis_mde_shrinks_with_sample_size(spark):
    from project_etl_spark.operators.llm_curation import _POWER_SQL

    # Three sources (with two, source-vs-rest MDE is symmetric by
    # construction: 1/n + 1/(tn-n) is the same from either side).
    rows = ([(400, "big")] * 200 + [(200, "big")] * 200
            + [(400, "mid")] * 100 + [(200, "mid")] * 100
            + [(400, "small")] * 20 + [(200, "small")] * 20)
    spark.createDataFrame(rows, "n_chars long, source string") \
        .createOrReplaceTempView("power_planted")
    got = {r["source"]: r for r in
           spark.sql(_POWER_SQL.format(src="power_planted")).collect()}
    z = 1.96 + 0.8416
    tn, ta = 640, 320
    p = ta / tn
    for src, n in (("big", 400), ("mid", 200), ("small", 40)):
        mde = z * math.sqrt(p * (1 - p) * (1 / n + 1 / (tn - n)))
        assert got[src]["mde_micro"] == math.floor(mde * 1e6 + 0.5), src
    assert got["small"]["mde_micro"] > got["mid"]["mde_micro"]
    n_req = math.floor(z * z * 2 * p * (1 - p) / (0.02 * 0.02) + 0.5)
    assert got["big"]["n_per_arm_for_2pct"] == n_req


def test_srm_check_planted_imbalance_alarms(spark):
    from project_etl_spark.operators.llm_curation import _SRM_SQL

    # Perfect 80/10/10 by construction -> chi2 = 0, no alarm.
    rows = [(i,) for i in range(1000)]
    spark.createDataFrame(rows, "doc_id long") \
        .createOrReplaceTempView("srm_ok")
    ok = spark.sql(_SRM_SQL.format(src="srm_ok",
                                   bucket="doc_id % 1000")).collect()
    assert all(r["chi2_micro"] == 0 and r["srm_alarm"] == 0 for r in ok)
    by = {r["split"]: r["n_obs"] for r in ok}
    assert by == {"train": 800, "val": 100, "test": 100}

    # Broken randomization: val bucket starved (8 -> only 20 of 100).
    rows = [(i,) for i in range(1000) if not (i % 10 == 8 and i >= 200)]
    spark.createDataFrame(rows, "doc_id long") \
        .createOrReplaceTempView("srm_bad")
    bad = spark.sql(_SRM_SQL.format(src="srm_bad",
                                    bucket="doc_id % 1000")).collect()
    assert all(r["srm_alarm"] == 1 for r in bad)
    n = sum(r["n_obs"] for r in bad) // 3  # rows replicated per split
    chi2 = bad[0]["chi2_micro"] / 1e6
    obs = {r["split"]: r["n_obs"] for r in bad}
    total = 920
    exp = {"train": total * 0.8, "val": total * 0.1, "test": total * 0.1}
    ref = sum((obs[s] - exp[s]) ** 2 / exp[s] for s in obs)
    assert abs(chi2 - ref) < 1e-3


def test_record_highs_planted_series(spark):
    from project_etl_spark.operators.windows import _RECORDS_BODY

    series = [(0, 10), (1, 8), (2, 12), (3, 12), (4, 20), (5, 5), (6, 21)]
    spark.createDataFrame(series, "day long, rev_kd long") \
        .createOrReplaceTempView("rec_planted")
    got = {r["day"]: r for r in
           spark.sql(_RECORDS_BODY.format(d="rec_planted")).collect()}
    # records: day0 (first), day2 (12>10), day4 (20>12), day6 (21>20);
    # day3 TIES the high -> not a record.
    assert [got[d]["is_record"] for d in range(7)] == [1, 0, 1, 0, 1, 0, 1]
    assert [got[d]["running_max"] for d in range(7)] \
        == [10, 10, 12, 12, 20, 20, 21]
    assert [got[d]["days_since_record"] for d in range(7)] \
        == [0, 1, 0, 1, 0, 1, 0]


def test_forecast_backtest_matches_holt_reference(spark):
    from project_etl_spark.operators.sql_dialect import _BACKTEST_BODY

    xs = [10, 14, 18, 25, 30, 22, 9, 3, 1]
    rows = [(i + 1, i, x) for i, x in enumerate(xs)]
    spark.createDataFrame(rows, "rn long, day long, x long") \
        .createOrReplaceTempView("bt_planted")
    got = spark.sql(_BACKTEST_BODY.format(h="bt_planted")).collect()[0]
    holt = _holt_reference(xs)
    errs_h, errs_n = [], []
    for t in range(len(xs) - 1):
        l, b = holt[t]
        errs_h.append(abs(1000 * xs[t + 1] - (l + b)))
        errs_n.append(abs(1000 * xs[t + 1] - 1000 * xs[t]))
    n = len(errs_h)
    assert got["n_forecasts"] == n
    assert got["mae_holt_milli"] == math.floor(sum(errs_h) / n + 0.5)
    assert got["mae_naive_milli"] == math.floor(sum(errs_n) / n + 0.5)
    assert got["skill_micro"] == math.floor(
        (1 - sum(errs_h) / sum(errs_n)) * 1e6 + 0.5)


def test_cohort_ltv_planted_journeys(spark):
    from project_etl_spark.operators.sql_surface import _COHORT_LTV_SQL

    WK = 604800000000
    rows = [
        # cohort week 0: u1 buys in wk0 ($10) and wk1 ($20); u2 never buys
        (1, "signup", 0, 0.0), (1, "purchase", 1000, 10.0),
        (1, "purchase", WK + 5, 20.0),
        (2, "signup", 10, 0.0), (2, "view", WK, 0.0),
        # cohort week 2: u3 buys $5 in its own week
        (3, "signup", 2 * WK, 0.0), (3, "purchase", 2 * WK + 7, 5.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, tus long, value double") \
        .createOrReplaceTempView("ltv_planted")
    got = {(r["cohort_wk"], r["age_wk"]): r for r in
           spark.sql(_COHORT_LTV_SQL.format(e="ltv_planted")).collect()}
    r00 = got[(0, 0)]
    assert (r00["n_users"], r00["n_purchases"], r00["cents"]) == (2, 1, 1000)
    assert r00["cum_cents"] == 1000
    assert r00["ltv_millicents_per_user"] == 1000 * 1000 // 2
    r01 = got[(0, 1)]
    assert r01["cum_cents"] == 3000         # $10 then +$20
    assert r01["ltv_millicents_per_user"] == 3000 * 1000 // 2
    r20 = got[(2, 0)]
    assert (r20["n_users"], r20["cum_cents"]) == (1, 500)


def test_udf_pandas_iter_bands_match_case_ladder(spark, sf_dir):
    """The iterator UDF census equals the pure-SQL CASE ladder on the
    fixture (the oracle covers DuckDB; this pins the Spark twin against
    Spark's own CASE plan)."""
    from project_etl_spark.registry import load_all
    from project_etl_spark.io import table as t
    import pyspark.sql.functions as F
    reg = load_all()
    got = {r["band"]: (r["n_orders"], r["cents"])
           for r in reg["udf_pandas_iter"].builder(spark, sf_dir).collect()}
    o = t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 1e2 + 5e-1) as bigint)")
    band = (F.when(cents < 10_000_00, 0).when(cents < 30_000_00, 1)
            .when(cents < 60_000_00, 2).otherwise(3))
    exp = {r["band"]: (r["n"], r["c"]) for r in
           o.groupBy(band.alias("band"))
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(cents).cast("long").alias("c")).collect()}
    assert got == exp


def test_max_drawdown_planted_curve(spark):
    from project_etl_spark.operators.windows import _DRAWDOWN_BODY

    # Daily flows 10,20,-15,-10,5,30: cumsum 10,30,15,5,10,40 ->
    # peak 30 at day1, trough 5 at day3, max drawdown 25.
    series = [(0, 10), (1, 20), (2, -15), (3, -10), (4, 5), (5, 30)]
    spark.createDataFrame(series, "day long, rev_kd long") \
        .createOrReplaceTempView("dd_planted")
    got = spark.sql(_DRAWDOWN_BODY.format(d="dd_planted")).collect()[0]
    assert got["n_days"] == 6
    assert got["trough_day"] == 3
    assert got["max_drawdown_kd"] == 25
    assert got["peak"] == 30
    assert got["drawdown_of_peak_micro"] == 25 * 10 ** 6 // 30


def test_seasonality_strength_pure_weekly_signal(spark):
    from project_etl_spark.operators.windows import _SEASONAL_STRENGTH_BODY

    # Strong weekly bump on a flat level: seasonal strength near 1.
    series = {d: 100 + (50 if d % 7 == 3 else 0) for d in range(28)}
    spark.createDataFrame(list(series.items()), "day long, x long") \
        .createOrReplaceTempView("str_weekly")
    got = spark.sql(
        _SEASONAL_STRENGTH_BODY.format(d="str_weekly")).collect()[0]
    assert got["n"] == 28
    assert got["seasonal_strength_micro"] > 900000
    # Pure steep trend, no weekly pattern: trend strength near 1 and
    # clearly dominates the seasonal strength.
    series = {d: 100 * d for d in range(28)}
    spark.createDataFrame(list(series.items()), "day long, x long") \
        .createOrReplaceTempView("str_trend")
    got = spark.sql(
        _SEASONAL_STRENGTH_BODY.format(d="str_trend")).collect()[0]
    assert got["trend_strength_micro"] > 900000
    assert got["trend_strength_micro"] > got["seasonal_strength_micro"]


def test_price_elasticity_planted_loglog_line(spark):
    from project_etl_spark.operators.sql_surface import _ELASTICITY_SQL

    # qty = 1000 / price^2 exactly -> elasticity = -2.
    li, pt = [], []
    for i, price in enumerate((2.0, 4.0, 5.0, 8.0, 10.0)):
        qty = 1000.0 / price ** 2
        li.append((i, qty, price * qty))     # extendedprice = unit*qty
        pt.append((i, "B1"))
    spark.createDataFrame(li, "l_partkey long, l_quantity double, "
                          "l_extendedprice double") \
        .createOrReplaceTempView("el_li")
    spark.createDataFrame(pt, "p_partkey long, p_brand string") \
        .createOrReplaceTempView("el_pt")
    got = spark.sql(_ELASTICITY_SQL.format(li="el_li", pt="el_pt")) \
        .collect()[0]
    assert got["n"] == 5
    # quantization wiggles the slope by ~1e-3 around exactly -2
    assert abs(got["elasticity_milli"] - (-2000)) <= 2
    # intercept ~ ln(1000) = 6.9078
    assert abs(got["intercept_milli"] - 6908) <= 2


def test_stream_merge_upsert_is_deterministic_and_rejects_stale(spark):
    from project_etl_spark.registry import load_all
    from project_etl_spark.operators.streaming_live import _CDC_FINAL
    reg = load_all()
    got1 = {r["key"]: (r["val"], r["seq"]) for r in
            reg["stream_merge_upsert"].builder(spark, "unused").collect()}
    assert got1 == {k: (v, s) for k, v, s in _CDC_FINAL}
    # the stale k1 update (seq 0 after seq 1) must have lost
    assert got1["k1"] == (10, 1)
    # re-running the whole drain (fresh scratch dirs) reproduces the state
    got2 = {r["key"]: (r["val"], r["seq"]) for r in
            reg["stream_merge_upsert"].builder(spark, "unused").collect()}
    assert got2 == got1


def test_histogram_equidepth_uniform_values(spark):
    from project_etl_spark.operators.aggregates import _EQUIDEPTH_SQL

    # 100 rows with cents = 1..100, everything sampled (bucket expr 0):
    # every decile bucket holds exactly 10 consecutive values.
    rows = [(float(i) / 100.0, i, 1) for i in range(1, 101)]
    spark.createDataFrame(
        rows, "l_extendedprice double, l_orderkey long, l_linenumber int") \
        .createOrReplaceTempView("eqd_planted")
    got = {r["bucket"]: r for r in spark.sql(_EQUIDEPTH_SQL.format(
        src="eqd_planted", bucket="0").replace("//", " div ")).collect()}
    assert len(got) == 10
    for b in range(1, 11):
        r = got[b]
        assert r["n_rows"] == 10, b
        assert (r["lo_cents"], r["hi_cents"]) == (10 * (b - 1) + 1, 10 * b)
        assert r["share_micro"] == 100000


def test_revenue_hhi_planted_concentration(spark):
    from project_etl_spark.operators.aggregates import _HHI_SQL

    # One whale ($900) + 10 minnows ($10 each): total $1000.
    rows = [(1, 900.0)] + [(i, 10.0) for i in range(2, 12)]
    spark.createDataFrame(rows, "o_custkey long, o_totalprice double") \
        .createOrReplaceTempView("hhi_planted")
    got = spark.sql(_HHI_SQL.format(src="hhi_planted")).collect()[0]
    assert got["n_customers"] == 11
    hhi = 0.9 ** 2 + 10 * 0.01 ** 2
    terms = [math.floor(0.9 ** 2 * 1e12 + 0.5)] \
        + [math.floor(0.01 ** 2 * 1e12 + 0.5)] * 10
    assert got["hhi_pico"] == sum(terms)
    assert got["effective_n_milli"] == math.floor(1e15 / sum(terms) + 0.5)
    assert got["cr10_micro"] == 990000       # whale + 9 minnows of 10
    assert abs(got["hhi_pico"] / 1e12 - hhi) < 1e-9


def test_centroid_classifier_separable_labels():
    import duckdb
    from project_etl_spark.registry import load_all

    oracle = load_all()["ext_centroid_classifier_eval"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding FLOAT[], label INT)")

    def vec(x):
        return [float(x)] + [0.0] * 63

    # label 0 clusters near x=0, label 1 near x=100; vec_ids chosen so
    # the md5 split puts some of each label on both sides.
    rows = []
    vid = 1
    for x in (0, 1, 2, 3, 4, 5, 6, 7):
        rows.append((vid, vec(x), 0)); vid += 1
    for x in (100, 101, 102, 103, 104, 105, 106, 107):
        rows.append((vid, vec(x), 1)); vid += 1
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    out = con.execute(oracle).fetchall()
    # perfectly separable -> diagonal confusion, accuracy = 1.0
    assert all(r[0] == r[1] for r in out)
    assert all(r[3] == 1000000 for r in out)
    # both splits non-empty on both labels (otherwise the test is vacuous)
    assert sum(r[2] for r in out) >= 4


def test_ppm_channel_hist_kernel_byte_level():
    from project_etl_spark.operators.llm_multimodal import ppm_channel_hist

    # 2x2 P6: pixels (R,G,B) = (0,64,128), (255,255,0), (64,0,192),
    # (130,70,10) — bins are value >> 6.
    px = bytes([0, 64, 128, 255, 255, 0, 64, 0, 192, 130, 70, 10])
    blob = b"P6\n2 2\n255\n" + px
    m = ppm_channel_hist(blob)
    assert (m["width"], m["height"]) == (2, 2)
    # bins are value >> 6: 0..63 -> 0, 64..127 -> 1, 128..191 -> 2, rest 3
    assert [m[f"r{b}"] for b in range(4)] == [1, 1, 1, 1]  # 0,64,130,255
    assert [m[f"g{b}"] for b in range(4)] == [1, 2, 0, 1]  # 0,(64,70),255
    assert [m[f"b{b}"] for b in range(4)] == [2, 0, 1, 1]  # (0,10),128,192
    # totals: R=449, G=389, B=330 -> dominant channel 0
    assert m["dominant_channel"] == 0
    # tie goes to the LOWER channel index
    tie = b"P6\n1 1\n255\n" + bytes([9, 9, 1])
    assert ppm_channel_hist(tie)["dominant_channel"] == 0


def test_rolling_correlation_perfect_and_anti(spark):
    from project_etl_spark.operators.windows import _ROLLCORR_BODY

    # y = 2x exactly for 20 days -> corr exactly +1 from day 14 on;
    # then y = -x + 100 -> windows fully inside the flip reach -1.
    rows = [(d, 10 + d, 2 * (10 + d)) for d in range(20)]
    rows += [(20 + d, 10 + d, 100 - (10 + d)) for d in range(20)]
    spark.createDataFrame(rows, "day long, x long, y long") \
        .createOrReplaceTempView("rc_planted")
    got = {r["day"]: r["corr_milli"] for r in
           spark.sql(_ROLLCORR_BODY.format(d="rc_planted")).collect()}
    assert min(got) == 13                 # first full 14-day window
    assert got[13] == 1000 and got[19] == 1000
    assert got[39] == -1000               # fully post-flip window
    # mixed windows sit strictly between the extremes
    assert -1000 < got[25] < 1000


def test_lsh_scurve_design_matches_closed_form(spark):
    from project_etl_spark.operators.llm_curation import (
        _SCURVE_CANDS, _SCURVE_THRESHOLD, _scurve_sql)

    got = {(r["rows_per_band"], r["n_bands"]): r
           for r in spark.sql(_scurve_sql()).collect()}
    assert set(got) == set(_SCURVE_CANDS)
    best_total = None
    for r, b in _SCURVE_CANDS:
        fp = fn = 0
        for k in range(1, 20):
            s = k / 20.0
            p = 1.0 - (1.0 - s ** r) ** b
            pm = math.floor(p * 1e6 + 0.5)
            if s < _SCURVE_THRESHOLD:
                fp += pm
            else:
                fn += 1000000 - pm
        row = got[(r, b)]
        assert row["fp_mass_micro"] == fp, (r, b)
        assert row["fn_mass_micro"] == fn, (r, b)
        total = fp + fn
        best_total = total if best_total is None else min(best_total, total)
    best_rows = [k for k, v in got.items() if v["is_best"] == 1]
    assert all(got[k]["total_err_micro"] == best_total for k in best_rows)
    # the degenerate extremes are never the best design at t=0.5
    assert (1, 16) not in best_rows and (16, 1) not in best_rows


def test_pcm_gain_kernel_and_db_math():
    from project_etl_spark.operators.llm_multimodal import pcm_gain
    import struct

    # 4 samples at exactly RMS 5000: gain to reach 10000 = +6.0206 dB.
    smp = struct.pack("<4h", 5000, -5000, 5000, -5000)
    blob = b"PCM\n4\n" + smp
    m = pcm_gain(blob)
    assert m == {"n_samples": 4, "sum_sq": 4 * 5000 * 5000}
    ms = m["sum_sq"] / m["n_samples"]
    gain_db = 10 * math.log10(10000 ** 2 / ms)
    assert abs(gain_db - 6.0206) < 1e-3
    # digital silence: sum_sq 0 (the gain column's guarded 0 case)
    assert pcm_gain(b"PCM\n2\n" + struct.pack("<2h", 0, 0))["sum_sq"] == 0


def test_anova_oneway_matches_textbook(spark):
    from project_etl_spark.operators.llm_curation import _ANOVA_SQL

    groups = {"a": [10, 12, 14], "b": [20, 22, 24, 26], "c": [30, 31]}
    rows = [(v, s) for s, vs in groups.items() for v in vs]
    spark.createDataFrame(rows, "n_chars long, source string") \
        .createOrReplaceTempView("anova_planted")
    got = spark.sql(_ANOVA_SQL.format(src="anova_planted")).collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2
              for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2
              for vs in groups.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (got["n_groups"], got["n_rows"]) == (k, n)
    assert got["ssb_int"] == math.floor(ssb + 0.5)
    assert got["ssw_int"] == math.floor(ssw + 0.5)
    assert got["f_milli"] == math.floor(f * 1e3 + 0.5)
    assert got["eta2_micro"] == math.floor(ssb / (ssb + ssw) * 1e6 + 0.5)


def _mk_reference(days):
    pts = sorted(days.items())
    s = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = pts[j][1] - pts[i][1]
            s += (d > 0) - (d < 0)
    n = len(pts)
    from collections import Counter
    ties = Counter(v for _, v in pts)
    tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, n, var, math.floor(z * 1e3 + 0.5) if s else 0


def test_mann_kendall_matches_textbook(spark):
    from project_etl_spark.operators.windows import _MK_BODY

    # Rising-with-ties series plus a dip (exercises the tie correction
    # and the positive continuity branch).
    days = {0: 5, 1: 7, 2: 7, 3: 9, 4: 8, 5: 12, 6: 12, 7: 15}
    spark.createDataFrame(list(days.items()), "day long, x long") \
        .createOrReplaceTempView("mk_planted")
    got = spark.sql(_MK_BODY.format(d="mk_planted")).collect()[0]
    s, n, var, z_milli = _mk_reference(days)
    assert (got["s_stat"], got["n"]) == (s, n)
    assert abs(got["var_s"] - var) < 1e-9
    assert got["z_milli"] == z_milli
    # strictly decreasing -> S = -n(n-1)/2, negative branch
    days = {d: 100 - 3 * d for d in range(8)}
    spark.createDataFrame(list(days.items()), "day long, x long") \
        .createOrReplaceTempView("mk_down")
    got = spark.sql(_MK_BODY.format(d="mk_down")).collect()[0]
    assert got["s_stat"] == -28
    assert got["z_milli"] == _mk_reference(days)[3]


def test_markov_attribution_fully_mediating_channel(spark):
    """A channel through which EVERY conversion flows must report
    removal effect 100%, not vanish from the output (its removal
    disconnects START from CONV, so the final iteration has no START
    row — the outer join must read that absence as conversion 0)."""
    from project_etl_spark.operators.sql_surface import _markov_body

    journeys = [(["view", "click"], True)] * 5 + [(["signup"], False)] * 2
    rows, eid = [], 0
    for uid, (seq, conv) in enumerate(journeys):
        for j, et in enumerate(seq):
            rows.append((uid, et, 1000 * (j + 1), eid)); eid += 1
        if conv:
            rows.append((uid, "purchase", 1000 * (len(seq) + 1), eid))
            eid += 1
    spark.createDataFrame(
        rows, "user_id long, event_type string, tus long, event_id long") \
        .createOrReplaceTempView("markov_mediator")
    got = {r["channel"]: r for r in
           spark.sql(_markov_body().format(e="markov_mediator")).collect()}
    assert set(got) == {"view", "click", "signup", "error"}
    for ch in ("view", "click"):      # every conversion flows through both
        assert got[ch]["conv_removed_micro"] == 0, ch
        assert got[ch]["removal_micro"] == 1000000, ch
    assert got["signup"]["removal_micro"] == 0
    assert got["error"]["removal_micro"] == 0
    assert got["view"]["share_micro"] == got["click"]["share_micro"] == 500000
    # reference twin agrees end to end
    ref = _markov_reference(journeys)
    for ch, r in got.items():
        assert (r["conv_base_micro"], r["conv_removed_micro"],
                r["removal_micro"], r["share_micro"]) == ref[ch], ch


def test_group_kfold_same_source_same_fold(spark):
    from project_etl_spark.operators.llm_curation import (
        _GROUP_KFOLD_SQL, _KFOLD_K)

    # Folds derive from md5(source) only: doc_id must not matter, and
    # the census must account for every document exactly once.
    rows = [(i, f"s{i % 7}", "en") for i in range(70)]
    spark.createDataFrame(rows, "doc_id long, source string, lang string") \
        .createOrReplaceTempView("kf_planted")
    bucket = ("cast(conv(substring(md5(source), 1, 15), 16, 10)"
              " as bigint) % 1000")
    out = spark.sql(_GROUP_KFOLD_SQL.format(
        src="kf_planted", k=_KFOLD_K, bucket=bucket)).collect()
    assert sum(r["n_docs"] for r in out) == 70
    assert sum(r["n_sources"] for r in out) == 7   # each source ONE fold
    # per-fold doc counts are multiples of 10 (sources are 10 docs each)
    assert all(r["n_docs"] % 10 == 0 for r in out)
    assert all(0 <= r["fold"] < _KFOLD_K for r in out)


def test_interpurchase_time_planted_gaps(spark):
    from project_etl_spark.operators.sql_surface import _INTERPURCHASE_SQL

    # Customer 1 orders on days 0,10,40,400 (gaps 10,30,360);
    # customer 2 on days 5,5,100 (gap 0 dropped, gap 95).
    rows = [(1, 0), (1, 10), (1, 40), (1, 400), (2, 5), (2, 5), (2, 100)]
    spark.createDataFrame(rows, "o_custkey long, day long") \
        .createOrReplaceTempView("ipt_planted")
    got = {r["band"]: r for r in
           spark.sql(_INTERPURCHASE_SQL.format(o="ipt_planted")).collect()}
    # gaps: 10, 30, 360, 95 -> month: 10,30; quarter: none... 95 is
    # within_year (>90), 360 within_year
    assert got["01_within_month"]["n_gaps"] == 2
    assert got["03_within_year"]["n_gaps"] == 2
    assert "02_within_quarter" not in got and "04_over_year" not in got
    r = got["01_within_month"]
    assert r["total_gaps"] == 4
    # sorted gaps 10,30,95,360 -> median = (30+95)/2 = 62 (floored)
    assert r["median_gap_d"] == 62
    assert (r["min_gap_d"], r["max_gap_d"]) == (10, 30)
    assert r["share_micro"] == 500000


def test_segment_migration_planted_flows(spark):
    from project_etl_spark.operators.sql_surface import _SEG_MIGRATION_SQL

    # 6 customers in half 1 (days 0-10), with revenues forcing terciles
    # [1,2 top][3,4 mid][5,6 low]; in half 2 (days 90-100) customer 2
    # crashes to the bottom, 5 rises to the top, 6 disappears and a new
    # customer 7 arrives. Midpoint = (0+100)/2 = 50.
    rows = [
        (1, 0, 600), (2, 1, 500), (3, 2, 400), (4, 3, 300),
        (5, 4, 200), (6, 5, 100),
        (1, 90, 600), (5, 91, 500), (3, 92, 400), (4, 93, 300),
        (2, 94, 200), (7, 95, 100),
    ]
    spark.createDataFrame(rows, "o_custkey long, day long, cents long") \
        .createOrReplaceTempView("segmig_planted")
    got = {(r["seg_h1"], r["seg_h2"]): r["n_customers"] for r in
           spark.sql(_SEG_MIGRATION_SQL.format(o="segmig_planted"))
           .collect()}
    assert got[("T1_top", "T1_top")] == 1           # customer 1
    assert got[("T1_top", "T3_low")] == 1           # customer 2 crashed
    assert got[("T3_low", "T1_top")] == 1           # customer 5 rose
    assert got[("T3_low", "absent")] == 1           # customer 6 churned
    assert got[("absent", "T3_low")] == 1           # customer 7 arrived
    assert got[("T2_mid", "T2_mid")] == 2           # customers 3, 4
    assert sum(got.values()) == 7


def test_session_variables_round_trip(spark, sf_dir):
    """The variable-threshold query equals its inline-CTE twin on the
    fixture (the oracle pins DuckDB; this pins Spark against Spark)."""
    from pyspark.sql import functions as F
    from project_etl_spark.registry import load_all
    from project_etl_spark.io import table as t
    reg = load_all()
    got = {r["o_orderpriority"]: (r["n_above"], r["cap_cents"]) for r in
           reg["sql_session_variables"].builder(spark, sf_dir).collect()}
    o = t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 1e2 + 5e-1) as bigint)")
    cap = o.agg(F.expr(
        "cast((2 * sum(cast(floor(o_totalprice * 1e2 + 5e-1) as bigint))"
        " + count(1)) div (2 * count(1)) as bigint)")).collect()[0][0]
    exp = {r["o_orderpriority"]: (r["n"], cap) for r in
           o.where(cents > cap).groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).cast("long").alias("n")).collect()}
    assert got == exp


def test_luhn_checksum_known_vectors(spark):
    """The HOF fold reproduces the textbook Luhn algorithm on known
    valid/invalid vectors (zero-padded to the 12-digit layout)."""
    from project_etl_spark.operators.functions import _LUHN_SPARK

    def luhn_py(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10

    vectors = ["001234567897",   # 1234567897 is the classic valid vector
               "001234567890", "079927398713", "999999999999",
               "000000000000", "490154203237"]
    rows = [(v,) for v in vectors]
    spark.createDataFrame(rows, "s string").createOrReplaceTempView("luhn_v")
    got = {r["s"]: r["m"] for r in spark.sql(
        f"SELECT s, cast(({_LUHN_SPARK}) % 10 as int) AS m FROM luhn_v")
        .collect()}
    for v in vectors:
        assert got[v] == luhn_py(v), v
    assert got["001234567897"] == 0      # valid
    assert got["000000000000"] == 0      # degenerate but valid
    assert got["001234567890"] != 0      # off-by-checksum invalid
