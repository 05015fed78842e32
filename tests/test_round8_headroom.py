"""Round-8 int64-headroom and degenerate-input regression tests.

Two families, both born from the round-7 verdict:

1. **Extrapolation guards** for the corpus-scaled quantized-term sums
   (the `ext_chi2_independence` lesson: int64 wrap hides at small SF).
   Each test measures the actual per-term quantum magnitude on the
   fixture, extrapolates to the 100 TB design point (5e10 documents of
   ~2 KB / 2e11 64-dim f64 embedding vectors), and asserts the summed
   magnitude stays inside int64 with margin. Each also asserts the
   PRE-fix nano quantum would have failed — proving the test is sharp,
   not vacuous.

2. **Degenerate-corpus guards** for the divide-by-zero closes fixed this
   round (unanimous raters => P_e = 1 for both kappa statistics; an
   empty mixture component for the GMM M-step): the guarded queries must
   return the same row set in BOTH engines instead of Spark-NaN vs
   DuckDB-error.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

INT64_MAX = 2**63 - 1
N_DOCS_100TB = int(5e10)      # 100 TB / ~2 KB per document
N_VECS_100TB = int(2e11)      # 100 TB / (64 dims * 8 B)


# ---------------------------------------------------------------------------
# 1. extrapolation guards
# ---------------------------------------------------------------------------

def test_logreg_gradient_terms_survive_100tb(spark, sf_dir):
    """The gradient sum's magnitude is Sum|term| <= quantum * Sum|x|
    = quantum * N * mean|x| (the sound bound for a SUM — N * max|x|
    would be hysterically pessimistic). The gradient terms are
    (p - y) * x with |p - y| <= 1, x1 = ln(1+tokens), x2 = chars per
    token. Micro (the round-8 fix) must clear 100 TB with >= 2x
    margin; nano (the round-7 code) must provably NOT clear it."""
    import pyspark.sql.functions as F
    from project_etl_spark.io import table
    from project_etl_spark.operators import sampling_common as _sc

    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    t = _sc.ws_count_col()
    m = docs.select(
        F.log(F.lit(1.0) + t).alias("x1"),
        (F.col("n_chars").cast("double") / (t + F.lit(1.0))).alias("x2"),
    ).agg(F.avg(F.abs(F.col("x1"))).alias("a1"),
          F.avg(F.abs(F.col("x2"))).alias("a2")).first()
    mean_feat = max(m["a1"], m["a2"], 1.0)
    assert mean_feat * 1e6 * N_DOCS_100TB * 2 < INT64_MAX, (
        f"micro gradient sum would wrap at 100 TB (mean |x|={mean_feat:.1f})")
    assert mean_feat * 1e9 * N_DOCS_100TB > INT64_MAX, (
        "nano terms would NOT wrap — this guard has gone vacuous; "
        "tighten N_DOCS_100TB or drop the assertion")


def test_whiten_and_kmeans_member_sums_survive_100tb(spark, sf_dir):
    """Per-dimension mean / centroid sums quantize coordinates at micro;
    max |coordinate| * 1e6 * N_vectors(100 TB) must fit int64 (the
    whole corpus can land in one cluster), and the pre-fix nano quantum
    must not."""
    import pyspark.sql.functions as F
    from project_etl_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    mv = (emb.select(F.explode("embedding").alias("v"))
          .agg(F.max(F.abs(F.col("v").cast("double")))).first()[0])
    max_coord = max(float(mv), 1.0)
    assert max_coord * 1e6 * N_VECS_100TB * 2 < INT64_MAX, (
        f"micro coordinate sum would wrap at 100 TB (max |v|={max_coord:.2f})")
    assert max_coord * 1e9 * N_VECS_100TB > INT64_MAX


def test_calibration_and_gmm_prob_sums_survive_100tb(spark, sf_dir):
    """Probability-mass sums (calibration avg_pred, GMM responsibility
    s1): per-term <= 1 * quantum; GMM's weighted-length sum sx1 is
    bounded by max(n_chars) * 1e3 per term."""
    import pyspark.sql.functions as F
    from project_etl_spark.io import table

    assert 1e6 * N_DOCS_100TB * 2 < INT64_MAX         # micro p-sums hold
    assert 1e9 * N_DOCS_100TB > INT64_MAX             # nano would not
    max_chars = (table(spark, sf_dir, "documents")
                 .agg(F.max("n_chars")).first()[0])
    assert max_chars * 1e3 * N_DOCS_100TB * 2 < INT64_MAX, (
        f"milli weighted-length sum would wrap (max n_chars={max_chars})")


def test_anova_group_terms_survive_100tb(spark, sf_dir):
    """agg_anova_oneway deci-quantizes each group's s^2/n = n * mean^2;
    with the whole corpus in one group that is N * mean(n_chars)^2 * 10.
    Also pins that the raw second moment q = sum(n_chars^2) itself fits,
    since the close subtracts it in double off the exact int64."""
    import pyspark.sql.functions as F
    from project_etl_spark.io import table

    mean_chars = (table(spark, sf_dir, "documents")
                  .agg(F.avg("n_chars")).first()[0])
    assert mean_chars**2 * 1e1 * N_DOCS_100TB * 2 < INT64_MAX
    max_chars = (table(spark, sf_dir, "documents")
                 .agg(F.max("n_chars")).first()[0])
    assert max_chars**2 * N_DOCS_100TB < INT64_MAX  # q headroom (no quantum)


# ---------------------------------------------------------------------------
# 2. degenerate-corpus guards (both engines, same SQL text)
# ---------------------------------------------------------------------------

def _planted_docs_all_pass(n=7):
    """Documents where all three Fleiss raters (and both Cohen raters)
    vote 1: length in [200, 2000], zero digits, >= 10% spaces."""
    text = ("word " * 60).strip()          # 299 chars, ~20% spaces, 0 digits
    return [(i, text, len(text)) for i in range(n)]


def _run_both(spark, sql_text, rows):
    tbl = pa.table({"doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "n_chars": [r[2] for r in rows]})
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars int")
    sdf.createOrReplaceTempView("planted_docs")
    spark_sql = (sql_text
                 .replace("FROM documents WHERE n_chars > 0",
                          "FROM planted_docs WHERE n_chars > 0")
                 .replace(", '', 'g')", ", '')"))
    got_spark = spark.sql(spark_sql).collect()
    con = duckdb.connect()
    con.register("documents", tbl)
    got_duck = con.execute(sql_text).fetchall()
    con.close()
    return got_spark, got_duck


def test_fleiss_kappa_unanimous_corpus_yields_no_rows(spark):
    """All raters vote 1 on every doc => sv = 3n => P_e = 1; the WHERE
    guard must drop the row in BOTH engines (DuckDB would otherwise
    error on the divide)."""
    from project_etl_spark.operators.llm_curation import _FLEISS_SQL

    got_spark, got_duck = _run_both(spark, _FLEISS_SQL,
                                    _planted_docs_all_pass())
    assert got_spark == [] and got_duck == []


def test_cohen_kappa_unanimous_corpus_yields_no_rows(spark):
    """Both raters vote 1 on every doc => n11 = n => P_e = 1; guarded."""
    from project_etl_spark.operators.llm_curation import _KAPPA_SQL

    got_spark, got_duck = _run_both(spark, _KAPPA_SQL,
                                    _planted_docs_all_pass())
    assert got_spark == [] and got_duck == []


def test_gmm_empty_component_yields_one_row(spark):
    """Every doc far beyond mu2 (n_chars = 5000 => the responsibility
    exponent is ~+31, r1 micro-rounds to 0) => component 1 captures
    zero mass and its row (mean of an empty component = 0/0) must be
    dropped by the WHERE guard in both engines; component 2 survives
    with pi = 1."""
    from project_etl_spark.operators.llm_curation import _GMM_BODY

    rows = [(i, "x", 5000) for i in range(5)]
    tbl = pa.table({"doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "n_chars": [r[2] for r in rows]})
    sdf = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    sdf.createOrReplaceTempView("gmm_planted")
    got_spark = spark.sql(_GMM_BODY.format(src="gmm_planted")).collect()
    con = duckdb.connect()
    con.register("gmm_ducktbl", tbl)
    got_duck = con.execute(
        _GMM_BODY.format(src="gmm_ducktbl")).fetchall()
    con.close()
    assert len(got_spark) == 1 and len(got_duck) == 1
    assert got_spark[0]["component"] == 2
    assert got_spark[0]["pi_new_micro"] == 1_000_000
    assert [tuple(r) for r in got_spark] == got_duck
