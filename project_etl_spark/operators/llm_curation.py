"""§2.11 [EXT] round-4 curation operators — the stages a training-data
team runs AFTER the core dedup/quality passes (BASELINE.json:6):

- estimator/sketch audits: ``ext_minhash_accuracy`` (MinHash estimate vs
  exact Jaccard — the reference's N-in/N-out ground-truth methodology,
  Documentation-Self-Triggering.html:239, applied to an estimator),
  ``ext_fuzzy_editdist`` (Levenshtein second opinion on LSH candidates),
  ``ext_matryoshka_truncate`` (arXiv:2205.13147 truncation audit);
- data selection: ``ext_dsir_weights`` (importance resampling,
  arXiv:2302.03169), ``ext_quality_logistic`` (classifier inference),
  ``ext_quality_gopher_rules`` (rule census, arXiv:2112.11446);
- graph/retrieval: ``ext_pagerank_iter`` (power iterations over the
  near-dup graph), ``ext_hybrid_retrieval_rrf`` (BM25 x cosine fusion);
- pipeline accounting: ``ext_ngram_novelty`` (split leakage audit),
  ``ext_shard_manifest`` (balanced sharding without a global sort),
  ``ext_snapshot_diff`` (corpus version census),
  ``ext_pmi_collocations`` (collocation mining).

Everything is Catalyst-declared (no Python in hot paths) and hash-checked
against DuckDB under the portable-determinism discipline: integer-quantized
sums (``portable.qint``), md5-based hashing shared with ``llm_dedup``, and
single fixed-order IEEE scalar expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.operators import sampling_common as _sc
from project_etl_spark.operators.llm_dedup import (
    _H64,
    _LSH_CANDS_SQL,
    _LSH_PAIRS_SQL,
    _MINHASH_SIGS_SQL,
    _SHINGLES_SQL,
    _shingles,
    band_buckets_from_wide,
    jaccard_via_lsh,
    lsh_buckets,
    minhash_wide_signatures,
    ngrams_sql,
    word_ngrams,
)
from project_etl_spark.operators.llm_similarity import (
    _COSINE_SCORES_SQL,
    _POS_SQL,
    cosine_scores,
)
from project_etl_spark.operators.llm_text import _BM25_SCORED_SQL, bm25_scored
from project_etl_spark.portable import pround, qint, sql_qint
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


# --------------------------------------------------------------------------
# ext_minhash_accuracy
# --------------------------------------------------------------------------

@register(
    "ext_minhash_accuracy",
    oracle=f"""
        WITH shingles AS ({_SHINGLES_SQL}),
        {_MINHASH_SIGS_SQL},
        {_LSH_CANDS_SQL},
        est AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(CASE WHEN sa.minhash = sb.minhash
                            THEN 1 ELSE 0 END) AS BIGINT) AS agree
            FROM cands c
            JOIN sigs sa ON sa.doc_id = c.doc_a
            JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.k = sa.k
            GROUP BY 1, 2
        ),
        inter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
            FROM cands c
            JOIN shingles sa ON sa.doc_id = c.doc_a
            JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
            GROUP BY 1, 2
        ),
        shc AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id)
        SELECT e.doc_a, e.doc_b,
               (FLOOR(e.agree / 8e0 * 1e6 + 5e-1) / 1e6) AS est_jaccard,
               (FLOOR(COALESCE(i.n_common, 0) * 1e0
                      / (ca.n + cb.n - COALESCE(i.n_common, 0))
                      * 1e6 + 5e-1) / 1e6) AS jaccard,
               (FLOOR(ABS((FLOOR(e.agree / 8e0 * 1e6 + 5e-1) / 1e6)
                          - (FLOOR(COALESCE(i.n_common, 0) * 1e0
                                   / (ca.n + cb.n - COALESCE(i.n_common, 0))
                                   * 1e6 + 5e-1) / 1e6))
                      * 1e6 + 5e-1) / 1e6) AS abs_err
        FROM est e
        LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
        JOIN shc ca ON ca.doc_id = e.doc_a
        JOIN shc cb ON cb.doc_id = e.doc_b
    """,
    tags=("ext", "dedup", "minhash", "audit"),
)
def ext_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    Jaccard estimate (fraction of the 8 permutations that agree) next to
    the exact Jaccard and the absolute error — the reference's
    ground-truth-counting methodology
    (Documentation-Self-Triggering.html:239) applied to an estimator
    instead of a trigger path. This is the query you run before trusting a
    sketch at 100 TB: cost is candidate-bounded (the same equi-join shapes
    as the LSH flagship), and the exact side touches only candidate pairs,
    never all pairs."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    # wide signature row (m0..m7) feeds BOTH the banding projection and
    # the per-pair agreement; checkpoint it so the shingle pipeline runs
    # once (optimization round 12: the row-form sigs explode + the
    # per-band collect_list groupBy + the per-k agreement groupBy are
    # all gone — agreement over the wide join is a projection).
    wide = minhash_wide_signatures(sh).localCheckpoint(eager=True)
    buckets = band_buckets_from_wide(wide, 2)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    # Candidate pairs feed three consumers (estimate join, exact-intersect
    # join, count join) — checkpoint the small pair list so the banding
    # pipeline is derived once, not per consumer (lineage-truncation
    # rationale as in connected_components / ext_pagerank_iter).
    cands = (a.join(b, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    wa = wide.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(f"m{k}").alias(f"ma{k}") for k in range(8)])
    wb = wide.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(f"m{k}").alias(f"mb{k}") for k in range(8)])
    agree = sum((F.col(f"ma{k}") == F.col(f"mb{k}")).cast("long")
                for k in range(8))
    est = (cands.join(wa, "doc_a").join(wb, "doc_b")
           .select("doc_a", "doc_b", agree.alias("agree")))
    ia = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    ib = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (cands.join(ia, "doc_a").join(ib, ["doc_b", "sh"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    n_common = F.coalesce(F.col("n_common"), F.lit(0))
    est_j = pround(F.col("agree") / F.lit(8.0), 6)
    exact_j = pround(n_common * F.lit(1.0)
                     / (F.col("na") + F.col("nb") - n_common), 6)
    return (est.join(inter, ["doc_a", "doc_b"], "left")
            .join(ca, "doc_a").join(cb, "doc_b")
            .select("doc_a", "doc_b",
                    est_j.alias("est_jaccard"),
                    exact_j.alias("jaccard"),
                    pround(F.abs(est_j - exact_j), 6).alias("abs_err")))


# --------------------------------------------------------------------------
# ext_dsir_weights
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 128
_DSIR_TARGET_SQL = "CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END"
#: raw (non-distinct) word bigrams — occurrences matter for DSIR counts.
_BIGRAMS_SQL = """
            SELECT doc_id, w[i] || ' ' || w[i+1] AS sh
            FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w), 1))) AS i
                  FROM (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents))
"""


def _bigrams_occurrences(docs: DataFrame) -> DataFrame:
    """Non-distinct word bigrams per doc (Spark twin of ``_BIGRAMS_SQL``)."""
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    return toks.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat_ws(' ', w[i], w[i+1])) "
            "ELSE array() END")).alias("sh"))


@register(
    "ext_dsir_weights",
    oracle=f"""
        WITH bg AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)
                       % 2147483647 % {_DSIR_BUCKETS} AS bucket
            FROM ({_BIGRAMS_SQL})
        ),
        src AS (SELECT doc_id, {_DSIR_TARGET_SQL} AS tgt FROM documents),
        bgt AS (SELECT bg.doc_id, bg.bucket, src.tgt
                FROM bg JOIN src ON bg.doc_id = src.doc_id),
        stats AS (
            SELECT bucket,
                   CAST(SUM(tgt) AS BIGINT) AS ct,
                   CAST(SUM(1 - tgt) AS BIGINT) AS cr
            FROM bgt GROUP BY bucket
        ),
        tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                       CAST(SUM(cr) AS BIGINT) AS nr
                FROM stats),
        lam AS (
            SELECT bucket,
                   CAST(FLOOR(LN(((CAST(ct AS DOUBLE) + 1e0)
                                  / (CAST(nt AS DOUBLE) + {_DSIR_BUCKETS}e0))
                                 / ((CAST(cr AS DOUBLE) + 1e0)
                                    / (CAST(nr AS DOUBLE) + {_DSIR_BUCKETS}e0)))
                              * 1e9 + 5e-1) AS BIGINT) AS lq
            FROM stats, tot
        ),
        dw AS (
            SELECT bgt.doc_id, COUNT(*) AS nb,
                   CAST(SUM(lam.lq) AS BIGINT) AS sw
            FROM bgt JOIN lam ON bgt.bucket = lam.bucket
            GROUP BY bgt.doc_id
        )
        SELECT d.doc_id,
               COALESCE(dw.nb, 0) AS n_bigrams,
               (FLOOR(COALESCE(dw.sw, 0) / 1e9 * 1e6 + 5e-1) / 1e6)
                   AS dsir_logweight
        FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
    """,
    tags=("ext", "text", "sampling", "dsir"),
)
def ext_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much its hashed-bigram
    profile looks like a curated target slice (sources src0/src1) versus
    the raw pool. Feature space = bigram occurrences hashed into 128
    buckets; per-bucket log-likelihood ratio with add-one smoothing; a
    document's weight is the sum of its bigrams' ratios. Scale posture:
    the bucket statistics are one map-side-combinable aggregation over the
    bigram stream; the 128-row lambda table broadcasts; per-doc weights
    are one more hash aggregation — nothing is corpus-squared, and the
    lambda quantization (int64 1e-9 units) makes the float sums exact in
    any partitioning. Docs with no bigrams keep weight 0 (LEFT join)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    bg = _bigrams_occurrences(docs).select(
        "doc_id",
        (F.expr(_H64.format(col="sh")) % _DSIR_BUCKETS).alias("bucket"))
    src = docs.select(
        "doc_id",
        F.when(F.col("source").isin("src0", "src1"), 1).otherwise(0)
        .alias("tgt"))
    bgt = bg.join(src, "doc_id")
    stats = bgt.groupBy("bucket").agg(
        F.sum("tgt").alias("ct"),
        F.sum(F.lit(1) - F.col("tgt")).alias("cr"))
    tot = stats.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    nb = float(_DSIR_BUCKETS)
    lam = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        qint(F.log(((F.col("ct").cast("double") + F.lit(1.0))
                    / (F.col("nt").cast("double") + F.lit(nb)))
                   / ((F.col("cr").cast("double") + F.lit(1.0))
                      / (F.col("nr").cast("double") + F.lit(nb)))), 9)
        .alias("lq"))
    dw = (bgt.join(F.broadcast(lam), "bucket")
          .groupBy("doc_id")
          .agg(F.count(F.lit(1)).alias("nb"), F.sum("lq").alias("sw")))
    return (docs.select("doc_id").join(dw, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("nb", F.lit(0)).alias("n_bigrams"),
                    pround(F.coalesce("sw", F.lit(0)) / F.lit(1e9), 6)
                    .alias("dsir_logweight")))


# --------------------------------------------------------------------------
# ext_pagerank_iter
# --------------------------------------------------------------------------

@register(
    "ext_pagerank_iter",
    oracle=f"""
        WITH shingles AS ({_SHINGLES_SQL}),
        {_MINHASH_SIGS_SQL},
        {_LSH_PAIRS_SQL},
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        deg AS (SELECT src AS doc_id, COUNT(*) AS deg FROM edges GROUP BY src),
        nsc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        pr0 AS (SELECT doc_id, 1e0 / n AS pr FROM deg, nsc),
        it1 AS (
            SELECT e.dst AS doc_id,
                   1.5e-1 / nsc.n + 8.5e-1 *
                   (CAST(SUM(CAST(FLOOR(p.pr / d.deg * 1e12 + 5e-1)
                                  AS BIGINT)) AS BIGINT) / 1e12) AS pr
            FROM edges e
            JOIN deg d ON e.src = d.doc_id
            JOIN pr0 p ON e.src = p.doc_id
            CROSS JOIN nsc
            GROUP BY e.dst, nsc.n
        ),
        it2 AS (
            SELECT e.dst AS doc_id,
                   1.5e-1 / nsc.n + 8.5e-1 *
                   (CAST(SUM(CAST(FLOOR(p.pr / d.deg * 1e12 + 5e-1)
                                  AS BIGINT)) AS BIGINT) / 1e12) AS pr
            FROM edges e
            JOIN deg d ON e.src = d.doc_id
            JOIN it1 p ON e.src = p.doc_id
            CROSS JOIN nsc
            GROUP BY e.dst, nsc.n
        )
        SELECT i.doc_id, d.deg,
               (FLOOR(i.pr * 1e9 + 5e-1) / 1e9) AS pagerank
        FROM it2 i JOIN deg d ON i.doc_id = d.doc_id
    """,
    tags=("ext", "graph", "iterative"),
)
def ext_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two PageRank power iterations (damping 0.85) over the verified
    near-dup graph — which documents sit at the center of duplication
    clusters, the graph-centrality companion to
    ``ext_dedup_connected_components``. The graph is the LSH-verified pair
    list symmetrized, so every vertex has degree >= 1 and there is no
    dangling mass. Each iteration is one equi-join (rank to edge source) +
    one hash aggregation on the destination — the exact shape GraphX/
    Pregel lowers to, and it scales as edges-proportional shuffles. The
    per-edge contribution is quantized to int64 1e-12 units before the
    sum, so the rank vector is bit-identical under any partitioning; a
    fixed iteration count (2) keeps the query a static DAG."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    pairs = jaccard_via_lsh(docs, threshold=0.5, rows_per_band=2)
    # Checkpoint the (candidate-bounded, pair-sized) edge list: it feeds the
    # degree table plus every iteration's join, and each re-reference would
    # otherwise re-derive the whole LSH pipeline — same lineage-truncation
    # rationale as connected_components above. At 100 TB: reliable
    # checkpoint dir instead of local blocks.
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .unionAll(pairs.select(F.col("doc_b").alias("src"),
                                    F.col("doc_a").alias("dst")))
             .localCheckpoint(eager=True))
    deg = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("deg"))
    nsc = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = deg.crossJoin(F.broadcast(nsc)).select(
        "doc_id", (F.lit(1.0) / F.col("n")).alias("pr"))
    for _ in range(2):
        contrib = (edges
                   .join(deg.withColumnRenamed("doc_id", "src")
                         .withColumnRenamed("deg", "src_deg"), "src")
                   .join(pr.withColumnRenamed("doc_id", "src"), "src")
                   .select("dst", qint(F.col("pr") / F.col("src_deg"), 12)
                           .alias("cq")))
        pr = (contrib.groupBy(F.col("dst").alias("doc_id"))
              .agg(F.sum("cq").alias("sq"))
              .crossJoin(F.broadcast(nsc))
              .select("doc_id",
                      (F.lit(0.15) / F.col("n")
                       + F.lit(0.85) * (F.col("sq") / F.lit(1e12)))
                      .alias("pr")))
    return (pr.join(deg, "doc_id")
            .select("doc_id", "deg", pround(F.col("pr"), 9).alias("pagerank")))


# --------------------------------------------------------------------------
# ext_ngram_novelty
# --------------------------------------------------------------------------

_NGRAMS5_SQL = ngrams_sql(5)


@register(
    "ext_ngram_novelty",
    oracle=f"""
        WITH grams AS ({_NGRAMS5_SQL}),
        split AS (
            SELECT doc_id, lang,
                   CASE WHEN ({_sc.BUCKET_SQL}) % 10 <= 7
                        THEN 'train' ELSE 'heldout' END AS split
            FROM documents
        ),
        g AS (SELECT DISTINCT s.lang, s.split, grams.sh
              FROM grams JOIN split s ON grams.doc_id = s.doc_id),
        train AS (SELECT lang, sh FROM g WHERE split = 'train'),
        held AS (SELECT lang, sh FROM g WHERE split = 'heldout'),
        novel AS (
            SELECT h.lang, COUNT(*) AS n_novel
            FROM held h LEFT JOIN train t
              ON h.lang = t.lang AND h.sh = t.sh
            WHERE t.sh IS NULL
            GROUP BY h.lang
        ),
        totals AS (SELECT lang, COUNT(*) AS n_held FROM held GROUP BY lang)
        SELECT t.lang, t.n_held, COALESCE(v.n_novel, 0) AS n_novel,
               (FLOOR(COALESCE(v.n_novel, 0) * 1e0 / t.n_held * 1e6 + 5e-1)
                / 1e6) AS novelty_rate
        FROM totals t LEFT JOIN novel v ON t.lang = v.lang
    """,
    tags=("ext", "text", "audit"),
)
def ext_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-novelty audit: per language, the fraction of the held-out
    split's distinct word 5-grams that never occur in train — the
    leakage/memorization check a training-data pipeline runs on its own
    split (the inverse of ``ext_decontaminate``: there the eval slice is
    external, here the split itself is audited). Reuses the positional
    n-gram fragment (n=5) and the md5 split bucket shared with
    ``ext_sample_split``. Scale: distinct-gram sets per (lang, split) are
    one hash aggregation over the exploded grams; the anti-join is an
    equi-join on (lang, sh) — no quadratic shape anywhere."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    grams = word_ngrams(docs, 5)
    split = docs.select(
        "doc_id", "lang",
        F.when(_sc.bucket_col() % 10 <= 7, F.lit("train"))
        .otherwise(F.lit("heldout")).alias("split"))
    g = (grams.join(split, "doc_id")
         .select("lang", "split", "sh").distinct())
    train = (g.where(F.col("split") == "train")
             .select("lang", "sh"))
    held = (g.where(F.col("split") == "heldout")
            .select("lang", "sh"))
    novel = (held.join(train, ["lang", "sh"], "left_anti")
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n_novel")))
    totals = held.groupBy("lang").agg(F.count(F.lit(1)).alias("n_held"))
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0))
    return (totals.join(novel, "lang", "left")
            .select("lang", "n_held", n_novel.alias("n_novel"),
                    pround(n_novel * F.lit(1.0) / F.col("n_held"), 6)
                    .alias("novelty_rate")))


# --------------------------------------------------------------------------
# ext_shard_manifest
# --------------------------------------------------------------------------

_SHARD_GROUPS = 32
_SHARDS = 8


@register(
    "ext_shard_manifest",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id,
                   {_sc.WS_COUNT_SQL} AS n_tokens,
                   ({_sc.BUCKET_SQL}) % {_SHARD_GROUPS} AS g
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, n_tokens, g,
                   ROW_NUMBER() OVER (PARTITION BY g
                                      ORDER BY n_tokens DESC, doc_id) AS rn
            FROM sized
        ),
        assigned AS (
            SELECT doc_id, n_tokens,
                   ((rn - 1) * {_SHARD_GROUPS} + g) % {_SHARDS} AS shard
            FROM ranked
        )
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
        FROM assigned GROUP BY shard
    """,
    tags=("ext", "text", "sharding"),
)
def ext_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output-shard manifest WITHOUT a global sort: documents are
    salted into 32 groups by the md5 bucket, ranked by token
    count inside each group (parallel windows — no single-partition
    bottleneck), and dealt round-robin across 8 shards by
    interleaved rank. Longest-first dealing bounds shard skew to one
    document's tokens per group, which is the writer-side guarantee a
    training job wants (every shard file costs a similar number of
    sequence-packed batches). The manifest is the 8-row per-shard
    census; joining ``assigned`` back to the corpus is the actual write
    path (``partitionBy(shard)``)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        _sc.ws_count_col().alias("n_tokens"),
        (_sc.bucket_col() % _SHARD_GROUPS).alias("g"))
    w = Window.partitionBy("g").orderBy(F.col("n_tokens").desc(), "doc_id")
    assigned = sized.select(
        "doc_id", "n_tokens",
        ((F.row_number().over(w) - 1) * _SHARD_GROUPS + F.col("g"))
        .alias("dealt"))
    return (assigned
            .groupBy((F.col("dealt") % _SHARDS).alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.max("n_tokens").alias("max_doc_tokens")))


@register(
    "ext_shard_skew_report",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id,
                   {_sc.WS_COUNT_SQL} AS n_tokens,
                   ({_sc.BUCKET_SQL}) % {_SHARD_GROUPS} AS g
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, n_tokens, g,
                   ROW_NUMBER() OVER (PARTITION BY g
                                      ORDER BY n_tokens DESC, doc_id) AS rn
            FROM sized
        ),
        assigned AS (
            SELECT doc_id, n_tokens,
                   ((rn - 1) * {_SHARD_GROUPS} + g) % {_SHARDS} AS shard
            FROM ranked
        ),
        manifest AS (
            SELECT shard, CAST(SUM(n_tokens) AS BIGINT) AS t
            FROM assigned GROUP BY shard
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
                   CAST(MIN(t) AS BIGINT) AS min_shard_tokens,
                   CAST(MAX(t) AS BIGINT) AS max_shard_tokens,
                   CAST(SUM(t) AS BIGINT) AS total_tokens,
                   CAST(SUM(t * t) AS BIGINT) AS sum_sq
            FROM manifest
        )
        SELECT n_shards, min_shard_tokens, max_shard_tokens, total_tokens,
               (FLOOR((max_shard_tokens - min_shard_tokens) * n_shards * 1.0
                      / total_tokens * 1e6 + 5e-1) / 1e6) AS spread_rel,
               (FLOOR(SQRT(CAST(n_shards * sum_sq
                                - total_tokens * total_tokens AS DOUBLE))
                      / total_tokens * 1e6 + 5e-1) / 1e6) AS cv
        FROM s
    """,
    tags=("ext", "text", "sharding", "audit"),
)
def ext_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit over the ``ext_shard_manifest`` assignment: the
    one-row report a training job reads before launch — min/max shard
    token budgets, relative spread ((max-min)/mean), and the coefficient
    of variation across shards. Longest-first round-robin dealing promises
    near-equal shards; this is the check that the promise held on the
    actual corpus (a regression in the dealing — e.g. an accidental
    global-sort removal or a salting change — shows up directly in
    spread_rel). Cost: the manifest aggregation (salted parallel windows,
    no global sort) plus an 8-row reduction; both moments are exact
    integer sums, each ratio is one deterministic IEEE op chain, so the
    report is hash-checked."""
    ensure_deterministic(spark)
    m = ext_shard_manifest(spark, sf_dir).select(
        "shard", F.col("total_tokens").cast("long").alias("t"))
    s = m.agg(F.count(F.lit(1)).cast("long").alias("n_shards"),
              F.min("t").cast("long").alias("min_shard_tokens"),
              F.max("t").cast("long").alias("max_shard_tokens"),
              F.sum("t").cast("long").alias("total_tokens"),
              F.sum(F.col("t") * F.col("t")).cast("long").alias("sum_sq"))
    spread = ((F.col("max_shard_tokens") - F.col("min_shard_tokens"))
              * F.col("n_shards") * F.lit(1.0) / F.col("total_tokens"))
    cv = (F.sqrt((F.col("n_shards") * F.col("sum_sq")
                  - F.col("total_tokens") * F.col("total_tokens"))
                 .cast("double")) / F.col("total_tokens"))
    return s.select("n_shards", "min_shard_tokens", "max_shard_tokens",
                    "total_tokens",
                    pround(spread, 6).alias("spread_rel"),
                    pround(cv, 6).alias("cv"))


# --------------------------------------------------------------------------
# ext_hybrid_retrieval_rrf
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20


@register(
    "ext_hybrid_retrieval_rrf",
    oracle=f"""
        WITH {_BM25_SCORED_SQL},
        {_COSINE_SCORES_SQL},
        b20 AS (
            SELECT doc_id, FLOOR(score * 1e6 + 5e-1) AS sq
            FROM scored
            ORDER BY 2 DESC, doc_id
            LIMIT {_RRF_DEPTH}
        ),
        br AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY sq DESC, doc_id) AS r_bm25
               FROM b20),
        c20 AS (
            SELECT vec_id AS doc_id, cosine_sim
            FROM cos_scores
            ORDER BY cosine_sim DESC, vec_id
            LIMIT {_RRF_DEPTH}
        ),
        cr AS (SELECT doc_id,
                      ROW_NUMBER() OVER (
                          ORDER BY cosine_sim DESC, doc_id) AS r_cos
               FROM c20)
        SELECT COALESCE(br.doc_id, cr.doc_id) AS doc_id,
               br.r_bm25, cr.r_cos,
               (FLOOR((COALESCE(1e0 / ({_RRF_K} + br.r_bm25), 0e0)
                       + COALESCE(1e0 / ({_RRF_K} + cr.r_cos), 0e0))
                      * 1e9 + 5e-1) / 1e9) AS rrf_score
        FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
        ORDER BY 4 DESC, 1
        LIMIT 10
    """,
    tags=("ext", "search", "fusion"),
)
def ext_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009,
    the k=60 standard): fuse the BM25 lexical ranking with the exact-cosine
    embedding ranking for the same corpus (doc_id == vec_id by fixture
    construction) — the retrieval stack of every modern RAG/data-mining
    pipeline, lexical recall + semantic recall in one list. Scale shape:
    each ranker ends in TakeOrderedAndProject at depth 20
    (parallel partial top-k — no ranker ever global-sorts the corpus), rank
    assignment is a window over 20 rows, and the fusion is a
    20-row full-outer join. 1/(k+r) terms are exact IEEE
    divisions summed in one fixed-order two-term add."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    b20 = (bm25_scored(docs)
           .select("doc_id",
                   F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5))
                   .alias("sq"))
           .orderBy(F.col("sq").desc(), "doc_id")
           .limit(_RRF_DEPTH))
    br = b20.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("sq").desc(), "doc_id")).alias("r_bm25"))
    c20 = (cosine_scores(emb)
           .select(F.col("vec_id").alias("doc_id"), "cosine_sim")
           .orderBy(F.col("cosine_sim").desc(), "doc_id")
           .limit(_RRF_DEPTH))
    cr = c20.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("cosine_sim").desc(), "doc_id"))
        .alias("r_cos"))
    rrf = (F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_bm25")), F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_cos")),
                        F.lit(0.0)))
    return (br.join(cr, "doc_id", "full")
            .select("doc_id", "r_bm25", "r_cos",
                    pround(rrf, 9).alias("rrf_score"))
            .orderBy(F.col("rrf_score").desc(), "doc_id")
            .limit(10))


# --------------------------------------------------------------------------
# ext_quality_logistic
# --------------------------------------------------------------------------

#: fixed classifier weights (a stand-in for fasttext/linear quality models:
#: the INFERENCE shape is what the operator demonstrates — the weights of a
#: real model would arrive as literals or a broadcast table the same way).
_QL_BIAS = "-2e0"
_QL_W_LOGTOK = "9e-1"
_QL_W_AWL = "-1e-1"


@register(
    "ext_quality_logistic",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang,
                   LN(1e0 + {_sc.WS_COUNT_SQL}) AS f_logtok,
                   (CAST(n_chars AS DOUBLE)
                    / ({_sc.WS_COUNT_SQL} + 1e0)) AS f_awl
            FROM documents
        ),
        scoredq AS (
            SELECT doc_id, lang,
                   1e0 / (1e0 + EXP(-({_QL_BIAS}
                                      + {_QL_W_LOGTOK} * f_logtok
                                      + {_QL_W_AWL} * f_awl))) AS p
            FROM feats
        )
        SELECT doc_id, lang,
               (FLOOR(p * 1e6 + 5e-1) / 1e6) AS quality_prob,
               CASE WHEN p >= 5e-1 THEN 1 ELSE 0 END AS kept
        FROM scoredq
    """,
    tags=("ext", "text", "quality", "inference"),
)
def ext_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering as batch inference: a logistic
    classifier over row-local features (log token count, average word
    length) scores every document, keep = p >= 0.5 — the shape of the
    fasttext/linear quality-classifier stage in public LLM data pipelines
    (CCNet, C4 descendants). The weights are literals here; a trained
    model's coefficients would ship the same way (literal fold-in or a
    broadcast row). Plan: pure map pass — features, dot product and
    sigmoid all codegen inside the scan stage, zero shuffles — so it runs
    at scan speed on 100 TB. Fixed-order IEEE algebra (LN/EXP on identical
    inputs) keeps the probabilities hash-exact across engines."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    t = _sc.ws_count_col()
    f_logtok = F.log(F.lit(1.0) + t)
    f_awl = F.col("n_chars").cast("double") / (t + F.lit(1.0))
    z = (F.lit(float(_QL_BIAS))
         + F.lit(float(_QL_W_LOGTOK)) * f_logtok
         + F.lit(float(_QL_W_AWL)) * f_awl)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id", "lang",
        pround(p, 6).alias("quality_prob"),
        F.when(p >= 0.5, 1).otherwise(0).alias("kept"))


# --------------------------------------------------------------------------
# ext_snapshot_diff
# --------------------------------------------------------------------------

#: deterministic synthetic "next snapshot" rules (self-contained demo of a
#: corpus-versioning diff; in production B is simply the newer table).
_SNAP_REMOVE = "doc_id % 17 = 3"
_SNAP_CHANGE = "doc_id % 13 = 1"
_SNAP_ADD = "doc_id % 19 = 2"


@register(
    "ext_snapshot_diff",
    oracle=f"""
        WITH a AS (SELECT doc_id, text FROM documents),
        b AS (
            SELECT doc_id,
                   CASE WHEN {_SNAP_CHANGE} THEN text || ' [rev2]'
                        ELSE text END AS text
            FROM documents WHERE NOT ({_SNAP_REMOVE})
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   'new: ' || text AS text
            FROM documents WHERE {_SNAP_ADD}
        ),
        diff AS (
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   COALESCE(length(b.text), 0) - COALESCE(length(a.text), 0)
                       AS chars_delta
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        )
        SELECT status, COUNT(*) AS n_docs,
               CAST(SUM(chars_delta) AS BIGINT) AS chars_delta
        FROM diff GROUP BY status
    """,
    tags=("ext", "versioning"),
)
def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the data-versioning census every managed
    training set needs between refreshes (added / removed / changed /
    unchanged, with the net character delta). Content equality is by text
    fingerprint (md5), not by column compare, so the same query works when
    snapshot B lives in a different store. The demo synthesizes snapshot B
    from deterministic row rules (deletions, edits, additions); in
    production B is the newer table and the plan is identical: one
    full-outer equi-join on the key + a 4-group census — linear, no
    quadratic shape, and the join key is the natural dedup/bucketing key
    so co-located snapshots diff shuffle-free."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    a = docs.select("doc_id", "text")
    b = (docs.where(~F.expr(_SNAP_REMOVE))
         .select("doc_id",
                 F.when(F.expr(_SNAP_CHANGE),
                        F.concat(F.col("text"), F.lit(" [rev2]")))
                 .otherwise(F.col("text")).alias("text"))
         .unionByName(
             docs.where(F.expr(_SNAP_ADD))
             .select((F.col("doc_id") + 10000000).alias("doc_id"),
                     F.concat(F.lit("new: "), F.col("text")).alias("text"))))
    al = a.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"))
    bl = b.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
    diff = (al.join(bl, al["a_id"] == bl["b_id"], "full")
            .select(
                F.when(F.col("a_id").isNull(), F.lit("added"))
                .when(F.col("b_id").isNull(), F.lit("removed"))
                .when(F.md5("a_text") == F.md5("b_text"), F.lit("unchanged"))
                .otherwise(F.lit("changed")).alias("status"),
                (F.coalesce(F.length("b_text"), F.lit(0))
                 - F.coalesce(F.length("a_text"), F.lit(0)))
                .alias("chars_delta")))
    return (diff.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("chars_delta").alias("chars_delta")))


# --------------------------------------------------------------------------
# ext_quality_gopher_rules
# --------------------------------------------------------------------------

#: rule thresholds (Rae et al. 2021, arXiv:2112.11446, Table A1 spirit —
#: bounds tuned to the synthetic fixture's scale so both branches fire).
_GR_MIN_WORDS = 5
_GR_MAX_WORDS = 500
_GR_MIN_AWL = "2e0"
_GR_MAX_AWL = "1e1"
_GR_MAX_DIGIT_FRAC = "2e-1"


@register(
    "ext_quality_gopher_rules",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang,
                   {_sc.WS_COUNT_SQL} AS n_words,
                   (CAST(n_chars AS DOUBLE) / ({_sc.WS_COUNT_SQL} + 1e0))
                       AS awl,
                   (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         AS DOUBLE) / n_chars) AS digit_frac
            FROM documents WHERE n_chars > 0
        ),
        ruled AS (
            SELECT doc_id, lang,
                   CASE WHEN n_words < {_GR_MIN_WORDS} THEN 'too_few_words'
                        WHEN n_words > {_GR_MAX_WORDS} THEN 'too_many_words'
                        WHEN awl < {_GR_MIN_AWL} THEN 'words_too_short'
                        WHEN awl > {_GR_MAX_AWL} THEN 'words_too_long'
                        WHEN digit_frac > {_GR_MAX_DIGIT_FRAC}
                            THEN 'too_many_digits'
                        ELSE 'pass' END AS verdict
            FROM feats
        )
        SELECT lang, verdict, COUNT(*) AS n_docs
        FROM ruled GROUP BY lang, verdict
    """,
    tags=("ext", "text", "quality", "rules"),
)
def ext_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filtering with REASONS (Gopher-style, Rae et al.
    2021, arXiv:2112.11446): word-count bounds, mean-word-length bounds
    and digit-fraction cap, each document tagged with the FIRST failed
    rule — the per-reason census is what a curation team actually reads
    (it tells you which rule to retune, where the classifier twin
    ``ext_quality_logistic`` only says keep/drop). Pure map pass over the
    scan (row-local regex + arithmetic, codegen) + one small census
    aggregation; ordering of rules is part of the contract, so the CASE
    chain is identical text in both engines."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    n_words = _sc.ws_count_col()
    awl = F.col("n_chars").cast("double") / (n_words + F.lit(1.0))
    digit_frac = (F.length(F.regexp_replace("text", "[^0-9]", ""))
                  .cast("double") / F.col("n_chars"))
    verdict = (F.when(n_words < _GR_MIN_WORDS, "too_few_words")
               .when(n_words > _GR_MAX_WORDS, "too_many_words")
               .when(awl < 2.0, "words_too_short")
               .when(awl > 10.0, "words_too_long")
               .when(digit_frac > 0.2, "too_many_digits")
               .otherwise("pass"))
    return (docs.select("lang", verdict.alias("verdict"))
            .groupBy("lang", "verdict")
            .agg(F.count(F.lit(1)).alias("n_docs")))


@register(
    "ext_quality_ensemble",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang, n_chars,
                   {_sc.WS_COUNT_SQL} AS n_words,
                   (CAST(n_chars AS DOUBLE) / ({_sc.WS_COUNT_SQL} + 1e0))
                       AS awl,
                   (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         AS DOUBLE) / n_chars) AS digit_frac,
                   (CAST(len(list_distinct(string_split(text, ' ')))
                         AS DOUBLE)
                    / len(string_split(text, ' '))) AS distinct_ratio,
                   LN(1e0 + {_sc.WS_COUNT_SQL}) AS f_logtok
            FROM documents WHERE n_chars > 0
        ),
        voted AS (
            SELECT doc_id, lang,
                   (CASE WHEN n_words >= {_GR_MIN_WORDS}
                          AND n_words <= {_GR_MAX_WORDS}
                          AND awl >= {_GR_MIN_AWL} AND awl <= {_GR_MAX_AWL}
                          AND digit_frac <= {_GR_MAX_DIGIT_FRAC}
                         THEN 1 ELSE 0 END)
                   + (CASE WHEN 1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) >= 5e-1
                         THEN 1 ELSE 0 END)
                   + (CASE WHEN distinct_ratio >= 3e-1 THEN 1 ELSE 0 END)
                   + (CASE WHEN n_chars >= 120 AND n_chars <= 20000
                         THEN 1 ELSE 0 END) AS votes
            FROM feats
        )
        SELECT lang, CAST(votes AS BIGINT) AS votes,
               COUNT(*) AS n_docs,
               CAST(CASE WHEN votes >= 3 THEN COUNT(*) ELSE 0 END AS BIGINT)
                   AS n_kept
        FROM voted GROUP BY lang, votes
    """,
    tags=("ext", "text", "quality", "ensemble"),
)
def ext_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality verdict — the FineWeb-style stage where several
    independent quality signals VOTE instead of any single filter
    deciding: (1) the Gopher rule battery as one pass/fail, (2) the
    logistic classifier at p >= 0.5, (3) lexical diversity
    (distinct-word ratio >= 0.3 — the row-local repetition proxy), (4) a
    length corridor. A document is kept on >= 3 of 4 votes; the census
    reports the per-(lang, votes) histogram so a curator sees HOW
    marginal the kept mass is (docs at exactly 3 votes are the ones a
    threshold change flips). Every signal is row-local arithmetic/regex
    inside whole-stage codegen — one scan, one small census aggregate, no
    shuffles of the text. Fixed-order IEEE algebra keeps the logistic
    vote hash-exact across engines."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    n_words = _sc.ws_count_col()
    awl = F.col("n_chars").cast("double") / (n_words + F.lit(1.0))
    digit_frac = (F.length(F.regexp_replace("text", "[^0-9]", ""))
                  .cast("double") / F.col("n_chars"))
    toks = F.split("text", " ")
    distinct_ratio = (F.size(F.array_distinct(toks)).cast("double")
                      / F.size(toks))
    f_logtok = F.log(F.lit(1.0) + n_words)
    # one-constant-feeds-both-sides: the Spark literals parse the same
    # _QL_*/_GR_* strings the oracle SQL interpolates, so editing a weight
    # can never desynchronize builder and oracle
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(
        -(F.lit(float(_QL_BIAS)) + F.lit(float(_QL_W_LOGTOK)) * f_logtok
          + F.lit(float(_QL_W_AWL)) * awl)))
    votes = (
        F.when((n_words >= _GR_MIN_WORDS) & (n_words <= _GR_MAX_WORDS)
               & (awl >= float(_GR_MIN_AWL)) & (awl <= float(_GR_MAX_AWL))
               & (digit_frac <= float(_GR_MAX_DIGIT_FRAC)), 1)
        .otherwise(0)
        + F.when(p >= 0.5, 1).otherwise(0)
        + F.when(distinct_ratio >= 0.3, 1).otherwise(0)
        + F.when((F.col("n_chars") >= 120) & (F.col("n_chars") <= 20000), 1)
        .otherwise(0))
    return (docs.select("lang", votes.cast("long").alias("votes"))
            .groupBy("lang", "votes")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("lang", "votes", "n_docs",
                    F.when(F.col("votes") >= 3, F.col("n_docs"))
                    .otherwise(F.lit(0)).cast("long").alias("n_kept")))


# --------------------------------------------------------------------------
# ext_fuzzy_editdist / ext_ann_recall_report / ext_matryoshka_truncate
# --------------------------------------------------------------------------

@register(
    "ext_fuzzy_editdist",
    oracle=f"""
        WITH shingles AS ({_SHINGLES_SQL}),
        {_MINHASH_SIGS_SQL},
        {_LSH_CANDS_SQL}
        SELECT c.doc_a, c.doc_b,
               CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist,
               (FLOOR(levenshtein(da.text, db.text) * 1e0
                      / GREATEST(length(da.text), length(db.text))
                      * 1e6 + 5e-1) / 1e6) AS edit_dist_norm
        FROM cands c
        JOIN documents da ON da.doc_id = c.doc_a
        JOIN documents db ON db.doc_id = c.doc_b
    """,
    tags=("ext", "dedup", "fuzzy"),
)
def ext_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of near-dup candidates: Levenshtein
    distance (absolute + normalized by the longer text) for every LSH
    candidate pair — the character-level second opinion next to the
    token-level Jaccard verify, and the standard fuzzy-matching surface
    (both engines ship the same classic DP ``levenshtein``). The scale
    discipline is the point: Levenshtein is O(len_a x len_b) PER PAIR, so
    it is only ever evaluated on the candidate-bounded pair list the LSH
    banding emits, never as a corpus self-join."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    buckets = lsh_buckets(sh, 2)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    da = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("text_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("text_b"))
    dist = F.levenshtein("text_a", "text_b")
    return (cands.join(da, "doc_a").join(db, "doc_b")
            .select("doc_a", "doc_b",
                    dist.alias("edit_dist"),
                    pround(dist * F.lit(1.0)
                           / F.greatest(F.length("text_a"),
                                        F.length("text_b")), 6)
                    .alias("edit_dist_norm")))


@register(
    "ext_matryoshka_truncate",
    oracle="""
        WITH pos AS (
            SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS v
            FROM embeddings, generate_series(1, 64) t(i)
        ),
        norms AS (
            SELECT vec_id,
                   SQRT(SUM(v * v)) AS norm_full,
                   SQRT(SUM(CASE WHEN i <= 16 THEN v * v ELSE 0e0 END))
                       AS norm_16
            FROM pos GROUP BY vec_id
        )
        SELECT vec_id,
               (FLOOR(norm_16 / norm_full * 1e6 + 5e-1) / 1e6)
                   AS energy_ratio_16,
               CASE WHEN norm_16 / norm_full >= 4e-1 THEN 1 ELSE 0 END
                   AS usable_16
        FROM norms
    """,
    tags=("ext", "similarity", "mrl"),
)
def ext_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit (Kusupati et al. 2022,
    arXiv:2205.13147): how much of each embedding's L2 energy survives
    keeping only the first 16 of 64 dimensions — the question you answer
    before serving truncated vectors for cheap first-stage retrieval.
    Row-local higher-order array algebra (slice, fold, one sqrt), zero
    shuffles; the per-vector energy ratio + a usability flag at the 0.4
    threshold. On MRL-trained embeddings this ratio concentrates near 1;
    on these synthetic vectors it documents the baseline (~sqrt(16/64))
    — either way the audit query is the deliverable."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    full = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    head = F.aggregate(
        F.transform(F.slice("embedding", 1, 16),
                    lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    ratio = F.sqrt(head) / F.sqrt(full)
    return emb.select(
        "vec_id",
        pround(ratio, 6).alias("energy_ratio_16"),
        F.when(ratio >= 0.4, 1).otherwise(0).alias("usable_16"))


# --------------------------------------------------------------------------
# ext_pmi_collocations
# --------------------------------------------------------------------------

_PMI_MIN_PAIR = 5


@register(
    "ext_pmi_collocations",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
                GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
        bg AS (
            SELECT w[i] AS w1, w[i+1] AS w2
            FROM (SELECT w, unnest(range(1, greatest(len(w), 1))) AS i
                  FROM (SELECT list_filter(string_split(lower(text), ' '),
                                           x -> x <> '') AS w
                        FROM documents))
        ),
        pairs AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2
            HAVING COUNT(*) >= {_PMI_MIN_PAIR}
        )
        SELECT p.w1, p.w2, p.c12,
               (FLOOR(LN((CAST(p.c12 AS DOUBLE) * t.n)
                         / (CAST(u1.c AS DOUBLE) * u2.c))
                      * 1e6 + 5e-1) / 1e6) AS pmi
        FROM pairs p
        JOIN uni u1 ON p.w1 = u1.tok
        JOIN uni u2 ON p.w2 = u2.tok
        CROSS JOIN tot t
        ORDER BY FLOOR(LN((CAST(p.c12 AS DOUBLE) * t.n)
                          / (CAST(u1.c AS DOUBLE) * u2.c))
                       * 1e6 + 5e-1) DESC, p.w1, p.w2
        LIMIT 20
    """,
    tags=("ext", "text", "collocation"),
)
def ext_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: the top-20
    adjacent word pairs whose co-occurrence most exceeds chance
    (PMI = ln(c12*N / (c1*c2)), support >= 5) — the classic
    phrase-discovery signal feeding tokenizer vocab decisions and
    stop-phrase lists (the statistical cousin of ``ext_bpe_merge_step``'s
    frequency ranking). Two map-side-combinable count aggregations, a
    pair->unigram broadcast-friendly join, a 1-row corpus total, and
    TakeOrderedAndProject on the quantized PMI with a total-order
    tie-break — nothing corpus-squared."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
            .where(F.col("tok") != ""))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    w = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    bg = docs.select(w.alias("warr")).select(
        F.explode(F.expr(
            "CASE WHEN size(warr) >= 2 THEN "
            "transform(sequence(0, size(warr) - 2), "
            "i -> struct(warr[i] AS w1, warr[i+1] AS w2)) "
            "ELSE array() END")).alias("p")).select("p.w1", "p.w2")
    pairs = (bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
             .where(F.col("c12") >= _PMI_MIN_PAIR))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log((F.col("c12").cast("double") * F.col("n"))
                / (F.col("c1").cast("double") * F.col("c2")))
    pmi_q = F.floor(pmi * F.lit(1e6) + F.lit(0.5))
    return (pairs.join(F.broadcast(u1), "w1").join(F.broadcast(u2), "w2")
            .crossJoin(F.broadcast(tot))
            .orderBy(pmi_q.desc(), "w1", "w2")
            .limit(20)
            .select("w1", "w2", "c12", (pmi_q / F.lit(1e6)).alias("pmi")))


# --------------------------------------------------------------------------
# ext_ann_recall_report
# --------------------------------------------------------------------------

def _ann_recall_oracle() -> str:
    from project_etl_spark.registry import REGISTRY
    ivf = REGISTRY["ext_ann_ivf_topk"].oracle
    exact = REGISTRY["ext_sim_search_topk"].oracle
    return f"""
        WITH ivf AS ({ivf}),
             exact10 AS ({exact})
        SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap,
               (COUNT(*) / 1e1) AS recall_at_10
        FROM ivf JOIN exact10 ON ivf.vec_id = exact10.vec_id
    """


@register(
    "ext_ann_recall_report",
    oracle=_ann_recall_oracle(),
    tags=("ext", "similarity", "audit"),
)
def ext_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index as a FIRST-CLASS query, not just a test
    gate: run the approximate top-10 and the exact top-10 side by side and
    report their overlap — the production ANN-quality dashboard number
    (the reference's N-in/N-out counting, Documentation-Self-Triggering.html:239,
    applied to index quality). Because both the IVF walk and the exact
    scan are deterministic, the recall itself is deterministic and
    hash-checked: the oracle composes both queries' own DuckDB twins and
    joins them. Cost = one probed partial scan + one exact scan — the
    audit is runnable on a sampled slice at 100 TB."""
    ensure_deterministic(spark)
    from project_etl_spark.registry import REGISTRY
    ivf = (REGISTRY["ext_ann_ivf_topk"].builder(spark, sf_dir)
           .select("vec_id"))
    exact = (REGISTRY["ext_sim_search_topk"].builder(spark, sf_dir)
             .select("vec_id"))
    return (ivf.join(exact, "vec_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"),
                 (F.count(F.lit(1)) / F.lit(1e1)).alias("recall_at_10")))


# --------------------------------------------------------------------------
# ext_drift_ks
# --------------------------------------------------------------------------

_KS_SQL = """
WITH per_v AS (
    SELECT n_chars AS v,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
    FROM documents GROUP BY 1
), cum AS (
    SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
           CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
           CAST(SUM(ca) OVER () AS BIGINT) AS na,
           CAST(SUM(cb) OVER () AS BIGINT) AS nb
    FROM per_v
)
SELECT ANY_VALUE(na) AS n_a, ANY_VALUE(nb) AS n_b,
       CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS ks_num,
       FLOOR((CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT)
              / (ANY_VALUE(na) * ANY_VALUE(nb))) * 1e6 + 5e-1) / 1e6 AS ks_stat
FROM cum
"""


@register("ext_drift_ks", oracle=_KS_SQL, tags=("ext", "curation", "stats"))
def ext_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two corpus
    snapshots' document-length distributions (snapshot A = even doc_id,
    B = odd — the census every managed training corpus runs when a new
    crawl lands, next to ``ext_snapshot_diff``'s row-level diff). The KS
    distance max|F_A - F_B| is computed EXACTLY in integer algebra:
    per-length counts, one cumulative window, and the numerator
    ``|cumA*nB - cumB*nA|`` stays integral until a single final division —
    no ECDF floats to diverge across engines.

    Scale: the grid is the DISTINCT value set (bounded by the length
    domain, not the corpus), so the single-partition cumulative window is
    metadata-sized; the heavy lifting is the map-side-combinable per-value
    count. For an unbounded-domain stat, bucket values first (same plan
    shape, epsilon-coarsened KS)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    a_flag = (F.col("doc_id") % 2 == 0).cast("long")
    per_v = (docs.groupBy(F.col("n_chars").alias("v"))
             .agg(F.sum(a_flag).alias("ca"),
                  F.sum(1 - a_flag).alias("cb")))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    cum = per_v.select(
        F.sum("ca").over(wv).alias("cuma"),
        F.sum("cb").over(wv).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"))
    return (cum.agg(F.first("na").alias("n_a"), F.first("nb").alias("n_b"),
                    F.max(F.abs(F.col("cuma") * F.col("nb")
                                - F.col("cumb") * F.col("na"))).alias("ks_num"))
            .select("n_a", "n_b", "ks_num",
                    pround(F.col("ks_num") / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("ks_stat")))


# --------------------------------------------------------------------------
# ext_graph_triangles
# --------------------------------------------------------------------------

_TRIANGLES_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_LSH_PAIRS_SQL},
tri AS (
    SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.doc_a = e1.doc_b
    JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
), verts AS (
    SELECT a AS doc_id FROM tri UNION ALL
    SELECT b FROM tri UNION ALL
    SELECT c FROM tri
), cnt AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM verts GROUP BY doc_id
), deg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs
    ) GROUP BY doc_id
)
SELECT c.doc_id, c.n_tri, d.deg,
       FLOOR((2e0 * c.n_tri / (d.deg * (d.deg - 1))) * 1e6 + 5e-1) / 1e6
           AS clustering
FROM cnt c JOIN deg d ON c.doc_id = d.doc_id
"""


@register("ext_graph_triangles", oracle=_TRIANGLES_SQL,
          tags=("ext", "graph"))
def ext_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the verified
    near-dup graph — the cohesion census that separates a chain of
    borderline pairs from a genuine duplicate CLIQUE (template spam shows
    clustering ~1; drifting revisions show ~0). Standard oriented-edge
    algorithm: pair rows already satisfy doc_a < doc_b, so each triangle
    is counted exactly once by the two-hop join (e1: a-b, e2: b-c,
    e3: a-c closes it); per-vertex counts come from exploding the three
    corners. Clustering = 2*tri / (deg*(deg-1)) — one fixed-order IEEE
    division after integer counts, so bit-identical cross-engine.

    Scale: joins are on the candidate-bounded verified pair list (the
    ordered-edge orientation bounds the two-hop fan-out by the max
    out-degree, the standard distributed-triangle trick); the edge list is
    localCheckpoint-ed once for its three consumers."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    pairs = (jaccard_via_lsh(docs, threshold=0.5, rows_per_band=2)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    verts = (tri.select(F.col("a").alias("doc_id"))
             .unionAll(tri.select("b")).unionAll(tri.select("c")))
    cnt = verts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tri"))
    deg = (pairs.select(F.col("doc_a").alias("doc_id"))
           .unionAll(pairs.select("doc_b"))
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("deg")))
    return (cnt.join(deg, "doc_id")
            .select("doc_id", "n_tri", "deg",
                    pround(F.lit(2.0) * F.col("n_tri")
                           / (F.col("deg") * (F.col("deg") - 1)), 6)
                    .alias("clustering")))


@register(
    "ext_hits_bipartite",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT user_id, event_type FROM events
        ),
        a1 AS (  -- authority pass 1: in-degree (all hub scores start at 1)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS a1
            FROM edges GROUP BY event_type
        ),
        h1 AS (  -- hub pass 1: sum of touched authorities
            SELECT e.user_id, CAST(SUM(a1.a1) AS BIGINT) AS h1
            FROM edges e JOIN a1 ON e.event_type = a1.event_type
            GROUP BY e.user_id
        ),
        a2 AS (  -- authority pass 2: sum of pointing hubs
            SELECT e.event_type, CAST(SUM(h1.h1) AS BIGINT) AS a2
            FROM edges e JOIN h1 ON e.user_id = h1.user_id
            GROUP BY e.event_type
        )
        SELECT a1.event_type, a1.a1 AS authority_deg,
               a2.a2 AS authority_score,
               CAST(RANK() OVER (ORDER BY a2.a2 DESC, a1.event_type)
                    AS BIGINT) AS auth_rank
        FROM a1 JOIN a2 ON a1.event_type = a2.event_type
    """,
    tags=("ext", "graph", "hits"),
)
def ext_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the bipartite
    user -> event_type interaction graph — the second classic link-analysis
    operator next to ``ext_pagerank_iter``: two alternating propagation
    passes (authority = sum of pointing hub scores, hub = sum of touched
    authority scores) from uniform initial hubs. With unit start the
    scores stay EXACT int64 sums — no normalization division, no float
    anywhere — so two fixed iterations are bit-reproducible under any
    partitioning. Each pass is one equi-join edge-to-score plus one hash
    aggregate (the Pregel lowering), edges-proportional shuffles; the
    final rank is a window over the authority-side cardinality (here
    |event_types|, always census-sized)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    edges = ev.select("user_id", "event_type").distinct()
    a1 = (edges.groupBy("event_type")
          .agg(F.count(F.lit(1)).cast("long").alias("a1")))
    h1 = (edges.join(a1, "event_type")
          .groupBy("user_id").agg(F.sum("a1").cast("long").alias("h1")))
    a2 = (edges.join(h1, "user_id")
          .groupBy("event_type").agg(F.sum("h1").cast("long").alias("a2")))
    w = Window.orderBy(F.col("a2").desc(), "event_type")
    return (a1.join(a2, "event_type")
            .select("event_type",
                    F.col("a1").alias("authority_deg"),
                    F.col("a2").alias("authority_score"),
                    F.rank().over(w).cast("long").alias("auth_rank")))


# --------------------------------------------------------------------------
# ext_table_profile
# --------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "user_id", "event_type", "value")

# Floating columns are quantized to integer 1e-6 units BEFORE the string
# render: Spark's Java-style and DuckDB's C-style double formatting diverge
# at scientific-notation thresholds (>= 1e7, < 1e-3), so a raw
# CAST(double AS VARCHAR) hash match would be data-dependent. Integer
# renders are engine-identical. (min/max commute with the monotone
# quantization, so quantize-after-aggregate is exact.)
_PROFILE_FLOAT_COLS = frozenset({"value"})


def _profile_repr_sql(c: str, agg: str) -> str:
    if c in _PROFILE_FLOAT_COLS:
        return f"CAST({sql_qint(f'{agg}({c})', 6)} AS VARCHAR)"
    return f"CAST({agg}({c}) AS VARCHAR)"


_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
        CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
        {_profile_repr_sql(c, 'MIN')} AS min_repr,
        {_profile_repr_sql(c, 'MAX')} AS max_repr FROM events"""
    for c in _PROFILE_COLS)


@register("ext_table_profile", oracle=_PROFILE_SQL,
          tags=("ext", "curation", "profiling"))
def ext_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling census — the data-quality report every managed
    dataset publishes next to its card (``ext_dataset_card`` profiles the
    corpus semantics; this profiles the PHYSICAL columns): row count,
    null count, exact distinct count and min/max per column, min/max
    rendered as strings so one long-form schema covers every column type.
    The per-run YAML stats record (l1a_rate, events, lost events,
    DAQ_self-triggering.md:235-236) is exactly this census for the
    acquisition tables.

    Plan: one aggregate pass PER COLUMN over the same scan (the union is
    of 1-row aggregates, so the union overhead is nil); each pass is
    map-side combinable, and column pruning means pass i reads only
    column i. At 100 TB, swap exact COUNT DISTINCT for the HLL sketch
    (``agg_hll_sketch_mergeable``) column by column — same output
    contract."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    profiles = None
    for colname in _PROFILE_COLS:
        c = F.col(colname)
        if colname in _PROFILE_FLOAT_COLS:
            lo = qint(F.min(c), 6).cast("string")
            hi = qint(F.max(c), 6).cast("string")
        else:
            lo, hi = F.min(c).cast("string"), F.max(c).cast("string")
        p = ev.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("n_nonnull"),
            F.count_distinct(c).alias("n_distinct"),
            lo.alias("min_repr"),
            hi.alias("max_repr"),
        ).select(F.lit(colname).alias("column"), "n_rows", "n_nonnull",
                 "n_distinct", "min_repr", "max_repr")
        profiles = p if profiles is None else profiles.unionByName(p)
    return profiles


# --------------------------------------------------------------------------
# ext_minhash_bbit — storage-compressed sketches (b-bit minwise hashing)
# --------------------------------------------------------------------------

_BBIT_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_LSH_CANDS_SQL},
ba AS (SELECT doc_id, k, minhash % 2 AS bit FROM sigs),
agree AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN x.bit = y.bit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           CAST(COUNT(*) AS BIGINT) AS n_perms
    FROM cands c
    JOIN ba x ON x.doc_id = c.doc_a
    JOIN ba y ON y.doc_id = c.doc_b AND y.k = x.k
    GROUP BY c.doc_a, c.doc_b
), full_est AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN x.minhash = y.minhash THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eq
    FROM cands c
    JOIN sigs x ON x.doc_id = c.doc_a
    JOIN sigs y ON y.doc_id = c.doc_b AND y.k = x.k
    GROUP BY c.doc_a, c.doc_b
)
SELECT a.doc_a, a.doc_b, a.n_agree, a.n_perms,
       FLOOR((2e0 * a.n_agree / a.n_perms - 1e0) * 1e6 + 5e-1) / 1e6
           AS bbit_est,
       FLOOR((CAST(f.n_eq AS DOUBLE) / a.n_perms) * 1e6 + 5e-1) / 1e6
           AS full_est
FROM agree a JOIN full_est f ON a.doc_a = f.doc_a AND a.doc_b = f.doc_b
"""


@register("ext_minhash_bbit", oracle=_BBIT_SQL,
          tags=("ext", "dedup", "sketch"))
def ext_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minwise hashing (Li & Koenig, WWW 2010, arXiv:0910.3349):
    keep only the LOWEST BIT of each minhash — a 64x storage cut at 100 TB
    sketch-table scale — and recover similarity from bit-agreement with
    the b=1 unbiased correction R = 2*A - 1 (random bits agree half the
    time; the correction removes that floor). Per LSH candidate pair, the
    1-bit agreement count, the corrected estimate, and the full-width
    MinHash estimate side by side — the audit that shows what resolution
    the 64x compression actually costs (next to ``ext_minhash_accuracy``'s
    estimate-vs-exact audit). Candidate-bounded equi-joins over the shared
    signature fragments; nothing quadratic."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    # wide signature row (m0..m7) checkpointed once; banding is a
    # projection and BOTH agreement counts are projections over the
    # wide candidate join — the per-k explode join + groupBy are gone
    # (optimization round 12). n_perms is structurally 8: every doc
    # that reaches a bucket has all 8 permutation minima.
    wide = minhash_wide_signatures(_shingles(docs)) \
        .localCheckpoint(eager=True)
    cands = (band_buckets_from_wide(wide).alias("a")
             .join(band_buckets_from_wide(wide).alias("b"),
                   ["band", "bucket"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")).distinct())
    xa = wide.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(f"m{k}").alias(f"ma{k}") for k in range(8)])
    xb = wide.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(f"m{k}").alias(f"mb{k}") for k in range(8)])
    n_agree = sum(((F.col(f"ma{k}") % 2) == (F.col(f"mb{k}") % 2))
                  .cast("long") for k in range(8))
    n_eq = sum((F.col(f"ma{k}") == F.col(f"mb{k}")).cast("long")
               for k in range(8))
    agg = (cands.join(xa, "doc_a").join(xb, "doc_b")
           .select("doc_a", "doc_b", n_agree.alias("n_agree"),
                   F.lit(8).cast("long").alias("n_perms"),
                   n_eq.alias("n_eq")))
    return agg.select(
        "doc_a", "doc_b", "n_agree", "n_perms",
        pround(F.lit(2.0) * F.col("n_agree") / F.col("n_perms") - F.lit(1.0),
               6).alias("bbit_est"),
        pround(F.col("n_eq").cast("double") / F.col("n_perms"), 6)
        .alias("full_est"))


# --------------------------------------------------------------------------
# ext_skyline_pareto
# --------------------------------------------------------------------------

_SKYLINE_SQL = """
WITH vals AS (
    SELECT doc_id, n_chars AS x,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
    FROM documents
), gmax AS (
    SELECT x, MAX(y) AS gy FROM vals GROUP BY x
), strict AS (
    SELECT x, gy,
           MAX(gy) OVER (ORDER BY x DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS runmax
    FROM gmax
)
SELECT v.doc_id, v.x, v.y
FROM vals v JOIN strict s ON v.x = s.x
WHERE (s.runmax IS NULL OR s.runmax < v.y) AND v.y = s.gy
"""


@register("ext_skyline_pareto", oracle=_SKYLINE_SQL,
          tags=("ext", "curation", "skyline"))
def ext_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) over two quality axes — Borzsonyi et
    al.'s classic operator (ICDE 2001) applied to data selection: the
    documents not dominated on (length, vocabulary richness) are the ones
    no other document beats on BOTH axes — the frontier a multi-objective
    curation policy samples from instead of collapsing axes into one
    weighted score. Strict-dominance semantics: ties on both axes all
    survive; a higher-x equal-y row dominates.

    The O(N^2) textbook definition reduces to sort-free window algebra:
    per-x group maxima, one running strict max over the (distinct-x,
    DOMAIN-sized, not corpus-sized) frontier candidates, and a survivor
    predicate — so the only ordered pass runs over |distinct x| rows,
    verified against a brute-force reference in the property suite."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    docs = table(spark, sf_dir, "documents")
    vals = docs.select(
        "doc_id", F.col("n_chars").alias("x"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long")
        .alias("y"))
    gmax = vals.groupBy("x").agg(F.max("y").alias("gy"))
    wx = W.orderBy(F.desc("x"))
    strict = gmax.select(
        "x", "gy",
        F.max("gy").over(wx.rowsBetween(W.unboundedPreceding, -1))
        .alias("runmax"))
    return (vals.join(strict, "x")
            .where((F.col("runmax").isNull()
                    | (F.col("runmax") < F.col("y")))
                   & (F.col("y") == F.col("gy")))
            .select("doc_id", "x", "y"))


# --------------------------------------------------------------------------
# ext_gini_concentration
# --------------------------------------------------------------------------

_GINI_SQL = """
WITH shares AS (
    SELECT source, CAST(SUM(length(text)) AS BIGINT) AS x
    FROM documents GROUP BY source
), ranked AS (
    SELECT source, x, row_number() OVER (ORDER BY x, source) AS i,
           COUNT(*) OVER () AS n
    FROM shares
)
SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_groups,
       CAST(SUM(x) AS BIGINT) AS total_chars,
       FLOOR((2e0 * SUM(i * x) / (ANY_VALUE(n) * SUM(x))
              - (ANY_VALUE(n) + 1) / CAST(ANY_VALUE(n) AS DOUBLE)) * 1e6
             + 5e-1) / 1e6 AS gini
FROM ranked
"""


@register("ext_gini_concentration", oracle=_GINI_SQL,
          tags=("ext", "curation", "stats"))
def ext_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-source content share — the concentration
    census next to ``ext_domain_mix_temperature``: 0 = every source
    contributes equally, near 1 = one crawl dominates the corpus (the
    imbalance temperature-mixing exists to correct, now as one auditable
    number). Standard ranked formula G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n
    with a total-order rank tie-break; the ranked table is
    |sources|-sized, so the single-partition window is metadata-scale,
    and the corpus-scale work is one map-side-combinable sum per source."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    docs = table(spark, sf_dir, "documents")
    shares = docs.groupBy("source").agg(F.sum(F.length("text")).alias("x"))
    ranked = shares.select("source", "x",
                           F.row_number().over(W.orderBy("x", "source"))
                           .alias("i"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    g = ranked.select((F.col("i") * F.col("x")).alias("ix"), "x",
                      F.count(F.lit(1)).over(wall).alias("n"))
    return (g.groupBy("n").agg(F.sum("ix").alias("six"),
                               F.sum("x").alias("sx"))
            .select(F.col("n").cast("long").alias("n_groups"),
                    F.col("sx").cast("long").alias("total_chars"),
                    pround(F.lit(2.0) * F.col("six")
                           / (F.col("n") * F.col("sx"))
                           - (F.col("n") + 1) / F.col("n").cast("double"), 6)
                    .alias("gini")))


# --------------------------------------------------------------------------
# ext_lsh_band_sweep — banding-parameter tuning audit
# --------------------------------------------------------------------------

def _band_cfg_sql(rows: int) -> str:
    """Candidate + verified counts for one (rows_per_band) config as a
    1-row SELECT (expects shingles/hashed/sigs CTEs in scope)."""
    return f"""
    SELECT {8 // rows} AS n_bands, {rows} AS rows_per_band,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands_{rows}) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT i.doc_a FROM inter_{rows} i
                JOIN shcounts ca ON i.doc_a = ca.doc_id
                JOIN shcounts cb ON i.doc_b = cb.doc_id
                WHERE i.n_common * 1e0 / (ca.n + cb.n - i.n_common) >= 5e-1
           )) AS n_verified
    """


def _band_cfg_ctes(rows: int) -> str:
    return f"""
    buckets_{rows} AS (
        SELECT doc_id, k // {rows} AS band,
               md5(string_agg(
                   CAST(k AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '-'
                   ORDER BY CAST(k AS VARCHAR) || ':' || CAST(minhash AS VARCHAR)
               )) AS bucket
        FROM sigs GROUP BY doc_id, band
    ),
    cands_{rows} AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets_{rows} a
        JOIN buckets_{rows} b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
    ),
    inter_{rows} AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cands_{rows} c
        JOIN shingles sa ON sa.doc_id = c.doc_a
        JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    )"""


_BAND_SWEEP_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
shcounts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
{",".join(_band_cfg_ctes(r) for r in (1, 2, 4))}
{" UNION ALL ".join(_band_cfg_sql(r) for r in (1, 2, 4))}
"""


@register("ext_lsh_band_sweep", oracle=_BAND_SWEEP_SQL,
          tags=("ext", "dedup", "tuning"))
def ext_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding-parameter sweep — the tuning audit behind every
    MinHash deployment: with 8 permutations, the three bandings 8x1 /
    4x2 / 2x4 (bands x rows) trade recall for candidate volume along the
    S-curve P(candidate) = 1-(1-J^r)^b. Per config: how many candidate
    pairs the band join emits, and how many survive exact Jaccard >= 0.5
    verification — precision/recall of the index as data, so the banding
    choice (the flagship's 4x2) is justified by measurement, not folklore
    (the reference's N-in/N-out methodology, HTML:239, applied to the
    index config). One signature table feeds all three bandings."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    # one checkpointed WIDE signature row feeds all three bandings as
    # pure projections (optimization round 12: the per-banding
    # collect_list groupBy — a full signature shuffle per config — and
    # the row-form sigs explode are gone; values identical).
    wide = minhash_wide_signatures(_shingles(docs)) \
        .localCheckpoint(eager=True)
    out = None
    for rows in (1, 2, 4):
        cands = (band_buckets_from_wide(wide, rows).alias("a")
                 .join(band_buckets_from_wide(wide, rows).alias("b"),
                       ["band", "bucket"])
                 .where(F.col("a.doc_id") < F.col("b.doc_id"))
                 .select(F.col("a.doc_id").alias("doc_a"),
                         F.col("b.doc_id").alias("doc_b")).distinct()
                 .localCheckpoint(eager=True))
        sh = _shingles(docs)
        inter = (cands.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"),
                            "doc_a")
                 .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"),
                       ["doc_b", "sh"])
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("n_common")))
        counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        jac = (F.col("n_common")
               / (F.col("na") + F.col("nb") - F.col("n_common")))
        verified = (inter
                    .join(counts.select(F.col("doc_id").alias("doc_a"),
                                        F.col("n").alias("na")), "doc_a")
                    .join(counts.select(F.col("doc_id").alias("doc_b"),
                                        F.col("n").alias("nb")), "doc_b")
                    .where(jac >= 0.5))
        row = (cands.agg(F.count(F.lit(1)).alias("n_candidates"))
               .crossJoin(F.broadcast(
                   verified.agg(F.count(F.lit(1)).alias("n_verified"))))
               .select(F.lit(8 // rows).alias("n_bands"),
                       F.lit(rows).alias("rows_per_band"),
                       "n_candidates", "n_verified"))
        out = row if out is None else out.unionByName(row)
    return out


@register("ext_lsh_band_sweep_indexed", oracle=_BAND_SWEEP_SQL,
          tags=("ext", "dedup", "tuning", "index"))
def ext_lsh_band_sweep_indexed(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The banding sweep run off MATERIALIZED shingle/signature tables —
    byte-identical contract to ``ext_lsh_band_sweep`` (same oracle, same
    three S-curve rows over the raw corpus with string-shingle
    verification); only the execution strategy changes: shingles and
    signatures are written to scratch parquet ONCE and every banding +
    verification branch reads the columnar files back, instead of
    re-deriving the shingle pipeline per consumer.

    This is the documented at-100-TB answer to the recompute-vs-persist
    trade-off (SCALE.md "Known trade-offs": re-derive wins at sf0.1,
    materialize wins at scale) converted into code — the pair
    (`ext_lsh_band_sweep`, this) measures the actual crossover; the
    measured numbers live in SCALE.md's round-9 posture note. At 100 TB
    the shingle table is ~10x corpus bytes, so re-deriving it 4x costs
    4 full-corpus text passes, while the parquet round-trip costs one
    pass + 4 columnar scans of (doc_id, sh) with column pruning —
    strictly cheaper whenever the text pipeline dominates a columnar
    scan, which it does at any realistic cluster I/O ratio."""
    import os as _os

    from project_etl_spark.io import scratch_dir

    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    base = scratch_dir("band_sweep_idx")
    sh_path = _os.path.join(base, "shingles")
    sig_path = _os.path.join(base, "signatures")
    _shingles(docs).write.parquet(sh_path)
    sh = spark.read.parquet(sh_path)
    # the materialized signature table is stored WIDE (doc_id, m0..m7 —
    # optimization round 13): every banding below is then a pure
    # projection of the columnar file instead of a collect_list shuffle
    # of row-form signatures per config (guide §2.4; bucket values
    # byte-identical by the round-12 pinned equivalence).
    minhash_wide_signatures(sh).write.parquet(sig_path)
    wide = spark.read.parquet(sig_path)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    out = None
    for rows in (1, 2, 4):
        # scratch-parquet fragments are small files, so Catalyst's size
        # estimate picks a broadcast bucket self-join and the whole
        # candidate explosion inherits the file's (tiny) partitioning —
        # fine at sf0.1, a single-digit-partition bottleneck at 10x
        # (measured: 1095s -> 381s at the sf1 fixture with the
        # shuffle-hash hint + eager checkpoint, SCALE_SF1.json). Pin the
        # shuffle join and materialize the candidate list eagerly so
        # both consumers (count + verify) reuse one partitioned copy.
        bk = band_buckets_from_wide(wide, rows).hint("shuffle_hash")
        cands = (bk.alias("a")
                 .join(bk.alias("b"), ["band", "bucket"])
                 .where(F.col("a.doc_id") < F.col("b.doc_id"))
                 .select(F.col("a.doc_id").alias("doc_a"),
                         F.col("b.doc_id").alias("doc_b")).distinct()
                 .localCheckpoint(eager=True))
        inter = (cands.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"),
                            "doc_a")
                 .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"),
                       ["doc_b", "sh"])
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("n_common")))
        jac = (F.col("n_common")
               / (F.col("na") + F.col("nb") - F.col("n_common")))
        verified = (inter
                    .join(counts.select(F.col("doc_id").alias("doc_a"),
                                        F.col("n").alias("na")), "doc_a")
                    .join(counts.select(F.col("doc_id").alias("doc_b"),
                                        F.col("n").alias("nb")), "doc_b")
                    .where(jac >= 0.5))
        row = (cands.agg(F.count(F.lit(1)).alias("n_candidates"))
               .crossJoin(F.broadcast(
                   verified.agg(F.count(F.lit(1)).alias("n_verified"))))
               .select(F.lit(8 // rows).alias("n_bands"),
                       F.lit(rows).alias("rows_per_band"),
                       "n_candidates", "n_verified"))
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# ext_domain_cap — per-domain document cap (FineWeb-style)
# --------------------------------------------------------------------------

#: max documents retained per source domain (one constant feeds builder
#: and oracle).
_DOMAIN_CAP = 15

_DOMAIN_CAP_SQL = f"""
    WITH ranked AS (
        SELECT source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 END) AS BIGINT)
               AS n_kept,
           CAST(COUNT(CASE WHEN rn > {_DOMAIN_CAP} THEN 1 END) AS BIGINT)
               AS n_dropped
    FROM ranked GROUP BY source
"""


@register("ext_domain_cap", oracle=_DOMAIN_CAP_SQL,
          tags=("ext", "curation", "sampling"))
def ext_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the FineWeb/RefinedWeb guard against a
    single hot domain dominating the training mix: keep at most
    ``_DOMAIN_CAP`` documents per source, selected by a DETERMINISTIC
    hash rank (md5 of doc_id, doc_id tie-break) so the retained subset is
    reproducible across engines, runs and partitionings and unbiased
    w.r.t. document order — never "first N crawled". Census reports
    kept/dropped mass per domain.

    Scale shape: one window rank partitioned by domain — each partition's
    sort is bounded by that domain's size. For mega-domains (the one case
    the window sort hurts) the same contract lowers to count-per-domain +
    a broadcast hash-rank threshold per domain (select the cap-th
    smallest hash with approx quantiles, then a map-side compare) — no
    global sort either way."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.select("source", F.row_number().over(w).alias("rn"))
    return (ranked.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count_if(F.col("rn") <= _DOMAIN_CAP).cast("long")
                 .alias("n_kept"),
                 F.count_if(F.col("rn") > _DOMAIN_CAP).cast("long")
                 .alias("n_dropped")))


# --------------------------------------------------------------------------
# ext_cross_shard_dupes — shard-pair content-leakage matrix
# --------------------------------------------------------------------------

_CROSS_SHARD_SQL = f"""
    WITH gr AS (
        SELECT DISTINCT doc_id % 4 AS shard, sh
        FROM ({ngrams_sql(5)})
    ),
    pershard AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n FROM gr GROUP BY shard
    ),
    shared AS (
        SELECT a.shard AS shard_a, b.shard AS shard_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM gr a JOIN gr b ON a.sh = b.sh AND a.shard < b.shard
        GROUP BY 1, 2
    )
    SELECT s.shard_a, s.shard_b, s.n_shared,
           (FLOOR(s.n_shared * 1e0 / LEAST(pa.n, pb.n) * 1e6 + 5e-1) / 1e6)
               AS containment
    FROM shared s
    JOIN pershard pa ON s.shard_a = pa.shard
    JOIN pershard pb ON s.shard_b = pb.shard
"""


@register("ext_cross_shard_dupes", oracle=_CROSS_SHARD_SQL,
          tags=("ext", "dedup", "audit"))
def ext_cross_shard_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard content-leakage matrix — the audit run before MERGING
    corpora or training on sharded data with per-shard dedup only: for
    every shard pair, how many distinct word-5-grams do both sides
    contain, and what fraction of the smaller shard's n-gram set is
    shared (containment)? High off-diagonal mass means per-shard dedup
    missed cross-shard duplication and a global (or incremental,
    ``ext_dedup_incremental``) pass is needed.

    Scale shape: the n-gram table is first reduced to DISTINCT
    (shard, ngram) — at most |shards| rows per n-gram — so the self-join
    fan-out per n-gram is bounded by C(|shards|, 2) regardless of how hot
    the n-gram is: the hot-key bound comes from the schema, not a cap.
    Everything is equi-join + map-side-combinable counts."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    gr = (word_ngrams(docs, 5)
          .select((F.col("doc_id") % 4).alias("shard"), "sh").distinct())
    pershard = gr.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    a = gr.select(F.col("shard").alias("shard_a"), "sh")
    b = gr.select(F.col("shard").alias("shard_b"), "sh")
    shared = (a.join(b, "sh").where(F.col("shard_a") < F.col("shard_b"))
              .groupBy("shard_a", "shard_b")
              .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    pa = pershard.select(F.col("shard").alias("shard_a"),
                         F.col("n").alias("na"))
    pb = pershard.select(F.col("shard").alias("shard_b"),
                         F.col("n").alias("nb"))
    cont = (F.col("n_shared") * F.lit(1.0)
            / F.least("na", "nb").cast("double"))
    return (shared.join(F.broadcast(pa), "shard_a")
            .join(F.broadcast(pb), "shard_b")
            .select("shard_a", "shard_b", "n_shared",
                    pround(cont, 6).alias("containment")))


# --------------------------------------------------------------------------
# ext_js_divergence — per-source distributional drift vs the corpus
# --------------------------------------------------------------------------

_JSD_SQL = """
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
sc AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM clean GROUP BY 1, 2
),
st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM sc GROUP BY 1),
gc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM sc GROUP BY 1),
gt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM gc),
terms AS (
    SELECT sc.source,
           CAST(FLOOR(((sc.c * 1e0 / st.t)
                       * LN(2e0 * (sc.c * 1e0 / st.t)
                            / ((sc.c * 1e0 / st.t) + (gc.c * 1e0 / gt.t)))
                       + (gc.c * 1e0 / gt.t)
                       * LN(2e0 * (gc.c * 1e0 / gt.t)
                            / ((sc.c * 1e0 / st.t) + (gc.c * 1e0 / gt.t))))
                      * 1e9 + 5e-1) AS BIGINT) AS term_q,
           CAST(FLOOR((gc.c * 1e0 / gt.t) * 1e9 + 5e-1) AS BIGINT) AS q_q
    FROM sc JOIN st USING (source) JOIN gc USING (tok), gt
)
SELECT s.source, ANY_VALUE(st.t) AS n_tokens,
       FLOOR((5e-1 * (SUM(s.term_q) * 1e0 / 1e9)
              + 5e-1 * LN(2e0) * (1e0 - SUM(s.q_q) * 1e0 / 1e9))
             * 1e6 + 5e-1) / 1e6 AS jsd
FROM terms s JOIN st USING (source)
GROUP BY s.source
"""


@register("ext_js_divergence", oracle=_JSD_SQL,
          tags=("ext", "curation", "drift", "stats"))
def ext_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    against the whole-corpus distribution — the token-level drift audit
    next to ``ext_drift_ks`` (which compares numeric length marginals):
    which crawls speak a measurably different language than the mix they
    feed? JSD is the symmetric, bounded (<= ln 2) divergence the
    data-mixing literature standardizes on.

    The sum runs ONLY over tokens the source actually contains: for a
    token absent from the source (p=0) the JS term reduces in closed form
    to q/2 * ln 2, so the out-of-support tail is 0.5*ln2*(1 - sum_{k in
    support} q_k) — algebra instead of a |sources| x |vocab| dense join.

    Scale shape: cost is proportional to the OBSERVED (source, token)
    pair count, not |sources| x |vocab|; per-source totals are a 20-row
    broadcast, the corpus vocabulary join is a plain equi-join keyed on
    token, and the corpus total is a 1-row broadcast cross (bounded).
    Every JS term is int64-quantized (1e-9) per (source, token) BEFORE
    the sum, so the reduce is exact integer arithmetic under any merge
    order — what makes the result hash-checkable cross-engine."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != ""))
    sc = (toks.groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    gc = (sc.groupBy("tok")
          .agg(F.sum("c").cast("long").alias("gc")))
    gt = gc.agg(F.sum("gc").cast("long").alias("gt"))
    p = F.col("c") * F.lit(1.0) / F.col("t")
    q = F.col("gc") * F.lit(1.0) / F.col("gt")
    term = (p * F.log(F.lit(2.0) * p / (p + q))
            + q * F.log(F.lit(2.0) * q / (p + q)))
    terms = (sc.join(F.broadcast(st), "source")
             .join(gc, "tok")
             .crossJoin(F.broadcast(gt))
             .select("source", "t",
                     F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
                     .alias("term_q"),
                     F.floor(q * F.lit(1e9) + F.lit(0.5)).cast("long")
                     .alias("q_q")))
    jsd = (F.lit(0.5) * (F.sum("term_q") * F.lit(1.0) / F.lit(1e9))
           + F.lit(0.5) * F.log(F.lit(2.0))
           * (F.lit(1.0) - F.sum("q_q") * F.lit(1.0) / F.lit(1e9)))
    return (terms.groupBy("source")
            .agg(F.first("t").alias("n_tokens"),
                 (F.floor(jsd * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                 .alias("jsd")))


# --------------------------------------------------------------------------
# ext_curriculum_order — stratified easy-to-hard training schedule
# --------------------------------------------------------------------------

_CURRICULUM_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
scored AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(FLOOR(SUM(length(tok)) * 1e6 * 1e0 / COUNT(*) + 5e-1)
                AS BIGINT) AS awl_q
    FROM clean GROUP BY doc_id
),
bucketed AS (
    SELECT doc_id, n_toks, awl_q,
           CAST(NTILE(3) OVER (ORDER BY awl_q, doc_id) AS BIGINT) AS bucket
    FROM scored
),
laddered AS (
    SELECT doc_id, n_toks, awl_q, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket
                              ORDER BY awl_q, doc_id) AS rung
    FROM bucketed
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rung, bucket, doc_id) AS BIGINT)
           AS position,
       doc_id, bucket, n_toks, awl_q
FROM laddered
"""


@register("ext_curriculum_order", oracle=_CURRICULUM_SQL,
          tags=("ext", "curation", "ordering"))
def ext_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: a deterministic training order that is
    easy-to-hard WITHIN difficulty strata while interleaving the strata
    round-robin — the standard compromise between curriculum learning
    (Bengio et al. 2009) and the i.i.d.-batch requirement of SGD: every
    consecutive window of the schedule mixes all three difficulty tiers,
    yet each tier is consumed in increasing-difficulty order. Difficulty
    proxy is mean word length (1e-6-quantized integer); tiers are NTILE(3)
    over it; position = rank by (rung, bucket) — rung r of every bucket
    precedes rung r+1 of any bucket.

    Scale shape: scoring is one map-side-combinable aggregation per doc.
    The global NTILE and the final rank are single-partition windows at
    toy scale; at 100 TB both become broadcast approx-percentile cutpoints
    (tier assignment turns into a map-side compare) and the schedule
    position is computed arithmetically as 3*(rung-1)+tier_index over
    per-tier zipWithIndex-style offsets — same contract, no global sort.
    Total-order tie-breaks ((awl_q, doc_id) everywhere) make the schedule
    reproducible run-over-run — the property that matters for resumable
    training jobs."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != ""))
    scored = (toks.groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_toks"),
                   F.floor(F.sum(F.length("tok")) * F.lit(1e6) * F.lit(1.0)
                           / F.count(F.lit(1)) + F.lit(0.5)).cast("long")
                   .alias("awl_q")))
    w_all = Window.orderBy("awl_q", "doc_id")
    bucketed = scored.withColumn(
        "bucket", F.ntile(3).over(w_all).cast("long"))
    w_bucket = Window.partitionBy("bucket").orderBy("awl_q", "doc_id")
    laddered = bucketed.withColumn("rung", F.row_number().over(w_bucket))
    w_sched = Window.orderBy("rung", "bucket", "doc_id")
    return laddered.select(
        F.row_number().over(w_sched).cast("long").alias("position"),
        "doc_id", "bucket", "n_toks", "awl_q")


# --------------------------------------------------------------------------
# ext_ndcg_eval — graded ranking quality of the cosine retriever
# --------------------------------------------------------------------------

_NDCG_SQL = f"""
WITH pos AS ({_POS_SQL}),
qv AS (SELECT vec_id AS q_id, label AS q_label, i, v AS qv
       FROM pos WHERE vec_id % 100 = 0),
dots AS (
    SELECT q.q_id, ANY_VALUE(q.q_label) AS q_label, p.vec_id,
           ANY_VALUE(p.label) AS label,
           SUM(p.v * q.qv) AS dp, SQRT(SUM(p.v * p.v)) AS norm_p
    FROM pos p JOIN qv q ON p.i = q.i
    WHERE p.vec_id % 100 <> 0
    GROUP BY q.q_id, p.vec_id
),
qn AS (SELECT q_id, SQRT(SUM(qv * qv)) AS norm_q FROM qv GROUP BY q_id),
cos AS (
    SELECT d.q_id, d.q_label, d.vec_id, d.label,
           FLOOR(d.dp / (d.norm_p * qn.norm_q) * 1e6 + 5e-1) / 1e6 AS sim
    FROM dots d JOIN qn USING (q_id)
),
ranked AS (
    SELECT q_id, label, q_label, sim,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id) AS rnk
    FROM cos
),
top AS (
    SELECT q_id,
           CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel, rnk,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY CASE WHEN label = q_label
                                            THEN 1 ELSE 0 END DESC, rnk)
               AS irank
    FROM ranked WHERE rnk <= 10
)
SELECT q_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel,
       CAST(SUM(CAST(FLOOR(rel * 1e0 / LN(rnk + 1e0) * 1e6 + 5e-1)
                     AS BIGINT)) AS BIGINT) AS dcg_q,
       CASE WHEN SUM(rel) = 0 THEN 0e0 ELSE
           FLOOR(SUM(CAST(FLOOR(rel * 1e0 / LN(rnk + 1e0) * 1e6 + 5e-1)
                          AS BIGINT)) * 1e0
                 / SUM(CAST(FLOOR(rel * 1e0 / LN(irank + 1e0) * 1e6 + 5e-1)
                            AS BIGINT))
                 * 1e6 + 5e-1) / 1e6
       END AS ndcg
FROM top GROUP BY q_id
"""


@register("ext_ndcg_eval", oracle=_NDCG_SQL,
          tags=("ext", "similarity", "eval"))
def ext_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the exact-cosine retriever against cluster-label
    relevance — the graded ranking-quality scorecard next to
    ``ext_ann_recall_report`` (which grades set overlap only): for each
    query in the held-out panel (every 100th vector), retrieve top-10 by
    quantized cosine, mark a hit when the neighbor carries the query's
    label, and score position-discounted gain DCG = sum rel_i/ln(i+1)
    normalized by the ideal reordering of the same retrieved list
    (Jarvelin & Kekalainen 2002). A retriever that finds the right
    vectors but ranks them late scores below one that front-loads them —
    exactly what recall@k cannot see.

    Scale shape: the query panel is evaluation-sized, so its long-form
    (q, i, v) table broadcasts and the dot-product join is a broadcast
    hash join on the 64 position keys followed by one map-side-combinable
    (query, candidate) aggregation — cost |corpus| x |panel|, the honest
    price of exact eval, run on a sampled panel at 100 TB. Top-10 per
    query is a bounded per-partition heap (window + filter at toy scale);
    DCG terms are int64-quantized (1e-6) before summing, the ideal
    ordering is a second bounded window over 10 rows, and the final
    normalize is one IEEE division — bit-stable cross-engine."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "v0")
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"),
             F.col("v0").cast("double").alias("v"))
    qv = (pos.where(F.col("vec_id") % 100 == 0)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("label").alias("q_label"), "i",
                  F.col("v").alias("qv")))
    dots = (pos.where(F.col("vec_id") % 100 != 0)
            .join(F.broadcast(qv), "i")
            .groupBy("q_id", "vec_id")
            .agg(F.first("q_label").alias("q_label"),
                 F.first("label").alias("label"),
                 F.sum(F.col("v") * F.col("qv")).alias("dp"),
                 F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm_p")))
    qn = (qv.groupBy("q_id")
          .agg(F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("norm_q")))
    sim = (F.floor(F.col("dp") / (F.col("norm_p") * F.col("norm_q"))
                   * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    cos = (dots.join(F.broadcast(qn), "q_id")
           .select("q_id", "q_label", "vec_id", "label", sim.alias("sim")))
    w_rank = Window.partitionBy("q_id").orderBy(F.col("sim").desc(),
                                                F.col("vec_id"))
    rel = F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
    ranked = (cos.withColumn("rnk", F.row_number().over(w_rank))
              .where(F.col("rnk") <= 10)
              .withColumn("rel", rel))
    w_ideal = Window.partitionBy("q_id").orderBy(F.col("rel").desc(),
                                                 F.col("rnk"))
    top = ranked.withColumn("irank", F.row_number().over(w_ideal))
    dterm = F.floor(F.col("rel") * F.lit(1.0)
                    / F.log(F.col("rnk") + F.lit(1.0))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")
    iterm = F.floor(F.col("rel") * F.lit(1.0)
                    / F.log(F.col("irank") + F.lit(1.0))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")
    agg = (top.groupBy("q_id")
           .agg(F.sum("rel").cast("long").alias("n_rel"),
                F.sum(dterm).alias("dcg_q"),
                F.sum(iterm).alias("idcg_q")))
    ndcg = F.when(F.col("n_rel") == 0, F.lit(0.0)).otherwise(
        F.floor(F.col("dcg_q") * F.lit(1.0) / F.col("idcg_q")
                * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    return agg.select("q_id", "n_rel", "dcg_q", ndcg.alias("ndcg"))


# --------------------------------------------------------------------------
# ext_quality_calibration_bins — reliability diagram of the quality model
# --------------------------------------------------------------------------

#: One condition string feeding both engines: the Gopher rule chain of
#: ``ext_quality_gopher_rules`` collapsed to its pass/fail boolean (same
#: constants, same feature algebra), used as the observed label.
_CAL_PASS_SQL = (f"CASE WHEN n_words >= {_GR_MIN_WORDS}"
                 f" AND n_words <= {_GR_MAX_WORDS}"
                 f" AND awl >= {_GR_MIN_AWL} AND awl <= {_GR_MAX_AWL}"
                 f" AND digit_frac <= {_GR_MAX_DIGIT_FRAC}"
                 " THEN 1 ELSE 0 END")

_CAL_BINS_SQL = f"""
WITH feats AS (
    SELECT doc_id,
           {_sc.WS_COUNT_SQL} AS n_words,
           LN(1e0 + {_sc.WS_COUNT_SQL}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({_sc.WS_COUNT_SQL} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
scored AS (
    SELECT 1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) AS p,
           {_CAL_PASS_SQL} AS y
    FROM feats
)
SELECT LEAST(CAST(FLOOR(p * 1e1) AS BIGINT), 9) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       FLOOR(((SUM(CAST(FLOOR(p * 1e6 + 5e-1) AS BIGINT)) * 1e0 / 1e6)
              / COUNT(*)) * 1e6 + 5e-1) / 1e6 AS avg_pred,
       FLOOR((SUM(y) * 1e0 / COUNT(*)) * 1e6 + 5e-1) / 1e6 AS obs_rate
FROM scored GROUP BY 1
"""


@register("ext_quality_calibration_bins", oracle=_CAL_BINS_SQL,
          tags=("ext", "curation", "quality", "eval"))
def ext_quality_calibration_bins(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Reliability diagram of the quality classifier: decile-bin the
    ``ext_quality_logistic`` probabilities and compare each bin's mean
    predicted score against the observed pass rate under the
    ``ext_quality_gopher_rules`` rule chain — the calibration audit
    (Guo et al. 2017's binned ECE construction) that tells a curation
    team whether "p=0.9" from the model actually means 90% rule-clean.
    Both the probability and the label derive from the SAME shared module
    constants as their parent queries, so retuning a weight or a rule
    bound moves model, label, and this audit together.

    Scale shape: a pure map pass (features, sigmoid, rule boolean — all
    codegen in the scan stage) followed by one ≤10-group hash
    aggregation; per-doc probabilities are int64-quantized (1e-6 —
    micro, not nano, since one decile bin can hold the whole corpus:
    nano would wrap int64 near 9.2e9 docs, micro holds to 9.2e12 at a
    constant ≤5e-7 error on the bin mean) before
    the bin sums, so the reduce is exact and the two final rates are one
    IEEE division each. Scan-speed at any corpus size."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    t = _sc.ws_count_col()
    f_logtok = F.log(F.lit(1.0) + t)
    awl = F.col("n_chars").cast("double") / (t + F.lit(1.0))
    digit_frac = (F.length(F.regexp_replace("text", "[^0-9]", ""))
                  .cast("double") / F.col("n_chars"))
    z = (F.lit(float(_QL_BIAS)) + F.lit(float(_QL_W_LOGTOK)) * f_logtok
         + F.lit(float(_QL_W_AWL)) * awl)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    y = F.when((t >= _GR_MIN_WORDS) & (t <= _GR_MAX_WORDS)
               & (awl >= float(_GR_MIN_AWL)) & (awl <= float(_GR_MAX_AWL))
               & (digit_frac <= float(_GR_MAX_DIGIT_FRAC)), 1).otherwise(0)
    scored = docs.select(
        p.alias("p"), y.alias("y"),
        F.least(F.floor(p * F.lit(1e1)).cast("long"), F.lit(9).cast("long"))
        .alias("bin"),
        F.floor(p * F.lit(1e6) + F.lit(0.5)).cast("long").alias("p_q"))
    return (scored.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 (F.floor(((F.sum("p_q") * F.lit(1.0) / F.lit(1e6))
                           / F.count(F.lit(1))) * F.lit(1e6) + F.lit(0.5))
                  / F.lit(1e6)).alias("avg_pred"),
                 (F.floor((F.sum("y") * F.lit(1.0) / F.count(F.lit(1)))
                          * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                 .alias("obs_rate")))


# --------------------------------------------------------------------------
# ext_logreg_train_step — two full-batch GD steps, distributed gradients
# --------------------------------------------------------------------------

_LR_FEATS_SQL = f"""
    SELECT LN(1e0 + {_sc.WS_COUNT_SQL}) AS x1,
           (CAST(n_chars AS DOUBLE) / ({_sc.WS_COUNT_SQL} + 1e0)) AS x2,
           CASE WHEN n_chars >= 300 THEN 1e0 ELSE 0e0 END AS y
    FROM documents WHERE n_chars > 0
"""

_LR_TRAIN_SQL = f"""
WITH feats AS ({_LR_FEATS_SQL}),
g1 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR((5e-1 - y) * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS ga,
           CAST(SUM(CAST(FLOOR((5e-1 - y) * x1 * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS gb,
           CAST(SUM(CAST(FLOOR((5e-1 - y) * x2 * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS gc
    FROM feats
),
w1 AS (
    SELECT n,
           0e0 - 1e-1 * ((ga * 1e0 / 1e6) / n) AS wa,
           0e0 - 1e-1 * ((gb * 1e0 / 1e6) / n) AS wb,
           0e0 - 1e-1 * ((gc * 1e0 / 1e6) / n) AS wc
    FROM g1
),
s2 AS (
    SELECT w.n, w.wa, w.wb, w.wc, f.x1, f.x2, f.y,
           1e0 / (1e0 + EXP(-(w.wa + w.wb * f.x1 + w.wc * f.x2))) AS p
    FROM feats f, w1 w
),
g2 AS (
    SELECT ANY_VALUE(n) AS n, ANY_VALUE(wa) AS wa, ANY_VALUE(wb) AS wb,
           ANY_VALUE(wc) AS wc,
           CAST(SUM(CAST(FLOOR((p - y) * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS ga,
           CAST(SUM(CAST(FLOOR((p - y) * x1 * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS gb,
           CAST(SUM(CAST(FLOOR((p - y) * x2 * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS gc,
           CAST(SUM(CAST(FLOOR((0e0 - (y * LN(p) + (1e0 - y) * LN(1e0 - p)))
                               * 1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS lq1
    FROM s2
),
w2 AS (
    SELECT n, wa, wb, wc, lq1,
           wa - 1e-1 * ((ga * 1e0 / 1e6) / n) AS wa2,
           wb - 1e-1 * ((gb * 1e0 / 1e6) / n) AS wb2,
           wc - 1e-1 * ((gc * 1e0 / 1e6) / n) AS wc2
    FROM g2
),
l2 AS (
    SELECT ANY_VALUE(w.n) AS n,
           CAST(SUM(CAST(FLOOR((0e0 - (f.y * LN(1e0 / (1e0 + EXP(-(w.wa2
                               + w.wb2 * f.x1 + w.wc2 * f.x2))))
                               + (1e0 - f.y) * LN(1e0 - 1e0 / (1e0
                               + EXP(-(w.wa2 + w.wb2 * f.x1
                                       + w.wc2 * f.x2))))))
                               * 1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS lq2
    FROM feats f, w2 w
)
SELECT CAST(1 AS INT) AS iter,
       FLOOR(w.wa * 1e6 + 5e-1) / 1e6 AS w_bias,
       FLOOR(w.wb * 1e6 + 5e-1) / 1e6 AS w_logtok,
       FLOOR(w.wc * 1e6 + 5e-1) / 1e6 AS w_awl,
       FLOOR(((w.lq1 * 1e0 / 1e6) / w.n) * 1e6 + 5e-1) / 1e6 AS avg_loss
FROM w2 w
UNION ALL
SELECT CAST(2 AS INT) AS iter,
       FLOOR(w.wa2 * 1e6 + 5e-1) / 1e6,
       FLOOR(w.wb2 * 1e6 + 5e-1) / 1e6,
       FLOOR(w.wc2 * 1e6 + 5e-1) / 1e6,
       FLOOR(((l.lq2 * 1e0 / 1e6) / l.n) * 1e6 + 5e-1) / 1e6
FROM w2 w, l2 l
"""


@register("ext_logreg_train_step", oracle=_LR_TRAIN_SQL,
          tags=("ext", "curation", "quality", "training"))
def ext_logreg_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING side of the quality-classifier story: two full-batch
    gradient-descent steps of a logistic regressor (features: log token
    count, average word length; label: long-document rule n_chars >= 300)
    — ``ext_quality_logistic`` ships frozen weights, this is where such
    weights come from, the fasttext/linear-probe fit every curation stack
    reruns as the corpus drifts. Deterministic end to end: per-document
    gradient and loss contributions are int64-quantized (1e-6; micro
    because |e·x| reaches ~20 per doc, so nano terms would wrap int64
    near 9e8 documents while micro holds to ~9e11 at a constant ≤5e-7
    mean-gradient error) before the
    sums, so each distributed reduce is exact integer arithmetic; the
    weight updates (lr=0.1) are a fixed IEEE op chain on those integers.
    Emits per iteration: post-update weights and post-update mean logloss
    (both 1e-6-quantized); the loss MUST fall from ln 2 (lr=0.1 is
    tuned so full-batch GD on these unscaled features descends).

    Scale shape: each iteration is ONE map-side-combinable aggregation
    over the corpus (3 gradient sums + a loss sum in the same pass) and a
    parameter-sized driver fetch of 4 integers — the classic distributed
    full-batch GD lowering (the same 1-row parameter round-trip the
    k-center coreset uses per round). No per-row Python, no shuffle wider
    than a 1-row aggregate, iterations bounded by a constant."""
    ensure_deterministic(spark)
    import math
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    t = _sc.ws_count_col()
    feats = docs.select(
        F.log(F.lit(1.0) + t).alias("x1"),
        (F.col("n_chars").cast("double") / (t + F.lit(1.0))).alias("x2"),
        F.when(F.col("n_chars") >= 300, F.lit(1.0)).otherwise(F.lit(0.0))
        .alias("y")).localCheckpoint(eager=True)

    def qmicro(col):
        # micro, not nano: per-term |e*x| reaches ~20, and a nano
        # quantum would wrap the int64 gradient sum near 9e8 docs
        # (~2 TB); micro holds to ~9e11 docs at a constant <=5e-7
        # error on the mean gradient
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    e1 = F.lit(0.5) - F.col("y")
    r1 = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(qmicro(e1)).cast("long").alias("ga"),
        F.sum(qmicro(e1 * F.col("x1"))).cast("long").alias("gb"),
        F.sum(qmicro(e1 * F.col("x2"))).cast("long").alias("gc")).first()
    n = r1["n"]
    wa = 0.0 - 0.1 * ((r1["ga"] * 1.0 / 1e6) / n)
    wb = 0.0 - 0.1 * ((r1["gb"] * 1.0 / 1e6) / n)
    wc = 0.0 - 0.1 * ((r1["gc"] * 1.0 / 1e6) / n)

    def prob(a, b, c):
        return F.lit(1.0) / (F.lit(1.0) + F.exp(
            -(F.lit(a) + F.lit(b) * F.col("x1") + F.lit(c) * F.col("x2"))))

    def lossterm(p):
        return (F.lit(0.0) - (F.col("y") * F.log(p)
                              + (F.lit(1.0) - F.col("y"))
                              * F.log(F.lit(1.0) - p)))

    p2 = prob(wa, wb, wc)
    e2 = p2 - F.col("y")
    r2 = feats.agg(
        F.sum(qmicro(e2)).cast("long").alias("ga"),
        F.sum(qmicro(e2 * F.col("x1"))).cast("long").alias("gb"),
        F.sum(qmicro(e2 * F.col("x2"))).cast("long").alias("gc"),
        F.sum(qmicro(lossterm(p2))).cast("long").alias("lq")).first()
    wa2 = wa - 0.1 * ((r2["ga"] * 1.0 / 1e6) / n)
    wb2 = wb - 0.1 * ((r2["gb"] * 1.0 / 1e6) / n)
    wc2 = wc - 0.1 * ((r2["gc"] * 1.0 / 1e6) / n)
    r3 = feats.agg(
        F.sum(qmicro(lossterm(prob(wa2, wb2, wc2)))).cast("long")
        .alias("lq")).first()

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = [(1, q6(wa), q6(wb), q6(wc), q6((r2["lq"] * 1.0 / 1e6) / n)),
            (2, q6(wa2), q6(wb2), q6(wc2), q6((r3["lq"] * 1.0 / 1e6) / n))]
    # one-slice parallelize: 2-row driver result (see ext_embedding_pca)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "iter int, w_bias double, w_logtok double, w_awl double,"
        " avg_loss double")


# --------------------------------------------------------------------------
# ext_epoch_shuffle_audit — reproducible per-epoch orders, decorrelation
# --------------------------------------------------------------------------

_EPOCH_SHUFFLE_SQL = """
WITH r0 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':0'),
                              doc_id) AS rk
    FROM documents
),
r1 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':1'),
                              doc_id) AS rk
    FROM documents
),
j AS (
    SELECT r0.doc_id, CAST(ABS(r0.rk - r1.rk) AS BIGINT) AS d
    FROM r0 JOIN r1 USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(d) AS BIGINT) AS max_disp,
       FLOOR(((SUM(d) * 1e0 / COUNT(*)) / COUNT(*)) * 1e6 + 5e-1) / 1e6
           AS mean_disp_frac,
       FLOOR((1e0 - 6e0 * SUM(d * d)
              / (COUNT(*) * ((COUNT(*) * COUNT(*)) - 1)))
             * 1e6 + 5e-1) / 1e6 AS spearman_rho
FROM j
"""


@register("ext_epoch_shuffle_audit", oracle=_EPOCH_SHUFFLE_SQL,
          tags=("ext", "curation", "ordering", "training"))
def ext_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch corpus shuffling, audited: epoch e's
    training order is rank-by-md5(doc_id || ':' || e) — deterministic
    across runs, engines and partitionings (the property a seeded
    ``orderBy(rand())`` loses the moment parallelism changes), which is
    what makes multi-epoch training resumable and bug reports replayable.
    The audit compares epochs 0 and 1: per-doc rank displacement and the
    Spearman rank correlation between the two orders — independent
    permutations give rho ~= 0 and mean |displacement|/n ~= 1/3, so a
    correlated (i.e. broken) shuffle shows up as rho >> 0. Same epoch
    trick as ``ext_sample_split``'s md5 buckets, lifted from membership
    to ordering.

    Scale shape: at toy scale each epoch order is one global hash-rank
    window (what the oracle can check exactly); at 100 TB the identical
    contract lowers to sort-within-range-partitions on the md5 key +
    per-partition zipWithIndex with broadcast partition-offset cumsums —
    one range shuffle per epoch, no single-partition window. The audit
    join is doc_id-keyed and the displacement algebra is exact integer
    arithmetic; only the two final ratios touch IEEE floats (quantized
    1e-6)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")

    def epoch_rank(e: int) -> DataFrame:
        key = F.md5(F.concat(F.col("doc_id").cast("string"),
                             F.lit(f":{e}")))
        w = Window.orderBy(key, "doc_id")
        return docs.select("doc_id", F.row_number().over(w).alias(f"rk{e}"))

    j = (epoch_rank(0).join(epoch_rank(1), "doc_id")
         .select(F.abs(F.col("rk0") - F.col("rk1")).cast("long").alias("d")))
    n = F.count(F.lit(1))
    return j.agg(
        n.cast("long").alias("n_docs"),
        F.max("d").cast("long").alias("max_disp"),
        (F.floor(((F.sum("d") * F.lit(1.0) / n) / n) * F.lit(1e6)
                 + F.lit(0.5)) / F.lit(1e6)).alias("mean_disp_frac"),
        (F.floor((F.lit(1.0) - F.lit(6.0) * F.sum(F.col("d") * F.col("d"))
                  / (n * ((n * n) - F.lit(1))))
                 * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("spearman_rho"))


# --------------------------------------------------------------------------
# ext_benford_anomaly — first-digit distribution audit (Benford's law)
# --------------------------------------------------------------------------

_BENFORD_SQL = """
WITH d AS (
    SELECT l_returnflag AS flag,
           CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM lineitem
),
cnt AS (
    SELECT flag, digit, CAST(COUNT(*) AS BIGINT) AS obs
    FROM d GROUP BY 1, 2
),
tot AS (
    SELECT flag, digit, obs,
           SUM(obs) OVER (PARTITION BY flag) AS total,
           CAST(FLOOR(1e3 * log10(1e0 + 1e0 / digit) + 5e-1) AS BIGINT)
               AS exp_permille
    FROM cnt
),
term AS (
    SELECT flag, digit, obs, total, exp_permille,
           (2000 * obs + total) // (2 * total) - exp_permille AS dev_permille,
           CAST(FLOOR(
               CAST((1000 * obs - total * exp_permille)
                    * (1000 * obs - total * exp_permille) AS DOUBLE)
               / CAST(1000 * total * exp_permille AS DOUBLE)
               * 1e6 + 5e-1) AS BIGINT) AS chi2_term_micro
    FROM tot
)
SELECT flag, CAST(digit AS INT) AS digit, obs,
       CAST(exp_permille AS BIGINT) AS exp_permille,
       CAST(dev_permille AS BIGINT) AS dev_permille,
       CAST(SUM(chi2_term_micro) OVER (PARTITION BY flag) AS BIGINT)
           AS chi2_micro
FROM term
"""


@register("ext_benford_anomaly", oracle=_BENFORD_SQL,
          tags=("ext", "curation", "audit"))
def ext_benford_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit against Benford's law (Newcomb 1881,
    Benford 1938) — the forensic screen for fabricated or truncated
    numeric columns: natural multi-scale amounts put digit d first with
    probability log10(1+1/d); synthetic or clipped data (like TPC-H's
    bounded uniform prices — which is itself the fingerprint here)
    deviates sharply. Per (returnflag, digit): observed count, Benford
    expectation in permille, deviation, and a per-flag chi-square
    statistic.

    Determinism: the expectation is the ONLY transcendental —
    ``log10(1+1/d)`` on nine identical doubles, quantized at 1e3 where
    every value sits ≥10 permille from a rounding boundary, so any
    libm-ULP divergence is absorbed. Observed permille is pure integer
    algebra (``(2000·obs + total) div (2·total)``), and the chi-square
    is an int64 sum of per-digit quantized terms — order-independent
    under any partial-aggregation schedule (portable.py discipline).

    Scale shape: one map-side-combinable count shuffle on
    (flag, digit) — 27 reduced rows regardless of input size — then
    windows over those 27 rows. The digit extraction is a codegen
    string op in the scan stage; nothing else touches the fact table."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("long").cast("string"),
        1, 1).cast("long")
    cnt = (li.select(F.col("l_returnflag").alias("flag"),
                     digit.alias("digit"))
           .groupBy("flag", "digit")
           .agg(F.count(F.lit(1)).cast("long").alias("obs")))
    wf = Window.partitionBy("flag")
    tot = (cnt
           .withColumn("total", F.sum("obs").over(wf))
           .withColumn("exp_permille",
                       F.floor(F.lit(1e3) * F.log10(F.lit(1e0)
                               + F.lit(1e0) / F.col("digit"))
                               + F.lit(0.5)).cast("long")))
    diff = F.lit(1000) * F.col("obs") - F.col("total") * F.col("exp_permille")
    term = (tot
            .withColumn("dev_permille",
                        F.expr("(2000 * obs + total) div (2 * total)")
                        - F.col("exp_permille"))
            .withColumn("chi2_term_micro",
                        F.floor((diff * diff).cast("double")
                                / (F.lit(1000) * F.col("total")
                                   * F.col("exp_permille")).cast("double")
                                * F.lit(1e6) + F.lit(0.5)).cast("long")))
    return term.select(
        "flag", F.col("digit").cast("int").alias("digit"), "obs",
        "exp_permille", F.col("dev_permille").cast("long").alias("dev_permille"),
        F.sum("chi2_term_micro").over(wf).cast("long").alias("chi2_micro"))


# --------------------------------------------------------------------------
# ext_otsu_threshold — histogram-based automatic quality cutoff
# --------------------------------------------------------------------------

_OTSU_BIN_W = 18
_OTSU_SQL = f"""
WITH b AS (
    SELECT least(31, n_chars // {_OTSU_BIN_W}) AS bin,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1
),
cum AS (
    SELECT bin, c,
           SUM(c)       OVER (ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS w0,
           SUM(bin * c) OVER (ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS s0,
           SUM(c)       OVER () AS n,
           SUM(bin * c) OVER () AS s
    FROM b
),
score AS (
    SELECT CAST(bin + 1 AS INT) AS threshold_bin,
           CAST(w0 AS BIGINT) AS n_below,
           CAST(FLOOR(
               CAST(s0 * (n - w0) - (s - s0) * w0 AS DOUBLE)
               * CAST(s0 * (n - w0) - (s - s0) * w0 AS DOUBLE)
               / CAST(w0 * (n - w0) AS DOUBLE)
               + 5e-1) AS BIGINT) AS sigma_b
    FROM cum WHERE w0 > 0 AND w0 < n
)
SELECT threshold_bin, n_below, sigma_b,
       CAST(ROW_NUMBER() OVER (ORDER BY sigma_b DESC, threshold_bin) = 1
            AS BOOLEAN) AS is_otsu
FROM score
"""


@register("ext_otsu_threshold", oracle=_OTSU_SQL,
          tags=("ext", "curation", "quality"))
def ext_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic quality cutoff by Otsu's method (Otsu 1979, IEEE
    TSMC-9) — pick the threshold that maximizes between-class variance
    over a 32-bin histogram of a per-document signal (here document
    length), the unsupervised way to split a bimodal keep/drop score
    without hand-tuning a cutoff. Emits the full criterion curve
    (threshold, population below, σ²_between) with the argmax flagged,
    so the margin around the chosen cutoff is visible, not just the
    winner.

    Determinism: histogram counts and the cumulative/total moment sums
    are exact int64; σ_b's numerator ``(s0·w1 − s1·w0)`` is formed in
    int64 (exact ≤ 2^53 at any bench scale), squared and divided in
    identical IEEE doubles, floor-quantized; argmax tie-breaks on the
    smaller threshold via row_number.

    Scale shape: ONE map-side-combinable 32-row histogram shuffle over
    the corpus; everything after operates on ≤32 rows (single-partition
    windows over the histogram, not the data — the same reduce-then-
    analyze shape as ``agg_histogram``). At 100 TB the scan is the cost;
    the Otsu sweep is free."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    b = (docs.select(F.least(F.lit(31).cast("long"),
                             F.expr(f"n_chars div {_OTSU_BIN_W}"))
                     .cast("long").alias("bin"))
         .groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    cum = (b.withColumn("w0", F.sum("c").over(wcum))
           .withColumn("s0", F.sum(F.col("bin") * F.col("c")).over(wcum))
           .withColumn("n", F.sum("c").over(wall))
           .withColumn("s", F.sum(F.col("bin") * F.col("c")).over(wall)))
    num = (F.col("s0") * (F.col("n") - F.col("w0"))
           - (F.col("s") - F.col("s0")) * F.col("w0"))
    score = (cum.where((F.col("w0") > 0) & (F.col("w0") < F.col("n")))
             .select((F.col("bin") + 1).cast("int").alias("threshold_bin"),
                     F.col("w0").cast("long").alias("n_below"),
                     F.floor(num.cast("double") * num.cast("double")
                             / (F.col("w0") * (F.col("n") - F.col("w0")))
                             .cast("double")
                             + F.lit(0.5)).cast("long").alias("sigma_b")))
    wrk = Window.orderBy(F.col("sigma_b").desc(), "threshold_bin")
    return score.withColumn(
        "is_otsu", (F.row_number().over(wrk) == 1).cast("boolean"))


# --------------------------------------------------------------------------
# ext_preference_pair_audit — RLHF preference-pair dataset bias audit
# --------------------------------------------------------------------------

_PREF_SQL = """
WITH stats AS (
    SELECT doc_id, doc_id // 2 AS pair_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents) t
    WHERE tok <> ''
    GROUP BY 1, 2
),
scored AS (
    SELECT pair_id, doc_id, n_tok,
           (1000 * n_distinct) // n_tok AS score,
           lpad(CAST((1000 * n_distinct) // n_tok AS VARCHAR), 6, '0')
               || lpad(CAST(999999999999 - doc_id AS VARCHAR), 12, '0')
               AS pref_key
    FROM stats
),
pairs AS (
    SELECT pair_id,
           arg_max(n_tok, pref_key) AS c_tok,
           arg_min(n_tok, pref_key) AS r_tok,
           arg_max(score, pref_key) AS c_score,
           arg_min(score, pref_key) AS r_score
    FROM scored
    GROUP BY 1 HAVING COUNT(*) = 2
)
SELECT CAST((c_score - r_score) // 50 AS INT) AS margin_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN c_tok > r_tok THEN 1 ELSE 0 END) AS BIGINT)
           AS n_chosen_longer,
       CAST((2000 * SUM(CASE WHEN c_tok > r_tok THEN 1 ELSE 0 END)
             + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
           AS chosen_longer_permille,
       CAST(SUM(c_tok - r_tok) AS BIGINT) AS sum_len_delta
FROM pairs
GROUP BY 1
"""


@register("ext_preference_pair_audit", oracle=_PREF_SQL,
          tags=("ext", "curation", "rlhf"))
def ext_preference_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair dataset bias audit — the pre-training-of-a-reward-
    model check (Stiennon et al. 2020; Singhal et al. 2023 on length
    bias): pair adjacent documents, declare the higher type-token-ratio
    member "chosen", then measure whether "chosen" is systematically the
    LONGER response, stratified by preference margin. A high
    chosen-longer permille at low margins is exactly the spurious length
    correlation a reward model will latch onto; the margin histogram
    shows where relabeling effort should go.

    Choice is deterministic: score = (1000·distinct) div tokens, ties
    broken toward the lower doc_id via a zero-padded (score, −doc_id)
    string key fed to ``max_by``/``min_by`` — both members of a pair are
    recovered from ONE aggregation, no self-join. All outputs are
    integer algebra (permille via ``(2000k+n) div 2n``).

    Scale shape: per-doc token stats (map-side combinable), one shuffle
    on pair_id (adjacent-id pairing keeps it dense), then a 20-row
    bucket aggregation. No joins at all — the pair merge IS the
    aggregation."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", F.explode(F.split("text", " "))
                        .alias("tok"))
            .where(F.col("tok") != ""))
    stats = (toks.groupBy("doc_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_tok"),
                  F.count_distinct("tok").cast("long").alias("n_distinct")))
    score = F.expr("(1000 * n_distinct) div n_tok")
    scored = stats.select(
        F.expr("doc_id div 2").alias("pair_id"), "n_tok",
        score.alias("score"),
        F.concat(F.lpad(score.cast("string"), 6, "0"),
                 F.lpad((F.lit(999999999999) - F.col("doc_id"))
                        .cast("string"), 12, "0")).alias("pref_key"))
    pairs = (scored.groupBy("pair_id")
             .agg(F.max_by("n_tok", "pref_key").alias("c_tok"),
                  F.min_by("n_tok", "pref_key").alias("r_tok"),
                  F.max_by("score", "pref_key").alias("c_score"),
                  F.min_by("score", "pref_key").alias("r_score"),
                  F.count(F.lit(1)).alias("n_members"))
             .where(F.col("n_members") == 2))
    longer = F.sum(F.when(F.col("c_tok") > F.col("r_tok"), 1).otherwise(0))
    return (pairs
            .groupBy(F.expr("(c_score - r_score) div 50").cast("int")
                     .alias("margin_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 longer.cast("long").alias("n_chosen_longer"),
                 F.expr("(2000 * sum(case when c_tok > r_tok then 1 else 0"
                        " end) + count(1)) div (2 * count(1))")
                 .alias("chosen_longer_permille"),
                 F.sum(F.col("c_tok") - F.col("r_tok")).cast("long")
                 .alias("sum_len_delta")))


# --------------------------------------------------------------------------
# ext_wilson_ci — per-source quality pass rate with Wilson interval
# --------------------------------------------------------------------------

_WILSON_Z2 = 1.96 * 1.96  # z for 95% two-sided, squared once in Python

_WILSON_SQL = f"""
WITH s AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
    FROM documents GROUP BY 1
),
w AS (
    SELECT source, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           {_WILSON_Z2!r} / CAST(n AS DOUBLE) AS zz_n
    FROM s
)
SELECT source, n, k,
       CAST(FLOOR(((p + zz_n / 2e0)
                   - sqrt(p * (1e0 - p) * zz_n + zz_n * zz_n / 4e0))
                  / (1e0 + zz_n) * 1e6 + 5e-1) AS BIGINT) AS wilson_lo_micro,
       CAST(FLOOR(((p + zz_n / 2e0)
                   + sqrt(p * (1e0 - p) * zz_n + zz_n * zz_n / 4e0))
                  / (1e0 + zz_n) * 1e6 + 5e-1) AS BIGINT) AS wilson_hi_micro
FROM w
"""


@register("ext_wilson_ci", oracle=_WILSON_SQL,
          tags=("ext", "curation", "stats"))
def ext_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality pass rate with a 95% Wilson score interval
    (Wilson 1927) — the right uncertainty band for filter-rule pass
    rates on sources of very different sizes: unlike the normal
    approximation it never leaves [0,1] and stays honest at small n, so
    a 40-doc source with 90% pass and a 4M-doc source with 62% pass are
    comparable at a glance. This is the per-stratum report a curation
    run attaches to every quality gate.

    Determinism: k and n are exact integer counts; the interval is a
    fixed sequence of IEEE ops on (k/n, z²/n) — sqrt is correctly
    rounded per IEEE 754 in both engines — quantized at 1e-6. z² is
    computed ONCE in Python and injected into both sides, so no
    cross-engine literal drift.

    Scale shape: one map-side-combinable (source → k, n) shuffle; the
    interval algebra runs on |sources| rows. The pass predicate is a
    codegen comparison in the scan stage."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    s = (docs.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(F.when(F.col("n_chars") >= 200, 1).otherwise(0))
              .cast("long").alias("k")))
    p = F.col("k").cast("double") / F.col("n").cast("double")
    zz_n = F.lit(_WILSON_Z2) / F.col("n").cast("double")
    half = F.sqrt(p * (F.lit(1e0) - p) * zz_n + zz_n * zz_n / F.lit(4e0))
    center = p + zz_n / F.lit(2e0)
    den = F.lit(1e0) + zz_n
    q6 = lambda e: F.floor(e * F.lit(1e6) + F.lit(0.5)).cast("long")
    return s.select("source", "n", "k",
                    q6((center - half) / den).alias("wilson_lo_micro"),
                    q6((center + half) / den).alias("wilson_hi_micro"))


# --------------------------------------------------------------------------
# ext_data_tests — declarative data-quality test suite (dbt-style)
# --------------------------------------------------------------------------

_DATA_TESTS_SQL = """
SELECT 'not_null' AS test, 'orders.o_custkey' AS target,
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'not_null', 'lineitem.l_quantity',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL)
            AS BIGINT)
UNION ALL
SELECT 'unique', 'orders.o_orderkey',
       CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
             (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) t
             WHERE c > 1) AS BIGINT)
UNION ALL
SELECT 'unique', 'documents.doc_id',
       CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
             (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id) t
             WHERE c > 1) AS BIGINT)
UNION ALL
SELECT 'accepted_values', 'lineitem.l_returnflag',
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
UNION ALL
SELECT 'accepted_values', 'orders.o_orderstatus',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
UNION ALL
SELECT 'relationship', 'orders.o_custkey -> customer.c_custkey',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'relationship', 'lineitem.l_orderkey -> orders.o_orderkey',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT)
"""


@register("ext_data_tests", oracle=f"""
SELECT test, target, n_violations, n_violations = 0 AS passed
FROM ({_DATA_TESTS_SQL}) t
""", tags=("ext", "curation", "audit"))
def ext_data_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality test suite in the dbt style (the four
    canonical generic tests: ``not_null``, ``unique``,
    ``accepted_values``, ``relationships`` — dbt-core's schema tests,
    public docs): one result row per declared test with its violation
    count, the contract gate an ETL run evaluates before publishing a
    snapshot. A passing suite is the machine-checkable form of the
    reference's per-run sanity asserts (300 injections → 300 counts,
    Documentation-Self-Triggering.html:194).

    Each test compiles to the cheapest plan of its class: not_null and
    accepted_values are pushed-predicate counts (codegen scan passes);
    unique is a keyed count with map-side partials (violations =
    Σ(c−1) over groups with c>1); relationships are LEFT ANTI hash
    joins (orphan scan). The 8 single-row results union driver-side —
    at 100 TB each leg is an independent column-pruned pass you can
    also run incrementally per partition.

    Everything is exact integer counting — trivially hash-stable."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    docs = table(spark, sf_dir, "documents")
    cust = table(spark, sf_dir, "customer")

    def one(test: str, target: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(F.lit(test).alias("test"),
                          F.lit(target).alias("target"),
                          F.col("v").cast("long").alias("n_violations"))

    def count_rows(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("v"))

    def dup_excess(df: DataFrame, key: str) -> DataFrame:
        g = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        return g.where(F.col("c") > 1).agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v"))

    legs = [
        one("not_null", "orders.o_custkey",
            count_rows(orders.where(F.col("o_custkey").isNull()))),
        one("not_null", "lineitem.l_quantity",
            count_rows(li.where(F.col("l_quantity").isNull()))),
        one("unique", "orders.o_orderkey", dup_excess(orders, "o_orderkey")),
        one("unique", "documents.doc_id", dup_excess(docs, "doc_id")),
        one("accepted_values", "lineitem.l_returnflag",
            count_rows(li.where(~F.col("l_returnflag")
                                .isin("A", "N", "R")))),
        one("accepted_values", "orders.o_orderstatus",
            count_rows(orders.where(~F.col("o_orderstatus")
                                    .isin("F", "O", "P")))),
        one("relationship", "orders.o_custkey -> customer.c_custkey",
            count_rows(orders.join(cust,
                                   orders.o_custkey == cust.c_custkey,
                                   "left_anti"))),
        one("relationship", "lineitem.l_orderkey -> orders.o_orderkey",
            count_rows(li.join(orders,
                               li.l_orderkey == orders.o_orderkey,
                               "left_anti"))),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.withColumn("passed", (F.col("n_violations") == 0)
                          .cast("boolean"))


# --------------------------------------------------------------------------
# ext_psi_drift — Population Stability Index between event cohorts
# --------------------------------------------------------------------------

_PSI_BINS = 16

_PSI_SQL = f"""
WITH b AS (
    SELECT CAST(event_id % 2 AS INT) AS cohort,
           least({_PSI_BINS} - 1,
                 CAST(FLOOR(value / 31e0) AS BIGINT)) AS bin
    FROM events
),
c AS (
    SELECT bin,
           CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_ref,
           CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_cur
    FROM b GROUP BY 1
),
t AS (
    SELECT bin, c_ref, c_cur,
           (SELECT CAST(SUM(c_ref) AS BIGINT) FROM c) AS n_ref,
           (SELECT CAST(SUM(c_cur) AS BIGINT) FROM c) AS n_cur
    FROM c
),
terms AS (
    SELECT bin, c_ref, c_cur,
           CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + {_PSI_BINS} AS DOUBLE)
               AS p,
           CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + {_PSI_BINS} AS DOUBLE)
               AS q
    FROM t
)
SELECT bin, c_ref, c_cur,
       CAST(FLOOR((p - q) * ln(p / q) * 1e9 + 5e-1) AS BIGINT)
           AS psi_term_nano,
       CAST(SUM(CAST(FLOOR((p - q) * ln(p / q) * 1e9 + 5e-1) AS BIGINT))
            OVER () AS BIGINT) AS psi_nano
FROM terms
"""


@register("ext_psi_drift", oracle=_PSI_SQL, tags=("ext", "curation", "drift"))
def ext_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event cohorts (the credit-
    scoring industry's standard drift score; PSI < 0.1 stable, > 0.25
    action — alongside the registry's KS statistic (`ext_drift_ks`) and
    Jensen-Shannon divergence (`ext_js_divergence`), this completes the
    three drift measures a monitoring stack actually deploys): Σ (p−q)·
    ln(p/q) over a fixed 16-bin value histogram, cohorts split by
    deterministic event-id parity. Laplace (+1) smoothing keeps empty
    bins finite and is spelled identically on both sides.

    Determinism: bin counts are exact int64; p, q are single IEEE
    divisions of exact integers; each bin's PSI term is quantized to
    nano-units before the order-independent integer total. Emits the
    per-bin decomposition (which bins drive the drift) with the suite
    total on every row.

    Scale shape: one map-side-combinable (bin × cohort) count shuffle
    — 16 reduced rows — then scalar algebra; the parity split and
    binning are codegen scan-stage expressions."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        F.pmod("event_id", F.lit(2)).cast("int").alias("cohort"),
        F.least(F.lit(_PSI_BINS - 1).cast("long"),
                F.floor(F.col("value") / F.lit(31e0))).alias("bin"))
    c = (b.groupBy("bin")
         .agg(F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
              .cast("long").alias("c_ref"),
              F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
              .cast("long").alias("c_cur")))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    t = (c.withColumn("n_ref", F.sum("c_ref").over(wall))
         .withColumn("n_cur", F.sum("c_cur").over(wall)))
    p = ((F.col("c_ref") + 1).cast("double")
         / (F.col("n_ref") + F.lit(_PSI_BINS)).cast("double"))
    q = ((F.col("c_cur") + 1).cast("double")
         / (F.col("n_cur") + F.lit(_PSI_BINS)).cast("double"))
    term = F.floor((p - q) * F.log(p / q) * F.lit(1e9)
                   + F.lit(0.5)).cast("long")
    out = t.select("bin", "c_ref", "c_cur", term.alias("psi_term_nano"))
    return out.withColumn("psi_nano",
                          F.sum("psi_term_nano").over(wall).cast("long"))


# --------------------------------------------------------------------------
# ext_chi2_independence — contingency-table independence test
# --------------------------------------------------------------------------

_CHI2_SQL = """
WITH o AS (
    SELECT l_returnflag AS flag, l_linestatus AS status,
           CAST(COUNT(*) AS BIGINT) AS obs
    FROM lineitem GROUP BY 1, 2
),
m AS (
    SELECT flag, status, obs,
           SUM(obs) OVER (PARTITION BY flag)   AS r,
           SUM(obs) OVER (PARTITION BY status) AS c,
           SUM(obs) OVER ()                    AS n
    FROM o
),
d AS (
    SELECT flag, status, obs,
           CAST(r AS DOUBLE) AS rd, CAST(c AS DOUBLE) AS cd,
           CAST(n AS DOUBLE) AS nd,
           CAST(n AS DOUBLE) * CAST(obs AS DOUBLE)
               - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) AS dd
    FROM m
),
t AS (
    SELECT flag, status, obs,
           CAST(FLOOR(rd * cd / nd * 1e3 + 5e-1) AS BIGINT) AS exp_milli,
           CAST(FLOOR(dd * dd / (nd * rd * cd) * 1e6 + 5e-1)
                AS BIGINT) AS term_micro,
           (SELECT CAST((COUNT(DISTINCT flag) - 1)
                        * (COUNT(DISTINCT status) - 1) AS INT) FROM o)
               AS dof
    FROM d
)
SELECT flag, status, obs, exp_milli, term_micro, dof,
       CAST(SUM(term_micro) OVER () AS BIGINT) AS chi2_micro
FROM t
"""


@register("ext_chi2_independence", oracle=_CHI2_SQL,
          tags=("ext", "curation", "stats"))
def ext_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence over the (returnflag ×
    linestatus) contingency table — "is the label mix the same across
    strata?", the categorical drift/association test that belongs next
    to the registry's goodness-of-fit form (`ext_benford_anomaly`).
    Emits every cell with its expected count and chi-square term plus
    the table statistic and degrees of freedom, so the analyst sees
    WHICH cell drives the association, not just the scalar.

    Determinism AND overflow safety: marginals are window int64 sums
    over the 6-row reduced table (sums of counts, never products — safe
    at any SF); every PRODUCT (r·c, n·obs, n·r·c) is computed in IEEE
    doubles with identical operation order in both engines, so nothing
    can wrap int64 at large scale (r·c alone would pass 2^63 near SF10)
    and the quantized terms still hash identically. Expected counts are
    round-half-up milli-units of the double r·c/n.

    Scale shape: one map-side-combinable (flag, status) count shuffle —
    6 reduced rows regardless of input — then windows over those 6."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    o = (li.groupBy(F.col("l_returnflag").alias("flag"),
                    F.col("l_linestatus").alias("status"))
         .agg(F.count(F.lit(1)).cast("long").alias("obs")))
    m = (o.withColumn("r", F.sum("obs").over(Window.partitionBy("flag")))
         .withColumn("c", F.sum("obs").over(Window.partitionBy("status")))
         .withColumn("n", F.sum("obs").over(
             Window.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))))
    d = m.select(
        "flag", "status", "obs",
        F.col("r").cast("double").alias("rd"),
        F.col("c").cast("double").alias("cd"),
        F.col("n").cast("double").alias("nd"),
        (F.col("n").cast("double") * F.col("obs").cast("double")
         - F.col("r").cast("double") * F.col("c").cast("double"))
        .alias("dd"))
    t = d.select(
        "flag", "status", "obs",
        F.floor(F.col("rd") * F.col("cd") / F.col("nd") * F.lit(1e3)
                + F.lit(0.5)).cast("long").alias("exp_milli"),
        F.floor(F.col("dd") * F.col("dd")
                / (F.col("nd") * F.col("rd") * F.col("cd"))
                * F.lit(1e6) + F.lit(0.5)).cast("long").alias("term_micro"))
    dof = (o.agg(((F.count_distinct("flag") - 1)
                  * (F.count_distinct("status") - 1)).cast("int")
                 .alias("dof")))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    return (t.crossJoin(F.broadcast(dof))
            .withColumn("chi2_micro",
                        F.sum("term_micro").over(wall).cast("long"))
            .select("flag", "status", "obs", "exp_milli", "term_micro",
                    "dof", "chi2_micro"))


# --------------------------------------------------------------------------
# ext_stylometry_delta — Burrows' Delta source-style distance
# --------------------------------------------------------------------------

_STYLO_TOPW = 12

_STYLO_SQL = f"""
WITH occ AS (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
tot AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM occ WHERE tok <> '' GROUP BY 1
),
topw AS (
    SELECT tok FROM (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM occ WHERE tok <> '' GROUP BY tok)
    WHERE rk <= {_STYLO_TOPW}
),
f AS (
    SELECT t.source, w.tok,
           CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(t.n_tok AS DOUBLE)
               AS rf
    FROM tot t CROSS JOIN topw w
    LEFT JOIN (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
               FROM occ WHERE tok <> '' GROUP BY 1, 2) c
      ON c.source = t.source AND c.tok = w.tok
),
z AS (
    SELECT source, tok, dev / sqrt(var) AS zs
    FROM (
        SELECT source, tok,
               rf - AVG(rf) OVER (PARTITION BY tok) AS dev,
               AVG(rf * rf) OVER (PARTITION BY tok)
                   - AVG(rf) OVER (PARTITION BY tok)
                     * AVG(rf) OVER (PARTITION BY tok) AS var
        FROM f)
    WHERE var > 0
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CAST(FLOOR(abs(a.zs - b.zs) * 1e9 + 5e-1) AS BIGINT))
            // {_STYLO_TOPW} AS BIGINT) AS delta_nano
FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
GROUP BY 1, 2
"""


@register("ext_stylometry_delta", oracle=_STYLO_SQL,
          tags=("ext", "curation", "stylometry"))
def ext_stylometry_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between sources (Burrows 2002; Evert et al. 2017)
    — the standard stylometric distance: z-score each source's relative
    frequency of the corpus's top most-frequent words (function words
    carry authorial/provenance signal), then Delta(a,b) = mean |z_a −
    z_b|. Curation reads a LOW delta between two nominally-different
    sources as a mirrored/relabeled-crawl warning, the provenance twin
    of content dedup.

    Determinism caveat handled: per-word mean/σ across sources are
    computed by AVG over the |sources|·|words| grid — a double sum
    whose order could vary, EXCEPT the grid is dense and tiny (window
    over ≤ sources rows in one partition per word), and both engines
    evaluate the same single-segment window serially; the final Delta
    per-term quantized to int64 nano-units BEFORE the pair aggregation,
    so the cross-partition sum is exact integers in any order
    (portable.py discipline) — verified FLOAT-HEX identical.

    Scale shape: corpus reduces to (source, token) counts once; the
    top-w vocabulary is a broadcast 12-row list; z-scores live on a
    |sources|×12 grid and the pair join is |sources|²·12 — all
    post-reduction, nothing data-sized."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    occ = (docs.select("source", F.explode(F.split("text", " "))
                       .alias("tok"))
           .where(F.col("tok") != ""))
    tot = occ.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"))
    wv = Window.orderBy(F.col("c").desc(), "tok")
    topw = (occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
            .withColumn("rk", F.row_number().over(wv))
            .where(F.col("rk") <= _STYLO_TOPW).select("tok"))
    cnt = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    f = (tot.crossJoin(F.broadcast(topw))
         .join(cnt, ["source", "tok"], "left")
         .select("source", "tok",
                 (F.coalesce(F.col("c"), F.lit(0)).cast("double")
                  / F.col("n_tok").cast("double")).alias("rf")))
    wt = Window.partitionBy("tok")
    mean = F.avg("rf").over(wt)
    var = F.avg(F.col("rf") * F.col("rf")).over(wt) - mean * mean
    # A zero-variance word (same relative frequency in every source)
    # makes the one-pass form yield 0 or a tiny negative, where Spark
    # (NULL on /0, NaN on sqrt(neg)) and DuckDB diverge — drop such
    # words identically in both engines instead of dividing by them.
    z = (f.select("source", "tok",
                  (F.col("rf") - mean).alias("dev"), var.alias("var"))
         .where(F.col("var") > 0)
         .select("source", "tok",
                 (F.col("dev") / F.sqrt("var")).alias("zs")))
    a, b = z.alias("a"), z.alias("b")
    return (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                   & (F.col("a.source") < F.col("b.source")))
            .groupBy(F.col("a.source").alias("source_a"),
                     F.col("b.source").alias("source_b"))
            .agg(F.expr("sum(cast(floor(abs(a.zs - b.zs) * 1e9 + 0.5)"
                        f" as bigint)) div {_STYLO_TOPW}")
                 .alias("delta_nano")))


# --------------------------------------------------------------------------
# ext_quality_auc — ROC AUC via the exact Mann-Whitney midrank form
# --------------------------------------------------------------------------

_AUC_SQL = """
WITH s AS (
    SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS npos
    FROM documents GROUP BY n_chars
),
r AS (
    SELECT s, cnt, npos,
           COALESCE(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM s
),
a AS (
    SELECT CAST(SUM(npos * (2 * cb + cnt + 1)) AS BIGINT) AS ranksum2,
           CAST(SUM(npos) AS BIGINT) AS np,
           CAST(SUM(cnt - npos) AS BIGINT) AS nn
    FROM r
)
SELECT np AS n_pos, nn AS n_neg,
       CAST(FLOOR((CAST(ranksum2 AS DOUBLE)
                   - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1))
                  / (2e0 * np * nn) * 1e6 + 5e-1) AS BIGINT) AS auc_micro
FROM a
"""


@register("ext_quality_auc", oracle=_AUC_SQL,
          tags=("ext", "curation", "eval"))
def ext_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of a quality score against a binary label via the exact
    Mann-Whitney rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻), with
    midranks for ties — the eval primitive behind every quality-classifier
    gate decision (here: does document length separate English from
    non-English, the stand-in for score-vs-label). No per-row ranking is
    materialized: scores reduce to a distinct-score table (cnt, n_pos per
    score), midranks come from ONE running window over that table, and
    2·midrank = 2·cum_before + cnt + 1 keeps everything integer until the
    single closing division (done in doubles, fixed order — rank sums
    would pass int64 only beyond ~10⁹ rows; past that, swap in the
    histogram-bucketed estimator).

    Scale shape: one map-side-combinable score reduce; the window runs
    over |distinct scores| rows (bounded for discrete/quantized scores,
    which production quality scores are)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    s = (docs.groupBy(F.col("n_chars").alias("s"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
              F.count_if(F.col("lang") == "en").cast("long").alias("npos")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    r = s.select("s", "cnt", "npos",
                 F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cb"))
    a = r.agg(
        F.sum(F.col("npos") * (F.lit(2) * F.col("cb") + F.col("cnt")
                               + F.lit(1))).cast("long").alias("ranksum2"),
        F.sum("npos").cast("long").alias("np"),
        F.sum(F.col("cnt") - F.col("npos")).cast("long").alias("nn"))
    auc = ((F.col("ranksum2").cast("double")
            - F.col("np").cast("double") * (F.col("np").cast("double")
                                            + F.lit(1.0)))
           / (F.lit(2.0) * F.col("np") * F.col("nn")))
    return a.select(F.col("np").alias("n_pos"), F.col("nn").alias("n_neg"),
                    F.floor(auc * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("auc_micro"))


# --------------------------------------------------------------------------
# ext_bootstrap_ci — deterministic hash-bootstrap CI for a corpus mean
# --------------------------------------------------------------------------

_BOOT_B = 32

_BOOT_SQL = f"""
WITH reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
m AS (
    SELECT r.b, d.n_chars
    FROM documents d, reps r
    WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                       || CAST(r.b AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000 < 500
),
means AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((2000000 * SUM(n_chars) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS mean_len_micro
    FROM m GROUP BY b
),
ranked AS (
    SELECT b, n_docs, mean_len_micro,
           ROW_NUMBER() OVER (ORDER BY mean_len_micro, b) AS rn
    FROM means
)
SELECT b, n_docs, mean_len_micro,
       MAX(CASE WHEN rn = 2 THEN mean_len_micro END) OVER ()
           AS ci_lo_micro,
       MAX(CASE WHEN rn = {_BOOT_B - 1} THEN mean_len_micro END) OVER ()
           AS ci_hi_micro
FROM ranked
"""


@register("ext_bootstrap_ci", oracle=_BOOT_SQL,
          tags=("ext", "curation", "stats"))
def ext_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling-bootstrap confidence interval for a corpus statistic
    (mean document length), with DETERMINISTIC replicates: replicate b
    contains a doc iff md5(doc_id:b) lands in half the bucket space — the
    md5-bucket discipline (`ext_sample_split`) extended to resampling, so
    the CI is reproducible across engines, runs, and partitionings, which
    a seeded RNG bootstrap can never be. Emits every replicate mean plus
    the (2nd-smallest, 2nd-largest)-of-32 interval ≈ a 94% percentile CI
    — the uncertainty band a curation team attaches to before/after-filter
    corpus stats.

    Scale shape: the doc × B fan-out is map-side (predicate evaluated in
    the scan projection, no shuffle), reduced by one {_BOOT_B}-key
    aggregate; windows run over the {_BOOT_B}-row replicate table."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    reps = spark.range(0, _BOOT_B).select(F.col("id").cast("long").alias("b"))
    bucket = F.expr("cast(conv(substring(md5(concat(cast(doc_id as string),"
                    " ':', cast(b as string))), 1, 15), 16, 10) as bigint)"
                    " % 1000")
    m = (docs.select("doc_id", "n_chars").crossJoin(F.broadcast(reps))
         .where(bucket < 500))
    means = (m.groupBy("b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.expr("cast((2000000 * sum(n_chars) + count(1))"
                         " div (2 * count(1)) as bigint)")
                  .alias("mean_len_micro")))
    wr = Window.orderBy("mean_len_micro", "b")
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    ranked = means.withColumn("rn", F.row_number().over(wr))
    return ranked.select(
        "b", "n_docs", "mean_len_micro",
        F.max(F.when(F.col("rn") == 2, F.col("mean_len_micro")))
        .over(wall).alias("ci_lo_micro"),
        F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_len_micro")))
        .over(wall).alias("ci_hi_micro"))


# --------------------------------------------------------------------------
# ext_gains_lift_table — decile gains/lift companion to ext_quality_auc
# --------------------------------------------------------------------------

_GAINS_SQL = """
WITH s AS (
    SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS npos
    FROM documents GROUP BY n_chars
),
r AS (
    SELECT s, cnt, npos,
           COALESCE(SUM(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM s
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(npos) AS BIGINT) AS p FROM s),
d AS (
    SELECT CAST(cb * 10 // t.n AS INT) AS decile, cnt, npos
    FROM r, tot t
),
per AS (
    SELECT decile, CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(npos) AS BIGINT) AS n_pos
    FROM d GROUP BY decile
)
SELECT decile, per.n, n_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_pos,
       CAST(FLOOR(CAST(SUM(n_pos) OVER (ORDER BY decile
                                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                  / t.p * 1e6 + 5e-1) AS BIGINT) AS gains_micro,
       CAST(FLOOR((CAST(n_pos AS DOUBLE) / per.n)
                  / (CAST(t.p AS DOUBLE) / t.n) * 1e6 + 5e-1) AS BIGINT)
           AS lift_micro
FROM per, tot t
"""


@register("ext_gains_lift_table", oracle=_GAINS_SQL,
          tags=("ext", "curation", "eval"))
def ext_gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table — `ext_quality_auc`'s operational
    companion: rank by score (document length, descending, the same
    stand-in), cut into tenths of the corpus, and report per-decile
    capture (gains) and concentration vs base rate (lift) — the table a
    curation team reads to pick the actual keep-fraction ("the top 30%
    captures 62% of positives") where AUC only says the ranking is good.
    Ties are handled deterministically: a whole distinct-score group
    lands in the decile of its cumulative start, so no row-level
    tie-break ever decides a boundary.

    Scale shape: one map-side-combinable distinct-score reduce, one
    window over |distinct scores| rows, then 10-row arithmetic — the
    corpus is never ranked row by row."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    s = (docs.groupBy(F.col("n_chars").alias("s"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
              F.count_if(F.col("lang") == "en").cast("long").alias("npos"))
         .localCheckpoint(eager=False))   # feeds the window AND the totals
    wr = (Window.orderBy(F.col("s").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    r = s.select("s", "cnt", "npos",
                 F.coalesce(F.sum("cnt").over(wr), F.lit(0)).alias("cb"))
    tot = s.agg(F.sum("cnt").cast("long").alias("tot_n"),
                F.sum("npos").cast("long").alias("tot_p"))
    d = (r.crossJoin(F.broadcast(tot))
         .select(F.expr("cast(cb * 10 div tot_n as int)").alias("decile"),
                 "cnt", "npos"))
    per = (d.groupBy("decile")
           .agg(F.sum("cnt").cast("long").alias("n"),
                F.sum("npos").cast("long").alias("n_pos")))
    wc = (Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_pos").over(wc).cast("long")
    base = F.col("tot_p").cast("double") / F.col("tot_n")
    return (per.crossJoin(F.broadcast(tot))
            .select("decile", "n", "n_pos", cum.alias("cum_pos"),
                    F.floor(cum.cast("double") / F.col("tot_p")
                            * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("gains_micro"),
                    F.floor((F.col("n_pos").cast("double") / F.col("n"))
                            / base * F.lit(1e6) + F.lit(0.5)).cast("long")
                    .alias("lift_micro")))


# --------------------------------------------------------------------------
# ext_weak_supervision_matrix — labeling-function coverage/overlap/conflict
# --------------------------------------------------------------------------

#: the three labeling functions (vote: 1 keep, -1 drop, 0 abstain) as
#: shared SQL expressions over (n_chars, n_digit, n_upper) — one text
#: drives both engines.
_LF_EXPRS = (
    ("lf_length", "CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 "
                  "WHEN n_chars < 50 OR n_chars > 5000 THEN -1 "
                  "ELSE 0 END"),
    ("lf_digit", "CASE WHEN n_digit * 1000 > n_chars * 200 THEN -1 "
                 "WHEN n_digit * 1000 < n_chars * 50 THEN 1 "
                 "ELSE 0 END"),
    ("lf_upper", "CASE WHEN n_upper * 1000 > n_chars * 300 THEN -1 "
                 "WHEN n_upper * 1000 < n_chars * 100 THEN 1 "
                 "ELSE 0 END"),
)


def _ws_matrix_sql() -> str:
    votes = ", ".join(f"{expr} AS {name}" for name, expr in _LF_EXPRS)
    names = [n for n, _ in _LF_EXPRS]
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_docs"]
    rows = []
    for i, a in enumerate(names):
        aggs += [
            f"CAST(COUNT(CASE WHEN {a} <> 0 THEN 1 END) AS BIGINT)"
            f" AS f_{i}",
            f"CAST(COUNT(CASE WHEN {a} = 1 THEN 1 END) AS BIGINT)"
            f" AS k_{i}",
        ]
        rows.append(f"SELECT '{a}' AS rule_a, '{a}' AS rule_b, n_docs,"
                    f" f_{i} AS n_both, k_{i} AS n_agree,"
                    f" CAST(0 AS BIGINT) AS n_conflict FROM m")
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            b = names[j]
            aggs += [
                f"CAST(COUNT(CASE WHEN {a} <> 0 AND {b} <> 0 THEN 1 END)"
                f" AS BIGINT) AS b_{i}{j}",
                f"CAST(COUNT(CASE WHEN {a} <> 0 AND {b} <> 0"
                f" AND {a} = {b} THEN 1 END) AS BIGINT) AS g_{i}{j}",
                f"CAST(COUNT(CASE WHEN {a} <> 0 AND {b} <> 0"
                f" AND {a} <> {b} THEN 1 END) AS BIGINT) AS c_{i}{j}",
            ]
            rows.append(f"SELECT '{a}', '{b}', n_docs, b_{i}{j}, g_{i}{j},"
                        f" c_{i}{j} FROM m")
    return (f"WITH v AS (SELECT {votes} FROM "
            "(SELECT n_chars, "
            "CAST(length(text) - length(regexp_replace(text,"
            " '[0-9]', '', 'g')) AS BIGINT) AS n_digit, "
            "CAST(length(text) - length(regexp_replace(text,"
            " '[A-Z]', '', 'g')) AS BIGINT) AS n_upper "
            "FROM documents WHERE n_chars > 0)), "
            f"m AS (SELECT {', '.join(aggs)} FROM v) "
            + "\nUNION ALL\n".join(rows))


@register("ext_weak_supervision_matrix", oracle=_ws_matrix_sql(),
          tags=("ext", "curation", "labeling"))
def ext_weak_supervision_matrix(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Labeling-function diagnostic matrix (Ratner et al., Snorkel
    VLDB'18): three noisy keep/drop/abstain rules (length band, digit
    density, uppercase density — shared expression text drives both
    engines) evaluated in one pass, reported as the standard LF health
    table — per rule: coverage (fires) and keeps; per rule pair: overlap
    (both fire), agreements, conflicts. High-conflict pairs are where a
    label model earns its keep; near-duplicate columns (overlap ==
    agreement everywhere) mean a redundant rule. This is the diagnosis
    step BEFORE fitting `ext_quality_logistic`/`ext_quality_ensemble`
    weights.

    Scale shape: the votes are row-local CASE expressions in codegen;
    ALL fifteen matrix cells come from ONE map-side-combinable aggregate
    over the corpus (conditional counts), exploded to the 6-row table by
    constant selects — the corpus is touched exactly once, no joins, no
    windows."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("ws_docs")
    # dialect touch-ups on the shared text: Spark's regexp_replace
    # replaces all matches by default (its 4th arg is a position, not a
    # 'g' flag), and the view replaces the raw table
    sql = (_ws_matrix_sql()
           .replace("FROM documents WHERE n_chars > 0", "FROM ws_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_annotator_kappa — Cohen's kappa between two labeling rules
# --------------------------------------------------------------------------

_KAPPA_SQL = """
WITH v AS (
    SELECT CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS a,
           CASE WHEN n_digit * 1000 < n_chars * 120 THEN 1 ELSE 0 END AS b
    FROM (SELECT n_chars,
                 CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS n_digit
          FROM documents WHERE n_chars > 0)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN a = 1 AND b = 1 THEN 1 END) AS BIGINT)
               AS n11,
           CAST(COUNT(CASE WHEN a = 1 AND b = 0 THEN 1 END) AS BIGINT)
               AS n10,
           CAST(COUNT(CASE WHEN a = 0 AND b = 1 THEN 1 END) AS BIGINT)
               AS n01,
           CAST(COUNT(CASE WHEN a = 0 AND b = 0 THEN 1 END) AS BIGINT)
               AS n00
    FROM v
)
SELECT n, n11, n10, n01, n00,
       CAST(FLOOR((n11 + n00) * 1e0 / n * 1e6 + 5e-1) AS BIGINT)
           AS po_micro,
       CAST(FLOOR(((n11 + n10) * 1e0 / n * ((n11 + n01) * 1e0 / n)
                   + (n01 + n00) * 1e0 / n * ((n10 + n00) * 1e0 / n))
                  * 1e6 + 5e-1) AS BIGINT) AS pe_micro,
       CAST(FLOOR(((n11 + n00) * 1e0 / n
                   - ((n11 + n10) * 1e0 / n * ((n11 + n01) * 1e0 / n)
                      + (n01 + n00) * 1e0 / n * ((n10 + n00) * 1e0 / n)))
                  / (1e0 - ((n11 + n10) * 1e0 / n * ((n11 + n01) * 1e0 / n)
                            + (n01 + n00) * 1e0 / n
                              * ((n10 + n00) * 1e0 / n)))
                  * 1e6 + 5e-1) AS BIGINT) AS kappa_micro
FROM m
WHERE n11 < n AND n00 < n
"""


@register("ext_annotator_kappa", oracle=_KAPPA_SQL,
          tags=("ext", "curation", "eval"))
def ext_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary annotators (Cohen 1960) — the
    chance-corrected agreement statistic behind every labeling-quality
    report ("raw agreement 85% sounds great until chance alone gives
    80%"): here the two deterministic raters are a length rule and a
    digit-density rule, the same class of noisy judges
    `ext_weak_supervision_matrix` diagnoses; with human or LLM labels
    in the columns the query is unchanged. Emits the full 2x2
    contingency plus observed/expected agreement and kappa, micro-
    quantized with one fixed-order double expression per output (the
    same subexpression text repeated verbatim, so both engines fold it
    identically). The unanimous-agreement degenerate case (n11 = n or
    n00 = n ⇒ P_e = 1, kappa divides by zero — Spark NaN vs DuckDB
    error) is excluded by a WHERE guard spelled identically in both
    engines; those are the ONLY marginals with P_e = 1 (pa+pb = 2·pa·pb
    forces pa = pb ∈ {0,1}).

    Scale shape: row-local CASE votes; ONE conditional aggregate over
    the corpus; the kappa algebra runs on a single row."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("kappa_docs")
    sql = (_KAPPA_SQL
           .replace("FROM documents WHERE n_chars > 0", "FROM kappa_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_quota_sample — largest-remainder proportional sampling to a budget
# --------------------------------------------------------------------------

_QUOTA_BUDGET = 120

_QUOTA_SQL = f"""
WITH per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM per),
base AS (
    SELECT p.source, p.n_docs,
           CAST({_QUOTA_BUDGET} * p.n_docs // t.n AS BIGINT) AS floor_q,
           CAST({_QUOTA_BUDGET} * p.n_docs % t.n AS BIGINT) AS rem
    FROM per p, tot t
),
alloc AS (
    SELECT source, n_docs, floor_q, rem,
           CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT)
               AS rrank,
           CAST({_QUOTA_BUDGET} - SUM(floor_q) OVER () AS BIGINT)
               AS n_extra
    FROM base
),
quota AS (
    SELECT source, n_docs,
           CAST(floor_q + CASE WHEN rrank <= n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM alloc
),
ranked AS (
    SELECT source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
SELECT q.source, q.n_docs, q.quota,
       CAST(COUNT(CASE WHEN r.rn <= q.quota THEN 1 END) AS BIGINT)
           AS n_kept
FROM ranked r JOIN quota q ON r.source = q.source
GROUP BY q.source, q.n_docs, q.quota
"""


@register("ext_quota_sample", oracle=_QUOTA_SQL,
          tags=("ext", "curation", "sampling"))
def ext_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional quota sampling to a FIXED budget ({b} docs) with
    largest-remainder (Hamilton) apportionment — the exact integer
    answer to "sample exactly B documents, proportional to source mass":
    floor quotas first, then the leftover seats go to the largest
    fractional remainders (deterministic tie-break on source), so
    quotas sum to B exactly — no rounding drift, no over/under-sampling,
    the property a naive per-source round() cannot give. Selection
    within a source is the md5-rank discipline (`ext_domain_cap`), so
    the kept set is reproducible across engines, runs, and partitions.

    Scale shape: source-mass reduce, apportionment windows over
    \\|sources\\| rows, then one per-source rank window bounded by source
    size (for mega-sources the same contract lowers to the hash-rank
    threshold estimate, as `ext_domain_cap` documents)."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
           .localCheckpoint(eager=False))   # feeds total + apportionment
    tot = per.agg(F.sum("n_docs").cast("long").alias("n"))
    base = (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.expr(f"cast({_QUOTA_BUDGET} * n_docs div n"
                           " as bigint)").alias("floor_q"),
                    F.expr(f"cast({_QUOTA_BUDGET} * n_docs % n"
                           " as bigint)").alias("rem")))
    wr = Window.orderBy(F.col("rem").desc(), "source")
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    alloc = base.select(
        "source", "n_docs", "floor_q", "rem",
        F.row_number().over(wr).cast("long").alias("rrank"),
        (F.lit(_QUOTA_BUDGET) - F.sum("floor_q").over(wall)).cast("long")
        .alias("n_extra"))
    quota = alloc.select(
        "source", "n_docs",
        (F.col("floor_q") + F.when(F.col("rrank") <= F.col("n_extra"), 1)
         .otherwise(0)).cast("long").alias("quota"))
    wsrc = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.select("source", F.row_number().over(wsrc).alias("rn"))
    return (ranked.join(F.broadcast(quota), "source")
            .groupBy("source", "n_docs", "quota")
            .agg(F.count_if(F.col("rn") <= F.col("quota")).cast("long")
                 .alias("n_kept")))


ext_quota_sample.__doc__ = ext_quota_sample.__doc__.format(b=_QUOTA_BUDGET)


# --------------------------------------------------------------------------
# ext_gmm_em_step — one EM step of a 2-component length mixture
# --------------------------------------------------------------------------

#: fixed starting parameters (shared literals): two equal-weight
#: components with a common spread — the "short boilerplate vs long
#: article" length mixture.
_GMM_MU1, _GMM_MU2, _GMM_SIGMA = 300, 1500, 400

#: one body shared verbatim by both engines ({src} = documents view).
_GMM_BODY = f"""
WITH r AS (
    SELECT n_chars,
           CAST(FLOOR(1e0 / (1e0 + exp(
               ((n_chars - {_GMM_MU1}) * 1e0 * (n_chars - {_GMM_MU1})
                - (n_chars - {_GMM_MU2}) * 1e0 * (n_chars - {_GMM_MU2}))
               / (2e0 * {_GMM_SIGMA} * {_GMM_SIGMA}))) * 1e6 + 5e-1)
                AS BIGINT) AS r1_micro
    FROM {{src}} WHERE n_chars > 0
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(r1_micro) AS BIGINT) AS s1,
           CAST(SUM(CAST(FLOOR(r1_micro * 1e-6 * n_chars * 1e3 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS sx1,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sx
    FROM r
)
SELECT 1 AS component, s1 AS n_eff_micro,
       CAST(FLOOR(CAST(sx1 AS DOUBLE) / 1e3 / (s1 / 1e6) * 1e3 + 5e-1)
            AS BIGINT) AS mu_new_milli,
       CAST(FLOOR(s1 / 1e6 / n * 1e6 + 5e-1) AS BIGINT) AS pi_new_micro
FROM m WHERE s1 > 0
UNION ALL
SELECT 2 AS component, n * 1000000 - s1 AS n_eff_micro,
       CAST(FLOOR((sx - CAST(sx1 AS DOUBLE) / 1e3)
                  / (n - s1 / 1e6) * 1e3 + 5e-1) AS BIGINT)
           AS mu_new_milli,
       CAST(FLOOR((n - s1 / 1e6) / n * 1e6 + 5e-1) AS BIGINT)
           AS pi_new_micro
FROM m WHERE n * 1000000 - s1 > 0
"""


@register("ext_gmm_em_step", oracle=_GMM_BODY.format(src="documents"),
          tags=("ext", "curation", "iterative"))
def ext_gmm_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM step of a two-component Gaussian mixture over document
    length — the third member of the distributed iterative-algorithm
    family (`ext_kmeans_update_step` hard assignments,
    `ext_logreg_train_step` gradients; this is SOFT assignments):
    responsibilities via the logistic form of the two-Gaussian posterior
    (the common spread cancels the normalizers), then the weighted
    M-step means and mixture weights. Curation fits exactly this to
    decide where 'short boilerplate' ends and 'long article' begins
    instead of hand-picking a length threshold.

    Determinism: responsibilities are micro-quantized per row BEFORE any
    sum (the portable.py discipline; micro not nano so the corpus-scaled
    responsibility sum holds int64 to ~9.2e12 docs instead of wrapping
    near 9.2e9), the weighted length sum milli-quantizes each term
    (per-term ≤ 2e6, safe to ~4.6e12 docs), so all cross-row reduces are
    exact integers in any order; the closing divisions are fixed-order
    doubles in one shared SQL body, and WHERE guards drop a component
    that captured zero mass (its mean is undefined — the Spark-NaN vs
    DuckDB-error divide-by-zero class). The driver loop (iterate until mu moves < eps)
    re-invokes with updated literals — each step is this one corpus
    pass.

    Scale shape: ONE map-side-combinable aggregate over the scan — no
    joins, no windows, no shuffle beyond the 1-row reduce."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gmm_docs")
    return spark.sql(_GMM_BODY.format(src="gmm_docs"))


# --------------------------------------------------------------------------
# ext_mann_whitney_u — rank-sum test for a distribution shift between cohorts
# --------------------------------------------------------------------------

#: one body shared verbatim by both engines ({src} = documents view).
#: Rank algebra stays in exact integers: per distinct length value the
#: doubled average rank is 2*cum_before + c + 1 (an integer), so the
#: doubled rank-sum R2 and doubled U-statistic are exact int64 sums in
#: any order; only the closing z-score is a fixed-order double.
_MWU_BODY = """
WITH v AS (
    SELECT n_chars,
           CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca
    FROM {src} GROUP BY n_chars
),
r AS (
    SELECT n_chars, c, ca,
           CAST(COALESCE(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
    FROM v
),
s AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
           CAST(SUM(c - ca) AS BIGINT) AS n_b,
           CAST(SUM(ca * (2 * cum + c + 1)) AS BIGINT) AS ra2,
           CAST(SUM(c * c * c - c) AS BIGINT) AS ties
    FROM r
)
SELECT n_a, n_b, ra2 - n_a * (n_a + 1) AS u2,
       CAST(FLOOR(((ra2 - n_a * (n_a + 1)) / 2e0 - n_a * 1e0 * n_b / 2e0)
            / sqrt(n_a * 1e0 * n_b / 12e0 * ((n_a + n_b + 1e0)
               - ties * 1e0 / ((n_a + n_b) * 1e0 * (n_a + n_b - 1e0))))
            * 1e3 + 5e-1) AS BIGINT) AS z_milli
FROM s
WHERE n_a > 0 AND n_b > 0
"""


@register("ext_mann_whitney_u", oracle=_MWU_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Wilcoxon 1945/47): does the
    English cohort's document-length distribution differ from the rest of
    the corpus? The non-parametric sibling of `agg_welch_ttest` — curation
    teams reach for it when length/quality distributions are skewed enough
    that mean-based tests mislead (which corpus length always is). Ties
    are handled by midranks with the standard tie-corrected variance.

    Determinism: ranks never materialize per row — the grouped-by-value
    form keeps every intermediate (doubled midranks, doubled U, tie term
    t^3 - t) an exact int64 sum valid in any order; the z-score is one
    fixed-order IEEE expression, milli-quantized.

    Scale shape: one groupBy(value) reduce (map-side combinable), a
    window over DISTINCT VALUES (bounded by value cardinality, not rows),
    and a 1-row reduce. No per-row ranking shuffle. Bounded-domain
    assumption, stated as the bound: that midrank window is ONE task
    sized by the value DOMAIN (~6e7 cells for cent-quantized money),
    not by rows; past that ceiling swap in
    `ext_token_weighted_resample`'s range-bucketed two-level prefix sum
    (per-bucket partial windows + broadcast bucket offsets) at the
    cumulative step."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mwu_docs")
    return spark.sql(_MWU_BODY.format(src="mwu_docs"))


# --------------------------------------------------------------------------
# ext_kendall_tau — tau-b rank correlation between two source metrics
# --------------------------------------------------------------------------

#: shared body: per (lang, source) the two metrics (total chars, doc
#: count) are exact integers; the pair table is a per-lang self-join over
#: the bounded source dimension (~20 rows/lang), so concordance counting
#: is integer-exact and the closing tau-b is one fixed-order double.
_KENDALL_BODY = """
WITH m AS (
    SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM {src} GROUP BY lang, source
),
p AS (
    SELECT a.lang,
           CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
           CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
           CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
           CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
    FROM m a JOIN m b ON a.lang = b.lang AND a.source < b.source
),
s AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(SUM(conc) AS BIGINT) AS nc, CAST(SUM(disc) AS BIGINT) AS nd,
           CAST(SUM(tx) AS BIGINT) AS t1, CAST(SUM(ty) AS BIGINT) AS t2
    FROM p GROUP BY lang
)
SELECT lang, n0 AS n_pairs, nc AS n_conc, nd AS n_disc,
       CAST(FLOOR((nc - nd) * 1e0
            / sqrt((n0 - t1) * 1e0 * (n0 - t2)) * 1e3 + 5e-1)
            AS BIGINT) AS tau_milli
FROM s
WHERE n0 > t1 AND n0 > t2
"""


@register("ext_kendall_tau", oracle=_KENDALL_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation (Kendall 1938) per language: do
    sources that contribute more TEXT also contribute more DOCUMENTS?
    Completes the rank-correlation pair with `agg_spearman_rank` — tau's
    pairwise-concordance form is the one analysts quote when the item
    count is small and ties are common (tau-b's denominator corrects for
    both). Disagreement between the two metrics' rankings flags sources
    whose doc-length profile is anomalous.

    Determinism: both metrics are exact integer aggregates; concordant /
    discordant / tied pair counts are integer sums over an equi-joined
    pair table; tau-b is one fixed-order IEEE expression, milli-quantized.
    Languages where either metric is fully tied are excluded (the tau-b
    denominator would be 0) — spelled identically in both engines.

    Scale shape: the self-join runs on the AGGREGATED (lang, source)
    dimension (|langs| x |sources| rows, corpus-size-independent), never
    on documents; the corpus pass is one map-side-combinable groupBy."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kendall_docs")
    return spark.sql(_KENDALL_BODY.format(src="kendall_docs"))


# --------------------------------------------------------------------------
# ext_fleiss_kappa — multi-rater agreement over three deterministic rules
# --------------------------------------------------------------------------

#: shared body ({src} = non-empty documents view). Three binary raters
#: vote per document; with n=3 raters and 2 categories the per-item
#: agreement P_i = (v^2 + (3-v)^2 - 3) / 6 has an INTEGER numerator in
#: {2, 6}, so the corpus reduces to three exact int64 sums (N, sum v,
#: sum of numerators) and every float op below is one fixed-order
#: closing expression.
_FLEISS_SQL = """
WITH v AS (
    SELECT (CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END
          + CASE WHEN n_digit * 1000 < n_chars * 120 THEN 1 ELSE 0 END
          + CASE WHEN n_space * 1000 >= n_chars * 100 THEN 1 ELSE 0 END)
          AS k
    FROM (SELECT n_chars,
                 CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                 CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS n_space
          FROM documents WHERE n_chars > 0)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sv,
           CAST(SUM(k * k + (3 - k) * (3 - k)) AS BIGINT) AS sq
    FROM v
)
SELECT n,
       CAST(FLOOR(sv * 1e0 / (3e0 * n) * 1e6 + 5e-1) AS BIGINT)
           AS p1_micro,
       CAST(FLOOR((sq - 3 * n) * 1e0 / (6e0 * n) * 1e6 + 5e-1) AS BIGINT)
           AS pbar_micro,
       CAST(FLOOR((sv * 1e0 / (3e0 * n) * (sv * 1e0 / (3e0 * n))
                   + (1e0 - sv * 1e0 / (3e0 * n))
                     * (1e0 - sv * 1e0 / (3e0 * n))) * 1e6 + 5e-1)
            AS BIGINT) AS pe_micro,
       CAST(FLOOR(((sq - 3 * n) * 1e0 / (6e0 * n)
                   - (sv * 1e0 / (3e0 * n) * (sv * 1e0 / (3e0 * n))
                      + (1e0 - sv * 1e0 / (3e0 * n))
                        * (1e0 - sv * 1e0 / (3e0 * n))))
                  / (1e0 - (sv * 1e0 / (3e0 * n) * (sv * 1e0 / (3e0 * n))
                            + (1e0 - sv * 1e0 / (3e0 * n))
                              * (1e0 - sv * 1e0 / (3e0 * n))))
                  * 1e6 + 5e-1) AS BIGINT) AS kappa_micro
FROM m
WHERE sv > 0 AND sv < 3 * n
"""


@register("ext_fleiss_kappa", oracle=_FLEISS_SQL,
          tags=("ext", "curation", "eval"))
def ext_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) across THREE deterministic binary
    raters — the multi-rater generalization of `ext_annotator_kappa`
    (which is limited to two judges): a length rule, a digit-density
    rule, and a whitespace-density rule each vote "natural text" per
    document, and kappa measures their chance-corrected consensus. With
    human or LLM judge columns the query is unchanged; three cheap
    heuristic raters is exactly how weak-supervision label models are
    audited before training a quality classifier
    (cf. `ext_weak_supervision_matrix`).

    Determinism: with n=3 raters, 2 categories, the per-item agreement
    P_i = (v² + (3−v)² − 3)/6 has an integer numerator, so the corpus
    reduces to THREE exact int64 sums; P̄, P̄ₑ and kappa are fixed-order
    IEEE expressions over those integers (subexpressions repeated
    verbatim so both engines fold identically), micro-quantized. The
    unanimous-corpus degenerate case (sv = 0 or sv = 3n ⇒ P̄ₑ = 1 and
    the kappa close divides by zero — Spark NaN vs DuckDB error) is
    excluded by a WHERE guard spelled identically in both engines,
    matching `ext_kendall_tau` / `agg_anova_oneway`.

    Scale shape: row-local CASE votes, ONE map-side-combinable
    aggregate, 1-row close. The best possible shape at 100 TB."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("fleiss_docs")
    sql = (_FLEISS_SQL
           .replace("FROM documents WHERE n_chars > 0", "FROM fleiss_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_cramers_v — effect size of the flag x status association
# --------------------------------------------------------------------------

#: shared body ({src} = lineitem view). Same quantize-each-term-then-
#: integer-sum discipline as `ext_chi2_independence`, PLUS the empty
#: cells of the grid: their chi-square mass is rc/n each, and
#: sum over empty cells of rc/n = n - sum over OBSERVED cells of rc/n
#: (because the full grid's expected counts sum to n) — so the zero
#: cells contribute in closed form with no grid-completion join. The
#: three effect sizes are fixed-order doubles over the integer
#: chi2_micro.
_CRAMERS_SQL = """
WITH o AS (
    SELECT l_returnflag AS f, l_linestatus AS s,
           CAST(COUNT(*) AS BIGINT) AS obs
    FROM {src} GROUP BY 1, 2
),
m AS (
    SELECT f, s, obs,
           SUM(obs) OVER (PARTITION BY f) AS r,
           SUM(obs) OVER (PARTITION BY s) AS c,
           SUM(obs) OVER ()               AS n
    FROM o
),
t AS (
    SELECT CAST(SUM(CAST(FLOOR((CAST(n AS DOUBLE) * obs
                                - CAST(r AS DOUBLE) * c)
                               * (CAST(n AS DOUBLE) * obs
                                  - CAST(r AS DOUBLE) * c)
                               / (CAST(n AS DOUBLE) * r * c) * 1e6 + 5e-1)
                         AS BIGINT))
                + MAX(n) * 1000000
                - SUM(CAST(FLOOR(CAST(r AS DOUBLE) * c / n * 1e6 + 5e-1)
                           AS BIGINT)) AS BIGINT) AS chi2_micro,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS rr,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS cc
    FROM m
)
SELECT n, rr AS n_flag_levels, cc AS n_status_levels, chi2_micro,
       CAST((rr - 1) * (cc - 1) AS BIGINT) AS dof,
       CAST(FLOOR(chi2_micro / 1e6 / n * 1e9 + 5e-1) AS BIGINT)
           AS phi2_nano,
       CAST(FLOOR(sqrt(chi2_micro / 1e6
                       / (n * 1e0 * LEAST(rr - 1, cc - 1))) * 1e6 + 5e-1)
            AS BIGINT) AS v_micro,
       CAST(FLOOR(sqrt(chi2_micro / 1e6 / (chi2_micro / 1e6 + n))
                  * 1e6 + 5e-1) AS BIGINT) AS c_micro
FROM t
"""


@register("ext_cramers_v", oracle=_CRAMERS_SQL.format(src="lineitem"),
          tags=("ext", "curation", "stats"))
def ext_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V, mean-square contingency φ², and Pearson's contingency
    coefficient C for the returnflag × linestatus table — the EFFECT-SIZE
    companion to `ext_chi2_independence`: at corpus scale chi-square is
    always "significant", so the number analysts actually act on is V
    (0 = independent, 1 = perfectly associated), which is scale-free in
    the row count. Emits all three normalizations plus dof on one row.

    Determinism: each chi-square term is micro-quantized BEFORE the
    integer sum (the `ext_chi2_independence` discipline); V, φ², C are
    fixed-order IEEE closes over the integer chi2_micro — sqrt is
    IEEE-correctly-rounded on both engines.

    Scale shape: one groupBy over the (few × few) category grid, window
    sums over that grid, 1-row close. Corpus-size-independent after the
    first reduce."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("cramers_li")
    return spark.sql(_CRAMERS_SQL.format(src="cramers_li"))


# --------------------------------------------------------------------------
# ext_fdr_bh — Benjamini-Hochberg step-up over per-source mean-shift tests
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per source, the statistic is a
#: two-proportion z-test on the share of long documents (n_chars >= 300,
#: the corpus median) vs the REST of the corpus — pure integer counting,
#: so unlike a moments-based Welch z the pooled variance p(1-p) can
#: never quantize negative (a near-constant source made the one-pass
#: variance identity go negative under quantized squares: Spark yields
#: NaN but DuckDB ERRORS on sqrt(<0), measured on planted data). The
#: rest-cohort counts are corpus totals minus the source's own, via
#: window sums over the bounded source dimension; p-values are the
#: distribution-free sub-Gaussian tail bound 2*exp(-z^2/2) computed
#: from the ALREADY-QUANTIZED z_milli so both engines exponentiate the
#: identical double.
_FDR_SQL = """
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS a
    FROM {src} GROUP BY source
),
w AS (
    SELECT source, n, a,
           CAST(SUM(n) OVER () AS BIGINT) AS tn,
           CAST(SUM(a) OVER () AS BIGINT) AS ta
    FROM g
),
zq AS (
    SELECT source, n,
           CAST(FLOOR((CAST(a AS DOUBLE) / n
                       - CAST(ta - a AS DOUBLE) / (tn - n))
                      / sqrt(CAST(ta AS DOUBLE) / tn
                             * (1e0 - CAST(ta AS DOUBLE) / tn)
                             * (1e0 / n + 1e0 / (tn - n)))
                      * 1e3 + 5e-1) AS BIGINT) AS z_milli
    FROM w WHERE n > 0 AND tn - n > 0 AND ta > 0 AND tn - ta > 0
),
pv AS (
    SELECT source, n, z_milli,
           CAST(FLOOR(LEAST(1e0, 2e0 * EXP(-(z_milli / 1e3)
                            * (z_milli / 1e3) / 2e0)) * 1e6 + 5e-1)
                AS BIGINT) AS p_micro
    FROM zq
),
r AS (
    SELECT source, n, z_milli, p_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY p_micro, source) AS BIGINT)
               AS prank,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM pv
),
k AS (
    SELECT source, n, z_milli, p_micro, prank,
           CAST(FLOOR(prank * 5e4 / m) AS BIGINT) AS crit_micro
    FROM r
)
SELECT source, n, z_milli, p_micro, prank, crit_micro,
       CASE WHEN prank <= MAX(CASE WHEN p_micro <= crit_micro
                              THEN prank ELSE 0 END) OVER ()
            THEN 1 ELSE 0 END AS rejected
FROM k
"""


@register("ext_fdr_bh", oracle=_FDR_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control (Benjamini &
    Hochberg 1995, alpha = 0.05) over the family of per-source
    length-profile shift tests: every source's share of long documents
    (n_chars ≥ 300, the corpus median) is two-proportion-z-tested
    against the rest of the corpus, and BH's step-up rule decides which
    shifts survive multiple-testing correction. This is the missing
    piece over the drift battery (KS/JS/PSI/chi²/Welch test ONE
    comparison; a 100 TB corpus has hundreds of sources and testing
    them all at alpha=0.05 uncorrected manufactures false alarms).

    The proportion statistic is deliberate: it is pure integer counting,
    so the pooled variance p̄(1−p̄) can never quantize negative — a
    moments-based Welch z under quantized squares went negative for a
    near-constant-length source, where Spark yields NaN but DuckDB
    ERRORS on sqrt(<0) (caught on planted data, the
    `ext_stylometry_delta` variance-guard lesson). p-values use the
    distribution-free sub-Gaussian tail bound 2·exp(−z²/2) —
    conservative, so BH's FDR guarantee is preserved — computed from
    the already-quantized z_milli so both engines exponentiate the
    identical IEEE double. The step-up cutoff (largest rank with
    p ≤ rank·alpha/m, then reject ALL smaller ranks) is one window max
    over the report.

    Scale shape: ONE map-side-combinable groupBy(source) of pure
    counts; everything after runs on the bounded source dimension."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fdr_docs")
    return spark.sql(_FDR_SQL.format(src="fdr_docs"))


# --------------------------------------------------------------------------
# ext_keyword_textrank — graph-centrality keyword extraction
# --------------------------------------------------------------------------

_TR_VOCAB = 60     #: graph nodes: top-V corpus words by frequency
_TR_TOPK = 15      #: keywords reported


@register(
    "ext_keyword_textrank",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
                WHERE tok <> '' GROUP BY tok),
        vocab AS (SELECT tok FROM uni ORDER BY c DESC, tok
                  LIMIT {_TR_VOCAB}),
        bg AS (
            SELECT w[i] AS w1, w[i+1] AS w2
            FROM (SELECT w, unnest(range(1, greatest(len(w), 1))) AS i
                  FROM (SELECT list_filter(string_split(lower(text), ' '),
                                           x -> x <> '') AS w
                        FROM documents))
        ),
        ed0 AS (
            SELECT b.w1, b.w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg b JOIN vocab v1 ON b.w1 = v1.tok
                      JOIN vocab v2 ON b.w2 = v2.tok
            WHERE b.w1 <> b.w2
            GROUP BY b.w1, b.w2
        ),
        edges AS (
            SELECT w1 AS src, w2 AS dst, c12 AS w FROM ed0
            UNION ALL
            SELECT w2, w1, c12 FROM ed0
        ),
        wdeg AS (SELECT src AS tok, CAST(SUM(w) AS BIGINT) AS wd
                 FROM edges GROUP BY src),
        nsc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wdeg),
        r0 AS (SELECT tok, 1e0 / n AS r FROM wdeg, nsc),
        it1 AS (
            SELECT e.dst AS tok,
                   1.5e-1 / nsc.n + 8.5e-1 *
                   (CAST(SUM(CAST(FLOOR(p.r * e.w / d.wd * 1e12 + 5e-1)
                                  AS BIGINT)) AS BIGINT) / 1e12) AS r
            FROM edges e JOIN wdeg d ON e.src = d.tok
                         JOIN r0 p ON e.src = p.tok
            CROSS JOIN nsc GROUP BY e.dst, nsc.n
        ),
        it2 AS (
            SELECT e.dst AS tok,
                   1.5e-1 / nsc.n + 8.5e-1 *
                   (CAST(SUM(CAST(FLOOR(p.r * e.w / d.wd * 1e12 + 5e-1)
                                  AS BIGINT)) AS BIGINT) / 1e12) AS r
            FROM edges e JOIN wdeg d ON e.src = d.tok
                         JOIN it1 p ON e.src = p.tok
            CROSS JOIN nsc GROUP BY e.dst, nsc.n
        )
        SELECT i.tok AS keyword, d.wd AS weighted_degree,
               CAST(FLOOR(i.r * 1e9 + 5e-1) AS BIGINT) AS rank_nano
        FROM it2 i JOIN wdeg d ON i.tok = d.tok
        ORDER BY CAST(FLOOR(i.r * 1e9 + 5e-1) AS BIGINT) DESC, i.tok
        LIMIT {_TR_TOPK}
    """,
    tags=("ext", "text", "graph", "iterative"),
)
def ext_keyword_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): two damped
    power iterations (d = 0.85) of weighted PageRank over the word
    co-occurrence graph — nodes are the top-60 corpus words, edges are
    adjacent co-occurrences between vocabulary words, weights are
    co-occurrence counts. Where `ext_pmi_collocations` surfaces PAIRS
    that stick together, TextRank surfaces the WORDS that sit at the
    center of the co-occurrence topology — the unsupervised keyword
    signal feeding dataset cards and topic drift review; the same
    machinery as `ext_pagerank_iter` but over the word graph with edge
    weights.

    Determinism: per-edge contributions r·w/wdeg are quantized to
    pico units BEFORE each iteration's sum (the `ext_pagerank_iter`
    discipline), so both engines accumulate identical integers in any
    order; vocabulary selection and the final top-k use total-order
    tie-breaks.

    Scale shape: one token count (map-side combinable), a bounded
    60-row vocabulary BROADCAST against the bigram stream (the corpus
    never self-joins), edges bounded by vocab² regardless of corpus size,
    and each iteration is one groupBy over that bounded edge list."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(F.split(F.lower("text"), " "))
                        .alias("tok"))
            .where(F.col("tok") != ""))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vocab = (uni.orderBy(F.col("c").desc(), "tok").limit(_TR_VOCAB)
             .select("tok")
             # two broadcast consumers (v1, v2): materialize the 60-row
             # vocabulary once instead of re-running the corpus token
             # count per broadcast side
             .localCheckpoint(eager=True))
    w = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    bg = docs.select(w.alias("warr")).select(
        F.explode(F.expr(
            "CASE WHEN size(warr) >= 2 THEN "
            "transform(sequence(0, size(warr) - 2), "
            "i -> struct(warr[i] AS w1, warr[i+1] AS w2)) "
            "ELSE array() END")).alias("p")).select("p.w1", "p.w2")
    v1 = vocab.select(F.col("tok").alias("w1"))
    v2 = vocab.select(F.col("tok").alias("w2"))
    ed0 = (bg.join(F.broadcast(v1), "w1").join(F.broadcast(v2), "w2")
           .where(F.col("w1") != F.col("w2"))
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long")
                                    .alias("c12")))
    edges = (ed0.select(F.col("w1").alias("src"), F.col("w2").alias("dst"),
                        F.col("c12").alias("w"))
             .unionAll(ed0.select(F.col("w2").alias("src"),
                                  F.col("w1").alias("dst"),
                                  F.col("c12").alias("w")))
             # three consumers (wdeg, it1, it2) over a bounded edge list
             .localCheckpoint(eager=True))
    wdeg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wd")) \
        .withColumnRenamed("src", "tok")
    nsc = wdeg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    r0 = wdeg.crossJoin(F.broadcast(nsc)).select(
        "tok", (F.lit(1e0) / F.col("n")).alias("r"))

    def _iterate(prev: DataFrame) -> DataFrame:
        contrib = F.floor(F.col("r") * F.col("w") / F.col("wd")
                          * F.lit(1e12) + F.lit(0.5)).cast("long")
        return (edges
                .join(F.broadcast(wdeg.withColumnRenamed("tok", "src")),
                      "src")
                .join(F.broadcast(prev.withColumnRenamed("tok", "src")),
                      "src")
                .crossJoin(F.broadcast(nsc))
                .groupBy(F.col("dst").alias("tok"), "n")
                .agg(F.sum(contrib).cast("long").alias("sq"))
                .select("tok", (F.lit(1.5e-1) / F.col("n")
                                + F.lit(8.5e-1)
                                * (F.col("sq") / F.lit(1e12))).alias("r")))

    it2 = _iterate(_iterate(r0))
    rank_q = F.floor(F.col("r") * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (it2.join(F.broadcast(wdeg), "tok")
            .orderBy(rank_q.desc(), "tok").limit(_TR_TOPK)
            .select(F.col("tok").alias("keyword"),
                    F.col("wd").alias("weighted_degree"),
                    rank_q.alias("rank_nano")))


# --------------------------------------------------------------------------
# ext_conformal_interval — split-conformal prediction band + coverage audit
# --------------------------------------------------------------------------

#: shared body ({src} = documents view, {bucket} = engine-specific
#: md5 bucket expression over doc_id). Calibration = buckets < 500,
#: evaluation = the rest; the predictor is the per-source calibration
#: mean in exact milli-chars; the conformal quantile is the
#: ceil((n+1)·0.9)-th smallest absolute residual — an exact order
#: statistic, so the band is integer-exact end to end.
_CONFORMAL_SQL = """
WITH b AS (
    SELECT source, n_chars, {bucket} AS bucket FROM {src}
),
cal AS (SELECT source, n_chars FROM b WHERE bucket < 500),
ev  AS (SELECT source, n_chars FROM b WHERE bucket >= 500),
fit AS (
    SELECT source,
           CAST(FLOOR((2000 * SUM(n_chars) + COUNT(*))
                      / (2e0 * COUNT(*))) AS BIGINT) AS mean_milli
    FROM cal GROUP BY source
),
res AS (
    SELECT ABS(c.n_chars * 1000 - f.mean_milli) AS r_milli
    FROM cal c JOIN fit f ON c.source = f.source
),
rr AS (
    SELECT r_milli, ROW_NUMBER() OVER (ORDER BY r_milli) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM res
),
q AS (
    SELECT MAX(n) AS n_cal,
           MAX(CASE WHEN rn = CAST(LEAST(FLOOR(((n + 1) * 9 + 9) / 1e1), n)
                                   AS BIGINT)
                    THEN r_milli END) AS q_milli
    FROM rr
)
SELECT e.source,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       MAX(q.n_cal) AS n_cal,
       MAX(q.q_milli) AS q_milli,
       CAST(SUM(CASE WHEN ABS(e.n_chars * 1000 - f.mean_milli)
                          <= q.q_milli THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered,
       CAST(FLOOR(SUM(CASE WHEN ABS(e.n_chars * 1000 - f.mean_milli)
                                <= q.q_milli THEN 1 ELSE 0 END) * 1e6
                  / COUNT(*) + 5e-1) AS BIGINT) AS coverage_micro
FROM ev e JOIN fit f ON e.source = f.source CROSS JOIN q
GROUP BY e.source
"""


@register("ext_conformal_interval",
          oracle=_CONFORMAL_SQL.format(
              src="documents",
              bucket=_sc.BUCKET_SQL),
          tags=("ext", "curation", "stats", "eval"))
def ext_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Papadopoulos et al. 2002;
    Vovk 2005) with a coverage audit: fit a baseline predictor (the
    per-source mean length) on the calibration half of the md5-bucket
    split, take the ceil((n+1)·0.9)-th smallest absolute residual as
    the distribution-free 90% band half-width, then measure EMPIRICAL
    per-source coverage on the held-out half. Conformal bands are the
    assumption-free uncertainty quantification a data-quality SLA wants
    ("flag any document whose length is outside the 90% band for its
    source") — the guarantee holds for ANY predictor, so swapping the
    mean for a learned model leaves the query unchanged. Per-source
    coverage far from 90% localizes drift the global band hides.

    Determinism: the md5-bucket split is the `ext_sample_split`
    convention (deterministic across engines/layouts/runs); the
    predictor mean is exact round-half-up milli-chars; residuals are
    pure int64; the conformal quantile is an exact order statistic,
    capped at the largest residual when ceil((n+1)·0.9) > n (the
    tiny-calibration edge where the strict guarantee needs an infinite
    band).

    Scale shape: one groupBy(source) fit (map-side combinable), a
    broadcast-sized fit join, ONE global order statistic over
    calibration residuals (rank via a single ordered window — at 100 TB
    this becomes approx_percentile or a two-pass select), and a
    per-source coverage reduce."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("conformal_docs")
    return spark.sql(_CONFORMAL_SQL.format(src="conformal_docs",
                                           bucket=_sc.BUCKET_SQL_SPARK))


# --------------------------------------------------------------------------
# ext_simpson_diversity — language-diversity indices per source
# --------------------------------------------------------------------------

_SIMPSON_SQL = """
WITH c AS (
    SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY source, lang
),
s AS (
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(SUM(n * (n - 1)) AS BIGINT) AS pair_mass,
           CAST(MAX(n) AS BIGINT) AS n_top
    FROM c GROUP BY source
)
SELECT source, n_docs, n_langs,
       CAST(FLOOR((1e0 - pair_mass * 1e0 / (n_docs * 1e0 * (n_docs - 1)))
                  * 1e6 + 5e-1) AS BIGINT) AS simpson_micro,
       CAST(FLOOR(n_docs * 1e0 * (n_docs - 1) / pair_mass * 1e3 + 5e-1)
            AS BIGINT) AS inv_simpson_milli,
       CAST(FLOOR(n_top * 1e6 / n_docs) AS BIGINT)
           AS berger_parker_micro
FROM s
WHERE n_docs > 1 AND pair_mass > 0
"""


@register("ext_simpson_diversity",
          oracle=_SIMPSON_SQL.format(src="documents"),
          tags=("ext", "curation", "diversity"))
def ext_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-diversity indices per source: Simpson's D (Simpson 1949
    — the probability two random docs differ in language, unbiased
    small-sample form n(n−1)), its inverse (the effective number of
    equally-common languages), and Berger-Parker dominance (share of
    the top language). The ecology toolkit applied to corpus mixing:
    `ext_gini_concentration` measures inequality and
    `ext_corpus_entropy` measures bits, but inverse-Simpson is the
    number mixing dashboards quote ("this crawl behaves like 2.4
    languages"). Fully-monolingual sources (pair_mass = n(n−1)) pass
    through; degenerate single-doc sources are excluded identically on
    both engines.

    Determinism: all three indices close over exact int64 counts in
    fixed-order IEEE expressions; Berger-Parker uses pure integer
    floor division.

    Scale shape: ONE map-side-combinable groupBy(source, lang) over the
    corpus, then a census on the bounded source x lang grid."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("simpson_docs")
    return spark.sql(_SIMPSON_SQL.format(src="simpson_docs"))


# --------------------------------------------------------------------------
# ext_kanonymity_census — k-anonymity / l-diversity census over QI groups
# --------------------------------------------------------------------------

_KANON_SQL = """
WITH g AS (
    SELECT lang, source, CAST(FLOOR(n_chars / 1e2) AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS grp_n,
           CAST(COUNT(DISTINCT n_chars % 10) AS BIGINT) AS l_div
    FROM {src} GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(SUM(grp_n) AS BIGINT) AS n FROM g),
ks AS (SELECT 2 AS k UNION ALL SELECT 5 UNION ALL SELECT 10)
SELECT k.k,
       CAST(SUM(CASE WHEN g.grp_n < k.k THEN g.grp_n ELSE 0 END)
            AS BIGINT) AS n_violating_rows,
       CAST(SUM(CASE WHEN g.grp_n < k.k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_groups,
       CAST(FLOOR(SUM(CASE WHEN g.grp_n < k.k THEN g.grp_n ELSE 0 END)
                  * 1e6 / MAX(t.n) + 5e-1) AS BIGINT)
           AS violating_rows_micro,
       CAST(MIN(g.grp_n) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN g.l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_low_ldiv_groups
FROM g CROSS JOIN ks k CROSS JOIN tot t
GROUP BY k.k
"""


@register("ext_kanonymity_census",
          oracle=_KANON_SQL.format(src="documents"),
          tags=("ext", "curation", "privacy"))
def ext_kanonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census (Sweeney 2002) over the quasi-identifier
    tuple (lang, source, length-bucket): for k ∈ {2, 5, 10}, how many
    rows and groups would violate k-anonymity if this corpus were
    released keyed on those attributes, plus the minimum group size and
    an l-diversity proxy (groups whose sensitive-value diversity — here
    a deterministic stand-in derived from length — is < 2). The
    data-governance audit that complements `ext_pii_redact`: redaction
    removes direct identifiers, this measures re-identification risk
    from the INDIRECT ones, and the same query re-runs after
    generalization (coarser buckets) to find the privacy/utility knee.

    Determinism: pure integer counting; the only division is one
    fixed-order micro-share close.

    Scale shape: ONE map-side-combinable groupBy onto the bounded QI
    grid; the k-census is a 3-row cross over that grid. (COUNT
    DISTINCT per group is grid-bounded, not corpus-bounded.)"""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kanon_docs")
    return spark.sql(_KANON_SQL.format(src="kanon_docs"))


# --------------------------------------------------------------------------
# ext_als_step — one ALS user-factor update for implicit-feedback MF
# --------------------------------------------------------------------------

#: shared body ({src} supplies (user_id, event_type)). Item factors are
#: FIXED integer-valued rank-2 seeds q_j = (1, j) with j the alphabetic
#: event-type index, so every normal-equation moment (Σq₁², Σq₁q₂,
#: Σq₂², Qᵀr) is an exact int64 aggregate; the ridge-regularized 2x2
#: solve is a closed-form fixed-order double expression per user.
_ALS_SQL = """
WITH r AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS r
    FROM {src} GROUP BY 1, 2
),
j AS (
    SELECT user_id, r,
           CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                ELSE 5 END AS jdx
    FROM r
),
m AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(jdx) AS BIGINT) AS s_j,
           CAST(SUM(jdx * jdx) AS BIGINT) AS s_jj,
           CAST(SUM(r) AS BIGINT) AS b1,
           CAST(SUM(r * jdx) AS BIGINT) AS b2
    FROM j GROUP BY user_id
)
SELECT user_id, n_items,
       CAST(FLOOR(((s_jj + 1e-1) * b1 - s_j * 1e0 * b2)
                  / ((n_items + 1e-1) * (s_jj + 1e-1)
                     - s_j * 1e0 * s_j) * 1e6 + 5e-1) AS BIGINT)
           AS p1_micro,
       CAST(FLOOR(((n_items + 1e-1) * b2 - s_j * 1e0 * b1)
                  / ((n_items + 1e-1) * (s_jj + 1e-1)
                     - s_j * 1e0 * s_j) * 1e6 + 5e-1) AS BIGINT)
           AS p2_micro
FROM m
"""


@register("ext_als_step", oracle=_ALS_SQL.format(src="events"),
          tags=("ext", "similarity", "iterative"))
def ext_als_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One alternating-least-squares half-step (Hu/Koren/Volinsky 2008
    shape, rank 2, ridge λ=0.1) of the user-factor update for the
    implicit-feedback user × event-type matrix: with item factors held
    fixed, every user's factor pair solves its own 2×2 ridge normal
    equations in closed form — completing the iterative-algorithm
    family (k-means assign/update, GMM EM, logistic SGD, PageRank,
    HITS, label spread, BPE merge) with matrix factorization, the
    workhorse behind collaborative filtering and learned data-mixing
    embeddings. Full ALS alternates this step with the item twin; one
    step is the verifiable unit (the `ext_kmeans_update_step`
    doctrine).

    Determinism: item factors are integer-valued literals q_j = (1, j),
    so all five per-user moments are exact int64 sums in any order; the
    closed-form solve is one fixed-order IEEE expression per component
    (subexpressions repeated verbatim), micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(user_id, event_type)
    then ONE groupBy(user_id) — no joins, no windows, no iteration-
    over-data; the per-user solve is row-local arithmetic. The best
    possible ALS-step shape: the classic implementation gathers each
    user's ratings anyway; here the 2×2 solve needs only 5 moments."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("als_events")
    return spark.sql(_ALS_SQL.format(src="als_events"))


# --------------------------------------------------------------------------
# ext_power_analysis — minimum detectable effect per source
# --------------------------------------------------------------------------

#: z-constants for alpha = 0.05 (two-sided) and power = 0.80, spelled as
#: literals in the shared text (trig/erf inverses are NOT cross-engine
#: bit-exact in this container; ln/exp/sqrt are).
_POWER_Z = "(196e-2 + 8416e-4)"

_POWER_SQL = f"""
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS a
    FROM {{src}} GROUP BY source
),
w AS (
    SELECT source, n,
           CAST(SUM(n) OVER () AS BIGINT) AS tn,
           CAST(SUM(a) OVER () AS BIGINT) AS ta
    FROM g
)
SELECT source, n,
       CAST(FLOOR({_POWER_Z}
                  * sqrt(CAST(ta AS DOUBLE) / tn
                         * (1e0 - CAST(ta AS DOUBLE) / tn)
                         * (1e0 / n + 1e0 / (tn - n)))
                  * 1e6 + 5e-1) AS BIGINT) AS mde_micro,
       CAST(FLOOR({_POWER_Z} * {_POWER_Z}
                  * 2e0 * (CAST(ta AS DOUBLE) / tn)
                  * (1e0 - CAST(ta AS DOUBLE) / tn) / (2e-2 * 2e-2)
                  + 5e-1) AS BIGINT) AS n_per_arm_for_2pct
FROM w WHERE n > 0 AND tn - n > 0 AND ta > 0 AND tn - ta > 0
"""


@register("ext_power_analysis", oracle=_POWER_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical power analysis per source: the minimum detectable
    effect (MDE) of the two-proportion shift test `ext_fdr_bh` runs —
    at alpha = 0.05 (two-sided) and 80% power — given each source's
    actual sample size against the rest of the corpus, plus the
    per-arm n required to detect a 2-point shift. This is the question
    BEFORE the test: a "no significant shift" verdict on a 200-doc
    source is close to meaningless (its MDE may be 10+ points), and
    the MDE column is what says so. The z-constants (1.96, 0.8416) are
    shared literals — inverse-normal functions are not cross-engine
    bit-exact here, fixed quantiles are.

    Scale shape: ONE map-side-combinable groupBy(source) of pure
    counts, window totals over the bounded source dimension, row-local
    closes."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("power_docs")
    return spark.sql(_POWER_SQL.format(src="power_docs"))


# --------------------------------------------------------------------------
# ext_ab_srm_check — sample-ratio-mismatch guard on the engine's own split
# --------------------------------------------------------------------------

_SRM_SQL = """
WITH b AS (
    SELECT {bucket} AS bucket FROM {src}
),
s AS (
    SELECT CASE WHEN bucket % 10 <= 7 THEN 'train'
                WHEN bucket % 10 = 8 THEN 'val' ELSE 'test' END AS split,
           CASE WHEN bucket % 10 <= 7 THEN 800 WHEN bucket % 10 = 8
                THEN 100 ELSE 100 END AS expected_permille
    FROM b
),
c AS (
    SELECT split, expected_permille, CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM s GROUP BY split, expected_permille
),
t AS (
    SELECT split, expected_permille, n_obs,
           CAST(SUM(n_obs) OVER () AS BIGINT) AS n
    FROM c
)
SELECT split, n_obs,
       CAST(FLOOR(n * expected_permille / 1e3 * 1e3 + 5e-1) AS BIGINT)
           AS expected_milli,
       CAST(FLOOR((n_obs - n * expected_permille / 1e3)
                  * (n_obs - n * expected_permille / 1e3)
                  / (n * expected_permille / 1e3) * 1e6 + 5e-1) AS BIGINT)
           AS chi2_term_micro,
       CAST(SUM(CAST(FLOOR((n_obs - n * expected_permille / 1e3)
                           * (n_obs - n * expected_permille / 1e3)
                           / (n * expected_permille / 1e3) * 1e6 + 5e-1)
                     AS BIGINT)) OVER () AS BIGINT) AS chi2_micro,
       CAST(2 AS INT) AS dof,
       CASE WHEN SUM(CAST(FLOOR((n_obs - n * expected_permille / 1e3)
                                * (n_obs - n * expected_permille / 1e3)
                                / (n * expected_permille / 1e3) * 1e6
                                + 5e-1) AS BIGINT)) OVER ()
                 > 5991465 THEN 1 ELSE 0 END AS srm_alarm
FROM t
"""


@register("ext_ab_srm_check",
          oracle=_SRM_SQL.format(src="documents", bucket=_sc.BUCKET_SQL),
          tags=("ext", "curation", "stats", "eval"))
def ext_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (the first gate of every A/B
    readout, Fabijan et al. 2019): chi-square goodness-of-fit of the
    engine's OWN md5-bucket train/val/test assignment against its
    declared 80/10/10 design, with the alarm at the chi²(2) 95% critical
    value (5.991, a shared literal). SRM is the canary for broken
    randomization — biased bucketing, dropped logs, filtered arms — and
    because this runs on the same `ext_sample_split` machinery, it is
    the engine auditing its own split fairness; with experiment arms in
    the bucket column the query is unchanged.

    Determinism: observed counts are exact integers; expected counts
    and chi-square terms are micro-quantized fixed-order doubles summed
    as integers.

    Scale shape: one row-local bucket hash + ONE map-side-combinable
    3-group reduce; the census is 3 rows."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("srm_docs")
    return spark.sql(_SRM_SQL.format(src="srm_docs",
                                     bucket=_sc.BUCKET_SQL_SPARK))


# --------------------------------------------------------------------------
# ext_lsh_scurve_design — analytic (bands, rows) optimizer for MinHash LSH
# --------------------------------------------------------------------------

_SCURVE_THRESHOLD = 0.5   #: target Jaccard threshold the design aims at
_SCURVE_CANDS = ((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))  #: (rows, bands)


def _pow_chain(expr: str, n: int) -> str:
    """x^n for power-of-two n as a literal repeated-squaring chain —
    multiplications only, so both engines evaluate identical IEEE ops
    (no POWER(), whose exp/ln lowering is not contractually pinned)."""
    while n > 1:
        expr = f"({expr} * {expr})"
        n //= 2
    return expr


def _scurve_sql() -> str:
    grid = " UNION ALL ".join(f"SELECT {k} AS k" for k in range(1, 20))
    cands = []
    for r, b in _SCURVE_CANDS:
        inner = _pow_chain("sv", r)
        p = f"(1e0 - {_pow_chain(f'(1e0 - {inner})', b)})"
        cands.append(f"""
    SELECT {r} AS r, {b} AS b, sv,
           CAST(FLOOR({p} * 1e6 + 5e-1) AS BIGINT) AS p_micro
    FROM s""")
    cand_sql = " UNION ALL ".join(cands)
    return f"""
WITH g AS ({grid}),
s AS (SELECT k / 2e1 AS sv FROM g),
p AS ({cand_sql}),
m AS (
    SELECT r, b,
           CAST(SUM(CASE WHEN sv < {_SCURVE_THRESHOLD}
                         THEN p_micro ELSE 0 END) AS BIGINT)
               AS fp_mass_micro,
           CAST(SUM(CASE WHEN sv >= {_SCURVE_THRESHOLD}
                         THEN 1000000 - p_micro ELSE 0 END) AS BIGINT)
               AS fn_mass_micro
    FROM p GROUP BY r, b
)
SELECT r AS rows_per_band, b AS n_bands, fp_mass_micro, fn_mass_micro,
       CAST(fp_mass_micro + fn_mass_micro AS BIGINT) AS total_err_micro,
       CASE WHEN fp_mass_micro + fn_mass_micro
                 = MIN(fp_mass_micro + fn_mass_micro) OVER () THEN 1
            ELSE 0 END AS is_best
FROM m
"""


@register("ext_lsh_scurve_design", oracle=_scurve_sql(),
          tags=("ext", "dedup", "design"))
def ext_lsh_scurve_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic MinHash-LSH parameter design: for every (rows-per-band,
    bands) split of the 16-permutation signature, integrate the
    collision S-curve P(s) = 1 − (1 − s^r)^b over a Jaccard grid and
    score false-positive mass (collisions below the 0.5 target) against
    false-negative mass (misses above it) — the ANALYTIC companion to
    `ext_lsh_band_sweep`, which measures the same trade-off empirically
    on the corpus: design picks (r, b) BEFORE the first shuffle, the
    sweep validates it after. The flagged minimum-total-error row is the
    recommendation the dedup flagship's banding encodes.

    Determinism: every power is a literal repeated-squaring chain
    (multiplications only — POWER()'s exp/ln lowering is not pinned by
    the cross-engine contract, products are); per-cell masses quantize
    to micro before integer sums; the whole query is one shared body
    with NO corpus input at all.

    Scale shape: a 95-row constant grid — free at any corpus size; the
    design table is the artifact you consult when resizing signatures
    at 100 TB."""
    ensure_deterministic(spark)
    return spark.sql(_scurve_sql())


# --------------------------------------------------------------------------
# agg_anova_oneway — one-way ANOVA F across all sources
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per-group moments are exact
#: int64 (per-row squares fit comfortably: n_chars² ≤ ~4e8); each
#: group's s²/n term is deci-quantized THEN integer-summed so the
#: cross-group reduction is order-independent (never a raw double SUM
#: across rows — FP addition order is not pinned across engines or
#: partitionings); SSW/SSB close in single fixed-order double
#: expressions on the 1-row reduce, with GREATEST absorbing the
#: near-constant-group round-off edge (the `ext_fdr_bh` sqrt(<0)
#: lesson, here a ratio not a sqrt). Deci (1e1), not micro: term·10 =
#: 10·n_g·mean² fits int64 through n_g ≈ 2.3e11 rows in one group
#: (≳100 TB of 2 KB docs, ~4× headroom) where micro would wrap near
#: SF10; the ≤0.05·k absolute error is far below the integer output
#: quantum.
_ANOVA_SQL = """
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
    FROM {src} GROUP BY source
),
t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(s) AS BIGINT) AS st,
           CAST(SUM(q) AS BIGINT) AS sq,
           CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / n * 1e1 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS w_deci
    FROM g
),
c AS (
    SELECT k, n, st, sq,
           GREATEST(CAST(sq AS DOUBLE) - w_deci / 1e1, 0e0) AS ssw,
           GREATEST(w_deci / 1e1 - CAST(st AS DOUBLE) * st / n, 0e0)
               AS ssb
    FROM t
)
SELECT k AS n_groups, n AS n_rows,
       CAST(FLOOR(ssb * 1e0 + 5e-1) AS BIGINT) AS ssb_int,
       CAST(FLOOR(ssw * 1e0 + 5e-1) AS BIGINT) AS ssw_int,
       CAST(FLOOR((ssb / (k - 1e0)) / (ssw / (n - k * 1e0)) * 1e3 + 5e-1)
            AS BIGINT) AS f_milli,
       CAST(FLOOR(ssb / (ssb + ssw) * 1e6 + 5e-1) AS BIGINT)
           AS eta2_micro
FROM c
WHERE k > 1 AND n > k AND ssw > 0e0 AND ssb + ssw > 0e0
"""


@register("agg_anova_oneway", oracle=_ANOVA_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across ALL sources at once: the F statistic for
    "do mean document lengths differ between ANY of the k sources?"
    plus eta² (the share of length variance the source explains) —
    the k-group omnibus test that precedes the pairwise battery
    (`agg_welch_ttest`, `ext_mann_whitney_u` compare TWO cohorts;
    `ext_fdr_bh` corrects many pairwise tests; ANOVA asks the single
    question first, and eta² is the effect size that says whether a
    "significant" F matters at corpus scale).

    Determinism: per-group (n, Σx, Σx²) are exact int64 in any order;
    SSW/SSB are fixed-order double closes with GREATEST absorbing the
    near-constant-group round-off edge; F and eta² are single shared
    expressions, milli/micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(source), then a
    k-row reduce — the cheapest possible k-group test."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("anova_docs")
    return spark.sql(_ANOVA_SQL.format(src="anova_docs"))


# --------------------------------------------------------------------------
# ext_group_kfold — leakage-safe cross-validation fold assignment
# --------------------------------------------------------------------------

_KFOLD_K = 5

#: shared body ({src} = documents view, {bucket} = engine bucket text
#: with doc_id substituted per engine). The GROUP is the source: every
#: document of a source lands in the SAME fold (near-dups inside a
#: source can then never straddle a train/test boundary), and the fold
#: of a source is a deterministic hash of the source name.
_GROUP_KFOLD_SQL = """
WITH f AS (
    SELECT source, lang, ({bucket}) % {k} AS fold
    FROM {src}
),
c AS (
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM f GROUP BY fold
)
SELECT fold, n_docs, n_sources, n_langs,
       CAST(FLOOR(n_docs * 1e6 / SUM(n_docs) OVER () + 5e-1) AS BIGINT)
           AS share_micro,
       CAST(FLOOR(n_docs * 1e0 * {k} / SUM(n_docs) OVER () * 1e3 + 5e-1)
            AS BIGINT) AS balance_milli
FROM c
"""


@register("ext_group_kfold",
          oracle=_GROUP_KFOLD_SQL.format(
              src="documents", k=_KFOLD_K,
              bucket=_sc.BUCKET_SQL.replace(
                  "md5(CAST(doc_id AS VARCHAR))", "md5(source)")),
          tags=("ext", "curation", "eval"))
def ext_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold assignment (k = 5) with the SOURCE as the group:
    every document of a source hashes to the same fold, so the
    near-duplicates and boilerplate that live within a source can never
    straddle a train/test boundary — the leakage mode plain random
    k-fold silently commits on web corpora, and the reason
    sklearn-style GroupKFold exists. `ext_sample_split` is the single
    80/10/10 split; this is its cross-validation generalization, with
    the per-fold census (docs, sources, languages, balance ratio vs the
    ideal 1/k) that says whether group-level hashing left the folds
    usable. Balance far from 1000 milli means a few mega-sources own
    the corpus — the signal to stratify or cap (`ext_domain_cap`).

    Determinism: the fold is a pure function of md5(source) (the
    `ext_sample_split` bucket algebra on the group key), layout- and
    scale-free; the census is exact integers with one fixed-order
    share close.

    Scale shape: a row-local hash + ONE map-side-combinable groupBy
    onto k rows. Assignments never materialize per row downstream —
    consumers re-derive the fold from the source name wherever they
    run."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kfold_docs")
    bucket = _sc.BUCKET_SQL_SPARK.replace(
        "md5(cast(doc_id as string))", "md5(source)")
    return spark.sql(_GROUP_KFOLD_SQL.format(src="kfold_docs",
                                             k=_KFOLD_K, bucket=bucket))


# --------------------------------------------------------------------------
# ext_bradley_terry_step — preference-model fit over pairwise comparisons
# --------------------------------------------------------------------------

#: one body shared verbatim by both engines ({src} = documents view).
#: Pairwise "matches" are consecutive doc_ids from different sources,
#: won by the longer document (ties to the lexicographically smaller
#: source) — a deterministic stand-in for human preference labels; with
#: real A/B judgments the match CTE is the only thing that changes.
#: The corpus reduces to the k x k (source, source) win matrix FIRST;
#: every MM denominator term n_ij/(p_i+p_j) is MICRO-quantized (1e6)
#: before its (<= k-term) integer sum, so the two iterations are
#: fixed-order algebra on exact integers — never an order-dependent
#: double SUM. Micro, not nano: n_ij is a corpus-scaled match count
#: (up to ~5e10 adjacent-doc matches at 100 TB over few sources) and
#: ratings sum to k, so n_ij/(p_i+p_j) itself reaches ~5e10 — 1e6
#: quantization caps a term at ~5e16 << 9.2e18 int64 max, while 1e9
#: would wrap at n_ij/(p_i+p_j) >= ~9.2e9 (the round-8 headroom audit
#: bound, extended here per round-8 ADVICE).
_BT_BODY = """
WITH m0 AS (
    SELECT a.source AS sa, b.source AS sb,
           CASE WHEN a.n_chars > b.n_chars THEN 1
                WHEN a.n_chars < b.n_chars THEN 0
                WHEN a.source < b.source THEN 1 ELSE 0 END AS a_wins
    FROM {src} a JOIN {src} b ON b.doc_id = a.doc_id + 1
    WHERE a.source <> b.source
),
m AS (
    SELECT i, j, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS w
    FROM (
        SELECT sa AS i, sb AS j, 1 AS n, a_wins AS w FROM m0
        UNION ALL
        SELECT sb AS i, sa AS j, 1 AS n, 1 - a_wins AS w FROM m0
    ) GROUP BY i, j
),
t1 AS (
    SELECT i, CAST(SUM(w) AS BIGINT) AS wi, CAST(SUM(n) AS BIGINT) AS ni
    FROM m GROUP BY i
),
k0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM t1),
p1 AS (SELECT i, wi, ni, wi * 2e0 / ni AS p FROM t1),
z1 AS (
    SELECT CAST(SUM(CAST(FLOOR(p * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sp_micro
    FROM p1
),
p1n AS (
    SELECT p1.i, p1.wi, p1.ni,
           p1.p * (k0.k * 1e0) / (z1.sp_micro / 1e6) AS p
    FROM p1, z1, k0
),
d2 AS (
    SELECT m.i,
           CAST(SUM(CAST(FLOOR(m.n / (pi.p + pj.p) * 1e6 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS den_micro
    FROM m JOIN p1n pi ON m.i = pi.i JOIN p1n pj ON m.j = pj.i
    GROUP BY m.i
),
p2 AS (
    SELECT t.i, t.wi, t.ni, t.wi * 1e0 / (d.den_micro / 1e6) AS p
    FROM t1 t JOIN d2 d ON t.i = d.i
),
z2 AS (
    SELECT CAST(SUM(CAST(FLOOR(p * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sp_micro
    FROM p2
)
SELECT p2.i AS source, p2.ni AS n_matches, p2.wi AS n_wins,
       CAST(FLOOR(p2.p * (k0.k * 1e0) / (z2.sp_micro / 1e6) * 1e6 + 5e-1)
            AS BIGINT) AS rating_micro,
       CAST(ROW_NUMBER() OVER (
           ORDER BY p2.p * (k0.k * 1e0) / (z2.sp_micro / 1e6) DESC, p2.i)
           AS INT) AS rank
FROM p2, z2, k0
"""


@register("ext_bradley_terry_step", oracle=_BT_BODY.format(src="documents"),
          tags=("ext", "curation", "preference", "training"))
def ext_bradley_terry_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two minorization-maximization iterations of the Bradley-Terry
    preference model (Bradley & Terry 1952; Hunter 2004's MM update
    p_i <- W_i / Σ_j n_ij/(p_i+p_j)) over pairwise source-vs-source
    comparisons — the fit that turns raw A/B preference labels into
    per-source strength ratings, i.e. the aggregation step under every
    RLHF reward-data audit and chatbot-arena-style leaderboard. The
    deterministic match derivation (consecutive docs, longer wins)
    stands in for human judgments; swapping in a real preference table
    changes only the first CTE. Completes the distributed-iterative
    family: `ext_logreg_train_step` (gradients), `ext_kmeans_update_step`
    (hard assignment), `ext_gmm_em_step` (soft assignment),
    `ext_als_step` (bilinear) — this is the PAIRED-COMPARISON member.

    Determinism: the corpus reduces to the k x k win matrix (exact
    integer counts) before any model algebra; each MM denominator term
    and each normalization term is quantized THEN integer-summed over
    its <= k rows (order-free); iteration closes are fixed-order
    doubles; ratings are sum-normalized to k and micro-quantized, with
    a deterministic rank tiebreak.

    Scale shape: ONE self-join on adjacent doc_ids (co-partitioned
    range join at scale; with a real preference table, a plain scan)
    into a map-side-combinable (source, source) reduce; both MM
    iterations run on the k x k matrix — parameter-sized, the same
    posture as the other *_step operators. Iterating to convergence =
    re-invoking with the previous ratings as literals."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bt_docs")
    return spark.sql(_BT_BODY.format(src="bt_docs"))


# --------------------------------------------------------------------------
# ext_quality_threshold_sweep — pick the quality-filter cutoff
# --------------------------------------------------------------------------

#: shared body: same feats/scored derivation as the calibration bins
#: (shared module constants, so retuning the classifier moves trainer,
#: calibration and this sweep together). The corpus reduces to <=1000
#: (permille-score, count, positives) rows FIRST; the 9-threshold
#: confusion algebra is a bounded cross over that table. Precision is
#: NULL (identically, both engines) where a threshold keeps nothing.
_QTS_BODY = f"""
WITH feats AS (
    SELECT doc_id,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
scored AS (
    SELECT 1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) AS p,
           {_CAL_PASS_SQL} AS y
    FROM feats
),
bins AS (
    SELECT CAST(LEAST(FLOOR(p * 1e3), 999) AS BIGINT) AS pb,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(y) AS BIGINT) AS pos
    FROM scored GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS np FROM bins),
thr AS (
    SELECT CAST(100 AS BIGINT) AS t_permille UNION ALL SELECT 200
    UNION ALL SELECT 300 UNION ALL SELECT 400 UNION ALL SELECT 500
    UNION ALL SELECT 600 UNION ALL SELECT 700 UNION ALL SELECT 800
    UNION ALL SELECT 900
),
cm AS (
    SELECT th.t_permille,
           CAST(SUM(CASE WHEN b.pb >= th.t_permille THEN b.pos
                         ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN b.pb >= th.t_permille THEN b.cnt - b.pos
                         ELSE 0 END) AS BIGINT) AS fp
    FROM bins b CROSS JOIN thr th GROUP BY 1
),
m AS (
    SELECT cm.t_permille, cm.tp, cm.fp, t.np - cm.tp AS fn,
           cm.tp + cm.fp AS n_kept,
           CASE WHEN cm.tp + cm.fp > 0
                THEN CAST(FLOOR(cm.tp * 1e0 / (cm.tp + cm.fp) * 1e6
                                + 5e-1) AS BIGINT)
                ELSE NULL END AS precision_micro,
           CAST(FLOOR(cm.tp * 1e0 / t.np * 1e6 + 5e-1) AS BIGINT)
               AS recall_micro,
           CAST(FLOOR(2e0 * cm.tp
                      / (2e0 * cm.tp + cm.fp + (t.np - cm.tp)) * 1e6
                      + 5e-1) AS BIGINT) AS f1_micro
    FROM cm, tot t WHERE t.np > 0
)
SELECT t_permille, tp, fp, fn, n_kept, precision_micro, recall_micro,
       f1_micro,
       CASE WHEN f1_micro = MAX(f1_micro) OVER () THEN 1 ELSE 0 END
           AS is_best_f1
FROM m
"""


@register("ext_quality_threshold_sweep",
          oracle=_QTS_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "eval"))
def ext_quality_threshold_sweep(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Operating-point selection for the quality classifier: the full
    precision/recall/F1 confusion sweep across nine score thresholds,
    with the F1-argmax row flagged — the step BETWEEN training
    (`ext_logreg_train_step`), calibration
    (`ext_quality_calibration_bins`) and deployment
    (`ext_quality_filter`): every curation stack picks its filter
    cutoff from exactly this table, trading kept-token budget
    (`n_kept`) against label agreement. Probability and label derive
    from the SAME shared module constants as the parent queries, so
    retuning a weight or a rule bound moves trainer, calibration and
    this sweep together.

    Determinism: the corpus reduces to <=1000 exact (permille-score,
    count, positives) rows in ONE map-side-combinable pass; the
    9-threshold confusion matrix is integer algebra over that bounded
    table; precision/recall/F1 are fixed-order doubles,
    micro-quantized, with the keeps-nothing threshold yielding NULL
    precision identically in both engines (threshold semantics are at
    permille granularity: kept = score bin >= t).

    Scale shape: one corpus aggregation + a 1000 x 9 bounded cross —
    the PR curve at 100 TB costs the same single pass the decile
    calibration does."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("qts_docs")
    sql = (_QTS_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
           .replace("FROM documents WHERE n_chars > 0", "FROM qts_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_token_weighted_resample — systematic resampling to a sample budget
# --------------------------------------------------------------------------

_RESAMPLE_M = 1000          # sample budget (documents drawn, with copies)
_RESAMPLE_BK = 4096         # prefix-sum range-bucket width (doc_ids)

#: shared body ({src} = non-empty documents view; `//` floor-division is
#: rewritten to ` div ` for Spark — numerators are guarded non-negative,
#: where DuckDB's floor and Spark's truncate agree). The cumulative
#: weight is a DISTRIBUTED two-level prefix sum: per-range-bucket
#: partial windows (co-partitioned, parallel) plus broadcast bucket
#: offsets from a window over the bounded bucket table — NEVER a global
#: single-partition running sum over the corpus. Systematic (low-
#: variance) resampling: sample points sit at (2k+1)·W/(2m), so a
#: doc's copy count is g(cum) - g(cum - wt) with
#: g(c) = (2·c·m - W) // (2·W) + 1 for 2·c·m >= W — EXACT integer
#: algebra end to end (2·c·m <= ~7e16 at 100 TB of 2 KB docs, 130x
#: int64 headroom; a double spelling would lose exactness past 2^53).
_RESAMPLE_BODY = f"""
WITH w AS (
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt
    FROM {{src}} WHERE n_chars > 0
),
t AS (SELECT CAST(SUM(wt) AS BIGINT) AS wtot,
             CAST(SUM(CAST(wt AS DECIMAL(19, 0)) * wt) AS DOUBLE)
                 AS w2 FROM w),
b0 AS (SELECT doc_id, source, wt, doc_id // {_RESAMPLE_BK} AS bk FROM w),
bt AS (SELECT bk, CAST(SUM(wt) AS BIGINT) AS bw FROM b0 GROUP BY bk),
boff AS (
    SELECT bk,
           CAST(COALESCE(SUM(bw) OVER (ORDER BY bk ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
    FROM bt
),
c AS (
    SELECT b0.doc_id, b0.source, b0.wt,
           boff.off + CAST(SUM(b0.wt) OVER (PARTITION BY b0.bk
                ORDER BY b0.doc_id) AS BIGINT) AS cum
    FROM b0 JOIN boff ON b0.bk = boff.bk
),
p AS (
    SELECT source, wt,
           (CASE WHEN 2 * cum * {_RESAMPLE_M} >= t.wtot
                 THEN (2 * cum * {_RESAMPLE_M} - t.wtot) // (2 * t.wtot) + 1
                 ELSE 0 END
            - CASE WHEN 2 * (cum - wt) * {_RESAMPLE_M} >= t.wtot
                   THEN (2 * (cum - wt) * {_RESAMPLE_M} - t.wtot)
                        // (2 * t.wtot) + 1
                   ELSE 0 END) AS picks,
           t.wtot, t.w2
    FROM c, t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(wt) AS BIGINT) AS w_source,
       CAST(SUM(CASE WHEN picks > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled_docs,
       CAST(SUM(picks) AS BIGINT) AS n_samples,
       CAST(MAX(picks) AS BIGINT) AS max_copies,
       CAST(SUM(SUM(picks)) OVER () AS BIGINT) AS n_samples_total,
       CAST(FLOOR(MAX(wtot) * 1e0 * MAX(wtot) / MAX(w2) * 1e3 + 5e-1)
            AS BIGINT) AS ess_milli
FROM p GROUP BY source
"""


@register("ext_token_weighted_resample",
          oracle=_RESAMPLE_BODY.format(src="documents"),
          tags=("ext", "curation", "sampling"))
def ext_token_weighted_resample(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Systematic (low-variance) resampling of {m} documents
    proportional to token mass (n_chars as the proxy) — the EXECUTION
    step importance-based selection ends with: `ext_dsir_weights`
    scores docs, `ext_domain_mix_temperature` / `ext_quota_sample`
    set budgets, and THIS query actually draws the sample — here
    token-uniform (a doc's draw probability proportional to its
    length, i.e. uniform over tokens), the standard way to build
    token-balanced eval subsets; swapping the `wt` column for any
    integer importance weight reuses the identical machinery.
    Systematic resampling places the {m} sample points at fixed
    stride W/m starting at W/(2m), so copy counts are deterministic,
    variance-optimal among unbiased resamplers, and every doc with
    wt >= W/m is guaranteed picked. Emits the per-source census
    (docs drawn, total copies, max copies) plus the weight
    distribution's effective sample size.

    Determinism AND scale: the cumulative weight is a distributed
    two-level prefix sum — per-range-bucket partial windows
    (co-partitioned by bucket, parallel) + broadcast bucket offsets
    from the bounded bucket table — never a global single-partition
    running window; copy counts are exact int64 floor-division algebra
    (numerators guarded non-negative so DuckDB's floor and Spark's
    truncate agree; 2·cum·m has ~130x int64 headroom at 100 TB). The
    ESS denominator Σwt² sums through DECIMAL(19,0)·wt products (exact
    decimal, then one cast to double) because a raw int64 Σwt² wraps
    for long-doc corpora — 1e5-char docs give ~5e20 at 100 TB; the
    2·cum·m path is unaffected (cum is a plain Σwt).

    Scale shape: two map-side-combinable reduces (bucket totals,
    source census) + co-partitioned windows; the only broadcast is
    the |doc_id range|/{bk}-row offset table."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("resample_docs")
    sql = (_RESAMPLE_BODY.format(src="resample_docs")
           .replace("//", " div "))
    return spark.sql(sql)


ext_token_weighted_resample.__doc__ = (
    ext_token_weighted_resample.__doc__.format(m=_RESAMPLE_M,
                                               bk=_RESAMPLE_BK))


# --------------------------------------------------------------------------
# ext_uncertainty_sample — margin-based active-learning batch
# --------------------------------------------------------------------------

#: shared body: same feats/score derivation as the trainer/calibration/
#: threshold-sweep family (shared module constants — retuning the
#: classifier moves the whole family together). Margin is computed on
#: the MICRO-QUANTIZED probability so the ordering key is an exact
#: integer in both engines; doc_id breaks ties.
_UNC_BODY = f"""
WITH feats AS (
    SELECT doc_id, source,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl
    FROM documents WHERE n_chars > 0
),
scored AS (
    SELECT doc_id, source,
           CAST(FLOOR(1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) * 1e6 + 5e-1)
                AS BIGINT) AS p_micro
    FROM feats
),
r AS (
    SELECT doc_id, source, p_micro,
           ABS(p_micro - 500000) AS margin_micro,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY ABS(p_micro - 500000), doc_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT doc_id, source, p_micro, margin_micro, rnk
FROM r WHERE rnk <= 5
"""


@register("ext_uncertainty_sample",
          oracle=_UNC_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "active-learning"))
def ext_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based uncertainty sampling (Lewis & Gale 1994; the
    standard active-learning acquisition): the 5 documents per source
    whose quality-classifier probability sits closest to the 0.5
    decision boundary — the batch a curation team sends for human
    labels next, because boundary examples move the retrained
    classifier most per label dollar. Closes the active-learning loop
    around the quality family: train (`ext_logreg_train_step`) →
    calibrate → sweep the threshold → LABEL THESE NEXT → retrain.
    Per-source stratification keeps the label batch from collapsing
    onto one domain's boundary.

    Determinism: probability micro-quantizes BEFORE the margin and the
    rank, so the ordering key is exact integer algebra; doc_id breaks
    ties. Same module constants as the trainer — one tuning edit moves
    the whole family.

    Scale shape: map-side scoring in codegen + one per-source window
    rank (each partition's sort bounded by that source's size; at
    mega-source scale the same contract lowers to a per-source
    boundary-distance threshold via approx-quantile cutpoints, the
    `ext_domain_cap` lowering)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("unc_docs")
    sql = (_UNC_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
           .replace("FROM documents WHERE n_chars > 0", "FROM unc_docs"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_filter_agreement — Cohen's kappa between the two quality filters
# --------------------------------------------------------------------------

#: shared body: filter A = the Gopher rule chain (the _CAL_PASS_SQL
#: label), filter B = logreg p >= 0.5 on the micro-quantized score —
#: both from the family's shared module constants.
_FILTER_AGREE_BODY = f"""
WITH feats AS (
    SELECT doc_id,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
lab AS (
    SELECT {_CAL_PASS_SQL} AS a,
           CASE WHEN CAST(FLOOR(1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) * 1e6 + 5e-1)
                     AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS b
    FROM feats
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a * b) AS BIGINT) AS n11,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
           CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
           CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
    FROM lab
)
SELECT n, n11, n10, n01, n00,
       CAST(FLOOR((n11 + n00) * 1e6 / n + 5e-1) AS BIGINT)
           AS agreement_micro,
       CASE WHEN (n11 + n10) * (n11 + n01)
                 + (n00 + n01) * (n00 + n10) < n * n THEN
           CAST(FLOOR(((n11 + n00) * 1e0 / n
                       - ((n11 + n10) * 1e0 * (n11 + n01)
                          + (n00 + n01) * 1e0 * (n00 + n10)) / (n * 1e0 * n))
                      / (1e0 - ((n11 + n10) * 1e0 * (n11 + n01)
                                + (n00 + n01) * 1e0 * (n00 + n10))
                               / (n * 1e0 * n)) * 1e6 + 5e-1) AS BIGINT)
       END AS kappa_micro
FROM m WHERE n > 0
"""


@register("ext_filter_agreement",
          oracle=_FILTER_AGREE_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "eval"))
def ext_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between the two deployed quality
    filters — the rule chain (`ext_quality_gopher_rules` pass/fail) and
    the trained classifier (`ext_quality_logistic` at the 0.5 cut) — as
    a 2x2 confusion with raw agreement and Cohen's kappa. The audit
    every ensemble (`ext_quality_ensemble`) owes its users: high kappa
    means the classifier learned the rules (redundant, drop one); low
    kappa with high individual keep-rates means they disagree on a
    large middle band — exactly the docs `ext_uncertainty_sample`
    routes to human labels. Same `_annotator_kappa` algebra, applied
    to FILTERS rather than human raters.

    Determinism: the 2x2 is exact integer counts off the shared module
    constants; P_o/P_e are fixed-order doubles; the unanimity
    degenerate (P_e = 1, kappa undefined) is excluded by the identical
    integer inequality in both engines (the `ext_fleiss_kappa` guard
    pattern).

    Scale shape: ONE map-side-combinable corpus reduce to four cells;
    the close is constant work."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("fagree_docs")
    sql = (_FILTER_AGREE_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
           .replace("FROM documents WHERE n_chars > 0", "FROM fagree_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_adaboost_stump_step — one boosting round on the quality features
# --------------------------------------------------------------------------

#: shared body: same feats/scored/bins derivation as the threshold sweep
#: (shared module constants); the stump search runs on integer cumsums
#: over the <=1000-row permille-bin table.
_ADA_STUMP_BODY = f"""
WITH feats AS (
    SELECT doc_id,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
scored AS (
    SELECT 1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) AS p,
           {_CAL_PASS_SQL} AS y
    FROM feats
),
bins AS (
    SELECT CAST(LEAST(FLOOR(p * 1e3), 999) AS BIGINT) AS pb,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(y) AS BIGINT) AS pos
    FROM scored GROUP BY 1
),
cum AS (
    SELECT pb,
           CAST(SUM(cnt) OVER () AS BIGINT) AS n,
           CAST(SUM(pos) OVER () AS BIGINT) AS np,
           CAST(SUM(pos) OVER (ORDER BY pb DESC ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_above,
           CAST(SUM(cnt - pos) OVER (ORDER BY pb DESC ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS neg_above
    FROM bins
),
e AS (
    SELECT pb AS t_permille, n, np,
           (np - pos_above) + neg_above AS err_pos_polarity
    FROM cum
),
best AS (
    SELECT t_permille, n, np,
           CASE WHEN err_pos_polarity <= n - err_pos_polarity
                THEN err_pos_polarity ELSE n - err_pos_polarity END AS e,
           CASE WHEN err_pos_polarity <= n - err_pos_polarity
                THEN 1 ELSE -1 END AS polarity
    FROM e
    ORDER BY CASE WHEN err_pos_polarity <= n - err_pos_polarity
                  THEN err_pos_polarity
                  ELSE n - err_pos_polarity END ASC, t_permille ASC
    LIMIT 1
)
SELECT t_permille, CAST(polarity AS BIGINT) AS polarity, e AS err_cnt, n,
       CAST(FLOOR(e * 1e6 / n + 5e-1) AS BIGINT) AS err_micro,
       CASE WHEN e > 0 AND e * 2 < n THEN
           CAST(FLOOR(5e-1 * LN((n - e) * 1e0 / e) * 1e6 + 5e-1)
                AS BIGINT)
       END AS alpha_micro
FROM best
"""


@register("ext_adaboost_stump_step",
          oracle=_ADA_STUMP_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "training"))
def ext_adaboost_stump_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One AdaBoost round (Freund & Schapire 1997) with a decision-stump
    weak learner over the quality score: search EVERY permille
    threshold (and both polarities) for the stump minimizing 0-1 error
    against the Gopher labels, and emit it with its weight
    alpha = ½·ln((1-e)/e) — the boosting member of the distributed
    iterative-training family (logreg = gradient step, kmeans/GMM =
    assignment steps, ALS = bilinear, Bradley-Terry = MM; THIS is the
    additive-ensemble step). Iterating = reweighting documents by
    exp(±alpha) and re-invoking; round 1's uniform weights make the
    search a pure counting problem, which is what keeps it exact.

    Determinism: the corpus reduces to <=1000 exact (bin, count,
    positives) rows in ONE pass; threshold errors are integer cumsums
    over the bin table (order-free); the argmin orders by (error,
    threshold) with the positive polarity preferred on ties; alpha is
    one bit-exact LN over an exact-integer ratio, NULL-guarded for the
    degenerate perfectly-separable (e=0) and worse-than-chance-tie
    (2e >= n) cases identically in both engines.

    Scale shape: one map-side-combinable corpus reduce + window algebra
    over <=1000 rows — the same single-pass cost as the threshold
    sweep, at any corpus size."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("ada_docs")
    sql = (_ADA_STUMP_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
           .replace("FROM documents WHERE n_chars > 0", "FROM ada_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)

# --------------------------------------------------------------------------
# ext_naive_bayes_step — multinomial NB train + held-out eval in one pass
# --------------------------------------------------------------------------

#: Shared body; {tok} is the engine's token-explode spelling, {bucket}
#: the md5 split bucket. Train = buckets 0-7 of bucket%10 (the standard
#: 80% split), eval = bucket%10 = 9 (test). Laplace +1 smoothing; every
#: log term micro-quantizes BEFORE the per-(doc,class) integer sum.
_NB_BODY = """
WITH b AS (
    SELECT doc_id, lang, text, {bucket} AS bucket FROM documents
),
toks AS (
    SELECT doc_id, lang, bucket, {tok} AS tok FROM b
),
tt AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks WHERE tok <> '' AND bucket % 10 <= 7
    GROUP BY lang, tok
),
cls AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tot FROM tt GROUP BY lang),
v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsz FROM tt),
pri AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS ndtot
    FROM b WHERE bucket % 10 <= 7 GROUP BY lang
),
clsv AS (
    SELECT p.lang,
           CAST(FLOOR(LN(p.nd * 1e0 / p.ndtot) * 1e6 + 5e-1) AS BIGINT)
               AS prior_micro,
           CAST(FLOOR(LN(1e0 / (c.tot + v.vsz)) * 1e6 + 5e-1) AS BIGINT)
               AS u_micro,
           c.tot, v.vsz
    FROM pri p JOIN cls c ON c.lang = p.lang CROSS JOIN v
    WHERE p.nd > 0
),
cond AS (
    SELECT t.lang, t.tok,
           CAST(FLOOR(LN((t.cnt + 1e0) / (c.tot + c.vsz)) * 1e6 + 5e-1)
                AS BIGINT) AS term_micro
    FROM tt t JOIN clsv c ON c.lang = t.lang
),
et AS (
    SELECT doc_id, lang AS true_lang, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks WHERE tok <> '' AND bucket % 10 = 9
    GROUP BY doc_id, lang, tok
),
ed AS (
    SELECT doc_id, MAX(true_lang) AS true_lang,
           CAST(SUM(c) AS BIGINT) AS m
    FROM et GROUP BY doc_id
),
sn AS (
    SELECT e.doc_id, c.lang,
           CAST(SUM(e.c * c.term_micro) AS BIGINT) AS s1,
           CAST(SUM(e.c) AS BIGINT) AS sm
    FROM et e JOIN cond c ON c.tok = e.tok
    GROUP BY e.doc_id, c.lang
),
sc AS (
    SELECT d.doc_id, d.true_lang, k.lang,
           k.prior_micro + COALESCE(s.s1, 0)
               + (d.m - COALESCE(s.sm, 0)) * k.u_micro AS score
    FROM ed d CROSS JOIN clsv k
    LEFT JOIN sn s ON s.doc_id = d.doc_id AND s.lang = k.lang
),
pred AS (
    SELECT doc_id, true_lang, lang AS pred_lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM sc
)
SELECT true_lang,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(FLOOR(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                  * 1e6 / COUNT(*) + 5e-1) AS BIGINT) AS acc_micro,
       CAST(FLOOR(SUM(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0
                          END)) OVER () * 1e6
                  / SUM(COUNT(*)) OVER () + 5e-1) AS BIGINT)
           AS overall_acc_micro
FROM pred WHERE rn = 1
GROUP BY true_lang
"""

_NB_TOK_DUCK = "unnest(string_split(text, ' '))"
_NB_TOK_SPARK = "explode(split(text, ' '))"


@register("ext_naive_bayes_step",
          oracle=_NB_BODY.format(bucket=_sc.BUCKET_SQL, tok=_NB_TOK_DUCK),
          tags=("ext", "curation", "training", "text"))
def ext_naive_bayes_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes, trained and evaluated in one pass: fit
    class-conditional token log-probabilities (Laplace +1 smoothing)
    and log priors on the md5-bucket train split, score every held-out
    test document against every class, and report the per-class and
    overall accuracy — the GENERATIVE member of the distributed
    training family (logreg = discriminative gradient step, AdaBoost =
    additive ensemble, centroid = metric; NB is the count-based
    generative baseline every language-ID and topic-routing pipeline
    reaches for first, because training IS one groupBy).

    Semantics: classes are languages; a class participates only with
    >=1 train doc; eval docs are those with >=1 token (an empty text
    has no evidence). Tokens unseen for a class (inside or outside the
    train vocabulary) carry the smoothing mass ln(1/(tot+V)), decomposed
    so the score is prior + sum(seen c*term) + (m - seen_mass)*u — no
    dense doc x vocab join ever materializes.

    Determinism: every LN term is over exact integer ratios and
    micro-quantized BEFORE the per-(doc,class) integer sum (order-free;
    |score| <= m_doc * 2e7 — per-document-bounded, no corpus-scaled
    headroom risk); argmax breaks ties by (score DESC, lang ASC).

    Scale shape: train reduces token traffic to a vocab x class table;
    eval joins doc tokens to it on the token key (shuffle bounded by
    vocab mass); the per-doc class fan-out is a <=n_langs-row broadcast
    cross (row-local); the argmax window partitions by doc_id. No
    corpus-sized windows, no driver collects."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("nb_docs")
    sql = (_NB_BODY.format(bucket=_sc.BUCKET_SQL_SPARK, tok=_NB_TOK_SPARK)
           .replace("FROM documents", "FROM nb_docs"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_brier_decomposition — Murphy (1973) REL/RES/UNC of the quality score
# --------------------------------------------------------------------------

_BRIER_BODY = f"""
WITH feats AS (
    SELECT doc_id,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
scored AS (
    SELECT 1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) AS p,
           {_CAL_PASS_SQL} AS y
    FROM feats
),
rowed AS (
    SELECT CAST(LEAST(FLOOR(p * 1e3), 999) AS BIGINT) AS pb,
           CAST(FLOOR(p * 1e6 + 5e-1) AS BIGINT) AS q,
           CAST(FLOOR((p - y) * (p - y) * 1e6 + 5e-1) AS BIGINT) AS bt,
           y
    FROM scored
),
bins AS (
    SELECT pb, CAST(COUNT(*) AS BIGINT) AS nk,
           CAST(SUM(q) AS BIGINT) AS sp,
           CAST(SUM(y) AS BIGINT) AS pos,
           CAST(SUM(bt) AS BIGINT) AS sbt
    FROM rowed GROUP BY pb
),
t AS (
    SELECT pb, nk, sp, pos, sbt,
           CAST(SUM(nk) OVER () AS BIGINT) AS n,
           CAST(SUM(pos) OVER () AS BIGINT) AS np,
           CAST(SUM(sbt) OVER () AS BIGINT) AS sbt_all
    FROM bins
),
terms AS (
    SELECT n, np, sbt_all,
           CAST(FLOOR(nk * (sp / (nk * 1e6) - pos * 1e0 / nk)
                         * (sp / (nk * 1e6) - pos * 1e0 / nk)
                      * 1e6 + 5e-1) AS BIGINT) AS rel_t,
           CAST(FLOOR(nk * (pos * 1e0 / nk - np * 1e0 / n)
                         * (pos * 1e0 / nk - np * 1e0 / n)
                      * 1e6 + 5e-1) AS BIGINT) AS res_t
    FROM t
)
SELECT MAX(n) AS n, MAX(np) AS n_pos,
       CAST(FLOOR(MAX(sbt_all) * 1e3 / MAX(n) + 5e-1) AS BIGINT)
           AS brier_nano,
       CAST(FLOOR(SUM(rel_t) * 1e3 / MAX(n) + 5e-1) AS BIGINT)
           AS reliability_nano,
       CAST(FLOOR(SUM(res_t) * 1e3 / MAX(n) + 5e-1) AS BIGINT)
           AS resolution_nano,
       CAST(FLOOR((MAX(np) * 1e0 / MAX(n))
                  * (1e0 - MAX(np) * 1e0 / MAX(n)) * 1e9 + 5e-1)
            AS BIGINT) AS uncertainty_nano,
       CASE WHEN MAX(np) > 0 AND MAX(np) < MAX(n) THEN
           CAST(FLOOR((1e0 - (MAX(sbt_all) * 1e0 / (MAX(n) * 1e6))
                       / ((MAX(np) * 1e0 / MAX(n))
                          * (1e0 - MAX(np) * 1e0 / MAX(n))))
                * 1e6 + 5e-1) AS BIGINT)
       END AS brier_skill_micro
FROM terms
"""


@register("ext_brier_decomposition",
          oracle=_BRIER_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "eval"))
def ext_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the quality classifier's Brier
    score into RELIABILITY (calibration error), RESOLUTION (how much
    the score separates outcomes) and UNCERTAINTY (base-rate entropy)
    over permille score bins, plus the Brier skill score 1 - BS/UNC —
    THE one-number diagnostic that says whether a filter's probability
    output can be thresholded by expected cost
    (`ext_quality_calibration_bins` shows the per-bin curve; this is
    its scalar summary, and `ext_quality_auc` its rank-only cousin that
    calibration error cannot move).

    Determinism: per-row Brier terms and per-bin squared-gap terms
    micro-quantize before integer sums (row terms <= 1 so the corpus
    sum holds micro headroom to ~9.2e12 docs; bin terms <= n_k so the
    <=1000-row bin sum has the same bound); base rate and final nano
    closes are fixed-order doubles over exact integers; the skill ratio
    is NULL-guarded at the degenerate all-pass / all-fail base rates
    identically in both engines.

    Scale shape: ONE map-side-combinable corpus reduce to <=1000
    permille bins, then window algebra on the bin table — the
    calibration-bins cost envelope exactly."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.where(F.col("n_chars") > 0).createOrReplaceTempView("brier_docs")
    sql = (_BRIER_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
           .replace("FROM documents WHERE n_chars > 0", "FROM brier_docs")
           .replace(", '', 'g')", ", '')"))
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_cuped_adjust — variance-reduced experiment readout (CUPED)
# --------------------------------------------------------------------------

#: {hb} = 60-bit md5 hash of the customer key (engine spelling differs).
_CUPED_BODY = """
WITH c AS (
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x_cents,
           CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                    THEN CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y_cents
    FROM orders GROUP BY o_custkey
),
a AS (
    SELECT CASE WHEN {hb} % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS arm,
           CAST(FLOOR(x_cents / 1e2 + 5e-1) AS BIGINT) AS x,
           CAST(FLOOR(y_cents / 1e2 + 5e-1) AS BIGINT) AS y
    FROM c
),
s AS (
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
           SUM(CAST(x AS DECIMAL(38, 0))) AS sx_a,
           SUM(CAST(y AS DECIMAL(38, 0))) AS sy_a,
           SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx_a,
           SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy_a,
           SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy_a
    FROM a GROUP BY arm
),
p AS (
    SELECT arm, n_arm,
           CAST(sx_a AS DOUBLE) AS sxa, CAST(sy_a AS DOUBLE) AS sya,
           CAST(SUM(n_arm) OVER () AS DOUBLE) AS n,
           CAST(SUM(sx_a) OVER () AS DOUBLE) AS sx,
           CAST(SUM(sy_a) OVER () AS DOUBLE) AS sy,
           CAST(SUM(sxx_a) OVER () AS DOUBLE) AS sxx,
           CAST(SUM(sxy_a) OVER () AS DOUBLE) AS sxy,
           CAST(SUM(syy_a) OVER () AS DOUBLE) AS syy
    FROM s
)
SELECT arm, n_arm,
       CAST(FLOOR(sya * 1e3 / n_arm + 5e-1) AS BIGINT) AS mean_y_milli,
       CASE WHEN (n * sxx - sx * sx) > 0e0 THEN
           CAST(FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6
                      + 5e-1) AS BIGINT)
       END AS theta_micro,
       CASE WHEN (n * sxx - sx * sx) > 0e0 THEN
           CAST(FLOOR((sya - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                             * (sxa - n_arm * (sx / n)))
                      * 1e3 / n_arm + 5e-1) AS BIGINT)
       END AS adj_mean_y_milli,
       CASE WHEN (n * sxx - sx * sx) > 0e0
             AND (n * syy - sy * sy) > 0e0 THEN
           CAST(FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                      * 1e9 + 5e-1) AS BIGINT)
       END AS var_reduction_nano
FROM p
"""

_CUPED_HB_DUCK = ("CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR))"
                  ", 1, 15)) AS BIGINT)")
_CUPED_HB_SPARK = ("cast(conv(substring(md5(cast(o_custkey as string)), 1,"
                   " 15), 16, 10) as bigint)")


@register("ext_cuped_adjust",
          oracle=_CUPED_BODY.format(hb=_CUPED_HB_DUCK),
          tags=("ext", "curation", "stats", "eval"))
def ext_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, the controlled-
    experiment standard): per customer, pre-period spend X (orders
    before 1998) controls post-period spend Y; theta = cov(X,Y)/var(X)
    fitted POOLED across both md5-hash arms, each arm's mean Y adjusted
    to mean(Y) - theta*(mean_arm(X) - mean_pool(X)), and the achieved
    variance-reduction fraction rho^2 reported — the query that turns a
    week-long A/B into a day-long one at the same power, and the
    experimentation-family close over `ext_ab_srm_check` (design
    fairness) and `ext_power_analysis` (sample sizing).

    Determinism: per-customer cents are exact integers; X/Y round to
    whole dollars so the five cross-moments are exact integer products
    (per-term int64 holds to ~$3e9 lifetime spend per customer) summed
    through DECIMAL(38,0) — the `agg_revenue_hhi` corpus-total pattern,
    exact at any SF in both engines — then cast to double ONCE for the
    fixed-order theta/rho^2 closes, NULL-guarded at zero pre- or
    post-period variance identically in both engines.

    Scale shape: ONE map-side-combinable groupBy(custkey) over the fact
    table, a 2-group reduce, and window algebra over the 2-row arm
    table. The hash arm assignment is a row-local scan-stage
    expression, so the whole query is one shuffle."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("cuped_orders")
    return spark.sql(_CUPED_BODY.format(hb=_CUPED_HB_SPARK)
                     .replace("FROM orders", "FROM cuped_orders"))


# --------------------------------------------------------------------------
# ext_gumbel_topk_sample — weighted sampling WITHOUT replacement (E-S keys)
# --------------------------------------------------------------------------

#: {hb} = 60-bit md5 hash of doc_id. u = (h+1)/2^60 in (0, 1]; the
#: Efraimidis-Spirakis key ln(u)/w makes top-k by key an exact weighted
#: sample without replacement (P(first) = w_i / sum w).
_GUMBEL_BODY = """
WITH w AS (
    SELECT doc_id, source, n_chars,
           LN(({hb} + 1) / 1152921504606846976e0) / n_chars AS lnkey
    FROM documents WHERE n_chars > 0
),
q AS (
    SELECT doc_id, source, n_chars,
           CAST(FLOOR(lnkey * 1e12 + 5e-1) AS BIGINT) AS key_pico
    FROM w
),
r AS (
    SELECT doc_id, source, n_chars, key_pico,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY key_pico DESC, doc_id) AS rnk
    FROM q
)
SELECT source, rnk, doc_id, n_chars, key_pico
FROM r WHERE rnk <= 8
"""

_GUM_HB_DUCK = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1,"
                " 15)) AS BIGINT)")
_GUM_HB_SPARK = ("cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
                 " 16, 10) as bigint)")


@register("ext_gumbel_topk_sample",
          oracle=_GUMBEL_BODY.format(hb=_GUM_HB_DUCK),
          tags=("ext", "curation", "sampling"))
def ext_gumbel_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 8 docs per source, by the
    Efraimidis-Spirakis exponential race (2006): every doc gets the key
    ln(u)/w with u a deterministic md5 uniform and w = n_chars; the
    top-8 keys per source are EXACTLY a w-proportional draw without
    replacement — the missing member of the sampling family
    (`ext_quota_sample` = uniform per-stratum, `ext_token_weighted_
    resample` = systematic WITH replacement; this is the
    without-replacement weighted draw used for dedup-audit panels and
    eval-set carving, reproducible across engines/runs/partitionings
    because the 'randomness' is a row-local hash, not an RNG).

    Determinism: u = (h60+1)/2^60 — the int64->double conversion and
    the power-of-two division round identically under IEEE in both
    engines, LN is bit-exact (measured, see portable.py), and the key
    pico-quantizes BEFORE ranking so order is integer with doc_id
    tie-break; |key| <= ln(2^-60)*1e12 ~ 4.2e13 — int64-safe
    per-row, nothing corpus-scaled.

    Scale shape: key computation is scan-stage codegen (no shuffle);
    the per-source top-8 is one window rank that lowers to
    TakeOrderedAndProject-per-group cost; at mega-source scale the
    standard lowering is a per-partition top-8 pre-reduce then a
    per-source merge — same keys, same result."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gum_docs")
    return spark.sql(_GUMBEL_BODY.format(hb=_GUM_HB_SPARK)
                     .replace("FROM documents", "FROM gum_docs"))


# --------------------------------------------------------------------------
# ext_ldiversity_audit — entropy l-diversity beside the k-anonymity census
# --------------------------------------------------------------------------

_LDIV_BODY = """
WITH base AS (
    SELECT c_nationkey AS nat, c_mktsegment AS seg,
           CAST(FLOOR(c_acctbal / 2e3) AS BIGINT) AS sens
    FROM customer
),
cells AS (
    SELECT nat, seg, sens, CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY nat, seg, sens
),
cls AS (
    SELECT nat, seg,
           CAST(SUM(c) AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(SUM(CAST(FLOOR(c * LN(c * 1e0) * 1e6 + 5e-1) AS BIGINT))
                AS BIGINT) AS clnc_micro
    FROM cells GROUP BY nat, seg
)
SELECT nat, seg, k, l_distinct,
       CAST(FLOOR(EXP(LN(k * 1e0) - clnc_micro / (k * 1e6)) * 1e3 + 5e-1)
            AS BIGINT) AS entropy_l_milli,
       CASE WHEN k >= 5 AND l_distinct >= 3 THEN 1 ELSE 0 END AS releasable
FROM cls
"""


@register("ext_ldiversity_audit", oracle=_LDIV_BODY,
          tags=("ext", "curation", "privacy"))
def ext_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007) of the
    customer table under the quasi-identifier (nation, market segment)
    with the account-balance band as the sensitive attribute: per
    equivalence class, the k-anonymity size, the distinct-l count, and
    the ENTROPY l (exp of the sensitive-value entropy — the diversity
    measure a homogeneity attack cannot game the way plain distinct-l
    can, since one dominant value drives entropy-l toward 1 even at
    high distinct-l), plus the k>=5 AND l>=3 release gate —
    `ext_kanonymity_census` answers re-identification risk; THIS
    answers attribute-disclosure risk, the other half of a privacy
    review.

    Determinism: class/cell counts are exact integers; each c*ln(c)
    term micro-quantizes before the per-class integer sum (cell terms
    are class-bounded, and ln(k)-H algebra runs on exact integers with
    ONE exp/ln pair per class — both bit-exact); c >= 1 so ln never
    sees zero, and a single-value class gives entropy-l exactly 1.

    Scale shape: two map-side-combinable reduces (cells, then classes)
    — the census never leaves the ~nations x segments dimension after
    the first reduce."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "customer").createOrReplaceTempView("ldiv_customer")
    return spark.sql(_LDIV_BODY.replace("FROM customer",
                                        "FROM ldiv_customer"))


# --------------------------------------------------------------------------
# ext_sprt_monitor — Wald sequential probability ratio test, day by day
# --------------------------------------------------------------------------

#: {day} = engine spelling of the UTC day index. Design literals:
#: H0 p=0.20 vs H1 p=0.25, alpha=beta=0.05 -> boundaries +/- ln(19).
_SPRT_BODY = """
WITH d AS (
    SELECT {day} AS day,
           CAST(COUNT(*) AS BIGINT) AS trials,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS conv
    FROM events GROUP BY 1
),
c AS (
    SELECT day, trials, conv,
           CAST(SUM(conv) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
           CAST(SUM(trials - conv) OVER (ORDER BY day ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cf
    FROM d
),
st AS (
    SELECT day, trials, conv, cs, cf,
           CAST(FLOOR((cs * LN(25e-2 / 2e-1) + cf * LN(75e-2 / 8e-1))
                      * 1e6 + 5e-1) AS BIGINT) AS llr_micro,
           CAST(FLOOR(LN(19e0) * 1e6 + 5e-1) AS BIGINT) AS bound_micro
    FROM c
),
dec AS (
    SELECT day, trials, conv, llr_micro,
           CASE WHEN llr_micro >= bound_micro THEN 'reject_h0'
                WHEN llr_micro <= -bound_micro THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM st
)
SELECT day, trials, conv, llr_micro, state,
       MIN(CASE WHEN state <> 'continue' THEN day END) OVER ()
           AS first_decision_day
FROM dec
"""

_SPRT_DAY_DUCK = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
_SPRT_DAY_SPARK = "cast(unix_micros(ts) div 86400000000 as bigint)"


@register("ext_sprt_monitor",
          oracle=_SPRT_BODY.format(day=_SPRT_DAY_DUCK),
          tags=("ext", "curation", "stats", "sequential"))
def ext_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (1945) run day by day
    over the purchase-conversion stream: cumulative log-likelihood
    ratio of H1 (p=0.25, elevated conversion) against H0 (p=0.20),
    with the alpha=beta=0.05 decision boundaries +/-ln(19) and the
    first boundary-crossing day — the ALWAYS-VALID monitoring member
    of the experimentation family (`ext_power_analysis` sizes a FIXED
    design up front, `ext_ab_srm_check` audits its randomization,
    `ext_cuped_adjust` shrinks its variance; SPRT is what you run when
    you want to STOP the moment the evidence is in, with type-I/II
    error controlled at every look, Wald's optional-stopping
    guarantee).

    Determinism: daily trial/conversion counts and their running sums
    are exact integers (the running frame orders by the integer day —
    total order, no ties); the LLR is cs*ln(p1/p0) + cf*ln(q1/q0) —
    two bit-exact LN literals scaled by exact int64 counts, ONE
    fixed-order close per day, micro-quantized (|llr| <= 7e-2 * N so
    micro holds int64 to ~1.3e14 events); the boundary is the same
    quantized literal on both engines.

    Scale shape: ONE map-side-combinable day reduce; everything after
    is window algebra on the ~report-length day table."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("sprt_events")
    return spark.sql(_SPRT_BODY.format(day=_SPRT_DAY_SPARK)
                     .replace("FROM events", "FROM sprt_events"))


# --------------------------------------------------------------------------
# ext_dp_histogram — epsilon-DP Laplace histogram release audit
# --------------------------------------------------------------------------

_DP_BODY = """
WITH base AS (
    SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS true_n
    FROM customer GROUP BY c_mktsegment
),
noised AS (
    SELECT segment, true_n,
           ({hb} / 1152921504606846976e0) AS u
    FROM base
)
SELECT segment, true_n,
       CAST(FLOOR((CAST(true_n AS DOUBLE)
             - CASE WHEN u >= 5e-1 THEN 1e0 ELSE -1e0 END
               * LN(GREATEST(1e0 - 2e0 * ABS(u - 5e-1), 1e-18))) * 1e3
             + 5e-1) AS BIGINT) AS released_milli,
       CAST(FLOOR(ABS(LN(GREATEST(1e0 - 2e0 * ABS(u - 5e-1), 1e-18)))
             * 1e3 + 5e-1) AS BIGINT) AS noise_abs_milli
FROM noised
"""

_DP_HB_DUCK = ("CAST(concat('0x', substr(md5(segment), 1, 15)) AS BIGINT)")
_DP_HB_SPARK = ("cast(conv(substring(md5(segment), 1, 15), 16, 10)"
                " as bigint)")


@register("ext_dp_histogram",
          oracle=_DP_BODY.format(hb=_DP_HB_DUCK),
          tags=("ext", "curation", "privacy"))
def ext_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release audit: the per-segment
    customer counts with Laplace(1/eps) noise at eps = 1 (count queries
    have sensitivity 1), via the inverse-CDF transform
    x = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|) — the release
    mechanism every DP data-sharing pipeline runs in front of
    aggregate exports, completing the privacy family
    (`ext_kanonymity_census` = re-identification risk,
    `ext_ldiversity_audit` = attribute disclosure, this = the
    perturbation release). Emits true count, released value, and
    realized |noise| per cell — the utility audit (as an engine query
    the true counts are retained for auditing; a production release
    drops them).

    Determinism: u is a row-local md5 uniform over the cell name
    (never engine RNG), LN/ABS are in the measured bit-exact set, the
    GREATEST(.., 1e-18) guard removes the measure-zero LN(0) edge
    identically on both engines (DuckDB errors on LN(0), Spark yields
    -Infinity — the known divergence class), and the release
    milli-quantizes one fixed-order IEEE chain. Per-row algebra only.

    Scale shape: ONE map-side-combinable groupBy to the cell
    dimension; noise is per-cell scan-stage codegen. Cell count is the
    only state — the release is dimension-sized at any corpus size.

    Reference basis: per-cell statistical release over the monitored
    dimension (the per-channel trigger-rate export,
    Documentation-Self-Triggering.html:194-239) with the DP mechanism
    from Dwork et al. 2006 (public)."""
    ensure_deterministic(spark)
    cust = table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("dp_cust")
    return spark.sql(_DP_BODY.format(hb=_DP_HB_SPARK)
                     .replace("FROM customer", "FROM dp_cust"))


# --------------------------------------------------------------------------
# ext_kruskal_wallis — k-group rank test (the non-parametric ANOVA)
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The rank algebra follows
#: `ext_mann_whitney_u` (grouped-by-value midranks: doubled average rank
#: per distinct length is the exact integer 2*cum + c + 1), generalized
#: to k groups: per-group doubled rank sums accumulate as DECIMAL(38,0)
#: (exact and associative at any corpus size — R2_g <= N(N+1) wraps
#: int64 near N ~ 3e9 rows, inside 100 TB range), the per-group
#: deviation terms n_g*(rbar_g - (N+1)/2)^2 are deci-quantized THEN
#: integer-summed across the bounded k groups (the `agg_anova_oneway`
#: headroom trade), and the tie term sums t^3 - t as DECIMAL(38,0).
_KW_BODY = """
WITH v AS (
    SELECT n_chars, lang, CAST(COUNT(*) AS BIGINT) AS c_gl
    FROM {src} GROUP BY n_chars, lang
),
t AS (
    SELECT n_chars, CAST(SUM(c_gl) AS BIGINT) AS c FROM v GROUP BY n_chars
),
r AS (
    SELECT n_chars, c,
           CAST(COALESCE(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
    FROM t
),
g AS (
    SELECT v.lang, CAST(SUM(v.c_gl) AS BIGINT) AS n_g,
           SUM(CAST(v.c_gl AS DECIMAL(38,0))
               * (2 * r.cum + r.c + 1)) AS r2_g
    FROM v JOIN r ON v.n_chars = r.n_chars
    GROUP BY v.lang
),
n AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM g
),
ties AS (
    SELECT SUM(CAST(c AS DECIMAL(38,0)) * c * c
               - CAST(c AS DECIMAL(38,0))) AS tsum
    FROM t
),
terms AS (
    SELECT ANY_VALUE(n.n) AS n, ANY_VALUE(n.k) AS k,
           CAST(SUM(CAST(FLOOR(g.n_g
                * (CAST(g.r2_g AS DOUBLE) / (2e0 * g.n_g) - (n.n + 1e0) / 2e0)
                * (CAST(g.r2_g AS DOUBLE) / (2e0 * g.n_g) - (n.n + 1e0) / 2e0)
                * 1e1 + 5e-1) AS BIGINT)) AS BIGINT) AS w_deci
    FROM g CROSS JOIN n
),
h AS (
    SELECT n, k,
           12e0 / (n * (n + 1e0)) * (w_deci / 1e1) AS h_raw,
           1e0 - CAST((SELECT tsum FROM ties) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * n - n) AS tie_corr
    FROM terms
)
SELECT k AS n_groups, n AS n_rows,
       CAST(FLOOR(h_raw * 1e3 + 5e-1) AS BIGINT) AS h_milli,
       CAST(FLOOR(h_raw / tie_corr * 1e3 + 5e-1) AS BIGINT)
           AS h_corr_milli,
       CAST(FLOOR((h_raw / tie_corr - k + 1e0) / (n - k * 1e0) * 1e6
                  + 5e-1) AS BIGINT) AS eps2_micro
FROM h
WHERE k > 1 AND n > k AND tie_corr > 0e0
"""


@register("ext_kruskal_wallis", oracle=_KW_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis 1952): do the k language
    cohorts' document-length distributions differ anywhere? The k-group
    generalization of `ext_mann_whitney_u` and the rank-based sibling of
    `agg_anova_oneway` — the omnibus test curation teams run when length
    distributions are too skewed for the F test's normality comfort,
    before any pairwise battery (`ext_fdr_bh` corrects what follows).
    Emits H, the tie-corrected H, and the epsilon-squared effect size
    (H - k + 1)/(n - k).

    Determinism: ranks never materialize per row — per distinct value the
    doubled midrank 2*cum + c + 1 is an exact integer; per-group doubled
    rank sums accumulate as DECIMAL(38,0) (exact in any merge order, no
    int64 wrap until far past 100 TB); the k per-group deviation terms
    are deci-quantized then integer-summed (the ANOVA headroom trade:
    error <= 0.05*k absolute, far under the milli output quantum); the
    tie sum t^3 - t is DECIMAL(38,0); H closes in one fixed-order IEEE
    chain.

    Scale shape: one groupBy(value, group) reduce (map-side combinable),
    a window over DISTINCT values (bounded by value cardinality), a
    k-row reduce. No per-row ranking shuffle anywhere.

    Reference basis: the per-channel rate-comparison census
    (Documentation-Self-Triggering.html:194-239) as a k-cohort
    distributional test; statistic from Kruskal & Wallis 1952 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kw_docs")
    return spark.sql(_KW_BODY.format(src="kw_docs"))


# --------------------------------------------------------------------------
# ext_tcloseness_audit — t-closeness over equivalence classes (privacy)
# --------------------------------------------------------------------------

#: shared body ({src} = customer view). The sensitive attribute
#: (account balance) is binned into 11 fixed-width bins over the
#: [-1000, 10100) domain; EMD against the global distribution over the
#: ORDERED bins is computed entirely in integers: per (segment, bin)
#: the CDF-gap numerator |cum_g * n_tot - cum_tot * n_g| is an exact
#: DECIMAL(38,0) product of counts, summed over the bounded bin
#: dimension, and divided once at the close.
_TCLOSE_BODY = """
WITH b AS (
    SELECT c_mktsegment AS seg,
           CAST(FLOOR((c_acctbal + 1000e0) / 1100e0) AS BIGINT) AS bin
    FROM {src}
),
cnt AS (
    SELECT seg, bin, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY seg, bin
),
grid AS (
    SELECT s.seg, x.bin
    FROM (SELECT DISTINCT seg FROM b) s
    CROSS JOIN (SELECT DISTINCT bin FROM b) x
),
f AS (
    SELECT g.seg, g.bin, COALESCE(c.c, 0) AS c
    FROM grid g LEFT JOIN cnt c ON g.seg = c.seg AND g.bin = c.bin
),
cum AS (
    SELECT seg, bin, c,
           CAST(SUM(c) OVER (PARTITION BY seg ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_g
    FROM f
),
tot AS (
    SELECT bin, CAST(SUM(c) AS BIGINT) AS ct,
           CAST(SUM(SUM(c)) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_t
    FROM f GROUP BY bin
),
sizes AS (
    SELECT seg, CAST(SUM(c) AS BIGINT) AS n_g FROM f GROUP BY seg
),
n AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tot,
             CAST(COUNT(*) AS BIGINT) AS n_bins FROM tot),
gaps AS (
    SELECT c.seg,
           SUM(ABS(CAST(c.cum_g AS DECIMAL(38,0)) * n.n_tot
                   - CAST(t.cum_t AS DECIMAL(38,0)) * s.n_g)) AS gap
    FROM cum c
    JOIN tot t ON c.bin = t.bin
    JOIN sizes s ON c.seg = s.seg
    CROSS JOIN n
    GROUP BY c.seg
)
SELECT g.seg, s.n_g,
       CAST(FLOOR(CAST(g.gap AS DOUBLE)
            / (CAST(s.n_g AS DOUBLE) * n.n_tot * (n.n_bins - 1e0))
            * 1e6 + 5e-1) AS BIGINT) AS emd_micro,
       CAST(CAST(g.gap AS DOUBLE)
            / (CAST(s.n_g AS DOUBLE) * n.n_tot * (n.n_bins - 1e0))
            > 2e-1 AS BOOLEAN) AS t_breach
FROM gaps g JOIN sizes s ON g.seg = s.seg CROSS JOIN n
"""


@register("ext_tcloseness_audit",
          oracle=_TCLOSE_BODY.format(src="customer"),
          tags=("ext", "curation", "privacy"))
def ext_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): for
    each quasi-identifier equivalence class (market segment), the earth
    mover's distance between the class's sensitive-attribute distribution
    (account balance, 11 fixed-width bins) and the GLOBAL distribution —
    the disclosure measure that catches what `ext_kanonymity_census`
    (class size) and `ext_ldiversity_audit` (distinct sensitive values)
    both miss: a class whose values are diverse but skewed toward one
    end of the domain still leaks. For ordered attributes the EMD is the
    mean absolute CDF gap over bins; classes with EMD > t = 0.2 are
    flagged. Completes the syntactic-privacy family beside the
    perturbation release (`ext_dp_histogram`).

    Determinism: the CDF-gap numerator |cum_g*n_tot - cum_t*n_g| is an
    exact integer product per (class, bin) — DECIMAL(38,0) keeps it
    exact past int64 range — summed over the bounded bin dimension; one
    fixed-order IEEE division closes the EMD, micro-quantized.

    Scale shape: one groupBy(class, bin) reduce (map-side combinable) to
    a classes-x-bins table, windows over the BOUNDED bin dimension, and
    a bounded 55-row grid cross join — nothing downstream of the first
    reduce scales with the corpus.

    Reference basis: per-class distributional comparison against the
    global baseline (the reference's per-channel rate-vs-baseline audit,
    Documentation-Self-Triggering.html:194-239); t-closeness definition
    from Li et al. 2007 (public)."""
    ensure_deterministic(spark)
    cust = table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("tclose_cust")
    return spark.sql(_TCLOSE_BODY.format(src="tclose_cust"))


# --------------------------------------------------------------------------
# ext_ridge_normal_equations — closed-form ridge via distributed moments
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The d=2 (+intercept) Gram
#: moments are quantized per ROW at 1e4 then integer-summed (exact in
#: any order; per-row |term| <= ~2.4e3 so the 1e4-scaled int stays
#: under 2.4e7 per row — int64 headroom to ~3.8e11 rows, past 100 TB of
#: 2 KB docs), the 3x3 ridge system (X'X + lambda*I_off) w = X'y closes
#: by Cramer's rule in fixed-order IEEE on the 1-row reduce, and a
#: second pass scores the training MSE against the closed-form weights.
_RIDGE_LAMBDA = "1e1"

_RIDGE_FEATS = """
    SELECT LN(1e0 + {wc}) AS x1,
           (CAST(n_chars AS DOUBLE) / ({wc} + 1e0)) AS x2,
           LN(1e0 + CAST(n_chars AS DOUBLE)) AS y
    FROM {src} WHERE n_chars > 0
"""

_RIDGE_BODY = """
WITH feats AS ({feats}),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(x1 * 1e4 + 5e-1) AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(CAST(FLOOR(x2 * 1e4 + 5e-1) AS BIGINT)) AS BIGINT) AS s2,
           CAST(SUM(CAST(FLOOR(y  * 1e4 + 5e-1) AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM(CAST(FLOOR(x1 * x1 * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s11,
           CAST(SUM(CAST(FLOOR(x1 * x2 * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s12,
           CAST(SUM(CAST(FLOOR(x2 * x2 * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s22,
           CAST(SUM(CAST(FLOOR(x1 * y * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s1y,
           CAST(SUM(CAST(FLOOR(x2 * y * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s2y
    FROM feats
),
a AS (
    SELECT n,
           CAST(n AS DOUBLE)   AS a11, s1 / 1e4 AS a12, s2 / 1e4 AS a13,
           s1 / 1e4 AS a21, s11 / 1e4 + {lam} AS a22, s12 / 1e4 AS a23,
           s2 / 1e4 AS a31, s12 / 1e4 AS a32, s22 / 1e4 + {lam} AS a33,
           sy / 1e4 AS b1, s1y / 1e4 AS b2, s2y / 1e4 AS b3
    FROM m
),
d AS (
    SELECT n, b1, b2, b3, a11, a12, a13, a21, a22, a23, a31, a32, a33,
           a11 * (a22 * a33 - a23 * a32)
         - a12 * (a21 * a33 - a23 * a31)
         + a13 * (a21 * a32 - a22 * a31) AS det
    FROM a
),
w AS (
    SELECT n, det,
           (b1 * (a22 * a33 - a23 * a32)
          - a12 * (b2 * a33 - a23 * b3)
          + a13 * (b2 * a32 - a22 * b3)) / det AS w0,
           (a11 * (b2 * a33 - a23 * b3)
          - b1 * (a21 * a33 - a23 * a31)
          + a13 * (a21 * b3 - b2 * a31)) / det AS w1,
           (a11 * (a22 * b3 - b2 * a32)
          - a12 * (a21 * b3 - b2 * a31)
          + b1 * (a21 * a32 - a22 * a31)) / det AS w2
    FROM d
),
sc AS (
    SELECT ANY_VALUE(w.n) AS n, ANY_VALUE(w.det) AS det,
           ANY_VALUE(w.w0) AS w0, ANY_VALUE(w.w1) AS w1,
           ANY_VALUE(w.w2) AS w2,
           CAST(SUM(CAST(FLOOR((f.y - (w.w0 + w.w1 * f.x1 + w.w2 * f.x2))
                * (f.y - (w.w0 + w.w1 * f.x1 + w.w2 * f.x2))
                * 1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS sse_micro
    FROM feats f CROSS JOIN w
)
SELECT n AS n_rows,
       CAST(FLOOR(det * 1e3 + 5e-1) AS BIGINT) AS det_milli,
       CAST(FLOOR(w0 * 1e6 + 5e-1) AS BIGINT) AS w0_micro,
       CAST(FLOOR(w1 * 1e6 + 5e-1) AS BIGINT) AS w1_micro,
       CAST(FLOOR(w2 * 1e6 + 5e-1) AS BIGINT) AS w2_micro,
       CAST(FLOOR(sse_micro / 1e6 / n * 1e6 + 5e-1) AS BIGINT)
           AS mse_micro
FROM sc
WHERE det > 0e0
"""


_RIDGE_ORACLE = _RIDGE_BODY.format(
    feats=_RIDGE_FEATS.format(src="documents", wc=_sc.WS_COUNT_SQL),
    lam=_RIDGE_LAMBDA)


@register("ext_ridge_normal_equations", oracle=_RIDGE_ORACLE,
          tags=("ext", "curation", "training"))
def ext_ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression via distributed normal equations
    (Hoerl & Kennard 1970): ONE pass accumulates the d^2 Gram moments of
    the 2-feature + intercept design (the `ext_logreg_train_step`
    features: log word count, chars per word; target = log document
    length), the driver-free 3x3 system (X'X + lambda*I)w = X'y closes
    by Cramer's rule inside the same plan, and a SECOND pass scores the
    training MSE against the solved weights. The reduce-to-d^2-then-
    solve shape is the canonical 100-TB linear-model recipe: corpus size
    only enters through the two scans; the solve is dimension-sized.

    Determinism: every per-row moment term is quantized at 1e4 then
    integer-summed (exact in any partitioning/merge order; headroom
    documented above), the Cramer determinants are fixed-order IEEE
    chains from the integer sums, and the second-pass residuals micro-
    quantize before the exact integer sum.

    Scale shape: two scans, each a map-side-combinable 1-row reduce; the
    weight row broadcasts to the scoring pass (1-row cross join). No
    driver round-trip — weights flow through the plan.

    Reference basis: the reference's per-pixel threshold fits (DAC
    threshold = baseline + offset per pixel,
    DAQ_self-triggering.md:84-86) generalized to a regularized
    multi-feature fit; closed-form ridge from Hoerl & Kennard 1970
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ridge_docs")
    feats = _RIDGE_FEATS.format(src="ridge_docs",
                                wc=_sc.WS_COUNT_SQL_SPARK)
    return spark.sql(_RIDGE_BODY.format(feats=feats, lam=_RIDGE_LAMBDA))


# --------------------------------------------------------------------------
# ext_ips_offpolicy_eval — clipped IPS / SNIPS off-policy value estimate
# --------------------------------------------------------------------------

#: shared body ({src} = events view). Context = user_id % 3; behavior
#: propensities are exact count ratios; the target policy is the
#: greedy-by-mean-reward action per context (argmax over exact cent
#: sums with a deterministic name tie-break); importance weights
#: n_ctx/n_ctx_act clip at 10 and the weighted-reward / weight /
#: weight^2 sums quantize per row at 1e3 before exact integer
#: accumulation.
_IPS_CLIP = "1e1"

_IPS_BODY = """
WITH e AS (
    SELECT CAST(user_id % 3 AS BIGINT) AS ctx, event_type AS act,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS r_cents
    FROM {src}
),
cnt AS (
    SELECT ctx, act, CAST(COUNT(*) AS BIGINT) AS n_ca,
           CAST(SUM(r_cents) AS BIGINT) AS s_cents
    FROM e GROUP BY ctx, act
),
cn AS (
    SELECT ctx, CAST(SUM(n_ca) AS BIGINT) AS n_c FROM cnt GROUP BY ctx
),
pi AS (
    SELECT ctx, act AS pi_act FROM (
        SELECT ctx, act,
               ROW_NUMBER() OVER (PARTITION BY ctx
                   ORDER BY CAST(s_cents AS DOUBLE) / n_ca DESC, act) AS rk
        FROM cnt
    ) ranked WHERE rk = 1
),
w AS (
    SELECT e.ctx,
           CASE WHEN e.act = p.pi_act
                THEN LEAST(CAST(cn.n_c AS DOUBLE) / c.n_ca, {clip})
                ELSE 0e0 END AS wt,
           CASE WHEN e.act = p.pi_act
                AND CAST(cn.n_c AS DOUBLE) / c.n_ca > {clip}
                THEN 1 ELSE 0 END AS clipped,
           e.r_cents / 1e2 AS r
    FROM e
    JOIN pi p ON e.ctx = p.ctx
    JOIN cn ON e.ctx = cn.ctx
    JOIN cnt c ON e.ctx = c.ctx AND e.act = c.act
),
s AS (
    SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(wt * r * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS swr_milli,
           CAST(SUM(CAST(FLOOR(wt * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sw_milli,
           CAST(SUM(CAST(FLOOR(wt * wt * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sww_milli,
           CAST(SUM(clipped) AS BIGINT) AS n_clipped
    FROM w GROUP BY ctx
)
SELECT ctx, n,
       CAST(FLOOR(swr_milli / 1e3 / n * 1e3 + 5e-1) AS BIGINT)
           AS ips_milli,
       CAST(FLOOR(CAST(swr_milli AS DOUBLE) / sw_milli * 1e3 + 5e-1)
            AS BIGINT) AS snips_milli,
       CAST(FLOOR(CAST(sw_milli AS DOUBLE) * sw_milli / 1e3 / sww_milli
                  + 5e-1) AS BIGINT) AS ess_floor,
       CAST(FLOOR(CAST(n_clipped AS DOUBLE) / n * 1e6 + 5e-1) AS BIGINT)
           AS clip_frac_micro
FROM s
WHERE sw_milli > 0 AND sww_milli > 0
"""


@register("ext_ips_offpolicy_eval",
          oracle=_IPS_BODY.format(src="events", clip=_IPS_CLIP),
          tags=("ext", "curation", "policy"))
def ext_ips_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped inverse-propensity-score off-policy evaluation (Horvitz &
    Thompson 1952; Dudik, Langford & Li 2011): estimate, from LOGGED
    events only, the reward a greedy target policy would have earned per
    user context — the counterfactual question every
    recommendation/labeling pipeline asks before an online test.
    Behavior propensities come from observed (context, action)
    frequencies; the target policy is greedy by mean logged reward;
    weights clip at 10. Emits per context: the IPS estimate, the
    self-normalized SNIPS estimate (lower variance, the production
    default), the effective sample size (sum w)^2 / sum w^2 — the
    honesty metric that says how much logged data actually supports the
    counterfactual — and the clipped fraction.

    Determinism: propensities are exact integer-count ratios; the greedy
    argmax orders by an exact (cent-sum / count) division with an action
    tie-break; per-row weighted terms quantize at 1e3 then integer-sum
    (exact any order; per-row wt*r <= 10*491 so the scaled term stays
    under 5e6 — int64 headroom past 1e12 rows); closes are fixed-order
    IEEE divisions of the integer sums.

    Scale shape: one groupBy(ctx, act) reduce for propensities and
    policy (bounded dimension), one broadcast-joined scan for the
    weighted sums, one bounded reduce. The fact table is scanned twice,
    shuffled never (both joins broadcast the 15-row stats side).

    Reference basis: the reference's rate-normalized channel monitoring
    (Documentation-Self-Triggering.html:194-239) recast as
    counterfactual policy evaluation; estimators from Horvitz-Thompson
    1952 / Dudik et al. 2011 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ips_events")
    return spark.sql(_IPS_BODY.format(src="ips_events", clip=_IPS_CLIP))


# --------------------------------------------------------------------------
# ext_adamic_adar — link prediction over the verified near-dup graph
# --------------------------------------------------------------------------

#: single-permutation collision graph: docs colliding on ANY of the 8
#: min-shingle values (width-1 "bands" = an inverted index on minima) —
#: the deliberately high-recall topology link prediction needs; the
#: verified 0.5-graph is a union of cliques where every wedge closes.
_AA_CANDS_SQL = """
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b ON a.k = b.k AND a.minhash = b.minhash
    WHERE a.doc_id < b.doc_id
)
"""

#: tail shared verbatim by both engines once a `cands(doc_a, doc_b)`
#: relation exists (doc_a < doc_b). Two-hop candidates enumerate per
#: MIDDLE vertex (cost sum(deg^2), the standard distributed shape);
#: each common neighbor contributes floor(1e6/ln(deg)) micro-units —
#: deterministic per-row IEEE, exact integer sums.
_AA_TAIL = """
ed AS (
    SELECT doc_a AS u, doc_b AS v FROM cands
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM cands
),
deg AS (
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY u
),
paths AS (
    SELECT e1.v AS a, e1.u AS b, e2.v AS c
    FROM ed e1 JOIN ed e2 ON e1.u = e2.u AND e1.v < e2.v
),
cand AS (
    SELECT p.a, p.c, CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(CAST(FLOOR(1e6 / LN(CAST(d.deg AS DOUBLE)) + 5e-1)
                         AS BIGINT)) AS BIGINT) AS aa_micro
    FROM paths p JOIN deg d ON p.b = d.node
    WHERE NOT EXISTS (SELECT 1 FROM cands x
                      WHERE x.doc_a = p.a AND x.doc_b = p.c)
    GROUP BY p.a, p.c
)
SELECT a AS doc_a, c AS doc_b, n_common, aa_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY aa_micro DESC, a, c) AS rk
      FROM cand)
WHERE rk <= 15
"""

_AA_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_AA_CANDS_SQL},
{_AA_TAIL}
"""


@register("ext_adamic_adar", oracle=_AA_SQL, tags=("ext", "graph"))
def ext_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the
    single-permutation MinHash collision graph: for vertex pairs that
    never collide DIRECTLY on any of the 8 min-shingle values, score
    their two-hop affinity as sum over common neighbors of 1/ln(deg) —
    hub neighbors count less. The top-15 predicted links are exactly
    the pairs a second verification pass should Jaccard next: two
    documents sharing many low-degree collision neighbors are likely
    near-dups the banding design missed — the recall patch on top of
    `ext_dedup_lsh_candidates`. (Width-1 "bands" — an inverted index
    on signature minima — are the deliberate high-recall choice here:
    the verified 0.5-graph is a union of cliques where every wedge
    closes, so link prediction has no signal on it.) Complements
    `ext_graph_triangles` (closed cohesion) with the OPEN-wedge census.

    Determinism: common-neighbor enumeration and the NOT EXISTS edge
    filter are exact set algebra; each neighbor's 1/ln(deg) term
    micro-quantizes per path row (a middle vertex of any wedge has
    deg >= 2, so ln > 0 with no guard) before exact integer sums; the
    top-15 orders by the integer score with a (doc_a, doc_b) tie-break.

    Scale shape: wedges enumerate per middle vertex — an equi-join on
    the middle key with cost sum(deg^2), never all-pairs; edges come
    from the (k, minhash) inverted-index equi-join (cost sum over
    buckets of |bucket|^2 — the width-1 trade buys recall with bigger
    buckets, so at extreme scale this audit runs per-domain or on a
    sampled slice, like every sum-bucket-squared detector in the dedup
    family). AQE skew-split applies to hub vertices (the planted-skew
    plan test pins splitting engine-wide); the candidate list
    localCheckpoints once for its three consumers (edges, degrees,
    existence filter).

    Reference basis: neighborhood-overlap scoring over the duplicate
    graph (the reference's correlation census,
    Documentation-Self-Triggering.html:239+); weighting from Adamic &
    Adar 2003 (public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import ext_dedup_minhash
    sigs = ext_dedup_minhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    cands = (a.join(b, ["k", "minhash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    cands.createOrReplaceTempView("aa_cands")
    return spark.sql("WITH " + _AA_TAIL.replace("FROM cands", "FROM aa_cands"))


# --------------------------------------------------------------------------
# ext_adamic_adar_capped — deg-capped wedge census (the 100 TB lowering)
# --------------------------------------------------------------------------

#: middle-vertex degree cap: wedges are enumerated only THROUGH vertices
#: of collision-degree <= 32, bounding the census at
#: sum(min(deg, 32)^2) <= 1024 * |V| — linear in vertices whatever the
#: hub distribution does. Hub middles are exactly the LOW-SIGNAL ones
#: (a middle of degree d contributes 1/ln(d) per wedge, monotonically
#: shrinking in d), so the cap trades the least-informative wedges for
#: a hard cost ceiling.
_AA_DEG_CAP = 32

#: tail shared verbatim by both engines over `cands(doc_a, doc_b)`:
#: identical to `_AA_TAIL` except wedge middles filter to deg <= {cap}
#: BEFORE enumeration; the 1/ln(deg) scoring, the NOT EXISTS edge
#: filter and the top-15 close are unchanged.
_AA_CAPPED_TAIL = """
ed AS (
    SELECT doc_a AS u, doc_b AS v FROM cands
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM cands
),
deg AS (
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY u
),
edc AS (
    SELECT e.u, e.v FROM ed e JOIN deg d ON e.u = d.node
    WHERE d.deg <= {cap}
),
paths AS (
    SELECT e1.v AS a, e1.u AS b, e2.v AS c
    FROM edc e1 JOIN edc e2 ON e1.u = e2.u AND e1.v < e2.v
),
cand AS (
    SELECT p.a, p.c, CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(CAST(FLOOR(1e6 / LN(CAST(d.deg AS DOUBLE)) + 5e-1)
                         AS BIGINT)) AS BIGINT) AS aa_micro
    FROM paths p JOIN deg d ON p.b = d.node
    WHERE NOT EXISTS (SELECT 1 FROM cands x
                      WHERE x.doc_a = p.a AND x.doc_b = p.c)
    GROUP BY p.a, p.c
)
SELECT a AS doc_a, c AS doc_b, n_common, aa_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY aa_micro DESC, a, c) AS rk
      FROM cand)
WHERE rk <= 15
"""

_AA_CAPPED_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_AA_CANDS_SQL},
{_AA_CAPPED_TAIL.format(cap=_AA_DEG_CAP)}
"""


@register("ext_adamic_adar_capped", oracle=_AA_CAPPED_SQL,
          tags=("ext", "graph"))
def ext_adamic_adar_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-capped Adamic-Adar link prediction — the registered
    100 TB lowering that `ext_adamic_adar`'s docstring promises in
    prose (SCALE_SF1 left the uncapped census unmeasured at 10x; this
    variant is bounded by construction and IS measured, SCALE_SF2).
    Wedges are enumerated only through middle vertices whose
    collision-degree is <= 32, so the census costs
    sum(min(deg, 32)^2) <= 1024*|V| — LINEAR in vertices no matter how
    a template-farm crawl (or the synthetic small-vocab corpus) piles
    mass onto hot shingle values. The dropped wedges are precisely the
    lowest-weight ones: a middle of degree d contributes 1/ln(d) per
    wedge, monotonically shrinking in d, so hub middles carry the
    least link-prediction signal per unit of compute — the same
    argument that lets every sum-bucket-squared detector in the dedup
    family cap or sample its hottest buckets (cf.
    `ext_shingle_hot_audit`).

    Determinism: the cap is an exact integer predicate over exact
    degree counts; everything downstream is `ext_adamic_adar`'s
    integer algebra unchanged (micro-quantized 1/ln(deg) terms, exact
    integer sums, total-order top-15).

    Scale shape: one extra equi-join (the degree table onto the edge
    list, both collision-graph-sized) ahead of the middle-vertex
    wedge equi-join; the NOT EXISTS anti-join and the top-15
    TakeOrderedAndProject carry over from the uncapped plan. At 100 TB
    this is the corpus-wide variant; the uncapped census stays a
    per-domain/sampled-slice audit.

    Reference basis: neighborhood-overlap scoring over the duplicate
    graph (the reference's correlation census, DAQ_self-triggering.md:
    235-236, recast); weighting from Adamic & Adar 2003 (public);
    hub-capping as in production-scale link prediction (Gupta et al.,
    "WTF: The Who to Follow Service at Twitter", WWW 2013 — public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import ext_dedup_minhash
    sigs = ext_dedup_minhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    cands = (a.join(b, ["k", "minhash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    cands.createOrReplaceTempView("aac_cands")
    return spark.sql(
        "WITH " + _AA_CAPPED_TAIL.format(cap=_AA_DEG_CAP)
        .replace("FROM cands", "FROM aac_cands"))


# --------------------------------------------------------------------------
# ext_degree_assortativity — degree-mixing coefficient of the dup graph
# --------------------------------------------------------------------------

#: tail shared verbatim by both engines over `cands` (doc_a < doc_b;
#: the same single-permutation collision graph as `ext_adamic_adar` —
#: the VERIFIED graph is a union of cliques where endpoint degrees are
#: equal on every edge, making r degenerate at exactly 1).
#: With both edge orientations included the Pearson form is symmetric:
#: r = (M*Sjk - Sj^2) / (M*Sjj - Sj^2) over directed edges, where every
#: sum is an exact integer (degrees are counts; DECIMAL(38,0) carries
#: hub-heavy products past int64) and the close is one IEEE division.
_ASSORT_TAIL = """
ed AS (
    SELECT doc_a AS u, doc_b AS v FROM cands
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM cands
),
deg AS (
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY u
),
j AS (
    SELECT du.deg AS dj, dv.deg AS dk
    FROM ed e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           SUM(CAST(dj AS DECIMAL(38,0))) AS sj,
           SUM(CAST(dj AS DECIMAL(38,0)) * dk) AS sjk,
           SUM(CAST(dj AS DECIMAL(38,0)) * dj) AS sjj
    FROM j
)
SELECT m AS n_directed_edges,
       CAST(sj AS BIGINT) AS sum_deg,
       CAST(sjk AS BIGINT) AS sum_jk,
       CAST(FLOOR((CAST(m AS DOUBLE) * CAST(sjk AS DOUBLE)
                   - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
            / (CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
                   - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
            * 1e6 + 5e-1) AS BIGINT) AS r_micro
FROM s
WHERE m > 0 AND CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
      - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) > 0e0
"""

_ASSORT_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_AA_CANDS_SQL},
{_ASSORT_TAIL}
"""


@register("ext_degree_assortativity", oracle=_ASSORT_SQL,
          tags=("ext", "graph"))
def ext_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the MinHash collision
    graph (the `ext_adamic_adar` topology — on the VERIFIED graph,
    a union of cliques, endpoint degrees are equal edge-by-edge and r
    degenerates to exactly 1): the Pearson correlation of endpoint
    degrees over edges. Strongly positive r says collision clusters
    are degree-stratified (template farms collide with template farms
    — one removal policy suffices); negative r says hubs attach to
    leaves (boilerplate radiating into unique pages — removal must
    preserve the leaf side). The one-number topology census that tells
    a dedup team WHICH resolution policy (`ext_dedup_resolution`) fits
    the graph they actually have.

    Determinism: degrees are exact counts; the edge-endpoint product
    sums accumulate as DECIMAL(38,0) (deg products can pass int64 at
    hub-heavy collision graphs); the close is one fixed-order IEEE
    expression, micro-quantized.

    Scale shape: two equi-joins of the edge list against the
    node-degree table (broadcast at dimension scale, shuffled equi-join
    beyond) and a 1-row reduce. Never materializes anything bigger than
    the edge list; hub buckets inherit AQE skew-split.

    Reference basis: graph-census summary over the duplicate graph
    (Documentation-Self-Triggering.html:239+); coefficient from Newman
    2002 (public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import ext_dedup_minhash
    sigs = ext_dedup_minhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    cands = (a.join(b, ["k", "minhash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    cands.createOrReplaceTempView("assort_cands")
    return spark.sql(
        "WITH " + _ASSORT_TAIL.replace("FROM cands", "FROM assort_cands"))


# --------------------------------------------------------------------------
# ext_brown_forsythe — variance-homogeneity test (the ANOVA assumption)
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Group centers are LOWER
#: MEDIANS (order statistics of integers — exact, unlike means, and
#: robust, which is the Brown-Forsythe point); absolute deviations are
#: exact integers, so the one-way F on deviations reuses the
#: `agg_anova_oneway` integer-moment algebra verbatim: per-group
#: (n, sum dev, sum dev^2) int64, deci-quantized s^2/n cross-group
#: terms, fixed-order double close.
_BF_BODY = """
WITH v AS (
    SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY source, n_chars
),
w AS (
    SELECT source, n_chars, c,
           CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_g
    FROM v
),
med AS (
    SELECT source, MIN(n_chars) AS med
    FROM w
    WHERE cum >= CAST(FLOOR((n_g + 1) / 2e0) AS BIGINT)
    GROUP BY source
),
g AS (
    SELECT v.source, CAST(SUM(v.c) AS BIGINT) AS n,
           CAST(SUM(v.c * ABS(v.n_chars - m.med)) AS BIGINT) AS s,
           CAST(SUM(v.c * ABS(v.n_chars - m.med)
                        * ABS(v.n_chars - m.med)) AS BIGINT) AS q
    FROM v JOIN med m ON v.source = m.source
    GROUP BY v.source
),
t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(s) AS BIGINT) AS st,
           CAST(SUM(q) AS BIGINT) AS sq,
           CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / n * 1e1 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS w_deci
    FROM g
),
c AS (
    SELECT k, n, st, sq,
           GREATEST(CAST(sq AS DOUBLE) - w_deci / 1e1, 0e0) AS ssw,
           GREATEST(w_deci / 1e1 - CAST(st AS DOUBLE) * st / n, 0e0)
               AS ssb
    FROM t
)
SELECT k AS n_groups, n AS n_rows,
       CAST(FLOOR((ssb / (k - 1e0)) / (ssw / (n - k * 1e0)) * 1e3 + 5e-1)
            AS BIGINT) AS f_milli
FROM c
WHERE k > 1 AND n > k AND ssw > 0e0
"""


@register("ext_brown_forsythe", oracle=_BF_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Brown & Forsythe 1974; Levene's test with
    MEDIAN centers): are the k sources' length VARIANCES equal? This is
    the assumption `agg_anova_oneway`'s F test stands on — variance
    heterogeneity inflates ANOVA's false-positive rate, so the
    homogeneity check runs first; median centering (vs Levene's mean)
    keeps it valid under the skew corpus lengths always have. The
    statistic is a one-way F on absolute deviations from group medians.

    Determinism: group centers are lower medians — exact integer order
    statistics read off the grouped-by-value cumulative counts (never a
    per-row sort); absolute deviations are exact integers, so the
    F algebra is the ANOVA integer-moment discipline verbatim
    (int64 (n, sum, sum-of-squares) per group, deci-quantized
    cross-group terms, one fixed-order close).

    Scale shape: one groupBy(source, value) reduce, windows over the
    bounded distinct-value dimension, a broadcast median join back over
    the VALUE table (not the corpus), and a k-row reduce.

    Reference basis: per-channel spread comparison before rate tests
    (Documentation-Self-Triggering.html:194-239); statistic from Brown
    & Forsythe 1974 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bf_docs")
    return spark.sql(_BF_BODY.format(src="bf_docs"))


# --------------------------------------------------------------------------
# ext_hill_tail_index — heavy-tail exponent of the length distribution
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). k = floor(N/10); the (k+1)-th
#: largest value falls out of the DESC cumulative counts over distinct
#: values (no per-row sort); ties at the threshold contribute
#: ln(thr/thr) = 0 so only values STRICTLY above it enter the sum, each
#: ln(x/thr) micro-quantized per distinct value then integer-summed
#: with multiplicity.
_HILL_BODY = """
WITH v AS (
    SELECT n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} WHERE n_chars > 0 GROUP BY n_chars
),
r AS (
    SELECT x, c,
           CAST(SUM(c) OVER (ORDER BY x DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumtop,
           CAST(SUM(c) OVER () AS BIGINT) AS n
    FROM v
),
kk AS (
    SELECT n, CAST(FLOOR(n / 1e1) AS BIGINT) AS k FROM r LIMIT 1
),
thr AS (
    SELECT MAX(r.x) AS xk1
    FROM r CROSS JOIN kk
    WHERE r.cumtop >= kk.k + 1
),
s AS (
    SELECT ANY_VALUE(kk.n) AS n, ANY_VALUE(kk.k) AS k,
           ANY_VALUE(t.xk1) AS xk1,
           CAST(SUM(CASE WHEN r.x > t.xk1 THEN r.c
                * CAST(FLOOR(LN(CAST(r.x AS DOUBLE) / t.xk1) * 1e6 + 5e-1)
                       AS BIGINT) ELSE 0 END) AS BIGINT) AS lsum_micro
    FROM r CROSS JOIN kk CROSS JOIN thr t
)
SELECT n AS n_rows, k, xk1 AS tail_threshold,
       CAST(FLOOR(lsum_micro / 1e6 / k * 1e6 + 5e-1) AS BIGINT)
           AS hill_micro,
       CAST(FLOOR(1e0 / (lsum_micro / 1e6 / k) * 1e3 + 5e-1) AS BIGINT)
           AS alpha_milli
FROM s
WHERE k > 0 AND lsum_micro > 0
"""


@register("ext_hill_tail_index", oracle=_HILL_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) on the top decile of
    document lengths: H = (1/k) sum ln(x_(i) / x_(k+1)), alpha = 1/H —
    the standard answer to "HOW heavy is the length tail?", where
    `ext_zipf_slope` fits the rank law and `ext_cluster_size_powerlaw`
    fits cluster sizes. alpha near 1-2 means corpus cost is dominated
    by a few giant documents (shard by bytes, not docs; cap before
    packing); alpha > 3 means the tail is benign. The k-th order
    statistic comes off grouped-by-value DESC cumulative counts, never
    a per-row sort.

    Determinism: the threshold is an exact integer order statistic;
    threshold ties contribute exactly zero so only strictly-above
    values enter; each distinct value's ln(x/thr) micro-quantizes
    before the multiplicity-weighted integer sum; the two closes are
    fixed-order IEEE.

    Scale shape: one groupBy(value) reduce (map-side combinable), one
    window over the bounded distinct-value dimension, 1-row crosses.
    Nothing after the first reduce scales with the corpus.

    Reference basis: the reference's noise_width distribution
    summaries (per-ETROC histograms with distribution statistics,
    DAQ_self-triggering.md:91-93), whose upper tail is exactly what a
    tail-index census quantifies; estimator from Hill 1975 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("hill_docs")
    return spark.sql(_HILL_BODY.format(src="hill_docs"))


# --------------------------------------------------------------------------
# ext_theil_decomposition — inequality split between/within languages
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). mu = st/n is an exact-integer
#: rational; per distinct value the share term (x/mu)ln(x/mu)
#: micro-quantizes before the multiplicity-weighted integer sum;
#: the between-group sum runs over the bounded k language terms.
_THEIL_BODY = """
WITH tot AS (
    SELECT CAST(SUM(n_chars) AS BIGINT) AS st,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} WHERE n_chars > 0
),
v AS (
    SELECT n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} WHERE n_chars > 0 GROUP BY n_chars
),
tt AS (
    SELECT ANY_VALUE(t.n) AS n, ANY_VALUE(t.st) AS st,
           CAST(SUM(v.c * CAST(FLOOR(
                (CAST(v.x AS DOUBLE) * t.n / t.st)
                * LN(CAST(v.x AS DOUBLE) * t.n / t.st) * 1e6 + 5e-1)
                AS BIGINT)) AS BIGINT) AS tsum_micro
    FROM v CROSS JOIN tot t
),
g AS (
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sg,
           CAST(COUNT(*) AS BIGINT) AS cg
    FROM {src} WHERE n_chars > 0 GROUP BY lang
),
tb AS (
    SELECT CAST(SUM(CAST(FLOOR(
               (CAST(g.sg AS DOUBLE) / t.st)
               * LN((CAST(g.sg AS DOUBLE) / t.st)
                    / (CAST(g.cg AS DOUBLE) / t.n)) * 1e9 + 5e-1)
               AS BIGINT)) AS BIGINT) AS bsum_nano
    FROM g CROSS JOIN tot t
)
SELECT tt.n AS n_rows,
       CAST(FLOOR(tt.tsum_micro / 1e6 / tt.n * 1e6 + 5e-1) AS BIGINT)
           AS theil_micro,
       CAST(FLOOR(tb.bsum_nano / 1e9 * 1e6 + 5e-1) AS BIGINT)
           AS between_micro,
       CAST(FLOOR((tt.tsum_micro / 1e6 / tt.n - tb.bsum_nano / 1e9) * 1e6
                  + 5e-1) AS BIGINT) AS within_micro
FROM tt CROSS JOIN tb
WHERE tt.n > 0 AND tt.st > 0
"""


@register("ext_theil_decomposition",
          oracle=_THEIL_BODY.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index with exact between/within-language
    decomposition (Theil 1967): T = (1/n) sum (x/mu)ln(x/mu) over
    document lengths, split additively into the share explained by
    language-level mean differences (between) and the residual inside
    languages (within). The decomposable member of the concentration
    family — `agg_lorenz_curve`/`ext_gini_concentration` say HOW uneven
    the token budget is, Theil says WHERE the inequality lives, which
    is the decision input for per-language rebalancing
    (`ext_domain_mix_temperature`) vs within-language length capping.

    Determinism: mu and every group share are exact-integer rationals;
    per distinct value and per group the share terms micro/nano-
    quantize before multiplicity-weighted integer sums (value terms at
    1e6; the k between-terms at 1e9 since k is tiny and the between
    share needs the headroom-free precision); closes are fixed-order.

    Scale shape: two map-side-combinable reduces (per value, per
    language) off one scan each, 1-row crosses — dimension-sized after
    the first reduce.

    Reference basis: per-channel share-of-total censuses
    (Documentation-Self-Triggering.html:194-239); index from Theil
    1967 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("theil_docs")
    return spark.sql(_THEIL_BODY.format(src="theil_docs"))


# --------------------------------------------------------------------------
# ext_mcnemar_filters — paired disagreement test between the two filters
# --------------------------------------------------------------------------

#: shared body reusing the `ext_filter_agreement` 2x2 fragment: only
#: the DISCORDANT cells (rule-only passes n10, classifier-only passes
#: n01) carry information about marginal bias; the continuity-corrected
#: chi-square and the exact-integer discordant split are emitted.
_MCNEMAR_BODY = f"""
WITH feats AS (
    SELECT doc_id,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
lab AS (
    SELECT {_CAL_PASS_SQL} AS a,
           CASE WHEN CAST(FLOOR(1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) * 1e6 + 5e-1)
                     AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS b
    FROM feats
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
           CAST(SUM((1 - a) * b) AS BIGINT) AS n01
    FROM lab
)
SELECT n, n10, n01,
       CAST(FLOOR((ABS(n10 - n01) - 1e0) * (ABS(n10 - n01) - 1e0)
            / (n10 + n01) * 1e3 + 5e-1) AS BIGINT) AS chi2_cc_milli,
       CAST(FLOOR(CAST(n10 AS DOUBLE) / (n10 + n01) * 1e6 + 5e-1)
            AS BIGINT) AS rule_share_micro
FROM m
WHERE n10 + n01 > 0
"""


@register("ext_mcnemar_filters",
          oracle=_MCNEMAR_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "eval"))
def ext_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (McNemar 1947, continuity-corrected) on the
    two deployed quality filters: `ext_filter_agreement`'s kappa says
    HOW MUCH the rule chain and the trained classifier agree; McNemar
    says whether their DISAGREEMENT is biased — does one systematically
    pass documents the other rejects (n10 vs n01)? That asymmetry is
    the actionable signal: a significant chi2 with rule_share > 1/2
    means the rule chain is the lenient one and tightening IT changes
    the corpus, not the classifier threshold. Only the discordant cells
    enter — the statistic is immune to the easy-agreement mass that
    inflates raw agreement.

    Determinism: pure integer 2x2 cell algebra off the shared filter
    fragment (exact int64 sums in any order); the chi-square and the
    discordant share close in fixed-order IEEE, milli/micro-quantized.

    Scale shape: ONE map-side-combinable scan reduce to four integers;
    everything downstream is 1-row algebra.

    Reference basis: paired-verdict comparison of two detector configs
    on the same channels (Documentation-Self-Triggering.html:194-239);
    test from McNemar 1947 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mcnemar_docs")
    return spark.sql(
        _MCNEMAR_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
        .replace("FROM documents", "FROM mcnemar_docs")
        .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_neyman_allocation — variance-optimal stratified sample design
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per-stratum (source) the
#: length variance comes from exact integer moments; the Neyman weight
#: N_h * S_h micro-quantizes per stratum before the bounded integer
#: sum; seats allocate by largest remainder (Hamilton) so the integer
#: allocations sum to the budget EXACTLY — the same apportionment
#: discipline as `ext_quota_sample`, with variance-optimal weights
#: instead of proportional mass.
_NEYMAN_BUDGET = 200

_NEYMAN_BODY = """
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
           CAST(SUM(n_chars) AS BIGINT) AS s,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
    FROM {src} GROUP BY source
),
w AS (
    SELECT source, n_h,
           CAST(FLOOR(n_h * SQRT(GREATEST(
                (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_h)
                / GREATEST(n_h - 1, 1), 0e0)) * 1e6 + 5e-1) AS BIGINT)
               AS w_micro
    FROM g
),
t AS (
    SELECT source, n_h, w_micro,
           CAST(SUM(w_micro) OVER () AS BIGINT) AS tot_micro
    FROM w
),
quota AS (
    SELECT source, n_h, w_micro, tot_micro,
           CAST(FLOOR({b} * 1e0 * w_micro / tot_micro) AS BIGINT)
               AS floor_seats,
           {b} * w_micro - CAST(FLOOR({b} * 1e0 * w_micro / tot_micro)
               AS BIGINT) * tot_micro AS rem_num
    FROM t
),
ranked AS (
    SELECT source, n_h, w_micro, floor_seats,
           ROW_NUMBER() OVER (ORDER BY rem_num DESC, source) AS rk,
           {b} - CAST(SUM(floor_seats) OVER () AS BIGINT) AS leftover
    FROM quota
)
SELECT source, n_h, w_micro AS neyman_weight_micro,
       CAST(floor_seats + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS n_alloc
FROM ranked
"""


@register("ext_neyman_allocation",
          oracle=_NEYMAN_BODY.format(src="documents", b=_NEYMAN_BUDGET),
          tags=("ext", "curation", "sampling"))
def ext_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): split
    a fixed audit budget of 200 documents across sources proportional
    to N_h * S_h (stratum size times stratum length std-dev) — the
    allocation that minimizes the variance of the stratified length
    estimator. The variance-optimal sibling of `ext_quota_sample`
    (proportional mass): high-variance strata get MORE than their mass
    share, homogeneous boilerplate strata get less — exactly how a QA
    team should spend annotation budget. Largest-remainder integer
    apportionment guarantees the allocations sum to the budget exactly.

    Determinism: per-stratum moments are exact int64; the Neyman
    weight micro-quantizes per stratum (bounded dimension) before
    integer apportionment; remainders compare as exact integer
    cross-products (b*w - floor_seats*tot), never as float fractions;
    ties break on source name.

    Scale shape: ONE map-side-combinable groupBy(source) reduce;
    apportionment windows run over the bounded stratum dimension.

    Reference basis: the reference's per-channel sampling budget for
    verification scans (Documentation-Self-Triggering.html:194-239's
    rate-vs-spread accounting); allocation from Neyman 1934 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("neyman_docs")
    return spark.sql(_NEYMAN_BODY.format(src="neyman_docs",
                                         b=_NEYMAN_BUDGET))


# --------------------------------------------------------------------------
# ext_dp_laplace_mean — epsilon-DP clipped-mean release audit
# --------------------------------------------------------------------------

#: shared body ({src} = customer view, {hb_*} = engine md5-uniform
#: fragments). The ratio-of-noisy-aggregates mechanism: per segment,
#: release (sum of clip(x, 0, 5000)) + Lap(C/eps_half) and n +
#: Lap(1/eps_half) with eps split evenly (eps = 1, so eps_half = 1/2
#: per aggregate, scale = C/eps_half resp. 1/eps_half); the released
#: mean is their ratio. Noise uniforms are row-local md5 transforms of
#: the cell name with a per-aggregate salt — the `ext_dp_histogram`
#: determinism pattern.
_DPMEAN_CLIP = "5e3"

_DPMEAN_BODY = """
WITH base AS (
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS true_n,
           CAST(SUM(CAST(FLOOR(LEAST(GREATEST(c_acctbal, 0e0), {clip})
                * 1e2 + 5e-1) AS BIGINT)) AS BIGINT) AS clip_cents
    FROM {src} GROUP BY c_mktsegment
),
noised AS (
    SELECT segment, true_n, clip_cents,
           ({hb_sum} / 1152921504606846976e0) AS u_sum,
           ({hb_cnt} / 1152921504606846976e0) AS u_cnt
    FROM base
),
rel AS (
    SELECT segment, true_n, clip_cents,
           clip_cents / 1e2
           - CASE WHEN u_sum >= 5e-1 THEN 1e0 ELSE -1e0 END
             * ({clip} / 5e-1)
             * LN(GREATEST(1e0 - 2e0 * ABS(u_sum - 5e-1), 1e-18))
               AS rel_sum,
           CAST(true_n AS DOUBLE)
           - CASE WHEN u_cnt >= 5e-1 THEN 1e0 ELSE -1e0 END
             * (1e0 / 5e-1)
             * LN(GREATEST(1e0 - 2e0 * ABS(u_cnt - 5e-1), 1e-18))
               AS rel_n
    FROM noised
)
SELECT segment, true_n,
       CAST(FLOOR(clip_cents / 1e2 / true_n * 1e3 + 5e-1) AS BIGINT)
           AS true_clip_mean_milli,
       CAST(FLOOR(rel_sum / GREATEST(rel_n, 1e0) * 1e3 + 5e-1) AS BIGINT)
           AS released_mean_milli,
       CAST(FLOOR(ABS(rel_sum / GREATEST(rel_n, 1e0)
                      - clip_cents / 1e2 / true_n) * 1e3 + 5e-1)
            AS BIGINT) AS abs_err_milli
FROM rel
"""


def _dp_u(engine: str, salt: str) -> str:
    if engine == "duck":
        return ("CAST(concat('0x', substr(md5(concat(segment, '|" + salt
                + "')), 1, 15)) AS BIGINT)")
    return ("cast(conv(substring(md5(concat(segment, '|" + salt
            + "')), 1, 15), 16, 10) as bigint)")


@register("ext_dp_laplace_mean",
          oracle=_DPMEAN_BODY.format(src="customer", clip=_DPMEAN_CLIP,
                                     hb_sum=_dp_u("duck", "sum"),
                                     hb_cnt=_dp_u("duck", "cnt")),
          tags=("ext", "curation", "privacy"))
def ext_dp_laplace_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-DP clipped-mean release (Dwork et al. 2006, the
    ratio-of-noisy-aggregates mechanism): per market segment, account
    balances clip to [0, 5000] (bounding per-record sensitivity), the
    clipped SUM and the COUNT each get Laplace noise at eps/2, and the
    released mean is their ratio — the second member of the
    perturbation family after `ext_dp_histogram` (counts), and the one
    every DP aggregate-export pipeline actually ships (means need the
    budget SPLIT and the clip bound; naive per-mean noise is wrong).
    Emits true clipped mean, released mean, and realized |error| per
    cell — the utility audit.

    Determinism: the clip and cents quantization make the true sum an
    exact int64; noise uniforms are row-local md5 transforms of the
    cell name with per-aggregate salts (never engine RNG); LN/ABS are
    bit-exact with the GREATEST guard killing the LN(0) edge; the
    release closes in one fixed-order IEEE chain, milli-quantized
    (rel_n is GREATEST-guarded away from the division singularity —
    cells here are thousands of rows against noise of scale 2).

    Scale shape: ONE map-side-combinable groupBy to the cell
    dimension; noise is per-cell scan-stage codegen. Dimension-sized
    at any corpus size.

    Reference basis: per-pixel mean exports with spread (the 16x16
    baseline and noise_width arrays, DAQ_self-triggering.md:84-86);
    mechanism from Dwork et al. 2006 (public)."""
    ensure_deterministic(spark)
    cust = table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("dpmean_cust")
    return spark.sql(_DPMEAN_BODY.format(src="dpmean_cust",
                                         clip=_DPMEAN_CLIP,
                                         hb_sum=_dp_u("spark", "sum"),
                                         hb_cnt=_dp_u("spark", "cnt")))


# --------------------------------------------------------------------------
# ext_propensity_strata_att — stratified counterfactual effect estimate
# --------------------------------------------------------------------------

#: shared body ({src} = events view). Treatment = props payload k >= 50
#: (digits extracted portably), confounder = user_id % 4; strata ARE
#: the confounder cells (exact propensities per cell), ATT weights the
#: per-stratum treated-minus-control outcome gaps by the treated share.
#: Every per-stratum mean is an exact cents/count rational; the ATT
#: close runs over the bounded 4-stratum dimension with per-stratum
#: micro-quantized gap terms.
_PSTRATA_BODY = """
WITH e AS (
    SELECT CAST(user_id % 4 AS BIGINT) AS x,
           CASE WHEN CAST(regexp_replace(props, '[^0-9]', '', 'g')
                          AS BIGINT) >= 50 THEN 1 ELSE 0 END AS t,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS r_cents
    FROM {src}
),
s AS (
    SELECT x,
           CAST(SUM(t) AS BIGINT) AS n_t,
           CAST(SUM(1 - t) AS BIGINT) AS n_c,
           CAST(SUM(t * r_cents) AS BIGINT) AS s_t,
           CAST(SUM((1 - t) * r_cents) AS BIGINT) AS s_c
    FROM e GROUP BY x
),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS nt_all FROM s),
g AS (
    SELECT s.x, s.n_t, s.n_c,
           CAST(FLOOR((s.s_t / 1e2 / s.n_t) * 1e3 + 5e-1) AS BIGINT)
               AS y_t_milli,
           CAST(FLOOR((s.s_c / 1e2 / s.n_c) * 1e3 + 5e-1) AS BIGINT)
               AS y_c_milli,
           CAST(FLOOR((s.s_t / 1e2 / s.n_t - s.s_c / 1e2 / s.n_c)
                * s.n_t / t.nt_all * 1e6 + 5e-1) AS BIGINT)
               AS att_term_micro
    FROM s CROSS JOIN tot t
    WHERE s.n_t > 0 AND s.n_c > 0
)
SELECT x AS stratum, n_t, n_c, y_t_milli, y_c_milli, att_term_micro,
       CAST(SUM(att_term_micro) OVER () AS BIGINT) AS att_total_micro
FROM g
"""


@register("ext_propensity_strata_att",
          oracle=_PSTRATA_BODY.format(src="events"),
          tags=("ext", "curation", "policy"))
def ext_propensity_strata_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (sub-classification) treatment-effect estimate
    (Cochran 1968; Rosenbaum & Rubin 1984): the ATT of a logged
    "treatment" (payload k >= 50) on event value, adjusting for the
    user-bucket confounder by comparing treated vs control WITHIN each
    stratum and weighting the gaps by the treated share. The
    stratification member of the counterfactual family —
    `ext_ips_offpolicy_eval` reweights by inverse propensities
    (unbiased, variance-fragile), `ext_cuped_adjust` regresses out a
    pre-metric; sub-classification is the robust coarse adjustment
    teams run FIRST. Emits per-stratum cells and the weighted total.

    Determinism: strata are exact integer cells; per-stratum means are
    exact cents/count rationals; each stratum's ATT term
    micro-quantizes before the bounded-dimension window sum; digit
    extraction shares the portable regexp fragment.

    Scale shape: ONE map-side-combinable groupBy(stratum) reduce; the
    close runs over 4 rows. Nothing after the reduce scales.

    Reference basis: within-cell baseline-vs-triggered comparisons
    (Documentation-Self-Triggering.html:194-239); estimator from
    Cochran 1968 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("pstrata_events")
    return spark.sql(_PSTRATA_BODY.format(src="pstrata_events")
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_shapley_attribution — exact Shapley values over channel coalitions
# --------------------------------------------------------------------------

#: shared body ({src} = events view). Per user: a 4-bit journey mask of
#: HEAVY channel engagement (>= 14 events of the type) and a conversion
#: flag (>= 14 purchases); coalition value v(S) = converting users whose
#: journey is covered by S. With 4 players the 16 coalitions and the
#: factorial weights |S|!(3-|S|)!/4! = {6,2,2,6}/24 enumerate EXACTLY —
#: integer numerators throughout, one division by 24 at the close.
_SHAPLEY_T = 14

_SHAPLEY_BODY = """
WITH c AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {src} GROUP BY user_id, event_type
),
u AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'view' AND cnt >= {t}
               THEN 1 ELSE 0 END)
         + 2 * MAX(CASE WHEN event_type = 'click' AND cnt >= {t}
               THEN 1 ELSE 0 END)
         + 4 * MAX(CASE WHEN event_type = 'signup' AND cnt >= {t}
               THEN 1 ELSE 0 END)
         + 8 * MAX(CASE WHEN event_type = 'error' AND cnt >= {t}
               THEN 1 ELSE 0 END) AS jmask,
           MAX(CASE WHEN event_type = 'purchase' AND cnt >= {t}
               THEN 1 ELSE 0 END) AS conv
    FROM c GROUP BY user_id
),
grid AS (SELECT s FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7),
         (8), (9), (10), (11), (12), (13), (14), (15)) t(s)),
v AS (
    SELECT g.s,
           CAST(SUM(CASE WHEN (u.jmask & ~g.s) = 0 AND u.conv = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS v
    FROM grid g JOIN u ON TRUE
    GROUP BY g.s
),
ch AS (SELECT c, b FROM (VALUES ('view', 1), ('click', 2),
       ('signup', 4), ('error', 8)) t(c, b)),
terms AS (
    SELECT ch.c,
           CAST(SUM((CASE ((s.s & 1) + ((s.s >> 1) & 1)
                           + ((s.s >> 2) & 1) + ((s.s >> 3) & 1))
                     WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                     ELSE 6 END)
               * (w.v - s.v)) AS BIGINT) AS num
    FROM ch
    JOIN v s ON (s.s & ch.b) = 0
    JOIN v w ON w.s = (s.s | ch.b)
    GROUP BY ch.c
)
SELECT c AS channel,
       CAST(FLOOR(num / 24e0 * 1e3 + 5e-1) AS BIGINT) AS shapley_milli
FROM terms
"""


@register("ext_shapley_attribution",
          oracle=_SHAPLEY_BODY.format(src="events", t=_SHAPLEY_T),
          tags=("ext", "curation", "attribution"))
def ext_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution (Shapley 1953; the
    cooperative-game answer to "which touchpoints earn the
    conversions") over four engagement channels: per user a journey
    mask of heavy channels (>= 14 events of the type) and a conversion
    flag (>= 14 purchases); coalition value v(S) = conversions whose
    journey S covers; each channel's credit is the exact
    factorial-weighted sum of its marginal contributions across all
    2^4 coalitions. The axiomatic member of the attribution family —
    `agg_attribution_last_touch` is order-biased,
    `agg_markov_attribution` needs the transition model; Shapley is
    the only allocation that is symmetric, efficient (credits sum to
    v(grand) - v(empty)) and additive, and with 4 players it
    enumerates EXACTLY, no sampling.

    Determinism: journey masks and coalition values are exact integer
    reductions; the 16-coalition grid and factorial weights
    {6,2,2,6}/24 are literal; credit numerators are exact int64 sums
    with ONE division by 24 at the close, milli-quantized.

    Scale shape: one groupBy(user, type) reduce, one groupBy(user)
    rollup to the journey mask, then a bounded 16-way fan-out over the
    user-journey table (broadcast grid) into a 16-row value table —
    the coalition algebra never touches the corpus again.

    Reference basis: per-channel contribution accounting against
    coincidence baselines (Documentation-Self-Triggering.html:194-239);
    value from Shapley 1953, marketing formulation per Zhao et al.
    2018 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("shapley_events")
    return spark.sql(_SHAPLEY_BODY.format(src="shapley_events",
                                          t=_SHAPLEY_T))


# --------------------------------------------------------------------------
# ext_rank_biased_overlap — top-weighted agreement of two quality rankings
# --------------------------------------------------------------------------

#: shared body ({src} = documents view, {ws} = word-count dialect).
#: Ranking A = the trained logistic quality score, ranking B = the
#: distinct-token count (lexical-volume heuristic); both micro-quantize
#: to integers with a doc_id tie-break, truncate at depth 100, and the
#: prefix-overlap curve o_d comes from the max(rank_a, rank_b)
#: cumulative trick (an item is in BOTH depth-d prefixes iff its worse
#: rank <= d). RBO_min(p=0.9, k=100) = (1-p) sum p^(d-1) o_d / d.
_RBO_BODY = """
WITH feats AS (
    SELECT doc_id,
           LN(1e0 + {ws}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({ws} + 1e0)) AS awl,
           CAST({nd} AS BIGINT) AS nd
    FROM {src} WHERE n_chars > 0
),
s AS (
    SELECT doc_id,
           CAST(FLOOR(1e0 / (1e0 + EXP(-({bias} + {w1} * f_logtok
                + {w2} * awl))) * 1e6 + 5e-1) AS BIGINT) AS qa,
           nd AS qb
    FROM feats
),
ra AS (
    SELECT doc_id, r FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY qa DESC, doc_id) AS r
        FROM s) t WHERE r <= 100
),
rb AS (
    SELECT doc_id, r FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY qb DESC, doc_id) AS r
        FROM s) t WHERE r <= 100
),
j AS (
    SELECT GREATEST(ra.r, rb.r) AS mx
    FROM ra JOIN rb ON ra.doc_id = rb.doc_id
),
d AS (SELECT d FROM (VALUES {dgrid}) t(d)),
o AS (
    SELECT d.d, CAST(COUNT(j.mx) AS BIGINT) AS o_d
    FROM d LEFT JOIN j ON j.mx <= d.d
    GROUP BY d.d
)
SELECT CAST(FLOOR((1e0 - 9e-1)
            * SUM(CAST(FLOOR(POWER(9e-1, d - 1) * o_d / d * 1e9 + 5e-1)
                       AS BIGINT)) / 1e9 * 1e6 + 5e-1) AS BIGINT)
           AS rbo_micro,
       CAST(MAX(CASE WHEN d = 100 THEN o_d END) AS BIGINT)
           AS overlap_at_100
FROM o
"""

_RBO_DGRID = ", ".join(f"({i})" for i in range(1, 101))
_RBO_ND_DUCK = ("len(list_distinct(list_filter(string_split(text, ' '),"
                " x -> x <> '')))")
_RBO_ND_SPARK = ("size(array_distinct(filter(split(text, ' '),"
                 " x -> x != '')))")


@register("ext_rank_biased_overlap",
          oracle=_RBO_BODY.format(src="documents", ws=_sc.WS_COUNT_SQL,
                                  nd=_RBO_ND_DUCK, bias=_QL_BIAS,
                                  w1=_QL_W_LOGTOK, w2=_QL_W_AWL,
                                  dgrid=_RBO_DGRID),
          tags=("ext", "curation", "eval"))
def ext_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between the two
    quality orderings of the corpus — the trained logistic score vs the
    distinct-token-count heuristic — truncated at depth 100 with
    persistence p = 0.9. RBO is the ranking-native agreement measure
    the confusion-matrix family can't give: `ext_filter_agreement` and
    `ext_mcnemar_filters` compare BINARY verdicts at one threshold; RBO
    asks whether the two scorers would SELECT the same head if the
    budget were top-k, weighting early ranks geometrically (what a
    curation cut actually consumes). Emits the RBO_min lower bound and
    the raw overlap at depth 100.

    Determinism: both scores are micro-quantized integers with doc_id
    tie-breaks, so the two rankings are total orders; the prefix
    overlap curve comes from the exact integer max(rank_a, rank_b)
    cumulative trick; each depth's geometric term nano-quantizes before
    the 100-term integer sum; one fixed-order close.

    Scale shape: the rank-100 filters compile to Spark's window group
    limit (per-partition top-100 then merge — never a full sort); the
    overlap join is over two 100-row sides and the depth grid is a
    literal 100-row VALUES. Corpus cost = two scan-reduces.

    Reference basis: comparing two threshold configurations — a fresh
    scan vs thresholds reused from a previous run log
    (DAQ_self-triggering.md:84-87) — by the pixels they would select
    first; measure from Webber et al. 2010 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("rbo_docs")
    return spark.sql(_RBO_BODY.format(src="rbo_docs",
                                      ws=_sc.WS_COUNT_SQL_SPARK,
                                      nd=_RBO_ND_SPARK, bias=_QL_BIAS,
                                      w1=_QL_W_LOGTOK, w2=_QL_W_AWL,
                                      dgrid=_RBO_DGRID))


# --------------------------------------------------------------------------
# ext_holm_stepdown — Holm-Bonferroni step-down over the same test battery
# --------------------------------------------------------------------------

#: shared body ({src} = documents view): the `ext_fdr_bh` per-source
#: two-proportion z / sub-Gaussian p chain verbatim, closed with the
#: STEP-DOWN rule: source at p-rank i is rejected iff EVERY j <= i has
#: p_j <= alpha/(m - j + 1) — the cumulative AND is a MIN window over
#: the prefix. Also emits the monotone Holm-adjusted p (running MAX of
#: (m - j + 1) * p_j, capped at 1).
_HOLM_SQL = """
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS a
    FROM {src} GROUP BY source
),
w AS (
    SELECT source, n, a,
           CAST(SUM(n) OVER () AS BIGINT) AS tn,
           CAST(SUM(a) OVER () AS BIGINT) AS ta
    FROM g
),
zq AS (
    SELECT source, n,
           CAST(FLOOR((CAST(a AS DOUBLE) / n
                       - CAST(ta - a AS DOUBLE) / (tn - n))
                      / sqrt(CAST(ta AS DOUBLE) / tn
                             * (1e0 - CAST(ta AS DOUBLE) / tn)
                             * (1e0 / n + 1e0 / (tn - n)))
                      * 1e3 + 5e-1) AS BIGINT) AS z_milli
    FROM w WHERE n > 0 AND tn - n > 0 AND ta > 0 AND tn - ta > 0
),
pv AS (
    SELECT source, n, z_milli,
           CAST(FLOOR(LEAST(1e0, 2e0 * EXP(-(z_milli / 1e3)
                            * (z_milli / 1e3) / 2e0)) * 1e6 + 5e-1)
                AS BIGINT) AS p_micro
    FROM zq
),
r AS (
    SELECT source, n, z_milli, p_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY p_micro, source) AS BIGINT)
               AS prank,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM pv
),
h AS (
    SELECT source, n, z_milli, p_micro, prank, m,
           CAST(LEAST(MAX((m - prank + 1) * p_micro) OVER (
                    ORDER BY prank
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                1000000) AS BIGINT) AS p_holm_micro,
           MIN(CASE WHEN p_micro * (m - prank + 1) <= 50000
               THEN 1 ELSE 0 END) OVER (
                    ORDER BY prank
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rejected
    FROM r
)
SELECT source, n, z_milli, p_micro, prank, p_holm_micro,
       CAST(rejected AS BIGINT) AS rejected
FROM h
"""


@register("ext_holm_stepdown", oracle=_HOLM_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_holm_stepdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-down correction (Holm 1979) over the same
    per-source mean-shift battery `ext_fdr_bh` controls: Holm bounds
    the FAMILY-WISE error (any false rejection, the right control when
    a single wrong "this source shifted" page kills trust), where BH
    bounds the false-discovery RATE (fine when a few false alarms are
    acceptable). Running both on one battery is standard practice —
    Holm's rejection set is always a subset of BH's, a containment the
    planted tests pin. Emits the monotone Holm-adjusted p and the
    step-down rejection flags at alpha = 0.05.

    Determinism: the z/p chain is the exact `ext_fdr_bh` integer
    fragment (counting z-test — no variance quantization edge; p from
    the already-quantized z so both engines exponentiate the same
    double); the step-down prefix AND is a MIN window and the adjusted
    p a MAX window, both over the bounded source dimension with exact
    integer products.

    Scale shape: one groupBy(source) reduce, then windows over
    |sources| rows. Nothing downstream scales with the corpus.

    Reference basis: multiple-channel alarm control
    (Documentation-Self-Triggering.html:194-239); procedure from Holm
    1979 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("holm_docs")
    return spark.sql(_HOLM_SQL.format(src="holm_docs"))


# --------------------------------------------------------------------------
# ext_cochran_q — k-filter agreement test (the k-ary McNemar)
# --------------------------------------------------------------------------

#: shared body: THREE binary quality filters on the shared feature
#: fragment — the Gopher rule chain, the logistic classifier at 0.5,
#: and the long-doc rule (n_chars >= 300, the `ext_logreg_train_step`
#: label). Q = k(k-1) * (k * sum G_j^2 - T^2) / (k * T - sum L_i^2)
#: where G_j are per-filter pass totals, L_i per-doc pass counts,
#: T = sum L_i — every term an exact int64.
_COCHRANQ_BODY = f"""
WITH feats AS (
    SELECT doc_id, n_chars,
           {{ws}} AS n_words,
           LN(1e0 + {{ws}}) AS f_logtok,
           (CAST(n_chars AS DOUBLE) / ({{ws}} + 1e0)) AS awl,
           (CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 AS DOUBLE) / n_chars) AS digit_frac
    FROM documents WHERE n_chars > 0
),
lab AS (
    SELECT {_CAL_PASS_SQL} AS a,
           CASE WHEN CAST(FLOOR(1e0 / (1e0 + EXP(-({_QL_BIAS}
                              + {_QL_W_LOGTOK} * f_logtok
                              + {_QL_W_AWL} * awl))) * 1e6 + 5e-1)
                     AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS b,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS c
    FROM feats
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a) AS BIGINT) AS g1,
           CAST(SUM(b) AS BIGINT) AS g2,
           CAST(SUM(c) AS BIGINT) AS g3,
           CAST(SUM(a + b + c) AS BIGINT) AS t,
           CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS l2
    FROM lab
)
SELECT n, g1, g2, g3,
       CAST(FLOOR(3e0 * 2e0
            * (3e0 * (CAST(g1 AS DOUBLE) * g1 + CAST(g2 AS DOUBLE) * g2
                      + CAST(g3 AS DOUBLE) * g3)
               - CAST(t AS DOUBLE) * t)
            / (3e0 * t - l2) * 1e3 + 5e-1) AS BIGINT) AS q_milli
FROM m
WHERE 3 * t - l2 > 0
"""


@register("ext_cochran_q",
          oracle=_COCHRANQ_BODY.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "quality", "eval"))
def ext_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) across THREE deployed quality
    filters — the rule chain, the logistic classifier, and the long-doc
    rule — on the same documents: do the k filters pass systematically
    different FRACTIONS of the corpus? The k-ary generalization of
    `ext_mcnemar_filters` (which compares two): a significant Q says at
    least one filter is calibrated differently from the others, the
    trigger for the pairwise McNemar drill-down. Only the discordant
    documents carry information (the 3*T - sum L^2 denominator vanishes
    when every doc gets a unanimous verdict — NULL-guarded).

    Determinism: all three verdicts and every Q term (per-filter
    totals, per-doc pass-count squares) are exact int64 sums in any
    order; the close is one fixed-order IEEE chain, milli-quantized.

    Scale shape: ONE map-side-combinable scan reduce to six integers.

    Reference basis: k-configuration verdict comparison on shared
    channels (Documentation-Self-Triggering.html:194-239); test from
    Cochran 1950 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cochranq_docs")
    return spark.sql(
        _COCHRANQ_BODY.format(ws=_sc.WS_COUNT_SQL_SPARK)
        .replace("FROM documents", "FROM cochranq_docs")
        .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_tukey_hsd — post-hoc pairwise comparisons after the one-way ANOVA
# --------------------------------------------------------------------------

#: shared body: per-language (n, sum, sum-of-squares) in exact int64,
#: the pooled within-group MSE, and for every language pair the mean
#: difference plus the studentized-range statistic
#: q = |mean_a - mean_b| / sqrt(MSE/2 * (1/n_a + 1/n_b)).
_TUKEY_SQL = """
WITH g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
    FROM {src} GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
           CAST(COUNT(*) AS BIGINT) AS k,
           SUM(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS ss_within
    FROM g
),
pairs AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           a.n AS n_a, b.n AS n_b,
           CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS diff,
           t.ss_within / (t.n_tot - t.k) AS mse
    FROM g a JOIN g b ON a.lang < b.lang JOIN tot t ON TRUE
)
SELECT lang_a, lang_b, n_a, n_b,
       CAST(FLOOR(diff * 1e3 + 5e-1) AS BIGINT) AS diff_milli,
       CAST(FLOOR(ABS(diff) / SQRT(mse / 2e0 * (1e0 / n_a + 1e0 / n_b))
                  * 1e6 + 5e-1) AS BIGINT) AS q_stat_micro
FROM pairs
WHERE mse > 0e0
ORDER BY lang_a, lang_b
"""


@register("ext_tukey_hsd", oracle=_TUKEY_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc battery (Tukey 1949) over the per-language
    document-length groups: WHICH pairs differ once
    `agg_anova_oneway`'s omnibus F says SOME pair does? Per pair the
    mean difference and the studentized-range statistic against the
    pooled within-group MSE — the honest follow-up that keeps the
    family-wise error controlled where per-pair t-tests would not
    (compare `ext_holm_stepdown`, which corrects generic p-values;
    HSD is the dedicated equal-variance pairwise procedure).

    Determinism: group moments are exact int64 sums of integer
    n_chars; the MSE and each pair's close are fixed-order IEEE
    chains over those integers, milli/micro-quantized at the edge.

    Scale shape: ONE map-side-combinable groupBy(lang) reduce; the
    pair grid is |langs|^2 bounded algebra. Nothing downstream
    scales with the corpus.

    Reference basis: pairwise channel-rate comparison after an
    omnibus alarm (Documentation-Self-Triggering.html:194-239);
    procedure from Tukey 1949 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("tukey_docs")
    return spark.sql(_TUKEY_SQL.format(src="tukey_docs"))


# --------------------------------------------------------------------------
# ext_grubbs_outlier — maximum-studentized-deviation outlier per group
# --------------------------------------------------------------------------

#: shared body: per-language moments in exact int64, then per document
#: the absolute studentized deviation |x - mean| / sd; the per-group
#: argmax orders by the quantized statistic with a doc_id tie-break.
_GRUBBS_SQL = """
WITH st AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
    FROM {src} GROUP BY lang
),
dev AS (
    SELECT d.lang, d.doc_id, d.n_chars, t.n,
           CAST(FLOOR(ABS(d.n_chars - CAST(t.s AS DOUBLE) / t.n)
                      / SQRT((CAST(t.s2 AS DOUBLE)
                              - CAST(t.s AS DOUBLE) * t.s / t.n)
                             / (t.n - 1))
                      * 1e6 + 5e-1) AS BIGINT) AS g_micro
    FROM {src} d JOIN st t ON d.lang = t.lang
    WHERE t.n > 1 AND CAST(t.s2 AS DOUBLE) * t.n > CAST(t.s AS DOUBLE) * t.s
),
ranked AS (
    SELECT lang, doc_id, n_chars, n, g_micro,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY g_micro DESC, doc_id) AS rn
    FROM dev
)
SELECT lang, doc_id AS outlier_doc, n_chars, n, g_micro
FROM ranked WHERE rn = 1
ORDER BY lang
"""


@register("ext_grubbs_outlier", oracle=_GRUBBS_SQL.format(src="documents"),
          tags=("ext", "curation", "stats", "quality"))
def ext_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviation test statistic (Grubbs
    1950) per language: the single most aberrant document length in
    each group, G = max |x - mean| / sd — the classical single-outlier
    screen that complements `agg_mad_outliers` (which counts robust
    outliers in bulk) by naming the ONE document a curator should read
    first, with the statistic a critical-value table turns into a
    formal reject/keep call.

    Determinism: group moments are exact int64 sums; each document's
    G micro-quantizes from one fixed-order IEEE chain over those
    integers; the per-group argmax orders by the quantized integer
    with a doc_id tie-break. Degenerate zero-variance groups are
    guarded out in exact integer algebra (s2 * n > s * s).

    Scale shape: ONE groupBy(lang) reduce, one broadcast-sized join
    of the k-row moment table back to the corpus, one per-group
    TakeOrdered. All map-side combinable; no corpus-sized state.

    Reference basis: worst-channel identification in the noise census
    (Documentation-Self-Triggering.html:194-239); statistic from
    Grubbs 1950 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("grubbs_docs")
    return spark.sql(_GRUBBS_SQL.format(src="grubbs_docs"))


# --------------------------------------------------------------------------
# ext_mantel_haenszel — stratified common odds ratio across languages
# --------------------------------------------------------------------------

#: shared body: per-stratum 2x2 tables in exact int64 (exposure = the
#: newer source cohort src10+, outcome = long document), per-stratum
#: ad/n and bc/n micro-quantized, then the Mantel-Haenszel pooled
#: odds-ratio close.
_MH_SQL = """
WITH cell AS (
    SELECT lang,
           CASE WHEN CAST(SUBSTR(source, 4) AS INT) >= 10 THEN 1 ELSE 0
               END AS e,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
    FROM {src}
),
s AS (
    SELECT lang,
           CAST(SUM(e * y) AS BIGINT) AS a,
           CAST(SUM(e * (1 - y)) AS BIGINT) AS b,
           CAST(SUM((1 - e) * y) AS BIGINT) AS c,
           CAST(SUM((1 - e) * (1 - y)) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM cell GROUP BY lang
),
q AS (
    SELECT lang, a, b, c, d, n,
           CAST(FLOOR(CAST(a AS DOUBLE) * d / n * 1e6 + 5e-1) AS BIGINT)
               AS ad_micro,
           CAST(FLOOR(CAST(b AS DOUBLE) * c / n * 1e6 + 5e-1) AS BIGINT)
               AS bc_micro
    FROM s
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       CAST(SUM(a) AS BIGINT) AS tot_exposed_pos,
       CAST(SUM(ad_micro) AS BIGINT) AS num_micro,
       CAST(SUM(bc_micro) AS BIGINT) AS den_micro,
       CAST(FLOOR(CAST(SUM(ad_micro) AS DOUBLE) / SUM(bc_micro) * 1e6
                  + 5e-1) AS BIGINT) AS or_mh_micro
FROM q
WHERE 1 = 1
HAVING SUM(bc_micro) > 0
"""


@register("ext_mantel_haenszel", oracle=_MH_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio (Mantel & Haenszel 1959):
    does the newer source cohort (src10+) over- or under-produce long
    documents once LANGUAGE is controlled for? Language is the classic
    confounder here (languages differ in both cohort mix and length),
    so the marginal 2x2 table lies — MH pools the per-stratum odds
    ratios with ad/n weights, the epidemiology-standard estimator.
    The categorical sibling of `ext_propensity_strata_att` (which
    adjusts a continuous outcome); `ext_cramers_v` measures marginal
    association strength with no confounder control at all.

    Determinism: per-stratum 2x2 cells are exact int64; each
    stratum's ad/n and bc/n micro-quantize from one fixed-order
    division before exact integer sums; the final ratio is one chain.
    An all-concordant corpus (zero denominator) yields no row via
    exact integer HAVING.

    Scale shape: ONE map-side-combinable groupBy(lang) reduce to
    5 rows of 5 integers; everything after is bounded algebra.

    Reference basis: confounder-stratified rate comparison across
    configuration cohorts (Documentation-Self-Triggering.html:194-239);
    estimator from Mantel & Haenszel 1959 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mh_docs")
    return spark.sql(_MH_SQL.format(src="mh_docs"))


# --------------------------------------------------------------------------
# ext_borda_rank_aggregation — consensus ranking across three signals
# --------------------------------------------------------------------------

#: shared body ({ws} = engine word-count expression): three total
#: rankings of the corpus (chars, words, vowel mass), Borda score
#: = sum of (N - rank) over the three ballots, top-20 consensus.
_BORDA_SQL = """
WITH feats AS (
    SELECT doc_id, n_chars,
           {ws} AS n_words,
           length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels
    FROM {src} WHERE n_chars > 0
),
ranked AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
           ROW_NUMBER() OVER (ORDER BY n_words DESC, doc_id) AS r2,
           ROW_NUMBER() OVER (ORDER BY n_vowels DESC, doc_id) AS r3,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM feats
)
SELECT doc_id,
       CAST(3 * n - r1 - r2 - r3 AS BIGINT) AS borda,
       CAST(r1 AS BIGINT) AS rank_chars,
       CAST(r2 AS BIGINT) AS rank_words,
       CAST(r3 AS BIGINT) AS rank_vowels
FROM ranked
ORDER BY borda DESC, doc_id
LIMIT 20
"""


@register("ext_borda_rank_aggregation",
          oracle=_BORDA_SQL.format(src="documents", ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "ranking"))
def ext_borda_rank_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count rank aggregation (Borda 1781) across three quality
    ballots — length in characters, length in words, and vowel mass —
    into one consensus top-20. The social-choice member of the
    rank-analytics family: `ext_rank_biased_overlap` measures how much
    two rankings AGREE, `ext_kendall_tau` correlates them; Borda
    MERGES k rankings into the consensus list a multi-signal curation
    pass actually ships (the same fusion job `ext_hybrid_retrieval_rrf`
    does with reciprocal weights — Borda's linear weights are the
    classical alternative with opposite tail emphasis).

    Determinism: all three ballots are total orders (integer keys
    with doc_id tie-breaks), so every rank is exact; the Borda close
    is pure integer algebra; the top-20 orders by (borda DESC,
    doc_id).

    Scale shape: three global ROW_NUMBER windows over one corpus
    scan — the documented single-total-order cost (compare
    `ext_curriculum_order`), then TakeOrderedAndProject(20). At 100x
    the windows become per-ballot range-partitioned sorts; nothing
    else grows.

    Reference basis: multi-criteria channel ranking fused across
    noise/efficiency/rate ballots (Documentation-Self-Triggering.html:
    194-239); count from Borda 1781 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("borda_docs")
    return spark.sql(
        _BORDA_SQL.format(src="borda_docs", ws=_sc.WS_COUNT_SQL_SPARK)
        .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_raking_ipf — iterative proportional fitting to uniform margins
# --------------------------------------------------------------------------

#: shared body: the segment x region cell counts, then two unrolled
#: IPF iterations (row-margin scale, column-margin scale) toward
#: uniform targets n_tot/n_seg and n_tot/n_reg; weights micro-
#: quantized only at the edge.
_IPF_SQL = """
WITH cell AS (
    SELECT c.c_mktsegment AS seg, r.r_name AS reg,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {cust} c
    JOIN {nat} na ON c.c_nationkey = na.n_nationkey
    JOIN {reg} r ON na.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_seg,
               CAST(COUNT(DISTINCT reg) AS BIGINT) AS n_reg
        FROM cell),
w0 AS (SELECT seg, reg, n, CAST(n AS DOUBLE) AS w FROM cell),
r1 AS (
    SELECT seg, reg, n,
           w * (CAST(t.n_tot AS DOUBLE) / t.n_seg)
             / (SUM(w) OVER (PARTITION BY seg)) AS w
    FROM w0 JOIN tot t ON TRUE
),
c1 AS (
    SELECT seg, reg, n,
           w * (CAST(t.n_tot AS DOUBLE) / t.n_reg)
             / (SUM(w) OVER (PARTITION BY reg)) AS w
    FROM r1 JOIN tot t ON TRUE
),
r2 AS (
    SELECT seg, reg, n,
           w * (CAST(t.n_tot AS DOUBLE) / t.n_seg)
             / (SUM(w) OVER (PARTITION BY seg)) AS w
    FROM c1 JOIN tot t ON TRUE
),
c2 AS (
    SELECT seg, reg, n,
           w * (CAST(t.n_tot AS DOUBLE) / t.n_reg)
             / (SUM(w) OVER (PARTITION BY reg)) AS w
    FROM r2 JOIN tot t ON TRUE
)
SELECT seg, reg, n,
       CAST(FLOOR(w * 1e6 + 5e-1) AS BIGINT) AS w_micro,
       CAST(FLOOR(w / n * 1e6 + 5e-1) AS BIGINT) AS factor_micro
FROM c2
ORDER BY seg, reg
"""


@register("ext_raking_ipf",
          oracle=_IPF_SQL.format(cust="customer", nat="nation",
                                 reg="region"),
          tags=("ext", "curation", "sampling"))
def ext_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan
    1940): calibrate the market-segment x region customer cell counts
    to UNIFORM row and column margins with two unrolled IPF
    iterations — the survey-weighting step every stratified corpus
    release runs when the crawl's joint distribution must match
    target marginals that only exist per-axis. Emits the raked weight
    and the per-cell adjustment factor (the quantity capping audits
    inspect). The joint-distribution sibling of
    `ext_neyman_allocation` (optimal single-margin allocation) and
    `ext_domain_mix_temperature` (single-margin reweighting).

    Determinism: cell counts are exact int64; each IPF scale factor
    is one fixed-order chain over a window SUM of doubles derived
    deterministically from those integers (5x5 cells per margin
    group, same addition order both engines via the shared ORDER-free
    5-term sums — margin groups are below any engine's partial-sum
    reassociation threshold); weights quantize only at the edge.

    Scale shape: ONE groupBy(seg, region) reduce over the broadcast-
    dimension joins; four windows over the bounded 25-cell table.
    Nothing after the reduce scales with the corpus.

    Reference basis: two-margin occupancy calibration across
    configuration grids (Documentation-Self-Triggering.html:194-239);
    algorithm from Deming & Stephan 1940 (public)."""
    ensure_deterministic(spark)
    table(spark, sf_dir, "customer").createOrReplaceTempView("ipf_cust")
    table(spark, sf_dir, "nation").createOrReplaceTempView("ipf_nat")
    table(spark, sf_dir, "region").createOrReplaceTempView("ipf_reg")
    return spark.sql(_IPF_SQL.format(cust="ipf_cust", nat="ipf_nat",
                                     reg="ipf_reg"))


# --------------------------------------------------------------------------
# ext_isotonic_calibration_pav — monotone demand-curve fit via PAV minimax
# --------------------------------------------------------------------------

#: shared body: purchase rate per capped value bin, fitted monotone
#: NON-INCREASING by the pool-adjacent-violators minimax identity
#: anti(i) = min over j<=i of max over k>=i of avg(y[j..k]) — exact
#: over the bounded bin dimension via cumulative integer sums and a
#: j <= i <= k triple join on the <=16-row bin table.
_PAV_SQL = """
WITH b AS (
    SELECT LEAST(CAST(FLOOR(value / 10e0) AS BIGINT), 15) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos
    FROM {src} WHERE value >= 0 GROUP BY 1
),
cum AS (
    SELECT bin, n, pos,
           CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
           CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cpos
    FROM b
),
jk AS (
    SELECT i.bin AS i, j.bin AS j,
           CAST(FLOOR((CAST(k.cpos AS DOUBLE) - COALESCE(jp.cpos, 0))
                      / (k.cn - COALESCE(jp.cn, 0)) * 1e9 + 5e-1)
                AS BIGINT) AS seg_nano
    FROM cum i
    JOIN cum j ON j.bin <= i.bin
    JOIN cum k ON k.bin >= i.bin
    LEFT JOIN cum jp ON jp.bin = j.bin - 1
),
inner_max AS (
    SELECT i, j, MAX(seg_nano) AS max_nano FROM jk GROUP BY i, j
)
SELECT c.bin, c.n, c.pos,
       CAST(FLOOR(CAST(c.pos AS DOUBLE) / c.n * 1e6 + 5e-1) AS BIGINT)
           AS raw_rate_micro,
       CAST(FLOOR(MIN(im.max_nano) / 1e3 + 5e-1) AS BIGINT)
           AS fitted_rate_micro
FROM cum c JOIN inner_max im ON im.i = c.bin
GROUP BY c.bin, c.n, c.pos
ORDER BY c.bin
"""


@register("ext_isotonic_calibration_pav",
          oracle=_PAV_SQL.format(src="events"),
          tags=("ext", "curation", "stats", "eval"))
def ext_isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone (non-increasing) purchase-propensity curve over event
    value, fitted by pool-adjacent-violators (Ayer et al. 1955; the
    isotonic-regression workhorse behind sklearn's calibration): raw
    per-bin conversion rates wiggle with noise, the PAV fit is the
    maximum-likelihood DEMAND CURVE under the only assumption pricing
    theory grants (propensity never rises with price). Computed by
    the exact minimax identity fit(i) = min_{{j<=i}} max_{{k>=i}}
    avg(y[j..k]) over the bounded bin dimension — no iterative
    pooling loop, no ordering ambiguity. Complements
    `ext_quality_calibration_bins` (which reports raw reliability)
    with the shape-constrained fit, and `agg_price_elasticity` (a
    log-log slope) with the nonparametric curve.

    Determinism: bin counts are exact int64; every candidate segment
    average nano-quantizes from one division of cumulative integers;
    min/max over quantized integers are order-free; the 16-bin cap
    (LEAST) bounds the grid exactly the same way in both engines.

    Scale shape: ONE map-side-combinable scan reduce to <=16 bins;
    the j <= i <= k triple join is <=16^3 rows of bounded algebra
    (allowlisted bounded cross). Nothing downstream scales with the
    corpus.

    Reference basis: monotone dose-response calibration over binned
    rate series (Documentation-Self-Triggering.html:194-239); PAV
    from Ayer et al. 1955 / Barlow et al. 1972 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("pav_events")
    return spark.sql(_PAV_SQL.format(src="pav_events"))


# --------------------------------------------------------------------------
# ext_newman_modularity — community quality of the source partition
# --------------------------------------------------------------------------

#: shared tail over `cands(doc_a, doc_b)` (the single-permutation
#: collision graph, doc_a < doc_b) and `{docs}` for source labels:
#: per-community internal-edge and degree masses, then
#: Q_c = e_c/m - (d_c/2m)^2 nano-quantized per community.
_MODULARITY_TAIL = """
lab AS (SELECT doc_id, source FROM {docs}),
ed AS (
    SELECT la.source AS sa, lb.source AS sb
    FROM {cands} c JOIN lab la ON c.doc_a = la.doc_id
                   JOIN lab lb ON c.doc_b = lb.doc_id
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM ed),
internal AS (
    SELECT sa AS community, CAST(COUNT(*) AS BIGINT) AS e_in
    FROM ed WHERE sa = sb GROUP BY sa
),
degs AS (
    SELECT community, CAST(SUM(cnt) AS BIGINT) AS d_tot FROM (
        SELECT sa AS community, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ed GROUP BY sa
        UNION ALL
        SELECT sb AS community, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ed GROUP BY sb
    ) u GROUP BY community
),
percom AS (
    SELECT d.community,
           COALESCE(i.e_in, 0) AS e_in, d.d_tot,
           CAST(FLOOR((CAST(COALESCE(i.e_in, 0) AS DOUBLE) / mm.m_edges
                       - (CAST(d.d_tot AS DOUBLE) / (2e0 * mm.m_edges))
                         * (CAST(d.d_tot AS DOUBLE) / (2e0 * mm.m_edges)))
                      * 1e9 + 5e-1) AS BIGINT) AS q_nano
    FROM degs d LEFT JOIN internal i ON d.community = i.community
    JOIN m mm ON TRUE
)
SELECT community, e_in, d_tot, q_nano,
       CAST(SUM(q_nano) OVER () AS BIGINT) AS modularity_nano
FROM percom
ORDER BY community
"""

_MODULARITY_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_AA_CANDS_SQL},
{_MODULARITY_TAIL.format(docs="documents", cands="cands")}
"""


@register("ext_newman_modularity", oracle=_MODULARITY_SQL,
          tags=("ext", "graph"))
def ext_newman_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity (Newman & Girvan 2004) of the SOURCE
    partition on the MinHash collision graph: does near-duplicate
    structure live WITHIN sources (high Q — dedup can shard by
    source) or cut ACROSS them (Q near 0 — cross-source dedup is
    mandatory)? Per community c: internal edges e_c, degree mass
    d_c, and Q_c = e_c/m - (d_c/2m)^2; the index is sum Q_c. This is
    the decision statistic behind `ext_cross_shard_dupes`' policy
    question, computed on the same open-wedge topology as
    `ext_adamic_adar` (the verified 0.5-graph is a union of cliques
    — structurally uninformative for mixing).

    Determinism: edge and degree masses are exact set algebra and
    int64 counts; each community's Q_c nano-quantizes from one
    fixed-order chain; the total is an exact integer window sum.

    Scale shape: edges come from the (k, minhash) inverted-index
    equi-join (sum-bucket-squared cost, the documented width-1
    trade — at extreme scale this audit runs per-domain or sampled,
    like every detector in that family); labels join on doc_id; then
    one groupBy over |sources| communities. The candidate list
    localCheckpoints once for its two consumers.

    Reference basis: within- vs cross-configuration clustering of
    correlated channels (Documentation-Self-Triggering.html:239+);
    modularity from Newman & Girvan 2004 (public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import ext_dedup_minhash
    sigs = ext_dedup_minhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    cands = (a.join(b, ["k", "minhash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    cands.createOrReplaceTempView("mod_cands")
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mod_docs")
    return spark.sql(
        "WITH " + _MODULARITY_TAIL.format(docs="mod_docs",
                                          cands="mod_cands"))


# --------------------------------------------------------------------------
# ext_weighted_kappa — quadratic-weighted agreement on ordinal grades
# --------------------------------------------------------------------------

#: shared body ({ws} = engine word-count expression): two ordinal
#: 3-grade raters (char tertiles, word tertiles), the 3x3 observed
#: table, chance-expected cells from the margins, quadratic weights
#: (i-j)^2, kappa_w = 1 - sum(w O) / sum(w E).
_WKAPPA_SQL = """
WITH g AS (
    SELECT CASE WHEN n_chars < 300 THEN 0
                WHEN n_chars < 450 THEN 1 ELSE 2 END AS a,
           CASE WHEN {ws} < 45 THEN 0
                WHEN {ws} < 65 THEN 1 ELSE 2 END AS b
    FROM {src} WHERE n_chars > 0
),
o AS (
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM g GROUP BY a, b
),
ra AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM o GROUP BY a),
rb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM o GROUP BY b),
n AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM o),
cells AS (
    SELECT ra.a, rb.b,
           COALESCE(o.n_ab, 0) AS n_ab, ra.n_a, rb.n_b, n.n,
           (ra.a - rb.b) * (ra.a - rb.b) AS w4
    FROM ra JOIN rb ON TRUE JOIN n ON TRUE
    LEFT JOIN o ON o.a = ra.a AND o.b = rb.b
),
t AS (
    SELECT CAST(SUM(w4 * n_ab) AS BIGINT) AS wo_num,
           SUM(w4 * (CAST(n_a AS DOUBLE) * n_b / n)) AS we_num,
           CAST(MAX(n) AS BIGINT) AS n
    FROM cells
)
SELECT n, wo_num,
       CAST(FLOOR(we_num * 1e3 + 5e-1) AS BIGINT) AS we_num_milli,
       CAST(FLOOR((1e0 - CAST(wo_num AS DOUBLE) / we_num) * 1e6 + 5e-1)
            AS BIGINT) AS kappa_w_micro
FROM t WHERE we_num > 0e0
"""


@register("ext_weighted_kappa",
          oracle=_WKAPPA_SQL.format(src="documents", ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "eval"))
def ext_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's kappa (Cohen 1968) between two
    ORDINAL 3-grade raters — a char-tertile rule and a word-tertile
    rule: near-miss disagreements (grade 0 vs 1) cost 1/4 of extreme
    ones (0 vs 2), the weighting every ordinal labeling rubric
    (quality grades, toxicity severity) actually needs. Plain kappa
    (`ext_annotator_kappa`) treats all disagreements equally and
    punishes ordinal raters unfairly; Fleiss (`ext_fleiss_kappa`)
    handles many raters but unordered categories. Quadratic-weighted
    kappa is also exactly the competition metric for ordinal
    prediction tasks.

    Determinism: the 3x3 observed table is exact int64; expected
    cells are fixed-order rationals of the integer margins; the close
    is one chain with numerator exact-integer and denominator
    milli-quantized for reporting.

    Scale shape: ONE map-side-combinable scan reduce to <=9 cells;
    the margin/expectation algebra runs on the bounded grade grid
    (allowlisted bounded cross).

    Reference basis: graded-verdict agreement between configuration
    rubrics (Documentation-Self-Triggering.html:194-239); weights
    from Cohen 1968 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("wkappa_docs")
    return spark.sql(_WKAPPA_SQL.format(src="wkappa_docs",
                                        ws=_sc.WS_COUNT_SQL_SPARK))


# --------------------------------------------------------------------------
# ext_successive_halving — bandit budget allocation across sources
# --------------------------------------------------------------------------

#: shared body: arms = sources, reward = long-doc rate; round 1 rates
#: on a 10-doc budget rank the 20 arms, the top 10 survive to a
#: 20-doc budget, the top 5 finalists emerge — every rank ordered by
#: an exact integer rational with a source tie-break.
_SHALVING_SQL = """
WITH ranked AS (
    SELECT source, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM {src}
),
r1 AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS pos1
    FROM ranked WHERE rn <= 10 GROUP BY source
),
k1 AS (
    SELECT source, n1, pos1,
           ROW_NUMBER() OVER (ORDER BY CAST(pos1 AS DOUBLE) / n1 DESC,
                              source) AS rk1
    FROM r1
),
r2 AS (
    SELECT r.source, k1.n1, k1.pos1, k1.rk1,
           CAST(COUNT(*) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN r.n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS pos2
    FROM ranked r JOIN k1 ON r.source = k1.source
    WHERE k1.rk1 <= 10 AND r.rn <= 20
    GROUP BY r.source, k1.n1, k1.pos1, k1.rk1
),
fin AS (
    SELECT source, rk1, n1, pos1, n2, pos2,
           CAST(FLOOR(CAST(pos2 AS DOUBLE) / n2 * 1e6 + 5e-1) AS BIGINT)
               AS rate2_micro,
           ROW_NUMBER() OVER (ORDER BY CAST(pos2 AS DOUBLE) / n2 DESC,
                              source) AS rk2
    FROM r2
)
SELECT source, rk1, n1, pos1, n2, pos2, rate2_micro, rk2
FROM fin WHERE rk2 <= 5
ORDER BY rk2
"""


@register("ext_successive_halving",
          oracle=_SHALVING_SQL.format(src="documents"),
          tags=("ext", "curation", "sampling"))
def ext_successive_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One successive-halving tournament (Karnin et al. 2013; the
    Hyperband inner loop) over the 20 sources as bandit arms, reward =
    long-doc rate: evaluate all arms on a 10-document budget, promote
    the top half to a 20-document budget, emit the 5 finalists with
    both rounds' statistics. The budget-allocation pattern every
    expensive evaluation loop uses (which sources deserve the costly
    quality-classifier pass? which hyperparameter configs deserve more
    steps?) — exploration spend grows with arms * log(arms), not
    arms * full-budget. The adaptive sibling of `ext_quota_sample`
    (fixed allocation) and `ext_uncertainty_sample` (per-item
    adaptivity).

    Determinism: budgets select by ROW_NUMBER over (source, doc_id)
    total orders; rates are exact integer rationals; both rank rounds
    order by the rational with a source tie-break.

    Scale shape: one window over the corpus partitioned by source
    (budget selection), two bounded groupBy(source) reduces, rank
    windows over <=20 rows. At 100x the per-arm budget windows remain
    per-partition sorts; nothing else grows.

    Reference basis: staged configuration screening under a
    measurement budget (Documentation-Self-Triggering.html:194-239);
    algorithm from Karnin, Koren & Somekh 2013 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("shalving_docs")
    return spark.sql(_SHALVING_SQL.format(src="shalving_docs"))


# --------------------------------------------------------------------------
# ext_doubly_robust_ate — augmented IPW on the stratified design
# --------------------------------------------------------------------------

#: shared body: the `ext_propensity_strata_att` design (stratum =
#: user bucket, treatment = payload >= 50, outcome = value) closed
#: with the AIPW / doubly-robust estimator: saturated stratum outcome
#: models + stratum propensities, per-unit augmented terms
#: milli-quantized before exact integer sums.
_DR_SQL = """
WITH e AS (
    SELECT CAST(user_id % 4 AS BIGINT) AS x,
           CASE WHEN CAST(regexp_replace(props, '[^0-9]', '', 'g')
                          AS BIGINT) >= 50 THEN 1 ELSE 0 END AS t,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS r_cents
    FROM {src}
),
s AS (
    SELECT x,
           CAST(COUNT(*) AS BIGINT) AS n_x,
           CAST(SUM(t) AS BIGINT) AS n_t,
           CAST(SUM(1 - t) AS BIGINT) AS n_c,
           CAST(SUM(t * r_cents) AS BIGINT) AS s_t,
           CAST(SUM((1 - t) * r_cents) AS BIGINT) AS s_c
    FROM e GROUP BY x
),
terms AS (
    SELECT e.x,
           CAST(FLOOR((
               (s.s_t / 1e2 / s.n_t) - (s.s_c / 1e2 / s.n_c)
               + e.t * (e.r_cents / 1e2 - s.s_t / 1e2 / s.n_t)
                     / (CAST(s.n_t AS DOUBLE) / s.n_x)
               - (1 - e.t) * (e.r_cents / 1e2 - s.s_c / 1e2 / s.n_c)
                     / (CAST(s.n_c AS DOUBLE) / s.n_x)
           ) * 1e3 + 5e-1) AS BIGINT) AS dr_milli
    FROM e JOIN s ON e.x = s.x
    WHERE s.n_t > 0 AND s.n_c > 0
),
agg AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(dr_milli) AS BIGINT) AS s_dr
    FROM terms GROUP BY x
)
SELECT x AS stratum, n, s_dr AS sum_dr_milli,
       CAST(FLOOR(CAST(s_dr AS DOUBLE) / n + 5e-1) AS BIGINT)
           AS ate_x_milli,
       CAST(FLOOR(CAST(SUM(s_dr) OVER () AS DOUBLE)
                  / SUM(n) OVER () + 5e-1) AS BIGINT) AS ate_milli
FROM agg
ORDER BY x
"""


@register("ext_doubly_robust_ate", oracle=_DR_SQL.format(src="events"),
          tags=("ext", "curation", "counterfactual"))
def ext_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust / AIPW treatment-effect estimate (Robins,
    Rotnitzky & Zhao 1994; the estimator production causal pipelines
    default to): outcome-model prediction plus an inverse-propensity
    correction of its residual, per unit, on the same design as
    `ext_propensity_strata_att`. Consistent if EITHER the outcome
    model OR the propensity model is right — the insurance policy
    neither pure stratification (model-only) nor pure IPS
    (propensity-only, variance-fragile) offers. With saturated
    stratum models the estimate algebraically equals the
    stratified ATE — the planted test pins that identity AND the
    per-unit augmentation algebra that makes the robustness real
    when models are misspecified.

    Determinism: stratum models and propensities are exact integer
    rationals; each unit's augmented term is one fixed-order IEEE
    chain milli-quantized before exact integer sums; closes are
    single divisions.

    Scale shape: one groupBy(stratum) reduce, one broadcast-joined
    corpus pass for the augmented terms (4-row stats side), one
    bounded reduce. The fact table is scanned twice, shuffled never.

    Reference basis: model-plus-reweighting rate correction across
    configuration cohorts (Documentation-Self-Triggering.html:
    194-239); estimator from Robins et al. 1994 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("dr_events")
    return spark.sql(_DR_SQL.format(src="dr_events")
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_spiegelhalter_z — calibration Z test of the quality classifier
# --------------------------------------------------------------------------

#: shared body ({ws} = engine word-count expression): the logistic
#: length-score against the long-doc label, Spiegelhalter's
#: Z = sum (y-p)(1-2p) / sqrt(sum (1-2p)^2 p(1-p)) with per-document
#: micro-quantized terms.
_SPIEGEL_SQL = """
WITH feats AS (
    SELECT doc_id, n_chars,
           LN(1e0 + {ws}) AS f_logtok
    FROM {src} WHERE n_chars > 0
),
sc AS (
    SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
           CAST(FLOOR(1e0 / (1e0 + EXP(-(-2e0 + 9e-1 * f_logtok)))
                      * 1e6 + 5e-1) AS BIGINT) / 1e6 AS p
    FROM feats
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR((y - p) * (1e0 - 2e0 * p) * 1e6 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS num_micro,
           CAST(SUM(CAST(FLOOR((1e0 - 2e0 * p) * (1e0 - 2e0 * p)
                               * p * (1e0 - p) * 1e6 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS var_micro
    FROM sc
)
SELECT n, num_micro, var_micro,
       CAST(FLOOR(num_micro / 1e6 / SQRT(var_micro / 1e6) * 1e3 + 5e-1)
            AS BIGINT) AS z_milli
FROM m WHERE var_micro > 0
"""


@register("ext_spiegelhalter_z",
          oracle=_SPIEGEL_SQL.format(src="documents", ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "eval", "quality"))
def ext_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's calibration Z test (Spiegelhalter 1986): is the
    probabilistic quality score calibrated AS A WHOLE — one number, a
    signed z — without choosing bins? Z = sum (y - p)(1 - 2p) /
    sqrt(sum (1-2p)^2 p(1-p)); the (1-2p) weighting isolates the
    calibration component of the Brier score (a perfectly calibrated
    scorer has E[Z] = 0 regardless of its discrimination). The
    bin-free member of the calibration battery:
    `ext_quality_calibration_bins` shows WHERE miscalibration lives,
    `ext_brier_decomposition` splits the loss, the isotonic fit
    repairs it — Spiegelhalter's Z is the single-number alarm that
    triggers them.

    Determinism: p micro-quantizes per document from the shared
    fixed-order logistic chain (identical double both engines, the
    `ext_quality_logistic` precedent); numerator and variance terms
    micro-quantize per document before exact integer sums; the close
    is one chain.

    Scale shape: ONE map-side-combinable scan reduce to three
    integers. Nothing downstream scales with the corpus.

    Reference basis: predicted-vs-realized rate auditing on shared
    channels (Documentation-Self-Triggering.html:194-239); test from
    Spiegelhalter, Statistics in Medicine 1986 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("spiegel_docs")
    return spark.sql(_SPIEGEL_SQL.format(src="spiegel_docs",
                                         ws=_sc.WS_COUNT_SQL_SPARK))


# --------------------------------------------------------------------------
# ext_did_estimator — difference-in-differences with pre-trend audit
# --------------------------------------------------------------------------

#: epoch-day seams for events.ts (shared with the windows family).
_DID_DAY_DUCK = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
_DID_DAY_SPARK = "cast(unix_micros(ts) div 86400000000 as bigint)"

#: shared body ({day} = engine epoch-day): the 2x2 (cohort x period)
#: mean table around the mid-month policy date, the DiD close, and
#: per-cohort PRE-period daily OLS slopes (the parallel-trends audit).
_DID_BODY = """
WITH e AS (
    SELECT CASE WHEN CAST(regexp_replace(props, '[^0-9]', '', 'g')
                     AS BIGINT) >= 50 THEN 1 ELSE 0 END AS tr,
           CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS post,
           {day} AS d,
           CAST(FLOOR(value * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {src}
),
cell AS (
    SELECT tr, post, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS s
    FROM e GROUP BY tr, post
),
did AS (
    SELECT
        MAX(CASE WHEN tr = 1 AND post = 1 THEN s / 1e2 / n END) AS y11,
        MAX(CASE WHEN tr = 1 AND post = 0 THEN s / 1e2 / n END) AS y10,
        MAX(CASE WHEN tr = 0 AND post = 1 THEN s / 1e2 / n END) AS y01,
        MAX(CASE WHEN tr = 0 AND post = 0 THEN s / 1e2 / n END) AS y00,
        CAST(SUM(n) AS BIGINT) AS n_tot
    FROM cell
),
pre AS (
    SELECT tr, d, CAST(SUM(cents) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e WHERE post = 0 GROUP BY tr, d
),
slope AS (
    SELECT tr, CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(CAST(FLOOR(d * 1e0 * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sx,
           CAST(SUM(CAST(FLOOR(s / 1e2 / n * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sy,
           CAST(SUM(CAST(FLOOR(d * 1e0 * d * 1e3 + 5e-1) AS BIGINT))
                AS BIGINT) AS sxx,
           CAST(SUM(CAST(FLOOR(d * (s / 1e2 / n) * 1e3 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS sxy
    FROM pre GROUP BY tr
),
sl AS (
    SELECT tr,
           CAST(FLOOR((nd * (sxy / 1e3) - (sx / 1e3) * (sy / 1e3))
                      / (nd * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3))
                      * 1e6 + 5e-1) AS BIGINT) AS slope_micro
    FROM slope
    WHERE (nd * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)) > 0e0
)
SELECT d.n_tot,
       CAST(FLOOR(d.y11 * 1e3 + 5e-1) AS BIGINT) AS y_treat_post_milli,
       CAST(FLOOR(d.y10 * 1e3 + 5e-1) AS BIGINT) AS y_treat_pre_milli,
       CAST(FLOOR(d.y01 * 1e3 + 5e-1) AS BIGINT) AS y_ctrl_post_milli,
       CAST(FLOOR(d.y00 * 1e3 + 5e-1) AS BIGINT) AS y_ctrl_pre_milli,
       CAST(FLOOR(((d.y11 - d.y10) - (d.y01 - d.y00)) * 1e3 + 5e-1)
            AS BIGINT) AS did_milli,
       (SELECT slope_micro FROM sl WHERE tr = 1) AS pre_slope_treat_micro,
       (SELECT slope_micro FROM sl WHERE tr = 0) AS pre_slope_ctrl_micro
FROM did d
WHERE d.y11 IS NOT NULL AND d.y10 IS NOT NULL
  AND d.y01 IS NOT NULL AND d.y00 IS NOT NULL
"""


@register("ext_did_estimator",
          oracle=_DID_BODY.format(src="events", day=_DID_DAY_DUCK),
          tags=("ext", "curation", "counterfactual"))
def ext_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (Card & Krueger 1994 canon) around the
    mid-month policy date: DiD = (treated post - pre) - (control post -
    pre) on mean event value, cohorts by the payload treatment flag —
    PLUS the audit that separates DiD-as-method from DiD-as-wishful-
    thinking: per-cohort PRE-period daily OLS slopes, whose gap is the
    parallel-trends check every referee asks for first. The
    time-dimension member of the counterfactual family: stratification
    (`ext_propensity_strata_att`) and AIPW (`ext_doubly_robust_ate`)
    adjust for WHO is treated; DiD differences out time-constant
    confounding even when selection is unobserved.

    Determinism: the 2x2 cells are exact cents/count rationals; the
    DiD close is one fixed-order chain; pre-trend slopes reuse the
    five-sum quantized regression algebra over the bounded day
    dimension (zero-variance guard exact).

    Scale shape: ONE groupBy(cohort, period) reduce plus one
    groupBy(cohort, day) pre-period reduce; everything after runs on
    bounded dimensions (the two scalar subqueries read the 2-row
    slope table).

    Reference basis: before/after comparison across configuration
    cohorts around a threshold change (Documentation-Self-
    Triggering.html:194-239); design from Card & Krueger 1994
    (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("did_events")
    return spark.sql(_DID_BODY.format(src="did_events",
                                      day=_DID_DAY_SPARK)
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_rdd_lite — regression-discontinuity probe at a value cutoff
# --------------------------------------------------------------------------

#: shared body: local linear fits of the purchase rate on both sides
#: of the value = 100 cutoff (bandwidth 50), intercepts = the two
#: one-sided limits, effect = their gap.
_RDD_BODY = """
WITH e AS (
    SELECT value - 1e2 AS x,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
    FROM {src}
    WHERE value >= 5e1 AND value < 15e1
),
sides AS (
    SELECT CASE WHEN x >= 0e0 THEN 1 ELSE 0 END AS side,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(x * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(FLOOR(x * x * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sxx,
           CAST(SUM(CAST(FLOOR(x * y * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS sxy
    FROM e GROUP BY 1
),
fit AS (
    SELECT side, n,
           (sy - (n * (sxy / 1e3) - (sx / 1e3) * sy)
                 / (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3))
                 * (sx / 1e3)) / n AS a
    FROM sides
    WHERE n > 2 AND (n * (sxx / 1e3) - (sx / 1e3) * (sx / 1e3)) > 0e0
)
SELECT MAX(CASE WHEN side = 1 THEN n END) AS n_right,
       MAX(CASE WHEN side = 0 THEN n END) AS n_left,
       CAST(FLOOR(MAX(CASE WHEN side = 1 THEN a END) * 1e6 + 5e-1)
            AS BIGINT) AS limit_right_micro,
       CAST(FLOOR(MAX(CASE WHEN side = 0 THEN a END) * 1e6 + 5e-1)
            AS BIGINT) AS limit_left_micro,
       CAST(FLOOR((MAX(CASE WHEN side = 1 THEN a END)
                   - MAX(CASE WHEN side = 0 THEN a END)) * 1e6 + 5e-1)
            AS BIGINT) AS rd_effect_micro
FROM fit
HAVING MAX(CASE WHEN side = 1 THEN a END) IS NOT NULL
   AND MAX(CASE WHEN side = 0 THEN a END) IS NOT NULL
"""


@register("ext_rdd_lite", oracle=_RDD_BODY.format(src="events"),
          tags=("ext", "curation", "counterfactual"))
def ext_rdd_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity probe (Thistlethwaite & Campbell
    1960; local-linear per Imbens & Lemieux 2008) at the value = 100
    cutoff: fit the purchase rate linearly on each side within a
    bandwidth of 50 and report the two one-sided limits and their gap
    — the causal effect of crossing the threshold IF assignment at
    the cutoff is as-good-as-random. The design member of the
    counterfactual family for RULE-ASSIGNED treatments (fee tiers,
    length cutoffs, quality-score gates) where strata/propensity
    logic has no overlap to exploit. A near-zero gap here is the
    placebo outcome expected on this synthetic feed — the planted
    test installs a real jump and checks recovery.

    Determinism: side aggregates 1e3-quantize per event before exact
    integer sums (sy is an exact integer count); each side's
    intercept is one fixed-order five-sum OLS chain; degenerate
    sides are guarded in the exact quantized algebra.

    Scale shape: ONE scan reduce (bandwidth filter pushed to the
    scan) to two rows of five sums; the close is bounded algebra.

    Reference basis: threshold-crossing response analysis on gated
    channels (Documentation-Self-Triggering.html:194-239); design
    from Thistlethwaite & Campbell 1960 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("rdd_events")
    return spark.sql(_RDD_BODY.format(src="rdd_events"))


# --------------------------------------------------------------------------
# ext_balance_smd — covariate balance table for the stratified design
# --------------------------------------------------------------------------

#: shared body ({day} = engine epoch-day): standardized mean
#: differences of the hour-of-day and day-of-week covariates between
#: treatment cohorts — the love-plot table.
_SMD_BODY = """
WITH e AS (
    SELECT CASE WHEN CAST(regexp_replace(props, '[^0-9]', '', 'g')
                     AS BIGINT) >= 50 THEN 1 ELSE 0 END AS t,
           CAST(CAST(hour(ts) AS BIGINT) AS DOUBLE) AS cov_hour,
           CAST(CAST({day} % 7 AS BIGINT) AS DOUBLE) AS cov_dow
    FROM {src}
),
lng AS (
    SELECT t, 'hour' AS cov, cov_hour AS v FROM e
    UNION ALL
    SELECT t, 'dow', cov_dow FROM e
),
m AS (
    SELECT cov, t,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(v * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s,
           CAST(SUM(CAST(FLOOR(v * v * 1e3 + 5e-1) AS BIGINT)) AS BIGINT)
               AS s2
    FROM lng GROUP BY cov, t
),
g AS (
    SELECT cov,
           MAX(CASE WHEN t = 1 THEN (s / 1e3) / n END) AS m1,
           MAX(CASE WHEN t = 0 THEN (s / 1e3) / n END) AS m0,
           MAX(CASE WHEN t = 1 THEN ((s2 / 1e3) - (s / 1e3) * (s / 1e3)
                                     / n) / (n - 1) END) AS v1,
           MAX(CASE WHEN t = 0 THEN ((s2 / 1e3) - (s / 1e3) * (s / 1e3)
                                     / n) / (n - 1) END) AS v0
    FROM m GROUP BY cov
)
SELECT cov,
       CAST(FLOOR(m1 * 1e3 + 5e-1) AS BIGINT) AS mean_treat_milli,
       CAST(FLOOR(m0 * 1e3 + 5e-1) AS BIGINT) AS mean_ctrl_milli,
       CAST(FLOOR((m1 - m0) / SQRT((v1 + v0) / 2e0) * 1e6 + 5e-1)
            AS BIGINT) AS smd_micro,
       CASE WHEN ABS((m1 - m0) / SQRT((v1 + v0) / 2e0)) < 1e-1
            THEN 1 ELSE 0 END AS balanced
FROM g WHERE v1 + v0 > 0e0
ORDER BY cov
"""


@register("ext_balance_smd",
          oracle=_SMD_BODY.format(src="events", day=_DID_DAY_DUCK),
          tags=("ext", "curation", "counterfactual", "audit"))
def ext_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance table (standardized mean differences — the
    love plot of Austin 2009) for the logged treatment: per covariate
    (hour of day, day of week) the treated and control means and
    SMD = (m1 - m0) / sqrt((v1 + v0)/2), flagged against the |SMD| <
    0.1 convention. The diagnostic that PRECEDES every estimator in
    the counterfactual family: stratified ATT, AIPW and DiD all
    assume the cohorts are comparable on observables — this is the
    table that says whether they are, and the first artifact a
    causal-analysis reviewer requests.

    Determinism: covariates are exact small integers; moments
    1e3-quantize per event before exact sums; each SMD is one
    fixed-order chain over the quantized moments.

    Scale shape: ONE scan reduce (the 2-covariate union doubles rows
    map-side, no shuffle growth) to 4 moment rows; bounded closes.

    Reference basis: cohort-comparability screening across
    configuration groups (Documentation-Self-Triggering.html:
    194-239); convention from Austin 2009 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("smd_events")
    return spark.sql(_SMD_BODY.format(src="smd_events",
                                      day=_DID_DAY_SPARK)
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_auc_delong_variance — AUC with DeLong standard error
# --------------------------------------------------------------------------

#: shared body ({ws} = engine word-count expression): the WEAK
#: average-word-length score (AUC ~ 0.67 — a realistic classifier,
#: not the separable length score) against the long-doc label;
#: DeLong structural components V10/V01 from cumulative counts over
#: the distinct-score dimension, variance = S10/n1 + S01/n0.
_DELONG_SQL = """
WITH sc AS (
    SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
           CAST(FLOOR(1e0 / (1e0 + EXP(-(-55e-1
                      + (CAST(n_chars AS DOUBLE) / ({ws} + 1e0)))))
                      * 1e6 + 5e-1) AS BIGINT) AS p_micro
    FROM {src} WHERE n_chars > 0
),
d AS (
    SELECT p_micro,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg
    FROM sc GROUP BY p_micro
),
tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS n1,
               CAST(SUM(n_neg) AS BIGINT) AS n0 FROM d),
cum AS (
    SELECT p_micro, n_pos, n_neg,
           CAST(COALESCE(SUM(n_neg) OVER (ORDER BY p_micro
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS neg_below,
           CAST(COALESCE(SUM(n_pos) OVER (ORDER BY p_micro
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS pos_below
    FROM d
),
v AS (
    SELECT c.p_micro, c.n_pos, c.n_neg,
           (c.neg_below + c.n_neg / 2e0) / t.n0 AS v10,
           (t.n1 - c.pos_below - c.n_pos + c.n_pos / 2e0) / t.n1 AS v01
    FROM cum c JOIN tot t ON TRUE
),
auc AS (
    SELECT CAST(SUM(CAST(FLOOR(n_pos * v10 * 1e9 + 5e-1) AS BIGINT))
                AS BIGINT) AS s_nano, t.n1, t.n0
    FROM v JOIN tot t ON TRUE GROUP BY t.n1, t.n0
),
vr AS (
    SELECT a.n1, a.n0, a.s_nano,
           SUM(CAST(FLOOR(v.n_pos * (v.v10 - a.s_nano / 1e9 / a.n1)
                          * (v.v10 - a.s_nano / 1e9 / a.n1) * 1e9 + 5e-1)
                    AS BIGINT)) / 1e9 AS ss10,
           SUM(CAST(FLOOR(v.n_neg * (v.v01 - a.s_nano / 1e9 / a.n1)
                          * (v.v01 - a.s_nano / 1e9 / a.n1) * 1e9 + 5e-1)
                    AS BIGINT)) / 1e9 AS ss01
    FROM v JOIN auc a ON TRUE
    GROUP BY a.n1, a.n0, a.s_nano
)
SELECT n1, n0,
       CAST(FLOOR(s_nano / 1e9 / n1 * 1e6 + 5e-1) AS BIGINT)
           AS auc_micro,
       CAST(FLOOR((ss10 / (n1 - 1) / n1 + ss01 / (n0 - 1) / n0) * 1e9
                  + 5e-1) AS BIGINT) AS var_nano,
       CAST(FLOOR(SQRT(ss10 / (n1 - 1) / n1 + ss01 / (n0 - 1) / n0)
                  * 1e6 + 5e-1) AS BIGINT) AS se_micro
FROM vr
WHERE n1 > 1 AND n0 > 1
"""


@register("ext_auc_delong_variance",
          oracle=_DELONG_SQL.format(src="documents", ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "eval", "quality"))
def ext_auc_delong_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with DeLong's nonparametric standard error (DeLong, DeLong
    & Clarke-Pearson 1988) for the WEAK average-word-length quality
    score: the structural components V10 (per positive, the fraction
    of negatives it outranks, ties half) and V01 (per negative), with
    Var(AUC) = S10/n1 + S01/n0. This is what turns the point AUC of
    `ext_quality_auc` into a confidence statement ("0.665 +/- 0.011"),
    and the machinery two-classifier AUC comparison tests are built
    from — computed WITHOUT the O(n1*n0) pair enumeration: cumulative
    counts over the distinct-score dimension give every V10/V01
    exactly.

    Determinism: distinct-score counts and both cumulative sums are
    exact integers; each V10/V01 is a fixed-order rational; AUC and
    the two scatter sums nano-quantize per distinct score before
    exact integer sums; closes are single chains.

    Scale shape: ONE scan reduce to the distinct-score dimension, two
    windows over it, a 1-row totals cross (allowlisted), a scalar
    close. The corpus is touched once.

    Reference basis: discrimination-quality uncertainty for channel
    classifiers (Documentation-Self-Triggering.html:194-239);
    estimator from DeLong et al., Biometrics 1988 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("delong_docs")
    return spark.sql(_DELONG_SQL.format(src="delong_docs",
                                        ws=_sc.WS_COUNT_SQL_SPARK))


# --------------------------------------------------------------------------
# ext_cronbach_alpha — internal-consistency reliability of quality items
# --------------------------------------------------------------------------

#: shared body ({ws} = engine word-count expression): four scaled
#: quality items per document (chars, words, vowel mass, average word
#: length), item and total variances from milli-quantized exact
#: sums, alpha = k/(k-1) * (1 - sum(Var_i) / Var_total).
_CRONBACH_SQL = """
WITH items AS (
    SELECT CAST(n_chars AS DOUBLE) / 1e2 AS i1,
           CAST({ws} AS DOUBLE) / 1e1 AS i2,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g'))
                AS DOUBLE) / 1e1 AS i3,
           CAST(n_chars AS DOUBLE) / ({ws} + 1e0) AS i4
    FROM {src} WHERE n_chars > 0
),
q AS (
    SELECT CAST(FLOOR(i1 * 1e3 + 5e-1) AS BIGINT) AS a,
           CAST(FLOOR(i2 * 1e3 + 5e-1) AS BIGINT) AS b,
           CAST(FLOOR(i3 * 1e3 + 5e-1) AS BIGINT) AS c,
           CAST(FLOOR(i4 * 1e3 + 5e-1) AS BIGINT) AS d
    FROM items
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(a * a) AS BIGINT) AS saa,
           CAST(SUM(b) AS BIGINT) AS sb, CAST(SUM(b * b) AS BIGINT) AS sbb,
           CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc,
           CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(d * d) AS BIGINT) AS sdd,
           CAST(SUM(a + b + c + d) AS BIGINT) AS st,
           CAST(SUM((a + b + c + d) * (a + b + c + d)) AS BIGINT) AS stt
    FROM q
),
v AS (
    SELECT n,
           ((saa - CAST(sa AS DOUBLE) * sa / n)
            + (sbb - CAST(sb AS DOUBLE) * sb / n)
            + (scc - CAST(sc AS DOUBLE) * sc / n)
            + (sdd - CAST(sd AS DOUBLE) * sd / n)) / (n - 1) AS sum_vi,
           (stt - CAST(st AS DOUBLE) * st / n) / (n - 1) AS v_tot
    FROM m WHERE n > 1
)
SELECT n,
       CAST(FLOOR(sum_vi * 1e3 + 5e-1) AS BIGINT) AS sum_item_var_milli,
       CAST(FLOOR(v_tot * 1e3 + 5e-1) AS BIGINT) AS total_var_milli,
       CAST(FLOOR(4e0 / 3e0 * (1e0 - sum_vi / v_tot) * 1e6 + 5e-1)
            AS BIGINT) AS alpha_micro
FROM v WHERE v_tot > 0e0
"""


@register("ext_cronbach_alpha",
          oracle=_CRONBACH_SQL.format(src="documents", ws=_sc.WS_COUNT_SQL),
          tags=("ext", "curation", "eval"))
def ext_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951) of the four length-family
    quality items (chars, words, vowel mass, average word length):
    do they measure ONE underlying construct strongly enough to be
    summed into a single quality scale? alpha = k/(k-1) *
    (1 - sum Var_item / Var_total) — the reliability gate every
    composite score (`ext_quality_ensemble`'s vote,
    `ext_quality_logistic`'s feature sum) implicitly assumes; a low
    alpha says the items disagree and a sum mixes constructs. The
    scale-construction complement of `ext_weighted_kappa`
    (inter-RATER) and `ext_weak_supervision_matrix` (inter-SOURCE).

    Determinism: items milli-quantize per document into exact int64;
    all ten moments are exact integer sums (the total's square stays
    under int64 at design scale by the quantization budget); the
    variance and alpha closes are fixed-order chains.

    Scale shape: ONE map-side-combinable scan reduce to eleven
    integers; scalar closes. Nothing downstream scales with the
    corpus.

    Reference basis: multi-channel composite-score reliability
    (Documentation-Self-Triggering.html:194-239); coefficient from
    Cronbach 1951 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cronbach_docs")
    return spark.sql(_CRONBACH_SQL.format(src="cronbach_docs",
                                          ws=_sc.WS_COUNT_SQL_SPARK)
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_jackknife_variance — delete-one-source jackknife of the corpus mean
# --------------------------------------------------------------------------

#: shared body: per-source totals, leave-one-source-out means
#: (micro-quantized), and the grouped-jackknife standard error
#: sqrt((g-1)/g * sum (theta_j - theta_bar)^2).
_JACKKNIFE_SQL = """
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_j,
           CAST(SUM(n_chars) AS BIGINT) AS s_j
    FROM {src} GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(s_j) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS g
    FROM s
),
loo AS (
    SELECT s.source,
           CAST(FLOOR((CAST(t.s AS DOUBLE) - s.s_j)
                      / (t.n - s.n_j) * 1e6 + 5e-1) AS BIGINT)
               AS theta_j_micro
    FROM s JOIN tot t ON TRUE
),
jb AS (SELECT AVG(CAST(theta_j_micro AS DOUBLE)) / 1e6 AS theta_bar
       FROM loo),
jk AS (
    SELECT t.g, CAST(t.s AS DOUBLE) / t.n AS theta_hat, jb.theta_bar,
           SUM((theta_j_micro / 1e6 - jb.theta_bar)
               * (theta_j_micro / 1e6 - jb.theta_bar)) AS ss
    FROM loo JOIN tot t ON TRUE JOIN jb ON TRUE
    GROUP BY t.g, t.s, t.n, jb.theta_bar
)
SELECT g AS n_groups,
       CAST(FLOOR(theta_hat * 1e3 + 5e-1) AS BIGINT) AS mean_milli,
       CAST(FLOOR(theta_bar * 1e3 + 5e-1) AS BIGINT) AS jack_mean_milli,
       CAST(FLOOR(SQRT((g - 1e0) / g * ss) * 1e6 + 5e-1) AS BIGINT)
           AS jack_se_micro
FROM jk
"""


@register("ext_jackknife_variance",
          oracle=_JACKKNIFE_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife (Quenouille 1956; Tukey 1958; the
    grouped form survey statistics runs) of the corpus mean document
    length, deleting one SOURCE at a time: SE_jack = sqrt((g-1)/g *
    sum (theta_(j) - theta_bar)^2). Where the i.i.d.-resampling
    `ext_bootstrap_ci` treats documents as exchangeable, the grouped
    jackknife respects that documents CLUSTER by source — the honest
    uncertainty for corpus-level statistics when sources are the
    sampling unit (one source swap moves the mean more than a
    thousand document swaps). Each leave-one-out mean comes from the
    totals algebra, not a re-scan.

    Determinism: per-source totals are exact int64; each
    leave-one-out mean is one fixed-order division micro-quantized;
    the scatter and SE closes are fixed-order chains over the
    bounded group dimension.

    Scale shape: ONE map-side-combinable groupBy(source) reduce;
    everything after is |sources|-row algebra with a 1-row totals
    cross (allowlisted). The corpus is scanned once.

    Reference basis: leave-one-configuration-out stability of fleet
    aggregates (Documentation-Self-Triggering.html:194-239); method
    from Quenouille 1956 / Tukey 1958 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("jackknife_docs")
    return spark.sql(_JACKKNIFE_SQL.format(src="jackknife_docs"))


# --------------------------------------------------------------------------
# ext_friedman_kendall_w — blocked rank test + concordance of sources
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Blocks = sources with all
#: five languages present, treatments = languages, measurement = the
#: milli-quantized mean document length per cell; ranks are integers
#: (ties on the quantized mean broken by language code), so the rank
#: sums, their squares and both statistics derive from exact int64.
_FRIEDMAN_SQL = """
WITH cell AS (
    SELECT source, lang,
           CAST(FLOOR(CAST(SUM(n_chars) AS BIGINT) * 1e3 / COUNT(*)
                      + 5e-1) AS BIGINT) AS v
    FROM {src} GROUP BY source, lang
),
blocks AS (
    SELECT source FROM cell GROUP BY source HAVING COUNT(*) = 5
),
rk AS (
    SELECT c.source, c.lang,
           CAST(RANK() OVER (PARTITION BY c.source
                             ORDER BY c.v, c.lang) AS BIGINT) AS r
    FROM cell c JOIN blocks b ON c.source = b.source
),
rj AS (
    SELECT lang, CAST(SUM(r) AS BIGINT) AS r_j
    FROM rk GROUP BY lang
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(r_j * r_j) AS BIGINT) AS ssr
    FROM rj
),
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM blocks)
SELECT b.b AS n_blocks, m.k AS n_treatments,
       CAST(FLOOR((12e0 * m.ssr / (b.b * m.k * (m.k + 1e0))
                   - 3e0 * b.b * (m.k + 1e0)) * 1e6 + 5e-1) AS BIGINT)
           AS friedman_chi2_micro,
       CAST(FLOOR((12e0 * m.ssr / (b.b * m.k * (m.k + 1e0))
                   - 3e0 * b.b * (m.k + 1e0))
                  / (b.b * (m.k - 1e0)) * 1e6 + 5e-1) AS BIGINT)
           AS kendall_w_micro
FROM m JOIN b ON TRUE
WHERE b.b > 0 AND m.k > 1
"""


@register("ext_friedman_kendall_w",
          oracle=_FRIEDMAN_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_friedman_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's blocked rank test (Friedman 1937) plus Kendall's
    coefficient of concordance W (Kendall & Babington Smith 1939) over
    the source x language grid: within each complete block (a source
    carrying all five languages), rank the languages by mean document
    length; Friedman chi2 = 12/(b*k*(k+1)) * sum R_j^2 - 3b(k+1) asks
    whether the language ordering is consistent across sources, and
    W = chi2/(b(k-1)) grades that consistency on [0,1]. The
    repeated-measures analog of `ext_kruskal_wallis` (independent
    groups) and the ordinal counterpart of `ext_cochran_q` (binary
    blocked) — closing the blocked-design cell of the rank-test family.

    Determinism: cell means are milli-quantized to int64 BEFORE
    ranking (ties broken by language code, an absolute key); rank
    sums and their squares are exact integer sums over the bounded
    language dimension; both statistic closes are single fixed-order
    IEEE expressions, micro-quantized. Incomplete blocks are dropped
    by an integer HAVING count.

    Scale shape: ONE map-side-combinable groupBy(source, lang) reduce;
    ranking windows partition by source over a <=5-row frame; the
    closes are k-row and 1-row algebra. Nothing scales past the first
    reduce.

    Reference basis: consistent ordering of per-configuration response
    across boards (Documentation-Self-Triggering.html:194-239);
    statistics from Friedman 1937, Kendall & Babington Smith 1939
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("friedman_docs")
    return spark.sql(_FRIEDMAN_SQL.format(src="friedman_docs"))


# --------------------------------------------------------------------------
# ext_krippendorff_alpha — chance-corrected agreement, margin-pooled
# --------------------------------------------------------------------------

#: shared body ({src} = non-empty documents view). Same three binary
#: raters as `ext_fleiss_kappa`; for binary categories with m=3 raters
#: and no missing values, alpha = 1 - (N-1) * sum_u v(3-v) /
#: (2 * n1 * n0) with N = 3n — every term an exact int64, so the only
#: float op is the final division, micro-quantized.
_KRIPPENDORFF_SQL = """
WITH v AS (
    SELECT (CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END
          + CASE WHEN n_digit * 1000 < n_chars * 120 THEN 1 ELSE 0 END
          + CASE WHEN n_space * 1000 >= n_chars * 100 THEN 1 ELSE 0 END)
          AS k
    FROM (SELECT n_chars,
                 CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                 CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS n_space
          FROM {src} WHERE n_chars > 0)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS n1,
           CAST(SUM(k * (3 - k)) AS BIGINT) AS d_obs
    FROM v
)
SELECT n AS n_units, n1 AS n_ones,
       CAST(3 * n - n1 AS BIGINT) AS n_zeros, d_obs,
       CAST(FLOOR((1e0 - (3e0 * n - 1e0) * d_obs
                   / (2e0 * n1 * (3e0 * n - n1))) * 1e6 + 5e-1)
            AS BIGINT) AS alpha_micro
FROM m
WHERE n1 > 0 AND n1 < 3 * n
"""


@register("ext_krippendorff_alpha",
          oracle=_KRIPPENDORFF_SQL.format(src="documents"),
          tags=("ext", "curation", "eval"))
def ext_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (Krippendorff 1970/2004, nominal data) for
    the same three deterministic binary raters `ext_fleiss_kappa`
    audits — the missing member of the agreement family: Cohen/weighted
    kappa (two raters), Fleiss (multi-rater, per-RATER chance),
    Krippendorff (multi-rater, MARGIN-POOLED chance: expected
    disagreement comes from the pooled value distribution across all
    raters, which is why alpha generalizes to missing data and any
    metric, and why content-analysis methodology standardized on it).
    For binary categories, three raters, no missing values the
    identity alpha = 1 - (N-1) * sum_u v_u(3-v_u) / (2*n1*n0) holds
    with N = 3n total judgments, n1/n0 the pooled vote margins.

    Determinism: v, n1 and the per-unit disagreement v(3-v) are exact
    int64 sums (one corpus reduce); alpha is a single fixed-order IEEE
    expression over four integers, micro-quantized. Unanimous corpora
    (n1 = 0 or 3n, where expected disagreement is zero and alpha is
    undefined) are excluded by an integer WHERE guard spelled
    identically in both engines.

    Scale shape: row-local CASE votes, ONE map-side-combinable
    aggregate, 1-row close — the best possible shape at 100 TB.

    Reference basis: cross-criterion consensus on channel quality
    (Documentation-Self-Triggering.html:194-239); coefficient from
    Krippendorff 1970 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kripp_docs")
    return spark.sql(_KRIPPENDORFF_SQL.format(src="kripp_docs")
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_hosmer_lemeshow — decile-binned goodness of fit of a fixed scorer
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The fixed logistic scorer
#: p = 1/(1+exp(-(n_chars-300)/100)) predicts "English" from length;
#: per-row p is micro-quantized to int64 BEFORE binning and summing,
#: so decile membership (NTILE over an integer key), O_g and E_g are
#: all exact; each group's chi-square term is one IEEE close
#: micro-quantized to int64 and the 10-term total is an integer sum.
_HOSMER_SQL = """
WITH scored AS (
    SELECT doc_id,
           CAST(FLOOR(1e6 / (1e0 + EXP(-(n_chars - 3e2) / 1e2)) + 5e-1)
                AS BIGINT) AS p_micro,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM {src}
),
binned AS (
    SELECT p_micro, y,
           NTILE(10) OVER (ORDER BY p_micro, doc_id) AS g
    FROM scored
),
grp AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(y) AS BIGINT) AS o1,
           CAST(SUM(p_micro) AS BIGINT) AS e1_micro
    FROM binned GROUP BY g
),
term AS (
    SELECT g,
           CAST(FLOOR((o1 - e1_micro / 1e6) * (o1 - e1_micro / 1e6)
                      / ((e1_micro / 1e6)
                         * (1e0 - e1_micro / 1e6 / n_g)) * 1e6 + 5e-1)
                AS BIGINT) AS t_micro
    FROM grp
    WHERE e1_micro > 0 AND e1_micro < n_g * 1000000
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(COUNT(*) - 2 AS BIGINT) AS df,
       CAST(SUM(t_micro) AS BIGINT) AS hl_chi2_micro
FROM term
"""


@register("ext_hosmer_lemeshow",
          oracle=_HOSMER_SQL.format(src="documents"),
          tags=("ext", "curation", "eval"))
def ext_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit (Hosmer & Lemeshow 1980) of a
    fixed logistic scorer (predicting "English" from document length):
    decile-bin the predictions, compare observed vs expected positives
    per bin, chi2 = sum (O_g - E_g)^2 / (E_g (1 - E_g/n_g)). The
    complement of the calibration family already shipped —
    `ext_quality_calibration_bins` reports per-bin gaps,
    `ext_spiegelhalter_z` tests the global Brier mean,
    `ext_isotonic_calibration_pav` repairs — HL is the classic TEST of
    binned fit the literature expects next to them, and a miscalibrated
    quality filter is exactly how a curation pipeline silently skews a
    corpus.

    Determinism: per-row probabilities are micro-quantized to int64
    BEFORE anything else, so bin assignment (NTILE over the integer
    key with doc_id tie-break), O_g and E_g are exact integer
    aggregates; each bin's chi-square term is one fixed-order IEEE
    close micro-quantized to int64, and the total is an integer SUM
    over <=10 rows. Degenerate bins (E = 0 or E = n) are excluded on
    integers.

    Scale shape: one row-local scoring pass; NTILE is a single
    order-by over the corpus (the one global sort — at 100 TB replace
    with fixed probability cut-points, same SQL shape minus the sort;
    the decile form is kept because HL is defined on equal-count
    bins); then ONE 10-group reduce and a 1-row close.

    Reference basis: binned observed-vs-expected validation of fitted
    response curves (DAQ_self-triggering.md:84-93's per-pixel
    baseline-fit heatmaps and histograms); test from Hosmer &
    Lemeshow 1980 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("hosmer_docs")
    return spark.sql(_HOSMER_SQL.format(src="hosmer_docs"))


# --------------------------------------------------------------------------
# ext_cochran_armitage — dose-response trend in proportions
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Dose = length quintile
#: (NTILE over the integer n_chars with doc_id tie-break), response =
#: is-English. The trend numerator A = n*sum(w*r) - R*sum(w*n_g) and
#: curvature B = n*sum(w^2*n_g) - (sum(w*n_g))^2 are exact int64; the
#: Z^2 close is one IEEE expression over those integers.
_COCHRAN_ARMITAGE_SQL = """
WITH dosed AS (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           NTILE(5) OVER (ORDER BY n_chars, doc_id) AS w
    FROM {src}
),
g AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(y) AS BIGINT) AS r_g
    FROM dosed GROUP BY w
),
m AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(r_g) AS BIGINT) AS r,
           CAST(SUM(w * r_g) AS BIGINT) AS swr,
           CAST(SUM(w * n_g) AS BIGINT) AS swn,
           CAST(SUM(w * w * n_g) AS BIGINT) AS swwn
    FROM g
)
SELECT n, r,
       CAST(n * swr - r * swn AS BIGINT) AS trend_num,
       CAST(FLOOR((n * swr - r * swn) * 1e0 * (n * swr - r * swn)
                  * n / (r * 1e0 * (n - r)
                         * (n * swwn - swn * swn)) * 1e6 + 5e-1)
            AS BIGINT) AS z2_micro
FROM m
WHERE r > 0 AND r < n AND n * swwn - swn * swn > 0
"""


@register("ext_cochran_armitage",
          oracle=_COCHRAN_ARMITAGE_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Cochran 1954; Armitage 1955): does
    the proportion of English documents rise or fall MONOTONICALLY
    across ordered length quintiles? The chi-square independence test
    (`ext_chi2_independence`) spends its power on any departure; when
    the alternative is ordered (dose-response — longer documents, more
    English), the trend test concentrates all of it on the linear
    contrast Z^2 = n*A^2 / (R(n-R)*B) with A = n*sum(w r_g) -
    R*sum(w n_g), B = n*sum(w^2 n_g) - (sum(w n_g))^2. The standard
    epidemiology/dose-response member the categorical family was
    missing (chi2, Cramer's V, Mantel-Haenszel, McNemar, Cochran Q all
    shipped).

    Determinism: dose assignment is NTILE over integers with an
    absolute tie-break; all five moments are exact int64 sums over the
    bounded dose dimension; A and B are integer algebra (magnitudes
    within int64 at design scale by the quantization budget), and the
    Z^2 close is one fixed-order IEEE expression, micro-quantized.
    Degenerate margins guard on integers.

    Scale shape: NTILE's global sort is the only corpus-wide order-by
    (at 100 TB, fixed length cut-points replace it — same downstream
    SQL); then ONE 5-group reduce and a 1-row close.

    Reference basis: monotone response-vs-threshold-offset trend
    across the scanned DAC range (DAQ_self-triggering.md:84-87);
    statistic from Cochran 1954 / Armitage 1955 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ca_docs")
    return spark.sql(_COCHRAN_ARMITAGE_SQL.format(src="ca_docs"))


# --------------------------------------------------------------------------
# ext_map_mrr_eval — rank-position quality of the cosine retriever
# --------------------------------------------------------------------------

#: shared body ({pos} = long-form (vec_id, label, i, v) source). Same
#: panel, quantized-cosine ranking and top-10 window as the nDCG
#: oracle; the MRR term 1e6/first_rank and each AP precision term
#: cum_rel*1e6/rank are FLOORed to int64 (exact: integer inputs, one
#: IEEE division), so per-query metrics are integer sums divided once.
_MAP_MRR_SQL = """
WITH pos AS (SELECT * FROM {pos}),
qv AS (SELECT vec_id AS q_id, label AS q_label, i, v AS qv
       FROM pos WHERE vec_id % 100 = 0),
dots AS (
    SELECT q.q_id, ANY_VALUE(q.q_label) AS q_label, p.vec_id,
           ANY_VALUE(p.label) AS label,
           SUM(p.v * q.qv) AS dp, SQRT(SUM(p.v * p.v)) AS norm_p
    FROM pos p JOIN qv q ON p.i = q.i
    WHERE p.vec_id % 100 <> 0
    GROUP BY q.q_id, p.vec_id
),
qn AS (SELECT q_id, SQRT(SUM(qv * qv)) AS norm_q FROM qv GROUP BY q_id),
cos AS (
    SELECT d.q_id, d.q_label, d.vec_id, d.label,
           FLOOR(d.dp / (d.norm_p * qn.norm_q) * 1e6 + 5e-1) / 1e6 AS sim
    FROM dots d JOIN qn USING (q_id)
),
rtot AS (
    SELECT q_id, CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
                      AS BIGINT) AS r_corpus
    FROM cos GROUP BY q_id
),
ranked AS (
    SELECT q_id,
           CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id) AS rnk
    FROM cos
),
top AS (
    SELECT q_id, rel, rnk,
           CAST(SUM(rel) OVER (PARTITION BY q_id ORDER BY rnk
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_rel
    FROM ranked WHERE rnk <= 10
),
perq AS (
    SELECT q_id,
           CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
           CAST(MIN(CASE WHEN rel = 1 THEN rnk END) AS BIGINT)
               AS first_rank,
           CAST(SUM(CASE WHEN rel = 1 THEN
                    CAST(FLOOR(cum_rel * 1e6 / rnk + 5e-1) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS ap_num_micro
    FROM top GROUP BY q_id
)
SELECT p.q_id, r.r_corpus, p.n_rel_top10,
       CAST(CASE WHEN p.first_rank IS NULL THEN 0
                 ELSE CAST(FLOOR(1e6 / p.first_rank + 5e-1) AS BIGINT)
            END AS BIGINT) AS rr_micro,
       CAST(CASE WHEN r.r_corpus = 0 THEN 0
                 ELSE CAST(FLOOR(p.ap_num_micro * 1e0
                                 / (CASE WHEN r.r_corpus < 10
                                         THEN r.r_corpus ELSE 10 END)
                                 + 5e-1) AS BIGINT)
            END AS BIGINT) AS ap10_micro
FROM perq p JOIN rtot r USING (q_id)
"""


@register("ext_map_mrr_eval",
          oracle=_MAP_MRR_SQL.format(pos=f"({_POS_SQL})"),
          tags=("ext", "similarity", "eval"))
def ext_map_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and AP@10 of the exact-cosine retriever against
    cluster-label relevance — the two rank-position metrics the eval
    family still lacked next to `ext_ann_recall_report` (set overlap)
    and `ext_ndcg_eval` (graded gain): reciprocal rank scores HOW SOON
    the first relevant neighbor appears (the metric for known-item /
    QA retrieval), and average precision at 10 integrates precision at
    every relevant position, normalized by min(R, 10) with R the
    query's corpus-wide relevant count (interpolated MAP, the TREC
    convention). Same panel (every 100th vector), same quantized
    cosine, same deterministic tie-break as the sibling evals, so the
    three scorecards are directly comparable per query.

    Determinism: sim is micro-quantized before ranking (ties broken
    by vec_id); cum_rel/rnk and 1/first_rank terms are FLOORed to
    int64 from exact integer inputs; per-query metrics are integer
    sums with ONE final IEEE division each. Queries with no relevant
    neighbor report 0 by an integer CASE, identical in both engines.

    Scale shape: the panel broadcasts; the dot-product join is a
    broadcast hash join on 64 position keys + one map-side-combinable
    (query, candidate) reduce — cost |corpus| x |panel|, the honest
    price of exact eval (sampled panel at 100 TB); top-10 is a bounded
    window, the metric closes are 10-row algebra per query.

    Reference basis: scored candidate ranking against a reference
    signal (DAQ_self-triggering.md:343-346); metrics from Voorhees
    1999 (MRR) and the TREC average-precision convention (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    (emb.select("vec_id", "label",
                F.posexplode("embedding").alias("i0", "v0"))
        .select("vec_id", "label", (F.col("i0") + 1).alias("i"),
                F.col("v0").cast("double").alias("v"))
        .createOrReplaceTempView("mapmrr_pos"))
    return spark.sql(_MAP_MRR_SQL.format(pos="mapmrr_pos"))


# --------------------------------------------------------------------------
# ext_page_trend — ordered-alternative trend across the Friedman blocks
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Same complete-block rank table
#: as `ext_friedman_kendall_w`; Page's L = sum_j j*R_j against the
#: alphabetical-language hypothesized ordering, standardized with the
#: exact integer moments E[L] = b*k*(k+1)^2/4 and
#: Var[L] = b*k^2*(k+1)*(k^2-1)/144.
_PAGE_TREND_SQL = """
WITH cell AS (
    SELECT source, lang,
           CAST(FLOOR(CAST(SUM(n_chars) AS BIGINT) * 1e3 / COUNT(*)
                      + 5e-1) AS BIGINT) AS v
    FROM {src} GROUP BY source, lang
),
blocks AS (
    SELECT source FROM cell GROUP BY source HAVING COUNT(*) = 5
),
rk AS (
    SELECT c.source, c.lang,
           CAST(RANK() OVER (PARTITION BY c.source
                             ORDER BY c.v, c.lang) AS BIGINT) AS r,
           CAST(RANK() OVER (PARTITION BY c.source
                             ORDER BY c.lang) AS BIGINT) AS w
    FROM cell c JOIN blocks b ON c.source = b.source
),
l AS (
    SELECT CAST(SUM(w * r) AS BIGINT) AS l_stat,
           CAST(COUNT(*) / 5 AS BIGINT) AS b,
           CAST(5 AS BIGINT) AS k
    FROM rk
)
SELECT b AS n_blocks, k AS n_treatments, l_stat,
       CAST(b * k * (k + 1) * (k + 1) / 4 AS BIGINT) AS l_mean,
       CAST(FLOOR((l_stat - b * k * (k + 1e0) * (k + 1e0) / 4e0)
                  / SQRT(b * k * k * (k + 1e0) * (k * k - 1e0) / 144e0)
                  * 1e6 + 5e-1) AS BIGINT) AS z_micro
FROM l
WHERE b > 0
"""


@register("ext_page_trend",
          oracle=_PAGE_TREND_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test (Page 1963) on the source x language blocks:
    where Friedman (`ext_friedman_kendall_w`) asks "do the languages
    differ at all?", Page asks the sharper ORDERED question — do the
    within-block ranks follow the hypothesized ordering (alphabetical
    language code, the fixed reference ordering)? L = sum_j w_j R_j
    concentrates power on the monotone alternative exactly as
    `ext_cochran_armitage` does for proportions — the blocked-design
    member of the ordered-alternative pair.

    Determinism: both the measurement ranks and the hypothesized-order
    weights are integer RANK() windows over <=5-row frames with
    absolute tie-breaks; L and its exact moments are integer algebra
    (E[L] = bk(k+1)^2/4 is an exact integer for k = 5); the z close is
    one fixed-order IEEE expression, micro-quantized.

    Scale shape: identical to the Friedman sibling — ONE
    groupBy(source, lang) reduce, bounded ranking windows, 1-row
    close.

    Reference basis: monotone response ordering across scanned
    configurations (DAQ_self-triggering.md:84-87); statistic from Page
    1963 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("page_docs")
    return spark.sql(_PAGE_TREND_SQL.format(src="page_docs"))


# --------------------------------------------------------------------------
# ext_gwet_ac1 — chance-robust agreement of the three binary raters
# --------------------------------------------------------------------------

#: shared body ({src} = non-empty documents view). Same three raters
#: as `ext_fleiss_kappa` / `ext_krippendorff_alpha`; AC1 replaces the
#: margin-product chance model with Gwet's 2*pi*(1-pi), immune to the
#: prevalence paradox. All moments are exact int64; the close is one
#: fixed-order IEEE chain (1 - Pe >= 1/2 always, so no guard needed).
_GWET_SQL = """
WITH v AS (
    SELECT (CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END
          + CASE WHEN n_digit * 1000 < n_chars * 120 THEN 1 ELSE 0 END
          + CASE WHEN n_space * 1000 >= n_chars * 100 THEN 1 ELSE 0 END)
          AS k
    FROM (SELECT n_chars,
                 CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                 CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS n_space
          FROM {src} WHERE n_chars > 0)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS n1,
           CAST(SUM(k * k + (3 - k) * (3 - k)) AS BIGINT) AS sq
    FROM v
)
SELECT n AS n_units, n1 AS n_ones,
       CAST(FLOOR((sq - 3 * n) * 1e0 / (6e0 * n) * 1e6 + 5e-1) AS BIGINT)
           AS pa_micro,
       CAST(FLOOR(2e0 * (n1 * 1e0 / (3e0 * n))
                  * (1e0 - n1 * 1e0 / (3e0 * n)) * 1e6 + 5e-1) AS BIGINT)
           AS pe_micro,
       CAST(FLOOR(((sq - 3 * n) * 1e0 / (6e0 * n)
                   - 2e0 * (n1 * 1e0 / (3e0 * n))
                     * (1e0 - n1 * 1e0 / (3e0 * n)))
                  / (1e0 - 2e0 * (n1 * 1e0 / (3e0 * n))
                           * (1e0 - n1 * 1e0 / (3e0 * n)))
                  * 1e6 + 5e-1) AS BIGINT) AS ac1_micro
FROM m
WHERE n > 0
"""


@register("ext_gwet_ac1",
          oracle=_GWET_SQL.format(src="documents"),
          tags=("ext", "curation", "eval"))
def ext_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 (Gwet 2008) for the three deterministic binary raters
    — the chance-ROBUST member of the agreement family: kappa-style
    coefficients collapse when one category dominates (the prevalence
    paradox: 95% yes-yes agreement can yield kappa ~ 0), because their
    chance model multiplies the skewed margins. AC1's chance term
    2*pi*(1-pi) is bounded by 1/2, so the coefficient stays
    interpretable on exactly the skewed distributions training-data
    quality votes produce. Read beside `ext_fleiss_kappa` (same Pa,
    margin-product Pe) and `ext_krippendorff_alpha` (margin-pooled
    D_e): when the three disagree, the margins are skewed and AC1 is
    the one to trust.

    Determinism: the same exact-int64 corpus reduce as the Fleiss
    twin (P_i numerators integer by the v^2+(3-v)^2 identity); Pa, Pe
    and AC1 are fixed-order IEEE expressions over three integers,
    micro-quantized. No degenerate guard is needed: 1 - Pe >= 1/2
    always (Pe = 2*pi*(1-pi) <= 1/2).

    Scale shape: row-local CASE votes, ONE map-side-combinable
    aggregate, 1-row close.

    Reference basis: cross-criterion consensus on channel quality
    (Documentation-Self-Triggering.html:194-239); coefficient from
    Gwet 2008 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gwet_docs")
    return spark.sql(_GWET_SQL.format(src="gwet_docs")
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_matthews_mcc — balanced binary-classifier quality from the margins
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Classifier = the long-document
#: rule (n_chars >= 300), truth = is-English; the four confusion cells
#: are one integer reduce and MCC is a single IEEE close (every product
#: stays under 2^53, exact in doubles at design scale).
_MCC_SQL = """
WITH c AS (
    SELECT CAST(SUM(CASE WHEN n_chars >= 300 AND lang = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN n_chars >= 300 AND lang <> 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN n_chars < 300 AND lang = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN n_chars < 300 AND lang <> 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM {src}
)
SELECT tp, fp, fn, tn,
       CAST(FLOOR((tp * 1e0 * tn - fp * 1e0 * fn)
                  / SQRT((tp + fp * 1e0) * (tp + fn) * (tn + fp)
                         * (tn + fn))
                  * 1e6 + 5e-1) AS BIGINT) AS mcc_micro,
       CAST(FLOOR((tp * 1e0 * tn - fp * 1e0 * fn)
                  / ((tp + fn * 1e0) * (tn + fp)) * 1e6 + 5e-1)
            AS BIGINT) AS youden_j_micro
FROM c
WHERE tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
"""


@register("ext_matthews_mcc",
          oracle=_MCC_SQL.format(src="documents"),
          tags=("ext", "curation", "eval"))
def ext_matthews_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) of the
    long-document rule against the is-English truth — the single-number
    confusion-matrix summary that stays honest under class imbalance,
    where accuracy and F1 both inflate (F1 ignores TN entirely; MCC is
    the Pearson phi of the 2x2 table and needs all four cells to be
    good). Completes the classifier scorecard beside threshold-free AUC
    (`ext_quality_auc` / `ext_auc_delong_variance`), the gains table,
    and the calibration tests — MCC grades the DEPLOYED cutoff.
    Second column: Youden's J informedness (sensitivity + specificity
    - 1), which reduces to (TP*TN - FP*FN)/((TP+FN)(TN+FP)) — the
    screening-test complement on the same four cells.

    Determinism: four integer confusion cells from ONE corpus reduce;
    MCC's numerator and the four margin factors are exact in doubles
    at design scale (every product < 2^53); both closes are
    fixed-order IEEE expressions, micro-quantized, with the degenerate
    margins excluded on integers.

    Scale shape: ONE map-side-combinable aggregate, 1-row close — the
    best possible shape at 100 TB.

    Reference basis: binary accept/reject channel classification
    scored against ground truth (Documentation-Self-Triggering.html:
    194-239); coefficient from Matthews 1975 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mcc_docs")
    return spark.sql(_MCC_SQL.format(src="mcc_docs"))


# --------------------------------------------------------------------------
# ext_cliffs_delta — ordinal effect size without pair enumeration
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). delta = 2*U1/(n1*n2) - 1 via
#: the midrank identity U1 = R1 - n1(n1+1)/2 (ties counted half), with
#: the doubled rank sums accumulated exactly as in `ext_mann_whitney_u`
#: / `ext_kruskal_wallis` (DECIMAL(38,0) doubled midranks over the
#: distinct-value dimension — associative and exact at any scale).
_CLIFFS_SQL = """
WITH v AS (
    SELECT n_chars,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
           CAST(COUNT(*) AS BIGINT) AS c_gl
    FROM {src} GROUP BY n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END
),
t AS (
    SELECT n_chars, CAST(SUM(c_gl) AS BIGINT) AS c FROM v GROUP BY n_chars
),
r AS (
    SELECT n_chars, c,
           CAST(COALESCE(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
    FROM t
),
g AS (
    SELECT v.grp, CAST(SUM(v.c_gl) AS BIGINT) AS n_g,
           SUM(CAST(v.c_gl AS DECIMAL(38,0))
               * (2 * r.cum + r.c + 1)) AS r2_g
    FROM v JOIN r ON v.n_chars = r.n_chars
    GROUP BY v.grp
),
m AS (
    SELECT MAX(CASE WHEN grp = 1 THEN n_g END) AS n1,
           MAX(CASE WHEN grp = 0 THEN n_g END) AS n2,
           MAX(CASE WHEN grp = 1 THEN r2_g END) AS r2_1
    FROM g
)
SELECT n1, n2,
       CAST((CAST(r2_1 AS DOUBLE) / 2e0 - n1 * (n1 + 1e0) / 2e0)
            AS DOUBLE) AS u1,
       CAST(FLOOR((2e0 * (CAST(r2_1 AS DOUBLE) / 2e0
                          - n1 * (n1 + 1e0) / 2e0) / (n1 * 1e0 * n2)
                   - 1e0) * 1e6 + 5e-1) AS BIGINT) AS delta_micro,
       CASE WHEN ABS(2e0 * (CAST(r2_1 AS DOUBLE) / 2e0
                            - n1 * (n1 + 1e0) / 2e0) / (n1 * 1e0 * n2)
                    - 1e0) < 147e-3 THEN 'negligible'
            WHEN ABS(2e0 * (CAST(r2_1 AS DOUBLE) / 2e0
                            - n1 * (n1 + 1e0) / 2e0) / (n1 * 1e0 * n2)
                     - 1e0) < 33e-2 THEN 'small'
            WHEN ABS(2e0 * (CAST(r2_1 AS DOUBLE) / 2e0
                            - n1 * (n1 + 1e0) / 2e0) / (n1 * 1e0 * n2)
                     - 1e0) < 474e-3 THEN 'medium'
            ELSE 'large' END AS magnitude
FROM m
WHERE n1 IS NOT NULL AND n2 IS NOT NULL
"""


@register("ext_cliffs_delta",
          oracle=_CLIFFS_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta (Cliff 1993) for English vs non-English document
    length: the probability a random English document is longer than a
    random non-English one, minus the reverse — the EFFECT SIZE the
    Mann-Whitney test (`ext_mann_whitney_u`) leaves unreported (a
    p-value says "different", delta says "by how much, on the ordinal
    scale"), with Romano et al. 2006's negligible/small/medium/large
    bands. Computed without the O(n1*n2) pair enumeration via the
    midrank identity delta = 2*U1/(n1*n2) - 1, ties counted half —
    exactly the dominance-count semantics of the quadratic definition.

    Determinism: doubled midranks (2*cum + c + 1, exact integers) over
    the distinct-length dimension accumulate as DECIMAL(38,0) exactly
    as the Mann-Whitney/Kruskal-Wallis siblings; U1, delta and the
    band edges are fixed-order IEEE expressions (band cuts compared on
    the same double both engines compute), micro-quantized.

    Scale shape: ONE groupBy(n_chars, group) reduce, windows over the
    bounded distinct-value dimension, 1-row close. Bounded-domain
    assumption, stated as the bound: the cumulative windows run as ONE
    task sized by the value DOMAIN (n_chars here; ~6e7 cells for
    cent-quantized money), not by rows. Past that ceiling swap the
    cumulative step for the range-bucketed two-level prefix sum
    `ext_token_weighted_resample` runs (per-bucket partial windows +
    broadcast bucket offsets).

    Reference basis: ordinal dominance of one configuration's response
    over another (Documentation-Self-Triggering.html:194-239);
    estimator from Cliff 1993, bands from Romano et al. 2006
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cliffs_docs")
    return spark.sql(_CLIFFS_SQL.format(src="cliffs_docs"))


# --------------------------------------------------------------------------
# ext_fdr_by — Benjamini-Yekutieli step-up under arbitrary dependence
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Identical per-source z / p
#: machinery to `ext_fdr_bh`; the BY critical value divides BH's by the
#: harmonic number H_m, computed from the SAME ranked rows (micro-
#: quantized per term, then integer-summed — no float sum over an
#: unordered set, no engine-specific series generator).
_FDR_BY_SQL = """
WITH g AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS a
    FROM {src} GROUP BY source
),
w AS (
    SELECT source, n, a,
           CAST(SUM(n) OVER () AS BIGINT) AS tn,
           CAST(SUM(a) OVER () AS BIGINT) AS ta
    FROM g
),
zq AS (
    SELECT source, n,
           CAST(FLOOR((CAST(a AS DOUBLE) / n
                       - CAST(ta - a AS DOUBLE) / (tn - n))
                      / sqrt(CAST(ta AS DOUBLE) / tn
                             * (1e0 - CAST(ta AS DOUBLE) / tn)
                             * (1e0 / n + 1e0 / (tn - n)))
                      * 1e3 + 5e-1) AS BIGINT) AS z_milli
    FROM w WHERE n > 0 AND tn - n > 0 AND ta > 0 AND tn - ta > 0
),
pv AS (
    SELECT source, n, z_milli,
           CAST(FLOOR(LEAST(1e0, 2e0 * EXP(-(z_milli / 1e3)
                            * (z_milli / 1e3) / 2e0)) * 1e6 + 5e-1)
                AS BIGINT) AS p_micro
    FROM zq
),
r AS (
    SELECT source, n, z_milli, p_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY p_micro, source) AS BIGINT)
               AS prank,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM pv
),
h AS (
    SELECT CAST(SUM(CAST(FLOOR(1e6 / prank + 5e-1) AS BIGINT))
                AS BIGINT) AS h_micro
    FROM r
),
k AS (
    SELECT r.source, r.n, r.z_milli, r.p_micro, r.prank, r.m,
           CAST(FLOOR(r.prank * 5e4 / (r.m * (h.h_micro / 1e6)))
                AS BIGINT) AS crit_micro
    FROM r JOIN h ON TRUE
)
SELECT source, n, z_milli, p_micro, prank, crit_micro,
       CASE WHEN prank <= MAX(CASE WHEN p_micro <= crit_micro
                              THEN prank ELSE 0 END) OVER ()
            THEN 1 ELSE 0 END AS rejected
FROM k
"""


@register("ext_fdr_by",
          oracle=_FDR_BY_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_fdr_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli step-up (Benjamini & Yekutieli 2001) over
    the same per-source mean-shift tests as `ext_fdr_bh`: BH's FDR
    guarantee assumes independent (or PRDS) test statistics, but
    per-source tests over one shared corpus are correlated by
    construction (every test uses the complement as its control) —
    BY divides each BH critical value by the harmonic number H_m,
    buying validity under ARBITRARY dependence at the price of power.
    Running both and diffing the rejection sets is the honest
    multiple-testing report for dependent source audits; Holm
    (`ext_holm_stepdown`) remains the FWER-strict third column.

    Determinism: identical integer/quantized machinery to the BH
    sibling; H_m is built from the SAME ranked rows (1/rank
    micro-quantized per term, then integer-summed — never a float sum
    over an unordered set, never an engine-specific series generator);
    the BY critical close is one fixed-order IEEE expression.

    Scale shape: ONE groupBy(source) reduce; windows over the bounded
    source dimension; the step-up is the same windowed MAX trick as
    BH. Nothing scales past the first reduce.

    Reference basis: multiplicity-corrected flagging of deviant
    channels under shared-baseline dependence
    (Documentation-Self-Triggering.html:194-239); procedure from
    Benjamini & Yekutieli 2001 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fdr_by_docs")
    return spark.sql(_FDR_BY_SQL.format(src="fdr_by_docs"))


# --------------------------------------------------------------------------
# ext_levene_mean — homogeneity of variance, mean-centered
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per-language absolute
#: deviations from the group MEAN: |x*n_g - S_g| is an exact integer,
#: milli-quantized per row after one division by n_g; the three
#: z-moments per group are then exact int64 sums and Levene's W is a
#: fixed-order close over the bounded language dimension.
_LEVENE_SQL = """
WITH s AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(n_chars) AS BIGINT) AS s_g
    FROM {src} GROUP BY lang
),
z AS (
    SELECT d.lang,
           CAST(FLOOR(ABS(d.n_chars * s.n_g - s.s_g) * 1e3 / s.n_g
                      + 5e-1) AS BIGINT) AS z_milli
    FROM {src} d JOIN s ON d.lang = s.lang
),
gz AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(z_milli) AS BIGINT) AS sz,
           CAST(SUM(z_milli * z_milli) AS BIGINT) AS szz
    FROM z GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(sz) AS BIGINT) AS tz
    FROM gz
),
terms AS (
    SELECT t.n, t.k,
           CAST(SUM(CAST(FLOOR(g.n_g
                * (CAST(g.sz AS DOUBLE) / g.n_g - CAST(t.tz AS DOUBLE) / t.n)
                * (CAST(g.sz AS DOUBLE) / g.n_g - CAST(t.tz AS DOUBLE) / t.n)
                * 1e0 + 5e-1) AS BIGINT)) AS BIGINT) AS between_q,
           CAST(SUM(g.szz - CAST(FLOOR(CAST(g.sz AS DOUBLE) * g.sz / g.n_g
                                       + 5e-1) AS BIGINT)) AS BIGINT)
               AS within_q
    FROM gz g JOIN tot t ON TRUE
    GROUP BY t.n, t.k
)
SELECT k AS n_groups, n AS n_rows,
       CAST(FLOOR((n - k * 1e0) / (k - 1e0)
                  * between_q / within_q * 1e6 + 5e-1) AS BIGINT)
           AS levene_w_micro
FROM terms
WHERE k > 1 AND n > k AND within_q > 0
"""


@register("ext_levene_mean",
          oracle=_LEVENE_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's variance-homogeneity test, mean-centered (Levene 1960):
    one-way ANOVA on the absolute deviations |x - xbar_g| across
    languages. The classical complement of `ext_brown_forsythe` (the
    median-centered robust variant, Brown & Forsythe 1974): mean
    centering is MORE powerful when the groups are near-symmetric,
    median centering more robust under heavy tails — the pair is how
    the equal-variance precondition of `agg_anova_oneway` /
    `agg_welch_ttest` is actually audited, and which variant fires
    differently is itself a tail-shape diagnostic.

    Determinism: |x*n_g - S_g| is exact integer algebra (one
    milli-quantized division by n_g per row); all z-moments are exact
    int64 sums; the between-group terms are unit-quantized THEN
    integer-summed across the bounded language dimension, and the W
    close is one fixed-order IEEE expression over integers,
    micro-quantized. Degenerate within-variance guards on integers.

    Scale shape: TWO map-side-combinable reduces (group moments, then
    z-moments — the price of mean centering; the median sibling pays a
    percentile pass instead) with a broadcast join of the 5-row group
    table between them; 1-row close.

    Reference basis: is the noise_width spread comparable across
    configuration groups (DAQ_self-triggering.md:84-93); test from
    Levene 1960 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("levene_docs")
    return spark.sql(_LEVENE_SQL.format(src="levene_docs"))


# --------------------------------------------------------------------------
# ext_dunn_posthoc — which language pairs differ, after Kruskal-Wallis
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Same doubled-midrank algebra
#: as `ext_kruskal_wallis`; per-pair z = (rbar_i - rbar_j) /
#: sqrt((N(N+1)/12 - T/(12(N-1))) * (1/n_i + 1/n_j)) with the exact
#: DECIMAL tie term T = sum(t^3 - t).
_DUNN_SQL = """
WITH v AS (
    SELECT n_chars, lang, CAST(COUNT(*) AS BIGINT) AS c_gl
    FROM {src} GROUP BY n_chars, lang
),
t AS (
    SELECT n_chars, CAST(SUM(c_gl) AS BIGINT) AS c FROM v GROUP BY n_chars
),
r AS (
    SELECT n_chars, c,
           CAST(COALESCE(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
    FROM t
),
g AS (
    SELECT v.lang, CAST(SUM(v.c_gl) AS BIGINT) AS n_g,
           SUM(CAST(v.c_gl AS DECIMAL(38,0))
               * (2 * r.cum + r.c + 1)) AS r2_g
    FROM v JOIN r ON v.n_chars = r.n_chars
    GROUP BY v.lang
),
n AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM g
),
ties AS (
    SELECT SUM(CAST(c AS DECIMAL(38,0)) * c * c
               - CAST(c AS DECIMAL(38,0))) AS tsum
    FROM t
)
SELECT a.lang AS lang_a, b.lang AS lang_b, a.n_g AS n_a, b.n_g AS n_b,
       CAST(FLOOR((CAST(a.r2_g AS DOUBLE) / (2e0 * a.n_g)
                   - CAST(b.r2_g AS DOUBLE) / (2e0 * b.n_g))
                  / SQRT((n.n * (n.n + 1e0) / 12e0
                          - CAST((SELECT tsum FROM ties) AS DOUBLE)
                            / (12e0 * (n.n - 1e0)))
                         * (1e0 / a.n_g + 1e0 / b.n_g))
                  * 1e3 + 5e-1) AS BIGINT) AS z_milli
FROM g a JOIN g b ON a.lang < b.lang JOIN n ON TRUE
WHERE n.n > 1
"""


@register("ext_dunn_posthoc",
          oracle=_DUNN_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise rank comparison (Dunn 1964) — the step
    AFTER `ext_kruskal_wallis` rejects: which language PAIRS actually
    differ in document length? Each pair's z uses the pooled midranks
    of the full k-group ranking (not a fresh two-group rank — that is
    the Dunn/pairwise-Mann-Whitney distinction) with the exact tie
    correction, which is why it reuses the KW rank table verbatim.
    Feed the 10 z's to `ext_holm_stepdown` / `ext_fdr_bh` for the
    multiplicity verdict; `ext_tukey_hsd` is the parametric twin.

    Determinism: identical doubled-midrank DECIMAL(38,0) algebra to
    the KW sibling; each pair's z is one fixed-order IEEE expression
    over exact group moments, milli-quantized; pairs ordered by the
    absolute (lang_a < lang_b) key.

    Scale shape: ONE groupBy(n_chars, lang) reduce; windows over the
    bounded distinct-value dimension; the k(k-1)/2 pair grid is a
    self-join of the 5-row group table (allowlisted). Nothing scales
    past the first reduce.

    Reference basis: which configuration pairs differ once the k-way
    test fires (Documentation-Self-Triggering.html:194-239); procedure
    from Dunn 1964 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("dunn_docs")
    return spark.sql(_DUNN_SQL.format(src="dunn_docs"))


# --------------------------------------------------------------------------
# ext_icc_oneway — intraclass correlation of the three raters
# --------------------------------------------------------------------------

#: shared body ({src} = non-empty documents view). ICC(1,1) over the
#: same three binary raters: for v ones of 3 votes the within-unit sum
#: of squares is exactly v(3-v)/3, so the whole ANOVA reduces to three
#: int64 sums (n, V = sum v, Q = sum v^2, D = sum v(3-v)) and the ICC
#: close is one fixed-order IEEE chain over integers.
_ICC_SQL = """
WITH v AS (
    SELECT (CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END
          + CASE WHEN n_digit * 1000 < n_chars * 120 THEN 1 ELSE 0 END
          + CASE WHEN n_space * 1000 >= n_chars * 100 THEN 1 ELSE 0 END)
          AS k
    FROM (SELECT n_chars,
                 CAST(length(text) - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                 CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS n_space
          FROM {src} WHERE n_chars > 0)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS vv,
           CAST(SUM(k * k) AS BIGINT) AS q,
           CAST(SUM(k * (3 - k)) AS BIGINT) AS d
    FROM v
)
SELECT n AS n_units,
       CAST(FLOOR((n * q - vv * vv) * 1e0 / (3e0 * n * (n - 1e0)) * 1e6
                  + 5e-1) AS BIGINT) AS msb_micro,
       CAST(FLOOR(d * 1e0 / (6e0 * n) * 1e6 + 5e-1) AS BIGINT)
           AS msw_micro,
       CAST(FLOOR(((n * q - vv * vv) * 1e0 / (3e0 * n * (n - 1e0))
                   - d * 1e0 / (6e0 * n))
                  / ((n * q - vv * vv) * 1e0 / (3e0 * n * (n - 1e0))
                     + 2e0 * (d * 1e0 / (6e0 * n)))
                  * 1e6 + 5e-1) AS BIGINT) AS icc_micro
FROM m
WHERE n > 1 AND n * q - vv * vv + d > 0
"""


@register("ext_icc_oneway",
          oracle=_ICC_SQL.format(src="documents"),
          tags=("ext", "curation", "eval"))
def ext_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1) (Shrout &
    Fleiss 1979) of the three deterministic binary raters: what share
    of judgment variance lives BETWEEN documents rather than between
    raters of the same document? The variance-decomposition member of
    the agreement family — kappa/alpha/AC1 report chance-corrected
    categorical agreement, ICC reports reliability on the variance
    scale, which is the number that propagates into power calculations
    (`ext_power_analysis`) when votes are averaged into a score.
    ICC = (MSB - MSW)/(MSB + (k-1) MSW) with k = 3.

    Determinism: for v positive votes of 3 the within-unit sum of
    squares is exactly v(3-v)/3, so the full one-way ANOVA reduces to
    three exact int64 sums; MSB, MSW and the ICC close are fixed-order
    IEEE expressions over those integers, micro-quantized; degenerate
    zero-variance corpora are excluded by an integer guard.

    Scale shape: row-local CASE votes, ONE map-side-combinable
    aggregate, 1-row close — the best possible shape at 100 TB.

    Reference basis: per-channel repeatability of repeated quality
    judgments (Documentation-Self-Triggering.html:194-239); coefficient
    from Shrout & Fleiss 1979 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("icc_docs")
    return spark.sql(_ICC_SQL.format(src="icc_docs")
                     .replace(", '', 'g')", ", '')"))


# --------------------------------------------------------------------------
# ext_mood_median — median test of en vs non-en length
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Pooled LOWER median located on
#: integer cumulative counts (2*cum >= N+1); the 2x2 above/at-or-below
#: table and its chi-square are exact integer algebra with one IEEE
#: close.
_MOOD_SQL = """
WITH t AS (
    SELECT n_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY n_chars
),
r AS (
    SELECT n_chars, c1, c,
           CAST(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(SUM(c) OVER () AS BIGINT) AS n
    FROM t
),
med AS (
    SELECT MIN(n_chars) AS m FROM r WHERE 2 * cum >= n + 1
),
cells AS (
    SELECT CAST(SUM(CASE WHEN r.n_chars > med.m THEN r.c1 ELSE 0 END)
                AS BIGINT) AS a,
           CAST(SUM(CASE WHEN r.n_chars > med.m THEN r.c - r.c1
                    ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN r.n_chars <= med.m THEN r.c1 ELSE 0 END)
                AS BIGINT) AS cc,
           CAST(SUM(CASE WHEN r.n_chars <= med.m THEN r.c - r.c1
                    ELSE 0 END) AS BIGINT) AS dd,
           MIN(med.m) AS median_val
    FROM r JOIN med ON TRUE
)
SELECT median_val AS pooled_median, a AS en_above, cc AS en_at_or_below,
       b AS other_above, dd AS other_at_or_below,
       CAST(FLOOR((a + b + cc + dd)
                  * (a * 1e0 * dd - b * 1e0 * cc)
                  * (a * 1e0 * dd - b * 1e0 * cc)
                  / ((a + b * 1e0) * (cc + dd) * (a + cc) * (b + dd))
                  * 1e6 + 5e-1) AS BIGINT) AS chi2_micro
FROM cells
WHERE (a + b) > 0 AND (cc + dd) > 0 AND (a + cc) > 0 AND (b + dd) > 0
"""


@register("ext_mood_median",
          oracle=_MOOD_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test (Mood 1950) for English vs non-English
    document length: split both groups at the POOLED lower median and
    chi-square the resulting 2x2 — the bluntest but most
    assumption-free member of the two-sample location family
    (`ext_mann_whitney_u` needs comparable shapes to read as a location
    test; the median test only needs counts), and the one that survives
    arbitrarily heavy censoring or truncation of the tails. Low power
    by design — when it fires, the location shift is gross.

    Determinism: the pooled lower median is located on integer
    cumulative counts (2*cum >= N+1, an integer inequality); the 2x2
    cells are exact integer sums; the chi-square close is one
    fixed-order IEEE expression with integer margin guards.

    Scale shape: ONE groupBy(value) reduce; windows over the bounded
    distinct-value dimension; a 1-row broadcast of the median; 1-row
    close. Bounded-domain assumption, stated as the bound: the
    cumulative window that locates the grand median is ONE task sized
    by the value DOMAIN (~6e7 cells for cent-quantized money), not by
    rows; past that ceiling swap in `ext_token_weighted_resample`'s
    range-bucketed two-level prefix sum at the cumulative step.

    Reference basis: gross response-shift screening between
    configuration groups (DAQ_self-triggering.md:84-93); test from
    Mood 1950 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mood_docs")
    return spark.sql(_MOOD_SQL.format(src="mood_docs"))


# --------------------------------------------------------------------------
# ext_cvm_two_sample — Cramer-von Mises distance between group ECDFs
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). ECDF-integral form over the
#: pooled empirical measure (the tie-correct generalization): T =
#: (n*m/N^2) * sum_v (c_v/N) * (F1(v) - F2(v))^2, with F1 - F2 =
#: (cum1*m - cum2*n)/(n*m) exact integers throughout; one IEEE close.
_CVM_SQL = """
WITH t AS (
    SELECT n_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
    FROM {src} GROUP BY n_chars
),
r AS (
    SELECT n_chars, c1 + c2 AS c,
           CAST(SUM(c1) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum1,
           CAST(SUM(c2) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum2,
           CAST(SUM(c1) OVER () AS BIGINT) AS n,
           CAST(SUM(c2) OVER () AS BIGINT) AS m
    FROM t
),
s AS (
    SELECT MAX(n) AS n, MAX(m) AS m,
           SUM(CAST(c AS DECIMAL(38,0))
               * (cum1 * m - cum2 * n) * (cum1 * m - cum2 * n)) AS wsum
    FROM r
)
SELECT n AS n_en, m AS n_other,
       CAST(FLOOR(CAST(wsum AS DOUBLE)
                  / ((n + m * 1e0) * (n + m) * (n + m))
                  / (n * 1e0 * m) * 1e9 + 5e-1) AS BIGINT)
           AS cvm_t_nano
FROM s
WHERE n > 0 AND m > 0
"""


@register("ext_cvm_two_sample",
          oracle=_CVM_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises distance (Cramer 1928; Anderson
    1962) between the English and non-English length distributions, in
    the tie-correct ECDF-integral form T = (nm/N^2) * sum_v w_v *
    (F1(v) - F2(v))^2 with weights w_v = c_v/N from the pooled
    empirical measure. The whole-distribution complement of
    `ext_drift_ks`: KS reads only the single worst ECDF gap (dominated
    by the distribution middle), CvM integrates EVERY gap, so it
    detects the spread/tail disagreements KS misses — the standard
    second opinion before declaring two corpus slices interchangeable.

    Determinism: group cumulative counts over the distinct-value
    dimension are exact integers; each term's (cum1*m - cum2*n)^2 is
    exact integer algebra accumulated as DECIMAL(38,0) (the design-
    scale widening the blocking-quality audit uses); the close is one
    IEEE division chain, nano-quantized (T is O(1e-2)-sized).

    Scale shape: ONE groupBy(value) reduce; windows over the bounded
    distinct-value dimension; 1-row close. Bounded-domain assumption,
    stated as the bound: the cumulative-CDF window is ONE task sized by
    the value DOMAIN (~6e7 cells for cent-quantized money), not by
    rows; past that ceiling swap in `ext_token_weighted_resample`'s
    range-bucketed two-level prefix sum (per-bucket partial windows +
    broadcast bucket offsets) at the cumulative step.

    Reference basis: full-distribution comparison of per-channel
    response spectra between runs (DAQ_self-triggering.md:91-93's
    distribution histograms); statistic from Anderson 1962 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cvm_docs")
    return spark.sql(_CVM_SQL.format(src="cvm_docs"))


# --------------------------------------------------------------------------
# ext_wilcoxon_signed_rank — paired location test across sources
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Pairs = per-source mean length
#: of the alternating within-source doc_id positions (row_number % 2 —
#: a deterministic split-half pairing robust to how doc_ids interleave
#: across sources); differences are milli-quantized integers, zeros
#: dropped, |d| ranked with an absolute (|d|, source) tie-break, and
#: W+/W-/z derive from exact integer rank sums.
_WILCOXON_SQL = """
WITH seq AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM {src}
),
halves AS (
    SELECT source,
           CAST(FLOOR(SUM(CASE WHEN rn % 2 = 0 THEN n_chars
                          ELSE 0 END) * 1e3
                      / NULLIF(SUM(CASE WHEN rn % 2 = 0 THEN 1
                                   ELSE 0 END), 0) + 5e-1) AS BIGINT)
               AS even_milli,
           CAST(FLOOR(SUM(CASE WHEN rn % 2 = 1 THEN n_chars
                          ELSE 0 END) * 1e3
                      / NULLIF(SUM(CASE WHEN rn % 2 = 1 THEN 1
                                   ELSE 0 END), 0) + 5e-1) AS BIGINT)
               AS odd_milli
    FROM seq GROUP BY source
),
d AS (
    SELECT source, even_milli - odd_milli AS diff
    FROM halves
    WHERE even_milli IS NOT NULL AND odd_milli IS NOT NULL
      AND even_milli <> odd_milli
),
rk AS (
    SELECT source, diff,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(diff), source) AS BIGINT)
               AS r
    FROM d
),
w AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN diff > 0 THEN r ELSE 0 END) AS BIGINT)
               AS w_plus,
           CAST(SUM(CASE WHEN diff < 0 THEN r ELSE 0 END) AS BIGINT)
               AS w_minus
    FROM rk
)
SELECT n AS n_pairs, w_plus, w_minus,
       CAST(FLOOR((w_plus - n * (n + 1e0) / 4e0)
                  / SQRT(n * (n + 1e0) * (2e0 * n + 1e0) / 24e0)
                  * 1e6 + 5e-1) AS BIGINT) AS z_micro
FROM w
WHERE n > 1
"""


@register("ext_wilcoxon_signed_rank",
          oracle=_WILCOXON_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on a deterministic
    split-half pairing: per source, mean document length of the
    alternating doc_id positions (every other document in id order) —
    under the within-source-exchangeable null
    the two halves are interchangeable, so a systematic signed-rank
    shift exposes id-correlated length structure (ingestion ordering
    artifacts, the thing `ext_epoch_shuffle_audit` hunts at the shard
    level). The PAIRED member of the rank-test family: Mann-Whitney
    compares independent groups, the sign test ignores magnitudes,
    signed-rank uses both sign and rank of each within-pair
    difference. With real before/after columns (a re-crawl, a filter
    change) the query is unchanged.

    Determinism: half-means are milli-quantized integers, so the
    differences, the zero-drop, the (|d|, source)-keyed ranking (the
    documented absolute tie-break; a measure-zero event on quantized
    means) and both rank sums are exact integer algebra; the normal
    approximation z is one fixed-order IEEE close, micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(source) reduce;
    ranking windows over the bounded source dimension; 1-row close.

    Reference basis: paired first-half/second-half stability of
    per-channel rates within a run (DAQ_self-triggering.md:84-97's
    reuse-thresholds regime presumes within-run stationarity); test
    from Wilcoxon 1945 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("wilcoxon_docs")
    return spark.sql(_WILCOXON_SQL.format(src="wilcoxon_docs"))


# --------------------------------------------------------------------------
# ext_forecast_naive_benchmarks — MASE and Theil's U2 floor metrics
# --------------------------------------------------------------------------

_FCAST_DAY_DUCK = "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)"
#: o_orderdate ships as TIMESTAMP_NTZ in some fixture generations —
#: cast through TIMESTAMP (identity wall-clock in the UTC-pinned
#: session) before unix_micros, matching io.table's events handling.
_FCAST_DAY_SPARK = ("cast(unix_micros(cast(o_orderdate as timestamp)) "
                    "div 86400000000 as bigint)")

#: shared body ({day} = engine epoch-day over orders). Daily counts are
#: exact integers; the naive(1) and seasonal-naive(7) error moments are
#: integer equi-join sums restricted to days where BOTH lags exist, so
#: MASE and U2 are single IEEE closes over four integers.
_FCAST_NAIVE_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
j AS (
    SELECT a.d, a.c,
           b.c AS c_lag1, s.c AS c_lag7
    FROM day a JOIN day b ON b.d = a.d - 1
               JOIN day s ON s.d = a.d - 7
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ABS(c - c_lag1)) AS BIGINT) AS sae1,
           CAST(SUM(ABS(c - c_lag7)) AS BIGINT) AS sae7,
           CAST(SUM((c - c_lag1) * (c - c_lag1)) AS BIGINT) AS sse1,
           CAST(SUM((c - c_lag7) * (c - c_lag7)) AS BIGINT) AS sse7
    FROM j
)
SELECT n AS n_days,
       CAST(FLOOR(sae1 * 1e3 / n + 5e-1) AS BIGINT) AS mae_naive1_milli,
       CAST(FLOOR(sae7 * 1e3 / n + 5e-1) AS BIGINT) AS mae_snaive7_milli,
       CAST(FLOOR(sae7 * 1e6 / sae1 + 5e-1) AS BIGINT) AS mase_micro,
       CAST(FLOOR(SQRT(sse7 * 1e0 / sse1) * 1e6 + 5e-1) AS BIGINT)
           AS theil_u2_micro
FROM m
WHERE n > 0 AND sae1 > 0 AND sse1 > 0
"""


@register("ext_forecast_naive_benchmarks",
          oracle=_FCAST_NAIVE_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_forecast_naive_benchmarks(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The two scale-free forecast-accuracy floors every backtest
    should be read against (Hyndman & Koehler 2006; Theil 1966), on
    the daily order-count series: MASE = MAE(seasonal-naive-7) /
    MAE(naive-1) and Theil's U2 = sqrt(SSE(snaive-7)/SSE(naive-1)).
    `agg_forecast_backtest` scores a MODEL; these score the NAIVE
    strategies against each other, which is the denominator that makes
    any model's MAE interpretable (MASE < 1 = beats the no-skill
    forecast) and the first thing to compute before fitting anything —
    a weekly-seasonal series shows MASE well under 1 here, a
    structureless one sits near 1.

    Determinism: daily counts are exact integers and both lag pairings
    are integer equi-joins restricted to days where BOTH lags exist
    (identical restriction in both engines), so all four error moments
    are exact int64; the ratio closes are single IEEE expressions,
    quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the lag
    joins touch only the bounded day table (allowlisted); 1-row close.

    Reference basis: is tomorrow's rate just today's rate — the
    persistence baseline under the reuse-thresholds regime
    (DAQ_self-triggering.md:84-87); metrics from Theil 1966 and
    Hyndman & Koehler 2006 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("fcast_orders")
    return spark.sql(_FCAST_NAIVE_SQL.format(src="fcast_orders",
                                             day=_FCAST_DAY_SPARK))


# --------------------------------------------------------------------------
# ext_jonckheere_terpstra — ordered-alternative k-group rank test
# --------------------------------------------------------------------------

#: shared body ({src} = orders view). Ordered groups = the five order
#: priorities (1-URGENT < ... < 5-LOW), value = exact integer cents.
#: Pairwise Mann-Whitney counts come from a full (group x distinct
#: value) cumulative grid — never a row-level pair join: doubled
#: JT2 = sum_{{i<j}} sum_v [2*c_i(v)*(n_j - cum_j(v)) + c_i(v)*c_j(v)]
#: is exact integer algebra; the z close uses the exact no-tie moments.
_JT_SQL = """
WITH base AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
           CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
    FROM {src}
),
cell AS (
    SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY g, cents
),
vals AS (SELECT DISTINCT cents FROM cell),
grps AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM cell GROUP BY g),
grid AS (
    SELECT grps.g, grps.n_g, vals.cents, COALESCE(cell.c, 0) AS c
    FROM vals JOIN grps ON TRUE
    LEFT JOIN cell ON cell.g = grps.g AND cell.cents = vals.cents
),
cumg AS (
    SELECT g, n_g, cents, c,
           CAST(SUM(c) OVER (PARTITION BY g ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM grid
),
jt AS (
    SELECT CAST(SUM(a.c * (2 * (b.n_g - b.cum) + b.c))
                AS DECIMAL(38,0)) AS jt2
    FROM cumg a JOIN cumg b
      ON a.cents = b.cents AND a.g < b.g
    WHERE a.c > 0
),
mom AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n,
           CAST(SUM(n_g * n_g) AS BIGINT) AS sn2,
           CAST(SUM(n_g * n_g * (2 * n_g + 3)) AS DECIMAL(38,0)) AS sn23
    FROM grps
)
SELECT mom.n AS n_rows,
       CAST(FLOOR(CAST(jt.jt2 AS DOUBLE) / 2e0 + 5e-1) AS BIGINT)
           AS jt_stat,
       CAST(CAST((mom.n * CAST(mom.n AS DECIMAL(38,0)) - mom.sn2)
                 AS BIGINT) AS DOUBLE) / 4e0 AS jt_mean,
       CAST(FLOOR((CAST(jt.jt2 AS DOUBLE) / 2e0
                   - (mom.n * 1e0 * mom.n - mom.sn2) / 4e0)
                  / SQRT((mom.n * 1e0 * mom.n * (2e0 * mom.n + 3e0)
                          - CAST(mom.sn23 AS DOUBLE)) / 72e0)
                  * 1e6 + 5e-1) AS BIGINT) AS z_micro
FROM jt JOIN mom ON TRUE
WHERE mom.n > 1
"""


@register("ext_jonckheere_terpstra",
          oracle=_JT_SQL.format(src="orders"),
          tags=("ext", "curation", "stats"))
def ext_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test (Jonckheere 1954;
    Terpstra 1952): does order value trend MONOTONICALLY across the
    five priority classes (1-URGENT < ... < 5-LOW)? Where
    Kruskal-Wallis (`ext_kruskal_wallis`) spends power on any k-group
    difference, JT sums the pairwise Mann-Whitney counts along the
    hypothesized ordering — the independent-groups member of the
    ordered trio (`ext_cochran_armitage` for proportions,
    `ext_page_trend` for blocks). Ties count half (the doubled-count
    identity keeps them exact); the z close uses the classical no-tie
    moments, the standard conservative report.

    Determinism: values are exact integer cents; pairwise greater-than
    and tie counts come from a (group x distinct-value) cumulative
    GRID — never a row-level pair join — so the doubled statistic is
    exact integer algebra in DECIMAL(38,0); the z close is one
    fixed-order IEEE expression, micro-quantized.

    Scale shape: ONE groupBy(group, value) reduce; the grid is
    |groups| x |distinct values| (bounded by the value dimension, not
    the row count); per-group windows over the grid; a 10-pair
    value-aligned join. Nothing scales past the first reduce.
    Bounded-domain assumption, stated as the bound: the per-group
    cumulative window runs as ONE task per group sized by the value
    DOMAIN (cent-quantized money ~6e7 distinct cells worst case), not
    by rows — fine up to that ceiling, single-task beyond it. The
    100 TB lowering when the domain is unbounded is the range-bucketed
    two-level prefix sum `ext_token_weighted_resample` already runs
    (bucket the value axis, per-bucket partial windows co-partitioned
    by (group, bucket), broadcast per-bucket offsets from the bounded
    bucket table); swap it in at the cumulative-window step.

    Reference basis: monotone response ordering across the power-mode
    ladder (DAQ_self-triggering.md:80-87); statistic from Terpstra
    1952 / Jonckheere 1954 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("jt_orders")
    return spark.sql(_JT_SQL.format(src="jt_orders"))


# --------------------------------------------------------------------------
# ext_bartlett_test — k-group variance homogeneity (the parametric gate)
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per-group (n, Σx, Σx²) are
#: exact int64; positive-variance groups are selected by the INTEGER
#: predicate n·q − s² > 0 in DECIMAL(38,0) (never a float HAVING);
#: each group's (n−1)·ln(s²), (n−1)·s² and 1/(n−1) terms quantize to
#: int64 micro/deci/nano BEFORE the unordered cross-group sums; the
#: T and corrected-χ² closes are single fixed-order IEEE expressions.
_BARTLETT_SQL = """
WITH g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
    FROM {src} GROUP BY lang
    HAVING COUNT(*) > 1
       AND CAST(COUNT(*) AS DECIMAL(38,0)) * SUM(n_chars * n_chars)
           - CAST(SUM(n_chars) AS DECIMAL(38,0)) * SUM(n_chars) > 0
),
v AS (
    SELECT lang, n,
           (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1e0) AS s2
    FROM g
),
t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(n - 1) AS BIGINT) AS df,
           CAST(SUM(CAST(FLOOR((n - 1e0) * LN(s2) * 1e6 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS sln_micro,
           CAST(SUM(CAST(FLOOR((n - 1e0) * s2 * 1e1 + 5e-1) AS BIGINT))
               AS BIGINT) AS ssw_deci,
           CAST(SUM(CAST(FLOOR(1e9 / (n - 1) + 5e-1) AS BIGINT))
               AS BIGINT) AS invdf_nano
    FROM v
)
SELECT k AS n_groups, n AS n_rows, df AS df_within,
       CAST(FLOOR((df * LN(ssw_deci / 1e1 / df) - sln_micro / 1e6) * 1e3
            + 5e-1) AS BIGINT) AS t_uncorrected_milli,
       CAST(FLOOR((df * LN(ssw_deci / 1e1 / df) - sln_micro / 1e6)
            / (1e0 + (invdf_nano / 1e9 - 1e0 / df) / (3e0 * (k - 1e0)))
            * 1e3 + 5e-1) AS BIGINT) AS chi2_milli,
       k - 1 AS df_chi2
FROM t
WHERE k > 1 AND df > 0 AND ssw_deci > 0
"""


@register("ext_bartlett_test", oracle=_BARTLETT_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test (Bartlett 1937) for variance homogeneity across
    the k language cohorts on document length — the PARAMETRIC member
    of the variance-test family: maximally powerful when lengths are
    near-normal, famously sensitive when they are not, which is
    exactly why `ext_brown_forsythe` (median-robust) and
    `ext_levene_mean` ship beside it; running all three is how a
    curation team tells a real dispersion difference from a
    heavy-tail artifact. Emits the uncorrected statistic T, the
    corrected chi-square T/C with Bartlett's correction factor
    C = 1 + (Σ 1/(n_i-1) - 1/(N-k)) / (3(k-1)), and its k-1 degrees
    of freedom.

    Determinism: per-group moments are exact int64; positive-variance
    groups select on an INTEGER DECIMAL(38,0) predicate (n·Σx² - (Σx)²
    > 0), never a float comparison; each group's (n-1)·ln(s²) /
    (n-1)·s² / 1/(n-1) term quantizes to int64 BEFORE the unordered
    k-row sums (micro/deci/nano; the deci SSW follows
    `agg_anova_oneway`'s headroom analysis — int64-safe past 100 TB);
    both closes are single fixed-order IEEE expressions shared
    verbatim by the engines, milli-quantized.

    Scale shape: ONE map-side-combinable groupBy(lang), then a k-row
    reduce and a 1-row close — the `agg_anova_oneway` shape exactly.

    Reference basis: stability of per-configuration response spread
    across operating groups (DAQ_self-triggering.md:84-93); statistic
    from Bartlett 1937 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bartlett_docs")
    return spark.sql(_BARTLETT_SQL.format(src="bartlett_docs"))


# --------------------------------------------------------------------------
# ext_theils_u — uncertainty coefficient (normalized, asymmetric MI)
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). All probabilities are exact
#: integer-count ratios over the bounded (lang x source) contingency
#: table; every plogp / MI cell term quantizes to int64 nano BEFORE
#: its unordered sum (the `agg_mutual_information` discipline); the
#: three U closes are single IEEE divisions of the integer sums.
_THEILS_U_SQL = """
WITH c AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nls
    FROM {src} GROUP BY lang, source
),
ml AS (SELECT lang, CAST(SUM(nls) AS BIGINT) AS nl FROM c GROUP BY lang),
ms AS (SELECT source, CAST(SUM(nls) AS BIGINT) AS ns FROM c GROUP BY source),
tot AS (SELECT CAST(SUM(nls) AS BIGINT) AS n FROM c),
mi AS (
    SELECT CAST(SUM(CAST(FLOOR(nls * 1e0 / t.n
                * LN(nls * 1e0 * t.n / (ml.nl * 1e0 * ms.ns)) * 1e9 + 5e-1)
                AS BIGINT)) AS BIGINT) AS i_nano
    FROM c JOIN ml ON c.lang = ml.lang JOIN ms ON c.source = ms.source
    CROSS JOIN tot t
),
hl AS (
    SELECT CAST(SUM(CAST(FLOOR(nl * 1e0 / t.n * LN(t.n * 1e0 / nl) * 1e9
                + 5e-1) AS BIGINT)) AS BIGINT) AS h_nano
    FROM ml CROSS JOIN tot t
),
hs AS (
    SELECT CAST(SUM(CAST(FLOOR(ns * 1e0 / t.n * LN(t.n * 1e0 / ns) * 1e9
                + 5e-1) AS BIGINT)) AS BIGINT) AS h_nano
    FROM ms CROSS JOIN tot t
)
SELECT t.n AS n_rows, mi.i_nano AS mi_nano, hl.h_nano AS h_lang_nano,
       hs.h_nano AS h_source_nano,
       CAST(FLOOR(mi.i_nano * 1e6 / hl.h_nano + 5e-1) AS BIGINT)
           AS u_lang_given_source_micro,
       CAST(FLOOR(mi.i_nano * 1e6 / hs.h_nano + 5e-1) AS BIGINT)
           AS u_source_given_lang_micro,
       CAST(FLOOR(2e0 * mi.i_nano * 1e6 / (hl.h_nano + hs.h_nano) + 5e-1)
            AS BIGINT) AS u_symmetric_micro
FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN tot t
WHERE hl.h_nano > 0 AND hs.h_nano > 0
"""


@register("ext_theils_u", oracle=_THEILS_U_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U (Theil 1970) between language
    and source — the NORMALIZED, ASYMMETRIC member of the categorical-
    association family: U(lang|source) = I(lang;source)/H(lang) says
    what fraction of language uncertainty the source label removes
    (and vice versa for U(source|lang)), on a 0..1 scale that is
    comparable across tables — which raw MI
    (`agg_mutual_information`) is not, and which the symmetric
    chi-square family (`ext_cramers_v`) cannot direction-split. The
    asymmetry is the point for corpus curation: sources usually
    predict language far better than language predicts source, and
    the gap quantifies how language-specialized the crawl's sources
    are. Also emits the symmetric U (entropy-weighted average).

    Determinism: the contingency table is exact integer counts; every
    MI / plogp cell term quantizes to int64 nano BEFORE its unordered
    sum over the bounded (lang x source) grid; the three U closes are
    single IEEE divisions of integer sums, micro-quantized; degenerate
    entropies guard on the integer nano sums.

    Scale shape: ONE map-side-combinable groupBy(lang, source) reduce;
    everything after is algebra on the bounded contingency table plus
    1-row scalar crosses (bounded, allowlisted).

    Reference basis: channel-vs-configuration dependence screening
    (DAQ_self-triggering.md:84-93); coefficient from Theil 1970
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("theilsu_docs")
    return spark.sql(_THEILS_U_SQL.format(src="theilsu_docs"))


# --------------------------------------------------------------------------
# ext_goodman_kruskal_lambda — proportional-reduction-in-error association
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Pure integer algebra end to
#: end: modal cell counts per row/column margin, grand modal margins,
#: and three PRE ratios as single micro-quantized divisions.
_GK_LAMBDA_SQL = """
WITH c AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
    FROM {src} GROUP BY lang, source
),
m AS (
    SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM c) AS n,
           (SELECT CAST(SUM(mx) AS BIGINT) FROM
               (SELECT MAX(n) AS mx FROM c GROUP BY source)) AS sum_smax,
           (SELECT CAST(SUM(mx) AS BIGINT) FROM
               (SELECT MAX(n) AS mx FROM c GROUP BY lang)) AS sum_lmax,
           (SELECT CAST(MAX(nl) AS BIGINT) FROM
               (SELECT SUM(n) AS nl FROM c GROUP BY lang)) AS max_l,
           (SELECT CAST(MAX(ns) AS BIGINT) FROM
               (SELECT SUM(n) AS ns FROM c GROUP BY source)) AS max_s
)
SELECT n AS n_rows, sum_smax, sum_lmax, max_l AS max_lang_margin,
       max_s AS max_source_margin,
       CAST(FLOOR((sum_smax - max_l) * 1e6 / (n - max_l) + 5e-1) AS BIGINT)
           AS lambda_lang_given_source_micro,
       CAST(FLOOR((sum_lmax - max_s) * 1e6 / (n - max_s) + 5e-1) AS BIGINT)
           AS lambda_source_given_lang_micro,
       CAST(FLOOR((sum_smax + sum_lmax - max_l - max_s) * 1e6
            / (2 * n - max_l - max_s) + 5e-1) AS BIGINT)
           AS lambda_symmetric_micro
FROM m
WHERE n > max_l AND n > max_s
"""


@register("ext_goodman_kruskal_lambda",
          oracle=_GK_LAMBDA_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_goodman_kruskal_lambda(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda (Goodman & Kruskal 1954) between language
    and source — the PREDICTION-framed association measure: how much
    does guessing a document's language improve when you know its
    source, measured as proportional reduction in modal-guess errors
    (lambda = 0: the source tells you nothing the grand mode didn't;
    lambda = 1: each source determines the language). Complements the
    entropy framing (`ext_theils_u`) and the chi-square framing
    (`ext_cramers_v`): lambda is what a router/classifier actually
    gains, in error-rate points, from conditioning — and is famously 0
    when conditioning reshuffles probabilities without moving any
    modes, which the entropy measures cannot see.

    Determinism: ENTIRELY integer — modal cell counts, modal margins
    and error counts are exact int64 over the bounded contingency
    table; the three lambda closes are single micro-quantized
    divisions; degenerate margins (a mode covering everything) guard
    on integer predicates.

    Scale shape: ONE map-side-combinable groupBy(lang, source) reduce;
    modal maxima over the bounded grid; a 1-row close of scalar
    subqueries (bounded, allowlisted).

    Reference basis: which configuration best predicts the responding
    channel class (DAQ_self-triggering.md:84-87's mode census);
    measure from Goodman & Kruskal 1954 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gkl_docs")
    return spark.sql(_GK_LAMBDA_SQL.format(src="gkl_docs"))


# --------------------------------------------------------------------------
# ext_somers_d — directional ordinal association (the credit-scoring Gini)
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Same bounded per-lang
#: (source-metric) pair table as `ext_kendall_tau` (exact integer
#: concordance algebra over ~20 sources/lang); the two directional
#: closes divide by pairs-untied-on-the-INDEPENDENT variable.
_SOMERS_D_SQL = """
WITH m AS (
    SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM {src} GROUP BY lang, source
),
p AS (
    SELECT a.lang,
           CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
           CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
           CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
           CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
    FROM m a JOIN m b ON a.lang = b.lang AND a.source < b.source
),
s AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(SUM(conc) AS BIGINT) AS nc, CAST(SUM(disc) AS BIGINT) AS nd,
           CAST(SUM(tx) AS BIGINT) AS t1, CAST(SUM(ty) AS BIGINT) AS t2
    FROM p GROUP BY lang
)
SELECT lang, n0 AS n_pairs, nc AS n_conc, nd AS n_disc,
       CAST(FLOOR((nc - nd) * 1e6 / (n0 - t1) + 5e-1) AS BIGINT)
           AS somers_d_y_given_x_micro,
       CAST(FLOOR((nc - nd) * 1e6 / (n0 - t2) + 5e-1) AS BIGINT)
           AS somers_d_x_given_y_micro
FROM s
WHERE n0 > t1 AND n0 > t2
"""


@register("ext_somers_d", oracle=_SOMERS_D_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D (Somers 1962) between per-(lang, source) total
    character mass (x) and document count (y) — the DIRECTIONAL
    sibling of `ext_kendall_tau`: tau-b treats ties symmetrically,
    Somers' D(Y|X) conditions on the independent variable by counting
    only pairs untied on X, which is why D is THE standard
    discrimination summary for scored rankings (credit scoring's
    "Gini" = Somers' D of score vs outcome = 2·AUC - 1). Emitting
    both directions makes the asymmetry visible — D(Y|X) != D(X|Y)
    whenever the tie structure differs.

    Determinism: both metrics are exact integer sums; concordance /
    discordance / tie indicators are integer sign algebra over the
    bounded per-lang pair table (same frame, and same documented
    int64 product-headroom trade, as `ext_kendall_tau`); each close
    is one micro-quantized division with integer degenerate guards.

    Scale shape: one groupBy(lang, source) reduce, a per-lang
    self-join over the bounded source dimension (~20 rows/lang), a
    k-row reduce. Nothing scales with corpus rows past the first
    reduce.

    Reference basis: monotone association between configuration
    metrics (DAQ_self-triggering.md:84-87); statistic from Somers
    1962 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("somersd_docs")
    return spark.sql(_SOMERS_D_SQL.format(src="somersd_docs"))


# --------------------------------------------------------------------------
# ext_durbin_watson — serial correlation of detrended daily volume
# --------------------------------------------------------------------------

#: shared body ({src} = orders view, {day} = engine epoch-day). Daily
#: counts are exact integers; OLS slope/intercept close from five
#: exact int64 moments in one fixed-order IEEE expression; residuals
#: milli-quantize PER DAY (exact inputs + shared expression text =
#: identical IEEE in both engines) so the DW sums are exact int64; the
#: numerator restricts to consecutive-day pairs (same restriction both
#: engines), the denominator covers every day.
_DW_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 2 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
e AS (
    SELECT day.d,
           CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                       - cf.b * day.d) * 1e3 + 5e-1) AS BIGINT) AS em
    FROM day CROSS JOIN cf
),
s AS (
    SELECT (SELECT CAST(SUM(em * em) AS BIGINT) FROM e) AS den,
           (SELECT CAST(SUM((a.em - b.em) * (a.em - b.em)) AS BIGINT)
            FROM e a JOIN e b ON b.d = a.d - 1) AS num,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM e a JOIN e b ON b.d = a.d - 1) AS n_pairs
)
SELECT n_days, n_pairs,
       CAST(FLOOR(num * 1e3 / den + 5e-1) AS BIGINT) AS dw_milli,
       CAST(FLOOR((1e0 - num * 1e0 / den / 2e0) * 1e3 + 5e-1) AS BIGINT)
           AS rho1_approx_milli
FROM s
WHERE den > 0 AND n_pairs > 0
"""


@register("ext_durbin_watson",
          oracle=_DW_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (Durbin & Watson 1950) on the OLS-
    detrended daily order-count series: DW = Σ(e_t - e_{t-1})² / Σe_t²
    with e the residuals of the linear-trend fit. THE regression-
    residual autocorrelation gate: DW ≈ 2 means the trend model left
    white noise (naive SEs are honest), DW << 2 means positive serial
    correlation (every confidence interval downstream of the fit is
    too narrow) — the check that belongs between `win_rolling_slope`-
    style trend fits and any inference built on them, complementing
    `win_ljung_box` (raw-series whiteness) with the RESIDUAL question.
    Also emits the rho1 ≈ 1 - DW/2 first-order autocorrelation
    reading.

    Determinism: the five OLS moments are exact int64 sums; slope /
    intercept close in one fixed-order IEEE expression; residuals
    milli-quantize per day from exact integer inputs through the
    shared expression text (identical IEEE both engines), so both DW
    sums are exact int64; the nonsingular-design guard is an INTEGER
    DECIMAL(38,0) predicate; numerator pairs restrict to consecutive
    days via an integer equi-join (the `ext_forecast_naive_benchmarks`
    restriction, identical in both engines).

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the OLS
    close, the residual table and the lag join touch only the bounded
    (calendar-sized) day table; 1-row scalar crosses (allowlisted).

    Reference basis: is the residual of the rate-drift fit white —
    the persistence check under the reuse-thresholds regime
    (DAQ_self-triggering.md:84-87); statistic from Durbin & Watson
    1950 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("dw_orders")
    return spark.sql(_DW_SQL.format(src="dw_orders", day=_FCAST_DAY_SPARK))


# --------------------------------------------------------------------------
# ext_pettitt_test — nonparametric single-changepoint detection
# --------------------------------------------------------------------------

#: shared body ({src} = orders view, {day} = engine epoch-day). Daily
#: counts are exact integers; doubled midranks come from the grouped-
#: by-value cumulative identity (2·cum + cnt + 1 — no per-row rank
#: shuffle); U_t = Σ_{{i<=t}} 2r_i - t(n+1) is exact integer algebra
#: end to end; the argmax breaks ties on the earliest day; only the
#: final p-value approximation is IEEE, micro-quantized.
_PETTITT_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
v AS (
    SELECT c AS val, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM day GROUP BY c
),
r AS (
    SELECT val,
           2 * CAST(COALESCE(SUM(cnt) OVER (ORDER BY val
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + cnt + 1 AS r2
    FROM v
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM day),
u AS (
    SELECT day.d,
           CAST(SUM(r.r2) OVER (ORDER BY day.d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT)
           - CAST(ROW_NUMBER() OVER (ORDER BY day.d) AS BIGINT)
             * (n.n + 1) AS ut,
           CAST(ROW_NUMBER() OVER (ORDER BY day.d) AS BIGINT) AS t,
           n.n
    FROM day JOIN r ON day.c = r.val CROSS JOIN n
),
k AS (
    SELECT d AS changepoint_day, ut AS u_at_k, ABS(ut) AS k_stat, t, n
    FROM u WHERE t < n
    ORDER BY ABS(ut) DESC, d
    LIMIT 1
)
SELECT changepoint_day, u_at_k, k_stat, n AS n_days,
       CAST(FLOOR(2e0 * EXP(-6e0 * k_stat * k_stat
            / (n * 1e0 * n * n + n * 1e0 * n)) * 1e6 + 5e-1) AS BIGINT)
           AS p_approx_micro
FROM k
WHERE n > 1
"""


@register("ext_pettitt_test",
          oracle=_PETTITT_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's test (Pettitt 1979) for a single changepoint in the
    daily order-count series: U_t = 2·Σ_{i<=t} r_i - t(n+1) sweeps
    every split point using global midranks, K = max|U_t| locates the
    most likely shift, and 2·exp(-6K²/(n³+n²)) approximates its
    significance. The RANK-based (distribution-free) member of the
    changepoint family: `agg_changepoint_binseg` splits on mean SSE
    (moment-based, outlier-sensitive), `win_cusum_change` and
    `win_page_hinkley` monitor sequentially — Pettitt is the
    retrospective test a pipeline runs when it needs "did the level
    shift, ignoring the heavy tail" with a p-value attached.

    Determinism: doubled midranks come from the grouped-by-value
    cumulative identity (2·cum + cnt + 1) — no per-row ranking; the
    U_t sweep is exact integer algebra (Σ2r_i is a running int64 sum,
    t(n+1) integer); the argmax breaks |U| ties on the earliest day;
    only the final exponential approximation is IEEE, micro-quantized,
    from integer inputs.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    midranks, the cumulative sweep and the argmax live on the bounded
    (calendar-sized) day table — windows there are single-task but
    domain-bounded by the calendar, which no corpus growth changes;
    1-row scalar cross for n (allowlisted).

    Reference basis: when did the rate regime shift inside a run —
    the retrospective complement of the reference's sequential
    watchdog (DAQ_self-triggering.md:84-97); statistic from Pettitt
    1979 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("pettitt_orders")
    return spark.sql(_PETTITT_SQL.format(src="pettitt_orders",
                                         day=_FCAST_DAY_SPARK))


# --------------------------------------------------------------------------
# ext_err_eval — expected reciprocal rank of the cosine retriever
# --------------------------------------------------------------------------

#: the panel / quantized-cosine / deterministic top-10 CTE chain is
#: SHARED BYTE-FOR-BYTE with `_MAP_MRR_SQL` (sliced at the metric
#: close), so the three rank scorecards stay directly comparable per
#: query; only the close differs.
_ERR_PREFIX = _MAP_MRR_SQL.split("\nperq AS")[0].rstrip().rstrip(",")

#: cascade close: with binary relevance mapped to R = 1/2 (the
#: (2^g - 1)/2^gmax convention at g = gmax = 1), a relevant hit at
#: rank r after cum_rel-1 earlier hits contributes
#: (1/r)·R·(1-R)^(cum_rel-1) = 1/(r · 2^cum_rel) EXACTLY — a dyadic
#: rational, so each term FLOORs to int64 micro from integer inputs
#: (POWER(2, k) is exact for k <= 10) and per-query ERR is an exact
#: integer sum.
_ERR_SQL = _ERR_PREFIX + """
SELECT q_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
       CAST(SUM(CASE WHEN rel = 1 THEN
            CAST(FLOOR(1e6 / (rnk * POWER(2e0, cum_rel)) + 5e-1) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS err10_micro
FROM top GROUP BY q_id
"""


@register("ext_err_eval",
          oracle=_ERR_SQL.format(pos=f"({_POS_SQL})"),
          tags=("ext", "similarity", "eval"))
def ext_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected reciprocal rank at 10 (Chapelle et al., CIKM 2009) of
    the exact-cosine retriever — the CASCADE member of the rank-metric
    family: MRR stops at the first relevant hit, AP integrates
    precision, nDCG discounts positions logarithmically; ERR models a
    user who scans down and leaves with probability R at each relevant
    result, so LATER relevant hits are worth exponentially less once
    earlier ones exist. That satisfaction model is why ERR became the
    web-search standard for graded relevance — and why a retriever
    that front-loads one good hit scores near its ceiling while one
    that buries five relevants mid-list does not, a difference
    `ext_map_mrr_eval` underweights. Same panel (every 100th vector),
    same quantized cosine, same tie-break as the sibling evals.

    Determinism: the ranked-panel CTE chain is shared byte-for-byte
    with `ext_map_mrr_eval`; with binary relevance the cascade term at
    rank r is EXACTLY 1/(r·2^cum_rel) (dyadic rational; POWER(2, k)
    exact for k <= 10), FLOORed to int64 micro per term, so per-query
    ERR is an exact integer sum — no IEEE accumulation anywhere.

    Scale shape: identical to `ext_map_mrr_eval` — the panel
    broadcasts, the dot-product join is broadcast-hash on 64 position
    keys + one map-side-combinable reduce (|corpus| x |panel|, the
    honest price of exact eval; sampled panel at 100 TB); the cascade
    closes on a bounded 10-row window per query.

    Reference basis: scored candidate ranking against a reference
    signal (DAQ_self-triggering.md:343-346); metric from Chapelle,
    Metlzer, Zhang & Grinspan 2009 (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    (emb.select("vec_id", "label",
                F.posexplode("embedding").alias("i0", "v0"))
        .select("vec_id", "label", (F.col("i0") + 1).alias("i"),
                F.col("v0").cast("double").alias("v"))
        .createOrReplaceTempView("err_pos"))
    return spark.sql(_ERR_SQL.format(pos="err_pos"))


# --------------------------------------------------------------------------
# ext_local_clustering — per-node clustering coefficient of the dup graph
# --------------------------------------------------------------------------

#: tail shared verbatim by both engines over `cands(doc_a, doc_b)`
#: (doc_a < doc_b): per-node triangle counts come from the middle-
#: vertex wedge census SEMI-JOINED back to the edge set (a wedge
#: a-b-c closes iff (a,c) is an edge), so every count is exact set
#: algebra; C_b = 2·tri_b / (deg_b·(deg_b-1)) micro-quantizes once.
_LCC_TAIL = """
ed AS (
    SELECT doc_a AS u, doc_b AS v FROM cands
    UNION ALL
    SELECT doc_b AS u, doc_a AS v FROM cands
),
deg AS (
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY u
),
tri AS (
    SELECT e1.u AS node, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM ed e1 JOIN ed e2 ON e1.u = e2.u AND e1.v < e2.v
    WHERE EXISTS (SELECT 1 FROM cands x
                  WHERE x.doc_a = e1.v AND x.doc_b = e2.v)
    GROUP BY e1.u
),
c AS (
    SELECT d.node, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
           CAST(FLOOR(2e6 * COALESCE(t.n_tri, 0)
                / (d.deg * (d.deg - 1)) + 5e-1) AS BIGINT) AS c_micro
    FROM deg d LEFT JOIN tri t ON d.node = t.node
    WHERE d.deg >= 2
)
SELECT node, deg, n_tri, c_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY c_micro DESC, deg DESC,
                                   node) AS rk
      FROM c)
WHERE rk <= 15
"""

_LCC_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_MINHASH_SIGS_SQL},
{_AA_CANDS_SQL},
{_LCC_TAIL}
"""


@register("ext_local_clustering", oracle=_LCC_SQL, tags=("ext", "graph"))
def ext_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watts-Strogatz local clustering coefficient (Watts & Strogatz
    1998) per vertex of the MinHash collision graph: C_i = 2·tri_i /
    (deg_i·(deg_i-1)), top-15 by coefficient among vertices of degree
    >= 2. The PER-NODE complement of `ext_graph_triangles` (one global
    count) and `ext_newman_modularity` (partition quality): a
    high-C_i vertex sits inside a clique — a template farm whose
    members all collide with each other (resolve as ONE canonical
    doc); a low-C_i, high-degree vertex is a radiation hub — boilerplate
    shared across otherwise-unrelated docs (resolve by stripping the
    boilerplate, not by collapsing the neighbors). That per-vertex
    distinction is the dedup-resolution policy signal the global
    numbers blur.

    Determinism: triangle counts are exact set algebra (wedge census
    semi-joined to the edge set); degrees are exact counts; C_i
    micro-quantizes once per node from integer inputs; the top-15
    orders with a (c_micro, deg, node) total tie-break.

    Scale shape: the wedge census enumerates per middle vertex —
    sum(deg^2) cost like `ext_graph_triangles`/`ext_adamic_adar`,
    never all-pairs; the closing semi-join is an equi-join on the
    (a, c) pair key. At extreme scale the same deg-cap lowering as
    `ext_adamic_adar_capped` applies verbatim (cap the middle before
    the wedge join).

    Reference basis: clique-vs-hub topology of the duplicate graph
    (the reference's correlation census, DAQ_self-triggering.md:
    235-236); coefficient from Watts & Strogatz 1998 (public)."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import ext_dedup_minhash
    sigs = ext_dedup_minhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    cands = (a.join(b, ["k", "minhash"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    cands.createOrReplaceTempView("lcc_cands")
    return spark.sql("WITH " + _LCC_TAIL.replace("FROM cands",
                                                 "FROM lcc_cands"))


# --------------------------------------------------------------------------
# ext_diebold_mariano — forecast-accuracy comparison test
# --------------------------------------------------------------------------

#: shared body ({src} = orders view, {day} = engine epoch-day). The
#: loss differential d_t = |e_naive1| - |e_snaive7| is an exact integer
#: per day (both lags restricted to days where BOTH exist, identical in
#: both engines); its three moments are exact int64 sums; the DM close
#: is one fixed-order IEEE expression with an INTEGER DECIMAL(38,0)
#: positive-variance guard.
_DM_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
j AS (
    SELECT a.d, ABS(a.c - b.c) - ABS(a.c - s.c) AS dt
    FROM day a JOIN day b ON b.d = a.d - 1
               JOIN day s ON s.d = a.d - 7
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(dt) AS BIGINT) AS sd,
           CAST(SUM(dt * dt) AS BIGINT) AS sdd
    FROM j
)
SELECT n AS n_days, sd AS sum_loss_diff,
       CAST(FLOOR(sd * 1e3 / n + 5e-1) AS BIGINT) AS mean_loss_diff_milli,
       CAST(FLOOR((sd * 1e0 / n)
            / SQRT((sdd * 1e0 / n - (sd * 1e0 / n) * (sd * 1e0 / n)) / n)
            * 1e3 + 5e-1) AS BIGINT) AS dm_milli
FROM m
WHERE n > 1 AND CAST(n AS DECIMAL(38,0)) * sdd
      - CAST(sd AS DECIMAL(38,0)) * sd > 0
"""


@register("ext_diebold_mariano",
          oracle=_DM_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano test (Diebold & Mariano 1995, h=1) comparing the
    naive-1 and seasonal-naive-7 forecasters on the daily order-count
    series under absolute-error loss: d_t = |e_naive| - |e_snaive|,
    DM = mean(d) / sqrt(var(d)/n). `ext_forecast_naive_benchmarks`
    reports the RATIO of the two strategies' errors (MASE/U2); DM asks
    whether that difference is SIGNIFICANT given the day-to-day
    variance of the loss differential — the test a pipeline runs
    before switching forecasters, because a 5% MASE win that DM can't
    distinguish from noise is not a win. Negative DM = the weekly
    seasonal forecaster is significantly better.

    Determinism: the loss differential is an exact integer per day
    (integer counts, integer lags, both restricted to days where both
    lags exist — the `ext_forecast_naive_benchmarks` restriction); its
    moments are exact int64 sums; the close is one fixed-order IEEE
    expression, milli-quantized, with an INTEGER DECIMAL(38,0)
    positive-variance guard (n·Σd² - (Σd)² > 0).

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the lag
    joins and moments live on the calendar-bounded day table; 1-row
    close.

    Reference basis: which persistence baseline tracks the rate better,
    with significance (DAQ_self-triggering.md:84-87's
    reuse-thresholds regime); test from Diebold & Mariano 1995
    (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("dm_orders")
    return spark.sql(_DM_SQL.format(src="dm_orders", day=_FCAST_DAY_SPARK))


# --------------------------------------------------------------------------
# ext_kuiper_test — rotation-robust two-sample ECDF gap test
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Same grouped-by-value ECDF
#: frame as the CvM/KS siblings; both one-sided gaps are maxima of
#: EXACT INTEGER cross products cum1·n2 - cum2·n1 (DECIMAL(38,0)
#: against 100 TB row counts), so V's numerator is exact and only the
#: final normalization divides.
_KUIPER_SQL = """
WITH v AS (
    SELECT n_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS c2
    FROM {src} GROUP BY n_chars
),
c AS (
    SELECT CAST(SUM(c1) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum1,
           CAST(SUM(c2) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum2,
           CAST(SUM(c1) OVER () AS DECIMAL(38,0)) AS n1,
           CAST(SUM(c2) OVER () AS DECIMAL(38,0)) AS n2
    FROM v
),
s AS (
    SELECT CAST(MAX(cum1 * n2 - cum2 * n1) AS DECIMAL(38,0)) AS dplus_num,
           CAST(MAX(cum2 * n1 - cum1 * n2) AS DECIMAL(38,0)) AS dminus_num,
           CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
    FROM c
)
SELECT n1, n2,
       CAST(FLOOR(CAST(GREATEST(dplus_num, 0) AS DOUBLE) * 1e6
            / (n1 * 1e0 * n2) + 5e-1) AS BIGINT) AS d_plus_micro,
       CAST(FLOOR(CAST(GREATEST(dminus_num, 0) AS DOUBLE) * 1e6
            / (n1 * 1e0 * n2) + 5e-1) AS BIGINT) AS d_minus_micro,
       CAST(FLOOR((CAST(GREATEST(dplus_num, 0) AS DOUBLE)
                   + CAST(GREATEST(dminus_num, 0) AS DOUBLE)) * 1e6
            / (n1 * 1e0 * n2) + 5e-1) AS BIGINT) AS v_kuiper_micro
FROM s
WHERE n1 > 0 AND n2 > 0
"""


@register("ext_kuiper_test", oracle=_KUIPER_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_kuiper_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's two-sample test (Kuiper 1960) for en vs non-en document
    length: V = D+ + D-, the SUM of the two one-sided maximal ECDF
    gaps. The member of the ECDF family with equal sensitivity across
    the whole range: KS (`ext_drift_ks` frame) reads only the single
    worst gap and is famously blind near the tails, CvM integrates all
    gaps quadratically — Kuiper's V catches a distribution that is
    shifted one way low and the other way high (exactly what a
    length-truncation artifact looks like) that KS can halve. Also the
    canonical test for CIRCULAR data (hour-of-day, day-of-week), where
    V is invariant to the cut point.

    Determinism: the ECDF comparison never materializes per-row ranks —
    both one-sided gaps are maxima of EXACT INTEGER cross products
    cum1·n2 - cum2·n1 carried in DECIMAL(38,0) (safe past 100 TB row
    counts where int64 products wrap); only the final normalization by
    n1·n2 is IEEE, micro-quantized; GREATEST pins the empty-gap edge.

    Scale shape: ONE groupBy(value) reduce; windows over the bounded
    distinct-value dimension; 1-row close. Bounded-domain assumption,
    stated as the bound: the cumulative windows are ONE task sized by
    the value DOMAIN (~6e7 cells for cent-quantized money), not by
    rows; past that ceiling swap in `ext_token_weighted_resample`'s
    range-bucketed two-level prefix sum at the cumulative step.

    Reference basis: full-range comparison of per-channel response
    spectra between runs (DAQ_self-triggering.md:91-93); statistic
    from Kuiper 1960 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("kuiper_docs")
    return spark.sql(_KUIPER_SQL.format(src="kuiper_docs"))


# --------------------------------------------------------------------------
# ext_bowker_test — k x k symmetry of first-vs-last behavior
# --------------------------------------------------------------------------

#: shared body ({src} = events view). First/last event type per user
#: are deterministic order statistics (ties pinned by (ts, event_id)
#: via the string-encoded argmin/argmax — MIN/MAX over zero-padded
#: sortable keys, no window); off-diagonal pair terms
#: (n_ij - n_ji)^2 / (n_ij + n_ji) quantize to int64 micro per pair
#: BEFORE the unordered sum over the bounded k x k grid.
_BOWKER_SQL = """
WITH fl AS (
    SELECT user_id,
           SUBSTR(MIN(CONCAT(LPAD(CAST(CAST(ts AS BIGINT) AS STRING),
                                  20, '0'),
                             LPAD(CAST(event_id AS STRING), 20, '0'),
                             event_type)), 41, 100) AS first_type,
           SUBSTR(MAX(CONCAT(LPAD(CAST(CAST(ts AS BIGINT) AS STRING),
                                  20, '0'),
                             LPAD(CAST(event_id AS STRING), 20, '0'),
                             event_type)), 41, 100) AS last_type
    FROM {src} GROUP BY user_id
),
ct AS (
    SELECT first_type AS i, last_type AS j, CAST(COUNT(*) AS BIGINT) AS n
    FROM fl GROUP BY first_type, last_type
),
p AS (
    SELECT a.i, a.j, a.n AS n_ij, COALESCE(b.n, 0) AS n_ji
    FROM ct a LEFT JOIN ct b ON a.i = b.j AND a.j = b.i
    WHERE a.i < a.j
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(CAST(FLOOR((n_ij - n_ji) * 1e0 * (n_ij - n_ji)
                / (n_ij + n_ji) * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
               AS chi2_micro,
           CAST(SUM(n_ij + n_ji) AS BIGINT) AS n_offdiag
    FROM p
    WHERE n_ij + n_ji > 0
)
SELECT df, n_offdiag, chi2_micro,
       CAST(FLOOR(chi2_micro * 1e0 / 1e3 + 5e-1) AS BIGINT) AS chi2_milli
FROM s
WHERE df > 0
"""


#: the oracle sees the SAME integer microsecond ts the Spark view
#: provides (DuckDB cannot CAST TIMESTAMP to BIGINT directly)
_BOWKER_SRC_DUCK = ("(SELECT user_id, event_id, event_type, "
                    "CAST(epoch_us(ts) AS BIGINT) AS ts FROM events)")


@register("ext_bowker_test",
          oracle=_BOWKER_SQL.format(src=_BOWKER_SRC_DUCK),
          tags=("ext", "curation", "stats"))
def ext_bowker_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test (Bowker 1948) on the k x k table of
    (first event type, last event type) per user: chi2 =
    sum over i<j of (n_ij - n_ji)^2 / (n_ij + n_ji), df = off-diagonal
    pairs with any mass. The k-CATEGORY generalization of McNemar
    (`ext_mcnemar_filters` is exactly the k=2 cell of this query):
    symmetric flow says users enter and exit the product through the
    same behaviors; an asymmetric cell (many view->purchase, few
    purchase->view) is the directional journey signal funnel analyses
    (`agg_event_funnel`, `agg_event_transitions`) describe but never
    TEST.

    Determinism: first/last per user are deterministic order statistics
    — MIN/MAX over zero-padded (ts, event_id, type) sortable string
    keys, the argmin-without-a-window trick, identical in both
    engines; the contingency table is exact integer counts; each
    off-diagonal pair term quantizes to int64 micro BEFORE the
    unordered sum over the bounded k x k grid; empty pairs guard on
    integers.

    Scale shape: ONE map-side-combinable groupBy(user_id) reduce (the
    MIN/MAX keys combine associatively), one bounded k x k reduce, a
    k(k-1)/2-row self-join, 1-row close.

    Reference basis: symmetry of enter/exit channel states across a
    run (DAQ_self-triggering.md:84-97); test from Bowker 1948
    (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.selectExpr("user_id", "event_id", "event_type",
                  "unix_micros(ts) as ts") \
        .createOrReplaceTempView("bowker_events")
    return spark.sql(_BOWKER_SQL.format(src="bowker_events"))


# --------------------------------------------------------------------------
# ext_hodges_lehmann — the rank-family location-shift ESTIMATOR
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The pairwise-difference
#: distribution is a (distinct-en-value x distinct-rest-value) GRID
#: with integer pair weights c1·c2 (DECIMAL(38,0)) — never a row-level
#: pair join; the weighted lower/upper medians come from the exact
#: cumulative-weight identity and the HL point estimate is their
#: milli-quantized average.
_HL_SQL = """
WITH v1 AS (
    SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} WHERE lang = 'en' GROUP BY n_chars
),
v2 AS (
    SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} WHERE lang <> 'en' GROUP BY n_chars
),
g AS (
    SELECT v1.v - v2.v AS d,
           CAST(SUM(CAST(v1.c AS DECIMAL(38,0)) * v2.c)
                AS DECIMAL(38,0)) AS w
    FROM v1 JOIN v2 ON TRUE
    GROUP BY v1.v - v2.v
),
cw AS (
    SELECT d, w,
           CAST(COALESCE(SUM(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS DECIMAL(38,0)) AS cb,
           CAST(SUM(w) OVER () AS DECIMAL(38,0)) AS t
    FROM g
),
m AS (
    -- lower median rank = ceil(T/2)  <=> 2*cum >= T
    -- upper median rank = floor(T/2)+1 <=> 2*cum >= T+1
    SELECT CAST(MAX(t) AS DECIMAL(38,0)) AS t,
           CAST(MIN(CASE WHEN 2 * (cb + w) >= t THEN d END)
               AS BIGINT) AS d_lo,
           CAST(MIN(CASE WHEN 2 * (cb + w) >= t + 1 THEN d END)
               AS BIGINT) AS d_hi
    FROM cw
)
SELECT CAST(t AS BIGINT) AS n_pairs, d_lo AS hl_lower, d_hi AS hl_upper,
       CAST(FLOOR((d_lo + d_hi) * 1e3 / 2e0 + 5e-1) AS BIGINT)
           AS hl_shift_milli
FROM m
WHERE t >= 1
"""


@register("ext_hodges_lehmann", oracle=_HL_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimator (Hodges & Lehmann 1963)
    for en vs non-en document length: the median of ALL pairwise
    differences X_i - Y_j — the ESTIMATOR behind the Mann-Whitney test
    (`ext_mann_whitney_u` says WHETHER the cohorts differ and
    `ext_cliffs_delta` by how much ordinally; HL answers "by how many
    CHARACTERS", robustly — 29% breakdown, no moments assumed, the
    number a length-normalization step would actually subtract).
    Emits the lower/upper weighted medians of the difference
    distribution and their average as the point estimate.

    Determinism: the difference distribution is a (distinct-value x
    distinct-value) GRID with exact integer pair weights c1·c2 in
    DECIMAL(38,0) — never a row-level pair join; the median ranks use
    the exact cumulative-weight identity (2·cum >= T+1 / T+2 integer
    predicates — no per-engine midpoint rounding); the only IEEE op is
    the final /2 average, milli-quantized.

    Scale shape: two groupBy(value) reduces, then a VALUE-DOMAIN x
    VALUE-DOMAIN grid (bounded by the squared distinct-value
    dimension: ~530^2 = 280k cells here — fine for bounded domains
    like n_chars or quantized scores, and the docstring states this as
    the bound: for a cents-sized domain (~6e7) the grid squares to
    3.6e15 and this query does NOT apply; bucket the value axis first
    — the standard HL-on-binned-data estimator — which caps the grid
    at buckets^2). One single-task window over the difference
    dimension (same bounded-domain trade as the rank tests).

    Reference basis: robust location shift between configuration
    response distributions (DAQ_self-triggering.md:84-93); estimator
    from Hodges & Lehmann 1963 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("hl_docs")
    return spark.sql(_HL_SQL.format(src="hl_docs"))


# --------------------------------------------------------------------------
# ext_sign_test — the magnitude-free member of the paired family
# --------------------------------------------------------------------------

#: the split-half pairing CTE chain is SHARED BYTE-FOR-BYTE with
#: `_WILCOXON_SQL` (sliced before the ranking step — the sign test IS
#: Wilcoxon minus the rank weights); zero diffs are already dropped
#: there, per both tests' convention.
_SIGN_PREFIX = _WILCOXON_SQL.split("\nrk AS")[0].rstrip().rstrip(",")

_SIGN_SQL = _SIGN_PREFIX + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_plus,
       CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_minus,
       CAST(FLOOR((SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END))
            / SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e6 + 5e-1) AS BIGINT)
           AS z_micro
FROM d
HAVING COUNT(*) > 0
"""


@register("ext_sign_test", oracle=_SIGN_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paired sign test (Arbuthnott 1710 — the oldest significance
    test on record) on the same deterministic split-half pairing as
    `ext_wilcoxon_signed_rank`: count sources whose even-position half
    is longer vs shorter, z = (n+ - n-)/sqrt(n) by the binomial normal
    approximation. The MAGNITUDE-FREE member of the paired family —
    Wilcoxon's own docstring places it: "the sign test ignores
    magnitudes" — which is exactly why it survives arbitrary monotone
    transforms and single wild outliers that move Wilcoxon; when sign
    and signed-rank disagree, a few extreme pairs are carrying
    Wilcoxon's verdict, and that disagreement is the diagnostic.

    Determinism: the pairing CTE chain is shared byte-for-byte with
    `ext_wilcoxon_signed_rank` (milli-quantized half-means, integer
    diffs, zero-diffs dropped identically); the counts are exact
    integers and the z close is one fixed-order IEEE expression,
    micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(source) reduce and a
    1-row close — strictly cheaper than Wilcoxon (no ranking window at
    all).

    Reference basis: paired first-half/second-half stability of
    per-channel rates (DAQ_self-triggering.md:84-97); test per
    Arbuthnott 1710 / Dixon & Mood 1946 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("sign_docs")
    return spark.sql(_SIGN_SQL.format(src="sign_docs"))


# --------------------------------------------------------------------------
# ext_jarque_bera — moment-based normality gate per cohort
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Raw power sums ride
#: DECIMAL(38,0) (n_chars^4 sums wrap int64 past ~1e4 rows of 1e3-char
#: docs — the `agg_welch_ttest` round-6 lesson, fourth-moment
#: edition); positive variance guards on the INTEGER decimal predicate
#: n·s2 - s1^2 > 0; central moments, skewness, kurtosis and JB close
#: in fixed-order IEEE chains shared verbatim, milli-quantized.
_JB_SQL = """
WITH g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s1,
           SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS s2,
           SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars * n_chars) AS s3,
           SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars * n_chars
               * n_chars) AS s4
    FROM {src} GROUP BY lang
    HAVING COUNT(*) > 3
       AND CAST(COUNT(*) AS DECIMAL(38,0))
           * SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
           - CAST(SUM(n_chars) AS DECIMAL(38,0)) * SUM(n_chars) > 0
),
c AS (
    SELECT lang, n,
           CAST(s1 AS DOUBLE) / n AS mu, CAST(s2 AS DOUBLE) / n AS m2r,
           CAST(s3 AS DOUBLE) / n AS m3r, CAST(s4 AS DOUBLE) / n AS m4r
    FROM g
),
k AS (
    SELECT lang, n,
           m2r - mu * mu AS m2,
           m3r - 3e0 * mu * m2r + 2e0 * mu * mu * mu AS m3,
           m4r - 4e0 * mu * m3r + 6e0 * mu * mu * m2r
               - 3e0 * mu * mu * mu * mu AS m4
    FROM c
)
SELECT lang, n AS n_rows,
       CAST(FLOOR(m3 / POWER(m2, 1.5e0) * 1e3 + 5e-1) AS BIGINT)
           AS skew_milli,
       CAST(FLOOR((m4 / (m2 * m2) - 3e0) * 1e3 + 5e-1) AS BIGINT)
           AS excess_kurtosis_milli,
       CAST(FLOOR(n / 6e0 * ((m3 / POWER(m2, 1.5e0))
                             * (m3 / POWER(m2, 1.5e0))
                             + (m4 / (m2 * m2) - 3e0)
                             * (m4 / (m2 * m2) - 3e0) / 4e0) * 1e3
            + 5e-1) AS BIGINT) AS jb_milli
FROM k
"""


@register("ext_jarque_bera", oracle=_JB_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera 1980) per language
    cohort on document length: JB = n/6·(S² + K²/4) from the exact
    skewness S and excess kurtosis K. The moment-based NORMALITY GATE
    the parametric family stands on — `agg_welch_ttest` and
    `ext_bartlett_test` assume near-normal cohorts, and JB is the
    one-number check that says whether that assumption holds or the
    rank family (`ext_mann_whitney_u`, `ext_brown_forsythe`) should
    carry the verdict instead. Corpus lengths are famously
    right-skewed: S and K are themselves the two shape parameters a
    curation dashboard tracks per cohort.

    Determinism: the four raw power sums are exact DECIMAL(38,0)
    (fourth powers of 1e3-char docs wrap int64 already at ~1e4 rows —
    the round-6 `agg_welch_ttest` headroom lesson, fourth-moment
    edition; DECIMAL carries past 100 TB); positive-variance cohorts
    select on the INTEGER decimal predicate n·Σx² - (Σx)² > 0; central
    moments / S / K / JB close in fixed-order IEEE chains shared
    verbatim, milli-quantized.

    Scale shape: ONE map-side-combinable groupBy(lang) reduce, then
    k-row algebra — the `agg_anova_oneway` shape with two more
    moments.

    Reference basis: response-distribution shape screening per
    configuration (DAQ_self-triggering.md:84-93's spectra); statistic
    from Jarque & Bera 1980 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("jb_docs")
    return spark.sql(_JB_SQL.format(src="jb_docs"))


# --------------------------------------------------------------------------
# ext_fdr_bky — two-stage adaptive FDR (Benjamini-Krieger-Yekutieli)
# --------------------------------------------------------------------------

#: the per-source test / p-value / rank CTE chain is SHARED
#: BYTE-FOR-BYTE with `_FDR_SQL` (sliced before its BH close); both
#: stages compare EXACT INTEGERS — stage 1 at q' = 0.05/1.05 = 1/21 is
#: p_micro·21·m <= prank·1e6, stage 2 at q'·m/(m-r1) is
#: p_micro·21·(m-r1) <= prank·1e6 — no float criticals anywhere. The
#: r1 = 0 and r1 = m edge cases fall out of the same predicate (reject
#: none / reject all).
_BKY_PREFIX = _FDR_SQL.split("\nk AS")[0].rstrip().rstrip(",")

_BKY_SQL = _BKY_PREFIX + """,
s1 AS (
    SELECT source, n, z_milli, p_micro, prank, m,
           CAST(MAX(CASE WHEN p_micro * 21 * m <= prank * 1000000
                         THEN prank ELSE 0 END) OVER () AS BIGINT) AS r1
    FROM r
)
SELECT source, n, z_milli, p_micro, prank, r1 AS n_stage1_rejects,
       CASE WHEN prank <= MAX(CASE WHEN p_micro * 21 * (m - r1)
                                        <= prank * 1000000
                              THEN prank ELSE 0 END) OVER ()
            THEN 1 ELSE 0 END AS rejected_bky,
       CASE WHEN prank <= MAX(CASE WHEN p_micro * 20 * m
                                        <= prank * 1000000
                              THEN prank ELSE 0 END) OVER ()
            THEN 1 ELSE 0 END AS rejected_bh
FROM s1
"""


@register("ext_fdr_bky", oracle=_BKY_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_fdr_bky(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Krieger-Yekutieli two-stage adaptive FDR (Benjamini,
    Krieger & Yekutieli 2006) over the same per-source shift-test
    family as `ext_fdr_bh`/`ext_fdr_by`/`ext_holm_stepdown`: stage 1
    runs BH at q' = q/(1+q); its rejection count r1 estimates the
    number of true nulls as m - r1; stage 2 reruns BH at the inflated
    level q'·m/(m-r1). When many hypotheses are truly non-null
    (typical for per-source drift families — MOST sources genuinely
    differ), plain BH leaves power on the table by budgeting FDR as if
    all m were null; BKY recovers it with proven FDR <= q under
    independence. Emitting the BH column beside it makes the adaptive
    gain visible as a set difference.

    Determinism: the test/p-value/rank chain is shared byte-for-byte
    with `ext_fdr_bh`; both stage criteria are EXACT INTEGER
    comparisons (q' = 1/21 and q = 1/20 clear the denominators), so no
    float critical values exist anywhere; the r1 = 0 / r1 = m edges
    fall out of the same predicate (reject none / reject all).

    Scale shape: ONE map-side-combinable groupBy(source) reduce;
    everything after runs on the bounded source dimension.

    Reference basis: adaptive multiplicity control over the
    per-channel drift family (DAQ_self-triggering.md:84-97); procedure
    from Benjamini, Krieger & Yekutieli 2006, Biometrika (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bky_docs")
    return spark.sql(_BKY_SQL.format(src="bky_docs"))


# --------------------------------------------------------------------------
# ext_quade_test — range-weighted blocked rank test
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Same complete-block cell /
#: rank table as `_FRIEDMAN_SQL`; block weights rank the within-block
#: RANGE (big-spread sources count more); the doubled scores
#: S_ij = q_i·(2r_ij - (k+1)) keep everything integer, and Quade's
#: F = (b-1)·ΣT_j² / (b·ΣS² - ΣT_j²) clears the 1/b normalizations so
#: numerator and denominator are exact integers with ONE final IEEE
#: division.
_QUADE_SQL = """
WITH cell AS (
    SELECT source, lang,
           CAST(FLOOR(CAST(SUM(n_chars) AS BIGINT) * 1e3 / COUNT(*)
                      + 5e-1) AS BIGINT) AS v
    FROM {src} GROUP BY source, lang
),
blocks AS (
    SELECT source FROM cell GROUP BY source HAVING COUNT(*) = 5
),
rk AS (
    SELECT c.source, c.lang,
           CAST(RANK() OVER (PARTITION BY c.source
                             ORDER BY c.v, c.lang) AS BIGINT) AS r
    FROM cell c JOIN blocks b ON c.source = b.source
),
rng AS (
    SELECT c.source, CAST(MAX(c.v) - MIN(c.v) AS BIGINT) AS spread
    FROM cell c JOIN blocks b ON c.source = b.source
    GROUP BY c.source
),
qw AS (
    SELECT source,
           CAST(RANK() OVER (ORDER BY spread, source) AS BIGINT) AS q
    FROM rng
),
s AS (
    SELECT rk.source, rk.lang,
           CAST(qw.q * (2 * rk.r - 6) AS BIGINT) AS s2x
    FROM rk JOIN qw ON rk.source = qw.source
),
tj AS (
    SELECT lang, CAST(SUM(s2x) AS BIGINT) AS t_j FROM s GROUP BY lang
),
m AS (
    SELECT (SELECT CAST(SUM(CAST(s2x AS DECIMAL(38,0)) * s2x)
                   AS DECIMAL(38,0)) FROM s) AS a2,
           (SELECT CAST(SUM(CAST(t_j AS DECIMAL(38,0)) * t_j)
                   AS DECIMAL(38,0)) FROM tj) AS st,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM blocks) AS b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tj) AS k
)
SELECT b AS n_blocks, k AS n_treatments,
       CAST(st AS BIGINT) AS sum_tj2, CAST(a2 AS BIGINT) AS sum_s2,
       CAST(FLOOR((b - 1e0) * CAST(st AS DOUBLE)
            / (CAST(b AS DOUBLE) * CAST(a2 AS DOUBLE)
               - CAST(st AS DOUBLE)) * 1e3 + 5e-1) AS BIGINT)
           AS quade_f_milli
FROM m
WHERE b > 1 AND k > 1 AND CAST(b AS DECIMAL(38,0)) * a2 - st > 0
"""


@register("ext_quade_test", oracle=_QUADE_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade's range-weighted blocked rank test (Quade 1979) over the
    same source x language complete blocks as
    `ext_friedman_kendall_w`: blocks are WEIGHTED by the rank of their
    within-block range, so sources where language actually moves the
    metric carry the verdict and near-flat blocks stop diluting it —
    the documented power upgrade over Friedman for small k (k <= 5,
    exactly this grid). F = (b-1)·B/(A-B) with the standard doubled
    scores S_ij = q_i·(2r_ij - (k+1)).

    Determinism: cell means are milli-quantized; within-block ranks
    and range ranks use total-order tie-breaks; the doubled scores
    keep S_ij, T_j, ΣS² and ΣT² exact integers (DECIMAL(38,0) carries
    the squares past 100 TB block counts), and clearing the 1/b
    normalizations makes Quade's F ONE IEEE division of exact
    integers, milli-quantized; degeneracy (all blocks flat) guards on
    the integer DECIMAL predicate b·ΣS² - ΣT² > 0.

    Scale shape: ONE groupBy(source, lang) reduce; ranks and weights
    over the bounded block dimension; a k-row reduce and a 1-row close
    of scalar subqueries (bounded, allowlisted).

    Reference basis: consistent configuration ordering across channels
    weighted by channel dynamic range (DAQ_self-triggering.md:84-87);
    test from Quade 1979, JASA (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("quade_docs")
    return spark.sql(_QUADE_SQL.format(src="quade_docs"))


# --------------------------------------------------------------------------
# ext_stuart_maxwell — marginal homogeneity of first-vs-last behavior
# --------------------------------------------------------------------------

#: shared body ({src} = events view with integer-microsecond ts). Same
#: deterministic first/last order statistics as `ext_bowker_test`
#: (argmin/argmax over zero-padded sortable keys, no window), bucketed
#: to the 3-class behavior alphabet; the 3x3 contingency cells, both
#: marginal vectors, the difference vector d and the 2x2 covariance
#: S are ALL exact int64, and the chi-square d'S^-1 d is ONE IEEE
#: division of exact integer products (closed-form 2x2 inverse).
_STUART_MAXWELL_SQL = """
WITH fl AS (
    SELECT user_id,
           SUBSTR(MIN(CONCAT(LPAD(CAST(CAST(ts AS BIGINT) AS STRING),
                                  20, '0'),
                             LPAD(CAST(event_id AS STRING), 20, '0'),
                             event_type)), 41, 100) AS first_type,
           SUBSTR(MAX(CONCAT(LPAD(CAST(CAST(ts AS BIGINT) AS STRING),
                                  20, '0'),
                             LPAD(CAST(event_id AS STRING), 20, '0'),
                             event_type)), 41, 100) AS last_type
    FROM {src} GROUP BY user_id
),
b AS (
    SELECT CASE WHEN first_type IN ('click', 'view') THEN 1
                WHEN first_type IN ('purchase', 'signup') THEN 2
                ELSE 3 END AS i,
           CASE WHEN last_type IN ('click', 'view') THEN 1
                WHEN last_type IN ('purchase', 'signup') THEN 2
                ELSE 3 END AS j
    FROM fl
),
ct AS (
    SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY i, j
),
m AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN i = 1 THEN n ELSE 0 END) AS BIGINT) AS r1,
           CAST(SUM(CASE WHEN i = 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
           CAST(SUM(CASE WHEN j = 1 THEN n ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN j = 2 THEN n ELSE 0 END) AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN i = 1 AND j = 1 THEN n ELSE 0 END)
                AS BIGINT) AS n11,
           CAST(SUM(CASE WHEN i = 2 AND j = 2 THEN n ELSE 0 END)
                AS BIGINT) AS n22,
           CAST(SUM(CASE WHEN i = 1 AND j = 2 THEN n ELSE 0 END)
                AS BIGINT) AS n12,
           CAST(SUM(CASE WHEN i = 2 AND j = 1 THEN n ELSE 0 END)
                AS BIGINT) AS n21
    FROM ct
),
s AS (
    SELECT n, r1 - c1 AS d1, r2 - c2 AS d2,
           r1 + c1 - 2 * n11 AS s11,
           r2 + c2 - 2 * n22 AS s22,
           -(n12 + n21) AS s12
    FROM m
)
SELECT n AS n_users, d1, d2, s11, s22, s12,
       CAST(2 AS BIGINT) AS df,
       CAST(FLOOR((s22 * 1e0 * d1 * d1 - 2e0 * s12 * d1 * d2
                   + s11 * 1e0 * d2 * d2)
                  / (s11 * 1e0 * s22 - s12 * 1e0 * s12) * 1e3 + 5e-1)
            AS BIGINT) AS chi2_milli
FROM s
WHERE s11 * s22 - s12 * s12 > 0
"""


@register("ext_stuart_maxwell",
          oracle=_STUART_MAXWELL_SQL.format(src=_BOWKER_SRC_DUCK),
          tags=("ext", "curation", "stats"))
def ext_stuart_maxwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart-Maxwell test (Stuart 1955; Maxwell 1970) for MARGINAL
    homogeneity of the 3-class (browse / commit / error) first-vs-last
    behavior table: did the population DISTRIBUTION over behavior
    classes shift between a user's first and last act? The companion
    of `ext_bowker_test` on the same paired table — Bowker tests
    cell-level SYMMETRY (n_ij = n_ji for every pair), Stuart-Maxwell
    tests only the weaker marginal shift (row sums = column sums),
    which is the question a product analyst actually asks ("are users
    ending in purchase more than they started?"); symmetry implies
    marginal homogeneity but not conversely, so the pair localizes
    WHERE asymmetry lives. chi2 = d' S^-1 d over the first k-1
    categories, d_i = n_i. - n_.i, S_ii = n_i. + n_.i - 2 n_ii,
    S_ij = -(n_ij + n_ji), df = k-1 = 2.

    Determinism: first/last per user are the same argmin/argmax
    zero-padded sortable keys as `ext_bowker_test` (ts is integer
    microseconds, ties pinned by event_id — no window, associative
    MIN/MAX); the 3x3 cells, marginals, d and S are exact int64; the
    closed-form 2x2 inverse makes the chi-square ONE fixed-order IEEE
    division of integer products, milli-quantized; the singular-S
    degenerate case is excluded by an INTEGER determinant predicate.

    Scale shape: ONE map-side-combinable groupBy(user) reduce, then a
    bounded 3x3 grid reduce and a 1-row scalar close — nothing after
    the first reduce scales with the corpus.

    Reference basis: start-vs-end state distribution drift within a
    run (DAQ_self-triggering.md:84-97's per-run configuration
    bookends); test from Stuart 1955 / Maxwell 1970 (public)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    ev.selectExpr("user_id", "event_id", "event_type",
                  "unix_micros(ts) as ts") \
        .createOrReplaceTempView("stuart_events")
    return spark.sql(_STUART_MAXWELL_SQL.format(src="stuart_events"))


# --------------------------------------------------------------------------
# ext_partial_correlation — first-order partialled association
# --------------------------------------------------------------------------

#: shared body ({src} = lineitem view). Quantity, cent-quantized price
#: and centi-quantized discount are integers; all nine moment sums run
#: in DECIMAL(38,0) (price-squared cross terms pass int64 near 1e7
#: rows); the three Pearson r and the partial close are fixed-order
#: IEEE chains over the exact sums, micro-quantized.
_PARTIAL_CORR_SQL = """
WITH q AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS y,
           CAST(FLOOR(l_discount * 1e2 + 5e-1) AS BIGINT) AS z
    FROM {src}
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS sz,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
           CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DOUBLE) AS szz,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * z) AS DOUBLE) AS sxz,
           CAST(SUM(CAST(y AS DECIMAL(38,0)) * z) AS DOUBLE) AS syz
    FROM q
),
r AS (
    SELECT n,
           (n * sxy - sx * sy)
               / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
           (n * sxz - sx * sz)
               / SQRT((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
           (n * syz - sy * sz)
               / SQRT((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      AND n * szz - sz * sz > 0
)
SELECT n AS n_rows,
       CAST(FLOOR(rxy * 1e6 + 5e-1) AS BIGINT) AS r_qty_price_micro,
       CAST(FLOOR(rxz * 1e6 + 5e-1) AS BIGINT) AS r_qty_disc_micro,
       CAST(FLOOR(ryz * 1e6 + 5e-1) AS BIGINT) AS r_price_disc_micro,
       CAST(FLOOR((rxy - rxz * ryz)
                  / SQRT((1e0 - rxz * rxz) * (1e0 - ryz * ryz))
                  * 1e6 + 5e-1) AS BIGINT) AS r_partial_micro
FROM r
WHERE 1e0 - rxz * rxz > 0 AND 1e0 - ryz * ryz > 0
"""


@register("ext_partial_correlation",
          oracle=_PARTIAL_CORR_SQL.format(src="lineitem"),
          tags=("ext", "curation", "stats"))
def ext_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation (Yule 1907; the recursion every
    regression text builds from) of quantity and extended price with
    the discount partialled out: r_xy.z = (r_xy - r_xz r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)). The association family's missing
    CONFOUNDER control — `agg_corr_regr` reports marginal Pearson r,
    `ext_kendall_tau`/`agg_spearman_rank` rank it, but when discount
    policy co-moves with both quantity and price the marginal r is
    exactly the spurious number Simpson's-paradox warnings are about;
    partialling is the first-line fix, and the (marginal, partial)
    pair quantifies how much of the association the confounder owns.

    Determinism: all three variables are integer-quantized per row
    (quantity exact, price cents, discount centi) BEFORE the nine
    moment sums, which run exactly in DECIMAL(38,0); the three
    Pearson closes and the partial close are fixed-order IEEE chains
    over those exact sums, micro-quantized; zero-variance and
    degenerate |r_z| = 1 cases are excluded by predicates evaluated
    on the same deterministic doubles in both engines.

    Scale shape: ONE map-side-combinable full-table reduce (nine
    sums), then 1-row scalar algebra — the optimal 100 TB shape; the
    parquet scan reads exactly three columns.

    Reference basis: response-vs-threshold association controlled for
    the shared baseline drift (DAQ_self-triggering.md:84-93);
    recursion formula from Yule 1907 (public)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pcorr_lineitem")
    return spark.sql(_PARTIAL_CORR_SQL.format(src="pcorr_lineitem"))


# --------------------------------------------------------------------------
# ext_delta_method_ratio — standard error of a ratio-of-means KPI
# --------------------------------------------------------------------------

#: shared body ({src} = lineitem view). Numerator cents and integer
#: quantity reduce to six exact DECIMAL(38,0) moments; the ratio, its
#: delta-method variance and the Wald interval are one fixed-order
#: IEEE chain, micro-quantized; the 1.96 critical value is the exact
#: literal 196e-2.
_DELTA_RATIO_SQL = """
WITH q AS (
    SELECT CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS y,
           CAST(l_quantity AS BIGINT) AS x
    FROM {src}
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
    FROM q
),
c AS (
    SELECT n, sy / sx AS r,
           (syy - sy * sy / n) / (n - 1e0) AS vy,
           (sxx - sx * sx / n) / (n - 1e0) AS vx,
           (sxy - sx * sy / n) / (n - 1e0) AS cxy,
           sx / n AS mx
    FROM m
    WHERE n > 1 AND sx > 0
)
SELECT n AS n_rows,
       CAST(FLOOR(r * 1e6 + 5e-1) AS BIGINT) AS ratio_micro,
       CAST(FLOOR(SQRT((vy - 2e0 * r * cxy + r * r * vx)
                       / (n * mx * mx)) * 1e6 + 5e-1) AS BIGINT)
           AS se_micro,
       CAST(FLOOR((r - 196e-2 * SQRT((vy - 2e0 * r * cxy + r * r * vx)
                                     / (n * mx * mx))) * 1e6 + 5e-1)
            AS BIGINT) AS ci_lo_micro,
       CAST(FLOOR((r + 196e-2 * SQRT((vy - 2e0 * r * cxy + r * r * vx)
                                     / (n * mx * mx))) * 1e6 + 5e-1)
            AS BIGINT) AS ci_hi_micro
FROM c
WHERE vy - 2e0 * r * cxy + r * r * vx >= 0
"""


@register("ext_delta_method_ratio",
          oracle=_DELTA_RATIO_SQL.format(src="lineitem"),
          tags=("ext", "curation", "stats"))
def ext_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error (Cramer 1946 propagation-of-error)
    for the ratio-of-means KPI revenue-per-unit = mean(price cents) /
    mean(quantity): Var(R) ~ (s_y^2 - 2 R s_xy + R^2 s_x^2) /
    (n x-bar^2), with the 95% Wald interval. THE missing inference
    step under every per-unit metric this engine reports
    (`agg_price_elasticity`, `composite_promo_revenue`,
    `ext_ab_srm_check`'s guardrails): a ratio of means is NOT a mean,
    its naive SE is biased by the denominator's own noise and the
    numerator-denominator covariance, and the delta method is the
    textbook first-order fix (exactly how A/B platforms compute
    revenue-per-session intervals).

    Determinism: cents and quantity are integer per row; the six
    moments are exact DECIMAL(38,0) sums; ratio, variance and both
    interval bounds are fixed-order IEEE chains over those sums
    (1.96 as the exact literal 196e-2), micro-quantized; degenerate
    negative variance (impossible mathematically, reachable only by
    quantization at zero spread) guards on the same double both
    engines compute.

    Scale shape: ONE map-side-combinable full-table reduce (six
    sums) + a 1-row close; two-column parquet scan.

    Reference basis: error propagation onto derived per-event rate
    quantities (DAQ_self-triggering.md:84-93); delta method from
    Cramer 1946 (public)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("dmr_lineitem")
    return spark.sql(_DELTA_RATIO_SQL.format(src="dmr_lineitem"))


# --------------------------------------------------------------------------
# ext_fisher_exact — exact 2x2 independence for the small-sample regime
# --------------------------------------------------------------------------

#: engine seams for the bounded integer grid 0..100000 (DuckDB table
#: function vs Spark explode(sequence)); the grid is filtered to the
#: table total before use, so the literal bound is a design ceiling,
#: not a scan cost.
_FISHER_SEQ_DUCK = "(SELECT i FROM generate_series(0, 100000) t(i))"
_FISHER_SEQ_SPARK = "(SELECT explode(sequence(0, 100000)) AS i)"

#: shared body ({src} = documents view, {seq} = engine grid). The
#: log-factorial table lf(i) = sum_{{j<=i}} FLOOR(ln(j)*1e9 + .5) is an
#: EXACT INTEGER cumulative (each ln term quantized to nano BEFORE the
#: ordered integer window sum), so every hypergeometric log-probability
#: is exact int64 nano arithmetic and the two-sided tie rule
#: (lp(k) <= lp(a)) is an INTEGER comparison — no float ordering
#: anywhere; only the final exp() per support point is IEEE,
#: pico-quantized before the bounded support sums.
_FISHER_SQL = """
WITH m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS r1,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300
                         THEN 1 ELSE 0 END) AS BIGINT) AS a
    FROM {src}
),
seq AS (
    SELECT s.i FROM {seq} s WHERE s.i <= (SELECT n FROM m)
),
lf AS (
    SELECT i,
           CAST(SUM(CASE WHEN i >= 2 THEN
               CAST(FLOOR(LN(CAST(i AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)
               ELSE 0 END)
           OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS v
    FROM seq
),
cst AS (
    SELECT m.n, m.r1, m.c1, m.a,
           f1.v + f2.v + f3.v + f4.v - f5.v AS c_nano
    FROM m
    JOIN lf f1 ON f1.i = m.r1
    JOIN lf f2 ON f2.i = m.n - m.r1
    JOIN lf f3 ON f3.i = m.c1
    JOIN lf f4 ON f4.i = m.n - m.c1
    JOIN lf f5 ON f5.i = m.n
    WHERE m.r1 > 0 AND m.r1 < m.n AND m.c1 > 0 AND m.c1 < m.n
),
lp AS (
    SELECT s.i AS k,
           c.c_nano - la.v - lb.v - lc.v - ld.v AS lp_nano
    FROM seq s
    JOIN cst c ON s.i >= CASE WHEN c.r1 + c.c1 - c.n > 0
                              THEN c.r1 + c.c1 - c.n ELSE 0 END
              AND s.i <= CASE WHEN c.r1 < c.c1 THEN c.r1 ELSE c.c1 END
    JOIN lf la ON la.i = s.i
    JOIN lf lb ON lb.i = c.r1 - s.i
    JOIN lf lc ON lc.i = c.c1 - s.i
    JOIN lf ld ON ld.i = c.n - c.r1 - c.c1 + s.i
),
obs AS (
    SELECT lp.lp_nano AS lp_obs
    FROM lp JOIN cst c ON lp.k = c.a
)
SELECT c.n AS n_rows, c.r1 AS n_en, c.c1 AS n_long, c.a AS n_en_long,
       o.lp_obs AS logp_obs_nano,
       CAST(SUM(CASE WHEN lp.lp_nano <= o.lp_obs THEN
            CAST(FLOOR(EXP(lp.lp_nano / 1e9) * 1e12 + 5e-1) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS p_two_sided_pico,
       CAST(SUM(CASE WHEN lp.k <= c.a THEN
            CAST(FLOOR(EXP(lp.lp_nano / 1e9) * 1e12 + 5e-1) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS p_left_pico,
       CAST(SUM(CASE WHEN lp.k >= c.a THEN
            CAST(FLOOR(EXP(lp.lp_nano / 1e9) * 1e12 + 5e-1) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS p_right_pico,
       CAST(FLOOR((c.a + 5e-1) * (c.n - c.r1 - c.c1 + c.a + 5e-1)
                  / ((c.r1 - c.a + 5e-1) * (c.c1 - c.a + 5e-1)) * 1e6
                  + 5e-1) AS BIGINT) AS or_haldane_micro
FROM lp
CROSS JOIN cst c
CROSS JOIN obs o
GROUP BY c.n, c.r1, c.c1, c.a, o.lp_obs
"""


@register("ext_fisher_exact",
          oracle=_FISHER_SQL.format(src="documents", seq=_FISHER_SEQ_DUCK),
          tags=("ext", "curation", "stats"))
def ext_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test (Fisher 1935) of the 2x2 table language =
    English x length >= 300 chars: exact hypergeometric tail
    probabilities (left, right, and the two-sided "sum of tables no
    more probable than observed" convention) plus the
    Haldane-corrected odds ratio. The EXACT small-sample member of
    the categorical family — `ext_chi2_independence` is asymptotic
    and its chi-square approximation is untrustworthy exactly where
    curation decisions are hardest (rare languages, rare defect
    classes, expected cells < 5); Fisher conditions on both margins
    and needs no approximation at all.

    Determinism: the log-factorial table lf(i) is an exact integer
    cumulative of PRE-QUANTIZED nano log terms (an ordered integer
    window — no float accumulation), so every candidate table's
    log-probability is exact int64 nano arithmetic; the two-sided
    tie rule compares those INTEGERS (lp(k) <= lp(a)), making the
    table-inclusion set identical in both engines by construction;
    each included exp() is one IEEE call on an identical integer
    ratio (libm agreement per the periodogram precedent),
    pico-quantized before the bounded support sums; margins touching
    0 or n are excluded by integer predicates.

    Scale shape: ONE map-side-combinable corpus reduce for the four
    cells; everything after lives on the bounded support grid
    (<= min(r1, c1) rows) and the 0..100000 integer grid — an exact
    test is BY DESIGN a bounded-count instrument (its grid ceiling is
    the documented contract; at corpus scale the asymptotic siblings
    take over), so no stage scales with the corpus beyond the first
    reduce. The 1-row marginal/observed crosses are allowlisted.

    Reference basis: exact low-count contingency checks between
    configuration flags and rare response classes
    (DAQ_self-triggering.md:84-93); test from Fisher 1935 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fisher_docs")
    return spark.sql(_FISHER_SQL.format(src="fisher_docs",
                                        seq=_FISHER_SEQ_SPARK))


# --------------------------------------------------------------------------
# ext_dagostino_k2 — omnibus normality of the length distribution
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Integer power sums up to x^4
#: run exactly in DECIMAL(38,0) (per-row powers bounded by the char
#: domain stay inside int64; the corpus sums inside 38 digits past
#: 100 TB); every moment, transform and both Z closes are one
#: fixed-order scalar IEEE chain over those exact sums; the signed
#: cube root is an explicit CASE + EXP(LN(|s|)/3) so both engines
#: evaluate the identical call chain.
_DAGOSTINO_SQL = """
WITH q AS (
    SELECT CAST(n_chars AS BIGINT) AS x,
           CAST(n_chars AS BIGINT) * n_chars AS x2,
           CAST(n_chars AS BIGINT) * n_chars * n_chars AS x3,
           CAST(n_chars AS BIGINT) * n_chars * n_chars * n_chars AS x4
    FROM {src}
),
mm AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
           CAST(SUM(CAST(x3 AS DECIMAL(38,0))) AS DOUBLE) AS s3,
           CAST(SUM(CAST(x4 AS DECIMAL(38,0))) AS DOUBLE) AS s4,
           CAST(COUNT(*) AS DECIMAL(38,0)) * SUM(CAST(x2 AS DECIMAL(38,0)))
               - SUM(CAST(x AS DECIMAL(38,0)))
                 * SUM(CAST(x AS DECIMAL(38,0))) AS var_num
    FROM q
),
c AS (
    SELECT n,
           s2 / n - (s1 / n) * (s1 / n) AS m2,
           s3 / n - 3e0 * (s1 / n) * (s2 / n)
               + 2e0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
           s4 / n - 4e0 * (s1 / n) * (s3 / n)
               + 6e0 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3e0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
    FROM mm
    WHERE n >= 20 AND var_num > 0
),
g AS (
    SELECT n,
           m3 / (m2 * SQRT(m2)) AS g1,
           m4 / (m2 * m2) AS b2
    FROM c
),
z1 AS (
    SELECT n, g1, b2,
           g1 * SQRT((n + 1e0) * (n + 3e0) / (6e0 * (n - 2e0))) AS y,
           3e0 * (n * 1e0 * n + 27e0 * n - 70e0) * (n + 1e0) * (n + 3e0)
               / ((n - 2e0) * (n + 5e0) * (n + 7e0) * (n + 9e0)) AS beta2
    FROM g
),
z1b AS (
    SELECT n, g1, b2, y,
           SQRT(2e0 * (beta2 - 1e0)) - 1e0 AS w2
    FROM z1
),
z1c AS (
    SELECT n, g1, b2,
           (1e0 / SQRT(LN(SQRT(w2))))
           * LN(y / SQRT(2e0 / (w2 - 1e0))
                + SQRT((y / SQRT(2e0 / (w2 - 1e0)))
                       * (y / SQRT(2e0 / (w2 - 1e0))) + 1e0)) AS zs
    FROM z1b
    WHERE w2 > 1e0 AND LN(SQRT(w2)) > 0e0
),
z2a AS (
    SELECT n, g1, b2, zs,
           (b2 - 3e0 * (n - 1e0) / (n + 1e0))
           / SQRT(24e0 * n * (n - 2e0) * (n - 3e0)
                  / ((n + 1e0) * (n + 1e0) * (n + 3e0) * (n + 5e0))) AS x,
           6e0 * (n * 1e0 * n - 5e0 * n + 2e0) / ((n + 7e0) * (n + 9e0))
           * SQRT(6e0 * (n + 3e0) * (n + 5e0)
                  / (n * 1e0 * (n - 2e0) * (n - 3e0))) AS sb1
    FROM z1c
),
z2b AS (
    SELECT n, g1, b2, zs, x,
           6e0 + 8e0 / sb1 * (2e0 / sb1 + SQRT(1e0 + 4e0 / (sb1 * sb1)))
               AS aa
    FROM z2a
    WHERE sb1 > 0e0
),
z2c AS (
    SELECT n, g1, b2, zs,
           (1e0 - 2e0 / (9e0 * aa)
            - CASE WHEN (1e0 - 2e0 / aa)
                        / (1e0 + x * SQRT(2e0 / (aa - 4e0))) > 0e0
                   THEN EXP(LN((1e0 - 2e0 / aa)
                               / (1e0 + x * SQRT(2e0 / (aa - 4e0)))) / 3e0)
                   WHEN (1e0 - 2e0 / aa)
                        / (1e0 + x * SQRT(2e0 / (aa - 4e0))) < 0e0
                   THEN -EXP(LN(-((1e0 - 2e0 / aa)
                               / (1e0 + x * SQRT(2e0 / (aa - 4e0)))))
                             / 3e0)
                   ELSE 0e0 END)
           / SQRT(2e0 / (9e0 * aa)) AS zk
    FROM z2b
    WHERE aa > 4e0 AND 1e0 + x * SQRT(2e0 / (aa - 4e0)) <> 0e0
)
SELECT n AS n_rows,
       CAST(FLOOR(g1 * 1e6 + 5e-1) AS BIGINT) AS skew_micro,
       CAST(FLOOR(b2 * 1e6 + 5e-1) AS BIGINT) AS kurtosis_micro,
       CAST(FLOOR(zs * 1e3 + 5e-1) AS BIGINT) AS z_skew_milli,
       CAST(FLOOR(zk * 1e3 + 5e-1) AS BIGINT) AS z_kurt_milli,
       CAST(FLOOR((zs * zs + zk * zk) * 1e3 + 5e-1) AS BIGINT)
           AS k2_milli
FROM z2c
"""


@register("ext_dagostino_k2",
          oracle=_DAGOSTINO_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino's K-squared omnibus normality test (D'Agostino 1970;
    D'Agostino, Belanger & D'Agostino 1990) on document length: the
    skewness transform Z(sqrt(b1)) (Johnson SU normalization), the
    Anscombe-Glynn kurtosis transform Z(b2) (Wilson-Hilferty cube
    root), and K2 = Z1^2 + Z2^2 ~ chi2(2). The NORMALITY GATE the
    parametric family keeps assuming — `agg_welch_ttest`,
    `agg_anova_oneway`, `ext_bartlett_test` are all exact only under
    near-normal cohorts, and `ext_jarque_bera` (shipped round 12) is
    the large-n moment version; K2 is the finite-n calibrated one the
    biostatistics literature prefers, so the pair brackets the
    decision at both sample-size regimes.

    Determinism: per-row integer powers to x^4 stay inside int64 on
    the bounded char domain and sum EXACTLY in DECIMAL(38,0); the
    positive-variance gate is an INTEGER DECIMAL predicate (n*S2 -
    S1^2 > 0); every transform is one fixed-order scalar IEEE chain
    over the exact sums, and the signed cube root is an explicit CASE
    + EXP(LN(|s|)/3) so both engines execute the identical libm call
    sequence (periodogram precedent); domain guards (w2 > 1, A > 4,
    nonzero denominator) are evaluated on the same deterministic
    doubles in both engines; outputs milli/micro-quantized.

    Scale shape: one row-local power pass + ONE map-side-combinable
    corpus reduce (four sums) + a 1-row scalar chain — the optimal
    100 TB shape; single-column parquet scan.

    Reference basis: normality screening of per-channel response
    residuals before parametric fits (DAQ_self-triggering.md:84-93);
    transforms from D'Agostino 1970 and Anscombe & Glynn 1983
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("dk2_docs")
    return spark.sql(_DAGOSTINO_SQL.format(src="dk2_docs"))


# --------------------------------------------------------------------------
# ext_anderson_darling — tail-weighted two-sample distribution test
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The grouped-by-value ECDF
#: frame of the CvM/KS/Kuiper family: cumulative integer counts on the
#: bounded char domain; each block's quadratic term uses an EXACT
#: integer difference d = N*M_j - m*B_j (|d| <= N*m keeps d^2 exactly
#: representable at design scale) and quantizes to milli per block
#: BEFORE the unordered sum; the close is one IEEE chain.
_AD_SQL = """
WITH t AS (
    SELECT n_chars AS v,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS l1,
           CAST(COUNT(*) AS BIGINT) AS l
    FROM {src} GROUP BY n_chars
),
c AS (
    SELECT v, l1, l,
           CAST(SUM(l) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS b,
           CAST(SUM(l1) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS m1c
    FROM t
),
tot AS (
    SELECT CAST(SUM(l) AS BIGINT) AS n, CAST(SUM(l1) AS BIGINT) AS m1
    FROM t
),
s AS (
    SELECT t2.n, t2.m1,
           CAST(SUM(CAST(FLOOR(
                c.l * (CAST(t2.n * c.m1c - t2.m1 * c.b AS DOUBLE)
                       * (t2.n * c.m1c - t2.m1 * c.b))
                / (c.b * 1e0 * (t2.n - c.b)) * 1e3 + 5e-1)
                AS BIGINT)) AS BIGINT) AS inner_milli
    FROM c CROSS JOIN tot t2
    WHERE c.b < t2.n
    GROUP BY t2.n, t2.m1
)
SELECT m1 AS n_en, n - m1 AS n_rest,
       CAST(FLOOR((1e0 / m1 + 1e0 / (n - m1)) / n
                  * (inner_milli / 1e3) * 1e6 + 5e-1) AS BIGINT)
           AS a2_micro,
       CAST(1 AS BIGINT) AS h0_mean
FROM s
WHERE m1 > 0 AND m1 < n
"""


@register("ext_anderson_darling",
          oracle=_AD_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic (Anderson & Darling 1952;
    discrete-data k-sample form of Scholz & Stephens 1987 at k = 2)
    comparing English vs non-English document length: A2 = (1/n1 +
    1/n2) * (1/N) * sum_j l_j (N M_j - n1 B_j)^2 / (B_j (N - B_j)),
    with E[A2] = k - 1 = 1 under H0. The TAIL-WEIGHTED member of the
    ECDF-distance family: KS (`ext_drift_ks`) sees only the single
    largest gap, CvM (`ext_cvm_two_sample`) integrates it uniformly,
    Kuiper symmetrizes rotations — AD divides by B(N-B), which blows
    up the weight exactly where distributions differ most stealthily
    (the tails), making it the standard screen for tail-shifted
    length distributions that pass a KS check.

    Determinism: the grouped-by-value frame makes every cumulative an
    exact integer on the bounded char domain (both groups' deviations
    collapse to ONE integer d = N*M_j - n1*B_j, since the group-2
    deviation is exactly -d); d is cast to double for its square
    (exactly representable at design scale), each block term
    milli-quantizes BEFORE the unordered sum, and the close is one
    fixed-order IEEE chain, micro-quantized; degenerate one-group
    corpora are excluded on integers.

    Scale shape: ONE map-side-combinable groupBy(value) reduce; the
    cumulative window runs on the bounded value DOMAIN (the rank-test
    bound — see `ext_cvm_two_sample`; past the domain ceiling swap in
    `ext_token_weighted_resample`'s range-bucketed two-level prefix
    sum); a 1-row scalar cross closes (allowlisted).

    Reference basis: full-distribution comparison of per-channel
    response spectra with tail emphasis (DAQ_self-triggering.md:
    91-93); statistic from Anderson & Darling 1952 / Scholz &
    Stephens 1987 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ad_docs")
    return spark.sql(_AD_SQL.format(src="ad_docs"))


# --------------------------------------------------------------------------
# ext_ansari_bradley — rank test for a pure SCALE difference
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Ansari-Bradley scores
#: min(r, N+1-r) summed per tie block in CLOSED FORM (arithmetic and
#: square-pyramidal series over the block's rank range, doubled to
#: stay integer); midrank tie handling averages the block score over
#: its l_j positions; the exact finite-population moments come from
#: the same closed-form block sums, so E and Var need no N-row
#: expansion anywhere.
_ANSARI_SQL = """
WITH t AS (
    SELECT n_chars AS v,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS l1,
           CAST(COUNT(*) AS BIGINT) AS l
    FROM {src} GROUP BY n_chars
),
c AS (
    SELECT v, l1, l,
           CAST(SUM(l) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS b
    FROM t
),
tot AS (SELECT CAST(SUM(l) AS BIGINT) AS n, CAST(SUM(l1) AS BIGINT) AS m1
        FROM t),
blk AS (
    SELECT c.l1, c.l, t2.n, t2.m1,
           c.b - c.l + 1 AS a, c.b,
           CAST(FLOOR((t2.n + 1e0) / 2e0) AS BIGINT) AS fl
    FROM c CROSS JOIN tot t2
),
sc AS (
    SELECT l1, l, n, m1,
           (CASE WHEN a <= (CASE WHEN b < fl THEN b ELSE fl END)
                 THEN (a + (CASE WHEN b < fl THEN b ELSE fl END))
                      * ((CASE WHEN b < fl THEN b ELSE fl END) - a + 1)
                 ELSE 0 END)
           + (CASE WHEN b >= fl + 1
                   THEN 2 * (n + 1)
                        * (b - (CASE WHEN a > fl + 1 THEN a
                                     ELSE fl + 1 END) + 1)
                        - ((CASE WHEN a > fl + 1 THEN a ELSE fl + 1 END)
                           + b)
                          * (b - (CASE WHEN a > fl + 1 THEN a
                                       ELSE fl + 1 END) + 1)
                   ELSE 0 END) AS s2
    FROM blk
),
agg AS (
    SELECT n, m1,
           CAST(SUM(CAST(FLOOR(l1 * (s2 * 1e0 / l) * 1e3 + 5e-1)
                         AS BIGINT)) AS BIGINT) AS t2_milli,
           CAST(SUM(s2) AS BIGINT) AS stot2,
           CAST(SUM(CAST(FLOOR(l * (s2 * 1e0 / l) * (s2 * 1e0 / l) * 1e3
                               + 5e-1) AS BIGINT)) AS BIGINT)
               AS ssq_milli
    FROM sc
    GROUP BY n, m1
)
SELECT m1 AS n_en, n - m1 AS n_rest, t2_milli AS ab2_milli,
       CAST(FLOOR(m1 * 1e0 * stot2 / n * 1e3 + 5e-1) AS BIGINT)
           AS e2_milli,
       CAST(FLOOR((t2_milli / 1e3 - m1 * 1e0 * stot2 / n)
                  / SQRT(m1 * 1e0 * (n - m1)
                         * (n * (ssq_milli / 1e3) - stot2 * 1e0 * stot2)
                         / (n * 1e0 * n * (n - 1e0)))
                  * 1e3 + 5e-1) AS BIGINT) AS z_milli
FROM agg
WHERE m1 > 0 AND m1 < n
  AND n * (ssq_milli / 1e3) - stot2 * 1e0 * stot2 > 0
"""


@register("ext_ansari_bradley",
          oracle=_ANSARI_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley test (Ansari & Bradley 1960) for a pure SCALE
    difference between English and non-English document length:
    scores min(r, N+1-r) rank from both ends inward, so a group
    concentrated in the middle (small dispersion) collects high
    scores and a group pushed to both tails collects low ones —
    location-free evidence about VARIANCE. Completes the dispersion
    family on the rank axis: `ext_bartlett_test` is parametric,
    `ext_brown_forsythe` / `ext_levene_mean` are
    deviation-from-center F tests, `ext_conover_squared_ranks` ranks
    absolute deviations — AB needs no center estimate at all (its
    classical assumption of equal medians is stated, and checkable,
    via `ext_mood_median` on the same columns).

    Determinism: tie blocks on the bounded char domain contribute
    their score mass in CLOSED FORM (doubled scores keep the
    arithmetic-series block sums exact int64); midrank handling
    divides each block's mass over its positions with per-block milli
    quantization BEFORE the unordered sums; the exact
    finite-population moments E[T] and Var[T] (weighted-item WOR
    identities over the same block sums) and the z close are one
    fixed-order IEEE chain; degeneracy guards on integer margins and
    the integer-milli variance numerator.

    Scale shape: ONE map-side-combinable groupBy(value) reduce; the
    cumulative window runs on the bounded value DOMAIN (rank-test
    bound, `ext_cvm_two_sample` lowering applies); closed-form block
    sums mean NO position-level expansion ever happens; 1-row scalar
    crosses allowlisted.

    Reference basis: dispersion comparison between per-configuration
    response spreads (DAQ_self-triggering.md:84-93); test from
    Ansari & Bradley 1960 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ansari_docs")
    return spark.sql(_ANSARI_SQL.format(src="ansari_docs"))


# --------------------------------------------------------------------------
# ext_conover_squared_ranks — k-sample rank test for variance equality
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Per-language lower medians
#: from the cumulative-count identity (2*cum >= n_g) on the bounded
#: value domain; absolute deviations are exact integers; pooled
#: DOUBLED midranks (2*B_prev + l + 1) make every squared rank and
#: fourth power exact (DECIMAL(38,0) carries them), and Conover's T
#: closes as one IEEE chain over the exact sums (the 4x/16x doubling
#: factors cancel between numerator and D^2).
_CONOVER_SQL = """
WITH lv AS (
    SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cl
    FROM {src} GROUP BY lang, n_chars
),
cum AS (
    SELECT lang, v, cl,
           CAST(SUM(cl) OVER (PARTITION BY lang ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cc
    FROM lv
),
gn AS (SELECT lang, CAST(SUM(cl) AS BIGINT) AS ng FROM lv GROUP BY lang),
med AS (
    SELECT c.lang, MIN(c.v) AS med
    FROM cum c JOIN gn ON c.lang = gn.lang
    WHERE 2 * c.cc >= gn.ng
    GROUP BY c.lang
),
dev AS (
    SELECT lv.lang, ABS(lv.v - med.med) AS u, CAST(SUM(lv.cl) AS BIGINT)
               AS cl
    FROM lv JOIN med ON lv.lang = med.lang
    GROUP BY lv.lang, ABS(lv.v - med.med)
),
du AS (
    SELECT u, CAST(SUM(cl) AS BIGINT) AS l FROM dev GROUP BY u
),
mr AS (
    SELECT u, l,
           2 * (CAST(SUM(l) OVER (ORDER BY u
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) - l) + l + 1 AS mr2
    FROM du
),
sg AS (
    SELECT d.lang, gn.ng,
           CAST(SUM(CAST(d.cl AS DECIMAL(38,0)) * mr.mr2 * mr.mr2)
                AS DOUBLE) AS s4
    FROM dev d JOIN mr ON d.u = mr.u JOIN gn ON d.lang = gn.lang
    GROUP BY d.lang, gn.ng
),
pool AS (
    SELECT CAST(SUM(l) AS BIGINT) AS n,
           CAST(SUM(CAST(l AS DECIMAL(38,0)) * mr2 * mr2) AS DOUBLE)
               AS stot4,
           CAST(SUM(CAST(l AS DECIMAL(38,0)) * mr2 * mr2 * mr2 * mr2)
                AS DOUBLE) AS s16
    FROM mr
),
num AS (
    SELECT p.n, CAST(COUNT(*) AS BIGINT) AS k,
           SUM(sg.s4 * sg.s4 / sg.ng) AS ssn, ANY_VALUE(p.stot4) AS stot4,
           ANY_VALUE(p.s16) AS s16
    FROM sg CROSS JOIN pool p
    GROUP BY p.n
)
SELECT k AS n_groups, n AS n_rows, k - 1 AS df,
       CAST(FLOOR((ssn - n * (stot4 / n) * (stot4 / n))
                  / ((s16 - n * (stot4 / n) * (stot4 / n)) / (n - 1e0))
                  * 1e3 + 5e-1) AS BIGINT) AS t_milli
FROM num
WHERE n > 1 AND s16 - n * (stot4 / n) * (stot4 / n) > 0
"""


@register("ext_conover_squared_ranks",
          oracle=_CONOVER_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover's squared-ranks test (Conover & Iman 1978; Conover,
    Practical Nonparametric Statistics) for variance equality across
    the k = 5 language cohorts: rank the pooled absolute deviations
    |x - median_g|, square the (mid)ranks, and compare per-group
    squared-rank sums — T = (sum_g S_g^2/n_g - N sbar^2) / D^2 ~
    chi2(k-1). The k-SAMPLE rank member of the dispersion family
    (`ext_ansari_bradley` is the two-sample pure-rank test;
    `ext_brown_forsythe` is its moment-based F cousin): squaring the
    ranks restores sensitivity to LARGE deviations that plain rank
    tests flatten, while staying distribution-free — the recommended
    variance screen when lengths are heavy-tailed enough to invalidate
    Bartlett.

    Determinism: per-language lower medians come from the integer
    cumulative identity (2*cum >= n_g, value ties resolved by MIN);
    absolute deviations are exact integers; DOUBLED pooled midranks
    (2*B_prev + l + 1) keep every squared rank and fourth power an
    exact integer carried in DECIMAL(38,0) (the 4x numerator and 16x
    fourth-moment scalings cancel in T); the close is one fixed-order
    IEEE chain over exact sums, milli-quantized; flat-pool degeneracy
    guards on the deterministic variance expression.

    Scale shape: ONE groupBy(lang, value) reduce; medians, deviations,
    midranks and all moments live on the bounded (k x value-domain)
    grid — the rank-test domain bound (`ext_cvm_two_sample`), with the
    range-bucketed prefix-sum lowering as the wide-domain swap-in; the
    1-row pool cross is allowlisted.

    Reference basis: spread homogeneity of per-channel deviation
    distributions across operating groups (DAQ_self-triggering.md:
    84-93); test from Conover & Iman 1978 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("conover_docs")
    return spark.sql(_CONOVER_SQL.format(src="conover_docs"))


# --------------------------------------------------------------------------
# round-12 third wave — serial-correlation / stationarity closes on the
# calendar-bounded daily order series (the day-table family of
# `ext_durbin_watson` / `ext_pettitt_test`)
# --------------------------------------------------------------------------

#: shared body ({src} = orders view, {day} = engine epoch-day). Daily
#: counts are exact integers; the pairing is pure integer position
#: algebra (ROW_NUMBER over the bounded day table); the only IEEE op
#: is the final z close, micro-quantized.
_COXSTUART_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
pos AS (
    SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, c FROM day
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pos),
pr AS (
    SELECT a.c AS c1, b.c AS c2
    FROM pos a JOIN pos b
      ON b.i = a.i + (SELECT CAST(FLOOR((n + 1) / 2e0) AS BIGINT) FROM nn)
    WHERE a.i <= (SELECT CAST(FLOOR(n / 2e0) AS BIGINT) FROM nn)
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
           CAST(SUM(CASE WHEN c2 <> c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_eff
    FROM pr
)
SELECT (SELECT n FROM nn) AS n_days, n_pairs, n_eff, s_plus,
       CAST(FLOOR((2e0 * s_plus - n_eff) / sqrt(n_eff * 1e0) * 1e6 + 5e-1)
            AS BIGINT) AS z_micro
FROM s WHERE n_eff > 0
"""


@register("ext_cox_stuart",
          oracle=_COXSTUART_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test (Cox & Stuart 1955) on the daily order
    count series: pair day i with day i + ceil(n/2) (the middle
    observation of an odd-length series is dropped), count positive
    differences among the non-tied pairs, and read S+ against
    Binomial(n', 1/2) via the normal approximation z =
    (2S+ - n')/sqrt(n'). The magnitude-free member of the trend
    family: `win_theil_sen` estimates the slope, `agg_mann_kendall_trend`
    ranks all pairs, Cox-Stuart answers the monotone-trend question
    with HALF the pairs and NO ranking at all — the cheapest trend
    screen, robust to any monotone transformation of the counts.

    Determinism: daily counts and the half-offset pairing are exact
    integer algebra on ROW_NUMBER positions (unique day keys -> unique
    order both engines); sign/tie censuses are exact int64; the one
    IEEE expression is the final z, micro-quantized from exact
    integers through shared text.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; the
    position window, half-offset self-join and sign census live on
    the bounded (calendar-sized) day table; 1-row count crosses
    (allowlisted).

    Reference basis: monotone drift of the daily trigger-rate series
    under reuse-thresholds (DAQ_self-triggering.md:84-93); test from
    Cox & Stuart 1955 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("coxstuart_orders")
    return spark.sql(
        _COXSTUART_SQL.format(src="coxstuart_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). Doubled
#: grouped-by-value midranks keep every squared difference an exact
#: int64 (the 4x scalings cancel in the ratio); the denominator's mean
#: doubled-rank is EXACTLY n+1 (sum of doubled midranks = n(n+1)); the
#: close is one fixed-order IEEE chain over exact integer sums,
#: micro-quantized.
_BARTELS_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
pos AS (
    SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, c FROM day
),
v AS (
    SELECT c AS val, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY c
),
r AS (
    SELECT val,
           2 * CAST(COALESCE(SUM(cnt) OVER (ORDER BY val
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + cnt + 1 AS r2
    FROM v
),
pr AS (SELECT pos.i, r.r2 FROM pos JOIN r ON pos.c = r.val),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pr),
nm AS (
    SELECT CAST(SUM((a.r2 - b.r2) * (a.r2 - b.r2)) AS BIGINT) AS num
    FROM pr a JOIN pr b ON b.i = a.i + 1
),
dn AS (
    SELECT CAST(SUM((r2 - (SELECT n + 1 FROM nn))
                    * (r2 - (SELECT n + 1 FROM nn))) AS BIGINT) AS den
    FROM pr
)
SELECT (SELECT n FROM nn) AS n_days,
       CAST(FLOOR(num * 1e6 / den + 5e-1) AS BIGINT) AS rvn_micro,
       CAST(FLOOR((num * 1e0 / den - 2e0)
            / sqrt(4e0 * ((SELECT n FROM nn) - 2e0)
                   * (5e0 * (SELECT n FROM nn) * (SELECT n FROM nn)
                      - 2e0 * (SELECT n FROM nn) - 9e0)
                   / (5e0 * (SELECT n FROM nn)
                      * ((SELECT n FROM nn) + 1e0)
                      * ((SELECT n FROM nn) - 1e0)
                      * ((SELECT n FROM nn) - 1e0)))
            * 1e6 + 5e-1) AS BIGINT) AS z_micro
FROM nm, dn WHERE den > 0
"""


@register("ext_bartels_rank",
          oracle=_BARTELS_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank version of von Neumann's ratio (Bartels 1982) on
    the daily order-count series: RVN = Sigma(r_t - r_{t+1})^2 /
    Sigma(r_t - rbar)^2 over the day-order ranks, E[RVN] = 2 under
    randomness, RVN < 2 = positive serial dependence. The
    NONPARAMETRIC randomness screen: `win_ljung_box` needs moments,
    `ext_durbin_watson` needs a fitted model — Bartels ranks the raw
    series and is exact under any monotone marginal, the recommended
    first look when daily volumes are heavy-tailed. The z close uses
    Bartels' no-tie asymptotic variance 4(n-2)(5n^2-2n-9)/(5n(n+1)
    (n-1)^2) (documented: midrank ties leave the null variance
    slightly conservative).

    Determinism: doubled grouped-by-value midranks (2*cum + cnt + 1)
    from the value-domain cumulative identity — exact int64, no
    per-row rank shuffle; successive differences pair on ROW_NUMBER
    positions (unique day keys); both sums exact int64 (the doubled
    scaling cancels); mean doubled-rank is the EXACT integer n+1; one
    fixed-order IEEE close, micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; ranks,
    pairs and both sums live on the bounded (calendar-sized) day/value
    tables; 1-row count crosses (allowlisted).

    Reference basis: randomness of the daily rate series between
    threshold reloads (DAQ_self-triggering.md:84-93); statistic from
    Bartels 1982, JASA 77:40-46 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("bartels_orders")
    return spark.sql(
        _BARTELS_SQL.format(src="bartels_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). The
#: n-scaled demeaned series u_t = n*c_t - sum(c) is exact int64, so
#: partial sums, their squares and all five autocovariance products
#: are exact DECIMAL(38,0); the Bartlett weights (5-l)/5 clear
#: denominators into the all-integer 5*num / n*(5*g0 + 2*sum((5-l)g_l))
#: form — the statistic is ONE exact-integer ratio, micro-quantized
#: in a single IEEE division.
_KPSS_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc
       FROM day),
pos AS (
    SELECT ROW_NUMBER() OVER (ORDER BY d) AS i,
           CAST((SELECT n FROM mo) * c - (SELECT sc FROM mo) AS BIGINT) AS u
    FROM day
),
ps AS (
    SELECT i, u,
           CAST(SUM(u) OVER (ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS s
    FROM pos
),
num AS (SELECT CAST(SUM(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS ss
        FROM ps),
lags AS (SELECT CAST(l AS BIGINT) AS l
         FROM (VALUES (0), (1), (2), (3), (4)) t(l)),
gam AS (
    SELECT lags.l,
           CAST(SUM(CAST(a.u AS DECIMAL(38,0)) * b.u) AS DECIMAL(38,0)) AS gl
    FROM lags CROSS JOIN ps a JOIN ps b ON b.i = a.i - lags.l
    GROUP BY lags.l
),
den AS (
    SELECT CAST((SELECT n FROM mo) AS DECIMAL(38,0))
           * CAST(SUM(CASE WHEN l = 0 THEN 5 * gl
                           ELSE 2 * (5 - l) * gl END) AS DECIMAL(38,0)) AS dv
    FROM gam
)
SELECT (SELECT n FROM mo) AS n_days,
       CAST(FLOOR(5e0 * CAST(ss AS DOUBLE) / CAST(dv AS DOUBLE) * 1e6 + 5e-1)
            AS BIGINT) AS kpss_micro
FROM num, den WHERE dv > 0
"""


@register("ext_kpss_test",
          oracle=_KPSS_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_kpss_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (Kwiatkowski, Phillips,
    Schmidt & Shin 1992) on the daily order-count series: eta =
    n^-2 Sigma_t S_t^2 / sigma^2_lr with S_t the partial sums of the
    demeaned counts and sigma^2_lr the Bartlett-kernel long-run
    variance at the PINNED bandwidth l = 4 (documented; the
    Newey-West automatic bandwidth is a deployment knob). The
    null-reversed twin of `win_unit_root_adf`: ADF's null is a unit
    root, KPSS's null is stationarity — agreement of the two (reject
    one, not the other) is the standard two-sided evidence reading,
    which is why both belong in the registry.

    Determinism: u_t = n*c_t - sum(c) clears the mean's denominator
    into exact int64; partial sums stay int64; squared partial sums
    and the five lag-l autocovariances are exact DECIMAL(38,0)
    products; the Bartlett weights (5-l)/5 clear into integers, so
    KPSS = 5*num / (n * (5*g0 + 2*sum((5-l) g_l))) is a ratio of two
    exact integers — ONE IEEE division, micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    partial-sum window, 5-row lag grid and all products live on the
    bounded (calendar-sized) day table (bounded literal-grid cross,
    allowlisted); u_t magnitudes are n*max-daily-count (~2400 * 6e7
    at 100 TB = 1.4e11, partial-sum squares ~1e29 against the
    DECIMAL(38,0) ceiling — 1e9 headroom).

    Reference basis: is the inter-reload rate series stationary
    around its level — the premise behind reusing thresholds
    (DAQ_self-triggering.md:84-93); statistic from KPSS 1992,
    J. Econometrics 54:159-178 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("kpss_orders")
    return spark.sql(
        _KPSS_SQL.format(src="kpss_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). The
#: trend-fit frame is `ext_durbin_watson`'s verbatim (exact int64
#: moments, one fixed-order IEEE coefficient close, milli-quantized
#: residuals); the lag-1 auxiliary-regression moments are exact
#: DECIMAL(38,0); variance guards are exact integer predicates; the
#: R^2 close is one fixed-order IEEE chain over the three pairwise
#: correlations.
_BG_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 2 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
e AS (
    SELECT day.d,
           CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                       - cf.b * day.d) * 1e3 + 5e-1) AS BIGINT) AS em
    FROM day CROSS JOIN cf
),
p AS (
    SELECT a.em AS ev, b.em AS el, a.d AS t
    FROM e a JOIN e b ON b.d = a.d - 1
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n1,
           CAST(SUM(ev) AS DECIMAL(38,0)) AS se,
           CAST(SUM(el) AS DECIMAL(38,0)) AS sl,
           CAST(SUM(t) AS DECIMAL(38,0)) AS st,
           CAST(SUM(CAST(ev AS DECIMAL(38,0)) * ev) AS DECIMAL(38,0)) AS see,
           CAST(SUM(CAST(el AS DECIMAL(38,0)) * el) AS DECIMAL(38,0)) AS sll,
           CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS stt,
           CAST(SUM(CAST(ev AS DECIMAL(38,0)) * el) AS DECIMAL(38,0)) AS sel,
           CAST(SUM(CAST(ev AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS ste,
           CAST(SUM(CAST(el AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS slt
    FROM p
),
cl AS (
    SELECT n1,
           CAST(n1 AS DOUBLE) * CAST(see AS DOUBLE)
               - CAST(se AS DOUBLE) * CAST(se AS DOUBLE) AS cee,
           CAST(n1 AS DOUBLE) * CAST(sll AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) AS cll,
           CAST(n1 AS DOUBLE) * CAST(stt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS ctt,
           CAST(n1 AS DOUBLE) * CAST(sel AS DOUBLE)
               - CAST(se AS DOUBLE) * CAST(sl AS DOUBLE) AS cel,
           CAST(n1 AS DOUBLE) * CAST(ste AS DOUBLE)
               - CAST(se AS DOUBLE) * CAST(st AS DOUBLE) AS cet,
           CAST(n1 AS DOUBLE) * CAST(slt AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(st AS DOUBLE) AS clt
    FROM m
    WHERE CAST(n1 AS DECIMAL(38,0)) * see - se * se > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sll - sl * sl > 0
      AND CAST(n1 AS DECIMAL(38,0)) * stt - st * st > 0
),
r2 AS (
    SELECT n1,
           (cet / sqrt(ctt * cee) * (cet / sqrt(ctt * cee))
            + cel / sqrt(cll * cee) * (cel / sqrt(cll * cee))
            - 2e0 * (cet / sqrt(ctt * cee)) * (cel / sqrt(cll * cee))
                  * (clt / sqrt(ctt * cll)))
           / (1e0 - (clt / sqrt(ctt * cll)) * (clt / sqrt(ctt * cll))) AS rsq
    FROM cl
    WHERE ctt * cll - clt * clt > 0
)
SELECT n1 AS n_used,
       CAST(FLOOR(rsq * 1e9 + 5e-1) AS BIGINT) AS r2_nano,
       CAST(FLOOR(n1 * rsq * 1e6 + 5e-1) AS BIGINT) AS lm_micro
FROM r2 WHERE rsq >= 0e0
"""


@register("ext_breusch_godfrey",
          oracle=_BG_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_breusch_godfrey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Godfrey LM test (Breusch 1978; Godfrey 1978), order 1,
    on the residuals of the daily-order-count trend fit: regress e_t
    on (1, t, e_{t-1}) over the consecutive-day pairs and read
    LM = n'R^2 against chi2(1). The MODEL-AWARE serial-correlation
    gate: `ext_durbin_watson` is biased toward 2 when the regression
    carries lagged structure and has an inconclusive band; BG's
    auxiliary-regression form stays valid with lagged regressors and
    extends to any order — the test the econometrics literature
    recommends OVER DW for model residuals. R^2 closes from the three
    pairwise correlations: (r_et^2 + r_el^2 - 2 r_et r_el r_tl) /
    (1 - r_tl^2).

    Determinism: the trend frame is `ext_durbin_watson`'s verbatim
    (exact int64 moments, shared-text IEEE coefficient close, milli
    residuals exact int64); all nine auxiliary moments are exact
    DECIMAL(38,0); the three variance guards are exact integer
    predicates; the determinant and R^2 guards and close are ONE
    fixed-order IEEE chain over exact sums, nano/micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    residuals, the consecutive-day lag join and all moments live on
    the bounded (calendar-sized) day table; 1-row coefficient/moment
    crosses (allowlisted). Residual milli-magnitudes scale with daily
    counts (~1e9 milli at 100 TB); the DECIMAL(38,0) moment sums hold
    to ~1e15 per-day residuals — 1e6 headroom.

    Reference basis: did the linear rate-drift model leave serially
    correlated residuals — the validity check for reusing fitted
    thresholds (DAQ_self-triggering.md:84-93); test from Breusch 1978
    / Godfrey 1978 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("bg_orders")
    return spark.sql(_BG_SQL.format(src="bg_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day).
#: Residuals quantize RELATIVE to the daily mean (per-mille of
#: sum(c)/n) so their squares are bounded by distributional shape,
#: not corpus size — the moment sums stay inside DECIMAL(38,0) at ANY
#: scale factor; variance guards are exact integer predicates; one
#: fixed-order IEEE correlation close.
_ARCHLM_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 2 AND sc > 0 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
e AS (
    SELECT day.d,
           CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                       - cf.b * day.d) * (cf.n * 1e3) / cf.sc + 5e-1)
                AS BIGINT) AS rm
    FROM day CROSS JOIN cf
),
p AS (
    SELECT a.rm * a.rm AS v, b.rm * b.rm AS vl
    FROM e a JOIN e b ON b.d = a.d - 1
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n1,
           CAST(SUM(v) AS DECIMAL(38,0)) AS sv,
           CAST(SUM(vl) AS DECIMAL(38,0)) AS sl,
           CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS svv,
           CAST(SUM(CAST(vl AS DECIMAL(38,0)) * vl) AS DECIMAL(38,0)) AS sll,
           CAST(SUM(CAST(v AS DECIMAL(38,0)) * vl) AS DECIMAL(38,0)) AS svl
    FROM p
),
r2 AS (
    SELECT n1,
           (CAST(n1 AS DOUBLE) * CAST(svl AS DOUBLE)
             - CAST(sv AS DOUBLE) * CAST(sl AS DOUBLE))
           / sqrt((CAST(n1 AS DOUBLE) * CAST(svv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                  * (CAST(n1 AS DOUBLE) * CAST(sll AS DOUBLE)
                     - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))) AS rho
    FROM m
    WHERE CAST(n1 AS DECIMAL(38,0)) * svv - sv * sv > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sll - sl * sl > 0
)
SELECT n1 AS n_used,
       CAST(FLOOR(rho * rho * 1e9 + 5e-1) AS BIGINT) AS r2_nano,
       CAST(FLOOR(n1 * rho * rho * 1e6 + 5e-1) AS BIGINT) AS lm_micro
FROM r2
"""


@register("ext_engle_arch_lm",
          oracle=_ARCHLM_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_engle_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH LM test (Engle 1982), order 1, on the daily
    order-count trend residuals: regress e_t^2 on (1, e_{t-1}^2) over
    consecutive-day pairs, LM = n'R^2 ~ chi2(1) under homoskedastic
    residuals. The VOLATILITY-clustering gate that closes the
    conditional-variance family: `win_garch_volatility` FITS the
    GARCH recursion, `win_bollinger_bands` monitors rolling sigma —
    ARCH LM answers whether conditional heteroskedasticity exists AT
    ALL (the test one runs before paying for a GARCH fit; its
    rejection is the precondition the GARCH query assumes).

    Determinism: residuals quantize RELATIVE to the daily mean
    (per-mille of sc/n) through the shared expression text — exact
    int64 whose magnitude is bounded by the series' relative
    variation, NOT its level, so e^2 and all five moment sums stay
    inside DECIMAL(38,0) at any corpus size (the scale-proof twin of
    `ext_breusch_godfrey`'s absolute-milli choice, and LM is
    invariant to the residual scaling); variance guards are exact
    integer predicates; one fixed-order IEEE correlation close,
    nano/micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; squared
    residuals, the consecutive-day lag join and the five moments live
    on the bounded (calendar-sized) day table; 1-row coefficient
    crosses (allowlisted).

    Reference basis: does daily-rate noise cluster (bursts) rather
    than arrive i.i.d. — the variance analogue of the drift question
    (DAQ_self-triggering.md:84-93); test from Engle 1982,
    Econometrica 50:987-1007 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("archlm_orders")
    return spark.sql(
        _ARCHLM_SQL.format(src="archlm_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). Scores
#: w_t = (n*x~_t) * em_t are exact int64 products of the n-scaled
#: centered day index and the milli residual; the five score
#: autocovariances and S_XX are exact DECIMAL(38,0); Bartlett weights
#: clear denominators ((5g0 + 2*sum((5-l)g_l))/5); both standard
#: errors close in one fixed-order IEEE chain, nano-quantized.
_NW_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc, sdc, sdd,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 2 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
sco AS (
    SELECT ROW_NUMBER() OVER (ORDER BY day.d) AS i,
           CAST(cf.n * day.d - cf.sd AS BIGINT)
               * CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                             - cf.b * day.d) * 1e3 + 5e-1) AS BIGINT) AS w
    FROM day CROSS JOIN cf
),
sxx AS (
    SELECT CAST(SUM(CAST(cf.n * day.d - cf.sd AS DECIMAL(38,0))
                    * (cf.n * day.d - cf.sd)) AS DECIMAL(38,0)) AS v,
           CAST(SUM(CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                                - cf.b * day.d) * 1e3 + 5e-1) AS DECIMAL(38,0))
                    * CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                                  - cf.b * day.d) * 1e3 + 5e-1) AS BIGINT))
                AS DECIMAL(38,0)) AS see
    FROM day CROSS JOIN cf
),
lags AS (SELECT CAST(l AS BIGINT) AS l
         FROM (VALUES (0), (1), (2), (3), (4)) t(l)),
gam AS (
    SELECT lags.l,
           CAST(SUM(CAST(x.w AS DECIMAL(38,0)) * y.w) AS DECIMAL(38,0)) AS gl
    FROM lags CROSS JOIN sco x JOIN sco y ON y.i = x.i - lags.l
    GROUP BY lags.l
),
gsum AS (
    SELECT CAST(SUM(CASE WHEN l = 0 THEN 5 * gl
                         ELSE 2 * (5 - l) * gl END) AS DECIMAL(38,0)) AS g5
    FROM gam
)
SELECT cf.n AS n_days,
       CAST(FLOOR(cf.b * 1e9 + 5e-1) AS BIGINT) AS slope_nano,
       CAST(FLOOR(cf.n * sqrt(CAST(sxx.see AS DOUBLE) / 1e6 / (cf.n - 2e0)
                              / CAST(sxx.v AS DOUBLE)) * 1e9 + 5e-1)
            AS BIGINT) AS se_ols_nano,
       CAST(FLOOR(cf.n * sqrt(CAST(gsum.g5 AS DOUBLE) / 5e0)
                  / (1e3 * CAST(sxx.v AS DOUBLE)) * 1e9 + 5e-1)
            AS BIGINT) AS se_nw_nano,
       CAST(FLOOR((cf.n * sqrt(CAST(gsum.g5 AS DOUBLE) / 5e0)
                   / (1e3 * CAST(sxx.v AS DOUBLE)))
                  / (cf.n * sqrt(CAST(sxx.see AS DOUBLE) / 1e6 / (cf.n - 2e0)
                                 / CAST(sxx.v AS DOUBLE))) * 1e3 + 5e-1)
            AS BIGINT) AS ratio_milli
FROM cf, sxx, gsum
WHERE sxx.v > 0 AND sxx.see > 0 AND gsum.g5 > 0
"""


@register("ext_newey_west_slope",
          oracle=_NW_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_newey_west_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West HAC standard error (Newey & West 1987; Bartlett
    kernel, pinned bandwidth l = 4) for the daily-order-count trend
    slope, next to its naive OLS standard error and their ratio. The
    INFERENCE-REPAIR close of the serial-correlation family:
    `ext_durbin_watson` / `ext_breusch_godfrey` DETECT correlated
    residuals; Newey-West is what one then DOES about it — Var(b) =
    sum_l w_l Gamma_l(x~e) / S_xx^2 widens the slope's confidence
    interval to survive the autocorrelation (ratio_milli > 1000 reads
    'the naive CI was too narrow by this factor').

    Determinism: scores w_t = (n*x~_t)*em_t are exact int64 products
    (n-scaled centered index x exact milli residual, both through
    shared text); S_XX, Sigma e^2 and the five score autocovariances
    are exact DECIMAL(38,0); Bartlett weights (5-l)/5 clear into the
    integer combination (5g0 + 2 sum (5-l)g_l)/5; both SE closes are
    single fixed-order IEEE chains over exact sums, nano-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce; scores,
    the 5-row lag grid and every sum live on the bounded
    (calendar-sized) day table (bounded literal-grid cross,
    allowlisted). Score magnitudes reach (n*x~)*em ~ 2.9e6 * 1e9 ~
    3e15 at 100 TB; their squared sums ~2e34 against the
    DECIMAL(38,0) ceiling — 1e4 headroom, documented.

    Reference basis: honest uncertainty on the fitted rate-drift
    slope when residuals persist (DAQ_self-triggering.md:84-93);
    estimator from Newey & West 1987, Econometrica 55:703-708
    (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("nw_orders")
    return spark.sql(_NW_SQL.format(src="nw_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). The
#: split is integer position algebra; per-segment and pooled moments
#: are exact int64/DECIMAL(38,0); each RSS closes in one fixed-order
#: IEEE expression from exact sums; nonsingular guards are exact
#: integer predicates.
_CHOW_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM day),
pos AS (
    SELECT CASE WHEN ROW_NUMBER() OVER (ORDER BY d)
                     <= (SELECT CAST(FLOOR(n / 2e0) AS BIGINT) FROM nn)
                THEN 1 ELSE 2 END AS g, d, c
    FROM day
),
m AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd,
           CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS scc
    FROM pos GROUP BY g
),
mp AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS ng, CAST(SUM(sd) AS BIGINT) AS sd,
           CAST(SUM(sc) AS BIGINT) AS sc, CAST(SUM(sdc) AS BIGINT) AS sdc,
           CAST(SUM(sdd) AS BIGINT) AS sdd,
           CAST(SUM(scc) AS DECIMAL(38,0)) AS scc
    FROM m
),
rs AS (
    SELECT g, ng,
           (CAST(scc AS DOUBLE) - sc * 1e0 * sc / ng)
           - (sdc * 1e0 - sd * 1e0 * sc / ng)
             * (sdc * 1e0 - sd * 1e0 * sc / ng)
             / (sdd * 1e0 - sd * 1e0 * sd / ng) AS rss
    FROM m
    WHERE ng > 2 AND CAST(ng AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
rp AS (
    SELECT ng,
           (CAST(scc AS DOUBLE) - sc * 1e0 * sc / ng)
           - (sdc * 1e0 - sd * 1e0 * sc / ng)
             * (sdc * 1e0 - sd * 1e0 * sc / ng)
             / (sdd * 1e0 - sd * 1e0 * sd / ng) AS rss
    FROM mp
    WHERE ng > 4 AND CAST(ng AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
agg AS (
    SELECT (SELECT rss FROM rp) AS rssp,
           (SELECT CAST(SUM(rss) AS DOUBLE) FROM rs) AS rsss,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rs) AS nseg,
           (SELECT ng FROM rp) AS n
)
SELECT n AS n_days,
       CAST(FLOOR(rssp * 1e3 + 5e-1) AS BIGINT) AS rss_pooled_milli,
       CAST(FLOOR(rsss * 1e3 + 5e-1) AS BIGINT) AS rss_split_milli,
       CAST(FLOOR(((rssp - rsss) / 2e0) / (rsss / (n - 4e0)) * 1e6 + 5e-1)
            AS BIGINT) AS f_micro
FROM agg WHERE nseg = 2 AND rsss > 0e0
"""


@register("ext_chow_test",
          oracle=_CHOW_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test (Chow 1960) at the mid-sample split
    of the daily order-count trend: fit the linear trend on each half
    and pooled, F = ((RSS_p - RSS_1 - RSS_2)/k) / ((RSS_1 + RSS_2)/
    (n - 2k)) with k = 2 coefficients. The PARAMETRIC complement of
    `ext_pettitt_test`: Pettitt locates an unknown LEVEL changepoint
    nonparametrically; Chow asks whether the TREND LINE ITSELF
    (slope + intercept jointly) changed at a pinned split — the
    regression-regime question Pettitt cannot see (a slope change
    with equal medians) and the one a drift-model owner actually
    audits.

    Determinism: the position split is integer algebra over the
    unique-keyed day table; all per-segment/pooled moments are exact
    int64 (counts, day products) and DECIMAL(38,0) (count squares);
    each RSS = Syy - Sxy^2/Sxx closes in one shared-text fixed-order
    IEEE expression from exact sums; nonsingular-design guards are
    exact integer predicates; milli/micro quantization.

    Scale shape: ONE map-side-combinable groupBy(day) reduce, then a
    3-row moment table (two segments + pooled); 1-row scalar crosses
    (allowlisted). scc ~ 2400 * (6e7)^2 ~ 8.6e18 at 100 TB — inside
    DECIMAL(38,0) with 1e19 headroom.

    Reference basis: did the rate-drift regime change mid-campaign —
    the pinned-split regression-stability audit
    (DAQ_self-triggering.md:84-93); test from Chow 1960, Econometrica
    28:591-605 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("chow_orders")
    return spark.sql(_CHOW_SQL.format(src="chow_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day).
#: Relative per-mille residuals (the `ext_engle_arch_lm` choice — R^2
#: is invariant to residual scaling and the moments stay bounded at
#: any corpus size); regressors are the min-anchored day index and
#: its square, all moments exact DECIMAL(38,0); integer variance
#: guards; one fixed-order IEEE two-regressor R^2 close.
_WHITE_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 2 AND sc > 0 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
p AS (
    SELECT CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                       - cf.b * day.d) * (cf.n * 1e3) / cf.sc + 5e-1)
                AS BIGINT)
           * CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                         - cf.b * day.d) * (cf.n * 1e3) / cf.sc + 5e-1)
                  AS BIGINT) AS v,
           day.d - (SELECT MIN(d) FROM day) AS t
    FROM day CROSS JOIN cf
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n1,
           CAST(SUM(v) AS DECIMAL(38,0)) AS sv,
           CAST(SUM(t) AS DECIMAL(38,0)) AS st,
           CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS sq,
           CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS svv,
           CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t) AS DECIMAL(38,0)) AS stq,
           CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t * t) AS DECIMAL(38,0))
               AS sqq,
           CAST(SUM(CAST(v AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS svt,
           CAST(SUM(CAST(v AS DECIMAL(38,0)) * t * t) AS DECIMAL(38,0)) AS svq
    FROM p
),
cl AS (
    SELECT n1,
           CAST(n1 AS DOUBLE) * CAST(svv AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) AS cvv,
           CAST(n1 AS DOUBLE) * CAST(stq AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sq AS DOUBLE) AS ctq,
           CAST(n1 AS DOUBLE) * CAST(sq AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS ctt,
           CAST(n1 AS DOUBLE) * CAST(sqq AS DOUBLE)
               - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) AS cqq,
           CAST(n1 AS DOUBLE) * CAST(svt AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(st AS DOUBLE) AS cvt,
           CAST(n1 AS DOUBLE) * CAST(svq AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sq AS DOUBLE) AS cvq
    FROM m
    WHERE CAST(n1 AS DECIMAL(38,0)) * svv - sv * sv > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sq - st * st > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sqq - sq * sq > 0
),
r2 AS (
    SELECT n1,
           (cvt / sqrt(ctt * cvv) * (cvt / sqrt(ctt * cvv))
            + cvq / sqrt(cqq * cvv) * (cvq / sqrt(cqq * cvv))
            - 2e0 * (cvt / sqrt(ctt * cvv)) * (cvq / sqrt(cqq * cvv))
                  * (ctq / sqrt(ctt * cqq)))
           / (1e0 - (ctq / sqrt(ctt * cqq)) * (ctq / sqrt(ctt * cqq))) AS rsq
    FROM cl
    WHERE ctt * cqq - ctq * ctq > 0
)
SELECT n1 AS n_days,
       CAST(FLOOR(rsq * 1e9 + 5e-1) AS BIGINT) AS r2_nano,
       CAST(FLOOR(n1 * rsq * 1e6 + 5e-1) AS BIGINT) AS lm_micro
FROM r2 WHERE rsq >= 0e0
"""


@register("ext_white_test",
          oracle=_WHITE_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_white_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White's heteroskedasticity test (White 1980) on the daily
    order-count trend fit: regress the squared residuals on the day
    index and its square (the regressor, its square — White's
    auxiliary set for a single-regressor model), LM = nR^2 ~ chi2(2).
    The UNCONDITIONAL-variance complement of `ext_engle_arch_lm`:
    ARCH asks whether residual variance clusters IN TIME (on its own
    lag); White asks whether it depends ON THE REGRESSOR (variance
    growing with the trend level) — the assumption behind every OLS
    SE downstream, and the diagnostic that decides between
    `ext_newey_west_slope` (autocorrelation) and a
    heteroskedasticity-robust repair.

    Determinism: relative per-mille residuals through shared text
    (exact int64, level-invariant — the `ext_engle_arch_lm`
    discipline; R^2 is invariant to the residual scaling); the day
    index anchors at MIN(d) so its fourth powers stay ~1e13 * n; all
    nine auxiliary moments exact DECIMAL(38,0); integer variance
    guards; the two-regressor R^2 closes in one fixed-order IEEE
    chain, nano/micro-quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    everything downstream lives on the bounded (calendar-sized) day
    table; 1-row coefficient/min-day crosses (allowlisted).

    Reference basis: does rate-noise variance grow with the drift
    level — the level-dependence check before trusting uniform
    thresholds (DAQ_self-triggering.md:84-93); test from White 1980,
    Econometrica 48:817-838 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("white_orders")
    return spark.sql(
        _WHITE_SQL.format(src="white_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = orders view, {day} = engine epoch-day). Daily
#: counts and cent revenues are exact integers; the lag-1 triple
#: joins on ROW_NUMBER positions; all ten moments exact
#: DECIMAL(38,0); integer variance guards; restricted/unrestricted
#: R^2 close in one fixed-order IEEE chain.
_GRANGER_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
                AS BIGINT) AS y
    FROM {src} GROUP BY 1
),
pos AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x, y FROM day),
p AS (
    SELECT a.y AS yv, b.y AS yl, b.x AS xl
    FROM pos a JOIN pos b ON b.i = a.i - 1
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n1,
           CAST(SUM(yv) AS DECIMAL(38,0)) AS sy,
           CAST(SUM(yl) AS DECIMAL(38,0)) AS sl,
           CAST(SUM(xl) AS DECIMAL(38,0)) AS sx,
           CAST(SUM(CAST(yv AS DECIMAL(38,0)) * yv) AS DECIMAL(38,0)) AS syy,
           CAST(SUM(CAST(yl AS DECIMAL(38,0)) * yl) AS DECIMAL(38,0)) AS sll,
           CAST(SUM(CAST(xl AS DECIMAL(38,0)) * xl) AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(CAST(yv AS DECIMAL(38,0)) * yl) AS DECIMAL(38,0)) AS syl,
           CAST(SUM(CAST(yv AS DECIMAL(38,0)) * xl) AS DECIMAL(38,0)) AS syx,
           CAST(SUM(CAST(yl AS DECIMAL(38,0)) * xl) AS DECIMAL(38,0)) AS slx
    FROM p
),
cl AS (
    SELECT n1,
           CAST(n1 AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
           CAST(n1 AS DOUBLE) * CAST(sll AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) AS cll,
           CAST(n1 AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
           CAST(n1 AS DOUBLE) * CAST(syl AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sl AS DOUBLE) AS cyl,
           CAST(n1 AS DOUBLE) * CAST(syx AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sx AS DOUBLE) AS cyx,
           CAST(n1 AS DOUBLE) * CAST(slx AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(sx AS DOUBLE) AS clx
    FROM m
    WHERE CAST(n1 AS DECIMAL(38,0)) * syy - sy * sy > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sll - sl * sl > 0
      AND CAST(n1 AS DECIMAL(38,0)) * sxx - sx * sx > 0
),
r2 AS (
    SELECT n1,
           (cyl / sqrt(cll * cyy)) * (cyl / sqrt(cll * cyy)) AS r2r,
           (cyl / sqrt(cll * cyy) * (cyl / sqrt(cll * cyy))
            + cyx / sqrt(cxx * cyy) * (cyx / sqrt(cxx * cyy))
            - 2e0 * (cyl / sqrt(cll * cyy)) * (cyx / sqrt(cxx * cyy))
                  * (clx / sqrt(cll * cxx)))
           / (1e0 - (clx / sqrt(cll * cxx)) * (clx / sqrt(cll * cxx))) AS r2u
    FROM cl
    WHERE cll * cxx - clx * clx > 0
)
SELECT n1 AS n_used,
       CAST(FLOOR(r2r * 1e9 + 5e-1) AS BIGINT) AS r2_restricted_nano,
       CAST(FLOOR(r2u * 1e9 + 5e-1) AS BIGINT) AS r2_unrestricted_nano,
       CAST(FLOOR((r2u - r2r) * (n1 - 3e0) / (1e0 - r2u) * 1e6 + 5e-1)
            AS BIGINT) AS f_micro
FROM r2 WHERE r2u < 1e0 AND r2u >= r2r
"""


@register("ext_granger_lag1",
          oracle=_GRANGER_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality F test (Granger 1969), lag 1, asking whether
    yesterday's ORDER COUNT improves today's REVENUE forecast beyond
    yesterday's revenue alone: restricted model y_t ~ (1, y_{t-1}),
    unrestricted adds x_{t-1}; F = (R2_u - R2_r)(n-3)/(1 - R2_u) ~
    F(1, n-3). The CROSS-series close of the forecasting family:
    `win_crosscorr_lagged` measures lagged correlation symmetrically,
    `ext_diebold_mariano` compares finished forecasts — Granger asks
    the directional in-between question (does the count series carry
    PREDICTIVE content for revenue) that decides whether a bivariate
    forecaster is worth fitting at all.

    Determinism: daily counts and cent revenues are exact int64; the
    lag-1 triple pairs on ROW_NUMBER positions over unique day keys;
    all ten moments are exact DECIMAL(38,0) sums; variance guards are
    exact integer predicates; both R^2 and the F close are ONE
    fixed-order IEEE chain over the three pairwise correlations
    (the `ext_breusch_godfrey` two-regressor identity), nano/micro-
    quantized.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    everything downstream lives on the bounded (calendar-sized) day
    table; 1-row moment crosses (allowlisted). Daily cent revenue at
    100 TB ~ 9e14; its squared sums ~2e33 — inside DECIMAL(38,0)
    with 1e5 headroom, documented.

    Reference basis: does one stream's rate lead another's — the
    cross-channel trigger-dependence question
    (DAQ_self-triggering.md:84-93); test from Granger 1969,
    Econometrica 37:424-438 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("granger_orders")
    return spark.sql(
        _GRANGER_SQL.format(src="granger_orders", day=_FCAST_DAY_SPARK))


# --------------------------------------------------------------------------
# ext_rbp_eval — rank-biased precision of the cosine retriever
# --------------------------------------------------------------------------

#: RBP persistence weights at p = 4/5: w_k = 0.8^(k-1) * 1e12 =
#: 8^(k-1) * 10^(12-(k-1)) — EXACT integers for k <= 10 (and all
#: divisible by 5), so per-query RBP = (1-p) * sum(rel_k p^(k-1)) =
#: sum(rel_k w_k)/5 is exact integer arithmetic end to end.
_RBP_WEIGHTS = ", ".join(
    f"({k}, {8 ** (k - 1) * 10 ** (12 - (k - 1))})" for k in range(1, 11))

#: the panel / quantized-cosine / deterministic top-10 CTE chain is
#: SHARED BYTE-FOR-BYTE with `_MAP_MRR_SQL` (sliced before the metric
#: close, the `_ERR_SQL` discipline); only the close differs.
_RBP_SQL = _ERR_PREFIX + f""",
wts AS (
    SELECT CAST(k AS BIGINT) AS k, CAST(w AS BIGINT) AS w
    FROM (VALUES {_RBP_WEIGHTS}) t(k, w)
)
SELECT q_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
       CAST(FLOOR(SUM(rel * wts.w) / 5e0 + 5e-1) AS BIGINT) AS rbp_pico
FROM top JOIN wts ON top.rnk = wts.k
GROUP BY q_id
"""


@register("ext_rbp_eval",
          oracle=_RBP_SQL.format(pos=f"({_POS_SQL})"),
          tags=("ext", "similarity", "eval"))
def ext_rbp_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased precision at 10 (Moffat & Zobel, TOIS 2008;
    persistence p = 0.8) of the exact-cosine retriever — the
    USER-MODEL member of the rank-metric family with a geometric
    patience parameter: MRR models a user who stops at the first hit,
    AP assumes the user inspects to every recall point, nDCG picks an
    arbitrary log discount; RBP models a user who continues to the
    next rank with probability p, giving expected precision
    (1-p) sum_k rel_k p^(k-1) — and, unlike AP/nDCG, it needs NO
    knowledge of the total relevant count, so it is stable under
    incomplete judgments (Moffat & Zobel's core argument). Same panel,
    same quantized cosine, same tie-break as the sibling evals.

    Determinism: the ranked-panel CTE chain is shared byte-for-byte
    with `ext_map_mrr_eval`; the weights 0.8^(k-1) * 1e12 =
    8^(k-1) * 10^(13-k) are EXACT int64 literals (pinned in the SQL
    text), each divisible by 5, so rbp_pico = sum(rel_k w_k)/5 is
    exact integer arithmetic — the one IEEE division returns an
    exactly-representable integer.

    Scale shape: identical to `ext_map_mrr_eval` (panel broadcast +
    one map-side reduce); the close joins the bounded top-10 window
    against a 10-row literal weight grid (allowlisted).

    Reference basis: scored candidate ranking against a reference
    signal (DAQ_self-triggering.md:343-346); metric from Moffat &
    Zobel 2008, ACM TOIS 27(1) (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    (emb.select("vec_id", "label",
                F.posexplode("embedding").alias("i0", "v0"))
        .select("vec_id", "label", (F.col("i0") + 1).alias("i"),
                F.col("v0").cast("double").alias("v"))
        .createOrReplaceTempView("rbp_pos"))
    return spark.sql(_RBP_SQL.format(pos="rbp_pos"))


# --------------------------------------------------------------------------
# ext_bpref_eval — judgment-robust binary preference of the retriever
# --------------------------------------------------------------------------

#: same shared prefix; the close counts, for each relevant hit in the
#: top 10, the nonrelevant candidates ranked above it (rnk - cum_rel,
#: an exact integer from the shared window), capped at R and
#: normalized by min(R, N); per-term micro-FLOOR from integer inputs,
#: per-query integer sum, ONE final division (the AP@10 close shape).
_BPREF_SQL = _ERR_PREFIX + """,
ntot AS (
    SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cand FROM cos GROUP BY q_id
),
terms AS (
    SELECT t.q_id,
           CAST(SUM(t.rel) AS BIGINT) AS n_rel_top10,
           CAST(SUM(CASE WHEN t.rel = 1 THEN
                CAST(FLOOR((1e0 - LEAST(t.rnk - t.cum_rel, r.r_corpus) * 1e0
                            / LEAST(r.r_corpus, n.n_cand - r.r_corpus))
                           * 1e6 + 5e-1) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS s_micro,
           ANY_VALUE(r.r_corpus) AS r_corpus
    FROM top t JOIN rtot r ON t.q_id = r.q_id
               JOIN ntot n ON t.q_id = n.q_id
    WHERE r.r_corpus > 0
    GROUP BY t.q_id
)
SELECT q_id, r_corpus, n_rel_top10,
       CAST(FLOOR(s_micro * 1e0
                  / (CASE WHEN r_corpus < 10 THEN r_corpus ELSE 10 END)
                  + 5e-1) AS BIGINT) AS bpref10_micro
FROM terms
"""


@register("ext_bpref_eval",
          oracle=_BPREF_SQL.format(pos=f"({_POS_SQL})"),
          tags=("ext", "similarity", "eval"))
def ext_bpref_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary preference at 10 (Buckley & Voorhees, SIGIR 2004) of the
    exact-cosine retriever: for each relevant hit, score the fraction
    of (capped) nonrelevant candidates NOT ranked above it —
    bpref = (1/R) sum_r (1 - min(#nonrel above r, R)/min(R, N)).
    The INCOMPLETE-JUDGMENT workhorse of the eval family: AP and nDCG
    treat unjudged documents as nonrelevant and collapse when the
    judgment pool thins; bpref only ever compares JUDGED pairs, which
    is why TREC adopted it when pooling depth shrank — the metric one
    trusts when relevance labels come from a sampled audit rather
    than an exhaustive sweep. Top-10 variant (relevant hits beyond 10
    score 0), normalized by min(R, 10) for comparability with the
    AP@10 column; documented.

    Determinism: the ranked-panel CTE chain is shared byte-for-byte
    with `ext_map_mrr_eval`; #nonrel-above = rnk - cum_rel is exact
    integer algebra from the shared window; each term micro-FLOORs
    from integer inputs (one IEEE subtract/divide); per-query sums
    are exact int64 with ONE final division (the AP@10 close shape);
    the R > 0 guard is an integer predicate.

    Scale shape: identical to `ext_map_mrr_eval` (panel broadcast +
    one map-side reduce); the close is bounded 10-row algebra per
    query against two 1-row-per-query count tables.

    Reference basis: scored candidate ranking against a reference
    signal (DAQ_self-triggering.md:343-346); metric from Buckley &
    Voorhees 2004, SIGIR (public)."""
    ensure_deterministic(spark)
    emb = table(spark, sf_dir, "embeddings")
    (emb.select("vec_id", "label",
                F.posexplode("embedding").alias("i0", "v0"))
        .select("vec_id", "label", (F.col("i0") + 1).alias("i"),
                F.col("v0").cast("double").alias("v"))
        .createOrReplaceTempView("bpref_pos"))
    return spark.sql(_BPREF_SQL.format(pos="bpref_pos"))


# --------------------------------------------------------------------------
# ext_spatial_autocorr / ext_getis_ord_hotspots — grid-cell spatial stats
# --------------------------------------------------------------------------

#: shared cell frame ({src} = events view): the deterministic
#: user_id-derived lat/lon of `join_geo_grid_neighbors`, bucketed to
#: the same 0.05-degree grid; per-cell user counts are exact int64;
#: queen (8-neighbor) adjacency is an EQUI-join on shifted integer
#: cell keys crossed with a literal offset grid — the geohash/S2
#: neighbor pattern, never a distance scan.
_SPATIAL_CELL_SQL = """
pts AS (
    SELECT user_id,
           CAST(40 + (user_id % 5) AS DOUBLE)
               + CAST((user_id * 37) % 1000 AS DOUBLE) / 1e4 AS lat,
           CAST(-100 + (user_id % 7) AS DOUBLE)
               + CAST((user_id * 73) % 1000 AS DOUBLE) / 1e4 AS lon
    FROM (SELECT DISTINCT user_id FROM {src})
),
cell AS (
    SELECT CAST(floor(lat / 5e-2) AS BIGINT) AS gy,
           CAST(floor(lon / 5e-2) AS BIGINT) AS gx,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM pts GROUP BY 1, 2
)
"""

#: Moran/Geary close: the n-scaled demeaned cell value u = n*x - sum(x)
#: is exact int64 (the `ext_kpss_test` clearing trick — the n^2 scaling
#: cancels in both ratios); neighbor cross/diff products are exact
#: DECIMAL(38,0); each statistic is one IEEE close over exact sums.
_SPATIAL_AUTOCORR_SQL = "WITH " + _SPATIAL_CELL_SQL + """,
mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
       FROM cell),
u AS (
    SELECT gy, gx,
           CAST((SELECT n FROM mo) * x - (SELECT sx FROM mo) AS BIGINT) AS ux
    FROM cell
),
off AS (SELECT CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx
        FROM (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)) t(dy, dx)),
nbr AS (
    SELECT a.ux AS ua, b.ux AS ub
    FROM u a CROSS JOIN off
    JOIN u b ON b.gy = a.gy + off.dy AND b.gx = a.gx + off.dx
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS w_dir,
           CAST(SUM(CAST(ua AS DECIMAL(38,0)) * ub) AS DECIMAL(38,0))
               AS cross_sum,
           CAST(SUM(CAST(ua - ub AS DECIMAL(38,0)) * (ua - ub))
                AS DECIMAL(38,0)) AS diff_sum
    FROM nbr
),
d AS (SELECT CAST(SUM(CAST(ux AS DECIMAL(38,0)) * ux) AS DECIMAL(38,0))
          AS den FROM u)
SELECT (SELECT n FROM mo) AS n_cells, s.w_dir,
       CAST(FLOOR((SELECT n FROM mo) * 1e0 / s.w_dir
                  * CAST(s.cross_sum AS DOUBLE) / CAST(d.den AS DOUBLE)
                  * 1e6 + 5e-1) AS BIGINT) AS moran_i_micro,
       CAST(FLOOR(((SELECT n FROM mo) - 1e0) / (2e0 * s.w_dir)
                  * CAST(s.diff_sum AS DOUBLE) / CAST(d.den AS DOUBLE)
                  * 1e6 + 5e-1) AS BIGINT) AS geary_c_micro
FROM s, d WHERE d.den > 0 AND s.w_dir > 0
"""


@register("ext_spatial_autocorr",
          oracle=_SPATIAL_AUTOCORR_SQL.format(src="events"),
          tags=("ext", "curation", "geo"))
def ext_spatial_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I (Moran 1950) and Geary's C (Geary 1954) over the
    0.05-degree user-density grid with binary queen (8-neighbor)
    weights — the two canonical spatial-autocorrelation statistics:
    I > 0 / C < 1 reads 'dense cells neighbor dense cells'
    (clustering), I < 0 / C > 1 reads checkerboard dispersion; Moran
    is the global cross-product (covariance-like, dominated by
    deviations from the global mean), Geary the local squared
    difference (Durbin-Watson's spatial sibling, more sensitive to
    LOCAL contrast) — reading both is the standard practice because
    they disagree exactly when a few extreme cells drive the field.
    Same synthetic lat/lon and 0.05-degree bucketing as
    `join_geo_grid_neighbors`, so the adjacency semantics are pinned
    by an existing hash-checked query.

    Determinism: per-cell counts exact int64; u = n*x - sum(x) clears
    the mean exactly (the `ext_kpss_test` trick; the n^2 scaling
    cancels in both ratios); neighbor cross/diff products and the
    denominator are exact DECIMAL(38,0) sums; each statistic is ONE
    fixed-order IEEE close, micro-quantized; guards are integer
    predicates.

    Scale shape: ONE groupBy(cell) reduce over distinct users; queen
    adjacency is an 8-row literal offset cross + integer EQUI-join on
    cell keys (the geohash neighbor pattern — no distance scan, no
    quadratic pair frame); the closes are 1-row crosses
    (allowlisted). At 100 TB the cell table is bounded by the
    occupied-geography grid, not the row count.

    Reference basis: spatial clustering of per-region activity
    densities (DAQ_self-triggering.md:84-93, the per-channel
    neighborhood-uniformity question on a 2D layout); statistics from
    Moran 1950 / Geary 1954 (public)."""
    ensure_deterministic(spark)
    events = table(spark, sf_dir, "events")
    events.createOrReplaceTempView("spatial_events")
    return spark.sql(_SPATIAL_AUTOCORR_SQL.format(src="spatial_events"))


#: Gi* close: z_i = (n*A_i - sx*W_i) / (sqrt(n*sxx - sx^2) *
#: sqrt((n*W_i - W_i^2)/(n-1))) — the n-cleared Getis-Ord Gi* with
#: binary star weights (self included); every input exact int64/
#: DECIMAL, one IEEE chain per cell, deterministic top-5 by
#: (z desc, gy, gx).
_GETIS_SQL = "WITH " + _SPATIAL_CELL_SQL + """,
mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
              CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
       FROM cell),
off AS (SELECT CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx
        FROM (VALUES (0, 0), (-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)) t(dy, dx)),
hood AS (
    SELECT a.gy, a.gx, CAST(COUNT(b.x) AS BIGINT) AS wi,
           CAST(SUM(b.x) AS BIGINT) AS ai
    FROM cell a CROSS JOIN off
    JOIN cell b ON b.gy = a.gy + off.dy AND b.gx = a.gx + off.dx
    GROUP BY a.gy, a.gx
),
z AS (
    SELECT h.gy, h.gx, h.wi, h.ai,
           CAST(FLOOR((mo.n * h.ai - mo.sx * h.wi)
                / (sqrt(mo.n * CAST(mo.sxx AS DOUBLE) - mo.sx * 1e0 * mo.sx)
                   * sqrt((mo.n * h.wi - h.wi * 1e0 * h.wi) / (mo.n - 1e0)))
                * 1e6 + 5e-1) AS BIGINT) AS gi_micro
    FROM hood h CROSS JOIN mo
    WHERE mo.n > h.wi AND mo.n > 1
      AND CAST(mo.n AS DECIMAL(38,0)) * mo.sxx
          - CAST(mo.sx AS DECIMAL(38,0)) * mo.sx > 0
)
SELECT gy, gx, wi, ai, gi_micro
FROM z
ORDER BY gi_micro DESC, gy, gx
LIMIT 5
"""


@register("ext_getis_ord_hotspots",
          oracle=_GETIS_SQL.format(src="events"),
          tags=("ext", "curation", "geo"))
def ext_getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot-spot scores (Getis & Ord 1992; Ord & Getis
    1995) over the 0.05-degree user-density grid — the LOCAL member
    of the spatial family: `ext_spatial_autocorr` returns one global
    clustering verdict; Gi* z-scores each cell's star neighborhood
    (self + queen neighbors) against the global mean, so it NAMES the
    hot spots the global statistic only implies. Emits the top-5
    cells by z with deterministic (z desc, gy, gx) ordering — the
    'where do users actually concentrate' readout that drives
    region-targeted sampling.

    Determinism: the z numerator n*A_i - sx*W_i is exact integer
    algebra (star sums A_i and neighborhood sizes W_i from the
    integer equi-join); the denominator's two factors close from
    exact int64/DECIMAL(38,0) moments in one shared-text IEEE chain,
    micro-quantized before the ORDER BY, ties broken on integer cell
    keys; guards are integer predicates.

    Scale shape: ONE groupBy(cell) reduce; the star neighborhood is a
    9-row literal offset cross + integer EQUI-join (the geohash
    neighbor pattern); the close is per-cell constant algebra against
    a broadcast 1-row moment table; top-5 compiles to
    TakeOrderedAndProject. Cell cardinality is geography-bounded at
    any corpus size.

    Reference basis: localized hot-channel identification on the 2D
    detector layout (DAQ_self-triggering.md:84-93); statistic from
    Getis & Ord 1992, Geographical Analysis 24:189-206 (public)."""
    ensure_deterministic(spark)
    events = table(spark, sf_dir, "events")
    events.createOrReplaceTempView("getis_events")
    return spark.sql(_GETIS_SQL.format(src="getis_events"))


# --------------------------------------------------------------------------
# round-12 seventh wave — robust two-sample / collinearity / influence /
# distribution-fit closes
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The `ext_mann_whitney_u`
#: grouped-by-value frame extended with WITHIN-GROUP doubled midranks:
#: doubled placements r2 - r2a / r2 - r2b are exact int64 per value,
#: their sums and squared sums exact int64/DECIMAL(38,0); the rank
#: variances, the P(X<Y) estimate and the Welch-Satterthwaite df all
#: close in one fixed-order IEEE chain; degenerate-variance guards are
#: exact DECIMAL predicates.
_BM_SQL = """
WITH v AS (
    SELECT n_chars,
           CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca
    FROM {src} GROUP BY n_chars
),
r AS (
    SELECT n_chars, c, ca, c - ca AS cb,
           2 * CAST(COALESCE(SUM(c) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + c + 1 AS r2,
           2 * CAST(COALESCE(SUM(ca) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + ca + 1 AS r2a,
           2 * CAST(COALESCE(SUM(c - ca) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + (c - ca) + 1 AS r2b
    FROM v
),
n AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
    FROM r
),
s AS (
    SELECT
        CAST(SUM(ca * (r2 - r2a)) AS BIGINT) AS pa2,
        CAST(SUM(cb * (r2 - r2b)) AS BIGINT) AS pb2,
        CAST(SUM(CAST(ca AS DECIMAL(38,0)) * (r2 - r2a) * (r2 - r2a))
             AS DECIMAL(38,0)) AS qa4,
        CAST(SUM(CAST(cb AS DECIMAL(38,0)) * (r2 - r2b) * (r2 - r2b))
             AS DECIMAL(38,0)) AS qb4
    FROM r
),
cl AS (
    SELECT n.na, n.nb,
           (CAST(s.qa4 AS DOUBLE) - s.pa2 * 1e0 * s.pa2 / n.na)
               / (4e0 * (n.na - 1e0)) AS sa2,
           (CAST(s.qb4 AS DOUBLE) - s.pb2 * 1e0 * s.pb2 / n.nb)
               / (4e0 * (n.nb - 1e0)) AS sb2,
           s.pa2 * 1e0 / (2e0 * n.na) / n.nb AS phat
    FROM n, s
    WHERE n.na > 1 AND n.nb > 1
      AND CAST(n.na AS DECIMAL(38,0)) * s.qa4
          - CAST(s.pa2 AS DECIMAL(38,0)) * s.pa2 > 0
      AND CAST(n.nb AS DECIMAL(38,0)) * s.qb4
          - CAST(s.pb2 AS DECIMAL(38,0)) * s.pb2 > 0
)
SELECT na AS n_a, nb AS n_b,
       CAST(FLOOR(phat * 1e6 + 5e-1) AS BIGINT) AS p_hat_micro,
       CAST(FLOOR((phat - 5e-1)
            / sqrt(sa2 / (nb * 1e0 * nb * na) + sb2 / (na * 1e0 * na * nb))
            * 1e3 + 5e-1) AS BIGINT) AS t_milli,
       CAST(FLOOR((sa2 / (nb * 1e0 * nb) / na + sb2 / (na * 1e0 * na) / nb)
                  * (sa2 / (nb * 1e0 * nb) / na + sb2 / (na * 1e0 * na) / nb)
            / ((sa2 / (nb * 1e0 * nb) / na) * (sa2 / (nb * 1e0 * nb) / na)
                   / (na - 1e0)
               + (sb2 / (na * 1e0 * na) / nb) * (sb2 / (na * 1e0 * na) / nb)
                   / (nb - 1e0)) * 1e3 + 5e-1) AS BIGINT) AS df_milli
FROM cl
"""


@register("ext_brunner_munzel", oracle=_BM_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test (Brunner & Munzel 2000) for stochastic
    superiority between the English cohort and the rest on document
    length: estimates p = P(X_other < X_en) + 0.5 P(=) from rank
    placements and t-tests it against 1/2 with a Welch-Satterthwaite
    df. The ROBUST replacement for `ext_mann_whitney_u`'s hidden
    assumption: MWU is only a test of p = 1/2 when the two variances
    are equal (under heteroskedasticity its z is miscalibrated —
    the Behrens-Fisher problem in ranks); BM estimates the two rank
    variances SEPARATELY, the modern recommendation whenever cohort
    spreads differ, which length distributions across languages
    always do. Convention: p_hat > 1/2 reads 'English documents tend
    LONGER than the rest'.

    Determinism: the grouped-by-value frame extends MWU's with
    within-group doubled midranks (2*cum_g + c_g + 1) — doubled
    placements r2 - r2a are exact int64 per value; placement sums and
    squared sums are exact int64/DECIMAL(38,0) (the 4x scalings
    cancel in the variance identities); the two variances, p_hat, t
    and df close in ONE fixed-order IEEE chain, micro/milli-
    quantized; degenerate-variance guards are exact DECIMAL
    predicates.

    Scale shape: ONE map-side-combinable groupBy(value) reduce; three
    cumulative windows on the bounded value DOMAIN (the rank-test
    bound — `ext_token_weighted_resample`'s range-bucketed two-level
    prefix sum is the wide-domain swap-in); 1-row totals crosses
    (allowlisted).

    Reference basis: cohort response-distribution comparison under
    unequal spreads (DAQ_self-triggering.md:84-93); test from Brunner
    & Munzel 2000, Biometrical J. 42:17-25 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bm_docs")
    return spark.sql(_BM_SQL.format(src="bm_docs"))


#: shared prefix slice of `_KENDALL_BODY` (the (lang, source) pair
#: frame, byte-for-byte) with the Goodman-Kruskal close appended.
_GAMMA_PREFIX = _KENDALL_BODY.split("\nSELECT lang, n0")[0]

_GAMMA_SQL = _GAMMA_PREFIX + """
SELECT lang, nc AS n_conc, nd AS n_disc,
       CAST(FLOOR((nc - nd) * 1e3 / (nc + nd) + 5e-1) AS BIGINT)
           AS gamma_milli
FROM s WHERE nc + nd > 0
"""


@register("ext_gamma_concordance",
          oracle=_GAMMA_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_gamma_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma (Goodman & Kruskal 1954) per language over
    the same (lang, source) chars-vs-docs pair frame as
    `ext_kendall_tau` — the TIE-IGNORING member of the ordinal-
    association family: tau-b folds tied pairs into its denominator
    (pulling the coefficient toward 0 as ties grow), gamma conditions
    on the untied pairs only, gamma = (C - D)/(C + D) — the PRE
    interpretation (how much better than chance one ranks untied
    pairs) and the statistic of choice for heavily tied ordinal
    tables. Reading gamma NEXT TO tau-b is the point: a large gap
    between them is itself the tie-mass diagnostic.

    Determinism: the pair frame is `ext_kendall_tau`'s byte-for-byte
    (shared prefix slice); concordant/discordant counts are exact
    int64; gamma is ONE IEEE division, milli-quantized; the all-tied
    guard is an integer predicate.

    Scale shape: identical to `ext_kendall_tau` — the self-join runs
    on the aggregated (lang, source) dimension, corpus-size-
    independent; the corpus pass is one map-side-combinable groupBy.

    Reference basis: rank agreement between per-source contribution
    metrics (DAQ_self-triggering.md:84-93); statistic from Goodman &
    Kruskal 1954, JASA 49:732-764 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("gamma_docs")
    return spark.sql(_GAMMA_SQL.format(src="gamma_docs"))


#: shared body ({src} = orders view, {day} = engine epoch-day). The
#: `ext_durbin_watson` trend frame plus the n-scaled centered index
#: x_s = n*d - sum(d) (exact int64): leverage h = 1/n + x_s^2/S_XX
#: and Cook's D close from exact int64/DECIMAL moments in one
#: fixed-order IEEE chain per day; the top-5 orders by the
#: micro-quantized integer with a day tie-break.
_INFLUENCE_SQL = """
WITH day AS (
    SELECT {day} AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY 1
),
mo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(c) AS BIGINT) AS sc,
           CAST(SUM(d * c) AS BIGINT) AS sdc,
           CAST(SUM(d * d) AS BIGINT) AS sdd
    FROM day
),
cf AS (
    SELECT n, sd, sc,
           (n * 1e0 * sdc - sd * 1e0 * sc)
               / (n * 1e0 * sdd - sd * 1e0 * sd) AS b
    FROM mo
    WHERE n > 3 AND CAST(n AS DECIMAL(38,0)) * sdd
          - CAST(sd AS DECIMAL(38,0)) * sd > 0
),
e AS (
    SELECT day.d,
           CAST(FLOOR((day.c - (cf.sc - cf.b * cf.sd) / cf.n
                       - cf.b * day.d) * 1e3 + 5e-1) AS BIGINT) AS em,
           CAST(cf.n * day.d - cf.sd AS BIGINT) AS xs
    FROM day CROSS JOIN cf
),
sx AS (
    SELECT CAST(SUM(CAST(xs AS DECIMAL(38,0)) * xs) AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(CAST(em AS DECIMAL(38,0)) * em) AS DECIMAL(38,0)) AS see,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e
),
z AS (
    SELECT e.d, e.em,
           1e0 / sx.n + e.xs * 1e0 * e.xs / CAST(sx.sxx AS DOUBLE) AS h,
           CAST(sx.see AS DOUBLE) / 1e6 / (sx.n - 2e0) AS s2
    FROM e CROSS JOIN sx
    WHERE sx.sxx > 0 AND sx.see > 0
),
k AS (
    SELECT d, em,
           CAST(FLOOR(h * 1e6 + 5e-1) AS BIGINT) AS lev_micro,
           CAST(FLOOR((em / 1e3) * (em / 1e3) / (2e0 * s2 * (1e0 - h))
                      * (h / (1e0 - h)) * 1e6 + 5e-1) AS BIGINT)
               AS cooks_micro
    FROM z WHERE h < 1e0
)
SELECT d, em, lev_micro, cooks_micro
FROM k ORDER BY cooks_micro DESC, d LIMIT 5
"""


@register("ext_ols_influence",
          oracle=_INFLUENCE_SQL.format(src="orders", day=_FCAST_DAY_DUCK),
          tags=("ext", "curation", "timeseries"))
def ext_ols_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS influence diagnostics (Cook 1977; Belsley-Kuh-Welsch 1980)
    for the daily-order-count trend fit: per-day leverage h_t = 1/n +
    (t - tbar)^2/S_xx and Cook's distance D_t = e_t^2 h_t /
    (k s^2 (1-h_t)^2), emitting the top-5 most influential days. The
    WHICH-OBSERVATION member of the regression-diagnostic family:
    `ext_durbin_watson`/`ext_breusch_godfrey` test the residuals as a
    population, `ext_chow_test` a pinned split — Cook's D asks which
    SINGLE days, if dropped, would move the fitted trend most (the
    outage/backfill days every ops owner wants named before trusting
    a slope).

    Determinism: the trend frame is `ext_durbin_watson`'s verbatim;
    x_s = n*d - sum(d) clears the mean exactly; S_XX and Sigma e^2
    are exact DECIMAL(38,0); h, s^2 and D close in one shared-text
    fixed-order IEEE chain from exact integers, micro-quantized
    BEFORE the ORDER BY with a day tie-break (deterministic top-5);
    the h < 1 and nonsingular guards are shared-text predicates.

    Scale shape: ONE map-side-combinable groupBy(day) reduce;
    residuals and diagnostics live on the bounded (calendar-sized)
    day table; 1-row moment crosses (allowlisted); top-5 compiles to
    TakeOrderedAndProject.

    Reference basis: which single day drove the fitted drift — the
    anomalous-run audit before reusing thresholds
    (DAQ_self-triggering.md:84-93); statistics from Cook 1977,
    Technometrics 19:15-18 (public)."""
    ensure_deterministic(spark)
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("infl_orders")
    return spark.sql(
        _INFLUENCE_SQL.format(src="infl_orders", day=_FCAST_DAY_SPARK))


#: shared body ({src} = lineitem view). The three regressors quantize
#: row-locally to exact integers (unit quantity, cent price, permille
#: discount); all nine moments are ONE DECIMAL(38,0) reduce; the three
#: pairwise correlations and the three VIFs (two-regressor R^2
#: identity) close in one fixed-order IEEE chain.
_VIF_SQL = """
WITH q AS (
    SELECT CAST(l_quantity AS BIGINT) AS x1,
           CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS x2,
           CAST(FLOOR(l_discount * 1e3 + 5e-1) AS BIGINT) AS x3
    FROM {src}
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x1) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
           CAST(SUM(x3) AS DECIMAL(38,0)) AS s3,
           CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS DECIMAL(38,0)) AS s11,
           CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS s22,
           CAST(SUM(CAST(x3 AS DECIMAL(38,0)) * x3) AS DECIMAL(38,0)) AS s33,
           CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS s12,
           CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x3) AS DECIMAL(38,0)) AS s13,
           CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x3) AS DECIMAL(38,0)) AS s23
    FROM q
),
c AS (
    SELECT n,
           (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))) AS r12,
           (CAST(n AS DOUBLE) * CAST(s13 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                     - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))) AS r13,
           (CAST(n AS DOUBLE) * CAST(s23 AS DOUBLE)
            - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                     - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))) AS r23
    FROM m
    WHERE CAST(n AS DECIMAL(38,0)) * s11 - s1 * s1 > 0
      AND CAST(n AS DECIMAL(38,0)) * s22 - s2 * s2 > 0
      AND CAST(n AS DECIMAL(38,0)) * s33 - s3 * s3 > 0
)
SELECT n AS n_rows,
       CAST(FLOOR(r12 * 1e9 + 5e-1) AS BIGINT) AS r12_nano,
       CAST(FLOOR(r13 * 1e9 + 5e-1) AS BIGINT) AS r13_nano,
       CAST(FLOOR(r23 * 1e9 + 5e-1) AS BIGINT) AS r23_nano,
       CAST(FLOOR(1e0 / (1e0 - (r12 * r12 + r13 * r13
                                - 2e0 * r12 * r13 * r23)
                               / (1e0 - r23 * r23)) * 1e3 + 5e-1)
            AS BIGINT) AS vif_qty_milli,
       CAST(FLOOR(1e0 / (1e0 - (r12 * r12 + r23 * r23
                                - 2e0 * r12 * r23 * r13)
                               / (1e0 - r13 * r13)) * 1e3 + 5e-1)
            AS BIGINT) AS vif_price_milli,
       CAST(FLOOR(1e0 / (1e0 - (r13 * r13 + r23 * r23
                                - 2e0 * r13 * r23 * r12)
                               / (1e0 - r12 * r12)) * 1e3 + 5e-1)
            AS BIGINT) AS vif_disc_milli
FROM c
WHERE 1e0 - r23 * r23 > 0e0 AND 1e0 - r13 * r13 > 0e0
  AND 1e0 - r12 * r12 > 0e0
"""


@register("ext_vif_panel", oracle=_VIF_SQL.format(src="lineitem"),
          tags=("ext", "curation", "stats"))
def ext_vif_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation factors (Marquardt 1970) for the three
    lineitem regressors quantity / price / discount — VIF_j =
    1/(1 - R^2_j) with R^2_j the fit of regressor j on the other two
    (the exact 3-variable case via the two-regressor correlation
    identity). THE pre-regression collinearity gate: every
    multi-regressor model downstream (`ext_ridge_normal_equations`,
    `ext_logreg_train_step`) silently assumes its design matrix is
    well-conditioned; VIF > 5-10 names the regressor whose
    coefficient variance explodes and motivates exactly the ridge
    penalty the registry already ships. Emits the three pairwise
    correlations beside the three VIFs so the culprit PAIR is visible.

    Determinism: regressors quantize row-locally to exact integers
    (unit / cent / permille); all nine moments are exact
    DECIMAL(38,0) sums in ONE reduce; correlations and VIFs close in
    one shared-text fixed-order IEEE chain, nano/milli-quantized;
    degenerate guards are exact DECIMAL predicates plus shared-text
    bound checks on the correlations.

    Scale shape: ONE map-side-combinable full-table reduce (three
    columns read; Parquet-pruned), 1-row close — the
    `ext_partial_correlation` shape with a third column.

    Reference basis: collinearity screen across calibration
    covariates before coefficient reads (DAQ_self-triggering.md:
    84-93); statistic from Marquardt 1970, Technometrics 12:591-612
    (public)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("vif_lineitem")
    return spark.sql(_VIF_SQL.format(src="vif_lineitem"))


#: shared body ({src} = documents view). Grouped-by-value ECDF frame;
#: the fitted-normal CDF evaluates the Abramowitz-Stegun 7.1.26 erf
#: polynomial (|error| < 1.5e-7, far inside the nano quantum's
#: resolution of the ECDF steps) through layered CTE columns — one
#: shared expression text, so both engines walk the identical IEEE
#: chain; both one-sided gaps are nano-FLOORed per distinct value
#: before the max.
_LILLIE_SQL = """
WITH v AS (
    SELECT n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
    FROM {src} GROUP BY n_chars
),
mo AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(x * c) AS BIGINT) AS sx,
           CAST(SUM(CAST(x AS DECIMAL(38,0)) * x * c) AS DECIMAL(38,0)) AS sxx
    FROM v
),
r AS (
    SELECT x, c,
           CAST(COALESCE(SUM(c) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
    FROM v
),
z AS (
    SELECT r.x, r.c, r.cum, mo.n,
           (r.x - mo.sx * 1e0 / mo.n)
           / sqrt((CAST(mo.sxx AS DOUBLE) - mo.sx * 1e0 * mo.sx / mo.n)
                  / (mo.n - 1e0)) AS zz
    FROM r CROSS JOIN mo
    WHERE mo.n > 1
      AND CAST(mo.n AS DECIMAL(38,0)) * mo.sxx
          - CAST(mo.sx AS DECIMAL(38,0)) * mo.sx > 0
),
za AS (
    SELECT x, c, cum, n, zz,
           (CASE WHEN zz >= 0e0 THEN zz ELSE 0e0 - zz END) / sqrt(2e0) AS ax
    FROM z
),
tb AS (
    SELECT x, c, cum, n, zz,
           (1e0 / (1e0 + 3275911e-7 * ax))
           * (254829592e-9
              + (1e0 / (1e0 + 3275911e-7 * ax))
                * (-284496736e-9
                   + (1e0 / (1e0 + 3275911e-7 * ax))
                     * (1421413741e-9
                        + (1e0 / (1e0 + 3275911e-7 * ax))
                          * (-1453152027e-9
                             + (1e0 / (1e0 + 3275911e-7 * ax))
                               * 1061405429e-9))))
           * EXP(-ax * ax) AS yy
    FROM za
),
phi AS (
    SELECT x, c, cum, n,
           CASE WHEN zz >= 0e0 THEN 1e0 - 5e-1 * yy ELSE 5e-1 * yy END AS ph
    FROM tb
),
gaps AS (
    SELECT n,
           CAST(FLOOR(((cum + c) * 1e0 / n - ph) * 1e9 + 5e-1) AS BIGINT)
               AS up,
           CAST(FLOOR((ph - cum * 1e0 / n) * 1e9 + 5e-1) AS BIGINT) AS dn
    FROM phi
),
mx AS (
    SELECT n, CAST(MAX(CASE WHEN up > dn THEN up ELSE dn END) AS BIGINT)
               AS d_nano
    FROM gaps GROUP BY n
)
SELECT n AS n_rows, d_nano,
       CAST(FLOOR(d_nano / 1e9 * sqrt(n * 1e0) * 1e6 + 5e-1) AS BIGINT)
           AS d_sqrt_n_micro
FROM mx
"""


@register("ext_lilliefors", oracle=_LILLIE_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors statistic (Lilliefors 1967): the Kolmogorov-Smirnov
    distance between the document-length ECDF and the normal fitted
    by the SAMPLE mean and variance, with the sqrt(n)-scaled variant
    beside it. The correctly-calibrated one-sample normality screen:
    a plain KS against an estimated normal is anticonservative
    (estimating mu/sigma from the same data shrinks the distance —
    Lilliefors' whole point, which is why his corrected tables
    exist), and it reads the WHOLE CDF where `ext_jarque_bera` /
    `ext_dagostino_k2` read two moments — the gate that catches
    bimodality moment tests miss. Both one-sided gaps at every
    distinct value (CDF step bottom and top) enter the max, the exact
    discrete KS convention of the CvM/Kuiper siblings.

    Determinism: the grouped-by-value ECDF frame is exact integer
    algebra; the fitted z per distinct value closes from exact
    int64/DECIMAL moments in shared text; Phi evaluates the
    Abramowitz-Stegun 7.1.26 polynomial (|eps| < 1.5e-7) through
    layered CTE columns — the `ext_quality_logistic` EXP precedent,
    identical IEEE chains both engines; both gaps nano-FLOOR before
    an integer MAX.

    Scale shape: ONE map-side-combinable groupBy(value) reduce, one
    cumulative window on the bounded value DOMAIN (rank-test bound;
    range-bucketed prefix-sum lowering is the wide-domain swap-in),
    per-value constant algebra, and an integer max reduce; 1-row
    moment cross (allowlisted).

    Reference basis: is the per-channel response distribution
    Gaussian enough for the threshold model (DAQ_self-triggering.md:
    84-93); statistic from Lilliefors 1967, JASA 62:399-402
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("lillie_docs")
    return spark.sql(_LILLIE_SQL.format(src="lillie_docs"))


# --------------------------------------------------------------------------
# ext_distance_correlation — any-dependence detector on the source panel
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The (lang, source) pair frame
#: of `ext_kendall_tau` widened to the FULL ordered-pair grid
#: (including the diagonal) — the double-centering terms clear to
#: exact integers u = n^2*a - n*ra_i - n*ra_j + ta (the KPSS/Moran
#: n-clearing trick, here at fourth power n^4 which cancels in the
#: ratio), so all three Brownian-covariance sums are exact
#: DECIMAL(38,0) in any order; one IEEE close per language.
_DCOR_SQL = """
WITH m AS (
    SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM {src} GROUP BY lang, source
),
p AS (
    SELECT a.lang, a.source AS sa, b.source AS sb,
           CAST(CASE WHEN a.x >= b.x THEN a.x - b.x ELSE b.x - a.x END
                AS BIGINT) AS ax,
           CAST(CASE WHEN a.y >= b.y THEN a.y - b.y ELSE b.y - a.y END
                AS BIGINT) AS ay
    FROM m a JOIN m b ON a.lang = b.lang
),
rs AS (
    SELECT lang, sa, CAST(SUM(ax) AS BIGINT) AS rax,
           CAST(SUM(ay) AS BIGINT) AS ray
    FROM p GROUP BY lang, sa
),
tot AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(rax) AS BIGINT) AS tax,
           CAST(SUM(ray) AS BIGINT) AS tay
    FROM rs GROUP BY lang
),
c AS (
    SELECT p.lang, ANY_VALUE(t.n) AS n,
           CAST(SUM((CAST(t.n AS DECIMAL(38,0)) * t.n * p.ax
                     - t.n * ra.rax - t.n * rb.rax + t.tax)
                    * (CAST(t.n AS DECIMAL(38,0)) * t.n * p.ay
                       - t.n * ra.ray - t.n * rb.ray + t.tay))
                AS DECIMAL(38,0)) AS uxy,
           CAST(SUM((CAST(t.n AS DECIMAL(38,0)) * t.n * p.ax
                     - t.n * ra.rax - t.n * rb.rax + t.tax)
                    * (CAST(t.n AS DECIMAL(38,0)) * t.n * p.ax
                       - t.n * ra.rax - t.n * rb.rax + t.tax))
                AS DECIMAL(38,0)) AS uxx,
           CAST(SUM((CAST(t.n AS DECIMAL(38,0)) * t.n * p.ay
                     - t.n * ra.ray - t.n * rb.ray + t.tay)
                    * (CAST(t.n AS DECIMAL(38,0)) * t.n * p.ay
                       - t.n * ra.ray - t.n * rb.ray + t.tay))
                AS DECIMAL(38,0)) AS uyy
    FROM p
    JOIN rs ra ON p.lang = ra.lang AND p.sa = ra.sa
    JOIN rs rb ON p.lang = rb.lang AND p.sb = rb.sa
    JOIN tot t ON p.lang = t.lang
    GROUP BY p.lang
)
SELECT lang, n AS n_points,
       CAST(FLOOR(sqrt(sqrt(
            (CASE WHEN uxy > 0 THEN CAST(uxy AS DOUBLE) ELSE 0e0 END)
            * (CASE WHEN uxy > 0 THEN CAST(uxy AS DOUBLE) ELSE 0e0 END)
            / (CAST(uxx AS DOUBLE) * CAST(uyy AS DOUBLE))))
            * 1e6 + 5e-1) AS BIGINT) AS dcor_micro
FROM c
WHERE n > 1 AND uxx > 0 AND uyy > 0
"""


@register("ext_distance_correlation",
          oracle=_DCOR_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance correlation (Szekely, Rizzo & Bakirov 2007) per
    language between per-source total characters and document counts
    — the ANY-DEPENDENCE member of the association family: Pearson
    reads linear signal, Spearman/Kendall/gamma monotone signal; dcor
    is ZERO if and only if the variables are independent, so a
    noticeable dcor on a panel where tau is flat reveals U-shaped or
    heteroskedastic coupling every monotone statistic walks past —
    the modern screen run before choosing which classical coefficient
    to trust. Computed by the exact double-centering identity:
    dcor^2 = <A,B> / sqrt(<A,A><B,B>) over the centered distance
    matrices.

    Determinism: per-cell u = n^2*a_ij - n*r_i - n*r_j + total clears
    the centering denominators into exact int64 (the `ext_kpss_test`
    trick; the n^4 scaling cancels in the ratio), so all three inner
    products are exact DECIMAL(38,0) sums in ANY order; the close
    (negative-dCov^2 clamp + double square root) is ONE shared-text
    IEEE chain, micro-quantized; guards are integer predicates.

    Scale shape: ONE map-side-combinable groupBy(lang, source) corpus
    reduce; the full-pair grid, row sums and inner products live on
    the bounded (|langs| x |sources|^2) dimension — corpus-size-
    independent, the `ext_kendall_tau` bound squared (~400 cells per
    language).

    Reference basis: nonlinear dependence screen between per-channel
    contribution metrics (DAQ_self-triggering.md:84-93); statistic
    from Szekely, Rizzo & Bakirov 2007, Ann. Statist. 35:2769-2794
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("dcor_docs")
    return spark.sql(_DCOR_SQL.format(src="dcor_docs"))


# --------------------------------------------------------------------------
# ext_hoeffding_d — the classical any-dependence rank statistic
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). Doubled marginal midranks and
#: QUADRUPLED bivariate ranks keep every tie correction an exact
#: integer (Hollander-Wolfe quarter weights x4); the three D-sums
#: carry the 16x scaling explicitly (d*_16), so the close is one
#: exact-integer combination divided once in IEEE.
_HOEFFD_SQL = """
WITH m AS (
    SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM {src} GROUP BY lang, source
),
rx AS (
    SELECT a.lang, a.source,
           CAST(SUM(CASE WHEN b.x < a.x THEN 2
                         WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT) + 1
               AS r2
    FROM m a JOIN m b ON a.lang = b.lang
    GROUP BY a.lang, a.source
),
ry AS (
    SELECT a.lang, a.source,
           CAST(SUM(CASE WHEN b.y < a.y THEN 2
                         WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) + 1
               AS s2
    FROM m a JOIN m b ON a.lang = b.lang
    GROUP BY a.lang, a.source
),
q4 AS (
    SELECT a.lang, a.source,
           4 + CAST(SUM(CASE
                WHEN b.source = a.source THEN 0
                WHEN b.x < a.x AND b.y < a.y THEN 4
                WHEN b.x = a.x AND b.y < a.y THEN 2
                WHEN b.x < a.x AND b.y = a.y THEN 2
                WHEN b.x = a.x AND b.y = a.y THEN 1
                ELSE 0 END) AS BIGINT) AS q
    FROM m a JOIN m b ON a.lang = b.lang
    GROUP BY a.lang, a.source
),
j AS (
    SELECT rx.lang, rx.r2, ry.s2, q4.q,
           CAST(COUNT(*) OVER (PARTITION BY rx.lang) AS BIGINT) AS n
    FROM rx JOIN ry ON rx.lang = ry.lang AND rx.source = ry.source
            JOIN q4 ON rx.lang = q4.lang AND rx.source = q4.source
),
s AS (
    SELECT lang, ANY_VALUE(n) AS n,
           CAST(SUM((q - 4) * (q - 8)) AS BIGINT) AS d1_16,
           CAST(SUM(CAST((r2 - 2) AS DECIMAL(38,0)) * (r2 - 4)
                    * (s2 - 2) * (s2 - 4)) AS DECIMAL(38,0)) AS d2_16,
           CAST(SUM(CAST((r2 - 4) AS DECIMAL(38,0)) * (s2 - 4) * (q - 4))
                AS DECIMAL(38,0)) AS d3_16
    FROM j GROUP BY lang
)
SELECT lang, n AS n_points,
       CAST(FLOOR(30e0 * ((n - 2e0) * (n - 3e0) * d1_16
                          + CAST(d2_16 AS DOUBLE)
                          - 2e0 * (n - 2e0) * CAST(d3_16 AS DOUBLE))
                  / (16e0 * n * (n - 1e0) * (n - 2e0) * (n - 3e0)
                     * (n - 4e0)) * 1e6 + 5e-1) AS BIGINT) AS d_micro
FROM s WHERE n > 4
"""


@register("ext_hoeffding_d", oracle=_HOEFFD_SQL.format(src="documents"),
          tags=("ext", "curation", "stats"))
def ext_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D (Hoeffding 1948) per language over the same
    (lang, source) chars-vs-docs panel as `ext_kendall_tau` — the
    CLASSICAL any-dependence statistic next to the modern
    `ext_distance_correlation`: D integrates the squared gap between
    the joint rank CDF and the product of the marginals, so it is
    ~0 under independence, exactly 1 for monotone no-tie dependence,
    and — unlike dcor — fully RANK-BASED (invariant to any monotone
    transform of either margin, verified by the property test), the
    statistic of record when the margins are heavy-tailed enough
    that distances themselves mislead. Tie handling is the
    Hollander-Wolfe quarter-weight convention.

    Determinism: doubled marginal midranks (the census form 2*#less
    + #equal + 1, self included) and QUADRUPLED bivariate ranks make
    every tie weight an exact integer; the three D-sums carry the 16x
    scaling explicitly as exact int64/DECIMAL(38,0); the close is ONE
    exact-integer combination with a single IEEE division,
    micro-quantized; the n > 4 support guard is an integer predicate.

    Scale shape: ONE map-side-combinable groupBy(lang, source) corpus
    reduce; the three rank censuses are equi-joined pair frames on
    the bounded (|langs| x |sources|^2) dimension — corpus-size-
    independent (the `ext_kendall_tau` bound squared); 1-row counting
    window per lang.

    Reference basis: distribution-free dependence screen between
    per-channel contribution metrics (DAQ_self-triggering.md:84-93);
    statistic from Hoeffding 1948, Ann. Math. Statist. 19:546-557
    (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("hoeffd_docs")
    return spark.sql(_HOEFFD_SQL.format(src="hoeffd_docs"))
