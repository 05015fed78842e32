"""§2.11 [EXT] Text analysis for LLM training pipelines.

Tokenization, per-language stats, tf-idf, quality scoring, document
fingerprinting and a corpus-trained naive-Bayes language scorer — all
expressed as DataFrame algebra (explode/groupBy/join/window), no Python in
the hot path, every query hash-checked against DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.operators import sampling_common as _sc
from project_etl_spark.portable import pround
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

STOPWORDS = ("the", "a", "of", "and", "to")

#: BPE-ish pre-tokenizer: letter runs stay whole, digits split one by one
#: (GPT-style), punctuation is one token per char. The whitespace class is
#: spelled out because Java's \\s includes \\x0B and RE2's does not — with
#: explicit escapes both dialects agree character for character.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\f\r]"

_TOKENS_SQL = """
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
    FROM documents
"""


def _tokens(docs: DataFrame) -> DataFrame:
    return (docs.select("doc_id", "lang",
                        F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != ""))


@register(
    "ext_text_tokens",
    oracle=f"""
        WITH toks AS ({_TOKENS_SQL})
        SELECT lang,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_distinct_tokens,
               COUNT(DISTINCT doc_id) AS n_docs,
               (CAST(SUM(length(tok)) AS BIGINT) * 1.0 / COUNT(*)) AS avg_tok_len
        FROM toks WHERE tok <> ''
        GROUP BY lang
    """,
    tags=("ext", "text"),
)
def ext_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-language corpus stats: one explode, one
    groupBy — the map-side-combinable token-count shape."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents"))
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        (F.sum(F.length("tok").cast("long")) * F.lit(1.0)
         / F.count(F.lit(1))).alias("avg_tok_len"),
    )


@register(
    "ext_sample_split",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, lang, n_chars,
                   {_sc.BUCKET_SQL} AS bucket
            FROM documents
        ),
        kept AS (
            SELECT lang, n_chars, bucket,
                   {_sc.SPLIT_SQL} AS split
            FROM b
            WHERE bucket < {_sc.RATE_SQL}
        )
        SELECT lang, split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM kept GROUP BY lang, split
    """,
    tags=("ext", "text", "sampling"),
)
def ext_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation: deterministic hash-based stratified downsampling
    (keep 50% of over-represented 'en', 100% of the rest) plus
    train/val/test assignment (80/10/10) — all from ONE md5 bucket per
    document, no RNG. Hash sampling is the production answer at 100 TB:
    reproducible across engines, runs, and partitionings (a seeded
    ``sample()`` is none of those — its draw depends on row order within
    partitions), and it is a row-local predicate evaluated in the scan
    stage (column-pruned read, codegen filter, map-side partial agg) —
    the only shuffle is the final small (lang, split) aggregation."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    return (docs.withColumn("bucket", _sc.bucket_col())
            .where(F.col("bucket") < _sc.rate_col())
            .withColumn("split", _sc.split_col())
            .groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("n_chars")))


@register(
    "ext_quality_filter",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS nt,
                   CAST(len(list_distinct(list_filter(string_split(text, ' '),
                            x -> x <> ''))) AS BIGINT) AS nd
            FROM documents
        ),
        r AS (
            SELECT lang, (nd * 1000) // nt AS q,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY (nd * 1000) // nt DESC, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM t WHERE nt > 0
        )
        SELECT lang,
               CAST(MAX(n) AS BIGINT) AS n_total,
               COUNT(*) AS n_kept,
               CAST(MIN(q) AS BIGINT) AS min_kept_q
        FROM r WHERE (rn - 1) * 10 < n * 9
        GROUP BY lang
    """,
    tags=("ext", "text", "quality"),
)
def ext_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filtering: keep the top ceil(0.9n) docs per language by a
    type-token quality key (token-less docs are excluded up front — also
    the ANSI divide-by-zero guard). The cutoff is RANK algebra, not a
    percentile function — ``(rn-1)*10 < n*9`` is pure integer arithmetic,
    so the kept set is identical in any engine (quantile interpolation
    rules are not), and the quality key is an integer ``div``. One window
    shuffle per language partition; no global sort."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    nt = F.expr("size(filter(split(text, ' '), x -> x != ''))")
    nd = F.expr("cast(size(array_distinct(filter(split(text, ' '),"
                " x -> x != ''))) as bigint)")
    base = (docs.withColumn("nt", nt).withColumn("nd", nd)
            .where(F.col("nt") > 0)
            .withColumn("q", F.expr("(nd * 1000) div nt")))
    wr = Window.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    wn = Window.partitionBy("lang")
    r = (base.withColumn("rn", F.row_number().over(wr))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    return (r.where((F.col("rn") - 1) * 10 < F.col("n") * 9)
            .groupBy("lang")
            .agg(F.max("n").alias("n_total"),
                 F.count(F.lit(1)).alias("n_kept"),
                 F.min("q").alias("min_kept_q")))


@register(
    "ext_sequence_pack",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST({_sc.WS_COUNT_SQL} AS BIGINT) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, n_tok,
                   SUM(n_tok) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM t
        )
        SELECT lang,
               CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        FROM c GROUP BY lang, pack_id
    """,
    tags=("ext", "text", "packing"),
)
def ext_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — bin documents into fixed token-budget training
    packs (B=2048): a doc joins the pack its START offset falls in, so
    assignment is a pure windowed cumulative sum, deterministic and
    engine-portable. Packing runs PER LANGUAGE (the shard key), so the
    sort is partitioned — never a single global order. At 100 TB you pack
    per (shard, worker) exactly like this; a greedy first-fit would be
    inherently sequential and is the anti-pattern."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", _sc.ws_count_col().cast("long").alias("n_tok"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    # integer `div`, not double floor-division: long/long via doubles loses
    # exactness past 2^53 — precisely the 100 TB cumulative-sum regime
    pack = F.expr("(cum - n_tok) div 2048")
    return (c.withColumn("pack_id", pack)
            .groupBy("lang", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("pack_tokens")))


@register(
    "ext_corpus_mix",
    oracle=f"""
        WITH b AS (
            SELECT source, text,
                   {_sc.BUCKET_SQL} AS bucket,
                   {_sc.mix_rate_sql()} AS rate
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN bucket < rate
                             THEN {_sc.WS_COUNT_SQL} ELSE 0 END)
                    AS BIGINT) AS n_tokens_kept
        FROM b GROUP BY source
    """,
    tags=("ext", "text", "sampling"),
)
def ext_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing — the data-mixing recipe of LLM training:
    each source gets a keep-rate (upweight curated sources, downweight
    crawl), applied with the same deterministic md5 bucket as
    ``ext_sample_split``. ONE pass, no filter-then-rejoin: per-source
    totals, kept counts, and kept-token budgets come from conditional
    aggregates over a single scan; the mixture spec is a broadcastable
    literal CASE, so at 100 TB this is a map-side-combinable groupBy on
    ~20 source keys."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    keep = F.col("bucket") < _sc.mix_rate_col()
    return (docs.withColumn("bucket", _sc.bucket_col())
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(keep.cast("long")).alias("n_kept"),
                 F.sum(F.when(keep, _sc.ws_count_col().cast("long"))
                       .otherwise(F.lit(0))).alias("n_tokens_kept")))


@register(
    "ext_token_count_bpe",
    oracle=f"""
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS INT) AS n_ws,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}'))
                    AS INT) AS n_bpe,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                    AS INT) AS n_word,
               CAST(len(regexp_extract_all(text, '[0-9]'))
                    AS INT) AS n_digit
        FROM documents
    """,
    tags=("ext", "text", "tokens"),
)
def ext_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budgeting under two tokenizers: whitespace words
    vs a BPE-ish pre-tokenizer regex (letter runs | single digits |
    single punctuation — the GPT-style split). Purely row-local regexp
    counts in whole-stage codegen: no explode, no shuffle — the cheapest
    possible shape for a 100 TB "how many tokens is this corpus" pass.
    The regex is character-class-only so Java and RE2 agree exactly."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    def n_matches(pat: str):
        return F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    return docs.select(
        "doc_id", "lang",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_ws"),
        n_matches(BPE_PATTERN).alias("n_bpe"),
        n_matches("[A-Za-z]+").alias("n_word"),
        n_matches("[0-9]").alias("n_digit"),
    )


@register(
    "ext_tokenizer_fertility",
    oracle=f"""
        WITH c AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS BIGINT)
                       AS total_words,
                   CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
                       AS BIGINT) AS total_bpe,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        )
        SELECT lang, n_docs, total_words, total_bpe,
               (FLOOR(total_bpe * 1.0 / total_words * 1e6 + 5e-1) / 1e6)
                   AS fertility,
               (FLOOR(total_chars * 1.0 / total_bpe * 1e6 + 5e-1) / 1e6)
                   AS chars_per_token
        FROM c
    """,
    tags=("ext", "text", "tokens", "tokenizer"),
)
def ext_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit — the per-language report every tokenizer
    change ships with (how many subword tokens per word, how many chars
    per token): languages with high fertility pay more sequence length
    for the same text, which skews both training cost and the effective
    mixing weights of a token-budgeted corpus (the practical reason
    multilingual tokenizers rebalance their training mix). Uses the same
    BPE-ish pre-tokenizer regex as ``ext_token_count_bpe`` as the subword
    proxy. Plan: row-local regexp counts in whole-stage codegen feeding
    one 5-group hash aggregate — integer sums (exact in any order), one
    final IEEE division per ratio, floor-quantized. Runs at scan speed on
    100 TB."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    n_ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
    agg = (docs.groupBy("lang")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(n_ws).cast("long").alias("total_words"),
                F.sum(n_bpe).cast("long").alias("total_bpe"),
                F.sum("n_chars").cast("long").alias("total_chars")))
    return agg.select(
        "lang", "n_docs", "total_words", "total_bpe",
        pround(F.col("total_bpe") * F.lit(1.0) / F.col("total_words"), 6)
        .alias("fertility"),
        pround(F.col("total_chars") * F.lit(1.0) / F.col("total_bpe"), 6)
        .alias("chars_per_token"))


@register(
    "ext_tokenizer_coverage",
    oracle=f"""
        WITH c AS (
            SELECT lang, n_chars,
                   len(array_to_string(
                       regexp_extract_all(text, '{BPE_PATTERN}'), ''))
                       AS covered
            FROM documents
        )
        SELECT lang,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(covered) AS BIGINT) AS covered_chars,
               CAST(SUM(n_chars) - SUM(covered) AS BIGINT)
                   AS fallback_chars,
               (FLOOR(SUM(covered) * 1.0 / SUM(n_chars) * 1e6 + 5e-1)
                / 1e6) AS coverage
        FROM c GROUP BY lang
    """,
    tags=("ext", "text", "tokens", "tokenizer"),
)
def ext_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer COVERAGE audit — the companion to fertility: what
    fraction of each language's characters does the pre-tokenizer
    actually capture, and how many fall through to the byte-fallback
    path? (For byte-level BPE, fallback rate drives both sequence
    inflation and the practical quality difference between scripts —
    the number that exposes a Latin-centric pre-tokenizer on CJK text;
    this synthetic corpus is Latin-script across langs, so coverage is
    uniform here — the AUDIT is what ships.) Covered mass = total length of all
    pre-tokenizer matches, computed row-local inside whole-stage codegen
    (regexp_extract_all + concat length — no explode); integer sums,
    one quantized division per language. Scan-speed at any corpus."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    covered = F.length(F.concat_ws(
        "", F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))))
    agg = (docs.groupBy("lang")
           .agg(F.sum("n_chars").cast("long").alias("total_chars"),
                F.sum(covered).cast("long").alias("covered_chars")))
    return agg.select(
        "lang", "total_chars", "covered_chars",
        (F.col("total_chars") - F.col("covered_chars")).cast("long")
        .alias("fallback_chars"),
        pround(F.col("covered_chars") * F.lit(1.0) / F.col("total_chars"), 6)
        .alias("coverage"))


@register(
    "ext_tfidf",
    oracle=f"""
        WITH toks AS ({_TOKENS_SQL}),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf
            FROM toks WHERE tok <> '' GROUP BY doc_id, tok
        ),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks WHERE tok <> '' GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   (FLOOR(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0))
                          * 1000000.0 + 0.5) / 1000000.0) AS tfidf
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        )
        SELECT doc_id, tok, tfidf
        FROM (SELECT doc_id, tok, tfidf,
                     ROW_NUMBER() OVER (
                         PARTITION BY doc_id ORDER BY tfidf DESC, tok
                     ) AS rn
              FROM scored
              WHERE doc_id < 20)
        WHERE rn <= 5
    """,
    tags=("ext", "text", "tfidf"),
)
def ext_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf: term frequency x inverse document frequency, top-5 terms for
    the first 20 docs (deterministic tie-break on the term). Two aggregations
    + a broadcast-sized df join; idf uses ln((N+1)/(df+1))."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    n_docs = docs.count()  # scalar query parameter, not a data collect
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.where(F.col("doc_id") < 20)
        .join(F.broadcast(df), "tok")
        .select("doc_id", "tok",
                pround(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6)
                .alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5).drop("rn"))


@register(
    "ext_quality_score",
    oracle="""
        SELECT doc_id, n_chars,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                                  x -> x <> ''))) AS BIGINT)
                   AS n_distinct,
               (CAST(len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                     / len(list_filter(string_split(text, ' '), x -> x <> '')))
                   AS stopword_ratio,
               (CAST(len(list_distinct(list_filter(string_split(text, ' '),
                         x -> x <> ''))) AS DOUBLE)
                     / len(list_filter(string_split(text, ' '), x -> x <> '')))
                   AS type_token_ratio
        FROM documents
    """,
    tags=("ext", "text", "quality"),
)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (length, stopword ratio, type-token
    ratio) computed with array higher-order functions — a narrow map-only
    pass, the cheapest possible shape for a 100 TB quality filter."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = F.expr("filter(split(text, ' '), x -> x != '')")
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    nstop = F.size(F.expr(f"filter(split(text, ' '), x -> x in ({stop_list}))"))
    return docs.select(
        "doc_id", "n_chars",
        nt.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        (nstop.cast("double") / nt).alias("stopword_ratio"),
        (nd.cast("double") / nt).alias("type_token_ratio"),
    )


@register(
    "ext_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(trim(text))) AS md5_fp,
               substr(md5(lower(trim(text))), 1, 16) AS md5_fp64
        FROM documents
    """,
    tags=("ext", "text", "fingerprint"),
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full md5 + truncated 64-bit prefix of the
    normalized text (the SimHash variant lives in ``ext_dedup_simhash``)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text")))
    return docs.select("doc_id", fp.alias("md5_fp"),
                       F.substring(fp, 1, 16).alias("md5_fp64"))


#: CTE chain ending in ``pred`` (doc_id, predicted_lang, score) — the
#: lang-id pipeline as a reusable fragment, feeding both the per-doc
#: prediction oracle and the confusion-matrix evaluation oracle.
_LANGID_PRED_SQL = f"""toks AS ({_TOKENS_SQL}),
        clean AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
        lang_tok AS (
            SELECT lang AS model_lang, tok, COUNT(*) AS c
            FROM clean GROUP BY 1, 2
        ),
        lang_tot AS (
            SELECT model_lang, SUM(c) AS total FROM lang_tok GROUP BY 1
        ),
        scored AS (
            SELECT c.doc_id, lt.model_lang,
                   (FLOOR(SUM(LN((lt.c + 1.0) / (tt.total + 1000.0)))
                          * 10000.0 + 0.5) / 10000.0) AS score
            FROM clean c
            JOIN lang_tok lt ON c.tok = lt.tok
            JOIN lang_tot tt ON lt.model_lang = tt.model_lang
            GROUP BY c.doc_id, lt.model_lang
        ),
        pred AS (
            SELECT doc_id, model_lang AS predicted_lang, score
            FROM (SELECT doc_id, model_lang, score,
                         ROW_NUMBER() OVER (
                             PARTITION BY doc_id ORDER BY score DESC, model_lang
                         ) AS rn
                  FROM scored)
            WHERE rn = 1
        )"""


@register(
    "ext_lang_id",
    oracle=f"""
        WITH {_LANGID_PRED_SQL}
        SELECT doc_id, predicted_lang, score FROM pred
    """,
    tags=("ext", "text", "langid"),
)
def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram language scorer: P(tok | lang) with add-one
    smoothing, document score = sum of log-probs, argmax lang with a
    deterministic tie-break. The per-lang token model is broadcast-sized."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents"))
    lang_tok = (toks.groupBy(F.col("lang").alias("model_lang"), "tok")
                .agg(F.count(F.lit(1)).alias("c")))
    lang_tot = lang_tok.groupBy("model_lang").agg(F.sum("c").alias("total"))
    model = lang_tok.join(lang_tot, "model_lang")
    scored = (
        toks.select("doc_id", "tok")
        .join(F.broadcast(model), "tok")
        .groupBy("doc_id", "model_lang")
        .agg(pround(F.sum(F.log((F.col("c") + 1.0) / (F.col("total") + 1000.0))), 4)
             .alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "model_lang")
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn")
            .select("doc_id", F.col("model_lang").alias("predicted_lang"), "score"))


@register(
    "ext_langid_confusion",
    oracle=f"""
        WITH {_LANGID_PRED_SQL}
        SELECT d.lang AS true_lang, p.predicted_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               (FLOOR(COUNT(*) * 1.0
                      / SUM(COUNT(*)) OVER (PARTITION BY d.lang)
                      * 1e6 + 5e-1) / 1e6) AS frac_of_true
        FROM pred p JOIN documents d ON p.doc_id = d.doc_id
        GROUP BY d.lang, p.predicted_lang
    """,
    tags=("ext", "text", "langid", "eval"),
)
def ext_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the evaluation every classifier
    stage ships with: per (true language, predicted language), document
    count and the fraction of the true language's mass (diagonal rows are
    per-language recall; off-diagonal rows say exactly WHICH languages
    confuse the scorer, the number that decides whether a multilingual
    corpus needs per-language thresholds). Reuses the registered lang-id
    pipeline verbatim, joins predictions to ground truth, and reduces to
    a |langs|^2-bounded census — evaluation cost is one prediction pass
    plus a constant-size aggregate at any corpus size."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    pred = ext_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = pred.join(docs.select("doc_id",
                                   F.col("lang").alias("true_lang")),
                       "doc_id")
    cm = (joined.groupBy("true_lang", "predicted_lang")
          .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    w = Window.partitionBy("true_lang")
    return cm.select(
        "true_lang", "predicted_lang", "n_docs",
        pround(F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(w), 6)
        .alias("frac_of_true"))


#: Dialect-neutral PII patterns (explicit classes only — the fn_regex
#: discipline): Java regex and RE2 agree character-for-character on these.
_EMAIL_PAT = "[a-z0-9]+@[a-z0-9.]+"
_PHONE_PAT = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "ext_pii_redact",
    oracle=f"""
        WITH enr AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                        || source || '.example.com or call 415-867-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
            FROM documents
        ),
        red AS (
            SELECT doc_id, s,
                   regexp_replace(regexp_replace(s,
                       '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                       '{_PHONE_PAT}', '<PHONE>', 'g') AS r
            FROM enr
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s, '{_EMAIL_PAT}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(s, '{_PHONE_PAT}')) AS BIGINT)
                   AS n_phones,
               CAST(length(s) - length(r) AS BIGINT) AS delta_len,
               md5(r) AS redacted_md5
        FROM red
    """,
    tags=("ext", "text", "pii"),
)
def ext_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass — the redaction step every public-web training
    corpus runs before tokenization: find email/phone shaped spans, replace
    with typed placeholder tokens, account for what was removed. The
    fixture corpus carries no organic PII, so each document is first
    enriched with a DETERMINISTIC synthetic contact string (derived from
    doc_id + source — same algebra both engines); the scrub itself is then
    fully exercised and the redacted output is pinned per-row by an md5.

    Scale shape: entirely row-local (concat, two regexp_replace passes,
    extract-all counts, md5) — zero shuffles, whole-stage codegen, the
    ideal 100 TB map pass. Patterns use explicit character classes only
    (no \\d/\\w shorthands, no lookaround), the dialect-neutral core where
    Java regex and DuckDB's RE2 agree exactly (see `fn_regex`)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    s = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@"), F.col("source"),
        F.lit(".example.com or call 415-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    enr = docs.select("doc_id", s.alias("s"))
    r = F.regexp_replace(
        F.regexp_replace(F.col("s"), _EMAIL_PAT, "<EMAIL>"),
        _PHONE_PAT, "<PHONE>")
    return (enr.withColumn("r", r)
            .select(
                "doc_id",
                F.size(F.regexp_extract_all("s", F.lit(_EMAIL_PAT), 0))
                .cast("long").alias("n_emails"),
                F.size(F.regexp_extract_all("s", F.lit(_PHONE_PAT), 0))
                .cast("long").alias("n_phones"),
                (F.length("s") - F.length("r")).cast("long")
                .alias("delta_len"),
                F.md5(F.col("r").cast("binary")).alias("redacted_md5")))


@register(
    "ext_unigram_logprob",
    oracle=f"""
        WITH toks AS ({_TOKENS_SQL}),
        clean AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
        tf AS (
            SELECT lang, doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
            FROM clean GROUP BY 1, 2, 3
        ),
        vocab AS (
            SELECT lang, tok, CAST(SUM(m) AS BIGINT) AS c
            FROM tf GROUP BY 1, 2
        ),
        tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM vocab GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.lang,
                   CAST(SUM(tf.m) AS BIGINT) AS n_tokens,
                   CAST(SUM(CAST(FLOOR(tf.m * -LN(v.c * 1.0 / tt.t) * 1e6
                                       + 5e-1) AS BIGINT)) AS BIGINT) AS sq
            FROM tf
            JOIN vocab v ON tf.lang = v.lang AND tf.tok = v.tok
            JOIN tot tt ON tf.lang = tt.lang
            GROUP BY tf.doc_id, tf.lang
        )
        SELECT doc_id, lang, n_tokens,
               (sq * 1.0 / (n_tokens * 1e6)) AS avg_nll,
               CAST(NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY sq * 1.0 / (n_tokens * 1e6), doc_id)
                    AS BIGINT) AS ppl_bucket
        FROM scored
    """,
    tags=("ext", "text", "quality", "lm"),
)
def ext_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal (Wenzek et al. 2020, arXiv:1911.00359):
    score every document by its average negative log-probability under a
    unigram LM trained on its own language's slice of the corpus, then cut
    each language into head/middle/tail perplexity tertiles — the bucket
    CCNet uses to decide what enters the training mix. (The published
    pipeline uses a 5-gram KenLM; the verifiable-in-SQL unit here is the
    unigram model — same join/score/bucket dataflow.)

    Scale shape: token counts are two map-side-combinable shuffles (per-doc
    tf, then per-lang vocab); the LM itself (vocab + totals) is vocabulary-
    sized — broadcast here, a plain shuffle join past the broadcast
    threshold; scoring is one more per-doc aggregation whose terms are
    int64-quantized per (doc, tok) group BEFORE summing, so the sum is
    exact in any order and the final quotient is one deterministic IEEE
    division. The tertile NTILE partitions by language — at 100 TB replace
    the per-language global sort with broadcast approx-percentile
    cutpoints + a map-side bucket compare (same contract, no sort)."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents"))
    tf = (toks.groupBy("lang", "doc_id", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("m")))
    vocab = tf.groupBy("lang", "tok").agg(F.sum("m").cast("long").alias("c"))
    tot = vocab.groupBy("lang").agg(F.sum("c").cast("long").alias("t"))
    model = vocab.join(tot, "lang")
    qterm = F.floor(F.col("m") * -F.log(F.col("c") * F.lit(1.0) / F.col("t"))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (tf.join(F.broadcast(model), ["lang", "tok"])
              .groupBy("doc_id", "lang")
              .agg(F.sum("m").cast("long").alias("n_tokens"),
                   F.sum(qterm).cast("long").alias("sq")))
    avg = F.col("sq") * F.lit(1.0) / (F.col("n_tokens") * F.lit(1e6))
    w = Window.partitionBy("lang").orderBy(avg.asc(), F.col("doc_id"))
    return scored.select(
        "doc_id", "lang", "n_tokens", avg.alias("avg_nll"),
        F.ntile(3).over(w).cast("long").alias("ppl_bucket"))


#: per-occurrence word bigrams (multiplicities kept — an LM needs counts,
#: unlike the DISTINCT shingles of the dedup family).
_BIGRAMS_SQL = """
    SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS bg
    FROM (SELECT doc_id, lang, w,
                 unnest(range(1, greatest(len(w), 1))) AS i
          FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
                FROM documents))
"""


@register(
    "ext_bigram_logprob",
    oracle=f"""
        WITH bgs AS ({_BIGRAMS_SQL}),
        tf AS (
            SELECT lang, doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
            FROM bgs GROUP BY 1, 2, 3
        ),
        c2 AS (
            SELECT lang, bg, CAST(SUM(m) AS BIGINT) AS c
            FROM tf GROUP BY 1, 2
        ),
        c1 AS (
            SELECT lang, string_split(bg, ' ')[1] AS w1,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM c2 GROUP BY 1, 2
        ),
        scored AS (
            SELECT tf.doc_id, tf.lang,
                   CAST(SUM(tf.m) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CAST(FLOOR(tf.m * -LN(c2.c * 1.0 / c1.n) * 1e6
                                       + 5e-1) AS BIGINT)) AS BIGINT) AS sq
            FROM tf
            JOIN c2 ON tf.lang = c2.lang AND tf.bg = c2.bg
            JOIN c1 ON tf.lang = c1.lang
                   AND string_split(tf.bg, ' ')[1] = c1.w1
            GROUP BY tf.doc_id, tf.lang
        )
        SELECT doc_id, lang, n_bigrams,
               (sq * 1.0 / (n_bigrams * 1e6)) AS avg_nll,
               CAST(NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY sq * 1.0 / (n_bigrams * 1e6),
                                            doc_id)
                    AS BIGINT) AS ppl_bucket
        FROM scored
    """,
    tags=("ext", "text", "quality", "lm"),
)
def ext_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram-LM quality signal — the next rung above
    ``ext_unigram_logprob`` on the CCNet/KenLM ladder (Wenzek et al. 2020,
    arXiv:1911.00359): score each document by the average negative log of
    the MLE conditional p(w2 | w1) = c(w1 w2) / c(w1 ·) under a per-language
    bigram model trained on the corpus itself (every scored bigram was
    observed, so no smoothing mass is needed for this in-corpus signal),
    then cut each language into perplexity tertiles. Fluent running prose
    scores low; shuffled or boilerplate-stitched text scores high even when
    its UNIGRAM profile is ordinary — that is the capability the bigram
    conditioning adds.

    Scale shape mirrors the unigram twin: per-occurrence bigram explode is
    map-side; per-doc tf and the per-language model (c2 bigram counts, c1
    prefix totals — both vocabulary-sized) are map-side-combinable
    shuffles; scoring quantizes each (doc, bigram) term to int64 1e-6
    units BEFORE summation, so the score is exact under any partitioning.
    At 100 TB the model tables broadcast while small and degrade to plain
    shuffle joins past the threshold; the per-language NTILE becomes
    broadcast percentile cutpoints."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    bgs = toks.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i+1])) "
            "ELSE array() END")).alias("bg"))
    tf = (bgs.groupBy("lang", "doc_id", "bg")
          .agg(F.count(F.lit(1)).cast("long").alias("m"))
          # lazy checkpoint: same 3x re-derivation shape as the
          # Kneser-Ney sibling (optimization round 12) -- tf feeds the
          # model tables and the scoring join across separate
          # broadcast-subtree jobs.
          .localCheckpoint(eager=False))
    c2 = tf.groupBy("lang", "bg").agg(F.sum("m").cast("long").alias("c"))
    c1 = (c2.select("lang", F.split("bg", " ").getItem(0).alias("w1"), "c")
          .groupBy("lang", "w1").agg(F.sum("c").cast("long").alias("n")))
    model = (c2.withColumn("w1", F.split("bg", " ").getItem(0))
             .join(c1, ["lang", "w1"]).select("lang", "bg", "c", "n"))
    qterm = F.floor(F.col("m") * -F.log(F.col("c") * F.lit(1.0) / F.col("n"))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (tf.join(F.broadcast(model), ["lang", "bg"])
              .groupBy("doc_id", "lang")
              .agg(F.sum("m").cast("long").alias("n_bigrams"),
                   F.sum(qterm).cast("long").alias("sq")))
    avg = F.col("sq") * F.lit(1.0) / (F.col("n_bigrams") * F.lit(1e6))
    w = Window.partitionBy("lang").orderBy(avg.asc(), F.col("doc_id"))
    return scored.select(
        "doc_id", "lang", "n_bigrams", avg.alias("avg_nll"),
        F.ntile(3).over(w).cast("long").alias("ppl_bucket"))


from project_etl_spark.operators.llm_dedup import ngrams_sql as _ngrams_sql


@register(
    "ext_decontaminate",
    oracle=f"""
        WITH grams AS ({_ngrams_sql(5)}),
        bucketed AS (SELECT doc_id, {_sc.BUCKET_SQL} AS bucket FROM documents),
        bench AS (
            SELECT DISTINCT g.sh
            FROM grams g JOIN bucketed b ON g.doc_id = b.doc_id
            WHERE b.bucket >= 950
        ),
        train AS (SELECT doc_id FROM bucketed WHERE bucket < 950),
        hits AS (
            SELECT g.doc_id, COUNT(*) AS n_hits
            FROM grams g
            JOIN train t ON g.doc_id = t.doc_id
            JOIN bench ON g.sh = bench.sh
            GROUP BY g.doc_id
        )
        SELECT t.doc_id,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_shared_ngrams,
               CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS is_contaminated
        FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    tags=("ext", "text", "decontaminate"),
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the step that keeps eval answers out of
    a training corpus: a deterministic 5% md5-bucket slice of ``documents``
    stands in for the benchmark/eval set, and every remaining (training)
    document is flagged when it shares at least one word 5-gram with any
    benchmark document. The benchmark 5-gram set is tiny relative to the
    corpus by construction, so it is broadcast and the flagging costs one
    map-side hash join over training n-grams — no shuffle of the corpus at
    100 TB. Emits (doc_id, n_shared_ngrams, is_contaminated) for every
    training document; drop the flagged rows to get the clean corpus."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import word_ngrams

    docs = table(spark, sf_dir, "documents")
    buckets = docs.select("doc_id", _sc.bucket_col().alias("bucket"))
    grams = word_ngrams(docs, 5)
    bench_sh = (grams.join(buckets.where(F.col("bucket") >= 950), "doc_id")
                .select("sh").distinct())
    train = buckets.where(F.col("bucket") < 950).select("doc_id")
    hits = (grams.join(train, "doc_id")
            .join(F.broadcast(bench_sh), "sh")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (train.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                    .alias("n_shared_ngrams"),
                    F.when(F.col("n_hits").isNull(), 0).otherwise(1)
                    .alias("is_contaminated")))


@register(
    "ext_repetition_score",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        stats AS (
            SELECT doc_id,
                   CAST(len(list_filter(w, x -> x <> '')) AS BIGINT) AS n_tokens,
                   greatest(len(w) - 2, 0) AS total_tri
            FROM base
        ),
        bg AS (
            SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
            FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w), 1))) AS i
                  FROM base)
        ),
        topbg AS (
            SELECT doc_id, c
            FROM (SELECT doc_id, bg, COUNT(*) AS c,
                         ROW_NUMBER() OVER (
                             PARTITION BY doc_id ORDER BY COUNT(*) DESC, bg
                         ) AS rn
                  FROM bg GROUP BY doc_id, bg)
            WHERE rn = 1
        ),
        tri AS (
            SELECT doc_id, COUNT(*) AS distinct_tri
            FROM ({_ngrams_sql(3)}) GROUP BY doc_id
        )
        SELECT s.doc_id, s.n_tokens,
               CAST(CASE WHEN s.n_tokens > 0 AND t.c IS NOT NULL
                    THEN FLOOR(2.0 * t.c / s.n_tokens * 1000000.0 + 0.5)
                         / 1000000.0
                    ELSE 0.0 END AS DOUBLE) AS top_bigram_frac,
               CAST(CASE WHEN s.total_tri > 0
                    THEN FLOOR((s.total_tri - COALESCE(r.distinct_tri, 0)) * 1.0
                               / s.total_tri * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS DOUBLE) AS dup_trigram_frac
        FROM stats s
        LEFT JOIN topbg t ON s.doc_id = t.doc_id
        LEFT JOIN tri r ON s.doc_id = r.doc_id
    """,
    tags=("ext", "text", "quality"),
)
def ext_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document — the quality features
    that catch boilerplate and degenerate generations: token coverage of the
    single most frequent word bigram (ties broken on the bigram string) and
    the duplicated-trigram fraction (1 - distinct/total). Everything is
    count algebra over exploded n-grams — map-side-combinable groupBys, no
    Python — and the ratios use the portable floor rounding so the whole
    row hash-checks against DuckDB."""
    ensure_deterministic(spark)
    from project_etl_spark.operators.llm_dedup import word_ngrams

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("w"))
    stats = base.select(
        "doc_id",
        F.size(F.filter("w", lambda x: x != "")).cast("bigint")
        .alias("n_tokens"),
        F.greatest(F.size("w") - 2, F.lit(0)).alias("total_tri"))
    bg = base.select("doc_id", F.explode(F.expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), "
        "i -> concat_ws(' ', w[i], w[i+1])) ELSE array() END")).alias("bg"))
    # argmax with the (count DESC, bigram ASC) tie-break as a single
    # map-side-combinable aggregate — min over struct(-c, bg) — instead of
    # a per-doc row_number window, which would add a sort of every bigram
    # group at scale.
    topbg = (bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
             .groupBy("doc_id")
             .agg(F.min(F.struct((-F.col("c")).alias("negc"), "bg"))
                  .alias("m"))
             .select("doc_id", (-F.col("m.negc")).alias("c")))
    tri = (word_ngrams(docs, 3).groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("distinct_tri")))
    top_frac = F.when(
        (F.col("n_tokens") > 0) & F.col("c").isNotNull(),
        pround(2.0 * F.col("c") / F.col("n_tokens"), 6)).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("total_tri") > 0,
        pround((F.col("total_tri") - F.coalesce("distinct_tri", F.lit(0)))
               / F.col("total_tri"), 6)).otherwise(F.lit(0.0))
    return (stats.join(topbg, "doc_id", "left").join(tri, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    top_frac.alias("top_bigram_frac"),
                    dup_frac.alias("dup_trigram_frac")))


@register(
    "ext_domain_mix_temperature",
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        weighted AS (
            SELECT lang, n_docs,
                   CAST(FLOOR(sqrt(n_docs) * 1000000.0) AS BIGINT) AS w_q
            FROM counts
        ),
        budgeted AS (
            SELECT lang, n_docs, w_q,
                   ((SELECT CAST(SUM(n_docs) AS BIGINT) // 2 FROM counts)
                    * w_q) // (SELECT CAST(SUM(w_q) AS BIGINT) FROM weighted)
                       AS budget
            FROM weighted
        ),
        rates AS (
            SELECT lang, n_docs, w_q,
                   least(1000, (budget * 1000) // n_docs) AS keep_buckets
            FROM budgeted
        ),
        kept AS (
            SELECT d.lang
            FROM documents d
            JOIN rates r ON d.lang = r.lang
            WHERE {_sc.BUCKET_SQL} < r.keep_buckets
        )
        SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs, r.w_q,
               CAST(r.keep_buckets AS BIGINT) AS keep_buckets,
               CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept
        FROM rates r
        LEFT JOIN (SELECT lang, COUNT(*) AS n FROM kept GROUP BY lang) k
          ON r.lang = k.lang
    """,
    tags=("ext", "text", "sampling"),
)
def ext_domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual data-mixing
    recipe): per-domain sampling weight proportional to count^0.5
    (temperature tau=2), so over-represented domains are down-sampled
    toward — but not onto — a uniform mix. The sqrt weights are quantized
    to int64 BEFORE the cross-domain sum, keeping every later step integer
    algebra (order-independent, engine-portable); membership is the same
    md5-bucket predicate the other samplers share, evaluated row-local in
    the scan stage. The per-domain rate table is metadata-sized (one row
    per domain) and broadcasts; the corpus itself is never shuffled.
    Emits (lang, n_docs, w_q, keep_buckets, n_kept) per domain."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    rates = (counts
             .withColumn("w_q", F.floor(F.sqrt("n_docs") * 1e6).cast("bigint"))
             .withColumn("budget", F.expr(
                 "((sum(n_docs) over () div 2) * w_q) div (sum(w_q) over ())"))
             .withColumn("keep_buckets",
                         F.least(F.lit(1000).cast("bigint"),
                                 F.expr("(budget * 1000) div n_docs")))
             .drop("budget"))
    kept = (docs.withColumn("bucket", _sc.bucket_col())
            .join(F.broadcast(rates.select("lang", "keep_buckets")), "lang")
            .where(F.col("bucket") < F.col("keep_buckets"))
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept")))
    return (rates.join(kept, "lang", "left")
            .select("lang", "n_docs", "w_q", "keep_buckets",
                    F.coalesce("n_kept", F.lit(0)).cast("bigint")
                    .alias("n_kept")))


@register(
    "ext_token_budget_allocator",
    oracle=f"""
        WITH counts AS (
            SELECT lang,
                   CAST(SUM({_sc.WS_COUNT_SQL}) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang
        ),
        weighted AS (
            SELECT lang, n_tokens,
                   CAST(FLOOR(SQRT(n_tokens) * 1e6) AS BIGINT) AS w_q,
                   CAST(SUM(n_tokens) OVER () // 2 AS BIGINT) AS budget,
                   CAST(SUM(CAST(FLOOR(SQRT(n_tokens) * 1e6) AS BIGINT))
                        OVER () AS BIGINT) AS w_tot
            FROM counts
        ),
        quota AS (
            SELECT lang, n_tokens, w_q,
                   (budget * w_q) // w_tot AS base_alloc,
                   (budget * w_q) % w_tot AS remainder,
                   budget - CAST(SUM((budget * w_q) // w_tot) OVER ()
                                 AS BIGINT) AS leftover
            FROM weighted
        ),
        ranked AS (
            SELECT lang, n_tokens, w_q, base_alloc, leftover,
                   ROW_NUMBER() OVER (ORDER BY remainder DESC, lang) AS rr
            FROM quota
        )
        SELECT lang, n_tokens, w_q,
               CAST(base_alloc AS BIGINT) AS base_alloc,
               CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
                   AS extra,
               CAST(base_alloc
                    + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_tokens
        FROM ranked
    """,
    tags=("ext", "text", "mixing"),
)
def ext_token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer token-budget apportionment — the step AFTER choosing mixing
    weights (``ext_domain_mix_temperature`` picks tau-tempered weights;
    this turns them into an EXACT integer allocation): each language gets
    floor(budget * w_i / W) tokens, and the leftover from the floors is
    distributed one token at a time by largest fractional remainder
    (Hamilton apportionment), tie-broken by language — so the allocations
    sum to the budget EXACTLY, with no float in the pipeline after the
    one sqrt-weight quantization. This is how a training-mix config file
    gets concrete per-domain token counts that reconcile to the total.

    Scale: the per-domain table is metadata-sized (one row per domain);
    every window runs over |domains| rows. The budget*weight products are
    int64 here; at extreme scales (1e12-token budgets) widen to
    decimal(38,0) — the algebra is unchanged."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    counts = (docs.groupBy("lang")
              .agg(F.sum(_sc.ws_count_col().cast("long")).cast("long")
                   .alias("n_tokens")))
    wall = Window.partitionBy()
    weighted = (counts
                .withColumn("w_q", F.floor(F.sqrt("n_tokens") * F.lit(1e6))
                            .cast("long"))
                .withColumn("budget",
                            F.expr("sum(n_tokens) over () div 2"))
                .withColumn("w_tot", F.sum("w_q").over(wall)))
    quota = (weighted
             .withColumn("base_alloc",
                         F.expr("(budget * w_q) div w_tot"))
             .withColumn("remainder", (F.col("budget") * F.col("w_q"))
                         % F.col("w_tot"))
             .withColumn("leftover",
                         F.col("budget") - F.sum("base_alloc").over(wall)))
    ranked = quota.withColumn(
        "rr", F.row_number().over(
            Window.orderBy(F.col("remainder").desc(), "lang")))
    extra = F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "lang", "n_tokens", "w_q",
        F.col("base_alloc").cast("long").alias("base_alloc"),
        extra.cast("long").alias("extra"),
        (F.col("base_alloc") + extra).cast("long").alias("alloc_tokens"))


@register(
    "ext_bpe_merge_step",
    oracle="""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        counted AS (
            SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w
        ),
        pairs AS (
            SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b,
                   CAST(SUM(freq) AS BIGINT) AS pair_freq
            FROM (SELECT w, freq, unnest(range(1, len(w))) AS i FROM counted)
            GROUP BY 1, 2
        )
        SELECT a, b, pair_freq,
               CAST(ROW_NUMBER() OVER (ORDER BY pair_freq DESC, a, b)
                    AS BIGINT) AS merge_rank
        FROM pairs
        ORDER BY pair_freq DESC, a, b
        LIMIT 20
    """,
    tags=("ext", "text", "bpe"),
)
def ext_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE vocabulary-induction step at corpus scale — the inner loop
    of tokenizer training: count adjacent symbol pairs weighted by word
    frequency, rank the merge candidates. Compressing to the distinct-word
    table FIRST (the classic BPE trick) means the expensive per-character
    explode runs over the vocabulary, not the corpus — at 100 TB the word
    count table is orders of magnitude smaller than the token stream, and
    both aggregations are map-side combinable. Deterministic total order
    (freq DESC, then pair) makes the top-20 merge table hash-exact."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    counted = (docs.select(F.explode(F.split("text", " ")).alias("w"))
               .where(F.col("w") != "")
               .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    pairs = (counted
             .select("freq", F.posexplode(F.expr(
                 "transform(sequence(1, length(w) - 1), "
                 "i -> struct(substring(w, i, 1) as a,"
                 " substring(w, i + 1, 1) as b))")).alias("_p", "pr"))
             .where(F.expr("length(pr.a) > 0 AND length(pr.b) > 0"))
             .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
             .agg(F.sum("freq").alias("pair_freq")))
    w = Window.orderBy(F.col("pair_freq").desc(), "a", "b")
    return (pairs.withColumn("merge_rank",
                             F.row_number().over(w).cast("bigint"))
            .orderBy(F.col("pair_freq").desc(), "a", "b")
            .limit(20))


@register(
    "ext_dataset_card",
    oracle=f"""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               CAST(SUM({_sc.WS_COUNT_SQL}) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(COUNT(*) - COUNT(DISTINCT md5(lower(trim(text))))
                    AS BIGINT) AS n_exact_dup_docs,
               CAST(MIN(n_chars) AS BIGINT) AS min_doc_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_doc_chars
        FROM documents
    """,
    tags=("ext", "text", "profile"),
)
def ext_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query dataset card — the corpus profile a training run records
    up front: doc/token/char budgets, language and source breadth, exact
    duplicate mass, length envelope. ONE aggregation pass over one scan
    (the distinct counts ride the same shuffle); every figure is integer
    algebra, so the single-row card is hash-exact. Deeper signals
    (near-dup clusters, contamination, repetition) have their own
    queries — this is the cheap always-run header."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(_sc.ws_count_col().cast("long")).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.lower(F.trim("text")))))
        .alias("n_exact_dup_docs"),
        F.min("n_chars").alias("min_doc_chars"),
        F.max("n_chars").alias("max_doc_chars"))


#: BM25 constants + query terms — one copy feeding builder and oracle.
#: e-notation literals: DOUBLE in both Spark SQL and DuckDB (never DECIMAL).
_BM25_K1 = "1.2e0"
_BM25_B = "7.5e-1"
_BM25_TERMS = ("spark", "join", "window")


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, n_terms_hit, score) BM25 table for the fixed 3-term query —
    THE scoring pipeline, shared by ``ext_bm25_topk`` and the RRF fusion in
    ``llm_curation`` so the weighting algebra exists exactly once. The token
    stream is filtered to the query terms inside the explode stage; corpus
    stats and per-term df are broadcasts; ``score`` is the raw double (the
    consumers quantize at their own output edge)."""
    toks = _tokens(docs).select("doc_id", "tok")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1)))
                   .alias("avgdl"))
    tf = (toks.where(F.col("tok").isin(*_BM25_TERMS))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    k1, b = float(_BM25_K1.replace("e0", "")), 0.75
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    term = (idf * (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_terms_hit"),
                 F.sum(term).alias("score")))


#: SQL twin of :func:`bm25_scored` (CTE bodies ending in ``scored``) — one
#: copy feeding the ``ext_bm25_topk`` oracle and the RRF fusion oracle.
_BM25_SCORED_SQL = f"""toks AS ({_TOKENS_SQL}),
        clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        dl AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
            FROM clean GROUP BY doc_id
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   (CAST(SUM(dl) AS BIGINT) * 1e0 / COUNT(*)) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM clean
            WHERE tok IN {_BM25_TERMS!r}
            GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tf GROUP BY tok
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
                   SUM(LN(1e0 + (s.n_docs - df.df + 5e-1) / (df.df + 5e-1))
                       * (tf.tf * ({_BM25_K1} + 1e0))
                       / (tf.tf + {_BM25_K1} * (1e0 - {_BM25_B}
                          + {_BM25_B} * dl.dl / s.avgdl))) AS score
            FROM tf
            JOIN df ON tf.tok = df.tok
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats s
            GROUP BY tf.doc_id
        )"""


@register(
    "ext_bm25_topk",
    oracle=f"""
        WITH {_BM25_SCORED_SQL}
        SELECT doc_id, n_terms_hit,
               (FLOOR(score * 1e6 + 5e-1) / 1e6) AS bm25
        FROM scored
        ORDER BY FLOOR(score * 1e6 + 5e-1) DESC, doc_id
        LIMIT 10
    """,
    tags=("ext", "text", "search"),
)
def ext_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones probabilistic
    weighting, the Lucene-default scoring function): top-10 documents for
    a fixed 3-term query, k1=1.2, b=0.75, with Lucene's non-negative idf
    ln(1 + (N - df + .5)/(df + .5)).

    Scale shape: the token stream is filtered to the QUERY TERMS inside
    the explode stage (predicate on the generated column, so the per-doc
    tf table is query-sized, not corpus-sized); document lengths are one
    map-side-combinable aggregate; corpus stats (N, avgdl) are a
    single-row broadcast and per-term df a terms-sized broadcast. Scoring
    is row-local IEEE algebra on (tf, df, dl) — identical op sequence in
    the oracle — and the final top-10 is TakeOrderedAndProject on the
    int-quantized score with a doc_id tie-break, never a global sort."""
    ensure_deterministic(spark)
    scored = bm25_scored(table(spark, sf_dir, "documents"))
    return (scored
            .orderBy(F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).desc(),
                     F.col("doc_id"))
            .limit(10)
            .select("doc_id", "n_terms_hit",
                    (F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5))
                     / F.lit(1e6)).alias("bm25")))


@register(
    "ext_corpus_entropy",
    oracle=f"""
        WITH toks AS ({_TOKENS_SQL}),
        clean AS (SELECT lang, tok FROM toks WHERE tok <> ''),
        vocab AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM clean GROUP BY lang, tok
        ),
        tot AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size
            FROM vocab GROUP BY lang
        )
        SELECT v.lang, MAX(tt.t) AS n_tokens, MAX(tt.vocab_size) AS vocab_size,
               (-(CAST(SUM(CAST(FLOOR(v.c * LN(v.c * 1e0 / tt.t) * 1e6 + 5e-1)
                                AS BIGINT)) AS BIGINT) * 1e0 / 1e6)
                / MAX(tt.t) / LN(2e0)) AS entropy_bits
        FROM vocab v JOIN tot tt ON v.lang = tt.lang
        GROUP BY v.lang
    """,
    tags=("ext", "text", "stats"),
)
def ext_corpus_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language unigram (Shannon) entropy in bits — the corpus-health
    signal behind diversity monitoring and compression-ratio estimates:
    H = -(1/T) * sum_t c_t * ln(c_t / T) / ln 2 over the language's
    vocabulary. Each term is int64-quantized BEFORE summing (order-
    independent exact reduction; the per-term ln is one IEEE op on
    identical inputs in both engines), then two deterministic divisions.

    Scale shape: two map-side-combinable token shuffles (per-(lang, tok)
    counts, per-lang totals), then a vocabulary-sized join keyed on lang —
    the corpus itself is never shuffled twice."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents")).select("lang", "tok")
    vocab = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    tot = vocab.groupBy("lang").agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"))
    qterm = F.floor(F.col("c") * F.log(F.col("c") * F.lit(1e0) / F.col("t"))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")
    import math
    return (vocab.join(F.broadcast(tot), "lang")
            .groupBy("lang")
            .agg(F.max("t").alias("n_tokens"),
                 F.max("vocab_size").alias("vocab_size"),
                 (-(F.sum(qterm).cast("long") * F.lit(1e0) / F.lit(1e6))
                  / F.max("t") / F.lit(math.log(2.0))).alias("entropy_bits")))


@register(
    "ext_zipf_slope",
    oracle=f"""
        WITH toks AS ({_TOKENS_SQL}),
        clean AS (SELECT lang, tok FROM toks WHERE tok <> ''),
        vocab AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM clean GROUP BY lang, tok
        ),
        ranked AS (
            SELECT lang, c,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY c DESC, tok) AS r
            FROM vocab
        ),
        q AS (
            SELECT lang,
                   CAST(FLOOR(LN(r * 1e0) * 1e6 + 5e-1) AS BIGINT) AS xq,
                   CAST(FLOOR(LN(c * 1e0) * 1e6 + 5e-1) AS BIGINT) AS yq,
                   CAST(FLOOR(LN(r * 1e0) * LN(c * 1e0) * 1e6 + 5e-1)
                        AS BIGINT) AS xyq,
                   CAST(FLOOR(LN(r * 1e0) * LN(r * 1e0) * 1e6 + 5e-1)
                        AS BIGINT) AS xxq
            FROM ranked
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
               ((COUNT(*) * (CAST(SUM(xyq) AS BIGINT) * 1e-6)
                 - (CAST(SUM(xq) AS BIGINT) * 1e-6)
                   * (CAST(SUM(yq) AS BIGINT) * 1e-6))
                / (COUNT(*) * (CAST(SUM(xxq) AS BIGINT) * 1e-6)
                   - (CAST(SUM(xq) AS BIGINT) * 1e-6)
                     * (CAST(SUM(xq) AS BIGINT) * 1e-6))) AS zipf_slope
        FROM q GROUP BY lang
    """,
    tags=("ext", "text", "stats", "regression"),
)
def ext_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent per language: OLS slope of ln(frequency) on
    ln(rank) over the full rank-frequency table (natural text ~ -1; the
    synthetic corpus's flatter slope is itself a fingerprint). This is the
    registry's aggregate-OLS primitive: slope = (n·Σxy − Σx·Σy) /
    (n·Σx² − (Σx)²) with every sum an int64-quantized exact reduction, so
    the regression is reproducible at any parallelism in both engines.

    Scale shape: per-(lang, tok) counts (map-side combinable), a rank
    window per language (the vocabulary, not the corpus, is windowed),
    then one aggregation of quantized moment terms."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents")).select("lang", "tok")
    vocab = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "tok")
    ranked = vocab.withColumn("r", F.row_number().over(w))
    x = F.log(F.col("r") * F.lit(1e0))
    y = F.log(F.col("c") * F.lit(1e0))
    qq = lambda e: F.floor(e * F.lit(1e6) + F.lit(0.5)).cast("long")
    q = ranked.select("lang", qq(x).alias("xq"), qq(y).alias("yq"),
                      qq(x * y).alias("xyq"), qq(x * x).alias("xxq"))
    n = F.count(F.lit(1))
    sx = F.sum("xq").cast("long") * F.lit(1e-6)
    sy = F.sum("yq").cast("long") * F.lit(1e-6)
    sxy = F.sum("xyq").cast("long") * F.lit(1e-6)
    sxx = F.sum("xxq").cast("long") * F.lit(1e-6)
    return (q.groupBy("lang")
            .agg(n.cast("long").alias("n_types"),
                 ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 .alias("zipf_slope")))


# --------------------------------------------------------------------------
# ext_chunk_overlap — RAG / context-window chunking
# --------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48

_CHUNK_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), starts AS (
    SELECT doc_id, w, len(w) AS n,
           unnest(range(0, greatest(len(w), 1), {_STRIDE})) AS start
    FROM toks
)
SELECT doc_id, CAST(start // {_STRIDE} AS INT) AS chunk_idx,
       CAST(least({_CHUNK}, n - start) AS INT) AS n_tok,
       md5(array_to_string(w[start + 1 : least(start + {_CHUNK}, n)], ' '))
           AS chunk_md5
FROM starts
"""


@register("ext_chunk_overlap", oracle=_CHUNK_SQL, tags=("ext", "text"))
def ext_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the retrieval/context-window
    prep step of every RAG and long-context training pipeline: 64-token
    chunks at stride 48 (16-token overlap so no sentence is split across a
    hard boundary without appearing whole in a neighbor). Expressed as
    ``sequence -> explode -> slice``: the chunk table is derived row-locally
    from the token array, no shuffle at all until a consumer aggregates.
    Chunk identity is the md5 of the joined slice, so the (doc_id,
    chunk_idx, n_tok, chunk_md5) contract pins the exact split points
    cross-engine. At 100 TB: purely map-side; chunk count ~= tokens/stride
    scales linearly and inherits the document table's partitioning."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    chunks = toks.select(
        "doc_id", "w", F.size("w").alias("n"),
        F.explode(F.expr(
            f"sequence(0, greatest(size(w) - 1, 0), {_STRIDE})")).alias("start"))
    return chunks.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("start")).cast("int")
        .alias("n_tok"),
        F.expr(f"md5(concat_ws(' ', slice(w, start + 1, {_CHUNK})))")
        .alias("chunk_md5"))


# --------------------------------------------------------------------------
# ext_chat_template_pack — SFT sample rendering with loss-mask accounting
# --------------------------------------------------------------------------

_CHAT_SQL = """
WITH turns AS (
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS turn_idx,
           event_type, json_extract_string(props, '$.k') AS k
    FROM events
    QUALIFY turn_idx < 6
), pieces AS (
    SELECT user_id, turn_idx,
           '<|' || CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END
           || '|>' || event_type || '#' || k AS piece
    FROM turns
)
SELECT user_id AS sample_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       md5(string_agg(piece, '' ORDER BY turn_idx)) AS template_md5,
       CAST(length(string_agg(piece, '' ORDER BY turn_idx)) AS BIGINT)
           AS n_chars,
       CAST(SUM(CASE WHEN turn_idx % 2 = 1 THEN length(piece) ELSE 0 END)
            AS BIGINT) AS mask_chars
FROM pieces GROUP BY user_id
"""


@register("ext_chat_template_pack", oracle=_CHAT_SQL,
          tags=("ext", "text", "sft"))
def ext_chat_template_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering for SFT — the step that turns an interaction
    log into training samples: each user's first six events become
    alternating user/assistant turns wrapped in role tags, and the
    per-sample LOSS-MASK budget (characters inside assistant turns — the
    only spans that take gradient) is accounted alongside. The rendered
    string is md5-pinned, so the exact template byte layout — tag
    placement, turn order, no separator drift — is the hash-checked
    contract (a template off by one byte silently changes every token id
    downstream). Turn order is the acquisition total order (ts, event_id),
    the same discipline as the run-log sequence
    (DAQ_self-triggering.md:46-51).

    Shape: one per-user window rank, one groupBy with an ordered
    collect -> transform -> concat (sorted in the aggregate, so the
    assembly is partition-invariant); everything else is row-local."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    turns = (ev.select("user_id", "ts", "event_id", "event_type",
                       F.get_json_object("props", "$.k").alias("k"))
             .withColumn("turn_idx", F.row_number().over(w) - 1)
             .where(F.col("turn_idx") < 6))
    piece = F.concat(
        F.lit("<|"),
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
         .otherwise(F.lit("assistant")),
        F.lit("|>"), F.col("event_type"), F.lit("#"), F.col("k"))
    agg = (turns.select("user_id", "turn_idx", piece.alias("piece"))
           .groupBy("user_id").agg(
               F.count(F.lit(1)).alias("n_turns"),
               F.expr("concat_ws('', transform(array_sort("
                      "collect_list(struct(turn_idx, piece))), "
                      "s -> s.piece))").alias("rendered"),
               F.sum(F.when(F.col("turn_idx") % 2 == 1, F.length("piece"))
                     .otherwise(F.lit(0))).alias("mask_chars")))
    return agg.select(
        F.col("user_id").alias("sample_id"), "n_turns",
        F.md5("rendered").alias("template_md5"),
        F.length("rendered").cast("long").alias("n_chars"),
        F.col("mask_chars").cast("long").alias("mask_chars"))


# --------------------------------------------------------------------------
# ext_span_corruption — T5-style denoising objective construction
# --------------------------------------------------------------------------

_SPAN_H_SPARK = ("cast(conv(substring(md5(concat(doc_id, '#', span)), 1, 15),"
                 " 16, 10) as bigint) % 2147483647")

_SPAN_SQL = """
WITH toks AS (
    SELECT doc_id, i - 1 AS pos, w[i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         LATERAL unnest(range(1, len(w) + 1)) t(i)
), spans AS (
    SELECT doc_id, pos, tok, pos // 3 AS span,
           (CAST(concat('0x', substr(md5(doc_id || '#' || span), 1, 15))
                 AS BIGINT) % 2147483647) % 100 < 15 AS masked
    FROM toks
), span_flags AS (
    SELECT doc_id, span, MAX(CAST(masked AS INT)) AS m,
           CAST(SUM(MAX(CAST(masked AS INT))) OVER
               (PARTITION BY doc_id ORDER BY span) AS BIGINT)
               - MAX(CAST(masked AS INT)) AS sent_idx
    FROM spans GROUP BY doc_id, span
), joined AS (
    SELECT s.*, f.sent_idx,
           row_number() OVER (PARTITION BY s.doc_id, s.span ORDER BY s.pos)
               AS rn_in_span
    FROM spans s JOIN span_flags f ON s.doc_id = f.doc_id AND s.span = f.span
), inp AS (
    SELECT doc_id,
           md5(string_agg(CASE WHEN NOT masked THEN tok
                               WHEN rn_in_span = 1 THEN '<X' || sent_idx || '>'
                          END, ' ' ORDER BY pos)
               FILTER (WHERE NOT masked OR rn_in_span = 1)) AS input_md5
    FROM joined GROUP BY doc_id
), tgt AS (
    SELECT doc_id,
           md5(string_agg(CASE WHEN rn_in_span = 1
                               THEN '<X' || sent_idx || '> ' || tok
                               ELSE tok END, ' ' ORDER BY pos)) AS target_md5,
           CAST(COUNT(*) AS BIGINT) AS n_masked
    FROM joined WHERE masked GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(t.n_masked, 0) AS n_masked,
       i.input_md5, COALESCE(t.target_md5, md5('')) AS target_md5
FROM (SELECT doc_id, COUNT(*) AS n_tokens FROM spans GROUP BY doc_id) s
JOIN inp i ON s.doc_id = i.doc_id
LEFT JOIN tgt t ON s.doc_id = t.doc_id
"""


@register("ext_span_corruption", oracle=_SPAN_SQL,
          tags=("ext", "text", "pretraining"))
def ext_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683):
    ~15% of 3-token spans are masked; the INPUT replaces each masked span
    with one numbered sentinel <Xi>, the TARGET lists sentinel + original
    tokens — the denoising sample pair of encoder-decoder pretraining.
    Mask positions come from the portable md5 hash of (doc_id, span), so
    the corruption is deterministic and identical in both engines — the
    property a resumable data pipeline needs (re-running a shard must
    regenerate byte-identical samples). Input/target renderings are
    md5-pinned per document.

    Shape: span flags are one aggregate over (doc, span); sentinel
    numbering is one cumulative window over the (small) span table; both
    renderings assemble in ordered aggregates — all partition-invariant,
    no Python anywhere."""
    ensure_deterministic(spark)
    from pyspark.sql.window import Window as W
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    spans = (toks.withColumn("span", (F.col("pos") / 3).cast("long"))
             .withColumn("masked", F.expr(_SPAN_H_SPARK) % 100 < 15))
    wdoc = W.partitionBy("doc_id").orderBy("span")
    span_flags = (spans.groupBy("doc_id", "span")
                  .agg(F.max(F.col("masked").cast("int")).alias("m"))
                  .withColumn("sent_idx", F.sum("m").over(wdoc) - F.col("m")))
    # Measured in optimization round 13 (the experiment round 12
    # deferred): an explicit pre-agg repartition(defaultParallelism,
    # doc_id) here — to stop AQE coalescing the ~1.6 MB exchange under
    # the rendering aggregates to one partition — made the query SLOWER
    # (1.95 -> 2.52 s median of 3): the extra exchange plus the window's
    # (doc_id, span) re-shuffle cost more than the single-task render
    # saves. AQE's coalesce is the right call at this size; left alone.
    joined = spans.join(span_flags.select("doc_id", "span", "sent_idx"),
                        ["doc_id", "span"])
    wspan = W.partitionBy("doc_id", "span").orderBy("pos")
    ordered_md5 = ("md5(concat_ws(' ', transform(array_sort("
                   "collect_list(struct(pos, piece))), s -> s.piece)))")
    inp = (joined.withColumn("rn_in_span", F.row_number().over(wspan))
           .select("doc_id", "pos",
                   F.when(~F.col("masked"), F.col("tok"))
                    .when(F.col("rn_in_span") == 1,
                          F.concat(F.lit("<X"), F.col("sent_idx"), F.lit(">")))
                    .alias("piece"))
           .where(F.col("piece").isNotNull())
           .groupBy("doc_id").agg(F.expr(ordered_md5).alias("input_md5")))
    tgt = (joined.where(F.col("masked"))
           .withColumn("rn_in_span", F.row_number().over(wspan))
           .select("doc_id", "pos",
                   F.when(F.col("rn_in_span") == 1,
                          F.concat(F.lit("<X"), F.col("sent_idx"),
                                   F.lit("> "), F.col("tok")))
                    .otherwise(F.col("tok")).alias("piece"))
           .groupBy("doc_id").agg(F.expr(ordered_md5).alias("target_md5"),
                                  F.count(F.lit(1)).alias("n_masked")))
    stats = spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (stats.join(inp, "doc_id").join(tgt, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
                    "input_md5",
                    F.coalesce("target_md5", F.md5(F.lit("")))
                    .alias("target_md5")))


# --------------------------------------------------------------------------
# ext_pack_efficiency — the packing audit
# --------------------------------------------------------------------------

_PACK_EFF_SQL = f"""
WITH t AS (
    SELECT doc_id, lang, CAST({{ws}} AS BIGINT) AS n_tok FROM documents
), c AS (
    SELECT doc_id, lang, n_tok,
           SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
), packs AS (
    SELECT lang, CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY 1, 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(pack_tokens) AS BIGINT) AS used_tokens,
       CAST(COUNT(*) * 2048 AS BIGINT) AS capacity_tokens,
       FLOOR((CAST(SUM(pack_tokens) AS BIGINT) * 1e0 / (COUNT(*) * 2048))
             * 1e6 + 5e-1) / 1e6 AS fill_ratio,
       CAST(MIN(pack_tokens) AS BIGINT) AS lightest_pack
FROM packs GROUP BY lang
"""


@register("ext_pack_efficiency",
          oracle=_PACK_EFF_SQL.format(ws=_sc.WS_COUNT_SQL),
          tags=("ext", "text", "packing"))
def ext_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit — the number a training run actually pays
    for: of the token capacity the ``ext_sequence_pack`` bins reserve
    (B=2048 each), what fraction holds real tokens? Fill ratio below ~0.9
    means the batch is burning FLOPs on padding and the packer (or the
    length distribution feeding it) needs attention; the lightest pack per
    language is the tail straggler. Re-derives the registered packing
    fragment and reduces it to a per-language census — exact integer token
    accounting, one fixed-order division for the ratio."""
    ensure_deterministic(spark)
    packs = ext_sequence_pack(spark, sf_dir)
    return (packs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum("pack_tokens").alias("used_tokens"),
                 (F.count(F.lit(1)) * F.lit(2048)).cast("long")
                 .alias("capacity_tokens"),
                 pround(F.sum("pack_tokens")
                        / (F.count(F.lit(1)) * F.lit(2048.0)), 6)
                 .alias("fill_ratio"),
                 F.min("pack_tokens").alias("lightest_pack")))


# --------------------------------------------------------------------------
# ext_heavy_hitters_cms — count-min-sketch frequency estimation
# --------------------------------------------------------------------------

#: Count-min geometry: 4 hash rows x 256 counters, hashes derived from
#: md5(token || ':' || j) — deterministic, engine-portable integer
#: algebra (the same discipline as the Bloom gate in llm_dedup).
_CMS_D = 4
_CMS_W = 256

_CMS_SQL = f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    clean AS (SELECT tok FROM toks WHERE tok <> ''),
    occ AS (
        SELECT tok, j.j,
               CAST(concat('0x', substr(md5(tok || ':' ||
                                            CAST(j.j AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CMS_W} AS bucket
        FROM clean, generate_series(0, {_CMS_D - 1}) j(j)
    ),
    sketch AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM occ GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
              FROM clean GROUP BY tok),
    vpos AS (
        SELECT v.tok, v.true_count, j.j,
               CAST(concat('0x', substr(md5(v.tok || ':' ||
                                            CAST(j.j AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CMS_W} AS bucket
        FROM vocab v, generate_series(0, {_CMS_D - 1}) j(j)
    ),
    est AS (
        SELECT vp.tok, vp.true_count, MIN(s.c) AS est
        FROM vpos vp JOIN sketch s ON vp.j = s.j AND vp.bucket = s.bucket
        GROUP BY 1, 2
    )
    SELECT tok, CAST(est AS BIGINT) AS est_count, true_count,
           CAST(est - true_count AS BIGINT) AS overcount
    FROM est ORDER BY est DESC, tok LIMIT 10
"""


@register("ext_heavy_hitters_cms", oracle=_CMS_SQL,
          tags=("ext", "text", "sketch"))
def ext_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch (Cormode-Muthukrishnan
    2005) — the bounded-memory frequency estimator a 100 TB pipeline uses
    where an exact token count table would itself be a giant shuffle:
    4 x 256 integer counters, every update map-side-combinable, the whole
    sketch mergeable across shards/days by cell-wise addition. Estimate =
    min over the 4 hashed cells; it can only OVERcount (collisions add,
    never subtract), which the output proves by carrying the exact count
    and the non-negative overcount beside each estimate. Top-10 by
    estimate, token tie-break.

    The hashes are the repo's portable md5 integer algebra — the sketch
    is engine-reproducible, unlike an opaque binary
    ``count_min_sketch()`` blob. The exact-count comparison column is
    fixture-scale instrumentation: at 100 TB you would publish the
    sketch alone (1 KB) and skip the vocab shuffle entirely."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    clean = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .where(F.col("tok") != ""))
    j = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    bucket = F.expr(
        f"cast(conv(substring(md5(concat(tok, ':', cast(j as string))),"
        f" 1, 8), 16, 10) as bigint) % {_CMS_W}")
    sketch = (clean.select("tok", j).select("tok", "j",
                                            bucket.alias("bucket"))
              .groupBy("j", "bucket")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    vocab = (clean.groupBy("tok")
             .agg(F.count(F.lit(1)).cast("long").alias("true_count")))
    vpos = (vocab.select("tok", "true_count", j)
            .select("tok", "true_count", "j", bucket.alias("bucket")))
    est = (vpos.join(F.broadcast(sketch), ["j", "bucket"])
           .groupBy("tok", "true_count")
           .agg(F.min("c").alias("est")))
    return (est.select("tok", F.col("est").cast("long").alias("est_count"),
                       "true_count",
                       (F.col("est") - F.col("true_count")).cast("long")
                       .alias("overcount"))
            .orderBy(F.col("est_count").desc(), "tok").limit(10))


# --------------------------------------------------------------------------
# ext_unicode_normalize — NFC canonicalization audit
# --------------------------------------------------------------------------

#: Decorations planted per doc_id % 3: a decomposed pair (e + U+0301
#: COMBINING ACUTE -> U+00E9), a singleton compatibility-free composition
#: case (U+212B ANGSTROM SIGN -> U+00C5), and an already-NFC composed
#: string (U+00E9, the normalization fixed point). All BMP code points,
#: where Spark's UTF-16 ``length`` and DuckDB's code-point ``length``
#: agree.
_NFC_DECOR_SQL = """
    CASE CAST(doc_id % 3 AS INT)
        WHEN 0 THEN 'e' || chr(769) || 'cole'
        WHEN 1 THEN chr(8491) || 'ngstrom'
        ELSE chr(233) || 'cole'
    END
"""

_NFC_SQL = f"""
WITH enr AS (
    SELECT doc_id, text || ' ' || {_NFC_DECOR_SQL} AS s FROM documents
)
SELECT doc_id,
       CAST(length(s) AS BIGINT) AS len_raw,
       CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc,
       (s <> nfc_normalize(s)) AS changed,
       md5(nfc_normalize(s)) AS nfc_md5
FROM enr
"""


@register("ext_unicode_normalize", oracle=_NFC_SQL,
          tags=("ext", "text", "normalize", "udf"))
def ext_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization — the zeroth stage of every web-text
    pipeline: the same glyph arrives from different crawls as composed
    (U+00E9) or decomposed (e + U+0301) code-point sequences, so every
    downstream equality — exact dedup fingerprints, shingle hashes, token
    counts — silently fractures until the corpus is canonicalized. The
    fixture text is ASCII, so each doc is decorated with a deterministic
    doc_id-keyed suffix covering the three interesting cases (decomposed
    pair, ANGSTROM-SIGN singleton, already-NFC fixed point); emitted per
    doc: code-point lengths before/after, a changed flag, and the md5 of
    the normalized UTF-8 bytes — hash-checked against DuckDB's
    ``nfc_normalize``, i.e. one engine's ICU-grade normalizer pinned
    against an independent implementation (Python ``unicodedata``).

    Scale shape: Spark has no NFC builtin, so this is the textbook
    vectorized-UDF boundary: an Arrow-batched ``pandas_udf`` (series in /
    series out, zero shuffles, embarrassingly parallel) — the supported
    slow path, ~10-100x over row-at-a-time UDFs, and the only Python in
    the plan; the length/flag/md5 algebra stays JVM-side codegen."""
    ensure_deterministic(spark)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: unicodedata.normalize("NFC", x))

    docs = table(spark, sf_dir, "documents")
    decor = (F.when(F.col("doc_id") % 3 == 0,
                    F.concat(F.lit("e"), F.lit("́"), F.lit("cole")))
             .when(F.col("doc_id") % 3 == 1,
                   F.concat(F.lit("Å"), F.lit("ngstrom")))
             .otherwise(F.concat(F.lit("é"), F.lit("cole"))))
    enr = docs.select(
        "doc_id", F.concat("text", F.lit(" "), decor).alias("s"))
    return (enr.withColumn("n", nfc("s"))
            .select("doc_id",
                    F.length("s").cast("long").alias("len_raw"),
                    F.length("n").cast("long").alias("len_nfc"),
                    (F.col("s") != F.col("n")).alias("changed"),
                    F.md5(F.col("n").cast("binary")).alias("nfc_md5")))


# --------------------------------------------------------------------------
# ext_vocab_coverage_curve — cumulative token coverage by vocab rank
# --------------------------------------------------------------------------

_VOCAB_CURVE_SQL = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
clean AS (SELECT tok FROM toks WHERE tok <> ''),
vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM clean GROUP BY 1),
ranked AS (
    SELECT c,
           ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
           SUM(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING)
               AS cum,
           SUM(c) OVER () AS tot,
           COUNT(*) OVER () AS nv
    FROM vocab
)
SELECT CAST(rnk AS BIGINT) AS vocab_size,
       CAST(cum AS BIGINT) AS n_covered,
       FLOOR(cum * 1e0 / tot * 1e6 + 5e-1) / 1e6 AS coverage
FROM ranked WHERE rnk IN (5, 10, 20) OR rnk = nv
"""


@register("ext_vocab_coverage_curve", oracle=_VOCAB_CURVE_SQL,
          tags=("ext", "text", "tokenizer", "stats"))
def ext_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budget design audit:
    what fraction of all token OCCURRENCES do the top-5 / top-10 / top-20
    types cover, and the full-vocab row as the 100% anchor? The question
    every vocab-size decision (and every stopword list) starts from;
    Zipfian corpora saturate fast, and the curve quantifies exactly how
    fast (companion to ``ext_zipf_slope``'s fitted exponent and
    ``ext_tokenizer_coverage``'s fixed-vocab byte-fallback rate).

    Scale shape: one map-side-combinable token count shuffle reduces the
    corpus to VOCABULARY-sized data; the ranking windows then run on that
    |V|-row table — global-ordered but metadata-scale (the same posture
    as ``ext_gini_concentration``'s ranked table), never on the corpus.
    Ties broken (c DESC, tok) for a total order; the coverage quotient is
    exact-integer cum/tot quantized once at 1e-6."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    clean = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .where(F.col("tok") != ""))
    vocab = clean.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                     .alias("c"))
    w_ord = Window.orderBy(F.col("c").desc(), "tok")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    ranked = vocab.select(
        F.row_number().over(w_ord).alias("rnk"),
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("tot"),
        F.count(F.lit(1)).over(w_all).alias("nv"))
    return (ranked.where(F.col("rnk").isin(5, 10, 20)
                         | (F.col("rnk") == F.col("nv")))
            .select(F.col("rnk").cast("long").alias("vocab_size"),
                    F.col("cum").cast("long").alias("n_covered"),
                    (F.floor(F.col("cum") * F.lit(1.0) / F.col("tot")
                             * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                    .alias("coverage")))


# --------------------------------------------------------------------------
# ext_feature_hash_embed — hashing-trick document vectors from tokens
# --------------------------------------------------------------------------

_FHASH_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
hashed AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 64 AS j,
           CASE WHEN CAST(concat('0x', substr(md5(tok), 16, 1)) AS BIGINT)
                     % 2 = 0
                THEN 1 ELSE -1 END AS sgn
    FROM clean
),
comps AS (
    SELECT doc_id, j, CAST(SUM(sgn) AS BIGINT) AS s
    FROM hashed GROUP BY 1, 2
),
norms AS (
    SELECT doc_id, SQRT(CAST(SUM(s * s) AS DOUBLE)) AS nrm
    FROM comps GROUP BY 1
)
SELECT c.doc_id, CAST(c.j AS BIGINT) AS j, c.s,
       FLOOR(c.s / n.nrm * 1e6 + 5e-1) / 1e6 AS v
FROM comps c JOIN norms n USING (doc_id)
WHERE c.s <> 0 AND n.nrm > 0e0
"""


@register("ext_feature_hash_embed", oracle=_FHASH_SQL,
          tags=("ext", "text", "embedding", "hashing"))
def ext_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document embeddings (Weinberger et al. 2009): each
    token is hashed into one of 64 dimensions with an independent ±1 sign
    hash, per-doc signed counts are L2-normalized — the no-vocabulary,
    no-training featurizer that turns raw text into vectors any
    similarity/ANN stage downstream (``ext_sim_search_topk``,
    ``ext_kmeans_assign``) can consume, with a fixed memory footprint no
    matter how the vocabulary grows. Both hashes are slices of the same
    portable md5 algebra the dedup family standardizes on (llm_dedup's
    ``_H60_RAW``), so the oracle replicates them exactly.

    Scale shape: tokenize + hash is a row-local codegen map; the only
    shuffles are the (doc, dim) signed-count aggregation (map-side
    combinable, ≤64 rows per doc out) and the per-doc norm — both keyed
    by doc_id, so at 100 TB they are one co-partitioned pass. Sparse
    long-form output (zero components dropped AFTER the norm, which sums
    all components); integer counts make the norm exact, the normalize is
    one IEEE division quantized at 1e-6."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    clean = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("tok"))
             .where(F.col("tok") != ""))
    h60 = "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
    sgn_bit = "cast(conv(substring(md5(tok), 16, 1), 16, 10) as bigint)"
    hashed = clean.select(
        "doc_id", (F.expr(h60) % 64).alias("j"),
        F.when(F.expr(sgn_bit) % 2 == 0, 1).otherwise(-1).alias("sgn"))
    comps = (hashed.groupBy("doc_id", "j")
             .agg(F.sum("sgn").cast("long").alias("s")))
    norms = (comps.groupBy("doc_id")
             .agg(F.sqrt(F.sum(F.col("s") * F.col("s")).cast("double"))
                  .alias("nrm")))
    return (comps.join(norms, "doc_id")
            .where((F.col("s") != 0) & (F.col("nrm") > 0.0))
            .select("doc_id", F.col("j").cast("long").alias("j"), "s",
                    (F.floor(F.col("s") / F.col("nrm") * F.lit(1e6)
                             + F.lit(0.5)) / F.lit(1e6)).alias("v")))


# --------------------------------------------------------------------------
# ext_vocab_growth_heaps — vocabulary-growth curve + Heaps'-law exponent
# --------------------------------------------------------------------------

_HEAPS_POINTS = 8

_HEAPS_SQL = f"""
WITH toks AS ({{toks}}),
occ AS (
    SELECT doc_id, tok FROM toks WHERE tok <> ''
),
fo AS (
    SELECT tok, MIN(doc_id) AS first_doc FROM occ GROUP BY tok
),
bounds AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs, MAX(doc_id) AS max_id
    FROM occ
),
cps AS (
    SELECT CAST(i AS INT) AS cp_idx,
           -- i/8 quantile of the doc_id range, integer algebra
           (SELECT (max_id + 1) * i // {_HEAPS_POINTS} FROM bounds) AS cutoff
    FROM (SELECT unnest(range(1, {_HEAPS_POINTS} + 1)) AS i)
),
curve AS (
    SELECT c.cp_idx, c.cutoff,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM occ
            WHERE doc_id < c.cutoff) AS total_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM fo
            WHERE first_doc < c.cutoff) AS vocab_size
    FROM cps c
),
pts AS (
    SELECT cp_idx, cutoff, total_tokens, vocab_size,
           CAST(FLOOR(ln(CAST(total_tokens AS DOUBLE)) * 1e6 + 5e-1)
                AS BIGINT) AS xq,
           CAST(FLOOR(ln(CAST(vocab_size AS DOUBLE)) * 1e6 + 5e-1)
                AS BIGINT) AS yq,
           CAST(FLOOR(ln(CAST(total_tokens AS DOUBLE))
                      * ln(CAST(vocab_size AS DOUBLE)) * 1e6 + 5e-1)
                AS BIGINT) AS xyq,
           CAST(FLOOR(ln(CAST(total_tokens AS DOUBLE))
                      * ln(CAST(total_tokens AS DOUBLE)) * 1e6 + 5e-1)
                AS BIGINT) AS xxq
    FROM curve WHERE total_tokens > 0 AND vocab_size > 0
),
beta AS (
    -- k = the number of SURVIVING points (the >0 filters can drop early
    -- empty checkpoints), not the compile-time 8 — a wrong constant
    -- would bias the OLS slope consistently on both engines.
    SELECT (CAST(COUNT(*) AS DOUBLE) * (SUM(xyq) * 1e-6)
            - SUM(xq) * 1e-6 * (SUM(yq) * 1e-6))
           / (CAST(COUNT(*) AS DOUBLE) * (SUM(xxq) * 1e-6)
              - SUM(xq) * 1e-6 * (SUM(xq) * 1e-6))
               AS heaps_beta
    FROM pts
)
SELECT p.cp_idx, CAST(p.cutoff AS BIGINT) AS cutoff_doc,
       p.total_tokens, p.vocab_size, b.heaps_beta
FROM pts p CROSS JOIN beta b
""".format(toks=_TOKENS_SQL)


@register("ext_vocab_growth_heaps", oracle=_HEAPS_SQL,
          tags=("ext", "text", "stats"))
def ext_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve and Heaps'-law exponent (Heaps 1978;
    Herdan 1960): sample the corpus at 8 cumulative doc-id cutoffs and
    report running token total vs distinct-vocabulary size, plus the OLS
    slope of ln V on ln T — the β in V = k·Tᵝ (≈0.4–0.6 for natural
    text; the synthetic corpus's β is its fingerprint). Tokenizer teams
    read this curve to size vocabularies and spot corpus saturation:
    where it flattens, new data stops adding types.

    The cumulative-distinct trick: a token contributes to vocab_size at
    cutoff c iff its FIRST occurrence (min doc_id) is below c — so the
    curve needs only the (token → first_doc) table and a broadcast join
    against 8 cutoff rows, never a per-prefix re-scan. Slope follows the
    ``ext_zipf_slope`` exact-moment discipline: per-point logs quantized
    to int64 micro-units, summed exactly, one deterministic IEEE
    division.

    Scale shape: two map-side-combinable shuffles (per-token first-doc;
    per-cutoff counts over a broadcast 8-row inequality join) — the
    token table is vocabulary-sized after the first reduction. No
    windows over the corpus, no driver loops."""
    ensure_deterministic(spark)
    occ = _tokens(table(spark, sf_dir, "documents")).select("doc_id", "tok")
    fo = occ.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    bounds = occ.agg(F.max("doc_id").alias("max_id"))
    cps = (spark.range(1, _HEAPS_POINTS + 1)
           .select(F.col("id").cast("int").alias("cp_idx"))
           .crossJoin(F.broadcast(bounds))
           .select("cp_idx",
                   F.expr(f"(max_id + 1) * cp_idx div {_HEAPS_POINTS}")
                   .alias("cutoff")))
    tt = (occ.join(F.broadcast(cps), F.col("doc_id") < F.col("cutoff"))
          .groupBy("cp_idx", "cutoff")
          .agg(F.count(F.lit(1)).cast("long").alias("total_tokens")))
    vs = (fo.join(F.broadcast(cps), F.col("first_doc") < F.col("cutoff"))
          .groupBy("cp_idx")
          .agg(F.count(F.lit(1)).cast("long").alias("vocab_size")))
    curve = (tt.join(vs, "cp_idx")
             .where((F.col("total_tokens") > 0) & (F.col("vocab_size") > 0)))
    lx = F.log(F.col("total_tokens").cast("double"))
    ly = F.log(F.col("vocab_size").cast("double"))
    qq = lambda e: F.floor(e * F.lit(1e6) + F.lit(0.5)).cast("long")
    pts = curve.select(
        "cp_idx", "cutoff", "total_tokens", "vocab_size",
        qq(lx).alias("xq"), qq(ly).alias("yq"),
        qq(lx * ly).alias("xyq"), qq(lx * lx).alias("xxq"))
    # k = the number of SURVIVING points (the >0 filters can drop early
    # empty checkpoints), not the compile-time _HEAPS_POINTS constant.
    k = F.count(F.lit(1)).cast("double")
    sx = F.sum("xq").cast("long") * F.lit(1e-6)
    sy = F.sum("yq").cast("long") * F.lit(1e-6)
    sxy = F.sum("xyq").cast("long") * F.lit(1e-6)
    sxx = F.sum("xxq").cast("long") * F.lit(1e-6)
    beta = pts.agg(((k * sxy - sx * sy) / (k * sxx - sx * sx))
                   .alias("heaps_beta"))
    return (pts.select("cp_idx", F.col("cutoff").cast("long")
                       .alias("cutoff_doc"), "total_tokens", "vocab_size")
            .crossJoin(F.broadcast(beta)))


# --------------------------------------------------------------------------
# ext_burstiness — term burstiness (variance-to-mean ratio over docs)
# --------------------------------------------------------------------------

_BURST_MIN_DF, _BURST_TOPK = 5, 20

_BURST_SQL = f"""
WITH occ AS (
    SELECT doc_id, tok FROM ({_TOKENS_SQL}) t WHERE tok <> ''
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM occ),
percol AS (
    SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
    FROM occ GROUP BY 1, 2
),
agg AS (
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(c) AS BIGINT) AS s1,
           CAST(SUM(c * c) AS BIGINT) AS s2
    FROM percol GROUP BY 1
),
b AS (
    SELECT tok, df, s1,
           CAST(FLOOR(CAST(n.n_docs * s2 - s1 * s1 AS DOUBLE)
                      / CAST(n.n_docs * s1 AS DOUBLE) * 1e6 + 5e-1)
                AS BIGINT) AS burst_micro
    FROM agg, nd n
    WHERE df >= {_BURST_MIN_DF}
)
SELECT tok, df, s1 AS total_count, burst_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY burst_micro DESC, tok) AS rk
      FROM b)
WHERE rk <= {_BURST_TOPK}
"""


@register("ext_burstiness", oracle=_BURST_SQL, tags=("ext", "text", "stats"))
def ext_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness — the variance-to-mean ratio (Fano factor) of a
    term's per-document count, zeros included (Church & Gale 1995):
    content words clump (one page says "tokenizer" twenty times, most say
    it never — VMR ≫ 1) while function words spread Poisson-like
    (VMR ≈ 1). Curation reads the top-k bursty list as a template/
    boilerplate detector: a term that is extremely bursty across a
    crawl is usually an artifact of one replicated page family, not
    language.

    The zeros-included variance needs NO dense doc×term matrix: with S1
    = Σc, S2 = Σc² over occurrences only, var·N = S2 − S1²/N, so
    VMR = (N·S2 − S1²)/(N·S1) — exact int64 numerators, one IEEE
    division, 1e-6 quantization, df ≥ 5 support floor, deterministic
    (burst, tok) top-20.

    Scale shape: two map-side-combinable shuffles ((tok, doc) counts,
    then per-tok moments — vocabulary-sized after the first), a 1-row
    corpus-size cross, and a vocabulary-ranked window. Nothing is ever
    per-doc × per-term dense."""
    ensure_deterministic(spark)
    occ = _tokens(table(spark, sf_dir, "documents")).select("doc_id", "tok")
    nd = occ.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    percol = (occ.groupBy("tok", "doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    agg = (percol.groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("c").cast("long").alias("s1"),
                F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"))
           .where(F.col("df") >= _BURST_MIN_DF))
    b = (agg.crossJoin(F.broadcast(nd))
         .select("tok", "df", "s1",
                 F.floor((F.col("n_docs") * F.col("s2")
                          - F.col("s1") * F.col("s1")).cast("double")
                         / (F.col("n_docs") * F.col("s1")).cast("double")
                         * F.lit(1e6) + F.lit(0.5)).cast("long")
                 .alias("burst_micro")))
    w = Window.orderBy(F.col("burst_micro").desc(), "tok")
    return (b.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= _BURST_TOPK)
            .select("tok", "df", F.col("s1").alias("total_count"),
                    "burst_micro"))


# --------------------------------------------------------------------------
# ext_readability_flesch — regex-syllable readability scoring per language
# --------------------------------------------------------------------------

_FLESCH_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, tok FROM ({_TOKENS_SQL}) t WHERE tok <> ''
),
perdoc AS (
    SELECT doc_id, lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(greatest(1, len(regexp_extract_all(tok, '[aeiouy]+'))))
                AS BIGINT) AS n_syll
    FROM toks GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_syll) AS BIGINT) AS n_syll,
       CAST(FLOOR((2.06835e2
                   - 1.015e0 * (CAST(SUM(n_words) AS DOUBLE)
                                / CAST(COUNT(*) AS DOUBLE))
                   - 8.46e1 * (CAST(SUM(n_syll) AS DOUBLE)
                               / CAST(SUM(n_words) AS DOUBLE)))
                  * 1e6 + 5e-1) AS BIGINT) AS flesch_micro
FROM perdoc GROUP BY lang
"""


@register("ext_readability_flesch", oracle=_FLESCH_SQL,
          tags=("ext", "text", "quality"))
def ext_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language (Flesch 1948): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/word), with syllables
    approximated by vowel-group runs ``[aeiouy]+`` (min 1 per word) —
    the standard cheap estimator when no dictionary is available. The
    fixture corpus has no sentence punctuation, so the sentence unit is
    the document (documented degeneracy — on punctuated text swap in the
    ``udtf_python_native`` splitter); the syllable and word-length
    machinery, the part a quality pipeline actually tunes, is exercised
    for real.

    Determinism: word and syllable counts are exact int64 sums (the
    regex engines agree character-for-character on this ASCII class);
    the score is a fixed IEEE sequence on two integer ratios, quantized
    at 1e-6, constants written in e-notation so both SQL dialects parse
    them as DOUBLE.

    Scale shape: per-doc counts (map-side combinable off the exploded
    scan), then a |langs|-row aggregation — two shuffles, both reduced;
    the regex runs codegen-side in the first map stage."""
    ensure_deterministic(spark)
    toks = _tokens(table(spark, sf_dir, "documents"))
    syll = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all("tok", F.lit("[aeiouy]+"), F.lit(0))))
    perdoc = (toks.groupBy("doc_id", "lang")
              .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                   F.sum(syll.cast("long")).cast("long").alias("n_syll")))
    asl = (F.sum("n_words").cast("double")
           / F.count(F.lit(1)).cast("double"))
    asw = (F.sum("n_syll").cast("double")
           / F.sum("n_words").cast("double"))
    return (perdoc.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words"),
                 F.sum("n_syll").cast("long").alias("n_syll"),
                 F.floor((F.lit(206.835) - F.lit(1.015) * asl
                          - F.lit(84.6) * asw) * F.lit(1e6)
                         + F.lit(0.5)).cast("long").alias("flesch_micro")))


# --------------------------------------------------------------------------
# ext_kl_unigram_domains — per-source smoothed unigram KL vs the corpus
# --------------------------------------------------------------------------

#: shared SQL body (identical text on BOTH engines — op-order parity by
#: construction); ``{cs}`` supplies the engine's per-(source, token)
#: count table — corpus counts DERIVE from it (one token pass, not two).
_KL_BODY = """
WITH cs AS ({cs}),
ct AS (SELECT tok, CAST(SUM(cst) AS BIGINT) AS c FROM cs GROUP BY tok),
tot0 AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
         FROM ct),
lc AS (
    SELECT t.tok, t.c,
           CAST(FLOOR(ln((t.c + 1) / ((s.n + s.v) * 1e0)) * 1e9 + 5e-1)
                AS BIGINT) AS lq
    FROM ct t, tot0 s
),
ltot AS (SELECT CAST(SUM(lq) AS BIGINT) AS lsum FROM lc),
nsrc AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS n_s,
                CAST(COUNT(*) AS BIGINT) AS v_s
         FROM cs GROUP BY source),
pres AS (
    SELECT c.source,
           CAST(SUM(CAST(FLOOR(
               ((c.cst + 1) / ((x.n_s + t.v) * 1e0))
               * ln(((c.cst + 1) / ((x.n_s + t.v) * 1e0))
                    / ((l.c + 1) / ((t.n + t.v) * 1e0)))
               * 1e9 + 5e-1) AS BIGINT)) AS BIGINT) AS pq,
           CAST(SUM(l.lq) AS BIGINT) AS lsq
    FROM cs c
    JOIN lc l ON c.tok = l.tok
    JOIN nsrc x ON c.source = x.source, tot0 t
    GROUP BY c.source
)
SELECT p.source, x.n_s AS n_tokens, x.v_s AS vocab_seen,
       CAST(p.pq + CAST(FLOOR(
           (1e0 / (x.n_s + t.v))
           * ((t.v - x.v_s) * ln(1e0 / (x.n_s + t.v))
              - (lt.lsum - p.lsq) / 1e9)
           * 1e9 + 5e-1) AS BIGINT) AS BIGINT) AS kl_nano
FROM pres p JOIN nsrc x ON p.source = x.source, tot0 t, ltot lt
"""

_KL_CS_DUCK = """
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cst
    FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY source, tok
"""


@register("ext_kl_unigram_domains",
          oracle=_KL_BODY.format(cs=_KL_CS_DUCK),
          tags=("ext", "text", "drift"))
def ext_kl_unigram_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source smoothed unigram KL divergence to the corpus language
    model, KL(P_source || P_corpus) with Laplace smoothing over the full
    corpus vocabulary — the domain-level "how different does this source
    speak" statistic behind DoReMi/DSIR-style mixture decisions (the
    per-SOURCE companion to the cohort-level `ext_js_divergence` /
    `ext_psi_drift`). The zero-count tail is folded in closed form:
    tokens absent from a source all share p0 = 1/(n_s+V), so their
    contribution is p0·[(V−V_s)·ln p0 − Σ_{t∉s} ln p_c(t)], and the last
    sum is the corpus total minus the seen-token partial — no
    source × vocabulary expansion is ever materialized.

    Determinism: the entire query is ONE SQL body shared verbatim by
    both engines (only the tokenizer CTE differs), so every float op has
    identical text and order; per-token terms are nano-quantized before
    summation, all cross-row sums are exact int64.

    Scale shape: two map-side-combinable shuffles (per-token corpus
    counts, per-(source, token) counts); the join to the ln-table is on
    the vocabulary-sized side; the closed-form tail makes the absent-mass
    cost |sources| scalars."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    # per-(source, token) counts are the ONLY corpus-sized derivation;
    # lineage-truncated (vocab x sources rows) so the two downstream
    # grains (corpus LM, per-source sums) share one token pass instead
    # of re-exploding the corpus per CTE reference
    cs = (docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .where(F.col("tok") != "")
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("cst"))
          .localCheckpoint(eager=False))
    cs.createOrReplaceTempView("kl_cs")
    return spark.sql(_KL_BODY.format(cs="SELECT source, tok, cst FROM kl_cs"))


# --------------------------------------------------------------------------
# ext_compression_ratio_proxy — distinct-4-gram compressibility bands
# --------------------------------------------------------------------------

_CRP_BODY = """
WITH g AS ({grams}),
per AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS total_g,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_g,
           MIN(n_chars) AS len
    FROM g GROUP BY doc_id
),
r AS (
    SELECT doc_id, len,
           distinct_g / (total_g * 1e0) AS ratio
    FROM per
)
SELECT CAST(FLOOR(ratio * 10) AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(FLOOR(ratio * 1e6 + 5e-1) AS BIGINT)) AS BIGINT)
           AS sum_ratio_micro,
       CAST(SUM(len) AS BIGINT) AS sum_len
FROM r GROUP BY band
"""

_CRP_GRAMS_DUCK = """
    SELECT doc_id, n_chars, substr(text, CAST(i AS INT), 4) AS gram
    FROM (SELECT doc_id, text, n_chars,
                 unnest(range(1, CAST(n_chars AS INT) - 2)) AS i
          FROM documents WHERE n_chars >= 4)
"""


@register("ext_compression_ratio_proxy",
          oracle=_CRP_BODY.format(grams=_CRP_GRAMS_DUCK),
          tags=("ext", "text", "quality"))
def ext_compression_ratio_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility proxy: distinct/total character-4-gram ratio per
    document, reported as decile bands — the dictionary-coder intuition
    (LZ77 compresses exactly what repeats) without a zlib dependency.
    Low-ratio documents are the machine-generated/boilerplate/repetitive
    pages every quality-filter stack drops (Gopher's repetition rules
    approximate the same signal word-level; this is the sub-word
    version that catches character-pattern spam those miss).

    Determinism: the per-doc ratio is one int/int division and the band
    floor runs on that double identically in both engines; band sums
    are micro-quantized exact int64. The whole body is one SQL text
    shared by both engines; only the gram generator differs.

    Scale shape: the explode is the toy lowering (same contract as
    `ext_cdc_chunking`: at 100 TB the per-doc distinct/total counts come
    from one mapInPandas byte pass, identical downstream shape); the
    aggregation is a map-side-combinable doc_id reduce followed by an
    11-key band reduce."""
    ensure_deterministic(spark)
    from project_etl_spark.io import spread_small_scan

    # ~2.7M char-4-gram substrings out of a single-split scan ran as ONE
    # ~3 s map task (optimization round 12); one downstream consumer, so
    # spreading the scan parallelizes the explode at the cost of one tiny
    # exchange (identity at 100 TB — see io.spread_small_scan).
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    g = (docs.where(F.col("n_chars") >= 4)
         .select("doc_id", "text", "n_chars",
                 F.explode(F.sequence(
                     F.lit(1).cast("long"),
                     F.col("n_chars").cast("long") - F.lit(3))).alias("i"))
         .select("doc_id", "n_chars",
                 F.expr("substring(text, cast(i as int), 4)").alias("gram")))
    g.createOrReplaceTempView("crp_grams")
    return spark.sql(_CRP_BODY.format(
        grams="SELECT doc_id, n_chars, gram FROM crp_grams"))


# --------------------------------------------------------------------------
# ext_code_detect — code-vs-prose mix census per source
# --------------------------------------------------------------------------

#: regex class of code-ish symbols; ONE pattern string feeds both engines.
_CODE_SYM_RE = r"[\{\}\(\)\[\];=<>]"
_CODE_SYM_PERMILLE = 30   # classification threshold, shared with oracle

_CODE_DETECT_SQL = f"""
WITH per AS (
    SELECT source, n_chars,
           CAST(length(text) - length(regexp_replace(text,
                '{_CODE_SYM_RE}', '', 'g')) AS BIGINT) AS n_sym
    FROM documents WHERE n_chars > 0
),
cls AS (
    SELECT source, n_sym,
           CAST((2000 * n_sym + n_chars) // (2 * n_chars) AS BIGINT)
               AS sym_permille
    FROM per
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN sym_permille >= {_CODE_SYM_PERMILLE}
                       THEN 1 END) AS BIGINT) AS n_code,
       CAST((2000 * COUNT(CASE WHEN sym_permille >= {_CODE_SYM_PERMILLE}
                               THEN 1 END) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS code_permille,
       CAST(SUM(sym_permille) AS BIGINT) AS sum_sym_permille
FROM cls GROUP BY source
"""


@register("ext_code_detect", oracle=_CODE_DETECT_SQL,
          tags=("ext", "text", "quality"))
def ext_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose mix census — the language-mix decision input every
    pretraining recipe needs (code fraction is tuned deliberately, not
    inherited from the crawl): per document, the density of code-ish
    symbols (braces/brackets/parens/semicolons/operators, one shared
    regex class) in exact round-half-up permille; a document at or above
    {thr} permille classifies as code; census per source. On this prose
    corpus the code fraction is ~0 — the point is the contract, pinned
    exactly on both engines (a planted-code test asserts the detector
    side).

    Scale shape: one row-local regexp_replace length diff inside
    whole-stage codegen (no explode, no token shuffle — the cheapest
    per-doc signal class, same as `ext_token_count_bpe`), then one
    source-keyed map-side-combinable reduce."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    per = (docs.where(F.col("n_chars") > 0)
           .select("source", "n_chars",
                   (F.length("text")
                    - F.length(F.regexp_replace("text", _CODE_SYM_RE, "")))
                   .cast("long").alias("n_sym")))
    cls = per.select(
        "source", "n_sym",
        F.expr("cast((2000 * n_sym + n_chars) div (2 * n_chars) as bigint)")
        .alias("sym_permille"))
    return (cls.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count_if(F.col("sym_permille")
                            >= _CODE_SYM_PERMILLE).cast("long")
                 .alias("n_code"),
                 F.expr(f"cast((2000 * count_if(sym_permille >= "
                        f"{_CODE_SYM_PERMILLE}) + count(1))"
                        f" div (2 * count(1)) as bigint)")
                 .alias("code_permille"),
                 F.sum("sym_permille").cast("long")
                 .alias("sum_sym_permille")))


ext_code_detect.__doc__ = ext_code_detect.__doc__.format(
    thr=_CODE_SYM_PERMILLE)


# --------------------------------------------------------------------------
# ext_license_scan — license/rights-marker compliance census
# --------------------------------------------------------------------------

#: priority-ordered (class, pattern) pairs — ONE list feeds both engines'
#: CASE ladders, dialect-neutral regex (no shorthand classes).
_LICENSE_PATTERNS = (
    ("apache", "[Aa]pache [Ll]icense"),
    ("mit", "MIT [Ll]icense"),
    ("gpl", "[Gg]eneral [Pp]ublic [Ll]icense|GPL"),
    ("cc", "[Cc]reative [Cc]ommons|CC-BY"),
    ("rights_reserved", "[Aa]ll [Rr]ights [Rr]eserved|[Cc]opyright"),
)


def _license_case_sql() -> str:
    whens = " ".join(
        f"WHEN regexp_matches(text, '{pat}') THEN '{cls}'"
        for cls, pat in _LICENSE_PATTERNS)
    return f"CASE {whens} ELSE 'none' END"


_LICENSE_SQL = f"""
WITH cls AS (
    SELECT source, {_license_case_sql()} AS license_class
    FROM documents
)
SELECT source, license_class, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM cls GROUP BY source, license_class
"""


@register("ext_license_scan", oracle=_LICENSE_SQL,
          tags=("ext", "text", "compliance"))
def ext_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License/rights-marker scan — the compliance gate every
    training-data pipeline runs before a source enters the mix: each
    document is classified by the FIRST matching license marker in a
    priority ladder (apache > mit > gpl > cc > generic
    copyright/rights-reserved > none; one shared pattern list drives
    both engines' CASE ladders), censused per source. On this synthetic
    corpus almost everything is 'none' — the contract is the ladder
    semantics, pinned by a planted test per class.

    Scale shape: row-local regexp short-circuit CASE inside whole-stage
    codegen (first match wins, cheapest patterns checked first at 100 TB
    by ordering the ladder by hit rate), one (source, class) map-side
    reduce. No explode, no shuffle of text."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    expr = None
    for cls, pat in _LICENSE_PATTERNS:
        cond = F.col("text").rlike(pat)
        expr = F.when(cond, cls) if expr is None else expr.when(cond, cls)
    cls = docs.select("source", expr.otherwise("none")
                      .alias("license_class"))
    return (cls.groupBy("source", "license_class")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


# --------------------------------------------------------------------------
# ext_vocab_jaccard_sources — pairwise source similarity by top-k vocabulary
# --------------------------------------------------------------------------

_VJ_TOPK = 50


@register(
    "ext_vocab_jaccard_sources",
    oracle=f"""
        WITH toks AS (
            SELECT source, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks WHERE tok <> '' GROUP BY source, tok
        ),
        topk AS (
            SELECT source, tok FROM (
                SELECT source, tok,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY c DESC, tok) AS rn
                FROM cnt
            ) WHERE rn <= {_VJ_TOPK}
        ),
        sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM topk GROUP BY source),
        inter AS (
            SELECT a.source AS s1, b.source AS s2,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM topk a JOIN topk b
              ON a.tok = b.tok AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.s1, i.s2, i.n_common,
               CAST(z1.n AS BIGINT) AS n1, CAST(z2.n AS BIGINT) AS n2,
               CAST(FLOOR(i.n_common * 1e3
                          / (z1.n + z2.n - i.n_common) + 5e-1) AS BIGINT)
                   AS jaccard_milli
        FROM inter i JOIN sz z1 ON i.s1 = z1.source
                     JOIN sz z2 ON i.s2 = z2.source
    """,
    tags=("ext", "text", "similarity"),
)
def ext_vocab_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source similarity by top-50 vocabulary Jaccard: which
    sources speak the same language *register*? Two crawls with 0.8
    vocabulary overlap are near-duplicates at the SOURCE level — the
    corpus-mixing signal that doc-level dedup
    (`ext_dedup_near_lsh_verified`) cannot see, feeding dataset-card
    redundancy notes and mixture-weight decisions alongside
    `ext_kl_unigram_domains` (which compares distributions; this
    compares SETS, robust to count skew).

    Determinism: top-k selection uses a total order (count desc, token);
    intersection/union counts are exact integers; one fixed-order milli
    close. Sources with fewer than 50 distinct tokens use their true
    set size.

    Scale shape: ONE map-side-combinable (source, token) count, a
    per-source top-k window (each partition sorts only its own source's
    vocabulary), then all pair work runs on the bounded
    |sources| × 50 table — the aggregate-before-pairing move again."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(F.split(F.lower("text"), " "))
                        .alias("tok"))
            .where(F.col("tok") != ""))
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long")
                                            .alias("c"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "tok")
    topk = (cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _VJ_TOPK).select("source", "tok")
            # three consumers (two join sides + sizes) over the bounded
            # |sources| x 50 table
            .localCheckpoint(eager=True))
    sz = topk.groupBy("source").agg(F.count(F.lit(1)).cast("long")
                                    .alias("n"))
    a = topk.select(F.col("source").alias("s1"), "tok")
    b = topk.select(F.col("source").alias("s2"), "tok")
    inter = (a.join(b, "tok").where(F.col("s1") < F.col("s2"))
             .groupBy("s1", "s2")
             .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    z1 = sz.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    z2 = sz.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    return (inter.join(F.broadcast(z1), "s1").join(F.broadcast(z2), "s2")
            .select("s1", "s2", "n_common", "n1", "n2",
                    F.floor(F.col("n_common") * F.lit(1e3)
                            / (F.col("n1") + F.col("n2")
                               - F.col("n_common")) + F.lit(0.5))
                    .cast("long").alias("jaccard_milli")))


# --------------------------------------------------------------------------
# ext_source_length_quantiles — grouped log-bucket quantile sketch
# --------------------------------------------------------------------------

#: shared body ({src} = documents view). The GROUPED form of the
#: quarter-log2 sketch (`agg_hdr_latency_quantiles` is the global
#: form): per-source p50/p95 document length from per-(source, bucket)
#: counts — the shape a per-domain length/latency dashboard actually
#: aggregates, still one map-side-combinable reduce with ~120 buckets
#: PER GROUP of state. Exact twin from the per-source (value, count)
#: grid (bounded by the length range, never the corpus); LN/EXP only.
_SRC_LEN_Q_BODY = """
WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v
           FROM {src} WHERE n_chars >= 1),
n0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
b AS (
    SELECT source,
           CAST(FLOOR(LN(v * 1e0) / LN(2e0) * 4e0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM d GROUP BY 1, 2
),
bc AS (
    SELECT source, bucket,
           CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY bucket)
                AS BIGINT) AS cum
    FROM b
),
v AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d GROUP BY 1, 2),
vc AS (
    SELECT source, v,
           CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v)
                AS BIGINT) AS cum
    FROM v
),
tgt AS (
    SELECT n0.source, q.q_permille,
           CAST(FLOOR((q.q_permille * n0.n + 999) / 1e3) AS BIGINT) AS k,
           n0.n AS n_docs
    FROM n0, (SELECT CAST(500 AS INT) AS q_permille
              UNION ALL SELECT CAST(950 AS INT)) q
),
est AS (
    SELECT t.source, t.q_permille, t.n_docs,
           (SELECT MIN(bucket) FROM bc
            WHERE bc.source = t.source AND bc.cum >= t.k) AS bucket,
           (SELECT MIN(v) FROM vc
            WHERE vc.source = t.source AND vc.cum >= t.k) AS exact_chars
    FROM tgt t
)
SELECT source, q_permille, n_docs, bucket,
       CAST(FLOOR(EXP((bucket + 5e-1) / 4e0 * LN(2e0)) * 1e3 + 5e-1)
            AS BIGINT) AS est_chars_milli,
       exact_chars,
       CAST(FLOOR(ABS(EXP((bucket + 5e-1) / 4e0 * LN(2e0)) - exact_chars)
                  / exact_chars * 1e3 + 5e-1) AS BIGINT) AS rel_err_milli
FROM est
"""


@register("ext_source_length_quantiles",
          oracle=_SRC_LEN_Q_BODY.format(src="documents"),
          tags=("ext", "text", "sketch", "profile"))
def ext_source_length_quantiles(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-source p50/p95 document length via the grouped quarter-log2
    sketch — the per-domain length profile every curation dashboard
    keeps ("src3's median doc is 4x src0's; its p95 tail shifted last
    crawl"), and the GROUPED form of `agg_hdr_latency_quantiles`
    (global): the same ~9% construction-bounded buckets, but keyed by
    source, which is the shape a production per-domain dashboard
    actually aggregates and merges (bucket counts are associative per
    key, so daily/per-shard fragments union by plain SUM — the
    `ext_sketch_shard_merge_audit` contract per group). The exact
    order statistic and realized relative error ride along per row
    (the estimator-ships-with-its-gauge pattern).

    Determinism: integer lengths; FLOOR over the bit-exact LN for
    buckets; per-source cumulative reads are windows PARTITIONED BY
    source (co-partitioned, parallel — no global window); the only
    double closes are the shared EXP representative and the error
    ratio, milli-quantized.

    Scale shape: two map-side-combinable reduces — (source, bucket)
    sketch state of ~120 rows PER SOURCE, and the per-source value
    grid bounded by the length RANGE — then source-partitioned window
    reads. Scan-speed at any corpus size."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("slq_docs")
    return spark.sql(_SRC_LEN_Q_BODY.format(src="slq_docs"))


# --------------------------------------------------------------------------
# ext_kneser_ney_bigram — KN-smoothed bigram LM scoring
# --------------------------------------------------------------------------

@register(
    "ext_kneser_ney_bigram",
    oracle=f"""
        WITH bgs AS ({_BIGRAMS_SQL}),
        tf AS (
            SELECT lang, doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
            FROM bgs GROUP BY 1, 2, 3
        ),
        c2 AS (
            SELECT lang, bg, CAST(SUM(m) AS BIGINT) AS c
            FROM tf GROUP BY 1, 2
        ),
        c1 AS (
            SELECT lang, string_split(bg, ' ')[1] AS w1,
                   CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n1
            FROM c2 GROUP BY 1, 2
        ),
        cb AS (
            SELECT lang, string_split(bg, ' ')[2] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS nc
            FROM c2 GROUP BY 1, 2
        ),
        bt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS t
               FROM c2 GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.lang,
                   CAST(SUM(tf.m) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CAST(FLOOR(tf.m * -LN((c2.c - 75e-2) / c1.n
                                 + 75e-2 * c1.n1 / c1.n
                                 * (cb.nc * 1e0 / bt.t)) * 1e6 + 5e-1)
                                 AS BIGINT)) AS BIGINT) AS sq
            FROM tf
            JOIN c2 ON tf.lang = c2.lang AND tf.bg = c2.bg
            JOIN c1 ON tf.lang = c1.lang
                   AND string_split(tf.bg, ' ')[1] = c1.w1
            JOIN cb ON tf.lang = cb.lang
                   AND string_split(tf.bg, ' ')[2] = cb.w2
            JOIN bt ON tf.lang = bt.lang
            GROUP BY tf.doc_id, tf.lang
        )
        SELECT doc_id, lang, n_bigrams,
               (sq * 1.0 / (n_bigrams * 1e6)) AS avg_nll_kn,
               CAST(NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY sq * 1.0 / (n_bigrams * 1e6),
                                            doc_id)
                    AS BIGINT) AS ppl_bucket
        FROM scored
    """,
    tags=("ext", "text", "quality", "lm"),
)
def ext_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999's interpolated form) — the smoothing actually used by
    the KenLM models in CCNet-class pipelines, one rung above the MLE
    twin ``ext_bigram_logprob``:

        p_KN(w2|w1) = (c(w1 w2) - D) / c(w1 ·)
                      + D · N1+(w1 ·) / c(w1 ·) · N1+(· w2) / N1+(· ·)

    with the standard discount D = 0.75. The continuation probability
    N1+(· w2)/N1+(· ·) ("how many distinct contexts has w2 followed")
    is what distinguishes KN from plain backoff — "Francisco" is
    frequent but follows only "San", so its continuation mass is tiny
    and boilerplate stitched around it scores high. Per-language model,
    per-doc average NLL, head/middle/tail perplexity tertiles.

    Determinism: all model inputs (c, n, n1, nc, t) are exact integer
    counts; D = 0.75 is exactly representable in binary, so p_KN is a
    fixed-order chain of IEEE ops on exact ints, spelled identically in
    both engines (the builder evaluates the same expression text via
    ``F.expr``); each (doc, bigram) term micro-quantizes before the
    int64 sum.

    Scale shape mirrors ``ext_bigram_logprob``: per-doc tf and the four
    model tables (c2/c1/cb/bt — all vocabulary-sized) are map-side
    combinable reduces; scoring is one broadcast (or shuffle past the
    threshold) join + per-doc reduce; tertiles lower to broadcast
    percentile cutpoints at 100 TB."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    bgs = toks.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i+1])) "
            "ELSE array() END")).alias("bg"))
    tf = (bgs.groupBy("lang", "doc_id", "bg")
          .agg(F.count(F.lit(1)).cast("long").alias("m"))
          # lazy checkpoint: tf feeds the model tables AND the scoring
          # join, and the broadcast(model) subtree plans as separate
          # jobs where exchange reuse does not fire -- measured 3 full
          # re-derivations of the bigram explode per run (optimization
          # round 12); one materialization removes two of them.
          .localCheckpoint(eager=False))
    # second checkpoint at c2 (round 13, the probe round 12 deferred):
    # the four model tables (c1/cb/bt/model join) all hang off c2 INSIDE
    # the broadcast(model) subtree, where each re-reads c2's exchange; a
    # lazy checkpoint of the vocabulary-sized count table pins one
    # derivation (measured 2.94 -> 2.14 s, same-protocol subset bench).
    c2 = (tf.groupBy("lang", "bg").agg(F.sum("m").cast("long").alias("c"))
          .localCheckpoint(eager=False))
    c1 = (c2.select("lang", F.split("bg", " ").getItem(0).alias("w1"), "c")
          .groupBy("lang", "w1")
          .agg(F.sum("c").cast("long").alias("n"),
               F.count(F.lit(1)).cast("long").alias("n1")))
    cb = (c2.select("lang", F.split("bg", " ").getItem(1).alias("w2"))
          .groupBy("lang", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("nc")))
    bt = c2.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("t"))
    model = (c2.withColumn("w1", F.split("bg", " ").getItem(0))
             .withColumn("w2", F.split("bg", " ").getItem(1))
             .join(c1, ["lang", "w1"]).join(cb, ["lang", "w2"])
             .join(bt, "lang")
             .select("lang", "bg", "c", "n", "n1", "nc", "t"))
    qterm = F.expr(
        "cast(floor(m * -ln((c - 75e-2) / n + 75e-2 * n1 / n"
        " * (nc * 1e0 / t)) * 1e6 + 5e-1) as long)")
    scored = (tf.join(F.broadcast(model), ["lang", "bg"])
              .groupBy("doc_id", "lang")
              .agg(F.sum("m").cast("long").alias("n_bigrams"),
                   F.sum(qterm).cast("long").alias("sq")))
    avg = F.col("sq") * F.lit(1.0) / (F.col("n_bigrams") * F.lit(1e6))
    w = Window.partitionBy("lang").orderBy(avg.asc(), F.col("doc_id"))
    return scored.select(
        "doc_id", "lang", "n_bigrams", avg.alias("avg_nll_kn"),
        F.ntile(3).over(w).cast("long").alias("ppl_bucket"))


# --------------------------------------------------------------------------
# ext_self_bleu_adjacent — corpus diversity audit (clipped bigram BLEU)
# --------------------------------------------------------------------------

@register(
    "ext_self_bleu_adjacent",
    oracle=f"""
        WITH bgs AS ({_BIGRAMS_SQL}),
        bc AS (
            SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
            FROM bgs GROUP BY 1, 2
        ),
        nb AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n
               FROM bc GROUP BY 1),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source
            FROM documents a
            JOIN documents b ON b.doc_id = a.doc_id + 1
                            AND b.source = a.source
        ),
        clip AS (
            SELECT p.doc_a, p.doc_b,
                   CAST(SUM(LEAST(ca.m, cb.m)) AS BIGINT) AS clipped
            FROM pairs p
            JOIN bc ca ON ca.doc_id = p.doc_a
            JOIN bc cb ON cb.doc_id = p.doc_b AND cb.bg = ca.bg
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.source,
                   CAST(FLOOR(COALESCE(c.clipped, 0) * 1e0 / na.n * 1e6
                              + 5e-1) AS BIGINT) AS q
            FROM pairs p
            JOIN nb na ON na.doc_id = p.doc_a
            LEFT JOIN clip c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(q) AS BIGINT) AS sum_bleu2_micro,
               CAST(FLOOR(SUM(q) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
                   AS avg_bleu2_micro
        FROM scored GROUP BY source
    """,
    tags=("ext", "text", "diversity", "eval"),
)
def ext_self_bleu_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU diversity audit (Zhu et al. 2018, Texygen): the clipped
    bigram precision of each document against its successor within the
    same source — high self-BLEU means the source emits template-like,
    mutually repetitive text (the generation-diversity failure mode;
    for crawl corpora it flags boilerplate mills that near-dedup's 0.5
    Jaccard threshold is too blunt to catch). Adjacent-pair sampling is
    the same deterministic stand-in the Bradley-Terry and cross-shard
    audits use: at 100 TB you never score all O(N²) pairs per source —
    one successor per document is an unbiased, linear-cost probe of the
    within-source redundancy distribution.

    Semantics: BLEU-2 modified precision = Σ_bg min(m_a, m_b) / |a|
    (clipped bigram matches over candidate length), no brevity penalty
    (a length census belongs to `ext_source_length_quantiles`). Pairs
    whose candidate has zero bigrams drop out of the inner join;
    zero-overlap pairs count with q = 0 via the LEFT join.

    Determinism: pure integer multiset algebra until one micro
    quantization per pair; per-source sums are exact int64.

    Scale shape: the pair derivation is a self-join on doc_id + 1
    (co-partitioned range join at scale); the clip join is bounded by
    per-doc bigram counts (each pair touches only its own bigrams,
    never a corpus-wide bucket); everything reduces map-side."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("w"))
    bgs = toks.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i+1])) "
            "ELSE array() END")).alias("bg"))
    bc = (bgs.groupBy("doc_id", "bg")
          .agg(F.count(F.lit(1)).cast("long").alias("m")))
    nb = bc.groupBy("doc_id").agg(F.sum("m").cast("long").alias("n"))
    a = docs.select(F.col("doc_id").alias("doc_a"), "source")
    b = docs.select(F.col("doc_id").alias("doc_b"),
                    F.col("source").alias("source_b"))
    pairs = (a.join(b, (F.col("doc_b") == F.col("doc_a") + 1)
                    & (F.col("source_b") == F.col("source")))
             .select("doc_a", "doc_b", "source")
             .localCheckpoint(eager=False))  # feeds clip + scored
    clip = (pairs
            .join(bc.select(F.col("doc_id").alias("doc_a"), "bg",
                            F.col("m").alias("ma")), "doc_a")
            .join(bc.select(F.col("doc_id").alias("doc_b"), "bg",
                            F.col("m").alias("mb")), ["doc_b", "bg"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.least("ma", "mb")).cast("long").alias("clipped")))
    q = F.floor(F.coalesce(F.col("clipped"), F.lit(0)) * F.lit(1.0)
                / F.col("n") * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (pairs
              .join(nb.select(F.col("doc_id").alias("doc_a"), "n"), "doc_a")
              .join(clip, ["doc_a", "doc_b"], "left")
              .select("source", q.alias("q")))
    return (scored.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum("q").cast("long").alias("sum_bleu2_micro"),
                 F.floor(F.sum("q") * F.lit(1.0) / F.count(F.lit(1))
                         + F.lit(0.5)).cast("long")
                 .alias("avg_bleu2_micro")))


# --------------------------------------------------------------------------
# ext_script_mix — character-class composition census
# --------------------------------------------------------------------------

#: shared body ({src} = documents view; {g} = the regexp_replace global
#: flag — '' for Spark (always-global), ", 'g'" for DuckDB).
_SCRIPT_MIX_BODY = """
WITH f AS (
    SELECT source,
           CAST(length(text) AS BIGINT) AS n,
           CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]',
                ''{g})) AS BIGINT) AS na,
           CAST(length(text) - length(regexp_replace(text, '[0-9]',
                ''{g})) AS BIGINT) AS nd,
           CAST(length(text) - length(regexp_replace(text, '[ ]',
                ''{g})) AS BIGINT) AS ns
    FROM {src} WHERE length(text) > 0
),
q AS (
    SELECT source,
           CAST(FLOOR(na * 1e3 / n + 5e-1) AS BIGINT) AS qa,
           CAST(FLOOR(nd * 1e3 / n + 5e-1) AS BIGINT) AS qd,
           CAST(FLOOR(ns * 1e3 / n + 5e-1) AS BIGINT) AS qs,
           CAST(FLOOR((n - na - nd - ns) * 1e3 / n + 5e-1) AS BIGINT) AS qo
    FROM f
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(FLOOR(SUM(qa) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS ascii_alpha_permille,
       CAST(FLOOR(SUM(qd) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS digit_permille,
       CAST(FLOOR(SUM(qs) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS space_permille,
       CAST(FLOOR(SUM(qo) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
           AS other_permille
FROM q GROUP BY source
"""


@register("ext_script_mix",
          oracle=_SCRIPT_MIX_BODY.format(src="documents", g=", 'g'"),
          tags=("ext", "text", "multilingual", "profile"))
def ext_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition census per source: average per-doc
    permille of ASCII letters, digits, spaces, and everything else
    (CJK/Cyrillic/accented scripts, punctuation, control bytes) — the
    first gauge a multilingual-curation dashboard keeps next to
    language ID. A "en" source whose other-share jumps is sprouting
    encoding mojibake or mixed-script spam; a CJK source's alpha-share
    measures latin boilerplate contamination; the digit share feeds
    the same signal family as `ext_quality_gopher_rules`' digit rule
    but aggregated per source, where the curation DECISION (keep/drop
    the crawl) is actually taken.

    Determinism: character counts come from length deltas of
    regexp_replace strips (exact integers, same regex class semantics
    on both engines; the {{g}} placeholder supplies DuckDB's global
    flag — Spark replaces globally by default); per-doc shares quantize
    to permille before the per-source integer average.

    Scale shape: pure map-side per-doc string work into one
    map-side-combinable per-source reduce — scan-speed; the regex
    strips fuse into the same whole-stage-codegen pass as the scan."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("scriptmix_docs")
    return spark.sql(_SCRIPT_MIX_BODY.format(src="scriptmix_docs", g=""))


# --------------------------------------------------------------------------
# ext_ngram_entropy_rate — conditional bigram entropy per language
# --------------------------------------------------------------------------

@register(
    "ext_ngram_entropy_rate",
    oracle=f"""
        WITH bgs AS ({_BIGRAMS_SQL}),
        c2 AS (
            SELECT lang, bg, CAST(COUNT(*) AS BIGINT) AS c
            FROM bgs GROUP BY 1, 2
        ),
        c1 AS (
            SELECT lang, string_split(bg, ' ')[1] AS w1,
                   CAST(SUM(c) AS BIGINT) AS cw
            FROM c2 GROUP BY 1, 2
        ),
        n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nb FROM c2 GROUP BY 1),
        hr AS (
            SELECT c2.lang,
                   CAST(SUM(CAST(FLOOR(c2.c * LN(c1.cw * 1e0 / c2.c) * 1e6
                                       + 5e-1) AS BIGINT)) AS BIGINT) AS sc,
                   CAST(SUM(CAST(FLOOR(c2.c * LN(n.nb * 1e0 / c2.c) * 1e6
                                       + 5e-1) AS BIGINT)) AS BIGINT) AS sj
            FROM c2
            JOIN c1 ON c2.lang = c1.lang
                   AND string_split(c2.bg, ' ')[1] = c1.w1
            JOIN n ON c2.lang = n.lang
            GROUP BY c2.lang
        )
        SELECT hr.lang, n.nb AS n_bigrams,
               CAST(FLOOR(hr.sc * 1e0 / n.nb + 5e-1) AS BIGINT)
                   AS h_cond_micro,
               CAST(FLOOR(hr.sj * 1e0 / n.nb + 5e-1) AS BIGINT)
                   AS h_joint_micro,
               CASE WHEN hr.sj > 0 THEN
                   CAST(FLOOR((1e0 - hr.sc * 1e0 / hr.sj) * 1e3 + 5e-1)
                        AS BIGINT)
               END AS redundancy_milli
        FROM hr JOIN n ON hr.lang = n.lang
    """,
    tags=("ext", "text", "lm", "profile"),
)
def ext_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bigram entropy rate (Shannon 1951's printed-English
    estimate, as a corpus gauge): H(w2|w1) = Σ c_bg·ln(c_w1/c_bg) / N —
    the average per-token surprise once one token of context is known —
    next to the JOINT bigram entropy H(w1,w2) = Σ c_bg·ln(N/c_bg) / N,
    and the redundancy 1 - H_cond/H_joint: how much of the corpus's
    apparent variety is explained away by one token of context. A
    source whose redundancy climbs across crawls is templating; the
    corpus-level counterpart of the per-doc `ext_repetition_score`,
    and the information-theoretic reading of what
    `ext_compression_ratio_proxy` measures mechanically. Complements
    `ext_corpus_entropy` (unigram) exactly one context order up.

    Determinism: every term is c·ln(ratio-of-exact-ints), micro-
    quantized before the int64 sum (order-free); closes are fixed-
    order; the single-continuation degenerate (every w1 followed by
    exactly one w2) gives H_cond = 0 via ln(1) = 0, never a divide;
    redundancy is NULL-guarded for the empty-ish H_joint = 0 case
    identically in both engines.

    Scale shape: bigram explode is map-side; c2/c1/N are vocabulary-
    sized map-side-combinable reduces; the scoring join is over the
    vocab-sized c2 — never a corpus-row join."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    bgs = toks.select(
        "lang",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i+1])) "
            "ELSE array() END")).alias("bg"))
    c2 = bgs.groupBy("lang", "bg").agg(F.count(F.lit(1)).cast("long")
                                       .alias("c"))
    c1 = (c2.select("lang", F.split("bg", " ").getItem(0).alias("w1"), "c")
          .groupBy("lang", "w1").agg(F.sum("c").cast("long").alias("cw")))
    n = c2.groupBy("lang").agg(F.sum("c").cast("long").alias("nb"))
    j = (c2.withColumn("w1", F.split("bg", " ").getItem(0))
         .join(F.broadcast(c1), ["lang", "w1"])
         .join(F.broadcast(n), "lang"))
    qc = F.expr("cast(floor(c * ln(cw * 1e0 / c) * 1e6 + 5e-1) as long)")
    qj = F.expr("cast(floor(c * ln(nb * 1e0 / c) * 1e6 + 5e-1) as long)")
    hr = j.groupBy("lang").agg(F.sum(qc).cast("long").alias("sc"),
                               F.sum(qj).cast("long").alias("sj"))
    out = hr.join(n, "lang")
    red = F.when(F.col("sj") > 0,
                 F.floor((F.lit(1e0) - F.col("sc") * F.lit(1e0)
                          / F.col("sj")) * F.lit(1e3) + F.lit(0.5))
                 .cast("long"))
    return out.select(
        "lang", F.col("nb").alias("n_bigrams"),
        F.floor(F.col("sc") * F.lit(1e0) / F.col("nb") + F.lit(0.5))
        .cast("long").alias("h_cond_micro"),
        F.floor(F.col("sj") * F.lit(1e0) / F.col("nb") + F.lit(0.5))
        .cast("long").alias("h_joint_micro"),
        red.alias("redundancy_milli"))


# --------------------------------------------------------------------------
# ext_type_token_ratio — lexical diversity census
# --------------------------------------------------------------------------

@register(
    "ext_type_token_ratio",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS tok
            FROM documents
        ),
        perdoc AS (
            SELECT doc_id, source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS d
            FROM toks GROUP BY doc_id, source
        ),
        q AS (
            SELECT source, n, d,
                   CAST(FLOOR(d * 1e3 / n + 5e-1) AS BIGINT) AS ttr_q,
                   CAST(FLOOR(d * 1e3 / SQRT(n * 1e0) + 5e-1) AS BIGINT)
                       AS rttr_q
            FROM perdoc
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(d) AS BIGINT) AS n_types,
               CAST(FLOOR(SUM(ttr_q) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
                   AS avg_ttr_milli,
               CAST(FLOOR(SUM(rttr_q) * 1e0 / COUNT(*) + 5e-1) AS BIGINT)
                   AS avg_root_ttr_milli
        FROM q GROUP BY source
    """,
    tags=("ext", "text", "quality", "profile"),
)
def ext_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity census: per-document type-token ratio (distinct
    words / words) and Guiraud's root TTR (distinct / √words — the
    length-robust variant, Guiraud 1954), averaged per source. THE
    classic keyword-stuffing and template detector: spam that repeats a
    phrase ranks low on TTR even when every other heuristic passes, and
    root TTR keeps long documents comparable to short ones (plain TTR
    decays mechanically with length). Per-DOC diversity next to the
    corpus-level `ext_vocab_growth_heaps` (vocabulary growth) and
    per-doc `ext_repetition_score` (adjacent repetition): the three
    catch different failure shapes.

    Determinism: token and distinct counts are exact integers; per-doc
    ratios quantize to milli (root TTR through the bit-exact sqrt)
    before the per-source integer average.

    Scale shape: one explode + (doc, tok) distinct-reduce (map-side
    combinable, the `ext_text_tokens` shuffle), then a per-source
    reduce — scan-speed; no windows."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source",
        F.explode(F.filter(F.split(F.lower("text"), " "),
                           lambda x: x != "")).alias("tok"))
    perdoc = (toks.groupBy("doc_id", "source")
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.count_distinct("tok").cast("long").alias("d")))
    ttr_q = F.floor(F.col("d") * F.lit(1e3) / F.col("n") + F.lit(0.5)) \
        .cast("long")
    rttr_q = F.floor(F.col("d") * F.lit(1e3)
                     / F.sqrt(F.col("n") * F.lit(1e0)) + F.lit(0.5)) \
        .cast("long")
    q = perdoc.select("source", "n", "d", ttr_q.alias("ttr_q"),
                      rttr_q.alias("rttr_q"))
    return (q.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n").cast("long").alias("n_tokens"),
                 F.sum("d").cast("long").alias("n_types"),
                 F.floor(F.sum("ttr_q") * F.lit(1e0) / F.count(F.lit(1))
                         + F.lit(0.5)).cast("long").alias("avg_ttr_milli"),
                 F.floor(F.sum("rttr_q") * F.lit(1e0) / F.count(F.lit(1))
                         + F.lit(0.5)).cast("long")
                 .alias("avg_root_ttr_milli")))


# --------------------------------------------------------------------------
# ext_winsorized_stats — robust per-source length statistics
# --------------------------------------------------------------------------

#: shared body ({src} = documents view; `//` rewrites to `div` for
#: Spark — all operands non-negative, so floor and truncate agree).
_WINSOR_BODY = """
WITH r AS (
    SELECT source, CAST(n_chars AS BIGINT) AS v,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
    FROM {src}
),
k AS (
    SELECT source, n,
           MAX(CASE WHEN rnk = (n - 1) * 5 // 100 + 1 THEN v END) AS lo,
           MAX(CASE WHEN rnk = (n - 1) * 95 // 100 + 1 THEN v END) AS hi,
           (n - 1) * 5 // 100 + 1 AS lo_rnk,
           (n - 1) * 95 // 100 + 1 AS hi_rnk,
           CAST(SUM(v) AS BIGINT) AS sv
    FROM r GROUP BY source, n
)
SELECT r.source, k.n AS n_docs, k.lo AS p5, k.hi AS p95,
       CAST(FLOOR(k.sv * 1e3 / k.n + 5e-1) AS BIGINT) AS mean_milli,
       CAST(FLOOR(SUM(LEAST(GREATEST(r.v, k.lo), k.hi)) * 1e3 / k.n
                  + 5e-1) AS BIGINT) AS winsor_mean_milli,
       CAST(FLOOR(SUM(CASE WHEN r.rnk >= k.lo_rnk AND r.rnk <= k.hi_rnk
                           THEN r.v ELSE 0 END) * 1e3
                  / (k.hi_rnk - k.lo_rnk + 1) + 5e-1) AS BIGINT)
           AS trim_mean_milli
FROM r JOIN k ON r.source = k.source
GROUP BY r.source, k.n, k.lo, k.hi, k.lo_rnk, k.hi_rnk, k.sv
"""


@register("ext_winsorized_stats",
          oracle=_WINSOR_BODY.format(src="documents"),
          tags=("ext", "text", "robust", "profile"))
def ext_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length statistics: exact p5/p95 order
    statistics, the winsorized mean (tails CLIPPED to the percentiles —
    Tukey's recipe for keeping every observation while bounding tail
    leverage) and the trimmed mean (tails DROPPED) next to the plain
    mean. The robust location gauges a curation dashboard needs the
    moment one crawl ships a handful of 100 MB concatenation artifacts:
    the plain mean jumps, the winsorized/trimmed means don't — and the
    gap BETWEEN them is itself the tail-mass alarm (complements
    `agg_mad_outliers`, which flags the outliers; this reports the
    location estimate that survives them).

    Determinism: order statistics are exact ranks with doc_id
    tie-break; clipped/trimmed sums are exact int64; one milli-quantized
    division per statistic. The rank arithmetic (n-1)·q//100+1 is the
    type-1 empirical quantile, floor-division on non-negative ints
    (both engines agree).

    Scale shape: source-partitioned windows (each sort bounded by its
    source; the `ext_domain_cap` mega-source lowering applies), then a
    per-source reduce — no global windows, no corpus-sized state."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("winsor_docs")
    sql = _WINSOR_BODY.format(src="winsor_docs").replace("//", " div ")
    return spark.sql(sql)


# --------------------------------------------------------------------------
# ext_token_infogain — chi-square token selection for the length label
# --------------------------------------------------------------------------

#: shared tail over `{toks}` (doc_id, tok, y — DISTINCT per doc) and
#: `{docs}`: per-token 2x2 document-frequency tables against the
#: long-doc label, chi-square with the mid-frequency band filter, top
#: 15 by the micro-quantized statistic.
_INFOGAIN_TAIL = """
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos
    FROM {docs} WHERE n_chars > 0
),
tc AS (
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(y) AS BIGINT) AS df_pos
    FROM {toks} GROUP BY tok
),
chi AS (
    SELECT tok, df, df_pos, t.n_docs,
           df_pos AS a, df - df_pos AS b,
           t.n_pos - df_pos AS c,
           (t.n_docs - df) - (t.n_pos - df_pos) AS d
    FROM tc JOIN tot t ON TRUE
    WHERE df >= 20 AND df <= t.n_docs - 20
),
scored AS (
    SELECT tok, df, a, b, c, d,
           CAST(FLOOR(
               CAST(n_docs AS DOUBLE)
               * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
               * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
               / ((a + b) * (c + d))
               / ((a + c) * (b + d)) * 1e6 + 5e-1) AS BIGINT)
               AS chi2_micro
    FROM chi
)
SELECT tok, df, a AS df_pos, chi2_micro
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY chi2_micro DESC, tok) AS rk
      FROM scored) ranked
WHERE rk <= 15
ORDER BY chi2_micro DESC, tok
"""

_INFOGAIN_DUCK_HEAD = """
toks AS (
    SELECT DISTINCT doc_id, lower(tok) AS tok,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
    FROM (SELECT doc_id, n_chars,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE n_chars > 0)
    WHERE length(tok) >= 3
)
"""


@register(
    "ext_token_infogain",
    oracle=f"""
        WITH {_INFOGAIN_DUCK_HEAD},
        {_INFOGAIN_TAIL.format(toks="toks", docs="documents")}
    """,
    tags=("ext", "text", "quality"),
)
def ext_token_infogain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token selection (the classic feature-selection score
    — Yang & Pedersen 1997 rank it top with information gain): which
    mid-frequency tokens' PRESENCE most predicts the long-document
    label? Per token the 2x2 document-frequency table against the
    label, chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)), top 15. The
    supervised complement of `ext_tfidf` (unsupervised salience) and
    the feature-audit step before `ext_quality_logistic` retrains: a
    token that lights up here but encodes a source artifact is a
    leakage bug. The df in [20, N-20] band excludes the
    degenerate-margin tokens exactly as the textbook prescribes.

    Determinism: DISTINCT (doc, token) presence and every 2x2 cell are
    exact set algebra / int64 counts; each token's chi2 is one
    fixed-order IEEE chain micro-quantized; the top-15 orders by
    (chi2 DESC, tok).

    Scale shape: one explode + DISTINCT (map-side combinable), one
    groupBy(token) reduce, a 1-row totals cross (allowlisted), a
    TakeOrderedAndProject(15). The token dimension, not the corpus,
    bounds everything after the reduce.

    Reference basis: channel-wise discriminative-feature ranking
    (Documentation-Self-Triggering.html:194-239); statistic from
    Pearson 1900 / selection protocol Yang & Pedersen 1997 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("ig_docs")
    (docs.where(F.col("n_chars") > 0)
     .select("doc_id",
             (F.col("n_chars") >= 300).cast("int").alias("y"),
             F.explode(F.split("text", " ")).alias("tok0"))
     .where(F.length("tok0") >= 3)
     .select("doc_id", F.lower("tok0").alias("tok"), "y")
     .distinct()
     .createOrReplaceTempView("ig_toks"))
    return spark.sql(
        "WITH " + _INFOGAIN_TAIL.format(toks="ig_toks", docs="ig_docs"))


# --------------------------------------------------------------------------
# ext_good_turing / ext_chao1_richness — unseen-mass and richness estimates
# --------------------------------------------------------------------------

#: DuckDB head producing the word-TRIGRAM stream (the unigram vocab of
#: the synthetic corpus is tiny and saturated — trigram types carry
#: the real singleton tail these estimators need).
_TRIGRAMS_DUCK = """
    SELECT lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS t
    FROM (SELECT lang, w, unnest(range(1, greatest(len(w)-1, 1))) AS i
          FROM (SELECT lang, string_split(text, ' ') AS w
                FROM documents))
"""


def _trigrams(docs: DataFrame) -> DataFrame:
    """(lang, t) word-trigram occurrences — Spark twin of
    ``_TRIGRAMS_DUCK``."""
    toks = docs.select("lang", F.split(F.col("text"), " ").alias("w"))
    return toks.select(
        "lang",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 3 THEN "
            "transform(sequence(0, size(w) - 3), "
            "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) "
            "ELSE array() END")).alias("t"))


#: shared tail over `{tg}` (lang, t): corpus-wide count-of-counts,
#: Good-Turing smoothed discounts r* = (r+1) N_{r+1}/N_r for r <= 5,
#: and the unseen mass P0 = N_1 / N.
_GT_TAIL = """
tc AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS r FROM {tg} GROUP BY t
),
coc AS (
    SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc GROUP BY r
),
tot AS (
    SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
           CAST(SUM(n_r) AS BIGINT) AS vocab
    FROM coc
)
SELECT c.r, c.n_r,
       CAST(FLOOR((c.r + 1e0) * nx.n_r / c.n_r * 1e6 + 5e-1) AS BIGINT)
           AS r_star_micro,
       CAST(FLOOR((SELECT CAST(n_r AS DOUBLE) FROM coc WHERE r = 1)
                  / t.n_tokens * 1e9 + 5e-1) AS BIGINT) AS p0_nano,
       t.n_tokens, t.vocab
FROM coc c
JOIN coc nx ON nx.r = c.r + 1
JOIN tot t ON TRUE
WHERE c.r <= 5
ORDER BY c.r
"""


@register(
    "ext_good_turing",
    oracle=f"WITH tg AS ({_TRIGRAMS_DUCK}),\n{_GT_TAIL.format(tg='tg')}",
    tags=("ext", "text", "stats"),
)
def ext_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing (Good 1953) over word-trigram
    types: the count-of-counts table N_r, the smoothed discounts
    r* = (r+1) N_{r+1} / N_r for r <= 5, and the unseen-type mass
    P0 = N_1 / N — THE estimate of how much probability a language
    model must reserve for trigrams the corpus has never shown it.
    The estimation-theory root of the smoothing family:
    `ext_kneser_ney_bigram`'s fixed D discount is the production
    shortcut for exactly these r* ratios, and `ext_vocab_growth_heaps`
    fits the same tail's growth law. Singleton mass here is the
    novelty budget a dedup-heavy corpus diet directly shrinks.

    Determinism: type counts and count-of-counts are exact integer
    set algebra; each discount is one fixed-order division of two
    integers, micro-quantized; P0 is one division.

    Scale shape: one explode + two hash aggregations (type counts,
    then count-of-counts — both map-side combinable); the close runs
    on the <=max-count-row count-of-counts table with a 1-row totals
    cross (allowlisted).

    Reference basis: rate-of-new-patterns accounting over channel
    streams (Documentation-Self-Triggering.html:194-239); estimator
    from Good 1953 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    _trigrams(docs).createOrReplaceTempView("gt_trigrams")
    return spark.sql("WITH " + _GT_TAIL.format(tg="gt_trigrams"))


#: shared tail over `{tg}` (lang, t): per-language observed richness,
#: singleton/doubleton counts, the bias-corrected Chao1 estimate and
#: the implied coverage.
_CHAO1_TAIL = """
tc AS (
    SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS r
    FROM {tg} GROUP BY lang, t
),
s AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS s_obs,
           CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM tc GROUP BY lang
)
SELECT lang, s_obs, f1, f2,
       CAST(FLOOR(s_obs
                  + CAST(f1 AS DOUBLE) * (f1 - 1e0) / (2e0 * (f2 + 1e0))
                  + 5e-1) AS BIGINT) AS chao1_est,
       CAST(FLOOR(CAST(s_obs AS DOUBLE)
                  / (s_obs + CAST(f1 AS DOUBLE) * (f1 - 1e0)
                             / (2e0 * (f2 + 1e0)))
                  * 1e6 + 5e-1) AS BIGINT) AS coverage_micro
FROM s
ORDER BY lang
"""


@register(
    "ext_chao1_richness",
    oracle=f"WITH tg AS ({_TRIGRAMS_DUCK}),\n{_CHAO1_TAIL.format(tg='tg')}",
    tags=("ext", "text", "stats"),
)
def ext_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimate (Chao 1984, bias-corrected form) of the
    word-trigram type inventory per language: S_chao1 = S_obs +
    f1(f1-1) / (2(f2+1)) from the singleton and doubleton counts, plus
    the implied sample coverage S_obs / S_chao1 — the ecology
    estimator that answers "how many trigram types does this language
    slice REALLY have, given what one crawl caught?". The asymptote
    `ext_vocab_growth_heaps` extrapolates toward is estimated here
    from tail mass alone; per-language coverage gaps say which slices
    need more crawl before their LM statistics stabilize.

    Determinism: per-language type counts and f1/f2 are exact set
    algebra; the estimate and coverage are single fixed-order chains
    over integers.

    Scale shape: one explode + one groupBy(lang, type) reduce + one
    groupBy(lang) reduce, all map-side combinable; closes on
    |langs| rows.

    Reference basis: undetected-population estimation for channel
    inventories (Documentation-Self-Triggering.html:194-239);
    estimator from Chao 1984 (public)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    _trigrams(docs).createOrReplaceTempView("chao1_trigrams")
    return spark.sql("WITH " + _CHAO1_TAIL.format(tg="chao1_trigrams"))
