"""Shared corpus-curation algebra — ONE copy of the md5-bucket sampling,
train/val/test split, and whitespace token count, feeding both the Spark
builders and the DuckDB oracles of ``ext_sample_split`` (llm_text) and
``ext_curation_pipeline`` (llm_dedup). No registrations here, so importing
this module never perturbs the registry order the driver sweeps in.

The bucket is the first 60 bits of md5(doc_id) mod 1000 — deterministic
across engines, runs, and physical layouts (the property a seeded
``sample()`` lacks). Split: buckets 0-7 of (bucket %% 10) -> train,
8 -> val, 9 -> test. Downsample: 'en' keeps buckets < 500 (50%%), other
languages keep all 1000.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB bucket twin of :func:`bucket_col` (expects ``doc_id`` in scope).
BUCKET_SQL = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
              " AS BIGINT) % 1000")
#: Spark-SQL bucket twin (same semantics as BUCKET_SQL / bucket_col) for
#: shared bodies that take the bucket expression as TEXT.
BUCKET_SQL_SPARK = ("cast(conv(substring(md5(cast(doc_id as string)), 1,"
                    " 15), 16, 10) as bigint) % 1000")
#: Keep-rate per language (expects ``lang``): en is downsampled to 50%.
RATE_SQL = "CASE WHEN lang = 'en' THEN 500 ELSE 1000 END"
#: Split assignment (expects ``bucket``).
SPLIT_SQL = ("CASE WHEN bucket % 10 <= 7 THEN 'train' "
             "WHEN bucket % 10 = 8 THEN 'val' ELSE 'test' END")
#: Whitespace token count (expects ``text``).
WS_COUNT_SQL = "len(list_filter(string_split(text, ' '), x -> x <> ''))"
#: Spark-SQL spelling of the same count, for shared bodies executed via
#: ``spark.sql`` (DuckDB's list_filter/string_split are size/filter/split
#: in Spark; agreement with ``ws_count_col`` is test-pinned).
WS_COUNT_SQL_SPARK = "size(filter(split(text, ' '), x -> x <> ''))"


def bucket_col() -> Column:
    """md5-of-doc_id bucket in [0, 1000) — Spark twin of BUCKET_SQL."""
    return F.expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
                  " 16, 10) as bigint) % 1000")


def rate_col() -> Column:
    return F.when(F.col("lang") == "en", F.lit(500)).otherwise(F.lit(1000))


def split_col() -> Column:
    """80/10/10 split from the ``bucket`` column — Spark twin of SPLIT_SQL."""
    return (F.when(F.col("bucket") % 10 <= 7, F.lit("train"))
            .when(F.col("bucket") % 10 == 8, F.lit("val"))
            .otherwise(F.lit("test")))


def ws_count_col() -> Column:
    return F.size(F.filter(F.split("text", " "), lambda x: x != ""))


#: Mixture weights: keep-rate per source in buckets/1000 (the data-mixing
#: recipe — upweight curated sources, downweight crawl). ONE spec feeding
#: the Spark builder and the SQL oracle of ``ext_corpus_mix``.
MIX_RATES = {"src0": 1000, "src1": 700, "src2": 400}
MIX_DEFAULT_RATE = 250


def mix_rate_sql() -> str:
    whens = " ".join(f"WHEN source = '{s}' THEN {r}"
                     for s, r in sorted(MIX_RATES.items()))
    return f"CASE {whens} ELSE {MIX_DEFAULT_RATE} END"


def mix_rate_col() -> Column:
    col = None
    for s, r in sorted(MIX_RATES.items()):
        cond = F.col("source") == s
        col = F.when(cond, F.lit(r)) if col is None else col.when(cond, F.lit(r))
    return col.otherwise(F.lit(MIX_DEFAULT_RATE))
