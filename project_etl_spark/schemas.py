"""Typed schemas.

The reference validates everything at the edge (TOML -> Pydantic models,
fixed binary wire contract — SURVEY.md §1.2). The Spark analog: explicit
``StructType`` for every table this engine touches, used for (a) schema
assertions in tests, (b) ``readStream.schema(...)`` (streaming file sources
require one), (c) documentation of the data model.

Fixture schemas mirror /root/testdata parquet footers (FIXTURES.md §A);
reference-shaped schemas (hits/frames/runs/env) mirror FIXTURES.md §B,
derived from the reference docs:
- hit fields (row, col, toa 10-bit, tot 9-bit): DAQ_self-triggering.md:344-347
- 40-bit frame kinds filler/header/data/trailer: Documentation-Self-Triggering.html:51
- run log records: DAQ_self-triggering.md:254-263
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Fixture tables (/root/testdata/sf*/; FIXTURES.md §A)
# --------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    # naive parquet timestamp -> TIMESTAMP_NTZ under Spark 4 inference
    T.StructField("o_orderdate", T.TimestampNTZType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampNTZType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference-shaped schemas (FIXTURES.md §B) — decode kernel + streaming tests
# --------------------------------------------------------------------------

# Packed acquisition words: reference appends 32-bit words to binary run
# files in 128-word blocks (DAQ_self-triggering.md:199-204, :233-234).
RAW_WORDS = T.StructType([
    T.StructField("run", T.IntegerType()),
    T.StructField("rb", T.IntegerType()),
    T.StructField("word_index", T.LongType()),
    T.StructField("word", T.LongType()),  # 32-bit payload in a signed 64
])

# Decoded 40-bit frames (Documentation-Self-Triggering.html:51).
FRAMES = T.StructType([
    T.StructField("run", T.IntegerType()),
    T.StructField("rb", T.IntegerType()),
    T.StructField("elink", T.IntegerType()),
    T.StructField("kind", T.StringType()),  # filler|header|data|trailer
    T.StructField("payload", T.LongType()),  # 40-bit in a signed 64
])

# Decoded hits (DAQ_self-triggering.md:344-347; EVENT_CNT per
# Documentation-Self-Triggering.html:163-166).
HITS = T.StructType([
    T.StructField("run", T.IntegerType()),
    T.StructField("rb", T.IntegerType()),
    T.StructField("etroc", T.IntegerType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("row", T.IntegerType()),   # 0..15
    T.StructField("col", T.IntegerType()),   # 0..15
    T.StructField("toa", T.IntegerType()),   # 10-bit, 0..1023
    T.StructField("tot", T.IntegerType()),   # 9-bit, 0..511
    T.StructField("ts", T.TimestampType()),
])

# Per-pixel calibration matrix (DAQ_self-triggering.md:85-86).
THRESHOLDS = T.StructType([
    T.StructField("etroc", T.IntegerType()),
    T.StructField("row", T.IntegerType()),
    T.StructField("col", T.IntegerType()),
    T.StructField("baseline", T.DoubleType()),
    T.StructField("noise_width", T.DoubleType()),
    T.StructField("offset", T.IntegerType()),
])

# Per-(run, rb) acquisition stats (DAQ_self-triggering.md:235-236).
DAQ_STATS = T.StructType([
    T.StructField("run", T.IntegerType()),
    T.StructField("rb", T.IntegerType()),
    T.StructField("l1a_rate", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("lost_events", T.LongType()),
    T.StructField("speed_mbps", T.DoubleType()),
])

# Environment time series for as-of/range joins (DAQ_self-triggering.md:249-253).
ENV_SAMPLES = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("channel", T.StringType()),  # vmon|imon|temp
    T.StructField("module", T.IntegerType()),
    T.StructField("value", T.DoubleType()),
])


def assert_schema(df_schema: T.StructType, expected: T.StructType) -> None:
    """Raise if names/types diverge (nullable flags are not compared)."""
    actual = [(f.name, f.dataType.simpleString()) for f in df_schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    if actual != want:
        raise AssertionError(f"schema mismatch:\n  actual: {actual}\n  want:   {want}")
