"""§2.10 UDF / UDAF / UDTF surface.

The slow-path escape hatch, used only where built-ins can't express the
semantics — and always Arrow-vectorized (pandas batches), never row-at-a-time
Python (SURVEY.md §2.10, 100 TB mandate).

Reference analogs: 40-bit frame decode (Documentation-Self-Triggering.html:51,
DAQ_self-triggering.md:344-347), binary blob -> frame rows
(DAQ_self-triggering.md:233-234), per-pixel S-curve midpoint fit
(Documentation-Self-Triggering.html:194).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from project_etl_spark.io import table
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

# Same packed layout as fn_bitfield_unpack (functions.py):
#   row(4b)@23 | col(4b)@19 | toa(10b)@9 | tot(9b)@0

_DECODE_SCHEMA = T.StructType([
    T.StructField("px_row", T.LongType()),
    T.StructField("px_col", T.LongType()),
    T.StructField("toa", T.LongType()),
    T.StructField("tot", T.LongType()),
])


@pandas_udf(_DECODE_SCHEMA)
def decode_word(word: pd.Series) -> pd.DataFrame:
    """Vectorized decode of a packed hit word into a typed struct.

    Arrow hands the JVM column to pandas as one batch; the bit arithmetic is
    numpy-vectorized — this is the pattern for the reference's frame decoder
    (Documentation-Self-Triggering.html:51), ~10-100x faster than a
    row-at-a-time Python UDF.
    """
    w = word.to_numpy()
    return pd.DataFrame({
        "px_row": (w >> 23) & 15,
        "px_col": (w >> 19) & 15,
        "toa": (w >> 9) & 1023,
        "tot": w & 511,
    })


@register(
    "udf_frame_decode",
    oracle="""
        WITH packed AS (
            SELECT l_orderkey, l_linenumber,
                   ((l_orderkey % 16) << 23) | ((l_linenumber % 16) << 19)
                 | ((l_partkey % 1024) << 9) | (l_suppkey % 512) AS word
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               (word >> 23) & 15   AS px_row,
               (word >> 19) & 15   AS px_col,
               (word >> 9) & 1023  AS toa,
               word & 511          AS tot
        FROM packed
    """,
    tags=("udf",),
)
def udf_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF struct decode, hash-checked against pure-SQL bit algebra —
    integer outputs, so the UDF path is exactly verifiable."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    word = (
        F.shiftleft(F.col("l_orderkey") % 16, 23)
        .bitwiseOR(F.shiftleft(F.col("l_linenumber").cast("long") % 16, 19))
        .bitwiseOR(F.shiftleft(F.col("l_partkey") % 1024, 9))
        .bitwiseOR(F.col("l_suppkey") % 512)
    )
    packed = li.select("l_orderkey", "l_linenumber", word.alias("word"))
    decoded = packed.withColumn("d", decode_word("word"))
    return decoded.select("l_orderkey", "l_linenumber",
                          "d.px_row", "d.px_col", "d.toa", "d.tot")


def explode_words_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, text) batches -> (doc_id, word_index, word) rows: each text
    is encoded and chunked into big-endian 32-bit words. Encoding is per-row
    (unavoidable in Python); everything after is one numpy pass over the
    concatenated blob — no per-word loop (100 TB no-Python-in-hot-path rule)."""
    import numpy as np

    for pdf in batches:
        blobs = [t.encode("utf-8") for t in pdf["text"]]
        n_words = np.fromiter((len(b) // 4 for b in blobs),
                              dtype=np.int64, count=len(blobs))
        buf = b"".join(b[:n * 4] for b, n in zip(blobs, n_words))
        words = np.frombuffer(buf, dtype=">u4").astype(np.int64)
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_words)
        starts = np.cumsum(n_words) - n_words
        word_index = np.arange(len(words)) - np.repeat(starts, n_words)
        yield pd.DataFrame({"doc_id": doc_ids,
                            "word_index": word_index,
                            "word": words})


@register(
    "udtf_frame_stream",
    oracle="""
        WITH enc AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) // 4 AS n_words
            FROM documents
        ),
        series AS (SELECT unnest(range(0, 4096)) AS i)
        SELECT e.doc_id, s.i AS word_index,
               CAST(concat('0x', substr(e.h, 1 + 8 * s.i, 8)) AS BIGINT)
                   AS word
        FROM enc e, series s
        WHERE s.i < e.n_words
    """,
    tags=("udf", "udtf"),
)
def udtf_frame_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One blob -> many word rows (binary run file -> frame stream,
    DAQ_self-triggering.md:233-234): documents.text is encoded to bytes and
    chunked into big-endian 32-bit words via ``mapInPandas`` (UDTF-style
    fan-out). The chunking is deterministic integer algebra, so it is
    hash-checked: the oracle hexes the utf-8 blob and parses each 8-hex-char
    slice as the same big-endian u32 (series bound 4096 words = 16 KiB text,
    ~28x the longest fixture document)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("word_index", T.LongType()),
        T.StructField("word", T.LongType()),
    ])

    return docs.mapInPandas(explode_words_batches, out_schema)


@register(
    "udf_arrow_batch",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (l_extendedprice * (1e0 - l_discount)) * (1e0 + l_tax)
                   AS charge
        FROM lineitem
    """,
    tags=("udf", "arrow"),
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-throughput Arrow-batch transform (``mapInArrow``): pyarrow
    compute kernels over RecordBatches with zero pandas conversion — the
    fastest Python boundary Spark offers (100 TB mandate, SURVEY.md §2.10).
    The charge expression is a fixed left-to-right sequence of per-row
    IEEE double ops, so the Arrow kernel output hash-matches the oracle
    bit for bit (products need no quantization; only reduction order
    does — portable.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")

    out_schema = T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("charge", T.DoubleType()),
    ])

    def transform(batches):
        for batch in batches:
            ep = batch.column("l_extendedprice")
            charge = pc.multiply(
                pc.multiply(ep, pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                pc.add(pa.scalar(1.0), batch.column("l_tax")))
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), charge],
                names=["l_orderkey", "l_linenumber", "charge"])

    return li.mapInArrow(transform, out_schema)


def scurve_crossing(dac, eff, level: float) -> float:
    """First DAC where the piecewise-linear efficiency curve crosses
    ``level`` (inputs sorted by dac). NaN if it never crosses."""
    for i in range(1, len(dac)):
        lo, hi = eff[i - 1], eff[i]
        if (lo - level) * (hi - level) <= 0 and lo != hi:
            return dac[i - 1] + (level - lo) * (dac[i] - dac[i - 1]) / (hi - lo)
    return float("nan")


def scurve_params(dac, eff) -> tuple[float, float]:
    """(midpoint, width) of an S-curve: midpoint = 50% crossing; width =
    half the 16%-to-84% crossing span — the Gaussian-sigma convention for
    threshold-scan noise width (the reference fits midpoint AND width of the
    charge-injection S-curve, Documentation-Self-Triggering.html:194)."""
    mid = scurve_crossing(dac, eff, 0.5)
    lo = scurve_crossing(dac, eff, 0.16)
    hi = scurve_crossing(dac, eff, 0.84)
    return mid, (hi - lo) / 2.0


@register(
    "udaf_scurve_fit",
    oracle="""
        WITH curve AS (
            SELECT p_brand,
                   CAST(FLOOR(p_retailprice / 500) AS BIGINT) AS dac,
                   AVG(CASE WHEN p_size > 25 THEN 1e0 ELSE 0e0 END) AS eff
            FROM part GROUP BY 1, 2
        ),
        seg AS (
            SELECT p_brand, dac, eff,
                   LAG(dac) OVER w AS pdac, LAG(eff) OVER w AS peff,
                   CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT)
                       AS n_points
            FROM curve
            WINDOW w AS (PARTITION BY p_brand ORDER BY dac)
        ),
        xing AS (
            SELECT p_brand, lvl.level,
                   CAST(pdac AS DOUBLE)
                     + (lvl.level - peff)
                       * (CAST(dac AS DOUBLE) - CAST(pdac AS DOUBLE))
                       / (eff - peff) AS x,
                   ROW_NUMBER() OVER (PARTITION BY p_brand, lvl.level
                                      ORDER BY dac) AS rn
            FROM seg, (VALUES (5e-1), (1.6e-1), (8.4e-1)) lvl(level)
            WHERE pdac IS NOT NULL
              AND (peff - lvl.level) * (eff - lvl.level) <= 0
              AND peff <> eff
        ),
        fit AS (
            SELECT p_brand,
                   MAX(CASE WHEN level = 5e-1   THEN x END) AS mid,
                   MAX(CASE WHEN level = 1.6e-1 THEN x END) AS lo,
                   MAX(CASE WHEN level = 8.4e-1 THEN x END) AS hi
            FROM xing WHERE rn = 1 GROUP BY p_brand
        ),
        brands AS (SELECT DISTINCT p_brand, n_points FROM seg)
        SELECT b.p_brand,
               FLOOR(f.mid * 1e6 + 5e-1) / 1e6 AS midpoint_dac,
               FLOOR((f.hi - f.lo) / 2e0 * 1e6 + 5e-1) / 1e6 AS width_dac,
               b.n_points
        FROM brands b LEFT JOIN fit f ON b.p_brand = f.p_brand
    """,
    tags=("udf", "udaf"),
)
def udaf_scurve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped S-curve midpoint + width fit (threshold DAC at 50% efficiency
    and noise sigma from the 16/84% span,
    Documentation-Self-Triggering.html:194): per-group ``applyInPandas``
    linear interpolation over the (dac_bucket, efficiency) curve built from
    ``part``. The crossings are piecewise-linear algebra — the same IEEE
    sequence the oracle runs with window LAG over ordered dac buckets — so
    the UDAF is hash-checked; never-crossing groups emit NULL on both
    sides. Golden-curve unit tests additionally pin exact values."""
    ensure_deterministic(spark)
    p = table(spark, sf_dir, "part")
    fired = F.when(F.col("p_size") > 25, 1).otherwise(0)
    curve = (
        p.groupBy("p_brand", F.floor(F.col("p_retailprice") / 500).alias("dac"))
        .agg(F.avg(fired.cast("double")).alias("eff"))
    )

    out_schema = T.StructType([
        T.StructField("p_brand", T.StringType()),
        T.StructField("midpoint_dac", T.DoubleType()),
        T.StructField("width_dac", T.DoubleType()),
        T.StructField("n_points", T.LongType()),
    ])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        def r6(x: float) -> float | None:
            # portable.py floor-algebra rounding; NaN (never crosses) -> NULL
            return None if math.isnan(x) else math.floor(x * 1e6 + 0.5) / 1e6

        pdf = pdf.sort_values("dac")
        brand = pdf["p_brand"].iloc[0]
        dac = pdf["dac"].to_numpy(dtype=float)
        eff = pdf["eff"].to_numpy(dtype=float)
        mid, width = scurve_params(dac, eff)
        return pd.DataFrame({"p_brand": [brand],
                             "midpoint_dac": [r6(mid)],
                             "width_dac": [r6(width)],
                             "n_points": [len(dac)]})

    return curve.groupBy("p_brand").applyInPandas(fit, out_schema)


@register(
    "udtf_python_native",
    oracle="""
        WITH parts AS (
            SELECT doc_id, string_split(text, '.') AS p
            FROM documents
        ),
        sent AS (
            SELECT doc_id, CAST(i AS INT) AS sent_idx,
                   trim(p[i]) AS sentence
            FROM (SELECT doc_id, p, unnest(range(1, len(p) + 1)) AS i
                  FROM parts)
        )
        SELECT doc_id, sent_idx,
               CAST(length(sentence) AS INT) AS n_chars,
               CAST(len(list_filter(string_split(sentence, ' '),
                                    x -> x <> '')) AS INT) AS n_words
        FROM sent
        WHERE sentence <> ''
    """,
    tags=("udf", "udtf", "python"),
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Python UDTF surface (``@udtf``, lateral-joined in SQL):
    one document row fans out to one row per sentence with per-sentence
    stats — the table-function API a user reaches for when the fan-out
    logic is genuinely imperative. Registered with ``spark.udtf.register``
    and invoked as ``LATERAL split_sentences(text)``, the planner treats
    it like any generator. Throughput note: plain Python UDTFs evaluate
    row-at-a-time — fine for control-plane fan-outs like this; bulk
    decode paths use the Arrow-vectorized twin (``udtf_frame_stream``,
    ``mapInPandas``) instead. Deterministic splitting (the '.' delimiter,
    trim, empty drop) keeps it hash-checked."""
    ensure_deterministic(spark)
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_chars int, n_words int")
    class SplitSentences:
        def eval(self, text: str):
            idx = 0
            for raw in (text or "").split("."):
                idx += 1
                s = raw.strip()
                if s:
                    yield idx, len(s), len([w for w in s.split(" ") if w])

    spark.udtf.register("split_sentences", SplitSentences)
    table(spark, sf_dir, "documents").createOrReplaceTempView("t_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.sent_idx, s.n_chars, s.n_words
        FROM t_udtf_docs d, LATERAL split_sentences(d.text) s
    """)

@register(
    "udf_cogroup_merge",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 1e2 + 5e-1)
                                      AS BIGINT)), 0) AS BIGINT)
                   AS total_cents,
               CAST(MAX(o.o_orderdate) AS TIMESTAMP) AS last_order_ts
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey % 50 = 0
        GROUP BY 1, 2
    """,
    tags=("udf", "cogroup"),
)
def udf_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED pandas surface —
    ``dfA.groupBy(k).cogroup(dfB.groupBy(k)).applyInPandas``: both sides
    are co-shuffled on the key and each key's two pandas frames arrive in
    ONE Python call, the API for per-key merge logic too imperative for a
    join (asof-merges, per-entity reconciliation). Here each customer's
    frame meets their orders frame and pandas computes the account
    summary; customers with no orders still get a row (cogroup yields
    keys present on EITHER side — the left-outer semantics the oracle
    spells as LEFT JOIN + GROUP BY). Integer-cents math keeps it
    hash-checked.

    Scale shape: one co-partitioned shuffle per side (same hash
    partitioning, no broadcast needed at any size), Arrow-batched
    transfer. Per-group Python dispatch is the cost driver, so the demo
    keys down to 2% of customers (custkey % 50) — at 100 TB you reserve
    cogroup for genuinely imperative merges and keep declarative
    aggregates in Catalyst (the oracle's plan IS that twin)."""
    ensure_deterministic(spark)
    pick = lambda df, k: df.where(F.col(k) % 50 == 0)
    cust = pick(table(spark, sf_dir, "customer"), "c_custkey").select(
        "c_custkey", "c_mktsegment")
    orders = pick(table(spark, sf_dir, "orders"), "o_custkey").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5))
        .cast("long").alias("cents"))

    out_schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_order_ts", T.TimestampType()),
    ])

    def merge(cdf: pd.DataFrame, odf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:  # order rows with no customer row: nothing to report
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in out_schema})
        n = len(odf)
        return pd.DataFrame({
            "c_custkey": [int(cdf["c_custkey"].iloc[0])],
            "c_mktsegment": [cdf["c_mktsegment"].iloc[0]],
            "n_orders": [n],
            "total_cents": [int(odf["cents"].sum()) if n else 0],
            "last_order_ts": [odf["o_orderdate"].max() if n else None],
        })

    return (cust.groupBy("c_custkey")
            .cogroup(orders.groupBy("o_custkey"))
            .applyInPandas(merge, out_schema))

@register(
    "udf_apply_in_arrow",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(FLOOR(l_quantity + 5e-1) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(MAX(CAST(FLOOR(l_extendedprice * 1e2 + 5e-1) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM lineitem GROUP BY 1
    """,
    tags=("udf", "arrow"),
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``applyInArrow`` surface (Spark 4.0): per-group transforms
    that receive a ``pyarrow.Table`` directly — no pandas
    materialization, no NumPy dtype coercion on the way in or out, the
    zero-copy rung below ``applyInPandas`` for group logic that is
    itself columnar (here: arrow.compute reductions per return flag).
    The integer quantization happens JVM-side BEFORE the crossing, so
    Python only ever reduces exact int64 columns and the result is
    hash-identical to the declarative oracle.

    Scale shape: one shuffle on the 3-value group key (at 100 TB you'd
    pre-aggregate or salt a 3-key grouping; the op's purpose is the API
    surface and its Arrow batch contract, pinned by the oracle). Arrow
    transfer is bounded by the two projected int columns — column
    pruning reaches the scan."""
    ensure_deterministic(spark)
    import pyarrow as pa

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
        .cast("long").alias("cents"))

    def reduce_group(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc
        return pa.table({
            "l_returnflag": [t.column("l_returnflag")[0].as_py()],
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "sum_qty": pa.array([pc.sum(t.column("qty")).as_py()],
                                pa.int64()),
            "max_cents": pa.array([pc.max(t.column("cents")).as_py()],
                                  pa.int64()),
        })

    return li.groupBy("l_returnflag").applyInArrow(
        reduce_group,
        "l_returnflag string, n_rows long, sum_qty long, max_cents long")


# --------------------------------------------------------------------------
# udaf_pandas_grouped_agg — the GROUPED_AGG pandas UDF surface
# --------------------------------------------------------------------------

_IQR_SQL = """
    SELECT l_returnflag,
           CAST(FLOOR((quantile_cont(l_quantity, 0.75)
                       - quantile_cont(l_quantity, 0.25)) * 1e6 + 5e-1)
                AS BIGINT) AS iqr_micro,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
"""


@register("udaf_pandas_grouped_agg", oracle=_IQR_SQL,
          tags=("udf", "udaf", "pandas"))
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDF — the one vectorized-UDF API shape the
    registry was missing (scalar pandas_udf, applyInPandas, cogrouped,
    mapInArrow, and @udtf are all covered): a whole group's column
    arrives as ONE pandas Series and the function returns ONE scalar,
    usable directly inside ``groupBy().agg`` (and over unbounded
    windows). Computes the interquartile range of quantity per return
    flag — a rank statistic with no builtin aggregate, i.e. the genuine
    use case for dropping to Python here. numpy's default linear
    interpolation IS SQL ``percentile_cont`` semantics, so the quantized
    result hash-checks against DuckDB's ``quantile_cont`` exactly.

    Scale shape: Spark CANNOT partial-aggregate an opaque Python UDAF —
    each group's full column crosses to ONE python worker (Arrow-batched,
    but still a per-group gather). Right for bounded groups like these 3
    flags; for high-cardinality or giant groups use the builtin
    ``percentile_approx`` twin (`win_percentile_approx`) or the exact
    sort-based `agg_percentile_exact` instead — that trade is the
    docstring's warning label, not a footnote."""
    import numpy as np

    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def iqr(v: pd.Series) -> float:
        a = v.to_numpy(dtype="float64")
        return float(np.percentile(a, 75) - np.percentile(a, 25))

    # Spark refuses to mix a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg() — the group count therefore also comes
    # from a pandas aggregate (same Arrow transfer, zero extra cost)
    @pandas_udf("long")
    def grp_n(v: pd.Series) -> int:
        return int(len(v))

    return (li.groupBy("l_returnflag")
            .agg(F.floor(iqr("l_quantity") * F.lit(1e6) + F.lit(0.5))
                 .cast("long").alias("iqr_micro"),
                 grp_n("l_quantity").alias("n")))


# --------------------------------------------------------------------------
# udf_pandas_iter — Iterator[pd.Series] pandas UDF (per-partition init)
# --------------------------------------------------------------------------

#: price-band breakpoints in cents, built ONCE per python worker inside
#: the iterator UDF (the expensive-init slot) and shared by the oracle's
#: CASE ladder below — one spec, two spellings.
_ITER_BANDS = (10_000_00, 30_000_00, 60_000_00)   # 10k / 30k / 60k dollars

_ITER_ORACLE = f"""
SELECT CASE
         WHEN CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
              < {_ITER_BANDS[0]} THEN 0
         WHEN CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
              < {_ITER_BANDS[1]} THEN 1
         WHEN CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)
              < {_ITER_BANDS[2]} THEN 2
         ELSE 3
       END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT))
            AS BIGINT) AS cents
FROM orders GROUP BY 1
"""


@register("udf_pandas_iter", oracle=_ITER_ORACLE,
          tags=("udf", "arrow", "iterator"))
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ITERATOR-form pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`, Spark 3.0+) — the API slot whose whole reason
    to exist is per-partition expensive initialization: the setup code
    before the `for` loop runs ONCE per python worker, then every Arrow
    batch streams through the hot loop. This is THE pattern for LLM
    pipelines that load a tokenizer/model per executor rather than per
    batch (`udf_arrow_batch` covers the stateless scalar form;
    `udtf_frame_stream` the mapInPandas form; this completes the
    vectorized-UDF matrix). Here the "model" is a numpy breakpoint
    table binary-searched per batch — deterministic stand-in with the
    real init/stream split.

    Determinism: cents quantize JVM-side BEFORE the UDF (the Python
    boundary ships exact int64), numpy searchsorted against integer
    breakpoints is exact, and the census close is integer aggregation.

    Scale shape: one Arrow-batched map pass (init amortized per worker,
    not per batch), then ONE map-side-combinable reduce. Identical plan
    mass to the CASE-ladder oracle, which is the point: use built-ins
    when the logic is a CASE; use THIS form when init costs real time."""
    ensure_deterministic(spark)
    import numpy as np

    bands = _ITER_BANDS

    @pandas_udf(T.LongType())
    def band_of(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive-init slot: built once per python worker
        table_np = np.asarray(bands, dtype=np.int64)
        for cents in batches:
            idx = np.searchsorted(table_np, cents.to_numpy(np.int64),
                                  side="right")
            yield pd.Series(idx.astype("int64"))

    o = table(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 1e2 + 5e-1) as bigint)")
    return (o.select(cents.alias("cents"))
            .select(band_of("cents").alias("band"), "cents")
            .groupBy("band")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 F.sum("cents").cast("long").alias("cents")))
