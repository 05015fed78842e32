"""§2.8 Scalar function families.

Reference analogs: bitfield unpacking of packed hit words (TOA 10 bits /
TOT 9 bits / row / col — DAQ_self-triggering.md:344-347,
Documentation-Self-Triggering.html:51, :111), filename parsing
(DAQ_self-triggering.md:293-294), ISO timestamps and run durations
(:258-259), threshold arithmetic (:86), per-ETROC keyed maps (:413-415),
run-log JSON records (:254-263).

Everything here is a built-in JVM expression inside whole-stage codegen —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.portable import (pround, qint, sql_exact_avg,
                                        exact_avg, sql_round)
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

# Packed "data frame" layout used by the bitfield round-trip (27 bits):
#   bits 23..26 row (4b) | bits 19..22 col (4b) | bits 9..18 toa (10b) | bits 0..8 tot (9b)
# mirroring the reference's data-frame fields (DAQ_self-triggering.md:344-347).


@register(
    "fn_bitfield_unpack",
    oracle="""
        WITH packed AS (
            SELECT l_orderkey, l_linenumber,
                   ((l_orderkey % 16) << 23) | ((l_linenumber % 16) << 19)
                 | ((l_partkey % 1024) << 9) | (l_suppkey % 512) AS word
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, word,
               (word >> 23) & 15   AS px_row,
               (word >> 19) & 15   AS px_col,
               (word >> 9) & 1023  AS toa,
               word & 511          AS tot
        FROM packed
    """,
    tags=("function", "bitwise"),
)
def fn_bitfield_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack then unpack hit fields with shift/mask expressions — the wire
    format round-trip (TOA/TOT/row/col, DAQ_self-triggering.md:344-347)."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    word = (
        F.shiftleft(F.col("l_orderkey") % 16, 23)
        .bitwiseOR(F.shiftleft(F.col("l_linenumber").cast("long") % 16, 19))
        .bitwiseOR(F.shiftleft(F.col("l_partkey") % 1024, 9))
        .bitwiseOR(F.col("l_suppkey") % 512)
    )
    packed = li.select("l_orderkey", "l_linenumber", word.alias("word"))
    return packed.select(
        "l_orderkey", "l_linenumber", "word",
        F.shiftright("word", 23).bitwiseAND(15).alias("px_row"),
        F.shiftright("word", 19).bitwiseAND(15).alias("px_col"),
        F.shiftright("word", 9).bitwiseAND(1023).alias("toa"),
        F.col("word").bitwiseAND(511).alias("tot"),
    )


@register(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num,
               lower(c_mktsegment) AS seg_lower,
               substr(c_name, 1, 8) AS name_prefix,
               length(c_name) AS name_len,
               concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
               string_split(c_name, '#')[2] AS name_suffix
        FROM customer
    """,
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: regexp_extract / split / lower / substring / length /
    concat_ws (filename + module-name parsing, DAQ_self-triggering.md:293-294,
    :410)."""
    ensure_deterministic(spark)
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("name_num"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string"))
        .alias("seg_nation"),
        F.split("c_name", "#").getItem(1).alias("name_suffix"),
    )


@register(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mth,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                   AS days_since_epoch0,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso
        FROM orders
    """,
    tags=("function", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract / trunc / diff / format (run durations and
    ISO-8601 start/finish times, DAQ_self-triggering.md:258-259). Formatted
    strings, not raw timestamps, so both engines serialize identically."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_epoch0"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso"),
    )


@register(
    "fn_interval_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus_30d,
               CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                    AS VARCHAR)
                   AS plus_3m,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)
                   AS month_end,
               CAST((EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT)
                   AS months_since_1992
        FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("fn", "datetime", "interval"),
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar INTERVAL arithmetic — the datetime surface ``fn_datetime``
    leaves out: day offsets (``date_add``), calendar-month offsets with
    end-of-month clamping (``add_months`` — Jan 31 + 1 month = Feb 28 in
    BOTH engines, the semantics ad-hoc day-count arithmetic gets wrong),
    period end (``last_day``), and a pure-algebra month index (the
    engine-portable alternative to fractional ``months_between``). Dates
    render as ISO strings so the hash is serialization-independent.
    Row-local codegen over a pushed-down modulo sample."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (o.where(F.col("o_orderkey") % 97 == 0)
            .select("o_orderkey",
                    F.date_add(d, 30).cast("string").alias("plus_30d"),
                    F.add_months(d, 3).cast("string").alias("plus_3m"),
                    F.last_day(d).cast("string").alias("month_end"),
                    ((F.year(d) - 1992) * 12 + F.month(d) - 1).cast("long")
                    .alias("months_since_1992")))


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                   / 100.0) AS net,
               CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
               ABS(l_quantity - 25.0) AS qty_dev,
               (FLOOR(SQRT(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0) AS price_sqrt,
               (FLOOR(LN(l_extendedprice + 1) * 1000000.0 + 0.5) / 1000000.0) AS price_ln,
               (FLOOR(POW(l_discount, 2) * 1000000.0 + 0.5) / 1000000.0) AS disc_sq
        FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/rounding family (threshold = baseline + offset, rate =
    events / 30 s, Mbps — DAQ_self-triggering.md:86, :236, :452). Transcendental
    outputs rounded to 6 dp to absorb libm ulp differences across engines."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kbucket"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        pround(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        pround(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        pround(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
    )


@register(
    "fn_conditional",
    oracle="""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END AS tier,
               o_orderstatus,
               COUNT(*) AS n,
               (CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) / (COUNT(*) * 100.0)) AS avg_price
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering (power_mode low/medium/high behavior switches,
    DAQ_self-triggering.md:81, :167-173)."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    tier = (F.when(F.col("o_totalprice") < 100000, "small")
            .when(F.col("o_totalprice") < 300000, "medium")
            .otherwise("large"))
    return (o.groupBy(tier.alias("tier"), F.col("o_orderstatus"))
            .agg(F.count(F.lit(1)).alias("n"),
                 exact_avg(F.col("o_totalprice"), 2).alias("avg_price")))


@register(
    "fn_array",
    oracle="""
        SELECT l_orderkey,
               CAST(len(list(l_partkey)) AS INT) AS n_items,
               array_to_string(list(l_partkey ORDER BY l_partkey), ',') AS parts_csv,
               array_to_string(list_transform(list(l_partkey ORDER BY l_partkey),
                                              x -> x % 16), ',') AS pixel_csv,
               MAX(l_partkey) AS max_part
        FROM lineitem
        GROUP BY l_orderkey
    """,
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: collect -> sort -> transform -> join (16x16 matrices
    long form <-> arrays, DAQ_self-triggering.md:85). ``array_sort`` after
    ``collect_list`` makes the list deterministic (SURVEY.md §7.3.1); the
    higher-order ``transform`` runs JVM-side."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts"),
        F.max("l_partkey").alias("max_part"),
    )
    return grouped.select(
        "l_orderkey",
        F.size("parts").alias("n_items"),
        F.array_join(F.transform("parts", lambda x: x.cast("string")), ",")
        .alias("parts_csv"),
        F.array_join(F.transform("parts", lambda x: (x % 16).cast("string")), ",")
        .alias("pixel_csv"),
        "max_part",
    )


@register(
    "fn_map",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        FROM orders
        GROUP BY 1
    """,
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-map build + lookup (per-ETROC offset maps ``{0 = 30, 1 = 30}``,
    DAQ_self-triggering.md:413-415): counts per status folded into a
    MapType column, then read back with ``element_at``."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    per_status = (o.groupBy("o_orderpriority", "o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    with_map = (
        per_status.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("status_map"))
    )
    def lookup(k: str):
        return F.coalesce(F.element_at("status_map", F.lit(k)), F.lit(0))
    return with_map.select(
        "priority",
        lookup("F").alias("f_cnt"),
        lookup("O").alias("o_cnt"),
        lookup("P").alias("p_cnt"),
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction feeding aggregates (run-log JSON records,
    DAQ_self-triggering.md:254-263)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "fn_higher_order",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(toks, x -> len(x) >= 5)) AS BIGINT)
                   AS n_long,
               CAST(list_sum(list_transform(toks, x -> len(x)))
                    AS BIGINT) AS total_chars,
               CAST(CASE WHEN len(list_filter(toks, x -> x = 'the')) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS has_the,
               CAST(list_max(list_transform(toks, x -> len(x)))
                    AS BIGINT) AS max_len
        FROM w
    """,
    tags=("function", "hof"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class surface — transform /
    filter / aggregate / exists / array_max composed over a tokenized
    column, all inside whole-stage codegen (this is the JVM-side
    alternative to a Python UDF for per-row collection logic; the same
    functions power the quantize and PCA kernels). Row-local: no shuffle,
    and the lambda algebra maps 1:1 onto DuckDB's list_* twins."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) >= 5)).cast("bigint")
        .alias("n_long"),
        F.aggregate(F.transform(toks, lambda x: F.length(x).cast("bigint")),
                    F.lit(0).cast("bigint"), lambda a, x: a + x)
        .alias("total_chars"),
        F.exists(toks, lambda x: x == "the").cast("bigint").alias("has_the"),
        F.array_max(F.transform(toks, lambda x: F.length(x).cast("bigint")))
        .alias("max_len"))


@register(
    "fn_regex",
    oracle="""
        SELECT source,
               CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS src_id,
               CAST(regexp_matches(source, '^src[0-9]+$') AS INTEGER)
                   AS well_formed,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT)
                   AS n_word_runs
        FROM documents
        GROUP BY source
    """,
    tags=("function", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface — extract / validate / extract-all — with patterns
    restricted to the dialect-neutral core (explicit classes, no \\d or
    \\w shorthands, no lookaround): Java's regex and DuckDB's RE2 disagree
    on shorthand-class unicode semantics but agree character for character
    on explicit ranges, the same discipline BPE_PATTERN documents. The
    run/rb filename parse (`fn_string`) is the reference analog; this row
    pins the broader API."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    return (docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0))
              .cast("long")).alias("n_word_runs"))
        .select(
            "source",
            F.regexp_extract("source", "([0-9]+)", 1).cast("bigint")
            .alias("src_id"),
            F.col("source").rlike("^src[0-9]+$").cast("int")
            .alias("well_formed"),
            "n_docs", "n_word_runs"))


@register(
    "fn_url_parse",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.org/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param,
               CAST(length(url) AS BIGINT) AS url_len
        FROM u
    """,
    tags=("function", "url"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dissection — host / path / query-parameter extraction, the
    per-document provenance parse every web-corpus pipeline runs before
    domain filtering or per-host rate accounting. URLs are synthesized
    deterministically from the fixture columns (the corpus carries no
    organic URLs — same convention as `ext_pii_redact`), then parsed with
    dialect-neutral explicit-class regexes so Java regex and DuckDB RE2
    agree exactly. Spark's `parse_url` is the JVM-native alternative; the
    regexp form is used here because it is engine-portable and equally
    row-local (whole-stage codegen, zero shuffles)."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/docs/"),
                   F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    return (docs.select("doc_id", url.alias("url"))
            .select(
                "doc_id",
                F.regexp_extract("url", "[a-z]+://([^/]+)", 1).alias("host"),
                F.regexp_extract("url", "[a-z]+://[^/]+(/[^?]*)", 1)
                .alias("path"),
                F.regexp_extract("url", "lang=([a-z]+)", 1)
                .alias("lang_param"),
                F.length("url").cast("long").alias("url_len")))


@register(
    "fn_try_safe",
    oracle=f"""
        WITH dirty AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_orderpriority
                        ELSE CAST(o_orderkey AS VARCHAR) END AS num_str,
                   CAST(o_orderkey % 5 AS BIGINT) AS denom,
                   o_totalprice
            FROM orders
        ),
        safe AS (
            SELECT TRY_CAST(num_str AS BIGINT) AS parsed,
                   o_totalprice / (CASE WHEN denom = 0 THEN NULL
                                        ELSE denom END) AS ratio
            FROM dirty
        )
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_parse_null,
               CAST(SUM(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_div_null,
               (CAST(SUM(CASE WHEN ratio IS NOT NULL THEN
                    CAST(FLOOR(ratio * 1e2 + 5e-1) AS BIGINT) END)
                 AS BIGINT) / 1e2) AS sum_ratio
        FROM safe
    """,
    tags=("function", "ansi", "robustness"),
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface (``try_cast`` / ``try_divide``): the
    engine runs with ANSI mode ON (Spark 4 default — overflow and bad
    casts are errors, the correctness-first posture), so dirty-data paths
    must opt into NULL-on-failure explicitly rather than inheriting
    silent truncation. A deterministically dirtied projection (every 7th
    key's numeric string replaced by a priority word; every 5th divisor
    zero) flows through try_cast + try_divide and the census counts both
    NULL classes — the quarantine arithmetic twin of
    ``scan_csv_permissive``. Row-local, codegen, one tiny census
    aggregate; the DuckDB twin uses its native NULL-on-zero-division
    semantics, so the hash match also documents the dialect equivalence."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    num_str = (F.when(F.col("o_orderkey") % 7 == 0, F.col("o_orderpriority"))
               .otherwise(F.col("o_orderkey").cast("string")))
    denom = (F.col("o_orderkey") % 5).cast("long")
    parsed = F.expr("try_cast(num_str AS BIGINT)")
    ratio = F.expr("try_divide(o_totalprice, CASE WHEN denom = 0 "
                   "THEN NULL ELSE denom END)")
    dirty = o.select(num_str.alias("num_str"), denom.alias("denom"),
                     "o_totalprice")
    safe = dirty.select(parsed.alias("parsed"), ratio.alias("ratio"))
    return safe.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0))
        .alias("n_parse_null"),
        F.sum(F.when(F.col("ratio").isNull(), 1).otherwise(0))
        .alias("n_div_null"),
        (F.sum(F.when(F.col("ratio").isNotNull(),
                      qint(F.col("ratio"), 2))) / F.lit(1e2))
        .alias("sum_ratio"))


@register(
    "fn_variant_parse",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
               json_extract_string(props, '$.missing') AS missing_str
        FROM events
        WHERE event_id % 25 = 0
    """,
    tags=("function", "variant", "json"),
)
def fn_variant_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): ``parse_json`` ingests
    the JSON string ONCE into the binary variant encoding, then typed
    ``variant_get`` extractions navigate it without re-parsing — the
    open-schema answer when run-log payloads evolve faster than DDL
    (string JSON re-parses per extraction; variant amortizes it, and at
    100 TB parse-once-extract-many is the difference that shows up on the
    bill). Missing paths surface as NULL (``try_variant_get`` semantics
    via the nullable cast), matching the oracle's JSON-path reads."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 25 == 0)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"))


@register(
    "fn_string_collation",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(COUNT(DISTINCT lower(o_orderstatus)) AS BIGINT)
                   AS n_status_ci,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
                   AS n_status_cs
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("function", "collation"),
)
def fn_string_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation surface (Spark 4): the SAME column counted
    distinct under the case-insensitive ``UTF8_LCASE`` collation and
    under binary collation, side by side — collation-aware comparison is
    declared on the expression (``collate``) instead of scattering
    ``lower()`` through every predicate, and Catalyst pushes it into the
    hash aggregation itself. The oracle mirrors the lcase collation with
    an explicit ``lower()``, which is the semantics contract: LCASE
    collation == binary equality on lowercased text for ASCII data."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct(F.expr(
                     "collate(o_orderstatus, 'UTF8_LCASE')"))
                 .alias("n_status_ci"),
                 F.countDistinct("o_orderstatus").alias("n_status_cs")))


_XML_SQL = """
SELECT o_orderstatus AS status, TRUE AS id_ok,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders GROUP BY 1
"""


@register("fn_xml", oracle=_XML_SQL, tags=("fn", "xml"))
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (``from_xml``, Spark 4): round-trip every order through
    an XML document — attribute (``id``) + nested elements — and parse it
    back with a typed schema, the config-interchange analog of the run-log
    formats (the reference stack speaks TOML/YAML/JSON, DAQ_self-triggering.md:18,
    :235-236; XML is the remaining config dialect an engine meets in the
    wild). The oracle computes the same census straight from the source
    columns, so the hash match proves the serialize->parse->extract loop is
    lossless: ``id_ok`` pins attribute extraction against the source key,
    ``total_cents`` pins the DOUBLE element round-trip exactly (quantized
    integer sum), ``n`` per status pins element text. Row-local codegen
    expressions — no shuffle beyond the final census aggregate."""
    ensure_deterministic(spark)
    od = table(spark, sf_dir, "orders")
    xml = od.select(
        "o_orderkey",
        F.concat(F.lit('<order id="'), F.col("o_orderkey"),
                 F.lit('"><status>'), F.col("o_orderstatus"),
                 F.lit('</status><total>'),
                 F.col("o_totalprice").cast("string"),
                 F.lit('</total><prio>'), F.col("o_orderpriority"),
                 F.lit('</prio></order>')).alias("doc"))
    parsed = xml.select(
        "o_orderkey",
        F.from_xml("doc", "_id BIGINT, status STRING, total DOUBLE, prio STRING",
                   {"attributePrefix": "_"}).alias("o"))
    return (parsed.select(
        "o.status", qint(F.col("o.total"), 2).alias("cents"),
        (F.col("o._id") == F.col("o_orderkey")).alias("id_ok"))
        .groupBy("status", "id_ok")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("cents").alias("total_cents")))


_CRYPTO_SQL = """
WITH pii AS (
    SELECT c_mktsegment,
           lower(replace(c_name, ' ', '.')) || '@example.org' AS email
    FROM customer
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(COUNT(DISTINCT email) AS BIGINT) AS n_distinct_tokens,
       sha256(MIN(email)) AS sha_min_email
FROM pii GROUP BY c_mktsegment
"""


@register("fn_crypto_tokenize", oracle=_CRYPTO_SQL, tags=("fn", "crypto"))
def fn_crypto_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reversible PII tokenization (``aes_encrypt``/``aes_decrypt``, ECB for
    deterministic tokens) + the cross-engine hash family: synthesize an
    email per customer, encrypt it into a stable token — the join-safe
    pseudonymization every privacy-constrained pipeline uses where
    ``ext_pii_redact``'s one-way scrub is too destructive — decrypt it
    back, and count the verified roundtrips. The oracle cannot run AES, so
    the contract is indirect but sharp: ``n_roundtrip_ok`` must equal the
    group size (one failed decrypt breaks the hash), ``n_distinct_tokens``
    must equal distinct plaintexts (deterministic tokens are injective —
    what makes them joinable), and ``sha256`` of the minimum email is
    checked cross-engine directly (``sha2(x, 256)`` = DuckDB ``sha256``).
    All row-local codegen; only the census aggregates."""
    ensure_deterministic(spark)
    cu = table(spark, sf_dir, "customer")
    key = "0123456789abcdef"
    pii = cu.select(
        "c_mktsegment",
        F.concat(F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
                 F.lit("@example.org")).alias("email"))
    tok = pii.select(
        "c_mktsegment", "email",
        F.expr(f"base64(aes_encrypt(email, '{key}', 'ECB'))").alias("token"),
        F.expr(f"cast(aes_decrypt(aes_encrypt(email, '{key}', 'ECB'), "
               f"'{key}', 'ECB') as string)").alias("roundtrip"))
    return tok.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("roundtrip") == F.col("email")).cast("long"))
        .alias("n_roundtrip_ok"),
        F.count_distinct("token").alias("n_distinct_tokens"),
        F.sha2(F.min("email"), 256).alias("sha_min_email"))


# --------------------------------------------------------------------------
# fn_luhn_checksum — check-digit validation over synthesized account IDs
# --------------------------------------------------------------------------

#: Luhn sum of a 12-digit string column `s` (digit i counted from the
#: right, every second digit doubled with the >9 fold) — one text per
#: engine because the higher-order-function spellings differ
#: (aggregate/sequence vs list_sum/list_transform), with the digit
#: algebra identical.
_LUHN_SPARK = """aggregate(sequence(0, 11), 0, (acc, i) -> acc + (
    CASE WHEN i % 2 = 1 THEN
        IF((ascii(substring(s, 12 - i, 1)) - 48) * 2 > 9,
           (ascii(substring(s, 12 - i, 1)) - 48) * 2 - 9,
           (ascii(substring(s, 12 - i, 1)) - 48) * 2)
    ELSE ascii(substring(s, 12 - i, 1)) - 48 END))"""

_LUHN_DUCK = """list_sum(list_transform(range(0, 12), i ->
    CASE WHEN i % 2 = 1 THEN
        CASE WHEN (ascii(substr(s, 12 - i, 1)) - 48) * 2 > 9
             THEN (ascii(substr(s, 12 - i, 1)) - 48) * 2 - 9
             ELSE (ascii(substr(s, 12 - i, 1)) - 48) * 2 END
    ELSE ascii(substr(s, 12 - i, 1)) - 48 END))"""


@register(
    "fn_luhn_checksum",
    oracle=f"""
        WITH a AS (
            SELECT lpad(CAST(o_orderkey * 7919 % 1000000000000
                             AS VARCHAR), 12, '0') AS s
            FROM orders
        ),
        l AS (SELECT s, CAST(({_LUHN_DUCK}) % 10 AS INT) AS luhn_mod
              FROM a)
        SELECT luhn_mod, CAST(COUNT(*) AS BIGINT) AS n,
               CASE WHEN luhn_mod = 0 THEN 1 ELSE 0 END AS is_valid
        FROM l GROUP BY luhn_mod
    """,
    tags=("fn", "string", "quality"),
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit validation (ISO/IEC 7812 — the checksum behind
    card numbers, IMEIs, and most account identifiers) over synthesized
    12-digit IDs: the census of Luhn sums mod 10 with the valid class
    flagged. This is the data-quality primitive `ext_pii_redact`'s
    pattern matching stops short of: a 16-digit regex hit that FAILS
    Luhn is almost surely a random number, not a leaked card — running
    validation before redaction cuts false positives by ~90% (only
    1-in-10 random numbers pass). On pseudo-random IDs the mod classes
    are near-uniform — the ~10% valid rate visible in the census IS the
    false-positive-rate argument.

    Determinism: pure integer digit algebra inside a higher-order fold;
    the two engines' HOF spellings differ (aggregate/sequence vs
    list_sum/list_transform) but the per-digit arithmetic is identical
    text, and everything is exact integers.

    Scale shape: entirely row-local (whole-stage codegen on the Spark
    side), then ONE map-side-combinable 10-group census."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    a = o.select(F.expr("lpad(cast(o_orderkey * 7919 % 1000000000000"
                        " as string), 12, '0')").alias("s"))
    l = a.select(F.expr(f"cast(({_LUHN_SPARK}) % 10 as int)")
                 .alias("luhn_mod"))
    return (l.groupBy("luhn_mod")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select("luhn_mod", "n",
                    F.when(F.col("luhn_mod") == 0, 1).otherwise(0)
                    .alias("is_valid")))


@register(
    "fn_string_format",
    oracle="""
        SELECT p_partkey,
               printf('%s-%07d', p_brand, p_partkey) AS tag,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
               printf('%5d units', p_size) AS size_label
        FROM part
    """,
    tags=("function", "string", "dialect"),
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style string formatting — ``format_string`` (Spark) vs
    ``printf`` (DuckDB), the differential that pins C-format semantics
    (zero-padding, width, right-alignment) across two independent
    implementations, plus the ``lpad`` twin both engines share by name.
    The surface every shard-manifest / file-naming pipeline leans on
    (`ext_shard_manifest` builds names like these); integer-only format
    specifiers keep it inside the exact contract (float %f rounding is
    locale/libc territory — deliberately out).

    Scale shape: row-local codegen string ops; no shuffle at all."""
    ensure_deterministic(spark)
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s-%07d", F.col("p_brand"),
                        F.col("p_partkey")).alias("tag"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded"),
        F.format_string("%5d units", F.col("p_size")).alias("size_label"))
