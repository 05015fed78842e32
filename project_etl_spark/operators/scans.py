"""§2.1 Scans / sources (batch side).

Reference analogs: columnar read-back of merged run output
(DAQ_self-triggering.md:306-314), nested JSON run logs
(DAQ_self-triggering.md:46-57, :254-263), flat key-value stats records
(DAQ_self-triggering.md:235-236), and (run, rb) recovery from binary file
names (DAQ_self-triggering.md:293-294).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import scratch_dir as _scratch
from project_etl_spark.io import table
from project_etl_spark.portable import sql_exact_sum
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic


@register(
    "scan_parquet",
    oracle="""
        SELECT r_regionkey, r_name
        FROM region
        WHERE r_regionkey >= 0
    """,
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected + filtered columnar scan; filter and projection reach the
    parquet reader (PushedFilters / ReadSchema in the physical plan)."""
    ensure_deterministic(spark)
    return (
        table(spark, sf_dir, "region")
        .where(F.col("r_regionkey") >= 0)
        .select("r_regionkey", "r_name")
    )


@register(
    "scan_json_runlog",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    tags=("scan", "json"),
)
def scan_json_runlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from embedded JSON documents (run-log analog:
    DAQ_self-triggering.md:254-263). `from_json` with an explicit schema —
    never inference — per the reference's validate-at-the-edge stance."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "struct<k: bigint>")
    return ev.select("event_id", parsed.getField("k").alias("k"))


_RUNLOG_ORACLE = """
    SELECT * FROM (VALUES
        (CAST(101 AS BIGINT), CAST(0 AS BIGINT), '2025-10-31T14:22:40',
         '2025-10-31T14:23:10', CAST(300 AS BIGINT), CAST(0 AS BIGINT),
         CAST(12.5 AS DOUBLE), CAST(185.3 AS DOUBLE), CAST(12.4 AS DOUBLE),
         CAST(0.847 AS DOUBLE), CAST(2 AS INT)),
        (CAST(102 AS BIGINT), CAST(0 AS BIGINT), '2025-10-31T14:23:20',
         '2025-10-31T14:23:50', CAST(297 AS BIGINT), CAST(3 AS BIGINT),
         CAST(12.1 AS DOUBLE), CAST(185.2 AS DOUBLE), CAST(12.6 AS DOUBLE),
         CAST(0.851 AS DOUBLE), CAST(2 AS INT))
    ) t(run, rb, start_time, finish_time, n_events, lost_events,
        speed_mbps, vmon, imon, temperature, n_thresholds)
"""


@register("sink_runlog_roundtrip", oracle=_RUNLOG_ORACLE,
          tags=("scan", "json", "sink"))
def sink_runlog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested run-log WRITE path (daq_utils.run_log_update,
    DAQ_self-triggering.md:46-51, :254-263): build the document (config
    snapshot + runs array + thresholds map), append two per-run records with
    environment readings, merge thresholds, write JSON, re-read it
    schema-enforced, and flatten runs to relational rows. Rows-only check;
    exact round-trip equality is pinned by tests/test_runlog.py."""
    from project_etl_spark.io import scratch_dir
    from project_etl_spark.runlog import (new_run_log, read_run_log,
                                          run_log_update, runs_table,
                                          write_run_log)

    ensure_deterministic(spark)
    path = scratch_dir("runlog")
    log = new_run_log(spark, {"l1a_rate": 1000, "run_time_s": 30,
                              "self_triggering": True, "power_mode": "high",
                              "offset": {0: 30, 1: 30}})
    log = run_log_update(log, {
        "run": 101, "rb": 0, "start_time": "2025-10-31T14:22:40",
        "finish_time": "2025-10-31T14:23:10", "n_events": 300,
        "lost_events": 0, "speed_mbps": 12.5, "vmon": 185.3, "imon": 12.4,
        "temperature": 0.847}, {0: 480, 1: 495})
    log = run_log_update(log, {
        "run": 102, "rb": 0, "start_time": "2025-10-31T14:23:20",
        "finish_time": "2025-10-31T14:23:50", "n_events": 297,
        "lost_events": 3, "speed_mbps": 12.1, "vmon": 185.2, "imon": 12.6,
        "temperature": 0.851}, {1: 497})
    write_run_log(log, path)
    back = read_run_log(spark, path)
    # one action, not two: carry the thresholds count through the explode
    # instead of fetching it with a separate head()
    return (back.select(F.explode("runs").alias("r"),
                        F.size("thresholds").alias("n_thresholds"))
            .select("r.*", "n_thresholds"))


@register(
    "scan_schema_evolution",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_legacy,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_evolved
        FROM events
    """,
    tags=("scan", "schema"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a long-lived dataset: generation 1 lacks a
    column that generation 2 adds (the reference gained fields across
    test-beam campaigns). ``mergeSchema`` unifies the footer schemas at
    read; gen-1 rows surface NULL for the new column — counted explicitly
    so downstream masking is auditable. At 100 TB you pin the merged
    schema in a catalog instead of paying footer-merge on every read;
    this demonstrates the read-side contract. The oracle recomputes the
    generation split from the source fixture, so the hash match proves
    no row was lost or mis-defaulted across the schema boundary."""
    import os

    from project_etl_spark.io import scratch_dir

    ensure_deterministic(spark)
    base = scratch_dir("schemaevo")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    gen1 = ev.where(F.col("event_id") % 2 == 0)
    gen2 = (ev.where(F.col("event_id") % 2 == 1)
            .withColumn("quality_flag",
                        (F.col("event_id") % 5).cast("int")))
    gen1.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(os.path.join(base, "gen=1"),
                       os.path.join(base, "gen=2")))
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("quality_flag").isNull().cast("long")).alias("n_legacy"),
        F.sum(F.col("quality_flag").isNotNull().cast("long")).alias("n_evolved"),
    )


@register(
    "scan_kv_stats",
    oracle="""
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("scan",),
)
def scan_kv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip a flat key=value stats record (YAML-stats analog,
    DAQ_self-triggering.md:235-236): serialize columns into a kv string,
    re-parse with ``str_to_map``, aggregate on the parsed fields."""
    ensure_deterministic(spark)
    o = table(spark, sf_dir, "orders")
    parsed = o.select(F.expr(
        "str_to_map(concat('status=', o_orderstatus, ';priority=', o_orderpriority), ';', '=')"
    ).alias("m"))
    return (
        parsed.select(F.col("m")["status"].alias("status"),
                      F.col("m")["priority"].alias("priority"))
        .groupBy("status", "priority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filename_metadata",
    oracle="""
        SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows
        FROM lineitem
    """,
    tags=("scan",),
)
def filename_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recover metadata from source file names, the analog of parsing
    ``output_run_{run}_rb{rb}.dat`` (DAQ_self-triggering.md:293-294):
    ``input_file_name()`` + ``regexp_extract``."""
    ensure_deterministic(spark)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(F.regexp_extract(F.input_file_name(), r"(lineitem)[^/]*\.parquet", 1)
                  .alias("table_name"))
        .groupBy("table_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


#: Committed CSV fixture (16 per-elink run-summary records) — the same file
#: feeds the Spark reader and the DuckDB oracle, so header handling, type
#: coercion, and the bad-record filter are all pinned end to end.
_CSV_FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "run_summary.csv")


@register(
    "scan_csv_stats",
    oracle=f"""
        SELECT run, rb,
               COUNT(*) AS n_links,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               MAX(tot_q) AS max_tot_q
        FROM read_csv('{_CSV_FIXTURE}', header = true,
                      columns = {{'run': 'INTEGER', 'rb': 'INTEGER',
                                  'elink': 'INTEGER', 'status': 'VARCHAR',
                                  'n_events': 'BIGINT', 'tot_q': 'INTEGER'}})
        WHERE status = 'ok'
        GROUP BY run, rb
    """,
    tags=("scan", "csv"),
)
def scan_csv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-ful CSV source with an explicit schema (never inferSchema —
    schema inference is a full extra pass over 100 TB and can flip types
    between runs): per-elink run-summary records are filtered on status and
    rolled up per (run, rb). The filter and projection push into the scan
    like any other source. Hash-checked against DuckDB's read_csv on the
    SAME committed fixture file."""
    ensure_deterministic(spark)
    df = (spark.read
          .schema("run int, rb int, elink int, status string,"
                  " n_events long, tot_q int")
          .option("header", True)
          .csv(_CSV_FIXTURE))
    return (df.where(F.col("status") == "ok")
            .groupBy("run", "rb")
            .agg(F.count(F.lit(1)).alias("n_links"),
                 F.sum("n_events").alias("n_events"),
                 F.max("tot_q").alias("max_tot_q")))


@register(
    "scan_orc_roundtrip",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 2)} AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("scan", "orc", "sink"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a second columnar source/sink format (the engine is not
    parquet-only — the reference's merged columnar output maps to any
    columnar store, DAQ_self-triggering.md:306-314): orders is written to
    ORC once (snappy, the deliberate roundtrip cost) and the aggregation
    runs OFF THE ORC COPY. Spark's native ORC reader does predicate
    pushdown / column pruning / vectorized decode exactly like parquet,
    so the scan-side scale story carries over. The oracle aggregates the
    original parquet — a hash match proves the roundtrip is lossless
    (DuckDB has no ORC reader, so format fidelity is checked by algebra,
    not by re-reading the same bytes)."""
    ensure_deterministic(spark)
    from project_etl_spark.io import scratch_dir
    from project_etl_spark.portable import exact_sum
    path = os.path.join(scratch_dir("orcround"), "orders_orc")
    (table(spark, sf_dir, "orders")
     .select("o_orderkey", "o_orderstatus", "o_totalprice")
     .write.format("orc").option("compression", "snappy").save(path))
    orc = spark.read.orc(path)
    return (orc.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 exact_sum(F.col("o_totalprice"), 2).alias("total_price")))


@register(
    "sink_jsonl_roundtrip",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 2)} AS total_price,
               MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
               MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("scan", "json", "sink"),
)
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as interchange sink/source (the run-log text format of
    the reference generalized, DAQ_self-triggering.md:254-263): orders is
    written to newline-delimited JSON once, read back with an EXPLICIT
    schema (no inference pass over the data — at 100 TB a schema-inference
    read is a full extra scan), and the aggregation runs OFF THE JSON
    COPY. The oracle aggregates the original parquet, so a hash match
    proves the roundtrip lost nothing — same by-algebra fidelity check as
    ``scan_orc_roundtrip``. Dates travel as formatted strings (JSON has no
    date type; pinning the format beats engine-default serialization)."""
    ensure_deterministic(spark)
    from project_etl_spark.io import scratch_dir
    from project_etl_spark.portable import exact_sum
    path = os.path.join(scratch_dir("jsonlround"), "orders_jsonl")
    (table(spark, sf_dir, "orders")
     .select("o_orderkey", "o_orderpriority", "o_totalprice",
             F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_day"))
     .write.mode("overwrite").json(path))
    back = spark.read.schema(
        "o_orderkey bigint, o_orderpriority string, "
        "o_totalprice double, o_day string").json(path)
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 exact_sum(F.col("o_totalprice"), 2).alias("total_price"),
                 F.min("o_day").alias("first_day"),
                 F.max("o_day").alias("last_day")))


@register(
    "scan_csv_permissive",
    oracle=f"""
        SELECT COUNT(CASE WHEN o_orderkey % 50 <> 7 THEN 1 END) AS n_good,
               COUNT(CASE WHEN o_orderkey % 50 = 7 THEN 1 END) AS n_corrupt,
               (CAST(SUM(CASE WHEN o_orderkey % 50 <> 7 THEN
                    CAST(FLOOR(o_totalprice * 1e2 + 5e-1) AS BIGINT) END)
                 AS BIGINT) / 1e2) AS total_price_good,
               MAX(CASE WHEN o_orderkey % 50 <> 7 THEN o_orderkey END)
                   AS max_good_key,
               CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 50 <> 7
                    THEN o_orderpriority END) AS BIGINT) AS n_priorities
        FROM orders
    """,
    tags=("scan", "csv", "robustness"),
)
def scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance on ingestion: a CSV landing file where
    ~2% of lines are garbage (the truncated-last-line / corrupted-write
    reality of any 100 TB landing zone) is read in PERMISSIVE mode with an
    explicit schema + ``columnNameOfCorruptRecord`` — bad lines become
    quarantine rows instead of failing the job or silently vanishing
    (FAILFAST and DROPMALFORMED are the alternatives; quarantine is the
    production answer because it preserves the evidence). The census
    splits good vs corrupt and aggregates only parsed rows; the oracle
    reproduces the deterministic corruption rule from the source table, so
    the hash match proves both the parse and the quarantine accounting."""
    ensure_deterministic(spark)
    from project_etl_spark.io import scratch_dir
    from project_etl_spark.portable import qint
    path = os.path.join(scratch_dir("csvperm"), "orders_landing")
    line = F.when(
        F.col("o_orderkey") % 50 == 7,
        F.concat(F.lit("GARBAGE<<"), F.col("o_orderkey").cast("string")),
    ).otherwise(F.concat_ws(
        ",", F.col("o_orderkey").cast("string"), F.col("o_orderpriority"),
        F.col("o_totalprice").cast("string")))
    (table(spark, sf_dir, "orders").select(line.alias("value"))
     .write.mode("overwrite").text(path))
    back = (spark.read
            .schema("o_orderkey bigint, o_orderpriority string, "
                    "o_totalprice double, _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path))
    good = F.col("_corrupt_record").isNull()
    # every schema column participates in the output on purpose: CSV column
    # pruning parses only REQUIRED fields, and a record is flagged corrupt
    # only if a required field fails — an aggregate that ignored
    # o_orderkey would silently skip the very cast failures it audits.
    return back.agg(
        F.count(F.when(good, 1)).alias("n_good"),
        F.count(F.when(~good, 1)).alias("n_corrupt"),
        (F.sum(F.when(good, qint(F.col("o_totalprice"), 2))) / F.lit(1e2))
        .alias("total_price_good"),
        F.max(F.when(good, F.col("o_orderkey"))).alias("max_good_key"),
        F.countDistinct(F.when(good, F.col("o_orderpriority")))
        .alias("n_priorities"))


@register(
    "scan_text_roundtrip",
    oracle="""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY lang
    """,
    tags=("scan", "text", "sink"),
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text line source/sink (``spark.read.text``) — the last source
    format in the interchange matrix (parquet / ORC / CSV / JSONL / binary
    / text), and the shape of every raw web-corpus drop (one document per
    line). Write TSV-ish ``lang\\ttext`` lines, read back as raw ``value``
    lines, re-split row-locally, and aggregate per language — hash-matching
    the oracle on the ORIGINAL table proves the text round-trip is
    lossless (the fixture corpus contains no newlines or tabs, which is
    exactly the precondition the one-doc-per-line format imposes)."""
    ensure_deterministic(spark)
    d = _scratch("text_roundtrip")
    docs = table(spark, sf_dir, "documents")
    (docs.select(F.concat_ws("\t", "lang", "text").alias("value"))
         .write.mode("overwrite").text(d))
    lines = spark.read.text(d)
    parsed = lines.select(
        F.substring_index("value", "\t", 1).alias("lang"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"))
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).alias("n_chars"))


_CATALOG_ORACLE = """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_orderstatus IN ('F', 'O')
    GROUP BY o_orderstatus
"""


@register("catalog_table_lifecycle", oracle=_CATALOG_ORACLE,
          tags=("catalog", "ddl"))
def catalog_table_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/DDL lifecycle — the managed-table surface a warehouse user
    expects beyond path-based reads: ``saveAsTable`` (external LOCATION on
    scratch), ``INSERT INTO`` appending a second slice, ``ANALYZE TABLE
    COMPUTE STATISTICS`` (row/byte stats into the catalog — what feeds
    CBO join ordering and broadcast decisions), then a query by TABLE NAME
    resolved through the catalog. The builder asserts the catalog's
    analyzed row count equals the table's true count before returning —
    stats lying to the optimizer is the failure mode ANALYZE exists to
    prevent. The run-log registry of runs (DAQ_self-triggering.md:46-51)
    is this table's metadata analog."""
    ensure_deterministic(spark)
    loc = _scratch("catalog_table")
    od = table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS etl_catalog_orders")
    (od.where(F.col("o_orderstatus") == "F")
       .write.mode("overwrite").option("path", loc)
       .saveAsTable("etl_catalog_orders"))
    spark.sql("INSERT INTO etl_catalog_orders "
              "SELECT * FROM {src} WHERE o_orderstatus = 'O'", src=od)
    spark.sql("ANALYZE TABLE etl_catalog_orders COMPUTE STATISTICS")
    stats = (spark.sql("DESCRIBE EXTENDED etl_catalog_orders")
             .where("col_name = 'Statistics'").head()["data_type"])
    analyzed_rows = int(stats.split(",")[1].strip().split(" ")[0])
    actual = spark.table("etl_catalog_orders").count()
    assert analyzed_rows == actual, (
        f"catalog stats out of date: analyzed={analyzed_rows} actual={actual}")
    return spark.sql("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) "
                     "AS n_orders FROM etl_catalog_orders "
                     "GROUP BY o_orderstatus")


@register(
    "scan_xml_roundtrip",
    oracle=f"""
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               {sql_exact_sum('s_acctbal', 2)} AS total_bal
        FROM supplier
        GROUP BY s_nationkey
    """,
    tags=("scan", "xml", "sink"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as interchange sink/source (built-in data source since Spark
    4.0 — previously the external spark-xml package): supplier is written
    once as row-tagged XML and the aggregation runs OFF THE XML COPY,
    read back with an EXPLICIT schema (inference over XML costs a full
    extra scan plus StAX parse, the same 100 TB rule as the JSONL twin).
    The oracle aggregates the original parquet, so a hash match proves
    the roundtrip lost nothing — the by-algebra fidelity check of
    ``scan_orc_roundtrip``/``sink_jsonl_roundtrip``, extended to the
    third interchange format. XML scanning parallelizes per file (StAX
    record reader inside each split), so the scale story is the file
    layout's, not the parser's."""
    ensure_deterministic(spark)
    from project_etl_spark.io import scratch_dir
    from project_etl_spark.portable import exact_sum
    path = os.path.join(scratch_dir("xmlround"), "supplier_xml")
    (table(spark, sf_dir, "supplier")
     .select("s_suppkey", "s_nationkey", "s_acctbal")
     .write.format("xml").option("rootTag", "suppliers")
     .option("rowTag", "supplier").save(path))
    back = (spark.read.format("xml").option("rowTag", "supplier")
            .schema("s_suppkey bigint, s_nationkey bigint, s_acctbal double")
            .load(path))
    return (back.groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 exact_sum(F.col("s_acctbal"), 2).alias("total_bal")))


@register(
    "scan_partition_pruned",
    oracle="""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE lang = 'en'
        GROUP BY source
    """,
    tags=("scan", "partitioning"),
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning on a hive-layout table: the corpus is
    written partitioned by ``lang`` (the layout a 100 TB corpus store
    actually uses — per-language directories), and the English-only
    aggregate reads back through a partition filter, so the scan lists
    and opens ONLY the lang=en directory — the other languages' files
    are never touched (PartitionFilters in the scan node, pinned by
    tests/test_plans.py). The static sibling of
    `join_dynamic_partition_pruning`: there the pruning key arrives at
    runtime from a dim join; here it is a literal the planner prunes at
    compile time — together they cover both halves of the
    partition-elimination story.

    Determinism: the round-trip is exact (lang is the partition key,
    re-attached by the reader; other columns pass through parquet
    unchanged); the oracle aggregates the original table directly.

    Scale shape: the whole point — the query's I/O is sized by the
    selected partition, not the corpus; at 100 TB with ~40 languages an
    en-only pass reads the en share only, and the per-source reduce is
    map-side combinable."""
    ensure_deterministic(spark)
    docs = table(spark, sf_dir, "documents")
    base = os.path.join(_scratch("part_pruned"), "docs")
    docs.write.partitionBy("lang").parquet(base)
    return (spark.read.parquet(base)
            .where(F.col("lang") == "en")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("chars")))
