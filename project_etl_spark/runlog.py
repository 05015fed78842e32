"""Nested run-log document maintenance — the WRITE side.

The reference's ``daq_utils.run_log_update`` keeps one nested JSON document
per acquisition session: a full config snapshot, a list of per-run records
(each enriched with the HV/temperature environment readings taken at run
end), and a per-ETROC thresholds map (DAQ_self-triggering.md:46-51,
:97, :254-263). This module builds that document as a one-row nested
DataFrame, appends run records + merges thresholds functionally, and
round-trips it through a schema-enforced JSON read (never inference —
the validate-at-the-edge stance, :471).

Scale note: the run log is driver-adjacent metadata (one row per session,
a few KB) — the ONLY correct place for a tiny document like this is a
single-partition JSON write; the hit data itself never flows through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON map keys are always strings on the wire, so the per-ETROC
#: thresholds map is keyed by the stringified ETROC index.
RUN_LOG_SCHEMA = T.StructType([
    T.StructField("config", T.StructType([
        T.StructField("l1a_rate", T.LongType()),
        T.StructField("run_time_s", T.LongType()),
        T.StructField("self_triggering", T.BooleanType()),
        T.StructField("power_mode", T.StringType()),
        T.StructField("offset", T.MapType(T.StringType(), T.LongType())),
    ])),
    T.StructField("runs", T.ArrayType(T.StructType([
        T.StructField("run", T.LongType()),
        T.StructField("rb", T.LongType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("finish_time", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("lost_events", T.LongType()),
        T.StructField("speed_mbps", T.DoubleType()),
        T.StructField("vmon", T.DoubleType()),
        T.StructField("imon", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
    ]))),
    T.StructField("thresholds", T.MapType(T.StringType(), T.LongType())),
])

_RUN_FIELDS = [f.name for f in RUN_LOG_SCHEMA["runs"].dataType.elementType.fields]


def new_run_log(spark: SparkSession, config: dict) -> DataFrame:
    """A fresh run-log document: config snapshot, no runs, no thresholds
    (the session-start write, DAQ_self-triggering.md:97)."""
    cfg = {
        "l1a_rate": int(config.get("l1a_rate", 0)),
        "run_time_s": int(config.get("run_time_s", 30)),
        "self_triggering": bool(config.get("self_triggering", True)),
        "power_mode": str(config.get("power_mode", "high")),
        "offset": {str(k): int(v) for k, v in config.get("offset", {}).items()},
    }
    # ONE slice: the default parallelizes a single row over every core, and
    # any later coalesce(1) action pays one Python-worker round-trip per
    # empty parent partition (measured ~5 s of pure overhead on local[32])
    rdd = spark.sparkContext.parallelize([(cfg, [], {})], 1)
    return spark.createDataFrame(rdd, RUN_LOG_SCHEMA)


def run_log_update(log: DataFrame, run_record: dict,
                   thresholds: dict | None = None) -> DataFrame:
    """Append one per-run record and merge the latest thresholds — the
    ``daq_utils.run_log_update`` analog (DAQ_self-triggering.md:254-263):
    called once per finished run with the environment readings attached.

    Purely functional: returns a new one-row document; duplicate threshold
    keys resolve to the NEW value (a recalibration overwrites)."""
    rec = F.struct(*[
        F.lit(run_record.get(name)).cast(
            RUN_LOG_SCHEMA["runs"].dataType.elementType[name].dataType
        ).alias(name)
        for name in _RUN_FIELDS
    ])
    out = log.withColumn("runs", F.concat(F.col("runs"), F.array(rec)))
    if thresholds:
        new_map = F.create_map(*[
            x for k, v in sorted(thresholds.items())
            for x in (F.lit(str(k)), F.lit(int(v)).cast("long"))
        ])
        # LAST_WIN via explicit rebuild: drop keys being overwritten, then
        # concat (portable regardless of spark.sql.mapKeyDedupPolicy).
        keep = F.map_filter(
            F.col("thresholds"),
            lambda k, _: ~k.isin(*[str(k2) for k2 in thresholds]))
        out = out.withColumn("thresholds", F.map_concat(keep, new_map))
    return out


def write_run_log(log: DataFrame, path: str) -> None:
    """Single-partition JSON write (the document is session metadata, KBs)."""
    log.coalesce(1).write.mode("overwrite").json(path)


def read_run_log(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced re-read (scan_json_runlog's nested-document form) —
    never schema inference on the production path."""
    return spark.read.schema(RUN_LOG_SCHEMA).json(path)


def runs_table(log: DataFrame) -> DataFrame:
    """Flatten the nested runs array to one row per (run, rb) — the shape
    downstream relational queries consume."""
    return log.select(F.explode("runs").alias("r")).select("r.*")
