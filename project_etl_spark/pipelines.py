"""Composed pipelines — the reference's top-level flows as library calls.

A user of the reference runs whole flows, not single operators; these
functions wire the operator library into those flows (SURVEY.md §3):

- ``calibrate``            threshold scan -> per-pixel baseline/noise/threshold
                           (configure_etrocs, DAQ_self-triggering.md:79-89)
- ``threshold_heatmap``    16x16 matrix view (plot_etroc_thresholds, :91-93)
- ``run_stats``            per-(run, rb) acquisition stats (:235-236)
- ``enrich_runs_with_env`` as-of attach HV/temperature to runs (:245-263)
- ``process_run_directory`` batch watchdog: decode -> hits -> partitioned
                           parquet (:306-314)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.decode import build_hits, decode_run_files
from project_etl_spark.operators.joins import asof_join
from project_etl_spark.portable import pround


def calibrate(hits: DataFrame, offset: int = 30) -> DataFrame:
    """Per-pixel calibration from a threshold-scan hit sample: baseline =
    mean TOA response, noise_width = stddev, threshold = baseline + offset
    (DAQ_self-triggering.md:84-86). Dense 16x16 per etroc: absent pixels
    appear with NULL stats so downstream masking is explicit."""
    spark = hits.sparkSession
    grid = (spark.range(16).select(F.col("id").cast("int").alias("row"))
            .crossJoin(spark.range(16).select(F.col("id").cast("int").alias("col"))))
    etrocs = hits.select("etroc").distinct()
    per_pixel = (
        hits.groupBy("etroc", "row", "col")
        .agg(pround(F.avg("toa"), 4).alias("baseline"),
             pround(F.stddev_samp("toa"), 4).alias("noise_width"),
             F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        etrocs.crossJoin(grid)
        .join(per_pixel, ["etroc", "row", "col"], "left")
        .withColumn("offset", F.lit(offset))
        .withColumn("threshold", F.col("baseline") + F.col("offset"))
    )


def threshold_heatmap(thresholds: DataFrame, etroc: int,
                      value: str = "threshold") -> DataFrame:
    """Matrix view of one chip: rows=pixel-row, cols=0..15
    (the heatmap image's data, DAQ_self-triggering.md:92)."""
    cols = [str(c) for c in range(16)]
    return (
        thresholds.where(F.col("etroc") == etroc)
        .withColumn("c", F.col("col").cast("string"))
        .groupBy("row").pivot("c", cols).agg(F.first(value))
        .orderBy("row")
    )


def run_stats(hits: DataFrame, run_seconds: int = 30) -> DataFrame:
    """Per-(run, rb) acquisition stats — the YAML record
    (DAQ_self-triggering.md:235-236): event count, hit count, L1A rate,
    throughput estimate (5-byte frames)."""
    return (
        hits.groupBy("run", "rb")
        .agg(F.countDistinct("event_id").alias("n_events"),
             F.count(F.lit(1)).alias("n_hits"))
        .withColumn("l1a_rate", F.col("n_events") / F.lit(float(run_seconds)))
        .withColumn("speed_mbps",
                    F.col("n_hits") * F.lit(5 * 8) / F.lit(float(run_seconds)) / F.lit(1e6))
    )


def enrich_runs_with_env(runs: DataFrame, env: DataFrame,
                         channels: tuple[str, ...] = ("vmon", "imon", "temp")) -> DataFrame:
    """Attach the latest environment sample at-or-before each run's finish
    time (the HV/temperature as-of lookup, DAQ_self-triggering.md:249-263).
    ``runs``: (run_number, module, finish_time, ...); ``env``:
    (ts, channel, module, value). One as-of pass per channel."""
    out = runs
    for ch in channels:
        side = (env.where(F.col("channel") == ch)
                .groupBy("module", "ts")
                .agg(F.max("value").alias(f"{ch}_v")))
        out = asof_join(out, side, on="module", left_ts="finish_time",
                        right_ts="ts", right_cols={f"{ch}_v": ch})
    return out


def process_run_directory(spark: SparkSession, landing_dir: str,
                          out_dir: str) -> None:
    """Batch watchdog pass: decode every run file in the directory, build
    hits, write run-partitioned parquet (DAQ_self-triggering.md:306-314).
    The streaming twin is ``streaming.watchdog.start_watchdog``."""
    hits = build_hits(decode_run_files(spark, landing_dir))
    hits.write.mode("overwrite").partitionBy("run", "rb").parquet(out_dir)


def save_thresholds(thresholds: DataFrame, path: str) -> None:
    """Write-once calibration table (threshold reuse: "skip recomputing the
    expensive scan; load from previous run log",
    DAQ_self-triggering.md:83-87). Partitioned by etroc so a single chip's
    matrix loads without touching the rest."""
    thresholds.write.mode("overwrite").partitionBy("etroc").parquet(path)


def load_or_calibrate(spark: SparkSession, hits: DataFrame, path: str,
                      offset: int = 30, reuse: bool = True) -> DataFrame:
    """Reuse a saved calibration when present (and reuse=True), else run the
    scan and persist it — the reference's ``reuse_thresholds`` flag
    (DAQ_self-triggering.md:415)."""
    import os
    if reuse and os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    cal = calibrate(hits, offset=offset)
    save_thresholds(cal, path)
    return spark.read.parquet(path)