"""SparkSession factory with 100 TB-oriented defaults.

The reference pipeline hand-rolls its physical execution (block reads,
partial-then-final accumulation, lock-file backpressure — SURVEY.md §4.1).
On Spark all of that is configuration: AQE re-plans at runtime (skew joins,
dynamic coalescing), the shuffle partition count is sized for the deploy
target, and Arrow makes the Python<->JVM boundary columnar.

Local tests use ``local[n]``; on a real cluster only ``master`` changes —
every query in this package is expressed declaratively so Catalyst can pick
broadcast vs shuffle strategies per deployment scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] / 128 GiB test harness; on a 1000-executor
# cluster, shuffle.partitions is deliberately NOT pinned here — AQE coalesces
# from the initialPartitionNum ceiling, so the same code scales up.
_LOCAL_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: skew-join splitting + post-shuffle coalescing.
    "spark.sql.adaptive.enabled": "true",
    # coalescePartitions.minPartitionSize stays at its 1 MB default:
    # lowering it to 128k (optimization round 12) to raise post-shuffle
    # parallelism for compute-heavy small exchanges made the dedup-audit
    # family 20-45% SLOWER at sf0.1 (census 6.5 -> 8.2 s) — per-task
    # scheduling overhead beats the extra parallelism at these sizes.
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic wall-clock semantics for timestamp fixtures.
    "spark.sql.session.timeZone": "UTC",
    # Columnar Python boundary (pandas UDF / toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims (region/nation/config tables) must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Parquet scans: pushdown + vectorized reader are on by default; keep
    # explicit so a misconfigured deploy is visible in one place.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Bound single-task input at scale (100 TB => ~800k tasks at 128 MiB).
    "spark.sql.files.maxPartitionBytes": "128m",
}


def get_spark(app_name: str = "project-etl-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_LOCAL_DEFAULTS)
    # Shuffle-partition default DERIVED from the deploy's core count, not a
    # local[32] constant (optimization round 12): the driver also benches at
    # lower core counts, where 32 partitions on (say) 8 cores is pure
    # scheduling overhead on the many small exchanges. The derivation is
    # VALIDATED (round 13): SPARK_GRAFT_CPUS='*' (local[*]) or an explicit
    # ``master=`` would otherwise leak a non-numeric value into the conf and
    # fail session creation — fall back to the machine's core count there.
    # A cluster deploy overrides via SPARK_GRAFT_SHUFFLE_PARTITIONS (or
    # extra_conf) to a data-sized value and lets AQE coalesce down from it;
    # explicit-master callers should set SPARK_GRAFT_SHUFFLE_PARTITIONS.
    try:
        cpus_n = int(cpus)
    except ValueError:
        cpus_n = os.cpu_count() or 8
    conf.setdefault(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus_n)))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_deterministic(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs that determinism of declared queries relies on.

    Called by every registry builder so results are stable even when the
    caller (e.g. the verification driver) constructed its own session:
    UTC session time zone makes timestamp->epoch arithmetic match the
    DuckDB oracle's naive-UTC reading of the same parquet. Also ships this
    package to executor Python workers (``addPyFile``) so pandas-UDF
    closures that reference it import cleanly regardless of the caller's
    working directory.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Python DataSource filter pushdown is planned per-reader: only readers
    # that DEFINE pushFilters participate, but Spark rejects such a reader
    # outright while the flag is false. Pinning it here (not inside the one
    # query that needs it) keeps planning semantics session-explicit
    # instead of query-order-dependent.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    if getattr(spark, "_project_etl_spark_shipped", False):
        return
    import tempfile
    import zipfile

    import project_etl_spark

    pkg_dir = os.path.dirname(os.path.abspath(project_etl_spark.__file__))
    # pid-scoped + atomic rename: concurrent drivers must not truncate a zip
    # another driver's executors are fetching
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"project_etl_spark_pkg_{os.getpid()}.zip")
    tmp_path = zip_path + ".tmp"
    with zipfile.ZipFile(tmp_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("project_etl_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    os.replace(tmp_path, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    spark._project_etl_spark_shipped = True
