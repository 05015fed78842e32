#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the no-op sink (full execution, no driver
collect), timed wall-clock. Set SPARK_GRAFT_BENCH_QUERIES=q1,q2 to subset.

Archive rule: BENCH_DETAIL_rN.json must be a byte copy of the
driver-committed BENCH_DETAIL.json from round N's canonical run (the one
whose totals BENCH_rN.json records) — never a local rerun, or cross-round
per-query regression auditing compares different sessions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    from project_etl_spark.registry import load_all
    from project_etl_spark.session import get_spark

    spark = get_spark("project-etl-spark-bench",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = sorted(only.split(",")) if only else sorted(registry)

    # Warm the JVM + parquet footers so query 1 doesn't pay session startup,
    # and spin up the reusable Python/Arrow workers so the first Pandas-UDF
    # query doesn't pay one-time worker-fork cost either (steady-state
    # throughput is the metric; spark.python.worker.reuse keeps them alive).
    registry["scan_parquet"].builder(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    spark.range(256).repartition(int(spark.sparkContext.defaultParallelism)) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    # Warm the Python-DataSource planning workers too: the first
    # format("etl_runfiles") use pays a one-time worker spawn (~2.5 s)
    # that is session overhead, not per-query cost.
    import tempfile

    from project_etl_spark.decode import write_run_file
    from project_etl_spark.pyds import register_datasource
    _d = tempfile.mkdtemp()
    write_run_file(_d, 1, 0, [{"kind": "trailer", "elink": 0}])
    register_datasource(spark)
    (spark.read.format("etl_runfiles").option("path", _d).load()
     .write.format("noop").mode("overwrite").save())

    timings: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # live streaming entries pay a fixed Structured-Streaming startup cost
    # per query (checkpoint init + micro-batch machinery on scratch data);
    # split them out so batch-engine throughput is readable at a glance.
    stream_live = {
        "scan_binary_frames", "sink_parquet_partitioned", "source_stream_files",
        "sink_stream_foreachBatch", "stream_watermark_late", "stream_dedup",
        "stream_stateful_counter", "stream_trigger_micro_batch",
        "stream_file_sink_exactly_once", "stream_stream_join",
        "stream_stream_join_outer", "source_python_datasource_stream",
        "stream_python_datasource_partitioned",
        "stream_stateful_counter_rocksdb", "stream_complete_mode",
        "stream_static_join", "stream_hdr_buckets",
        "stream_session_event_timeout",
    }
    batch_total = round(sum(v for n, v in timings.items()
                            if n not in stream_live), 3)
    payload = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "batch_total_sec": batch_total,
        "streaming_live_total_sec": round(sum(timings.values()) - batch_total, 3),
    }
    # The capturing driver keeps only a ~2 KB tail of stdout; the full
    # 100+-query dict does not fit, so the printed line carries totals plus
    # the slowest queries only, and the file is the durable full artifact.
    detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_DETAIL.json")
    with open(detail, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    compact = dict(payload, queries=slowest, queries_detail="BENCH_DETAIL.json")
    line = json.dumps(compact)
    assert len(line) < 1800, f"bench stdout line too long ({len(line)} B)"
    print(line)


if __name__ == "__main__":
    main()
