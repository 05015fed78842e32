"""Config validation + composed-pipeline tests (SURVEY.md §1.2, §3) and
fixture schema assertions (§5.2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_etl_spark import schemas
from project_etl_spark.config import ConfigError, module_dimension, parse_config
from project_etl_spark.decode import write_run_file
from project_etl_spark.io import table
from project_etl_spark.pipelines import (calibrate, process_run_directory,
                                         run_stats, threshold_heatmap)

GOOD_TOML = """
[run_config]
num_runs = 5
beam_energy = 120

[telescope_config]
l1a_delay = 12

[[telescope_config.service_hybrids]]
rb = 0
self_triggering = true

[[telescope_config.service_hybrids.modules]]
name = "Module_209"
id = 209
slot = 1
offset = {0 = 30, 1 = 30}
power_mode = {0 = "high", 1 = "high"}
"""


def test_config_parses_and_flattens(spark):
    cfg = parse_config(GOOD_TOML)
    assert cfg["run_config"]["num_runs"] == 5
    dim = module_dimension(spark, GOOD_TOML).collect()
    assert {(r["etroc"], r["offset"]) for r in dim} == {(0, 30), (1, 30)}
    assert all(r["module_name"] == "Module_209" for r in dim)


@pytest.mark.parametrize("mutation,fragment", [
    ("num_runs = 5", "num_runs = 0"),            # non-positive
    ("num_runs = 5", "xnum_runs = 5"),           # missing required
    ('power_mode = {0 = "high", 1 = "high"}',
     'power_mode = {0 = "turbo"}'),              # enum violation
    ("beam_energy = 120", 'beam_energy = "x"'),  # wrong type
])
def test_config_rejects_invalid(mutation, fragment):
    bad = GOOD_TOML.replace(mutation, fragment)
    with pytest.raises(ConfigError):
        parse_config(bad)


def test_fixture_schemas_match(spark, sf_dir):
    for name, expected in schemas.FIXTURE_SCHEMAS.items():
        if name == "events":
            continue  # ns->us normalized by io.table; spot-check below
        schemas.assert_schema(table(spark, sf_dir, name).schema, expected)
    ev = table(spark, sf_dir, "events")
    schemas.assert_schema(ev.schema, schemas.EVENTS)


def _scan_hits(spark, tmp_path, n=300):
    frames = [{"kind": "header", "elink": 0, "event_id": 1}]
    frames += [{"kind": "data", "elink": 0, "row": i % 16, "col": (i * 7) % 16,
                "toa": 200 + (i % 50), "tot": 60} for i in range(n)]
    write_run_file(str(tmp_path), run=9, rb=0, frames=frames)
    from project_etl_spark.decode import build_hits, decode_run_files
    return build_hits(decode_run_files(spark, str(tmp_path))) \
        .withColumn("etroc", F.lit(0))


def test_calibrate_dense_grid(spark, tmp_path):
    hits = _scan_hits(spark, tmp_path)
    cal = calibrate(hits, offset=30)
    rows = cal.collect()
    assert len(rows) == 256  # dense 16x16 for the one etroc
    hit_cells = [r for r in rows if r["n_hits"] is not None]
    assert all(r["threshold"] == r["baseline"] + 30 for r in hit_cells)
    empty = [r for r in rows if r["n_hits"] is None]
    assert all(r["threshold"] is None for r in empty)


def test_threshold_heatmap_shape(spark, tmp_path):
    cal = calibrate(_scan_hits(spark, tmp_path))
    hm = threshold_heatmap(cal, etroc=0)
    assert len(hm.columns) == 17  # row + 16 pixel columns
    assert hm.count() == 16


def test_run_stats_counts(spark, tmp_path):
    stats = run_stats(_scan_hits(spark, tmp_path, n=300)).collect()
    assert len(stats) == 1
    r = stats[0]
    assert r["n_hits"] == 300 and r["n_events"] == 1
    assert r["l1a_rate"] == pytest.approx(1 / 30.0)


def test_process_run_directory(spark, tmp_path):
    landing = tmp_path / "landing"
    out = tmp_path / "out"
    landing.mkdir()
    frames = [{"kind": "header", "elink": 0, "event_id": 1},
              {"kind": "data", "elink": 0, "row": 1, "col": 2, "toa": 10, "tot": 5}]
    write_run_file(str(landing), run=1, rb=0, frames=frames)
    write_run_file(str(landing), run=2, rb=1, frames=frames)
    process_run_directory(spark, str(landing), str(out))
    got = spark.read.parquet(str(out))
    assert got.count() == 2
    assert {(r["run"], r["rb"]) for r in got.select("run", "rb").collect()} \
        == {(1, 0), (2, 1)}


def test_enrich_runs_with_env(spark):
    """As-of enrichment: each run picks the latest sample at-or-before its
    finish time, per channel, per module (DAQ_self-triggering.md:249-263)."""
    import datetime as dt
    from project_etl_spark.pipelines import enrich_runs_with_env
    T = dt.datetime(2025, 1, 1, 12, 0, 0)
    runs = spark.createDataFrame(
        [(1, 209, T + dt.timedelta(minutes=10)),
         (2, 209, T + dt.timedelta(minutes=40)),
         (3, 209, T - dt.timedelta(minutes=5))],   # before any sample
        "run_number int, module int, finish_time timestamp")
    env = spark.createDataFrame(
        [(T, "vmon", 209, 185.0),
         (T + dt.timedelta(minutes=30), "vmon", 209, 185.3),
         (T + dt.timedelta(minutes=5), "imon", 209, 12.4)],
        "ts timestamp, channel string, module int, value double")
    out = {r["run_number"]: r for r in
           enrich_runs_with_env(runs, env, channels=("vmon", "imon")).collect()}
    assert out[1]["vmon"] == 185.0 and out[1]["imon"] == 12.4
    assert out[2]["vmon"] == 185.3
    assert out[3]["vmon"] is None and out[3]["imon"] is None


def test_register_tables_sql_surface(spark, sf_dir):
    from project_etl_spark.io import register_tables
    register_tables(spark, sf_dir)
    out = spark.sql("""
        SELECT r.r_name, COUNT(*) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """).collect()
    assert sum(r["n"] for r in out) == spark.table("customer").count()


def test_load_or_calibrate_reuses(spark, tmp_path):
    """Second call must read the saved table, not recompute (threshold
    reuse, DAQ_self-triggering.md:83-87)."""
    import os
    from project_etl_spark.pipelines import load_or_calibrate
    hits = _scan_hits(spark, tmp_path)
    path = str(tmp_path / "cal")
    first = load_or_calibrate(spark, hits, path, offset=30)
    assert first.count() == 256
    marker = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    second = load_or_calibrate(spark, hits.limit(0), path, offset=99)
    # limit(0) hits + unchanged mtime prove no recompute happened
    assert second.count() == 256
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == marker
    assert second.where(F.col("offset") == 30).count() == 256


def test_calibration_reuse_query(spark):
    """The registry demo query: cached thresholds are used (offset stays at
    the original 30, never the decoy 99) and pixel counts are dense."""
    from project_etl_spark.registry import load_all
    spec = load_all()["calibration_reuse"]
    rows = spec.builder(spark, "unused").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["offset_used"] == 30
        assert r["n_pixels"] == 256


def test_scratch_dir_reinvocation_keeps_earlier_dataframe(spark):
    """Two same-tag scratch_dir calls in one process get DISTINCT dirs: a
    lazily-read DataFrame from the first invocation must stay collectable
    after the second (regression: the dir used to be pid-scoped only, so
    call two rmtree'd call one's data out from under its scan)."""
    import os

    from project_etl_spark.io import scratch_dir
    d1 = scratch_dir("reinvoke_regress")
    spark.range(3).write.parquet(os.path.join(d1, "t"))
    df1 = spark.read.parquet(os.path.join(d1, "t"))
    d2 = scratch_dir("reinvoke_regress")
    assert d1 != d2
    spark.range(5).write.parquet(os.path.join(d2, "t"))
    assert df1.count() == 3
    assert spark.read.parquet(os.path.join(d2, "t")).count() == 5
