"""Round-trip property tests for the nested run-log write path
(daq_utils.run_log_update analog, DAQ_self-triggering.md:46-51, :254-263):
build -> update -> JSON write -> schema-enforced read must preserve the
document exactly, and threshold merges must be last-write-wins.
"""

from __future__ import annotations

from project_etl_spark.runlog import (new_run_log, read_run_log,
                                      run_log_update, runs_table,
                                      write_run_log)

CFG = {"l1a_rate": 1000, "run_time_s": 30, "self_triggering": True,
       "power_mode": "high", "offset": {0: 30, 1: 30}}


def _rec(run, n_events=300, vmon=185.3):
    return {"run": run, "rb": 0, "start_time": "2025-10-31T14:22:40",
            "finish_time": "2025-10-31T14:23:10", "n_events": n_events,
            "lost_events": 0, "speed_mbps": 12.5, "vmon": vmon, "imon": 12.4,
            "temperature": 0.847}


def test_new_log_is_empty(spark):
    row = new_run_log(spark, CFG).head()
    assert row["runs"] == [] and row["thresholds"] == {}
    assert row["config"]["l1a_rate"] == 1000
    assert row["config"]["offset"] == {"0": 30, "1": 30}


def test_update_appends_in_order(spark):
    log = new_run_log(spark, CFG)
    log = run_log_update(log, _rec(101))
    log = run_log_update(log, _rec(102, n_events=297))
    runs = log.head()["runs"]
    assert [r["run"] for r in runs] == [101, 102]
    assert runs[1]["n_events"] == 297


def test_threshold_merge_last_write_wins(spark):
    log = new_run_log(spark, CFG)
    log = run_log_update(log, _rec(101), {0: 480, 1: 495})
    log = run_log_update(log, _rec(102), {1: 497, 2: 501})
    thr = log.head()["thresholds"]
    assert thr == {"0": 480, "1": 497, "2": 501}


def test_json_roundtrip_exact(spark, tmp_path):
    path = str(tmp_path / "runlog")
    log = new_run_log(spark, CFG)
    log = run_log_update(log, _rec(101), {0: 480})
    log = run_log_update(log, _rec(102, vmon=184.9), {0: 482})
    write_run_log(log, path)
    back = read_run_log(spark, path)
    assert back.count() == 1
    assert back.head() == log.head()  # full nested equality


def test_runs_table_flattens(spark):
    log = new_run_log(spark, CFG)
    log = run_log_update(log, _rec(101))
    log = run_log_update(log, _rec(102))
    flat = runs_table(log)
    assert flat.count() == 2
    assert {"run", "rb", "n_events", "vmon", "imon", "temperature"} <= \
        set(flat.columns)


def test_update_is_functional(spark):
    """Updating a log must not mutate the input document."""
    base = new_run_log(spark, CFG)
    run_log_update(base, _rec(101), {0: 480})
    row = base.head()
    assert row["runs"] == [] and row["thresholds"] == {}
