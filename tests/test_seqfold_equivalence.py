"""Optimization round 12: the recursive-CTE day-table family is lowered to
the single-job aggregate-HOF fold (operators/seqfold.py). These tests pin
the equivalence the lowering claims: for every member, the registered
builder's output is BIT-IDENTICAL (values and schema) to the old
WITH RECURSIVE body executed by Spark itself over the same day feeder —
the recursion bodies still exist verbatim as the DuckDB oracle texts, so
the comparison uses one textual source of truth and cannot drift.

Why this holds by construction: `aggregate` (ArrayAggregate) folds its
lambda sequentially left-to-right, i.e. applies the SAME per-step
arithmetic in the SAME order as the recursion's level-by-level evaluation —
exact int64 state trivially, double state (KM product, Kalman chain, GARCH
variance) as the identical IEEE operation sequence.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project_etl_spark.io import table
from project_etl_spark.registry import load_all

REGISTRY = load_all()


def _exact(old_df, new_df, name):
    o = sorted(tuple(r) for r in old_df.collect())
    n = sorted(tuple(r) for r in new_df.collect())
    assert old_df.columns == new_df.columns, name
    assert [f.dataType for f in old_df.schema] == \
        [f.dataType for f in new_df.schema], name
    assert o == n, (name, o[:3], n[:3])


def _day_counts(ev):
    return (ev.select(F.expr("unix_micros(ts) div 86400000000")
                      .cast("long").alias("day"))
            .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x")))


def _ranked(d):
    return d.select(F.row_number().over(Window.orderBy("day")).cast("long")
                    .alias("rn"), "day", "x")


def test_cusum_fold_equals_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.sql_dialect import _CUSUM_BODY

    ev = table(spark, sf_dir, "events")
    d = _day_counts(ev.where(F.col("event_type") == "error"))
    p = d.agg(F.expr("cast((2000 * sum(x) + count(1)) div (2 * count(1))"
                     " as bigint)").alias("mean_milli"))
    h = (d.crossJoin(F.broadcast(p))
         .select(F.row_number().over(Window.orderBy("day")).cast("long")
                 .alias("rn"), "day", "x", "mean_milli",
                 F.expr("cast(mean_milli div 4 as bigint)")
                 .alias("slack_milli"),
                 (F.col("mean_milli") * 2).cast("long").alias("h_milli"))
         .localCheckpoint(eager=True))
    h.createOrReplaceTempView("sf_eq_cusum_h")
    _exact(spark.sql(_CUSUM_BODY.format(h="sf_eq_cusum_h")),
           REGISTRY["win_cusum_change"].builder(spark, sf_dir),
           "win_cusum_change")


def test_km_fold_equals_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.sql_dialect import _KM_BODY

    ev = table(spark, sf_dir, "events")
    conv = F.min(F.when((F.col("event_type") == "purchase")
                        & (F.col("value") >= 75.0), F.col("ts")))
    u = (ev.groupBy("user_id")
         .agg(((F.unix_micros(F.coalesce(conv, F.max("ts")))
                - F.unix_micros(F.min("ts")))
               / F.lit(86400000000)).cast("long").alias("dur_d"),
              F.when(conv.isNull(), 0).otherwise(1).alias("ev")))
    t = (u.groupBy("dur_d")
         .agg(F.sum("ev").cast("long").alias("d_cnt"),
              F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c_cnt")))
    r = (t.select(F.row_number().over(Window.orderBy("dur_d"))
                  .cast("long").alias("rn"),
                  "dur_d", "d_cnt", "c_cnt",
                  F.sum(F.col("d_cnt") + F.col("c_cnt"))
                  .over(Window.orderBy(F.col("dur_d").desc()))
                  .cast("long").alias("at_risk"))
         .localCheckpoint(eager=True))
    r.createOrReplaceTempView("sf_eq_km_risk")
    _exact(spark.sql(_KM_BODY.format(r="sf_eq_km_risk")),
           REGISTRY["agg_survival_km"].builder(spark, sf_dir),
           "agg_survival_km")


def test_holt_and_backtest_fold_equal_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.sql_dialect import (_BACKTEST_BODY,
                                                         _HOLT_BODY)

    ev = table(spark, sf_dir, "events")
    h = _ranked(_day_counts(ev)).localCheckpoint(eager=True)
    h.createOrReplaceTempView("sf_eq_holt_daily")
    _exact(spark.sql(_HOLT_BODY.format(h="sf_eq_holt_daily")),
           REGISTRY["win_holt_linear"].builder(spark, sf_dir),
           "win_holt_linear")
    _exact(spark.sql(_BACKTEST_BODY.format(h="sf_eq_holt_daily")),
           REGISTRY["agg_forecast_backtest"].builder(spark, sf_dir),
           "agg_forecast_backtest")


def test_holt_winters_fold_equals_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.sql_dialect import _HW_BODY

    ev = table(spark, sf_dir, "events")
    h = _ranked(_day_counts(ev)).localCheckpoint(eager=True)
    h.createOrReplaceTempView("sf_eq_hw_daily")
    _exact(spark.sql(_HW_BODY.format(h="sf_eq_hw_daily")),
           REGISTRY["win_holt_winters"].builder(spark, sf_dir),
           "win_holt_winters")


def test_kalman_fold_equals_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.windows import (_KALMAN_BODY,
                                                     _KALMAN_DAY_SPARK,
                                                     _KALMAN_DAYS)

    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("sf_eq_kalman_events")
    days = (spark.sql(_KALMAN_DAYS.format(src="sf_eq_kalman_events",
                                          day=_KALMAN_DAY_SPARK))
            .coalesce(1).localCheckpoint())
    days.createOrReplaceTempView("sf_eq_kalman_days")
    _exact(spark.sql(_KALMAN_BODY.format(
        days="SELECT day, obs, rn FROM sf_eq_kalman_days")),
        REGISTRY["win_kalman_local_level"].builder(spark, sf_dir),
        "win_kalman_local_level")


def test_garch_fold_equals_engine_recursion(spark, sf_dir):
    from project_etl_spark.operators.windows import (_GARCH_BODY,
                                                     _GARCH_DAYS,
                                                     _KALMAN_DAY_SPARK)

    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("sf_eq_garch_events")
    days = (spark.sql(_GARCH_DAYS.format(src="sf_eq_garch_events",
                                         day=_KALMAN_DAY_SPARK))
            .coalesce(1).localCheckpoint())
    days.createOrReplaceTempView("sf_eq_garch_days")
    _exact(spark.sql(_GARCH_BODY.format(
        days="SELECT rn, day, eps FROM sf_eq_garch_days")),
        REGISTRY["win_garch_volatility"].builder(spark, sf_dir),
        "win_garch_volatility")


def test_fold_empty_feeder_yields_empty(spark):
    """The recursion's base case over an empty feeder is empty output; the
    fold must match without tripping ANSI out-of-bounds access."""
    from project_etl_spark.operators.seqfold import fold_states

    h = spark.createDataFrame([], "rn long, day long, x long")
    out = fold_states(
        h, ["rn", "day", "x"],
        init_sql="named_struct('s', CAST(1000 * {r0}.x AS BIGINT))",
        step_sql="named_struct('s', CAST({acc}.s + t.x AS BIGINT))",
        out_sql=["e.t.day AS day", "e.s.s AS s"])
    assert out.count() == 0
    assert out.columns == ["day", "s"]
