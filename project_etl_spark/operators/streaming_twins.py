"""§2.9 Streaming operators — batch twins.

The real Structured Streaming pipelines live in
``project_etl_spark.streaming`` (file-source watchdog, watermarks, stateful
counter) and are validated by known-count tests (SURVEY.md §5.2.2). The
*logic* of the window operators is hash-checked here: ``window()`` /
``session_window()`` evaluate identically in batch, so each twin runs the
same expression over the ``events`` fixture with a DuckDB oracle built from
epoch arithmetic.

Reference analogs: fixed 30 s acquisition windows (DAQ_self-triggering.md:452,
:179-210), continuous rate monitoring (:195-209), burst/double-trigger
sessions (Documentation-Self-Triggering.html:239-243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.portable import exact_sum
from project_etl_spark.registry import register
from project_etl_spark.session import ensure_deterministic

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling_window",
    oracle="""
        SELECT strftime(to_timestamp(FLOOR(EPOCH(ts) / 1800) * 1800),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_value
        FROM events
        GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed acquisition windows (30 s runs scaled to 30 min for the fixture's
    30-day span): ``F.window`` tumbling — identical semantics batch/stream."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             exact_sum(F.col("value"), 2).alias("sum_value"))
        .select(F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
                "n_events", "sum_value")
    )


@register(
    "stream_sliding_window",
    oracle="""
        SELECT strftime(to_timestamp(FLOOR(EPOCH(e.ts) / 900) * 900 - k.k * 900),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events
        FROM events e
        CROSS JOIN generate_series(0, 3) k(k)
        GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping rate monitor: 60 min windows sliding by 15 — each event
    belongs to length/slide = 4 windows (continuous L1A-rate polling,
    DAQ_self-triggering.md:195-209)."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "60 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
                "n_events")
    )


@register(
    "stream_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        )) >= 1800 OR LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        ) IS NULL THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            -- event_id tie-break keeps duplicate (user_id, ts) rows in one
            -- deterministic order; >= matches session_window's half-open
            -- interval (an event at exactly last+gap starts a NEW session)
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("streaming", "window"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (burst grouping / double-trigger generalization,
    Documentation-Self-Triggering.html:239-243): ``session_window`` with a
    30 min gap; the oracle is the classic gaps-and-islands rewrite.
    Spark's session end = last event + gap."""
    ensure_deterministic(spark)
    ev = table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id",
                F.date_format(F.col("w.start"), fmt).alias("session_start"),
                F.date_format(F.col("w.end"), fmt).alias("session_end"),
                "n_events")
    )
