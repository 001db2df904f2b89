"""Event-time window operators, batch-checked (SURVEY.md §2.5 T1–T3, T5).

These run the same ``window()`` / ``session_window()`` expressions the
streaming layer uses (rdkafka_streams_spark.streaming), executed in batch so
DuckDB can oracle them: tumbling/sliding/session windows are pure functions
of event time, identical in batch and micro-batch execution. Watermarking —
which has no batch analog — is covered by the streaming tests
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdkafka_streams_spark.core.io import load_table
from rdkafka_streams_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------------------ T1
@query(
    "q40_tumbling_window",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""",
    tags=("T1",),
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event type."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "n",
            "total",
        )
    )


# ------------------------------------------------------------------------ T2
@query(
    "q41_sliding_window",
    oracle="""
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type, COUNT(*) AS n
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (t.off * INTERVAL '30 minutes') AS ws,
         event_type
  FROM events CROSS JOIN (VALUES (0), (1)) t(off)
)
GROUP BY 1, 2
""",
    tags=("T2",),
)
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide: every event lands in exactly
    two windows; the oracle materializes the same two bucket starts."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "n",
        )
    )


# ------------------------------------------------------------------------ T3
@query(
    "q42_session_window",
    oracle="""
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events),
y AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x)
SELECT user_id, epoch_us(MIN(ts)) AS session_start_us, COUNT(*) AS n_events
FROM y GROUP BY user_id, sid
""",
    tags=("T3",),
)
def q42_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user; the oracle is
    the classic gaps-and-islands formulation of the same semantics."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
        )
    )


# ------------------------------------------------------------------------ T5
@query(
    "q43_event_dedup",
    oracle="""
SELECT user_id, event_type, event_id, epoch_us(ts) AS first_ts_us
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("T5", "E16"),
)
def q43_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest record — the deterministic batch
    equivalent of streaming dropDuplicates (which keeps the first arrival;
    streaming variant with watermark state in streaming/dedup tests)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("first_ts_us"))
    )
