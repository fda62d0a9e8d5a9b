"""Windowed/streaming queries (N17) in their batch-equivalent form.

The same operator functions (``streaming.windows``) run unchanged on a
``readStream`` input — pytest proves that equivalence with real
streaming runs (tests/test_streaming.py); the registry entries here run
them in batch so the DuckDB oracle can check the window semantics
exactly: tumbling/sliding alignment, session gap merging (window end =
last event + gap), and first-arrival dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_snapshotter_spark.sources.changelog import read_table
from hbase_snapshotter_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        ev, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n_events"),
         F.round(F.sum("value"), 2).alias("sum_value")],
    )


ORACLE_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return sliding_window_agg(
        ev, "ts", "2 hours", "1 hour", [],
        [F.count(F.lit(1)).alias("n_events")],
    )


ORACLE_SLIDING = """
WITH w AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) - k.k * INTERVAL '1 hour' AS window_start
  FROM events, UNNEST(range(0, 2)) AS k(k))
SELECT window_start, window_start + INTERVAL '2 hours' AS window_end,
       COUNT(*) AS n_events
FROM w GROUP BY 1, 2
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return session_window_agg(
        ev, "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )


# Gaps-and-islands replay of Spark session semantics: a new session
# starts when the gap since the previous event is >= 30min (session
# window end is exclusive); window_end = last event + gap.
ORACLE_SESSION = """
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts >= LAG(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT MIN(ts) AS window_start,
       MAX(ts) + INTERVAL '30 minutes' AS window_end,
       user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def stream_dedup_first_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shadow of dropDuplicatesWithinWatermark: first arrival per
    (user, event_type) within each 1-hour bucket."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("first"))
        .select(
            F.col("window.start").alias("window_start"),
            "user_id", "event_type",
            F.col("first.event_id").alias("event_id"),
        )
    )


ORACLE_DEDUP_FIRST = """
SELECT window_start, user_id, event_type, event_id FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         user_id, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts),
                                         user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


PAIRS = {
    "stream_tumbling_counts": (stream_tumbling_counts, ORACLE_TUMBLING),
    "stream_sliding_counts": (stream_sliding_counts, ORACLE_SLIDING),
    "stream_session_windows": (stream_session_windows, ORACLE_SESSION),
    "stream_dedup_first_arrival": (stream_dedup_first_arrival, ORACLE_DEDUP_FIRST),
}
