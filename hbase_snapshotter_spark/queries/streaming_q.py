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


# ------------------------------------------ event analytics: funnel
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first signup and first purchase
    AFTER that signup; conversion flag — min-aggregates + one join,
    no window sort."""
    ev = read_table(spark, sf_dir, "events")
    signup = (ev.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    purchase = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", F.col("ts").alias("p_ts"))
    first_purchase = (
        signup.join(purchase, "user_id", "left")
        .filter(F.col("p_ts").isNull() | (F.col("p_ts") >= F.col("signup_ts")))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return first_purchase.select(
        "user_id", "signup_ts", "first_purchase_ts",
        F.col("first_purchase_ts").isNotNull().alias("converted"),
    )


ORACLE_FUNNEL = """
WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
fp AS (SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
       FROM s LEFT JOIN events e
         ON e.user_id = s.user_id AND e.event_type = 'purchase'
        AND e.ts >= s.signup_ts
       GROUP BY s.user_id, s.signup_ts)
SELECT user_id, signup_ts, first_purchase_ts,
       first_purchase_ts IS NOT NULL AS converted
FROM fp
"""


# ------------------------------------- event analytics: cohort retention
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    per subsequent active week — two aggregations + a broadcast join."""
    ev = read_table(spark, sf_dir, "events")
    weeks = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.distinct()
        .join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


ORACLE_RETENTION = """
WITH weeks AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
               FROM events),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT cohort_week, week, COUNT(DISTINCT w.user_id) AS active_users
FROM weeks w JOIN cohort c ON w.user_id = c.user_id
GROUP BY cohort_week, week
"""


PAIRS.update({
    "funnel_signup_purchase": (funnel_signup_purchase, ORACLE_FUNNEL),
    "cohort_retention": (cohort_retention, ORACLE_RETENTION),
})
