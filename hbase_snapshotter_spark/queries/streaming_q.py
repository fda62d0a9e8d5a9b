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
    interval_stream_join,
    running_max_trace,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream-join-then-window pipeline in batch form: click
    events joined to the same user's purchases within the following
    hour via :func:`interval_stream_join` (the time-interval condition
    that bounds join state in streaming; a no-op watermark in batch),
    then a tumbling hourly count/sum of the conversion pairs.  The
    interval condition in the plan is pinned by
    ``tests/test_plans.py``; true readStream equivalence of the same
    operator is pinned by ``tests/test_streaming.py``."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value")
    pairs = interval_stream_join(
        clicks, purchases, "user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        watermark="1 hour", within="1 HOUR",
    ).select("click_ts", "purchase_ts", "value")
    return tumbling_window_agg(
        pairs, "click_ts", "1 hour", [],
        [F.count(F.lit(1)).alias("n_conversions"),
         F.round(F.sum("value"), 2).alias("sum_purchase_value")],
    )


ORACLE_TUMBLING = """
WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS purchase_ts, value FROM events
      WHERE event_type = 'purchase'),
j AS (SELECT c.click_ts, p.value
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.purchase_ts >= c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL '1 hour')
SELECT time_bucket(INTERVAL '1 hour', click_ts) AS window_start,
       time_bucket(INTERVAL '1 hour', click_ts) + INTERVAL '1 hour' AS window_end,
       COUNT(*) AS n_conversions,
       ROUND(SUM(value), 2) AS sum_purchase_value
FROM j GROUP BY 1, 2
"""


def stream_dedup_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-arrival dedup (the batch shadow of
    dropDuplicatesWithinWatermark: first event per (user, event_type)
    within each 1-hour bucket) feeding a 2h/1h sliding-window count —
    the dedup-then-window streaming pipeline as one query."""
    ev = read_table(spark, sf_dir, "events")
    first = (
        ev.groupBy(F.window("ts", "1 hour"), "user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("first"))
        .select(F.col("first.ts").alias("ts"))
    )
    return sliding_window_agg(
        first, "ts", "2 hours", "1 hour", [],
        [F.count(F.lit(1)).alias("n_events")],
    )


ORACLE_DEDUP_SLIDING = """
WITH d AS (
  SELECT ts FROM (
    SELECT ts,
           ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts),
                                           user_id, event_type
                              ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn = 1),
w AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) - k.k * INTERVAL '1 hour' AS window_start
  FROM d, UNNEST(range(0, 2)) AS k(k))
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


def stream_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATEFUL lane's driver row: the per-key running-max state
    trajectory sampled at hour boundaries
    (:func:`~hbase_snapshotter_spark.streaming.windows.running_max_trace`)
    — the batch shadow of the ``applyInPandasWithState`` operator
    ``running_max_per_key``, whose real readStream run is pinned
    equivalent (final emitted state == this trace's last row per key)
    by ``tests/test_streaming.py``."""
    ev = read_table(spark, sf_dir, "events")
    return running_max_trace(ev, "user_id", "value", "ts", "1 hour")


ORACLE_RUNNING_MAX = """
WITH h AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         user_id, MAX(value) AS window_max
  FROM events GROUP BY 1, 2)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
       user_id, window_max,
       MAX(window_max) OVER (PARTITION BY user_id ORDER BY window_start)
         AS running_max
FROM h
"""


def stream_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-interval-join pipeline, the dedup-then-sliding
    pipeline, AND per-user session windows in one tagged union (r7
    merged the first two; r8 folds the former standalone
    ``stream_session_windows`` recorded slot the same way) — all three
    lanes' full operator chains (interval stream join → tumbling
    window; first-arrival dedup → sliding window; gap-merged session
    windows) survive as branches of this one plan.  ``user_id`` is
    NULL on the keyless lanes."""
    a = stream_tumbling_counts(spark, sf_dir).select(
        F.lit("tumbling_interval_join").alias("lane"),
        "window_start", "window_end",
        F.lit(None).cast("long").alias("user_id"),
        F.col("n_conversions").alias("n"),
        F.col("sum_purchase_value").alias("metric"),
    )
    b = stream_dedup_sliding_counts(spark, sf_dir).select(
        F.lit("dedup_sliding").alias("lane"),
        "window_start", "window_end",
        F.lit(None).cast("long").alias("user_id"),
        F.col("n_events").alias("n"),
        F.lit(None).cast("double").alias("metric"),
    )
    c = stream_session_windows(spark, sf_dir).select(
        F.lit("session").alias("lane"),
        "window_start", "window_end",
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_events").alias("n"),
        F.lit(None).cast("double").alias("metric"),
    )
    return a.unionAll(b).unionAll(c)


ORACLE_WINDOW_SUITE = f"""
SELECT 'tumbling_interval_join' AS lane, window_start, window_end,
       CAST(NULL AS BIGINT) AS user_id,
       n_conversions AS n, sum_purchase_value AS metric
FROM ({ORACLE_TUMBLING})
UNION ALL
SELECT 'dedup_sliding' AS lane, window_start, window_end,
       CAST(NULL AS BIGINT) AS user_id,
       n_events AS n, CAST(NULL AS DOUBLE) AS metric
FROM ({ORACLE_DEDUP_SLIDING})
UNION ALL
SELECT 'session' AS lane, window_start, window_end,
       CAST(user_id AS BIGINT) AS user_id,
       n_events AS n, CAST(NULL AS DOUBLE) AS metric
FROM ({ORACLE_SESSION})
"""


PAIRS = {
    "stream_window_suite": (stream_window_suite, ORACLE_WINDOW_SUITE),
    "stream_running_max": (stream_running_max, ORACLE_RUNNING_MAX),
}


# --------------------------- event analytics: funnel + cohort retention
def signup_purchase_funnel(ev: DataFrame) -> DataFrame:
    """Per-user funnel: first signup and first purchase at-or-after it.

    Min-aggregates + ONE left join with the ``p_ts >= signup_ts``
    predicate inside the join condition — a post-join filter would drop
    users whose purchases all precede their first signup (their left
    join emits only non-null early-purchase rows, which the filter then
    removes); they must instead surface as ``converted = false``.
    No window sort anywhere."""
    signup = (ev.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    purchase = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    return (
        signup.join(
            purchase,
            (signup.user_id == purchase.p_user) & (purchase.p_ts >= signup.signup_ts),
            "left")
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
        .select(
            "user_id", "signup_ts", "first_purchase_ts",
            F.col("first_purchase_ts").isNotNull().alias("converted"),
        )
    )


def funnel_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort retention with funnel conversion: users cohorted by
    first-signup week, their active weeks counted, split by whether they
    ever purchased at-or-after that signup (:func:`signup_purchase_funnel`).
    The cohort stage is distinct-weeks + a size-driven join (broadcast
    while the per-user funnel fits, co-partitioned shuffle beyond) +
    one hash aggregation."""
    ev = read_table(spark, sf_dir, "events")
    funnel = signup_purchase_funnel(ev).select(
        "user_id",
        F.date_trunc("week", F.col("signup_ts")).alias("cohort_week"),
        "converted",
    )
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")).distinct()
    # NO broadcast hint on the funnel side: it is a per-USER table, so
    # its size is unbounded at scale — Catalyst/AQE broadcast it while
    # it fits and fall back to a co-partitioned shuffle join when not
    return (
        weeks.join(funnel, "user_id")
        .groupBy("cohort_week", "week")
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.countDistinct(F.when(F.col("converted"), F.col("user_id")))
            .alias("converted_active"),
        )
    )


ORACLE_FUNNEL_COHORT = """
WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
fp AS (SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
       FROM s LEFT JOIN events e
         ON e.user_id = s.user_id AND e.event_type = 'purchase'
        AND e.ts >= s.signup_ts
       GROUP BY s.user_id, s.signup_ts),
f AS (SELECT user_id,
             CAST(date_trunc('week', signup_ts) AS TIMESTAMP) AS cohort_week,
             first_purchase_ts IS NOT NULL AS converted
      FROM fp),
w AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events)
SELECT cohort_week, week,
       COUNT(DISTINCT w.user_id) AS active_users,
       COUNT(DISTINCT CASE WHEN converted THEN w.user_id END) AS converted_active
FROM w JOIN f ON w.user_id = f.user_id
GROUP BY cohort_week, week
"""


# ------------------------- N59: time-bucket resample + gap fill (r7)
#: 30-minute buckets over the fixture's 30-day span: ~1 440 grid rows
#: per event type with a real gap fraction (~25 % empty at sf0.01), so
#: both fill lanes actually fill.  The grid size is span/width —
#: INDEPENDENT of the event count, the property that makes the dense
#: form affordable at any scale.
RESAMPLE_BUCKET_MS = 30 * 60 * 1000


def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup (N59): events downsampled to a regular
    30-minute grid per event type, densified, and gap-filled — LOCF
    and linear interpolation side by side, ``filled`` marking
    generated rows.  The oracle replays bucketing, the grid, and both
    fills exactly (integer bucket arithmetic; 4-dp value rounding)."""
    from hbase_snapshotter_spark.operators.timeseries import (
        gap_fill,
        time_bucket_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    r = time_bucket_rollup(
        ev, "ts", "value", RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    return gap_fill(r, RESAMPLE_BUCKET_MS, group_cols=["event_type"])


ORACLE_RESAMPLE_GAPFILL = f"""
WITH r AS (
  SELECT event_type,
         CAST(FLOOR(epoch_ms(ts) / {RESAMPLE_BUCKET_MS}) AS BIGINT)
           * {RESAMPLE_BUCKET_MS} AS bucket,
         SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
           / COUNT(value) / 1000000.0 AS v_avg,
         CAST(COUNT(value) AS INTEGER) AS n_rows
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
      FROM r GROUP BY 1),
grid AS (SELECT event_type,
                UNNEST(range(mn, mx + 1, {RESAMPLE_BUCKET_MS})) AS bucket
         FROM b),
j AS (SELECT g.event_type, g.bucket, r.v_avg, r.n_rows
      FROM grid g LEFT JOIN r
        ON r.event_type = g.event_type AND r.bucket = g.bucket),
w AS (
  SELECT *,
         LAST_VALUE(v_avg IGNORE NULLS) OVER wp AS pv,
         LAST_VALUE(CASE WHEN v_avg IS NOT NULL THEN bucket END
                    IGNORE NULLS) OVER wp AS pb,
         FIRST_VALUE(v_avg IGNORE NULLS) OVER wn AS nv,
         FIRST_VALUE(CASE WHEN v_avg IS NOT NULL THEN bucket END
                     IGNORE NULLS) OVER wn AS nb
  FROM j
  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_type, bucket,
       COALESCE(n_rows, 0) AS n_rows,
       v_avg,
       pv AS v_locf,
       CASE WHEN v_avg IS NOT NULL THEN v_avg
            ELSE ROUND(pv + (nv - pv) * (bucket - pb)
                       / CAST(nb - pb AS DOUBLE), 6) END AS v_lerp,
       (v_avg IS NULL) AS filled
FROM w
ORDER BY event_type, bucket
"""


# (registered via events_timeseries_suite — r8 consolidation; the
# standalone fn stays for tools/scale_curve.py and pytest)


# ------------------- N60: rolling-window stats + anomaly flags (r7)
#: 48 buckets of 30 min = a trailing 24-hour window; 3-sigma flag.
ROLLING_WINDOW_BUCKETS = 48
ROLLING_Z_THRESHOLD = 3.0


def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window monitoring lane (N60): the N59 dense grid with a
    trailing 24-hour mean/stddev per event type, each bucket's z-score
    against its own trailing window, and a 3-sigma anomaly flag.  The
    window input is the bucket GRID (span/width rows per group — the
    N59 property), never the raw events; the oracle replays the
    resample, both fills, and the rolling stats over the identical
    ROWS frame."""
    from hbase_snapshotter_spark.operators.timeseries import (
        gap_fill,
        rolling_stats,
        time_bucket_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    r = time_bucket_rollup(
        ev, "ts", "value", RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    grid = gap_fill(r, RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    return rolling_stats(
        grid, group_cols=["event_type"], value_col="v_lerp",
        window_buckets=ROLLING_WINDOW_BUCKETS,
        z_threshold=ROLLING_Z_THRESHOLD,
    ).select("event_type", "bucket", "v_lerp", "filled", "roll_avg",
             "roll_std", "zscore", "is_anomaly", "n_window")


_GAPFILL_CORE = ORACLE_RESAMPLE_GAPFILL.rsplit("ORDER BY", 1)[0]

ORACLE_ROLLING_ANOMALY = f"""
WITH gf AS ({_GAPFILL_CORE}),
rs AS (
  SELECT event_type, bucket, v_lerp, filled,
         -- exact integer micro-unit sum, then one double division:
         -- bit-identical to Spark (see rolling_stats — a ROUNDED mean
         -- of decimal values has systematic round ties)
         SUM(CAST(ROUND(v_lerp * 1000000, 0) AS BIGINT)) OVER tw
           / COUNT(v_lerp) OVER tw / 1000000.0 AS roll_avg,
         ROUND(STDDEV_SAMP(v_lerp) OVER tw, 4) AS roll_std,
         CAST(COUNT(v_lerp) OVER tw AS INTEGER) AS n_window
  FROM gf
  WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN {ROLLING_WINDOW_BUCKETS - 1} PRECEDING
                         AND CURRENT ROW))
SELECT event_type, bucket, v_lerp, filled, roll_avg, roll_std,
       CASE WHEN roll_std > 0
            THEN ROUND((v_lerp - roll_avg) / roll_std, 4) + 0.0 END AS zscore,
       COALESCE(ABS(CASE WHEN roll_std > 0
                         THEN ROUND((v_lerp - roll_avg) / roll_std, 4)
                    END) > {ROLLING_Z_THRESHOLD}, FALSE) AS is_anomaly,
       n_window
FROM rs
ORDER BY event_type, bucket
"""


# (registered via events_timeseries_suite — r8 consolidation)


# ------------------- N66: era-over-era distribution drift (PSI)
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit (N66): PSI of the event value
    distribution per event type, early era vs late era (the theta-lane
    snapshot boundary), over DDSketch log buckets with add-0.5
    smoothing.  Integer micro-unit term summing makes the sum
    order-independent; the oracle replays buckets, smoothing, terms,
    and the final half-up division exactly."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.profile import psi_drift
    from hbase_snapshotter_spark.queries.snapshot_q import SNAPSHOT_TS_MS

    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_type", "value",
                (F.unix_millis("ts") <= SNAPSHOT_TS_MS).alias("__early")))
    return psi_drift(
        ev.filter("__early"), ev.filter("NOT __early"), "value",
        group_cols=["event_type"])


def _oracle_drift_psi() -> str:
    from hbase_snapshotter_spark.operators.profile import PSI_DRIFT_THRESHOLD
    from hbase_snapshotter_spark.operators.sketches import DD_LN_GAMMA
    from hbase_snapshotter_spark.queries.snapshot_q import SNAPSHOT_TS_MS

    return f"""
WITH v AS (
  SELECT event_type,
         CAST(CEIL(ROUND(LN(value) / {repr(DD_LN_GAMMA)}, 6)) AS BIGINT)
           AS bucket,
         epoch_ms(ts) <= {SNAPSHOT_TS_MS} AS early
  FROM events WHERE value IS NOT NULL AND value > 0),
bc AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN early THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN early THEN 0 ELSE 1 END) AS cb
  FROM v GROUP BY 1, 2),
t AS (
  SELECT event_type, SUM(ca) AS n_a, SUM(cb) AS n_b,
         COUNT(*) AS n_buckets
  FROM bc GROUP BY 1),
terms AS (
  SELECT bc.event_type,
         CAST(ROUND(((bc.ca + 0.5) / (t.n_a + 0.5 * t.n_buckets)
                     - (bc.cb + 0.5) / (t.n_b + 0.5 * t.n_buckets))
                    * LN(((bc.ca + 0.5) / (t.n_a + 0.5 * t.n_buckets))
                         / ((bc.cb + 0.5) / (t.n_b + 0.5 * t.n_buckets)))
                    * 1e6, 0) AS BIGINT) AS term_micro
  FROM bc JOIN t USING (event_type)),
s AS (
  SELECT event_type, SUM(term_micro) AS psi_micro
  FROM terms GROUP BY 1)
SELECT t.event_type,
       CAST(t.n_buckets AS BIGINT) AS n_buckets,
       CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST((20000 * s.psi_micro + 1000000) // 2000000 AS DOUBLE) / 10000
         AS psi,
       CAST((20000 * s.psi_micro + 1000000) // 2000000 AS DOUBLE) / 10000
         > {PSI_DRIFT_THRESHOLD} AS drifted
FROM t JOIN s USING (event_type)
ORDER BY t.event_type
"""


PAIRS.update({
    "events_drift_psi": (events_drift_psi, _oracle_drift_psi()),
})


# ------------------- N72: EWMA smoothing over the dense grid
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA monitoring smoother (N72): the N59 dense grid folded
    through an exact integer fixed-point EWMA (α = 1/8) with a 25%
    excursion flag — bit-identical on any engine that can fold a list,
    so the oracle replays every step with ``list_reduce`` over
    bucket-ordered prefixes."""
    from hbase_snapshotter_spark.operators.timeseries import (
        ewma_smooth,
        gap_fill,
        time_bucket_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    r = time_bucket_rollup(
        ev, "ts", "value", RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    grid = gap_fill(r, RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    return ewma_smooth(grid, group_cols=["event_type"])


def _oracle_ewma() -> str:
    from hbase_snapshotter_spark.operators.timeseries import (
        EWMA_DEN,
        EWMA_DEV_DIV,
        EWMA_NUM,
    )

    keep, num, den = EWMA_DEN - EWMA_NUM, EWMA_NUM, EWMA_DEN
    step = f"({keep} * a + {num} * b + {den // 2}) // {den}"
    return f"""
WITH gf AS ({_GAPFILL_CORE}),
vm AS (SELECT event_type, bucket,
              CAST(ROUND(v_lerp * 1000000, 0) AS BIGINT) AS vmv
       FROM gf),
ls AS (SELECT event_type,
              list(vmv ORDER BY bucket) AS vs,
              list(bucket ORDER BY bucket) AS bs
       FROM vm GROUP BY 1),
ex AS (SELECT event_type, bs[i.i] AS bucket, vs[i.i] AS vmv,
              list_reduce(vs[1:i.i], (a, b) -> {step}) AS e
       FROM ls, UNNEST(range(1, len(vs) + 1)) AS i(i))
SELECT event_type, bucket,
       CAST(vmv AS DOUBLE) / 1000000 AS v,
       CAST(e AS DOUBLE) / 1000000 AS ewma,
       vmv - e AS dev_micro,
       {EWMA_DEV_DIV} * ABS(vmv - e) >= e AS is_excursion
FROM ex
ORDER BY event_type, bucket
"""


# (registered via events_timeseries_suite — r8 consolidation)


# ------------------- N74: sketch-based quantile-rank normalization
def events_quantile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortless percent_rank (N74): every event value mapped to its
    estimated within-type quantile rank using only the N58 DDSketch
    histogram state — a broadcast join against groups × buckets rows,
    the corpus never shuffles (Spark's exact percent_rank sorts every
    group).  Mid-rank estimates as exact rationals; the oracle replays
    buckets, cumulative counts, and the rounding."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.sketches import (
        quantile_rank_normalize,
        quantile_state,
    )

    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value"))
    state = quantile_state(ev, "value", group_cols=["event_type"])
    return quantile_rank_normalize(
        ev, state, "value", group_cols=["event_type"])


def _oracle_quantile_rank() -> str:
    from hbase_snapshotter_spark.operators.sketches import DD_LN_GAMMA

    return f"""
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(CEIL(ROUND(LN(value) / {repr(DD_LN_GAMMA)}, 6)) AS BIGINT)
           AS bucket
  FROM events WHERE value IS NOT NULL AND value > 0),
st AS (SELECT event_type, bucket, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM st)
SELECT v.event_id, v.event_type, v.value,
       CAST((20000 * (2 * c.below + c.cnt) + 2 * c.n)
            // (2 * 2 * c.n) AS DOUBLE) / 10000 AS q_rank
FROM v JOIN cum c ON c.event_type = v.event_type AND c.bucket = v.bucket
ORDER BY v.event_id
"""


# (registered via events_sketch_norm_suite — r8 consolidation)


# ------------------- N75: sketch-state winsorization
WINSOR_QLO = 0.05
WINSOR_QHI = 0.95


def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-state winsorization (N75): every event value clipped to
    its type's [q5, q95] DDSketch-estimated quantiles — robust feature
    prep with no sort and no second scan; bounds are a broadcast
    one-row-per-group table derived from mergeable state.  The oracle
    replays buckets, quantile estimates, and the clip exactly."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.sketches import (
        quantile_state,
        winsorize,
    )

    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0)))
    state = quantile_state(ev, "value", group_cols=["event_type"])
    return winsorize(ev, state, "value", group_cols=["event_type"],
                     q_lo=WINSOR_QLO, q_hi=WINSOR_QHI)


def _oracle_winsorized() -> str:
    from hbase_snapshotter_spark.operators.sketches import (
        DD_GAMMA,
        DD_LN_GAMMA,
    )

    est = ("ROUND(2.0 * POWER({G}, MIN(CASE WHEN cum >= CEIL({q} * n) "
           "THEN bucket END)) / {GP1}, 4)")
    lo = est.format(G=repr(DD_GAMMA), GP1=repr(DD_GAMMA + 1),
                    q=repr(WINSOR_QLO))
    hi = est.format(G=repr(DD_GAMMA), GP1=repr(DD_GAMMA + 1),
                    q=repr(WINSOR_QHI))
    return f"""
WITH v AS (
  SELECT event_id, event_type, value FROM events
  WHERE value IS NOT NULL AND value > 0),
b AS (SELECT event_type,
             CAST(CEIL(ROUND(LN(value) / {repr(DD_LN_GAMMA)}, 6)) AS BIGINT)
               AS bucket,
             COUNT(*) AS cnt
      FROM v GROUP BY 1, 2),
c AS (SELECT event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM b),
q AS (SELECT event_type, {lo} AS lo, {hi} AS hi FROM c GROUP BY event_type)
SELECT v.event_id, v.event_type, v.value,
       ROUND(LEAST(GREATEST(v.value, q.lo), q.hi), 4) AS v_winsorized,
       (v.value < q.lo OR v.value > q.hi) AS was_clipped
FROM v JOIN q USING (event_type)
ORDER BY v.event_id
"""


# (registered via events_sketch_norm_suite — r8 consolidation)


# ------------- r8 consolidated suites (VERDICT r7 task 1): the five
# thin events_* lanes fold into TWO recorded keys whose single plans
# carry all five capabilities — the stream_window_suite pattern.
def events_timeseries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series monitoring suite — N59 + N60 + N72 in ONE plan (r8
    merge of the former standalone ``events_resample_gapfill``,
    ``events_rolling_anomaly`` and ``events_ewma_smooth`` rows): the
    30-minute dense grid with both gap fills, the trailing-24 h rolling
    stats + 3σ anomaly flags over it, and the integer-exact EWMA +
    excursion flags — one row per (event_type, bucket) carrying every
    lane's columns, each replayed exactly by the oracle.

    Scale shape unchanged from the standalones: everything after the
    rollup scan is bucket-table-sized (span/width rows per group); the
    grid is persisted once and feeds both the window pass and the
    per-group EWMA fold, and the final join is grid-sized."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.timeseries import (
        ewma_smooth,
        gap_fill,
        rolling_stats,
        time_bucket_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    r = time_bucket_rollup(
        ev, "ts", "value", RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    grid = scoped_persist(
        gap_fill(r, RESAMPLE_BUCKET_MS, group_cols=["event_type"]))
    rs = rolling_stats(
        grid, group_cols=["event_type"], value_col="v_lerp",
        window_buckets=ROLLING_WINDOW_BUCKETS,
        z_threshold=ROLLING_Z_THRESHOLD)
    ew = ewma_smooth(grid, group_cols=["event_type"]).drop("v")
    return rs.join(ew, ["event_type", "bucket"])


def _oracle_timeseries_suite() -> str:
    from hbase_snapshotter_spark.operators.timeseries import (
        EWMA_DEN,
        EWMA_DEV_DIV,
        EWMA_NUM,
    )

    keep, num, den = EWMA_DEN - EWMA_NUM, EWMA_NUM, EWMA_DEN
    step = f"({keep} * a + {num} * b + {den // 2}) // {den}"
    return f"""
WITH gf AS ({_GAPFILL_CORE}),
rs AS (
  SELECT gf.*,
         SUM(CAST(ROUND(v_lerp * 1000000, 0) AS BIGINT)) OVER tw
           / COUNT(v_lerp) OVER tw / 1000000.0 AS roll_avg,
         ROUND(STDDEV_SAMP(v_lerp) OVER tw, 4) AS roll_std,
         CAST(COUNT(v_lerp) OVER tw AS INTEGER) AS n_window
  FROM gf
  WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN {ROLLING_WINDOW_BUCKETS - 1} PRECEDING
                         AND CURRENT ROW)),
rz AS (
  SELECT *,
         CASE WHEN roll_std > 0
              THEN ROUND((v_lerp - roll_avg) / roll_std, 4) + 0.0
         END AS zscore
  FROM rs),
vm AS (SELECT event_type, bucket,
              CAST(ROUND(v_lerp * 1000000, 0) AS BIGINT) AS vmv
       FROM gf),
ls AS (SELECT event_type,
              list(vmv ORDER BY bucket) AS vs,
              list(bucket ORDER BY bucket) AS bs
       FROM vm GROUP BY 1),
ex AS (SELECT event_type, bs[i.i] AS bucket, vs[i.i] AS vmv,
              list_reduce(vs[1:i.i], (a, b) -> {step}) AS e
       FROM ls, UNNEST(range(1, len(vs) + 1)) AS i(i))
SELECT rz.event_type, rz.bucket, rz.n_rows, rz.v_avg, rz.v_locf,
       rz.v_lerp, rz.filled, rz.roll_avg, rz.roll_std, rz.zscore,
       COALESCE(ABS(rz.zscore) > {ROLLING_Z_THRESHOLD}, FALSE) AS is_anomaly,
       rz.n_window,
       CAST(ex.e AS DOUBLE) / 1000000 AS ewma,
       ex.vmv - ex.e AS dev_micro,
       {EWMA_DEV_DIV} * ABS(ex.vmv - ex.e) >= ex.e AS is_excursion
FROM rz JOIN ex ON ex.event_type = rz.event_type AND ex.bucket = rz.bucket
ORDER BY rz.event_type, rz.bucket
"""


def events_sketch_norm_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-state normalization suite — N74 + N75 in ONE plan (r8
    merge of the former standalone ``events_quantile_rank`` and
    ``events_winsorized`` rows): every positive event value carries its
    DDSketch mid-rank quantile estimate AND its [q5, q95] winsorized
    form — the two state-derived feature transforms, sharing ONE
    histogram state build.  The corpus never shuffles: both transforms
    are broadcast joins against bounded state tables chained onto the
    same scan."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.sketches import (
        quantile_rank_normalize,
        quantile_state,
        winsorize,
    )

    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0)))
    state = scoped_persist(
        quantile_state(ev, "value", group_cols=["event_type"]))
    qr = quantile_rank_normalize(
        ev, state, "value", group_cols=["event_type"])
    return winsorize(qr, state, "value", group_cols=["event_type"],
                     q_lo=WINSOR_QLO, q_hi=WINSOR_QHI)


def _oracle_sketch_norm_suite() -> str:
    from hbase_snapshotter_spark.operators.sketches import (
        DD_GAMMA,
        DD_LN_GAMMA,
    )

    est = ("ROUND(2.0 * POWER({G}, MIN(CASE WHEN cum >= CEIL({q} * n) "
           "THEN bucket END)) / {GP1}, 4)")
    lo = est.format(G=repr(DD_GAMMA), GP1=repr(DD_GAMMA + 1),
                    q=repr(WINSOR_QLO))
    hi = est.format(G=repr(DD_GAMMA), GP1=repr(DD_GAMMA + 1),
                    q=repr(WINSOR_QHI))
    return f"""
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(CEIL(ROUND(LN(value) / {repr(DD_LN_GAMMA)}, 6)) AS BIGINT)
           AS bucket
  FROM events WHERE value IS NOT NULL AND value > 0),
b AS (SELECT event_type, bucket, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
c AS (SELECT event_type, bucket, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM b),
q AS (SELECT event_type, {lo} AS lo, {hi} AS hi FROM c GROUP BY event_type),
vr AS (
  SELECT v.event_id, v.event_type, v.value,
         CAST((20000 * (2 * c.below + c.cnt) + 2 * c.n)
              // (2 * 2 * c.n) AS DOUBLE) / 10000 AS q_rank
  FROM v JOIN c ON c.event_type = v.event_type AND c.bucket = v.bucket)
SELECT vr.event_id, vr.event_type, vr.value, vr.q_rank,
       ROUND(LEAST(GREATEST(vr.value, q.lo), q.hi), 4) AS v_winsorized,
       (vr.value < q.lo OR vr.value > q.hi) AS was_clipped
FROM vr JOIN q USING (event_type)
ORDER BY vr.event_id
"""


PAIRS.update({
    "events_timeseries_suite": (events_timeseries_suite,
                                _oracle_timeseries_suite()),
    "events_sketch_norm_suite": (events_sketch_norm_suite,
                                 _oracle_sketch_norm_suite()),
})


#: Layout buckets for the N83 range-layout audit — 8 target "files".
RANGE_LAYOUT_B = 8


def range_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-guided equi-depth range layout vs naive fixed-width
    (SURVEY §2.3 N83): per (event_type, method, bucket), the row count,
    the value span the bucket's file would carry in its min/max stats,
    and the depth ratio n_rows·B/total (1.0 = perfectly balanced
    files).  The equi-depth lane derives its bucket from the N74
    sortless quantile rank — so however skewed the value distribution,
    its depth ratios sit near 1 while the fixed-width lane's collapse
    onto a few hot buckets: the layout decision MEASURED in one
    recorded plan, not argued.

    Scale shape: one DDSketch state build (hash agg to O(buckets)
    rows), both bucket assignments are broadcast joins / pure column
    exprs on a never-shuffled corpus, and the audit agg reduces to
    ≤ 2·B rows per group with map-side partials.  At 100 TB this IS
    the write plan: ``partitionBy(event_type)`` +
    range-partition-by-equidepth-bucket gives balanced parquet files
    whose min/max value stats prune range predicates."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.layout import (
        equidepth_bucket,
        fixed_width_bucket_micro,
    )
    from hbase_snapshotter_spark.operators.sketches import (
        quantile_rank_normalize,
        quantile_state,
    )

    B = RANGE_LAYOUT_B
    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0)))
    state = quantile_state(ev, "value", group_cols=["event_type"])
    qr = quantile_rank_normalize(
        ev, state, "value", group_cols=["event_type"])
    equi = qr.select(
        "event_type", "value",
        F.lit("equidepth").alias("method"),
        equidepth_bucket(F.col("q_rank"), B).alias("bucket"))

    vi = F.round(F.col("value") * 10000).cast("long")
    bounds = ev.groupBy("event_type").agg(
        F.min(F.round(F.col("value") * 10000).cast("long")).alias("__vmin"),
        F.max(F.round(F.col("value") * 10000).cast("long")).alias("__vmax"))
    fixed = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", "value",
                F.lit("fixedwidth").alias("method"),
                fixed_width_bucket_micro(
                    vi, F.col("__vmin"), F.col("__vmax"), B).alias("bucket")))

    per_bucket = (
        equi.unionByName(fixed)
        .groupBy("event_type", "method", "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.min("value"), 4).alias("v_lo"),
             F.round(F.max("value"), 4).alias("v_hi")))
    totals = per_bucket.groupBy("event_type", "method").agg(
        F.sum("n_rows").alias("__total"))
    num = (F.col("n_rows") * B).cast("long")
    den = F.col("__total").cast("long")
    a = 20000 * num + den
    ratio = (((a - F.pmod(a, 2 * den)) / (2 * den))
             .cast("long").cast("double") / 10000)
    return (
        per_bucket.join(F.broadcast(totals), ["event_type", "method"])
        .select("event_type", "method", "bucket", "n_rows", "v_lo", "v_hi",
                ratio.alias("depth_ratio"))
        )


def _oracle_range_layout() -> str:
    from hbase_snapshotter_spark.operators.sketches import DD_LN_GAMMA

    B = RANGE_LAYOUT_B
    return f"""
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(CEIL(ROUND(LN(value) / {repr(DD_LN_GAMMA)}, 6)) AS BIGINT)
           AS bucket
  FROM events WHERE value IS NOT NULL AND value > 0),
b AS (SELECT event_type, bucket, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
c AS (SELECT event_type, bucket, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM b),
equi AS (
  SELECT v.event_type, v.value, 'equidepth' AS method,
         LEAST((CAST(ROUND(CAST((20000 * (2 * c.below + c.cnt) + 2 * c.n)
                   // (2 * 2 * c.n) AS DOUBLE) / 10000 * 10000) AS BIGINT)
                * {B}) // 10000, {B - 1}) AS bucket
  FROM v JOIN c ON c.event_type = v.event_type AND c.bucket = v.bucket),
mic AS (SELECT event_type, value,
               CAST(ROUND(value * 10000) AS BIGINT) AS vi FROM v),
bnd AS (SELECT event_type, MIN(vi) AS vmin, MAX(vi) AS vmax
        FROM mic GROUP BY event_type),
fixedw AS (
  SELECT mic.event_type, mic.value, 'fixedwidth' AS method,
         ((mic.vi - bnd.vmin) * {B}) // (bnd.vmax - bnd.vmin + 1) AS bucket
  FROM mic JOIN bnd USING (event_type)),
lanes AS (SELECT * FROM equi UNION ALL SELECT * FROM fixedw),
pb AS (
  SELECT event_type, method, bucket, COUNT(*) AS n_rows,
         ROUND(MIN(value), 4) AS v_lo, ROUND(MAX(value), 4) AS v_hi
  FROM lanes GROUP BY 1, 2, 3),
t AS (SELECT event_type, method, SUM(n_rows) AS total
      FROM pb GROUP BY 1, 2)
SELECT pb.event_type, pb.method, pb.bucket, pb.n_rows, pb.v_lo, pb.v_hi,
       CAST((20000 * pb.n_rows * {B} + t.total)
            // (2 * t.total) AS DOUBLE) / 10000 AS depth_ratio
FROM pb JOIN t USING (event_type, method)
ORDER BY pb.event_type, pb.method, pb.bucket
"""


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time bars over the event stream (N87): per (event_type,
    30-min bucket) the open/high/low/close with count and exact sum —
    open/close deterministic under timestamp ties via the
    struct-ordering pick (ts, event_id, value).  The oracle replays
    the pick as row-number-1 in both directions."""
    from hbase_snapshotter_spark.operators.timeseries import ohlc_bars

    ev = read_table(spark, sf_dir, "events") \
        .select("event_id", "event_type", "ts", "value")
    return ohlc_bars(
        ev, ts_col="ts", value_col="value", group_cols=["event_type"],
        bucket_ms=RESAMPLE_BUCKET_MS, id_col="event_id")


def _oracle_ohlc_bars() -> str:
    W = RESAMPLE_BUCKET_MS
    return f"""
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(epoch_ms(ts) / {W}) AS BIGINT) * {W} AS bucket,
         epoch_ms(ts) AS t, event_id, CAST(value AS DOUBLE) AS val,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                            CAST(FLOOR(epoch_ms(ts) / {W}) AS BIGINT)
                            ORDER BY epoch_ms(ts), event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                            CAST(FLOOR(epoch_ms(ts) / {W}) AS BIGINT)
                            ORDER BY epoch_ms(ts) DESC, event_id DESC)
           AS rn_d
  FROM events WHERE value IS NOT NULL)
SELECT event_type, bucket,
       ROUND(MAX(CASE WHEN rn_a = 1 THEN val END), 4) AS open,
       ROUND(MAX(val), 4) AS high,
       ROUND(MIN(val), 4) AS low,
       ROUND(MAX(CASE WHEN rn_d = 1 THEN val END), 4) AS close,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(val * 10000) AS BIGINT)) AS DOUBLE) / 10000
         AS sum_value
FROM v GROUP BY 1, 2
ORDER BY event_type, bucket
"""


PAIRS.update({
    "events_ohlc_bars": (events_ohlc_bars, _oracle_ohlc_bars()),
})


TOPK_STATE_K = 5


def events_topk_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-group top-k (N88): the top-5 event values per
    type materialized at the mid-month snapshot, advanced to "now"
    with only the post-snapshot INSERT delta — monotone, so the
    advanced state must equal the full rebuild, and that equality
    rides in-hash as ``advance_consistent`` (sentinel row included).
    The oracle replays the full rebuild's row-number pick."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.timeseries import (
        advance_topk_state,
        topk_state,
    )
    from hbase_snapshotter_spark.queries.snapshot_q import SNAPSHOT_TS_MS

    kw = dict(group_cols=["event_type"], id_col="event_id",
              score_col="value", k=TOPK_STATE_K)
    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("__ms", F.unix_millis("ts")))
    cols = ["event_id", "event_type", "value"]
    prior = topk_state(ev.filter(F.col("__ms") <= SNAPSHOT_TS_MS)
                       .select(*cols), **kw)
    delta = ev.filter(F.col("__ms") > SNAPSHOT_TS_MS).select(*cols)
    advanced = scoped_persist(advance_topk_state(prior, delta, **kw))

    out_cols = ["event_type", "rank", "event_id", "value"]
    from hbase_snapshotter_spark.queries.gating import audit_enabled, null_flag
    if audit_enabled(sf_dir):
        full = topk_state(ev.select(*cols), **kw)
        sym = advanced.select(*out_cols) \
            .exceptAll(full.select(*out_cols)) \
            .unionByName(full.select(*out_cols)
                         .exceptAll(advanced.select(*out_cols)))
        flag = sym.agg(
            (F.count(F.lit(1)) == 0).alias("advance_consistent"))
    else:  # production/bench: the advanced state alone
        flag = spark.range(1).select(null_flag("advance_consistent"))
    sentinel = flag.select(
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        "advance_consistent")
    return (advanced.select(*out_cols)
            .crossJoin(F.broadcast(flag)).unionByName(sentinel)
            )


def _oracle_topk_advance() -> str:
    return f"""
WITH r AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events WHERE value IS NOT NULL)
SELECT event_type, CAST(rank AS INTEGER) AS rank, event_id, value,
       TRUE AS advance_consistent
FROM r WHERE rank <= {TOPK_STATE_K}
UNION ALL
SELECT CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), TRUE
ORDER BY event_type, rank
"""


PAIRS.update({
    "events_topk_advance": (events_topk_advance, _oracle_topk_advance()),
})


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (N91): over each
    user's (ts, event_id)-ordered event sequence, the count and
    exact-permille probability of every consecutive (from → to) state
    pair — the Markov-chain path summary the funnel hard-codes one
    path of.  Oracle replays the per-user lag and the integer
    arithmetic."""
    from hbase_snapshotter_spark.operators.timeseries import (
        transition_matrix,
    )

    ev = read_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "event_type", "ts")
    return transition_matrix(
        ev, key_col="user_id", state_col="event_type", ts_col="ts",
        id_col="event_id")


def _oracle_transition_matrix() -> str:
    return """
WITH s AS (
  SELECT user_id, event_type AS to_state,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id)
           AS from_state
  FROM events),
p AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM s WHERE from_state IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_state, SUM(n_transitions) AS row_total
      FROM p GROUP BY from_state)
SELECT p.from_state, p.to_state, p.n_transitions,
       CAST((2000 * p.n_transitions + t.row_total)
            // (2 * t.row_total) AS BIGINT) AS prob_permille
FROM p JOIN t USING (from_state)
ORDER BY p.from_state, p.to_state
"""


PATHS_STEPS, PATHS_K = 3, 20


def event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent 3-step event paths (N92): the "top user
    journeys" product-analytics view; the transition matrix (N91) is
    its 2-step marginal.  Deterministic tie-break (count desc, then
    path) so the limit is engine-stable; oracle replays the double
    lead and the ordered limit."""
    from hbase_snapshotter_spark.operators.timeseries import top_paths

    ev = read_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "event_type", "ts")
    return top_paths(
        ev, key_col="user_id", state_col="event_type", ts_col="ts",
        id_col="event_id", steps=PATHS_STEPS, k=PATHS_K)


def _oracle_top_paths() -> str:
    return f"""
WITH s AS (
  SELECT event_type AS step_1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id)
           AS step_2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id)
           AS step_3
  FROM events)
SELECT step_1, step_2, step_3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM s WHERE step_3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, step_1, step_2, step_3
LIMIT {PATHS_K}
"""


SESSION_GAP_MS = 30 * 60 * 1000


def event_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization economics (N93): sessions split at 30-min
    inactivity gaps per user (gaps-and-islands running sum), reduced
    to one row — session count, bounce permille, mean events per
    session, mean span.  The streaming suite's session window
    aggregates WITHIN sessions; this is the cross-session distribution.
    Oracle replays the lag, the running sum, and the exact-integer
    means."""
    from hbase_snapshotter_spark.operators.timeseries import session_stats

    ev = read_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts")
    return session_stats(ev, key_col="user_id", ts_col="ts",
                         id_col="event_id", gap_ms=SESSION_GAP_MS)


def _oracle_session_stats() -> str:
    G = SESSION_GAP_MS
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id) AS prev
  FROM events),
o AS (
  SELECT user_id, event_id, ms,
         CASE WHEN prev IS NULL OR ms - prev > {G} THEN 1 ELSE 0 END
           AS opens
  FROM e),
sid AS (
  SELECT user_id, ms,
         SUM(opens) OVER (PARTITION BY user_id ORDER BY ms, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
  FROM o),
sess AS (
  SELECT user_id, s, CAST(COUNT(*) AS BIGINT) AS n,
         MAX(ms) - MIN(ms) AS span_ms
  FROM sid GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST((2000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS bounce_permille,
       CAST((20000 * SUM(n) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / 10000 AS avg_events_per_session,
       CAST((20000 * SUM(span_ms) + COUNT(*) * 1000)
            // (2 * COUNT(*) * 1000) AS DOUBLE) / 10000 AS avg_span_s
FROM sess
"""


#: Lane specs for the r10 event_sequence_suite fold (VERDICT r9
#: task 2): Markov transitions, top user journeys, sessionization
#: economics.
_TRANSITION_COLS = [
    ("from_state", "VARCHAR"), ("to_state", "VARCHAR"),
    ("n_transitions", "BIGINT"), ("prob_permille", "BIGINT"),
]
_PATHS_COLS = [
    ("step_1", "VARCHAR"), ("step_2", "VARCHAR"), ("step_3", "VARCHAR"),
    ("n_paths", "BIGINT"),
]
_SESSION_COLS = [
    ("n_sessions", "BIGINT"), ("bounce_permille", "BIGINT"),
    ("avg_events_per_session", "DOUBLE"), ("avg_span_s", "DOUBLE"),
]


def event_sequence_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence suite — N91 + N92 + N93 as lanes of ONE recorded
    key (r10 merge of the former standalone ``event_transition_matrix``,
    ``event_top_paths`` and ``event_session_stats`` rows): the
    first-order transition matrix, the top-20 3-step journeys, and the
    gaps-and-islands sessionization economics.  Row-disjoint lanes
    with typed NULL padding; each keeps its standalone oracle inside
    the UNION ALL."""
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("transitions", event_transition_matrix(spark, sf_dir),
         _TRANSITION_COLS),
        ("top_paths", event_top_paths(spark, sf_dir), _PATHS_COLS),
        ("sessions", event_session_stats(spark, sf_dir), _SESSION_COLS),
    ])


def _oracle_event_sequence_suite() -> str:
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("transitions", _oracle_transition_matrix(), _TRANSITION_COLS),
        ("top_paths", _oracle_top_paths(), _PATHS_COLS),
        ("sessions", _oracle_session_stats(), _SESSION_COLS),
    ])


PAIRS.update({
    "event_sequence_suite": (event_sequence_suite,
                             _oracle_event_sequence_suite()),
})


#: N96 funnel patterns: "did FROM then eventually TO within a visit",
#: over 6-hour-gap-chained runs (30-min sessions are near-singleton on
#: the fixture's event density; 6 h gives ~200 matches/pattern at
#: sf0.01 — real signal, still session-bounded).
FUNNEL_PATTERNS = [("view", "purchase"), ("click", "purchase"),
                   ("signup", "error")]
FUNNEL_GAP_MS = 6 * 3600 * 1000


def event_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite predicate paths (N96): for each funnel
    pattern, the greedy non-overlapping ``FROM (ANY)* TO`` matches
    within ≤-gap-chained event runs, aggregated to the dashboard row —
    match count, distinct converting users, micro-exact 4-dp mean
    time-to-convert and mean events between.  N91/N92 count
    fixed-length windows; this is the predicate form ("A then
    eventually C within a visit") product analytics actually asks.
    The oracle replays the whole state machine — sessionization, the
    per-pattern filtered run collapse, greedy match closure at
    TO-after-FROM, and first-of-run binding."""
    from hbase_snapshotter_spark.operators.timeseries import pattern_matches

    ev = read_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "event_type", "ts")
    m = pattern_matches(
        ev, key_col="user_id", state_col="event_type", ts_col="ts",
        id_col="event_id", patterns=FUNNEL_PATTERNS, gap_ms=FUNNEL_GAP_MS)

    def round4(num, den):
        a = 20000 * num + den
        return (((a - F.pmod(a, 2 * den)) / (2 * den))
                .cast("long").cast("double") / 10000)

    n = F.count(F.lit(1)).cast("long")
    return (m.groupBy("from_state", "to_state").agg(
        n.alias("n_matches"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        round4(F.sum("duration_ms").cast("long"), n * 1000)
        .alias("avg_duration_s"),
        round4(F.sum("steps_between").cast("long"), n)
        .alias("avg_steps_between"))
        )


def _oracle_pattern_funnel() -> str:
    G = FUNNEL_GAP_MS
    vals = ", ".join(f"('{f}', '{t}')" for f, t in FUNNEL_PATTERNS)
    return f"""
WITH pat AS (SELECT * FROM (VALUES {vals}) AS p(f, t)),
e AS (SELECT user_id AS k, event_type AS s, epoch_ms(ts) AS ms,
             event_id AS eid FROM events),
b AS (SELECT k, s, ms, eid,
        CASE WHEN LAG(ms) OVER w IS NULL OR ms - LAG(ms) OVER w > {G}
             THEN 1 ELSE 0 END AS op,
        ROW_NUMBER() OVER w AS pos
      FROM e WINDOW w AS (PARTITION BY k ORDER BY ms, eid)),
sb AS (SELECT *, SUM(op) OVER (PARTITION BY k ORDER BY ms, eid
                               ROWS UNBOUNDED PRECEDING) AS sid FROM b),
f AS (SELECT pat.f, pat.t, sb.* FROM sb
      JOIN pat ON sb.s IN (pat.f, pat.t)),
r AS (SELECT *, LAG(s) OVER wf AS prev_s,
        CASE WHEN LAG(s) OVER wf IS NULL OR LAG(s) OVER wf <> s
             THEN 1 ELSE 0 END AS chg
      FROM f WINDOW wf AS (PARTITION BY f, t, k, sid ORDER BY pos)),
r2 AS (SELECT *, SUM(chg) OVER (PARTITION BY f, t, k, sid ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS run FROM r),
runs AS (SELECT f, t, k, sid, run, MIN(ms) AS run_ms, MIN(pos) AS run_pos
         FROM r2 GROUP BY 1, 2, 3, 4, 5),
m AS (SELECT r2.f, r2.t, r2.k, r2.ms - runs.run_ms AS dur_ms,
             r2.pos - runs.run_pos - 1 AS steps
      FROM r2 JOIN runs ON runs.f = r2.f AND runs.t = r2.t
                       AND runs.k = r2.k AND runs.sid = r2.sid
                       AND runs.run = r2.run - r2.chg
      WHERE r2.s = r2.t AND r2.prev_s = r2.f)
SELECT f AS from_state, t AS to_state,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_users,
       CAST((20000 * SUM(dur_ms) + COUNT(*) * 1000)
            // (2 * COUNT(*) * 1000) AS DOUBLE) / 10000 AS avg_duration_s,
       CAST((20000 * SUM(steps) + COUNT(*))
            // (2 * COUNT(*)) AS DOUBLE) / 10000 AS avg_steps_between
FROM m GROUP BY 1, 2
ORDER BY from_state, to_state
"""


def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution (N102): purchases credited to prior
    view/click touches within the same 30-min-gap session under
    first-touch, last-touch, and linear rules; touchless conversions
    credit 'direct'.  Linear shares are exact half-up micros so both
    engines sum identically.  Oracle replays sessionization, the
    session-scoped before-join, and all three rules."""
    from hbase_snapshotter_spark.operators.timeseries import (
        session_attribution,
    )

    ev = read_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts", "event_type")
    return session_attribution(
        ev, key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type", conversion_type="purchase",
        touch_types=["view", "click"], gap_ms=SESSION_GAP_MS)


def _oracle_attribution() -> str:
    G = SESSION_GAP_MS
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
         LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id) AS prev
  FROM events),
sid AS (
  SELECT user_id, event_id, event_type, ms,
         SUM(CASE WHEN prev IS NULL OR ms - prev > {G} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ms, event_id
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM e),
conv AS (SELECT user_id, s, event_id AS conv_id, ms AS conv_ms
         FROM sid WHERE event_type = 'purchase'),
touch AS (SELECT user_id, s, event_id AS t_id, ms AS t_ms,
                 event_type AS channel
          FROM sid WHERE event_type IN ('view', 'click')),
j AS (
  SELECT c.user_id, c.s, c.conv_id, t.t_id, t.t_ms, t.channel
  FROM conv c LEFT JOIN touch t
    ON c.user_id = t.user_id AND c.s = t.s
   AND (t.t_ms < c.conv_ms
        OR (t.t_ms = c.conv_ms AND t.t_id < c.conv_id))),
jn AS (
  SELECT *, COUNT(t_id) OVER (PARTITION BY user_id, s, conv_id) AS n
  FROM j),
lin AS (
  SELECT COALESCE(channel, 'direct') AS channel, conv_id,
         CASE WHEN t_id IS NULL THEN CAST(1000000 AS BIGINT)
              ELSE (2000000 + n) // (2 * n) END AS credit
  FROM jn),
rk AS (
  SELECT user_id, s, conv_id, channel,
         ROW_NUMBER() OVER (PARTITION BY user_id, s, conv_id
                            ORDER BY t_ms, t_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, s, conv_id
                            ORDER BY t_ms DESC, t_id DESC) AS rn_d
  FROM jn WHERE t_id IS NOT NULL),
fst AS (SELECT c.conv_id, COALESCE(r.channel, 'direct') AS channel
        FROM conv c LEFT JOIN (SELECT conv_id, channel FROM rk
                               WHERE rn_a = 1) r USING (conv_id)),
lst AS (SELECT c.conv_id, COALESCE(r.channel, 'direct') AS channel
        FROM conv c LEFT JOIN (SELECT conv_id, channel FROM rk
                               WHERE rn_d = 1) r USING (conv_id))
SELECT 'first_touch' AS rule, channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(COUNT(*) * 1000000 AS BIGINT) AS credit_micros
FROM fst GROUP BY channel
UNION ALL
SELECT 'last_touch', channel, CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) * 1000000 AS BIGINT)
FROM lst GROUP BY channel
UNION ALL
SELECT 'linear', channel,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT),
       CAST(SUM(credit) AS BIGINT)
FROM lin GROUP BY channel
"""


#: Lane specs for the r10 event_funnel_suite fold (VERDICT r9 task 2):
#: MATCH_RECOGNIZE-lite predicate paths, multi-touch attribution, and
#: signup-cohort retention.
_PATTERN_COLS = [
    ("from_state", "VARCHAR"), ("to_state", "VARCHAR"),
    ("n_matches", "BIGINT"), ("n_users", "BIGINT"),
    ("avg_duration_s", "DOUBLE"), ("avg_steps_between", "DOUBLE"),
]
_ATTRIB_COLS = [
    ("rule", "VARCHAR"), ("channel", "VARCHAR"),
    ("n_conversions", "BIGINT"), ("credit_micros", "BIGINT"),
]
_COHORT_COLS = [
    ("cohort_week", "TIMESTAMP"), ("week", "TIMESTAMP"),
    ("active_users", "BIGINT"), ("converted_active", "BIGINT"),
]


def event_funnel_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel suite — N96 + attribution + cohort retention as lanes of
    ONE recorded key (r10 merge of the former standalone
    ``event_pattern_funnel``, ``event_attribution`` and
    ``funnel_cohort_retention`` rows): greedy non-overlapping pattern
    matches, first/last/linear multi-touch credit, and signup-cohort
    weekly retention.  Row-disjoint lanes with typed NULL padding;
    each keeps its standalone oracle inside the UNION ALL."""
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("pattern_funnel", event_pattern_funnel(spark, sf_dir),
         _PATTERN_COLS),
        ("attribution", event_attribution(spark, sf_dir), _ATTRIB_COLS),
        ("cohort_retention", funnel_cohort_retention(spark, sf_dir),
         _COHORT_COLS),
    ])


def _oracle_event_funnel_suite() -> str:
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("pattern_funnel", _oracle_pattern_funnel(), _PATTERN_COLS),
        ("attribution", _oracle_attribution(), _ATTRIB_COLS),
        ("cohort_retention", ORACLE_FUNNEL_COHORT, _COHORT_COLS),
    ])


PAIRS.update({
    "event_funnel_suite": (event_funnel_suite,
                           _oracle_event_funnel_suite()),
})


def compaction_plan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (N104): the file inventory is the
    deterministic (source, lang) layout of the documents table — one
    "file" per cell, sized by its text bytes, partitioned by source —
    planned to 2 files per partition.  Healthy files keep; small files
    bin by the cumulative-offset rule.  Every byte count, target,
    group id, and fill permille is exact integer arithmetic the oracle
    replays."""
    from hbase_snapshotter_spark.operators.layout import compaction_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inv = (docs.groupBy("source", "lang")
           .agg(F.sum("n_chars").cast("bigint").alias("size_bytes"))
           .select("source", F.col("lang").alias("file_id"), "size_bytes"))
    return compaction_plan(inv, partition_col="source",
                           files_target=2)


def _oracle_compaction_plan() -> str:
    return """
WITH inv AS (
  SELECT source, lang AS file_id,
         CAST(SUM(n_chars) AS BIGINT) AS size_bytes
  FROM documents GROUP BY 1, 2),
t AS (
  SELECT source, (SUM(size_bytes) + 1) // 2 AS target
  FROM inv GROUP BY 1),
base AS (
  SELECT inv.*, t.target,
         CASE WHEN size_bytes >= target THEN 'keep'
              ELSE 'compact' END AS action
  FROM inv JOIN t USING (source)),
cpt AS (
  SELECT *, COALESCE(SUM(size_bytes) OVER (
              PARTITION BY source ORDER BY size_bytes DESC, file_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_before
  FROM base WHERE action = 'compact'),
grp AS (SELECT *, cum_before // target AS group_id FROM cpt),
econ AS (
  SELECT source, group_id, CAST(COUNT(*) AS BIGINT) AS group_files,
         CAST(SUM(size_bytes) AS BIGINT) AS group_bytes
  FROM grp GROUP BY 1, 2)
SELECT g.source, g.file_id, g.size_bytes,
       CAST(g.target AS BIGINT) AS target_bytes, g.action,
       CAST(g.group_id AS BIGINT) AS group_id, e.group_files,
       e.group_bytes,
       CAST((2000 * e.group_bytes + g.target) // (2 * g.target)
            AS BIGINT) AS fill_permille
FROM grp g JOIN econ e USING (source, group_id)
UNION ALL
SELECT source, file_id, size_bytes, CAST(target AS BIGINT), action,
       CAST(NULL AS BIGINT), CAST(1 AS BIGINT), size_bytes,
       CAST((2000 * size_bytes + target) // (2 * target) AS BIGINT)
FROM base WHERE action = 'keep'
"""


#: Re-sharding audit geometry: the pruned-state layouts in this engine
#: default to small power-of-two bucket counts; 8 -> 9 is the minimal
#: grow step and makes the modulo-vs-rendezvous asymmetry starkest.
REBALANCE_BEFORE, REBALANCE_AFTER = 8, 9


def shard_rebalance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-sharding cost audit (N108): scaling a hash-sharded layout
    8 → 9 shards moves ~8/9 of all rows under the modulo scheme the
    engine's state layouts use, but only ~1/9 — and only ONTO the new
    shard — under rendezvous hashing.  Exact counts + half-up permille
    + the HRW stability invariant, all oracle-replayed (md5 argmax via
    a ranked explode in SQL)."""
    from hbase_snapshotter_spark.operators.dedup import spread
    from hbase_snapshotter_spark.operators.layout import (
        shard_rebalance_audit,
    )

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return shard_rebalance_audit(
        docs.select("doc_id"), "doc_id",
        n_before=REBALANCE_BEFORE, n_after=REBALANCE_AFTER)


def _oracle_shard_rebalance() -> str:
    nb, na = REBALANCE_BEFORE, REBALANCE_AFTER
    vals_b = ", ".join(f"({s})" for s in range(nb))
    vals_a = ", ".join(f"({s})" for s in range(na))
    return f"""
WITH k AS (SELECT CAST(doc_id AS VARCHAR) AS key FROM documents),
hrw_b AS (
  SELECT key, s FROM (
    SELECT key, s, ROW_NUMBER() OVER (
      PARTITION BY key
      ORDER BY md5(key || '|' || CAST(s AS VARCHAR)) DESC, s DESC) AS rn
    FROM k, (VALUES {vals_b}) t(s)) WHERE rn = 1),
hrw_a AS (
  SELECT key, s FROM (
    SELECT key, s, ROW_NUMBER() OVER (
      PARTITION BY key
      ORDER BY md5(key || '|' || CAST(s AS VARCHAR)) DESC, s DESC) AS rn
    FROM k, (VALUES {vals_a}) t(s)) WHERE rn = 1),
base AS (
  SELECT k.key,
         CAST('0x' || substr(md5(k.key), 1, 8) AS BIGINT) % {nb} AS mb,
         CAST('0x' || substr(md5(k.key), 1, 8) AS BIGINT) % {na} AS ma,
         b.s AS hb, a.s AS ha
  FROM k JOIN hrw_b b USING (key) JOIN hrw_a a USING (key))
SELECT 'modulo' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN mb <> ma THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved,
       CAST((2000 * SUM(CASE WHEN mb <> ma THEN 1 ELSE 0 END)
             + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS moved_permille,
       BOOL_AND(mb = ma OR ma >= {nb}) AS moves_only_to_new_shards
FROM base
UNION ALL
SELECT 'rendezvous', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN hb <> ha THEN 1 ELSE 0 END) AS BIGINT),
       CAST((2000 * SUM(CASE WHEN hb <> ha THEN 1 ELSE 0 END)
             + COUNT(*)) // (2 * COUNT(*)) AS BIGINT),
       BOOL_AND(hb = ha OR ha >= {nb})
FROM base
"""


#: Zone-map pruning predicates (N124): day-file layout over the
#: fixture's 30-day event span — the file-correlated predicate skips
#: ~90% of files, the uncorrelated value band skips ~none (the
#: classic lesson that motivates the z-order lane), and the high tail
#: exercises all-file skips where the fixture's value range allows.
ZONE_MAP_PREDICATES = [
    ("scan_3_days", "file_day", 19733.0, 19735.0),
    ("value_band", "value", 100.0, 120.0),
    ("value_high_tail", "value", 500.0, 10000.0),
]


def zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping audit (N124): per-day "files" over the
    events table carry (min, max) statistics for the probed columns;
    each range predicate scans a file iff its span intersects — files
    scanned/skipped exactly, plus the soundness invariant
    (``no_false_skips``: every matching row lives in a scanned file)
    computed from the data.  The oracle replays the zone map, the
    intersection rule, the half-up skip permille, and the exact
    verification."""
    from hbase_snapshotter_spark.operators.layout import (
        zone_map_pruning_audit,
    )
    from hbase_snapshotter_spark.operators.timeseries import time_bucket

    ev = read_table(spark, sf_dir, "events").select(
        (time_bucket("ts", 86_400_000) / 86_400_000).cast("long")
        .alias("file_day"), "value")
    return zone_map_pruning_audit(ev, "file_day", ZONE_MAP_PREDICATES)


def _oracle_zone_map() -> str:
    vals = ", ".join(f"('{p}', '{c}', {lo}, {hi})"
                     for p, c, lo, hi in ZONE_MAP_PREDICATES)
    return f"""
WITH ev AS (
  SELECT epoch_ms(ts) // 86400000 AS file_day,
         CAST(value AS DOUBLE) AS value
  FROM events),
zm AS (
  SELECT file_day,
         CAST(MIN(file_day) AS DOUBLE) AS mn_file_day,
         CAST(MAX(file_day) AS DOUBLE) AS mx_file_day,
         MIN(value) AS mn_value, MAX(value) AS mx_value
  FROM ev GROUP BY 1),
preds(pred, col, lo, hi) AS (VALUES {vals}),
verdict AS (
  SELECT p.pred, p.col, p.lo, p.hi, z.file_day,
         CASE WHEN p.col = 'file_day'
              THEN z.mx_file_day >= p.lo AND z.mn_file_day <= p.hi
              ELSE z.mx_value >= p.lo AND z.mn_value <= p.hi END
           AS scanned
  FROM preds p, zm z),
matched AS (
  SELECT p.pred, e.file_day, CAST(COUNT(*) AS BIGINT) AS m
  FROM preds p JOIN ev e
    ON (CASE WHEN p.col = 'file_day' THEN CAST(e.file_day AS DOUBLE)
             ELSE e.value END) BETWEEN p.lo AND p.hi
  GROUP BY 1, 2)
SELECT v.pred, v.col, v.lo, v.hi,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN v.scanned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_scanned,
       CAST(SUM(CASE WHEN v.scanned THEN 0 ELSE 1 END) AS BIGINT)
         AS n_skipped,
       CAST((2000 * SUM(CASE WHEN v.scanned THEN 0 ELSE 1 END)
             + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS skip_permille,
       CAST(COALESCE(SUM(m.m), 0) AS BIGINT) AS n_rows_matched,
       COALESCE(SUM(CASE WHEN NOT v.scanned THEN m.m END), 0) = 0
         AS no_false_skips
FROM verdict v
LEFT JOIN matched m ON m.pred = v.pred AND m.file_day = v.file_day
GROUP BY 1, 2, 3, 4
"""


#: N128 zone-map maintenance constants: rows with value ≥ ZM_DELETE_LO
#: are purged (an outlier/PII scrub — exactly the delete pattern that
#: leaves file statistics stale), and the skip predicate probes the
#: band the purge grazed, where stale stats over-scan and re-tightened
#: stats prune again.
ZM_DELETE_LO = 250.0
ZM_SKIP_LO, ZM_SKIP_HI = 240.0, 1e9


def zone_map_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental zone-map maintenance (N128): per-day file
    statistics over the events table, built at the mid-month snapshot,
    ADVANCED with only the post-snapshot appends (losslessly mergeable
    — counts sum, min/max narrow), then RETRACTED for a deterministic
    outlier purge (``value ≥ 250``): counts decrement exactly, min/max
    cannot tighten without rereading, so touched files go
    ``tight = false`` — the Iceberg/Delta stale-but-sound delete
    posture.  ``retighten_zone_map`` then rebuilds ONLY the stale
    files (broadcast-semi-join-pruned), and the two skip summaries
    quantify what staleness costs: the stale map over-scans the purged
    band, the re-tightened map prunes it again (soundness holds in
    both — stale stats can only over-scan).

    The audit flags (advance ≡ append-only rebuild, retighten ≡
    post-delete rebuild, data-derived soundness of the stale map) are
    fixture-gated (``gating.audit_enabled``): the registered
    production plan is build → advance → retract → pruned-retighten +
    two file-stats-sized skip summaries, with NULL flags."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.layout import (
        advance_zone_map,
        retighten_zone_map,
        retract_zone_map,
        zone_map_skip_stats,
        zone_map_state,
    )
    from hbase_snapshotter_spark.operators.timeseries import time_bucket
    from hbase_snapshotter_spark.queries.gating import (
        audit_enabled,
        null_flag,
    )
    from hbase_snapshotter_spark.queries.snapshot_q import SNAPSHOT_TS_MS

    # NULL stat values would be neither deletes (value >= lo is NULL)
    # nor survivors (~is_del is NULL) yet still count into n_rows —
    # drop them up front so the delete/survivor predicates PARTITION
    # exactly the rows the state counts (ADVICE r11)
    ev = scoped_persist(
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull()).select(
            (time_bucket("ts", 86_400_000) / 86_400_000).cast("long")
            .alias("file_day"), "value",
            (F.unix_millis("ts") <= SNAPSHOT_TS_MS).alias("__prior")))
    state = zone_map_state(ev.filter("__prior"), "file_day", "value")
    adv = advance_zone_map(state, ev.filter("NOT __prior"),
                           "file_day", "value")
    is_del = F.col("value") >= ZM_DELETE_LO
    stale = scoped_persist(retract_zone_map(adv, ev.filter(is_del),
                                            "file_day"))
    survivors = ev.filter(~is_del)
    tightened = scoped_persist(
        retighten_zone_map(stale, survivors, "file_day", "value"))

    sk_stale = zone_map_skip_stats(stale, ZM_SKIP_LO, ZM_SKIP_HI).select(
        F.col("n_scanned").alias("n_scanned_stale"),
        F.col("skip_permille").alias("skip_permille_stale"))
    sk_tight = zone_map_skip_stats(tightened, ZM_SKIP_LO, ZM_SKIP_HI)         .select(F.col("n_scanned").alias("n_scanned_tight"),
                F.col("skip_permille").alias("skip_permille_tight"))

    if audit_enabled(sf_dir):
        cols = ["file_id", "n_rows", "vmin", "vmax", "tight"]
        reb_append = zone_map_state(ev, "file_day", "value").select(*cols)
        sym_a = adv.select(*cols).exceptAll(reb_append) \
            .unionByName(reb_append.exceptAll(adv.select(*cols)))
        f_adv = sym_a.agg((F.count(F.lit(1)) == 0)
                          .alias("advance_equals_rebuild"))
        reb_del = zone_map_state(survivors, "file_day", "value") \
            .select(*cols)
        sym_t = tightened.select(*cols).exceptAll(reb_del) \
            .unionByName(reb_del.exceptAll(tightened.select(*cols)))
        f_ret = sym_t.agg((F.count(F.lit(1)) == 0)
                          .alias("retighten_equals_rebuild"))
        # data-derived soundness: every surviving row in the probed
        # band lives in a file the STALE map scans
        scanned = stale.filter((F.col("vmax") >= ZM_SKIP_LO)
                               & (F.col("vmin") <= ZM_SKIP_HI)) \
            .select("file_id")
        missed = (survivors
                  .filter(F.col("value").between(ZM_SKIP_LO, ZM_SKIP_HI))
                  .join(F.broadcast(scanned),
                        survivors["file_day"] == scanned["file_id"],
                        "left_anti"))
        f_snd = missed.agg((F.count(F.lit(1)) == 0)
                           .alias("sound_after_deletes"))
        flags = (F.broadcast(f_adv).crossJoin(F.broadcast(f_ret))
                 .crossJoin(F.broadcast(f_snd)))
    else:  # production/bench: the maintenance chain alone
        flags = spark.range(1).select(
            null_flag("advance_equals_rebuild"),
            null_flag("retighten_equals_rebuild"),
            null_flag("sound_after_deletes"))

    return (stale.select(
                F.col("file_id"), "n_rows", "vmin", "vmax", "tight")
            .crossJoin(F.broadcast(sk_stale))
            .crossJoin(F.broadcast(sk_tight))
            .crossJoin(F.broadcast(flags))
            )


def _oracle_zone_map_advance() -> str:
    return f"""
WITH ev AS (
  SELECT epoch_ms(ts) // 86400000 AS file_day,
         CAST(value AS DOUBLE) AS value
  FROM events WHERE value IS NOT NULL),
-- the stale map: min/max over ALL rows (deletes cannot tighten),
-- counts over survivors, tight iff the purge never touched the file
stale AS (
  SELECT file_day AS file_id,
         CAST(SUM(CASE WHEN value < {ZM_DELETE_LO} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rows,
         MIN(value) AS vmin, MAX(value) AS vmax,
         SUM(CASE WHEN value >= {ZM_DELETE_LO} THEN 1 ELSE 0 END) = 0
           AS tight
  FROM ev GROUP BY 1
  HAVING SUM(CASE WHEN value < {ZM_DELETE_LO} THEN 1 ELSE 0 END) > 0),
tightened AS (
  SELECT file_day AS file_id, MIN(value) AS vmin, MAX(value) AS vmax
  FROM ev WHERE value < {ZM_DELETE_LO} GROUP BY 1),
sks AS (
  SELECT CAST(SUM(CASE WHEN vmax >= {ZM_SKIP_LO}
                        AND vmin <= {ZM_SKIP_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned_stale,
         CAST((2000 * SUM(CASE WHEN vmax >= {ZM_SKIP_LO}
                                AND vmin <= {ZM_SKIP_HI}
                               THEN 0 ELSE 1 END) + COUNT(*))
              // (2 * COUNT(*)) AS BIGINT) AS skip_permille_stale
  FROM stale),
skt AS (
  SELECT CAST(SUM(CASE WHEN vmax >= {ZM_SKIP_LO}
                        AND vmin <= {ZM_SKIP_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned_tight,
         CAST((2000 * SUM(CASE WHEN vmax >= {ZM_SKIP_LO}
                                AND vmin <= {ZM_SKIP_HI}
                               THEN 0 ELSE 1 END) + COUNT(*))
              // (2 * COUNT(*)) AS BIGINT) AS skip_permille_tight
  FROM tightened)
SELECT s.file_id, s.n_rows, s.vmin, s.vmax, s.tight,
       sks.n_scanned_stale, sks.skip_permille_stale,
       skt.n_scanned_tight, skt.skip_permille_tight,
       TRUE AS advance_equals_rebuild,
       TRUE AS retighten_equals_rebuild,
       TRUE AS sound_after_deletes
FROM stale s, sks, skt
ORDER BY s.file_id
"""


_ZM_ADV_COLS = [
    ("file_id", "BIGINT"), ("n_rows", "BIGINT"), ("vmin", "DOUBLE"),
    ("vmax", "DOUBLE"), ("tight", "BOOLEAN"),
    ("n_scanned_stale", "BIGINT"), ("skip_permille_stale", "BIGINT"),
    ("n_scanned_tight", "BIGINT"), ("skip_permille_tight", "BIGINT"),
    ("advance_equals_rebuild", "BOOLEAN"),
    ("retighten_equals_rebuild", "BOOLEAN"),
    ("sound_after_deletes", "BOOLEAN"),
]


#: Lane specs for the r10 layout_audit_suite fold (VERDICT r9 task 2):
#: Z-order clustering audit, equi-depth-vs-fixed-width range layout,
#: small-file compaction planning, shard-rebalance migration cost.
_ZORDER_COLS = [
    ("zbucket", "BIGINT"), ("n_rows", "BIGINT"), ("o_lo", "BIGINT"),
    ("o_hi", "BIGINT"), ("p_lo", "BIGINT"), ("p_hi", "BIGINT"),
    ("hits_order_band", "BOOLEAN"), ("hits_part_band", "BOOLEAN"),
]
_RANGE_LAYOUT_COLS = [
    ("event_type", "VARCHAR"), ("method", "VARCHAR"),
    ("bucket", "BIGINT"), ("n_rows", "BIGINT"), ("v_lo", "DOUBLE"),
    ("v_hi", "DOUBLE"), ("depth_ratio", "DOUBLE"),
]
_COMPACTION_COLS = [
    ("source", "VARCHAR"), ("file_id", "VARCHAR"),
    ("size_bytes", "BIGINT"), ("target_bytes", "BIGINT"),
    ("action", "VARCHAR"), ("group_id", "BIGINT"),
    ("group_files", "BIGINT"), ("group_bytes", "BIGINT"),
    ("fill_permille", "BIGINT"),
]
_SHARD_COLS = [
    ("scheme", "VARCHAR"), ("n_rows", "BIGINT"), ("n_moved", "BIGINT"),
    ("moved_permille", "BIGINT"),
    ("moves_only_to_new_shards", "BOOLEAN"),
]
_ZONE_MAP_COLS = [
    ("pred", "VARCHAR"), ("col", "VARCHAR"), ("lo", "DOUBLE"),
    ("hi", "DOUBLE"), ("n_files", "BIGINT"), ("n_scanned", "BIGINT"),
    ("n_skipped", "BIGINT"), ("skip_permille", "BIGINT"),
    ("n_rows_matched", "BIGINT"), ("no_false_skips", "BOOLEAN"),
]


def layout_audit_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout suite — N103 + N74-layout + N104 + N105 as
    lanes of ONE recorded key (r10 merge of the former standalone
    ``zorder_layout_audit``, ``range_layout_audit``,
    ``compaction_plan_audit`` and ``shard_rebalance_stats`` rows): the
    table-layout planning/audit family.  Row-disjoint lanes with typed
    NULL padding; each keeps its standalone oracle inside the
    UNION ALL."""
    from hbase_snapshotter_spark.queries.relational import (
        zorder_layout_audit,
    )
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("zorder", zorder_layout_audit(spark, sf_dir), _ZORDER_COLS),
        ("range_layout", range_layout_audit(spark, sf_dir),
         _RANGE_LAYOUT_COLS),
        ("compaction", compaction_plan_audit(spark, sf_dir),
         _COMPACTION_COLS),
        ("shard_rebalance", shard_rebalance_stats(spark, sf_dir),
         _SHARD_COLS),
        ("zone_map", zone_map_pruning(spark, sf_dir), _ZONE_MAP_COLS),
        ("zone_advance", zone_map_advance(spark, sf_dir), _ZM_ADV_COLS),
    ])


def _oracle_layout_audit_suite() -> str:
    from hbase_snapshotter_spark.queries.relational import _oracle_zorder
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("zorder", _oracle_zorder(), _ZORDER_COLS),
        ("range_layout", _oracle_range_layout(), _RANGE_LAYOUT_COLS),
        ("compaction", _oracle_compaction_plan(), _COMPACTION_COLS),
        ("shard_rebalance", _oracle_shard_rebalance(), _SHARD_COLS),
        ("zone_map", _oracle_zone_map(), _ZONE_MAP_COLS),
        ("zone_advance", _oracle_zone_map_advance(), _ZM_ADV_COLS),
    ])


PAIRS.update({
    "layout_audit_suite": (layout_audit_suite,
                           _oracle_layout_audit_suite()),
})


def events_robust_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust center/scale audit (N112): exact median, MAD, and
    3-MAD outlier counts per event type over the value column — the
    estimator one corrupt reading cannot move, beside the mean/sigma
    rolling lane (N60) it complements.  Quadrupled fixed-point keeps
    every interpolation midpoint an exact integer in both engines."""
    from hbase_snapshotter_spark.operators.timeseries import (
        robust_center_scale,
    )

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    return robust_center_scale(ev, "value", group_cols=["event_type"])


ORACLE_ROBUST_CENTER = """
WITH base AS (
  SELECT event_type,
         CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) * 4 AS u
  FROM events),
med AS (
  SELECT event_type, CAST(quantile_cont(u, 0.5) AS BIGINT) AS med_x4
  FROM base GROUP BY 1),
dev AS (
  SELECT b.event_type, ABS(b.u - m.med_x4) AS d, m.med_x4
  FROM base b JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(quantile_cont(d, 0.5) AS BIGINT) AS mad_x4
  FROM dev GROUP BY 1),
outl AS (
  SELECT d.event_type,
         CAST(SUM(CASE WHEN d.d > 3 * m.mad_x4 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers
  FROM dev d JOIN mad m USING (event_type) GROUP BY 1)
SELECT e.event_type, m.n_rows, md.med_x4, m.mad_x4, o.n_outliers,
       CAST((2000 * o.n_outliers + m.n_rows) // (2 * m.n_rows)
            AS BIGINT) AS outlier_permille
FROM (SELECT DISTINCT event_type FROM events) e
JOIN med md USING (event_type) JOIN mad m USING (event_type)
JOIN outl o USING (event_type)
"""


#: Lane column specs for the r10 events_stats_suite fold (the
#: standalone keys rotated; the suite keeps all three driver-hashed
#: in one recorded slot — VERDICT r9 task 2).
_ROBUST_COLS = [
    ("event_type", "VARCHAR"), ("n_rows", "BIGINT"),
    ("med_x4", "BIGINT"), ("mad_x4", "BIGINT"),
    ("n_outliers", "BIGINT"), ("outlier_permille", "BIGINT"),
]


def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count trend per event type (N113): bucket events to days,
    count, and fit the exact-integer OLS line over (day_index, count)
    — slope and r² as rationals plus their correctly-rounded doubles.
    The oracle replays bucketing, moments, and both rationals."""
    from hbase_snapshotter_spark.operators.timeseries import (
        group_trend_ols,
        time_bucket,
    )

    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.timeseries import (
        advance_trend_state,
        trend_moments,
    )

    ev = read_table(spark, sf_dir, "events")
    day = (time_bucket("ts", 86_400_000) / 86_400_000).cast("long")
    daily = scoped_persist(
        ev.select("event_type", day.alias("day_idx"))
        .groupBy("event_type", "day_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    out = group_trend_ols(daily, "day_idx", "n_events",
                          group_cols=["event_type"])
    from hbase_snapshotter_spark.queries.gating import audit_enabled, null_flag
    if not audit_enabled(sf_dir):  # production/bench: the fit alone
        return out.crossJoin(F.broadcast(
            spark.range(1).select(null_flag("advance_consistent"))))
    # incremental-state lane: moments built on 3/4 of the DAYS (daily
    # rows split by day — disjoint, so the moment sums are exact),
    # advanced with the remaining days' rows, must equal the full
    # build — the N48/N65 sum-mergeable posture applied to regression
    is_delta = F.col("day_idx") % 4 == 0
    state = trend_moments(daily.filter(~is_delta), "day_idx", "n_events",
                          group_cols=["event_type"])
    adv = advance_trend_state(state, daily.filter(is_delta),
                              "day_idx", "n_events",
                              group_cols=["event_type"])
    full = trend_moments(daily, "day_idx", "n_events",
                         group_cols=["event_type"])
    n_diff = (adv.exceptAll(full).unionAll(full.exceptAll(adv))
              .agg(F.count(F.lit(1)).alias("__n")))
    return out.crossJoin(F.broadcast(n_diff.select(
        (F.col("__n") == 0).alias("advance_consistent"))))


ORACLE_TREND_OLS = """
WITH daily AS (
  SELECT event_type,
         epoch_ms(ts) // 86400000 AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(day_idx) AS sx, SUM(n_events) AS sy,
         SUM(day_idx * n_events) AS sxy,
         SUM(day_idx * day_idx) AS sxx,
         SUM(n_events * n_events) AS syy
  FROM daily GROUP BY 1)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS BIGINT)
         AS r2_num,
       CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS BIGINT)
         AS r2_den,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx), 6) END AS slope,
       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
         ROUND(CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS r_squared,
       TRUE AS advance_consistent
FROM m
"""


_TREND_COLS = [
    ("event_type", "VARCHAR"), ("n", "BIGINT"),
    ("slope_num", "BIGINT"), ("slope_den", "BIGINT"),
    ("r2_num", "BIGINT"), ("r2_den", "BIGINT"),
    ("slope", "DOUBLE"), ("r_squared", "DOUBLE"),
    ("advance_consistent", "BOOLEAN"),
]


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detection (N114) over the N59
    dense grid: per event type, slacked deviations from the
    first-week baseline accumulate via the reflection identity (two
    window running-sums + running-mins, pure integer arithmetic) and
    alarm past 8 slack units.  The oracle replays the grid, the
    warmup baseline, and both CUSUM sides bit-for-bit."""
    from hbase_snapshotter_spark.operators.timeseries import (
        cusum_drift,
        gap_fill,
        time_bucket_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    r = time_bucket_rollup(
        ev, "ts", "value", RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    grid = gap_fill(r, RESAMPLE_BUCKET_MS, group_cols=["event_type"])
    return cusum_drift(grid, group_cols=["event_type"])


def _oracle_cusum() -> str:
    return f"""
WITH gf AS ({_GAPFILL_CORE}),
vm AS (SELECT event_type, bucket,
              CAST(ROUND(v_lerp * 1000000, 0) AS BIGINT) AS vmv,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY bucket) AS rn
       FROM gf),
mu AS (SELECT event_type,
              CAST((2 * SUM(CASE WHEN rn <= 168 THEN vmv END)
                    + COUNT(CASE WHEN rn <= 168 THEN 1 END))
                   // (2 * COUNT(CASE WHEN rn <= 168 THEN 1 END))
                   AS BIGINT) AS mu0
       FROM vm GROUP BY 1),
d AS (SELECT v.event_type, v.bucket, v.vmv, m.mu0,
             GREATEST(1, m.mu0 // 20) AS k
      FROM vm v JOIN mu m USING (event_type)),
p AS (SELECT *,
             SUM(vmv - mu0 - k) OVER w AS pp,
             SUM(mu0 - vmv - k) OVER w AS pn
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING)),
s AS (SELECT *,
             pp - LEAST(0, MIN(pp) OVER w) AS s_pos,
             pn - LEAST(0, MIN(pn) OVER w) AS s_neg
      FROM p
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING))
SELECT event_type, bucket, CAST(vmv AS DOUBLE) / 1000000 AS v,
       mu0 AS mu0_micro,
       CAST(s_pos AS BIGINT) AS s_pos_micro,
       CAST(s_neg AS BIGINT) AS s_neg_micro,
       s_pos > 8 * k AS alarm_pos,
       s_neg > 8 * k AS alarm_neg
FROM s
ORDER BY event_type, bucket
"""


_CUSUM_COLS = [
    ("event_type", "VARCHAR"), ("bucket", "BIGINT"), ("v", "DOUBLE"),
    ("mu0_micro", "BIGINT"), ("s_pos_micro", "BIGINT"),
    ("s_neg_micro", "BIGINT"), ("alarm_pos", "BOOLEAN"),
    ("alarm_neg", "BOOLEAN"),
]


def events_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-statistics suite — N112 + N113 + N114 as lanes of ONE
    recorded key (r10 merge of the former standalone
    ``events_robust_center``, ``events_trend_ols`` and
    ``events_cusum_drift`` rows): the robust median/MAD outlier audit,
    the exact-integer daily-count OLS trend (with its
    advance≡rebuild moment-state flag), and the two-sided CUSUM
    change-point lane over the dense grid.  Lanes are row-disjoint
    with typed NULL padding; each keeps its standalone oracle inside
    the UNION ALL, so the driver hash still pins every lane's values
    bit-for-bit."""
    from hbase_snapshotter_spark.queries.suites import union_lanes

    return union_lanes([
        ("robust_center", events_robust_center(spark, sf_dir),
         _ROBUST_COLS),
        ("trend_ols", events_trend_ols(spark, sf_dir), _TREND_COLS),
        ("cusum_drift", events_cusum_drift(spark, sf_dir), _CUSUM_COLS),
    ])


def _oracle_events_stats_suite() -> str:
    from hbase_snapshotter_spark.queries.suites import union_lanes_sql

    return union_lanes_sql([
        ("robust_center", ORACLE_ROBUST_CENTER, _ROBUST_COLS),
        ("trend_ols", ORACLE_TREND_OLS, _TREND_COLS),
        ("cusum_drift", _oracle_cusum(), _CUSUM_COLS),
    ])


PAIRS.update({
    "events_stats_suite": (events_stats_suite,
                           _oracle_events_stats_suite()),
})


def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct counts from mergeable sketch state
    (N119): distinct users per trailing 7-day window, one row per
    observed day — the composition the materialized-sketch pattern
    exists for: distincts don't SUM across days, they UNION, so the
    per-day HLL states (KBs each) roll up into any window at
    state-read cost while the exact recount reads the corpus.

    In-hash evidence (the N48 convention — DuckDB cannot evaluate an
    HLL): the exact windowed distinct count (oracle-replayed) and the
    UNION-path estimate's 15% envelope against it.  Note the library
    reality: DataSketches' union target representation differs from a
    direct sketch at dense-mode cardinalities, so union-vs-direct is
    NOT bit-identical (measured at sf0.1) — the envelope against the
    exact count is the honest contract, and it holds through the
    union path, which is the only path production runs.

    Scale: the daily-state build is the one data-sized pass; the
    rolling union is days × 7 state rows; the exact lane is the
    fixture-scale audit, same posture as the join-size estimator's
    exact side."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.sketches import (
        distinct_sketches,
    )
    from hbase_snapshotter_spark.operators.timeseries import time_bucket

    ev = scoped_persist(
        read_table(spark, sf_dir, "events").select(
            (time_bucket("ts", 86_400_000) / 86_400_000).cast("long")
            .alias("d"), "user_id"))
    daily = scoped_persist(
        distinct_sketches(ev, "user_id", group_cols=["d"]))
    grid = daily.select(F.col("d").alias("e"))

    def windowed(df):
        return (df.withColumn("__off", F.explode(F.sequence(
                    F.lit(0), F.lit(6))))
                .withColumn("e", F.col("d") + F.col("__off"))
                .join(grid, "e", "left_semi"))

    rolled = (windowed(daily).groupBy("e")
              .agg(F.hll_union_agg("sketch").alias("sk"),
                   F.count(F.lit(1)).cast("long")
                   .alias("n_days_in_window")))
    est = F.hll_sketch_estimate("sk")
    from hbase_snapshotter_spark.queries.gating import audit_enabled, null_flag
    if not audit_enabled(sf_dir):
        # production shape (VERDICT r9 task 4): the rolling union over
        # per-day states is the ONLY data-derived stage — the ×7
        # exact windowed recount below is the fixture-scale audit the
        # sketch exists to replace, and it never enters this plan.
        # Same schema as the audited shape (ADVICE r10):
        # ``distinct_users`` carries the HLL estimate here and the
        # exact count at fixture sfs; the tolerance flag is NULL.
        return rolled.select(F.col("e").alias("window_end_day"),
                             "n_days_in_window",
                             F.round(est).cast("long")
                             .alias("distinct_users"),
                             null_flag("est_within_15pct"))
    exact = (windowed(ev).groupBy("e")
             .agg(F.count_distinct("user_id").cast("long")
                  .alias("distinct_users")))
    return (rolled.join(exact, "e")
            .select(F.col("e").alias("window_end_day"),
                    "n_days_in_window", "distinct_users",
                    (F.abs(est - F.col("distinct_users")) * 100
                     <= 15 * F.col("distinct_users"))
                    .alias("est_within_15pct")))


ORACLE_SLIDING_DISTINCT = """
WITH ev AS (
  SELECT epoch_ms(ts) // 86400000 AS d, user_id FROM events),
grid AS (SELECT DISTINCT d AS e FROM ev),
w AS (
  SELECT ev.d + o.o AS e, ev.d, ev.user_id
  FROM ev, (VALUES (0),(1),(2),(3),(4),(5),(6)) o(o)
  WHERE ev.d + o.o IN (SELECT e FROM grid))
SELECT e AS window_end_day,
       CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days_in_window,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
       TRUE AS est_within_15pct
FROM w GROUP BY e
"""


PAIRS.update({
    "events_sliding_distinct": (events_sliding_distinct,
                                ORACLE_SLIDING_DISTINCT),
})


def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence affinity (N120): for each unordered
    type pair, the users doing BOTH, each alone, the exact-permille
    Jaccard of the two user sets, and the independence lift
    ``n_both·N / (n_a·n_b)`` — basket analysis over behaviors, the
    ORDER-FREE complement of the transition matrix (N91 asks "what
    follows what"; this asks "which behaviors live in the same
    users").  Lift is the exact-integer rational as a correctly-
    rounded double (the collocation convention); Jaccard is half-up
    permille.

    Scale: one distinct (user, type) projection (map-side combined);
    the pair fan-out is per-user ``C(types,2)`` with types a small
    domain — bounded, no corpus self-join; aggregates are ≤ |types|²
    rows."""
    ev = read_table(spark, sf_dir, "events")
    ut = (ev.select("user_id", F.col("event_type").alias("t"))
          .distinct())
    from hbase_snapshotter_spark.cache import scoped_persist
    ut = scoped_persist(ut)
    a = ut.select("user_id", F.col("t").alias("type_a"))
    b = ut.select("user_id", F.col("t").alias("type_b"))
    both = (a.join(b, "user_id")
            .filter(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    per_type = ut.groupBy(F.col("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"))
    total = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))
    j = (both
         .join(per_type.select(F.col("t").alias("type_a"),
                               F.col("n_users").alias("n_a")), "type_a")
         .join(per_type.select(F.col("t").alias("type_b"),
                               F.col("n_users").alias("n_b")), "type_b")
         .crossJoin(F.broadcast(total)))
    union_ = F.col("n_a") + F.col("n_b") - F.col("n_both")
    pm = 2000 * F.col("n_both") + union_
    return j.select(
        "type_a", "type_b", "n_both", "n_a", "n_b", "n_total",
        F.floor(pm / (2 * union_)).cast("long").alias("jaccard_permille"),
        F.round((F.col("n_both") * F.col("n_total")).cast("double")
                / (F.col("n_a") * F.col("n_b")), 6).alias("lift"))


ORACLE_COOCCURRENCE = """
WITH ut AS (SELECT DISTINCT user_id, event_type AS t FROM events),
both_ AS (
  SELECT a.t AS type_a, b.t AS type_b, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
  GROUP BY 1, 2),
pt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_users FROM ut GROUP BY 1),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_total FROM ut)
SELECT type_a, type_b, n_both,
       pa.n_users AS n_a, pb.n_users AS n_b, tot.n_total,
       CAST((2000 * n_both + pa.n_users + pb.n_users - n_both)
            // (2 * (pa.n_users + pb.n_users - n_both)) AS BIGINT)
         AS jaccard_permille,
       ROUND(CAST(n_both * tot.n_total AS DOUBLE)
             / (pa.n_users * pb.n_users), 6) AS lift
FROM both_ JOIN pt pa ON pa.t = type_a JOIN pt pb ON pb.t = type_b, tot
"""


PAIRS.update({
    "event_cooccurrence_lift": (event_cooccurrence_lift,
                                ORACLE_COOCCURRENCE),
})
