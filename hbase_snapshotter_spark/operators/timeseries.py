"""Time-series resampling + gap filling (SURVEY §2.3 N59).

The hypertable-rollup shape (TimescaleDB ``time_bucket_gapfill`` /
InfluxDB ``GROUP BY time() fill()``): downsample an event stream to a
regular grid, then make the grid DENSE — every bucket between a group's
first and last observation exists, with missing buckets filled by
last-observation-carried-forward (LOCF) and by linear interpolation.
Monitoring, feature engineering, and training-curve pipelines all need
the dense form; ML models can't consume "the row is just absent".

Spark-first shapes, all engine-replayable:

- **rollup**: bucket = ``floor(epoch_ms / width) * width`` — a pure
  column expression feeding ONE hash aggregation (map-side partials;
  shuffle carries ≤ groups × buckets rows, never events).
- **densify**: per-group ``sequence(min_bucket, max_bucket, width)``
  explode — fan-out bounded by the group's time span over the bucket
  width, generated from a bucket-table agg (never a scan of the data).
- **fill**: two per-group windows over the GRID (partition size =
  buckets per group, not events): LOCF is ``last(value, ignorenulls)``
  over the preceding frame; interpolation carries the previous/next
  observed value and bucket and computes the affine blend.  Interior
  gaps always have both neighbors (the grid spans observed min→max),
  so the blend is total.

At 100 TB the dominant cost is the rollup scan, which is the
irreducible read; everything after operates on the bucket table
(O(span/width) rows per group — KBs for years of data at hourly
width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: str, bucket_ms: int):
    """Bucket-start epoch-millis of a timestamp column: the
    ``time_bucket`` primitive (exact integer arithmetic, so the SQL
    oracle replays it bit-for-bit)."""
    return (F.floor(F.unix_millis(F.col(ts_col)) / F.lit(bucket_ms))
            * F.lit(bucket_ms)).cast("long")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_ms: int,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Downsample to ``(group, bucket, v_avg, n_rows)`` — one scan, one
    hash agg.  ``v_avg`` is rounded to 4 dp (the cross-engine float
    posture; sum order differs between engines at the last ulp)."""
    return (
        df.groupBy(*group_cols, time_bucket(ts_col, bucket_ms).alias("bucket"))
        .agg(F.round(F.avg(value_col), 4).alias("v_avg"),
             F.count(value_col).cast("int").alias("n_rows"))
    )


def gap_fill(
    rollup: DataFrame,
    bucket_ms: int,
    *,
    group_cols: list[str],
    value_col: str = "v_avg",
) -> DataFrame:
    """Densify a rollup onto the regular grid and fill the gaps:
    output ``(group, bucket, n_rows, v_avg, v_locf, v_lerp, filled)``
    — one row per grid bucket between each group's first and last
    observed bucket.  ``v_locf`` carries the last observation forward;
    ``v_lerp`` linearly interpolates between the neighboring
    observations (both equal ``v_avg`` on observed buckets);
    ``filled`` marks generated rows.  All window input is the bucket
    grid, never the raw events."""
    gc = [F.col(c) for c in group_cols]
    bounds = rollup.groupBy(*group_cols).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
    grid = bounds.select(
        *group_cols,
        F.explode(F.sequence("__mn", "__mx", F.lit(bucket_ms)))
        .alias("bucket"))
    j = grid.join(rollup, [*group_cols, "bucket"], "left")
    w_prev = (Window.partitionBy(*gc).orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy(*gc).orderBy("bucket")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    v = F.col(value_col)
    obs_bucket = F.when(v.isNotNull(), F.col("bucket"))
    pv = F.last(v, ignorenulls=True).over(w_prev)
    pb = F.last(obs_bucket, ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    nb = F.first(obs_bucket, ignorenulls=True).over(w_next)
    # 6 dp, not 4: a half-way gap blends two 4-dp endpoints into an
    # exact .xxxx5 decimal — a systematic ROUND tie that Spark
    # (BigDecimal HALF_UP on the shortest string) and SQL engines
    # (multiply-and-floor) break differently.  The blend of 4-dp
    # endpoints carries at most ~5 decimal digits, so at 6 dp no
    # systematic tie exists and the oracle replays bit-for-bit.
    lerp = F.round(
        pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb).cast("double"), 6)
    return j.select(
        *group_cols, "bucket",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        v.alias(value_col),
        pv.alias("v_locf"),
        F.when(v.isNotNull(), v).otherwise(lerp).alias("v_lerp"),
        v.isNull().alias("filled"))
