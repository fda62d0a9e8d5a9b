"""Time-bucket resample + gap fill (SURVEY §2.3 N59) — hand-computed
grid, both fill lanes, and the bounded-grid property."""

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.timeseries import (
    gap_fill,
    time_bucket_rollup,
)

W = 60_000  # 1-minute buckets


def _events(spark, rows):
    return spark.createDataFrame(rows, "g string, ms long, value double") \
        .select("g", F.timestamp_millis("ms").alias("ts"), "value")


def test_gapfill_hand_computed(spark):
    """Group a: observations at buckets 0 (avg of 8 and 12 -> 10.0) and
    3W (40.0); the dense grid is 0..3W, LOCF carries 10 across the gap,
    lerp climbs 10/20/30/40, and `filled` marks the two generated rows.
    A NULL value neither counts nor perturbs the average.  Group b has
    one bucket: a one-row grid, nothing filled."""
    ev = _events(spark, [
        ("a", 1_000, 8.0), ("a", 59_000, 12.0), ("a", 30_000, None),
        ("a", 3 * W + 5, 40.0),
        ("b", 7 * W, 5.0),
    ])
    r = time_bucket_rollup(ev, "ts", "value", W, group_cols=["g"])
    out = {(x.g, x.bucket): x for x in
           gap_fill(r, W, group_cols=["g"]).collect()}
    assert len(out) == 5
    a0, a1, a2, a3 = (out[("a", i * W)] for i in range(4))
    assert (a0.n_rows, a0.v_avg, a0.v_locf, a0.v_lerp, a0.filled) == \
        (2, 10.0, 10.0, 10.0, False)
    assert (a1.n_rows, a1.v_avg, a1.v_locf, a1.v_lerp, a1.filled) == \
        (0, None, 10.0, 20.0, True)
    assert (a2.v_locf, a2.v_lerp, a2.filled) == (10.0, 30.0, True)
    assert (a3.n_rows, a3.v_avg, a3.v_locf, a3.v_lerp, a3.filled) == \
        (1, 40.0, 40.0, 40.0, False)
    b = out[("b", 7 * W)]
    assert (b.n_rows, b.v_avg, b.v_locf, b.v_lerp, b.filled) == \
        (1, 5.0, 5.0, 5.0, False)


def test_grid_size_is_span_not_cardinality(spark):
    """The dense grid is span/width rows per group regardless of how
    many events fall in it — the property that keeps gap filling
    affordable at any event volume."""
    many = _events(spark, [("a", (i % 10) * W + i, float(i))
                           for i in range(5_000)])
    r = time_bucket_rollup(many, "ts", "value", W, group_cols=["g"])
    dense = gap_fill(r, W, group_cols=["g"])
    assert dense.count() == 10
    assert dense.filter("filled").count() == 0
    # fully-sparse variant: same span, 2 observations, 8 filled rows
    sparse = _events(spark, [("a", 0, 1.0), ("a", 9 * W, 10.0)])
    d2 = gap_fill(
        time_bucket_rollup(sparse, "ts", "value", W, group_cols=["g"]),
        W, group_cols=["g"])
    assert d2.count() == 10 and d2.filter("filled").count() == 8
    # lerp is affine across the whole gap: bucket k -> 1 + k
    got = {x.bucket // W: x.v_lerp for x in d2.collect()}
    assert got == {k: float(1 + k) for k in range(10)}
