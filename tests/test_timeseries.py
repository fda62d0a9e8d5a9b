"""Time-bucket resample + gap fill (SURVEY §2.3 N59) and rolling-window
stats (N60) — hand-computed grid, both fill lanes, the bounded-grid
property, and the trailing-window mean/std/z-score."""

import math

import pytest
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.timeseries import (
    gap_fill,
    rolling_stats,
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


def test_rolling_stats_hand_computed(spark):
    """3-bucket trailing window over the dense series 10,20,60,20:
    means 10,15,30,100/3; stds NULL then hand-computed sample stds; the
    spike at bucket 2 scores z=(60-30)/std(10,20,60) and the window
    count ramps 1,2,3,3.  A second group is windowed independently."""
    grid = spark.createDataFrame(
        [("a", i * W, v) for i, v in enumerate([10.0, 20.0, 60.0, 20.0])]
        + [("b", 0, 5.0), ("b", W, 5.0)],
        "g string, bucket long, v_lerp double")
    out = {(x.g, x.bucket // W): x for x in rolling_stats(
        grid, group_cols=["g"], value_col="v_lerp",
        window_buckets=3, z_threshold=1.08).collect()}

    def std(*vals):
        m = sum(vals) / len(vals)
        return round(math.sqrt(
            sum((x - m) ** 2 for x in vals) / (len(vals) - 1)), 4)

    a0, a1, a2, a3 = (out[("a", i)] for i in range(4))
    assert (a0.roll_avg, a0.roll_std, a0.zscore, a0.n_window) == \
        (10.0, None, None, 1)
    assert (a1.roll_avg, a1.roll_std, a1.n_window) == (15.0, std(10, 20), 2)
    assert a1.zscore == round((20 - 15) / std(10, 20), 4)
    assert (a2.roll_avg, a2.roll_std) == (30.0, std(10, 20, 60))
    assert a2.zscore == round(30 / std(10, 20, 60), 4)
    # 1.08 sits between the spike's z (~1.134) and every other |z|
    assert a2.is_anomaly and not any(
        x.is_anomaly for x in out.values() if x is not a2)
    # window slid past bucket 0: mean of 20,60,20 is non-terminating
    # in decimal — exact integer-micro arithmetic, not a rounded float
    assert a3.roll_avg == (20 + 60 + 20) * 1_000_000 / 3 / 1e6
    # zero variance -> NULL z, no flag
    b1 = out[("b", 1)]
    assert (b1.roll_avg, b1.roll_std, b1.zscore, b1.is_anomaly) == \
        (5.0, 0.0, None, False)


def test_rolling_stats_window_guard():
    with pytest.raises(ValueError, match="window_buckets"):
        rolling_stats(None, group_cols=["g"], window_buckets=1)


def test_ohlc_bars_tie_break_and_bounds(spark):
    """OHLC on a hand-built bucket with a timestamp TIE at the open
    and at the close: the struct-ordering pick resolves both by
    event_id (total order — any parallelism yields this answer), and
    low <= open/close <= high always."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.timeseries import ohlc_bars

    rows = [
        # (event_id, type, ts, value) — one 30-min bucket, tie at both ends
        (2, "g", "2024-01-01 10:00:00", 5.0),
        (1, "g", "2024-01-01 10:00:00", 3.0),   # tie: id 1 wins open
        (3, "g", "2024-01-01 10:05:00", 9.0),
        (5, "g", "2024-01-01 10:10:00", 1.0),
        (4, "g", "2024-01-01 10:10:00", 7.0),   # tie: id 5 wins close
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, value double"
    ).select("event_id", "event_type",
             F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = ohlc_bars(df, ts_col="ts", value_col="value",
                    group_cols=["event_type"], bucket_ms=30 * 60 * 1000,
                    id_col="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close) == (3.0, 9.0, 1.0, 1.0)
    assert r.n_events == 5 and abs(r.sum_value - 25.0) < 1e-9
    assert r.low <= r.open <= r.high and r.low <= r.close <= r.high


def test_transition_matrix_hand_computed(spark):
    """N91 on a hand-built sequence with a timestamp tie: the tie
    breaks by event_id (deterministic sequence), probabilities are
    row-normalized exact permille, and single-event users contribute
    no transitions."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.timeseries import (
        transition_matrix,
    )

    rows = [
        # u1: A -> B -> B -> C   (tie at 10:05 broken by id: 3 then 4)
        (1, 1, "A", "2024-01-01 10:00:00"),
        (3, 1, "B", "2024-01-01 10:05:00"),
        (4, 1, "B", "2024-01-01 10:05:00"),
        (5, 1, "C", "2024-01-01 10:10:00"),
        # u2: A -> B
        (6, 2, "A", "2024-01-01 09:00:00"),
        (7, 2, "B", "2024-01-01 09:30:00"),
        # u3: singleton — no transitions
        (8, 3, "A", "2024-01-01 08:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).select("event_id", "user_id", "event_type",
             F.col("ts_s").cast("timestamp").alias("ts"))
    got = {(r.from_state, r.to_state): (r.n_transitions, r.prob_permille)
           for r in transition_matrix(
               df, key_col="user_id", state_col="event_type",
               ts_col="ts", id_col="event_id").collect()}
    assert got == {
        ("A", "B"): (2, 1000),
        ("B", "B"): (1, 500),
        ("B", "C"): (1, 500),
    }


def test_session_stats_hand_computed(spark):
    """N93 on a hand-built timeline: gap splits exactly at the
    threshold boundary (> gap opens, == gap does not), bounces
    counted, spans and means exact."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.timeseries import session_stats

    rows = [
        # u1: one 3-event session (gaps 10 min, exactly 30 min), then
        # a 31-min gap opens session 2 (single event = bounce)
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-01 10:10:00"),
        (3, 1, "2024-01-01 10:40:00"),
        (4, 1, "2024-01-01 11:11:00"),
        # u2: one singleton session (bounce)
        (5, 2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id",
             F.col("ts_s").cast("timestamp").alias("ts"))
    r = session_stats(df, key_col="user_id", ts_col="ts",
                      id_col="event_id", gap_ms=30 * 60 * 1000).head()
    assert r.n_sessions == 3
    assert r.bounce_permille == 667          # 2/3 half-up
    assert abs(r.avg_events_per_session - 1.6667) < 1e-9
    assert abs(r.avg_span_s - 800.0) < 1e-9  # (2400 + 0 + 0) / 3


def test_pattern_matches_greedy_semantics(spark):
    """N96 hand-computed: greedy FROM (ANY)* TO with SKIP PAST LAST ROW
    — 'A A C C' is ONE match bound to the FIRST A of the run; matches
    never cross a session gap; steps_between counts the full-timeline
    events strictly between the bound endpoints; two patterns ride one
    call."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.timeseries import pattern_matches

    # timeline (minutes), gap = 10 min chains everything per key unless
    # stated.  u1: A(0) A(2) X(3) C(5) C(6) A(8) C(9)  → matches:
    #   (A@0 → C@5, steps: A@2,X@3 = 2) then skip-past → (A@8 → C@9, 0)
    # u2: A(0) | gap | C(30): no match across the session break
    rows = [("u1", 0, "A"), ("u1", 2, "A"), ("u1", 3, "X"),
            ("u1", 5, "C"), ("u1", 6, "C"), ("u1", 8, "A"),
            ("u1", 9, "C"),
            ("u2", 0, "A"), ("u2", 30, "C")]
    df = spark.createDataFrame(
        [(k, m, s, i) for i, (k, m, s) in enumerate(rows)],
        "k string, mins long, s string, eid long"
    ).select("k", F.expr("timestamp_millis(mins * 60000)").alias("ts"),
             "s", "eid")
    out = pattern_matches(
        df, key_col="k", state_col="s", ts_col="ts", id_col="eid",
        patterns=[("A", "C"), ("X", "C")], gap_ms=10 * 60000)
    got = sorted((r.from_state, r.to_state, r.k, r.from_ms // 60000,
                  r.to_ms // 60000, r.steps_between)
                 for r in out.collect())
    assert got == [
        ("A", "C", "u1", 0, 5, 2),   # bound to FIRST A, one match only
        ("A", "C", "u1", 8, 9, 0),   # restarts after skip-past
        ("X", "C", "u1", 3, 5, 0),   # second pattern, same call; no
                                     # timeline event sits strictly
                                     # between X@3 and C@5
    ]
    # duration is ms-exact
    durs = {(r.from_state, r.from_ms // 60000): r.duration_ms
            for r in out.collect()}
    assert durs[("A", 0)] == 5 * 60000 and durs[("X", 3)] == 2 * 60000


def test_session_attribution_hand_computed(spark):
    """N102 on a hand-built timeline.  u1 session 1: view, click,
    purchase -> first=view, last=click, linear 500000 each; the later
    view in the SAME session after the purchase earns nothing.  u1
    session 2 (after a >30-min gap): purchase with no prior touch ->
    direct under every rule.  u2: touch in a DIFFERENT session than
    the purchase -> direct; three-touch purchase -> 333333 each + the
    sub-micro remainder stays unassigned."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.timeseries import (
        session_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:05:00", "click"),
        (3, 1, "2024-01-01 10:10:00", "purchase"),
        (4, 1, "2024-01-01 10:15:00", "view"),     # post-conversion
        (5, 1, "2024-01-01 11:00:00", "purchase"),  # new session, direct
        (6, 2, "2024-01-01 08:00:00", "view"),      # session apart
        (7, 2, "2024-01-01 09:00:00", "view"),
        (8, 2, "2024-01-01 09:10:00", "view"),
        (9, 2, "2024-01-01 09:20:00", "click"),
        (10, 2, "2024-01-01 09:30:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string"
    ).select("event_id", "user_id", "event_type",
             F.col("ts_s").cast("timestamp").alias("ts"))
    out = {(r.rule, r.channel): r for r in session_attribution(
        df, key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type", conversion_type="purchase",
        touch_types=["view", "click"], gap_ms=30 * 60 * 1000).collect()}
    # u2's purchase at 09:30 sees view@09:00, view@09:10, click@09:20
    # (view@08:00 is a separate session); first=view, last=click.
    f = {(k[1]): v for k, v in out.items() if k[0] == "first_touch"}
    assert (f["view"].n_conversions, f["view"].credit_micros) == (2, 2000000)
    assert f["direct"].n_conversions == 1
    la = {(k[1]): v for k, v in out.items() if k[0] == "last_touch"}
    assert (la["click"].n_conversions, la["click"].credit_micros) == (2, 2000000)
    assert la["direct"].n_conversions == 1
    lin = {(k[1]): v for k, v in out.items() if k[0] == "linear"}
    # u1 s1: view 500000 + click 500000; u2: view 333333*2, click 333333
    assert lin["view"].credit_micros == 500000 + 2 * 333333
    assert lin["view"].n_conversions == 2
    assert lin["click"].credit_micros == 500000 + 333333
    assert lin["direct"].credit_micros == 1000000
    total = sum(v.credit_micros for v in lin.values())
    assert total == 3000000 - 1  # the documented sub-micro remainder


def test_robust_center_scale_hand_computed(spark):
    """N112: exact median and MAD on a hand group (odd and even
    counts, the interpolated midpoint case), the 3-MAD rule flagging
    only the planted outlier, MAD=0 degenerate singleton, and the
    estimator's robustness — moving the outlier arbitrarily far
    changes neither median nor MAD."""
    from hbase_snapshotter_spark.operators.timeseries import (
        robust_center_scale,
    )

    rows = ([("a", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)]
            + [("e", v) for v in (1.0, 2.0, 3.0, 10.0)]  # even count
            + [("s", 5.0)])
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r.g: r for r in robust_center_scale(
        df, "x", group_cols=["g"]).collect()}
    a = out["a"]
    assert (a.med_x4, a.mad_x4) == (3 * 400, 1 * 400)
    assert (a.n_outliers, a.outlier_permille) == (1, 200)
    e = out["e"]
    assert e.med_x4 == 1000          # (2+3)/2 = 2.5 -> exact in x4
    # devs (x4): 600,200,200,3000 -> sorted midpoint (200+600)/2 = 400
    assert e.mad_x4 == 400
    assert (e.n_outliers, e.outlier_permille) == (1, 250)  # 10.0 flags
    s = out["s"]
    assert (s.med_x4, s.mad_x4, s.n_outliers) == (2000, 0, 0)
    far = df.withColumn(
        "x", F.when(F.col("x") == 100.0, 1e9).otherwise(F.col("x")))
    a2 = {r.g: r for r in robust_center_scale(
        far, "x", group_cols=["g"]).collect()}["a"]
    assert (a2.med_x4, a2.mad_x4, a2.n_outliers) == (a.med_x4, a.mad_x4, 1)


def test_group_trend_ols_hand_computed(spark):
    """N113: slope/r2 rationals equal the closed form on a hand
    series (perfect line -> r2 exactly 1, noisy line matches numpy's
    polyfit to 6dp), single-x and constant-y degeneracies yield NULL
    slope / r2 instead of a division blow-up."""
    from hbase_snapshotter_spark.operators.timeseries import (
        group_trend_ols,
    )

    rows = (
        [("perfect", x, 3 * x + 7) for x in range(5)]
        + [("noisy", 0, 1), ("noisy", 1, 3), ("noisy", 2, 2),
           ("noisy", 3, 5)]
        + [("one_x", 4, 10), ("one_x", 4, 20)]
        + [("const_y", 0, 9), ("const_y", 1, 9)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in group_trend_ols(
        df, "x", "y", group_cols=["g"]).collect()}
    p = out["perfect"]
    assert p.slope == 3.0 and p.r_squared == 1.0
    assert p.slope_num / p.slope_den == 3.0
    n = out["noisy"]
    # closed form: n=4 sx=6 sy=11 sxy=22 sxx=14
    assert (n.slope_num, n.slope_den) == (4 * 22 - 6 * 11, 4 * 14 - 36)
    assert n.slope == round((4 * 22 - 6 * 11) / (4 * 14 - 36), 6)
    import numpy as np
    np_slope = np.polyfit([0, 1, 2, 3], [1, 3, 2, 5], 1)[0]
    assert abs(n.slope - np_slope) < 1e-6
    assert out["one_x"].slope is None and out["one_x"].slope_den == 0
    c = out["const_y"]
    assert c.r_squared is None and c.r2_den == 0 and c.slope == 0.0


def test_trend_state_advance_equals_rebuild(spark):
    """N113 incremental form: moment state advanced with delta rows
    equals the full build (sum-mergeable), the derived trend equals
    the one-shot operator, and newborn groups appear via the
    advance."""
    from hbase_snapshotter_spark.operators.timeseries import (
        advance_trend_state,
        group_trend_ols,
        trend_from_moments,
        trend_moments,
    )

    hist = spark.createDataFrame(
        [("a", 0, 7), ("a", 1, 10), ("b", 0, 1)], "g string, x long, y long")
    delta = spark.createDataFrame(
        [("a", 2, 13), ("c", 5, 5)], "g string, x long, y long")
    kw = dict(group_cols=["g"])
    adv = advance_trend_state(
        trend_moments(hist, "x", "y", **kw), delta, "x", "y", **kw)
    full = trend_moments(hist.unionAll(delta), "x", "y", **kw)
    rows = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    assert rows(adv) == rows(full)
    derived = {r.g: r for r in trend_from_moments(adv, **kw).collect()}
    oneshot = {r.g: r for r in group_trend_ols(
        hist.unionAll(delta), "x", "y", **kw).collect()}
    assert {g: tuple(r) for g, r in derived.items()} == \
        {g: tuple(r) for g, r in oneshot.items()}
    assert derived["a"].slope == 3.0      # 7,10,13 on x=0,1,2
    assert derived["c"].slope is None     # newborn single-x group


def test_cusum_drift_hand_computed(spark):
    """N114 on a planted shift: a series at the baseline stays at
    S=0 on both sides; a sustained +20% shift accumulates S+ linearly
    (the reflection identity equals the max(0, S+d) recurrence,
    hand-folded) and alarms once past 8 slack units; a transient
    single spike decays back without alarming; the negative side
    mirrors."""
    from hbase_snapshotter_spark.operators.timeseries import cusum_drift

    W = 60_000
    # baseline value 100.0 for 4 warmup buckets, then a shift
    series = {
        "shift_up": [100.0] * 4 + [120.0] * 60,
        "spike": [100.0] * 4 + [130.0] + [100.0] * 10,
        "shift_down": [100.0] * 4 + [80.0] * 60,
    }
    rows = [(g, i * W, v) for g, vs in series.items()
            for i, v in enumerate(vs)]
    grid = spark.createDataFrame(
        rows, "g string, bucket long, v_lerp double")
    out = {}
    for r in cusum_drift(grid, group_cols=["g"], warmup=4,
                         slack_div=20, h_mult=8).collect():
        out.setdefault(r.g, []).append(r)
    for g in out:
        out[g].sort(key=lambda r: r.bucket)

    def fold(vs, mu0, k):
        sp = sn = 0
        res = []
        for v in vs:
            vm = round(v * 1e6)
            sp = max(0, sp + vm - mu0 - k)
            sn = max(0, sn + mu0 - vm - k)
            res.append((sp, sn))
        return res

    mu0, k = 100_000_000, 5_000_000
    for g, vs in series.items():
        hand = fold(vs, mu0, k)
        got = [(r.s_pos_micro, r.s_neg_micro) for r in out[g]]
        assert got == hand, g
        assert out[g][0].mu0_micro == mu0
    up = out["shift_up"]
    assert not any(r.alarm_pos for r in up[:4])
    assert any(r.alarm_pos for r in up) and not any(r.alarm_neg for r in up)
    # +20 over slack 5 -> net +15/bucket; H = 40 -> alarm from the
    # 3rd shifted bucket onward
    first_alarm = next(i for i, r in enumerate(up) if r.alarm_pos)
    assert first_alarm == 4 + 2
    sp = out["spike"]
    assert not any(r.alarm_pos or r.alarm_neg for r in sp)
    assert sp[4].s_pos_micro == 25_000_000  # the spike's excess
    assert sp[-1].s_pos_micro == 0          # decayed by the slack
    dn = out["shift_down"]
    assert any(r.alarm_neg for r in dn) and not any(r.alarm_pos for r in dn)


def test_event_cooccurrence_hand_computed(spark, tmp_path):
    """N120 on a hand basket: u1 does A+B, u2 does A only, u3 does
    B+C; co-occurrence counts the user SETS (repeat events collapse),
    Jaccard and lift replay the closed form, never-co-occurring pairs
    are absent."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.queries.streaming_q import (
        event_cooccurrence_lift,
    )

    rows = [(1, 1, "A"), (2, 1, "A"), (3, 1, "B"),   # u1: A(x2), B
            (4, 2, "A"),                              # u2: A
            (5, 3, "B"), (6, 3, "C")]                 # u3: B, C
    d = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).select("event_id", "user_id", "event_type",
             F.timestamp_millis(F.col("event_id") * 1000).alias("ts"),
             F.lit(1.0).alias("value"), F.lit("{}").alias("props")) \
     .write.parquet(f"{d}/events.parquet")
    out = {(r.type_a, r.type_b): r for r in
           event_cooccurrence_lift(spark, d).collect()}
    ab = out[("A", "B")]
    assert (ab.n_both, ab.n_a, ab.n_b, ab.n_total) == (1, 2, 2, 3)
    assert ab.jaccard_permille == (2000 * 1 + 3) // 6   # 1/3 half-up
    assert ab.lift == round(1 * 3 / (2 * 2), 6)
    bc = out[("B", "C")]
    assert (bc.n_both, bc.n_a, bc.n_b) == (1, 2, 1)
    assert bc.lift == round(1 * 3 / (2 * 1), 6)
    assert ("A", "C") not in out                        # never co-occur
