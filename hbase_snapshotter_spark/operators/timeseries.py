"""Time-series resampling + gap filling (SURVEY §2.3 N59) and
rolling-window anomaly statistics over the dense grid (N60).

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
    hash agg.  ``v_avg`` is the exact integer micro-unit mean (the N60
    posture): per-row ``round(v·10⁶)`` BIGINTs sum order-independently
    and one double quotient closes — bit-identical on any engine.  A
    ROUNDED float mean is not: at sf0.1 enough buckets landed within
    one ulp of a 4-dp boundary that Spark's and DuckDB's different
    summation orders rounded a handful of buckets apart, and the
    divergence compounded through every downstream lane (r9 fix)."""
    v = F.col(value_col)
    micro = F.round(v * F.lit(1e6), 0).cast("long")
    n = F.count(v)
    return (
        df.groupBy(*group_cols, time_bucket(ts_col, bucket_ms).alias("bucket"))
        .agg((F.sum(micro) / n / F.lit(1e6)).alias("v_avg"),
             n.cast("int").alias("n_rows"))
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
    # 6 dp: the blend operates on the rollup's exact micro-unit means
    # (identical doubles on both engines), so the only rounding is this
    # one — and a blend of arbitrary doubles has no systematic .xxxxx5
    # ties for HALF_UP-vs-multiply-and-floor engines to break apart.
    lerp = F.round(
        pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb).cast("double"), 6)
    return j.select(
        *group_cols, "bucket",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        v.alias(value_col),
        pv.alias("v_locf"),
        F.when(v.isNotNull(), v).otherwise(lerp).alias("v_lerp"),
        v.isNull().alias("filled"))


def rolling_stats(
    grid: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "v_lerp",
    window_buckets: int = 48,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing rolling-window statistics + z-score anomaly flags over
    a DENSE bucket grid (SURVEY §2.3 N60) — the monitoring/feature
    lane on top of the N59 resample: per (group, bucket), the
    trailing-``window_buckets`` mean and sample stddev of
    ``value_col``, the current value's z-score against them, and an
    ``|z| > z_threshold`` anomaly flag.

    Input must be dense (run :func:`gap_fill` first): on a grid,
    ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` IS the trailing
    time window — the frame is k physical rows, so the engine-portable
    ROWS frame expresses the time semantics exactly (a RANGE frame
    over sparse data would not be replayable across engines the same
    way).

    Scale shape: ONE window pass whose partition is a group's grid —
    ``span/width`` rows regardless of event volume (the N59 property),
    so the whole operator is bucket-table-sized.

    Rounding posture (the N59 lesson, one step further): a ROUNDED
    window mean of k ≤-6-dp values lands on an exact ``.xxx5`` decimal
    whenever k divides the scaled sum a power of 2 — a SYSTEMATIC
    round tie engines break differently.  So the mean is never
    rounded: values are summed as exact integer micro-units
    (``round(v·10⁶)`` — order-independent BIGINT arithmetic) and the
    mean is the double quotient ``sum/(n·10⁶)``, bit-identical on any
    engine because the integer inputs are.  ``roll_std`` keeps the
    usual 4-dp posture (a sqrt is never an exact decimal, so no
    systematic tie exists); the z-score divides identical doubles.

    Output adds ``roll_avg, roll_std, zscore, is_anomaly, n_window``.
    ``roll_std`` is NULL (and the flag false) while the window holds
    one row; ``zscore`` additionally NULL on zero variance."""
    if window_buckets < 2:
        raise ValueError(
            f"window_buckets must be >= 2, got {window_buckets} "
            "(a 1-bucket window has no variance to score against)")
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy("bucket")
         .rowsBetween(-(window_buckets - 1), Window.currentRow))
    v = F.col(value_col)
    micro = F.round(v * F.lit(1e6), 0).cast("long")
    n = F.count(v).over(w)
    avg = F.sum(micro).over(w) / n / F.lit(1e6)
    std = F.round(F.stddev_samp(v).over(w), 4)
    # + 0.0 normalizes IEEE negative zero: a tiny negative deviation
    # rounds to -0.0, which DuckDB renders as a DISTINCT value and
    # the driver hash then splits on (-0 vs 0, hit at sf0.001)
    z = F.when(std > 0, F.round((v - avg) / std, 4) + F.lit(0.0))
    return grid.select(
        "*",
        avg.alias("roll_avg"),
        std.alias("roll_std"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False))
        .alias("is_anomaly"),
        n.cast("int").alias("n_window"))


#: EWMA smoothing factor as an exact rational: α = EWMA_NUM/EWMA_DEN.
EWMA_NUM = 1
EWMA_DEN = 8
#: Deviation flag: |v − ewma| ≥ ewma / EWMA_DEV_DIV (a 25% excursion).
EWMA_DEV_DIV = 4


def ewma_smooth(
    grid: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "v_lerp",
) -> DataFrame:
    """Exponentially-weighted moving average over the dense grid
    (SURVEY §2.3 N72) — the monitoring smoother next to the N60
    trailing window: ``e_t = α·v_t + (1−α)·e_{t−1}`` with
    ``e_0 = v_0``, α = :data:`EWMA_NUM`/:data:`EWMA_DEN`.

    Bit-identical by construction, not by rounding discipline: values
    snap to integer micro-units once, and every EWMA step is PURE
    INTEGER arithmetic — ``e_t = ((den−num)·e + num·v + den/2) // den``
    (half-up) — so any engine that can fold a list replays the exact
    sequence (DuckDB: ``list_reduce`` over bucket-ordered prefixes).
    An iterated FLOAT ewma would accumulate ulp skew instead.

    Scale shape: the recurrence is sequential per group, but a group's
    grid is span/width rows — bounded by TIME, not event volume (the
    N59 property) — so one ``collect_list`` per group is a bounded
    array and the fold is one higher-order expression (no Python, no
    window).  Groups parallelize across partitions; shuffle carries
    the bucket table once.  Output adds ``ewma`` (micro-exact double),
    ``dev_micro`` (v − ewma in micro-units) and ``is_excursion``
    (|dev| ≥ ewma/:data:`EWMA_DEV_DIV`, integer compare).
    """
    num, den = EWMA_NUM, EWMA_DEN
    gc = [F.col(c) for c in group_cols]
    vm = F.round(F.col(value_col) * 1e6, 0).cast("long")
    rows = grid.select(*group_cols, "bucket", vm.alias("__vm"))
    agg = rows.groupBy(*gc).agg(
        F.array_sort(F.collect_list(F.struct("bucket", "__vm")))
        .alias("__a"))

    def step(acc, x):
        prev = F.element_at(acc, -1)["__e"]
        t = (den - num) * prev + num * x["__vm"] + F.lit(den // 2)
        e = ((t - F.pmod(t, den)) / den).cast("long")
        return F.array_append(
            acc, F.struct(x["bucket"].alias("bucket"),
                          x["__vm"].alias("__vm"), e.alias("__e")))

    head = F.element_at(F.col("__a"), 1)
    init = F.array(F.struct(
        head["bucket"].alias("bucket"), head["__vm"].alias("__vm"),
        head["__vm"].alias("__e")))
    tail = F.when(F.size("__a") > 1,
                  F.slice("__a", 2, F.size("__a") - 1)) \
        .otherwise(F.array().cast(
            "array<struct<bucket:bigint,__vm:bigint>>"))
    folded = agg.select(
        *gc, F.posexplode(F.aggregate(tail, init, step)).alias("__i", "__s"))
    dev = F.col("__s.__vm") - F.col("__s.__e")
    return folded.select(
        *group_cols,
        F.col("__s.bucket").alias("bucket"),
        (F.col("__s.__vm").cast("double") / 1e6).alias("v"),
        (F.col("__s.__e").cast("double") / 1e6).alias("ewma"),
        dev.alias("dev_micro"),
        (F.lit(EWMA_DEV_DIV) * F.abs(dev) >= F.col("__s.__e"))
        .alias("is_excursion"))


def ohlc_bars(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    bucket_ms: int,
    id_col: str,
) -> DataFrame:
    """OHLC time bars (SURVEY §2.3 N87): per (group, bucket) the
    opening / highest / lowest / closing value plus count and exact
    micro-unit sum — the candlestick rollup every monitoring and
    market-data pipeline derives first (TimescaleDB ``candlestick_agg``,
    kdb bar builds).

    Open and close are ORDER-dependent where high/low are not — and
    ``min_by``/``max_by`` are non-deterministic under timestamp ties.
    Both are therefore computed as ``min(struct(ts, id, value))`` /
    ``max(struct(ts, id, value))`` with the unique ``id_col`` inside
    the ordering: total order, deterministic under any parallelism,
    and the SQL oracle replays it as a row-number pick.  ONE hash
    aggregation with map-side partials — the shuffle carries
    ≤ groups × buckets struct rows, never events."""
    b = time_bucket(ts_col, bucket_ms).alias("bucket")
    ts_ms = F.unix_millis(F.col(ts_col))
    v = F.col(value_col).cast("double")
    vid = F.col(id_col).cast("long")
    micro = F.round(v * 10000).cast("long")
    first = F.min(F.struct(ts_ms.alias("t"), vid.alias("i"),
                           v.alias("v"))).alias("__first")
    last = F.max(F.struct(ts_ms.alias("t"), vid.alias("i"),
                          v.alias("v"))).alias("__last")
    return (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, b)
        .agg(first, last,
             F.round(F.max(v), 4).alias("high"),
             F.round(F.min(v), 4).alias("low"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(micro).cast("long").alias("__sum_micro"))
        .select(
            *group_cols, "bucket",
            F.round(F.col("__first.v"), 4).alias("open"),
            "high", "low",
            F.round(F.col("__last.v"), 4).alias("close"),
            "n_events",
            (F.col("__sum_micro").cast("double") / 10000)
            .alias("sum_value"))
    )


def topk_state(
    df: DataFrame,
    *,
    group_cols: list[str],
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """Per-group exact top-k as MAINTAINABLE state (SURVEY §2.3 N88):
    ``row_number`` over (score desc, id asc) filtered to ``rank ≤ k``.
    The rank filter is written as a post-window predicate precisely
    because Catalyst rewrites it to ``WindowGroupLimit`` — a MAP-SIDE
    partial top-k per input partition before the shuffle (plan-pinned
    by pytest), so the exchange carries ≤ partitions × k rows per
    group, never the group's events: the scale-correct exact form
    (collect_list-based top-k holds whole groups in memory).  The
    unique id inside the ordering makes the pick total and
    deterministic under ties."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def advance_topk_state(
    prior: DataFrame,
    delta: DataFrame,
    *,
    group_cols: list[str],
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """Advance a top-k state with ONLY insert deltas: union the
    (k × groups)-row prior with the delta, collapse duplicates of the
    same (group, id) to their MAX score, and re-take the top-k.
    Sound because top-k is MONOTONE under inserts — a row outside the
    prior top-k is dominated by k rows that all survive into every
    later input, so it can never re-enter (deletes and score DECREASES
    break this; compose with
    :func:`~.operators.snapshot.recompute_affected_groups` — N94 — so
    delete/update-touched groups recompute from base while insert-only
    groups keep riding this cheap path, the registered
    ``topk_delete_advance`` shape).

    The max-collapse makes the advance IDEMPOTENT — a re-delivered
    delta whose rows the state already holds changes nothing (without
    it, a literal duplicate row takes its own rank and shifts every
    rank below it) — and gives re-sent ids upsert-by-max semantics.
    Cost per advance: the delta scan + one map-side-combined hash agg
    + a WindowGroupLimit over delta ∪ k·groups rows — never a rescan
    of history."""
    merged = (
        prior.drop("rank").unionByName(delta)
        .groupBy(*group_cols, id_col)
        .agg(F.max(F.col(score_col)).alias(score_col)))
    return topk_state(
        merged, group_cols=group_cols, id_col=id_col,
        score_col=score_col, k=k)


def transition_matrix(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """First-order transition matrix over per-key event sequences
    (SURVEY §2.3 N91): for every ordered pair of consecutive states
    within a key's timeline, the transition count and the
    row-normalized probability — the Markov-chain summary behind path
    analysis, next-event prediction baselines, and funnel-free journey
    views (the N-step generalization of what the funnel hard-codes).

    The ``lag`` window partitions by KEY — parallelism is the key
    count, partition size is one key's event count (the same bound
    every per-key window in the engine rides) — and orders by
    (ts, id): the unique id breaks timestamp ties so the sequence, and
    with it the matrix, is deterministic under any parallelism.
    Everything after the lag is a hash agg to ≤ |states|² rows +
    a broadcast join of row totals; probabilities are exact-integer
    permille (half-up), so the SQL oracle replays bit-for-bit."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = (
        df.select(key_col, ts_col, id_col,
                  F.col(state_col).alias("to_state"))
        .withColumn("from_state", F.lag("to_state").over(w))
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions")))
    totals = pairs.groupBy("from_state").agg(
        F.sum("n_transitions").alias("__row_total"))
    a = 2000 * F.col("n_transitions") + F.col("__row_total")
    prob = ((a - F.pmod(a, 2 * F.col("__row_total")))
            / (2 * F.col("__row_total"))).cast("long")
    return (pairs.join(F.broadcast(totals), "from_state")
            .select("from_state", "to_state", "n_transitions",
                    prob.alias("prob_permille"))
            .orderBy("from_state", "to_state"))


def top_paths(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str,
    steps: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k most frequent ``steps``-long consecutive state paths
    across all key timelines (SURVEY §2.3 N92) — the product-analytics
    "top user journeys" view; :func:`transition_matrix` is its
    2-step marginal.

    ``steps-1`` lag expressions over ONE per-key window pass (same
    deterministic (ts, id) ordering and per-key partition bound as the
    matrix), a hash agg to ≤ |states|^steps rows, then
    ``orderBy(...).limit(k)`` — which Spark plans as
    TakeOrderedAndProject (per-partition top-k, no global sort
    materialization).  The ordering includes the path itself so ties
    at the count boundary resolve identically on every engine."""
    if steps < 2:
        raise ValueError(f"steps must be >= 2, got {steps}")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    base = df.select(key_col, ts_col, id_col,
                     F.col(state_col).alias("step_1"))
    for i in range(1, steps):
        base = base.withColumn(
            f"step_{i + 1}", F.lead("step_1", i).over(w))
    path_cols = [f"step_{i + 1}" for i in range(steps)]
    return (
        base.dropna(subset=path_cols[-1:])
        .groupBy(*path_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), *path_cols)
        .limit(k))


def session_stats(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_ms: int,
) -> DataFrame:
    """Batch sessionization summary (SURVEY §2.3 N93): split each
    key's timeline into sessions at inactivity gaps > ``gap_ms``
    (the gaps-and-islands cumulative-sum form — session id = running
    count of gap-opening events), then reduce to ONE row of
    engine-wide session economics: session count, single-event
    ("bounce") sessions in exact permille, and 4-dp means of events
    per session and session span.

    The streaming suite's session WINDOW aggregates each session's
    rows; this is the other half — the cross-session distribution a
    product dashboard heads with.  Two per-key window passes (lag +
    running sum; partition = one key's events, the standard bound),
    one hash agg per session (≤ sessions rows), one 1-row final agg.
    Means are micro-unit-exact rationals rounded half-up so the
    oracle replays them bit-for-bit."""
    return session_economics(session_intervals(
        df, key_col=key_col, ts_col=ts_col, id_col=id_col, gap_ms=gap_ms))


def session_intervals(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_ms: int,
) -> DataFrame:
    """Per-key session INTERVALS — ``(key, start_ms, end_ms,
    n_events)`` via the gaps-and-islands form.  This is the
    MAINTAINABLE representation of sessionization: events only ever
    JOIN sessions (never split them), so the interval rows of two
    event sets merge losslessly with :func:`merge_session_intervals`
    — the algebra behind the streaming maintainer's exact batch
    parity, including out-of-order arrival."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ms = F.unix_millis(F.col(ts_col))
    prev = F.lag("__ms").over(w)
    return (
        df.select(key_col, ts_col, id_col)
        .withColumn("__ms", ms)
        .withColumn(
            "__open",
            F.when(prev.isNull() | ((F.col("__ms") - prev) > gap_ms), 1)
            .otherwise(0))
        .withColumn("__sid", F.sum("__open").over(wr))
        .groupBy(key_col, "__sid")
        .agg(F.min("__ms").alias("start_ms"),
             F.max("__ms").alias("end_ms"),
             F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(key_col, "start_ms", "end_ms", "n_events"))


def merge_session_intervals(
    sessions: DataFrame,
    *,
    key_col: str,
    gap_ms: int,
) -> DataFrame:
    """Merge session-interval rows per key: intervals whose start is
    within ``gap_ms`` of the running max end coalesce (counts sum,
    bounds extend).  EXACT by the session algebra: sessionization is
    the transitive closure of the ≤-gap adjacency on the sorted
    timeline, events only ever join sessions, and each interval's
    interior is already gap-chained — so
    ``merge(intervals(A) ∪ intervals(B)) = intervals(A ∪ B)`` for any
    split of the events, in any arrival order (pytest pins streamed ≡
    batch bit-for-bit on a shuffled split).  Same per-key window bound
    as every sessionization pass; input is sessions-sized, not
    events-sized."""
    w = Window.partitionBy(key_col).orderBy(
        F.col("start_ms").asc(), F.col("end_ms").asc(),
        F.col("n_events").asc())
    prev_end = F.max("end_ms").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        sessions
        .withColumn(
            "__open",
            F.when(prev_end.isNull()
                   | ((F.col("start_ms") - prev_end) > gap_ms), 1)
            .otherwise(0))
        .withColumn("__sid", F.sum("__open").over(wr))
        .groupBy(key_col, "__sid")
        .agg(F.min("start_ms").alias("start_ms"),
             F.max("end_ms").alias("end_ms"),
             F.sum("n_events").cast("long").alias("n_events"))
        .select(key_col, "start_ms", "end_ms", "n_events"))


def session_economics(sessions: DataFrame) -> DataFrame:
    """Reduce session-interval rows to the one-row economics summary
    (the N93 output shape): session count, exact-permille bounce
    share, micro-unit-exact half-up-rounded means."""

    def round4(num, den):
        a = 20000 * num + den
        return (((a - F.pmod(a, 2 * den)) / (2 * den))
                .cast("long").cast("double") / 10000)

    n_sessions = F.count(F.lit(1)).cast("long")
    bounces = F.sum(
        F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("long")
    b = 2000 * bounces + n_sessions
    return sessions.agg(
        n_sessions.alias("n_sessions"),
        ((b - F.pmod(b, 2 * n_sessions)) / (2 * n_sessions)).cast("long")
        .alias("bounce_permille"),
        round4(F.sum("n_events").cast("long"), n_sessions)
        .alias("avg_events_per_session"),
        round4(F.sum(F.col("end_ms") - F.col("start_ms")).cast("long"),
               n_sessions * 1000)
        .alias("avg_span_s"))


def pattern_matches(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str,
    patterns: list[tuple[str, str]],
    gap_ms: int,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite path matching (SURVEY §2.3 N96): for each
    ``(from_state, to_state)`` pattern, every greedy non-overlapping
    match of ``FROM (ANY)* TO`` within a key's ≤-gap-chained event run
    — the SQL-standard ``PATTERN (A X* C)`` with ``AFTER MATCH SKIP
    PAST LAST ROW``, restricted to sessions (consecutive-event gaps ≤
    ``gap_ms``), the product-analytics "did A then eventually C within
    a visit" ask that N91/N92 count only for FIXED-length windows.

    The state machine reduces to windows exactly: filtered to a
    pattern's two literals, greedy matching closes one match at every
    TO row whose predecessor (in the filtered per-session sequence) is
    FROM, and the match binds the FIRST row of that predecessor's
    FROM-run (runs collapse — no TO row intervenes inside a run, so
    the whole run is one pending match).  Per match: the bound FROM
    event's ms, the TO event's ms, their gap, and the number of
    timeline events strictly between them.

    Scale shape: ALL patterns ride ONE base sessionization pass (the
    pattern fan-out is an explode over a literal array — rows ≤
    |patterns| × events, filtered to pattern literals immediately);
    every window partitions by (pattern, key, session) — the per-key
    bound the whole timeseries family rides; the run join is
    matches × runs sized, AQE-broadcast at any skew."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ms = F.unix_millis(F.col(ts_col))
    prev = F.lag("__ms").over(w)
    base = (
        df.select(key_col, state_col, ts_col, id_col)
        .withColumn("__ms", ms)
        .withColumn(
            "__open",
            F.when(prev.isNull() | ((F.col("__ms") - prev) > gap_ms), 1)
            .otherwise(0))
        .withColumn("__sid", F.sum("__open").over(wr))
        .withColumn("__pos", F.row_number().over(w)))
    pats = F.array(*[
        F.struct(F.lit(f).alias("__f"), F.lit(t).alias("__t"))
        for f, t in patterns])
    s = F.col(state_col)
    fanned = base.select(
        key_col, state_col, "__ms", "__sid", "__pos",
        F.explode(F.filter(
            pats, lambda p: (s == p["__f"]) | (s == p["__t"]))).alias("__p")
    ).select(key_col, state_col, "__ms", "__sid", "__pos",
             F.col("__p.__f").alias("from_state"),
             F.col("__p.__t").alias("to_state"))
    wf = Window.partitionBy("from_state", "to_state", key_col, "__sid") \
        .orderBy("__pos")
    wfr = wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_s = F.lag(state_col).over(wf)
    runs_src = (
        fanned.withColumn("__prev_s", prev_s)
        .withColumn(
            "__chg",
            F.when(F.col("__prev_s").isNull()
                   | (F.col("__prev_s") != s), 1).otherwise(0))
        .withColumn("__run", F.sum("__chg").over(wfr)))
    from hbase_snapshotter_spark.cache import scoped_persist

    # consumed twice (run bounds + match rows) — one window pass, not two
    runs_src = scoped_persist(runs_src)
    runs = runs_src.groupBy("from_state", "to_state", key_col, "__sid",
                            "__run").agg(
        F.min("__ms").alias("from_ms"),
        F.min("__pos").alias("__run_pos"))
    # a match row always has chg = 1 (TO follows FROM), so the bound
    # FROM-run is exactly __run - 1
    prev_runs = runs.withColumn("__run", F.col("__run") + 1)
    return (
        runs_src.filter((s == F.col("to_state"))
                        & (F.col("__prev_s") == F.col("from_state")))
        .join(prev_runs,
              ["from_state", "to_state", key_col, "__sid", "__run"])
        .select("from_state", "to_state", F.col(key_col),
                "from_ms", F.col("__ms").alias("to_ms"),
                (F.col("__ms") - F.col("from_ms")).alias("duration_ms"),
                (F.col("__pos") - F.col("__run_pos") - 1).cast("long")
                .alias("steps_between")))


def session_attribution(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str],
    gap_ms: int,
) -> DataFrame:
    """Session-scoped conversion attribution (SURVEY §2.3 N102): credit
    each conversion event's session-prior touch events under the three
    standard rules — ``first_touch`` (the session's earliest prior
    touch takes the whole conversion), ``last_touch`` (the latest prior
    touch takes it), ``linear`` (every prior touch takes an equal
    share).  A conversion with no prior touch in its session credits
    the ``direct`` channel under every rule.

    Output: one row per (rule, channel) with the conversion count and
    the credited share in exact integer MICROS — linear shares are
    ``round_half_up(1e6 / n_touches)`` per touch, so sums are
    engine-exact (a float 1/n sum would diverge across engines by
    summation order).  Per-conversion micro totals may be off 1e6 by
    sub-micro rounding (3 touches → 999 999); documented, determinate.

    Scale: sessions come from the gaps-and-islands pass (per-key window
    — the standard bound); the touch⋈conversion join is keyed on
    (key, session) so it is co-partitioned with per-session row counts,
    never corpus-sized; the three rule reductions group on channel
    (≤ |touch_types|+1 rows each).  "Prior" uses the total order
    (ms, id) so simultaneous events can't split the engines."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ms = F.unix_millis(F.col(ts_col))
    prev = F.lag("__ms").over(w)
    ev = (
        df.select(key_col, ts_col, id_col, type_col)
        .withColumn("__ms", ms)
        .withColumn(
            "__open",
            F.when(prev.isNull() | ((F.col("__ms") - prev) > gap_ms), 1)
            .otherwise(0))
        .withColumn("__sid", F.sum("__open").over(wr)))
    conv = (ev.filter(F.col(type_col) == conversion_type)
            .select(F.col(key_col).alias("k"), F.col("__sid").alias("s"),
                    F.col(id_col).alias("conv_id"),
                    F.col("__ms").alias("conv_ms")))
    touch = (ev.filter(F.col(type_col).isin(touch_types))
             .select(F.col(key_col).alias("tk"), F.col("__sid").alias("ts_"),
                     F.col(id_col).alias("t_id"),
                     F.col("__ms").alias("t_ms"),
                     F.col(type_col).alias("channel")))
    before = (F.col("t_ms") < F.col("conv_ms")) | (
        (F.col("t_ms") == F.col("conv_ms"))
        & (F.col("t_id") < F.col("conv_id")))
    j = conv.join(
        touch,
        (F.col("k") == F.col("tk")) & (F.col("s") == F.col("ts_")) & before,
        "left")
    wc = Window.partitionBy("k", "s", "conv_id")
    jn = j.withColumn("__n", F.count("t_id").over(wc))
    micros = F.when(
        F.col("t_id").isNull(), F.lit(1000000).cast("long")
    ).otherwise(
        F.floor((F.lit(2000000) + F.col("__n")) / (2 * F.col("__n")))
        .cast("long"))
    linear = (
        jn.withColumn("channel", F.coalesce("channel", F.lit("direct")))
        .withColumn("credit", micros)
        .groupBy("channel")
        .agg(F.count_distinct("conv_id").cast("long")
             .alias("n_conversions"),
             F.sum("credit").cast("long").alias("credit_micros"))
        .select(F.lit("linear").alias("rule"), "channel",
                "n_conversions", "credit_micros"))
    tstruct = F.when(
        F.col("t_id").isNotNull(),
        F.struct(F.col("t_ms"), F.col("t_id"), F.col("channel")))
    per_conv = jn.groupBy("k", "s", "conv_id").agg(
        F.min(tstruct).alias("f"), F.max(tstruct).alias("l"))

    def rule_rows(rule: str, struct_col: str) -> DataFrame:
        return (
            per_conv
            .withColumn("channel", F.coalesce(
                F.col(f"{struct_col}.channel"), F.lit("direct")))
            .groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
            .select(F.lit(rule).alias("rule"), "channel", "n_conversions",
                    (F.col("n_conversions") * 1000000).cast("long")
                    .alias("credit_micros")))

    return (rule_rows("first_touch", "f")
            .unionAll(rule_rows("last_touch", "l"))
            .unionAll(linear))


def robust_center_scale(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
    k: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Robust per-group center/scale + outlier counts (SURVEY §2.3
    N112): EXACT median and MAD (median absolute deviation) with a
    ``|x − med| > k·MAD`` outlier rule — the robust-statistics
    complement of the mean/σ rolling anomaly (N60), immune to the very
    outliers it is hunting (one corrupt reading shifts a mean; it
    cannot move a median).

    Engine-exactness: values are fixed-pointed (``round(x·scale)``)
    and QUADRUPLED before any percentile, so every even-count linear
    interpolation midpoint ``(a+b)/2`` is an exact integer in both
    engines — for the median (multiples of 4 average to multiples of
    2) and again for the MAD over ``|u − med4|`` (multiples of 2
    average to integers).  The outlier rule compares exact integers.
    ``med_x4`` / ``mad_x4`` are in ×4 fixed-point units (divide by
    ``4·scale`` for display); ``outlier_permille`` is exact half-up.

    Scale: Spark's exact ``percentile`` buffers a group's values —
    right for BOUNDED group counts (event types, sensors, partitions);
    the unbounded-cardinality path is the mergeable DDSketch state
    (N58), which this complements, not replaces.  Three hash aggs +
    two broadcast joins of group-sized tables back onto the rows."""
    u = (F.round(F.col(value_col).cast("double") * scale).cast("long")
         * 4)
    base = df.select(*group_cols, u.alias("__u"))
    med = (base.groupBy(*group_cols)
           .agg(F.percentile("__u", 0.5).cast("long").alias("med_x4")))
    dev = (base.join(F.broadcast(med), group_cols)
           .withColumn("__d", F.abs(F.col("__u") - F.col("med_x4"))))
    mad = (dev.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.percentile("__d", 0.5).cast("long").alias("mad_x4")))
    out = (dev.join(F.broadcast(mad.select(*group_cols, "mad_x4")),
                    group_cols)
           .groupBy(*group_cols)
           .agg(F.sum(F.when(F.col("__d") > k * F.col("mad_x4"), 1)
                      .otherwise(0)).cast("long").alias("n_outliers")))
    pm = 2000 * F.col("n_outliers") + F.col("n_rows")
    return (med.join(mad, group_cols).join(out, group_cols)
            .select(*group_cols, "n_rows", "med_x4", "mad_x4",
                    "n_outliers",
                    F.floor(pm / (2 * F.col("n_rows"))).cast("long")
                    .alias("outlier_permille")))


def group_trend_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Per-group least-squares trend (SURVEY §2.3 N113) in EXACT
    integer arithmetic: for integer series ``(x, y)`` emit the OLS
    slope and fit as rationals —

    - ``slope_num = n·Σxy − Σx·Σy``,  ``slope_den = n·Σx² − (Σx)²``
      (slope = num/den; den = 0 ⇔ a single distinct x — slope NULL),
    - ``r2_num = slope_num²``, ``r2_den = slope_den·(n·Σy² − (Σy)²)``
      (r² = num/den; den = 0 ⇔ constant y — r² NULL),
    - ``slope`` / ``r_squared`` as correctly-rounded doubles of those
      exact integers (identical bits in any IEEE engine), 6-dp.

    The trend lane a monitoring dashboard heads with ("signups rising,
    errors flat?") — moments are one map-side-combined hash agg, so
    the shuffle carries five sums per group regardless of row count.
    Caller contract: x and y are INTEGERS with ``n·Σ(x²)`` and
    ``n·Σ(y²)`` below 2^63 (day indexes and daily counts at any
    realistic retention qualify; rescale upstream otherwise).

    Composition: :func:`trend_moments` (the mergeable state) →
    :func:`trend_from_moments` (read-time derivation) — the one-shot
    form of the same pipeline :func:`advance_trend_state` maintains
    incrementally."""
    return trend_from_moments(
        trend_moments(df, x_col, y_col, group_cols=group_cols),
        group_cols=group_cols)


def trend_moments(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Mergeable OLS moment state for :func:`group_trend_ols`:
    ``(*group_cols, n, sx, sy, sxy, sxx, syy)``.  Sums are associative
    and commutative, so the state merges losslessly — the N48/N65
    sketch-state posture applied to regression."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))


def advance_trend_state(
    prior: DataFrame,
    delta: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Advance materialized trend moments with only the delta rows —
    moment-sum the delta's state into the prior (state input is
    groups-sized, never the prior corpus).  EXACT: advanced state ≡
    full-build state, so the derived slope/r² equal the rebuild's
    bit-for-bit.  NOT idempotent under re-delivery — exactly-once
    delta delivery is the contract, as for every sum-mergeable
    state."""
    d = trend_moments(delta, x_col, y_col, group_cols=group_cols)
    return (prior.unionByName(d)
            .groupBy(*group_cols)
            .agg(*[F.sum(c).cast("long").alias(c)
                   for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]))


def trend_from_moments(state: DataFrame, *, group_cols: list[str]) -> DataFrame:
    """Derive the N113 output columns from a moment state — shared by
    the one-shot :func:`group_trend_ols` consumers and the advanced
    state (read-time derivation, never stored)."""
    m = state
    num = m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    den = m["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    ydisp = m["n"] * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        *group_cols, "n",
        num.alias("slope_num"), den.alias("slope_den"),
        (num * num).alias("r2_num"), (den * ydisp).alias("r2_den"),
        F.when(den != 0, F.round(num.cast("double") / den, 6))
        .alias("slope"),
        F.when((den != 0) & (ydisp != 0),
               F.round((num * num).cast("double") / (den * ydisp), 6))
        .alias("r_squared"))


def cusum_drift(
    grid: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "v_lerp",
    warmup: int = 168,
    slack_div: int = 20,
    h_mult: int = 8,
) -> DataFrame:
    """Two-sided CUSUM change-point detection over the dense grid
    (SURVEY §2.3 N114) — the sustained-shift detector that completes
    the monitoring family: the rolling z (N60) and MAD rule (N112)
    flag single outliers, EWMA (N72) smooths, the trend fit (N113)
    summarizes — CUSUM accumulates small persistent drifts until they
    cross a decision threshold (Page 1954).

    ``μ0`` is the half-up mean of each group's first ``warmup``
    buckets (the in-control baseline), slack ``K = max(1, μ0 //
    slack_div)`` and threshold ``H = h_mult·K`` — all derived,
    deterministic integers.  Per bucket: ``S⁺ = max(0, S⁺ + (v − μ0 −
    K))`` and the mirrored ``S⁻``, with ``alarm_pos/alarm_neg`` when a
    side exceeds H (no reset after alarm — the flag marks every bucket
    in the out-of-control region, documented).

    Engine-exactness AND scale via the reflection identity: ``S_t =
    P_t − min(0, min_{j≤t} P_j)`` for the running sum P of the slacked
    deviations — so the sequential recurrence becomes TWO window
    running-sums + running-mins per group (partition = the grid, span/
    width rows, the N59 bound), pure integer arithmetic both engines
    replay, no fold and no O(n²) oracle."""
    gc = [F.col(c) for c in group_cols]
    vm = F.round(F.col(value_col) * 1e6, 0).cast("long")
    w = Window.partitionBy(*gc).orderBy("bucket")
    rows = (grid.select(*group_cols, "bucket", vm.alias("__vm"))
            .withColumn("__rn", F.row_number().over(w)))
    base = rows.groupBy(*gc).agg(
        F.sum(F.when(F.col("__rn") <= warmup, F.col("__vm"))).alias("__ws"),
        F.sum(F.when(F.col("__rn") <= warmup, 1)).alias("__wn"))
    a = 2 * F.col("__ws") + F.col("__wn")
    mu0 = ((a - F.pmod(a, 2 * F.col("__wn"))) / (2 * F.col("__wn"))) \
        .cast("long")
    base = base.select(*group_cols, mu0.alias("__mu0"))
    k = F.greatest(F.lit(1).cast("long"),
                   F.floor(F.col("__mu0") / slack_div).cast("long"))
    joined = (rows.join(F.broadcast(base), group_cols)
              .withColumn("__k", k)
              .withColumn("__dp", F.col("__vm") - F.col("__mu0")
                          - F.col("__k"))
              .withColumn("__dn", F.col("__mu0") - F.col("__vm")
                          - F.col("__k")))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pp = F.sum("__dp").over(wr)
    pn = F.sum("__dn").over(wr)
    joined = (joined.withColumn("__pp", pp).withColumn("__pn", pn)
              .withColumn("__mp", F.min("__pp").over(wr))
              .withColumn("__mn", F.min("__pn").over(wr)))
    s_pos = F.col("__pp") - F.least(F.lit(0).cast("long"), F.col("__mp"))
    s_neg = F.col("__pn") - F.least(F.lit(0).cast("long"), F.col("__mn"))
    h = h_mult * F.col("__k")
    return joined.select(
        *group_cols, "bucket",
        (F.col("__vm").cast("double") / 1e6).alias("v"),
        F.col("__mu0").alias("mu0_micro"),
        s_pos.cast("long").alias("s_pos_micro"),
        s_neg.cast("long").alias("s_neg_micro"),
        (s_pos > h).alias("alarm_pos"),
        (s_neg > h).alias("alarm_neg"))
