"""Mergeable distinct-count sketch state (SURVEY §2.3 N48).

The aggregate-state mirror of the N25 latest-cells maintenance: a 100 TB
warehouse never re-counts distincts from scratch.  Per-group HLL
sketches (Spark 4's Apache DataSketches bindings — ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) are MATERIALIZED as binary
state (KBs per group, regardless of data volume), and advancing with a
delta is a register-max union:

- **associative + commutative** — ``union(sk(A), sk(B)) = sk(A ∪ B)``
  exactly (the union takes the per-register maximum, and a register's
  value depends only on the SET of hashed items that fed it);
- **idempotent under re-delivery** — re-unioning a delta's items
  changes no register (set semantics), so exactly-once sketch state
  falls out of at-least-once delivery, the same soundness argument as
  ``advance_latest_cells``;
- **deterministic** — same item set ⇒ bit-identical sketch ⇒ the
  merged-equals-full and advanced-equals-full invariants are exact
  EQUALITIES, not tolerances (driver-hash-checkable).

This is the Druid/Pinot/BigQuery materialized-sketch pattern: per-day /
per-partition sketch columns rolled up at query time at any grouping,
each merge reading KBs where the exact recount reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Materialized per-group sketch state: ``(*group_cols, sketch)``.
    One hash aggregation with map-side partials — the only pass that
    reads the data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col).alias("sketch"))


def advance_sketches(
    prior: DataFrame,
    delta: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Advance materialized sketch state with only the delta: sketch
    the delta (the only data-sized work) and union per group.  Groups
    new in the delta appear; untouched groups pass through; re-delivered
    delta rows are no-ops (register max).  State input is KBs per
    group, never the prior data."""
    fresh = distinct_sketches(delta, value_col, group_cols=group_cols)
    return (
        prior.select(*group_cols, "sketch")
        .unionByName(fresh)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def sketch_estimates(sketches: DataFrame, *, group_cols: list[str]) -> DataFrame:
    """``(*group_cols, estimate)`` — long estimates from the state."""
    return sketches.select(
        *group_cols,
        F.hll_sketch_estimate("sketch").alias("estimate"))


def theta_set_cardinalities(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Distinct-set ALGEBRA between two slices via theta sketches
    (N51): per group — ``n_a, n_b, n_union, n_intersection, n_a_only,
    n_b_only``.  HLL (N48) answers only cardinality; theta sketches
    (Apache DataSketches via Spark 4's ``theta_*``) support UNION,
    INTERSECTION, and DIFFERENCE over the sketch state — the "how many
    users churned / are new / are retained" questions across snapshot
    eras without ever materializing the sets.

    Each side is one hash aggregation into KB-sized sketch state;
    the algebra is per-group scalar functions on the joined sketches.
    Below the sketch's nominal capacity (2¹² retained hashes by
    default) a theta sketch IS the exact hashed set, so estimates are
    EXACT and deterministic — the fixture regime, where the driver
    hash checks them as values; above it they degrade gracefully,
    which is the 100 TB trade.  The envelope is MEASURED, not cited
    (``test_sketch_error_envelope_above_capacity``, three cardinality
    decades to 10⁶): per-side ±2%, union ±3% (a union inherits the
    smaller theta of its inputs), intersection/differences ±6% at 50%
    overlap (intersection error grows with disjointness and a
    difference compounds both inputs' errors — the documented
    DataSketches caveats; measured max 5.7% at n=10⁶).
    Groups present in only one slice get an empty-set other side."""
    a_sk = df_a.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("__a"))
    b_sk = df_b.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("__b"))
    joined = a_sk.join(b_sk, list(group_cols), "full_outer")
    est = F.theta_sketch_estimate

    def side(col):
        return F.when(F.col(col).isNull(), F.lit(0)).otherwise(est(F.col(col)))

    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()
    return joined.select(
        *group_cols,
        side("__a").alias("n_a"),
        side("__b").alias("n_b"),
        F.when(both, est(F.theta_union("__a", "__b")))
         .otherwise(side("__a") + side("__b")).alias("n_union"),
        F.when(both, est(F.theta_intersection("__a", "__b")))
         .otherwise(F.lit(0)).alias("n_intersection"),
        F.when(both, est(F.theta_difference("__a", "__b")))
         .otherwise(side("__a")).alias("n_a_only"),
        F.when(both, est(F.theta_difference("__b", "__a")))
         .otherwise(side("__b")).alias("n_b_only"),
    )


#: DDSketch relative-accuracy target (Masson, Lee & Rong, VLDB 2019):
#: every quantile estimate is within ``DD_ALPHA`` relative error of the
#: true value at that rank, GUARANTEED (not probabilistic like KLL).
DD_ALPHA = 0.01
#: log-bucket base: values in (gamma^(i-1), gamma^i] share bucket i.
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
#: precomputed ln(gamma) — shared verbatim with the SQL oracle so both
#: engines divide by the identical double.
DD_LN_GAMMA = __import__("math").log(DD_GAMMA)


def dd_bucket(value_col: str):
    """DDSketch bucket index of a POSITIVE value: ``ceil(ln(v)/ln γ)``.
    The ratio is rounded to 6 dp before the ceil so engine libm ulp
    differences cannot flip a boundary bucket (the md5-determinism
    posture applied to floats)."""
    return F.ceil(F.round(F.log(F.col(value_col)) / F.lit(DD_LN_GAMMA), 6)) \
        .cast("long")


def quantile_state(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Mergeable quantile-sketch state (SURVEY §2.3 N58): per-group
    DDSketch log-bucket histogram ``(*group_cols, bucket, cnt)`` — the
    quantile mirror of the N48 distinct-count state.  One hash
    aggregation with map-side partials; state size is O(buckets) per
    group (≈ ln(max/min)/ln γ ≈ 460 buckets per decade-spanning group
    at α=1%), independent of data volume.  Only positive values are
    sketched (DDSketch's domain); NULLs and non-positives are the
    caller's pre-filter contract."""
    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .groupBy(*group_cols, dd_bucket(value_col).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_quantile_states(
    a: DataFrame,
    b: DataFrame,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Merge two quantile states: bucket-wise count sum — associative,
    commutative, and LOSSLESS (``merge(state(A), state(B)) =
    state(A ⊎ B)`` exactly, since bucketing is a pure per-value
    function), so merged-equals-full is an exact equality the driver
    can hash, not a tolerance."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def advance_quantile_state(
    prior: DataFrame,
    delta: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Advance materialized quantile state with only the delta rows:
    sketch the delta (the only data-sized work) and bucket-sum into the
    prior state.  Unlike the HLL register-max, count-sum is NOT
    idempotent under re-delivery — exactly-once delta delivery is the
    contract (the same contract as the N25 cell counts), which the
    changefeed's idempotent keys provide upstream."""
    return merge_quantile_states(
        prior, quantile_state(delta, value_col, group_cols=group_cols),
        group_cols=group_cols)


def dd_quantile_estimates(
    state: DataFrame,
    qs: list[float],
    *,
    group_cols: list[str],
) -> DataFrame:
    """Quantile estimates from the state alone (never the data):
    ``(*group_cols, n_values, q<pct>_est ...)``.  The value at rank
    ``ceil(q·n)`` lies in the first bucket whose cumulative count
    reaches that rank; the estimate ``2γ^b/(γ+1)`` (the bucket's
    geometric midpoint) is within α relative error of it by
    construction.  Cost: two windows + one agg over the BUCKET table —
    O(buckets) per group, KBs at any corpus scale."""
    from pyspark.sql import Window

    gc = [F.col(c) for c in group_cols]
    w_cum = (Window.partitionBy(*gc).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*gc)
    c = state.select(
        *group_cols, "bucket",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_all).alias("__n"))
    aggs = [F.max("__n").alias("n_values")]
    for q in qs:
        b_q = F.min(F.when(
            F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")), F.col("bucket")))
        est = F.round(
            F.lit(2.0) * F.pow(F.lit(DD_GAMMA), b_q) / F.lit(DD_GAMMA + 1), 4)
        aggs.append(est.alias(f"q{int(round(q * 100))}_est"))
    return c.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------- N65
#: Count-min geometry: D independent hash rows × W buckets.  Point
#: estimates overestimate by ≤ (CMS_BOUND_NUM/W)·N with probability
#: ≥ 1 − (1/CMS_BOUND_NUM)^D (Cormode & Muthukrishnan 2005, with the
#: integer 3 standing in for e so the bound check stays in exact
#: integer arithmetic both engines share).
CMS_DEPTH = 3
CMS_WIDTH = 256
CMS_BOUND_NUM = 3


def cms_bucket(item, depth: int, width: int = CMS_WIDTH):
    """Row-``depth`` bucket of ``item``: 8 md5 hex chars → BIGINT mod
    width.  Depth is salted into the digest input, so the D rows are
    independent; md5 exists in DuckDB, so the oracle replays the exact
    sketch."""
    return (F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(str(depth)),
                                                 item)), 1, 8), 16, 10)
            .cast("long") % width)


def cms_state(
    df: DataFrame,
    item_col: str,
    *,
    group_cols: list[str],
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Mergeable count-min sketch state (SURVEY §2.3 N65): per-group
    frequency sketch as ``(*group_cols, depth, bucket, cnt)`` rows —
    the point-frequency member of the sketch-state family (N48 HLL
    distincts, N51 theta set algebra, N58 DDSketch quantiles, N41
    Misra-Gries heavy hitters).  D hash aggregations' worth of state in
    ONE pass: the depth dimension is a D-way posexplode per item, then
    a single map-side-combined count.  State size is G × D × W rows —
    bounded by geometry, independent of data volume."""
    depths = F.array(*[
        cms_bucket(F.col(item_col), d, width) for d in range(CMS_DEPTH)])
    return (
        df.select(*group_cols,
                  F.posexplode(depths).alias("depth", "bucket"))
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms_states(
    a: DataFrame,
    b: DataFrame,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Bucket-wise count sum — associative, commutative, LOSSLESS
    (``merge(state(A), state(B)) = state(A ⊎ B)`` exactly, since the
    bucket of an item is a pure function), so advanced-equals-full is
    an exact equality the driver hashes, not a tolerance.  NOT
    idempotent under re-delivery: exactly-once delta delivery is the
    contract, same as the N58 quantile state."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def advance_cms_state(
    prior: DataFrame,
    delta: DataFrame,
    item_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Advance materialized CMS state with only the delta rows: sketch
    the delta (the only data-sized work) and bucket-sum into the prior
    state — state input is G × D × W rows, never the prior corpus."""
    return merge_cms_states(
        prior, cms_state(delta, item_col, group_cols=group_cols),
        group_cols=group_cols)


def cms_estimates(
    state: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Point-frequency estimates from the state alone:
    ``(*group_cols, item, est_cnt)`` with ``est = min over depth rows``
    of the item's bucket count (0 when a bucket row is absent).  The
    (tiny) probe table crosses the D depth literals and broadcasts onto
    the bounded state — the corpus is never touched.  By the CMS
    theorem the estimate NEVER underestimates; the registered query
    carries that invariant (and the ε-bound) as driver-hashed flags."""
    p = probes.select(
        *group_cols, F.col(item_col).alias("item"),
        F.posexplode(F.array(*[
            cms_bucket(F.col(item_col), d)
            for d in range(CMS_DEPTH)])).alias("depth", "bucket"))
    joined = p.join(state.withColumnRenamed("cnt", "__cnt"),
                    [*group_cols, "depth", "bucket"], "left")
    return (
        joined.groupBy(*group_cols, "item")
        .agg(F.min(F.coalesce("__cnt", F.lit(0))).alias("est_cnt"))
    )


def quantile_rank_normalize(
    df: DataFrame,
    state: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Quantile-rank normalization from sketch state (SURVEY §2.3
    N74) — the SORTLESS ``percent_rank``: map each positive value to
    its estimated within-group quantile rank using only the N58
    DDSketch histogram (``(group, bucket, cnt)`` rows), the standard
    feature-scaling transform (rank features are heavy-tail-robust
    where z-scores are not).

    Rank estimate: mid-rank within the value's bucket —
    ``(cum_below + cnt_bucket/2) / n``, computed as the exact rational
    ``(2·cum_below + cnt_bucket) / (2n)`` and half-up rounded at 4 dp,
    so both engines agree bit-for-bit.  Values in buckets the state
    never saw (possible when normalizing NEW data against an old
    state) clamp to the nearest observed bucket's boundary rank.

    Scale shape: a window-free alternative to ``percent_rank`` —
    Spark's exact form sorts every group; here the only per-row work
    is a bucket expression + a BROADCAST join against the bounded
    cum-count table (groups × buckets rows), so the corpus is never
    shuffled at all.  The state is mergeable/advanceable (N58), so the
    normalizer refreshes with deltas, never a rescan.
    """
    from pyspark.sql import Window

    # densify the cum table over every integer bucket in the state's
    # [lo, hi] span (bounded by sketch geometry, ~460/decade): interior
    # buckets the state never saw then carry the correct cum-below and
    # cnt 0 instead of mis-clamping to an endpoint
    span = state.groupBy(*group_cols).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"),
        F.sum("cnt").alias("__n2"))
    grid = span.select(
        *group_cols,
        F.explode(F.sequence("__lo", "__hi")).alias("bucket"))
    dense = grid.join(state, [*group_cols, "bucket"], "left") \
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = dense.select(
        *group_cols, "bucket", F.col("cnt"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("__below"),
        F.sum("cnt").over(w_all).alias("__n"))
    vals = df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0)) \
        .withColumn("bucket", dd_bucket(value_col))
    j = vals.join(F.broadcast(cum), [*group_cols, "bucket"], "left")
    # out-of-span buckets clamp to the endpoints
    j = j.join(F.broadcast(span), group_cols, "left")
    below = F.when(F.col("__n").isNotNull(), F.col("__below")) \
        .when(F.col("bucket") < F.col("__lo"), F.lit(0)) \
        .otherwise(F.col("__n2"))
    in_bucket = F.coalesce(F.col("cnt"), F.lit(0))
    n = F.coalesce(F.col("__n"), F.col("__n2"))
    num = (2 * below + in_bucket).cast("long")
    den = (2 * n).cast("long")
    a = 20000 * num + den
    b = 2 * den
    rank = F.when(
        den > 0,
        (((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000),
    )
    return j.select(
        *[c for c in df.columns], rank.alias("q_rank"))


def winsorize(
    df: DataFrame,
    state: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> DataFrame:
    """Sketch-state winsorization (SURVEY §2.3 N75): clip each value to
    its group's ``[q_lo, q_hi]`` quantile estimates derived from the
    N58 DDSketch histogram state — the robust feature-prep transform
    (tail outliers dominate means and gradient scales; winsorizing at
    state-derived bounds needs NO sort and NO second scan of history).

    The bounds come from :func:`dd_quantile_estimates` (4-dp bucket
    midpoints, deterministic); clipping is a broadcast join of the
    one-row-per-group bounds table + two comparisons in codegen.
    Output adds ``v_winsorized`` (4-dp, exact comparisons both
    engines share) and ``was_clipped``.  Like the N74 rank transform,
    the corpus is never shuffled and the bounds refresh with state
    deltas."""
    bounds = dd_quantile_estimates(state, [q_lo, q_hi],
                                   group_cols=group_cols)
    lo_c = f"q{int(round(q_lo * 100))}_est"
    hi_c = f"q{int(round(q_hi * 100))}_est"
    v = F.col(value_col)
    j = df.join(F.broadcast(bounds.select(*group_cols, lo_c, hi_c)),
                group_cols, "left")
    clipped = F.least(F.greatest(v, F.col(lo_c)), F.col(hi_c))
    return j.select(
        *df.columns,
        F.round(clipped, 4).alias("v_winsorized"),
        ((v < F.col(lo_c)) | (v > F.col(hi_c))).alias("was_clipped"))


#: Sketch width for join-size estimation.  The inner-product
#: estimator's expected overestimate is |A|·|B|/W per depth row — the
#: point-frequency width (256) would be a ~7× overestimate at 15 k×1.5 k
#: keys, useless to a planner.  4096 buckets keep the state at
#: D×W = 12 288 rows (still KBs) while the expected error drops 16×.
CMS_JOIN_WIDTH = 4096


def cms_join_size(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    *,
    width: int = CMS_JOIN_WIDTH,
) -> DataFrame:
    """Join-cardinality estimate from two CMS sketches (SURVEY §2.3
    N103): ``|A ⋈_k B| ≈ min_d Σ_b sketch_A[d][b] · sketch_B[d][b]``
    — the AMS/CMS inner-product estimator (Cormode & Muthukrishnan
    2005 §4.2).  This is the cost-based-optimizer primitive: a
    fact-fact join's output size from two KB-sized summaries, without
    executing the join.  Collisions only ever ADD mass, so the
    estimate NEVER underestimates, and it overestimates by more than
    ``(CMS_BOUND_NUM/W)·|A|·|B|`` with probability ≤
    ``(1/CMS_BOUND_NUM)^D``.

    NULL keys are excluded on both sides (an equi join never matches
    them).  Returns one row ``(est_rows)``.  Scale: each side is one
    map-side-combined pass (the irreducible read); everything after is
    D × W rows."""
    sa = cms_state(
        a.filter(F.col(key_a).isNotNull())
        .select(F.col(key_a).cast("string").alias("__k")),
        "__k", group_cols=[], width=width)
    sb = cms_state(
        b.filter(F.col(key_b).isNotNull())
        .select(F.col(key_b).cast("string").alias("__k")),
        "__k", group_cols=[], width=width)
    return cms_inner_product(sa, sb)


def cms_inner_product(sa: DataFrame, sb: DataFrame) -> DataFrame:
    """The inner-product estimate from two PREBUILT ``cms_state``
    frames (r13 split from :func:`cms_join_size` so a caller that also
    needs per-side statistics can derive everything from ONE sketch per
    side — the same subtree then appears multiple times in one plan and
    AQE's exchange reuse materializes it once)."""
    ip = (
        sa.withColumnRenamed("cnt", "cnt_a")
        .join(sb.withColumnRenamed("cnt", "cnt_b"), ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip")))
    return ip.agg(F.min("ip").cast("long").alias("est_rows"))
