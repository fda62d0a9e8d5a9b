"""Skew-handling aggregation (100 TB toolbox).

AQE's skew-join splitting handles joins; for *aggregations* with a few
white-hot keys (a handful of group values receiving most rows — exactly
the shape of ``l_returnflag`` or a status column), a salted two-stage
aggregation spreads each hot key over N reducers:

    stage 1: groupBy(keys…, salt = pmod(hash(cols…), N))  → partial aggs
    stage 2: groupBy(keys…)                               → combine

Both stages are hash aggregations with map-side partials, so the extra
stage costs one narrow pass over ``#groups × N`` rows — noise — while the
hottest reducer's load drops by ~N×.

Only algebraic aggregates compose across stages; this operator supports
sum / count / min / max (avg = sum/count, derived in stage 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STAGE1 = {
    "sum": F.sum, "count": lambda c: F.count(F.lit(1)) if c is None else F.count(c),
    "min": F.min, "max": F.max,
}
_STAGE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _salt_expr(salt_cols: list[str] | None, salt_buckets: int) -> Column:
    """Per-row salt in ``[0, salt_buckets)``.

    With ``salt_cols`` the salt is a CONTENT HASH of those columns —
    fully deterministic, so a recomputed map task re-emits every row
    under the same salt and shuffle-retry is safe.  Pass a unique id
    column (or the key of a unique composite) here whenever the input
    has one: that is both retry-deterministic AND spread-preserving
    even when the non-key payload of hot rows is byte-identical.

    Without ``salt_cols`` the salt is a round-robin on
    ``monotonically_increasing_id()`` (+ partition id, so small
    partitions don't all start their residues at 0 — the raw id is
    ``pid << 33 | row_index`` and ``2^33 ≡ 0 (mod 2^k)``).  This spreads
    even byte-identical duplicate rows and accepts any column types
    (``F.hash`` rejects MapType), BUT the id depends on row order
    within the partition, which is not stable for a recomputed shuffle
    output: on a shuffle-fetch-failure retry (the SPARK-23207 shape) a
    re-run map task can re-emit rows under different salts while some
    reducers already fetched the old output — rows double-counted or
    dropped unless Spark rolls the whole stage back, which its
    indeterminate-stage handling does not guarantee for this
    expression.  Totals are only guaranteed when no partial stage
    recompute occurs; prefer ``salt_cols`` on any input that has a
    unique key.
    """
    if salt_cols:
        return F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    return F.pmod(
        F.monotonically_increasing_id() + F.spark_partition_id(),
        F.lit(salt_buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str | None, str, str]],
    *,
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` is a list of ``(column, fn, alias)`` with fn ∈ sum / count /
    min / max / avg (column ``None`` for count(*)).  ``salt_cols``, when
    given, derives the salt from those columns' content — deterministic,
    hence shuffle-retry-safe; pass a unique id column to keep the spread
    even for duplicate payload rows.  The default is a per-row
    round-robin — content-independent (fully-duplicate hot rows still
    spread, MapType columns accepted) but indeterminate under partial
    stage retry; see :func:`_salt_expr` for the full trade-off.
    The salt value never affects the result — any assignment combines
    to the same totals — so the output is row-for-row identical to
    ``df.groupBy(keys).agg(...)`` whichever salt is used.
    """
    salt = _salt_expr(salt_cols, salt_buckets)

    stage1_cols: list[Column] = []
    stage2_cols: list[Column] = []
    for i, (col, fn, alias) in enumerate(aggs):
        if fn == "avg":
            stage1_cols += [F.sum(col).alias(f"__s{i}"), F.count(col).alias(f"__c{i}")]
            stage2_cols.append((F.sum(f"__s{i}") / F.sum(f"__c{i}")).alias(alias))
        elif fn in _STAGE1:
            stage1_cols.append(_STAGE1[fn](col).alias(f"__a{i}"))
            stage2_cols.append(_STAGE2[fn](f"__a{i}").alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_cols)
    return partial.groupBy(*keys).agg(*stage2_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-proof equi-join: salt the big (skewed) side, replicate the
    small side once per salt bucket, join on (keys…, salt).

    A hot join key that would land on one reducer spreads over
    ``salt_buckets`` of them; the cost is a ``salt_buckets``× blowup of
    the SMALL side only (explode of a literal range — narrow, no
    shuffle added).  Result is row-identical to ``big.join(small, on,
    how)`` for inner and left joins.

    This is the manual form of AQE's skew-join splitting — needed when
    AQE can't see the skew (first run, no stats), when the skew is in a
    bucketed/pre-shuffled table AQE won't re-split, or on engines
    without runtime re-planning.  Keep AQE on regardless; the two
    compose.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # The salt never affects the join RESULT (the small side carries
    # every salt value), but the default round-robin salt is
    # indeterminate under partial stage retry — pass ``salt_cols``
    # (a unique id of the big side) for the retry-safe deterministic
    # form; see _salt_expr for the full trade-off.
    salt = _salt_expr(salt_cols, salt_buckets)
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return b.join(s, [*on, "__salt"], how).drop("__salt")


def measured_salt_buckets(
    df: DataFrame,
    keys: list[str],
    *,
    parallelism: int | None = None,
    k: int = 256,
    max_buckets: int = 256,
) -> int:
    """Salt-bucket count derived from the MEASURED hottest-key share —
    the N80 posture (measure, then tune) applied to the skew knob
    (SURVEY §2.3 N82).

    A fixed ``salt_buckets`` is wrong in both directions: too small
    leaves the hot reducer hot, too large pays the stage-2 combine
    (and the ``salt_buckets``× small-side blowup of
    :func:`salted_join`) on balanced data.  The right number is
    ``⌈p_max · parallelism⌉`` — spread the hottest key until its
    per-reducer share matches everyone else's — and ``p_max`` is
    measurable in one pass: a Misra-Gries summary
    (:func:`~.freq.mg_summaries`, summary-sized collect) bounds the
    hottest key's count within ``dec ≤ n/(k+1)``, so the share
    estimate is conservative by at most 1/(k+1) — at the default
    k=256, under half a percent.

    Returns 1 (no salting — the two-stage pass would cost a shuffle
    for nothing) when even the UPPER bound of the hottest share fits
    a single reducer's fair load.  The summary itself depends on the
    input partitioning (MG is order-sensitive), but the decrement
    bound does not — so across layouts the estimate stays within
    1/(k+1) of the true share and the selected bucket count jitters
    by at most ⌈parallelism/(k+1)⌉, never flipping a clearly-skewed
    input to 1 or a clearly-balanced one past it."""
    import math

    from hbase_snapshotter_spark.operators.freq import mg_summaries

    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    key = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                  for c in keys]).alias("__k")
    rows = mg_summaries(df.select(key), "__k", k).collect()
    n = sum(r["cnt"] for r in rows if r["kind"] == "total")
    if n == 0:
        return 1
    dec = sum(r["cnt"] for r in rows if r["kind"] == "dec")
    # summaries are PER-PARTITION: merge counters by item first (the
    # per-item sum of partition counters lower-bounds its true count;
    # partition decrements ADD), then take the hottest
    merged: dict[str, int] = {}
    for r in rows:
        if r["kind"] == "counter":
            merged[r["__k"]] = merged.get(r["__k"], 0) + r["cnt"]
    p_upper = (max(merged.values(), default=0) + dec) / n
    if p_upper * parallelism <= 1.0:
        return 1
    return max(1, min(max_buckets, math.ceil(p_upper * parallelism)))
