"""As-of (temporal) join — N6 in the SURVEY §2 inventory.

Spark SQL has no native ASOF JOIN; the scalable composition is the
union-tag + window pattern rather than an inequality join (which
explodes to |L|·|R| per key before pruning):

1. project both sides to ``(key, t, side, payload)`` and union;
2. one window sorted by ``(t, side)`` per key carries the most recent
   right payload forward (``last(ignorenulls=True)``);
3. keep left rows, unpack the matched payload.

Cost at scale: ONE shuffle of |L|+|R| rows by key + a per-partition
sort — the same lower bound a native ASOF merge join would pay.  No
row explosion for hot keys, no range-join blowup.  Skewed keys can be
salted upstream; AQE handles moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_ms: int | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward; inclusive) sharing the join key —
    or the earliest with ``right_ts >= left_ts`` for ``forward``.

    Right rows should be unique per ``(key, right_ts)`` (pre-dedup with
    ``latest_per_key``) so the match is deterministic.  Unmatched left
    rows keep NULL right columns (left-outer semantics).
    ``tolerance_ms`` bounds the time gap (timestamps compared in epoch
    millis) like pandas ``merge_asof(tolerance=...)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")

    right_cols = [c for c in right.columns if c not in keys]
    out_names = {c: f"{right_prefix}{c}" for c in right_cols}

    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )

    # backward: right row at equal t must precede left rows → sort (t, side)
    # ascending. forward: reverse time, same trick.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__is_left").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__is_left").asc()]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .withColumn("__mt", F.last(F.when(F.col("__is_left") == 0, F.col("__t")),
                                   ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_ms is not None:
        gap = F.abs(F.unix_millis(F.col("__t")) - F.unix_millis(F.col("__mt")))
        matched = matched.withColumn(
            "__m", F.when(gap <= tolerance_ms, F.col("__m"))
        )

    out = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out += [F.col(f"__m.{c}").alias(out_names[c]) for c in right_cols]
    return matched.select(*out)
