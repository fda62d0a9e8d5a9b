"""Distributed heavy hitters (SURVEY §2.3 N41): Misra-Gries
per-partition summaries + an exact verification pass.

The frequent-items question ("which tokens/domains/keys exceed φ of the
corpus?") is the diagnostic BEFORE the skew machinery in
:mod:`~.skew` — you salt the keys this operator surfaces.  The naive
answer (full ``groupBy(item).count()``) shuffles one row per DISTINCT
item per map partition: at 100 TB the item domain (tokens, URLs,
join keys) is billions wide and the histogram shuffle dominates.

Misra-Gries bounds the summary instead: ``k`` counters per partition,
and the classic guarantee — any item with partition frequency
> n_p/(k+1) survives its partition's summary — lifts to the global
claim: any item with TOTAL frequency > n/(k+1) survives in at least
one summary (if it is ≤ n_p/(k+1) in every partition, summing gives
≤ n/(k+1)).  With ``k = ceil(1000/support_permille)`` the candidate
set provably contains every item at or above the support threshold:
ZERO false negatives, shuffle bounded by k × partitions rows.

The second pass restores EXACTNESS (the bloom-novelty posture of
:mod:`~.bloom`: sketch to prune, exact operator to answer): candidates
broadcast, one map-side-combined count over only candidate instances,
and the integer-permille filter ``count × 1000 ≥ permille × total``
(exact integer arithmetic, no float threshold — the
:func:`~.sampling.domain_cap` convention).  The MG pruning is thereby
PERFORMANCE, not semantics — the output is bit-identical to the full
histogram's, which is exactly what the DuckDB oracle replays, and why
partition order (which MG summaries are sensitive to) cannot affect
the result.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """One-column candidate DataFrame: the union of per-partition
    Misra-Gries summaries (≤ ``k`` items each).

    Summaries are maintained per Arrow batch, vectorized: the batch's
    exact histogram (``value_counts``) merges into the running summary,
    which is then pruned back to ``k`` counters by subtracting the
    (k+1)-largest count from all (the mergeable-summaries form of the
    MG decrement, Agarwal et al. 2012) — per-batch work is
    O(batch_distinct · log k), no per-item Python loop."""
    if k < 1:
        raise ValueError(f"mg_candidates: k must be >= 1, got {k}")

    def summarize(batches):
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf[col].value_counts()
            summary = summary.add(counts, fill_value=0)
            if len(summary) > k:
                top = summary.nlargest(k + 1)
                summary = (top - top.iloc[-1]).iloc[:-1]
                summary = summary[summary > 0]
        # empty partitions leave an int64-typed empty index — pin the
        # Arrow column to string explicitly
        yield pd.DataFrame({col: summary.index.astype(str)})

    return items.select(col).mapInPandas(summarize, f"{col} string").distinct()


def heavy_hitters(
    items: DataFrame,
    col: str,
    *,
    support_permille: int,
    k: int | None = None,
) -> DataFrame:
    """Items occurring in at least ``support_permille``/1000 of all
    item instances, with EXACT counts and shares:
    ``(item, n_occurrences, share)``.

    ``k`` (counters per partition) defaults to
    ``ceil(1000 / support_permille)``, the smallest count honoring the
    no-false-negative guarantee; a larger ``k`` only widens the
    candidate set.  NULL items are ignored (no NULL key is a heavy
    hitter of record).  The total is attached as a ONE-row broadcast
    aggregate (the scalar-attach shape); the only data-sized shuffle
    is the candidate-pruned count aggregation."""
    if not 1 <= support_permille <= 1000:
        raise ValueError(
            f"heavy_hitters: support_permille must be in [1, 1000], "
            f"got {support_permille}")
    if k is None:
        k = -(-1000 // support_permille)  # ceil
    inst = items.select(col).filter(F.col(col).isNotNull())
    cand = mg_candidates(inst, col, k)
    total = inst.agg(F.count(F.lit(1)).alias("__total"))
    exact = (
        inst.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * 1000
                >= F.lit(support_permille) * F.col("__total"))
        .select(
            col,
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("__total"), 6).alias("share"),
        )
    )


def mg_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries WITH their error accounting —
    the mergeable form (Agarwal et al. 2012) the streaming maintainer
    (:mod:`~.streaming.freq_stream`, N81) advances across micro-batches.

    One distributed pass; each partition yields rows of three kinds
    (schema ``(item, cnt, kind)``):

    - ``kind='counter'``: the partition's surviving MG counters —
      ``cnt`` LOWER-bounds the item's partition frequency, and
      ``cnt + dec`` upper-bounds it;
    - ``kind='dec'`` (one row): the partition's cumulative decrement
      ``dec`` — every prune subtracts the (k+1)-largest count from all
      counters, and decrements across partitions/merges ADD;
    - ``kind='total'`` (one row): the partition's non-null instance
      count, so the caller gets ``n`` without a second scan.

    Everything downstream of this pass is summary-sized:
    ≤ (k + 2) × partitions rows."""
    if k < 1:
        raise ValueError(f"mg_summaries: k must be >= 1, got {k}")

    def summarize(batches):
        summary = pd.Series(dtype="int64")
        dec = 0
        total = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            total += int(len(vals))
            counts = vals.value_counts()
            summary = summary.add(counts, fill_value=0)
            if len(summary) > k:
                top = summary.nlargest(k + 1)
                cut = int(top.iloc[-1])
                dec += cut
                summary = (top - cut).iloc[:-1]
                summary = summary[summary > 0]
        yield pd.DataFrame({
            col: list(summary.index.astype(str)) + [None, None],
            "cnt": list(summary.values.astype("int64")) + [dec, total],
            "kind": ["counter"] * len(summary) + ["dec", "total"],
        })

    return items.select(col).mapInPandas(
        summarize, f"{col} string, cnt long, kind string")


def mg_merge(
    counters: dict[str, int], dec: int, new: list[tuple[str, int]], k: int,
) -> tuple[dict[str, int], int]:
    """Driver-side merge of MG summaries (all inputs are sketch-sized —
    ≤ k counters each; the BPE-vocabulary-loop collect posture): add
    the ``new`` (item, cnt) rows into ``counters``, then prune back to
    ``k`` by subtracting the (k+1)-largest count from all — returning
    the pruned counters and the grown cumulative decrement.

    Invariants carried (and pytest-pinned): for every tracked item,
    ``cnt ≤ true ≤ cnt + dec``; for untracked, ``true ≤ dec``; and
    ``dec ≤ n/(k+1)`` always, because each prune subtracts its cut
    from ≥ k+1 counters of conserved total mass."""
    merged = dict(counters)
    for item, cnt in new:
        merged[item] = merged.get(item, 0) + cnt
    if len(merged) > k:
        by_cnt = sorted(merged.values(), reverse=True)
        cut = by_cnt[k]
        dec += cut
        merged = {i: c - cut for i, c in merged.items() if c > cut}
    return merged, dec
