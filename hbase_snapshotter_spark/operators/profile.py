"""Single-pass column profiling / data-quality audit (SURVEY §2.3 N33).

Every serious ingestion pipeline fronts its 100 TB tables with a
profiling pass (Deequ/Great Expectations shape): per-column
completeness, cardinality, range, and central tendency, computed in ONE
scan so the audit costs a read, not a read per metric.

Spark-first form: all metrics for all columns are expressions of a
single ``df.agg(...)`` — one scan, map-side partial aggregation, a
one-row result — then ``F.inline`` pivots that row into the long
(one-row-per-column) audit table, a driver-free O(C) reshape.

Cardinality carries BOTH estimators on purpose:

- ``approx_distinct`` — HyperLogLog++ (`approx_count_distinct`), the
  100 TB path: constant memory, merges in the map-side partials, never
  widens the plan;
- ``n_distinct`` — exact, the oracle-replayable path.  Multiple exact
  distincts in one aggregate make Catalyst plan an ``Expand`` (the
  input is duplicated once per distinct column); that is the documented
  price of exactness, and at production scale the profiler is run with
  ``exact_distinct=False`` to drop the Expand and keep only the HLL
  (same one-scan plan minus the duplication).

The two estimators meet in ``approx_distinct_ok`` — |HLL − exact| ≤
rel_tol·exact — folded into the value hash so an HLL accuracy
regression turns the driver row red (the `agg_approx_distinct`
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: HLL relative-error target (Spark's default rsd is 0.05); the audit
#: flag allows 3× the target so a correct sketch never trips it.
PROFILE_RSD = 0.05
PROFILE_REL_TOL = 0.15


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-scan profile of ``numeric_cols`` + ``string_cols``: returns
    one row per column — ``(column, n_rows, n_nulls, n_distinct,
    approx_distinct_ok, min_num, max_num, mean_num, min_str, max_str,
    avg_len)`` — numeric stats NULL for string columns and vice versa.

    ``exact_distinct=False`` is the 100 TB mode: ``n_distinct`` is
    emitted as the HLL estimate itself (flag trivially true) and the
    plan loses the Expand duplication that exact multi-column distinct
    requires."""
    cols = numeric_cols + string_cols
    if len(set(cols)) != len(cols):
        raise ValueError(f"profile_columns: duplicate columns in {cols}")
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(c).alias(f"__cnt_{c}"))
        aggs.append(
            F.approx_count_distinct(c, PROFILE_RSD).alias(f"__apx_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__dst_{c}"))
    for c in numeric_cols:
        aggs += [
            F.min(c).cast("double").alias(f"__min_{c}"),
            F.max(c).cast("double").alias(f"__max_{c}"),
            F.round(F.avg(c), 4).alias(f"__avg_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.round(F.avg(F.length(F.col(c).cast("string"))), 4)
             .alias(f"__len_{c}"),
        ]
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def _distinct(c: str):
        return (F.col(f"__dst_{c}") if exact_distinct
                else F.col(f"__apx_{c}").cast("long"))

    def _flag(c: str):
        if not exact_distinct:
            return F.lit(True)
        return (
            F.abs(F.col(f"__apx_{c}") - F.col(f"__dst_{c}"))
            <= F.lit(PROFILE_REL_TOL) * F.col(f"__dst_{c}"))

    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            _distinct(c).alias("n_distinct"),
            _flag(c).alias("approx_distinct_ok"),
            F.col(f"__min_{c}").alias("min_num"),
            F.col(f"__max_{c}").alias("max_num"),
            F.col(f"__avg_{c}").alias("mean_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            null_d.alias("avg_len"),
        )
        for c in numeric_cols
    ] + [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            _distinct(c).alias("n_distinct"),
            _flag(c).alias("approx_distinct_ok"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            null_d.alias("mean_num"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
            F.col(f"__len_{c}").alias("avg_len"),
        )
        for c in string_cols
    ]
    return one.select(F.inline(F.array(*rows)))
