"""Binned range join — a pure interval join without the nested loop.

A join whose ONLY condition is a range predicate (``lo <= v < hi``) has
no equi key, so Spark plans ``BroadcastNestedLoopJoin``: every fact row
is checked against every band — O(|fact|·|bands|) comparisons, the
classic 100 TB cliff (fine at 25 bands, fatal at 10⁶ intervals).

The standard fix is binning: quantize the value domain into fixed-width
bins, explode each band to the bins it overlaps, and equi-join on the
bin id with the exact range as a residual filter.  Cost becomes
O(|fact| + Σ band-widths/bin_width) shuffle rows through a plain hash
join — broadcastable when bands are small, shuffle-joinable when not.
``bin_width`` trades replication (≈ avg band width / bin_width copies
per band) against residual selectivity; set it near the median band
width.

The same trick underlies interval-overlap joins (genomics, IP ranges,
time-range enrichment); Databricks' range-join optimization and
DuckDB's IEJoin solve the same problem engine-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_bin_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    *,
    bin_width: float,
) -> DataFrame:
    """Inner-join ``fact`` rows to every band with
    ``lo <= value < hi`` (half-open, so adjacent bands never
    double-match a boundary value) via bin-equi-join + residual.

    Output: fact columns + band columns (minus the internal bin id).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = float(bin_width)
    b = bands.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / w).cast("long"),
            F.floor(F.col(hi_col) / w).cast("long"),
        )),
    )
    f = fact.withColumn("__bin", F.floor(F.col(value_col) / w).cast("long"))
    return (
        f.join(b, "__bin")
        .filter((F.col(value_col) >= F.col(lo_col))
                & (F.col(value_col) < F.col(hi_col)))
        .drop("__bin")
    )
