"""Multi-dimensional data layout — Z-order (Morton-curve) clustering.

The reference's output layout is whatever Hive gives it
(``HBaseSnapshotter.scala:134-137``); at 100 TB the LAYOUT of the
warehouse table governs how much of it any query reads.  Partitioning
and bucketing (sources/warehouse.py) cluster on ONE key each; queries
that filter on a *different* dimension read everything.  Z-ordering —
the Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern — interleaves the bits
of several dimensions into one clustering key, so file-level min/max
stats prune scans on ANY of the interleaved dimensions (each of d
dimensions degrades to ~n^(1-1/d) of the files instead of all of them).

Everything here is pure column expressions (whole-stage codegen, zero
shuffle for the key itself):

- :func:`grid_coord` — exact integer grid quantization of a dimension
  against broadcast one-row min/max bounds (BIGINT arithmetic only, so
  the SQL oracle replays it bit-for-bit; floats would round
  differently per engine).
- :func:`zorder_value` — bit interleaving of two grid coordinates into
  the Morton code (a static sum of shift/mask terms).
- :func:`zorder_bucket` — the top ``log2(n_buckets)`` bits of the
  Morton code: the write-side clustering key.  Writing with
  ``partitionBy(bucket)`` (or range-partitioning on it) yields files
  whose per-dimension min/max spans are tight on BOTH dimensions —
  which is the whole point, and what the audit query measures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code (16-bit z for 2 dims).
Z_BITS = 8


def grid_coord(x: Column, xmin: Column, xmax: Column, *,
               bits: int = Z_BITS) -> Column:
    """Quantize ``x`` onto the ``[0, 2**bits)`` integer grid spanned by
    inclusive bounds ``[xmin, xmax]``: ``(x - xmin) * 2**bits ÷ (xmax -
    xmin + 1)`` in BIGINT arithmetic — exact, monotone, and < 2**bits
    for every in-range x (the numerator is at most ``(range-1) *
    2**bits`` and the divisor is ``range``)."""
    cells = F.lit(1 << bits).cast("bigint")
    rng = (xmax - xmin + F.lit(1)).cast("bigint")
    return F.floor(((x - xmin).cast("bigint") * cells) / rng).cast("bigint")


def zorder_value(b1: Column, b2: Column, *, bits: int = Z_BITS) -> Column:
    """Morton code of two ``bits``-wide grid coordinates: bit i of
    ``b1`` lands at position 2i+1, bit i of ``b2`` at 2i.  A static sum
    of ``2*bits`` shift/mask terms — whole-stage codegen folds it into
    straight-line arithmetic."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (F.shiftright(b1, i).bitwiseAND(F.lit(1))
                 * F.lit(1 << (2 * i + 1)).cast("bigint"))
        z = z + (F.shiftright(b2, i).bitwiseAND(F.lit(1))
                 * F.lit(1 << (2 * i)).cast("bigint"))
    return z


def zorder_bucket(z: Column, *, n_buckets: int, bits: int = Z_BITS) -> Column:
    """Top ``log2(n_buckets)`` bits of the Morton code — the clustering
    bucket.  Because high Morton bits alternate between the two
    dimensions' high bits, every bucket is a square-ish tile of the
    2-D grid: tight min/max on BOTH dimensions."""
    shift = 2 * bits - (n_buckets - 1).bit_length()
    return F.shiftright(z, shift)


def _int_div(a: Column, b: Column) -> Column:
    """Exact BIGINT floor-division (both operands non-negative) — the
    ``(a - a mod b) / b`` idiom, replayed verbatim by DuckDB's ``//``."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def equidepth_bucket(q_rank: Column, n_buckets: int) -> Column:
    """Equi-depth layout bucket from a 4-dp quantile rank (the N74
    sortless ``percent_rank``): ``⌊rank · B⌋`` clamped to ``B-1`` —
    computed in BIGINT arithmetic on the rank's 4-dp integer form, so
    no float product can straddle a bucket boundary differently per
    engine.  Range-partitioning the write on this bucket yields files
    of ~equal ROW COUNT however skewed the value distribution — the
    property fixed-width bucketing loses (the audit query measures
    both)."""
    r = F.round(q_rank * 10000).cast("long")
    return F.least(_int_div(r * n_buckets, F.lit(10000).cast("long")),
                   F.lit(n_buckets - 1).cast("long"))


def fixed_width_bucket_micro(vi: Column, vmin: Column, vmax: Column,
                             n_buckets: int) -> Column:
    """Fixed-width bucket over the inclusive micro-unit range
    ``[vmin, vmax]`` (values pre-scaled to 4-dp BIGINT micro-units, the
    ``grid_coord`` discipline): ``(vi - vmin) · B ÷ (vmax - vmin + 1)``
    in exact BIGINT arithmetic — the naive layout the audit contrasts
    equi-depth against."""
    return _int_div((vi - vmin) * F.lit(n_buckets).cast("bigint"),
                    (vmax - vmin + F.lit(1)).cast("bigint"))
