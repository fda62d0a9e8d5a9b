"""Warehouse sink — the reference's Hive write (S12).

``df.write.mode(Overwrite).saveAsTable`` (``HBaseSnapshotter.scala:
134-137``) is already the idiomatic PySpark API; this wrapper adds the
options that matter at 100 TB: explicit format, optional partitioning,
and optional bucketing so repeated snapshot⋈snapshot / delta-merge joins
co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_snapshot(
    df: DataFrame,
    table: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(table)
