"""Warehouse sink — the reference's Hive write (S12).

``df.write.mode(Overwrite).saveAsTable`` (``HBaseSnapshotter.scala:
134-137``) is already the idiomatic PySpark API; this wrapper adds the
options that matter at 100 TB: explicit format, optional partitioning,
and optional bucketing so repeated snapshot⋈snapshot / delta-merge joins
co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    shard_key: str,
    num_shards: int,
    sort_by: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """Fixed-count, deterministic shard layout for training consumption.

    Data loaders want a known shard count with STABLE membership (so
    resumable / distributed reads see the same shard ↔ row mapping on
    every run): rows route to shards by hash of ``shard_key`` (Spark's
    HashPartitioning — content-determined, not round-robin, so
    membership survives reruns, cluster resizes, and input
    repartitioning), at most one output file per shard.  ``sort_by``
    additionally fixes the intra-shard row order (sequential shard
    streaming is deterministic end-to-end).  At 100 TB pick
    ``num_shards`` ≈ total_bytes / desired_shard_bytes; the write's
    only shuffle is the routing exchange.

    Contract detail loaders must honor: an EMPTY shard writes no part
    file (Spark emits nothing for an empty non-zero partition), so with
    skewed or low-cardinality keys fewer than ``num_shards`` files can
    appear.  The intended count is therefore recorded in a
    ``_SHARDS.json`` manifest next to the data — enumerate shards from
    the manifest (:func:`read_training_shards`), treat a missing ordinal
    as empty, never glob and assume density.

    The manifest goes through the Hadoop FileSystem API, so it lands
    next to the data on ANY supported scheme (hdfs://, s3a://, file:)
    — a driver-local ``open()`` would break on every non-local path.
    It is written after the data and the two are not atomic together: a
    crash in between leaves data without a manifest, which loaders must
    treat as an incomplete write (same contract as a missing _SUCCESS)."""
    out = df.repartition(num_shards, F.col(shard_key))
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").format(format).save(path)
    import json

    manifest = {"num_shards": num_shards, "shard_key": shard_key,
                "sort_by": sort_by or [], "format": format}
    _write_text_via_hadoop_fs(
        df.sparkSession, f"{path}/{SHARDS_MANIFEST}", json.dumps(manifest))


SHARDS_MANIFEST = "_SHARDS.json"


def _write_text_via_hadoop_fs(spark, path: str, text: str) -> None:
    """Small-file write through the JVM Hadoop FileSystem (scheme-aware:
    file:, hdfs://, s3a://, …) — the sanctioned way to place sidecar
    metadata next to Spark output."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def _read_text_via_hadoop_fs(spark, path: str) -> str:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    try:
        # py4j passes byte[] by value, so read-into-buffer can't mutate a
        # Python bytearray — drain the stream JVM-side instead
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(raw).decode("utf-8")
    finally:
        stream.close()


def read_training_shards(spark, path: str, *, format: str | None = None):
    """Loader-side twin of :func:`write_training_shards`: reads the
    ``_SHARDS.json`` manifest (REQUIRED — its absence means the write
    never completed) and returns ``(manifest, DataFrame)``.  The
    manifest is the source of truth for the intended shard count; a
    missing part-file ordinal is an empty shard, not an error, so
    loaders size their read plan from ``manifest['num_shards']`` and
    tolerate sparse files."""
    import json

    manifest = json.loads(
        _read_text_via_hadoop_fs(spark, f"{path}/{SHARDS_MANIFEST}"))
    fmt = format or manifest.get("format", "parquet")
    return manifest, spark.read.format(fmt).load(path)
