"""Continuous snapshot maintenance over a streaming change log.

The reference snapshots on demand (one batch job per timestamp); its
documented follow-up — "delta imports containing row updates … group by
k_hbase_row_key and select the latest" (``Schema.scala:123-127``) — is
exactly incremental snapshot maintenance.  This module automates it:

    readStream(change log) → foreachBatch:
        merge the batch's latest cells into a tall cell-state table
        (latest version per (row_key, family, qualifier))

The maintained state IS a change-log prefix reduced to one row per cell,
so materializing the typed snapshot at any moment is the ordinary
``snapshot_as_of(state, schema, ts)`` — same operator, zero special
cases.  State versions are written to ``state_dir/v{batch}`` with a
marker file advanced atomically (os.replace), so a crash mid-batch never
corrupts the previous version; stale versions are pruned.

Scale: the merge is latest-cells over (previous state ∪ new batch) —
one aggregation keyed by cell; state size is bounded by the live cell
count, not by history, so the per-batch shuffle is live-cells + batch.
(Plain ``bucketBy`` does NOT remove the state side from that shuffle —
Spark re-partitions the unioned stream regardless, verified in the
physical plan; eliminating it needs a storage-level transactional MERGE
with bucketing-aligned join keys, which Delta/Iceberg provide with this
same merge logic.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hbase_snapshotter_spark.streaming.windows import (
    start_foreach_batch,
)
from hbase_snapshotter_spark.operators.snapshot import (
    advance_latest_cells,
    latest_cells,
    state_changefeed,
)

_MARKER = "CURRENT"


class SnapshotMaintainer:
    """foreachBatch sink maintaining latest-cell state under ``state_dir``.

    With ``feed_dir`` set, every batch ALSO publishes its downstream
    changefeed (N50 run continuously): the I/U/D delta between the
    previous and new state, written to ``feed_dir/b{batch_id}`` with
    per-batch OVERWRITE — so a crash-replayed batch rewrites the same
    feed instead of appending duplicates, and a re-delivered batch
    (no-op state advance) publishes an EMPTY feed.  The first batch's
    feed is all-inserts (delta against the empty state)."""

    def __init__(self, state_dir: str, feed_dir: str | None = None):
        self.state_dir = state_dir
        self.feed_dir = feed_dir
        os.makedirs(state_dir, exist_ok=True)
        if feed_dir:
            os.makedirs(feed_dir, exist_ok=True)

    def _current_path(self) -> str | None:
        marker = os.path.join(self.state_dir, _MARKER)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            version = f.read().strip()
        return os.path.join(self.state_dir, version) if version else None

    def current_cells(self, spark: SparkSession) -> DataFrame | None:
        path = self._current_path()
        return spark.read.parquet(path) if path else None

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        out = os.path.join(self.state_dir, f"v{batch_id}")
        current = self._current_path()
        if current is not None and os.path.abspath(current) == os.path.abspath(out):
            # crash window between the marker advance and the streaming
            # checkpoint commit: this batch's state (and, because the
            # feed is written BEFORE the marker, its feed) is already
            # fully committed — reprocessing must be a no-op, not a
            # read-and-overwrite of the current state with itself
            return
        batch_cells = latest_cells(batch, None)  # pre-reduce the batch
        prev = self.current_cells(spark)
        cells = batch_cells
        if prev is not None:
            # the one shared incremental-merge implementation (N25):
            # associative max-struct, idempotent under re-delivered
            # batches — at-least-once foreachBatch delivery therefore
            # yields exactly-once STATE (pinned by the re-delivery test)
            cells = advance_latest_cells(prev, batch_cells)
        cells.write.mode("overwrite").parquet(out)
        if self.feed_dir:
            keys = ["row_key", "family", "qualifier"]
            new_state = spark.read.parquet(out)  # materialized, not lineage
            # the feed join is restricted to the batch's TOUCHED keys:
            # the maintainer only ever upserts, so a cell absent from
            # the batch cannot change — per-trigger feed cost is
            # O(batch), not O(live cells)
            touched = batch_cells.select(*keys).distinct()
            old = prev if prev is not None else spark.createDataFrame(
                [], new_state.schema)
            feed = state_changefeed(
                old.join(touched, keys, "left_semi"),
                new_state.join(touched, keys, "left_semi"),
                key_cols=tuple(keys))
            feed.write.mode("overwrite").parquet(
                os.path.join(self.feed_dir, f"b{batch_id}"))
        tmp = os.path.join(self.state_dir, f".{_MARKER}.tmp")
        with open(tmp, "w") as f:
            f.write(f"v{batch_id}")
        os.replace(tmp, os.path.join(self.state_dir, _MARKER))
        for name in os.listdir(self.state_dir):
            if name.startswith("v") and name != f"v{batch_id}":
                shutil.rmtree(os.path.join(self.state_dir, name), ignore_errors=True)


def maintain_snapshot(stream_changelog: DataFrame, state_dir: str,
                      feed_dir: str | None = None, **start_kwargs):
    """Start the maintenance query (availableNow/trigger via kwargs).
    Returns (StreamingQuery, SnapshotMaintainer).  With ``feed_dir``
    each batch also publishes its I/U/D changefeed (see
    SnapshotMaintainer)."""
    maintainer = SnapshotMaintainer(state_dir, feed_dir)
    query = start_foreach_batch(
        stream_changelog, maintainer.process_batch, **start_kwargs)
    return query, maintainer
