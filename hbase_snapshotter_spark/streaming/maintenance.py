"""Continuous snapshot maintenance (SURVEY §2.3 N17 + N25) — the
streaming form of the flagship path: a CDC change-log stream keeps a
materialized latest-cells table current, one associative merge per
micro-batch.

This is what the reference's batch job becomes when run continuously
(its unused ``spark-streaming`` dependency, ``build.sbt:19``, signals
the intent): instead of rescanning ``[0, ts]`` per snapshot
(`HBaseSnapshotter.scala:123-129`), each micro-batch advances the
materialized state with only its own delta via
:func:`~hbase_snapshotter_spark.operators.snapshot.advance_latest_cells`.

Correctness at-least-once: the merge is idempotent (max-struct — a
replayed batch re-asserts the same cells), so foreachBatch's
at-least-once delivery yields exactly-once STATE.  The state store here
is a plain parquet directory swapped whole (write tmp → rename) because
the sandbox has no transactional table format; production swaps in a
Delta/Iceberg ``MERGE`` for transactional commits and partial-file
rewrites — the merge logic and plan are unchanged, and with the state
table bucketed on the cell key the big side never re-shuffles.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from hbase_snapshotter_spark.operators.snapshot import (
    advance_latest_cells,
    latest_cells,
)


def merge_batch_into_state(
    batch_df: DataFrame,
    state_dir: str,
    *,
    key_cols: tuple[str, ...] = ("row_key", "family", "qualifier"),
    ts_col: str = "cell_ts",
    value_col: str = "value",
) -> None:
    """One maintenance step: fold a (micro-)batch of change-log rows
    into the materialized latest-cells table at ``state_dir``.

    The batch is pre-reduced to its own latest cells first (map-side-
    style shrink: a batch carrying N versions of one cell contributes
    one row to the merge), then merged with the previous state through
    the associative aggregate.  The new state is fully materialized to
    a temp directory BEFORE the old one is replaced — never read and
    overwrite the same files in one plan."""
    spark = batch_df.sparkSession
    batch_cells = latest_cells(batch_df, None, key_cols=key_cols,
                               ts_col=ts_col, value_col=value_col)
    if os.path.isdir(state_dir):
        prev = spark.read.parquet(state_dir)
        new_state = advance_latest_cells(prev, batch_cells,
                                         key_cols=key_cols, ts_col=ts_col,
                                         value_col=value_col)
    else:
        new_state = batch_cells
    tmp = f"{state_dir}.tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(state_dir):
        shutil.rmtree(state_dir)
    os.rename(tmp, state_dir)


def maintain_snapshot_stream(
    stream_log: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    key_cols: tuple[str, ...] = ("row_key", "family", "qualifier"),
    ts_col: str = "cell_ts",
    value_col: str = "value",
    available_now: bool = True,
):
    """Run the continuous maintainer: every micro-batch of the change-
    log stream advances the materialized snapshot at ``state_dir``.
    Returns the started ``StreamingQuery`` (``availableNow`` by default
    so replay/backfill harnesses terminate)."""

    def merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_batch_into_state(batch_df, state_dir, key_cols=key_cols,
                               ts_col=ts_col, value_col=value_col)

    writer = (stream_log.writeStream.foreachBatch(merge)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
