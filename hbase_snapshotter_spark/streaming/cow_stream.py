"""Continuous transactional-table maintenance from a CDC stream — the
N132 cow table driven by Structured Streaming (r12).

The batch half proves each commit exact (``tests/test_cowtable.py``);
what production runs is the COMPOSITION: a readStream of ``op ∈ I/U/D``
row changes applied per micro-batch through
:func:`~hbase_snapshotter_spark.sources.cowtable.cow_apply_changes`,
so the table advances one ATOMIC version per batch — a reader at any
moment sees a committed version, never a torn batch (the
``foreachBatch`` + transactional-sink pattern Delta documents, on the
in-repo table format).

Exactly-once posture: Structured Streaming replays a failed batch, so
the sink must dedupe re-delivery.  The cow log is the natural ledger —
each commit records the batch id it applied (``app_batch_id``); a
re-delivered batch whose id is already committed returns without
writing (the transactional idempotent-sink recipe).  A CRASH between
commit and checkpoint therefore nets to at-most-once per batch id +
replay = exactly-once table content, pinned by the re-delivery pytest.

Scale shape: per batch the work is the cow MERGE's — stats-pruned
candidate scan + touched-file rewrite, batch keys broadcast; the
stream adds only the metadata-sized ledger check.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from hbase_snapshotter_spark.sources.cowtable import (
    _read_log,
    cow_apply_changes,
)
from hbase_snapshotter_spark.streaming.windows import start_foreach_batch


def applied_batch_ids(path: str) -> set[int]:
    """Batch ids already committed to the table — read from the log
    entries' ``app_batch_id`` field (metadata-sized)."""
    out = set()
    for e in _read_log(path):
        if "app_batch_id" in e:
            out.add(e["app_batch_id"])
    return out


def _stamp_batch_id(path: str, version: int, batch_id: int) -> None:
    """Record the applied batch id inside the version's log entry.
    Called immediately after the commit that applied the batch; the
    rewrite of an already-committed entry is safe (same writer owns
    the slot once ``link(2)`` succeeded)."""
    from hbase_snapshotter_spark.sources.cowtable import _log_path

    p = _log_path(path, version)
    with open(p) as fh:
        entry = json.load(fh)
    entry["app_batch_id"] = batch_id
    tmp = p + ".stamp"
    with open(tmp, "w") as fh:
        json.dump(entry, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, p)


def apply_stream_batch(path: str, batch: DataFrame, batch_id: int, *,
                       op_col: str = "op") -> dict | None:
    """Apply one micro-batch to the cow table at ``path`` — idempotent
    against re-delivery (a batch id already in the ledger returns
    ``None`` without writing)."""
    if batch_id in applied_batch_ids(path):
        return None
    if batch.isEmpty():
        return None
    res = cow_apply_changes(batch.sparkSession, path, batch,
                            op_col=op_col)
    _stamp_batch_id(path, res["version"], batch_id)
    return res


def start_cow_maintenance(stream_df: DataFrame, path: str, *,
                          op_col: str = "op", **start_kwargs):
    """Start the continuous maintainer: each micro-batch of
    ``(op, key..., value...)`` rows lands as one atomic cow commit.
    The table must already exist (:func:`cow_create` with the key
    columns).  Returns the StreamingQuery."""

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_stream_batch(path, batch, batch_id, op_col=op_col)

    return start_foreach_batch(stream_df, process, **start_kwargs)
