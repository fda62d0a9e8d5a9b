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

Exactly-once posture (ADVICE r12 — Delta's txnAppId/txnVersion
contract): Structured Streaming replays a failed batch, so the sink
must dedupe re-delivery.  The cow log is the ledger — each commit
records the ``(app_id, batch_id)`` PAIR it applied, written INSIDE the
commit entry atomically with the version claim (``txn=`` on
``cow_apply_changes``), so a crash can never leave a committed-but-
unstamped version.  Keying on the pair rather than the bare batch id
means a SECOND stream feeding the same table (its own app id, its own
batch ids 0,1,…) is never silently dropped; a caller that restarts
with a FRESH checkpoint but pins the same ``app_id`` declares the
feeds identical and gets exactly-once across the reset.  The default
``app_id`` derives from the checkpoint location, which Structured
Streaming itself scopes batch ids to.

Scale shape: per batch the work is the cow MERGE's — stats-pruned
candidate scan + touched-file rewrite, batch keys broadcast; the
stream adds only the metadata-sized ledger check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from hbase_snapshotter_spark.sources.cowtable import (
    _read_log,
    cow_apply_changes,
)
from hbase_snapshotter_spark.streaming.windows import start_foreach_batch


def applied_txns(path: str) -> set[tuple[str, int]]:
    """(app_id, batch_id) pairs already committed to the table — read
    from the log entries' ``txn`` stamp (metadata-sized).  Legacy
    entries stamped with the pre-r13 bare ``app_batch_id`` field map
    to app id ``""`` so old ledgers stay readable."""
    out = set()
    for e in _read_log(path):
        t = e.get("txn")
        if t is not None and "batch_id" in t:
            out.add((str(t.get("app_id", "")), int(t["batch_id"])))
        elif "app_batch_id" in e:  # pre-r13 stamp format
            out.add(("", int(e["app_batch_id"])))
    return out


def applied_batch_ids(path: str, app_id: str | None = None) -> set[int]:
    """Batch ids already committed for ``app_id`` (``None`` = all apps
    — the pre-r13 view, kept for audits)."""
    return {b for a, b in applied_txns(path)
            if app_id is None or a == app_id}


def apply_stream_batch(path: str, batch: DataFrame, batch_id: int, *,
                       app_id: str, op_col: str = "op") -> dict | None:
    """Apply one micro-batch to the cow table at ``path`` — idempotent
    against re-delivery (an ``(app_id, batch_id)`` pair already in the
    ledger returns ``None`` without writing).  The stamp is written
    inside the commit entry, atomically with the version claim."""
    if (str(app_id), int(batch_id)) in applied_txns(path):
        return None
    if batch.isEmpty():
        return None
    return cow_apply_changes(
        batch.sparkSession, path, batch, op_col=op_col,
        txn={"app_id": str(app_id), "batch_id": int(batch_id)})


def start_cow_maintenance(stream_df: DataFrame, path: str, *,
                          app_id: str | None = None,
                          op_col: str = "op", **start_kwargs):
    """Start the continuous maintainer: each micro-batch of
    ``(op, key..., value...)`` rows lands as one atomic cow commit.
    The table must already exist (:func:`cow_create` with the key
    columns).  ``app_id`` defaults to the normalized
    ``checkpointLocation`` — the scope Structured Streaming itself
    assigns batch ids in; pass it explicitly to share one ledger
    identity across checkpoint resets.  Returns the StreamingQuery."""
    if app_id is None:
        ckpt = start_kwargs.get("checkpointLocation")
        if ckpt is None:
            raise ValueError(
                "start_cow_maintenance needs app_id= or "
                "checkpointLocation= (the default app_id derives from "
                "the checkpoint location, which scopes batch ids)")
        app_id = os.path.normpath(str(ckpt))

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_stream_batch(path, batch, batch_id,
                           app_id=app_id, op_col=op_col)

    return start_foreach_batch(stream_df, process, **start_kwargs)
