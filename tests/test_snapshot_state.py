"""Partition-pruned incremental snapshot maintenance (N25 scale form):
the pruned advance must be byte-identical to the full advance while
reading and rewriting ONLY the delta-touched buckets."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.snapshot import (
    advance_latest_cells,
    latest_cells,
)
from hbase_snapshotter_spark.operators.snapshot_state import (
    STATE_BUCKET_COL,
    advance_state_pruned,
    init_state,
    read_state,
    state_bucket,
)


def _changelog(spark, n_keys=200, versions=3):
    """Deterministic synthetic change log: n_keys × versions cells."""
    return (
        spark.range(n_keys * versions)
        .select(
            (F.col("id") % n_keys).cast("string").alias("row_key"),
            F.lit("d").alias("family"),
            F.concat(F.lit("q"), (F.col("id") % 2).cast("string")).alias("qualifier"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
            (1000 + F.col("id") * 7).alias("cell_ts"),
        )
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_pruned_advance_equals_full_advance(spark, tmp_path):
    """State advanced bucket-pruned == state advanced by the full merge,
    as exact row sets, including delta keys new to the state."""
    path = str(tmp_path / "state")
    log = _changelog(spark)
    t1 = 1600  # ~ first half of history
    init_state(log, path, t1, n_buckets=16)

    # delta: everything after t1, plus BRAND-NEW keys (never in state)
    delta = log.filter(F.col("cell_ts") > t1).unionByName(
        spark.range(5).select(
            F.concat(F.lit("new"), F.col("id").cast("string")).alias("row_key"),
            F.lit("d").alias("family"),
            F.lit("q0").alias("qualifier"),
            F.lit("fresh").alias("value"),
            F.lit(99999).alias("cell_ts"),
        ))

    touched = advance_state_pruned(spark, path, delta, n_buckets=16)
    assert touched and touched == sorted(set(touched))

    got = _rows(read_state(spark, path))
    want = _rows(advance_latest_cells(latest_cells(log, t1), delta))
    assert got == want
    # and the pruned state equals a from-scratch full rescan of log ∪ delta
    want_rescan = _rows(latest_cells(log.unionByName(delta), None))
    assert got == want_rescan


def test_pruned_advance_touches_only_delta_buckets(spark, tmp_path):
    """Untouched bucket partitions are neither read (partition filter in
    the scan) nor rewritten (file mtimes + names unchanged)."""
    path = str(tmp_path / "state")
    log = _changelog(spark)
    init_state(log, path, 1600, n_buckets=16)

    def partition_files(p):
        out = {}
        for d in os.listdir(p):
            if d.startswith(f"{STATE_BUCKET_COL}="):
                full = os.path.join(p, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full) if not f.startswith(".")
                }
        return out

    before = partition_files(path)
    assert len(before) == 16  # 200 uniform keys fill all 16 buckets

    # a delta touching exactly ONE key → exactly one bucket
    delta = spark.createDataFrame(
        [("42", "d", "q0", "bump", 99999)],
        "row_key string, family string, qualifier string, value string, cell_ts long",
    )
    expected_bucket = spark.range(1).select(
        state_bucket(F.lit("42"), 16).alias("b")).collect()[0].b

    touched = advance_state_pruned(spark, path, delta, n_buckets=16)
    assert touched == [expected_bucket]

    after = partition_files(path)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {f"{STATE_BUCKET_COL}={expected_bucket}"}

    # the bumped cell won; everything else identical to the full merge
    got = _rows(read_state(spark, path))
    want = _rows(advance_latest_cells(latest_cells(log, 1600), delta))
    assert got == want


def test_pruned_scan_has_partition_filter(spark, tmp_path):
    """The state-side read plan carries the bucket predicate as a
    PARTITION filter (pruning happens at file listing, not row level)."""
    path = str(tmp_path / "state")
    init_state(_changelog(spark), path, 1600, n_buckets=16)
    pruned = spark.read.parquet(path).filter(
        F.col(STATE_BUCKET_COL).isin([1, 2, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "state_bucket" in plan
    # row-level pushed filters must NOT carry the bucket predicate — it
    # is resolved entirely by directory pruning
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "state_bucket" in m.group(1)


def test_empty_delta_is_a_no_op(spark, tmp_path):
    path = str(tmp_path / "state")
    log = _changelog(spark)
    init_state(log, path, 1600, n_buckets=16)
    before = _rows(read_state(spark, path))
    empty = log.filter(F.lit(False))
    assert advance_state_pruned(spark, path, empty, n_buckets=16) == []
    assert _rows(read_state(spark, path)) == before


def test_pruned_advance_idempotent_redelivery(spark, tmp_path):
    """Re-delivering the same delta (at-least-once upstream) leaves the
    state unchanged — the associative-max merge is idempotent."""
    path = str(tmp_path / "state")
    log = _changelog(spark)
    init_state(log, path, 1600, n_buckets=16)
    delta = log.filter(F.col("cell_ts") > 1600)
    advance_state_pruned(spark, path, delta, n_buckets=16)
    once = _rows(read_state(spark, path))
    advance_state_pruned(spark, path, delta, n_buckets=16)
    assert _rows(read_state(spark, path)) == once


def test_fused_advance_and_compact(spark, tmp_path):
    """VERDICT r6 task 5: compaction piggybacked on the pruned advance —
    one read, one write per touched bucket per cycle.  The fused state
    must equal the two-step reference (advance, then compact the
    touched buckets) as exact row sets; untouched buckets are untouched
    on disk; re-delivering the delta through the fused path is a no-op."""
    path = str(tmp_path / "state")
    log = _changelog(spark)
    t1 = 1600
    init_state(log, path, t1, n_buckets=16)

    # delta: second half of history + a delete marker for key "7" old
    # enough for a horizon at 99000, + a fresh post-TTL write
    delta = log.filter(F.col("cell_ts") > t1).unionByName(
        spark.createDataFrame(
            [("7", "d", "row_status", "D", 90000),
             ("8", "d", "q0", "fresh-after-ttl", 98000)],
            "row_key string, family string, qualifier string, "
            "value string, cell_ts long",
        ))
    compact_kwargs = {"horizon_ts": 95000, "ttl_cutoff_ts": 1200}

    def partition_files(p):
        out = {}
        for d in os.listdir(p):
            if d.startswith(f"{STATE_BUCKET_COL}="):
                full = os.path.join(p, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full) if not f.startswith(".")
                }
        return out

    before = partition_files(path)
    touched = advance_state_pruned(
        spark, path, delta, n_buckets=16, compact=compact_kwargs)
    got = _rows(read_state(spark, path))

    # two-step reference: full associative merge, then compact ONLY the
    # rows living in touched buckets (fused compaction is opportunistic
    # — untouched buckets keep their cells until next touched)
    from hbase_snapshotter_spark.operators.snapshot import compact_cells

    merged = advance_latest_cells(latest_cells(log, t1), delta) \
        .withColumn("__b", state_bucket("row_key", 16))
    in_touched = merged.filter(F.col("__b").isin(touched)).drop("__b")
    outside = merged.filter(~F.col("__b").isin(touched)).drop("__b")
    compacted = (compact_cells(in_touched, **compact_kwargs)
                 .filter(F.col("cell_fate") == "kept")
                 .drop("cell_fate", "row_deleted"))
    want = _rows(compacted.unionByName(outside))
    assert got == want
    # compaction actually bit: the tombstoned row is gone from state
    assert not any(r[0] == "7" for r in got)

    # untouched buckets: bytes on disk untouched
    after = partition_files(path)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {f"{STATE_BUCKET_COL}={b}" for b in touched}

    # idempotent re-delivery through the fused path
    advance_state_pruned(spark, path, delta, n_buckets=16,
                         compact=compact_kwargs)
    assert _rows(read_state(spark, path)) == got


def test_state_bucket_null_total(spark):
    """NULL row keys land in a deterministic bucket (sampling sentinel),
    never a NULL partition value."""
    df = spark.createDataFrame([(None,), ("k",)], "row_key string")
    rows = df.select(state_bucket("row_key", 16).alias("b")).collect()
    assert all(r.b is not None and 0 <= r.b < 16 for r in rows)


def test_scd2_pruned_advance(spark, tmp_path):
    """VERDICT r6 task 6: the SCD2 advance gets the full pruned-state
    treatment latest-cells already has — exact equality with the
    from-scratch rebuild, `state_bucket IN (...)` visible as a
    PartitionFilter in the state read, untouched bucket files
    byte-untouched (mtimes), and idempotent re-delivery."""
    from hbase_snapshotter_spark.operators.snapshot import scd2_history
    from hbase_snapshotter_spark.operators.snapshot_state import (
        advance_scd2_pruned,
        init_scd2_state,
    )

    path = str(tmp_path / "scd2")
    log = _changelog(spark)
    t1 = 1600
    init_scd2_state(log.filter(F.col("cell_ts") <= t1), path, n_buckets=16)

    def partition_files(p):
        out = {}
        for d in os.listdir(p):
            if d.startswith(f"{STATE_BUCKET_COL}="):
                full = os.path.join(p, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full) if not f.startswith(".")
                }
        return out

    # delta touching ONE key -> exactly one bucket read+rewritten
    before = partition_files(path)
    delta = spark.createDataFrame(
        [("42", "d", "q0", "late-0", 5000), ("42", "d", "q0", "late-1", 6000)],
        "row_key string, family string, qualifier string, value string, cell_ts long",
    )
    expected_bucket = spark.range(1).select(
        state_bucket(F.lit("42"), 16).alias("b")).collect()[0].b
    touched = advance_scd2_pruned(spark, path, delta, n_buckets=16)
    assert touched == [expected_bucket]

    after = partition_files(path)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {f"{STATE_BUCKET_COL}={expected_bucket}"}

    # advanced state == from-scratch SCD2 over the full log
    full = log.filter(F.col("cell_ts") <= t1).unionByName(delta)
    got = _rows(read_state(spark, path))
    want = _rows(scd2_history(full.select(
        "row_key", "qualifier", "value", "cell_ts")))
    assert got == want

    # the state read inside the advance prunes at the partition level
    pruned = spark.read.parquet(path).filter(
        F.col(STATE_BUCKET_COL).isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "state_bucket" in m.group(1)

    # re-delivered delta (even spanning past advances) is a no-op
    advance_scd2_pruned(spark, path, delta, n_buckets=16)
    assert _rows(read_state(spark, path)) == got
