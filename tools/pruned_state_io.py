#!/usr/bin/env python
"""Measure state-side input pruning for partition-pruned incremental
snapshot maintenance (operators.snapshot_state) — the N25 SCALE.md row.

Methodology mirrors the existing N25 measurement (synthetic change log,
1x/10x/100x): materialize the bucketed state table, advance it by a
delta touching a small fraction of the key space, and report

- state rows/bytes READ by the pruned advance (touched partitions only)
  vs the full state (what the unpruned merge shuffles),
- touched buckets vs total buckets,
- wall-clock of pruned vs full advance (expected ~tied at local[32]
  fixture sizes — the INPUT ratio is the 100 TB claim, as for the
  original N25 row).

Hash bucketing prunes ∝ the delta's DISTINCT-KEY count (each distinct
key lands in one bucket, uniformly), not its row count — so the
interesting regimes are delta_keys << n_buckets (hot-working-set
replication) and n_buckets >> delta_keys (the 100 TB layout, where
O(10^4-10^5) buckets dwarf any realistic per-advance key set).

Usage: python tools/pruned_state_io.py [n_rows] [n_keys] [delta_keys] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    delta_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 250  # 1% of keys
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.snapshot import (
        advance_latest_cells,
        latest_cells,
    )
    from hbase_snapshotter_spark.operators.snapshot_state import (
        STATE_BUCKET_COL,
        advance_state_pruned,
        init_state,
        state_bucket,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pruned-state-io")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/pruned_state_io/state"
    import shutil

    shutil.rmtree("/tmp/pruned_state_io", ignore_errors=True)

    log = (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_keys).cast("string").alias("row_key"),
            F.lit("d").alias("family"),
            F.concat(F.lit("q"), (F.col("id") % 3).cast("string")).alias("qualifier"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
            (1_700_000_000_000 + F.col("id") * 7).alias("cell_ts"),
        )
        .repartition(32)
    )
    log.write.mode("overwrite").parquet("/tmp/pruned_state_io/log")
    log = spark.read.parquet("/tmp/pruned_state_io/log")

    t0 = time.time()
    init_state(log, path, None, n_buckets=n_buckets)
    init_s = time.time() - t0

    # delta: new versions for a contiguous slice of keys (≈ the hot
    # working set of a replication stream), 1 cell per (key, qualifier)
    delta = (
        spark.range(delta_keys * 3)
        .select(
            (F.col("id") % delta_keys).cast("string").alias("row_key"),
            F.lit("d").alias("family"),
            F.concat(F.lit("q"), (F.col("id") % 3).cast("string")).alias("qualifier"),
            F.lit("fresh").alias("value"),
            F.lit(1_800_000_000_000 + 1).alias("cell_ts"),
        )
    )
    delta.write.mode("overwrite").parquet("/tmp/pruned_state_io/delta")
    delta = spark.read.parquet("/tmp/pruned_state_io/delta")

    state_rows = spark.read.parquet(path).count()
    state_bytes = du(path)

    # touched buckets are derivable from the delta ALONE, so measure
    # the touched partitions' rows/bytes BEFORE the advance rewrites
    # them — measuring after would report the merged OUTPUT (including
    # delta-added keys) as "state read by the pruned advance"
    from hbase_snapshotter_spark.operators.snapshot_state import state_bucket

    pre_touched = sorted(
        r[0] for r in delta.select(
            state_bucket("row_key", n_buckets).alias("b")).distinct().collect())
    touched_rows = (
        spark.read.parquet(path)
        .filter(F.col(STATE_BUCKET_COL).isin(pre_touched)).count())
    touched_bytes = sum(
        du(os.path.join(path, f"{STATE_BUCKET_COL}={b}"))
        for b in pre_touched)

    # ---- pruned advance
    t0 = time.time()
    touched = advance_state_pruned(spark, path, delta, n_buckets=n_buckets)
    pruned_s = time.time() - t0
    assert touched == pre_touched, (touched, pre_touched)

    # ---- full (unpruned) advance over the same inputs, for wall-clock
    full_state = spark.read.parquet(path).drop(STATE_BUCKET_COL)
    t0 = time.time()
    advance_latest_cells(full_state, delta).write.mode("overwrite") \
        .format("noop").save()
    full_s = time.time() - t0

    # ---- full rescan (the reference's mode), for the historical ratio
    t0 = time.time()
    latest_cells(log.unionByName(delta), None).write.mode("overwrite") \
        .format("noop").save()
    rescan_s = time.time() - t0

    # ---- fused advance+compact vs two-step (VERDICT r6 task 5): the
    # fused cycle must write each touched bucket ONCE; the two-step
    # (advance, then compact-rewrite of the touched buckets) writes
    # each twice.  Counted by bucket-directory content generations.
    def bucket_gen(p):
        out = {}
        for d in os.listdir(p):
            if d.startswith(f"{STATE_BUCKET_COL}="):
                full = os.path.join(p, d)
                out[d] = tuple(sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full) if not f.startswith(".")))
        return out

    import shutil

    from hbase_snapshotter_spark.operators.snapshot import compact_cells

    delta2 = delta.withColumn(
        "cell_ts", F.lit(1_800_000_000_000 + 2)).withColumn(
        "value", F.lit("fresh2"))
    delta2.write.mode("overwrite").parquet("/tmp/pruned_state_io/delta2")
    delta2 = spark.read.parquet("/tmp/pruned_state_io/delta2")
    compact_kwargs = {"horizon_ts": 0, "ttl_cutoff_ts": 1_700_000_000_000}

    path2 = path + "_twostep"
    shutil.rmtree(path2, ignore_errors=True)
    shutil.copytree(path, path2)

    # two-step: advance, then compact+dynamic-overwrite the touched buckets
    g0 = bucket_gen(path2)
    t0 = time.time()
    touched2 = advance_state_pruned(spark, path2, delta2, n_buckets=n_buckets)
    g1 = bucket_gen(path2)
    comp = (compact_cells(
        spark.read.parquet(path2)
        .filter(F.col(STATE_BUCKET_COL).isin(touched2))
        .drop(STATE_BUCKET_COL), **compact_kwargs)
        .filter(F.col("cell_fate") == "kept").drop("cell_fate", "row_deleted"))
    (comp.withColumn(STATE_BUCKET_COL, state_bucket("row_key", n_buckets))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy(STATE_BUCKET_COL).parquet(path2))
    twostep_s = time.time() - t0
    g2 = bucket_gen(path2)
    twostep_writes = (sum(1 for d in g1 if g0.get(d) != g1[d])
                      + sum(1 for d in g2 if g1.get(d) != g2[d]))

    # fused: one cycle, one write per touched bucket
    f0 = bucket_gen(path)
    t0 = time.time()
    touched_f = advance_state_pruned(spark, path, delta2,
                                     n_buckets=n_buckets,
                                     compact=compact_kwargs)
    fused_s = time.time() - t0
    f1 = bucket_gen(path)
    fused_writes = sum(1 for d in f1 if f0.get(d) != f1[d])
    assert touched_f == touched2

    # same final state either way (exact row sets)
    lhs = spark.read.parquet(path).drop(STATE_BUCKET_COL)
    rhs = spark.read.parquet(path2).drop(STATE_BUCKET_COL)
    assert lhs.exceptAll(rhs).isEmpty() and rhs.exceptAll(lhs).isEmpty()

    # ---- SCD2 pruned advance IO (VERDICT r6 task 6): same pruning
    # measurement for the bucketed SCD2 history table — a 10-key delta
    # should read state ∝ its touched-bucket fraction, exactly as the
    # latest-cells advance does.
    from hbase_snapshotter_spark.operators.snapshot_state import (
        advance_scd2_pruned,
        init_scd2_state,
    )

    scd2_path = "/tmp/pruned_state_io/scd2"
    t0 = time.time()
    init_scd2_state(log, scd2_path, n_buckets=n_buckets)
    scd2_init_s = time.time() - t0
    scd2_rows_total = spark.read.parquet(scd2_path).count()

    delta3 = (
        spark.range(10 * 3)
        .select(
            (F.col("id") % 10).cast("string").alias("row_key"),
            F.lit("d").alias("family"),
            F.concat(F.lit("q"), (F.col("id") % 3).cast("string")).alias("qualifier"),
            F.concat(F.lit("scd"), F.col("id").cast("string")).alias("value"),
            (1_900_000_000_000 + F.col("id")).alias("cell_ts"),
        )
    )
    scd2_pre_touched = sorted(
        r[0] for r in delta3.select(
            state_bucket("row_key", n_buckets).alias("b")).distinct().collect())
    scd2_touched_rows = (
        spark.read.parquet(scd2_path)
        .filter(F.col(STATE_BUCKET_COL).isin(scd2_pre_touched)).count())
    t0 = time.time()
    scd2_touched = advance_scd2_pruned(spark, scd2_path, delta3,
                                       n_buckets=n_buckets)
    scd2_advance_s = time.time() - t0
    assert scd2_touched == scd2_pre_touched

    import json

    delta_rows = delta.count()
    print(json.dumps({
        "log_rows": n_rows, "n_keys": n_keys, "delta_rows": delta_rows,
        "n_buckets": n_buckets, "touched_buckets": len(touched),
        "state_rows": state_rows, "state_bytes": state_bytes,
        "touched_state_rows": touched_rows, "touched_state_bytes": touched_bytes,
        "state_input_ratio": round(state_rows / max(touched_rows, 1), 2),
        "bucket_fraction": round(len(touched) / n_buckets, 4),
        "init_s": round(init_s, 2),
        "pruned_advance_s": round(pruned_s, 2),
        "full_advance_s": round(full_s, 2),
        "full_rescan_s": round(rescan_s, 2),
        "fused_bucket_writes": fused_writes,
        "twostep_bucket_writes": twostep_writes,
        "fused_cycle_s": round(fused_s, 2),
        "twostep_cycle_s": round(twostep_s, 2),
        "scd2_state_rows": scd2_rows_total,
        "scd2_touched_rows": scd2_touched_rows,
        "scd2_touched_buckets": len(scd2_touched),
        "scd2_input_ratio": round(
            scd2_rows_total / max(scd2_touched_rows, 1), 2),
        "scd2_bucket_fraction": round(len(scd2_touched) / n_buckets, 4),
        "scd2_init_s": round(scd2_init_s, 2),
        "scd2_pruned_advance_s": round(scd2_advance_s, 2),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
