"""Z-order layout operator (N53) — Morton-code correctness and the
pruning guarantee the layout exists for."""

import pytest
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.layout import (
    grid_coord,
    zorder_bucket,
    zorder_value,
)


def test_morton_interleave_known_values(spark):
    """Hand-computed Morton codes: bit i of b1 → position 2i+1, bit i
    of b2 → position 2i."""
    rows = [(0, 0, 0), (3, 1, 11), (1, 0, 2), (0, 1, 1), (255, 255, 65535)]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "b1 long, b2 long")
    got = [r["z"] for r in df.select(
        zorder_value(F.col("b1"), F.col("b2")).alias("z")).collect()]
    assert got == [z for _, _, z in rows]


def test_grid_coord_bounds_and_monotone(spark):
    """min → 0, max → 2^bits - 1, and quantization is monotone."""
    df = spark.createDataFrame(
        [(x,) for x in (10, 11, 500, 1000, 1009)], "x long")
    out = df.select(
        grid_coord(F.col("x"), F.lit(10), F.lit(1009)).alias("g"),
        "x").orderBy("x").collect()
    gs = [r["g"] for r in out]
    assert gs[0] == 0 and gs[-1] == 255
    assert gs == sorted(gs)
    assert all(0 <= g <= 255 for g in gs)


def test_zorder_buckets_are_tiles_and_prune_both_dims(spark):
    """On a uniform 2-D grid, 64 Morton buckets are 8×8 tiles: every
    bucket spans ≤ 1/8 of EACH dimension (+ quantization slack), and a
    band predicate 1/16 wide on EITHER single dimension touches only
    the one tile-row/column containing it — 8 of 64 buckets, where any
    single-column layout reads all 64 for the off-column predicate."""
    n = 64
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    z = zorder_value(
        grid_coord(F.col("x"), F.lit(0), F.lit(n - 1)),
        grid_coord(F.col("y"), F.lit(0), F.lit(n - 1)))
    per = (df.select("x", "y", zorder_bucket(z, n_buckets=64).alias("zb"))
           .groupBy("zb")
           .agg(F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
                F.min("y").alias("y_lo"), F.max("y").alias("y_hi"))
           .collect())
    assert len(per) == 64
    for r in per:
        assert r["x_hi"] - r["x_lo"] <= n // 8 - 1
        assert r["y_hi"] - r["y_lo"] <= n // 8 - 1
    # band [24, 27] (1/16 of the domain) on each dimension separately
    hits_x = [r for r in per if r["x_lo"] <= 27 and r["x_hi"] >= 24]
    hits_y = [r for r in per if r["y_lo"] <= 27 and r["y_hi"] >= 24]
    assert len(hits_x) == 8
    assert len(hits_y) == 8


def test_range_layout_equidepth_balances_skew_fixed_width_does_not(
        spark, sf_dir):
    """N83's reason to exist, asserted not narrated: on the skewed
    event-value distribution the equi-depth lane's bucket depths all
    sit near the fair share (ratio within [0.5, 1.5] — sketch
    granularity is the only slack) while the fixed-width lane
    concentrates rows into a few hot buckets (max ratio well above 2),
    and each lane partitions the rows exactly (depths sum to the lane
    total, spans nest inside the lane's min/max)."""
    from hbase_snapshotter_spark.queries.streaming_q import (
        RANGE_LAYOUT_B,
        range_layout_audit,
    )

    rows = range_layout_audit(spark, sf_dir).collect()
    by_lane = {}
    for r in rows:
        by_lane.setdefault((r.event_type, r.method), []).append(r)
    methods = {m for _, m in by_lane}
    assert methods == {"equidepth", "fixedwidth"}

    for (etype, method), lane in by_lane.items():
        total = sum(r.n_rows for r in lane)
        for r in lane:
            assert abs(r.depth_ratio
                       - r.n_rows * RANGE_LAYOUT_B / total) < 1e-3
        if method == "equidepth":
            assert len(lane) == RANGE_LAYOUT_B
            assert all(0.5 <= r.depth_ratio <= 1.5 for r in lane), etype
    # the SAME rows, fixed-width: at least one event_type shows a hot
    # bucket at >2x the fair share (the skew equi-depth flattens)
    assert any(
        max(r.depth_ratio for r in lane) > 2.0
        for (etype, method), lane in by_lane.items()
        if method == "fixedwidth")


def test_compaction_plan_hand_computed(spark):
    """N104: adaptive target = ceil(total/2) per partition; files >=
    target keep untouched; small files bin by cumulative offset over
    the (size DESC, id) order; non-final groups fill within
    (target - max_file, target + max_file]; totals are preserved."""
    from hbase_snapshotter_spark.operators.layout import compaction_plan

    rows = [
        # partition A: total 100 -> target 50; f1 keeps (60 >= 50);
        # compact stream: f2(20), f3(12), f4(8) -> cum_before 0,20,32
        # -> all group 0 (40 bytes, fill 800 permille)
        ("A", "f1", 60), ("A", "f2", 20), ("A", "f3", 12), ("A", "f4", 8),
        # partition B: total 90 -> target 45; all compact:
        # g1(40 cum 0 -> grp 0), g2(30 cum 40 -> grp 0), g3(20 cum 70
        # -> grp 1) -> group 0 = 70 bytes (fill 1556), group 1 = 20
        ("B", "g1", 40), ("B", "g2", 30), ("B", "g3", 20),
    ]
    inv = spark.createDataFrame(
        rows, "source string, file_id string, size_bytes long")
    out = {(r.source, r.file_id): r for r in compaction_plan(
        inv, partition_col="source", files_target=2).collect()}
    assert len(out) == 7
    a1 = out[("A", "f1")]
    assert (a1.action, a1.group_id, a1.group_bytes) == ("keep", None, 60)
    assert a1.target_bytes == 50
    for f in ("f2", "f3", "f4"):
        r = out[("A", f)]
        assert (r.action, r.group_id, r.group_files, r.group_bytes) == \
            ("compact", 0, 3, 40)
        assert r.fill_permille == 800
    assert out[("B", "g1")].group_id == 0
    assert out[("B", "g2")].group_id == 0
    g3 = out[("B", "g3")]
    assert (g3.group_id, g3.group_files, g3.group_bytes) == (1, 1, 20)
    assert out[("B", "g1")].fill_permille == 1556  # 70/45 half-up
    # invariants: bytes preserved, non-final-group fill bound
    assert sum(r.size_bytes for r in out.values()) == 190
    max_file = {"A": 20, "B": 40}
    groups = {}
    for r in out.values():
        if r.action == "compact":
            groups[(r.source, r.group_id)] = (
                r.group_bytes, r.target_bytes, max_file[r.source])
    last = {s: max(g for (s2, g) in groups if s2 == s)
            for s in {s for s, _ in groups}}
    for (s, g), (gb, t, mf) in groups.items():
        if g != last[s]:
            assert t - mf < gb <= t + mf


def test_shard_rebalance_python_replayed(spark):
    """N108: moved counts equal a python replay of both schemes; HRW
    moves land only on the new shard when growing (theorem), modulo
    scatters across survivors (flag False, live); shrinking makes the
    stability flag vacuously True."""
    import hashlib

    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.layout import (
        shard_rebalance_audit,
    )

    keys = [str(i) for i in range(400)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")

    def mod(key, n):
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n

    def hrw(key, n):
        return max(range(n), key=lambda s: (
            hashlib.md5(f"{key}|{s}".encode()).hexdigest(), s))

    out = {r.scheme: r for r in shard_rebalance_audit(
        df, "k", n_before=8, n_after=9).collect()}
    exp_mod = sum(1 for k in keys if mod(k, 8) != mod(k, 9))
    exp_hrw = sum(1 for k in keys if hrw(k, 8) != hrw(k, 9))
    assert out["modulo"].n_moved == exp_mod
    assert out["rendezvous"].n_moved == exp_hrw
    assert out["modulo"].n_rows == out["rendezvous"].n_rows == 400
    # the asymmetry IS the point: ~8/9 vs ~1/9
    assert out["modulo"].n_moved > 300 and out["rendezvous"].n_moved < 100
    assert not out["modulo"].moves_only_to_new_shards
    assert out["rendezvous"].moves_only_to_new_shards
    # every HRW move targets the new shard id 8 (python replay)
    assert all(hrw(k, 9) == 8 for k in keys if hrw(k, 8) != hrw(k, 9))
    # permille is half-up exact
    assert out["modulo"].moved_permille == (2000 * exp_mod + 400) // 800
    shrink = {r.scheme: r for r in shard_rebalance_audit(
        df, "k", n_before=9, n_after=8).collect()}
    assert shrink["modulo"].moves_only_to_new_shards
    assert shrink["rendezvous"].moves_only_to_new_shards


def test_zone_map_pruning_audit_hand_computed(spark):
    """N124 zone-map skipping on a hand layout: three files with known
    value spans — a predicate inside one file's span scans exactly that
    file, an out-of-range predicate skips everything, an everywhere
    predicate scans everything; matched-row counts are exact and the
    soundness flag holds; skip permille is half-up."""
    from hbase_snapshotter_spark.operators.layout import (
        zone_map_pruning_audit,
    )

    rows = [(0, 1.0), (0, 5.0), (1, 10.0), (1, 14.0), (2, 20.0),
            (2, 29.0)]
    df = spark.createDataFrame(rows, "f long, v double")
    out = {r.pred: r for r in zone_map_pruning_audit(
        df, "f", [("one_file", "v", 11.0, 13.0),
                  ("nothing", "v", 100.0, 200.0),
                  ("everything", "v", 0.0, 30.0),
                  ("two_files", "v", 4.0, 12.0)]).collect()}
    r = out["one_file"]
    assert (r.n_files, r.n_scanned, r.n_skipped) == (3, 1, 2)
    assert r.skip_permille == 667  # half-up 2000/3
    assert r.n_rows_matched == 0 and r.no_false_skips
    r = out["nothing"]
    assert (r.n_scanned, r.n_rows_matched, r.no_false_skips) == (0, 0,
                                                                 True)
    r = out["everything"]
    assert (r.n_scanned, r.n_rows_matched) == (3, 6)
    r = out["two_files"]
    assert (r.n_scanned, r.n_rows_matched) == (2, 2)  # 5.0 and 10.0
    assert r.no_false_skips


def test_zone_map_maintenance_hand_computed(spark):
    """N128: advance is losslessly mergeable (equals a rebuild row for
    row); retract keeps min/max sound-but-stale and flips tight only
    on touched files; retighten rebuilds exactly the stale files; the
    stale map can only OVER-scan the probed band."""
    from hbase_snapshotter_spark.operators.layout import (
        advance_zone_map,
        retighten_zone_map,
        retract_zone_map,
        zone_map_skip_stats,
        zone_map_state,
    )

    rows = [  # (file, value)
        (1, 10.0), (1, 20.0), (1, 300.0),   # file 1: purge hits max
        (2, 50.0), (2, 60.0),               # file 2: untouched
        (3, 400.0),                         # file 3: fully purged
    ]
    prior = spark.createDataFrame(rows[:4], ["f", "v"])
    appends = spark.createDataFrame(rows[4:], ["f", "v"])
    full = spark.createDataFrame(rows, ["f", "v"])

    st = zone_map_state(prior, "f", "v")
    adv = advance_zone_map(st, appends, "f", "v")
    reb = zone_map_state(full, "f", "v")
    cols = ["file_id", "n_rows", "vmin", "vmax", "tight"]
    assert sorted(map(tuple, adv.select(cols).collect())) == \
        sorted(map(tuple, reb.select(cols).collect()))

    deletes = full.filter("v >= 300")
    stale = retract_zone_map(adv, deletes, "f")
    got = {r.file_id: r for r in stale.collect()}
    assert set(got) == {1, 2}                      # file 3 dropped
    assert (got[1].n_rows, got[1].vmax, got[1].tight) == (2, 300.0, False)
    assert (got[2].n_rows, got[2].vmax, got[2].tight) == (2, 60.0, True)

    survivors = full.filter("v < 300")
    tight = retighten_zone_map(stale, survivors, "f", "v")
    want = zone_map_state(survivors, "f", "v")
    assert sorted(map(tuple, tight.select(cols).collect())) == \
        sorted(map(tuple, want.select(cols).collect()))

    # probed band [100, 1e9]: stale map scans file 1 (vmax still 300);
    # the re-tightened map skips everything — over-scan only, never
    # under-scan
    s_stale = zone_map_skip_stats(stale, 100.0, 1e9).collect()[0]
    s_tight = zone_map_skip_stats(tight, 100.0, 1e9).collect()[0]
    assert (s_stale.n_files, s_stale.n_scanned, s_stale.n_scanned_stale) \
        == (2, 1, 1)
    assert (s_tight.n_files, s_tight.n_scanned) == (2, 0)
    assert s_stale.skip_permille == 500 and s_tight.skip_permille == 1000


def test_zone_map_advance_audit_gated(spark, sf_dir, tmp_path):
    """The N128 lane's three audit flags are fixture-gated like every
    advance≡rebuild carrier: NULL at a production path, TRUE at
    fixture sfs, same schema, identical non-flag values, rebuild
    subtree absent (no replicaterows at prod)."""
    import os

    from hbase_snapshotter_spark.queries.streaming_q import (
        zone_map_advance,
    )

    prod = tmp_path / "warehouse_prod_zm"
    prod.mkdir()
    for f in os.listdir(sf_dir):
        os.symlink(os.path.join(sf_dir, f), prod / f)

    fix_df = zone_map_advance(spark, sf_dir)
    prod_df = zone_map_advance(spark, str(prod))
    assert fix_df.columns == prod_df.columns
    flags = ["advance_equals_rebuild", "retighten_equals_rebuild",
             "sound_after_deletes"]
    fix_plan = fix_df._jdf.queryExecution().executedPlan().toString()
    prod_plan = prod_df._jdf.queryExecution().executedPlan().toString()
    assert "replicaterows" in fix_plan.lower()
    assert "replicaterows" not in prod_plan.lower()
    other = [c for c in fix_df.columns if c not in flags]
    assert sorted(map(str, fix_df.select(other).collect())) == \
        sorted(map(str, prod_df.select(other).collect()))
    assert {tuple(r) for r in fix_df.select(flags).distinct().collect()} \
        == {(True, True, True)}
    assert {tuple(r) for r in prod_df.select(flags).distinct().collect()} \
        == {(None, None, None)}
