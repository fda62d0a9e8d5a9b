"""Copy-on-write transactional table (r12 — the MERGE-for-the-state
seam closed with a working dependency-free implementation): versioned
atomic commits, snapshot isolation + time travel, optimistic
concurrency, stats-pruned MERGE, CDC apply, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from hbase_snapshotter_spark.sources.cowtable import (
    CommitConflict,
    _commit,
    _prune_candidates,
    cow_apply_changes,
    cow_create,
    cow_history,
    cow_merge,
    cow_snapshot,
    cow_vacuum,
    cow_version,
)


def _rows(df):
    return sorted(map(str, df.collect()))


def _mk(spark, tmp_path, n=100, parts=4):
    """A table of n rows over `parts` part files, key k, value v."""
    path = str(tmp_path / "tbl")
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    # range-partition so each part file covers a distinct key band —
    # the shape the stats pruning exploits
    cow_create(df.repartitionByRange(parts, "k"), path, key_cols=["k"])
    return path, df


def test_create_snapshot_roundtrip_and_history(spark, tmp_path):
    path, df = _mk(spark, tmp_path)
    assert cow_version(path) == 0
    assert _rows(cow_snapshot(spark, path)) == _rows(df)
    h = cow_history(path)
    assert len(h) == 1 and h[0]["op"] == "create"
    assert h[0]["n_added_rows"] == 100
    with pytest.raises(ValueError, match="already exists"):
        cow_create(df, path, key_cols=["k"])


def test_merge_update_equals_recompute_and_prunes_files(spark, tmp_path):
    path, df = _mk(spark, tmp_path, n=100, parts=4)
    # update keys 10..19 (one key band), insert 200..204
    src = spark.range(0, 15).select(
        F.when(F.col("id") < 10, F.col("id") + 10)
        .otherwise(F.col("id") + 190).alias("k")
    ).withColumn("v", F.col("k") * 1000)
    res = cow_merge(spark, path, src)
    assert res["version"] == 1
    # pruning: only the band(s) containing 10..19 rewritten — never
    # all four; candidates bounded by the stats intersection
    assert 1 <= res["files_rewritten"] < res["files_total"]

    # merge ≡ recompute oracle
    expect = (df.join(src.select("k"), "k", "left_anti")
              .unionByName(src))
    assert _rows(cow_snapshot(spark, path)) == _rows(expect)

    # untouched part files carried over by REFERENCE (same paths)
    import json
    log0 = json.load(open(os.path.join(path, "_txlog", "00000000.json")))
    log1 = json.load(open(os.path.join(path, "_txlog", "00000001.json")))
    kept = {a["file"] for a in log0["adds"]} - set(log1["removes"])
    assert kept  # some v0 files live on untouched
    for f in kept:
        assert os.path.isfile(os.path.join(path, f))

    # time travel: version 0 still reads the original exactly
    assert _rows(cow_snapshot(spark, path, version=0)) == _rows(df)


def test_merge_delete_and_insert_modes(spark, tmp_path):
    path, df = _mk(spark, tmp_path, n=50, parts=2)
    # delete keys 0..9, do not insert the unmatched source rows
    src = spark.range(0, 12).select(F.col("id").alias("k")) \
        .withColumn("v", F.lit(-1).cast("long"))
    cow_merge(spark, path, src, matched="delete",
              insert_unmatched=False)
    expect = df.filter(~F.col("k").isin(*range(12)))
    assert _rows(cow_snapshot(spark, path)) == _rows(expect)
    with pytest.raises(ValueError, match="update\\|delete"):
        cow_merge(spark, path, src, matched="upsert")
    bad = src.withColumnRenamed("v", "w")
    with pytest.raises(ValueError, match="source schema"):
        cow_merge(spark, path, bad)


def test_commit_conflict_detection(spark, tmp_path, monkeypatch):
    path, _ = _mk(spark, tmp_path, n=10, parts=1)
    # the primitive: double-claiming a version slot raises
    _commit(path, {"version": 1, "op": "x", "key_cols": ["k"],
                   "adds": [], "removes": []})
    with pytest.raises(CommitConflict, match="already committed"):
        _commit(path, {"version": 1, "op": "y", "key_cols": ["k"],
                       "adds": [], "removes": []})

    # the real race: a competitor commits BETWEEN this merge's log
    # read and its commit — the merge must lose, not overwrite
    import hbase_snapshotter_spark.sources.cowtable as cow

    orig = cow._write_parts

    def race(df, p, key_cols):
        adds = orig(df, p, key_cols)
        # claim the slot the in-flight merge is about to commit
        _commit(path, {"version": cow_version(path) + 1,
                       "op": "competitor",
                       "key_cols": ["k"], "adds": [], "removes": []})
        return adds

    monkeypatch.setattr(cow, "_write_parts", race)
    src = spark.range(0, 3).select(F.col("id").alias("k"),
                                   F.lit(7).cast("long").alias("v"))
    with pytest.raises(CommitConflict, match="already committed"):
        cow_merge(spark, path, src)
    # the competitor's commit is the only winner of its slot
    assert cow_version(path) == 2
    assert cow_history(path)[-1]["op"] == "competitor"


def test_apply_changes_single_transaction(spark, tmp_path):
    path, df = _mk(spark, tmp_path, n=40, parts=2)
    changes = spark.createDataFrame(
        [(5, 5000, "U"), (41, 4100, "I"), (7, 0, "D"), (8, 8888, "U"),
         (9, 0, "D"), (9, 9999, "I")],  # D+I same key nets to insert
        "k long, v long, op string")
    res = cow_apply_changes(spark, path, changes)
    assert res["version"] == 1
    got = {r.k: r.v for r in cow_snapshot(spark, path).collect()}
    assert got[5] == 5000 and got[8] == 8888      # updates
    assert got[41] == 4100                        # insert
    assert 7 not in got                           # delete
    assert got[9] == 9999                         # delete-then-insert
    assert got[3] == 30                           # untouched
    assert len(got) == 40  # 40 - 2 deletes + 1 insert + 1 reinsert
    # idempotent re-apply of the SAME batch converges (version moves,
    # content does not)
    cow_apply_changes(spark, path, changes)
    got2 = {r.k: r.v for r in cow_snapshot(spark, path).collect()}
    assert got2 == got


def test_vacuum_retains_recent_versions_only(spark, tmp_path):
    path, df = _mk(spark, tmp_path, n=30, parts=3)
    src = spark.range(0, 5).select(F.col("id").alias("k"),
                                   F.lit(1).cast("long").alias("v"))
    cow_merge(spark, path, src)
    latest = _rows(cow_snapshot(spark, path))
    res = cow_vacuum(path, keep_last=1)
    assert res["deleted_files"] >= 1
    # latest snapshot unaffected; v0 time travel now broken by design
    assert _rows(cow_snapshot(spark, path)) == latest
    with pytest.raises(Exception):
        cow_snapshot(spark, path, version=0).collect()
    with pytest.raises(ValueError, match="keep_last"):
        cow_vacuum(path, keep_last=0)


def test_prune_candidates_soundness():
    live = [
        {"file": "a", "kmin": 0, "kmax": 9},
        {"file": "b", "kmin": 10, "kmax": 19},
        {"file": "c", "kmin": None, "kmax": None},   # all-null file
        {"file": "d", "kmin": "x", "kmax": "z"},     # type mismatch
    ]
    got = {a["file"] for a in _prune_candidates(live, 12, 14)}
    # b intersects; c and d are NOT comparable -> kept (sound); a is
    # provably disjoint -> pruned
    assert got == {"b", "c", "d"}
    # string bounds: only the string-stats file is comparable — "d"
    # (x..z) contains "y" so it stays; numeric-stats files are NOT
    # comparable against string bounds and are kept (sound)
    got2 = {a["file"] for a in _prune_candidates(live, "y", "y")}
    assert got2 == {"a", "b", "c", "d"}
    # a provably-disjoint string range IS pruned
    got2b = {a["file"] for a in _prune_candidates(live, "A", "B")}
    assert "d" not in got2b and {"a", "b", "c"} <= got2b
    # bool stats never treated as numeric
    got3 = {a["file"] for a in _prune_candidates(
        [{"file": "e", "kmin": True, "kmax": True}], 5, 6)}
    assert got3 == {"e"}


def test_latest_cells_state_via_cow_merge(spark, tmp_path):
    """Integration with the state family: maintain a latest-per-key
    state table through cow_apply_changes from two changelog batches —
    the final table equals the batch-recomputed latest-cells state
    (advance ≡ rebuild, the N25 posture on a transactional store)."""
    path = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100)],
        "k long, val string, ts long")
    cow_create(b1.repartitionByRange(2, "k"), path, key_cols=["k"])
    b2 = spark.createDataFrame(
        [(2, "B", 200, "U"), (4, "d", 200, "I"), (1, None, 200, "D")],
        "k long, val string, ts long, op string")
    cow_apply_changes(spark, path, b2)
    got = {r.k: (r.val, r.ts)
           for r in cow_snapshot(spark, path).collect()}
    assert got == {2: ("B", 200), 3: ("c", 100), 4: ("d", 200)}
    h = cow_history(path)
    assert [e["op"] for e in h] == ["create", "apply_changes"]


def test_cow_streaming_maintenance_exactly_once(spark, tmp_path):
    """r12 streaming tie-in: a real readStream of CDC batches drives
    the cow table through one atomic commit per micro-batch; the final
    table equals the batch-recomputed net state; re-running the stream
    (fresh checkpoint, same files) and re-delivering batches directly
    both change NOTHING — the log's batch-id ledger makes the
    transactional sink idempotent (exactly-once content)."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hbase_snapshotter_spark.streaming.cow_stream import (
        apply_stream_batch,
        applied_batch_ids,
        start_cow_maintenance,
    )

    path = str(tmp_path / "ctbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, val string")
    cow_create(base.repartitionByRange(2, "k"), path, key_cols=["k"])

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    batches = [
        [{"op": "U", "k": 2, "val": "B"}, {"op": "I", "k": 4, "val": "d"}],
        [{"op": "D", "k": 1, "val": None}, {"op": "U", "k": 4, "val": "D2"}],
    ]
    import time as _time

    now = _time.time()
    for i, rows in enumerate(batches):
        f = feed_dir / f"b{i}.json"
        with open(f, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        # the file source orders micro-batches by modification time —
        # pin distinct mtimes so batch order is deterministic
        os.utime(f, (now + 100 * i, now + 100 * i))

    schema = StructType([StructField("op", StringType()),
                         StructField("k", LongType()),
                         StructField("val", StringType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .json(str(feed_dir)))
    q = start_cow_maintenance(
        stream, path,
        checkpointLocation=str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(120)

    app = os.path.normpath(str(tmp_path / "ckpt"))  # the derived app_id
    want = {2: "B", 3: "c", 4: "D2"}
    got = {r.k: r.val for r in cow_snapshot(spark, path).collect()}
    assert got == want
    # one atomic version per non-empty batch, each stamped with its
    # (app_id, batch_id) pair INSIDE the commit entry (ADVICE r12)
    assert applied_batch_ids(path, app) == {0, 1}
    assert cow_version(path) == 2

    # stream re-run over the same files after CHECKPOINT LOSS, caller
    # pins the same app_id (declaring the feeds identical): every
    # (app_id, batch_id) pair is already in the ledger — nothing
    # commits (exactly-once across the reset)
    q2 = start_cow_maintenance(
        stream, path, app_id=app,
        checkpointLocation=str(tmp_path / "ckpt2"), availableNow=True)
    q2.awaitTermination(120)
    assert cow_version(path) == 2
    assert {r.k: r.val for r in cow_snapshot(spark, path).collect()} \
        == want

    # direct re-delivery of an applied (app_id, batch_id): no-op
    b0 = spark.createDataFrame(
        [("U", 2, "XXX")], "op string, k long, val string")
    assert apply_stream_batch(path, b0, 0, app_id=app) is None
    assert {r.k: r.val for r in cow_snapshot(spark, path).collect()} \
        == want
    # an EMPTY new batch also commits nothing
    assert apply_stream_batch(path, b0.filter("k < 0"), 7,
                              app_id=app) is None
    assert cow_version(path) == 2

    # a SECOND stream (different app_id) reusing batch id 0 is NOT
    # silently dropped — the pre-r13 bare-batch-id ledger bug
    res = apply_stream_batch(path, b0, 0, app_id="other-feed")
    assert res is not None and res["version"] == 3
    assert {r.k: r.val for r in cow_snapshot(spark, path).collect()} \
        == {2: "XXX", 3: "c", 4: "D2"}
    assert applied_batch_ids(path, "other-feed") == {0}
    assert applied_batch_ids(path) == {0, 1}  # all-apps audit view


def test_orphaned_parts_never_wedge_a_version_slot(spark, tmp_path):
    """ADVICE r12: parts live in uniquely-named dirs decoupled from
    the version number — a writer that crashes AFTER writing parts but
    BEFORE committing leaves an orphan no later writer collides with,
    and the orphan's files are never attributed to any commit."""
    import hbase_snapshotter_spark.sources.cowtable as cow

    path, df = _mk(spark, tmp_path, n=20, parts=2)
    before = _rows(cow_snapshot(spark, path))
    # simulate the crash: parts written, commit never happens
    orphan = cow._write_parts(
        spark.range(0, 3).select(F.col("id").alias("k"),
                                 F.lit(1).cast("long").alias("v")),
        path, ["k"])
    assert orphan  # files exist on disk...
    assert _rows(cow_snapshot(spark, path)) == before  # ...unreferenced
    # the next writer claims the same version number unimpeded
    src = spark.range(0, 2).select(F.col("id").alias("k"),
                                   F.lit(7).cast("long").alias("v"))
    res = cow_merge(spark, path, src)
    assert res["version"] == 1
    got = {r.k: r.v for r in cow_snapshot(spark, path).collect()}
    assert got[0] == 7 and got[1] == 7 and len(got) == 20
    # the orphan's rows never appear in any committed version
    committed = {a["file"] for e in cow._read_log(path) for a in e["adds"]}
    assert not ({a["file"] for a in orphan} & committed)


def test_schema_survives_empty_create_and_vacuum(spark, tmp_path):
    """ADVICE r12: the schema is persisted in the log entry — empty
    creates snapshot fine (adds=[] used to IndexError), and a
    fully-deleted table snapshots fine after vacuum physically removed
    every part file (the old probe read the version-0 first add
    file)."""
    # empty create
    path = str(tmp_path / "empty")
    empty = spark.createDataFrame([], "k long, v string")
    cow_create(empty, path, key_cols=["k"])
    snap = cow_snapshot(spark, path)
    assert snap.columns == ["k", "v"] and snap.count() == 0
    # merge into the empty table still schema-checks against the log
    src = spark.createDataFrame([(1, "a")], "k long, v string")
    cow_merge(spark, path, src)
    assert {r.k: r.v for r in cow_snapshot(spark, path).collect()} \
        == {1: "a"}

    # full delete + vacuum: no data file survives, snapshot still works
    path2 = str(tmp_path / "deleted")
    cow_create(spark.createDataFrame([(1, "a"), (2, "b")],
                                     "k long, v string"),
               path2, key_cols=["k"])
    cow_merge(spark, path2,
              spark.createDataFrame([(1, "x"), (2, "x")],
                                    "k long, v string"),
              matched="delete", insert_unmatched=False)
    cow_vacuum(path2, keep_last=1)
    snap2 = cow_snapshot(spark, path2)
    assert snap2.columns == ["k", "v"] and snap2.count() == 0


from hypothesis import given, settings, strategies as st  # noqa: E402

#: Small key space so random batches collide with existing rows (the
#: hard regime: updates and deletes hitting multiple files).
_key_st = st.integers(0, 14)
_batch_st = st.lists(
    st.tuples(_key_st, st.integers(0, 99),
              st.sampled_from(["I", "U", "D"])),
    min_size=0, max_size=6,
).map(lambda ops: {k: (v, op) for k, v, op in ops})  # net: one op/key


@given(base=st.dictionaries(_key_st, st.integers(0, 99),
                            min_size=1, max_size=8),
       batches=st.lists(_batch_st, min_size=1, max_size=3))
@settings(max_examples=6, deadline=None)
def test_cow_apply_changes_property(spark, tmp_path_factory, base,
                                    batches):
    """Property: for ANY base table and ANY sequence of net CDC
    batches, the cow table after applying them equals the dict-replayed
    state, and time travel at every intermediate version equals the
    replayed prefix — hypothesis walks upsert/delete interleavings,
    keys absent and present, empty batches, and multi-file layouts."""
    tmp = tmp_path_factory.mktemp("cowprop")
    path = str(tmp / "t")
    df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, v long")
    cow_create(df.repartitionByRange(2, "k"), path, key_cols=["k"])

    model = dict(base)
    snapshots = [dict(model)]
    for b in batches:
        rows = [(k, v, op) for k, (v, op) in b.items()]
        if not rows:
            snapshots.append(dict(model))
            continue
        cdc = spark.createDataFrame(rows, "k long, v long, op string")
        cow_apply_changes(spark, path, cdc)
        for k, (v, op) in b.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        snapshots.append(dict(model))

    got = {r.k: r.v for r in cow_snapshot(spark, path).collect()}
    assert got == model
    # time travel: every committed version replays its prefix
    versions = [e["version"] for e in cow_history(path)]
    applied = [s for b, s in zip([None] + batches, snapshots)
               if b is None or b]  # empty batches commit nothing
    assert len(versions) == len(applied)
    for ver, want in zip(versions, applied):
        tv = {r.k: r.v
              for r in cow_snapshot(spark, path, version=ver).collect()}
        assert tv == want, (ver, want)


def test_optimize_and_timestamp_travel(spark, tmp_path):
    """OPTIMIZE compacts the live small files into one part as a
    content-identical transaction (large files carried by reference,
    snapshot byte-for-byte unchanged, old versions still readable);
    timestamp time travel resolves wall-clock instants to versions
    with Delta's at-or-before rule."""
    import json as _json
    import time as _time

    from hbase_snapshotter_spark.sources.cowtable import (
        cow_optimize,
        version_at_timestamp,
    )

    path, df = _mk(spark, tmp_path, n=60, parts=6)
    t_after_create = _time.time()
    src = spark.range(0, 4).select(F.col("id").alias("k"),
                                   F.lit(5).cast("long").alias("v"))
    cow_merge(spark, path, src)
    before = _rows(cow_snapshot(spark, path))
    n_files_before = len(
        __import__("hbase_snapshotter_spark.sources.cowtable",
                   fromlist=["_live_files"])._live_files(path))

    res = cow_optimize(spark, path, small_file_rows=1024,
                       target_files=1)
    assert res["files_compacted"] == n_files_before
    assert cow_version(path) == 2
    after_live = __import__(
        "hbase_snapshotter_spark.sources.cowtable",
        fromlist=["_live_files"])._live_files(path)
    assert len(after_live) == 1  # all small -> one consolidated part
    # content-identical
    assert _rows(cow_snapshot(spark, path)) == before
    # prior versions still read exactly (old parts untouched on disk)
    assert len(_rows(cow_snapshot(spark, path, version=0))) == 60
    # idempotent-ish: a second optimize is a no-op (one live file)
    res2 = cow_optimize(spark, path)
    assert res2["files_compacted"] == 0 and cow_version(path) == 2

    # timestamp travel: an instant between create and merge resolves
    # to version 0; "now" resolves to the latest; prehistory raises
    assert version_at_timestamp(path, t_after_create) == 0
    assert version_at_timestamp(path, _time.time()) == 2
    assert _rows(cow_snapshot(spark, path,
                              as_of_ts=t_after_create)) \
        == _rows(df)
    with pytest.raises(ValueError, match="no version committed"):
        version_at_timestamp(path, 0.0)
    with pytest.raises(ValueError, match="not both"):
        cow_snapshot(spark, path, version=1, as_of_ts=t_after_create)
    # ts is stamped in every log entry
    e0 = _json.load(open(os.path.join(path, "_txlog",
                                      "00000000.json")))
    assert isinstance(e0["ts"], float)
