"""Copy-on-write transactional table — MERGE for the state side.

The incremental-state family (latest-cells, SCD2, aggregate views,
indexes — SURVEY §2.3 N25/N54/N84/…) maintains warehouse tables from
deltas; doing that safely on object storage needs a TRANSACTIONAL
upsert, which vanilla parquet directories lack.  Delta Lake / Iceberg
provide it in production; neither ships in this environment, so this
module implements the same protocol shape dependency-free — not a
toy: versioned atomic commits over immutable parquet parts, snapshot
isolation + time travel, optimistic concurrency detection, and a real
MERGE that rewrites ONLY the files containing matched keys.

Protocol (the Delta/Iceberg core, minus checkpointing):

* data lives in immutable parquet part files under ``<path>/data/v<N>/``
  (one directory per committing version — Spark's own part files, never
  renamed or mutated);
* the log is ``<path>/_txlog/<N>.json``, one file per version, each
  listing relative ``adds`` (with per-file ``n_rows`` + key min/max
  stats for pruning) and ``removes``;
* a snapshot at version ``V`` is (all adds ≤ V) − (all removes ≤ V) —
  readers replay the log (metadata-sized) and read exactly the live
  files: writers never disturb a reader's already-resolved file list
  (parts are immutable), which IS snapshot isolation;
* commits are atomic and conflict-checked via ``os.link`` of a
  temp file onto the next version slot — POSIX ``link(2)`` fails with
  ``EEXIST`` if a concurrent writer won the slot
  (:class:`CommitConflict`), the optimistic-concurrency primitive
  ``rename(2)`` cannot provide (it silently overwrites).

Scale shape: the log and per-version file lists are metadata
(files-sized, never data-sized); MERGE's touched-file discovery is one
scan of the candidate files semi-joined against the (batch-sized,
broadcast) source keys; the rewrite reads only touched files + source;
untouched files carry over by reference.  At 100 TB the cost of an
upsert is Ω(files containing matched keys), not Ω(table) — the same
bound Delta's MERGE gives, pytest-pinned here by asserting untouched
part files survive IDENTICALLY (same paths) across a merge.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG_DIR = "_txlog"
DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read the
    snapshot and retry the transaction (optimistic concurrency)."""


def _log_path(path: str, version: int) -> str:
    return os.path.join(path, LOG_DIR, f"{version:08d}.json")


def _read_log(path: str) -> list[dict]:
    """All committed log entries, version-ordered.  Metadata-sized."""
    d = os.path.join(path, LOG_DIR)
    if not os.path.isdir(d):
        raise ValueError(f"not a cow table (no {LOG_DIR}): {path}")
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    if not out:
        raise ValueError(f"cow table has no committed versions: {path}")
    return out


def cow_version(path: str) -> int:
    """Latest committed version."""
    return _read_log(path)[-1]["version"]


def _live_files(path: str, version: int | None = None) -> list[dict]:
    """The add entries live at ``version`` (default: latest), replayed
    from the log: adds minus removes, in add order."""
    entries = _read_log(path)
    if version is None:
        version = entries[-1]["version"]
    live: dict[str, dict] = {}
    seen = False
    for e in entries:
        if e["version"] > version:
            continue
        seen = seen or e["version"] == version
        for r in e["removes"]:
            live.pop(r, None)
        for a in e["adds"]:
            live[a["file"]] = a
    if not seen:
        raise ValueError(f"version {version} not in log at {path}")
    return list(live.values())


def _commit(path: str, entry: dict) -> None:
    """Atomically claim version slot ``entry['version']``: write a temp
    file, hard-link it onto the slot (fails iff the slot is taken),
    then drop the temp name.  Readers never observe a partial log.
    Stamps the wall-clock commit time (``ts``) for timestamp time
    travel — informational like Delta's, never load-bearing for
    correctness (version replay is)."""
    import time

    entry.setdefault("ts", time.time())
    os.makedirs(os.path.join(path, LOG_DIR), exist_ok=True)
    final = _log_path(path, entry["version"])
    tmp = os.path.join(path, LOG_DIR, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(entry, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {entry['version']} already committed at {path}; "
            "re-read the snapshot and retry") from None
    finally:
        os.unlink(tmp)


def _json_safe(v):
    return v if isinstance(v, (int, float, str, type(None))) else str(v)


def _write_parts(df: DataFrame, path: str,
                 key_cols: list[str]) -> list[dict]:
    """Write ``df`` as immutable parts in a UNIQUELY-NAMED directory
    and return their add entries (relative path + n_rows +
    native-typed min/max of the FIRST key column — the pruning hint
    :func:`_prune_candidates` consults; non-JSON types degrade to
    strings and are then ignored by pruning, which keeps pruning
    SOUND).

    ADVICE r12: the directory is ``data/<uuid>/``, decoupled from the
    version number (the Delta layout) — the LOG ENTRY, not the
    directory name, binds files to a version.  Consequences: two
    racing writers never collide on a directory (the loser gets the
    documented :class:`CommitConflict` from the log-slot claim, not an
    AnalysisException from ``mode('error')``); a writer that crashes
    after writing parts but before committing leaves an orphaned
    uncommitted directory that wedges NOTHING (no future writer reuses
    the name; it is simply never referenced by any log entry); and the
    add-entry read-back below lists only files THIS writer produced —
    no check-then-write window can attribute a competitor's parts to
    this commit."""
    rel_dir = f"{DATA_DIR}/{uuid.uuid4().hex}"
    out_dir = os.path.join(path, rel_dir)
    df.write.mode("error").parquet(out_dir)
    spark = df.sparkSession
    back = spark.read.parquet(out_dir)
    k0 = key_cols[0]
    stats = (back.groupBy(F.input_file_name().alias("f"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                  F.min(k0).alias("kmin"), F.max(k0).alias("kmax"))
             .collect())  # files-sized
    adds = []
    for r in stats:
        fname = os.path.basename(r.f)
        adds.append({"file": f"{rel_dir}/{fname}", "n_rows": r.n_rows,
                     "kmin": _json_safe(r.kmin),
                     "kmax": _json_safe(r.kmax)})
    return sorted(adds, key=lambda a: a["file"])


def _prune_candidates(live: list[dict], kmin, kmax) -> list[dict]:
    """Files whose first-key [kmin, kmax] span could intersect the
    source's — SOUND: a file is pruned only when both its stats and
    the source bounds are the same comparable primitive type and the
    ranges are provably disjoint; anything else stays a candidate."""
    kmin, kmax = _json_safe(kmin), _json_safe(kmax)
    out = []
    for a in live:
        lo, hi = a.get("kmin"), a.get("kmax")
        comparable = (
            lo is not None and hi is not None
            and kmin is not None and kmax is not None
            and ((isinstance(lo, (int, float))
                  and isinstance(hi, (int, float))
                  and isinstance(kmin, (int, float))
                  and isinstance(kmax, (int, float))
                  and not any(isinstance(x, bool)
                              for x in (lo, hi, kmin, kmax)))
                 or all(isinstance(x, str)
                        for x in (lo, hi, kmin, kmax))))
        if comparable and (hi < kmin or lo > kmax):
            continue  # provably disjoint — safe to skip
        out.append(a)
    return out


def cow_create(df: DataFrame, path: str, *, key_cols: list[str]) -> int:
    """Create a cow table at ``path`` from ``df`` — commit version 0.
    ``key_cols`` is the table's merge key (recorded in every commit;
    :func:`cow_merge` enforces it)."""
    if os.path.isdir(os.path.join(path, LOG_DIR)):
        raise ValueError(f"cow table already exists at {path}")
    adds = _write_parts(df, path, key_cols)
    # the schema is persisted IN the log entry (ADVICE r12): empty
    # snapshots and merge's schema check must not depend on a data
    # file that cow_vacuum may have physically deleted (or that never
    # existed — a table created from an empty frame has adds=[])
    _commit(path, {"version": 0, "op": "create", "key_cols": key_cols,
                   "schema": df.schema.json(),
                   "adds": adds, "removes": []})
    return 0


def version_at_timestamp(path: str, ts: float) -> int:
    """The newest version committed at or before wall-clock ``ts`` —
    Delta's ``TIMESTAMP AS OF`` resolution rule.  Raises ValueError
    when ``ts`` predates the table."""
    best = None
    for e in _read_log(path):
        if e.get("ts") is not None and e["ts"] <= ts:
            best = e["version"]
    if best is None:
        raise ValueError(
            f"no version committed at or before ts={ts} in {path}")
    return best


def cow_snapshot(spark, path: str, *, version: int | None = None,
                 as_of_ts: float | None = None) -> DataFrame:
    """The table's content at ``version`` (default latest) — time
    travel is just replaying less of the log; ``as_of_ts`` resolves a
    wall-clock timestamp to its version first (mutually exclusive with
    ``version``).  Returns a schema-stable empty frame for a
    fully-deleted table."""
    if as_of_ts is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        version = version_at_timestamp(path, as_of_ts)
    live = _live_files(path, version)
    files = [os.path.join(path, a["file"]) for a in live]
    if not files:
        return spark.createDataFrame([], _table_schema(spark, path))
    return spark.read.parquet(*files)


def _table_schema(spark, path: str):
    """The table's StructType, from the schema persisted in the log
    (ADVICE r12 — survives vacuum and empty creates); legacy tables
    without the field fall back to probing a still-present data file."""
    from pyspark.sql.types import StructType

    entries = _read_log(path)
    for e in entries:
        if "schema" in e:
            return StructType.fromJson(json.loads(e["schema"]))
    for e in entries:  # legacy table: probe any add file still on disk
        for a in e["adds"]:
            f = os.path.join(path, a["file"])
            if os.path.isfile(f):
                return spark.read.parquet(f).schema
    raise ValueError(
        f"cow table at {path} has no persisted schema and no surviving "
        "data file to probe one from")


def cow_history(path: str) -> list[dict]:
    """Commit audit: one dict per version with op and file/row deltas."""
    out = []
    for e in _read_log(path):
        out.append({"version": e["version"], "op": e["op"],
                    "n_added_files": len(e["adds"]),
                    "n_removed_files": len(e["removes"]),
                    "n_added_rows": sum(a["n_rows"] for a in e["adds"])})
    return out


def cow_merge(
    spark,
    path: str,
    source: DataFrame,
    *,
    matched: str = "update",
    insert_unmatched: bool = True,
) -> dict:
    """MERGE ``source`` into the table on its key columns — the Delta
    ``MERGE INTO`` core: ``matched='update'`` replaces matched target
    rows with the source row, ``matched='delete'`` drops them;
    ``insert_unmatched`` appends source rows whose key is absent.

    Only files CONTAINING matched keys are rewritten: discovery is one
    scan of the live files semi-joined against the broadcast source
    keys (per-file any-match), untouched files carry over by
    reference.  Returns ``{"version", "files_rewritten",
    "files_total"}``.  Raises :class:`CommitConflict` if another
    writer claims the version first — retry by re-calling (the merge
    itself is deterministic given the new snapshot).

    Contract: ``source`` must hold AT MOST ONE row per key (the same
    unambiguous-match rule Delta's MERGE enforces by raising) — a
    duplicated source key would land duplicated.  Net the source
    upstream (latest-wins reduction) exactly as for
    :func:`cow_apply_changes`."""
    if matched not in ("update", "delete"):
        raise ValueError(f"matched must be update|delete, got {matched!r}")
    entries = _read_log(path)
    key_cols = entries[0]["key_cols"]
    version = entries[-1]["version"]
    live = _live_files(path, version)

    src = source.persist()
    try:
        table_cols = sorted(_table_schema(spark, path).fieldNames())
        if sorted(src.columns) != table_cols:
            raise ValueError(
                f"source schema {sorted(src.columns)} != table "
                f"{table_cols}")
        bounds = src.agg(F.min(key_cols[0]), F.max(key_cols[0])) \
            .collect()[0]
        cand = _prune_candidates(live, bounds[0], bounds[1])
        keys = F.broadcast(src.select(*key_cols).distinct())
        touched_rel: list[str] = []
        if cand:
            # touched-file discovery: one scan of the CANDIDATE files
            # (stats-pruned), per-file any-match against broadcast keys
            cdf = spark.read.parquet(
                *[os.path.join(path, a["file"]) for a in cand])
            touched_abs = {r[0] for r in
                           cdf.select(F.input_file_name().alias("__f"),
                                      *key_cols)
                           .join(keys, key_cols, "left_semi")
                           .select("__f").distinct().collect()}
            touched_rel = sorted(
                a["file"] for a in cand
                if any(t.endswith(a["file"]) for t in touched_abs))

        adds: list[dict] = []
        new_version = version + 1
        if touched_rel or insert_unmatched:
            parts = []
            if touched_rel:
                tdf = spark.read.parquet(
                    *[os.path.join(path, f) for f in touched_rel])
                cols = tdf.columns
                parts.append(tdf.join(keys, key_cols, "left_anti"))
                if matched == "update":
                    parts.append(
                        tdf.select(*key_cols).distinct()
                        .join(F.broadcast(src), key_cols, "inner")
                        .select(*cols))
            if insert_unmatched:
                # a source key exists in the table iff it matched a
                # touched file — existence needs only tdf, never the
                # whole table
                if touched_rel:
                    existing = tdf.select(*key_cols).distinct()
                    ins = src.join(existing, key_cols, "left_anti")
                else:
                    ins = src
                parts.append(ins)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            adds = _write_parts(out, path, key_cols)
        _commit(path, {"version": new_version, "op": f"merge:{matched}",
                       "key_cols": key_cols, "adds": adds,
                       "removes": touched_rel})
        return {"version": new_version,
                "files_rewritten": len(touched_rel),
                "files_candidates": len(cand),
                "files_total": len(live)}
    finally:
        src.unpersist()


def cow_apply_changes(spark, path: str, changes: DataFrame, *,
                      op_col: str = "op",
                      txn: dict | None = None) -> dict:
    """Apply a CDC batch (``op_col`` ∈ {'I','U','D'} per row) — the
    changelog→warehouse step the reference's pipeline feeds (S1→S12):
    upserts (I/U) and deletes (D) land in ONE merge transaction so a
    reader sees either none or all of the batch.  Delete rows need
    only their key columns populated.

    ``txn`` (ADVICE r12) is an optional idempotence stamp — e.g.
    ``{"app_id": ..., "batch_id": ...}``, mirroring Delta's
    txnAppId/txnVersion — written INSIDE the commit entry, atomically
    with the version claim: a crash can never leave a committed-but-
    unstamped version for the streaming ledger to re-apply.

    Contract: the batch must be a NET changefeed — at most one op per
    key (exactly what the N50 state-diff emits); a raw transaction
    log with several I/U rows for one key must be netted upstream
    (latest-wins), the same rule as the N100 index maintainers."""
    ups = changes.filter(F.col(op_col).isin("I", "U")).drop(op_col)
    dels = changes.filter(F.col(op_col) == "D").drop(op_col)
    key_cols = _read_log(path)[0]["key_cols"]
    # ONE transaction: rewrite files touched by EITHER side; within
    # the batch, target rows under any changed key are dropped and the
    # upsert rows land — so a key in both D and I/U nets to the new
    # row, a D-only key nets to gone
    merged = ups.unionByName(dels).persist()
    try:
        version = cow_version(path)
        live = _live_files(path, version)
        bounds = merged.agg(F.min(key_cols[0]),
                            F.max(key_cols[0])).collect()[0]
        cand = _prune_candidates(live, bounds[0], bounds[1])
        all_keys = F.broadcast(merged.select(*key_cols).distinct())
        touched_rel: list[str] = []
        if cand:
            cdf = spark.read.parquet(
                *[os.path.join(path, a["file"]) for a in cand])
            touched_abs = {r[0] for r in
                           cdf.select(F.input_file_name().alias("__f"),
                                      *key_cols)
                           .join(all_keys, key_cols, "left_semi")
                           .select("__f").distinct().collect()}
            touched_rel = sorted(
                a["file"] for a in cand
                if any(t.endswith(a["file"]) for t in touched_abs))
        parts = []
        if touched_rel:
            tdf = spark.read.parquet(
                *[os.path.join(path, f) for f in touched_rel])
            parts.append(tdf.join(all_keys, key_cols, "left_anti"))
            parts.append(ups.select(*tdf.columns))
        else:
            parts.append(ups)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        new_version = version + 1
        adds = _write_parts(out, path, key_cols) \
            if touched_rel or not ups.isEmpty() else []
        entry = {"version": new_version, "op": "apply_changes",
                 "key_cols": key_cols, "adds": adds,
                 "removes": touched_rel}
        if txn is not None:
            entry["txn"] = dict(txn)
        _commit(path, entry)
        return {"version": new_version,
                "files_rewritten": len(touched_rel),
                "files_candidates": len(cand),
                "files_total": len(live)}
    finally:
        merged.unpersist()


def cow_optimize(spark, path: str, *,
                 small_file_rows: int = 1024,
                 target_files: int = 1) -> dict:
    """OPTIMIZE: compact the live SMALL files (≤ ``small_file_rows``
    rows by their logged stats) into ``target_files`` consolidated
    parts as one content-identical transaction — the Delta OPTIMIZE /
    N104-compaction-planner action on the transactional store.  Large
    files carry over by reference; a reader at any moment sees the
    same rows before, during, and after (snapshot isolation — the old
    parts stay on disk until :func:`cow_vacuum`).  Returns
    ``{"version", "files_compacted", "files_total"}`` (version
    unchanged and no commit when fewer than two small files exist —
    compaction of one file is a no-op rewrite)."""
    entries = _read_log(path)
    key_cols = entries[0]["key_cols"]
    version = entries[-1]["version"]
    live = _live_files(path, version)
    small = [a for a in live if a["n_rows"] <= small_file_rows]
    if len(small) < 2:
        return {"version": version, "files_compacted": 0,
                "files_total": len(live)}
    df = spark.read.parquet(
        *[os.path.join(path, a["file"]) for a in small]) \
        .coalesce(max(1, target_files))
    adds = _write_parts(df, path, key_cols)
    _commit(path, {"version": version + 1, "op": "optimize",
                   "key_cols": key_cols, "adds": adds,
                   "removes": sorted(a["file"] for a in small)})
    return {"version": version + 1, "files_compacted": len(small),
            "files_total": len(live)}


def cow_vacuum(path: str, *, keep_last: int = 1) -> dict:
    """Physically delete part files unreferenced by the last
    ``keep_last`` versions (older time travel stops working — the
    retention trade every table format makes).  Log entries stay (the
    history remains auditable); only data files go."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    entries = _read_log(path)
    latest = entries[-1]["version"]
    keep_from = latest - keep_last + 1
    needed: set[str] = set()
    for v in range(keep_from, latest + 1):
        try:
            needed |= {a["file"] for a in _live_files(path, v)}
        except ValueError:
            continue
    all_files = {a["file"] for e in entries for a in e["adds"]}
    drop = sorted(all_files - needed)
    for rel in drop:
        f = os.path.join(path, rel)
        if os.path.isfile(f):
            os.unlink(f)
    return {"deleted_files": len(drop), "retained_files": len(needed)}
