"""Multi-dimensional data layout — Z-order (Morton-curve) clustering.

The reference's output layout is whatever Hive gives it
(``HBaseSnapshotter.scala:134-137``); at 100 TB the LAYOUT of the
warehouse table governs how much of it any query reads.  Partitioning
and bucketing (sources/warehouse.py) cluster on ONE key each; queries
that filter on a *different* dimension read everything.  Z-ordering —
the Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern — interleaves the bits
of several dimensions into one clustering key, so file-level min/max
stats prune scans on ANY of the interleaved dimensions (each of d
dimensions degrades to ~n^(1-1/d) of the files instead of all of them).

Everything here is pure column expressions (whole-stage codegen, zero
shuffle for the key itself):

- :func:`grid_coord` — exact integer grid quantization of a dimension
  against broadcast one-row min/max bounds (BIGINT arithmetic only, so
  the SQL oracle replays it bit-for-bit; floats would round
  differently per engine).
- :func:`zorder_value` — bit interleaving of two grid coordinates into
  the Morton code (a static sum of shift/mask terms).
- :func:`zorder_bucket` — the top ``log2(n_buckets)`` bits of the
  Morton code: the write-side clustering key.  Writing with
  ``partitionBy(bucket)`` (or range-partitioning on it) yields files
  whose per-dimension min/max spans are tight on BOTH dimensions —
  which is the whole point, and what the audit query measures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code (16-bit z for 2 dims).
Z_BITS = 8


def grid_coord(x: Column, xmin: Column, xmax: Column, *,
               bits: int = Z_BITS) -> Column:
    """Quantize ``x`` onto the ``[0, 2**bits)`` integer grid spanned by
    inclusive bounds ``[xmin, xmax]``: ``(x - xmin) * 2**bits ÷ (xmax -
    xmin + 1)`` in BIGINT arithmetic — exact, monotone, and < 2**bits
    for every in-range x (the numerator is at most ``(range-1) *
    2**bits`` and the divisor is ``range``)."""
    cells = F.lit(1 << bits).cast("bigint")
    rng = (xmax - xmin + F.lit(1)).cast("bigint")
    return F.floor(((x - xmin).cast("bigint") * cells) / rng).cast("bigint")


def zorder_value(b1: Column, b2: Column, *, bits: int = Z_BITS) -> Column:
    """Morton code of two ``bits``-wide grid coordinates: bit i of
    ``b1`` lands at position 2i+1, bit i of ``b2`` at 2i.  A static sum
    of ``2*bits`` shift/mask terms — whole-stage codegen folds it into
    straight-line arithmetic."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (F.shiftright(b1, i).bitwiseAND(F.lit(1))
                 * F.lit(1 << (2 * i + 1)).cast("bigint"))
        z = z + (F.shiftright(b2, i).bitwiseAND(F.lit(1))
                 * F.lit(1 << (2 * i)).cast("bigint"))
    return z


def zorder_bucket(z: Column, *, n_buckets: int, bits: int = Z_BITS) -> Column:
    """Top ``log2(n_buckets)`` bits of the Morton code — the clustering
    bucket.  Because high Morton bits alternate between the two
    dimensions' high bits, every bucket is a square-ish tile of the
    2-D grid: tight min/max on BOTH dimensions."""
    shift = 2 * bits - (n_buckets - 1).bit_length()
    return F.shiftright(z, shift)


def _int_div(a: Column, b: Column) -> Column:
    """Exact BIGINT floor-division (both operands non-negative) —
    Spark's integral ``div`` operator, replayed by DuckDB's ``//``.
    The former ``(a - a mod b) / b`` idiom routed through a DOUBLE
    and silently lost exactness once the numerator exceeded 2^53
    (ADVICE r10) — ``div`` stays in 64-bit integers end to end."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def equidepth_bucket(q_rank: Column, n_buckets: int) -> Column:
    """Equi-depth layout bucket from a 4-dp quantile rank (the N74
    sortless ``percent_rank``): ``⌊rank · B⌋`` clamped to ``B-1`` —
    computed in BIGINT arithmetic on the rank's 4-dp integer form, so
    no float product can straddle a bucket boundary differently per
    engine.  Range-partitioning the write on this bucket yields files
    of ~equal ROW COUNT however skewed the value distribution — the
    property fixed-width bucketing loses (the audit query measures
    both)."""
    r = F.round(q_rank * 10000).cast("long")
    return F.least(_int_div(r * n_buckets, F.lit(10000).cast("long")),
                   F.lit(n_buckets - 1).cast("long"))


def fixed_width_bucket_micro(vi: Column, vmin: Column, vmax: Column,
                             n_buckets: int) -> Column:
    """Fixed-width bucket over the inclusive micro-unit range
    ``[vmin, vmax]`` (values pre-scaled to 4-dp BIGINT micro-units, the
    ``grid_coord`` discipline): ``(vi - vmin) · B ÷ (vmax - vmin + 1)``
    in exact BIGINT arithmetic — the naive layout the audit contrasts
    equi-depth against."""
    return _int_div((vi - vmin) * F.lit(n_buckets).cast("bigint"),
                    (vmax - vmin + F.lit(1)).cast("bigint"))


def compaction_plan(
    inv,
    *,
    partition_col: str,
    file_col: str = "file_id",
    size_col: str = "size_bytes",
    files_target: int = 4,
):
    """Small-file compaction planner (SURVEY §2.3 N104) — the
    ``OPTIMIZE``/bin-packing pass every 100 TB table needs: streaming
    ingestion and partitioned writes leave partitions full of KB-sized
    files, and scan cost degrades to per-file overhead (task setup,
    footer reads, open/seek) instead of bytes.

    Input is a file INVENTORY ``(partition, file_id, size_bytes)`` —
    metadata-sized (one row per file), never the data.  Per partition:
    the adaptive target is ``ceil(total / files_target)`` (the
    total-preserving form of "aim for N files per partition"); files
    already ≥ target are ``keep`` (no rewrite — the planner must never
    churn healthy files); the rest are ``compact``, binned by the
    one-pass cumulative-offset rule over the (size DESC, file_id)
    order: ``group = floor(cum_bytes_before / target)``.  Greedy
    first-fit-decreasing packs marginally tighter but is inherently
    sequential; the cumulative form is pure window algebra (exact
    BIGINT, SQL-replayable) and bounds every non-final group's fill to
    ``(target - max_file, target + max_file)`` — each group owns a
    contiguous ``target``-wide span of the cumulative byte line, so it
    can miss at most one boundary-straddling file and absorb at most
    one.

    Output: one row per file with its action, group, and the group's
    economics (file count, bytes, exact half-up fill permille vs
    target).  Scale: one inventory aggregate + one per-partition window
    whose partitions are files-per-table-partition sized, then a
    group-level aggregate — no data movement is planned here, only
    described."""
    from pyspark.sql import Window

    pc, fc, sc = partition_col, file_col, size_col
    totals = inv.groupBy(pc).agg(F.sum(sc).cast("bigint").alias("__total"))
    # _int_div, not double-valued `/`: the "exact BIGINT" claim must
    # hold past 2^53 total bytes at 100 TB partitions (ADVICE r9)
    target = _int_div(
        F.col("__total") + F.lit(files_target - 1).cast("bigint"),
        F.lit(files_target).cast("bigint"))
    base = (inv.join(F.broadcast(totals), pc)
            .withColumn("__target", target)
            .withColumn("action",
                        F.when(F.col(sc) >= F.col("__target"), "keep")
                        .otherwise("compact")))
    w = (Window.partitionBy(pc)
         .orderBy(F.col(sc).desc(), F.col(fc).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    compact = (
        base.filter(F.col("action") == "compact")
        .withColumn("__cum_before",
                    F.coalesce(F.sum(sc).over(w), F.lit(0)).cast("bigint"))
        .withColumn("group_id",
                    _int_div(F.col("__cum_before"), F.col("__target"))))
    econ = compact.groupBy(pc, "group_id").agg(
        F.count(F.lit(1)).cast("long").alias("group_files"),
        F.sum(sc).cast("bigint").alias("group_bytes"))
    fill = (2000 * F.col("group_bytes") + F.col("__target"))
    out_compact = (
        compact.join(econ, [pc, "group_id"])
        .withColumn("fill_permille",
                    _int_div(fill, 2 * F.col("__target"))))
    out_keep = (
        base.filter(F.col("action") == "keep")
        .withColumn("group_id", F.lit(None).cast("bigint"))
        .withColumn("group_files", F.lit(1).cast("long"))
        .withColumn("group_bytes", F.col(sc).cast("bigint"))
        .withColumn("fill_permille",
                    _int_div(2000 * F.col(sc).cast("bigint")
                             + F.col("__target"),
                             2 * F.col("__target"))))
    cols = [pc, fc, F.col(sc).cast("bigint").alias(sc),
            F.col("__target").alias("target_bytes"),
            "action", "group_id", "group_files", "group_bytes",
            "fill_permille"]
    return out_compact.select(*cols).unionAll(out_keep.select(*cols))


def hrw_shard(key: Column, n_shards: int) -> Column:
    """Rendezvous (highest-random-weight) shard of ``key``: argmax over
    shards of ``md5(key | shard)`` — ties broken toward the larger
    shard id (``array_max`` struct order; md5 collisions across salts
    are no practical concern, but the rule keeps both engines
    deterministic).  Pure column
    expressions (n md5 evaluations per row), SQL-replayable."""
    weights = F.array(*[
        F.struct(
            F.md5(F.concat_ws("|", key, F.lit(str(s)))).alias("w"),
            F.lit(s).cast("int").alias("s"))
        for s in range(n_shards)])
    return F.array_max(weights)["s"]


def shard_rebalance_audit(
    df: DataFrame,
    key_col: str,
    *,
    n_before: int,
    n_after: int,
) -> DataFrame:
    """Re-sharding cost audit (SURVEY §2.3 N108): how many rows MOVE
    when a hash-sharded layout scales from ``n_before`` to ``n_after``
    shards, under (a) the modulo scheme every ``% n_buckets`` layout in
    this engine uses and (b) rendezvous hashing (HRW).  Modulo remaps
    ~``1 − 1/lcm·…`` ≈ almost everything (n/(n+1) for n→n+1); HRW
    moves only the keys whose new shard's weight beats all incumbents
    — expected ``1 − n_before/n_after`` — and never moves a key
    BETWEEN surviving shards.  That asymmetry is the operational cost
    of growing the pruned snapshot-state / postings / code-table
    layouts, measured instead of assumed.

    Output: one row per scheme with rows, moved rows, exact half-up
    moved permille, and the HRW stability invariant (every move lands
    on a NEW shard id ≥ n_before when growing) as a flag.  One scan,
    one 2-row aggregate; the per-row cost is 2·(n_before + n_after)
    md5 evaluations (shard counts are config-sized constants)."""
    key = F.col(key_col).cast("string")
    mod_b = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
             .cast("long") % n_before)
    mod_a = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
             .cast("long") % n_after)
    hrw_b = hrw_shard(key, n_before)
    hrw_a = hrw_shard(key, n_after)

    def lane(tag: str, before, after, stable_expr) -> DataFrame:
        moved = F.sum(F.when(before != after, 1).otherwise(0)) \
            .cast("long")
        n = F.count(F.lit(1)).cast("long")
        pm = 2000 * moved + n
        return df.agg(
            n.alias("n_rows"), moved.alias("n_moved"),
            F.floor(pm / (2 * n)).cast("long").alias("moved_permille"),
            F.bool_and(stable_expr).alias("moves_only_to_new_shards"),
        ).select(F.lit(tag).alias("scheme"), "n_rows", "n_moved",
                 "moved_permille", "moves_only_to_new_shards")

    if n_after > n_before:
        mod_stable = (mod_b == mod_a) | (mod_a >= n_before)
        hrw_stable = (hrw_b == hrw_a) | (hrw_a >= n_before)
    else:  # shrinking: "lands on a surviving shard" is vacuous
        mod_stable = hrw_stable = F.lit(True)
    return lane("modulo", mod_b, mod_a, mod_stable).unionAll(
        lane("rendezvous", hrw_b, hrw_a, hrw_stable))


def zone_map_pruning_audit(
    df,
    file_col: str,
    predicates: list[tuple[str, str, float, float]],
):
    """Zone-map data skipping (SURVEY §2.3 N124) — the min/max
    file-statistics pruning every 100 TB table format (Parquet row
    groups, Iceberg/Delta file stats) lives by, audited exactly: per
    "file" (write partition), the zone map is ``(min, max, n_rows)``
    of each probed column; a range predicate scans a file iff
    ``[min, max]`` intersects ``[lo, hi]``.  For each predicate the
    audit reports files scanned/skipped (exact skip permille) and
    verifies the SOUNDNESS invariant a zone map must never break:
    every matching row lives in a scanned file (``no_false_skips`` —
    computed from the data, not asserted; over-scanning is allowed,
    under-scanning is corruption).

    ``predicates`` — ``(name, column, lo, hi)`` literals.  This is the
    lane that MOTIVATES the z-order lane one suite over: a predicate
    on the column the files are partitioned by skips almost
    everything, an uncorrelated column skips almost nothing, and
    multi-dimensional interleaving is the fix.

    Scale shape: the zone map is one map-side-combined aggregate
    (files-sized output); predicates are a broadcast literal table
    (files × preds bounded rows); the exact verification is ONE more
    scan with the same broadcast — the audit lane's cost, linear and
    shuffle-free beyond the files-sized agg."""
    probe_cols = sorted({c for _, c, _, _ in predicates})
    zm = df.groupBy(file_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[m for c in probe_cols
          for m in (F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))])
    spark = df.sparkSession
    pred_df = spark.createDataFrame(
        predicates, "pred string, col string, lo double, hi double")
    scanned = F.lit(False)
    for c in probe_cols:
        scanned = F.when(
            F.col("col") == c,
            (F.col(f"__mx_{c}") >= F.col("lo"))
            & (F.col(f"__mn_{c}") <= F.col("hi"))).otherwise(scanned)
    j = zm.join(F.broadcast(pred_df))
    per_pred = (
        j.groupBy("pred", "col", "lo", "hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
             F.sum(scanned.cast("long")).cast("long").alias("n_scanned"),
             F.sum(F.when(scanned, F.col("__n")).otherwise(0))
             .cast("long").alias("n_rows_in_scanned")))
    # exact verification pass: matched rows overall vs matched rows
    # inside scanned files — equal iff no file was falsely skipped
    rows = df.select(
        file_col, *[F.col(c).cast("double").alias(f"__v_{c}")
                    for c in probe_cols])
    matched_val = F.lit(None).cast("double")
    for c in probe_cols:
        matched_val = F.when(F.col("col") == c,
                             F.col(f"__v_{c}")).otherwise(matched_val)
    rj = rows.join(F.broadcast(pred_df))
    is_match = matched_val.between(F.col("lo"), F.col("hi"))
    file_scan = (rj.groupBy("pred", file_col)
                 .agg(F.sum(is_match.cast("long")).alias("__m")))
    zm_verdict = j.select("pred", file_col, scanned.alias("__scanned"))
    # both verdict tables are (files × preds)-bounded — broadcast
    # explicitly: they come out of aggregates, so the static planner
    # has no size stats and would plan a sort-merge join
    exact = (file_scan.join(F.broadcast(zm_verdict),
                            ["pred", file_col])
             .groupBy("pred")
             .agg(F.sum("__m").cast("long").alias("n_rows_matched"),
                  F.sum(F.when(~F.col("__scanned"), F.col("__m"))
                        .otherwise(0)).cast("long").alias("__missed")))
    pm = 2000 * (F.col("n_files") - F.col("n_scanned")) + F.col("n_files")
    return (per_pred.join(F.broadcast(exact), "pred")
            .select("pred", "col", "lo", "hi", "n_files", "n_scanned",
                    (F.col("n_files") - F.col("n_scanned")).cast("long")
                    .alias("n_skipped"),
                    ((pm - F.pmod(pm, 2 * F.col("n_files")))
                     / (2 * F.col("n_files"))).cast("long")
                    .alias("skip_permille"),
                    "n_rows_matched",
                    (F.col("__missed") == 0).alias("no_false_skips")))


# ---------------------------------------------------------------------------
# N128 (round 11): incremental zone-map maintenance — the N25/N84
# state-family posture applied to the N124 file statistics.  Appends
# are LOSSLESSLY mergeable (count sums, min/max narrow monotonically),
# so the advanced map equals a rebuild exactly; deletes are NOT (a
# deleted extremum cannot tighten min/max without rereading the file),
# so the retracted map is STALE-BUT-SOUND — exactly the Iceberg/Delta
# delete-file posture, where stats over-approximate until a
# rewrite/compaction re-tightens the touched files.
# ---------------------------------------------------------------------------


def zone_map_state(df, file_col: str, stat_col: str):
    """Per-file zone-map state for one probed column: ``(file,
    n_rows, vmin, vmax, tight)`` — one map-side-combined aggregate,
    files-sized output.  ``tight`` is TRUE for a freshly-built map:
    the min/max are exactly the file's extrema."""
    return (df.groupBy(F.col(file_col).alias("file_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min(F.col(stat_col).cast("double")).alias("vmin"),
                 F.max(F.col(stat_col).cast("double")).alias("vmax"))
            .withColumn("tight", F.lit(True)))


def advance_zone_map(state, appends, file_col: str, stat_col: str):
    """Advance the zone map with APPEND rows only — the lossless
    direction: counts sum, min/max take least/greatest, and a file
    stays ``tight`` iff its prior state was (appends alone never
    loosen tightness).  State-sized ⟗ appends'-files-sized merge; the
    appends are aggregated map-side before the join so nothing
    row-sized shuffles."""
    ap = zone_map_state(appends, file_col, stat_col).select(
        "file_id", F.col("n_rows").alias("__an"),
        F.col("vmin").alias("__amn"), F.col("vmax").alias("__amx"))
    st = state.select("file_id", "n_rows", "vmin", "vmax", "tight")
    return (st.join(ap, "file_id", "full_outer")
            .select(
                "file_id",
                (F.coalesce("n_rows", F.lit(0))
                 + F.coalesce("__an", F.lit(0)))
                .cast("long").alias("n_rows"),
                F.least(
                    F.coalesce("vmin", F.col("__amn")),
                    F.coalesce("__amn", F.col("vmin"))).alias("vmin"),
                F.greatest(
                    F.coalesce("vmax", F.col("__amx")),
                    F.coalesce("__amx", F.col("vmax"))).alias("vmax"),
                F.coalesce("tight", F.lit(True)).alias("tight")))


def retract_zone_map(state, deletes, file_col: str):
    """Retract DELETE rows from the zone map: counts decrement
    exactly; min/max CANNOT tighten without rereading the file, so
    they are kept as a sound over-approximation and the file is
    marked ``tight = false`` (the signal a compaction planner uses to
    schedule a stats rewrite).  Files whose rows are all deleted drop
    out.  Deletes aggregate to per-file counts map-side — state-sized
    join, nothing row-sized shuffles."""
    dl = (deletes.groupBy(F.col(file_col).alias("file_id"))
          .agg(F.count(F.lit(1)).cast("long").alias("__dn")))
    st = state.select("file_id", "n_rows", "vmin", "vmax", "tight")
    return (st.join(dl, "file_id", "left")
            .select(
                "file_id",
                (F.col("n_rows") - F.coalesce("__dn", F.lit(0)))
                .cast("long").alias("n_rows"),
                "vmin", "vmax",
                (F.col("tight") & F.coalesce("__dn", F.lit(0)).eqNullSafe(0))
                .alias("tight"))
            .filter(F.col("n_rows") > 0))


def retighten_zone_map(state, base, file_col: str, stat_col: str):
    """Re-tighten the stale files ONLY: rebuild stats from ``base``
    (the post-delete table) for files with ``tight = false``, keep
    every tight file's row untouched — the N94
    ``recompute_affected_groups`` pattern.  The rebuild side is
    pruned to touched files by a broadcast semi-join BEFORE the
    aggregate, so its cost is the touched files' rows, not the
    corpus."""
    stale = state.filter(~F.col("tight")).select("file_id")
    fresh = zone_map_state(
        base.join(F.broadcast(stale),
                  base[file_col] == stale["file_id"], "left_semi"),
        file_col, stat_col)
    return state.filter(F.col("tight")).unionByName(fresh)


def zone_map_skip_stats(state, lo: float, hi: float):
    """Files-sized skip summary of a range predicate against a zone
    map (possibly stale): scanned iff ``[vmin, vmax]`` intersects
    ``[lo, hi]``.  Returns one row: files, scanned, skipped, half-up
    skip permille, and how many scanned files were stale — the
    measurable cost of delete-staleness (stale stats can only
    OVER-scan, never under-scan, so skip permille degrades while
    soundness holds)."""
    scanned = (F.col("vmax") >= lo) & (F.col("vmin") <= hi)
    pm = (lambda n_f, n_sk: 2000 * n_sk + n_f)
    n_files = F.count(F.lit(1)).cast("long")
    n_scanned = F.sum(scanned.cast("long")).cast("long")
    n_skipped = (n_files - n_scanned).cast("long")
    return state.agg(
        n_files.alias("n_files"),
        n_scanned.alias("n_scanned"),
        n_skipped.alias("n_skipped"),
        _int_div(pm(n_files, n_skipped), 2 * n_files)
        .alias("skip_permille"),
        F.sum((scanned & ~F.col("tight")).cast("long")).cast("long")
        .alias("n_scanned_stale"))
