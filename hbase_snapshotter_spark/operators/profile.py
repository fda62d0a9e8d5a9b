"""Single-pass column profiling / data-quality audit (SURVEY §2.3 N33).

Every serious ingestion pipeline fronts its 100 TB tables with a
profiling pass (Deequ/Great Expectations shape): per-column
completeness, cardinality, range, and central tendency, computed in ONE
scan so the audit costs a read, not a read per metric.

Spark-first form: all metrics for all columns are expressions of a
single ``df.agg(...)`` — one scan, map-side partial aggregation, a
one-row result — then ``F.inline`` pivots that row into the long
(one-row-per-column) audit table, a driver-free O(C) reshape.

Cardinality carries BOTH estimators on purpose:

- ``approx_distinct`` — HyperLogLog++ (`approx_count_distinct`), the
  100 TB path: constant memory, merges in the map-side partials, never
  widens the plan;
- ``n_distinct`` — exact, the oracle-replayable path.  Multiple exact
  distincts in one aggregate make Catalyst plan an ``Expand`` (the
  input is duplicated once per distinct column); that is the documented
  price of exactness, and at production scale the profiler is run with
  ``exact_distinct=False`` to drop the Expand and keep only the HLL
  (same one-scan plan minus the duplication).

The two estimators meet in ``approx_distinct_ok`` — |HLL − exact| ≤
rel_tol·exact — folded into the value hash so an HLL accuracy
regression turns the driver row red (the `agg_approx_distinct`
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: HLL relative-error target (Spark's default rsd is 0.05); the audit
#: flag allows 3× the target so a correct sketch never trips it.
PROFILE_RSD = 0.05
PROFILE_REL_TOL = 0.15


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-scan profile of ``numeric_cols`` + ``string_cols``: returns
    one row per column — ``(column, n_rows, n_nulls, n_distinct,
    approx_distinct_ok, min_num, max_num, mean_num, min_str, max_str,
    avg_len)`` — numeric stats NULL for string columns and vice versa.

    ``exact_distinct=False`` is the 100 TB mode: ``n_distinct`` is
    emitted as the HLL estimate itself (flag trivially true) and the
    plan loses the Expand duplication that exact multi-column distinct
    requires."""
    cols = numeric_cols + string_cols
    if len(set(cols)) != len(cols):
        raise ValueError(f"profile_columns: duplicate columns in {cols}")
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(c).alias(f"__cnt_{c}"))
        aggs.append(
            F.approx_count_distinct(c, PROFILE_RSD).alias(f"__apx_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__dst_{c}"))
    for c in numeric_cols:
        aggs += [
            F.min(c).cast("double").alias(f"__min_{c}"),
            F.max(c).cast("double").alias(f"__max_{c}"),
            F.round(F.avg(c), 4).alias(f"__avg_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            F.round(F.avg(F.length(F.col(c).cast("string"))), 4)
             .alias(f"__len_{c}"),
        ]
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def _distinct(c: str):
        return (F.col(f"__dst_{c}") if exact_distinct
                else F.col(f"__apx_{c}").cast("long"))

    def _flag(c: str):
        if not exact_distinct:
            return F.lit(True)
        return (
            F.abs(F.col(f"__apx_{c}") - F.col(f"__dst_{c}"))
            <= F.lit(PROFILE_REL_TOL) * F.col(f"__dst_{c}"))

    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            _distinct(c).alias("n_distinct"),
            _flag(c).alias("approx_distinct_ok"),
            F.col(f"__min_{c}").alias("min_num"),
            F.col(f"__max_{c}").alias("max_num"),
            F.col(f"__avg_{c}").alias("mean_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            null_d.alias("avg_len"),
        )
        for c in numeric_cols
    ] + [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            _distinct(c).alias("n_distinct"),
            _flag(c).alias("approx_distinct_ok"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            null_d.alias("mean_num"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
            F.col(f"__len_{c}").alias("avg_len"),
        )
        for c in string_cols
    ]
    return one.select(F.inline(F.array(*rows)))


#: Classic PSI decision thresholds (Siddiqi 2006): < 0.1 stable,
#: 0.1–0.2 moderate shift, > 0.2 significant drift.
PSI_DRIFT_THRESHOLD = 0.2


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Population Stability Index between two slices of a positive
    metric, per group (SURVEY §2.3 N66) — the drift audit a pipeline
    runs between snapshot eras / ingestion days before trusting new
    data: ``PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i)`` over the
    DDSketch log buckets (:func:`~.sketches.dd_bucket` — the same
    engine-portable bucketing the quantile state uses), with add-0.5
    smoothing over the union of observed buckets so one-sided buckets
    contribute finitely.

    Determinism: every PSI term is individually ≥ 0 ((p−q) and
    ln(p/q) share sign), each is snapped to integer micro-units
    (``round(term·10⁶)`` BIGINT — a transcendental has no systematic
    .5 ties, the N60 posture), summed exactly, and divided once
    half-up — bit-identical on any engine and any summation order.

    Scale shape: ONE scan of each side feeding a single
    ``(group, bucket, era)``-conditional hash agg (map-side partials;
    shuffle ≤ groups × buckets, never events), per-group totals from
    the BUCKET table (bounded by geometry), broadcast back, one final
    per-group fold.  Returns ``(*group_cols, n_buckets, n_a, n_b,
    psi, drifted)``; groups present in only one era still appear
    (their PSI is the smoothed divergence from nothing).
    """
    def side(df: DataFrame, flag: str) -> DataFrame:
        return value_histogram(df, value_col, group_cols=group_cols) \
            .withColumn("__era", F.lit(flag))

    bc = (
        side(df_a, "a").unionByName(side(df_b, "b"))
        .groupBy(*group_cols, "bucket")
        .agg(F.sum(F.when(F.col("__era") == "a", F.col("cnt")).otherwise(0))
             .alias("ca"),
             F.sum(F.when(F.col("__era") == "b", F.col("cnt")).otherwise(0))
             .alias("cb"))
    )
    return _psi_from_joint(bc, group_cols)


def value_histogram(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
) -> DataFrame:
    """Per-group DDSketch-bucket histogram ``(*group_cols, bucket,
    cnt)`` of a positive metric — the MATERIALIZABLE drift-reference
    form (it is exactly the N58 quantile state, so it merges by bucket
    sum and advances with deltas).  One map-side-combined hash agg;
    output ≤ groups × buckets rows."""
    from hbase_snapshotter_spark.operators.sketches import dd_bucket

    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .groupBy(*group_cols, dd_bucket(value_col).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt")))


def psi_from_histograms(
    ref: DataFrame,
    obs: DataFrame,
    *,
    group_cols: list[str],
) -> DataFrame:
    """PSI from two ALREADY-BUCKETED histograms (``(*group_cols,
    bucket, cnt)`` — :func:`value_histogram` output): the state-level
    entry point the streaming drift monitor uses, where the reference
    histogram is materialized once and each micro-batch brings only
    its own bucket counts.  Same math, smoothing, and integer
    micro-unit determinism as :func:`psi_drift`."""
    a = ref.select(*group_cols, "bucket", F.col("cnt").alias("ca"))
    b = obs.select(*group_cols, "bucket", F.col("cnt").alias("cb"))
    bc = (
        a.join(b, [*group_cols, "bucket"], "full")
        .select(*group_cols, "bucket",
                F.coalesce("ca", F.lit(0)).alias("ca"),
                F.coalesce("cb", F.lit(0)).alias("cb")))
    return _psi_from_joint(bc, group_cols)


def _psi_from_joint(bc: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared PSI fold over a joint ``(group, bucket, ca, cb)`` count
    table: add-0.5 smoothing, ≥0 terms snapped to integer micro-units,
    exact BIGINT sum, one half-up division."""
    totals = bc.groupBy(*group_cols).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"))
    j = bc.join(F.broadcast(totals), group_cols)
    p = (F.col("ca") + 0.5) / (F.col("n_a") + 0.5 * F.col("n_buckets"))
    q = (F.col("cb") + 0.5) / (F.col("n_b") + 0.5 * F.col("n_buckets"))
    term_micro = F.round((p - q) * F.log(p / q) * 1e6, 0).cast("long")
    agg = j.groupBy(*group_cols).agg(
        F.min("n_buckets").alias("n_buckets"),
        F.min("n_a").alias("n_a"), F.min("n_b").alias("n_b"),
        F.sum(term_micro).alias("__psi_micro"))
    # round(psi_micro/1e6, 4) half-up on the exact integer rational
    a = 20000 * F.col("__psi_micro") + F.lit(1_000_000)
    b = F.lit(2_000_000)
    psi = ((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000
    return agg.select(
        *group_cols, "n_buckets", "n_a", "n_b", psi.alias("psi"),
        (psi > PSI_DRIFT_THRESHOLD).alias("drifted"))


def loo_categorical_drift(
    df: DataFrame,
    item_col: str,
    *,
    source_col: str,
) -> DataFrame:
    """Leave-one-out categorical drift (SURVEY §2.3 N68): for each
    source, the PSI between ITS item distribution and the REST of the
    corpus's, over hashed item buckets — "which source's vocabulary is
    off-profile", the signal mixture tuning and crawl triage act on.
    Buckets are :func:`~.sketches.cms_bucket` row 0 (md5 mod W), so the
    histogram is literally one depth row of the N65 CMS state —
    maintaining that state keeps this audit delta-advanceable for free.

    Scale shape: ONE pass over the items builds per-(source, bucket)
    counts (map-side-combined; shuffle ≤ sources × W).  The
    leave-one-out reference needs NO second pass: per-bucket corpus
    totals come from the bounded bucket table itself, and
    ``ref(s, b) = total(b) − cnt(s, b)`` on a sources × W grid (a
    deliberate tiny cross).  PSI math, smoothing, and integer
    micro-unit determinism are shared with :func:`psi_drift` via
    :func:`_psi_from_joint`.  Output: ``(source, n_buckets, n_rest,
    n_source, psi, drifted)``.
    """
    from hbase_snapshotter_spark.operators.sketches import cms_bucket

    counts = (
        df.select(F.col(source_col).alias("source"),
                  cms_bucket(F.col(item_col), 0).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt")))
    totals = counts.groupBy("bucket").agg(F.sum("cnt").alias("tot"))
    grid = (counts.select("source").distinct()
            .crossJoin(F.broadcast(totals)))
    joint = (
        grid.join(counts, ["source", "bucket"], "left")
        .select("source", "bucket",
                (F.col("tot") - F.coalesce("cnt", F.lit(0))).alias("ca"),
                F.coalesce("cnt", F.lit(0)).alias("cb")))
    return _psi_from_joint(joint, ["source"]).select(
        F.col("source").alias(source_col), "n_buckets",
        F.col("n_a").alias("n_rest"), F.col("n_b").alias("n_source"),
        "psi", "drifted")


def _check_rows(df: DataFrame, table: str, rows: list) -> DataFrame:
    """Fold row-level checks into ONE aggregate over one scan, then
    ``inline`` the one-row result into the per-check shape."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, _, cond) in enumerate(rows):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v{i}"))
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(table).alias("table_name"),
            F.lit(ctype).alias("check_type"),
            F.lit(col).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").alias("n_violations"),
            (F.col(f"__v{i}") == 0).alias("passed"))
        for i, (ctype, col, _) in enumerate(rows)
    ]
    return one.select(F.inline(F.array(*structs)))


def constraint_audit(
    df: DataFrame,
    table: str,
    *,
    complete: list[str] = (),
    unique: list[str] = (),
    positive: list[str] = (),
    accepted: dict[str, list] | None = None,
) -> DataFrame:
    """Declarative data-quality constraint audit (SURVEY §2.3 N69) —
    the Deequ / Great Expectations CHECK step next to the N33 profiler:
    completeness (no NULLs), uniqueness, positivity, and
    accepted-value-set constraints, each reported as ``(table_name,
    check_type, col_name, n_rows, n_violations, passed)``.

    Scale shape: every row-level check is a conditional sum in ONE
    aggregate over ONE scan (map-side partials — an audit costs a
    read, not a read per check).  Uniqueness is the one exception that
    genuinely needs distincts: ``n_rows − count_distinct`` per column,
    one extra aggregate sharing the same scan via the plan's Expand
    (the documented N33 price of exactness).  Referential checks live
    in :func:`referential_orphans` (they need the other table).
    """
    rows: list = []
    for c in complete:
        rows.append(("complete", c, F.col(c).isNull()))
    for c in positive:
        rows.append(("positive", c, ~(F.col(c) > 0)))
    for c, vals in (accepted or {}).items():
        rows.append(("accepted_values", c,
                     ~F.col(c).isin(list(vals)) | F.col(c).isNull()))
    out = _check_rows(df, table, rows) if rows else None
    if unique:
        aggs = [F.count(F.lit(1)).alias("__n")]
        aggs += [F.count_distinct(F.col(c)).alias(f"__d{i}")
                 for i, c in enumerate(unique)]
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(table).alias("table_name"),
                F.lit("unique").alias("check_type"),
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__d{i}")).alias("n_violations"),
                (F.col("__n") == F.col(f"__d{i}")).alias("passed"))
            for i, c in enumerate(unique)
        ]
        uniq = one.select(F.inline(F.array(*structs)))
        out = uniq if out is None else out.unionByName(uniq)
    if out is None:
        raise ValueError("constraint_audit: no checks requested")
    return out


def referential_orphans(
    child: DataFrame,
    child_table: str,
    key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose ``key`` has no
    match in ``parent`` (NULL keys are completeness's job, not
    counted here).  ONE left join + one agg — the join carries only
    the key columns, co-partitioned hash join at scale (broadcast when
    the parent is dim-sized).  Same output shape as
    :func:`constraint_audit`."""
    p = parent.select(F.col(parent_key).alias("__pk")).distinct() \
        .withColumn("__hit", F.lit(1))
    j = child.select(F.col(key)).join(
        p, F.col(key) == F.col("__pk"), "left")
    orphan = F.col(key).isNotNull() & F.col("__hit").isNull()
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(orphan, 1).otherwise(0)).alias("n_violations"),
    ).select(
        F.lit(child_table).alias("table_name"),
        F.lit("referential").alias("check_type"),
        F.lit(key).alias("col_name"),
        "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("passed"))


def classifier_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC of a scalar score against a boolean label
    (SURVEY §2.3 N125) — the eval metric every model-based quality
    filter (N26 margin, N49 LM fluency) needs BEFORE its cutoff is
    trusted: AUC = P(score⁺ > score⁻) + ½·P(tie), the Mann-Whitney
    rank form, computed EXACTLY as the rational
    ``auc_num_x2 / (2 · n_pos · n_neg)`` so both engines agree to the
    last bit (a float rank-sum diverges by summation order; ties are
    handled by the +½ midrank term, not average-rank floats).

    Scale shape: scores collapse to per-(group, score) ``(n_pos,
    n_neg)`` counts first (one map-side-combined agg — the only
    data-sized pass), then the pair counting is a running prefix over
    the DISTINCT-SCORE table ordered by score.  That window partitions
    by group over score-table rows — bounded by the score's value
    quantization (4-dp margins here, the DDSketch-bucket posture), not
    by the corpus.  Output per group: ``(n_pos, n_neg, auc_num_x2,
    auc_den, auc)`` with ``auc`` the correctly-rounded 6-dp double."""
    from pyspark.sql import Window

    gc = group_cols or []
    per_score = df.groupBy(*gc, F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__p"),
        F.sum((~F.col(label_col)).cast("long")).alias("__n"))
    w = (Window.partitionBy(*[F.col(c) for c in gc]).orderBy("__s")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_score.withColumn(
        "__neg_below", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    out = ranked.groupBy(*gc).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(F.col("__p") * (2 * F.col("__neg_below") + F.col("__n")))
        .cast("long").alias("auc_num_x2"))
    den = (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
    return out.select(
        *gc, "n_pos", "n_neg", "auc_num_x2", den.alias("auc_den"),
        F.when(den > 0,
               F.round(F.col("auc_num_x2") / den, 6)).alias("auc"))
