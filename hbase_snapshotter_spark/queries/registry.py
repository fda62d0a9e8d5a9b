"""Query registry — the single source for ``__spark_entry__.py``.

Every implemented operator from ``SURVEY.md`` §2 appears here as a
``(name, spark_fn, oracle_sql)`` triple; ``oracle_sql`` is ``None`` only
for genuinely non-SQL-expressible ops (the driver then records a weaker
rows-only check).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hbase_snapshotter_spark.cache import cache_scope
from hbase_snapshotter_spark.queries import llm, relational, snapshot_q, streaming_q

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Session confs every query consumer needs, applied by the registry
#: wrapper (harness-level session prep — query fns themselves never
#: mutate session state).  Arrow UDTF execution is opt-in in Spark 4;
#: without it a lateral UDTF join runs row-at-a-time BatchEvalPython,
#: the one Python execution mode this repo bans from data paths.
#: Direct callers of the unwrapped fns (bench.py, conftest) set the
#: same confs in their session builders.
SESSION_DEFAULTS = {
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    # Every build runs inside a per-query cache scope (operators persist
    # multi-consumer intermediates — see cache.py): rebuilding a query
    # releases only ITS stale handles, and the registry keeps at most
    # cache.MAX_LIVE_SCOPES query scopes cached (least-recently-built
    # evicted), so a sequential build→run driver loop holds a bounded
    # working set while the common interleave (build A, build B, act on
    # A) keeps A's caches warm — pinned by
    # test_cache_scope_interleaved_builds_no_recompute.  Releasing is
    # always safe: at worst a still-pending plan recomputes its lineage.
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        for key, value in SESSION_DEFAULTS.items():
            spark.conf.set(key, value)
        with cache_scope(name):
            return fn(spark, sf_dir)

    QUERIES[name] = wrapped
    if oracle is not None:
        ORACLES[name] = oracle


register("snapshot_events_wide", snapshot_q.q_snapshot_events_wide,
         snapshot_q.oracle_snapshot_events_wide())
register("snapshot_latest_cells", snapshot_q.q_latest_cells,
         snapshot_q.oracle_latest_cells())
register("snapshot_diff", snapshot_q.q_snapshot_diff,
         snapshot_q.oracle_snapshot_diff())
register("snapshot_multi_ts", snapshot_q.q_snapshot_multi_ts,
         snapshot_q.oracle_snapshot_multi_ts())
register("schema_history_snapshot", snapshot_q.q_schema_history_snapshot,
         snapshot_q.oracle_schema_history_snapshot())

_ALL_PAIRS: dict[str, tuple] = {}
for _module in (relational, llm, streaming_q):
    _ALL_PAIRS.update(_module.PAIRS)
_ALL_PAIRS.update({
    "snapshot_compaction": (snapshot_q.q_snapshot_compaction,
                            snapshot_q.oracle_snapshot_compaction()),
    "schema_evolution_diff": (snapshot_q.q_schema_evolution_diff,
                              snapshot_q.oracle_schema_evolution_diff()),
    "sketch_distinct_maintenance": (snapshot_q.q_sketch_distinct_maintenance,
                                    snapshot_q.oracle_sketch_distinct_maintenance()),
    "scd2_event_history": (snapshot_q.q_scd2_event_history,
                           snapshot_q.oracle_scd2_event_history()),
    "state_changefeed": (snapshot_q.q_state_changefeed,
                         snapshot_q.oracle_state_changefeed()),
    "agg_view_advance": (snapshot_q.q_agg_view_advance,
                         snapshot_q.oracle_agg_view_advance()),
    "sketch_set_cardinalities": (snapshot_q.q_sketch_set_cardinalities,
                                 snapshot_q.oracle_sketch_set_cardinalities()),
})

#: The correctness harness records at most 50 query rows (observed in
#: round 2 — `COVERAGE.md`), and it preserves registration order; the
#: five snapshot queries above occupy slots 1-5.  Round 8 (per
#: VERDICT r7 task 1) made the recorded window structural again:
#: eleven thin recorded slots were merged into six lane-union suites
#: whose single plans carry every absorbed operator chain
#: (join_semi_anti + join_outer_order_counts →
#: join_customer_orders_suite; pivot_segment_priority →
#: agg_rollup_cube; dedup_jaccard_pairs + dedup_minhash_lsh +
#: dedup_simhash → dedup_pairs_suite; similarity_topk_brute +
#: similarity_topk_ann → similarity_topk_suite; similarity_topk_ivf +
#: similarity_topk_ivfpq → similarity_topk_ivf_suite;
#: embedding_near_dup_pairs + embedding_near_dup_lsh →
#: embedding_near_dup_suite; udf_zscore_trimmed + udtf_explode_tokens
#: → udf_udtf_suite; stream_session_windows → stream_window_suite),
#: four unrecorded lanes folded into recorded hosts as columns
#: (char_entropy_docs → text_analysis; weighted_sample_docs +
#: stratified_sample_docs + epoch_replicated_mix →
#: sample_split_assignments), and the NINE freed slots promoted the
#: previously-unrecorded r7 flagships: the two events suites
#: (N59+N60+N72; N74+N75), sketch_maintenance_suite (N58+N65),
#: neardup_novelty_delta (N57), dedup_clusters_delta (N62),
#: events_drift_psi (N66), retrieval_eval_metrics (N67),
#: hybrid_rrf_topk (N55), repetition_signals_docs (N63).
_R8_ORDER = [
    # 36 survivors, r7 relative order (slots 6-41)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "join_customer_orders_suite",
    "agg_rollup_cube",
    "scalar_suite", "asof_latest_order",
    "range_join_price_band", "skew_salted_agg", "join_full_outer_eras",
    "scalar_array_suite",
    "agg_approx_distinct", "window_rank_suite",
    "scalar_string_suite", "scalar_map_suite",
    "dedup_exact_documents", "dedup_pairs_suite",
    "text_analysis", "similarity_topk_suite",
    "embedding_near_dup_suite",
    "multimodal_payload_stats", "udf_udtf_suite",
    "similarity_topk_ivf_suite", "dedup_clusters",
    "pipeline_quality_filter", "sample_split_assignments", "text_scrub",
    "stream_window_suite", "funnel_cohort_retention",
    "scd2_event_history", "state_changefeed",
    "cross_snapshot_novelty", "exact_substring_spans", "profile_lineitem",
    "bpe_encode_stats", "token_heavy_hitters",
    # 9 promoted round-7 capabilities (slots 42-50)
    "events_timeseries_suite", "events_sketch_norm_suite",
    "sketch_maintenance_suite", "neardup_novelty_delta",
    "dedup_clusters_delta", "events_drift_psi", "retrieval_eval_metrics",
    "hybrid_rrf_topk", "repetition_signals_docs",
]

for _name in _R8_ORDER:
    _fn, _oracle = _ALL_PAIRS.pop(_name)
    register(_name, _fn, _oracle)

# Slots 51+: standalone rows beyond the driver's recorded window — each
# capability here is ALSO folded as columns into a recorded key (see
# COVERAGE.md) or pytest-pinned, so a 50-row truncation still checks it.
for _name, (_fn, _oracle) in _ALL_PAIRS.items():
    register(_name, _fn, _oracle)
