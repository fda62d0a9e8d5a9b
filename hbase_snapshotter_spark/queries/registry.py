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

for _name, (_fn, _oracle) in relational.PAIRS.items():
    register(_name, _fn, _oracle)

for _name, (_fn, _oracle) in llm.PAIRS.items():
    register(_name, _fn, _oracle)

for _name, (_fn, _oracle) in streaming_q.PAIRS.items():
    register(_name, _fn, _oracle)
