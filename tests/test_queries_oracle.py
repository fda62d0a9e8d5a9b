"""Every registered query vs its DuckDB oracle at sf0.001 — the same
comparison the round driver runs at sf0.01 (row count + column names +
order-insensitive value fingerprint)."""

import duckdb
import pytest

from hbase_snapshotter_spark.cache import release_caches
from hbase_snapshotter_spark.queries.registry import ORACLES, QUERIES
from hbase_snapshotter_spark.testing import compare, register_duckdb_views


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    register_duckdb_views(c, sf_dir)
    return c


def _leftover_persists(spark):
    """Persistent RDDs that are NOT localCheckpoint blocks (those are
    ContextCleaner-managed by design — see connected_components)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    names = [str(jmap[k].toString()) for k in jmap.keySet().toArray()]
    return [s for s in names if "localCheckpoint" not in s]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    # cache hygiene: every operator persist is scoped — after the action
    # + release, no cache blocks may outlive the query
    release_caches()
    assert _leftover_persists(spark) == [], f"{name} leaked cache entries"
    if name not in ORACLES:
        assert srows is not None  # rows-only check for non-SQL-expressible ops
        return
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    ok, msg = compare(sdf.columns, srows, ocols, res.fetchall())
    assert ok, f"{name}: {msg}"


def test_cache_scope_interleaved_builds_no_recompute(spark, sf_dir):
    """The per-query cache-scope contract (cache.py): each registered
    build's persists are keyed by query name and the registry keeps the
    MAX_LIVE_SCOPES (2) most recently built scopes cached — so the
    common interleave (build A, build B, act on A) keeps A's caches
    WARM, while building a third query evicts the least-recently-built
    scope (bounded working set, recompute-correct beyond the bound)."""
    from hbase_snapshotter_spark import cache

    a = QUERIES["dedup_pairs_suite"](spark, sf_dir)
    handles = list(cache._SCOPES["dedup_pairs_suite"])
    assert handles, "expected dedup_pairs_suite to register scoped persists"

    b = QUERIES["similarity_topk_ivf_suite"](spark, sf_dir)
    # building B keeps A's scoped caches (per-query scopes, live bound 2)
    assert all(h.storageLevel.useMemory for h in handles)

    got = sorted(tuple(r) for r in a.collect())       # A acts cache-warm
    b.write.format("noop").mode("overwrite").save()   # B acts normally

    # depth-3 interleave: building C evicts A (least recently built),
    # keeps B — the bounded-working-set half of the contract
    b_handles = list(cache._SCOPES["similarity_topk_ivf_suite"])
    c = QUERIES["embedding_near_dup_suite"](spark, sf_dir)
    assert "dedup_pairs_suite" not in cache._SCOPES
    assert all(not h.storageLevel.useMemory for h in handles)
    assert all(h.storageLevel.useMemory for h in b_handles)
    c.write.format("noop").mode("overwrite").save()
    release_caches()

    # A's action after eviction recomputes the released lineage correctly
    fresh = sorted(tuple(r) for r in a.collect())
    release_caches()
    assert got == fresh and len(got) > 0
    assert _leftover_persists(spark) == []


def test_cache_global_scope_swept_and_excluded_from_bound(spark, sf_dir):
    """Handles persisted OUTSIDE any query scope (direct operator use)
    are swept when a registered query is built — the pre-scope hygiene —
    and never count toward the MAX_LIVE_SCOPES warm-set bound, so stray
    global handles can't silently evict a query scope."""
    from hbase_snapshotter_spark import cache

    g = cache.scoped_persist(spark.range(10))
    g.count()
    assert cache._SCOPES.get("__global__")

    a = QUERIES["dedup_pairs_suite"](spark, sf_dir)
    assert not g.storageLevel.useMemory        # stray handle swept
    assert "__global__" not in cache._SCOPES
    a_handles = list(cache._SCOPES["dedup_pairs_suite"])

    QUERIES["similarity_topk_ivf_suite"](spark, sf_dir)
    # with the global scope excluded from the bound, A stays warm
    assert all(h.storageLevel.useMemory for h in a_handles)
    assert sorted(tuple(r) for r in a.collect())
    release_caches()
    assert _leftover_persists(spark) == []


def test_shared_stage_truncates_plan_and_shares_handle(spark):
    """The r13 shared_stage contract (cache.py): the builder runs ONCE
    per key, every caller gets the SAME handle, the handle's logical
    plan is a materialized leaf (eager localCheckpoint — consumers'
    Catalyst analysis no longer walks the producing DAG), rows equal
    the builder's, and release drops the entry so the next call
    rebuilds."""
    from hbase_snapshotter_spark import cache

    calls = []

    def build():
        calls.append(1)
        return (spark.range(100)
                .selectExpr("id", "id % 7 AS k")
                .groupBy("k").count())

    a = cache.shared_stage("test_trunc|x", build)
    b = cache.shared_stage("test_trunc|x", build)
    assert a is b and calls == [1]
    # plan truncated: a leaf scan of checkpointed partitions, no
    # aggregate left in the consumer-visible optimized plan
    optimized = a._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in optimized and "Range" not in optimized
    assert a.storageLevel.useMemory  # persist-on-top for multi-scan reads
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        (k, (100 + 6 - k) // 7) for k in range(7))
    release_caches()
    assert _leftover_persists(spark) == []
    cache.shared_stage("test_trunc|x", build)
    assert calls == [1, 1]
    release_caches()
