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


def test_cache_scope_interleaved_builds_recompute_correctly(spark, sf_dir):
    """The documented build-then-act contract (cache.py): building a
    second registered query releases the first query's scoped caches —
    the first query's later action must still be CORRECT (it recomputes
    the released lineage), and the release must actually have happened
    (the recompute cost is the documented trade-off, not a leak)."""
    from hbase_snapshotter_spark import cache

    a = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    handles = list(cache._ACTIVE)
    assert handles, "expected dedup_minhash_lsh to register scoped persists"

    b = QUERIES["similarity_topk_ivf"](spark, sf_dir)
    # building B released A's scoped caches (global-scope contract)
    assert all(not h.storageLevel.useMemory for h in handles)

    got = sorted(tuple(r) for r in a.collect())       # A acts post-release
    b.write.format("noop").mode("overwrite").save()   # B acts normally
    release_caches()

    fresh = sorted(tuple(r) for r in
                   QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect())
    release_caches()
    assert got == fresh and len(got) > 0
    assert _leftover_persists(spark) == []
