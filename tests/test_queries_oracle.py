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
