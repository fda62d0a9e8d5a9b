"""Every registered query vs its DuckDB oracle at sf0.001 — the same
comparison the round driver runs at sf0.01 (row count + column names +
order-insensitive value fingerprint)."""

import duckdb
import pytest

from hbase_snapshotter_spark.queries.registry import ORACLES, QUERIES
from hbase_snapshotter_spark.testing import compare, register_duckdb_views


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    register_duckdb_views(c, sf_dir)
    return c


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert srows is not None  # rows-only check for non-SQL-expressible ops
        return
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    ok, msg = compare(sdf.columns, srows, ocols, res.fetchall())
    assert ok, f"{name}: {msg}"
