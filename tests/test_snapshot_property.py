"""Property-based snapshot semantics: hypothesis-generated change logs
checked against an independent pure-Python model of the reference's
per-cell as-of semantics (latest version ≤ ts per (row_key, qualifier),
NULL sentinel, typed decode).  Catches tie-break and boundary bugs the
hand-written goldens can't enumerate."""

from hypothesis import given, settings, strategies as st

from hbase_snapshotter_spark.operators.snapshot import snapshot_as_of
from hbase_snapshotter_spark.plans.schema import KEY_COLUMN, explicit_schema

KEYS = ["r1", "r2", "r3"]
QUALS = ["a", "b"]

cells = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(QUALS),
        st.one_of(st.integers(-1000, 1000).map(str), st.just("NULL"), st.just("null")),
        st.integers(0, 50),          # cell_ts
    ),
    min_size=1, max_size=25,
)


def python_model(rows, ts):
    """Independent snapshot model: max (cell_ts, value) per cell ≤ ts."""
    best = {}
    for key, qual, value, cell_ts in rows:
        if ts is not None and cell_ts > ts:
            continue
        cur = best.get((key, qual))
        if cur is None or (cell_ts, value) > cur:
            best[(key, qual)] = (cell_ts, value)
    out = {}
    for (key, qual), (_, value) in best.items():
        decoded = None if value.upper() == "NULL" else int(value)
        out.setdefault(key, {})[qual] = decoded
    return {
        k: tuple(v.get(q) for q in QUALS) for k, v in out.items()
    }


SCHEMA = explicit_schema([f"d:{q}:integer" for q in QUALS])


@given(cells, st.one_of(st.none(), st.integers(0, 50)))
@settings(max_examples=25, deadline=None)
def test_snapshot_matches_python_model(spark, rows, ts):
    df = spark.createDataFrame(
        [(k, "d", q, v, t) for (k, q, v, t) in rows],
        "row_key string, family string, qualifier string, value string, cell_ts long",
    )
    got = {
        r[KEY_COLUMN]: tuple(r[q] for q in QUALS)
        for r in snapshot_as_of(df, SCHEMA, ts).collect()
    }
    assert got == python_model(rows, ts)
