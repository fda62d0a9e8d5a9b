"""Unit tests for the one-scan column profiler (N33) — NULL
accounting, the exact-vs-HLL flag, and the 100 TB (sketch-only) mode
the registered oracle query can't exercise."""

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.profile import profile_columns


def _fixture(spark):
    rows = [
        (1, 10.0, "a"),
        (2, None, "b"),
        (3, 30.0, None),
        (4, 30.0, "b"),
        (5, None, None),
    ]
    return spark.createDataFrame(rows, "id long, x double, s string")


def test_profile_null_accounting_and_stats(spark):
    out = {r["col_name"]: r for r in profile_columns(
        _fixture(spark), ["x"], ["s"]).collect()}
    x, s = out["x"], out["s"]
    assert x["n_rows"] == 5 and x["n_nulls"] == 2
    assert x["n_distinct"] == 2  # NULLs excluded, 30.0 counted once
    assert (x["min_num"], x["max_num"]) == (10.0, 30.0)
    assert abs(x["mean_num"] - (70.0 / 3)) < 1e-3
    assert x["min_str"] is None and x["avg_len"] is None
    assert s["n_nulls"] == 2 and s["n_distinct"] == 2
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["avg_len"] == 1.0
    assert s["min_num"] is None and s["mean_num"] is None
    assert x["approx_distinct_ok"] and s["approx_distinct_ok"]


def test_profile_sketch_only_mode_drops_expand(spark):
    """exact_distinct=False: n_distinct becomes the HLL estimate and
    the plan loses the Expand node multiple exact distincts force."""
    df = _fixture(spark)
    exact_plan = profile_columns(df, ["x"], ["s"])._jdf \
        .queryExecution().executedPlan().toString()
    sketch = profile_columns(df, ["x"], ["s"], exact_distinct=False)
    sketch_plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in sketch_plan
    out = {r["col_name"]: r for r in sketch.collect()}
    # at 5 rows the HLL estimate is exact
    assert out["x"]["n_distinct"] == 2
    assert out["x"]["approx_distinct_ok"] and out["s"]["approx_distinct_ok"]
