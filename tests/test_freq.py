"""Misra-Gries heavy hitters (N41): the no-false-negative guarantee,
real candidate pruning (k << distinct), exactness of the verified
output, and partition-order independence."""

import pytest

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.freq import heavy_hitters, mg_candidates


@pytest.fixture(scope="module")
def skewed(spark):
    """10_000 instances: one hot item at 15% ('hot', 1500), one at
    exactly the 5% threshold ('warm', 500), one just under ('cool',
    499), the rest a 7_501-instance long tail of ~3_800 distinct
    items — distinct count far above any reasonable k."""
    rows = (["hot"] * 1500 + ["warm"] * 500 + ["cool"] * 499
            + [f"tail{i % 3800}" for i in range(7501)])
    return spark.createDataFrame([(v,) for v in rows], "item string")


def test_heavy_hitters_exact_and_boundary(skewed):
    out = {r.item: (r.n_occurrences, r.share)
           for r in heavy_hitters(skewed, "item", support_permille=50).collect()}
    assert out["hot"] == (1500, 0.15)
    assert out["warm"] == (500, 0.05)   # count*1000 == permille*total passes
    assert "cool" not in out            # one below the threshold
    assert all(not i.startswith("tail") for i in out)


def test_mg_candidates_prune_and_never_lose_heavy(skewed):
    """With k=20 counters against ~3_800 distinct items the summaries
    genuinely prune (candidates << distinct), and across adversarial
    partitionings the 15% item always survives — the MG guarantee
    (freq > n/(k+1) = 476) — so the verified output never changes."""
    n_distinct = skewed.select("item").distinct().count()
    expected = {r.item for r in
                heavy_hitters(skewed, "item", support_permille=100).collect()}
    assert expected == {"hot"}
    for arranged in (skewed, skewed.repartition(13), skewed.orderBy("item"),
                     skewed.orderBy(F.desc("item")), skewed.coalesce(1)):
        cand = mg_candidates(arranged.select("item"), "item", 20)
        n_parts = arranged.rdd.getNumPartitions()
        n_cand = cand.count()
        assert n_cand <= 20 * n_parts < n_distinct
        got = {r.item for r in
               heavy_hitters(arranged, "item", support_permille=100,
                             k=20).collect()}
        assert got == expected


def test_heavy_hitters_ignores_nulls_and_validates(spark, skewed):
    with_null = skewed.unionByName(
        spark.createDataFrame([(None,)], "item string"))
    out = heavy_hitters(with_null, "item", support_permille=50).collect()
    assert all(r.item is not None for r in out)
    with pytest.raises(ValueError):
        heavy_hitters(skewed, "item", support_permille=0)
    with pytest.raises(ValueError):
        mg_candidates(skewed, "item", 0)
