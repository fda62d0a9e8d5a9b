"""Unit tests for bloom-pruned novelty (N34) — exactness against the
plain anti-join, the no-false-negative guarantee, pruning rate, and
NULL-key semantics."""

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.bloom import (
    BLOOM_NUM_HASHES,
    bloom_bits_for,
    build_bloom,
    might_contain,
    novel_keys,
)


def _slices(spark, n_prior=400, n_new=200, n_dup=37):
    prior = spark.range(n_prior).select(
        F.md5(F.concat(F.lit("p"), F.col("id").cast("string")))
        .alias("key"))
    # n_dup of the new keys are copies of prior keys, rest are fresh
    new = spark.range(n_new).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_dup,
               F.md5(F.concat(F.lit("p"), F.col("id").cast("string"))))
        .otherwise(
            F.md5(F.concat(F.lit("n"), F.col("id").cast("string"))))
        .alias("key"))
    return prior, new


def test_novelty_exact_vs_plain_anti_join(spark):
    prior, new = _slices(spark)
    got = novel_keys(new, prior, "key")
    expect_novel = {
        r["doc_id"]
        for r in new.join(prior, "key", "left_anti").collect()}
    rows = got.collect()
    assert len(rows) == 200  # all new rows preserved
    assert {r["doc_id"] for r in rows if r["novel"]} == expect_novel
    assert {r["doc_id"] for r in rows if not r["novel"]} \
        == set(range(37)) == set(range(200)) - expect_novel


def test_bloom_has_no_false_negatives_and_prunes(spark):
    prior, new = _slices(spark)
    n_prior = prior.count()
    bm = build_bloom(prior, "key", n_prior)
    probed = new.withColumn("hit", might_contain(bm, "key")).collect()
    # every true duplicate MUST probe true (soundness of the skip path)
    assert all(r["hit"] for r in probed if r["doc_id"] < 37)
    # and the filter actually prunes: at 10 bits/key the fp rate is
    # ~1%, so nearly all of the 163 fresh keys skip the verify join
    fresh_hits = sum(1 for r in probed if r["doc_id"] >= 37 and r["hit"])
    assert fresh_hits <= 8  # ≥95% of the anti-join's left side pruned


def test_null_keys_probe_false_and_stay_novel(spark):
    prior = spark.createDataFrame([("a",), (None,)], "key string")
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], "doc_id long, key string")
    bm = build_bloom(prior, "key", 2)
    assert not new.filter(F.col("key").isNull()) \
        .withColumn("h", might_contain(bm, "key")).first()["h"]
    out = {r["doc_id"]: r["novel"] for r in
           novel_keys(new, prior, "key").collect()}
    # NULL never equals NULL: the NULL-key row is novel, like the
    # oracle's LEFT JOIN ... IS NULL replay
    assert out == {1: False, 2: True, 3: True}


def test_bitmap_sizing_power_of_two_floor():
    assert bloom_bits_for(0) == 1024
    assert bloom_bits_for(1000) == 16384  # 10k bits → next pow2
    assert bloom_bits_for(1000) % 64 == 0
    assert BLOOM_NUM_HASHES <= 14  # two md5 digests of 4-byte slices
