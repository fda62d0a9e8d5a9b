"""Unit tests for curriculum range-bucketing (N36) — boundary-tie
semantics, monotonicity, and the partitionBy writer producing globally
range-ordered (non-overlapping) shards without repartitionByRange."""

import glob

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.sampling import range_bucket


def _bucketed(spark, scores, boundaries):
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)],
        "id long, score double")
    b = F.array(*[F.lit(float(x)) for x in boundaries])
    return df.select(
        "id", "score", range_bucket("score", b).alias("bucket"))


def test_boundary_ties_go_up_and_assignment_is_monotone(spark):
    # score == boundary lands in the upper bucket (>= semantics, the
    # same the oracle replays with `n_chars >= x`)
    rows = {r["score"]: r["bucket"] for r in _bucketed(
        spark, [5, 10, 10.5, 20, 25], [10.0, 20.0]).collect()}
    assert rows == {5.0: 0, 10.0: 1, 10.5: 1, 20.0: 2, 25.0: 2}


def test_partition_by_bucket_gives_nonoverlapping_shards(spark, tmp_path):
    import random
    rng = random.Random(7)
    scores = [rng.uniform(0, 100) for _ in range(500)]
    bdf = _bucketed(spark, scores, [25.0, 50.0, 75.0])
    out = str(tmp_path / "curriculum")
    bdf.write.mode("overwrite").partitionBy("bucket").parquet(out)
    # hive layout: one directory per bucket
    assert len(glob.glob(f"{out}/bucket=*")) == 4
    back = spark.read.parquet(out)
    ranges = {
        r["bucket"]: (r["lo"], r["hi"])
        for r in back.groupBy("bucket")
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .collect()}
    for k in range(3):
        assert ranges[k][1] <= ranges[k + 1][0]  # global range order
    assert back.count() == 500  # conservation


def test_exact_and_sketch_boundary_disagreement_bounded(spark):
    def mk():
        return spark.range(1000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n"))
    qs = F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75)])
    b = mk().agg(
        F.percentile("n", qs).alias("bx"),
        F.percentile_approx("n", qs, F.lit(10000)).alias("ba"))
    # fresh lineage for the probe side: a HOF lambda capturing an outer
    # column trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when both cross-
    # join sides share one plan subtree (parquet reads, as in the
    # registered query, are unaffected)
    d2 = mk().crossJoin(F.broadcast(b)).select(
        range_bucket("n", "bx").alias("x"),
        range_bucket("n", F.col("ba").cast("array<double>")).alias("a"))
    # even at accuracy > n the two boundary sets differ by
    # DISCRETIZATION, not sketch error: percentile interpolates between
    # elements, percentile_approx returns an actual element — docs
    # falling between the two values flip buckets.  The registered
    # query's approx_assign_ok contract is that this stays ≤ 2%.
    assert d2.filter(F.col("x") != F.col("a")).count() <= 0.02 * 1000
