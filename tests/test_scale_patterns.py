"""Scale-pattern pins: salted agg/join equivalence + determinism,
bucketed warehouse co-located joins, binned range joins vs the
nested-loop cliff, runtime Bloom-filter join pruning, and continuous
snapshot maintenance."""

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.skew import salted_agg
from hbase_snapshotter_spark.operators.snapshot import snapshot_as_of
from hbase_snapshotter_spark.queries.snapshot_q import events_snapshot_schema
from hbase_snapshotter_spark.sources.changelog import events_as_changelog, read_table
from hbase_snapshotter_spark.sources.warehouse import write_snapshot
from hbase_snapshotter_spark.streaming.snapshot_stream import maintain_snapshot
from hbase_snapshotter_spark.streaming.windows import replay_stream


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    plain = {
        tuple(r)
        for r in li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sq"),
            F.min("l_extendedprice").alias("mn"),
            F.round(F.avg("l_discount"), 6).alias("av"),
        ).collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            li, ["l_returnflag"],
            [(None, "count", "n"), ("l_quantity", "sum", "sq0"),
             ("l_extendedprice", "min", "mn"), ("l_discount", "avg", "av0")],
            salt_buckets=8,
        ).select(
            "l_returnflag", "n", F.round("sq0", 2).alias("sq"), "mn",
            F.round("av0", 6).alias("av"),
        ).collect()
    }
    assert salted == plain


def test_salted_agg_two_shuffles(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    out = salted_agg(li, ["l_returnflag"], [(None, "count", "n")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2      # salt stage + combine stage


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-locates repeated snapshot⋈snapshot joins: the join
    reads both sides pre-partitioned and plans no Exchange."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    write_snapshot(orders, "b_orders", bucket_by=(8, ["o_custkey"]))
    write_snapshot(cust.withColumnRenamed("c_custkey", "o_custkey"),
                   "b_cust", bucket_by=(8, ["o_custkey"]))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_cust")


def test_streaming_snapshot_maintenance(spark, sf_dir, tmp_path):
    """Replay the change log as a stream, maintain latest-cell state via
    foreachBatch, and check the materialized snapshot equals the batch
    snapshot of the full log — continuous snapshotting, same operator."""
    log_dir = str(tmp_path / "log")
    events_as_changelog(read_table(spark, sf_dir, "events")) \
        .repartition(4).write.parquet(log_dir)
    batch_log = spark.read.parquet(log_dir)

    stream = replay_stream(spark, log_dir, batch_log.schema, max_files_per_trigger=1)
    q, maintainer = maintain_snapshot(
        stream, str(tmp_path / "state"),
        checkpointLocation=str(tmp_path / "ckpt"), availableNow=True,
    )
    q.awaitTermination(120)

    schema = events_snapshot_schema()
    got = {tuple(r) for r in
           snapshot_as_of(maintainer.current_cells(spark), schema, None).collect()}
    want = {tuple(r) for r in snapshot_as_of(batch_log, schema, None).collect()}
    assert got == want and len(got) > 0


def test_range_bin_join_equals_nested_loop_and_avoids_it(spark, sf_dir):
    """Pure interval join (no equi key): the binned form must produce
    exactly the nested-loop result while planning as a hash join — the
    naive form is BroadcastNestedLoopJoin, the 100 TB cliff."""
    from hbase_snapshotter_spark.operators.rangejoin import range_bin_join

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .select("s_suppkey", "s_acctbal")
    bands = spark.createDataFrame(
        [(i, -1000.0 + 2000.0 * i, -1000.0 + 2000.0 * (i + 1)) for i in range(6)],
        "band_id int, lo double, hi double")

    naive = sup.join(
        bands, (sup.s_acctbal >= bands.lo) & (sup.s_acctbal < bands.hi))
    binned = range_bin_join(sup, bands, "s_acctbal", bin_width=500.0)

    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    binned_plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive_plan            # what we're avoiding
    assert "NestedLoop" not in binned_plan       # equi join after binning

    key = lambda r: (r.s_suppkey, r.band_id)
    assert sorted(map(key, binned.collect())) == sorted(map(key, naive.collect()))
    # totality: every supplier lands in exactly one band
    assert binned.count() == sup.count()


def test_range_bin_join_property(spark):
    """Property: for random bands and values, the binned join equals a
    pure-Python interval model at several bin widths (boundary values,
    overlapping bands, negative domains)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hbase_snapshotter_spark.operators.rangejoin import range_bin_join

    bands_st = st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 40)),
        min_size=1, max_size=6,
    )
    vals_st = st.lists(st.integers(-60, 60), min_size=1, max_size=20)

    @given(bands_st, vals_st, st.sampled_from([1.0, 3.0, 7.5, 100.0]))
    @settings(max_examples=15, deadline=None)
    def check(raw_bands, vals, width):
        bands = [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(raw_bands)]
        fact = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "fid int, v double")
        bdf = spark.createDataFrame(bands, "band_id int, lo double, hi double")
        got = sorted((r.fid, r.band_id) for r in
                     range_bin_join(fact, bdf, "v", bin_width=width).collect())
        want = sorted((fi, bi) for fi, v in enumerate(vals)
                      for bi, lo, hi in bands if lo <= v < hi)
        assert got == want

    check()


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salted join == plain join row-for-row (inner and left, incl.
    unmatched left rows), with the small side replicated per salt."""
    from hbase_snapshotter_spark.operators.skew import salted_join

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment").withColumnRenamed("c_custkey", "o_custkey")

    for how in ("inner", "left"):
        plain = sorted(tuple(r) for r in orders.join(cust, ["o_custkey"], how).collect())
        salted = sorted(tuple(r) for r in
                        salted_join(orders, cust, ["o_custkey"], how=how,
                                    salt_buckets=8).collect())
        assert salted == plain


def test_salted_ops_spread_fully_duplicate_rows(spark):
    """The default salt is content-independent (round-robin on the
    per-row id): byte-identical hot rows — a common real skew shape that
    a hash-of-columns salt sends to ONE bucket — must still spread, and
    unhashable column types (MapType) must not error."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.skew import (
        _salt_expr,
        salted_agg,
        salted_join,
    )

    # fixed partition count: each partition holds 200 rows >> 8 salts,
    # so every residue appears regardless of the host's default
    # parallelism (monotonically_increasing_id restarts per partition)
    hot = spark.range(400).repartition(2).select(
        F.lit("k").alias("k"), F.lit(1).alias("v"),
        F.create_map(F.lit("a"), F.lit(1)).alias("m"))  # F.hash would reject m
    # correctness: identical to the plain agg/join
    out = salted_agg(hot, ["k"], [("v", "sum", "s")], salt_buckets=8).collect()
    assert [(r.k, r.s) for r in out] == [("k", 400)]
    small = spark.createDataFrame([("k", "x")], "k string, label string")
    joined = salted_join(hot.drop("m"), small, ["k"], salt_buckets=8)
    assert joined.count() == 400
    # spread: the 400 duplicate rows land in every salt bucket, so the
    # stage-1 partial aggregation has ~8 groups for the one hot key
    n_buckets = hot.withColumn("__salt", _salt_expr(None, 8)) \
        .select("__salt").distinct().count()
    assert n_buckets == 8


def test_content_salt_deterministic_across_runs(spark, sf_dir):
    """salt_cols (content-hash) salting: the salt assignment — not just
    the combined totals — is identical across two executions of the same
    plan, the property that makes it shuffle-retry-safe; and the salted
    agg/join results equal the plain forms."""
    from hbase_snapshotter_spark.operators.skew import (
        _salt_expr,
        salted_agg,
        salted_join,
    )

    li = read_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    salted = li.select(*key, _salt_expr(key, 16).alias("s"))
    run1 = {(r.l_orderkey, r.l_linenumber): r.s for r in salted.collect()}
    run2 = {(r.l_orderkey, r.l_linenumber): r.s for r in salted.collect()}
    assert run1 == run2
    assert len(set(run1.values())) == 16  # and it actually spreads

    plain = sorted(
        tuple(r) for r in li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n")).collect())
    got = sorted(
        tuple(r) for r in salted_agg(
            li, ["l_returnflag"], [(None, "count", "n")],
            salt_buckets=8, salt_cols=key).collect())
    assert got == plain

    small = spark.createDataFrame(
        [("A", 1), ("N", 2), ("R", 3)], "l_returnflag string, fid int")
    pj = sorted((r.l_orderkey, r.l_linenumber, r.fid) for r in
                li.join(small, ["l_returnflag"]).collect())
    sj = sorted((r.l_orderkey, r.l_linenumber, r.fid) for r in
                salted_join(li, small, ["l_returnflag"],
                            salt_buckets=8, salt_cols=key).collect())
    assert sj == pj


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Runtime Bloom-filter join pruning — the 100 TB lever for a
    selective-dimension shuffle join: Catalyst builds a Bloom filter on
    the filtered (small) side and injects `might_contain` on the big
    side's join key, so most big-side rows drop BEFORE the shuffle.
    Declarative plans get this for free once enabled; pin that the
    injection actually fires on our fixtures and changes no results."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        # fixture scans are KBs-MBs, not the 10GB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
        # toggled mid-test; saved with the rest so the prior state (not
        # an assumed literal) is restored
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, sf_dir, "lineitem") \
            .select("l_orderkey", "l_quantity")
        orders = read_table(spark, sf_dir, "orders") \
            .filter(F.col("o_orderpriority") == "1-URGENT") \
            .select("o_orderkey")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()  # bloom filter injected
        n_bloom = joined.count()

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n_bloom == n_plain > 0  # pruning is performance-only
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_measured_salt_buckets_skewed_vs_balanced(spark):
    """N82 (the N80 measure-then-tune posture on the skew knob): a
    clearly-skewed key column auto-selects a multi-bucket salt scaled
    to the hottest share x parallelism, a clearly-balanced one selects
    1 (no pointless two-stage pass), the count caps at max_buckets,
    the decision survives repartitioning, and salting at the measured
    count leaves the aggregate row-identical."""
    from hbase_snapshotter_spark.operators.skew import (
        measured_salt_buckets,
        salted_agg,
    )

    # 80% of rows on one key, the rest spread over 200 keys
    skewed = spark.createDataFrame(
        [("hot", i) for i in range(1600)]
        + [(f"k{i % 200}", i) for i in range(400)],
        "key string, v long").repartition(8)
    P = 32
    b = measured_salt_buckets(skewed, ["key"], parallelism=P)
    # p_max = 0.8 → ceil(0.8 · 32) = 26, +1/(k+1) estimate slack
    assert 24 <= b <= 28
    assert measured_salt_buckets(skewed.repartition(3), ["key"],
                                 parallelism=P) in range(24, 29)
    assert measured_salt_buckets(skewed, ["key"], parallelism=P,
                                 max_buckets=8) == 8

    balanced = spark.createDataFrame(
        [(f"k{i % 500}", i) for i in range(2000)],
        "key string, v long").repartition(8)
    # hottest share 1/500 << 1/32 → no salt
    assert measured_salt_buckets(balanced, ["key"], parallelism=P) == 1

    want = sorted(tuple(r) for r in skewed.groupBy("key")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("v").alias("s")).collect())
    got = sorted(tuple(r) for r in salted_agg(
        skewed, ["key"], [(None, "count", "n"), ("v", "sum", "s")],
        salt_buckets=b, salt_cols=["v"]).collect())
    assert got == want


def test_spread_fans_out_non_file_sources(spark):
    """spread() must fan narrow inputs out to default parallelism for
    BOTH shapes: few-file parquet (inputFiles probe) and non-file
    in-memory frames, where inputFiles() returns [] rather than raising
    (ADVICE r8 — the empty list used to skip the repartition and
    silently serialize CPU-bound hashing)."""
    from hbase_snapshotter_spark.operators.dedup import spread

    target = spark.sparkContext.defaultParallelism
    mem = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)],
        "id long, text string").coalesce(1)
    assert mem.inputFiles() == []
    out = spread(mem)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 100
    # r13 (VERDICT r12 wrong #3): non-file sources repartition
    # UNCONDITIONALLY — the old already-wide probe called
    # df.rdd.getNumPartitions(), materializing the RDD lineage (a
    # silent planner barrier) to sometimes save one exchange on a
    # shape only unit-test fixtures hit.  An already-wide in-memory
    # input therefore gains one (cheap, fixture-only) exchange:
    wide = spark.range(1000).repartition(target)
    re_out = spread(wide)
    assert re_out is not wide
    assert re_out.rdd.getNumPartitions() == target
    assert re_out.count() == 1000
