#!/usr/bin/env python
"""Measured scaling curves for the LLM-pipeline operators.

The sub-quadratic claims for MinHash-LSH / SimHash / multi-table SRP
(Σ bucket²·L, capped by ``max_df`` / band width) are design arguments;
this tool turns them into MEASURED evidence: each operator runs at

- 1×   = sf0.01  (driver fixture),
- 10×  = sf0.1   (driver fixture),
- 100× = a synthetic 10× self-union of sf0.1 (written to /tmp — the
  driver fixtures are read-only),

and the per-step scaling exponent log(t_b/t_a)/log(size_b/size_a) is
reported (1.0 = linear, 2.0 = quadratic).

The synthetic replicas are CONTENT-PERTURBED so the measurement scales
the engine, not the duplicate structure:

- documents: every token of replica r > 0 gets an ``r{r}·`` prefix, so
  no shingle ever collides across replicas — each replica contributes
  the base corpus' collision structure, keeping true pair counts (and
  the ideal workload) linear in the replica count;
- embeddings: replica r is multiplied elementwise by a deterministic
  ±1 pattern derived from (r, dim).  A diagonal sign matrix S satisfies
  cos(Sa, Sb) = cos(a, b), so WITHIN-replica pairs and top-k structure
  are preserved exactly while SRP signatures differ across replicas.

Timings are min-of-2 on a warm session, action = noop write (full
computation, no driver collect).

Usage: python tools/scale_curve.py [--skip-100x]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time


REPLICAS = 10
ID_STRIDE = 100_000_000


def build_10x(spark, src_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(f"{out_dir}/embeddings.parquet"):
        return  # reuse a previously built fixture (content is deterministic)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")

    doc_parts = []
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * ID_STRIDE))
        if r > 0:
            # prefix every token -> replica-disjoint shingle space
            d = d.withColumn(
                "text",
                F.concat(F.lit(f"r{r}·"),
                         F.regexp_replace("text", " ", f" r{r}·")))
        doc_parts.append(d)
    docs10 = doc_parts[0]
    for p in doc_parts[1:]:
        docs10 = docs10.unionAll(p)
    docs10.repartition(32).write.parquet(f"{out_dir}/documents.parquet")

    emb_parts = []
    for r in range(REPLICAS):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * ID_STRIDE))
        if r > 0:
            # deterministic elementwise ±1 per (replica, dim): preserves
            # all within-replica cosines, decorrelates SRP buckets
            e = e.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: x * F.when(
                        F.pmod(F.hash(F.lit(r), i), 2) == 0, F.lit(1.0)
                    ).otherwise(F.lit(-1.0)).cast("float")))
        emb_parts.append(e)
    emb10 = emb_parts[0]
    for p in emb_parts[1:]:
        emb10 = emb10.unionAll(p)
    emb10.repartition(32).write.parquet(f"{out_dir}/embeddings.parquet")


def operators():
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from hbase_snapshotter_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_pairs_bucketed,
    )

    def run_minhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return minhash_lsh_pairs(docs, "doc_id", num_hashes=12, bands=4,
                                 threshold=0.7)

    def run_simhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return simhash_pairs(docs, "doc_id", max_hamming=2)

    def run_ann(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_embdup(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return cosine_pairs_bucketed(emb, threshold=0.45)

    return {
        "minhash_lsh": run_minhash,
        "simhash": run_simhash,
        "ann_topk_lsh": run_ann,
        "embedding_near_dup_lsh": run_embdup,
    }


def main() -> int:
    skip_100x = "--skip-100x" in sys.argv
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from hbase_snapshotter_spark.cache import release_caches

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-curve")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [("1x", "/root/testdata/sf0.01", 1.0),
             ("10x", "/root/testdata/sf0.1", 10.0)]
    if not skip_100x:
        out = "/tmp/scale_curve_100x"
        print("building synthetic 100x fixture ...", file=sys.stderr, flush=True)
        build_10x(spark, "/root/testdata/sf0.1", out)
        sizes.append(("100x", out, 100.0))

    ops = operators()
    # global warmup at the smallest size: Janino codegen + Arrow worker
    # startup otherwise dominate the 1x timings
    for name, fn in ops.items():
        fn(spark, sizes[0][1]).write.mode("overwrite").format("noop").save()
        release_caches()

    results: dict[str, dict] = {name: {} for name in ops}
    for label, d, _mult in sizes:
        for name, fn in ops.items():
            best, rows = float("inf"), None
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, d)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
                release_caches()
            rows = fn(spark, d).count()
            release_caches()
            results[name][label] = {"sec": round(best, 2), "rows": rows}
            print(f"  {label:>4} {name:24s} {best:7.2f}s rows={rows}",
                  file=sys.stderr, flush=True)

    report = {}
    for name, r in results.items():
        steps = {}
        pairs = [("1x", "10x", 10.0), ("10x", "100x", 10.0)]
        for a, b, ratio in pairs:
            if a in r and b in r:
                steps[f"{a}->{b}"] = round(
                    math.log(r[b]["sec"] / r[a]["sec"]) / math.log(ratio), 2)
        report[name] = {"times": r, "exponent": steps}
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
