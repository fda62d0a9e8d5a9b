#!/usr/bin/env python
"""Split a query's rep wall into BUILD (Python plan construction) vs
EXECUTE (noop save of a prebuilt frame) — the r13 session-3 lens on the
flat tail (guide §1.2: profile before touching).  Optionally cProfile
the build to attribute it (py4j vs Python vs analysis).

Usage: python tools/build_profile.py [-r REPS] [--cprofile] q [q ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import time


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("names", nargs="+", metavar="q")
    ns = ap.parse_args()
    reps = ns.reps
    do_prof = ns.cprofile
    names = ns.names
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_RECALL_PROBE", "0")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from hbase_snapshotter_spark.cache import release_caches
    from hbase_snapshotter_spark.queries.registry import (
        SESSION_DEFAULTS,
        QUERIES as _REGISTRY,
    )

    class _LaneResolver(dict):
        def __missing__(self, name):
            import hbase_snapshotter_spark.queries.llm as llm
            import hbase_snapshotter_spark.queries.relational as rel
            import hbase_snapshotter_spark.queries.streaming_q as stq
            for mod in (llm, stq, rel):
                fn = getattr(mod, name, None)
                if callable(fn):
                    return fn
            raise KeyError(name)

    QUERIES = _LaneResolver(_REGISTRY)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("build-profile")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in SESSION_DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    out = {}
    for name in names:
        fn = getattr(QUERIES[name], "__wrapped__", QUERIES[name])
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        release_caches(keep_shared=True)
        builds, execs = [], []
        prof = cProfile.Profile() if do_prof else None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.time()
            if prof is not None:
                prof.enable()
            df = fn(spark, sf_dir)
            if prof is not None:
                prof.disable()
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
            release_caches(keep_shared=True)
        out[name] = {"build": min(builds), "exec": min(execs),
                     "builds": builds, "execs": execs}
        print(f"{name:35s} build {min(builds):7.3f}  exec {min(execs):7.3f}"
              f"  builds {builds}  execs {execs}", flush=True)
        if prof is not None:
            s = io.StringIO()
            ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
            ps.print_stats(18)
            print(s.getvalue())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
