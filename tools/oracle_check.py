#!/usr/bin/env python
"""Driver-style correctness gate, run locally.

Simulates what the round driver does: run ``entry(spark)`` as a smoke
check, then every ``queries()[name]`` at the given scale factor against
its ``oracle_sql()[name]`` via DuckDB — comparing row count, column
names, and an order-insensitive value fingerprint (floats rounded to 6
decimals so legitimate cross-engine float fuzz doesn't flag).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return norm_cell(float(v))
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # smoke
    n = entrymod.entry(spark).count()
    print(f"[smoke] entry() rows={n}", flush=True)
    assert n >= 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(srows)} ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_s = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_hash = ok_cols and fingerprint(scols, srows) == fingerprint(ocols, orows)
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(f"[{status}] {name}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} (spark {spark_s:.1f}s, duckdb {duck_s:.1f}s)")
        if status == "FAIL":
            failed.append(name)
            if not ok_cols:
                print(f"    spark cols:  {sorted(scols)}")
                print(f"    oracle cols: {sorted(ocols)}")
            elif srows and orows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(ls, lo) if a != b]
                for a, b in diffs[:3]:
                    print(f"    spark : {a[:200]}")
                    print(f"    oracle: {b[:200]}")
                print(f"    ({len(diffs)} differing lines)")
    print("FAILED:" if failed else "ALL OK", ",".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
