"""Scoped cache registry — bounded cache lifetime for a long-lived session.

Several operators must ``persist()`` an intermediate that is consumed by
two or more downstream branches of the SAME returned plan (band tables,
shingle sets, signature bases, IVF cells): AQE gives self-joins and
multi-consumer DataFrames **zero** exchange reuse, so without the cache
the producing DAG re-runs once per consumer.  Those handles cannot be
unpersisted inside the operator — the returned DataFrame is lazy and the
cache must live until the *caller's* action has run.

This module makes that lifecycle explicit instead of leaking handles for
the lifetime of the SparkSession:

- operators call :func:`scoped_persist` instead of ``DataFrame.persist``;
- batch drivers call :func:`release_caches` after each action (the query
  registry does this automatically when the next query is built, so a
  sequential build-run-build-run driver loop holds at most one query's
  working set; ``bench.py`` and the pytest sweep release explicitly).

LIFECYCLE CONTRACT — single-threaded build-then-act: the registry's
scope is the whole module-global list, so building ANY registered query
releases EVERY scoped handle, including those of a query built earlier
but not yet executed.  Interleaving builds (build A, build B, act on A)
is therefore CORRECT but loses A's cache: A's action transparently
recomputes the persisted lineage, paying the duplicate-DAG cost the
persist existed to avoid (AQE gives multi-consumer plans zero exchange
reuse).  Execute each registered query before building the next one —
pinned by ``tests/test_queries_oracle.py::test_cache_scope_interleaved_
builds_recompute_correctly``.

Releasing is always SAFE, never wrong: unpersisting a DataFrame changes
no results — at worst a later action recomputes the lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register the handle for :func:`release_caches`.

    The handle stays cached until the NEXT :func:`release_caches` call —
    with the query registry, until the next registered query is built
    (see the module-level lifecycle contract)."""
    out = df.persist()
    _ACTIVE.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed handle for release."""
    _ACTIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scoped handle; returns how many were released.

    Idempotent and safe at any time (double-unpersist is a no-op).
    Handles whose owning SparkContext has been stopped are skipped —
    their blocks died with the context; any other unpersist failure is
    a real error and propagates."""
    n = len(_ACTIVE)
    while _ACTIVE:
        # peek-then-pop: if unpersist raises (transient JVM error), the
        # handle stays tracked for the next release instead of leaking
        # its cache block for the session lifetime
        df = _ACTIVE[-1]
        if getattr(df.sparkSession._sc, "_jsc", None) is not None:
            df.unpersist()
        _ACTIVE.pop()
    return n
