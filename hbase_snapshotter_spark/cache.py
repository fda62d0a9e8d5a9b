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

Releasing is always SAFE, never wrong: unpersisting a DataFrame changes
no results — at worst a later action recomputes the lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register the handle for :func:`release_caches`."""
    out = df.persist()
    _ACTIVE.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed handle for release."""
    _ACTIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scoped handle; returns how many were released.

    Idempotent and safe at any time (double-unpersist is a no-op)."""
    n = len(_ACTIVE)
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return n
