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
  each handle is tagged with the ACTIVE SCOPE (the registered query being
  built — the registry wraps every build in :func:`cache_scope`);
- batch drivers call :func:`release_caches` after each action (``bench.py``
  and the pytest sweep do), which drops every scope.

LIFECYCLE CONTRACT — per-query scopes, bounded live set: handles are
keyed by the query that registered them.  Rebuilding a query releases
only ITS stale handles, and the registry keeps at most
``MAX_LIVE_SCOPES`` (2) query scopes cached, evicting the
least-recently-built beyond that.  Interleaving two queries (build A,
build B, act on A) therefore keeps A's caches warm — no recompute —
while a sequential build→act driver loop holds at most two queries'
working sets.  Interleave depth beyond ``MAX_LIVE_SCOPES`` falls back to
the recompute behavior (correct, slower) — pinned by
``tests/test_queries_oracle.py::test_cache_scope_interleaved_builds_no_
recompute``.

Releasing is always SAFE, never wrong: unpersisting a DataFrame changes
no results — at worst a later action recomputes the lineage.
"""

from __future__ import annotations

from collections import OrderedDict
from contextlib import contextmanager

from pyspark.sql import DataFrame

#: scope name -> handles registered while that scope was active,
#: in build order (oldest scope first).
_SCOPES: OrderedDict[str, list[DataFrame]] = OrderedDict()

_GLOBAL = "__global__"
_current: str = _GLOBAL

#: How many query scopes may hold cache blocks at once.  2 keeps the
#: common interleave (build A, build B, act on A) recompute-free while
#: bounding a long sequential driver loop at two working sets.
MAX_LIVE_SCOPES = 2


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register the handle under the active scope.

    The handle stays cached until its scope is released — by a rebuild
    of the same query, by eviction when more than ``MAX_LIVE_SCOPES``
    newer queries were built, or by :func:`release_caches`."""
    out = df.persist()
    _SCOPES.setdefault(_current, []).append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed handle for release."""
    _SCOPES.setdefault(_current, []).append(df)
    return df


def release_scope(name: str) -> int:
    """Unpersist every handle of one scope; returns how many.

    Idempotent and safe at any time (double-unpersist is a no-op).
    Handles whose owning SparkContext has been stopped are skipped —
    their blocks died with the context; any other unpersist failure is
    a real error and propagates, with the failing handle (and the rest
    of its scope) still tracked for the next release instead of leaking
    for the session lifetime."""
    handles = _SCOPES.get(name)
    if handles is None:
        return 0
    n = len(handles)
    while handles:
        # peek-then-pop: if unpersist raises (transient JVM error), the
        # handle stays tracked for the next release
        df = handles[-1]
        if getattr(df.sparkSession._sc, "_jsc", None) is not None:
            df.unpersist()
        handles.pop()
    del _SCOPES[name]
    return n


def release_caches() -> int:
    """Unpersist every scoped handle in every scope; returns how many."""
    n = 0
    for name in list(_SCOPES):
        n += release_scope(name)
    return n


@contextmanager
def cache_scope(name: str):
    """Make ``name`` the active scope for :func:`scoped_persist` calls.

    Entering releases the scope's OWN stale handles (a rebuild of the
    same query invalidates its previous build's caches) and any
    handles registered OUTSIDE a scope (direct operator use — a
    registry build clearing stray global handles is the pre-scope
    hygiene, safe because releasing at worst recomputes); exiting
    evicts the least-recently-built QUERY scopes beyond
    ``MAX_LIVE_SCOPES`` — the global scope never counts toward the
    bound, so direct-use handles can't silently shrink the promised
    warm set."""
    global _current
    release_scope(name)
    release_scope(_GLOBAL)
    prev = _current
    _current = name
    _SCOPES[name] = []
    _SCOPES.move_to_end(name)
    try:
        yield
    finally:
        _current = prev
        if not _SCOPES.get(name):
            # nothing persisted: drop the empty entry so scope-less
            # queries don't count toward (or evict from) the live bound
            _SCOPES.pop(name, None)
        query_scopes = [s for s in _SCOPES if s != _GLOBAL]
        evictable = [s for s in query_scopes if s not in (name, _current)]
        while len(query_scopes) > MAX_LIVE_SCOPES and evictable:
            victim = evictable.pop(0)
            release_scope(victim)
            query_scopes.remove(victim)
