#!/usr/bin/env python
"""Rotation ledger: every registry key → the round it was last
driver-recorded and its next scheduled recorded round under the
least-recently-recorded-first rotation (VERDICT r9 task 7).

Reads the committed ``CORRECTNESS_r*.json`` artifacts for history and
replays the registry's own rotation rule forward, so the table shows
the max record age the clock guarantees.  Keys created by the r10
lane-union consolidation inherit their lanes' history via the
registry's SUITE_LINEAGE (the lane columns were driver-hashed under
the old key; the suite hashes the identical values under the new one).

Usage: python tools/coverage_ledger.py [> section.md]
"""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, ROOT)
    from hbase_snapshotter_spark.queries.registry import (
        _FREE,
        _PINNED,
        _last_recorded,
        SUITE_LINEAGE,
    )

    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    keys = list(mod.queries())
    snapshot5 = keys[:5]
    last = _last_recorded()
    import glob
    this_round = len(glob.glob(os.path.join(ROOT,
                                            "CORRECTNESS_r*.json"))) + 1
    pool = [k for k in keys if k not in _PINNED and k not in snapshot5]

    # replay the LRU rotation forward until every pool key is scheduled
    sched: dict[str, int] = {k: this_round for k in snapshot5 + _PINNED}
    sim_last = dict(last)
    rnd = this_round
    while len(sched) < len(keys) and rnd < this_round + 10:
        window = sorted(pool, key=lambda k: (sim_last.get(k, 0), k))[:_FREE]
        for k in window:
            sched.setdefault(k, rnd)
            sim_last[k] = rnd
        rnd += 1

    print(f"| key | last driver-recorded | next scheduled | gap |")
    print("|---|---|---|---|")
    worst = 0
    for k in sorted(keys):
        ll = last.get(k, 0)
        note = (" (as lanes)" if k in SUITE_LINEAGE and ll
                else " (as lanes, partial)" if k in SUITE_LINEAGE
                else "")
        nxt = sched[k]
        gap = nxt - ll if ll else nxt - (this_round - 1)
        worst = max(worst, gap)
        shown = f"r{ll}{note}" if ll else f"never{note or ' (new this/last round)'}"
        print(f"| `{k}` | {shown} | r{nxt} | {gap} |")
    print()
    print(f"Keys {len(keys)} (5 snapshot + {len(_PINNED)} pinned + "
          f"{len(pool)} pool), free rotation slots {_FREE}, cadence "
          f"{len(pool) / _FREE:.2f} rounds; worst record gap {worst} "
          f"rounds (bound: ceil(pool/free) = "
          f"{-(-len(pool) // _FREE)}).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
