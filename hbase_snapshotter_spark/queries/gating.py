"""Fixture-sf gating for exact audit lanes (VERDICT r9 task 4).

Several sketch-backed queries carry an EXACT audit lane whose only job
is to let the DuckDB oracle (and the driver hash) verify the sketch
path bit-for-bit: the ×7 windowed exact recount beside the HLL rollup
in ``events_sliding_distinct``, the exact join-size aggregation beside
the CMS inner product in ``join_size_estimate``.  Those lanes are the
CORRECTNESS harness, not the product — at 100 TB the exact recount IS
the cost the sketch exists to avoid, so the registered plan at
production scale must be the sketch path alone.

The gate is the input itself: the driver's fixtures live in
``/root/testdata/sf{0.001,0.01,0.1}`` — a basename of the form
``sf<scale>``.  Any other directory is treated as production data and
the exact lanes drop out of the plan (pytest pins both shapes; the
oracle only ever runs at fixture sfs, where the audit lanes are
present, so correctness coverage is unchanged).
"""

from __future__ import annotations

import os
import re

_FIXTURE_BASENAME = re.compile(r"sf[0-9][0-9.]*")


def exact_audit_enabled(sf_dir: str) -> bool:
    """True iff ``sf_dir`` is a driver fixture tree (``.../sf<scale>``)
    — the scales where exact audit lanes run beside the sketch path."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return _FIXTURE_BASENAME.fullmatch(base) is not None
