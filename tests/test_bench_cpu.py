"""The bench CPU probe must not lose a child's ticks when the child is
reaped between two reads (VERDICT r12 wrong #1: per-query CPU of
-2045 s in the committed artifact).  _proc_cpu_s now includes each
scanned PID's cutime/cstime, which accumulate reaped children."""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _burn_child(seconds: float) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c",
         "import time\n"
         f"end = time.process_time() + {seconds}\n"
         "while time.process_time() < end: pass\n"])


def test_reaped_child_cpu_is_not_lost():
    burn = 0.6
    child = _burn_child(burn)
    time.sleep(0.15)           # child is live and burning
    c0 = bench._proc_cpu_s()   # includes the live child's partial burn
    child.wait()               # child reaped: its ticks move to cutime
    c1 = bench._proc_cpu_s()
    delta = c1 - c0
    # The old utime+stime-only walk measured delta < 0 here (the whole
    # child's accumulated CPU vanished at reap time).  With cutime/
    # cstime included, the delta must be non-negative and carry the
    # rest of the child's burn (allow scheduler slack).
    assert delta >= 0.0, f"reaped child lost CPU: delta={delta}"
    assert delta >= burn * 0.2, (
        f"delta {delta} too small — reaped-child ticks not recovered")


def test_busy_self_cpu_monotonic():
    c0 = bench._proc_cpu_s()
    end = time.process_time() + 0.2
    while time.process_time() < end:
        pass
    c1 = bench._proc_cpu_s()
    assert c1 - c0 >= 0.1
