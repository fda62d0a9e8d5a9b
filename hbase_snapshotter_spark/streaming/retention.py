"""Bounded state-dir retention for the foreachBatch maintainer family
(VERDICT r7 task 5).

The maintainers (`ewma_stream`, `drift_stream`, `neardup_stream`,
`novelty_stream`) write one ``batch=<id>`` directory per micro-batch —
idempotent and restart-safe, but the directory COUNT grows without
bound over months of micro-batches (every read lists and opens O(#
batches) dirs, and small-file pressure grows with it).  This module
applies the N40 compaction economics to batch dirs: periodically merge
the dirs older than the retention window into ONE ``compact=<wm>``
generation, then delete them — bounded directory count, identical
reads.

Layout under a maintainer root::

    batch=<id>/<sub>/...      live per-batch tables (unchanged)
    compact=<wm>/<sub>/...    ONE merged generation: every completed
                              batch id <= wm
    compact=<wm>/_DONE        generation complete (lands last)

Invariants:

- **Reads are unchanged**: ``table_dirs(sub)`` = the newest complete
  generation + every live completed batch dir with id > watermark —
  their union holds exactly the rows of all completed batches (an
  optional per-subtable ``aggregate`` may pre-merge rows whose
  consumers re-aggregate anyway, e.g. bucket-sum histograms — lossless
  by the N58/N65 argument).
- **Re-delivery stays a no-op**: batch ids never repeat after the
  compaction watermark (Spark batch ids are monotone), so maintainers
  guard ``is_compacted(batch_id)`` exactly where they guarded the
  per-dir done marker; a re-delivered compacted batch changes no
  bytes.
- **Crash-safe**: the generation is built in a temp dir, ``_DONE``
  lands last, and the atomic rename publishes it; old generations and
  expired batch dirs are deleted only AFTER publication, and a crash
  between publication and cleanup is healed by the next compaction
  (stale generations are swept, expired dirs sit at <= watermark and
  are ignored by every reader).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class BatchDirCompactor:
    """Retention policy over one maintainer root directory.

    ``subtables``: the per-batch table sub-paths to carry into the
    generation (``""`` means the batch dir itself IS the table).
    ``done_subpath``: the path inside a batch dir whose existence marks
    it complete (the maintainer's own marker convention).
    ``keep_last``: live completed batch dirs to keep out of the
    generation (>= 1 so latest-state readers keep a live dir).
    ``aggregate``: optional ``{subtable: df -> df}`` pre-merge applied
    when building the generation — only for tables whose consumers
    re-aggregate (lossless merges).
    """

    def __init__(self, root: str, *, subtables: tuple[str, ...] = ("verdict",),
                 done_subpath: str = "verdict/_DONE", keep_last: int = 8,
                 aggregate: dict[str, Callable[[DataFrame], DataFrame]]
                 | None = None):
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        self.root = root
        self.subtables = tuple(subtables)
        self.done_subpath = done_subpath
        self.keep_last = keep_last
        self.aggregate = aggregate or {}

    def _entries(self, prefix: str) -> list[tuple[int, str]]:
        out = []
        for d in os.listdir(self.root):
            if d.startswith(prefix):
                try:
                    out.append((int(d.split("=", 1)[1]),
                                os.path.join(self.root, d)))
                except ValueError:
                    continue
        return sorted(out)

    def _generations(self) -> list[tuple[int, str]]:
        return [(i, p) for i, p in self._entries("compact=")
                if os.path.exists(os.path.join(p, "_DONE"))]

    def watermark(self) -> int:
        """Highest batch id inside the newest complete generation
        (-1 when none)."""
        gens = self._generations()
        return gens[-1][0] if gens else -1

    def is_compacted(self, batch_id: int) -> bool:
        return batch_id <= self.watermark()

    def _sub(self, base: str, sub: str) -> str:
        return os.path.join(base, sub) if sub else base

    def live_done_dirs(self) -> list[str]:
        """Completed batch dirs past the watermark, id order."""
        wm = self.watermark()
        return [p for i, p in self._entries("batch=")
                if i > wm
                and os.path.exists(os.path.join(p, self.done_subpath))]

    def table_dirs(self, sub: str) -> list[str]:
        """Every parquet dir holding subtable ``sub``: the newest
        generation (if it carries the subtable) + live batch dirs."""
        dirs = []
        gens = self._generations()
        if gens:
            p = self._sub(gens[-1][1], sub or "data")
            if os.path.exists(p):
                dirs.append(p)
        dirs += [self._sub(d, sub) for d in self.live_done_dirs()]
        return dirs

    def compact(self, spark: SparkSession) -> int:
        """Fold completed batch dirs beyond the retention window into a
        new generation; returns how many batch dirs were folded."""
        wm = self.watermark()
        # Heal earlier crashes FIRST (a crash between generation publish
        # and the deletion loop below leaves batch dirs at ids <= the
        # watermark, which no reader consults and — without this sweep —
        # no later compaction would ever delete, silently unbounding the
        # directory count; likewise a __compact_tmp=<wm'> from a crash
        # before publish would only be removed if wm' exactly recurred).
        for i, p in self._entries("batch="):
            if i <= wm:
                shutil.rmtree(p, ignore_errors=True)
        for d in os.listdir(self.root):
            if d.startswith("__compact_tmp"):
                shutil.rmtree(os.path.join(self.root, d),
                              ignore_errors=True)
        done = [(i, p) for i, p in self._entries("batch=")
                if i > wm
                and os.path.exists(os.path.join(p, self.done_subpath))]
        expired = done[:-self.keep_last]
        if not expired:
            return 0
        new_wm = expired[-1][0]
        gens = self._entries("compact=")  # incl. incomplete/stale
        tmp = os.path.join(self.root, f"__compact_tmp={new_wm}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        # subtables may be empty (full-state maintainers retain by
        # deletion only) — the generation dir then holds just _DONE
        os.makedirs(tmp, exist_ok=True)
        prev_gen = self._generations()
        for sub in self.subtables:
            srcs = []
            if prev_gen:
                prev = self._sub(prev_gen[-1][1], sub or "data")
                if os.path.exists(prev):
                    srcs.append(prev)
            srcs += [self._sub(p, sub) for _, p in expired]
            df = spark.read.parquet(*srcs)
            agg = self.aggregate.get(sub)
            if agg is not None:
                df = agg(df)
            df.write.mode("overwrite") \
                .parquet(self._sub(tmp, sub or "data"))
        with open(os.path.join(tmp, "_DONE"), "w") as fh:
            fh.write("")
        final = os.path.join(self.root, f"compact={new_wm}")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # publication done — cleanup is safe to lose to a crash (the
        # next compaction re-sweeps anything stale)
        for _, p in expired:
            shutil.rmtree(p, ignore_errors=True)
        for _, p in gens:
            if p != final:
                shutil.rmtree(p, ignore_errors=True)
        return len(expired)
