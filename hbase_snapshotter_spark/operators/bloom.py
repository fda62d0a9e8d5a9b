"""Bloom-filter membership pruning for cross-snapshot novelty
(SURVEY §2.3 N34).

The 100 TB problem: every incremental crawl/ingest must answer "which
of these documents have we ALREADY got?" against a corpus-sized prior.
A plain anti-join shuffles the ENTIRE new partition on the content key;
the standard production fix (web-crawl dedup, RocksDB/LevelDB, Spark's
own runtime bloom join pruning in SPARK-32268) is a Bloom filter over
the prior keys:

    prior keys → fixed-size bitmap        (one scan, mergeable partials)
    new keys   → might_contain probe      (narrow, zero shuffle)
    misses     → DEFINITELY novel         (a Bloom has no false negatives)
    hits       → exact anti-join verify   (true dups + ~1% false positives)

so the anti-join's left side shrinks from |new| to |duplicates| + fpp·
|new| — the result stays EXACT (false positives are weeded by the
verify join; false negatives don't exist), only the shuffle shrinks.

Spark-first shape: the build is a ``mapInPandas`` pass emitting one
fixed-size partial bitmap per Arrow batch, OR-merged on the driver —
the treeAggregate sketch-merge pattern (same sanctioned O(sketch)
collect as the IVF centroid table: the bitmap is ~10 bits/key whatever
the corpus size, and production would swap the driver loop for
``RDD.treeAggregate`` without touching the probe side).  The probe is
an Arrow-batched pandas UDF with the bitmap in the task closure.

Hashing is md5-derived (k index slices of one digest) — deterministic
across runs/partitionings, but NOT part of any output contract: the
bloom never surfaces in results (exactness comes from the verify join),
so the oracle replays the plain anti-join and equality IS the check.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshotter_spark.cache import scoped_persist

#: ~10 bits/key with 7 probes ≈ 0.8% false-positive rate.
BLOOM_BITS_PER_KEY = 10
BLOOM_NUM_HASHES = 7


def _positions(key: str, m_bits: int) -> list[int]:
    """k bit positions from ONE md5 digest: 7 slices of 8 hex chars
    (enhanced double hashing would also do; one digest is plenty for
    m ≤ 2^32 and keeps the probe a single hash per key)."""
    dig = hashlib.md5(key.encode()).hexdigest()
    dig2 = hashlib.md5((key + "#b").encode()).hexdigest()
    hexes = [dig[i:i + 8] for i in range(0, 32, 8)]
    hexes += [dig2[i:i + 8] for i in range(0, 32, 8)]
    return [int(h, 16) % m_bits for h in hexes[:BLOOM_NUM_HASHES]]


def bloom_bits_for(n_keys: int) -> int:
    """Bitmap size: BITS_PER_KEY·n rounded up to a power of two (so the
    modulo is well-spread), floor 1024, CAP 2^32 (the positions are
    32-bit digest slices — a larger modulo would silently leave the
    upper bitmap untouched and halve the effective bits/key).  Beyond
    ~430 M keys (a 512 MB bitmap) production shards the filter by a key
    prefix — one bitmap per shard, probed by the same expression — so
    the cap is where partitioned blooms take over, not a scale limit
    of the pattern."""
    bits = max(1024, 1 << math.ceil(
        math.log2(max(1, n_keys) * BLOOM_BITS_PER_KEY)))
    return min(bits, 1 << 32)


def build_bloom(prior: DataFrame, key_col: str, n_keys: int = 0,
                *, m_bits: int | None = None) -> bytes:
    """One scan over ``prior``: per-partition partial bitmaps
    (np.uint8, m/8 bytes), OR-merged driver-side.  Returns the packed
    bitmap (bytes).  NULL keys are skipped (a NULL is never a member;
    the caller's verify join has the same semantics).  ``m_bits``
    overrides the size derivation — incremental maintainers must build
    every increment at the SAME size so bitmaps OR together."""
    if m_bits is None:
        m_bits = bloom_bits_for(n_keys)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE bitmap per PARTITION (the generator spans all its Arrow
        # batches), not per batch: per-batch partials would collect
        # O(n_rows/batch_size) full-size bitmaps instead of
        # O(n_partitions) — the difference between sketch-sized and
        # corpus-sized driver ingress
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            for key in pdf[key_col].dropna():
                for pos in _positions(str(key), m_bits):
                    bm[pos >> 3] |= 1 << (pos & 7)
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    rows = (prior.select(key_col)
            .mapInPandas(partials, schema="bm binary")
            .collect())
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out.tobytes()


def might_contain(bitmap: bytes, key_col: Column | str) -> Column:
    """Arrow-batched membership probe against a built bitmap; NULL keys
    probe false (never members)."""
    m_bits = len(bitmap) * 8
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        def one(key) -> bool:
            if key is None:
                return False
            return all(
                bm[p >> 3] & (1 << (p & 7))
                for p in _positions(str(key), m_bits))
        return keys.map(one)

    return probe(F.col(key_col) if isinstance(key_col, str) else key_col)


def novel_keys(
    new: DataFrame,
    prior: DataFrame,
    key_col: str,
    *,
    flag_col: str = "novel",
) -> DataFrame:
    """EXACT novelty of ``new`` rows against ``prior`` keys, with the
    anti-join's left side bloom-pruned: misses skip the shuffle
    entirely (no false negatives), hits are verified by a left-anti
    join against the distinct prior keys.  Adds ``flag_col``; all
    ``new`` rows are preserved.  Result is bit-identical to the plain
    anti-join whatever the bloom's false-positive rate."""
    # the prior key column feeds three consumers (count, bloom build,
    # verify-join key set) and the probed new side feeds three branches
    pk = scoped_persist(prior.select(key_col))
    n_prior = pk.count()
    bitmap = build_bloom(pk, key_col, n_prior)
    probed = scoped_persist(
        new.withColumn("__hit", might_contain(bitmap, key_col)))
    misses = probed.filter(~F.col("__hit")).withColumn(
        flag_col, F.lit(True))
    # ONE left join derives both flags (an anti + a semi of the same
    # sides would shuffle hits and prior keys twice); distinct prior
    # keys guarantee no row multiplication, and a NULL probe key never
    # matches, staying novel
    marked = pk.distinct().withColumn("__dup", F.lit(True))
    verified = (
        probed.filter(F.col("__hit"))
        .join(marked, key_col, "left")
        .withColumn(flag_col, F.col("__dup").isNull())
        .drop("__dup"))
    return misses.unionByName(verified).drop("__hit")
