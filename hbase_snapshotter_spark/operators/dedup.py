"""Deduplication operators — exact and near-dup (SURVEY §2.3 N12/N13).

Four strategies, all deterministic and all shuffle-frugal:

- :func:`exact_dedup` — hash-groupBy on the dup key, keep-min tie-break.
- :func:`jaccard_pairs` — exact n-gram Jaccard via an inverted-index
  self-join (pairs sharing ≥1 shingle), the verification primitive.
- :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH: only
  band-collision candidates get exact verification.  Hashing is
  ``min(md5(seed || shingle))`` — no RNG state, so signatures are
  reproducible anywhere (including the SQL oracle).  This is the same
  banding scheme as ``ml.feature.MinHashLSH.approxSimilarityJoin`` but
  with content-derived hashes instead of model-seeded ones.
- :func:`simhash` / :func:`simhash_pairs` — 32-bit SimHash from
  per-token md5 bit parities; near-dup candidates bucket on equal bytes
  (pigeonhole: hamming ≤ 6 ⇒ ≥1 of 4 bytes equal... not guaranteed, but
  ≤3 byte-flips ⇒ guaranteed; standard SimHash banding trade-off).

Scale: every strategy is (explode → hash-agg → equi-join) — no
cross-join anywhere.  The inverted-index joins shuffle by shingle/band/
byte; hot shingles (stopword-only n-grams) are the skew risk — cap them
with ``max_df`` which drops shingles appearing in more than that many
docs (they contribute ~0 to Jaccard specificity but O(df²) join rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.text import doc_shingles


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key — the one with the smallest
    ``order_col`` (deterministic, unlike ``dropDuplicates``).  Aggregate
    form (min over a struct), so partial aggregation runs map-side."""
    others = [c for c in df.columns if c not in key_cols]
    packed = F.min(F.struct(F.col(order_col), *[F.col(c) for c in others if c != order_col]))
    out = df.groupBy(*key_cols).agg(packed.alias("__row"))
    return out.select(*key_cols, *[F.col(f"__row.{c}").alias(c) for c in
                                   [order_col] + [c for c in others if c != order_col]])


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int,
                  max_df: int | None) -> DataFrame:
    s = doc_shingles(df, id_col, text_col, n)
    if max_df is not None:
        hot = (s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") > max_df).select("shingle"))
        s = s.join(hot, "shingle", "left_anti")
    return s


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard over all pairs sharing ≥1 shingle.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared per pair, then ``|A∩B| / (|A|+|B|-|A∩B|)``.
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    s = _shingle_sets(df, id_col, text_col, n, max_df)
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    a, b = s.alias("a"), s.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        shared.join(na, "id_a").join(nb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("__shared") / (F.col("__na") + F.col("__nb") - F.col("__shared")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", *, n: int = 3, num_hashes: int = 12
) -> DataFrame:
    """(id, seed, minhash) — one row per hash function.  The i-th hash of
    a shingle is ``md5(i || '|' || shingle)``; the signature entry is the
    lexicographic min over the document's shingles (a valid min-wise
    permutation family over the md5 codomain)."""
    s = doc_shingles(df, id_col, text_col, n)
    seeded = s.select(
        id_col,
        F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed"),
        "shingle",
    )
    return (
        seeded.withColumn("h", F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))))
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH + exact verification.

    ``num_hashes/bands`` rows per band; docs colliding on any band's
    concatenated signature slice become candidates; candidates get exact
    Jaccard and the threshold filter.  Output: (id_a, id_b, jaccard).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    band_keys = (
        sig.withColumn("band", (F.col("seed") / rows).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed"), F.col("minhash"))))).alias("band_key"))
    )
    a, b = band_keys.alias("a"), band_keys.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    exact = jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold, max_df=max_df)
    return candidates.join(exact, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


SIMHASH_BITS = 48
SIMHASH_BANDS = 6


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, simhash) — 48-bit SimHash.  Bit b of a token comes from md5
    hex nibble b//4 (bit b%4); the document bit is the majority vote over
    distinct tokens.  One explode + one hash-agg, no shuffle beyond the
    groupBy."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    nibs = toks.select(
        id_col,
        *[F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int").alias(f"n{j}")
          for j in range(SIMHASH_BITS // 4)],
    )
    bit_sums = nibs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftright(F.col(f"n{b // 4}"), b % 4).bitwiseAND(F.lit(1))).alias(f"b{b}")
          for b in range(SIMHASH_BITS)],
    )
    value = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{b}") * 2 >= F.col("n"), F.lit(1 << b)).otherwise(0)
        value = bit if value is None else value + bit
    return bit_sums.select(F.col(id_col), value.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", *, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``,
    candidate-bucketed on equal bytes (6 bands of 8 bits; ≤ 5 byte-flips
    guarantees a shared band, so recall is exact for max_hamming ≤ 5).
    Output: (id_a, id_b, hamming)."""
    sh = simhash(df, id_col, text_col)
    banded = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), 8 * j).bitwiseAND(F.lit(255))
            for j in range(SIMHASH_BANDS)
        ])).alias("band", "byte"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.byte") == F.col("b.byte"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
