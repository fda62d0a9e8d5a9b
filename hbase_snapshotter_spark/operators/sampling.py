"""Deterministic sampling and dataset splitting (training-data staple).

``df.sample()`` is seed-dependent and partitioning-sensitive; at 100 TB
the reproducible pattern is **hash-mod sampling**: bucket each row by a
content hash of its key and keep buckets below the rate.  Properties
that matter for ML pipelines:

- fully deterministic — same rows selected on any cluster, any
  partitioning, any engine (md5-based, replayable by the SQL oracle);
- stable under data growth — a row's bucket never changes, so samples
  and splits are consistent across incremental runs (no train/test
  leakage when data is re-processed);
- zero coordination — a narrow per-row filter, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash buckets; rates are expressed in 1/1000ths.
BUCKETS = 1000


def hash_bucket(col: Column | str) -> Column:
    """Stable bucket in [0, BUCKETS): first 8 md5 hex digits mod 1000.
    (conv is the Spark twin of the oracle's CAST('0x…' AS BIGINT).)

    NULL keys hash as the sentinel ``"\\x00NULL"`` rather than md5(NULL)
    = NULL, so bucket assignment is total: NULL-key rows land in a
    deterministic bucket instead of silently vanishing from samples and
    all routing to 'test' in splits."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.coalesce(c.cast("string"), F.lit("\x00NULL"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (h % BUCKETS).cast("int")


def deterministic_sample(df: DataFrame, key_col: str, rate_permille: int) -> DataFrame:
    """Keep ~rate‰ of rows, selected by key hash — reproducible anywhere."""
    return df.filter(hash_bucket(key_col) < rate_permille)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    *,
    val_permille: int = 100,
    test_permille: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label; boundaries are hash-bucket
    ranges so membership never flips between runs or engines."""
    b = hash_bucket(key_col)
    train_hi = BUCKETS - val_permille - test_permille
    return df.withColumn(
        out_col,
        F.when(b < train_hi, "train")
        .when(b < train_hi + val_permille, "val")
        .otherwise("test"),
    )
