"""Embedding similarity search (SURVEY §2.3 N14) — cosine top-k and
sign-projection LSH ANN over an ``array<float>`` column.

Numeric determinism: elements are cast to double before any arithmetic
(float×float is exact in double), so Spark and the SQL oracle compute
identical products; all emitted scores are rounded.  Projection vectors
are module-level constants (seeded, 6-dp literals) embedded verbatim in
both the DataFrame code and the oracle SQL — no RNG at run time.

Scale path:

- :func:`brute_force_topk` — exact; broadcast the (small) query set and
  stream the corpus: per-executor work is |corpus_partition| × |queries|
  with no shuffle until the final per-query top-k (TakeOrdered-style
  window).  The right baseline, and the verifier for ANN recall.
- :func:`ann_lsh_topk` — sign-projection (SRP) LSH: bucket on the sign
  bit-string of ``n_projections`` dot products, candidate = bucket
  collision, exact cosine re-rank inside the bucket.  Corpus side is one
  narrow map + a bucket-key equi-join — the 100 TB shape (IVF coarse
  quantization has the same plan with learned centroids instead of
  random planes).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMBEDDING_DIM = 64
NUM_PROJECTIONS = 8
_PROJECTION_SEED = 42


def random_projections(
    dim: int = EMBEDDING_DIM, n: int = NUM_PROJECTIONS, seed: int = _PROJECTION_SEED
) -> list[list[float]]:
    """Seeded gaussian projection planes, rounded to 6 dp so their SQL
    literal form parses to bit-identical doubles."""
    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n)]


PROJECTIONS = random_projections()


def _d(c: Column) -> Column:
    return c.cast("double")


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x)))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def projection_dot(vec: Column, plane: list[float]) -> Column:
    """Dot of an array column with a literal plane — element fetch by
    index keeps it JVM-side."""
    return sum((_d(F.element_at(vec, i + 1)) * F.lit(w) for i, w in enumerate(plane)),
               start=F.lit(0.0))


def srp_bucket(vec: Column, projections: list[list[float]] = PROJECTIONS) -> Column:
    """Sign-random-projection bucket id, e.g. ``'10110010'``, via an
    Arrow-batched Pandas UDF (one numpy matmul per batch — the
    expression form is a 512-term interpreted tree, ~100× slower).
    Dots are rounded (6 dp) before the sign so cross-engine float fuzz
    can't flip a bit."""
    plane_matrix = np.array(projections, dtype=np.float64)

    @F.pandas_udf("string")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        v = np.array(emb.tolist(), dtype=np.float64)
        signs = np.round(v @ plane_matrix.T, 6) >= 0
        digits = signs.astype(np.uint8).astype("U1")
        return pd.Series(["".join(row) for row in digits])

    return bucket_udf(vec)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, rank, cosine).
    ``queries`` is broadcast; self-matches are excluded."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    projections: list[list[float]] = PROJECTIONS,
) -> DataFrame:
    """Approximate top-k: candidates = SRP-bucket collisions, re-ranked
    by exact cosine.  Same output shape as :func:`brute_force_topk`;
    queries whose bucket holds no other vector produce no rows (that's
    the recall trade-off, measured against the brute-force baseline)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
                       srp_bucket(F.col(vec_col), projections).alias("__bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
                      srp_bucket(F.col(vec_col), projections).alias("__bucket"))
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pairwise_dot_udf() -> Column:
    """Arrow-batched pairwise dot product — one numpy einsum per batch.
    The per-pair expression form (zip_with + aggregate) is interpreted
    and ~50× slower on quadratic pair sets."""
    @F.pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        x = np.array(a.tolist(), dtype=np.float64)
        y = np.array(b.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", x, y))

    return dot_udf


PROJECTIONS16 = random_projections(n=16)
LSH_TABLES, LSH_BITS_PER_TABLE = 4, 4


def cosine_pairs_bucketed(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    projections: list[list[float]] = PROJECTIONS16,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Embedding near-dup, the 100 TB path: multi-table SRP-LSH — the
    16-bit signature splits into ``tables`` keys; pairs colliding in ANY
    table become candidates (equi-joins only, cost Σ bucket²·L, never
    n²), then exact cosine + threshold.  Collision probability for a
    pair at angle θ is 1-(1-(1-θ/π)^m)^L (m bits per table) — recall is
    tunable and measured against the exact :func:`cosine_pairs`.
    Output: (id_a, id_b, cosine) with id_a < id_b."""
    bits = len(projections) // tables
    with_b = emb.select(
        F.col(id_col), F.col(vec_col),
        norm_expr(F.col(vec_col)).alias("__norm"),
        srp_bucket(F.col(vec_col), projections).alias("__sig"),
    )
    keyed = with_b.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.substring("__sig", t * bits + 1, bits) for t in range(tables)
        ])).alias("__tbl", "__key"),
    )
    a = keyed.select(F.col(id_col).alias("id_a"), "__tbl", "__key")
    b = keyed.select(F.col(id_col).alias("id_b"), "__tbl", "__key")
    candidates = (
        a.join(b, ["__tbl", "__key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    dot = pairwise_dot_udf()
    va = with_b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                       F.col("__norm").alias("__na"))
    vb = with_b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                       F.col("__norm").alias("__nb"))
    return (
        candidates.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                F.round(dot(F.col("__va"), F.col("__vb"))
                        / (F.col("__na") * F.col("__nb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — embedding near-dup (N13's
    cosine variant), as a block-matrix similarity join: the corpus is
    broadcast once as a dense float64 matrix, each partition of rows
    multiplies against it in a single numpy matmul, and only pairs
    clearing the threshold are emitted.

    Data movement is O(n·d) (one broadcast + one streamed pass), not
    O(n²·d) — no pair rows ever exist outside numpy.  This holds to
    ~10⁵-10⁶ vectors (a 100k×64 float32 corpus is 25 MB broadcast);
    beyond that, shard the corpus into column blocks or pre-bucket with
    :func:`srp_bucket` / IVF cells and run this join per bucket."""
    import pandas as pd  # noqa: F811 - explicit for mapInPandas closure

    corpus = emb.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = corpus[id_col].to_numpy()
    B = np.array(corpus[vec_col].tolist(), dtype=np.float64)
    b_norm = np.sqrt(np.einsum("ij,ij->i", B, B))
    bc = emb.sparkSession.sparkContext.broadcast((ids, B, b_norm))

    def block_join(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf[id_col].to_numpy()
            A = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a_norms = np.sqrt(np.einsum("ij,ij->i", A, A))
            C = np.round((A @ b_mat.T) / np.outer(a_norms, b_norms), 4)
            ai, bi = np.nonzero((C >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({
                "id_a": a_ids[ai], "id_b": b_ids[bi], "cosine": C[ai, bi],
            })

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        block_join, "id_a long, id_b long, cosine double"
    )


IVF_CENTROID_STRIDE = 31  # centroids = vectors with vec_id % stride == 0


def ivf_assignments(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = IVF_CENTROID_STRIDE,
) -> DataFrame:
    """(id, cell) — IVF coarse quantization: every vector is assigned to
    its nearest (max-cosine) centroid.

    Centroids here are a deterministic sample (``id % stride == 0``,
    giving ~n/stride cells ≈ √n at fixture sizes) so the SQL oracle can
    replay the assignment; swap in k-means centroids for production —
    the plan (broadcast centroids → vectorized scores → argmax) is
    identical.  Scores are rounded (6 dp) before the argmax so float
    fuzz can't flip an assignment."""
    dot = pairwise_dot_udf()
    cents = emb.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"),
        norm_expr(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        emb.select(F.col(id_col), F.col(vec_col),
                   norm_expr(F.col(vec_col)).alias("__n"))
        .crossJoin(F.broadcast(cents))
        .select(id_col,
                F.col("__cid"),
                F.round(dot(F.col(vec_col), F.col("__cv"))
                        / (F.col("__n") * F.col("__cn")), 6).alias("__score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("__cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("__cid").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = IVF_CENTROID_STRIDE,
) -> DataFrame:
    """Approximate top-k via IVF (nprobe=1): candidates share the query's
    cell, re-ranked by exact cosine.  Output shape matches
    :func:`brute_force_topk`; recall depends on cell granularity and is
    measured against it."""
    assign = ivf_assignments(corpus, id_col=id_col, vec_col=vec_col,
                             centroid_stride=centroid_stride)
    dot = pairwise_dot_udf()
    with_cell = corpus.join(assign, id_col).select(
        F.col(id_col), F.col(vec_col), F.col("cell"),
        norm_expr(F.col(vec_col)).alias("__n"),
    )
    q = queries.select(F.col(id_col).alias("query_id")) \
        .join(with_cell.withColumnRenamed(id_col, "query_id"), "query_id") \
        .select("query_id", F.col(vec_col).alias("__qv"), "cell",
                F.col("__n").alias("__qn"))
    c = with_cell.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("__cv"), "cell",
                         F.col("__n").alias("__cn"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(dot(F.col("__qv"), F.col("__cv"))
                        / (F.col("__qn") * F.col("__cn")), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
