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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshotter_spark.cache import scoped_persist

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
    ``queries`` is broadcast; self-matches are excluded.  Ranking is the
    window-free :func:`topk_by_group` hash-agg (no sort of the full
    candidate set by query_id)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4).alias("cosine"))
    )
    return topk_by_group(scored, k).select("query_id", "neighbor_id", "rank", "cosine")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    projections: list[list[float]] | None = None,
    tables: int | None = None,
    n_vectors: int | None = None,
    geometry: str = "fixed",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE SRP-LSH: the signature splits
    into ``tables`` band keys; a corpus vector is a candidate for a
    query if they collide in ANY table (collision probability for angle
    θ is 1-(1-(1-θ/π)^m)^L, m bits per table — multi-table trades
    candidate volume for recall, the same scheme as
    :func:`cosine_pairs_bucketed`).  Candidates are deduped across
    tables after scoring (same pair ⇒ same rounded cosine, so
    ``distinct`` is exact), then re-ranked by exact cosine via the
    window-free :func:`topk_by_group` hash-agg.

    The corpus side is never shuffled before scoring: the (small) query
    band table is broadcast, so per-executor work is
    |corpus_partition| × collisions.  Queries sharing no bucket with
    any other vector produce no rows — the recall trade-off, measured
    against :func:`brute_force_topk` (pytest pins score identity; the
    registered query pins a recall floor the driver hash-checks).
    Same output shape as :func:`brute_force_topk`.  Geometry defaults
    to :func:`lsh_geometry` over the CORPUS size — derived with a cheap
    count when ``n_vectors`` isn't supplied (see
    :func:`_resolve_lsh_geometry`); fixture sizes resolve to the
    measured constants, larger corpora grow bits at fixed occupancy and
    tables to hold recall.

    ``geometry="measured"`` (VERDICT r7 task 4) additionally runs
    :func:`clusteredness_probe` and takes the deep measured row on
    tight corpora — the study's 15× candidate-fraction headroom cashed
    without a manual knob; near-isotropic corpora (every driver
    fixture) resolve to the same constants as fixed mode, pinned by
    ``tests/test_srp_autotune.py``."""
    if geometry not in ("fixed", "measured"):
        raise ValueError(f"geometry must be 'fixed' or 'measured': {geometry!r}")
    if geometry == "measured" and projections is None and tables is None:
        if n_vectors is None:
            n_vectors = corpus.count()
        t, b = tuned_srp_geometry(
            n_vectors,
            clusteredness_probe(corpus, id_col=id_col, vec_col=vec_col,
                                n_vectors=n_vectors))
        projections, tables = (
            (ANN_PROJECTIONS, ANN_TABLES)
            if (t, b) == (ANN_TABLES, ANN_BITS_PER_TABLE)
            else (random_projections(n=t * b), t))
    projections, tables = _resolve_lsh_geometry(
        corpus, projections, tables, n_vectors,
        ref_tables=ANN_TABLES, ref_bits=ANN_BITS_PER_TABLE,
        ref_projections=ANN_PROJECTIONS)
    if len(projections) % tables:
        raise ValueError(
            f"len(projections)={len(projections)} not divisible by "
            f"tables={tables}: trailing signature bits would silently drop")
    bits = len(projections) // tables
    band = lambda sig: F.posexplode(F.array(*[  # noqa: E731
        F.substring(sig, t * bits + 1, bits) for t in range(tables)]))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        srp_bucket(F.col(vec_col), projections).alias("__sig"),
    ).select("query_id", "__qv", band(F.col("__sig")).alias("__tbl", "__key"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        srp_bucket(F.col(vec_col), projections).alias("__sig"),
    ).select("neighbor_id", "__cv", band(F.col("__sig")).alias("__tbl", "__key"))
    scored = (
        c.join(F.broadcast(q), ["__tbl", "__key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4).alias("cosine"))
        .distinct()  # a pair colliding in several tables scores once
    )
    return topk_by_group(scored, k).select("query_id", "neighbor_id", "rank", "cosine")


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


# OR-construction geometry, sized on MEASURED recall of the fixture
# corpora — which are near-isotropic (true top-5 cosines ≈ 0.3, near-dup
# pairs ≈ 3σ outliers), the worst case for any space-partitioning index:
# real embedding corpora cluster, reaching the same recall at far lower
# candidate fractions.  Collision probability for angle θ with m bits ×
# L tables is 1-(1-(1-θ/π)^m)^L.
#
# - ANN top-k search: 12 tables × 4 bits (48 planes) — measured top-5
#   recall vs brute force 0.81 / 0.81 / 0.89 at sf0.001/0.01/0.1,
#   candidate fraction ≈ 0.54 (isotropic worst case).
# - near-dup pairs (threshold 0.45): 8 tables × 3 bits (24 planes) —
#   measured pair recall vs the exact block-matrix join 1.00 / 0.79 /
#   0.90, candidate fraction ≈ 0.65.
#
# Both registered queries hash-check a ≥0.7 recall floor in-query.
ANN_TABLES, ANN_BITS_PER_TABLE = 12, 4
ANN_PROJECTIONS = random_projections(n=ANN_TABLES * ANN_BITS_PER_TABLE)
NEARDUP_TABLES, NEARDUP_BITS_PER_TABLE = 8, 3
NEARDUP_PROJECTIONS = random_projections(n=NEARDUP_TABLES * NEARDUP_BITS_PER_TABLE)

#: Reference corpus size for :func:`lsh_geometry` — the largest driver
#: fixture (sf0.1, 5 000 vectors).  At or below it the measured-recall
#: constants above apply verbatim (every fixture size resolves to
#: today's geometry, so driver hashes are unaffected); beyond it bits
#: grow with log₂(n) to hold bucket occupancy.
LSH_REF_N = 5_000

#: Assumed per-plane collision probability of a THRESHOLD pair, used to
#: grow the table count alongside the bits: for SRP, a pair at angle θ
#: agrees on one plane's sign with probability 1-θ/π; the near-dup
#: threshold cos θ* = 0.45 gives θ* ≈ 63.3° → p₁ ≈ 0.648.  The
#: fixture's true near pairs sit right at the threshold (near-isotropic
#: corpus), so this is the conservative end; clustered production
#: corpora have p₁ closer to 1 and need fewer tables.
LSH_P1 = 0.648


def lsh_geometry(
    n_vectors: int,
    *,
    ref_tables: int = NEARDUP_TABLES,
    ref_bits: int = NEARDUP_BITS_PER_TABLE,
    ref_n: int = LSH_REF_N,
    p1: float = LSH_P1,
    max_bits: int = 16,
) -> tuple[int, int]:
    """Corpus-size-aware SRP geometry ``(tables, bits_per_table)``.

    FIXED geometry is not scale-correct: per-table bucket occupancy is
    n/2^bits, so every 10× corpus growth grows the expected bucket —
    and with it the Σ bucket²·L candidate term and the per-task matmul
    slab — 10×.  This function holds occupancy ~constant instead:

    - ``bits = ref_bits + floor(log₂(n / ref_n))`` for n > ref_n (each
      extra bit halves the expected bucket), clamped to ``max_bits``;
    - ``tables = ceil(ref_tables · (1/p1)^extra_bits)`` — each extra
      bit multiplies a threshold pair's per-table collision odds by
      p₁, so the OR-construction needs 1/p₁ more tables per bit to
      hold pair recall 1-(1-p₁^bits)^tables at its reference level.

    The table growth is the LSH-theoretic price of recall (total work
    n·L = n^(1+ρ)); what this buys at scale is the OTHER term: bucket
    width — the per-task memory slab and the quadratic in-bucket flop
    term — stays constant per core instead of growing with the corpus
    (measured in ``tools/scale_curve.py --lsh-geometry``).

    ``n_vectors ≤ ref_n`` returns exactly ``(ref_tables, ref_bits)`` —
    all driver fixtures resolve to the measured-recall constants, so
    registered-query hashes are unchanged by auto mode.
    """
    import math

    if n_vectors <= ref_n:
        return ref_tables, ref_bits
    extra = min(max_bits - ref_bits,
                int(math.floor(math.log2(n_vectors / ref_n))))
    bits = ref_bits + extra
    tables = math.ceil(ref_tables * (1.0 / p1) ** extra)
    return tables, bits


# ---- measured-clusteredness auto-tune (VERDICT r7 task 4) ----------
#
# The clustered-ANN study (`tools/scale_curve.py --clustered-ann`,
# `SCALE_CURVE_ANN_CLUSTERED.json`) measured that DEEP geometry
# (4 tables × 8 bits) reaches recall 0.736 at candidate fraction 0.052
# on a clustered corpus — 15× fewer scored candidates than the
# reference geometry needs — while COLLAPSING to 0.036 recall on
# isotropic data.  The right geometry is therefore corpus-dependent;
# the probe + table below derive it from the data instead of leaving
# it a manual knob.

#: A sampled pair at least this close counts as "tight" (same-cluster
#: mass): isotropic d=64 cosines are ~N(0, 1/64), so 0.7 is a 5.6σ
#: event there (probability ~1e-8) while any real cluster structure
#: puts its within-cluster pair mass far above it.
TIGHT_PAIR_COS = 0.7

#: Decision floor on the tight-pair fraction.  The study's 32-cluster
#: corpus measures ≈ 1/32 ≈ 0.03 (same-cluster pair probability);
#: isotropic measures ~0 — both a >2× margin from 0.01.
TIGHT_PAIR_FLOOR = 0.01

#: The measured deep row: 4 tables × 8 bits (the study's re-tuned
#: geometry — recall 0.736 at candidate fraction 0.052 on clustered).
DEEP_TABLES, DEEP_BITS = 4, 8

#: Per-plane collision probability of a within-cluster pair at the
#: tight-pair cosine: θ = arccos 0.7 ≈ 45.6° → p₁ = 1 − θ/π ≈ 0.747 —
#: the growth rate :func:`lsh_geometry` uses to scale the deep table
#: count past the reference corpus size.
DEEP_P1 = 0.7468

#: Probe sample size: the gram matrix is sample² dots over sample·d
#: floats — 1024 vectors at d=64 is a 256 KB collect and a ~1M-dot
#: numpy call, both trivial at any corpus scale.
PROBE_SAMPLE_N = 1024


def clusteredness_probe(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = PROBE_SAMPLE_N,
    n_vectors: int | None = None,
) -> float:
    """Measured clusteredness in [0, 1]: the fraction of sampled-pair
    cosines ≥ :data:`TIGHT_PAIR_COS` over a deterministic ≤ sample_n
    vector sample.

    Cost at 100 TB: ONE column-pruned O(n) scan with a narrow
    md5-permille filter (the `operators/sampling.py:hash_bucket`
    idiom), a bounded ≤ ~1.5·sample_n-row collect, and a driver-side
    numpy gram matrix — no shuffle, O(inputs) against the O(n·L) LSH
    pass it parameterizes.  The sample is PARTITIONING-INDEPENDENT
    (membership is a pure function of the id; the cap takes the
    md5-smallest rows driver-side), so the verdict — and with it the
    selected geometry — is a property of the data, reproducible on any
    cluster layout."""
    import math

    if n_vectors is None:
        n_vectors = emb.count()
    if n_vectors <= 1:
        return 0.0
    pm = max(1, min(1000, math.ceil(1500.0 * sample_n / n_vectors)))
    sampled = emb.select(
        F.md5(F.col(id_col).cast("string")).alias("__h"),
        F.col(vec_col).alias("__v"),
    ).filter(
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("long") % 1000 < pm)
    rows = sorted(sampled.collect(), key=lambda r: r["__h"])[:sample_n]
    if len(rows) < 2:
        return 0.0
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    x /= norms
    iu = np.triu_indices(len(x), k=1)
    return float(((x @ x.T)[iu] >= TIGHT_PAIR_COS).mean())


def tuned_srp_geometry(n_vectors: int, tight_frac: float) -> tuple[int, int]:
    """``(tables, bits)`` from MEASURED clusteredness: a tight corpus
    takes the deep row of the measured table (grown from
    (:data:`DEEP_TABLES`, :data:`DEEP_BITS`) by the
    :func:`lsh_geometry` occupancy rule at p₁ = :data:`DEEP_P1`); a
    loose corpus takes the ANN reference row.  Fixture corpora are
    near-isotropic and ≤ :data:`LSH_REF_N`, so they resolve to exactly
    ``(ANN_TABLES, ANN_BITS_PER_TABLE)`` — registered-query hashes are
    unchanged by measured mode."""
    if tight_frac >= TIGHT_PAIR_FLOOR:
        return lsh_geometry(
            n_vectors, ref_tables=DEEP_TABLES, ref_bits=DEEP_BITS,
            p1=DEEP_P1)
    return lsh_geometry(
        n_vectors, ref_tables=ANN_TABLES, ref_bits=ANN_BITS_PER_TABLE)


def _resolve_lsh_geometry(
    corpus: DataFrame,
    projections: list[list[float]] | None,
    tables: int | None,
    n_vectors: int | None,
    *,
    ref_tables: int,
    ref_bits: int,
    ref_projections: list[list[float]],
) -> tuple[list[list[float]], int]:
    """Resolve the (projections, tables) geometry for an SRP-LSH entry
    point.  Auto mode (neither projections nor tables given) is the
    DEFAULT-SCALE-CORRECT path (VERDICT r6 task 3): if the caller didn't
    supply ``n_vectors`` either, the corpus size is derived with a cheap
    ``count()`` — metadata-only on a bare parquet scan, one
    column-pruned pass otherwise, and O(inputs) against the O(n·L)
    LSH pass it parameterizes — so a production caller who forgets the
    knob gets occupancy-held geometry instead of silently-linear bucket
    growth.  Fixture-sized corpora (≤ :data:`LSH_REF_N`) resolve to the
    measured-recall reference constants, so registered-query hashes are
    unchanged by the auto default."""
    if projections is None and tables is None:
        if n_vectors is None:
            n_vectors = corpus.count()
        auto_tables, auto_bits = lsh_geometry(
            n_vectors, ref_tables=ref_tables, ref_bits=ref_bits)
        return (
            ref_projections
            if (auto_tables, auto_bits) == (ref_tables, ref_bits)
            else random_projections(n=auto_tables * auto_bits)
        ), auto_tables
    if projections is None:
        return ref_projections, tables
    if tables is None:
        return projections, ref_tables
    return projections, tables


def cosine_pairs_bucketed(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    projections: list[list[float]] | None = None,
    tables: int | None = None,
    chunk_rows: int = 2048,
    n_vectors: int | None = None,
) -> DataFrame:
    """Embedding near-dup, the 100 TB path: multi-table SRP-LSH — the
    signature splits into ``tables`` keys; pairs colliding in ANY table
    become candidates (cost Σ bucket²·L inner products, never n²·d data
    movement), then exact cosine + threshold.  Collision probability for
    a pair at angle θ is 1-(1-(1-θ/π)^m)^L (m bits per table) — recall
    is tunable and measured against the exact :func:`cosine_pairs`.
    Output: (id_a, id_b, cosine) with id_a < id_b.

    Scoring happens INSIDE each (table, bucket) group as chunked numpy
    matmuls (``applyInPandas``), emitting only threshold-passing pairs.
    The earlier formulation — candidate-pair equi-join, then two joins
    attaching both vectors, then an Arrow dot per pair — materialized
    |candidates| join rows each carrying 2·d floats: measured 423 s at a
    20 k-vector corpus (~10⁸ candidates ≈ 100 GB through the shuffle) vs
    ~4 s for this form, which moves each vector L times (n·L rows) and
    keeps the quadratic term as BLAS flops, not rows.  Pair dedup across
    tables is a min-aggregate on the (already rare) passing pairs.
    ``chunk_rows`` bounds each matmul slab (chunk × bucket), so task
    memory is O(bucket·d + chunk·bucket); bucket width is the (m, L)
    geometry knob — :func:`lsh_geometry` grows m with log₂(n) at fixed
    occupancy, holding the per-task slab and the Σ bucket²·L flop term
    constant per core.  ``n_vectors`` (approximate corpus size, e.g.
    from table stats) parameterizes it directly; when omitted it is
    derived with a cheap count (see :func:`_resolve_lsh_geometry`), so
    the scale-correct geometry is the DEFAULT — fixture sizes resolve
    to the measured-recall constants; explicit ``projections``/
    ``tables`` override both."""
    if (projections is None) != (tables is None):
        raise ValueError("pass both projections and tables, or neither")
    projections, tables = _resolve_lsh_geometry(
        emb, projections, tables, n_vectors,
        ref_tables=NEARDUP_TABLES, ref_bits=NEARDUP_BITS_PER_TABLE,
        ref_projections=NEARDUP_PROJECTIONS)
    if len(projections) % tables:
        raise ValueError(
            f"len(projections)={len(projections)} not divisible by "
            f"tables={tables}: trailing signature bits would silently drop")
    bits = len(projections) // tables
    sig = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        srp_bucket(F.col(vec_col), projections).alias("__sig"),
    )
    banded = sig.select(
        "__id", "__v",
        F.posexplode(F.array(*[
            F.substring("__sig", t * bits + 1, bits) for t in range(tables)
        ])).alias("__tbl", "__key"),
    )
    thr = float(threshold)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        X = np.array(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for i0 in range(0, len(ids), chunk_rows):
            sl = slice(i0, i0 + chunk_rows)
            cos = np.round(
                (X[sl] @ X.T) / (norms[sl, None] * norms[None, :]), 4)
            r, c = np.nonzero(cos >= thr)
            ga, gb = ids[i0 + r], ids[c]
            keep = ga < gb  # global id order: one row per pair, no self
            out_a.append(ga[keep])
            out_b.append(gb[keep])
            out_c.append(cos[r[keep], c[keep]])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
            "cosine": np.concatenate(out_c) if out_c else np.array([], np.float64),
        })

    pairs = banded.groupBy("__tbl", "__key").applyInPandas(
        bucket_pairs, "id_a long, id_b long, cosine double")
    # A pair colliding in several tables emits one row per table — min()
    # is one hash-agg over the (rare) passing pairs.  The copies are
    # computed in different matmul slabs, so they can in principle
    # differ in the last ulp and round apart at an exact x.xxxx5
    # boundary; min() stays deterministic across runs (same buckets →
    # same slabs), and the residual cross-engine boundary risk is the
    # same class the module header documents for every rounded score.
    return pairs.groupBy("id_a", "id_b").agg(F.min("cosine").alias("cosine"))

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
    O(n²·d) — no pair rows ever exist outside numpy.  But the corpus is
    collected on the DRIVER first, which caps it at ~10⁵-10⁶ vectors —
    this function is therefore the small-scale exact baseline / recall
    verifier (tests only).  The production exact path is
    :func:`cosine_pairs_blocked` (distributed block-matrix, no driver
    collect); the sub-quadratic approximate path is
    :func:`cosine_pairs_bucketed`."""
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


def cosine_pairs_blocked(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a DISTRIBUTED block-matrix
    self-join — no driver collect, no broadcast of the corpus.

    Vectors are hashed into ``n_blocks`` row-blocks; every unordered
    block pair (i ≤ j) becomes one task.  A row in block b fans out to
    its tasks (as the left side of (b, j≥b) and the right side of
    (i<b, b)), one shuffle groups each task's two blocks together, and
    ``applyInPandas`` runs a single numpy matmul per task — pair rows
    never exist outside numpy.  Data movement is O(n·n_blocks) rows;
    compute is the unavoidable exact n²·d/2, split into n_blocks²/2
    independent tasks.  Size ``n_blocks`` ≈ n·d·8 / executor-memory so
    two blocks fit comfortably per task; LSH (:func:`cosine_pairs_
    bucketed`) remains the sub-quadratic path when approximate recall
    is acceptable.

    Output: (id_a, id_b, cosine), id_a < id_b, cosine rounded to 4 dp.
    """
    import pandas as pd  # noqa: F811 - explicit for applyInPandas closure

    b_col = F.pmod(F.col(id_col), F.lit(n_blocks))
    left = F.transform(
        F.sequence(b_col, F.lit(n_blocks - 1)),
        lambda j: F.struct(b_col.alias("bi"), j.alias("bj"), F.lit("L").alias("role")))
    right = F.transform(
        F.sequence(F.lit(0), b_col),
        lambda i: F.struct(i.alias("bi"), b_col.alias("bj"), F.lit("R").alias("role")))
    # the diagonal task (b, b) needs each row once — drop its R copy
    tasks = F.filter(F.concat(left, right),
                     lambda t: ~((t["bi"] == t["bj"]) & (t["role"] == F.lit("R"))))
    fanned = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        F.explode(tasks).alias("__t"),
    ).select("__id", "__v", F.col("__t.bi").alias("bi"),
             F.col("__t.bj").alias("bj"), F.col("__t.role").alias("role"))

    def block_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        lpdf = pdf[pdf["role"] == "L"]
        rpdf = lpdf if bi == bj else pdf[pdf["role"] == "R"]
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        a_ids = lpdf["__id"].to_numpy()
        b_ids = rpdf["__id"].to_numpy()
        A = np.array(lpdf["__v"].tolist(), dtype=np.float64)
        B = np.array(rpdf["__v"].tolist(), dtype=np.float64)
        an = np.sqrt(np.einsum("ij,ij->i", A, A))
        bn = np.sqrt(np.einsum("ij,ij->i", B, B))
        C = np.round((A @ B.T) / np.outer(an, bn), 4)
        mask = C >= threshold
        if bi == bj:
            mask &= a_ids[:, None] < b_ids[None, :]
        else:
            mask &= a_ids[:, None] != b_ids[None, :]
        ai, ci = np.nonzero(mask)
        ia, ib = a_ids[ai], b_ids[ci]
        return pd.DataFrame({
            "id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib),
            "cosine": C[ai, ci],
        })

    return fanned.groupBy("bi", "bj").applyInPandas(
        block_fn, "id_a long, id_b long, cosine double")


IVF_CENTROID_STRIDE = 31  # centroids = vectors with vec_id % stride == 0


def sampled_centroids(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = IVF_CENTROID_STRIDE,
) -> DataFrame:
    """Deterministic-sample centroids ``(__cid, __cv)``: vectors with
    ``id % stride == 0`` (~n/stride cells ≈ √n at fixture sizes) — fully
    replayable by the SQL oracle, no RNG."""
    return emb.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))


def assign_to_centroids(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — nearest (max-cosine) centroid per vector.

    The centroid table is O(√n)-small BY DESIGN (c = n/stride cells; at
    a 10⁹-vector corpus with √n cells that is ~3·10⁴ rows ≈ 15 MB), so
    it is collected once and shipped in the UDF closure — the faiss /
    Spark-ML KMeansModel pattern, and the second sanctioned driver-side
    collect in this repo (with ``plans/schema.py``'s one-row lookup):
    it never touches raw data, only the index structure.  Scoring is
    then ONE ``mapInPandas`` batch matmul — n rows in, n rows out —
    instead of a broadcast crossJoin materializing n×c rows each
    carrying both full vectors (measured 14.7 s → 2.1 s at a
    20 k-vector / 645-cell corpus; the join-row form is the same
    rows-vs-flops pathology ``cosine_pairs_bucketed`` had).

    Scores are rounded (6 dp) before the argmax so float fuzz can't
    flip an assignment; ties break toward the smallest centroid id
    (centroid columns are sorted by id, ``argmax`` keeps the first
    maximum) — bit-compatible with the previous hash-agg
    ``max(struct(score, -cid))`` form and with the SQL oracle."""
    crows = centroids.select("__cid", "__cv").collect()
    if not crows:
        raise ValueError("assign_to_centroids: empty centroid table")
    crows.sort(key=lambda r: r["__cid"])  # Row.__cid is reserved syntax
    cids = np.array([r["__cid"] for r in crows], dtype=np.int64)
    C = np.array([r["__cv"] for r in crows], dtype=np.float64)
    cn = np.sqrt(np.einsum("ij,ij->i", C, C))
    id_type = dict(emb.dtypes)[id_col]

    def assign(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xn = np.sqrt(np.einsum("ij,ij->i", X, X))
            scores = np.round((X @ C.T) / (xn[:, None] * cn[None, :]), 6)
            best = scores.argmax(axis=1)  # first max → smallest cid
            yield pd.DataFrame({id_col: pdf[id_col], "cell": cids[best]})

    return emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} {id_type}, cell long")


def kmeans_centroids(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = IVF_CENTROID_STRIDE,
    iterations: int = 2,
) -> DataFrame:
    """Lloyd's k-means refinement of the sampled centroids — the
    production IVF path.  Each iteration is the SAME broadcast-score-
    argmax plan as :func:`assign_to_centroids` followed by an
    elementwise mean (posexplode → per-(cell, dim) avg → re-assembled
    array); no driver-side math, centroids stay a DataFrame end-to-end.
    Deterministic: seeded by the deterministic sample, no RNG.

    At 100 TB, run the training loop on a :mod:`~.sampling` hash-mod
    sample (a few million vectors bounds centroid drift) and apply the
    final centroids to the full corpus with one more assignment pass."""
    cents = sampled_centroids(emb, id_col=id_col, vec_col=vec_col,
                              centroid_stride=centroid_stride)
    for _ in range(iterations):
        assign = assign_to_centroids(emb, cents, id_col=id_col, vec_col=vec_col)
        cents = (
            emb.join(assign, id_col)
            .select(F.col("cell"), F.posexplode(F.col(vec_col)).alias("__pos", "__x"))
            .groupBy("cell", "__pos")
            .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
            .groupBy("cell")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("__pos"), F.col("__m")))),
                lambda s: s["__m"]).alias("__cv"))
            .select(F.col("cell").alias("__cid"), "__cv")
        )
        # persist each level: centroids feed the NEXT assignment and
        # the final return — without the cache cut, each iteration's
        # DAG nests the previous one's twice (exponential recompute);
        # released by the caller's release_caches() after its action
        cents = scoped_persist(cents)
    return cents


def _ivf_centroids(
    emb: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    centroid_stride: int,
    use_kmeans: bool,
    kmeans_iterations: int = 2,
) -> DataFrame:
    """The IVF centroid table: the oracle-replayable deterministic
    sample by default, Lloyd's-refined centroids behind ``use_kmeans``
    — downstream plans are identical, only the broadcast side changes."""
    if use_kmeans:
        return kmeans_centroids(emb, id_col=id_col, vec_col=vec_col,
                                centroid_stride=centroid_stride,
                                iterations=kmeans_iterations)
    return sampled_centroids(emb, id_col=id_col, vec_col=vec_col,
                             centroid_stride=centroid_stride)


def ivf_assignments(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = IVF_CENTROID_STRIDE,
    use_kmeans: bool = False,
    kmeans_iterations: int = 2,
) -> DataFrame:
    """(id, cell) — IVF coarse quantization: every vector is assigned to
    its nearest (max-cosine) centroid via :func:`assign_to_centroids`
    (hash-agg argmax, no window sort)."""
    cents = _ivf_centroids(emb, id_col=id_col, vec_col=vec_col,
                           centroid_stride=centroid_stride,
                           use_kmeans=use_kmeans,
                           kmeans_iterations=kmeans_iterations)
    return assign_to_centroids(emb, cents, id_col=id_col, vec_col=vec_col)


def topk_by_group(
    scored: DataFrame,
    k: int,
    *,
    group_col: str = "query_id",
    score_col: str = "cosine",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-group top-k WITHOUT a window sort: one hash aggregation
    collects ``struct(score, -id)`` per group (map-side partials), then
    ``sort_array`` + ``slice`` rank the in-memory per-group list and
    ``posexplode`` emits ranks.  Correct whenever per-group candidate
    sets are bounded (bucket/cell-sized) — exactly the ANN re-rank case;
    ties break toward the smaller id."""
    agg = scored.groupBy(group_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col(score_col),
                                        (-F.col(id_col)).alias("__neg_id"))),
                asc=False),
            1, k).alias("__top"))
    return agg.select(
        group_col, F.posexplode("__top").alias("__pos", "__t")
    ).select(
        F.col(group_col),
        (-F.col("__t.__neg_id")).alias(id_col),
        (F.col("__pos") + 1).cast("int").alias("rank"),
        F.col(f"__t.{score_col}").alias(score_col),
    )


#: Adaptive multi-probe: each query probes
#: ``min(CAP, max(MIN, ceil(FRAC × n_cells)))`` of its nearest centroid
#: cells.  A FIXED nprobe is not scale-correct — cells grow with the
#: corpus (n/stride), so a constant probe count covers a vanishing
#: fraction of the space and recall decays with n; probing a constant
#: FRACTION of cells keeps recall stable (measured 0.88 / 0.84 / 0.78
#: at sf0.001/0.01/0.1, where fixed nprobe=3 gave 0.39 / 0.43 / 0.25).
#: FRAC=0.375 is sized for the near-isotropic fixture vectors — the
#: worst case; clustered production corpora reach the same recall at a
#: far smaller fraction (the standard IVF knob).  CAP bounds the
#: per-query probe list (and the collect_list slice) at any scale.
IVF_PROBE_MIN = 12
IVF_PROBE_FRAC = 0.375
IVF_PROBE_CAP = 64
#: Measured-probe mode (VERDICT r8 task 4): probe enough nearest cells
#: to cover ``IVF_COVER_TARGET`` of the corpus MASS, with the effective
#: cell count taken as the occupancy distribution's PERPLEXITY
#: ``exp(-Σ pᵢ ln pᵢ)`` — the measured cell-occupancy-skew statistic.
#: Uniform occupancy ⇒ perplexity = n_cells and the rule degrades to a
#: plain fraction; a skewed index (hot cells carry the mass — the
#: clustered-production shape) ⇒ perplexity ≪ n_cells and the SAME
#: coverage is reached probing proportionally fewer cells, instead of a
#: fixed literal fraction that overpays on skewed data and decays on
#: uniform data (measured: 0.375 fixed gave top-5 recall 0.78 at sf0.1;
#: the 0.6-coverage measured rule gives 0.88/0.84/0.92 at
#: sf0.001/0.01/0.1 — ≥ 0.8 everywhere).
IVF_COVER_TARGET = 0.6


def probe_centroids(
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_min: int = IVF_PROBE_MIN,
    probe_frac: float = IVF_PROBE_FRAC,
    probe_cap: int = IVF_PROBE_CAP,
    assignments: DataFrame | None = None,
    cover: float = IVF_COVER_TARGET,
) -> DataFrame:
    """(query_id, cell) — each query's adaptive-count nearest
    (max-cosine) centroid cells, via the window-free
    :func:`topk_by_group` hash-agg (ties toward the smaller centroid id,
    matching :func:`assign_to_centroids` at one probe).

    With ``assignments`` (the (id, cell) table) the probe count is
    MEASURED — ``min(cap, max(min, ceil(cover × perplexity)))`` where
    perplexity is the occupancy distribution's effective cell count
    (see :data:`IVF_COVER_TARGET`); without it, the static
    ``min(cap, max(min, ceil(frac × n_cells)))`` rule.  Either scalar
    arrives as a ONE-row broadcast aggregate (the scalar-attach
    shape), so nothing is collected on the driver; the occupancy agg
    is cells-sized, folded map-side from the assignment table."""
    dot = pairwise_dot_udf()
    cents = centroids.select("__cid", "__cv", norm_expr(F.col("__cv")).alias("__cn"))
    scored = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col),
                       norm_expr(F.col(vec_col)).alias("__n"))
        .crossJoin(F.broadcast(cents))
        .select("query_id", F.col("__cid"),
                F.round(dot(F.col(vec_col), F.col("__cv"))
                        / (F.col("__n") * F.col("__cn")), 6).alias("__score"))
    )
    ranked = topk_by_group(
        scored, probe_cap, group_col="query_id", score_col="__score", id_col="__cid")
    if assignments is not None:
        # perplexity = exp(ln t − Σ cᵢ ln cᵢ / t) = t · exp(−s/t);
        # 6-dp rounds before the ceil so the SQL oracle replays the
        # boundary identically (the shared float-determinism posture)
        occ = assignments.groupBy("cell").agg(
            F.count(F.lit(1)).alias("__c"))
        n_probe = occ.agg(
            F.sum("__c").alias("__t"),
            F.sum(F.col("__c") * F.log("__c")).alias("__s"),
        ).select(F.least(
            F.lit(probe_cap),
            F.greatest(
                F.lit(probe_min),
                F.ceil(F.round(
                    F.lit(cover) * F.round(
                        F.col("__t") * F.exp(-F.col("__s") / F.col("__t")),
                        6), 6)))).alias("__np"))
    else:
        n_probe = centroids.agg(F.count(F.lit(1)).alias("__ncells")) \
            .select(F.least(
                F.lit(probe_cap),
                F.greatest(
                    F.lit(probe_min),
                    F.ceil(F.lit(probe_frac) * F.col("__ncells"))))
                .alias("__np"))
    return (
        ranked.crossJoin(F.broadcast(n_probe))
        .filter(F.col("rank") <= F.col("__np"))
        .select("query_id", F.col("__cid").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = IVF_CENTROID_STRIDE,
    use_kmeans: bool = False,
    kmeans_iterations: int = 2,
    probe_min: int = IVF_PROBE_MIN,
    probe_frac: float = IVF_PROBE_FRAC,
    probe_cap: int = IVF_PROBE_CAP,
    measured_probe: bool = True,
    cover: float = IVF_COVER_TARGET,
) -> DataFrame:
    """Approximate top-k via IVF with ADAPTIVE MULTI-PROBE: candidates
    live in any of the query's nearest centroid cells, re-ranked by
    exact cosine.  ``measured_probe`` (the default) derives the probe
    count from the MEASURED cell-occupancy skew — coverage ×
    occupancy-perplexity, see :data:`IVF_COVER_TARGET`; pass
    ``measured_probe=False`` for the static fraction-of-cells rule
    (:data:`IVF_PROBE_FRAC` — itself adaptive in n_cells; see its note
    for why a fixed nprobe is not scale-correct).  Every corpus vector
    belongs to exactly one cell, so probing several cells never
    duplicates a (query, neighbor) pair — no dedup needed.  Output
    shape matches :func:`brute_force_topk`; measured top-5 recall vs
    brute force is 0.88 / 0.84 / 0.92 at sf0.001/0.01/0.1
    (driver-checked by the registered query, bound 0.7; the static
    rule measured 0.78 at sf0.1).  The whole plan is window-free:
    assignment is a hash-agg argmax, probing and the re-rank are
    :func:`topk_by_group`."""
    cents = scoped_persist(  # consumed 3x: assignment, probing, cell count
        _ivf_centroids(corpus, id_col=id_col, vec_col=vec_col,
                       centroid_stride=centroid_stride,
                       use_kmeans=use_kmeans,
                       kmeans_iterations=kmeans_iterations))
    # consumed 2x in measured mode (cell attach + occupancy agg): the
    # assignment pass (a corpus × broadcast-centroids argmax) must not
    # run twice
    assign = scoped_persist(
        assign_to_centroids(corpus, cents, id_col=id_col, vec_col=vec_col))
    dot = pairwise_dot_udf()
    with_cell = corpus.join(assign, id_col).select(
        F.col(id_col), F.col(vec_col), F.col("cell"),
        norm_expr(F.col(vec_col)).alias("__n"),
    )
    probes = probe_centroids(queries, cents, id_col=id_col, vec_col=vec_col,
                             probe_min=probe_min, probe_frac=probe_frac,
                             probe_cap=probe_cap,
                             assignments=assign if measured_probe else None,
                             cover=cover)
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"),
                       norm_expr(F.col(vec_col)).alias("__qn"))
        .join(probes, "query_id")
    )
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
    return topk_by_group(scored, k).select("query_id", "neighbor_id", "rank", "cosine")


def semdedup_verdicts(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    centroid_stride: int = IVF_CENTROID_STRIDE,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) verdicts over the EXACT near-dup
    pair set: ``(id_a, id_b, cosine, same_cell, b_sem_dropped)``.

    The dedup rule is the deterministic non-greedy drop-rule variant:
    a vector is dropped iff it has ANY same-IVF-cell lower-id partner
    at cosine ≥ ``threshold``; kept vectors are exactly those with no
    lower-id same-cell neighbor (a superset of the per-cell component
    minima — a vector whose same-cell neighbors all have higher ids is
    kept even when it is not its component's minimum).
    Non-greedy means verdicts derive from the pair set alone — no
    iterative kept-set dependency, embarrassingly parallel.  Pairs
    whose sides land in different cells surface as ``same_cell =
    false`` and never trigger a drop: that is SemDeDup's cluster-
    scoping recall trade-off, measurable directly from this output.

    Scale shape: pairs via the block-matrix self-join (or swap in
    :func:`cosine_pairs_bucketed` for the sub-quadratic LSH path),
    assignment via the batched mapInPandas matmul; the verdict joins
    key the (sparse) pair table against the (id, cell) table — standard
    shuffle hash joins on scalar ids, AQE broadcasts the pair side when
    it is small.  The flagged pair table feeds both the dropped-set agg
    and the output join, so it is scope-persisted — without it the
    block-matrix pass would run twice."""
    from hbase_snapshotter_spark.cache import scoped_persist

    pairs = cosine_pairs_blocked(emb, id_col=id_col, vec_col=vec_col,
                                 threshold=threshold)
    assign = ivf_assignments(emb, id_col=id_col, vec_col=vec_col,
                             centroid_stride=centroid_stride)
    a_cell = assign.select(F.col(id_col).alias("id_a"),
                           F.col("cell").alias("cell_a"))
    b_cell = assign.select(F.col(id_col).alias("id_b"),
                           F.col("cell").alias("cell_b"))
    flagged = scoped_persist(
        pairs.join(a_cell, "id_a").join(b_cell, "id_b")
        .withColumn("same_cell", F.col("cell_a") == F.col("cell_b")))
    dropped = (flagged.filter("same_cell").select("id_b").distinct()
               .withColumn("b_sem_dropped", F.lit(True)))
    return (flagged.join(dropped, "id_b", "left")
            .withColumn("b_sem_dropped",
                        F.coalesce("b_sem_dropped", F.lit(False)))
            .select("id_a", "id_b", "cosine", "same_cell", "b_sem_dropped"))


# --------------------------------------------------------------------------
# N39: product quantization (PQ) top-k — the MEMORY-bound ANN scale path.
#
# IVF bounds which vectors are SCORED; PQ bounds what scoring COSTS and,
# decisively at 100 TB, what the index WEIGHS: a 64-dim float32 vector is
# 256 bytes, its PQ code is `PQ_SUBSPACES` single-byte codeword ids
# (16 bytes here — 16x compression), so the scored representation of a
# 10^11-vector corpus shrinks from ~25 TB to ~1.6 TB and ADC scoring is a
# table gather + add per subspace instead of d multiplies (Jégou et al.
# 2011, "Product Quantization for Nearest Neighbor Search").
#
# Codebook: one codeword table per subspace, built from the SAME
# deterministic id-stride sample as the IVF centroids (no RNG, fully
# SQL-replayable) and CAPPED at `PQ_CODEBOOK_MAX` codewords — the cap is
# what makes codes single-byte and LUTs constant-size at any corpus
# scale (the cap never binds at fixture sizes, so oracles replay the
# uncapped sample; in production the codebook comes from k-means on a
# hash-mod sample, the same drop-in story as the IVF kmeans path).
#
# Measured top-5 recall vs brute force (m=16 subspaces of 4 dims,
# stride-13 codebook, candidate factor 6, exact re-rank):
# 0.87 / 0.94 / 0.98 at sf0.001 / 0.01 / 0.1 on the near-isotropic
# fixtures — the worst case for any quantizer; the registered query
# hash-checks a 0.7 floor.
PQ_SUBSPACES = 16
PQ_CODEBOOK_STRIDE = 13
PQ_CODEBOOK_MAX = 256
PQ_CAND_FACTOR = 6


def pq_codebook(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook_stride: int = PQ_CODEBOOK_STRIDE,
    codebook_max: int = PQ_CODEBOOK_MAX,
) -> tuple[np.ndarray, np.ndarray]:
    """``(cids, C)`` — codeword source ids (ascending) and their full
    vectors as a float64 matrix: vectors with ``id % stride == 0``,
    smallest ``codebook_max`` ids.  Subspace ``j``'s codeword table is
    the column slice ``C[:, j*sub:(j+1)*sub]`` — one sample, ``m``
    codebooks.  Collected like the IVF centroid table (the sanctioned
    index-structure collect: O(min(n/stride, codebook_max)) rows,
    never raw data)."""
    # TakeOrdered: the cap applies BEFORE the collect (ORDER BY + LIMIT
    # plans as a per-partition bounded heap + driver merge), so at most
    # codebook_max rows ever reach the driver — collecting the whole
    # stride sample first would ship n/stride full vectors
    rows = (corpus.filter((F.col(id_col) % codebook_stride) == 0)
            .select(id_col, vec_col)
            .orderBy(id_col).limit(codebook_max).collect())
    if not rows:
        raise ValueError("pq_codebook: empty codeword sample")
    cids = np.array([r[id_col] for r in rows], dtype=np.int64)
    C = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return cids, C


def pq_encode(
    corpus: DataFrame,
    C: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subspaces: int = PQ_SUBSPACES,
) -> DataFrame:
    """``(id, __codes, __rn2)`` — per-subspace nearest-codeword POSITIONS
    (argmin squared L2, 6-dp-rounded, ties toward the smaller codeword
    id — positions index the id-sorted codebook) plus the reconstructed
    squared norm (sum of 6-dp-rounded per-subspace codeword norms; the
    ADC denominator).  ONE narrow mapInPandas pass — n rows in, n rows
    out, codes are ``m`` small ints: this is the materialization that
    replaces the vector column at scale.  Distances use the expanded
    form ``|x|^2 + |c|^2 - 2<x,c>`` so the SQL oracle can replay the
    exact float expression."""
    m = subspaces
    d = C.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by {m} subspaces")
    sub = d // m
    c2 = np.array([
        (C[:, j * sub:(j + 1) * sub] ** 2).sum(axis=1) for j in range(m)])
    id_type = dict(corpus.dtypes)[id_col]

    def encode(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            rn2 = np.zeros(len(X))
            for j in range(m):
                Xj = X[:, j * sub:(j + 1) * sub]
                Cj = C[:, j * sub:(j + 1) * sub]
                x2 = (Xj ** 2).sum(axis=1)
                d2 = np.round(x2[:, None] + c2[j][None, :] - 2.0 * (Xj @ Cj.T), 6)
                pos = d2.argmin(axis=1)  # first min -> smallest codeword id
                codes[:, j] = pos
                rn2 += np.round(c2[j], 6)[pos]
            yield pd.DataFrame({id_col: pdf[id_col],
                                "__codes": list(codes),
                                "__rn2": rn2})

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} {id_type}, __codes array<int>, __rn2 double")


def _query_luts(
    queries: DataFrame,
    C: np.ndarray,
    *,
    id_col: str,
    vec_col: str,
    subspaces: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(qids, qn, lut)`` — the id-sorted query batch as ADC lookup
    tables: ``lut[q, j, c] = round(<q_j, codeword_c_j>, 6)``.  The
    query batch is the SEARCH REQUEST (O(|queries|), not corpus data)
    and ships to scoring tasks as these LUTs — the faiss search-API
    shape.  Shared by the flat-PQ and IVF+PQ lanes so their rounding
    and ordering can never drift apart (the DuckDB oracle CTEs assume
    both compute identically)."""
    m = subspaces
    sub = C.shape[1] // m
    qrows = queries.select(id_col, vec_col).collect()
    qrows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    lut = np.empty((len(qids), m, C.shape[0]))
    for j in range(m):
        Cj = C[:, j * sub:(j + 1) * sub]
        lut[:, j, :] = np.round(Q[:, j * sub:(j + 1) * sub] @ Cj.T, 6)
    return qids, qn, lut


def _exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, neighbor_id) candidate
    table: full vectors are read only for the broadcast-selected
    candidate rows; 4-dp rounding and the (score desc, id asc) tie rule
    match :func:`brute_force_topk` exactly.  Shared by both PQ lanes."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"))
    rescored = (
        c.join(F.broadcast(cand.select("query_id", "neighbor_id")),
               "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4)
                .alias("cosine"))
    )
    return topk_by_group(rescored, k).select(
        "query_id", "neighbor_id", "rank", "cosine")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    subspaces: int = PQ_SUBSPACES,
    codebook_stride: int = PQ_CODEBOOK_STRIDE,
    codebook_max: int = PQ_CODEBOOK_MAX,
    cand_factor: int = PQ_CAND_FACTOR,
) -> DataFrame:
    """Approximate top-k via PQ + ADC (asymmetric distance computation),
    exact re-rank: codes are scored against per-query lookup tables
    (``LUT[j][c] = <q_j, codeword_c_j>``, 6-dp-rounded partials), the
    top ``k*cand_factor`` ADC candidates per query are re-ranked by
    exact cosine on the full vectors.  Output shape matches
    :func:`brute_force_topk`.

    Scale shape: the corpus is touched twice — the encode pass (narrow,
    output is the 16-byte code table that REPLACES the vector column
    for scoring) and the candidate re-rank, which reads full vectors
    only for the ~k*cand_factor rows per query the broadcast candidate
    join selects.  ADC scoring itself runs over the code table alone
    (one mapInPandas gather+add per batch, zero shuffle before the
    per-query top-k hash-agg).  The query batch — the SEARCH REQUEST,
    O(|queries|), not corpus data — ships in the scoring closure as its
    LUTs, the faiss search-API shape; the codebook collect is the same
    sanctioned index collect as the IVF centroid table.  In a combined
    IVF+PQ deployment the ADC scan is further cut to the probed cells'
    code lists."""
    _, C = pq_codebook(corpus, id_col=id_col, vec_col=vec_col,
                       codebook_stride=codebook_stride,
                       codebook_max=codebook_max)
    m = subspaces
    codes = pq_encode(corpus, C, id_col=id_col, vec_col=vec_col,
                      subspaces=subspaces)
    qids, qn, lut = _query_luts(queries, C, id_col=id_col, vec_col=vec_col,
                                subspaces=subspaces)
    id_type = dict(corpus.dtypes)[id_col]

    cap = k * cand_factor

    def adc(batches):
        for pdf in batches:
            codes_arr = np.array(pdf["__codes"].tolist())
            nb = len(codes_arr)
            rn = np.sqrt(pdf["__rn2"].to_numpy())
            ids = pdf[id_col].to_numpy()
            dots = np.zeros((len(qids), nb))
            for j in range(m):
                dots += lut[:, j, :][:, codes_arr[:, j]]
            score = np.round(dots / (qn[:, None] * rn[None, :]), 6)
            # per-batch pre-prune: only each query's batch-local top
            # cap candidates leave the batch, so the global per-query
            # aggregation sees O(batches × cap) rows, never O(n) —
            # sound because the global top-cap is a subset of the
            # union of batch-local top-caps.  (-score, ids) ordering
            # keeps the same score-desc / id-asc tie rule.
            q_out, n_out, s_out = [], [], []
            take = min(cap + 1, nb)  # +1: the self-match may rank inside
            for qi in range(len(qids)):
                srow = score[qi]
                part = np.lexsort((ids, -srow))[:take]
                keep = part[ids[part] != qids[qi]][:cap]
                q_out.append(np.full(len(keep), qids[qi]))
                n_out.append(ids[keep])
                s_out.append(srow[keep])
            yield pd.DataFrame({"query_id": np.concatenate(q_out),
                                "neighbor_id": np.concatenate(n_out),
                                "__score": np.concatenate(s_out)})

    scored = codes.mapInPandas(
        adc, f"query_id long, neighbor_id {id_type}, __score double")
    cand = topk_by_group(scored, cap, score_col="__score")
    return _exact_rerank(corpus, queries, cand, k,
                         id_col=id_col, vec_col=vec_col)


# -------- N43: PQ index persistence + incremental maintenance ------------
#
# The ANN-lane mirror of the snapshot lane's N25: at 100 TB you never
# re-encode the corpus.  The code table (16 bytes/vector) plus the
# frozen codebook IS the search index — materialize it once, advance it
# with only the delta.  Soundness is simpler than N25's associative
# merge: under a FROZEN codebook, encoding is a pure function of the
# vector, so the advanced index equals the full re-encode whenever each
# id's latest vector is encoded exactly once — delta-wins + anti-join
# gives that, and re-delivered deltas are idempotent by construction.
# (Re-training the codebook is a REBUILD, not an advance — the same
# boundary faiss draws between add() and train().)

PQ_INDEX_MANIFEST = "_PQ_CODEBOOK.json"


def write_pq_index(
    codes: DataFrame,
    cids: np.ndarray,
    C: np.ndarray,
    path: str,
    *,
    id_col: str = "vec_id",
) -> None:
    """Materialize a PQ index: the code table as parquet plus the
    codebook as a sidecar manifest (through the Hadoop FileSystem, so
    it lands next to the data on any scheme — the shard-writer
    contract).  Codes are written id-sorted within files so delta
    anti-joins and loader scans are spill-friendly."""
    import json

    from hbase_snapshotter_spark.sources.warehouse import (
        _write_text_via_hadoop_fs,
    )

    codes.sortWithinPartitions(id_col).write.mode("overwrite") \
        .parquet(path)
    manifest = {"cids": [int(c) for c in cids],
                "codebook": [[float(x) for x in row] for row in C],
                "id_col": id_col}
    _write_text_via_hadoop_fs(
        codes.sparkSession, f"{path}/{PQ_INDEX_MANIFEST}",
        json.dumps(manifest))


def read_pq_index(spark, path: str):
    """Loader twin: ``(codes, cids, C)``.  The manifest is REQUIRED —
    its absence means the write never completed (the _SUCCESS
    contract); searching codes against a different codebook than the
    one that produced them is silently wrong, which is why the two
    travel together."""
    import json

    from hbase_snapshotter_spark.sources.warehouse import (
        _read_text_via_hadoop_fs,
    )

    manifest = json.loads(
        _read_text_via_hadoop_fs(spark, f"{path}/{PQ_INDEX_MANIFEST}"))
    cids = np.array(manifest["cids"], dtype=np.int64)
    C = np.array(manifest["codebook"], dtype=np.float64)
    return spark.read.parquet(path), cids, C


def advance_pq_index(
    prior_codes: DataFrame,
    delta_vectors: DataFrame,
    C: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str | None = None,
    subspaces: int = PQ_SUBSPACES,
) -> DataFrame:
    """Advance a materialized code table with only the delta: encode
    the delta vectors against the FROZEN codebook and let them win over
    prior rows with the same id (updated vectors re-encode; new vectors
    append; re-delivered unchanged vectors produce identical codes, so
    the advance is idempotent).  Work is one latest-wins reduction +
    narrow encode pass over the delta plus ONE anti-join keyed on id —
    state input is the code table (16 bytes/vector), never the corpus
    vectors.  Equality with the full re-encode is pytest-pinned.

    A delta batch may fold SEVERAL versions of one id (a CDC stream's
    update-then-update); without a reduction both would encode and the
    index would carry a stale ghost code.  Pass ``ts_col`` for genuine
    latest-wins (the N25 ``max(struct(ts, …))`` rule); without it the
    winner is the deterministic struct-max over the vector itself —
    fine for the common append/re-delivery case where same-id rows
    carry the same vector, arbitrary-but-stable otherwise."""
    order = ([F.col(ts_col)] if ts_col else []) + [F.col(vec_col)]
    latest = (
        delta_vectors.groupBy(id_col)
        .agg(F.max(F.struct(*order)).alias("__w"))
        .select(id_col, F.col(f"__w.{vec_col}").alias(vec_col))
    )
    fresh = pq_encode(latest, C, id_col=id_col, vec_col=vec_col,
                      subspaces=subspaces)
    kept = prior_codes.join(latest.select(id_col), id_col, "left_anti")
    return kept.unionByName(fresh)


def retract_pq_index(
    prior_codes: DataFrame,
    deleted_ids: DataFrame,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Retract vectors from a materialized PQ code table (the N94/N97
    deletion posture applied to the ANN index, completing the
    retraction family: non-algebraic views recompute per group, BM25
    and PQ indexes are per-document-decomposable and just drop rows):
    ONE broadcast anti-join on the 16-byte-code table — the corpus
    vectors are never read.  ``retract(encode(C), D) ≡ encode(C ∖ D)``
    exactly, because each row is one vector's codes against the FROZEN
    codebook (pytest-pinned, with serving returning no deleted
    neighbor afterwards).

    The codebook itself stays frozen — still a valid quantizer for the
    surviving corpus (ADC error can only change via distribution
    drift, which the N66 PSI monitor watches); production re-trains it
    on its own cadence, orthogonal to deletes."""
    ids = deleted_ids.select(id_col).distinct()
    return prior_codes.join(F.broadcast(ids), id_col, "left_anti") \
        .select(*prior_codes.columns)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = IVF_CENTROID_STRIDE,
    probe_min: int = IVF_PROBE_MIN,
    probe_frac: float = IVF_PROBE_FRAC,
    probe_cap: int = IVF_PROBE_CAP,
    subspaces: int = PQ_SUBSPACES,
    codebook_stride: int = PQ_CODEBOOK_STRIDE,
    codebook_max: int = PQ_CODEBOOK_MAX,
    cand_factor: int | None = None,
    measured_probe: bool = True,
    cover: float = IVF_COVER_TARGET,
) -> DataFrame:
    """IVF+PQ — the full faiss-IVFPQ architecture as a composition of
    the two lanes: IVF bounds WHICH vectors are scored (adaptive
    multi-probe over coarse cells), PQ bounds what scoring COSTS and
    WEIGHS (ADC over 16-byte codes), and the exact re-rank restores
    full-precision ordering over the candidate set.  At 100 TB this is
    the deployment shape: the per-cell CODE lists are the index
    (memory ∝ 16 bytes/vector), a query touches only its probed cells'
    codes, and full vectors are read for ~k·cand_factor rows per query.

    ``measured_probe`` derives the probe count from the measured
    cell-occupancy perplexity (:data:`IVF_COVER_TARGET`), and
    ``cand_factor=None`` (the default) derives the ADC re-rank depth
    from the measured candidate-pool size: ``max(PQ_CAND_FACTOR,
    ceil(2·√(cover·n)/k))`` — the re-rank budget grows with √pool, so
    quantization-noise rank inversions (whose count grows with the
    pool the ADC must order) stay inside the exactly-re-ranked prefix
    instead of a fixed literal that decays with n (measured top-5
    recall 0.84/0.80/0.92 at sf0.001/0.01/0.1 vs 0.75 fixed at
    sf0.1).  The corpus count behind it is one column-pruned scan
    (metadata-only on plain parquet), O(inputs) next to the ADC pass
    it parameterizes.

    The scored row stream is the broadcast join of probes onto the
    cell-keyed code table — rows carry codes, never vectors; ADC is an
    Arrow-batched LUT gather with the same per-batch pre-prune as
    :func:`pq_topk`.  Output shape matches :func:`brute_force_topk`."""
    if cand_factor is None:
        import math
        n_corpus = corpus.count()
        cand_factor = max(PQ_CAND_FACTOR, math.ceil(round(
            2.0 * math.sqrt(cover * n_corpus) / k, 6)))
    cents = scoped_persist(sampled_centroids(
        corpus, id_col=id_col, vec_col=vec_col,
        centroid_stride=centroid_stride))
    # consumed 2x in measured mode (code attach + occupancy agg)
    assign = scoped_persist(
        assign_to_centroids(corpus, cents, id_col=id_col, vec_col=vec_col))
    _, C = pq_codebook(corpus, id_col=id_col, vec_col=vec_col,
                       codebook_stride=codebook_stride,
                       codebook_max=codebook_max)
    m = subspaces
    codes = pq_encode(corpus, C, id_col=id_col, vec_col=vec_col,
                      subspaces=subspaces).join(assign, id_col)
    probes = probe_centroids(queries, cents, id_col=id_col, vec_col=vec_col,
                             probe_min=probe_min, probe_frac=probe_frac,
                             probe_cap=probe_cap,
                             assignments=assign if measured_probe else None,
                             cover=cover)
    qids, qn, lut = _query_luts(queries, C, id_col=id_col, vec_col=vec_col,
                                subspaces=subspaces)
    qpos = {int(q): i for i, q in enumerate(qids)}
    id_type = dict(corpus.dtypes)[id_col]
    cap = k * cand_factor

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes_arr = np.array(pdf["__codes"].tolist())
            rn = np.sqrt(pdf["__rn2"].to_numpy())
            ids = pdf[id_col].to_numpy()
            qrow = pdf["query_id"].map(qpos).to_numpy()
            dots = np.zeros(len(ids))
            for j in range(m):
                dots += lut[qrow, j, codes_arr[:, j]]
            score = np.round(dots / (qn[qrow] * rn), 6)
            out_q, out_n, out_s = [], [], []
            for q in np.unique(qrow):
                sel = np.nonzero(qrow == q)[0]
                order = sel[np.lexsort((ids[sel], -score[sel]))]
                keep = order[ids[order] != qids[q]][:cap]
                out_q.append(np.full(len(keep), qids[q]))
                out_n.append(ids[keep])
                out_s.append(score[keep])
            if not out_q:
                continue
            yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                "neighbor_id": np.concatenate(out_n),
                                "__score": np.concatenate(out_s)})

    routed = codes.join(F.broadcast(probes), "cell") \
        .select("query_id", id_col, "__codes", "__rn2")
    scored = routed.mapInPandas(
        adc, f"query_id long, neighbor_id {id_type}, __score double")
    cand = topk_by_group(scored, cap, score_col="__score")
    return _exact_rerank(corpus, queries, cand, k,
                         id_col=id_col, vec_col=vec_col)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    margin: float = 0.1,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding-model training
    (SURVEY §2.3 N64): per query, the top-``k`` most similar
    DIFFERENT-label corpus vectors, each with the query's best
    same-label (positive) similarity and the semi-hard verdicts the
    triplet-loss literature actually thresholds (FaceNet, Schroff et
    al. 2015; DPR, Karpukhin et al. 2020):

    - ``pos_sim`` — max cosine over the query's same-label candidates
      (NULL when the query's label is unique in the corpus);
    - ``margin_to_pos = round(pos_sim − cosine, 4)``;
    - ``harder_than_positive`` — the negative outscores the positive
      (the "hardest" regime that makes triplet gradients explode);
    - ``is_semi_hard`` — within ``margin`` below the positive
      (``pos_sim − margin < cosine ≤ pos_sim``), the band mining
      actually keeps.

    Scale shape: identical to :func:`brute_force_topk` — the corpus is
    NEVER shuffled; the (small) query table broadcasts, one scan scores
    every (query, candidate) pair where the candidates live, the
    positive side folds to one row per query via a map-side-combined
    max, and the negative side ranks via the window-free
    :func:`topk_by_group` hash-agg.  The per-query positive row then
    broadcasts back onto the k·|queries| negative rows.  Swap the
    scoring scan for any ANN lane (:func:`ann_lsh_topk`,
    :func:`ivf_topk`) to mine at 100 TB without the exact pass — the
    join/threshold structure is unchanged.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__qlab"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__clab"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (F.col("__clab") == F.col("__qlab")).alias("__same"),
            F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 4)
            .alias("cosine")))
    pos = scored.filter("__same").groupBy("query_id").agg(
        F.max("cosine").alias("pos_sim"))
    negs = topk_by_group(scored.filter(~F.col("__same")), k)
    out = negs.join(F.broadcast(pos), "query_id", "left")
    return out.select(
        "query_id", "neighbor_id",
        F.col("rank").alias("neg_rank"), "cosine", "pos_sim",
        F.round(F.col("pos_sim") - F.col("cosine"), 4).alias("margin_to_pos"),
        (F.col("cosine") > F.col("pos_sim")).alias("harder_than_positive"),
        ((F.col("cosine") > F.col("pos_sim") - F.lit(margin))
         & (F.col("cosine") <= F.col("pos_sim"))).alias("is_semi_hard"))


def truncation_overlap(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trunc_dims: int,
    k: int = 5,
) -> DataFrame:
    """Embedding-truncation audit (SURVEY §2.3 N70): per query, the
    top-k overlap between ranking with only the first ``trunc_dims``
    dimensions and ranking with the full vector — the acceptance test
    for Matryoshka-style dimension reduction (Kusupati et al. 2022)
    before a pipeline swaps in truncated vectors to cut ANN index cost
    ``dims_full/dims_trunc``-fold.

    Output: ``(query_id, n_returned, hits, overlap_at_k)`` with the
    overlap an exact-rational 4-dp fraction of the query's FULL-rank
    list size.  Both rankings are :func:`brute_force_topk` lanes
    (corpus never shuffled, broadcast queries, window-free top-k); the
    overlap join is over two q·k-row tables.  At production scale the
    same audit runs with the ANN lanes on both sides — the
    join/fraction structure is unchanged.
    """
    full = brute_force_topk(corpus, queries, id_col=id_col,
                            vec_col=vec_col, k=k)
    t_corpus = corpus.withColumn("__tv", F.slice(F.col(vec_col), 1,
                                                 trunc_dims))
    t_queries = queries.withColumn("__tv", F.slice(F.col(vec_col), 1,
                                                   trunc_dims))
    trunc = brute_force_topk(t_corpus, t_queries, id_col=id_col,
                             vec_col="__tv", k=k)
    hits = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id").agg(F.count(F.lit(1)).alias("__hits")))
    base = full.groupBy("query_id").agg(F.count(F.lit(1)).alias("__k"))
    joined = (
        base.join(hits, "query_id", "left")
        .withColumn("__hits", F.coalesce("__hits", F.lit(0))))
    a = 20000 * F.col("__hits").cast("long") + F.col("__k").cast("long")
    b = 2 * F.col("__k").cast("long")
    overlap = ((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000
    return joined.select(
        "query_id",
        F.col("__k").cast("int").alias("n_returned"),
        F.col("__hits").cast("int").alias("hits"),
        overlap.alias("overlap_at_k"))


def group_mean_vector(
    df: DataFrame,
    vec_col: str,
    *,
    group_cols: list[str],
    micro: int = 1_000_000,
    offset: int = 1_000_000,
) -> DataFrame:
    """Per-group mean embedding (SURVEY §2.3 N109) — centroid pooling
    as pure built-ins: ``(*group_cols, dim, n_vectors, mean_micro)``
    with the mean in exact half-up micro-units.  This is the
    embedding-side reduce every serving/training pipeline needs
    (label/cluster centroids, chunk→document pooling, class prototypes
    for hard-negative mining) — and float summation order makes a
    naive mean engine-divergent, so elements are fixed-pointed FIRST
    (``round(x·1e6)`` — exact BIGINT sums in any order), then divided
    half-up.

    The ``offset`` (≥ the max |element| in micro-units) keeps every
    intermediate non-negative: Spark's pmod-division and DuckDB's
    ``//`` agree on floor semantics only there (DuckDB truncates
    negatives toward zero), so the mean is computed on shifted values
    and the shift subtracted exactly afterwards.

    Scale: one posexplode (n·d rows) into a map-side-combined hash agg
    — the wire carries ≤ groups × d × partitions partial rows, never
    the vectors."""
    sums = (
        df.select(*group_cols,
                  F.posexplode(vec_col).alias("dim", "__x"))
        .withColumn(
            "__m",
            (F.round(F.col("__x").cast("double") * micro).cast("long")
             + offset))
        .groupBy(*group_cols, "dim")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"),
             F.sum("__m").alias("__s")))
    a = 2 * F.col("__s") + F.col("n_vectors")
    mean_off = ((a - F.pmod(a, 2 * F.col("n_vectors")))
                / (2 * F.col("n_vectors"))).cast("long")
    return sums.select(
        *group_cols, "dim", "n_vectors",
        (mean_off - offset).alias("mean_micro"))


def bitext_margin_pairs(
    emb: DataFrame,
    side_a: Column,
    side_b: Column,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold_x1e6: int = 1_050_000,
) -> DataFrame:
    """Margin-based bitext mining (SURVEY §2.3 N129; Artetxe & Schwenk
    2019, "Margin-based Parallel Corpus Mining with Multilingual
    Sentence Embeddings" — the ratio margin): for each vector of the
    QUERY BATCH ``side_a``, its best candidate from the corpus side
    ``side_b`` with the margin ``cos(x,y) / ((avgk(x→B) + avgk(y→A))
    / 2)`` — the statistic that suppresses hubness: a candidate only
    wins if it is close to x RELATIVE to both neighborhoods, not
    merely close.  ``y→A`` is y's neighborhood within the batch, the
    two-set form the original mines with.

    Exact arithmetic on 4-dp integer cosines: ``margin_x1e6 =
    round(1e6 · 2·cos4·kA·kB / (sumA·kB + sumB·kA))`` with integer
    sums, so both engines replay the ratio bit-for-bit.  Ties break
    toward the smaller candidate id (:func:`topk_by_group`).

    Scale shape: ``side_a`` is a BOUNDED batch (the production run
    mines batch-at-a-time), broadcast into ONE linear scan of the
    corpus side — cosine is symmetric, so that one scored table
    serves both k-NN directions, and everything downstream is
    batch×k-sized.  The corpus-side denominator is computed ONLY for
    the batch's rank-1 candidates: ``scored`` is semi-join-pruned to
    ``best``'s neighbor set (≤ |batch| ids, broadcast) BEFORE the
    ``y→A`` aggregation, so ``den_b`` is batch-sized — never a
    |corpus|-row aggregate or broadcast.  Never a corpus×corpus cross
    join; for corpus-scale batches the candidate generation swaps to
    the IVF machinery (N47) per side with the margin algebra
    unchanged.

    Margin guard: the ratio denominator ``sumA·kB + sumB·kA`` can be
    zero or negative when every top-k cosine of a neighborhood is
    non-positive (anti-correlated embeddings).  Such a pair has no
    meaningful hubness-normalized margin: ``margin_x1e6`` is NULL and
    ``accepted`` FALSE, identically in both engines — never a
    division-by-zero or an inverted (negative-over-negative) margin."""
    from hbase_snapshotter_spark.cache import scoped_persist

    a = emb.filter(side_a).select(F.col(id_col).alias("a_id"),
                                  F.col(vec_col).alias("__av"))
    b = emb.filter(side_b).select(F.col(id_col).alias("b_id"),
                                  F.col(vec_col).alias("__bv"))
    scored = scoped_persist(
        b.crossJoin(F.broadcast(a)).select(
            "a_id", "b_id",
            F.round(cosine_expr(F.col("__av"), F.col("__bv")) * 10000)
            .cast("long").alias("cos4")))
    knn_ab = scoped_persist(topk_by_group(
        scored.select(F.col("a_id").alias("query_id"),
                      F.col("b_id").alias("neighbor_id"),
                      F.col("cos4").alias("cosine")), k))
    best = knn_ab.filter(F.col("rank") == 1)
    # candidate prune: only the batch's rank-1 candidates (≤ |batch|
    # distinct b ids) ever need a y→A denominator — semi-join the
    # scored table down to them BEFORE the corpus-side aggregation so
    # den_b is batch-sized, not |corpus|-sized
    cand = best.select(F.col("neighbor_id").alias("b_id")).distinct()
    knn_ba = topk_by_group(
        scored.join(F.broadcast(cand), "b_id", "left_semi")
        .select(F.col("b_id").alias("query_id"),
                F.col("a_id").alias("neighbor_id"),
                F.col("cos4").alias("cosine")), k)
    den_a = knn_ab.groupBy("query_id").agg(
        F.sum("cosine").alias("__sum_a"),
        F.count(F.lit(1)).alias("__k_a"))
    den_b = (knn_ba.groupBy("query_id")
             .agg(F.sum("cosine").alias("__sum_b"),
                  F.count(F.lit(1)).alias("__k_b"))
             .withColumnRenamed("query_id", "neighbor_id"))
    # den tables are batch-sized k-NN aggregates (den_b candidate-
    # pruned above) — broadcast: the static planner has no stats for
    # aggregate outputs
    den = (F.col("__sum_a") * F.col("__k_b")
           + F.col("__sum_b") * F.col("__k_a"))
    margin = F.when(den > 0, F.round(
        (2.0 * 1_000_000 * F.col("cosine") * F.col("__k_a")
         * F.col("__k_b")) / den).cast("long"))
    return (best.join(F.broadcast(den_a), "query_id")
            .join(F.broadcast(den_b), "neighbor_id")
            .select(
                F.col("query_id").alias("src_id"),
                F.col("neighbor_id").alias("dst_id"),
                (F.col("cosine").cast("double") / 10000).alias("cosine"),
                margin.alias("margin_x1e6"),
                F.coalesce(margin >= margin_threshold_x1e6,
                           F.lit(False)).alias("accepted"))
            .orderBy("src_id"))
