"""SRP geometry auto-tune from MEASURED clusteredness (VERDICT r7
task 4).

The clustered-ANN study (``tools/scale_curve.py --clustered-ann``,
``SCALE_CURVE_ANN_CLUSTERED.json``) proved 15× candidate-fraction
headroom exists on clustered corpora — but only at a deep geometry
(4 tables × 8 bits) that collapses to 0.036 recall on isotropic data.
These tests pin the derivation that replaces the manual knob: a cheap
sampled-pair cosine probe separates the two regimes, the synthetic
clustered corpus auto-selects the deep geometry and clears the 0.7
recall floor at ≤ 0.1 candidate fraction, and the isotropic corpus
(and every fixture-sized corpus) resolves to the measured reference
constants so registered-query hashes are unchanged by measured mode.

Both corpora reproduce the study's generation exactly (same seed,
shape, and cluster tightness), so every number here is deterministic —
the recall/fraction assertions are re-measurements, not tolerances
around a hoped-for value.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.similarity import (
    ANN_BITS_PER_TABLE,
    ANN_TABLES,
    DEEP_BITS,
    DEEP_TABLES,
    LSH_REF_N,
    TIGHT_PAIR_FLOOR,
    ann_lsh_topk,
    brute_force_topk,
    clusteredness_probe,
    random_projections,
    srp_bucket,
    tuned_srp_geometry,
)

N, D, NQ, K_CLUSTERS = 2000, 64, 50, 32


def _corpora():
    # the study's exact generation (tools/scale_curve.py:clustered_ann_report)
    rng = np.random.default_rng(7)
    iso = rng.standard_normal((N, D))
    centers = rng.standard_normal((K_CLUSTERS, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    member = rng.integers(0, K_CLUSTERS, N)
    clu = centers[member] + 0.05 * rng.standard_normal((N, D))
    return iso, clu


def _to_df(spark, arr, parts=8):
    arr = arr / np.linalg.norm(arr, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(arr)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").repartition(parts)


@pytest.fixture(scope="module")
def corpora(spark):
    iso, clu = _corpora()
    iso_df = _to_df(spark, iso).persist()
    clu_df = _to_df(spark, clu).persist()
    iso_df.count(), clu_df.count()
    yield iso_df, clu_df
    iso_df.unpersist()
    clu_df.unpersist()


def test_probe_separates_regimes_and_is_partitioning_independent(
        spark, corpora):
    """The tight-pair fraction lands where geometry predicts: ~1/32 on
    the 32-cluster corpus (same-cluster pair probability), ~0 on
    isotropic d=64 (a 0.7 cosine is a 5.6σ event) — a wide margin on
    BOTH sides of the decision floor.  And the verdict is a property
    of the DATA: re-partitioning must not move it (the md5-permille
    sample + driver-side md5-order cap make it partitioning-blind)."""
    iso_df, clu_df = corpora
    tight_iso = clusteredness_probe(iso_df, n_vectors=N)
    tight_clu = clusteredness_probe(clu_df, n_vectors=N)
    assert tight_iso < TIGHT_PAIR_FLOOR / 2
    assert tight_clu > TIGHT_PAIR_FLOOR * 2
    assert 0.015 < tight_clu < 0.06  # ≈ 1/32 same-cluster mass
    assert clusteredness_probe(clu_df.repartition(3),
                               n_vectors=N) == tight_clu


def test_tuned_geometry_table(corpora):
    """Tight corpora take the deep measured row; loose corpora take
    the ANN reference row; at or below the reference corpus size both
    rows return their base constants exactly (no silent growth), so
    every driver fixture resolves to today's geometry."""
    assert tuned_srp_geometry(N, 0.03) == (DEEP_TABLES, DEEP_BITS)
    assert tuned_srp_geometry(N, 0.0) == (ANN_TABLES, ANN_BITS_PER_TABLE)
    assert tuned_srp_geometry(LSH_REF_N, TIGHT_PAIR_FLOOR) == (
        DEEP_TABLES, DEEP_BITS)
    # growth beyond the reference size follows the occupancy rule on
    # whichever base row was selected
    t_deep, b_deep = tuned_srp_geometry(LSH_REF_N * 8, 0.05)
    assert b_deep == DEEP_BITS + 3 and t_deep > DEEP_TABLES
    t_ref, b_ref = tuned_srp_geometry(LSH_REF_N * 8, 0.0)
    assert b_ref == ANN_BITS_PER_TABLE + 3 and t_ref > ANN_TABLES


def _topsets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _candidate_fraction(emb, q, projections, tables, bits):
    """Scored candidate rows per (query × corpus) pair — the study's
    Σ q_band · c_band measure (multiplicity across tables = the real
    scored-row count before the distinct)."""
    def band_counts(df, alias):
        sig = df.select(srp_bucket(F.col("embedding"), projections).alias("s"))
        return (
            sig.select(F.posexplode(F.array(*[
                F.substring("s", t * bits + 1, bits)
                for t in range(tables)])).alias("tbl", "key"))
            .groupBy("tbl", "key").agg(F.count(F.lit(1)).alias(alias)))
    hit = (band_counts(emb, "c").join(band_counts(q, "qc"), ["tbl", "key"])
           .agg(F.sum(F.col("c") * F.col("qc")).alias("s"))
           .collect()[0].s or 0)
    return hit / (NQ * N)


def test_clustered_corpus_autoselects_deep_geometry_and_clears_floor(
        spark, corpora):
    """The verdict-r7 done-criterion: measured mode on the synthetic
    clustered corpus selects the deep geometry by itself, clears the
    0.7 recall floor vs brute force, and does it at ≤ 0.1 candidate
    fraction — the 15× headroom cashed without a manual knob."""
    _, clu_df = corpora
    q = clu_df.filter(F.col("vec_id") < NQ)
    tight = clusteredness_probe(clu_df, n_vectors=N)
    assert tuned_srp_geometry(N, tight) == (DEEP_TABLES, DEEP_BITS)

    ann = _topsets(ann_lsh_topk(clu_df, q, k=5, geometry="measured"))
    brute = _topsets(brute_force_topk(clu_df, q, k=5))
    hits = sum(len(ann.get(qid, set()) & tv) for qid, tv in brute.items())
    recall = hits / sum(len(tv) for tv in brute.values())
    assert recall >= 0.7

    proj = random_projections(n=DEEP_TABLES * DEEP_BITS)
    frac = _candidate_fraction(clu_df, q, proj, DEEP_TABLES, DEEP_BITS)
    assert frac <= 0.1


def test_isotropic_corpus_resolves_to_reference_constants(spark, corpora):
    """Measured mode on the isotropic corpus is IDENTICAL to fixed
    mode — the probe rejects the deep geometry where it would collapse
    (the study measured 0.036 recall there), so measured mode is safe
    to enable anywhere: it can only deviate where deviation wins."""
    iso_df, _ = corpora
    q = iso_df.filter(F.col("vec_id") < NQ)
    measured = ann_lsh_topk(iso_df, q, k=5, geometry="measured")
    fixed = ann_lsh_topk(iso_df, q, k=5)
    assert measured.exceptAll(fixed).isEmpty()
    assert fixed.exceptAll(measured).isEmpty()
