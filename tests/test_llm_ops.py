"""Unit tests for the LLM-pipeline operators — edge behavior the
oracle-parity suite (test_queries_oracle) doesn't pin."""

import pytest
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from hbase_snapshotter_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_payload,
    decode_payload,
)
from hbase_snapshotter_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
)
from hbase_snapshotter_spark.operators.text import (
    contamination_hits,
    doc_lines,
    line_signals,
    shingles,
    text_features,
    token_lines,
    tokens,
)
from hbase_snapshotter_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different words entirely here now"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "tiny"),                                           # < shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_and_is_deterministic(docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    kept = {r.doc_id for r in out.collect()}
    assert kept == {1, 2, 3, 5}          # doc 4 collapses into doc 1


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(shingles(tokens(F.col("text"))).alias("s")).head()
    assert out.s == []


def test_jaccard_pairs_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             jaccard_pairs(docs, "doc_id", threshold=0.3).collect()}
    assert pairs[(1, 4)] == 1.0           # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_catches_exact_and_is_sound(docs):
    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs(docs, "doc_id", threshold=0.5).collect()}
    # identical docs have identical signatures → guaranteed candidate
    assert (1, 4) in pairs
    # soundness: every emitted pair really clears the exact-Jaccard bar
    exact = {(r.id_a, r.id_b) for r in
             jaccard_pairs(docs, "doc_id", threshold=0.5).collect()}
    assert pairs <= exact
    # (1,2) at j≈0.56 is a ~53% recall coin-flip for 4 bands × 3 rows —
    # deliberately NOT asserted; recall is measured against brute force
    # in the oracle suite, not guaranteed per-pair.


def test_simhash_identical_docs_equal_hash(docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs, "doc_id").collect()}
    assert sh[1] == sh[4]
    assert sh[1] != sh[3]
    assert all(0 <= v < (1 << 48) for v in sh.values())


def test_simhash_pairs_zero_distance_for_dup(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_pairs(docs, "doc_id", max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0


def test_text_features_schema_and_ranges(docs):
    row = {r.doc_id: r for r in text_features(docs, "text", id_cols=["doc_id"]).collect()}
    r1 = row[1]
    assert r1.n_tokens == 9 and r1.n_distinct_tokens == 8    # "the" twice
    assert 0.0 <= r1.quality_score <= 1.0
    assert r1.lang_guess == "en"
    assert row[3].lang_guess == "unknown"


def test_brute_force_topk_selfmatch_excluded(spark):
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(emb, emb.filter("vec_id = 0"), k=2).collect()
    assert all(r.neighbor_id != 0 for r in out)
    assert len(out) == 2
    assert all(abs(r.cosine) < 1e-9 for r in out)  # orthogonal basis


def test_ann_scores_match_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    brute = {(r.query_id, r.neighbor_id): r.cosine
             for r in brute_force_topk(emb, q, k=600).collect()}
    ann = ann_lsh_topk(emb, q, k=5).collect()
    # every ANN hit is scored identically to the exact computation,
    # and per-query results come out rank-ordered
    assert all(brute[(r.query_id, r.neighbor_id)] == r.cosine for r in ann)
    by_q = {}
    for r in sorted(ann, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.cosine)
    assert all(c == sorted(c, reverse=True) for c in by_q.values())


def test_multimodal_payload_roundtrip(docs):
    with_payload = attach_payload(docs, "text")
    meta = with_payload.select("doc_id", "payload", "payload_meta.*").head()
    assert meta.n_bytes == len(bytes(meta.payload))
    decoded = decode_payload(with_payload)
    assert decoded.schema == DECODED_SCHEMA
    rows = {r.doc_id: r for r in decoded.collect()}
    assert rows[1].feature_hash == rows[4].feature_hash    # same payload
    assert 16 <= rows[1].width < 2064 and rows[1].n_frames >= 1


def test_resize_payload_plumbing(docs):
    """Resize plumbing: 1 row in -> 1 row out, binary out, metadata
    recomputed from the NEW bytes, deterministic across repartitioning,
    output size tracks the REQUESTED dims, not the input."""
    from hbase_snapshotter_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        resize_payload,
    )

    wp = attach_payload(docs, "text")
    out = resize_payload(wp, width=64, height=32)
    assert out.schema == RESIZED_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    import hashlib
    for r in rows.values():
        body = bytes(r.payload)
        assert body.endswith(b"|64x32")
        assert len(body) == max(16, 64 * 32 // 64) + len(b"|64x32")
        assert r.content_md5 == hashlib.md5(body).hexdigest()
        assert (r.width, r.height) == (64, 32)
    again = {r.doc_id: bytes(r.payload) for r in
             resize_payload(wp.repartition(5), width=64, height=32).collect()}
    assert again == {k: bytes(v.payload) for k, v in rows.items()}


def test_sample_frames_fanout_and_determinism(docs):
    """Frame sampling: the 1-to-N mapInPandas shape — each payload
    yields exactly min(n_frames, cap) rows, evenly-spaced strictly
    increasing indices starting at frame 0, bytes deterministic."""
    from hbase_snapshotter_spark.operators.multimodal import (
        FRAME_SCHEMA,
        sample_frames,
    )

    wp = attach_payload(docs, "text")
    n_frames = {r.doc_id: r.n_frames for r in decode_payload(wp).collect()}
    frames = sample_frames(wp, max_frames=4)
    assert frames.schema == FRAME_SCHEMA
    by_doc: dict = {}
    for r in frames.collect():
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx,
                                                bytes(r.frame_payload)))
    for doc_id, fs in by_doc.items():
        fs.sort()
        idxs = [i for i, _ in fs]
        assert len(idxs) == min(4, n_frames[doc_id])
        assert idxs[0] == 0 and idxs == sorted(set(idxs))
        assert all(i < n_frames[doc_id] for i in idxs)
    assert set(by_doc) == set(n_frames)
    again = sample_frames(wp.repartition(3), max_frames=4).collect()
    assert sorted((r.doc_id, r.frame_idx, bytes(r.frame_payload))
                  for r in again) \
        == sorted((d, i, b) for d, fs in by_doc.items() for i, b in fs)


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, t long"
    ).select("k", F.timestamp_millis("t").alias("t"))
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 150, "b"), (2, 60, "c")], "k long, rt long, v string"
    ).select("k", F.timestamp_millis("rt").alias("rt"), "v")

    back = {(r.k, r.t.timestamp()): r.v for r in
            asof_join(left, right, "k", left_ts="t", right_ts="rt").collect()}
    assert back[(1, 0.1)] == "a" and back[(1, 0.2)] == "b"
    assert back[(2, 0.05)] is None                      # no right row ≤ t

    fwd = {(r.k, r.t.timestamp()): r.v for r in
           asof_join(left, right, "k", left_ts="t", right_ts="rt",
                     direction="forward").collect()}
    assert fwd[(1, 0.1)] == "b" and fwd[(2, 0.05)] == "c"

    tol = {(r.k, r.t.timestamp()): r.v for r in
           asof_join(left, right, "k", left_ts="t", right_ts="rt",
                     tolerance_ms=20).collect()}
    assert tol[(1, 0.1)] == "a" and tol[(1, 0.2)] is None  # 200-150 > 20


def test_approx_distinct_within_error(spark, sf_dir):
    from hbase_snapshotter_spark.queries.relational import agg_approx_distinct

    rows = agg_approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the 10% / 5% sketch-error contract is computed in-query so the
        # DuckDB oracle can hash-check it (oracle expects TRUE)
        assert r.count_within_tolerance
        # KLL-style quantile sketch at accuracy=1000 on small groups is
        # near-exact; 5% drift allowed
        assert r.median_within_tolerance


def test_bucketed_near_dup_sound_and_recalls(spark, sf_dir):
    """Bucketed LSH near-dup: sound (⊆ exact pairs, identical scores)
    with nontrivial recall on the fixture corpus."""
    from hbase_snapshotter_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_bucketed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b): r.cosine for r in cosine_pairs(emb, threshold=0.4).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in
           cosine_pairs_bucketed(emb, threshold=0.4).collect()}
    assert set(lsh) <= set(exact)
    assert all(exact[p] == lsh[p] for p in lsh)      # same scores on hits
    if exact:
        assert len(lsh) / len(exact) > 0.2           # nontrivial recall


def test_map_functions_surface(spark):
    """N11 map-function coverage (unit-level: MapType values don't
    cross-engine-compare cleanly, so no oracle query)."""
    df = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "id long, k string, v double")
    out = df.select(
        "id",
        F.create_map(F.col("k"), F.col("v")).alias("m"),
    ).select(
        "id",
        F.map_keys("m").alias("keys"),
        F.map_values("m").alias("vals"),
        F.element_at("m", F.lit("a")).alias("a_val"),
        F.map_concat("m", F.create_map(F.lit("x"), F.lit(0.0))).alias("m2"),
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].keys == ["a"] and rows[1].vals == [10.0]
    assert rows[1].a_val == 10.0 and rows[2].a_val is None
    assert set(rows[1].m2) == {"a", "x"}


def test_ivf_scores_match_brute_force(spark, sf_dir):
    from hbase_snapshotter_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    brute = {(r.query_id, r.neighbor_id): r.cosine
             for r in brute_force_topk(emb, q, k=600).collect()}
    ivf = ivf_topk(emb, q, k=5).collect()
    assert len(ivf) > 0
    assert all(brute[(r.query_id, r.neighbor_id)] == r.cosine for r in ivf)


def test_blocked_pairs_equal_broadcast_exact(spark, sf_dir):
    """The distributed block-matrix pair join (no driver collect) must
    reproduce the broadcast exact baseline pair-for-pair, including at
    n_blocks larger than the data spread."""
    from hbase_snapshotter_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_blocked,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b): r.cosine
             for r in cosine_pairs(emb, threshold=0.4).collect()}
    for n_blocks in (1, 4):
        blocked = {(r.id_a, r.id_b): r.cosine
                   for r in cosine_pairs_blocked(
                       emb, threshold=0.4, n_blocks=n_blocks).collect()}
        assert blocked == exact


def test_kmeans_ivf_assignment_valid_and_deterministic(spark, sf_dir):
    """Lloyd's-refined centroids: every vector gets exactly one cell,
    the refinement is deterministic (no RNG), and mean squared cosine
    distance to the assigned centroid does not get worse than the
    sampled-centroid init."""
    from hbase_snapshotter_spark.operators.similarity import (
        assign_to_centroids,
        cosine_expr,
        kmeans_centroids,
        sampled_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 200")

    def mean_cos(cents):
        a = assign_to_centroids(emb, cents)
        joined = (emb.join(a, "vec_id")
                  .join(cents.withColumnRenamed("__cid", "cell"), "cell"))
        return joined.agg(F.avg(cosine_expr(F.col("embedding"), F.col("__cv")))
                          .alias("m")).head().m

    init = sampled_centroids(emb, centroid_stride=31)
    km = kmeans_centroids(emb, centroid_stride=31, iterations=2)
    assign1 = sorted((r.vec_id, r.cell)
                     for r in assign_to_centroids(emb, km).collect())
    assign2 = sorted((r.vec_id, r.cell)
                     for r in assign_to_centroids(emb, km).collect())
    assert assign1 == assign2                       # deterministic
    assert len(assign1) == emb.count()              # total assignment
    assert mean_cos(km) >= mean_cos(init) - 1e-9    # refinement helps


def test_connected_components_clusters(spark):
    from hbase_snapshotter_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    cc = {r.id: r.component for r in
          connected_components(edges, nodes).collect()}
    assert cc[1] == cc[2] == cc[3] == 1     # chain merges to min id
    assert cc[5] == cc[6] == 5
    assert cc[4] == 4 and cc[7] == 7        # singletons keep themselves


def test_deterministic_sampling_is_stable(spark, sf_dir):
    from hbase_snapshotter_spark.operators.sampling import (
        deterministic_sample,
        train_val_test_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 200).collect()}
    s2 = {r.doc_id for r in
          deterministic_sample(docs.repartition(7), "doc_id", 200).collect()}
    assert s1 == s2                                  # partitioning-independent
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n               # ~20%

    # split labels are stable under subsetting (no train/test leakage
    # when data grows or is reprocessed incrementally)
    full = {r.doc_id: r.split for r in train_val_test_split(docs, "doc_id").collect()}
    half = {r.doc_id: r.split for r in
            train_val_test_split(docs.filter("doc_id % 2 = 0"), "doc_id").collect()}
    assert all(full[k] == v for k, v in half.items())


def test_cdc_chunks_edit_robustness(spark):
    """The property content-defined chunking exists for: inserting a
    token reshapes only the chunk containing the edit — chunks after
    the next boundary are IDENTICAL — while the fixed-width token_lines
    view shifts every downstream chunk.  Also: chunking matches a
    pure-Python model, empty docs yield no chunks."""
    import hashlib

    from hbase_snapshotter_spark.operators.text import (
        CDC_BOUNDARY_MOD,
        cdc_chunks,
        token_lines,
        tokens,
    )

    def model(text: str) -> list:
        chunks, cur = [], []
        for t in text.split():
            cur.append(t)
            if int(hashlib.md5(t.encode()).hexdigest()[:4], 16) \
                    % CDC_BOUNDARY_MOD == 0:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        return chunks

    base = " ".join(f"w{i}" for i in range(60))
    edited = " ".join(["w0", "INSERTED"] + [f"w{i}" for i in range(1, 60)])
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "")], "doc_id long, text string")
    out = {r.doc_id: r.c for r in df.select(
        "doc_id", cdc_chunks(tokens(F.col("text"))).alias("c")).collect()}
    assert out[1] == model(base) and out[2] == model(edited)
    assert out[3] == []

    # edit robustness: the chunk sets share their entire tail
    shared = set(out[1]) & set(out[2])
    assert len(shared) >= len(out[1]) - 2  # only the edited chunk differs

    # contrast: fixed-width lines shift — almost nothing survives
    lines = {r.doc_id: r.l for r in df.select(
        "doc_id", token_lines(tokens(F.col("text")), 3).alias("l")).collect()}
    assert len(set(lines[1]) & set(lines[2])) <= 1


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    """Intra-doc line dedup: first occurrence kept, original order
    preserved, later repeats dropped (including non-adjacent ones)."""
    from hbase_snapshotter_spark.operators.text import dedup_lines

    df = spark.createDataFrame(
        [(1, ["b", "a", "b", "c", "a", "b"]),
         (2, ["x"]),
         (3, [])],
        "doc_id long, lines array<string>")
    out = {r.doc_id: r.kept for r in df.select(
        "doc_id", dedup_lines(F.col("lines")).alias("kept")).collect()}
    assert out == {1: ["b", "a", "c"], 2: ["x"], 3: []}


def test_hashed_linear_margin_matches_python_model(spark):
    """fastText-style hashed linear margin vs a pure-Python model:
    md5-bucket lookup, sum of 4-dp weights, repeated tokens counted
    per occurrence."""
    import hashlib

    from hbase_snapshotter_spark.operators.text import (
        classifier_weights,
        hashed_linear_margin,
    )

    w = classifier_weights()

    def model(text: str) -> float:
        total = 0.0
        for tok in text.split():
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % len(w)
            total += w[b]
        return round(total, 4)

    docs = [(i, t) for i, t in enumerate(
        ["the quick brown fox", "the the the", "solo", "a b c d e f"])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.m for r in df.select(
        "doc_id",
        hashed_linear_margin(tokens(F.col("text"))).alias("m")).collect()}
    assert got == {i: model(t) for i, t in docs}


def test_dsir_logratio_hand_computed(spark):
    """DSIR importance score vs hand-computed add-1-smoothed log
    ratios: target = doc 1 ('a a b'), corpus adds doc 2 ('b c');
    V=3, N_t=3, N_all=5."""
    import math

    from hbase_snapshotter_spark.operators.sampling import dsir_logratio

    df = spark.createDataFrame(
        [(1, "a a b", True), (2, "b c", False)],
        "doc_id long, text string, tgt boolean")
    out = {r.doc_id: r.dsir_logratio
           for r in dsir_logratio(df, F.col("tgt")).collect()}
    lr = {"a": math.log(3 / 6) - math.log(3 / 8),   # c_t=2, c_all=2
          "b": math.log(2 / 6) - math.log(3 / 8),   # c_t=1, c_all=2
          "c": math.log(1 / 6) - math.log(2 / 8)}   # c_t=0, c_all=1
    assert out[1] == round((2 * lr["a"] + lr["b"]) / 3, 4)
    assert out[2] == round((lr["b"] + lr["c"]) / 2, 4)
    assert out[1] > 0 > out[2]  # target doc scores above, off-target below


def test_paragraph_dedup_stats_hand_computed(spark):
    """Cross-doc paragraph dedup: global keeper is the smallest
    (id, pos) per paragraph text; in-doc repeats count as dups of the
    first instance; a doc made entirely of paragraphs kept elsewhere
    reports all-dup."""
    from hbase_snapshotter_spark.operators.dedup import paragraph_dedup_stats

    df = spark.createDataFrame(
        [(1, ["p1", "p2", "p1"]),    # p1@{1,0} keeper, p1@{1,2} dup
         (2, ["p2", "p3"]),          # p2 kept at (1,1) -> dup here
         (3, ["p1"])],               # dup of (1,0)
        "doc_id long, paras array<string>")
    out = {r.doc_id: (r.n_paragraphs, r.n_dup_paragraphs)
           for r in paragraph_dedup_stats(df, F.col("paras")).collect()}
    assert out == {1: (3, 1), 2: (2, 1), 3: (1, 1)}


def test_mixture_sample_rates_and_independence(spark, sf_dir):
    """Per-source mixture weighting: observed keep rates track the
    configured permille within hash noise, membership is stable under
    repartitioning, the '#mix' salt decorrelates mixture membership
    from the split buckets (an unsalted reuse would nest the sample
    inside 'train'), and out-of-range rates fail loudly."""
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.sampling import (
        mixture_sample,
        train_val_test_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"src0": 900, "src1": 100}
    out = mixture_sample(docs, "doc_id", "source", rates,
                         default_permille=500)
    rows = train_val_test_split(out, "doc_id").collect()

    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source if r.source in rates else "__rest",
                          []).append(r)
    for src, expect in [("src0", 0.9), ("src1", 0.1), ("__rest", 0.5)]:
        grp = by_src[src]
        frac = sum(r.in_mixture for r in grp) / len(grp)
        assert abs(frac - expect) < 0.25, (src, frac)

    # salt decorrelation: mixture members must span val/test too, not
    # collapse into the low-bucket 'train' prefix
    member_splits = {r.split for r in rows if r.in_mixture}
    assert member_splits == {"train", "val", "test"}

    # partitioning independence
    again = {(r.doc_id, r.in_mixture) for r in
             mixture_sample(docs.repartition(7), "doc_id", "source", rates,
                            default_permille=500).collect()}
    assert again == {(r.doc_id, r.in_mixture) for r in rows}

    with _pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "source", {"src0": 1500})
    with _pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "source", {}, default_permille=-1)


def test_max_df_caps_hot_shingles(spark):
    """SCALE.md's skew story, exercised: a boilerplate n-gram shared by
    every doc makes the inverted-index join O(n^2); max_df drops it,
    collapsing the candidate/pair blowup while genuine near-dups still
    verify with unchanged Jaccard."""
    from hbase_snapshotter_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    boiler = "subscribe to our newsletter today"
    docs = [(i, f"{boiler} unique words number {i} alpha{i} beta{i} gamma{i}")
            for i in range(20)]
    docs += [(100, "the quick brown fox jumps over the lazy dog tonight"),
             (101, "the quick brown fox jumps over the lazy dog today")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = jaccard_pairs(df, "doc_id", threshold=0.0).count()
    capped_pairs = {(r.id_a, r.id_b): r.jaccard
                    for r in jaccard_pairs(df, "doc_id", threshold=0.0,
                                           max_df=5).collect()}
    assert uncapped >= 20 * 19 / 2          # boilerplate joins every pair
    assert len(capped_pairs) < uncapped / 10  # cap kills the blowup
    # the genuine near-dup survives: 7 shared of 9 distinct trigrams
    assert capped_pairs[(100, 101)] == round(7 / 9, 4)

    lsh = {(r.id_a, r.id_b) for r in
           minhash_lsh_pairs(df, "doc_id", threshold=0.3, max_df=5).collect()}
    assert (100, 101) in lsh


def test_sampling_is_total_over_null_keys(spark):
    """NULL keys must get a deterministic bucket (sentinel hash), not
    md5(NULL)=NULL: splits stay total and samples don't silently drop
    NULL-key rows."""
    from hbase_snapshotter_spark.operators.sampling import (
        hash_bucket,
        train_val_test_split,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "k int")
    split = train_val_test_split(df, "k").collect()
    assert len(split) == 3 and all(r.split in ("train", "val", "test") for r in split)
    buckets = df.select(hash_bucket("k").alias("b")).collect()
    assert all(r.b is not None and 0 <= r.b < 1000 for r in buckets)


def test_stratified_exact_sample(spark):
    """N56: exactly min(n, |stratum|) rows per stratum; membership is
    content-derived (identical under repartitioning); the short-band
    fallback (tiny stratum whose hash band can't hold n) still fills
    the allocation; bad n raises."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.sampling import (
        stratified_exact_sample,
    )

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"))
    out = stratified_exact_sample(df, ["g"], 7, key_col="k")
    got = out.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                               F.max("strat_rank").alias("mx")).collect()
    assert {(r.g, r.n, r.mx) for r in got} == {("0", 7, 7), ("1", 7, 7),
                                               ("2", 7, 7)}

    # partitioning independence: same members, same ranks
    a = {(r.g, r.k, r.strat_rank) for r in out.collect()}
    b = {(r.g, r.k, r.strat_rank) for r in stratified_exact_sample(
        df.repartition(17), ["g"], 7, key_col="k").collect()}
    assert a == b

    # tiny stratum (|stratum| < n): everything kept, fallback path
    tiny = spark.createDataFrame(
        [("t", i) for i in range(3)], "g string, k long")
    got_tiny = stratified_exact_sample(
        df.unionByName(tiny), ["g"], 7, key_col="k")
    assert got_tiny.filter(F.col("g") == "t").count() == 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_exact_sample(df, ["g"], 0, key_col="k")


def test_pack_sequences_hand_computed_and_partition_independent(spark):
    """Crammed sequence packing against hand-computed prefix sums: with
    one shard the docs concatenate in id order and cut every `budget`
    tokens (docs may span pack boundaries — the assignment is where the
    doc STARTS); the output is identical under any input partitioning,
    and multi-shard packing respects the partition_cols isolation."""
    from hbase_snapshotter_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 2), (4, 5), (5, 1)], "doc_id long, n int")
    # exclusive prefix sums in id order: 0, 3, 7, 9, 14 -> bins 0,0,1,1,2
    got = {r.doc_id: (r.pack_id, r.pack_offset) for r in pack_sequences(
        df, id_col="doc_id", token_count_col="n", budget=5, num_shards=1
    ).collect()}
    assert got == {1: ("0-0", 0), 2: ("0-0", 3), 3: ("0-1", 2),
                   4: ("0-1", 4), 5: ("0-2", 4)}

    # partition-independence: a different physical layout, same packs
    got2 = {r.doc_id: (r.pack_id, r.pack_offset) for r in pack_sequences(
        df.repartition(7), id_col="doc_id", token_count_col="n",
        budget=5, num_shards=1).collect()}
    assert got2 == got

    # partition_cols isolate logical datasets: each split packs from 0
    df2 = df.withColumn("split", (F.col("doc_id") % 2 == 0).cast("string"))
    by_split = pack_sequences(
        df2, id_col="doc_id", token_count_col="n", budget=5, num_shards=1,
        partition_cols=("split",)).collect()
    starts = {r.doc_id: r.pack_offset for r in by_split}
    # odd ids (3,2,1 tokens -> starts 0,3,5): offsets 0,3,0
    # even ids (4,5 tokens -> starts 0,4): offsets 0,4
    assert starts == {1: 0, 3: 3, 5: 0, 2: 0, 4: 4}
    assert all(r.pack_id.startswith(r.split + "-") for r in by_split)


def test_winnow_fingerprints_match_python_model(spark):
    """Winnowing vs an independent Python model (positional k-gram md5,
    sliding-window min, dedupe), incl. the shared-run guarantee and
    short-document fallbacks."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hbase_snapshotter_spark.operators.text import tokens, winnow_fingerprints

    K, W = 3, 4

    def model(words):
        grams = [" ".join(words[i:i + K]) for i in range(len(words) - K + 1)]
        hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if not hashes:
            return []
        if len(hashes) < W:
            return [min(hashes)]
        seen, out = set(), []
        for i in range(len(hashes) - W + 1):
            m = min(hashes[i:i + W])
            if m not in seen:
                seen.add(m)
                out.append(m)
        return out

    @given(st.lists(st.sampled_from("a b c d e f g h i j".split()),
                    min_size=0, max_size=24))
    @settings(max_examples=20, deadline=None)
    def check(words):
        df = spark.createDataFrame([(" ".join(words),)], "text string")
        got = df.select(
            winnow_fingerprints(tokens(F.col("text")), k=K, window=W).alias("fp")
        ).head().fp
        assert got == model(words)

    check()

    # shared-run guarantee: docs sharing a run of >= W+K-1 tokens
    # share a fingerprint
    a = "x1 x2 common run of six tokens here y1 y2"
    b = "z9 common run of six tokens here z8 z7 z6"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = {r.doc_id: set(r.fp) for r in df.select(
        "doc_id", winnow_fingerprints(tokens(F.col("text")), k=K, window=W).alias("fp")
    ).collect()}
    assert fps[1] & fps[2]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: the union-tag+window as-of join reproduces pandas
    merge_asof for random per-key event/quote times — backward and
    forward, inclusive matches, unmatched rows, multiple keys."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hbase_snapshotter_spark.operators.asof import asof_join

    times = st.lists(st.integers(0, 50), min_size=1, max_size=8)
    keyset = st.sampled_from([("a",), ("a", "b")])

    @given(keyset, times, times, st.sampled_from(["backward", "forward"]))
    @settings(max_examples=20, deadline=None)
    def check(keys, lts, rts, direction):
        left_rows = [(k, t, f"L{k}{i}") for k in keys for i, t in enumerate(lts)]
        right_rows = [(k, t, f"R{k}{t}") for k in keys for t in sorted(set(rts))]
        left = spark.createDataFrame(left_rows, "k string, t long, lid string") \
            .select("k", F.timestamp_millis("t").alias("t"), "lid")
        right = spark.createDataFrame(right_rows, "k string, rt long, v string") \
            .select("k", F.timestamp_millis("rt").alias("rt"), "v")

        got = {(r.k, r.lid): r.v for r in
               asof_join(left, right, "k", left_ts="t", right_ts="rt",
                         direction=direction).collect()}

        lp = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
        rp = pd.DataFrame(right_rows, columns=["k", "rt", "v"]).sort_values("rt")
        merged = pd.merge_asof(lp, rp, left_on="t", right_on="rt",
                               by="k", direction=direction)
        want = {(r.k, r.lid): (None if pd.isna(r.v) else r.v)
                for r in merged.itertuples()}
        assert got == want

    check()


def test_connected_components_matches_union_find(spark):
    """Property: on random graphs (chains, stars, isolated nodes), the
    pointer-jumping label propagation equals a pure-Python union-find,
    with and without shortcutting — and a 40-node chain converges well
    inside the O(log d) round budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hbase_snapshotter_spark.operators.dedup import connected_components

    def union_find(n_nodes, edge_list):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            parent[max(ra, rb)] = min(ra, rb)
        # canonical: min node id in each component
        comp = {}
        for v in range(n_nodes):
            comp.setdefault(find(v), []).append(v)
        return {v: min(members) for members in comp.values() for v in members}

    @given(st.integers(2, 14),
           st.lists(st.tuples(st.integers(0, 13), st.integers(0, 13)),
                    min_size=0, max_size=20),
           st.booleans())
    @settings(max_examples=12, deadline=None)
    def check(n_nodes, raw_edges, shortcut):
        edge_list = [(a % n_nodes, b % n_nodes) for a, b in raw_edges
                     if a % n_nodes != b % n_nodes]
        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
        edges = spark.createDataFrame(edge_list or [(0, 0)],
                                      "id_a long, id_b long")
        if not edge_list:
            edges = edges.filter("id_a <> id_b")  # empty edge set
        got = {r.id: r.component for r in connected_components(
            edges, nodes, id_col="id", shortcut=shortcut).collect()}
        assert got == union_find(n_nodes, edge_list)

    check()

    # chain of 40 nodes: diameter 39; pointer jumping must finish in
    # far fewer rounds than the diameter (budget 30 >> log2(39))
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(
        chain, nodes, id_col="id", max_iterations=12).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_driver_path_equals_loop(spark, monkeypatch):
    """r13: the broadcast-sized driver union-find short-circuit
    (SPARK_GRAFT_CC_DRIVER_EDGES) returns the same rows, schema and
    types as the distributed label-propagation loop — on long ids,
    string ids, and the empty edge set — and cap=0 disables it."""
    from hbase_snapshotter_spark.operators.dedup import connected_components

    cases = [
        ("id long", "id_a long, id_b long",
         [(i,) for i in range(9)],
         [(0, 1), (1, 2), (5, 6), (8, 7), (2, 0)]),
        ("id string", "id_a string, id_b string",
         [(f"d{i}",) for i in range(6)],
         [("d3", "d1"), ("d1", "d5")]),
        ("id long", "id_a long, id_b long", [(1,), (2,)], []),
    ]
    for node_schema, edge_schema, node_rows, edge_list in cases:
        nodes = spark.createDataFrame(node_rows, node_schema)
        edges = spark.createDataFrame(edge_list, edge_schema) if edge_list \
            else spark.createDataFrame([], edge_schema)
        monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGES", "0")
        loop = connected_components(edges, nodes, id_col="id")
        loop_rows = sorted((r.id, r.component) for r in loop.collect())
        monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGES", "131072")
        fast = connected_components(edges, nodes, id_col="id")
        fast_rows = sorted((r.id, r.component) for r in fast.collect())
        assert fast_rows == loop_rows
        assert [(f.name, f.dataType) for f in fast.schema.fields] == \
            [(f.name, f.dataType) for f in loop.schema.fields]


def test_repetition_and_digit_signals(spark):
    """Gopher/C4-style quality signals: positional 2-gram repetition and
    digit-character noise, against hand-computed values."""
    df = spark.createDataFrame(
        [(1, "a b a b a b"),          # grams: ab ba ab ba ab -> 2/5 distinct
         (2, "one"),                  # <2 tokens -> vacuously 0.0
         (3, "room 404 on floor 9")], # 4 digit chars / 19 chars
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           text_features(df, "text", id_cols=["doc_id"]).collect()}
    assert out[1].dup_2gram_ratio == 0.6
    assert out[2].dup_2gram_ratio == 0.0
    assert out[1].digit_char_ratio == 0.0
    assert out[3].digit_char_ratio == round(4 / 19, 4)


def test_line_signals_hand_computed(spark):
    """Gopher line-level signals over real newline-bearing documents:
    duplicate-line fraction, ellipsis-terminated fraction, and mean line
    length against hand-computed values (ASCII '...' and U+2026 both
    count as ellipses; single-line docs are vacuously non-duplicate;
    empty text is one empty line)."""
    df = spark.createDataFrame(
        [(1, "a b\na b\nc"),       # dup 1-2/3, mean (3+3+1)/3
         (2, "wait...\ndone"),     # one of two lines ends with ...
         (3, "x…"),                # single line, unicode ellipsis
         (4, "")],                 # one empty line
        "doc_id long, text string")
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", line_signals(doc_lines("text")).alias("s")).collect()}
    assert out[1] == (round(1 - 2 / 3, 4), 0.0, round(7 / 3, 4))
    assert out[2] == (0.0, 0.5, 5.5)
    assert out[3] == (0.0, 1.0, 2.0)
    assert out[4] == (0.0, 0.0, 0.0)

    # NULL text -> NULL lines array -> ALL THREE signals NULL (not a
    # fabricated 0.0 that would read as "measured clean")
    nrow = (spark.createDataFrame([(None,)], "text string")
            .select(line_signals(doc_lines("text")).alias("s"))
            .collect()[0].s)
    assert nrow == (None, None, None)


def test_token_lines_chunks_and_ragged_tail(spark):
    """token_lines groups consecutive tokens into fixed-width lines,
    keeping a ragged final chunk; short and empty docs degrade to a
    single line."""
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7"), (2, "solo"), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r.l for r in df.select(
        "doc_id", token_lines(tokens(F.col("text")), 3).alias("l")).collect()}
    assert out[1] == ["t1 t2 t3", "t4 t5 t6", "t7"]
    assert out[2] == ["solo"]
    assert out[3] == [""]

    # an EMPTY token array (never produced by tokens(), but legal for a
    # caller-filtered column) must not trip sequence(1, 0)'s descending
    # behavior into phantom lines — it degrades to one empty line
    empty = spark.range(1).select(
        token_lines(F.array().cast("array<string>"), 3).alias("l"))
    assert empty.collect()[0].l == [""]


def test_semdedup_verdicts_consistent(spark, sf_dir):
    """SemDeDup invariants on the registered near-dup-pairs query:
    a pair's b-side is dropped iff it has SOME same-cell lower-id
    partner (not necessarily this pair), so (1) every same_cell pair's
    b is dropped, (2) a dropped b seen on a cross-cell pair must be
    justified by a same-cell pair elsewhere, and (3) the set of kept
    ids per cell always contains that cell's minimum near-dup id."""
    from hbase_snapshotter_spark.queries.llm import embedding_near_dup_pairs

    rows = embedding_near_dup_pairs(spark, sf_dir).collect()
    assert rows  # fixture has near-dup structure by construction
    same_cell_bs = {r.id_b for r in rows if r.same_cell}
    for r in rows:
        assert r.b_sem_dropped == (r.id_b in same_cell_bs)
    # id_a of a same-cell pair is the lower id: it is never itself
    # dropped unless it too has a smaller same-cell partner
    for r in rows:
        if r.same_cell and r.id_a not in same_cell_bs:
            assert r.id_a < r.id_b  # the kept representative


def test_contamination_hits_hand_computed(spark):
    """Benchmark decontamination against hand-computed collisions
    (n=3 for a readable fixture; the registered queries use 13):
    distinct shared grams are counted once even when repeated, docs
    shorter than n can't collide, and clean docs are absent."""
    train = spark.createDataFrame(
        [(1, "a b c d e"),       # shares 'a b c' + 'b c d' with eval
         (2, "b c d b c d x"),   # 'b c d' twice -> counted ONCE
         (3, "z z z z"),         # no overlap
         (4, "a b")],            # shorter than n -> no grams
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string")
    hits = {r.doc_id: r.eval_ngram_hits
            for r in contamination_hits(
                train, eval_df, n=3).collect()}
    assert hits == {1: 2, 2: 1}

    # the eval side is the broadcast build side: the join must plan as
    # a broadcast hash join (no shuffle of the train-side gram explode)
    plan = contamination_hits(train, eval_df, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lsh_geometry_scaling():
    """lsh_geometry: every fixture size resolves to the measured-recall
    constants (hashes unaffected); beyond ref_n bits grow with log2(n)
    holding occupancy in one octave, tables grow to hold pair recall."""
    from hbase_snapshotter_spark.operators.similarity import (
        ANN_BITS_PER_TABLE,
        ANN_TABLES,
        LSH_P1,
        LSH_REF_N,
        NEARDUP_BITS_PER_TABLE,
        NEARDUP_TABLES,
        lsh_geometry,
    )

    # fixture sizes (sf0.001 / 0.01 / 0.1 embeddings) -> today's constants
    for n in (50, 500, 2000, 5000):
        assert lsh_geometry(n) == (NEARDUP_TABLES, NEARDUP_BITS_PER_TABLE)
        assert lsh_geometry(
            n, ref_tables=ANN_TABLES, ref_bits=ANN_BITS_PER_TABLE
        ) == (ANN_TABLES, ANN_BITS_PER_TABLE)

    # beyond ref_n: occupancy n/2^bits bounded in [base, 2*base)
    base = LSH_REF_N / 2 ** NEARDUP_BITS_PER_TABLE
    prev_bits = NEARDUP_BITS_PER_TABLE
    for n in (10_000, 20_000, 100_000, 1_000_000, 10_000_000):
        tables, bits = lsh_geometry(n)
        assert bits >= prev_bits
        prev_bits = bits
        assert base <= n / 2 ** bits < 2 * base

        # analytic pair recall at threshold p1: table growth holds
        # L·p1^bits invariant, so recall can only drift from the
        # reference 1-(1-p)^L down toward the Poisson limit 1-e^{-Lp}
        # (the (1-p)^L -> e^{-Lp} monotone limit as p shrinks) — never
        # below it
        import math

        lp = NEARDUP_TABLES * LSH_P1 ** NEARDUP_BITS_PER_TABLE
        poisson_floor = 1 - math.exp(-lp)
        got_recall = 1 - (1 - LSH_P1 ** bits) ** tables
        assert got_recall >= poisson_floor - 1e-9

    # bits clamp: absurd n never exceeds max_bits
    tables, bits = lsh_geometry(2 ** 40, max_bits=16)
    assert bits == 16


def test_cosine_pairs_bucketed_auto_geometry_subset(spark, sf_dir):
    """Auto geometry (n_vectors beyond ref_n) still emits a SOUND subset
    of the exact pairs with identical scores."""
    from hbase_snapshotter_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_bucketed,
        lsh_geometry,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b): r.cosine
             for r in cosine_pairs(emb, threshold=0.4).collect()}
    # force the auto path to a non-default geometry
    assert lsh_geometry(40_000) != lsh_geometry(500)
    lsh = {(r.id_a, r.id_b): r.cosine
           for r in cosine_pairs_bucketed(
               emb, threshold=0.4, n_vectors=40_000).collect()}
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert cos == exact[pair]


def test_auto_geometry_is_default_above_ref_n(spark, sf_dir):
    """VERDICT r6 task 3: a production caller who passes NO geometry
    knob at all gets occupancy-held auto geometry once the corpus
    exceeds LSH_REF_N — derived from a cheap count, not remembered —
    while fixture-sized corpora resolve to the measured-recall
    reference constants (so registered-query hashes are unchanged)."""
    from hbase_snapshotter_spark.operators.similarity import (
        ANN_BITS_PER_TABLE,
        ANN_PROJECTIONS,
        ANN_TABLES,
        LSH_REF_N,
        NEARDUP_BITS_PER_TABLE,
        NEARDUP_PROJECTIONS,
        NEARDUP_TABLES,
        _resolve_lsh_geometry,
        lsh_geometry,
    )

    # fixture-sized corpus, no knobs -> exactly the reference geometry
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    proj, tables = _resolve_lsh_geometry(
        emb, None, None, None,
        ref_tables=NEARDUP_TABLES, ref_bits=NEARDUP_BITS_PER_TABLE,
        ref_projections=NEARDUP_PROJECTIONS)
    assert proj is NEARDUP_PROJECTIONS and tables == NEARDUP_TABLES

    # >ref_n corpus, still no knobs -> auto geometry engages from the
    # derived count (8x ref_n => +3 bits at held occupancy)
    big = spark.range(8 * LSH_REF_N).select(F.col("id").alias("vec_id"))
    proj, tables = _resolve_lsh_geometry(
        big, None, None, None,
        ref_tables=NEARDUP_TABLES, ref_bits=NEARDUP_BITS_PER_TABLE,
        ref_projections=NEARDUP_PROJECTIONS)
    exp_tables, exp_bits = lsh_geometry(8 * LSH_REF_N)
    assert (tables, len(proj) // tables) == (exp_tables, exp_bits)
    assert exp_bits == NEARDUP_BITS_PER_TABLE + 3

    # caller-supplied n_vectors still wins over the count (no action run)
    proj, tables = _resolve_lsh_geometry(
        big, None, None, 500,
        ref_tables=ANN_TABLES, ref_bits=ANN_BITS_PER_TABLE,
        ref_projections=ANN_PROJECTIONS)
    assert proj is ANN_PROJECTIONS and tables == ANN_TABLES


def test_bigram_lm_xent_hand_computed(spark):
    """Add-one bigram cross-entropy vs hand arithmetic: ref 'a b a b'
    gives c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1, V=2; scoring 'a b c'
    -> p(b|a)=3/4, p(c|b)=1/3 -> mean bits = (log2(4/3)+log2(3))/2 = 1.0."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.lm import bigram_lm_xent

    df = spark.createDataFrame(
        [(1, "a b a b", True), (2, "a b c", False), (3, "x", False)],
        "doc_id long, text string, ref boolean")
    rows = {r.doc_id: r for r in
            bigram_lm_xent(df, F.col("ref")).collect()}
    assert rows[2].n_bigrams == 2
    assert rows[2].lm_xent_bits == 1.0
    # the reference doc scores itself: p(b|a)=3/4 twice, p(a|b)=2/3 once
    import math

    want = round((2 * math.log2(4 / 3) + math.log2(3 / 2)) / 3, 4)
    assert rows[1].lm_xent_bits == want
    assert 3 not in rows  # single-token doc has no bigrams, no row


def test_domain_cap_rates_and_null_domain(spark):
    """domain_cap: small domains pass whole, big domains keep ~cap by
    exact-permille hash rate; NULL domains are one domain, not dropped."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.sampling import domain_cap

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "big")
        .when(F.col("id") < 940, "small")
        .otherwise(F.lit(None)).alias("source"))
    out = domain_cap(df, "doc_id", "source", 50)
    assert out.count() == 1000  # NULL-domain rows survive
    by_dom = {r["source"]: r for r in
              out.groupBy("source").agg(
                  F.sum(F.col("in_domain_cap").cast("int")).alias("kept"),
                  F.first("domain_docs").alias("n")).collect()}
    # under-cap domain (40 < 50): rate caps at 2^32, ALL kept
    assert by_dom["small"].kept == 40 and by_dom["small"].n == 40
    # NULL domain is one over-cap domain (60 docs): rate ~0.83*2^32
    assert by_dom[None].n == 60 and 35 <= by_dom[None].kept <= 60
    # big: rate = floor(50*2^32/900) ~ 5.5%; binomial around 49-50
    assert by_dom["big"].n == 900
    assert 25 <= by_dom["big"].kept <= 80

    # determinism: same flags under different input partitioning
    again = {r.doc_id: r.in_domain_cap
             for r in domain_cap(df.repartition(13), "doc_id", "source", 50)
             .collect()}
    first = {r.doc_id: r.in_domain_cap for r in out.collect()}
    assert first == again


def test_domain_cap_giant_domain_keeps_about_cap_not_zero(spark):
    """Regression: a permille rate floors to 0 for n_d > 1000*cap,
    DELETING the domain; the 2^32-resolution rate must keep ~cap."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.sampling import domain_cap

    df = spark.range(15000).select(
        F.col("id").alias("doc_id"), F.lit("giant").alias("source"))
    kept = (domain_cap(df, "doc_id", "source", 10)
            .filter("in_domain_cap").count())
    # binomial(15000, 10/15000): mean 10, std ~3.2
    assert 1 <= kept <= 25


def test_winnow_overlap_detects_partial_copy(spark):
    """The winnowing guarantee (Schleimer et al.): any shared token run
    of length >= k + window - 1 shares at least one selected
    fingerprint — so a paragraph lifted into an otherwise-different
    document MUST surface as an overlap pair, with containment high for
    the smaller side."""
    from hbase_snapshotter_spark.operators.dedup import winnow_overlap_pairs

    stolen = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, stolen),                                        # the source
        (2, "one two three " + stolen + " four five six seven eight nine"),
        (3, "totally unrelated words with nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r for r in
             winnow_overlap_pairs(df, "doc_id", threshold=0.0).collect()}
    assert (1, 2) in pairs
    # doc 1 is entirely contained in doc 2 -> containment 1.0 for the
    # smaller side (every one of doc 1's fingerprints is shared)
    assert pairs[(1, 2)].containment == 1.0
    assert not any(3 in p for p in pairs)

    # max_df drops boilerplate fingerprints shared by everything
    many = [(i, "common boiler plate line everywhere") for i in range(10, 20)]
    df2 = spark.createDataFrame(rows + many, "doc_id long, text string")
    capped = winnow_overlap_pairs(df2, "doc_id", threshold=0.0, max_df=5)
    assert not [r for r in capped.collect() if r.id_a >= 10 or r.id_b >= 10]


def test_shingle_dup_stats_hand_computed(spark):
    """shingle_dup_stats: shared vs unique shingles on a corpus where
    doc 1 and 2 share one 3-gram and doc 3 is too short for any."""
    from hbase_snapshotter_spark.operators.dedup import shingle_dup_stats

    df = spark.createDataFrame(
        [(1, "a b c d"),      # shingles {a b c, b c d}
         (2, "a b c x"),      # shingles {a b c, b c x}
         (3, "a b")],         # no shingles (< 3 tokens) -> no row
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in shingle_dup_stats(df, "doc_id").collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_shingles"] == 2
        assert out[d]["n_shared_shingles"] == 1  # only 'a b c'
        assert out[d]["dup_shingle_ratio"] == 0.5


def test_cluster_aware_splits_are_leak_free_where_doc_splits_leak(
        spark, sf_dir):
    """The N38 guarantee, checked directly: same-cluster docs share a
    split (so no near-dup pair straddles a boundary), on the same
    fixture where per-doc hashing DOES leak (the N31 audit's 3 pairs)."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from hbase_snapshotter_spark.operators.sampling import (
        train_val_test_split,
    )
    from hbase_snapshotter_spark.queries.llm import (
        MINHASH_BANDS,
        MINHASH_K,
        MINHASH_THRESHOLD,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", num_hashes=MINHASH_K, bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD).collect()
    comp = connected_components(
        spark.createDataFrame(pairs, "id_a long, id_b long, jaccard double")
        .select("id_a", "id_b"),
        docs.select("doc_id"), id_col="doc_id")
    by_cluster = train_val_test_split(comp, "component")
    splits = {r["doc_id"]: r["split"] for r in by_cluster.collect()}
    assert all(splits[a] == splits[b] for a, b, _ in pairs)

    # clusters collapse: every component has exactly one split value
    per = (by_cluster.groupBy("component")
           .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in per)

    # contrast: per-doc hashing leaks on this fixture (N31 found 3)
    doc_splits = {r["doc_id"]: r["split"] for r in
                  train_val_test_split(docs.select("doc_id"), "doc_id")
                  .collect()}
    leaks = sum(1 for a, b, _ in pairs if doc_splits[a] != doc_splits[b])
    assert leaks > 0


def test_pq_scores_match_brute_force_and_recall(spark, sf_dir):
    """PQ + ADC + exact re-rank: every returned pair carries the exact
    4-dp cosine (the re-rank recomputes it on full vectors), results
    are rank-ordered per query, and recall vs brute force clears the
    registered floor on the worst-case isotropic fixture."""
    from hbase_snapshotter_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 20")
    brute_all = {(r.query_id, r.neighbor_id): r.cosine
                 for r in brute_force_topk(emb, q, k=600).collect()}
    brute_top = {(r.query_id, r.neighbor_id)
                 for r in brute_force_topk(emb, q, k=5).collect()}
    pq = pq_topk(emb, q, k=5).collect()
    assert all(brute_all[(r.query_id, r.neighbor_id)] == r.cosine for r in pq)
    by_q = {}
    for r in sorted(pq, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.cosine)
    assert all(c == sorted(c, reverse=True) for c in by_q.values())
    got = {(r.query_id, r.neighbor_id) for r in pq}
    assert len(got & brute_top) / len(brute_top) >= 0.7


def test_pq_encode_deterministic_and_bounded(spark, sf_dir):
    """Codes are positions into the id-sorted codebook (bounded by its
    size), the reconstructed norm is positive, and the encode pass is
    deterministic across runs and input partitionings."""
    from hbase_snapshotter_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cids, C = pq_codebook(emb)
    assert list(cids) == sorted(cids) and len(cids) <= 256
    a = {r["vec_id"]: (list(r["__codes"]), r["__rn2"])
         for r in pq_encode(emb, C).collect()}
    b = {r["vec_id"]: (list(r["__codes"]), r["__rn2"])
         for r in pq_encode(emb.repartition(7), C).collect()}
    assert a == b
    for codes, rn2 in a.values():
        assert len(codes) == 16
        assert all(0 <= c < len(cids) for c in codes)
        assert rn2 > 0


def test_pq_index_roundtrip_and_incremental_advance(spark, sf_dir, tmp_path):
    """N43: the materialized PQ index round-trips (codes + codebook),
    and advancing it with a delta — new vectors, an updated vector, and
    a re-delivered unchanged vector — equals the full re-encode of the
    final corpus, idempotently."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.similarity import (
        advance_pq_index,
        pq_codebook,
        pq_encode,
        read_pq_index,
        write_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cids, C = pq_codebook(emb)
    prior_vecs = emb.filter("vec_id < 400")
    path = str(tmp_path / "pq_index")
    write_pq_index(pq_encode(prior_vecs, C), cids, C, path)
    codes, cids2, C2 = read_pq_index(spark, path)
    assert list(cids2) == list(cids) and (C2 == C).all()
    assert codes.count() == prior_vecs.count()

    # delta: the remaining vectors (new), one updated vector (vec_id 7,
    # negated), one re-delivered unchanged vector (vec_id 3)
    updated = emb.filter("vec_id = 7").withColumn(
        "embedding", F.transform("embedding", lambda x: -x))
    delta = emb.filter("vec_id >= 400") \
        .unionByName(updated) \
        .unionByName(emb.filter("vec_id = 3"))
    advanced = advance_pq_index(codes, delta, C)

    final_corpus = emb.filter("vec_id <> 7").unionByName(updated)
    expect = {r["vec_id"]: (list(r["__codes"]), r["__rn2"])
              for r in pq_encode(final_corpus, C).collect()}
    got = {r["vec_id"]: (list(r["__codes"]), r["__rn2"])
           for r in advanced.collect()}
    assert got == expect
    # idempotent: re-delivering the same delta changes nothing
    again = {r["vec_id"]: (list(r["__codes"]), r["__rn2"])
             for r in advance_pq_index(advanced, delta, C).collect()}
    assert again == expect
    # loader refuses an index whose manifest is missing
    import shutil
    shutil.rmtree(path)
    pq_encode(prior_vecs, C).write.mode("overwrite").parquet(path)
    import pytest as _pytest
    with _pytest.raises(Exception):
        read_pq_index(spark, path)


def test_context_chunks_spans_and_edges(spark):
    """Hand-checked spans at max_len=32/overlap=8 (step 24): boundary
    at n==max_len, the two-chunk case, full coverage, the
    fits-any-span-≤-overlap+1 guarantee, and NULL/empty handling."""
    from hbase_snapshotter_spark.operators.sampling import context_chunks
    import pytest as _pytest

    def toks(n):
        return [f"t{i}" for i in range(n)]

    df = spark.createDataFrame(
        [(1, toks(10)), (2, toks(32)), (3, toks(33)), (4, toks(99)),
         (5, None), (6, [])],
        "doc_id long, toks array<string>")
    out = context_chunks(df, id_col="doc_id", tokens_col="toks",
                         max_len=32, overlap=8)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3, 4}
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[1]] == [(0, 10)]
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[2]] == [(0, 32)]
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[3]] == [(0, 32), (24, 9)]
    assert by_doc[3][1].first_token == "t24" and by_doc[3][1].last_token == "t32"
    # n=99: ceil((99-32)/24)+1 = 4 chunks; the tail reaches the end
    spans = [(r.chunk_start, r.chunk_start + r.chunk_len) for r in by_doc[4]]
    assert spans == [(0, 32), (24, 56), (48, 80), (72, 99)]
    # coverage + the guarantee: every span of length <= overlap+1 fits
    # inside at least one chunk
    covered = set()
    for a, b in spans:
        covered |= set(range(a, b))
    assert covered == set(range(99))
    for s in range(99 - 9):
        assert any(a <= s and s + 9 <= b for a, b in spans)
    with _pytest.raises(ValueError):
        context_chunks(df, id_col="doc_id", tokens_col="toks",
                       max_len=32, overlap=32)
    with _pytest.raises(ValueError):
        context_chunks(df, id_col="doc_id", tokens_col="toks",
                       max_len=0)


def test_advance_pq_index_folded_delta_latest_wins(spark, sf_dir):
    """A delta folding TWO versions of one id must not leave a stale
    ghost code: with ts_col the later version wins (the N25 rule)."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.similarity import (
        advance_pq_index,
        pq_codebook,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, C = pq_codebook(emb)
    prior = pq_encode(emb.filter("vec_id < 100"), C)
    v1 = emb.filter("vec_id = 5").withColumn("ts", F.lit(1))
    v2 = (emb.filter("vec_id = 5")
          .withColumn("embedding", F.transform("embedding", lambda x: -x))
          .withColumn("ts", F.lit(2)))
    delta = v1.unionByName(v2)
    adv = advance_pq_index(prior, delta, C, ts_col="ts")
    got = {r["vec_id"]: list(r["__codes"]) for r in adv.collect()}
    assert len(got) == 100  # exactly one row per id, no ghosts
    v2_only = pq_encode(v2.drop("ts"), C).collect()[0]
    assert got[5] == list(v2_only["__codes"])


def test_bm25_hand_computed_and_edges(spark):
    """BM25 (Lucene idf variant) against a hand-computed model: exact
    scores, tie-break toward smaller id, duplicate query terms
    collapse, no-match docs score 0, NULL text excluded."""
    import math

    from hbase_snapshotter_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish"), (3, "bird bird bird"),
         (4, None)],
        "doc_id long, text string")
    out = bm25_topk(df, ["cat", "cat", "dog"], k=10).collect()
    assert [r.doc_id for r in out][:2] == [1, 2]  # doc1 matches both terms
    rows = {r.doc_id: r for r in out}
    assert set(rows) == {1, 2, 3}
    assert rows[3].score == 0.0 and rows[3].tf_cat == 0
    assert rows[1].tf_cat == 2 and rows[1].tf_dog == 1
    assert "tf_cat" in out[0].asDict() and len(out[0].asDict()) == 4  # deduped

    def idf(n, dfreq):
        return round(math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5)), 6)

    def part(tf, dl, avgdl, n, dfreq, k1=1.2, b=0.75):
        return idf(n, dfreq) * (tf * (k1 + 1)) / (
            tf + k1 * ((1 - b) + b * dl / avgdl))

    n, avgdl = 3, (3 + 2 + 3) / 3
    expect1 = round(part(2, 3, avgdl, n, 2) + part(1, 3, avgdl, n, 1), 4)
    assert rows[1].score == expect1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_indexed_matches_scan_form(spark, sf_dir):
    """VERDICT r6 task 7: the index-backed serving form ranks and
    scores identically to the scan form for every document matching at
    least one query term (zero-match docs are simply absent — an
    inverted index never visits them), on both a hand corpus and the
    fixture with the registered term set."""
    from hbase_snapshotter_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )
    from hbase_snapshotter_spark.queries.llm import BM25_TERMS

    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish"), (3, "bird bird bird"),
         (4, None)],
        "doc_id long, text string")
    postings, header = build_bm25_index(df)
    idx = bm25_topk_indexed(postings, header, ["cat", "dog"], k=10).collect()
    scan = {r.doc_id: r.score
            for r in bm25_topk(df, ["cat", "dog"], k=10).collect()}
    assert [(r.doc_id, r.score) for r in idx] == [
        (d, scan[d]) for d in [r.doc_id for r in idx]]
    assert {r.doc_id for r in idx} == {1, 2}  # doc3 matches nothing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, header = build_bm25_index(docs)
    idx = [(r.doc_id, r.score) for r in
           bm25_topk_indexed(postings, header, BM25_TERMS, k=25).collect()]
    scan = [(r.doc_id, r.score) for r in
            bm25_topk(docs, BM25_TERMS, k=25).collect() if r.score > 0][:25]
    assert idx == scan
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bm25_topk_indexed(postings, header, [])


def test_neardup_state_advance_and_novelty(spark):
    """N57: the persisted band index advances with only the delta
    (advance == rebuild, row-for-row; re-delivery and document-wins
    edits are no-ops/replacements), and novelty classifies an exact
    copy as matched (jaccard 1.0, best = its history twin) while a
    disjoint-text doc is novel with zero candidates."""
    from hbase_snapshotter_spark.operators.dedup import (
        advance_neardup_state,
        build_neardup_state,
        neardup_novelty,
    )

    h = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string")
    d = spark.createDataFrame(
        [(10, "a b c d e f g h"),      # exact copy of doc 1
         (11, "zz yy xx ww vv uu tt")],  # disjoint text -> novel
        "doc_id long, text string")

    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    state = build_neardup_state(h, "doc_id")

    # advance == rebuild over the union; re-delivery is a no-op
    adv = advance_neardup_state(state, d)
    full = build_neardup_state(h.unionByName(d), "doc_id")
    assert rows(adv) == rows(full)
    assert rows(advance_neardup_state(adv, d)) == rows(full)

    # document-wins: an edit of doc 1 replaces its band rows
    edit = spark.createDataFrame(
        [(1, "m n o p q r s t")], "doc_id long, text string")
    re_built = build_neardup_state(
        edit.unionByName(h.filter("doc_id = 2")), "doc_id")
    assert rows(advance_neardup_state(state, edit)) == rows(re_built)

    # novelty: the copy matches its twin; the disjoint doc is novel
    out = {r.doc_id: r for r in neardup_novelty(state, h, d).collect()}
    assert not out[10].is_novel and out[10].n_matches == 1
    assert out[10].best_match_id == 1 and out[10].best_jaccard == 1.0
    assert out[11].is_novel and out[11].n_candidates == 0
    assert out[11].best_match_id is None and out[11].best_jaccard is None


def test_bm25_index_advance_equals_rebuild(spark):
    """Incremental BM25 index maintenance: advancing with a delta
    (new docs + an EDIT of an existing doc) equals the full rebuild
    over the final corpus, row-for-row and header-for-header;
    re-delivering the delta is a no-op; served rankings agree."""
    from hbase_snapshotter_spark.operators.retrieval import (
        advance_bm25_index,
        bm25_topk_indexed,
        build_bm25_index,
    )

    docs0 = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish"), (3, "bird bird")],
        "doc_id long, text string")
    delta = spark.createDataFrame(
        [(2, "cat fish fish shark"),   # edit: replaces doc 2
         (4, "dog shark")],            # new doc
        "doc_id long, text string")
    final = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish fish shark"),
         (3, "bird bird"), (4, "dog shark")],
        "doc_id long, text string")

    p0, _h0 = build_bm25_index(docs0)
    p_adv, h_adv = advance_bm25_index(p0, delta)
    p_full, h_full = build_bm25_index(final)

    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(p_adv) == rows(p_full)
    assert h_adv.collect() == h_full.collect()

    # re-delivery is a no-op
    p_again, h_again = advance_bm25_index(p_adv, delta)
    assert rows(p_again) == rows(p_full)
    assert h_again.collect() == h_full.collect()

    # serving from the advanced index == serving from the rebuild
    assert (bm25_topk_indexed(p_adv, h_adv, ["cat", "shark"], k=10).collect()
            == bm25_topk_indexed(p_full, h_full, ["cat", "shark"], k=10).collect())


def test_rrf_fuse_hand_computed(spark):
    """RRF against hand arithmetic: doc 1 in both lists (rank 1, rank 2
    -> 1/61 + 1/62), doc 2 only in list A (rank 2 -> 1/62), doc 3 only
    in list B (rank 1 -> 1/61); consensus doc wins, then the rank-1
    single, tie-break toward the smaller id; k truncates; empty input
    raises."""
    from hbase_snapshotter_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    out = rrf_fuse([a, b], k=10).collect()
    assert [r.doc_id for r in out] == [1, 3, 2]
    assert out[0].rrf_score == round(1 / 61 + 1 / 62, 6)
    assert out[0].n_lists == 2 and out[1].n_lists == 1
    assert out[1].rrf_score == round(1 / 61, 6)
    assert [r.doc_id for r in rrf_fuse([a, b], k=1).collect()] == [1]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_ivfpq_scores_exact_and_recall_floor(spark, sf_dir):
    """IVF+PQ composition: every returned pair carries the exact 4-dp
    cosine (re-rank on full vectors), and recall vs brute clears the
    floor on the worst-case isotropic fixture (deterministic — no RNG,
    so this is a fixed property, not a flaky bound)."""
    from hbase_snapshotter_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 20")
    brute_all = {(r.query_id, r.neighbor_id): r.cosine
                 for r in brute_force_topk(emb, q, k=600).collect()}
    brute_top = {(r.query_id, r.neighbor_id)
                 for r in brute_force_topk(emb, q, k=5).collect()}
    out = ivfpq_topk(emb, q, k=5).collect()
    assert all(brute_all[(r.query_id, r.neighbor_id)] == r.cosine for r in out)
    got = {(r.query_id, r.neighbor_id) for r in out}
    assert len(got & brute_top) / len(brute_top) >= 0.7


def test_dup_span_stats_hand_computed(spark):
    """ExactSubstr span detection (N52): overlap merge, adjacency
    boundary, within-doc repetition, short docs, and all-unique docs —
    hand-computed with L=3."""
    from hbase_snapshotter_spark.operators.dedup import dup_span_stats

    rows = [
        # "a b c d e" duplicated across 1/2 → two overlapping 3-gram
        # instances per doc merging into ONE 5-token span each side
        (1, "a b c d e x y z"),
        (2, "q a b c d e"),
        # within-doc repetition: "p p p p p" → 3-grams "p p p" ×3 all
        # identical → whole doc covered by one span
        (3, "p p p p p"),
        # shorter than L: no runs, zero duplication
        (4, "u v"),
        # all-unique trigrams: zero duplication
        (5, "m n o r s t"),
        # two DISJOINT duplicated runs separated by unique text: the
        # runs "a b c" (dup with 1/2) and "x y z" (dup with 1) must
        # NOT merge across the gap
        (6, "a b c k1 k2 k3 k4 x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dup_span_stats(df, "doc_id", span_len=3).collect()}

    # doc1: dup 3-grams at pos 1 ("a b c"), 2 ("b c d"), 3 ("c d e"),
    # 6 ("x y z") → spans [1,5] and [6,8]... wait pos6 gram covers 6-8,
    # prev end 5 → adjacent (6 == 5+1) merges.  Covered [1,8] = 8.
    assert out[1]["n_tokens"] == 8
    assert out[1]["n_dup_instances"] == 4
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["n_dup_tokens"] == 8
    # doc2: "a b c d e" at pos 2..4 → one span [2,6] = 5 tokens of 6
    assert (out[2]["n_dup_spans"], out[2]["n_dup_tokens"]) == (1, 5)
    assert out[2]["dup_token_ratio"] == pytest.approx(0.8333)
    # doc3: three identical in-doc instances → one span covering all 5
    assert (out[3]["n_dup_instances"], out[3]["n_dup_spans"],
            out[3]["n_dup_tokens"]) == (3, 1, 5)
    # docs 4/5: no duplication, still present with zeros
    for d in (4, 5):
        assert (out[d]["n_dup_instances"], out[d]["n_dup_tokens"]) == (0, 0)
        assert out[d]["dup_token_ratio"] == 0.0
    # doc6: "a b c" [1,3] and "x y z" [8,10] with a 4-token unique gap
    # → two spans, 6 covered tokens, NOT one merged span
    assert (out[6]["n_dup_spans"], out[6]["n_dup_tokens"]) == (2, 6)


def test_mmr_rerank_hand_computed(spark):
    """MMR greedy against hand arithmetic, one query: rels c10=.9,
    c11=.88, c12=.5; c10–c11 are near-dups (sim .95), everything else
    far (sim .1).  Rank 1 takes c10 (best rel, zero penalty); rank 2
    REORDERS — c11's .95 redundancy drops its score to .331 while c12
    wins with .32? no: .7*.5-.3*.1=.32 < .331 — so c11 still edges it,
    and rank 3 takes c12.  A second variant raises the near-dup sim so
    the diversification actually flips the order, and an exact-tie
    case breaks toward the smaller id.  k truncates; k<1 raises."""
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.88), (1, 12, 0.5)],
        "query_id long, cand_id long, rel double")
    sims = spark.createDataFrame(
        [(1, 10, 11, 0.95), (1, 10, 12, 0.1), (1, 11, 12, 0.1)],
        "query_id long, id_a long, id_b long, sim double")
    out = mmr_rerank(cand, sims, 3).orderBy("rank").collect()
    assert [(r.rank, r.cand_id) for r in out] == [(1, 10), (2, 11), (3, 12)]
    assert (out[0].rel, out[0].div_penalty, out[0].mmr_score) == \
        (0.9, 0.0, round(0.7 * 0.9, 6))
    assert (out[1].div_penalty, out[1].mmr_score) == \
        (0.95, round(0.7 * 0.88 - 0.3 * 0.95, 6))
    assert (out[2].div_penalty, out[2].mmr_score) == \
        (0.1, round(0.7 * 0.5 - 0.3 * 0.1, 6))

    # raise the near-dup redundancy: c11 falls below c12 and the
    # greedy REORDERS by relevance -> diversity
    sims2 = spark.createDataFrame(
        [(1, 10, 11, 0.999), (1, 10, 12, 0.1), (1, 11, 12, 0.1)],
        "query_id long, id_a long, id_b long, sim double")
    got = [(r.rank, r.cand_id)
           for r in mmr_rerank(cand, sims2, 3).orderBy("rank").collect()]
    assert got == [(1, 10), (2, 12), (3, 11)]

    # exact score tie (identical rel, identical penalty) -> smaller id
    tie = spark.createDataFrame(
        [(2, 21, 0.8), (2, 20, 0.8)],
        "query_id long, cand_id long, rel double")
    tsims = spark.createDataFrame(
        [(2, 20, 21, 0.5)], "query_id long, id_a long, id_b long, sim double")
    t = mmr_rerank(tie, tsims, 2).orderBy("rank").collect()
    assert [(r.rank, r.cand_id) for r in t] == [(1, 20), (2, 21)]

    # k beyond the candidate list truncates at |candidates|
    assert mmr_rerank(cand, sims, 99).count() == 3
    with _pytest.raises(ValueError, match="k must be"):
        mmr_rerank(cand, sims, 0)


def test_advance_components_equals_full_rebuild(spark):
    """N62: advancing a materialized components table with delta edges
    equals the full rebuild — a delta edge MERGES two old components
    (label drops to the global min), a new node with an edge joins its
    neighbor's component, a new isolated node stays a singleton, a
    chain of delta edges merges TRANSITIVELY through the super-graph,
    and re-delivering the same delta is a no-op."""
    from hbase_snapshotter_spark.operators.dedup import (
        advance_components,
        connected_components,
    )

    hist_edges = spark.createDataFrame([(1, 2), (5, 6)],
                                       "id_a long, id_b long")
    hist_nodes = spark.createDataFrame([(i,) for i in range(1, 8)],
                                       "id long")
    state = connected_components(hist_edges, hist_nodes)
    # delta: node 8 attaches to 7; 2-3 merges {1,2} with {3}; 3-5 then
    # chains that onto {5,6} (transitive through the super-graph);
    # node 9 arrives isolated
    d_nodes = spark.createDataFrame([(8,), (9,)], "id long")
    d_edges = spark.createDataFrame([(7, 8), (2, 3), (3, 5)],
                                    "id_a long, id_b long")
    adv = {r.id: r.component
           for r in advance_components(state, d_edges, d_nodes).collect()}
    full = {r.id: r.component for r in connected_components(
        hist_edges.unionByName(d_edges),
        hist_nodes.unionByName(d_nodes)).collect()}
    assert adv == full
    assert adv[6] == 1 and adv[8] == 7 and adv[9] == 9

    # re-delivery: the same delta against the advanced state is a no-op
    adv_state = advance_components(state, d_edges, d_nodes)
    again = {r.id: r.component
             for r in advance_components(adv_state, d_edges, d_nodes)
             .collect()}
    assert again == adv

    # empty delta edges: only the new singleton appears
    empty = spark.createDataFrame([], "id_a long, id_b long")
    only9 = spark.createDataFrame([(9,)], "id long")
    base = {r.id: r.component
            for r in advance_components(state, empty, only9).collect()}
    assert base[9] == 9 and base[6] == 5 and base[2] == 1


def test_repetition_signals_hand_computed(spark):
    """N63 Gopher repetition signals: hand-computed char coverage,
    gram-free docs keep zero rows, empty text guarded, flag logic."""
    from hbase_snapshotter_spark.operators.text import repetition_signals

    rows = [
        (1, "a b a b a b"),      # 11 chars, 6 tokens
        (2, "hello"),             # 1 token: no grams at all
        (3, ""),                  # empty: tot = 0 guard
        (4, " ".join(f"w{i}" for i in range(10, 40))),  # all grams unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in repetition_signals(df, "doc_id").collect()}
    assert set(out) == {1, 2, 3, 4}

    # doc 1: top 2-gram "a b" ×3 ×3 chars → 9/11; top 3-gram ×2 ×5 →
    # 10/11; top 4-gram "a b a b" ×2 ×7 → 14/11 (overlapping
    # occurrences counted per occurrence — may exceed 1, documented);
    # no duplicated 5-gram; fewer than 10 tokens → dup10 = 0.
    assert out[1]["top2_char_frac"] == 0.8182
    assert out[1]["top3_char_frac"] == 0.9091
    assert out[1]["top4_char_frac"] == 1.2727
    assert out[1]["dup5_char_frac"] == 0.0
    assert out[1]["dup10_char_frac"] == 0.0
    assert out[1]["repetition_flagged"] is True

    # doc 2 has no n>=2 grams; doc 3 has zero chars — both all-zero,
    # unflagged, and present in the output (left-join row keep).
    for d in (2, 3):
        assert all(out[d][c] == 0.0 for c in out[d] if c.endswith("_frac"))
        assert out[d]["repetition_flagged"] is False

    # doc 4: every gram unique → dup fracs 0; top fracs are one
    # occurrence of one gram over the 119-char doc, all under
    # thresholds (30 tokens × "wNN" + 29 spaces).
    assert out[4]["dup5_char_frac"] == 0.0
    assert out[4]["top2_char_frac"] == 0.0588  # 7/119 half-up
    assert out[4]["repetition_flagged"] is False


def test_hard_negatives_hand_computed(spark):
    """N64: positives/negatives split by label, semi-hard band, ties
    toward smaller id, NULL positive for a unique label."""
    from hbase_snapshotter_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], "A"),   # query
        (1, [1.0, 1.0], "A"),   # positive of 0: cos 0.7071
        (2, [1.0, 0.0], "B"),   # negative, cos 1.0 (harder than pos)
        (3, [1.0, 1.0], "B"),   # negative, cos 0.7071 (semi-hard: margin 0)
        (4, [0.0, 1.0], "B"),   # negative, cos 0.0
        (6, [1.0, 0.0], "Z"),   # query with a corpus-unique label
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, df.filter(F.col("vec_id").isin(0, 6)), k=2)
    got = {(r["query_id"], r["neg_rank"]): r.asDict() for r in out.collect()}
    assert set(got) == {(0, 1), (0, 2), (6, 1), (6, 2)}

    # q0 rank1: ids 2 and 6 both cos 1.0 — smaller id wins.
    r = got[(0, 1)]
    assert (r["neighbor_id"], r["cosine"], r["pos_sim"]) == (2, 1.0, 0.7071)
    assert r["harder_than_positive"] is True and r["is_semi_hard"] is False
    assert r["margin_to_pos"] == -0.2929
    r2 = got[(0, 2)]
    assert (r2["neighbor_id"], r2["cosine"]) == (6, 1.0)

    # q6 has no same-label candidate: positive side is NULL throughout.
    r6 = got[(6, 1)]
    assert r6["neighbor_id"] == 0 and r6["cosine"] == 1.0
    assert r6["pos_sim"] is None and r6["margin_to_pos"] is None
    assert r6["harder_than_positive"] is None and r6["is_semi_hard"] is None


def test_cms_state_hand_replayed(spark):
    """N65 count-min state: python-replayed sketch matches exactly,
    merge is lossless, advance ≡ full build, re-delivery inflates
    (documented non-idempotence), estimates never underestimate."""
    import hashlib
    from collections import Counter

    from hbase_snapshotter_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        advance_cms_state,
        cms_estimates,
        cms_state,
        merge_cms_states,
    )

    rows_a = [("g", t) for t in ["x", "y", "x", "z", "x"]]
    rows_b = [("g", t) for t in ["y", "w"]]
    cols = ["grp", "tok"]
    a = spark.createDataFrame(rows_a, cols)
    b = spark.createDataFrame(rows_b, cols)
    full = spark.createDataFrame(rows_a + rows_b, cols)

    def py_bucket(tok, d):
        h = hashlib.md5(f"{d}|{tok}".encode()).hexdigest()
        return int(h[:8], 16) % CMS_WIDTH

    expect = Counter()
    for _, t in rows_a + rows_b:
        for d in range(CMS_DEPTH):
            expect[("g", d, py_bucket(t, d))] += 1

    def as_set(state):
        return {(r["grp"], r["depth"], r["bucket"], r["cnt"])
                for r in state.collect()}

    full_state = as_set(cms_state(full, "tok", group_cols=["grp"]))
    assert full_state == {(g, d, bkt, c) for (g, d, bkt), c in expect.items()}

    sa = cms_state(a, "tok", group_cols=["grp"])
    merged = as_set(merge_cms_states(
        sa, cms_state(b, "tok", group_cols=["grp"]), group_cols=["grp"]))
    advanced = as_set(advance_cms_state(sa, b, "tok", group_cols=["grp"]))
    assert merged == full_state and advanced == full_state

    # re-delivering b is NOT a no-op (count-sum, unlike HLL register-max)
    twice = as_set(advance_cms_state(
        advance_cms_state(sa, b, "tok", group_cols=["grp"]),
        b, "tok", group_cols=["grp"]))
    assert twice != full_state

    probes = spark.createDataFrame(
        [("g", t) for t in ["x", "y", "w", "absent"]], ["grp", "item"])
    est = {r["item"]: r["est_cnt"]
           for r in cms_estimates(
               cms_state(full, "tok", group_cols=["grp"]), probes, "item",
               group_cols=["grp"]).collect()}
    true = {"x": 3, "y": 2, "w": 1, "absent": 0}
    py_est = {t: min(expect.get(("g", d, py_bucket(t, d)), 0)
                     for d in range(CMS_DEPTH)) for t in true}
    assert est == py_est
    assert all(est[t] >= c for t, c in true.items())


def test_psi_drift_hand_replayed(spark):
    """N66 PSI drift: python-replayed buckets/smoothing/terms match
    exactly; one-era-only groups appear; zero-drift identical sides."""
    import math

    from hbase_snapshotter_spark.operators.profile import psi_drift
    from hbase_snapshotter_spark.operators.sketches import DD_LN_GAMMA

    a_rows = [("g", 1.0)] * 6 + [("g", 2.0)] * 4 + [("h", 3.0)] * 5
    b_rows = [("g", 1.0)] * 2 + [("g", 2.0)] * 8
    cols = ["grp", "v"]
    a = spark.createDataFrame(a_rows, cols)
    b = spark.createDataFrame(b_rows, cols)
    out = {r["grp"]: r.asDict()
           for r in psi_drift(a, b, "v", group_cols=["grp"]).collect()}
    assert set(out) == {"g", "h"}

    def py_psi(ca_by_bucket, cb_by_bucket):
        buckets = set(ca_by_bucket) | set(cb_by_bucket)
        na, nb, nk = (sum(ca_by_bucket.values()), sum(cb_by_bucket.values()),
                      len(buckets))
        micro = 0
        for k in buckets:
            p = (ca_by_bucket.get(k, 0) + 0.5) / (na + 0.5 * nk)
            q = (cb_by_bucket.get(k, 0) + 0.5) / (nb + 0.5 * nk)
            micro += int(round((p - q) * math.log(p / q) * 1e6))
        return (20000 * micro + 1_000_000) // 2_000_000 / 10000

    def bkt(v):
        return math.ceil(round(math.log(v) / DD_LN_GAMMA, 6))

    g_expect = py_psi({bkt(1.0): 6, bkt(2.0): 4}, {bkt(1.0): 2, bkt(2.0): 8})
    assert out["g"]["psi"] == g_expect and out["g"]["n_buckets"] == 2
    assert (out["g"]["n_a"], out["g"]["n_b"]) == (10, 10)

    # group h exists only in era A: PSI vs nothing, still finite
    h_expect = py_psi({bkt(3.0): 5}, {})
    assert out["h"]["psi"] == h_expect and out["h"]["n_b"] == 0
    assert out["h"]["drifted"] is bool(h_expect > 0.2)

    # identical sides → PSI exactly 0, undrifted
    same = psi_drift(a, a, "v", group_cols=["grp"]).collect()
    assert all(r["psi"] == 0.0 and r["drifted"] is False for r in same)


def test_ranking_metrics_hand_computed(spark):
    """N67: recall/precision/MRR/nDCG on a tiny hand-checkable set,
    incl. a zero-relevant query and ranks beyond k ignored."""
    import math

    from hbase_snapshotter_spark.operators.retrieval import ranking_metrics

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "d", 4),  # rank 4 > k
         (2, "x", 1)],
        ["query_id", "neighbor_id", "rank"])
    truth = spark.createDataFrame(
        [(1, "b"), (1, "zzz")], ["query_id", "neighbor_id"])
    out = {r["query_id"]: r.asDict()
           for r in ranking_metrics(ranked, truth, k=3).collect()}
    assert set(out) == {1, 2}

    r1 = out[1]
    assert (r1["hits"], r1["n_relevant"]) == (1, 2)
    assert r1["recall_at_k"] == 0.5
    assert r1["precision_at_k"] == 0.3333
    assert r1["mrr"] == 0.5
    dcg = int(round(1e6 / math.log2(3)))
    idcg = 1_000_000 + int(round(1e6 / math.log2(3)))
    assert r1["ndcg_at_k"] == (20000 * dcg + idcg) // (2 * idcg) / 10000

    # q2 has no relevant docs at all: everything 0, no NULLs
    r2 = out[2]
    assert (r2["hits"], r2["n_relevant"]) == (0, 0)
    assert all(r2[c] == 0.0 for c in
               ("recall_at_k", "precision_at_k", "mrr", "ndcg_at_k"))


def test_loo_categorical_drift_hand_replayed(spark):
    """N68 leave-one-out vocab drift: python-replayed hashed-bucket
    PSI per source; a lone source drifts against an empty rest."""
    import hashlib
    import math

    from hbase_snapshotter_spark.operators.profile import (
        loo_categorical_drift,
    )
    from hbase_snapshotter_spark.operators.sketches import CMS_WIDTH

    def bkt(tok):
        return int(hashlib.md5(f"0|{tok}".encode()).hexdigest()[:8],
                   16) % CMS_WIDTH

    def py_psi(ref, obs):
        buckets = set(ref) | set(obs)
        na, nb, nk = sum(ref.values()), sum(obs.values()), len(buckets)
        micro = 0
        for k in buckets:
            p = (ref.get(k, 0) + 0.5) / (na + 0.5 * nk)
            q = (obs.get(k, 0) + 0.5) / (nb + 0.5 * nk)
            micro += int(round((p - q) * math.log(p / q) * 1e6))
        return (20000 * micro + 1_000_000) // 2_000_000 / 10000

    rows = ([("s1", t) for t in ["a", "a", "b"]]
            + [("s2", t) for t in ["a", "b", "b", "c"]])
    df = spark.createDataFrame(rows, ["src", "tok"])
    out = {r["src"]: r.asDict()
           for r in loo_categorical_drift(df, "tok", source_col="src")
           .collect()}
    assert set(out) == {"s1", "s2"}

    def hist(toks):
        h = {}
        for t in toks:
            h[bkt(t)] = h.get(bkt(t), 0) + 1
        return h

    h1, h2 = hist(["a", "a", "b"]), hist(["a", "b", "b", "c"])
    # grid spans every bucket with corpus mass, for BOTH sources
    union = set(h1) | set(h2)
    full1 = {k: h1.get(k, 0) for k in union}
    full2 = {k: h2.get(k, 0) for k in union}
    assert out["s1"]["psi"] == py_psi(full2, full1)
    assert out["s2"]["psi"] == py_psi(full1, full2)
    assert (out["s1"]["n_rest"], out["s1"]["n_source"]) == (4, 3)

    # a lone source compares against an empty rest — finite, flagged
    lone = loo_categorical_drift(
        spark.createDataFrame([("only", "x")], ["src", "tok"]),
        "tok", source_col="src").collect()
    assert lone[0]["n_rest"] == 0 and lone[0]["psi"] == py_psi(
        {bkt("x"): 0}, {bkt("x"): 1})


def test_constraint_audit_hand_computed(spark):
    """N69 constraint audit: duplicates, NULLs, non-positives, bad
    enum values, and referential orphans all counted exactly."""
    from hbase_snapshotter_spark.operators.profile import (
        constraint_audit,
        referential_orphans,
    )

    parent = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (2, None, 0.0), (3, "d", 1.0)],
        ["pk", "name", "bal"])
    audit = {(r["check_type"], r["col_name"]): r.asDict()
             for r in constraint_audit(
                 parent, "p",
                 complete=["pk", "name"],
                 unique=["pk"],
                 positive=["bal"],
                 accepted={"name": ["a", "b", "d"]}).collect()}
    assert audit[("complete", "pk")]["n_violations"] == 0
    assert audit[("complete", "name")]["n_violations"] == 1
    assert audit[("unique", "pk")]["n_violations"] == 1     # pk 1 twice
    assert audit[("positive", "bal")]["n_violations"] == 2  # -2 and 0
    # NULL is not an accepted value either
    assert audit[("accepted_values", "name")]["n_violations"] == 1
    assert audit[("unique", "pk")]["passed"] is False
    assert all(r["n_rows"] == 4 for r in audit.values())

    child = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 9), (4, None)], ["ck", "fk"])
    ref = referential_orphans(child, "c", "fk", parent, "pk").collect()[0]
    # fk=9 is an orphan; the NULL fk is completeness's job, not counted
    assert (ref["n_rows"], ref["n_violations"], ref["passed"]) == (4, 1, False)


def test_truncation_overlap_hand_computed(spark):
    """N70: truncating dims reorders the ranking; overlap counted
    exactly against the full-dimension top-k."""
    from hbase_snapshotter_spark.operators.similarity import (
        truncation_overlap,
    )

    rows = [
        (0, [1.0, 0.0]),    # query
        (1, [0.1, 1.0]),    # full cos 0.0995; trunc(1d) cos 1.0
        (2, [1.0, 0.1]),    # full cos 0.9950; trunc 1.0
        (3, [0.9, -0.5]),   # full cos 0.8742; trunc 1.0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = truncation_overlap(
        df, df.filter(F.col("vec_id") == 0), trunc_dims=1, k=2).collect()
    r = out[0].asDict()
    # full top-2 = {2, 3}; truncated all-ties resolve to smaller ids
    # {1, 2} -> one common neighbor
    assert (r["n_returned"], r["hits"], r["overlap_at_k"]) == (2, 1, 0.5)


def test_weighted_sample_hand_replayed(spark):
    """N71 A-ES weighted sampling: python-replayed exponential keys,
    ranking, k-truncation, non-positive-weight filter, and
    partitioning independence."""
    import hashlib
    import math

    from hbase_snapshotter_spark.operators.sampling import weighted_sample

    rows = [(i, "g", float(w)) for i, w in
            enumerate([5, 50, 500, 1, 17, 0, -3])]  # 0/-3 filtered
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])

    def es_key(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}|#ws".encode()).hexdigest()[:8], 16)
        u = (h + 1) / (2**32 + 1)
        return round(math.log(u) / w, 9)

    expect = sorted(
        ((es_key(i, w), i, w) for i, _, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]))[:3]
    out = weighted_sample(df, "doc_id", "w", 3, group_col="grp") \
        .orderBy("sample_rank").collect()
    assert [(r["es_key"], r["doc_id"], r["w"]) for r in out] == expect
    assert [r["sample_rank"] for r in out] == [1, 2, 3]

    # same sample under different partitioning
    out2 = weighted_sample(df.repartition(7), "doc_id", "w", 3,
                           group_col="grp").orderBy("sample_rank").collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]

    # ungrouped form: one global sample
    glob = weighted_sample(df, "doc_id", "w", 2).collect()
    assert len(glob) == 2 and "grp" not in glob[0].asDict()


def test_ewma_smooth_hand_computed(spark):
    """N72 integer fixed-point EWMA: exact hand-computed fold,
    single-bucket groups, and the 25% excursion flag."""
    from hbase_snapshotter_spark.operators.timeseries import ewma_smooth

    rows = [("g", 0, 1.0), ("g", 1, 2.0), ("g", 2, 10.0), ("h", 5, 4.0)]
    df = spark.createDataFrame(rows, ["grp", "bucket", "v_lerp"])
    out = {(r["grp"], r["bucket"]): r.asDict()
           for r in ewma_smooth(df, group_cols=["grp"]).collect()}
    # e0 = 1e6; e1 = (7e6 + 2e6 + 4)//8 = 1_125_000;
    # e2 = (7*1_125_000 + 10e6 + 4)//8 = 2_234_375
    assert out[("g", 0)]["ewma"] == 1.0
    assert out[("g", 1)]["ewma"] == 1.125
    assert out[("g", 2)]["ewma"] == 2.234375
    assert out[("g", 1)]["dev_micro"] == 875_000
    # |dev| = 0.875 >= 1.125/4 -> excursion; bucket 0 exact -> not
    assert out[("g", 0)]["is_excursion"] is False
    assert out[("g", 1)]["is_excursion"] is True
    # a single-bucket group is its own EWMA
    assert out[("h", 5)]["ewma"] == 4.0 and out[("h", 5)]["dev_micro"] == 0


def test_char_entropy_hand_computed(spark):
    """N73 char entropy: exact micro-bit values for hand-checkable
    strings; degenerate and empty docs."""
    import math

    from hbase_snapshotter_spark.operators.text import char_entropy_bits

    rows = [(1, "aab"), (2, "aaaa"), (3, ""), (4, "abcdefgh")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["e"]
           for r in df.select("doc_id",
                              char_entropy_bits("text").alias("e"))
           .collect()}

    def py_bits(s):
        if not s:
            return 0.0
        from collections import Counter
        L = len(s)
        micro = sum(
            int(round(-(c / L) * math.log2(c / L) * 1e6))
            for c in Counter(s).values())
        return (20000 * micro + 1_000_000) // 2_000_000 / 10000

    for i, s in rows:
        assert out[i] == py_bits(s), (i, s)
    assert out[2] == 0.0 and out[3] == 0.0
    assert out[4] == 3.0  # 8 equiprobable chars = exactly 3 bits


def test_quantile_rank_normalize_hand_computed(spark):
    """N74 sortless percent_rank: mid-rank in seen buckets, correct
    interior-gap ranks, endpoint clamps for out-of-span values."""
    from hbase_snapshotter_spark.operators.sketches import (
        quantile_rank_normalize,
        quantile_state,
    )

    train = spark.createDataFrame(
        [("g", 1.0)] * 4 + [("g", 100.0)] * 6, ["grp", "v"])
    state = quantile_state(train, "v", group_cols=["grp"])
    test = spark.createDataFrame(
        [("g", i, v) for i, v in
         enumerate([1.0, 100.0, 10.0, 0.5, 10000.0])],
        ["grp", "i", "v"])
    out = {r["i"]: r["q_rank"]
           for r in quantile_rank_normalize(
               test, state, "v", group_cols=["grp"]).collect()}
    assert out[0] == 0.2    # (0 + 4/2) / 10
    assert out[1] == 0.7    # (4 + 6/2) / 10
    assert out[2] == 0.4    # interior gap: below=4, cnt=0
    assert out[3] == 0.0    # below the span
    assert out[4] == 1.0    # above the span


def test_winsorize_hand_computed(spark):
    """N75: clip bounds come from the sketch state's quantile
    estimates; interior values untouched, tails clipped + flagged."""
    from hbase_snapshotter_spark.operators.sketches import (
        dd_quantile_estimates,
        quantile_state,
        winsorize,
    )

    vals = [float(v) for v in range(1, 101)]  # 1..100, one group
    train = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    state = quantile_state(train, "v", group_cols=["grp"])
    b = dd_quantile_estimates(state, [0.05, 0.95],
                              group_cols=["grp"]).collect()[0]
    lo, hi = b["q5_est"], b["q95_est"]
    assert lo < 10 and hi > 90  # sanity: bounds sit in the tails

    out = {r["v"]: r.asDict()
           for r in winsorize(train, state, "v", group_cols=["grp"])
           .collect()}
    assert out[50.0]["v_winsorized"] == 50.0
    assert out[50.0]["was_clipped"] is False
    assert out[1.0]["v_winsorized"] == round(lo, 4)
    assert out[1.0]["was_clipped"] is True
    assert out[100.0]["v_winsorized"] == round(hi, 4)
    assert out[100.0]["was_clipped"] is True


def test_cluster_representatives_hand_computed(spark):
    """N76: highest-quality member wins, ties break to the smaller id,
    singletons represent themselves."""
    from hbase_snapshotter_spark.operators.dedup import (
        cluster_representatives,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["doc_id", "component"])
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.1), (5, 0.6), (6, 0.6)],
        ["doc_id", "quality_score"])
    out = {r["doc_id"]: r.asDict()
           for r in cluster_representatives(comp, quality).collect()}
    assert all(out[d]["representative_id"] == 2 for d in (1, 2, 3))
    assert out[2]["is_representative"] is True
    assert out[1]["is_representative"] is False
    assert out[1]["cluster_size"] == 3
    assert out[4]["representative_id"] == 4  # singleton
    assert out[5]["representative_id"] == 5  # tie -> smaller id
    assert out[6]["is_representative"] is False


def test_epoch_replicate_hand_computed(spark):
    """N77 fractional-epoch replication: copy counts per source,
    deterministic partial-epoch membership, zero-epoch drop, default
    one epoch, stable (key, copy_idx) identity across partitionings."""
    import hashlib

    from hbase_snapshotter_spark.operators.sampling import epoch_replicate

    rows = [(i, "a") for i in range(100)] + \
           [(i, "b") for i in range(100, 200)] + \
           [(200, "c"), (201, "d")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = epoch_replicate(df, "doc_id",
                          {"a": 2.5, "b": 0.0, "c": 1.0}).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])

    def pm(i):
        return int(hashlib.md5(f"{i}|#ep".encode()).hexdigest()[:8],
                   16) % 1000

    # source a: 2 full copies + a third iff permille < 500
    for i in range(100):
        expect = 3 if pm(i) < 500 else 2
        assert sorted(got[i]) == list(range(1, expect + 1)), i
    # source b: zero epochs -> absent entirely
    assert not any(i in got for i in range(100, 200))
    # c explicit 1.0 and d default 1.0: exactly one copy each
    assert got[200] == [1] and got[201] == [1]

    # realized volume ~ f * |source| (deterministic, so exact here)
    n_a = sum(len(v) for k, v in got.items() if k < 100)
    assert n_a == 200 + sum(1 for i in range(100) if pm(i) < 500)

    out2 = epoch_replicate(df.repartition(7), "doc_id",
                           {"a": 2.5, "b": 0.0, "c": 1.0}).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_repetition_overlap_runs_hotter_than_gopher(spark):
    """N63 calibration (VERDICT r7 minor #3): sliding-position
    occurrence counting runs HOTTER than Gopher's non-overlapping
    counting on pathologically self-overlapping text — quantified on
    the crafted doc, and one-sided (overlap >= non-overlap always, so
    the deviation only ever ADDS flags)."""
    from hbase_snapshotter_spark.operators.text import repetition_signals

    # 6 tokens of "a": the 5-gram "a a a a a" occurs at 2 sliding
    # positions; non-overlap counting fits only 1 occurrence.
    df = spark.createDataFrame([(1, "a a a a a a")], ["doc_id", "text"])
    row = repetition_signals(df, "doc_id").collect()[0]
    # overlap counting: 2 occurrences x 9 gram chars / 11 doc chars
    assert row["dup5_char_frac"] == round(18 / 11, 4) > 1.0
    # Gopher's non-overlap mass on the same doc: 1 occurrence x 9 / 11
    gopher_mass = round(9 / 11, 4)
    assert row["dup5_char_frac"] > gopher_mass  # strictly hotter
    assert row["repetition_flagged"] is True    # both countings flag it


def test_batch_padding_length_sorted_beats_arrival(spark, sf_dir):
    """N86's point, asserted: over the same documents, shards, and
    batch size, length-sorted batching pays a strictly smaller padding
    fraction than arrival-order batching (same-length neighbors share
    a max), while both lanes conserve the token totals and batch
    counts (padding changes the BILL, never the content)."""
    from hbase_snapshotter_spark.queries.llm import batching_padding_audit

    rows = {r.policy: r for r in
            batching_padding_audit(spark, sf_dir).collect()}
    assert set(rows) == {"arrival", "length_sorted"}
    a, s = rows["arrival"], rows["length_sorted"]
    assert a.total_tokens == s.total_tokens
    assert a.n_batches == s.n_batches
    assert s.padded_tokens < a.padded_tokens
    assert s.padding_frac < a.padding_frac
    assert 0.0 <= s.padding_frac < a.padding_frac < 1.0


def test_temperature_mixture_flattens_toward_uniform(spark):
    """N89 semantics on a hand-built skew: τ=1 reproduces the raw
    shares, τ=0 is uniform, and 0<τ<1 sits strictly between — rare
    sources gain (factor > 1), dominant sources shed (factor < 1),
    and tempered shares still sum to ~1."""
    from hbase_snapshotter_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    df = spark.createDataFrame(
        [("big",)] * 900 + [("mid",)] * 90 + [("small",)] * 10,
        "source string")
    for tau, check in (
        (1.0, lambda r: abs(r["big"].share_temp - 0.9) < 1e-9),
        (0.0, lambda r: abs(r["big"].share_temp - 1 / 3) < 1e-3),
        (0.7, lambda r: 1 / 3 < r["big"].share_temp < 0.9),
    ):
        rows = {r.source: r for r in temperature_mixture_rates(
            df, source_col="source", tau=tau).collect()}
        assert check(rows), tau
        assert abs(sum(r.share_temp for r in rows.values()) - 1.0) < 1e-2
    rows = {r.source: r for r in temperature_mixture_rates(
        df, source_col="source", tau=0.7).collect()}
    assert rows["small"].upsample_factor > 1.0
    assert rows["big"].upsample_factor < 1.0


def test_epoch_shuffle_interleaves_and_differs_across_epochs(spark):
    """N90 semantics: on a block-ordered input (all of source A first,
    then B), the shuffled order spreads both sources (mean positions
    near 500 permille, max run far below the block length), the
    shuffle is reproducible (same epoch → identical stats), and a
    different epoch produces a DIFFERENT permutation (stats differ)."""
    from hbase_snapshotter_spark.operators.sampling import (
        epoch_shuffle_audit,
    )

    df = spark.createDataFrame(
        [(i, "A" if i < 400 else "B") for i in range(800)],
        "doc_id long, source string")
    kw = dict(id_col="doc_id", source_col="source", num_shards=4)
    rows = lambda e: {r.source: r for r in  # noqa: E731
                      epoch_shuffle_audit(df, epoch=e, **kw).collect()}
    e1 = rows(1)
    for src in ("A", "B"):
        assert e1[src].n_docs == 400
        assert 350 <= e1[src].mean_permille_pos <= 650, src
        assert e1[src].max_run_len < 50, src  # blocks of 400 broken up
    assert {k: tuple(v) for k, v in rows(1).items()} == \
        {k: tuple(v) for k, v in e1.items()}        # reproducible
    e2 = rows(2)
    assert any(tuple(e2[s]) != tuple(e1[s]) for s in ("A", "B"))


def test_bmp_codec_golden_bytes_and_roundtrip():
    """The BMP codec is REAL: a hand-assembled golden file (2x2, 24-bit,
    bottom-up, rows padded 6→8 bytes) decodes to the exact pixels; the
    top-down (negative height) variant and padding-free widths decode
    too; encode→decode roundtrips bit-exactly; non-BMP bytes raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # golden: 2x2 image, stored bottom-up in BGR with 2 pad bytes/row.
    # target (top-down RGB): [[(255,0,0), (0,255,0)], [(0,0,255), (9,8,7)]]
    bottom_row = bytes([255, 0, 0, 7, 8, 9]) + b"\x00\x00"   # blue, (9,8,7)
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"    # red, green
    body = bottom_row + top_row                               # bottom-up!
    golden = (struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body),
                            2835, 2835, 0, 0) + body)
    w, h, px = decode_bmp(golden)
    assert (w, h) == (2, 2)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [9, 8, 7]]]

    # top-down variant: same byte rows, height = -2, rows NOT flipped
    body_td = top_row + bottom_row
    topdown = (struct.pack("<2sIHHI", b"BM", 54 + len(body_td), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0,
                             len(body_td), 2835, 2835, 0, 0) + body_td)
    assert decode_bmp(topdown)[2].tolist() == px.tolist()

    # roundtrip across every padding residue (w*3 % 4 in {0,1,2,3})
    rng = np.random.RandomState(7)
    for w_i in (4, 5, 6, 7):
        orig = rng.randint(0, 256, size=(3, w_i, 3)).astype(np.uint8)
        w2, h2, back = decode_bmp(encode_bmp(orig))
        assert (w2, h2) == (w_i, 3)
        assert np.array_equal(back, orig)

    for bad in (b"", b"PNG....", b"BM" + b"\x00" * 20):
        with _pytest.raises(ValueError):
            decode_bmp(bad)


def test_bmp_decode_features_lane(spark):
    """The Spark bmp lane: synthesized real-BMP payloads decode to the
    id-derived dims/fill/corner — including a doc whose width hits each
    padding residue — and a corrupt payload yields NULLs, not a crash."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_bmp_features,
        synthesize_bmp_payloads,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = decode_bmp_features(synthesize_bmp_payloads(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 24
    for i in range(24):
        w, h = 5 + i % 12, 2 + i % 6
        fill, corner = i % 256, (i * 7 + 1) % 256
        r = rows[i]
        assert (r.bmp_width, r.bmp_height) == (w, h)
        assert r.bmp_corner_pixel == corner
        assert r.bmp_mean_pixel == (fill * (w * h - 1) + corner) / (w * h)

    broken = spark.createDataFrame(
        [(99, bytearray(b"not a bitmap"))], "doc_id long, payload binary")
    r = decode_bmp_features(broken).collect()[0]
    assert r.bmp_width is None and r.bmp_mean_pixel is None


def test_retract_bm25_index_equals_rebuild(spark):
    """BM25 retraction: retract(index(C), D) == index(C \\ D) row for
    row (postings AND header), retracting absent ids is a no-op, and
    retract composes with the document-wins advance."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.retrieval import (
        advance_bm25_index,
        build_bm25_index,
        retract_bm25_index,
    )

    docs = spark.createDataFrame(
        [(1, "red fox ran"), (2, "red dog"), (3, "blue fox fox"),
         (4, "green bird sang loud"), (5, "red red red")],
        "doc_id long, text string")
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    p0, _h0 = build_bm25_index(docs)

    dele = spark.createDataFrame([(2,), (5,)], "doc_id long")
    p1, h1 = retract_bm25_index(p0, dele)
    p_want, h_want = build_bm25_index(docs.filter(~F.col("doc_id").isin(2, 5)))
    assert rows(p1) == rows(p_want)
    assert rows(h1) == rows(h_want)

    # absent ids: no-op (idempotent re-delivery of the delete feed)
    p2, h2 = retract_bm25_index(p1, spark.createDataFrame(
        [(2,), (99,)], "doc_id long"))
    assert rows(p2) == rows(p1) and rows(h2) == rows(h1)

    # composition: retract then advance == rebuild over the final corpus
    new_docs = spark.createDataFrame(
        [(3, "blue blue whale"), (6, "red whale")],  # 3 edited, 6 new
        "doc_id long, text string")
    p3, h3 = advance_bm25_index(p1, new_docs)
    final = docs.filter(~F.col("doc_id").isin(2, 3, 5)).unionByName(new_docs)
    p_final, h_final = build_bm25_index(final)
    assert rows(p3.select("term", "doc_id", "dl", "tf")) == \
        rows(p_final.select("term", "doc_id", "dl", "tf"))
    assert rows(h3) == rows(h_final)


def test_retract_pq_index_equals_reencode(spark, sf_dir):
    """PQ index retraction: retract(encode(C), D) == encode(C \\ D)
    exactly under the frozen codebook; absent ids are a no-op; serving
    from the retracted code table never returns a deleted neighbor;
    retract composes with the delta advance."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.similarity import (
        advance_pq_index,
        pq_codebook,
        pq_encode,
        retract_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _cids, C = pq_codebook(emb)
    codes = pq_encode(emb, C)
    snap = lambda df: {r["vec_id"]: (list(r["__codes"]), r["__rn2"])  # noqa: E731
                       for r in df.collect()}

    dele = emb.filter("vec_id % 11 = 2").select("vec_id")
    r1 = retract_pq_index(codes, dele)
    want = snap(pq_encode(emb.filter("vec_id % 11 <> 2"), C))
    assert snap(r1) == want

    # absent ids: no-op
    gone = spark.createDataFrame([(10**9,)], "vec_id long")
    assert snap(retract_pq_index(r1, gone)) == want

    # compose with the advance: delete then add a new vector
    new_vec = emb.filter("vec_id = 2").withColumn(
        "vec_id", F.lit(900001).cast(dict(emb.dtypes)["vec_id"]))
    r2 = advance_pq_index(r1, new_vec, C)
    final = emb.filter("vec_id % 11 <> 2").unionByName(new_vec)
    assert snap(r2) == snap(pq_encode(final, C))
    assert r2.filter("vec_id % 11 = 2").count() == 0  # served never sees them


def test_png_codec_filters_golden_and_roundtrip():
    """The PNG codec is REAL: hand-assembled scanlines under each
    filter type (None/Sub/Up/Average/Paeth) reconstruct to the exact
    pixels; RGBA roundtrips; a corrupted IDAT CRC and non-PNG bytes
    raise."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    # target 2x2 RGB image
    px = np.array([[[10, 20, 30], [13, 22, 37]],
                   [[12, 25, 40], [16, 30, 50]]], dtype=np.uint8)

    def png_with(rows: bytes) -> bytes:
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(rows))
                + _png_chunk(b"IEND", b""))

    r0, r1 = px[0].flatten().astype(int), px[1].flatten().astype(int)

    # filter 1 (Sub) on row 0: raw[i] = x[i] - x[i-3]
    sub0 = [int(r0[i] - (r0[i - 3] if i >= 3 else 0)) & 0xFF
            for i in range(6)]
    # filter 2 (Up) on row 1: raw[i] = x[i] - prior[i]
    up1 = [(int(r1[i]) - int(r0[i])) & 0xFF for i in range(6)]
    got = decode_png(png_with(
        b"\x01" + bytes(sub0) + b"\x02" + bytes(up1)))[2]
    assert np.array_equal(got, px)

    # filter 3 (Average) row 1: raw[i] = x[i] - (a + b)//2
    avg1 = [(int(r1[i]) - ((int(r1[i - 3]) if i >= 3 else 0)
                           + int(r0[i])) // 2) & 0xFF for i in range(6)]
    got = decode_png(png_with(
        b"\x00" + bytes(r0.astype(np.uint8)) + b"\x03" + bytes(avg1)))[2]
    assert np.array_equal(got, px)

    # filter 4 (Paeth) row 1: predictor of (a, b, c)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    pae1 = [(int(r1[i]) - paeth(int(r1[i - 3]) if i >= 3 else 0,
                                int(r0[i]),
                                int(r0[i - 3]) if i >= 3 else 0)) & 0xFF
            for i in range(6)]
    got = decode_png(png_with(
        b"\x00" + bytes(r0.astype(np.uint8)) + b"\x04" + bytes(pae1)))[2]
    assert np.array_equal(got, px)

    # RGBA roundtrip through our own encoder
    rng = np.random.RandomState(11)
    rgba = rng.randint(0, 256, size=(4, 3, 4)).astype(np.uint8)
    w, h, back = decode_png(encode_png(rgba))
    assert (w, h) == (3, 4) and np.array_equal(back, rgba)

    # corrupted IDAT CRC must raise (flip one body byte)
    good = encode_png(px)
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 4] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(b"GIF89a....")


def test_png_decode_features_lane(spark):
    """The Spark png lane: synthesized real-PNG payloads decode to the
    id-derived dims/fill/corner; a corrupt payload yields NULLs."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png_payloads,
    )

    docs = spark.range(0, 45).select(F.col("id").alias("doc_id"))
    out = decode_png_features(synthesize_png_payloads(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 45
    for i in range(45):
        w, h = 4 + i % 9, 3 + i % 5
        fill, corner = (3 * i) % 256, (5 * i + 2) % 256
        r = rows[i]
        assert (r.png_width, r.png_height) == (w, h)
        assert r.png_corner_pixel == corner
        assert r.png_mean_pixel == (fill * (w * h - 1) + corner) / (w * h)

    broken = spark.createDataFrame(
        [(7, bytearray(b"\x89PNG\r\n\x1a\nnot really"))],
        "doc_id long, payload binary")
    r = decode_png_features(broken).collect()[0]
    assert r.png_width is None and r.png_mean_pixel is None


def test_wav_codec_golden_bytes_and_chunk_walk():
    """The WAV codec is REAL: a hand-assembled RIFF file with a junk
    chunk BEFORE fmt/data and an odd-length chunk (exercising the RIFF
    pad byte) decodes to the exact samples; stereo roundtrips; non-PCM
    and truncated payloads raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = np.array([[100], [-200], [300]], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    data = b"data" + struct.pack("<I", 6) + samples.tobytes()
    body = b"WAVE" + junk + b"fmt " + struct.pack("<I", 16) + fmt + data
    golden = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, ch, x = decode_wav(golden)
    assert (sr, ch) == (8000, 1)
    assert x.tolist() == [[100], [-200], [300]]

    rng = np.random.RandomState(5)
    st = rng.randint(-30000, 30000, size=(7, 2)).astype(np.int16)
    sr, ch, back = decode_wav(encode_wav(st, 44100))
    assert (sr, ch) == (44100, 2) and np.array_equal(back, st)

    float_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bad = b"RIFF" + struct.pack("<I", 28) + b"WAVE" \
        + b"fmt " + struct.pack("<I", 16) + float_fmt \
        + b"data" + struct.pack("<I", 0)
    with _pytest.raises(ValueError):
        decode_wav(bad)  # IEEE-float WAV: unsupported, loud
    with _pytest.raises(ValueError):
        decode_wav(b"OggS....")
    with _pytest.raises(ValueError):
        decode_wav(golden[:-2])  # truncated data chunk


def test_wav_decode_features_lane(spark):
    """The Spark wav lane: synthesized real-WAV payloads decode to the
    id-derived rate/frames/amplitude stats; corrupt payloads yield
    NULLs."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_wav_features,
        synthesize_wav_payloads,
    )

    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = decode_wav_features(synthesize_wav_payloads(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 30
    for i in range(30):
        amp, n, sr = 100 + i % 900, 80 + i % 50, 8000 + 100 * (i % 5)
        r = rows[i]
        assert (r.wav_sample_rate, r.wav_channels, r.wav_n_frames) == (sr, 1, n)
        assert r.wav_duration_ms == n * 1000 // sr
        assert r.wav_peak == amp and r.wav_rms == float(amp)

    broken = spark.createDataFrame(
        [(3, bytearray(b"RIFFxxxxWAVEincomplete"))],
        "doc_id long, payload binary")
    r = decode_wav_features(broken).collect()[0]
    assert r.wav_sample_rate is None and r.wav_rms is None


def test_cms_join_size_python_replayed(spark):
    """N103 join-size estimator: the estimate equals the python-replayed
    min-over-depth inner product of the two sketches, never
    underestimates the exact join size, is exact when the key sets are
    collision-free at the test width, and NULL keys are excluded on
    both sides (an equi join never matches them)."""
    import hashlib
    from collections import Counter

    from hbase_snapshotter_spark.operators.sketches import (
        CMS_DEPTH,
        cms_join_size,
    )

    rows_a = [(k,) for k in [1, 1, 1, 2, 2, 3, None]]
    rows_b = [(k,) for k in [1, 2, 2, 4, None]]
    a = spark.createDataFrame(rows_a, "k bigint")
    b = spark.createDataFrame(rows_b, "k bigint")
    exact = 3 * 1 + 2 * 2  # key 1: 3x1, key 2: 2x2, keys 3/4 unmatched
    W = 64

    def sketch(rows):
        c = Counter()
        for (k,) in rows:
            if k is None:
                continue
            for d in range(CMS_DEPTH):
                h = hashlib.md5(f"{d}|{k}".encode()).hexdigest()
                c[(d, int(h[:8], 16) % W)] += 1
        return c

    sa, sb = sketch(rows_a), sketch(rows_b)
    expect = min(
        sum(sa[(d, bkt)] * sb.get((d, bkt), 0) for _, bkt in
            [key for key in sa if key[0] == d])
        for d in range(CMS_DEPTH))
    est = cms_join_size(a, "k", b, "k", width=W).head().est_rows
    assert est == expect
    assert est >= exact
    # wide enough that the 4 distinct keys can't collide -> exact
    est_wide = cms_join_size(a, "k", b, "k", width=2**30).head().est_rows
    assert est_wide == exact


def test_avi_codec_container_walk_and_roundtrip():
    """N105: the AVI codec is REAL — random frames roundtrip through
    the nested RIFF/LIST tree bit-for-bit (both padded and pad-free
    strides); an unknown chunk inside movi is skipped; a frame-count
    mismatch, a compressed strf, a non-vids stream, and truncation all
    raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.RandomState(7)
    for w in (5, 8):  # stride 16 (padded) and 24 (pad-free)
        frames = rng.randint(0, 256, size=(3, 4, w, 3)).astype(np.uint8)
        usec, dw, dh, back = decode_avi(encode_avi(frames, 33333))
        assert (usec, dw, dh) == (33333, w, 4)
        assert np.array_equal(back, frames)

    # insert a junk chunk into movi: decoder must skip it
    frames = rng.randint(0, 256, size=(2, 2, 2, 3)).astype(np.uint8)
    b = bytearray(encode_avi(frames, 40000))
    movi_at = bytes(b).index(b"movi")
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    b[movi_at + 4:movi_at + 4] = junk
    # fix the two enclosing sizes (LIST movi, RIFF)
    (movi_len,) = struct.unpack_from("<I", b, movi_at - 4)
    struct.pack_into("<I", b, movi_at - 4, movi_len + len(junk))
    (riff_len,) = struct.unpack_from("<I", b, 4)
    struct.pack_into("<I", b, 4, riff_len + len(junk))
    _u, _w, _h, back = decode_avi(bytes(b))
    assert np.array_equal(back, frames)

    with _pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # wrong form type
    with _pytest.raises(ValueError):
        decode_avi(encode_avi(frames, 40000)[:-5])  # truncated frame
    # frame-count mismatch: drop one movi frame but keep avih count
    good = encode_avi(frames, 40000)
    stride_bytes = 2 * ((2 * 3 + 3) & ~3)
    cut = good.index(b"00db")
    short = bytearray(good[:cut] + good[cut + 8 + stride_bytes:])
    (riff_len,) = struct.unpack_from("<I", short, 4)
    struct.pack_into("<I", short, 4, riff_len - 8 - stride_bytes)
    movi_at2 = bytes(short).index(b"movi")
    (ml,) = struct.unpack_from("<I", short, movi_at2 - 4)
    struct.pack_into("<I", short, movi_at2 - 4, ml - 8 - stride_bytes)
    with _pytest.raises(ValueError):
        decode_avi(bytes(short))
    # short avih / strf bodies must raise ValueError, not escape as
    # struct.error (ADVICE r9)
    def _chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    short_avih = _chunk(b"RIFF", b"AVI " + _chunk(
        b"LIST", b"hdrl" + _chunk(b"avih", b"\x00" * 8)))
    with _pytest.raises(ValueError, match="avih body too short"):
        decode_avi(short_avih)
    short_strf = _chunk(b"RIFF", b"AVI " + _chunk(
        b"LIST", b"hdrl" + _chunk(b"avih", b"\x00" * 56) + _chunk(
            b"LIST", b"strl" + _chunk(b"strh", b"vids")
            + _chunk(b"strf", b"\x00" * 4))))
    with _pytest.raises(ValueError, match="strf body too short"):
        decode_avi(short_strf)


def test_avi_frame_sampling_lane(spark):
    """The Spark video lane: synthesized real-AVI payloads yield 4
    evenly-spaced real frames per doc with id-replayable means; a
    corrupt payload yields one NULL-feature row; the fan-out count is
    exact."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.multimodal import (
        sample_avi_frame_features,
        synthesize_avi_payloads,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = sample_avi_frame_features(synthesize_avi_payloads(docs))
    rows = out.collect()
    assert len(rows) == 24 * 4
    by_key = {(r.doc_id, r.frame_idx): r for r in rows}
    for i in range(24):
        n, h, w = 5 + i % 8, 3 + i % 3, 6 + 2 * (i % 4)
        usec = 40000 + 1000 * (i % 5)
        for j in range(4):
            idx = (j * n) // 4
            r = by_key[(i, idx)]
            assert (r.avi_width, r.avi_height, r.avi_n_frames) == (w, h, n)
            assert r.avi_duration_ms == n * usec // 1000
            assert r.frame_mean_milli == 1000 * ((31 * i + 7 * idx) % 256)
    corrupt = spark.createDataFrame(
        [(99, bytearray(b"not an avi"))], "doc_id long, payload binary")
    null_row = sample_avi_frame_features(corrupt).collect()
    assert len(null_row) == 1 and null_row[0].avi_width is None


def test_pareto_frontier_hand_computed(spark):
    """N107 skyline semantics on a hand grid (maximize x, minimize y):
    interior dominated points drop, equal-x-worse-y and equal-y-worse-x
    drop (one strict coordinate suffices), duplicate coordinate pairs
    MERGE onto the frontier (neither dominates), and the sharded sweep
    equals the dominance definition regardless of shard count."""
    from hbase_snapshotter_spark.operators.sampling import pareto_frontier

    rows = [
        ("g", 1, 10, 5), ("g", 2, 10, 5),   # duplicate pair, frontier
        ("g", 3, 10, 7),                     # equal-x worse-y: dominated
        ("g", 4, 8, 7),                      # strictly dominated by (10,5)
        ("g", 5, 12, 9),                     # frontier (more x, more y)
        ("g", 6, 11, 9),                     # equal-y worse-x: dominated
        ("g", 7, 4, 2),                      # frontier (least y)
        ("h", 8, 1, 1),                      # other group: own frontier
    ]
    df = spark.createDataFrame(
        rows, "grp string, doc_id long, x long, y long")

    def run(shards):
        out = pareto_frontier(df, group_cols=["grp"], max_col="x",
                              min_col="y", id_col="doc_id",
                              n_shards=shards)
        return {(r.grp, r.x, r.y): (r.n_rows, r.rep_id)
                for r in out.collect()}

    expect = {("g", 10, 5): (2, 1), ("g", 12, 9): (1, 5),
              ("g", 4, 2): (1, 7), ("h", 1, 1): (1, 8)}
    for shards in (1, 4, 32):
        assert run(shards) == expect


def test_pareto_frontier_advance_equals_rebuild(spark):
    """N107 incremental form: advancing a history frontier with only
    the delta equals the full rebuild — a delta point can displace
    state points, a dominated delta point vanishes, and duplicate
    pairs across state and delta merge counts exactly."""
    from hbase_snapshotter_spark.operators.sampling import (
        advance_pareto_frontier,
        pareto_frontier,
    )

    hist_rows = [("g", 1, 10, 5), ("g", 2, 8, 3), ("g", 3, 6, 6)]
    delta_rows = [
        ("g", 4, 12, 4),   # displaces (10,5): dominates it strictly
        ("g", 5, 7, 9),    # dominated by everything relevant: vanishes
        ("g", 6, 8, 3),    # duplicate of a surviving state pair
    ]
    schema = "grp string, doc_id long, x long, y long"
    hist = spark.createDataFrame(hist_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    kw = dict(group_cols=["grp"], max_col="x", min_col="y",
              id_col="doc_id")
    state = pareto_frontier(hist, **kw)
    adv = {(r.grp, r.x, r.y): (r.n_rows, r.rep_id)
           for r in advance_pareto_frontier(state, delta, **kw).collect()}
    full = {(r.grp, r.x, r.y): (r.n_rows, r.rep_id)
            for r in pareto_frontier(hist.unionAll(delta), **kw).collect()}
    assert adv == full
    assert ("g", 10, 5) not in adv           # displaced by the delta
    assert adv[("g", 12, 4)] == (1, 4)
    assert adv[("g", 8, 3)] == (2, 2)        # counts merged, min rep


def test_join_strategy_advisor_rules(spark):
    """N103 advisor verdict: broadcast wins when the smaller side fits
    (side chosen correctly), the salted plan triggers on either side's
    hot key past the permille threshold (including exactly-at-threshold
    NOT triggering), sort-merge is the balanced fallback."""
    from hbase_snapshotter_spark.queries.relational import (
        ADVISOR_BROADCAST_ROWS as B,
    )
    from hbase_snapshotter_spark.queries.relational import (
        advisor_strategy_col,
    )

    rows = [
        ("small_right", 500000, B, 10, 10),
        ("small_left", B - 1, 500000, 10, 10),
        ("hot_left", 100000, 200000, 5001, 10),     # 5001/100000 > 50/1000
        ("at_threshold", 100000, 200000, 5000, 10),  # == 50 permille: no
        ("hot_right", 100000, 200000, 10, 10001),
        ("balanced", 100000, 200000, 10, 10),
    ]
    df = spark.createDataFrame(
        rows, "pair string, n_left long, n_right long, "
              "max_rows_left long, max_rows_right long")
    out = {r.pair: r.strategy for r in
           df.withColumn("strategy", advisor_strategy_col()).collect()}
    assert out == {
        "small_right": "broadcast_right",
        "small_left": "broadcast_left",
        "hot_left": "salted_shuffle",
        "at_threshold": "sort_merge",
        "hot_right": "salted_shuffle",
        "balanced": "sort_merge",
    }


def test_group_mean_vector_exact_and_partition_invariant(spark):
    """N109 centroid pooling: fixed-point means match the hand
    rational (half-up at the exact .5 boundary, NEGATIVE means
    included — the offset keeps floor semantics consistent), and the
    result is independent of partitioning because integer sums
    commute."""
    from hbase_snapshotter_spark.operators.similarity import (
        group_mean_vector,
    )

    rows = [
        ("a", [0.5, -0.5]),
        ("a", [0.5, -0.25]),      # dim1 mean: (-500000-250000)/2 half-up
        ("b", [-0.000001, 0.0]),  # tiny negative mean
        ("b", [-0.000002, 0.0]),
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<double>")

    def got(d):
        return {(r.g, r.dim): (r.n_vectors, r.mean_micro)
                for r in group_mean_vector(
                    d, "embedding", group_cols=["g"]).collect()}

    out = got(df)
    assert out[("a", 0)] == (2, 500000)
    # (-500000 + -250000) = -750000; /2 = -375000 exactly
    assert out[("a", 1)] == (2, -375000)
    # (-1 + -2)/2 = -1.5 micro -> half-up (toward +inf) = -1
    assert out[("b", 0)] == (2, -1)
    assert out[("b", 1)] == (2, 0)
    assert got(df.repartition(7)) == out


def test_langid_confusion_hand_computed(spark, sf_dir, tmp_path):
    """N110 eval lane: confusion counts and exact-permille shares on a
    hand corpus — the en>de>es>fr argmax priority on ties, the
    no-marker 'unknown' bucket (the zh case), and the per-actual share
    normalization."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.queries.llm import langid_confusion

    rows = [
        (1, "en", "the cat and the dog"),        # en markers -> en
        (2, "en", "der hund ist gross"),         # de markers -> de (miss)
        (3, "de", "der die das"),                # -> de
        (4, "zh", "mao he gou"),                 # no markers -> unknown
        (5, "fr", "le chat est la"),             # fr+es tie? le/est are fr
        (6, "en", "the und"),                    # en==de==1 -> en priority
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text").cast("double")) \
     .write.parquet(f"{d}/documents.parquet")
    out = {(r.actual_lang, r.predicted_lang): r
           for r in langid_confusion(spark, d).collect()}
    assert out[("en", "en")].n_docs == 2
    assert out[("en", "de")].n_docs == 1
    assert out[("en", "en")].share_permille == 667  # 2/3 half-up
    assert out[("de", "de")].n_docs == 1 and out[("de", "de")].correct
    assert out[("zh", "unknown")].n_docs == 1
    assert not out[("zh", "unknown")].correct
    assert out[("fr", "fr")].n_docs == 1


def test_link_rank_hand_computed(spark):
    """N115 exact-integer link centrality on a star + pair: a python
    replay of the synchronous half-up rounds matches bit-for-bit, the
    star's hub out-ranks its leaves, the isolated pair lands on the
    closed-form two-cycle fixed point, and mass is conserved up to
    per-edge rounding."""
    from hbase_snapshotter_spark.operators.dedup import link_rank

    edges = [(1, 2), (1, 3), (1, 4),   # star: hub 1
             (8, 9)]                   # isolated pair
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.id: r for r in link_rank(df, iters=5).collect()}

    # python replay of the exact recurrence
    from collections import defaultdict
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    r = {v: 1_000_000 for v in nbrs}
    for _ in range(5):
        nxt = {v: 150_000 for v in nbrs}
        for u in nbrs:
            deg = len(nbrs[u])
            share = (2 * 17 * r[u] + 20 * deg) // (40 * deg)
            for v in nbrs[u]:
                nxt[v] += share
        r = nxt
    assert {v: x.rank_micro for v, x in out.items()} == r
    assert out[1].rank_micro > out[2].rank_micro  # hub beats leaf
    assert out[2].rank_micro == out[3].rank_micro == out[4].rank_micro
    assert out[8].rank_micro == out[9].rank_micro
    assert out[1].degree == 3 and out[8].degree == 1
    # two-cycle: r = 150000 + 0.85*r -> fixed point 1e6 (uniform stays)
    assert abs(out[8].rank_micro - 1_000_000) <= 5
    total = sum(x.rank_micro for x in out.values())
    assert abs(total - 6 * 1_000_000) <= 5 * len(edges) * 2  # rounding


def test_triangle_stats_hand_computed(spark):
    """N116 on K4 + pendant: every K4 vertex closes all 3 of its
    triangles (coefficient 1000 permille), the vertex carrying the
    pendant closes 3 of its 6 wedges (500), the pendant closes none
    (NULL below degree 2), and each triangle is counted exactly once
    by the ordered-wedge join (global count = 4 for K4)."""
    from hbase_snapshotter_spark.operators.dedup import triangle_stats

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.id: r for r in triangle_stats(df).collect()}
    for v in (1, 2, 3):
        assert (out[v].degree, out[v].n_triangles,
                out[v].clustering_permille) == (3, 3, 1000)
    assert (out[4].degree, out[4].n_triangles,
            out[4].clustering_permille) == (4, 3, 500)
    assert (out[5].degree, out[5].n_triangles,
            out[5].clustering_permille) == (1, 0, None)
    # Σ per-vertex counts = 3 × global triangles (each counted thrice)
    assert sum(r.n_triangles for r in out.values()) == 3 * 4


def test_triangle_stats_degree_ordered_vs_brute(spark):
    """The degree-ordered wedge join (VERDICT r9 task 1) is a counting
    strategy, not a semantics change: on a hub-skewed random graph the
    per-vertex triangle counts equal the O(n³) brute-force definition
    exactly — including a high-degree hub whose wedges now enumerate
    at its low-degree spokes."""
    from itertools import combinations

    from hbase_snapshotter_spark.operators.dedup import triangle_stats

    # hub 0 tied to everyone, plus a deterministic sparse remainder
    n = 24
    edges = {(0, v) for v in range(1, n)}
    edges |= {(a, b) for a in range(1, n) for b in range(a + 1, n)
              if (a * 7 + b * 13) % 5 == 0}
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {v: sum(1 for x, y in combinations(sorted(adj[v]), 2)
                   if y in adj[x]) for v in range(n)}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    out = {r.id: r for r in triangle_stats(df).collect()}
    assert {v: r.n_triangles for v, r in out.items()} == \
        {v: c for v, c in want.items() if adj[v]}
    assert out[0].degree == n - 1  # the hub really is skewed


def test_shared_shingle_edges_max_df_bounds_join(spark):
    """The similarity-graph guard (VERDICT r9 task 1): one boilerplate
    shingle pasted into 10% of docs makes the uncapped inverted-index
    self-join quadratic in the hot df; with ``max_df`` the hot shingle
    is dropped, candidate pairs collapse to the organic overlaps, and
    the surviving edges are exactly the uncapped edges minus
    hot-shingle-only evidence."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.dedup import (
        _shingle_sets,
        shared_shingle_edges,
    )

    boiler = "subscribe to our newsletter today"
    rows = []
    for i in range(100):
        body = f"doc {i} body token{i % 4} alpha beta gamma token{i % 4}"
        text = f"{boiler} {body}" if i % 10 == 0 else body
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def candidate_pairs(max_df):
        s = _shingle_sets(df, "doc_id", "text", 3, max_df)
        dfreq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("d"))
        return dfreq.select(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
            .alias("p")).collect()[0].p

    uncapped, capped = candidate_pairs(None), candidate_pairs(5)
    # the 10-doc boilerplate block alone is C(10,2)=45 pairs *per
    # boilerplate shingle*; capping removes every one of them
    assert uncapped - capped >= 45 * 3
    assert capped <= uncapped - 45 * 3

    e_un = {(r.id_a, r.id_b): r.n_shared
            for r in shared_shingle_edges(df, "doc_id",
                                          min_shared=3).collect()}
    e_cap = {(r.id_a, r.id_b): r.n_shared
             for r in shared_shingle_edges(df, "doc_id", min_shared=3,
                                           max_df=5).collect()}
    # capped edges are a subset with evidence counts <= uncapped
    for k, v in e_cap.items():
        assert k in e_un and v <= e_un[k]
    # and the boilerplate-only pairs are gone: docs 0 and 10 share
    # ONLY the boilerplate shingles
    assert (0, 10) in e_un and (0, 10) not in e_cap


def test_advance_shingle_edges_equals_rebuild(spark):
    """N122 incremental similarity-graph maintenance: advancing the
    materialized (shingle index, edge list) state with only the delta
    equals a full rebuild over the unioned corpus — including the two
    hard cases the band-state advance never faces: a shingle whose df
    CROSSES max_df when the delta lands (its history-only pairs lose
    that evidence), and a doc-wins replacement that pulls a df back
    UNDER the cap (history pairs regain it).  Re-delivery is a no-op."""
    from hbase_snapshotter_spark.operators.dedup import (
        advance_shingle_edges,
        doc_shingles,
        shared_shingle_edges,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    base = "alpha beta gamma delta epsilon zeta"
    # history: docs 0-5 share a long run; docs 6,7 nearly hot shingle
    hist_rows = [(i, f"{base} tail{i} end{i}") for i in range(6)]
    hist_rows += [(6, "common one two three x y z"),
                  (7, "common one two three p q r")]
    hist = mk(hist_rows)
    cap, ms = 4, 2

    def rebuild(docs):
        return shared_shingle_edges(docs, "doc_id", min_shared=ms,
                                    max_df=cap)

    def as_set(df):
        return {(r.id_a, r.id_b, r.n_shared) for r in df.collect()}

    state_sh = doc_shingles(hist, "doc_id", "text", 3)
    state_e = rebuild(hist)

    # delta: new doc 8 repeats the 0-5 run (pushes those shingles'
    # df 6→7, already hot if cap<6? no: 'alpha beta gamma' df=6 > 4 is
    # already hot) and new docs 9,10 push 'common one two' df 2→4→5
    # ACROSS the cap; doc 6 is REPLACED with unrelated text, pulling
    # 'one two three' back down
    delta = mk([(8, f"{base} tail8 end8"),
                (9, "common one two three j k l"),
                (10, "common one two three m n o"),
                (6, "totally different replacement text here")])
    new_sh, new_e = advance_shingle_edges(
        state_sh, state_e, delta, min_shared=ms, max_df=cap)
    full = mk([r for r in hist_rows if r[0] != 6]
              + [(8, f"{base} tail8 end8"),
                 (9, "common one two three j k l"),
                 (10, "common one two three m n o"),
                 (6, "totally different replacement text here")])
    assert as_set(new_e) == as_set(rebuild(full))
    want_sh = {(r.doc_id, r.shingle)
               for r in doc_shingles(full, "doc_id", "text", 3).collect()}
    assert {(r.doc_id, r.shingle) for r in new_sh.collect()} == want_sh

    # re-delivery of the same delta is a no-op
    sh2, e2 = advance_shingle_edges(new_sh, new_e, delta,
                                    min_shared=ms, max_df=cap)
    assert as_set(e2) == as_set(new_e)
    assert sh2.count() == new_sh.count()

    # DELETION: drop doc 9 (one of the docs that pushed 'common one
    # two' over the cap) — its pairs leave the edge state AND the
    # shingle df falls back UNDER the cap, so the surviving history
    # pairs regain that evidence; advance ≡ rebuild over the corpus
    # minus the deletion
    del_ids = spark.createDataFrame([(9,)], "doc_id long")
    sh_d, e_d = advance_shingle_edges(
        new_sh, new_e, mk([]), min_shared=ms, max_df=cap,
        delete_ids=del_ids)
    full_minus9 = full.filter("doc_id <> 9")
    assert as_set(e_d) == as_set(rebuild(full_minus9))
    assert {(r.doc_id, r.shingle) for r in sh_d.collect()} == \
        {(r.doc_id, r.shingle)
         for r in doc_shingles(full_minus9, "doc_id", "text",
                               3).collect()}
    assert not any(r.id_a == 9 or r.id_b == 9 for r in e_d.collect())

    # uncapped path: plain insert advance equals uncapped rebuild
    sh3, e3 = advance_shingle_edges(
        state_sh, state_e.filter(F.lit(False)), mk([]), min_shared=ms)
    assert as_set(e3) == set()  # empty delta, empty edge state in
    ins = mk([(11, f"{base} tail11 end11")])
    _, e4 = advance_shingle_edges(
        state_sh, shared_shingle_edges(hist, "doc_id", min_shared=ms),
        ins, min_shared=ms)
    assert as_set(e4) == as_set(shared_shingle_edges(
        hist.unionByName(ins), "doc_id", min_shared=ms))


def test_real_resize_and_decimation_transforms(spark):
    """r9b real transforms on the real codecs: nearest-neighbor [::2]
    resize picks exactly the expected pixels (odd dims ceil-halve,
    top-left survives, hand gradient verifies pixel SELECTION not just
    counts); integer-factor WAV decimation keeps exactly the
    even-index frames at half the rate; corrupt payloads yield NULL
    rows in both lanes."""
    import numpy as np

    from hbase_snapshotter_spark.operators.multimodal import (
        decimate_wav_features,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
        resize_bmp_features,
    )

    # direct transform semantics (pure python, no Spark)
    px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    w2, h2, out = decode_bmp(encode_bmp(px[::2, ::2]))
    assert (w2, h2) == (4, 3)
    assert np.array_equal(out, px[::2, ::2])

    # Spark lanes over hand payloads
    grad = np.zeros((3, 3, 3), dtype=np.uint8)
    grad[0, 0] = 90
    grad[2, 2] = 30  # odd dims: kept by [::2] -> resized 2x2 corner set
    rows = [(1, bytearray(encode_bmp(grad))), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    r = {x.doc_id: x for x in resize_bmp_features(df).collect()}
    assert (r[1].rbmp_width, r[1].rbmp_height) == (2, 2)
    assert r[1].rbmp_corner_pixel == 90
    assert r[1].rbmp_mean_pixel == (90 * 3 + 30 * 3) / (2 * 2 * 3)
    assert r[1].rbmp_mean_pixel == 30.0
    assert r[2].rbmp_width is None

    wave = np.array([[10], [-99], [20], [-99], [30]], dtype=np.int16)
    wrows = [(1, bytearray(encode_wav(wave, 8000))),
             (2, bytearray(b"bad"))]
    wdf = spark.createDataFrame(wrows, "doc_id long, payload binary")
    h = {x.doc_id: x for x in decimate_wav_features(wdf).collect()}
    assert (h[1].wav_half_rate, h[1].wav_half_frames) == (4000, 3)
    assert h[1].wav_half_peak == 30  # the -99s live at odd indexes
    sr2, _ch, kept = decode_wav(encode_wav(wave[::2], 4000))
    assert kept.ravel().tolist() == [10, 20, 30] and sr2 == 4000
    assert h[2].wav_half_rate is None


def test_quality_threshold_sweep_monotone_and_exact(spark, sf_dir):
    """N118: the sweep is computed in ONE aggregation (plan has no
    cross join and a single corpus-side exchange pattern), survivor
    counts are monotone non-decreasing in the cutoff, every count
    matches a direct per-cutoff filter, and the permille is exact
    half-up."""
    from hbase_snapshotter_spark.queries.llm import (
        XENT_SWEEP_CUTS,
        quality_threshold_sweep,
    )
    from hbase_snapshotter_spark.queries.llm import MIX_RATES
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.lm import bigram_lm_xent

    out = {r.cutoff_bits: r for r in
           quality_threshold_sweep(spark, sf_dir).collect()}
    assert sorted(out) == XENT_SWEEP_CUTS
    counts = [out[c].n_survivors for c in XENT_SWEEP_CUTS]
    assert counts == sorted(counts)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = bigram_lm_xent(
        docs, F.col("source").isin(*MIX_RATES)).cache()
    n = scored.count()
    for c in (XENT_SWEEP_CUTS[0], XENT_SWEEP_CUTS[-1], 5.0):
        direct = scored.filter(F.col("lm_xent_bits") <= c).count()
        assert out[c].n_survivors == direct
        assert out[c].n_docs_scored == n
        assert out[c].survivor_permille == (2000 * direct + n) // (2 * n)
    scored.unpersist()


def test_component_stats_hand_computed(spark):
    """N121 histogram semantics on a hand graph: two pairs + one
    triangle + isolated docs bucket into sizes {1, 2, 3}, doc mass
    adds up, and the giant share is the largest component over all
    docs in exact permille."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (6, 7)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 10)], "doc_id long")  # 8, 9 isolated
    from collections import Counter

    comp = connected_components(pairs, docs, id_col="doc_id")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    hist = Counter(r.n for r in sizes.collect())
    assert hist == {1: 2, 2: 2, 3: 1}
    assert sum(k * v for k, v in hist.items()) == 9
    # giant share = 3/9 -> 333 permille half-up
    assert (2000 * 3 + 9) // 18 == 333


def test_jpeg_codec_roundtrip_and_golden_bytes():
    """The baseline-JPEG codec (VERDICT r9 task 5): block-constant
    even-offset images round-trip the full huffman + DCT pipeline
    EXACTLY (the property the registered lane's oracle replays);
    smooth gradients bound at ±1; the encoder's bitstream is
    golden-byte-pinned (markers, Annex-K tables, canonical huffman,
    byte stuffing — any drift changes the md5); malformed and
    unsupported payloads raise ValueError."""
    import hashlib

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    px = np.zeros((16, 24), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                128 + 2 * ((7 * 5 + bx + 3 * by) % 50 - 25)
    data = encode_jpeg(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # golden bytes: the full encoder stack is deterministic
    assert hashlib.md5(data).hexdigest() == \
        "87815f953f9c7d287a9f397a7184babc"
    w, h, back = decode_jpeg(data)
    assert (w, h) == (24, 16)
    assert np.array_equal(back, px)          # exact: even offsets only

    # smooth gradient: lossy but tight (DC + low-frequency AC)
    g = np.tile((np.arange(64) * 3 % 256).astype(np.uint8), (32, 1))
    w2, h2, b2 = decode_jpeg(encode_jpeg(g))
    assert (w2, h2) == (64, 32)
    assert int(np.abs(b2.astype(int) - g.astype(int)).max()) <= 1

    # odd dims: constant image survives pad + crop exactly
    o = np.full((10, 13), 100, dtype=np.uint8)
    w3, h3, b3 = decode_jpeg(encode_jpeg(o))
    assert (w3, h3) == (13, 10) and np.array_equal(b3, o)

    # ZRL path: an isolated high-frequency coefficient forces >15-run
    # zero encoding; roundtrip stays within the quantization step
    z = np.full((8, 8), 128, dtype=np.uint8)
    z[7, 7] = 255
    _w, _h, bz = decode_jpeg(encode_jpeg(z))
    assert bz.shape == (8, 8)

    # color (interleaved 4:4:4 YCbCr, chroma tables + per-component
    # DC predictors): constant color lands within ±1 of the original
    # through RGB→YCbCr→DCT→huffman→IDCT→RGB; smooth gradients bound
    # by the coarser chroma quantization
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 180, 90, 40
    wc, hc, bc = decode_jpeg(encode_jpeg(rgb))
    assert (wc, hc) == (16, 16) and bc.shape == (16, 16, 3)
    assert int(np.abs(bc.astype(int) - rgb.astype(int)).max()) <= 1
    grad = np.zeros((24, 32, 3), dtype=np.uint8)
    grad[..., 0] = np.arange(32) * 4 % 250
    grad[..., 1] = 100
    grad[..., 2] = (np.arange(24)[:, None] * 5 % 250)
    _w, _h, bgr = decode_jpeg(encode_jpeg(grad))
    assert int(np.abs(bgr.astype(int) - grad.astype(int)).max()) <= 8

    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8junk")          # garbage after SOI
    with _pytest.raises(ValueError):
        decode_jpeg(data[:-10])               # truncated scan
    with _pytest.raises(ValueError, match="SOF"):
        decode_jpeg(data[:2] + b"\xff\xc2" + data[4:])  # progressive
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # marker-walk robustness (ADVICE r10): 0xFF fill bytes before a
    # marker are padding, not a length-bearing segment — the padded
    # stream must decode IDENTICALLY to the clean one
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    wp, hp, bp = decode_jpeg(padded)
    assert (wp, hp) == (w, h) and np.array_equal(bp, back)
    # standalone markers carry no length field: parsing one as a
    # segment would skip into garbage — must raise, never mis-decode
    with _pytest.raises(ValueError, match="standalone"):
        decode_jpeg(data[:2] + b"\xff\x01" + data[2:])   # TEM
    with _pytest.raises(ValueError, match="standalone"):
        decode_jpeg(data[:2] + b"\xff\xd3" + data[2:])   # RST3
    with _pytest.raises(ValueError, match="length"):
        decode_jpeg(data[:2] + b"\xff\xfe\x00\x01" + data[2:])  # len<2
    with _pytest.raises(ValueError):
        decode_jpeg(data[:2] + b"\xff\xff")   # fill bytes at EOF


def test_jpeg_feature_lane(spark):
    """The Spark JPEG lane: synthesized block-constant payloads decode
    to the id-replayable dims/corner/exact-mean; a corrupt payload
    yields a NULL-feature row."""
    import pyspark.sql.functions as F

    from hbase_snapshotter_spark.operators.multimodal import (
        decode_jpeg_features,
        synthesize_jpeg_payloads,
    )

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_jpeg_features(synthesize_jpeg_payloads(docs)).collect()}
    for i in range(24):
        r = out[i]
        nbx, nby = 1 + i % 3, 1 + i % 2
        assert (r.jpeg_width, r.jpeg_height) == (8 * nbx, 8 * nby)
        gs = [128 + 2 * ((7 * i + bx + 3 * by) % 50 - 25)
              for by in range(nby) for bx in range(nbx)]
        n = len(gs)
        assert r.jpeg_mean_milli == (2000 * sum(gs) + n) // (2 * n)
        assert r.jpeg_corner_pixel == 128 + 2 * ((7 * i) % 50 - 25)
    corrupt = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8\xff\xee"))],
        "doc_id long, payload binary")
    null_row = decode_jpeg_features(corrupt).collect()
    assert len(null_row) == 1 and null_row[0].jpeg_width is None


def test_mjpeg_avi_codec_roundtrip_and_golden_bytes():
    """The MJPEG-AVI codec is REAL (r11: the N105 container x N123
    JPEG composition): grayscale frames built from constant 8x8
    blocks with EVEN level-shifted values round-trip BIT-EXACTLY
    through encode_mjpeg_avi -> decode_avi (DC-only path, Q00=16);
    the container bytes are pinned by md5 so any container or
    entropy-coder drift fails loudly; malformed payloads raise."""
    import hashlib as _hashlib
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        MJPG_FOURCC,
        decode_avi,
        encode_mjpeg_avi,
    )

    i = 7  # the synthesize rule at doc_id=7: 5 frames of 16x16
    n, w, h = 2 + i % 4, 8 * (1 + i % 3), 8 * (1 + i % 2)
    usec = 33000 + 1000 * (i % 4)
    frames = np.empty((n, h, w), dtype=np.uint8)
    for f in range(n):
        blocks = np.array(
            [[128 + 2 * ((7 * i + 11 * f + bx + 3 * by) % 50 - 25)
              for bx in range(w // 8)] for by in range(h // 8)],
            dtype=np.uint8)
        frames[f] = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    payload = encode_mjpeg_avi(frames, usec)
    assert _hashlib.md5(payload).hexdigest() == \
        "2f81ccd7e5c8453cb179f2a4e3f365ea"
    assert len(payload) == 1854

    u, ww, hh, dec = decode_avi(payload)
    assert (u, ww, hh, dec.shape) == (usec, w, h, (n, h, w, 3))
    for f in range(n):  # bit-exact, every channel
        assert np.array_equal(
            dec[f], np.repeat(frames[f][..., None], 3, axis=2))

    # biCompression other than 0/'MJPG' still rejected ('MJPG' appears
    # twice: strh codec fourcc first, then strf biCompression — decode
    # keys on the latter)
    assert _struct.pack("<I", MJPG_FOURCC) == b"MJPG"
    comp_at = payload.find(b"MJPG", payload.find(b"MJPG") + 1)
    bad = payload[:comp_at] + b"H264" + payload[comp_at + 4:]
    with _pytest.raises(ValueError, match="unsupported AVI"):
        decode_avi(bad)
    # a frame whose JPEG dims disagree with the container header
    from hbase_snapshotter_spark.operators.multimodal import encode_jpeg
    small = encode_jpeg(frames[0][:8, :8])
    tampered = payload.replace(encode_jpeg(frames[0]), small, 1)
    with _pytest.raises(ValueError):
        decode_avi(tampered)
    with _pytest.raises(ValueError):
        encode_mjpeg_avi(np.zeros((0, 8, 8), dtype=np.uint8), 1000)
    with _pytest.raises(ValueError):
        encode_mjpeg_avi(np.zeros((2, 8, 8, 3), dtype=np.uint8), 1000)


def test_bitext_margin_hand_computed_and_guard(spark):
    """N129 micro-unit: the Artetxe–Schwenk ratio margin replayed by
    hand on 2-D vectors, plus the non-positive-denominator guard
    (ADVICE r11): an anti-correlated neighborhood (every top-k cosine
    ≤ 0) yields margin NULL and accepted FALSE — never a
    division-by-zero or an inverted negative-over-negative margin."""
    from hbase_snapshotter_spark.operators.similarity import (
        bitext_margin_pairs,
    )

    emb = spark.createDataFrame(
        [(0, "a1", [1.0, 0.0]), (10, "b1", [1.0, 0.0]),
         (11, "b1", [0.0, 1.0]),
         (2, "a2", [1.0, 0.0]), (20, "b2", [-1.0, 0.0])],
        "vec_id long, grp string, embedding array<double>")

    # positive case: cos(a0,b10)=1 (cos4=10000), cos(a0,b11)=0.
    # sum_a=10000,k_a=2; best=b10; b10's batch neighborhood is {a0}:
    # sum_b=10000,k_b=1 → margin = round(2e6·10000·2·1 /
    # (10000·1 + 10000·2)) = 1333333 ≥ 1050000 → accepted.
    row, = bitext_margin_pairs(
        emb, F.col("grp") == "a1", F.col("grp") == "b1", k=4).collect()
    assert (row.src_id, row.dst_id) == (0, 10)
    assert row.cosine == 1.0
    assert row.margin_x1e6 == 1333333
    assert row.accepted is True

    # guard case: the only candidate is anti-correlated (cos4=-10000
    # both directions) → den = -20000 ≤ 0 → NULL margin, NOT accepted
    row, = bitext_margin_pairs(
        emb, F.col("grp") == "a2", F.col("grp") == "b2", k=4).collect()
    assert (row.src_id, row.dst_id) == (2, 20)
    assert row.margin_x1e6 is None
    assert row.accepted is False


def test_ifv_codec_roundtrip_and_golden_bytes():
    """The inter-frame video codec is REAL (r12 — N130, the last
    codec stub closed): GOP streams mix baseline-JPEG I-frames with
    closed-loop zlib int16 temporal-residual P-frames.  Fixture-shaped
    frames (even constant 8x8 blocks) round-trip BIT-EXACTLY; natural
    frames reconstruct exactly the encoder's closed-loop prediction
    chain (I lossy via JPEG, P lossless, zero drift across GOPs);
    container bytes pinned by md5; malformed payloads raise."""
    import hashlib as _hashlib
    import struct as _struct
    import zlib as _zlib

    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        IFV1_FOURCC,
        decode_avi,
        decode_jpeg,
        encode_ifv_avi,
        encode_jpeg,
    )

    i = 7  # the synthesize rule at doc_id=7: 5 frames of 16x16, GOP 3
    n, w, h = 3 + i % 5, 8 * (1 + i % 3), 8 * (1 + i % 2)
    usec = 29000 + 1000 * (i % 5)
    frames = np.empty((n, h, w), dtype=np.uint8)
    for f in range(n):
        blocks = np.array(
            [[128 + 2 * ((5 * i + 13 * f + 2 * bx + 3 * by) % 50 - 25)
              for bx in range(w // 8)] for by in range(h // 8)],
            dtype=np.uint8)
        frames[f] = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    payload = encode_ifv_avi(frames, usec, gop=3)
    assert _hashlib.md5(payload).hexdigest() == \
        "8a71652c31f3edd18eab48e19d8bb3b4"
    assert len(payload) == 964

    u, ww, hh, dec = decode_avi(payload)
    assert (u, ww, hh, dec.shape) == (usec, w, h, (n, h, w, 3))
    for f in range(n):  # bit-exact, every channel (P lossless, even
        # constant blocks make the I-frames exact too)
        assert np.array_equal(
            dec[f], np.repeat(frames[f][..., None], 3, axis=2))

    # natural frames: decoded == the encoder's closed-loop chain
    rng = np.random.default_rng(42)
    nat = rng.integers(0, 256, (6, 16, 24), dtype=np.uint8)
    u2, _, _, dec2 = decode_avi(encode_ifv_avi(nat, 40000, gop=4))
    rec = None
    for f in range(6):
        if f % 4 == 0:
            rec = decode_jpeg(encode_jpeg(nat[f]))[2].astype(np.int16)
        else:
            rec = rec + (nat[f].astype(np.int16) - rec)  # == nat[f]
        assert np.array_equal(dec2[f, :, :, 0], rec.astype(np.uint8))
        # P-frames are LOSSLESS even though the I-frame anchor is not
        if f % 4:
            assert np.array_equal(dec2[f, :, :, 0], nat[f])

    # biCompression other than the whitelist still rejected
    assert _struct.pack("<I", IFV1_FOURCC) == b"IFV1"
    comp_at = payload.find(b"IFV1", payload.find(b"IFV1") + 1)
    bad = payload[:comp_at] + b"H264" + payload[comp_at + 4:]
    with _pytest.raises(ValueError, match="unsupported AVI"):
        decode_avi(bad)
    # malformed STREAMS (assembled with the container helper so the
    # RIFF length fields stay consistent) hit each decode guard
    from hbase_snapshotter_spark.operators.multimodal import (
        _avi_container,
    )

    def ifv(chunks):
        return _avi_container(b"IFV1", IFV1_FOURCC, w, h, usec,
                              chunks, b"00dc", 24)

    jb = encode_jpeg(frames[0])
    good_res = _zlib.compress(
        (frames[1].astype(np.int16)
         - frames[0].astype(np.int16)).astype("<i2").tobytes(), 6)
    with _pytest.raises(ValueError, match="residual size"):
        decode_avi(ifv([b"I" + jb,
                        b"P" + _zlib.compress(b"\x00\x02" * 7, 6)]))
    with _pytest.raises(ValueError, match="unknown IFV frame type"):
        decode_avi(ifv([b"I" + jb, b"Q" + good_res]))
    with _pytest.raises(ValueError, match="P-frame before any I-frame"):
        decode_avi(ifv([b"P" + good_res]))
    with _pytest.raises(ValueError, match="out of range"):
        decode_avi(ifv([b"I" + jb, b"P" + _zlib.compress(
            np.full((h, w), 200, dtype="<i2").tobytes(), 6)]))
    with _pytest.raises(ValueError, match="empty IFV chunk"):
        decode_avi(ifv([b""]))
    with _pytest.raises(ValueError):
        encode_ifv_avi(np.zeros((0, 8, 8), dtype=np.uint8), 1000)
    with _pytest.raises(ValueError):
        encode_ifv_avi(np.zeros((2, 8, 8, 3), dtype=np.uint8), 1000)
    with _pytest.raises(ValueError):
        encode_ifv_avi(frames, usec, gop=0)


def test_decoder_seam_swaps_without_plan_change(spark):
    """The production decoder seam (r12, VERDICT task 2): installing a
    vectorized/native-shaped whole-batch decoder via
    set_payload_decoder / set_payload_resizer changes VALUES only —
    the physical plan (same mapInPandas operator, same schema, same
    partitioning) is bit-identical to the reference decoder's, so a
    deployment swaps PIL/ffmpeg/JVM in with zero re-planning."""
    import re as _re

    from hbase_snapshotter_spark.operators.multimodal import (
        attach_payload,
        decode_payload,
        resize_payload,
        set_payload_decoder,
        set_payload_resizer,
    )

    df = attach_payload(
        spark.range(0, 8).select(
            F.col("id").alias("doc_id"),
            F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8")
            .alias("raw")), "raw")

    def norm(d):
        plan = spark._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted")
        return _re.sub(r"#\d+", "#x", plan)

    ref = decode_payload(df)
    ref_plan, ref_rows = norm(ref), {r.doc_id: r for r in ref.collect()}

    def vectorized_stub(payloads):
        # the whole-batch shape a native library fills in one call
        return {"width": [len(p) for p in payloads],
                "height": [1] * len(payloads),
                "n_frames": [2] * len(payloads),
                "feature_hash": ["swapped"] * len(payloads)}

    prev = set_payload_decoder(vectorized_stub)
    try:
        swapped = decode_payload(df)
        assert swapped.schema == ref.schema
        assert norm(swapped) == ref_plan
        rows = {r.doc_id: r for r in swapped.collect()}
        assert rows.keys() == ref_rows.keys()
        for i, r in rows.items():
            assert r.feature_hash == "swapped" and r.n_frames == 2
            assert r.width == len(f"payload-{i}")
            assert r.width != ref_rows[i].width  # really the stub
    finally:
        set_payload_decoder(prev)
    # seam restored: reference values again
    after = {r.doc_id: r for r in decode_payload(df).collect()}
    assert {i: r.feature_hash for i, r in after.items()} \
        == {i: r.feature_hash for i, r in ref_rows.items()}

    # same contract on the resize seam
    ref_rs = resize_payload(df, width=32, height=16)
    ref_rs_plan = norm(ref_rs)
    prev_rs = set_payload_resizer(
        lambda payloads, w, h: [b"native-%dx%d|" % (w, h) + p[:4]
                                for p in payloads])
    try:
        sw = resize_payload(df, width=32, height=16)
        assert sw.schema == ref_rs.schema
        assert norm(sw) == ref_rs_plan
        assert all(bytes(r.payload).startswith(b"native-32x16|")
                   for r in sw.collect())
    finally:
        set_payload_resizer(prev_rs)


def test_dhash_hand_computed_and_invariance():
    """N131 micro-unit: dHash bits replayed by hand on a 18x16 block
    image; uniform brightness shift leaves the hash INVARIANT (the
    property that catches re-encoded copies); structural change flips
    exactly the touched comparison; wrong geometry raises."""
    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import dhash_bits

    # 9x8 grid of 2x2 blocks; block (bx, by) constant bx*10 + by
    blocks = np.array([[bx * 10 + by for bx in range(9)]
                       for by in range(8)], dtype=np.uint8)
    grid = np.kron(blocks, np.ones((2, 2), dtype=np.uint8))
    px = np.repeat(grid[..., None], 3, axis=2)
    hi, lo = dhash_bits(px)
    # every left block is DARKER than its right neighbor: all bits 0
    assert (hi, lo) == (0, 0)
    # reversed gradient: all 64 bits set
    hi2, lo2 = dhash_bits(px[:, ::-1, :].copy())
    assert (hi2, lo2) == (0xFFFFFFFF, 0xFFFFFFFF)
    # brightness shift: hash unchanged (comparisons are relative)
    assert dhash_bits(np.clip(px.astype(int) + 37, 0, 255)
                      .astype(np.uint8)) == (hi, lo)
    # structural change in block (0,0): flips ONLY bit 0
    mut = px.copy()
    mut[0:2, 0:2, :] = 255
    hi3, lo3 = dhash_bits(mut)
    assert (hi3, lo3) == (0, 1)
    with _pytest.raises(ValueError, match="dhash needs"):
        dhash_bits(np.zeros((16, 16, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="dhash needs"):
        dhash_bits(np.zeros((15, 18, 3), dtype=np.uint8))


def test_dhash_pairs_planted_dups_and_plan(spark):
    """N131: the banded pair join recovers every planted near-dup
    (ids 2k/2k+1 at hamming <= 1), never emits a pair above the
    threshold, and plans as an equi-join on (band, key) — no
    CartesianProduct, no all-pairs product anywhere."""
    from hbase_snapshotter_spark.operators.multimodal import (
        dhash_pairs,
        image_dhash,
        synthesize_dhash_bmp_payloads,
    )

    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    hashes = image_dhash(synthesize_dhash_bmp_payloads(docs))
    pairs = dhash_pairs(hashes)
    plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = pairs.collect()
    got = {(r.id_a, r.id_b): r.hamming for r in rows}
    for k in range(30):  # every planted pair present, hamming <= 1
        assert (2 * k, 2 * k + 1) in got
        assert got[(2 * k, 2 * k + 1)] <= 1
    assert all(h <= 3 for h in got.values())
    # hash halves are 32-bit non-negative (the engine-safe layout)
    hs = hashes.collect()
    assert all(0 <= r.dhash_hi < 2**32 and 0 <= r.dhash_lo < 2**32
               for r in hs)


def test_dhash_state_advance_equals_rebuild_and_novelty(spark):
    """N133 (r12): the incremental image near-dup state — advance
    with a delta (inserts + an edit + a delete) equals the full
    rebuild over the net corpus bit-for-bit; re-delivery is a no-op;
    novelty flags exactly the delta images whose near-dup lives in
    history (delta-sized work, corpus never re-decoded)."""
    from hbase_snapshotter_spark.operators.multimodal import (
        advance_dhash_state,
        build_dhash_state,
        dhash_novelty,
        image_dhash,
        synthesize_dhash_bmp_payloads,
    )

    def hashes(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        return image_dhash(synthesize_dhash_bmp_payloads(df))

    rows_of = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731

    # history: images 0..9; delta: new 20/21 (a planted pair), an
    # EDIT of 4 (content changes because the synthesize rule keys on
    # id — simulate by re-hashing id 4: same content = re-delivery),
    # and a delete of 7
    hist = hashes(range(10))
    state = build_dhash_state(hist)
    delta = hashes([20, 21, 4])
    dels = spark.createDataFrame([(7,)], "doc_id long")
    adv = advance_dhash_state(state, delta, delete_ids=dels)
    net = hashes([0, 1, 2, 3, 4, 5, 6, 8, 9, 20, 21])
    assert rows_of(adv) == rows_of(build_dhash_state(net))
    # re-delivery: advancing again with the same delta changes nothing
    adv2 = advance_dhash_state(adv, delta)
    assert rows_of(adv2) == rows_of(adv)

    # novelty: 11 is the planted partner of history's 10?  No — pairs
    # are (2k, 2k+1): history holds 0..9, so delta id 11 pairs with
    # history id 10 only if 10 is in history.  Use delta {1's partner
    # is 0}: re-check with a delta of {11} (partner 10 NOT in
    # history → novel) and {1} (partner 0 IS in history → near-dup)
    nov = {r.doc_id: (r.is_novel, r.min_hamming)
           for r in dhash_novelty(state, hashes([11, 1])).collect()}
    assert nov[11][0] is True and nov[11][1] is None
    assert nov[1][0] is False and nov[1][1] <= 1


def test_audio_fp_hand_computed_and_invariance(spark):
    """N134 micro-unit: envelope-fingerprint bits replayed by hand;
    uniform gain scaling leaves the hash INVARIANT (the property that
    catches re-encoded/re-normalized copies); a structural envelope
    change flips exactly the touched comparison; wrong length raises;
    the banded pair join recovers every planted near-dup."""
    import numpy as np
    import pytest as _pytest

    from hbase_snapshotter_spark.operators.multimodal import (
        AFP_WINDOWS,
        afp_pairs,
        audio_envelope_fp,
        audio_fp_bits,
        synthesize_afp_wav_payloads,
    )

    # rising envelope: every window louder than the previous -> all 0
    s = np.concatenate([
        np.tile([a, -a], 2) for a in range(1, AFP_WINDOWS + 1)
    ]).astype(np.int16).reshape(-1, 1)
    assert audio_fp_bits(s) == 0
    # falling envelope: all 32 bits set
    assert audio_fp_bits(s[::-1].copy()) == 0xFFFFFFFF
    # uniform gain x3: hash unchanged
    assert audio_fp_bits((s.astype(np.int64) * 3).astype(np.int16)) == 0
    # boost window 0 above window 1: flips ONLY bit 0
    m = s.copy()
    m[0:4, 0] = [99, -99, 99, -99]
    assert audio_fp_bits(m) == 1
    with _pytest.raises(ValueError, match="audio fp needs"):
        audio_fp_bits(np.zeros((AFP_WINDOWS * 4 + 1, 1), dtype=np.int16))

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    pairs = afp_pairs(
        audio_envelope_fp(synthesize_afp_wav_payloads(docs)))
    plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for k in range(20):
        assert (2 * k, 2 * k + 1) in got
        assert got[(2 * k, 2 * k + 1)] <= 1
    assert all(h <= 2 for h in got.values())


def test_fused_payload_features_matches_composed_lanes(spark):
    """r13 fusion: ``fused_payload_features`` must return EXACTLY what
    the composed lanes it replaces return — same rows, same values
    (floats bit-identical: both paths run the identical int-sum /
    size divide), same NULL behavior, same schema — so swapping it
    into multimodal_payload_stats cannot move the query's oracle
    hash.  Also pins that the fusion honors the decoder/resizer
    seams at plan-build time like the composed operators."""
    from hbase_snapshotter_spark.operators.multimodal import (
        FUSED_PAYLOAD_SCHEMA,
        attach_payload,
        decode_bmp_features,
        decode_jpeg_features,
        decode_payload,
        decode_png_features,
        fused_payload_features,
        resize_bmp_features,
        resize_payload,
        set_payload_decoder,
        synthesize_bmp_payloads,
        synthesize_jpeg_payloads,
        synthesize_png_payloads,
    )

    # ids cover every bmp/png/jpeg dimension residue class
    df = attach_payload(
        spark.range(0, 72).select(
            F.col("id").alias("doc_id"),
            F.encode(F.concat(F.lit("pay-"), F.col("id")), "utf-8")
            .alias("raw")), "raw").select("doc_id", "payload")

    fused = fused_payload_features(df, width=64, height=64)
    assert fused.schema == FUSED_PAYLOAD_SCHEMA

    composed = (
        decode_payload(df)
        .join(resize_payload(df, width=64, height=64)
              .select("doc_id",
                      F.col("content_md5").alias("resized_md5"),
                      F.length("payload").cast("int")
                      .alias("resized_n_bytes")), "doc_id")
        .join(decode_bmp_features(synthesize_bmp_payloads(df)), "doc_id")
        .join(resize_bmp_features(synthesize_bmp_payloads(df)), "doc_id")
        .join(decode_png_features(synthesize_png_payloads(df)), "doc_id")
        .join(decode_jpeg_features(synthesize_jpeg_payloads(df)),
              "doc_id"))

    cols = [f.name for f in FUSED_PAYLOAD_SCHEMA.fields]
    got = {r["doc_id"]: r for r in fused.collect()}
    want = {r["doc_id"]: r for r in composed.select(*cols).collect()}
    assert set(got) == set(want) == set(range(72))
    for i in range(72):
        for c in cols:
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])

    # seam honored: a swapped whole-batch decoder reaches the fused lane
    prev = set_payload_decoder(lambda ps: {
        "width": [len(p) for p in ps], "height": [7] * len(ps),
        "n_frames": [3] * len(ps), "feature_hash": ["swap"] * len(ps)})
    try:
        r0 = fused_payload_features(df, width=64, height=64) \
            .where(F.col("doc_id") == 0).collect()[0]
        assert (r0["height"], r0["n_frames"], r0["feature_hash"]) \
            == (7, 3, "swap")
    finally:
        set_payload_decoder(prev)
