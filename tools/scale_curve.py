#!/usr/bin/env python
"""Measured scaling curves for the LLM-pipeline and snapshot operators.

The sub-quadratic claims for MinHash-LSH / SimHash / multi-table SRP
(Σ bucket²·L, capped by ``max_df`` / band width) and the linear-in-log
claims for the snapshot pipeline (shuffle ≈ live cells; N-timestamp
time travel ≈ one scan + one shuffle) are design arguments; this tool
turns them into MEASURED evidence: each operator runs at

- 1×   = sf0.01  (driver fixture),
- 10×  = sf0.1   (driver fixture),
- 100× = a synthetic 10× self-union of sf0.1 (written to /tmp — the
  driver fixtures are read-only),

and the per-step scaling exponent log(t_b/t_a)/log(size_b/size_a) is
reported (1.0 = linear, 2.0 = quadratic).

The synthetic replicas are CONTENT-PERTURBED so the measurement scales
the engine, not the duplicate structure:

- documents: every token of replica r > 0 gets an ``r{r}·`` prefix, so
  no shingle ever collides across replicas — each replica contributes
  the base corpus' collision structure, keeping true pair counts (and
  the ideal workload) linear in the replica count;
- embeddings: replica r is multiplied elementwise by a deterministic
  ±1 pattern derived from (r, dim).  A diagonal sign matrix S satisfies
  cos(Sa, Sb) = cos(a, b), so WITHIN-replica pairs and top-k structure
  are preserved exactly while SRP signatures differ across replicas;
- events: replica r shifts user_id/event_id by a stride, timestamps
  unchanged — per-key version depth is preserved while live cells (and
  so the snapshot shuffle) grow linearly with the log, the table-growth
  mode the driver fixtures themselves follow (users scale with sf).

Timings are min-of-2 on a warm session, action = noop write (full
computation, no driver collect).

Usage: python tools/scale_curve.py [--skip-100x]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time


REPLICAS = 10
ID_STRIDE = 100_000_000


def _needs_build(table_dir: str) -> bool:
    """True if the replica table is absent or a partial write (no
    _SUCCESS marker) — partials are removed so the rebuild is clean."""
    if os.path.isfile(f"{table_dir}/_SUCCESS"):
        return False
    if os.path.isdir(table_dir):
        shutil.rmtree(table_dir)
    return True


def build_10x(spark, src_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.sources.changelog import read_table

    def union_replicas(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    if _needs_build(f"{out_dir}/documents.parquet"):
        docs = spark.read.parquet(f"{src_dir}/documents.parquet")
        doc_parts = []
        for r in range(REPLICAS):
            d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * ID_STRIDE))
            if r > 0:
                # prefix every token -> replica-disjoint shingle space
                d = d.withColumn(
                    "text",
                    F.concat(F.lit(f"r{r}·"),
                             F.regexp_replace("text", " ", f" r{r}·")))
            doc_parts.append(d)
        union_replicas(doc_parts).repartition(32) \
            .write.parquet(f"{out_dir}/documents.parquet")

    if _needs_build(f"{out_dir}/embeddings.parquet"):
        emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
        emb_parts = []
        for r in range(REPLICAS):
            e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * ID_STRIDE))
            if r > 0:
                # deterministic elementwise ±1 per (replica, dim): preserves
                # all within-replica cosines, decorrelates SRP buckets
                e = e.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: x * F.when(
                            F.pmod(F.hash(F.lit(r), i), 2) == 0, F.lit(1.0)
                        ).otherwise(F.lit(-1.0)).cast("float")))
            emb_parts.append(e)
        union_replicas(emb_parts).repartition(32) \
            .write.parquet(f"{out_dir}/embeddings.parquet")

    if _needs_build(f"{out_dir}/lineitem.parquet"):
        li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
        li_parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * ID_STRIDE))
            for r in range(REPLICAS)
        ]
        union_replicas(li_parts).repartition(32) \
            .write.parquet(f"{out_dir}/lineitem.parquet")

    if _needs_build(f"{out_dir}/orders.parquet"):
        # o_custkey shifts with customer's c_custkey and o_orderkey with
        # lineitem's l_orderkey (same stride), so each replica keeps its
        # referential edges intact — the constraint-audit curve measures
        # join cost, not synthetic orphans
        o = spark.read.parquet(f"{src_dir}/orders.parquet")
        o_parts = [
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * ID_STRIDE))
             .withColumn("o_custkey", F.col("o_custkey") + F.lit(r * ID_STRIDE))
            for r in range(REPLICAS)
        ]
        union_replicas(o_parts).repartition(32) \
            .write.parquet(f"{out_dir}/orders.parquet")

    if _needs_build(f"{out_dir}/customer.parquet"):
        c = spark.read.parquet(f"{src_dir}/customer.parquet")
        c_parts = [
            c.withColumn("c_custkey", F.col("c_custkey") + F.lit(r * ID_STRIDE))
            for r in range(REPLICAS)
        ]
        union_replicas(c_parts).repartition(32) \
            .write.parquet(f"{out_dir}/customer.parquet")

    if _needs_build(f"{out_dir}/part.parquet"):
        # part is copied unscaled: lineitem replicas keep l_partkey, so
        # the dim stays fixed while facts grow — the realistic 100x
        # shape (each part carries 10x the lineitems)
        spark.read.parquet(f"{src_dir}/part.parquet").repartition(4) \
            .write.parquet(f"{out_dir}/part.parquet")

    if _needs_build(f"{out_dir}/events.parquet"):
        # read_table normalizes the fixture's ts encoding; the replica is
        # written as plain TimestampType, which read_table passes through
        ev = read_table(spark, src_dir, "events")
        ev_parts = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(r * ID_STRIDE))
              .withColumn("user_id", F.col("user_id") + F.lit(r * ID_STRIDE))
            for r in range(REPLICAS)
        ]
        union_replicas(ev_parts).repartition(32) \
            .write.parquet(f"{out_dir}/events.parquet")


def operators():
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from hbase_snapshotter_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_pairs_bucketed,
    )

    def run_minhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return minhash_lsh_pairs(docs, "doc_id", num_hashes=12, bands=4,
                                 threshold=0.7)

    def run_simhash(spark, d):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return simhash_pairs(docs, "doc_id", max_hamming=2)

    def run_ann(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_embdup(spark, d):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return cosine_pairs_bucketed(emb, threshold=0.45)

    def run_contamination(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.text import contamination_hits

        # NOTE: the replica eval slice grows WITH the corpus (replica id
        # shifts are multiples of 50), so the broadcast side here scales
        # linearly — harsher than production, where the eval set is a
        # fixed benchmark suite
        docs = spark.read.parquet(f"{d}/documents.parquet")
        is_eval = F.col("doc_id") % 50 == 7
        return contamination_hits(docs.filter(~is_eval),
                                  docs.filter(is_eval), n=13)

    def run_semdedup(spark, d):
        from hbase_snapshotter_spark.operators.similarity import (
            semdedup_verdicts,
        )

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return semdedup_verdicts(emb, threshold=0.45)

    def run_paragraph_dedup(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.dedup import (
            paragraph_dedup_stats,
        )
        from hbase_snapshotter_spark.operators.text import (
            token_lines,
            tokens,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return paragraph_dedup_stats(
            docs, token_lines(tokens(F.col("text")), 3))

    def run_dsir(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.sampling import dsir_logratio

        # NOTE: replica token perturbation (r{r}· prefixes) grows the
        # vocabulary ~linearly with the corpus here, so the broadcast
        # freq tables scale harder than production, where vocabulary
        # saturates (the paper's hashed features bound it outright)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dsir_logratio(docs, F.col("source").isin("src0", "src1", "src2"))

    def run_ivf(spark, d):
        from hbase_snapshotter_spark.operators.similarity import ivf_topk

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return ivf_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_exact_blocked(spark, d):
        from hbase_snapshotter_spark.operators.similarity import (
            cosine_pairs_blocked,
        )

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return cosine_pairs_blocked(emb, threshold=0.45)

    def run_clusters(spark, d):
        from hbase_snapshotter_spark.operators.dedup import (
            connected_components,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=12, bands=4,
                                  threshold=0.7)
        return connected_components(pairs, docs.select("doc_id"),
                                    id_col="doc_id")

    from hbase_snapshotter_spark.operators.snapshot import latest_cells_multi
    from hbase_snapshotter_spark.queries.snapshot_q import (
        SNAPSHOT_TS_MS,
        TS_LIST,
        events_snapshot_schema,
    )
    from hbase_snapshotter_spark.sources.changelog import (
        events_as_changelog,
        read_table,
    )

    def run_domain_cap(spark, d):
        from hbase_snapshotter_spark.operators.sampling import domain_cap

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return domain_cap(docs, "doc_id", "source", 10)

    def run_lm_xent(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.lm import bigram_lm_xent

        # NOTE: like run_dsir, replica token perturbation grows the
        # reference vocabulary (and so the broadcast count tables)
        # ~linearly here — harsher than production, where the LM is a
        # fixed KenLM artifact and the broadcast side is CONSTANT
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return bigram_lm_xent(docs, F.col("doc_id") % 10 == 3)

    def run_winnow_overlap(spark, d):
        from hbase_snapshotter_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return winnow_overlap_pairs(docs, "doc_id", max_df=50)

    def run_profile(spark, d):
        from hbase_snapshotter_spark.operators.profile import profile_columns

        # documents (the 100x builder replicates documents/embeddings/
        # events only); same 2-numeric + 2-string shape as the query
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return profile_columns(docs, ["doc_id", "n_chars"],
                               ["lang", "source"])

    def run_bloom_novelty(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.bloom import novel_keys

        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", F.md5(F.col("text")).alias("key"),
            (F.col("doc_id") % 10 >= 7).alias("__new"))
        return novel_keys(docs.filter("__new"), docs.filter("NOT __new"),
                          "key")

    def run_bpe_pairs(spark, d):
        from hbase_snapshotter_spark.operators.bpe import bpe_pair_counts

        # NOTE: replica token perturbation grows the word vocabulary
        # ~linearly, so the pair-histogram input (a vocab-sized table)
        # grows too — production vocabularies saturate
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return bpe_pair_counts(docs, top_k=50)

    def run_snapshot_wide(spark, d):
        from hbase_snapshotter_spark.operators.snapshot import snapshot_as_of

        log = events_as_changelog(
            read_table(spark, d, "events", events_as_of_ms=SNAPSHOT_TS_MS))
        return snapshot_as_of(log, events_snapshot_schema(), SNAPSHOT_TS_MS)

    def run_compaction(spark, d):
        from hbase_snapshotter_spark.queries.snapshot_q import (
            q_snapshot_compaction,
        )

        return q_snapshot_compaction(spark, d)

    def run_scd2(spark, d):
        from hbase_snapshotter_spark.operators.snapshot import scd2_history

        return scd2_history(events_as_changelog(read_table(spark, d, "events")))

    def run_changefeed(spark, d):
        from hbase_snapshotter_spark.queries.snapshot_q import (
            q_state_changefeed,
        )

        return q_state_changefeed(spark, d)

    def run_heavy_hitters(spark, d):
        from hbase_snapshotter_spark.operators.freq import heavy_hitters
        from hbase_snapshotter_spark.operators.text import tokens

        # NOTE: replica token perturbation DILUTES shares ~linearly in
        # the replica count (each replica's tokens are distinct), so
        # the support threshold here is 3 permille, not the registered
        # query's 32 — at 100x a 32-permille item cannot exist by
        # construction; production corpora keep their head as they grow
        docs = spark.read.parquet(f"{d}/documents.parquet")
        inst = docs.select(F.explode(tokens("text")).alias("token"))
        return heavy_hitters(inst, "token", support_permille=3)

    def run_pq(spark, d):
        from hbase_snapshotter_spark.operators.similarity import pq_topk

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return pq_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_ivfpq(spark, d):
        from hbase_snapshotter_spark.operators.similarity import ivfpq_topk

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return ivfpq_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_context_chunks(spark, d):
        from hbase_snapshotter_spark.operators.sampling import context_chunks
        from hbase_snapshotter_spark.operators.text import tokens

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return context_chunks(
            docs.select("doc_id", tokens("text").alias("toks")),
            id_col="doc_id", tokens_col="toks", max_len=32, overlap=8)

    def run_bm25(spark, d):
        from hbase_snapshotter_spark.operators.retrieval import bm25_topk

        docs = spark.read.parquet(f"{d}/documents.parquet")
        # replica perturbation prefixes tokens, so query the base terms
        return bm25_topk(docs, ["dup", "join", "vector"], k=25)

    def run_exact_substring(spark, d):
        from hbase_snapshotter_spark.operators.dedup import dup_span_stats

        # replica token prefixes keep duplicated-gram structure linear
        # in the replica count (no cross-replica collisions), like the
        # shingle lanes
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dup_span_stats(docs, "doc_id", span_len=5)

    def run_zorder(spark, d):
        from hbase_snapshotter_spark.queries.relational import (
            zorder_layout_audit,
        )

        return zorder_layout_audit(spark, d)

    def run_latest_multi(spark, d):
        log = events_as_changelog(read_table(spark, d, "events"))
        return latest_cells_multi(log, list(TS_LIST))

    def run_quantile_sketch(spark, d):
        from hbase_snapshotter_spark.operators.sketches import (
            dd_quantile_estimates,
            quantile_state,
        )

        ev = read_table(spark, d, "events")
        state = quantile_state(ev, "value", group_cols=["event_type"])
        return dd_quantile_estimates(state, [0.5, 0.95, 0.99],
                                     group_cols=["event_type"])

    def run_stratified_sample(spark, d):
        from hbase_snapshotter_spark.operators.sampling import (
            stratified_exact_sample,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return stratified_exact_sample(
            docs, ["lang", "source"], 10, key_col="doc_id")

    def run_bm25_indexed(spark, d):
        from hbase_snapshotter_spark.cache import scoped_persist
        from hbase_snapshotter_spark.operators.retrieval import (
            bm25_topk_indexed,
            build_bm25_index,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        postings, header = build_bm25_index(docs)
        return bm25_topk_indexed(
            scoped_persist(postings), scoped_persist(header),
            ["spark", "query", "join"], k=25)

    def run_hybrid_rrf(spark, d):
        from hbase_snapshotter_spark.queries.llm import hybrid_rrf_topk

        return hybrid_rrf_topk(spark, d)

    def run_neardup_novelty(spark, d):
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.cache import scoped_persist
        from hbase_snapshotter_spark.operators.dedup import (
            build_neardup_state,
            neardup_novelty,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        hist = docs.filter(F.col("doc_id") % 5 != 0)
        delta = docs.filter(F.col("doc_id") % 5 == 0)
        state = scoped_persist(build_neardup_state(hist, "doc_id"))
        return neardup_novelty(state, hist, delta, "doc_id")

    def run_rolling_anomaly(spark, d):
        from hbase_snapshotter_spark.operators.timeseries import (
            gap_fill,
            rolling_stats,
            time_bucket_rollup,
        )

        ev = read_table(spark, d, "events")
        r = time_bucket_rollup(
            ev, "ts", "value", 30 * 60 * 1000, group_cols=["event_type"])
        grid = gap_fill(r, 30 * 60 * 1000, group_cols=["event_type"])
        return rolling_stats(grid, group_cols=["event_type"])

    def run_mmr(spark, d):
        from hbase_snapshotter_spark.queries.llm import mmr_diverse_topk

        return mmr_diverse_topk(spark, d)

    def run_clusters_delta(spark, d):
        from hbase_snapshotter_spark.queries.llm import dedup_clusters_delta

        return dedup_clusters_delta(spark, d)

    def run_repetition(spark, d):
        from hbase_snapshotter_spark.operators.dedup import spread
        from hbase_snapshotter_spark.operators.text import repetition_signals

        docs = spread(spark.read.parquet(f"{d}/documents.parquet"))
        return repetition_signals(docs, "doc_id")

    def run_hard_negatives(spark, d):
        from hbase_snapshotter_spark.operators.similarity import (
            hard_negatives,
        )

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return hard_negatives(emb, emb.filter(F.col("vec_id") < 20), k=5)

    def run_cms(spark, d):
        from hbase_snapshotter_spark.queries.llm import cms_freq_maintenance

        return cms_freq_maintenance(spark, d)

    def run_psi(spark, d):
        from hbase_snapshotter_spark.queries.streaming_q import (
            events_drift_psi,
        )

        return events_drift_psi(spark, d)

    def run_retrieval_eval(spark, d):
        from hbase_snapshotter_spark.queries.llm import retrieval_eval_metrics

        return retrieval_eval_metrics(spark, d)

    def run_vocab_drift(spark, d):
        from hbase_snapshotter_spark.queries.llm import source_vocab_drift

        return source_vocab_drift(spark, d)

    def run_constraint_audit(spark, d):
        from hbase_snapshotter_spark.queries.relational import (
            constraint_audit_suite,
        )

        return constraint_audit_suite(spark, d)

    def run_truncation(spark, d):
        from hbase_snapshotter_spark.queries.llm import (
            embedding_truncation_audit,
        )

        return embedding_truncation_audit(spark, d)

    def run_weighted_sample(spark, d):
        from hbase_snapshotter_spark.queries.llm import weighted_sample_docs

        return weighted_sample_docs(spark, d)

    def run_ewma(spark, d):
        from hbase_snapshotter_spark.queries.streaming_q import (
            events_ewma_smooth,
        )

        return events_ewma_smooth(spark, d)

    def run_char_entropy(spark, d):
        from hbase_snapshotter_spark.queries.llm import char_entropy_docs

        return char_entropy_docs(spark, d)

    def run_quantile_rank(spark, d):
        from hbase_snapshotter_spark.queries.streaming_q import (
            events_quantile_rank,
        )

        return events_quantile_rank(spark, d)

    def run_winsorize(spark, d):
        from hbase_snapshotter_spark.queries.streaming_q import (
            events_winsorized,
        )

        return events_winsorized(spark, d)

    def run_cluster_reps(spark, d):
        from hbase_snapshotter_spark.queries.llm import (
            dedup_cluster_representatives,
        )

        return dedup_cluster_representatives(spark, d)

    def run_epoch_mix(spark, d):
        from hbase_snapshotter_spark.queries.llm import epoch_replicated_mix

        return epoch_replicated_mix(spark, d)

    def _q(name):
        # round-8 registered queries take (spark, sf_dir) directly
        def run(spark, d):
            import hbase_snapshotter_spark.queries.llm as llm
            import hbase_snapshotter_spark.queries.relational as rel
            import hbase_snapshotter_spark.queries.snapshot_q as sq
            import hbase_snapshotter_spark.queries.streaming_q as stq

            for mod in (llm, stq, rel):
                if name in mod.PAIRS:
                    return mod.PAIRS[name][0](spark, d)
            # r10: lanes folded into union suites keep their module
            # functions but lose their standalone PAIRS entry — the
            # curve keeps measuring the LANE so its history stays
            # comparable round-over-round
            for mod in (llm, stq, rel):
                fn = getattr(mod, name, None)
                if callable(fn):
                    return fn(spark, d)
            return getattr(sq, f"q_{name}")(spark, d)
        return run

    # ORDER MATTERS: cheap ops first, heap-heavy LSH ops last.  A
    # sub-2s measurement taken right after a ~100s candidate-join run
    # inherits its JVM heap bloat / GC debt — measured 1.35s → 12.5s on
    # latest_cells_multi when it followed embedding_near_dup_lsh.
    def run_session_merge(spark, d):
        # the N95 maintainer's per-batch work: sessionize a batch,
        # merge the intervals into prior interval state (here: the
        # other half of the same events, split by event id parity)
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.timeseries import (
            merge_session_intervals,
            session_intervals,
        )
        from hbase_snapshotter_spark.sources.changelog import read_table

        ev = read_table(spark, d, "events").select(
            "user_id", "event_id", "ts")
        G = 6 * 3600 * 1000
        halves = [session_intervals(
            ev.filter(F.col("event_id") % 2 == i), key_col="user_id",
            ts_col="ts", id_col="event_id", gap_ms=G) for i in (0, 1)]
        return merge_session_intervals(
            halves[0].unionByName(halves[1]), key_col="user_id", gap_ms=G)

    def run_bmp_decode(spark, d):
        # N16 real-codec lane: synthesize + decode one BMP per doc
        from hbase_snapshotter_spark.operators.dedup import spread
        from hbase_snapshotter_spark.operators.multimodal import (
            decode_bmp_features,
            synthesize_bmp_payloads,
        )

        docs = spread(spark.read.parquet(f"{d}/documents.parquet"))
        return decode_bmp_features(synthesize_bmp_payloads(docs))

    def run_scd2_lookup(spark, d):
        import hbase_snapshotter_spark.queries.snapshot_q as sq

        return sq.q_scd2_lookup_purchases(spark, d)

    def run_bm25_retract(spark, d):
        # N97: retract 1/9 of docs from the postings state, then serve
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.dedup import spread
        from hbase_snapshotter_spark.operators.retrieval import (
            bm25_topk_indexed,
            build_bm25_index,
            retract_bm25_index,
        )

        docs = spread(spark.read.parquet(f"{d}/documents.parquet"))
        postings, _ = build_bm25_index(docs)
        p2, h2 = retract_bm25_index(
            postings, docs.select("doc_id").filter(F.col("doc_id") % 9 == 4))
        return bm25_topk_indexed(p2, h2, ["data", "model"], k=25)

    def run_shingle_edge_advance(spark, d):
        # N122 (r10): history (shingle index, edge) state build + the
        # delta-only advance — no rebuild scaffolding, no equality
        # flag, so the curve isolates the incremental path itself
        from pyspark.sql import functions as F

        from hbase_snapshotter_spark.operators.dedup import (
            advance_shingle_edges,
            doc_shingles,
            shared_shingle_edges,
            spread,
        )

        docs = spread(spark.read.parquet(f"{d}/documents.parquet"))
        hist = docs.filter(F.col("doc_id") % 5 != 0)
        delta = docs.filter(F.col("doc_id") % 5 == 0)
        sh = doc_shingles(hist, "doc_id", "text", 3)
        e = shared_shingle_edges(hist, "doc_id", min_shared=3, max_df=50)
        _, adv = advance_shingle_edges(sh, e, delta,
                                       min_shared=3, max_df=50)
        return adv

    def run_jpeg_decode(spark, d):
        # N123 (r10): the full baseline-JPEG encode+decode lane —
        # embarrassingly parallel Arrow batches, no shuffle
        from hbase_snapshotter_spark.operators.dedup import spread
        from hbase_snapshotter_spark.operators.multimodal import (
            decode_jpeg_features,
            synthesize_jpeg_payloads,
        )

        docs = spread(spark.read.parquet(f"{d}/documents.parquet")) \
            .select("doc_id")
        return decode_jpeg_features(synthesize_jpeg_payloads(docs))

    return {
        # round-12 additions (inter-frame video lane, perceptual-hash
        # image near-dup lane)
        "ifv_decode": _q("multimodal_ifv_stats"),
        "phash_pairs": _q("dedup_phash_images"),
        "afp_pairs": _q("dedup_afp_audio"),
        "image_novelty": _q("image_novelty_delta"),
        # round-11 additions (MJPEG video lane, incremental zone-map
        # maintenance, margin-based bitext mining)
        "mjpeg_decode": _q("multimodal_mjpeg_stats"),
        "zone_map_advance": _q("zone_map_advance"),
        "bitext_margin": _q("bitext_margin_mining"),
        # round-10 additions (incremental graph state, JPEG codec,
        # AUC + water-fill eval suite, zone-map skipping audit)
        "shingle_edge_advance": run_shingle_edge_advance,
        "jpeg_decode": run_jpeg_decode,
        "quality_eval": _q("quality_eval_suite"),
        "zone_map_pruning": _q("zone_map_pruning"),
        # round-9b additions (decorrelated subqueries, attribution,
        # sketch join-size, compaction planning, AVI frame sampling)
        "subquery_suite": _q("subquery_suite"),
        "pareto_frontier": _q("pareto_frontier_docs"),
        "shard_rebalance": _q("shard_rebalance_stats"),
        "label_centroids": _q("embedding_label_centroids"),
        "langid_confusion": _q("langid_confusion"),
        "collocations": _q("collocation_mining"),
        "robust_center": _q("events_robust_center"),
        "trend_ols": _q("events_trend_ols"),
        "cusum_drift": _q("events_cusum_drift"),
        "link_rank": _q("doc_link_rank"),
        "triangles": _q("doc_triangle_stats"),
        "bucket_diff": _q("snapshot_bucket_diff"),
        "threshold_sweep": _q("quality_threshold_sweep"),
        "sliding_distinct": _q("events_sliding_distinct"),
        "cooccurrence": _q("event_cooccurrence_lift"),
        "component_stats": _q("dedup_component_stats"),
        "event_attribution": _q("event_attribution"),
        "join_size_estimate": _q("join_size_estimate"),
        "compaction_plan": _q("compaction_plan_audit"),
        "avi_frame_sample": _q("multimodal_video_stats"),
        "bpe_lang_fertility": _q("bpe_encode_stats"),
        # round-9 additions (cheap: per-key windows / Arrow batch lanes)
        "pattern_funnel": _q("event_pattern_funnel"),
        "scd2_lookup": run_scd2_lookup,
        "bm25_retract_serve": run_bm25_retract,
        "topk_delete_advance": _q("topk_delete_advance"),
        "session_merge": run_session_merge,
        "bmp_decode": run_bmp_decode,
        # round-8 additions (cheap, bucket-table-sized tails)
        "ohlc_bars": _q("events_ohlc_bars"),
        "topk_advance": _q("events_topk_advance"),
        "range_layout": _q("range_layout_audit"),
        "agg_view_advance": _q("agg_view_advance"),
        "padding_audit": _q("batching_padding_audit"),
        "temperature_mixture": _q("mixture_temperature_rates"),
        "mmr_ivfpq": _q("mmr_ivfpq_topk"),
        "repetition_signals": run_repetition,
        "hard_negatives": run_hard_negatives,
        "cms_freq": run_cms,
        "psi_drift": run_psi,
        "retrieval_eval": run_retrieval_eval,
        "vocab_drift": run_vocab_drift,
        "constraint_audit": run_constraint_audit,
        "truncation_audit": run_truncation,
        "weighted_sample": run_weighted_sample,
        "ewma_smooth": run_ewma,
        "char_entropy": run_char_entropy,
        "quantile_rank": run_quantile_rank,
        "winsorize": run_winsorize,
        "epoch_mix": run_epoch_mix,
        "cluster_reps": run_cluster_reps,
        "rolling_anomaly": run_rolling_anomaly,
        "mmr_rerank": run_mmr,
        "quantile_sketch": run_quantile_sketch,
        "stratified_sample": run_stratified_sample,
        "bm25_indexed": run_bm25_indexed,
        "hybrid_rrf": run_hybrid_rrf,
        "neardup_novelty": run_neardup_novelty,
        "snapshot_events_wide": run_snapshot_wide,
        "latest_cells_multi": run_latest_multi,
        "snapshot_compaction": run_compaction,
        "scd2_history": run_scd2,
        "state_changefeed": run_changefeed,
        "heavy_hitters": run_heavy_hitters,
        "context_chunks": run_context_chunks,
        "bm25": run_bm25,
        "profile": run_profile,
        "zorder_layout": run_zorder,
        "exact_substring": run_exact_substring,
        "pq_topk": run_pq,
        "ivfpq_topk": run_ivfpq,
        "domain_cap": run_domain_cap,
        "bloom_novelty": run_bloom_novelty,
        "bpe_pairs": run_bpe_pairs,
        "contamination": run_contamination,
        "paragraph_dedup": run_paragraph_dedup,
        "dsir": run_dsir,
        "lm_xent": run_lm_xent,
        "winnow_overlap": run_winnow_overlap,
        "ivf_topk": run_ivf,
        "ann_topk_lsh": run_ann,
        "simhash": run_simhash,
        "minhash_lsh": run_minhash,
        "dedup_clusters": run_clusters,
        "clusters_delta": run_clusters_delta,
        "embedding_near_dup_lsh": run_embdup,
        "embedding_exact_blocked": run_exact_blocked,
        "semdedup": run_semdedup,
    }


def lsh_geometry_report(spark, sizes) -> dict:
    """Fixed vs auto (lsh_geometry) SRP near-dup geometry at each size:
    occupancy (expected n/2^bits + measured mean/max bucket), pair
    recall of auto vs the exact block-matrix pairs, and wall-clock.
    The claim under test: fixed geometry grows the bucket (and with it
    the per-task slab and the Σ bucket²·L flop term) 10× per step;
    auto geometry holds it ~constant."""
    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.cache import release_caches
    from hbase_snapshotter_spark.operators.similarity import (
        NEARDUP_BITS_PER_TABLE,
        NEARDUP_PROJECTIONS,
        NEARDUP_TABLES,
        cosine_pairs_blocked,
        cosine_pairs_bucketed,
        lsh_geometry,
        random_projections,
        srp_bucket,
    )

    def bucket_stats(emb, projections, tables):
        bits = len(projections) // tables
        sig = emb.select(srp_bucket(F.col("embedding"), projections).alias("s"))
        banded = sig.select(F.posexplode(F.array(*[
            F.substring("s", t * bits + 1, bits) for t in range(tables)
        ])).alias("tbl", "key"))
        row = (banded.groupBy("tbl", "key").count()
               .agg(F.avg("count").alias("mean"), F.max("count").alias("max"))
               .collect()[0])
        return round(row["mean"], 1), row["max"]

    report = {}
    for label, d, _mult in sizes:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        auto_tables, auto_bits = lsh_geometry(n)
        auto_proj = (NEARDUP_PROJECTIONS
                     if (auto_tables, auto_bits) == (NEARDUP_TABLES,
                                                     NEARDUP_BITS_PER_TABLE)
                     else random_projections(n=auto_tables * auto_bits))
        entry = {"n": n,
                 "fixed": {"tables": NEARDUP_TABLES,
                           "bits": NEARDUP_BITS_PER_TABLE,
                           "expected_occupancy": round(
                               n / 2 ** NEARDUP_BITS_PER_TABLE, 1)},
                 "auto": {"tables": auto_tables, "bits": auto_bits,
                          "expected_occupancy": round(n / 2 ** auto_bits, 1)}}
        entry["fixed"]["mean_bucket"], entry["fixed"]["max_bucket"] = \
            bucket_stats(emb, NEARDUP_PROJECTIONS, NEARDUP_TABLES)
        entry["auto"]["mean_bucket"], entry["auto"]["max_bucket"] = \
            bucket_stats(emb, auto_proj, auto_tables)

        # r7: auto geometry is now the DEFAULT (no-knob calls derive the
        # corpus size), so "fixed" must pin the reference constants
        # explicitly to keep measuring the old fixed-geometry behavior.
        for mode, kwargs in (
                ("fixed", {"projections": NEARDUP_PROJECTIONS,
                           "tables": NEARDUP_TABLES}),
                ("auto", {"n_vectors": n})):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                pairs = cosine_pairs_bucketed(emb, threshold=0.45, **kwargs)
                n_pairs = pairs.count()
                best = min(best, time.time() - t0)
                release_caches()
            entry[mode]["sec"] = round(best, 2)
            entry[mode]["pairs"] = n_pairs
        exact = cosine_pairs_blocked(emb, threshold=0.45).count()
        release_caches()
        entry["exact_pairs"] = exact
        for mode in ("fixed", "auto"):
            entry[mode]["recall"] = (
                round(entry[mode]["pairs"] / exact, 3) if exact else None)
        report[label] = entry
        print(f"  {label:>4} n={n} fixed={entry['fixed']} auto={entry['auto']}",
              file=sys.stderr, flush=True)
    return report


def clustered_ann_report(spark) -> dict:
    """Clustered-vs-isotropic ANN measurement (VERDICT r6 task 4): the
    SCALE.md production argument — the near-isotropic fixture is the
    LSH/IVF worst case; clustered corpora reach recall at far smaller
    candidate fractions — measured instead of cited.

    Two deterministic corpora of the sf0.1 shape (n=2000, d=64, unit
    vectors): ``isotropic`` (iid gaussian) and ``clustered`` (32-center
    mixture of Gaussians, within-cluster cosine ≈ 0.93).  For each, the
    four approximate lanes are scored against brute force on the same
    50 queries at the SAME geometry (the fixture constants), recording
    recall, wall-clock, and the lane's CANDIDATE FRACTION — scored
    candidate rows per (query × corpus) pair: ANN from the SRP band
    histograms (Σ q_band·c_band, multiplicity across tables = real
    scored rows), IVF/IVFPQ from the probed cells' populations, PQ
    fixed at 1.0 (ADC is by design an exhaustive scan over 16-byte
    codes — clustering cannot change its cost, only its recall)."""
    import numpy as np

    from pyspark.sql import functions as F

    from hbase_snapshotter_spark.cache import release_caches
    from hbase_snapshotter_spark.operators.similarity import (
        ANN_BITS_PER_TABLE,
        ANN_PROJECTIONS,
        ANN_TABLES,
        ann_lsh_topk,
        assign_to_centroids,
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        pq_topk,
        probe_centroids,
        sampled_centroids,
        srp_bucket,
    )

    n, d, nq, k_clusters = 2000, 64, 50, 32
    rng = np.random.default_rng(7)
    iso = rng.standard_normal((n, d))
    centers = rng.standard_normal((k_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    member = rng.integers(0, k_clusters, n)
    clu = centers[member] + 0.05 * rng.standard_normal((n, d))

    def to_df(arr):
        arr = arr / np.linalg.norm(arr, axis=1, keepdims=True)
        rows = [(i, [float(x) for x in row]) for i, row in enumerate(arr)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>").repartition(32)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    def band_counts(df, alias):
        bits = ANN_BITS_PER_TABLE
        sig = df.select(srp_bucket(F.col("embedding"), ANN_PROJECTIONS).alias("s"))
        return (
            sig.select(F.posexplode(F.array(*[
                F.substring("s", t * bits + 1, bits)
                for t in range(ANN_TABLES)])).alias("tbl", "key"))
            .groupBy("tbl", "key").agg(F.count(F.lit(1)).alias(alias)))

    report = {"n": n, "d": d, "n_queries": nq, "clusters": k_clusters,
              "within_cluster_cos": 0.93, "corpora": {}}
    for label, arr in (("isotropic", iso), ("clustered", clu)):
        emb = to_df(arr).persist()
        emb.count()
        q = emb.filter(F.col("vec_id") < nq)
        brute = topsets(brute_force_topk(emb, q, k=5))
        entry = {}

        # candidate fractions (geometry-determined, measured from data)
        cand_ann = (band_counts(emb, "c").join(band_counts(q, "qc"),
                                               ["tbl", "key"])
                    .agg(F.sum(F.col("c") * F.col("qc")).alias("s"))
                    .collect()[0].s or 0)
        cents = sampled_centroids(emb).persist()
        assign = assign_to_centroids(emb, cents)
        cell_sizes = assign.groupBy("cell").agg(
            F.count(F.lit(1)).alias("sz"))
        probed = (probe_centroids(q, cents).join(cell_sizes, "cell")
                  .agg(F.sum("sz").alias("s")).collect()[0].s or 0)
        frac = {"ann": round(cand_ann / (nq * n), 4),
                "ivf": round(probed / (nq * n), 4),
                "ivfpq": round(probed / (nq * n), 4),
                "pq": 1.0}

        # re-tuned ANN: DEEPER geometry (4 tables x 8 bits vs the
        # fixture's 12x4) — viable only when neighbors are tight
        # (clustered); measures the candidate-fraction headroom
        # clustering buys at production tuning
        from hbase_snapshotter_spark.operators.similarity import (
            random_projections,
        )

        deep_tables, deep_bits = 4, 8
        deep_proj = random_projections(n=deep_tables * deep_bits)

        def band_counts_deep(df, alias):
            sig = df.select(srp_bucket(F.col("embedding"), deep_proj).alias("s"))
            return (
                sig.select(F.posexplode(F.array(*[
                    F.substring("s", t * deep_bits + 1, deep_bits)
                    for t in range(deep_tables)])).alias("tbl", "key"))
                .groupBy("tbl", "key").agg(F.count(F.lit(1)).alias(alias)))

        cand_deep = (band_counts_deep(emb, "c")
                     .join(band_counts_deep(q, "qc"), ["tbl", "key"])
                     .agg(F.sum(F.col("c") * F.col("qc")).alias("s"))
                     .collect()[0].s or 0)
        frac["ann_retuned"] = round(cand_deep / (nq * n), 4)

        def ann_retuned(corpus, queries, k):
            return ann_lsh_topk(corpus, queries, k=k,
                                projections=deep_proj, tables=deep_tables)

        for lane, fn in (("ann", ann_lsh_topk),
                         ("ann_retuned", ann_retuned),
                         ("ivf", ivf_topk),
                         ("pq", pq_topk), ("ivfpq", ivfpq_topk)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                got = topsets(fn(emb, q, k=5))
                best = min(best, time.time() - t0)
                release_caches()
            recall = sum(
                len(got.get(qid, set()) & brute[qid]) / len(brute[qid])
                for qid in brute) / len(brute)
            entry[lane] = {"recall": round(recall, 3),
                           "candidate_fraction": frac[lane],
                           "sec": round(best, 2)}
        cents.unpersist()
        emb.unpersist()
        report["corpora"][label] = entry
        print(f"  {label}: {entry}", file=sys.stderr, flush=True)
    return report


#: The engine's five heaviest lanes (VERDICT r9 task 6): the wall
#: curve alone can't warn about a skewed partition that fits in time
#: but not memory — this audit records, at 100×, each query's peak
#: per-stage shuffle volume and the LARGEST single task's shuffle
#: read (≈ the biggest partition any executor must hold), asserting
#: it stays under a bound that fits one executor core's share.
SPILL_AUDIT_QUERIES = [
    "dedup_clusters_delta",
    "repetition_signals_docs",
    "dedup_pairs_suite",
    "similarity_topk_ivf_suite",
    "bm25_indexed_topk",
]
MAX_TASK_PARTITION_BYTES = 256 * 1024 * 1024


def _rest(spark, path: str):
    import json as _json
    import urllib.request

    port = spark.conf.get("spark.ui.port", "4040")
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return _json.loads(r.read())


def spill_audit_report(spark, sf_dir: str) -> dict:
    """Run the heavy five at the given fixture and pull per-stage task
    metrics from the status REST API: total + peak-stage shuffle
    write/read bytes and the single largest task's shuffle read and
    peak execution memory.  The bound assertion is the skew early
    warning: a hot key shows up here as one task reading far more than
    data_volume / parallelism long before it OOMs a real executor."""
    from hbase_snapshotter_spark.cache import release_caches
    from hbase_snapshotter_spark.queries.registry import QUERIES

    out: dict[str, dict] = {}
    for name in SPILL_AUDIT_QUERIES:
        before = {s["stageId"] for s in _rest(spark, "/stages")}
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite") \
            .format("noop").save()
        wall = time.time() - t0
        release_caches()
        stages = [s for s in _rest(spark, "/stages")
                  if s["stageId"] not in before
                  and s["status"] == "COMPLETE"]
        total_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        total_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        peak_w = max((s.get("shuffleWriteBytes", 0) for s in stages),
                     default=0)
        max_task_read = 0
        max_task_mem = 0
        for s in stages:
            if not s.get("shuffleReadBytes", 0) and \
                    not s.get("shuffleWriteBytes", 0):
                continue
            try:
                q = _rest(spark, f"/stages/{s['stageId']}/"
                                 f"{s['attemptId']}/taskSummary"
                                 "?quantiles=1.0")
            except Exception:  # noqa: BLE001 - stage GC'd mid-audit
                continue
            rd = q.get("shuffleReadMetrics", {}).get("readBytes", [0])
            max_task_read = max(max_task_read, int(rd[-1]))
            pm = q.get("peakExecutionMemory", [0])
            max_task_mem = max(max_task_mem, int(pm[-1]))
        out[name] = {
            "wall_s": round(wall, 2),
            "n_stages": len(stages),
            "total_shuffle_write_bytes": total_w,
            "total_shuffle_read_bytes": total_r,
            "peak_stage_shuffle_write_bytes": peak_w,
            "max_task_shuffle_read_bytes": max_task_read,
            "max_task_peak_exec_memory_bytes": max_task_mem,
            "max_task_partition_bounded":
                max_task_read <= MAX_TASK_PARTITION_BYTES,
        }
        print(f"  spill-audit {name:28s} wall={wall:6.1f}s "
              f"shW={total_w / 1e6:8.1f}MB "
              f"maxTaskRead={max_task_read / 1e6:7.1f}MB "
              f"maxTaskMem={max_task_mem / 1e6:7.1f}MB",
              file=sys.stderr, flush=True)
    return out


def main() -> int:
    # measure the approximate paths' real cost, not their in-query
    # exact-baseline recall probes (the bench convention; the
    # correctness gate always runs with probes ON).  Since r11 every
    # audit lane gates on audit_enabled(sf_dir) = probe AND fixture
    # shape, so with the probe off ALL sizes — including the 1x/10x
    # fixture dirs — run the PRODUCTION plan shape: the committed
    # exponents measure data scaling of one shape, never a plan-shape
    # switch between 10x and the synthetic 100x dir (ADVICE r10).
    os.environ.setdefault("SPARK_GRAFT_RECALL_PROBE", "0")
    skip_100x = "--skip-100x" in sys.argv
    lsh_only = "--lsh-geometry" in sys.argv
    clustered_only = "--clustered-ann" in sys.argv
    spill_only = "--spill-audit" in sys.argv
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from hbase_snapshotter_spark.cache import release_caches

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-curve")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        # the spill audit reads per-stage task metrics from the status
        # REST API; everything else ignores the UI
        .config("spark.ui.enabled", "true" if spill_only else "false")
        .config("spark.ui.port", "4047")
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [("1x", "/root/testdata/sf0.01", 1.0),
             ("10x", "/root/testdata/sf0.1", 10.0)]
    if not skip_100x:
        out = "/tmp/scale_curve_100x"
        print("building synthetic 100x fixture ...", file=sys.stderr, flush=True)
        build_10x(spark, "/root/testdata/sf0.1", out)
        sizes.append(("100x", out, 100.0))

    if lsh_only:
        print(json.dumps(lsh_geometry_report(spark, sizes), indent=2))
        return 0

    if clustered_only:
        print(json.dumps(clustered_ann_report(spark), indent=2))
        return 0

    if spill_only:
        audit_dir = sizes[-1][1]
        report = {"sf_dir": audit_dir, "scale": sizes[-1][0],
                  "max_task_partition_bytes_bound":
                      MAX_TASK_PARTITION_BYTES,
                  "queries": spill_audit_report(spark, audit_dir)}
        print(json.dumps(report, indent=2))
        return 0 if all(q["max_task_partition_bounded"]
                        for q in report["queries"].values()) else 1

    ops = operators()
    if only is not None:
        unknown = only - set(ops)
        if unknown:
            raise SystemExit(f"--only: unknown ops {sorted(unknown)}")
        ops = {k: v for k, v in ops.items() if k in only}
    # global warmup at the smallest size: Janino codegen + Arrow worker
    # startup otherwise dominate the 1x timings
    for name, fn in ops.items():
        fn(spark, sizes[0][1]).write.mode("overwrite").format("noop").save()
        release_caches()

    results: dict[str, dict] = {name: {} for name in ops}
    for label, d, _mult in sizes:
        for name, fn in ops.items():
            best, rows = float("inf"), None
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, d)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
                release_caches()
            rows = fn(spark, d).count()
            release_caches()
            results[name][label] = {"sec": round(best, 2), "rows": rows}
            print(f"  {label:>4} {name:24s} {best:7.2f}s rows={rows}",
                  file=sys.stderr, flush=True)

    report = {}
    for name, r in results.items():
        steps = {}
        pairs = [("1x", "10x", 10.0), ("10x", "100x", 10.0)]
        for a, b, ratio in pairs:
            if a in r and b in r:
                steps[f"{a}->{b}"] = round(
                    math.log(r[b]["sec"] / r[a]["sec"]) / math.log(ratio), 2)
        report[name] = {"times": r, "exponent": steps}
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
