"""BM25 keyword retrieval (SURVEY §2.3 N45) — scored text search over
the documents table.

The missing classic next to the embedding lanes: lexical top-k.  The
Spark-first shape exploits that a QUERY is a handful of literal terms:

- per-document term frequencies are COLUMN EXPRESSIONS
  (``size(filter(toks, x = term))`` per term) — zero shuffle, zero
  Python, whole-stage codegen over one corpus scan;
- the corpus statistics BM25 needs (N, avgdl, per-term document
  frequencies) all fold into ONE one-row aggregate (map-side partials)
  attached back as a broadcast scalar — the Lucene index's tiny header,
  not an inverted index materialization;
- ranking is ``ORDER BY score LIMIT k`` → TakeOrderedAndProject (per-
  partition bounded heap + driver merge), never a global sort.

At 100 TB this is two narrow passes over the corpus (stats, score) —
for interactive many-query serving you would materialize the posting
lists instead (the :mod:`~.dedup` inverted-index shape); for the
pipeline use case (one-shot corpus triage, "pull everything about X")
the scan form is the right cost.

Scores use the Lucene/ATIRE BM25 variant — ``idf = ln(1 + (N - df +
0.5)/(df + 0.5))`` (never negative) — with standard k1/b defaults.
Both idf and the final score are rounded so the DuckDB oracle replays
the arithmetic bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents by BM25 against ``query_terms``:
    ``(id, score, <tf_term...>)`` — ties break toward the smaller id.
    Documents matching no term score 0 and are ranked below any match;
    duplicate query terms are collapsed (a term contributes once)."""
    from hbase_snapshotter_spark.operators.text import tokens

    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))
    toks = tokens(F.col(text_col))
    # NB: a two-parameter lambda would be called as (element, index) by
    # F.filter — bind the term via a closure factory instead
    def _eq(term):
        return lambda x: x == F.lit(term)

    tf_cols = {t: F.size(F.filter(toks, _eq(t))) for t in terms}
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[tf.alias(f"tf_{i}") for i, (t, tf) in enumerate(tf_cols.items())],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.round(
            F.log(F.lit(1.0)
                  + (F.col("__N") - F.col(f"df_{i}") + F.lit(0.5))
                  / (F.col(f"df_{i}") + F.lit(0.5))), 6)
        part = idf * (tf * (k1 + 1)) / (
            tf + F.lit(k1) * (F.lit(1 - b)
                              + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
        score = part if score is None else score + part
    return (
        scored.select(
            id_col,
            F.round(score, 4).alias("score"),
            *[F.col(f"tf_{i}").alias(f"tf_{t}") for i, t in enumerate(terms)],
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def build_bm25_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Materialized BM25 index (VERDICT r6 task 7 — the serving form):
    ``(postings, header)``.

    ``postings`` is the inverted index — ``(term, doc_id, tf, dl)``,
    one row per distinct (term, document) — with the document length
    DENORMALIZED onto every posting row (Lucene stores norms separately;
    inlining dl means scoring a query touches NOTHING but its terms'
    posting lists).  ``header`` is the one-row corpus header
    ``(N, avgdl)``.  Per-term document frequencies are NOT a third
    table: df(term) = the term's posting-list length, counted at query
    time from the (already query-pruned) postings.

    Built in one corpus scan: tokenize → explode → count per (term,
    doc).  For repeated serving persist ``postings`` PARTITIONED (or
    bucketed) BY a hash of ``term``: a query's ``term IN (...)``
    predicate then prunes the file listing to its terms' buckets, so
    per-query input is Σ df(query terms) posting rows — independent of
    corpus size, which is the whole point of an inverted index."""
    from hbase_snapshotter_spark.operators.text import tokens

    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    base = base.select(id_col, "__toks", F.size("__toks").alias("dl"))
    postings = (
        base.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    header = base.agg(F.count(F.lit(1)).alias("N"),
                      F.avg("dl").alias("avgdl"))
    return postings, header


def bm25_topk_indexed(
    postings: DataFrame,
    header: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    k: int = 25,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` by BM25 served from a :func:`build_bm25_index` index:
    ``(id, score)``, ties toward the smaller id.  Identical arithmetic
    to :func:`bm25_topk` (6-dp idf, 4-dp score), so for documents
    matching at least one term the two forms rank identically
    (pytest-pinned); zero-match documents simply don't appear here —
    an inverted index never visits them.

    Query cost shape: ``term IN (...)`` prunes the postings scan to the
    query's lists (partition/bucket pruning under the recommended
    layout); df comes from counting those same pruned lists (≤
    |terms| rows, broadcast back); scoring is one hash-agg over
    Σ df(term) posting rows; ranking is TakeOrderedAndProject.  No
    corpus-sized input anywhere after the one-time build."""
    if not query_terms:
        raise ValueError("bm25_topk_indexed: query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))
    p = postings.filter(F.col("term").isin(terms))
    df_tbl = p.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.round(
        F.log(F.lit(1.0)
              + (F.col("N") - F.col("__df") + F.lit(0.5))
              / (F.col("__df") + F.lit(0.5))), 6)
    tf = F.col("tf").cast("double")
    part = idf * (tf * (k1 + 1)) / (
        tf + F.lit(k1) * (F.lit(1 - b)
                          + F.lit(b) * F.col("dl") / F.col("avgdl")))
    return (
        p.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(header))
        .groupBy(id_col)
        .agg(F.round(F.sum(part), 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


#: Standard RRF smoothing constant (Cormack et al. 2009's published
#: default): dampens any single list's top ranks so consensus across
#: lists outweighs one retriever's first place.
RRF_K0 = 60


def rrf_fuse(
    ranked_lists: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    k0: int = RRF_K0,
) -> DataFrame:
    """Reciprocal-rank fusion (SURVEY §2.3 N55) — merge ranked lists
    from heterogeneous retrievers into one ranking:
    ``score(d) = Σ_lists 1/(k0 + rank_list(d))``, the fusion rule that
    needs NO score calibration between retrievers (BM25 scores and
    cosines are not comparable; ranks are).  Output: ``(id, rrf_score,
    n_lists)`` — top ``k``, ties toward the smaller id.

    Spark shape: each input list contributes ``(id, 1/(k0+rank))``
    rows; fusion is one union + hash aggregation over Σ|lists| rows —
    the inputs are already top-N truncated (index-backed retrievals),
    so the fuse costs k-row arithmetic regardless of corpus size.
    Documents absent from a list simply contribute nothing — exactly
    RRF's semantics, no outer-join NULL handling needed."""
    if not ranked_lists:
        raise ValueError("rrf_fuse: ranked_lists must be non-empty")
    contribs = [
        df.select(F.col(id_col),
                  (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias("__c"))
        for df in ranked_lists
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionAll(c)
    return (
        u.groupBy(id_col)
        .agg(F.round(F.sum("__c"), 6).alias("rrf_score"),
             F.count(F.lit(1)).cast("int").alias("n_lists"))
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )


def advance_bm25_index(
    postings: DataFrame,
    delta_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Advance a materialized BM25 index with ONLY the delta documents
    — the serving index joins the incremental-state family (N25
    latest-cells, N43 PQ codes, N48 sketches, N54 SCD2): at 100 TB
    nobody re-tokenizes the corpus to add a day's crawl.

    Document-wins semantics: a delta doc REPLACES its prior posting
    rows (edits and re-deliveries both resolve to the delta's
    tokenization — one ``id``-keyed anti-join removes the old lists,
    exactly the N43 delta-wins shape), then the delta's postings
    append.  The header advances arithmetically: ``N`` and ``avgdl``
    recompose from (prior N·avgdl ± replaced/added lengths) — but
    because replaced docs' old lengths must be subtracted, the header
    is recomputed from the POSTINGS state itself (one agg over distinct
    ``(doc, dl)`` — index-sized, not corpus-sized; dl is denormalized
    onto every posting row precisely so state is self-describing).
    Re-delivering a delta is a no-op (same tokenization ⇒ same rows).
    Advanced index ≡ full rebuild over the unioned corpus,
    row-for-row (pytest-pinned)."""
    fresh_postings, _ = build_bm25_index(
        delta_docs, id_col=id_col, text_col=text_col)
    delta_ids = delta_docs.filter(F.col(text_col).isNotNull()) \
        .select(id_col).distinct()
    kept = postings.join(F.broadcast(delta_ids), id_col, "left_anti")
    new_postings = kept.unionByName(fresh_postings) \
        .select("term", id_col, "dl", "tf")
    new_header = (
        new_postings.select(id_col, "dl").distinct()
        .agg(F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl"))
    )
    return new_postings, new_header


def retract_bm25_index(
    postings: DataFrame,
    deleted_ids: DataFrame,
    *,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Retract documents from a materialized BM25 index (the N94
    deletion posture applied to text retrieval): remove the deleted
    ids' posting lists and recompose the header from the surviving
    state — no corpus re-tokenization, the GDPR/takedown shape.

    BM25 state is fully retractable because the index is
    per-document-decomposable: a doc's contribution is exactly its
    posting rows (tf, dl inlined), df(term) is derived at query time
    from posting-list length, and (N, avgdl) recompose from the
    surviving distinct (doc, dl) pairs — so ``retract(index(C), D) ≡
    index(C ∖ D)`` row-for-row (pytest-pinned), unlike the
    non-algebraic views N94 recomputes per group.  Retracting an
    absent id is a no-op (idempotent re-delivery).

    Cost: one broadcast anti-join over the postings (with the
    recommended term-hash partitioning this rewrites only partitions
    that contain a deleted doc's terms — production runs it as a
    partition-pruned MERGE DELETE) + one index-sized header agg."""
    ids = deleted_ids.select(id_col).distinct()
    new_postings = postings.join(F.broadcast(ids), id_col, "left_anti") \
        .select(*postings.columns)
    new_header = (
        new_postings.select(id_col, "dl").distinct()
        .agg(F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl"))
    )
    return new_postings, new_header


#: MMR trade-off weights — INDEPENDENT literals on purpose: the oracle
#: writes the same two decimals, so both engines hold the identical
#: nearest-double for each (computing mu as `1 - 0.7` would yield a
#: DIFFERENT double than the literal 0.3).
MMR_LAMBDA = 0.7
MMR_MU = 0.3


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int,
    *,
    lam: float = MMR_LAMBDA,
    mu: float = MMR_MU,
) -> DataFrame:
    """Greedy maximal-marginal-relevance re-ranking (SURVEY §2.3 N61;
    Carbonell & Goldstein, SIGIR'98): from each query's candidate list,
    select ``k`` results one at a time by
    ``argmax lam·rel(c) − mu·max_{s∈S} sim(c, s)`` — relevance traded
    against redundancy with what is already selected, the standard
    diversification pass a retrieval deployment runs AFTER fusion
    (near-duplicate hits carry no marginal information).

    Inputs: ``candidates`` ``(query_id, cand_id, rel)`` — the top-M
    list from any retriever (rel on a rounded 4-dp scale), and
    ``pair_sims`` ``(query_id, id_a, id_b, sim)`` with ``id_a <
    id_b`` — pairwise candidate-candidate similarities (symmetric;
    one direction suffices).

    The greedy recurrence is inherently sequential in ``k``, but each
    query's problem is an M-candidate, M²-similarity island — so the
    Spark shape is ONE ``applyInPandas`` over query groups (the
    sanctioned custom-operator fallback: Arrow batches, vectorized
    group payloads).  A million queries parallelize across partitions;
    per-group work is O(k·M) with M²-bounded input, and the corpus is
    never touched (both inputs are index-backed truncated lists).

    Determinism (oracle-replayable): rel/sim arrive 4-dp rounded; the
    MMR score rounds at 6 dp (a lam/mu blend of 4-dp inputs carries 5
    decimals, so no systematic round tie exists); argmax ties break
    toward the smaller candidate id; rank-1 penalty is 0.0 (max over
    an empty selection).  Output: ``(query_id, rank, cand_id, rel,
    div_penalty, mmr_score)``.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"mmr_rerank: k must be >= 1, got {k}")

    rel_rows = candidates.select(
        "query_id", F.col("cand_id").alias("i"),
        F.lit(None).cast("long").alias("j"), F.col("rel").alias("val"))
    sim_rows = pair_sims.select(
        "query_id", F.col("id_a").alias("i"),
        F.col("id_b").alias("j"), F.col("sim").alias("val"))

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = {int(r.i): float(r.val)
               for r in pdf.itertuples() if pd.isna(r.j)}
        sim: dict[tuple[int, int], float] = {}
        for r in pdf.itertuples():
            if not pd.isna(r.j):
                a, b, s = int(r.i), int(r.j), float(r.val)
                sim[(a, b)] = s
                sim[(b, a)] = s
        qid = int(pdf["query_id"].iloc[0])
        picked: list[int] = []
        remaining = set(rel)
        out = []
        for rank in range(1, k + 1):
            if not remaining:
                break
            best = None
            for c in sorted(remaining):
                pen = max((sim.get((c, s), 0.0) for s in picked),
                          default=0.0)
                score = round(lam * rel[c] - mu * pen, 6)
                key = (score, -c)
                if best is None or key > best[0]:
                    best = (key, c, pen, score)
            _, c, pen, score = best
            out.append((qid, rank, c, rel[c], pen, score))
            picked.append(c)
            remaining.remove(c)
        return pd.DataFrame(
            out, columns=["query_id", "rank", "cand_id", "rel",
                          "div_penalty", "mmr_score"])

    return (
        rel_rows.unionByName(sim_rows)
        .groupBy("query_id")
        .applyInPandas(
            greedy,
            "query_id long, rank int, cand_id long, rel double, "
            "div_penalty double, mmr_score double")
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-evaluation metrics (SURVEY §2.3 N67): per query,
    ``recall_at_k``, ``precision_at_k``, ``mrr`` (reciprocal rank of
    the first relevant hit, 0 when none), and ``ndcg_at_k`` — the
    eval pass every retrieval deployment runs next to its rankers
    (binary relevance; ``relevant`` is the (query, id) ground truth).

    Determinism: DCG terms ``1/log2(rank+1)`` are transcendental, so
    each is snapped to integer micro-units (``round(10⁶/log2(r+1))``
    BIGINT — no systematic .5 ties, the N60/N66 posture), summed
    exactly, and nDCG is the half-up exact-rational division of the
    two micro sums; recall/precision divide exact integers the same
    way.  Bit-identical on both engines at any summation order.

    Scale shape: one left join of the (q·k)-row ranked table onto the
    ground truth (co-partitioned hash join on the query/id pair), one
    per-query hash agg with map-side partials, plus a query-count-
    sized relevant-total table broadcast back.  Nothing touches the
    corpus — eval cost is output-sized, independent of corpus scale.
    """
    import math

    idcg = {
        m: sum(int(round(1e6 / math.log2(r + 1))) for r in range(1, m + 1))
        for m in range(0, k + 1)
    }
    n_rel = relevant.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("__n_rel"))
    hits = (
        ranked.filter(F.col(rank_col) <= k)
        .join(relevant.select(query_col, id_col).withColumn("__rel", F.lit(1)),
              [query_col, id_col], "left")
        .withColumn("__rel", F.coalesce("__rel", F.lit(0))))
    dcg_term = F.when(
        F.col("__rel") == 1,
        F.round(F.lit(1e6) / F.log2(F.col(rank_col) + 1), 0).cast("long")
    ).otherwise(F.lit(0))
    per_q = hits.groupBy(query_col).agg(
        F.sum("__rel").alias("__hits"),
        F.count(F.lit(1)).alias("__returned"),
        F.min(F.when(F.col("__rel") == 1, F.col(rank_col))).alias("__first"),
        F.sum(dcg_term).alias("__dcg_micro"))

    def div4(num, den):
        # round(num/den, 4) half-up on the exact integer rational
        a = 20000 * num + den
        b = 2 * den
        return F.when(
            den > F.lit(0),
            (((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000),
        ).otherwise(F.lit(0.0))

    idcg_expr = F.element_at(
        F.array(*[F.lit(idcg[m]) for m in range(0, k + 1)]),
        F.least(F.col("__n_rel"), F.lit(k)).cast("int") + 1)
    return (
        per_q.join(F.broadcast(n_rel), query_col, "left")
        .withColumn("__n_rel", F.coalesce("__n_rel", F.lit(0)))
        .select(
            query_col,
            F.col("__hits").cast("int").alias("hits"),
            F.col("__n_rel").cast("int").alias("n_relevant"),
            div4(F.col("__hits"), F.col("__n_rel")).alias("recall_at_k"),
            div4(F.col("__hits"), F.lit(k)).alias("precision_at_k"),
            F.coalesce(div4(F.lit(1), F.col("__first")), F.lit(0.0))
            .alias("mrr"),
            div4(F.col("__dcg_micro"), idcg_expr).alias("ndcg_at_k"),
        ))
