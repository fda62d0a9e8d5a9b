"""N-gram language-model scoring for quality filtering (SURVEY §2.3 N29).

The CCNet recipe (Wenzek et al. 2020) — score every document's
perplexity under a language model trained on a trusted reference corpus
(they use KenLM on Wikipedia) and keep the low-perplexity (fluent)
band — is a staple of every production pre-training pipeline.  This is
its Spark-first form with an add-one-smoothed BIGRAM model standing in
for KenLM (the n-gram estimator is public math; a trained KenLM binary
would slot into the same plan as a broadcast table):

    reference slice → bigram/prefix count tables   (one aggregation each)
    every document  → positional bigrams           (narrow explode)
    score           → join counts, -mean log₂ p    (map-side, hash-agg)

100 TB shape — the same one :func:`~.sampling.dsir_logratio` uses and
SCALE.md documents: the model tables are VOCABULARY-bounded, not
corpus-bounded (CCNet's actual KenLM is a fixed ~few-GB artifact), so
they broadcast; the document side is one narrow explode whose join is
map-side; the per-doc mean is a hash aggregate with map-side partials —
wire cost ≈ documents, not tokens.  Everything is md5-free determinism:
counts and logs replay bit-for-bit in the DuckDB oracle (log/round on
doubles, same class of 4-dp boundary risk the module header of
``similarity.py`` documents for every rounded score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshotter_spark.cache import scoped_persist
from hbase_snapshotter_spark.operators.text import tokens


def doc_bigrams(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text",
                carry: tuple[Column, ...] = ()) -> DataFrame:
    """(id, [carry...,] w1, w2) — POSITIONAL token bigrams (duplicates
    kept: LM scoring weights each occurrence).  Documents with < 2
    tokens emit no rows — callers left-join scores back.  The token
    array is bound once; the bigram build is a pure column expression
    feeding one explode (no shuffle).  ``carry`` columns are evaluated
    on the document row and replicated onto its bigram rows — carrying
    a per-doc flag through the explode instead of joining it back onto
    the token-scale table (r13, guide §2.4)."""
    from hbase_snapshotter_spark.operators.text import bind_once

    def grams(t: Column) -> Column:
        n = F.size(t) - 1
        pairs = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2")))
        # sequence(1, k) DESCENDS for k < 1 — guard short docs
        return F.when(n >= 1, pairs).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>"))

    exploded = df.select(
        F.col(id_col), *carry,
        F.explode(bind_once(tokens(F.col(text_col)), grams)).alias("__g"))
    keep = [c for c in exploded.columns if c != "__g"]
    return exploded.select(
        *keep, F.col("__g.w1").alias("w1"), F.col("__g.w2").alias("w2"))


def bigram_lm_xent(
    df: DataFrame,
    is_ref: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy (bits/bigram) under an add-one-
    smoothed bigram model estimated on the ``is_ref`` slice:

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

    with ``c(w1 ·)`` the reference count of bigrams starting at ``w1``
    and ``V`` the reference vocabulary size (so unseen prefixes degrade
    to the uniform 1/V, never zero).  Returns ``(id_col, n_bigrams,
    lm_xent_bits)`` — lower = more like the reference corpus (CCNet
    keeps the low-perplexity head/middle); documents with < 2 tokens
    have no row.

    The bigram explode feeds the count aggregation AND the scoring
    join, so it is scope-persisted; both count tables and the one-row
    vocab aggregate broadcast (vocabulary-sized — the KenLM-artifact
    bound, see module docstring).

    r13 (guide §2.3/§2.4): the ``is_ref`` flag rides the explode as a
    ``carry`` column instead of being joined back onto the token-scale
    bigram table, and the prefix table derives from the bigram table —
    ``c(w1 ·) = Σ_w2 c(w1 w2)`` exactly — so only ONE token-scale
    aggregation remains (``c2``, persisted: it feeds both the broadcast
    scoring join and the ``c1`` rollup, which is vocabulary-sized)."""
    bg = scoped_persist(
        doc_bigrams(df, id_col=id_col, text_col=text_col,
                    carry=(is_ref.alias("__ref"),)))
    c2 = scoped_persist(bg.filter("__ref").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__c2")))
    c1 = c2.groupBy("w1").agg(F.sum("__c2").alias("__c1"))
    vocab = (
        df.filter(is_ref)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.countDistinct("tok").alias("__v")))
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__bits",
            F.log2(F.coalesce("__c1", F.lit(0)) + F.col("__v"))
            - F.log2(F.coalesce("__c2", F.lit(0)) + 1)))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(F.avg("__bits"), 4).alias("lm_xent_bits"))
