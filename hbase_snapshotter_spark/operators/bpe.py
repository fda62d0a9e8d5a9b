"""BPE merge mining — the corpus-statistics half of tokenizer training
(SURVEY §2.3 N35).

Training a BPE tokenizer (Sennrich et al. 2016; the GPT-2/LLaMA
pipeline) over a 100 TB corpus splits into two very different halves:

1. **word counting** — corpus-scale, embarrassingly parallel: one
   explode + hash aggregation with map-side partials collapses
   terabytes of text into a VOCABULARY-sized ``(word, count)`` table
   (this is the only pass that touches the corpus — exactly how
   HuggingFace ``tokenizers`` and SentencePiece structure it);
2. **merge iteration** — vocabulary-local: every BPE merge step reads
   only the word-count table, which is MBs, not TBs.

Spark-first split: half 1 is :func:`word_counts`;
:func:`bpe_pair_counts` computes the adjacent-symbol pair histogram of
any symbolization DISTRIBUTED (zip_with of shifted slices → explode →
hash agg — zero Python, whole-stage codegen); :func:`bpe_train` runs
the merge loop driver-side on the collected vocabulary table — the
same sanctioned O(vocab) collect as the IVF centroid table (the
alternative, a Spark job per merge step over a megabyte of data,
would be thousands of jobs of pure overhead).

Symbols follow the classic formulation: characters plus a ``</w>``
end-of-word marker, every occurrence of a pair inside a word counted
(weighted by the word's corpus count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.text import tokens

#: End-of-word marker symbol (its own token in every pair stream).
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-scale pass: ``(word, wc)`` — one explode + one hash agg
    (map-side partials), the only stage that reads the text."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _char_symbols(word: Column) -> Column:
    """chars(word) ++ [EOW] — split("", -1) yields single characters."""
    return F.concat(F.split(word, "", -1), F.array(F.lit(EOW)))


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent-symbol pair histogram of the char+EOW symbolization:
    ``(sym_a, sym_b, pair_count)``, every in-word occurrence weighted
    by the word's corpus count — the statistic the first BPE merge
    maximizes.  The pair build is ``zip_with`` of two shifted slices
    (pure column exprs over the vocabulary-sized word table); with
    ``top_k`` the result is the TakeOrderedAndProject head under
    (count desc, sym_a, sym_b) — a total order, so ties are stable."""
    wc = word_counts(df, text_col)
    syms = wc.select(
        "wc", _char_symbols(F.col("word")).alias("s"),
        (F.size(F.split(F.col("word"), "", -1))).alias("n"))
    pairs = (
        syms.select(
            "wc",
            F.explode(F.zip_with(
                F.slice("s", 1, F.col("n")),
                F.slice("s", 2, F.col("n")),
                lambda a, b: F.struct(a.alias("sym_a"), b.alias("sym_b")),
            )).alias("p"))
        .groupBy(F.col("p.sym_a").alias("sym_a"),
                 F.col("p.sym_b").alias("sym_b"))
        .agg(F.sum("wc").alias("pair_count"))
    )
    if top_k is not None:
        pairs = pairs.orderBy(
            F.desc("pair_count"), "sym_a", "sym_b").limit(top_k)
    return pairs


def bpe_train(df: DataFrame, text_col: str = "text",
              *, n_merges: int = 10) -> list[tuple[str, str]]:
    """The merge loop: ``n_merges`` greedy merges over the COLLECTED
    word-count table (vocabulary-sized — the sanctioned sketch/index
    collect; the corpus was last touched by :func:`word_counts`).
    Ties break lexicographically, so the merge list is deterministic.
    Returns the learned merges in order."""
    vocab: dict[tuple[str, ...], int] = {}
    for row in word_counts(df, text_col).collect():
        vocab[tuple(row["word"]) + (EOW,)] = row["wc"]

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + wc
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, wc in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + wc
        vocab = new_vocab
    return merges


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]],
                     *, word_col: str = "word") -> DataFrame:
    """``(word, bpe)`` — each DISTINCT word's BPE token sequence under
    the learned merge list (N42, the APPLY half of the tokenizer lane).

    Encoding replays the merges in training order over the char+EOW
    symbolization — the exact rewrite loop :func:`bpe_train` applies to
    its vocabulary, so a word seen in training encodes to precisely the
    symbol sequence the trained vocab holds (pytest pins this
    equivalence).  Runs once per DISTINCT word (the GPT-2 encoder-cache
    trick lifted to a DataFrame): at 100 TB the word table is
    vocabulary-sized (MBs) while the corpus is not, so the per-word
    Python loop below is over MBs and the corpus-side cost is a
    broadcast join.  The merge list itself is tokenizer-artifact-sized
    (thousands of rows) and ships in the closure."""
    import pandas as pd

    def encode_one(word: str) -> list[str]:
        syms = list(word) + [EOW]
        for a, b in merges:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) == 1:
                break
        return syms

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                word_col: pdf[word_col],
                "bpe": [encode_one(w) for w in pdf[word_col]],
            })

    return (words.select(word_col).distinct()
            .mapInPandas(encode, f"{word_col} string, bpe array<string>"))


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document BPE token accounting under a trained merge list:
    ``(id, n_words, n_bpe_tokens, roundtrip_ok, tokens_bounded)``.

    The corpus pass is one posexplode + a BROADCAST join against the
    word→encoding table (vocabulary-sized by construction) + one
    map-side-combined aggregation — wire ≈ documents, the same
    broadcast-artifact shape as DSIR/decontamination/the LM filter.
    ``roundtrip_ok`` folds the losslessness invariant in-plan: every
    word's token concatenation must equal ``word + EOW`` (BPE only
    merges adjacent symbols, it can never alter the byte stream);
    ``tokens_bounded`` pins ``n_words <= n_bpe_tokens <= n_chars +
    n_words`` (≥1 token per word, ≤ one symbol per char + EOW).
    These feed :func:`~.sampling.pack_sequences` with REAL tokenizer
    counts instead of whitespace counts."""
    enc = bpe_encode_words(
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != ""),
        merges)
    enc = enc.select(
        "word", F.size("bpe").alias("__nt"),
        (F.concat_ws("", F.col("bpe"))
         == F.concat(F.col("word"), F.lit(EOW))).alias("__rt"))
    carry = list(carry_cols or [])
    words = df.select(
        F.col(id_col), *carry,
        F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy(id_col, *carry)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").alias("n_bpe_tokens"),
            F.bool_and("__rt").alias("roundtrip_ok"),
            (F.count(F.lit(1)) <= F.sum("__nt")).alias("__lb"),
            (F.sum("__nt")
             <= F.sum(F.length("word")) + F.count(F.lit(1))).alias("__ub"),
        )
        .select(id_col, *carry, "n_words", "n_bpe_tokens",
                "roundtrip_ok",
                (F.col("__lb") & F.col("__ub")).alias("tokens_bounded"))
    )


def bpe_lang_fertility(stats: DataFrame, *, lang_col: str = "lang") -> DataFrame:
    """Tokenizer fertility per language (SURVEY §2.3 N106): reduce
    per-doc BPE accounting (from :func:`bpe_token_stats` with
    ``carry_cols=[lang_col]``) to per-language economics —
    ``(lang, n_docs, n_words, n_bpe_tokens, fertility_x10000)`` with
    fertility = tokens/word as an exact half-up 4-dp integer.

    Fertility is THE multilingual tokenizer-equity metric (a tokenizer
    trained on English splits other scripts into more subwords, which
    taxes their effective context length and training compute); a
    mixture built on word counts alone mis-budgets languages with
    fertility far from the corpus mean.  One sessions-sized hash agg —
    input is the per-doc table, never the corpus."""
    n_words = F.sum("n_words").cast("long")
    n_toks = F.sum("n_bpe_tokens").cast("long")
    fert = 20000 * n_toks + n_words
    return (
        stats.groupBy(lang_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             n_words.alias("n_words"),
             n_toks.alias("n_bpe_tokens"),
             F.floor(fert / (2 * n_words)).cast("long")
             .alias("fertility_x10000")))
