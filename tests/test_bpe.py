"""Unit tests for BPE merge mining (N35) — the classic Sennrich
example, merge determinism, and distributed-vs-driver pair-count
agreement."""

from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.bpe import (
    EOW,
    bpe_pair_counts,
    bpe_train,
    word_counts,
)


def _corpus(spark):
    # the classic BPE walkthrough corpus: low*5 lower*2 newest*6 widest*3
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_train_classic_merges(spark):
    merges = bpe_train(_corpus(spark), n_merges=4)
    # newest(6)+widest(3): es=9 dominates, then est=9, then est</w>=9;
    # 4th: lo appears in low(5)+lower(2)=7 beating everything else
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_pair_counts_match_driver_model(spark):
    df = _corpus(spark)
    got = {(r["sym_a"], r["sym_b"]): r["pair_count"]
           for r in bpe_pair_counts(df).collect()}
    # hand model: every in-word adjacent pair weighted by word count
    expect: dict = {}
    for row in word_counts(df).collect():
        syms = list(row["word"]) + [EOW]
        for a, b in zip(syms, syms[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + row["wc"]
    assert got == expect
    assert got[("e", "s")] == 9 and got[("t", EOW)] == 9


def test_empty_and_single_char_words(spark):
    df = spark.createDataFrame(
        [(1, "a  bb "), (2, "")], "doc_id long, text string")
    got = {(r["sym_a"], r["sym_b"]): r["pair_count"]
           for r in bpe_pair_counts(df).collect()}
    # 'a' contributes only (a, </w>); '' tokens are dropped
    assert got == {("a", EOW): 1, ("b", "b"): 1, ("b", EOW): 1}


def test_top_k_total_order(spark):
    rows = bpe_pair_counts(_corpus(spark), top_k=3).collect()
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    keys = [(r["sym_a"], r["sym_b"]) for r in rows]
    assert len(set(keys)) == 3


def test_bpe_encode_classic_sequences(spark):
    """Encoding under the trained merges yields the textbook token
    sequences, equals a pure-Python sequential replay, and unseen words
    fall back to partially-merged symbols."""
    from hbase_snapshotter_spark.operators.bpe import bpe_encode_words

    df = _corpus(spark)
    merges = bpe_train(df, n_merges=4)
    words = spark.createDataFrame(
        [("lowest",), ("newest",), ("low",), ("zz",)], "word string")
    got = {r["word"]: list(r["bpe"])
           for r in bpe_encode_words(words, merges).collect()}
    # pure-Python sequential replay (the bpe_train rewrite loop)
    def ref(word):
        syms = list(word) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms
    assert got == {w: ref(w) for w in got}
    assert got["newest"] == ["n", "e", "w", "est</w>"]
    assert got["lowest"] == ["lo", "w", "est</w>"]   # unseen word, merges apply
    assert got["zz"] == ["z", "z", EOW]              # no merge matches


def test_bpe_token_stats_invariants_and_counts(spark):
    """Per-doc accounting: exact word/token counts against the hand
    model, lossless round-trip, bounds hold, and empty/NULL text
    produces no row."""
    from hbase_snapshotter_spark.operators.bpe import bpe_token_stats

    df = _corpus(spark)
    merges = bpe_train(df, n_merges=4)
    extra = spark.createDataFrame(
        [(2, "low low zz"), (3, ""), (4, None)], "doc_id long, text string")
    out = {r.doc_id: r for r in
           bpe_token_stats(df.unionByName(extra), merges).collect()}
    assert set(out) == {1, 2}
    # doc 2: low->["low</w>"]? low encodes via merges: lo + w + </w>
    #   ("l","o") is merge 4; ("lo","w") and ("low",EOW) never learned
    assert out[2].n_words == 3
    assert out[2].n_bpe_tokens == 3 + 3 + 3  # lo,w,</w> x2 + z,z,</w>
    assert out[2].roundtrip_ok and out[2].tokens_bounded
    assert out[1].roundtrip_ok and out[1].tokens_bounded


def test_bpe_counts_feed_sequence_packing(spark):
    """Composition: pack_sequences consumes the REAL tokenizer counts
    from bpe_token_stats (not whitespace counts) — offsets advance by
    BPE token counts and stay inside the budget."""
    from hbase_snapshotter_spark.operators.bpe import bpe_token_stats
    from hbase_snapshotter_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "low newest " * (i + 1)) for i in range(6)],
        "doc_id long, text string")
    merges = bpe_train(df, n_merges=4)
    counted = bpe_token_stats(df, merges)
    packed = pack_sequences(counted, id_col="doc_id",
                            token_count_col="n_bpe_tokens",
                            budget=32, num_shards=2)
    rows = sorted(packed.collect(), key=lambda r: (r.pack_shard, r.doc_id))
    assert all(0 <= r.pack_offset < 32 for r in rows)
    # within a shard, offsets advance by the BPE counts (mod budget)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.pack_shard, []).append(r)
    for shard_rows in by_shard.values():
        run = 0
        for r in shard_rows:
            assert r.pack_offset == run % 32
            run += r.n_bpe_tokens


def test_bpe_lang_fertility_exact(spark):
    """N106 fertility per language against the pure-Python replay:
    carry_cols threads lang through the per-doc accounting unchanged,
    per-lang sums are exact, and fertility_x10000 is the half-up
    rational of the replayed token/word sums."""
    from hbase_snapshotter_spark.operators.bpe import (
        bpe_encode_words,
        bpe_lang_fertility,
        bpe_token_stats,
    )

    rows = [
        (1, "aa", "low low lower"),
        (2, "aa", "newest"),
        (3, "bb", "wider wider zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    merges = bpe_train(df, n_merges=3)
    stats = bpe_token_stats(df, merges, carry_cols=["lang"])
    per_doc = {r.doc_id: r for r in stats.collect()}
    assert {r.lang for r in per_doc.values()} == {"aa", "bb"}

    # pure-Python replay of the whole accounting
    enc = {r["word"]: list(r["bpe"]) for r in bpe_encode_words(
        spark.createDataFrame(
            [("low",), ("lower",), ("newest",), ("wider",), ("zz",)],
            "word string"), merges).collect()}
    texts = {1: ["low", "low", "lower"], 2: ["newest"],
             3: ["wider", "wider", "zz"]}
    langs = {1: "aa", 2: "aa", 3: "bb"}
    for d, words in texts.items():
        assert per_doc[d].n_words == len(words)
        assert per_doc[d].n_bpe_tokens == sum(len(enc[w]) for w in words)

    out = {r.lang: r for r in bpe_lang_fertility(stats).collect()}
    for lang in ("aa", "bb"):
        docs = [d for d, lg in langs.items() if lg == lang]
        W = sum(len(texts[d]) for d in docs)
        T = sum(len(enc[w]) for d in docs for w in texts[d])
        r = out[lang]
        assert (r.n_docs, r.n_words, r.n_bpe_tokens) == (len(docs), W, T)
        assert r.fertility_x10000 == (20000 * T + W) // (2 * W)
        assert r.fertility_x10000 >= 10000  # >= 1 token per word
