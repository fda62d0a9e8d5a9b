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
