"""Property-based checks for bloom novelty (N34) and BPE training
(N35): hypothesis-generated inputs against independent pure-Python
models.  The bloom properties are the two that make the pruned
anti-join sound (no false negatives; exactness of the composed
result); the BPE property replays the greedy merge loop against a
from-scratch model."""

from hypothesis import given, settings, strategies as st

from hbase_snapshotter_spark.operators.bloom import novel_keys
from hbase_snapshotter_spark.operators.bpe import EOW, bpe_train

key_st = st.text(alphabet="abcdef", min_size=0, max_size=4)


@given(prior=st.lists(key_st, max_size=30),
       new=st.lists(key_st, min_size=1, max_size=30))
@settings(max_examples=12, deadline=None)
def test_bloom_novelty_matches_set_model(spark, prior, new):
    prior_df = spark.createDataFrame(
        [(k,) for k in prior] or [(None,)], "key string")
    new_df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(new)], "doc_id long, key string")
    got = {r["doc_id"]: r["novel"]
           for r in novel_keys(new_df, prior_df, "key").collect()}
    prior_set = set(prior)
    assert got == {i: k not in prior_set for i, k in enumerate(new)}


word_st = st.text(alphabet="ab", min_size=1, max_size=5)


def model_bpe(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[tuple, int] = {}
    for w in words:
        key = tuple(w) + (EOW,)
        vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, wc in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + wc
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nv: dict[tuple, int] = {}
        for syms, wc in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + wc
        vocab = nv
    return merges


@given(st.lists(word_st, min_size=1, max_size=25))
@settings(max_examples=10, deadline=None)
def test_bpe_train_matches_model(spark, words):
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    assert bpe_train(df, n_merges=5) == model_bpe(words, 5)
