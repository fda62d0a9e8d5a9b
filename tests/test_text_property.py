"""Property-based checks for the line-level text operators: hypothesis-
generated documents checked against independent pure-Python models of
line chunking and the Gopher line signals.  Catches rounding-mode and
boundary bugs (half-up vs banker's, dyadic ratios like 1/32 whose 5th
decimal is exactly 5) that hand-written examples can't enumerate."""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hbase_snapshotter_spark.operators.text import (
    doc_lines,
    line_signals,
    token_lines,
)


def r4(x: float) -> float:
    """Spark's ROUND: half-up on the double's exact decimal expansion
    (java.math.BigDecimal), NOT python's banker's round()."""
    return float(Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def model_signals(lines: list[str]) -> tuple[float, float, float]:
    n = len(lines)
    dup = r4(1.0 - len(set(lines)) / n) if n >= 2 else 0.0
    ell = r4(sum(1 for l in lines
                 if l.endswith("...") or l.endswith("…")) / n)
    mean = r4(sum(len(l) for l in lines) / n)
    return (dup, ell, mean)


# '.' makes natural '...' suffixes; '…' exercises the unicode ellipsis;
# duplicates are likely at this alphabet size
line_st = st.text(alphabet="ab .…", max_size=8).filter(lambda s: "\n" not in s)


@given(st.lists(line_st, min_size=1, max_size=40))
@settings(max_examples=25, deadline=None)
def test_line_signals_match_python_model(spark, lines):
    text = "\n".join(lines)
    row = (spark.createDataFrame([(text,)], "text string")
           .select(line_signals(doc_lines("text")).alias("s"))
           .collect()[0].s)
    assert (row.frac_dup_lines, row.frac_ellipsis_lines,
            row.mean_line_len) == model_signals(lines)


tok_st = st.text(alphabet="abc1", min_size=1, max_size=4)


@given(st.lists(tok_st, min_size=0, max_size=40),
       st.sampled_from([1, 2, 3, 5]))
@settings(max_examples=25, deadline=None)
def test_token_lines_match_python_model(spark, toks, per_line):
    expected = ([" ".join(toks[i:i + per_line])
                 for i in range(0, len(toks), per_line)] or [""])
    got = (spark.createDataFrame([(toks,)], "toks array<string>")
           .select(token_lines(F.col("toks"), per_line).alias("l"))
           .collect()[0].l)
    assert got == expected


doc_st = st.lists(st.text(alphabet="abcd", min_size=1, max_size=2),
                  min_size=0, max_size=12).map(lambda t: " ".join(t))


@given(st.lists(doc_st, min_size=1, max_size=8),
       st.lists(doc_st, min_size=1, max_size=3),
       st.sampled_from([2, 3]))
@settings(max_examples=15, deadline=None)
def test_contamination_hits_match_python_model(spark, train, eval_docs, n):
    """contamination_hits vs a pure-Python n-gram set model: distinct
    shared grams per train doc, docs shorter than n never collide, and
    clean docs are absent from the output."""
    from hbase_snapshotter_spark.operators.text import contamination_hits

    def grams(text: str) -> set:
        t = text.split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    eval_set = set().union(*(grams(d) for d in eval_docs))
    expected = {}
    for i, d in enumerate(train):
        hits = len(grams(d) & eval_set)
        if hits:
            expected[i] = hits

    train_df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(train)], "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(1000 + i, d) for i, d in enumerate(eval_docs)],
        "doc_id long, text string")
    got = {r.doc_id: r.eval_ngram_hits
           for r in contamination_hits(train_df, eval_df, n=n).collect()}
    assert got == expected


para_st = st.lists(st.sampled_from(["p1", "p2", "p3", "q"]),
                   min_size=0, max_size=6)


@given(st.lists(para_st, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_paragraph_dedup_matches_python_model(spark, doc_paras):
    """paragraph_dedup_stats vs a pure-Python global-keeper model:
    keeper is the smallest (doc, pos) per paragraph text, every other
    instance (including in-doc repeats) counts as a duplicate, and
    empty-paragraph docs emit no rows."""
    from hbase_snapshotter_spark.operators.dedup import paragraph_dedup_stats
    from pyspark.sql import functions as F

    seen: set = set()
    expected = {}
    for d, paras in enumerate(doc_paras):
        dups = 0
        for p in paras:
            if p in seen:
                dups += 1
            seen.add(p)
        if paras:
            expected[d] = (len(paras), dups)

    df = spark.createDataFrame(
        [(d, paras) for d, paras in enumerate(doc_paras)],
        "doc_id long, paras array<string>")
    got = {r.doc_id: (r.n_paragraphs, r.n_dup_paragraphs)
           for r in paragraph_dedup_stats(df, F.col("paras")).collect()}
    assert got == expected


def test_collocations_hand_computed(spark):
    """N111 PMI collocation mining on a hand corpus: lift equals the
    exact contingency rational, the min-count gate bites, slot
    marginals come from the bigram stream, and the top-k order is
    (lift DESC, pair)."""
    from hbase_snapshotter_spark.operators.text import collocations_topk

    rows = [
        (1, "new york new york new york"),
        (2, "a new day a new day"),
        (3, "york a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations_topk(df, "text", k=10, min_count=2).collect()
    by_pair = {(r.w1, r.w2): r for r in out}
    # bigram stream: doc1: (new,york)x3 (york,new)x2; doc2: (a,new)x2
    # (new,day)x2 (day,a)x1; doc3: (york,a)x1  -> N=11
    r = by_pair[("new", "york")]
    assert (r.n_pair, r.n_total) == (3, 11)
    assert r.n_first == 5   # 'new' first-slot: 3 + 2
    assert r.n_second == 3  # 'york' second-slot: 3
    assert r.lift == round(3 * 11 / (5 * 3), 6)
    assert ("day", "a") not in by_pair     # n_pair 1 < min_count
    assert ("york", "a") not in by_pair
    lifts = [r.lift for r in out]
    assert lifts == sorted(lifts, reverse=True)
