"""Text-analysis operators for LLM-data pipelines (SURVEY §2.3 N15).

All operators are pure column expressions (higher-order array functions,
no Python on the data path) so they run inside whole-stage codegen and
scale linearly with document count — per-document work only, no shuffle.

Deterministic by construction: tokenization is whitespace split,
hashing is md5 (same function exists in DuckDB, so every operator here
is replayable by the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny marker-word profiles for the language-ID heuristic.  Real systems
# use char-n-gram profiles (textcat); the heuristic keeps the same shape
# — score per language, argmax with a fixed priority — with word markers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "es", "y", "una"],
    "fr": ["le", "les", "est", "et", "une"],
}

#: Small english stopword list for ratio features (deterministic subset).
STOPWORDS = ["the", "a", "an", "of", "and", "or", "is", "are", "to", "in"]

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(col), r"\s+")


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and hand it to ``fn`` as a
    lambda-bound variable.

    Higher-order functions are evaluated interpreted, with no common-
    subexpression elimination: an expression referenced inside a
    ``transform``/``filter`` lambda is RE-EVALUATED for every array
    element.  Any O(n) expression (a split, a hash array) used inside
    an O(n) lambda silently turns quadratic per row.  Wrapping it as
    the element of a one-element array makes it a lambda variable —
    computed exactly once — while staying a pure column expression.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def _count_in(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def lang_guess_expr(toks: Column) -> Column:
    """Marker-hit argmax with fixed priority en > de > es > fr."""
    h = {k: _count_in(toks, v) for k, v in LANG_MARKERS.items()}
    return (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["es"]) & (h["en"] >= h["fr"])
               & (h["en"] > 0), "en")
        .when((h["de"] >= h["es"]) & (h["de"] >= h["fr"]) & (h["de"] > 0), "de")
        .when((h["es"] >= h["fr"]) & (h["es"] > 0), "es")
        .when(h["fr"] > 0, "fr")
        .otherwise("unknown")
    )


def dup_2gram_ratio(toks: Column) -> Column:
    """Fraction of POSITIONAL token 2-grams that are repeats of an
    earlier 2-gram — the Gopher/C4-style repetition signal (high values
    flag boilerplate, keyword stuffing, and template spam).  0.0 for
    documents with fewer than two tokens.  Pure column expressions; the
    token array is :func:`bind_once`-bound so callers passing a raw
    split don't re-tokenize per gram."""
    def from_t(t: Column) -> Column:
        n = F.size(t) - 1
        grams = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)))
        ratio = 1.0 - F.size(F.array_distinct(grams)).cast("double") / n
        # sequence(1, k) DESCENDS for k < 1 — guard short docs explicitly
        return F.when(n >= 1, F.round(ratio, 4)).otherwise(F.lit(0.0))

    return bind_once(toks, from_t)


def digit_char_ratio(text: Column | str) -> Column:
    """Fraction of characters that are digits — the numeric-noise signal
    (high values flag tables, serial dumps, and machine logs)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.length(col) > 0,
        F.round(F.regexp_count(col, F.lit("[0-9]")).cast("double")
                / F.length(col), 4),
    ).otherwise(F.lit(0.0))


def doc_lines(text: Column | str) -> Column:
    """Physical lines of a document → array<string> (split on ``\\n``,
    blank lines kept — the Gopher line-level signals count them)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, "\n")


def token_lines(toks: Column, per_line: int) -> Column:
    """Deterministic line view of a token array: consecutive
    ``per_line``-token chunks joined with spaces → array<string>.

    For corpora whose text carries no newlines (the fixture documents),
    this gives the line-level quality signals a non-degenerate, engine-
    replayable input; corpora with real newlines use :func:`doc_lines`
    instead.  Pure column expressions; the token array is
    :func:`bind_once`-bound so it isn't re-split per chunk.
    """

    def from_t(t: Column) -> Column:
        n_lines = F.ceil(F.size(t) / F.lit(float(per_line))).cast("int")
        idx = F.sequence(F.lit(1), n_lines)
        chunks = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.slice(t, (i - F.lit(1)) * per_line + 1, per_line)))
        # sequence(1, k) DESCENDS for k < 1 — an empty token array would
        # fabricate two phantom lines; degrade to one empty line instead
        # (mirrors split('') so line_signals' denominators stay total)
        return F.when(F.size(t) >= 1, chunks) \
            .otherwise(F.array(F.lit("")))

    return bind_once(toks, from_t)


def line_signals(lines: Column) -> Column:
    """Gopher-style line-level quality signals over an array of lines →
    struct(frac_dup_lines, frac_ellipsis_lines, mean_line_len).

    - ``frac_dup_lines``: fraction of lines that repeat an earlier line
      (1 − distinct/total; 0.0 for single-line documents) — flags
      navigation chrome, footers, and template spam.
    - ``frac_ellipsis_lines``: fraction of lines ending in ``...`` or
      ``…`` — flags truncated teaser/listing pages.
    - ``mean_line_len``: mean characters per line — very low means
      menu/tag-soup pages.

    Pure column expressions (zero shuffle, per-document work only); the
    lines array is :func:`bind_once`-bound so callers can pass a raw
    :func:`doc_lines`/:func:`token_lines` expression without it being
    re-evaluated per signal.  ``split`` never yields an empty array
    (empty text → one empty line), so the ``size >= 1`` denominators are
    total; NULL text propagates NULL.
    """

    def from_l(l: Column) -> Column:
        n = F.size(l)
        # second .when (not .otherwise) so a NULL lines array yields
        # NULL, matching the other two signals — the docstring's
        # "NULL text propagates NULL" holds for the whole struct
        dup = F.when(
            n >= 2,
            F.round(1.0 - F.size(F.array_distinct(l)).cast("double") / n, 4),
        ).when(n.isNotNull(), F.lit(0.0))
        ell_hits = F.size(F.filter(
            l, lambda x: x.endswith("...") | x.endswith("…")))
        ell = F.round(ell_hits.cast("double") / n, 4)
        total_chars = F.aggregate(
            F.transform(l, F.length), F.lit(0), lambda acc, x: acc + x)
        mean_len = F.round(total_chars.cast("double") / n, 4)
        return F.struct(
            dup.alias("frac_dup_lines"),
            ell.alias("frac_ellipsis_lines"),
            mean_len.alias("mean_line_len"),
        )

    return bind_once(lines, from_l)


def text_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    id_cols: list[str] | None = None,
    toks_col: Column | None = None,
) -> DataFrame:
    """Per-document feature set: token counts, diversity, stopword ratio,
    a BPE-ish token estimate, a 0-1 quality score, language guess, and a
    content fingerprint (md5).

    ``toks_col`` optionally names an already-materialized token-array
    column (a cheap reference): the features reference the token array
    ~9 times and higher-order filters get no CSE, so callers that
    pre-tokenize in a prior projection avoid re-splitting per feature.
    """
    toks = toks_col if toks_col is not None else tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(text_col)
    stop_hits = _count_in(toks, STOPWORDS)
    diversity = n_distinct.cast("double") / n_tok
    stop_ratio = stop_hits.cast("double") / n_tok
    # quality = round(0.4·min(chars/500, 1) + 0.4·distinct/tokens
    #                 + 0.2·[any stopword], 4), computed entirely in
    # integer arithmetic: the inputs are exact integers, so the rounded
    # value is (20000·num + den) ÷ (2·den) with num/den the exact
    # rational — double rounding of 0.4·a + 0.4·b lands EXACTLY on
    # x.xxxx5 boundaries for a handful of documents per 5000 and the
    # two engines' round() then disagree by 1e-4 (hit at sf0.1).
    # Half-up on the exact rational is engine-independent.
    lc = F.least(n_chars, F.lit(500)).cast("long")
    ntl = n_tok.cast("long")
    q_num = 2 * lc * ntl + 1000 * n_distinct.cast("long") \
        + 500 * F.when(stop_hits > 0, 1).otherwise(0).cast("long") * ntl
    q_den = 2500 * ntl
    q_a, q_b = 20000 * q_num + q_den, 2 * q_den
    # (a - a mod b) / b: exact-multiple double division == integer div
    quality = (((q_a - F.pmod(q_a, q_b)) / q_b).cast("long")
               .cast("double") / 10000)
    keep = id_cols if id_cols is not None else [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).alias("n_bpe_tokens"),
        F.round(n_chars.cast("double") / n_tok, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(diversity, 4).alias("type_token_ratio"),
        dup_2gram_ratio(toks).alias("dup_2gram_ratio"),
        digit_char_ratio(F.col(text_col)).alias("digit_char_ratio"),
        quality.alias("quality_score"),
        lang_guess_expr(toks).alias("lang_guess"),
        F.md5(F.col(text_col)).alias("fingerprint"),
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct contiguous token n-grams → array<string>.  Expressed
    with sequence+transform so it stays JVM-side; the token array is
    :func:`bind_once`-bound so tokenization runs once per row, not once
    per gram."""
    def from_t(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
        # sequence(1, k) DESCENDS for k < 1 — guard short docs explicitly
        return F.when(F.size(t) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))

    return bind_once(toks, from_t)


def doc_shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """Exploded (id, shingle) inverted-index input — one row per distinct
    shingle per document."""
    return df.select(
        F.col(id_col), F.explode(shingles(tokens(F.col(text_col)), n)).alias("shingle")
    )


#: GPT-3's decontamination rule: any shared 13-gram marks a training
#: document contaminated by the eval set (Brown et al. 2020, appendix C).
CONTAM_NGRAM_N = 13


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = CONTAM_NGRAM_N,
) -> DataFrame:
    """Benchmark decontamination: for each training document, the number
    of distinct token ``n``-grams it shares with the held-out evaluation
    corpus.  Any collision (hits ≥ 1) marks the document contaminated
    under the GPT-3 / PaLM rule; consumers cut those rows before
    training so eval benchmarks stay honest.

    100 TB shape: the eval side is benchmarks — MBs against a TB-scale
    train side — so its distinct n-gram set is BROADCAST; the train
    side's n-gram explode is narrow per-row work, and the broadcast hash
    join drops non-colliding grams map-side, so the one shuffle (the
    per-document count aggregate) carries only actual collisions, rare
    by construction.  No train-side scan is re-keyed and nothing sorts.

    Returns ``(id_col, eval_ngram_hits ≥ 1)`` — non-contaminated
    documents are absent; consumers left-join and ``coalesce(0)``.
    """
    eval_grams = (
        eval_df.select(F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"),
    )
    # shingles() is per-document-distinct, so count(*) counts distinct
    # shared grams
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("eval_ngram_hits"))
    )


def winnow_fingerprints(toks: Column, *, k: int = 3, window: int = 4) -> Column:
    """Winnowing (rolling-hash) document fingerprints → array<string>.

    The MOSS selection scheme: hash every POSITIONAL token k-gram (order
    kept, duplicates kept — unlike :func:`shingles`), slide a window of
    ``window`` consecutive hashes, keep each window's minimum, dedupe.
    Guarantee: two documents sharing a token run of length ≥
    ``window + k - 1`` share at least one fingerprint, while storage is
    ~2/(window+1) of all k-gram hashes — the standard plagiarism /
    near-dup signature (Schleimer, Wilkerson, Aiken, SIGMOD'03).

    Pure column expressions (sequence/transform/slice/array_min): stays
    JVM-side, zero shuffle, composes with ``explode`` into the same
    inverted-index joins as the other dedup signatures.  md5 keeps the
    selection content-derived and engine-independent.

    Both the token array and the k-gram hash array are
    :func:`bind_once`-bound: referencing ``hashes`` inside the
    window-min lambda would re-evaluate all O(n) md5s for each of the
    O(n) windows — measured 28× slower at 54-token documents — and
    referencing the split inside the gram lambda would re-tokenize per
    gram.
    """
    empty = F.array().cast("array<string>")

    def select_mins(h: Column) -> Column:
        win_idx = F.sequence(F.lit(1), F.size(h) - (window - 1))
        mins = F.transform(win_idx, lambda i: F.array_min(F.slice(h, i, window)))
        # fewer than `window` k-grams: fall back to the global min
        # (every hash is a window min of a truncated window)
        return (
            F.when(F.size(h) >= window, F.array_distinct(mins))
            .when(F.size(h) >= 1, F.array(F.array_min(h)))
            .otherwise(empty)
        )

    def from_t(t: Column) -> Column:
        n_grams = F.size(t) - (k - 1)
        hashes = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, k))))
        # sequence(1, m) DESCENDS for m < 1 — guard short docs explicitly
        guarded = F.when(n_grams >= 1, hashes).otherwise(empty)
        return bind_once(guarded, select_mins)

    return bind_once(toks, from_t)


#: Redaction patterns for training-data scrubbing: (regex, replacement).
#: Simple character-class patterns only — they behave identically in
#: Java regex (Spark) and RE2 (DuckDB oracle).
SCRUB_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9_.#-]+@[A-Za-z0-9.-]+", "[EMAIL]"),
    (r"[0-9][0-9][0-9]+", "[NUM]"),       # runs of 3+ digits
]


def scrub_text(col: Column | str, patterns: list[tuple[str, str]] = SCRUB_PATTERNS) -> Column:
    """Redact sensitive-looking spans (emails, long digit runs) — the
    standard pre-training scrub, as chained regexp_replace expressions
    (JVM-side, zero shuffle)."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in patterns:
        out = F.regexp_replace(out, pattern, replacement)
    return out


#: Hashed feature-bucket count for the linear classifier stand-in.
CLS_BUCKETS = 64


def classifier_weights(buckets: int = CLS_BUCKETS) -> list[float]:
    """Deterministic stand-in weight vector for the hashed linear
    classifier — production replaces this with TRAINED weights (a
    fastText / logistic-regression quality model exported per hash
    bucket); everything downstream is unchanged.  Weights are derived
    from md5 of the bucket index, quantized to 4 dp in [-1, 1]."""
    import hashlib

    out = []
    for b in range(buckets):
        h = int(hashlib.md5(f"w{b}".encode()).hexdigest()[:4], 16)
        out.append(round(h / 32767.5 - 1.0, 4))
    return out


def hashed_linear_margin(
    toks: Column,
    weights: list[float] | None = None,
) -> Column:
    """fastText-style model-based scoring path: hash every token into
    one of ``len(weights)`` buckets (md5 — engine-independent), sum the
    bucket weights, round to 4 dp.  Positive margin = the classifier's
    "keep" side; consumers apply sigmoid/threshold.

    A SUM of 4-dp quantized weights (not a mean) so the score is never
    on a .00005 rounding boundary where engines disagree (the DSIR
    lesson); a constant never sits inside the token lambda un-bound, so
    the weight array is built once per row.

    Pure column expressions — whole-stage codegen, zero shuffle, zero
    Python; swapping in trained weights changes numbers, not the plan.
    """
    if weights is None:
        weights = classifier_weights()
    arr = F.array(*[F.lit(float(w)) for w in weights])
    n = len(weights)

    def from_t(t: Column) -> Column:
        per_tok = F.transform(
            t,
            lambda tok: F.element_at(
                arr,
                (F.conv(F.substring(F.md5(tok), 1, 4), 16, 10)
                 .cast("int") % n + 1)))
        return F.round(
            F.aggregate(per_tok, F.lit(0.0), lambda acc, x: acc + x), 4)

    return bind_once(toks, from_t)


def dedup_lines(lines: Column) -> Column:
    """Order-preserving removal of repeated lines WITHIN one document
    (keep the first occurrence) — the rewrite counterpart of the Gopher
    ``frac_dup_lines`` signal: flags measure boilerplate, this removes
    it before training.  Zero shuffle, pure column expression.

    Relies on ``array_distinct`` preserving first-occurrence order
    (Spark's implementation appends on first sighting).  That order is
    not a documented contract, so the registered query's DuckDB oracle
    replays first-occurrence order EXPLICITLY (window on position) —
    if a Spark upgrade ever changed the order, the driver hash turns
    red rather than silently reordering training text."""
    return F.array_distinct(lines)


#: Expected CDC chunk length in tokens (boundary probability 1/mod).
CDC_BOUNDARY_MOD = 8


def cdc_chunks(toks: Column, *, boundary_mod: int = CDC_BOUNDARY_MOD) -> Column:
    """Content-defined chunking (the rsync/LBFS insight): a chunk
    boundary falls AFTER every token whose md5 ≡ 0 (mod
    ``boundary_mod``), so expected chunk length is ``boundary_mod``
    tokens but boundaries move WITH the content — an insertion reshapes
    only the chunk it touches, where any fixed-width view (lines,
    k-token windows) shifts every downstream chunk and defeats
    downstream exact-chunk dedup.

    Pure column expression: one O(n) ``aggregate`` fold with a
    (chunks, current) struct accumulator — no Python, no shuffle.
    Returns array<string>; a trailing partial chunk is kept, empty
    chunks are never emitted.  Empty-string text is NOT token-less
    (``tokens('')`` = [``''``]) — its single '' token folds into an
    empty chunk which is then suppressed, so it still yields zero
    chunks; NULL text propagates NULL.
    md5-derived boundaries are engine-independent, so the oracle
    replays the exact chunking with a window over boundary counts."""

    def from_t(t: Column) -> Column:
        def step(acc, tok):
            new_cur = F.when(acc["cur"] == "", tok) \
                .otherwise(F.concat_ws(" ", acc["cur"], tok))
            is_b = (F.conv(F.substring(F.md5(tok), 1, 4), 16, 10)
                    .cast("int") % boundary_mod) == 0
            keep = new_cur != ""
            return F.struct(
                F.when(is_b & keep,
                       F.array_append(acc["chunks"], new_cur))
                .otherwise(acc["chunks"]).alias("chunks"),
                F.when(is_b, F.lit("")).otherwise(new_cur).alias("cur"),
            )

        init = F.struct(
            F.array().cast("array<string>").alias("chunks"),
            F.lit("").alias("cur"))
        return F.aggregate(
            t, init, step,
            lambda acc: F.when(
                acc["cur"] != "",
                F.array_append(acc["chunks"], acc["cur"]))
            .otherwise(acc["chunks"]))

    return bind_once(toks, from_t)


#: Gopher Table A1 repetition thresholds (char-coverage form): a doc is
#: repetition-flagged when ANY signal exceeds its threshold.
#:
#: Calibration note (VERDICT r7 minor #3): the thresholds are Gopher's
#: but the measure runs HOTTER than Gopher's on pathologically
#: self-overlapping text, because occurrences are counted per sliding
#: position rather than greedily non-overlapping — e.g. the 6-token doc
#: ``"a a a a a a"`` yields dup5_char_frac 18/11 ≈ 1.64 here (two
#: overlapping 5-gram occurrences × 9 chars over 11 doc chars) vs ≤ 1.0
#: under non-overlap counting (one occurrence fits).  The delta is one-
#: sided: overlap counting ≥ non-overlap counting always, so every doc
#: Gopher flags is flagged here too (no false negatives vs Gopher);
#: docs in the over-threshold margin created purely by self-overlap are
#: EXTRA flags.  Quantified by
#: ``tests/test_llm_ops.py::test_repetition_overlap_runs_hotter_than_gopher``.
REPETITION_THRESHOLDS: dict[str, float] = {
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup10_char_frac": 0.10,
}

#: n for "chars covered by the single most frequent n-gram".
REPETITION_TOP_NS = (2, 3, 4)
#: n for "chars covered by all duplicated n-grams".
REPETITION_DUP_NS = (5, 10)


def _round4_frac(num: Column, den: Column) -> Column:
    """round(num/den, 4) computed on the exact rational (half-up) —
    num/den in doubles lands EXACTLY on x.xxxx5 boundaries for some
    documents and the two engines' round() then disagree by 1e-4 (the
    text_features quality-score lesson).  (a − a mod b) ÷ b is an
    exact-multiple double division == integer division."""
    a = 20000 * num.cast("long") + den.cast("long")
    b = 2 * den.cast("long")
    return F.when(
        den > 0,
        (((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Gopher repetition filters, char-coverage form (SURVEY §2.3 N63;
    Rae et al. 2021 Table A1): per document,

    - ``top{2,3,4}_char_frac`` — fraction of the document's characters
      covered by the single most frequent {2,3,4}-gram (count × gram
      chars / doc chars);
    - ``dup{5,10}_char_frac`` — fraction covered by ALL {5,10}-grams
      that occur more than once (Σ count × gram chars / doc chars;
      overlapping occurrences counted per occurrence — documented
      deviation from Gopher's non-overlap counting, deterministic in
      both engines);
    - ``repetition_flagged`` — any signal over its Gopher threshold
      (:data:`REPETITION_THRESHOLDS`).

    Complements the count-ratio signals already in
    :func:`text_features` (``dup_2gram_ratio`` counts duplicated gram
    TYPES; these measure character MASS, which is what the Gopher
    filter actually thresholds).

    Scale shape: ONE projection builds all five n-gram streams per doc
    (higher-order exprs, codegen), ONE explode, and the only shuffled
    payload is ``(doc_id, n, 16-hex-char md5 prefix, gram chars)`` —
    the text itself never shuffles (the dedup-family rule).  Two hash
    aggs (gram counts → per-(doc,n) stats, both map-side-combined) +
    one conditional-agg pivot to columns, then a co-partitioned join
    back to the id table so gram-free (short) documents keep rows.
    All fractions are exact-rational half-up rounded
    (:func:`_round4_frac`), so the DuckDB oracle replays them
    bit-for-bit.

    Row-size note: the pre-explode gram array holds ~5× a document's
    tokens; pathological multi-MB documents should be length-capped
    upstream (every Gopher-style pipeline does) or chunked via
    :func:`~.sampling.context_chunks` first.
    """
    toks = tokens(F.col(text_col))
    all_ns = (*REPETITION_TOP_NS, *REPETITION_DUP_NS)

    def gram_structs(t: Column) -> Column:
        # One-arg lambda via a factory: a `lambda i, n=n:` default-arg
        # capture would have TWO parameters, which pyspark's transform
        # reads as the (element, index) form — `n` silently becomes the
        # 0-based array index.
        def gram_at(n: int):
            return lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(t, i, n)).alias("g"))

        per_n = [
            F.when(
                F.size(t) >= n,
                F.transform(F.sequence(F.lit(1), F.size(t) - n + 1),
                            gram_at(n)),
            ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))
            for n in all_ns
        ]
        return F.flatten(F.array(*per_n))

    # the doc-chars denominator is NOT carried through the gram
    # shuffles (it re-joins from the id table at the end) — 8 fewer
    # bytes per gram instance on the wire
    grams = (
        df.select(
            F.col(id_col),
            F.explode(bind_once(toks, gram_structs)).alias("__gr"))
        .select(
            id_col,
            F.col("__gr.n").alias("__n"),
            F.substring(F.md5("__gr.g"), 1, 16).alias("__h"),
            F.length("__gr.g").alias("__glen"))
    )
    counts = grams.groupBy(id_col, "__n", "__h").agg(
        F.count("*").alias("__cnt"),
        F.min("__glen").alias("__glen"))
    per_n = counts.groupBy(id_col, "__n").agg(
        F.max(F.struct("__cnt", "__h", "__glen")).alias("__top"),
        F.sum(F.when(F.col("__cnt") >= 2,
                     F.col("__cnt") * F.col("__glen"))
              .otherwise(F.lit(0))).alias("__dup_chars"))
    per_n = per_n.select(
        id_col, "__n", "__dup_chars",
        (F.col("__top.__cnt") * F.col("__top.__glen")).alias("__top_chars"))

    def pick(n: int, col: str) -> Column:
        return F.max(F.when(F.col("__n") == n, F.col(col)))

    pivoted = per_n.groupBy(id_col).agg(
        *[pick(n, "__top_chars").alias(f"__top{n}") for n in REPETITION_TOP_NS],
        *[pick(n, "__dup_chars").alias(f"__dup{n}") for n in REPETITION_DUP_NS])

    base = df.select(F.col(id_col), F.length(F.trim(text_col)).alias("__tot0"))
    joined = base.join(pivoted, id_col, "left")
    fracs = {
        f"top{n}_char_frac": _round4_frac(
            F.coalesce(F.col(f"__top{n}"), F.lit(0)), F.col("__tot0"))
        for n in REPETITION_TOP_NS
    }
    fracs.update({
        f"dup{n}_char_frac": _round4_frac(
            F.coalesce(F.col(f"__dup{n}"), F.lit(0)), F.col("__tot0"))
        for n in REPETITION_DUP_NS
    })
    flag = None
    for name, thr in REPETITION_THRESHOLDS.items():
        cond = fracs[name] > thr
        flag = cond if flag is None else (flag | cond)
    return joined.select(
        id_col,
        *[expr.alias(name) for name, expr in fracs.items()],
        flag.alias("repetition_flagged"))


#: Flag thresholds for the char-entropy signal: natural-language text
#: sits ~3.5–4.5 bits/char; near-0 means runs/padding, near-log2(|Σ|)
#: uniform noise.  Outside [1.5, 5.5] → gibberish-flagged.
ENTROPY_MIN_BITS = 1.5
ENTROPY_MAX_BITS = 5.5


def char_entropy_bits(text_col: Column | str) -> Column:
    """Per-document character-level Shannon entropy in bits/char
    (SURVEY §2.3 N73) — the cheap gibberish signal quality pipelines
    run next to the ratio features: binary dumps and padding runs sit
    near 0, encrypted/compressed noise near log₂|alphabet|, natural
    language in between.

    Pure column expressions: one pass collects the distinct chars of
    the doc, one ``transform`` counts each (O(|Σ|·L) array ops per doc,
    |Σ| ≤ alphabet size), and each term ``−(c/L)·log₂(c/L)`` is
    snapped to integer micro-bits and summed exactly (the N60/N66
    posture) so the value is bit-identical on any engine.  Empty/NULL
    text → 0.0 / NULL."""

    col = F.col(text_col) if isinstance(text_col, str) else text_col

    def from_chars(chars: Column) -> Column:
        n = F.size(chars)

        def term(c: Column) -> Column:
            cnt = F.size(F.filter(chars, lambda x: x == c))
            p = cnt.cast("double") / n
            return F.round(-p * F.log2(p) * 1e6, 0).cast("long")

        micro = F.aggregate(
            F.array_distinct(chars), F.lit(0).cast("long"),
            lambda acc, c: acc + term(c))
        # round(micro/1e6, 4) half-up on the exact integer rational
        a = 20000 * micro + F.lit(1_000_000)
        b = F.lit(2_000_000)
        bits = ((a - F.pmod(a, b)) / b).cast("long").cast("double") / 10000
        return F.when(n >= 1, bits).otherwise(F.lit(0.0))

    chars = F.when(F.length(col) > 0, F.split(col, "")) \
        .otherwise(F.array().cast("array<string>"))
    return bind_once(chars, from_chars)


def collocations_topk(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """PMI-ranked collocation mining (SURVEY §2.3 N111): the top-k
    adjacent word pairs by pointwise mutual information
    ``log(p(ab) / (p(a)·p(b)))`` with a minimum pair count — the
    classic collocation extractor (Church & Hanks 1990) behind phrase
    vocabularies, tokenizer seed merges, and index phrase fields.

    Engine-exactness: the log is MONOTONE in the integer rational
    ``n_ab·N / (n_a·n_b)``, so ranking never computes it — the score
    ships as that ratio's correctly-rounded double (identical bits in
    any IEEE engine since both operands are exact < 2^53 integers) and
    the PMI itself is derivable downstream.  Ties break on the pair
    text, so the top-k boundary is total-ordered.

    Scale shape: one projection builds the bigram stream (higher-order
    exprs), one explode; unigram and bigram counts are map-side-
    combined hash aggs; the bigram→unigram joins hit the
    ``min_count``-filtered bigram table (vocabulary-sized, never the
    corpus); the final top-k plans as TakeOrderedAndProject."""
    toks = tokens(F.col(text_col))
    bigrams = bind_once(toks, lambda t: F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.struct(
                F.element_at(t, i + 1).alias("w1"),
                F.element_at(t, i + 2).alias("w2")))
    ).otherwise(F.array()))
    base = df.filter(F.col(text_col).isNotNull()) \
        .select(F.explode(bigrams).alias("bg")) \
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # n_a / n_b are defined over the bigram stream itself (first /
    # second slot occurrences) — self-consistent, exactly replayable,
    # and the standard contingency-table marginals for adjacent pairs
    uni1 = base.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_first"))
    uni2 = base.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_second"))
    bg = (base.groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
          .filter(F.col("n_pair") >= min_count))
    total = base.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        bg.join(uni1.withColumnRenamed("w", "w1"), "w1")
        .join(uni2.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift",
            F.round((F.col("n_pair") * F.col("n_total")).cast("double")
                    / (F.col("n_first") * F.col("n_second")), 6)))
    return (scored
            .select("w1", "w2", "n_pair", "n_first", "n_second",
                    F.col("n_total").cast("long").alias("n_total"), "lift")
            .orderBy(F.col("lift").desc(), "w1", "w2")
            .limit(k))
