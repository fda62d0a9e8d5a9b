"""Deterministic sampling and dataset splitting (training-data staple).

``df.sample()`` is seed-dependent and partitioning-sensitive; at 100 TB
the reproducible pattern is **hash-mod sampling**: bucket each row by a
content hash of its key and keep buckets below the rate.  Properties
that matter for ML pipelines:

- fully deterministic — same rows selected on any cluster, any
  partitioning, any engine (md5-based, replayable by the SQL oracle);
- stable under data growth — a row's bucket never changes, so samples
  and splits are consistent across incremental runs (no train/test
  leakage when data is re-processed);
- zero coordination — a narrow per-row filter, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Number of hash buckets; rates are expressed in 1/1000ths.
BUCKETS = 1000


def hash_bucket(col: Column | str) -> Column:
    """Stable bucket in [0, BUCKETS): first 8 md5 hex digits mod 1000.
    (conv is the Spark twin of the oracle's CAST('0x…' AS BIGINT).)

    NULL keys hash as the sentinel ``"\\x00NULL"`` rather than md5(NULL)
    = NULL, so bucket assignment is total: NULL-key rows land in a
    deterministic bucket instead of silently vanishing from samples and
    all routing to 'test' in splits."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.coalesce(c.cast("string"), F.lit("\x00NULL"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (h % BUCKETS).cast("int")


def deterministic_sample(df: DataFrame, key_col: str, rate_permille: int) -> DataFrame:
    """Keep ~rate‰ of rows, selected by key hash — reproducible anywhere."""
    return df.filter(hash_bucket(key_col) < rate_permille)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    *,
    val_permille: int = 100,
    test_permille: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label; boundaries are hash-bucket
    ranges so membership never flips between runs or engines."""
    b = hash_bucket(key_col)
    train_hi = BUCKETS - val_permille - test_permille
    return df.withColumn(
        out_col,
        F.when(b < train_hi, "train")
        .when(b < train_hi + val_permille, "val")
        .otherwise("test"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_count_col: str,
    budget: int,
    num_shards: int = 64,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """GPT-style "crammed" sequence packing: documents are concatenated
    in a deterministic order and cut every ``budget`` tokens; each
    document is assigned the pack where it STARTS, plus its token offset
    inside that pack (documents may span pack boundaries — the trainer
    masks cross-document attention; no padding waste by construction).

    A single global running sum would be a one-partition sort, so the
    100 TB form shards documents by key hash (deterministic,
    coordination-free — same ``hash_bucket`` as sampling/splitting) and
    packs within each (partition_cols…, shard) group independently: the
    cumulative sum window is ``num_shards``-way parallel (size the shard
    count to the cluster), membership is stable across runs and engines,
    and the only waste is one partial pack per shard tail.
    ``partition_cols`` keeps logical datasets separate (e.g. pack train /
    val / test independently — never mix splits in one sequence).

    Adds columns: ``pack_shard`` (int), ``pack_id`` (string
    ``<partition…>-<shard>-<bin>``), ``pack_offset`` (long, token offset
    of the doc's start within its pack).  Arithmetic is exact integer
    (sum, pmod, exact-multiple division) — no double rounding at any
    corpus size."""
    shard = (hash_bucket(id_col) % num_shards).alias("pack_shard")
    out = df.withColumn("pack_shard", shard)
    w = (
        Window.partitionBy(*partition_cols, "pack_shard")
        .orderBy(id_col)
    )
    tc = F.col(token_count_col).cast("long")
    start = F.sum(tc).over(w) - tc  # exclusive prefix sum
    bin_ = ((start - F.pmod(start, F.lit(budget))) / F.lit(budget)).cast("long")
    return (
        out.withColumn(
            "pack_id",
            F.concat_ws("-", *[F.col(c) for c in partition_cols],
                        F.col("pack_shard"), bin_))
        .withColumn("pack_offset", F.pmod(start, F.lit(budget)))
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    rates_permille: dict[str, int],
    *,
    default_permille: int = 0,
    out_col: str = "in_mixture",
) -> DataFrame:
    """Per-domain hash-mod sampling — the static form of training-
    mixture reweighting (The Pile / DoReMi-style source weights):
    domain ``d`` keeps ``rates_permille[d]``‰ of its rows by key hash,
    unlisted domains keep ``default_permille``‰.  Downsampling only —
    rates above 1000 (epoch-style upsampling) are rejected, integral
    duplication belongs to the data loader.

    The bucket key is salted with the purpose tag ``"#mix"`` so mixture
    membership is INDEPENDENT of the split/sample buckets computed from
    the bare key (an unsalted reuse would nest every flag inside the
    same bucket order: a 200‰ sample would then be a subset of the
    train split, never spanning val/test).

    Same guarantees as :func:`deterministic_sample`: per-row narrow
    filter, no shuffle, stable across runs / engines / data growth."""
    for d, r in rates_permille.items():
        if not 0 <= r <= BUCKETS:
            raise ValueError(f"mixture_sample: rate for {d!r} must be "
                             f"in [0, {BUCKETS}], got {r}")
    if not 0 <= default_permille <= BUCKETS:
        raise ValueError("mixture_sample: default rate out of range")
    rate = F.lit(default_permille)
    for d, r in sorted(rates_permille.items()):
        rate = F.when(F.col(domain_col) == F.lit(d), F.lit(r)).otherwise(rate)
    key = F.concat(F.coalesce(F.col(key_col).cast("string"),
                              F.lit("\x00NULL")), F.lit("#mix"))
    return df.withColumn(out_col, hash_bucket(key) < rate)


def domain_cap(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    cap: int,
    *,
    out_col: str = "in_domain_cap",
    count_col: str = "domain_docs",
) -> DataFrame:
    """RefinedWeb-style per-domain rebalancing: no domain contributes
    (in expectation) more than ``cap`` documents — over-represented
    hosts/sources are down-sampled to the cap, small domains pass
    untouched.  Adds ``out_col`` (keep flag) and ``count_col`` (the
    domain's total).

    The 100 TB form is RATE-based, not rank-based: an exact "keep the
    first cap docs per domain" is a per-domain ORDER (a window sort
    over the full corpus, with the hottest domain as the slowest
    partition — precisely the skew being fixed).  Instead each domain
    keeps rate ``min(1, cap/n_d)`` of its rows by salted key hash:

    - one hash aggregation computes per-domain counts (map-side
      partials; output is domain-cardinality-sized and broadcasts);
    - the keep decision is a narrow per-row filter — no shuffle, no
      sort, no skew (the binomial spread around the cap is √cap-sized,
      irrelevant at training scale);
    - the rate is an exact threshold in the RAW 32-bit hash space
      (``floor(cap·2³²/n_d)``, IEEE-identical on both engines) — NOT
      the coarse permille buckets of the samplers: a permille rate
      floors to 0 for any domain with n_d > 1000·cap, which would
      DELETE the biggest domains instead of capping them (exactly the
      hosts rebalancing targets).  At 1/2³² resolution the smallest
      non-zero rate covers domains up to cap·4·10⁹ docs.  The hash is
      the same md5 prefix as every sampler here, so membership is
      stable across runs/engines and the SQL oracle replays it
      bit-for-bit.

    The bucket key is salted ``"#cap"`` so cap membership is
    independent of split/sample/mixture buckets (same reasoning as
    :func:`mixture_sample`).  A NULL domain is ONE domain (coalesced to
    a sentinel for the count join — a plain equi-join would silently
    drop NULL-domain rows), mirroring the NULL-total contract of every
    sampler in this module."""
    if cap <= 0:
        raise ValueError(f"domain_cap: cap must be positive, got {cap}")
    dom = F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00NULL"))
    counts = (df.groupBy(dom.alias("__dom"))
              .agg(F.count(F.lit(1)).alias(count_col)))
    scale = 1 << 32
    rate = F.least(
        F.lit(scale).cast("long"),
        F.floor(F.lit(float(cap * scale)) / F.col(count_col)).cast("long"))
    key = F.concat(F.coalesce(F.col(key_col).cast("string"),
                              F.lit("\x00NULL")), F.lit("#cap"))
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (
        df.withColumn("__dom", dom)
        .join(F.broadcast(counts), "__dom")
        .withColumn(out_col, h32 < rate)
        .drop("__dom")
    )


def dsir_logratio(
    df: DataFrame,
    is_target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): for each document,
    the mean per-token log-ratio of target-corpus vs whole-corpus
    unigram probabilities (add-1 smoothed over the shared vocabulary).
    Positive = looks more like the target distribution; downstream
    samplers keep rows proportionally.  Returns ``(id_col,
    dsir_logratio)`` rounded to 4 dp.

    100 TB shape: the two frequency tables are VOCABULARY-sized (the
    hashed-feature trick in the paper exists precisely to bound this),
    so both broadcast; the corpus-size normalizers are one-row
    aggregates attached by broadcast cross join.  ONE token-sized pass
    exists — the explode straight into the map-side-combined
    ``(doc, token) → count`` aggregate; every downstream stage (the
    frequency tables, the per-DISTINCT-token log-ratio table, the
    per-doc weighted mean) runs over that compacted table, so the
    log() is evaluated once per vocabulary entry instead of once per
    token instance (the r11 fix that took the measured 10×→100×
    exponent off the 0.90 near-linear wall — wire cost ≈ distinct
    (doc, token) pairs, not tokens)."""
    from hbase_snapshotter_spark.cache import scoped_persist
    from hbase_snapshotter_spark.operators.text import tokens

    doc_tok = scoped_persist(
        df.select(F.col(id_col), is_target.alias("__t"),
                  F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "__t", "tok")
        .agg(F.count(F.lit(1)).alias("__cnt")))
    corpus_freq = doc_tok.groupBy("tok").agg(
        F.sum("__cnt").alias("__c_all"))
    target_freq = doc_tok.filter("__t").groupBy("tok").agg(
        F.sum("__cnt").alias("__c_t"))
    totals = doc_tok.agg(
        F.sum("__cnt").alias("__n_all"),
        F.sum(F.when(F.col("__t"), F.col("__cnt")).otherwise(0))
        .alias("__n_t"),
        F.countDistinct("tok").alias("__v"))
    lr_table = (  # vocab ⟕ vocab: broadcast the target side (smaller)
        corpus_freq.join(F.broadcast(target_freq), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (F.log((F.coalesce("__c_t", F.lit(0)) + 1)
                   / (F.col("__n_t") + F.col("__v")))
             - F.log((F.col("__c_all") + 1)
                     / (F.col("__n_all") + F.col("__v"))))
            .alias("__lr")))
    return (doc_tok.join(F.broadcast(lr_table), "tok")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("__cnt") * F.col("__lr"))
                         / F.sum("__cnt"), 4).alias("dsir_logratio")))


def range_bucket(score_col: Column | str, boundaries_col: Column | str) -> Column:
    """Curriculum range-bucket assignment: ``#{b in boundaries : score
    >= b}`` — a pure column fold over the (k−1)-element boundary array,
    zero shuffle, zero Python.  Monotone in the score by construction,
    so per-bucket score ranges never overlap whatever the boundaries.

    The 100 TB shape for curriculum ordering (length/quality-sorted
    training shards, Li et al. 2022 "stability-plasticity" schedules):
    boundaries come from ONE quantile aggregation (percentile_approx —
    a mergeable sketch, constant memory; its exact twin replays in the
    oracle), attach as a one-row broadcast, and the assignment is this
    narrow expression — no global sort, no range shuffle.  Writing
    shards then partitions by the bucket column (hive layout), giving
    globally range-ordered output without ``repartitionByRange``'s
    sampling pass."""
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    b = (F.col(boundaries_col) if isinstance(boundaries_col, str)
         else boundaries_col)
    return F.aggregate(
        b, F.lit(0),
        lambda acc, x: acc + F.when(s >= x, 1).otherwise(0),
    ).alias("bucket")


def context_chunks(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    max_len: int,
    overlap: int = 0,
) -> DataFrame:
    """Sliding-window context chunking (N44): split each document's
    token sequence into ``max_len``-token chunks whose starts advance
    by ``max_len - overlap`` — the standard long-document preparation
    for a fixed context window (the HuggingFace
    ``return_overflowing_tokens``/``stride`` convention): consecutive
    chunks share ``overlap`` tokens so no span longer than the window
    ever straddles a cut unseen.

    Emits one row per chunk: ``(id, chunk_idx, chunk_start, chunk_len,
    first_token, last_token)``.  Chunk count is the closed form
    ``1 if n <= max_len else ceil((n - max_len)/step) + 1`` — the
    trailing chunk is the first one that reaches the end, so no chunk
    is ever fully contained in its predecessor.  Documents with NULL
    token arrays produce no rows; empty-array documents one empty
    chunk is NOT a convention anyone wants, so they also produce none.

    Everything is exact integer arithmetic over ``posexplode(
    sequence(...))`` — zero shuffle, zero Python, whole-stage codegen;
    the output feeds :func:`pack_sequences` (chunks pack like short
    documents) and any window-bounded trainer.  At 100 TB the fan-out
    is bounded by ceil(n/step) per document and carries no token text
    beyond the two boundary tokens."""
    if max_len < 1:
        raise ValueError(f"context_chunks: max_len must be >= 1, got {max_len}")
    if not 0 <= overlap < max_len:
        raise ValueError(
            f"context_chunks: overlap must be in [0, max_len), got {overlap}")
    step = max_len - overlap
    toks = F.col(tokens_col)
    nt = F.size(toks)
    n_chunks = F.when(nt <= max_len, F.lit(1)).otherwise(
        F.ceil((nt - max_len) / F.lit(step)) + 1).cast("int")
    base = (
        df.filter(toks.isNotNull() & (nt > 0))
        .select(F.col(id_col), toks.alias("__t"), nt.alias("__n"),
                F.explode(F.sequence(F.lit(0), n_chunks - 1))
                .alias("chunk_idx"))
    )
    start = F.col("chunk_idx") * step
    end = F.least(start + max_len, F.col("__n"))
    return base.select(
        id_col,
        "chunk_idx",
        start.cast("int").alias("chunk_start"),
        (end - start).cast("int").alias("chunk_len"),
        F.element_at("__t", start + 1).alias("first_token"),
        F.element_at("__t", end.cast("int")).alias("last_token"),
    )


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    *,
    key_col: str,
    margin: int = 4,
) -> DataFrame:
    """Exact-allocation stratified sampling (SURVEY §2.3 N56): EXACTLY
    ``min(n_per_stratum, |stratum|)`` rows per stratum — deterministic,
    engine-replayable, partitioning-independent — unlike ``sampleBy``,
    whose binomial draw only hits the target in expectation (an eval
    set carved with sampleBy has a different size every run AND a
    random composition).

    Selection rule: each stratum keeps the bottom-``n`` rows of the
    total order ``(hash_bucket(key), md5(key), key)`` — a content-
    derived order, so membership survives reruns, repartitioning, and
    engine changes, and the SQL oracle replays it verbatim.  Output =
    input columns + ``strat_rank`` (1-based within the stratum).

    Scale shape: ranking bottom-n of a 10⁹-row stratum must NOT sort
    the stratum.  Because ``hash_bucket`` is the PRIMARY sort key, the
    rows with ``bucket < B`` are a PREFIX of the total order — so the
    window only runs over a hash band sized from the stratum's count
    (one agg pass): ``B = ceil(1000·n·margin/|stratum|)``, expected
    band population ``margin × n``.  Bottom-n within the band == 
    bottom-n of the full stratum whenever the band holds ≥ n rows;
    strata whose band came up short (adversarial hash clustering —
    probability ~e^{-margin·n/3} by Chernoff) fall back to the full
    stratum, detected in-plan by a survivor count.  Window input is
    therefore ∝ requested sample size, never corpus size."""
    if n_per_stratum <= 0:
        raise ValueError("stratified_exact_sample: n_per_stratum must be > 0")
    strata = list(strata_cols)
    sizes = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("__sz"))
    bucket = hash_bucket(key_col)
    band = F.least(
        F.lit(BUCKETS),
        F.ceil(F.lit(BUCKETS * n_per_stratum * margin) / F.col("__sz")))
    with_band = (
        df.join(F.broadcast(sizes), strata)
        .withColumn("__bkt", bucket)
        .withColumn("__band", band)
    )
    in_band = with_band.filter(F.col("__bkt") < F.col("__band"))
    survivors = in_band.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("__n_band"))
    # strata with a short band (survivors < n) re-window over ALL rows;
    # the rest window over their band only — same total order either way
    short = survivors.filter(
        F.col("__n_band") < F.lit(n_per_stratum)).select(*strata)
    widened = with_band.join(F.broadcast(short), strata, "left_semi")
    narrow = in_band.join(F.broadcast(short), strata, "left_anti")
    # the tie-break uses the coalesced STRING key on purpose: engines
    # disagree on NULL sort position (Spark nulls-first vs DuckDB
    # nulls-last), and the sentinel makes the order total either way;
    # key_col should be row-unique (an id) for a fully deterministic
    # rank — two identical NULL keys are indistinguishable by content
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00NULL"))
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(
        F.col("__bkt"), F.md5(key), key)
    ranked = (
        narrow.unionByName(widened)
        .withColumn("strat_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("strat_rank") <= n_per_stratum)
    )
    return ranked.drop("__sz", "__bkt", "__band")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    group_col: str | None = None,
    salt: str = "#ws",
) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement (SURVEY §2.3
    N71; Efraimidis & Spirakis 2006): per group, the ``k`` rows with
    the largest ``u^(1/w)`` where ``u`` is a deterministic uniform
    drawn from the row key — rows are included with probability
    proportional to weight, exactly the A-ES scheme corpus
    subsampling uses when documents carry quality weights.

    Determinism replaces randomness (the repo-wide posture): ``u``
    comes from the md5 of the salted key (``(h32+1)/(2³²+1)`` ∈ (0,1)),
    so the sample is reproducible, partitioning-independent, and
    oracle-replayable.  Ranking uses ``ln(u)/w`` (monotone in
    ``u^(1/w)``), rounded at 9 dp so an engine libm ulp difference
    cannot reorder two keys; residual ties break toward the smaller
    key — both engines sort identically.

    Scale shape: one narrow projection computes the key (codegen, no
    Python), then a window-free per-group top-k hash-agg (the
    :func:`~.similarity.topk_by_group` shape with the weight riding
    the struct as a payload) — map-side partials, shuffle carries
    groups × k candidate structs, never a global sort and never a
    corpus re-join.
    Weights must be > 0 (caller contract, enforced as a filter).

    Returns ``([group_col,] key_col, weight_col, es_key, sample_rank)``.
    """
    h32 = F.conv(F.substring(F.md5(F.concat_ws("|", F.col(key_col),
                                               F.lit(salt))), 1, 8),
                 16, 10).cast("long")
    u = (h32 + 1) / F.lit(float(2**32 + 1))
    es_key = F.round(F.log(u) / F.col(weight_col), 9)
    g = group_col or "__g"
    scored = (
        df.filter(F.col(weight_col) > 0)
        .select(*([group_col] if group_col else []),
                F.col(key_col), F.col(weight_col), es_key.alias("es_key")))
    if group_col is None:
        scored = scored.withColumn("__g", F.lit(1))
    # the topk_by_group shape with the weight riding the struct as a
    # payload field (it sits after the id tie-break, so it never
    # affects ordering) — no corpus re-join to recover the weight
    agg = scored.groupBy(g).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("es_key"),
                    (-F.col(key_col)).alias("__neg_id"),
                    F.col(weight_col).alias("__w"))),
                asc=False),
            1, k).alias("__top"))
    out = agg.select(
        g, F.posexplode("__top").alias("__pos", "__t")
    ).select(
        *([group_col] if group_col else []),
        (-F.col("__t.__neg_id")).alias(key_col),
        F.col("__t.__w").alias(weight_col),
        F.col("__t.es_key").alias("es_key"),
        (F.col("__pos") + 1).cast("int").alias("sample_rank"))
    return out


def epoch_replicate(
    df: DataFrame,
    key_col: str,
    epochs: dict[str, float],
    *,
    source_col: str = "source",
    salt: str = "#ep",
) -> DataFrame:
    """Epoch-aware source replication (SURVEY §2.3 N77; the
    data-constrained-scaling recipe of Muennighoff et al. 2023):
    materialize each source at a FRACTIONAL epoch count — "2.3 epochs
    of source A, 0.8 of source B" — by emitting ``ceil(f)`` copies per
    row and keeping the last copy only for the deterministic
    ``frac(f)`` slice of rows (md5 permille of the salted key, the
    N22 mixture machinery), so every source's realized volume is
    ``f × |source|`` in expectation with zero randomness.

    Each emitted copy carries ``copy_idx`` (1-based) — downstream
    packing/shuffling sees distinct rows, and the (key, copy_idx) pair
    stays a stable identity across reruns and partitionings.  Sources
    absent from ``epochs`` default to one epoch (single copy).

    Scale shape: a pure per-row ``explode`` of a ≤ ``ceil(max f)``
    sequence — no shuffle, no join; the epoch table rides the plan as
    literals.  Fan-out is the POINT (the training mix is larger than
    the corpus); wire cost is exactly the emitted volume."""
    def permille(key):
        h = F.conv(F.substring(F.md5(F.concat_ws("|", key, F.lit(salt))),
                               1, 8), 16, 10).cast("long")
        return h % 1000

    src = F.col(source_col)
    f_expr = F.lit(1.0)
    for name, f in epochs.items():
        if f < 0:
            raise ValueError(f"epoch_replicate: negative epochs for {name}")
        f_expr = F.when(src == name, F.lit(float(f))).otherwise(f_expr)
    n_full = F.floor(f_expr).cast("int")
    frac_permille = F.round((f_expr - n_full) * 1000, 0).cast("int")
    keep_partial = permille(F.col(key_col)) < frac_permille
    n_copies = (n_full + F.when(keep_partial, 1).otherwise(0))
    out = df.withColumn("__n", n_copies).filter(F.col("__n") >= 1)
    return (
        out.withColumn("copy_idx",
                       F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n"))


def batch_padding_audit(
    df: DataFrame,
    *,
    id_col: str,
    token_count_col: str,
    batch_size: int,
    num_shards: int = 8,
) -> DataFrame:
    """Padded-batching economics, measured (SURVEY §2.3 N86): when
    sequences CANNOT be packed (inference serving, encoder batches,
    any fixed-shape kernel), a batch pads every member to its longest
    — so batch composition, not token count, sets the FLOP bill.  One
    row per policy: ``arrival`` batches in key order, ``length_sorted``
    batches after sorting by length within the shard — same documents,
    same batch size, and the padding fraction collapses because
    same-length neighbors share a max.

    Both lanes use the :func:`pack_sequences` scale shape: documents
    shard by key hash (deterministic, coordination-free) and the
    row-number window runs per shard — ``num_shards``-way parallel,
    never a one-partition global sort.  Everything after the window is
    a two-level hash agg (per-batch, then per-policy).  All arithmetic
    is exact integers; the padding fraction is the 4-dp half-up
    rational both engines share."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(token_count_col).cast("long").alias("__tc"),
    ).withColumn("__shard", hash_bucket("__id") % num_shards)

    def lane(policy: str, order_cols: list) -> DataFrame:
        w = Window.partitionBy("__shard").orderBy(*order_cols)
        rn = F.row_number().over(w) - 1
        bid = ((rn - F.pmod(rn, F.lit(batch_size))) / batch_size).cast("long")
        per_batch = (
            base.withColumn("__b", bid)
            .groupBy("__shard", "__b")
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.max("__tc").alias("__mx"),
                 F.sum("__tc").alias("__sum")))
        return per_batch.agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("__sum").cast("long").alias("total_tokens"),
            F.sum(F.col("__n") * F.col("__mx")).cast("long")
            .alias("padded_tokens"),
        ).select(F.lit(policy).alias("policy"), "n_batches",
                 "total_tokens", "padded_tokens")

    out = lane("arrival", [F.col("__id")]).unionByName(
        lane("length_sorted", [F.col("__tc"), F.col("__id")]))
    num = (F.col("padded_tokens") - F.col("total_tokens")).cast("long")
    den = F.col("padded_tokens").cast("long")
    a = 20000 * num + den
    frac = (((a - F.pmod(a, 2 * den)) / (2 * den))
            .cast("long").cast("double") / 10000)
    return out.withColumn("padding_frac", frac).orderBy("policy")


def temperature_mixture_rates(
    df: DataFrame,
    *,
    source_col: str,
    weight_col: str | None = None,
    tau: float = 0.7,
) -> DataFrame:
    """Temperature-scaled source mixture (SURVEY §2.3 N89): per
    source, the raw mass share, the τ-tempered share
    ``n^τ / Σ n^τ``, and the implied up/down-sampling factor — the
    multilingual-sampling standard (Conneau & Lample 2019; the XLM-R /
    mT5 recipe): τ < 1 flattens the source distribution so rare
    sources are not drowned, without the uniform extreme τ = 0.

    N22 (`mixture_sample`) APPLIES given per-source rates; this
    DERIVES them from measured sizes — compose by feeding
    ``round(1000·upsample_factor)`` capped at 1000 into N22 and the
    excess over 1 into N77 epoch replication.  One hash aggregation to
    a sources-sized table, then per-row arithmetic on that table; the
    pow term is rounded at 6 dp before the normalizing divide and all
    shares at 4 dp, the float-determinism posture the engines share."""
    w = (F.count(F.lit(1)) if weight_col is None
         else F.sum(F.col(weight_col).cast("long")))
    sizes = df.groupBy(source_col).agg(w.cast("long").alias("n_mass"))
    tot = sizes.agg(F.sum("n_mass").alias("__tot"),
                    F.round(F.sum(F.round(F.pow(F.col("n_mass")
                                                .cast("double"), tau), 6)),
                            6).alias("__totw"))
    out = sizes.crossJoin(F.broadcast(tot))
    pw = F.round(F.pow(F.col("n_mass").cast("double"), tau), 6)
    share_raw = F.col("n_mass") / F.col("__tot")
    share_temp = pw / F.col("__totw")
    return out.select(
        source_col, "n_mass",
        F.round(share_raw, 4).alias("share_raw"),
        F.round(share_temp, 4).alias("share_temp"),
        F.round(share_temp / share_raw, 4).alias("upsample_factor"),
    ).orderBy(source_col)


def epoch_shuffle_audit(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    epoch: int,
    num_shards: int = 8,
) -> DataFrame:
    """Deterministic training-order shuffle + interleaving audit
    (SURVEY §2.3 N90): the per-epoch order key is the md5 of the id
    salted with the epoch tag — a reproducible pseudo-random
    permutation per epoch (same everywhere, different across epochs;
    the purpose-salt convention of N22), realized as a SORT KEY the
    writer orders by, never a materialized global sort here.

    The audit half measures what the shuffle is FOR — that no source
    forms long contiguous runs in training order: per source, the doc
    count, the longest same-source run, and the mean permille position
    (≈500 everywhere = sources spread evenly).  Run lengths come from
    the gaps-and-islands difference of two row_numbers; ALL windows
    partition by the hash shard (``num_shards``-way parallel, the
    `pack_sequences` discipline — a global order audit would be a
    one-partition sort).  Positions and means are exact integers."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(source_col).alias("source"),
    ).withColumn("__okey", F.md5(F.concat(
        F.coalesce(F.col("__id").cast("string"), F.lit("\x00NULL")),
        F.lit(f"#epoch{epoch}")))) \
        .withColumn("__shard", hash_bucket("__id") % num_shards)
    w_all = Window.partitionBy("__shard").orderBy("__okey")
    w_src = Window.partitionBy("__shard", "source").orderBy("__okey")
    pos = F.row_number().over(w_all)
    island = (pos - F.row_number().over(w_src)).alias("__island")
    shard_n = F.count(F.lit(1)).over(Window.partitionBy("__shard"))
    ranked = base.select(
        "source", "__shard", island,
        pos.alias("__pos"), shard_n.alias("__n"))
    runs = ranked.groupBy("source", "__shard", "__island").agg(
        F.count(F.lit(1)).alias("__run"))
    per_source_runs = runs.groupBy("source").agg(
        F.max("__run").cast("long").alias("max_run_len"))
    # mean permille position: exact integer half-up over per-row
    # permille = (1000·pos - pmod(1000·pos, n)) / n
    pm = ((1000 * F.col("__pos")
           - F.pmod(1000 * F.col("__pos"), F.col("__n"))) / F.col("__n")) \
        .cast("long")
    per_source_pos = ranked.withColumn("__pm", pm).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__pm").cast("long").alias("__pm_sum"))
    a = 2 * F.col("__pm_sum") + F.col("n_docs")
    mean_pm = (((a - F.pmod(a, 2 * F.col("n_docs")))
                / (2 * F.col("n_docs"))).cast("long"))
    return (per_source_pos.join(per_source_runs, "source")
            .select("source", "n_docs", mean_pm.alias("mean_permille_pos"),
                    "max_run_len")
            .orderBy("source"))


def pareto_frontier(
    df: DataFrame,
    *,
    group_cols: list[str],
    max_col: str,
    min_col: str,
    id_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Pareto-frontier (2-D skyline) selection (SURVEY §2.3 N107):
    per group, the coordinate pairs not DOMINATED by any other — pair
    q dominates p iff ``q.max ≥ p.max ∧ q.min ≤ p.min`` with at least
    one strict.  The preference-query operator behind multi-criteria
    data selection ("most vocabulary for fewest chars", "highest
    quality for least toxicity"): a single weighted score imposes an
    arbitrary trade-off ratio; the frontier IS the set of defensible
    trade-offs.

    Output: one row per surviving distinct coordinate pair —
    ``(*group_cols, max/min values, n_rows, rep_id)`` with ``rep_id``
    the smallest id on the pair (deterministic representative).  Equal
    pairs merge (neither dominates the other; ``n_rows`` counts them).

    Scale (the skyline-merge algebra): ``skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))``, so the pass is (1) a map-side-
    combined distinct-pair aggregate, (2) a LOCAL sweep per
    (group, hash shard) — sort by (max DESC, min ASC), keep iff
    ``min < prefix-min`` — whose window partitions are
    pairs/shards-sized, (3) the same sweep per group over only the
    ≤ shards × |frontier| local survivors.  No window ever spans a
    group's full pair set.  The prefix-min rule is exact ON DISTINCT
    PAIRS: an equal-max smaller-min predecessor dominates (strict
    min), an equal-min larger-max predecessor dominates (strict max) —
    both leave prefix-min ≤ current min and are dropped."""
    pairs = (
        df.groupBy(*group_cols, max_col, min_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.min(id_col).alias("rep_id")))

    def sweep(pdf: DataFrame, extra_part: list[str]) -> DataFrame:
        w = (Window.partitionBy(*group_cols, *extra_part)
             .orderBy(F.col(max_col).desc(), F.col(min_col).asc())
             .rowsBetween(Window.unboundedPreceding, -1))
        pmin = F.min(min_col).over(w)
        return (pdf.withColumn("__pmin", pmin)
                .filter(F.col("__pmin").isNull()
                        | (F.col(min_col) < F.col("__pmin")))
                .drop("__pmin"))

    local = sweep(
        pairs.withColumn(
            "__shard",
            F.pmod(F.conv(F.substring(F.md5(F.concat_ws(
                "|", F.col(max_col), F.col(min_col))), 1, 8), 16, 10)
                .cast("long"), F.lit(n_shards))),
        ["__shard"]).drop("__shard")
    return sweep(local, [])


def advance_pareto_frontier(
    state: DataFrame,
    delta: DataFrame,
    *,
    group_cols: list[str],
    max_col: str,
    min_col: str,
    id_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Advance a materialized Pareto frontier with only the delta rows
    (the N25 incremental-state posture applied to N107): by the
    skyline-merge algebra, ``skyline(C ∪ D) = skyline(skyline(C) ∪
    skyline(D))`` — so the corpus is never re-swept; input is the
    frontier state (per group, frontier-sized) plus the delta.
    Duplicate coordinate pairs across state and delta merge by count
    sum + min representative (exactly what a full rebuild produces,
    since the pair aggregate is associative).  NOT idempotent under
    re-delivery (counts re-add): exactly-once delta delivery is the
    contract, same as the CMS/quantile states."""
    df = pareto_frontier(
        delta, group_cols=group_cols, max_col=max_col, min_col=min_col,
        id_col=id_col, n_shards=n_shards)
    merged = (
        state.unionByName(df)
        .groupBy(*group_cols, max_col, min_col)
        .agg(F.sum("n_rows").cast("long").alias("n_rows"),
             F.min("rep_id").alias("rep_id")))
    w = (Window.partitionBy(*group_cols)
         .orderBy(F.col(max_col).desc(), F.col(min_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    pmin = F.min(min_col).over(w)
    return (merged.withColumn("__pmin", pmin)
            .filter(F.col("__pmin").isNull()
                    | (F.col(min_col) < F.col("__pmin")))
            .drop("__pmin"))


def token_budget_waterfill(
    avail: DataFrame,
    budget: int,
    *,
    source_col: str = "source",
    avail_col: str = "n_tokens",
) -> DataFrame:
    """Water-filling token-budget allocation (SURVEY §2.3 N126) — the
    data-constrained training-mix planner: given per-source available
    token counts and a total budget ``B``, allocate each source
    ``min(available, L)`` at the exact integer water level where the
    allocations sum to ``B`` — small sources are taken whole
    (saturated), large sources are capped equally, and nobody exceeds
    what exists (the allocation rule behind 'epochs over scarce
    high-quality sources, caps over bulk web' mixes; Muennighoff et
    al. 2023 motivate the constraint).

    Exact integers end to end: sort sources by (available, name); the
    saturation predicate ``prefix_i + (n−i)·a_i ≤ B`` is monotone, so
    the saturated set is a prefix; the residual budget spreads as
    ``base = R // m`` with the ``R mod m`` remainder going to the
    first ``m``-remainder unsaturated sources in the same
    deterministic order — allocations always sum to ``min(B, Σ a)``
    and both engines replay every row.

    Scale shape: the input is the per-source token table (one
    map-side agg upstream, sources-sized); everything here is windows
    and a 1-row broadcast over that config-sized table."""
    from pyspark.sql import Window

    from hbase_snapshotter_spark.operators.layout import _int_div

    # the water level is a GLOBAL ordering — single-partition by
    # design: this table has one row per SOURCE (a config-sized
    # mixture list, not data).  Partitioning the window on an
    # always-zero key says so explicitly, so WindowExec's "No
    # Partition Defined" warning stays meaningful where it flags a
    # real mistake.  pmod(·,1) ≡ 0 but is NOT foldable — a literal 0
    # would be optimized out of the partitionSpec and re-trigger the
    # warning.
    w_ord = Window.partitionBy("__one").orderBy(
        F.col("__a"), F.col(source_col))
    base = avail.select(F.col(source_col),
                        F.col(avail_col).cast("long").alias("__a"),
                        F.pmod(F.coalesce(F.col(avail_col).cast("long"),
                                          F.lit(0)), F.lit(1))
                        .alias("__one"))
    ranked = base.select(
        source_col, "__a",
        F.row_number().over(w_ord).alias("__i"),
        F.sum("__a").over(w_ord.rowsBetween(
            Window.unboundedPreceding, 0)).alias("__prefix"))
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("__n_src"),
        F.sum("__a").cast("long").alias("__total"))
    j = ranked.crossJoin(F.broadcast(tot))
    B = F.least(F.lit(budget).cast("long"), F.col("__total"))
    sat = (F.col("__prefix")
           + (F.col("__n_src") - F.col("__i")) * F.col("__a")) <= B
    j = j.withColumn("__sat", sat)
    agg = j.agg(
        F.sum(F.col("__sat").cast("long")).cast("long").alias("__k"),
        F.max(F.when(F.col("__sat"), F.col("__prefix")))
        .alias("__pk")).select(
            "__k", F.coalesce("__pk", F.lit(0)).cast("long").alias("__pk"))
    out = j.crossJoin(F.broadcast(agg))
    m = F.col("__n_src") - F.col("__k")
    # _int_div contract (layout._int_div: BOTH operands non-negative;
    # Spark `div` truncates toward zero, DuckDB `//` floors — they
    # agree only at R >= 0).  The invariant holds by construction:
    # __pk is the prefix of a SATURATED row, and saturation
    # `prefix + (n-i)·a <= B` with a >= 0 implies prefix <= B, so
    # R = B - __pk >= 0.  Pinned by the boundary-budget sweep in
    # tests/test_suites.py::test_token_budget_waterfill_hand_computed
    # (a negative R would surface as a negative n_allocated).
    R = B - F.col("__pk")
    alloc_base = F.when(m > 0, _int_div(R, m)).otherwise(F.lit(0)) \
        .cast("long")
    rem = F.when(m > 0, F.pmod(R, m)).otherwise(0).cast("long")
    allocated = F.when(F.col("__sat"), F.col("__a")).otherwise(
        alloc_base + (F.col("__i") - F.col("__k") <= rem).cast("long"))
    share = 2000 * allocated + F.col("__a")
    return out.select(
        source_col,
        F.col("__a").alias("n_available"),
        allocated.cast("long").alias("n_allocated"),
        F.col("__sat").alias("saturated"),
        F.when(F.col("__a") > 0, _int_div(share, 2 * F.col("__a")))
        .otherwise(F.lit(None).cast("long")).alias("take_permille"))
