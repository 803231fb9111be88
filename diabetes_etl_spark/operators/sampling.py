"""Corpus sampling, chunking, and training-order operators — the stages
between "cleaned corpus" and "training shards" in a large-scale
pipeline (SURVEY.md extension tier; companions to operators/dedup.py
and operators/text.py in the docs-prep flow).

All three are single-scan native-expression operators (no UDFs, no
shuffle except where noted), and all are DETERMINISTIC: sampling and
shuffling key off portable integer hashes of (seed, id), never
``rand()``, so a re-run — or a different engine replaying the logic —
selects byte-identical rows.  That is what makes a 100 TB sampling job
reproducible, auditable, and oracle-checkable.

Scale shapes:
- ``chunk_documents``: narrow map (split + slice + posexplode); output
  rows ~ tokens/chunk_tokens per doc, no shuffle.
- ``stratified_sample``: narrow filter; the per-stratum rates ride in
  as a literal map, so there is no join and no driver round-trip.
- ``training_shuffle``: one hash-partition shuffle on the shuffle key —
  exactly the exchange a training-data writer needs anyway to produce
  shard files; within-shard order is the hash order (decorrelated from
  source order by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mixing constants for the portable integer hash (a multiplicative LCG
# step reduced mod a large prime): cheap, stateless, identical in any
# engine with 64-bit integer arithmetic.  NOT cryptographic — good
# enough to decorrelate ids from selection, which is the requirement.
# The multiplier/increment are pre-reduced mod p so the intermediate
# product stays < 1e18 — inside long range, which matters because
# Spark 4 runs ANSI mode (overflow raises, there is no wrap-around).
_MOD = 1_000_000_007
_MIX_A = 6364136223846793005 % _MOD  # Knuth MMIX LCG multiplier, mod p
_MIX_C = 1442695040888963407 % _MOD


def _mix(id_col: Column, seed: int) -> Column:
    """((id + seed) mod p) * A + C, reduced mod p — every intermediate
    fits a long (p^2 < 2^63), so it is ANSI-overflow-safe."""
    return F.pmod(
        F.pmod(id_col.cast("long") + F.lit(seed), F.lit(_MOD))
        * F.lit(_MIX_A)
        + F.lit(_MIX_C),
        F.lit(_MOD),
    )


def portable_unit_hash(id_col: Column, seed: int) -> Column:
    """Deterministic pseudo-uniform value in [0, 1) from an integer id.

    ``(((id + seed) mod p) * A + C) mod p / p``; engine-portable
    (DuckDB mirrors it verbatim) and stable across runs, partitions,
    and cluster sizes — unlike ``rand()``, whose draw depends on
    partition layout.
    """
    return _mix(id_col, seed).cast("double") / F.lit(float(_MOD))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the
    standard pre-tokenization stage for long-document training.

    Chunks start every ``chunk_tokens - overlap`` tokens and carry
    ``chunk_tokens`` tokens (the last chunk may be shorter; a document
    shorter than one chunk yields exactly one chunk).  Pure native
    expressions: split -> slice windows -> posexplode; no shuffle.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    starts = F.sequence(F.lit(0), n_chunks - F.lit(1))
    chunks = F.transform(
        starts,
        lambda i: F.slice(toks, i * F.lit(step) + F.lit(1), F.lit(chunk_tokens)),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join("chunk_toks", " ").alias("chunk_text"),
            F.size("chunk_toks").cast("long").alias("n_tokens"),
        )
    )


def _rate_case(
    rates: dict[str, float],
    stratum_col: str,
    default_rate: float,
    cap_at_one: bool,
) -> Column:
    """Compile a per-stratum rate table into one CASE literal — no join,
    no broadcast, no driver round-trip at any corpus size."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        r = min(float(v), 1.0) if cap_at_one else float(v)
        rate = F.when(F.col(stratum_col) == F.lit(k), F.lit(r)).otherwise(rate)
    return rate


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 17,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mixture stage
    ("2x English, 0.5x code, drop the rest" style corpus weighting).

    Keeps a row iff ``portable_unit_hash(id, seed) < rate(stratum)``.
    Rates are compiled into a CASE literal (no join, no broadcast);
    selection is independent of partitioning and cluster size, and a
    re-run selects the same rows — the property audits depend on.
    Rates > 1 are capped at 1 (up-sampling is :func:`repeat_sample`'s
    job, kept separate so row multiplicity stays explicit).
    """
    u = portable_unit_hash(F.col(id_col), seed)
    return df.filter(u < _rate_case(rates, stratum_col, default_rate, True))


def repeat_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 23,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic up/down-sampling with EXPLICIT row multiplicity —
    the epoch-weighting stage ("see English 2.3x per epoch").

    Each row appears ``floor(rate) + (unit_hash < frac(rate))`` times
    (so rate 2.3 means 2 copies always, a 3rd for a deterministic 30%
    of ids), tagged ``copy_idx`` 0..m-1 so downstream shuffling can
    decorrelate the copies.  Rows whose multiplicity lands on 0 are
    dropped — rate < 1 degrades to :func:`stratified_sample` with the
    same selection rule.  Narrow sequence+explode, no shuffle; the
    multiplicity is a pure function of (seed, id, stratum), so a re-run
    — or another engine — reproduces the exact same physical epoch.
    """
    clash = {"_mult", "copy_idx"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — repeating "
            "already-repeated output would create ambiguous references; "
            "drop or rename them first"
        )
    rate = _rate_case(rates, stratum_col, default_rate, False)
    u = portable_unit_hash(F.col(id_col), seed)
    mult = F.floor(rate).cast("int") + (
        u < (rate - F.floor(rate))
    ).cast("int")
    return (
        df.withColumn("_mult", mult)
        .filter(F.col("_mult") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("_mult") - 1))
        )
        .drop("_mult")
    )


def training_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    order: shuffle_key decorrelates neighbors, shard = key mod shards.

    Unlike ``df.orderBy(rand())``, the order is reproducible and
    engine-portable; unlike ``repartition(n)``, the assignment does not
    depend on Spark's internal hash or the input partitioning.  Writing
    shards is then ``.repartition("shard").write.partitionBy("shard")``
    — one exchange, balanced by the uniformity of the hash.

    All input columns are preserved (a shard assignment that drops the
    payload would be useless to the shard writer); ``shuffle_key`` and
    ``shard`` are appended.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    clash = {"shuffle_key", "shard"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — re-sharding "
            "sharded output would create ambiguous references; drop or "
            "rename them first"
        )
    key = _mix(F.col(id_col), seed)
    return df.select(
        "*",
        key.cast("long").alias("shuffle_key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )


# floor(cum_tokens / budget) stays far below 2^40 for any real shard
# (2^40 sequences x 256 tokens ~ 280 T tokens PER SHARD), so the
# composite id shard * _SEQ_BASE + seq_idx cannot collide or overflow.
_SEQ_BASE = 1 << 40


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("shuffle_key", "doc_id"),
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in shard order
    and split every ``budget`` tokens.  A document's sequence is
    ``floor(tokens_before_it / budget)`` — documents may straddle a
    boundary (``crosses_boundary``), exactly like
    concatenate-then-chunk training pipelines.

    The window is PER SHARD (the parallel unit `training_shuffle`
    created), so the cumulative sum never needs a global order — each
    shard's packing is independent, one exchange on the shard key, and
    a 1000-executor cluster packs 1000 shards concurrently.  Greedy
    never-split packing (start a new bin when a doc would overflow) is
    deliberately NOT offered: its running state makes it sequential
    per shard anyway and modern pipelines concatenate-and-split.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    clash = {
        "seq_id", "seq_offset", "crosses_boundary", "__cum_before"
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — re-packing "
            "packed output would create ambiguous references"
        )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0)
    )
    # `div` = exact BIGINT division.  floor(double/double) would round a
    # quotient whose fractional part is under one ulp (possible once
    # cum_before is large relative to budget) up to the next sequence,
    # silently diverging from the oracle's integer `//`.
    staged = df.select("*", cum_before.alias("__cum_before"))
    return staged.select(
        *df.columns,
        (
            F.col(shard_col).cast("long") * F.lit(_SEQ_BASE)
            + F.expr(f"__cum_before div {int(budget)}")
        ).alias("seq_id"),
        (F.col("__cum_before") % budget).cast("long").alias("seq_offset"),
        (
            (F.col("__cum_before") % budget) + F.col(token_col) > budget
        ).alias("crosses_boundary"),
    )


def temperature_mix(
    df: DataFrame,
    target_weight: float | None = None,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 31,
) -> DataFrame:
    """Temperature-based mixture resampling — per-stratum rates DERIVED
    FROM THE CORPUS in-plan (the mT5/XLM-R sampling-temperature
    pattern), unlike :func:`stratified_sample` /
    :func:`repeat_sample`, whose rates arrive as caller literals.

    Stratum s with total weight ``w_s`` (sum of ``weight_col``) gets
    mixture probability ``p_s = w_s^alpha / sum_t w_t^alpha``; at
    ``alpha=1`` the mix is the natural distribution, at ``alpha=0``
    uniform across strata — in between, over-represented strata are
    flattened (the standard fix for English dominating a multilingual
    corpus).  Each row then appears ``m_s = target_weight * p_s / w_s``
    times: ``floor(m_s)`` copies always, one more for a deterministic
    ``frac(m_s)`` share of ids (portable hash — reproducible,
    partition-invariant, engine-replayable).  ``target_weight=None``
    keeps the corpus' own total weight (pure re-mixing).

    Scale shape: two TINY aggregates (k strata; the second folds
    ``w^alpha`` through DECIMAL so the cross-stratum sum is
    order-independent), broadcast back onto the scan — no wide
    shuffle, no driver round-trip, rows appear ``m`` times via a
    narrow sequence+explode.  ``alpha=0.5`` uses ``sqrt`` (correctly
    rounded IEEE — bit-identical cross-engine); other alphas go
    through ``pow``, whose last-ulp behaviour is libm-dependent —
    fine for production mixing, but oracle-paired checks should stick
    to 0.5.

    Output: input columns + ``mix_rate`` (= m_s) + ``copy_idx``
    (0..mult-1); rows whose multiplicity lands on 0 are dropped.

    Degenerate-stratum hazard: a stratum holding a vanishing share of
    the corpus weight gets m_s ~ target/(k·w_s) — a near-empty
    stratum under a large target means a huge per-row multiplicity
    (the explode fans out by floor(m)).  That is the correct
    temperature semantics, but audit per-stratum rates (they ride in
    the ``mix_rate`` column) before pointing a big budget at a corpus
    with trace strata; alpha -> 1 shrinks the effect.
    """
    clash = {"mix_rate", "copy_idx"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — re-mixing "
            "mixed output would create ambiguous references; drop or "
            "rename them first"
        )
    w_stat = F.col("_w")
    powed = (
        F.sqrt(w_stat) if alpha == 0.5 else F.pow(w_stat, F.lit(alpha))
    )
    w = df.groupBy(stratum_col).agg(
        F.sum(F.col(weight_col).cast("long")).cast("double").alias("_w")
    )
    # z folds through DECIMAL(38,6): k stratum terms, order-independent;
    # t (the natural total) is a sum of integer-valued doubles — exact
    # at any order while < 2^53, no fold needed.
    tot = w.agg(
        F.sum(powed.cast("decimal(38,6)")).cast("double").alias("_z"),
        F.sum(w_stat).alias("_t"),
    )
    target = (
        F.col("_t") if target_weight is None
        else F.lit(float(target_weight))
    )
    # zero-weight stratum guard: rows whose stratum carries no weight
    # (e.g. a lang bucket of empty docs) would hit 0/0 = NaN, and the
    # ANSI floor(NaN)->int cast below raises; a weightless stratum
    # contributes nothing to the mixture, so its rate is plain 0.
    rates = w.crossJoin(F.broadcast(tot)).select(
        F.col(stratum_col),
        F.when(
            w_stat > 0, (target * (powed / F.col("_z"))) / w_stat
        ).otherwise(F.lit(0.0)).alias("mix_rate"),
    )
    u = portable_unit_hash(F.col(id_col), seed)
    mult = F.floor("mix_rate").cast("int") + (
        u < (F.col("mix_rate") - F.floor("mix_rate"))
    ).cast("int")
    return (
        df.join(F.broadcast(rates), stratum_col)
        .withColumn("_mult", mult)
        .filter(F.col("_mult") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("_mult") - 1))
        )
        .drop("_mult")
    )


def fixed_size_sample(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 37,
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer only when the stratum is
    smaller) — the eval-set / human-review / per-source-quota sampler,
    complementing :func:`stratified_sample`, whose rate-based
    selection only hits a target size in expectation.

    Selection is the first ``k`` rows in PORTABLE-HASH order (ties on
    id are impossible — the hash is injective per stratum for ids
    < 1e9+7 apart): deterministic, partition-invariant,
    engine-replayable, and STABLE under corpus growth in the usual
    reservoir sense that each stratum's sample changes only where new
    ids hash below the old k-th row.

    Scale shape: one window over (stratum, hash) — a single
    hash-partition exchange + per-partition sort, the same shuffle a
    per-group top-k needs; no driver state, no rejection loop.  Output
    adds ``sample_rank`` (1..k within the stratum).
    """
    u = _mix(F.col(id_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(u.asc(), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def dsir_llr_scores(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Data Selection via Importance Resampling scores (Xie et al.
    2023, DSIR): rank raw-corpus documents by how target-like they are
    under HASHED n-gram bucket models — the published recipe for
    "select pretraining data that looks like my high-quality target
    set" without training a classifier.

    Each document featurizes into hashed bigram buckets
    ``b(g) = int(md5(g)[:8], 16) mod n_buckets``; the target and raw
    corpora induce add-one-smoothed bucket unigram models
    ``p_t(b) = (c_t(b)+1)/(N_t+B)`` and ``p_r(b)`` likewise, and a
    document's importance is the log-likelihood ratio of its bucket
    occurrences::

        log w(d) = sum over bigram occurrences g of
                   ln(p_t(b(g)) / p_r(b(g)))

    Downstream, ``weighted_sample`` (A-Res) over ``exp(log w)`` — or a
    deterministic top-k — performs the actual resampling; this operator
    deliberately stops at scores so the selection policy stays
    auditable.

    Determinism/oracle contract: the md5-prefix bucket hash is
    engine-portable (the shingle-hash precedent); each per-bucket LLR
    is ONE double division of exact bigint products followed by the
    one libm ``ln``, quantized to 9 decimals at the source (the
    BM25/A-Res ln precedent), and per-doc sums fold through
    DECIMAL(38,12) so no representable tie is ever hit (scale-9 inputs
    cast to scale 12 exactly).  Docs with < 2 tokens have no bigrams
    and are absent from the output (importance undefined; documented).

    Scale shape (100 TB lens): bigram occurrences leave the scan as
    (doc_id, bucket-int) pairs — text never shuffles; the two bucket
    models are map-side-combined aggregates onto ``n_buckets`` keys;
    totals attach as in-plan broadcast 1-row aggregates (no driver
    collect); the scored join broadcasts the B-row LLR table onto the
    corpus featurization.  The raw-model aggregate and the scoring
    join each read the corpus once (two passes total) — at 100 TB,
    materialize the (doc_id, bucket) featurization once and feed both,
    exactly as you would any reused stage.  The exact-product LLR
    keeps every intermediate
    < 2^53 while ``(c(b)+1) * (N+B) < 2^53`` — beyond that (think
    >10^12 bigrams against a small bucket count), split the ratio into
    two quantized ``ln`` terms; at that point the 1-ulp libm spread is
    dwarfed by the model's own smoothing.

    Output: (doc_id, n_bigrams, log_weight), one row per corpus doc
    with >= 1 bigram.
    """
    from diabetes_etl_spark.functions.numeric import dec_sum
    from diabetes_etl_spark.operators.text import ngrams_with_duplicates
    from diabetes_etl_spark.operators.util import widen

    B = int(n_buckets)

    def buckets(df: DataFrame) -> DataFrame:
        from diabetes_etl_spark.operators.text import tokens

        g = F.explode(
            ngrams_with_duplicates(F.col(text_col), 2)
        ).alias("g")
        return (
            widen(df)
            .filter(F.size(tokens(F.col(text_col))) >= 2)
            .select(F.col(id_col).alias("doc_id"), g)
            .select(
                "doc_id",
                (
                    F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
                    .cast("long")
                    % B
                ).alias("b"),
            )
        )

    corpus_b = buckets(corpus)
    target_b = buckets(target)
    cr = corpus_b.groupBy("b").agg(F.count("*").alias("cr"))
    ct = target_b.groupBy("b").agg(F.count("*").alias("ct"))
    tot = (
        cr.agg(F.sum("cr").alias("nr"))
        .crossJoin(ct.agg(F.sum("ct").alias("nt")))
    )
    full = (
        corpus_b.sparkSession.range(B)
        .select(F.col("id").alias("b"))
        .join(cr, "b", "left")
        .join(ct, "b", "left")
        .crossJoin(F.broadcast(tot))
    )
    llr = full.select(
        "b",
        F.round(
            F.log(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    * (F.col("nr") + B)
                ).cast("double")
                / (
                    (F.coalesce(F.col("cr"), F.lit(0)) + 1)
                    * (F.col("nt") + B)
                ).cast("double")
            ),
            9,
        ).alias("llr"),
    )
    return (
        corpus_b.join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            dec_sum(F.col("llr"), 12, 38).alias("log_weight"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 97,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-Res): every row draws key = u^(1/w) with u a
    unit-uniform and w its weight; the k largest keys ARE a weighted
    sample without replacement — one pass, no sequential draws, which
    is the property that makes the classic sequential algorithm
    parallelizable at all.

    Ranked here on the monotone-equivalent ln(u)/w (largest first):
    u^(1/w) overflows nothing and needs no pow(), and ln is the ONE
    libm call — quantized to 9 decimals at the source (the BM25 ln
    precedent) so the selection replays bit-identically in a SQL
    oracle; ties break on id.  u derives from the portable integer
    hash of (id, seed) — shifted to (0, 1] so ln never sees 0 — NOT
    rand(), so the sample is reproducible across runs, partitionings,
    and engines, and re-keyable by seed.

    Rows with NULL or non-positive weight are DROPPED (inclusion
    probability 0; a negative weight is meaningless under A-Res) —
    documented contract, not silent NaN propagation.

    Scale shape (100 TB lens): one narrow projection computes the key,
    then a global top-k — Spark's sort-limit physical plan keeps a
    per-partition k-row heap and merges partials on the driver-side
    single reduce (TakeOrderedAndProject), so no full sort and no
    O(input) shuffle ever happens; cost is one scan + k rows moved.

    Output: the sampled rows (all input columns) + ``sample_key`` +
    ``sample_rank`` (1..k in selection order).
    """
    u = (_mix(F.col(id_col), seed) + F.lit(1)).cast("double") / F.lit(
        float(_MOD + 1)
    )
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn(
        "sample_key",
        F.round(F.log(u) / F.col(weight_col).cast("double"), 9),
    )
    picked = keyed.orderBy(
        F.desc("sample_key"), F.col(id_col).asc()
    ).limit(k)
    return picked.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(F.desc("sample_key"), F.col(id_col).asc())
        )
        .alias("sample_rank"),
    )


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float,
) -> DataFrame:
    """CALIBRATED quality filtering: keep the top ``keep_frac`` of each
    group by score — the threshold is DERIVED (per-group exact
    ``percentile(score, 1 - keep_frac)``), not hand-picked, so "keep
    the best 40% of every language" survives distribution shift
    between languages/sources where one fixed cutoff (the
    ``text_quality_filter`` pattern) over-prunes some groups and
    under-prunes others.

    Rows with score >= their group's threshold survive (ties at the
    threshold all keep — retention can exceed keep_frac by the tie
    mass; a rank-based variant would need a per-group sort for exact
    counts).  NULL scores drop.

    Determinism: scores should arrive pre-rounded (quality_score pins
    6 decimals); the exact-percentile interpolation either lands ON a
    data value (both engines equal) or strictly BETWEEN two adjacent
    rounded values, where a last-ulp spread cannot flip any
    ``score >= threshold`` comparison — so the SELECTION is
    engine-portable even though the threshold itself is a float.

    Scale shape (100 TB lens): Spark's exact ``percentile`` aggregates
    a per-group value-count map (bounded by DISTINCT rounded scores —
    10^6 cells at 6 decimals, not row count), so no per-group sort and
    no corpus-wide window; the k-row threshold table broadcasts back
    onto one filtering scan.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if "group_threshold" in df.columns:
        raise ValueError(
            "input already has a 'group_threshold' column — filtering "
            "already-filtered output would create an ambiguous "
            "reference; drop or rename it first"
        )
    thr = df.groupBy(group_col).agg(
        F.percentile(F.col(score_col), F.lit(1.0 - keep_frac)).alias(
            "group_threshold"
        )
    )
    return (
        df.filter(F.col(score_col).isNotNull())
        .join(F.broadcast(thr), group_col)
        .filter(F.col(score_col) >= F.col("group_threshold"))
    )


def unimax_allocation(
    df: DataFrame,
    stratum_col: str = "lang",
    tokens_col: Column | None = None,
    epochs_cap: int = 2,
    budget_num: int = 3,
    budget_den: int = 2,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): spread a
    token budget as uniformly as possible across strata, capping every
    stratum at ``epochs_cap`` epochs of its own supply — the
    principled alternative to temperature mixing that never
    over-repeats low-resource languages.

    The budget is ``(total_tokens * budget_num) div budget_den``
    (derived IN-PLAN from the corpus, so the query is scale-factor
    independent).  The published algorithm's per-language loop has a
    CLOSED FORM (water-filling): sort strata by supply ascending; the
    level theta* is the first theta_i = (B - cum_supply_below_i) /
    (L - i + 1) with supply_i >= theta_i, and every allocation is
    min(supply, theta*) — two window functions and one 1-row
    aggregate, no iteration, no driver loop.

    Output: (stratum, n_docs, toks, supply, allocated, weight,
    epochs_used), weight summing to 1 over strata (allocated/B).

    Scale shape (100 TB lens): ONE corpus pass (the per-stratum token
    aggregate, map-side combined); everything after operates on L
    stratum rows — the unpartitioned windows are over the stratum
    table, never the corpus.  Determinism: supplies and budget are
    exact BIGINTs; theta is one IEEE division of exact integers per
    row; comparisons and min() see identical doubles on both engines.
    """
    from diabetes_etl_spark.operators.text import token_count

    toks_expr = (
        tokens_col if tokens_col is not None else token_count(F.col("text"))
    )
    sup = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks_expr).cast("long").alias("toks"),
        )
        .withColumn("supply", F.lit(epochs_cap) * F.col("toks"))
    )
    # EVERYTHING below runs on the L-row stratum table via windows —
    # one corpus scan total (the crossJoin formulation re-derived the
    # per-stratum aggregate per consumer: 4 scans, plan-asserted
    # against in tests/test_plans.py).  The unpartitioned windows
    # single-partition L rows, which is the point: L is tiny.
    wa = Window.partitionBy()
    w = Window.orderBy("supply", "stratum")
    s = (
        sup.withColumn("_tot", F.sum("toks").over(wa))
        .withColumn("_L", F.count("*").over(wa))
        .withColumn(
            "B", F.expr(f"(_tot * {budget_num}) div {budget_den}")
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("supply").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "theta",
            (F.col("B") - F.col("cum_prev")).cast("double")
            / (F.col("_L") - F.col("i") + 1),
        )
        .withColumn(
            "_m",
            F.min(
                F.when(
                    F.col("supply") >= F.col("theta"),
                    F.struct("i", "theta"),
                )
            ).over(wa),
        )
    )
    alloc = F.when(
        F.col("_m").isNull(), F.col("supply").cast("double")
    ).otherwise(
        F.least(F.col("supply").cast("double"), F.col("_m.theta"))
    )
    return (
        s.select(
            F.col("stratum").alias(stratum_col),
            "n_docs",
            "toks",
            "supply",
            F.round(alloc, 6).alias("allocated"),
            F.round(alloc / F.col("B"), 9).alias("weight"),
            F.round(alloc / F.col("toks"), 9).alias("epochs_used"),
        )
        .orderBy(stratum_col)
    )
