"""Unigram-LM (SentencePiece-style) subword tokenizer: integer-cost
Viterbi segmentation with one hard-EM refinement round — the third
tokenizer family next to BPE (operators/bpe.py, trains merges
bottom-up) and WordPiece (operators/wordpiece.py, greedy
longest-match): unigram segmentation is GLOBALLY OPTIMAL per word
under a piece-cost model (Kudo 2018, "Subword Regularization"; the
SentencePiece trainer), found by dynamic programming rather than a
greedy walk.

Reference parity note: the reference pipeline has no tokenizer; this
extends the LLM-data-pipeline tier (tokenizer A/B fertility studies,
compression-per-byte budgeting, and vocabulary-induction experiments
run exactly this shape at corpus scale).

Determinism contract (the repo-wide ln rule): piece costs are INTEGER
nano-nats — ``round((qln(total) - qln(cnt)) * 1e9)`` with
``qln = round(ln(x), 9)`` (the BM25/A-Res quantization precedent) —
so every Viterbi comparison is exact BIGINT arithmetic and ties are
broken identically everywhere: dp states pack ``(cost, n_pieces)`` as
``cost * 32 + n`` (words are truncated to 16 chars, so n < 32 always),
making ``least()`` a lexicographic (cost, n) minimum; the backtrack
resolves remaining ties toward the SMALLEST piece length.  Both
engines fold the identical expression tree, so per-document outputs
hash-match a full relational SQL replay (recursive-CTE dp + backtrack
— the WordPiece oracle lesson: no lambdas on the DuckDB side).

Scale shape (100 TB lens):
- the corpus is touched twice end-to-end: once to build the word
  multiplicity table (one shuffle on short words), once for the final
  per-doc aggregation (join on the same key);
- everything in between — seed-vocab counting, two Viterbi passes,
  the backtrack, the M-step re-count — runs over the DISTINCT-WORD
  table, which is orders of magnitude smaller than the corpus (the
  word Zipf head); per-word cost is O(len * max_len) native array
  expressions, zero Python;
- the vocabulary is BOUNDED (all single chars + top_v multi-char
  pieces, deterministic (cnt DESC, piece) rank) and rides as a
  constant-folded map literal — the BPE-trainer precedent for bounded
  driver state (a few KB, two collect() calls total);
- one hard-EM round is the pinned-simple reference form (Viterbi/hard
  EM is the standard deterministic variant of SentencePiece's soft
  EM); more rounds repeat the same bounded step per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dp states pack (cost, n_pieces) as cost * _PACK + n; _WORD_CAP < _PACK
# keeps n from colliding with cost bits, and nano-nat costs of
# 16-char words stay far below 2^63 / _PACK.
_PACK = 32
_WORD_CAP = 16
_SCALE = 1_000_000_000


def unigram_doc_words(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, w): one row per non-empty whitespace word occurrence,
    truncated to the 16-char cap (SentencePiece caps candidate length
    the same way; a longer "word" is tail content the vocab build
    would drown in anyway)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w0"),
        )
        .filter(F.col("w0") != "")
        .select("doc_id", F.substring("w0", 1, _WORD_CAP).alias("w"))
    )


def unigram_seed_vocab(
    wcnt: DataFrame, max_len: int = 4, top_v: int = 40
) -> DataFrame:
    """(piece, cnt): ALL single characters plus the ``top_v`` most
    frequent multi-char substrings of length <= max_len (counted with
    word multiplicity; ties broken on the piece string).  Keeping
    every character guarantees closure: any word is segmentable."""
    pieces = (
        wcnt.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, {max_len}), l -> "
                    f"CASE WHEN length(w) >= l THEN "
                    f"transform(sequence(1, length(w) - l + 1), "
                    f"s -> substring(w, s, l)) ELSE array() END))"
                )
            ).alias("piece"),
            "wn",
        )
        .groupBy("piece")
        .agg(F.sum("wn").alias("cnt"))
    )
    chars = pieces.filter(F.length("piece") == 1)
    multi = (
        pieces.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(top_v)
    )
    return chars.unionByName(multi)


def unigram_costs(vocab: DataFrame) -> DataFrame:
    """(piece, cost): integer nano-nat costs from counts — the
    quantized-ln rule (see module docstring).  The 1-row total
    attaches via the in-plan broadcast scalar pattern."""
    tot = vocab.agg(F.sum("cnt").alias("t"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.expr(
            f"CAST(round((round(ln(CAST(t AS DOUBLE)), 9) - "
            f"round(ln(CAST(cnt AS DOUBLE)), 9)) * "
            f"CAST({_SCALE} AS DOUBLE)) AS BIGINT)"
        ).alias("cost"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def cost_map_literal(costs: dict[str, int]) -> str:
    """Constant-folded map literal piece -> BIGINT cost (sorted for a
    deterministic expression tree)."""
    if not costs:
        return "map('\\u0000impossible', CAST(0 AS BIGINT))"
    entries = ", ".join(
        f"{_sql_quote(p)}, CAST({c} AS BIGINT)"
        for p, c in sorted(costs.items())
    )
    return f"map({entries})"


def viterbi_dp_expr(vmap: str, max_len: int = 4) -> str:
    """SQL expression (over column ``w``) producing the FULL packed dp
    array: element i+1 holds dp[i] = min-cost prefix segmentation of
    w[1..i], packed (cost * 32 + n).  least() skips NULL candidates
    (position short of k, or piece not in vocab) in both engines."""
    cands = []
    for k in range(1, max_len + 1):
        prev = f"element_at(acc, x - {k} + 1)"
        cands.append(
            f"CASE WHEN x >= {k} THEN ({prev} div {_PACK} + "
            f"try_element_at({vmap}, substring(w, x - {k} + 1, {k})))"
            f" * {_PACK} + {prev} % {_PACK} + 1 END"
        )
    return (
        f"aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)), "
        f"(acc, x) -> array_append(acc, least({', '.join(cands)})))"
    )


def viterbi_backtrack_expr(vmap: str, max_len: int = 4) -> str:
    """SQL expression (over ``w`` and the dp array column ``dparr``)
    emitting the chosen pieces as array<struct<s,l>> (start, len),
    last piece first: at each position the smallest piece length whose
    recomputed candidate equals dp[pos] is taken (the explicit
    tie-break; both engines evaluate the same CASE chain)."""

    def cand(k: int) -> str:
        prev = f"element_at(dparr, acc.pos - {k} + 1)"
        return (
            f"(CASE WHEN acc.pos >= {k} THEN ({prev} div {_PACK} + "
            f"try_element_at({vmap}, substring(w, acc.pos - {k} + 1, {k})))"
            f" * {_PACK} + {prev} % {_PACK} + 1 END)"
        )

    dpx = "element_at(dparr, acc.pos + 1)"
    kexpr = (
        "CASE "
        + " ".join(
            f"WHEN {cand(k)} = {dpx} THEN {k}" for k in range(1, max_len)
        )
        + f" ELSE {max_len} END"
    )
    return (
        f"aggregate(sequence(1, {_WORD_CAP}), "
        f"named_struct('pos', length(w), "
        f"'toks', CAST(array() AS array<struct<s: int, l: int>>)), "
        f"(acc, step) -> CASE WHEN acc.pos <= 0 THEN acc "
        f"ELSE named_struct('pos', acc.pos - {kexpr}, "
        f"'toks', array_append(acc.toks, named_struct("
        f"'s', CAST(acc.pos - {kexpr} + 1 AS INT), "
        f"'l', CAST({kexpr} AS INT)))) END).toks"
    )


def unigram_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
    top_v: int = 40,
) -> DataFrame:
    """Full train-and-segment chain, one hard-EM round:

    1. seed vocabulary (chars + top_v substrings) with count-derived
       integer costs;
    2. Viterbi-segment every DISTINCT word (dp fold) + backtrack;
    3. M-step: re-count pieces actually used (weighted by word
       multiplicity), add-one smoothed over the seed vocab so no
       piece's cost is ln(0) and closure survives;
    4. re-cost and Viterbi again;
    5. per-document roll-up.

    Returns (doc_id, n_words, n_tokens_seed, n_tokens, vit_cost) where
    vit_cost is the exact BIGINT nano-nat total under the refined
    model — the per-doc compression score a quality filter would
    threshold on."""
    doc_words = unigram_doc_words(df, id_col, text_col)
    wcnt = doc_words.groupBy("w").agg(F.count("*").alias("wn"))

    vocab1 = unigram_seed_vocab(wcnt, max_len, top_v)
    c1 = {r["piece"]: r["cost"] for r in unigram_costs(vocab1).collect()}
    vm1 = cost_map_literal(c1)

    dw1 = wcnt.select("w", "wn", F.expr(viterbi_dp_expr(vm1, max_len)).alias("dparr"))
    stats1 = dw1.select(
        "w",
        "wn",
        "dparr",
        F.expr(f"element_at(dparr, length(w) + 1) % {_PACK}").alias("n1"),
    )

    toks = (
        stats1.select(
            "w", "wn",
            F.explode(F.expr(viterbi_backtrack_expr(vm1, max_len))).alias("t"),
        )
        .select("w", "wn", F.expr("substring(w, t.s, t.l)").alias("piece"))
    )
    used = toks.groupBy("piece").agg(F.sum("wn").alias("used"))
    vocab2 = vocab1.join(used, "piece", "left").select(
        "piece",
        (F.coalesce(F.col("used"), F.lit(0)) + F.lit(1)).alias("cnt"),
    )
    c2 = {r["piece"]: r["cost"] for r in unigram_costs(vocab2).collect()}
    vm2 = cost_map_literal(c2)

    dw2 = wcnt.select("w", F.expr(viterbi_dp_expr(vm2, max_len)).alias("dparr2"))
    stats2 = dw2.select(
        "w",
        F.expr(f"element_at(dparr2, length(w) + 1) div {_PACK}").alias("cost2"),
        F.expr(f"element_at(dparr2, length(w) + 1) % {_PACK}").alias("n2"),
    )

    return (
        doc_words.join(stats1.select("w", "n1"), "w")
        .join(stats2, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n1").cast("long").alias("n_tokens_seed"),
            F.sum("n2").cast("long").alias("n_tokens"),
            F.sum("cost2").cast("long").alias("vit_cost"),
        )
    )
