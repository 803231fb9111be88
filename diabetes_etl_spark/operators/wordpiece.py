"""WordPiece-style greedy longest-match subword segmentation with an
in-plan, corpus-derived vocabulary — the second tokenizer family next
to BPE (operators/bpe.py): BPE *trains* merges bottom-up; WordPiece
*inference* (Devlin et al. 2019 BERT; Song et al. 2021 "Fast
WordPiece Tokenization") walks each word left-to-right taking the
LONGEST vocabulary piece at every position, falling back to single
characters.  Everything here is integer arithmetic — no logs, no
floats — so per-document segmentations hash-match a full SQL replay.

Reference parity note: the reference pipeline has no tokenizer; this
extends the LLM-data-pipeline tier (token budgeting, fertility
analysis — pieces-per-word — and tokenizer-vocab A/B experiments run
exactly this shape at corpus scale).

Scale shape (100 TB lens):
- vocabulary: one explode of (word-substring, multiplicity) pairs with
  map-side combine, then a rank-limit top-V — the only corpus shuffle,
  carrying short substrings only;
- the vocabulary is BOUNDED (top_v rows) and becomes a constant-folded
  map literal in the segmentation expression — the BPE-trainer
  precedent for bounded driver state; segmentation itself is a pure
  per-row JVM expression: zero shuffle, zero Python, linear in
  document length (the greedy walk advances at least one char per
  step, each step O(max_len) hash lookups);
- the DuckDB oracle replays the identical walk with a packed-BIGINT
  accumulator (pos | n_pieces | fp bit fields) because its
  list_reduce requires acc type == element type; fields are sized so
  words up to 2047 chars cannot overflow (longer "words" are a data
  bug the vocab build would also choke on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP_MOD = 1_073_741_789  # largest prime < 2^30 (fits the packed field)
_FP_BASE = 131


def wordpiece_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 4,
    top_v: int = 200,
) -> DataFrame:
    """(piece, cnt): the ``top_v`` most frequent word-internal
    substrings of length ``min_len..max_len`` (counted WITH
    multiplicity), ties broken on the piece string — deterministic
    and oracle-replayable.  Single characters are never stored: the
    greedy walk falls back to them implicitly."""
    pieces = F.expr(
        f"flatten(transform(sequence({min_len}, {max_len}), l -> "
        f"CASE WHEN length(w) >= l THEN "
        f"transform(sequence(1, length(w) - l + 1), "
        f"s -> substring(w, s, l)) ELSE array() END))"
    )
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .select(F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(top_v)
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def wordpiece_segment_stats(
    df: DataFrame,
    vocab_pieces: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
) -> DataFrame:
    """(id, n_words, n_pieces, doc_fp): greedy longest-match-first
    segmentation of every whitespace word against ``vocab_pieces``
    (multi-char pieces; single chars are the implicit fallback).
    ``doc_fp`` folds every word's piece-length sequence in order —
    two segmentations differing in ANY cut anywhere hash apart.

    ``vocab_pieces`` is the bounded top-V list (BPE-precedent driver
    state, a few KB); it is inlined as a constant-folded map literal,
    so the whole operator is one shuffle-free JVM projection."""
    if vocab_pieces:
        entries = ", ".join(f"{_sql_quote(p)}, 1" for p in vocab_pieces)
        vmap = f"map({entries})"
    else:
        vmap = "map('\\u0000impossible', 1)"
    # longest-match-first CASE chain, max_len down to 2 (1 = fallback).
    # The match length j at a position depends only on (w, p), so it is
    # PRECOMPUTED per position into an int array: the old form inlined
    # this CASE twice per walk step (once in 'pos', once in 'fp') and
    # evaluated the whole walk twice per row (n_pieces and doc_fp were
    # separate expressions) — 4x the map probes of the walk below.
    j_cases = " ".join(
        f"WHEN p + {l - 1} <= length(w) AND "
        f"try_element_at({vmap}, substring(w, p, {l})) IS NOT NULL "
        f"THEN {l}"
        for l in range(max_len, 1, -1)
    )
    jarr = (
        "CASE WHEN length(w) >= 1 THEN "
        f"transform(sequence(1, length(w)), p -> (CASE {j_cases} "
        "ELSE 1 END)) ELSE array() END"
    )
    # greedy walk over the precomputed j array: each step is two array
    # lookups, no string/map work
    word_walk = (
        "aggregate(j, "
        "named_struct('pos', 1, 'np', 0, 'fp', CAST(0 AS BIGINT)), "
        "(acc, x) -> CASE WHEN acc.pos > size(j) THEN acc ELSE "
        "named_struct("
        "'pos', acc.pos + element_at(j, acc.pos), "
        "'np', acc.np + 1, "
        f"'fp', (acc.fp * {_FP_BASE} + element_at(j, acc.pos)) "
        f"% {_FP_MOD}) END)"
    )
    # staged projections: __ws / __segs are each referenced more than
    # once downstream and are non-cheap, so CollapseProject keeps the
    # stages separate — the split and the walk evaluate ONCE per row
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(f"split(trim({text_col}), '\\\\s+')").alias("__ws"),
        )
        .select(
            "id",
            F.expr("size(__ws)").alias("n_words"),
            F.expr(
                f"transform(transform(__ws, w -> {jarr}), "
                f"j -> {word_walk})"
            ).alias("__segs"),
        )
        .select(
            "id",
            "n_words",
            F.expr("aggregate(__segs, 0, (a, s) -> a + s.np)").alias(
                "n_pieces"
            ),
            F.expr(
                f"aggregate(__segs, CAST(0 AS BIGINT), "
                f"(a, s) -> (a * {_FP_BASE} + s.fp) % {_FP_MOD})"
            ).alias("doc_fp"),
        )
    )


def wordpiece_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 4,
    top_v: int = 200,
) -> DataFrame:
    """Vocab build + segmentation in one call.  The vocab collect is
    bounded at ``top_v`` rows (documented driver state)."""
    vocab = [
        r.piece
        for r in wordpiece_vocab(
            df, text_col, min_len, max_len, top_v
        ).collect()
    ]
    return wordpiece_segment_stats(df, vocab, id_col, text_col, max_len)
