"""Unigram-LM tokenizer tests (operators/unigram.py): the Viterbi dp
must find globally-optimal segmentations a greedy walk misses, the
backtrack must reconstruct words exactly under the smallest-k
tie-break, the EM M-step must keep the char closure alive via add-one
smoothing, and the pipeline must agree with a pure-Python reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.unigram import (
    cost_map_literal,
    unigram_costs,
    unigram_pipeline,
    unigram_seed_vocab,
    viterbi_backtrack_expr,
    viterbi_dp_expr,
)

_PACK = 32
_SCALE = 1_000_000_000


def _qln(x: float) -> float:
    return round(math.log(x), 9)


def _py_viterbi(w: str, costs: dict[str, int], max_len: int = 4):
    """Reference dp: returns (cost, n) and the smallest-k backtrack."""
    dp = [(0, 0)] + [None] * len(w)
    for i in range(1, len(w) + 1):
        best = None
        for k in range(1, min(max_len, i) + 1):
            piece = w[i - k : i]
            if piece in costs and dp[i - k] is not None:
                c = (dp[i - k][0] + costs[piece], dp[i - k][1] + 1)
                if best is None or c < best:
                    best = c
        dp[i] = best
    toks = []
    pos = len(w)
    while pos > 0:
        for k in range(1, min(max_len, pos) + 1):
            piece = w[pos - k : pos]
            if piece in costs and dp[pos - k] is not None:
                c = (dp[pos - k][0] + costs[piece], dp[pos - k][1] + 1)
                if c == dp[pos]:
                    toks.append(piece)
                    pos -= k
                    break
    return dp[len(w)], list(reversed(toks))


def _word_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


def test_viterbi_beats_greedy(spark):
    """'abab' with vocab {a,b,ab,ba,bab}: greedy longest-match from
    the left takes ab|ab (2 pieces) — already optimal — but 'aabab'
    shows the dp's advantage: greedy takes a|ab|ab (3) while with a
    cheap 'bab' the optimum is a|a|bab when bab is cheap enough."""
    costs = {"a": 10, "b": 12, "ab": 9, "ba": 9, "bab": 2}
    vm = cost_map_literal(costs)
    df = _word_df(spark, ["aabab"])
    row = df.select(
        F.expr(viterbi_dp_expr(vm)).alias("dparr")
    ).select(
        F.expr(f"element_at(dparr, length('aabab') + 1) div {_PACK}").alias("c"),
        F.expr(f"element_at(dparr, length('aabab') + 1) % {_PACK}").alias("n"),
    ).collect()[0]
    (rc, rn), toks = _py_viterbi("aabab", costs)
    assert (row["c"], row["n"]) == (rc, rn) == (10 + 10 + 2, 3)
    assert toks == ["a", "a", "bab"]


def test_backtrack_reconstructs_words(spark):
    """For arbitrary cost tables the backtracked pieces must tile the
    word exactly and match the Python reference's smallest-k rule."""
    costs = {
        "a": 7, "b": 9, "c": 8, "d": 11,
        "ab": 13, "bc": 12, "cd": 15, "abc": 24, "bcd": 26, "abcd": 44,
    }
    vm = cost_map_literal(costs)
    words = ["abcd", "aabb", "dcba", "abcabc", "a"]
    df = _word_df(spark, words).select(
        "w", F.expr(viterbi_dp_expr(vm)).alias("dparr")
    ).select(
        "w",
        F.expr(viterbi_backtrack_expr(vm)).alias("toks"),
    )
    for r in df.collect():
        w = r["w"]
        pieces = [w[t["s"] - 1 : t["s"] - 1 + t["l"]] for t in r["toks"]]
        # backtrack emits last piece first
        assert "".join(reversed(pieces)) == w
        _, ref = _py_viterbi(w, costs)
        assert list(reversed(pieces)) == ref, w


def test_seed_vocab_keeps_all_chars_and_ranks_multis(spark):
    wcnt = spark.createDataFrame(
        [("aaa", 10), ("aab", 1), ("zq", 1)], "w string, wn long"
    )
    rows = {r["piece"]: r["cnt"] for r in unigram_seed_vocab(wcnt, top_v=2).collect()}
    for ch in "abzq":
        assert ch in rows
    multis = [p for p in rows if len(p) > 1]
    assert len(multis) == 2
    assert "aa" in multis  # most frequent multi (2*10 + 1 = 21)


def test_costs_match_quantized_ln(spark):
    vocab = spark.createDataFrame(
        [("a", 30), ("b", 10)], "piece string, cnt long"
    )
    got = {r["piece"]: r["cost"] for r in unigram_costs(vocab).collect()}
    for p, c in (("a", 30), ("b", 10)):
        assert got[p] == round((_qln(40.0) - _qln(float(c))) * _SCALE)


def test_pipeline_em_smoothing_keeps_closure(spark):
    """A corpus whose round-1 segmentation never uses some seed pieces
    must still segment every word in round 2 (add-one smoothing keeps
    unused pieces, chars included, at nonzero probability)."""
    docs = spark.createDataFrame(
        [(0, "ab ab ab xy"), (1, "ab xy xy q")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_pipeline(docs).collect()}
    assert out[0]["n_words"] == 4 and out[1]["n_words"] == 4
    # every word fully segmented in both rounds
    assert out[0]["n_tokens"] >= 4 and out[1]["n_tokens"] >= 4
    assert out[0]["vit_cost"] > 0


def test_pipeline_counts_match_python_reference(spark):
    """End-to-end on a small corpus vs a full pure-Python replay of
    seed-count -> cost -> viterbi -> hard-EM -> viterbi."""
    texts = {0: "spark spark scan scan scans", 1: "park cans span spark"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    # python replay
    from collections import Counter

    words = Counter()
    for t in texts.values():
        for w in t.split():
            words[w[:16]] += 1
    pieces = Counter()
    for w, wn in words.items():
        for l in range(1, 5):
            for s in range(len(w) - l + 1):
                pieces[w[s : s + l]] += wn
    vocab0 = {p: c for p, c in pieces.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in pieces.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:40]
    vocab0.update(dict(multis))

    def costs_of(cnts):
        tot = float(sum(cnts.values()))
        return {
            p: round((_qln(tot) - _qln(float(c))) * _SCALE)
            for p, c in cnts.items()
        }

    c1 = costs_of(vocab0)
    used = Counter()
    n1 = {}
    for w, wn in words.items():
        (cost, n), toks = _py_viterbi(w, c1)
        n1[w] = n
        for t in toks:
            used[t] += wn
    c2 = costs_of({p: used.get(p, 0) + 1 for p in vocab0})
    w2 = {w: _py_viterbi(w, c2)[0] for w in words}

    expect = {}
    for d, t in texts.items():
        ws = [w[:16] for w in t.split()]
        expect[d] = (
            len(ws),
            sum(n1[w] for w in ws),
            sum(w2[w][1] for w in ws),
            sum(w2[w][0] for w in ws),
        )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_tokens_seed"], r["n_tokens"], r["vit_cost"]
        )
        for r in unigram_pipeline(docs).collect()
    }
    assert got == expect
