"""BPE tokenizer training (operators/bpe.py) — pinned against a
pure-Python reference implementation of the Sennrich et al. greedy
merge, including the adjacent-repeat case that breaks naive
string-replace merging."""

from __future__ import annotations

from collections import Counter

from diabetes_etl_spark.operators.bpe import bpe_train, symbolize_words


def _ref_bpe(texts: list[str], n_merges: int):
    """Reference BPE: word counts -> repeated (pair argmax, greedy
    left-to-right merge)."""
    words = Counter(w for t in texts for w in t.split() if w)
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w in syms:
            s, out = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


_TEXTS = [
    "low low low lower lowest",
    "new newer newest new",
    "aaaa aaa aa baaab",  # adjacent repeats: the string-replace killer
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in _TEXTS], "text string")
    merges, words = bpe_train(df, 5)
    ref_merges, ref_syms = _ref_bpe(_TEXTS, 5)
    assert merges == ref_merges
    got = {r.word: r.sym.split(" ") for r in words.collect()}
    assert got == ref_syms


def test_symbolize_words_counts_and_spelling(spark):
    df = spark.createDataFrame([("ab ab c",)], "text string")
    rows = {r.word: (r.n, r.sym) for r in symbolize_words(df).collect()}
    assert rows == {"ab": (2, "a b"), "c": (1, "c")}


def test_bpe_train_partition_invariant(spark):
    df = spark.createDataFrame([(t,) for t in _TEXTS * 4], "text string")
    m1, _ = bpe_train(df, 3)
    m2, _ = bpe_train(df.repartition(7), 3)
    assert m1 == m2
