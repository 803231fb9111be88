"""WordPiece greedy segmentation (operators/wordpiece.py): pure-Python
reference parity, longest-match preference, single-char fallback,
fingerprint sensitivity, vocab determinism, and the shuffle-free plan
shape of the segmentation projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.wordpiece import (
    wordpiece_pipeline,
    wordpiece_segment_stats,
    wordpiece_vocab,
)

_MOD, _BASE = 1_073_741_789, 131


def _ref_word(w, vocab, max_len=4):
    pos, np, fp = 0, 0, 0
    while pos < len(w):
        j = 1
        for l in range(max_len, 1, -1):
            if pos + l <= len(w) and w[pos : pos + l] in vocab:
                j = l
                break
        pos += j
        np += 1
        fp = (fp * _BASE + j) % _MOD
    return np, fp


def _ref_doc(text, vocab, max_len=4):
    words = text.strip().split() or [""]
    np_total, doc_fp = 0, 0
    for w in words:
        np, fp = _ref_word(w, vocab, max_len)
        np_total += np
        doc_fp = (doc_fp * _BASE + fp) % _MOD
    return len(words), np_total, doc_fp


def test_wordpiece_matches_python_reference(spark):
    vocab = ["ban", "ana", "na", "tabl", "qu"]
    rows = [
        (0, "banana bandana quest"),
        (1, "table tables"),
        (2, "zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in wordpiece_segment_stats(df, vocab).collect()}
    for i, t in rows:
        nw, np, fp = _ref_doc(t, set(vocab))
        r = out[i]
        assert (r.n_words, r.n_pieces, r.doc_fp) == (nw, np, fp), t


def test_wordpiece_longest_match_first(spark):
    """With 'ab', 'abc', 'abcd' all in vocab, 'abcdx' must take
    'abcd' (4) + 'x' (1), never the shorter prefixes."""
    df = spark.createDataFrame([(0, "abcdx")], "doc_id long, text string")
    r = wordpiece_segment_stats(df, ["ab", "abc", "abcd"]).collect()[0]
    assert r.n_pieces == 2
    assert r.doc_fp == (4 * _BASE + 1) % _MOD


def test_wordpiece_oov_falls_back_to_chars(spark):
    df = spark.createDataFrame([(0, "xyzq")], "doc_id long, text string")
    r = wordpiece_segment_stats(df, ["ab"]).collect()[0]
    assert r.n_pieces == 4  # all single chars


def test_wordpiece_fp_detects_moved_cut(spark):
    """'abab' as ab+ab vs a+bab: the piece-length sequences (2,2) and
    (1,3) must fingerprint apart."""
    df = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    a = wordpiece_segment_stats(df, ["ab"]).collect()[0].doc_fp
    b = wordpiece_segment_stats(df, ["bab"]).collect()[0].doc_fp
    assert a != b


def test_wordpiece_vocab_top_v_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "banana bandana cabana") for i in range(5)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in wordpiece_vocab(df, top_v=7).collect()]
    b = [
        tuple(r)
        for r in wordpiece_vocab(df.repartition(9), top_v=7).collect()
    ]
    assert a == b
    assert all(a[i][1] >= a[i + 1][1] for i in range(len(a) - 1))


def test_wordpiece_pipeline_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"word{i % 7} common tokens here") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, wordpiece_pipeline(df, top_v=20).collect()))
    b = sorted(
        map(tuple, wordpiece_pipeline(df.repartition(11), top_v=20).collect())
    )
    assert a == b


def test_wordpiece_segment_plan_is_shuffle_free_jvm(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    out = wordpiece_segment_stats(df, ["ab"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
