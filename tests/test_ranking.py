"""BM25 ranking (operators/ranking.py) — pinned against a pure-Python
Okapi BM25 (Lucene idf form) and checked for partition invariance and
the broadcast plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.ranking import bm25_scores, bm25_topk

_DOCS = [
    (1, "spark join window join hash"),
    (2, "stream stream stream window"),
    (3, "the quick brown fox"),
    (4, "join join join join join window"),
    (5, "vector hash dup dup"),
    (6, "window"),
]
_TERMS = ["join", "window", "dup"]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for t in terms:
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1), 9)
        for i, v in toks.items():
            tf = v.count(t)
            if tf:
                w = round(
                    idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl)),
                    9,
                )
                out[i] = round(out.get(i, 0.0) + w, 9)
    return out


def test_bm25_scores_match_reference(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r.doc_id: r.bm25_score for r in bm25_scores(df, _TERMS).collect()}
    want = _ref_bm25(_DOCS, _TERMS)
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_bm25_topk_rank_and_tiebreak(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = bm25_topk(df, _TERMS, k=3).collect()
    want = _ref_bm25(_DOCS, _TERMS)
    order = sorted(want, key=lambda i: (-want[i], i))[:3]
    assert [r.doc_id for r in rows] == order
    assert [r.bm25_rank for r in rows] == [1, 2, 3]


def test_bm25_nonmatching_docs_absent(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    ids = {r.doc_id for r in bm25_scores(df, _TERMS).collect()}
    assert 3 not in ids  # no query term -> join-reduced away


def test_bm25_partition_invariant(spark):
    df = spark.createDataFrame(_DOCS * 5, "doc_id long, text string")
    a = sorted(map(tuple, bm25_scores(df, _TERMS).collect()))
    b_ = sorted(map(tuple, bm25_scores(df.repartition(7), _TERMS).collect()))
    assert a == b_


def test_bm25_broadcasts_query_sized_sides(spark, sf_dir):
    from diabetes_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        bm25_scores(docs, _TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
