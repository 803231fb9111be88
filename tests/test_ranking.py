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


# -- reciprocal-rank fusion (rrf_fuse, round-7) ------------------------------


def _ref_rrf(lists, k=60):
    """Pure-Python RRF: dict id -> (score, n_lists)."""
    acc = {}
    for lst in lists:
        for _id, rank in lst:
            s, n = acc.get(_id, (0.0, 0))
            acc[_id] = (round(s + round(1.0 / (k + rank), 9), 9), n + 1)
    return acc


_L_LEX = [(10, 1), (11, 2), (12, 3), (13, 4)]
_L_DENSE = [(12, 1), (10, 2), (14, 3)]


def test_rrf_matches_reference(spark):
    from diabetes_etl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(_L_LEX, "doc_id long, rank int")
    b = spark.createDataFrame(_L_DENSE, "doc_id long, rank int")
    got = {
        r.doc_id: (r.rrf_score, r.n_lists)
        for r in rrf_fuse([a, b]).collect()
    }
    want = _ref_rrf([_L_LEX, _L_DENSE])
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i][0] - want[i][0]) < 1e-9
        assert got[i][1] == want[i][1]


def test_rrf_rank_order_and_topk(spark):
    from diabetes_etl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(_L_LEX, "doc_id long, rank int")
    b = spark.createDataFrame(_L_DENSE, "doc_id long, rank int")
    rows = rrf_fuse([a, b], topk=3).collect()
    want = _ref_rrf([_L_LEX, _L_DENSE])
    order = sorted(want, key=lambda i: (-want[i][0], i))[:3]
    assert [r.doc_id for r in rows] == order
    assert [r.rrf_rank for r in rows] == [1, 2, 3]


def test_rrf_exact_tie_breaks_by_id(spark):
    from diabetes_etl_spark.operators.ranking import rrf_fuse

    # docs 20 and 21 hold ranks {1,2} and {2,1}: fused scores TIE
    # exactly (decimal fold, not float accumulation) and the id
    # tiebreak must put 20 first
    a = spark.createDataFrame([(20, 1), (21, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(21, 1), (20, 2)], "doc_id long, rank int")
    rows = rrf_fuse([a, b]).collect()
    assert [r.doc_id for r in rows] == [20, 21]
    assert rows[0].rrf_score == rows[1].rrf_score
    assert [r.rrf_rank for r in rows] == [1, 2]


def test_rrf_single_list_and_missing_docs(spark):
    from diabetes_etl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(_L_LEX, "doc_id long, rank int")
    rows = rrf_fuse([a]).collect()
    assert all(r.n_lists == 1 for r in rows)
    assert [r.doc_id for r in rows] == [10, 11, 12, 13]  # rank order


def test_rrf_empty_input_raises(spark):
    import pytest as _pytest

    from diabetes_etl_spark.operators.ranking import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])
