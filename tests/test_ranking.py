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


# -- MMR diversified top-k ---------------------------------------------------


def _mmr_vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_mmr_skips_redundant_runner_up(spark):
    """Corpus: query q=(1,0); c1=(0.9,0.436) and its EXACT duplicate
    c2, plus the mirror image c3=(0.9,-0.436) — all three equally
    relevant to q.  Rank 1 takes c1 (id tie-break); rank 2 must skip
    the duplicate (similarity 1.0 to c1) and take the mirror, whose
    penalty is far lower.  Pure relevance would rank c1, c2."""
    from diabetes_etl_spark.operators.ranking import mmr_topk
    from pyspark.sql import functions as F

    df = _mmr_vecs(
        spark,
        [
            (0, [1.0, 0.0]),       # the query
            (1, [0.9, 0.436]),
            (2, [0.9, 0.436]),     # exact duplicate of c1
            (3, [0.9, -0.436]),    # equally relevant, diverse
        ],
    )
    out = sorted(
        (r.mmr_rank, r.selected_id)
        for r in mmr_topk(df, F.col("vec_id") == 0, k=2, lam=0.5).collect()
    )
    assert out == [(1, 1), (2, 3)]


def test_mmr_rank1_is_pure_relevance_argmax(spark):
    from diabetes_etl_spark.operators.ranking import mmr_topk
    from diabetes_etl_spark.operators.similarity import cosine_topk
    from pyspark.sql import functions as F

    df = _mmr_vecs(
        spark,
        [(i, [float((i * 7) % 13) + 0.1, float((i * 5) % 11) + 0.1])
         for i in range(20)],
    )
    top1 = {
        r.query_id: r.candidate_id
        for r in cosine_topk(df, F.col("vec_id") < 3, k=1).collect()
    }
    mmr1 = {
        r.query_id: r.selected_id
        for r in mmr_topk(df, F.col("vec_id") < 3, k=3).collect()
        if r.mmr_rank == 1
    }
    assert mmr1 == top1


def test_mmr_partition_invariant_bit_identical(spark):
    from diabetes_etl_spark.operators.ranking import mmr_topk
    from pyspark.sql import functions as F

    df = _mmr_vecs(
        spark,
        [(i, [float((i * 7) % 13) + 0.1, float((i * 5) % 11) + 0.1,
              float(i % 3) + 0.1])
         for i in range(30)],
    )

    def run(d):
        return sorted(
            (r.query_id, r.selected_id, r.mmr_score, r.mmr_rank)
            for r in mmr_topk(d, F.col("vec_id") < 2, k=4).collect()
        )

    assert run(df) == run(df.repartition(13))


def test_mmr_pool_smaller_than_k(spark):
    """pool=2 with k=4: only 2 candidates ever reachable -> 2 rows per
    query, no error, ranks 1..2."""
    from diabetes_etl_spark.operators.ranking import mmr_topk
    from pyspark.sql import functions as F

    df = _mmr_vecs(
        spark,
        [(i, [float(i + 1), float(2 * i + 1)]) for i in range(6)],
    )
    rows = mmr_topk(df, F.col("vec_id") == 0, k=4, pool=2).collect()
    assert sorted(r.mmr_rank for r in rows) == [1, 2]


def test_mmr_zero_norm_vectors_dropped(spark):
    from diabetes_etl_spark.operators.ranking import mmr_topk
    from pyspark.sql import functions as F

    df = _mmr_vecs(
        spark,
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5]),
         (3, [0.9, 0.1])],
    )
    rows = mmr_topk(df, F.col("vec_id") == 0, k=3).collect()
    assert 1 not in {r.selected_id for r in rows}
    assert len(rows) == 2


def test_rocchio_prf_expands_and_rescores(spark, tmp_path):
    """Tiny corpus where feedback docs share a strong co-occurring
    term: PRF must pick it as an expansion term and pull in a doc
    that matches ONLY the expansion term (recall win the plain query
    cannot achieve)."""
    from diabetes_etl_spark.operators.ranking import (
        bm25_topk,
        rocchio_prf_topk,
    )

    rows = [
        # "shuffle" co-occurs with the query in every feedback doc
        # (r=3); alpha/beta/gamma also live in the chaff so their
        # higher idf cannot outbid r_t on the offer weight
        (0, "join shuffle alpha", "en", "s", 1),
        (1, "join shuffle beta", "en", "s", 1),
        (2, "join shuffle gamma", "en", "s", 1),
        # matches only the expansion term "shuffle":
        (3, "shuffle shuffle metrics", "en", "s", 1),
        (4, "alpha beta gamma quantile", "en", "s", 1),
        (5, "alpha beta gamma window", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    d = str(tmp_path / "prf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    stored = spark.read.parquet(f"{d}/documents.parquet")

    plain = {r.doc_id for r in bm25_topk(stored, ("join",), k=6).collect()}
    assert 3 not in plain  # doc 3 has no query term at all

    out = rocchio_prf_topk(
        stored, ("join",), fb_k=3, exp_k=1, beta=0.5, k=6
    ).collect()
    assert out, "PRF returned nothing"
    assert out[0].exp_terms == "shuffle"
    ids = {r.doc_id for r in out}
    assert 3 in ids  # recall win via the expansion term
    # ranks are dense, ties broken deterministically
    assert [r.prf_rank for r in out] == list(range(1, len(out) + 1))
