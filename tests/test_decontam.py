"""Decontamination operator (operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
)


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated text about spark planning internals"),
        (3, "prefix words then the quick brown fox jumps too"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps around")],
        "doc_id long, text string",
    )


def test_flags_only_overlapping_docs(spark):
    out = decontaminate(_corpus(spark), _bench(spark), n=5).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].contaminated and by_id[1].n_hit_grams >= 1
    assert by_id[3].contaminated  # shares 'the quick brown fox jumps'
    assert not by_id[2].contaminated and by_id[2].n_hit_grams == 0


def test_drop_equals_anti_join_of_flags(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=5, drop=True).collect()}
    flagged = decontaminate(corpus, bench, n=5)
    clean = {r.doc_id for r in flagged.filter(~F.col("contaminated")).collect()}
    assert kept == clean == {2}


def test_broadcast_and_shuffle_paths_agree(spark):
    corpus, bench = _corpus(spark), _bench(spark)
    a = sorted(map(tuple, contamination_hits(corpus, bench, n=5, broadcast=True).collect()))
    b = sorted(map(tuple, contamination_hits(corpus, bench, n=5, broadcast=False).collect()))
    assert a == b


def test_benchmark_side_broadcasts(spark):
    plan = decontaminate(_corpus(spark), _bench(spark), n=5)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_short_doc_shingle_edge(spark):
    """Docs shorter than n tokens still produce one (short) shingle;
    an identical short doc in the benchmark must match it."""
    corpus = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    out = decontaminate(corpus, bench, n=8).collect()
    assert out[0].contaminated
