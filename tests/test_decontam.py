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


# -- span-level decontamination (excision) -----------------------------------


def test_excise_contaminated_spans_cuts_only_benchmark_overlap(spark):
    from diabetes_etl_spark.operators.dedup import excise_contaminated_spans

    leak = "q1 q2 q3 q4 q5 q6 q7 q8"
    train = spark.createDataFrame(
        [
            (1, f"pre1 pre2 {leak} post1 post2"),
            (2, "all clean tokens here nothing shared with eval set x y"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"eval intro {leak} eval outro")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in excise_contaminated_spans(train, bench, k=8).collect()
    }
    assert (out[1].n_spans_removed, out[1].n_tokens_removed) == (1, 8)
    assert out[1].cleaned_text == "pre1 pre2 post1 post2"
    assert out[2].n_spans_removed == 0
    assert "clean" in out[2].cleaned_text


def test_excise_contaminated_spans_long_leak_one_interval(spark):
    """A 10-token leaked passage marks 3 overlapping 8-token positions
    -> ONE merged 10-token excision."""
    from diabetes_etl_spark.operators.dedup import excise_contaminated_spans

    leak = "l1 l2 l3 l4 l5 l6 l7 l8 l9 l10"
    train = spark.createDataFrame(
        [(1, f"a b {leak} c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, leak)], "doc_id long, text string"
    )
    row = excise_contaminated_spans(train, bench, k=8).collect()[0]
    assert (row.n_spans_removed, row.n_tokens_removed) == (1, 10)
    assert row.cleaned_text == "a b c d"


def test_excise_contaminated_spans_no_false_positives(spark):
    """Shared tokens below the k-gram threshold must NOT trigger cuts."""
    from diabetes_etl_spark.operators.dedup import excise_contaminated_spans

    train = spark.createDataFrame(
        [(1, "q1 q2 q3 other stuff entirely different tail here now")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 q6 q7 q8")], "doc_id long, text string"
    )
    row = excise_contaminated_spans(train, bench, k=8).collect()[0]
    assert row.n_tokens_removed == 0
