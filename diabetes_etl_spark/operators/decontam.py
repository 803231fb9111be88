"""Benchmark decontamination: flag (or drop) corpus documents that
share any n-token shingle with a benchmark/eval set — the standard
"test-set leakage" scrub a training corpus goes through before
tokenization (the GPT-3/PaLM papers' 8-13-gram overlap rule).

Shape (100 TB lens): the benchmark side is SMALL (eval sets are
thousands of documents — millions of distinct n-grams at most), the
corpus side is the 100 TB.  So:

- benchmark → distinct shingles, broadcast (`F.broadcast`): the big
  side never shuffles;
- corpus → explode its per-doc distinct shingles and inner-join the
  broadcast set: a row survives only on a hit, so the post-join
  volume is proportional to CONTAMINATION, not corpus size;
- per-doc hit counts aggregate on doc id (the only shuffle, carrying
  (id, n_hits) longs for contaminated docs only);
- the final flag attaches back with a left join on id.

For a benchmark too big to broadcast, pass ``broadcast=False`` and the
gram join becomes a plain hash join on the shingle string — still one
shuffle of (id, gram) pairs, never all-pairs.

No reference counterpart (SURVEY.md §6 extension tier); shingle
generation shares the Arrow shingle kernel
(operators/dedup.py:shingle_frame, parity-pinned against
operators/text.py:word_shingles) with the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-token shingles of the benchmark set (one column
    ``g``) — the contamination dictionary.  Deliberately stays on the
    Column form (round-14 measurement): the benchmark side is SMALL
    by contract (module docstring), and consumers evaluate it eagerly
    (bloom_bits collects it into a literal bitmask) or broadcast it —
    routing those few rows through the Arrow kernel paid a Python
    worker round-trip per evaluation that measured ~0.9s SLOWER
    paired on decontam_bloom_probe than the codegen'd expression.
    The 100 TB corpus side is where the kernel lives
    (contamination_hits below)."""
    from diabetes_etl_spark.operators.text import word_shingles

    return (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("g")
        )
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast: bool = True,
) -> DataFrame:
    """(id, n_hit_grams) for every corpus doc sharing >= 1 shingle
    with the benchmark.  Clean docs don't appear (join-reduced).
    Corpus shingling runs through the Arrow kernel too (see
    benchmark_shingles) — the corpus side is the 100 TB side, so the
    per-position interpreted lambda is where the operator's time went
    (round-13 phase profile); widen() first so the per-batch Python
    work spreads across cores instead of one input split."""
    from diabetes_etl_spark.operators.dedup import shingle_frame
    from diabetes_etl_spark.operators.util import widen

    bench = benchmark_shingles(benchmark, text_col, n)
    if broadcast:
        bench = F.broadcast(bench)
    grams = shingle_frame(widen(corpus), id_col, text_col, n).select(
        F.col("doc_id").alias(id_col), F.explode("sh").alias("g")
    )
    return (
        grams.join(bench, "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast: bool = True,
    drop: bool = False,
) -> DataFrame:
    """Corpus + ``contaminated``/``n_hit_grams`` columns (or, with
    ``drop=True``, only the clean rows — the anti-join formulation)."""
    hits = contamination_hits(corpus, benchmark, id_col, text_col, n, broadcast)
    if drop:
        return corpus.join(hits, id_col, "left_anti")
    out = corpus.join(hits, id_col, "left")
    return out.withColumn(
        "n_hit_grams", F.coalesce(F.col("n_hit_grams"), F.lit(0))
    ).withColumn("contaminated", F.col("n_hit_grams") > 0)
