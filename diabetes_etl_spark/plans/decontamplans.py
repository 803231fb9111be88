"""Registered decontamination query: documents from ``source='src0'``
act as the benchmark/eval set, everything else is the training corpus;
any corpus doc sharing a 5-token shingle with the benchmark is flagged
(operators/decontam.py).  The fixture corpus draws from a shared
vocabulary, so organic 5-gram collisions give the query real
positives and real negatives at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.decontam import decontaminate
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_N = 5
_BENCH_SRC = "src0"

_D_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"
_D_SHINGLES = (
    f"list_distinct(list_transform("
    f"generate_series(1, greatest(len({_D_TOKENS}) - {_N - 1}, 1)), "
    f"i -> array_to_string({_D_TOKENS}[i:i+{_N - 1}], ' ')))"
)


@register(
    "decontam_overlap_stats",
    oracle=f"""
WITH bench AS (
  SELECT DISTINCT unnest({_D_SHINGLES}) AS g
  FROM documents WHERE source = '{_BENCH_SRC}'
),
corp_grams AS (
  SELECT doc_id, unnest({_D_SHINGLES}) AS g
  FROM documents WHERE source <> '{_BENCH_SRC}'
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hit_grams
  FROM corp_grams JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT d.lang,
  COUNT(*) AS docs_total,
  CAST(SUM(CASE WHEN h.n_hit_grams IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_contaminated,
  CAST(COALESCE(SUM(h.n_hit_grams), 0) AS BIGINT) AS total_hit_grams
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.source <> '{_BENCH_SRC}'
GROUP BY d.lang ORDER BY d.lang
""",
    doc="Benchmark decontamination: corpus docs sharing any 5-token "
    "shingle with the src0 eval set, counted per language.  The "
    "benchmark shingle dictionary broadcasts (the corpus never "
    "shuffles its text); post-join volume is proportional to "
    "contamination; the oracle replays the same shingling and join "
    "in DuckDB.",
    tags=("decontam", "dedup", "text", "extension"),
    extended=False,  # promoted to the gate round 6 (see registry._EXTENDED rationale)
)
def decontam_overlap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == _BENCH_SRC)
    corpus = docs.filter(F.col("source") != _BENCH_SRC)
    flagged = decontaminate(corpus, bench, n=_N)
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("docs_total"),
            F.sum(F.col("contaminated").cast("int")).alias("docs_contaminated"),
            F.sum("n_hit_grams").alias("total_hit_grams"),
        )
        .orderBy("lang")
    )
