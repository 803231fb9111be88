"""End-to-end LLM training-data preparation pipeline over `documents`:
exact dedup -> MinHash-LSH near-dup removal -> quality gate -> per-
language corpus/token budget.  One composed DataFrame plan — the shape
a 100 TB pre-training data pipeline runs nightly, assembled from the
individually-gated operators (operators/dedup.py, operators/text.py).

Scale notes: stage 1 is one (md5, id) hash-agg shuffle; stage 2 is the
bucketed MinHash path (bounded buckets, no quadratic block scan) whose
pair output is far smaller than the corpus; stages 3-4 are native
expressions folded into one scan of the survivors plus a tiny
per-language aggregate.  The only text-payload shuffle is the exact-
verification join of stage 2's candidate ids.

The oracle replays the pipeline with UNBANDED exact all-pairs Jaccard
as the near-dup ground truth (quadratic, fine at oracle scale): the
MinHash stage's gate recall is 1.0 (tests/test_dedup.py), and its
candidates are exact-verified (precision 1.0), so the approximate
plan's survivors equal the exact pipeline's — any recall regression
fails the local oracle suite instead of hiding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.operators import dedup as DD
from diabetes_etl_spark.operators import text as TX
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_D_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"
_D_SHINGLES = (
    f"list_distinct(list_transform("
    f"generate_series(1, greatest(len({_D_TOKENS}) - 4, 1)), "
    f"i -> array_to_string({_D_TOKENS}[i:i+4], ' ')))"
)
_D_STOPS_EN = (
    r"length(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in)\b'))"
)
_D_QUALITY = f"""ROUND(
      0.4 * least(len({_D_TOKENS}) / CAST(100 AS DOUBLE), 1.0)
    + 0.3 * least({_D_STOPS_EN} / CAST(10 AS DOUBLE), 1.0)
    + 0.3 * (CAST(len(list_distinct({_D_TOKENS})) AS DOUBLE)
             / len({_D_TOKENS})), 6)"""

_DOCS_PREP_ORACLE = f"""
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
docs1 AS (
  SELECT d.* FROM documents d JOIN keep USING (doc_id)
),
sh AS (
  SELECT doc_id, {_D_SHINGLES} AS sh FROM docs1
),
neardup_drop AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
),
docs2 AS (
  SELECT * FROM docs1
  WHERE doc_id NOT IN (SELECT doc_id FROM neardup_drop)
),
scored AS (
  SELECT lang,
    len({_D_TOKENS}) AS n_tokens,
    len(regexp_extract_all(text,
        ' ?[A-Za-z]+| ?[0-9]{{1,3}}| ?[^A-Za-z0-9\\s]+')) AS n_subwords,
    {_D_QUALITY} AS q
  FROM docs2
)
SELECT lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
  CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_quality
FROM scored
WHERE q >= 0.5
GROUP BY lang
ORDER BY lang
"""


@register(
    "docs_prep_pipeline",
    oracle=_DOCS_PREP_ORACLE,
    doc="E2E training-data prep: exact dedup (md5 min-id), MinHash-LSH "
    "near-dup removal (drop the larger id of each verified >=0.8 pair), "
    "quality gate >= 0.5, per-language doc/token/subword budget.  "
    "Composes the gated dedup/text operators into the nightly corpus "
    "pipeline shape; oracle replays it with unbanded exact Jaccard.",
    tags=("dedup", "text", "pipeline", "extension"),
    extended=True,
)
def docs_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: exact dedup — keep the canonical min doc_id per md5 group
    keep = DD.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    docs1 = docs.join(keep, "doc_id", "semi")

    # stage 2: near-dup removal on the scale path (bucketed MinHash,
    # exact-verified candidates); canonical pairs have doc_a < doc_b,
    # so dropping every doc_b keeps the smallest id of each dup group
    # that the pair relation connects directly
    pairs = DD.minhash_lsh_pairs(
        docs1, "doc_id", "text", n=5, num_hashes=32, bands=8, threshold=0.8
    )
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    docs2 = docs1.join(dropped, "doc_id", "anti")

    # stages 3-4: quality gate + per-language budget, one scan
    t = F.col("text")
    scored = docs2.select(
        "lang",
        TX.token_count(t).cast("long").alias("n_tokens"),
        TX.subword_count(t).cast("long").alias("n_subwords"),
        TX.quality_score(t).alias("q"),
    ).filter(F.col("q") >= 0.5)
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_subwords").alias("total_subwords"),
            (
                F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )
