"""Deduplication query plans over the `documents` fixture
(operators/dedup.py).  Exact dedup and blocked n-gram Jaccard are
oracle-paired; MinHash-LSH and SimHash use engine-specific hashing
(xxhash64) so they get rows-only driver checks plus recall/consistency
assertions against the exact operators in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from diabetes_etl_spark.operators import dedup as DD
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_D_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"
_D_SHINGLES = (
    f"list_distinct(list_transform("
    f"generate_series(1, greatest(len({_D_TOKENS}) - 4, 1)), "
    f"i -> array_to_string({_D_TOKENS}[i:i+4], ' ')))"
)


@register(
    "dedup_exact_docs",
    oracle="""
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
    doc="Exact dedup: hash-groupBy on md5(text), canonical min-id per "
    "group (one shuffle of (hash, id) — never ships text twice).",
    tags=("dedup", "extension"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup_groups(docs, "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_D_SHINGLES} AS sh, CAST(length(text) AS BIGINT) AS len
  FROM documents
),
b AS (
  SELECT doc_id, len // 50 AS band FROM t
  UNION ALL
  SELECT doc_id, len // 50 + 1 AS band FROM t
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM b a JOIN b c ON a.band = c.band AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, jaccard_sim FROM (
  SELECT doc_a, doc_b,
    ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
      AS jaccard_sim
  FROM cand
  JOIN t x ON cand.doc_a = x.doc_id
  JOIN t y ON cand.doc_b = y.doc_id
) WHERE jaccard_sim >= 0.8
""",
    doc="Exact near-dup pairs: 5-token-shingle Jaccard >= 0.8, blocked on "
    "a 50-char length band (each doc also emitted into the next band so "
    "boundary pairs are kept) — operators/dedup.py:ngram_jaccard_pairs.",
    tags=("dedup", "extension"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=5, threshold=0.8, band_width=50,
        length_col=None,
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based; verified against exact Jaccard in tests
    doc="MinHash(32)+LSH(8 bands x 4 rows) near-dup detection with exact "
    "Jaccard verification of candidates — the 100 TB dedup path (no "
    "quadratic block scan).  Recall vs the exact operator asserted in "
    "tests/test_dedup.py.",
    tags=("dedup", "lsh", "extension"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(
        docs, "doc_id", "text", n=5, num_hashes=32, bands=8, threshold=0.8
    )


@register(
    "dedup_simhash_pairs",
    oracle=None,  # xxhash64-based bit signature; properties in tests
    doc="SimHash(63-bit) near-dup pairs with hamming <= 3 via 16-bit "
    "chunk pigeonhole join + bit_count verification.",
    tags=("dedup", "simhash", "extension"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)
