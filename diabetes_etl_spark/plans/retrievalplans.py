"""Hybrid-retrieval query plans: reciprocal-rank fusion of the BM25
lexical ranking (operators/ranking.py) with the exact dense cosine
ranking (operators/similarity.py) over the aligned documents /
embeddings fixtures (doc_id == vec_id by construction).

This is the retrieval stack a training-data pipeline runs for
targeted decontamination and dedup triage: a lexical pass catches
verbatim/term overlap, a dense pass catches paraphrase, and RRF
combines them without ever comparing their incomparable score scales.
The oracle replays both retrievers AND the fusion in DuckDB — every
rank, contribution, and fused score is hash-checked, not just the
final top-k membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.plans.simplans import _D_NORMS
from diabetes_etl_spark.plans.textplans import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TERMS_SQL,
    _D_TOKENS,
)
from diabetes_etl_spark.sources.tables import load_table

# fusion parameters: both retrievers contribute their top-15; the
# fused list keeps the top-10 (k_rrf = 60 is the RRF paper constant)
_RRF_K = 60
_RRF_DEPTH = 15
_RRF_TOPK = 10
_RRF_QVEC = 3  # the dense query vector (and its aligned document)

_RRF_ORACLE = f"""
WITH base AS (
  SELECT doc_id, len({_D_TOKENS}) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
),
toks AS (
  SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, tok
),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
idf AS (
  SELECT tok,
    ROUND(LN((CAST(n AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
             / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 9)
      AS idf
  FROM dft CROSS JOIN stats
),
per_term AS (
  SELECT tf.doc_id,
    ROUND(idf.idf * (tf.tf * CAST({_BM25_K1 + 1.0} AS DOUBLE))
      / (tf.tf + CAST({_BM25_K1} AS DOUBLE)
         * (CAST({1.0 - _BM25_B} AS DOUBLE)
            + CAST({_BM25_B} AS DOUBLE) * CAST(base.dl AS DOUBLE)
              / stats.avgdl)), 9) AS w
  FROM tf JOIN idf USING (tok) JOIN base USING (doc_id)
  CROSS JOIN stats
),
bm25 AS (
  SELECT doc_id,
    CAST(SUM(CAST(w AS DECIMAL(18,9))) AS DOUBLE) AS bm25_score
  FROM per_term GROUP BY doc_id
),
lex AS (
  SELECT doc_id, rn FROM (
    SELECT doc_id,
      row_number() OVER (ORDER BY bm25_score DESC, doc_id) AS rn
    FROM bm25
  ) WHERE rn <= {_RRF_DEPTH}
),
{_D_NORMS},
dpairs AS (
  SELECT c.vec_id AS candidate_id, q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c
    ON q.vec_id = {_RRF_QVEC} AND c.vec_id != {_RRF_QVEC}
),
dupairs AS (
  SELECT candidate_id, unnest(qe) AS qx, unnest(ce) AS cx FROM dpairs
),
ddots AS (
  SELECT candidate_id,
    CAST(SUM(CAST(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE)
         AS DECIMAL(20,15))) AS DOUBLE) AS dot
  FROM dupairs GROUP BY candidate_id
),
dscored AS (
  SELECT d.candidate_id,
    ROUND(d.dot / (nq.nrm * nc.nrm), 9) AS cosine_sim
  FROM ddots d
  JOIN norms nq ON nq.vec_id = {_RRF_QVEC}
  JOIN norms nc ON d.candidate_id = nc.vec_id
),
dense AS (
  SELECT candidate_id AS doc_id, rn FROM (
    SELECT candidate_id,
      row_number() OVER (ORDER BY cosine_sim DESC, candidate_id) AS rn
    FROM dscored
  ) WHERE rn <= {_RRF_DEPTH}
),
contrib AS (
  SELECT doc_id,
    CAST(ROUND(1.0 / ({_RRF_K} + rn), 9) AS DECIMAL(18,9)) AS c
  FROM lex
  UNION ALL
  SELECT doc_id,
    CAST(ROUND(1.0 / ({_RRF_K} + rn), 9) AS DECIMAL(18,9)) AS c
  FROM dense
),
fused AS (
  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS rrf_score,
         CAST(COUNT(*) AS INT) AS n_lists
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, rrf_score, n_lists, CAST(rn AS INT) AS rrf_rank FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_RRF_TOPK}
"""


@register(
    "retrieval_rrf_hybrid",
    oracle=_RRF_ORACLE,
    doc=f"Hybrid retrieval via reciprocal-rank fusion (k={_RRF_K}): "
    f"the BM25 top-{_RRF_DEPTH} for a {len(_BM25_TERMS)}-term lexical "
    f"query fuses with the exact dense cosine top-{_RRF_DEPTH} for "
    f"query vector {_RRF_QVEC} into one top-{_RRF_TOPK} "
    "(operators/ranking.py:rrf_fuse).  Fusion consumes only RANKS — "
    "query-sized inputs, so it unions two tiny frames and never "
    "touches the corpus; the corpus-scale work stays in the fused "
    "retrievers (isin-pruned BM25 scan, broadcast-query cosine).  "
    "1/(k+rank) is integer-operand IEEE division quantized to 9 "
    "decimals and summed through DECIMAL(18,9), so fused scores are "
    "hash-checkable; the oracle replays both retrievers and the "
    "fusion.",
    tags=("retrieval", "ranking", "hybrid", "extension"),
    extended=False,  # promoted to the gate round 8 (registry._EXTENDED rationale)
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.ranking import bm25_topk, rrf_fuse
    from diabetes_etl_spark.operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(
        docs, _BM25_TERMS, k=_RRF_DEPTH, k1=_BM25_K1, b=_BM25_B
    ).select("doc_id", F.col("bm25_rank").alias("rank"))
    dense = cosine_topk(
        emb, F.col("vec_id") == _RRF_QVEC, k=_RRF_DEPTH
    ).select(
        F.col("candidate_id").alias("doc_id"),
        F.col("sim_rank").alias("rank"),
    )
    return rrf_fuse(
        [lex, dense], id_col="doc_id", rank_col="rank",
        k_rrf=_RRF_K, topk=_RRF_TOPK,
    )
