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


# -- round-8 docs-prep pipeline v2: clean -> score -> select -----------------

_V2_K = 8
_V2_BLOCK = "slow"
_V2_B = 64
_V2_TOPK = 50

_V2_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, i AS idx,
         array_to_string(
           list_slice(t, i * {_V2_K} + 1, i * {_V2_K} + {_V2_K}), ' ')
           AS line
  FROM toks,
       unnest(generate_series(0, (len(t) + {_V2_K - 1}) // {_V2_K} - 1))
         AS u(i)
),
surv AS (
  SELECT doc_id, idx, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
  FROM lines
  WHERE NOT list_contains(string_split(line, ' '), '{_V2_BLOCK}')
),
kept AS (
  SELECT doc_id,
         string_agg(line, ' ' ORDER BY idx) AS ct,
         count(*) AS n_kept
  FROM surv WHERE rn = 1 GROUP BY doc_id
),
survd AS (
  SELECT d.doc_id, d.lang, k.ct
  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
  WHERE k.n_kept >= 2
),
ctoks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(ct), '\\s+') AS t
  FROM survd
),
bk AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_V2_B} AS b
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i + 1])) AS g
    FROM ctoks WHERE len(t) >= 2
  )
),
cr AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
tc AS (SELECT b, count(*) AS tc FROM bk WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM bk) AS nr,
         (SELECT count(*) FROM bk WHERE lang = 'en') AS nt
),
llr AS (
  SELECT s.b,
         round(ln(CAST((coalesce(tc.tc, 0) + 1) * (tot.nr + {_V2_B})
                       AS DOUBLE)
                  / CAST((coalesce(cr.cr, 0) + 1) * (tot.nt + {_V2_B})
                         AS DOUBLE)), 9) AS llr
  FROM (SELECT unnest(generate_series(0, {_V2_B - 1})) AS b) s
  LEFT JOIN tc ON s.b = tc.b
  LEFT JOIN cr ON s.b = cr.b
  CROSS JOIN tot
),
scored AS (
  SELECT bk.doc_id,
         CAST(SUM(CAST(llr.llr AS DECIMAL(38,12))) AS DOUBLE) AS lw
  FROM bk JOIN llr ON bk.b = llr.b
  GROUP BY bk.doc_id
),
enr AS (
  SELECT s.doc_id, c.lang, len(c.t) AS n_tokens_kept, s.lw
  FROM scored s JOIN ctoks c ON s.doc_id = c.doc_id
),
sel AS (SELECT doc_id FROM enr ORDER BY lw DESC, doc_id LIMIT {_V2_TOPK})
SELECT lang,
       count(*) AS n_docs,
       CAST(SUM(n_tokens_kept) AS BIGINT) AS total_tokens_kept,
       CAST(SUM(CAST(lw AS DECIMAL(38,12))) AS DOUBLE) / count(*)
         AS avg_log_weight,
       CAST(SUM(CASE WHEN enr.doc_id IN (SELECT doc_id FROM sel)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
FROM enr
GROUP BY lang
ORDER BY lang
"""


@register(
    "docs_prep_pipeline_v2",
    oracle=_V2_ORACLE,
    doc="Round-8 docs-prep pipeline: C4-style line cleaning with "
    "reconstruction (rule drop + corpus-wide first-occurrence line "
    "dedup) -> survivors with >= 2 kept lines -> DSIR hashed-bigram "
    "LLR scoring of the CLEANED text against the lang='en' target -> "
    f"deterministic global top-{_V2_TOPK} selection (log_weight desc, "
    "doc_id tiebreak) -> per-language budget (docs, kept tokens, "
    "decimal-pinned mean log-weight, selected count).  Every stage is "
    "an individually-gated round-8 operator; the oracle replays the "
    "ENTIRE chain, cleaned text through selection, in SQL.  Scale "
    "shape inherits the stages': line dedup shuffles hashes not text, "
    "the DSIR bucket models are B-row aggregates, selection is a "
    "TakeOrderedAndProject top-k — no corpus-wide sort.",
    tags=("dedup", "dsir", "pipeline", "extension"),
    extended=True,
)
def docs_prep_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.functions.numeric import dec_sum
    from diabetes_etl_spark.operators.dedup import remove_duplicate_lines
    from diabetes_etl_spark.operators.sampling import dsir_llr_scores

    docs = load_table(spark, sf_dir, "documents")
    c4 = remove_duplicate_lines(
        docs, line_tokens=_V2_K, blocklist=(_V2_BLOCK,)
    )
    survd = (
        c4.filter(F.col("n_kept") >= 2)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "cleaned_text")
    )
    scored = dsir_llr_scores(
        survd,
        survd.filter(F.col("lang") == "en"),
        text_col="cleaned_text",
        n_buckets=_V2_B,
    )
    enr = scored.join(survd, "doc_id").select(
        "doc_id",
        "lang",
        TX.token_count(F.col("cleaned_text")).cast("long").alias(
            "n_tokens_kept"
        ),
        F.col("log_weight").alias("lw"),
    )
    sel = (
        enr.orderBy(F.desc("lw"), F.asc("doc_id"))
        .limit(_V2_TOPK)
        .select("doc_id", F.lit(1).alias("__sel"))
    )
    return (
        enr.join(sel, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens_kept").alias("total_tokens_kept"),
            (dec_sum(F.col("lw"), 12, 38) / F.count("*")).alias(
                "avg_log_weight"
            ),
            F.sum(F.coalesce(F.col("__sel"), F.lit(0)))
            .cast("long")
            .alias("n_selected"),
        )
        .orderBy("lang")
    )
