"""Registered queries for the in-plan logistic-regression quality
classifier (operators/classifier.py): fixed-round batch GD training
whose every intermediate weight vector is hash-pinned by an
unrolled-CTE oracle, plus the trained model applied as a scan-local
scoring expression.

Feature/label contract (kept byte-identical between the Spark
expressions and the oracle SQL — the fixed left-to-right IEEE order
is the determinism mechanism):

- f1 = ROUND(LENGTH(text) / 1000.0, 4)           (length, kilochars)
- f2 = ROUND((LENGTH(text) - LENGTH(REPLACE(text,' ','')))
             / LENGTH(text), 4)                   (space ratio)
- y  = 1 if lang = 'en' else 0

Both features quantize to 4 decimals at the source so the
DECIMAL(38,15) gradient fold is exact (see operators/classifier.py's
determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_LR = 0.5
_ROUNDS = 3

_F1 = "ROUND(LENGTH(text) / CAST(1000 AS DOUBLE), 4)"
_F2 = (
    "ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) "
    "/ CAST(LENGTH(text) AS DOUBLE), 4)"
)
_Y = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"

# one GD round as SQL: margin in fixed term order, z quantized to 9
# decimals before the libm exp and sigma to 7 after it (see
# operators/classifier.py:sigmoid_q), gradient terms folded
# through DECIMAL(38,15) (exact — 11-decimal inputs), update pinned
# through DECIMAL(28,12) with the same (lr*g)/n association the Spark
# driver uses
_SIGMA = (
    "ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) "
    "+ EXP(-ROUND({z}, 9))), 7)"
)


def _round_sql(prev: str, cur: str) -> str:
    z = f"w.w0 + w.w1 * f.f1 + w.w2 * f.f2"
    sigma = _SIGMA.format(z=z)
    return f"""
g{cur} AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(({sigma} - f.y) AS DECIMAL(38,15))) AS g0,
    SUM(CAST(({sigma} - f.y) * f.f1 AS DECIMAL(38,15))) AS g1,
    SUM(CAST(({sigma} - f.y) * f.f2 AS DECIMAL(38,15))) AS g2
  FROM feat f CROSS JOIN r{prev} w
),
r{cur} AS (
  SELECT
    CAST(CAST(w.w0 - CAST({_LR} AS DOUBLE) * CAST(g.g0 AS DOUBLE) / g.n
              AS DECIMAL(28,12)) AS DOUBLE) AS w0,
    CAST(CAST(w.w1 - CAST({_LR} AS DOUBLE) * CAST(g.g1 AS DOUBLE) / g.n
              AS DECIMAL(28,12)) AS DOUBLE) AS w1,
    CAST(CAST(w.w2 - CAST({_LR} AS DOUBLE) * CAST(g.g2 AS DOUBLE) / g.n
              AS DECIMAL(28,12)) AS DOUBLE) AS w2
  FROM r{prev} w CROSS JOIN g{cur} g
)"""


_TRAIN_CTES = (
    f"""
WITH feat AS (
  SELECT {_F1} AS f1, {_F2} AS f2, {_Y} AS y
  FROM documents WHERE LENGTH(text) > 0
),
r0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
              CAST(0 AS DOUBLE) AS w2)"""
    + ",".join([""] + [_round_sql(i, i + 1) for i in range(_ROUNDS)])
)

_TRAIN_ORACLE = (
    _TRAIN_CTES
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS round, w0, w1, w2 FROM r{i}"
        for i in range(_ROUNDS + 1)
    )
    + "\nORDER BY round"
)

_SCORE_ORACLE = (
    _TRAIN_CTES
    + f""",
scored AS (
  SELECT d.lang,
    {_SIGMA.format(z="w.w0 + w.w1 * " + _F1 + " + w.w2 * " + _F2)} AS score
  FROM documents d CROSS JOIN r{_ROUNDS} w
  WHERE LENGTH(text) > 0
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CAST(score AS DECIMAL(28,9))) AS DOUBLE) AS sum_score,
  CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM scored GROUP BY lang ORDER BY lang
"""
)


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr("LENGTH(text) > 0")).select(
        "lang",
        F.expr(_F1).alias("f1"),
        F.expr(_F2).alias("f2"),
        F.expr(_Y).alias("y"),
    )


@register(
    "classifier_logreg_train",
    oracle=_TRAIN_ORACLE,
    doc=f"In-plan logistic-regression training ({_ROUNDS} full-batch "
    f"GD rounds, lr {_LR}) of an is-English quality classifier over "
    "two text features (operators/classifier.py:logistic_train_rounds)"
    ".  Per round: ONE map-side-combined aggregate pass computes the "
    "decimal-folded gradient; driver state is the (dim+1)-scalar "
    "weight vector (the k-means pattern — no row collect, no weight "
    "join).  The sigmoid is the one libm call, quantized on both "
    "sides of exp (9-decimal input, 7-decimal output); updates pin through "
    "DECIMAL(28,12).  The oracle unrolls identical rounds as CTE "
    "layers, so every intermediate weight vector is hash-pinned — "
    "an iterative ML trainer under the exact-hash gate discipline.",
    tags=("classifier", "ml", "iterative", "extension"),
    extended=True,
)
def classifier_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.classifier import logistic_train_rounds

    return logistic_train_rounds(
        _features(spark, sf_dir), ["f1", "f2"], "y",
        iterations=_ROUNDS, lr=_LR,
    ).orderBy("round")


@register(
    "classifier_quality_apply",
    oracle=_SCORE_ORACLE,
    doc="The trained quality model APPLIED: re-derives the round-"
    f"{_ROUNDS} weights (3 aggregate passes) and scores every "
    "document with a scan-local quantized-sigmoid expression "
    "(operators/classifier.py:logistic_score — pure codegen, no UDF, "
    "no join: scoring 100 TB is one pass), aggregating per language "
    "the decimal-folded score mass and the n kept at the 0.5 "
    "threshold — the keep/drop decision a corpus filter actually "
    "makes.  Oracle: the unrolled training CTEs feed the identical "
    "scoring expression.",
    tags=("classifier", "ml", "extension"),
    extended=True,
)
def classifier_quality_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.classifier import (
        logistic_score,
        logistic_train_rounds,
    )

    feats = _features(spark, sf_dir)
    rounds = logistic_train_rounds(
        feats, ["f1", "f2"], "y", iterations=_ROUNDS, lr=_LR
    ).collect()
    final = next(r for r in rounds if r["round"] == _ROUNDS)
    weights = [final["w0"], final["w1"], final["w2"]]
    scored = feats.select(
        "lang", logistic_score(["f1", "f2"], weights).alias("score")
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("score").cast("decimal(28,9)"))
            .cast("double")
            .alias("sum_score"),
            F.sum(
                F.when(F.col("score") >= 0.5, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )

_LOO_ALPHA = 10.0


@register(
    "ml_loo_target_encoding",
    oracle=f"""
WITH per_cat AS (
  SELECT o_orderpriority,
    SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS csum,
    COUNT(*) AS cn
  FROM orders GROUP BY o_orderpriority
),
pr AS (
  SELECT CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
    AS DOUBLE) / COUNT(*) AS DECIMAL(18,12)) AS DOUBLE) AS prior
  FROM orders
),
enc AS (
  SELECT o.o_orderpriority,
    ((CAST(p.csum AS DOUBLE) - o.o_totalprice)
     + CAST({_LOO_ALPHA!r} AS DOUBLE) * pr.prior)
    / (p.cn - 1 + CAST({_LOO_ALPHA!r} AS DOUBLE)) AS e
  FROM orders o JOIN per_cat p USING (o_orderpriority), pr
)
SELECT o_orderpriority, COUNT(*) AS n_rows,
  CAST(SUM(CAST(e AS DECIMAL(38,6))) AS DOUBLE) AS enc_sum,
  ROUND(MIN(e), 4) AS enc_min, ROUND(MAX(e), 4) AS enc_max
FROM enc GROUP BY o_orderpriority
""",
    doc="Leave-one-out target encoding of order priority against "
    "order value (alpha=10 additive smoothing toward the global "
    "prior) — the leakage-safe categorical feature: each row's own "
    "target is excluded from its own encoding "
    "(operators/classifier.py:loo_target_encode).  The 5-row "
    "category table and the 1-row prior broadcast; the fact table "
    "never shuffles.  Output pins every per-row encoding through "
    "per-category decimal sums + extrema.",
    tags=("ml", "feature-engineering", "extension"),
    extended=True,
)
def ml_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.functions.numeric import dec_sum
    from diabetes_etl_spark.operators.classifier import loo_target_encode

    orders = load_table(spark, sf_dir, "orders")
    enc = loo_target_encode(
        orders, "o_orderpriority", "o_totalprice", alpha=_LOO_ALPHA
    )
    return enc.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        dec_sum(F.col("loo_enc_raw"), 6, 38).alias("enc_sum"),
        F.round(F.min("loo_enc_raw"), 4).alias("enc_min"),
        F.round(F.max("loo_enc_raw"), 4).alias("enc_max"),
    )


_CALIB_ORACLE = (
    _TRAIN_CTES
    + f""",
scored AS (
  SELECT {_Y} AS y,
    {_SIGMA.format(z="w.w0 + w.w1 * " + _F1 + " + w.w2 * " + _F2)} AS score
  FROM documents d CROSS JOIN r{_ROUNDS} w
  WHERE LENGTH(text) > 0
)
SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CAST(score AS DECIMAL(28,9))) AS DOUBLE) AS sum_score,
  CAST(SUM(y) AS BIGINT) AS n_pos
FROM scored GROUP BY bin
"""
)


@register(
    "classifier_calibration_bins",
    oracle=_CALIB_ORACLE,
    doc="Reliability-diagram data for the trained quality classifier: "
    "predicted scores bucket into deciles (floor(score*10), top "
    "clamped) with per-bin counts, decimal-folded score mass, and "
    "positive counts — mean-score-vs-empirical-rate per bin IS the "
    "calibration curve, the standard check before using classifier "
    "scores as sampling weights.  Scoring stays the scan-local "
    "quantized-sigmoid expression; binning is integer floor on the "
    "7-decimal-quantized score, so bucket boundaries cannot straddle "
    "an engine ulp.  Oracle: the unrolled training CTEs feed the "
    "identical scoring + binning.",
    tags=("classifier", "ml", "calibration", "extension"),
    extended=True,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diabetes_etl_spark.operators.classifier import (
        logistic_score,
        logistic_train_rounds,
    )

    feats = _features(spark, sf_dir)
    rounds = logistic_train_rounds(
        feats, ["f1", "f2"], "y", iterations=_ROUNDS, lr=_LR
    ).collect()
    final = next(r for r in rounds if r["round"] == _ROUNDS)
    weights = [final["w0"], final["w1"], final["w2"]]
    scored = feats.select(
        "y", logistic_score(["f1", "f2"], weights).alias("score")
    )
    return scored.select(
        F.least(F.floor(F.col("score") * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
        "y",
        "score",
    ).groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("score").cast("decimal(28,9)"))
        .cast("double")
        .alias("sum_score"),
        F.sum("y").cast("long").alias("n_pos"),
    )
