"""ALS matrix-factorization plan over the customer x part purchase
matrix (operators/als.py) — the canonical distributed-Spark recommender
workload, here with the repo's exact-decimal determinism so one full
sweep is oracle-paired end to end.

Ratings are per-(customer, part) summed lineitem quantities normalized
by the 1-50 quantity cap (exact *0.02 decimal multiply), which keeps
factors O(1) and every normal-equation moment within its decimal
headroom (docstring of operators/als.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.als import als_rank2_sweep
from diabetes_etl_spark.plans.registry import register
from diabetes_etl_spark.sources.tables import load_table

_TOP_ITEMS = 20


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(15,3)")).cast(
                    "decimal(15,3)"
                )
                * F.lit("0.02").cast("decimal(4,2)")
            )
            .cast("decimal(15,3)")
            .alias("r")
        )
    )


def _als_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS-WR sweep (hash-init -> user solve -> item solve) plus
    the training-RMSE readout and the 20 most-rated items' factors.

    Scale shape: the ratings build is one grouped join (both inputs
    shuffle once on their join/group keys); each half-step is one
    map-side-combinable grouped aggregation over ratings joined to an
    entity-sized factor table; the epilogue (RMSE fold + top-20 +
    1-row summary) adds one more ratings pass with two factor joins.
    Nothing is ever per-pair beyond the ratings themselves.
    """
    ratings = _ratings(spark, sf_dir)
    users, items = als_rank2_sweep(ratings)
    uf = users.select(
        "u",
        F.col("x1").alias("x1d"),
        F.col("x2").alias("x2d"),
    )
    itf = items.select(
        "i",
        F.col("n_r").alias("n_r_item"),
        F.col("x1").alias("w1"),
        F.col("x2").alias("w2"),
    )
    pred = (
        ratings.join(uf, "u")
        .join(itf, "i")
        .select(
            (
                F.col("r").cast("double")
                - (
                    F.col("x1d") * F.col("w1")
                    + F.col("x2d") * F.col("w2")
                )
            ).alias("e")
        )
    )
    sse = pred.agg(
        F.count("*").alias("n_ratings"),
        F.sum(F.round(F.col("e") * F.col("e"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("sse"),
    )
    counts = (
        users.agg(F.count("*").alias("n_users"))
        .crossJoin(items.agg(F.count("*").alias("n_items")))
    )
    top = (
        itf.orderBy(F.col("n_r_item").desc(), "i")
        .limit(_TOP_ITEMS)
        .select(
            F.col("i").alias("l_partkey"),
            F.col("n_r_item").alias("n_ratings_item"),
            "w1",
            "w2",
        )
    )
    return (
        top.crossJoin(F.broadcast(sse))
        .crossJoin(F.broadcast(counts))
        .select(
            "l_partkey",
            "n_ratings_item",
            "w1",
            "w2",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_items").cast("long").alias("n_items"),
            F.col("n_ratings").cast("long").alias("n_ratings"),
            F.round(
                F.sqrt(F.col("sse") / F.col("n_ratings")), 9
            ).alias("rmse_train"),
        )
        .orderBy(F.col("n_ratings_item").desc(), "l_partkey")
    )


def _hash_factor_sql(col: str, salt: str) -> str:
    return (
        f"CAST(CAST(('0x' || substr(md5(CAST({col} AS VARCHAR) || '{salt}'),"
        " 1, 8))::BIGINT % 1000 AS DECIMAL(15,3))"
        " * CAST('0.001' AS DECIMAL(4,3)) AS DECIMAL(9,6))"
    )


def _solve_sql(src: str, key: str) -> str:
    """The closed-form half-step as SQL — mirrors solve_factors."""
    return f"""
  SELECT {key}, n_r,
    ROUND(CAST(a22r*b1 - a12*b2 AS DOUBLE)
          / CAST(a11r*a22r - a12*a12 AS DOUBLE), 6) AS x1,
    ROUND(CAST(a11r*b2 - a12*b1 AS DOUBLE)
          / CAST(a11r*a22r - a12*a12 AS DOUBLE), 6) AS x2
  FROM (
    SELECT {key}, n_r, a12, b1, b2,
      CAST(a11 + CAST(n_r AS DECIMAL(10,0)) * CAST('0.1' AS DECIMAL(2,1))
           AS DECIMAL(18,12)) AS a11r,
      CAST(a22 + CAST(n_r AS DECIMAL(10,0)) * CAST('0.1' AS DECIMAL(2,1))
           AS DECIMAL(18,12)) AS a22r
    FROM (
      SELECT {key}, COUNT(*) AS n_r,
        CAST(SUM(f1*f1) AS DECIMAL(18,12)) AS a11,
        CAST(SUM(f1*f2) AS DECIMAL(18,12)) AS a12,
        CAST(SUM(f2*f2) AS DECIMAL(18,12)) AS a22,
        CAST(SUM(r*f1) AS DECIMAL(18,9)) AS b1,
        CAST(SUM(r*f2) AS DECIMAL(18,9)) AS b2
      FROM {src} GROUP BY {key}
    ) m
  ) s
"""


# The ratings CTE the plain factorization sweeps over (the recsys
# eval swaps in its train split instead).
_RATINGS_SQL = """
  SELECT o_custkey AS u, l_partkey AS i,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(15,3))) AS DECIMAL(15,3))
         * CAST('0.02' AS DECIMAL(4,2)) AS DECIMAL(15,3)) AS r
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
"""


def _sweep_sql(src: str) -> str:
    """The full one-sweep CTE chain (init -> user solve -> item solve)
    over a ratings CTE named ``src`` — defines it0/j1/ux/uf/j2/ix."""
    return f"""it0 AS (
  SELECT i,
    {_hash_factor_sql("i", ":v1")} AS f1,
    {_hash_factor_sql("i", ":v2")} AS f2
  FROM (SELECT DISTINCT i FROM {src}) d
),
j1 AS (SELECT u, {src}.r AS r, f1, f2 FROM {src} JOIN it0 USING (i)),
ux AS ({_solve_sql("j1", "u")}),
uf AS (
  SELECT u, x1 AS x1d, x2 AS x2d,
    CAST(x1 AS DECIMAL(9,6)) AS f1, CAST(x2 AS DECIMAL(9,6)) AS f2
  FROM ux
),
j2 AS (SELECT i, {src}.r AS r, f1, f2 FROM {src} JOIN uf USING (u)),
ix AS ({_solve_sql("j2", "i")})"""


_ALS_ORACLE = f"""
WITH r AS ({_RATINGS_SQL}),
{_sweep_sql("r")},
pred AS (
  SELECT CAST(r.r AS DOUBLE) - (x1d*ix.x1 + x2d*ix.x2) AS e
  FROM r JOIN uf USING (u) JOIN ix USING (i)
),
sse AS (
  SELECT COUNT(*) AS n_ratings,
    CAST(SUM(CAST(ROUND(e*e, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sse
  FROM pred
),
counts AS (
  SELECT (SELECT COUNT(*) FROM ux) AS n_users,
         (SELECT COUNT(*) FROM ix) AS n_items
),
top AS (
  SELECT i, n_r, x1, x2 FROM ix ORDER BY n_r DESC, i LIMIT {_TOP_ITEMS}
)
SELECT top.i AS l_partkey,
  CAST(top.n_r AS BIGINT) AS n_ratings_item,
  top.x1 AS w1, top.x2 AS w2,
  CAST(n_users AS BIGINT) AS n_users,
  CAST(n_items AS BIGINT) AS n_items,
  CAST(n_ratings AS BIGINT) AS n_ratings,
  ROUND(SQRT(sse / n_ratings), 9) AS rmse_train
FROM top, sse, counts
ORDER BY n_ratings_item DESC, l_partkey
"""


register(
    "ml_als_factorization",
    oracle=_ALS_ORACLE,
    doc="Rank-2 ALS-WR matrix factorization of the customer x part "
    "purchase matrix, one full sweep (hash-init item factors -> "
    "closed-form user solve -> closed-form item solve) with the "
    "training-RMSE readout and the 20 most-rated items' factors "
    "(operators/als.py).  At rank 2 the per-entity solve is a 2x2 "
    "inverse whose normal-equation moments are exact decimal folds — "
    "the whole sweep is two map-side-combinable grouped aggregations "
    "and the only inexact ops are two divisions per entity.  The "
    "oracle replays init, both solves, and the RMSE verbatim.",
    tags=("ml", "als", "recommender", "extension"),
    extended=True,
)(_als_factorization)


# -- Leave-latest-out recommender evaluation (round 13) -----------------------

_EVAL_K = 10
_N_CANDIDATES = 100


def _recsys_eval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit-rate@K / MRR@K for the ALS recommender under leave-latest-
    out holdout: each >=2-item customer's most recent (order-date)
    item pair is held out ENTIRELY, ALS trains on the rest, and the
    user's top-K is ranked over a bounded candidate set (the
    {_N_CANDIDATES} most-rated training items) minus their own
    training items.

    Scale shape: the candidate-generation + factor-ranking split is
    exactly how production recsys serving bounds the scoring matrix —
    users x |candidates| (broadcast), never users x items; the
    holdout marking is one per-user window over the user's own pairs;
    everything else is the ALS sweep's own shape.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(15,3)")).cast(
                    "decimal(15,3)"
                )
                * F.lit("0.02").cast("decimal(4,2)")
            )
            .cast("decimal(15,3)")
            .alias("r"),
            F.max("o_orderdate").alias("ts"),
        )
    )
    w_rank = Window.partitionBy("u").orderBy(
        F.col("ts").desc(), F.col("i").desc()
    )
    w_user = Window.partitionBy("u")
    marked = pairs.select(
        "u",
        "i",
        "r",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_user).alias("np"),
    )
    is_holdout = (F.col("rn") == 1) & (F.col("np") >= 2)
    holdout = marked.filter(is_holdout).select("u", F.col("i").alias("h_i"))
    train = marked.filter(~is_holdout).select("u", "i", "r")

    users, items = als_rank2_sweep(train)
    uf = users.select(
        "u", F.col("x1").alias("x1d"), F.col("x2").alias("x2d")
    )
    cand = (
        train.groupBy("i")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "i")
        .limit(_N_CANDIDATES)
        .select("i")
    )
    cf = cand.join(
        items.select("i", F.col("x1").alias("w1"), F.col("x2").alias("w2")),
        "i",
    )
    scored = (
        holdout.join(uf, "u")
        .crossJoin(F.broadcast(cf))
        .join(train.select("u", "i"), ["u", "i"], "left_anti")
        .withColumn(
            "score",
            F.round(
                F.col("x1d") * F.col("w1") + F.col("x2d") * F.col("w2"), 6
            ),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.col("score").desc(), "i")
        ),
    )
    hit_rows = ranked.filter(F.col("i") == F.col("h_i")).select("u", "rank")
    per_user = holdout.join(hit_rows, "u", "left")
    in_k = F.col("rank") <= _EVAL_K
    zero = F.lit(0).cast("decimal(20,9)")
    return per_user.agg(
        F.count("*").cast("long").alias("n_users_eval"),
        F.sum(F.when(in_k, 1).otherwise(0)).cast("long").alias("n_hits"),
        F.round(
            F.sum(F.when(in_k, 1).otherwise(0)).cast("double")
            / F.count("*"),
            9,
        ).alias("hit_rate"),
        F.round(
            F.sum(
                F.when(
                    in_k,
                    F.round(F.lit(1.0) / F.col("rank"), 9).cast(
                        "decimal(20,9)"
                    ),
                ).otherwise(zero)
            ).cast("double")
            / F.count("*"),
            9,
        ).alias("mrr"),
    )


_RECSYS_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS u, l_partkey AS i,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(15,3))) AS DECIMAL(15,3))
         * CAST('0.02' AS DECIMAL(4,2)) AS DECIMAL(15,3)) AS r,
    MAX(o_orderdate) AS ts
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
marked AS (
  SELECT u, i, r,
    ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts DESC, i DESC) AS rn,
    COUNT(*) OVER (PARTITION BY u) AS np
  FROM base
),
holdout AS (SELECT u, i AS h_i FROM marked WHERE rn = 1 AND np >= 2),
train AS (SELECT u, i, r FROM marked WHERE NOT (rn = 1 AND np >= 2)),
{{sweep}},
cand AS (
  SELECT i FROM (SELECT i, COUNT(*) AS n FROM train GROUP BY i) c
  ORDER BY n DESC, i LIMIT {_N_CANDIDATES}
),
cf AS (SELECT cand.i, ix.x1 AS w1, ix.x2 AS w2 FROM cand JOIN ix USING (i)),
scored AS (
  SELECT h.u, cf.i, h.h_i,
    ROUND(uf.x1d*cf.w1 + uf.x2d*cf.w2, 6) AS score
  FROM holdout h JOIN uf USING (u) CROSS JOIN cf
  WHERE NOT EXISTS (
    SELECT 1 FROM train t WHERE t.u = h.u AND t.i = cf.i
  )
),
ranked AS (
  SELECT u, i, h_i,
    ROW_NUMBER() OVER (PARTITION BY u ORDER BY score DESC, i) AS rank
  FROM scored
),
per AS (
  SELECT h.u, hr.rank
  FROM holdout h
  LEFT JOIN (SELECT u, rank FROM ranked WHERE i = h_i) hr USING (u)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users_eval,
  CAST(SUM(CASE WHEN rank <= {_EVAL_K} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hits,
  ROUND(CAST(SUM(CASE WHEN rank <= {_EVAL_K} THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 9) AS hit_rate,
  ROUND(CAST(SUM(CASE WHEN rank <= {_EVAL_K}
                 THEN CAST(ROUND(CAST(1.0 AS DOUBLE) / rank, 9)
                           AS DECIMAL(20,9))
                 ELSE CAST(0 AS DECIMAL(20,9)) END) AS DOUBLE)
        / COUNT(*), 9) AS mrr
FROM per
""".replace("{sweep}", _sweep_sql("train"))


register(
    "ml_recsys_eval_topk",
    oracle=_RECSYS_ORACLE,
    doc=f"Recommender evaluation under leave-latest-out holdout: each "
    ">=2-item customer's most recent item pair is held out entirely, "
    "the rank-2 ALS sweep retrains on the remainder, and hit-rate@"
    f"{_EVAL_K} / MRR@{_EVAL_K} are computed over a bounded candidate "
    f"set (top-{_N_CANDIDATES} most-rated training items, broadcast) "
    "minus the user's own training items — the candidate-generation + "
    "factor-ranking split production serving uses, so the scoring "
    "matrix is users x candidates, never users x items.  The oracle "
    "replays the holdout marking, the full ALS sweep on the train "
    "split, candidate ranking, and both metrics.",
    tags=("ml", "als", "recommender", "evaluation", "extension"),
    extended=True,
)(_recsys_eval_topk)
