"""In-plan training of a linear quality classifier — the
"fastText-style quality filter" stage of a training-data pipeline
(score documents, keep the top fraction), expressed as fixed-round
batch gradient descent over DataFrame aggregates.

Why this shape: at 100 TB the feature matrix never materializes and
nothing row-shaped reaches the driver — each GD round is ONE
map-side-combined aggregate pass producing the (dim+1)-element
gradient, and the weight vector (a handful of scalars, like k-means'
centroids) is the only driver state.  Rounds are FIXED (no
convergence test — a data-dependent stopping rule would make the
plan nondeterministic), matching the k-means/pagerank precedent.

Determinism contract (the cross-engine hash discipline):

- features are quantized to 4 decimals at the source, labels are
  0/1 integers;
- the margin z = w·x evaluates in doubles with a FIXED left-to-right
  term order (both engines replay the identical IEEE sequence);
- sigma(z) = 1/(1+exp(-z)) is the one libm call: z is quantized to
  9 decimals before exp and the sigmoid is quantized to 9 decimals
  after it (the BM25 ln precedent — operators/ranking.py);
- per-row gradient terms (sigma - y)·x_j have <= 11 decimals, so the
  DECIMAL(38,15) fold cast is EXACT (no representable ties), and the
  per-group sum is order-independent;
- the weight update w - lr·g/n pins through DECIMAL(28,12) (the
  pagerank mass precedent), so every round's weights are
  hash-identical cross-engine.

The SQL oracle unrolls the same rounds as CTE layers — every
intermediate weight vector is pinned, not just the fixed point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sigmoid_q(z: Column) -> Column:
    """Quantized logistic: round(1/(1+exp(-round(z, 9))), 7) — the
    OUTPUT quantum is 1e-7 (coarser than ln's 1e-9 in ranking.py)
    because sigma feeds exact decimal sums over ~10^4 rows: a last-ulp
    exp difference flips a 1e-7 boundary with probability ~1e-9 per
    row, keeping the whole-corpus hash-mismatch risk ~1e-5."""
    return F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, 9))), 7
    )


def logistic_train_rounds(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 0.5,
    state_store=None,
) -> DataFrame:
    """Train logistic regression by ``iterations`` full-batch GD
    rounds and return every round's weight vector as rows
    (round, w0, w1, ..., wk) — w0 is the bias; round 0 is the zero
    initialization.

    ``feats`` must already carry the quantized feature columns and
    the 0/1 integer label (see module contract).  Each round runs one
    aggregate job over ``feats``; the collected gradient is dim+1
    scalars (bounded driver state, the k-means pattern).  Weights are
    plain Python floats between rounds — they re-enter the next
    round's plan as literals, so no weight broadcast or join exists
    anywhere.

    ``state_store`` (a VersionedTable) makes long trainings
    driver-restart-safe, the iterative-operator discipline the graph
    ops follow: every completed round commits the full
    (round, weights) history atomically, and a restarted run resumes
    from the last committed round instead of re-paying earlier
    corpus passes.  The caller owns config identity (same feats /
    lr / feature set) across the restart, as with every resumable
    loop here.
    """
    spark = feats.sparkSession
    dim = len(feature_cols)
    weights = [0.0] * (dim + 1)
    out_rows = [(0, *weights)]
    start_round = 1
    if state_store is not None and state_store.history():
        prior = sorted(
            state_store.read().collect(), key=lambda r: r["round"]
        )
        if prior and len(prior[0]) == dim + 2:
            out_rows = [tuple(r) for r in prior]
            weights = [out_rows[-1][j + 1] for j in range(dim + 1)]
            start_round = out_rows[-1][0] + 1
    n = None
    schema = "round int, " + ", ".join(
        f"w{j} double" for j in range(dim + 1)
    )
    for rnd in range(start_round, iterations + 1):
        z = F.lit(weights[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(weights[j + 1]) * F.col(c)
        err = sigmoid_q(z) - F.col(label_col).cast("double")
        aggs = [F.count("*").alias("n"),
                F.sum(err.cast("decimal(38,15)")).alias("g0")]
        for j, c in enumerate(feature_cols):
            aggs.append(
                F.sum((err * F.col(c)).cast("decimal(38,15)")).alias(f"g{j + 1}")
            )
        row = feats.agg(*aggs).first()
        n = row["n"]
        new_w = []
        for j in range(dim + 1):
            g = float(row[f"g{j}"])
            # pin the inexact lr*g/n through DECIMAL(28,12), the
            # pagerank precedent; computed driver-side on the same
            # doubles both engines folded to
            upd = weights[j] - lr * g / n
            new_w.append(_dec12(upd))
        weights = new_w
        out_rows.append((rnd, *weights))
        if state_store is not None:
            state_store.overwrite(
                spark.createDataFrame(out_rows, schema),
                app_txn=("gd_round", rnd),
            )
    return spark.createDataFrame(out_rows, schema)


def _dec12(v: float) -> float:
    """CAST(v AS DECIMAL(28,12)) -> DOUBLE, reproduced exactly:
    Spark's decimal cast rounds HALF_UP at 12 decimals."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(v)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
    )


def logistic_score(
    feature_cols: list[str],
    weights: list[float],
) -> Column:
    """The trained model applied in-plan: quantized sigmoid of the
    fixed-order margin — a pure scan-local expression (codegen, no
    UDF, no join), which is what makes scoring 100 TB one pass."""
    z = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j + 1]) * F.col(c)
    return sigmoid_q(z)


def loo_target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    alpha: float = 10.0,
    broadcast_categories: bool = True,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward
    the global prior — the leakage-safe categorical feature
    (each row's own target is EXCLUDED from its encoding, so the
    feature never memorizes the label it will be asked to predict):

        enc = (sum_cat - own + alpha * prior) / (n_cat - 1 + alpha)

    Adds ``loo_enc`` (9-decimal rounded) and ``loo_enc_raw`` (the
    bit-exact IEEE value — aggregate THIS one: rounding a 15-sig-digit
    money-scale double to 9 decimals is engine-unstable in the last
    ulp, which bit the oracle pairing; raw doubles are identical).

    Determinism: per-category and global sums fold through
    DECIMAL(38,6) (exact), the prior pins at DECIMAL(18,12), and the
    per-row encoding is IEEE arithmetic on those pinned values with
    identical operation order cross-engine.

    Scale shape: ONE pass builds the per-category (sum, n) table
    (map-side combined, category-cardinality rows) which BROADCASTS
    back — the fact table never shuffles; the global prior is the
    scalar-attach 1-row aggregate.  For HIGH-cardinality categories
    (user ids, URLs) pass ``broadcast_categories=False``: the stats
    table is then joined hash-partitioned (one fact shuffle) instead
    of forced into executor memory."""
    cat, tgt = F.col(category_col), F.col(target_col)
    per_cat = df.groupBy(category_col).agg(
        F.sum(tgt.cast("decimal(38,6)")).alias("_csum"),
        F.count("*").alias("_cn"),
    )
    prior = df.agg(
        F.expr(
            f"CAST(CAST(CAST(sum(CAST({target_col} AS DECIMAL(38,6))) "
            f"AS DOUBLE) / count(*) AS DECIMAL(18,12)) AS DOUBLE)"
        ).alias("_prior")
    )
    enc = (
        (F.col("_csum").cast("double") - tgt)
        + F.lit(float(alpha)) * F.col("_prior")
    ) / (F.col("_cn") - 1 + F.lit(float(alpha)))
    cat_side = F.broadcast(per_cat) if broadcast_categories else per_cat
    return (
        df.join(cat_side, category_col)
        .crossJoin(F.broadcast(prior))
        .withColumn("loo_enc_raw", enc)
        .withColumn("loo_enc", F.round(enc, 9))
        .drop("_csum", "_cn", "_prior")
    )


def rank_metrics(
    scored: DataFrame, score_col: str = "score", label_col: str = "y"
) -> DataFrame:
    """Exact AUC / Gini / KS from a (score, 0-1 label) relation via
    the Mann-Whitney rank-sum identity with midrank tie correction.

    All arithmetic is integer until one final division: scores group
    by distinct value (a quantized score — e.g. the 7-decimal sigmoid
    — bounds that table independent of corpus size, which is why this
    never needs a per-row global sort); a group of n rows with p
    positives after cb predecessors contributes p*(2*cb + n + 1) to
    TWICE the positive midrank sum, giving
    AUC = (rs2 - np*(np+1)) / (2*np*nn) as a ratio of exact BIGINTs.
    KS = max |TPR - FPR| evaluated cross-multiplied as
    max |tp*nn - fp*np| / (np*nn) — no per-row float ratios.  The
    single-partition windows run on the bounded score-group table.
    """
    g = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(label_col).alias("p"),
    )
    w_before = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_desc = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "n",
        "p",
        F.coalesce(F.sum("n").over(w_before), F.lit(0)).alias("cb"),
        F.sum("p").over(w_desc).alias("tp"),
        F.sum(F.col("n") - F.col("p")).over(w_desc).alias("fp"),
        F.sum("p").over(w_all).alias("np_tot"),
        F.sum(F.col("n") - F.col("p")).over(w_all).alias("nn_tot"),
    )
    a = c.agg(
        F.sum(F.col("p") * (2 * F.col("cb") + F.col("n") + 1)).alias(
            "rs2"
        ),
        F.max("np_tot").alias("np"),
        F.max("nn_tot").alias("nn"),
        F.max(
            F.abs(
                F.col("tp") * F.col("nn_tot")
                - F.col("fp") * F.col("np_tot")
            )
        ).alias("dmax"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    num = (F.col("rs2") - np_ * (np_ + 1)).cast("double")
    # single-class input (no positives or no negatives): ranking
    # quality is undefined — emit an intentional NULL (the repo's
    # degenerate-input convention, e.g. the runs test's guarded z),
    # not a silent NaN from the 0 denominator
    both = (np_ > 0) & (nn_ > 0)
    return a.select(
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        F.when(both, num / (2 * np_ * nn_)).alias("auc"),
        F.when(both, num / (np_ * nn_) - F.lit(1.0)).alias("gini"),
        F.when(both, F.col("dmax").cast("double") / (np_ * nn_)).alias(
            "ks"
        ),
    )


def isotonic_fit(
    bins: DataFrame,
    key: str = "bin",
    n_col: str = "n",
    pos_col: str = "p",
) -> DataFrame:
    """Weighted isotonic regression (PAV) of the per-bin positive
    rate, via the minimax identity
        iso(k) = max_{i<=k} min_{j>=k} rate(i..j)
    which equals the pool-adjacent-violators fit exactly.

    Runs entirely on the BINNED table: cumulative sums give every
    interval's exact integer (n, pos) in one self-join, so the whole
    fit costs O(B^3) on B bins — B is a calibration knob (10..256),
    never data-sized, which is what makes isotonic calibration at
    100 TB a post-aggregation epilogue: the one corpus-scale stage is
    the binning aggregate upstream.  Interval rates are single exact
    divisions of BIGINTs; min/max over them are order comparisons of
    identical doubles in both engines.
    """
    w = Window.orderBy(key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = bins.select(
        F.col(key).alias("b"),
        F.sum(n_col).over(w).alias("cn"),
        F.sum(pos_col).over(w).alias("cp"),
    )
    zero = c.sparkSession.createDataFrame(
        [(-(2 ** 31), 0, 0)], "b long, cn long, cp long"
    )
    lower = zero.unionByName(
        c.select(
            F.col("b").cast("long"),
            F.col("cn").cast("long"),
            F.col("cp").cast("long"),
        )
    )
    iv = lower.alias("L").join(
        c.alias("R"), F.col("L.b") < F.col("R.b")
    ).select(
        F.col("L.b").alias("lo_excl"),
        F.col("R.b").alias("hi"),
        (F.col("R.cn") - F.col("L.cn")).alias("ivn"),
        (F.col("R.cp") - F.col("L.cp")).alias("ivp"),
        (
            (F.col("R.cp") - F.col("L.cp")).cast("double")
            / (F.col("R.cn") - F.col("L.cn"))
        ).alias("rate"),
    )
    keys = bins.select(F.col(key).alias("k"))
    inner = (
        keys.join(
            iv,
            (F.col("lo_excl") < F.col("k"))
            & (F.col("hi") >= F.col("k")),
        )
        .groupBy("k", "lo_excl")
        .agg(F.min("rate").alias("minrate"))
    )
    return inner.groupBy("k").agg(
        F.round(F.max("minrate"), 9).alias("iso_rate")
    )
