"""Similarity-search operator tests: exact top-k invariants and the
ANN (multi-table hyperplane LSH) recall measured against brute force.
All hashing is deterministic (xxhash64-seeded planes), so the recall
numbers are exact constants for a given fixture — the bounds below sit
under the observed values (0.94 at sf0.001 with 8 tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cosine_topk_invariants(emb):
    out = SIM.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    assert len(out) == 50  # 10 queries x k=5
    by_q = {}
    for r in out:
        assert r.query_id != r.candidate_id  # self excluded
        assert -1.000001 <= r.cosine_sim <= 1.000001
        by_q.setdefault(r.query_id, []).append((r.sim_rank, r.cosine_sim))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == [1, 2, 3, 4, 5]
        sims = [s for _, s in ranks]
        assert sims == sorted(sims, reverse=True)  # rank follows cosine


def test_cosine_threshold_pairs_canonical(emb):
    out = SIM.cosine_threshold_pairs(emb, threshold=0.45).collect()
    assert len(out) > 0
    for r in out:
        assert r.id_a < r.id_b  # canonical orientation, no dup pairs
        assert r.cosine_sim >= 0.45


def test_lsh_topk_recall_vs_brute_force(emb):
    brute = {
        (r.query_id, r.candidate_id)
        for r in SIM.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    ann_rows = SIM.lsh_topk(
        emb, F.col("vec_id") < 10, k=5, n_bits=6, dim=64, n_tables=8
    ).collect()
    ann = {(r.query_id, r.candidate_id) for r in ann_rows}
    assert len(ann) <= 50
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.8, f"ANN recall@5 degraded: {recall}"


def test_lsh_more_tables_no_worse(emb):
    """Multi-table union can only add candidates: recall(L=8) >= recall(L=2)."""
    brute = {
        (r.query_id, r.candidate_id)
        for r in SIM.cosine_topk(emb, F.col("vec_id") < 3, k=5).collect()
    }

    def recall(tables: int) -> float:
        ann = {
            (r.query_id, r.candidate_id)
            for r in SIM.lsh_topk(
                emb, F.col("vec_id") < 3, k=5, n_bits=6, dim=64,
                n_tables=tables,
            ).collect()
        }
        return len(brute & ann) / len(brute)

    assert recall(8) >= recall(2)


def test_neardup_lsh_precision_and_recall(emb):
    """LSH-bucketed near-dup: precision 1.0 by construction (pairs are
    exact-verified), recall measured against the exact all-pairs form."""
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in SIM.cosine_threshold_pairs(emb, threshold=0.45).collect()
    }
    lsh_rows = SIM.cosine_neardup_lsh(emb, threshold=0.45).collect()
    lsh = {(r.id_a, r.id_b): r.cosine_sim for r in lsh_rows}
    assert set(lsh) <= set(exact)  # no false positives, canonical pairs
    for pair, sim in lsh.items():
        assert sim == exact[pair]  # exact-verified cosine matches
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"near-dup LSH recall degraded: {recall}"


def test_ivf_topk_recall_vs_brute_force(emb):
    brute = {
        (r.query_id, r.candidate_id)
        for r in SIM.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    ivf_rows = SIM.ivf_topk(
        emb, F.col("vec_id") < 10, k=5, n_centroids=16
    ).collect()
    ivf = {(r.query_id, r.candidate_id) for r in ivf_rows}
    assert len(ivf) <= 50
    by_q = {}
    for r in ivf_rows:
        assert r.query_id != r.candidate_id
        by_q.setdefault(r.query_id, []).append(r.sim_rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, f"IVF recall@5 degraded: {recall}"


def test_ivf_more_probes_no_worse(emb):
    """Probing more cells can only widen the candidate set."""
    brute = {
        (r.query_id, r.candidate_id)
        for r in SIM.cosine_topk(emb, F.col("vec_id") < 3, k=5).collect()
    }

    def recall(probes: int) -> float:
        got = {
            (r.query_id, r.candidate_id)
            for r in SIM.ivf_topk(
                emb, F.col("vec_id") < 3, k=5, n_centroids=16, n_probe=probes
            ).collect()
        }
        return len(brute & got) / len(brute)

    assert recall(8) >= recall(1)


def test_lsh_vectorized_recall_vs_brute_force(emb):
    brute = {
        (r.query_id, r.candidate_id)
        for r in SIM.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    }
    ann = {
        (r.query_id, r.candidate_id)
        for r in SIM.lsh_topk_vectorized(
            emb, F.col("vec_id") < 10, k=5
        ).collect()
    }
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.8, f"vectorized ANN recall@5 degraded: {recall}"


def test_int8_quantization_codes_bounded_and_exact(spark):
    """Codes stay in [-127, 127]; the max-|x| element maps to ±127."""
    from diabetes_etl_spark.operators.similarity import with_int8

    df = spark.createDataFrame(
        [(1, [0.5, -2.0, 1.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = with_int8(df).collect()
    assert len(rows) == 1  # zero vector dropped
    q = rows[0]._qvec
    assert q == [32, -127, 64]  # floor(0.5*127/2+0.5)=32, etc.


def test_quantized_topk_recall_floor(spark, sf_dir):
    """int8 ranking must keep >= 0.9 recall@5 vs the exact ranking
    (measured 0.98 at both sf0.001 and sf0.01 — the floor leaves noise
    headroom without letting a quantization regression pass)."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators import similarity as SIM
    from diabetes_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = SIM.cosine_topk(emb, F.col("vec_id") < 10, k=5).collect()
    quant = SIM.quantized_topk(emb, F.col("vec_id") < 10, k=5).collect()
    ex = {(r.query_id, r.candidate_id) for r in exact}
    qu = {(r.query_id, r.candidate_id) for r in quant}
    assert len(ex & qu) / len(ex) >= 0.9


# -- random projection (Johnson-Lindenstrauss) ------------------------------


def test_random_project_preserves_pairwise_distances(spark):
    """JL contract: with out_dim=32, pairwise distances of a 64-dim
    cloud survive to within a (0.6, 1.6) ratio band — enough to
    catch a broken plane derivation or a mis-scaled fold, while slack
    enough to never flake (the data and planes are deterministic, so
    this is a fixed computation, not a probabilistic assertion)."""
    import itertools

    import numpy as np

    from diabetes_etl_spark.operators.similarity import random_project

    rng = np.random.default_rng(3)
    vecs = {i: rng.standard_normal(64) for i in range(12)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    proj = {
        r.vec_id: np.array(r.projected)
        for r in random_project(df, 32).collect()
    }
    assert all(len(p) == 32 for p in proj.values())
    for a, b in itertools.combinations(vecs, 2):
        true_d = float(np.linalg.norm(vecs[a] - vecs[b]))
        proj_d = float(np.linalg.norm(proj[a] - proj[b]))
        assert 0.6 < proj_d / true_d < 1.6, (a, b, proj_d / true_d)


def test_random_project_deterministic_and_partition_invariant(spark):
    from diabetes_etl_spark.operators.similarity import random_project

    df = spark.createDataFrame(
        [(i, [float((i * j) % 7) for j in range(64)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(
        (r.vec_id, tuple(r.projected)) for r in random_project(df, 8).collect()
    )
    b = sorted(
        (r.vec_id, tuple(r.projected))
        for r in random_project(df.repartition(9), 8).collect()
    )
    assert a == b


def test_lsh_cross_pairs_exact_at_covering_params(spark, sf_dir):
    """Cross-corpus pairs at the gate configuration equal the exact
    cross-join threshold pairs (recall 1.0 on the fixture, precision
    1.0 by construction)."""
    from diabetes_etl_spark.operators.similarity import (
        lsh_cross_pairs,
        with_norm,
        dot_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    got = sorted(
        (r.id_a, r.id_b, r.cosine_sim)
        for r in lsh_cross_pairs(
            a, b, threshold=0.45, n_bits=3, n_tables=32, side_cap=100000
        ).collect()
    )
    na = with_norm(a).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("_norm").alias("nna"),
    )
    nb = with_norm(b).select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("_norm").alias("nnb"),
    )
    want = sorted(
        (r.id_a, r.id_b, r.cosine_sim)
        for r in na.crossJoin(nb)
        .withColumn(
            "cosine_sim",
            F.round(dot_exact("va", "vb") / (F.col("nna") * F.col("nnb")), 9),
        )
        .filter(F.col("cosine_sim") >= 0.45)
        .select("id_a", "id_b", "cosine_sim")
        .collect()
    )
    assert got == want and len(got) > 0


def test_lsh_cross_pairs_side_cap_bounds_hot_buckets(spark):
    """A near-identical corpus on both sides: candidates bound at
    ~cap^2 per bucket instead of |A| x |B|, and head matches still
    surface the duplication."""
    from diabetes_etl_spark.operators.similarity import lsh_cross_pairs

    base = [0.5] * 8
    mk = lambda i: [x + 0.0001 * (i % 3) for x in base]  # noqa: E731
    a = spark.createDataFrame(
        [(i, mk(i)) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(100 + i, mk(i)) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    capped = lsh_cross_pairs(
        a, b, threshold=0.9, n_bits=2, n_tables=2, dim=8, side_cap=5
    )
    n = capped.count()
    assert 0 < n <= 2 * 5 * 5  # <= tables * cap^2 (upper bound)
    uncapped = lsh_cross_pairs(
        a, b, threshold=0.9, n_bits=2, n_tables=2, dim=8, side_cap=10000
    ).count()
    assert uncapped > n  # the cap really bounded the hot bucket


# -- hard-negative mining ----------------------------------------------------


def test_hard_negatives_band_and_order(spark):
    """Candidates: an exact near-dup (cos ~1, above the band), an
    in-band hard negative, a weaker in-band negative, and an easy
    negative below the band — only the two in-band rows survive,
    hardest first."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),    # ~1.0: above band -> excluded
        (2, [0.45, 1.0]),     # in band, harder
        (3, [0.25, 1.0]),     # in band, easier
        (4, [0.0, 1.0]),      # 0.0: below band -> excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hard_negative_topk(
        df, F.col("vec_id") == 0, k=5, lo=0.15, hi=0.5
    ).collect()
    assert [(r.candidate_id, r.neg_rank) for r in out] == [(2, 1), (3, 2)]
    for r in out:
        assert 0.15 <= r.cosine_sim < 0.5


def test_hard_negatives_k_and_tiebreak(spark):
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators.similarity import hard_negative_topk

    # three identical in-band candidates: ties break on smaller id
    rows = [(0, [1.0, 0.0])] + [
        (i, [0.3, 1.0]) for i in (5, 3, 9)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hard_negative_topk(
        df, F.col("vec_id") == 0, k=2, lo=0.1, hi=0.9
    ).collect()
    assert [r.candidate_id for r in out] == [3, 5]


# -- per-dimension standardization -------------------------------------------


def test_standardize_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators.similarity import standardize_embeddings

    rows = [(i, [float(i), float(i * i % 7), 5.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.z for r in standardize_embeddings(df).collect()}
    m = np.array([r[1] for r in rows], dtype=np.float64)
    mu = m.mean(axis=0)
    sd = m.std(axis=0, ddof=1)
    for i, vec in rows:
        for d in range(3):
            if sd[d] == 0:
                assert out[i][d] == 0.0  # constant dim -> 0, no ANSI error
            else:
                assert abs(out[i][d] - (vec[d] - mu[d]) / sd[d]) < 1e-9


def test_standardize_partition_invariant_bit_identical(spark):
    from diabetes_etl_spark.operators.similarity import standardize_embeddings

    rows = [
        (i, [float((i * 7) % 13), float((i * 5) % 11), float(i % 3)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r.vec_id, tuple(r.z)) for r in
               standardize_embeddings(df).collect())
    b = sorted((r.vec_id, tuple(r.z)) for r in
               standardize_embeddings(df.repartition(11)).collect())
    assert a == b


def test_standardize_plan_broadcasts_stats(spark):
    from diabetes_etl_spark.operators.similarity import standardize_embeddings

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        standardize_embeddings(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_intrinsic_dim_recovers_planted_dimension(spark):
    """TwoNN on points from a known d-dimensional manifold embedded in
    higher dimension recovers ~d (deterministic lattice-ish sample)."""
    import math
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators.similarity import dot_exact

    rng = random.Random(11)
    d_true, d_amb, n = 2, 8, 300
    rows = []
    for i in range(n):
        free = [rng.uniform(0, 1) for _ in range(d_true)]
        vec = free + [0.0] * (d_amb - d_true)
        rows.append((i, [float(round(v, 6)) for v in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sq = emb.withColumn("s", dot_exact("embedding", "embedding"))
    a = sq.select(F.col("vec_id").alias("ia"),
                  F.col("embedding").alias("ea"), F.col("s").alias("sa"))
    b = sq.select(F.col("vec_id").alias("ib"),
                  F.col("embedding").alias("eb"), F.col("s").alias("sb"))
    pairs = a.join(b, F.col("ia") != F.col("ib")).select(
        "ia", "ib",
        (F.col("sa") + F.col("sb") - 2 * F.expr(
            "CAST(aggregate(zip_with(ea, eb, (x, y) -> "
            "CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) "
            "AS DECIMAL(20,15))), CAST(0 AS DECIMAL(38,15)), "
            "(acc, v) -> CAST(acc + CAST(v AS DECIMAL(38,15)) "
            "AS DECIMAL(38,15))) AS DOUBLE)")).alias("d2"),
    )
    w = Window.partitionBy("ia").orderBy(F.asc("d2"), F.asc("ib"))
    nn = pairs.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= 2
    )
    per = nn.groupBy("ia").agg(
        F.max(F.when(F.col("rk") == 1, F.col("d2"))).alias("d1"),
        F.max(F.when(F.col("rk") == 2, F.col("d2"))).alias("d2v"),
    ).where(F.col("d1") > 0).collect()
    slm = sum(0.5 * math.log(r["d2v"] / r["d1"]) for r in per)
    est = len(per) / slm
    assert 1.3 < est < 3.2, est  # ~2 with TwoNN finite-sample noise


# -- ANN all-points k-NN (feeds TwoNN) ---------------------------------------


def _exact_top2(spark, emb):
    from pyspark.sql import Window

    from diabetes_etl_spark.operators.similarity import dot_exact

    sq = emb.withColumn("s", dot_exact("embedding", "embedding"))
    a = sq.select(F.col("vec_id").alias("ia"),
                  F.col("embedding").alias("ea"), F.col("s").alias("sa"))
    b = sq.select(F.col("vec_id").alias("ib"),
                  F.col("embedding").alias("eb"), F.col("s").alias("sb"))
    pairs = a.join(b, F.col("ia") != F.col("ib")).select(
        "ia", "ib",
        (F.col("sa") + F.col("sb")
         - 2 * SIM.dot_exact("ea", "eb")).alias("d2"),
    )
    w = Window.partitionBy("ia").orderBy(F.asc("d2"), F.asc("ib"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("ia", "d2", "rk")
    )


def test_knn_d2_lsh_covers_exact_top2_at_gate_params(spark, emb):
    """At the registered query's params (16 tables x 6 bits, 1-bit
    multiprobe) the ANN candidates must contain EVERY point's true
    top-2 on the fixture — recall 1.0, which is what lets
    embeddings_intrinsic_dim_ann share the exact all-pairs oracle."""
    exact = {
        (r["ia"], r["rk"]): r["d2"]
        for r in _exact_top2(spark, emb).collect()
    }
    approx = {
        (r["ia"], r["rk"]): r["d2"]
        for r in SIM.knn_d2_lsh(
            emb, k=2, n_bits=6, n_tables=16, bucket_cap=128
        ).collect()
    }
    assert approx == exact


def test_knn_d2_lsh_recall_floor_at_lean_params(spark, emb):
    """A quarter of the gate's tables trades recall for cost; the
    floor keeps the knob honest (non-vacuous: measured 0.967 at 4
    tables vs 1.0 at the covering 16 — and only 0.42 with multiprobe
    OFF even at 10 tables, which is why multiprobe is the default)."""
    exact = {}
    for r in _exact_top2(spark, emb).collect():
        exact.setdefault(r["ia"], set()).add(round(r["d2"], 9))
    approx = {}
    for r in SIM.knn_d2_lsh(
        emb, k=2, n_bits=6, n_tables=4, multiprobe=True, bucket_cap=128
    ).collect():
        approx.setdefault(r["ia"], set()).add(round(r["d2"], 9))
    hits = sum(
        len(approx.get(ia, set()) & d2s) for ia, d2s in exact.items()
    )
    total = sum(len(d2s) for d2s in exact.values())
    assert hits / total >= 0.9, hits / total


def test_intrinsic_dim_ann_matches_exact_estimator(spark, sf_dir):
    """The registered ANN-fed TwoNN query reproduces the all-pairs
    baseline bit-for-bit on the fixture (shared estimator tail +
    covering candidates)."""
    from diabetes_etl_spark.plans import all_queries

    reg = all_queries(include_extended=True)
    exact = [
        tuple(r)
        for r in reg["embeddings_intrinsic_dim"].fn(spark, sf_dir).collect()
    ]
    ann = [
        tuple(r)
        for r in reg["embeddings_intrinsic_dim_ann"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert ann == exact


def test_semantic_quarantine_prod_recall_floor(spark, sf_dir):
    """The 16x5/side_cap-64 production profile must flag >= 90% of the
    covering form's quarantined train ids (quarantine recall — a miss
    is benchmark leakage), with precision 1.0 by construction (both
    profiles share the exact decimal-dot verification, so any flagged
    pair truly clears the threshold)."""
    from diabetes_etl_spark.plans import all_queries

    reg = all_queries(include_extended=True)
    base = {
        r["train_id"]
        for r in reg["decontam_semantic_quarantine"].fn(
            spark, sf_dir
        ).collect()
    }
    prod = {
        r["train_id"]
        for r in reg["decontam_semantic_quarantine_prod"].fn(
            spark, sf_dir
        ).collect()
    }
    assert base, "covering quarantine unexpectedly empty"
    assert prod <= base  # precision 1.0: no spurious flags possible
    recall = len(prod & base) / len(base)
    assert recall >= 0.9, (recall, len(base), len(prod))
