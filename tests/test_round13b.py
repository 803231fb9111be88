"""Round-13 additions (second batch): the CUSUM drift monitor and
the later round-13 operator families."""

from __future__ import annotations

import pytest

from diabetes_etl_spark.plans import all_queries


@pytest.fixture(scope="module")
def reg():
    return all_queries(include_extended=True)


def test_cusum_closed_form_equals_recurrence(spark, sf_dir, reg):
    """The windowed Lindley closed form S_d = M_d - min(0, min M_j)
    must equal the textbook recurrence S_d = max(0, S_{d-1} + z_d)
    replayed sequentially from the query's own per-day columns."""
    rows = (
        reg["events_cusum_drift_monitor"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    assert len(rows) > 0
    s_hi = s_lo = 0.0
    for r in rows:
        z_hi = round(r["rate"] - r["mu0"] - 0.005, 9)
        z_lo = round(r["mu0"] - r["rate"] - 0.005, 9)
        s_hi = max(0.0, round(s_hi + z_hi, 9))
        s_lo = max(0.0, round(s_lo + z_lo, 9))
        assert r["s_hi"] == pytest.approx(s_hi, abs=2e-9)
        assert r["s_lo"] == pytest.approx(s_lo, abs=2e-9)
        assert r["alarm_hi"] == (r["s_hi"] > 0.05)
        assert r["alarm_lo"] == (r["s_lo"] > 0.05)


def test_cusum_decided_is_monotone_and_implied_by_alarms(
    spark, sf_dir, reg
):
    rows = (
        reg["events_cusum_drift_monitor"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    seen = False
    for r in rows:
        seen = seen or r["alarm_hi"] or r["alarm_lo"]
        assert r["drift_decided"] == seen


def test_cusum_partition_invariant(spark, sf_dir, reg):
    """DECIMAL-folded running sums/mins must be bit-identical under a
    different shuffle partitioning."""
    want = sorted(
        tuple(r)
        for r in reg["events_cusum_drift_monitor"].fn(spark, sf_dir).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = sorted(
            tuple(r)
            for r in reg["events_cusum_drift_monitor"]
            .fn(spark, sf_dir)
            .collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_repeated_span_merges_overlapping_positions(spark):
    """Two docs share a 12-token paragraph: positions 0..4 of the
    paragraph region are all duplicated 8-grams, which must merge to
    ONE span of exactly 12 tokens (position counting alone would say
    5 positions ~ 5*8=40 token-claims)."""
    from diabetes_etl_spark.operators.dedup import repeated_span_stats

    para = " ".join(f"p{i}" for i in range(12))
    rows = [
        (1, para + " " + " ".join(f"a{i}" for i in range(10))),
        (2, " ".join(f"b{i}" for i in range(10)) + " " + para),
        (3, " ".join(f"c{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in repeated_span_stats(df, k=8).collect()
    }
    for d in (1, 2):
        assert got[d]["n_spans"] == 1
        assert got[d]["dup_tokens"] == 12
        assert got[d]["longest_span"] == 12
        assert got[d]["n_dup_positions"] == 5
    assert got[3]["n_spans"] == 0
    assert got[3]["dup_tokens"] == 0
    assert got[3]["dup_fraction"] == 0.0


def test_repeated_span_disjoint_spans_stay_separate(spark):
    """Two shared paragraphs separated by a >k private gap must stay
    two spans, and dup_tokens must be their union, not the gap."""
    from diabetes_etl_spark.operators.dedup import repeated_span_stats

    p1 = " ".join(f"x{i}" for i in range(8))
    p2 = " ".join(f"y{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(20))
    gap2 = " ".join(f"h{i}" for i in range(20))
    rows = [
        (1, p1 + " " + gap + " " + p2),
        (2, p1 + " " + gap2 + " " + p2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_span_stats(df, k=8).collect()}
    for d in (1, 2):
        assert got[d]["n_spans"] == 2
        assert got[d]["dup_tokens"] == 16
        assert got[d]["longest_span"] == 8


def test_repeated_span_positions_agree_with_substring_stats(
    spark, sf_dir, reg
):
    """n_dup_positions must equal substring_dup_stats' n_dup_shingles
    on the fixture — same duplicated-position set, different rollup."""
    spans = {
        r["doc_id"]: r["n_dup_positions"]
        for r in reg["dedup_repeated_span_stats"].fn(spark, sf_dir).collect()
    }
    counts = {
        r["doc_id"]: r["n_dup_shingles"]
        for r in reg["dedup_substring_spans"].fn(spark, sf_dir).collect()
    }
    assert spans == counts


def test_split_no_near_dup_pair_straddles(spark, sf_dir, reg):
    """The leakage guard itself: every exact near-dup pair must land
    in one split.  Rebuilds the doc-level assignment with the same
    cluster labels and bucket arithmetic the plan aggregates."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.plans.dedupplans import (
        dedup_components,
        dedup_ngram_jaccard,
    )
    from diabetes_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    comp = dedup_components(spark, sf_dir).select("doc_id", "component")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    assign = {
        r["doc_id"]: r["bucket"]
        for r in docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
        )
        .select("doc_id", bucket.alias("bucket"))
        .collect()
    }
    pairs = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert assign[p["doc_a"]] == assign[p["doc_b"]], (
            p["doc_a"],
            p["doc_b"],
        )


def test_split_manifest_covers_corpus(spark, sf_dir, reg):
    rows = reg["corpus_leakage_guarded_split"].fn(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    from diabetes_etl_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["n_clusters"] <= r["n_docs"] for r in rows)


def test_target_encoding_excludes_own_fold(spark, sf_dir, reg):
    """Recompute every cell's encoding directly from the raw orders
    table in Python: enc(c,f) must use only out-of-fold rows plus the
    m-smoothed out-of-fold global mean."""
    import duckdb

    got = {
        (r["category"], r["fold"]): r
        for r in reg["features_target_encoding_kfold"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert len(got) == 25
    con = duckdb.connect()
    rows = con.execute(
        "SELECT o_orderpriority, "
        "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 5,"
        " CAST(o_totalprice AS DECIMAL(38,2)) FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    from collections import defaultdict
    from decimal import Decimal

    n = defaultdict(int)
    s = defaultdict(Decimal)
    for c, f, v in rows:
        n[(c, f)] += 1
        s[(c, f)] += v
    cats = {c for c, _ in n}
    folds = {f for _, f in n}
    n_g = sum(n.values())
    s_g = sum(s.values())
    for c in cats:
        for f in folds:
            n_c = sum(n[(c, g)] for g in folds)
            s_c = sum(s[(c, g)] for g in folds)
            n_f = sum(n[(d, f)] for d in cats)
            s_f = sum(s[(d, f)] for d in cats)
            mu_oof = round(float(s_g - s_f) / (n_g - n_f), 9)
            enc = (float(s_c - s[(c, f)]) + 20 * mu_oof) / (
                n_c - n[(c, f)] + 20
            )
            r = got[(c, f)]
            assert r["n_in_fold"] == n[(c, f)]
            assert r["n_oof"] == n_c - n[(c, f)]
            assert r["mu_oof"] == pytest.approx(mu_oof, abs=1e-9)
            assert r["enc_smoothed"] == pytest.approx(enc, abs=1e-6)


def _als_ratings_and_users(spark, sf_dir):
    from diabetes_etl_spark.operators.als import als_rank2_sweep
    from diabetes_etl_spark.plans.alsplans import _ratings

    ratings = _ratings(spark, sf_dir)
    users, items = als_rank2_sweep(ratings)
    return ratings, users, items


def test_als_user_solve_matches_numpy(spark, sf_dir):
    """The exact-decimal closed-form 2x2 solve must agree with
    numpy's float64 normal-equations solve on every user."""
    import hashlib

    import numpy as np

    ratings, users, _ = _als_ratings_and_users(spark, sf_dir)

    def hfac(i, salt):
        h = int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)
        return (h % 1000) / 1000.0

    by_user = {}
    for row in ratings.collect():
        v = np.array([hfac(row["i"], ":v1"), hfac(row["i"], ":v2")])
        by_user.setdefault(row["u"], []).append((float(row["r"]), v))
    got = {r["u"]: (r["x1"], r["x2"]) for r in users.collect()}
    assert set(got) == set(by_user)
    for u, rows in by_user.items():
        A = np.zeros((2, 2))
        b = np.zeros(2)
        for rv, v in rows:
            A += np.outer(v, v)
            b += rv * v
        A += 0.1 * len(rows) * np.eye(2)
        want = np.linalg.solve(A, b)
        assert abs(got[u][0] - want[0]) < 5e-6, u
        assert abs(got[u][1] - want[1]) < 5e-6, u


def test_als_solve_is_per_entity_optimum(spark, sf_dir):
    """Perturbing any user's solved factors must not decrease the
    regularized least-squares objective (ALS half-step optimality)."""
    import hashlib

    import numpy as np

    ratings, users, _ = _als_ratings_and_users(spark, sf_dir)

    def hfac(i, salt):
        h = int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)
        return (h % 1000) / 1000.0

    by_user = {}
    for row in ratings.collect():
        v = np.array([hfac(row["i"], ":v1"), hfac(row["i"], ":v2")])
        by_user.setdefault(row["u"], []).append((float(row["r"]), v))

    def obj(u, x):
        rows = by_user[u]
        sse = sum((rv - x @ v) ** 2 for rv, v in rows)
        return sse + 0.1 * len(rows) * (x @ x)

    some = sorted(by_user)[:10]
    got = {r["u"]: np.array([r["x1"], r["x2"]]) for r in users.collect()}
    for u in some:
        base = obj(u, got[u])
        for d in ([1e-3, 0], [-1e-3, 0], [0, 1e-3], [0, -1e-3]):
            assert obj(u, got[u] + np.array(d)) >= base - 1e-9, u


def test_als_factors_finite_and_partition_invariant(spark, sf_dir, reg):
    rows = reg["ml_als_factorization"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["w1"] is not None and r["w2"] is not None
        assert r["rmse_train"] is not None and r["rmse_train"] >= 0
    want = sorted(tuple(r) for r in rows)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = sorted(
            tuple(r)
            for r in reg["ml_als_factorization"].fn(spark, sf_dir).collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_recsys_eval_metrics_and_holdout_discipline(spark, sf_dir, reg):
    row = reg["ml_recsys_eval_topk"].fn(spark, sf_dir).collect()[0]
    assert row["n_users_eval"] > 0
    assert 0 <= row["n_hits"] <= row["n_users_eval"]
    assert 0.0 <= row["mrr"] <= row["hit_rate"] <= 1.0
    # MRR@10 is bounded below by hit_rate/10 (every hit contributes
    # at least 1/10) and above by hit_rate (at most 1 each).
    assert row["mrr"] >= row["hit_rate"] / 10 - 1e-9
