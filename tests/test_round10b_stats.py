"""Round-10b unit tests: independent ground-truth cross-checks for the
new A/B statistics (the oracle gate proves Spark == DuckDB; these prove
the shared formula == a from-scratch numpy implementation) and direct
edge-semantics tests for the DBSCAN operator the Jaccard fixture cannot
exercise (borders, isolated cores, noise)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def _variant(user_id: int) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % 2


def _load_purchase_split(duck):
    df = duck.execute(
        "SELECT user_id, value FROM events WHERE event_type = 'purchase'"
    ).fetchdf()
    v = df["user_id"].map(_variant)
    a = df.loc[v == 0, "value"].to_numpy(float)
    b = df.loc[v == 1, "value"].to_numpy(float)
    return a, b


def _rankdata_average(x: np.ndarray) -> np.ndarray:
    """Average ranks with tie-midpoints, scipy-free."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_mann_whitney_matches_numpy_reference(spark, duck, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    a, b = _load_purchase_split(duck)
    pooled = np.concatenate([a, b])
    ranks = _rankdata_average(pooled)
    r_a = ranks[: len(a)].sum()
    n_a, n_b = len(a), len(b)
    u_a = r_a - n_a * (n_a + 1) / 2
    _, counts = np.unique(pooled, return_counts=True)
    tie = float((counts**3 - counts).sum())
    n = n_a + n_b
    var_u = n_a * n_b / (12 * n * (n - 1)) * (n**3 - n - tie)
    z_ref = (u_a - n_a * n_b / 2) / np.sqrt(var_u)

    spec = all_queries(include_extended=True)["events_ab_mann_whitney"]
    row = spec.fn(spark, sf_dir).collect()[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["u2_a"] == pytest.approx(2 * u_a)
    assert row["tie_term"] == tie
    assert row["z_mw"] == pytest.approx(z_ref, abs=1e-8)


def test_hodges_lehmann_matches_numpy_reference(spark, duck, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    a, b = _load_purchase_split(duck)
    diffs = np.sort((b[None, :] - a[:, None]).ravel())
    n = len(diffs)
    lo = diffs[(n + 1) // 2 - 1]
    hi = diffs[n // 2]
    hl_ref = (lo + hi) / 2

    spec = all_queries(include_extended=True)["events_ab_hodges_lehmann"]
    row = spec.fn(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n
    assert row["hl_shift"] == pytest.approx(hl_ref, abs=1e-8)


def test_hodges_lehmann_continuous_support_cap(spark):
    """A genuinely CONTINUOUS value column (every value distinct) must
    not blow the support x support grid: past the cap the samples
    floor-quantize onto a shared cap-sized grid, the pair count stays
    exact (quantization moves values, never drops them), and the HL
    estimate stays within the documented 2*(max-min)/cap bound of the
    exact all-pairs answer."""
    from diabetes_etl_spark.plans.events import hl_shift_from_tagged

    rng = np.random.default_rng(7)
    a = rng.normal(50.0, 9.0, 400)
    b = rng.normal(53.5, 11.0, 350)
    rows = [(0, float(v)) for v in a] + [(1, float(v)) for v in b]
    tagged = spark.createDataFrame(rows, "variant int, v double")

    cap = 64
    row = hl_shift_from_tagged(tagged, cap=cap).collect()[0]
    diffs = np.sort((b[None, :] - a[:, None]).ravel())
    n = len(diffs)
    hl_exact = (diffs[(n + 1) // 2 - 1] + diffs[n // 2]) / 2
    vals = np.concatenate([a, b])
    bound = 2 * (vals.max() - vals.min()) / cap
    assert row["n_pairs"] == n
    assert abs(row["hl_shift"] - hl_exact) <= bound
    # under-cap input is untouched: exact path, exact answer
    row2 = hl_shift_from_tagged(tagged, cap=2000).collect()[0]
    assert row2["hl_shift"] == pytest.approx(hl_exact, abs=1e-8)


def test_welch_matches_numpy_reference(spark, duck, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    a, b = _load_purchase_split(duck)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_ref = (b.mean() - a.mean()) / np.sqrt(se2)
    df_ref = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )

    spec = all_queries(include_extended=True)["events_ab_welch_ttest"]
    row = spec.fn(spark, sf_dir).collect()[0]
    assert row["mean_a"] == pytest.approx(a.mean(), abs=1e-8)
    assert row["var_b"] == pytest.approx(vb, abs=1e-6)
    assert row["t_welch"] == pytest.approx(t_ref, abs=1e-8)
    assert row["df_welch"] == pytest.approx(df_ref, abs=1e-4)


def test_readability_hand_computed(spark, duck, sf_dir):
    """One doc checked end-to-end by hand-counted words/syllables."""
    from diabetes_etl_spark.plans import all_queries

    spec = all_queries(include_extended=True)["text_readability_fk"]
    rows = {r["doc_id"]: r for r in spec.fn(spark, sf_dir).collect()}
    import re

    docs = duck.execute("SELECT doc_id, text FROM documents").fetchdf()
    for _, d in docs.head(5).iterrows():
        text = d["text"]
        w = len(re.findall(r"[a-z0-9]+", text.lower()))
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        r = rows[d["doc_id"]]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, y)
        assert r["flesch_ease"] == pytest.approx(
            206.835 - 1.015 * w / s - 84.6 * y / w, abs=1e-5
        )


# -- dbscan_labels edge semantics ----------------------------------------------


def _dbscan(spark, edges, min_pts=3):
    from diabetes_etl_spark.operators.clustering import dbscan_labels

    pairs = spark.createDataFrame(edges, "a long, b long")
    out = dbscan_labels(pairs, "a", "b", min_pts=min_pts).collect()
    return {r["id"]: (r["role"], r["component"]) for r in out}


def test_dbscan_border_attaches_to_min_core_component(spark):
    # path 1-2-3-4-5: cores 2,3,4 (deg 2); borders 1 and 5
    got = _dbscan(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got[2] == ("core", 2) and got[3] == ("core", 2)
    assert got[4] == ("core", 2)
    assert got[1] == ("border", 2) and got[5] == ("border", 2)


def test_dbscan_pure_pair_is_noise(spark):
    # a 2-chain has no core at min_pts=3: both endpoints absent (noise)
    got = _dbscan(spark, [(10, 11)])
    assert got == {}


def test_dbscan_isolated_core_heads_singleton_cluster(spark):
    # star 20-(21,22): 20 is core, no core-core edges -> own cluster
    got = _dbscan(spark, [(20, 21), (20, 22)])
    assert got[20] == ("core", 20)
    assert got[21] == ("border", 20) and got[22] == ("border", 20)


def test_dbscan_border_between_two_clusters_takes_min(spark):
    # min_pts=4: two K4 cliques {1,2,3,4} and {7,8,9,10}; point 5
    # touches cores 3 and 7 but has only 2 neighbours -> border, and
    # must take the MIN of the two reachable components
    k4a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    k4b = [(7, 8), (7, 9), (7, 10), (8, 9), (8, 10), (9, 10)]
    got = _dbscan(spark, k4a + k4b + [(3, 5), (5, 7)], min_pts=4)
    assert got[3] == ("core", 1) and got[7] == ("core", 7)
    assert got[5] == ("border", 1)  # min of components {1, 7}


def test_dbscan_duplicate_and_self_edges_are_hardened(spark):
    # a 2-chain fed with duplicate edges (both orientations) plus a
    # self-pair: without canonicalize+distinct+self-filter at the
    # materialization boundary, node 10's n_eps would inflate to
    # min_pts and flip noise -> core.  Must stay identical to the
    # clean [(10, 11)] relation: all noise.
    got = _dbscan(spark, [(10, 11), (11, 10), (10, 11), (10, 10)])
    assert got == {}


# -- plan shapes for the round-10b gate queries --------------------------------


def _plan(spark, sf_dir, name):
    from diabetes_etl_spark.plans import all_queries

    df = all_queries(include_extended=True)[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_mg_heavy_ngrams_plan_one_mg_stage_broadcast_semi(spark, sf_dir):
    """Exactly one MapInPandas (the bounded MG candidate pass); the
    exact recount joins candidates as a BROADCAST left-semi — never a
    shuffled join of the exploded trigram stream; no cartesian."""
    plan = _plan(spark, sf_dir, "text_mg_heavy_ngrams")
    assert plan.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_dbscan_docs_plan_materialized_pairs_no_python(spark, sf_dir):
    """The pair relation materializes once to scratch parquet, so the
    role/cluster algebra must NOT re-expand the LSH+exact candidate
    subplan: bounded exchange count, no cartesian, no Python stage
    (MG's mapInPandas belongs to the text query, not this one)."""
    plan = _plan(spark, sf_dir, "cluster_dbscan_docs")
    assert "CartesianProduct" not in plan
    for bad in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
    assert plan.count("Exchange") < 60, plan.count("Exchange")


def test_logrank_matches_numpy_reference(spark, duck, sf_dir):
    """From-scratch numpy log-rank on the same per-user conversion
    table the query derives (ground truth for the shared formula)."""
    from diabetes_etl_spark.plans import all_queries

    pu = duck.execute(
        """
        SELECT user_id,
          MIN(CAST(date_trunc('day', ts) AS DATE)) AS f,
          MIN(CASE WHEN event_type = 'purchase'
              THEN CAST(date_trunc('day', ts) AS DATE) END) AS p,
          MAX(CAST(date_trunc('day', ts) AS DATE)) AS l
        FROM events GROUP BY user_id
        """
    ).fetchdf()
    maxd = pu["l"].max()
    t = np.where(
        pu["p"].notna(),
        (pu["p"] - pu["f"]).dt.days,
        (maxd - pu["f"]).dt.days,
    ).astype(int)
    dead = pu["p"].notna().astype(int).to_numpy()
    g = pu["user_id"].map(_variant).to_numpy()

    O1 = E1 = V = 0.0
    for ti in sorted(set(t[dead == 1])):
        at1 = int(((t >= ti) & (g == 0)).sum())
        at2 = int(((t >= ti) & (g == 1)).sum())
        d1 = int(((t == ti) & (g == 0) & (dead == 1)).sum())
        d2 = int(((t == ti) & (g == 1) & (dead == 1)).sum())
        n, d = at1 + at2, d1 + d2
        O1 += d1
        E1 += d * at1 / n
        if n > 1:
            V += d * (at1 / n) * (1 - at1 / n) * (n - d) / (n - 1)
    z_ref = (O1 - E1) / np.sqrt(V)

    spec = all_queries(include_extended=True)["events_ab_logrank"]
    row = spec.fn(spark, sf_dir).collect()[0]
    assert row["deaths_a"] == O1
    assert row["expected_a"] == pytest.approx(E1, abs=1e-6)
    assert row["variance"] == pytest.approx(V, abs=1e-6)
    assert row["z_logrank"] == pytest.approx(z_ref, abs=1e-7)


# -- streaming Misra-Gries state: eviction-path guarantee ----------------------


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_mg_updater_eviction_keeps_every_phi_heavy_key():
    """With k = 2 and a stream where one uid dominates, the eviction
    path must fire (summary stays <= k entries) yet every key with
    count > n/k must survive — the MG no-false-negative guarantee."""
    import pandas as pd

    from diabetes_etl_spark.streaming.stateful import _mg_updater

    update = _mg_updater(2)
    state = _FakeState()
    # 3 batches: uid 1 appears 30x, uid 2 12x, uids 100..119 once each
    batches = [
        pd.DataFrame({"user_id": [1] * 10 + [2] * 4 + list(range(100, 107))}),
        pd.DataFrame({"user_id": [1] * 10 + [2] * 4 + list(range(107, 114))}),
        pd.DataFrame({"user_id": [1] * 10 + [2] * 4 + list(range(114, 120))}),
    ]
    for b in batches:
        out = list(update(("click",), iter([b]), state))
    uids, counts, n_total = state.get
    assert n_total == 62
    assert len(uids) <= 2  # eviction really fired
    # n/k = 31: uid 1 (count 30) is NOT guaranteed; recompute with the
    # guarantee threshold — any uid with count > n/k must be present
    for uid, true_count in ((1, 30), (2, 12)):
        if true_count > n_total / 2:
            assert uid in uids
    # uid 1 has count 30 < 31 so no hard guarantee, but MG should
    # still retain the dominant key in practice here
    assert 1 in uids
    # summary counts never exceed true counts (MG counts are floors)
    true = {1: 30, 2: 12}
    for uid, c in zip(uids, counts):
        assert c <= true.get(uid, 1)
    assert out[0]["n_total"].iloc[0] == 62


def test_mg_updater_covering_k_is_exact():
    import pandas as pd

    from diabetes_etl_spark.streaming.stateful import _mg_updater

    update = _mg_updater(100)
    state = _FakeState()
    b = pd.DataFrame({"user_id": [1, 1, 2, 3, 3, 3]})
    list(update(("x",), iter([b]), state))
    uids, counts, n = state.get
    assert dict(zip(uids, counts)) == {1: 2, 2: 1, 3: 3} and n == 6


# -- property tests: MG guarantee + canonical_url laws -------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=300),
    st.integers(2, 8),
    st.integers(1, 4),
)
def test_mg_guarantee_on_random_streams(stream, k, n_batches):
    """For ANY stream, batch split and capacity: summary size <= k,
    summary counts are floors of true counts, and every key with
    true count > n/k is present (the no-false-negative guarantee)."""
    import pandas as pd

    from diabetes_etl_spark.streaming.stateful import _mg_updater

    update = _mg_updater(k)
    state = _FakeState()
    step = max(1, len(stream) // n_batches)
    for i in range(0, max(len(stream), 1), step):
        chunk = stream[i : i + step]
        if not chunk:
            continue
        list(update(("t",), iter([pd.DataFrame({"user_id": chunk})]), state))
    if state.get is None:
        assert not stream
        return
    uids, counts, n_total = state.get
    assert n_total == len(stream)
    assert len(uids) <= k
    true = {}
    for u in stream:
        true[u] = true.get(u, 0) + 1
    for u, c in zip(uids, counts):
        assert c <= true[u]
    for u, tc in true.items():
        if tc > len(stream) / k:
            assert u in uids, (u, tc, len(stream), k)


_url_part = st.text(
    alphabet="abcdefghij", min_size=1, max_size=6
)


@settings(max_examples=60, deadline=None)
@given(
    _url_part,
    st.lists(
        st.tuples(
            st.sampled_from(
                [
                    "a", "b", "zz", "utm_source", "utm_x", "gclid",
                    "fbclid", "UTM_SOURCE", "Utm_Medium", "GCLID",
                    "FbClid",
                ]
            ),
            st.text(alphabet="xyz01", min_size=0, max_size=4),
        ),
        max_size=5,
    ),
    st.booleans(),  # uppercase authority
    st.booleans(),  # default port
    st.booleans(),  # trailing slash
    st.booleans(),  # fragment
)
def test_canonical_url_invariance_and_idempotence(
    spark, host, params, upper, port, slash, frag
):
    """Canonicalization is invariant under every pure-noise transform
    (case, :443, trailing slash, fragment, param ORDER, tracking
    params) and idempotent on its own output."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.operators.urls import canonical_url

    def build(ps, up, pt, sl, fg):
        auth = f"{host}.com" + (":443" if pt else "")
        if up:
            auth = auth.upper()
        # tracking params with an empty value render VALUELESS
        # ("?gclid", no '=') — the real-crawl shape the filter must
        # also catch, case-insensitively
        q = "&".join(
            k
            if v == ""
            and k.lower().startswith(("utm_", "gclid", "fbclid"))
            else f"{k}={v}"
            for k, v in ps
        )
        return (
            "https://" + auth + "/p/x" + ("/" if sl else "")
            + (("?" + q) if q else "") + ("#f" if fg else "")
        )

    clean_params = [
        p
        for p in params
        if not p[0].lower().startswith(("utm_", "gclid", "fbclid"))
    ]
    variants = [
        build(params, upper, port, slash, frag),
        build(list(reversed(params)), False, False, False, False),
        build(clean_params, upper, False, slash, False),
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    out = [
        r["c"]
        for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert len(set(out)) == 1, out
    # idempotence: canonical(canonical(u)) == canonical(u)
    df2 = spark.createDataFrame([(out[0],)], "url string")
    again = df2.select(canonical_url(F.col("url")).alias("c")).collect()[0]["c"]
    assert again == out[0]


# -- image patch stats: hand-built PNG with edge remainders --------------------


def test_patch_stats_edge_drop_and_fold_order(spark):
    """5x3 RGB image: 2x2 tiles -> n_px=2, n_py=1; column 5 and row 3
    are edge remainders and must NOT contribute; the fingerprint must
    fold tiles in row-major order."""
    from diabetes_etl_spark.operators.multimodal import (
        image_patch_stats,
        png_bytes,
    )

    w, h = 5, 3
    px = bytes((7 * i + 3) % 256 for i in range(w * h * 3))
    payload = png_bytes(w, h, px)
    df = spark.createDataFrame(
        [(1, payload, {"mime": "image/png", "n_bytes": len(payload),
                       "checksum": "x"})],
        "doc_id long, payload binary, "
        "asset_meta struct<mime: string, n_bytes: int, checksum: string>",
    )
    row = image_patch_stats(df).collect()[0]

    def luma(x, y):
        return sum(px[(y * w + x) * 3 + c] for c in range(3))

    tiles = []
    for py in range(1):
        for pxi in range(2):
            tiles.append(
                sum(
                    luma(2 * pxi + dx, 2 * py + dy)
                    for dy in range(2)
                    for dx in range(2)
                )
            )
    fp = 0
    for s in tiles:
        fp = (fp * 131 + s) % ((1 << 61) - 1)
    assert (row["n_px"], row["n_py"]) == (2, 1)
    assert row["patch_sum_total"] == sum(tiles)
    assert row["patch_fp"] == fp
    # swapped tile order must hash differently (fold is ordered)
    fp_swapped = 0
    for s in reversed(tiles):
        fp_swapped = (fp_swapped * 131 + s) % ((1 << 61) - 1)
    assert tiles[0] == tiles[1] or fp_swapped != fp


def test_patch_stats_null_meta_and_payload_dropped(spark):
    """Rows with NULL asset_meta or NULL payload are DROPPED (never a
    task-failing TypeError): the operator is a public building block
    and must honor its 'dropped, never fabricated' contract even when
    fed raw rows that never went through attach_media_payloads."""
    from diabetes_etl_spark.operators.multimodal import (
        image_patch_stats,
        png_bytes,
    )

    payload = png_bytes(2, 2, bytes(range(12)))
    meta = {"mime": "image/png", "n_bytes": len(payload), "checksum": "x"}
    df = spark.createDataFrame(
        [
            (1, payload, meta),
            (2, payload, None),  # NULL meta, real payload
            (3, None, meta),  # NULL payload
            (4, None, None),
        ],
        "doc_id long, payload binary, "
        "asset_meta struct<mime: string, n_bytes: int, checksum: string>",
    )
    rows = image_patch_stats(df).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_ratio_delta_matches_numpy_reference(spark, duck, sf_dir):
    """Delta-method ratio variance cross-checked against a from-scratch
    numpy implementation on the same per-user table."""
    from diabetes_etl_spark.plans import all_queries

    pu = duck.execute(
        """
        SELECT user_id,
          SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x,
          COUNT(*) AS y
        FROM events GROUP BY user_id
        """
    ).fetchdf()
    g = pu["user_id"].map(_variant).to_numpy()
    stats = {}
    for v in (0, 1):
        x = pu.loc[g == v, "x"].to_numpy(float)
        y = pu.loc[g == v, "y"].to_numpy(float)
        n, r, my = len(x), x.sum() / y.sum(), y.mean()
        vx, vy = x.var(ddof=1), y.var(ddof=1)
        cxy = np.cov(x, y, ddof=1)[0, 1]
        stats[v] = (n, r, (vx - 2 * r * cxy + r * r * vy) / (n * my * my))
    z_ref = (stats[1][1] - stats[0][1]) / np.sqrt(stats[0][2] + stats[1][2])

    spec = all_queries(include_extended=True)["events_ab_ratio_delta"]
    row = spec.fn(spark, sf_dir).collect()[0]
    assert row["n_a"] == stats[0][0] and row["n_b"] == stats[1][0]
    assert row["ratio_a"] == pytest.approx(stats[0][1], abs=1e-8)
    assert row["se_a"] == pytest.approx(np.sqrt(stats[0][2]), abs=1e-7)
    assert row["z_ratio"] == pytest.approx(z_ref, abs=1e-7)
