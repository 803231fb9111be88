"""Round-13 additions (third batch): modularity scoring, offline
changepoint detection, and the bandit replay evaluator."""

from __future__ import annotations

import pytest

from diabetes_etl_spark.plans import all_queries


@pytest.fixture(scope="module")
def reg():
    return all_queries(include_extended=True)


def _sym_edges(spark, undirected_pairs):
    both = [(a, b) for a, b in undirected_pairs] + [
        (b, a) for a, b in undirected_pairs
    ]
    return spark.createDataFrame(sorted(set(both)), "src long, dst long")


def test_modularity_two_disjoint_triangles(spark):
    """Two disjoint triangles under their natural partition: each
    community contributes (6*12 - 6^2)/12^2 = 0.25, total Q = 0.5 —
    the textbook hand-checkable value."""
    from diabetes_etl_spark.operators.graph import (
        label_propagation,
        modularity_contributions,
    )

    edges = _sym_edges(
        spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    )
    labels = label_propagation(edges, iterations=3, symmetric=False)
    rows = (
        modularity_contributions(edges, labels).orderBy("community").collect()
    )
    assert len(rows) == 2
    for r in rows:
        assert r["size"] == 3
        assert r["intra_pairs"] == 3
        assert r["degree_sum"] == 6
        assert r["q_contrib"] == pytest.approx(0.25, abs=1e-12)
        assert r["q_total"] == pytest.approx(0.5, abs=1e-12)


def test_modularity_singleton_partition_is_negative_or_zero(spark):
    """Every node in its own community: A_c = 0 for all c, so each
    contribution is -(d_c/E)^2 < 0 and Q < 0 — the partition is
    worse than chance, as modularity must report."""
    from diabetes_etl_spark.operators.graph import modularity_contributions

    edges = _sym_edges(spark, [(1, 2), (2, 3), (3, 4)])
    singleton = edges.selectExpr("src AS node", "src AS label").distinct()
    rows = modularity_contributions(edges, singleton).collect()
    assert all(r["intra_pairs"] == 0 for r in rows)
    assert all(r["q_contrib"] < 0 for r in rows)
    assert rows[0]["q_total"] < 0


def _daily(spark, rates):
    """Synthetic (seg, d, n, x, y) spine with given daily rates."""
    import datetime

    rows = [
        (
            0,
            datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
            1000,
            int(round(r * 1000)),
            int(round(round(r, 9) * 1e9)),
        )
        for i, r in enumerate(rates)
    ]
    return spark.createDataFrame(
        rows, "seg long, d date, n long, x long, y long"
    )


def test_binseg_finds_planted_step(spark):
    """20 days at rate 0.2 then 20 at 0.8: the level-1 cut must land
    exactly on day 20 with side means 0.2/0.8, and the level-2 cuts
    (inside constant halves) must carry zero gain."""
    import datetime

    from diabetes_etl_spark.plans.events import (
        _binseg_assign,
        _binseg_level_splits,
    )

    df = _daily(spark, [0.2] * 20 + [0.8] * 20)
    s1 = _binseg_level_splits(df, 1).collect()
    assert len(s1) == 1
    r = s1[0]
    assert r["cp_d"] == datetime.date(2024, 1, 20)
    assert r["left_days"] == 20 and r["right_days"] == 20
    assert r["left_mean"] == pytest.approx(0.2, abs=1e-9)
    assert r["right_mean"] == pytest.approx(0.8, abs=1e-9)
    assert r["gain_rate2"] == pytest.approx(40 * 0.09, rel=1e-9)

    s2 = _binseg_level_splits(
        _binseg_assign(df, _binseg_level_splits(df, 1)), 2
    ).collect()
    assert len(s2) == 2
    for r2 in s2:
        assert r2["gain_rate2"] == pytest.approx(0.0, abs=1e-12)
        assert r2["left_mean"] == r2["right_mean"]


def test_binseg_matches_bruteforce_on_fixture(spark, sf_dir, reg):
    """The level-1 cut must agree with a from-scratch Python brute
    force over the same 9dp daily rates."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = sorted(
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("x"),
        )
        .collect(),
        key=lambda r: r["d"],
    )
    ys = [int(round(round(r["x"] / r["n"], 9) * 1e9)) for r in daily]
    best, best_f = None, None
    dd, s_tot = len(ys), sum(ys)
    for t in range(5, dd - 5 + 1):
        s_l = sum(ys[:t])
        f = (
            s_l * s_l * (dd - t) + (s_tot - s_l) ** 2 * t
        ) / (t * (dd - t))
        if best_f is None or f > best_f:
            best, best_f = t, f
    rows = [
        r
        for r in reg["events_changepoint_binseg"].fn(spark, sf_dir).collect()
        if r["level"] == 1
    ]
    assert len(rows) == 1
    assert rows[0]["cp_d"] == daily[best - 1]["d"]
    assert all(
        r["gain_rate2"] >= 0
        for r in reg["events_changepoint_binseg"].fn(spark, sf_dir).collect()
    )


def test_binseg_partition_invariant(spark, sf_dir, reg):
    want = sorted(
        tuple(r)
        for r in reg["events_changepoint_binseg"].fn(spark, sf_dir).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        got = sorted(
            tuple(r)
            for r in reg["events_changepoint_binseg"]
            .fn(spark, sf_dir)
            .collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_modularity_total_is_sum_of_contributions(spark, sf_dir, reg):
    rows = reg["graph_modularity_communities"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    total = rows[0]["q_total"]
    assert all(r["q_total"] == total for r in rows)
    assert total == pytest.approx(
        sum(r["q_contrib"] for r in rows), abs=len(rows) * 1e-12
    )
    assert -1.0 <= total <= 1.0


def test_ucb_replay_matches_python_replay(spark, sf_dir, reg):
    """From-scratch Python replay of the day-batched UCB1 protocol
    (same 9dp-quantized formulas) must reproduce every arm choice,
    index value, and running estimate."""
    import math

    from pyspark.sql import functions as F

    from diabetes_etl_spark.plans.causalplans import (
        _UCB_ARMS,
        _variant_col,
    )
    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    grid = (
        ev.select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
            _variant_col(F.col("event_id"), mod=_UCB_ARMS)
            .cast("int")
            .alias("arm"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("r"),
        )
        .groupBy("d", "arm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("r").alias("s"))
        .collect()
    )
    days = {}
    for row in grid:
        day = days.setdefault(
            row["d"], {"n": [0] * _UCB_ARMS, "s": [0] * _UCB_ARMS}
        )
        day["n"][row["arm"]] = row["n"]
        day["s"][row["arm"]] = row["s"]

    n_acc, s_acc = [0] * _UCB_ARMS, [0] * _UCB_ARMS
    expect = []
    for d in sorted(days):
        t = sum(n_acc)
        if 0 in n_acc:
            chosen = n_acc.index(0)
            ucbs = [
                None
                if n_acc[a] == 0
                else round(
                    s_acc[a] / n_acc[a]
                    + math.sqrt(2 * round(math.log(t), 9) / n_acc[a]),
                    9,
                )
                for a in range(_UCB_ARMS)
            ]
        else:
            ucbs = [
                round(
                    s_acc[a] / n_acc[a]
                    + math.sqrt(2 * round(math.log(t), 9) / n_acc[a]),
                    9,
                )
                for a in range(_UCB_ARMS)
            ]
            chosen = max(range(_UCB_ARMS), key=lambda a: (ucbs[a], -a))
        n_acc[chosen] += days[d]["n"][chosen]
        s_acc[chosen] += days[d]["s"][chosen]
        expect.append((d, chosen, t, tuple(ucbs), sum(n_acc), sum(s_acc)))

    got = (
        reg["events_bandit_ucb_replay"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    assert len(got) == len(expect)
    for r, (d, chosen, t, ucbs, cum_n, cum_s) in zip(got, expect):
        assert r["d"] == d
        assert r["chosen_arm"] == chosen
        assert r["t_before"] == t
        assert r["cum_n"] == cum_n and r["cum_s"] == cum_s
        for a in range(_UCB_ARMS):
            if ucbs[a] is None:
                assert r[f"ucb{a}"] is None
            else:
                assert r[f"ucb{a}"] == pytest.approx(ucbs[a], abs=2e-9)
        if cum_n > 0:
            assert r["avg_reward"] == pytest.approx(
                round(cum_s / cum_n, 9), abs=2e-9
            )


def test_ucb_replay_explores_then_exploits(spark, sf_dir, reg):
    """Every arm with logged traffic must eventually be explored
    (t_before grows; after the burn-in all ucb columns are set), and
    matched trials must never exceed that day's logged volume."""
    rows = (
        reg["events_bandit_ucb_replay"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    assert rows[0]["t_before"] == 0 and rows[0]["chosen_arm"] == 0
    late = rows[-1]
    assert all(late[f"ucb{a}"] is not None for a in range(4))
    for r in rows:
        assert 0 <= r["matched_n"]
        assert 0 <= r["matched_s"] <= r["matched_n"]


def test_nelson_aalen_matches_python_replay(spark, sf_dir, reg):
    """From-scratch NA replay (risk sets by reverse scan, 12dp
    increments, decimal folds) must match every curve point."""
    from pyspark.sql import functions as F

    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(day).alias("f"),
            F.min(
                F.when(F.col("event_type") == "purchase", day)
            ).alias("p"),
            F.max(day).alias("l"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("variant"),
        )
        .collect()
    )
    maxd = max(r["l"] for r in per_user)
    by_var = {0: {}, 1: {}}
    for r in per_user:
        t = (
            (r["p"] - r["f"]).days
            if r["p"] is not None
            else (maxd - r["f"]).days
        )
        m, d = by_var[r["variant"]].setdefault(t, [0, 0])
        by_var[r["variant"]][t] = [
            m + 1,
            d + (1 if r["p"] is not None else 0),
        ]

    expect = {}
    for v, times in by_var.items():
        at_risk = sum(m for m, _ in times.values())
        ch = cv = 0.0
        for t in sorted(times):
            m, d = times[t]
            if d > 0:
                ch = round(ch + round(d / at_risk, 12), 12)
                cv = round(cv + round(d / at_risk / at_risk, 12), 12)
                expect[(v, t)] = (at_risk, d, ch, cv)
            at_risk -= m

    rows = (
        reg["events_survival_nelson_aalen"].fn(spark, sf_dir).collect()
    )
    assert len(rows) == len(expect)
    for r in rows:
        n_risk, d, ch, cv = expect[(r["variant"], r["t"])]
        assert r["n_risk"] == n_risk and r["d_events"] == d
        assert r["cum_hazard"] == pytest.approx(round(ch, 9), abs=2e-9)
        assert r["se_hazard"] == pytest.approx(cv**0.5, abs=2e-9)
        assert r["surv_fh"] == pytest.approx(
            __import__("math").exp(-round(ch, 9)), abs=2e-9
        )


def test_nelson_aalen_monotone_curves(spark, sf_dir, reg):
    rows = (
        reg["events_survival_nelson_aalen"].fn(spark, sf_dir)
        .orderBy("variant", "t")
        .collect()
    )
    last = {}
    for r in rows:
        v = r["variant"]
        if v in last:
            assert r["cum_hazard"] >= last[v][0]
            assert r["surv_fh"] <= last[v][1]
            assert r["n_risk"] < last[v][2]
        assert 0 < r["surv_fh"] <= 1.0
        last[v] = (r["cum_hazard"], r["surv_fh"], r["n_risk"])


def test_seq_pair_rules_match_python_replay(spark, sf_dir, reg):
    """Exact replay of the first(A) < last(B) existence test from
    the collected (user, type) first/last table."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    fl = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("ft"), F.max("ts").alias("lt"))
        .collect()
    )
    per_user = defaultdict(dict)
    for r in fl:
        per_user[r["user_id"]][r["event_type"]] = (r["ft"], r["lt"])
    n_seq = defaultdict(int)
    n_t = defaultdict(int)
    for types in per_user.values():
        for a, (ft, _) in types.items():
            n_t[a] += 1
            for b, (_, lt) in types.items():
                if ft < lt:
                    n_seq[(a, b)] += 1
    total = len(per_user)

    rows = reg["events_seq_pair_rules"].fn(spark, sf_dir).collect()
    assert len(rows) == len(n_seq)
    for r in rows:
        key = (r["a"], r["b"])
        assert r["n_seq"] == n_seq[key]
        assert r["n_a"] == n_t[r["a"]] and r["n_b"] == n_t[r["b"]]
        assert r["users_total"] == total
        assert r["n_seq"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["confidence"] <= 1.0
        assert r["support"] == pytest.approx(
            round(n_seq[key] / total, 9), abs=1e-12
        )


def test_good_turing_matches_python_replay(spark, sf_dir, reg):
    from collections import Counter

    from pyspark.sql import functions as F

    from diabetes_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = [
        r["tok"]
        for r in docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .where(F.length("tok") > 0)
        .collect()
    ]
    wc = Counter(toks)
    fof = Counter(wc.values())
    n_tokens = sum(wc.values())

    rows = {r["r"]: r for r in reg["text_good_turing"].fn(spark, sf_dir).collect()}
    assert rows[0]["n_r"] is None
    assert rows[0]["p_gt"] == pytest.approx(
        round(fof.get(1, 0) / n_tokens, 9), abs=1e-12
    )
    for r, row in rows.items():
        if r == 0:
            continue
        assert row["n_r"] == fof[r]
        assert row["mass"] == pytest.approx(
            round(r * fof[r] / n_tokens, 9), abs=1e-12
        )
        if fof.get(r + 1):
            want = round((r + 1) * fof[r + 1] / fof[r], 6)
            assert row["r_star"] == pytest.approx(want, abs=1e-9)
            assert row["p_gt"] == pytest.approx(
                round(want / n_tokens, 9), abs=1e-12
            )
        else:
            assert row["r_star"] is None and row["p_gt"] is None


def test_burstiness_matches_python_replay(spark, sf_dir, reg):
    from collections import defaultdict

    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").collect()
    per_user = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp())  # ts is tz-naive UTC micros
        per_user[r["user_id"]].append((r["ts"], r["event_id"], us))
    bs, n_gaps = [], 0
    xs, ys = [], []
    for rows in per_user.values():
        rows.sort()
        ts = [u for _, _, u in rows]
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if not gaps:
            continue
        xs += gaps[:-1]
        ys += gaps[1:]
        n, s = len(gaps), sum(gaps)
        if s <= 0:
            continue
        n_gaps += n
        q = sum(g * g for g in gaps)
        sq = (n * q - s * s) ** 0.5
        bs.append(round((sq - s) / (sq + s), 9))
    got = reg["events_burstiness_memory"].fn(spark, sf_dir).collect()[0]
    assert got["n_users"] == len(bs)
    assert got["n_gaps"] == n_gaps
    assert got["mean_burstiness"] == pytest.approx(
        round(sum(bs) / len(bs), 9), abs=2e-9
    )
    assert got["frac_bursty"] == pytest.approx(
        round(sum(1 for b in bs if b > 0) / len(bs), 9), abs=1e-12
    )
    assert -1.0 <= got["mean_burstiness"] < 1.0
    np_, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    vx, vy = np_ * sxx - sx * sx, np_ * sy * 0 + np_ * syy - sy * sy
    assert got["n_pairs"] == np_
    if vx > 0 and vy > 0:
        want = round(
            (np_ * sxy - sx * sy) / (vx**0.5) / (vy**0.5), 9
        )
        assert got["memory_coeff"] == pytest.approx(want, abs=2e-9)
        assert -1.0 <= got["memory_coeff"] <= 1.0


def test_hbos_matches_python_replay(spark, sf_dir, reg):
    import math

    from diabetes_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    ).collect()
    feats = ["l_quantity", "l_extendedprice", "l_discount"]
    n = len(li)
    mn = {f: min(r[f] for r in li) for f in feats}
    mx = {f: max(r[f] for r in li) for f in feats}

    def bin_of(f, x):
        if mx[f] <= mn[f]:
            return 0
        return min(9, math.floor((x - mn[f]) / (mx[f] - mn[f]) * 10))

    hist = {f: {} for f in feats}
    for r in li:
        for f in feats:
            b = bin_of(f, r[f])
            hist[f][b] = hist[f].get(b, 0) + 1
    scored = []
    for r in li:
        s = round(
            sum(
                -round(math.log(hist[f][bin_of(f, r[f])] / n), 9)
                for f in feats
            ),
            9,
        )
        scored.append((-s, r["l_orderkey"], r["l_linenumber"], s))
    scored.sort()
    want = scored[:25]
    got = reg["lineitem_hbos_outliers"].fn(spark, sf_dir).collect()
    assert len(got) == 25
    for g, (_, ok, ln_, s) in zip(got, want):
        assert (g["l_orderkey"], g["l_linenumber"]) == (ok, ln_)
        assert g["hbos_score"] == pytest.approx(s, abs=2e-9)
    assert all(g["hbos_score"] > 0 for g in got)


def test_tcloseness_identical_and_polarized_groups(spark):
    """A group distributed exactly like the global table has t = 0;
    two equal groups fully concentrated in opposite extreme buckets
    each sit at t = 0.5 (EMD of half the mass across the whole
    domain, normalized by m-1)."""
    from diabetes_etl_spark.operators.pii import tcloseness_profile

    same = spark.createDataFrame(
        [("a", b % 10) for b in range(20)]
        + [("b", b % 10) for b in range(20)],
        "grp string, bucket int",
    )
    rows = tcloseness_profile(same, ["grp"], m=10).collect()
    assert all(r["t_closeness"] == 0.0 for r in rows)
    assert all(not r["is_violating"] for r in rows)

    polar = spark.createDataFrame(
        [("a", 0)] * 10 + [("b", 9)] * 10, "grp string, bucket int"
    )
    rows = {
        r["grp"]: r
        for r in tcloseness_profile(polar, ["grp"], m=10).collect()
    }
    assert rows["a"]["t_closeness"] == pytest.approx(0.5, abs=1e-12)
    assert rows["b"]["t_closeness"] == pytest.approx(0.5, abs=1e-12)
    assert rows["a"]["is_violating"] and rows["b"]["is_violating"]


def test_tcloseness_matches_python_replay(spark, sf_dir, reg):
    import math

    from diabetes_etl_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    mn = min(r["c_acctbal"] for r in cust)
    mx = max(r["c_acctbal"] for r in cust)
    n_tot = len(cust)

    def bucket(x):
        if mx <= mn:
            return 0
        return min(9, math.floor((x - mn) / (mx - mn) * 10))

    glob = [0] * 10
    groups = {}
    for r in cust:
        b = bucket(r["c_acctbal"])
        glob[b] += 1
        g = groups.setdefault((r["c_nationkey"], r["c_mktsegment"]), [0] * 10)
        g[b] += 1

    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in reg["pii_tcloseness_customer"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for key, cnts in groups.items():
        n_g = sum(cnts)
        cum, emd = 0, 0
        for b in range(10):
            cum += cnts[b] * n_tot - glob[b] * n_g
            emd += abs(cum)
        assert cum == 0  # built-in checksum
        want = round(emd / n_g / n_tot / 9, 9)
        r = got[key]
        assert r["n_rows"] == n_g
        assert r["t_closeness"] == pytest.approx(want, abs=1e-12)
        assert 0.0 <= r["t_closeness"] <= 1.0
        assert r["is_violating"] == (r["t_closeness"] > 0.2)


def _plan_str(spark, sf_dir, reg, name, mode="extended"):
    df = reg[name].fn(spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_round13c_plans_no_cartesian_no_python(spark, sf_dir, reg):
    """None of the third/fourth-batch queries may plan a cartesian
    product or a Python UDF; the only BNLJs allowed are the
    intentional 1-row scalar-attach broadcasts."""
    for name in (
        "graph_modularity_communities",
        "events_changepoint_binseg",
        "events_bandit_ucb_replay",
        "events_survival_nelson_aalen",
        "events_seq_pair_rules",
        "events_burstiness_memory",
        "text_good_turing",
        "lineitem_hbos_outliers",
        "pii_tcloseness_customer",
    ):
        plan = _plan_str(spark, sf_dir, reg, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_hbos_topk_is_heap_not_global_sort(spark, sf_dir, reg):
    plan = _plan_str(spark, sf_dir, reg, "lineitem_hbos_outliers")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_seq_pair_marginals_broadcast(spark, sf_dir, reg):
    plan = _plan_str(spark, sf_dir, reg, "events_seq_pair_rules")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or "user_id" in plan


def test_raking_matches_python_replay_and_calibrates(spark, sf_dir, reg):
    """Full-precision Python IPF replay (same 6dp/9dp rounding
    points) must reproduce every weight; after the final segment
    step, segment margins must match their targets to rounding, and
    the overrepresented BUILDING segment must be downweighted."""
    from collections import defaultdict

    rows = reg["sample_raking_ipf"].fn(spark, sf_dir).collect()
    cells = {
        (r["c_nationkey"], r["c_mktsegment"]): r["n_sample"] for r in rows
    }
    tn = {r["c_nationkey"]: r["nation_target"] for r in rows}
    ts = {r["c_mktsegment"]: r["segment_target"] for r in rows}
    w = {k: 1.0 for k in cells}
    for _ in range(3):
        for dim, tgt in ((0, tn), (1, ts)):
            cur = defaultdict(float)
            for k, c in cells.items():
                cur[k[dim]] = round(cur[k[dim]] + round(w[k] * c, 6), 6)
            for k in w:
                w[k] = round(w[k] * round(tgt[k[dim]] / cur[k[dim]], 9), 9)
    for r in rows:
        k = (r["c_nationkey"], r["c_mktsegment"])
        assert r["weight"] == pytest.approx(w[k], abs=2e-9)
        assert r["est_count"] == pytest.approx(
            round(w[k] * cells[k], 6), abs=2e-6
        )

    seg_mass = defaultdict(float)
    for r in rows:
        seg_mass[r["c_mktsegment"]] += r["est_count"]
    for s, target in ts.items():
        assert seg_mass[s] == pytest.approx(target, rel=1e-5)

    bld = [r["weight"] for r in rows if r["c_mktsegment"] == "BUILDING"]
    oth = [r["weight"] for r in rows if r["c_mktsegment"] != "BUILDING"]
    assert sum(bld) / len(bld) < sum(oth) / len(oth)


def test_markov_attribution_matches_python_replay(spark, sf_dir, reg):
    """Full from-scratch replay: sessionize (30-min gap), truncate at
    first purchase, count transitions, run the 12-step absorption for
    the full chain and each removal variant with the same 9dp/12dp
    quantization — every output field must match."""
    from collections import defaultdict

    from diabetes_etl_spark.sources.tables import load_table

    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    TR = ["click", "error", "signup", "view"]
    counts = defaultdict(int)
    path, last_us, cur_user = [], None, None

    def flush(p):
        if not p:
            return
        cut = next(
            (i for i, t in enumerate(p) if t == "purchase"), None
        )
        kept = p if cut is None else p[: cut + 1]
        counts[("start", kept[0])] += 1
        for a, b in zip(kept, kept[1:]):
            counts[(a, b)] += 1
        if cut is None:
            counts[(kept[-1], "nil")] += 1

    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        if r["user_id"] != cur_user:
            flush(path)
            path, cur_user = [], r["user_id"]
        elif last_us is not None and us - last_us >= 1800 * 1_000_000:
            flush(path)
            path = []
        path.append(r["event_type"])
        last_us = us
    flush(path)

    B = TR + ["purchase", "nil"]

    def p(a, b):
        tot = sum(counts[(a, bb)] for bb in B)
        return 0.0 if tot == 0 else round(counts[(a, b)] / tot, 9)

    def absorb(removed):
        v = {
            s: (0.0 if s == removed else p("start", s)) for s in TR
        }
        conv = p("start", "purchase")
        srcs = [a for a in TR if a != removed]
        for _ in range(12):
            nv = {}
            for s in TR:
                if s == removed:
                    nv[s] = 0.0
                    continue
                nv[s] = round(
                    sum(round(v[a] * p(a, s), 12) for a in srcs), 12
                )
            conv = round(
                conv
                + sum(
                    round(v[a] * p(a, "purchase"), 12) for a in srcs
                ),
                12,
            )
            v = nv
        return conv

    full = absorb(None)
    res = {
        c: (None if full <= 0 else round(1 - absorb(c) / full, 9))
        for c in TR
    }
    pos_total = sum(x for x in res.values() if x and x > 0)

    rows = {
        r["channel"]: r
        for r in reg["events_markov_attribution"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(TR)
    for c in TR:
        r = rows[c]
        assert r["n_out"] == sum(counts[(c, b)] for b in B)
        assert r["p_conversion"] == pytest.approx(full, abs=2e-9)
        assert r["p_conversion_removed"] == pytest.approx(
            absorb(c), abs=2e-9
        )
        assert 0.0 <= r["p_conversion"] <= 1.0
        if res[c] is not None:
            assert r["removal_effect"] == pytest.approx(res[c], abs=2e-9)
        if pos_total > 0:
            want = (
                round(res[c] / pos_total, 9)
                if res[c] and res[c] > 0
                else 0.0
            )
            assert r["attribution_share"] == pytest.approx(want, abs=2e-8)
    if pos_total > 0:
        assert sum(
            r["attribution_share"] for r in rows.values()
        ) == pytest.approx(1.0, abs=1e-6)


def test_abc_xyz_matches_python_replay(spark, sf_dir, reg):
    """Replay ABC cut points and the exact-radicand CV from collected
    lineitem; classes must match and the Pareto structure must hold
    (A parts carry <= 0.80+one-part of revenue, every A part ranks
    above every C part)."""
    from collections import defaultdict

    from diabetes_etl_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
        .collect()
    )
    rev = defaultdict(float)
    s_q = defaultdict(int)
    q_q = defaultdict(int)
    weeks = set()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for r in rows:
        k = r["l_partkey"]
        rev[k] = round(rev[k] + round(r["l_extendedprice"], 2), 2)
        q = int(r["l_quantity"])
        s_q[k] += q
        q_q[k] += q * q
        weeks.add((r["l_shipdate"].date() - epoch).days // 7)
    w = len(weeks)
    total = round(sum(rev.values()), 2)
    order = sorted(rev, key=lambda k: (-rev[k], k))
    cum, expect = 0.0, {}
    for k in order:
        cum = round(cum + rev[k], 2)
        share = round(cum / total, 9)
        abc = "A" if share <= 0.80 else ("B" if share <= 0.95 else "C")
        radic = q_q[k] * w - s_q[k] * s_q[k]
        cv = round(radic**0.5 / s_q[k], 9)
        xyz = "X" if cv <= 0.5 else ("Y" if cv <= 1.0 else "Z")
        expect[k] = (abc, xyz, cv)

    got = reg["parts_abc_xyz_classes"].fn(spark, sf_dir).collect()
    assert len(got) == len(rev)
    seen_c = False
    for r in got:  # ordered by revenue desc
        abc, xyz, cv = expect[r["l_partkey"]]
        assert r["abc_class"] == abc
        assert r["xyz_class"] == xyz
        assert r["weekly_cv"] == pytest.approx(cv, abs=2e-9)
        if r["abc_class"] == "C":
            seen_c = True
        else:
            assert not seen_c  # A/B never after a C in revenue order
    assert {r["abc_class"] for r in got} >= {"A"}
    assert got[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)


def test_croston_matches_python_replay(spark, sf_dir, reg):
    """Exact integer replay of the scaled Croston walk; constant
    demand must lock size_est to the demand and interval_est to the
    constant gap."""
    from collections import defaultdict

    from diabetes_etl_spark.sources.tables import load_table

    import datetime

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_shipdate")
        .collect()
    )
    epoch = datetime.date(1970, 1, 1)
    weekly = defaultdict(int)
    for r in rows:
        wk = (r["l_shipdate"].date() - epoch).days // 7
        weekly[(r["l_partkey"], wk)] += int(r["l_quantity"])
    series = defaultdict(list)
    for (k, wk), q in sorted(weekly.items()):
        series[k].append((wk, q))

    expect = {}
    for k, ev in series.items():
        z = ev[0][1] * 10**9
        p = 10**9
        w = ev[0][0]
        for wk, q in ev[1:]:
            z = (9 * z + q * 10**9 + 5) // 10
            p = (9 * p + (wk - w) * 10**9 + 5) // 10
            w = wk
        fc_int = int(round(z / p * 1e9))
        sba_int = (19 * fc_int + 10) // 20
        expect[k] = (
            len(ev),
            round(z / 1e9, 9),
            round(p / 1e9, 9),
            round(fc_int / 1e9, 9),
            round(sba_int / 1e9, 9),
        )

    got = reg["parts_croston_forecast"].fn(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        n, z, p, fc, sba = expect[r["l_partkey"]]
        assert r["n_events"] == n
        assert r["size_est"] == pytest.approx(z, abs=1e-9)
        assert r["interval_est"] == pytest.approx(p, abs=1e-9)
        assert r["croston_forecast"] == pytest.approx(fc, abs=1e-9)
        assert r["sba_forecast"] == pytest.approx(sba, abs=1e-9)
        assert r["sba_forecast"] < r["croston_forecast"] or fc == 0


def test_croston_constant_demand_locks(spark):
    """Demand q every 2 weeks: z -> q, p -> 2, forecast -> q/2."""
    from diabetes_etl_spark.plans.relational import _croston  # noqa: F401
    import pyspark.sql.functions as F

    # replicate the walk directly on a synthetic weekly array
    df = spark.createDataFrame(
        [(1, wk, 40) for wk in range(0, 60, 2)],
        "l_partkey long, wk long, q long",
    )
    arrs = df.groupBy("l_partkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("wk"), F.col("q")))
        ).alias("ev"),
        F.count(F.lit(1)).alias("n_events"),
    )
    st = arrs.withColumn(
        "st",
        F.expr(
            "aggregate(slice(ev, 2, size(ev) - 1), "
            "named_struct('z', element_at(ev, 1).q "
            "* CAST(1000000000 AS BIGINT), "
            "'p', CAST(1000000000 AS BIGINT), "
            "'w', element_at(ev, 1).wk), "
            "(st, e) -> named_struct("
            "'z', (9 * st.z + e.q * CAST(1000000000 AS BIGINT) + 5) "
            "DIV 10, "
            "'p', (9 * st.p + (e.wk - st.w) "
            "* CAST(1000000000 AS BIGINT) + 5) DIV 10, "
            "'w', e.wk))"
        ),
    ).collect()[0]
    assert st["st"]["z"] == 40 * 10**9  # constant sizes lock exactly
    # interval approaches 2 from the p0=1 seed (29 updates of a=0.1)
    assert abs(st["st"]["p"] / 1e9 - 2.0) < 0.05
