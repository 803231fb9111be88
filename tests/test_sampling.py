"""Unit tests for operators/sampling.py (round-3 VERDICT #1/#2: the
module shipped with zero importers/tests; oracle pairing lives in
tests/test_oracle.py via the corpus_* queries — these cover the
boundary math and the determinism contracts directly."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.sampling import (
    chunk_documents,
    portable_unit_hash,
    repeat_sample,
    stratified_sample,
    training_shuffle,
)


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=t) for i, t in enumerate(texts)]
    )


# -- chunk_documents boundary math ----------------------------------------


def test_chunk_boundaries_with_overlap(spark):
    # 10 tokens, chunk 4, overlap 1 -> step 3, n_chunks = ceil(9/3) = 3
    text = " ".join(f"t{i}" for i in range(10))
    rows = {
        r.chunk_idx: r
        for r in chunk_documents(
            _docs(spark, [text]), chunk_tokens=4, overlap=1
        ).collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[2].chunk_text == "t6 t7 t8 t9"
    assert [rows[i].n_tokens for i in range(3)] == [4, 4, 4]


def test_chunk_short_doc_yields_single_chunk(spark):
    rows = chunk_documents(
        _docs(spark, ["only two"]), chunk_tokens=64, overlap=8
    ).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0
    assert rows[0].chunk_text == "only two"
    assert rows[0].n_tokens == 2


def test_chunk_exact_multiple_no_empty_tail(spark):
    # 8 tokens, chunk 4, overlap 0: exactly 2 chunks, never a 3rd empty
    text = " ".join(f"t{i}" for i in range(8))
    rows = chunk_documents(
        _docs(spark, [text]), chunk_tokens=4, overlap=0
    ).collect()
    assert len(rows) == 2
    assert all(r.n_tokens == 4 for r in rows)


def test_chunk_ragged_last_chunk_shorter(spark):
    # 9 tokens, chunk 4, overlap 0 -> chunks of 4, 4, 1
    text = " ".join(f"t{i}" for i in range(9))
    rows = sorted(
        chunk_documents(
            _docs(spark, [text]), chunk_tokens=4, overlap=0
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.n_tokens for r in rows] == [4, 4, 1]
    assert rows[2].chunk_text == "t8"


def test_chunk_rejects_bad_overlap(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=-1)


def test_chunks_cover_every_token(spark):
    """Every source token appears in at least one chunk (no gaps)."""
    text = " ".join(f"t{i}" for i in range(50))
    out = chunk_documents(
        _docs(spark, [text]), chunk_tokens=8, overlap=3
    ).collect()
    seen = set()
    for r in out:
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"t{i}" for i in range(50)}


# -- stratified_sample ----------------------------------------------------


def _corpus(spark, n=400):
    langs = ["en", "fr", "de", "zh"]
    return spark.createDataFrame(
        [Row(doc_id=i, lang=langs[i % 4], text=f"doc {i}") for i in range(n)]
    )


def test_stratified_rates_roughly_hold(spark):
    df = _corpus(spark)
    out = (
        stratified_sample(df, {"en": 1.0, "fr": 0.5, "de": 0.0}, seed=17)
        .groupBy("lang")
        .count()
        .collect()
    )
    by_lang = {r.lang: r["count"] for r in out}
    assert by_lang.get("en") == 100  # rate 1.0 keeps everything
    assert by_lang.get("de") is None  # rate 0 drops the stratum
    assert by_lang.get("zh") is None  # default_rate 0 drops unknowns
    assert 30 <= by_lang.get("fr", 0) <= 70  # ~0.5 of 100


def test_stratified_rate_above_one_caps(spark):
    df = _corpus(spark)
    n_en = df.filter("lang = 'en'").count()
    out = stratified_sample(df, {"en": 7.5}, seed=17)
    assert out.filter("lang = 'en'").count() == n_en


def test_stratified_selection_is_partition_invariant(spark):
    df = _corpus(spark)
    ids_1 = {
        r.doc_id
        for r in stratified_sample(df.coalesce(1), {"en": 0.4}, seed=5)
        .select("doc_id").collect()
    }
    ids_16 = {
        r.doc_id
        for r in stratified_sample(df.repartition(16), {"en": 0.4}, seed=5)
        .select("doc_id").collect()
    }
    assert ids_1 == ids_16, "selection must not depend on partitioning"


def test_unit_hash_uniform_enough(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    buckets = (
        df.select(
            (portable_unit_hash(F.col("doc_id"), 3) * 10)
            .cast("int").alias("b")
        )
        .groupBy("b").count().collect()
    )
    counts = {r.b: r["count"] for r in buckets}
    assert sorted(counts) == list(range(10))
    assert all(120 <= c <= 280 for c in counts.values()), counts


# -- repeat_sample --------------------------------------------------------


def test_repeat_sample_integer_rate_exact_copies(spark):
    df = _corpus(spark, n=100)
    out = repeat_sample(df, {"en": 3.0}, seed=23, default_rate=0.0)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)
    assert {r.copy_idx for r in out.collect()} == {0, 1, 2}


def test_repeat_sample_fractional_rate_mixes_2_and_3(spark):
    df = _corpus(spark, n=400)  # 100 en docs
    out = repeat_sample(df, {"en": 2.3}, seed=23, default_rate=0.0)
    per_doc = {r.doc_id: r["count"] for r in out.groupBy("doc_id").count().collect()}
    assert set(per_doc.values()) <= {2, 3}
    n3 = sum(1 for v in per_doc.values() if v == 3)
    assert 10 <= n3 <= 50, f"~30% of 100 docs expected a 3rd copy, got {n3}"
    total = sum(per_doc.values())
    assert 200 <= total <= 260


def test_repeat_sample_rate_below_one_downsamples(spark):
    df = _corpus(spark, n=400)
    out = repeat_sample(df, {"en": 0.5}, seed=23, default_rate=0.0)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in per_doc)
    assert 30 <= len(per_doc) <= 70
    # and it selects EXACTLY the rows stratified_sample would (same rule)
    strat = {
        r.doc_id
        for r in stratified_sample(df, {"en": 0.5}, seed=23)
        .select("doc_id").collect()
    }
    assert {r.doc_id for r in per_doc} == strat


def test_repeat_sample_preserves_payload_columns(spark):
    df = _corpus(spark, n=8)
    out = repeat_sample(df, {"en": 2.0}, default_rate=1.0)
    assert set(out.columns) == {"doc_id", "lang", "text", "copy_idx"}


# -- training_shuffle -----------------------------------------------------


def test_training_shuffle_deterministic_and_balanced(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = training_shuffle(df, n_shards=8, seed=29).collect()
    b = training_shuffle(df.repartition(13), n_shards=8, seed=29).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        assert r.shard == r.shuffle_key % 8
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert sorted(by_shard) == list(range(8))
    assert all(85 <= c <= 165 for c in by_shard.values()), by_shard


def test_training_shuffle_decorrelates_source_order(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    rows = training_shuffle(df, n_shards=4, seed=29).collect()
    order_of = {r.doc_id: r.shuffle_key for r in rows}
    # consecutive source ids should land far apart in shuffle order:
    # count adjacent-id pairs that stay adjacent by key rank
    ranked = sorted(order_of, key=order_of.get)
    pos = {doc: i for i, doc in enumerate(ranked)}
    adjacent = sum(1 for i in range(999) if abs(pos[i] - pos[i + 1]) == 1)
    assert adjacent < 20, f"{adjacent} source-adjacent pairs stayed adjacent"


def test_training_shuffle_keeps_payload_and_rejects_bad_shards(spark):
    df = _corpus(spark, n=10)
    out = training_shuffle(df, n_shards=2)
    assert set(out.columns) == {
        "doc_id", "lang", "text", "shuffle_key", "shard"
    }
    with pytest.raises(ValueError, match="n_shards"):
        training_shuffle(df, n_shards=0)


def test_pack_sequences_boundary_semantics(spark):
    from diabetes_etl_spark.operators.sampling import pack_sequences

    # one shard, fixed order: tokens 100, 100, 100 with budget 250 —
    # doc c starts at offset 200 and crosses into the next sequence
    df = spark.createDataFrame(
        [(1, 0, 1, 100), (2, 0, 2, 100), (3, 0, 3, 100)],
        "doc_id long, shard int, shuffle_key long, n_tokens long",
    )
    rows = {
        r.doc_id: (r.seq_id, r.seq_offset, r.crosses_boundary)
        for r in pack_sequences(df, budget=250).collect()
    }
    assert rows[1] == (0, 0, False)
    assert rows[2] == (0, 100, False)
    assert rows[3] == (0, 200, True)  # 200+100 > 250: straddles seq 0/1

    # a doc landing exactly ON the boundary starts the next sequence
    df2 = spark.createDataFrame(
        [(1, 0, 1, 250), (2, 0, 2, 10)],
        "doc_id long, shard int, shuffle_key long, n_tokens long",
    )
    rows2 = {
        r.doc_id: (r.seq_id - 0, r.seq_offset, r.crosses_boundary)
        for r in pack_sequences(df2, budget=250).collect()
    }
    assert rows2[1] == (0, 0, False)
    assert rows2[2] == (1, 0, False)


def test_pack_sequences_guards(spark):
    import pytest as _pytest

    from diabetes_etl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 0, 1, 10)],
        "doc_id long, shard int, shuffle_key long, n_tokens long",
    )
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    packed = pack_sequences(df, budget=16)
    with _pytest.raises(ValueError, match="seq_id"):
        pack_sequences(packed, budget=16)


# -- temperature_mix -------------------------------------------------------


def _skewed_corpus(spark):
    # 40 'en' docs of 100 chars, 10 'fr' of 100, 5 'zh' of 100
    rows = [(i, "en", 100) for i in range(40)]
    rows += [(100 + i, "fr", 100) for i in range(10)]
    rows += [(200 + i, "zh", 100) for i in range(5)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    )


def test_temperature_mix_flattens_skew(spark):
    from diabetes_etl_spark.operators.sampling import temperature_mix

    out = temperature_mix(_skewed_corpus(spark)).collect()
    rates = {r.lang: r.mix_rate for r in out}
    # sqrt-temperature: the dominant stratum is downsampled, the rare
    # one upsampled, and rates order inversely to stratum size
    assert rates["en"] < 1 < rates["zh"]
    assert rates["en"] < rates["fr"] < rates["zh"]
    # the total char budget is approximately conserved (multiplicity
    # rounding moves it by at most one doc per stratum)
    kept = sum(r.n_chars for r in out)
    assert abs(kept - 5500) <= 300


def test_temperature_mix_alpha1_is_natural_distribution(spark):
    from diabetes_etl_spark.operators.sampling import temperature_mix

    out = temperature_mix(_skewed_corpus(spark), alpha=1.0).collect()
    assert all(abs(r.mix_rate - 1.0) < 1e-9 for r in out)


def test_temperature_mix_partition_invariant_bit_identical(spark):
    from diabetes_etl_spark.operators.sampling import temperature_mix

    df = _skewed_corpus(spark)
    a = sorted(
        (r.doc_id, r.copy_idx, r.mix_rate)
        for r in temperature_mix(df).collect()
    )
    b = sorted(
        (r.doc_id, r.copy_idx, r.mix_rate)
        for r in temperature_mix(df.repartition(13)).collect()
    )
    assert a == b


def test_temperature_mix_rejects_clashing_columns(spark):
    import pytest

    from diabetes_etl_spark.operators.sampling import temperature_mix

    df = _skewed_corpus(spark).withColumn("copy_idx", F.lit(0))
    with pytest.raises(ValueError, match="copy_idx"):
        temperature_mix(df)


# -- fixed_size_sample -----------------------------------------------------


def test_fixed_size_sample_exact_k_per_stratum(spark):
    from diabetes_etl_spark.operators.sampling import fixed_size_sample

    df = _skewed_corpus(spark)  # en:40 fr:10 zh:5
    out = fixed_size_sample(df, 8).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r.sample_rank)
    assert len(by["en"]) == 8 and sorted(by["en"]) == list(range(1, 9))
    assert len(by["fr"]) == 8
    assert len(by["zh"]) == 5  # stratum smaller than k: all rows, no pad


def test_fixed_size_sample_partition_invariant_and_stable(spark):
    from diabetes_etl_spark.operators.sampling import fixed_size_sample

    df = _skewed_corpus(spark)
    a = sorted(
        (r.lang, r.doc_id, r.sample_rank)
        for r in fixed_size_sample(df, 6).collect()
    )
    b = sorted(
        (r.lang, r.doc_id, r.sample_rank)
        for r in fixed_size_sample(df.repartition(13), 6).collect()
    )
    assert a == b
    # growth stability: adding rows only displaces where the new ids
    # hash below the old k-th — the k=6 'en' sample is a prefix of the
    # k=8 one
    eight = {
        r.doc_id
        for r in fixed_size_sample(df, 8).collect()
        if r.lang == "en"
    }
    six = {r[1] for r in a if r[0] == "en"}
    assert six < eight


def test_temperature_mix_zero_weight_stratum_rate_zero(spark):
    """A stratum whose rows carry no weight (empty docs) must get rate
    0 and drop out — not a 0/0 NaN that the ANSI floor->int cast
    turns into a job kill."""
    from diabetes_etl_spark.operators.sampling import temperature_mix

    rows = [(i, "en", 100) for i in range(10)]
    rows += [(100 + i, "xx", 0) for i in range(3)]  # weightless stratum
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = temperature_mix(df).collect()
    assert all(r.lang == "en" for r in out)        # xx dropped entirely
    assert {r.doc_id for r in out} <= set(range(10))


# -- weighted_sample (A-Res, round-7) ----------------------------------------


def _ref_weighted(rows, k, seed):
    """Pure-Python A-Res replay: rows = [(id, w)]."""
    import math

    from diabetes_etl_spark.operators.sampling import _MIX_A, _MIX_C, _MOD

    keyed = []
    for i, w in rows:
        if w is None or w <= 0:
            continue
        mix = (((i + seed) % _MOD) * _MIX_A + _MIX_C) % _MOD
        u = (mix + 1) / (_MOD + 1)
        keyed.append((round(math.log(u) / w, 9), -i))
    keyed.sort(reverse=True)
    return [-ni for _, ni in keyed[:k]]


def test_weighted_sample_matches_reference(spark):
    from diabetes_etl_spark.operators.sampling import weighted_sample

    rows = [(i, float(10 + 13 * (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        r.doc_id
        for r in weighted_sample(df, 15, "w", seed=11)
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == _ref_weighted(rows, 15, 11)


def test_weighted_sample_drops_nonpositive_and_null(spark):
    from diabetes_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 5.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_weighted_sample_bias_toward_heavy_weights(spark):
    """Item with 50x the weight of the rest must win top-1 far more
    often across seeds (the A-Res inclusion-probability property)."""
    from diabetes_etl_spark.operators.sampling import weighted_sample

    rows = [(i, 500.0 if i == 7 else 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double").cache()
    wins = 0
    for seed in range(30):
        top = (
            weighted_sample(df, 1, "w", seed=seed)
            .collect()[0]
            .doc_id
        )
        wins += top == 7
    df.unpersist()
    # P(win) = 500/690 ~ 0.72; 30 trials, expect ~22; require > 15
    assert wins > 15, wins


def test_weighted_sample_partition_invariant(spark):
    from diabetes_etl_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 9)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [
        (r.doc_id, r.sample_key)
        for r in weighted_sample(df, 12, "w").orderBy("sample_rank").collect()
    ]
    b = [
        (r.doc_id, r.sample_key)
        for r in weighted_sample(df.repartition(17), 12, "w")
        .orderBy("sample_rank")
        .collect()
    ]
    assert a == b


def test_weighted_sample_plan_is_heap_topk(spark):
    """The selection must compile to TakeOrderedAndProject (per-
    partition k-row heaps) — not a global sort exchange."""
    from diabetes_etl_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = (
        weighted_sample(df, 10, "w")._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


# -- DSIR importance scores --------------------------------------------------


def _dsir_corpus(spark):
    # "good" docs share a vocabulary; "bad" docs use a disjoint one
    good = [
        (i, "the quick brown fox jumps over the lazy dog again", "tgt")
        for i in range(6)
    ]
    bad = [
        (10 + i, "zzz qqq www eee rrr ttt yyy uuu iii ooo", "raw")
        for i in range(6)
    ]
    return spark.createDataFrame(
        good + bad, "doc_id long, text string, kind string"
    )


def test_dsir_scores_rank_target_like_docs_higher(spark):
    from diabetes_etl_spark.operators.sampling import dsir_llr_scores

    docs = _dsir_corpus(spark)
    target = docs.filter("kind = 'tgt'")
    scored = {
        r.doc_id: r.log_weight
        for r in dsir_llr_scores(docs, target).collect()
    }
    good_w = [scored[i] for i in range(6)]
    bad_w = [scored[10 + i] for i in range(6)]
    assert min(good_w) > max(bad_w)


def test_dsir_short_docs_absent_and_counts_exact(spark):
    from diabetes_etl_spark.operators.sampling import dsir_llr_scores

    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b c d")],
        "doc_id long, text string",
    )
    out = dsir_llr_scores(docs, docs).collect()
    assert {r.doc_id for r in out} == {3}
    assert out[0].n_bigrams == 3


def test_dsir_partition_invariant(spark):
    from diabetes_etl_spark.operators.sampling import dsir_llr_scores

    docs = _dsir_corpus(spark)
    target = docs.filter("kind = 'tgt'")
    a = sorted(map(tuple, dsir_llr_scores(docs, target).collect()))
    b = sorted(
        map(
            tuple,
            dsir_llr_scores(docs.repartition(7), target.coalesce(1)).collect(),
        )
    )
    assert a == b


def test_dsir_composes_with_weighted_sample(spark):
    """The published pipeline: importance scores -> weighted resample.
    exp(log_weight) is a valid A-Res weight; the heaviest-score doc
    must be likeliest to appear first across seeds."""
    from diabetes_etl_spark.operators.sampling import (
        dsir_llr_scores,
        weighted_sample,
    )
    from pyspark.sql import functions as F

    docs = _dsir_corpus(spark)
    scored = dsir_llr_scores(docs, docs.filter("kind = 'tgt'")).withColumn(
        "w", F.exp("log_weight")
    )
    picked = weighted_sample(scored, 3, weight_col="w")
    assert picked.count() == 3
    # every selected doc is from the target-like half: their weights
    # dominate by construction (disjoint vocabularies)
    assert all(r.doc_id < 10 for r in picked.collect())


# -- calibrated quantile-threshold filtering ---------------------------------


def test_quantile_filter_calibrates_per_group(spark):
    """Two groups with shifted score distributions must EACH retain
    ~keep_frac — the property a fixed global threshold lacks."""
    from diabetes_etl_spark.operators.sampling import (
        quantile_threshold_filter,
    )

    rows = [(i, "hi", 0.8 + i / 1000.0) for i in range(100)] + [
        (200 + i, "lo", 0.1 + i / 1000.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, s double")
    kept = quantile_threshold_filter(df, "s", "grp", 0.4)
    by_grp = {
        r.grp: r.n
        for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    # exact percentile of 100 distinct values at q=0.6 -> 40 or 41 kept
    assert 40 <= by_grp["hi"] <= 41
    assert 40 <= by_grp["lo"] <= 41
    # a fixed threshold at the hi-group's cut would keep ZERO lo rows
    assert kept.filter("grp = 'lo'").count() > 0


def test_quantile_filter_ties_all_keep_and_nulls_drop(spark):
    from diabetes_etl_spark.operators.sampling import (
        quantile_threshold_filter,
    )

    df = spark.createDataFrame(
        [(1, "g", 0.5), (2, "g", 0.5), (3, "g", 0.5), (4, "g", 0.1),
         (5, "g", None)],
        "doc_id long, grp string, s double",
    )
    kept = quantile_threshold_filter(df, "s", "grp", 0.5)
    ids = {r.doc_id for r in kept.collect()}
    # threshold lands in the 0.5 tie mass -> all three keep; NULL drops
    assert ids == {1, 2, 3}


def test_quantile_filter_rejects_bad_frac(spark):
    import pytest

    from diabetes_etl_spark.operators.sampling import (
        quantile_threshold_filter,
    )

    df = spark.createDataFrame([(1, "g", 0.5)], "doc_id long, grp string, s double")
    with pytest.raises(ValueError, match="keep_frac"):
        quantile_threshold_filter(df, "s", "grp", 0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        quantile_threshold_filter(df, "s", "grp", 1.5)


# -- UniMax budget allocation ------------------------------------------------


def _unimax_ref(supplies, budget):
    """Pure-Python water-fill: allocations per stratum."""
    order = sorted(supplies.items(), key=lambda kv: (kv[1], kv[0]))
    L = len(order)
    cum = 0
    theta = None
    for i, (k, s) in enumerate(order):
        t = (budget - cum) / (L - i)
        if s >= t:
            theta = t
            break
        cum += s
    return {
        k: (float(s) if theta is None else min(float(s), theta))
        for k, s in supplies.items()
    }


def test_unimax_matches_waterfill_reference(spark):
    from diabetes_etl_spark.operators.sampling import unimax_allocation
    from pyspark.sql import functions as F

    # strata with 1, 2, 3, 20 docs of 4 tokens each
    rows = []
    did = 0
    for lang, n in [("aa", 1), ("bb", 2), ("cc", 3), ("dd", 20)]:
        for _ in range(n):
            rows.append((did, lang, "w x y z"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r.lang: r
        for r in unimax_allocation(df, epochs_cap=2).collect()
    }
    toks = {"aa": 4, "bb": 8, "cc": 12, "dd": 80}
    budget = (sum(toks.values()) * 3) // 2  # 156
    ref = _unimax_ref({k: 2 * v for k, v in toks.items()}, budget)
    for k, r in out.items():
        assert r.toks == toks[k]
        assert r.supply == 2 * toks[k]
        assert abs(r.allocated - ref[k]) < 1e-6, k
        assert r.epochs_used <= 2.0 + 1e-9
    # the budget is fully spent when supply exceeds it
    assert abs(sum(r.allocated for r in out.values()) - budget) < 1e-6
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-8


def test_unimax_budget_exceeds_supply(spark):
    """budget_num/den = 3/1 with cap 1: budget (3x total) exceeds the
    1-epoch supply -> every stratum fully allocated, weights < 1."""
    from diabetes_etl_spark.operators.sampling import unimax_allocation

    rows = [(0, "aa", "a b"), (1, "bb", "c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r.lang: r
        for r in unimax_allocation(
            df, epochs_cap=1, budget_num=3, budget_den=1
        ).collect()
    }
    assert out["aa"].allocated == 2.0
    assert out["bb"].allocated == 4.0
    assert sum(r.weight for r in out.values()) < 1.0


def test_unimax_partition_invariant(spark):
    from diabetes_etl_spark.operators.sampling import unimax_allocation

    rows = [
        (i, ["aa", "bb", "cc"][i % 3], " ".join(["t"] * (1 + i % 7)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, unimax_allocation(df).collect()))
    b = sorted(map(tuple, unimax_allocation(df.repartition(13)).collect()))
    assert a == b


# -- largest-remainder apportionment -------------------------------------------


def test_apportionment_sums_and_hamilton_rule(spark, sf_dir):
    from diabetes_etl_spark.plans.samplingplans import (
        mix_shard_apportionment,
        _APP_S,
    )

    rows = mix_shard_apportionment(spark, sf_dir).collect()
    assert sum(r.shards for r in rows) == _APP_S  # exact apportionment
    tot = sum(r.toks for r in rows)
    for r in rows:
        # Hamilton stays within 1 of the exact quota (quota rule)
        exact = r.toks * _APP_S / tot
        assert r.base_shards <= r.shards <= r.base_shards + 1
        assert abs(r.shards - exact) < 1.0


def test_apportionment_known_split(spark, tmp_path):
    from diabetes_etl_spark.plans.samplingplans import (
        mix_shard_apportionment,
    )

    # toks 50/30/20 over 10 shards -> exact 5/3/2, no remainders
    rows = []
    did = 0
    for lang, n in [("aa", 50), ("bb", 30), ("cc", 20)]:
        for _ in range(n):
            rows.append((did, "w", lang, "s", 1)); did += 1
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    d = str(tmp_path / "app")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    # 50/30/20% of 64 shards -> exact quotas 32 / 19.2 / 12.8: floors
    # 32/19/12 leave one shard, which the largest remainder (cc, .8)
    # takes -> 32/19/13
    out = {r.lang: r.shards
           for r in mix_shard_apportionment(spark, d).collect()}
    assert sum(out.values()) == 64
    assert out["aa"] == 32 and out["bb"] == 19 and out["cc"] == 13
