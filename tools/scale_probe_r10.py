#!/usr/bin/env python
"""10x scale spot-check for the round-10 queries (SCALE.md rows).

Replicates the driving tables 10x with id offsets (documents get a
copytag token, embeddings a deterministic per-copy perturbation — the
bench.py scale10x conventions) into a temp dir, then times each query
at sf0.1 and at 10x, min-of-2, printing `name 1x 10x ratio-vs-linear`.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from diabetes_etl_spark.plans import all_queries  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "events_mad_outliers",
    "events_linear_interpolate",
    "events_wasserstein_drift",
    "events_mcnemar_purchase_shift",
    "text_jsd_token_drift",
    "retrieval_ndcg_bm25",
    "decontam_semantic_quarantine",
    "cluster_silhouette_kmeans",
    # er_jaro_winkler_pairs is EXCLUDED by design: a pair-scored
    # operator scales with PAIR COUNT, and replicating parts 10x
    # inside a fixed (brand, size) block set grows every block 10x
    # -> 100x pairs at ~10ms of interpreted fold per pair.  That
    # quadratic-in-block-size behavior is the documented contract
    # ("blocking-key selectivity is the scale knob"); a wall-clock
    # row would only re-measure the pair count.
    "orders_gini_customers",
    "basket_association_rules",
    "stats_poisson_bootstrap_ci_fold",
]


def replicate(spark, sf_dir: str, tmp: str) -> None:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reduce(
        DataFrame.unionByName,
        [
            ev.select(
                (F.col("event_id") + k * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + k * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for k in range(10)
        ],
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reduce(
        DataFrame.unionByName,
        [
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytag{k}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for k in range(10)
        ],
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def perturb(k: int):
        return lambda x, i: (
            x
            + F.lit(0.013 * k)
            * F.cos(i.cast("double") * F.lit(1.7) + F.lit(float(k)))
        ).cast("float")

    reduce(
        DataFrame.unionByName,
        [
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.transform("embedding", perturb(k)).alias("embedding"),
                "label",
            )
            for k in range(10)
        ],
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    reduce(
        DataFrame.unionByName,
        [
            part.select(
                (F.col("p_partkey") + k * 10_000_000).alias("p_partkey"),
                "p_name",
                "p_brand",
                "p_type",
                "p_size",
                "p_retailprice",
            )
            for k in range(10)
        ],
    ).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    for tbl, keys in (
        ("orders", {"o_orderkey", "o_custkey"}),
        ("lineitem", {"l_orderkey"}),
    ):
        base = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        reduce(
            DataFrame.unionByName,
            [
                base.select(
                    *[
                        (F.col(c) + k * 100_000_000).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in base.columns
                    ]
                )
                for k in range(10)
            ],
        ).write.mode("overwrite").parquet(f"{tmp}/{tbl}.parquet")
    for tbl in ("region", "nation", "customer", "supplier"):
        os.symlink(f"{sf_dir}/{tbl}.parquet", f"{tmp}/{tbl}.parquet")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe-r10")
    reg = all_queries(include_extended=True)
    tmp = tempfile.mkdtemp(prefix="scale10x_r10_")
    try:
        replicate(spark, sf_dir, tmp)

        def run(name, d):
            t0 = time.perf_counter()
            reg[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 2)

        # warm
        reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
        for name in QUERIES:
            run(name, "/root/testdata/sf0.001")
            t1 = min(run(name, sf_dir) for _ in range(2))
            t10 = min(run(name, tmp) for _ in range(2))
            print(
                f"{name}: 1x={t1}s 10x={t10}s "
                f"ratio_vs_linear={round(t10 / (10 * t1), 2)}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
