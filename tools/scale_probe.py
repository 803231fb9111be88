"""10x scale spot-check for registered queries (the SCALE.md recipe):
replicate documents 10x with id offsets + copytags and embeddings 10x
PERTURBED (deterministic per-copy direction shift, round-7 VERDICT #9),
then time each named query at sf0.1 and at 10x, min-of-2 each, and
print `RESULT name: sf0.1=..s 10x=..s xlin=..` (xlin < 1 means
sublinear vs 10x-linear scaling).

Usage: python tools/scale_probe.py [query ...]
"""
import importlib
import os
import pkgutil
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import diabetes_etl_spark.plans as plans  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402

for m in pkgutil.iter_modules(plans.__path__):
    importlib.import_module(f"diabetes_etl_spark.plans.{m.name}")
from diabetes_etl_spark.plans.registry import _REGISTRY  # noqa: E402


def main() -> None:
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    # non-replicated tables link through at 1x so any query can run
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name not in (
            "documents.parquet", "embeddings.parquet"
        ):
            os.symlink(
                os.path.join(sf_dir, name), os.path.join(tmp, name)
            )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reduce(DataFrame.unionByName, [
        docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{k}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for k in range(10)
    ]).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    def perturb(k):
        return lambda x, i: (
            x + F.lit(0.013 * k)
            * F.cos(i.cast("double") * F.lit(1.7) + F.lit(float(k)))
        ).cast("float")

    reduce(DataFrame.unionByName, [
        emb.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            F.transform("embedding", perturb(k)).alias("embedding"),
            "label",
        )
        for k in range(10)
    ]).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    for name in sys.argv[1:]:
        res = {}
        for tag, d in [("sf0.1", sf_dir), ("10x", tmp)]:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                _REGISTRY[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                s = round(time.perf_counter() - t0, 3)
                best = s if best is None else min(best, s)
            res[tag] = best
        xlin = round(res["10x"] / (10 * res["sf0.1"]), 2)
        print(
            f"RESULT {name}: sf0.1={res['sf0.1']}s 10x={res['10x']}s "
            f"xlin={xlin}",
            flush=True,
        )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
