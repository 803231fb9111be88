"""One-shot driver-gate replica: run every oracle-paired registered query
on Spark and DuckDB at the gate scale factor and compare through the same
pandas path the driver uses (tests/pandas_compare.py).

Usage: python tools/audit_oracle.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from diabetes_etl_spark.plans import all_queries  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402
from tests.conftest import make_duck  # noqa: E402
from tests.pandas_compare import compare_frames  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark(app_name="audit-oracle", shuffle_partitions=16)
    duck = make_duck(sf)
    qs = all_queries(include_extended=True)
    names = [n for n, s in qs.items() if s.oracle]
    if prefixes:
        names = [n for n in names if n.startswith(prefixes)]
    bad: list[str] = []
    t_all = time.time()
    for n in names:
        t0 = time.time()
        try:
            spdf = qs[n].fn(spark, sf).toPandas()
            opdf = duck.execute(qs[n].oracle).fetchdf()
            probs = compare_frames(n, spdf, opdf)
        except Exception as e:  # noqa: BLE001
            probs = [f"{n}: EXC {type(e).__name__}: {e}"[:400]]
        if probs:
            bad.append(probs[0][:400])
            print("FAIL", probs[0][:400], flush=True)
        else:
            print(f"ok   {n} {time.time() - t0:.1f}s", flush=True)
    print(f"== {len(names) - len(bad)}/{len(names)} ok in {time.time() - t_all:.0f}s")
    for b in bad:
        print("BAD:", b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
