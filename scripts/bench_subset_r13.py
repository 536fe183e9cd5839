"""Isolated best-of-N timing for a subset of registry queries with the
noop sink (guide §1.4) — same construction+execution methodology as
bench.py but restricted to named targets, for before/after A-B runs.
Usage: python scripts/bench_subset_r13.py [runs] name [name ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from razulibs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    args = sys.argv[1:]
    runs = 3
    if args and args[0].isdigit():
        runs = int(args[0])
        args = args[1:]
    from razulibs_spark import queries as Q

    spark = get_spark("razulibs-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in args:
        fn = Q.QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{best:8.3f}  {name}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
