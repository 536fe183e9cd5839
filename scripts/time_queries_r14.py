"""Time a list of registered queries with the noop sink (guide §1.4).
Usage: python scripts/time_queries_r14.py <label> <query> [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from razulibs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("R14_RUNS", "2"))


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    import razulibs_spark.queries as Q

    spark = get_spark("r14-timing")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"== {label} ==", flush=True)
    for name in names:
        fn = Q.QUERIES[name]
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"{label}:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        # Same posture as bench.py: caches released after each query's
        # runs so later queries don't inherit memory pressure.
        spark.catalog.clearCache()
        print(f"{best:8.3f}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
