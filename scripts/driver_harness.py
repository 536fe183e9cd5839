"""Driver-style end-to-end harness: entry() smoke + queries() vs
oracle_sql() DuckDB parity. Usage:

    python scripts/driver_harness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import importlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

from razulibs_spark.session import get_spark  # noqa: E402
from razulibs_spark.tables import TABLES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    mod = importlib.import_module("__spark_entry__")
    spark = get_spark("driver-harness", cpus=8)

    if not only:
        t0 = time.time()
        df = mod.entry(spark)
        n = df.count()
        print(f"entry rows: {n} in {time.time()-t0:.1f}s {df.schema.simpleString()}")
        assert n > 0

    qs, os_ = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        el = time.time() - t0
        if name not in os_:
            print(f"  {name}: rows-only ({len(sdf)}) {el:.1f}s")
            continue
        ddf = con.execute(os_[name]).df()
        cols = sorted(sdf.columns)
        ok = len(sdf) == len(ddf) and cols == sorted(ddf.columns)
        if ok:
            ok = (
                sdf[cols].astype(str).sort_values(cols, ignore_index=True)
                .equals(ddf[cols].astype(str).sort_values(cols, ignore_index=True))
            )
        print(f"  {name}: {len(sdf)} rows {el:.1f}s -> {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails.append(name)
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
