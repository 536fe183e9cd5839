"""Table-maintenance operators: small-file compaction and Z-order
keys — the storage-health half of running a 100 TB lake.

Small files are the classic operational failure of long-running
ingest (every micro-batch writes a few KB; a year later the table has
10⁷ files and the NameNode/listing/scan-planning all crawl).
`compact_parquet` rewrites a table to ~target-sized files. The
Z-order key linearizes two dimensions so range predicates on EITHER
column cluster into few row groups — the data-skipping layout trick
transactional formats (Delta/Iceberg OPTIMIZE ZORDER) implement; here
it is a plain deterministic column you sort by at write time.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns
    the file count written. Sizing reads the INPUT's on-disk bytes
    (cheap listing, no data scan) — the right signal since parquet
    re-encodes at roughly the same ratio."""
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return n_files


def z_order_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two pre-bucketized non-negative
    int columns (each < 2^bits): bit i of x lands at position 2i, bit
    i of y at 2i+1. Pure Catalyst bit arithmetic — engine-portable
    (the DuckDB oracle spells the identical shifts), no UDF.

    Sort-by-z_order_key at write time clusters rows so min/max row-
    group stats prune on either dimension; the standard use is
    ``df.withColumn("z", z_order_key(bucket(a), bucket(b)))
    .repartitionByRange("z").sortWithinPartitions("z").write...``.
    """
    out = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(
            F.shiftleft(yb, 2 * i + 1)
        )
    return out
