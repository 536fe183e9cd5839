"""Bucketed (co-located) storage — the shuffle-elimination technique
for repeated large-×-large joins at 100 TB.

The reference has no storage layer beyond flat files; at scale the
engine's manifest/fixity joins (J4/J5/J7) and entity↔triple joins
recur on the same keys every run. Persisting both sides bucketed on
the join key means every subsequent join is map-side co-located: zero
Exchange on either side (the Sort that remains is per co-located
partition over per-file-sorted data — cheap; Spark only elides it
under the legacy bucketedTableScan.outputOrdering flag). One shuffle
at write time is amortized over every later read — the batch analog
of an index.

Plan evidence: tests/test_scale_plans.py::test_bucketed_join_no_shuffle
asserts the join of two co-bucketed tables contains no Exchange
operator at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, key: str,
                  buckets: int = 32, sorted_by_key: bool = True) -> None:
    """Persist `df` as a parquet table bucketed (and optionally sorted)
    on `key`. Bucket count should match downstream parallelism — at
    1000 executors use O(1000) buckets, not 32."""
    # Pre-shuffle into exactly `buckets` partitions on the key: each
    # write task then owns one bucket, producing ONE file per bucket
    # (no small-file explosion at high write parallelism). Note the
    # downstream merge join still shows a Sort node — Spark ≥3.0 only
    # propagates bucket sort order under
    # spark.sql.legacy.bucketedTableScan.outputOrdering — but that
    # sort is per co-located partition over already-sorted files,
    # spill-free and cheap; the shuffle (the scale cost) is gone.
    writer = (
        df.repartition(buckets, key)
        .write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    )
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def co_located_join(spark: SparkSession, left: str, right: str,
                    key: str, how: str = "inner") -> DataFrame:
    """Join two tables previously saved with save_bucketed on the same
    key with the same bucket count — Catalyst recognizes the matching
    output partitioning and plans the join with no shuffle on either
    side."""
    return spark.table(left).join(spark.table(right), key, how)


def save_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Hive-style partitioned layout on low-cardinality keys — the
    manifest keys `(source, dataset)` (razu/manifest.py:53-54) are the
    natural choice: every incremental sync, fixity check, or ingest
    touches one dataset, and partition pruning turns those scans into
    directory lookups that never read the other 99.99% of a 100 TB
    store. Keys must be low-cardinality (thousands, not millions —
    one directory each); high-cardinality keys belong in bucketBy.

    Plan evidence: tests/test_scale_plans.py::test_partition_pruning
    asserts a filtered scan reads only the matching partition
    directories (PartitionFilters in the scan node)."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)
