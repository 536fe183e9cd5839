"""Bucketed parquet sink + co-located join — the storage-layout half
of the 100 TB join story.

A fact-fact join (e.g. orders ⋈ lineitem on the order key) shuffles
both sides every time it runs. Writing both tables bucketed by the
join key moves that shuffle to WRITE TIME, once: every subsequent
join of the two tables reads bucket i of each side into the same
task — zero Exchange in the plan, verified by
tests/test_scale_plans.py::test_bucketed_join_has_no_shuffle.

At cluster scale this is the difference between re-shuffling 100 TB
per query and never shuffling it again; the same layout also makes
grouped aggregates on the bucket key exchange-free. Spark requirements
baked in here:
- `bucketBy` only works through `saveAsTable` (metastore-backed;
  plain `parquet(path)` writes ignore bucketing),
- both sides must have the same bucket count (or a multiple, with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`),
- `sortBy` within buckets lets the join skip the per-task sort too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write `df` as a bucketed (and optionally bucket-sorted)
    parquet table registered in the session catalog."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: both sides
    scan bucket-aligned, so the plan contains no shuffle Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)
