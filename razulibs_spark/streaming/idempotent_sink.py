"""Exactly-once streaming sink via foreachBatch + keyed overwrite.

Spark's file sinks are append-only; exactly-once delivery for an
UPSERT-shaped target needs foreachBatch with an idempotent write. The
pattern here is the portable one (no Delta/Iceberg in this
environment): partition the target by a deterministic bucket of the
key and rewrite only the buckets touched by the micro-batch
(dynamic partition overwrite). Replaying a micro-batch rewrites the
same buckets with the same rows — idempotent by construction — so
restart-after-failure cannot duplicate (asserted by running the same
availableNow drain twice in tests/test_operators.py).

At scale: the bucket count bounds rewrite amplification (a micro-batch
touching k keys rewrites ≤ min(k, n_buckets) partitions, each
~1/n_buckets of the table); with a transactional table format the
same foreachBatch body becomes a MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_batch(
    batch: DataFrame, target_path: str, key: str, n_buckets: int = 16
) -> None:
    """Idempotently merge one micro-batch into a bucket-partitioned
    parquet target: read the touched buckets, anti-join out the
    incoming keys, union the batch, rewrite those buckets only.

    Crash posture: the merged buckets are written to a staging
    directory FIRST (so the job never reads from the path it is
    overwriting, and a mid-job failure leaves the target untouched),
    then each touched bucket directory is swapped in with a filesystem
    rename. A crash between renames leaves every bucket either fully
    old or fully new — and replaying the micro-batch (which streaming
    restart does) re-merges and re-swaps, converging to the correct
    state. Renames go through the Hadoop FileSystem API, so the
    atomic-per-bucket claim holds on local FS and HDFS; on object
    stores without atomic rename the sink degrades to
    at-least-once-per-bucket during the swap window and a
    transactional table format (MERGE in Delta/Iceberg) is the right
    sink instead.
    """
    spark = batch.sparkSession
    # int cast: the partition column reads back as int, and union
    # requires matching types across the two sides.
    withb = batch.withColumn(
        "_bucket", F.pmod(F.xxhash64(key), n_buckets).cast("int")
    )
    touched = [r["_bucket"] for r in withb.select("_bucket").distinct().collect()]
    if not touched:
        return
    from pyspark.errors import AnalysisException

    try:
        # _bucket comes back as the partition column of the target
        existing = (
            spark.read.parquet(target_path)
            .filter(F.col("_bucket").isin(touched))
            .join(withb.select(key).distinct(), key, "left_anti")
        )
        merged = existing.unionByName(withb, allowMissingColumns=False)
    except AnalysisException:  # first batch: target does not exist yet
        merged = withb

    staging = target_path.rstrip("/") + "_staging"
    (
        merged.repartition("_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(target_path).getFileSystem(conf)
    fs.mkdirs(hpath(target_path))
    for b in touched:
        src = hpath(f"{staging}/_bucket={b}")
        dst = hpath(f"{target_path}/_bucket={b}")
        if fs.exists(dst):
            fs.delete(dst, True)
        fs.rename(src, dst)
    fs.delete(hpath(staging), True)


def stream_upsert_events(
    spark: SparkSession, source_dir: str, target_path: str, n_buckets: int = 16
):
    """readStream(events) → foreachBatch idempotent upsert keyed by
    event_id. Returns the started query (availableNow trigger)."""
    from razulibs_spark.streaming.events_stream import read_events_stream

    def _sink(batch: DataFrame, batch_id: int) -> None:
        upsert_batch(batch, target_path, "event_id", n_buckets=n_buckets)

    return (
        read_events_stream(spark, source_dir)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
