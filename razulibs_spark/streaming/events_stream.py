"""Structured Streaming surface for the event log — SURVEY.md §2.10.

The reference writes its PREMIS event log in batch; the engine's
events table doubles as a streaming source: file-based readStream +
watermark + tumbling-window aggregation. `run_available_now` drains
everything currently in the source into a memory sink (deterministic,
test-friendly) and returns the batch result.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ts is timestamp[us] without timezone in the driver parquet — read it
# as TIMESTAMP_NTZ, exactly as the batch loader (tables.load) sees it,
# so streaming windows line up with batch oracles bit-for-bit.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based readStream over the events parquet — the single
    source shared by every streaming operator in this package.

    The parquet column is TIMESTAMP_NTZ, but Spark's event-time
    watermark only accepts TIMESTAMP (LTZ), so `ts` is cast once here;
    with the session timezone pinned to UTC the cast is a pure
    reinterpretation (identical wall-clock instants to the batch
    loader's NTZ values)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def hourly_rollup_stream(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """readStream → watermark(ts) → tumbling 1h window per event_type.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — late rows beyond it drop,
    which is the streaming contract the batch oracle can't express.
    """
    stream = read_events_stream(spark, source_dir)
    # Fixed-point sum (floor(v·10⁴+½) as BIGINT, divided once) — the
    # same dec_sum trick as the batch twin, so the streaming rollup is
    # summation-order independent and EXACTLY equals
    # events_hourly_rollup (which is what lets this entry share the
    # batch oracle instead of being a rows-only check).
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * F.lit(10_000) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("_sv"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            (F.col("_sv").cast("double") / F.lit(10_000.0)).alias(
                "sum_value"
            ),
        )
    )


def run_available_now(
    streaming_df: DataFrame,
    spark: SparkSession,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink
    and return the materialized batch DataFrame.

    ``state_partitions`` sizes stateful-operator partitioning — see
    dedup_stream.run_append_available_now for the measured rationale;
    it is fixed at the first checkpoint, so it must be set before the
    query starts."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
