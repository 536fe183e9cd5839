"""Streaming exact-dedup — the at-least-once ingestion guard a
training-data pipeline needs in front of every append-only corpus.

``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
dedup state once the watermark passes the key's event time: bounded
state at any scale, unlike a plain ``dropDuplicates`` on a stream
(which retains every key forever). Batch equivalence is asserted in
tests/test_streaming.py (no late data in the static source, so the
streaming result must equal the batch distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from razulibs_spark.streaming.events_stream import read_events_stream


def dedup_stream(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """readStream(events) → watermark(ts) → one row per event_id.

    Duplicate delivery of the same event_id within the watermark
    horizon is suppressed; state for an id is dropped once the
    watermark moves past its event time.
    """
    stream = (
        read_events_stream(spark, source_dir)
    )
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_append_available_now(streaming_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Drain an append-mode stream with Trigger.AvailableNow into a
    memory sink and return the materialized batch DataFrame."""
    import uuid

    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
