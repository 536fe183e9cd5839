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
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
    duplicate_feed: bool = False,
) -> DataFrame:
    """readStream(events) → watermark(ts) → one row per event_id.

    Duplicate delivery of the same event_id within the watermark
    horizon is suppressed; state for an id is dropped once the
    watermark moves past its event time. ``duplicate_feed=True``
    unions a SECOND readStream of the same source — the at-least-once
    redelivery scenario the operator exists for: every event arrives
    twice and exactly one copy must survive, which is what lets the
    registry entry carry a strict batch oracle (dedup output ==
    events) instead of a rows-only check.
    """
    stream = read_events_stream(spark, source_dir)
    if duplicate_feed:
        stream = stream.unionByName(read_events_stream(spark, source_dir))
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_append_available_now(
    streaming_df: DataFrame,
    spark: SparkSession,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain an append-mode stream with Trigger.AvailableNow into a
    memory sink and return the materialized batch DataFrame.

    ``state_partitions`` sizes the stateful-operator partitioning
    (stream-stream join buffers, dedup state): every micro-batch runs
    one state-store task per partition per stateful operator, so a
    too-wide default is pure overhead (measured on the outer interval
    join drain at sf0.1: 13.0 s at 32 partitions vs 3.1 s at 8 — the
    state fits trivially). On a cluster, size it to state volume /
    ~200 MB per store, NOT to the batch shuffle width; it is fixed at
    the first checkpoint, which is why it is a knob here and not a
    constant. ``None`` keeps the session's shuffle width.
    """
    import uuid

    name = f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
