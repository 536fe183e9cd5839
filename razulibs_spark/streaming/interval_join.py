"""Stream-stream interval join — watermarked two-sided state.

Attribution shape: each purchase joins the same user's views from the
preceding hour. Both sides are watermarked so the join state is
bounded: a buffered view can be evicted once the watermark passes
view.ts + 1 hour (no purchase can arrive that would still match it),
which is exactly the state-cleanup contract Spark derives from the
time-range join condition. Batch equivalence is asserted in
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from razulibs_spark.streaming.events_stream import read_events_stream


def _typed_stream(spark: SparkSession, source_dir: str, event_type: str, prefix: str):
    s = (
        read_events_stream(spark, source_dir)
        .filter(F.col("event_type") == event_type)
    )
    return s.select(
        F.col("event_id").alias(f"{prefix}_id"),
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("value").alias(f"{prefix}_value"),
    )


def view_purchase_join_stream(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """views ⋈ purchases per user where purchase lands within 1 hour
    after the view — both sides watermarked, append-mode output."""
    views = _typed_stream(spark, source_dir, "view", "view").withWatermark(
        "view_ts", watermark
    )
    purchases = _typed_stream(spark, source_dir, "purchase", "p").withWatermark(
        "p_ts", watermark
    )
    return views.join(
        purchases,
        (F.col("view_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("view_ts"))
        & (F.col("p_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("view_id", "view_user", "view_ts", "p_id", "p_ts", "p_value")


def view_purchase_left_outer_stream(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER variant: every view emits — joined rows as matches
    arrive, unmatched views with NULL purchase columns once the
    watermark passes view_ts + 1 hour (no purchase can still match,
    so the engine evicts the buffered view AND emits the null row).
    This is the state-eviction contract outer stream-stream joins add
    on top of inner ones: the null result is itself watermark-gated.

    Under availableNow the final watermark stops at max(event time) -
    watermark, so views newer than that remain buffered and emit
    nothing — the batch-equivalence test accounts for exactly that
    horizon.
    """
    views = _typed_stream(spark, source_dir, "view", "view").withWatermark(
        "view_ts", watermark
    )
    purchases = _typed_stream(spark, source_dir, "purchase", "p").withWatermark(
        "p_ts", watermark
    )
    return views.join(
        purchases,
        (F.col("view_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("view_ts"))
        & (F.col("p_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("view_id", "view_user", "view_ts", "p_id", "p_ts", "p_value")
