"""Stream-static enrichment join — the dimension-lookup pattern
(SURVEY J2's vocabulary broadcast) applied to a live stream.

The static side is a batch DataFrame loaded once; Spark re-plans the
join per micro-batch with the dimension broadcast, so the stream never
shuffles — the exact translation of the reference's per-row vocabulary
lookup (concept_resolver.py) into streaming form. Stateless (no
watermark needed in append mode). Batch equivalence asserted in
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from razulibs_spark.streaming.events_stream import read_events_stream


def enriched_events_stream(
    spark: SparkSession, source_dir: str, static_dim: DataFrame
) -> DataFrame:
    """readStream(events) ⋈ broadcast(static_dim) on the derived
    dimension key (user_id % 25 — the driver tables carry no user dim,
    so the mapping is synthesized deterministically)."""
    stream = (
        read_events_stream(spark, source_dir)
        .withColumn("_nkey", (F.col("user_id") % 25).cast("int"))
    )
    return stream.join(
        F.broadcast(static_dim), stream["_nkey"] == static_dim["n_nationkey"]
    ).select("event_id", "user_id", "ts", "event_type", "value", "n_name")
