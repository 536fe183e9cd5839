"""Custom stateful streaming operator — gap-based sessionization via
applyInPandasWithState (SURVEY.md §2.10; the streaming twin of the
batch `events_sessionize` lag+running-sum plan in queries.py).

Semantics (identical to batch): per user, consecutive events belong to
one session while the gap ≤ `gap_us`; a larger gap closes the session.
A closed session emits exactly once, when the event that overruns the
gap arrives (same-user ordering is guaranteed by the per-group sort)
or when the event-time timer fires past the watermark. State per user
is one open session (4 scalars) — bounded, skew-proof, and evicted on
close; 10⁹ users is 10⁹ × 32 bytes of state, not 10⁹ event buffers.

Sums use the same fixed-point accumulation as functions/scalars.dec_sum
(scaled-integer adds), so streamed session sums are bit-identical to
the batch plan's — accumulation order cannot perturb them.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from razulibs_spark.streaming.events_stream import read_events_stream

GAP_US = 86_400_000_000  # 1 day, matching the batch query
_SCALE = 10_000  # dec_sum fixed-point scale (scalars.py)

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, session_start timestamp_ntz, "
    "session_end timestamp_ntz, sum_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint, sv bigint"


def _emit(user_id: int, start: int, last: int, n: int, sv: int) -> dict:
    return {
        "user_id": user_id,
        "n_events": n,
        "session_start": pd.Timestamp(start, unit="us"),
        "session_end": pd.Timestamp(last, unit="us"),
        "sum_value": float(sv) / _SCALE,
    }


def _sessionize_group(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out: list[dict] = []
    if state.hasTimedOut:
        start, last, n, sv = state.get
        out.append(_emit(user_id, start, last, n, sv))
        state.remove()
    else:
        events = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        open_sess = state.get if state.exists else None
        for ts_us, value in zip(events["ts_us"], events["value"]):
            inc = int((value * _SCALE + 0.5) // 1)  # floor(x·10⁴ + ½), as dec_sum
            if open_sess is None:
                open_sess = (ts_us, ts_us, 1, inc)
            elif ts_us - open_sess[1] > GAP_US:
                out.append(_emit(user_id, *open_sess))
                open_sess = (ts_us, ts_us, 1, inc)
            else:
                open_sess = (open_sess[0], ts_us, open_sess[2] + 1,
                             open_sess[3] + inc)
        state.update(tuple(int(x) for x in open_sess))
        # Event-time timer: close the open session once the watermark
        # passes last + gap (continuous mode); under availableNow the
        # final open session stays in state by design.
        state.setTimeoutTimestamp((open_sess[1] + GAP_US) // 1000)
    yield pd.DataFrame(out, columns=[
        "user_id", "n_events", "session_start", "session_end", "sum_value"])


def sessionize_stream(
    spark: SparkSession, source_dir: str, watermark: str = "0 seconds"
) -> DataFrame:
    """readStream(events) → watermark → per-user stateful sessionizer."""
    stream = (
        read_events_stream(spark, source_dir)
        # NTZ → epoch micros: the session tz is UTC, so the LTZ cast is
        # a pure reinterpretation (unix_micros rejects NTZ directly).
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_available_now(spark: SparkSession, source_dir: str) -> DataFrame:
    """Drain the sessionizer with Trigger.AvailableNow into an
    append-mode memory sink; returns the emitted (closed) sessions."""
    import uuid

    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(spark, source_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def session_window_stream(
    spark: SparkSession, source_dir: str, gap: str = "24 hours",
    watermark: str = "0 seconds",
) -> DataFrame:
    """The BUILT-IN alternative to the custom stateful sessionizer:
    ``F.session_window`` merges events within ``gap`` into one growing
    window natively (state handled by the engine's streaming session
    operator — no Python state function, no per-group pandas
    round-trip). Same gap semantics as the batch lag+running-sum plan:
    a new session starts exactly when the inter-event gap exceeds
    ``gap``; equivalence is pinned in tests.

    Prefer this operator when the per-session output is aggregate-
    shaped (counts/sums/min/max); drop to applyInPandasWithState only
    for custom per-event state machines the aggregate API can't
    express.
    """
    from razulibs_spark.streaming.events_stream import read_events_stream

    stream = read_events_stream(spark, source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(
                F.floor(F.col("value") * _SCALE + F.lit(0.5)).cast("long")
            ).alias("_sv"),
        )
        .select(
            "user_id", "n_events", "session_start", "session_end",
            (F.col("_sv") / _SCALE).alias("sum_value"),
        )
    )


def run_session_window_available_now(
    spark: SparkSession, source_dir: str
) -> DataFrame:
    """Drain the native session-window aggregation (complete mode via
    availableNow into a memory sink) and return the batch result."""
    import uuid

    name = f"sw_{uuid.uuid4().hex[:8]}"
    q = (
        session_window_stream(spark, source_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
