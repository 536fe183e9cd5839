"""Temporal join operators the reference lacks and Spark has no
physical operator for: as-of join and binned range join.

SURVEY.md §2.3 notes razulibs has no range/as-of joins; these are the
engine extensions for event-log analytics (D6-shaped tables) built as
compositions of existing DataFrame ops — no Python row loop, no
cartesian product, one shuffle each.

As-of join: the classic sort-based formulation. Union both sides with
a side marker, sort within each key partition by (time, side), and
carry the most recent right-side payload forward with
``last(ignorenulls)`` over an unbounded-preceding row frame. Cost is
identical to a sort-merge join on the key (one Exchange + per-key
sort); per-key skew is bounded by that key's own row count, never by
a cross-product.

Binned range join: a point-in-interval join with no equality key
would plan as BroadcastNestedLoopJoin (a cross product refined by the
range predicate) — quadratic at scale. Instead each interval explodes
into the fixed-width bins it overlaps and each point maps to exactly
one bin, turning the range predicate into an equi-join on the bin id
(shuffle-partitionable, AQE-skew-splittable) refined by the exact
predicate. Every (point, interval) match lands in exactly one bin, so
no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_T = "_asof_t"
_SIDE = "_asof_side"
_LPAY = "_asof_left"
_RPAY = "_asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str | None = None,
    right_prefix: str = "matched_",
    inclusive: bool = True,
    tolerance: str | None = None,
    right_tiebreak: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, the most recent right row
    (per `on` key) with right_time <= left_time (strictly < when
    ``inclusive=False``). Unmatched left rows keep nulls — the same
    semantics as DuckDB's ``ASOF LEFT JOIN ... ON l.t >= r.t``.

    ``direction="forward"`` flips the search: the *earliest* right row
    with right_time >= left_time (DuckDB ``ON l.t <= r.t``; pandas
    ``merge_asof(direction="forward")``). Implementation is the same
    single sort-carry pass traversed in descending time order, so cost
    is identical. ``direction="nearest"`` picks whichever of the two
    is closer in time (exact ties go backward, the pandas rule) — two
    carries over one unioned frame, so still no self-join.

    ``tolerance`` (an INTERVAL string, e.g. ``"1 hour"``) nulls the
    match when it is older than left_time − tolerance — pandas
    ``merge_asof(tolerance=...)`` semantics, applied as a plain
    post-projection (the carried match is already at hand, so the
    bound costs no extra pass).

    When multiple right rows share the same (key, time), the carried
    match among them is otherwise arbitrary — pass ``right_tiebreak``
    (right column names, ascending; the LAST row in that order wins)
    to pin it deterministically.

    Output: every left column, plus each right column (except the key)
    prefixed with ``right_prefix``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if direction == "nearest":
        # Both carries run over the SAME unioned frame (two windows on
        # one partition key — two sorts, zero self-joins), then each
        # left row picks the closer match; exact-distance ties go
        # BACKWARD (pandas merge_asof(direction="nearest") convention).
        return _asof_nearest(
            left, right, on, left_time, right_time, right_prefix,
            inclusive, tolerance, right_tiebreak,
        )
    fwd = direction == "forward"
    rt = right_time or left_time
    r_cols = [c for c in right.columns if c != on]
    # At equal timestamps the right row must be visible iff inclusive:
    # in traversal order (time asc for backward, desc for forward) the
    # right row sorts before the left (0 < 1) when inclusive.
    l_side, r_side = (1, 0) if inclusive else (0, 1)

    tb = right_tiebreak or []
    null_tb = [F.lit(None).cast(right.schema[c].dataType.simpleString()) for c in tb]
    lhs = left.select(
        F.col(on),
        F.col(left_time).alias(_T),
        F.lit(l_side).alias(_SIDE),
        *[c.alias(f"_tb_{name}") for c, name in zip(null_tb, tb)],
        F.struct(*[F.col(c) for c in left.columns]).alias(_LPAY),
    )
    rhs = right.select(
        F.col(on),
        F.col(rt).alias(_T),
        F.lit(r_side).alias(_SIDE),
        *[F.col(c).alias(f"_tb_{c}") for c in tb],
        F.struct(*[F.col(c) for c in r_cols]).alias(_RPAY),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    t_ord = F.col(_T).desc() if fwd else F.col(_T).asc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_ord, _SIDE, *[F.col(f"_tb_{c}").asc_nulls_last() for c in tb])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(_RPAY, F.last(_RPAY, ignorenulls=True).over(w))
    if tolerance is not None:
        matched_t = F.col(f"{_RPAY}.{rt}") if rt in r_cols else None
        if matched_t is None:
            raise ValueError(
                "tolerance requires right_time to be a right-side column"
            )
        in_bound = (
            matched_t <= F.col(_T) + F.expr(f"INTERVAL {tolerance}")
            if fwd
            else matched_t >= F.col(_T) - F.expr(f"INTERVAL {tolerance}")
        )
        carried = carried.withColumn(
            _RPAY, F.when(in_bound, F.col(_RPAY))
        )

    out = carried.filter(F.col(_SIDE) == l_side).select(
        *[F.col(f"{_LPAY}.{c}").alias(c) for c in left.columns],
        *[F.col(f"{_RPAY}.{c}").alias(f"{right_prefix}{c}") for c in r_cols],
    )
    return out


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str | None,
    right_prefix: str,
    inclusive: bool,
    tolerance: str | None,
    right_tiebreak: list[str] | None,
) -> DataFrame:
    """direction="nearest" body of asof_join — see there."""
    if not inclusive:
        raise ValueError("nearest requires inclusive=True")
    rt = right_time or left_time
    r_cols = [c for c in right.columns if c != on]
    if rt not in r_cols:
        raise ValueError(
            "nearest requires right_time to be a right-side column "
            "(the distance compare needs the matched time)"
        )
    tb = right_tiebreak or []
    null_tb = [
        F.lit(None).cast(right.schema[c].dataType.simpleString())
        for c in tb
    ]
    lhs = left.select(
        F.col(on),
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        *[c.alias(f"_tb_{name}") for c, name in zip(null_tb, tb)],
        F.struct(*[F.col(c) for c in left.columns]).alias(_LPAY),
    )
    rhs = right.select(
        F.col(on),
        F.col(rt).alias(_T),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"_tb_{c}") for c in tb],
        F.struct(*[F.col(c) for c in r_cols]).alias(_RPAY),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    tbo = [F.col(f"_tb_{c}").asc_nulls_last() for c in tb]
    w_b = (
        Window.partitionBy(on)
        .orderBy(F.col(_T).asc(), _SIDE, *tbo)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(on)
        .orderBy(F.col(_T).desc(), _SIDE, *tbo)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_rb", F.last(_RPAY, ignorenulls=True).over(w_b)
    ).withColumn("_rf", F.last(_RPAY, ignorenulls=True).over(w_f))

    def _seconds(col):
        # TIMESTAMP_NTZ has no direct double cast; hop through
        # TIMESTAMP (a pure reinterpretation under the session's UTC),
        # which also passes numeric time columns through unchanged.
        t = unioned.schema[_T].dataType.typeName()
        return (
            col.cast("timestamp").cast("double")
            if t.startswith("timestamp")
            else col.cast("double")
        )

    lt = _seconds(F.col(_T))
    d_b = lt - _seconds(F.col(f"_rb.{rt}"))
    d_f = _seconds(F.col(f"_rf.{rt}")) - lt
    rb, rf = F.col("_rb"), F.col("_rf")
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        rb = F.when(
            F.col(f"_rb.{rt}") >= F.col(_T) - bound, rb
        )
        rf = F.when(
            F.col(f"_rf.{rt}") <= F.col(_T) + bound, rf
        )
    chosen = (
        F.when(rb.isNull(), rf)
        .when(rf.isNull(), rb)
        .when(d_b <= d_f, rb)  # exact-tie → backward (pandas rule)
        .otherwise(rf)
    )
    return (
        carried.withColumn(_RPAY, chosen)
        .filter(F.col(_SIDE) == 1)
        .select(
            *[F.col(f"{_LPAY}.{c}").alias(c) for c in left.columns],
            *[
                F.col(f"{_RPAY}.{c}").alias(f"{right_prefix}{c}")
                for c in r_cols
            ],
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join (lo inclusive, hi exclusive) as an
    equi-join on fixed-width bin ids.

    ``bin_width`` should be on the order of the median interval width:
    each interval produces ``(hi-lo)/bin_width (+1)`` bin rows, each
    point exactly one. Matches are found only in the point's own bin,
    so the equi-join plus the exact refine predicate is complete and
    duplicate-free.
    """
    bin_id = lambda c: F.floor(c / F.lit(float(bin_width))).cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(bin_id(F.col(lo_col)), bin_id(F.col(hi_col)))),
    )
    pt = points.withColumn("_bin", bin_id(F.col(point_col)))
    joined = pt.join(iv, "_bin").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bin")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-grid resampling with forward fill — the gap-filling
    pass that turns an irregular event log into the regular series a
    feature pipeline or dashboard consumes.

    Per key: truncate the key's observed [min, max] span to the grid,
    explode one row per grid step (``sequence`` — a built-in array
    fan-out, no Python), attach the last observation inside each step
    (row_number over a (key, bucket)-partitioned window), and carry
    values across empty buckets with ``last(ignorenulls)`` over the
    key-partitioned order.  Every window is keyed — no single-partition
    sort; grid size per key is span/step, independent of event count.

    ``step`` must be exactly '1 hour' or '1 day': the bucket
    truncation unit and the grid stride are derived together, and any
    other step (e.g. '2 hours') would silently desynchronize them —
    observations would miss the grid join and forward-fill would carry
    stale values. Anything else raises.
    """
    allowed = {"1 hour": "hour", "1 day": "day"}
    if step not in allowed:
        raise ValueError(
            f"resample_ffill step must be one of {sorted(allowed)}, "
            f"got {step!r}: the date_trunc bucket unit and the grid "
            "stride must agree or fills silently go stale"
        )
    unit = allowed[step]
    bucket = F.date_trunc(unit, F.col(ts_col))
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w_pick = Window.partitionBy(key_col, "_bucket").orderBy(
        *[c.desc() for c in order]
    )
    obs = (
        df.withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(key_col, "_bucket", F.col(val_col).alias("_obs"))
    )
    grid = (
        df.groupBy(key_col)
        .agg(
            F.date_trunc(unit, F.min(ts_col)).alias("_lo"),
            F.date_trunc(unit, F.max(ts_col)).alias("_hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"),
                    F.col("_hi"),
                    F.expr(f"INTERVAL {step}"),
                )
            ).alias("_bucket"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, [key_col, "_bucket"], "left")
        .select(
            F.col(key_col),
            F.col("_bucket").alias("bucket"),
            F.last("_obs", ignorenulls=True).over(w_fill).alias(val_col),
        )
    )


def ewma_bounded(
    df: DataFrame,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    value: str = "value",
    alpha: float = 0.25,
    lookback: int = 8,
) -> DataFrame:
    """Bounded-lookback exponentially weighted moving average per key
    — the smoothing pass time-series feature pipelines run before
    anomaly scoring (next to events.anomaly_mad's rolling median).

    Semantics: for each row, fold the last ``lookback`` values in
    event order with ``acc*(1-alpha) + x*alpha``, seeding the
    accumulator with the OLDEST value in the frame (so a 1-row frame
    returns the value itself). The bound makes the window a fixed-size
    ROWS frame — the exact infinite-history EWMA would need a running
    product only expressible as a sequential scan, and weights below
    (1-alpha)^lookback are noise anyway.

    Scale: one shuffle on the key (the Window exchange), per-row state
    = a ``lookback``-element array, fold is a codegen'd HOF — no UDF,
    no per-key materialization beyond the frame. Pick alpha with an
    exact binary representation (0.25, 0.5) and the fold is
    bit-identical across engines and partitionings: same IEEE ops in
    the same order.

    PRECONDITION: ``value`` must be non-null. The frame array is built
    with ``collect_list``, which silently DROPS nulls — a null row
    would shift the frame (borrowing older rows) instead of
    propagating null, diverging from SQL engines whose list() keeps
    nulls. Enforced below with a fail-fast assert_true so a nullable
    column is an error, never silently different semantics.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), 0)
    )
    # Materialize the frame array ONCE in its own projection: the fold
    # references it three times (slice/size/seed), and inlining the
    # window expression would make the Window node buffer three copies
    # per row (visible as _we0.._we2 in the plan).
    arr = F.col("_ewma_frame")
    ew = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    # Fail fast on nulls (docstring PRECONDITION) — free in codegen,
    # and far cheaper than a silently shifted frame.
    checked = F.when(
        F.col(value).isNull(),
        F.assert_true(F.col(value).isNotNull(),
                      f"ewma_bounded: null in {value!r}").cast("double"),
    ).otherwise(F.col(value))
    return (
        df.select(
            key, *order,
            checked.alias(value),
            F.collect_list(checked).over(w).alias("_ewma_frame"),
        )
        .select(key, *order, value, ew.alias("ewma"))
    )
