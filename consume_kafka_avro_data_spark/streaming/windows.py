"""Streaming windowed/stateful closure (SURVEY §2.6, T6–T9).

The reference has no windowing — these are the EXT operators that make
the stream queryable.  All are watermarked from day one: the reference's
unbounded ``SafeQueue`` (``src/SafeQueue.h:55``) is the cautionary tale
for unbounded streaming state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from consume_kafka_avro_data_spark.functions.parity import dsum


def _ts(ts_col: str | Column) -> Column:
    return F.col(ts_col) if isinstance(ts_col, str) else ts_col


def tumbling_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    value_col: str = "value",
    exact_decimal: bool = True,
) -> DataFrame:
    """T6 tumbling + T7 watermark: per-window count and exact sum.
    State for a window is droppable once the watermark passes its end.

    ``exact_decimal=True`` sums through the DECIMAL(18,4) parity form —
    order-independent and engine-portable, but it ASSUMES ≤4-dp values
    below ~1e14 (the money/measure convention of this engine; outside it
    the cast truncates or nulls).  Pass False for arbitrary doubles to
    get a plain IEEE sum."""
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(_ts(ts_col), window), *(keys or []))
    )
    sum_expr = dsum(value_col) if exact_decimal else F.sum(value_col)
    return grouped.agg(
        F.count("*").alias("n_events"),
        sum_expr.alias("sum_value"),
    ).select(
        F.col("window.start").alias("bucket"),
        *(keys or []),
        "n_events",
        "sum_value",
    )


def sliding_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    value_col: str = "value",
    exact_decimal: bool = True,
) -> DataFrame:
    """T6 sliding windows (each event lands in window/slide buckets).
    ``exact_decimal`` as in :func:`tumbling_window_agg` (2-dp money
    convention; False → plain IEEE sum for arbitrary doubles)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(_ts(ts_col), window, slide), *(keys or []))
        .agg(
            F.count("*").alias("n_events"),
            (dsum(value_col) if exact_decimal else F.sum(value_col)).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            F.col("window.end").alias("bucket_end"),
            *(keys or []),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """T6 session windows: gap-based sessions (the stateful twin of the
    batch q_session_like)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(_ts(ts_col), gap), *(keys or []))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *(keys or []),
            "n_events",
        )
    )


def stateful_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    """T8 stateful dedup — the streaming form of the reference's
    ON-CONFLICT unique constraint (src/Database.h:23-31).

    ``within_watermark=True`` uses dropDuplicatesWithinWatermark: state
    for a key expires once the watermark passes (bounded memory; the
    right choice when duplicates arrive close together, e.g. producer
    retries).  False keeps keys forever (exact global dedup; unbounded
    state — only for keyed streams with bounded key cardinality).
    """
    wm = stream.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """T9 stream-static join — the reference's registry/dimension lookup
    pattern (J1) against a slowly-changing static table.  The static
    side is re-read per micro-batch.

    ``broadcast_dim=True`` force-hints the broadcast (right for
    registry-sized dims — it bypasses autoBroadcastJoinThreshold, so the
    caller is promising the table fits in executor memory).  Pass False
    for large dimensions and the planner picks broadcast vs shuffle from
    its own size estimate."""
    return stream.join(F.broadcast(dim) if broadcast_dim else dim, on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """T10 stream-stream join (ad-attribution shape): match right-side
    events to a left-side event with the same key that happened at most
    ``within`` earlier.

    Both sides are watermarked and the join condition carries the time
    bound — that pair is what lets Spark expire buffered rows: a left
    row's state is droppable once the right watermark passes
    ``left_ts + within``, so state is bounded by (rate × interval), not
    by stream length.  The reference has no two-stream correlation at
    all (its one stream is processed row-at-a-time,
    src/main.cpp:244-256); this is the EXT closure for correlating two
    live streams without landing either.

    ``how`` may be 'inner', 'left_outer', 'right_outer' or 'full_outer';
    outer results for unmatched rows emit only once the watermark closes
    their window (correct streaming semantics — late matches must be
    impossible before a NULL is emitted).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # DataFrame-qualified references, NOT bare F.col(): the two streams
    # may share column names (the defaults left_ts=right_ts='ts' do!),
    # where bare names either raise AMBIGUOUS_REFERENCE or collapse the
    # key equality into a tautology
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)
