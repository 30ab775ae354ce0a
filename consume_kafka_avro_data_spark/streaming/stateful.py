"""Custom stateful streaming operator (SURVEY §2.6 closure, charter):
arbitrary per-key running state via ``applyInPandasWithState``.

The reference's only stateful construct is a process-global error
counter (``size_t errors`` — ``src/main.cpp:243-251``) that dies with
the process.  The streaming generalization is a per-key running
aggregate whose state lives in Spark's checkpointed state store:
restart-safe, partitioned by key (scales horizontally), and fed Arrow
batches — never row-at-a-time Python.

``running_stats`` keeps {count, sum, last-seen} per key and emits one
updated row per key per micro-batch (output mode ``update``).  State is
a flat tuple of longs/doubles — micros instead of timestamps so the
state codec stays byte-stable across timezones.  An optional idle
timeout expires keys not seen for ``ttl`` (ProcessingTimeTimeout),
bounding state size — the discipline the reference's unbounded
SafeQueue (``src/SafeQueue.h:55``) lacked.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_micros", LongType()),
    ]
)


#: state sentinel for "no timestamp observed yet".  Initializing to 0
#: (epoch) breaks max() for pre-1970 timestamps and makes an all-NaT key
#: emit epoch as if it were a real last-seen; the sentinel folds
#: correctly under max() and is emitted as NULL.
NO_TS = -(2**63)


def _output_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("last_micros", LongType()),
        ]
    )


def running_stats(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running {count, sum(value), max(ts)} over an unbounded
    stream; one updated row per key per micro-batch."""
    key_field = stream.schema[key]
    out_schema = _output_schema(key_field)

    def update(
        key_tuple: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get if state.exists else (0, 0.0, NO_TS)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            batch_last = pdf[ts_col].max()
            if pd.notna(batch_last):
                last = max(last, int(pd.Timestamp(batch_last).value // 1000))
        state.update((n, float(total), last))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "n_events": [n],
                "total_value": [total],
                "last_micros": [None if last == NO_TS else last],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select(key, ts_col, value_col)
        .groupBy(key)
        .applyInPandasWithState(update, out_schema, STATE_SCHEMA, "update", timeout)
    )


def running_stats_tws(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The same per-key running {count, sum, last-seen} on the
    transformWithStateInPandas API (Spark 4's successor to
    applyInPandasWithState): schema'd ValueState managed by the handle,
    RocksDB-backed (the query requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider), Arrow-batched per key.  Running the
    query additionally needs ``google.protobuf`` (the TWS state-server
    wire protocol); constructing the plan does not.

    Kept semantically identical to :func:`running_stats` so tests can
    assert the two APIs agree batch-for-batch — the migration-safety
    property a production pipeline needs before switching state APIs.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_field = stream.schema[key]
    out_schema = _output_schema(key_field)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(
            self, key_tuple: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values: Any
        ) -> Iterator[pd.DataFrame]:
            n, total, last = (
                self._agg.get() if self._agg.exists() else (0, 0.0, NO_TS)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
                batch_last = pdf[ts_col].max()
                if pd.notna(batch_last):
                    last = max(last, int(pd.Timestamp(batch_last).value // 1000))
            self._agg.update((n, float(total), last))
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_micros": [None if last == NO_TS else last],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select(key, ts_col, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
