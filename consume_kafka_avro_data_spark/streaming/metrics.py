"""Streaming observability: a ``StreamingQueryListener`` port of the
reference's runtime counters and log-event stream.

The reference keeps one mutable ``size_t errors`` bumped per failed
message in the poll loop (``src/main.cpp:243-253``) and pushes progress
lines through its SafeQueue→LogProcessor pipeline
(``src/logging/LogProcessor.cpp:43-81``).  Structured Streaming already
emits the equivalent facts per micro-batch (rows, duration, state,
watermark) on the driver's listener bus — so the Spark-first port is a
listener that folds those events into the same running counters, not a
custom queue.  This scales trivially: listener callbacks are
driver-side, O(1) per batch, and never touch executor data paths.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamCounters:
    """Running totals across every query seen by the listener."""

    started: int = 0
    terminated: int = 0
    failed: int = 0
    batches: int = 0
    input_rows: int = 0
    # per-query-name row counts (the reference logs per-topic)
    rows_by_query: dict[str, int] = field(default_factory=dict)
    last_batch_duration_ms: int | None = None
    last_exception: str | None = None


class CountersListener(StreamingQueryListener):
    """Folds listener events into :class:`StreamCounters`.

    Thread-safe: Spark delivers listener events on its own bus thread
    while tests/operators read from the main thread — the same
    producer/consumer boundary the reference crossed with its SafeQueue
    (``src/SafeQueue.h:9-58``), here reduced to one lock because the
    consumer keeps only counters, not a message backlog.
    """

    def __init__(self) -> None:
        self.counters = StreamCounters()
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        with self._lock:
            self.counters.started += 1

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            c = self.counters
            c.batches += 1
            c.input_rows += int(p.numInputRows)
            name = p.name or "<unnamed>"
            c.rows_by_query[name] = c.rows_by_query.get(name, 0) + int(
                p.numInputRows
            )
            dur = p.durationMs or {}
            if "triggerExecution" in dur:
                c.last_batch_duration_ms = int(dur["triggerExecution"])

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.counters.terminated += 1
            if event.exception is not None:
                self.counters.failed += 1
                self.counters.last_exception = str(event.exception)

    # -- accessors --------------------------------------------------------
    def snapshot(self) -> StreamCounters:
        """Copy of the counters safe to read after queries stop."""
        with self._lock:
            c = self.counters
            return StreamCounters(
                started=c.started,
                terminated=c.terminated,
                failed=c.failed,
                batches=c.batches,
                input_rows=c.input_rows,
                rows_by_query=dict(c.rows_by_query),
                last_batch_duration_ms=c.last_batch_duration_ms,
                last_exception=c.last_exception,
            )


def attach_counters(spark: SparkSession) -> CountersListener:
    """Register a fresh :class:`CountersListener` on the session's
    listener bus and return it.  Call ``detach_counters`` when done —
    listeners outlive queries."""
    listener = CountersListener()
    spark.streams.addListener(listener)
    return listener


def detach_counters(spark: SparkSession, listener: CountersListener) -> None:
    spark.streams.removeListener(listener)
