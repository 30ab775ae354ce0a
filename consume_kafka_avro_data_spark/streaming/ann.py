"""Streaming ANN ingest — vectors arrive on a stream, the persisted
IVF-PQ index stays fresh.

The third member of the engine's ingest family, completing the pattern:
``StreamingGraphIngest`` lands triples in the idempotent graph,
``StreamingDedupIngest`` lands signatures in the dedup store, and this
lands embeddings in the :class:`~consume_kafka_avro_data_spark.operators.
ann_index.AnnIndex` — each micro-batch is assigned + PQ-encoded against
the index's FROZEN quantizers (two map-only Arrow passes over the new
rows only; the corpus is never re-swept) and committed as one more
generation directory via the atomic meta swap.

Replay safety: each batch commits under ``shard_id=f"b{batch_id}"``, so
a foreachBatch replay after a crash REPLACES its own generation instead
of double-counting vectors — ``AnnIndex.add_shard``'s per-id
idempotence, the same contract the graph and dedup ingests implement
with anti-joins.  Queries against the index see whole committed batches
or nothing (the meta swap is the only commit point).

Rebuild cadence is the operator's job, not this class's: incremental
shards reuse the seed corpus's centroids/codebooks, so when
``index.cell_sizes()`` shows drift, retrain with ``AnnIndex.build`` over
the accumulated corpus and resume streaming into the new generation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from consume_kafka_avro_data_spark.operators.ann_index import AnnIndex


@dataclass
class AnnIngestMetrics:
    batches: int = 0
    vectors: int = 0
    vectors_by_batch: dict[int, int] = field(default_factory=dict)


class StreamingAnnIngest:
    """readStream(vectors) → assign+encode vs frozen quantizers →
    atomic per-batch generation commit (replay-idempotent)."""

    def __init__(
        self,
        spark: SparkSession,
        index: AnnIndex,
        checkpoint_dir: str,
    ):
        self.spark = spark
        self.index = index
        self.checkpoint_dir = checkpoint_dir
        self.metrics = AnnIngestMetrics()
        self._seen_batches: set[int] = set()

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        n = batch.count()
        if n:
            self.index.add_shard(batch, shard_id=f"b{batch_id}")
        if batch_id not in self._seen_batches:
            self.metrics.batches += 1
            self.metrics.vectors += n
            self.metrics.vectors_by_batch[batch_id] = n
        self._seen_batches.add(batch_id)

    def start(
        self,
        stream: DataFrame,
        available_now: bool = True,
        processing_time: str = "1 second",
    ) -> StreamingQuery:
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation", os.path.join(self.checkpoint_dir, "ann")
            )
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_to_completion(
        self,
        stream: DataFrame,
        timeout: float = 300.0,
        reset_metrics: bool = True,
    ) -> AnnIngestMetrics:
        """Bounded replay: availableNow, await, return per-run metrics
        (TimeoutError rather than silently-partial counters — same
        contract as the graph and dedup ingests)."""
        if reset_metrics:
            self.metrics = AnnIngestMetrics()
        q = self.start(stream, available_now=True)
        finished = q.awaitTermination(timeout)
        if not finished:
            q.stop()
            raise TimeoutError(
                f"bounded replay did not finish within {timeout}s; "
                "metrics are partial"
            )
        return self.metrics
