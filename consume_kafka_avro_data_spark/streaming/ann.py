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

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from consume_kafka_avro_data_spark.operators.ann_index import AnnIndex
from consume_kafka_avro_data_spark.streaming.lifecycle import BoundedReplayMixin


@dataclass
class AnnIngestMetrics:
    batches: int = 0
    vectors: int = 0
    vectors_by_batch: dict[int, int] = field(default_factory=dict)


class StreamingAnnIngest(BoundedReplayMixin):
    """readStream(vectors) → assign+encode vs frozen quantizers →
    atomic per-batch generation commit (replay-idempotent)."""

    _checkpoint_subdir = "ann"

    def _new_metrics(self) -> AnnIngestMetrics:
        return AnnIngestMetrics()

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
        # isEmpty is a cheap limit-1 probe; the real row count comes
        # from the written generation's parquet footers (driver-side
        # metadata) — a batch.count() here would add a full extra scan
        # per micro-batch purely for bookkeeping
        n = 0
        if not batch.isEmpty():
            self.index.add_shard(batch, shard_id=f"b{batch_id}")
            n = self.index.last_shard_rows
        if batch_id not in self._seen_batches:
            self.metrics.batches += 1
            self.metrics.vectors += n
            self.metrics.vectors_by_batch[batch_id] = n
        self._seen_batches.add(batch_id)

