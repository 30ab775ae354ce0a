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

Rebuild cadence: incremental shards reuse the seed corpus's
centroids/codebooks, which drift as the arriving distribution shifts —
so the ingest WATCHES for it.  Each committed shard's per-cell row
counts (parquet footers, driver-side — no extra scan) accumulate into
:class:`AnnIngestMetrics`, and :meth:`StreamingAnnIngest.drift_ratio`
reports max-cell / mean-cell over the streamed arrivals (mean taken
over ALL index cells, so arrivals piling into one cell read as skew
even when the other cells see nothing).  When
``needs_rebuild(threshold)`` flips, retrain with ``AnnIndex.build``
over the accumulated corpus and resume streaming into the new
generations — the flag is advisory (this class never rebuilds on its
own; a rebuild retrains quantizers and must be the operator's
scheduled decision, not a mid-stream surprise).
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
    #: per-batch {cell: rows} from the committed shard's parquet
    #: footers — keyed by batch id so a replayed batch REPLACES its
    #: contribution (the shard generation it re-commits does the same)
    cells_by_batch: dict[int, dict[int, int]] = field(default_factory=dict)

    def cell_totals(self) -> dict[int, int]:
        totals: dict[int, int] = {}
        for cells in self.cells_by_batch.values():
            for c, n in cells.items():
                totals[c] = totals.get(c, 0) + n
        return totals


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
        cells: dict[int, int] = {}
        if not batch.isEmpty():
            self.index.add_shard(batch, shard_id=f"b{batch_id}")
            n = self.index.last_shard_rows
            cells = self.index.last_shard_cell_counts
        if batch_id not in self._seen_batches:
            self.metrics.batches += 1
            self.metrics.vectors += n
            self.metrics.vectors_by_batch[batch_id] = n
        # keyed by batch id, so a replay overwrites (never double-counts)
        self.metrics.cells_by_batch[batch_id] = cells
        self._seen_batches.add(batch_id)

    # -- rebuild trigger -----------------------------------------------------

    def drift_ratio(self) -> float:
        """max-cell / mean-cell over the STREAMED arrivals' per-cell
        counts, with the mean over all index cells (empty cells count:
        every arrival landing in one of 16 cells is ratio 16, maximal
        skew).  1.0 = perfectly balanced; 0.0 = nothing streamed yet."""
        totals = self.metrics.cell_totals()
        total = sum(totals.values())
        if not total:
            return 0.0
        n_cells = max(len(self.index.centroids), 1)
        return max(totals.values()) / (total / n_cells)

    def needs_rebuild(self, threshold: float = 4.0) -> bool:
        """True when streamed arrivals skew cells past ``threshold``×
        the balanced size — the signal to retrain quantizers with
        ``AnnIndex.build`` over the accumulated corpus.  Advisory:
        the ingest keeps committing shards either way (a half-stream
        quantizer swap would split the corpus across incompatible
        cell/code spaces)."""
        return self.drift_ratio() > threshold

