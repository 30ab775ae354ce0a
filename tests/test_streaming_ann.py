"""StreamingAnnIngest: embeddings arriving as a file-backed stream must
land in the persisted IVF-PQ index batch-by-batch (frozen quantizers),
full-probe queries over the grown index must equal a full rebuild's,
and a checkpoint-less replay must REPLACE per-batch generations instead
of double-counting vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.ann_index import AnnIndex
from consume_kafka_avro_data_spark.streaming.ann import StreamingAnnIngest
from consume_kafka_avro_data_spark.tables import load_table


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _vector_stream(spark, tmp_path, emb, parts):
    path = str(tmp_path / "vecs")
    for cond in parts:
        emb.where(cond).select("vec_id", "embedding").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    schema = emb.select("vec_id", "embedding").schema

    def reader():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )

    return reader


def test_streaming_ann_ingest_matches_full_build(spark, sf_dir, tmp_path, emb):
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    n = emb.count()
    # seed index on ~half the corpus (quantizers train here)
    seed = emb.where(F.col("vec_id") % 2 == 0)
    idx = AnnIndex.build(
        spark, seed, str(tmp_path / "idx"), n_cells=8, m=8, k_codes=16
    )
    # the other half arrives as a 2-batch stream
    reader = _vector_stream(
        spark,
        tmp_path,
        emb,
        [
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 4 == 1),
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 4 == 3),
        ],
    )
    ingest = StreamingAnnIngest(spark, idx, str(tmp_path / "ckpt"))
    m = ingest.run_to_completion(reader())
    assert m.batches == 2
    assert m.vectors == emb.where(F.col("vec_id") % 2 == 1).count()

    sizes = {r._ivf_cell: r.n for r in idx.cell_sizes().collect()}
    assert sum(sizes.values()) == n  # every vector indexed exactly once

    # full-probe == brute force over the whole corpus == a full build
    # trained on the SEED's quantizers (exact path ignores PQ codes)
    from consume_kafka_avro_data_spark.operators.similarity import (
        brute_force_topk,
    )

    want = [
        (r.vec_id, r.score) for r in brute_force_topk(emb, qvec, 10).collect()
    ]
    got = [
        (r.vec_id, r.score)
        for r in idx.query_exact(qvec, 10, nprobe=8).collect()
    ]
    assert got == want

    # replay with a FRESH checkpoint into the same index: per-batch
    # shard ids replace their own generations — no double counting
    replay = StreamingAnnIngest(spark, idx, str(tmp_path / "ckpt2"))
    replay.run_to_completion(reader())
    sizes2 = {r._ivf_cell: r.n for r in idx.cell_sizes().collect()}
    assert sum(sizes2.values()) == n
    got2 = [
        (r.vec_id, r.score)
        for r in idx.query_exact(qvec, 10, nprobe=8).collect()
    ]
    assert got2 == want
    # one live generation per committed shard + the seed; replays
    # replaced rather than appended
    loaded = AnnIndex.load(spark, idx.path)
    assert len(loaded.vectors_dirs) == 3


def test_drift_metric_flags_skewed_arrivals(spark, sf_dir, tmp_path, emb):
    """Streaming a shard whose vectors all land in ONE cell must push
    drift_ratio toward n_cells and flip needs_rebuild; a balanced
    stream must not."""
    idx = AnnIndex.build(
        spark, emb, str(tmp_path / "idx"), n_cells=8, m=8, k_codes=16
    )
    # skewed arrivals: many copies of one corpus vector (same cell),
    # fresh ids clear of the corpus
    one = emb.where(F.col("vec_id") == 1).select("embedding")
    skew = (
        one.crossJoin(spark.range(64).withColumnRenamed("id", "vec_id"))
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    skew.coalesce(1).write.parquet(str(tmp_path / "skewed"))
    stream = (
        spark.readStream.schema(skew.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "skewed"))
    )
    ingest = StreamingAnnIngest(spark, idx, str(tmp_path / "ckpt"))
    assert ingest.drift_ratio() == 0.0  # nothing streamed yet
    assert not ingest.needs_rebuild()
    ingest.run_to_completion(stream)
    assert ingest.drift_ratio() == pytest.approx(8.0)  # all → one cell
    assert ingest.needs_rebuild(threshold=4.0)

    # balanced arrivals: a spread of the corpus itself
    bal = emb.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    bal.coalesce(1).write.parquet(str(tmp_path / "balanced"))
    stream2 = (
        spark.readStream.schema(bal.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "balanced"))
    )
    idx2 = AnnIndex.build(
        spark, emb, str(tmp_path / "idx2"), n_cells=8, m=8, k_codes=16
    )
    ingest2 = StreamingAnnIngest(spark, idx2, str(tmp_path / "ckpt2"))
    ingest2.run_to_completion(stream2)
    assert ingest2.drift_ratio() < 4.0
    assert not ingest2.needs_rebuild(threshold=4.0)


def test_ann_ingest_metrics_incremental_and_bounded():
    """AnnIngestMetrics must replace a replayed batch's contribution
    (totals never double-count), answer cell_totals incrementally, and
    compact per-batch maps beyond the horizon while keeping their mass
    — the DriftMetrics contract applied to the ANN ingest."""
    from consume_kafka_avro_data_spark.streaming.ann import AnnIngestMetrics

    m = AnnIngestMetrics(compact_horizon=3)
    for b in range(6):
        m.record(b, 10, {0: 10})
    assert m.batches == 6 and m.vectors == 60
    assert m.cell_totals() == {0: 60}  # compacted mass survives
    assert len(m.cells_by_batch) <= 4
    # a LIVE batch replay replaces, never adds
    m.record(5, 4, {1: 4})
    assert m.vectors == 54
    assert m.cell_totals() == {0: 50, 1: 4}
    # an already-compacted batch id refuses (cannot be deduplicated)
    with pytest.raises(RuntimeError, match="compacted"):
        m.record(0, 10, {0: 10})
