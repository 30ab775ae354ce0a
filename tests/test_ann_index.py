"""AnnIndex: the persisted IVF-PQ layout must (a) answer exact queries
identically to the un-indexed operators over the same probed subset,
(b) prune unprobed cells at planning time (PartitionFilters), (c) never
read the float vector column on the ADC path (ReadSchema), and (d)
round-trip its driver-sized metadata bit-exactly through load()."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.ann_index import AnnIndex
from consume_kafka_avro_data_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk,
)
from consume_kafka_avro_data_spark.plans.inspect import (
    partition_filters,
    read_schema_columns,
)
from consume_kafka_avro_data_spark.tables import load_table


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ann") / "index")
    return AnnIndex.build(spark, emb, path, n_cells=8, m=8, k_codes=16)


@pytest.fixture(scope="module")
def qvec(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 1)
        .collect()[0]["embedding"]
    )


def test_exact_query_with_all_cells_equals_brute_force(
    spark, sf_dir, index, qvec
):
    """nprobe = n_cells probes everything, so the indexed exact path
    must return byte-identical top-k to brute force over the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    want = [(r.vec_id, r.score) for r in brute_force_topk(emb, qvec, 10).collect()]
    got = [(r.vec_id, r.score) for r in index.query_exact(qvec, 10, nprobe=8).collect()]
    assert got == want


def test_exact_query_prunes_and_recalls(index, qvec):
    """nprobe=2: the scan must carry a planning-time PartitionFilter on
    _ivf_cell, and the query's own cell being probed first means the
    query vector itself is always recalled at rank 1 (cosine 1)."""
    probed = index._probe(qvec, nprobe=2)
    pf = partition_filters(probed)
    assert pf and any("_ivf_cell" in f for f in pf), pf
    top = index.query_exact(qvec, 5, nprobe=2).collect()
    assert top[0].vec_id == 1 and abs(top[0].score - 1.0) < 1e-12


def test_adc_path_never_reads_float_vectors(index, qvec):
    """IVF-PQ's point: the ADC scan reads (id, codes [, partition
    col]) ONLY — the embedding column must be absent from ReadSchema."""
    out = index.query_adc(qvec, 10, nprobe=8)
    cols = read_schema_columns(out, "vectors")
    assert cols, "expected a parquet scan of the index in the ADC plan"
    assert "embedding" not in cols, cols
    pf = partition_filters(index._probe(qvec, 2).select("vec_id", "pq_codes"))
    assert pf and any("_ivf_cell" in f for f in pf), pf


def test_adc_matches_unindexed_operator_on_full_probe(
    spark, sf_dir, index, qvec
):
    """With every cell probed, the indexed ADC distances must equal the
    per-query pq_adc_topk operator's (same codebooks, same q20 grid)."""
    emb = load_table(spark, sf_dir, "embeddings")
    want = [
        (r.vec_id, r.adc_dist)
        for r in pq_adc_topk(emb, qvec, index.codebooks, k=10).collect()
    ]
    got = [
        (r.vec_id, r.adc_dist)
        for r in index.query_adc(qvec, 10, nprobe=8).collect()
    ]
    assert got == want


def test_metadata_roundtrip_bit_exact(spark, index):
    loaded = AnnIndex.load(spark, index.path)
    assert np.array_equal(loaded.centroids, index.centroids)
    assert np.array_equal(loaded.codebooks, index.codebooks)
    assert (loaded.id_col, loaded.vec_col) == (index.id_col, index.vec_col)


def test_rebuild_commits_atomically_with_reader_grace_period(
    spark, sf_dir, tmp_path, qvec
):
    """A rebuild writes a FRESH generation directory and commits it via
    the META replace (a crash in between leaves the old generation
    live).  Superseded generations are NOT deleted at commit — a reader
    holding the previous meta must be able to finish its scan — and
    survive on the timestamped grace list until ``grace_seconds``
    elapses (commit COUNT must not expire them: under streaming ingest
    the index commits every micro-batch)."""
    import os

    def gens_on_disk():
        return {n for n in os.listdir(path) if n.startswith("vectors")}

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    first = AnnIndex.build(spark, emb, path, n_cells=8)
    (gen1,) = first.vectors_dirs
    stale_reader = AnnIndex.load(spark, path)  # holds the gen1 meta

    second = AnnIndex.build(spark, emb, path, n_cells=8)
    (gen2,) = second.vectors_dirs
    assert gen2 != gen1  # never overwritten in place
    assert gens_on_disk() == {gen1, gen2}  # grace: gen1 still intact
    # the stale reader's in-flight queries against gen1 still complete
    top = stale_reader.query_exact(qvec, 3, nprobe=8).collect()
    assert top[0].vec_id == 1

    # within the grace window, MANY further commits never delete gen1
    third = AnnIndex.build(spark, emb, path, n_cells=8)
    (gen3,) = third.vectors_dirs
    assert {gen1, gen2, gen3} <= gens_on_disk()
    third.add_shard(
        emb.withColumn("vec_id", F.col("vec_id") + 10_000_000), shard_id="s1"
    )
    assert {gen1, gen2} <= gens_on_disk()

    # once the window elapses (grace_seconds=0 simulates it), the next
    # commits sweep the expired generations; only the current live dir
    # and the just-superseded one (stamped at this commit) remain
    fourth = AnnIndex.build(spark, emb, path, n_cells=8, grace_seconds=0.0)
    (gen4,) = fourth.vectors_dirs
    fifth = AnnIndex.build(spark, emb, path, n_cells=8, grace_seconds=0.0)
    (gen5,) = fifth.vectors_dirs
    assert gens_on_disk() == {gen5, gen4}
    loaded = AnnIndex.load(spark, path)
    assert loaded.vectors_dirs == [gen5]
    top = loaded.query_exact(qvec, 3, nprobe=8).collect()
    assert top[0].vec_id == 1


def test_add_shard_matches_full_build_on_full_probe(spark, sf_dir, tmp_path):
    """Incremental growth: build on half the corpus, add_shard the
    other half.  With every cell probed the exact path is brute force
    over the union, so results must be IDENTICAL to a full build's
    (regardless of the two indexes' different trained quantizers), the
    quantizers must stay frozen across add_shard, and cell_sizes must
    cover the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    n = emb.count()
    half_a = emb.where(F.col("vec_id") % 2 == 0)
    half_b = emb.where(F.col("vec_id") % 2 == 1)

    inc = AnnIndex.build(
        spark, half_a, str(tmp_path / "inc"), n_cells=8, m=8, k_codes=16
    )
    cent_before = inc.centroids.copy()
    inc.add_shard(half_b)
    assert np.array_equal(inc.centroids, cent_before)  # frozen quantizer
    assert len(inc.vectors_dirs) == 2

    full = AnnIndex.build(
        spark, emb, str(tmp_path / "full"), n_cells=8, m=8, k_codes=16
    )
    want = [
        (r.vec_id, r.score)
        for r in full.query_exact(qvec, 10, nprobe=8).collect()
    ]
    got = [
        (r.vec_id, r.score)
        for r in inc.query_exact(qvec, 10, nprobe=8).collect()
    ]
    assert got == want

    sizes = {r._ivf_cell: r.n for r in inc.cell_sizes().collect()}
    assert sum(sizes.values()) == n

    # the incremental meta survives load() and probes still
    # partition-prune across BOTH generation directories
    from consume_kafka_avro_data_spark.plans.inspect import (
        partition_filters as _pf,
    )

    loaded = AnnIndex.load(spark, inc.path)
    assert loaded.vectors_dirs == inc.vectors_dirs
    pf = _pf(loaded._probe(qvec, nprobe=2))
    assert pf and any("_ivf_cell" in f for f in pf), pf
    got2 = [
        (r.vec_id, r.score)
        for r in loaded.query_exact(qvec, 10, nprobe=8).collect()
    ]
    assert got2 == want


def test_cell_sizes_cover_corpus(spark, sf_dir, index):
    n = load_table(spark, sf_dir, "embeddings").count()
    sizes = {r._ivf_cell: r.n for r in index.cell_sizes().collect()}
    assert sum(sizes.values()) == n
    assert all(c >= 1 for c in sizes)


def test_crash_orphaned_generation_dirs_are_swept(spark, sf_dir, tmp_path):
    """A generation directory written but never committed (crash
    between _write_generation and _commit_meta) must be swept by the
    next successful commit — build AND add_shard — while live and
    still-in-grace directories survive."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    idx = AnnIndex.build(spark, emb, path, n_cells=8)

    def plant_orphan(name):
        d = os.path.join(path, name)
        os.makedirs(d)
        open(os.path.join(d, "part-junk.parquet"), "wb").close()
        return name

    orphan = plant_orphan("vectors-deadbeef")
    idx.add_shard(emb.withColumn("vec_id", F.col("vec_id") + 10_000_000))
    names = set(os.listdir(path))
    assert orphan not in names  # swept by add_shard's commit
    assert set(idx.vectors_dirs) <= names  # live dirs intact

    orphan2 = plant_orphan("vectors-cafebabe")
    rebuilt = AnnIndex.build(spark, emb, path, n_cells=8)
    names = set(os.listdir(path))
    assert orphan2 not in names  # swept by build's commit
    # grace: the superseded (pre-rebuild) live dirs still on disk
    assert set(idx.vectors_dirs) <= names
    assert set(rebuilt.vectors_dirs) <= names


def test_adc_rerank_saturated_shortlist_equals_exact_path(
    spark, sf_dir, index, qvec
):
    """With a shortlist as large as the probed cells' population, the
    ADC stage discards nothing and the re-rank must return EXACTLY the
    exact path's top-k (same probe set, same q20 cosines, same id
    tie-breaks)."""
    n_probed = index._probe(qvec, nprobe=2).count()
    want = [
        (r.vec_id, r.score)
        for r in index.query_exact(qvec, 10, nprobe=2).collect()
    ]
    got = [
        (r.vec_id, r.score)
        for r in index.query_adc_rerank(
            qvec, 10, nprobe=2, shortlist=n_probed
        ).collect()
    ]
    assert got == want


def test_adc_rerank_recovers_recall_over_plain_adc(spark, sf_dir, index, qvec):
    """The serving-shape contract: re-ranking the ADC shortlist with
    true cosines recalls at least as much of the exact answer as plain
    ADC's top-k, and the rescore scan reads floats for the SHORTLIST
    only (an IN pushdown below the cell PartitionFilter)."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = {r.vec_id for r in brute_force_topk(emb, qvec, 10).collect()}
    adc = {r.vec_id for r in index.query_adc(qvec, 10, nprobe=8).collect()}
    rer = index.query_adc_rerank(qvec, 10, nprobe=8, shortlist=50)
    rerank = {r.vec_id for r in rer.collect()}
    assert len(rerank & truth) >= len(adc & truth)
    # the query vector itself survives the shortlist and re-ranks first
    top = rer.collect()[0]
    assert top.vec_id == 1 and abs(top.score - 1.0) < 1e-12
    # plan: float reads are gated by the pushed id filter
    from consume_kafka_avro_data_spark.plans.inspect import pushed_filters

    cand = (
        index._probe(qvec, 8)
        .where(F.col("vec_id").isin([1, 2, 3]))
        .select("vec_id", "embedding")
    )
    pushed = pushed_filters(cand, "vectors")
    assert any("vec_id" in f and "In" in f for f in pushed), pushed


def test_grace_seconds_persists_through_load(spark, sf_dir, tmp_path):
    """The GC grace window is a property of the INDEX (sized to its
    longest reader scan), so it must survive load() in a different
    process — reverting to the class default would let add_shard prune
    generation dirs a still-running long scan references."""
    from consume_kafka_avro_data_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    path = str(tmp_path / "graceidx")
    idx = AnnIndex.build(
        spark, emb, path, n_cells=4, m=4, k_codes=8, grace_seconds=86400.0
    )
    assert idx.grace_seconds == 86400.0
    loaded = AnnIndex.load(spark, path)
    assert loaded.grace_seconds == 86400.0  # not the 3600 class default
    # and a shard commit through the LOADED handle re-persists it
    loaded.add_shard(emb.limit(8), shard_id="s1")
    assert AnnIndex.load(spark, path).grace_seconds == 86400.0
