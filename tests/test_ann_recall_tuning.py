"""Round-6 ANN recall levers: IVF multiple assignment (replicas),
k-means++ init, and the OPQ rotation.

Measured context (sf0.1, pinned in bench.py's ``ann_index.tuned`` row):
the single-assignment quantizer already probes the best-possible cell
at nprobe=1 — the truth is SPLIT across cells, so init/iteration
tweaks cannot move low-nprobe recall (verified: k-means++ and 50 Lloyd
iterations are both no-ops there).  Multiple assignment raises the
ceiling itself (0.40 → 0.64 recall@10 at nprobe=1 with replicas=4) at
the honest cost of ×R index rows.  OPQ cuts ADC quantization loss on
ANISOTROPIC data and is a measured no-op on the isotropic synthetic
corpus — so its win is pinned here on a constructed anisotropic
sample, not on the test tables.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.ann_index import AnnIndex
from consume_kafka_avro_data_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    kmeans_centroids,
    lloyd_l2_kmeans,
    lloyd_unit_kmeans,
    multi_ivf_assign,
    opq_train,
    pq_codebooks,
    pq_encode,
)
from consume_kafka_avro_data_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    return emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]


# -- k-means++ init ----------------------------------------------------------


def test_kmeanspp_init_deterministic_and_unit_norm():
    """Same seed → bit-identical centroids; different seed → different
    pick; all centroids unit-norm (the Lloyd's M-step renormalizes)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(512, 16))
    a = lloyd_unit_kmeans(x, k=8, seed=42, init="kmeanspp")
    b = lloyd_unit_kmeans(x, k=8, seed=42, init="kmeanspp")
    c = lloyd_unit_kmeans(x, k=8, seed=43, init="kmeanspp")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_kmeanspp_default_path_unchanged():
    """The oracle contract: the DEFAULT init must still produce the
    exact centroids the DuckDB oracles re-derive — adding the init
    parameter must not perturb the default code path."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(256, 8))
    assert np.array_equal(
        lloyd_unit_kmeans(x, k=4, seed=42),
        lloyd_unit_kmeans(x, k=4, seed=42, init="random"),
    )
    with pytest.raises(ValueError):
        lloyd_unit_kmeans(x, k=4, init="bogus")


def test_kmeanspp_spreads_seeds_on_clustered_data():
    """On well-separated clusters, k-means++ seeding lands one center
    per cluster (the property it exists for), so Lloyd's converges to
    the true centroids — while uniform seeding from a tight sample can
    collapse two clusters.  Deterministic: fixed seed and data."""
    rng = np.random.default_rng(0)
    true = np.eye(4)  # 4 orthogonal unit centroids
    x = np.vstack(
        [t + rng.normal(scale=0.01, size=(64, 4)) for t in true]
    )
    cent = lloyd_unit_kmeans(x, k=4, iters=10, seed=42, init="kmeanspp")
    # every true centroid has a learned centroid at cosine > 0.99
    sims = (true / np.linalg.norm(true, axis=1, keepdims=True)) @ cent.T
    assert (sims.max(axis=1) > 0.99).all()


# -- multiple assignment -----------------------------------------------------


def test_multi_assign_rank0_equals_single_assign(spark, emb):
    """replicas=1 must be EXACTLY ivf_assign (the stable argsort's rank
    0 ≡ argmax first-max tie-break), and replicas=2's pair set must
    contain it."""
    cent = kmeans_centroids(emb, k=8, seed=42)
    single = {
        (r.vec_id, r._ivf_cell)
        for r in ivf_assign(emb, cent).select("vec_id", "_ivf_cell").collect()
    }
    r1 = {
        (r.vec_id, r._ivf_cell)
        for r in multi_ivf_assign(emb, cent, 1)
        .select("vec_id", "_ivf_cell")
        .collect()
    }
    assert r1 == single
    r2 = multi_ivf_assign(emb, cent, 2).select("vec_id", "_ivf_cell").collect()
    pairs2 = {(r.vec_id, r._ivf_cell) for r in r2}
    assert single <= pairs2
    # exactly 2 DISTINCT cells per vector (top-2 of >=2 centroids)
    from collections import Counter

    per_id = Counter(r.vec_id for r in r2)
    assert set(per_id.values()) == {2}
    assert len(pairs2) == len(r2)  # no (id, cell) duplicates


def test_multi_assign_validates_replicas(spark, emb):
    cent = kmeans_centroids(emb, k=4, seed=42)
    with pytest.raises(ValueError):
        multi_ivf_assign(emb, cent, 0)
    # replicas beyond n_cells clamps to n_cells instead of failing
    rows = (
        multi_ivf_assign(emb.limit(4), cent, 99)
        .groupBy("vec_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 4 for r in rows)


def test_replicated_index_full_probe_equals_brute_force(
    spark, emb, qvec, tmp_path
):
    """Probing every cell of a replicas=3 index must return the exact
    brute-force top-k ONCE per id — the post-cut dedupe removes the
    replica copies without disturbing scores or tie-breaks."""
    idx = AnnIndex.build(
        spark, emb, str(tmp_path / "r3"), n_cells=8, replicas=3
    )
    want = [
        (r.vec_id, r.score) for r in brute_force_topk(emb, qvec, 10).collect()
    ]
    got = [
        (r.vec_id, r.score)
        for r in idx.query_exact(qvec, 10, nprobe=8).collect()
    ]
    assert got == want


def test_replicated_index_partial_probe_distinct_and_not_worse(
    spark, emb, qvec, tmp_path
):
    """At partial probes the replicated index must (a) never emit a
    duplicate id, and (b) recall at least as much of the truth as the
    single-assignment index at every nprobe — each vector's cell set is
    a superset of its single-assignment cell, so the probed candidate
    set can only grow."""
    truth = {r.vec_id for r in brute_force_topk(emb, qvec, 10).collect()}
    i1 = AnnIndex.build(spark, emb, str(tmp_path / "i1"), n_cells=8)
    i4 = AnnIndex.build(
        spark, emb, str(tmp_path / "i4"), n_cells=8, replicas=4
    )
    for nprobe in (1, 2, 4):
        got = [r.vec_id for r in i4.query_exact(qvec, 10, nprobe).collect()]
        assert len(got) == len(set(got)), f"dup ids at nprobe={nprobe}"
        base = {
            r.vec_id for r in i1.query_exact(qvec, 10, nprobe).collect()
        }
        assert len(set(got) & truth) >= len(base & truth)


def test_replicated_adc_distances_equal_single_assignment(
    spark, emb, qvec, tmp_path
):
    """The sum·m/count correction: a replicated index's ADC distances
    at full probe must EQUAL the single-assignment index's (copies
    carry identical codes, so the correction is exact division)."""
    i1 = AnnIndex.build(spark, emb, str(tmp_path / "a1"), n_cells=8)
    i3 = AnnIndex.build(
        spark, emb, str(tmp_path / "a3"), n_cells=8, replicas=3
    )
    d1 = {
        r.vec_id: r.adc_dist
        for r in i1.query_adc(qvec, 50, nprobe=8).collect()
    }
    d3 = {
        r.vec_id: r.adc_dist
        for r in i3.query_adc(qvec, 50, nprobe=8).collect()
    }
    assert d1 == d3


def test_replicas_and_rotation_survive_load_and_add_shard(
    spark, emb, qvec, tmp_path
):
    """The replication factor and OPQ rotation are FROZEN index
    properties: load() must restore them and add_shard must apply them
    to new generations (else old and new shards disagree on layout)."""
    path = str(tmp_path / "frozen")
    idx = AnnIndex.build(
        spark, emb, path, n_cells=8, replicas=2, opq_sweeps=2, k_codes=8
    )
    loaded = AnnIndex.load(spark, path)
    assert loaded.replicas == 2
    assert loaded.rotation is not None
    assert np.array_equal(loaded.rotation, idx.rotation)

    n = emb.count()
    loaded.add_shard(
        emb.withColumn("vec_id", F.col("vec_id") + 10_000_000), shard_id="s1"
    )
    # both generations replicated: 2 gens × 2 replicas × n rows
    assert loaded.vectors().count() == 4 * n
    # rerank stays EXACT through rotated codes + replicated rows: the
    # shortlist orders by (approximate) ADC but the final scores are
    # true cosines, so the query vector re-ranks first at cosine 1
    top = loaded.query_adc_rerank(qvec, 5, nprobe=8, shortlist=64).collect()
    assert top[0].vec_id == 1 and abs(top[0].score - 1.0) < 1e-12
    ids = [r.vec_id for r in top]
    assert len(ids) == len(set(ids))


def test_legacy_meta_without_replicas_loads_as_single_assignment(
    spark, emb, tmp_path
):
    """Metas written before the replication feature lack the fields —
    they must load as replicas=1 / no rotation, not crash."""
    import json
    import os

    path = str(tmp_path / "legacy")
    AnnIndex.build(spark, emb, path, n_cells=4, m=4, k_codes=8)
    mf = os.path.join(path, "_ann_meta.json")
    with open(mf) as f:
        meta = json.load(f)
    del meta["replicas"], meta["opq_rotation"]
    with open(mf, "w") as f:
        json.dump(meta, f)
    loaded = AnnIndex.load(spark, path)
    assert loaded.replicas == 1 and loaded.rotation is None


# -- OPQ ---------------------------------------------------------------------


def _anisotropic_sample(n=1024, dim=16, seed=3):
    """Correlated, unevenly-scaled data — the regime OPQ exists for:
    plain PQ wastes code budget on high-variance subspaces while
    starving others; the learned rotation rebalances them."""
    rng = np.random.default_rng(seed)
    scales = np.geomspace(8.0, 0.1, dim)
    basis = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    return (rng.normal(size=(n, dim)) * scales) @ basis


def _pq_mse(x, codebooks, rotation=None):
    m, _k, sub = codebooks.shape
    xr = x if rotation is None else x @ rotation
    err = 0.0
    for i in range(m):
        sv = xr[:, i * sub : (i + 1) * sub]
        cb = codebooks[i]
        d2 = (
            (sv * sv).sum(axis=1, keepdims=True)
            - 2.0 * (sv @ cb.T)
            + (cb * cb).sum(axis=1)
        )
        err += d2.min(axis=1).sum()
    return err / len(x)


def test_opq_train_deterministic_and_orthogonal():
    x = _anisotropic_sample()
    r1, cb1 = opq_train(x, m=4, k=8, sweeps=4)
    r2, cb2 = opq_train(x, m=4, k=8, sweeps=4)
    assert np.array_equal(r1, r2) and np.array_equal(cb1, cb2)
    assert np.allclose(r1.T @ r1, np.eye(x.shape[1]), atol=1e-10)
    with pytest.raises(ValueError):
        opq_train(x, m=5, k=8)  # 16 % 5 != 0


def test_opq_cuts_quantization_mse_on_anisotropic_data():
    """The operator's reason to exist, pinned as a number: on
    anisotropic data the rotated codebooks reconstruct strictly better
    than plain PQ trained on the same sample (>10% MSE cut here).
    (On the isotropic synthetic corpus the rotation is a measured
    no-op — that finding lives in the bench/SCALING notes.)"""
    x = _anisotropic_sample()
    plain = np.stack(
        [
            lloyd_l2_kmeans(x[:, i * 4 : (i + 1) * 4], k=8, seed=42 + i)
            for i in range(4)
        ]
    )
    rot, cb = opq_train(x, m=4, k=8, sweeps=8)
    mse_plain = _pq_mse(x, plain)
    mse_opq = _pq_mse(x, cb, rotation=rot)
    assert mse_opq < 0.9 * mse_plain, (mse_opq, mse_plain)


def test_pq_encode_rotation_matches_numpy(spark, emb):
    """Plumbing exactness: codes from pq_encode(rotation=R) must equal
    a driver-side numpy encode of (x @ R) under the same q20 grid."""
    from consume_kafka_avro_data_spark.operators.similarity import (
        kmeans_sample,
        quantize_np,
    )

    sample = kmeans_sample(emb)
    rot, cb = opq_train(sample, m=8, k=8, sweeps=2)
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(emb, cb, rotation=rot).collect()
    }
    raw = {r.vec_id: np.asarray(r.embedding) for r in emb.collect()}
    m, _k, sub = cb.shape
    for vid, codes in got.items():
        xr = quantize_np(raw[vid].astype(np.float64) @ rot)
        for i in range(m):
            sv = xr[i * sub : (i + 1) * sub]
            qc = quantize_np(cb[i])
            d2 = (sv * sv).sum() - 2.0 * (qc @ sv) + (qc * qc).sum(axis=1)
            assert codes[i] == int(d2.argmin()) + 1


def test_kmeanspp_empty_sample_matches_random_path():
    """Hardening: an empty training sample must return an empty
    centroid matrix on BOTH init paths (kmeanspp seeded from
    rng.integers(0) would raise instead)."""
    x = np.empty((0, 8))
    assert lloyd_unit_kmeans(x, k=4, init="kmeanspp").shape[0] == 0
    assert lloyd_unit_kmeans(x, k=4, init="random").shape[0] == 0


# -- batch ANN search (index-backed knn_join) ---------------------------------


def _mk_queries(spark, emb, ids):
    return (
        emb.where(F.col("vec_id").isin(ids))
        .select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
    )


def test_index_knn_join_full_probe_equals_brute_force(spark, emb, tmp_path):
    """With every cell probed the index-backed batch search must return
    EXACTLY the brute-force knn_join's rows — same HOF-fold scoring
    expressions on both paths, so scores match bit-for-bit."""
    from consume_kafka_avro_data_spark.operators.similarity import knn_join

    idx = AnnIndex.build(spark, emb, str(tmp_path / "kj"), n_cells=8)
    qs = _mk_queries(spark, emb, [1, 2, 3])
    want = sorted(
        (r.q_id, r.rank, r.vec_id, r.score)
        for r in knn_join(qs, emb, k=5).collect()
    )
    got = sorted(
        (r.q_id, r.rank, r.vec_id, r.score)
        for r in idx.knn_join(qs, k=5, nprobe=8).collect()
    )
    assert got == want


def test_index_knn_join_partial_probe_matches_per_query_path(
    spark, emb, tmp_path
):
    """At nprobe < n_cells each query's id set must equal the driver
    per-vector query_exact's over the same index (probe selection is
    the same ranked assignment), on the replicated index too — with no
    duplicate (query, id) pairs."""
    for replicas, sub in ((1, "r1"), (3, "r3")):
        idx = AnnIndex.build(
            spark, emb, str(tmp_path / sub), n_cells=8, replicas=replicas
        )
        qs = _mk_queries(spark, emb, [1, 2, 5])
        rows = idx.knn_join(qs, k=5, nprobe=2).collect()
        pairs = [(r.q_id, r.vec_id) for r in rows]
        assert len(pairs) == len(set(pairs))
        by_q = {}
        for r in rows:
            by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id))
        for q_id, got in by_q.items():
            qv = (
                emb.where(F.col("vec_id") == q_id)
                .collect()[0]["embedding"]
            )
            want = [
                r.vec_id
                for r in idx.query_exact(qv, 5, nprobe=2).collect()
            ]
            assert [v for _, v in sorted(got)] == want, q_id


def test_index_knn_join_shape_and_rank_bounds(spark, emb, tmp_path):
    idx = AnnIndex.build(spark, emb, str(tmp_path / "shape"), n_cells=8)
    qs = _mk_queries(spark, emb, [1, 2])
    out = idx.knn_join(qs, k=3, nprobe=1)
    assert set(out.columns) == {"q_id", "vec_id", "score", "rank"}
    rows = out.collect()
    assert {r.q_id for r in rows} == {1, 2}
    assert all(1 <= r.rank <= 3 for r in rows)
    # each query's own vector ranks first at cosine 1
    firsts = {r.q_id: (r.vec_id, r.score) for r in rows if r.rank == 1}
    for q_id, (vid, score) in firsts.items():
        assert vid == q_id and abs(score - 1.0) < 1e-12


def test_replicated_probe_still_partition_prunes(spark, emb, qvec, tmp_path):
    """Multiple assignment changes the layout's row count, not its
    pruning: a replicated index's probe must still carry the
    planning-time PartitionFilter on _ivf_cell."""
    from consume_kafka_avro_data_spark.plans.inspect import (
        partition_filters,
    )

    idx = AnnIndex.build(
        spark, emb, str(tmp_path / "pp"), n_cells=8, replicas=3
    )
    pf = partition_filters(idx._probe(qvec, nprobe=2))
    assert pf and any("_ivf_cell" in f for f in pf), pf


# -- batch ADC serving tier (knn_join_adc) -------------------------------------


def test_knn_join_adc_matches_per_query_adc(spark, emb, tmp_path):
    """The codes-only batch path must return each query's query_adc
    rows exactly — same probe cells (ranked q20 assignment), same LUT
    values (both exact integer-valued doubles on the q20 grid), same
    (adc_dist, id) ordering — on the replicated index too, with no
    duplicate (query, id) pairs."""
    for replicas, sub in ((1, "a1"), (3, "a3")):
        idx = AnnIndex.build(
            spark, emb, str(tmp_path / sub), n_cells=8, replicas=replicas
        )
        qs = _mk_queries(spark, emb, [1, 2, 5])
        rows = idx.knn_join_adc(qs, k=5, nprobe=2).collect()
        pairs = [(r.q_id, r.vec_id) for r in rows]
        assert len(pairs) == len(set(pairs))
        by_q = {}
        for r in rows:
            by_q.setdefault(r.q_id, []).append(r)
        assert set(by_q) == {1, 2, 5}
        for q_id, got in by_q.items():
            qv = (
                emb.where(F.col("vec_id") == q_id).collect()[0]["embedding"]
            )
            want = idx.query_adc(qv, 5, nprobe=2).collect()
            got = sorted(got, key=lambda r: r.rank)
            assert [r.vec_id for r in got] == [r.vec_id for r in want], q_id
            for g, w in zip(got, want):
                assert g.adc_dist == pytest.approx(w.adc_dist, abs=1e-9)


def test_knn_join_adc_rerank_matches_per_query_rerank(spark, emb, tmp_path):
    """rerank=s must reproduce query_adc_rerank(shortlist=s) per query:
    same ADC shortlist, same exact-cosine re-rank, same tie-breaks."""
    for replicas, sub in ((1, "rr1"), (3, "rr3")):
        idx = AnnIndex.build(
            spark, emb, str(tmp_path / sub), n_cells=8, replicas=replicas
        )
        qs = _mk_queries(spark, emb, [1, 3, 7])
        rows = idx.knn_join_adc(qs, k=5, nprobe=2, rerank=20).collect()
        assert set(r.q_id for r in rows) == {1, 3, 7}
        by_q = {}
        for r in rows:
            by_q.setdefault(r.q_id, []).append(r)
        for q_id, got in by_q.items():
            qv = (
                emb.where(F.col("vec_id") == q_id).collect()[0]["embedding"]
            )
            want = idx.query_adc_rerank(
                qv, k=5, nprobe=2, shortlist=20
            ).collect()
            got = sorted(got, key=lambda r: r.rank)
            assert [r.vec_id for r in got] == [r.vec_id for r in want], q_id
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w.score, abs=1e-12)


def test_knn_join_adc_scan_is_codes_only(spark, emb, tmp_path):
    """The IO contract: with rerank=None the index scan reads
    (id, codes [, partition col]) — the float embedding column must be
    absent from the batch plan's ReadSchema."""
    from consume_kafka_avro_data_spark.plans.inspect import (
        read_schema_columns,
    )

    idx = AnnIndex.build(spark, emb, str(tmp_path / "io"), n_cells=8)
    qs = _mk_queries(spark, emb, [1, 2])
    out = idx.knn_join_adc(qs, k=5, nprobe=2)
    cols = read_schema_columns(out, "vectors")
    assert cols, "expected a parquet scan of the index in the plan"
    assert "embedding" not in cols, cols
    assert "pq_codes" in cols, cols


def test_build_tuned_preset_applies_and_overrides(spark, emb, tmp_path):
    """build_tuned = build + TUNED_BUILD_PARAMS (replicas=4, 8-bit PQ,
    converged quantizer), reloadable, queryable — and an explicit
    keyword wins over the preset."""
    from consume_kafka_avro_data_spark.operators.ann_index import (
        TUNED_BUILD_PARAMS,
    )

    idx = AnnIndex.build_tuned(
        spark, emb, str(tmp_path / "tuned"), n_cells=8
    )
    assert idx.replicas == TUNED_BUILD_PARAMS["replicas"] == 4
    assert idx.codebooks.shape[1] == TUNED_BUILD_PARAMS["k_codes"] == 256
    got = idx.query_exact(
        emb.where(F.col("vec_id") == 1).collect()[0]["embedding"], 5
    ).collect()
    assert got[0].vec_id == 1  # self-match survives the preset
    reloaded = AnnIndex.load(spark, str(tmp_path / "tuned"))
    assert reloaded.replicas == 4
    over = AnnIndex.build_tuned(
        spark, emb, str(tmp_path / "tuned_o"), n_cells=8, replicas=2
    )
    assert over.replicas == 2


def test_shard_commit_key_sorts_numerically():
    """compact()'s newest-kept truncation must follow commit order for
    numeric batch ids ('b2' before 'b10'), not string order, and not
    crash on heterogeneous id shapes."""
    from consume_kafka_avro_data_spark.operators.ann_index import (
        _shard_commit_key,
    )

    ids = ["b10", "b2", "10", "2", "init"]
    assert sorted(ids, key=_shard_commit_key) == [
        "2",
        "10",
        "b2",
        "b10",
        "init",
    ]


def test_tuned_batch_adc_rerank_recall_floor(spark, emb, tmp_path):
    """Round-8 serving-story pin: the PROMOTED preset (build_tuned)
    composed with the codes-only batch path (knn_join_adc + exact
    re-rank) must clear recall@10 ≥ 0.8 against brute force at
    nprobe=8/16 cells, rerank=200 — the deployed configuration the
    bench's ``ann_index.tuned.knn_join_adc_rerank`` row measures, so
    the recall target is enforced, not just recorded."""
    idx = AnnIndex.build_tuned(
        spark, emb, str(tmp_path / "tuned"), n_cells=16
    )
    q_ids = [1, 2, 3, 5, 8]
    qs = _mk_queries(spark, emb, q_ids)
    truth = {
        i: {
            r["vec_id"]
            for r in brute_force_topk(
                emb,
                emb.where(F.col("vec_id") == i).collect()[0]["embedding"],
                10,
            ).collect()
        }
        for i in q_ids
    }
    got: dict = {}
    for r in idx.knn_join_adc(qs, k=10, nprobe=8, rerank=200).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    recall = sum(
        len(got.get(i, set()) & truth[i]) for i in q_ids
    ) / (10 * len(q_ids))
    assert recall >= 0.8, recall


# -- filtered search (round 9): metadata predicate pushdown -------------------


def test_filtered_knn_join_where_pushdown(spark, emb, tmp_path):
    """Round-9 filtered ANN: build with meta_cols=['lang'], then
    knn_join/knn_join_adc(where=) must (a) return k survivors per
    query all satisfying the predicate — k GUARANTEED post-filter,
    (b) equal post-filtering the FULL probed candidate set (at full
    probe: brute force over the filtered corpus, bit-exact scores),
    (c) push the predicate INSIDE the probed-cell scan (PushedFilters
    beneath the _ivf_cell PartitionFilters), and (d) keep the float
    column out of the ADC scan."""
    from consume_kafka_avro_data_spark.operators.similarity import knn_join
    from consume_kafka_avro_data_spark.plans.inspect import (
        partition_filters,
        pushed_filters,
        read_schema_columns,
    )

    tagged = emb.withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    idx = AnnIndex.build(
        spark, tagged, str(tmp_path / "fs"), n_cells=8, meta_cols=["lang"]
    )
    qs = _mk_queries(spark, emb, [1, 2, 3])
    cond = F.col("lang") == "en"

    got_df = idx.knn_join(qs, k=5, nprobe=8, where=cond)
    rows = got_df.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {1, 2, 3}
    assert all(len(v) == 5 for v in by_q.values())  # k post-filter
    assert all(r.vec_id % 3 == 0 for r in rows)  # predicate holds
    # (b) equality vs post-filtering the full probed candidate set
    want = sorted(
        (r.q_id, r.rank, r.vec_id, r.score)
        for r in knn_join(
            qs, tagged.where(cond).select("vec_id", "embedding"), k=5
        ).collect()
    )
    assert sorted((r.q_id, r.rank, r.vec_id, r.score) for r in rows) == want

    # ADC path: predicate holds, k survivors, float column absent,
    # predicate pushed to the scan
    adc = idx.knn_join_adc(qs, k=5, nprobe=8, where=cond)
    arows = adc.collect()
    assert all(r.vec_id % 3 == 0 for r in arows)
    assert len(arows) == 15
    assert "embedding" not in read_schema_columns(adc, "fs")
    pfs = pushed_filters(adc, "fs")
    assert any("lang" in f for f in pfs), pfs
    # the rerank tier inherits the filter through its shortlist
    rer = idx.knn_join_adc(qs, k=3, nprobe=8, rerank=10, where=cond).collect()
    assert all(r.vec_id % 3 == 0 for r in rer)
    assert len(rer) == 9

    # (c) scan-level composition: predicate + cell probe on ONE scan —
    # PartitionFilters on _ivf_cell with the lang predicate pushed
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    scan = idx._probe(qvec, nprobe=2).where(cond).select("vec_id", "pq_codes")
    assert any("_ivf_cell" in f for f in partition_filters(scan))
    assert any("lang" in f for f in pushed_filters(scan))
    assert "embedding" not in read_schema_columns(scan, "fs")


def test_meta_cols_persist_and_shard_contract(spark, emb, tmp_path):
    """meta_cols survive save→load (filtered search works on a loaded
    index), add_shard demands the columns, validation rejects missing
    or reserved names, and compact preserves the filtered surface."""
    tagged = emb.withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    path = str(tmp_path / "persist")
    idx = AnnIndex.build(
        spark, tagged.where(F.col("vec_id") <= 40), path,
        n_cells=4, meta_cols=["lang"],
    )
    loaded = AnnIndex.load(spark, path)
    assert loaded.meta_cols == ["lang"]
    qs = _mk_queries(spark, emb, [1])
    cond = F.col("lang") == "en"
    # shard WITH the column extends the filtered surface
    loaded.add_shard(
        tagged.where(
            (F.col("vec_id") > 40) & (F.col("vec_id") <= 60)
        ),
        shard_id="s1",
    )
    rows = loaded.knn_join(qs, k=5, nprobe=4, where=cond).collect()
    assert rows and all(r.vec_id % 3 == 0 for r in rows)
    # shard WITHOUT the column is an eager error
    with pytest.raises(ValueError, match="missing \\['lang'\\]"):
        loaded.add_shard(
            emb.where(F.col("vec_id") > 60).limit(5), shard_id="s2"
        )
    # compact folds generations but keeps the columns
    loaded.compact()
    reloaded = AnnIndex.load(spark, path)
    assert reloaded.meta_cols == ["lang"]
    rows2 = reloaded.knn_join(qs, k=5, nprobe=4, where=cond).collect()
    assert sorted((r.vec_id, r.rank) for r in rows2) == sorted(
        (r.vec_id, r.rank) for r in rows
    )
    # build-time validation
    with pytest.raises(ValueError, match="meta_cols"):
        AnnIndex.build(
            spark, tagged, str(tmp_path / "bad"), n_cells=4,
            meta_cols=["nope"],
        )
    with pytest.raises(ValueError, match="meta_cols"):
        AnnIndex.build(
            spark, tagged, str(tmp_path / "bad2"), n_cells=4,
            meta_cols=["embedding"],
        )


def test_filtered_per_query_paths_match_batch(spark, emb, tmp_path):
    """The per-query filtered paths (query_exact/query_adc/
    query_adc_rerank with where=) agree with the batch paths per
    query, and equal brute force over the filtered corpus at full
    probe — the same probe-selection unification contract as the
    unfiltered paths."""
    from consume_kafka_avro_data_spark.operators.similarity import (
        brute_force_topk,
    )

    tagged = emb.withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    idx = AnnIndex.build(
        spark, tagged, str(tmp_path / "pq"), n_cells=8, meta_cols=["lang"]
    )
    cond = F.col("lang") == "en"
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    # exact, full probe == brute force over the filtered corpus
    want = [
        (r.vec_id, r.score)
        for r in brute_force_topk(
            tagged.where(cond), qvec, 5
        ).collect()
    ]
    got = [
        (r.vec_id, r.score)
        for r in idx.query_exact(qvec, 5, nprobe=8, where=cond).collect()
    ]
    assert got == want
    # per-query filtered == batch filtered, partial probe
    qs = _mk_queries(spark, emb, [1, 2])
    batch = idx.knn_join(qs, k=5, nprobe=2, where=cond).collect()
    for q_id in (1, 2):
        qv = emb.where(F.col("vec_id") == q_id).collect()[0]["embedding"]
        per_q = [
            r.vec_id
            for r in idx.query_exact(qv, 5, nprobe=2, where=cond).collect()
        ]
        got_b = [
            r.vec_id
            for r in sorted(
                (r for r in batch if r.q_id == q_id),
                key=lambda r: r.rank,
            )
        ]
        assert got_b == per_q, q_id
    # ADC per-query filtered == batch ADC filtered
    adc_b = idx.knn_join_adc(qs, k=5, nprobe=2, where=cond).collect()
    for q_id in (1, 2):
        qv = emb.where(F.col("vec_id") == q_id).collect()[0]["embedding"]
        per_q = [
            (r.vec_id, r.adc_dist)
            for r in idx.query_adc(qv, 5, nprobe=2, where=cond).collect()
        ]
        got_b = [
            (r.vec_id, r.adc_dist)
            for r in sorted(
                (r for r in adc_b if r.q_id == q_id),
                key=lambda r: r.rank,
            )
        ]
        assert got_b == per_q, q_id
    # rerank tier: every survivor satisfies the predicate
    rr = idx.query_adc_rerank(
        qvec, k=3, nprobe=8, shortlist=10, where=cond
    ).collect()
    assert len(rr) == 3 and all(r.vec_id % 3 == 0 for r in rr)


def test_filtered_search_on_replicated_index(spark, emb, tmp_path):
    """meta_cols × replicas: multiple assignment duplicates index rows
    per cell, and the filtered batch path must still dedupe replica
    copies and equal brute force over the filtered corpus at full
    probe."""
    from consume_kafka_avro_data_spark.operators.similarity import knn_join

    tagged = emb.withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    idx = AnnIndex.build(
        spark, tagged, str(tmp_path / "rf"), n_cells=8, replicas=3,
        meta_cols=["lang"],
    )
    cond = F.col("lang") == "en"
    qs = _mk_queries(spark, emb, [1, 2])
    got = sorted(
        (r.q_id, r.rank, r.vec_id, r.score)
        for r in idx.knn_join(qs, k=5, nprobe=8, where=cond).collect()
    )
    want = sorted(
        (r.q_id, r.rank, r.vec_id, r.score)
        for r in knn_join(
            qs, tagged.where(cond).select("vec_id", "embedding"), k=5
        ).collect()
    )
    assert got == want
    pairs = [(q, v) for q, _, v, _ in got]
    assert len(pairs) == len(set(pairs))  # replica copies deduped


def test_add_shard_rejects_type_divergent_meta_cols(spark, emb, tmp_path):
    """ADVICE r09: name-only validation would let a shard carrying an
    int 'lang' against a string-built index COMMIT a type-divergent
    generation whose failure surfaces far away (compact's unionByName,
    or silently-empty filters at query time).  The built generation's
    meta-column TYPES persist in the meta doc and add_shard rejects a
    mismatch eagerly, before anything is written."""
    tagged = emb.withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    path = str(tmp_path / "typed")
    idx = AnnIndex.build(
        spark, tagged.where(F.col("vec_id") <= 40), path,
        n_cells=4, meta_cols=["lang"],
    )
    assert idx.meta_col_types == {"lang": "string"}
    # the frozen types survive save -> load
    loaded = AnnIndex.load(spark, path)
    assert loaded.meta_col_types == {"lang": "string"}
    bad = (
        emb.where(F.col("vec_id") > 40)
        .limit(5)
        .withColumn("lang", (F.col("vec_id") % 3).cast("int"))
    )
    gens_before = sorted(loaded.vectors_dirs)
    with pytest.raises(TypeError, match="lang is int .* built with string"):
        loaded.add_shard(bad, shard_id="s_bad")
    # eager = nothing committed: the live generation list is untouched
    assert sorted(AnnIndex.load(spark, path).vectors_dirs) == gens_before
    # the correctly-typed shard still lands, and the types survive
    # add_shard's meta rewrite and compact's
    loaded.add_shard(
        tagged.where((F.col("vec_id") > 40) & (F.col("vec_id") <= 50)),
        shard_id="s_ok",
    )
    loaded.compact()
    assert AnnIndex.load(spark, path).meta_col_types == {"lang": "string"}


def test_filtered_recall_floor_on_tuned_preset(spark, emb, tmp_path):
    """Round-10 filtered-serving floor (the r09 paths were
    equality-pinned but had no recall accountability — a filter that
    empties probed cells is exactly where IVF recall quietly
    collapses): on the PROMOTED preset (build_tuned, replicas=4),
    knn_join and knn_join_adc+rerank under selective predicates (1/10
    and 1/25 of the corpus) must clear recall@10 >= 0.9 against brute
    force over the FILTERED corpus at nprobe=8 of 16 cells — the
    deployed filtered configuration the bench's
    ``ann_index.tuned.filtered`` row measures.

    Recorded finding (measured, bench row keeps the numbers): at
    nprobe=4 the 1/25-selective filter falls to ~0.78 — per-cell
    survivor sets thin out with selectivity, so a deployment scales
    nprobe with 1/selectivity; replicas=4 is what keeps nprobe=8
    sufficient here."""
    from consume_kafka_avro_data_spark.operators.similarity import (
        knn_join as bf_knn,
    )

    for mod in (10, 25):
        tagged = emb.withColumn(
            "m", (F.col("vec_id") % mod == 0).cast("string")
        )
        idx = AnnIndex.build_tuned(
            spark, tagged, str(tmp_path / f"t{mod}"), n_cells=16,
            meta_cols=["m"],
        )
        qs = _mk_queries(spark, emb, [1, 2, 3, 5, 8])
        cond = F.col("m") == "true"
        truth: dict = {}
        for r in bf_knn(qs, tagged.where(cond), k=10).collect():
            truth.setdefault(r["q_id"], set()).add(r["vec_id"])
        denom = sum(len(t) for t in truth.values())
        for name, rows in (
            ("knn_join", idx.knn_join(qs, k=10, nprobe=8, where=cond)),
            (
                "knn_join_adc",
                idx.knn_join_adc(
                    qs, k=10, nprobe=8, rerank=200, where=cond
                ),
            ),
        ):
            got: dict = {}
            for r in rows.collect():
                got.setdefault(r["q_id"], set()).add(r["vec_id"])
            recall = (
                sum(len(got.get(q, set()) & t) for q, t in truth.items())
                / denom
            )
            assert recall >= 0.9, (mod, name, recall)


def test_auto_nprobe_recovers_filtered_recall(spark, emb, tmp_path):
    """Round-11 verdict task: selectivity-aware probe escalation.  The
    r10 recorded finding is that nprobe=4 filtered recall decays to
    ~0.78 at 1/25 selectivity (per-cell survivor sets thin out) and
    the CALLER had to know to raise nprobe.  With auto_nprobe=True the
    index measures the predicate's survivor fraction (one meta-column
    count; total from footers) and widens the probe list so the
    expected filtered candidate pool matches the unfiltered pool at
    the base nprobe — recall@10 >= 0.9 at BOTH 1/10 and 1/25
    selectivity with the caller still passing nprobe=4, on both the
    exact and the ADC+rerank batch paths.  resolve_nprobe itself is
    pinned: ceil(nprobe/s) capped at n_cells, identity without a
    filter, full-probe on a nothing-survives predicate."""
    from consume_kafka_avro_data_spark.operators.similarity import (
        knn_join as bf_knn,
    )

    for mod in (10, 25):
        tagged = emb.withColumn(
            "m", (F.col("vec_id") % mod == 0).cast("string")
        )
        idx = AnnIndex.build_tuned(
            spark, tagged, str(tmp_path / f"a{mod}"), n_cells=16,
            meta_cols=["m"],
        )
        qs = _mk_queries(spark, emb, [1, 2, 3, 5, 8])
        cond = F.col("m") == "true"
        # resolve_nprobe: s ~= 1/mod, so 4/s = 4*mod caps at n_cells
        assert idx.resolve_nprobe(4, cond) == 16
        assert idx.resolve_nprobe(4, None) == 4
        assert idx.resolve_nprobe(4, F.col("m") == "never") == 16
        # half-selective predicate escalates to ~2x, NOT to full probe
        half = idx.resolve_nprobe(4, F.col("vec_id") % 2 == 0)
        assert 8 <= half < 16
        truth: dict = {}
        for r in bf_knn(qs, tagged.where(cond), k=10).collect():
            truth.setdefault(r["q_id"], set()).add(r["vec_id"])
        denom = sum(len(t) for t in truth.values())
        for name, rows in (
            (
                "knn_join",
                idx.knn_join(qs, k=10, nprobe=4, where=cond,
                             auto_nprobe=True),
            ),
            (
                "knn_join_adc",
                idx.knn_join_adc(qs, k=10, nprobe=4, rerank=200,
                                 where=cond, auto_nprobe=True),
            ),
        ):
            got: dict = {}
            for r in rows.collect():
                got.setdefault(r["q_id"], set()).add(r["vec_id"])
            recall = (
                sum(len(got.get(q, set()) & t) for q, t in truth.items())
                / denom
            )
            assert recall >= 0.9, (mod, name, recall)
        # single-query paths accept the same knob; the resolved width
        # makes them row-identical to the explicitly-escalated call
        qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
        want_rows = [
            (r.vec_id, r.score)
            for r in idx.query_exact(
                qvec, 10, nprobe=16, where=cond
            ).collect()
        ]
        got_rows = [
            (r.vec_id, r.score)
            for r in idx.query_exact(
                qvec, 10, nprobe=4, where=cond, auto_nprobe=True
            ).collect()
        ]
        assert got_rows == want_rows
