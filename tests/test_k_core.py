"""k-core extraction (operators/graph.k_core, Seidman 1983): the
distributed peeling loop must return EXACTLY the maximal subgraph a
pure-Python peeling reference produces — nodes and within-core
degrees — on fixed examples and arbitrary generated graphs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.graph import k_core


def _ref_k_core(edges, k):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    while True:
        low = {n for n in nodes if len(adj[n] & nodes) < k}
        if not low:
            break
        nodes -= low
    return {n: len(adj[n] & nodes) for n in nodes}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges or [(0, 0)], "source_id long, target_id long"
    ).limit(len(edges))


def test_fixed_example_with_peeling_cascade(spark):
    """A triangle (the 2-core) with a pendant path: peeling the path
    tail cascades (removing 4 drops 3's degree below 2) — the classic
    case where one low-degree sweep is NOT enough."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    stats: dict = {}
    out = k_core(_edges_df(spark, edges), k=2, stats=stats)
    got = {r["node"]: r["degree"] for r in out.collect()}
    out.unpersist()
    assert got == {0: 2, 1: 2, 2: 2}
    assert stats["rounds"] == 2  # 4 peels first, then 3


def test_k1_keeps_every_non_isolated_node(spark):
    edges = [(1, 2), (3, 4), (5, 5)]  # self-loop never counts
    out = k_core(_edges_df(spark, edges), k=1)
    got = {r["node"]: r["degree"] for r in out.collect()}
    out.unpersist()
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_empty_core(spark):
    edges = [(0, 1), (1, 2)]  # a path has no 2-core
    out = k_core(_edges_df(spark, edges), k=2)
    assert out.count() == 0
    out.unpersist()


def test_directed_and_duplicate_edges_symmetrize(spark):
    """(a,b) and (b,a) plus duplicates are ONE undirected edge."""
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0)]
    out = k_core(_edges_df(spark, edges), k=2)
    got = {r["node"]: r["degree"] for r in out.collect()}
    out.unpersist()
    assert got == {0: 2, 1: 2, 2: 2}


def test_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        k_core(_edges_df(spark, [(0, 1)]), k=0)


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=16,
)


@given(edges=EDGES, k=st.integers(min_value=1, max_value=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_models_reference_on_any_graph(spark, edges, k):
    """LAW: for ANY small graph and k, nodes AND within-core degrees
    equal the pure-Python peeling reference exactly."""
    out = k_core(_edges_df(spark, edges), k=k)
    got = {r["node"]: r["degree"] for r in out.collect()}
    out.unpersist()
    assert got == _ref_k_core(edges, k)


# -- full decomposition ------------------------------------------------------

from consume_kafka_avro_data_spark.operators.graph import core_numbers  # noqa: E402


def _ref_core_numbers(edges):
    """Coreness via repeated peeling: max k with the node in the
    k-core."""
    out: dict = {}
    k = 1
    while True:
        core = _ref_k_core(edges, k)
        if not core:
            break
        for n in core:
            out[n] = k
        k += 1
    return out


def test_core_numbers_fixed_example(spark):
    """Triangle (coreness 2) + pendant path (coreness 1) + an isolated
    self-loop (absent)."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (9, 9)]
    stats: dict = {}
    out = core_numbers(_edges_df(spark, edges), stats=stats)
    got = {r["node"]: r["coreness"] for r in out.collect()}
    out.unpersist()
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}
    assert stats["rounds"] >= 1


@given(edges=EDGES)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_core_numbers_model_reference_and_kcore_law(spark, edges):
    """LAWS: (a) the h-index iteration converges exactly to the
    peeling reference's coreness on ANY graph; (b) k_core(k)'s node
    set == {coreness ≥ k} for every k up to the max."""
    out = core_numbers(_edges_df(spark, edges))
    got = {r["node"]: r["coreness"] for r in out.collect()}
    out.unpersist()
    want = _ref_core_numbers(edges)
    assert got == want
    for k in range(1, max(want.values(), default=0) + 1):
        core = k_core(_edges_df(spark, edges), k)
        nodes = {r["node"] for r in core.collect()}
        core.unpersist()
        assert nodes == {n for n, c in want.items() if c >= k}


def test_core_numbers_max_iter_caps_rounds(spark):
    stats: dict = {}
    out = core_numbers(
        _edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]),
        max_iter=1,
        stats=stats,
    )
    out.unpersist()
    assert stats["rounds"] == 1


def test_core_numbers_rejects_zero_max_iter(spark):
    """max_iter=0 would return raw degrees labeled 'coreness' with no
    signal the iteration never ran — rejected eagerly (r08 advisor)."""
    with pytest.raises(ValueError, match="max_iter must be >= 1"):
        core_numbers(_edges_df(spark, [(0, 1)]), max_iter=0)


def _legacy_collect_coreness(spark, edges):
    """The pre-round-9 kernel — per-node collect_list h-index — kept
    here as the equality pin for the width-free rewrite (the two must
    agree on every graph; the rewrite changes the KERNEL, never the
    iteration)."""
    from pyspark.sql import functions as F

    e = _edges_df(spark, edges).select(
        F.col("source_id").alias("a"), F.col("target_id").alias("b")
    )
    e = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    vals = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("int").alias("c"))
        .localCheckpoint()
    )
    while True:
        neigh = e.join(
            vals.select(F.col("node").alias("_n"), F.col("c")),
            on=F.col("b") == F.col("_n"),
        ).select(F.col("a").alias("node"), "c")
        arr = F.sort_array(F.collect_list("c"), asc=False)
        new_vals = neigh.groupBy("node").agg(
            F.aggregate(
                F.zip_with(
                    arr,
                    F.sequence(F.lit(1), F.size(arr)),
                    lambda v, i: F.when(v >= i, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            .cast("int")
            .alias("c")
        ).localCheckpoint()
        changed = (
            new_vals.join(
                vals.select(F.col("node").alias("_pn"), F.col("c").alias("_pc")),
                on=F.col("node") == F.col("_pn"),
            )
            .where(F.col("c") != F.col("_pc"))
            .count()
        )
        vals.unpersist()
        vals = new_vals
        if changed == 0:
            break
    got = {r["node"]: r["c"] for r in vals.collect()}
    vals.unpersist()
    e.unpersist()
    return got


@given(edges=EDGES)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_core_numbers_width_free_matches_legacy_kernel(spark, edges):
    """LAW: the round-9 width-free kernel (count identity, no
    collect_list) equals the legacy collected-array h-index on ANY
    graph."""
    out = core_numbers(_edges_df(spark, edges))
    got = {r["node"]: r["coreness"] for r in out.collect()}
    out.unpersist()
    assert got == _legacy_collect_coreness(spark, edges)


def test_core_numbers_power_law_hub(spark):
    """The case the rewrite exists for: a 10,000-degree hub (a star
    whose spokes also chain into a path) plus a clique — per-node
    state must stay narrow (no degree-wide arrays) and the coreness
    must still match the peeling reference AND the legacy kernel.

    Graph: hub 0 — spokes 1..10000; spokes i—i+1 chained for the first
    40 (so peeling cascades; the h-index front moves ONE chain node
    per round from each end, so chain length bounds test wall — 40
    keeps the cascade real at ~20 rounds); nodes 20001..20005 form a
    5-clique with the hub attached to one corner."""
    hub_edges = [(0, i) for i in range(1, 10_001)]
    chain = [(i, i + 1) for i in range(1, 40)]
    clique_nodes = list(range(20_001, 20_006))
    clique = [
        (a, b)
        for i, a in enumerate(clique_nodes)
        for b in clique_nodes[i + 1 :]
    ]
    edges = hub_edges + chain + clique + [(0, 20_001)]
    stats: dict = {}
    out = core_numbers(_edges_df(spark, edges), stats=stats)
    got = {r["node"]: r["coreness"] for r in out.collect()}
    out.unpersist()
    want = _ref_core_numbers(edges)
    assert got == want
    assert got == _legacy_collect_coreness(spark, edges)
    # sanity anchors so the fixture itself is meaningful, not just
    # self-consistent: the 5-clique is the 4-core; the hub survives
    # only into the 2-core (via its chained spokes)
    assert max(got.values()) == 4
    assert got[0] == 2
    assert stats["rounds"] >= 1
