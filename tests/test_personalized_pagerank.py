"""Personalized PageRank (operators/graph.personalized_pagerank): the
distributed power iteration must model a pure-Python implementation of
the textbook recursion (restart at the source set, dangling mass
through the personalization vector) to 1e-9, conserve Σ rank = 1 at
the fixed point of every budget, and rank the source's neighborhood
above distant nodes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.graph import personalized_pagerank


def _ref_ppr(edges, sources, damping, iters):
    out: dict = {}
    for a, b in set(edges):
        out.setdefault(a, set()).add(b)
    nodes = {n for ab in edges for n in ab} | set(sources)
    p = {n: 0.0 for n in nodes}
    for s in dict.fromkeys(sources):
        p[s] = 1.0 / len(dict.fromkeys(sources))
    rank = dict(p)
    for _ in range(iters):
        dangling = sum(r for n, r in rank.items() if n not in out)
        new = {}
        for n in nodes:
            new[n] = (1 - damping) * p[n] + damping * dangling * p[n]
        for a, nbrs in out.items():
            share = rank[a] / len(nbrs)
            for b in nbrs:
                new[b] += damping * share
        rank = new
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges or [(0, 0)], "source_id long, target_id long"
    ).limit(len(edges))


def test_matches_reference_and_conserves_mass(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (9, 0)]
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges), [0], iters=8
        ).collect()
    }
    want = _ref_ppr(edges, [0], 0.85, 8)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # locality: the restart node outranks the far tail, and node 9
    # (pointing IN, never receiving) holds only restart leakage
    assert got[0] > got[4] and got[0] > got[9]


def test_multi_source_and_dangling(spark):
    # node 3 is dangling: its mass must restart through the sources
    edges = [(0, 3), (1, 3)]
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges), [0, 1, 0], iters=6
        ).collect()
    }
    want = _ref_ppr(edges, [0, 1], 0.85, 6)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[0] == pytest.approx(got[1])  # symmetric sources


def test_validation(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="sources"):
        personalized_pagerank(df, [])
    with pytest.raises(ValueError, match="damping"):
        personalized_pagerank(df, [0], damping=1.0)


def test_tol_early_stop_matches_fixed_iters(spark):
    """Round-8: tol= stops as soon as the L1 residual meets the bound,
    and the returned vector is EXACTLY the fixed-iters vector of
    however many rounds actually ran — the early stop changes when the
    loop exits, never what a round computes."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (9, 0)]
    stats: dict = {}
    # damping 0.35: residual decays ~0.35^k, so the 1e-5 stop fires
    # well inside the 30-round budget (at 0.85 it would take ~100)
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges),
            [0],
            damping=0.35,
            iters=30,
            tol=1e-5,
            stats=stats,
        ).collect()
    }
    assert stats["rounds"] < 30  # fast-mixing setup: the stop fired
    assert stats["final_residual"] <= 1e-5
    # bit-identical to the fixed-budget run of the same round count
    fixed = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges),
            [0],
            damping=0.35,
            iters=stats["rounds"],
        ).collect()
    }
    assert got == fixed
    # and both match the reference recursion at that round count
    want = _ref_ppr(edges, [0], 0.35, stats["rounds"])
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)


def test_tol_validation(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="tol"):
        personalized_pagerank(df, [0], tol=0.0)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=10,
    ),
    tol=st.sampled_from([1e-1, 1e-3, 1e-6]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_early_stop_never_fires_before_the_bound(spark, edges, tol):
    """LAW: for ANY graph and tolerance, an early exit implies the
    observed residual actually met the bound; otherwise the full
    budget ran.  Either way Σ rank = 1 holds."""
    stats: dict = {}
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges), [0], iters=6, tol=tol, stats=stats
        ).collect()
    }
    assert stats["rounds"] == 6 or stats["final_residual"] <= tol
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=12,
)


@given(edges=EDGES, iters=st.integers(min_value=1, max_value=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_models_reference_on_any_graph(spark, edges, iters):
    """For ANY small digraph and budget: ranks match the pure-Python
    recursion to 1e-9 and total mass stays 1."""
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            _edges_df(spark, edges), [0], iters=iters
        ).collect()
    }
    want = _ref_ppr(edges, [0], 0.85, iters)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
