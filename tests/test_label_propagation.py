"""Synchronous label propagation (operators/graph.label_propagation):
the distributed rounds must model a pure-Python synchronous LPA with
the identical (count desc, label asc) tie-break — fixed two-clique
example plus a hypothesis law over generated graphs — and separate
well-connected cliques into distinct communities."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.graph import label_propagation


def _ref_lpa(edges, max_iter):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for n in adj:
            counts = Counter(labels[v] for v in adj[n])
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges or [(0, 0)], "source_id long, target_id long"
    ).limit(len(edges))


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_two_cliques_with_a_bridge_form_two_communities(spark):
    edges = _clique([0, 1, 2, 3]) + _clique([10, 11, 12, 13]) + [(3, 10)]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edges_df(spark, edges), max_iter=8).collect()
    }
    assert got == _ref_lpa(edges, 8)
    # each clique converges to one label, and the labels differ
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=16,
)


@given(edges=EDGES, iters=st.integers(min_value=1, max_value=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lpa_models_reference_on_any_graph(spark, edges, iters):
    """For ANY small graph and ANY iteration budget the synchronous
    rounds (same tie-break, same early stop) match the pure-Python
    model exactly — including oscillating bipartite cases, which both
    sides cut at the same budget."""
    df = _edges_df(spark, edges)
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iter=iters).collect()
    }
    assert got == _ref_lpa(edges, iters)
