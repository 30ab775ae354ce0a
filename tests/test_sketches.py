"""Mergeable sketches (operators/sketches): KMV bottom-k sketches must
be exact below capacity, commute with union (an exact set law, not a
tolerance), estimate within the published error at capacity, and be
layout-independent; Misra–Gries heavy hitters must honor both halves
of the deterministic guarantee (presence above n/(k+1), undercount at
most n/(k+1)) on generated inputs against a Counter model."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.sketches import (
    HeavyHitters,
    heavy_hitters,
    kmv_jaccard,
    kmv_sketch,
    kmv_union,
)


def _vals(spark, values, col="v"):
    return spark.createDataFrame([(v,) for v in values], f"{col} string")


def test_kmv_exact_below_capacity(spark):
    df = _vals(spark, ["a", "b", "c", "a", "b", None])
    sk = kmv_sketch(df, "v", k=16)
    assert sk.exact
    assert sk.distinct_estimate() == 3.0  # NULL excluded


def test_kmv_union_law_is_exact_set_equality(spark):
    """Sketching commutes with union: merging two sketches yields the
    SAME hash set as sketching the unioned frame — at a k small enough
    to force truncation on every side."""
    a_vals = [f"a{i}" for i in range(40)]
    b_vals = [f"b{i}" for i in range(40)] + a_vals[:10]
    a, b = _vals(spark, a_vals), _vals(spark, b_vals)
    sk_a = kmv_sketch(a, "v", k=16)
    sk_b = kmv_sketch(b, "v", k=16)
    merged = kmv_union(sk_a, sk_b)
    direct = kmv_sketch(a.unionAll(b), "v", k=16)
    assert merged == direct
    # and with mixed capacities the union adopts min(k)
    sk_b8 = kmv_sketch(b, "v", k=8)
    assert kmv_union(sk_a, sk_b8).k == 8
    assert kmv_union(sk_a, sk_b8) == kmv_sketch(a.unionAll(b), "v", k=8)


def test_kmv_layout_independent(spark):
    vals = [f"x{i}" for i in range(200)]
    df = _vals(spark, vals)
    assert kmv_sketch(df.coalesce(1), "v", k=32) == kmv_sketch(
        df.repartition(7), "v", k=32
    )


def test_kmv_estimate_within_published_error(spark):
    """10k distinct values at k=256: the KMV estimator's relative
    error ≈ 1/√(k−2) ≈ 6%; assert a 4-sigma envelope (deterministic —
    xxhash64 has no RNG, so this is a pinned observation, not a flaky
    statistical test)."""
    df = spark.range(10_000).select(F.concat(F.lit("v"), "id").alias("v"))
    sk = kmv_sketch(df, "v", k=256)
    assert not sk.exact
    est = sk.distinct_estimate()
    assert abs(est - 10_000) / 10_000 < 0.25


def test_kmv_jaccard_exact_and_estimated(spark):
    # exact mode: J = 10/70
    a = _vals(spark, [f"a{i}" for i in range(40)])
    b = _vals(spark, [f"b{i}" for i in range(30)] + [f"a{i}" for i in range(10)])
    got = kmv_jaccard(kmv_sketch(a, "v", k=512), kmv_sketch(b, "v", k=512))
    assert got["jaccard"] == pytest.approx(10 / 70)
    assert got["union"] == pytest.approx(70.0)
    assert got["intersection"] == pytest.approx(10.0)
    # estimated mode: 5k ∩ 5k of 10k-each corpora (J = 1/3) at k=512
    big_a = spark.range(10_000).select(F.concat(F.lit("s"), "id").alias("v"))
    big_b = spark.range(5_000, 15_000).select(
        F.concat(F.lit("s"), "id").alias("v")
    )
    est = kmv_jaccard(kmv_sketch(big_a, "v", k=512), kmv_sketch(big_b, "v", k=512))
    assert est["jaccard"] == pytest.approx(1 / 3, rel=0.3)
    assert est["intersection"] == pytest.approx(5_000, rel=0.35)
    assert est["union"] == pytest.approx(15_000, rel=0.25)


def test_kmv_validates_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(_vals(spark, ["a"]), "v", k=1)


def test_heavy_hitters_spark_example(spark):
    """Skewed data spread over partitions: the dominant values are
    present with lower-bound counts obeying the guarantee; NULLs are
    excluded from n."""
    rows = (
        [("hot",)] * 500
        + [("warm",)] * 200
        + [(f"cold{i}",) for i in range(300)]
        + [(None,)] * 50
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    hh = heavy_hitters(df, "v", k=16)
    assert hh.n == 1000
    assert hh.error_bound == 1000 / 17
    assert "hot" in hh.items and "warm" in hh.items
    for item, bound in hh.items.items():
        true = {"hot": 500, "warm": 200}.get(item, 1)
        assert bound <= true <= bound + hh.error_bound
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", k=0)


VALS = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=0,
    max_size=60,
)


@given(values=VALS, k=st.integers(min_value=1, max_value=5))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heavy_hitters_guarantee_law(spark, values, k):
    """For ANY input and budget: (1) every value with true frequency
    > n/(k+1) is reported, (2) every report is a lower bound, (3) no
    report undercounts by more than n/(k+1) — the Misra–Gries theorem
    surviving the distributed per-partition + merge path."""
    df = spark.createDataFrame(
        [(v,) for v in values] or [(None,)], "v string"
    ).repartition(3)
    hh = heavy_hitters(df, "v", k=k)
    true = Counter(values)
    n = sum(true.values())
    assert hh.n == n
    bound = n / (k + 1)
    for v, c in true.items():
        if c > bound:
            assert v in hh.items
    for v, est in hh.items.items():
        assert est <= true[v] <= est + bound


def test_heavy_hitters_dataclass_contract():
    hh = HeavyHitters(items={"a": 3}, n=10, k=4)
    assert hh.error_bound == 2.0


def test_kmv_plan_shape(spark):
    """The sketch's lazy plan is distinct + TakeOrdered — the driver
    receives k rows; no global sort materializes the corpus."""
    df = spark.range(1000).select(F.concat(F.lit("v"), "id").alias("v"))
    plan = (
        df.where(F.col("v").isNotNull())
        .select(F.xxhash64(F.col("v")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1  # the distinct's — nothing else


def test_heavy_hitters_nullable_int_keys_keep_integer_identity(spark):
    """Round-8 fix: pandas widens a NULLABLE integer column to float64,
    which used to render 2 as '2.0' — splitting the key from the '2'
    that non-null batches produce.  Int-like floats from an integer
    Spark column must normalize to the integer rendering, NULLs stay
    excluded, and counts stay exact."""
    rows = [(1, 7)] * 5 + [(2, 9)] * 3 + [(3, None)] * 2
    df = spark.createDataFrame(rows, "doc_id long, v int")
    hh = heavy_hitters(df.repartition(4), "v", k=8)
    assert hh.items == {"7": 5, "9": 3}  # '7', never '7.0'
    assert hh.n == 8  # NULLs counted out
