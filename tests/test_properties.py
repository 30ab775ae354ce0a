"""Property-based algebraic tests (SURVEY §5): dedup idempotence and
set-operation algebra over generated inputs, checked against Python
set semantics as the model.  Complements the oracle-differential tests
(fixed data, many queries) with many-inputs/few-laws coverage.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

ROWS = st.lists(
    st.tuples(st.integers(min_value=-5, max_value=5), st.sampled_from("abc")),
    min_size=0,
    max_size=12,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, "zz")], ["k", "v"]).limit(
        len(rows)
    )  # limit(0) of the sentinel row models the empty frame


@given(rows=ROWS)
@SETTINGS
def test_dedup_is_idempotent_and_models_set(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    assert got_once == sorted(set(rows))


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_union_except_intersect_model_multiset_algebra(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert sorted(map(tuple, da.unionAll(db).collect())) == sorted(a + b)
    assert sorted(map(tuple, da.exceptAll(db).collect())) == sorted(
        (Counter(a) - Counter(b)).elements()
    )
    assert sorted(map(tuple, da.intersect(db).collect())) == sorted(
        set(a) & set(b)
    )


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_distinct_union_except_set_identity(spark, a, b):
    """(A ∪ B) − B == A − B under DISTINCT semantics."""
    da, db = _df(spark, a), _df(spark, b)
    lhs = da.union(db).distinct().exceptAll(db.distinct())
    rhs = da.distinct().exceptAll(db.distinct())
    assert sorted(map(tuple, lhs.collect())) == sorted(map(tuple, rhs.collect()))
    assert sorted(map(tuple, rhs.collect())) == sorted(set(a) - set(b))
