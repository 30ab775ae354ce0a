"""Oracle-differential harness: every registered query with a SQL twin
must match DuckDB exactly (row count, columns, values) at sf0.001 —
a strictly harder local version of the driver's hash comparison, run
before every commit so the driver never sees a mismatch first.
"""

from __future__ import annotations

import datetime
import math

import numpy as np
import pandas as pd
import pytest

from consume_kafka_avro_data_spark.registry import all_queries

QUERIES = all_queries()
# oracle_text() resolves lazy oracle factories (conftest pins
# SPARK_GRAFT_TEST_SF_DIR before this import, so factories see the same
# sf the tests run against)
SQL_CHECKED = sorted(n for n, q in QUERIES.items() if q.oracle_text() is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle_text() is None)


def canon(v) -> str:
    """Engine-independent canonical string for a cell value."""
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        # a DATE comes back as datetime.date from Spark but midnight
        # Timestamp from DuckDB — canonicalize midnight to the date form
        return v.date().isoformat() if v == v.normalize() else v.isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        return canon(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return repr(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERIES[name]
    got = normalize(q.fn(spark, sf_dir).toPandas())
    want = normalize(duck.sql(q.oracle_text()).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    diff = (got != want).any(axis=1)
    if diff.any():
        idx = diff[diff].index[:5]
        raise AssertionError(
            f"{name}: {int(diff.sum())}/{len(got)} rows differ; first diffs:\n"
            f"spark:\n{got.loc[idx]}\noracle:\n{want.loc[idx]}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
