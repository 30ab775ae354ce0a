"""As-of join (J7) semantics: direction, strictness, equal-ts ties,
no-match NULLs — pinned against hand-computed expectations and, for the
backward-inclusive default, against pandas.merge_asof.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.asof import asof_join

LEFT = [
    # key, ts, lv
    ("a", 10, "L1"),
    ("a", 20, "L2"),
    ("a", 30, "L3"),
    ("b", 15, "L4"),
    ("c", 5, "L5"),  # key with no right rows at all
]
RIGHT = [
    # key, ts, rv
    ("a", 5, "R1"),
    ("a", 20, "R2"),  # equal-ts with L2
    ("a", 25, "R3"),
    ("b", 99, "R4"),  # only later than L4
]


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(LEFT, "k string, ts long, lv string")
    right = spark.createDataFrame(RIGHT, "k string, ts long, rv string")
    return left, right


def rows(df):
    return {
        (r["k"], r["ts"]): (r["asof_ts"], r["asof_rv"]) for r in df.collect()
    }


def test_backward_inclusive(frames):
    left, right = frames
    got = rows(asof_join(left, right, "k", "ts", "ts", ["rv"]))
    assert got == {
        ("a", 10): (5, "R1"),
        ("a", 20): (20, "R2"),  # inclusive: equal ts matches
        ("a", 30): (25, "R3"),
        ("b", 15): (None, None),
        ("c", 5): (None, None),
    }


def test_backward_strict(frames):
    left, right = frames
    got = rows(asof_join(left, right, "k", "ts", "ts", ["rv"], strict=True))
    assert got[("a", 20)] == (5, "R1")  # strict: equal ts excluded
    assert got[("a", 30)] == (25, "R3")


def test_forward_inclusive(frames):
    left, right = frames
    got = rows(asof_join(left, right, "k", "ts", "ts", ["rv"], direction="forward"))
    assert got == {
        ("a", 10): (20, "R2"),
        ("a", 20): (20, "R2"),
        ("a", 30): (None, None),
        ("b", 15): (99, "R4"),
        ("c", 5): (None, None),
    }


def test_forward_strict(frames):
    left, right = frames
    got = rows(
        asof_join(left, right, "k", "ts", "ts", ["rv"], direction="forward", strict=True)
    )
    assert got[("a", 20)] == (25, "R3")


def test_matches_pandas_merge_asof(frames):
    left, right = frames
    got = rows(asof_join(left, right, "k", "ts", "ts", ["rv"]))
    lp = pd.DataFrame(LEFT, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for rec in want.to_dict("records"):
        rv = None if pd.isna(rec["rv"]) else rec["rv"]
        assert got[(rec["k"], rec["ts"])][1] == rv


def test_left_columns_and_count_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", "ts", ["rv"])
    assert out.count() == len(LEFT)
    assert set(out.columns) == {"k", "ts", "lv", "asof_ts", "asof_rv"}


def test_single_shuffle_plan(frames):
    """The 100 TB contract: exactly one exchange (hash by key), however
    many right rows precede each left row."""
    left, right = frames
    plan = asof_join(left, right, "k", "ts", "ts", ["rv"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_timestamps_never_match(spark):
    """Null-ts left rows ride along unmatched; null-ts right rows are
    invisible to matching (merge_asof semantics: null keys don't join)."""
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "ok"), (1, None, "null-ts")],
        "k int, lts string, tag string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 100.0), (1, None, -1.0)],
        "k int, rts string, px double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    out = {r.tag: r for r in asof_join(left, right, "k", "lts", "rts").collect()}
    assert out["ok"].asof_px == 100.0  # real match unaffected
    assert out["null-ts"].asof_px is None  # null ts ⇒ no match
    assert out["null-ts"].asof_rts is None
    # forward direction: the null-ts right row must not be matched either
    fwd = {r.tag: r for r in asof_join(
        left, right, "k", "lts", "rts", direction="forward"
    ).collect()}
    assert fwd["ok"].asof_px is None  # nothing at/after 10:00 with real ts
    assert fwd["null-ts"].asof_px is None


def test_asof_tolerance_nulls_stale_matches(spark):
    """merge_asof(tolerance=...) semantics: a running match older than
    the tolerance becomes no-match, matching pandas exactly."""
    import pandas as pd

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (1, "2024-01-01 01:00:00")],
        "k INT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7.0)], "k INT, rts STRING, v DOUBLE"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        tolerance_seconds=60.0,
    ).orderBy("ts").collect()
    assert out[0].asof_v == 7.0          # 10s gap: within tolerance
    assert out[1].asof_v is None          # 1h gap: nulled
    assert out[1].asof_rts is None

    # pandas reference on the same frames
    lp = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(
        ["2024-01-01 00:00:10", "2024-01-01 01:00:00"])})
    rp = pd.DataFrame({"k": [1], "rts": pd.to_datetime(["2024-01-01 00:00:00"]),
                       "v": [7.0]})
    ref = pd.merge_asof(lp.sort_values("ts"), rp.sort_values("rts"),
                        left_on="ts", right_on="rts", by="k",
                        tolerance=pd.Timedelta(seconds=60))
    assert (ref["v"].isna().tolist() == [r.asof_v is None for r in out])


def test_asof_null_keys_never_match(spark):
    """NULL join keys are no-match rows (SQL equi-join / merge_asof
    semantics) — Window.partitionBy would otherwise group NULL keys
    into one partition and let a NULL-key left row adopt a NULL-key
    right row as its match."""
    left = spark.createDataFrame(
        [(None, 20, "null-key"), ("a", 20, "real-key")],
        "k string, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(None, 10, "R-null"), ("a", 10, "R-a")],
        "k string, ts long, rv string",
    )
    out = {r.lv: r for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert len(out) == 2  # both left rows survive
    assert out["real-key"].asof_rv == "R-a"
    assert out["null-key"].asof_rv is None  # NULL never equals NULL
    assert out["null-key"].asof_ts is None
    # multi-key: one NULL in a composite key is enough to bar the match
    left2 = spark.createDataFrame(
        [("a", None, 20, "part-null")], "k1 string, k2 string, ts long, lv string"
    )
    right2 = spark.createDataFrame(
        [("a", None, 10, "R")], "k1 string, k2 string, ts long, rv string"
    )
    got = asof_join(left2, right2, ["k1", "k2"], "ts", "ts").collect()
    assert len(got) == 1 and got[0].asof_rv is None
