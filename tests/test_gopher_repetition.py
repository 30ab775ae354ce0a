"""Gopher repetition removal (operators/text.gopher_repetition, Rae
2021 table A1's other half): metrics hand-verified on designed
documents, an independently-written reference agrees on arbitrary
text, thresholds gate strictly-greater, and the pass is map-only."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.text import (
    GOPHER_REP_THRESHOLDS,
    gopher_repetition,
)


def _ref_metrics(text):
    """Independent re-derivation of the documented definitions (written
    against the docstring, not the operator's code)."""
    out = {k: 0.0 for k in GOPHER_REP_THRESHOLDS}
    t = text or ""

    def frac(items):
        if not items:
            return 0.0, 0.0
        c = Counter(items)
        total_ch = sum(len(x) for x in items)
        return (
            sum(v - 1 for v in c.values()) / len(items),
            (
                sum((v - 1) * len(x) for x, v in c.items()) / total_ch
                if total_ch
                else 0.0
            ),
        )

    lines = [x.strip() for x in t.split("\n") if x.strip()]
    paras = [x.strip() for x in t.split("\n\n") if x.strip()]
    out["dup_line_frac"], out["dup_line_char_frac"] = frac(lines)
    out["dup_para_frac"], out["dup_para_char_frac"] = frac(paras)
    words = t.lower().split()
    norm = " ".join(words)
    if not norm:
        return out
    for n in (2, 3, 4):
        c = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        if c:
            g = max(c, key=lambda x: (c[x], len(x), x))
            if c[g] >= 2:
                out[f"top_{n}gram_char_frac"] = c[g] * len(g) / len(norm)
    for n in range(5, 11):
        c = Counter(
            tuple(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        covered = set()
        pos = 0
        starts = []
        for w in words:
            starts.append(pos)
            pos += len(w) + 1
        for i in range(len(words) - n + 1):
            if c[tuple(words[i : i + n])] >= 2:
                covered.update(
                    range(
                        starts[i],
                        starts[i + n - 1] + len(words[i + n - 1]),
                    )
                )
        out[f"dup_{n}gram_char_frac"] = len(covered) / len(norm)
    return out


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}


def test_hand_verified_designed_docs(spark):
    clean = "a perfectly normal single sentence with no repetition at all"
    dup_lines = "alpha beta\ngamma delta\nalpha beta\nepsilon zeta"
    # "one two three four five" repeated → every 5-gram window dupes
    loop5 = " ".join(["one two three four five"] * 4)
    got = _run(spark, [clean, dup_lines, loop5, None, ""])

    assert got[0]["gopher_rep_keep"] is True
    assert all(
        got[0][k] == 0.0 for k in GOPHER_REP_THRESHOLDS
    )

    # dup_lines: 4 lines, one repeated once → 1/4; the repeat's 10
    # chars over 10+11+10+12 = 43 total line chars
    assert got[1]["dup_line_frac"] == pytest.approx(0.25)
    assert got[1]["dup_line_char_frac"] == pytest.approx(10 / 43)
    # 0.25 clears the 0.30 line-frac bound, but 10/43 ≈ 0.233 exceeds
    # the 0.20 char-frac bound — the char metric is the binding one
    assert got[1]["gopher_rep_keep"] is False

    # loop5: the repeated block covers everything at n=5
    assert got[2]["dup_5gram_char_frac"] == pytest.approx(1.0)
    assert got[2]["top_4gram_char_frac"] > 0.16
    assert got[2]["gopher_rep_keep"] is False

    # NULL and empty: zero metrics, kept
    for i in (3, 4):
        assert got[i]["gopher_rep_keep"] is True
        assert all(got[i][k] == 0.0 for k in GOPHER_REP_THRESHOLDS)


def test_strictly_greater_boundary(spark):
    """A metric EXACTLY at its bound keeps the doc (the q_gopher_rules
    convention); one more repeat tips it over.  Construction keeps the
    OTHER metrics quiet: filler lines are word-disjoint 6-word lines
    (no shared n-grams), the repeated line is short (2 words) and
    never adjacent to itself (no repeated boundary-spanning grams)."""
    filler = [
        " ".join(f"w{i}{c}" for c in "abcdef") for i in range(7)
    ]
    dup = "aa bb"
    # 10 lines, "aa bb" ×4 (3 extra) at non-adjacent slots → 3/10
    at_bound = [
        dup, filler[0], filler[1], dup, filler[2], filler[3],
        dup, filler[4], dup, filler[5],
    ]
    # 12 lines, "aa bb" ×5 (4 extra, still non-adjacent) → 4/12 > 0.30
    over = at_bound + [filler[6], dup]
    got = _run(spark, ["\n".join(at_bound), "\n".join(over)])
    # only the line-frac metric is anywhere near its bound
    for doc in (0, 1):
        ref = _ref_metrics(["\n".join(at_bound), "\n".join(over)][doc])
        for k, bound in GOPHER_REP_THRESHOLDS.items():
            if k != "dup_line_frac":
                assert ref[k] <= bound, (doc, k, ref[k])
    assert got[0]["dup_line_frac"] == pytest.approx(0.30)
    assert got[0]["gopher_rep_keep"] is True  # == bound → kept
    assert got[1]["dup_line_frac"] == pytest.approx(4 / 12)
    assert got[1]["gopher_rep_keep"] is False


def test_threshold_override_and_validation(spark):
    df = spark.createDataFrame([(1, "a b\na b")], "doc_id long, text string")
    strict = gopher_repetition(
        df, thresholds={"dup_line_frac": 0.0}
    ).collect()[0]
    assert strict["gopher_rep_keep"] is False
    with pytest.raises(ValueError, match="unknown threshold"):
        gopher_repetition(df, thresholds={"nope": 1.0})
    clash = spark.createDataFrame(
        [(1, "x", 0.5)], "doc_id long, text string, dup_line_frac double"
    )
    with pytest.raises(ValueError, match="dup_line_frac"):
        gopher_repetition(clash)


def test_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


TEXTS = st.lists(
    st.text(alphabet="ab \n.", min_size=0, max_size=80), min_size=1, max_size=4
)


@given(texts=TEXTS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_models_reference_on_any_text(spark, texts):
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        want = _ref_metrics(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (k, t)
        assert got[i]["gopher_rep_keep"] == all(
            want[k] <= GOPHER_REP_THRESHOLDS[k] for k in want
        )


def test_interval_merge_kernel_edges():
    """Round-9 kernel swap (merged-interval coverage, O(#occurrences)
    instead of per-character marking): pin the operator kernel against
    the per-character reference on the span-arithmetic edge cases —
    chained overlapping repeats, TOUCHING spans (b == next a), disjoint
    islands, and a whole-doc repeat — directly, no Spark session."""
    from consume_kafka_avro_data_spark.operators.text import (
        _gopher_rep_metrics,
    )

    five = "q w e r t"
    cases = [
        # chained overlap: "a b c d e f" twice shares the middle
        "a b c d e a b c d e",
        # touching spans: two different repeated 5-grams back to back
        f"{five} {five} x y z u v x y z u v",
        # disjoint islands separated by unique words
        f"{five} one two three {five} four five six {five}",
        # whole doc is one repeated 5-gram => coverage 1.0
        f"{five} {five}",
        # overlap within a single long repeat run
        "a a a a a a a a a a a a",
        "",
    ]
    for t in cases:
        got = _gopher_rep_metrics(t)
        want = _ref_metrics(t)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-15), (k, t)
    # 18 of 19 chars: both occurrences' spans, minus the joining space
    assert _gopher_rep_metrics(f"{five} {five}")[
        "dup_5gram_char_frac"
    ] == pytest.approx(18 / 19)
