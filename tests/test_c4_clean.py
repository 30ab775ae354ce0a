"""C4 line-level cleaning (operators/text.c4_clean, Raffel 2020 §2.2):
the JVM expression pipeline must model an independent pure-Python
implementation of the documented rules exactly (line retention, doc
flags, counts), stay map-only, and preserve caller columns."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.text import C4_TERMINALS, c4_clean

DOCS = [
    # good prose: kept lines, keep flag
    (
        1,
        "This is a perfectly reasonable sentence about data pipelines.\n"
        "Short line.\n"
        "Another long and fully punctuated sentence follows right here!\n"
        "is this line long enough and does it end with a question mark?\n"
        "this line has no terminal punctuation at all so it goes",
    ),
    # javascript + brace + lorem ipsum triggers
    (
        2,
        "Please enable javascript to view the comments on this page.\n"
        "A fine sentence that survives the line filter on its own merits.\n"
        "function f() { return 1; } is code and kills the document.",
    ),
    (3, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do.\n"),
    # too few sentences after cleaning
    (4, "One single retained sentence is not enough to keep the page.\n"),
    (5, ""),
]


def _ref_c4(text, min_line_words=5, min_sentences=3):
    kept = []
    for raw in (text or "").replace("\r\n", "\n").split("\n"):
        # ASCII whitespace only — Java's \s class, which the operator's
        # regex trim uses
        ln = raw.strip(" \t\r\n\x0b\x0c")
        if (
            ln
            and ln[-1] in C4_TERMINALS
            and len([w for w in ln.split() if w]) >= min_line_words
            and "javascript" not in ln.lower()
        ):
            kept.append(ln)
    clean = "\n".join(kept)
    # terminal mark followed by whitespace or line end (per kept line —
    # lines carry no newline, so $ is the line boundary), matching the
    # operator's abbreviation/ellipsis-resistant proxy
    n_sent = sum(
        len(re.findall(r"[.!?](\s|$)", ln)) for ln in kept
    )
    keep = (
        "lorem ipsum" not in clean.lower()
        and "{" not in clean
        and n_sent >= min_sentences
    )
    n_lines = len((text or "").replace("\r\n", "\n").split("\n"))
    return clean, n_lines, len(kept), keep


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_reference_on_fixed_docs(spark, docs_df):
    got = {r["doc_id"]: r for r in c4_clean(docs_df).collect()}
    for doc_id, text in DOCS:
        clean, n_lines, n_kept, keep = _ref_c4(text)
        r = got[doc_id]
        assert r["text"] == clean
        assert r["n_lines"] == n_lines
        assert r["n_lines_kept"] == n_kept
        assert r["c4_keep"] == keep
    # the designed outcomes actually exercised every rule
    assert got[1]["c4_keep"] and got[1]["n_lines_kept"] == 3
    assert not got[2]["c4_keep"]  # brace survives into cleaned text
    assert not got[3]["c4_keep"]  # lorem ipsum
    assert not got[4]["c4_keep"]  # < 3 sentences
    assert not got[5]["c4_keep"] and got[5]["text"] == ""
    assert got[2]["n_lines_kept"] == 2  # javascript line dropped
    assert list(got[1].asDict()) == [
        "doc_id",
        "text",
        "n_lines",
        "n_lines_kept",
        "c4_keep",
    ]


def test_is_map_only(spark, docs_df):
    plan = (
        c4_clean(docs_df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


TEXTS = st.lists(
    st.text(
        alphabet='abc .!?"\n\r\t{j', min_size=0, max_size=60
    ),
    min_size=1,
    max_size=5,
)


@given(texts=TEXTS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_models_reference_on_any_text(spark, texts):
    """For ANY text (newlines, braces, stray punctuation, 'j'-words):
    cleaned text, counts, and the keep flag all match the pure-Python
    recipe."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    for i, t in enumerate(texts):
        clean, n_lines, n_kept, keep = _ref_c4(t)
        assert got[i]["text"] == clean
        assert got[i]["n_lines"] == n_lines
        assert got[i]["n_lines_kept"] == n_kept
        assert got[i]["c4_keep"] == keep


def test_crlf_tabs_and_null_text(spark):
    """The web-text realities the first cut missed (review findings):
    CRLF docs must clean exactly like LF docs, tab-padded lines must
    trim before the word count, and NULL text is an empty REJECTED doc
    (countable), never NULL-poisoned counts."""
    crlf = (
        "This is a perfectly reasonable sentence about data pipelines.\r\n"
        "Another long and fully punctuated sentence follows right here!\r\n"
        "is this line long enough and does it end with a question mark?"
    )
    lf = crlf.replace("\r\n", "\n")
    tabbed = "\tfive words are in here.\n" + crlf
    df = spark.createDataFrame(
        [(1, crlf), (2, lf), (3, tabbed), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert got[1]["text"] == got[2]["text"] != ""
    assert got[1]["c4_keep"] is True and got[2]["c4_keep"] is True
    assert got[1]["n_lines_kept"] == 3
    # the tab-padded 5-word line survives (trim before word count)
    assert got[3]["n_lines_kept"] == 4
    assert got[3]["text"].startswith("five words are in here.")
    # NULL text: one empty line, nothing kept, keep flag FALSE not NULL
    assert got[4]["text"] == ""
    assert got[4]["n_lines"] == 1 and got[4]["n_lines_kept"] == 0
    assert got[4]["c4_keep"] is False
    # and the pure-Python reference agrees on all non-NULL docs
    for i, t in ((1, crlf), (2, lf), (3, tabbed)):
        clean, n_lines, n_kept, keep = _ref_c4(t)
        assert got[i]["text"] == clean
        assert (got[i]["n_lines"], got[i]["n_lines_kept"]) == (n_lines, n_kept)
        assert got[i]["c4_keep"] == keep
