"""JSONL source: strict-schema scan, corrupt-record DLQ split, round
trip — the batch-file analog of the Avro decode DLQ tests."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from consume_kafka_avro_data_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    read_jsonl_with_dlq,
    write_jsonl,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def _write_lines(tmp_path, lines):
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_dlq_split(spark, tmp_path):
    """Well-formed rows land in clean under exactly the user schema;
    malformed JSON and type-mismatched rows land in the DLQ with the
    raw line preserved byte-for-byte."""
    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        'this is not json at all',
        '{"doc_id": "not-a-number", "text": "beta"}',
        '{"doc_id": 3, "text": "gamma", "extra": "ignored"}',
        '{"doc_id": 4}',
    ]
    clean, dlq = read_jsonl_with_dlq(spark, _write_lines(tmp_path, lines), SCHEMA)
    assert clean.columns == ["doc_id", "text"]
    got = {r.doc_id: r.text for r in clean.collect()}
    # extra fields are ignored; missing fields are null — both clean
    assert got == {1: "alpha", 3: "gamma", 4: None}
    raws = sorted(r.raw for r in dlq.collect())
    assert raws == [
        "this is not json at all",
        '{"doc_id": "not-a-number", "text": "beta"}',
    ]
    assert {r.error for r in dlq.collect()} == {
        "JSONL_PARSE_OR_SCHEMA_MISMATCH"
    }


def test_corrupt_col_rejected_in_user_schema(spark):
    bad = StructType([StructField(CORRUPT_COL, StringType(), True)])
    with pytest.raises(ValueError, match="must not declare"):
        read_jsonl(spark, "/nonexistent", bad)


def test_roundtrip(spark, tmp_path):
    """write_jsonl → read_jsonl is lossless for the declared schema and
    produces zero DLQ rows."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, 'quote " and \\ backslash')],
        SCHEMA,
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    clean, dlq = read_jsonl_with_dlq(spark, out, SCHEMA)
    assert dlq.count() == 0
    assert sorted((r.doc_id, r.text) for r in clean.collect()) == [
        (1, "alpha"),
        (2, None),
        (3, 'quote " and \\ backslash'),
    ]
