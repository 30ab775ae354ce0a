"""Avro wire-format roundtrip query (S2/S3 — rows-only check).

Binary columns aren't hash-comparable through the DuckDB oracle, so the
driver records a rows-only check; the strict equality assertion lives in
tests/test_avro.py (roundtrip identity + hypothesis property over the
reference's 5-type universe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.config import parse_config
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.sources.avro_codec import (
    from_confluent_avro,
    to_confluent_avro,
    transcode_json,
)
from consume_kafka_avro_data_spark.tables import load_table

_SPO_EVENTS_DOC = {
    "kafka": {},
    "type_map": {
        "spo": {
            "key_column": "subject",
            "columns": ["user_id", "event_type", "props"],
        }
    },
    "column_map": {"user_id": "subject", "event_type": "predicate", "props": "object"},
    "column_type_transforms": {},  # all strings, like the deployed schema
}


@query(
    "q_avro_roundtrip",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS subject,
           event_type AS predicate,
           props AS object,
           CAST(json_object('subject', CAST(user_id AS VARCHAR),
                            'predicate', event_type,
                            'object', props) AS VARCHAR) AS json
    FROM events WHERE event_id < 2000
    """,
    tags=("S2", "S3"),
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → SPO strings → Confluent-framed Avro → decode → JSON
    transcode: the reference's whole per-message path
    (KafkaConsumerCallback.cpp:69-115) as one distributed plan.

    Oracle-checked as an identity: encode∘decode must return the exact
    input strings, and the Jackson JSON transcode must match DuckDB's
    json_object byte-for-byte (same key order, same escaping) — so the
    DuckDB twin simply projects the source columns.  The slice is the
    deterministic ``event_id < 2000`` (a LIMIT without ORDER BY is not a
    stable row set in either engine)."""
    sc = parse_config(_SPO_EVENTS_DOC).schema_for("spo")
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    framed = to_confluent_avro(e, sc, schema_id=2)  # deployed id 2 (logs 12-28)
    decoded = from_confluent_avro(framed, sc, expected_schema_id=2)
    return decoded.where(F.col("_error").isNull()).select(
        "subject",
        "predicate",
        "object",
        transcode_json(decoded, sc).alias("json"),
    )
