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


@query(
    "q_dlq_recovery",
    oracle="""
    WITH base AS (SELECT * FROM events WHERE event_id < 2000),
    a AS (SELECT CAST(user_id AS VARCHAR) AS subject,
                 event_type AS predicate, props AS object
          FROM base WHERE event_id % 5 = 0),
    b AS (SELECT count(*) AS n FROM base
          WHERE event_id % 5 <> 0 AND event_id % 7 = 0)
    SELECT subject, predicate, object,
           'Invalid CP1 magic byte 123, expected 0' AS _error,
           TRUE AS _recovered, TRUE AS _complete,
           CAST(count(*) AS BIGINT) AS n_frames
    FROM a GROUP BY subject, predicate, object
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR),
           'Invalid CP1 magic byte 123, expected 0',
           FALSE, FALSE, CAST(n AS BIGINT)
    FROM b WHERE n > 0
    """,
    tags=("P7", "S2"),
)
def q_dlq_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7's FULL loop, driver-checkable: malformed-frame routing → DLQ
    with the raw frame retained → JSON re-decode → merge-ready graph
    delta.  The reference could only COUNT its production corruption
    (a producer shipped raw JSON onto the Avro topic — ``Invalid CP1
    magic byte 123`` 4× in logs/flycatcher_2024-12-21.log,
    src/main.cpp:249-252); here the same dead letters are replayed
    through ``recover_json_frames`` and come back as rows.

    Construction (deterministic, oracle-replayable): events slice
    ``event_id < 2000``; ``% 5 == 0`` rows ship as RAW JSON of the SPO
    record (the observed corruption — recoverable, complete); the
    remaining ``% 7 == 0`` rows ship as raw JSON carrying only a
    foreign key (parses, but no configured field — stays dead); all
    others are proper CP1 frames (decode clean, never reach the DLQ).
    Output: the recovered triples collapsed to the DISTINCT merge
    delta (idempotent-upsert input) with per-triple frame counts, plus
    one bookkeeping row for the still-dead letters — every frame's
    ``_error`` string byte-identical to the reference's log line."""
    sc = parse_config(_SPO_EVENTS_DOC).schema_for("spo")
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    is_a = F.col("event_id") % 5 == 0
    is_b = (F.col("event_id") % 5 != 0) & (F.col("event_id") % 7 == 0)

    spo_json = F.to_json(
        F.struct(
            F.col("user_id").cast("string").alias("subject"),
            F.col("event_type").alias("predicate"),
            F.col("props").alias("object"),
        )
    )
    alien_json = F.to_json(F.struct(F.col("user_id").alias("uid")))
    corrupt = e.where(is_a | is_b).select(
        F.col("user_id").cast("string").alias("key"),
        F.when(is_a, spo_json).otherwise(alien_json).cast("binary").alias("value"),
    )
    framed = to_confluent_avro(e.where(~is_a & ~is_b), sc, schema_id=2)
    topic = framed.unionByName(corrupt)

    decoded = from_confluent_avro(
        topic, sc, expected_schema_id=2, keep_raw=True
    )
    # route: only the undecodable frames enter the DLQ, raw frame kept
    # (slim columns — the failed decode's null fields would collide
    # with the recovered fields' names)
    dlq = decoded.where(F.col("_error").isNotNull()).select(
        "_raw_value", "_error"
    )
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        recover_json_frames,
    )

    rec = recover_json_frames(dlq, sc, value_col="_raw_value")
    return rec.groupBy(
        "subject", "predicate", "object", "_error", "_recovered", "_complete"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_frames"))
