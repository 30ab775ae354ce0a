"""SPO-graph queries — the reference's core identity, re-expressed.

The reference turns each Kafka Avro record into a subject–predicate–
object triple and materializes an entity/relationship graph in Postgres
with dedup-on-write (``src/KafkaConsumerCallback.cpp:89-110``,
``src/Database.cpp:41-78``).  The batch analogues below run on the
``events`` stand-in stream (FIXTURES.md role mapping: user_id→subject,
event_type→predicate, props→object); the full materializer lives in
operators/graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_triple_projection",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS subject,
           event_type               AS predicate,
           props                    AS object
    FROM events
    """,
    tags=("P1", "P2"),
)
def q_triple_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPO shaping (P1+P2): rename/project the stream into the triple
    schema — the reference's ``column_map`` {Source→subject,
    Relationship→predicate, Target→object} (configs/SPO_2_kafka.yaml:26-29).
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").cast("string").alias("subject"),
        F.col("event_type").alias("predicate"),
        F.col("props").alias("object"),
    )


@query(
    "q_vertex_upsert",
    oracle="""
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS object_name,
           'user'          AS object_type,
           DATE '2024-01-01' AS created_at
    FROM events
    WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)
    """,
    tags=("S7", "J4"),
)
def q_vertex_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-new-vertices-only (S7 semantics): the reference's
    ``INSERT … ON CONFLICT DO NOTHING`` (Database.h:23-25) is exactly
    distinct + anti-join against the existing vertex set.  created_at is
    a fixed literal (the reference stamps wall clock,
    KafkaConsumerCallback.cpp:94-99, which is non-reproducible).
    """
    e = load_table(spark, sf_dir, "events")
    existing = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("k")
    )
    return (
        e.select(F.col("user_id").alias("k"))
        .join(F.broadcast(existing), "k", "left_anti")
        .select(
            F.col("k").cast("string").alias("object_name"),
            F.lit("user").alias("object_type"),
            F.lit("2024-01-01").cast("date").alias("created_at"),
        )
        .distinct()
    )


@query(
    "q_error_split",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN props LIKE '{%}' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN props LIKE '{%}' THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
    FROM events
    GROUP BY event_type
    """,
    tags=("P7",),
)
def q_error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/invalid routing (P7): the reference counts deserialization
    failures and keeps going (``Invalid CP1 magic byte``,
    src/main.cpp:249-252).  Batch analogue: classify each record and
    count both routes per predicate — the DLQ pattern's bookkeeping half.
    """
    e = load_table(spark, sf_dir, "events")
    valid = F.col("props").like("{%}")
    return e.groupBy("event_type").agg(
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).cast("long").alias("n_invalid"),
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("U4",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (U4): distinct on the dedup key — hash-shuffle on the
    key with map-side partial dedup, the at-scale shape of the
    reference's unique-constraint insert."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


@query(
    "q_degree_dist",
    oracle="""
    SELECT out_degree, CAST(count(*) AS BIGINT) AS n_vertices
    FROM (
      SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS out_degree
      FROM events
      GROUP BY user_id
    )
    GROUP BY out_degree
    """,
    tags=("A2", "J5"),
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the materialized SPO graph — the first
    diagnostic query over the reference's relationships table
    (Database.h:29-31): per-subject distinct-predicate out-degree,
    histogrammed.  Two cascaded aggregations; the second input is
    |vertices|-sized, so at 100 TB only the first shuffle sees data
    at scale."""
    e = load_table(spark, sf_dir, "events")
    deg = e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("out_degree")
    )
    return deg.groupBy("out_degree").agg(F.count("*").alias("n_vertices"))
