"""Declared-query catalog (SURVEY.md §2.8) — importing this package
registers every query into :mod:`consume_kafka_avro_data_spark.registry`.
"""

from consume_kafka_avro_data_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    avro_q,
    curation,
    features,
    graph,
    joins,
    relational,
    scans,
    similarity,
    temporal,
    text,
    tpch,
    windows,
)
