"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-style pricing summary) at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the declared-query catalog
from SURVEY.md §2.8, implemented in
``consume_kafka_avro_data_spark/queries/`` and registered via
``consume_kafka_avro_data_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from consume_kafka_avro_data_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q_groupby_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query.

    Queries registered with ``oracle=None`` (approx sketches, tie-prone
    top-k, codec roundtrips) are intentionally omitted → rows-only check.
    """
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
