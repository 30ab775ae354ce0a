"""Shared fixtures: one SparkSession per test session (JVM startup is
~10 s — never per-test), plus a DuckDB connection with the testdata
views registered exactly as the verify driver registers them.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consume_kafka_avro_data_spark.session import get_session
from consume_kafka_avro_data_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# Pin the env var BEFORE any test module imports the query registry:
# data-dependent oracle builders (q_similarity_ivf's centroid literals)
# read it at import time to sample the same sf the harness queries.
os.environ["SPARK_GRAFT_TEST_SF_DIR"] = SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="cka-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
