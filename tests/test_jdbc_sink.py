"""JdbcGraphSink: option assembly and merge-SQL text are pure functions
pinned here with no database (the kafka_reader_options testing tier);
the live execution path needs the Postgres driver jar + a reachable
database and is env-skipped exactly like the spark-avro JVM tier."""

from __future__ import annotations

import pytest

from consume_kafka_avro_data_spark.config import ConfigError
from consume_kafka_avro_data_spark.sources.jdbc import (
    POSTGRES_DRIVER_CLASS,
    POSTGRES_JDBC_PACKAGE,
    JdbcGraphSink,
    jdbc_driver_available,
    jdbc_writer_options,
    upsert_objects_sql,
    upsert_relationships_sql,
)

URL = "jdbc:postgresql://db:5432/graph"


def test_writer_options_assembly():
    opts = jdbc_writer_options(
        URL, "staging_triples", user="u", password="p"
    )
    assert opts == {
        "url": URL,
        "dbtable": "staging_triples",
        "driver": POSTGRES_DRIVER_CLASS,
        "batchsize": "10000",
        "user": "u",
        "password": "p",
    }
    # credentials optional (e.g. pg_hba trust / url-embedded)
    assert "user" not in jdbc_writer_options(URL, "t")


def test_writer_options_validate_eagerly():
    """Config-layer errors at assembly time, not a py4j stack at the
    first micro-batch — the reference's libpq URL shape is the expected
    mistake and the message must say how to fix it."""
    with pytest.raises(ConfigError, match="jdbc:postgresql"):
        jdbc_writer_options("postgresql://db/graph", "t")
    with pytest.raises(ConfigError, match="non-empty"):
        jdbc_writer_options(URL, "")


def test_upsert_objects_sql_mirrors_reference_statement():
    """The reference's insert_object prepared statement
    (/root/reference/src/Database.h:23-25): same target columns, same
    conflict clause, set-oriented over BOTH name columns of the staged
    batch."""
    sql = upsert_objects_sql("staging_triples")
    assert "INSERT INTO objects(object_name, object_type, created_at)" in sql
    assert "ON CONFLICT ON CONSTRAINT objects_unique_constraint DO NOTHING" in sql
    assert "CAST(created_at AS date)" in sql  # the $3::date cast
    # every staged subject AND object becomes a vertex (UNION dedups)
    assert "subject AS name" in sql and "object AS name" in sql
    assert " UNION " in sql


def test_upsert_relationships_sql_folds_id_resolution_into_joins():
    """insert_relationship (Database.h:29-31) + the per-row
    get_object_id round-trips (Database.cpp:26-39) as ONE set-oriented
    statement: name→id resolution is a join, not 2 SELECTs per triple."""
    sql = upsert_relationships_sql("staging_triples")
    assert (
        "INSERT INTO relationships(source_id, target_id, relationship_name)"
        in sql
    )
    assert (
        "ON CONFLICT ON CONSTRAINT relationships_unique_constraint "
        "DO NOTHING" in sql
    )
    assert sql.count("JOIN objects") == 2  # source and target resolution
    assert "src.object_name = s.subject" in sql
    assert "tgt.object_name = s.object" in sql
    assert "SELECT DISTINCT" in sql  # replayed/duplicate triples collapse


def test_custom_table_names_thread_through():
    sql = upsert_objects_sql("stage_x", objects_table="obj")
    assert "INSERT INTO obj(" in sql and "FROM stage_x" in sql
    sql = upsert_relationships_sql(
        "stage_x", objects_table="obj", relationships_table="rel"
    )
    assert "INSERT INTO rel(" in sql and sql.count("JOIN obj") == 2


def test_table_names_validated_as_identifiers():
    """Config-supplied table names are interpolated into driver-side
    SQL text, so anything that isn't a plain (optionally
    schema-qualified) identifier must be refused eagerly — in the
    writer options AND in both statement builders."""
    for bad in ("t; DROP TABLE objects", 'a"b', "t name", "", "1t", "t-x"):
        with pytest.raises(ConfigError):
            jdbc_writer_options(URL, bad)
        with pytest.raises(ConfigError):
            upsert_objects_sql(bad)
        with pytest.raises(ConfigError):
            upsert_relationships_sql("s", relationships_table=bad)
    # schema-qualified names are fine
    assert "graph.objects" in upsert_objects_sql(
        "etl.staging", objects_table="graph.objects"
    )


def test_staged_triples_created_at_defaults_to_batch_date(spark):
    """The reference stamps wall-clock created_at per record
    (src/KafkaConsumerCallback.cpp:94-99) and the parquet GraphStore
    defaults to current_date(); the JDBC staging projection must do the
    same — NOT a NULL literal, which (a) diverges from both and (b) is
    a NullType Spark's JDBC writer cannot map.  Both paths must stage
    DateType so the staging DDL is stable across configs."""
    import datetime

    from consume_kafka_avro_data_spark.operators.graph import triples_from
    from consume_kafka_avro_data_spark.sources.jdbc import staged_triples

    df = spark.createDataFrame([("a", "knows", "b")], ["S", "P", "O"])
    triples = triples_from(df, "S", "P", "O")

    defaulted = staged_triples(triples, "MyObjectType", None)
    pinned = staged_triples(triples, "MyObjectType", "2024-01-01")
    assert [f.name for f in defaulted.schema.fields] == [
        "subject", "predicate", "object", "object_type", "created_at",
    ]
    for frame in (defaulted, pinned):
        assert frame.schema["created_at"].dataType.simpleString() == "date"
    row = defaulted.select("object_type", "created_at").first()
    assert row["object_type"] == "MyObjectType"
    # tolerate a session-timezone day-boundary skew vs the OS clock
    assert abs((row["created_at"] - datetime.date.today()).days) <= 1
    assert pinned.select("created_at").first()[0] == datetime.date(2024, 1, 1)


def test_created_at_validated_eagerly(spark):
    """A malformed created_at must fail at construction (ConfigError,
    before even the driver-jar probe) — the staging projection casts
    it to DATE, and under ANSI mode a bad string would otherwise throw
    mid-stream at the first micro-batch.  The reference's wall-clock
    format ('%Y-%m-%d %H:%M:%S') passes."""
    # full-string match: prefix-valid typos ('2024-01-015') and compact
    # forms Spark mis-parses must be refused too
    for bad in ("not-a-date", "2024-01-015", "20240101", "2024-01-01T12:00"):
        with pytest.raises(ConfigError, match="YYYY-MM-DD"):
            JdbcGraphSink(spark, URL, created_at=bad)
    # valid shapes reach the (sandbox) driver-jar failure instead
    for ok in ("2024-01-01", "2024-01-01 13:45:00"):
        with pytest.raises((RuntimeError, Exception)) as ei:
            JdbcGraphSink(spark, URL, created_at=ok)
        assert "YYYY-MM-DD" not in str(ei.value)


def test_sink_requires_driver_jar(spark):
    """Jar-less sandbox: construction must fail fast with the pinned
    --packages coordinate in the message (not at the first batch)."""
    if jdbc_driver_available(spark):
        pytest.skip("postgres JDBC driver unexpectedly on classpath")
    with pytest.raises(RuntimeError, match=POSTGRES_JDBC_PACKAGE.replace(".", r"\.")):
        JdbcGraphSink(spark, URL)


def test_sink_validates_url_before_probing_classpath(spark):
    """A bad URL is a config error even where the jar is absent — the
    cheaper, more actionable failure must win."""
    with pytest.raises(ConfigError, match="jdbc:postgresql"):
        JdbcGraphSink(spark, "postgresql://db/graph")


def test_live_roundtrip_env_gated(spark):
    """Live tier: stage a micro-batch and merge it twice (replay) into
    a real database, asserting idempotence.  Needs the driver jar AND
    SPARK_GRAFT_JDBC_URL pointing at a database with the reference's
    schema — absent in this sandbox, exactly like the live Kafka smoke."""
    import os

    if not jdbc_driver_available(spark):
        pytest.skip("postgres JDBC driver not on classpath")
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if not url:
        pytest.skip("SPARK_GRAFT_JDBC_URL not set")
    from consume_kafka_avro_data_spark.operators.graph import triples_from

    sink = JdbcGraphSink(spark, url, created_at="2024-01-01")
    df = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "c")], ["S", "P", "O"]
    )
    triples = triples_from(df, "S", "P", "O")
    sink.process_batch(triples, batch_id=0)
    sink.process_batch(triples, batch_id=0)  # replay: DO NOTHING absorbs


def test_libpq_conninfo_translates_to_jdbc():
    """The reference's EXACT hardcoded conninfo (src/main.cpp:188) must
    translate verbatim; hostaddr beats host (libpq precedence), port
    defaults, unknown keys tolerated, missing dbname refused."""
    from consume_kafka_avro_data_spark.sources.jdbc import libpq_to_jdbc

    assert libpq_to_jdbc(
        "hostaddr=127.0.0.1 port=5432 dbname=odynet user=postgres password=example"
    ) == ("jdbc:postgresql://127.0.0.1:5432/odynet", "postgres", "example")
    assert libpq_to_jdbc("host=db hostaddr=10.0.0.9 dbname=g") == (
        "jdbc:postgresql://10.0.0.9:5432/g",
        None,
        None,
    )
    assert libpq_to_jdbc("dbname=g connect_timeout=10") == (
        "jdbc:postgresql://localhost:5432/g",
        None,
        None,
    )
    with pytest.raises(ConfigError, match="dbname"):
        libpq_to_jdbc("host=db user=u")
    with pytest.raises(ConfigError, match="key=value"):
        libpq_to_jdbc("host=db oops")


def test_from_libpq_threads_credentials(spark):
    """from_libpq must reach the same eager validation path; in the
    jar-less sandbox that's the driver RuntimeError AFTER the options
    (incl. parsed credentials) assembled cleanly."""
    from consume_kafka_avro_data_spark.sources.jdbc import (
        jdbc_driver_available,
    )

    if jdbc_driver_available(spark):
        pytest.skip("postgres JDBC driver unexpectedly on classpath")
    with pytest.raises(RuntimeError, match="postgresql"):
        JdbcGraphSink.from_libpq(
            spark,
            "hostaddr=127.0.0.1 port=5432 dbname=odynet user=postgres "
            "password=example",
        )
