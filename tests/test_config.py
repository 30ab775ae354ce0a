"""Config-system tests (SURVEY §5: rename/cast config handling with a
golden StructType for the reference's SPO_2_kafka.yaml shape)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from consume_kafka_avro_data_spark.config import ConfigError, parse_config

# exact shape of the reference's configs/SPO_2_kafka.yaml (FIXTURES.md A5)
SPO_DOC = {
    "kafka": {
        "bootstrap.servers": "localhost:9092",
        "schema.registry.url": "http://localhost:8081",
        "client.id": "spo2kafka_client",
    },
    "input_type": "csv",
    "column_type_transforms": {"Source": "string", "Relationship": "string", "Target": "string"},
    "type_map": {
        "spo": {
            "key_column": "subject",
            "columns": ["Source", "Relationship", "Target"],
        }
    },
    "column_map": {"Source": "subject", "Relationship": "predicate", "Target": "object"},
}


def test_golden_spo_struct_type():
    cfg = parse_config(SPO_DOC)
    sc = cfg.schema_for("spo")
    assert sc.to_struct_type() == StructType(
        [
            StructField("subject", StringType(), True),
            StructField("predicate", StringType(), True),
            StructField("object", StringType(), True),
        ]
    )
    assert sc.key_column == "subject"
    assert cfg.bootstrap_servers == "localhost:9092"
    assert cfg.schema_registry_url == "http://localhost:8081"


def test_avro_schema_json():
    import json

    sc = parse_config(SPO_DOC).schema_for("spo")
    avro = json.loads(sc.to_avro_schema_json())
    assert avro["type"] == "record"
    assert avro["name"] == "spo"
    assert [f["name"] for f in avro["fields"]] == ["subject", "predicate", "object"]
    assert all(f["type"] == "string" for f in avro["fields"])


def test_type_transforms_and_default_string():
    doc = {
        "type_map": {"t": {"key_column": "a", "columns": ["a", "b", "c", "d", "e"]}},
        "column_type_transforms": {"b": "int", "c": "long", "d": "float", "e": "double"},
    }
    st = parse_config(doc).schema_for("t").to_struct_type()
    assert [type(f.dataType) for f in st.fields] == [
        StringType,  # default when no transform (ConfigParser.cpp:149-152)
        IntegerType,
        LongType,
        type(st.fields[3].dataType),  # FloatType
        DoubleType,
    ]


def test_projection_applies_subset_rename_cast(spark):
    df = spark.createDataFrame(
        [("s1", "p1", "42", "ignored")], ["Source", "Relationship", "Target", "Extra"]
    )
    doc = dict(SPO_DOC)
    doc["column_type_transforms"] = {"Target": "long"}
    out = parse_config(doc).schema_for("spo").apply(df)
    assert out.columns == ["subject", "predicate", "object"]
    row = out.collect()[0]
    assert (row.subject, row.predicate, row.object) == ("s1", "p1", 42)


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda d: d.pop("type_map"), "type_map"),
        (lambda d: d["type_map"]["spo"].pop("key_column"), "key_column"),
        (lambda d: d["type_map"]["spo"].update(columns=[]), "no columns"),
        (
            lambda d: d.update(column_type_transforms={"Source": "uuid"}),
            "unsupported type",
        ),
        (
            lambda d: d.update(column_map={"Source": "same", "Relationship": "same"}),
            "duplicate|key_column",
        ),
    ],
)
def test_config_errors_raise_not_kill(mutate, match):
    """The reference kills the process on bad config
    (ConfigParser.cpp:33,58,133); we raise ConfigError instead."""
    import copy

    doc = copy.deepcopy(SPO_DOC)
    mutate(doc)
    with pytest.raises(ConfigError, match=match):
        parse_config(doc)


def test_load_config_from_yaml_file(tmp_path):
    """The reference consumes an actual YAML file (-c config.yaml,
    src/main.cpp:114-140); load_config must parse the same file shape
    to an identical JobConfig as parse_config on the dict."""
    from consume_kafka_avro_data_spark.config import load_config

    yaml_text = """\
kafka:
  bootstrap.servers: localhost:9092
  schema.registry.url: http://localhost:8081
  client.id: spo2kafka_client
input_type: csv
column_type_transforms:
  Source: string
  Relationship: string
  Target: string
type_map:
  spo:
    key_column: subject
    columns: [Source, Relationship, Target]
column_map:
  Source: subject
  Relationship: predicate
  Target: object
"""
    p = tmp_path / "SPO_2_kafka.yaml"
    p.write_text(yaml_text)
    from_file = load_config(str(p))
    from_dict = parse_config(SPO_DOC)
    assert from_file.bootstrap_servers == from_dict.bootstrap_servers
    assert from_file.schema_registry_url == from_dict.schema_registry_url
    sf, sd = from_file.schema_for("spo"), from_dict.schema_for("spo")
    assert sf.to_struct_type() == sd.to_struct_type()
    assert sf.key_column == sd.key_column
    assert sf.to_avro_schema_json() == sd.to_avro_schema_json()


def test_live_smoke_config_dry_run():
    """The shipped live-cluster smoke config must always parse and
    assemble its Avro schema — scripts/live_smoke.py --dry-run is the
    offline CI gate for the documented real-Kafka path."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts" / "live_smoke.py"),
            str(repo / "configs" / "live_smoke.yaml"),
            "--dry-run",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "config ok: topic=spo" in out.stdout
    assert '"name": "subject"' in out.stdout  # rename applied in schema


def test_avro_record_name_sanitized_for_kafka_topic_chars():
    """'.'/'-' are legal in Kafka topics but illegal in Avro record
    names; the schema JSON must sanitize the record name (a real
    registry 422s a spec-invalid schema) while field names from user
    renames raise ConfigError instead of being silently rewritten."""
    import json

    from consume_kafka_avro_data_spark.config import ConfigError, parse_config

    doc = {
        "kafka": {},
        "type_map": {
            "prod.spo-events": {"key_column": "s", "columns": ["s", "p", "o"]}
        },
    }
    sc = parse_config(doc).schema_for("prod.spo-events")
    schema = json.loads(sc.to_avro_schema_json())
    assert schema["name"] == "prod_spo_events"

    bad = {
        "kafka": {},
        "type_map": {"t": {"key_column": "k", "columns": ["k", "a"]}},
        "column_map": {"a": "bad-field"},
    }
    sc2 = parse_config(bad).schema_for("t")
    try:
        sc2.to_avro_schema_json()
        raise AssertionError("invalid field name accepted")
    except ConfigError:
        pass


def test_scalar_config_section_is_config_error():
    """'kafka: localhost:9092' (scalar where a mapping belongs) must be
    a ConfigError the CLI reports, not an AttributeError traceback."""
    import pytest as _pytest

    from consume_kafka_avro_data_spark.config import ConfigError, parse_config

    with _pytest.raises(ConfigError, match="must be a mapping"):
        parse_config({"kafka": "localhost:9092", "type_map": {"t": {"key_column": "a", "columns": ["a"]}}})


def test_sql_surface_runs_oracle_sql_verbatim(spark, sf_dir):
    """tables.sql registers the normalized views and runs ANSI SQL —
    including a declared query's own oracle string, whose result must
    match the DataFrame form of the same query."""
    from consume_kafka_avro_data_spark.registry import all_queries
    from consume_kafka_avro_data_spark.tables import sql

    q = all_queries()["q_groupby_agg"]
    via_sql = sorted(map(tuple, sql(spark, sf_dir, q.oracle_text()).collect()))
    via_df = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert via_sql == via_df


def test_csv_input_reads_and_shapes_per_config(spark, tmp_path):
    """input_type:csv + csv_options (the reference job file's producer-
    side input declaration, configs/SPO_2_kafka.yaml:5-7) drives a real
    CSV read here: header columns validated against the config,
    projection/rename/cast applied, escape_hack selecting backslash
    escaping, and the shaped frame round-trips the wire codec."""
    import pytest as _pytest

    from consume_kafka_avro_data_spark.config import ConfigError, parse_config
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro,
        to_confluent_avro,
    )
    from consume_kafka_avro_data_spark.sources.csv_input import read_csv_input

    doc = {
        "kafka": {},
        "input_type": "csv",
        "csv_options": {"escape_hack": "true"},
        "type_map": {
            "spo": {
                "key_column": "subject",
                "columns": ["Source", "Relationship", "Target"],
            }
        },
        "column_map": {
            "Source": "subject",
            "Relationship": "predicate",
            "Target": "object",
        },
    }
    cfg = parse_config(doc)
    assert cfg.csv_options == {"escape_hack": "true"}

    csv_dir = tmp_path / "in"
    csv_dir.mkdir()
    (csv_dir / "part.csv").write_text(
        "Source,Relationship,Target,Extra\n"
        "Don Vito,Email,donvito@example.com,x\n"
        '"Underboss \\"Marco\\"",Captain,Capo Salvatore,y\n'
    )
    raw = read_csv_input(spark, str(csv_dir), cfg, "spo")
    # projected to the configured columns, input names, strings; the
    # Extra column is gone (P1); rename/cast happen at encode time
    assert raw.columns == ["Source", "Relationship", "Target"]
    rows = {r.Source: (r.Relationship, r.Target) for r in raw.collect()}
    # backslash-escaped quotes survived (escape_hack)
    assert rows['Underboss "Marco"'] == ("Captain", "Capo Salvatore")

    # produce-ready: the frame round-trips the wire codec, which applies
    # the config's rename+cast exactly once
    sc = cfg.schema_for("spo")
    back = from_confluent_avro(
        to_confluent_avro(raw, sc, schema_id=2), sc, expected_schema_id=2
    )
    got = {r.subject: (r.predicate, r.object) for r in back.collect()}
    assert got == rows

    # a header missing configured columns fails with a clear error
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "part.csv").write_text("Source,Relationship\nA,B\n")
    with _pytest.raises(ConfigError, match="missing configured columns"):
        read_csv_input(spark, str(bad_dir), cfg, "spo")

    # input_type mismatch is rejected up front
    cfg2 = parse_config({**doc, "input_type": "parquet"})
    with _pytest.raises(ConfigError, match="not csv"):
        read_csv_input(spark, str(csv_dir), cfg2, "spo")


def test_csv_header_with_dot_resolves(spark, tmp_path):
    """A CSV header containing a dot must survive the projection: a
    name-string select would parse 'user.id' as struct navigation and
    fail resolution even though the membership check passed."""
    from consume_kafka_avro_data_spark.config import parse_config
    from consume_kafka_avro_data_spark.sources.csv_input import read_csv_input

    doc = {
        "kafka": {},
        "type_map": {
            "t": {"key_column": "user.id", "columns": ["user.id", "v"]}
        },
    }
    cfg = parse_config(doc)
    d = tmp_path / "csv"
    d.mkdir()
    (d / "part.csv").write_text("user.id,v,extra\nu1,hello,x\n")
    out = read_csv_input(spark, str(d), cfg, "t")
    assert out.columns == ["user.id", "v"]
    assert out.collect()[0]["v"] == "hello"
