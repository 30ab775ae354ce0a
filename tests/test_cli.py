"""CLI entry point (the reference binary's `-c <config>` UX,
src/main.cpp:114-140): arg validation in-process, the batch ingest path
end-to-end as a subprocess."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.__main__ import build_parser, main
from consume_kafka_avro_data_spark.config import parse_config
from consume_kafka_avro_data_spark.sources.avro_codec import to_confluent_avro
from consume_kafka_avro_data_spark.sources.kafka import FileStreamStandIn

REPO = Path(__file__).resolve().parent.parent
SMOKE = REPO / "configs" / "live_smoke.yaml"


def test_cli_requires_config():
    parser = build_parser()
    try:
        parser.parse_args([])
        raised = False
    except SystemExit:
        raised = True
    assert raised  # -c is mandatory, as in the reference (main.cpp:114-140)


def test_cli_missing_file_exits_nonzero(capsys):
    assert main(["-c", "/does/not/exist.yaml", "--dry-run"]) == 2
    assert "not found" in capsys.readouterr().err


def test_cli_dry_run_validates(capsys):
    assert main(["-c", str(SMOKE), "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "topic=spo" in out and '"name": "subject"' in out


def test_cli_batch_ingest_end_to_end(spark, tmp_path):
    """python -m consume_kafka_avro_data_spark -c cfg --batch DIR runs
    the whole decode->graph pipeline over a stand-in topic, and --sql
    queries the just-populated graph through the engine-state views
    (the reference's 'graph exists to be queried' loop)."""
    doc = {
        "kafka": {},
        "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
        "column_map": {"S": "subject", "P": "predicate", "O": "object"},
    }
    sc = parse_config(doc).schema_for("spo")
    df = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "c")], ["S", "P", "O"]
    )
    framed = to_confluent_avro(df, sc, schema_id=2).select(
        F.col("key").cast("binary").alias("key"),
        "value",
        F.lit("spo").alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )
    topic_dir = tmp_path / "topic"
    FileStreamStandIn(spark, str(topic_dir)).write_batch(framed)

    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        "kafka: {}\n"
        "type_map:\n  spo:\n    key_column: subject\n    columns: [S, P, O]\n"
        "column_map: {S: subject, P: predicate, O: object}\n"
        "engine:\n"
        f"  graph_dir: {tmp_path / 'graph'}\n"
        f"  checkpoint_dir: {tmp_path / 'ckpt'}\n"
    )
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "consume_kafka_avro_data_spark",
            "-c",
            str(cfg),
            "--batch",
            str(topic_dir),
            "--sql",
            "SELECT object_name FROM objects ORDER BY object_name",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "valid=2" in out.stdout and "errors=0" in out.stdout
    # --sql output: header line + one tab-separated row per object
    lines = out.stdout.splitlines()
    i = lines.index("object_name")
    assert lines[i + 1 : i + 4] == ["a", "b", "c"]
    graph = spark.read.parquet(str(tmp_path / "graph" / "objects"))
    assert graph.count() == 3  # distinct {a, b, c}


def test_cli_ocf_ingest_end_to_end(spark, tmp_path):
    """python -m consume_kafka_avro_data_spark -c cfg --ocf DIR ingests
    at-rest .avro lake files through the same idempotent graph merge."""
    from consume_kafka_avro_data_spark.sources.ocf import write_ocf

    doc = {
        "kafka": {},
        "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
        "column_map": {"S": "subject", "P": "predicate", "O": "object"},
    }
    sc = parse_config(doc).schema_for("spo")
    df = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "c")], ["S", "P", "O"]
    )
    lake = tmp_path / "lake"
    write_ocf(df, sc, str(lake))

    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        "kafka: {}\n"
        "type_map:\n  spo:\n    key_column: subject\n    columns: [S, P, O]\n"
        "column_map: {S: subject, P: predicate, O: object}\n"
        "engine:\n"
        f"  graph_dir: {tmp_path / 'graph'}\n"
        f"  checkpoint_dir: {tmp_path / 'ckpt'}\n"
    )
    args = [
        sys.executable,
        "-m",
        "consume_kafka_avro_data_spark",
        "-c",
        str(cfg),
        "--ocf",
        str(lake),
    ]
    out = subprocess.run(
        args, capture_output=True, text=True, timeout=300, cwd=str(REPO)
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ocf_ingest new_vertices=3 new_edges=2" in out.stdout
    # replay: the merge is idempotent, a second run adds nothing
    out2 = subprocess.run(
        args, capture_output=True, text=True, timeout=300, cwd=str(REPO)
    )
    assert "ocf_ingest new_vertices=0 new_edges=0" in out2.stdout


def test_cli_produce_csv_then_consume_full_loop(spark, tmp_path):
    """The reference's WHOLE deployment loop through the CLI: the
    producer tool its input_type:csv config implies (CSV → config
    projection → Confluent-Avro frames → topic), then the consumer
    (topic → decode → idempotent graph merge) — two processes, one
    stand-in topic directory, reference column names throughout."""
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "spo.csv").write_text(
        "Source,Relationship,Target\n"
        "a,knows,b\n"
        "b,knows,c\n"
    )
    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        "kafka: {}\n"
        "input_type: csv\n"
        "type_map:\n  spo:\n    key_column: subject\n"
        "    columns: [Source, Relationship, Target]\n"
        "column_map: {Source: subject, Relationship: predicate, "
        "Target: object}\n"
        "engine:\n"
        "  schema_id: 2\n"
        f"  graph_dir: {tmp_path / 'graph'}\n"
        f"  checkpoint_dir: {tmp_path / 'ckpt'}\n"
    )
    topic_dir = tmp_path / "topic"

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "consume_kafka_avro_data_spark",
             "-c", str(cfg), *extra],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(REPO),
        )

    prod = run("--produce-csv", str(csv_dir), "--batch", str(topic_dir))
    assert prod.returncode == 0, prod.stderr[-2000:]
    assert "produced=2 delivered=2" in prod.stdout

    cons = run("--batch", str(topic_dir))
    assert cons.returncode == 0, cons.stderr[-2000:]
    assert "valid=2" in cons.stdout and "errors=0" in cons.stdout
    graph = spark.read.parquet(str(tmp_path / "graph" / "objects"))
    assert sorted(r.object_name for r in graph.collect()) == ["a", "b", "c"]


def _write_cfg(tmp_path, doc, name="cfg.yaml"):
    import yaml

    p = tmp_path / name
    p.write_text(yaml.safe_dump(doc))
    return str(p)


def test_cli_dry_run_catches_bad_avro_field_name(tmp_path, capsys):
    """Schema ASSEMBLY is part of --dry-run's contract: a column_map
    producing an Avro-invalid field name must exit 2 with the config-
    error message, not escape as an uncaught traceback."""
    cfg = _write_cfg(
        tmp_path,
        {
            "kafka": {"bootstrap.servers": "b:9092"},
            "type_map": {"t": {"key_column": "a", "columns": ["a", "b"]}},
            "column_map": {"a": "a", "b": "my-field"},
        },
    )
    assert main(["-c", cfg, "--dry-run"]) == 2
    assert "invalid config" in capsys.readouterr().err


def test_cli_empty_engine_section_uses_defaults(tmp_path, capsys):
    """A bare `engine:` placeholder line parses as None; the CLI must
    treat it as an empty section, not crash on None.get."""
    import yaml

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "kafka": {"bootstrap.servers": "b:9092"},
                "type_map": {
                    "t": {"key_column": "s", "columns": ["a", "b", "c"]}
                },
                "column_map": {"a": "s", "b": "p", "c": "o"},
            }
        )
        + "engine:\n"
    )
    # --ocf over an empty dir exercises the engine-section parse and a
    # full (empty) ingest without a broker.  Subprocess: the CLI stops
    # its SparkSession on exit, which would kill the shared fixture.
    empty = tmp_path / "lake"
    empty.mkdir()
    assert main(["-c", str(cfg), "--dry-run"]) == 0  # None engine parses
    out = subprocess.run(
        [
            sys.executable, "-m", "consume_kafka_avro_data_spark",
            "-c", str(cfg), "--ocf", str(empty),
        ],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ocf_ingest" in out.stdout


def test_cli_multi_topic_note_and_selection(tmp_path, capsys):
    """A multi-topic type_map must be VISIBLE: the default run names
    the topics it is not ingesting, and --topic selects one; an unknown
    --topic is a config error."""
    doc = {
        "kafka": {"bootstrap.servers": "b:9092"},
        "type_map": {
            "t1": {"key_column": "a", "columns": ["a", "b"]},
            "t2": {"key_column": "x", "columns": ["x", "y"]},
        },
    }
    cfg = _write_cfg(tmp_path, doc)
    assert main(["-c", cfg, "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "running 't1' only" in out and "t2" in out
    assert main(["-c", cfg, "--topic", "t2", "--dry-run"]) == 0
    assert "topic=t2" in capsys.readouterr().out
    assert main(["-c", cfg, "--topic", "nope", "--dry-run"]) == 2
    assert "not in the config" in capsys.readouterr().err


def test_cli_ocf_requires_three_columns(tmp_path, capsys):
    """The --ocf graph path enforces the same 3-column SPO guard the
    stream ingest does: a 2-column config must exit 2 with a clear
    message (not TypeError), a 4-column one must not silently drop the
    fourth field."""
    for cols in (["a", "b"], ["a", "b", "c", "d"]):
        doc = {
            "kafka": {"bootstrap.servers": "b:9092"},
            "type_map": {"t": {"key_column": "a", "columns": cols}},
        }
        cfg = _write_cfg(tmp_path, doc, name=f"cfg{len(cols)}.yaml")
        lake = tmp_path / f"lake{len(cols)}"
        lake.mkdir()
        assert main(["-c", cfg, "--ocf", str(lake)]) == 2
        assert "exactly 3 configured columns" in capsys.readouterr().err


def test_cli_live_produce_requires_bootstrap_servers(tmp_path, capsys):
    """Live --produce-csv without kafka.bootstrap.servers must exit 2
    BEFORE building a session or touching the registry (registering a
    schema version is a mutating network side effect)."""
    cfg = _write_cfg(
        tmp_path,
        {
            "kafka": {},
            "type_map": {"t": {"key_column": "a", "columns": ["a", "b"]}},
        },
    )
    d = tmp_path / "csv"
    d.mkdir()
    (d / "part.csv").write_text("a,b\nx,y\n")
    assert main(["-c", cfg, "--produce-csv", str(d)]) == 2
    assert "bootstrap.servers" in capsys.readouterr().err
