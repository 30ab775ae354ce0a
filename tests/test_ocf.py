"""Avro Object Container File source/sink: spec-golden reader check
(file bytes hand-assembled in the test, independent of the writer),
writer/reader roundtrip under both codecs, distributed multi-file +
schema-evolution reads, and strict corruption errors."""

from __future__ import annotations

import json
import struct

import pytest

from consume_kafka_avro_data_spark.config import parse_config
from consume_kafka_avro_data_spark.sources.ocf import (
    OCF_MAGIC,
    read_ocf,
    read_ocf_bytes,
    write_ocf,
    write_ocf_bytes,
)

SPO_DOC = {
    "kafka": {},
    "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
    "column_map": {"S": "subject", "P": "predicate", "O": "object"},
}
TRIPLES = [
    ("Don Vito", "Email", "donvito@example.com"),
    ("Underboss Marco", "Captain", "Capo Salvatore"),
    ("Soldier Nico", "Illegal Arms Deal", "1990"),
]


def _sc():
    return parse_config(SPO_DOC).schema_for("spo")


# ---------------------------------------------------------------------------
# spec-golden reader check: bytes assembled by hand from the Avro spec,
# no write_ocf_bytes involved
# ---------------------------------------------------------------------------


def _zz(n: int) -> bytes:  # unsigned varint of zigzag(n), per the spec
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _s(v: str) -> bytes:  # avro string: length varint + utf-8
    raw = v.encode("utf-8")
    return _zz(len(raw)) + raw


def test_reader_parses_hand_assembled_spec_file():
    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "name", "type": "string"},
                {"name": "n", "type": "long"},
                {"name": "x", "type": "double"},
            ],
        }
    )
    sync = bytes(range(16))
    body = (_s("alpha") + _zz(7) + struct.pack("<d", 2.5)) + (
        _s("beta") + _zz(-3) + struct.pack("<d", -0.25)
    )
    buf = (
        OCF_MAGIC
        # metadata map: one block of 2 entries, then the 0 terminator
        + _zz(2)
        + _s("avro.schema") + _zz(len(schema.encode())) + schema.encode()
        + _s("avro.codec") + _zz(4) + b"null"
        + _zz(0)
        + sync
        # one data block: 2 records
        + _zz(2) + _zz(len(body)) + body + sync
    )
    fields, records = read_ocf_bytes(buf)
    assert fields == [("name", "string"), ("n", "long"), ("x", "double")]
    assert list(records) == [
        {"name": "alpha", "n": 7, "x": 2.5},
        {"name": "beta", "n": -3, "x": -0.25},
    ]


def test_reader_handles_negative_count_metadata_block():
    """The spec allows map blocks with a NEGATIVE count followed by a
    byte size; third-party writers emit them."""
    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    )
    sync = b"\x01" * 16
    entries = (
        _s("avro.schema") + _zz(len(schema.encode())) + schema.encode()
    )
    buf = (
        OCF_MAGIC
        + _zz(-1) + _zz(len(entries)) + entries  # negative-count block
        + _zz(0)
        + sync
        + _zz(1) + _zz(1) + _zz(21) + sync  # one record: a=21
    )
    fields, records = read_ocf_bytes(buf)
    assert fields == [("a", "long")]
    assert list(records) == [{"a": 21}]


# ---------------------------------------------------------------------------
# roundtrip + corruption
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_bytes_roundtrip_both_codecs(codec):
    fields = [("subject", "string"), ("n", "long")]
    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "subject", "type": "string"},
                {"name": "n", "type": "long"},
            ],
        }
    )
    rows = [{"subject": f"s{i}", "n": i * 1000003} for i in range(250)]
    buf = write_ocf_bytes(fields, rows, schema, codec, records_per_block=64)
    got_fields, records = read_ocf_bytes(buf)
    assert got_fields == fields
    assert list(records) == rows
    if codec == "deflate":
        null_buf = write_ocf_bytes(fields, rows, schema, "null", 64)
        assert len(buf) < len(null_buf)  # deflate actually compresses


def test_corrupt_sync_and_bad_magic_raise():
    fields = [("a", "long")]
    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    )
    buf = bytearray(write_ocf_bytes(fields, [{"a": 1}], schema, "null"))
    buf[-1] ^= 0xFF  # flip one sync byte
    with pytest.raises(ValueError, match="sync marker mismatch"):
        list(read_ocf_bytes(bytes(buf))[1])
    with pytest.raises(ValueError, match="not an Avro OCF"):
        read_ocf_bytes(b"PAR1" + bytes(buf))
    with pytest.raises(ValueError, match="unsupported type"):
        read_ocf_bytes(
            write_ocf_bytes(
                fields,
                [],
                json.dumps(
                    {
                        "type": "record",
                        "name": "r",
                        "fields": [{"name": "a", "type": ["null", "long"]}],
                    }
                ),
                "null",
            )
        )


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------


def test_truncated_header_sync_raises():
    """A file cut in (or before) the header sync must raise — an empty
    record iterator would read a partially-uploaded file as validly
    empty and silently lose rows."""
    fields = [("a", "long")]
    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    )
    buf = write_ocf_bytes(fields, [{"a": 1}, {"a": 2}], schema, "null")
    _, recs = read_ocf_bytes(buf)
    assert len(list(recs)) == 2  # intact file reads fully
    # every truncation point inside the header region (magic + metadata
    # map + sync) must raise, never parse as a valid empty file
    for cut in range(4, 120):
        with pytest.raises(ValueError):
            _, r = read_ocf_bytes(buf[:cut])
            list(r)


def test_missing_field_name_raises_valueerror():
    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"type": "long"}]}
    )
    with pytest.raises(ValueError, match="without a name"):
        write_and_read = write_ocf_bytes([("a", "long")], [], schema, "null")
        read_ocf_bytes(write_and_read)


def test_spark_read_ignores_stray_files_and_names_corrupt_ones(
    spark, tmp_path
):
    sc = _sc()
    df = spark.createDataFrame(TRIPLES, ["S", "P", "O"])
    path = str(tmp_path / "lake")
    write_ocf(df, sc, path)
    import os

    # a crashed write's .tmp and a random sidecar must not abort the read
    with open(os.path.join(path, "part-00001.avro.tmp"), "wb") as f:
        f.write(b"partial garbage")
    with open(os.path.join(path, "_SUCCESS"), "wb") as f:
        f.write(b"")
    assert read_ocf(spark, path, sc).count() == 3

    # a corrupt .avro DOES abort — and the error names the file
    bad = os.path.join(path, "part-00002.avro")
    with open(bad, "wb") as f:
        f.write(b"Obj\x01garbage")
    with pytest.raises(Exception, match="part-00002.avro"):
        read_ocf(spark, path, sc).count()


def test_spark_roundtrip_and_multifile_read(spark, tmp_path):
    sc = _sc()
    df = spark.createDataFrame(TRIPLES, ["S", "P", "O"])
    path = str(tmp_path / "lake")
    n = write_ocf(df, sc, path)
    assert n == 3
    # a second generation lands alongside (multi-file directory read)
    import os

    os.rename(
        os.path.join(path, "part-00000.avro"),
        os.path.join(path, "part-a.avro"),
    )
    write_ocf(df.limit(1), sc, path)
    got = read_ocf(spark, path, sc)
    rows = sorted(
        (r.subject, r.predicate, r.object) for r in got.collect()
    )
    assert rows == sorted(
        [(s, p, o) for s, p, o in TRIPLES] + [TRIPLES[0]]
    )
    # the read is pure-JVM scan + ONE Arrow stage, no per-row Python
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_spark_read_resolves_writer_to_reader_schema(spark, tmp_path):
    """A file written with (subject, predicate, object) read by a
    config that renames O away, widens nothing, and adds a defaulted
    field — the registry-stream resolution rules applied at rest."""
    sc = _sc()
    df = spark.createDataFrame(TRIPLES, ["S", "P", "O"])
    path = str(tmp_path / "gen1")
    write_ocf(df, sc, path)

    reader_doc = {
        "kafka": {},
        "type_map": {
            "spo": {"key_column": "subject", "columns": ["S", "P", "W"]}
        },
        "column_map": {"S": "subject", "P": "predicate", "W": "weight"},
        "column_type_transforms": {"W": "long"},  # keyed by INPUT column
    }
    reader = parse_config(reader_doc).schema_for("spo")
    got = read_ocf(spark, path, reader, defaults={"weight": 1})
    rows = sorted((r.subject, r.predicate, r.weight) for r in got.collect())
    assert rows == sorted((s, p, 1) for s, p, _ in TRIPLES)

    with pytest.raises(Exception, match="absent and has no default"):
        read_ocf(spark, path, reader).collect()


def test_reader_avro_schema_json_injects_defaults():
    """The native tier's ``avroSchema`` string must carry the declared
    defaults as per-field ``default`` entries (the spec's mechanism for
    reader-only fields) and leave other fields untouched."""
    import json as _json

    from consume_kafka_avro_data_spark.sources.ocf import (
        reader_avro_schema_json,
    )

    reader_doc = {
        "kafka": {},
        "type_map": {
            "spo": {"key_column": "subject", "columns": ["S", "P", "W"]}
        },
        "column_map": {"S": "subject", "P": "predicate", "W": "weight"},
        "column_type_transforms": {"W": "long"},
    }
    reader = parse_config(reader_doc).schema_for("spo")
    sch = _json.loads(reader_avro_schema_json(reader, {"weight": 1}))
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["weight"]["default"] == 1
    assert "default" not in by_name["subject"]
    # no defaults at all → byte-equal to the plain reader schema
    assert reader_avro_schema_json(reader) == reader.to_avro_schema_json()


def test_read_ocf_native_tier_agrees_with_python_tier(spark, tmp_path):
    """With spark-avro on the classpath the JVM ``format("avro")`` tier
    must return exactly the rows the pure-Python tier returns on the
    same files — including writer→reader resolution with a defaulted
    reader-only field — with no Python stage in its plan.  Skipped in
    jar-less sandboxes (same env gate as the wire codec's agreement
    test)."""
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        native_avro_available,
    )

    if not native_avro_available(spark):
        pytest.skip("spark-avro datasource not on classpath")
    sc = _sc()
    df = spark.createDataFrame(TRIPLES, ["S", "P", "O"])
    path = str(tmp_path / "lake")
    write_ocf(df, sc, path)

    same = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    py = read_ocf(spark, path, sc, use_native=False)
    jvm = read_ocf(spark, path, sc, use_native=True)
    assert same(py) == same(jvm)
    assert py.schema.fieldNames() == jvm.schema.fieldNames()
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    reader_doc = {
        "kafka": {},
        "type_map": {
            "spo": {"key_column": "subject", "columns": ["S", "P", "W"]}
        },
        "column_map": {"S": "subject", "P": "predicate", "W": "weight"},
        "column_type_transforms": {"W": "long"},
    }
    reader = parse_config(reader_doc).schema_for("spo")
    py_r = read_ocf(spark, path, reader, {"weight": 1}, use_native=False)
    jvm_r = read_ocf(spark, path, reader, {"weight": 1}, use_native=True)
    assert same(py_r) == same(jvm_r)
