"""Avro codec tests: roundtrip identity over the reference's 5-type
universe (SURVEY §5 property-based strategy), Confluent framing, DLQ
routing for malformed frames, and the distributed encode/decode path."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from consume_kafka_avro_data_spark.config import parse_config
from consume_kafka_avro_data_spark.sources.avro_codec import (
    decode_record,
    encode_record,
    frame_confluent,
    from_confluent_avro,
    to_confluent_avro,
    unframe_confluent,
)
from consume_kafka_avro_data_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
)

FIELDS = [
    ("s", "string"),
    ("i", "int"),
    ("l", "long"),
    ("f", "float"),
    ("d", "double"),
]


@given(
    s=st.text(max_size=200),
    i=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    l=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    f=st.floats(width=32, allow_nan=False),
    d=st.floats(allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_roundtrip_property(s, i, l, f, d):
    vals = {"s": s, "i": i, "l": l, "f": f, "d": d}
    out = decode_record(FIELDS, encode_record(FIELDS, vals))
    assert out["s"] == s and out["i"] == i and out["l"] == l
    assert out["f"] == f and out["d"] == d


def test_known_encoding_bytes():
    # zigzag varint: 1 -> 0x02; -1 -> 0x01; "ab" -> len 2 + bytes
    assert encode_record([("x", "long")], {"x": 1}) == b"\x02"
    assert encode_record([("x", "long")], {"x": -1}) == b"\x01"
    assert encode_record([("x", "long")], {"x": 64}) == b"\x80\x01"
    assert encode_record([("x", "string")], {"x": "ab"}) == b"\x04ab"


def test_confluent_framing_roundtrip():
    body = encode_record(FIELDS, {"s": "x", "i": 1, "l": 2, "f": 0.5, "d": 0.25})
    framed = frame_confluent(body, 2)
    assert framed[0] == 0 and framed[1:5] == b"\x00\x00\x00\x02"
    sid, out = unframe_confluent(framed)
    assert sid == 2 and out == body


def test_bad_magic_byte_message_matches_reference_logs():
    # raw JSON on an Avro topic: first byte '{' = 0x7B = 123
    with pytest.raises(ValueError, match=r"Invalid CP1 magic byte 123, expected 0"):
        unframe_confluent(b'{"subject": "Don Vito"}')


def test_malformed_body_raises():
    with pytest.raises(ValueError):
        decode_record([("x", "string")], b"\xff")  # truncated varint/string
    with pytest.raises(ValueError):
        decode_record([("x", "double")], b"\x01\x02")  # truncated double
    with pytest.raises(ValueError, match="trailing"):
        decode_record([("x", "long")], b"\x02\x02")


SPO_DOC = {
    "kafka": {},
    "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
    "column_map": {"S": "subject", "P": "predicate", "O": "object"},
}


def test_spark_encode_decode_dlq(spark):
    """Distributed path: encode, corrupt some frames, decode, route."""
    from pyspark.sql import functions as F

    sc = parse_config(SPO_DOC).schema_for("spo")
    df = spark.createDataFrame(
        [("Don Vito", "Email", "donvito@example.com"), ("A", "Captain", "B")],
        ["S", "P", "O"],
    )
    framed = to_confluent_avro(df, sc, schema_id=2)
    assert framed.columns == ["key", "value"]
    keys = {r.key for r in framed.collect()}
    assert keys == {"Don Vito", "A"}  # key_column routing

    # inject the reference's observed failure: unframed JSON on the topic
    bad = spark.createDataFrame(
        [("junk", bytearray(b'{"not": "avro"}'))], ["key", "value"]
    )
    decoded = from_confluent_avro(framed.unionByName(bad), sc, expected_schema_id=2)
    ok = decoded.where(F.col("_error").isNull())
    dlq = decoded.where(F.col("_error").isNotNull())
    assert ok.count() == 2 and dlq.count() == 1
    assert "Invalid CP1 magic byte 123" in dlq.collect()[0]._error
    got = {(r.subject, r.predicate, r.object) for r in ok.collect()}
    assert got == {("Don Vito", "Email", "donvito@example.com"), ("A", "Captain", "B")}
    assert {r._schema_id for r in ok.collect()} == {2}


def test_schema_id_mismatch_routed(spark):
    from pyspark.sql import functions as F

    sc = parse_config(SPO_DOC).schema_for("spo")
    df = spark.createDataFrame([("a", "b", "c")], ["S", "P", "O"])
    framed = to_confluent_avro(df, sc, schema_id=7)
    decoded = from_confluent_avro(framed, sc, expected_schema_id=2)
    [row] = decoded.collect()
    assert row._error is not None and "schema id 7" in row._error


def test_registry_offline_cache_and_register():
    reg = SchemaRegistryClient(url=None, seed={"spo-value": (2, '{"type":"record"}')})
    assert reg.fetch_value_schema("spo") == (2, '{"type":"record"}')
    assert reg.fetch_by_id(2) == '{"type":"record"}'
    sid = reg.register_value_schema("other", '{"x":1}')
    assert sid == 3  # next free id offline
    assert reg.fetch_value_schema("other") == (3, '{"x":1}')
    with pytest.raises(SchemaRegistryError):
        reg.fetch_value_schema("missing")  # no URL, not cached


def test_registry_subject_naming():
    assert SchemaRegistryClient.value_subject("spo") == "spo-value"


def test_nan_float_roundtrip():
    out = decode_record(
        [("f", "float"), ("d", "double")],
        encode_record([("f", "float"), ("d", "double")], {"f": float("nan"), "d": float("nan")}),
    )
    assert math.isnan(out["f"]) and math.isnan(out["d"])


def test_multi_schema_topic_single_pass_decode(spark):
    """A topic interleaving two schema ids decodes in ONE pass: each
    frame dispatched to its writer schema, unknown ids and bad magic
    routed to _error (SURVEY §7 multi-schema hard part)."""
    import json

    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro_multi,
    )

    spo = parse_config(SPO_DOC).schema_for("spo")
    metrics_doc = {
        "kafka": {},
        "type_map": {
            "metrics": {"key_column": "name", "columns": ["name", "val"]}
        },
        "column_type_transforms": {"val": "double"},
    }
    met = parse_config(metrics_doc).schema_for("metrics")

    f1 = to_confluent_avro(
        spark.createDataFrame([("s", "p", "o")], ["S", "P", "O"]), spo, schema_id=2
    )
    f2 = to_confluent_avro(
        spark.createDataFrame([("cpu", 0.5)], ["name", "val"]), met, schema_id=9
    )
    f3 = to_confluent_avro(  # id 5 not configured
        spark.createDataFrame([("x", "y", "z")], ["S", "P", "O"]), spo, schema_id=5
    )
    bad = spark.createDataFrame(
        [("junk", bytearray(b'{"not": "avro"}'))], ["key", "value"]
    )
    topic = f1.unionByName(f2).unionByName(f3).unionByName(bad)

    out = from_confluent_avro_multi(topic, {2: spo, 9: met}).collect()
    by_key = {r.key: r for r in out}

    assert json.loads(by_key["s"].json) == {"subject": "s", "predicate": "p", "object": "o"}
    assert by_key["s"]._schema_id == 2
    assert json.loads(by_key["cpu"].json) == {"name": "cpu", "val": 0.5}
    assert by_key["cpu"]._schema_id == 9
    assert "unknown schema id 5" in by_key["x"]._error
    assert "Invalid CP1 magic byte 123" in by_key["junk"]._error


def test_resolve_record_rules():
    """Spec resolution: shared fields copied, widened numerics promoted,
    writer-only dropped, reader-only defaulted, no-default errors."""
    from consume_kafka_avro_data_spark.sources.avro_codec import resolve_record

    writer = [("a", "string"), ("n", "int"), ("legacy", "string")]
    reader = [("a", "string"), ("n", "double"), ("added", "string")]
    body = encode_record(writer, {"a": "x", "n": 7, "legacy": "old"})
    out = resolve_record(writer, reader, {"added": "dflt"}, body)
    assert out == {"a": "x", "n": 7.0, "added": "dflt"}
    with pytest.raises(ValueError, match="no default"):
        resolve_record(writer, reader, {}, body)
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_record([("a", "string")], [("a", "int")], {}, encode_record([("a", "string")], {"a": "x"}))


def test_schema_evolution_mixed_writers(spark):
    """A topic carrying TWO writer generations (v1 without `source`,
    v2 with it) decodes into the evolved reader schema in one pass:
    v1 rows take the default, v2 rows keep their value — the registry
    evolution scenario the reference's per-message schema ids exist for
    (src/SchemaRegistry.cpp:84-104)."""
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro_resolved,
    )

    v1_doc = {
        "kafka": {},
        "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
        "column_map": {"S": "subject", "P": "predicate", "O": "object"},
    }
    v2_doc = {
        "kafka": {},
        "type_map": {
            "spo": {"key_column": "subject", "columns": ["S", "P", "O", "SRC"]}
        },
        "column_map": {
            "S": "subject", "P": "predicate", "O": "object", "SRC": "source"
        },
    }
    v1 = parse_config(v1_doc).schema_for("spo")
    v2 = parse_config(v2_doc).schema_for("spo")
    old = to_confluent_avro(
        spark.createDataFrame([("a", "knows", "b")], ["S", "P", "O"]), v1, schema_id=1
    )
    new = to_confluent_avro(
        spark.createDataFrame(
            [("c", "knows", "d", "crawl")], ["S", "P", "O", "SRC"]
        ),
        v2,
        schema_id=2,
    )
    decoded = from_confluent_avro_resolved(
        old.unionByName(new),
        writer_configs={1: v1, 2: v2},
        reader_config=v2,
        defaults={"source": "unknown"},
    )
    assert decoded.where(F.col("_error").isNotNull()).count() == 0
    got = {
        (r.subject, r.object, r.source, r._schema_id)
        for r in decoded.collect()
    }
    assert got == {("a", "b", "unknown", 1), ("c", "d", "crawl", 2)}


def test_tombstone_routed_to_dlq(spark):
    """A null Kafka value (compaction tombstone) must route to _error,
    not crash the decode task with TypeError."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    sc = parse_config(SPO_DOC).schema_for("spo")
    good = to_confluent_avro(
        spark.createDataFrame([("a", "b", "c")], ["S", "P", "O"]), sc, schema_id=2
    )
    tomb = spark.createDataFrame(
        [Row(key="gone")], "key string"
    ).select("key", F.lit(None).cast("binary").alias("value"))
    decoded = from_confluent_avro(good.unionByName(tomb), sc, expected_schema_id=2)
    rows = {r.key: r._error for r in decoded.collect()}
    assert rows["a"] is None
    assert "tombstone" in rows["gone"]


def test_encode_rejects_null_fields():
    """Null field values must raise (schema has no null union), never
    silently serialize str(None) == 'None'."""
    with pytest.raises(ValueError, match="null union"):
        encode_record([("s", "string")], {"s": None})
    with pytest.raises(ValueError, match="null union"):
        encode_record([("n", "long")], {"n": None})


def test_corrupt_varint_overflow_is_value_error():
    """A 10-byte varint with bits above 63 set is produced by no legal
    Avro encoder — it must raise ValueError (→ DLQ) rather than mask to
    a plausible wrong value or crash the Arrow conversion later.  The
    legal extreme (-2**63, whose 10th byte is exactly 0x01) must still
    round-trip."""
    body = bytes([0xFF] * 9 + [0x7F])
    with pytest.raises(ValueError, match="overflows 64 bits"):
        decode_record([("n", "long")], body)
    legal = encode_record([("n", "long")], {"n": -(2**63)})
    assert decode_record([("n", "long")], legal)["n"] == -(2**63)


def test_schema_id_is_signed_int32():
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        frame_confluent,
        unframe_confluent,
    )

    sid, body = unframe_confluent(frame_confluent(b"x", 2**31 - 1))
    assert sid == 2**31 - 1 and body == b"x"
    with pytest.raises(ValueError, match="int32 range"):
        frame_confluent(b"x", 2**31)
    with pytest.raises(ValueError, match="negative schema id"):
        unframe_confluent(b"\x00\xff\xff\xff\xff" + b"x")


# ---------------------------------------------------------------------------
# native (spark-avro) path — SURVEY §7 step 4; VERDICT r02 item 2
# ---------------------------------------------------------------------------


def _error_for(frame: bytes | None, expected: int | None) -> str | None:
    """Expected _error per the PYTHON codec's header rules (the header
    contract both codec paths must share)."""
    if frame is None:
        return "null value (tombstone)"
    try:
        sid, _ = unframe_confluent(frame)
    except ValueError as e:
        return str(e)
    if expected is not None and sid != expected:
        return f"schema id {sid} != expected {expected}"
    return None


def test_cp1_header_error_expressions_match_python_codec(spark):
    """The JVM header-validation expressions (_cp1_header_error) must
    emit byte-identical error strings to unframe_confluent, so a DLQ's
    contents don't depend on which codec path a deployment runs.  Jar-
    independent: exercises only the header expressions, not from_avro."""
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        _cp1_header_error,
    )

    frames: list[bytes | None] = [
        frame_confluent(b"\x02x", 2),              # valid, id matches
        frame_confluent(b"\x02x", 7),              # valid, id mismatch
        b"",                                        # empty
        b"\x00\x00\x00",                            # too short
        b'{"not": "avro"}',                         # bad magic (123)
        b"\x00\xff\xff\xff\xff" + b"x",            # negative schema id
        None,                                       # tombstone
    ]
    df = spark.createDataFrame(
        [(i, bytearray(f) if f is not None else None) for i, f in enumerate(frames)],
        "i int, value binary",
    )
    v = F.col("value")
    sid_u = F.conv(F.hex(v.substr(2, 4)), 16, 10).cast("long")
    sid = F.when(sid_u >= F.lit(2**31), sid_u - F.lit(2**32)).otherwise(sid_u)
    got = {
        r.i: r.err
        for r in df.select(
            "i", _cp1_header_error(v, sid, 2).alias("err")
        ).collect()
    }
    for i, f in enumerate(frames):
        assert got[i] == _error_for(f, 2), f"frame {i}: {got[i]!r}"


def _native_available(spark) -> bool:
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        native_avro_available,
    )

    return native_avro_available(spark)


def test_native_and_pandas_codecs_agree(spark):
    """With spark-avro on the classpath, the JVM from_avro/to_avro path
    must produce byte-identical frames and identical decoded rows to the
    pandas codec on the same input (skipped in jar-less sandboxes)."""
    if not _native_available(spark):
        pytest.skip("spark-avro datasource not on classpath")
    from pyspark.sql import functions as F

    sc = parse_config(SPO_DOC).schema_for("spo")
    df = spark.createDataFrame(
        [("Don Vito", "Email", "donvito@example.com"), ("A", "Captain", "B")],
        ["S", "P", "O"],
    )
    f_py = to_confluent_avro(df, sc, schema_id=2, use_native=False)
    f_jvm = to_confluent_avro(df, sc, schema_id=2, use_native=True)
    by_key_py = {r.key: bytes(r.value) for r in f_py.collect()}
    by_key_jvm = {r.key: bytes(r.value) for r in f_jvm.collect()}
    assert by_key_py == by_key_jvm  # byte-identical CP1 frames

    bad = spark.createDataFrame(
        [("junk", bytearray(b'{"not": "avro"}'))], ["key", "value"]
    )
    topic = f_py.unionByName(bad)
    cols = ["key", "_error", "_schema_id", "subject", "predicate", "object"]
    d_py = from_confluent_avro(topic, sc, expected_schema_id=2, use_native=False)
    d_jvm = from_confluent_avro(topic, sc, expected_schema_id=2, use_native=True)
    rows_py = {tuple(r[c] for c in cols) for r in d_py.collect()}
    rows_jvm = {tuple(r[c] for c in cols) for r in d_jvm.collect()}
    assert rows_py == rows_jvm

    # valid CP1 header + garbage body: BOTH codecs must route it to the
    # DLQ (null fields, non-null _error) — messages may differ (the
    # native path's single 'malformed Avro body' vs the pandas codec's
    # reason string), but validity must not.  Regression for the
    # PERMISSIVE from_avro nullResultRow trap: a failed decode is a
    # struct of nulls, NOT a null struct, so an isNull test never fires.
    corrupt = spark.createDataFrame(
        [("c", bytearray(frame_confluent(b"\xff", 2)))], ["key", "value"]
    )
    for use_native in (False, True):
        r = from_confluent_avro(
            corrupt, sc, expected_schema_id=2, use_native=use_native
        ).collect()[0]
        assert r["_error"] is not None, f"use_native={use_native}"
        assert r["subject"] is None and r["object"] is None


def test_native_decode_plan_is_pure_jvm(spark):
    """The native decode/encode plans must contain NO Python evaluation
    node — that is the entire point of the native path at 100 TB."""
    if not _native_available(spark):
        pytest.skip("spark-avro datasource not on classpath")
    sc = parse_config(SPO_DOC).schema_for("spo")
    df = spark.createDataFrame(
        [("Don Vito", "Email", "d@example.com")], ["S", "P", "O"]
    )
    framed = to_confluent_avro(df, sc, schema_id=2, use_native=True)
    decoded = from_confluent_avro(framed, sc, use_native=True)
    for d in (framed, decoded):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_native_header_expressions_match_python_codec_jarless(spark):
    """The native decode's JVM HEADER constructs — hex/conv signed-sid
    reconstruction (_cp1_sid_signed) and the error-string ladder
    (_cp1_header_error) — are plain Spark SQL expressions needing no
    spark-avro jar, so they run HERE even though the full-path
    agreement test is env-skipped.  Every header-level frame shape must
    yield the byte-identical error string (or None) the Python codec's
    unframe_confluent raises, and the reconstructed id must equal the
    signed big-endian unpack, including int32-boundary ids."""
    import struct

    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        _cp1_header_error,
        _cp1_sid_signed,
        unframe_confluent,
    )

    def py_header_error(v: bytes | None, expected: int | None) -> str | None:
        if v is None:
            return "null value (tombstone)"
        try:
            sid, _ = unframe_confluent(v)
        except ValueError as e:
            return str(e)
        if expected is not None and sid != expected:
            return f"schema id {sid} != expected {expected}"
        return None

    def frame(sid_bytes: bytes, magic: bytes = b"\x00") -> bytes:
        return magic + sid_bytes + b"body"

    cases = [
        None,  # tombstone
        b"",  # too short (0)
        b"\x00\x00\x00\x00",  # too short (4)
        frame(struct.pack(">i", 2)),  # valid, matches expected
        frame(struct.pack(">i", 7)),  # valid, wrong id
        frame(struct.pack(">i", 2**31 - 1)),  # max positive int32
        frame(b"\x80\x00\x00\x00"),  # sign bit set -> -2147483648
        frame(b"\xff\xff\xff\xff"),  # -1
        frame(struct.pack(">i", 2), magic=b"\x7b"),  # raw JSON '{'
        frame(struct.pack(">i", 2), magic=b"\xff"),  # other bad magic
    ]
    df = spark.createDataFrame(
        [(i, bytearray(c) if c is not None else None) for i, c in enumerate(cases)],
        "i int, value binary",
    )
    for expected in (2, None):
        got = {
            r["i"]: (r["err"], r["sid"])
            for r in df.select(
                "i",
                _cp1_header_error(
                    F.col("value"), _cp1_sid_signed(F.col("value")), expected
                ).alias("err"),
                _cp1_sid_signed(F.col("value")).alias("sid"),
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i][0] == py_header_error(c, expected), (i, c, expected)
            if c is not None and len(c) >= 5:
                (want_sid,) = struct.unpack_from(">i", c, 1)
                assert got[i][1] == want_sid, (i, c)


def test_null_fold_any_every_jarless(spark):
    """_null_fold backs the native decode's all-null failure-row
    detection and the DLQ JSON recovery's field checks — exercise all
    four (null, every) combinations on a struct column without the
    jar, plus the empty-fields guard."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import _null_fold

    fields = [("a", "string"), ("b", "long")]
    df = spark.createDataFrame(
        [(1, "x", 2), (2, "x", None), (3, None, None)],
        "i int, a string, b long",
    ).select("i", F.struct("a", "b").alias("s"))
    out = {
        r["i"]: (r["all_null"], r["any_null"], r["all_set"], r["any_set"])
        for r in df.select(
            "i",
            _null_fold("s", fields, null=True, every=True).alias("all_null"),
            _null_fold("s", fields, null=True, every=False).alias("any_null"),
            _null_fold("s", fields, null=False, every=True).alias("all_set"),
            _null_fold("s", fields, null=False, every=False).alias("any_set"),
        ).collect()
    }
    assert out[1] == (False, False, True, True)
    assert out[2] == (False, True, False, True)
    assert out[3] == (True, True, False, False)
    with _pytest.raises(ValueError, match="empty field list"):
        _null_fold("s", [], null=True, every=True)


def test_encode_rejects_out_of_range_ints():
    """Out-of-int64 longs would silently WRAP on the wire (2**63 zigzag
    masks to 1, decoding as -1 — undetectable corruption); out-of-int32
    ints would encode frames every decode rejects.  Both must fail at
    encode time, like the null check."""
    with pytest.raises(ValueError, match="long field 'n' out of range"):
        encode_record([("n", "long")], {"n": 2**63})
    with pytest.raises(ValueError, match="long field 'n' out of range"):
        encode_record([("n", "long")], {"n": -(2**63) - 1})
    with pytest.raises(ValueError, match="int field 'n' out of range"):
        encode_record([("n", "int")], {"n": 2**40})
    # boundary values still round-trip
    for v in (2**63 - 1, -(2**63)):
        assert decode_record(
            [("n", "long")], encode_record([("n", "long")], {"n": v})
        )["n"] == v


def test_decode_output_column_collisions_fail_fast(spark):
    """A passthrough input column that collides with a decode output
    (two same-named columns → every later reference ambiguous) or with
    an internal temp column (withColumn silently replaces user data)
    must raise at plan time — the jsonl _corrupt_record policy."""
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro,
        from_confluent_avro_multi,
    )

    sc = parse_config(SPO_DOC).schema_for("spo")
    framed = to_confluent_avro(
        spark.createDataFrame([("s", "p", "o")], ["S", "P", "O"]), sc, schema_id=2
    )
    with pytest.raises(ValueError, match="decode output"):
        from_confluent_avro(
            framed.withColumn("subject", F.lit("clash")), sc
        )
    with pytest.raises(ValueError, match="internal temp"):
        from_confluent_avro(framed.withColumn("_rec", F.lit(1)), sc)
    with pytest.raises(ValueError, match="decode output"):
        from_confluent_avro_multi(
            framed.withColumn("json", F.lit("clash")), {2: sc}
        )


def test_resolved_and_multi_keep_raw_for_dlq_replay(spark):
    """The evolution entry points must retain the undecoded frame on
    request: a frame dead-lettered for 'unknown writer schema id N' is
    exactly the one re-decoded after the missing config is added, which
    an error-string-only DLQ cannot do."""
    from pyspark.sql import functions as F

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro_multi,
        from_confluent_avro_resolved,
    )

    sc = parse_config(SPO_DOC).schema_for("spo")
    framed = to_confluent_avro(
        spark.createDataFrame([("s", "p", "o")], ["S", "P", "O"]), sc, schema_id=7
    )
    dlq = (
        from_confluent_avro_resolved(
            framed, writer_configs={2: sc}, reader_config=sc, keep_raw=True
        )
        .where(F.col("_error").isNotNull())
        .select(F.col("_raw_value").alias("value"))
    )
    assert dlq.count() == 1
    # replay after the fix: register id 7 and the dead letter decodes
    replay = from_confluent_avro_resolved(
        dlq, writer_configs={7: sc}, reader_config=sc
    ).collect()
    assert replay[0]._error is None and replay[0].subject == "s"
    multi = from_confluent_avro_multi(framed, {2: sc}, keep_raw=True)
    row = multi.collect()[0]
    assert "unknown schema id 7" in row._error
    assert bytes(row._raw_value) == bytes(framed.collect()[0].value)


def test_multi_json_is_rfc_compliant_for_nan(spark):
    """NaN/Infinity doubles are legal Avro values this codec round-
    trips, but bare NaN tokens are not RFC JSON — the interchange
    column serializes them as the quoted strings Spark's own to_json
    emits, so strict consumers can parse every _error-null row."""
    import json
    import math

    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro_multi,
    )

    doc = {
        "kafka": {},
        "type_map": {"m": {"key_column": "name", "columns": ["name", "val"]}},
        "column_type_transforms": {"val": "double"},
    }
    met = parse_config(doc).schema_for("m")
    framed = to_confluent_avro(
        spark.createDataFrame(
            [("nan", float("nan")), ("inf", float("inf")), ("ok", 1.5)],
            ["name", "val"],
        ),
        met,
        schema_id=3,
    )
    out = {r.key: r for r in from_confluent_avro_multi(framed, {3: met}).collect()}
    assert all(r._error is None for r in out.values())
    parsed = {k: json.loads(r.json) for k, r in out.items()}  # strict parse
    assert parsed["nan"]["val"] == "NaN"
    assert parsed["inf"]["val"] == "Infinity"
    assert parsed["ok"]["val"] == 1.5


def test_reader_defaults_are_type_checked_eagerly(spark, tmp_path):
    """A wrong-typed reader default must fail driver-side with the
    offending entry named — not mid-job in an Arrow cast (Python tier)
    or a spark-avro schema parse (native tier)."""
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        from_confluent_avro_resolved,
    )
    from consume_kafka_avro_data_spark.sources.ocf import read_ocf

    doc = {
        "kafka": {},
        "type_map": {"m": {"key_column": "name", "columns": ["name", "score"]}},
        "column_type_transforms": {"score": "double"},
    }
    cfg = parse_config(doc).schema_for("m")
    df = spark.createDataFrame([(bytearray(b"\x00" * 6),)], ["value"])
    with pytest.raises(ValueError, match="default for double field 'score'"):
        from_confluent_avro_resolved(
            df, writer_configs={1: cfg}, reader_config=cfg,
            defaults={"score": "unknown"},
        )
    with pytest.raises(ValueError, match="default for double field 'score'"):
        read_ocf(spark, str(tmp_path), cfg, defaults={"score": "unknown"})
    # a well-typed default passes the gate (int is fine for a double)
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        _validate_defaults,
    )

    _validate_defaults([("score", "double"), ("n", "long")], {"score": 0, "n": 3})
    with pytest.raises(ValueError, match="long field 'n'"):
        _validate_defaults([("n", "long")], {"n": 1.5})


def test_offline_registry_reregistration_is_idempotent():
    """Re-registering an identical schema must return the existing id
    (the Confluent behavior): a fresh id per call would rebind the
    subject and orphan frames already written under the old id."""
    from consume_kafka_avro_data_spark.sources.schema_registry import (
        SchemaRegistryClient,
    )

    reg = SchemaRegistryClient(url=None)
    s1 = '{"type":"record","name":"r","fields":[]}'
    id_a = reg.register_value_schema("t", s1)
    id_b = reg.register_value_schema("t", s1)  # producer restart
    assert id_a == id_b
    id_c = reg.register_value_schema("t", s1.replace("r", "r2"))
    assert id_c != id_a  # a genuinely new schema still gets a new id


def test_reader_defaults_are_range_checked():
    """Type alone is not enough: an out-of-int32 'int' default passes
    isinstance but dies in the Arrow cast mid-job — the eager check
    covers range too."""
    from consume_kafka_avro_data_spark.sources.avro_codec import (
        _validate_defaults,
    )

    with pytest.raises(ValueError, match="out of range"):
        _validate_defaults([("n", "int")], {"n": 2**40})
    with pytest.raises(ValueError, match="out of range"):
        _validate_defaults([("n", "long")], {"n": 2**63})
    _validate_defaults([("n", "int")], {"n": 2**31 - 1})  # boundary ok
