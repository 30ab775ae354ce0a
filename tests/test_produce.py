"""Producer path (T4): encode → deliver → stand-in topic → consume →
byte-exact decode, with delivery-report accounting.

Mirrors the reference's producer side: delivery-report callback
(src/KafkaDeliveryReportCb.cpp:6-16), poller (src/KafkaPoller.cpp:23-39),
hard-coded partition 0 (src/main.cpp:230).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.config import parse_config
from consume_kafka_avro_data_spark.operators.graph import GraphStore
from consume_kafka_avro_data_spark.sources.avro_codec import (
    from_confluent_avro,
    unframe_confluent,
)
from consume_kafka_avro_data_spark.sources.kafka import FileStreamStandIn
from consume_kafka_avro_data_spark.streaming.ingest import StreamingGraphIngest
from consume_kafka_avro_data_spark.streaming.produce import AvroProducer

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


def _producer(spark, tmp_path):
    sc = parse_config(SPO_DOC).schema_for("spo")
    stand_in = FileStreamStandIn(spark, str(tmp_path / "topic"))
    return (
        AvroProducer(spark, sc, schema_id=2, topic="spo", stand_in=stand_in),
        sc,
        stand_in,
    )


def test_produce_consume_roundtrip_byte_exact(spark, tmp_path):
    """Frames written by the producer decode byte-exactly on the consume
    side: same CP1 header, same schema id, same field values."""
    prod, sc, stand_in = _producer(spark, tmp_path)
    df = spark.createDataFrame(TRIPLES, ["S", "P", "O"])
    n = prod.produce_batch(df)
    assert n == 3
    assert prod.report.delivered == 3 and prod.report.batches == 1

    topic = stand_in.read_batch()
    rows = topic.orderBy("offset").collect()
    assert [r.offset for r in rows] == [0, 1, 2]
    assert {r.partition for r in rows} == {0}
    assert {r.topic for r in rows} == {"spo"}
    for r in rows:  # every frame carries the CP1 header with id 2
        sid, _body = unframe_confluent(bytes(r.value))
        assert sid == 2

    decoded = from_confluent_avro(topic, sc, expected_schema_id=2)
    assert decoded.where(F.col("_error").isNotNull()).count() == 0
    got = {
        (r.subject, r.predicate, r.object)
        for r in decoded.collect()
    }
    assert got == {
        ("Don Vito", "Email", "donvito@example.com"),
        ("Underboss Marco", "Captain", "Capo Salvatore"),
        ("Soldier Nico", "Illegal Arms Deal", "1990"),
    }


def test_produce_offsets_monotonic_across_batches(spark, tmp_path):
    prod, _sc, stand_in = _producer(spark, tmp_path)
    prod.produce_batch(spark.createDataFrame(TRIPLES[:2], ["S", "P", "O"]))
    prod.produce_batch(
        spark.createDataFrame(TRIPLES[2:], ["S", "P", "O"]), batch_id=1
    )
    offsets = sorted(r.offset for r in stand_in.read_batch().collect())
    assert offsets == [0, 1, 2]
    assert prod.report.by_batch == {0: 2, 1: 1}


def test_produce_stream_then_ingest_end_to_end(spark, tmp_path):
    """Full T4→T5 loop: stream rows through the producer into the
    stand-in topic, then run the consumer ingest over it — the graph
    materializes exactly the produced triples."""
    prod, sc, stand_in = _producer(spark, tmp_path)

    src_dir = tmp_path / "rows"
    spark.createDataFrame(TRIPLES, ["S", "P", "O"]).write.parquet(str(src_dir))
    stream = spark.readStream.schema("S string, P string, O string").parquet(
        str(src_dir)
    )
    q = prod.produce_stream(stream, checkpoint_dir=str(tmp_path / "ckpt_p"))
    q.awaitTermination(120)
    assert prod.report.delivered == 3

    store = GraphStore(spark, str(tmp_path / "graph"))
    ing = StreamingGraphIngest(
        spark,
        store,
        sc,
        checkpoint_dir=str(tmp_path / "ckpt_c"),
        expected_schema_id=2,
        created_at="2024-01-01",
    )
    m = ing.run_to_completion(stand_in.read_stream())
    assert m.valid_rows == 3 and m.error_rows == 0
    assert store.objects().count() == 6  # 3 subjects + 3 distinct objects
    assert store.relationships().count() == 3


def test_fresh_producer_resumes_offsets_on_existing_topic(spark, tmp_path):
    """A second producer process appending to a non-empty stand-in
    topic must continue the densely increasing offsets, not restart at
    0 with duplicate (partition, offset) pairs."""
    from consume_kafka_avro_data_spark.config import parse_config
    from consume_kafka_avro_data_spark.sources.kafka import FileStreamStandIn
    from consume_kafka_avro_data_spark.streaming.produce import AvroProducer

    doc = {
        "kafka": {},
        "type_map": {"spo": {"key_column": "subject", "columns": ["S", "P", "O"]}},
        "column_map": {"S": "subject", "P": "predicate", "O": "object"},
    }
    sc = parse_config(doc).schema_for("spo")
    rows = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "c")], ["S", "P", "O"]
    )
    topic_dir = str(tmp_path / "topic")

    p1 = AvroProducer(
        spark, sc, schema_id=2, topic="spo",
        stand_in=FileStreamStandIn(spark, topic_dir),
    )
    p1.produce_batch(rows)
    # a FRESH producer (new process) over the same topic directory
    p2 = AvroProducer(
        spark, sc, schema_id=2, topic="spo",
        stand_in=FileStreamStandIn(spark, topic_dir),
    )
    assert p2._next_offset == 2
    p2.produce_batch(rows.limit(1))
    offs = sorted(
        r.offset
        for r in FileStreamStandIn(spark, topic_dir).read_batch().collect()
    )
    assert offs == [0, 1, 2]  # dense, no duplicates


def test_second_stream_on_same_producer_delivers(spark, tmp_path):
    """The replay guard is scoped PER CHECKPOINT: a second stream
    through the same producer (fresh checkpoint, batch ids restarting
    at 0) must deliver — a producer-wide seen-set would silently skip
    its early batches (at-most-once data loss)."""
    prod, sc, stand_in = _producer(spark, tmp_path)

    def one_stream(rows, name, ckpt):
        src = str(tmp_path / name)
        df = spark.createDataFrame(rows, ["S", "P", "O"])
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = prod.produce_stream(stream, checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination(120)

    one_stream([("a", "p", "b")], "src1", "ck1")
    assert prod.report.delivered == 1
    one_stream([("c", "p", "d"), ("e", "p", "f")], "src2", "ck2")
    assert prod.report.delivered == 3  # second stream actually delivered
    frames = stand_in.read_batch()
    assert frames.count() == 3
    offsets = sorted(r.offset for r in frames.collect())
    assert offsets == [0, 1, 2]  # dense offsets preserved across streams
