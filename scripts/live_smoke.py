#!/usr/bin/env python
"""Live-cluster smoke run: the engine against a REAL Kafka broker +
Confluent Schema Registry — no file stand-ins, no offline registry cache.

    spark-submit \
      --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
      scripts/live_smoke.py configs/live_smoke.yaml [--dry-run]

Exercises the exact path the reference binary runs (src/main.cpp:143-256):
load config → fetch the topic's writer schema from the registry
(subject "<topic>-value" latest, SchemaRegistry.cpp:84-104) → consume
from earliest (OFFSET_BEGINNING, src/main.cpp:229-230) as a bounded
availableNow replay → Confluent-Avro decode with DLQ routing → idempotent
graph merge — then prints the ingest counters (the reference's `errors`
counter, src/main.cpp:243-251, plus row/write accounting).

``--dry-run`` stops after config validation + plan construction (no
broker/registry connection attempted) — the offline CI check for this
file; the sandbox has neither service, so the live path is documented
and dry-run-validated here and integration-tested against stand-ins in
tests/test_streaming.py and tests/test_produce.py.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from consume_kafka_avro_data_spark.config import load_config  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dry_run = "--dry-run" in sys.argv
    cfg_path = args[0] if args else os.path.join(REPO, "configs", "live_smoke.yaml")

    config = load_config(cfg_path)
    topic = config.schemas[0].name
    sc = config.schema_for(topic)
    print(f"config ok: topic={topic} key={sc.key_column} fields={sc.columns}")
    print(f"  bootstrap={config.bootstrap_servers}")
    print(f"  registry={config.schema_registry_url}")
    print(f"  local avro schema: {sc.to_avro_schema_json()}")

    import yaml

    from consume_kafka_avro_data_spark.sources.kafka import (
        KAFKA_PACKAGE,
        kafka_reader_options,
    )

    with open(cfg_path) as f:
        engine = yaml.safe_load(f).get("engine", {})

    pkg = engine.get("kafka_package", KAFKA_PACKAGE)
    if pkg != KAFKA_PACKAGE:
        print(
            f"warning: config pins {pkg}, engine expects {KAFKA_PACKAGE}",
            file=sys.stderr,
        )
    opts = kafka_reader_options(
        config,
        topic,
        starting_offsets="earliest",
        max_offsets_per_trigger=engine.get("max_offsets_per_trigger"),
        fail_on_data_loss=engine.get("fail_on_data_loss"),
    )
    print(f"  --packages {pkg}")
    print(f"  kafka options: {opts}")

    if dry_run:
        print("dry-run: config + schema assembly + reader options validated")
        return 0

    from pyspark.sql import SparkSession

    from consume_kafka_avro_data_spark.operators.graph import GraphStore
    from consume_kafka_avro_data_spark.sources.kafka import kafka_reader
    from consume_kafka_avro_data_spark.sources.schema_registry import (
        SchemaRegistryClient,
    )
    from consume_kafka_avro_data_spark.streaming.ingest import StreamingGraphIngest

    spark = SparkSession.builder.appName("spark-graft-live-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # the reference fetches the writer schema id before consuming
    # (src/config/ConfigParser.cpp:212-214); we do the same and pin
    # decode to that id
    registry = SchemaRegistryClient(url=config.schema_registry_url)
    schema_id, schema_json = registry.fetch_value_schema(topic)
    print(f"registry schema id={schema_id}: {schema_json[:120]}")

    stream = kafka_reader(
        spark,
        config,
        topic,
        streaming=True,
        starting_offsets="earliest",
        max_offsets_per_trigger=engine.get("max_offsets_per_trigger"),
        fail_on_data_loss=engine.get("fail_on_data_loss"),
    )
    store = GraphStore(spark, engine["graph_dir"])
    ingest = StreamingGraphIngest(
        spark,
        store,
        sc,
        checkpoint_dir=engine["checkpoint_dir"],
        dlq_dir=engine.get("dlq_dir"),
        expected_schema_id=schema_id,
    )
    metrics = ingest.run_to_completion(stream, timeout=600.0)
    print(
        f"done: batches={metrics.batches} valid={metrics.valid_rows} "
        f"errors={metrics.error_rows} new_vertices={metrics.new_vertices} "
        f"new_edges={metrics.new_edges}"
    )
    print(f"errors_by_reason={metrics.errors_by_reason}")
    print(f"objects={store.objects().count()} relationships={store.relationships().count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
