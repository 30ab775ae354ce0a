"""CLI entry point — the reference binary's UX, Spark-first.

The reference runs as ``ingest -c <config.yaml>`` (arg parsing at
``src/main.cpp:114-140``: ``-c`` is required, the file must exist, bad
usage prints usage and exits non-zero).  Here:

    python -m consume_kafka_avro_data_spark -c configs/live_smoke.yaml
        [--dry-run]        validate config + schema assembly, no cluster
        [--batch DIR]      run the SPO ingest in batch over a parquet
                           stand-in topic directory instead of live Kafka
        [--follow]         consume continuously; the DEFAULT is a
                           bounded replay (availableNow) then exit — the
                           reference's partition-EOF mode (exit_eof)

Config errors raise/exit non-zero where the reference kills itself with
SIGINT (``src/config/ConfigParser.cpp:33,58,133``).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="consume_kafka_avro_data_spark",
        description="Config-driven Kafka->Avro->graph ingest (PySpark)",
    )
    p.add_argument("-c", "--config", required=True, help="YAML job config")
    p.add_argument(
        "--topic",
        help="which type_map topic to run when the config declares "
        "several (default: the first; the others are reported, never "
        "silently dropped)",
    )
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="validate config + schema assembly and exit",
    )
    p.add_argument(
        "--batch",
        metavar="DIR",
        help="read a parquet stand-in topic directory instead of Kafka",
    )
    p.add_argument(
        "--ocf",
        metavar="DIR",
        help="ingest a directory of Avro Object Container Files (.avro "
        "lake files) through the same triples->graph merge instead of "
        "consuming a topic",
    )
    p.add_argument(
        "--follow",
        action="store_true",
        help="consume continuously (micro-batches) instead of the "
        "default bounded replay-to-end-of-topic (the reference's "
        "exit_eof mode)",
    )
    p.add_argument(
        "--sql",
        metavar="QUERY",
        help="after the ingest completes, register the engine-state "
        "views (objects/relationships — the reference's two queryable "
        "tables, src/Database.h:23-31) and run one ad-hoc SQL query; "
        "rows print tab-separated with a header line",
    )
    p.add_argument(
        "--produce-csv",
        metavar="CSVDIR",
        help="PRODUCER mode (the tool the reference's input_type:csv "
        "config implies but its repo never shipped): read CSV per the "
        "config, encode Confluent-framed Avro, deliver to the topic — "
        "live Kafka by default, or the --batch stand-in directory",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not os.path.isfile(args.config):
        print(f"config file not found: {args.config}", file=sys.stderr)
        return 2

    from consume_kafka_avro_data_spark.config import ConfigError, load_config

    try:
        config = load_config(args.config)
        topics = [s.name for s in config.schemas]
        topic = args.topic if args.topic is not None else topics[0]
        if topic not in topics:
            raise ConfigError(
                f"--topic {topic!r} is not in the config's type_map "
                f"{topics}"
            )
        sc = config.schema_for(topic)
        # schema ASSEMBLY is part of what --dry-run validates — an
        # Avro-invalid field name from column_map surfaces here, and
        # must exit 2 with the config-error message like every other
        # config problem, not an uncaught traceback
        avro_json = sc.to_avro_schema_json()
    except ConfigError as e:
        print(f"invalid config: {e}", file=sys.stderr)
        return 2

    if len(topics) > 1:
        # one topic per run (the reference binary's shape); the others
        # must be VISIBLE, not silently dropped
        others = [t for t in topics if t != topic]
        print(
            f"note: config declares {len(topics)} topics; running "
            f"{topic!r} only — rerun with --topic for {others}"
        )
    print(f"topic={topic} key={sc.key_column} fields={sc.columns}")
    print(f"schema={avro_json}")
    if args.dry_run:
        return 0

    import yaml

    with open(args.config) as f:
        # `or {}`: a bare `engine:` placeholder line parses as None
        engine = yaml.safe_load(f).get("engine") or {}
    graph_dir = engine.get("graph_dir", "/tmp/cka_spark/graph")
    ckpt_dir = engine.get("checkpoint_dir", "/tmp/cka_spark/checkpoints")

    from consume_kafka_avro_data_spark.operators.graph import GraphStore
    from consume_kafka_avro_data_spark.session import get_session
    from consume_kafka_avro_data_spark.sources.kafka import (
        FileStreamStandIn,
        kafka_reader,
    )
    from consume_kafka_avro_data_spark.streaming.ingest import StreamingGraphIngest

    if args.ocf and len(sc.columns) != 3:
        # same guard StreamingGraphIngest enforces for the stream path:
        # a 2-column config would TypeError mid-run and a 4-column one
        # would silently drop the fourth field.  Checked BEFORE the
        # session is built — no cluster needed to reject a bad config.
        print(
            "--ocf graph ingest needs exactly 3 configured columns "
            f"(subject, predicate, object); got {sc.columns}",
            file=sys.stderr,
        )
        return 2
    if args.produce_csv and not args.batch and not config.bootstrap_servers:
        # live produce needs a broker, and registering the schema is a
        # MUTATING registry side effect — reject before the session is
        # built and before anything touches the network (pre-session,
        # like the --ocf guard above)
        print(
            "invalid config: kafka.bootstrap.servers is not set; the "
            "live producer cannot be assembled without it",
            file=sys.stderr,
        )
        return 2
    if args.produce_csv and args.sql:
        # producer mode populates a TOPIC, not the graph — there is no
        # engine state to query; silently dropping the flag would read
        # as data loss (the consumer modes honor it)
        print(
            "--sql is not available with --produce-csv (producer mode "
            "writes a topic, not the graph); run it with --batch/--ocf",
            file=sys.stderr,
        )
        return 2

    spark = get_session(app_name=f"cka-spark-{topic}")
    spark.sparkContext.setLogLevel("WARN")
    if args.produce_csv:
        from consume_kafka_avro_data_spark.sources.csv_input import (
            read_csv_input,
        )
        from consume_kafka_avro_data_spark.streaming.produce import (
            AvroProducer,
        )

        rows = read_csv_input(spark, args.produce_csv, config, topic)
        if args.batch:  # stand-in topic directory (brokerless)
            stand_in = FileStreamStandIn(spark, args.batch)
            schema_id = int(engine.get("schema_id", 1))
        else:  # live: register the assembled schema like the reference
            from consume_kafka_avro_data_spark.sources.schema_registry import (
                SchemaRegistryClient,
            )

            registry = SchemaRegistryClient(url=config.schema_registry_url)
            schema_id = registry.register_value_schema(
                topic, sc.to_avro_schema_json()
            )
            stand_in = None
        # bootstrap servers already validated pre-session (above), so
        # the constructor's own ConfigError cannot fire here
        producer = AvroProducer(
            spark,
            sc,
            schema_id=schema_id,
            topic=topic,
            bootstrap_servers=config.bootstrap_servers,
            stand_in=stand_in,
        )
        n = producer.produce_batch(rows)
        r = producer.report
        print(
            f"produced={n} delivered={r.delivered} batches={r.batches} "
            f"schema_id={schema_id}"
        )
        spark.stop()
        return 0
    if args.ocf:
        # at-rest ingest: already-decoded lake rows skip the wire codec
        # and run straight through the same idempotent triples merge the
        # stream path lands in (replays are safe by construction)
        from consume_kafka_avro_data_spark.operators.graph import triples_from
        from consume_kafka_avro_data_spark.sources.ocf import read_ocf

        rows = read_ocf(spark, args.ocf, sc)
        names = [sc.field_name(c) for c in sc.columns]
        store = GraphStore(spark, graph_dir)
        nv, ne = store.ingest_triples(triples_from(rows, *names))
        print(f"ocf_ingest new_vertices={nv} new_edges={ne}")
        if args.sql:
            _run_sql(spark, store, args.sql)
        spark.stop()
        return 0
    if args.batch:
        stream = FileStreamStandIn(spark, args.batch).read_stream(
            max_files_per_trigger=64
        )
        expected_id = None
    else:
        from consume_kafka_avro_data_spark.sources.schema_registry import (
            SchemaRegistryClient,
        )

        registry = SchemaRegistryClient(url=config.schema_registry_url)
        expected_id, _ = registry.fetch_value_schema(topic)
        try:
            stream = kafka_reader(
                spark,
                config,
                topic,
                max_offsets_per_trigger=engine.get("max_offsets_per_trigger"),
            )
        except ConfigError as e:
            # e.g. missing kafka.bootstrap.servers — only the live
            # reader needs it, so load_config cannot catch it earlier;
            # still the config-error contract: message + exit 2
            print(f"invalid config: {e}", file=sys.stderr)
            spark.stop()
            return 2

    store = GraphStore(spark, graph_dir)
    ingest = StreamingGraphIngest(
        spark,
        store,
        sc,
        checkpoint_dir=ckpt_dir,
        dlq_dir=engine.get("dlq_dir"),
        expected_schema_id=expected_id,
    )
    if args.follow:
        q = ingest.start(stream, available_now=False)
        try:
            q.awaitTermination()
        except KeyboardInterrupt:  # the reference's SIGINT drain (T3)
            StreamingGraphIngest.stop_and_drain(q)
        m = ingest.metrics
    else:
        m = ingest.run_to_completion(stream, timeout=600.0)
    print(
        f"batches={m.batches} valid={m.valid_rows} errors={m.error_rows} "
        f"new_vertices={m.new_vertices} new_edges={m.new_edges}"
    )
    if args.sql:
        _run_sql(spark, store, args.sql)
    spark.stop()
    return 0


def _run_sql(spark, store, query: str) -> None:
    """The reference's 'graph exists to be queried' loop from the
    binary UX: register the just-populated engine-state views and run
    one ad-hoc query over them."""
    from consume_kafka_avro_data_spark.tables import register_engine_views

    register_engine_views(spark, graph=store)
    out = spark.sql(query)
    print("\t".join(out.columns))
    for r in out.collect():  # ad-hoc CLI result: user-bounded by LIMIT
        print("\t".join("" if v is None else str(v) for v in r))


if __name__ == "__main__":
    raise SystemExit(main())
