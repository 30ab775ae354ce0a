"""CSV job input — the PRODUCER side's source per the reference config.

The reference job file declares ``input_type: csv`` with a
``csv_options.escape_hack`` flag (``configs/SPO_2_kafka.yaml:5-7``) and
its ConfigParser carries both through — but the repo contains no CSV
reader (the file-to-topic producer lived outside it; the binary only
consumes).  This module closes that config-surface gap so a job file a
reference user already has drives the WHOLE loop here: CSV files →
config projection/rename/cast → Confluent-framed Avro → topic (via
``streaming.produce.AvroProducer``) → the consumer path.

Semantics:

* ``spark.read.csv`` with header=true — the config's ``columns`` name
  CSV HEADER columns (the reference maps header names to Avro fields,
  ``configs/SPO_2_kafka.yaml:19-29``), validated eagerly with a clear
  error naming what's missing.
* ``escape_hack: true`` maps to backslash-escape handling
  (``escape='\\'``): the reference never shipped its implementation,
  so the flag is honored as the common mangled-CSV remedy its name
  implies — backslash-escaped quotes inside quoted fields.  Default
  (absent/false) is RFC-4180 doubled-quote escaping (``escape='"'``),
  Spark's standard.
* All columns are read as STRING and cast per
  ``column_type_transforms`` by ``SchemaConfig.apply`` — the same
  all-strings-unless-configured rule the reference's schema assembly
  uses (``src/config/ConfigParser.cpp:149-164``).  No schema
  inference: inference samples the data and can flip types between
  runs; the config IS the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.config import JobConfig, SchemaConfig


def read_csv_input(
    spark: SparkSession,
    path: str,
    config: JobConfig,
    topic: str,
) -> DataFrame:
    """Read a CSV file/directory per the job config: header validated
    against the topic's configured ``columns`` (clear error naming
    what's missing) and projected to exactly those columns, still under
    their INPUT names and as strings.  Rename + cast (P2/P3) happen
    once inside ``to_confluent_avro``/``SchemaConfig.apply`` at encode
    time — the same place the reference maps CSV header names to Avro
    fields (``configs/SPO_2_kafka.yaml:26-29``) — so the returned frame
    feeds the producer path directly."""
    from consume_kafka_avro_data_spark.config import ConfigError

    if config.input_type != "csv":
        raise ConfigError(
            f"job declares input_type={config.input_type!r}, not csv"
        )
    sc: SchemaConfig = config.schema_for(topic)
    escape_hack = config.csv_options.get("escape_hack", "").lower() in (
        "true",
        "1",
        "yes",
    )
    raw = (
        spark.read.option("header", "true")
        .option("escape", "\\" if escape_hack else '"')
        # the config is the schema: every column arrives as string and
        # column_type_transforms decides casts — never inference
        .option("inferSchema", "false")
        .csv(path)
    )
    missing = [c for c in sc.columns if c not in raw.columns]
    if missing:
        raise ConfigError(
            f"CSV header {raw.columns} is missing configured columns "
            f"{missing} for topic {topic!r}"
        )
    # backtick-quote the projection: a CSV header containing a dot
    # ('user.id') passes the membership check above, but an unquoted
    # select would parse the dot as struct navigation and fail
    # resolution (embedded backticks escape by doubling, per Spark)
    return raw.select(
        *[F.col("`" + c.replace("`", "``") + "`") for c in sc.columns]
    )
