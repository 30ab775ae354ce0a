"""Kafka source configuration (S1) with a file-backed stand-in for tests.

The reference consumes one topic/partition from ``OFFSET_BEGINNING`` with
a 1 s poll timeout and partition-EOF detection (``src/main.cpp:221-256``,
``src/KafkaConsumerCallback.cpp:13-38``).  The Spark equivalents:

* replay-from-earliest  → ``startingOffsets=earliest``
* poll loop             → micro-batch trigger (``processingTime``)
* partition-EOF / bounded replay → ``trigger(availableNow=True)``
* backpressure (the reference has none — its SafeQueue grows without
  bound, src/SafeQueue.h:55) → ``maxOffsetsPerTrigger``

The ``spark-sql-kafka`` connector jar is not bundled in this
environment and no broker exists, so ``kafka_reader`` raises a clear
error when the datasource is missing, and ``FileStreamStandIn`` provides
the same (key, value, topic, partition, offset) shape from a directory
of parquet files — the streaming tests run the full decode/ingest
pipeline through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from consume_kafka_avro_data_spark.config import ConfigError, JobConfig

# the kafka datasource's fixed output schema (subset we model)
KAFKA_SHAPE = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        # the spark-sql-kafka connector emits partition as INT32 —
        # declaring long here would make stand-in parquet unreadable
        # against real-source frames
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
    ]
)


def jvm_class_available(spark: SparkSession, class_name: str) -> bool:
    """True if ``class_name`` resolves on SPARK'S classloader.

    Must go through ``Utils.classForName`` (context-or-Spark loader):
    a plain py4j ``java.lang.Class.forName`` uses the system loader and
    CANNOT see jars pulled in via ``--packages``/``spark.jars.packages``
    (they live in Spark's MutableURLClassLoader), so it reports the
    Kafka/Avro connectors missing in exactly the documented live-submit
    configuration."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.org.apache.spark.util.Utils.classForName(class_name, True, False)
        return True
    except Exception:
        return False


def kafka_source_available(spark: SparkSession) -> bool:
    return jvm_class_available(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )


# spark-sql-kafka artifact matching the bundled PySpark build — the
# ``--packages`` coordinate documented in configs/live_smoke.yaml and
# README; pinned here so config, docs, and tests share ONE constant.
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"


def kafka_reader_options(
    config: JobConfig,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool | None = None,
) -> dict[str, str]:
    """The kafka datasource option map, as a pure function so tests can
    pin the assembly against configs/live_smoke.yaml with no broker.

    ``startingOffsets=earliest`` is the reference's OFFSET_BEGINNING
    (src/main.cpp:229-230); ``maxOffsetsPerTrigger`` adds the
    backpressure bound the reference lacks (its SafeQueue grows without
    bound, src/SafeQueue.h:55); ``failOnDataLoss=false`` is the live
    choice for retention-expired replays (the reference logs and keeps
    consuming; a fail-fast deployment passes True)."""
    if not config.bootstrap_servers:
        # fail HERE with the config-layer error, not at stream start
        # with the Kafka client's cryptic 'no resolvable bootstrap
        # urls' — the same eager-validation policy config.py applies
        raise ConfigError(
            "kafka.bootstrap.servers is not set in the job config; "
            "the Kafka reader cannot be assembled without it"
        )
    opts = {
        "kafka.bootstrap.servers": config.bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    return opts


def kafka_reader(
    spark: SparkSession,
    config: JobConfig,
    topic: str,
    streaming: bool = True,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool | None = None,
):
    """Configured Kafka reader (stream or batch replay) — option
    assembly in :func:`kafka_reader_options` (unit-tested brokerless)."""
    if not kafka_source_available(spark):
        raise RuntimeError(
            "spark-sql-kafka datasource not on the classpath; add the "
            f"{KAFKA_PACKAGE} package, or use "
            "FileStreamStandIn for offline runs"
        )
    reader = spark.readStream if streaming else spark.read
    reader = reader.format("kafka").options(
        **kafka_reader_options(
            config,
            topic,
            starting_offsets,
            max_offsets_per_trigger,
            fail_on_data_loss,
        )
    )
    return reader.load()


class FileStreamStandIn:
    """Directory-of-parquet stand-in exposing the Kafka shape.

    Writers append parquet files of (key, value, topic, partition,
    offset); readers get either a batch DataFrame or a file stream with
    the same schema, so the whole decode→ingest pipeline is exercised
    without a broker (SURVEY §5: "a file-based source stands in for the
    topic").
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def write_batch(self, df: DataFrame) -> None:
        # cast to the declared shape: a writer whose partition/offset
        # were inferred (e.g. from Python ints → long) would otherwise
        # write parquet files the fixed-schema readers can't open
        from pyspark.sql import functions as F

        df.select(
            *[F.col(f.name).cast(f.dataType) for f in KAFKA_SHAPE.fields]
        ).write.mode("append").parquet(self.path)

    def read_batch(self) -> DataFrame:
        return self.spark.read.schema(KAFKA_SHAPE).parquet(self.path)

    def read_stream(self, max_files_per_trigger: int = 1) -> DataFrame:
        return (
            self.spark.readStream.schema(KAFKA_SHAPE)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(self.path)
        )
