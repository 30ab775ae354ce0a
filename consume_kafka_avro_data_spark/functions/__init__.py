"""Reusable column-expression helpers (all JVM-side built-ins)."""

from consume_kafka_avro_data_spark.functions.parity import (
    davg,
    dsum,
    dsum_mul,
    o_davg,
    o_dsum,
    o_dsum_mul,
)

__all__ = ["dsum", "dsum_mul", "davg", "o_dsum", "o_dsum_mul", "o_davg"]
