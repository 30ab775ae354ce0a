"""Physical-plan inspection utilities (see inspect.py)."""

from consume_kafka_avro_data_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)
