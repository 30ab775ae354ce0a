"""Sources & wire formats: parquet testdata (tables.py), Confluent-framed
Avro codec, schema-registry client, Kafka reader configuration."""
