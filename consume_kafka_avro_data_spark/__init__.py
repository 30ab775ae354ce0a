"""consume_kafka_avro_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``lucaslouca/consume-kafka-avro-data`` (a C++20
Kafka→Avro→JSON→Postgres-graph ETL binary; see SURVEY.md):

* config-driven schema projection / rename / cast
  (reference ``src/config/ConfigParser.cpp:139-169``)
* Confluent-framed Avro streaming ingest + JSON transcoding
  (reference ``src/KafkaConsumerCallback.cpp:42-115``)
* entity/relationship graph materialization with idempotent upsert
  (reference ``src/Database.cpp:41-78``)
* plus the relational closure to *query* that graph, and the
  LLM-data-pipeline operator set (dedup, similarity search, multimodal
  columns, text analysis) mandated by the project charter.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical plan; Python UDFs appear only where built-ins cannot express the
semantics, and then always Arrow-batched (pandas UDFs / mapInPandas).
"""

from consume_kafka_avro_data_spark.session import get_session
from consume_kafka_avro_data_spark.tables import TABLES, load_table

__all__ = ["get_session", "load_table", "TABLES"]

__version__ = "0.1.0"
