"""Time a subset of headline queries with the bench methodology
(warm-up, clearCache+GC between runs, best-of-3, noop sink).

Usage: python scripts/time_queries.py q_a q_b ...   [env: SPARK_GRAFT_SF_DIR]
Prints one JSON line {name: {"min": s, "samples": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consume_kafka_avro_data_spark.registry import all_queries
from consume_kafka_avro_data_spark.session import get_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="cka-spark-time-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from consume_kafka_avro_data_spark.tables import load_table

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    qs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(runs), "samples": runs}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
