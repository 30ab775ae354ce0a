"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end with a ``noop``-format write (full
compute, no driver-side collect) after a session warm-up job, so timings
measure the query, not JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from consume_kafka_avro_data_spark.registry import all_queries
from consume_kafka_avro_data_spark.session import get_session

HEADLINE = [
    "q_groupby_agg",
    "q_edge_join",
    "q_fk_lookup_join",
    "q_window_rank",
    "q_window_running",
    "q_topk_global",
    "q_count_distinct",
    "q_rollup",
    "q_tumbling_window",
    "q_session_like",
    "q_dedup_exact",
    "q_doc_fingerprint",
    "q_text_tokens",
    "q_filter_predicates",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(app_name="cka-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up: JVM, codegen, parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
