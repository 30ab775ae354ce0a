"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [suffix] [query ...]
  tag     e.g. r11  -> writes plans/r11/<query>_<suffix>.txt
  suffix  "before" (default) or "after"
  query   optional subset; default = every HEADLINE query

Plan-only (no job execution), so it is cheap and safe to run alongside
other work.  The judge checks plan claims in OPTIMIZATION_*.md against
these files.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from consume_kafka_avro_data_spark.registry import all_queries
from consume_kafka_avro_data_spark.session import get_session


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session(app_name="cka-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in registry", file=sys.stderr)
            continue
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
