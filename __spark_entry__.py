"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-style pricing summary) at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the declared-query catalog
from SURVEY.md §2.8, implemented in
``consume_kafka_avro_data_spark/queries/`` and registered via
``consume_kafka_avro_data_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from consume_kafka_avro_data_spark.registry import all_queries  # noqa: E402

# Driver-exposure ordering: FRESHNESS rotation, computed from the
# committed CORRECTNESS_r*.json artifacts (rounds 1-4 maintained a
# hand-derived list here; round 5 automated it so the rotation is
# routine).  Policy, encoded in consume_kafka_avro_data_spark/rotation:
# never-certified queries first, then stalest green evidence first,
# name tie-break; rows-only-by-design queries (oracle=None) pinned
# after every provable query so the weaker check never displaces a
# provable one from the driver's ~50-query checked prefix.  Each
# round's new artifact automatically shifts the next round's order.
from consume_kafka_avro_data_spark.rotation import (  # noqa: E402
    exposure_order,
    freshest_evidence,
)

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _ordered_queries():
    qs = all_queries()
    # provability from the registered oracle WITHOUT invoking factories
    # (factories may read data files; import must stay side-effect free)
    provable = {n: q.oracle is not None for n, q in qs.items()}
    green, rows_only = freshest_evidence(_REPO_DIR)  # one artifact scan
    ordered = exposure_order(list(qs), provable, green, rows_only)
    return {n: qs[n] for n in ordered}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q_groupby_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query.

    Queries registered with ``oracle=None`` (approx sketches, tie-prone
    top-k, codec roundtrips) are intentionally omitted → rows-only check.
    """
    out = {}
    for name, q in _ordered_queries().items():
        text = q.oracle_text()
        if text is not None:
            out[name] = text
    return out
