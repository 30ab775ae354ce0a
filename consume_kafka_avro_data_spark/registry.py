"""Query registry — the declared-query catalog (SURVEY.md §2.8).

Every implemented operator is exposed as a named query:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
* ``oracle`` — an equivalent ANSI-SQL string DuckDB runs on the same
  parquet tables (views pre-registered by the verify driver), or ``None``
  for genuinely non-SQL-expressible ops (approx sketches, tie-prone
  top-k, custom codecs) which get a weaker rows-only check.

Column names are aliased identically on both sides: the driver sorts
columns by name before value-hashing, so a name mismatch fails even when
values agree.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import for side-effect: populates REGISTRY
    import consume_kafka_avro_data_spark.queries  # noqa: F401

    return dict(REGISTRY)
