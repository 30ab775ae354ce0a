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

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

log = logging.getLogger(__name__)

_ORACLE_CACHE: dict[str, str | None] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    #: SQL string, None (rows-only), or a zero-arg factory returning
    #: either — factories defer data-dependent oracle construction (e.g.
    #: q_similarity_ivf's centroid literals) to VERIFICATION time, so the
    #: scale-factor env var is read when the oracle is used, not when the
    #: query module is imported, and module import performs no file I/O.
    oracle: str | None | Callable[[], str | None]
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""

    def oracle_text(self) -> str | None:
        """Resolve the oracle (invoking + caching a factory if needed).
        A factory degrading to None is logged — silent degradation would
        drop oracle coverage without notice."""
        if not callable(self.oracle):
            return self.oracle
        if self.name not in _ORACLE_CACHE:
            text = self.oracle()
            if text is None:
                log.warning(
                    "query %s: oracle factory returned None — rows-only check",
                    self.name,
                )
            _ORACLE_CACHE[self.name] = text
        return _ORACLE_CACHE[self.name]


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None | Callable[[], str | None] = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` → rows-only check;
    a callable defers oracle construction to verification time."""

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
