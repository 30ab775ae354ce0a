"""Order-independent exact aggregates over 2-dp-valued double columns.

Floating-point SUM is association-sensitive: Spark's partial/final hash
aggregate and DuckDB's vectorized aggregate add in different orders, so a
raw ``SUM(double)`` over 60k rows differs in the low bits — enough to
break an exact value-hash comparison, and enough to matter for
reproducibility at 100 TB where partition counts change between runs.

The testdata money/measure columns (prices, discounts, quantities,
event values) are all exact 2-decimal values, so casting each operand to
``DECIMAL(18,4)`` is lossless; decimal addition is exact and therefore
order-independent; the final cast back to DOUBLE is deterministic.  Both
the Spark side and the DuckDB-oracle side use the identical scheme, which
is why each helper has an ``o_``-prefixed SQL twin.

This is the same trick a production pipeline should use for money columns
at scale: decimal partial aggregates are Tungsten-native (no UDF), add one
widening cast to the scan, and make results independent of the shuffle
layout.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a 2-dp double column → double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def dsum_mul(a: Column | str, b: Column | str) -> Column:
    """Exact sum of products (e.g. price × (1-discount)) → double.

    Both factors are cast to decimal BEFORE multiplying: decimal × decimal
    is exact, so no rounding-tie can diverge between engines.
    """
    return F.sum(_c(a).cast(DEC) * _c(b).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Average = exact decimal sum (as double) / non-null count → double."""
    return F.sum(_c(col).cast(DEC)).cast("double") / F.count(_c(col))


# --- DuckDB-dialect twins (ANSI SQL strings) ---------------------------------


def o_dsum(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE)"


def o_dsum_mul(a: str, b: str) -> str:
    return f"CAST(SUM(CAST({a} AS DECIMAL(18,4)) * CAST({b} AS DECIMAL(18,4))) AS DOUBLE)"


def o_davg(c: str) -> str:
    return f"(CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({c}))"
