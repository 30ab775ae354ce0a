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


# Final form: the exact decimal sum re-scaled to 2 dp before the double
# cast.  Why: a high-scale decimal (sum of 4dp×4dp products has scale 8)
# whose unscaled integer exceeds 2^53 hits TWO-STEP rounding in engines
# that convert int128→double then divide by 10^scale (DuckDB), which can
# land 1 ulp away from a correctly-rounded decimal→double (Spark's
# BigDecimal).  Rounding the exact sum to scale 2 first (both engines
# round positive halves identically) keeps the unscaled value < 2^53 up
# to ~10^13, so the int→double conversion is exact and the single
# remaining rounding is identical everywhere.  Observed for real at
# sf0.1: sum_disc_price ≈ 4.9e9 with scale 8 diverged in the last bit.
FINAL = "decimal(38,2)"


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a 2-dp double column → double."""
    return F.sum(_c(col).cast(DEC)).cast(FINAL).cast("double")


def dsum_mul(a: Column | str, b: Column | str) -> Column:
    """Exact sum of products (e.g. price × (1-discount)) → double.

    Both factors are cast to decimal BEFORE multiplying: decimal × decimal
    is exact, so no rounding-tie can diverge between engines.
    """
    return F.sum(_c(a).cast(DEC) * _c(b).cast(DEC)).cast(FINAL).cast("double")


def davg(col: Column | str) -> Column:
    """Average = exact decimal sum (as double) / non-null count → double."""
    return F.sum(_c(col).cast(DEC)).cast(FINAL).cast("double") / F.count(_c(col))


# --- DuckDB-dialect twins (ANSI SQL strings) ---------------------------------


def o_dsum(c: str) -> str:
    # ROUND, not a scale-2 cast: DuckDB's decimal downcast TRUNCATES while
    # Spark's rounds half-up; ROUND rounds half-away in DuckDB, which matches
    # Spark's HALF_UP for all real (non-negative money) inputs
    return f"CAST(ROUND(SUM(CAST({c} AS DECIMAL(18,4))), 2) AS DOUBLE)"


def o_dsum_mul(a: str, b: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({a} AS DECIMAL(18,4)) * CAST({b} AS DECIMAL(18,4))),"
        f" 2) AS DOUBLE)"
    )


def o_davg(c: str) -> str:
    return (
        f"(CAST(ROUND(SUM(CAST({c} AS DECIMAL(18,4))), 2) AS DOUBLE)"
        f" / COUNT({c}))"
    )
