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


# r11 (guide §2.3 "narrower types"): the aggregates below accumulate
# LONG integer hundredths instead of DECIMAL(18,4).  Why: the
# double→decimal cast goes through BigDecimal.valueOf → Double.toString
# per row, and decimal hash-aggregation is several× a long sum —
# measured on the sf0.1 Q1 shape, 1.9 s → 0.5 s with BIT-IDENTICAL
# output.  Value argument, piece by piece:
#
# * rint(x·100) recovers the EXACT integer hundredths of any 2-dp
#   value stored as its nearest double (the representation error is
#   ~1e-13 ≪ 0.5, so nearest-integer is exact; ties cannot occur);
#   this replaces the shortest-string BigDecimal conversion with one
#   fused multiply + hardware round.
# * Long addition is exact and order-independent — the same
#   reproducibility property the decimal form bought.
# * The final (sum ≤ 2^53) → double cast is exact and the single /100.0
#   IEEE division is correctly rounded — the same one-rounding argument
#   as the scale-2 FINAL rescale above, with the same ~10^13 domain.
# * Domain honesty at 100 TB: a per-group sum overflows int64 beyond
#   ~9.2e16 dollar-hundredths-sums (dsum) / ~9.2e14 for the scale-4
#   product sums (dsum_mul) — both ABOVE the ~10^13 bound where the
#   decimal form's int→double conversion already stopped being
#   correctly rounded, so the exact domain is not narrowed; past it,
#   ANSI mode fails the long sum loudly where decimal drifted quietly.
# * The DuckDB twins (o_*) are unchanged — parity is pinned by the
#   oracle hash checks, re-verified bit-for-bit on every green query.


def _hundredths(col: Column | str) -> Column:
    """Exact integer hundredths of a 2-dp-valued double column."""
    return F.rint(_c(col) * F.lit(100.0)).cast("long")


def _half_up_4_to_2(s4: Column) -> Column:
    """Scale-4 long → scale-2 long, HALF_UP (away from zero), in pure
    integer arithmetic (``div``, not ``/`` — float division would
    un-exact the >2^53 range the long path exists to keep exact)."""
    pos = F.call_function("div", s4 + F.lit(50), F.lit(100))
    neg = -F.call_function("div", -s4 + F.lit(50), F.lit(100))
    return F.when(s4 >= 0, pos).otherwise(neg)


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a 2-dp double column → double."""
    return F.sum(_hundredths(col)).cast("double") / F.lit(100.0)


def dsum_mul(a: Column | str, b: Column | str) -> Column:
    """Exact sum of products (e.g. price × (1-discount)) → double.

    Both factors become exact integer hundredths BEFORE multiplying, so
    each product is the exact scale-4 integer and the sum is exact; the
    scale-4 → scale-2 HALF_UP matches the decimal form's FINAL rescale
    (and DuckDB's ROUND(, 2)) bit-for-bit."""
    s4 = F.sum(_hundredths(a) * _hundredths(b))
    return _half_up_4_to_2(s4).cast("double") / F.lit(100.0)


def davg(col: Column | str) -> Column:
    """Average = exact sum (as double) / non-null count → double."""
    return dsum(col) / F.count(_c(col))


def dsum_mul_partial(a: Column | str, b: Column | str) -> Column:
    """Scale-4 exact long partial sum of 2-dp products — the pre-push
    half of :func:`dsum_mul` for aggregate-below-join rewrites
    (q_edge_join, q_returned_items): partial-sum per join key below the
    join, re-sum the partials above it, finalize ONCE with
    :func:`dsum_mul_final`.  Long partials re-sum exactly, so the split
    is value-identical to one flat dsum_mul."""
    return F.sum(_hundredths(a) * _hundredths(b))


def dsum_mul_final(partial: Column | str) -> Column:
    """Finalize re-summed :func:`dsum_mul_partial` values → double,
    with the same scale-4 → scale-2 HALF_UP as dsum_mul."""
    return _half_up_4_to_2(F.sum(_c(partial))).cast("double") / F.lit(100.0)


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
