"""BroadcastBloom — a bloom filter built FROM a DataFrame column and
probed as a pure JVM expression, for semi-join prefilters whose build
side is bounded but whose probe side is the 100 TB corpus.

Why not ``df.stat.bloomFilter``: it returns a driver-side object whose
``mightContain`` only works on the driver — using it in a plan would
need a Python UDF per row.  Why not a broadcast hash join: it works
(``q_decontaminate`` uses one), but the broadcast relation carries the
full build-side VALUES (~50+ bytes per string gram); the bloom carries
~2 bytes per item (16 bits) — 25-50× less executor memory — and the
candidates that survive the probe are few enough that the exact
verification join afterwards is data-sized-small.  The standard
two-phase shape: bloom prefilter (no false negatives, bounded false
positives) → exact join on the survivors → EXACT final result, so the
operator stays oracle-checkable.

Determinism / correctness mechanics:

* Bit positions use Kirsch-Mitzenmacher double hashing: TWO seeded
  ``xxhash64`` evaluations (Spark's OWN hash on both the build and
  probe side, so the two can never disagree) derive all k probe
  positions as ``(h1 + j·h2) mod m`` — string hashing dominates probe
  cost, so k probes at 2-hash price halves the per-row work vs k
  independent hashes (measured: the 4-hash form made the sf0.1 bloom
  query slower than the exact join it accelerates).  ``h2`` is mapped
  into [1, m-1] so the stride is never 0.
* The build is one distributed pass over the build side: explode the k
  positions, DISTINCT (bounded by m), collect.  Driver state is the
  m-bit array only.
* The probe compiles to ``element_at(<array<long> literal>, word) >>
  bit & 1`` conjunctions — whole-stage-codegen'd, no shuffle, no join,
  no Python.  All modular arithmetic is pre-reduced (operands stay
  ≤ k·m) so ANSI overflow checking never fires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16 bits/item at k=4 probes → FP rate ≈ (1 - e^(-4/16))^4 ≈ 0.24% —
# prefilter quality, not correctness (the exact verify join removes FPs)
BITS_PER_ITEM = 16
DEFAULT_K = 4

# LITERAL-SIZE BOUND: the bit array ships as an array<long> literal
# inside the plan (not a broadcast variable), serialized into every
# task binary of the probe stage.  2^27 bits = 16 MB of longs — about
# the autoBroadcastJoinThreshold's order of magnitude and ~8M items at
# 16 bits/item; beyond that the plan-literal transport is the wrong
# tool (a broadcast hash join ships the same data with bookkeeping the
# executor can spill) and build() refuses rather than degrade silently.
MAX_BITS = 1 << 27


def _probe_positions(c: Column, m: int, k: int) -> list[Column]:
    """The k Kirsch-Mitzenmacher positions ``(h1 + j·h2) mod m`` —
    ONE implementation shared by build and probe, because any drift
    between the two silently produces false negatives."""
    h1 = F.pmod(F.xxhash64(c, F.lit(0)), F.lit(m))
    # stride in [1, m-1]: h2 = 0 would collapse all k probes onto h1
    h2 = F.pmod(F.xxhash64(c, F.lit(1)), F.lit(m - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(m)) for j in range(k)]


class BroadcastBloom:
    """m-bit bloom filter over a string/long column's distinct values."""

    def __init__(self, bits: list[int], m: int, k: int):
        # k <= 0 would make might_contain's probe-conjunction loop run
        # zero times and return None, which DataFrame.where rejects with
        # an error far from the misuse; m < 64 can't hold one long word
        if k < 1:
            raise ValueError(f"bloom k must be >= 1, got {k}")
        if m < 64:
            raise ValueError(f"bloom m must be >= 64 bits, got {m}")
        if m > MAX_BITS:
            raise ValueError(
                f"bloom m={m} bits exceeds the plan-literal bound "
                f"MAX_BITS={MAX_BITS} (16 MB of long words shipped in "
                "every task binary); use a broadcast hash join for "
                "build sides this large"
            )
        self.bits = bits  # m/64 signed int64 words (Spark long literals)
        self.m = m
        self.k = k
        self._bits_col: Column | None = None  # lazy literal cache

    @classmethod
    def build(
        cls,
        df: DataFrame,
        col: str,
        n_bits: int | None = None,
        k: int = DEFAULT_K,
    ) -> "BroadcastBloom":
        """One distributed pass: k double-hash positions per row,
        exploded and DISTINCT'd (the collect is bounded by m bits /
        min(k·n, m) rows regardless of build-side row count), set into
        an m-bit driver array.  ``n_bits`` defaults to 16·count rounded
        up to a word — callers with a known distinct count can pass a
        tighter m (and skip the count job)."""
        if k < 1:  # fail before the distributed pass, not after it
            raise ValueError(f"bloom k must be >= 1, got {k}")
        if n_bits is None:
            n = df.count()
            n_bits = max(128, BITS_PER_ITEM * n)
        m = ((n_bits + 63) // 64) * 64
        if m > MAX_BITS:
            raise ValueError(
                f"bloom sized to m={m} bits (> MAX_BITS={MAX_BITS}): "
                "the build side is too large for plan-literal "
                "transport; use a broadcast hash join instead"
            )
        pos = (
            df.select(
                F.explode(F.array(*_probe_positions(F.col(col), m, k))).alias("p")
            )
            .distinct()  # bounded by m — THIS is what makes collect safe
            .collect()
        )
        words = [0] * (m // 64)
        for r in pos:
            p = r["p"]
            words[p // 64] |= 1 << (p % 64)
        # Spark long literals are SIGNED; fold bit 63 into two's complement
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        return cls(words, m, k)

    def _bits_literal(self) -> Column:
        """The bit array as ONE plan column, built JVM-side.  ``F.lit``
        on a Python list (and, measured, even on a numpy array — the
        classic-mode path converts element-wise) costs ~0.8-3.6 s of
        py4j round-trips for a sf0.1-sized filter; parsing the same
        ``array(..L, ..L)`` text with ``F.expr`` is one string transfer
        (~5 ms, measured 100×+ faster) and the optimizer constant-folds
        the parsed CreateArray into a single array<long> literal before
        execution.  Cached so repeated probes (streaming gate: one per
        micro-batch) pay the parse once per filter."""
        bits_lit = self._bits_col
        if bits_lit is None:
            lmin = -(1 << 63)
            parts = [
                # Long.MIN_VALUE has no direct SQL literal (the lexer
                # sees unary minus + an out-of-range positive literal)
                "(-9223372036854775807L - 1L)" if w == lmin else f"{w}L"
                for w in self.bits
            ]
            bits_lit = F.expr("array(" + ",".join(parts) + ")")
            self._bits_col = bits_lit
        return bits_lit

    def might_contain(self, col: Column | str) -> Column:
        """True for every value that was in the build set (no false
        negatives); true for ~FP% of absent values.  Pure JVM: two
        xxhash64 evaluations, then k bit-tests against the array<long>
        literal.

        The probed value appears 4k times in the returned predicate
        (k positions × word+bit, × the h1/h2 pair) and FilterExec does
        no common-subexpression elimination — probing a column that is
        itself a derived expression (a gram built in the same stage)
        re-evaluates that expression 4k× per row once filter pushdown
        substitutes it into the predicate.  Probe PHYSICAL columns with
        this method; for derived columns use :meth:`prefilter`, which
        fences the projection so the substitution cannot happen
        (measured 4.8 s → 1.3 s on the sf0.1 decontamination stream)."""
        c = F.col(col) if isinstance(col, str) else col
        bits_lit = self._bits_literal()
        cond = None
        for idx in _probe_positions(c, self.m, self.k):
            word = F.element_at(
                bits_lit, (F.shiftright(idx, 6) + 1).cast("int")
            )
            # shiftright with a COLUMN bit count needs the SQL function
            # (the DataFrame helper only takes int literals)
            bit = F.call_function(
                "shiftright", word, idx.bitwiseAND(F.lit(63)).cast("int")
            ).bitwiseAND(F.lit(1))
            t = bit == F.lit(1)
            cond = t if cond is None else (cond & t)
        return cond

    def prefilter(self, df: DataFrame, col: str) -> DataFrame:
        """``df`` minus the rows whose ``col`` is definitely not in the
        build set — :meth:`might_contain` plus the evaluate-once fence.

        ``col`` is re-projected through a value-identical
        nondeterministic ``when`` (``spark_partition_id() >= 0`` is
        always true and both branches are ``col``), which blocks
        PushPredicateThroughNonJoin from substituting the column's
        defining expression into the probe predicate's 4k copies: the
        plan keeps Project(col) → Filter(probe on the materialized
        attribute), so a derived gram is built once per row and the
        4k-reference predicate only re-hashes the short string.  The
        fence changes no value and no row (guide §4.4's optimizer-
        duplication fix, applied to expression inlining)."""
        fenced = F.when(
            F.spark_partition_id() >= F.lit(0), F.col(col)
        ).otherwise(F.col(col))
        out = df.select(
            *[fenced.alias(c) if c == col else F.col(c) for c in df.columns]
        )
        return out.where(self.might_contain(col))
