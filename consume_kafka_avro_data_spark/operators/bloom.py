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

* Bit positions come from ``pmod(xxhash64(col, j), m)`` for k seeds j —
  Spark's OWN hash on both the build and probe side, so the two can
  never disagree (no Python reimplementation of xxhash64 to drift).
* The build is one distributed pass over the build side: explode the k
  positions, DISTINCT (bounded by m), collect.  Driver state is the
  m-bit array only.
* The probe compiles to ``element_at(<array<long> literal>, word) >>
  bit & 1`` conjunctions — whole-stage-codegen'd, no shuffle, no join,
  no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 16 bits/item at k=4 probes → FP rate ≈ (1 - e^(-4/16))^4 ≈ 0.24% —
# prefilter quality, not correctness (the exact verify join removes FPs)
BITS_PER_ITEM = 16
DEFAULT_K = 4


class BroadcastBloom:
    """m-bit bloom filter over a string/long column's distinct values."""

    def __init__(self, bits: list[int], m: int, k: int):
        self.bits = bits  # m/64 signed int64 words (Spark long literals)
        self.m = m
        self.k = k

    @classmethod
    def build(
        cls,
        df: DataFrame,
        col: str,
        n_bits: int | None = None,
        k: int = DEFAULT_K,
    ) -> "BroadcastBloom":
        """One distributed pass: k seeded-hash positions per row,
        exploded and DISTINCT'd (the collect is bounded by m bits /
        min(k·n, m) rows regardless of build-side row count), set into
        an m-bit driver array.  ``n_bits`` defaults to 16·count rounded
        up to a word — callers with a known distinct count can pass a
        tighter m."""
        if n_bits is None:
            n = df.count()
            n_bits = max(64, BITS_PER_ITEM * n)
        m = ((n_bits + 63) // 64) * 64
        c = F.col(col)
        pos = (
            df.select(
                F.explode(
                    F.array(
                        *[F.pmod(F.xxhash64(c, F.lit(j)), F.lit(m)) for j in range(k)]
                    )
                ).alias("p")
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

    def might_contain(self, col: Column | str) -> Column:
        """True for every value that was in the build set (no false
        negatives); true for ~FP% of absent values.  Pure JVM: k
        bit-tests against the array<long> literal."""
        c = F.col(col) if isinstance(col, str) else col
        bits_lit = F.lit(self.bits)
        cond = None
        for j in range(self.k):
            idx = F.pmod(F.xxhash64(c, F.lit(j)), F.lit(self.m))
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
