"""Mergeable sketches — the join-free statistics tier for 100 TB
corpora (public algorithms: KMV/bottom-k distinct-value sketches,
Beyer et al. 2007 "On Synopses for Distinct-Value Estimation under
Multiset Operations"; Misra–Gries heavy hitters, Misra & Gries 1982,
with the mergeability result of Agarwal et al. 2012 "Mergeable
Summaries").

Why these exist next to the exact operators: the engine already
answers "how many distinct" (A3/A4: exact + HLL) and "top terms"
(W5: exact Zipf top-k) with aggregates, but two deployment questions
at 100 TB want CONSTANT-SIZE, MERGEABLE state instead of a corpus
shuffle per question:

* "How much does corpus A overlap corpus B?" — a join answers it at
  the cost of co-shuffling both corpora; two KMV sketches (built
  independently, possibly on different days/clusters) answer
  distinct counts, Jaccard, union AND intersection sizes from 2·k
  hashes on the driver.
* "What are the heavy hitters and HOW SURE are we?" — Misra–Gries
  gives deterministic lower bounds and the guarantee that anything
  with frequency > n/(k+1) is present, from k counters per partition.

Scale shape: a KMV sketch is `distinct → TakeOrdered(k)` — one
map-side-combined exchange of distinct hashes, then a per-partition
heap merge of k rows; everything after is driver-side integer math.
Misra–Gries runs one `mapInPandas` pass emitting ≤ k rows per
PARTITION (constant driver traffic), merged driver-side by the
Agarwal et al. rule, preserving the n/(k+1) error bound.

Determinism: both sketches hash with Spark's xxhash64 — no RNG, no
layout dependence (pinned: sketching commutes with union, and the
same corpus sketches identically from any partitioning).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "KmvSketch",
    "kmv_sketch",
    "kmv_union",
    "kmv_jaccard",
    "HeavyHitters",
    "heavy_hitters",
    "mg_merge",
]

#: xxhash64 is signed; the sketch math wants uniform u ∈ [0, 1), so
#: hashes are shifted to unsigned Python ints (exact — no float until
#: the final estimate).
_SHIFT = 1 << 63
_SPACE = float(1 << 64)


@dataclass(frozen=True)
class KmvSketch:
    """Bottom-k distinct-hash synopsis.  ``hashes`` holds the k
    smallest UNSIGNED xxhash64 values of the column's distinct values,
    ascending.  When fewer than k distinct values exist the sketch is
    EXACT (it has seen every distinct hash)."""

    hashes: tuple[int, ...]
    k: int

    @property
    def exact(self) -> bool:
        return len(self.hashes) < self.k

    def distinct_estimate(self) -> float:
        """(k−1)/u_k, the classic KMV estimator; exact count when the
        sketch saw everything.  Unbiased for uniform hashes; relative
        error ≈ 1/√(k−2)."""
        if self.exact:
            return float(len(self.hashes))
        u_k = (self.hashes[-1] + 1) / _SPACE  # +1: open-interval guard
        return (self.k - 1) / u_k


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> KmvSketch:
    """Build a bottom-k sketch of ``col``'s distinct values: ONE
    map-side-combined distinct exchange + a TakeOrdered(k) — k longs
    reach the driver regardless of corpus size.  NULL is excluded
    (distinct-VALUE semantics, matching count_distinct)."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    rows = (
        # NULL filter BEFORE the hash projection: after it, a sketched
        # column literally named like the alias would re-bind the
        # predicate to the (never-NULL) hash column
        df.where(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return KmvSketch(
        hashes=tuple(sorted(r["h"] + _SHIFT for r in rows)), k=k
    )


def kmv_union(a: KmvSketch, b: KmvSketch) -> KmvSketch:
    """Sketch of the UNION from two sketches (Beyer et al. §4): the
    bottom-k of the combined hash sets, at k = min(k_a, k_b).  LAW
    (pinned): kmv_union(sketch(A), sketch(B)) == sketch(A ∪ B) —
    sketching commutes with union, which is what makes per-shard /
    per-day sketches composable."""
    # correct at k = min: any of the k smallest hashes of A ∪ B is
    # among the bottom-k of its own side, so it survives both input
    # sketches; when both inputs are exact and the union fits under k
    # the result stays exact (len < k ⇒ exact)
    k = min(a.k, b.k)
    merged = sorted(set(a.hashes) | set(b.hashes))[:k]
    return KmvSketch(hashes=tuple(merged), k=k)


def kmv_jaccard(a: KmvSketch, b: KmvSketch) -> dict[str, float]:
    """Jaccard / intersection / union estimates from two sketches
    (Beyer et al. §5): over the union's bottom-k reference sample K,
    J ≈ |K ∩ A ∩ B| / |K|; intersection ≈ J × |A ∪ B|.  Exact when
    both sketches are exact."""
    u = kmv_union(a, b)
    if not u.hashes:
        return {"jaccard": 0.0, "union": 0.0, "intersection": 0.0}
    sample = set(u.hashes)
    both = sample & set(a.hashes) & set(b.hashes)
    j = len(both) / len(sample)
    union_est = u.distinct_estimate()
    return {
        "jaccard": j,
        "union": union_est,
        "intersection": j * union_est,
    }


@dataclass(frozen=True)
class HeavyHitters:
    """Misra–Gries result: ``items`` maps value → LOWER-BOUND count
    (deterministic undercount).  Guarantees, with n = total non-NULL
    rows and k = counter budget: every value with true frequency
    > n/(k+1) is present, and true − bound ≤ n/(k+1) for every
    reported value.  Keys are the values' STRING forms (the summary
    rows cross the Arrow boundary with one fixed schema) — distinct
    values sharing a string form merge."""

    items: dict[Any, int]
    n: int
    k: int

    @property
    def error_bound(self) -> float:
        return self.n / (self.k + 1)


def _mg_fold(counters: dict, value: Any, k: int) -> None:
    """One Misra–Gries step: count if tracked or space left, else
    decrement everything (the k+1-way cancellation)."""
    if value in counters:
        counters[value] += 1
    elif len(counters) < k:
        counters[value] = 1
    else:
        for key in list(counters):
            counters[key] -= 1
            if counters[key] == 0:
                del counters[key]


def mg_merge(summaries, k: int) -> dict:
    """Merge Misra–Gries summaries (Agarwal et al. 2012): sum counts
    per item, then subtract the (k+1)-th largest combined count from
    every item and drop the non-positive — associative in the sense
    that any merge tree preserves the global n/(k+1) guarantee."""
    combined: dict = {}
    for summary in summaries:
        for item, c in summary.items():
            combined[item] = combined.get(item, 0) + c
    if len(combined) > k:
        cut = sorted(combined.values(), reverse=True)[k]
        combined = {
            item: c - cut for item, c in combined.items() if c - cut > 0
        }
    return combined


def heavy_hitters(df: DataFrame, col: str, k: int = 64) -> HeavyHitters:
    """Deterministic heavy hitters in ONE pass: a Misra–Gries summary
    of k counters per partition (``mapInPandas`` emitting ≤ k rows
    each — driver traffic is partitions × k, never corpus-sized),
    merged by the Agarwal et al. 2012 rule (sum counts, subtract the
    (k+1)-th largest, drop non-positive), which preserves the single-
    pass n/(k+1) guarantee.  NULLs are excluded and counted out of n,
    mirroring count_distinct semantics.

    Key identity: items are reported as STRINGS (the summary schema is
    typed ``item string``), so values are keyed by their rendered form.
    pandas widens a NULLABLE integer column to float64, which would
    render ``2`` as ``'2.0'`` and silently split/merge keys depending on
    batch nullability — so int-like values (numpy ints, and floats with
    no fractional part arriving from an integer Spark column) are
    normalized to their integer rendering before folding.  True float
    columns with fractional values are unaffected."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be positive")

    int_like = df.select(col).schema[0].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None or (isinstance(v, float) and v != v):
                    continue
                # integer Spark column arriving as float64 (pandas
                # nullable widening): restore the integer identity so
                # the string key matches the non-nullable batches'
                if int_like and isinstance(v, float):
                    v = int(v)
                n += 1
                _mg_fold(counters, v, k)
        yield pd.DataFrame(
            {
                "item": [str(key) for key in counters] + [None],
                "cnt": list(counters.values()) + [0],
                "n": [0] * len(counters) + [n],
            }
        )

    rows = df.select(col).mapInPandas(
        gen, schema="item string, cnt long, n long"
    ).collect()
    n_total = sum(r["n"] for r in rows)
    per_partition: dict = {}
    for r in rows:
        if r["item"] is not None:
            per_partition[r["item"]] = (
                per_partition.get(r["item"], 0) + r["cnt"]
            )
    return HeavyHitters(items=mg_merge([per_partition], k), n=n_total, k=k)
