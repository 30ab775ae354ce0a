"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"; public
knowledge).  The remaining tier of the repo's data-selection ladder:

* heuristic gates (``text.quality_score``, Gopher rules) score a doc in
  isolation;
* the learned classifier (``operators/quality``) scores a doc against a
  trusted/raw DECISION BOUNDARY;
* the KN perplexity filter (``operators/lm``) scores fluency under a
  trusted LM;
* DSIR instead matches the selected corpus's DISTRIBUTION to a target:
  each doc gets an importance weight = likelihood ratio of its hashed
  n-gram bag under target vs raw bag-of-ngrams models, then k docs are
  sampled WITHOUT replacement proportionally to the weights.

Algorithm (paper §3, hashed n-gram variant — their deployed one):

1. Featurize: lowercase word unigrams + bigrams, hashed into
   ``buckets`` (default 10⁴) counts.
2. Fit: bucket unigram distributions p̂_target / p̂_raw with add-λ
   smoothing — two bounded aggregates; the model is ONE length-B float
   vector (80 KB at the default), driver-sized at any corpus scale.
3. Weigh: log w(x) = Σ_b counts_x[b]·(log p̂_target[b] − log p̂_raw[b])
   — map-only, the broadcast log-ratio vector rides the UDF closure.
4. Resample: Gumbel top-k (Vieira 2014; Kool et al. 2019 — public):
   key_i = log w_i + Gumbel_i gives an EXACT without-replacement sample
   ∝ w; the Gumbel noise is derived deterministically from
   (seed, doc id) so selection is reproducible and layout-independent.

Scale shape: fit = one ``mapInPandas`` pass per corpus with PER-BATCH
pre-aggregated histograms (≤ B rows per batch) + a B-bounded sum;
weighing/resampling are map-only passes; the final top-k is a
TakeOrdered (per-partition heap + driver merge of k·P rows), never a
global sort.  Nothing model- or corpus-sized ever sits on the driver
except the B-vector and the k winners.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "DsirModel",
    "dsir_fit",
    "dsir_log_weights",
    "dsir_resample",
    "hashed_ngram_counts",
]

#: DSIR's featurizer tokenizes on lowercase word characters — kept
#: self-contained (Python-side regex) because featurization happens
#: inside Arrow-batched UDFs on both the fit and score paths.
DSIR_TOKEN_RE = re.compile(r"[a-z0-9']+")

DEFAULT_BUCKETS = 10_000


def _bucket(ngram: str, buckets: int) -> int:
    """Stable cross-platform hash: first 8 bytes of MD5 mod buckets
    (Python's builtin hash() is salted per process — unusable for a
    deterministic model)."""
    h = hashlib.md5(ngram.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % buckets


def _doc_buckets(text: str, buckets: int) -> list[int]:
    """Hashed unigram+bigram bucket ids for one document (with
    multiplicity — the bag, not the set)."""
    toks = DSIR_TOKEN_RE.findall((text or "").lower())
    out = [_bucket(t, buckets) for t in toks]
    out.extend(
        _bucket(toks[i] + " " + toks[i + 1], buckets)
        for i in range(len(toks) - 1)
    )
    return out


def hashed_ngram_counts(
    df: DataFrame, text_col: str = "text", buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """(bucket, cnt) totals for a corpus — ONE distributed pass:
    per-batch pre-aggregated histograms from ``mapInPandas`` (at most
    ``buckets`` rows per Arrow batch) + a bucket-keyed sum whose result
    is B-bounded."""
    import numpy as np
    import pandas as pd

    b = buckets

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        hist = np.zeros(b, dtype=np.int64)
        for pdf in batches:
            for t in pdf[text_col]:
                for bucket in _doc_buckets(t, b):
                    hist[bucket] += 1
        nz = np.flatnonzero(hist)
        yield pd.DataFrame({"bucket": nz.astype(np.int64), "cnt": hist[nz]})

    return (
        df.select(text_col)
        .mapInPandas(gen, schema="bucket long, cnt long")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


@dataclass(frozen=True)
class DsirModel:
    """The fitted importance model: one log-ratio float per bucket.
    ``log_ratio`` is a plain tuple so the model is picklable into UDF
    closures and trivially JSON-serializable for persistence."""

    log_ratio: tuple[float, ...]
    buckets: int
    smoothing: float

    def save(self, spark, path: str) -> None:
        """Persist as ONE JSON file (the model is a B-vector — 80 KB
        at the default), tmp-then-rename atomic commit via fsio;
        floats round-trip bit-identically through json's repr
        encoding (pinned by pytest)."""
        import json

        from consume_kafka_avro_data_spark.fsio import fs_for

        io = fs_for(spark, path)
        payload = {
            "version": 1,
            "buckets": self.buckets,
            "smoothing": self.smoothing,
            "log_ratio": list(self.log_ratio),
        }
        tmp = path + ".tmp"
        io.write_bytes(tmp, json.dumps(payload).encode())
        io.rename_overwrite(tmp, path)

    @classmethod
    def load(cls, spark, path: str) -> "DsirModel":
        """Reopen a saved model — see ``save``."""
        import json

        from consume_kafka_avro_data_spark.fsio import fs_for

        io = fs_for(spark, path)
        payload = json.loads(io.read_bytes(path))
        return cls(
            log_ratio=tuple(float(x) for x in payload["log_ratio"]),
            buckets=int(payload["buckets"]),
            smoothing=float(payload["smoothing"]),
        )


def _smoothed_log_probs(
    counts: dict[int, int], buckets: int, smoothing: float
) -> list[float]:
    total = sum(counts.values())
    denom = math.log(total + smoothing * buckets)
    base = math.log(smoothing) - denom
    out = [base] * buckets
    for bucket, c in counts.items():
        out[bucket] = math.log(c + smoothing) - denom
    return out


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = 1.0,
) -> DsirModel:
    """Fit p̂_target / p̂_raw over hashed n-gram buckets (add-λ
    smoothed) and return their per-bucket log ratio.  Two distributed
    histogram passes; everything after the B-bounded collect is
    driver-side float math."""
    if buckets < 1:
        raise ValueError("buckets must be positive")
    if smoothing <= 0.0:
        raise ValueError("smoothing must be > 0 (unsmoothed ratios diverge)")
    t_counts = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_counts(target, text_col, buckets).collect()
    }
    r_counts = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_counts(raw, text_col, buckets).collect()
    }
    if not t_counts or not r_counts:
        raise ValueError("empty corpus: both target and raw need tokens")
    lp_t = _smoothed_log_probs(t_counts, buckets, smoothing)
    lp_r = _smoothed_log_probs(r_counts, buckets, smoothing)
    return DsirModel(
        log_ratio=tuple(a - b for a, b in zip(lp_t, lp_r)),
        buckets=buckets,
        smoothing=smoothing,
    )


def dsir_log_weights(
    model: DsirModel,
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "dsir_logw",
) -> DataFrame:
    """Append log w(x) = Σ n-gram log-ratios — map-only (the plan is
    pinned Exchange-free): at 100 TB the weigher runs at parquet scan
    speed, like the quality classifier it complements.  Empty/NULL text
    weighs 0 (an even ratio), never NULL."""
    import numpy as np
    import pandas as pd

    ratio = np.asarray(model.log_ratio, dtype=np.float64)
    b = model.buckets

    def weigh(batches: Iterator["pd.Series"]) -> Iterator["pd.Series"]:
        for texts in batches:
            yield pd.Series(
                [
                    float(ratio[_doc_buckets(t, b)].sum())
                    for t in texts
                ],
                dtype=np.float64,
            )

    weigh.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    weigh_udf = F.pandas_udf(weigh, returnType="double")
    return df.withColumn(out_col, weigh_udf(F.col(text_col)))


def gumbel_key_expr(
    logw_col: str, id_col: str, seed: int
) -> Column:
    """log w + Gumbel(0,1) with the noise derived deterministically
    from (seed, id): u = (xxhash64(seed-salted id) as uniform in (0,1)),
    g = −log(−log u).  Pure JVM expression — codegen, reproducible,
    layout-independent.

    The noise is a pure function of (seed, id), so ``id_col`` must be
    unique per row (NULL counts as one value): duplicate ids share one
    Gumbel draw and would enter a top-k all-or-nothing instead of
    independently."""
    h = F.xxhash64(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    # map to (0,1) STRICTLY: offset by 0.5 inside the 2^64 grid, then
    # clamp below 1 — cast('double') rounds the top ~2^10 hash values
    # up to 2^63 exactly (ulp there is 1024), which would make u = 1.0
    # and log(-log(1.0)) NULL, silently excluding the doc from any
    # desc-ordered top-k
    u = (h.cast("double") + F.lit(2.0**63) + F.lit(0.5)) / F.lit(2.0**64)
    u = F.least(u, F.lit(1.0 - 2.0**-53))
    return F.col(logw_col) - F.log(-F.log(u))


def dsir_ess(
    model: DsirModel, df: DataFrame, text_col: str = "text"
) -> dict[str, float]:
    """Importance-sampling health check: effective sample size
    ESS = (Σw)²/Σw² over the candidate pool (Kong 1992's classic
    diagnostic — public).  ESS ≈ n means target and raw are close
    (weights nearly flat); ESS ≪ k being requested means the sample
    will concentrate on a few documents and the deployment should
    narrow the gap (bigger target corpus, more smoothing) before
    trusting the selection.  One map-only weigh pass + one bounded
    aggregate; weights are exponentiated around their max for
    overflow-safe Σw and Σw² (the standard log-sum-exp shift —
    RELATIVE weights are all ESS needs)."""
    w = dsir_log_weights(model, df, text_col)
    mx = w.agg(F.max("dsir_logw").alias("m")).collect()[0]["m"]
    if mx is None:
        return {"ess": 0.0, "n": 0, "ess_fraction": 0.0}
    sums = w.select(
        F.exp(F.col("dsir_logw") - F.lit(mx)).alias("w1"),
    ).agg(
        F.sum("w1").alias("s1"),
        F.sum(F.col("w1") * F.col("w1")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    ess = float(sums["s1"]) ** 2 / float(sums["s2"])
    n = int(sums["n"])
    return {"ess": ess, "n": n, "ess_fraction": ess / n if n else 0.0}


def dsir_resample(
    model: DsirModel,
    df: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select k documents WITHOUT replacement with probability ∝ w(x)
    — the Gumbel top-k trick: perturb each log-weight with deterministic
    Gumbel noise and take the k largest keys (exact sampling; Vieira
    2014).  Plan: map-only weigh + TakeOrdered(k) — no global sort, no
    shuffle of the corpus.  Returns the caller's columns plus
    ``dsir_logw``; selection is reproducible for a fixed seed and
    independent of partition layout.  ``id_col`` must be unique per
    row — the noise derives from it (see ``gumbel_key_expr``), so
    duplicated ids would be selected all-or-nothing."""
    if k < 1:
        raise ValueError("k must be positive")
    weighted = dsir_log_weights(model, df, text_col)
    key = gumbel_key_expr("dsir_logw", id_col, seed)
    # column hygiene: re-selecting an input that already carries
    # dsir_logw must not produce a duplicate-named column, and the
    # internal sort key must not clobber (then leak back) a caller
    # column of the same name
    out_cols = list(df.columns)
    if "dsir_logw" not in out_cols:
        out_cols.append("dsir_logw")
    key_col = "_dsir_key"
    while key_col in df.columns:
        key_col += "_"
    return (
        weighted.withColumn(key_col, key)
        .orderBy(F.col(key_col).desc())
        .limit(k)
        .select(*out_cols)
    )
