"""Distributed n-gram language modeling — interpolated Kneser-Ney
bigrams (charter U7), the LM tier of the curation stack.

Public-knowledge lineage: CCNet (Wenzek et al. 2020) and the GPT-3
pipeline filter web text by LANGUAGE-MODEL perplexity (CCNet uses a
KenLM 5-gram); the published smoothing standard for count-based LMs is
interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1999's
empirical study).  The repo's existing ``q_perplexity`` certifies the
unigram form end-to-end against a SQL oracle; this module adds the
bigram-KN upgrade as a library operator — richer signal for the same
per-doc scoring shape.

Interpolated KN, bigram order (Chen & Goodman eq. 4.17 family):

    P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1·)  +  λ(w1) · Pcont(w2)
    λ(w1)    = D · N1+(w1 ·) / c(w1·)
    Pcont(w2)= N1+(· w2) / N1+(· ·)

Everything is RELATIONAL — counts, distinct-follower counts, and the
interpolation are joins/aggregations over the bigram table, so Catalyst
plans the whole fit:

* doc → bigrams is map-only (zip_with over adjacent slices of the
  token array — no window, no shuffle for pairing);
* ONE corpus-sized shuffle produces the bigram count table; every
  later table (context totals, follower/predecessor type counts) is a
  vocabulary-bounded aggregate of it;
* scoring joins each doc's bigrams against the prob table (observed
  mass) with λ/Pcont fallbacks via two left joins — unseen events
  back off exactly as the formula says, and a configurable floor
  bounds fully-OOV bigrams away from log(0).

Determinism: exact integer counts throughout; the only floats are the
final divisions, identical across layouts.  The pure-Python reference
implementation in tests/test_lm.py pins the Spark tables value-for-
value on a toy corpus, and a property test checks Σ_w2 P(w2|w1) = 1
per seen context — the signature KN invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from consume_kafka_avro_data_spark.operators.dedup import tokens_col

#: Chen & Goodman's well-working fixed discount
DEFAULT_DISCOUNT = 0.75


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", keep_cols: list[str] | None = None
) -> DataFrame:
    """(…keep_cols, w1, w2) — one row per adjacent token pair per doc,
    tokenized by the corpus-wide convention (lowercase, whitespace,
    NULL → '').  Map-only: the pairing is zip_with over adjacent
    slices of the token array; docs with <2 tokens emit no rows."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    keep = list(keep_cols or [])
    return (
        docs.select(*keep, F.explode(pairs).alias("_bg"))
        .select(*keep, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


class BigramKN:
    """Fitted interpolated-KN bigram model: three driverless tables —
    ``probs`` (w1, w2, p) for observed bigrams, ``contexts`` (w1, lam)
    for backoff weights, ``cont`` (w2, pcont) for the continuation
    distribution — plus the scalar discount/type-count.  All tables are
    corpus-derived DataFrames; nothing model-sized ever lives on the
    driver, so the fit scales to any corpus."""

    def __init__(
        self,
        probs: DataFrame,
        contexts: DataFrame,
        cont: DataFrame,
        discount: float,
        n_bigram_types: int,
        _bg: DataFrame | None = None,
    ):
        self.probs = probs
        self.contexts = contexts
        self.cont = cont
        self.discount = discount
        self.n_bigram_types = n_bigram_types
        # the checkpointed bigram-count table every model table derives
        # from — the model's resident state, released by unpersist()
        self._bg = _bg

    def unpersist(self) -> None:
        """Release the fitted model's checkpointed bigram table (its
        only resident state).  The model's DataFrames re-derive from
        lineage after this but every action re-runs the corpus
        tokenize+count — call when done with the model, the same
        lifecycle discipline as the iterative operators' checkpoints."""
        if self._bg is not None:
            self._bg.unpersist()

    # -- fit -------------------------------------------------------------

    @classmethod
    def fit(
        cls,
        corpus: DataFrame,
        text_col: str = "text",
        discount: float = DEFAULT_DISCOUNT,
    ) -> "BigramKN":
        if not 0.0 < discount < 1.0:
            # D outside (0,1) breaks the probability axioms: D≥1 can
            # zero every observed term, D≤0 un-discounts and λ goes
            # non-positive — fail at fit, not as NaN perplexities later
            raise ValueError(f"KN discount must be in (0, 1), got {discount}")
        bg = (
            doc_bigrams(corpus, text_col)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c12"))
            # every derived table (and every later score) re-reads
            # this: checkpoint so the tokenize+pair+count subtree runs
            # once.  The blocks are the MODEL's resident state —
            # BigramKN.unpersist() releases them when the caller is
            # done (a fit-scoped unpersist would silently re-run the
            # corpus count on every score action)
            .localCheckpoint(eager=True)
        )
        ctx = bg.groupBy("w1").agg(
            F.sum("c12").alias("c1"),
            F.count(F.lit(1)).alias("n1_fwd"),  # N1+(w1 ·)
        )
        n1_bwd = bg.groupBy("w2").agg(
            F.count(F.lit(1)).alias("n1_bwd")  # N1+(· w2)
        )
        n_types = bg.count()  # N1+(· ·)
        d = F.lit(float(discount))
        cont = n1_bwd.select(
            "w2", (F.col("n1_bwd") / F.lit(float(n_types))).alias("pcont")
        )
        contexts = ctx.select(
            "w1",
            (d * F.col("n1_fwd") / F.col("c1")).alias("lam"),
            "c1",
        )
        probs = (
            bg.join(contexts, "w1")
            .join(cont, "w2")
            .select(
                "w1",
                "w2",
                (
                    F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
                    + F.col("lam") * F.col("pcont")
                ).alias("p"),
            )
        )
        return cls(probs, contexts.drop("c1"), cont, discount, n_types, _bg=bg)

    # -- score -----------------------------------------------------------

    def score(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        p_floor: float = 1e-9,
    ) -> DataFrame:
        """(id_col, n_bigrams, avg_nll) — per-document mean negative
        log-likelihood under the fitted model, the CCNet-style quality
        signal (lower = more natural under the training corpus).

        Backoff exactly as the formula dictates, via two LEFT joins:
        observed bigram → full interpolated p; unseen bigram in a SEEN
        context → λ(w1)·Pcont(w2); unseen context → Pcont(w2); a w2 the
        model has never seen ANYWHERE has Pcont = 0 and floors at
        ``p_floor`` (the standard OOV guard — log 0 would poison the
        doc's score).  Docs with <2 tokens report n_bigrams=0 and NULL
        avg_nll: no evidence is not the same as perfect fluency."""
        bgs = doc_bigrams(docs, text_col, keep_cols=[id_col])
        joined = (
            bgs.join(self.probs, ["w1", "w2"], "left")
            .join(self.contexts, "w1", "left")
            .join(self.cont, "w2", "left")
            .select(
                id_col,
                F.greatest(
                    F.coalesce(
                        F.col("p"),  # observed bigram
                        F.col("lam") * F.col("pcont"),  # seen ctx backoff
                        F.col("pcont"),  # unseen ctx: continuation only
                    ),
                    F.lit(float(p_floor)),  # fully-OOV floor
                ).alias("_p"),
            )
        )
        scored = joined.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum(F.log("_p")) / F.count(F.lit(1))).alias("avg_nll"),
        )
        # <2-token docs emitted no bigram rows: restore them with NULL
        # scores so the output covers every input document.  NULL-SAFE
        # id join — the corpus-wide id convention (a NULL-id doc's
        # score must reach its row, not vanish into an unmatched left
        # side; groupBy above already grouped NULL ids together)
        ids = docs.select(id_col).distinct()
        return ids.join(
            scored,
            on=ids[id_col].eqNullSafe(scored[id_col]),
            how="left",
        ).select(
            ids[id_col].alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_nll",
        )
