"""Streaming near-dup dedup at ingest time (charter U5, operational):
each micro-batch of documents is MinHash-signed, LSH-matched against a
persistent signature store, routed duplicate/novel, and the novel
signatures are merged into the store — so the corpus stays deduped AS
it is ingested instead of via periodic full-corpus sweeps.

Scale shape (the invariant of operators/dedup: never shuffle more than
the signature):

* The store holds only ``(doc_id, signature)`` — bands recompute from
  the stored signatures as codegen'd hashes, so the on-disk state is
  ~n·8·32 bytes per document regardless of document size.
* Per batch: one signature pass over the batch (explode + native min
  aggregates), one band equi-join against the store's banded view
  (new×store only — the store is already deduped, so store×store work
  would be pure waste), one intra-batch band self-check (earlier-id
  canonical), one idempotent merge of novel signatures.
* Replay safety mirrors streaming/ingest.StreamingGraphIngest: the
  store merge anti-joins on doc_id (a replayed batch re-appends
  nothing), self-matches are excluded by id (a doc whose signature
  already landed before a crash does not count as its own duplicate on
  replay), and side counters are marked per batch only after success.

The reference never had this operator; it is the LLM-pipeline charter
applied to the reference's consume→transform→idempotent-sink loop
(src/main.cpp:221-256), with the dedup signature store taking the place
of the graph tables.
"""

from __future__ import annotations

import inspect
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from consume_kafka_avro_data_spark.operators.dedup import (
    MAX_BUCKET_SIZE,
    _minhash_agg_components,
    minhash_sig_table,
    resolve_banding,
)
from consume_kafka_avro_data_spark.operators.store import ManifestTable
from consume_kafka_avro_data_spark.streaming.lifecycle import BoundedReplayMixin


@dataclass
class DedupMetrics:
    """Per-run counters: every batch doc is rejected (quality gate),
    contaminated (decontamination gate), a dupe, or novel — the four
    always sum to docs (gates that are off contribute zero)."""

    batches: int = 0
    docs: int = 0
    novel_docs: int = 0
    dup_docs: int = 0
    rejected_docs: int = 0
    contaminated_docs: int = 0
    dup_pairs_by_batch: dict[int, int] = field(default_factory=dict)
    #: round 10 — per-micro-batch per-gate rows in pipeline order,
    #: ``{"gate", "docs_in", "docs_rejected", "sec"}`` (the "dedup"
    #: row's docs_rejected counts ROUTED duplicates); keyed by batch id
    #: like dup_pairs_by_batch (replays keep the original), trimmed at
    #: the same horizon.  ``StreamingDedupIngest.gate_census()``
    #: aggregates it per gate — the observability a deployment tunes
    #: its gate order and executor count against (the reference's
    #: error counter, src/main.cpp:243-251, at pipeline scale).
    gate_census_by_batch: dict[int, list] = field(default_factory=dict)


class StreamingDedupIngest(BoundedReplayMixin):
    """readStream(docs) → sign → LSH vs store → route → merge novel."""

    _checkpoint_subdir = "dedup"

    def _new_metrics(self) -> DedupMetrics:
        return DedupMetrics()

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        checkpoint_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_k: int = 3,
        bands: int | None = None,
        rows: int | None = None,
        tune_for: tuple[float, int] | None = None,
        min_matches: int | None = None,
        hash_fn: str = "xxhash64",
        max_bucket_size: int = MAX_BUCKET_SIZE,
        dupes_dir: str | None = None,
        compact_every: int | None = None,
        id_type: DataType | None = None,
        quality_threshold: float | None = None,
        rejects_dir: str | None = None,
        quality_model=None,
        quality_model_threshold: float = 0.5,
        model_rejects_dir: str | None = None,
        dsir_model=None,
        dsir_threshold: float | None = None,
        dsir_rejects_dir: str | None = None,
        lm_model=None,
        lm_threshold: float | None = None,
        lm_rejects_dir: str | None = None,
        lm_broadcast: bool | None = None,
        c4: bool = False,
        c4_min_line_words: int = 5,
        c4_min_sentences: int = 3,
        c4_rejects_dir: str | None = None,
        gopher_rep: bool = False,
        gopher_rep_thresholds: dict | None = None,
        gopher_rep_rejects_dir: str | None = None,
        eval_docs: DataFrame | None = None,
        contam_gram_n: int = 8,
        contam_min_hits: int = 1,
        contam_dir: str | None = None,
        drift_monitor=None,
        sketch_monitor=None,
        store_bloom: bool = False,
    ):
        """``id_type`` is the document-id column's Spark type (default
        LongType) — it shapes the persisted store schema, so a stream
        whose ``id_col`` disagrees is rejected at the first micro-batch
        with a clear error instead of corrupting the store (parquet
        would accept the mismatched write and every later read would
        fail with a column-type mismatch).

        ``quality_threshold`` enables the batch curation funnel's
        stage-1 gate AT INGEST (operators/text.quality_score < τ →
        rejected before signing): gated docs never enter the signature
        store, never witness a duplicate, and are optionally persisted
        to ``rejects_dir`` (same partition-by-batch dynamic-overwrite
        replay contract as ``dupes_dir``).  The gate is map-only JVM
        expressions — it adds no shuffle to the per-batch plan.

        ``quality_model`` (a fitted ``operators/quality`` PipelineModel)
        enables the LEARNED gate at ingest — the GPT-3/CCNet classifier
        tier above the heuristic one: docs with
        P(quality) < ``quality_model_threshold`` are rejected before
        signing, counted into the same ``rejected_docs`` metric, and
        optionally persisted with their probabilities to
        ``model_rejects_dir`` (its own directory — the heuristic gate's
        rejects carry a different schema).  Scoring is map-only JVM
        (tokenize → hash → LR transform; no Python workers), so this
        gate too adds no shuffle.  Gate order: heuristic first (cheaper
        expressions), model second, decontamination last.

        ``dsir_model`` (+ required ``dsir_threshold``) enables the
        DISTRIBUTION-MATCHING gate at ingest — the streaming adaptation
        of DSIR (Xie et al. 2023; ``operators/dsir``): each doc's
        hashed-n-gram importance log-weight (how much more likely its
        bag is under the target corpus than under raw crawl) is scored
        by an Arrow-batched map-only pass, and docs with
        ``dsir_logw < dsir_threshold`` are rejected before signing,
        counted into ``rejected_docs``, optionally persisted with their
        weights to ``dsir_rejects_dir`` (same replay contract).  The
        batch operator samples a corpus-level top-k with Gumbel noise;
        at ingest a deterministic weight cut replaces the sample so the
        audit trail is replay-stable — calibrate τ from the weight
        distribution of a held-out slice (e.g. its median for a
        keep-half policy).  Runs after the classifier gate (both are
        map-only; this one crosses into Python workers, so it goes
        second) and before the LM gate (which shuffles).

        ``lm_model`` (+ required ``lm_threshold``) enables the
        PERPLEXITY gate at ingest — the CCNet deployment shape (Wenzek
        et al. 2020 filter web text by LM perplexity under a model fit
        on trusted text): a fitted ``operators/lm`` model
        (``NgramKN``/``BigramKN``, typically ``NgramKN.load``-ed once
        at stream start) scores each batch and docs with
        ``avg_nll > lm_threshold`` are rejected before signing,
        counted into ``rejected_docs``, optionally persisted with
        their scores to ``lm_rejects_dir`` (same replay contract).
        Docs too short for the model's order (``n_ngrams=0``, NULL
        score) PASS — no evidence is not evidence of junk; pair with
        the heuristic gate's length features to cut shorts.  Unlike
        the two quality gates this one shuffles (the score is a
        per-doc aggregate over joined n-grams), so it runs after
        them, on their survivors only.

        ``lm_broadcast`` controls how the LM gate's model reaches the
        per-batch score:

        * ``True`` — model tables hinted into the joins' build side
          (``NgramKN.score(broadcast_model=True)``): the per-batch
          score is MAP-ONLY up to the final per-doc aggregate — the
          deployed CCNet shape, where the filter model is fit once on
          a bounded (usually ``min_count``-pruned) trusted corpus and
          then sweeps every arriving batch.
        * ``"dict"`` (round 9) — the model is collected ONCE at
          construction into plain dicts and shipped as a broadcast
          variable; each batch scores inside one ``mapInPandas``
          (``NgramKN.score_broadcast``) with ZERO model joins per
          micro-batch.  Value-identical to the relational scorer
          (pinned); requires a model small enough for
          ``local_tables``'s row ceiling — the pruned deployed shape.
          Round 10 ships the FLAT payload (``local_tables_flat`` —
          int-interned keys + per-batch gram memo, the
          measured-faster kernel); ``"dict-tuple"`` keeps the round-9
          string-tuple layout, retained for the bench A/B.
        * ``False`` — plain joins, sized by Catalyst.  Choose this
          when the model was fit UNPRUNED on a corpus large enough
          that its gram-type tables rival executor memory — otherwise
          every micro-batch pays up to 2n−1 sort-merge shuffles
          against the model tables, per batch, forever.
        * ``None`` (default) = AUTO: ``True`` when the model's
          ``score`` supports the hint (NgramKN) AND its
          ``model_rows()`` fits under the dict-tier row ceiling —
          the size check (r08 advisor) that keeps auto from forcing
          an unpruned web-scale model's tables onto executor heaps;
          oversize models resolve to ``False`` (degrade to sort-merge,
          never OOM by default).  BigramKN's two-table score has no
          hint and broadcasts by size like any small join.

        ``c4=True`` enables the C4 LINE-LEVEL cleaning stage (Raffel
        et al. 2020 §2.2; ``operators/text.c4_clean``) as the FIRST
        gate — the published pipeline runs line cleaning BELOW the
        doc-level gates, and it is pure map-only JVM expressions, so
        it is also the cheapest.  Each batch's text is line-cleaned
        IN PLACE (downstream gates, signatures, and the store all see
        the cleaned text — a doc deduped on boilerplate-stripped
        content, which is the C4 intent), docs flagged unkept
        (``c4_keep`` false: lorem ipsum, code braces, too few
        sentences after cleaning) are rejected before any other gate,
        counted into ``rejected_docs``, and optionally persisted with
        their line counts to ``c4_rejects_dir`` (same
        partition-by-batch dynamic-overwrite replay contract).
        ``c4_min_line_words`` / ``c4_min_sentences`` pass through to
        the operator.

        ``gopher_rep=True`` enables Gopher's published REPETITION
        removal (Rae et al. 2021 table A1's other half;
        ``operators/text.gopher_repetition``): docs whose duplicate-
        line/paragraph fractions, top n-gram character fractions, or
        duplicated n-gram coverage exceed the published bounds are
        rejected before signing, counted into ``rejected_docs``, and
        optionally persisted WITH their 13 metrics to
        ``gopher_rep_rejects_dir`` (same replay contract).  One
        Arrow-batched map-only pass; runs after the JVM gates
        (heuristic + classifier) and before DSIR — cheapest-first
        among the Python-worker gates.  ``gopher_rep_thresholds``
        overrides individual bounds.

        ``eval_docs`` enables DECONTAMINATION AT INGEST (the streaming
        form of q_decontaminate/q_decontaminate_bloom): a static frame
        of benchmark/eval documents (same ``text_col``) whose word
        ``contam_gram_n``-grams are, once at construction, distinct'd,
        checkpointed, and compiled into a ``BroadcastBloom``.  Each
        micro-batch's grams pass the bloom's pure-JVM bit-test
        prefilter (no false negatives; prunes ~all clean grams before
        any join), then an exact broadcast verify join against the
        eval gram set — so a bloom false positive can NEVER reject a
        clean document.  Docs with ≥ ``contam_min_hits`` distinct eval
        grams are dropped before signing (never enter the store, never
        witness a duplicate) and optionally persisted with their hit
        counts to ``contam_dir`` (same replay contract as
        ``rejects_dir``).  Gate order: quality first (map-only, no
        shuffle) so the gram explode only runs on quality survivors.
        Eval sets are bounded by construction — the bloom's
        ``MAX_BITS`` guard and the broadcast verify both refuse builds
        past plan-shippable size.

        ``drift_monitor`` (a ``streaming/drift.StreamingDriftMonitor``)
        rides the SAME foreachBatch: one stream scan drives dedup,
        both gates, and the drift watch — no second consumer group, no
        second checkpoint.  It observes each batch RAW, before any
        gate (drift is about what's ARRIVING, not what survives), so
        the stream must carry the monitor's expected columns
        (``lang`` + ``text``).  Replay stays consistent: the monitor
        keys by the same batch id this ingest's sinks key by.

        ``sketch_monitor`` (a ``streaming/sketches.
        StreamingSketchMonitor``) rides the same foreachBatch under
        the same raw-batch / replay contract: it watches its
        configured key column's cardinality, duplication factor, and
        heavy hitters over what ARRIVES — so the pipeline can compare
        "duplicates delivered" (sketch view) against "duplicates this
        ingest actually removed" (dup_docs) from one stream scan.

        ``tune_for=(jaccard_threshold, num_hashes)`` (round 9) designs
        the banding scheme through ``operators/dedup.tune_lsh_params``
        instead of taking explicit ``bands``/``rows`` — the resolution
        is deterministic and the RESOLVED scheme is what lands in
        ``_signature_params.json``, so a replay or reopen configured
        with the same ``tune_for`` always agrees with the store (and a
        reopen with mismatched parameters is rejected exactly as for
        explicit ones).  Passing both is a config conflict; passing
        neither keeps the pinned (8, 4) defaults every pre-round-9
        store was built with — see ``resolve_banding``."""
        bands, rows = resolve_banding(bands, rows, tune_for)
        n = bands * rows
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = rows
        self.min_matches = n // 2 if min_matches is None else min_matches
        self.hash_fn = hash_fn
        self.max_bucket_size = max_bucket_size
        self.dupes_dir = dupes_dir
        self.compact_every = compact_every
        self.quality_threshold = quality_threshold
        self.rejects_dir = rejects_dir
        if quality_model is not None and not hasattr(quality_model, "transform"):
            # eager, config-layer error: a merges-list or a path here
            # would otherwise AttributeError mid-stream at batch 0
            raise TypeError(
                "quality_model must be a fitted Spark ML model (has "
                ".transform) — train one with operators/quality."
                "train_quality_classifier"
            )
        self.quality_model = quality_model
        self.quality_model_threshold = quality_model_threshold
        self.model_rejects_dir = model_rejects_dir
        if lm_model is not None:
            if not hasattr(lm_model, "score"):
                raise TypeError(
                    "lm_model must be a fitted operators/lm model (has "
                    ".score) — fit with NgramKN.fit or reopen with "
                    "NgramKN.load"
                )
            if lm_threshold is None:
                # an LM gate with no threshold silently rejects nothing
                # — demand the deployment choose its cut
                raise ValueError(
                    "lm_model requires lm_threshold (the avg_nll cut; "
                    "calibrate on a held-out slice of the trusted corpus)"
                )
        self.lm_model = lm_model
        self.lm_threshold = lm_threshold
        self.lm_rejects_dir = lm_rejects_dir
        # resolve the broadcast mode EAGERLY (config-layer, not batch 0)
        supports_hint = lm_model is not None and (
            "broadcast_model"
            in inspect.signature(lm_model.score).parameters
        )
        self._lm_local = None  # Broadcast[dict] when lm_broadcast="dict"
        if lm_broadcast in ("dict", "dict-tuple"):
            if lm_model is None or not hasattr(lm_model, "score_broadcast"):
                raise ValueError(
                    'lm_broadcast="dict" needs an lm_model with '
                    "score_broadcast (NgramKN) — fit/load one, or use "
                    "True/False/None for the relational scorer"
                )
            # collect ONCE here (local_tables enforces its row
            # ceiling) and broadcast ONCE — every micro-batch reuses
            # the same broadcast variable for the stream's whole life.
            # "dict" ships the round-10 FLAT payload (int-interned +
            # per-batch gram memo — the measured-faster kernel);
            # "dict-tuple" keeps the round-9 string-tuple layout for
            # the bench A/B.  score_broadcast dispatches on the
            # payload, so the per-batch path below is layout-blind.
            self._lm_local = spark.sparkContext.broadcast(
                lm_model.local_tables_flat()
                if lm_broadcast == "dict"
                else lm_model.local_tables()
            )
            self.lm_broadcast: bool | str = "dict"
        elif lm_broadcast is None:
            # AUTO = hint on iff supported AND the model is actually
            # broadcast-sized (one-time table counts; an unpruned
            # web-scale fit degrades to sort-merge instead of OOMing
            # executors by default — r08 advisor)
            from consume_kafka_avro_data_spark.operators.lm import (
                MAX_LOCAL_MODEL_ROWS,
            )

            self.lm_broadcast = bool(
                supports_hint
                and hasattr(lm_model, "model_rows")
                and lm_model.model_rows() <= MAX_LOCAL_MODEL_ROWS
            )
        else:
            if lm_broadcast and lm_model is not None and not supports_hint:
                raise ValueError(
                    "lm_broadcast=True but this lm_model's score() has no "
                    "broadcast_model hint (BigramKN's two-table score "
                    "broadcasts by size on its own) — drop the flag or use "
                    "an NgramKN model"
                )
            self.lm_broadcast = bool(lm_broadcast)
        self.c4 = c4
        self.c4_min_line_words = c4_min_line_words
        self.c4_min_sentences = c4_min_sentences
        self.c4_rejects_dir = c4_rejects_dir
        if gopher_rep_thresholds is not None:
            from consume_kafka_avro_data_spark.operators.text import (
                GOPHER_REP_THRESHOLDS,
            )

            unknown = set(gopher_rep_thresholds) - set(
                GOPHER_REP_THRESHOLDS
            )
            if unknown:
                # config-layer error, not a batch-0 crash
                raise ValueError(
                    f"unknown gopher_rep threshold keys: {sorted(unknown)}"
                )
        self.gopher_rep = gopher_rep
        self.gopher_rep_thresholds = gopher_rep_thresholds
        self.gopher_rep_rejects_dir = gopher_rep_rejects_dir
        if dsir_model is not None:
            if not hasattr(dsir_model, "log_ratio"):
                raise TypeError(
                    "dsir_model must be a fitted operators/dsir DsirModel "
                    "(has .log_ratio) — fit with dsir_fit"
                )
            if dsir_threshold is None:
                # a DSIR gate with no threshold silently rejects nothing
                # — demand the deployment choose its cut
                raise ValueError(
                    "dsir_model requires dsir_threshold (the log-weight "
                    "cut; calibrate on a held-out slice's weight "
                    "distribution)"
                )
        self.dsir_model = dsir_model
        self.dsir_threshold = dsir_threshold
        self.dsir_rejects_dir = dsir_rejects_dir
        self.contam_gram_n = contam_gram_n
        self.contam_min_hits = contam_min_hits
        self.contam_dir = contam_dir
        self._eval_grams: DataFrame | None = None
        self._bloom = None
        if eval_docs is not None:
            from consume_kafka_avro_data_spark.functions.textops import (
                exploded_word_grams,
            )
            from consume_kafka_avro_data_spark.operators.bloom import (
                BroadcastBloom,
            )

            # one-time: distinct eval grams, checkpointed (probed every
            # batch — recomputing the explode per batch would rescan the
            # eval corpus), then the bloom compiled from them.  Bounded:
            # eval sets are fixed and small relative to the stream, and
            # BroadcastBloom.build enforces MAX_BITS.
            self._eval_grams = (
                exploded_word_grams(
                    eval_docs.select(F.col(text_col).alias("text")),
                    n=contam_gram_n,
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            self._bloom = BroadcastBloom.build(self._eval_grams, "g")
        elem = LongType() if hash_fn == "xxhash64" else StringType()
        self.id_type = id_type or LongType()
        self.store = ManifestTable(
            spark,
            os.path.join(store_dir, "signatures"),
            StructType(
                [
                    StructField("_id", self.id_type, True),
                    StructField("_sim", ArrayType(elem, True), True),
                ]
            ),
            keys=["_id"],
        )
        # persist the signature hyperparameters beside the store and
        # validate on reopen: the id_type guard protects the schema,
        # but reopening with different bands/rows/shingle_k/hash_fn
        # would recompute band keys and zip_with agreements against
        # arrays shaped by the OLD parameters — near-dups of stored
        # docs silently stop matching and merge as novel, permanently
        # un-deduping the corpus with no signal
        params = {
            "shingle_k": shingle_k,
            "bands": self.bands,
            "rows": self.rows,
            "hash_fn": hash_fn,
        }
        pf = os.path.join(store_dir, "_signature_params.json")
        io = self.store._io
        if io.is_file(pf):
            stored = json.loads(io.read_bytes(pf))
            if stored != params:
                raise ValueError(
                    f"signature store at {store_dir!r} was built with "
                    f"{stored}, but this ingest was configured with "
                    f"{params}; matching across mismatched signature "
                    "parameters silently finds nothing — reuse the "
                    "stored parameters or rebuild the store"
                )
        else:
            io.mkdirs(store_dir)
            io.write_bytes(pf + ".tmp", json.dumps(params).encode())
            io.rename_overwrite(pf + ".tmp", pf)
        self.metrics = self._new_metrics()
        self._seen_batches: set[int] = set()
        self.drift_monitor = drift_monitor
        self.sketch_monitor = sketch_monitor
        #: round-11 scale knob, from the census profile (the store
        #: band-join probe is ~56% of the dedup stage, itself the
        #: six-gate pipeline's wall-clock floor): build a bloom over
        #: THIS BATCH's band keys (small side — docs × bands entries)
        #: and prefilter the STORE's banded rows with it as a pure-JVM
        #: bit test in the scan stage — the q_decontaminate_bloom
        #: two-phase shape applied to the signature store.  Exact: a
        #: bloom has no false negatives, all rows of one bucket share
        #: one verdict (so surviving buckets' hot-counts stay exact),
        #: and false-positive buckets can't equi-join any probe key.
        #: What it buys at scale: the per-batch plan loses its two
        #: FULL-STORE SHUFFLES (the hot-bucket aggregate and the band
        #: join's store side both shrink to ~colliding buckets), so
        #: per-batch cost tracks collisions instead of corpus size.
        #: Default OFF, honestly: bench's ``store_bloom_ab`` row
        #: measured the bloom arm SLOWER at bench scale (9.3 → 7.0
        #: docs/s at 16-doc batches over a ≤ 500-row store — the
        #: per-batch build job costs more than the tiny shuffles it
        #: removes; the probe there is job-scheduling-bound, not
        #: data-bound).  Enable it when the store dwarfs the batch —
        #: the regime where the removed shuffles grow with the corpus
        #: and the build job stays batch-sized.
        self.store_bloom = store_bloom

    def _reset(self) -> None:
        # a monitor riding this ingest shares its run lifecycle: a new
        # run's batch ids restart at 0, and stale monitor state keyed
        # by the previous run's ids would blend two streams' drift
        super()._reset()
        if self.drift_monitor is not None:
            self.drift_monitor._reset()
        if self.sketch_monitor is not None:
            self.sketch_monitor._reset()

    def gate_census(self) -> dict:
        """Aggregated per-gate census over the retained batches, in
        pipeline order: ``{gate: {docs_in, docs_rejected, sec,
        batches}}`` — what a deployment tuning the gate family reads:
        which stage rejects what share of its input, and which stage
        is the wall-clock floor (the ``sec`` column is where the
        executor count gets sized).  Sums the replay-consistent
        per-batch rows (``DedupMetrics.gate_census_by_batch``), so it
        is exact over the retained horizon; disabled gates simply
        never appear.  The ``dedup`` row additionally carries ``sub``
        — summed sig/probe/merge splits (signature computation, store
        band-join probe + dup-map build, novel merge write) — so the
        stage the census names as the floor points at its own
        dominant component (round 11)."""
        out: dict = {}
        for rows in self.metrics.gate_census_by_batch.values():
            for e in rows:
                g = out.setdefault(
                    e["gate"],
                    {
                        "docs_in": 0,
                        "docs_rejected": 0,
                        "sec": 0.0,
                        "batches": 0,
                    },
                )
                g["docs_in"] += e["docs_in"]
                g["docs_rejected"] += e["docs_rejected"]
                g["sec"] = round(g["sec"] + e["sec"], 4)
                g["batches"] += 1
                if "sub" in e:  # dedup sub-stage splits (round 11)
                    sub = g.setdefault("sub", {})
                    for k, v in e["sub"].items():
                        sub[k] = round(sub.get(k, 0.0) + v, 4)
        return out

    # -- building blocks -----------------------------------------------------

    def _anti_by_id(self, batch: DataFrame, flagged: DataFrame) -> DataFrame:
        """NULL-SAFE anti-join on the id column — merge_new's NULLS NOT
        DISTINCT policy, applied at the gates: a NULL-id document that
        fails a gate must actually LEAVE the batch (plain EqualTo never
        matches NULL, so the rejected doc would be signed, merged, and
        double-counted in metrics.docs, breaking the
        rejected+contaminated+dup+novel == docs invariant)."""
        f = flagged.select(F.col(self.id_col).alias("_gate_id"))
        return batch.join(
            f,
            on=F.col(self.id_col).eqNullSafe(F.col("_gate_id")),
            how="left_anti",
        )

    def _banded(self, sigs: DataFrame) -> DataFrame:
        """(_id, _sim, _block) — band keys recomputed from signatures
        (codegen'd hashes over array slices; cheap relative to the
        signature pass, and what lets the store persist signatures
        only)."""
        _, bh = _minhash_agg_components(
            self.hash_fn, "_sim", self.bands, self.rows
        )
        return sigs.select("_id", "_sim", F.explode(bh).alias("_block"))

    def _agreement(self) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col("_sa"),
                F.col("_sb"),
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )

    def _matches(self, probe: DataFrame, target: DataFrame) -> DataFrame:
        """(dup_id, match_id, matches) for probe docs whose signature
        agrees with a target doc on ≥ min_matches components, meeting
        only through band-bucket collisions.  Self-pairs (same id) are
        excluded — on a post-crash replay the batch's own already-
        stored signatures must not count as duplicates.  Hot target
        buckets (> max_bucket_size members) are dropped, same contract
        as _bucket_candidate_pairs."""
        p = probe.select(
            F.col("_id").alias("dup_id"),
            F.col("_sim").alias("_sa"),
            "_block",
        )
        t = target.select(
            F.col("_id").alias("match_id"),
            F.col("_sim").alias("_sb"),
            "_block",
        )
        # hot-bucket guard as a WINDOW count over the same _block
        # partitioning the candidate join needs anyway (r12, guide
        # §2.4): the previous census subtree (groupBy _block + anti
        # join) planned its own aggregate exchange + join per probe;
        # the window count rides one _block exchange that the join
        # reuses.  Value-identical (same buckets dropped; _block is a
        # hash, never NULL) — routing bit-identical on the bench stream
        # and probe sub-stage ~12-19% faster in both interleaved A/B
        # rounds (27.9->22.6 s, 20.1->17.5 s on 16x1-file batches).
        from pyspark.sql import Window as _W

        t = (
            t.withColumn(
                "_bn", F.count(F.lit(1)).over(_W.partitionBy("_block"))
            )
            .where(F.col("_bn") <= self.max_bucket_size)
            .drop("_bn")
        )
        cand = (
            p.join(t, "_block")
            # NULL-SAFE self-exclusion: a plain != is NULL for any pair
            # involving a NULL id, which would silently drop (NULL, x)
            # candidates — NULL ids survive PERMISSIVE decode and the
            # store treats them as one identity (NULLS NOT DISTINCT),
            # so NULL-vs-NULL is correctly a self-pair here too
            .where(~F.col("dup_id").eqNullSafe(F.col("match_id")))
        )
        return (
            # agreement computed BEFORE the pair collapse, then ONE
            # narrow-key aggregate (MAX over collision instances).  In
            # this pipeline every (pair)'s instances carry identical
            # signatures — minhash_sig_table collapses same-id docs to
            # one row — so MAX aggregates equal values; it is still the
            # right fold because it stays deterministic AND monotone if
            # a future caller ever feeds non-collapsed inputs, and it
            # keeps the exchange keyed on ids, not signature arrays
            # (measured ~9% of batch time when arrays were the dedup
            # key).  The zip_with re-runs per band collision: 32
            # codegen'd comparisons, noise by comparison.
            cand.select(
                "dup_id", "match_id", self._agreement().alias("matches")
            )
            .groupBy("dup_id", "match_id")
            .agg(F.max("matches").alias("matches"))
            .where(F.col("matches") >= self.min_matches)
        )

    def _lm_scored(self, batch: DataFrame) -> DataFrame:
        """The LM gate's per-batch scoring frame — split out so tests
        can pin its PLAN: with ``lm_broadcast`` resolved on (the NgramKN
        auto default) every model-table join is a BroadcastHashJoin and
        the batch side reaches the per-doc aggregate without an
        Exchange — the map-only CCNet sweep shape, per micro-batch.
        With ``"dict"`` the plan has ZERO model joins: the payload
        collected at construction rides a broadcast variable into one
        ``mapInPandas`` pass (pinned value-identical to the relational
        scorer in tests/test_ngram_lm.py)."""
        if self.lm_broadcast == "dict":
            return self.lm_model.score_broadcast(
                batch.select(self.id_col, self.text_col),
                text_col=self.text_col,
                id_col=self.id_col,
                _local=self._lm_local,
            )
        kwargs = (
            {"broadcast_model": True} if self.lm_broadcast else {}
        )
        return self.lm_model.score(
            batch.select(self.id_col, self.text_col),
            text_col=self.text_col,
            id_col=self.id_col,
            **kwargs,
        )

    # -- per-micro-batch body ------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        got = batch.schema[self.id_col].dataType
        if got != self.id_type:
            raise TypeError(
                f"{self.id_col!r} is {got.simpleString()} but the signature "
                f"store was declared {self.id_type.simpleString()}; pass "
                "id_type= so the persisted schema matches the stream"
            )
        replayed = batch_id in self._seen_batches
        if self.drift_monitor is not None:
            # RAW batch, before any gate: drift is about what's
            # arriving; the monitor replaces its own counts on replay
            self.drift_monitor.process_batch(batch, batch_id)
        if self.sketch_monitor is not None:
            # same raw-batch / replace-on-replay contract
            self.sketch_monitor.process_batch(batch, batch_id)
        n_rejected = 0
        # per-gate census rows (round 10): (gate, docs_rejected, sec)
        # in PIPELINE order; docs_in per gate is reconstructed from the
        # survivor count by walking the chain backwards at the end of
        # the batch — zero extra count jobs
        _census: list[tuple[str, int, float]] = []
        _t_gate = time.perf_counter()
        c4_cleaned = None
        if self.c4:
            from consume_kafka_avro_data_spark.operators.text import c4_clean

            # line-clean FIRST (the published C4 order: line rules below
            # the doc gates) — map-only JVM, no shuffle added.  The
            # cleaned text REPLACES text_col for everything downstream:
            # gates, signatures, and the store all see boilerplate-
            # stripped content.  Checkpointed: three consumers (rejects
            # write, count, the surviving-batch split) would otherwise
            # re-run the expression pipeline per consumer, and every
            # later gate builds on the surviving slice.
            clash = {"n_lines", "n_lines_kept", "c4_keep"} & set(
                batch.columns
            )
            if clash:
                # c4_clean appends these columns; duplicated names would
                # make the downstream drop ambiguous — fail loudly
                raise ValueError(
                    f"c4 gate needs columns {sorted(clash)} free, but the "
                    "stream already carries them"
                )
            c4_cleaned = c4_clean(
                batch,
                text_col=self.text_col,
                min_line_words=self.c4_min_line_words,
                min_sentences=self.c4_min_sentences,
            ).localCheckpoint(eager=True)
            c4_rejects = c4_cleaned.where(~F.col("c4_keep")).select(
                self.id_col, "n_lines", "n_lines_kept"
            )
            if self.c4_rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    c4_rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.c4_rejects_dir)
                )
            n_c4_rejected = c4_rejects.count()
            n_rejected += n_c4_rejected
            # survivors carry the CLEANED text forward; the helper
            # columns stop here (downstream gates own their schemas)
            batch = c4_cleaned.where(F.col("c4_keep")).drop(
                "n_lines", "n_lines_kept", "c4_keep"
            )
            _census.append(
                ("c4", n_c4_rejected, time.perf_counter() - _t_gate)
            )
            _t_gate = time.perf_counter()
        rejects = None
        if self.quality_threshold is not None:
            from consume_kafka_avro_data_spark.operators.text import (
                quality_score,
            )

            scored = quality_score(
                batch.select(self.id_col, self.text_col), self.text_col
            )
            # checkpointed: up to three consumers (rejects write, count,
            # the gate anti-join) — and the cut keeps the feature
            # expressions from being re-evaluated per consumer
            rejects = (
                scored.where(F.col("quality") < self.quality_threshold)
                .select(self.id_col, "quality")
                .localCheckpoint(eager=True)
            )
            if self.rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as dupes)
                (
                    rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.rejects_dir)
                )
            # += not = : overwriting would silently drop the c4 gate's
            # count from rejected_docs whenever both gates are on
            # (round-10 sweep finding, pinned by the census-sums test)
            n_q_rejected = rejects.count()
            n_rejected += n_q_rejected
            if n_q_rejected:
                batch = self._anti_by_id(batch, rejects)
            _census.append(
                ("quality", n_q_rejected, time.perf_counter() - _t_gate)
            )
            _t_gate = time.perf_counter()
        model_rejects = None
        if self.quality_model is not None:
            from consume_kafka_avro_data_spark.operators.quality import (
                quality_probability,
            )

            scored_m = quality_probability(
                self.quality_model,
                batch.select(self.id_col, self.text_col),
                self.text_col,
            )
            # checkpointed for the same three consumers as the
            # heuristic gate (dir write, count, anti-join)
            model_rejects = (
                scored_m.where(
                    F.col("quality_prob") < self.quality_model_threshold
                )
                .select(self.id_col, "quality_prob")
                .localCheckpoint(eager=True)
            )
            if self.model_rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    model_rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.model_rejects_dir)
                )
            n_model_rejected = model_rejects.count()
            if n_model_rejected:
                batch = self._anti_by_id(batch, model_rejects)
            n_rejected += n_model_rejected
            _census.append(
                (
                    "quality_model",
                    n_model_rejected,
                    time.perf_counter() - _t_gate,
                )
            )
            _t_gate = time.perf_counter()
        rep_rejects = None
        if self.gopher_rep:
            from consume_kafka_avro_data_spark.operators.text import (
                GOPHER_REP_THRESHOLDS,
                gopher_repetition,
            )

            # published repetition removal on the JVM gates' survivors
            # — one Arrow map pass, no shuffle; audit rows carry every
            # metric so a rejection is explainable
            scored_rep = gopher_repetition(
                batch.select(self.id_col, self.text_col),
                text_col=self.text_col,
                thresholds=self.gopher_rep_thresholds,
            )
            rep_rejects = (
                scored_rep.where(~F.col("gopher_rep_keep"))
                .select(self.id_col, *GOPHER_REP_THRESHOLDS)
                .localCheckpoint(eager=True)  # dir write + count + anti-join
            )
            if self.gopher_rep_rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    rep_rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.gopher_rep_rejects_dir)
                )
            n_rep_rejected = rep_rejects.count()
            if n_rep_rejected:
                batch = self._anti_by_id(batch, rep_rejects)
            n_rejected += n_rep_rejected
            _census.append(
                (
                    "gopher_rep",
                    n_rep_rejected,
                    time.perf_counter() - _t_gate,
                )
            )
            _t_gate = time.perf_counter()
        dsir_rejects = None
        if self.dsir_model is not None:
            from consume_kafka_avro_data_spark.operators.dsir import (
                dsir_log_weights,
            )

            # distribution-matching cut on the classifier survivors —
            # map-only Arrow pass, no shuffle added to the batch plan
            scored_d = dsir_log_weights(
                self.dsir_model,
                batch.select(self.id_col, self.text_col),
                self.text_col,
            )
            dsir_rejects = (
                scored_d.where(F.col("dsir_logw") < self.dsir_threshold)
                .select(self.id_col, "dsir_logw")
                .localCheckpoint(eager=True)  # dir write + count + anti-join
            )
            if self.dsir_rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    dsir_rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.dsir_rejects_dir)
                )
            n_dsir_rejected = dsir_rejects.count()
            if n_dsir_rejected:
                batch = self._anti_by_id(batch, dsir_rejects)
            n_rejected += n_dsir_rejected
            _census.append(
                ("dsir", n_dsir_rejected, time.perf_counter() - _t_gate)
            )
            _t_gate = time.perf_counter()
        lm_rejects = None
        if self.lm_model is not None:
            # CCNet-style perplexity cut on the cheaper gates'
            # survivors; avg_nll NULL (doc shorter than the model
            # order) never exceeds the threshold, so shorts pass
            scored_lm = self._lm_scored(batch)
            # evidence-count column name differs per model generation
            # (NgramKN: n_ngrams; BigramKN: n_bigrams) — normalize so
            # the audit trail has ONE schema either way
            count_col = (
                "n_ngrams" if "n_ngrams" in scored_lm.columns else "n_bigrams"
            )
            lm_rejects = (
                scored_lm.where(F.col("avg_nll") > self.lm_threshold)
                .select(
                    self.id_col,
                    F.col(count_col).alias("n_ngrams"),
                    "avg_nll",
                )
                .localCheckpoint(eager=True)  # dir write + count + anti-join
            )
            if self.lm_rejects_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    lm_rejects.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.lm_rejects_dir)
                )
            n_lm_rejected = lm_rejects.count()
            if n_lm_rejected:
                batch = self._anti_by_id(batch, lm_rejects)
            n_rejected += n_lm_rejected
            _census.append(
                ("lm", n_lm_rejected, time.perf_counter() - _t_gate)
            )
            _t_gate = time.perf_counter()
        n_contam = 0
        contam = None
        if self._eval_grams is not None:
            from consume_kafka_avro_data_spark.functions.textops import (
                exploded_word_grams,
            )

            grams = exploded_word_grams(
                batch.select(self.id_col, F.col(self.text_col).alias("text")),
                self.id_col,
                n=self.contam_gram_n,
            )
            # bloom prefilter = pure-JVM bit tests in the scan stage
            # (prunes ~all clean grams); the exact broadcast verify
            # join makes the decision FP-free, same two-phase shape as
            # q_decontaminate_bloom
            # prefilter (not bare might_contain): ``g`` is a derived
            # column, and the fence keeps the probe predicate's 4k gram
            # references from each re-building it (operators/bloom r11)
            pre = self._bloom.prefilter(grams, "g")
            contam = (
                # broadcast justified: bounded eval gram set (see
                # __init__ — MAX_BITS-guarded, checkpointed once)
                pre.join(F.broadcast(self._eval_grams), "g")
                .groupBy(self.id_col)
                .agg(F.count_distinct("g").alias("eval_gram_hits"))
                .where(F.col("eval_gram_hits") >= self.contam_min_hits)
                .localCheckpoint(eager=True)  # dir write + count + anti-join
            )
            if self.contam_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as rejects)
                (
                    contam.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.contam_dir)
                )
            n_contam = contam.count()
            if n_contam:
                batch = self._anti_by_id(batch, contam)
            _census.append(
                ("decontaminate", n_contam, time.perf_counter() - _t_gate)
            )
            _t_gate = time.perf_counter()
        # sub-stage timers (round 11): the census showed the dedup
        # stage is ~48% of six-gate wall time — these split it into
        # signature computation / store band-join probe / merge_new
        # write so the next optimization aims at the real component
        _t_sub = time.perf_counter()
        sigs = minhash_sig_table(
            batch,
            self.id_col,
            self.text_col,
            self.shingle_k,
            self.bands,
            self.rows,
            self.hash_fn,
        ).localCheckpoint(eager=True)  # signed once; used by 3 consumers
        _sub_sig = time.perf_counter() - _t_sub
        dup_map = None
        try:
            _t_sub = time.perf_counter()
            banded = self._banded(sigs)
            # REPLAY DETERMINISM: probe the store MINUS this batch's own
            # ids.  After a post-merge crash the store already holds the
            # batch's novel docs; beyond the self-pair exclusion in
            # _matches, their presence could push a band bucket past
            # max_bucket_size on the retry, silently dropping matches
            # the first attempt found (a previously-detected duplicate
            # would re-route as novel and merge — permanent un-dedup).
            # Excluding the batch's ids restores the exact store view
            # the first attempt probed.  Null-safe, as everywhere ids
            # are compared; the anti side is batch-sized (broadcastable).
            bids = sigs.select(F.col("_id").alias("_bid"))
            store_df = self.store.read()
            store_rows = store_df.join(
                bids,
                on=F.col("_id").eqNullSafe(F.col("_bid")),
                how="left_anti",
            )
            n_docs = sigs.count()  # checkpointed; shared with metrics
            store_banded = self._banded(store_rows)
            if self.store_bloom:
                from consume_kafka_avro_data_spark.operators.bloom import (
                    MAX_BITS,
                    BroadcastBloom,
                )

                # sized from the batch's band-key count (docs × bands,
                # the build side); a batch too large for plan-literal
                # transport falls back to the unfiltered join rather
                # than refuse the micro-batch
                n_keys = n_docs * self.bands
                if 0 < n_keys * 16 <= MAX_BITS:
                    blk_bloom = BroadcastBloom.build(
                        banded.select("_block"),
                        "_block",
                        n_bits=max(128, 16 * n_keys),
                    )
                    store_banded = store_banded.where(
                        blk_bloom.might_contain("_block")
                    )
            vs_store = self._matches(banded, store_banded)
            # intra-batch canonical rule: a doc whose id is ALREADY
            # STORED is canonical regardless of id order (the exclusion
            # above removed its store copy from the probe target, so a
            # re-delivered stored doc must still win against a new
            # same-batch near-dup with a smaller id); between two
            # unstored (or two stored) docs the earlier id is
            # canonical, so the batch's first copy of a new document
            # stays novel and becomes the stored canonical
            # LAZY, referenced twice (dup-side and match-side flag
            # joins): the two subtree evaluations are parquet
            # _id-column scans inside the one dup_map job — measured
            # ~2% of batch time, while an eager checkpoint + emptiness
            # probe here costs two extra scheduled jobs per micro-batch
            # (~13% — the cure was worse than the disease)
            redelivered = store_df.select("_id").join(
                bids,
                on=F.col("_id").eqNullSafe(F.col("_bid")),
                how="left_semi",
            )
            # NULL-as-earliest id order: a plain > is NULL (→ dropped)
            # for any NULL-id pair, and the store collapses NULL ids to
            # one identity, so the NULL-id doc is the stored canonical
            # and a non-null near-dup must route as its dup
            d_id, m_id = F.col("dup_id"), F.col("match_id")
            later = (m_id.isNull() & d_id.isNotNull()) | (
                d_id.isNotNull() & m_id.isNotNull() & (d_id > m_id)
            )
            rd_d = redelivered.select(
                F.col("_id").alias("_d_id"), F.lit(True).alias("_ds")
            )
            rd_m = redelivered.select(
                F.col("_id").alias("_m_id"), F.lit(True).alias("_ms")
            )
            vb = (
                self._matches(banded, banded)
                .join(
                    rd_d,
                    on=F.col("dup_id").eqNullSafe(F.col("_d_id")),
                    how="left",
                )
                .join(
                    rd_m,
                    on=F.col("match_id").eqNullSafe(F.col("_m_id")),
                    how="left",
                )
            )
            ds = F.coalesce(F.col("_ds"), F.lit(False))
            ms = F.coalesce(F.col("_ms"), F.lit(False))
            vs_batch = vb.where(
                (ms & ~ds) | ((ds == ms) & later)
            ).select("dup_id", "match_id", "matches")
            # checkpointed like sigs: dup_map has up to three consumers
            # (dupes write, count, the novel anti-join feeding
            # merge_new) — uncached, each would re-run the store scan +
            # both LSH band joins, tripling the dominant per-batch cost.
            # ONE deterministic min over (notnull, match_id, matches):
            # the dupes_dir contract is that a replayed batch rewrites
            # IDENTICAL rows, so the witness choice must be
            # deterministic — and a bare MIN(match_id)/min_by both
            # NULL-SKIP, which would lose the NULL canonical's witness
            # row (and its agreement count) entirely; the notnull flag
            # sorts the NULL identity first, matching the
            # NULL-as-earliest order above.  In an intra-batch chain
            # (a<b<c, c matching only b) the recorded match_id is a
            # witness, not necessarily the stored canonical.
            dup_map = (
                vs_store.unionByName(vs_batch)
                .groupBy("dup_id")
                .agg(
                    F.min(
                        F.struct(
                            m_id.isNotNull().alias("_nn"),
                            m_id.alias("match_id"),
                            F.col("matches").alias("matches"),
                        )
                    ).alias("_w")
                )
                .select(
                    "dup_id",
                    F.col("_w.match_id").alias("match_id"),
                    F.col("_w.matches").alias("matches"),
                )
                .localCheckpoint(eager=True)
            )
            if self.dupes_dir:
                # partition by batch id + dynamic overwrite: a replayed
                # batch REPLACES its own rows (same contract as the
                # ingest DLQ) — the dup routing stays queryable state
                (
                    dup_map.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.dupes_dir)
                )
            n_dupes = dup_map.count()
            _sub_probe = time.perf_counter() - _t_sub
            _t_sub = time.perf_counter()
            # NULL-SAFE novel split: a USING-column left_anti never
            # matches NULL, so a NULL-id doc routed dup would stay in
            # `novel` and merge anyway — the one id comparison on this
            # path that wasn't null-safe
            novel = sigs.join(
                dup_map.select(F.col("dup_id").alias("_did")),
                on=F.col("_id").eqNullSafe(F.col("_did")),
                how="left_anti",
            )
            self.store.merge_new(novel)
            _sub_merge = time.perf_counter() - _t_sub
            _census.append(
                (
                    "dedup",
                    n_dupes,
                    time.perf_counter() - _t_gate,
                    {
                        "sig": round(_sub_sig, 4),
                        "probe": round(_sub_probe, 4),
                        "merge": round(_sub_merge, 4),
                    },
                )
            )
            if not replayed:
                self.metrics.batches += 1
                self.metrics.docs += n_docs + n_rejected + n_contam
                self.metrics.dup_docs += n_dupes
                self.metrics.novel_docs += n_docs - n_dupes
                self.metrics.rejected_docs += n_rejected
                self.metrics.contaminated_docs += n_contam
                self.metrics.dup_pairs_by_batch[batch_id] = n_dupes
                # per-gate census, docs_in reconstructed BACKWARDS from
                # the survivor count: each gate's input is its
                # successor's input plus what it rejected — exact
                # because every reject/dup row is removed before the
                # next stage, and free because every count above
                # already existed
                rows: list[dict] = []
                docs_in = n_docs  # dedup stage input = gate survivors
                for gate, n_rej, sec, *extra in reversed(_census):
                    # a reject gate's input includes what it rejected;
                    # dupes are ROUTED at the dedup stage, not removed
                    # from its input
                    if gate != "dedup":
                        docs_in += n_rej
                    row = {
                        "gate": gate,
                        "docs_in": docs_in,
                        "docs_rejected": n_rej,
                        "sec": round(sec, 4),
                    }
                    if extra:  # dedup carries sig/probe/merge splits
                        row["sub"] = extra[0]
                    rows.append(row)
                rows.reverse()
                self.metrics.gate_census_by_batch[batch_id] = rows
            # bounded replay guard (mixin-shared trim); the per-batch
            # dupe map prunes to the same horizon
            cutoff = self._mark_batch(batch_id)
            if cutoff is not None:
                for bid in [
                    b
                    for b in self.metrics.dup_pairs_by_batch
                    if b <= cutoff
                ]:
                    del self.metrics.dup_pairs_by_batch[bid]
                for bid in [
                    b
                    for b in self.metrics.gate_census_by_batch
                    if b <= cutoff
                ]:
                    del self.metrics.gate_census_by_batch[bid]
            # append-per-batch grows the store's file count linearly
            # (the small-file problem); periodic compaction is safe at
            # any point — it rewrites the same rows behind an atomic
            # manifest swap, so a crash or replay never observes a
            # partial store
            # gate on `not replayed`: batches does not advance on a
            # replay, so a batch retried while the modulus sits at 0
            # would otherwise rewrite the whole store once per retry
            if (
                not replayed
                and self.compact_every
                and self.metrics.batches % self.compact_every == 0
            ):
                self.store.compact()
        finally:
            # localCheckpoint blocks are freed with the DataFrame; make
            # the lineage cuts explicit about their lifetimes anyway —
            # a long-running processingTime stream must not accumulate
            # superseded batches' blocks until driver GC gets around to it
            sigs.unpersist()
            if dup_map is not None:
                dup_map.unpersist()
            if rejects is not None:
                rejects.unpersist()
            if model_rejects is not None:
                model_rejects.unpersist()
            if dsir_rejects is not None:
                dsir_rejects.unpersist()
            if lm_rejects is not None:
                lm_rejects.unpersist()
            if contam is not None:
                contam.unpersist()
            if c4_cleaned is not None:
                c4_cleaned.unpersist()
            if rep_rejects is not None:
                rep_rejects.unpersist()

