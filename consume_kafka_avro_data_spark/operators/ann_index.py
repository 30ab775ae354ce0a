"""AnnIndex — the persisted IVF-PQ index that turns the per-query ANN
operators into an operational build-once / query-many structure.

The per-query forms (``ivf_topk``, ``pq_adc_topk``) recompute cell
assignment and codes on every call — right for oracle-checked queries,
wrong for a deployed 100 TB index.  ``AnnIndex.build`` runs the two
map-only passes ONCE and writes the result as a parquet layout whose
physical shape carries the query-time pruning:

* rows partitioned by ``_ivf_cell`` → a probe's cell filter is a
  planning-time PartitionFilter (file skip, never a scan+filter);
* ``pq_codes`` stored alongside the float vector → the ADC path's scan
  reads ONLY (id, codes) (column pruning keeps the dim×4-byte floats
  on disk), while the exact path reads the vectors of probed cells
  only;
* centroids + codebooks (driver-sized: k·dim + dim·k floats at ANY
  corpus size) live in a JSON sidecar, so ``load`` needs no Spark job.

Meta/sidecar IO goes through :mod:`consume_kafka_avro_data_spark.fsio`
(POSIX for local paths, Hadoop FileSystem for ``file://``/``hdfs://``/
any configured scheme), so the index works wherever Spark can write the
parquet — the store URI, not the driver's local disk, decides.

Query = probe ``nprobe`` nearest cells → either exact rescore
(brute-force cosine over probed vectors, the high-recall path) or ADC
(broadcast m·k LUT joined against the codes, never touching a float) —
the standard IVF-Flat / IVF-PQ split.

All arithmetic stays on the q20 fixed-point grid (see
operators/similarity), so index contents are deterministic and the
exact path's results are bit-identical to the un-indexed operators on
the same probed subset.
"""

from __future__ import annotations

import json
import os
import time as _time

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.fsio import fs_for
from consume_kafka_avro_data_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    kmeans_centroids,
    kmeans_sample,
    multi_ivf_assign,
    opq_train,
    pq_adc_lut,
    pq_codebooks,
    pq_encode,
)

META = "_ann_meta.json"
VECTORS = "vectors"

#: The recall-tuned build preset (measured in bench.py's
#: ``ann_index.tuned`` row): IVF multiple assignment R=4 + 8-bit PQ +
#: converged quantizer lifts recall@10 from 0.40/0.48/0.56/0.84 to
#: 0.60/0.84/1.0/1.0 at nprobe 1/2/4/8 on the isotropic test corpus.
#: Costs: ×4 index rows (storage and probed bytes) and a slower build
#: (more Lloyd iterations + 256-row codebooks) — the trade a deployment
#: should start from when recall matters more than index size; see
#: SCALING.md.  Exposed as :meth:`AnnIndex.build_tuned`.
TUNED_BUILD_PARAMS: dict = {
    "replicas": 4,
    "k_codes": 256,
    "quantizer_iters": 15,
}


def _shard_commit_key(shard_id: str) -> tuple:
    """Natural-order key for shard ids: digit runs compare numerically
    ('b2' < 'b10'), so compact()'s newest-kept truncation of the
    replay no-op list follows COMMIT order for the numeric batch ids
    streaming ingest uses, not string order."""
    import re

    return tuple(
        (0, int(part), "") if part.isdigit() else (1, 0, part)
        for part in re.split(r"(\d+)", shard_id)
        if part
    )


class AnnIndex:
    """Persisted IVF-PQ index over an embedding corpus.

    Rebuild safety: each build writes its rows into a fresh generation
    directory (``vectors-<token>``) and the atomic META replace — which
    lists the live directories — is the ONLY commit point.  A crash
    anywhere before it leaves the previous generations fully live
    (readers load the old meta → the old directories); an in-place
    overwrite would instead let a crash pair new cell layouts with old
    centroids and return silently wrong neighbors.

    Incremental growth (100 TB corpora arrive in shards):
    :meth:`add_shard` reuses the FROZEN centroids/codebooks to assign +
    encode only the new vectors, writes them as one more generation
    directory, and appends it to the meta's live list — the corpus is
    never re-swept, the ``incremental_minhash_dedup`` pattern applied
    to ANN.  Queries read the union of live directories; each is
    partitioned by ``_ivf_cell``, so probe pruning still skips
    unprobed cells' files in every generation.

    GC grace period (TIME-based): a commit never deletes the
    directories it supersedes — they move to the meta's grace list
    stamped with the supersede time, and later commits only delete
    entries older than ``grace_seconds`` (default 1 h).  A commit-count
    grace would be wrong here: under StreamingAnnIngest the index
    commits every micro-batch, so "kept until the next commit" is
    seconds — shorter than a big concurrent scan.  Time bounds reader
    exposure independently of commit cadence.  (Single writer per
    index, like ManifestTable.)"""

    #: how long superseded generation directories survive before GC —
    #: must exceed the longest concurrent reader scan
    grace_seconds: float = 3600.0

    #: how many folded-away shard ids compact() remembers (newest kept).
    #: A replay of a remembered id is a safe no-op (its rows already
    #: live in the compacted generation); a replay DEEPER than this is
    #: indistinguishable from a new shard and would double-count — the
    #: bound must exceed the stream's replay horizon (foreachBatch
    #: replays only the last uncommitted batch; StreamingAnnIngest's
    #: metrics additionally refuse ancient replays loudly).
    max_compacted_shards: int = 4096

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        id_col: str,
        vec_col: str,
        vectors_dirs: list[str] | None = None,
        replicas: int = 1,
        rotation: np.ndarray | None = None,
        compacted_shards: list[str] | None = None,
        meta_cols: list[str] | None = None,
        meta_col_types: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self.codebooks = codebooks
        self.id_col = id_col
        self.vec_col = vec_col
        self.vectors_dirs = list(vectors_dirs or [VECTORS])
        #: IVF multiple-assignment factor: each vector lives in its
        #: `replicas` nearest cells (frozen at build, like the
        #: quantizers — add_shard must replicate identically or probe
        #: recall silently differs between old and new generations)
        self.replicas = int(replicas)
        #: optional OPQ rotation the codes were encoded under
        self.rotation = rotation
        #: shard ids folded into a compacted generation, newest last —
        #: an add_shard replay of one of these is a no-op (see
        #: ``max_compacted_shards``)
        self.compacted_shards: list[str] = list(compacted_shards or [])
        #: metadata columns carried on every index row (round 9) — the
        #: filtered-search surface: ``knn_join(where=)`` predicates can
        #: reference exactly these.  Frozen at build like the
        #: quantizers; add_shard must supply them.
        self.meta_cols: list[str] = list(meta_cols or [])
        #: Spark simpleString type per meta column, frozen at build —
        #: add_shard rejects a type-divergent shard EAGERLY (an int
        #: 'lang' against a string-built index would otherwise commit a
        #: generation whose failure surfaces far away, at compact()'s
        #: unionByName or at query time).  Empty for pre-round-10
        #: metas: those indexes validate by name only, as before.
        self.meta_col_types: dict[str, str] = dict(meta_col_types or {})
        # metadata IO backend resolved from the index URI (fsio): POSIX
        # for local paths, Hadoop FileSystem for file://-and-beyond
        self._io = fs_for(spark, path)

    # -- build / load --------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        n_cells: int = 16,
        m: int = 8,
        k_codes: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
        grace_seconds: float | None = None,
        replicas: int = 1,
        opq_sweeps: int = 0,
        quantizer_iters: int = 5,
        quantizer_init: str = "random",
        meta_cols: list[str] | None = None,
    ) -> "AnnIndex":
        """Train (driver-sized sample) → assign + encode (two map-only
        Arrow passes) → write a fresh generation directory → atomically
        commit it via the META replace.  The corpus is read twice and
        never shuffled; the only driver traffic is the centroid/codebook
        matrices.  Superseded directories enter the timestamped grace
        list (class docstring); only grace-EXPIRED entries and crash
        orphans are deleted here.

        Recall knobs (all frozen into the meta so load/add_shard reuse
        them; measured in bench.py's ``ann_index.tuned`` row):

        * ``replicas`` — IVF multiple assignment: index each vector in
          its R nearest cells.  THE low-nprobe recall lever on corpora
          whose neighbors straddle cell boundaries (measured here:
          nprobe1 recall 0.40 → 0.64 at R=4); costs ×R index rows.
        * ``opq_sweeps`` — >0 trains an OPQ rotation (Ge et al. 2013)
          on the codebook sample to cut ADC quantization loss.  Helps
          anisotropic corpora; measured no-op on isotropic ones.
        * ``k_codes=256`` (8-bit PQ, the standard) materially cuts ADC
          loss vs the compact default 16.
        * ``quantizer_iters`` / ``quantizer_init="kmeanspp"`` — Lloyd's
          convergence knobs; measured near-no-op on the synthetic
          corpus (the quantizer was already at the partition ceiling)
          but cheap insurance on clustered data.

        ``meta_cols`` (round 9) carries the named corpus columns onto
        every index row — the FILTERED-search surface: a
        ``knn_join(where=F.col("lang") == "en")`` predicate can
        reference exactly these, and it is applied INSIDE the
        probed-cell scan (parquet PushedFilters under the cell
        partition pruning), never as a post-filter that would return
        fewer than k survivors.  Frozen into the meta like the
        quantizers; every ``add_shard`` must supply the same columns."""
        if grace_seconds is None:
            grace_seconds = cls.grace_seconds
        meta_cols = list(meta_cols or [])
        reserved = {id_col, vec_col, "pq_codes", "_ivf_cell"}
        bad = [c for c in meta_cols if c in reserved or c not in corpus.columns]
        if bad:
            raise ValueError(
                f"meta_cols {bad} must be existing corpus columns distinct "
                f"from {sorted(reserved)}"
            )
        # freeze the meta columns' TYPES alongside their names — the
        # add_shard eager-rejection contract (see __init__)
        meta_col_types = {
            c: corpus.schema[c].dataType.simpleString() for c in meta_cols
        }
        io = fs_for(spark, path)
        centroids = kmeans_centroids(
            corpus,
            k=n_cells,
            iters=quantizer_iters,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            init=quantizer_init,
        )
        rotation = None
        if opq_sweeps > 0:
            sample = kmeans_sample(corpus, id_col=id_col, vec_col=vec_col)
            rotation, codebooks = opq_train(
                sample, m=m, k=k_codes, sweeps=opq_sweeps, seed=seed
            )
        else:
            codebooks = pq_codebooks(
                corpus, m=m, k=k_codes, id_col=id_col, vec_col=vec_col, seed=seed
            )
        assigned = cls._assign(corpus, centroids, vec_col, replicas)
        rows = pq_encode(
            assigned,
            codebooks,
            id_col,
            vec_col,
            keep_cols=[vec_col, "_ivf_cell", *meta_cols],
            rotation=rotation,
        )
        doc = cls._read_meta_doc(io, path)
        gen = cls._write_generation(rows, path)
        now = _time.time()
        grace = cls._grace_surviving(doc["superseded"], now, grace_seconds)
        grace += [{"dir": d, "at": now} for d in doc["live"]]
        meta = {
            "id_col": id_col,
            "vec_col": vec_col,
            "vectors_dirs": [gen],
            "superseded": grace,
            "shards": {},  # rebuild re-indexes everything: ids reset
            "compacted_shards": [],  # ditto
            "centroids": centroids.tolist(),
            "codebooks": codebooks.tolist(),
            "replicas": int(replicas),
            "opq_rotation": None if rotation is None else rotation.tolist(),
            # persisted: the grace window is a property of the INDEX
            # (sized to its longest reader scan), not of whichever
            # process happens to open it — a later load() + add_shard
            # must not revert to the class default and prune dirs a
            # still-running long scan references
            "grace_seconds": grace_seconds,
            "meta_cols": meta_cols,
            "meta_col_types": meta_col_types,
        }
        cls._commit_meta(io, path, meta)  # the ONLY commit point
        # GC everything the committed meta does not reference: grace-
        # expired dirs AND orphans from crashed builds/add_shards
        # (written but never committed — without this sweep a
        # crash-retry loop leaks a corpus-sized directory per attempt)
        cls._gc_unreferenced(
            io, path, keep={gen, *(e["dir"] for e in grace)}
        )
        idx = cls(
            spark, path, centroids, codebooks, id_col, vec_col,
            vectors_dirs=[gen], replicas=replicas, rotation=rotation,
            meta_cols=meta_cols, meta_col_types=meta_col_types,
        )
        idx.grace_seconds = grace_seconds
        return idx

    @classmethod
    def build_tuned(cls, spark, corpus, path, **overrides) -> "AnnIndex":
        """:meth:`build` with the measured recall preset
        (:data:`TUNED_BUILD_PARAMS`) pre-applied — so a deployment gets
        the bench's tuned recall curve without rediscovering the knobs.
        Any explicit keyword overrides the preset.  The oracled queries
        stay on the default deterministic build; this preset is the
        serving-path recommendation."""
        return cls.build(spark, corpus, path, **{**TUNED_BUILD_PARAMS, **overrides})

    @staticmethod
    def _assign(
        corpus: DataFrame, centroids: np.ndarray, vec_col: str, replicas: int
    ) -> DataFrame:
        """Cell assignment honoring the index's multiple-assignment
        factor — ``replicas=1`` stays on the single-assign fast path
        (identical output; multi_ivf_assign's rank-0 is pinned to
        ivf_assign's argmax by a pytest)."""
        if replicas <= 1:
            return ivf_assign(corpus, centroids, vec_col)
        return multi_ivf_assign(corpus, centroids, replicas, vec_col)

    def add_shard(
        self, shard: DataFrame, shard_id: str | None = None
    ) -> "AnnIndex":
        """Incrementally index a new shard of vectors against the
        FROZEN centroids/codebooks: assign + encode only the shard
        (two map-only Arrow passes over the new rows — the existing
        corpus is untouched), write it as one more generation
        directory, and atomically append it to the meta's live list.
        The quantizers do not move, so existing cells/codes stay valid
        and a query sees old + new vectors identically to a full
        rebuild over the union (exactly equal for ``query_exact`` with
        the same centroids; a full REBUILD would retrain quantizers on
        the grown corpus — do that periodically if cell balance
        drifts, this method is the cheap between-rebuilds path).
        Caller contract: shard ids are new (the index does not dedup
        across generations).

        ``shard_id`` makes the call IDEMPOTENT per id: a shard
        committed under the same id is atomically REPLACED (its old
        directory moves to the timestamped grace list) instead of
        double-counted — what a streaming foreachBatch replay needs
        (streaming/ann.StreamingAnnIngest passes the batch id).  Only
        grace-EXPIRED entries and crash orphans are deleted here —
        never directories a concurrent reader could still be scanning
        (class docstring).  ``last_shard_rows`` is set from the written
        generation's parquet footers (driver-side metadata, no extra
        scan)."""
        if shard_id is not None and shard_id in self.compacted_shards:
            # replay of a shard already FOLDED into a compacted
            # generation: its rows are in the index (inside the merged
            # directory, no longer separable) and foreachBatch replays
            # carry the same data — committing it again would
            # double-count, so the replay is a no-op
            self.last_shard_cell_counts = {}
            self.last_shard_rows = 0
            return self
        missing = [c for c in self.meta_cols if c not in shard.columns]
        if missing:
            raise ValueError(
                f"index was built with meta_cols={self.meta_cols}; the "
                f"shard is missing {missing} — filtered search reads "
                "these from every generation, so every shard must "
                "carry them"
            )
        # name is not enough: a shard carrying e.g. an int 'lang' where
        # the index froze a string would COMMIT a type-divergent
        # generation whose failure surfaces far from the cause (at
        # compact()'s unionByName, or as silently-empty filter results
        # at query time) — reject it here, before anything is written.
        # Empty dict = pre-round-10 meta (types were not persisted):
        # validate by name only, as those indexes always did.
        divergent = {
            c: (shard.schema[c].dataType.simpleString(), want)
            for c in self.meta_cols
            if (want := self.meta_col_types.get(c)) is not None
            and shard.schema[c].dataType.simpleString() != want
        }
        if divergent:
            raise TypeError(
                "shard meta-column types diverge from the built index: "
                + ", ".join(
                    f"{c} is {got} but the index was built with {want}"
                    for c, (got, want) in divergent.items()
                )
                + " — cast the shard columns to the built types (the "
                "filtered-search scan unions every generation by name "
                "and type)"
            )
        assigned = self._assign(
            shard.select(self.id_col, self.vec_col, *self.meta_cols),
            self.centroids,
            self.vec_col,
            self.replicas,
        )
        rows = pq_encode(
            assigned,
            self.codebooks,
            self.id_col,
            self.vec_col,
            keep_cols=[self.vec_col, "_ivf_cell", *self.meta_cols],
            rotation=self.rotation,
        )
        doc = self._read_meta_doc(self._io, self.path)
        live, shards = doc["live"], doc["shards"]
        gen = self._write_generation(rows, self.path)
        # per-cell footer counts double as the DRIFT input: streaming/
        # ann.AnnIngestMetrics accumulates them to decide when the
        # frozen quantizers need retraining (needs_rebuild)
        self.last_shard_cell_counts = self._dir_cell_counts(
            self._io, os.path.join(self.path, gen)
        )
        self.last_shard_rows = sum(self.last_shard_cell_counts.values())
        now = _time.time()
        grace = self._grace_surviving(
            doc["superseded"], now, self.grace_seconds
        )
        if self.last_shard_rows == 0:
            # an empty shard encodes to a FILELESS generation (an empty
            # partitionBy write leaves no parquet footers): committing
            # it would break every later read's schema inference and
            # make the tiered streaming schedule carry a rowless live
            # dir until some fold retires it.  Refuse the commit:
            # record the shard id as already-folded (zero rows are
            # trivially represented in the index, so a replay must
            # no-op) and let the gc remove the fileless directory.
            folded = list(self.compacted_shards)
            if shard_id is not None:
                old_dir = shards.pop(shard_id, None)
                if old_dir is not None:  # replace: retire the old commit
                    live = [d for d in live if d != old_dir]
                    grace.append({"dir": old_dir, "at": now})
                # same commit-order sort + newest-kept bound as
                # compact()'s fold bookkeeping ('b10' must not evict
                # before 'b2')
                folded = sorted(
                    set(folded) | {shard_id}, key=_shard_commit_key
                )[-self.max_compacted_shards :]
            meta = {
                "id_col": self.id_col,
                "vec_col": self.vec_col,
                "vectors_dirs": live,
                "superseded": grace,
                "shards": shards,
                "compacted_shards": folded,
                "centroids": self.centroids.tolist(),
                "codebooks": self.codebooks.tolist(),
                "replicas": self.replicas,
                "opq_rotation": (
                    None if self.rotation is None else self.rotation.tolist()
                ),
                "grace_seconds": self.grace_seconds,
                "meta_cols": self.meta_cols,
                "meta_col_types": self.meta_col_types,
            }
            self._commit_meta(self._io, self.path, meta)
            self._gc_unreferenced(  # sweeps the fileless gen too
                self._io, self.path, keep={*live, *(e["dir"] for e in grace)}
            )
            self.compacted_shards = folded
            self.vectors_dirs = live
            return self
        if shard_id is not None:
            old_dir = shards.get(shard_id)
            if old_dir is not None:  # replay: replace, don't double-count
                live = [d for d in live if d != old_dir]
                grace.append({"dir": old_dir, "at": now})
            shards[shard_id] = gen
        meta = {
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "vectors_dirs": live + [gen],
            "superseded": grace,
            "shards": shards,
            "compacted_shards": self.compacted_shards,
            "centroids": self.centroids.tolist(),
            "codebooks": self.codebooks.tolist(),
            "replicas": self.replicas,
            "opq_rotation": (
                None if self.rotation is None else self.rotation.tolist()
            ),
            "grace_seconds": self.grace_seconds,  # see build()
            "meta_cols": self.meta_cols,
            "meta_col_types": self.meta_col_types,
        }
        self._commit_meta(self._io, self.path, meta)
        # sweep grace-EXPIRED dirs + crash orphans only
        self._gc_unreferenced(
            self._io, self.path, keep={gen, *live, *(e["dir"] for e in grace)}
        )
        self.vectors_dirs = live + [gen]
        return self

    def compact(
        self,
        target_rows_per_file: int = 4_000_000,
        dirs: list[str] | None = None,
    ) -> dict:
        """Merge live generation directories into ONE — the
        small-file fix for append-per-micro-batch ingest, same rationale
        as ``ManifestTable.compact``: one directory (and up to n_cells ×
        ceil(rows/target) files) per index instead of one directory per
        committed batch, whose per-file open/footer overhead degrades
        every probe scan as the stream runs (measured in bench.py's
        ``ann_ingest.compaction_ab`` row).

        ``dirs`` (round 10) restricts the merge to a SUBSET of the
        live generations — the size-tiered primitive: a streaming
        ingest can fold its accumulating small per-batch generations
        into one tier directory WITHOUT re-reading and re-writing the
        (much larger) base generation every time, which is what makes
        the eager every-N full merge pay O(corpus) per trigger
        (``StreamingAnnIngest compact_policy="tiered"``).  Shard ids
        whose generation is OUTSIDE the subset keep their replay
        REPLACE semantics (their directory is still individually
        addressable); only the folded subset's ids move to
        ``compacted_shards``.  ``dirs=None`` = all live (the round-9
        behavior, unchanged).

        Atomic like every other commit here: the merged generation is
        written FIRST, the META replace is the only commit point, and
        the superseded directories enter the timestamped grace list so
        concurrent readers holding the old meta finish their scans.

        Replay safety: the folded shard ids move from ``shards`` to
        ``compacted_shards`` (bounded, newest-kept —
        ``max_compacted_shards``); an ``add_shard`` replay of one of
        them becomes a no-op instead of a double-count.  Returns
        ``{"dirs_before", "dirs_after", "rows"}`` plus ``merged_dir``
        when a generation was written; fewer than two live directories
        is a no-op (nothing to merge), and an all-empty merge set
        retires its dirs without writing one (``rows`` 0, no
        ``merged_dir``).

        Single-writer contract (class docstring) applies WITHIN one
        index across methods too: compact() and add_shard() both
        read-modify-write the meta with no CAS, so running them
        concurrently can silently drop the other's generation entry —
        serialize them (StreamingAnnIngest does: compaction runs
        inline in its foreachBatch, never beside it)."""
        doc = self._read_meta_doc(self._io, self.path)
        live, shards = doc["live"], doc["shards"]
        if dirs is None:
            merge = list(live)
        else:
            merge = list(dict.fromkeys(dirs))  # de-dup, keep order
            unknown = [d for d in merge if d not in live]
            if unknown:
                raise ValueError(
                    f"dirs {unknown} are not live generations of this "
                    f"index (live: {live}) — a retired or foreign "
                    "directory must never be re-committed"
                )
        if len(merge) <= 1:
            return {
                "dirs_before": len(live),
                "dirs_after": len(live),
                "rows": None,
            }
        merge_set = set(merge)
        # row counts from parquet FOOTERS (driver-side metadata) — a
        # count() job would scan the very files this merge exists to
        # clean up.  Counted PER DIR: zero-row generations (legacy
        # indexes written before add_shard refused empty commits) are
        # FILELESS — partitionBy of an empty frame leaves no parquet
        # footers — so reading one would fail schema inference.  They
        # are excluded from the merged READ below but still RETIRE
        # like any other folded dir (they hold no rows, so grace +
        # compacted-shard bookkeeping is exactly the usual fold); an
        # all-empty merge therefore writes no generation at all but
        # still removes the dirs from the live list, which is what
        # lets the tiered schedule stop re-counting them every batch
        # (r10 advisor).
        dir_rows = {
            d: sum(
                self._dir_cell_counts(
                    self._io, os.path.join(self.path, d)
                ).values()
            )
            for d in merge
        }
        n_rows = sum(dir_rows.values())
        nonempty = [d for d in merge if dir_rows[d] > 0]
        n_files = max(1, -(-n_rows // target_rows_per_file))  # ceil
        # hash-cluster by cell into ~n_files tasks: each task writes one
        # file per cell it holds, so the merged generation lands near
        # the size target while partitionBy keeps the per-cell pruning
        # layout.  (A single hot cell stays one task per hash bucket —
        # at 100 TB raise target granularity via more files, the same
        # trade ManifestTable.compact makes.)
        # Read from the META's live list, not self.vectors_dirs: the
        # grace/GC bookkeeping below is keyed to the committed doc, and
        # the two must name the same directories or a divergent handle
        # would merge one set while retiring another.
        from functools import reduce

        gen = None
        if nonempty:
            rows = reduce(
                DataFrame.unionByName,
                [
                    self.spark.read.parquet(os.path.join(self.path, d))
                    for d in nonempty
                ],
            ).repartition(n_files, F.col("_ivf_cell"))
            gen = self._write_generation(rows, self.path)
        now = _time.time()
        grace = self._grace_surviving(
            doc["superseded"], now, self.grace_seconds
        )
        grace += [{"dir": d, "at": now} for d in merge]
        # commit-order sort, NOT lexicographic: shard ids are usually
        # numeric batch ids, and 'b10' < 'b2' string-sorting would let
        # the newest-kept truncation below evict numerically NEWER ids
        # first, shrinking the replay no-op window out of order.  The
        # INHERITED list is re-sorted too (a meta written by an older
        # lexicographic version keeps a misordered tail otherwise) —
        # batch ids are monotone per stream, so natural order IS commit
        # order across the union
        folded = sorted(
            set(doc["compacted_shards"])
            | {s for s, d in shards.items() if d in merge_set},
            key=_shard_commit_key,
        )
        folded = folded[-self.max_compacted_shards :]
        # shard ids whose generation survives this merge keep their
        # individually-addressable REPLACE semantics
        kept_shards = {s: d for s, d in shards.items() if d not in merge_set}
        live_after = [d for d in live if d not in merge_set] + (
            [gen] if gen is not None else []
        )
        meta = {
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "vectors_dirs": live_after,
            "superseded": grace,
            "shards": kept_shards,
            "compacted_shards": folded,
            "centroids": self.centroids.tolist(),
            "codebooks": self.codebooks.tolist(),
            "replicas": self.replicas,
            "opq_rotation": (
                None if self.rotation is None else self.rotation.tolist()
            ),
            "grace_seconds": self.grace_seconds,
            "meta_cols": self.meta_cols,
            "meta_col_types": self.meta_col_types,
        }
        self._commit_meta(self._io, self.path, meta)
        self._gc_unreferenced(
            self._io,
            self.path,
            keep={*live_after, *(e["dir"] for e in grace)},
        )
        self.vectors_dirs = live_after
        self.compacted_shards = folded
        out = {
            "dirs_before": len(live),
            "dirs_after": len(live_after),
            "rows": n_rows,
        }
        if gen is not None:  # all-empty merges retire dirs, write nothing
            out["merged_dir"] = gen
        return out

    # -- meta / generation plumbing -----------------------------------------

    @staticmethod
    def _read_meta_doc(io, path: str, meta: dict | None = None) -> dict:
        """{live, superseded, shards} from the current meta (defaults
        for a fresh index; legacy single-``vectors_dir`` metas read as
        a one-element live list).  ``superseded`` entries normalize to
        ``{"dir", "at"}`` — legacy bare strings get stamped NOW, so a
        meta written before timestamped grace earns one fresh window
        rather than being deleted immediately.  Pass an already-parsed
        ``meta`` to skip the sidecar read (load() reads it once for
        centroids/codebooks and must not pay a second remote-FS
        round-trip for the same bytes)."""
        if meta is None:
            mf = os.path.join(path, META)
            if not io.is_file(mf):
                return {"live": [], "superseded": [], "shards": {}}
            meta = json.loads(io.read_bytes(mf))
        live = meta.get("vectors_dirs") or [meta.get("vectors_dir", VECTORS)]
        now = _time.time()
        superseded = [
            e if isinstance(e, dict) else {"dir": e, "at": now}
            for e in meta.get("superseded", [])
        ]
        return {
            "live": list(live),
            "superseded": superseded,
            "shards": dict(meta.get("shards", {})),
            "compacted_shards": list(meta.get("compacted_shards", [])),
        }

    @staticmethod
    def _grace_surviving(
        entries: list[dict], now: float, grace_seconds: float
    ) -> list[dict]:
        """Grace entries still inside their window (the rest may be
        deleted by this commit's sweep)."""
        return [e for e in entries if now - e["at"] <= grace_seconds]

    @staticmethod
    def _dir_cell_counts(io, path_dir: str) -> dict[int, int]:
        """Per-cell row counts of a written generation from parquet
        FOOTERS — driver-side metadata, never a Spark scan.  The cell
        id comes from the ``_ivf_cell=N`` partition directory each file
        sits under (the generation is partitionBy-written)."""
        import re

        counts: dict[int, int] = {}
        for fpath in io.walk_parquet(path_dir):
            m = re.search(r"_ivf_cell=(\d+)/", fpath)
            cell = int(m.group(1)) if m else -1
            counts[cell] = counts.get(cell, 0) + io.parquet_num_rows(fpath)
        return counts

    @staticmethod
    def _gc_unreferenced(io, path: str, keep: set[str]) -> None:
        """Delete every ``vectors-*`` directory the committed meta does
        not reference (``keep`` = live ∪ still-in-grace).  Safe under
        the single-writer contract: an unreferenced directory can only
        be grace-expired or an uncommitted crash leftover."""
        for name in io.list_names(path):
            if name.startswith(VECTORS) and name not in keep:
                io.delete(os.path.join(path, name), recursive=True)

    @staticmethod
    def _write_generation(rows: DataFrame, path: str) -> str:
        import uuid

        gen = f"{VECTORS}-{uuid.uuid4().hex[:8]}"
        (
            rows.write.partitionBy("_ivf_cell")
            .mode("overwrite")
            .parquet(os.path.join(path, gen))
        )
        return gen

    @staticmethod
    def _commit_meta(io, path: str, meta: dict) -> None:
        tmp = os.path.join(path, META + ".tmp")
        io.write_bytes(tmp, json.dumps(meta).encode())
        io.rename_overwrite(tmp, os.path.join(path, META))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "AnnIndex":
        io = fs_for(spark, path)
        meta = json.loads(io.read_bytes(os.path.join(path, META)))
        # the live-dirs (and legacy-layout) parsing lives ONLY in
        # _read_meta_doc — a second hand-rolled copy here drifted once;
        # the parsed meta is passed through so the sidecar is read once
        doc = cls._read_meta_doc(io, path, meta=meta)
        rot = meta.get("opq_rotation")
        idx = cls(
            spark,
            path,
            np.asarray(meta["centroids"], dtype=np.float64),
            np.asarray(meta["codebooks"], dtype=np.float64),
            meta["id_col"],
            meta["vec_col"],
            vectors_dirs=doc["live"],
            # legacy metas (pre-replication) are single-assignment
            replicas=int(meta.get("replicas", 1)),
            rotation=None if rot is None else np.asarray(rot, dtype=np.float64),
            compacted_shards=doc["compacted_shards"],
            # legacy metas (pre-filtered-search) carry no meta columns;
            # pre-round-10 metas carry names but no types (name-only
            # shard validation, as before)
            meta_cols=meta.get("meta_cols") or [],
            meta_col_types=meta.get("meta_col_types") or {},
        )
        # restore the persisted grace window (legacy metas without the
        # field keep the class default)
        idx.grace_seconds = float(
            meta.get("grace_seconds", cls.grace_seconds)
        )
        return idx

    # -- query ---------------------------------------------------------------

    def _vectors(self) -> DataFrame:
        """Union of the live generation directories — one scan each
        (a multi-path read of separately-partitioned roots trips
        CONFLICTING_DIRECTORY_STRUCTURES), unioned by name.  A cell
        filter pushes through the union into every scan's
        PartitionFilters, so probes still prune per generation."""
        from functools import reduce

        dfs = [
            self.spark.read.parquet(os.path.join(self.path, d))
            for d in self.vectors_dirs
        ]
        return reduce(DataFrame.unionByName, dfs)

    def vectors(self) -> DataFrame:
        """Public accessor for the live generations' rows (id, codes,
        cell, vector) — the engine SQL views register this as
        ``ann_vectors``; cell filters still prune per generation."""
        return self._vectors()

    def resolve_nprobe(self, nprobe: int, where: Column | None) -> int:
        """Selectivity-aware probe escalation (round 11) for filtered
        batch search — the fix for the round-10 recorded finding that
        filtered recall quietly decays as predicates get selective
        (nprobe=4 recall@10 fell to ~0.78 at 1/25 selectivity on the
        tuned preset: per-cell survivor sets thin out, so a fixed
        probe width sees ever fewer filtered candidates).

        Estimates the predicate's survivor fraction ``s = kept/total``
        — ``total`` from the live generations' parquet FOOTERS
        (driver-side metadata, no job), ``kept`` with ONE filtered
        count whose scan reads only the predicate's meta columns
        (column pruning; at 100 TB that is a metadata-sized column
        sweep, amortized over the whole query batch this call serves)
        — and returns ``min(n_cells, ceil(nprobe / s))``: the
        smallest probe width whose EXPECTED filtered candidate pool
        per query matches the unfiltered pool at the base ``nprobe``
        ((nprobe'/n_cells)·total·s ≥ (nprobe/n_cells)·total ⇔
        nprobe' ≥ nprobe/s).  ``where=None`` and an empty index return
        ``nprobe`` unchanged; a predicate NOTHING survives returns
        ``n_cells`` (probe everything, honestly return empty).
        Callers pass ``auto_nprobe=True`` to :meth:`knn_join` /
        :meth:`knn_join_adc` instead of calling this directly."""
        if where is None:
            return nprobe
        n_cells = len(self.centroids)
        total = sum(
            sum(
                self._dir_cell_counts(
                    self._io, os.path.join(self.path, d)
                ).values()
            )
            for d in self.vectors_dirs
        )
        if total == 0:
            return nprobe
        kept = self._vectors().where(where).count()
        if kept == 0:
            return n_cells
        import math

        return min(n_cells, math.ceil(nprobe * total / kept))

    def _probe(
        self, query_vec, nprobe: int, where: Column | None = None
    ) -> DataFrame:
        """Rows of the ``nprobe`` cells nearest the query — the cell
        filter hits the partition column, so unprobed cells' files are
        skipped at planning time; an optional ``where`` predicate over
        the index's ``meta_cols`` rides the SAME scan (parquet
        PushedFilters beneath the partition pruning).

        Cell ranking uses the SAME q20-quantized dots + stable argsort
        as ``multi_ivf_assign`` (dot ranking is query-scale-invariant,
        so skipping normalization changes nothing): the per-query and
        batch paths (``knn_join``/``knn_join_adc``) must pick identical
        probe sets or their pinned per-query equality would flake on
        centroid near-ties."""
        from consume_kafka_avro_data_spark.operators.similarity import (
            quantize_np,
        )

        q = quantize_np(np.asarray(query_vec, dtype=np.float64))
        scores = quantize_np(self.centroids) @ q
        order = np.argsort(-scores, kind="stable")[:nprobe]
        cells = [int(c) + 1 for c in order]  # 1-based, as ivf_assign
        probed = self._vectors().where(F.col("_ivf_cell").isin(cells))
        return probed if where is None else probed.where(where)

    def query_exact(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 4,
        where: Column | None = None,
        auto_nprobe: bool = False,
    ) -> DataFrame:
        """IVF-Flat: exact cosine rescore over the probed cells' float
        vectors (reads vectors for ~nprobe/n_cells of the corpus).
        ``where`` filters candidates inside the probed scan — k
        survivors of the filtered corpus, the :meth:`knn_join`
        contract per query.  ``auto_nprobe`` escalates the probe width
        with the filter's measured selectivity (:meth:`resolve_nprobe`)
        — per-query the count job is NOT amortized the way the batch
        paths amortize it, so prefer :meth:`knn_join` for query sets."""
        if auto_nprobe:
            nprobe = self.resolve_nprobe(nprobe, where)
        probed = self._probe(query_vec, nprobe, where=where).select(
            self.id_col, self.vec_col
        )
        return self._dedup_topk(probed, query_vec, k)

    def _dedup_topk(self, cand: DataFrame, query_vec, k: int) -> DataFrame:
        """Exact cosine top-k over candidate rows that may contain up to
        ``replicas`` IDENTICAL copies of an id (multiple assignment puts
        a vector in R cells; a probe can hit several of them).  Dedupe
        AFTER the top-(k·R) cut, not before: copies tie on (score, id),
        so the k·R ordered rows provably contain the k distinct leaders,
        and the dedupe shuffles k·R rows instead of the whole candidate
        set (which is ~nprobe·R/n_cells of the corpus at scale)."""
        if self.replicas <= 1:
            return brute_force_topk(
                cand, query_vec, k, self.id_col, self.vec_col
            )
        wide = brute_force_topk(
            cand, query_vec, k * self.replicas, self.id_col, self.vec_col
        )
        return (
            wide.dropDuplicates([self.id_col])
            .orderBy(F.desc("score"), F.asc(self.id_col))
            .limit(k)
        )

    def query_adc(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 4,
        where: Column | None = None,
        auto_nprobe: bool = False,
    ) -> DataFrame:
        """IVF-PQ: ADC over the probed cells' codes — the scan reads
        only (id, pq_codes); the float vectors stay on disk.  Ascending
        distance + id tie-break keeps the cut deterministic.  ``where``
        filters candidates inside the codes-only scan (float column
        still unread).  ``auto_nprobe`` as in :meth:`query_exact`."""
        if auto_nprobe:
            nprobe = self.resolve_nprobe(nprobe, where)
        lut = self.spark.createDataFrame(
            pq_adc_lut(query_vec, self.codebooks, rotation=self.rotation),
            "pq_sub INT, pq_code INT, partial DOUBLE",
        )
        probed = self._probe(query_vec, nprobe, where=where).select(
            self.id_col, "pq_codes"
        )
        exploded = probed.select(
            self.id_col, F.posexplode("pq_codes").alias("_pos", "pq_code")
        ).select(self.id_col, (F.col("_pos") + 1).alias("pq_sub"), "pq_code")
        joined = exploded.join(  # LUT is m·k rows at ANY corpus: broadcast
            F.broadcast(lut), ["pq_sub", "pq_code"], "inner"
        )
        if self.replicas <= 1:
            dist = F.sum("partial").alias("adc_dist")
            agg = joined.groupBy(self.id_col).agg(dist)
        else:
            # multiple assignment: an id probed in c cells contributes c
            # IDENTICAL m-partial sets, so sum = c·dist and count = c·m —
            # dist = sum·m/count, recovered inside the SAME single
            # aggregation (no pre-dedupe shuffle of the candidate set)
            m = int(self.codebooks.shape[0])
            agg = joined.groupBy(self.id_col).agg(
                (
                    F.sum("partial") * F.lit(float(m)) / F.count(F.lit(1))
                ).alias("adc_dist")
            )
        return agg.orderBy(F.asc("adc_dist"), F.asc(self.id_col)).limit(k)

    def query_adc_rerank(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 4,
        shortlist: int = 100,
        where: Column | None = None,
        auto_nprobe: bool = False,
    ) -> DataFrame:
        """The standard IVF-PQ serving shape: ADC shortlist → exact
        re-rank of ONLY the shortlisted vectors.  Plain ADC's recall is
        capped by PQ quantization loss (measured in the bench's
        ``recall_at_10_adc`` row: flat at ~0.3 even as nprobe grows);
        re-ranking the top-``shortlist`` ADC candidates with true
        cosines recovers exact-path recall while reading just
        ``shortlist`` float vectors instead of every probed cell's —
        at 100 TB the float column IO drops by |probed|/shortlist.

        The shortlist ids come back to the driver (bounded by the
        ``shortlist`` parameter — a user-set constant, never
        data-sized) and are pushed into the rescore scan as an ``IN``
        filter, so parquet row-group stats prune the float reads
        below the already-pruned cells.

        ``where`` filters the ADC shortlist inside its codes scan; the
        rescore fetch inherits it through the shortlisted ids (every
        id already satisfies the predicate), so k survivors of the
        FILTERED corpus come back.  ``auto_nprobe`` as in
        :meth:`query_exact` (resolved once, before the shortlist)."""
        if auto_nprobe:
            nprobe = self.resolve_nprobe(nprobe, where)
        short = self.query_adc(
            query_vec, k=shortlist, nprobe=nprobe, where=where
        )
        # bounded collect: exactly `shortlist` rows by construction
        ids = [r[self.id_col] for r in short.collect()]
        if not ids:
            # empty-index probe: keep the id column's REAL type (ids
            # may be strings), so this branch unions cleanly with
            # non-empty results
            return (
                self._vectors()
                .select(self.id_col)
                .limit(0)
                .withColumn("score", F.lit(0.0))
            )
        cand = (
            self._probe(query_vec, nprobe)
            .where(F.col(self.id_col).isin(ids))
            .select(self.id_col, self.vec_col)
        )
        # a shortlisted id's row may appear once per probed replica cell
        return self._dedup_topk(cand, query_vec, k)

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        query_id: str = "q_id",
        query_vec: str = "q_vec",
        where: Column | None = None,
        auto_nprobe: bool = False,
    ) -> DataFrame:
        """Batch ANN search: top-k neighbors for EVERY query row, IVF-
        accelerated — the deployed many-queries shape (the per-vector
        ``query_exact`` probes from the driver; a recommendation/dedup
        job scores millions of queries and must stay distributed end to
        end).  Returns (query_id, id, score, rank ≤ k).

        Plan shape: each query picks its ``nprobe`` nearest cells in
        one Arrow pass (:func:`multi_ivf_assign` over the query frame —
        the same ranked assignment the index build uses, so probe
        selection is identical to ``query_exact``'s), then an EQUI-join
        on the cell id pairs queries with candidate vectors.  Unlike
        the brute-force ``knn_join``'s crossJoin-of-everything, each
        query only meets ~nprobe/n_cells of the corpus, and the join
        key is the index's PARTITION column — when the query batch
        probes a cell subset, dynamic partition pruning can skip
        unprobed cells' files entirely.  Norms are precomputed per side
        before the join (the brute-force operator's trick); per-query
        top-k rides a ranked window, which Spark ≥3.5 compiles to
        WindowGroupLimit (partial top-k before the exchange).

        Correctness under multiple assignment: candidate (query, id)
        pairs can appear once per probed replica cell, so the first cut
        keeps rank ≤ k·replicas (copies tie exactly on (score, id) —
        the k distinct leaders provably survive), dedupes, and re-ranks
        to k — the ``_dedup_topk`` argument applied per query.

        Tiering honesty (the q_decontaminate_bloom pattern): at bench
        SF the brute-force crossJoin ties or wins — 64 queries × a
        4k-row corpus is trivial, and the IVF path pays query-side cell
        assignment plus join machinery.  Measured crossover ≈ ×16 the
        bench corpus (32k rows: IVF 1.25 s vs brute 1.32 s, both
        best-of-2), and the candidate volume ratio (nprobe/n_cells of
        the corpus per query vs ALL of it) keeps widening the gap from
        there — this operator exists for the 100 TB side of that line.

        ``where`` (round 9) — metadata predicate PUSHDOWN for filtered
        search ("nearest within lang='en'"): a Column over the index's
        ``meta_cols``, applied INSIDE the probed-cell candidate scan
        (parquet PushedFilters beneath the ``_ivf_cell`` partition
        pruning), BEFORE the per-query top-k — so every query still
        gets k survivors of the filtered corpus (a post-filter on an
        unfiltered top-k would return fewer), pinned equal to
        post-filtering the FULL probed candidate set.

        ``auto_nprobe=True`` (round 11) scales the probe width with
        the predicate's measured selectivity via
        :meth:`resolve_nprobe`, so the caller need not know that a
        1/25-selective filter at nprobe=4 decays recall to ~0.78 —
        the escalated width keeps the expected filtered candidate
        pool at the unfiltered base's size (recall floor pinned by
        pytest at both 1/10 and 1/25 selectivity without touching
        ``nprobe``).  Costs one filtered count over the meta columns,
        amortized across the whole query batch."""
        from pyspark.sql import Window

        from consume_kafka_avro_data_spark.operators.similarity import (
            dot,
            l2_norm,
        )

        if auto_nprobe:
            nprobe = self.resolve_nprobe(nprobe, where)
        probed = multi_ivf_assign(
            queries.select(query_id, query_vec),
            self.centroids,
            replicas=nprobe,
            vec_col=query_vec,
        ).select(
            query_id,
            query_vec,
            l2_norm(F.col(query_vec), dim=None).alias("_qn"),
            "_ivf_cell",
        )
        base = self._vectors()
        if where is not None:
            base = base.where(where)
        cand = base.select(
            self.id_col,
            self.vec_col,
            l2_norm(F.col(self.vec_col), dim=None).alias("_cn"),
            "_ivf_cell",
        )
        scored = cand.join(probed, "_ivf_cell").select(
            F.col(query_id),
            F.col(self.id_col),
            (
                dot(F.col(self.vec_col), F.col(query_vec), dim=None)
                / (F.col("_cn") * F.col("_qn"))
            ).alias("score"),
        )
        w = Window.partitionBy(query_id).orderBy(
            F.desc("score"), F.asc(self.id_col)
        )
        if self.replicas <= 1:
            return scored.withColumn("rank", F.row_number().over(w)).where(
                F.col("rank") <= k
            )
        wide = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k * self.replicas)
            .drop("rank")
            .dropDuplicates([query_id, self.id_col])
        )
        return wide.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    def _assign_queries_with_lut(
        self, queries: DataFrame, query_id: str, query_vec: str, nprobe: int
    ) -> DataFrame:
        """(query_id, _ivf_cell, _adc_lut) — each query row fans out to
        its ``nprobe`` nearest cells AND carries its m×k ADC lookup
        table, all computed in ONE Arrow pass (cell ranking exactly as
        :func:`multi_ivf_assign` — q20 dots, stable argsort — and LUT
        entries exactly as :func:`pq_adc_lut`, batched: same rotate →
        quantize → ||q_sub − code||² arithmetic, so per-query rows are
        value-identical to the driver-side table).  The LUT column is
        m·k doubles per row — query-side volume, never candidate-side;
        the scoring projection consumes and drops it before anything
        shuffles further."""
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        from consume_kafka_avro_data_spark.operators.similarity import (
            quantize_np,
        )

        r = min(nprobe, len(self.centroids))
        qcent = quantize_np(self.centroids)
        m, _k, sub = self.codebooks.shape
        qcb = [quantize_np(self.codebooks[i]) for i in range(m)]
        rot = self.rotation
        schema = StructType(
            [
                queries.schema[query_id],
                StructField("_ivf_cell", IntegerType(), False),
                StructField(
                    "_adc_lut",
                    ArrayType(ArrayType(DoubleType(), False), False),
                    False,
                ),
            ]
        )

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[query_vec].map(np.asarray)).astype(np.float64)
                xq = quantize_np(x)
                proj = xq @ qcent.T
                top = np.argsort(-proj, axis=1, kind="stable")[:, :r]
                xr = quantize_np(x @ rot) if rot is not None else xq
                luts = np.stack(
                    [
                        (
                            (xr[:, i * sub : (i + 1) * sub] ** 2).sum(
                                axis=1, keepdims=True
                            )
                            - 2.0 * (xr[:, i * sub : (i + 1) * sub] @ qcb[i].T)
                            + (qcb[i] ** 2).sum(axis=1)
                        )
                        for i in range(m)
                    ],
                    axis=1,
                )  # (n, m, k) exact integer-valued float64
                idx = np.repeat(np.arange(len(pdf)), r)
                yield pd.DataFrame(
                    {
                        query_id: pdf[query_id].iloc[idx].reset_index(drop=True),
                        "_ivf_cell": (top.reshape(-1) + 1).astype(np.int32),
                        "_adc_lut": [luts[i].tolist() for i in idx],
                    }
                )

        return queries.select(query_id, query_vec).mapInPandas(
            gen, schema=schema
        )

    def knn_join_adc(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        query_id: str = "q_id",
        query_vec: str = "q_vec",
        rerank: int | None = None,
        where: Column | None = None,
        auto_nprobe: bool = False,
    ) -> DataFrame:
        """Batch ANN over CODES ONLY — :meth:`knn_join`'s IVF-PQ
        serving tier.  The exact batch path scores true cosines over
        the probed float vectors; at 100 TB that reads dim×4 bytes per
        candidate where the codes-resident index needs just m bytes —
        this path keeps the candidate scan on (id, pq_codes) and the
        float column stays on disk (column pruning), the same IO trade
        :meth:`query_adc` makes per query.

        Plan shape: one Arrow pass fans each query to its ``nprobe``
        cells AND builds its ADC LUT (:meth:`_assign_queries_with_lut`);
        an equi-join on the cell PARTITION column pairs queries with
        candidate codes (DPP-prunable, like knn_join); the distance is
        a codegen'd fold Σᵢ lut[i][code_i] over the codes array —
        element lookups, never a float dot; per-query top-k rides a
        ranked window (WindowGroupLimit).  Replica copies of an id tie
        exactly on (adc_dist, id) — the k·R-cut + dedupe argument —
        because q20 partials are integer-valued doubles, so every sum
        order agrees.

        ``rerank=None`` returns (query_id, id, adc_dist, rank ≤ k) —
        pinned per-query equal to :meth:`query_adc`.  ``rerank=s``
        appends the standard exact re-rank: the per-query top-``s`` ADC
        shortlist joins back to its float vectors on (cell, id) — the
        shortlist side is queries×s rows, broadcastable, and the cell
        key keeps partition pruning — then true cosines re-rank to
        (query_id, id, score, rank ≤ k), pinned per-query equal to
        :meth:`query_adc_rerank`.  Float IO drops from |probed| to s
        vectors per query.

        ``where`` (round 9) — metadata predicate pushdown exactly as
        in :meth:`knn_join`: applied inside the codes-only candidate
        scan (PushedFilters under the cell pruning, float column STILL
        absent from the scan — pinned), before the shortlist cut, so k
        is guaranteed post-filter; the rerank fetch inherits the
        filter through the shortlisted ids.

        ``auto_nprobe=True`` (round 11) — selectivity-aware probe
        escalation exactly as in :meth:`knn_join` (see
        :meth:`resolve_nprobe`): one filtered count sizes the probe
        list so selective predicates keep the filtered candidate pool
        at the unfiltered base's expected size."""
        from pyspark.sql import Window

        from consume_kafka_avro_data_spark.operators.similarity import (
            cosine,
        )

        if auto_nprobe:
            nprobe = self.resolve_nprobe(nprobe, where)
        n_short = k if rerank is None else rerank
        probed = self._assign_queries_with_lut(
            queries, query_id, query_vec, nprobe
        )
        base = self._vectors()
        if where is not None:
            base = base.where(where)
        cand = base.select(
            self.id_col, "pq_codes", "_ivf_cell"
        )
        scored = cand.join(probed, "_ivf_cell").select(
            F.col(query_id),
            F.col(self.id_col),
            F.col("_ivf_cell"),
            F.aggregate(
                F.zip_with(
                    F.col("pq_codes"),
                    F.col("_adc_lut"),
                    lambda c, l: F.element_at(l, c),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
        w = Window.partitionBy(query_id).orderBy(
            F.asc("adc_dist"), F.asc(self.id_col)
        )
        if self.replicas <= 1:
            short = scored.withColumn("rank", F.row_number().over(w)).where(
                F.col("rank") <= n_short
            )
        else:
            short = (
                scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= n_short * self.replicas)
                .drop("rank")
                .dropDuplicates([query_id, self.id_col])
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= n_short)
            )
        if rerank is None:
            return short.select(query_id, self.id_col, "adc_dist", "rank")
        # exact re-rank: fetch each shortlisted id's float vector via
        # (cell, id) — any surviving replica row's cell holds an
        # identical copy — and its query vector by query id
        vecs = self._vectors().select(
            "_ivf_cell", self.id_col, self.vec_col
        )
        qv = queries.select(query_id, query_vec)
        rescored = (
            short.select(query_id, self.id_col, "_ivf_cell")
            .join(qv, query_id)
            .join(vecs, ["_ivf_cell", self.id_col])
            .select(
                F.col(query_id),
                F.col(self.id_col),
                cosine(
                    F.col(self.vec_col), F.col(query_vec), dim=None
                ).alias("score"),
            )
        )
        w2 = Window.partitionBy(query_id).orderBy(
            F.desc("score"), F.asc(self.id_col)
        )
        return rescored.withColumn("rank", F.row_number().over(w2)).where(
            F.col("rank") <= k
        )

    def cell_sizes(self) -> DataFrame:
        """(_ivf_cell, n) — the balance diagnostic for probe planning
        (and the rebuild trigger: when incremental shards skew it,
        retrain via ``build``)."""
        return (
            self._vectors()
            .groupBy("_ivf_cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )
