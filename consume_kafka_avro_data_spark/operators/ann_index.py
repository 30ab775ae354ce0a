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

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    kmeans_centroids,
    pq_adc_lut,
    pq_codebooks,
    pq_encode,
)

META = "_ann_meta.json"
VECTORS = "vectors"


class AnnIndex:
    """Persisted IVF-PQ index over an embedding corpus.

    Rebuild safety: each build writes its rows into a fresh generation
    directory (``vectors-<token>``) and the atomic META replace — which
    names that directory — is the ONLY commit point.  A crash anywhere
    before it leaves the previous generation fully live (readers load
    the old meta → the old directory); an in-place overwrite would
    instead let a crash pair new cell layouts with old centroids and
    return silently wrong neighbors.  Superseded generations are
    garbage-collected after the commit, best-effort."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        id_col: str,
        vec_col: str,
        vectors_dir: str = VECTORS,
    ):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self.codebooks = codebooks
        self.id_col = id_col
        self.vec_col = vec_col
        self.vectors_dir = vectors_dir

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
    ) -> "AnnIndex":
        """Train (driver-sized sample) → assign + encode (two map-only
        Arrow passes) → write a fresh generation directory → atomically
        commit it via the META replace.  The corpus is read twice and
        never shuffled; the only driver traffic is the centroid/codebook
        matrices."""
        import shutil
        import uuid

        centroids = kmeans_centroids(
            corpus, k=n_cells, id_col=id_col, vec_col=vec_col, seed=seed
        )
        codebooks = pq_codebooks(
            corpus, m=m, k=k_codes, id_col=id_col, vec_col=vec_col, seed=seed
        )
        assigned = ivf_assign(corpus, centroids, vec_col)
        rows = pq_encode(
            assigned,
            codebooks,
            id_col,
            vec_col,
            keep_cols=[vec_col, "_ivf_cell"],
        )
        gen = f"{VECTORS}-{uuid.uuid4().hex[:8]}"
        (
            rows.write.partitionBy("_ivf_cell")
            .mode("overwrite")
            .parquet(os.path.join(path, gen))
        )
        meta = {
            "id_col": id_col,
            "vec_col": vec_col,
            "vectors_dir": gen,
            "centroids": centroids.tolist(),
            "codebooks": codebooks.tolist(),
        }
        tmp = os.path.join(path, META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, META))  # the ONLY commit point
        for name in os.listdir(path):  # GC superseded generations
            if name.startswith(VECTORS) and name != gen:
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        return cls(
            spark, path, centroids, codebooks, id_col, vec_col, vectors_dir=gen
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "AnnIndex":
        with open(os.path.join(path, META)) as f:
            meta = json.load(f)
        return cls(
            spark,
            path,
            np.asarray(meta["centroids"], dtype=np.float64),
            np.asarray(meta["codebooks"], dtype=np.float64),
            meta["id_col"],
            meta["vec_col"],
            vectors_dir=meta.get("vectors_dir", VECTORS),
        )

    # -- query ---------------------------------------------------------------

    def _probe(self, query_vec, nprobe: int) -> DataFrame:
        """Rows of the ``nprobe`` cells nearest the query — the cell
        filter hits the partition column, so unprobed cells' files are
        skipped at planning time."""
        qv = np.asarray(query_vec, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(self.centroids @ qv))[:nprobe]
        cells = [int(c) + 1 for c in order]  # 1-based, as ivf_assign
        index = self.spark.read.parquet(os.path.join(self.path, self.vectors_dir))
        return index.where(F.col("_ivf_cell").isin(cells))

    def query_exact(self, query_vec, k: int = 10, nprobe: int = 4) -> DataFrame:
        """IVF-Flat: exact cosine rescore over the probed cells' float
        vectors (reads vectors for ~nprobe/n_cells of the corpus)."""
        probed = self._probe(query_vec, nprobe).select(
            self.id_col, self.vec_col
        )
        return brute_force_topk(
            probed, query_vec, k, self.id_col, self.vec_col
        )

    def query_adc(self, query_vec, k: int = 10, nprobe: int = 4) -> DataFrame:
        """IVF-PQ: ADC over the probed cells' codes — the scan reads
        only (id, pq_codes); the float vectors stay on disk.  Ascending
        distance + id tie-break keeps the cut deterministic."""
        lut = self.spark.createDataFrame(
            pq_adc_lut(query_vec, self.codebooks),
            "pq_sub INT, pq_code INT, partial DOUBLE",
        )
        probed = self._probe(query_vec, nprobe).select(self.id_col, "pq_codes")
        exploded = probed.select(
            self.id_col, F.posexplode("pq_codes").alias("_pos", "pq_code")
        ).select(self.id_col, (F.col("_pos") + 1).alias("pq_sub"), "pq_code")
        return (
            # the LUT is m·k rows for ANY corpus — always broadcast-safe
            exploded.join(F.broadcast(lut), ["pq_sub", "pq_code"], "inner")
            .groupBy(self.id_col)
            .agg(F.sum("partial").alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc(self.id_col))
            .limit(k)
        )

    def cell_sizes(self) -> DataFrame:
        """(_ivf_cell, n) — the balance diagnostic for probe planning."""
        return (
            self.spark.read.parquet(os.path.join(self.path, self.vectors_dir))
            .groupBy("_ivf_cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )
