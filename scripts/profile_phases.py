"""Phase-level wall profile for the round-12 target queries.

Replays each target query's internal structure with perf_counter
timestamps around every eager phase (driver collects, checkpoints,
params) and the final noop write, plus a Spark job count per phase via
the status tracker.  Measurement-only — the shipped queries are NOT
routed through this file.

Usage: python scripts/profile_phases.py [q_pq_adc q_semantic_dedup ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.session import get_session
from consume_kafka_avro_data_spark.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class Phases:
    def __init__(self, spark):
        self.spark = spark
        self.t = None
        self.jobs0 = 0
        self.rows = []

    def _njobs(self):
        st = self.spark.sparkContext.statusTracker()
        return len(st.getJobIdsForGroup(None))

    def start(self, name):
        self.name = name
        self.jobs0 = self._njobs()
        self.t = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self.t
        nj = self._njobs() - self.jobs0
        self.rows.append((self.name, round(dt, 4), nj))


def profile_pq_adc(spark, ph):
    from consume_kafka_avro_data_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    emb = load_table(spark, SF, "embeddings")
    ph.start("pq_codebooks(sample collect + lloyd)")
    cb = pq_codebooks(emb, m=8, k=16)
    ph.stop()
    ph.start("vec0 collect")
    rows = emb.where(F.col("vec_id") == 0).limit(1).collect()
    ph.stop()
    ph.start("plan build (pq_adc_topk)")
    df = pq_adc_topk(emb, rows[0]["embedding"], cb, k=10)
    ph.stop()
    ph.start("noop write")
    noop(df)
    ph.stop()


def profile_similarity_ann(spark, ph):
    from consume_kafka_avro_data_spark.operators.similarity import srp_lsh_topk

    emb = load_table(spark, SF, "embeddings")
    ph.start("vec0 collect")
    rows = emb.where(F.col("vec_id") == 0).limit(1).collect()
    ph.stop()
    ph.start("plan build (srp_lsh_topk)")
    df = srp_lsh_topk(emb, rows[0]["embedding"], k=10)
    ph.stop()
    ph.start("noop write")
    noop(df)
    ph.stop()


def profile_semantic_dedup(spark, ph):
    from consume_kafka_avro_data_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_params,
        kmeans_sample,
    )
    from consume_kafka_avro_data_spark.operators.similarity import (
        auto_n_centroids,
        lloyd_unit_kmeans,
    )

    emb = load_table(spark, SF, "embeddings")
    ph.start("kmeans_sample collect")
    x = kmeans_sample(emb)
    ph.stop()
    ph.start("corpus count")
    n_rows = emb.count()
    ph.stop()
    ph.start("lloyd driver kmeans")
    k = auto_n_centroids(n_rows, x.shape[1]) if len(x) else 1
    centroids = lloyd_unit_kmeans(x, k=k, seed=42)
    ph.stop()
    est_cell = max(1, n_rows // max(len(centroids), 1))
    n_blocks = max(1, min(16, -(-est_cell // 4096)))
    ph.start("plan build (semantic_dedup)")
    df = semantic_dedup(
        emb, threshold=0.35, n_centroids=k, centroids=centroids, n_blocks=n_blocks
    )
    ph.stop()
    ph.start("noop write")
    noop(df)
    ph.stop()


def profile_curation_pipeline(spark, ph):
    from consume_kafka_avro_data_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_params,
    )
    from consume_kafka_avro_data_spark.operators.text import quality_score

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    qt = 0.5  # matches _CURATION_QT? read real value below
    from consume_kafka_avro_data_spark.queries.curation import _CURATION_QT

    qt = _CURATION_QT
    ph.start("s checkpoint (quality fold + fp)")
    s = (
        quality_score(docs)
        .select(
            "doc_id",
            "quality",
            F.md5(F.lower(F.coalesce(F.col("text"), F.lit("")))).alias("_fp"),
        )
        .localCheckpoint(eager=True)
    )
    ph.stop()
    qpass = s.where(F.col("quality") >= qt)
    canon = qpass.groupBy("_fp").agg(F.min("doc_id").alias("canonical_id"))
    d2c = (
        qpass.select("doc_id", "_fp")
        .join(canon, "_fp")
        .select("doc_id", "canonical_id")
    )
    surv_emb = emb.join(
        d2c.where(F.col("doc_id") == F.col("canonical_id")).select(
            F.col("doc_id").alias("vec_id")
        ),
        "vec_id",
    )
    ph.start("surv_ck checkpoint")
    surv_ck = surv_emb.localCheckpoint(eager=True)
    ph.stop()
    ph.start("semantic_dedup_params (sample + count)")
    centroids, k, n_blocks = semantic_dedup_params(surv_ck)
    ph.stop()
    surv_ck.unpersist()
    ph.start("plan build")
    sem = semantic_dedup(
        surv_emb, threshold=0.35, n_centroids=k, centroids=centroids,
        n_blocks=n_blocks,
    )
    out = (
        s.select("doc_id", "quality")
        .join(d2c, "doc_id", "left")
        .join(sem.select(F.col("vec_id").alias("doc_id"), "dup_of"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("quality") < qt, F.lit("quality"))
            .when(F.col("canonical_id") != F.col("doc_id"), F.lit("exact"))
            .when(F.col("dup_of").isNotNull(), F.lit("semantic"))
            .otherwise(F.lit("kept"))
            .alias("stage"),
            F.when(F.col("quality") < qt, F.lit(None).cast("long"))
            .when(F.col("canonical_id") != F.col("doc_id"), F.col("canonical_id"))
            .otherwise(F.col("dup_of"))
            .alias("witness"),
        )
    )
    ph.stop()
    ph.start("noop write")
    noop(out)
    ph.stop()


PROFILES = {
    "q_pq_adc": profile_pq_adc,
    "q_similarity_ann": profile_similarity_ann,
    "q_semantic_dedup": profile_semantic_dedup,
    "q_curation_pipeline": profile_curation_pipeline,
}


def main():
    names = sys.argv[1:] or list(PROFILES)
    spark = get_session(app_name="cka-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM codegen + Arrow workers + table scans
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("documents", "embeddings"):
        load_table(spark, SF, t).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in names:
        fn = PROFILES[name]
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            ph = Phases(spark)
            t0 = time.perf_counter()
            fn(spark, ph)
            total = round(time.perf_counter() - t0, 4)
            runs.append({"total": total, "phases": ph.rows})
        out[name] = runs
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
