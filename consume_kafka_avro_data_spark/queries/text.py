"""Text-analysis queries (SURVEY §2.7, U7 + charter text mandate).

All hash-checked text metrics are pure JVM string expressions (split,
length, md5, LIKE) — no Python in the hot path.  The richer operators
(MinHash near-dup, language-ID model, BPE-ish tokenizer) live in
operators/text.py and operators/dedup.py; their tie-prone or
model-defined outputs are registered as rows-only queries in
queries/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' '))                            AS ttr
    FROM documents
    """,
    tags=("U7",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + type-token ratio (U7): token counting
    entirely in codegen — the scale path for corpus statistics."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        (F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)).alias("ttr"),
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT md5(lower(text))            AS fingerprint,
           CAST(count(*)  AS BIGINT)   AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM documents
    GROUP BY 1
    """,
    tags=("U4", "text"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting → exact-dup clusters: hash normalized
    text, group, keep min-id as canonical.  This is content-addressed
    dedup — the O(n) first pass of any 100 TB dedup pipeline, before any
    near-dup method runs."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.lower(F.col("text"))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


@query(
    "q_lang_stats",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT)                    AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)                AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / count(*)     AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    tags=("U7", "text"),
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language × source — the partition-planning
    query of a training-data pipeline (integer sums are exact, so no
    decimal trick needed)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "q_text_quality",
    oracle="""
    SELECT doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' '))             AS avg_token_len,
           (length(text) = n_chars)                     AS chars_consistent,
           contains(text, 'spark')                      AS mentions_spark
    FROM documents
    """,
    tags=("U7", "text"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics: token count, mean token length,
    metadata consistency, keyword flag — the filter-stage features of a
    quality-scoring pipeline, all codegen-able."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / F.size(toks)).alias(
            "avg_token_len"
        ),
        (F.length(F.col("text")) == F.col("n_chars")).alias("chars_consistent"),
        F.contains(F.col("text"), F.lit("spark")).alias("mentions_spark"),
    )
