"""JSONL (newline-delimited JSON) source with corrupt-record DLQ.

Training corpora overwhelmingly arrive as JSONL dumps (one document
object per line); the reference's ingest principle — decode errors are
DATA, routed to a dead-letter channel with the cause attached, never a
job abort (``src/SPOConsumer.cpp:61-76``) — applies to the batch file
case exactly as it does to Kafka frames.  This module is that policy
over ``spark.read.json``:

* **No schema inference.**  The caller's ``StructType`` IS the schema —
  inference samples the data and can flip a column's type between runs
  (the same rule ``csv_input`` enforces for CSV).
* **PERMISSIVE + ``_corrupt_record``**: malformed lines survive the
  scan as raw text instead of killing the job (FAILFAST) or silently
  vanishing (DROPMALFORMED).  ``read_jsonl_with_dlq`` splits the scan
  into (clean rows, dlq rows) where each DLQ row carries the raw line
  and a stable error tag — mirroring the shape of the Avro decode DLQ
  (``sources/avro_codec.from_confluent_avro(keep_raw=True)``).
* **text scan + ``from_json``, not ``spark.read.json``**: the JSON
  reader refuses plans that reference only its internal corrupt column
  ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — the
  documented workaround is caching the whole scan, a non-starter at
  100 TB).  Parsing each line with ``from_json`` keeps the split a
  single map-only text scan, needs no cache, and the raw line is a
  real column on every row.
* Scale: one file scan, map-only split, both branches share the scan
  via Catalyst's plan reuse; a 100 TB JSONL drop reads in parallel at
  file-split granularity like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Strict-schema JSONL scan, PERMISSIVE, corrupt lines retained in
    ``_corrupt_record`` (all declared fields null on such rows)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"user schema must not declare {CORRUPT_COL!r}; it is added "
            "internally for DLQ routing"
        )
    scan_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    raw = spark.read.text(path).where(F.trim(F.col("value")) != "")
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            scan_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j")
    )
    return parsed.select("j.*")


def read_jsonl_with_dlq(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """(clean, dlq) split of a JSONL scan.

    ``clean`` carries exactly the user schema's columns for rows that
    parsed fully.  ``dlq`` carries (raw, error) — the untouched input
    line plus a stable error tag — for lines that failed to parse as
    JSON or did not match the schema.  Rows where every user field is
    null AND the corrupt column is null (a literal ``null`` line or an
    empty object) are kept in ``clean``: they are valid JSON the schema
    simply doesn't populate, the same both engines treat a sparse
    document.
    """
    scanned = read_jsonl(spark, path, schema)
    bad = F.col(CORRUPT_COL).isNotNull()
    clean = scanned.where(~bad).select(*schema.fieldNames())
    dlq = scanned.where(bad).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit("JSONL_PARSE_OR_SCHEMA_MISMATCH").alias("error"),
    )
    return clean, dlq


def write_jsonl(df: DataFrame, path: str) -> None:
    """Round-trip writer: one JSON object per line, overwrite."""
    df.write.mode("overwrite").json(path)
