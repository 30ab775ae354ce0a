"""Sequence packing — the training-data step between curation and the
dataloader: lay tokenized documents end-to-end and cut fixed
``seq_len``-token training sequences, so batch utilization doesn't
collapse on short documents (the standard pre-training "packing" /
"example concatenation" recipe, described in public training setups
from GPT-2 onward).

The computation is a GLOBAL RUNNING SUM of token counts in a
deterministic document order — the textbook case where a naive
``Window.orderBy(id)`` (no partition key) collapses the whole corpus
into ONE task.  The scale-correct shape is the classic two-pass
distributed prefix sum:

1. range-partition by doc id (partition i's ids all precede partition
   i+1's, so per-partition order concatenates to the global order);
2. per-partition running sums in parallel (window keyed by the
   PHYSICAL partition id — every partition is its own window group);
3. one driver-sized pass: per-partition totals (one row each) become
   exclusive offsets, broadcast-joined back.

Partition boundaries affect only WHERE the sum is split, never its
value, so the output is bit-identical under any partition count — the
property the tests pin by running the same corpus through 1, 3, and 8
partitions.

Boundary semantics: a document is assigned to the pack where it
STARTS (``pack_id = floor(cum_before / seq_len)``); a doc straddling
the boundary overflows its pack rather than being split — chunk long
documents first (``queries/text`` doc chunking) if hard caps matter,
the standard division of labor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from consume_kafka_avro_data_spark.operators.dedup import tokens_col


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """(id_col, n_tokens, cum_before, pack_id, pack_offset) — one row
    per document, every document in exactly one pack, pack boundaries
    every ``seq_len`` tokens of the id-ordered token stream.

    ``n_tokens_col`` names a precomputed token-count column (e.g. from
    a real tokenizer); by default counts whitespace tokens via the
    corpus-wide convention.  ``partitions`` sizes the range shuffle
    (default: Spark decides); the OUTPUT is partition-count-invariant.

    Caller contract: ``id_col`` values are unique (the global order is
    ORDER BY id — duplicate ids would make the running sum ambiguous
    between the copies).  NULL ids sort first, as range partitioning
    and the window agree on NULLS FIRST.

    The call is EAGER (the offset pass runs jobs) and the returned
    frame is checkpointed — ``.unpersist()`` it when done to release
    its blocks (the internal partition-pinning checkpoint is released
    before returning)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n_tok = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else F.size(tokens_col(text_col))
    ).cast("long")
    base = docs.select(id_col, n_tok.alias("n_tokens"))
    ranged = (
        base.repartitionByRange(partitions, F.col(id_col))
        if partitions is not None
        else base.repartitionByRange(F.col(id_col))
    )
    part = ranged.withColumn("_pid", F.spark_partition_id())
    # pass 2: per-partition running sums, all partitions in parallel
    # (window keyed by the physical partition id; rows-unbounded frame)
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.asc_nulls_first(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pin ONE physical partition assignment before fanning out to two
    # consumers (the totals collect below, then the final join):
    # repartitionByRange re-samples its range bounds per job and
    # spark_partition_id is whatever the re-run produced, so without
    # this the second job could assign rows to different _pid values
    # than the offsets were computed from — silently wrong cum_before
    # on real data (sampled bounds), invisible on tiny corpora where
    # sampling degenerates to exact bounds.
    local = part.withColumn(
        "_local_cum", F.sum("n_tokens").over(w)
    ).localCheckpoint(eager=True)
    # pass 3: per-partition totals -> exclusive prefix offsets.  One
    # row per partition: driver-sized by construction at ANY corpus
    # size (this collect is the whole trick — the naive global window
    # would instead serialize the corpus through one task)
    totals = sorted(
        (r["_pid"], r["_t"])
        for r in local.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t
    off_df = local.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )
    cum_before = F.col("_offset") + F.col("_local_cum") - F.col("n_tokens")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            id_col,
            "n_tokens",
            cum_before.alias("cum_before"),
            F.floor(cum_before / F.lit(seq_len)).cast("long").alias("pack_id"),
            (cum_before % F.lit(seq_len)).alias("pack_offset"),
        )
        # checkpoint the RESULT, then release the internal pinned
        # frame: the operator is already eager (the totals collect
        # above runs jobs), and without this hand-off the internal
        # checkpoint would sit in executor storage with no release
        # handle for the session's lifetime.  The caller owns the
        # returned frame's blocks — .unpersist() it when done, the
        # standard cached-DataFrame lifecycle.
        .localCheckpoint(eager=True)
    )
    local.unpersist()
    return out
