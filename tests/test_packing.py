"""Sequence packing (operators/packing): the distributed prefix sum
must equal a driver-computed running sum exactly, the output must be
partition-count-invariant (boundaries move, values don't), and the
pack assignment must satisfy the packing contract (every doc exactly
once, packs contiguous in id order, offsets within the sequence)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    rows = [(i, "tok " * rng.randint(1, 40)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref(rows, seq_len):
    """Driver-side reference: sort by id, run the sum, cut packs."""
    out, cum = {}, 0
    for doc_id, n in sorted(rows):
        out[doc_id] = (n, cum, cum // seq_len, cum % seq_len)
        cum += n
    return out


def test_prefix_sum_matches_driver_reference(spark, docs):
    rows = [
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("n")
        ).collect()
    ]
    want = _ref(rows, seq_len=128)
    got = {
        r.doc_id: (r.n_tokens, r.cum_before, r.pack_id, r.pack_offset)
        for r in pack_sequences(docs, 128, partitions=5).collect()
    }
    assert got == want


def test_output_is_partition_count_invariant(spark, docs):
    """The scale pin: 1, 3, and 8 range partitions produce IDENTICAL
    rows — boundaries only move where the sum is split."""
    runs = [
        sorted(
            (r.doc_id, r.cum_before, r.pack_id)
            for r in pack_sequences(docs, 100, partitions=p).collect()
        )
        for p in (1, 3, 8)
    ]
    assert runs[0] == runs[1] == runs[2]


def test_packing_contract(spark, docs):
    seq_len = 150
    out = pack_sequences(docs, seq_len).collect()
    n_docs = docs.count()
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs  # exactly once
    by_pack: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_pack.setdefault(r.pack_id, []).append(r)
        assert 0 <= r.pack_offset < seq_len
        assert r.pack_offset == r.cum_before % seq_len
    # packs are 0..max with no holes, and contiguous in doc order
    assert sorted(by_pack) == list(range(len(by_pack)))
    prev_last = None
    for pid in sorted(by_pack):
        ids = [r.doc_id for r in by_pack[pid]]
        if prev_last is not None:
            assert ids[0] > prev_last
        prev_last = ids[-1]
        # a pack holds at most seq_len tokens plus its boundary
        # straddler's overflow (docs are assigned where they START)
        total = sum(r.n_tokens for r in by_pack[pid])
        assert total < seq_len + max(r.n_tokens for r in by_pack[pid])


def test_precomputed_token_counts_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 7)], "doc_id long, toks long"
    )
    out = {
        r.doc_id: (r.cum_before, r.pack_id)
        for r in pack_sequences(
            docs, 8, n_tokens_col="toks", text_col="toks"
        ).collect()
    }
    assert out == {1: (0, 0), 2: (10, 1), 3: (15, 1)}
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, 0, n_tokens_col="toks")


def test_on_documents_table(spark, sf_dir):
    """Smoke at test SF: total packed tokens equal the corpus token
    count and the last pack id is total // seq_len."""
    from consume_kafka_avro_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = pack_sequences(docs, 512, partitions=4)
    agg = out.agg(
        F.sum("n_tokens").alias("t"),
        F.max("pack_id").alias("mx"),
        (F.max("cum_before") + F.max_by("n_tokens", "cum_before")).alias(
            "end"
        ),
    ).collect()[0]
    assert agg["end"] == agg["t"]  # the stream is gap-free
    assert agg["mx"] == (agg["t"] - out.orderBy(F.desc("cum_before")).limit(1).collect()[0].n_tokens) // 512
