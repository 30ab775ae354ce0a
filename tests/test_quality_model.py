"""Learned quality classifier (operators/quality): the GPT-3/CCNet
linear-filter recipe as a Spark ML pipeline — weak labels from a
trusted-vs-raw split, map-only featurization, held-out separation
pinned as numbers, and a save/load roundtrip so the deployed filter is
a load + one transform."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.quality import (
    quality_probability,
    quality_training_frame,
    train_quality_classifier,
)

CLEAN_WORDS = (
    "the quick brown fox jumps over a lazy dog while careful researchers "
    "measure tokenizer quality across many curated documents with clear "
    "grammar and varied vocabulary in every sentence they write"
).split()
SPAM_WORDS = "zzz buy click winn free xxx qqq kkk promo casino".split()


def _doc(rng, words, n=30):
    return " ".join(rng.choice(words) for _ in range(n))


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)
    clean = [(i, _doc(rng, CLEAN_WORDS)) for i in range(120)]
    spam = [(1000 + i, _doc(rng, SPAM_WORDS)) for i in range(120)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # deterministic split: even ids train, odd ids held out
    return {
        "train_hi": mk([r for r in clean if r[0] % 2 == 0]),
        "train_lo": mk([r for r in spam if r[0] % 2 == 0]),
        "held_out": mk(
            [r for r in clean if r[0] % 2 == 1]
            + [r for r in spam if r[0] % 2 == 1]
        ),
    }


@pytest.fixture(scope="module")
def model(corpora):
    labeled = quality_training_frame(
        corpora["train_hi"], corpora["train_lo"]
    )
    return train_quality_classifier(labeled, n_features=1 << 12, max_iter=25)


def test_separates_held_out_corpora(corpora, model):
    """The filter's reason to exist: on UNSEEN docs from the two
    generators, clean scores high and spam scores low — pinned as a
    full separation on this synthetic margin (disjoint vocabularies),
    not a vague 'better than chance'."""
    scored = quality_probability(model, corpora["held_out"])
    rows = {r.doc_id: r.quality_prob for r in scored.collect()}
    clean = [p for d, p in rows.items() if d < 1000]
    spam = [p for d, p in rows.items() if d >= 1000]
    assert min(clean) > 0.9, min(clean)
    assert max(spam) < 0.1, max(spam)
    assert min(clean) > max(spam)  # a single threshold separates fully


def test_output_shape_and_null_text(spark, model):
    """Scoring keeps the caller's columns, appends quality_prob in
    [0, 1], and NULL text scores as empty text (the corpus-wide NULL
    canonicalization) instead of throwing mid-scan."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None)], "doc_id long, text string"
    )
    out = quality_probability(model, docs)
    assert out.columns == ["doc_id", "text", "quality_prob"]
    rows = {r.doc_id: r for r in out.collect()}
    assert 0.0 <= rows[1].quality_prob <= 1.0
    assert 0.0 <= rows[2].quality_prob <= 1.0  # NULL text did not throw
    # caller columns come back UNTOUCHED: the coalesced scoring copy
    # must not leak — NULL text stays NULL in the output
    assert rows[1].text == "the quick brown fox"
    assert rows[2].text is None


def test_scoring_other_column_leaves_text_alone(spark, model):
    """Scoring text_col='body' on a frame that ALSO has a 'text' column
    must not clobber it (the model's fixed input column is an internal
    derived copy, never the caller's)."""
    docs = spark.createDataFrame(
        [(1, "great clean prose", "KEEP ME")],
        "doc_id long, body string, text string",
    )
    out = quality_probability(model, docs, text_col="body")
    assert out.columns == ["doc_id", "body", "text", "quality_prob"]
    row = out.first()
    assert row.text == "KEEP ME"
    assert row.body == "great clean prose"
    assert 0.0 <= row.quality_prob <= 1.0


def test_training_frame_validates_and_hides_leaky_columns(spark, corpora):
    labeled = quality_training_frame(
        corpora["train_hi"], corpora["train_lo"]
    )
    # only (text, label): incidental columns (doc_id here) must not
    # ride into training where they could leak the split
    assert set(labeled.columns) == {"text", "label"}
    n_hi = corpora["train_hi"].count()
    assert labeled.where(F.col("label") == 1.0).count() == n_hi
    with pytest.raises(ValueError, match="quality_training_frame"):
        train_quality_classifier(spark.createDataFrame([(1,)], "x int"))


def test_model_save_load_roundtrip(tmp_path, corpora, model):
    """The deployed shape: persist the fitted pipeline, reload it in a
    fresh handle, and get IDENTICAL probabilities (featurization is
    hash-based and the coefficients are stored exactly)."""
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    want = {
        r.doc_id: r.quality_prob
        for r in quality_probability(model, corpora["held_out"]).collect()
    }
    got = {
        r.doc_id: r.quality_prob
        for r in quality_probability(loaded, corpora["held_out"]).collect()
    }
    assert got == want


def test_on_documents_table(spark, sf_dir, corpora, model):
    """Smoke on the real documents table: every doc gets a probability
    and the scan stays map-only (one projection over the table — no
    shuffle in the scoring plan)."""
    from consume_kafka_avro_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = quality_probability(model, docs)
    n = docs.count()
    assert scored.where(F.col("quality_prob").isNotNull()).count() == n
    plan = scored._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        scored._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan  # scoring is map-only
