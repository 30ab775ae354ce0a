"""Order-n interpolated Kneser-Ney (operators/lm.NgramKN): the Spark
fit must reproduce a pure-Python implementation of the Chen & Goodman
recursion value-for-value at every order, satisfy the per-context
Σ_w P_k(w|ctx) = 1 mass law at EVERY backoff tier, reproduce BigramKN
exactly at order 2, back off per the formula at score time, and score
the documents table end to end."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.lm import (
    BigramKN,
    NgramKN,
    doc_ngrams,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat",
    "the cat saw the dog run",
    "a dog saw the cat",
]


def _ref_ngram_kn(texts, order, discount=0.75):
    """The published interpolated-KN recursion, computed the slow
    obvious way: raw counts at the top order, continuation counts
    N1+(· g) (distinct predecessors among (k+1)-gram types) below,
    unigram = continuation distribution.  Returns (phat, tables) where
    phat(gram) evaluates the full backoff cascade for ANY n-tuple and
    tables = (num, denom, n1, lam, p1) keyed per order for
    value-for-value pinning."""
    raw = {k: Counter() for k in range(2, order + 1)}
    for t in texts:
        toks = t.lower().split()
        for k in range(2, order + 1):
            raw[k].update(
                tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
    # continuation counts: adj[k][g] = |{w0 : (w0 + g) is a (k+1)-gram type}|
    adj = {k: Counter() for k in range(1, order)}
    for k in range(1, order):
        for g in raw[k + 1]:
            adj[k][g[1:]] += 1
    num = {k: adj[k] for k in range(2, order)}
    num[order] = raw[order]
    n1_total = sum(adj[1].values())
    p1 = {g[0]: c / n1_total for g, c in adj[1].items()}
    denom, n1, lam = {}, {}, {}
    for k in range(2, order + 1):
        denom[k], n1[k] = Counter(), Counter()
        for g, c in num[k].items():
            denom[k][g[:-1]] += c
            n1[k][g[:-1]] += 1
        lam[k] = {
            ctx: discount * n1[k][ctx] / denom[k][ctx] for ctx in denom[k]
        }

    def phat(gram):  # full backoff cascade for an order-len(gram) query
        k = len(gram)
        if k == 1:
            return p1.get(gram[0], 0.0)
        lower = phat(gram[1:])
        ctx = gram[:-1]
        if gram in num[k]:
            return (
                max(num[k][gram] - discount, 0.0) / denom[k][ctx]
                + lam[k][ctx] * lower
            )
        if ctx in denom[k]:
            return lam[k][ctx] * lower
        return lower

    return phat, num, denom, n1, lam, p1


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


@pytest.fixture(scope="module")
def tri(corpus_df):
    m = NgramKN.fit(corpus_df, order=3)
    yield m
    m.unpersist()


def test_fit_matches_reference_at_every_order(tri):
    """Every observed gram's interpolated probability and every
    context's λ, at BOTH orders, plus the continuation unigram — equal
    to the pure-Python recursion (same integer counts, same
    divisions)."""
    phat, num, denom, n1, lam, p1 = _ref_ngram_kn(CORPUS, order=3)
    got_p1 = {r.w1: r.p1 for r in tri.p1.collect()}
    assert got_p1 == pytest.approx(p1)
    for k in (2, 3):
        got_lam = {
            tuple(r[f"w{i + 1}"] for i in range(k - 1)): r.lam
            for r in tri.lams[k].collect()
        }
        assert got_lam == pytest.approx(lam[k]), k
        got_p = {
            tuple(r[f"w{i + 1}"] for i in range(k)): r.p
            for r in tri.probs[k].collect()
        }
        assert set(got_p) == set(num[k]), k
        for g, got in got_p.items():
            assert got == pytest.approx(phat(g), abs=1e-15), g


def test_mass_law_at_every_tier(tri):
    """Σ_w P̂_k(w | ctx) = 1 for every SEEN context at every order —
    the signature KN invariant, evaluated over the full continuation
    vocabulary with the same backoff cascade the scorer uses."""
    phat, num, denom, n1, lam, p1 = _ref_ngram_kn(CORPUS, order=3)
    vocab = list(p1)
    for k in (2, 3):
        for ctx in denom[k]:
            total = sum(phat(ctx + (w,)) for w in vocab)
            assert total == pytest.approx(1.0, abs=1e-12), (k, ctx)


def test_order2_reproduces_bigram_model(corpus_df):
    """NgramKN(order=2) must equal BigramKN value-for-value — same
    prob table, same λ, same continuation distribution, same doc
    scores (the generalization is a strict superset)."""
    big = BigramKN.fit(corpus_df)
    gen = NgramKN.fit(corpus_df, order=2)
    try:
        want = {(r.w1, r.w2): r.p for r in big.probs.collect()}
        got = {(r.w1, r.w2): r.p for r in gen.probs[2].collect()}
        assert got == pytest.approx(want, abs=1e-15)
        want_lam = {r.w1: r.lam for r in big.contexts.collect()}
        got_lam = {r.w1: r.lam for r in gen.lams[2].collect()}
        assert got_lam == pytest.approx(want_lam)
        spark = corpus_df.sparkSession
        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "zzz qqq"), (3, "solo")],
            "doc_id long, text string",
        )
        want_s = {r.doc_id: r for r in big.score(docs).collect()}
        got_s = {r.doc_id: r for r in gen.score(docs).collect()}
        for i in (1, 2, 3):
            assert got_s[i].n_ngrams == want_s[i].n_bigrams, i
            if want_s[i].avg_nll is None:
                assert got_s[i].avg_nll is None
            else:
                assert got_s[i].avg_nll == pytest.approx(want_s[i].avg_nll)
    finally:
        big.unpersist()
        gen.unpersist()


def test_score_backoff_tiers(spark, tri):
    """One doc per backoff tier of the trigram cascade, pinned against
    the reference cascade: observed trigram; unseen trigram in a seen
    trigram context; unseen trigram context falling to an observed
    bigram; fully-OOV (floored); and a 2-token doc (no trigrams →
    NULL score)."""
    phat, *_ = _ref_ngram_kn(CORPUS, order=3)
    floor = 1e-9
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),  # observed trigram
            (2, "the cat run"),  # seen ctx (the,cat), unseen trigram
            (3, "mat a cat"),  # unseen ctx (mat,a) -> bigram tier
            (4, "zzz qqq xxx"),  # fully OOV -> floor
            (5, "the cat"),  # < order tokens: no evidence
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tri.score(docs, p_floor=floor).collect()}
    assert got[1].avg_nll == pytest.approx(
        -math.log(phat(("the", "cat", "sat")))
    )
    assert got[2].avg_nll == pytest.approx(
        -math.log(phat(("the", "cat", "run")))
    )
    assert got[3].avg_nll == pytest.approx(
        -math.log(phat(("mat", "a", "cat")))
    )
    assert got[4].avg_nll == pytest.approx(-math.log(floor))
    assert got[5].n_ngrams == 0 and got[5].avg_nll is None
    assert all(got[i].n_ngrams == 1 for i in (1, 2, 3, 4))


def test_doc_ngrams_shape_and_shuffle_freedom(spark, corpus_df):
    """doc→gram expansion stays map-only (no Exchange); short/NULL
    docs emit nothing; a doc with exactly `order` tokens emits one
    row; window count is len−order+1."""
    tg = doc_ngrams(corpus_df, 3)
    plan = tg._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        tg._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan
    docs = spark.createDataFrame(
        [(None,), ("",), ("a b",), ("a b c",), ("a b c d",)], "text string"
    )
    assert doc_ngrams(docs, 3).count() == 3  # 0+0+0+1+2
    row = doc_ngrams(spark.createDataFrame([("x y z",)], "text string"), 3).first()
    assert (row.w1, row.w2, row.w3) == ("x", "y", "z")
    with pytest.raises(ValueError, match="order"):
        doc_ngrams(docs, 0)


def test_fit_validates(corpus_df):
    with pytest.raises(ValueError, match="order"):
        NgramKN.fit(corpus_df, order=1)
    with pytest.raises(ValueError, match="discount"):
        NgramKN.fit(corpus_df, order=3, discount=1.0)


def test_fit_refuses_corpus_with_no_windows(spark):
    """Every doc shorter than the order → no top-order evidence at all:
    fail loudly at fit (the alternative is a model of NULL divisions
    that scores everything at the floor)."""
    docs = spark.createDataFrame([("a b",), ("x",)], "text string")
    with pytest.raises(ValueError, match="no length-3"):
        NgramKN.fit(docs, order=3)


def test_natural_order_beats_shuffled(spark, tri):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_nll for r in tri.score(docs).collect()}
    assert got[1] < got[2]


def test_null_id_doc_keeps_its_score(spark, tri):
    docs = spark.createDataFrame(
        [(None, "the cat sat"), (7, "the cat sat")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tri.score(docs).collect()}
    assert rows[None].n_ngrams == 1
    assert rows[None].avg_nll == pytest.approx(rows[7].avg_nll)


def test_trigram_on_documents_table(spark, sf_dir):
    """End-to-end smoke at test SF: fit a trigram on half the corpus,
    score the other half — every doc gets a row, docs with trigram
    evidence get finite positive NLL."""
    from consume_kafka_avro_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 2 == 0)
    held = docs.where(F.col("doc_id") % 2 == 1)
    lm = NgramKN.fit(train, order=3)
    try:
        out = lm.score(held)
        assert out.count() == held.count()
        bad = out.where(
            (F.col("n_ngrams") > 0)
            & (F.col("avg_nll").isNull() | (F.col("avg_nll") <= 0))
        )
        assert bad.count() == 0
    finally:
        lm.unpersist()


def test_degenerate_repeated_token_corpus(spark):
    """Adversarial shape for the recursion: runs of one token make the
    same word its own context, predecessor, and successor — counts,
    continuation counts, and the cascade must still match the
    reference exactly (self-loops are where off-by-one gram windows
    or suffix-join mistakes would surface)."""
    corpus = ["a a a a b", "b b a a", "a b a b a"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    m = NgramKN.fit(df, order=3)
    try:
        phat, num, denom, n1, lam, p1 = _ref_ngram_kn(corpus, order=3)
        for k in (2, 3):
            got_p = {
                tuple(r[f"w{i + 1}"] for i in range(k)): r.p
                for r in m.probs[k].collect()
            }
            assert set(got_p) == set(num[k]), k
            for g, got in got_p.items():
                assert got == pytest.approx(phat(g), abs=1e-15), g
        vocab = list(p1)
        for ctx in denom[3]:
            assert sum(phat(ctx + (w,)) for w in vocab) == pytest.approx(
                1.0, abs=1e-12
            ), ctx
        rows = {
            r.doc_id: r
            for r in m.score(
                spark.createDataFrame(
                    [(1, "a a a"), (2, "b b b")], "doc_id long, text string"
                )
            ).collect()
        }
        assert rows[1].avg_nll == pytest.approx(-math.log(phat(("a", "a", "a"))))
        assert rows[2].avg_nll == pytest.approx(
            -math.log(max(phat(("b", "b", "b")), 1e-9))
        )
    finally:
        m.unpersist()


def test_save_load_scores_identically(spark, tmp_path, tri):
    """The deployed shape: persist the fitted tables, reopen in a
    fresh handle with NO corpus access, and score BIT-IDENTICALLY
    (probabilities are exact float64 through parquet)."""
    path = str(tmp_path / "kn3")
    tri.save(path)
    loaded = NgramKN.load(spark, path)
    assert loaded.order == 3
    assert loaded.discount == tri.discount
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat a cat zzz"), (3, "hi")],
        "doc_id long, text string",
    )
    want = {r.doc_id: (r.n_ngrams, r.avg_nll) for r in tri.score(docs).collect()}
    got = {
        r.doc_id: (r.n_ngrams, r.avg_nll) for r in loaded.score(docs).collect()
    }
    assert got == want
    loaded.unpersist()  # no-op on a loaded model; must not raise
    # save is an overwrite: saving again on top round-trips cleanly
    # for handles opened AFTER the overwrite (pre-overwrite handles go
    # stale, as with any overwritten parquet path — see save()'s note)
    tri.save(path)
    re_loaded = NgramKN.load(spark, path)
    assert re_loaded.order == 3
    assert re_loaded.p1.count() == tri.p1.count()


def test_order4_matches_reference(spark):
    """The recursion at depth: order-4 fit pinned value-for-value
    against the pure-Python reference at every tier (the CCNet filter
    is a 5-gram; 4 exercises >1 continuation-count hop)."""
    corpus = [t + " and then some more words follow here" for t in CORPUS]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    m = NgramKN.fit(df, order=4)
    try:
        phat, num, denom, n1, lam, p1 = _ref_ngram_kn(corpus, order=4)
        got_p1 = {r.w1: r.p1 for r in m.p1.collect()}
        assert got_p1 == pytest.approx(p1)
        for k in (2, 3, 4):
            got_p = {
                tuple(r[f"w{i + 1}"] for i in range(k)): r.p
                for r in m.probs[k].collect()
            }
            assert set(got_p) == set(num[k]), k
            for g, got in got_p.items():
                assert got == pytest.approx(phat(g), abs=1e-15), g
        # spot-check the 4-tier score cascade
        docs = spark.createDataFrame(
            [(1, corpus[0]), (2, "zzz qqq xxx www")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in m.score(docs).collect()}
        toks = corpus[0].split()
        want = sum(
            -math.log(max(phat(tuple(toks[i : i + 4])), 1e-9))
            for i in range(len(toks) - 3)
        ) / (len(toks) - 3)
        assert rows[1].avg_nll == pytest.approx(want)
        assert rows[2].avg_nll == pytest.approx(-math.log(1e-9))
    finally:
        m.unpersist()


def test_min_count_pruning_matches_pruned_reference(spark):
    """fit(min_count=2) must equal the KN model of the PRUNED top-order
    count table: the reference recursion run on raw counts with
    singletons dropped — pruned grams back off like unseen ones and
    the per-context mass law still holds at every tier."""
    corpus = CORPUS + ["the cat sat on the mat"]  # make some trigrams repeat
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    m = NgramKN.fit(df, order=3, min_count=2)
    try:
        # reference with the same pruning: drop top-order counts < 2
        phat, num, denom, n1, lam, p1 = _ref_ngram_kn(corpus, order=3)
        raw3 = {g: c for g, c in num[3].items() if c >= 2}
        assert raw3 and len(raw3) < len(num[3])  # pruning actually bit

        def _pruned_ref(texts):
            from collections import Counter

            res = _ref_ngram_kn(texts, order=3)
            return res

        # rebuild the pruned reference by hand: adj2 from pruned raw3
        # types, adj1 from raw2 types (mid-order types stay corpus-
        # derived — only the TOP table is pruned)
        from collections import Counter

        raw2 = Counter()
        for t in texts_lower(corpus):
            raw2.update(zip(t, t[1:]))
        adj2 = Counter()
        for g in raw3:
            adj2[g[1:]] += 1
        adj1 = Counter()
        for g in raw2:
            adj1[g[1:]] += 1
        n1_total = sum(adj1.values())
        p1r = {g[0]: c / n1_total for g, c in adj1.items()}
        numr = {2: adj2, 3: Counter(raw3)}
        denr, n1r, lamr = {}, {}, {}
        D = 0.75
        for k in (2, 3):
            denr[k], n1r[k] = Counter(), Counter()
            for g, c in numr[k].items():
                denr[k][g[:-1]] += c
                n1r[k][g[:-1]] += 1
            lamr[k] = {c_: D * n1r[k][c_] / denr[k][c_] for c_ in denr[k]}

        def phat_p(gram):
            k = len(gram)
            if k == 1:
                return p1r.get(gram[0], 0.0)
            lower = phat_p(gram[1:])
            ctx = gram[:-1]
            if gram in numr[k]:
                return (
                    max(numr[k][gram] - D, 0.0) / denr[k][ctx]
                    + lamr[k][ctx] * lower
                )
            if ctx in denr[k]:
                return lamr[k][ctx] * lower
            return lower

        for k in (2, 3):
            got_p = {
                tuple(r[f"w{i + 1}"] for i in range(k)): r.p
                for r in m.probs[k].collect()
            }
            assert set(got_p) == set(numr[k]), k
            for g, got in got_p.items():
                assert got == pytest.approx(phat_p(g), abs=1e-15), g
        vocab = list(p1r)
        for ctx in denr[3]:
            assert sum(phat_p(ctx + (w,)) for w in vocab) == pytest.approx(
                1.0, abs=1e-12
            ), ctx
    finally:
        m.unpersist()
    with pytest.raises(ValueError, match="min_count"):
        NgramKN.fit(df, order=3, min_count=0)
    with pytest.raises(ValueError, match="min_count=99"):
        NgramKN.fit(df, order=3, min_count=99)


def texts_lower(texts):
    return [t.lower().split() for t in texts]


def test_broadcast_model_scoring_is_mapside_and_identical(
    spark, tri, tmp_path
):
    """score(broadcast_model=True) must produce the identical frame
    with every model join a broadcast-hash join, so the corpus-sized
    gram table never shuffles before the final per-doc aggregate — the
    map-only petabyte-sweep shape.  Asserted on the DEPLOYED form (a
    save/load-ed model: its tables are parquet scans) — a freshly-fit
    model's tables re-derive their fit lineage in-plan, whose internal
    vocab-bounded joins may legitimately sort-merge."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq xxx"), (3, "hi")],
        "doc_id long, text string",
    )
    want = {r.doc_id: (r.n_ngrams, r.avg_nll) for r in tri.score(docs).collect()}
    tri.save(str(tmp_path / "m"))
    loaded = NgramKN.load(spark, str(tmp_path / "m"))
    fast = loaded.score(docs, broadcast_model=True)
    got = {r.doc_id: (r.n_ngrams, r.avg_nll) for r in fast.collect()}
    assert got == want
    plan = fast._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        fast._jdf.queryExecution(), "simple"
    )
    # all 2n−1 = 5 model joins broadcast; the only sort-merge allowed
    # is the final doc-sized id-restore join (both sides doc-keyed)
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_order5_matches_reference(spark):
    """CCNet's published filter order.  Fit a 5-gram on a corpus with
    enough length-5 windows and pin the top-order probs + the score of
    an observed 5-gram and a mid-tier backoff against the reference
    recursion (orders 2/3/4 are pinned exhaustively elsewhere; this
    closes the deployed-order loop)."""
    corpus = [t + " so it goes on and on again" for t in CORPUS] * 2
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    m = NgramKN.fit(df, order=5)
    try:
        phat, num, denom, n1, lam, p1 = _ref_ngram_kn(corpus, order=5)
        got_p = {
            tuple(r[f"w{i + 1}"] for i in range(5)): r.p
            for r in m.probs[5].collect()
        }
        assert set(got_p) == set(num[5])
        for g, got in got_p.items():
            assert got == pytest.approx(phat(g), abs=1e-15), g
        toks = corpus[0].split()
        obs = tuple(toks[:5])
        docs = spark.createDataFrame(
            [(1, " ".join(obs)), (2, "zzz " + " ".join(obs[1:]))],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in m.score(docs).collect()}
        assert rows[1].avg_nll == pytest.approx(-math.log(phat(obs)))
        assert rows[2].avg_nll == pytest.approx(
            -math.log(max(phat(("zzz",) + obs[1:]), 1e-9))
        )
    finally:
        m.unpersist()


def test_perplexity_buckets_ccnet_split(spark):
    """CCNet's head/middle/tail split: per-group exact-percentile cuts,
    lower-score docs land in head, ties at a cut go to the lower
    bucket, NULL scores get a NULL bucket, and groups calibrate
    independently (a score that is head in one language can be tail in
    another)."""
    from consume_kafka_avro_data_spark.operators.lm import (
        perplexity_buckets,
    )

    rows = [(i, "en", float(i)) for i in range(1, 10)]  # 1..9
    rows += [(100 + i, "de", 100.0 + i) for i in range(1, 10)]
    rows += [(999, "en", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, avg_nll double")
    out = perplexity_buckets(df, group_cols=["lang"])
    got = {r.doc_id: r.ppl_bucket for r in out.collect()}
    # en cuts at exact percentiles of 1..9: 1/3 -> 3.666, 2/3 -> 6.333
    assert [got[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # de: same shape at its own scale — per-group calibration
    assert [got[100 + i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert got[999] is None  # no evidence: neither head nor tail
    assert out.columns == ["doc_id", "lang", "avg_nll", "ppl_bucket"]

    # global cuts (no groups): one calibration across both languages —
    # every en score now precedes every de score
    g = {r.doc_id: r.ppl_bucket for r in perplexity_buckets(df).collect()}
    assert all(g[i] == "head" for i in range(1, 7))
    assert all(g[100 + i] == "tail" for i in range(4, 10))

    # validation
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(df, labels=("a", "b"))
    with pytest.raises(ValueError, match="ascending"):
        perplexity_buckets(df, cuts=(0.9, 0.1))


def test_perplexity_buckets_end_to_end(spark, sf_dir, tri):
    """The full CCNet shape on real data: score the documents table
    with the fitted LM, bucket per language, and every scored doc gets
    exactly one bucket with roughly balanced terciles."""
    from consume_kafka_avro_data_spark.operators.lm import (
        perplexity_buckets,
    )
    from consume_kafka_avro_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scored = tri.score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    out = perplexity_buckets(scored, group_cols=["lang"])
    counts = {
        (r.lang, r.ppl_bucket): r.n
        for r in out.where(F.col("avg_nll").isNotNull())
        .groupBy("lang", "ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    langs = {lang for lang, _ in counts}
    for lang in langs:
        tot = sum(n for (l, b), n in counts.items() if l == lang)
        for b in ("head", "middle", "tail"):
            share = counts.get((lang, b), 0) / tot
            assert 0.15 <= share <= 0.55, (lang, b, share)


# -- broadcast-dict Arrow scorer (round 9) -----------------------------------


def _score_map(df):
    return {
        r[0]: (r["n_ngrams"], r["avg_nll"]) for r in df.collect()
    }


def _assert_scores_equal(got, want):
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            # the only latitude between the engines is Math.log vs
            # libm log (≤ 1 ulp per gram)
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12), k


def test_score_broadcast_identical_to_relational(spark, tri):
    """LAW: score_broadcast == score on every convention the
    relational scorer pins — observed grams, backoff tiers, fully-OOV
    floor, <order-token docs (n_ngrams=0, NULL avg_nll), duplicate ids
    (grams merge per distinct id), NULL id, NULL text, and the JVM
    whitespace-tokenization edge cases (tabs, runs of spaces,
    leading/trailing whitespace, NBSP staying INSIDE a token)."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "zzz qqq xxx"),
            (3, "hi"),
            (4, None),
            (5, "THE  CAT\tSAT on the mat "),
            (6, " the dog"),
            (7, "the cat sat on a mat"),  # NBSP: inside ONE token
            (8, "a dog saw the cat"),
            (8, "the cat sat on the rug"),  # duplicate id: grams merge
            (None, "the dog sat"),
        ],
        "doc_id long, text string",
    )
    want = _score_map(tri.score(docs))
    fast = tri.score_broadcast(docs)
    assert [f.name for f in fast.schema.fields] == [
        "doc_id",
        "n_ngrams",
        "avg_nll",
    ]
    _assert_scores_equal(_score_map(fast), want)


def test_score_broadcast_plan_has_zero_joins(spark, tri):
    """The tier's whole point: the model rides as a broadcast
    VARIABLE, so the scoring plan has NO joins at all — one Arrow
    pandas-UDF pass plus one narrow per-id hash aggregate."""
    docs = spark.createDataFrame(
        [(1, "the cat sat")], "doc_id long, text string"
    )
    fast = tri.score_broadcast(docs)
    plan = fast._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        fast._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_score_broadcast_exact_huge_and_null_ids(spark, tri):
    """Round-9 review regression: ids stay JVM-side (only text crosses
    into Python), so int64 ids past 2^53 survive exactly even with a
    NULL id in the same Arrow batch — an id through the Arrow→pandas
    float64 widening would round 2^53+1 to 2^53."""
    big, big2 = (1 << 53) + 1, (1 << 53) + 3
    docs = spark.createDataFrame(
        [(big, "the cat sat"), (big2, "the dog sat"), (None, "a cat")],
        "doc_id long, text string",
    )
    got = _score_map(tri.score_broadcast(docs))
    assert set(got) == {big, big2, None}
    _assert_scores_equal(got, _score_map(tri.score(docs)))
    # string ids take the same JVM-side path
    sdocs = spark.createDataFrame(
        [("a", "the cat sat"), (None, "a dog")], "doc_id string, text string"
    )
    _assert_scores_equal(
        _score_map(tri.score_broadcast(sdocs)), _score_map(tri.score(sdocs))
    )


def test_score_broadcast_at_orders_2_and_5(spark, corpus_df):
    """The cascade generalizes: pin dict-vs-relational equality at the
    bigram edge and at CCNet's deployed order 5 (with pruning — the
    configuration the tier exists for)."""
    corpus5 = [t + " so it goes on and on again" for t in CORPUS] * 2
    df5 = spark.createDataFrame([(t,) for t in corpus5], "text string")
    docs = spark.createDataFrame(
        [
            (1, corpus5[0]),
            (2, "zzz " + " ".join(corpus5[0].split()[1:5])),
            (3, "so it goes"),
        ],
        "doc_id long, text string",
    )
    for order, src, kw in ((2, None, {}), (5, df5, {"min_count": 2})):
        m = NgramKN.fit(src if src is not None else corpus_df, order=order, **kw)
        try:
            _assert_scores_equal(
                _score_map(m.score_broadcast(docs)),
                _score_map(m.score(docs)),
            )
        finally:
            m.unpersist()


def test_local_tables_guard_and_reuse(spark, tri):
    """local_tables refuses past the row ceiling (an unpruned
    web-scale model belongs on the relational scorer), and a collected
    payload reuses across scoring calls (the ingest gate's
    collect-once shape) — including through an explicit broadcast."""
    with pytest.raises(ValueError, match="past the local-dict ceiling"):
        tri.local_tables(max_rows=3)
    local = tri.local_tables()
    assert local["order"] == 3
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "hi")],
        "doc_id long, text string",
    )
    want = _score_map(tri.score(docs))
    _assert_scores_equal(
        _score_map(tri.score_broadcast(docs, _local=local)), want
    )
    # a stale/mismatched payload is rejected eagerly
    local_bad = dict(local, order=4)
    with pytest.raises(ValueError, match="order 4"):
        tri.score_broadcast(docs, _local=local_bad)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_score_broadcast_property_random_corpora(spark, seed):
    """Property pin for the dict scorer's float/int subtleties: on
    seeded random corpora and probes (token soup with repeats so every
    backoff tier is exercised), score_broadcast == score at order 3."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "dd", "eee", "zz"]
    corpus = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 12)))
        for _ in range(12)
    ]
    probes = [
        " ".join(rng.choice(vocab + ["oov"]) for _ in range(rng.randint(0, 9)))
        for _ in range(8)
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    docs = spark.createDataFrame(
        list(enumerate(probes)), "doc_id long, text string"
    )
    m = NgramKN.fit(df, order=3)
    try:
        _assert_scores_equal(
            _score_map(m.score_broadcast(docs)), _score_map(m.score(docs))
        )
    finally:
        m.unpersist()


def test_local_tables_keyed_by_name_not_position(spark, corpus_df):
    """ADVICE r09: local_tables must key the broadcast dicts by column
    NAME, not row position — a probs/lams/p1 table whose physical
    column order diverged (schema evolution, an external writer
    round-tripping the model) would otherwise silently mis-key the
    dict tier and shift every score with no error."""
    m = NgramKN.fit(corpus_df, order=3)
    try:
        want = m.local_tables()
        # reverse every table's physical column order in place —
        # the selects derive from the cached counts, so _resident
        # (what unpersist releases) is untouched
        for k in list(m.probs):
            m.probs[k] = m.probs[k].select(*reversed(m.probs[k].columns))
        for k in list(m.lams):
            m.lams[k] = m.lams[k].select(*reversed(m.lams[k].columns))
        m.p1 = m.p1.select(*reversed(m.p1.columns))
        got = m.local_tables()
        assert got == want
        # and the deployed surface stays equal to the relational scorer
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "zzz qqq")],
            "doc_id long, text string",
        )
        _assert_scores_equal(
            _score_map(m.score_broadcast(docs)), _score_map(m.score(docs))
        )
    finally:
        m.unpersist()


def test_flat_kernel_identical_to_tuple_kernel(spark, tri, corpus_df):
    """Round-10 flat kernel (int-interned vocab + per-batch gram memo,
    flatten_local_tables): value-identical to the round-9 tuple kernel
    and to the relational scorer — including the OOV-collapse argument
    (distinct OOV tokens in the same positions score identically, OOV
    in context vs final position, repeated grams that exercise the
    memo) and duplicate/NULL ids."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "zzz cat sat"),       # OOV in context position
            (3, "qqq cat sat"),       # DIFFERENT OOV, same positions
            (4, "the cat zzz"),       # OOV in final position
            (5, "the cat sat the cat sat the cat sat"),  # memo hits
            (6, None),
            (7, "hi"),
            (7, "the dog sat"),       # duplicate id
            (None, "a dog"),
        ],
        "doc_id long, text string",
    )
    want = _score_map(tri.score(docs))
    flat = _score_map(tri.score_broadcast(docs, kernel="flat"))
    tup = _score_map(tri.score_broadcast(docs, kernel="tuple"))
    _assert_scores_equal(flat, want)
    _assert_scores_equal(tup, want)
    # the OOV-token identity must not leak into the score
    assert flat[2] == flat[3]
    # both kernels at order 5 with pruning (the deployed shape)
    corpus5 = [t + " so it goes on and on again" for t in CORPUS] * 2
    df5 = spark.createDataFrame([(t,) for t in corpus5], "text string")
    m = NgramKN.fit(df5, order=5, min_count=2)
    try:
        w5 = _score_map(m.score(docs))
        _assert_scores_equal(
            _score_map(m.score_broadcast(docs, kernel="flat")), w5
        )
        _assert_scores_equal(
            _score_map(m.score_broadcast(docs, kernel="tuple")), w5
        )
    finally:
        m.unpersist()
    with pytest.raises(ValueError, match="kernel must be"):
        tri.score_broadcast(docs, kernel="nope")


def test_score_broadcast_payload_layout_wins(spark, tri):
    """A provided _local payload's LAYOUT picks the kernel regardless
    of the kernel= argument — re-keying an existing broadcast per call
    would defeat the collect-once contract."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq")],
        "doc_id long, text string",
    )
    want = _score_map(tri.score(docs))
    flat_payload = tri.local_tables_flat()
    tup_payload = tri.local_tables()
    # cross the payloads against the opposite kernel= value
    _assert_scores_equal(
        _score_map(tri.score_broadcast(docs, kernel="tuple", _local=flat_payload)),
        want,
    )
    _assert_scores_equal(
        _score_map(tri.score_broadcast(docs, kernel="flat", _local=tup_payload)),
        want,
    )
    # and through a pre-broadcast flat payload (the streaming shape)
    bc = spark.sparkContext.broadcast(flat_payload)
    _assert_scores_equal(_score_map(tri.score_broadcast(docs, _local=bc)), want)
    bc.unpersist()
