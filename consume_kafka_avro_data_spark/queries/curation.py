"""Training-data curation queries (charter EXT surface, SURVEY §2.7/§2.8).

The corpus-statistics + sampling + decontamination closure of an LLM
data pipeline: deterministic stratified sampling, vocabulary statistics,
Zipf head, unigram-LM perplexity scoring (the CCNet-style quality
filter), eval-set n-gram decontamination, and fixed-iteration PageRank
over the materialized SPO graph (the reference's `objects`/
`relationships` tables, `src/Database.h:23-31`, queried analytically).

Cross-engine exactness tricks reused from the rest of the catalog:
fixed-width lowercase md5 hex prefixes compare identically as strings
and numbers; double folds pinned to an explicit order (sort_array +
F.aggregate ≡ DuckDB list(ORDER BY) + list_reduce) are bit-identical;
`ln`/IEEE division match bit-for-bit between the JVM and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from consume_kafka_avro_data_spark.functions.textops import (
    census_token_stream,
    exploded_char_grams,
    exploded_word_grams,
    lower_tokens,
)
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


def _lower_tokens() -> F.Column:
    # the shared census tokenizer (functions/textops) — kept as a
    # module-local alias for this file's many call sites
    return lower_tokens()


def word_grams(n: int = 8) -> F.Column:
    """Word ``n``-gram array over ``text`` (lowercased, space-split) —
    the declarative Column form of the decontamination gram shape.
    Since r11 every HOT consumer (``q_decontaminate``,
    ``q_decontaminate_bloom``, ``duplicate_token_spans``, the streaming
    contamination gate, and the bench's crossover measurement) uses the
    value-identical codegen'd exploded form instead
    (functions/textops.exploded_word_grams — the transform(sequence)
    lambda here is interpreted per window, measured ~3× the whole
    query's cost at sf0.1); this Column form remains the compositional
    API and the oracle-documentation twin, pinned equal by pytest.
    Docs shorter than ``n`` tokens produce no grams (both engines)."""
    t = _lower_tokens()
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN '8000'
                    WHEN 'zh' THEN 'e666'
                    ELSE 'cccc' END
    """,
    tags=("U4", "curation"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (data-mixing step): keep ~50%
    of English, ~90% of Chinese, ~80% of everything else, decided by a
    content-addressed hash bucket — no RNG, so the sample is stable
    under re-runs, repartitioning, and engine changes.  Pure codegen
    (md5 + string compare on fixed-width hex); the filter runs at scan
    time with zero shuffles at any scale."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = (
        F.when(F.col("lang") == "en", F.lit("8000"))
        .when(F.col("lang") == "zh", F.lit("e666"))
        .otherwise(F.lit("cccc"))
    )
    return d.where(bucket < thr).select(
        "doc_id", "lang", "source", bucket.alias("bucket")
    )


@query(
    "q_vocab_stats",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    v AS (SELECT tok, count(*) AS freq FROM tok WHERE tok <> '' GROUP BY tok)
    SELECT CAST(sum(freq) AS BIGINT)                       AS n_tokens,
           CAST(count(*) AS BIGINT)                        AS n_types,
           CAST(count(*) FILTER (freq = 1) AS BIGINT)      AS n_hapax,
           CAST(count(*) AS DOUBLE) / CAST(sum(freq) AS DOUBLE) AS ttr
    FROM v
    """,
    tags=("U7", "A2", "curation"),
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: token count, type count, hapax
    legomena, type-token ratio.  Two partial+final hash aggregates
    (token→freq, then one global row); integer sums are exact so no
    decimal machinery is needed.  The vocab aggregate is the same
    shuffle any tf-idf / unigram-LM pass performs — at 100 TB it is
    bounded by vocabulary size, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_lower_tokens()).alias("tok")).where(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return vocab.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("freq").cast("double")).alias("ttr"),
    )


@query(
    "q_zipf_topterms",
    oracle="""
    SELECT tok, CAST(freq AS BIGINT) AS freq,
           CAST(row_number() OVER (ORDER BY freq DESC, tok) AS INT) AS rank
    FROM (SELECT tok, count(*) AS freq
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
                FROM documents)
          WHERE tok <> '' GROUP BY tok)
    ORDER BY freq DESC, tok
    LIMIT 50
    """,
    tags=("U7", "W5", "curation"),
)
def q_zipf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head of the corpus: top-50 tokens by frequency with a
    deterministic (freq desc, token asc) total order.  Spark compiles
    the sort+limit to TakeOrdered (per-partition heap + 50-row driver
    merge) over the vocab-sized aggregate — no global sort of the
    vocabulary ever materializes."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(_lower_tokens()).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    return (
        vocab.orderBy(F.desc("freq"), F.asc("tok"))
        .limit(50)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("tok", F.col("freq").cast("long").alias("freq"), "rank")
    )


@query(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source, array_to_string(t[i : i + 7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
    ),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
    train_g AS (SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0')
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM train_g t JOIN eval_g e USING (g)
    GROUP BY t.doc_id
    """,
    tags=("U5", "U7", "curation"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs (every source but
    the held-out 'src0' eval slice) that share any word 8-gram with the
    eval set, with the count of distinct shared 8-grams.  The eval-side
    distinct-gram set is vocabulary-sized and broadcast; the train side
    streams through the semi-ish join — the standard at-scale shape
    (eval sets are tiny next to the corpus).  Docs shorter than 8
    tokens produce no grams on either engine.

    Optimization (r11, guide §2.3/§2.4): the broadcast semi-join runs
    BEFORE the per-doc distinct — the exact eval-gram hash relation is
    itself a perfect prefilter, so the distinct's exchange carries only
    matching grams (a handful of rows) instead of the whole train
    corpus' gram stream; ``count(distinct g)`` after the inner join is
    value-identical to the old distinct-then-count (eval_g is already
    distinct).  Plan: the full-corpus hashpartitioning(doc_id, g)
    Exchange ahead of the join is gone (plans/r11/q_decontaminate_
    {before,after}.txt).  Gram construction is the codegen'd exploded
    form (see functions/textops.exploded_word_grams)."""
    d = load_table(spark, sf_dir, "documents")
    grams = exploded_word_grams(d, "doc_id", "source", n=8)
    eval_g = grams.where(F.col("source") == "src0").select("g").distinct()
    train = grams.where(F.col("source") != "src0").select("doc_id", "g")
    return (
        # eval_g is the EVAL corpus' gram set — eval sets are fixed-size
        # by construction (they don't grow with training data), so the
        # broadcast is bounded; this is the standard decontamination shape
        train.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


@query(
    "q_decontaminate_bloom",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source, array_to_string(t[i : i + 7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
    ),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
    train_g AS (SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0')
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM train_g t JOIN eval_g e USING (g)
    GROUP BY t.doc_id
    """,
    tags=("U5", "U7", "curation"),
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_decontaminate's 100 TB shape: two-phase bloom decontamination.
    Phase 1 prefilters the training gram stream with a BroadcastBloom
    built over the eval set's distinct grams — a pure-JVM k-bit-test
    expression against an array<long> literal carrying ~2 bytes/gram
    (vs ~50+ bytes/gram for the broadcast hash relation the exact join
    ships), no shuffle, no join, no false negatives.  Phase 2
    exact-verifies only the surviving candidates (true matches + ~0.2%
    false positives) against the broadcast eval grams, so the FINAL
    result is exact — same oracle as q_decontaminate, and the driver
    hash-checks the two queries return identical rows.  The per-doc
    distinct also runs AFTER the prefilter, so its shuffle carries
    candidates, not the whole corpus' grams.

    Tiering honesty (the q_interval_histogram pattern): at bench SF
    the bloom form is SLOWER than the exact join — its fixed costs
    (eval checkpoint, two build jobs, one-time codegen of the bit
    array literal) exceed what pruning a 224k-row distinct saves; the
    measured warm probe itself is near-free (+0.1 s on a 1.5 s scan,
    0.8% selectivity).  The crossover is where the corpus gram stream
    dwarfs those fixed costs and the eval hash relation's executor
    footprint matters — i.e. the 100 TB deployment this variant
    exists for; q_decontaminate remains the small-corpus form."""
    from consume_kafka_avro_data_spark.operators.bloom import BroadcastBloom

    d = load_table(spark, sf_dir, "documents")
    grams = exploded_word_grams(d, "doc_id", "source", n=8)
    eval_g = grams.where(F.col("source") == "src0").select("g").distinct()
    # The bloom BUILD traverses the eval subtree twice (count for m,
    # positions collect) — checkpoint for exactly that window, then
    # unpersist: a checkpoint referenced by the RETURNED plan would
    # leak its blocks for the session (freed only on JVM GC — the leak
    # class bench.py works around with System.gc()).  The verify join
    # below therefore re-derives eval_g from lineage at consumer time —
    # one extra src0 tokenize pass, bounded by the fixed-size eval set.
    # (r12 measured the persist()-pin alternative NEGATIVE here:
    # interleaved best-of-3 2.87 s ckpt vs 3.78 s persist — the saved
    # scheduler job costs less than cache materialization + losing AQE
    # inside the cached plan; same verdict in curation and streaming.)
    eval_ck = eval_g.localCheckpoint(eager=True)
    try:
        from consume_kafka_avro_data_spark.operators.bloom import (
            BITS_PER_ITEM,
        )

        n_eval = eval_ck.count()
        bloom = BroadcastBloom.build(
            eval_ck, "g", n_bits=BITS_PER_ITEM * max(n_eval, 8)
        )
    finally:
        eval_ck.unpersist()
    # phase 1: JVM bit-test only.  prefilter (not bare might_contain)
    # because ``g`` is a derived column: the fence keeps the probe
    # predicate's 4k gram references from each re-building the gram
    # (r11, measured 4.8 s → 1.3 s on this stream; see operators/bloom)
    cand = bloom.prefilter(
        grams.where(F.col("source") != "src0"), "g"
    ).select("doc_id", "g")
    # r11: the per-candidate distinct folds into count(distinct g)
    # AFTER the exact verify join — one less Exchange over the
    # candidate stream, value-identical (the join is FP-free and
    # eval_g is distinct, so dup (doc_id, g) pairs collapse either way)
    return (
        cand.join(F.broadcast(eval_g), "g")  # phase 2: exact verify
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


@query(
    "q_perplexity",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             generate_subscripts(t, 1) AS pos,
             unnest(t) AS tok
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
    ),
    tkf AS (SELECT * FROM tk WHERE tok <> ''),
    uni AS (SELECT tok, count(*) AS cnt FROM tkf GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM uni),
    lp AS (SELECT tok, CAST(CAST(ln(CAST(cnt AS DOUBLE) / n) AS FLOAT) AS DOUBLE)
                         AS lp FROM uni, tot),
    per AS (
      SELECT doc_id, count(*) AS n_toks,
             list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s
      FROM tkf JOIN lp USING (tok)
      GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_toks AS BIGINT)            AS n_tokens,
           -s / CAST(n_toks AS DOUBLE)       AS avg_nll
    FROM per
    """,
    tags=("U7", "curation"),
)
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (the CCNet-style quality filter):
    fit token log-probs on the corpus itself, then score each document
    by average negative log-likelihood.  The unigram model is
    vocabulary-sized and broadcast back onto the token stream; the
    per-doc sum folds in token-position order (sort_array + aggregate),
    so the double accumulation is bit-identical to the DuckDB twin.
    At 100 TB the two passes are both corpus-shuffles bounded by vocab
    size and doc count — the same shape as tf-idf."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.posexplode(_lower_tokens()).alias("pos", "tok"))
        .where(F.col("tok") != "")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = uni.agg(F.sum("cnt").cast("double").alias("n"))
    # log-probs round through float32 (then back to double for the
    # summation): JVM Math.log and libm ln() differ by 1 ulp on some
    # arguments (observed on 15 of ~60k vocab entries at sf0.1), and
    # float32 rounding erases a 1-ulp double discrepancy except on a
    # ~2^-29-probability rounding boundary — the sums then accumulate
    # identical doubles in identical order on both engines
    lp = uni.crossJoin(F.broadcast(tot)).select(  # tot: single row
        "tok",
        F.log(F.col("cnt").cast("double") / F.col("n"))
        .cast("float")
        .cast("double")
        .alias("lp"),
    )
    per = (
        # lp is vocab-sized (unbounded at scale): no hint — planner
        # broadcasts while small, shuffles on tok at 100 TB
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("lp")))
                    ),
                    lambda s: s["lp"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("s"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_tokens"),
        (-F.col("s") / F.col("n_toks").cast("double")).alias("avg_nll"),
    )


def _pagerank_oracle(iters: int = 3) -> str:
    """Chained-CTE PageRank twin: per-iteration in-rank sums fold in
    source-node order via list(... ORDER BY src) + list_reduce, matching
    the Spark side's sort_array + F.aggregate fold exactly."""
    ctes = ["""
    fwd AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
                      't:' || event_type               AS dst
      FROM events
    ),
    edges AS (
      SELECT src, dst FROM fwd
      UNION ALL
      SELECT dst AS src, src AS dst FROM fwd
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
               FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
    r{k} AS (
      SELECT n.node,
             CAST('0.15' AS DOUBLE) / nn.n
               + CAST('0.85' AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS rank
      FROM nodes n
      CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node,
               list_reduce(list(r.rank / d.deg ORDER BY e.src),
                           (a, b) -> a + b) AS s
        FROM edges e
        JOIN r{k - 1} r ON r.node = e.src
        JOIN outdeg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
    return (
        "WITH " + ",".join(ctes)
        + f"\n    SELECT node, rank AS pagerank FROM r{iters}"
    )


@query("q_pagerank", oracle=_pagerank_oracle(3), tags=("J5", "A2", "graph"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (d=0.85, 3 rounds) over the bipartite
    SPO graph the reference materializes (users ↔ event types; the
    `objects`/`relationships` closure of src/Database.h:23-31).  Each
    round is one shuffle keyed on the destination node; in-rank
    contributions fold in source-node order so the double sums are
    bit-identical across engines.  At scale the per-node fold state is
    bounded by in-degree — hot nodes would take the two-level
    salt+partial-merge form, traded here for provable accumulation
    order.  N (node count) is a driver-side scalar, as in any
    iterative driver program."""
    ev = load_table(spark, sf_dir, "events")
    fwd = (
        ev.select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # localCheckpoint (not persist): the 3 stacked rounds otherwise
    # compose into one deep plan whose analysis dominates wall time on
    # anything but huge inputs; materialized edge/degree tables + a
    # per-round checkpoint keep every round's plan shallow (7.5 s →
    # 2.5 s at sf0.1, values bit-identical)
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select("src", "dst", (F.col("rank") / F.col("deg")).alias("c"))
        )
        sums = contrib.groupBy("dst").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("src"), F.col("c")))),
                    lambda s: s["c"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("s")
        )
        ranks = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n)
                + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=True).select(
            F.col("node").alias("node"), F.col("rank").alias("rank")
        )
    return ranks.select("node", F.col("rank").alias("pagerank"))


# ---------------------------------------------------------------------------
# end-to-end curation: quality gate → exact dedup → semantic dedup
# ---------------------------------------------------------------------------

_CURATION_QT = 0.84  # quality threshold; rounded(6) scores are engine-identical

# shared WITH-clause body: quality scores → gate → fingerprint collapse →
# canonical survivors.  Used verbatim by the final oracle AND by the
# lazy factory (to load the survivor embedding sample the centroids
# derive from), so the survivor set cannot drift between them.
_O_CURATION_STAGES = """
    q AS (SELECT doc_id, round(
               CAST(0.25 AS DOUBLE) * least(n_tokens / CAST(20.0 AS DOUBLE),
                                            CAST(1.0 AS DOUBLE))
             + CAST(0.25 AS DOUBLE) * least(ttr * 2, CAST(1.0 AS DOUBLE))
             + CAST(0.25 AS DOUBLE) * alpha_ratio
             + CAST(0.25 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - max_token_share),
             6) AS quality
          FROM feats),
    qpass AS (SELECT d.doc_id, md5(lower(coalesce(d.text, ''))) AS fp
              FROM documents d JOIN q USING (doc_id)
              WHERE q.quality >= {qt}),
    canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM qpass GROUP BY fp),
    d2c AS (SELECT p.doc_id, c.canonical_id FROM qpass p JOIN canon c USING (fp)),
    surv AS (SELECT doc_id FROM d2c WHERE doc_id = canonical_id)
"""


def _o_curation_pipeline(
    threshold: float = 0.35, n_centroids: int | None = None, seed: int = 42
) -> str | None:
    """DuckDB twin of q_curation_pipeline.  Lazy factory (the _o_ivf
    pattern): replays the quality gate + fingerprint collapse in DuckDB
    to find the survivors, loads THEIR embeddings (ORDER BY vec_id
    LIMIT 4096 — the same driver-bounded sample kmeans_centroids takes
    from the survivor frame), re-derives k from the SAME survivor count
    (auto_n_centroids, when ``n_centroids=None``) and the deterministic
    centroids with the shared numpy Lloyd's routine, and inlines them
    as literals.  Degrades to rows-only (None) when the parquet is
    unreadable or the survivor set is empty."""
    from consume_kafka_avro_data_spark.queries.similarity import (
        _O_QUALITY,
        ORACLE_SAMPLE_LIMIT as _OSL,
        oracle_sf_dir,
        vec_sql,
    )

    sf_dir = oracle_sf_dir()
    stages = _O_CURATION_STAGES.format(qt=repr(_CURATION_QT))
    try:
        import duckdb
        import numpy as np

        from consume_kafka_avro_data_spark.operators.similarity import (
            auto_n_centroids,
            lloyd_unit_kmeans,
        )

        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        rows = con.sql(
            f"""
            WITH feats AS ({_O_QUALITY}), {stages}
            SELECT e.embedding FROM embeddings e
            JOIN surv ON e.vec_id = surv.doc_id
            ORDER BY e.vec_id LIMIT {_OSL}
            """
        ).fetchall()
        (n_surv,) = con.sql(
            f"""
            WITH feats AS ({_O_QUALITY}), {stages}
            SELECT count(*) FROM embeddings e
            JOIN surv ON e.vec_id = surv.doc_id
            """
        ).fetchone()
        con.close()
    except Exception:
        return None
    if not rows:
        return None
    x = np.array([r[0] for r in rows], dtype=np.float64)
    if n_centroids is None:
        n_centroids = auto_n_centroids(int(n_surv), x.shape[1])
    cent = lloyd_unit_kmeans(x, k=n_centroids, seed=seed)

    from consume_kafka_avro_data_spark.operators.similarity import (
        o_quantize,
        quantize_np,
    )

    scores = ", ".join(
        f"list_dot_product(qv, {vec_sql(qc)})" for qc in quantize_np(cent)
    )
    return f"""
    WITH feats AS ({_O_QUALITY}), {stages},
    a AS (
      SELECT vec_id, qv, list_indexof(s, list_max(s)) AS cell
      FROM (
        SELECT se.vec_id, se.qv, [{scores}] AS s
        FROM (SELECT e.vec_id, {o_quantize()} AS qv
              FROM embeddings e JOIN surv ON e.vec_id = surv.doc_id) se
      )
    ),
    w AS (
      SELECT x.vec_id AS vec_id, MIN(y.vec_id) AS dup_of
      FROM a x JOIN a y
        ON x.cell = y.cell AND y.vec_id < x.vec_id
      WHERE list_dot_product(x.qv, y.qv)
            / (sqrt(list_dot_product(x.qv, x.qv))
               * sqrt(list_dot_product(y.qv, y.qv))) >= {threshold!r}
      GROUP BY x.vec_id
    )
    SELECT d.doc_id,
           CASE WHEN q.quality < {_CURATION_QT!r} THEN 'quality'
                WHEN d2c.canonical_id <> d.doc_id THEN 'exact'
                WHEN w.dup_of IS NOT NULL THEN 'semantic'
                ELSE 'kept' END AS stage,
           CASE WHEN q.quality < {_CURATION_QT!r} THEN NULL
                WHEN d2c.canonical_id <> d.doc_id THEN d2c.canonical_id
                ELSE w.dup_of END AS witness
    FROM documents d
    JOIN q USING (doc_id)
    LEFT JOIN d2c USING (doc_id)
    LEFT JOIN w ON w.vec_id = d.doc_id
    """


def curation_verdicts(
    docs: DataFrame,
    emb: DataFrame,
    qt: float = _CURATION_QT,
    threshold: float = 0.35,
    n_centroids: int | None = None,
) -> DataFrame:
    """Three-stage curation funnel: quality gate → exact fingerprint
    dedup (min-id canonical) → SemDeDup-style semantic dedup over the
    survivors' embeddings.  One verdict row per document:
    (doc_id, stage ∈ {quality, exact, semantic, kept}, witness)."""
    from consume_kafka_avro_data_spark.operators.similarity import (
        semantic_dedup,
    )
    from consume_kafka_avro_data_spark.operators.text import quality_score

    # One evaluation of the quality fold + fingerprint, checkpointed as
    # a FIXED-WIDTH frame (id, score, 32-hex) — no text — because three
    # consumers re-traverse it (the k-means sample collect, the sweep
    # side, the verdict assembly) and Spark shares no subtrees across
    # actions.  Same localCheckpoint-not-persist reasoning as q_pagerank
    # — and r12 MEASURED the persist() alternative: interleaved
    # best-of-3 2.73 s ckpt vs 3.01 s persist on this query (3.78 vs
    # 2.87 on q_decontaminate_bloom, ~3x worse per batch in streaming
    # dedup), so the eager checkpoint stays.
    s = (
        quality_score(docs)
        .select(
            "doc_id",
            "quality",
            F.md5(F.lower(F.coalesce(F.col("text"), F.lit("")))).alias("_fp"),
        )
        .localCheckpoint(eager=True)
    )
    qpass = s.where(F.col("quality") >= qt)
    canon = qpass.groupBy("_fp").agg(F.min("doc_id").alias("canonical_id"))
    d2c = (
        qpass.select("doc_id", "_fp")
        .join(canon, "_fp")
        .select("doc_id", "canonical_id")
    )
    # The auto-k semantic stage's eager phase runs DIRECTLY on the lazy
    # survivor join (r12, guide §2.2).  Until r11 the join was
    # localCheckpoint'd first so the two eager params actions (k-means
    # sample + corpus count) would not each re-run it, then unpersisted
    # (a checkpoint referenced by the returned plan leaks its blocks
    # for the session — that comment's concern stands and is still
    # honored: no checkpoint outlives this function).  But the params
    # phase now needs ONE action in the common case (the count is fused
    # into the sample whenever the survivor set fits the 4096-row
    # sample — semantic_dedup_params r12), so the checkpoint bought one
    # recompute avoidance at the cost of an eager materialization job +
    # write: measured 0.23 s checkpoint + 0.15 s params vs ~0.15 s
    # params-direct at sf0.1.  The recompute itself is cheap either way
    # — surv_emb reads ``s``'s checkpoint, so re-deriving it is two
    # id-equi joins, not the quality fold.  Past the sample size the
    # params phase runs two actions (sample + count), each that same
    # cheap recompute — still no worse in passes than checkpoint +
    # sample + count was.
    from consume_kafka_avro_data_spark.operators.similarity import (
        semantic_dedup_params,
    )

    surv_emb = emb.join(
        d2c.where(F.col("doc_id") == F.col("canonical_id")).select(
            F.col("doc_id").alias("vec_id")
        ),
        "vec_id",
    )
    # THE shared derivation (semantic_dedup_params) — a local copy
    # of the k/blocks formulas would drift from the oracles
    centroids, k, n_blocks = semantic_dedup_params(
        surv_emb, n_centroids=n_centroids
    )
    sem = semantic_dedup(
        surv_emb,
        threshold=threshold,
        n_centroids=k,
        centroids=centroids,
        n_blocks=n_blocks,
    )

    return (
        s.select("doc_id", "quality")
        .join(d2c, "doc_id", "left")
        .join(
            sem.select(F.col("vec_id").alias("doc_id"), "dup_of"),
            "doc_id",
            "left",
        )
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


@query(
    "q_curation_pipeline",
    oracle=_o_curation_pipeline,
    tags=("U4", "U5", "U6", "U7", "curation"),
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation, the three-stage funnel a training-
    data pipeline actually runs: (1) quality gate (oracle-checked
    composite score >= tau_q), (2) exact dedup (fingerprint collapse,
    min-id canonical), (3) SemDeDup-style semantic dedup over the
    SURVIVORS' embeddings (centroids sampled from the survivor frame -
    stage 3 never sees stage-1/2 rejects).  One verdict row per
    document.

    Scale: stage 1 is map-only JVM expressions, stage 2 a map-side-
    combinable min-agg on the fingerprint, stage 3 the fused sum|cell|^2
    sweep (operators/similarity.semantic_dedup); the verdict assembly
    is two id-equi-joins.  Fully oracle-checked - the DuckDB twin
    replays the survivor set to re-derive the SAME k-means sample
    (see _o_curation_pipeline)."""
    return curation_verdicts(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


def duplicate_token_spans(
    d: DataFrame,
    n: int = 10,
    keep_first: bool = False,
    hash_grams: bool = False,
    char_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans (ExactSubstr dedup, the word-level
    form of Lee et al. 2021 "Deduplicating Training Data Makes Language
    Models Better"): every word ``n``-gram window occurring more than
    once in the corpus marks its ``n`` tokens as duplicated; overlapping
    duplicated windows within a doc merge into maximal spans
    (gap-and-islands over window start positions).  Returns one row per
    (doc_id, span_id) with 1-based inclusive [start_tok, end_tok].
    With ``keep_first`` the canonical occurrence of each duplicated
    gram — lexicographic min (doc_id, pos) — is NOT marked, so exactly
    one copy of every duplicated region survives a downstream scrub
    (the remove-all default is the census/audit form).

    Scale shape: two shuffles, both linear in corpus tokens — (1) the
    occurrence count partitions by the gram, and (2) the island merge
    partitions by doc_id (bounded: one partition holds one doc's
    window starts).  No all-pairs stage anywhere — this is the property
    that lets suffix-array-style span dedup run on a corpus scan.

    ``hash_grams`` is the 100 TB form of shuffle (1): the gram STRING
    (n·avg_token bytes per row, ~70 B at n=10) is replaced by its
    ``xxhash64`` (8 B) BEFORE the exchange, shrinking the heaviest
    shuffle ~9× at the cost of ~2⁻⁶⁴·pairs false dup marks (a hash
    collision marks both colliding windows duplicated — in the
    census/remove-all policies it can only OVER-mark, never miss a
    real duplicate).  The exact (default) form is what the SQL oracles
    certify; the equivalence of the two forms on real data is pinned
    by pytest.  ``hash_grams`` is REFUSED together with ``keep_first``:
    a collision would merge two grams' canonical elections, and the
    loser gram's own canonical occurrence — possibly the sole copy of
    never-duplicated text — would be scrubbed, breaking the
    exactly-one-copy-survives contract (over-marking is acceptable for
    a census; silently deleting a canonical is not).

    ``char_grams=True`` (round 10) is Lee 2021's CANONICAL granularity:
    windows are character ``n``-grams over ``lower(text)`` (use n ≈ 50
    — the paper's 50-byte threshold) and the returned spans are
    1-based inclusive CHARACTER offsets ``[start_tok, end_tok]`` into
    the lowercased text (same column names, char units).  What it buys
    over the word tier: duplicated regions are detected at character
    resolution, so tokenization variants of the same text ("foo.bar"
    glued vs "foo . bar" spaced, shifted punctuation, different
    whitespace attachment) still expose their long IDENTICAL character
    runs between the variant points — the word tier needs ``n`` whole
    identical tokens in a row and sees none across such an edit, while
    the char tier recovers every ≥n-char identical stretch on either
    side of it (pinned on designed punctuation-variant duplicates).
    Same gap-and-islands merge, keyed by char offset; ``keep_first``
    and ``hash_grams`` compose identically (same refusal).

    SCALING note (the tradeoff at 100 TB): the marking shuffle carries
    one row per WINDOW.  Word windows ≈ tokens ≈ chars/(avg_token+1);
    char windows ≈ chars — roughly 6× the rows of the word tier on
    English-like text, and with exact (unhashed) grams a char@50 key
    is ~50 B vs the word tier's ~n·6 B: comparable shuffled bytes,
    ~6× the rows.  Deploy the char tier with ``hash_grams=True``
    (8-byte keys), where the shuffle settles at ~6× the word tier's
    volume — the price of tokenization robustness; size
    ``spark.sql.shuffle.partitions`` accordingly.
    """
    if hash_grams and keep_first:
        raise ValueError(
            "hash_grams is incompatible with keep_first: a hash "
            "collision merges two grams' canonical elections and can "
            "scrub a gram's only copy; use the exact form for keep-one"
        )
    if char_grams:
        # one window per char position of lower(text); docs shorter
        # than n emit none.  The length guard matters: sequence(1,
        # L-n+1) with L<n would STEP DOWN (Spark's sequence fills
        # descending when stop < start) and mint phantom positions.
        # Both the window bound and the slices derive from the SAME
        # lowered string: lowercasing can change string length
        # (U+0130 'İ' → "i̇" is 1 → 2 chars), so counting windows
        # with length(text) would silently miss tail windows of the
        # lowered form — and the returned offsets index the lowered
        # text, so they must be consistent with it (r10 advisor).
        # r11: codegen'd exploded form — lower() once per doc, one
        # substring per window (see textops.exploded_char_grams).
        wins = exploded_char_grams(d, "doc_id", n=n, pos_col="pos")
    else:
        # r11: codegen'd exploded form of posexplode(word_grams(n)) —
        # the window-start sequence is already 1-based, so the position
        # arrives directly instead of via p0 + 1
        wins = exploded_word_grams(d, "doc_id", n=n, pos_col="pos")
    if hash_grams:
        wins = wins.select("doc_id", "pos", F.xxhash64("g").alias("g"))
    wg = Window.partitionBy("g")
    marked = wins.withColumn("c", F.count(F.lit(1)).over(wg))
    if keep_first:
        # canonical occurrence = lexicographic min (doc_id, pos) as a
        # STRUCT min (the oracle's ROW min) — injective for any doc
        # length, unlike an arithmetic doc_id*K+pos encoding, which
        # collides once pos reaches K and would silently spare BOTH
        # colliding occurrences from the scrub
        occ = F.struct("doc_id", "pos")
        marked = marked.withColumn("canon", F.min(occ).over(wg)).where(
            (F.col("c") > 1) & (occ != F.col("canon"))
        )
    else:
        marked = marked.where(F.col("c") > 1)
    dup = marked.select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dup.withColumn(
            "new_span",
            F.when(
                F.col("pos")
                > F.coalesce(
                    F.max(F.col("pos") + (n - 1)).over(w_prev), F.lit(-1)
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("span_id", F.sum("new_span").over(w_run))
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + (n - 1)).alias("end_tok"),
        )
    )


def _o_span_ctes(n: int = 10, keep_first: bool = False) -> str:
    """The toks→wins→dup→spans CTE chain shared by every span-dedup
    oracle (census, scrub, keep-one census): ONE definition, so a fix
    to the gram window or the island merge can never desynchronize the
    three DuckDB twins.  ``keep_first`` inserts the canonical-
    occurrence exclusion — lexicographic min (doc_id, pos) as a ROW
    comparison, injective for ANY doc length (the earlier arithmetic
    doc_id·10⁶+pos encoding collided for million-token docs)."""
    k = n - 1
    if keep_first:
        mark = f"""
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY g) AS c,
             min(ROW(doc_id, pos)) OVER (PARTITION BY g) AS canon
      FROM wins
    ),
    dup AS (
      SELECT doc_id, pos FROM marked
      WHERE c > 1 AND ROW(doc_id, pos) <> canon
    ),"""
    else:
        mark = """
    dup AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS c FROM wins)
      WHERE c > 1
    ),"""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS pos, array_to_string(t[i : i + {k}], ' ') AS g
      FROM toks, unnest(range(1, len(t) - {k - 1})) AS u(i)
    ),{mark}
    spans AS (
      SELECT doc_id, span_id, min(pos) AS start_tok, max(pos) + {k} AS end_tok
      FROM (
        SELECT doc_id, pos,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        FROM (
          SELECT doc_id, pos,
                 CASE WHEN pos > coalesce(max(pos + {k}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS new_span
          FROM dup)
      ) GROUP BY doc_id, span_id
    )"""


_O_SPAN_CENSUS = """
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(end_tok - start_tok + 1) AS BIGINT) AS dup_tokens,
           CAST(max(end_tok - start_tok + 1) AS BIGINT) AS longest_span
    FROM spans GROUP BY doc_id
    """


@query(
    "q_dup_spans",
    oracle=_o_span_ctes() + _O_SPAN_CENSUS,
    tags=("U4", "U5", "curation"),
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span census (substring-level exact dedup): per doc,
    how many maximal duplicated spans it carries, how many tokens they
    cover, and the longest one — the doc-level report a span-dedup pass
    emits before scrubbing (q_dup_span_scrub is the scrub itself).
    Complements the catalog's document-level dedup family: exact
    fingerprints collapse whole-doc copies, MinHash/SimHash find
    near-copies, THIS finds verbatim regions embedded inside otherwise
    distinct docs — the boilerplate/license-header/quotation case that
    doc-granularity dedup cannot see (Lee et al. 2021, §4).
    """
    d = load_table(spark, sf_dir, "documents")
    spans = duplicate_token_spans(d, 10)
    ln = F.col("end_tok") - F.col("start_tok") + 1
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(ln).cast("long").alias("dup_tokens"),
        F.max(ln).cast("long").alias("longest_span"),
    )


@query(
    "q_dup_span_scrub",
    oracle=_o_span_ctes() + """,
    covered AS (
      SELECT doc_id, unnest(range(start_tok, end_tok + 1)) AS pos FROM spans
    ),
    alltok AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    )
    SELECT a.doc_id AS doc_id,
           coalesce(string_agg(CASE WHEN c.pos IS NULL THEN a.tok END,
                               ' ' ORDER BY a.pos), '') AS scrubbed,
           CAST(count(CASE WHEN c.pos IS NULL THEN 1 END) AS BIGINT) AS n_kept
    FROM alltok a
    JOIN (SELECT DISTINCT doc_id FROM spans) s ON a.doc_id = s.doc_id
    LEFT JOIN covered c ON a.doc_id = c.doc_id AND a.pos = c.pos
    GROUP BY a.doc_id
    """,
    tags=("U4", "U5", "curation"),
)
def q_dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level scrub: rebuild each affected doc's text with every
    duplicated span removed (the remove-all-but-nothing policy — a real
    pipeline keeps one canonical occurrence via MIN(doc_id, pos)
    routing, but the scrub mechanics are identical).  Docs whose text is
    ENTIRELY duplicated come back as the empty string with n_kept = 0 —
    the left-join + conditional-aggregate keeps them in the result,
    where an anti-join would silently drop exactly the docs most worth
    flagging.

    Scale: token and covered-position rows are both linear in doc
    length and co-partitioned by doc_id from the spans stage, so the
    scrub adds one doc-keyed join and one doc-keyed aggregate to
    duplicate_token_spans' two shuffles; per-doc collect_list is
    bounded by the doc's own token count.
    """
    return scrub_duplicate_spans(load_table(spark, sf_dir, "documents"), 10)


def scrub_duplicate_spans(
    d: DataFrame,
    n: int = 10,
    keep_first: bool = False,
    hash_grams: bool = False,
    char_grams: bool = False,
) -> DataFrame:
    """Library form of q_dup_span_scrub over any (doc_id, text) frame —
    see that query's docstring for semantics and scale shape.
    ``keep_first`` scrubs every occurrence EXCEPT the canonical
    min-(doc_id, pos) one — the policy a production pipeline runs;
    ``hash_grams`` selects the hashed-gram shuffle (see
    ``duplicate_token_spans``).

    ``char_grams=True`` (round 11) completes the char tier's trio
    (census / keep-one / scrub): spans come from
    ``duplicate_token_spans(char_grams=True)`` and the text rebuild is
    SUBSTRING SURGERY instead of token re-join — each doc's disjoint,
    maximal spans sort into offset order and one JVM-side
    ``aggregate()`` walk concatenates the uncovered stretches between
    them.  Scale shape: the rebuild shuffles ONE ROW PER SPAN (the
    word tier's rebuild explodes one row per token), so the scrub adds
    strictly less exchange volume than the marking pass that produced
    the spans; the per-doc ``collect_list`` is bounded by the doc's
    span count (≤ len/n disjoint spans).  Output contract matches the
    word tier — (doc_id, scrubbed, n_kept) for docs holding ≥ 1 span,
    a fully-duplicated doc surviving as an empty string — with
    ``n_kept`` in CHARS.  The scrubbed text is the LOWERED form: char
    span offsets index ``lower(text)`` (lowercasing can change string
    length — 'İ' lowers to two chars), so the surgery must slice the
    same string the offsets were minted against.
    """
    if char_grams:
        spans = duplicate_token_spans(
            d,
            n,
            keep_first=keep_first,
            hash_grams=hash_grams,
            char_grams=True,
        )
        # underscore-prefixed working columns: the input frame may
        # legitimately carry columns named "spans" or "lt"
        per_doc = spans.groupBy("doc_id").agg(
            F.array_sort(
                F.collect_list(F.struct("start_tok", "end_tok"))
            ).alias("_scrub_spans")
        )
        joined = d.select("doc_id", "text").join(per_doc, "doc_id").withColumn(
            "_scrub_lt", F.lower("text")
        )
        rebuilt = F.aggregate(
            "_scrub_spans",
            F.struct(F.lit(0).alias("prev"), F.lit("").alias("acc")),
            lambda a, s: F.struct(
                s["end_tok"].alias("prev"),
                F.concat(
                    a["acc"],
                    # gap before this span; zero/negative length (span
                    # abuts or starts at prev+1) slices to ""
                    F.substr(
                        F.col("_scrub_lt"),
                        a["prev"] + F.lit(1),
                        s["start_tok"] - F.lit(1) - a["prev"],
                    ),
                ).alias("acc"),
            ),
            lambda a: F.concat(
                a["acc"],
                F.substr(
                    F.col("_scrub_lt"),
                    a["prev"] + F.lit(1),
                    F.length("_scrub_lt") - a["prev"],
                ),
            ),
        )
        covered = F.aggregate(
            "_scrub_spans",
            F.lit(0),
            lambda a, s: a + s["end_tok"] - s["start_tok"] + F.lit(1),
        )
        return joined.select(
            "doc_id",
            rebuilt.alias("scrubbed"),
            (F.length("_scrub_lt") - covered).cast("long").alias("n_kept"),
        )
    spans = duplicate_token_spans(
        d, n, keep_first=keep_first, hash_grams=hash_grams
    )
    covered = spans.select(
        "doc_id", F.explode(F.sequence("start_tok", "end_tok")).alias("pos")
    ).withColumn("cov", F.lit(1))
    span_docs = spans.select("doc_id").distinct()
    alltok = d.select(
        "doc_id", F.posexplode(_lower_tokens()).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept_tok = F.when(F.col("cov").isNull(), F.struct("pos", "tok"))
    return (
        alltok.join(span_docs, "doc_id")
        .join(covered, ["doc_id", "pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_tok)), lambda s: s["tok"]
                ),
                " ",
            ).alias("scrubbed"),
            F.count(F.when(F.col("cov").isNull(), F.lit(1)))
            .cast("long")
            .alias("n_kept"),
        )
    )


@query(
    "q_dup_spans_keep_one",
    oracle=_o_span_ctes(keep_first=True) + _O_SPAN_CENSUS,
    tags=("U4", "U5", "curation"),
)
def q_dup_spans_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dup_spans under the KEEP-ONE policy a production span-dedup
    actually ships: the canonical occurrence of each duplicated gram
    (lexicographic min (doc_id, pos)) is never marked, so the census
    counts only the copies that a keep_first scrub would remove —
    canonical-only docs drop out of the report entirely.  Same two
    linear shuffles as q_dup_spans; the canonical min rides the same
    gram-keyed window as the occurrence count, adding no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    spans = duplicate_token_spans(d, 10, keep_first=True)
    ln = F.col("end_tok") - F.col("start_tok") + 1
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(ln).cast("long").alias("dup_tokens"),
        F.max(ln).cast("long").alias("longest_span"),
    )


@query(
    "q_exact_k_per_group",
    oracle="""
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM documents)
    WHERE rk <= 40
    """,
    tags=("U4", "W1", "curation"),
)
def q_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sampling per stratum (data-mixing's other
    half): q_stratified_sample keeps a deterministic FRACTION per
    language; this keeps an exact COUNT — rank docs inside each
    language by a content-addressed hash and take the first 40, so the
    sample is stable under re-runs, repartitioning, and corpus append
    order (an appended doc can displace at most one ranked doc).
    Scale: one shuffle on the group key; the rank is a running
    window — Spark evaluates it per partition after the exchange, and
    groups far larger than k could swap in a per-partition top-k
    (groupBy + min_by heap) if a single stratum outgrows a task."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 40)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "q_shard_manifest",
    oracle="""
    SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                 AS INTEGER) % 8 AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    tags=("A2", "curation"),
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: assign every doc to one of 8 output
    shards by content-addressed hash and report per-shard doc/byte
    totals — the manifest a dataloader consumes and the writer's
    `.repartition(n, shard).write.partitionBy(shard)` plan derives
    from.  Hash sharding (vs round-robin) keeps assignment stable
    under corpus append and engine change; the manifest itself is one
    partial+final aggregate over the scan, shard-count-sized output at
    any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 8
    ).cast("int")
    return d.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_token_budget_mix",
    oracle="""
    SELECT doc_id, lang, n_tok, cum_tok
    FROM (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      FROM documents)
    WHERE cum_tok <= 1500
    """,
    tags=("U4", "W3", "curation"),
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture fill (data mixing's third leg, after
    fraction-based ``q_stratified_sample`` and count-based
    ``q_exact_k_per_group``) — see ``token_budget_fill``, which this
    query (and the property test) exercises with a 1,500-token budget
    per language."""
    return token_budget_fill(load_table(spark, sf_dir, "documents"), 1500)


def token_budget_fill(d: DataFrame, budget: int) -> DataFrame:
    """Admit docs per language in content-addressed-hash order until
    the running token total would pass ``budget`` — how a training mix
    hits "1 B tokens of French" exactly, stably under re-runs and
    corpus appends.  One shuffle on the group key; the running sum is
    an explicit ROWS-framed window so ties can't blur the frame, and
    the output is budget-bounded (≈ budget/avg_doc_tokens rows per
    language), not corpus-bounded — at 100 TB the result stays small
    even though the scan is full."""
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            n_tok.alias("n_tok"),
            F.sum(n_tok).over(w).cast("long").alias("cum_tok"),
        )
        .where(F.col("cum_tok") <= budget)
    )


def temperature_quotas(
    counts: dict[str, int], alpha: float, budget: int
) -> dict[str, int]:
    """Per-group document quotas ∝ n_g^α summing EXACTLY to ``budget``
    (largest-remainder apportionment over the group-bounded counts —
    pure driver math), with quotas capped at group size and the excess
    re-apportioned among uncapped groups until stable.  α < 1 is the
    published temperature-sampling upweighting of small groups
    (Conneau & Lample 2019, XLM; Xue et al. 2021, mT5); α = 1 is
    proportional, α = 0 uniform."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    if budget < 0:
        raise ValueError("budget must be non-negative")
    if budget > sum(counts.values()):
        raise ValueError(
            f"budget {budget} exceeds the corpus ({sum(counts.values())} docs)"
        )
    quotas = {g: 0 for g in counts}
    open_groups = {g for g, n in counts.items() if n > 0}
    remaining = budget
    while remaining and open_groups:
        mass = {g: counts[g] ** alpha for g in open_groups}
        total = sum(mass.values())
        shares = {g: remaining * mass[g] / total for g in open_groups}
        floors = {g: int(shares[g]) for g in open_groups}
        leftover = remaining - sum(floors.values())
        # largest remainder, ties by group name — deterministic
        order = sorted(
            open_groups, key=lambda g: (-(shares[g] - floors[g]), g)
        )
        alloc = {
            g: floors[g] + (1 if i < leftover else 0)
            for i, g in enumerate(order)
        }
        # Σ alloc == remaining by construction (floors + exactly
        # `leftover` largest-remainder +1s), so every iteration either
        # exhausts the budget or caps (and closes) at least one group
        # — termination without any fallback branch
        for g in list(open_groups):
            room = counts[g] - quotas[g]
            take = min(alloc[g], room)
            quotas[g] += take
            remaining -= take
            if quotas[g] == counts[g]:
                open_groups.discard(g)
    return quotas


def temperature_mix(
    d: DataFrame, group_col: str, alpha: float, budget: int
) -> DataFrame:
    """Temperature-sampled training mix: select ``budget`` documents
    with per-group quotas ∝ n_g^α (small groups upweighted at α < 1 —
    the multilingual-pretraining recipe), filled deterministically in
    content-addressed-hash order so the mix is stable under re-runs,
    cluster layouts, and corpus appends (the ``token_budget_fill``
    convention).  Requires a ``doc_id`` column — it is the hash input
    and tie-break that makes the fill order content-addressed.  Plan:
    one group-bounded count aggregate (quotas are driver math over
    it), then one shuffle on the group key for the rank-and-cut;
    output is budget-bounded, not corpus-bounded."""
    if "doc_id" not in d.columns:
        raise ValueError(
            "temperature_mix needs a doc_id column (the deterministic "
            "content-addressed fill key)"
        )
    # internal working columns must not collide with caller columns
    # (a frame already carrying 'g' or 'quota' would make the join and
    # the final drop ambiguous) — suffix-uniquify, the dsir_resample
    # '_dsir_key' pattern
    rk_c, g_c, q_c = "_rk", "_g", "_quota"
    while rk_c in d.columns or g_c in d.columns or q_c in d.columns:
        rk_c, g_c, q_c = rk_c + "_", g_c + "_", q_c + "_"
    counts = {
        r[g_c]: r["n"]
        for r in d.groupBy(F.col(group_col).alias(g_c))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    quotas = temperature_quotas(counts, alpha, budget)
    spark = d.sparkSession
    qdf = spark.createDataFrame(
        [(g, q) for g, q in quotas.items()],
        StructType(
            [
                StructField(g_c, d.schema[group_col].dataType),
                StructField(q_c, LongType()),
            ]
        ),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn(rk_c, F.row_number().over(w))
        .join(
            F.broadcast(qdf),  # group-bounded by construction
            on=F.col(group_col).eqNullSafe(F.col(g_c)),
        )
        .where(F.col(rk_c) <= F.col(q_c))
        .drop(rk_c, g_c, q_c)
    )


def corpus_drift_between(
    snap_a: DataFrame, snap_b: DataFrame, head_k: int = 4096
) -> DataFrame:
    """``corpus_drift`` between two EXPLICIT document frames — the
    production call shape ("yesterday's crawl vs today's"): tag, union,
    and run the same census.  Both frames need (lang, text)."""
    tagged = snap_a.select(
        F.lit(0).alias("snap"), "lang", "text"
    ).unionByName(snap_b.select(F.lit(1).alias("snap"), "lang", "text"))
    return _corpus_drift_census(tagged, head_k)


def corpus_drift(docs: DataFrame, head_k: int = 4096) -> DataFrame:
    """Per-language corpus drift between two snapshots (here doc_id
    parity, the self-contained form the driver-checked query uses;
    ``corpus_drift_between`` takes two explicit frames): head
    total-variation distance between the snapshots' unigram
    distributions, plus vocab churn counts.

    Parity/scale design: per-term probabilities are exact double
    ratios of integer counts (identical on any IEEE engine); the TVD
    sum folds in term order (sort_array + F.aggregate, the
    ``q_perplexity`` pattern) so double accumulation is
    order-identical to the DuckDB twin; and the fold is capped at the
    ``head_k`` highest-count terms per language (deterministic
    cnt-then-term rank) so the collected array is head-bounded — at
    100 TB the per-lang vocab may be 10 M+ terms, but the drift
    monitor folds only the head, and the churn counts (n_new/n_gone)
    still cover the full vocab via plain aggregation.

    A language with an EMPTY snapshot on either side reports
    head_tvd = 1.0 — disjoint supports are maximal drift by the TVD
    convention, and the streaming twin
    (``streaming/drift.StreamingDriftMonitor``) reports the same 1.0
    for a language absent from its reference, so the offline census
    and the ingest watcher agree at the loudest point."""
    return _corpus_drift_census(
        docs.select((F.col("doc_id") % 2).alias("snap"), "lang", "text"),
        head_k,
    )


def _corpus_drift_census(tagged: DataFrame, head_k: int) -> DataFrame:
    """The census over a (snap ∈ {0,1}, lang, text) frame — shared by
    the parity form (``corpus_drift``) and the two-frame form
    (``corpus_drift_between``)."""
    tk = census_token_stream(tagged, "lang", "snap")
    tc = tk.groupBy("lang", "tok").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    tot = tc.groupBy("lang").agg(
        F.sum("cnt_a").cast("double").alias("tot_a"),
        F.sum("cnt_b").cast("double").alias("tot_b"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.when(F.col("cnt_a") == 0, 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("cnt_b") == 0, 1).otherwise(0)).alias("n_gone"),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            (F.col("cnt_a") + F.col("cnt_b")).desc(), "tok"
        )
    )
    # tot is lang-count-sized (tiny at any corpus size): broadcast
    d = (
        tc.withColumn("rk", rk)
        .where(F.col("rk") <= head_k)
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "tok",
            # an EMPTY snapshot (a lang appearing only after — or only
            # before — the cut) is the zero distribution, not a
            # divide-by-zero (ANSI mode would otherwise fail the job)
            F.abs(
                F.when(
                    F.col("tot_a") != 0,
                    F.col("cnt_a").cast("double") / F.col("tot_a"),
                ).otherwise(F.lit(0.0))
                - F.when(
                    F.col("tot_b") != 0,
                    F.col("cnt_b").cast("double") / F.col("tot_b"),
                ).otherwise(F.lit(0.0))
            ).alias("diff"),
        )
    )
    folded = d.groupBy("lang").agg(
        (
            F.lit(0.5)
            * F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("tok"), F.col("diff")))),
                    lambda s: s["diff"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ).alias("head_tvd")
    )
    return folded.join(F.broadcast(tot), "lang").select(
        "lang",
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("tot_a").cast("long").alias("tokens_a"),
        F.col("tot_b").cast("long").alias("tokens_b"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_gone").cast("long").alias("n_gone"),
        # disjoint supports (one snapshot empty) = maximal drift
        F.when(
            (F.col("tot_a") == 0) | (F.col("tot_b") == 0), F.lit(1.0)
        )
        .otherwise(F.col("head_tvd"))
        .alias("head_tvd"),
    )


@query(
    "q_corpus_drift",
    oracle="""
    WITH tk AS (
      SELECT lang, doc_id % 2 AS snap,
             unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    tc AS (
      SELECT lang, tok,
             sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS cnt_a,
             sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS cnt_b
      FROM tk WHERE tok <> '' GROUP BY lang, tok
    ),
    hd AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY cnt_a + cnt_b DESC, tok) AS rk
      FROM tc
    ),
    tot AS (
      SELECT lang, CAST(sum(cnt_a) AS DOUBLE) AS tot_a,
                   CAST(sum(cnt_b) AS DOUBLE) AS tot_b,
             count(*) AS n_terms,
             sum(CASE WHEN cnt_a = 0 THEN 1 ELSE 0 END) AS n_new,
             sum(CASE WHEN cnt_b = 0 THEN 1 ELSE 0 END) AS n_gone
      FROM tc GROUP BY lang
    ),
    d AS (
      SELECT h.lang, h.tok,
             abs(CASE WHEN t.tot_a = 0 THEN 0.0
                      ELSE CAST(h.cnt_a AS DOUBLE) / t.tot_a END
                 - CASE WHEN t.tot_b = 0 THEN 0.0
                        ELSE CAST(h.cnt_b AS DOUBLE) / t.tot_b END) AS diff
      FROM hd h JOIN tot t USING (lang)
      WHERE h.rk <= 4096
    )
    SELECT t.lang,
           CAST(t.n_terms AS BIGINT) AS n_terms,
           CAST(t.tot_a AS BIGINT)   AS tokens_a,
           CAST(t.tot_b AS BIGINT)   AS tokens_b,
           CAST(t.n_new AS BIGINT)   AS n_new,
           CAST(t.n_gone AS BIGINT)  AS n_gone,
           CASE WHEN t.tot_a = 0 OR t.tot_b = 0 THEN 1.0
                ELSE 0.5 * list_reduce(list(d.diff ORDER BY d.tok),
                                       (a, b) -> a + b) END AS head_tvd
    FROM d JOIN tot t USING (lang)
    GROUP BY t.lang, t.n_terms, t.tot_a, t.tot_b, t.n_new, t.n_gone
    """,
    tags=("U7", "A2", "curation"),
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift census (see ``corpus_drift``): head-TVD between the
    two snapshot unigram distributions per language + vocab churn —
    the monitor that decides whether a new crawl shifted the mix
    enough to re-tune sampling weights or re-train the quantizer."""
    return corpus_drift(load_table(spark, sf_dir, "documents"), head_k=4096)
