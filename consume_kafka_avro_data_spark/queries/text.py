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


_CHUNK, _STRIDE = 32, 24  # token window + stride (8-token overlap)


@query(
    "q_doc_chunks",
    oracle=f"""
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS INT) AS chunk_no,
           array_to_string(toks[s : s + {_CHUNK - 1}], ' ') AS chunk,
           CAST(len(toks[s : s + {_CHUNK - 1}]) AS INT) AS n_chunk_tokens
    FROM (SELECT doc_id,
                 string_split_regex(lower(coalesce(text, '')), '\\s+') AS toks
          FROM documents),
         unnest(range(1, greatest(len(toks), 1) + 1, {_STRIDE})) AS u(s)
    """,
    tags=("U3", "U7"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the context-window prep step
    of an LLM training pipeline): 32-token chunks at stride 24 via
    sequence → transform → posexplode — a UDTF-shaped fan-out (U3) as
    pure codegen.  Map-only: each document expands locally, so at
    100 TB chunking runs at scan speed with no shuffle.

    Tokenization is the corpus-wide tokens_col convention (regex
    whitespace split, NULL→''), mirrored by the oracle's
    string_split_regex + coalesce — a single-space split would disagree
    on any document with runs of whitespace."""
    from consume_kafka_avro_data_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(_STRIDE)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s, _CHUNK), " ").alias("chunk"),
            F.size(F.slice(toks, s, _CHUNK)).alias("n_chunk_tokens"),
        ),
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_no", "_c")
    ).select(
        "doc_id",
        "chunk_no",
        F.col("_c.chunk").alias("chunk"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


@query(
    "q_train_split",
    oracle="""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
    tags=("U4", "P11"),
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val split (~80/20 at hex 'cd'
    = 205/256): assignment is a pure function of the stable doc id —
    reproducible across runs, cluster layouts, and engines, with no
    shuffle and no RNG state.  The at-scale alternative (rand(seed)) is
    partitioning-dependent; this is the shape to use at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < "cd", "train").otherwise("val").alias("split"),
    )


_POS_SQL = "['good','great','excellent','fast','best','love','win','nice']"
_NEG_SQL = "['bad','slow','terrible','worst','hate','fail','poor','wrong']"


@query(
    "q_sentiment",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains({_POS_SQL}, x))) AS BIGINT) AS n_pos,
           CAST(len(list_filter(toks, x -> list_contains({_NEG_SQL}, x))) AS BIGINT) AS n_neg,
           (len(list_filter(toks, x -> list_contains({_POS_SQL}, x)))
            - len(list_filter(toks, x -> list_contains({_NEG_SQL}, x))))::DOUBLE
             / len(toks) AS sentiment
    FROM (SELECT doc_id,
                 string_split_regex(lower(coalesce(text, '')), '\\s+') AS toks
          FROM documents)
    """,
    tags=("U7",),
)
def q_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment score (U7): duplicate-counting lexicon hits as
    a pure map-side filter expression — no join, no UDF.  The oracle
    mirrors tokens_col's regex-split + NULL→'' convention exactly (a
    single-space split would disagree on tabs/newlines/NULL text)."""
    from consume_kafka_avro_data_spark.operators.text import sentiment_score

    d = load_table(spark, sf_dir, "documents")
    return sentiment_score(d).select("doc_id", "n_pos", "n_neg", "sentiment")


@query(
    "q_tfidf_topterms",
    oracle=r"""
    WITH terms AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(coalesce(text, '')), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, term, tf, ROUND(tfidf, 4) AS tfidf, CAST(rnk AS INT) AS rank
    FROM (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) DESC,
                        tf.term
             ) AS rnk
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    )
    WHERE rnk <= 3
    """,
    tags=("U7",),
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf (U7): sklearn-smoothed idf, top-3 terms per document with
    deterministic (score desc, term asc) tie-breaking.  The corpus-side
    tf table shuffles once; the vocabulary-sized idf table broadcasts."""
    from pyspark.sql import Window

    from consume_kafka_avro_data_spark.operators.text import tf_idf

    d = load_table(spark, sf_dir, "documents")
    scored = tf_idf(d)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", F.round("tfidf", 4).alias("tfidf"), "rank")
    )


@query(
    "q_dedup_keep_canonical",
    oracle="""
    SELECT doc_id, fingerprint
    FROM (SELECT doc_id, md5(lower(text)) AS fingerprint,
                 row_number() OVER (PARTITION BY md5(lower(text))
                                    ORDER BY doc_id) AS rn
          FROM documents)
    WHERE rn = 1
    """,
    tags=("U4", "W1"),
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-one-per-group half of exact dedup: min-id survivor per
    content fingerprint via a ranked window — what a training pipeline
    actually materializes after q_doc_fingerprint's cluster census.
    One shuffle on the fingerprint; survivors stream out of the window
    without a second pass."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    return (
        d.select("doc_id", fp.alias("fingerprint"), F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_repetition_stats",
    oracle="""
    WITH grams AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
           unnest(range(1, len(toks))) AS u(i)
    ), counts AS (
      SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c)   AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(1 AS DOUBLE)
             - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_frac,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)       AS top_frac
    FROM counts
    GROUP BY doc_id
    """,
    tags=("U7", "U5"),
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features (U7): per-document duplicate
    2-gram fraction and most-common-2-gram fraction — the standard
    boilerplate/degenerate-text signals a training-data quality filter
    cuts on.  Bigrams are built by a codegen lambda (sequence +
    element_at), exploded locally, then counted: the only shuffle keys on
    (doc_id, gram), and the per-doc reduction is a second partial-agg
    pass on doc_id — both shrink map-side at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    # guard: sequence(1, 0) yields [1, 0] (descending), and element_at
    # with index 0/2-of-1 ABORTS the query under ANSI — a single-token
    # or empty document must emit zero bigrams like the oracle's
    # range(1, len), not kill the job
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct"),
        (
            F.lit(1.0)
            - F.count("*").cast("double") / F.sum("c").cast("double")
        ).alias("dup_frac"),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("top_frac"),
    )


_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_NUM_RE = r"[0-9]+"


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH msgs AS (
      SELECT event_id,
             'contact user' || CAST(user_id AS VARCHAR) || ' at user'
               || CAST(user_id AS VARCHAR) || '@example.com re ' || event_type AS msg
      FROM events WHERE event_id % 3 = 0
    )
    SELECT event_id,
           regexp_replace(regexp_replace(msg, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_NUM_RE}', '[NUM]', 'g')            AS scrubbed,
           CAST(len(regexp_extract_all(msg, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(msg, '{_NUM_RE}')) AS INT)   AS n_numbers
    FROM msgs
    """,
    tags=("U7", "P9"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (U7): render a message column containing ids and
    emails, then scrub with regexp_replace and count the redactions with
    regexp_extract_all — the pre-training scrubbing pass, expressed as
    pure codegen regex (RE2-compatible patterns, so the identical regex
    runs on both engines).  Map-only: scales at scan speed."""
    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    msg = F.concat(
        F.lit("contact user"), uid, F.lit(" at user"), uid,
        F.lit("@example.com re "), F.col("event_type"),
    )
    return e.where(F.col("event_id") % 3 == 0).select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace(msg, _EMAIL_RE, "[EMAIL]"), _NUM_RE, "[NUM]"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all(msg, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(msg, F.lit(_NUM_RE), 0)).alias("n_numbers"),
    )


@query(
    "q_token_len_histogram",
    oracle="""
    SELECT (len(string_split(text, ' ')) // 8) * 8 AS bucket,
           CAST(count(*) AS BIGINT)                AS n_docs,
           CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("U7",),
)
def q_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (U7): fixed-width (8-token) buckets over
    document lengths — the length-distribution audit that precedes
    choosing chunk sizes and length filters for a training corpus.
    Integer-exact everywhere; single partial-agg shuffle on ~a dozen
    bucket keys."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        d.select(((n_tok / 8).cast("long") * 8).alias("bucket"), n_tok.alias("n"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            F.sum("n").alias("total_tokens"),
        )
    )


@query(
    "q_bm25_rank",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    tokf AS (SELECT * FROM toks WHERE tok <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tokf GROUP BY doc_id),
    st AS (SELECT CAST(sum(dl) AS DOUBLE) AS total_dl,
                  CAST(count(*) AS DOUBLE) AS n_docs
           FROM dl),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM tokf WHERE tok IN ('hash', 'join', 'vector') GROUP BY 1, 2),
    dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
    sc AS (
      SELECT t.doc_id, t.tok,
             (ln((st.n_docs - d.df + CAST('0.5' AS DOUBLE))
                 / (d.df + CAST('0.5' AS DOUBLE)) + CAST('1' AS DOUBLE))
              * (t.tf * CAST('2.2' AS DOUBLE)))
             / (t.tf + CAST('1.2' AS DOUBLE)
                       * (CAST('0.25' AS DOUBLE)
                          + CAST('0.75' AS DOUBLE) * (l.dl / (st.total_dl / st.n_docs))))
             AS score
      FROM tf t JOIN dfq d USING (tok) JOIN dl l USING (doc_id) CROSS JOIN st
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
             ROUND(list_reduce(list(score ORDER BY tok), (a, b) -> a + b), 6)
               AS bm25
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_terms, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
    FROM per
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    tags=("U7", "W5"),
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking (U7): score every document against a fixed
    query ('hash join vector') with Okapi BM25 (k1=1.2, b=0.75, the
    +1-inside-ln idf so scores stay positive) and return the top-20 with
    a deterministic (score desc, doc_id) order.  The corpus contributes
    one tf shuffle and one doc-length shuffle; df and the corpus-size
    scalars are vocabulary-sized broadcasts; the final top-k compiles to
    TakeOrdered, never a global sort.  Per-doc term scores fold in term
    order (sort_array + aggregate ≡ list(ORDER BY tok) + list_reduce) so
    the double accumulation is partition-order independent; the final
    score is rounded to 6 dp before ranking because the JVM's Math.log
    and libm's ln differ by 1 ulp for some arguments — the one non-IEEE
    step in the pipeline."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    st = dl.agg(
        F.sum("dl").cast("double").alias("total_dl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    tf = (
        toks.where(F.col("tok").isin("hash", "join", "vector"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    score = (idf * (F.col("tf") * F.lit(2.2))) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / (F.col("total_dl") / F.col("n_docs"))))
    )
    sc = (
        # dfq is one row per QUERY term (3 literals here — query-sized,
        # not vocab-sized); st is a single global-stats row
        tf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", score.alias("score"))
    )
    per = sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("tok"), F.col("score")))
                    ),
                    lambda s: s["score"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            6,
        ).alias("bm25"),
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        per.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


@query(
    "q_gopher_rules",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             length(text) - length(replace(text, '...', '')) AS ell3,
             list_sort(list_distinct(string_split(lower(text), ' '))) AS uniq
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(words) AS n_words,
             list_sum(list_transform(words, w -> length(w))) AS sum_len,
             len(list_filter(words,
                 w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
             n_hash, ell3,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%'))
               AS n_bullet,
             len(list_filter(lines, l -> l LIKE '%...')) AS n_ell_end,
             len(list_filter(uniq, u -> list_contains(
                 ['the','be','to','of','and','that','have','with'], u)))
               AS n_req_stop
      FROM base
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           n_words >= 50 AND n_words <= 100000        AS r_word_count,
           sum_len >= 3 * n_words
             AND sum_len <= 10 * n_words              AS r_mean_word_len,
           10 * n_hash <= n_words
             AND 10 * ell3 <= 3 * n_words             AS r_symbol_ratio,
           10 * n_bullet <= 9 * n_lines               AS r_bullet_lines,
           10 * n_ell_end <= 3 * n_lines              AS r_ellipsis_lines,
           5 * n_alpha_words >= 4 * n_words           AS r_alpha_words,
           n_req_stop >= 2                            AS r_stop_words,
           (n_words >= 50 AND n_words <= 100000)
             AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
             AND (10 * n_hash <= n_words AND 10 * ell3 <= 3 * n_words)
             AND (10 * n_bullet <= 9 * n_lines)
             AND (10 * n_ell_end <= 3 * n_lines)
             AND (5 * n_alpha_words >= 4 * n_words)
             AND (n_req_stop >= 2)                    AS keep
    FROM m
    """,
    tags=("U7", "curation"),
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality-filter rule set (Rae et al. 2021,
    table A1) as per-doc boolean gates: word count in [50, 100000],
    mean word length in [3, 10], symbol-to-word ratio > 0.1 for
    EITHER the hash symbol or the ellipsis (per-symbol, as published —
    not pooled), > 90% bullet-started lines, > 30% ellipsis-ended
    lines, < 80% words with an alphabetic char, and < 2 of the 8
    required English stop words — each a REMOVAL when its
    strictly-greater (resp. strictly-less) bound is crossed, so a doc
    sitting exactly on a boundary is kept, matching the paper.  Every
    ratio test is cross-multiplied into integer arithmetic
    (10·hash <= words; the ellipsis count stays as its 3× character
    form, 10·ell3 <= 3·words; 5·alpha >= 4·words, …), so each flag —
    and the hash comparison — is exact, with no float division
    anywhere.  Map-only codegen over the scan: the filter a 100 TB
    pipeline runs at full scan speed ahead of any shuffle."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lines = F.split(F.col("text"), "\n")
    tlen = F.length("text")
    n_hash = tlen - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    # 3x the ellipsis count — kept unscaled so the ratio test stays
    # integer: ell/words > 0.1  <=>  10*ell3 > 3*words
    ell3 = tlen - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    uniq = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    req = F.array(*[F.lit(w) for w in
                    ("the", "be", "to", "of", "and", "that", "have", "with")])
    m = d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.aggregate(
            words, F.lit(0), lambda a, w: a + F.length(w)
        ).alias("sum_len"),
        F.size(
            F.filter(words, lambda w: w.rlike("[A-Za-z]"))
        ).alias("n_alpha_words"),
        n_hash.alias("n_hash"),
        ell3.alias("ell3"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("-") | l.startswith("*"),
            )
        ).alias("n_bullet"),
        F.size(F.filter(lines, lambda l: l.endswith("..."))).alias("n_ell_end"),
        F.size(F.array_intersect(uniq, req)).alias("n_req_stop"),
    )
    c = F.col
    rules = {
        "r_word_count": (c("n_words") >= 50) & (c("n_words") <= 100000),
        "r_mean_word_len": (c("sum_len") >= 3 * c("n_words"))
        & (c("sum_len") <= 10 * c("n_words")),
        "r_symbol_ratio": (10 * c("n_hash") <= c("n_words"))
        & (10 * c("ell3") <= 3 * c("n_words")),
        "r_bullet_lines": 10 * c("n_bullet") <= 9 * c("n_lines"),
        "r_ellipsis_lines": 10 * c("n_ell_end") <= 3 * c("n_lines"),
        "r_alpha_words": 5 * c("n_alpha_words") >= 4 * c("n_words"),
        "r_stop_words": c("n_req_stop") >= 2,
    }
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return m.select(
        "doc_id",
        c("n_words").cast("long").alias("n_words"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )
