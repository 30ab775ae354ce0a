"""Feature-engineering closure: SCD2 interval compaction, Markov
transition counts, distribution-based feature scaling, and PMI token
co-occurrence (charter training-data mandate + SURVEY §2.4/§2.5 closure).

The reference's graph sink keeps only the latest state of each entity
(`src/Database.h:23-31`, ON CONFLICT DO NOTHING); these queries cover
the history-tracking and featurization shapes an ML pipeline layers on
top of the same event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from consume_kafka_avro_data_spark.functions.parity import (
    dsum,
    dsum_mul,
    o_dsum,
    o_dsum_mul,
)
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_scd2",
    oracle="""
    WITH chg AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS prev_type
      FROM events
    ), versions AS (
      SELECT user_id, event_id, event_type, ts
      FROM chg WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM versions
    """,
    tags=("W2", "T8"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) compaction: collapse the event
    stream into per-user state intervals — a row per *change* of
    event_type, valid from its timestamp until the next change (open
    ended for the current state).  The reference's graph keeps only
    latest state; this is the history-preserving upsert every warehouse
    dimension needs.  Change detection (lag) and interval stitching
    (lead) share one user_id window partitioning — a single shuffle, and
    the intermediate filter shrinks data before the second window pass.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    chg = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    versions = chg.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    valid_to = F.lead("ts").over(w)
    return versions.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "q_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM pairs
    """,
    tags=("W2", "A2"),
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    (from_type → to_type) counts and row-normalized probabilities.
    The lead window shuffles on user_id once; the pair aggregate and the
    normalizing window then operate on ≤|types|² rows — nothing after
    the first window scales with the data.  p is a single division of
    exact integers, identical in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    pairs = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    norm = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm).cast("double")).alias(
            "p"
        ),
    )


@query(
    "q_feature_scale",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             {o_dsum("value")}        AS sx,
             {o_dsum_mul("value", "value")} AS sxx,
             min(value) AS mn,
             max(value) AS mx
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN n <= 1 OR sxx - sx * sx / CAST(n AS DOUBLE) <= 0 THEN NULL
                ELSE (e.value - sx / CAST(n AS DOUBLE))
                     / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE)))
           END AS zscore,
           CASE WHEN mx = mn THEN NULL
                ELSE (e.value - mn) / (mx - mn) END AS minmax
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE e.event_id % 5 = 0
    """,
    tags=("A2", "J1", "U1"),
)
def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature scaling (standardize + min-max) against per-group
    distribution stats — the train-time normalization pass of a feature
    pipeline.  The stats table is |event_type| rows, so it broadcast-
    joins back onto the fact stream: the fact table never shuffles, and
    the same plan holds when `events` is 100 TB (stats aggregate is
    map-side partial, broadcast is bytes).  Mean/variance come from the
    exact decimal sums; z-score and min-max are then fixed double
    expressions identical in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum("value").alias("sx"),
        dsum_mul("value", "value").alias("sxx"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sx") / n_d
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n_d) / (n_d - F.lit(1.0))
    fact = e.where(F.col("event_id") % 5 == 0).select(
        "event_id", "event_type", "value"
    )
    # degenerate groups (single row, or zero variance / constant value)
    # yield NULL instead of aborting the job on ANSI division-by-zero
    ssd = F.col("sxx") - F.col("sx") * F.col("sx") / n_d
    zscore = F.when(
        (F.col("n") <= 1) | (ssd <= 0), F.lit(None)
    ).otherwise((F.col("value") - mean) / F.sqrt(var))
    minmax = F.when(F.col("mx") == F.col("mn"), F.lit(None)).otherwise(
        (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    # stats is one row per event_type — a fixed small domain at any SF
    return fact.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        zscore.alias("zscore"),
        minmax.alias("minmax"),
    )


@query(
    "q_temperature_resample",
    oracle="""
    WITH s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_l
      FROM documents GROUP BY lang
    ), t AS (
      SELECT SUM(CAST(round(sqrt(n_l), 4) AS DECIMAL(18,4))) AS w_tot,
             CAST(SUM(n_l) AS BIGINT) AS n_tot
      FROM s
    ), p AS (
      SELECT lang, n_l,
             CAST(floor(
               (CAST(CAST(round(sqrt(n_l), 4) AS DECIMAL(18,4)) AS DOUBLE)
                / CAST(w_tot AS DOUBLE)) * CAST(n_tot AS DOUBLE)
             ) AS BIGINT) AS target
      FROM s CROSS JOIN t
    ), r AS (
      SELECT d.doc_id, d.lang,
             p.target // p.n_l AS base,
             p.target % p.n_l AS rem,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d JOIN p USING (lang)
    ), c AS (
      SELECT doc_id, lang,
             base + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS copies
      FROM r
    )
    SELECT doc_id, lang, CAST(unnest(range(1, copies + 1)) AS INT) AS copy_id
    FROM c WHERE copies >= 1
    """,
    tags=("U4", "A2", "W1"),
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling for data mixing (α=0.5, the multilingual-
    LM rebalancing scheme): per-language target counts ∝ √n_l, rare
    languages up-sampled via integer repeat counts, the remainder
    assigned to the md5-lowest docs so the output hits each target
    EXACTLY and deterministically.  Engine-parity hinges on three
    choices: sqrt is IEEE correctly-rounded in both engines, the 4-dp
    rounded weights sum exactly as DECIMAL (order-independent), and the
    remainder rank uses the portable md5 order.  At scale the per-lang
    stats broadcast back onto the corpus and the repeat fan-out is a
    map-side explode; the only data-sized shuffle is the remainder rank
    (one window per lang) — and only the `rem < n_l` remainder docs
    depend on it, so a relaxed variant can hash-threshold instead.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = d.groupBy("lang").agg(F.count("*").alias("n_l"))
    w = F.round(F.sqrt(F.col("n_l")), 4).cast("decimal(18,4)")
    tot = stats.agg(
        F.sum(w).alias("w_tot"), F.sum("n_l").cast("long").alias("n_tot")
    )
    # tot is a single row; p below is one row per language (fixed
    # small domain at any SF) — both broadcast-safe
    p = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_l",
            F.floor(
                (w.cast("double") / F.col("w_tot").cast("double"))
                * F.col("n_tot").cast("double")
            )
            .cast("long")
            .alias("target"),
        )
    )
    joined = d.join(F.broadcast(p), "lang")
    rank_w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    c = joined.select(
        "doc_id",
        "lang",
        (F.expr("target div n_l") + F.when(
            F.row_number().over(rank_w) <= F.col("target") % F.col("n_l"), 1
        ).otherwise(0)).alias("copies"),
    )
    return (
        c.where(F.col("copies") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), "copies")).alias("copy_id"),
        )
        .withColumn("copy_id", F.col("copy_id").cast("int"))
    )


@query(
    "q_pmi_pairs",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents WHERE doc_id < 200 AND trim(text) <> ''
    ), n_docs AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM toks
    ), tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok
    ), pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS co
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING count(*) >= 50
    )
    SELECT tok_a, tok_b, co, fa.df AS df_a, fb.df AS df_b,
           CAST(co * nd AS DOUBLE) / (CAST(fa.df AS DOUBLE) * CAST(fb.df AS DOUBLE))
             AS pmi_ratio
    FROM pairs
    JOIN tf fa ON tok_a = fa.tok
    JOIN tf fb ON tok_b = fb.tok
    CROSS JOIN n_docs
    """,
    tags=("U7", "J5", "A2"),
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information token pairs (U7): document-level
    co-occurrence vs marginal document frequencies — the collocation /
    phrase-mining primitive.  The oracle states the semantics as the
    textbook token self-join on doc_id; the Spark plan refuses that
    shape (it shuffles the full exploded token table twice).  Instead
    one aggregate builds the per-doc sorted distinct-token array —
    its identical aggregate exchange is reused by all three consumers — and pair generation is a
    *map-side* higher-order-function expansion (indexed transform ×
    suffix slice), so the only pair-sized shuffle is the final co-count.
    Per-doc fan-out is quadratic in the doc's distinct vocabulary, which
    doc length bounds independently of corpus size.  The ratio
    (co·N)/(df_a·df_b) is reported un-logged: one exact-integer division
    that both engines round identically, where ln() could differ by an
    ulp between libms.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.where((F.col("doc_id") < 200) & (F.trim("text") != ""))
        .select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
    )
    sets = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("tok")).alias("ts")
    )
    nd = sets.agg(F.count("*").alias("nd"))
    tf = (
        sets.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    pair_arr = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice("ts", i + F.lit(2), F.size("ts")),
                lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count("*").alias("co"))
        .where(F.col("co") >= 50)
    )
    out = (
        # tf is vocab-sized (unbounded at scale): no hint — the planner
        # broadcasts it while small and shuffles on tok at 100 TB.
        # nd is a single global row: always broadcast-safe.
        pairs.join(tf.withColumnRenamed("df", "df_a"), pairs.tok_a == F.col("tok"))
        .drop("tok")
        .join(tf.withColumnRenamed("df", "df_b"), pairs.tok_b == F.col("tok"))
        .drop("tok")
        .crossJoin(F.broadcast(nd))
    )
    return out.select(
        "tok_a",
        "tok_b",
        "co",
        "df_a",
        "df_b",
        (
            (F.col("co") * F.col("nd")).cast("double")
            / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
        ).alias("pmi_ratio"),
    )


@query(
    "q_udaf_wavg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                    * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             AS wavg_price,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("U2", "A2"),
)
def q_udaf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per (returnflag, linestatus) through
    a GROUPED_AGG pandas UDAF — the query-level certification of the
    Arrow aggregate machinery (operator row U2; the library twin is
    operators/similarity's per-cell centroid UDAF).  The UDAF sums in
    scaled int64 (2-dp money values ×100 are exact integers), so the
    result is order-independent and bit-identical to the oracle's
    closed form: int sums are exact below 2⁶³ (corpus bound ~9e18:
    row products are ~1e10, fine past sf100), and one final
    correctly-rounded int→double division matches IEEE-exactly in both
    engines.

    Scale note: GROUPED_AGG ships each whole group to one Arrow batch —
    for a pure sum-shape like this a production plan uses the JVM
    decimal aggregates (functions/parity.dsum); the point here is
    certifying the pandas-UDAF path end-to-end against an oracle, the
    same role q_feature_scale plays for scalar pandas UDFs.
    """
    import pandas as pd

    # eval type from REAL __annotations__ objects (PEP 563 string
    # hints + the local pandas import defeat inline hints; the
    # deprecated PandasUDFType enum is the thing being avoided) —
    # series-to-scalar signature selects GROUPED_AGG
    def wavg(q, p):
        qi = q.mul(100).round().astype("int64")
        pi = p.mul(100).round().astype("int64")
        return float(qi.mul(pi).sum()) / float(qi.sum())

    wavg.__annotations__ = {"q": pd.Series, "p": pd.Series, "return": float}
    wavg = F.pandas_udf(wavg, "double")

    # Catalyst refuses to mix GROUPED_AGG with JVM aggregates in one
    # agg (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides the
    # same Arrow machinery
    def arrow_count(q):
        return int(len(q))

    arrow_count.__annotations__ = {"q": pd.Series, "return": int}
    arrow_count = F.pandas_udf(arrow_count, "long")

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wavg(F.col("l_quantity"), F.col("l_extendedprice")).alias("wavg_price"),
        arrow_count(F.col("l_quantity")).alias("n_items"),
    )
