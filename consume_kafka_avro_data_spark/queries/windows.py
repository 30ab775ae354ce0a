"""Window / sort / limit / set-op queries (SURVEY §2.5, W1–W7).

No ordering construct exists in the reference (Kafka offset order is
implicit, ``src/main.cpp:229``); this is the EXT closure.  Every ORDER BY
includes a unique tiebreaker key so results form a total order — at scale
*and* between engines, tie-broken ordering is the difference between a
deterministic pipeline and a flaky one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from consume_kafka_avro_data_spark.functions.parity import _hundredths
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("W1",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (W1): row_number with a unique tiebreaker.
    Scales as one hash-partition shuffle on the group key; no global sort.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
    tags=("W3",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum (W3).  The frame accumulates EXACT integers (long
    hundredths; the oracle's DECIMAL twin is value-identical) so the
    result is independent of how each engine associates the additions
    (Spark streams the frame; DuckDB uses segment trees — raw doubles
    would differ in the low bits).
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        # exact long hundredths (functions/parity.py r11): same running
        # values, no per-row double→decimal string conversion
        (F.sum(_hundredths("o_totalprice")).over(w).cast("double") / F.lit(100.0))
        .alias("running_spend"),
    )


@query(
    "q_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    tags=("W2",),
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead (W2) per user ordered by the unique event id
    (never by the ns-precision timestamp, whose µs truncation could
    create cross-engine ties)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    tags=("W4", "W5"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (W4/W5).  Spark compiles sort+limit to TakeOrdered —
    a per-partition heap then a k-row driver merge; no global sort ever
    materializes, which is the only acceptable plan at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


@query(
    "q_union_except",
    oracle="""
    SELECT k, src FROM (
      SELECT c_custkey AS k, 'both_or_cust' AS src FROM customer
      UNION
      SELECT s_suppkey AS k, 'both_or_cust' AS src FROM supplier
    )
    EXCEPT
    SELECT o_custkey AS k, 'both_or_cust' AS src FROM orders
    """,
    tags=("W6", "W7"),
)
def q_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (W6/W7): UNION (distinct) then EXCEPT (distinct).
    Both are shuffle-on-full-row ops; Spark plans them as aggregates /
    left-anti joins respectively."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.lit("both_or_cust").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.lit("both_or_cust").alias("src")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), F.lit("both_or_cust").alias("src")
    )
    # subtract = set EXCEPT directly; the previous exceptAll-of-distinct
    # spelling was only correct because the left side was pre-deduped
    return c.union(s).distinct().subtract(o)


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders
    """,
    tags=("W7",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — the remaining set operation (W7):
    customers that have orders, as a set op rather than a semi-join
    (Spark plans it as an aggregate + hash join underneath)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


@query(
    "q_ntile_buckets",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w        AS pct_rank,
           cume_dist() OVER w           AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("W1",),
)
def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking (W1 closure): ntile / percent_rank /
    cume_dist per priority class.  The ORDER BY includes the unique
    order key so every rank is total — percent_rank and cume_dist become
    exact rationals of row positions, identical across engines.  One
    shuffle on the partition key; ranks stream within each partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_range_frame",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             value
      FROM events
    )
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
             AS sum_last_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("W3",),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (W3 completion): per-user trailing-hour
    event count and value sum, ordered by event time with the frame
    bound in VALUE space (epoch-µs range), not row counts — the frame a
    rate limiter or rolling-exposure metric needs, and the one shape
    ``rowsBetween`` cannot express when event spacing is irregular.
    The sum goes through the exact decimal cast so the variable-size
    frame total is independent of intra-frame addition order.  One
    shuffle on user_id; frames stream within each partition.

    Note the orderBy column must be numeric for a Spark range frame, so
    the timestamp is projected to epoch-µs first (session tz pinned
    UTC; identical to DuckDB's epoch_us).
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_last_hour"),
        # exact long hundredths (functions/parity.py r11); the old
        # scale-4 → (38,2) cast was value-free on 2-dp inputs, so the
        # single /100.0 rounding is identical
        (F.sum(_hundredths("value")).over(w).cast("double") / F.lit(100.0))
        .alias("sum_last_hour"),
    )


@query(
    "q_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med_value
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           any_value(m.med_value) AS med_value,
           quantile_cont(abs(e.value - m.med_value), 0.5) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
    tags=("A6", "J1"),
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group (A6 closure) — the robust
    outlier scale the z-score of q_feature_scale lacks.  Two percentile
    passes: the per-group median table is |groups| rows, so it
    broadcast-joins back onto the fact stream (no fact shuffle for the
    enrichment) and the second percentile reuses the same group
    partitioning.  Both engines share the linear-interpolation quantile
    definition and the |x−median| arithmetic, so results match exactly.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med_value")
    )
    return (
        # med is one row per event_type — a fixed small domain, bounded
        # at any SF, so the broadcast hint is scale-safe
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med_value").alias("med_value"),
            F.percentile(F.abs(F.col("value") - F.col("med_value")), 0.5).alias(
                "mad"
            ),
        )
    )


@query(
    "q_skyline",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS od,
             min(CAST(o_orderdate AS DATE)) OVER (
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_prior_date
      FROM orders
    )
    SELECT o_orderkey, o_totalprice, od AS o_orderdate
    FROM ranked
    WHERE best_prior_date IS NULL OR od < best_prior_date
    """,
    tags=("W3", "W4"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (maximize price, minimize date —
    "biggest-and-earliest" orders no other order dominates).  The
    classic quadratic NOT-EXISTS dominance test collapses to one sorted
    pass for two dimensions: scan in price-descending order and keep a
    row only when its date beats the running minimum of everything
    before it.  The global sort is the honest cost — a rangepartitioned
    sort, with the running min streaming inside each range partition at
    scale.  Unique tie-break (o_orderkey) makes the frontier a
    deterministic set in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = o.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.min(F.col("o_orderdate").cast("date")).over(w).alias("best_prior_date"),
    )
    return ranked.where(
        F.col("best_prior_date").isNull()
        | (F.col("o_orderdate") < F.col("best_prior_date"))
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


@query(
    "q_id_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_id,
             lead(event_id) OVER (ORDER BY event_id) AS next_id
      FROM events WHERE event_id % 7 <> 0
    )
    SELECT event_id + 1 AS gap_start,
           next_id - 1  AS gap_end,
           CAST(next_id - event_id - 1 AS BIGINT) AS gap_len
    FROM seq
    WHERE next_id - event_id > 1
    """,
    tags=("W2",),
)
def q_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection over a dense id sequence (W2 closure): with every
    7th event dropped, report each missing [start, end] range via a
    single lead() pass — the integrity check a replayed Kafka offset
    stream needs (the reference trusts offset order implicitly,
    src/main.cpp:229).  The global order-by is the honest cost; at scale
    the same query runs per partition key (topic-partition) so each
    sequence sorts locally.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 7 != 0)
    w = Window.orderBy("event_id")
    seq = e.select("event_id", F.lead("event_id").over(w).alias("next_id"))
    return seq.where(F.col("next_id") - F.col("event_id") > 1).select(
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (F.col("next_id") - F.col("event_id") - 1).alias("gap_len"),
    )
