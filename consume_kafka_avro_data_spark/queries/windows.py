"""Window / sort / limit / set-op queries (SURVEY §2.5, W1–W7).

No ordering construct exists in the reference (Kafka offset order is
implicit, ``src/main.cpp:229``); this is the EXT closure.  Every ORDER BY
includes a unique tiebreaker key so results form a total order — at scale
*and* between engines, tie-broken ordering is the difference between a
deterministic pipeline and a flaky one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table

DEC = "decimal(18,4)"


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
    """Running sum (W3).  The frame accumulates in DECIMAL so the result
    is independent of how each engine associates the additions (Spark
    streams the frame; DuckDB uses segment trees — raw doubles would
    differ in the low bits).
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
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
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
    return c.union(s).distinct().exceptAll(o.distinct())


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
