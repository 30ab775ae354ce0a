"""Classic multi-join analytics (TPC-H-pattern queries, J3/A2/W5).

The reference materializes a graph and leaves "query it" to SQL clients
(its Postgres sink, ``src/Database.h:23-31``); these queries are the
canonical decision-support shapes a user of the materialized tables runs
— the public TPC-H Q3/Q5/Q10 patterns adapted to the testdata star
schema.  They matter for the 100 TB story because each one exercises a
different join-strategy decision:

* ``q_shipping_priority`` — selective fact⋈fact join where pre-pushed
  partial aggregation shrinks the probe side before the shuffle;
* ``q_local_supplier_volume`` — a 6-table chain where only the genuinely
  tiny dims (nation, region) are broadcast-hinted; customer/supplier are
  left to the planner because at 100 TB they no longer fit in memory and
  the hint would be a lie;
* ``q_returned_items`` — filtered fact aggregation + global top-k via
  TakeOrdered (heap, not sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from consume_kafka_avro_data_spark.functions.parity import (
    dsum_mul,
    dsum_mul_final,
    dsum_mul_partial,
    o_dsum_mul,
)
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table

# Mid-range cutovers for the 1995-01-01..2001-08-01 testdata date span.
_Q3_DATE = "1998-06-15"
_Q5_LO, _Q5_HI = "1997-01-01", "1998-01-01"
_Q10_LO, _Q10_HI = "1997-01-01", "1997-04-01"


@query(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {o_dsum_mul("l_extendedprice", "(1.0 - l_discount)")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J3", "A2", "W5"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 pattern: top unshipped orders by revenue for one segment.

    Scale shape: lineitem is filtered + partial-aggregated per order key
    BEFORE the join (exact decimal partials), so the fact⋈fact shuffle
    carries one row per qualifying order instead of one per lineitem —
    the same pre-push rewrite as ``q_edge_join``, which Catalyst does not
    perform itself.  Orders' group columns (date, priority) come from
    the unique-key side, so no re-aggregation is needed after the join.
    The final top-10 is TakeOrdered (per-partition heap + 10-row driver
    merge), with ``l_orderkey`` as the deterministic tie-break.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    per_order = (
        li.where(F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp_ntz"))
        .groupBy("l_orderkey")
        .agg(dsum_mul("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("revenue"))
    )
    o_f = o.where(F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp_ntz")).join(
        c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        o.o_custkey == F.col("c_custkey"),
        "left_semi",
    )
    return (
        per_order.join(o_f, per_order.l_orderkey == o_f.o_orderkey, "inner")
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {o_dsum_mul("l_extendedprice", "(1.0 - l_discount)")} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q5_HI}'
    GROUP BY n_name
    """,
    tags=("J3", "A2"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 pattern: revenue where customer and supplier share a
    nation inside one region.

    Scale shape: the 6-table chain is ordered facts-first —
    lineitem ⋈ orders(date-filtered) on the order key (the one real
    shuffle), then the dimension attachments.  Only nation⋈region (25ish
    rows at ANY scale) carries an explicit ``broadcast()`` hint;
    customer and supplier are left unhinted because at 100 TB they are
    multi-TB tables and the static planner / AQE must be free to pick a
    shuffle join — hints must never promise memory that won't exist.
    The ``c_nationkey = s_nationkey`` cross-filter runs as a post-join
    predicate on already-attached dim columns, not an extra join.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    asia_nations = broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).where(F.col("r_name") == "ASIA")
    ).select("n_nationkey", "n_name")

    o_f = o.where(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp_ntz"))
    )
    joined = (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o_f, li.l_orderkey == o_f.o_orderkey, "inner")
        .join(c, o_f.o_custkey == c.c_custkey, "inner")
        .join(s, li.l_suppkey == s.s_suppkey, "inner")
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"), "inner")
    )
    return joined.groupBy("n_name").agg(
        dsum_mul("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("revenue")
    )


@query(
    "q_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {o_dsum_mul("l_extendedprice", "(1.0 - l_discount)")} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q10_HI}'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J3", "A2", "W5"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 pattern: customers who returned the most value in a
    quarter.

    Scale shape: returns-filtered lineitem partial-aggregates per order
    key first, joins the date-filtered orders on the shared key, then
    re-aggregates per customer — two shuffles total, both on already-
    reduced rows.  Nation is broadcast.  Top-20 is TakeOrdered with
    ``c_custkey`` breaking revenue ties deterministically.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")

    per_order = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(dsum_mul_partial("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("_rev"))
    )
    o_f = o.where(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        per_order.join(o_f, per_order.l_orderkey == o_f.o_orderkey, "inner")
        .groupBy("o_custkey")
        .agg(dsum_mul_final("_rev").alias("revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey, "inner")
        .join(broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q2_SQL = """
    SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name,
           l.l_extendedprice / l.l_quantity AS unit_price
    FROM {part} p
    JOIN {lineitem} l ON p.p_partkey = l.l_partkey
    JOIN {supplier} s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 10
      AND l.l_extendedprice / l.l_quantity =
          (SELECT min(i.l_extendedprice / i.l_quantity)
           FROM {lineitem} i WHERE i.l_partkey = p.p_partkey)
"""


@query(
    "q_min_cost_supplier",
    oracle=_Q2_SQL.format(part="part", lineitem="lineitem", supplier="supplier"),
    tags=("J3", "A2"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern (minimum-cost supplier, adapted: the testdata
    has no partsupp, so observed lineitem unit price stands in for
    supplycost): for each small part, the supplier(s) quoting the
    per-part MINIMUM unit price, via a correlated MIN subquery.

    The identical SQL text runs on DuckDB.  Catalyst decorrelates the
    subquery into a per-partkey aggregate joined back on (partkey,
    price) — no per-outer-row rescan survives in the plan (SURVEY §4;
    plan-pinned in tests).  Parity: unit price is one IEEE division of
    stored doubles (identical on both engines), MIN selects an
    existing value, and the equality cut compares bit-identical
    doubles — no rounding helper needed, unlike the SUM queries.
    Scale: two shuffles on l_partkey (the aggregate and the join
    back); ties return every minimum-price supplier, deterministically.
    """
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v")
    return spark.sql(
        _Q2_SQL.format(part="part_v", lineitem="lineitem_v", supplier="supplier_v")
    )
