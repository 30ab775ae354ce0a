"""Aggregation queries (SURVEY §2.4, A2–A7).

The reference's only aggregate is a running error counter
(``src/main.cpp:243-251``); everything here is the EXT relational closure
— Tungsten hash aggregation with automatic map-side partial aggregation,
which is exactly the shape that scales: partials shrink the shuffle to
|groups| × |partitions| regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.functions.parity import (
    davg,
    dsum,
    dsum_mul,
    o_davg,
    o_dsum,
    o_dsum_mul,
)
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum("l_quantity")}      AS sum_qty,
           {o_dsum("l_extendedprice")} AS sum_base_price,
           {o_dsum_mul("l_extendedprice", "(1.0 - l_discount)")} AS sum_disc_price,
           {o_davg("l_quantity")}      AS avg_qty,
           min(l_quantity)             AS min_qty,
           max(l_quantity)             AS max_qty,
           CAST(count(*) AS BIGINT)    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A2",),
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary (A2): the flagship aggregate.
    sum/avg use exact decimal partials (see functions/parity.py) so the
    result is independent of partitioning — a correctness *and* a
    reproducibility property at cluster scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_mul("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A3",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (A3).  Spark expands count-distinct into a
    two-phase aggregate (partial distinct then merge) automatically."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "q_approx_distinct",
    oracle=None,  # approximate sketch — rows-only check by design
    tags=("A4",),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (A4).  The sketch value is
    implementation-defined, so there is no SQL oracle (rows-only); the
    unit test asserts the estimate is within rsd of the exact count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


@query(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           {o_dsum("l_quantity")}   AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (A5): subtotals + grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           NULLIF(CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT), 0) AS "O",
           NULLIF(CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT), 0) AS "F",
           NULLIF(CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT), 0) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A2", "A5"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (cross-tab) aggregation: order counts by priority ×
    status.  Values are listed explicitly — at scale an implicit pivot
    needs a distinct-value collection job first, and unpinned columns
    break schema stability.  Spark leaves absent cells NULL (not 0),
    which the oracle mirrors with NULLIF."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )


@query(
    "q_percentile",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.9)  AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A6",),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (A6): Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the linear-interpolation definition.  (The
    scalable variant is ``percentile_approx`` — see q_approx_distinct for
    why sketches are rows-only.)
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
    )


@query(
    "q_collect_adjacency",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(s_name)), ',') AS suppliers,
           CAST(count(*) AS BIGINT)                      AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("A7",),
)
def q_collect_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency-list materialization (A7): collect_list per group —
    the graph form of the reference's relationships table.  The list is
    sorted then joined to a string so the hash is order-insensitive.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           {o_dsum("l_quantity")}   AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube (A5): all 2^k grouping combinations in one pass —
    Spark expands the sets map-side, still a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           {o_dsum("l_quantity")}   AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("A5",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (A5): the general form rollup/cube
    specialize; one shuffle for all three groupings."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "q_approx_percentile",
    oracle=None,  # sketch output is implementation-defined — rows-only
    tags=("A6", "A4"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (A6 at scale): a mergeable sketch with
    bounded error replaces the exact sort-based percentile — at 100 TB
    the exact form needs all values per group; the sketch is fixed-size
    per partition and combines map-side.  Accuracy vs the exact result
    is pinned by a unit test (±1% relative error)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )
