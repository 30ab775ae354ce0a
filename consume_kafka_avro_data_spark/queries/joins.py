"""Join queries (SURVEY §2.3, J1–J6).

The reference's single physical join is a per-row keyed lookup into
Postgres (``src/Database.cpp:26-39``, exemplar
``src/KafkaConsumerCallback.cpp:103-105``).  Here every lookup becomes a
set-oriented join and Catalyst/AQE picks the strategy; small dimension
sides are explicitly broadcast so at 100 TB the fact-side scan never
shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from consume_kafka_avro_data_spark.functions.parity import (
    dsum_mul_final,
    dsum_mul_partial,
    o_dsum_mul,
)
from consume_kafka_avro_data_spark.operators.asof import asof_join
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_fk_lookup_join",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 150000.0
    """,
    tags=("J1",),
)
def q_fk_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed FK lookup (J1): the reference resolves object_name→id one
    row at a time (Database.cpp:26-39); set-oriented it is a broadcast
    hash join — the customer dimension ships to every executor and the
    orders scan stays shuffle-free.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # no hint: customer grows linearly with SF (scale-factor-sized, not
    # truly tiny like nation/region) — the planner broadcasts it while
    # its size estimate fits and shuffles at 100 TB instead of OOMing
    return (
        o.where(F.col("o_totalprice") > 150000.0)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "q_edge_join",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           {o_dsum_mul("l_extendedprice", "(1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("J2", "J3", "A2"),
)
def q_edge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge construction / multi-table equi-join (J2/J3): the flagship
    fact⋈fact⋈dim chain, with the aggregation PRE-PUSHED below the join:
    lineitem partial-aggregates per order key first (exact decimal
    partials, so the final sums are unchanged), which shrinks the join
    input by the lineitem:orders fan-in ratio (~4×) — a rewrite Catalyst
    does not perform itself and the single biggest join-cost lever at
    100 TB.  Orders then joins the pre-aggregate on the shared key
    (partitioning reuse; AQE may demote to broadcast locally), customer
    is broadcast, and the final segment rollup re-aggregates the
    partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n"),
        dsum_mul_partial(
            "l_extendedprice", F.lit(1.0) - F.col("l_discount")
        ).alias("_rev"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        # customer is SF-sized: unhinted, the planner broadcasts it only
        # while its estimate fits the threshold (it does at bench SFs)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("_n").alias("n_lineitems"),
            # exact long partials re-sum exactly; the finalize applies
            # the same scale-2 HALF_UP + single double rounding as
            # dsum_mul (functions/parity.py)
            dsum_mul_final("_rev").alias("revenue"),
        )
    )


@query(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, c_name,
           (o.o_custkey IS NOT NULL) AS has_order
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
           ON c.c_custkey = o.o_custkey
    """,
    tags=("J4",),
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join semantics (J4) in one result: customers flagged by
    order existence.  This is exactly the reference's dedup-insert test
    ("already present?" — Database.h:23-25) expressed relationally.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    # NO broadcast hint: the build side is fact-derived (distinct orders
    # keys ~= |customer|, unbounded at scale).  The planner broadcasts it
    # while its size estimate is under the threshold and falls back to a
    # shuffled join at 100 TB — an explicit hint would force driver OOM.
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.col("o_custkey").isNotNull().alias("has_order"),
    )


@query(
    "q_two_hop",
    oracle="""
    SELECT r_name, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region  ON a.n_regionkey = r_regionkey
    """,
    tags=("J5",),
)
def q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join traversal (J5): 2-hop neighbors through a shared hub —
    the pattern for querying the reference's ``relationships`` edge table
    (Database.h:29-31) once materialized.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        # region is 5 rows at ANY scale factor — always broadcast-safe
        .join(broadcast(r), F.col("a.n_regionkey") == F.col("r_regionkey"))
        .select("r_name", F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))
    )


@query(
    "q_range_join",
    oracle="""
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_poorer_customers
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_suppkey, s_name
    """,
    tags=("J6",),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (J6): equi on nation + range on balance.  The
    equi conjunct keeps it a hash join (the range predicate is a
    post-join filter); a pure theta join would degrade to
    broadcast-nested-loop — worth avoiding by construction at scale.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_poorer_customers"))
    )


_SCALAR_SUBQUERY_SQL = """
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
    FROM {orders} o
    WHERE o.o_totalprice >
          (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(i.o_totalprice)
           FROM {orders} i
           WHERE i.o_orderpriority = o.o_orderpriority)
"""


@query(
    "q_scalar_subquery",
    oracle=_SCALAR_SUBQUERY_SQL.format(orders="orders"),
    tags=("J3", "A2"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders priced above their priority
    class's average.  Catalyst decorrelates this into an aggregate +
    join (SURVEY §4) — verified by the plan, no hand rewrite.  The
    identical SQL text runs on DuckDB; the average uses the exact
    decimal-sum parity form so the > cut is engine-independent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_SCALAR_SUBQUERY_SQL.format(orders="orders_v"))


@query(
    "q_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS asof_ts, r.value AS asof_value,
           date_diff('microsecond', r.ts, l.ts) AS micros_since_error
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("J7",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7): each click enriched with the user's most recent
    earlier-or-equal error event.  Union + running-last plan: one shuffle
    on user_id, no per-row candidate explosion (operators/asof.py)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = e.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    joined = asof_join(
        clicks, errors, on="user_id", left_ts="ts", right_ts="ts", right_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "asof_ts",
        "asof_value",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        ).alias("micros_since_error"),
    )


@query(
    "q_asof_tolerance",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CASE WHEN gap <= 3600000000 THEN asof_ts END AS asof_ts,
           CASE WHEN gap <= 3600000000 THEN asof_value END AS asof_value
    FROM (
      SELECT l.event_id, l.user_id, l.ts, l.value,
             r.ts AS asof_ts, r.value AS asof_value,
             date_diff('microsecond', r.ts, l.ts) AS gap
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN
           (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    """,
    tags=("J7",),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (J7): like q_asof_join but a
    most-recent error older than one hour is treated as NO match — pandas
    ``merge_asof(tolerance=...)`` semantics, applied as a post-window
    predicate so the plan keeps the one-shuffle union + running-last
    shape.  The stream-enrichment version of "state expires"."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = e.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    return asof_join(
        clicks,
        errors,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        tolerance_seconds=3600.0,
    ).select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")


_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > CAST(200000 AS DOUBLE))
      AND NOT EXISTS (SELECT 1 FROM {orders} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
"""


@query(
    "q_exists_subquery",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
    tags=("J4", "J3"),
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (J4 closure): customers with at
    least one big-ticket order and no finished orders.  Written as SQL so
    Catalyst's subquery rewrite does the work — it decorrelates into a
    left-semi plus a left-anti hash join (one shuffle each, aggregations
    never materialize the subquery), which is exactly the set-oriented
    form of the reference's per-row existence probe
    (src/Database.h:23-25 ON CONFLICT DO NOTHING)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex_v")
    return spark.sql(_EXISTS_SQL.format(customer="customer_ex_v", orders="orders_ex_v"))


@query(
    "q_supply_chain_reach",
    oracle="""
    WITH h1 AS (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    h2 AS (SELECT DISTINCT c_custkey FROM customer
           JOIN h1 ON c_nationkey = n_nationkey),
    h3 AS (SELECT DISTINCT o_orderkey FROM orders
           JOIN h2 ON o_custkey = c_custkey),
    h4 AS (SELECT DISTINCT l_suppkey FROM lineitem
           JOIN h3 ON l_orderkey = o_orderkey),
    h5 AS (SELECT DISTINCT s_nationkey FROM supplier
           JOIN h4 ON s_suppkey = l_suppkey)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM h1) AS n_nations,
           (SELECT CAST(count(*) AS BIGINT) FROM h2) AS n_customers,
           (SELECT CAST(count(*) AS BIGINT) FROM h3) AS n_orders,
           (SELECT CAST(count(*) AS BIGINT) FROM h4) AS n_suppliers,
           (SELECT CAST(count(*) AS BIGINT) FROM h5) AS n_supplier_nations
    """,
    tags=("J3", "J5"),
)
def q_supply_chain_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability (J5) over the relational graph: starting
    from one region, the BFS frontier sizes through nations → customers
    → orders → supplying suppliers → supplier nations.  Each hop is an
    equi-join against the (distinct) previous frontier; only the
    nation-level frontier (≤25 rows at any SF) carries a broadcast
    hint — the wider fact-derived frontiers are left to the planner,
    which broadcasts them while small and shuffles them at 100 TB —
    the frontier-expansion shape any iterative graph traversal (and
    q_pagerank's loop) uses.  Counts are integers: exact on both
    engines."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    h1 = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .select("n_nationkey")
    )
    # h1 is nation-derived (≤25 rows at ANY SF) — the only hinted
    # frontier.  h2/h3/h4 are fact-derived (customer-/orders-/lineitem-
    # sized) and carry NO hint: the planner broadcasts small frontiers
    # and falls back to shuffled joins at 100 TB, where a forced
    # broadcast of millions of order keys would OOM the driver.
    h2 = (
        customer.join(F.broadcast(h1), customer.c_nationkey == h1.n_nationkey)
        .select("c_custkey")
        .distinct()
    )
    h3 = (
        orders.join(h2, orders.o_custkey == h2.c_custkey)
        .select("o_orderkey")
        .distinct()
    )
    h4 = (
        lineitem.join(h3, lineitem.l_orderkey == h3.o_orderkey)
        .select("l_suppkey")
        .distinct()
    )
    h5 = (
        supplier.join(h4, supplier.s_suppkey == h4.l_suppkey)
        .select("s_nationkey")
        .distinct()
    )
    counts = [
        h1.agg(F.count(F.lit(1)).cast("long").alias("n_nations")),
        h2.agg(F.count(F.lit(1)).cast("long").alias("n_customers")),
        h3.agg(F.count(F.lit(1)).cast("long").alias("n_orders")),
        h4.agg(F.count(F.lit(1)).cast("long").alias("n_suppliers")),
        h5.agg(F.count(F.lit(1)).cast("long").alias("n_supplier_nations")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@query(
    "q_interval_count_binned",
    oracle="""
    SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
          FROM orders WHERE o_totalprice > 450000) o
    JOIN (SELECT CAST(l_shipdate AS DATE) AS sd FROM lineitem) l
      ON l.sd >= o.od AND l.sd < o.od + INTERVAL 7 DAY
    GROUP BY o_orderkey
    """,
    tags=("J6",),
)
def q_interval_count_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE interval join (J6 hard case): per high-value order, count
    ALL lineitems shipped in the 7 days from its order date — no shared
    key, so naive execution is a broadcast-nested-loop over the full
    cross product.  The scale plan bins both sides into 7-day epochs:
    every 7-day query window overlaps at most 2 bins, so the query side
    fans out ×2, the join becomes an EQUI join on bin, and the exact
    range predicate runs as a post-join filter on bin-local pairs.
    Cost drops from O(|orders|·|lineitem|) to O(pairs sharing a bin) —
    the same rewrite Databricks' range-join hints apply.  The oracle
    states the declarative range-join form; results are identical.

    r11 (guide §2.3, aggregate before the join): because the join
    payload is a pure COUNT, the probe side collapses to per-day rows
    FIRST (|lineitem| → ≤ ~2.5k distinct ship days, domain-bounded at
    any SF) and ``count(*)`` becomes ``sum(cnt)`` — the bin machinery
    (×2-bin window explode, bin equi-join, range post-filter) is
    unchanged, but the join intermediate drops from ~25M pair rows
    (which at sf0.1 all ran on ONE task — the single-row-group parquet
    scan caps the probe's parallelism) to ~200k day×order rows:
    measured 2.87 s → 0.62 s, value-identical.  For interval joins
    whose downstream needs row-level payloads the probe stays at row
    granularity — then re-establish parallelism with a repartition
    after the scan (measured 3.05 s → 1.71 s at sf0.1; a no-op at
    scale where splits ≫ cores).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    q = o.where(F.col("o_totalprice") > 450000).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    # day numbers (integer) and 7-day bins
    q = q.withColumn("od_day", F.unix_date(F.col("od")))
    probe = (
        li.select(
            F.unix_date(F.col("l_shipdate").cast("date")).alias("sd_day")
        )
        .groupBy("sd_day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bin", F.expr("sd_day div 7"))
    )
    build = q.select(
        "o_orderkey",
        "od_day",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr("od_day div 7"), F.expr("(od_day + 6) div 7")
                )
            )
        ).alias("bin"),
    )
    return (
        probe.join(build, "bin")
        .where(
            (F.col("sd_day") >= F.col("od_day"))
            & (F.col("sd_day") < F.col("od_day") + 7)
        )
        .groupBy("o_orderkey")
        .agg(F.sum("cnt").alias("n_shipped"))
    )


@query(
    "q_interval_histogram",
    oracle="""
    SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
          FROM orders WHERE o_totalprice > 450000) o
    JOIN (SELECT CAST(l_shipdate AS DATE) AS sd FROM lineitem) l
      ON l.sd >= o.od AND l.sd < o.od + INTERVAL 7 DAY
    GROUP BY o_orderkey
    """,
    tags=("J6", "A2"),
)
def q_interval_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-pushdown interval COUNT (J6 specialization): the same
    answer as q_interval_count_binned, but when the payload is a pure
    count the join never needs row-level pairs — aggregate the big side
    into a per-day histogram FIRST (|lineitem| → |distinct ship days|,
    600k → ~2.4k at sf0.1), explode each order's 7-day window into
    exact days, and equi-join the broadcast histogram.  Work drops from
    O(pairs-sharing-a-bin) (46M pairs at sf0.1) to
    O(|lineitem| + 7·|orders|) — the shape that survives 100 TB, where
    the generic bin rewrite is reserved for joins that truly need the
    pair payloads.  Same DuckDB range-join oracle as the generic form."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(F.unix_date(F.col("l_shipdate").cast("date")).alias("sd_day"))
        .groupBy("sd_day")
        .agg(F.count("*").alias("day_n"))
    )
    days = (
        o.where(F.col("o_totalprice") > 450000)
        .select(
            "o_orderkey",
            F.unix_date(F.col("o_orderdate").cast("date")).alias("od_day"),
        )
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(F.col("od_day"), F.col("od_day") + 6)
            ).alias("sd_day"),
        )
    )
    return (
        # hist is one row per ship-date DAY (≤ ~2500 over the 7-year
        # span at ANY SF — domain-bounded, not data-sized)
        days.join(F.broadcast(hist), "sd_day")
        .groupBy("o_orderkey")
        .agg(F.sum("day_n").alias("n_shipped"))
    )
