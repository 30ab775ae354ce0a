"""SPO-graph queries — the reference's core identity, re-expressed.

The reference turns each Kafka Avro record into a subject–predicate–
object triple and materializes an entity/relationship graph in Postgres
with dedup-on-write (``src/KafkaConsumerCallback.cpp:89-110``,
``src/Database.cpp:41-78``).  The batch analogues below run on the
``events`` stand-in stream (FIXTURES.md role mapping: user_id→subject,
event_type→predicate, props→object); the full materializer lives in
operators/graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_triple_projection",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS subject,
           event_type               AS predicate,
           props                    AS object
    FROM events
    """,
    tags=("P1", "P2"),
)
def q_triple_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPO shaping (P1+P2): rename/project the stream into the triple
    schema — the reference's ``column_map`` {Source→subject,
    Relationship→predicate, Target→object} (configs/SPO_2_kafka.yaml:26-29).
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").cast("string").alias("subject"),
        F.col("event_type").alias("predicate"),
        F.col("props").alias("object"),
    )


@query(
    "q_vertex_upsert",
    oracle="""
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS object_name,
           'user'          AS object_type,
           DATE '2024-01-01' AS created_at
    FROM events
    WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)
    """,
    tags=("S7", "J4"),
)
def q_vertex_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-new-vertices-only (S7 semantics): the reference's
    ``INSERT … ON CONFLICT DO NOTHING`` (Database.h:23-25) is exactly
    distinct + anti-join against the existing vertex set.  created_at is
    a fixed literal (the reference stamps wall clock,
    KafkaConsumerCallback.cpp:94-99, which is non-reproducible).
    """
    e = load_table(spark, sf_dir, "events")
    existing = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("k")
    )
    return (
        e.select(F.col("user_id").alias("k"))
        # no hint: the existing-vertex set is SF-sized (grows with the
        # store) — planner broadcasts while small, shuffled anti-join at
        # scale; a forced broadcast of the full vertex set cannot scale
        .join(existing, "k", "left_anti")
        .select(
            F.col("k").cast("string").alias("object_name"),
            F.lit("user").alias("object_type"),
            F.lit("2024-01-01").cast("date").alias("created_at"),
        )
        .distinct()
    )


@query(
    "q_error_split",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN props LIKE '{%}' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN props LIKE '{%}' THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
    FROM events
    GROUP BY event_type
    """,
    tags=("P7",),
)
def q_error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/invalid routing (P7): the reference counts deserialization
    failures and keeps going (``Invalid CP1 magic byte``,
    src/main.cpp:249-252).  Batch analogue: classify each record and
    count both routes per predicate — the DLQ pattern's bookkeeping half.
    """
    e = load_table(spark, sf_dir, "events")
    valid = F.col("props").like("{%}")
    return e.groupBy("event_type").agg(
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).cast("long").alias("n_invalid"),
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("U4",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (U4): distinct on the dedup key — hash-shuffle on the
    key with map-side partial dedup, the at-scale shape of the
    reference's unique-constraint insert."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


@query(
    "q_degree_dist",
    oracle="""
    SELECT out_degree, CAST(count(*) AS BIGINT) AS n_vertices
    FROM (
      SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS out_degree
      FROM events
      GROUP BY user_id
    )
    GROUP BY out_degree
    """,
    tags=("A2", "J5"),
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the materialized SPO graph — the first
    diagnostic query over the reference's relationships table
    (Database.h:29-31): per-subject distinct-predicate out-degree,
    histogrammed.  Two cascaded aggregations; the second input is
    |vertices|-sized, so at 100 TB only the first shuffle sees data
    at scale."""
    e = load_table(spark, sf_dir, "events")
    deg = e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("out_degree")
    )
    return deg.groupBy("out_degree").agg(F.count("*").alias("n_vertices"))


@query(
    "q_coengagement_pairs",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    deg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS deg FROM ut GROUP BY user_id),
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2, CAST(count(*) AS BIGINT) AS shared
      FROM ut a JOIN ut b
        ON a.event_type = b.event_type AND a.user_id < b.user_id
      GROUP BY 1, 2
    )
    SELECT u1, u2, shared,
           CAST(shared AS DOUBLE)
             / CAST(d1.deg + d2.deg - shared AS DOUBLE) AS jaccard,
           CAST(row_number() OVER (
             ORDER BY CAST(shared AS DOUBLE)
                        / CAST(d1.deg + d2.deg - shared AS DOUBLE) DESC,
                      u1, u2) AS INT) AS rank
    FROM pairs
    JOIN deg d1 ON d1.user_id = u1
    JOIN deg d2 ON d2.user_id = u2
    ORDER BY jaccard DESC, u1, u2
    LIMIT 50
    """,
    tags=("J5", "A2", "graph"),
)
def q_coengagement_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-engagement similarity (J5): Jaccard over the bipartite SPO
    graph's subject side — user pairs ranked by |types∩| / |types∪|,
    the user-user projection of the reference's entity/relationship
    store (src/Database.h:23-31).  One self-join keyed on the type
    vertex generates wedges; per-pair intersection counts aggregate in
    the same shuffle; degrees broadcast back onto the pair stream.  The
    top-50 compiles to TakeOrdered.  At scale the wedge fan-out of hot
    type vertices is the butterfly-counting skew problem — the standard
    mitigation (cap or sample hub vertices) slots in as a degree filter
    on the join input; correctness here keeps the exact form.  Single
    IEEE division per pair → bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    deg = ut.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    d1 = deg.select(F.col("user_id").alias("u1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("user_id").alias("u2"), F.col("deg").alias("deg2"))
    jac = F.col("shared").cast("double") / (
        F.col("deg1") + F.col("deg2") - F.col("shared")
    ).cast("double")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("jaccard"), F.asc("u1"), F.asc("u2"))
    return (
        # degree table is user-sized (unbounded at scale): no hint —
        # planner broadcasts while small, shuffles on u1/u2 at 100 TB
        pairs.join(d1, "u1")
        .join(d2, "u2")
        .select("u1", "u2", "shared", jac.alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("u1"), F.asc("u2"))
        .limit(50)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("u1", "u2", "shared", "jaccard", "rank")
    )


@query(
    "q_butterfly_census",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tdeg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d
             FROM ut GROUP BY event_type),
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2, CAST(count(*) AS BIGINT) AS shared
      FROM ut a JOIN ut b
        ON a.event_type = b.event_type AND a.user_id < b.user_id
      GROUP BY 1, 2
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ut)            AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM tdeg) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs)          AS n_connected_pairs,
           (SELECT CAST(sum(shared * (shared - 1) / 2) AS BIGINT) FROM pairs) AS n_butterflies
    """,
    tags=("J5", "A2", "graph"),
)
def q_butterfly_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite motif census (J5/A2): edges, wedges (2-paths through a
    type vertex), connected user pairs, and butterflies (4-cycles — the
    bipartite analogue of triangles, the standard cohesion measure for
    bipartite graphs, counted per-pair as C(shared,2)).  Wedges come
    from type degrees alone (no join); butterflies reuse the
    co-engagement wedge join.  Everything is integer arithmetic —
    exact at any scale and partitioning."""
    ev = load_table(spark, sf_dir, "events")
    # NO persist: a cached frame referenced by the RETURNED plan would
    # leak its blocks for the session (the driver runs the whole
    # catalog in one SparkSession).  Instead, n_edges derives from
    # tdeg (Σ d == |ut|), so ut has two consumers — the degree agg and
    # the self-join, whose two sides share one exchange under reuse —
    # and no subtree needs caching.
    ut = ev.select("user_id", "event_type").distinct()
    tdeg = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("d"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    edge_wedge = tdeg.agg(
        # coalesce: Σd over an EMPTY tdeg is NULL, but the oracle's
        # count(*) over ut is 0 — the empty-corpus edge must agree
        F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    pair_stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_connected_pairs"),
        F.sum(F.col("shared") * (F.col("shared") - 1) / 2)
        .cast("long")
        .alias("n_butterflies"),
    )
    return edge_wedge.crossJoin(pair_stats)


@query(
    "q_trade_triangles",
    oracle="""
    WITH w AS (
      SELECT least(c_nationkey, s_nationkey)    AS u,
             greatest(c_nationkey, s_nationkey) AS v,
             CAST(count(*) AS BIGINT)           AS n
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      WHERE c_nationkey <> s_nationkey
      GROUP BY 1, 2
    ),
    e AS (SELECT u, v FROM w ORDER BY n DESC, u, v LIMIT 100)
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=("J5", "A2", "graph"),
)
def q_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration (J5) over the nation-level trade graph: the
    top-100 strongest customer-nation↔supplier-nation trade edges, then
    every triangle (a<b<c) among them — the canonical graph-cohesion
    motif, here over the graph the reference's relationships table
    (src/Database.h:29-31) would materialize.

    Scale shape: the edge list aggregates the 4-table trade join down to
    ≤|V|² rows BEFORE any graph work (the same facts-first pre-reduction
    as q_local_supplier_volume), and the canonical u<v edge orientation
    makes the triangle enumeration a pure 2-join pipeline with each edge
    examined once per role — no direction double-count, no post-hoc
    dedup.  On a 100 TB fact table the heavy stage is still the trade
    aggregation; the motif joins run on vertex-bounded data.  For
    social-scale SPARSE graphs (|E| ≫ |V|²-bounded here) the same plan
    holds with degree-based orientation replacing id order, which bounds
    hub fan-out by sqrt(|E|).  Top-100 edge cut is deterministic via the
    (weight desc, u, v) total order."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    w = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # The edge list is vertex-bounded (≤|V|² rows, ≤100 after the cut),
    # so materialize it ONCE on the driver: referencing the unpersisted
    # subplan in three join roles would re-run the 4-table trade
    # aggregation — the expensive stage — three times.
    edges = (
        w.orderBy(F.desc("n"), F.asc("u"), F.asc("v")).limit(100).select("u", "v")
    ).collect()
    e = spark.createDataFrame(edges, "u INT, v INT")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    # local relations carry no stats, so hint the (≤100-row) build sides
    return (
        e1.join(F.broadcast(e2), "b")
        .join(F.broadcast(e3), ["a", "c"])
        .select("a", "b", "c")
    )


@query(
    "q_cc_components",
    oracle="""
    WITH RECURSIVE
      base AS (
        SELECT CAST(o_custkey  AS BIGINT) * 10     AS a,
               CAST(o_orderkey AS BIGINT) * 10 + 1 AS b
        FROM orders WHERE o_orderkey % 199 = 0
        UNION ALL
        SELECT CAST(l_orderkey AS BIGINT) * 10 + 1 AS a,
               CAST(l_suppkey  AS BIGINT) * 10 + 2 AS b
        FROM lineitem WHERE l_orderkey % 199 = 0
      ),
      e AS (
        SELECT DISTINCT a, b FROM
          (SELECT a, b FROM base UNION ALL SELECT b AS a, a AS b FROM base)
      ),
      reach(node, comp) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.node
      )
    SELECT node, MIN(comp) AS comp FROM reach GROUP BY node
    """,
    tags=("J5", "U5", "graph"),
)
def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a multi-hop entity graph, with the
    DISTRIBUTED hash-min + pointer-jumping loop forced
    (``small_graph_edges=0``) — the other CC-backed queries
    (q_dedup_clusters, q_dedup_pipeline) run small pair graphs that the
    operator's adaptive union-find fallback answers driver-side, so
    this row is the driver-level certification of the loop that a
    100 TB pair graph would actually execute.

    Graph: a deterministic 1/199 keyspace sample of orders, three node
    namespaces packed into disjoint bigint ranges (customer = key*10,
    order = key*10+1, supplier = key*10+2), edges customer—order and
    order—supplier.  Both edge sets derive from pure pushed-down
    filters — the order—supplier edges come straight from lineitem's
    own l_orderkey, no join against the sampled orders — so at any SF
    the pre-graph stage is two filtered scans.  Components chain
    customers to each other through shared suppliers (diameter ≥ 4,
    exercising the pointer jump).  Oracle: DuckDB recursive-CTE
    reachability with the same min-id labeling (the same twin shape as
    _o_dedup_clusters).

    Replaces the reference's graph-in-Postgres identity
    (src/Database.h:29-31) at analysis level: once relationships are
    materialized, "which entities are transitively connected" is the
    first graph question asked of them.
    """
    from consume_kafka_avro_data_spark.operators.graph import connected_components

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 199 == 0
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 199 == 0
    )
    cust_edges = orders.select(
        (F.col("o_custkey").cast("bigint") * 10).alias("src"),
        (F.col("o_orderkey").cast("bigint") * 10 + 1).alias("dst"),
    )
    supp_edges = li.select(
        (F.col("l_orderkey").cast("bigint") * 10 + 1).alias("src"),
        (F.col("l_suppkey").cast("bigint") * 10 + 2).alias("dst"),
    )
    edges = cust_edges.unionAll(supp_edges)
    return connected_components(edges, "src", "dst", small_graph_edges=0)
