"""Scan / projection / scalar-transform queries (SURVEY §2.2, P1–P14).

These re-express the reference's config-driven record shaping — column
subset (reference ``src/config/ConfigParser.cpp:99-106``), rename
(``:144-148``), type cast (``:149-164``), JSON field extraction
(``src/KafkaConsumerCallback.cpp:89-92``) — as declarative DataFrame
projections, plus the relational scalar-function closure (EXT).

Scale notes: every query here is a single-stage narrow plan — parquet
scan with column pruning + pushed filters feeding whole-stage codegen.
No shuffle, no UDFs; at 100 TB these are scan-bound and embarrassingly
parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from consume_kafka_avro_data_spark.operators.bucketing import o_zorder_key as _ozk
from consume_kafka_avro_data_spark.registry import query
from consume_kafka_avro_data_spark.tables import load_table


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("P1", "S11"),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset scan (P1): only configured columns are read.

    Mirrors the reference's static projection where only YAML-listed
    columns enter the assembled schema (ConfigParser.cpp:99-106,143).
    The filter and the 4-column ReadSchema both push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


@query(
    "q_rename_cast",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
           CAST(o_orderdate AS DATE)   AS order_date,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents,
           o_orderpriority AS priority
    FROM orders
    """,
    tags=("P2", "P3"),
)
def q_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename + cast (P2/P3): the reference's ``column_map`` /
    ``column_type_transforms`` semantics (ConfigParser.cpp:144-164).

    total_cents goes through DECIMAL(18,2) before ×100 so the
    double→integer conversion has no truncate-vs-round ambiguity.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)).cast("long").alias("total_cents"),
        F.col("o_orderpriority").alias("priority"),
    )


@query(
    "q_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity, l_discount
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND (l_linestatus = 'F' OR l_discount > 0.05)
      AND l_shipdate IS NOT NULL
      AND NOT (l_discount = 0.0)
    """,
    tags=("P8",),
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate closure (P8): IN / BETWEEN / AND-OR-NOT / IS NULL.

    All conjuncts are pushdown-eligible parquet filters.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & ((F.col("l_linestatus") == "F") | (F.col("l_discount") > 0.05))
        & F.col("l_shipdate").isNotNull()
        & ~(F.col("l_discount") == 0.0)
    ).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity", "l_discount"
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '-', p_type)            AS brand_type,
           upper(p_name)                            AS name_upper,
           lower(p_brand)                           AS brand_lower,
           trim(p_name)                             AS name_trim,
           substring(p_name, 1, 8)                  AS name_prefix,
           CAST(length(p_name) AS INT)              AS name_len,
           regexp_replace(p_name, ' ', '_', 'g')    AS name_snake,
           split_part(p_type, ' ', 1)               AS type_head,
           p_name LIKE '%a%'                        AS has_a
    FROM part
    """,
    tags=("P9",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function closure (P9): concat/upper/lower/trim/substring/
    length/regexp_replace/split_part/LIKE.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_epoch_start,
           epoch_us(o_orderdate) AS micros
    FROM orders
    """,
    tags=("P10",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time closure (P10): year/month/date_trunc/datediff/epoch.

    Epoch extraction uses integer microseconds (``unix_micros`` ↔
    ``epoch_us``) — never float seconds — and the session timezone is
    pinned to UTC (session.py) so both engines see the same wall clock.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("micros"),
    )


@query(
    "q_math_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity * 100.0)      AS abs_diff,
           sqrt(l_quantity)                               AS qty_sqrt,
           CAST(floor(l_discount * 100.0) AS BIGINT)      AS disc_pct,
           CAST(ceil(l_quantity / 7.0)    AS BIGINT)      AS qty_bucket,
           CASE WHEN l_quantity > 25 THEN 'H'
                WHEN l_quantity > 10 THEN 'M'
                ELSE 'L' END                              AS qty_class,
           coalesce(nullif(l_returnflag, 'N'), 'NONE')    AS flag_or_none
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
    tags=("P11", "P14"),
)
def q_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional closure (P11/P14): abs/sqrt/floor/ceil, CASE
    WHEN, coalesce/nullif.  sqrt is IEEE correctly-rounded, so it is
    bit-identical across engines (unlike log/pow, which we keep out of
    hash-checked outputs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * F.lit(100.0)).alias("abs_diff"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor(F.col("l_discount") * F.lit(100.0)).cast("long").alias("disc_pct"),
        F.ceil(F.col("l_quantity") / F.lit(7.0)).cast("long").alias("qty_bucket"),
        F.when(F.col("l_quantity") > 25, "H")
        .when(F.col("l_quantity") > 10, "M")
        .otherwise("L")
        .alias("qty_class"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_id % 5 = 0
    """,
    tags=("P4", "P13"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (P4/P13) — the reference pulls
    subject/predicate/object out of a transcoded JSON value
    (KafkaConsumerCallback.cpp:89-92); here ``get_json_object`` does the
    same inside codegen.
    """
    e = load_table(spark, sf_dir, "events")
    return e.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)            AS dim,
           CAST(embedding[1]  AS DOUBLE)          AS first_val,
           CAST(embedding[10] AS DOUBLE)          AS tenth_val,
           CAST(unnest(embedding) AS DOUBLE)      AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
    tags=("P12",),
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array closure (P12): size / element_at / explode over the
    ``embedding array<float>`` column (multimodal-columns mandate).
    float→double casts are exact, so hashes match bit-for-bit.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.where(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_val"),
            F.element_at("embedding", 10).cast("double").alias("tenth_val"),
            F.explode("embedding").alias("val"),
        )
        .withColumn("val", F.col("val").cast("double"))
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(len(json_keys(props)) AS INT)                AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INT)    AS k_val
    FROM events
    WHERE event_id % 7 = 0
    """,
    tags=("P12", "P13"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type closure (P12): parse the JSON props into a real
    ``map<string,int>`` and exercise map_keys / size / element_at —
    the typed-metadata access pattern of multimodal columns.  Keys are
    sorted before joining so the hash is order-independent."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return e.where(F.col("event_id") % 7 == 0).select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@query(
    "q_higher_order_arrays",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
                          list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
             (a, b) -> a + b)                                    AS l1_norm,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1] AS first_doubled,
           len(list_filter(embedding,
                           x -> CAST(x AS DOUBLE) > CAST(0.9 AS DOUBLE))) > 0 AS has_big
    FROM embeddings
    """,
    tags=("P12",),
)
def q_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (P12 closure) over the embedding
    column: filter / transform / left-fold aggregate / element access.
    These compile to Catalyst expressions (NOT Python UDFs) — the lambda
    runs inside codegen per row, so vector math at 100 TB stays JVM-side
    and map-only.  The fold is left-to-right in both engines, and every
    float is widened to double before arithmetic, so sums match
    bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
        ).alias("l1_norm"),
        F.element_at(
            F.transform(arr, lambda x: x.cast("double") * F.lit(2)), 1
        ).alias("first_doubled"),
        (F.size(F.filter(arr, lambda x: x.cast("double") > F.lit(0.9))) > 0).alias(
            "has_big"
        ),
    )


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS price,
             CAST(datediff('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE)) AS DOUBLE) AS day
      FROM orders
    ), s AS (
      SELECT min(price) AS pmn, max(price) AS pmx,
             min(day) AS dmn, max(day) AS dmx
      FROM base
    ), g AS (
      SELECT o_orderkey, price, day,
             CASE WHEN pmx = pmn THEN 0
                  ELSE CAST(greatest(0, least(255,
                       floor((price - pmn) / (pmx - pmn) * 256)))
                       AS BIGINT) END AS gp,
             CASE WHEN dmx = dmn THEN 0
                  ELSE CAST(greatest(0, least(255,
                       floor((day - dmn) / (dmx - dmn) * 256)))
                       AS BIGINT) END AS gd
      FROM base, s
    ), z AS (
      SELECT o_orderkey, price, day,
             {_ozk(["gp", "gd"], bits=8)} AS zkey
      FROM g
    ), b AS (
      SELECT price, day,
             CAST(ntile(32) OVER (ORDER BY zkey, o_orderkey) AS INT) AS bucket
      FROM z
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           min(price) AS price_min, max(price) AS price_max,
           CAST(min(day) AS BIGINT) AS day_min,
           CAST(max(day) AS BIGINT) AS day_max
    FROM b
    GROUP BY bucket
    """,
    tags=("S11", "W1", "layout"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout inspection (S11/layout): grid-quantize
    (price, order-day) to 8 bits each, bit-interleave into one Morton
    key, split the zkey-sorted order into 32 layout buckets, and emit
    each bucket's min/max on BOTH dimensions — the per-file statistics
    parquet pruning would use.  Under a single-column sort the second
    column's spans cover the whole domain; under Z-order every bucket is
    a tight hyper-rectangle, so filters on EITHER column prune files.

    Scale shape: the key is pure shift/mask codegen (no UDF); the 1-row
    min/max stats broadcast; at 100 TB the ntile inspection window is
    replaced by the layout write itself (``repartitionByRange(zkey)``
    + sorted parquet) — the bucket-stats output here exists to make the
    pruning benefit oracle-checkable."""
    from consume_kafka_avro_data_spark.operators.bucketing import zorder_frame
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("double")
        .alias("day"),
    )
    z = zorder_frame(base, ["price", "day"], bits=8)
    w = Window.orderBy("zkey", "o_orderkey")
    b = z.select("price", "day", F.ntile(32).over(w).cast("int").alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("price").alias("price_min"),
        F.max("price").alias("price_max"),
        F.min("day").cast("long").alias("day_min"),
        F.max("day").cast("long").alias("day_max"),
    )
