"""Scale-mechanics tests: skew salting and bucketed shuffle-free joins.

These pin the *mechanisms* a 100 TB deployment leans on — correctness
of the salted rewrites (row-identical to the unsalted plan) and the
plan shape of bucketed joins (zero shuffle exchanges) — at toy size,
where they are cheap to verify exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consume_kafka_avro_data_spark.operators.skew import salted_join, salted_sum_count
from consume_kafka_avro_data_spark.plans.inspect import exchange_count


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on one hot key — the shape AQE flags as skew
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("key"),
        (F.col("id") % 1000).cast("double").alias("value"),
        F.col("id"),
    )


@pytest.fixture()
def dim(spark):
    keys = [("hot",)] + [(f"k{i}",) for i in range(97)]
    return spark.createDataFrame(keys, ["key"]).withColumn(
        "label", F.concat(F.lit("L-"), F.col("key"))
    )


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "key").select("id", "key", "label")
    salted = salted_join(skewed, dim, "key").select("id", "key", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_matches_plain(spark, skewed):
    # dim missing some keys → left join must preserve unmatched rows
    partial_dim = spark.createDataFrame([("hot",), ("k1",)], ["key"]).withColumn(
        "label", F.lit("x")
    )
    plain = skewed.join(partial_dim, "key", "left").select("id", "key", "label")
    salted = salted_join(skewed, partial_dim, "key", how="left").select(
        "id", "key", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_matches_plain_agg(skewed):
    plain = (
        skewed.groupBy("key")
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    salted = salted_sum_count(skewed, "key", "value").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salt_is_deterministic(skewed, dim):
    a = salted_join(skewed, dim, "key").collect()
    b = salted_join(skewed, dim, "key").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from consume_kafka_avro_data_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        left = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(left, "t_bleft", "k", 4)
        write_bucketed(right, "t_bright", "k", 4)

        joined = bucketed_join(spark, "t_bleft", "t_bright", "k")
        assert joined.count() == 500
        # the whole point: bucketed layout ⇒ zero shuffle exchanges
        assert exchange_count(joined) == 0

        # same join on unbucketed frames shuffles both sides
        plain = left.join(right, "k")
        plain.count()
        assert exchange_count(plain) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_partitioned_layout_prunes_at_planning_time(spark, sf_dir, tmp_path):
    """Hive-style partitioning by a low-cardinality column (lang) is the
    file-layout half of partition pruning: a lang = 'en' filter must
    appear as a PartitionFilter (planning-time file skip), not a data
    filter evaluated per row."""
    from consume_kafka_avro_data_spark.plans.inspect import partition_filters
    from consume_kafka_avro_data_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out)

    filtered = spark.read.parquet(out).where(F.col("lang") == "en").select("doc_id")
    pf = partition_filters(filtered)
    assert any("lang" in f for f in pf), f"no partition filter on lang: {pf}"

    expected = docs.where(F.col("lang") == "en").count()
    assert filtered.count() == expected
