"""Skew-handling operators and sink writes: correctness equivalence of the
salted variants, partition pruning and shuffle-free joins from sinks."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from training_flink_sql_cc_src_spark.sources.sinks import (
    write_compacted,
    write_partitioned,
)


def _skewed_fact(spark, n=20_000):
    """90% of rows share key 0 (a hot key), the rest spread over 100 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_count_distinct(spark):
    fact = _skewed_fact(spark)
    plain = {
        r.k: r.n
        for r in fact.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r.k: r.n_distinct_v for r in salted_aggregate(fact, ["k"], "v").collect()
    }
    assert plain == salted


def test_partitioned_write_prunes(spark, sf_small):
    from training_flink_sql_cc_src_spark.queries._util import t

    path = tempfile.mkdtemp(prefix=f"sink-{uuid.uuid4().hex[:8]}-")
    docs = t(spark, sf_small, "documents")
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # filter on the partition column must become directory pruning
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(lang" in plan
    n_en = back.filter(F.col("lang") == "en").count()
    assert n_en == docs.filter(F.col("lang") == "en").count()


def test_compacted_write_is_latest_per_key(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 1, "only")], "k int, seq int, val string"
    )
    path = tempfile.mkdtemp(prefix=f"compact-{uuid.uuid4().hex[:8]}-")
    write_compacted(df, path, keys=["k"], order_col="seq")
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "new", 2: "only"}


def test_bucketed_write_roundtrip(spark, sf_small):
    """DISTRIBUTED INTO n BUCKETS analog: bucketed managed table writes and
    reads back; bucket metadata registered in the catalog."""
    from training_flink_sql_cc_src_spark.queries._util import t
    from training_flink_sql_cc_src_spark.sources.sinks import write_bucketed

    nation = t(spark, sf_small, "nation")
    spark.sql("DROP TABLE IF EXISTS nation_bucketed")
    write_bucketed(nation, "nation_bucketed", ["n_nationkey"], 4)
    back = spark.table("nation_bucketed")
    assert back.count() == nation.count()
    ddl = spark.sql("DESCRIBE EXTENDED nation_bucketed").collect()
    txt = " ".join(str(r) for r in ddl)
    assert "Num Buckets" in txt and "4" in txt
    spark.sql("DROP TABLE nation_bucketed")


def test_kafka_writer_builds_without_broker(spark):
    from training_flink_sql_cc_src_spark.sources.kafka import kafka_writer

    df = spark.createDataFrame([(1, "a")], "id int, s string")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS id", "CAST(value AS STRING) AS s")
    )
    writer = kafka_writer(stream, "localhost:9092", "out-topic", "/tmp/ckpt-kafka-test")
    assert writer is not None  # options accepted; start() would need a broker


def test_bucketed_tables_join_without_exchange(spark, sf_small):
    """The SCALE.md §2 claim, proven: two tables bucketed on the join key
    (write_bucketed = the DISTRIBUTED INTO n BUCKETS analog) join with NO
    shuffle exchange — the co-located fact⋈fact pattern that makes the
    orderkey joins exchange-free on a real deployment."""
    from training_flink_sql_cc_src_spark.queries._util import t
    from training_flink_sql_cc_src_spark.sources.sinks import write_bucketed

    li = t(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = t(spark, sf_small, "orders").select("o_orderkey", "o_orderdate")
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], 4)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bkt_orders",
        ["l_orderkey"],
        4,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"), "l_orderkey"
        )
        assert j.count() == li.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located read
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
