"""The ten attested reference statements [A], re-expressed on the fixture
tables (SURVEY.md §2.1; mapping FIXTURES.md §3).

S1/S3/S5 are DDL — exercised by the statement router tests
(tests/test_router.py), not here. S2/S4/S6/S7/S8 are DML with a batch
reading, oracle-matched below. S9/S10 (watermark DDL) are exercised by the
streaming parity layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "s2_customers_keyed_projection",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name    AS first_name,
           c_mktsegment AS segment,
           c_acctbal AS acctbal
    FROM customer
    """,
    doc="S2: INSERT INTO shoe_customers_keyed SELECT id, first_name, ... "
    "(terraform/lab-aggregations/main.tf:431) — projection + rename into a "
    "PK-keyed table. Narrow projection prunes the parquet scan.",
)
def s2_customers_keyed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("first_name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )


@register(
    "s4_products_keyed_projection",
    oracle="""
    SELECT p_partkey AS product_id,
           p_brand   AS brand,
           p_name    AS model,
           p_retailprice AS sale_price,
           CAST(p_size AS DOUBLE) AS rating
    FROM part
    """,
    doc="S4: INSERT INTO shoe_products_keyed SELECT id, brand, `name`, "
    "sale_price, rating FROM shoe_products "
    "(terraform/lab-aggregations/main.tf:498) — rename name→model incl. "
    "quoted-identifier handling.",
)
def s4_products_keyed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("model"),
        F.col("p_retailprice").alias("sale_price"),
        F.col("p_size").cast("double").alias("rating"),
    )


@register(
    "s6_orders_enriched_join",
    oracle="""
    SELECT l.l_orderkey AS order_id,
           l.l_linenumber AS line_number,
           c.c_name   AS customer_name,
           c.c_mktsegment AS segment,
           p.p_brand  AS brand,
           p.p_name   AS model,
           p.p_retailprice AS sale_price,
           l.l_quantity AS quantity
    FROM lineitem l
    INNER JOIN orders   o ON l.l_orderkey = o.o_orderkey
    INNER JOIN customer c ON o.o_custkey  = c.c_custkey
    INNER JOIN part     p ON l.l_partkey  = p.p_partkey
    """,
    doc="S6: the lab's flagship multi-way equi inner join — fact stream "
    "joined to keyed dims (terraform/lab-aggregations/main.tf:563). "
    "Dims (customer, part) are broadcast: at 100 TB the fact side never "
    "shuffles for these joins.",
)
def s6_orders_enriched_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name", "p_retailprice"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .join(part, li.l_partkey == part.p_partkey, "inner")
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_number"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("p_brand").alias("brand"),
            F.col("p_name").alias("model"),
            F.col("p_retailprice").alias("sale_price"),
            F.col("l_quantity").alias("quantity"),
        )
    )


@register(
    "s7_schema_evolution_cast",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice_dec,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderstatus AS status
    FROM orders
    """,
    doc="S7/S8: ALTER TABLE ... MODIFY (`key` STRING) "
    "(terraform/lab-joins/main.tf:465,498) — schema evolution as cast at "
    "the source-view level.",
)
def s7_schema_evolution_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("totalprice_dec"),
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "s1_upsert_latest_per_key",
    oracle="""
    WITH versioned AS (
        SELECT c_custkey, c_name, c_acctbal, 1 AS version FROM customer
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 100.0, 2 AS version
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 200.0, 3 AS version
        FROM customer WHERE c_custkey % 9 = 0
    )
    SELECT c_custkey AS customer_id, c_name AS name, c_acctbal AS acctbal
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                     ORDER BY version DESC) AS rn
        FROM versioned
    ) WHERE rn = 1
    """,
    doc="S1/S3 keyed-table semantics: PRIMARY KEY ... NOT ENFORCED over a "
    "compacted topic = latest-record-per-key view "
    "(terraform/lab-aggregations/main.tf:396; cleanup.policy=compact, "
    "terraform/lab-joins/main.tf:105-107). Batch materialization: "
    "row_number over (partition by pk order by version desc) = 1 — a "
    "single shuffle on the PK, which is exactly the partitioning the "
    "downstream keyed join wants.",
)
def s1_upsert_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import latest_per_key

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    versioned = (
        c.withColumn("version", F.lit(1))
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
            .withColumn("version", F.lit(2))
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 9 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 200.0)
            .withColumn("version", F.lit(3))
        )
    )
    return latest_per_key(versioned, keys=["c_custkey"], order_col="version").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )


@register(
    "s1_router_upsert_aggregate",
    oracle="""
    WITH latest AS (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 500.0
                    ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT c_mktsegment AS segment, COUNT(*) AS n,
           CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM latest
    GROUP BY c_mktsegment
    """,
    doc="Dynamic-table materialization END-TO-END through the SQL front "
    "door: CREATE keyed table + two INSERTs (the second upserts a subset "
    "with changed balances) through StatementRouter — the S1/S2 "
    "compacted-topic lifecycle — then a downstream aggregate over the "
    "published latest-per-key view. The oracle computes the final state "
    "directly (second write wins per PK), so the driver hash verifies "
    "the router's upsert collapse, not just a hand-built window. The "
    "upsert is one hash shuffle on the PK; the bucketed publish "
    "(DISTRIBUTED INTO 4 BUCKETS) pre-partitions exactly how a keyed "
    "downstream join would want it.",
)
def s1_router_upsert_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "customer").createOrReplaceTempView("__ru_customer")
    r = StatementRouter(spark)
    r.execute(
        "CREATE TABLE __ru_bal (custkey BIGINT, segment STRING, bal DOUBLE, "
        "PRIMARY KEY (custkey) NOT ENFORCED) DISTRIBUTED INTO 4 BUCKETS"
    )
    r.execute(
        "INSERT INTO __ru_bal SELECT c_custkey, c_mktsegment, c_acctbal "
        "FROM __ru_customer"
    )
    r.execute(
        "INSERT INTO __ru_bal SELECT c_custkey, c_mktsegment, "
        "c_acctbal + 500.0 FROM __ru_customer WHERE c_custkey % 4 = 0"
    )
    return r.execute(
        "SELECT segment, COUNT(*) AS n, "
        "CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal "
        "FROM __ru_bal GROUP BY segment"
    )
