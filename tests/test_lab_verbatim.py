"""The reference's ten Flink SQL statements executed VERBATIM.

Every statement string below is copied character-for-character from the
reference Terraform (citations inline) and executed through the engine's
SQL front door against datagen-quickstart tables — the same topics the
reference's connectors generate. This is the strongest form of the
migration claim: a lab user's statements run unchanged, including the
``sql.current-catalog``/``sql.current-database`` properties every
confluent_flink_statement carries (modeled by SET statements).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.plans.router import StatementRouter
from training_flink_sql_cc_src_spark.sources.datagen import datagen_batch

N = 300  # rows per generated topic


@pytest.fixture()
def lab(spark):
    """Datagen-quickstart tables under their lab names. The quickstart
    topics carry the record id as the Kafka key; S7/S8 retype that `key`
    column, so it is materialized here as the id bytes."""
    for view, quickstart, key_src in (
        ("shoe_customers", "SHOE_CUSTOMERS", "id"),
        ("shoe_products", "SHOES", "id"),
        ("shoe_orders", "SHOE_ORDERS", "order_id"),
        ("shoe_clickstream", "SHOE_CLICKSTREAM", "product_id"),
    ):
        df = datagen_batch(spark, quickstart, N).withColumn(
            "key", F.encode(F.col(key_src).cast("string"), "UTF-8")
        )
        df.createOrReplaceTempView(view)
    r = StatementRouter(spark)
    # each confluent_flink_statement carries these two properties
    # (terraform/lab-aggregations/main.tf:397-400)
    r.execute("SET 'sql.current-catalog' = 'shoe_env'")
    r.execute("SET 'sql.current-database' = 'shoe_cluster'")
    return r


def test_all_ten_statements_verbatim(lab, spark):
    r = lab
    # S1 — terraform/lab-aggregations/main.tf:396
    r.execute(
        "CREATE TABLE shoe_customers_keyed (customer_id STRING,first_name "
        "STRING,last_name STRING,email STRING,PRIMARY KEY (customer_id) "
        "NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;"
    )
    # S2 — terraform/lab-aggregations/main.tf:431
    r.execute(
        "INSERT INTO shoe_customers_keyed SELECT id,first_name,last_name,"
        "email FROM shoe_customers;"
    )
    # S3 — terraform/lab-aggregations/main.tf:463
    r.execute(
        "CREATE TABLE shoe_products_keyed(product_id STRING, brand STRING, "
        "`model` STRING, sale_price INT, rating DOUBLE, PRIMARY KEY "
        "(product_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;"
    )
    # S4 — terraform/lab-aggregations/main.tf:498
    r.execute(
        "INSERT INTO shoe_products_keyed SELECT id, brand, `name`, "
        "sale_price, rating FROM shoe_products;"
    )
    # S5 — terraform/lab-aggregations/main.tf:530
    r.execute(
        "CREATE TABLE shoe_orders_enriched(order_id INT, first_name STRING, "
        "last_name STRING, email STRING, brand STRING, `model` STRING, "
        "sale_price INT, rating DOUBLE) DISTRIBUTED INTO 1 BUCKETS WITH "
        "('changelog.mode' = 'retract');"
    )
    # S6 — terraform/lab-aggregations/main.tf:563
    r.execute(
        "INSERT INTO shoe_orders_enriched(order_id, first_name, last_name, "
        "email, brand, `model`, sale_price, rating) SELECT so.order_id, "
        "sc.first_name, sc.last_name, sc.email, sp.brand, sp.`model`, "
        "sp.sale_price, sp.rating FROM shoe_orders so INNER JOIN "
        "shoe_customers_keyed sc  ON so.customer_id = sc.customer_id "
        "INNER JOIN shoe_products_keyed sp ON so.product_id = "
        "sp.product_id;"
    )
    # S7 — terraform/lab-joins/main.tf:465
    r.execute("ALTER TABLE shoe_customers MODIFY (`key` STRING);")
    # S8 — terraform/lab-joins/main.tf:498
    r.execute("ALTER TABLE shoe_products MODIFY (`key` STRING);")
    # S9 — terraform/lab-joins/main.tf:531
    r.execute("ALTER TABLE shoe_orders MODIFY WATERMARK FOR `ts` AS `ts`;")
    # S10 — terraform/lab-joins/main.tf:564
    r.execute(
        "ALTER TABLE shoe_clickstream MODIFY WATERMARK FOR `ts` AS `ts`;"
    )

    # --- semantics of the resulting dynamic tables -----------------------
    # keyed upserts collapsed to latest-per-key (compacted-topic view)
    ck = spark.table("shoe_customers_keyed")
    n_cust = spark.table("shoe_customers").select("id").distinct().count()
    assert ck.count() == n_cust
    pk = spark.table("shoe_products_keyed")
    n_prod = spark.table("shoe_products").select("id").distinct().count()
    assert pk.count() == n_prod
    # S6: cyclic quickstart ids make every order match both dims
    enriched = spark.table("shoe_orders_enriched")
    assert enriched.count() == N
    assert enriched.columns == [
        "order_id", "first_name", "last_name", "email", "brand", "model",
        "sale_price", "rating",
    ]
    # catalog recorded the Flink-side semantics
    assert r.catalog.get(r._resolve("shoe_customers_keyed")).is_keyed
    assert (
        r.catalog.get(r._resolve("shoe_orders_enriched")).changelog_mode
        == "retract"
    )
    # S7/S8 retyped the key column on the SOURCE tables
    assert dict(spark.table("shoe_customers").dtypes)["key"] == "string"
    assert dict(spark.table("shoe_products").dtypes)["key"] == "string"
    # S9/S10 registered event-time watermarks
    for tbl in ("shoe_orders", "shoe_clickstream"):
        meta = r.catalog.get(r._resolve(tbl))
        assert meta.watermark_col == "ts"
        assert meta.watermark_delay == "0 seconds"
