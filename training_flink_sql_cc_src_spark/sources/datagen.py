"""Continuous synthetic generators — the DatagenSource analog
(SURVEY.md §2.2: ``"connector.class" = "DatagenSource"``,
terraform/lab-tables/main.tf:168, quickstarts ORDERS / clickstream / SHOES /
SHOE_CUSTOMERS / SHOE_ORDERS / SHOE_CLICKSTREAM at :174,
terraform/lab-time/main.tf:174, terraform/lab-aggregations/main.tf:237,269,
301, terraform/lab-joins/main.tf:370).

Spark analog: ``readStream.format("rate")`` plus deterministic column
synthesis from the monotonically increasing ``value`` — every field is a
pure function of the row index, so generated streams are reproducible and
batch/stream parity tests can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _pick(idx: Column, options: list[str]) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (idx % len(options) + 1).cast("int"))


def _orders(idx: Column) -> list[Column]:
    return [
        (F.lit(1704067200000) + idx * 1000).alias("ordertime"),
        idx.cast("int").alias("orderid"),
        F.concat(F.lit("Item_"), (idx % 100).cast("string")).alias("itemid"),
        ((idx % 10).cast("double") + 0.5).alias("orderunits"),
        F.struct(
            _pick(idx, ["City_1", "City_2", "City_3"]).alias("city"),
            _pick(idx, ["AL", "CA", "NY", "TX"]).alias("state"),
            (idx % 90000 + 10000).alias("zipcode"),
        ).alias("address"),
    ]


def _clickstream(idx: Column) -> list[Column]:
    return [
        F.concat(F.lit("10.0."), (idx % 256).cast("string"), F.lit(".1")).alias("ip"),
        (idx % 1000).cast("int").alias("userid"),
        F.concat(F.lit("/page/"), (idx % 50).cast("string")).alias("request"),
        _pick(idx, ["200", "302", "404", "500"]).alias("status"),
        (idx % 4096).cast("string").alias("bytes"),
        _pick(idx, ["Mozilla", "Chrome", "Safari"]).alias("agent"),
    ]


def _shoes(idx: Column) -> list[Column]:
    return [
        F.concat(F.lit("prod_"), (idx % 500).cast("string")).alias("id"),
        _pick(idx, ["Brand_A", "Brand_B", "Brand_C"]).alias("brand"),
        F.concat(F.lit("Model_"), (idx % 50).cast("string")).alias("name"),
        (idx % 200 + 20).cast("int").alias("sale_price"),
        ((idx % 50).cast("double") / 10.0).alias("rating"),
    ]


def _shoe_customers(idx: Column) -> list[Column]:
    return [
        F.concat(F.lit("cust_"), (idx % 1000).cast("string")).alias("id"),
        F.concat(F.lit("First_"), (idx % 97).cast("string")).alias("first_name"),
        F.concat(F.lit("Last_"), (idx % 89).cast("string")).alias("last_name"),
        F.concat(
            F.lit("user"), (idx % 1000).cast("string"), F.lit("@example.com")
        ).alias("email"),
    ]


def _shoe_orders(idx: Column) -> list[Column]:
    return [
        idx.cast("int").alias("order_id"),
        F.concat(F.lit("prod_"), (idx % 500).cast("string")).alias("product_id"),
        F.concat(F.lit("cust_"), (idx % 1000).cast("string")).alias("customer_id"),
        F.timestamp_seconds(F.lit(1704067200) + idx).alias("ts"),
    ]


def _shoe_clickstream(idx: Column) -> list[Column]:
    return [
        F.concat(F.lit("prod_"), (idx % 500).cast("string")).alias("product_id"),
        F.concat(F.lit("cust_"), (idx % 1000).cast("string")).alias("user_id"),
        (idx % 300).cast("int").alias("view_time"),
        F.concat(F.lit("/product/"), (idx % 500).cast("string")).alias("page_url"),
        F.timestamp_seconds(F.lit(1704067200) + idx).alias("ts"),
    ]


QUICKSTARTS = {
    "ORDERS": _orders,
    "CLICKSTREAM": _clickstream,
    "SHOES": _shoes,
    "SHOE_CUSTOMERS": _shoe_customers,
    "SHOE_ORDERS": _shoe_orders,
    "SHOE_CLICKSTREAM": _shoe_clickstream,
}


def datagen_stream(
    spark: SparkSession, quickstart: str, rows_per_second: int = 100
) -> DataFrame:
    """Streaming DataFrame mirroring a Datagen quickstart topic."""
    cols = QUICKSTARTS[quickstart.upper()]
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(*cols(F.col("value")))


def datagen_batch(spark: SparkSession, quickstart: str, n_rows: int) -> DataFrame:
    """Batch replay of the same generator (identical values for the same
    indices — used by batch/stream parity tests)."""
    cols = QUICKSTARTS[quickstart.upper()]
    return spark.range(n_rows).select(*cols(F.col("id")))
