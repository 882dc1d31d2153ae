"""Core relational operators [B] (SURVEY.md §2.3): filters, set ops,
ORDER BY/LIMIT, Top-N, values."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status,
           o_totalprice AS totalprice, o_orderpriority AS priority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P'))
      AND o_totalprice BETWEEN 50000 AND 300000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey IS NULL)
      AND (o_orderkey % 2 = 0 OR o_totalprice > 150000)
    """,
    doc="WHERE surface: IN/BETWEEN/LIKE/IS NULL/AND/OR/NOT (lab-tables "
    "SELECT basics, README.md:7). All predicates pushable to parquet.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 300000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~F.col("o_custkey").isNull()
        & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 150000))
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderpriority").alias("priority"),
    )


@register(
    "union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind
    FROM supplier
    """,
    doc="UNION ALL (course-scope set ops).",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.lit("customer").alias("kind"),
        )
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct) — union + hash dedup shuffle.",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (course-scope set ops).",
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (course-scope set ops).",
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "order_by_limit",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc="ORDER BY + LIMIT with a unique tiebreaker so the limit set is "
    "deterministic. Spark executes as TakeOrderedAndProject — no global "
    "sort materialization at scale.",
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("order_id").asc())
        .limit(100)
    )


@register(
    "order_nulls_first_last",
    oracle="""
    SELECT seg, custkey, rnk_nl FROM (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               c_custkey AS custkey,
               ROW_NUMBER() OVER (
                   ORDER BY NULLIF(c_mktsegment, 'BUILDING') DESC NULLS LAST,
                            c_custkey ASC
               ) AS rnk_nl
        FROM customer
    ) ORDER BY seg ASC NULLS FIRST, custkey ASC
    LIMIT 600
    """,
    doc="Explicit NULLS FIRST/LAST ordering (Flink follows the SQL "
    "standard's explicit placement; engines DISAGREE on defaults — Spark "
    "ASC puts nulls first, DuckDB last — so every cross-engine ORDER BY "
    "with nullable keys must spell placement). The LIMIT makes the "
    "asc_nulls_first order decide WHICH rows survive, and rnk_nl encodes "
    "the desc_nulls_last order in values, so the driver's hash verifies "
    "both placements. Global ORDER BY + LIMIT plans as "
    "TakeOrderedAndProject (no full sort at scale); the global "
    "ROW_NUMBER is the semantics-coverage part, not a scale pattern.",
)
def order_nulls_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.col("c_custkey").alias("custkey"),
    )
    w = Window.orderBy(F.col("seg").desc_nulls_last(), F.col("custkey").asc())
    return (
        c.withColumn("rnk_nl", F.row_number().over(w))
        .orderBy(F.col("seg").asc_nulls_first(), F.col("custkey").asc())
        .limit(600)
    )


@register(
    "topn_per_group",
    oracle="""
    SELECT mktsegment, customer_id, acctbal, rn
    FROM (
        SELECT c_mktsegment AS mktsegment, c_custkey AS customer_id,
               c_acctbal AS acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
    doc="Top-N per group — the flagship Confluent Flink pattern "
    "(ROW_NUMBER() ... WHERE rn <= k, SURVEY.md §2.3). One shuffle on the "
    "group key; rank pushdown keeps per-group state at k rows in "
    "streaming.",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_custkey").alias("customer_id"),
            F.col("c_acctbal").alias("acctbal"),
            "rn",
        )
    )


@register(
    "values_constant_relation",
    oracle="""
    SELECT CAST(id AS INTEGER) AS id, color, CAST(weight AS DOUBLE) AS weight
    FROM (VALUES (1, 'red', 10.5), (2, 'green', 20.25), (3, 'blue', 30.125))
         AS v(id, color, weight)
    """,
    doc="VALUES / constant relation (course-scope basics).",
)
def values_constant_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(1, "red", 10.5), (2, "green", 20.25), (3, "blue", 30.125)],
        schema="id int, color string, weight double",
    )


@register(
    "topn_with_ties",
    oracle="""
    SELECT priority, order_id, totalprice, rnk FROM (
        SELECT o_orderpriority AS priority, o_orderkey AS order_id,
               CAST(FLOOR(o_totalprice / 10000) * 10000 AS BIGINT)
                   AS totalprice,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY FLOOR(o_totalprice / 10000) * 10000
                                DESC) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    doc="RANK-based Top-N WITH TIES (the second Flink Top-N flavor beside "
    "row_number: ties at the cut all survive, so group sizes vary). Price "
    "is FLOOR-bucketed to 10k so real ties exist in the fixture (floor is "
    "rounding-mode-free — ROUND on doubles is excluded from oracle pairs "
    "by the repo determinism rules). Same WindowGroupLimit rank pushdown "
    "as row_number Top-N — per-group state stays k rows plus ties.",
)
def topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucketed = F.floor(F.col("o_totalprice") / 10000) * 10000
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("order_id"),
        bucketed.alias("totalprice"),
    )
    w = Window.partitionBy("priority").orderBy(F.col("totalprice").desc())
    return o.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 3)


@register(
    "dedup_first_event_per_user",
    oracle="""
    SELECT user_id, event_id AS first_event, ts AS first_ts FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Deduplication keeping the FIRST row per key (the other half of "
    "the Flink dedup pattern beside latest-per-key; course-scope "
    "'earliest event per user'). Same single shuffle on the key; "
    "event_id tiebreak pins determinism for equal timestamps.",
)
def dedup_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    # operators.dedup.first_per_key orders by one column; equal-ts ties
    # need the event_id tiebreak, so compose the window directly
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event"),
            F.col("ts").alias("first_ts"),
        )
    )
