"""Window (analytic) functions [B] (SURVEY.md §2.5): ranking, offset
(LAG/LEAD), FIRST/LAST_VALUE, explicit ROWS/RANGE frames.

Determinism: every ORDER BY carries a unique tiebreaker (orderkey /
event_id) so ROW_NUMBER and frame contents are identical across engines;
frames are spelled explicitly because Spark and DuckDB default LAST_VALUE
frames differently.

Scale notes: one hash shuffle on the partition key per query; frames are
bounded (ROWS BETWEEN k PRECEDING) so per-key state is O(k), not O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "analytic_ranking",
    oracle="""
    SELECT o_orderpriority AS priority, o_orderkey AS order_id,
           o_totalprice AS totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_orderstatus) AS rk,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_orderstatus) AS drk
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="ROW_NUMBER / RANK / DENSE_RANK over one partition spec (Flink "
    "Top-N & dedup building blocks, SURVEY.md §2.5). RANK/DENSE_RANK "
    "rank on a low-cardinality column so tied ranks are exercised.",
)
def analytic_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    by_price = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    by_status = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("totalprice"),
        F.row_number().over(by_price).alias("rn"),
        F.rank().over(by_status).alias("rk"),
        F.dense_rank().over(by_status).alias("drk"),
    )


@register(
    "analytic_offset",
    oracle="""
    SELECT user_id, event_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_s,
           LAG(event_id)  OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_event,
           LEAD(event_id) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_event,
           LAG(event_id, 2, CAST(-1 AS BIGINT)) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev2_event
    FROM events
    """,
    doc="LAG/LEAD with offset and default (Flink offset functions, "
    "SURVEY.md §2.5): per-user event sequence navigation.",
)
def analytic_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("epoch_s"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.lag("event_id", 2, -1).over(w).alias("prev2_event"),
    )


@register(
    "analytic_first_last_frames",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS first_type,
           LAST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS final_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum_4
    FROM events
    """,
    doc="FIRST_VALUE / LAST_VALUE with explicit ROWS frames + a bounded "
    "moving sum (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW). Frames "
    "spelled out because engines default differently; bounded frame keeps "
    "window state O(4) per key in streaming.",
)
def analytic_first_last_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_first = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_last = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_move = base.rowsBetween(-3, Window.currentRow)
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.first("event_type").over(w_first).alias("first_type"),
        F.last("event_type").over(w_last).alias("final_type"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w_move)
        .cast("double")
        .alias("moving_sum_4"),
    )


@register(
    "analytic_distribution",
    oracle="""
    SELECT o_orderkey AS order_id,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTH_VALUE(o_orderkey, 2) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_best
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Distribution window functions: NTILE / PERCENT_RANK / CUME_DIST / "
    "NTH_VALUE (Flink 1.19 analytic set, SURVEY.md §2.5). PERCENT_RANK "
    "and CUME_DIST are rank/count ratios — single-division doubles, "
    "hash-exact across engines.",
)
def analytic_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_nth = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("o_orderkey", 2).over(w_nth).alias("second_best"),
        )
    )


@register(
    "analytic_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(big_v IGNORE NULLS) OVER w AS last_big,
           FIRST_VALUE(big_v IGNORE NULLS) OVER w AS first_big,
           LAG(big_v, 1) OVER w AS prev_raw,
           NTH_VALUE(big_v, 2 IGNORE NULLS) OVER w AS second_big
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN value > 50 THEN value END AS big_v
        FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="IGNORE NULLS navigation (SQL:2011; Flink supports it on "
    "FIRST_VALUE/LAST_VALUE/NTH_VALUE): the running 'latest non-NULL "
    "observation' idiom — LAST_VALUE skips NULL gaps (the "
    "fill-forward pattern), FIRST_VALUE/NTH_VALUE pin the first/"
    "second qualifying row, while a plain LAG shows the RESPECT NULLS "
    "default for contrast. One window exchange on user_id; the "
    "ROWS running frame is a sequential per-key pass, identical in "
    "both engines.",
)
def analytic_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    big = F.when(F.col("value") > 50, F.col("value"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.last(big, ignorenulls=True).over(w).alias("last_big"),
        F.first(big, ignorenulls=True).over(w).alias("first_big"),
        F.lag(big, 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_raw"),
        F.nth_value(big, 2, ignoreNulls=True).over(w).alias("second_big"),
    )
