"""Join taxonomy [B] (SURVEY.md §2.3, lab-joins README.md:10).

The reference's lab-joins teaches the full Flink join set over the shoe
tables; watermark DDL S9/S10 (terraform/lab-joins/main.tf:531,564) exists
precisely to enable the interval and temporal joins. Fixture mapping
(FIXTURES.md §3): facts = orders/lineitem/events, dims = customer/part.

Scale notes: dim sides are explicitly broadcast (no fact shuffle); the
interval join pre-buckets both sides on a coarse time bucket so the range
predicate becomes an equi-join on (user, bucket) plus a residual filter —
no cross join at any scale. The as-of join is the union-tag merge pattern:
one shuffle per side on the key, no per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS customer_id, c.c_name AS name,
           o.o_orderkey AS order_id, o.o_totalprice AS totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
    doc="LEFT OUTER JOIN with a join-side predicate (lab-joins outer-join "
    "exercise). Predicate lives in the ON clause so unmatched customers "
    "survive — semantics Flink and Spark share.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
    ).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("totalprice"),
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey AS order_id, o.o_totalprice AS totalprice,
           c.c_custkey AS customer_id, c.c_name AS name
    FROM orders o
    RIGHT JOIN customer c
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
    """,
    doc="RIGHT OUTER JOIN (SURVEY.md §2.3 left/right/full row): the "
    "mirror of join_left_outer — every customer survives, order columns "
    "NULL when no qualifying order. Catalyst plans it as the same hash "
    "join with build/stream sides flipped, so the scale story is "
    "identical to the left-outer case.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.join(
        c, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000), "right"
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT cn.nationkey AS nationkey, cn.n_cust AS n_cust, sn.n_supp AS n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) sn
      ON cn.nationkey = sn.nationkey
    """,
    doc="FULL OUTER JOIN of two aggregates (coalesced key emitted from the "
    "left side per ANSI name resolution).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, "nationkey", "full").select(
        cn["nationkey"].alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
    """,
    doc="Semi join (EXISTS subquery → left_semi). Spark plans a "
    "LeftSemi hash join — no row duplication, no payload from the right.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(
        big, c.c_custkey == big.o_custkey, "left_semi"
    ).select(F.col("c_custkey").alias("customer_id"), F.col("c_name").alias("name"))


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey AS customer_id, c_mktsegment AS segment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti join (NOT EXISTS → left_anti): customers with no orders.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "join_theta_band",
    oracle="""
    SELECT p.p_partkey AS partkey, p.p_retailprice AS retailprice,
           b.band_name AS band_name
    FROM part p
    INNER JOIN (VALUES ('budget',   0.0,  950.0),
                       ('mid',    950.0, 1450.0),
                       ('premium',1450.0, 1e9)) AS b(band_name, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
    doc="Theta (non-equi) join: fact banded against a tiny ranges relation. "
    "Spark executes BroadcastNestedLoopJoin — correct because the ranges "
    "side is constant-sized; at 100 TB the fact side still streams "
    "map-side only.",
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    bands = spark.createDataFrame(
        [("budget", 0.0, 950.0), ("mid", 950.0, 1450.0), ("premium", 1450.0, 1e9)],
        schema="band_name string, lo double, hi double",
    )
    return p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    ).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_retailprice").alias("retailprice"),
        "band_name",
    )


@register(
    "join_interval",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           CAST(FLOOR(EPOCH(p.ts)) AS BIGINT) AS purchase_epoch,
           CAST(FLOOR(EPOCH(c.ts)) AS BIGINT) AS click_epoch
    FROM events p
    INNER JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    """,
    doc="Interval join (Flink time-bounded stream-stream join — the "
    "lab-joins exercise S9/S10's watermarks enable): clicks within 30 min "
    "before each purchase by the same user. Spark: equi join on user_id "
    "with the time-range as residual predicate — a hash join, never a "
    "cross join; in streaming the same condition is the native "
    "stream-stream interval join with watermarks on both sides.",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.c_ts <= p.p_ts),
        "inner",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.col("p_ts").cast("long").alias("purchase_epoch"),
        F.col("c_ts").cast("long").alias("click_epoch"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Temporal/as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` for the same key (Flink ``FOR SYSTEM_TIME AS OF``
    — SURVEY.md §2.3; the lab-joins temporal-join exercise over the PK'd
    dims S1/S3).

    Spark has no native ASOF JOIN, so this is the union-tag merge pattern:
    tag right rows 0 and left rows 1, sort each key partition by
    (ts, tag), and carry the last non-null right payload forward with
    ``last(ignorenulls)``. Exactly one shuffle per side (hash on the key),
    state per key is one row — the same cost profile as Flink's temporal
    join, and it scales linearly: no per-row subquery, no range explosion.
    """
    lcols = left.columns
    l_tag = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    for p in right_payload:
        l_tag = l_tag.withColumn(p, F.lit(None).cast(dict(right.dtypes)[p]))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        *[F.col(p) for p in right_payload],
    ).withColumn("__tag", F.lit(0))
    for c in lcols:
        if c not in {key}:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.select(key, "__ts", "__tag", *right_payload, *[c for c in lcols if c != key]).unionByName(
        r_tag.select(key, "__ts", "__tag", *right_payload, *[c for c in lcols if c != key])
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key,
        "__ts",
        "__tag",
        *[F.last(F.when(F.col("__tag") == 0, F.col(p)), ignorenulls=True).over(w).alias(p) for p in right_payload],
        *[F.col(c) for c in lcols if c != key],
    )
    return carried.filter(F.col("__tag") == 1).drop("__tag", "__ts")


@register(
    "join_temporal_sql",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           CAST(FLOOR(EPOCH(p.ts)) AS BIGINT) AS purchase_epoch,
           (SELECT CAST(FLOOR(EPOCH(MAX(c.ts))) AS BIGINT) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_epoch
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="FOR SYSTEM_TIME AS OF through the SQL front door: the router "
    "rewrites the Flink temporal-join syntax into a validity-interval "
    "join (LEAD(version_ts) per PK bounds each version's lifetime) using "
    "the catalog's PRIMARY KEY + WATERMARK — Flink's versioned-table "
    "contract verbatim. Same answer as join_asof_temporal (one equi join "
    "+ range refine; linear at scale), same oracle. The SAME statement "
    "also runs CONTINUOUSLY through Engine.sql_stream: probe side "
    "streamed, dim as the version-history snapshot (maintained by "
    "streaming/temporal.py's append sink when the dim itself streams) — "
    "per-microbatch stream-static join, batch==stream parity-tested.",
)
def join_temporal_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    ev = t(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    ).createOrReplaceTempView("__tj_purchases")
    ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    ).createOrReplaceTempView("__tj_clicks_versioned")
    r = StatementRouter(spark)
    meta = r.catalog.get_or_create("__tj_clicks_versioned")
    meta.primary_key = ["user_id"]  # S1-style PK'd dim
    r.execute(
        "ALTER TABLE __tj_clicks_versioned MODIFY WATERMARK FOR `ts` AS `ts`"
    )
    return r.execute(
        "SELECT p.event_id AS purchase_id, p.user_id AS user_id, "
        "CAST(p.ts AS LONG) AS purchase_epoch, "
        "CAST(c.ts AS LONG) AS last_click_epoch "
        "FROM __tj_purchases p "
        "LEFT JOIN __tj_clicks_versioned FOR SYSTEM_TIME AS OF p.ts AS c "
        "ON p.user_id = c.user_id"
    )


@register(
    "join_asof_temporal",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           CAST(FLOOR(EPOCH(p.ts)) AS BIGINT) AS purchase_epoch,
           (SELECT CAST(FLOOR(EPOCH(MAX(c.ts))) AS BIGINT) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_epoch
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="Temporal/as-of join (FOR SYSTEM_TIME AS OF): each purchase joined "
    "to the user's most recent click at-or-before it. Union-tag merge "
    "implementation (see asof_join) — one shuffle per side, no subqueries. "
    "Oracle uses a correlated MAX subquery (fine at sf0.01; ours is the "
    "scalable plan).",
)
def join_asof_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("ts").cast("long").alias("click_epoch")
    )
    out = asof_join(
        p, c, key="user_id", left_ts="ts", right_ts="ts", right_payload=["click_epoch"]
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("ts").cast("long").alias("purchase_epoch"),
        F.col("click_epoch").alias("last_click_epoch"),
    )


@register(
    "join_range_bucketed",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_errors
    FROM events p
    INNER JOIN events e
      ON e.event_type = 'error'
     AND e.ts >= p.ts - INTERVAL 10 MINUTE
     AND e.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="PURE range join (no equi key): errors anywhere in the system "
    "within 10 minutes before each purchase — the shape that would plan "
    "as a nested loop. operators/range_join.range_bucket_join derives an "
    "equi bucket key (width = range span, right row in one bucket, left "
    "exploded to ≤2) so it executes as a hash shuffle join + exact "
    "refine. Result-identical to the nested loop; candidates drop from "
    "|L|x|R| to pairs within ~2 bucket widths.",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import range_bucket_join

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    joined = range_bucket_join(p, e, "p_ts", "e_ts", lower_s=-600, upper_s=0)
    return joined.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_errors"))


@register(
    "join_asof_forward",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, NULL AS purchase_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS click_epoch, 1 AS is_dim
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, NULL, 0
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT user_id, ts, purchase_id, is_dim,
               LAST_VALUE(click_epoch IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, is_dim DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS next_click_epoch
        FROM u
    )
    SELECT purchase_id, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS purchase_epoch,
           next_click_epoch
    FROM w WHERE is_dim = 0
    """,
    doc="FORWARD as-of join — for each probe row the FIRST dim version "
    "AT-OR-AFTER its timestamp (next-event attribution: 'which click "
    "FOLLOWED this purchase'), the direction the backward as-of / "
    "FOR SYSTEM_TIME AS OF cannot express: same union-tag + ONE keyed "
    "window plan as the backward operator but scanned in DESCENDING "
    "time order with a running LAST_VALUE IGNORE NULLS; the tie-break "
    "(is_dim DESC under ts DESC) makes a version at exactly t visible "
    "to a probe at t (inclusive >=, mirroring the backward join's "
    "<=). One shuffle on the key, no per-row subquery — the identical "
    "100 TB shape as asof_join.",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("ts").cast("long").alias("click_epoch"),
        F.lit(1).alias("is_dim"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_epoch"),
        F.lit(0).alias("is_dim"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        c.unionByName(p)
        .withColumn(
            "next_click_epoch",
            F.last("click_epoch", ignorenulls=True).over(w),
        )
        .filter(F.col("is_dim") == 0)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").cast("long").alias("purchase_epoch"),
            "next_click_epoch",
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS purchase_epoch, ts
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT p.purchase_id, p.user_id, p.purchase_epoch,
               (SELECT CAST(FLOOR(EPOCH(MAX(c.ts))) AS BIGINT)
                FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts <= p.ts) AS back_epoch,
               (SELECT CAST(FLOOR(EPOCH(MIN(c.ts))) AS BIGINT)
                FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts > p.ts) AS fwd_epoch
        FROM p
    )
    SELECT purchase_id, user_id, purchase_epoch,
           CASE
             WHEN back_epoch IS NOT NULL AND (fwd_epoch IS NULL OR
                  purchase_epoch - back_epoch <= fwd_epoch - purchase_epoch)
               THEN back_epoch
             ELSE fwd_epoch
           END AS nearest_click_epoch,
           CASE
             WHEN back_epoch IS NOT NULL AND (fwd_epoch IS NULL OR
                  purchase_epoch - back_epoch <= fwd_epoch - purchase_epoch)
               THEN 'backward'
             WHEN fwd_epoch IS NOT NULL THEN 'forward'
             ELSE NULL
           END AS direction
    FROM j
    """,
    doc="NEAREST-direction as-of join (pandas merge_asof "
    "direction='nearest'; kdb wj's两-sided window analog): each "
    "purchase pairs with the click minimizing |click.ts - purchase.ts| "
    "in either direction, ties to the BACKWARD side (the conventional "
    "merge_asof tie rule, documented). One union-tag pass computes "
    "BOTH carries — last click at-or-before (ascending window) and "
    "first click after (descending window) — over a single hash "
    "exchange on the key (same partitioning, two sorts), then an "
    "integer argmin picks the side. No range explosion, no per-row "
    "subquery; linear at any scale like the backward/forward "
    "variants.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("ts").cast("long").alias("click_epoch"),
        F.lit(1).alias("is_dim"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_epoch"),
        F.lit(0).alias("is_dim"),
    )
    # backward: clicks sort BEFORE a same-ts purchase (is_dim desc on an
    # ascending scan) so ties land on the backward side, matching the
    # oracle's c.ts <= p.ts / c.ts > p.ts split
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_dim").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = (
        c.unionByName(p)
        .withColumn(
            "back_epoch", F.last("click_epoch", ignorenulls=True).over(wb)
        )
        .withColumn(
            "fwd_epoch", F.last("click_epoch", ignorenulls=True).over(wf)
        )
        .filter(F.col("is_dim") == 0)
    )
    pe = F.col("ts").cast("long")
    back_wins = F.col("back_epoch").isNotNull() & (
        F.col("fwd_epoch").isNull()
        | (pe - F.col("back_epoch") <= F.col("fwd_epoch") - pe)
    )
    return u.select(
        "purchase_id",
        "user_id",
        pe.alias("purchase_epoch"),
        F.when(back_wins, F.col("back_epoch"))
        .otherwise(F.col("fwd_epoch"))
        .alias("nearest_click_epoch"),
        F.when(back_wins, F.lit("backward"))
        .when(F.col("fwd_epoch").isNotNull(), F.lit("forward"))
        .alias("direction"),
    )
