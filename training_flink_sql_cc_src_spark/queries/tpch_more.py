"""Remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21),
adapted to the fixture schema (no partsupp table, no l_commitdate /
l_receiptdate / c_phone / o_comment columns — each adaptation keeps the
query's defining operator shape and is noted per query).

Together with composite.py (Q1-analog/Q3/Q4/Q5/Q7/Q10/Q12/Q14/Q18/Q19/Q22)
this completes the classic composite-workload suite the lab's enrichment DAG
(reference S6, terraform/lab-aggregations/main.tf:563) grows into: correlated
scalar subqueries, group-wise maxima, outer-join histograms, double-correlated
EXISTS — every shape re-expressed as broadcast-dim joins + shuffle aggregates
that survive a 1000-executor scale-up.

Double sums route through DECIMAL(38,6) (``dsum``/``DSUM_SQL``) so values
hash-match the DuckDB oracle regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import DAVG_SQL, DSUM_SQL, davg, dsum, t

_VOL = "l.l_extendedprice * (1 - l.l_discount)"


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey AS partkey, p.p_name AS pname,
           s.s_name AS sname, s.s_acctbal AS acctbal
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size BETWEEN 10 AND 20
      AND s.s_acctbal = (SELECT MAX(s2.s_acctbal)
                         FROM supplier s2
                         JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                         WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="TPC-H Q2 shape (best supplier per part; no partsupp fixture, so "
    "'suppliers that shipped the part' stands in for partsupp and MAX "
    "acctbal for MIN supplycost): correlated group-wise-max subquery → "
    "distinct (part,supplier) pairs, per-part max, equality join-back. "
    "MAX over stored doubles is order-insensitive, so hash-safe.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    s = t(spark, sf_dir, "supplier")
    pairs = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    best = pairs.join(s, pairs.l_suppkey == s.s_suppkey).groupBy(
        "l_partkey"
    ).agg(F.max("s_acctbal").alias("best_bal"))
    return (
        pairs.join(s, pairs.l_suppkey == s.s_suppkey)
        .join(best, "l_partkey")
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("pname"),
            F.col("s_name").alias("sname"),
            F.col("s_acctbal").alias("acctbal"),
        )
        .distinct()
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {DSUM_SQL.format(x='l.l_extendedprice * l.l_discount')} AS revenue
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_discount BETWEEN 0.05 AND 0.07
      AND l.l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate "
    "— all three predicates push to the parquet scan, partial aggregation "
    "reduces each partition to one row, no shuffle beyond the final "
    "single-row exchange. The canonical 'is pushdown working' probe.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {DSUM_SQL.format(
               x="CASE WHEN n2.n_name = 'NATION_3' THEN "
                 + _VOL + " ELSE 0 END")}
           / {DSUM_SQL.format(x=_VOL)} AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
    """,
    doc="TPC-H Q8 shape (national market share): 7-dimension snowflake "
    "join — every dim broadcasts, only lineitem⋈orders shuffles — with a "
    "conditional-sum ratio per year. Ratio of two decimal-exact sums is "
    "deterministic cross-engine.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / dsum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {DSUM_SQL.format(
               x="l.l_extendedprice * (1 - l.l_discount) "
                 "- p.p_retailprice * 0.1 * l.l_quantity")} AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    """,
    doc="TPC-H Q9 shape (product-type profit; fixture has no partsupp, so "
    "p_retailprice*0.1 stands in for ps_supplycost): LIKE-filtered part "
    "dim broadcast into the fact, profit expression summed per supplier "
    "nation and order year.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    SELECT l.l_partkey AS partkey,
           {DSUM_SQL.format(x='l.l_extendedprice * l.l_quantity')} AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_partkey
    HAVING {DSUM_SQL.format(x='l.l_extendedprice * l.l_quantity')} >
           (SELECT {DSUM_SQL.format(x='l2.l_extendedprice * l2.l_quantity')}
                   * 0.002
            FROM lineitem l2
            JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
            JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
            WHERE n2.n_name = 'NATION_3')
    """,
    doc="TPC-H Q11 shape (important stock; shipped value per part stands "
    "in for partsupp stock value): grouped sum filtered by a scalar "
    "subquery over the same relation — the global total is a one-row "
    "broadcast, so the fact scans twice but shuffles once per aggregate.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    base = li.join(s, li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    )
    per_part = base.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(val).alias("value")
    )
    total = base.agg((dsum(val) * 0.002).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("partkey", "value")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer order-count distribution; priority filter "
    "stands in for the o_comment NOT LIKE filter): left outer join with a "
    "predicate INSIDE the join condition (customers with zero matching "
    "orders still appear with count 0), then a histogram over the counts "
    "— two chained aggregations, the second one tiny.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           r.total_revenue AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarter-scoped revenue view reused "
    "twice — once grouped, once for its MAX — with an equality filter. "
    "Revenues are decimal-exact sums, so the double equality is safe "
    "cross-engine; the view is computed once and self-joined.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%1%')
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier counts per part class; lineitem stands "
    "in for partsupp, s_name LIKE for the complaints filter): NOT IN "
    "anti-join against a broadcast exclusion list, then COUNT(DISTINCT) "
    "per three-column group — the distinct expands the shuffle key, the "
    "exclusion list never shuffles.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = t(spark, sf_dir, "lineitem")
    excluded = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%1%"))
        .select("s_suppkey")
    )
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {DSUM_SQL.format(x='l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (SELECT 0.2 * ({DAVG_SQL.format(x='l2.l_quantity')})
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): correlated per-part "
    "average → de-correlated into a grouped aggregate joined back on "
    "partkey. The brand filter cuts parts first, and because the "
    "correlation key is the join key, the per-part averages computed from "
    "the joined rows equal the averages over all lineitems of those parts "
    "— one scan instead of two. AVG is decimal-exact (davg).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    thresholds = j.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        j.join(thresholds, j.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name AS name, s.s_acctbal AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%widget%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 300)
      AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_name IN ('NATION_1', 'NATION_2',
                                             'NATION_3', 'NATION_4'))
    """,
    doc="TPC-H Q20 shape (suppliers with excess volume; shipped-quantity "
    "HAVING stands in for the partsupp availqty comparison): nested "
    "IN-subqueries → two left-semi joins, one against a grouped HAVING "
    "over the year's widget shipments, one against a broadcast nation "
    "list. Quantities are whole-number doubles, so SUM>300 is exact.",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nations = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .select("n_nationkey")
    )
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nations), s.s_nationkey == nations.n_nationkey, "left_semi")
        .select(F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name AS name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (the sole-blame supplier; l_returnflag='R' stands "
    "in for the late-delivery receipt/commit comparison): the "
    "double-correlated EXISTS + NOT EXISTS de-correlates into ONE "
    "per-order aggregate over the fact. Distinctness is decided by the "
    "min/max trick — distinct-supplier count > 1 iff min(suppkey) != "
    "max(suppkey), and exactly-one distinct R-supplier iff min(R-suppkey) "
    "= max(R-suppkey) with any R line present — so the fact is shuffled "
    "ONCE at order granularity with full map-side partial aggregation, "
    "no countDistinct Expand and no second aggregate stage. Ties "
    "impossible at the LIMIT boundary (name is unique per group).",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    # One hash aggregate over lineitem: min/max pairs stand in for the
    # two countDistincts (which would Expand the fact 2x before the
    # shuffle). When exactly one supplier has R-lines (the qualifying
    # case) that supplier IS min_r_supp, and every R-lineitem belongs to
    # it, so numwait contribution = r_lines directly.
    is_r = F.col("l_returnflag") == "R"
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
        F.min(F.when(is_r, F.col("l_suppkey"))).alias("min_r_supp"),
        F.max(F.when(is_r, F.col("l_suppkey"))).alias("max_r_supp"),
        F.count_if(is_r).alias("r_total"),
    )
    cand = per_order.filter(
        (F.col("min_supp") != F.col("max_supp"))
        & (F.col("r_total") > 0)
        & (F.col("min_r_supp") == F.col("max_r_supp"))
    ).withColumnRenamed("min_r_supp", "blame_supp")
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey)
        .join(s, cand.blame_supp == s.s_suppkey)
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.sum("r_total").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "name")
        .limit(100)
    )
