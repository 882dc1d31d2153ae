"""Aggregations [B] (SURVEY.md §2.4, lab-aggregations README.md:9):
GROUP BY aggs, COUNT DISTINCT, GROUPING SETS/CUBE/ROLLUP, HAVING.

All double sums route through DECIMAL(38,6) (see queries/_util.dsum) so the
value hash is independent of Spark's partial/final aggregation split —
Catalyst still does map-side partial aggregation on the decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import DAVG_SQL, DSUM_SQL, davg, dsum, t


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           {DSUM_SQL.format(x='l_quantity')} AS sum_qty,
           {DSUM_SQL.format(x='l_extendedprice')} AS sum_base_price,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DAVG_SQL.format(x='l_quantity')} AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style pricing summary: the lab-aggregations GROUP BY "
    "surface (COUNT/SUM/AVG/MIN/MAX) on the fact table. Partial+final agg "
    "split by Catalyst; 6k→6 rows at sf0.001, same shape at 100 TB.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    return li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) — Catalyst expands to a two-stage aggregate.",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           {DSUM_SQL.format(x='o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
    doc="HAVING — post-aggregation filter.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           {DSUM_SQL.format(x='l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP (Flink 1.19 GROUP BY extension, course-scope).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           {DSUM_SQL.format(x='o_totalprice')} AS total, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE (Flink 1.19 GROUP BY extension).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(dsum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           {DSUM_SQL.format(x='l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS via Spark SQL (no DataFrame-API equivalent; "
    "registered view + spark.sql is the idiomatic route — identical "
    "Catalyst plan).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS sum_price
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
               AS grouping_level,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="GROUPING()/GROUPING_ID over CUBE (Flink exposes both to tell "
    "subtotal rows from genuine NULL keys — the standard-SQL disambiguator "
    "that HAVING/filters on rollups need). DuckDB lacks GROUPING_ID, so "
    "the grouping_level column spells the identical bit math from "
    "GROUPING() in both engines.",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gid")
    return spark.sql(
        """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT)
                   AS grouping_level,
               COUNT(*) AS n
        FROM __li_gid
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # approximate by construction — HLL++ vs DuckDB's approx differ
    doc="approx_count_distinct (HLL++) — streaming-friendly distinct "
    "(SURVEY.md §2.4). No oracle: approximate results are engine-specific; "
    "rows-only check. Accuracy asserted vs exact in tests/test_aggregates.py.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        )
    )


@register(
    "agg_global_no_groupby",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {DSUM_SQL.format(x='l_extendedprice')} AS total_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
    doc="Global (grand-total) aggregate without GROUP BY.",
)
def agg_global_no_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderstatus AS status,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.9) AS p90,
           quantile_disc(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Discrete percentiles (PERCENTILE_DISC WITHIN GROUP — the "
    "order-statistics surface; Flink 1.19 course-scope analytics). "
    "Discrete (element-picking) percentiles are exact across engines, "
    "unlike interpolated PERCENTILE_CONT whose arithmetic drifts.",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("__o_pct")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
        FROM __o_pct GROUP BY o_orderstatus
        """
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT c_mktsegment AS segment,
           string_agg(DISTINCT c_nationkey, ',' ORDER BY c_nationkey)
               AS nations_csv
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Ordered string aggregation (LISTAGG / string_agg): collect_list "
    "+ sort + join in Spark — made deterministic by sorting the distinct "
    "set before concatenation.",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_nationkey")), ","
            ).alias("nations_csv")
        )
    )


@register(
    "agg_variance_covar_manual",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           sx / n AS mean_qty,
           sxx / n - (sx / n) * (sx / n) AS var_pop_qty,
           sxy / n - (sx / n) * (sy / n) AS cov_pop_qty_price
    FROM (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {DSUM_SQL.format(x='l_quantity')} AS sx,
               {DSUM_SQL.format(x='l_quantity * l_quantity')} AS sxx,
               {DSUM_SQL.format(x='l_extendedprice')} AS sy,
               {DSUM_SQL.format(x='l_extendedprice * l_extendedprice')} AS syy,
               {DSUM_SQL.format(x='l_quantity * l_extendedprice')} AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    """,
    doc="Population variance and covariance via moment sums (VAR_POP / "
    "COVAR_POP surface; CORR is the same moments — its extra sqrt/divide "
    "chain hits FMA-contraction ULP drift cross-engine, so it lives in "
    "tests/test_aggregates.py instead). Built-in var_pop/covar accumulate "
    "floats in partition order (non-deterministic cross-engine), so the "
    "moments go through DECIMAL(38,6) and the final formula is fixed-order "
    "double arithmetic — bit-identical to the oracle.",
)
def agg_variance_covar_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    base = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("sx"),
        dsum(q * q).alias("sxx"),
        dsum(p).alias("sy"),
        dsum(p * p).alias("syy"),
        dsum(q * p).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return base.select(
        "returnflag",
        (sx / n).alias("mean_qty"),
        (sxx / n - (sx / n) * (sx / n)).alias("var_pop_qty"),
        (sxy / n - (sx / n) * (sy / n)).alias("cov_pop_qty_price"),
    )


@register(
    "agg_pivot_conditional",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
           {DSUM_SQL.format(x="CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")}
               AS qty_f,
           {DSUM_SQL.format(x="CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")}
               AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="PIVOT / conditional aggregation (FILTER clause ↔ Spark "
    "groupBy().pivot() / count_if): line-status columns pivoted wide per "
    "returnflag. Expressed as conditional aggregates so the plan is a "
    "single pass — exactly what Catalyst rewrites pivot() into.",
)
def agg_pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count_if(F.col("l_linestatus") == "F").alias("n_f"),
        F.count_if(F.col("l_linestatus") == "O").alias("n_o"),
        dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0)).alias("qty_f"),
        dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0)).alias("qty_o"),
    )


@register(
    "agg_bool_bitwise",
    oracle="""
    SELECT o_orderpriority AS priority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bit_and(o_orderkey) AS key_bit_and,
           bit_or(o_orderkey % 256) AS key_bit_or,
           bit_xor(o_orderkey) AS key_bit_xor
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Boolean / bitwise aggregates (Flink BOOL_AND/BOOL_OR + bit "
    "aggregates): order-insensitive reductions, partial-agg friendly.",
)
def agg_bool_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bit_and("o_orderkey").alias("key_bit_and"),
        F.bit_or(F.col("o_orderkey") % 256).alias("key_bit_or"),
        F.bit_xor("o_orderkey").alias("key_bit_xor"),
    )


@register(
    "agg_collect_median",
    oracle="""
    SELECT l_returnflag AS returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_disc(l_quantity, 0.25) AS q1_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Collection + median aggregates (Flink LISTAGG/COLLECT + "
    "PERCENTILE_CONT): collect_set sorted for determinism and joined to a "
    "string (the driver's hash canonicalizer cannot hash array cells); "
    "median via interpolated percentile — quantities are whole-number "
    "doubles so the midpoint interpolation is exact in both engines. The "
    "discrete quartile is computed EXACTLY via window rank (value at "
    "0-based index floor((n-1)*q), DuckDB quantile_disc's definition) "
    "instead of percentile_approx, whose rank error exceeds one row once "
    "a group passes the accuracy bound (~1M rows at accuracy=1e6, i.e. "
    "lineitem SF ≳ 0.5) — exact at every SF, one extra same-key shuffle "
    "that the groupBy then reuses.",
)
def agg_collect_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    grp = Window.partitionBy("l_returnflag")
    ranked = li.withColumn(
        "__rn", F.row_number().over(grp.orderBy("l_quantity"))
    ).withColumn("__n", F.count(F.lit(1)).over(grp))
    q1_target = F.floor((F.col("__n") - 1) * F.lit(0.25)) + 1
    return ranked.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_qty"),
        F.min(F.when(F.col("__rn") == q1_target, F.col("l_quantity"))).alias(
            "q1_qty"
        ),
    )


@register(
    "agg_hll_mergeable_sketch",
    oracle=None,  # HLL register layouts/estimates are engine-specific;
    # the estimate's error bound vs exact COUNT(DISTINCT) is asserted in
    # tests/test_aggregates.py::test_hll_estimate_within_error
    doc="Mergeable HLL sketches (the 100 TB distinct-count pattern): "
    "per-segment customer sketches built in ONE pass (hll_sketch_agg), "
    "then re-aggregated WITHOUT rescanning the fact by merging sketches "
    "(hll_union_agg) — exactly how a cluster computes global distincts "
    "from per-partition partials. Emits per-segment estimates and the "
    "merged global estimate.",
)
def agg_hll_mergeable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    per_seg = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.count_distinct("c_custkey").alias("exact_distinct"),
    )
    merged = per_seg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("global_estimate")
    )
    return (
        per_seg.select(
            "segment",
            F.hll_sketch_estimate("sketch").alias("estimate"),
            "exact_distinct",
        )
        .join(F.broadcast(merged))
    )


@register(
    "agg_quantile_sketch_merge",
    oracle=None,  # sketch points are engine-internal; rank-error bound vs
    # the exact percentile is asserted in
    # tests/test_aggregates.py::test_quantile_sketch_merge_rank_error
    doc="Mergeable quantile sketches (operators/quantiles.py — the "
    "percentile analog of the HLL pattern): per-(lang, source) summaries "
    "of K=32 evenly-spaced quantile points built in ONE aggregate pass, "
    "then medians per lang answered from the STORED sketches (explode + "
    "weighted cumulative rank), never re-reading the raw rows. Rank "
    "error <= 1/K of the mass regardless of segment-size skew. At 100 TB "
    "this is how any-date-range p50/p95 queries run from kilobytes.",
)
def agg_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import merge_quantile_sketches, quantile_sketch

    d = t(spark, sf_dir, "documents")
    sketches = quantile_sketch(d, ["lang", "source"], "n_chars", k=32)
    return merge_quantile_sketches(sketches, ["lang"], 0.5)


@register(
    "agg_heavy_hitters_merge",
    oracle=None,  # truncated per-segment summaries are sketch-internal;
    # the est <= true <= est + max_missed sandwich and exact-at-large-K
    # recovery are asserted in
    # tests/test_aggregates.py::test_heavy_hitters_merge_bounds
    doc="Mergeable heavy-hitters sketches (operators/heavy_hitters.py — "
    "the frequent-items analog of the HLL/quantile pattern): per-"
    "event_type top-K=16 user frequency tables built in one pass, then "
    "the global top-10 users answered from the STORED summaries "
    "(explode + re-sum), never re-reading the events. Each answer "
    "carries est (lower bound) and max_missed (sum of the kth counts of "
    "segments that did not report the item) so est <= true <= est + "
    "max_missed — callers can certify exact top items from sketches "
    "alone. At 100 TB this is how any-date-range 'top domains' queries "
    "run from kilobytes.",
)
def agg_heavy_hitters_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import (
        heavy_hitter_sketch,
        merge_heavy_hitter_sketches,
    )

    ev = t(spark, sf_dir, "events")
    sketches = heavy_hitter_sketch(ev, ["event_type"], "user_id", k=16)
    return merge_heavy_hitter_sketches(sketches, [], top=10).select(
        F.col("item").alias("user_id"), "est", "max_missed"
    )


@register(
    "agg_heavy_hitters_merge_exact",
    oracle="""
    SELECT lang,
           COUNT(*) AS est,
           CAST(0 AS BIGINT) AS max_missed
    FROM documents
    GROUP BY lang
    ORDER BY est DESC, lang ASC
    LIMIT 5
    """,
    doc="Heavy-hitters merge on its EXACT subset, oracle-paired: when a "
    "segment holds fewer than K distinct items nothing is truncated, the "
    "sketch stores every (item, count) pair with kth_cnt = 0, and the "
    "merged estimates are provably exact with max_missed = 0. Here each "
    "of the 20 per-source sketches of lang frequencies (5 distinct "
    "langs < K = 8) is untruncated, so the sketch-merge answer must "
    "hash-match a plain GROUP BY lang over the raw documents — the "
    "DuckDB oracle the rows-only agg_heavy_hitters_merge entry cannot "
    "have. Same two-phase plan as the general case (segment sketch "
    "shuffle, then explode + re-agg over stored summaries).",
)
def agg_heavy_hitters_merge_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import (
        heavy_hitter_sketch,
        merge_heavy_hitter_sketches,
    )

    d = t(spark, sf_dir, "documents")
    sketches = heavy_hitter_sketch(d, ["source"], "lang", k=8)
    return merge_heavy_hitter_sketches(sketches, [], top=5).select(
        F.col("item").alias("lang"), "est", "max_missed"
    )


@register(
    "agg_first_last_value",
    oracle="""
    SELECT user_id,
           min_by(event_type, event_id) AS first_event_type,
           max_by(event_type, event_id) AS last_event_type,
           min_by(value, event_id) AS first_value,
           max_by(value, event_id) AS last_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="FIRST_VALUE / LAST_VALUE as GROUP BY aggregates (Flink 1.19 "
    "supports them outside OVER windows; its ordering is arrival order "
    "— nondeterministic — so the deterministic re-expression keys on "
    "the unique event_id: min_by/max_by, the same O(1)-state argmin/"
    "argmax pair the streaming Deduplication operator uses). One "
    "partial-aggregating shuffle; at 100 TB every group reduces "
    "map-side to a single (value, key) candidate per task.",
)
def agg_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", "event_id").alias("first_event_type"),
            F.max_by("event_type", "event_id").alias("last_event_type"),
            F.min_by("value", "event_id").alias("first_value"),
            F.max_by("value", "event_id").alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_qty,
           COUNT(DISTINCT l_suppkey)
               FILTER (WHERE l_tax > 0.03) AS n_taxed_supp
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL-standard aggregate FILTER clause (agg(...) FILTER (WHERE "
    "p) — Flink SQL supports it on grouped aggregations, and so do "
    "Spark and DuckDB natively): per-aggregate predicates inside ONE "
    "grouped pass, the idiomatic replacement for N self-joins or "
    "CASE-WHEN pyramids. Statement runs verbatim through the SQL "
    "front door; the filtered SUM routes through DECIMAL(38,6) (dsum "
    "convention) and a filtered COUNT(DISTINCT) exercises the "
    "Expand-based distinct path under a predicate. 100 TB: one "
    "partial+final hash aggregate on the group key — the filters are "
    "map-side row predicates, no extra shuffle, no join.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__agg_filt_li")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                    FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS open_qty,
               COUNT(DISTINCT l_suppkey)
                   FILTER (WHERE l_tax > 0.03) AS n_taxed_supp
        FROM __agg_filt_li
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_percentile_cont",
    oracle="""
    SELECT l_returnflag AS flag,
           quantile_cont(l_quantity, 0.25) AS q1,
           quantile_cont(l_quantity, 0.5) AS median,
           quantile_cont(l_quantity, 0.75) AS q3,
           quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)
               AS iqr
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Interpolated percentiles (PERCENTILE_CONT WITHIN GROUP): exact "
    "linear interpolation at rank (n-1)*q — Spark's percentile() and "
    "DuckDB's quantile_cont share the definition, and on this column "
    "the arithmetic is EXACT in binary (integer-valued quantities, "
    "quartile fractions are powers of two), so the pair hash-matches "
    "where a general PERCENTILE_CONT would ULP-drift (see "
    "agg_percentile_disc's note). Spark computes exact percentiles "
    "with a single partial-aggregated pass; for sketch-based quantiles "
    "at 100 TB see agg_quantile_sketch_merge.",
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q1"),
        F.expr("percentile(l_quantity, 0.5)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q3"),
        (
            F.expr("percentile(l_quantity, 0.75)")
            - F.expr("percentile(l_quantity, 0.25)")
        ).alias("iqr"),
    )


@register(
    "agg_approx_count_distinct_bound",
    oracle="""
    SELECT l_returnflag AS returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Driver-checkable ACCURACY CONTRACT for approx_count_distinct "
    "(companion to the rows-only agg_approx_count_distinct): per "
    "group, the engine computes both the HLL++ estimate (rsd=0.01) "
    "and the exact distinct, and emits within_bound = "
    "|approx - exact| <= 0.05 * exact (five standard errors). The "
    "oracle pins the group set, the EXACT distinct values, and the "
    "bound verdict — so a sketch accuracy regression hash-mismatches "
    "at the driver instead of living only in pytest. The estimate "
    "itself stays out of the hash (engine-specific by construction).",
)
def agg_approx_count_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("__approx"),
        )
        .select(
            "returnflag",
            "exact_orders",
            (
                F.abs(F.col("__approx") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("within_bound"),
        )
    )


@register(
    "agg_hll_sketch_bound",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(DISTINCT c_custkey) AS exact_distinct,
           TRUE AS within_bound
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Driver-checkable ACCURACY CONTRACT for the mergeable HLL "
    "sketch pattern (companion to the rows-only "
    "agg_hll_mergeable_sketch): per segment, the one-pass "
    "hll_sketch_agg estimate must sit within 5% of the exact "
    "distinct (default lgConfigK=12 gives ~1.6% standard error), "
    "and the sketch-MERGED global estimate within 5% of the exact "
    "global — both folded into within_bound. The oracle pins the "
    "segment set, exact values, and the verdict; register layouts "
    "and estimates stay engine-internal.",
)
def agg_hll_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    per_seg = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.count_distinct("c_custkey").alias("exact_distinct"),
    )
    merged = per_seg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("g_est"),
    )
    g_exact = c.agg(F.count_distinct("c_custkey").alias("g_exact"))
    return (
        per_seg.select(
            "segment",
            "exact_distinct",
            F.hll_sketch_estimate("sketch").alias("__est"),
        )
        .join(F.broadcast(merged))
        .join(F.broadcast(g_exact))
        .select(
            "segment",
            "exact_distinct",
            (
                (
                    F.abs(F.col("__est") - F.col("exact_distinct"))
                    <= 0.05 * F.col("exact_distinct")
                )
                & (
                    F.abs(F.col("g_est") - F.col("g_exact"))
                    <= 0.05 * F.col("g_exact")
                )
            ).alias("within_bound"),
        )
    )


@register(
    "agg_heavy_hitters_bound",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_items, TRUE AS all_within_bound
    """,
    doc="Driver-checkable ACCURACY CONTRACT for the mergeable "
    "heavy-hitters sketch (companion to the rows-only "
    "agg_heavy_hitters_merge): every item the sketch returns must "
    "satisfy the Misra-Gries sandwich "
    "est <= true_count <= est + max_missed against exact counts, and "
    "the query must return exactly 10 items — folded into one "
    "(n_items, all_within_bound) verdict row the driver hashes. The "
    "top-10 SET itself is legitimately sketch-dependent (per-segment "
    "truncation + ties), so set membership stays in the rows-only "
    "sibling; a sandwich violation here hash-mismatches at the "
    "driver instead of living only in pytest.",
)
def agg_heavy_hitters_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import all_queries

    sk = all_queries()["agg_heavy_hitters_merge"](spark, sf_dir)
    ev = t(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        sk.join(exact, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.bool_and(
                (F.col("est") <= F.col("true_count"))
                & (F.col("true_count") <= F.col("est") + F.col("max_missed"))
            ).alias("all_within_bound"),
        )
    )


@register(
    "agg_quantile_sketch_bound",
    oracle="""
    SELECT lang, TRUE AS within_band
    FROM documents
    GROUP BY lang
    """,
    doc="Driver-checkable ACCURACY CONTRACT for the mergeable quantile "
    "sketch (companion to the rows-only agg_quantile_sketch_merge): "
    "the sketch-merged per-lang median must land inside the EXACT "
    "p40-p60 value band of the raw data (sketch rank error is 1/K = "
    "~3% of mass; the 10%-each-side band absorbs per-segment "
    "percentile_approx error on tiny segments — the same band the "
    "pytest property test pins). The oracle fixes the lang group set "
    "and the verdict; sketch points stay engine-internal.",
)
def agg_quantile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import all_queries

    med = all_queries()["agg_quantile_sketch_merge"](spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    bands = d.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.4)).alias("__lo"),
        F.percentile(F.col("n_chars"), F.lit(0.6)).alias("__hi"),
    )
    return (
        med.join(bands, "lang")
        .select(
            "lang",
            (
                (F.col("__lo") <= F.col("q50"))
                & (F.col("q50") <= F.col("__hi"))
            ).alias("within_band"),
        )
    )
