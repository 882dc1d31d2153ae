"""Scalar function surface [B] (SURVEY.md §2.7) — the Flink 1.19 built-in
families the labs draw on (string / datetime / math / conditional / JSON /
array-map-struct), each as an oracle-paired query.

Everything is a per-row JVM expression inside whole-stage codegen — no
shuffles, no UDFs; at 100 TB these are pure map stages over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import dsum, t


@register(
    "scalar_string",
    oracle="""
    SELECT c_custkey AS custkey,
           CONCAT(UPPER(c_mktsegment), ':', LOWER(c_name)) AS tag,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           split_part(c_name, '#', 2) AS name_id_str,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, 'Customer', 'Cust') AS short_name,
           TRIM(CONCAT('  ', c_mktsegment, '  ')) AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           (c_name LIKE 'Customer%') AS is_customer
    FROM customer
    """,
    doc="String family: CONCAT/UPPER/LOWER/SUBSTRING/SPLIT_INDEX("
    "split_part)/CHAR_LENGTH/REPLACE/TRIM/REGEXP_EXTRACT/LIKE "
    "(SURVEY.md §2.7 string row).",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.upper("c_mktsegment"), F.lit(":"), F.lower("c_name")).alias("tag"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.substring_index("c_name", "#", -1).alias("name_id_str"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.col("c_name").like("Customer%").alias("is_customer"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey AS order_id,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS dy,
           EXTRACT(HOUR FROM o_orderdate) AS hr,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) + 1 AS dow_sun1,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(FLOOR(EPOCH(DATE_TRUNC('month', o_orderdate))) AS BIGINT)
               AS month_start_epoch,
           date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
               AS days_since_2024,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
               AS due_date
    FROM orders
    """,
    doc="Datetime family: EXTRACT(YEAR/MONTH/DAY/HOUR/DOW), DATE_FORMAT("
    "strftime), FLOOR-to-month (DATE_TRUNC), TIMESTAMPDIFF(date_diff), "
    "TIMESTAMPADD (SURVEY.md §2.7 date/time row). DOW normalized to "
    "Sunday=1 to match Spark's dayofweek.",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.hour("o_orderdate").alias("hr"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_trunc("month", F.col("o_orderdate")).cast("long").alias("month_start_epoch"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_2024"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           ABS(l_discount - 0.05) AS abs_disc,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(POWER(l_quantity, 2) AS DOUBLE) AS qty_sq,
           MOD(l_orderkey, 7) AS key_mod7,
           GREATEST(l_quantity, 25.0) AS qty_hi,
           LEAST(l_tax, 0.04) AS tax_lo,
           SQRT(l_quantity) AS sqrt_qty,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_disc
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Math family: ABS/CEIL/FLOOR/POWER/MOD/SQRT/SIGN/GREATEST/LEAST "
    "(SURVEY.md §2.7 math row). ROUND (HALF_UP vs half-even) and LN/LOG10 "
    "(1-ULP libm drift vs Java Math.log) excluded from the oracle pair — "
    "covered in tests/test_scalar.py instead.",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_lo"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey AS order_id,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           (CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS is_top_priority
    FROM orders
    """,
    doc="Conditional family: CASE WHEN / COALESCE / NULLIF / IF "
    "(SURVEY.md §2.7 conditional row).",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.when(F.col("o_totalprice") > 250000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.expr("IF(o_orderpriority LIKE '1%', 1, 0)").alias("is_top_priority"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    """,
    doc="JSON family (SURVEY.md §2.7): JSON_VALUE over the events.props "
    "payload (clickstream-style JSON column). Spark: get_json_object — "
    "JVM-side Jackson parse, no UDF.",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "scalar_array_struct",
    oracle="""
    SELECT n_nationkey AS nationkey,
           len([n_name, 'x', 'y']) AS arr_len,
           [n_name, 'x', 'y'][1] AS arr_first,
           list_contains([0, 1, 2, n_regionkey], 2) AS has_two,
           struct_pack(k := n_nationkey, r := n_regionkey).k AS struct_k,
           CASE n_regionkey WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA'
                ELSE 'OTHER' END AS region_map
    FROM nation
    """,
    doc="Array/Row family (SURVEY.md §2.7): ARRAY constructor, CARDINALITY, "
    "element access, array membership, ROW construction + field access, "
    "MAP-style lookup (expressed as element_at over a literal map in "
    "Spark; CASE in the oracle — same values).",
)
def scalar_array_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    region_map = F.create_map(
        F.lit(0), F.lit("AFRICA"), F.lit(1), F.lit("AMERICA")
    )
    return n.select(
        F.col("n_nationkey").alias("nationkey"),
        F.size(F.array(F.col("n_name"), F.lit("x"), F.lit("y"))).alias("arr_len"),
        F.array(F.col("n_name"), F.lit("x"), F.lit("y")).getItem(0).alias("arr_first"),
        F.array_contains(
            F.array(F.lit(0), F.lit(1), F.lit(2), F.col("n_regionkey")), 2
        ).alias("has_two"),
        F.struct(F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("r"))
        .getField("k")
        .alias("struct_k"),
        F.coalesce(F.element_at(region_map, F.col("n_regionkey")), F.lit("OTHER")).alias(
            "region_map"
        ),
    )


@register(
    "scalar_string_extended",
    oracle="""
    SELECT n_nationkey AS nationkey,
           LPAD(n_name, 12, '.') AS padded,
           RPAD(n_name, 12, '.') AS rpadded,
           REVERSE(n_name) AS reversed,
           ASCII(n_name) AS first_code,
           CHR(65 + n_nationkey % 26) AS letter,
           REPEAT(SUBSTRING(n_name, 1, 2), 3) AS rep2x3,
           LEFT(n_name, 3) AS l3,
           RIGHT(n_name, 3) AS r3,
           CONTAINS(n_name, 'AN') AS has_an,
           starts_with(n_name, 'A') AS starts_a,
           ends_with(n_name, 'A') AS ends_a,
           INSTR(n_name, 'A') AS a_pos
    FROM nation
    """,
    doc="Extended string family: LPAD/RPAD/REVERSE/ASCII/CHR/REPEAT/"
    "LEFT/RIGHT/CONTAINS/STARTS_WITH/ENDS_WITH/INSTR (Flink 1.19 "
    "built-in breadth, SURVEY.md §2.7).",
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("nationkey"),
        F.lpad("n_name", 12, ".").alias("padded"),
        F.rpad("n_name", 12, ".").alias("rpadded"),
        F.reverse("n_name").alias("reversed"),
        F.ascii("n_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("rep2x3"),
        F.substring("n_name", 1, 3).alias("l3"),
        F.col("n_name").substr(F.length("n_name") - 2, F.lit(3)).alias("r3"),
        F.contains(F.col("n_name"), F.lit("AN")).alias("has_an"),
        F.startswith(F.col("n_name"), F.lit("A")).alias("starts_a"),
        F.endswith(F.col("n_name"), F.lit("A")).alias("ends_a"),
        F.instr(F.col("n_name"), "A").alias("a_pos"),
    )


@register(
    "scalar_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_parsed,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    """,
    doc="Typed JSON parsing (Flink JSON_QUERY / structured access, "
    "SURVEY.md §2.7): from_json with an explicit schema — the "
    "Spark-idiomatic path when the payload shape is known (one parse, "
    "typed struct out), vs get_json_object's per-path parse.",
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    parsed = e.withColumn("j", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k_parsed"),
        (F.col("j.k") * 2).alias("k_doubled"),
        F.col("j.k").isNotNull().alias("has_k"),
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           bit_count(o_orderkey) AS popcount
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    doc="Bitwise family (Flink 1.19 bit functions): AND/OR/XOR, shifts, "
    "popcount — the primitives the sketch operators (SimHash, LSH "
    "banding) build on.",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    k = F.col("o_orderkey")
    return o.select(
        k.alias("orderkey"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "scalar_array_advanced",
    oracle="""
    SELECT n_nationkey AS nationkey,
           array_to_string(
               list_sort([n_nationkey % 7, n_nationkey % 5, n_nationkey % 3]),
               ',') AS sorted_arr,
           array_to_string(flatten([[n_nationkey], [n_regionkey, 0]]), ',')
               AS flat,
           array_to_string([n_nationkey, n_regionkey, 0, 1][2:3], ',')
               AS sliced,
           list_position([10, 20, 30, n_nationkey], 30) AS pos30,
           array_to_string(range(0, CAST(n_regionkey AS BIGINT) + 1), ',')
               AS seq_arr,
           CAST(list_sum(list_transform([1, 2, 3], x -> x * n_regionkey))
               AS BIGINT) AS weighted_sum
    FROM nation
    """,
    doc="Advanced array family: array_sort / flatten / slice / "
    "array_position / sequence / transform+aggregate (SURVEY.md §2.7 "
    "array row — the higher-order-function surface the dedup sketches "
    "build on). Array outputs are string-joined: the driver's hash "
    "canonicalizer cannot sort list cells.",
)
def scalar_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    k, r = F.col("n_nationkey"), F.col("n_regionkey")
    def sjoin(arr):
        return F.array_join(arr.cast("array<string>"), ",")

    return n.select(
        k.alias("nationkey"),
        sjoin(F.array_sort(F.array(k % 7, k % 5, k % 3))).alias("sorted_arr"),
        sjoin(F.flatten(F.array(F.array(k), F.array(r, F.lit(0))))).alias("flat"),
        sjoin(F.slice(F.array(k, r, F.lit(0), F.lit(1)), 2, 2)).alias("sliced"),
        F.array_position(F.array(F.lit(10), F.lit(20), F.lit(30), k), 30).alias("pos30"),
        sjoin(F.sequence(F.lit(0).cast("long"), r.cast("long"))).alias("seq_arr"),
        F.aggregate(
            F.transform(F.array(F.lit(1), F.lit(2), F.lit(3)), lambda x: x * r),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("weighted_sum"),
    )


@register(
    "scalar_edit_distance_hash",
    oracle="""
    SELECT c.c_custkey AS custkey,
           levenshtein(c.c_name, s.s_name) AS name_dist,
           levenshtein(c.c_mktsegment, 'MACHINERY') AS seg_dist,
           translate(c.c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           md5(c.c_name) AS name_md5,
           sha256(c.c_name) AS name_sha256
    FROM customer c
    JOIN supplier s ON c.c_custkey = s.s_suppkey
    """,
    doc="Edit-distance + hashing family (fuzzy-match primitives the "
    "near-dup operators build on): LEVENSHTEIN, TRANSLATE, MD5, "
    "SHA-256 — all JVM-side codegen expressions.",
)
def scalar_edit_distance_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return c.join(s, c.c_custkey == s.s_suppkey).select(
        F.col("c_custkey").alias("custkey"),
        F.levenshtein("c_name", "s_name").alias("name_dist"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("seg_dist"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@register(
    "scalar_map_functions",
    oracle="""
    SELECT n_nationkey AS nationkey,
           'nk,rk' AS mkeys,
           array_to_string([n_nationkey, n_regionkey], ',') AS mvals,
           n_regionkey AS rk_lookup,
           2 AS msize,
           TRUE AS has_nk,
           n_nationkey IS NOT NULL AS nk_not_null
    FROM nation
    """,
    doc="Map family (Flink MAP[...] constructor + CARDINALITY + element "
    "access, SURVEY.md §2.7 array/map/row): Spark side builds a real "
    "MapType column with create_map and reads it back via map_keys / "
    "map_values / element_at / size / map_contains_key; the oracle states "
    "the expected values directly (DuckDB's MAP extraction semantics "
    "differ across versions, so the map machinery under test is ours).",
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nk"), F.col("n_nationkey"), F.lit("rk"), F.col("n_regionkey")
    )
    return n.select(
        F.col("n_nationkey").alias("nationkey"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m).cast("array<string>"), ",").alias("mvals"),
        F.element_at(m, "rk").alias("rk_lookup"),
        F.size(m).alias("msize"),
        F.map_contains_key(m, "nk").alias("has_nk"),
        F.element_at(m, "nk").isNotNull().alias("nk_not_null"),
    )


@register(
    "scalar_datetime_extended",
    oracle="""
    SELECT o_orderkey AS orderkey,
           quarter(o_orderdate) AS qtr,
           dayofyear(o_orderdate) AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           make_date(2024, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER),
                     1) AS normalized_month,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(FLOOR((EPOCH(o_orderdate)
                       - EPOCH(TIMESTAMP '1997-01-01')) / 60) AS BIGINT)
               AS minutes_since_97
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
    doc="Extended datetime family: QUARTER, DAYOFYEAR, LAST_DAY, "
    "MAKE_DATE, FLOOR-to-week, TIMESTAMPDIFF-in-minutes (spelled as an "
    "exact epoch difference so complete-interval vs boundary-crossing "
    "semantics can't diverge between engines).",
)
def scalar_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    d = F.col("o_orderdate")
    epoch97 = F.lit("1997-01-01").cast("timestamp").cast("long")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.make_date(F.lit(2024), F.month(d), F.lit(1)).alias("normalized_month"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.floor((d.cast("timestamp").cast("long") - epoch97) / 60)
        .cast("long")
        .alias("minutes_since_97"),
    )


@register(
    "scalar_null_semantics",
    oracle="""
    SELECT o_orderkey AS orderkey,
           NULLIF(o_orderstatus, 'O') AS s_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'fallback') AS coalesced,
           (NULLIF(o_orderstatus, 'O') IS DISTINCT FROM
            NULLIF(o_orderstatus, 'F')) AS distinct_from,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL)
               AS null_safe_is_null,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL
                THEN -1 ELSE o_orderkey END AS guarded
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="NULL-semantics family (three-valued logic the course's WHERE/"
    "CASE lessons rest on; fixtures are NULL-free so NULLIF constructs "
    "them): IS [NOT] DISTINCT FROM (null-safe compare, Spark <=>), "
    "COALESCE fallbacks, TRY_CAST to NULL on failure, NULL-guarded CASE.",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    s_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    f_null = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        s_null.alias("s_null"),
        F.coalesce(s_null, F.lit("fallback")).alias("coalesced"),
        (~s_null.eqNullSafe(f_null)).alias("distinct_from"),
        s_null.eqNullSafe(F.lit(None).cast("string")).alias("null_safe_is_null"),
        F.expr("TRY_CAST(o_orderpriority AS INTEGER)").alias("bad_cast"),
        F.when(s_null.isNull(), F.lit(-1))
        .otherwise(F.col("o_orderkey"))
        .alias("guarded"),
    )


@register(
    "agg_null_semantics",
    oracle="""
    SELECT NULLIF(o_orderstatus, 'O') AS status_nulled,
           COUNT(*) AS n_rows,
           COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_price,
           MIN(NULLIF(o_orderstatus, 'O')) AS min_status
    FROM orders
    GROUP BY NULLIF(o_orderstatus, 'O')
    """,
    doc="Aggregation under NULLs: GROUP BY a nullable key (the NULL group "
    "is one real group in both engines), COUNT(*) vs COUNT(col) "
    "(null-skipping), MIN ignoring NULLs — the exact three-valued rules "
    "Flink/Calcite and Spark share.",
)
def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    nulled = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.groupBy(nulled.alias("status_nulled")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nulled).alias("n_nonnull"),
        dsum("o_totalprice").alias("sum_price"),
        F.min(nulled).alias("min_status"),
    )


@register(
    "scalar_decimal_arithmetic",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.07 AS
                DECIMAL(4,2)) AS DECIMAL(24,4)) AS DOUBLE) AS with_tax,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(o_totalprice AS
                DECIMAL(18,2)) AS DECIMAL(19,2)) AS DOUBLE) AS doubled,
           CAST(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS
                DECIMAL(18,0)) AS DOUBLE) AS rounded_dec,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 100 AS DECIMAL(18,2))
               AS DOUBLE) AS mod_100
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    doc="DECIMAL(p,s) typed arithmetic (SURVEY.md §1.3 type table — the "
    "course's money type): cast, scaled multiply, add, ROUND-on-decimal "
    "(exact, no float rounding-mode divergence — decimals round "
    "identically in both engines, unlike doubles), and modulo. All "
    "arithmetic runs in pinned DECIMAL precision; the FINAL output is cast "
    "to DOUBLE on both engine sides because the driver's hash canonicalizer "
    "distinguishes Decimal from float (pandas fetches DuckDB decimals as "
    "float64, so emitting Spark Decimal objects can never hash-match — the "
    "round-2 driver-red root cause).",
)
def scalar_decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        d.cast("double").alias("price_dec"),
        (d * F.lit(1.07).cast("decimal(4,2)")).cast("decimal(24,4)")
        .cast("double").alias("with_tax"),
        (d + d).cast("decimal(19,2)").cast("double").alias("doubled"),
        F.round(d, 0).cast("decimal(18,0)").cast("double").alias("rounded_dec"),
        (d % 100).cast("decimal(18,2)").cast("double").alias("mod_100"),
    )


@register(
    "scalar_string_datetime_extras",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           position('the' in text) AS the_pos,
           ltrim(lang) AS l_trimmed, rtrim(source) AS r_trimmed,
           to_base64(encode(lang)) AS lang_b64,
           lower(hex(encode(source))) AS source_hex,
           length(text) - length(replace(text, ' ', '')) + 1 AS word_count
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    doc="String-function stragglers from the Flink built-in surface "
    "(regexp_replace-all, POSITION/LOCATE, LTRIM/RTRIM, TO_BASE64, HEX, "
    "replace-based token counting). All JVM built-ins; hex case is pinned "
    "with lower() since the engines disagree on hex digit case. INITCAP/"
    "OVERLAY/PARSE_URL/STR_TO_MAP are oracle-paired separately in "
    "scalar_string_url_map via regexp/substr emulations.",
)
def scalar_string_datetime_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.locate("the", F.col("text")).alias("the_pos"),
        F.ltrim("lang").alias("l_trimmed"),
        F.rtrim("source").alias("r_trimmed"),
        F.base64(F.encode("lang", "UTF-8")).alias("lang_b64"),
        F.lower(F.hex(F.encode("source", "UTF-8"))).alias("source_hex"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("word_count"),
    )


@register(
    "scalar_string_url_map",
    oracle="""
    WITH u AS (
        SELECT doc_id, lang, source,
               'https://' || source || '.example.com/docs/' || lang
                   || '?id=' || CAST(doc_id AS VARCHAR) AS url
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS qid,
           regexp_extract('lang:' || lang || ',src:' || source,
                          'src:([^,]*)', 1) AS src_from_map,
           substr(source, 1, 1) || 'XX' || substr(source, 4) AS overlaid,
           upper(lang[1]) || lang[2:] AS lang_cap
    FROM u
    """,
    doc="URL / map / in-place-edit string functions from the Flink "
    "built-in surface: PARSE_URL(HOST/PATH/QUERY key), STR_TO_MAP + "
    "element access, OVERLAY, INITCAP — previously unit-tested only "
    "(scalar_string_datetime_extras notes DuckDB lacks them); now "
    "oracle-paired via regexp/substr emulations. The URL is "
    "constructed deterministically from (source, lang, doc_id) so "
    "both engines parse the same strings. Map-only.",
)
def scalar_string_url_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
    )
    kv = F.str_to_map(
        F.concat(F.lit("lang:"), "lang", F.lit(",src:"), "source"),
        F.lit(","),
        F.lit(":"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid"),
        F.element_at(kv, F.lit("src")).alias("src_from_map"),
        F.overlay("source", F.lit("XX"), F.lit(2)).alias("overlaid"),
        F.initcap("lang").alias("lang_cap"),
    )


@register(
    "scalar_json_construct",
    oracle="""
    SELECT lang,
           json_object('lang', lang, 'n_docs', COUNT(*),
                       'total_chars', CAST(SUM(n_chars) AS BIGINT))
               AS summary_json,
           to_json(list(DISTINCT source ORDER BY source)) AS sources_json
    FROM documents
    GROUP BY lang
    """,
    doc="JSON CONSTRUCTION functions (Flink 1.19: JSON_OBJECT / "
    "JSON_ARRAYAGG — the write side of the JSON surface; the read side "
    "is scalar_json_*): Spark builds the same compact strings with "
    "to_json(struct(...)) and to_json(array_sort(collect_set(...))) — "
    "both engines emit identical key order (declaration order) and "
    "number formatting for string/int fields, so the JSON text itself "
    "hash-matches. One aggregate shuffle.",
)
def scalar_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.array_sort(F.collect_set("source")).alias("sources"),
    )
    return agg.select(
        "lang",
        F.to_json(
            F.struct(
                F.col("lang"),
                F.col("n_docs"),
                F.col("total_chars"),
            )
        ).alias("summary_json"),
        F.to_json("sources").alias("sources_json"),
    )


@register(
    "scalar_error_safe_parsing",
    oracle="""
    SELECT doc_id,
           TRY_CAST(split_part(text, ' ', 1) AS INTEGER) AS first_tok_int,
           TRY_CAST(lang AS DOUBLE) AS lang_as_num,
           COALESCE(array_to_string(
               regexp_extract_all(text, '[a-z]+ing'), '|'), '')
               AS ing_words,
           len(regexp_extract_all(text, '[a-z]+ing')) AS n_ing
    FROM documents
    """,
    doc="Error-safe parsing surface (Flink TRY_CAST semantics — NULL on "
    "failure instead of a runtime error — plus regexp_extract_all): "
    "TRY_CAST of a usually-non-numeric token and of the lang code "
    "(always NULL, exercising the all-failure path), and extraction of "
    "every '-ing' word as an array with its count. The dirty-input "
    "idiom every ingest pipeline needs: a single malformed row must "
    "not kill a 100 TB job. Map-only, whole-stage codegen; both "
    "engines agree NULL-for-unparseable bit-for-bit.",
)
def scalar_error_safe_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1))
        .try_cast("int")
        .alias("first_tok_int"),
        F.col("lang").try_cast("double").alias("lang_as_num"),
        # Explicit group index 0 (whole match): Spark defaults idx=1 and
        # raises REGEX_GROUP_INDEX on a zero-group pattern the moment a
        # row actually matches; DuckDB defaults to group 0.
        F.array_join(
            F.expr("regexp_extract_all(text, '[a-z]+ing', 0)"), "|"
        ).alias("ing_words"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]+ing', 0)")
        ).alias("n_ing"),
    )
