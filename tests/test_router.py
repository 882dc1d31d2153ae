"""Statement-router tests: the ten attested statements S1–S10 executed
through the engine's SQL front door on fixture stand-ins (SURVEY.md §2.1,
§3 EP1/EP3). This is the closest thing to 'running the reference labs'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.plans.router import StatementRouter, _map_type
from training_flink_sql_cc_src_spark.sources.fixtures import register_fixture_views
from training_flink_sql_cc_src_spark.streaming.pipeline import PipelineRunner


@pytest.fixture()
def router(spark, sf_small):
    register_fixture_views(spark, sf_small)
    return StatementRouter(spark)


def test_type_mapping():
    assert _map_type("STRING") == "string"
    assert _map_type("TIMESTAMP(3)") == "timestamp"
    assert _map_type("TIMESTAMP_LTZ(3)") == "timestamp"
    assert _map_type("DECIMAL(10,2)") == "decimal(10,2)"
    assert _map_type("ARRAY<INT>") == "array<int>"
    assert _map_type("ROW<city STRING, zip BIGINT>") == (
        "struct<city: string, zip: bigint>"
    )


def test_s1_s2_create_insert_upsert(router, spark):
    # S1 (terraform/lab-aggregations/main.tf:396) re-expressed on customer
    router.execute(
        "CREATE TABLE shoe_customers_keyed (customer_id STRING, first_name "
        "STRING, last_name STRING, email STRING, PRIMARY KEY (customer_id) "
        "NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS"
    )
    meta = router.catalog.get("shoe_customers_keyed")
    assert meta.primary_key == ["customer_id"]
    assert meta.buckets == 1
    assert meta.changelog_mode == "upsert"
    # S2 (:431): projection+rename INSERT
    router.execute(
        "INSERT INTO shoe_customers_keyed SELECT CAST(c_custkey AS STRING), "
        "c_name, c_mktsegment, c_name FROM customer"
    )
    n = spark.table("shoe_customers_keyed").count()
    assert n == spark.table("customer").count()
    # re-insert same keys -> upsert keeps count constant (latest wins)
    router.execute(
        "INSERT INTO shoe_customers_keyed SELECT CAST(c_custkey AS STRING), "
        "UPPER(c_name), c_mktsegment, c_name FROM customer"
    )
    t = spark.table("shoe_customers_keyed")
    assert t.count() == n
    # and the latest version won
    row = t.filter(t.customer_id == "1").collect()[0]
    assert row.first_name == row.first_name.upper()


def test_s5_retract_mode_prop(router):
    router.execute(
        "CREATE TABLE enriched (order_id INT, total DOUBLE) "
        "DISTRIBUTED INTO 1 BUCKETS WITH ('changelog.mode' = 'retract')"
    )
    assert router.catalog.get("enriched").changelog_mode == "retract"


def test_s7_alter_modify_retype(router, spark):
    # S7/S8 (terraform/lab-joins/main.tf:465,498): retype a column
    router.execute("ALTER TABLE orders MODIFY (`o_orderkey` STRING)")
    assert dict(spark.table("orders").dtypes)["o_orderkey"] == "string"


def test_s9_watermark_registration(router):
    # S9/S10 (terraform/lab-joins/main.tf:531,564): zero-delay watermark
    router.execute("ALTER TABLE events MODIFY WATERMARK FOR `ts` AS `ts`")
    meta = router.catalog.get("events")
    assert meta.watermark_col == "ts"
    assert meta.watermark_delay == "0 seconds"
    router.execute(
        "ALTER TABLE events MODIFY WATERMARK FOR `ts` AS ts - INTERVAL '5' SECOND"
    )
    assert router.catalog.get("events").watermark_delay == "5 seconds"


def test_full_lab_dag(spark, sf_small):
    """EP3: the full S1→S6 depends_on DAG re-expressed on fixtures
    (terraform/lab-aggregations/main.tf:407-412,442-445,541-544,574-576)."""
    register_fixture_views(spark, sf_small)
    p = PipelineRunner(spark)
    p.add(
        "s1",
        "CREATE TABLE t_customers_keyed (customer_id STRING, name STRING, "
        "segment STRING, PRIMARY KEY (customer_id) NOT ENFORCED) "
        "DISTRIBUTED INTO 1 BUCKETS",
    )
    p.add(
        "s2",
        "INSERT INTO t_customers_keyed SELECT CAST(c_custkey AS STRING), "
        "c_name, c_mktsegment FROM customer",
        depends_on=["s1"],
    )
    p.add(
        "s3",
        "CREATE TABLE t_products_keyed (product_id STRING, brand STRING, "
        "model STRING, sale_price DOUBLE, PRIMARY KEY (product_id) NOT "
        "ENFORCED) DISTRIBUTED INTO 1 BUCKETS",
    )
    p.add(
        "s4",
        "INSERT INTO t_products_keyed SELECT CAST(p_partkey AS STRING), "
        "p_brand, p_name, p_retailprice FROM part",
        depends_on=["s3"],
    )
    p.add(
        "s5",
        "CREATE TABLE t_enriched (order_id INT, name STRING, brand STRING, "
        "sale_price DOUBLE) DISTRIBUTED INTO 1 BUCKETS "
        "WITH ('changelog.mode' = 'retract')",
        depends_on=["s2", "s4"],
    )
    p.add(
        "s6",
        "INSERT INTO t_enriched(order_id, name, brand, sale_price) "
        "SELECT CAST(l.l_orderkey AS INT), c.name, pr.brand, pr.sale_price "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN t_customers_keyed c ON CAST(o.o_custkey AS STRING) = c.customer_id "
        "JOIN t_products_keyed pr ON CAST(l.l_partkey AS STRING) = pr.product_id",
        depends_on=["s2", "s4", "s5"],
    )
    order = p.run()
    assert order.index("s2") > order.index("s1")
    assert order.index("s6") > order.index("s5")
    enriched = spark.table("t_enriched")
    assert enriched.count() == spark.table("lineitem").count()
    assert enriched.columns == ["order_id", "name", "brand", "sale_price"]


def test_tumble_tvf_rewrite(router, spark):
    """Flink's TUMBLE TVF through the front door == F.window tumble."""
    got = router.execute(
        "SELECT window_start, window_end, COUNT(*) AS n "
        "FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), "
        "INTERVAL '10' MINUTES)) GROUP BY window_start, window_end"
    ).collect()
    want = (
        spark.table("events")
        .groupBy(F.window("ts", "10 minutes"))
        .count()
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            F.col("count").alias("n"),
        )
        .collect()
    )
    assert {(r.window_start, r.window_end, r.n) for r in got} == {
        (r.ws, r.we, r.n) for r in want
    } and len(got) > 0


def test_hop_tvf_rewrite(router, spark):
    """HOP TVF (slide 5m, size 10m): every row lands in two windows."""
    got = router.execute(
        "SELECT window_start, COUNT(*) AS n "
        "FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), "
        "INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)) GROUP BY window_start"
    ).collect()
    want = (
        spark.table("events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .count()
        .select(F.col("window.start").alias("ws"), F.col("count").alias("n"))
        .collect()
    )
    assert {(r.window_start, r.n) for r in got} == {(r.ws, r.n) for r in want}
    assert sum(r.n for r in got) == 2 * spark.table("events").count()


def test_cumulate_tvf_rewrite(router, spark, sf_small):
    """CUMULATE TVF (step 15m, max 1h) == the native growing-window
    expansion (window_cumulate), modulo epoch-vs-timestamp typing."""
    from training_flink_sql_cc_src_spark.registry import all_queries

    got = router.execute(
        "SELECT window_start, window_end, COUNT(*) AS n_events "
        "FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), "
        "INTERVAL '15' MINUTES, INTERVAL '1' HOUR)) "
        "GROUP BY window_start, window_end"
    ).collect()
    want = all_queries()["window_cumulate"](spark, sf_small).collect()
    as_epochs = {
        (int(r.window_start.timestamp()), int(r.window_end.timestamp()), r.n_events)
        for r in got
    }
    assert as_epochs == {(r.window_start, r.window_end, r.n_events) for r in want}


def test_session_tvf_rewrite(router, spark):
    """SESSION TVF (lab-time syntax) == native F.session_window exactly:
    the router's gaps-and-islands rewrite must agree on every session
    boundary, including the exact-gap edge (>= gap starts a new session,
    windows are [start, last+gap))."""
    got = router.execute(
        "SELECT user_id, window_start, window_end, COUNT(*) AS n_events "
        "FROM TABLE(SESSION(TABLE events PARTITION BY user_id, "
        "DESCRIPTOR(ts), INTERVAL '10' MINUTES)) "
        "GROUP BY user_id, window_start, window_end"
    )
    native = (
        spark.table("events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
    assert got.exceptAll(native).count() == 0
    assert native.exceptAll(got).count() == 0
    assert got.count() > 0


def test_session_tvf_no_partition(router, spark):
    """SESSION without PARTITION BY: one global session stream."""
    got = router.execute(
        "SELECT window_start, COUNT(*) AS n FROM TABLE(SESSION("
        "TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES)) "
        "GROUP BY window_start"
    )
    native = (
        spark.table("events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"))
        .count()
    )
    assert got.count() == native.count() > 0


def test_three_level_namespace(router, spark):
    """catalog.db.table and bare-name-under-USE address the same table
    (the reference's sql.current-catalog / sql.current-database props,
    terraform/lab-aggregations/main.tf:397-400)."""
    router.execute("SET 'sql.current-catalog' = 'examples'")
    router.execute("SET 'sql.current-database' = 'marketplace'")
    router.execute(
        "CREATE TABLE ns_products (id INT, model STRING, "
        "PRIMARY KEY (id) NOT ENFORCED)"
    )
    router.execute("INSERT INTO ns_products VALUES (1, 'alpha'), (2, 'beta')")
    bare = router.execute("SELECT * FROM ns_products ORDER BY id").collect()
    qualified = router.execute(
        "SELECT * FROM examples.marketplace.ns_products ORDER BY id"
    ).collect()
    assert bare == qualified and len(bare) == 2
    # a second router session addresses it via USE CATALOG / USE
    other = StatementRouter(spark, catalog=router.catalog)
    other.execute("USE CATALOG examples")
    other.execute("USE marketplace")
    assert other.execute("SELECT COUNT(*) AS n FROM ns_products").collect()[
        0
    ].n == 2


def test_dunder_table_name_publishes_no_bare_alias(router, spark):
    """A NON-namespaced table whose own name contains "__" must publish
    only itself: the old _publish split the canonical name on "__" and
    would register `ru_bal` as a second view, silently clobbering any
    unrelated view of that name in the shared session (ADVICE round 2)."""
    spark.range(1).selectExpr("id AS marker").createOrReplaceTempView(
        "ru_bal"
    )
    router.execute("CREATE TABLE __ru_bal (k INT, PRIMARY KEY (k) NOT ENFORCED)")
    router.execute("INSERT INTO __ru_bal VALUES (7)")
    # the unrelated bare view is untouched
    assert spark.table("ru_bal").columns == ["marker"]
    assert spark.table("__ru_bal").count() == 1
    # namespaced tables still publish their bare alias (tracked, not parsed)
    router.execute("SET 'sql.current-catalog' = 'c1'")
    router.execute("SET 'sql.current-database' = 'd1'")
    router.execute("CREATE TABLE alias_t (k INT, PRIMARY KEY (k) NOT ENFORCED)")
    router.execute("INSERT INTO alias_t VALUES (3)")
    assert spark.table("alias_t").count() == 1
    assert spark.table("c1__d1__alias_t").count() == 1


def test_insert_values_upserts_keyed_table(router, spark):
    """INSERT INTO … VALUES goes through the same upsert/bucket path as
    INSERT … SELECT: literal re-inserts of an existing PK replace the row."""
    router.execute(
        "CREATE TABLE kv (k STRING, v BIGINT, "
        "PRIMARY KEY (k) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS"
    )
    router.execute("INSERT INTO kv VALUES ('a', 1), ('b', 2)")
    router.execute("INSERT INTO kv VALUES ('a', 99)")
    rows = {r.k: r.v for r in spark.table("kv").collect()}
    assert rows == {"a": 99, "b": 2}
    # literal ints were cast to the declared BIGINT
    assert dict(spark.table("kv").dtypes)["v"] == "bigint"


def test_create_if_not_exists_preserves_data(router, spark):
    router.execute("CREATE TABLE ine_t (id INT, PRIMARY KEY (id) NOT ENFORCED)")
    router.execute("INSERT INTO ine_t VALUES (1), (2)")
    # IF NOT EXISTS on an existing table is a no-op — data survives
    router.execute("CREATE TABLE IF NOT EXISTS ine_t (id INT)")
    assert spark.table("ine_t").count() == 2
    # plain CREATE of an existing table errors (Flink semantics)
    with pytest.raises(ValueError, match="already exists"):
        router.execute("CREATE TABLE ine_t (id INT)")


def test_nested_composite_types():
    assert _map_type("ROW<a MAP<STRING, INT>, b INT>") == (
        "struct<a: map<string,int>, b: int>"
    )
    assert _map_type("MAP<STRING, ROW<x INT, y INT>>") == (
        "map<string,struct<x: int, y: int>>"
    )
    assert _map_type("ARRAY<ROW<a INT, b STRING>>") == (
        "array<struct<a: int, b: string>>"
    )


def test_ctas_show_describe(router, spark):
    """CTAS + SHOW TABLES + DESCRIBE — the lab's exploration workflow."""
    router.execute(
        "CREATE TABLE big_orders WITH ('changelog.mode' = 'append') AS "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 200000"
    )
    n = spark.table("big_orders").count()
    want = spark.table("orders").filter(F.col("o_totalprice") > 200000).count()
    assert n == want
    meta = router.catalog.get("big_orders")
    assert meta.changelog_mode == "append"
    assert meta.schema is not None and len(meta.schema.fields) == 2
    shown = {r.table_name for r in router.execute("SHOW TABLES").collect()}
    assert "big_orders" in shown
    desc = {r.col_name: r for r in router.execute("DESCRIBE big_orders").collect()}
    assert desc["o_totalprice"].data_type == "double"
    # DESCRIBE surfaces PK + watermark markers from the Flink-side catalog
    router.execute(
        "CREATE TABLE desc_keyed (id STRING, ts TIMESTAMP(3), "
        "PRIMARY KEY (id) NOT ENFORCED)"
    )
    router.execute("ALTER TABLE desc_keyed MODIFY WATERMARK FOR `ts` AS `ts`")
    d2 = {r.col_name: r for r in router.execute("DESCRIBE desc_keyed").collect()}
    assert d2["id"].primary_key and not d2["id"].watermark
    assert d2["ts"].watermark and not d2["ts"].primary_key


def test_temporal_join_requires_versioned_contract(router, spark):
    """FOR SYSTEM_TIME AS OF demands PRIMARY KEY + WATERMARK on the
    versioned side (Flink's contract) — the router refuses otherwise,
    and rewrites to the validity-interval join when satisfied."""
    spark.table("events").select("user_id", "ts", "value").createOrReplaceTempView(
        "rates_v"
    )
    with pytest.raises(ValueError, match="PRIMARY KEY \\+ WATERMARK"):
        router.execute(
            "SELECT o.user_id FROM events o "
            "JOIN rates_v FOR SYSTEM_TIME AS OF o.ts AS r "
            "ON o.user_id = r.user_id"
        )
    meta = router.catalog.get_or_create("rates_v")
    meta.primary_key = ["user_id"]
    router.execute("ALTER TABLE rates_v MODIFY WATERMARK FOR `ts` AS `ts`")
    out = router.execute(
        "SELECT o.event_id, o.ts, r.value AS rate_value FROM events o "
        "INNER JOIN rates_v FOR SYSTEM_TIME AS OF o.ts AS r "
        "ON o.user_id = r.user_id AND r.ts <= o.ts"
    )
    n = out.count()
    assert n > 0
    # each left row matches at most one version
    assert n <= spark.table("events").count()


def test_cross_join_unnest_rewrite(router, spark):
    """Flink's CROSS JOIN UNNEST(arr) AS a(x) == LATERAL VIEW explode:
    same Generate operator, map-side expansion."""
    out = router.execute(
        "SELECT o_orderkey, tag FROM (SELECT o_orderkey, "
        "split(o_orderpriority, '-') AS tags FROM orders) "
        "CROSS JOIN UNNEST(tags) AS t (tag)"
    )
    rows = out.collect()
    n_orders = spark.table("orders").count()
    assert len(rows) >= n_orders  # every order expands to >= 1 tag
    assert {type(r.tag) for r in rows} == {str}


def test_explain_rewrites_dialect(router):
    """EXPLAIN of a window-TVF statement goes through the same rewrite
    passes, so users can inspect the Spark plan for lab-dialect SQL."""
    out = router.execute(
        "EXPLAIN SELECT window_start, COUNT(*) AS n FROM "
        "TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
        "GROUP BY window_start"
    ).collect()
    plan_text = out[0][0]
    assert "Aggregate" in plan_text or "HashAggregate" in plan_text


def test_execute_script_multi_statement(router, spark):
    """A lab .sql script replays end-to-end: comments stripped, literal
    semicolons preserved inside strings, statements run in order."""
    results = router.execute_script(
        """
        -- create the keyed sink; note the quoted ';' must not split
        CREATE TABLE script_t (id STRING, note STRING,
                               PRIMARY KEY (id) NOT ENFORCED);
        INSERT INTO script_t VALUES ('a', 'x;y'), ('b', 'z');
        INSERT INTO script_t VALUES ('a', 'updated');
        SELECT * FROM script_t ORDER BY id
        """
    )
    rows = results[-1].collect()
    assert [(r.id, r.note) for r in rows] == [("a", "updated"), ("b", "x;y")] or [
        (r.id, r.note) for r in rows
    ] == [("a", "updated"), ("b", "z")]


def test_match_recognize_adjacent_subset_lowers(router):
    """The adjacent-sequence subset now executes through the LEAD-chain
    lowering (plans/match_recognize.py) instead of raising."""
    df = router.execute(
        "SELECT * FROM events MATCH_RECOGNIZE (PARTITION BY user_id "
        "ORDER BY ts MEASURES A.ts AS a_ts PATTERN (A B) DEFINE "
        "A AS A.event_type = 'view', B AS B.event_type = 'purchase')"
    )
    assert df.columns == ["user_id", "a_ts"]
    df.collect()  # executes without error


def test_match_recognize_guard(router):
    # unbounded quantifiers, quantified alternation groups, nested
    # groups, and PERMUTE up to 8 variables all lower now (5-8 through
    # the matched-set automaton, round 11); an over-wide PERMUTE
    # (9 variables, 512 matched-set states) stays outside the cap with
    # the instructive error
    with pytest.raises(NotImplementedError, match="pattern_funnel"):
        router.execute(
            "SELECT * FROM events MATCH_RECOGNIZE (PARTITION BY user_id "
            "ORDER BY ts MEASURES A.ts AS a_ts "
            "PATTERN (PERMUTE (A, B, C, D, E, G, H, J, K)) DEFINE "
            "A AS A.event_type = 'view', B AS B.event_type = 'purchase', "
            "C AS C.event_type = 'error', D AS D.event_type = 'click', "
            "E AS E.event_type = 'signup', G AS G.event_type = 'view', "
            "H AS H.event_type = 'click', J AS J.event_type = 'view', "
            "K AS K.event_type = 'click')"
        )


def test_string_literals_survive_rewrites(router, spark):
    """Dialect rewrites must never alter string-literal CONTENTS: a
    literal that looks like a qualified reference or TVF text passes
    through byte-identical."""
    row = router.execute(
        "SELECT 'FROM a.b.c' AS s1, 'CROSS JOIN UNNEST(x) AS t (y)' AS s2, "
        "COUNT(*) AS n FROM events GROUP BY 1, 2"
    ).collect()[0]
    assert row.s1 == "FROM a.b.c"
    assert row.s2 == "CROSS JOIN UNNEST(x) AS t (y)"


def test_show_create_table_roundtrips(router, spark):
    """SHOW CREATE TABLE reconstructs DDL a fresh router ACCEPTS — the
    export/recreate loop a lab user needs. The regenerated table carries
    the same PK, buckets, and changelog mode."""
    router.execute(
        "CREATE TABLE sct_t (id STRING, ts TIMESTAMP(3), amount DOUBLE, "
        "PRIMARY KEY (id) NOT ENFORCED) DISTRIBUTED INTO 2 BUCKETS "
        "WITH ('changelog.mode' = 'upsert')"
    )
    router.execute("ALTER TABLE sct_t MODIFY WATERMARK FOR `ts` AS `ts`")
    ddl = router.execute("SHOW CREATE TABLE sct_t").collect()[0].create_statement
    assert "PRIMARY KEY (`id`) NOT ENFORCED" in ddl
    assert "DISTRIBUTED INTO 2 BUCKETS" in ddl
    assert "'changelog.mode' = 'upsert'" in ddl
    assert "MODIFY WATERMARK FOR `ts`" in ddl
    # round trip: a fresh router executes the reconstructed script
    other = StatementRouter(spark)
    for stmt in ddl.replace("`sct_t`", "sct_t2").split(";"):
        other.execute(stmt)
    m2 = other.catalog.get("sct_t2")
    assert m2.primary_key == ["id"]
    assert m2.buckets == 2
    assert m2.watermark_col == "ts"


def test_explain_match_recognize(router, spark):
    """EXPLAIN over a MATCH_RECOGNIZE statement lowers the pattern first,
    so the user sees the actual LEAD-chain plan instead of a parse
    error."""
    spark.range(10).selectExpr(
        "id AS user_id", "CAST(id AS TIMESTAMP) AS ts",
        "CASE WHEN id % 2 = 0 THEN 'view' ELSE 'click' END AS event_type"
    ).createOrReplaceTempView("__mr_explain_t")
    out = router.execute(
        """
        EXPLAIN SELECT user_id, a_ts FROM __mr_explain_t
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts
            MEASURES A.ts AS a_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
        )
        """
    )
    text = out.collect()[0][0]
    assert "__mr_lowered" in text or "Window" in text


def test_tvf_window_time_column(spark):
    """Flink window TVFs also emit window_time = window_end - 1ms (the
    window's event-time attribute); all four TVF rewrites expose it."""
    import datetime

    from training_flink_sql_cc_src_spark.plans.router import StatementRouter

    rows = [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 00:40:00")]
    spark.createDataFrame(rows, "k int, ts_s string").selectExpr(
        "k", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("__wt_events")
    r = StatementRouter(spark)
    for tvf in (
        "TUMBLE(TABLE __wt_events, DESCRIPTOR(ts), INTERVAL '1' HOUR)",
        "HOP(TABLE __wt_events, DESCRIPTOR(ts), INTERVAL '30' MINUTES, "
        "INTERVAL '1' HOUR)",
        "CUMULATE(TABLE __wt_events, DESCRIPTOR(ts), "
        "INTERVAL '30' MINUTES, INTERVAL '1' HOUR)",
        "SESSION(TABLE __wt_events PARTITION BY k, DESCRIPTOR(ts), "
        "INTERVAL '10' MINUTES)",
    ):
        got = r.execute(
            f"SELECT window_start, window_end, window_time, COUNT(*) AS n "
            f"FROM TABLE({tvf}) "
            f"GROUP BY window_start, window_end, window_time"
        ).collect()
        assert got, tvf
        for row in got:
            assert row.window_time == row.window_end - datetime.timedelta(
                milliseconds=1
            ), tvf


def test_statement_set_multi_insert(router, spark):
    """Flink's EXECUTE STATEMENT SET BEGIN <INSERT>; ...; END (the
    multi-insert job form the labs use to co-plan sinks): the router
    runs the inner INSERTs in order through the same catalog, so a
    later statement reading an earlier sink sees its rows — the
    depends_on DAG contract of EP3. Also exercised through
    execute_script, whose semicolon splitter must NOT tear the block
    apart."""
    router.execute(
        "CREATE TABLE ss_a (k INT, v STRING, PRIMARY KEY (k) NOT ENFORCED)"
    )
    router.execute(
        "CREATE TABLE ss_b (k INT, v STRING, PRIMARY KEY (k) NOT ENFORCED)"
    )
    router.execute(
        """
        EXECUTE STATEMENT SET BEGIN
        INSERT INTO ss_a VALUES (1, 'one'), (2, 'two');
        INSERT INTO ss_b SELECT k, UPPER(v) FROM ss_a;
        END
        """
    )
    assert {tuple(r) for r in spark.table("ss_b").collect()} == {
        (1, "ONE"),
        (2, "TWO"),
    }
    # the same block inside a multi-statement script (splitter merge)
    results = router.execute_script(
        """
        CREATE TABLE ss_c (k INT, v STRING, PRIMARY KEY (k) NOT ENFORCED);
        STATEMENT SET BEGIN
        INSERT INTO ss_c SELECT k, v FROM ss_a;
        INSERT INTO ss_c VALUES (3, 'three');
        END;
        """
    )
    assert len(results) == 2
    got = {tuple(r) for r in spark.table("ss_c").collect()}
    assert got == {(1, "one"), (2, "two"), (3, "three")}


def test_alter_add_and_drop_columns(spark):
    """Flink schema evolution beyond the attested MODIFY retype:
    ALTER TABLE ... ADD (col TYPE, ...) appends NULL-backfilled
    physical columns (top-level comma split, so DECIMAL(10,2)
    parses); ALTER ... DROP removes one — refusing PRIMARY KEY
    columns exactly as Flink does."""
    import pytest

    from training_flink_sql_cc_src_spark.plans.router import StatementRouter

    router = StatementRouter(spark)
    router.execute(
        "CREATE TABLE ev_tbl (k INT, v STRING, "
        "PRIMARY KEY (k) NOT ENFORCED)"
    )
    router.execute("INSERT INTO ev_tbl VALUES (1, 'one')")
    router.execute(
        "ALTER TABLE ev_tbl ADD (price DECIMAL(10,2), note STRING)"
    )
    rows = spark.table("ev_tbl").collect()
    assert rows[0]["price"] is None and rows[0]["note"] is None
    assert dict(spark.table("ev_tbl").dtypes)["price"] == "decimal(10,2)"
    # new column is INSERT-able after the evolution
    router.execute(
        "INSERT INTO ev_tbl VALUES (2, 'two', 9.50, 'n')"
    )
    got = {
        (r["k"], r["v"], str(r["price"]), r["note"])
        for r in spark.table("ev_tbl").collect()
    }
    assert got == {(1, "one", "None", None), (2, "two", "9.50", "n")}
    # single bare item (no parens)
    router.execute("ALTER TABLE ev_tbl ADD flag BOOLEAN")
    assert "flag" in spark.table("ev_tbl").columns
    # DROP a plain column; PRIMARY KEY columns refuse
    router.execute("ALTER TABLE ev_tbl DROP (note)")
    assert "note" not in spark.table("ev_tbl").columns
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        router.execute("ALTER TABLE ev_tbl DROP k")
    with pytest.raises(ValueError, match="unsupported item"):
        router.execute("ALTER TABLE ev_tbl ADD (c2 AS k + 1)")
    with pytest.raises(ValueError, match="exists"):
        router.execute("ALTER TABLE ev_tbl ADD (v STRING)")
