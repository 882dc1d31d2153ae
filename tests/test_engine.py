"""Engine facade: the 'switch from the reference' user story end-to-end —
DDL + TVF query + keyed-table DAG through one object."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.engine import Engine


def test_tvf_query_through_engine(spark, sf_small):
    eng = Engine(spark=spark, sf_dir=sf_small)
    df = eng.sql(
        "SELECT window_start, COUNT(*) AS n FROM "
        "TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
        "GROUP BY window_start"
    )
    rows = df.collect()
    assert sum(r.n for r in rows) == eng.table("events").count()


def test_lab_dag_through_engine(spark, sf_small):
    """S1→S2-shaped flow: create a keyed table, upsert twice, read the
    latest-per-key view."""
    eng = Engine(spark=spark, sf_dir=sf_small)
    dag = eng.pipeline()
    dag.add(
        "create",
        "CREATE TABLE eng_customers_keyed (customer_id BIGINT, "
        "segment STRING, PRIMARY KEY (customer_id) NOT ENFORCED) "
        "DISTRIBUTED INTO 1 BUCKETS",
    )
    dag.add(
        "fill",
        "INSERT INTO eng_customers_keyed "
        "SELECT c_custkey, c_mktsegment FROM customer",
        depends_on=["create"],
    )
    dag.add(
        "overwrite",
        "INSERT INTO eng_customers_keyed "
        "SELECT c_custkey, 'OVERRIDDEN' FROM customer WHERE c_custkey < 10",
        depends_on=["fill"],
    )
    order = dag.run()
    assert order == ["create", "fill", "overwrite"]
    out = eng.table("eng_customers_keyed")
    n_cust = eng.table("customer").count()
    assert out.count() == n_cust  # latest per key, no duplicates
    assert (
        out.filter(F.col("customer_id") < 10)
        .filter(F.col("segment") == "OVERRIDDEN")
        .count()
        == eng.table("customer").filter(F.col("c_custkey") < 10).count()
    )


def test_named_query_through_engine(spark, sf_small):
    eng = Engine(spark=spark, sf_dir=sf_small)
    assert eng.query("q6_forecast_revenue").collect()[0].revenue is not None


def test_list_queries_inventory(spark):
    from training_flink_sql_cc_src_spark.engine import Engine

    inv = Engine(spark).list_queries()
    assert len(inv) >= 120
    assert "s6_orders_enriched_join" in inv
    assert all(isinstance(v, str) for v in inv.values())
