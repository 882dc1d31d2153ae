"""UDF-surface tests: pandas UDF results vs pure-python/Spark-native
references (the oracle-exempt entries of queries/udf_surface.py)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.queries._util import t
from training_flink_sql_cc_src_spark.registry import all_queries

QUERIES = all_queries()


def _entropy(s: str) -> float:
    counts: dict[str, int] = {}
    for ch in s:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(s)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def test_pandas_entropy_matches_python(spark, sf_small):
    got = {
        r.doc_id: r.entropy_bits
        for r in QUERIES["pandas_udf_entropy"](spark, sf_small).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in t(spark, sf_small, "documents").select("doc_id", "text").collect()
    }
    assert len(got) == len(texts)
    for doc_id in list(texts)[:50]:
        assert abs(got[doc_id] - _entropy(texts[doc_id])) < 1e-9


def test_grouped_zscore_matches_window_computation(spark, sf_small):
    got = {
        r.doc_id: r.zscore
        for r in QUERIES["pandas_grouped_zscore"](spark, sf_small).collect()
    }
    w = Window.partitionBy("lang")
    want_df = (
        t(spark, sf_small, "documents")
        .select("doc_id", "lang", F.col("n_chars").cast("double").alias("v"))
        .withColumn("mu", F.avg("v").over(w))
        .withColumn("sd", F.stddev_pop("v").over(w))
        .select("doc_id", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("z"))
    )
    want = {r.doc_id: r.z for r in want_df.collect()}
    assert len(got) == len(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_udtf_tokens_roundtrip(spark, sf_small):
    """Token explosion re-aggregates to the original text."""
    out = QUERIES["udtf_explode_tokens"](spark, sf_small)
    rebuilt = (
        out.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "token"))).alias("ts"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform("ts", lambda s: s.token)).alias("text"),
        )
    )
    orig = t(spark, sf_small, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    diff = rebuilt.join(orig, "doc_id").filter(
        rebuilt.text != orig.text
    )
    assert diff.count() == 0
