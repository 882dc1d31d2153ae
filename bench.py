"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full materialization on
executors, no driver collect). One warm-up run of the flagship query
amortizes JVM/codegen startup out of the numbers, mirroring steady-state
throughput on a cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from training_flink_sql_cc_src_spark.registry import all_queries
from training_flink_sql_cc_src_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: the attested flagship join, the heavy agg, each window
#: kind, the hard custom operators (as-of, cumulate), and the [C] pipeline
#: workhorses (blocked jaccard dedup, minhash LSH, brute-force ANN, rollup).
HEADLINE = (
    "s6_orders_enriched_join",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    "agg_pricing_summary",
    "agg_rollup",
    "topn_per_group",
    "window_tumble",
    "window_hop",
    "window_session",
    "window_cumulate",
    "join_interval",
    "join_asof_temporal",
    "dedup_exact_text",
    "dedup_jaccard_blocked_pairs",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_lang_source_rollup",
    "pipeline_corpus_curation",
)


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else -1.0
    spark = get_spark("spark-graft-bench")
    queries = all_queries()
    # warm-up: JVM + codegen + parquet footer caches
    run_one(spark, queries["s6_orders_enriched_join"], SF_DIR)
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: the first run of a heavy query pays one-time JIT /
        # codegen compilation that a long-running cluster job amortizes
        per_query[name] = round(
            min(run_one(spark, queries[name], SF_DIR) for _ in range(2)), 3
        )
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
