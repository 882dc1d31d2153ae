"""Round-15 optimization profiler (guide §1): for each headline query,
dump .explain("formatted") to plans/r16/<name>_<tag>.txt and time the
query isolated with the noop sink (same cold-cache hygiene as bench.py's
run_one). Output: one JSON line per query on stdout + a summary file.

Usage:
    python scripts/profile_r16.py <tag> [name ...]

<tag> is 'before' or 'after'; names default to the full HEADLINE tuple.
Timing here is a 2-sample min (cheap, for targeting); the canonical
numbers remain bench.py's 3-sweep run.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, run_one  # noqa: E402
from training_flink_sql_cc_src_spark.registry import all_queries  # noqa: E402
from training_flink_sql_cc_src_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)
SAMPLES = int(os.environ.get("SPARK_GRAFT_PROFILE_SAMPLES", "2"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("spark-graft-profile-r16")
    queries = all_queries()
    # same untimed maintenance as bench.py: fresh on-disk token sketch
    from training_flink_sql_cc_src_spark.queries.llm_dedup import (
        _token_sketch,
    )

    _token_sketch(spark, SF_DIR)
    run_one(spark, queries["s6_orders_enriched_join"], SF_DIR)  # warm-up
    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # plan capture (construction may run bounded driver-side jobs,
        # e.g. kmeans seed collects — that is part of the query)
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        del df
        best = float("inf")
        for _ in range(SAMPLES):
            best = min(best, run_one(spark, fn, SF_DIR))
        out[name] = round(best, 3)
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    # merge into the existing summary (repeated partial captures must
    # not drop earlier queries' numbers)
    spath = os.path.join(PLANS_DIR, f"profile_{tag}.json")
    merged = {}
    if os.path.exists(spath):
        with open(spath) as fh:
            merged = json.load(fh)
    merged.update(out)
    with open(spath, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(json.dumps({"total_min_sum": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
