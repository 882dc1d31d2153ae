"""Time one registered query end-to-end (noop sink, fresh session,
cold sketch per sweep — the bench.py protocol for a single name).

    python scripts/bench_one.py <sf_dir> <query> [sweeps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from training_flink_sql_cc_src_spark.registry import all_queries
from training_flink_sql_cc_src_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name]
    from bench import run_one
    from training_flink_sql_cc_src_spark.queries.llm_dedup import _token_sketch

    # maintenance step mirrors bench.py: sketch artifact fresh, queries cold
    _token_sketch(spark, sf_dir)
    times = [run_one(spark, fn, sf_dir) for _ in range(sweeps)]
    print(f"{name}: {[round(t, 2) for t in times]} min={min(times):.2f}")


if __name__ == "__main__":
    main()
