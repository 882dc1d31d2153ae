"""Run the driver-style oracle comparison for every registered query.

Usage: python scripts/check_parity.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle_harness import compare_one  # noqa: E402

from training_flink_sql_cc_src_spark.registry import all_oracles, all_queries  # noqa: E402
from training_flink_sql_cc_src_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark("parity-check")
    queries, oracles = all_queries(), all_oracles()
    failed = []
    for name, fn in sorted(queries.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            res = compare_one(spark, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
            failed.append(name)
            continue
        status = "ok  " if res.ok else "FAIL"
        print(
            f"{status} {name}: spark={res.spark_rows} oracle={res.oracle_rows} "
            f"({time.time() - t0:.1f}s) {res.detail}"
        )
        if not res.ok:
            failed.append(name)
            for m in res.mismatches:
                print(f"      row {m[0]}: spark={m[1]!r} duck={m[2]!r}")
    print(f"\n{len(failed)} failures / {len(queries)} queries")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
