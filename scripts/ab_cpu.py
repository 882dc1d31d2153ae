"""Noise-robust A/B measurement for optimization work (r15): per query,
record BOTH wall seconds and the CPU seconds consumed by this process
tree (driver python + local JVM + python workers). The sandbox host has
external load waves that poison wall-clock minima; CPU seconds of our
own tree are nearly invariant to them, so plan-level wins/regressions
show up reliably. Canonical numbers remain bench.py wall time.

Usage: python scripts/ab_cpu.py <sweeps> <name> [name ...]
Prints one JSON line: {name: {"wall_min": s, "cpu_min": s}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_one  # noqa: E402
from training_flink_sql_cc_src_spark.registry import all_queries  # noqa: E402
from training_flink_sql_cc_src_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_TICK = os.sysconf("SC_CLK_TCK")


def _descendants() -> set[int]:
    me = os.getpid()
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            kids.setdefault(int(parts[1]), []).append(int(pid))
        except (OSError, IndexError):
            continue
    out, frontier = {me}, [me]
    while frontier:
        nxt = []
        for p in frontier:
            for c in kids.get(p, []):
                if c not in out:
                    out.add(c)
                    nxt.append(c)
        frontier = nxt
    return out


def _tree_cpu() -> float:
    """utime+stime of every live descendant plus this process's reaped
    children (cutime/cstime)."""
    total = 0.0
    for pid in _descendants():
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _TICK
            if pid == os.getpid():
                total += (int(parts[13]) + int(parts[14])) / _TICK
        except (OSError, IndexError):
            continue
    return total


def main() -> None:
    sweeps = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark("ab-cpu-r15")
    queries = all_queries()
    from training_flink_sql_cc_src_spark.queries.llm_dedup import (
        _token_sketch,
    )

    _token_sketch(spark, SF_DIR)
    run_one(spark, queries["s6_orders_enriched_join"], SF_DIR)
    res = {n: {"wall_min": float("inf"), "cpu_min": float("inf")} for n in names}
    for _ in range(sweeps):
        for n in names:
            c0 = _tree_cpu()
            w = run_one(spark, queries[n], SF_DIR)
            c = _tree_cpu() - c0
            res[n]["wall_min"] = round(min(res[n]["wall_min"], w), 3)
            res[n]["cpu_min"] = round(min(res[n]["cpu_min"], c), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
