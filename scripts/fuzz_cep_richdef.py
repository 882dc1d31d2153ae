"""Differential fuzz for RICH cross-variable DEFINEs (round 12): random
bounded patterns whose DEFINEs carry arithmetic expressions over
partial-match references run through BOTH lowerings — the LEAD chain
(rich support since round 6) and the generator NFA (rich support round
12, forced via SPARK_GRAFT_CEP_FORCE_NFA=1) — and must produce
identical matches. The LEAD chain is the reference: its variant
enumeration evaluates the same SQL expression JVM-side, so any
divergence is a bug in compile_rich_cross / eval_rich_cross or in the
NFA's preference order.

Usage: python scripts/fuzz_cep_richdef.py [n_cases] [seed]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from training_flink_sql_cc_src_spark.plans.router import (  # noqa: E402
    StatementRouter,
)
from training_flink_sql_cc_src_spark.session import get_spark  # noqa: E402

TYPES = ["view", "click", "purchase", "error"]


def _frame(spark, rng):
    rows = []
    for i in range(240):
        rows.append(
            (
                i % 8,
                i,
                f"2024-01-01 {i // 60 % 24:02d}:{i % 60:02d}:00",
                TYPES[rng.randrange(4)],
                round(rng.uniform(0, 100), 2),
            )
        )
    return spark.createDataFrame(
        rows,
        "user_id int, event_id int, ts_s string, event_type string, "
        "value double",
    ).selectExpr(
        "user_id", "event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
        "event_type", "value"
    )


def _rich_part(rng, v, others):
    """One rich conjunct for variable v referencing earlier vars."""
    op = rng.choice(["<", "<=", ">", ">=", "<>"])
    x = rng.choice(others)
    c = rng.choice([0.25, 0.5, 1, 2])
    k = rng.randrange(-20, 80)
    form = rng.randrange(4)
    if form == 0:
        nav = rng.choice(["FIRST", "LAST"])
        return f"{v}.value {op} {nav}({x}.value) * {c} + {k}"
    if form == 1:
        return f"{v}.value + LAST({x}.value) {op} {k}"
    if form == 2:
        # % with a frequently-NEGATIVE dividend: SQL MOD is
        # dividend-sign (-7 % 3 = -1) while Python's is divisor-sign
        # (-7 % 3 = 2); the NFA leg must match the LEAD chain's
        # Spark-SQL semantics (ADVICE r12)
        m = rng.choice([3, 5, 7])
        return f"({v}.value - {k}) % {m} {op} LAST({x}.value) % {m} - 1"
    y = rng.choice(others)
    return (
        f"{v}.value {op} (FIRST({x}.value) + LAST({y}.value)) / 2 + {k}"
    )


def main(n_cases: int = 150, seed: int = 7) -> int:
    rng = random.Random(seed)
    spark = get_spark("fuzz-richdef")
    spark.sparkContext.setLogLevel("ERROR")
    _frame(spark, rng).createOrReplaceTempView("__richdef_ev")
    router = StatementRouter(spark)
    failures = 0
    for case in range(n_cases):
        n_pos = rng.choice([2, 3, 3, 4])
        vs = ["A", "B", "C", "D"][:n_pos]
        terms = []
        for i, v in enumerate(vs[:-1]):
            if i > 0 and rng.random() < 0.6:
                lo = rng.randrange(0, 2)
                hi = rng.randrange(max(lo, 1), 3)
                lazy = "?" if rng.random() < 0.25 else ""
                terms.append(f"{v}{{{lo},{hi}}}{lazy}")
            else:
                terms.append(v)
        terms.append(vs[-1])  # required plain tail
        defines = [f"A AS A.event_type = '{rng.choice(TYPES)}'"]
        for i, v in enumerate(vs[1:], start=1):
            parts = []
            if rng.random() < 0.5:
                parts.append(f"{v}.event_type <> '{rng.choice(TYPES)}'")
            parts.append(_rich_part(rng, v, vs[:i] + [v]))
            defines.append(f"{v} AS " + " AND ".join(parts))
        skip = rng.choice(["SKIP TO NEXT ROW", "SKIP PAST LAST ROW"])
        sql = f"""
            SELECT user_id, CAST(a_ts AS LONG) AS a_epoch,
                   CAST(z_ts AS LONG) AS z_epoch
            FROM __richdef_ev
            MATCH_RECOGNIZE (
                PARTITION BY user_id
                ORDER BY ts, event_id
                MEASURES A.ts AS a_ts, {vs[-1]}.ts AS z_ts
                ONE ROW PER MATCH
                AFTER MATCH {skip}
                PATTERN ({' '.join(terms)})
                DEFINE {', '.join(defines)}
            ) AS m
        """
        os.environ.pop("SPARK_GRAFT_CEP_FORCE_NFA", None)
        try:
            lead = sorted(tuple(r) for r in router.execute(sql).collect())
        except (NotImplementedError, Exception) as exc:  # noqa: BLE001
            if "Unsupported" in type(exc).__name__ or isinstance(
                exc, NotImplementedError
            ):
                print(f"SKIP case={case}: {exc}", flush=True)
                continue
            raise
        os.environ["SPARK_GRAFT_CEP_FORCE_NFA"] = "1"
        try:
            nfa = sorted(tuple(r) for r in router.execute(sql).collect())
        finally:
            os.environ.pop("SPARK_GRAFT_CEP_FORCE_NFA", None)
        if lead != nfa:
            failures += 1
            print(
                f"MISMATCH case={case} pattern={' '.join(terms)!r} "
                f"defines={defines!r} skip={skip!r}\n"
                f"  lead={lead[:6]}\n  nfa ={nfa[:6]}",
                flush=True,
            )
        if (case + 1) % 25 == 0:
            print(
                f"... {case + 1}/{n_cases} ({failures} failures)",
                flush=True,
            )
    print(f"DONE: {n_cases} cases, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sys.exit(main(n, s))
