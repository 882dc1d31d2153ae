"""Batch CEP nav fuzz: variant-enumeration path vs general-NFA path.

FIRST/LAST match-binding navigation inside DEFINEs has TWO independent
batch lowerings: flat bounded patterns (``A B{1,3} C``) resolve
navigation per physical offset in the LEAD-chain variant enumeration
(plans/match_recognize._pred_at_offset nav_sub), while nested-group
forms of the SAME pattern (``A (B){1,3} C``) route to the general NFA,
whose cross-check mechanism evaluates the navigation against the
partial match (round 8 — self references included, the defining
variable's mapped-so-far rows contain the current candidate row).
Identical statements modulo the group wrapping must produce identical
matches, so each implementation oracles the other — the same trick the
stream fuzzer uses with batch-vs-stream.

Random flat patterns (1-3 positions after the anchor, bounded
quantifiers, optionals), random OVERLAPPING row-local predicates, and
random navigation conjuncts — self FIRST/LAST([,1]), foreign
FIRST/LAST([,1]) — are run both ways and compared as Counters
(payload measures included). Batch only: partitions finalize at data
end, so no terminator contract applies.

Usage: python scripts/fuzz_cep_navpaths.py [n_cases] [seed]
"""
import random
import sys
from collections import Counter

sys.path.insert(0, ".")

from training_flink_sql_cc_src_spark.plans.router import StatementRouter
from training_flink_sql_cc_src_spark.session import get_spark


def rand_atom(rng, v):
    r = rng.random()
    if r < 0.4:
        return f"{v}.v >= {rng.randint(0, 6)}"
    if r < 0.6:
        return f"{v}.v <= {rng.randint(2, 9)}"
    m = rng.randint(2, 4)
    return f"{v}.v % {m} = {rng.randint(0, m - 1)}"


def rand_nav(rng, v, others):
    """A navigation conjunct for variable v: self or foreign target."""
    tgt = v if (not others or rng.random() < 0.5) else rng.choice(others)
    nav = rng.choice(["FIRST", "LAST"])
    op = rng.choice([">", ">=", "<", "<=", "<>"])
    n = rng.choice(["", "", ", 1"])
    return f"{v}.v {op} {nav}({tgt}.v{n})"


def main(n_cases, seed):
    rng = random.Random(seed)
    spark = get_spark()
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    router = StatementRouter(spark)
    failures = 0
    for tried in range(1, n_cases + 1):
        n_pos = rng.randint(1, 3)
        vars_ = ["A", "B", "C", "D"][: n_pos + 1]
        flat_terms, nested_terms = ["A"], ["A"]
        for v in vars_[1:]:
            q = rng.random()
            if q < 0.3:
                quant = "?"
            elif q < 0.5:
                quant = ""
            else:
                lo = rng.randint(0, 2)
                hi = rng.randint(max(lo, 1), 3)
                quant = "{%d,%d}" % (lo, hi)
            flat_terms.append(v + quant)
            nested_terms.append(f"({v}){quant}" if quant else v)
        defs = {v: rand_atom(rng, v) for v in vars_}
        # 1-2 navigation conjuncts on random variables
        for _ in range(rng.randint(1, 2)):
            v = rng.choice(vars_)
            others = [o for o in vars_ if o != v]
            defs[v] += f" AND {rand_nav(rng, v, others)}"
        defines = ", ".join(f"{v} AS {defs[v]}" for v in vars_)
        skip = rng.choice(["PAST LAST ROW", "TO NEXT ROW"])
        meas = [f"{v}.ts AS t_{v.lower()}" for v in vars_] + [
            f"COUNT({vars_[-1]}.v) AS agv"
        ]
        outer = ["k"] + [
            f"CAST(t_{v.lower()} AS LONG) AS e_{v.lower()}" for v in vars_
        ] + ["agv"]
        if rng.random() < 0.5:
            # FIRST/LAST(V.col, n) MEASURE offsets (round 9): the
            # variant-enumeration lowering picks the (n+1)-th occurrence
            # per variant, the general NFA indexes the mapped-row list —
            # two independent implementations cross-checked here
            mv = rng.choice(vars_)
            mnav = rng.choice(["FIRST", "LAST"])
            moff = rng.choice([1, 1, 2])
            meas.append(f"{mnav}({mv}.v, {moff}) AS moff_v")
            outer.append("moff_v")
        rows = []
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        for ki in range(3):
            n = rng.randint(10, 18)
            for i in range(n):
                rows.append(
                    (f"k{ki}", base + dt.timedelta(seconds=3 * i + ki),
                     rng.randint(0, 9))
                )
        df = spark.createDataFrame(rows, "k string, ts timestamp, v int")
        df.createOrReplaceTempView("__navfuzz")
        tmpl = f"""
            SELECT {', '.join(outer)} FROM __navfuzz
            MATCH_RECOGNIZE (
                PARTITION BY k ORDER BY ts
                MEASURES {', '.join(meas)}
                ONE ROW PER MATCH
                AFTER MATCH SKIP {skip}
                PATTERN ({{pat}})
                DEFINE {defines}
            )
        """
        try:
            flat = Counter(
                tuple(r)
                for r in router.execute(
                    tmpl.format(pat=" ".join(flat_terms))
                ).collect()
            )
            nested = Counter(
                tuple(r)
                for r in router.execute(
                    tmpl.format(pat=" ".join(nested_terms))
                ).collect()
            )
        except Exception as e:
            failures += 1
            print(
                f"ERROR flat={' '.join(flat_terms)!r} "
                f"defines={defines!r}: {e}",
                flush=True,
            )
            continue
        if flat != nested:
            failures += 1
            print(
                f"MISMATCH flat={' '.join(flat_terms)!r} skip={skip!r} "
                f"defines={defines!r}\n"
                f"  flat-only: {flat - nested}\n"
                f"  nested-only: {nested - flat}",
                flush=True,
            )
        if tried % 10 == 0:
            print(f"... {tried}/{n_cases}, {failures} failures", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", prior)
    print(f"DONE {n_cases} cases, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(main(n, s))
