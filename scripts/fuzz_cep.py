"""Adversarial CEP fuzz: random supported patterns vs Python's re engine.

Python re is an INDEPENDENT leftmost-greedy backtracking matcher with the
same preference semantics SQL row patterns specify (greedy/lazy
quantifiers, first-alternative) — so for eq-literal DEFINEs over a char
column, per-start match spans must agree exactly.
"""
import random
import sys

sys.path.insert(0, ".")
import re as pyre

from training_flink_sql_cc_src_spark.plans.router import StatementRouter
from training_flink_sql_cc_src_spark.session import get_spark

VARS = ["A", "B", "C", "D"]
CHARS = {"A": "a", "B": "b", "C": "c", "D": "d"}


def rand_pattern(rng, depth=0):
    """Return (engine_pattern, py_regex, used_vars)."""
    n_terms = rng.randint(2, 3) if depth == 0 else rng.randint(1, 2)
    terms, regexes, used = [], [], []
    avail = [v for v in VARS]
    rng.shuffle(avail)
    for _ in range(n_terms):
        kind = rng.random()
        if kind < 0.55 or depth >= 2 or len(avail) < 2:
            if not avail:
                break
            v = avail.pop()
            used.append(v)
            base_e, base_r = v, CHARS[v]
        elif kind < 0.8:
            # alternation group of single vars
            k = min(2, len(avail))
            vs = [avail.pop() for _ in range(k)]
            used += vs
            base_e = "(" + "|".join(vs) + ")"
            base_r = "(?:" + "|".join(CHARS[v] for v in vs) + ")"
        else:
            # nested sequence group
            sub_e, sub_r, sub_used = rand_pattern(rng, depth + 1)
            for v in sub_used:
                if v in avail:
                    avail.remove(v)
            used += sub_used
            base_e = "(" + sub_e + ")"
            base_r = "(?:" + sub_r + ")"
        q = rng.random()
        if q < 0.45:
            quant = ""
        elif q < 0.6:
            quant = "+"
        elif q < 0.7:
            quant = "*"
        elif q < 0.8:
            quant = "?"
        elif q < 0.9:
            lo = rng.randint(0, 2)
            hi = rng.randint(max(lo, 1), 3)
            quant = "{%d,%d}" % (lo, hi)
        else:
            quant = "{%d,}" % rng.randint(1, 2)
        if quant and rng.random() < 0.25:
            quant += "?"  # reluctant
        terms.append(base_e + quant)
        regexes.append(base_r + quant)
    if not terms:
        v = avail.pop() if avail else "A"
        used.append(v)
        terms, regexes = [v], [CHARS[v]]
    return " ".join(terms), "".join(regexes), used


def min_len_ok(py_regex):
    # at least one required position (engine rejects fully-optional)
    return pyre.match(py_regex, "") is None


def main(n_cases, seed):
    rng = random.Random(seed)
    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    router = StatementRouter(spark)
    failures = 0
    tried = 0
    while tried < n_cases:
        pat_e, pat_r, used = rand_pattern(rng)
        if len(set(used)) != len(used) or not min_len_ok(pat_r):
            continue
        defines = ", ".join(
            f"{v} AS {v}.et = '{CHARS[v]}'" for v in sorted(set(used))
        )
        n = rng.randint(3, 14)
        alphabet = [CHARS[v] for v in used] + ["x"]
        types = "".join(rng.choice(alphabet) for _ in range(n))
        tried += 1
        skip_past = rng.random() < 0.4
        # WITHIN k seconds with ts = seq seconds: only rows s..s+k are
        # reachable from start s — the reference matches against the
        # TRUNCATED input (greedy behavior beyond the horizon included)
        within = rng.randint(1, 6) if rng.random() < 0.3 else None
        rows = [(1, i, t) for i, t in enumerate(types)]
        spark.createDataFrame(
            rows, "user_id int, seq int, et string"
        ).selectExpr(
            "user_id", "seq", "et",
            "timestamp_seconds(seq) AS ts"
        ).createOrReplaceTempView("__fuzz")
        try:
            got_rows = router.execute(
                f"""
                SELECT seq, mn FROM __fuzz
                MATCH_RECOGNIZE (
                    PARTITION BY user_id
                    ORDER BY ts, seq
                    MEASURES MATCH_NUMBER() AS mn
                    ALL ROWS PER MATCH
                    AFTER MATCH {'SKIP PAST LAST ROW' if skip_past else 'SKIP TO NEXT ROW'}
                    PATTERN ({pat_e})
                    {f"WITHIN INTERVAL '{within}' SECOND" if within else ''}
                    DEFINE {defines}
                )
                """
            ).collect()
        except NotImplementedError as e:
            print(f"SKIP unsupported: {pat_e!r}: {e}", flush=True)
            continue
        spans = {}
        for r in got_rows:
            spans.setdefault(r.mn, []).append(r.seq)
        got = sorted((min(v), max(v)) for v in spans.values())
        rx = pyre.compile(pat_r)
        per_start = {}
        for st in range(len(types)):
            hay = types if within is None else types[: st + within + 1]
            m = rx.match(hay, st)
            if m and m.end() > st:
                per_start[st] = m.end() - 1
        if skip_past:
            want, cur = [], 0
            for st in sorted(per_start):
                if st >= cur:
                    want.append((st, per_start[st]))
                    cur = per_start[st] + 1
        else:
            want = sorted(per_start.items())
        if got != want:
            failures += 1
            print(
                f"MISMATCH pattern={pat_e!r} regex={pat_r!r} "
                f"types={types!r}\n  got ={got}\n  want={want}",
                flush=True,
            )
        if tried % 25 == 0:
            print(f"... {tried}/{n_cases} ({failures} failures)", flush=True)
    print(f"DONE: {tried} cases, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]), int(sys.argv[2])))
