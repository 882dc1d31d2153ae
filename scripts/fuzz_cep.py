"""Adversarial CEP fuzz: random supported patterns vs Python's re engine.

Python re is an INDEPENDENT leftmost-greedy backtracking matcher with the
same preference semantics SQL row patterns specify (greedy/lazy
quantifiers, first-alternative) — so for eq-literal DEFINEs over a char
column, per-start match spans must agree exactly.

Grammar covered (round 7 widened): sequences, alternation groups, nested
groups, all quantifier forms incl. reluctant, WITHIN, both skip modes,
AFTER MATCH SKIP TO FIRST/LAST <var> (reference models the resume walk
and the Flink loop-forever error), PATTERN (PERMUTE (...)) (reference =
alternation over permutations in listed order, SQL:2016 preference), and
{- X -} exclusions (comparison is the exact emitted row set per match,
not just the span, so output suppression is verified row-for-row).

Because every DEFINE is an eq-literal on a per-variable DISTINCT char,
the row->variable mapping of any match is recoverable from the input
chars alone — which is what lets the reference model SKIP TO targets and
exclusion sets without instrumenting the regex.
"""
import itertools
import random
import sys

sys.path.insert(0, ".")
import re as pyre

from training_flink_sql_cc_src_spark.plans.match_recognize import (
    UnsupportedPatternError,
)
from training_flink_sql_cc_src_spark.plans.router import StatementRouter
from training_flink_sql_cc_src_spark.session import get_spark

VARS = ["A", "B", "C", "D"]
CHARS = {"A": "a", "B": "b", "C": "c", "D": "d"}
# wider variable pool for PERMUTE (the matched-set automaton lowers up
# to 8); the sequential grammar keeps the 4-variable pool so quantified
# shapes stay within the LEAD-chain caps
PERM_VARS = ["A", "B", "C", "D", "E", "G", "H"]
PERM_CHARS = dict(CHARS, E="e", G="g", H="h")


def rand_pattern(rng, depth=0):
    """Return (engine_pattern, py_regex, used_vars, excluded_vars)."""
    n_terms = rng.randint(2, 3) if depth == 0 else rng.randint(1, 2)
    terms, regexes, used = [], [], []
    excluded: set[str] = set()
    avail = [v for v in VARS]
    rng.shuffle(avail)
    for _ in range(n_terms):
        kind = rng.random()
        excludable = None
        if kind < 0.55 or depth >= 2 or len(avail) < 2:
            if not avail:
                break
            v = avail.pop()
            used.append(v)
            base_e, base_r = v, CHARS[v]
            excludable = v
        elif kind < 0.8:
            # alternation group of single vars
            k = min(2, len(avail))
            vs = [avail.pop() for _ in range(k)]
            used += vs
            base_e = "(" + "|".join(vs) + ")"
            base_r = "(?:" + "|".join(CHARS[v] for v in vs) + ")"
        else:
            # nested sequence group
            sub_e, sub_r, sub_used, sub_excl = rand_pattern(rng, depth + 1)
            for v in sub_used:
                if v in avail:
                    avail.remove(v)
            used += sub_used
            excluded |= sub_excl
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
        term_e = base_e + quant
        if excludable is not None and rng.random() < 0.2:
            # {- X -} / {- X+ -}: matched normally, rows suppressed
            term_e = "{- " + term_e + " -}"
            excluded.add(excludable)
        terms.append(term_e)
        regexes.append(base_r + quant)
    if not terms:
        v = avail.pop() if avail else "A"
        used.append(v)
        terms, regexes = [v], [CHARS[v]]
    return " ".join(terms), "".join(regexes), used, excluded


def wide_pattern(rng):
    """Bounded pattern whose alternation-choice x quantifier-length
    product exceeds the 64-variant / 12-row LEAD-chain budget — the
    round-11 re-route through the generator NFA (previously a loud
    UnsupportedPatternError). Counts >= 5 per quantified position force
    the product over the cap; a required tail variable keeps min_len
    >= 1. The reference regex is the same bounded expression, so the
    NFA's greedy/reluctant preference is cross-checked exactly."""
    while True:
        k = rng.choice([2, 2, 3])
        vs = rng.sample(VARS, k + 1)
        terms, regexes = [], []
        n_variants, max_len = 1, 1  # required tail contributes 1 row
        for v in vs[:-1]:
            lo = rng.randint(0, 2)
            hi = rng.randint(lo + 4, 8)
            lazy = "?" if rng.random() < 0.3 else ""
            terms.append("%s{%d,%d}%s" % (v, lo, hi, lazy))
            regexes.append("%s{%d,%d}%s" % (CHARS[v], lo, hi, lazy))
            n_variants *= hi - lo + 1
            max_len += hi
        # ADVICE r11: k=2 draws like A{0,4} B{0,4} C give 25 variants /
        # 9 rows and stay on the LEAD-chain path, so part of the "wide"
        # slice never reached the NFA re-route it exists to test.
        # Regenerate until the product really exceeds the 64-variant /
        # 12-row LEAD budget (the engine's cap in plans/match_recognize).
        if n_variants > 64 or max_len > 12:
            break
    tail = vs[-1]
    terms.append(tail)
    regexes.append(CHARS[tail])
    return " ".join(terms), "".join(regexes), vs, set()


def permute_pattern(rng):
    """PATTERN (PERMUTE (X, Y[, ...])): reference is the alternation of
    all orderings with listed-order (lexicographic) preference — exactly
    what itertools.permutations + first-alternative regex preference
    gives. k <= 4 exercises the LEAD-chain lowering, k >= 5 the
    matched-set automaton node (round 11; reference regex stays the
    explicit k! alternation, so the automaton is cross-checked against
    the factorial semantics it replaced)."""
    k = rng.choice([2, 2, 3, 3, 4, 5, 5, 6, 7])
    vs = rng.sample(PERM_VARS, k)
    pat_e = "PERMUTE (" + ", ".join(vs) + ")"
    pat_r = (
        "(?:"
        + "|".join(
            "".join(PERM_CHARS[v] for v in p)
            for p in itertools.permutations(vs)
        )
        + ")"
    )
    return pat_e, pat_r, vs, set()


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
        roll = rng.random()
        if roll < 0.12:
            pat_e, pat_r, used, excl = permute_pattern(rng)
        elif roll < 0.22:
            pat_e, pat_r, used, excl = wide_pattern(rng)
        else:
            pat_e, pat_r, used, excl = rand_pattern(rng)
        if len(set(used)) != len(used) or not min_len_ok(pat_r):
            continue
        defines = ", ".join(
            f"{v} AS {v}.et = '{PERM_CHARS[v]}'" for v in sorted(set(used))
        )
        alphabet = [PERM_CHARS[v] for v in used] + ["x"]
        # ~30% of cases: THREE partitions incl. a NULL key (a NULL
        # partition key is its own group — the round-8 null-safe
        # skip-filter join contract), each with independent data
        multi = rng.random() < 0.3
        keys = [1, None, 2] if multi else [1]
        def _key_string():
            n = rng.randint(max(3, len(used)), 14 + 2 * len(used))
            chars = [rng.choice(alphabet) for _ in range(n)]
            if len(used) >= 5 and rng.random() < 0.7:
                # wide PERMUTE: a random-ordered full variable window,
                # spliced in so the matched-set automaton actually fires
                # (uniform draws almost never produce a 5-7 permutation)
                perm = [PERM_CHARS[v] for v in used]
                rng.shuffle(perm)
                at = rng.randint(0, max(0, n - len(perm)))
                chars[at:at + len(perm)] = perm
            return "".join(chars)

        key_types = {k: _key_string() for k in keys}
        tried += 1
        # skip mode: NEXT ROW / PAST LAST ROW / TO FIRST|LAST <var>
        sk = rng.random()
        if sk < 0.35:
            skip_mode = ("NEXT",)
        elif sk < 0.7:
            skip_mode = ("PAST",)
        else:
            skip_mode = (rng.choice(["FIRST", "LAST"]), rng.choice(used))
        if skip_mode[0] == "NEXT":
            skip_sql = "SKIP TO NEXT ROW"
        elif skip_mode[0] == "PAST":
            skip_sql = "SKIP PAST LAST ROW"
        else:
            skip_sql = f"SKIP TO {skip_mode[0]} {skip_mode[1]}"
        # WITHIN k seconds with ts = seq seconds: only rows s..s+k are
        # reachable from start s — the reference matches against the
        # TRUNCATED input (greedy behavior beyond the horizon included)
        within = rng.randint(1, 6) if rng.random() < 0.3 else None
        rows, seq_off, off = [], {}, 0
        for k in keys:
            seq_off[k] = off
            for i, tch in enumerate(key_types[k]):
                rows.append((k, off + i, tch))
            off += len(key_types[k])
        spark.createDataFrame(
            rows, "user_id int, seq int, et string"
        ).selectExpr(
            "user_id", "seq", "et",
            "timestamp_seconds(seq) AS ts"
        ).createOrReplaceTempView("__fuzz")
        engine_err = None
        got_rows = []
        try:
            got_rows = router.execute(
                f"""
                SELECT user_id, seq, mn FROM __fuzz
                MATCH_RECOGNIZE (
                    PARTITION BY user_id
                    ORDER BY ts, seq
                    MEASURES MATCH_NUMBER() AS mn
                    ALL ROWS PER MATCH
                    AFTER MATCH {skip_sql}
                    PATTERN ({pat_e})
                    {f"WITHIN INTERVAL '{within}' SECOND" if within else ''}
                    DEFINE {defines}
                )
                """
            ).collect()
        except (NotImplementedError, UnsupportedPatternError) as e:
            print(f"SKIP unsupported: {pat_e!r}: {e}", flush=True)
            continue
        except Exception as e:  # runtime loop-forever walk error
            if "loop forever" in str(e):
                engine_err = "loop"
            else:
                failures += 1
                print(
                    f"ENGINE ERROR pattern={pat_e!r} skip={skip_sql!r} "
                    f"types={types!r}: {e}",
                    flush=True,
                )
                continue
        # got: exact emitted row set per match (exclusions suppress
        # rows), keyed (partition, match_number)
        spans = {}
        for r in got_rows:
            spans.setdefault((r.user_id, r.mn), []).append(r.seq)
        got = sorted(tuple(sorted(v)) for v in spans.values())
        rx = pyre.compile(pat_r)
        excl_chars = {PERM_CHARS[v] for v in excl}

        def expected_for(ktypes: str):
            """Per-partition reference: (kept spans, want_err)."""
            per_start = {}
            for st in range(len(ktypes)):
                hay = (
                    ktypes if within is None else ktypes[: st + within + 1]
                )
                m = rx.match(hay, st)
                if m and m.end() > st:
                    per_start[st] = m.end() - 1
            if skip_mode[0] == "NEXT":
                return sorted(per_start.items()), None
            # shared walk: keep a match when it starts at/after the
            # resume cursor; the skip mode decides the next cursor
            kept, cur = [], 0
            for st in sorted(per_start):
                if st < cur:
                    continue
                e = per_start[st]
                kept.append((st, e))
                if skip_mode[0] == "PAST":
                    cur = e + 1
                else:
                    nav, tvar = skip_mode
                    vpos = [
                        j
                        for j in range(st, e + 1)
                        if ktypes[j] == PERM_CHARS[tvar]
                    ]
                    if not vpos:
                        # target unmatched: resume past the end
                        cur = e + 1
                        continue
                    t = vpos[0] if nav == "FIRST" else vpos[-1]
                    if t <= st:
                        # resume target IS the match start: the engine
                        # raises Flink's loop-forever error
                        return kept, "loop"
                    cur = t
            return kept, None

        want, want_err = [], None
        for k in keys:
            kept, err = expected_for(key_types[k])
            if err:
                want_err = err
                break
            for st, e in kept:
                emitted = tuple(
                    seq_off[k] + j
                    for j in range(st, e + 1)
                    if key_types[k][j] not in excl_chars
                )
                if emitted:
                    want.append(emitted)
        if engine_err or want_err:
            if engine_err != want_err:
                failures += 1
                print(
                    f"ERROR MISMATCH pattern={pat_e!r} skip={skip_sql!r} "
                    f"types={key_types!r}: engine={engine_err} "
                    f"want={want_err}",
                    flush=True,
                )
            tried_tick(tried, n_cases, failures)
            continue
        want.sort()
        if got != want:
            failures += 1
            print(
                f"MISMATCH pattern={pat_e!r} regex={pat_r!r} "
                f"skip={skip_sql!r} types={key_types!r}\n"
                f"  got ={got}\n  want={want}",
                flush=True,
            )
        tried_tick(tried, n_cases, failures)
    print(f"DONE: {tried} cases, {failures} failures", flush=True)
    return 1 if failures else 0


def tried_tick(tried, n_cases, failures):
    if tried % 25 == 0:
        print(f"... {tried}/{n_cases} ({failures} failures)", flush=True)


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]), int(sys.argv[2])))
