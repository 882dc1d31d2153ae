"""Round-close bench gate: run bench.py and FAIL (exit 1) if any headline
query regressed >1.5x vs its best recorded BENCH_r*.json time, unless the
regression is explicitly acknowledged.

Round 2 shipped a 16x phantom regression (host contention captured all
three consecutive samples of agg_pricing_summary) even though the bench
harness printed a warning — the warning had no teeth. This gate is the
teeth: run it before closing a round, and only close on exit 0.

Usage:
    python scripts/bench_gate.py                     # gate the default sf
    python scripts/bench_gate.py --ack q5_region_revenue --ack window_hop
        # close anyway, with named queries acknowledged as genuinely
        # slower (e.g. an intentional plan trade documented in the commit)

Prints the bench JSON line to stdout (pass-through, so the gated run's
numbers are usable) and the verdict to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ack",
        action="append",
        default=[],
        help="query name whose regression is intentional/understood",
    )
    ap.add_argument(
        "--from-json",
        help="gate an existing bench JSON line (file path) instead of re-running",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import best_prior  # noqa: E402

    if args.from_json:
        with open(args.from_json) as fh:
            doc = json.load(fh)
        parsed = doc.get("queries") and doc or doc.get("parsed", doc)
    else:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            print(f"bench_gate: bench.py rc={proc.returncode}", file=sys.stderr)
            return 1
        line = proc.stdout.strip().splitlines()[-1]
        print(line)
        parsed = json.loads(line)

    # corpus-bound ratchets only compare against rounds with the SAME
    # corpus fingerprint (data regenerations reset them — no more
    # carried acks); TPC-H ratchets keep their full history
    prior = best_prior(parsed.get("corpus"), parsed.get("sf"))
    # acknowledged regressions come from the CHECKED-IN reviewed config
    # (scripts/bench_acks.json) or the --ack flag — never from the bench
    # artifact itself, so the run under test cannot self-acknowledge a
    # regression it introduced
    from bench import load_acks  # noqa: E402

    embedded_acks = load_acks()
    bad = []
    for name, now in parsed.get("queries", {}).items():
        before = prior.get(name)
        if not (before and before > 0.2 and now > 1.5 * before):
            continue
        if name in args.ack or name in embedded_acks:
            why = embedded_acks.get(name, "--ack flag")
            print(
                f"bench_gate: ACK {name} {before:.2f}s -> {now:.2f}s "
                f"({why})",
                file=sys.stderr,
            )
            continue
        bad.append((name, before, now))
    if bad:
        for name, before, now in bad:
            print(
                f"bench_gate: FAIL {name} best-prior {before:.2f}s -> "
                f"{now:.2f}s ({now / before:.1f}x) — re-run on a quiet "
                f"host, fix the plan, or --ack with a reason in the commit",
                file=sys.stderr,
            )
        return 1
    print("bench_gate: PASS (no unacknowledged >1.5x regressions)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
