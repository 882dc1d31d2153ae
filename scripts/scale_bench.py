"""Scaling leg of the bench contract (VERDICT r15 Next #3): run the
heavy dedup/text subset on a large fixture at two core counts and record
the per-query 8->32 speedup ratio table as a committed artifact.

Why it exists: at sf0.1 every headline query is 0.2-2 s and dominated by
fixed local-mode scheduling overhead, so the 8-core suite total equals
the 32-core total and the ratchet cannot see parallelism regressions
(a driver-side collect, a parallelism-1 stage). This leg runs at a
fixture where cores matter and pins the ratio.

    python scripts/scale_bench.py <sf_dir> <label> [round]

Writes scale_runs/SCALE_BENCH_<label>_r<round>.json. Each leg is its own
bench.py subprocess (master is fixed per JVM), SWEEPS sweeps, same noop
sink and cache hygiene as the driver's run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the queries whose sf3z cost is dominated by real distributed work
#: (pair joins, shuffles, Python stages) — the set prior rounds' scale
#: artifacts tracked, so ratios stay comparable round over round.
HEAVY = (
    "dedup_containment_pairs",
    "dedup_keep_best",
    "dedup_winnow_pairs",
    "dedup_minhash_lsh",
    "dedup_jaccard_blocked_pairs",
    "text_winnow_fingerprints",
    "text_bigram_lm_score",
)

CPU_LEGS = (32, 8)
SWEEPS = int(os.environ.get("SPARK_GRAFT_BENCH_SWEEPS", "2"))


def _steal_pct(dt: float = 4.0) -> float:
    def read():
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals), vals[7] if len(vals) > 7 else 0

    t0, s0 = read()
    time.sleep(dt)
    t1, s1 = read()
    return round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def run_leg(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_BENCH_ONLY": ",".join(HEAVY),
            "SPARK_GRAFT_BENCH_SWEEPS": str(SWEEPS),
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "sf3zipf"
    rnd = sys.argv[3] if len(sys.argv) > 3 else "16"
    steal_before = _steal_pct()
    legs = {}
    for cpus in CPU_LEGS:
        legs[cpus] = run_leg(sf_dir, cpus)
        print(
            f"cpus={cpus}: total={legs[cpus]['value']}s "
            f"{legs[cpus]['queries']}",
            file=sys.stderr,
        )
    steal_after = _steal_pct()
    q32, q8 = legs[32]["queries"], legs[8]["queries"]
    ratios = {
        n: round(q8[n] / q32[n], 2) for n in HEAVY if q32.get(n) and q8.get(n)
    }
    doc = {
        "metric": "scale_bench_core_scaling",
        "unit": "sec",
        "sf_dir": sf_dir,
        "sweeps": SWEEPS,
        "corpus": legs[32].get("corpus"),
        "queries_32": q32,
        "queries_8": q8,
        "total_32": legs[32]["value"],
        "total_8": legs[8]["value"],
        "speedup_8_to_32": ratios,
        "host_steal_pct": {"before": steal_before, "after": steal_after},
    }
    path = os.path.join(
        REPO, "scale_runs", f"SCALE_BENCH_{label}_r{rnd}.json"
    )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"written": path, "speedup_8_to_32": ratios}))


if __name__ == "__main__":
    main()
