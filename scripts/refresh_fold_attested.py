"""Refresh FOLD_ATTESTED.json from the newest committed CORRECTNESS
artifact: for every fold suite (queries/folds.py SPECS) with a green
driver row in that artifact, record the CURRENT member-spec hash as the
attested composition.

Why this exists (VERDICT r13 #1): a fold's hash-checked driver row only
attests the member set it actually hashed. The rotation used to key
last-green on the fold NAME alone, so a fold whose composition changed
after its last green row (pattern_match_recognize_mod_define added to
pattern_mr_fold_binding in r13) kept sorting as "verified r12" and its
new member had zero driver oracle evidence for up to 3 rounds. The
registry now treats a fold whose current spec hash differs from
FOLD_ATTESTED.json as never-verified (registry._composition_stale_folds),
and this script is the ONLY writer of that file.

Run it at ROUND OPEN, right after committing the driver's new
CORRECTNESS_r{N}.json and before editing queries/folds.py — at that
moment the working tree equals the tree the driver judged, so "current
spec hash" is exactly the composition the green row attested.

Usage:
    python scripts/refresh_fold_attested.py          # newest artifact
    python scripts/refresh_fold_attested.py CORRECTNESS_r14.json
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    sys.path.insert(0, str(REPO))
    from training_flink_sql_cc_src_spark.queries import folds
    from training_flink_sql_cc_src_spark.registry import _driver_row_green

    if len(sys.argv) > 1:
        artifact = Path(sys.argv[1])
    else:
        artifacts = sorted(REPO.glob("CORRECTNESS_r*.json"))
        if not artifacts:
            print("no CORRECTNESS_r*.json at repo root", file=sys.stderr)
            return 1
        artifact = artifacts[-1]
    m = re.search(r"_r(\d+)", artifact.name)
    if not m:
        print(f"{artifact}: no _rN in name", file=sys.stderr)
        return 1
    rnd = int(m.group(1))
    doc = json.loads(artifact.read_text())

    path = REPO / "FOLD_ATTESTED.json"
    attested = json.loads(path.read_text()) if path.exists() else {}
    changed = []
    for fold in folds.SPECS:
        row = doc.get(fold)
        if row is None or not _driver_row_green(row):
            continue
        prev = attested.get(fold, {})
        if prev.get("round", -1) > rnd:
            continue  # never regress to an older artifact
        entry = {"spec_hash": folds.spec_hash(fold), "round": rnd}
        if prev != entry:
            changed.append(fold)
        attested[fold] = entry
    path.write_text(json.dumps(attested, indent=1, sort_keys=True) + "\n")
    print(
        f"{artifact.name}: refreshed {len(changed)} fold(s): "
        f"{', '.join(changed) or '(none)'}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
