"""Refresh DRIVER_ATTESTED.json from the newest committed CORRECTNESS
artifact: for every driver-facing registry entry with a green driver row
in that artifact, record the CURRENT spec hash (registry.entry_spec_hash
— fold member composition + member oracles/sources for fold suites,
oracle SQL + implementation source for regular entries) as the attested
definition.

Why this exists (VERDICT r13 #1, generalized in r14): a driver row only
attests the definition that produced it. The rotation used to key
last-green on the entry NAME alone, so an entry whose definition changed
after its last green row (a new fold member, a replanned implementation,
an edited oracle) kept sorting as "verified" and its new definition had
zero driver oracle evidence for up to 3 rounds. The registry now treats
an entry whose current spec hash differs from DRIVER_ATTESTED.json as
never-verified (registry._stale_entries), and this script is the ONLY
writer of that file.

Run it at ROUND OPEN, right after committing the driver's new
CORRECTNESS_r{N}.json and before editing any query — at that moment the
working tree equals the tree the driver judged, so "current spec hash"
is exactly the definition the green row attested.

Usage:
    python scripts/refresh_attested.py              # newest artifact
    python scripts/refresh_attested.py CORRECTNESS_r15.json
    python scripts/refresh_attested.py --rehash-all # hash-algorithm migration

--rehash-all recomputes the stored spec hash for EVERY already-attested
name under the current entry_spec_hash algorithm, keeping each name's
attested round. It is ONLY sound at round open, before any query or
helper edit, when the working tree still equals the tree the driver
judged — at that moment the current definitions ARE the attested
definitions, and only the hashing algorithm changed underneath them
(e.g. the r15 closure extension that folds shared-helper sources in).
Running it after an edit would launder the edit into green evidence.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    sys.path.insert(0, str(REPO))
    from training_flink_sql_cc_src_spark import registry
    from training_flink_sql_cc_src_spark.registry import _driver_row_green

    if len(sys.argv) > 1 and sys.argv[1] == "--rehash-all":
        path = REPO / "DRIVER_ATTESTED.json"
        attested = json.loads(path.read_text()) if path.exists() else {}
        driver_names = set(registry.driver_queries())
        changed = []
        for name in sorted(set(attested) & driver_names):
            new = registry.entry_spec_hash(name)
            if attested[name].get("spec_hash") != new:
                changed.append(name)
                attested[name]["spec_hash"] = new
        path.write_text(json.dumps(attested, indent=1, sort_keys=True) + "\n")
        print(f"rehash-all: {len(changed)} hash(es) migrated of {len(attested)}")
        return 0
    if len(sys.argv) > 1:
        artifact = Path(sys.argv[1])
    else:
        # numeric round sort (r14 ADVICE): lexicographic filename sort
        # picks CORRECTNESS_r100 over _r99 once rounds hit three digits
        artifacts = sorted(
            REPO.glob("CORRECTNESS_r*.json"),
            key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
        )
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

    driver_names = set(registry.driver_queries())
    path = REPO / "DRIVER_ATTESTED.json"
    attested = json.loads(path.read_text()) if path.exists() else {}
    # prune entries that left the driver-facing registry
    dropped = sorted(set(attested) - driver_names)
    for name in dropped:
        del attested[name]
    changed = []
    for name in sorted(driver_names):
        row = doc.get(name)
        if row is None or not _driver_row_green(row):
            continue
        prev = attested.get(name, {})
        if prev.get("round", -1) > rnd:
            continue  # never regress to an older artifact
        entry = {
            "spec_hash": registry.entry_spec_hash(name),
            "round": rnd,
        }
        if prev.get("spec_hash") != entry["spec_hash"]:
            changed.append(name)
        attested[name] = entry
    path.write_text(json.dumps(attested, indent=1, sort_keys=True) + "\n")
    print(
        f"{artifact.name}: {len(changed)} hash change(s) "
        f"({', '.join(changed) or 'none'}); pruned "
        f"{len(dropped)} ({', '.join(dropped) or 'none'})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
