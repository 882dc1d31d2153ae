"""Regenerate registry._DRIVER_LAST_GREEN from driver CORRECTNESS files.

The driver records only ~50 registry entries per round, and the testdata
is regenerated between rounds — so a green row from round N is evidence
against round-N data only (the round-3 events.parquet encoding change
silently invalidated every window/time green from rounds 1-2). The
registry therefore tracks, per name, the ROUND of the most recent green
driver row, and _driver_order cycles the verified tail oldest-evidence
first so every entry gets re-checked against current data every ~3 rounds.

Usage (after each round, with every CORRECTNESS file so far):

    python scripts/update_driver_verified.py CORRECTNESS_r0*.json

The round number is parsed from each filename (``_r(\\d+)``). Prints the
updated ``_DRIVER_LAST_GREEN`` dict literal to paste into registry.py.
A green row = hash-match with no error, or a rows-only row (err is None
with no oracle, or err == "no_oracle") whose spark run succeeded.
"""

from __future__ import annotations

import json
import re
import sys


def green(row: dict) -> bool:
    if not isinstance(row, dict):
        return False
    if row.get("err") is None:
        return bool(
            row.get("hash_match")
            or (
                row.get("oracle_rows") in (-1, None)
                and row.get("rows_match") is not False
            )
        )
    # rows-only-by-design entries: newer drivers record err="no_oracle"
    # with the spark row count — a successful run, weaker evidence
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def main() -> None:
    last_green: dict[str, int] = {}
    for path in sys.argv[1:]:
        m = re.search(r"_r(\d+)", path)
        if not m:
            print(f"skip {path}: no _rN in name", file=sys.stderr)
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            if green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    print("_DRIVER_LAST_GREEN = {")
    for name in sorted(last_green):
        print(f'    "{name}": {last_green[name]},')
    print("}")
    print(f"# {len(last_green)} names", file=sys.stderr)


if __name__ == "__main__":
    main()
