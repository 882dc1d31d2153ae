"""Regenerate registry._DRIVER_VERIFIED_* from a driver CORRECTNESS file.

The driver records ~50 registry entries per round, so the registry
front-loads queries WITHOUT driver evidence (see registry._driver_order).
After each round, fold the new green rows into the verified set so the
next run reaches the still-unverified tail:

    python scripts/update_driver_verified.py CORRECTNESS_r02.json

Prints the updated frozenset literal to paste into registry.py (names
with a green hash-match row, or a declared rows-only row that ran
without error).
"""

from __future__ import annotations

import json
import sys
import textwrap


def main() -> None:
    verified: set[str] = set()
    for path in sys.argv[1:]:
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("err") is None and (
                row.get("hash_match")
                or (row.get("oracle_rows") in (-1, None) and row.get("rows_match") is not False)
            )
            # rows-only-by-design entries: newer drivers record err="no_oracle"
            # with the spark row count — a successful run, weaker evidence
            ok = ok or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                verified.add(name)
    try:
        sys.path.insert(0, ".")
        from training_flink_sql_cc_src_spark.registry import (
            _DRIVER_VERIFIED,
        )

        verified |= set(_DRIVER_VERIFIED)
    except Exception:
        pass
    names = textwrap.fill(
        ", ".join(f'"{n}"' for n in sorted(verified)),
        width=76,
        initial_indent="    ",
        subsequent_indent="    ",
    )
    print("_DRIVER_VERIFIED = frozenset({")
    print(names + ",")
    print("})")
    print(f"# {len(verified)} names", file=sys.stderr)


if __name__ == "__main__":
    main()
