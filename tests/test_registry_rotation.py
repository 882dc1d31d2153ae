"""Driver-rotation table must be STRUCTURAL: registry._DRIVER_LAST_GREEN
is rebuilt at import from the committed CORRECTNESS_r*.json artifacts, so
committing each round's driver output refreshes the re-verification
rotation with no human edit. (VERDICT r7 finding: the frozen dict went
stale three rounds running, wasting the ~50 driver slots on names the
previous round just verified.)

No SparkSession needed — pure-Python registry logic.
"""

from __future__ import annotations

import json
from pathlib import Path

from training_flink_sql_cc_src_spark import registry

REPO = Path(__file__).resolve().parent.parent


def test_loader_ingests_committed_artifacts():
    artifacts = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert artifacts, "driver artifacts must be committed at the repo root"
    loaded = registry._load_driver_last_green()
    # every green row in the newest artifact must be reflected at that round
    newest = artifacts[-1]
    rnd = int(newest.stem.split("_r")[1])
    doc = json.loads(newest.read_text())
    greens = [n for n, row in doc.items() if registry._driver_row_green(row)]
    assert greens, f"{newest.name} has no green rows?"
    for name in greens:
        assert loaded.get(name, 0) >= rnd, (name, loaded.get(name))


def test_driver_count_keeps_headroom():
    """Rotation headroom (VERDICT r11 #3): the driver-facing registry
    must stay <= 200 names so the ~50-slot/round recheck cycle is
    <= 4 rounds — oldest evidence >= current-3, one full round of slack
    under the repo's current-4 staleness guard. Growth beyond 200 means
    folding more near-duplicate shapes (queries/folds.py), not loosening
    this bound."""
    dq = registry.driver_queries()
    assert len(dq) <= 200, (
        f"driver-facing registry at {len(dq)} names: fold more shapes "
        "before adding entries (see queries/folds.py)"
    )
    # fold members really are excluded from the driver contract...
    assert "pattern_match_recognize_plus" not in dq
    assert "scalar_string" not in dq
    # ...but stay first-class for bench/tests
    aq = registry.all_queries()
    assert "pattern_match_recognize_plus" in aq and "scalar_string" in aq
    # and every fold member keeps full-fidelity attestation via its fold
    from training_flink_sql_cc_src_spark.queries.folds import SPECS

    for fold_name, members in SPECS.items():
        assert fold_name in dq
        for m in members:
            assert m in aq and not registry._REGISTRY[m].driver


def test_driver_order_frontloads_oldest_evidence():
    """The first driver slots (~50) must be filled by names with NO driver
    evidence, then the OLDEST-evidence verified names — never the names
    the latest round just checked."""
    names = list(registry.driver_queries())
    lg = registry._DRIVER_LAST_GREEN
    newest_round = max(lg.values())
    head = names[:50]
    # rows-only/exact companions ride with their group's OLDEST member
    # by design (VERDICT r12 #5: a sampled round must co-attest the
    # pair) — a fresh partner in the head is correct when its group
    # anchor is stale, so exclude paired names from the freshness check
    paired = set(registry._ROWS_ONLY_COMPANION) | set(
        registry._ROWS_ONLY_COMPANION.values()
    )
    freshest = [
        n for n in head if lg.get(n, 0) == newest_round and n not in paired
    ]
    # the just-verified names must not occupy early slots while stale
    # evidence exists deeper in the list
    stale_remaining = [n for n in names[50:] if lg.get(n, 0) < newest_round]
    assert not (freshest and stale_remaining), (
        f"rotation stale: head re-checks {freshest[:5]} while "
        f"{len(stale_remaining)} older names wait"
    )


def test_green_predicate_matches_updater_script():
    """registry._driver_row_green mirrors scripts/update_driver_verified.py."""
    rows = [
        ({"err": None, "hash_match": True}, True),
        ({"err": None, "hash_match": False, "oracle_rows": 10}, False),
        ({"err": None, "oracle_rows": None, "rows_match": None}, True),
        ({"err": "no_oracle", "spark_rows": 5}, True),
        ({"err": "no_oracle", "spark_rows": None}, False),
        ({"err": "boom"}, False),
        (None, False),
    ]
    for row, want in rows:
        assert registry._driver_row_green(row) is want, row


def test_composition_changed_fold_sorts_fresh():
    """VERDICT r13 #1: a fold whose member set or specs changed since its
    last green driver row must be treated as NEVER-VERIFIED — its hash
    evidence no longer covers its current definition. Pin the mechanism
    by feeding _composition_stale_folds synthetic attested maps."""
    from training_flink_sql_cc_src_spark.queries import folds

    a_fold = next(iter(folds.SPECS))
    current = {f: folds.spec_hash(f) for f in folds.SPECS}

    # attested == current composition -> nothing stale
    assert registry._composition_stale_folds(dict(current)) == set()

    # one fold's attested hash differs (composition changed) -> stale
    tampered = dict(current)
    tampered[a_fold] = "0" * 64
    assert registry._composition_stale_folds(tampered) == {a_fold}

    # fold missing from the attested file -> conservatively stale
    missing = dict(current)
    del missing[a_fold]
    assert registry._composition_stale_folds(missing) == {a_fold}


def test_stale_fold_fronts_driver_order(monkeypatch):
    """A composition-stale fold must leave the verified tail and join the
    fresh batch of _driver_order, even though it has a last-green round."""
    from training_flink_sql_cc_src_spark.queries import folds

    a_fold = next(iter(folds.SPECS))
    names = list(registry.driver_queries())
    assert a_fold in names

    monkeypatch.setattr(
        registry, "_composition_stale_folds", lambda attested=None: {a_fold}
    )
    order = registry._driver_order(names)
    n_unverified = sum(1 for n in order if n not in registry._DRIVER_VERIFIED)
    # the stale fold sits in the fresh batch (before every verified name),
    # not at its last-green rotation position
    assert order.index(a_fold) <= n_unverified + len(folds.SPECS)
    fresh_cut = order.index(a_fold)
    assert all(
        n not in registry._DRIVER_VERIFIED
        or n in registry._DRIVER_HEAVY_TAIL
        or n == a_fold
        for n in order[: fresh_cut + 1]
    )


def test_fold_attested_file_covers_all_folds():
    """FOLD_ATTESTED.json (the refresh script's output) must have an entry
    for every fold; a fold absent from it counts as stale every round,
    burning a fresh-batch slot forever."""
    from training_flink_sql_cc_src_spark.queries import folds

    attested = registry._load_fold_attested()
    for fold in folds.SPECS:
        assert fold in attested, (
            f"{fold} missing from FOLD_ATTESTED.json — run "
            "scripts/refresh_fold_attested.py at round open"
        )
