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
    # definition-stale entries (changed since their last green row)
    # legitimately front the order regardless of evidence age — their
    # evidence no longer covers their current definition (r14)
    stale = registry._stale_entries(names)
    freshest = [
        n
        for n in head
        if lg.get(n, 0) == newest_round
        and n not in paired
        and n not in stale
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


def test_changed_entry_sorts_fresh():
    """VERDICT r13 #1 (generalized r14): an entry whose definition —
    fold member set/specs/sources, or a regular entry's oracle +
    implementation source — changed since its last green driver row
    must be treated as NEVER-VERIFIED; its evidence no longer covers
    its current definition. Pin the mechanism by feeding
    _stale_entries synthetic attested maps."""
    from training_flink_sql_cc_src_spark.queries import folds

    names = [n for n in registry.driver_queries() if n in registry._DRIVER_VERIFIED]
    a_fold = next(n for n in names if n in folds.SPECS)
    # companion-pair members pull their partner into the stale set by
    # design (co-sampling closure) — pick a companion-free plain entry
    # so the exact-set assertions below stay order-independent
    paired = set(registry._ROWS_ONLY_COMPANION) | set(
        registry._ROWS_ONLY_COMPANION.values()
    )
    a_plain = next(n for n in names if n not in folds.SPECS and n not in paired)
    current = {n: registry.entry_spec_hash(n) for n in names}

    # attested == current definitions -> nothing stale
    assert registry._stale_entries(names, dict(current)) == set()

    # changed fold AND changed plain entry -> both stale
    tampered = dict(current)
    tampered[a_fold] = "0" * 64
    tampered[a_plain] = "0" * 64
    assert registry._stale_entries(names, tampered) == {a_fold, a_plain}

    # entry missing from the attested file -> conservatively stale
    missing = dict(current)
    del missing[a_plain]
    assert registry._stale_entries(names, missing) == {a_plain}

    # fold hash reacts to member composition, entry hash to oracle text
    assert registry.entry_spec_hash(a_fold) == folds.spec_hash(a_fold)
    e = registry._REGISTRY[a_plain]
    h0 = registry.entry_spec_hash(a_plain)
    old_oracle = e.oracle
    try:
        e.oracle = (old_oracle or "") + " -- changed"
        assert registry.entry_spec_hash(a_plain) != h0
    finally:
        e.oracle = old_oracle


def test_constant_edit_changes_spec_hash_and_fronts(monkeypatch):
    """VERDICT r15 Wrong #2: a module-level CONSTANT edit
    (_DRIVER_FINISH_EDGES, WINNOW_DF_CAP, ...) is behavior-bearing but
    used to change no hashed source — the entry kept riding stale green
    evidence. The closure now hashes referenced constants' assignment
    source text, so (a) editing a constant changes entry_spec_hash, and
    (b) _stale_entries fronts the entry against an attested map taken
    before the edit."""
    from training_flink_sql_cc_src_spark.queries import folds

    name = "dedup_winnow_pairs"  # references WINNOW_DF_CAP et al.
    assert name not in folds.SPECS
    mod = "training_flink_sql_cc_src_spark.queries.llm_text"
    # the constant's assignment text must be in the closure already
    closure = registry.spec_closure_sources(registry._REGISTRY[name].fn)
    assert f"{mod}::WINNOW_DF_CAP" in closure

    h0 = registry.entry_spec_hash(name)
    attested = {name: {"spec_hash": h0, "round": 1}}
    # simulate `WINNOW_DF_CAP = 50` -> `= 51` via the per-module source
    # cache (equivalent to the file edit without touching the file)
    consts = dict(registry._module_const_sources(mod))
    consts["WINNOW_DF_CAP"] = "WINNOW_DF_CAP = 51"
    monkeypatch.setitem(registry._MODULE_CONST_SRC, mod, consts)
    registry._CLOSURE_CACHE.clear()
    try:
        h1 = registry.entry_spec_hash(name)
        assert h1 != h0, "constant edit must change the spec hash"
        if name in registry._DRIVER_VERIFIED:
            stale = registry._stale_entries(
                [name], {name: h0}
            )
            assert name in stale
    finally:
        registry._CLOSURE_CACHE.clear()


def test_stale_entry_fronts_driver_order(monkeypatch):
    """A definition-stale entry must leave the verified tail and join
    the fresh batch of _driver_order, even though it has a last-green
    round."""
    from training_flink_sql_cc_src_spark.queries import folds

    a_fold = next(iter(folds.SPECS))
    names = list(registry.driver_queries())
    assert a_fold in names

    monkeypatch.setattr(
        registry, "_stale_entries", lambda names, attested=None: {a_fold}
    )
    order = registry._driver_order(names)
    fresh_cut = order.index(a_fold)
    assert all(
        n not in registry._DRIVER_VERIFIED
        or n in registry._DRIVER_HEAVY_TAIL
        or n == a_fold
        for n in order[: fresh_cut + 1]
    )


def test_attested_file_is_current():
    """DRIVER_ATTESTED.json entries must be registered driver-facing
    names (the refresh script prunes departures), and names carrying a
    stale-by-hash marker must be exactly the definitions changed since
    their last green row — i.e. the file should never drift so far that
    the fresh batch starves the re-verification tail."""
    attested = registry._load_attested()
    assert attested, "DRIVER_ATTESTED.json missing or empty"
    driver_names = set(registry.driver_queries())
    unknown = set(attested) - driver_names
    assert not unknown, (
        f"stale names in DRIVER_ATTESTED.json: {sorted(unknown)[:5]} — "
        "run scripts/refresh_attested.py"
    )
    stale = registry._stale_entries(driver_names, attested)
    # the bound distinguishes "forgot scripts/refresh_attested.py at
    # round open" (~all 199 stale) from a legitimate edit wave. A
    # shared-helper replan legitimately stales every caller (r15
    # fan_out: 34), so the ceiling is sized to the largest plausible
    # single-helper blast radius, not to a per-entry edit count.
    assert len(stale) <= 60, (
        f"{len(stale)} driver-verified entries have no evidence for "
        f"their current definition: {sorted(stale)[:10]} ... — commit "
        "the round artifact and run scripts/refresh_attested.py"
    )


def test_stale_exact_pulls_rows_only_partner():
    """A stale exact companion must pull its rows-only partner into the
    same round's fresh sample (VERDICT r12 #5 co-sampling contract),
    and vice versa."""
    names = [
        n
        for n in registry.driver_queries()
        if n in registry._DRIVER_VERIFIED
    ]
    ro, ex = next(
        (ro, ex)
        for ro, ex in registry._ROWS_ONLY_COMPANION.items()
        if ro in names and ex in names
    )
    current = {n: registry.entry_spec_hash(n) for n in names}
    tampered = dict(current)
    tampered[ex] = "0" * 64
    stale = registry._stale_entries(names, tampered)
    assert {ro, ex} <= stale
    tampered2 = dict(current)
    tampered2[ro] = "0" * 64
    assert {ro, ex} <= registry._stale_entries(names, tampered2)
