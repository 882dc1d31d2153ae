"""Fingerprint-normalized bench ratchet (bench.best_prior +
scripts/bench_gate.py): corpus-bound queries compare only against
rounds with a MATCHING corpus fingerprint, so a driver data
regeneration RESETS those ratchets instead of producing permanently
carried acknowledgements (VERDICT r7 #4), while a deliberate plan
pessimization on unchanged data still trips the gate.

No SparkSession needed — the gate is exercised through --from-json.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _fp_comparable, best_prior, load_acks  # noqa: E402


@pytest.fixture(scope="module")
def r7():
    """Best-prior values + fingerprint for gate-MECHANICS tests.

    These are meta-tests of the gate's pass/fail/ack/reset machinery,
    not the ratchet itself (the ratchet is exercised by running
    scripts/bench_gate.py at round close). Earlier versions replayed
    the newest bench record's own timings, which passed only while
    that record was itself ratchet-clean — the round-12 driver run
    (four sub-second queries 1.5-1.9x over best-prior on a loaded
    host) reddened three mechanics tests that had nothing to do with
    the regression (VERDICT r12 Wrong #1). Replaying best_prior()
    values instead passes BY CONSTRUCTION (a prior can never beat
    itself by >1.5x), while the 3x pessimization tests still trip.

    The fingerprint/sf still come from the newest parseable record
    (newest-first with null-skip, VERDICT r11 Wrong #1) so the
    corpus-bound ratchets key to the live corpus.
    """
    candidates = [REPO / "BENCH_SIDECAR.json"] + sorted(
        REPO.glob("BENCH_r*.json"), reverse=True
    )
    for path in candidates:
        try:
            doc = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        parsed = doc if doc.get("queries") else doc.get("parsed")
        if parsed and parsed.get("queries") and parsed.get("corpus"):
            fp, sf = parsed["corpus"], parsed.get("sf")
            priors = best_prior(fp, sf)
            queries = {
                name: priors[name]
                for name in parsed["queries"]
                if name in priors
            }
            # mechanics tests poke these names specifically
            assert {
                "q21_waiting_supplier",
                "dedup_minhash_lsh",
                "dedup_jaccard_blocked_pairs",
            } <= set(queries)
            return queries, fp, sf
    pytest.skip("no parseable bench record committed")


def _gate(tmp_path, queries, corpus, sf=0.1):
    doc = {"queries": queries, "corpus": corpus, "sf": sf}
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(doc))
    # isolate gate MECHANICS from the currently-reviewed ack config:
    # these tests prove the ratchet trips with an EMPTY config
    # (SPARK_GRAFT_BENCH_ACKS override added r15 alongside the
    # host-epoch ack set — see _ALLOWED_ACKS below).
    empty = tmp_path / "no_acks.json"
    empty.write_text("{}")
    import os

    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "bench_gate.py"),
         "--from-json", str(p)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_BENCH_ACKS": str(empty)},
    )


#: Reviewed ack set, round 16. The 35 r15 "host-epoch" acks were
#: REMOVED under the r15 removal condition: the r16 sandbox epoch
#: measures at/below the r15 driver numbers (round-open full suite
#: 40.6 s vs the driver's 42.6 s) and the round-open run flags ZERO
#: queries >1.5x against best_prior (which now also excludes 8-core
#: probe records via the cpus guard). One ack remains:
#: dedup_minhash_lsh — its 0.893 s ratchet low is a warm-cache
#: artifact of the pre-r15 leaked persist() (bench sweeps 2-3 re-hit
#: the CacheManager); honest-cold sweeps measure ~1.3-1.5 s and the
#: cold-vs-cold control matches the r14 code (1.72 vs 1.71 s), so no
#: code can ever meet that prior. It stays acked until a corpus
#: regeneration resets the fingerprint-keyed ratchet.
_ALLOWED_ACKS: set[str] = {"dedup_minhash_lsh"}


def test_no_undocumented_acks_remain():
    """The checked-in ack config must stay within the reviewed set
    (currently empty — see _ALLOWED_ACKS)."""
    acks = load_acks()
    assert set(acks) <= _ALLOWED_ACKS, acks


def test_bench_only_rejects_unknown_names():
    """SPARK_GRAFT_BENCH_ONLY (targeted scale runs, VERDICT r10 #6) must
    reject names outside HEADLINE before Spark even starts — a typo'd
    subset must not silently bench nothing."""
    import os
    import subprocess

    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_BENCH_ONLY": "no_such_query"},
        timeout=60,
    )
    assert r.returncode != 0
    assert "no_such_query" in (r.stderr + r.stdout)


def test_fingerprint_keyed_priors(r7):
    """With the current fingerprint, corpus-bound priors come only from
    fingerprint-matching rounds; TPC-H priors keep full history."""
    queries, fp, sf = r7
    p_all, p_fp = best_prior(sf=sf), best_prior(fp, sf)
    # TPC-H ratchet unchanged by the fingerprint
    assert p_all["q21_waiting_supplier"] == p_fp["q21_waiting_supplier"]
    # corpus-bound prior never tighter than the fingerprint-matched best
    assert p_fp["dedup_jaccard_blocked_pairs"] >= p_all[
        "dedup_jaccard_blocked_pairs"
    ]
    # a foreign corpus has no comparable corpus-bound priors at all
    alien = {"n_docs": 1, "vocab_size": 2, "block_candidate_pairs": 3}
    assert "dedup_jaccard_blocked_pairs" not in best_prior(alien)


def test_fp_comparable_tolerance():
    a = {"n_docs": 5000, "vocab_size": 31, "block_candidate_pairs": 100_000}
    assert _fp_comparable(a, {**a, "block_candidate_pairs": 105_000})
    assert not _fp_comparable(a, {**a, "block_candidate_pairs": 150_000})
    assert not _fp_comparable(a, {**a, "vocab_size": 32})
    assert not _fp_comparable(a, None)


def test_gate_passes_on_current_shape(tmp_path, r7):
    queries, fp, sf = r7
    r = _gate(tmp_path, queries, fp, sf)
    assert r.returncode == 0, r.stderr


@pytest.mark.parametrize(
    "victim",
    [
        "q21_waiting_supplier",
        "dedup_minhash_lsh",
        # retired-ack queries: with the sketch materialized (round 12)
        # these are ordinary ratchet citizens again — a 3x slowdown
        # must FAIL, not slip through a leftover ack
        "dedup_jaccard_blocked_pairs",
    ],
)
def test_gate_trips_on_plan_pessimization(tmp_path, r7, victim):
    """3x slowdown on UNCHANGED data must fail the gate — for both a
    TPC-H query and corpus-bound ones (the fingerprint reset must not
    blind the ratchet on the same corpus)."""
    queries, fp, sf = r7
    r = _gate(tmp_path, {**queries, victim: queries[victim] * 3}, fp, sf)
    assert r.returncode == 1 and f"FAIL {victim}" in r.stderr


def test_gate_ack_flag_surfaces_not_silences(tmp_path, r7):
    """--ack must turn a FAIL into a VISIBLE ACK line (exit 0), never a
    silent pass — the ack path stays testable with an empty config."""
    queries, fp, sf = r7
    slow = {
        **queries,
        "dedup_jaccard_blocked_pairs": queries[
            "dedup_jaccard_blocked_pairs"
        ]
        * 3,
    }
    doc = {"queries": slow, "corpus": fp, "sf": sf}
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(doc))
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "bench_gate.py"),
         "--from-json", str(p), "--ack", "dedup_jaccard_blocked_pairs"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "ACK dedup_jaccard_blocked_pairs" in r.stderr


def test_gate_resets_corpus_bound_on_regeneration(tmp_path, r7):
    """The same slow corpus-bound time under a DIFFERENT fingerprint is
    a data regeneration, not a regression — gate passes, no ack needed."""
    queries, _, sf = r7
    slow = {
        **queries,
        "dedup_jaccard_blocked_pairs": queries[
            "dedup_jaccard_blocked_pairs"
        ]
        * 3,
    }
    alien = {"n_docs": 9999, "vocab_size": 7, "block_candidate_pairs": 1}
    r = _gate(tmp_path, slow, alien, sf)
    assert r.returncode == 0, r.stderr
