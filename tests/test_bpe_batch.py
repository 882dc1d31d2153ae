"""Pin the batched BPE training rule (VERDICT r13 #6).

_bpe_learn selects all N_BPE_MERGES merges from ONE pair-count scan via
the greedy symbol-disjoint rule. These tests pin:

1. engine == an independent pure-Python reference of the same rule,
   computed straight from the parquet word counts (no Spark in the
   reference path);
2. the batching soundness claim — each kept pair's recorded count is
   INVARIANT under the earlier merges of its batch (so the one scan's
   counts equal what a per-merge rescan would have seen);
3. the merges-per-driver-job ratio — exactly ONE pair-count scan (and
   so one bounded collect) learns the whole merge table.
"""

from __future__ import annotations

import collections
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from training_flink_sql_cc_src_spark.queries import llm_pipeline as lp


def _word_counts(sf_dir: str) -> dict[str, int]:
    tbl = pq.read_table(Path(sf_dir) / "documents.parquet", columns=["text"])
    wc: collections.Counter[str] = collections.Counter()
    for text in tbl.column("text").to_pylist():
        for w in text.split(" "):
            if len(w) >= 2:
                wc[w] += 1
    return dict(wc)


def _pair_counts(segs: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pc: collections.Counter[tuple[str, str]] = collections.Counter()
    for syms, c in segs.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += c
    return dict(pc)


def _apply_merge(syms: tuple[str, ...], x: str, y: str) -> tuple[str, ...]:
    """Classic non-overlapping left-to-right merge."""
    out: list[str] = []
    for s in syms:
        if out and s == y and out[-1] == x:
            out[-1] = x + y
        else:
            out.append(s)
    return tuple(out)


def _reference_batch(sf_dir: str) -> list[tuple[int, str, int]]:
    """Pure-Python replay of the engine's rule: one pair count over the
    char-segmented word table, then greedy symbol-disjoint selection in
    (count DESC, wrapped-pair ASC) order."""
    segs = {
        tuple(w): c for w, c in _word_counts(sf_dir).items()
    }
    pc = _pair_counts(segs)
    ranked = sorted(
        pc.items(), key=lambda kv: (-kv[1], f"({kv[0][0]})({kv[0][1]})")
    )
    kept, used = [], set()
    for (x, y), n in ranked:
        if x in used or y in used:
            continue
        kept.append((len(kept) + 1, f"({x})({y})", n))
        used |= {x, y, x + y}
        if len(kept) == lp.N_BPE_MERGES:
            break
    return kept


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_engine_matches_reference(spark, sf):
    lp._BPE_MERGES_CACHE.pop(sf, None)
    merges, _segs = lp._bpe_learn(spark, sf)
    assert merges == _reference_batch(sf)
    assert len(merges) == lp.N_BPE_MERGES


def test_batch_counts_are_sequential_counts(sf_small):
    """Soundness of batching: because kept pairs are symbol-disjoint,
    pair k's count in the ONE up-front scan equals its count after
    actually applying merges 1..k-1 — i.e. the count the 1-merge-per-
    rescan reference loop would have recorded for it."""
    ref = _reference_batch(sf_small)
    segs = {tuple(w): c for w, c in _word_counts(sf_small).items()}
    for rank, pair, n_scan0 in ref:
        pc = _pair_counts(segs)
        x, y = pair[1:-1].split(")(")
        # count as a per-merge rescan would see it AFTER earlier merges
        assert pc[(x, y)] == n_scan0, (rank, pair)
        nxt: collections.Counter[tuple[str, ...]] = collections.Counter()
        for syms, c in segs.items():
            nxt[_apply_merge(syms, x, y)] += c
        segs = dict(nxt)


def test_single_scan_learns_all_merges(spark, sf_small, monkeypatch):
    """merges/driver-job ratio == N_BPE_MERGES: _bpe_learn invokes the
    pair-count plan exactly once per training run."""
    calls = []
    real = lp._bpe_pair_counts_df

    def counting(df):
        calls.append(1)
        return real(df)

    monkeypatch.setattr(lp, "_bpe_pair_counts_df", counting)
    lp._BPE_MERGES_CACHE.pop(sf_small, None)
    merges, _ = lp._bpe_learn(spark, sf_small)
    assert len(calls) == 1
    assert len(merges) == lp.N_BPE_MERGES
    lp._BPE_MERGES_CACHE.pop(sf_small, None)


def test_selection_raises_loudly_when_pool_exhausted():
    cands = [("(a)(b)", 10), ("(b)(c)", 9), ("(a)(c)", 8)]
    if lp.N_BPE_MERGES > 1:
        with pytest.raises(RuntimeError, match="disjoint merges"):
            lp._select_bpe_batch(cands)


def test_fold_merge_matches_classic_on_adversarial_words(spark):
    """The JVM left-fold merge (_bpe_fold_merge) is claimed provably
    identical to the classic non-overlapping left-to-right merge; pin
    it on the adversarial shapes — self-merge runs ('aaaa' + (a,a)
    must give [aa, aa], never re-merge the fresh aa), period-2
    alternation, merge-at-word-edges, and no-op words."""
    from pyspark.sql import functions as F

    cases = [
        ("aaaa", ("a", "a")),
        ("aaaaa", ("a", "a")),
        ("ababab", ("a", "b")),
        ("ababab", ("b", "a")),
        ("ab", ("a", "b")),
        ("ba", ("a", "b")),
        ("xaay", ("a", "a")),
        ("aabb", ("a", "b")),
        ("zzz", ("a", "b")),
    ]
    rows = [(i, w) for i, (w, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, w string").select(
        "i",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda j: F.col("w").substr(j, F.lit(1)),
        ).alias("syms"),
    )
    for i, (w, (x, y)) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(lp._bpe_fold_merge("syms", x, y).alias("m"))
            .collect()[0]["m"]
        )
        assert tuple(got) == _apply_merge(tuple(w), x, y), (w, x, y, got)
