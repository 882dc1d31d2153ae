"""Property tests for the winnowing fingerprint engine (Schleimer et al.
2003) against an independent pure-Python reference.

The oracle parity gate checks the fixture corpus (ASCII, long docs);
these cases pin the boundary semantics the fixtures never exercise:
texts at the t = k+w-1 inclusion threshold, all-identical characters
(every gram hash equal — window min is a tie), multi-byte unicode
(Spark length()/substring() count CODE POINTS and md5 hashes UTF-8
bytes — the reference must agree), and the winnowing density guarantee
itself.
"""

from __future__ import annotations

import collections
import hashlib
import random

import pytest

from training_flink_sql_cc_src_spark.queries.llm_text import (
    K_WINNOW,
    W_WINNOW,
    WINNOW_T,
)


def _ref_winnow(text: str) -> dict | None:
    """Pure-Python reference: md5 every k-gram (UTF-8 bytes of the
    code-point slice), take each w-window's lexicographic MIN hex,
    aggregate like text_winnow_fingerprints."""
    if len(text) < WINNOW_T:
        return None
    grams = [
        hashlib.md5(
            text[i : i + K_WINNOW].encode("utf-8")
        ).hexdigest()
        for i in range(len(text) - K_WINNOW + 1)
    ]
    wmins = [
        min(grams[i : i + W_WINNOW])
        for i in range(len(grams) - W_WINNOW + 1)
    ]
    return {
        "n_grams": len(grams),
        "n_fingerprints": len(set(wmins)),
        "min_fp": min(wmins),
        "max_fp": max(wmins),
    }


CASES = [
    "a" * WINNOW_T,                      # exact threshold, all ties
    "a" * (WINNOW_T - 1),                # one below threshold -> excluded
    "a" * 50,                            # long all-identical
    "abcdefghijk",                       # exactly t distinct chars
    "abababababababab",                  # period-2 repetition
    "the quick brown fox jumps over the lazy dog",
    "naïve café – déjà vu façade…",      # multi-byte latin + punctuation
    "日本語のテキストで指紋を計算する",      # CJK (3-byte UTF-8 code points)
    "mixed ascii and 中文 characters here",
    "🙂🙃🙂🙃🙂🙃🙂🙃🙂🙃🙂",               # astral plane (surrogates in UTF-16)
]


def _rand_cases(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    alpha = "abcdefgh é中"
    out = []
    for _ in range(n):
        ln = rng.randint(WINNOW_T - 2, 40)
        out.append("".join(rng.choice(alpha) for _ in range(ln)))
    return out


@pytest.fixture(scope="module")
def winnow_rows(spark, tmp_path_factory):
    texts = CASES + _rand_cases(40, seed=1414)
    tmp = tmp_path_factory.mktemp("winnowprop")
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    from training_flink_sql_cc_src_spark.registry import all_queries

    got = {
        r["doc_id"]: r.asDict()
        for r in all_queries()["text_winnow_fingerprints"](
            spark, str(tmp)
        ).collect()
    }
    return texts, got


def test_engine_matches_reference(winnow_rows):
    texts, got = winnow_rows
    for i, text in enumerate(texts):
        want = _ref_winnow(text)
        if want is None:
            assert i not in got, (i, text)
            continue
        row = got[i]
        for k, v in want.items():
            assert row[k] == v, (text, k, row[k], v)


def test_density_guarantee(winnow_rows):
    """Winnowing guarantee (Schleimer §3): at least one fingerprint per
    window, at most one new fingerprint per window — so
    1 <= n_fingerprints <= n_windows = n_grams - w + 1."""
    texts, got = winnow_rows
    for i, text in enumerate(texts):
        if len(text) < WINNOW_T:
            continue
        row = got[i]
        n_windows = row["n_grams"] - W_WINNOW + 1
        assert 1 <= row["n_fingerprints"] <= n_windows, (text, row)


def test_pairs_engine_matches_reference(spark, tmp_path):
    """End-to-end dedup_winnow_pairs against a pure-Python reference on
    an engineered corpus: near-dup families sharing long runs (must
    pair), unrelated docs (must not), a fingerprint shared by MORE than
    WINNOW_DF_CAP documents (must be suppressed before the join), and
    unicode content — pinning truncation, binary packing, the df cap,
    and the min-shared threshold together."""
    from training_flink_sql_cc_src_spark.queries.llm_text import (
        WINNOW_DF_CAP,
        WINNOW_FP_HEX,
        WINNOW_MIN_SHARED,
    )
    from training_flink_sql_cc_src_spark.queries.llm_text import (
        _winnow_wmins,
    )
    from training_flink_sql_cc_src_spark.registry import all_queries

    rng = random.Random(99)
    alpha = "abcdefghij é中 "
    base = "".join(rng.choice(alpha) for _ in range(120))
    texts = []
    # family A: 5 docs sharing base with small unique suffixes -> pairs
    for i in range(5):
        texts.append(base + f" uniq{i:02d} " + "".join(rng.choice(alpha) for _ in range(20)))
    # unrelated docs
    for i in range(10):
        texts.append("".join(rng.choice(alpha) for _ in range(80)))
    # boilerplate shared by > WINNOW_DF_CAP docs: a long common chunk
    # in many docs, each otherwise unique — the cap must suppress its
    # fingerprints (docs pair only if they ALSO share >= 3 rare ones)
    boiler = "".join(rng.choice(alpha) for _ in range(60))
    for i in range(WINNOW_DF_CAP + 5):
        texts.append(
            boiler + " " + "".join(rng.choice(alpha) for _ in range(40))
        )

    rows = [(i, t) for i, t in enumerate(texts)]
    tmp = tmp_path / "winnowpairs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp / "documents.parquet")
    )

    # pure-Python reference of the registered pipeline
    fps = {
        i: {w[:WINNOW_FP_HEX] for w in _winnow_wmins(t)}
        for i, t in rows
        if len(t) >= 8 + 4 - 1
    }
    df_count: collections.Counter[str] = collections.Counter()
    for s in fps.values():
        df_count.update(s)
    rare = {h for h, c in df_count.items() if 2 <= c <= WINNOW_DF_CAP}
    want = {}
    ids = sorted(fps)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = fps[a] & fps[b] & rare
            if len(shared) >= WINNOW_MIN_SHARED:
                want[(a, b)] = len(shared)

    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in all_queries()["dedup_winnow_pairs"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want
    # the corpus exercises all three regimes
    fam_a_pairs = [p for p in want if p[0] < 5 and p[1] < 5]
    assert len(fam_a_pairs) == 10  # all C(5,2) family-A pairs found
    boiler_ids = set(range(15, 15 + WINNOW_DF_CAP + 5))
    assert not any(
        a in boiler_ids and b in boiler_ids for a, b in want
    ), "boilerplate-only sharing must be suppressed by the df cap"


def test_fast_variant_same_pairs_on_collision_free_corpus(spark, tmp_path):
    """winnow_pairs_fast (the uint64 rolling-hash deployment variant)
    must produce the IDENTICAL pair set as the registered md5 engine on
    a corpus where both hashes are collision-free and every true match
    is an exact copy: families are built over per-family marker
    characters so no 8-gram ever crosses families, hence the only
    correct pairs are the within-family copy pairs — a result that
    cannot depend on the hash choice (winnowing selects at least one
    fingerprint per window, and identical texts have identical
    fingerprint sets under ANY hash). n_shared is hash-dependent
    (selection density varies slightly), so only the pair KEYS are
    compared."""
    from training_flink_sql_cc_src_spark.queries.llm_text import (
        winnow_pairs_fast,
    )
    from training_flink_sql_cc_src_spark.registry import all_queries

    texts = []
    fam_letters = "abcdefgh"
    for fam, ch in enumerate(fam_letters):
        body = "".join(f"{ch}{i % 10}{ch}{(i + 3) % 10}" for i in range(30))
        for _copy in range(3):
            texts.append(body)
    for j, ch in enumerate("qrstuvwxyz"):  # singletons: no pairs
        texts.append("".join(f"{ch}{i % 7}" for i in range(40)))

    rows = [(i, t) for i, t in enumerate(texts)]
    tmp = tmp_path / "winnowfast"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp / "documents.parquet")
    )

    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in all_queries()["dedup_winnow_pairs"](spark, str(tmp)).collect()
    }
    fast_pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_pairs_fast(spark, str(tmp)).collect()
    }
    n_fam = len(fam_letters)
    want = {
        (3 * f + a, 3 * f + b)
        for f in range(n_fam)
        for a in range(3)
        for b in range(a + 1, 3)
    }
    assert md5_pairs == want
    assert fast_pairs == want


def test_fast_selector_density_and_determinism():
    """The uint64 selector keeps the winnowing density guarantee
    (<= 2/(w+1) expected, >= 1 fingerprint per complete window) and is
    deterministic across calls — the properties the production variant
    actually relies on."""
    import numpy as np

    from training_flink_sql_cc_src_spark.queries.llm_text import (
        _winnow_wmins_u64,
    )

    rng = random.Random(2718)
    alpha = "abcdefgh é中 "
    for _ in range(30):
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(WINNOW_T, 400)))
        w1 = _winnow_wmins_u64(text)
        w2 = _winnow_wmins_u64(text)
        assert (w1 == w2).all()
        n_windows = len(text) - K_WINNOW + 1 - (W_WINNOW - 1)
        assert len(w1) == n_windows
        # every window contributed its min -> gaps between consecutive
        # DISTINCT selections are <= w positions (the winnowing bound)
        assert np.unique(w1).size >= max(1, n_windows // (K_WINNOW * W_WINNOW))
