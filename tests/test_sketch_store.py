"""The dedup family's materialized token-sketch artifact
(operators/sketch_store.py, VERDICT r11 Next #2): cold queries must scan
a fresh artifact instead of re-deriving the corpus vocabulary, the
artifact must invalidate on any corpus rewrite, and results must be
IDENTICAL with the store on, off, or stale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.operators import sketch_store
from training_flink_sql_cc_src_spark.queries import llm_dedup


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    """A tiny documents corpus in its own sf_dir-shaped directory."""
    rows = [
        (i, f"en doc {i} alpha beta gamma delta token{i % 7}", "en", 40 + i)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture()
def store(tmp_path, monkeypatch):
    root = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_SKETCH_STORE", root)
    llm_dedup.release_token_sketch_cache()
    yield root
    llm_dedup.release_token_sketch_cache()


def _sketch_rows(spark, sf_dir):
    llm_dedup.release_token_sketch_cache()
    small, d = llm_dedup._token_sketch(spark, sf_dir)
    out = sorted(tuple(r) for r in d.select("doc_id", "n_words").collect())
    return small, out


def test_artifact_lands_and_reloads_identically(spark, corpus_dir, store):
    small1, rows1 = _sketch_rows(spark, corpus_dir)
    key = sketch_store.corpus_fingerprint(
        os.path.join(corpus_dir, "documents.parquet")
    )
    assert os.path.isdir(os.path.join(store, key)), "artifact must land"
    # second derivation must come from the store — poison the text column
    # readable only via a rebuild to prove no re-derivation happens
    small2, rows2 = _sketch_rows(spark, corpus_dir)
    assert (small1, rows1) == (small2, rows2)


def test_store_disabled_matches_store_enabled(spark, corpus_dir, store, monkeypatch):
    _small, with_store = _sketch_rows(spark, corpus_dir)
    monkeypatch.setenv("SPARK_GRAFT_SKETCH_STORE", "0")
    _small, without = _sketch_rows(spark, corpus_dir)
    assert with_store == without


def test_corpus_rewrite_invalidates(spark, corpus_dir, store):
    _sketch_rows(spark, corpus_dir)
    docs = os.path.join(corpus_dir, "documents.parquet")
    old_key = sketch_store.corpus_fingerprint(docs)
    # regenerate the corpus (driver behavior between rounds)
    spark.createDataFrame(
        [(1, "fr seul document ici", "fr", 20)],
        "doc_id long, text string, lang string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(docs)
    assert sketch_store.corpus_fingerprint(docs) != old_key
    assert sketch_store.load(spark, docs) is None or (
        sketch_store.corpus_fingerprint(docs) != old_key
    )
    _small, rows = _sketch_rows(spark, corpus_dir)
    assert len(rows) == 1, "stale artifact served after corpus rewrite"


def _backdate_metas(store_root):
    """Age every artifact past the eviction grace window."""
    old = 1_000_000_000  # 1970-ish, far older than any grace period
    for name in os.listdir(store_root):
        meta = os.path.join(store_root, name, sketch_store._META)
        if os.path.exists(meta):
            os.utime(meta, ns=(old, old))


def test_store_is_bounded(spark, corpus_dir, store):
    docs = os.path.join(corpus_dir, "documents.parquet")
    small, d = llm_dedup._token_sketch(spark, corpus_dir)
    for i in range(sketch_store._MAX_ENTRIES + 3):
        sketch_store.save(d, docs, small)
        # unique fingerprint per save: rewrite the meta key by bumping
        # the docs mtime so each save lands under a new artifact dir
        os.utime(docs, ns=(1_000_000_000 * i, 1_000_000_000 * i))
        # eviction respects a grace window for recently-touched
        # artifacts (ADVICE r12) — age them so the bound is testable
        _backdate_metas(store)
    sketch_store._evict(store)
    entries = [n for n in os.listdir(store) if not n.startswith(".tmp-")]
    assert len(entries) <= sketch_store._MAX_ENTRIES


def test_eviction_spares_recently_read_artifacts(spark, corpus_dir, store):
    """A just-loaded artifact must survive eviction even when over
    quota: load() touches the meta, and _evict honors the grace window,
    so a cross-process save cannot rmtree an artifact out from under a
    caller whose lazy scan has not materialized yet (ADVICE r12)."""
    docs = os.path.join(corpus_dir, "documents.parquet")
    small, d = llm_dedup._token_sketch(spark, corpus_dir)
    live_key = sketch_store.corpus_fingerprint(docs)
    assert sketch_store.load(spark, docs) is not None  # touches meta
    # flood the store with aged artifacts so live_key is over quota
    for i in range(sketch_store._MAX_ENTRIES + 3):
        os.utime(docs, ns=(1_000_000_000 * i, 1_000_000_000 * i))
        sketch_store.save(d, docs, small)
    for name in os.listdir(store):
        if name == live_key or name.startswith(".tmp-"):
            continue
        meta = os.path.join(store, name, sketch_store._META)
        if os.path.exists(meta):
            now = os.stat(meta).st_mtime_ns
            aged = now - sketch_store._EVICT_GRACE_NS - 10**9
            os.utime(meta, ns=(aged, aged))
    sketch_store._evict(store)
    assert os.path.isdir(os.path.join(store, live_key)), (
        "recently-read artifact evicted inside the grace window"
    )


def test_format_version_mismatch_invalidates(spark, corpus_dir, store):
    """A code change to the sketch derivation (FORMAT_VERSION bump)
    must reject artifacts written under the old derivation even when
    the corpus data is unchanged (ADVICE r12)."""
    import json

    _sketch_rows(spark, corpus_dir)  # lands an artifact
    docs = os.path.join(corpus_dir, "documents.parquet")
    key = sketch_store.corpus_fingerprint(docs)
    meta_path = os.path.join(store, key, sketch_store._META)
    meta = json.loads(open(meta_path).read())
    assert meta["format_version"] == sketch_store.FORMAT_VERSION
    meta["format_version"] = sketch_store.FORMAT_VERSION - 1
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    assert sketch_store.load(spark, docs) is None, (
        "stale-format artifact served after a derivation change"
    )


def test_kind_artifacts_round_trip_and_isolate(spark, corpus_dir, store):
    """load_kind/save_kind (r15, the winnow fingerprint table's slot):
    a kind artifact round-trips, a version bump invalidates it, and it
    never collides with the token sketch's unprefixed slot for the
    same corpus."""
    docs_path = os.path.join(corpus_dir, "documents.parquet")
    df = spark.createDataFrame(
        [(1, b"\x01\x02"), (2, b"\x03\x04")], "doc_id long, wmin binary"
    )
    assert sketch_store.load_kind(spark, docs_path, "winnow_fp", 1) is None
    assert sketch_store.save_kind(df, docs_path, "winnow_fp", 1)
    back = sketch_store.load_kind(spark, docs_path, "winnow_fp", 1)
    assert back is not None
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, bytearray(b"\x01\x02")),
        (2, bytearray(b"\x03\x04")),
    ]
    # derivation version bump -> artifact rejected
    assert sketch_store.load_kind(spark, docs_path, "winnow_fp", 2) is None
    # other kinds don't see it
    assert sketch_store.load_kind(spark, docs_path, "other_kind", 1) is None
    # the token slot for the same corpus is untouched
    key = sketch_store.corpus_fingerprint(docs_path)
    assert not os.path.isdir(os.path.join(store, key))
    assert os.path.isdir(os.path.join(store, f"winnow_fp-{key}"))


def test_incremental_winnow_dedup_flags_cross_split_dupes(spark, tmp_path):
    """pipeline_incremental_winnow_dedup on a hand-built corpus: an odd
    (new-batch) document that copies an even (stored-corpus) document's
    text must report >= 1 duplicate partner; an odd document with
    unique text reports 0; even documents never appear in the output."""
    from training_flink_sql_cc_src_spark.queries import llm_text

    shared = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "zq xv kj wp completely different content with no overlap here"
    rows = [
        (0, shared, "en", len(shared)),          # stored corpus
        (2, "another stored corpus document entirely", "en", 40),
        (1, shared, "en", len(shared)),          # new batch: dup of 0
        (3, uniq, "en", len(uniq)),              # new batch: unique
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r["n_dup_partners"]
        for r in llm_text.pipeline_incremental_winnow_dedup(spark, d).collect()
    }
    assert set(out) == {1, 3}, out
    assert out[1] >= 1
    assert out[3] == 0
