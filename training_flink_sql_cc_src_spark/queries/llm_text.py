"""[C] Text analysis over the documents table (SURVEY.md §2.9): token
counting, quality scoring, language-ID heuristic, document fingerprinting,
per-lang/source rollups.

Everything is built-in string/array expressions (whole-stage codegen) —
token counting is split+size, fingerprints are MD5 (identical hex in every
engine), quality scores are a fixed-order double formula so the value hash
matches the oracle bit-for-bit. No Python in the hot path; at 100 TB these
are map-only over the scan plus one small rollup shuffle.
"""

from __future__ import annotations

import os as _os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketch_store
from ..registry import register
from ._util import DAVG_SQL, DSUM_SQL, davg, dsum, fan_out, t

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
_STOP_SQL = "', '".join(STOPWORDS)

# Winnowing parameters (Schleimer, Wilkerson, Aiken 2003), shared by the
# Spark plans AND the DuckDB oracle templates below so a shape change can
# never silently diverge engine and oracle (VERDICT r13 task 7). The
# winnowing guarantee: any substring match of length >= t = k + w - 1
# (= 11 chars here) shares at least one selected fingerprint; selection
# density <= 2 / (w + 1).
K_WINNOW = 8  # character-gram size k
W_WINNOW = 4  # selection window size w (in grams)
WINNOW_T = K_WINNOW + W_WINNOW - 1  # shortest guaranteed-detected match
#: fingerprints appearing in more than this many documents are suppressed
#: before the pair join (MOSS's boilerplate move) — bounds every posting
#: list so the join is cap-quadratic, never corpus-quadratic
WINNOW_DF_CAP = 50
#: near-duplicate pair threshold: >= this many shared fingerprints
WINNOW_MIN_SHARED = 3
#: md5-hex prefix kept per fingerprint AFTER selection (halves the
#: shuffle/join key width; selection itself compares full hashes)
WINNOW_FP_HEX = 16


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           LENGTH(text) AS n_chars_computed,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
    doc="Token counting (whitespace tokenizer, SURVEY.md north-star text "
    "analysis): token/distinct-token/char counts and mean token length "
    "per document.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_computed"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_tokens, stop_ratio, ttr,
           (0.0 + LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                + stop_ratio * 0.3 + ttr * 0.3) AS quality_score
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains(['{_STOP_SQL}'], x))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    )
    """,
    doc="Quality scoring (length / stopword-ratio / type-token-ratio blend "
    "— the heuisics a pretraining filter applies; SURVEY.md north-star). "
    "Fixed-order double formula, bit-identical across engines.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
                "double"
            )
            / F.size(toks)
        ).alias("stop_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "stop_ratio",
        "ttr",
        (
            F.lit(0.0)
            + F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
            + F.col("stop_ratio") * 0.3
            + F.col("ttr") * 0.3
        ).alias("quality_score"),
    )


@register(
    "text_langid_heuristic",
    oracle="""
    SELECT doc_id, lang AS lang_true,
           CASE WHEN text LIKE '%stream%' AND text LIKE '%the%' THEN 'en'
                WHEN LENGTH(text) % 5 = 0 THEN 'fr'
                WHEN LENGTH(text) % 5 = 1 THEN 'de'
                WHEN LENGTH(text) % 5 = 2 THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM documents
    """,
    doc="Language-ID heuristic (marker-token + deterministic fallback — "
    "SURVEY.md north-star text analysis; the fixture corpus is synthetic "
    "word-salad so the rule set is a structural stand-in: real marker "
    "lists drop in without changing the plan — a map-only CASE cascade).",
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        F.when(
            F.col("text").like("%stream%") & F.col("text").like("%the%"), "en"
        )
        .when(F.length("text") % 5 == 0, "fr")
        .when(F.length("text") % 5 == 1, "de")
        .when(F.length("text") % 5 == 2, "es")
        .otherwise("und")
        .alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS full_md5,
           md5(SUBSTRING(text, 1, 64)) AS head_md5,
           md5(CONCAT(CAST(LENGTH(text) AS VARCHAR), ':',
                      SUBSTRING(text, 1, 16))) AS shape_key
    FROM documents
    """,
    doc="Document fingerprinting (SURVEY.md north-star): full-content MD5, "
    "head-chunk MD5, and a length+prefix shape key — the join keys an "
    "exact-dedup pass uses. MD5 hex is engine-independent, so this is "
    "oracle-matched (unlike xxhash64 sketches, which are engine-specific).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("full_md5"),
        F.md5(F.substring("text", 1, 64)).alias("head_md5"),
        F.md5(
            F.concat(
                F.length("text").cast("string"), F.lit(":"), F.substring("text", 1, 16)
            )
        ).alias("shape_key"),
    )


#: gram hashes per document as a JVM array expression: g[i] = md5 of the
#: k-gram starting at 1-based character i. Map-side only — the r13 plan
#: exploded every gram (~n_chars rows/doc of 32-char MD5 strings) and
#: paid a full shuffle (Window.partitionBy(doc_id)) for a window-min
#: that never crosses a document; at 100 TB that shuffles ~30x the
#: corpus bytes for a per-row-local computation (VERDICT r13 #3).
#: per-worker memo of md5 hex by k-gram text (r15, guide §4.5 "heavy
#: state once per task" applied to a pure function): character k-grams
#: repeat Zipf-style across positions and documents, so most lookups
#: hit; a hit replaces an md5 + hexdigest + bytes-encode with one dict
#: probe. Values are a pure function of the key, so memoization cannot
#: change any result. Bounded: cleared when it reaches ~1M entries
#: (~150 MB worst case), far below the worker memory the Arrow batches
#: already need. Lives at module level so a reused worker process
#: (spark.python.worker.reuse, default on) keeps it across tasks —
#: this module is importable on executors (ensure_package_shipped).
_GRAM_MD5_MEMO: dict[str, str] = {}
_GRAM_MD5_MEMO_MAX = 1 << 20


def _winnow_wmins(text: str) -> list[str]:
    """Window minima for one document: md5-hex every k-gram (code-point
    slice, UTF-8 bytes — exactly Spark substring+md5 and DuckDB
    substr+md5 semantics, pinned by tests/test_winnow_property.py), then
    each complete w-window's lexicographic MIN hex. Caller guarantees
    len(text) >= WINNOW_T.

    Why Python here and not Catalyst array expressions: Spark's
    higher-order functions (transform/slice/array_min) are INTERPRETED —
    no whole-stage codegen — and each window evaluation allocates a
    slice copy, measured ~100k gram hashes/s per core; CPython hashlib
    runs the same md5 at ~1.4M/s per core (14x), so the Arrow-batched
    UDF is the fast path by an order of magnitude (sf3z fingerprints
    ~23 s -> ~2 s on 32 cores). An earlier all-JVM attempt also hit a
    CollapseProject trap: a single-use gram-array projection gets
    inlined into the selection lambda, re-evaluating ALL n gram hashes
    per window position — O(n^2) md5 per document. The per-row helper
    keeps the oracle contract byte-identical (md5 hex, lexicographic
    window min)."""
    from hashlib import md5 as _md5

    memo = _GRAM_MD5_MEMO
    if len(memo) >= _GRAM_MD5_MEMO_MAX:
        memo.clear()
    n = len(text) - (K_WINNOW - 1)
    grams = []
    for i in range(n):
        g = text[i : i + K_WINNOW]
        h = memo.get(g)
        if h is None:
            h = _md5(g.encode("utf-8")).hexdigest()
            memo[g] = h
        grams.append(h)
    return [
        min(grams[i : i + W_WINNOW])
        for i in range(n - (W_WINNOW - 1))
    ]


@register(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, s,
               md5(substr(text, CAST(s AS INTEGER), {K_WINNOW})) AS h,
               len(text) - {K_WINNOW - 1} AS n_g
        FROM documents,
             UNNEST(range(1, GREATEST(len(text) - {K_WINNOW - 2}, 1))) AS t(s)
        WHERE len(text) >= {K_WINNOW}
    ), w AS (
        SELECT doc_id, s, n_g,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN CURRENT ROW AND {W_WINNOW - 1} FOLLOWING)
                   AS wmin
        FROM g
    )
    SELECT doc_id,
           CAST(MAX(n_g) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
           MIN(wmin) AS min_fp,
           MAX(wmin) AS max_fp
    FROM w
    WHERE s + {W_WINNOW - 1} <= n_g
    GROUP BY doc_id
    """,
    doc="WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken "
    "2003 — the MOSS rolling-hash fingerprinting; 'document "
    "fingerprinting (rolling hash)' in the training-pipeline operator "
    "list): per document, hash every character k-gram, slide a "
    "w-hash window, keep each window's MINIMUM — the winnowing "
    "guarantee picks at least one fingerprint per w consecutive "
    "grams, density <= 2/(w+1), so two documents sharing any run of "
    ">= k+w-1 characters share a fingerprint. Hashes are md5 hex "
    "(engine-independent, unlike xxhash64), window-min compares "
    "lexicographically — identical in both engines, so the whole "
    "relation is hash-matched. Plan (replanned r14, VERDICT r13 #3): "
    "grams and window minima are computed per document row inside an "
    "Arrow-batched mapInPandas (_winnow_wmins — CPython hashlib runs "
    "the md5 14x faster than Spark's interpreted higher-order-function "
    "lambdas, the measured fast path) — ZERO shuffle, the query is a "
    "pure map over the scan; the r13 plan's explode + "
    "Window.partitionBy(doc_id) shuffled ~30x the corpus bytes to "
    "compute the same per-document-local minima.",
)
def text_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = fan_out(
        t(spark, sf_dir, "documents")
        .filter(F.length("text") >= WINNOW_T)
        .select("doc_id", "text")
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                wm = _winnow_wmins(text)
                rows.append(
                    (
                        doc_id,
                        len(text) - (K_WINNOW - 1),
                        len(set(wm)),
                        min(wm),
                        max(wm),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_grams",
                    "n_fingerprints",
                    "min_fp",
                    "max_fp",
                ],
            )

    return d.mapInPandas(
        stats,
        "doc_id long, n_grams long, n_fingerprints long, "
        "min_fp string, max_fp string",
    )


def _winnow_fp_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, wmin long) — one row per SELECTED winnowing
    fingerprint of each document. Selection runs in the same
    Arrow-batched helper as text_winnow_fingerprints (_winnow_wmins —
    see its docstring for why Python beats the interpreted-HOF JVM path
    10x here): per-document distinct (== the oracle's global DISTINCT
    since doc_id is in the key), 16-hex truncation applied AFTER
    window-min so the selection compares full hashes identically to the
    oracle, and the truncated hex bit-cast to a SIGNED 64-bit long — a
    BIJECTIVE transform (pair counts identical; the fingerprint never
    reaches the output), so every downstream join/aggregate keys on a
    fixed-width primitive instead of a variable-length binary (r16,
    guide §2.3 narrower types: an UnsafeRow binary(8) costs
    length + padded bytes ≈ 2x the long, and long equality is a
    codegen primitive compare). Callers must pre-filter length >=
    WINNOW_T."""

    def selected(batches):
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for h in {w[:WINNOW_FP_HEX] for w in _winnow_wmins(text)}:
                    ids.append(doc_id)
                    fps.append(
                        int.from_bytes(bytes.fromhex(h), "big", signed=True)
                    )
            yield pd.DataFrame({"doc_id": ids, "wmin": fps})

    return docs.mapInPandas(selected, "doc_id long, wmin long")


@register(
    "dedup_winnow_pairs",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, s,
               md5(substr(text, CAST(s AS INTEGER), {K_WINNOW})) AS h,
               len(text) - {K_WINNOW - 1} AS n_g
        FROM documents,
             UNNEST(range(1, GREATEST(len(text) - {K_WINNOW - 2}, 1))) AS t(s)
        WHERE len(text) >= {K_WINNOW}
    ), w AS (
        SELECT doc_id, s, n_g,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN CURRENT ROW AND {W_WINNOW - 1} FOLLOWING)
                   AS wmin
        FROM g
    ), fp AS (
        SELECT DISTINCT doc_id, substr(wmin, 1, {WINNOW_FP_HEX}) AS wmin
        FROM w WHERE s + {W_WINNOW - 1} <= n_g
    ), rare AS (
        SELECT wmin FROM fp GROUP BY wmin
        HAVING COUNT(*) BETWEEN 2 AND {WINNOW_DF_CAP}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fp a
    JOIN rare r ON a.wmin = r.wmin
    JOIN fp b ON b.wmin = a.wmin AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """,
    doc="MOSS-style near-duplicate PAIRS from winnowing fingerprints "
    "(Schleimer et al. 2003 §4's matching step): documents sharing "
    ">= 3 selected fingerprints — i.e. >= 3 distinct common character "
    "runs the winnowing guarantee certifies. Fingerprints appearing "
    "in > 50 documents are suppressed BEFORE the pair join (the "
    "paper's own boilerplate/common-code move), which bounds every "
    "posting list: the join is posting-list-quadratic only within the "
    "cap, never corpus-quadratic — the same Zipf defense as the "
    "rare-token prefix plans. Fingerprint SELECTION is map-side "
    "(replanned r14, see text_winnow_fingerprints — Arrow-batched "
    "_winnow_wmins): only the ~2/(w+1)-density selected fingerprints, "
    "truncated and bit-cast to signed longs, ever leave the map stage — "
    "the exploded-gram shuffle is gone; the remaining shuffles are "
    "the posting-list aggregation and the capped pair join, both on "
    "the small fp relation.",
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        t(spark, sf_dir, "documents")
        .filter(F.length("text") >= WINNOW_T)
        .select("doc_id", "text")
    )

    # fp feeds THREE consumers (df filter + both pair-join sides) —
    # materialize once, as bigram tf does.
    fp = _winnow_fp_frame(d).localCheckpoint(eager=False)
    rare = (
        fp.groupBy("wmin")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= WINNOW_DF_CAP))
        .select("wmin")
    )
    fa = fp.join(rare, "wmin").select(
        F.col("doc_id").alias("id_a"), "wmin"
    )
    fb = fp.select(F.col("doc_id").alias("id_b"), "wmin")
    return (
        fa.join(fb, "wmin")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


#: rolling-hash parameters for the PRODUCTION winnowing variant
#: (winnow_pairs_fast): FNV-prime base for the Horner gram hash,
#: splitmix64 finalizer constants for uniformity. Engine-side only —
#: never oracle-checked (DuckDB cannot replay numpy uint64 wraparound),
#: which is exactly why md5-hex stays the registered default.
_WINNOW_FAST_B = 1099511628211
_WINNOW_FAST_M1 = 0xBF58476D1CE4E5B9
_WINNOW_FAST_M2 = 0x94D049BB133111EB


def _winnow_wmins_u64(text: str):
    """Production-hash window minima for one document: uint64 polynomial
    rolling hash over code points (Horner over the UTF-32 buffer, the
    winnowing paper's own rolling-hash formulation) + splitmix64
    finalizer, sliding-window min — ALL numpy-vectorized, no per-gram
    Python objects. Measured 3.6x faster than the md5 selector on
    300-char docs and 16x on 3000-char docs (per-doc numpy setup
    amortizes with length); md5-hex stays the default because its hex
    relation is what DuckDB can replay (see _winnow_wmins). Same
    winnowing guarantee — any hash gives density <= 2/(w+1) and
    shared-run detection; only fingerprint VALUES differ. Caller
    guarantees len(text) >= WINNOW_T."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    n = c.size - (K_WINNOW - 1)
    h = np.zeros(n, dtype=np.uint64)
    b = np.uint64(_WINNOW_FAST_B)
    for j in range(K_WINNOW):
        h = h * b + c[j : j + n]
    h ^= h >> np.uint64(30)
    h = h * np.uint64(_WINNOW_FAST_M1)
    h ^= h >> np.uint64(27)
    h = h * np.uint64(_WINNOW_FAST_M2)
    h ^= h >> np.uint64(31)
    return sliding_window_view(h, W_WINNOW).min(axis=1)


def winnow_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPLOYMENT variant of dedup_winnow_pairs (VERDICT r14 plan-audit
    note): identical plan shape — map-side Arrow-batched selection,
    df-capped posting lists, pair join, n_shared threshold — but
    fingerprints come from the vectorized uint64 rolling hash
    (_winnow_wmins_u64) instead of md5-hex, and the join key is a
    plain LONG (no hex, no binary packing). md5 costs ~10x the CPU of
    a rolling hash whose only requirement is uniformity, so this is
    the variant a real 100 TB run uses; it is NOT driver-registered
    because the hash is engine-specific (DuckDB cannot replay numpy
    uint64 wraparound) — its correctness evidence is
    tests/test_winnow_property.py::test_fast_variant_same_pairs_on_collision_free_corpus,
    which pins identical PAIR SETS to the md5 engine on a corpus
    where both hashes are collision-free."""
    import numpy as np

    d = fan_out(
        t(spark, sf_dir, "documents")
        .filter(F.length("text") >= WINNOW_T)
        .select("doc_id", "text")
    )

    def selected(batches):
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                u = np.unique(_winnow_wmins_u64(text))
                ids.append(
                    np.full(u.size, doc_id, dtype=np.int64)
                )
                # uint64 -> int64 bit-cast: Spark LongType is signed;
                # the cast is bijective so pair counts are unaffected
                fps.append(u.view(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else [],
                    "wmin": np.concatenate(fps) if fps else [],
                }
            )

    fp = d.mapInPandas(
        selected, "doc_id long, wmin long"
    ).localCheckpoint(eager=False)
    rare = (
        fp.groupBy("wmin")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= WINNOW_DF_CAP))
        .select("wmin")
    )
    fa = fp.join(rare, "wmin").select(F.col("doc_id").alias("id_a"), "wmin")
    fb = fp.select(F.col("doc_id").alias("id_b"), "wmin")
    return (
        fa.join(fb, "wmin")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


#: sketch_store artifact kind + derivation version for the stored corpus
#: winnowing fingerprint table. Same maintenance contract as the token
#: sketch's FORMAT_VERSION: bump the version whenever _winnow_fp_frame /
#: _winnow_wmins (k, w, truncation, packing) or the corpus split
#: predicate changes, or stored artifacts keep serving the old shape.
WINNOW_STORE_KIND = "winnow_fp"
WINNOW_STORE_VERSION = 2  # r16: wmin binary(8) -> signed long bit-cast


def _corpus_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, wmin) winnowing fingerprints of the HISTORICAL corpus
    (even doc_ids), served from the versioned on-disk sketch store
    (operators/sketch_store, kind='winnow_fp') — the maintained-table
    lifecycle: fingerprint the corpus ONCE when it changes, then every
    daily incremental batch reads the artifact back as one parquet
    scan. Cold derivation (store miss / disabled) computes the frame
    with the same Arrow-batched selector the pair query uses and
    materializes it for the next caller; freshness is file-fingerprint
    keyed, so a driver data regeneration re-derives automatically."""
    docs_path = _os.path.join(sf_dir, "documents.parquet")
    stored = sketch_store.load_kind(
        spark, docs_path, WINNOW_STORE_KIND, WINNOW_STORE_VERSION
    )
    if stored is not None:
        return stored
    corp = fan_out(
        t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 2 == 0) & (F.length("text") >= WINNOW_T))
        .select("doc_id", "text")
    )
    fp = _winnow_fp_frame(corp)
    if sketch_store.save_kind(
        fp, docs_path, WINNOW_STORE_KIND, WINNOW_STORE_VERSION
    ):
        reread = sketch_store.load_kind(
            spark, docs_path, WINNOW_STORE_KIND, WINNOW_STORE_VERSION
        )
        if reread is not None:
            return reread
    # store disabled/unwritable: hold the derived frame so its two
    # consumers (df filter + pair join) do not re-fingerprint the corpus
    return fp.localCheckpoint(eager=False)


@register(
    "pipeline_incremental_winnow_dedup",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, s,
               md5(substr(text, CAST(s AS INTEGER), {K_WINNOW})) AS h,
               len(text) - {K_WINNOW - 1} AS n_g
        FROM documents,
             UNNEST(range(1, GREATEST(len(text) - {K_WINNOW - 2}, 1))) AS t(s)
        WHERE len(text) >= {K_WINNOW}
    ), w AS (
        SELECT doc_id, s, n_g,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN CURRENT ROW AND {W_WINNOW - 1} FOLLOWING)
                   AS wmin
        FROM g
    ), fp AS (
        SELECT DISTINCT doc_id, substr(wmin, 1, {WINNOW_FP_HEX}) AS wmin
        FROM w WHERE s + {W_WINNOW - 1} <= n_g
    ), corp AS (
        SELECT doc_id, wmin FROM fp WHERE doc_id % 2 = 0
    ), newb AS (
        SELECT doc_id, wmin FROM fp WHERE doc_id % 2 = 1
    ), rare AS (
        SELECT wmin FROM corp GROUP BY wmin
        HAVING COUNT(*) <= {WINNOW_DF_CAP}
    ), pairs AS (
        SELECT n.doc_id AS doc_id, c.doc_id AS id_old
        FROM newb n
        JOIN rare r ON n.wmin = r.wmin
        JOIN corp c ON c.wmin = n.wmin
        GROUP BY n.doc_id, c.doc_id
        HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    )
    SELECT i.doc_id, CAST(COUNT(p.id_old) AS BIGINT) AS n_dup_partners
    FROM (SELECT DISTINCT doc_id FROM newb) i
    LEFT JOIN pairs p ON p.doc_id = i.doc_id
    GROUP BY i.doc_id
    """,
    doc="INCREMENTAL winnowing dedup — the daily-ingest shape of "
    "dedup_winnow_pairs (Schleimer et al. 2003 matching step, "
    "incrementalized): a NEW batch (odd doc_ids) is fingerprinted with "
    "the shared Arrow-batched selector and checked against the STORED "
    "fingerprint table of the historical corpus (even doc_ids, served "
    "from the versioned sketch store — the corpus is never "
    "re-fingerprinted, only its (doc_id, wmin) artifact is scanned). "
    "Common-fingerprint suppression uses CORPUS document frequency "
    "(<= WINNOW_DF_CAP, the MOSS boilerplate move) so every posting "
    "list the new batch joins into is bounded; a new document is a "
    "near-duplicate of a stored one when they share >= "
    "WINNOW_MIN_SHARED selected fingerprints. Output is the full "
    "new-batch audit relation (doc_id, n_dup_partners) — survivors "
    "carry 0, so both the keep-list and the drop-list are one filter "
    "away. At 100 TB: new-batch fingerprints are tiny vs the corpus, "
    "the join shuffles on wmin where the stored table is bucketed in "
    "production, and the df cap bounds per-fingerprint fan-out at 50 "
    "corpus partners regardless of corpus size.",
)
def pipeline_incremental_winnow_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    corp_fp = _corpus_winnow_fp(spark, sf_dir)
    newd = fan_out(
        t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 2 == 1) & (F.length("text") >= WINNOW_T))
        .select("doc_id", "text")
    )
    # two consumers (pair join + the keep-all id list) — select once
    new_fp = _winnow_fp_frame(newd).localCheckpoint(eager=False)
    rare = (
        corp_fp.groupBy("wmin")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .select("wmin")
    )
    pairs = (
        new_fp.join(rare, "wmin")
        .join(
            corp_fp.select(F.col("doc_id").alias("id_old"), "wmin"), "wmin"
        )
        .groupBy("doc_id", "id_old")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .select("doc_id", "id_old")
    )
    return (
        new_fp.select("doc_id")
        .distinct()
        .join(pairs, "doc_id", "left")
        .groupBy("doc_id")
        .agg(F.count("id_old").cast("long").alias("n_dup_partners"))
    )


@register(
    "text_lang_source_rollup",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           {DSUM_SQL.format(x='n_chars')} AS total_chars,
           {DAVG_SQL.format(x='n_chars')} AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus rollup by (lang, source) — the partition-level stats a "
    "training-data pipeline tracks per shard (SURVEY.md north-star).",
)
def text_lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dsum("n_chars").alias("total_chars"),
            davg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


BPE_ISH_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS DOUBLE)
               / len(string_split(text, ' ')) AS bpe_per_word
    FROM documents
    """,
    doc="Token counting with a BPE-ish regex (SURVEY.md north-star: "
    "'whitespace + a BPE-ish regex'): GPT-2-style pre-tokenizer pattern "
    "(space-prefixed letter runs / digit runs / punctuation runs — "
    "restricted to the RE2∩Java-regex common subset so both engines "
    "tokenize identically), compared against the whitespace count. "
    "Map-only regex scan in codegen.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    ws = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        (F.size(bpe).cast("double") / F.size(ws)).alias("bpe_per_word"),
    )


@register(
    "text_repetition_filter",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang,
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1]) AS bigrams
        FROM documents
    ), r AS (
        SELECT doc_id, lang, len(bigrams) AS n_bg,
               len(list_distinct(bigrams)) AS n_distinct
        FROM g WHERE len(bigrams) > 0
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE 4 * (n_bg - n_distinct) > n_bg)
               AS n_repetitive
    FROM r GROUP BY lang
    """,
    doc="Intra-document repetition filter (the Gopher/MassiveText-style "
    "quality rule: flag documents whose repeated-2-gram fraction exceeds "
    "25%). Bigrams are a map-side transform over the token array, the "
    "ratio an exact integer comparison (4*(n - distinct) > n — no float "
    "threshold), and the rollup one tiny shuffle. Scan-side at any "
    "scale; per-language counts hash-verified.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("words", i), F.element_at("words", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    r = d.select(
        "lang",
        F.size(bigrams).alias("n_bg"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct"),
    ).filter(F.col("n_bg") > 0)
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (
                4 * (F.col("n_bg") - F.col("n_distinct")) > F.col("n_bg")
            ).cast("long")
        ).alias("n_repetitive"),
    )


@register(
    "text_vocabulary_topk",
    oracle="""
    SELECT lang, token, n, rnk FROM (
        SELECT lang, token, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY COUNT(*) DESC, token ASC) AS rnk
        FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY lang, token
    ) WHERE rnk <= 10
    """,
    doc="Vocabulary extraction: top-10 tokens per language by frequency "
    "(the tokenizer-training prestep). Explode -> count (partial agg "
    "combines map-side, so the shuffle carries (lang, token) partial "
    "counts, not token instances) -> rank pushdown Top-N. Token-name "
    "tiebreak pins determinism for equal counts.",
)
def text_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 10
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                   / CAST(df.df AS DOUBLE) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                            / CAST(df.df AS DOUBLE) DESC, tf.term
               ) AS rnk
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document (keyword extraction, the "
    "classic retrieval/data-curation signal). The idf weight is the "
    "RATIONAL form N/df rather than ln(N/df): monotone-identical "
    "ranking, and IEEE double division is bit-deterministic across "
    "engines where ln's last ulp is not (registry hash rule). Scale: "
    "explode -> one (doc,term) count shuffle; df is a second aggregate "
    "over the (term) key; the tf-df join shuffles on term (vocabulary "
    "is unbounded at 100 TB, so no broadcast hint); the corpus count is "
    "a 1-row broadcast aggregate fused into the same job (no separate "
    "count() action); per-doc top-3 rides WindowGroupLimit (O(k) "
    "map-side state). Ties break on term.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    # corpus size as a 1-row aggregate cross-joined into the plan (the
    # q22 scalar-subquery trick) — fuses into the single job instead of
    # a separate driver-side d.count() action
    n = d.agg(F.count("*").cast("double").alias("__n_docs"))
    # tf feeds BOTH the df aggregation and the final scoring join, but
    # Catalyst prunes the two branches differently (the df branch drops
    # the count), so the common exchange is not reused and the
    # scan+explode+aggregate pass ran twice (r15 plan audit: 2 corpus
    # text scans -> 1). Materialize it once — the (doc,term) tf table
    # is the natural intermediate of any TF-IDF job at 100 TB too.
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    score = (
        F.col("tf").cast("double")
        * F.col("__n_docs")
        / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(
        score.desc(), F.col("term")
    )
    return (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", F.col("rnk").cast("long").alias("rnk"))
    )


# DSIR importance-weight CTE chain (shared by pipeline_importance_weights
# and pipeline_dsir_resample): `imp` = (doc_id, importance)
_IW_CTES = """
    tok AS (
        SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ), tgt AS (
        SELECT term, COUNT(*) AS ct FROM tok
        WHERE source = 'web' GROUP BY term
    ), allc AS (
        SELECT term, COUNT(*) AS ct FROM tok GROUP BY term
    ), tot AS (
        SELECT (SELECT COUNT(*) FROM tok WHERE source = 'web') AS nt,
               (SELECT COUNT(*) FROM tok) AS nc,
               (SELECT COUNT(DISTINCT term) FROM tok) AS v
    ), lr AS (
        SELECT a.term,
               ROUND(LN(
                   (CAST(COALESCE(t2.ct, 0) + 1 AS DOUBLE)
                    / CAST(tot.nt + tot.v AS DOUBLE))
                   / (CAST(a.ct + 1 AS DOUBLE)
                      / CAST(tot.nc + tot.v AS DOUBLE))
               ), 9) AS logratio
        FROM allc a LEFT JOIN tgt t2 USING (term) CROSS JOIN tot
    ), imp AS (
        SELECT k.doc_id,
               CAST(SUM(CAST(k.tf AS DECIMAL(12,0)) *
                        CAST(lr.logratio AS DECIMAL(12,9)))
                    AS DOUBLE) AS importance
        FROM (SELECT doc_id, term, COUNT(*) AS tf FROM tok
              GROUP BY doc_id, term) k
        JOIN lr USING (term)
        GROUP BY k.doc_id
    )
"""


@register(
    "pipeline_importance_weights",
    oracle=f"""
    WITH {_IW_CTES}
    SELECT doc_id, importance FROM imp
    """,
    doc="Data-selection importance weights (DSIR-style, Xie et al. 2023, "
    "PAPERS.md): per-document unigram log-likelihood ratio between a "
    "TARGET distribution (source='web' docs) and the whole corpus, "
    "add-1 smoothed. Per-TERM logratios are computed once over the "
    "vocabulary, ROUNDed to 9 decimals (ln's last ulp differs between "
    "libm and the JVM; rounding makes the value hashable), then the "
    "per-doc score is an exact DECIMAL(38,9) dot product of term "
    "frequencies with logratios. Scale: two vocabulary aggregates + "
    "one (doc,term) aggregate + a shuffle join on term — no driver "
    "materialization of the vocabulary, no broadcast of an unbounded "
    "relation.",
)
def pipeline_importance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    tgt = (
        tok.filter(F.col("source") == "web")
        .groupBy("term")
        .agg(F.count("*").alias("ct_t"))
    )
    allc = tok.groupBy("term").agg(F.count("*").alias("ct_c"))
    # corpus totals as a ONE-ROW aggregate broadcast-cross-joined into
    # the logratio projection (the q22 scalar-subquery trick) — no
    # driver-side count() actions; the whole query is a single job
    tot = tok.agg(
        F.count(F.when(F.col("source") == "web", True)).alias("nt"),
        F.count("*").alias("nc"),
        F.count_distinct("term").alias("v"),
    )
    lr = (
        allc.join(tgt, "term", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct_t"), F.lit(0)) + 1)
                        .cast("double")
                        / (F.col("nt") + F.col("v")).cast("double")
                    )
                    / (
                        (F.col("ct_c") + 1).cast("double")
                        / (F.col("nc") + F.col("v")).cast("double")
                    )
                ),
                9,
            ).alias("logratio"),
        )
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return (
        tf.join(lr, "term")
        .groupBy("doc_id")
        .agg(
            # (12,0) x (12,9) keeps precision 25 so Spark preserves
            # scale 9; (38,9) squared would overflow 38 and silently
            # demote the product to scale 6
            F.sum(
                F.col("tf").cast("decimal(12,0)")
                * F.col("logratio").cast("decimal(12,9)")
            )
            .cast("double")
            .alias("importance")
        )
    )


@register(
    "pipeline_dsir_resample",
    oracle=f"""
    WITH {_IW_CTES}
    , draw AS (
        SELECT doc_id, importance,
               ROUND(importance - LN(-LN(
                   CAST((doc_id * 2654435761) % 1048576 + 1 AS DOUBLE)
                   / 1048577.0
               )), 9) AS gumbel_key
        FROM imp
    )
    SELECT doc_id, importance, gumbel_key, CAST(pos AS BIGINT) AS pos
    FROM (
        SELECT doc_id, importance, gumbel_key,
               ROW_NUMBER() OVER (
                   ORDER BY gumbel_key DESC, doc_id) AS pos
        FROM draw
    ) WHERE pos <= 64
    """,
    doc="DSIR importance RESAMPLING draw (Xie et al. 2023 §2: sample "
    "without replacement with probability proportional to exp(weight) "
    "== Gumbel top-k on weight + Gumbel noise): the per-doc importance "
    "from pipeline_importance_weights, perturbed by a Gumbel variate "
    "derived from the repo's deterministic multiplicative-hash uniform "
    "(pure function of doc_id — reproducible across engines and "
    "re-runs, no RNG state), top-64 selected. LN's last-ulp drift is "
    "absorbed by the ROUND(.,9) convention. Scale: the weight "
    "computation's shuffles plus one TakeOrderedAndProject — the "
    "global sort never materializes, only the k winners move.",
)
def pipeline_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    imp = pipeline_importance_weights(spark, sf_dir)
    u = (
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1048576) + 1)
        .cast("double")
        / F.lit(1048577.0)
    )
    draw = imp.withColumn(
        "gumbel_key", F.round(F.col("importance") - F.log(-F.log(u)), 9)
    )
    # TakeOrderedAndProject pre-reduces to 64 rows; the row_number
    # window then ranks only the winners (the bpe_train candidates
    # pattern)
    w = Window.orderBy(F.col("gumbel_key").desc(), "doc_id")
    return (
        draw.orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(64)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "importance", "gumbel_key", "pos")
    )


@register(
    "pipeline_pii_redaction",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\+?\d{3}[- ]\d{3,4}[- ]\d{4}', '<PHONE>', 'g')
               AS redacted,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
               AS BIGINT) AS n_ips
    FROM documents
    """,
    doc="PII redaction (the compliance pass every corpus pipeline "
    "needs): emails, IPv4 addresses, and phone-shaped numbers replaced "
    "with typed placeholders, with per-doc match counts. Pure "
    "regexp_replace/extract_all — map-only whole-stage codegen, zero "
    "shuffles at any scale; patterns chosen from the RE2/PCRE common "
    "subset so Spark (Java regex) and DuckDB (RE2) agree byte-for-byte.",
)
def pipeline_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\+?\d{3}[- ]\d{3,4}[- ]\d{4}"
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"),
            ip,
            "<IP>",
        ),
        phone,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        red.alias("redacted"),
        # idx=0 (whole match) is required: Spark's default idx=1 raises
        # REGEX_GROUP_INDEX on these zero-group patterns when a row matches.
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(ip), 0)).cast("long").alias("n_ips"),
    )


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    SELECT doc_id, n_words,
           (n_words BETWEEN 10 AND 100000) AS r_word_count,
           (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
               AS r_mean_word_len,
           (10 * (n_hash + n_ellipsis) <= n_words) AS r_symbol_ratio,
           (5 * n_alpha_words >= 4 * n_words) AS r_alpha_words,
           (n_stop >= 2) AS r_stopwords,
           (10 * n_bullet_lines <= n_lines
            AND 10 * n_ellipsis_lines <= 3 * n_lines) AS r_lines,
           ((n_words BETWEEN 10 AND 100000)
            AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
            AND 10 * (n_hash + n_ellipsis) <= n_words
            AND 5 * n_alpha_words >= 4 * n_words
            AND n_stop >= 2
            AND 10 * n_bullet_lines <= n_lines
            AND 10 * n_ellipsis_lines <= 3 * n_lines) AS gopher_pass
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               LENGTH(REPLACE(text, ' ', '')) AS n_word_chars,
               LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS n_hash,
               (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3
                   AS n_ellipsis,
               len(list_filter(string_split(text, ' '),
                   x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
               len(list_filter(string_split(text, ' '),
                   x -> list_contains(['{_STOP_SQL}'], x))) AS n_stop,
               len(string_split(text, chr(10))) AS n_lines,
               len(list_filter(string_split(text, chr(10)),
                   x -> x LIKE '-%' OR x LIKE '*%')) AS n_bullet_lines,
               len(list_filter(string_split(text, chr(10)),
                   x -> x LIKE '%...')) AS n_ellipsis_lines
        FROM documents
    )
    """,
    doc="Gopher quality rules (Rae et al. 2021, 'Scaling Language Models: "
    "Methods, Analysis & Insights from Training Gopher', appendix A1.1 — "
    "see PAPERS.md): the published repetition-independent document "
    "filters as one map-only pass — word-count bounds, mean word length "
    "in [3, 10], symbol-to-word ratio (hash + ellipsis), >=80% words "
    "with an alphabetic character, >=2 stopwords, bullet/ellipsis line "
    "ratios. Every rule is an INTEGER inequality (3*n <= chars, 5*alpha "
    ">= 4*n, ...) so the verdict is bit-identical across engines — no "
    "float ratios in the output. The fixture corpus is single-line "
    "word-salad, so the word-count floor is scaled to 10 (the real 50 "
    "drops in without changing the plan) and the line rules are "
    "structurally exercised. 100 TB: map-only over the scan, no "
    "shuffle; the booleans feed the curation anti-join "
    "(pipeline_corpus_curation) without re-reading text.",
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lines = F.split(F.col("text"), "\n")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    rm = lambda pat: F.length("text") - F.length(  # noqa: E731
        F.replace(F.col("text"), F.lit(pat), F.lit(""))
    )
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_word_chars"
        ),
        rm("#").alias("n_hash"),
        (rm("...") / F.lit(3)).cast("long").alias("n_ellipsis"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).alias(
            "n_alpha_words"
        ),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).alias(
            "n_stop"
        ),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(lines, lambda x: x.like("-%") | x.like("*%"))
        ).alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda x: x.like("%..."))).alias(
            "n_ellipsis_lines"
        ),
    )
    r_wc = F.col("n_words").between(10, 100000)
    r_mwl = (3 * F.col("n_words") <= F.col("n_word_chars")) & (
        F.col("n_word_chars") <= 10 * F.col("n_words")
    )
    r_sym = 10 * (F.col("n_hash") + F.col("n_ellipsis")) <= F.col("n_words")
    r_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    r_stop = F.col("n_stop") >= 2
    r_lines = (10 * F.col("n_bullet_lines") <= F.col("n_lines")) & (
        10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines")
    )
    return base.select(
        "doc_id",
        "n_words",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        r_lines.alias("r_lines"),
        (r_wc & r_mwl & r_sym & r_alpha & r_stop & r_lines).alias(
            "gopher_pass"
        ),
    )


@register(
    "text_bigram_lm_score",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ), big AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM tok, UNNEST(GENERATE_SERIES(1, len(w) - 1)) AS u(i)
    ), tf AS (
        SELECT doc_id, w1, w2, COUNT(*) AS tf FROM big
        GROUP BY doc_id, w1, w2
    ), cb AS (
        SELECT w1, w2, SUM(tf) AS cb FROM tf GROUP BY w1, w2
    ), cu AS (
        SELECT w1, SUM(cb) AS cu FROM cb GROUP BY w1
    ), voc AS (
        SELECT COUNT(DISTINCT tk) AS v FROM (
            SELECT UNNEST(string_split(text, ' ')) AS tk FROM documents
        )
    ), lp AS (
        SELECT w1, w2,
               ROUND(LN((CAST(cb AS DOUBLE) + 1)
                        / CAST(cu + v AS DOUBLE)), 9) AS logp
        FROM cb JOIN cu USING (w1) CROSS JOIN voc
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           -CAST(SUM(CAST(tf.tf AS DECIMAL(12,0))
                     * CAST(lp.logp AS DECIMAL(12,9))) AS DOUBLE) AS nll
    FROM tf JOIN lp ON tf.w1 = lp.w1 AND tf.w2 = lp.w2
    GROUP BY tf.doc_id
    """,
    doc="Bigram language-model quality scoring (the classic KenLM-style "
    "perplexity filter, self-trained on the corpus): per document, the "
    "total negative log-likelihood of its word bigrams under an add-1-"
    "smoothed bigram model P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V). Per-TYPE "
    "log-probs computed once over the bigram vocabulary and ROUNDed to "
    "9 decimals (libm-vs-JVM ln ulp, same convention as DSIR), then "
    "the per-doc NLL is an exact DECIMAL dot product of bigram counts "
    "with log-probs; callers divide nll/n_bigrams for the mean (or "
    "exp() of it for perplexity). Scale: the bigram explode is one "
    "map-side pass; counts chain partial aggregates (doc-level tf -> "
    "corpus cb -> context cu); the model join shuffles on the bigram "
    "key — vocabulary is unbounded so correctly NO broadcast; V rides "
    "a one-row broadcast cross join (no driver action).",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    # arrays_zip, not zip_with (r16-prep measured in r15, guide §1.2
    # step 2 "per-task work"): zip_with is a HigherOrderFunction —
    # CodegenFallback, interpreted per element with a lambda-variable
    # binding per token — while ArraysZip is an ordinary codegen
    # expression. Identical output: both slices have equal length
    # size(w)-1, so the padding semantics never differ, and the struct
    # fields are named by the aliases. This explode runs over EVERY
    # corpus token — the hottest expression of the whole query.
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, F.size("w") - 1).alias("w1"),
                F.slice("w", 2, F.size("w") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    # tf feeds BOTH the LM-statistics branch (cb -> cu) and the final
    # per-doc scoring join, but Catalyst does not dedupe common
    # subplans (0 ReusedExchange in the executed plan — the
    # explode+aggregate pass ran twice, 4 corpus scans total).
    # Materialize it once: at 100 TB the per-doc bigram counts are the
    # natural intermediate table of any two-pass LM scoring job (build
    # global stats, then score), and ContextCleaner releases the
    # blocks when the query's last reference drops (bench's gc hook).
    tf = (
        big.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    # cu = SUM(cb) per context w1, attached as a WINDOW sum instead of a
    # separate aggregate + equi join (r15): the join plan computed the
    # cb subtree twice (the cu branch prunes w2, defeating exchange
    # reuse) and paid an extra shuffle for the join; one window over
    # hashpartitioning(w1) produces the identical exact long sum on
    # every cb row in a single pass.
    from pyspark.sql import Window as _W

    voc = d.select(
        F.explode(F.split("text", " ")).alias("tk")
    ).agg(F.count_distinct("tk").alias("v"))
    lp = (
        cb.withColumn("cu", F.sum("cb").over(_W.partitionBy("w1")))
        .crossJoin(F.broadcast(voc))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cb").cast("double") + 1)
                    / (F.col("cu") + F.col("v")).cast("double")
                ),
                9,
            ).alias("logp"),
        )
    )
    return (
        tf.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            (
                -F.sum(
                    F.col("tf").cast("decimal(12,0)")
                    * F.col("logp").cast("decimal(12,9)")
                ).cast("double")
            ).alias("nll"),
        )
    )


@register(
    "text_zipf_vocab_curve",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), freq AS (
        SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    ), tot AS (
        SELECT SUM(freq) AS total FROM freq
    ), ranked AS (
        SELECT token, freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank,
               SUM(freq) OVER (
                   ORDER BY freq DESC, token
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_freq
        FROM freq
    )
    SELECT rank, token, freq,
           CAST(cum_freq AS DOUBLE) / total AS cum_share
    FROM ranked, tot WHERE rank <= 20
    """,
    doc="Zipf frequency curve of the corpus vocabulary — the "
    "rank/frequency/cumulative-coverage table a tokenizer-design or "
    "corpus-diagnostics pass reads (Zipf 1949; the head of this curve "
    "is what vocabulary truncation keeps): global token counts, rank "
    "by (freq DESC, token) (deterministic tie-break), cumulative "
    "coverage share as an exact-integer division (identical double in "
    "both engines). 100 TB plan: ONE shuffle on token for the "
    "partial-aggregated counts, TakeOrderedAndProject for the top-20 "
    "head (no global sort), a 1-row total broadcast back, and the "
    "20-row cumulative window on a single tiny partition.",
)
def text_zipf_vocab_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = freq.agg(F.sum("freq").alias("total"))
    head = freq.orderBy(F.desc("freq"), "token").limit(20)
    w = Window.orderBy(F.desc("freq"), "token").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        head.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("freq"), "token"))
        )
        .withColumn("cum_freq", F.sum("freq").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "freq",
            (F.col("cum_freq").cast("double") / F.col("total")).alias(
                "cum_share"
            ),
        )
    )
