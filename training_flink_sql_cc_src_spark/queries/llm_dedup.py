"""[C] Deduplication over the documents table (SURVEY.md §2.9): exact
(hash group-by), blocked n-gram/word-set Jaccard, MinHash+LSH, SimHash.

Scale notes: exact dedup is one hash shuffle on the content hash; the
Jaccard pass generates candidates with an equi join on a blocking key
(lang, length band) — work scales with block sizes, never n²; MinHash/LSH
signatures are computed map-side with built-in xxhash64 (no Python), and
the band join only shuffles (band, bucket) keys.
"""

from __future__ import annotations

import os as _os
import weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import sketch_store
from ..operators.dedup import (
    lsh_band_pairs,
    minhash_jaccard_estimate,
    minhash_signature,
    simhash64,
    word_shingles,
)
from ..registry import register
from ._util import fan_out, t


@register(
    "dedup_exact_text",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup via content-hash group-by (SURVEY.md §2.9 exact "
    "dedup): one shuffle on md5(text); keeper = min doc_id per group. "
    "Idempotence is property-tested in tests/test_dedup.py.",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


#: sf_dir -> (owner session weakref, small_vocab, persisted sketch frame).
#: The owner is held by WEAK reference and checked by identity against
#: the requesting session: keying on id(spark) (pre-r11) could alias a
#: NEW session allocated at a dead session's address (CPython reuses
#: object ids after GC), resurrecting exactly the stale-persisted-frame
#: failure the cache key exists to prevent (ADVICE r10). A weakref to a
#: dead session returns None, which never compares identical to a live
#: session, so dead entries can only be evicted, never hit.
_TOKEN_SKETCH_CACHE: dict[str, tuple[object, bool, DataFrame]] = {}


def _token_sketch(
    spark: SparkSession, sf_dir: str
) -> tuple[bool, DataFrame]:
    """The per-document word-set sketch the Jaccard family shares:
    (small_vocab, d) where ``d`` is the PERSISTED per-doc frame —
    (doc_id, lang, len_band, mask, n_words) on the <=64-word bitmask
    fast path, (doc_id, lang, len_band, words, n_words, m0..m7, cc)
    with xxhash64 token ids plus the 512-bit token-set mask and its
    collision count on the unbounded-vocabulary path. Memoized per
    (session, sf_dir) — the parquet is immutable but a persisted frame
    belongs to ONE SparkSession: a hit keyed on sf_dir alone would hand
    a dead session's DataFrame to a new session and fail every
    dependent query (ADVICE r9); session identity is tracked via
    weakref so a recycled object id can never alias a dead session
    (ADVICE r10). An entry for the same sf_dir under a different
    session is evicted and unpersisted (best-effort — the old session
    may already be stopped).

    Round 12: the sketch is additionally MATERIALIZED on disk
    (``operators/sketch_store``) keyed on a file fingerprint of the
    corpus — the real 100 TB design, where the tokenized sketch is a
    maintained table beside the corpus, not a per-job derivation. A
    cold process/session pays one parquet scan instead of the
    vocabulary-probe + df-sort pipeline below (VERDICT r11 Wrong #2:
    that rebuild tripled every dedup query's cold cost).

    MAINTENANCE CONTRACT: any change to this function's derivation —
    tokenization regex, hashing, the small-vocab threshold, output
    columns — must bump ``sketch_store.FORMAT_VERSION``, or stored
    artifacts written under the old derivation keep being served."""
    entry = _TOKEN_SKETCH_CACHE.get(sf_dir)
    if entry is not None:
        owner_ref, small_vocab, d = entry
        if owner_ref() is spark:
            return small_vocab, d
        _TOKEN_SKETCH_CACHE.pop(sf_dir, None)
        try:
            d.unpersist()
        except Exception:
            pass  # owning session already stopped
    docs_path = _os.path.join(sf_dir, "documents.parquet")
    # Materialized-artifact fast path (VERDICT r11 Next #2): a fresh
    # on-disk sketch beside the store turns the whole derivation below
    # into one parquet scan. Freshness is file-fingerprint-keyed, so a
    # driver data regeneration invalidates it automatically.
    stored = sketch_store.load(spark, docs_path)
    if stored is not None:
        small_vocab, d = stored
        d = d.persist()
        _TOKEN_SKETCH_CACHE[sf_dir] = (_owner_ref(spark), small_vocab, d)
        return small_vocab, d
    docs = fan_out(t(spark, sf_dir, "documents"))
    words_col = F.array_distinct(F.split("text", " "))
    # Dictionary-encode the vocabulary first (the columnar-engine move):
    # when the corpus dictionary fits in 64 ids, a word SET is one LONG
    # bitmask and |A∩B| is bit_count(a & b) — integer ops, ~50x cheaper
    # than a per-pair hash-array intersect, and EXACT (no hashing). The
    # 100 TB path (unbounded vocabulary) falls back to xxhash64 arrays +
    # array_intersect; both paths share the block join and the integer
    # J >= 0.6 filter, so results are identical by construction.
    words_only = docs.select(F.explode(words_col).alias("word")).distinct()
    small_vocab = words_only.limit(65).count() <= 64
    if small_vocab:
        vocab = words_only.withColumn(
            "bit", F.row_number().over(Window.orderBy("word")) - 1
        )
        d = (
            docs.select(
                "doc_id",
                "lang",
                (F.col("n_chars") / 100).cast("long").alias("len_band"),
                F.explode(words_col).alias("word"),
            )
            .join(F.broadcast(vocab), "word")
            .groupBy("doc_id", "lang", "len_band")
            .agg(
                F.bit_or(
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
                ).alias("mask"),
                F.count("*").alias("n_words"),
            )
            .persist()
        )
    else:
        # Large-vocab path: hashed token arrays ordered RARE-FIRST by
        # GLOBAL document frequency ((df, hash) is a total order). The
        # order is free to consumers that intersect (order-insensitive)
        # and makes the PPJoin prefix of a doc a plain slice(words, 1,
        # plen) — which is what keeps the blocked pairwise queries
        # sub-quadratic once blocks grow (see dedup_jaccard_blocked_pairs
        # / dedup_containment_pairs prefix candidate generation).
        tok = docs.select(
            "doc_id",
            "lang",
            (F.col("n_chars") / 100).cast("long").alias("len_band"),
            F.explode(
                F.transform(words_col, lambda w: F.xxhash64(w))
            ).alias("w"),
        )
        dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
        # r16: the per-doc 512-bit token-set mask (m0..m7 + collision
        # count cc) is part of the sketch — computed here as codegen
        # bit_or aggregates in the SAME grouped pass that builds the
        # arrays (an in-query HOF rebuild measured +45% CPU on the
        # jaccard query because both posting sides re-derived it), and
        # materialized with the store so cold queries get it for one
        # scan. Consumers: the _mask_inter_bound candidate prune in the
        # blocked-jaccard / containment prefix joins.
        d = (
            tok.join(dfreq, "w")
            .groupBy("doc_id", "lang", "len_band")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("df", "w"))),
                    lambda s: s["w"],
                ).alias("words"),
                F.count(F.lit(1)).alias("n_words"),
                *_mask_bitor_agg_exprs("w"),
            )
            .withColumn("cc", F.col("n_words") - _mask_popcount())
            .persist()
        )
    # Materialize for every later cold query/process (best-effort: the
    # in-memory frame is authoritative for THIS call either way).
    sketch_store.save(d, docs_path, small_vocab)
    _TOKEN_SKETCH_CACHE[sf_dir] = (_owner_ref(spark), small_vocab, d)
    return small_vocab, d


#: per-doc token-set mask for large-vocab candidate pruning — width
#: choice, bound math and the lossless-ness argument live in
#: operators/tokenmask (shared with operators/ppjoin).
from ..operators.tokenmask import MASK_LONGS as _MASK_LONGS  # noqa: E402
from ..operators.tokenmask import (  # noqa: E402
    mask_bitor_agg_exprs as _mask_bitor_agg_exprs,
)
from ..operators.tokenmask import mask_inter_bound as _mask_inter_bound  # noqa: E402
from ..operators.tokenmask import mask_popcount as _mask_popcount  # noqa: E402


def _owner_ref(spark: SparkSession):
    try:
        return weakref.ref(spark)
    except TypeError:  # session type not weakref-able: degrade to a
        return lambda s=spark: s  # strong ref (leaks one session)


def release_token_sketch_cache() -> None:
    """Unpersist and drop every memoized token sketch. Bench hygiene
    (VERDICT r10 #5): a suite that leaves sketches persisted between
    queries steals execution memory from later sort/agg-heavy queries —
    the sf1 run measured dedup_containment_pairs at 45 s in-suite vs
    15-36 s isolated. bench.py calls this after each query's timing
    block so every query is timed against a cold cache, matching what
    an isolated run (and the driver's per-query oracle check) sees."""
    for sf_dir in list(_TOKEN_SKETCH_CACHE):
        _, _, d = _TOKEN_SKETCH_CACHE.pop(sf_dir)
        try:
            d.unpersist()
        except Exception:
            pass  # owning session already stopped


@register(
    "dedup_jaccard_blocked_pairs",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
               / (a.n_words + b.n_words - len(list_intersect(a.words, b.words)))
                   AS jaccard
        FROM w a
        INNER JOIN w b
          ON a.lang = b.lang AND a.len_band = b.len_band
         AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.6
    """,
    doc="Word-set Jaccard near-dup pairs with (lang, length-band) blocking "
    "(SURVEY.md §2.9 n-gram Jaccard): candidates from an equi join on the "
    "block key; |A∪B| computed as |A|+|B|-|A∩B| so only one array "
    "intersection is evaluated per pair, and tokens are pre-hashed to "
    "64-bit longs so the per-pair intersect compares fixed-width values, "
    "not strings (both were bench hotspots; a 64-bit in-pair collision is "
    "~1e-7 probable across the whole corpus). Integer counts → the score "
    "divides identically in both engines. The tokenized side is persisted "
    "once (sketch, not text) and pairs are pruned by the size-ratio bound "
    "J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|) — 5·min ≥ 3·max in exact integer "
    "arithmetic — before any array intersection is evaluated, which is "
    "result-identical and skips the expensive compare for most candidates. "
    "TWO candidate strategies, chosen by measured corpus shape (round 10, "
    "sf1 scaling run): on a <=64-word vocabulary the flat block join + "
    "bitmask wins (prefixes don't discriminate there — the round-7 "
    "measurement showed the prefix self-join 8x worse on the dense 31-word "
    "driver corpus); beyond 64 words, candidates come from a LOSSLESS "
    "PPJoin prefix join INSIDE the block (rare-first global token order, "
    "size-ratio + positional prunes, one array_intersect per surviving "
    "pair) — the flat block join is quadratic in block size and measured "
    "35x wall for 10x docs at sf1, the prefix path 8x (linear; SCALE.md "
    "§6). Unblocked all-pairs variant: dedup_jaccard_ppjoin.",
)
def dedup_jaccard_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_vocab, d = _token_sketch(spark, sf_dir)
    if small_vocab:
        a = d.select(
            F.col("doc_id").alias("id_a"),
            F.col("lang"),
            F.col("len_band"),
            F.col("mask").alias("mask_a"),
            F.col("n_words").alias("n_a"),
        )
        b = d.select(
            F.col("doc_id").alias("id_b"),
            F.col("lang").alias("lang_b"),
            F.col("len_band").alias("len_band_b"),
            F.col("mask").alias("mask_b"),
            F.col("n_words").alias("n_b"),
        )
        size_ok = F.least(a.n_a, b.n_b) * 5 >= F.greatest(a.n_a, b.n_b) * 3
        pairs = a.join(
            b,
            (a.lang == b.lang_b)
            & (a.len_band == b.len_band_b)
            & (a.id_a < b.id_b)
            & size_ok,
        )
        inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
    else:
        # Large-vocab path (sf1 scaling fix, SCALE.md §6): the full
        # block cross-product is QUADRATIC in block size (measured 35x
        # wall-time for 10x docs), so candidates come from a LOSSLESS
        # PPJoin prefix join WITHIN the block instead — a J >= 3/5 pair
        # must share a token inside each side's first
        # n - ceil(3n/5) + 1 rare-first-ordered tokens (the sketch's
        # arrays are globally df-ordered, so the prefix is a slice).
        # Size-ratio and positional prunes run in the join condition;
        # one array_intersect verifies each surviving distinct pair.
        # On the <= 64-word dense corpus the bitmask path above stays —
        # there prefixes don't discriminate and the flat block join
        # measured 8x cheaper (round-7 note in the doc text).
        plen = F.greatest(
            F.col("n_words")
            - F.floor((F.col("n_words") * 3 + 4) / 5).cast("int")
            + 1,
            F.lit(1),
        )
        # r16: the same per-doc 512-bit mask prune the containment
        # branch uses (see _mask_inter_bound) — the lossless |A∩B|
        # upper bound rides the prefix posting rows and prunes matched
        # rows before the pair-dedup exchange and the verification
        # joins (sf3z: candidate pairs 18.25M -> 4.59M, true pairs
        # 4.20M — precision 23% -> 92%). The mask columns come from the
        # persisted sketch itself (one codegen grouped pass at sketch
        # build; an in-query HOF rebuild measured +45% CPU because both
        # posting sides re-derived it).
        pref = d.select(
            "doc_id",
            "lang",
            "len_band",
            F.col("n_words"),
            "cc",
            *[F.col(f"m{i}") for i in range(_MASK_LONGS)],
            F.posexplode(F.slice("words", F.lit(1), plen)).alias(
                "r0", "w"
            ),
        )
        pa = pref.select(
            F.col("doc_id").alias("id_a"),
            "lang",
            "len_band",
            F.col("n_words").alias("n_a"),
            F.col("cc").alias("cc_a"),
            *[F.col(f"m{i}").alias(f"ma{i}") for i in range(_MASK_LONGS)],
            (F.col("r0") + 1).alias("r_a"),
            "w",
        )
        pb = pref.select(
            F.col("doc_id").alias("id_b"),
            F.col("lang").alias("lang_b"),
            F.col("len_band").alias("len_band_b"),
            F.col("n_words").alias("n_b"),
            F.col("cc").alias("cc_b"),
            *[F.col(f"m{i}").alias(f"mb{i}") for i in range(_MASK_LONGS)],
            (F.col("r0") + 1).alias("r_b"),
            F.col("w").alias("wb"),
        )
        alpha = F.floor(
            ((F.col("n_a") + F.col("n_b")) * 3 + 7) / 8
        )  # ceil(3(n_a+n_b)/8): the minimum overlap J >= 3/5 requires
        cand = (
            pa.join(
                pb,
                (F.col("w") == F.col("wb"))
                & (F.col("lang") == F.col("lang_b")),
            )
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("len_band") == F.col("len_band_b"))
                & (
                    F.least("n_a", "n_b") * 5
                    >= F.greatest("n_a", "n_b") * 3
                )
                & (
                    1
                    + F.least(
                        F.col("n_a") - F.col("r_a"),
                        F.col("n_b") - F.col("r_b"),
                    )
                    >= alpha
                )
                & (_mask_inter_bound() >= alpha)
            )
            .select("id_a", "id_b")
            .distinct()
        )
        av = d.select(
            F.col("doc_id").alias("id_a"),
            F.col("words").alias("words_a"),
            F.col("n_words").alias("n_a"),
        )
        bv = d.select(
            F.col("doc_id").alias("id_b"),
            F.col("words").alias("words_b"),
            F.col("n_words").alias("n_b"),
        )
        pairs = cand.join(av, "id_a").join(bv, "id_b")
        inter = F.size(F.array_intersect("words_a", "words_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    # Filter on the exact integer equivalent of J >= 0.6:
    #   i/(n_a+n_b-i) >= 0.6  <=>  8*i >= 3*(n_a+n_b)   (i, n integers)
    # The double-division form would be fused into the join condition with
    # the intersection evaluated TWICE per candidate pair (numerator and
    # denominator); this form evaluates it once, and the jaccard projection
    # below runs only on surviving pairs.
    return (
        pairs.filter(inter * 8 >= (F.col("n_a") + F.col("n_b")) * 3)
        .withColumn("jaccard", jac)
        .select("id_a", "id_b", "jaccard")
    )


@register(
    "dedup_jaccard_ppjoin",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
               / (a.n_words + b.n_words - len(list_intersect(a.words, b.words)))
                   AS jaccard
        FROM w a
        INNER JOIN w b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.6
    """,
    doc="ALL-pairs word-set Jaccard >= 0.6 via PPJoin prefix filtering "
    "(SURVEY.md §2.9 n-gram Jaccard, the no-blocking-key scale path; "
    "cf. the SSJoin/PPJoin literature): tokens ranked by global document "
    "frequency (rare first); any pair with J >= t and the size-ratio "
    "bound satisfied must share a token within each side's first "
    "|x| - ceil(t*|x|) + 1 rare-ordered tokens, so candidate generation "
    "is an equi self-join on PREFIX tokens only — rare tokens make tiny "
    "buckets, which is what bounds the join at corpus scale where a "
    "single blocking key would not. The oracle is the full quadratic "
    "Jaccard (ground truth), so parity proves the filter is LOSSLESS. "
    "Candidates are verified with one array_intersect in exact integer "
    "arithmetic (8i >= 3(n_a+n_b) <=> J >= 0.6).",
)
def dedup_jaccard_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ppjoin import ppjoin_pairs

    d = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", " ")), lambda w: F.xxhash64(w)
        ).alias("words"),
    )
    return ppjoin_pairs(d, id_col="doc_id", tokens_col="words",
                        thr_num=3, thr_den=5)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based signatures are engine-specific; accuracy
    # vs exact Jaccard is property-tested in tests/test_dedup.py
    doc="MinHash + LSH near-dup candidates (SURVEY.md §2.9): word "
    "3-shingles → 32-hash MinHash signature (xxhash64 on fixed-width "
    "longs, codegen) → 8 bands × 4 rows banding join → candidate pairs "
    "with estimated Jaccard ≥ 0.5. The scale path for corpus-level dedup: "
    "map-side signatures, shuffle only on band buckets.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = word_shingles(d, "text", k=3)
    sig = minhash_signature(sh, "shingles", num_hashes=32)
    pairs = lsh_band_pairs(sig, "doc_id", "minhash", bands=8, rows_per_band=4)
    est = minhash_jaccard_estimate(pairs)
    return est.filter(F.col("jaccard_est") >= 0.5).select(
        F.col("id_a"), F.col("id_b"), F.col("jaccard_est")
    )


@register(
    "dedup_minhash_lsh_exact",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(ws) - 2),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles
        FROM w WHERE len(ws) >= 3
    ), sig AS (
        SELECT doc_id,
            list_min(list_transform(shingles, x -> md5(x || '#0'))) AS h0,
            list_min(list_transform(shingles, x -> md5(x || '#1'))) AS h1,
            list_min(list_transform(shingles, x -> md5(x || '#2'))) AS h2,
            list_min(list_transform(shingles, x -> md5(x || '#3'))) AS h3,
            list_min(list_transform(shingles, x -> md5(x || '#4'))) AS h4,
            list_min(list_transform(shingles, x -> md5(x || '#5'))) AS h5,
            list_min(list_transform(shingles, x -> md5(x || '#6'))) AS h6,
            list_min(list_transform(shingles, x -> md5(x || '#7'))) AS h7
        FROM sh
    ), banded AS (
        SELECT doc_id, h0 || h1 AS b0, h2 || h3 AS b1,
               h4 || h5 AS b2, h6 || h7 AS b3
        FROM sig
    )
    SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id, b.doc_id
        FROM banded a JOIN banded b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id, b.doc_id
        FROM banded a JOIN banded b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id, b.doc_id
        FROM banded a JOIN banded b ON a.b3 = b.b3 AND a.doc_id < b.doc_id
    )
    """,
    doc="MinHash + LSH with a PORTABLE hash (md5), hash-match verified "
    "end-to-end: word 3-shingles -> 8 per-seed signatures (lexicographic "
    "min of md5(shingle#seed) — min over a multiset equals min over the "
    "set, so no distinct pass) -> 4 bands x 2 rows -> band-bucket equi "
    "self-join -> distinct candidate pairs. Same banding/bucketing "
    "machinery as dedup_minhash_lsh (which keeps xxhash64 for speed, "
    "rows-only); this variant trades hash throughput for an oracle that "
    "DuckDB reproduces bit-for-bit, closing the round-5 gap where the "
    "LSH family had no hash-matched entry. Scale shape unchanged: "
    "map-side signatures, shuffle only on band keys, never all-pairs.",
)
def dedup_minhash_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
        .withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 3)
    )
    sh = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("ws", i),
                F.element_at("ws", i + 1),
                F.element_at("ws", i + 2),
            ),
        ).alias("shingles"),
    )
    def _seed_hash(s: int):
        # closure factory, NOT a default arg: pyspark reads the lambda's
        # arity, and a (x, s=s) signature would be mistaken for the
        # two-argument (element, index) transform form
        return lambda x: F.md5(F.concat(x, F.lit(f"#{s}")))

    sig = sh.select(
        "doc_id",
        *[
            F.array_min(F.transform("shingles", _seed_hash(s))).alias(f"h{s}")
            for s in range(8)
        ],
    )
    banded = sig.select(
        "doc_id",
        *[
            F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias(f"b{b}")
            for b in range(4)
        ],
    )
    cands = None
    for b in range(4):
        a = banded.select(F.col("doc_id").alias("id_a"), F.col(f"b{b}"))
        bb = banded.select(
            F.col("doc_id").alias("id_b"), F.col(f"b{b}").alias("bb")
        )
        pair = a.join(
            bb, (a[f"b{b}"] == bb.bb) & (a.id_a < bb.id_b)
        ).select("id_a", "id_b")
        cands = pair if cands is None else cands.unionByName(pair)
    return cands.distinct()


@register(
    "dedup_simhash_hamming_exact",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_transform(list_distinct(string_split(text, ' ')),
                              x -> md5(x)) AS mds
        FROM documents
    ), sig AS (
        SELECT doc_id, lang, len_band,
               {bits} AS sim16
        FROM w
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sim16, b.sim16)) AS hamming
    FROM sig a
    JOIN sig b ON a.lang = b.lang AND a.len_band = b.len_band
              AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim16, b.sim16)) <= 3
    """.format(
        bits=" + ".join(
            "(CASE WHEN list_sum(list_transform(mds, m -> CASE WHEN "
            f"substr(m, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
            f"THEN {1 << j} ELSE 0 END)::BIGINT"
            for j in range(16)
        )
    ),
    doc="SimHash near-dup with a PORTABLE sketch, hash-match verified: "
    "16-bit simhash where bit j votes on the j-th hex nibble's high bit "
    "of each distinct word's md5 (a pure substring compare — no hex "
    "parsing, identical lexicographic semantics in Spark and DuckDB), "
    "then pairs at Hamming <= 3 within (lang, length-band) blocks via "
    "bit_count(xor). Companion to dedup_simhash_hamming (xxhash64 "
    "64-bit, rows-only): same map-side-sketch + blocked-equi-join "
    "scale shape, oracle reproducible bit-for-bit.",
)
def dedup_simhash_hamming_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_band"),
        F.transform(
            F.array_distinct(F.split("text", " ")), lambda w: F.md5(w)
        ).alias("mds"),
    )
    def _vote(j: int):
        # closure factory (see _seed_hash): a j=j default would change
        # the lambda's arity pyspark dispatches on
        return lambda acc, m: acc + F.when(
            F.substring(m, j + 1, 1) >= "8", 1
        ).otherwise(-1)

    sim = None
    for j in range(16):
        vote = F.aggregate("mds", F.lit(0), _vote(j))
        bit = F.when(vote > 0, F.lit(1 << j)).otherwise(0).cast("long")
        sim = bit if sim is None else sim + bit
    s = d.select("doc_id", "lang", "len_band", sim.alias("sim16"))
    a = s.select(
        F.col("doc_id").alias("id_a"), "lang", "len_band",
        F.col("sim16").alias("sim_a"),
    )
    b = s.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"),
        F.col("len_band").alias("len_band_b"), F.col("sim16").alias("sim_b"),
    )
    return (
        a.join(
            b,
            (a.lang == b.lang_b)
            & (a.len_band == b.len_band_b)
            & (a.id_a < b.id_b),
        )
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


@register(
    "dedup_simhash_hamming",
    oracle=None,  # xxhash64-based; distribution checked in tests
    doc="SimHash near-dup (SURVEY.md §2.9): 64-bit simhash over word "
    "tokens (xxhash64 bit votes, codegen), then pairs at Hamming "
    "distance ≤ 12 among same-(lang, length-band) blocks via bit_count "
    "of XOR. Map-side sketch + blocked equi join.",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hamming64

    d = fan_out(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_band"),
        F.array_distinct(F.split("text", " ")).alias("words"),
    )
    s = simhash64(d, "words")
    a = s.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        "len_band",
        F.col("simhash").alias("sim_a"),
    )
    b = s.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_band").alias("len_band_b"),
        F.col("simhash").alias("sim_b"),
    )
    return (
        a.join(
            b,
            (a.lang == b.lang_b)
            & (a.len_band == b.len_band_b)
            & (a.id_a < b.id_b),
        )
        .withColumn("hamming", hamming64(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= 12)
        .select("id_a", "id_b", "hamming")
    )


def _is_star_forest(E: DataFrame) -> bool:
    """True iff the downhill edge list (hi > lo) is a star forest: no
    parent (`lo`) is itself a child (`hi`), and no child has two
    parents. Both violations are checked in ONE driver action on the
    by-now-shrunken edge list. Necessity of BOTH: a 2-chain
    {(y,x),(x,a)} is stable under small-star and caught by the first
    branch; a two-parent leaf {(x,m1),(x,m2)} has no depth violation
    and is caught only by the second."""
    depth_viol = E.select("lo").join(
        E.select(F.col("hi").alias("lo")), "lo", "left_semi"
    )
    multi_parent = (
        E.groupBy("hi").count().where(F.col("count") > 1).select(F.lit(1))
    )
    return (
        depth_viol.select(F.lit(1))
        .unionByName(multi_parent)
        .limit(1)
        .count()
        == 0
    )


#: edge-count threshold below which min_label_components finishes with
#: a driver-side union-find instead of more distributed rounds — a
#: CONSTANT bound (~16 MB of long pairs Arrow-framed), not
#: data-proportional, so the "no unbounded collect" audit line holds
#: (cf. Kiveris 2014 §6: switch to a local algorithm once the
#: contracted graph fits). Sized so that one single-machine
#: O(E alpha(E)) pass replaces a distributed large/small-star round
#: (~6 shuffle stages + a driver action) whenever the list fits: the
#: round-15 measurement had ONE such round cost 5.3 s wall on a
#: 391k-edge list the union-find below finishes in ~0.3 s.
_DRIVER_FINISH_EDGES = 1_000_000


def _collect_edge_arrays(E: DataFrame) -> tuple[list, list]:
    """Driver collect of the BOUNDED (<= _DRIVER_FINISH_EDGES rows)
    edge list as two column lists via one Arrow transfer —
    ``DataFrame.toArrow`` skips the per-row pickle path of
    ``collect()`` (measured ~4x on the 391k-row sf0.1 list) and the
    columnar frame is exactly what ``_uf_star`` consumes."""
    tbl = E.toArrow()
    return (tbl.column("hi").to_pylist(), tbl.column("lo").to_pylist())


def _uf_star(his, los) -> list[tuple]:
    """Driver-side union-find finish over a bounded edge list given as
    two parallel column lists (<= _DRIVER_FINISH_EDGES entries):
    min-root union keeps the label = component-minimum invariant of
    the distributed rounds. Returns the star-forest edge list
    [(node, root)] for non-root nodes — shared by the pre-loop early
    finish and the in-loop finish of min_label_components."""
    parent: dict = {}

    def _find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for hi, lo in zip(his, los):
        ra, rb = _find(hi), _find(lo)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [
        (n, _find(n))
        for n in set(his).union(los)
        if _find(n) != n
    ]


def min_label_components(
    edges: DataFrame, nodes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR over
    a SHRINKING edge list (Kiveris et al. 2014, "Connected Components
    in MapReduce and Beyond" — see PAPERS.md; the same algorithm behind
    GraphFrames' checkpointed CC). Each round:

      large-star(u): every neighbor v > u re-hooks to
          m = min(neighbors(u) ∪ u) — on a chain this DOUBLES pointer
          jumps per round (O(log n) rounds on paths), and it collapses
          a near-clique to its min-star in ONE round;
      small-star(u): u and all its smaller neighbors hook to the
          smallest — merges multi-parent nodes large-star leaves behind.

    Both operations preserve connectivity exactly (each re-hooks nodes
    within one neighborhood, Kiveris Lemmas 1-2), so at the fixpoint —
    a star forest — each component is ONE star whose root is the
    component MINIMUM (a star with root r and leaf m < r would need the
    downhill edge (m, r) with m > r). Labels then read straight off
    the final edge list: child → its root, everything else → itself;
    there is no per-round label table at all.

    Why this replaced per-round min-label propagation + path halving
    (rounds 5-8): propagation joins the FULL edge list against labels
    every round — O(E) shuffle x rounds, 6 x ~1 s on the sf0.1 near-dup
    graph whose 67% true-pair density makes E 150x the node count —
    while here round 1 contracts every near-clique block to a star and
    the 391k-pair edge list drops to ~node count, so later rounds are
    noise. One driver action per round (the edge count that also
    materializes the checkpoint), plus the one-action star-forest check
    once the count plateaus; never collects data.

    ``edges``: (id_a, id_b) pairs; ``nodes``: one ``id_col`` column of
    every node. Returns (id_col, label) at fixpoint."""
    E = (
        edges.where(F.col("id_a") != F.col("id_b"))
        .select(
            F.greatest("id_a", "id_b").alias("hi"),
            F.least("id_a", "id_b").alias("lo"),
        )
        .localCheckpoint(eager=False)
    )
    # Early driver finish (r15, guide §2.4 — remove shuffles outright):
    # when the INITIAL edge list already fits the constant driver bound,
    # the distributed large/small-star rounds buy nothing — one round is
    # ~6 shuffle stages + a driver action chasing a list the union-find
    # below finishes in a fraction of the time (measured 5.3 s for the
    # round vs 0.3 s union-find on the 391k-edge sf0.1 list). The probe
    # is a COUNT on the lazily-checkpointed list — the count both
    # materializes the checkpoint (one job, where eager=True + a probe
    # was two) and decides the path with no row transfer at all; only a
    # list already under the constant bound is ever collected, and then
    # as one Arrow frame, not pickled rows. Never an unbounded collect.
    n_edges = E.count()
    if n_edges <= _DRIVER_FINISH_EDGES:
        star = _uf_star(*_collect_edge_arrays(E))
        E = edges.sparkSession.createDataFrame(star, E.schema)
        roots = E.select(
            F.col("hi").alias(id_col), F.col("lo").alias("__root")
        )
        return (
            nodes.select(id_col)
            .join(roots, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("__root"), F.col(id_col)).alias("label"),
            )
        )
    converged = False
    # Kiveris Theorem 3: O(log^2 n) rounds worst case — dense graphs
    # take 1-2, a pure path takes O(log n) (large-star doubles pointer
    # jumps per round), so 64 rounds covers any graph that fits in
    # storage; the bound exists only to turn a logic bug into a loud
    # error instead of an infinite loop
    for _ in range(64):
        # LARGE-STAR: for each node u, neighbors v > u hook to
        # min(neighbors(u) ∪ u). Output stays downhill: v > u >= m.
        und = E.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(
            E.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        lmin = (
            und.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        # no distinct here: small-star's MIN aggregate is duplicate-
        # insensitive and S's distinct dedupes the output, so the extra
        # 391k-row shuffle bought nothing (measured round-0 hotspot)
        L = (
            und.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
        )
        # SMALL-STAR: per child hi, hook hi and all its parents to the
        # smallest parent. Output rows (x, m) keep x > m: a surviving
        # parent lo > m, and hi > every parent >= m.
        smin = L.groupBy("hi").agg(F.min("lo").alias("m"))
        S = (
            L.join(smin, "hi")
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(smin.select("hi", F.col("m").alias("lo")))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        E = S
        # ONE driver action per round (round 12; was count + a separate
        # two-branch probe = 2 actions, and per-action job overhead
        # dominates the by-now-shrunken list): per node, count child
        # appearances (c) and parent appearances (p) in one grouped
        # pass — a star-forest violation is a node with two parents
        # (c >= 2) or one that is both child and parent (c >= 1 and
        # p >= 1); the same job materializes the checkpoint and returns
        # the edge count.
        probe = (
            S.select(
                F.col("hi").alias("node"),
                F.lit(1).alias("c"),
                F.lit(0).alias("p"),
            )
            .unionByName(
                S.select(
                    F.col("lo").alias("node"),
                    F.lit(0).alias("c"),
                    F.lit(1).alias("p"),
                )
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"), F.sum("p").alias("p"))
            .agg(
                F.sum("c").alias("n_edges"),
                F.sum(
                    F.when(
                        (F.col("c") >= 2)
                        | ((F.col("c") >= 1) & (F.col("p") >= 1)),
                        1,
                    ).otherwise(0)
                ).alias("violations"),
            )
            .collect()[0]
        )
        if (probe.n_edges or 0) == 0 or probe.violations == 0:
            converged = True
            break
        if probe.n_edges <= _DRIVER_FINISH_EDGES:
            # BOUNDED driver finish (round 13): after the contraction
            # rounds the surviving edge list is near component count,
            # but each residual round still pays 3-4 full shuffle jobs
            # to fix a handful of violations (sf1z: rounds chasing
            # 1761 -> 85 -> 2 -> 0 violations cost 0.8-1.2 s EACH on a
            # 35k-row list). Once the list fits the threshold — a
            # constant, ~few MB, same boundedness class as the K x 64
            # k-means hop — union-find finishes it in one driver pass.
            # Kiveris et al. 2014 §6 make the same move: switch to a
            # local algorithm when the contracted graph fits on one
            # machine. Min-root union keeps the label = component
            # minimum invariant the distributed rounds guarantee.
            star = _uf_star(*_collect_edge_arrays(E))
            # schema derived from the edge list, not hardcoded: the
            # operator is generic over id_col's type (string doc ids
            # work in the distributed rounds), and this branch only
            # triggers once the list fits the driver threshold — a
            # hardcoded long/long would make non-long ids fail in a
            # data-size-dependent way (ADVICE r13)
            E = edges.sparkSession.createDataFrame(star, E.schema)
            converged = True
            break
    if not converged:
        # the star-forest probe is the ONLY correctness exit: returning
        # non-fixpoint labels would silently produce wrong dedup
        # clusters, and a pipeline ignores warnings — so raise, matching
        # the loud-cap convention every streaming leg uses (VERDICT r9
        # #4; 64 rounds exceeds the O(log^2 n) bound for any real graph,
        # so reaching here means a bug, not a big graph)
        raise RuntimeError(
            "min_label_components: large-star/small-star did not reach a "
            "star forest within 64 rounds — this exceeds the O(log^2 n) "
            "convergence bound (Kiveris 2014) for any storable graph and "
            "indicates a contraction bug; refusing to return non-fixpoint "
            "component labels"
        )
    # labels read off the star forest: child -> root, roots and isolated
    # nodes -> themselves
    roots = E.select(F.col("hi").alias(id_col), F.col("lo").alias("__root"))
    return nodes.select(id_col).join(roots, id_col, "left").select(
        id_col, F.coalesce("__root", F.col(id_col)).alias("label")
    )



@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    ), edges AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM w a INNER JOIN w b
          ON a.lang = b.lang AND a.len_band = b.len_band
         AND a.doc_id < b.doc_id
        WHERE 8 * len(list_intersect(a.words, b.words))
              >= 3 * (a.n_words + b.n_words)
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b, id_a FROM edges
    ), reach AS (
        SELECT doc_id AS node, doc_id AS label FROM documents
        UNION
        SELECT u.dst AS node, r.label
        FROM reach r JOIN und u ON r.node = u.src
        WHERE r.label < u.dst
    )
    SELECT label AS component, COUNT(DISTINCT node) AS n_docs,
           MIN(node) AS keeper
    FROM (SELECT node, MIN(label) AS label FROM reach GROUP BY node)
    GROUP BY label
    """,
    doc="Connected components over the near-dup pair graph — the "
    "transitive-closure step that turns pair lists into DEDUP CLUSTERS "
    "(A~B, B~C => one keeper for {A,B,C}; pairwise pruning alone would "
    "keep A and C). Spark side: Pregel-style min-label propagation — "
    "each iteration is one edge join + min-aggregate, labels "
    "checkpointed per round, loop ends at fixpoint (bounded by graph "
    "diameter; the driver only compares a changed-row COUNT — no data "
    "collect). The same loop is how GraphX/GraphFrames do CC at cluster "
    "scale. Oracle: recursive-CTE reachability in DuckDB — a genuinely "
    "iterative algorithm, still hash-verified.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = dedup_jaccard_blocked_pairs(spark, sf_dir).select("id_a", "id_b")
    labels = min_label_components(
        edges, t(spark, sf_dir, "documents").select("doc_id")
    )
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keeper"),
    )


@register(
    "dedup_keep_best",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    ), edges AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM w a INNER JOIN w b
          ON a.lang = b.lang AND a.len_band = b.len_band
         AND a.doc_id < b.doc_id
        WHERE 8 * len(list_intersect(a.words, b.words))
              >= 3 * (a.n_words + b.n_words)
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b, id_a FROM edges
    ), reach AS (
        SELECT doc_id AS node, doc_id AS label FROM documents
        UNION
        SELECT u.dst AS node, r.label
        FROM reach r JOIN und u ON r.node = u.src
        WHERE r.label < u.dst
    ), comp AS (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), ranked AS (
        SELECT c.component, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY c.component
                   ORDER BY d.n_chars DESC, d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY c.component) AS n_docs
        FROM comp c JOIN documents d ON c.node = d.doc_id
    )
    SELECT component, doc_id AS keeper,
           n_chars AS keeper_n_chars, n_docs,
           CAST(n_docs - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rn = 1
    """,
    doc="Canonical-representative selection per dedup cluster — the "
    "'keep BEST, drop rest' step real curation pipelines run after "
    "transitive closure (keeping the longest/highest-quality copy "
    "instead of the smallest id): the shared min-label CC loop, then "
    "ONE partial-aggregating groupBy with a struct max "
    "((n_chars DESC, doc_id ASC) argmax via max(struct(n_chars, "
    "-doc_id))) — no per-component window sort, so at 100 TB the "
    "reduction is map-side-combined and a giant duplicate cluster "
    "never serializes through a single sort. Oracle: the recursive-"
    "CTE components + ROW_NUMBER pick.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    edges = dedup_jaccard_blocked_pairs(spark, sf_dir).select("id_a", "id_b")
    labels = min_label_components(edges, docs.select("doc_id"))
    joined = labels.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        joined.groupBy(F.col("label").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(
                F.struct(
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("best"),
        )
        .select(
            "component",
            (-F.col("best.neg_id")).alias("keeper"),
            F.col("best.n_chars").alias("keeper_n_chars"),
            "n_docs",
            (F.col("n_docs") - 1).cast("long").alias("n_dropped"),
        )
    )


@register(
    "dedup_ngram_span_exact",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, string_split(text, ' ') AS words
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, lang,
               array_to_string(words[s : s + 7], ' ') AS span
        FROM w, UNNEST(range(1, GREATEST(len(words) - 6, 1))) AS t(s)
    ), dup AS (
        SELECT span FROM sh GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT lang,
           COUNT(DISTINCT span) AS n_dup_spans,
           COUNT(DISTINCT doc_id) AS n_docs_affected
    FROM sh WHERE span IN (SELECT span FROM dup)
    GROUP BY lang
    """,
    doc="Exact duplicate-span detection (the substring-dedup shape of "
    "'Deduplicating Training Data Makes Language Models Better', Lee et "
    "al. 2021, at 8-gram granularity): every 8-token span appearing in "
    ">=2 documents is a duplicated span; rollup counts spans and "
    "affected docs per language. Plan: map-side shingle explode + "
    "per-doc distinct, ONE hash shuffle on span (high cardinality, no "
    "skew) for the cross-doc count, semi join back, tiny rollup. Never "
    "pairwise: work scales with total shingles, not docs^2 — exactly "
    "the suffix-array-free approximation that survives 100 TB.",
)
def dedup_ngram_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    sh = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                n >= 8,
                F.transform(
                    F.sequence(F.lit(1), n - 7),
                    lambda i: F.concat_ws(" ", F.slice("words", i, 8)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("span"),
    ).distinct()
    dup = (
        sh.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    return (
        sh.join(dup, "span", "left_semi")
        .groupBy("lang")
        .agg(
            F.count_distinct("span").alias("n_dup_spans"),
            F.count_distinct("doc_id").alias("n_docs_affected"),
        )
    )


@register(
    "pipeline_incremental_near_dedup",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(ws) - 2),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles
        FROM w WHERE len(ws) >= 3
    ), sig AS (
        SELECT doc_id,
            list_min(list_transform(shingles, x -> md5(x || '#0'))) AS h0,
            list_min(list_transform(shingles, x -> md5(x || '#1'))) AS h1,
            list_min(list_transform(shingles, x -> md5(x || '#2'))) AS h2,
            list_min(list_transform(shingles, x -> md5(x || '#3'))) AS h3,
            list_min(list_transform(shingles, x -> md5(x || '#4'))) AS h4,
            list_min(list_transform(shingles, x -> md5(x || '#5'))) AS h5,
            list_min(list_transform(shingles, x -> md5(x || '#6'))) AS h6,
            list_min(list_transform(shingles, x -> md5(x || '#7'))) AS h7
        FROM sig_src
    ), banded AS (
        SELECT doc_id, h0 || h1 AS b0, h2 || h3 AS b1,
               h4 || h5 AS b2, h6 || h7 AS b3
        FROM sig
    )
    SELECT n.doc_id FROM banded n
    WHERE n.doc_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM banded h
        WHERE h.doc_id % 2 = 0
          AND (h.b0 = n.b0 OR h.b1 = n.b1 OR h.b2 = n.b2 OR h.b3 = n.b3)
      )
    """.replace("FROM sig_src", "FROM sh"),
    doc="INCREMENTAL near-dedup: a new document batch (odd doc_ids) "
    "pruned against the STORED MinHash signatures of the historical "
    "corpus (even doc_ids) — the production shape where yesterday's "
    "corpus is never re-shingled, only its banded signature table is "
    "read. Portable md5 signatures (4 bands x 2 rows, as "
    "dedup_minhash_lsh_exact); both sides melt to (doc_id, band, key) "
    "long format so candidate detection is ONE semi join on the "
    "composite band key — one shuffle regardless of band count — and "
    "survivors are the new docs with no band collision (left anti on "
    "doc_id). Shingle-able docs only (>= 3 words), matching the "
    "signature table's domain. The oracle replays the banding and the "
    "OR-EXISTS prune in DuckDB.",
)
def pipeline_incremental_near_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
        .withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 3)
    )
    sh = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("ws", i),
                F.element_at("ws", i + 1),
                F.element_at("ws", i + 2),
            ),
        ).alias("shingles"),
    )

    def _seed_hash(s: int):
        return lambda x: F.md5(F.concat(x, F.lit(f"#{s}")))

    sig = sh.select(
        "doc_id",
        *[
            F.array_min(F.transform("shingles", _seed_hash(s))).alias(f"h{s}")
            for s in range(8)
        ],
    )
    # long format: (doc_id, band, key) — the stored signature-table layout
    long = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    hist = long.filter(F.col("doc_id") % 2 == 0)
    new = long.filter(F.col("doc_id") % 2 == 1)
    collided = (
        new.join(hist, ["band", "key"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        new.select("doc_id")
        .distinct()
        .join(collided, "doc_id", "left_anti")
        .select("doc_id")
    )


@register(
    "dedup_duplicated_span_regions",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), sh AS (
        SELECT doc_id, s,
               array_to_string(words[s : s + 7], ' ') AS span
        FROM w, UNNEST(range(1, GREATEST(len(words) - 6, 1))) AS t(s)
    ), dup AS (
        SELECT span FROM sh GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= 2
    ), pos AS (
        SELECT doc_id, s,
               CASE WHEN s - LAG(s) OVER (PARTITION BY doc_id ORDER BY s)
                         <= 7 THEN 0 ELSE 1 END AS brk
        FROM sh WHERE span IN (SELECT span FROM dup)
    ), isl AS (
        SELECT doc_id, s,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
        FROM pos
    ), reg AS (
        SELECT doc_id, island,
               MAX(s) - MIN(s) + 8 AS region_tokens
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           COUNT(*) AS n_regions,
           MAX(region_tokens) AS max_region_tokens,
           CAST(SUM(region_tokens) AS BIGINT) AS dup_tokens
    FROM reg GROUP BY doc_id
    """,
    doc="Maximal duplicated-region extraction (Lee et al. 2021, "
    "'Deduplicating Training Data Makes Language Models Better' — the "
    "ExactSubstr dedup output shape, see PAPERS.md): 8-gram starts whose "
    "span appears in >=2 documents are merged into MAXIMAL token "
    "intervals via gaps-and-islands (a new region starts when the next "
    "duplicated start is >7 tokens away — closer starts overlap as "
    "token ranges), giving per-document duplicated-region count, "
    "longest region, and exact duplicated-token coverage (regions are "
    "disjoint by construction, so the SUM is exact, all integers). "
    "This is the suffix-array-free equivalent of ExactSubstr's maximal "
    "match extension: a duplicated substring of length L >= 8 appears "
    "as L-7 consecutive duplicated starts and reassembles into one "
    "region. 100 TB: shingle explode map-side, ONE high-cardinality "
    "shuffle on span, semi join back, one doc-keyed window + rollup — "
    "work scales with total shingles, never docs^2.",
)
def dedup_duplicated_span_regions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    sh = d.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 8,
                F.transform(
                    F.sequence(F.lit(1), n - 7),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.concat_ws(" ", F.slice("words", i, 8)).alias(
                            "span"
                        ),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<s:int,span:string>>")
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.s").alias("s"), F.col("g.span").alias("span"))
    dup = (
        sh.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    pos = sh.join(dup, "span", "left_semi")
    wo = Window.partitionBy("doc_id").orderBy("s")
    isl = pos.select(
        "doc_id",
        "s",
        F.sum(
            F.when(F.col("s") - F.lag("s").over(wo) <= 7, 0).otherwise(1)
        )
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    reg = isl.groupBy("doc_id", "island").agg(
        (F.max("s") - F.min("s") + 8).alias("region_tokens")
    )
    return reg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.max("region_tokens").alias("max_region_tokens"),
        F.sum("region_tokens").alias("dup_tokens"),
    )


@register(
    "dedup_containment_pairs",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
               / a.n_words AS containment
    FROM w a JOIN w b
      ON a.lang = b.lang
     AND b.len_band BETWEEN a.len_band - 1 AND a.len_band + 1
     AND a.doc_id <> b.doc_id
    WHERE 5 * len(list_intersect(a.words, b.words)) >= 4 * a.n_words
    """,
    doc="ASYMMETRIC set-containment near-dup pairs C(A,B) = |A inter B| "
    "/ |A| >= 0.8 (Broder 1997's containment measure — the "
    "'A is a snippet of B' direction Jaccard misses when |B| >> |A|): "
    "directed pairs within (lang, ADJACENT length band) blocks, since "
    "a contained doc is typically shorter than its container. The "
    "probe side explodes each doc to its three candidate bands so "
    "candidate generation stays an EQUI join on (lang, band) — never "
    "a lang-only join (4 langs = catastrophic skew at 100 TB) and "
    "never all-pairs. Shares the memoized per-doc token sketch with "
    "the Jaccard family; on a <=64-word vocabulary |A inter B| is "
    "bit_count(a & b) over the flat block join, beyond that candidates "
    "come from the LOSSLESS containment prefix filter over the rare-"
    "first df-ordered arrays (probe side explodes only each A's first "
    "n_a - ceil(4 n_a/5) + 1 rarest tokens; build side posts all "
    "tokens with positions; size + positional prunes in the join) and "
    "one array_intersect verifies each surviving pair — the round-10 "
    "token co-occurrence plan was exact but Zipf-fragile: a stopword's "
    "in-block posting list alone made it quadratic (VERDICT r10 #1); "
    "prefixes keep stopwords out of the probe side entirely. The "
    ">= 0.8 filter is the exact integer form 5*inter >= 4*|A|, and "
    "the emitted score is an exact int/int division — hash-identical "
    "in both engines.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_vocab, d = _token_sketch(spark, sf_dir)
    probe_band = F.explode(
        F.array(
            F.col("len_band") - 1, F.col("len_band"), F.col("len_band") + 1
        )
    ).alias("band")
    if small_vocab:
        a = d.select(
            F.col("doc_id").alias("id_a"),
            "lang",
            probe_band,
            F.col("mask").alias("mask_a"),
            F.col("n_words").alias("n_a"),
        )
        b = d.select(
            F.col("doc_id").alias("id_b"),
            F.col("lang").alias("lang_b"),
            F.col("len_band").alias("band_b"),
            F.col("mask").alias("mask_b"),
        )
        pairs = a.join(
            b,
            (a.lang == b.lang_b)
            & (a.band == b.band_b)
            & (a.id_a != b.id_b),
        )
        inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
    else:
        # Large-vocab path (VERDICT r10 #1 — the round-10 token
        # CO-OCCURRENCE plan was exact and volume-linear on the flat
        # fixture but Zipf-fragile: one common token in a block of
        # postings contributes |posting|² join rows, so a stopword-heavy
        # corpus blows it up quadratically). Candidates now come from
        # the containment PREFIX FILTER over the sketch's rare-first
        # df-ordered arrays instead — the same lossless PPJoin move
        # dedup_jaccard_blocked_pairs' branch uses, specialized to the
        # asymmetric measure: C(A,B) = |A∩B|/|A| >= 4/5 needs overlap
        # alpha = ceil(4·n_a/5), so A must share a token with B inside
        # A's first n_a - alpha + 1 RAREST tokens (else all shared
        # tokens sit among A's last alpha-1 tokens — contradiction).
        # The probe side therefore explodes only A-prefixes (rare
        # tokens, short posting lists — a stopword enters the join only
        # through the rare docs whose prefix it reaches); the build
        # side posts ALL tokens with positions, because any B token can
        # be the shared rare one (containment puts no lower bound on
        # B's token ranks). Positional prune per matched row:
        # overlap <= 1 + min(n_a - r_a, n_b - r_b) must reach alpha —
        # lossless because a qualifying pair's FIRST shared token (by
        # the global order) always lands in A's prefix and always
        # passes the prune. One array_intersect verifies each
        # surviving distinct pair exactly.
        alpha = F.floor((F.col("n_a") * 4 + 4) / 5)  # ceil(4·n_a/5)
        plen = F.greatest(
            F.col("n_words")
            - F.floor((F.col("n_words") * 4 + 4) / 5).cast("int")
            + 1,
            F.lit(1),
        )
        # r16 (guide §3 candidate pruning): per-doc 512-bit token-set
        # masks ride the posting rows; the lossless |A∩B| upper bound
        # (_mask_inter_bound) then prunes matched rows BEFORE the
        # pair-dedup exchange — at sf3z it cut the dedup aggregate's
        # input 179.8M -> 48.5M rows and the verification joins' input
        # 90.3M -> 12.8M candidate pairs (7x; true positives 10.7M, so
        # precision rose 12% -> 83%), taking the query from 73 s to
        # ~18 s with bit-identical output (OPTIMIZATION_r16.md). The
        # mask columns (m0..m7, cc) come precomputed from the sketch.
        pa = d.select(
            F.col("doc_id").alias("id_a"),
            "lang",
            probe_band,
            F.col("n_words").alias("n_a"),
            F.col("cc").alias("cc_a"),
            *[F.col(f"m{i}").alias(f"ma{i}") for i in range(_MASK_LONGS)],
            F.posexplode(F.slice("words", F.lit(1), plen)).alias(
                "r0", "w"
            ),
        ).withColumn("r_a", F.col("r0") + 1)
        # build-side positional pre-prune (r16, guide §2.3 — shuffle
        # fewer bytes): a B posting at r_b can only pass the positional
        # filter when n_b - r_b >= alpha - 1, and alpha >=
        # ceil(0.8 * min n_a over the block's probe docs) — so rows
        # beyond that rank are dropped BEFORE the posting shuffle
        # (halved the build side at sf3z with zero effect on matches,
        # which the row filter would have discarded anyway).
        blk_min = (
            d.select("lang", probe_band, F.col("n_words").alias("n_a"))
            .groupBy("lang", "band")
            .agg(F.min("n_a").alias("min_n_a"))
            .select(
                F.col("lang").alias("lang_b"),
                F.col("band").alias("band_b"),
                "min_n_a",
            )
        )
        pb = (
            d.select(
                F.col("doc_id").alias("id_b"),
                F.col("lang").alias("lang_b"),
                F.col("len_band").alias("band_b"),
                F.col("n_words").alias("n_b"),
                F.col("cc").alias("cc_b"),
                *[
                    F.col(f"m{i}").alias(f"mb{i}")
                    for i in range(_MASK_LONGS)
                ],
                F.posexplode("words").alias("rb0", "wb"),
            )
            .withColumn("r_b", F.col("rb0") + 1)
            .join(F.broadcast(blk_min), ["lang_b", "band_b"])
            .filter(
                F.col("r_b")
                <= F.col("n_b")
                - F.floor((F.col("min_n_a") * 4 + 4) / 5)
                + 1
            )
        )
        # merge hint: once the persisted sketch's (tiny) stats are
        # known, Catalyst broadcasts one side — but the broadcast frame
        # explodes AFTER the broadcast, so every task rebuilds a
        # million-row hash table (measured 5x slower in-session than
        # the stats-blind SMJ plan; SCALE.md §6). Pin SMJ.
        cand = (
            pa.hint("merge")
            .join(
                pb.hint("merge"),
                (F.col("lang") == F.col("lang_b"))
                & (F.col("band") == F.col("band_b"))
                & (F.col("w") == F.col("wb")),
            )
            .filter(
                (F.col("id_a") != F.col("id_b"))
                & (F.col("n_b") * 5 >= F.col("n_a") * 4)
                & (
                    1
                    + F.least(
                        F.col("n_a") - F.col("r_a"),
                        F.col("n_b") - F.col("r_b"),
                    )
                    >= alpha
                )
                & (_mask_inter_bound() >= alpha)
            )
            .select("id_a", "id_b")
            .distinct()
        )
        av = d.select(
            F.col("doc_id").alias("id_a"),
            F.col("words").alias("words_a"),
            F.col("n_words").alias("n_a"),
        )
        bv = d.select(
            F.col("doc_id").alias("id_b"),
            F.col("words").alias("words_b"),
        )
        pairs = cand.join(av, "id_a").join(bv, "id_b")
        inter = F.size(F.array_intersect("words_a", "words_b"))
    return (
        pairs.filter(inter * 5 >= F.col("n_a") * 4)
        .withColumn("containment", inter.cast("double") / F.col("n_a"))
        .select("id_a", "id_b", "containment")
    )


@register(
    "pipeline_dedup_apply",
    oracle="""
    WITH RECURSIVE w AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n_words
        FROM documents
    ), edges AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM w a INNER JOIN w b
          ON a.lang = b.lang AND a.len_band = b.len_band
         AND a.doc_id < b.doc_id
        WHERE 8 * len(list_intersect(a.words, b.words))
              >= 3 * (a.n_words + b.n_words)
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b, id_a FROM edges
    ), reach AS (
        SELECT doc_id AS node, doc_id AS label FROM documents
        UNION
        SELECT u.dst AS node, r.label
        FROM reach r JOIN und u ON r.node = u.src
        WHERE r.label < u.dst
    ), comp AS (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), ranked AS (
        SELECT c.node, ROW_NUMBER() OVER (
                   PARTITION BY c.component
                   ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d ON c.node = d.doc_id
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN ranked r ON r.node = d.doc_id
    WHERE r.rn = 1
    """,
    doc="END-TO-END dedup application — the step that MATERIALIZES the "
    "deduplicated corpus (pairs -> transitive closure -> keep-best "
    "-> drop the rest), completing the near-dup story the same way "
    "train->encode completes the tokenizer story: the keep-best "
    "keepers (struct-max argmax per component, shared "
    "large-star/small-star CC loop and memoized token sketch) SEMI "
    "join back onto the corpus, so the output is the surviving "
    "documents themselves, not a report about them. 100 TB: "
    "everything upstream is the audited keep-best plan; the final "
    "application is ONE semi join on doc_id (keepers are "
    "component-count-sized, far below the corpus — AQE broadcasts "
    "when they fit).",
)
def pipeline_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    keepers = dedup_keep_best(spark, sf_dir).select(
        F.col("keeper").alias("doc_id")
    )
    return (
        t(spark, sf_dir, "documents")
        .join(keepers, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "dedup_fuzzy_name_pairs",
    oracle="""
    SELECT p1.p_partkey AS a,
           p2.p_partkey AS b,
           p1.p_name AS name_a,
           p2.p_name AS name_b,
           CAST(levenshtein(p1.p_name, p2.p_name) AS BIGINT) AS edit_dist
    FROM part p1
    JOIN part p2
      ON p1.p_brand = p2.p_brand
     AND p1.p_size = p2.p_size
     AND p1.p_partkey < p2.p_partkey
    WHERE levenshtein(p1.p_name, p2.p_name) <= 4
    """,
    doc="Fuzzy-match entity resolution (blocked edit-distance join — "
    "the metadata-dedup counterpart of the document near-dup family): "
    "candidate pairs come from an equi join on the (brand, size) "
    "blocking key, never a cross product; each surviving pair is "
    "verified with Levenshtein distance <= 4. Spark's levenshtein and "
    "DuckDB's agree exactly (standard unit-cost edit distance), so "
    "the pair set is hash-verified end-to-end. 100 TB: work scales "
    "with sum of block-pair counts (plan-shape-pinned hash join on "
    "the block key); skewed blocks would salt exactly like the "
    "document blocking keys in this family.",
)
def dedup_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p1 = t(spark, sf_dir, "part").alias("p1")
    p2 = t(spark, sf_dir, "part").alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.p_brand") == F.col("p2.p_brand"))
            & (F.col("p1.p_size") == F.col("p2.p_size"))
            & (F.col("p1.p_partkey") < F.col("p2.p_partkey")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("p1.p_name"), F.col("p2.p_name")).cast(
                "long"
            ),
        )
        .filter(F.col("edit_dist") <= 4)
        .select(
            F.col("p1.p_partkey").alias("a"),
            F.col("p2.p_partkey").alias("b"),
            F.col("p1.p_name").alias("name_a"),
            F.col("p2.p_name").alias("name_b"),
            "edit_dist",
        )
    )
