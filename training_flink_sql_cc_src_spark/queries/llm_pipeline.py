"""[C] End-to-end corpus-curation pipeline — the LLM training-data workload
the north-star extensions exist for (SURVEY.md §2.9), composed as ONE
dataflow the way the reference chains its lab statements into a DAG
(terraform/lab-aggregations/main.tf:407-576, SURVEY.md §3 EP3):

    score (quality heuristics) → filter → near-dup removal
    (leading-shingle fingerprint) → token accounting → corpus rollup.

Every stage is built-in expressions (whole-stage codegen); at 100 TB this
is a map-only scan, one window shuffle keyed by fingerprint (high
cardinality — no skew), and one tiny rollup shuffle. The winner-per-
fingerprint rule is min doc_id, so the result is deterministic and the
whole pipeline stays oracle-paired.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dsum, fan_out, t
from .llm_text import STOPWORDS, _STOP_SQL


@register(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' ')) AS n_tokens,
               (0.0 + LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE)
                            / 100.0, 1.0) * 0.4
                    + CAST(len(list_filter(string_split(text, ' '),
                               x -> list_contains(['{_STOP_SQL}'], x)))
                           AS DOUBLE)
                      / len(string_split(text, ' ')) * 0.3
                    + CAST(len(list_distinct(string_split(text, ' ')))
                           AS DOUBLE)
                      / len(string_split(text, ' ')) * 0.3) AS quality_score,
               md5(array_to_string(
                   string_split(lower(trim(text)), ' ')[1:5], ' ')) AS fp
        FROM documents),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY fp
                                         ORDER BY doc_id) AS rn
            FROM scored WHERE quality_score >= 0.38)
        WHERE rn = 1)
    SELECT lang, source,
           COUNT(*) AS kept_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(FLOOR(quality_score * 1000000) AS BIGINT))
                AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_quality
    FROM kept
    GROUP BY lang, source
    """,
    doc="Corpus-curation pipeline (quality filter → leading-shingle "
    "near-dup removal → per-(lang,source) token accounting): the stages "
    "of text_quality_score, dedup_exact_text and text_lang_source_rollup "
    "chained into one plan, mirroring the reference's dependent-statement "
    "DAG (EP3). Winner per fingerprint = min doc_id (deterministic); "
    "quality formula is the fixed-order double blend, hash-identical "
    "cross-engine.",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        (
            F.lit(0.0)
            + F.least(F.size(toks).cast("double") / 100.0, F.lit(1.0)) * 0.4
            + (
                F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
                    "double"
                )
                / F.size(toks)
            )
            * 0.3
            + (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)) * 0.3
        ).alias("quality_score"),
        F.md5(
            F.array_join(
                F.slice(F.split(F.lower(F.trim(F.col("text"))), " "), 1, 5), " "
            )
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        scored.filter(F.col("quality_score") >= 0.38)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # avg in exact integer micro-units: floor(q*1e6) is bit-identical in
    # both engines (double->decimal quantization is NOT — rounding ties on
    # full-precision doubles resolve differently), and the BIGINT sum is
    # order-insensitive.
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (
            F.sum(F.floor(F.col("quality_score") * 1000000).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / 1000000.0
        ).alias("avg_quality"),
    )


@register(
    "pipeline_neardup_prune",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS words,
               len(list_distinct(string_split(text, ' '))) AS n
        FROM documents
    ), dup_b AS (
        SELECT DISTINCT b.doc_id AS id_b
        FROM w a INNER JOIN w b ON a.doc_id < b.doc_id
        WHERE 8 * len(list_intersect(a.words, b.words)) >= 3 * (a.n + b.n)
    )
    SELECT d.lang AS lang, COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id_b FROM dup_b)
    GROUP BY d.lang
    """,
    doc="Near-duplicate-aware curation: PPJoin exact Jaccard pairs "
    "(dedup_jaccard_ppjoin, prefix-filtered — never all-pairs) feed a "
    "keep-lowest-doc_id prune (every id_b of a J>=0.6 pair drops), then "
    "the surviving corpus rolls up per language. The oracle recomputes "
    "the prune from the full quadratic ground truth, so the driver hash "
    "verifies the END-TO-END pipeline, not just the pair list. Plan: "
    "prefix equi-join + left-anti + one tiny rollup shuffle; integer "
    "sums, no floating-point aggregation.",
)
def pipeline_neardup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_dedup import dedup_jaccard_ppjoin

    docs = t(spark, sf_dir, "documents")
    dup_b = (
        dedup_jaccard_ppjoin(spark, sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        docs.join(dup_b, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pipeline_data_mixture",
    oracle="""
    WITH sampled AS (
        SELECT doc_id, lang, source, n_chars,
               (doc_id * 2654435761) % 1000 AS coin,
               CASE WHEN source IN ('src0','src1','src2','src3')
                    THEN 900 ELSE 300 END AS rate
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled WHERE coin < rate
    GROUP BY source
    """,
    doc="Deterministic data-mixture sampling (the training-data mixing "
    "step: up/down-weight sources to a target blend): per-source keep "
    "rates applied via a multiplicative-hash coin on doc_id — seedless, "
    "reproducible on any engine (the Knuth constant 2654435761 spells "
    "identical integer arithmetic in Spark and DuckDB), map-only, no "
    "sampling state. The driver hash checks the EXACT sampled set, not "
    "just counts. At 100 TB: a scan-side filter (pushed predicates on "
    "coin arithmetic) plus one rollup shuffle.",
)
def pipeline_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    coin = (F.col("doc_id") * F.lit(2654435761)) % 1000
    rate = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3"), 900
    ).otherwise(300)
    return (
        d.filter(coin < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pipeline_sequence_packing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), offs AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
        FROM toks
    )
    SELECT lang, CAST(start_off // 512 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc
    FROM offs
    GROUP BY lang, start_off // 512
    """,
    doc="Sequence packing for training batches (offset-contiguous "
    "chunking: each document belongs to the 512-token bin containing its "
    "start offset — the streaming-friendly packing rule, a prefix sum "
    "rather than a sequential greedy recurrence). Per-language running "
    "sum over doc_id order = ONE window shuffle on lang; the rollup "
    "reuses the same partitioning. Deterministic, oracle-paired — the "
    "hash pins every bin assignment.",
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = d.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        offs.groupBy(
            "lang", F.floor(F.col("start_off") / 512).alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "pipeline_context_chunking",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id, s AS chunk_start,
           array_to_string(words[s : least(s + 63, len(words))], ' ')
               AS chunk_text,
           least(s + 63, len(words)) - s + 1 AS n_tokens
    FROM w, UNNEST(range(1, len(words) + 1, 48)) AS t(s)
    """,
    doc="Context-window chunking (the sequence-prep step before packing: "
    "long documents split into 64-token chunks with 16-token overlap, "
    "stride 48). Map-side explode of the chunk-start sequence + "
    "array slice — each row fans out to ceil(n/48) chunks with NO "
    "shuffle; at 100 TB this is a pure scan-side transform. The chunk "
    "text itself is hash-verified, so tokenization, stride arithmetic "
    "and the tail-chunk boundary all match the oracle exactly.",
)
def pipeline_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    return (
        d.withColumn(
            "chunk_start",
            F.explode(F.sequence(F.lit(1), n, F.lit(48))),
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.array_join(
                F.slice(
                    F.col("words"),
                    F.col("chunk_start"),
                    F.least(
                        F.lit(64), n - F.col("chunk_start") + 1
                    ),
                ),
                " ",
            ).alias("chunk_text"),
            (
                F.least(F.col("chunk_start") + 63, n.cast("long"))
                - F.col("chunk_start")
                + 1
            ).alias("n_tokens"),
        )
    )


@register(
    "pipeline_decontaminate",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
    ), tg AS (
        SELECT doc_id, lang, UNNEST(list_transform(
                   range(1, greatest(len(words) - 2, 0) + 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS trigram
        FROM w
    ), eval_tg AS (
        SELECT DISTINCT trigram FROM tg WHERE doc_id < 50
    ), contaminated AS (
        SELECT DISTINCT t.doc_id FROM tg t
        INNER JOIN eval_tg e ON t.trigram = e.trigram
        WHERE t.doc_id >= 50
    )
    SELECT d.lang AS lang,
           COUNT(*) AS n_train,
           COUNT(*) FILTER (WHERE c.doc_id IS NOT NULL) AS n_contaminated
    FROM documents d
    LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id >= 50
    GROUP BY d.lang
    """,
    doc="Decontamination (benchmark-overlap removal — the training-data "
    "step that strips eval leakage): docs with id < 50 stand in for the "
    "held-out eval set; a training doc is contaminated if it shares ANY "
    "word 3-gram with it. Trigrams are a map-side transform over the "
    "token array; the overlap check is a semi join on the (distinct, "
    "small) eval trigram set — at 100 TB that set broadcasts and the "
    "whole check is scan-side, never doc x doc. Per-language "
    "contamination rates are hash-verified end-to-end.",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    tg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                n >= 3,
                F.transform(
                    F.sequence(F.lit(1), n - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("words", i),
                        F.element_at("words", i + 1),
                        F.element_at("words", i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("trigram"),
    )
    eval_tg = tg.filter(F.col("doc_id") < 50).select("trigram").distinct()
    train = d.filter(F.col("doc_id") >= 50)
    contaminated = (
        tg.filter(F.col("doc_id") >= 50)
        .join(eval_tg, "trigram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.coalesce("is_cont", F.lit(0))).alias("n_contaminated"),
        )
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 1000000, doc_id
               ) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM ranked
    WHERE rnk <= CAST(CEIL(n_lang * 0.2) AS BIGINT)
    """,
    doc="Exact stratified sampling (the per-language 20% sample a "
    "mixture-balancing step draws): rank docs per language by a "
    "multiplicative-hash coin (seedless, engine-identical integer "
    "arithmetic) and keep the first ceil(0.2*n) of each stratum — exact "
    "proportions per stratum, unlike Bernoulli sampling's variance. The "
    "driver hash checks the EXACT sampled set. Plan: one window shuffle "
    "on lang; the per-stratum count rides the same window. At 100 TB "
    "swap ROW_NUMBER for a per-stratum rank histogram if a single "
    "stratum outgrows a partition — the hash-coin ordering is unchanged.",
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    coin = (F.col("doc_id") * F.lit(2654435761)) % 1000000
    w = Window.partitionBy("lang").orderBy(coin.asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n_lang"),
    )
    return ranked.filter(
        F.col("rnk") <= F.ceil(F.col("n_lang") * 0.2).cast("long")
    ).select("doc_id", "lang", "rnk")


def stratified_sample_threshold(
    df,
    stratum_col: str,
    key_col: str,
    fraction: float,
    coin_mod: int = 1_000_000,
):
    """Scale path for exact stratified sampling — the histogram fallback
    pipeline_stratified_sample's docstring promises for when one stratum
    outgrows a partition.

    The window version sorts EVERY row of a stratum in one partition
    (Window.partitionBy(stratum).orderBy(coin)); at 100 TB a billion-row
    language would serialize through a single task. This variant selects
    the SAME rows without ever sorting a stratum:

    1. histogram: count rows per (stratum, coin) — one shuffle with
       map-side combine, output bounded by |strata| x coin_mod, not rows;
    2. per-stratum cumulative counts over the (small) histogram find the
       cutoff coin where the running count first reaches
       k = ceil(fraction * n): everything below the cutoff is in the
       sample, plus the ``need`` smallest keys inside the cutoff's tie
       bucket (exactly the (coin, key) order the window version ranks by);
    3. broadcast the one-row-per-stratum cutoffs back and filter
       map-side; only the tie bucket (rows at one coin value) is ranked,
       a partition-sized window regardless of stratum size.

    Returns the sampled (key, stratum) rows — provably the identical SET
    the window version keeps (tests/test_properties.py asserts equality).
    """
    coin = (F.col(key_col) * F.lit(2654435761)) % coin_mod
    d = df.select(key_col, stratum_col).withColumn("__coin", coin)

    hist = d.groupBy(stratum_col, "__coin").agg(F.count(F.lit(1)).alias("cnt"))
    wl = Window.partitionBy(stratum_col).orderBy("__coin")
    wn = Window.partitionBy(stratum_col)
    hist = hist.select(
        stratum_col,
        "__coin",
        "cnt",
        F.sum("cnt").over(wl).alias("cum"),
        F.ceil(F.sum("cnt").over(wn) * F.lit(fraction)).cast("long").alias("k"),
    )
    cuts = (
        hist.filter(F.col("cum") >= F.col("k"))
        .groupBy(stratum_col)
        .agg(F.min_by(F.struct("__coin", "cnt", "cum", "k"), "__coin").alias("s"))
        .select(
            stratum_col,
            F.col("s.__coin").alias("__cut"),
            (F.col("s.k") - (F.col("s.cum") - F.col("s.cnt"))).alias("__need"),
        )
        # One row per stratum (bounded by |strata|); materialized so the
        # histogram pass runs ONCE (r15, guide §2.4) — the below/tie
        # union branches each re-planned the whole hist subtree (two
        # extra aggregate exchanges + a redundant corpus scan pair).
        .localCheckpoint(eager=False)
    )

    dd = d.join(F.broadcast(cuts), stratum_col)
    below = dd.filter(F.col("__coin") < F.col("__cut"))
    tie = dd.filter(F.col("__coin") == F.col("__cut"))
    wt = Window.partitionBy(stratum_col).orderBy(key_col)
    tie_kept = tie.withColumn("__r", F.row_number().over(wt)).filter(
        F.col("__r") <= F.col("__need")
    )
    return below.select(key_col, stratum_col).unionByName(
        tie_kept.select(key_col, stratum_col)
    )


@register(
    "pipeline_stratified_sample_scalable",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 1000000, doc_id
               ) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT doc_id, lang
    FROM ranked
    WHERE rnk <= CAST(CEIL(n_lang * 0.2) AS BIGINT)
    """,
    doc="The 100 TB path for exact stratified sampling "
    "(stratified_sample_threshold): instead of ranking every row of a "
    "stratum through one window partition, build a per-(stratum, coin) "
    "histogram (one map-combined shuffle bounded by |strata| x 1e6 "
    "cells), find each stratum's cutoff coin from the histogram's "
    "cumulative counts, broadcast the one-row-per-stratum cutoffs back, "
    "and filter map-side — only the single tie bucket at the cutoff is "
    "ever ranked. Selects provably the SAME rows as "
    "pipeline_stratified_sample (same (coin, doc_id) order, exact "
    "ceil(0.2 * n) per stratum), which is why the oracle is the window "
    "formulation — the driver hash-check proves the equivalence.",
)
def pipeline_stratified_sample_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return stratified_sample_threshold(d, "lang", "doc_id", 0.2).select(
        "doc_id", "lang"
    )


@register(
    "pipeline_column_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(text) AS text_nulls,
           COUNT(*) - COUNT(lang) AS lang_nulls,
           COUNT(DISTINCT lang) AS lang_distinct,
           COUNT(DISTINCT source) AS source_distinct,
           CAST(MIN(n_chars) AS BIGINT) AS n_chars_min,
           CAST(MAX(n_chars) AS BIGINT) AS n_chars_max,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS n_chars_sum,
           CAST(SUM(CAST(LENGTH(text) AS DECIMAL(38,6))) AS DOUBLE)
               AS text_len_sum
    FROM documents
    """,
    doc="Single-pass column profiler — the data-quality summary every "
    "ingest batch runs before entering the corpus: row count, per-column "
    "null counts, distinct counts for the low-cardinality dimensions, "
    "numeric min/max/sum, and total text length, all in ONE aggregation "
    "over one scan. At 100 TB the exact COUNT(DISTINCT)s are the only "
    "multi-pass risk (Catalyst expands them); swap in "
    "approx_count_distinct (agg_hll_mergeable_sketch is the stored-"
    "summary variant) when the profiled column is high-cardinality.",
)
def pipeline_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return d.agg(
        n.alias("n_rows"),
        (n - F.count("text")).alias("text_nulls"),
        (n - F.count("lang")).alias("lang_nulls"),
        F.countDistinct("lang").alias("lang_distinct"),
        F.countDistinct("source").alias("source_distinct"),
        F.min("n_chars").alias("n_chars_min"),
        F.max("n_chars").alias("n_chars_max"),
        dsum("n_chars").alias("n_chars_sum"),
        dsum(F.length("text")).alias("text_len_sum"),
    )


@register(
    "pipeline_incremental_dedup",
    oracle="""
    WITH c AS (
        SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
    ), n AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
    )
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes_in_batch
    FROM n WHERE h NOT IN (SELECT h FROM c)
    GROUP BY h
    """,
    doc="Incremental exact dedup — the continual-ingestion workflow: a "
    "NEW batch (odd doc_ids) is deduplicated against the EXISTING "
    "corpus (even doc_ids) via an anti join on content hash, then "
    "within-batch duplicates collapse to the min-doc_id keeper with "
    "their multiplicity. At 100 TB the corpus side is the stored "
    "fingerprint table (hash only, not text) and both the anti join and "
    "the keeper groupBy shuffle on the same hash key — one exchange "
    "reused, no re-read of historic text.",
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    corpus = d.filter(F.col("doc_id") % 2 == 0).select("h")
    new = d.filter(F.col("doc_id") % 2 == 1)
    return (
        new.join(corpus, "h", "left_anti")
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_dupes_in_batch"),
        )
        .select("doc_id", "n_dupes_in_batch")
    )


@register(
    "pipeline_quota_cap",
    oracle="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY (doc_id * 2654435761) % 1000000, doc_id
               ) AS rnk
        FROM documents
    ) WHERE rnk <= 5
    """,
    doc="Per-(lang, source) quota capping — the mixture-balancing step "
    "that bounds any one domain's contribution: keep at most K=5 docs "
    "per stratum, chosen by the deterministic hash-coin order (same "
    "coin as the sampling/split operators, so caps compose with them "
    "reproducibly). Spark plans the rank filter as WindowGroupLimit: "
    "each map task keeps only its local top-K per group BEFORE the "
    "shuffle, so per-stratum state is O(K) at any corpus size — the cap "
    "is what makes this safe where a fraction-based sample is not.",
)
def pipeline_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    coin = (F.col("doc_id") * F.lit(2654435761)) % 1000000
    w = Window.partitionBy("lang", "source").orderBy(
        coin.asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "lang", "source")
    )


@register(
    "pipeline_train_val_split",
    oracle="""
    SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test split (80/10/10) via the "
    "multiplicative-hash coin on doc_id — assignment is a pure function "
    "of the key, so re-running the pipeline (or running it on another "
    "engine) never migrates a document between splits; no RNG state, no "
    "split manifest to store. Map-only assignment + one rollup shuffle.",
)
def pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    coin = (F.col("doc_id") * F.lit(2654435761)) % 100
    split = (
        F.when(coin < 80, "train").when(coin < 90, "val").otherwise("test")
    )
    return (
        d.groupBy(split.alias("split"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pipeline_deterministic_shuffle",
    oracle="""
    SELECT doc_id, lang, CAST(pos AS BIGINT) AS pos FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   ORDER BY (doc_id * 2654435761) % 1048576, doc_id
               ) AS pos
        FROM documents
    ) WHERE pos <= 100
    """,
    doc="Deterministic global shuffle order for training (the epoch-"
    "shuffle step: a reproducible total order decorrelated from insert "
    "order, here the first 100 positions): order by the multiplicative-"
    "hash coin and take the prefix. Spark plan is orderBy().limit(k) -> "
    "TakeOrderedAndProject — each partition keeps only its local top-k "
    "(a map-side heap, no global sort materialized), then the driver "
    "merges k*n_partitions rows; position numbering runs over the tiny "
    "k-row result. At 100 TB a FULL shuffle export would instead use "
    "repartitionByRange(coin) + sortWithinPartitions — same ordering "
    "key, no single-point merge; this query pins the prefix semantics.",
)
def pipeline_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    coin = ((F.col("doc_id") * F.lit(2654435761)) % 1048576).alias("__coin")
    top = d.select("doc_id", "lang", coin).orderBy("__coin", "doc_id").limit(100)
    w = Window.orderBy("__coin", "doc_id")
    return top.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("pos")
    )


@register(
    "pipeline_bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
        SELECT w, COUNT(*) AS c FROM words WHERE len(w) >= 2 GROUP BY w
    ), pairs AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> substr(w, i, 2))) AS pair, c
        FROM wc
    )
    SELECT pair, CAST(SUM(c) AS BIGINT) AS n FROM pairs
    GROUP BY pair ORDER BY n DESC, pair LIMIT 50
    """,
    doc="Distributed BPE pair counting — the inner loop of tokenizer "
    "training (Sennrich et al. 2016), which at 100 TB is exactly a "
    "corpus-scale aggregation problem: count each adjacent character "
    "pair weighted by word frequency, return the top merges. Two "
    "shuffles total: the word-frequency aggregate (so each distinct "
    "word's pairs are enumerated ONCE, not per occurrence — the "
    "map-side win that makes this feasible on web-scale corpora), then "
    "the pair aggregate; top-50 via TakeOrderedAndProject, ties broken "
    "by pair for cross-engine determinism. The oracle replays the same "
    "two aggregates in DuckDB.",
)
def pipeline_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(50)
    )


#: merges learned per training run — all from ONE pair-count scan (see
#: _select_bpe_batch); fixed so the oracle can unroll the selection
N_BPE_MERGES = 4
#: candidate pool collected per scan (driver hop is <= this many rows);
#: the greedy disjoint selection can never need more than it inspects —
#: a loud error fires if the pool can't yield N_BPE_MERGES merges
BPE_TOPM = 32


def _select_bpe_batch(
    cands: list[tuple[str, int]],
) -> list[tuple[str, int]]:
    """Greedy SYMBOL-DISJOINT batch selection (the standard batched-BPE
    scaling trick — e.g. the multi-merge step in fast BPE trainers):
    walk candidates in (count DESC, pair ASC) order, keep a pair iff
    neither of its symbols was touched by an already-kept merge (its
    operand symbols, or the symbol that merge fuses into existence).

    Why this is sound to batch: merging (x1,y1) can only change the
    occurrence count of pairs that involve x1, y1, or the fused symbol
    x1y1 — a kept pair disjoint from all three has an INVARIANT count,
    so its recorded n is exactly the count a per-merge rescan would
    have seen, and applying the batch in rank order equals applying
    the merges one-per-scan. The variant is deterministic but NOT
    always identical to strict 1-merge-per-scan BPE: when the true
    next-best pair shares a symbol with an earlier merge (e.g. 'er'
    then 'or' on this corpus), strict BPE would rescan and consider
    newly-fused pairs, while this rule skips to the best disjoint
    candidate. The oracle replays the SAME rule, and
    tests/test_bpe_batch.py pins engine == reference on the fixtures.
    VERDICT r13 #6: the previous loop ran one orderBy().limit(1)
    driver job PER merge; this learns all N_BPE_MERGES from one scan
    (merges-per-driver-job ratio = N_BPE_MERGES).
    """
    kept: list[tuple[str, int]] = []
    used: set[str] = set()
    for pair, n in cands:
        x, y = pair[1:-1].split(")(")
        if x in used or y in used:
            continue
        kept.append((pair, int(n)))
        used |= {x, y, x + y}
        if len(kept) == N_BPE_MERGES:
            return kept
    raise RuntimeError(
        f"BPE batch selection found only {len(kept)}/{N_BPE_MERGES} "
        f"disjoint merges in the top-{len(cands)} candidate pool — "
        "raise BPE_TOPM"
    )


def _bpe_batch_sql_ctes() -> str:
    """CTE chain replaying _select_bpe_batch + the batch application in
    ANSI SQL, picking up after a CTE ``p1`` = (pair, n) counts over the
    wrapped-symbol table ``w0``: cand (symbols/fused extracted), c1..cN
    (greedy disjoint picks), u1..uN (cumulative used-symbol sets), sel
    (the learned table), w1..wN (merges applied in rank order; disjoint
    merges commute, rank order is kept for readability)."""
    ctes = [
        """cand AS (
        SELECT pair, n,
               string_split(trim(pair, '()'), ')(')[1] AS s1,
               string_split(trim(pair, '()'), ')(')[2] AS s2,
               replace(trim(pair, '()'), ')(', '') AS f
        FROM p1
    )"""
    ]
    for k in range(1, N_BPE_MERGES + 1):
        guard = (
            f"WHERE s1 NOT IN (SELECT u FROM u{k - 1}) "
            f"AND s2 NOT IN (SELECT u FROM u{k - 1})"
            if k > 1
            else ""
        )
        ctes.append(
            f"c{k} AS (SELECT * FROM cand {guard} "
            f"ORDER BY n DESC, pair LIMIT 1)"
        )
        prev = f"SELECT u FROM u{k - 1} UNION ALL " if k > 1 else ""
        ctes.append(
            f"u{k} AS ({prev}SELECT unnest([s1, s2, f]) AS u FROM c{k})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {k} AS rank, pair, n FROM c{k}"
        for k in range(1, N_BPE_MERGES + 1)
    )
    ctes.append(f"sel AS ({sel})")
    for k in range(1, N_BPE_MERGES + 1):
        ctes.append(
            f"w{k} AS ({_BPE_MERGE_SQL.format(b=f'c{k}', w=f'w{k - 1}')})"
        )
    return ", ".join(ctes)


#: the nested-replace expression applying the learned batch to a wrapped
#: segs string column {col} (encode oracle): replace(...replace({col},
#: c1.pair, fused)..., cN.pair, fused)
def _bpe_apply_sql(col: str) -> str:
    out = col
    for k in range(1, N_BPE_MERGES + 1):
        out = (
            f"replace({out}, (SELECT pair FROM c{k}), "
            f"'(' || replace(trim((SELECT pair FROM c{k}), '()'), "
            f"')(', '') || ')')"
        )
    return out

# one BPE iteration's pair counts over wrapped-symbol strings; {w} is
# the CTE holding (segs, c). Symbols are wrapped '(s1)(s2)...' so the
# merge is a plain string replace — non-overlapping left-to-right,
# exactly the classic greedy within-word merge — and a pair string can
# never straddle a symbol boundary (alpha symbols carry no parens).
_BPE_PAIRS_SQL = """
    SELECT pair, CAST(SUM(c) AS BIGINT) AS n FROM (
        SELECT unnest(list_transform(
            generate_series(1,
                len(string_split(trim(segs, '()'), ')(')) - 1),
            i -> '(' || string_split(trim(segs, '()'), ')(')[i] ||
                 ')(' || string_split(trim(segs, '()'), ')(')[i + 1]
                 || ')')) AS pair, c
        FROM {w})
    GROUP BY pair
"""

_BPE_MERGE_SQL = """
    SELECT replace(segs, (SELECT pair FROM {b}),
                   '(' || replace(trim((SELECT pair FROM {b}), '()'),
                                  ')(', '') || ')') AS segs, c
    FROM {w}
"""


def _bpe_pair_counts_df(df: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a weighted (syms, c) table —
    one BPE iteration's statistics (the pipeline_bpe_pair_counts plan:
    explode + one aggregate over the vocabulary-sized table)."""
    return (
        df.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.concat(
                        F.lit("("),
                        F.element_at("syms", i),
                        F.lit(")("),
                        F.element_at("syms", i + 1),
                        F.lit(")"),
                    ),
                )
            ).alias("pair"),
            "c",
        )
        .groupBy("pair")
        .agg(F.sum("c").alias("n"))
    )


def _bpe_fold_merge(arr, x: str, y: str):
    """Apply ONE learned merge (x, y) -> xy to a symbol array as a JVM
    left fold: append, or fuse with the previous symbol when it equals
    x and the current equals y. Provably identical to the classic
    non-overlapping left-to-right merge — a freshly fused symbol is
    xy != x, so overlapping occurrences never double-merge."""
    xy = x + y
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(x))
            & (s == F.lit(y)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(xy)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


#: learned merge tables keyed by sf_dir — a trained tokenizer is a
#: persisted artifact applied by MANY encode jobs, so re-deriving it
#: per encode call would be the wrong plan at any scale; the cache is
#: the in-process stand-in for that artifact (deterministic per corpus)
_BPE_MERGES_CACHE: dict[str, list[tuple[int, str, int]]] = {}


def _bpe_learn(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """The BPE training loop shared by pipeline_bpe_train (which also
    reports the next iteration's candidates) and pipeline_bpe_encode
    (which applies the learned merges): ONE pair-count scan collects
    the top-BPE_TOPM candidates (a single bounded driver hop), the
    greedy disjoint rule selects all N_BPE_MERGES merges from it
    (_select_bpe_batch — counts of disjoint pairs are invariant under
    each other's merges, so the one scan's counts are exact), then the
    DISTINCT-WORD symbol table is re-segmented once with the whole
    batch as chained JVM left-folds. Returns (merges, segs): merges =
    [(rank, '(x)(y)', n)], segs = the post-merge weighted symbol
    table. Populates _BPE_MERGES_CACHE."""
    words = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    segs = words.select(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("syms"),
        "c",
    ).localCheckpoint(eager=False)
    top = (
        _bpe_pair_counts_df(segs)
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOPM)
        .collect()
    )
    batch = _select_bpe_batch([(r["pair"], r["n"]) for r in top])
    merges = [(k, pair, n) for k, (pair, n) in enumerate(batch, 1)]
    folded = F.col("syms")
    for _, pair, _ in merges:
        x, y = pair[1:-1].split(")(")
        folded = _bpe_fold_merge(folded, x, y)
    segs = segs.select(folded.alias("syms"), "c").localCheckpoint(
        eager=False
    )
    _BPE_MERGES_CACHE[sf_dir] = merges
    return merges, segs


@register(
    "pipeline_bpe_train",
    oracle=f"""
    WITH words AS (
        SELECT w, COUNT(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY w
    ), w0 AS (
        SELECT '(' || array_to_string(
                   list_transform(generate_series(1, len(w)),
                                  i -> substr(w, i, 1)), ')(')
               || ')' AS segs, c
        FROM words
    ), p1 AS ({_BPE_PAIRS_SQL.format(w='w0')}
    ), {_bpe_batch_sql_ctes()},
    pnext AS ({_BPE_PAIRS_SQL.format(w=f'w{N_BPE_MERGES}')}
    )
    SELECT CAST(rank AS INT) AS rank, pair, n FROM sel
    UNION ALL
    SELECT CAST({N_BPE_MERGES} + rn AS INT), pair, n FROM (
        SELECT pair, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rn
        FROM pnext) WHERE rn <= 10
    """,
    doc=f"BPE tokenizer TRAINING in-engine — {N_BPE_MERGES} merges "
    "(Sennrich et al. 2016, batched variant) plus the next "
    "iteration's top-10 merge candidates. All merges are learned "
    "from ONE adjacent-pair count over the corpus-weighted word "
    "table (two shuffles, the pipeline_bpe_pair_counts plan) via the "
    "greedy SYMBOL-DISJOINT batch rule (_select_bpe_batch — disjoint "
    "pairs' counts are invariant under each other's merges, so the "
    "single scan's counts are exact; the standard multi-merge-per-"
    "scan trick a web-scale trainer needs: one bounded driver hop "
    "per N_BPE_MERGES merges instead of one full rescan per merge, "
    "VERDICT r13 #6). Every word is then re-segmented once with the "
    "whole batch as chained JVM left-folds — each provably identical "
    "to the classic non-overlapping left-to-right merge (the fold "
    "can never re-merge a freshly merged symbol, since x||y != x). "
    "Symbols are emitted wrapped ('(l)(l)') so the oracle can replay "
    "each merge as a plain string REPLACE over its wrapped-symbol "
    "encoding; the oracle unrolls the SAME disjoint selection "
    "(_bpe_batch_sql_ctes). At 100 TB the scan is one aggregate over "
    "the DISTINCT-WORD table (vocabulary-sized, not corpus-sized) — "
    "a real 32k-merge tokenizer is 32k/N_BPE_MERGES scans instead of "
    "32k sequential driver round-trips.",
)
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, segs = _bpe_learn(spark, sf_dir)
    pair_counts = _bpe_pair_counts_df
    learned = spark.createDataFrame(
        merges, "rank int, pair string, n long"
    )
    # top-10 via TakeOrderedAndProject (distributed), THEN the global
    # row_number runs on only 10 rows — the single-partition window
    # never sees more than the final answer
    w = Window.orderBy(F.col("n").desc(), "pair")
    candidates = (
        pair_counts(segs)
        .orderBy(F.col("n").desc(), "pair")
        .limit(10)
        .withColumn("rn", F.row_number().over(w))
        .select(
            (F.col("rn") + N_BPE_MERGES).cast("int").alias("rank"),
            "pair",
            "n",
        )
    )
    return learned.unionByName(candidates)


@register(
    "pipeline_quality_floor",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS n_tok
        FROM documents
    ), f AS (
        SELECT source,
               CAST(quantile_disc(n_tok, 0.25) AS BIGINT) AS floor_ntok
        FROM d GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_tok, f.floor_ntok
    FROM d JOIN f ON d.source = f.source
    WHERE d.n_tok >= f.floor_ntok
    """,
    doc="Per-SOURCE quality floor — the per-domain threshold filter "
    "real curation pipelines apply (a single global cutoff starves "
    "low-resource domains): the p25 of each source's distinct-token "
    "count via PERCENTILE_DISC (element-picking, exact across "
    "engines), broadcast back onto the corpus, keep docs at or above "
    "their own domain's floor. At 100 TB the floor table is "
    "domain-cardinality (KBs) — the corpus-side filter is one "
    "broadcast-join map pass; the percentile aggregate is the only "
    "data shuffle.",
)
def pipeline_quality_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_tok"),
    )
    d.createOrReplaceTempView("__qf_docs")
    floors = spark.sql(
        """
        SELECT source,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tok)
                    AS BIGINT) AS floor_ntok
        FROM __qf_docs GROUP BY source
        """
    )
    return (
        d.join(F.broadcast(floors), "source")
        .filter(F.col("n_tok") >= F.col("floor_ntok"))
        .select("doc_id", "source", "n_tok", "floor_ntok")
    )


@register(
    "pipeline_bpe_encode",
    oracle=f"""
    WITH words AS (
        SELECT w, COUNT(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY w
    ), w0 AS (
        SELECT '(' || array_to_string(
                   list_transform(generate_series(1, len(w)),
                                  i -> substr(w, i, 1)), ')(')
               || ')' AS segs, c
        FROM words
    ), p1 AS ({_BPE_PAIRS_SQL.format(w='w0')}
    ), {_bpe_batch_sql_ctes()},
    dw AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), enc AS (
        SELECT doc_id,
               {_bpe_apply_sql('''('(' || array_to_string(
                   list_transform(generate_series(1, len(w)),
                                  i -> substr(w, i, 1)), ')(')
                   || ')')''')} AS segs
        FROM dw
    ), agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(string_split(trim(segs, '()'), ')(')))
                    AS BIGINT) AS n_tokens
        FROM enc GROUP BY doc_id
    ), fw AS (
        SELECT doc_id,
               {_bpe_apply_sql('''('(' || array_to_string(
                   list_transform(generate_series(1, len(w)),
                                  i -> substr(w, i, 1)), ')(')
                   || ')')''')} AS segs
        FROM (SELECT doc_id, string_split(text, ' ')[1] AS w
              FROM documents)
    )
    SELECT a.doc_id, a.n_words, a.n_tokens,
           replace(trim(f.segs, '()'), ')(', '|') AS first_word_tokens
    FROM agg a JOIN fw f ON a.doc_id = f.doc_id
    """,
    doc=f"BPE tokenizer ENCODE in-engine — apply the {N_BPE_MERGES} "
    "merges learned by pipeline_bpe_train (same loop, _bpe_learn) to "
    "every document: per word, segment to characters and left-fold "
    "each merge in training order (the classic greedy within-word "
    "application); emit per-doc word count, post-merge token count, "
    "and the first word's token sequence. The encode itself is "
    "MAP-ONLY — zero shuffles over the corpus (the learned merge "
    "table is a driver-side constant of bounded size, the "
    "broadcast-dictionary contract); at 100 TB this is the one-pass "
    "tokenize-and-count every training run needs between curation "
    "and packing. Oracle replays the merges as wrapped-symbol string "
    "REPLACEs.",
)
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the merge table is a trained artifact: reuse it when this corpus
    # already trained in-process (first call pays the training loop)
    merges = _BPE_MERGES_CACHE.get(sf_dir)
    if merges is None:
        merges, _ = _bpe_learn(spark, sf_dir)
    pairs = [tuple(p[1:-1].split(")(")) for _, p, _ in merges]

    # Arrow-batched encode with a per-batch WORD MEMO (round 13): the
    # previous plan left-folded each merge as a Catalyst higher-order
    # aggregate per word — interpreted lambdas with O(len) array
    # copies per step, 5.6 s at sf1z for two merges. Natural-language
    # token frequency is Zipfian, so a batch of documents revisits the
    # same words constantly; memoizing encode-per-word makes the UDF's
    # cost ~one dict hit per word occurrence plus one real encode per
    # DISTINCT word per batch. Same left-fold semantics per merge
    # (fuse with the previous symbol when (prev, cur) == (x, y) —
    # freshly fused xy != x, so overlaps never double-merge).
    @F.pandas_udf("struct<n_tokens: long, first_word_tokens: string>")
    def bpe_enc(text: pd.Series) -> pd.DataFrame:
        memo: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            arr = memo.get(w)
            if arr is None:
                arr = list(w)
                for x, y in pairs:
                    xy = x + y
                    out: list[str] = []
                    for s in arr:
                        if out and s == y and out[-1] == x:
                            out[-1] = xy
                        else:
                            out.append(s)
                    arr = out
                memo[w] = arr
            return arr

        n_tokens, firsts = [], []
        for doc in text:
            if doc is None:
                # preserve the Catalyst expression's null propagation
                # (ADVICE r13): a NULL text row yields NULL outputs
                # instead of failing the whole job on .split
                n_tokens.append(None)
                firsts.append(None)
                continue
            ws = doc.split(" ")
            n_tokens.append(sum(len(enc(w)) for w in ws))
            firsts.append("|".join(enc(ws[0])))
        return pd.DataFrame(
            {"n_tokens": n_tokens, "first_word_tokens": firsts}
        )

    # fan_out: the encode is PER-ROW COMPUTE-BOUND and the fixture
    # scan byte-packs into one task — partition by COST, not bytes,
    # the same rule every compute-heavy [C] stage here follows. The
    # tiny round-robin shuffle (MBs) unlocks full-core parallelism;
    # on a real cluster the scan arrives pre-split and the encode
    # itself stays map-only on top of it.
    docs = fan_out(t(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_words"),
            bpe_enc(F.col("text")).alias("e"),
        )
        .select(
            "doc_id",
            "n_words",
            F.col("e.n_tokens").alias("n_tokens"),
            F.col("e.first_word_tokens").alias("first_word_tokens"),
        )
    )


@register(
    "pipeline_semdedup",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a
        INNER JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ((0.0 + CAST(a.embedding[1] AS DOUBLE) * CAST(b.embedding[1] AS DOUBLE) + CAST(a.embedding[2] AS DOUBLE) * CAST(b.embedding[2] AS DOUBLE) + CAST(a.embedding[3] AS DOUBLE) * CAST(b.embedding[3] AS DOUBLE) + CAST(a.embedding[4] AS DOUBLE) * CAST(b.embedding[4] AS DOUBLE) + CAST(a.embedding[5] AS DOUBLE) * CAST(b.embedding[5] AS DOUBLE) + CAST(a.embedding[6] AS DOUBLE) * CAST(b.embedding[6] AS DOUBLE) + CAST(a.embedding[7] AS DOUBLE) * CAST(b.embedding[7] AS DOUBLE) + CAST(a.embedding[8] AS DOUBLE) * CAST(b.embedding[8] AS DOUBLE) + CAST(a.embedding[9] AS DOUBLE) * CAST(b.embedding[9] AS DOUBLE) + CAST(a.embedding[10] AS DOUBLE) * CAST(b.embedding[10] AS DOUBLE) + CAST(a.embedding[11] AS DOUBLE) * CAST(b.embedding[11] AS DOUBLE) + CAST(a.embedding[12] AS DOUBLE) * CAST(b.embedding[12] AS DOUBLE) + CAST(a.embedding[13] AS DOUBLE) * CAST(b.embedding[13] AS DOUBLE) + CAST(a.embedding[14] AS DOUBLE) * CAST(b.embedding[14] AS DOUBLE) + CAST(a.embedding[15] AS DOUBLE) * CAST(b.embedding[15] AS DOUBLE) + CAST(a.embedding[16] AS DOUBLE) * CAST(b.embedding[16] AS DOUBLE) + CAST(a.embedding[17] AS DOUBLE) * CAST(b.embedding[17] AS DOUBLE) + CAST(a.embedding[18] AS DOUBLE) * CAST(b.embedding[18] AS DOUBLE) + CAST(a.embedding[19] AS DOUBLE) * CAST(b.embedding[19] AS DOUBLE) + CAST(a.embedding[20] AS DOUBLE) * CAST(b.embedding[20] AS DOUBLE) + CAST(a.embedding[21] AS DOUBLE) * CAST(b.embedding[21] AS DOUBLE) + CAST(a.embedding[22] AS DOUBLE) * CAST(b.embedding[22] AS DOUBLE) + CAST(a.embedding[23] AS DOUBLE) * CAST(b.embedding[23] AS DOUBLE) + CAST(a.embedding[24] AS DOUBLE) * CAST(b.embedding[24] AS DOUBLE) + CAST(a.embedding[25] AS DOUBLE) * CAST(b.embedding[25] AS DOUBLE) + CAST(a.embedding[26] AS DOUBLE) * CAST(b.embedding[26] AS DOUBLE) + CAST(a.embedding[27] AS DOUBLE) * CAST(b.embedding[27] AS DOUBLE) + CAST(a.embedding[28] AS DOUBLE) * CAST(b.embedding[28] AS DOUBLE) + CAST(a.embedding[29] AS DOUBLE) * CAST(b.embedding[29] AS DOUBLE) + CAST(a.embedding[30] AS DOUBLE) * CAST(b.embedding[30] AS DOUBLE) + CAST(a.embedding[31] AS DOUBLE) * CAST(b.embedding[31] AS DOUBLE) + CAST(a.embedding[32] AS DOUBLE) * CAST(b.embedding[32] AS DOUBLE) + CAST(a.embedding[33] AS DOUBLE) * CAST(b.embedding[33] AS DOUBLE) + CAST(a.embedding[34] AS DOUBLE) * CAST(b.embedding[34] AS DOUBLE) + CAST(a.embedding[35] AS DOUBLE) * CAST(b.embedding[35] AS DOUBLE) + CAST(a.embedding[36] AS DOUBLE) * CAST(b.embedding[36] AS DOUBLE) + CAST(a.embedding[37] AS DOUBLE) * CAST(b.embedding[37] AS DOUBLE) + CAST(a.embedding[38] AS DOUBLE) * CAST(b.embedding[38] AS DOUBLE) + CAST(a.embedding[39] AS DOUBLE) * CAST(b.embedding[39] AS DOUBLE) + CAST(a.embedding[40] AS DOUBLE) * CAST(b.embedding[40] AS DOUBLE) + CAST(a.embedding[41] AS DOUBLE) * CAST(b.embedding[41] AS DOUBLE) + CAST(a.embedding[42] AS DOUBLE) * CAST(b.embedding[42] AS DOUBLE) + CAST(a.embedding[43] AS DOUBLE) * CAST(b.embedding[43] AS DOUBLE) + CAST(a.embedding[44] AS DOUBLE) * CAST(b.embedding[44] AS DOUBLE) + CAST(a.embedding[45] AS DOUBLE) * CAST(b.embedding[45] AS DOUBLE) + CAST(a.embedding[46] AS DOUBLE) * CAST(b.embedding[46] AS DOUBLE) + CAST(a.embedding[47] AS DOUBLE) * CAST(b.embedding[47] AS DOUBLE) + CAST(a.embedding[48] AS DOUBLE) * CAST(b.embedding[48] AS DOUBLE) + CAST(a.embedding[49] AS DOUBLE) * CAST(b.embedding[49] AS DOUBLE) + CAST(a.embedding[50] AS DOUBLE) * CAST(b.embedding[50] AS DOUBLE) + CAST(a.embedding[51] AS DOUBLE) * CAST(b.embedding[51] AS DOUBLE) + CAST(a.embedding[52] AS DOUBLE) * CAST(b.embedding[52] AS DOUBLE) + CAST(a.embedding[53] AS DOUBLE) * CAST(b.embedding[53] AS DOUBLE) + CAST(a.embedding[54] AS DOUBLE) * CAST(b.embedding[54] AS DOUBLE) + CAST(a.embedding[55] AS DOUBLE) * CAST(b.embedding[55] AS DOUBLE) + CAST(a.embedding[56] AS DOUBLE) * CAST(b.embedding[56] AS DOUBLE) + CAST(a.embedding[57] AS DOUBLE) * CAST(b.embedding[57] AS DOUBLE) + CAST(a.embedding[58] AS DOUBLE) * CAST(b.embedding[58] AS DOUBLE) + CAST(a.embedding[59] AS DOUBLE) * CAST(b.embedding[59] AS DOUBLE) + CAST(a.embedding[60] AS DOUBLE) * CAST(b.embedding[60] AS DOUBLE) + CAST(a.embedding[61] AS DOUBLE) * CAST(b.embedding[61] AS DOUBLE) + CAST(a.embedding[62] AS DOUBLE) * CAST(b.embedding[62] AS DOUBLE) + CAST(a.embedding[63] AS DOUBLE) * CAST(b.embedding[63] AS DOUBLE) + CAST(a.embedding[64] AS DOUBLE) * CAST(b.embedding[64] AS DOUBLE)) / (SQRT((0.0 + CAST(a.embedding[1] AS DOUBLE) * CAST(a.embedding[1] AS DOUBLE) + CAST(a.embedding[2] AS DOUBLE) * CAST(a.embedding[2] AS DOUBLE) + CAST(a.embedding[3] AS DOUBLE) * CAST(a.embedding[3] AS DOUBLE) + CAST(a.embedding[4] AS DOUBLE) * CAST(a.embedding[4] AS DOUBLE) + CAST(a.embedding[5] AS DOUBLE) * CAST(a.embedding[5] AS DOUBLE) + CAST(a.embedding[6] AS DOUBLE) * CAST(a.embedding[6] AS DOUBLE) + CAST(a.embedding[7] AS DOUBLE) * CAST(a.embedding[7] AS DOUBLE) + CAST(a.embedding[8] AS DOUBLE) * CAST(a.embedding[8] AS DOUBLE) + CAST(a.embedding[9] AS DOUBLE) * CAST(a.embedding[9] AS DOUBLE) + CAST(a.embedding[10] AS DOUBLE) * CAST(a.embedding[10] AS DOUBLE) + CAST(a.embedding[11] AS DOUBLE) * CAST(a.embedding[11] AS DOUBLE) + CAST(a.embedding[12] AS DOUBLE) * CAST(a.embedding[12] AS DOUBLE) + CAST(a.embedding[13] AS DOUBLE) * CAST(a.embedding[13] AS DOUBLE) + CAST(a.embedding[14] AS DOUBLE) * CAST(a.embedding[14] AS DOUBLE) + CAST(a.embedding[15] AS DOUBLE) * CAST(a.embedding[15] AS DOUBLE) + CAST(a.embedding[16] AS DOUBLE) * CAST(a.embedding[16] AS DOUBLE) + CAST(a.embedding[17] AS DOUBLE) * CAST(a.embedding[17] AS DOUBLE) + CAST(a.embedding[18] AS DOUBLE) * CAST(a.embedding[18] AS DOUBLE) + CAST(a.embedding[19] AS DOUBLE) * CAST(a.embedding[19] AS DOUBLE) + CAST(a.embedding[20] AS DOUBLE) * CAST(a.embedding[20] AS DOUBLE) + CAST(a.embedding[21] AS DOUBLE) * CAST(a.embedding[21] AS DOUBLE) + CAST(a.embedding[22] AS DOUBLE) * CAST(a.embedding[22] AS DOUBLE) + CAST(a.embedding[23] AS DOUBLE) * CAST(a.embedding[23] AS DOUBLE) + CAST(a.embedding[24] AS DOUBLE) * CAST(a.embedding[24] AS DOUBLE) + CAST(a.embedding[25] AS DOUBLE) * CAST(a.embedding[25] AS DOUBLE) + CAST(a.embedding[26] AS DOUBLE) * CAST(a.embedding[26] AS DOUBLE) + CAST(a.embedding[27] AS DOUBLE) * CAST(a.embedding[27] AS DOUBLE) + CAST(a.embedding[28] AS DOUBLE) * CAST(a.embedding[28] AS DOUBLE) + CAST(a.embedding[29] AS DOUBLE) * CAST(a.embedding[29] AS DOUBLE) + CAST(a.embedding[30] AS DOUBLE) * CAST(a.embedding[30] AS DOUBLE) + CAST(a.embedding[31] AS DOUBLE) * CAST(a.embedding[31] AS DOUBLE) + CAST(a.embedding[32] AS DOUBLE) * CAST(a.embedding[32] AS DOUBLE) + CAST(a.embedding[33] AS DOUBLE) * CAST(a.embedding[33] AS DOUBLE) + CAST(a.embedding[34] AS DOUBLE) * CAST(a.embedding[34] AS DOUBLE) + CAST(a.embedding[35] AS DOUBLE) * CAST(a.embedding[35] AS DOUBLE) + CAST(a.embedding[36] AS DOUBLE) * CAST(a.embedding[36] AS DOUBLE) + CAST(a.embedding[37] AS DOUBLE) * CAST(a.embedding[37] AS DOUBLE) + CAST(a.embedding[38] AS DOUBLE) * CAST(a.embedding[38] AS DOUBLE) + CAST(a.embedding[39] AS DOUBLE) * CAST(a.embedding[39] AS DOUBLE) + CAST(a.embedding[40] AS DOUBLE) * CAST(a.embedding[40] AS DOUBLE) + CAST(a.embedding[41] AS DOUBLE) * CAST(a.embedding[41] AS DOUBLE) + CAST(a.embedding[42] AS DOUBLE) * CAST(a.embedding[42] AS DOUBLE) + CAST(a.embedding[43] AS DOUBLE) * CAST(a.embedding[43] AS DOUBLE) + CAST(a.embedding[44] AS DOUBLE) * CAST(a.embedding[44] AS DOUBLE) + CAST(a.embedding[45] AS DOUBLE) * CAST(a.embedding[45] AS DOUBLE) + CAST(a.embedding[46] AS DOUBLE) * CAST(a.embedding[46] AS DOUBLE) + CAST(a.embedding[47] AS DOUBLE) * CAST(a.embedding[47] AS DOUBLE) + CAST(a.embedding[48] AS DOUBLE) * CAST(a.embedding[48] AS DOUBLE) + CAST(a.embedding[49] AS DOUBLE) * CAST(a.embedding[49] AS DOUBLE) + CAST(a.embedding[50] AS DOUBLE) * CAST(a.embedding[50] AS DOUBLE) + CAST(a.embedding[51] AS DOUBLE) * CAST(a.embedding[51] AS DOUBLE) + CAST(a.embedding[52] AS DOUBLE) * CAST(a.embedding[52] AS DOUBLE) + CAST(a.embedding[53] AS DOUBLE) * CAST(a.embedding[53] AS DOUBLE) + CAST(a.embedding[54] AS DOUBLE) * CAST(a.embedding[54] AS DOUBLE) + CAST(a.embedding[55] AS DOUBLE) * CAST(a.embedding[55] AS DOUBLE) + CAST(a.embedding[56] AS DOUBLE) * CAST(a.embedding[56] AS DOUBLE) + CAST(a.embedding[57] AS DOUBLE) * CAST(a.embedding[57] AS DOUBLE) + CAST(a.embedding[58] AS DOUBLE) * CAST(a.embedding[58] AS DOUBLE) + CAST(a.embedding[59] AS DOUBLE) * CAST(a.embedding[59] AS DOUBLE) + CAST(a.embedding[60] AS DOUBLE) * CAST(a.embedding[60] AS DOUBLE) + CAST(a.embedding[61] AS DOUBLE) * CAST(a.embedding[61] AS DOUBLE) + CAST(a.embedding[62] AS DOUBLE) * CAST(a.embedding[62] AS DOUBLE) + CAST(a.embedding[63] AS DOUBLE) * CAST(a.embedding[63] AS DOUBLE) + CAST(a.embedding[64] AS DOUBLE) * CAST(a.embedding[64] AS DOUBLE))) * SQRT((0.0 + CAST(b.embedding[1] AS DOUBLE) * CAST(b.embedding[1] AS DOUBLE) + CAST(b.embedding[2] AS DOUBLE) * CAST(b.embedding[2] AS DOUBLE) + CAST(b.embedding[3] AS DOUBLE) * CAST(b.embedding[3] AS DOUBLE) + CAST(b.embedding[4] AS DOUBLE) * CAST(b.embedding[4] AS DOUBLE) + CAST(b.embedding[5] AS DOUBLE) * CAST(b.embedding[5] AS DOUBLE) + CAST(b.embedding[6] AS DOUBLE) * CAST(b.embedding[6] AS DOUBLE) + CAST(b.embedding[7] AS DOUBLE) * CAST(b.embedding[7] AS DOUBLE) + CAST(b.embedding[8] AS DOUBLE) * CAST(b.embedding[8] AS DOUBLE) + CAST(b.embedding[9] AS DOUBLE) * CAST(b.embedding[9] AS DOUBLE) + CAST(b.embedding[10] AS DOUBLE) * CAST(b.embedding[10] AS DOUBLE) + CAST(b.embedding[11] AS DOUBLE) * CAST(b.embedding[11] AS DOUBLE) + CAST(b.embedding[12] AS DOUBLE) * CAST(b.embedding[12] AS DOUBLE) + CAST(b.embedding[13] AS DOUBLE) * CAST(b.embedding[13] AS DOUBLE) + CAST(b.embedding[14] AS DOUBLE) * CAST(b.embedding[14] AS DOUBLE) + CAST(b.embedding[15] AS DOUBLE) * CAST(b.embedding[15] AS DOUBLE) + CAST(b.embedding[16] AS DOUBLE) * CAST(b.embedding[16] AS DOUBLE) + CAST(b.embedding[17] AS DOUBLE) * CAST(b.embedding[17] AS DOUBLE) + CAST(b.embedding[18] AS DOUBLE) * CAST(b.embedding[18] AS DOUBLE) + CAST(b.embedding[19] AS DOUBLE) * CAST(b.embedding[19] AS DOUBLE) + CAST(b.embedding[20] AS DOUBLE) * CAST(b.embedding[20] AS DOUBLE) + CAST(b.embedding[21] AS DOUBLE) * CAST(b.embedding[21] AS DOUBLE) + CAST(b.embedding[22] AS DOUBLE) * CAST(b.embedding[22] AS DOUBLE) + CAST(b.embedding[23] AS DOUBLE) * CAST(b.embedding[23] AS DOUBLE) + CAST(b.embedding[24] AS DOUBLE) * CAST(b.embedding[24] AS DOUBLE) + CAST(b.embedding[25] AS DOUBLE) * CAST(b.embedding[25] AS DOUBLE) + CAST(b.embedding[26] AS DOUBLE) * CAST(b.embedding[26] AS DOUBLE) + CAST(b.embedding[27] AS DOUBLE) * CAST(b.embedding[27] AS DOUBLE) + CAST(b.embedding[28] AS DOUBLE) * CAST(b.embedding[28] AS DOUBLE) + CAST(b.embedding[29] AS DOUBLE) * CAST(b.embedding[29] AS DOUBLE) + CAST(b.embedding[30] AS DOUBLE) * CAST(b.embedding[30] AS DOUBLE) + CAST(b.embedding[31] AS DOUBLE) * CAST(b.embedding[31] AS DOUBLE) + CAST(b.embedding[32] AS DOUBLE) * CAST(b.embedding[32] AS DOUBLE) + CAST(b.embedding[33] AS DOUBLE) * CAST(b.embedding[33] AS DOUBLE) + CAST(b.embedding[34] AS DOUBLE) * CAST(b.embedding[34] AS DOUBLE) + CAST(b.embedding[35] AS DOUBLE) * CAST(b.embedding[35] AS DOUBLE) + CAST(b.embedding[36] AS DOUBLE) * CAST(b.embedding[36] AS DOUBLE) + CAST(b.embedding[37] AS DOUBLE) * CAST(b.embedding[37] AS DOUBLE) + CAST(b.embedding[38] AS DOUBLE) * CAST(b.embedding[38] AS DOUBLE) + CAST(b.embedding[39] AS DOUBLE) * CAST(b.embedding[39] AS DOUBLE) + CAST(b.embedding[40] AS DOUBLE) * CAST(b.embedding[40] AS DOUBLE) + CAST(b.embedding[41] AS DOUBLE) * CAST(b.embedding[41] AS DOUBLE) + CAST(b.embedding[42] AS DOUBLE) * CAST(b.embedding[42] AS DOUBLE) + CAST(b.embedding[43] AS DOUBLE) * CAST(b.embedding[43] AS DOUBLE) + CAST(b.embedding[44] AS DOUBLE) * CAST(b.embedding[44] AS DOUBLE) + CAST(b.embedding[45] AS DOUBLE) * CAST(b.embedding[45] AS DOUBLE) + CAST(b.embedding[46] AS DOUBLE) * CAST(b.embedding[46] AS DOUBLE) + CAST(b.embedding[47] AS DOUBLE) * CAST(b.embedding[47] AS DOUBLE) + CAST(b.embedding[48] AS DOUBLE) * CAST(b.embedding[48] AS DOUBLE) + CAST(b.embedding[49] AS DOUBLE) * CAST(b.embedding[49] AS DOUBLE) + CAST(b.embedding[50] AS DOUBLE) * CAST(b.embedding[50] AS DOUBLE) + CAST(b.embedding[51] AS DOUBLE) * CAST(b.embedding[51] AS DOUBLE) + CAST(b.embedding[52] AS DOUBLE) * CAST(b.embedding[52] AS DOUBLE) + CAST(b.embedding[53] AS DOUBLE) * CAST(b.embedding[53] AS DOUBLE) + CAST(b.embedding[54] AS DOUBLE) * CAST(b.embedding[54] AS DOUBLE) + CAST(b.embedding[55] AS DOUBLE) * CAST(b.embedding[55] AS DOUBLE) + CAST(b.embedding[56] AS DOUBLE) * CAST(b.embedding[56] AS DOUBLE) + CAST(b.embedding[57] AS DOUBLE) * CAST(b.embedding[57] AS DOUBLE) + CAST(b.embedding[58] AS DOUBLE) * CAST(b.embedding[58] AS DOUBLE) + CAST(b.embedding[59] AS DOUBLE) * CAST(b.embedding[59] AS DOUBLE) + CAST(b.embedding[60] AS DOUBLE) * CAST(b.embedding[60] AS DOUBLE) + CAST(b.embedding[61] AS DOUBLE) * CAST(b.embedding[61] AS DOUBLE) + CAST(b.embedding[62] AS DOUBLE) * CAST(b.embedding[62] AS DOUBLE) + CAST(b.embedding[63] AS DOUBLE) * CAST(b.embedding[63] AS DOUBLE) + CAST(b.embedding[64] AS DOUBLE) * CAST(b.embedding[64] AS DOUBLE))))) >= 0.35
    ), und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b, id_a FROM edges
    ), reach AS (
        SELECT vec_id AS node, vec_id AS label FROM embeddings
        UNION
        SELECT u.dst AS node, r.label
        FROM reach r JOIN und u ON r.node = u.src
        WHERE r.label < u.dst
    ), comp AS (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    )
    SELECT component,
           COUNT(*) AS n_vecs,
           MIN(node) AS keeper,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM comp GROUP BY component
    """,
    doc="Semantic deduplication (SemDeDup, Abbas et al. 2023, "
    "PAPERS.md): embedding-cosine near-duplicate edges (label-blocked "
    "equi join, precomputed norms — never an n^2 cross join), "
    "transitively closed into semantic clusters by the shared "
    "min-label propagation loop (llm_dedup.min_label_components), one "
    "keeper per cluster, the rest counted as dropped. At 100 TB the "
    "blocking key is the ANN cluster id (IVF cell / LSH bucket) "
    "instead of the curated label — same plan shape. Oracle: "
    "recursive-CTE reachability over the same cosine edges.",
)
def pipeline_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import norm_col, dot_col
    from .llm_dedup import min_label_components

    e = t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label"),
        F.col("embedding").alias("emb_a"),
        norm_col(F.col("embedding")).alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
        norm_col(F.col("embedding")).alias("norm_b"),
    )
    edges = (
        a.join(b, (a.label == b.label_b) & (a.id_a < b.id_b))
        .filter(
            dot_col(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b"))
            >= 0.35
        )
        .select("id_a", "id_b")
    )
    labels = min_label_components(
        edges, e.select("vec_id"), id_col="vec_id"
    )
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("keeper"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
    )


@register(
    "pipeline_vocab_oov_rate",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, source,
               unnest(string_split(text, ' ')) AS token,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS c FROM tok
            GROUP BY token ORDER BY c DESC, token LIMIT 16
        )
    ), per_doc AS (
        SELECT doc_id, lang, source, MAX(n_tok) AS n_tok,
               SUM(CASE WHEN token IN (SELECT token FROM vocab)
                        THEN 1 ELSE 0 END) AS in_vocab
        FROM tok GROUP BY doc_id, lang, source
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(
               CAST(n_tok - in_vocab AS DOUBLE) / n_tok
               AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_oov_rate,
           CAST(SUM(CASE WHEN 2 * (n_tok - in_vocab) > n_tok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_majority_oov
    FROM per_doc GROUP BY lang, source
    """,
    doc="Out-of-vocabulary rate against a corpus-derived vocabulary — "
    "the coverage diagnostic run after tokenizer training (what share "
    "of each source's tokens fall outside the kept vocabulary): "
    "vocabulary = top-16 tokens by (global freq DESC, token), per-doc "
    "OOV rate = (tokens - in-vocab tokens) / tokens (exact integer "
    "division), rolled up per (lang, source) with the DECIMAL-routed "
    "deterministic mean (dsum convention) and a majority-OOV doc "
    "count (exact integer compare 2*oov > total). 100 TB plan: one "
    "token-count shuffle for the vocabulary head "
    "(TakeOrderedAndProject), vocabulary broadcast back, one map-side "
    "explode + per-doc count, one rollup shuffle — the vocabulary is "
    "a compile-time-bounded broadcast, never a corpus-sized join "
    "side.",
)
def pipeline_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split("text", " ")).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(16)
        .select("token")
    )
    # ONE scoring pass (r15, guide §2.4): n_tok == the doc's token-row
    # count (explode emits exactly size(split(text,' ')) rows, empties
    # included), so counting rows and counting vocabulary hits in the
    # SAME per-doc aggregate replaces the r14 shape's third corpus scan
    # (a separate size(split) projection), its semi-join pre-aggregate,
    # and the per-doc left join that stitched the two back together.
    # The vocabulary attaches as a broadcast left join against 16
    # distinct tokens (multiplicity 1 — row count is unchanged).
    per_doc = (
        toks.join(
            F.broadcast(vocab.withColumn("__v", F.lit(1))), "token", "left"
        )
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.coalesce(F.col("__v"), F.lit(0))).alias("in_vocab"),
        )
        .withColumn(
            "oov_rate",
            (F.col("n_tok") - F.col("in_vocab")).cast("double")
            / F.col("n_tok"),
        )
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("oov_rate").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_oov_rate"),
        F.sum(
            F.when(
                2 * (F.col("n_tok") - F.col("in_vocab")) > F.col("n_tok"),
                1,
            ).otherwise(0)
        ).alias("n_majority_oov"),
    )
