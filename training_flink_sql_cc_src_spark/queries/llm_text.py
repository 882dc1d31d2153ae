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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import DAVG_SQL, DSUM_SQL, davg, dsum, t

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
_STOP_SQL = "', '".join(STOPWORDS)


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
