"""Deduplication operators (SURVEY.md §2.6 dedup row, §2.9 [C]).

Covers the reference's latest-per-key keyed-table trick (Flink
``ROW_NUMBER()=1`` dedup over a compacted topic — PK tables at
terraform/lab-aggregations/main.tf:396,463; cleanup.policy=compact at
terraform/lab-joins/main.tf:105-107) plus the [C] LLM-pipeline near-dup
family: MinHash signatures, SimHash, n-gram Jaccard.

Scale notes: every operator here is a single hash-shuffle on the dedup key
(or LSH band key) — no cross joins, no driver-side collection. MinHash
signatures are computed with built-in ``xxhash64`` inside whole-stage
codegen; no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order_col: str | list[str], desc: bool = True
) -> DataFrame:
    """Materialize the upsert view of a keyed changelog: latest row per PK.

    Flink reads a PK'd/compacted table as "latest record per key wins"
    (SURVEY.md §1.1). Batch analog: row_number over (partition by pk order
    by version desc) = 1. One shuffle on the PK; the output is already
    hash-partitioned by the key, which downstream keyed joins reuse.
    ``order_col`` may be a list for composite ordering (e.g. (batch seq,
    event time) so in-batch ties resolve by event time).
    """
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ocs = [F.col(c).desc() if desc else F.col(c).asc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*ocs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Flink's FIRST-row dedup pattern (ROW_NUMBER()=1 ORDER BY rowtime ASC)."""
    return latest_per_key(df, keys, order_col, desc=False)


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup — hash shuffle on the (hashed) dedup columns."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def char_shingles(df: DataFrame, text_col: str, k: int = 5, out: str = "shingles") -> DataFrame:
    """Distinct character k-shingles via built-in sequence/transform/substr."""
    txt = F.col(text_col)
    n = F.greatest(F.length(txt) - F.lit(k - 1), F.lit(1))
    return df.withColumn(
        out,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(txt, i, F.lit(k)))
        ),
    )


def word_shingles(
    df: DataFrame, text_col: str, k: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct word k-shingles (k consecutive tokens joined by space) —
    ~10× fewer shingles per document than char-5 shingles at equal dedup
    power for word-level corpora; the standard choice for document-scale
    MinHash."""
    toks = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    return df.withColumn(
        out,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ),
    )


def minhash_signature(
    df: DataFrame, shingle_col: str, num_hashes: int = 32, out: str = "minhash"
) -> DataFrame:
    """MinHash signature: hash each shingle ONCE to a 64-bit base value,
    then derive the i-th hash family by re-hashing the fixed-width long
    with seed i — 1 string hash + k long hashes per shingle instead of
    k string hashes (the standard cheap-rehash MinHash construction).

    Built-in ``xxhash64`` + ``array_min`` + ``transform`` — whole-stage
    codegen, zero Python in the loop. At 100 TB this is a pure map stage.
    """
    base = F.transform(F.col(shingle_col), lambda s: F.xxhash64(s))
    df = df.withColumn("__base_hash", base)
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("__base_hash"), lambda h: F.xxhash64(h, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )
    return df.withColumn(out, sig).drop("__base_hash")


def lsh_band_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 8,
    rows_per_band: int = 4,
    cache_sig: bool = True,
) -> DataFrame:
    """LSH banding: split the signature into bands, hash each band to a
    bucket, self-join on (band, bucket) to get candidate pairs.

    The self-join is an equi join on the band bucket — a hash shuffle,
    never a cross join, so it scales with the number of colliding docs,
    not n². ``cache_sig`` persists the signature before the self-join:
    without it both join branches recompute the full MinHash lineage
    (measured 2-3× the whole pipeline cost). At cluster scale signatures
    are tiny relative to the corpus (k longs per doc), so MEMORY_AND_DISK
    persistence of the sketch — not the text — is the right trade.
    """
    if cache_sig:
        # persist() + transient registry (r15): a bare persist pins the
        # plan in the session CacheManager forever (the signature cache
        # outlived every later query of the 50-query suite — measured
        # via the block-manager probe), so the handle is registered for
        # explicit release at the caller's query boundary
        # (operators/transient.py; bench.py's hygiene calls it). The
        # cache itself stays: the planner-recognized InMemoryRelation is
        # what lets both self-join branches share one signature
        # computation — a lazy localCheckpoint in its place measured
        # 25x the CPU.
        from .transient import register_transient

        df = register_transient(df.select(id_col, sig_col).persist())
    banded = df.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, sig_col, "bb.band", "bb.bucket")
    left = banded.alias("a")
    right = banded.alias("b")
    # Signature agreement is counted PER CANDIDATE ROW, before the
    # pair-dedup (guide §2.3 — shuffle keys and metadata, not payloads):
    # n_agree is a pure function of (id_a, id_b), so every banded
    # duplicate of a pair carries the identical value and dropDuplicates
    # keeps the same result whichever row survives — but the dedup
    # exchange now moves ~24 bytes/row instead of the two full
    # signatures (2 x num_hashes longs, ~20x for the default 32). The
    # recompute trade is num_hashes long compares per extra candidate
    # row — noise next to the shuffle write+fetch it replaces.
    n_agree = F.size(
        F.filter(
            F.zip_with(
                F.col(f"a.{sig_col}"),
                F.col(f"b.{sig_col}"),
                lambda x, y: x == y,
            ),
            lambda v: v,
        )
    )
    pairs = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            n_agree.alias("n_agree"),
            F.size(F.col(f"a.{sig_col}")).alias("n_sig"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def minhash_jaccard_estimate(pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard from the signature agreement fraction counted
    inside ``lsh_band_pairs`` (n_agree of n_sig hashes) — same integer
    division the sig-array formulation computed, evaluated before the
    pair-dedup so the signatures never ride the dedup shuffle."""
    return pairs.withColumn(
        "jaccard_est",
        F.col("n_agree").cast("double") / F.col("n_sig").cast("double"),
    )


def simhash64(df: DataFrame, token_col: str, out: str = "simhash") -> DataFrame:
    """64-bit SimHash over a token array, built-ins only.

    For each bit b: sum over tokens of ±1 by bit b of xxhash64(token);
    bit set if the sum > 0. Expressed as 64 aggregate expressions over the
    token array (JVM-side). Near-dup = small Hamming distance.
    """
    tok = F.col(token_col)

    def bit_votes(b: int) -> Column:
        return F.aggregate(
            tok,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(
                F.shiftright(F.xxhash64(x), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    expr = F.lit(0).cast("long")
    for b in range(64):
        expr = expr + F.when(
            bit_votes(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(0)
    return df.withColumn(out, expr)


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (built-in)."""
    return F.bit_count(a.bitwiseXOR(b))
