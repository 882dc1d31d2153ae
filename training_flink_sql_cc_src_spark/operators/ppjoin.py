"""PPJoin — exact all-pairs set-similarity join with prefix + positional
filtering (the published SSJoin/PPJoin technique: Xiao et al.,
"Efficient Similarity Joins for Near Duplicate Detection", WWW 2008).

Finds every pair with Jaccard(tokens_a, tokens_b) >= t WITHOUT a blocking
key and WITHOUT the quadratic pair space: tokens are ranked by global
document frequency (rare first); any qualifying pair must share a token
within each side's first |x| - ceil(t|x|) + 1 rare-ordered tokens, so
candidate generation is an equi self-join on prefix tokens only. Three
exact prunes run before verification:

- size ratio: J >= t ⇒ den·min(|x|,|y|) >= num·max(|x|,|y|)
- positional: a pair first meeting at prefix ranks (r_a, r_b) overlaps at
  most 1 + min(|x|-r_a, |y|-r_b) tokens; below the required
  alpha = ceil(num(|x|+|y|)/(num+den)) it can never reach t
- mask bound (r16, operators/tokenmask): a per-doc 512-bit token-set
  mask rides the posting rows and the lossless upper bound
  Σ bit_count(ma&mb) + min-collision-correction prunes matched rows
  before the pair-dedup exchange — at a Zipf corpus most prefix
  collisions are one shared rare token with near-zero real overlap, and
  this is the filter that sees it.

Verification computes ONE array_intersect per surviving pair and filters
in exact integer arithmetic, so the result is lossless — the
dedup_jaccard_ppjoin registry query proves it against a full quadratic
DuckDB oracle. At corpus scale rare-token postings bound the join;
frequent tokens never enter candidate generation.

Plan shape (replanned r16): the rare-first rank used to come from a
row_number window over every exploded token — a full shuffle + sort of
~corpus-token rows keyed by doc. The rank IS the position in the doc's
df-sorted token array, so the operator now builds that array with ONE
grouped aggregate (collect_list + array_sort, the token-sketch pattern)
whose output is |docs| rows, computes the mask in the same pass
(codegen bit_or aggregates), persists it, and derives both posting
sides as map-side posexplode slices of the cached arrays. Verification
intersects the SAME sorted arrays (set semantics — order never affects
the intersection size), so the raw input is read exactly twice
(frequency pass + aggregate) and never re-tokenized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenmask import (
    MASK_LONGS,
    mask_bitor_agg_exprs,
    mask_inter_bound,
    mask_popcount,
)


def ppjoin_pairs(
    d: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "words",
    thr_num: int = 3,
    thr_den: int = 5,
) -> DataFrame:
    """All (id_a < id_b) pairs with Jaccard >= thr_num/thr_den.

    ``d``: one row per document with a DISTINCT-token array column.
    Returns (id_a, id_b, jaccard). The df-sorted per-doc frame is
    persisted (it is read by both prefix posting sides and twice at
    verification) and registered for explicit release at the caller's
    query boundary (operators/transient.py; a bare persist pins it in
    the session CacheManager forever, and a lazy localCheckpoint in its
    place measured 5x the CPU — the planner loses the shared relation).
    """
    from .transient import register_transient

    raw = d.select(
        F.col(id_col).alias("__id"), F.col(tokens_col).alias("__toks")
    )
    freq = (
        raw.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    ds = register_transient(
        raw.select("__id", F.explode("__toks").alias("tok"))
        .join(freq, "tok")
        .groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("__toks"),
            F.count(F.lit(1)).alias("__n"),
            *mask_bitor_agg_exprs("tok"),
        )
        .withColumn("cc", F.col("__n") - mask_popcount())
        .persist()
    )
    plen = F.greatest(
        F.col("__n")
        - F.floor((F.col("__n") * thr_num + thr_den - 1) / thr_den).cast(
            "int"
        )
        + 1,
        F.lit(1),
    )
    pa = ds.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("n_a"),
        F.col("cc").alias("cc_a"),
        *[F.col(f"m{i}").alias(f"ma{i}") for i in range(MASK_LONGS)],
        F.posexplode(F.slice("__toks", F.lit(1), plen)).alias("r0", "tok"),
    ).withColumn("r_a", F.col("r0") + 1)
    pb = ds.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("n_b"),
        F.col("cc").alias("cc_b"),
        *[F.col(f"m{i}").alias(f"mb{i}") for i in range(MASK_LONGS)],
        F.posexplode(F.slice("__toks", F.lit(1), plen)).alias(
            "rb0", "tokb"
        ),
    ).withColumn("r_b", F.col("rb0") + 1)
    alpha = F.floor(
        ((F.col("n_a") + F.col("n_b")) * thr_num + (thr_num + thr_den) - 1)
        / (thr_num + thr_den)
    )
    # merge hint: the persisted frame's stats would let Catalyst
    # broadcast one posting side, but the broadcast frame explodes
    # AFTER the broadcast, so every task would rebuild the posting hash
    # table (the measured 5x pathology the containment branch pins
    # against; SCALE.md §6). Pin SMJ.
    cand = (
        pa.hint("merge").join(
            pb.hint("merge"), F.col("tok") == F.col("tokb")
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("n_a", "n_b") * thr_den
                >= F.greatest("n_a", "n_b") * thr_num
            )
            & (
                1
                + F.least(
                    F.col("n_a") - F.col("r_a"), F.col("n_b") - F.col("r_b")
                )
                >= alpha
            )
            & (mask_inter_bound() >= alpha)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    av = ds.select(
        F.col("__id").alias("id_a"),
        F.col("__toks").alias("toks_a"),
        F.col("__n").alias("n_a"),
    )
    bv = ds.select(
        F.col("__id").alias("id_b"),
        F.col("__toks").alias("toks_b"),
        F.col("__n").alias("n_b"),
    )
    verified = cand.join(av, "id_a").join(bv, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    out = (
        verified.filter(
            inter * (thr_num + thr_den)
            >= (F.col("n_a") + F.col("n_b")) * thr_num
        )
        .withColumn("jaccard", jac)
        .select("id_a", "id_b", "jaccard")
        # materialize BEFORE unpersisting the tokenized input: the result
        # is a bounded above-threshold pair set, and eager checkpoint lets
        # us release the persisted blocks immediately instead of leaking
        # them into executor storage for the life of the session (the
        # registry driver runs 100+ queries in one SparkSession).
        .localCheckpoint(eager=True)
    )
    ds.unpersist()
    return out
