"""PPJoin — exact all-pairs set-similarity join with prefix + positional
filtering (the published SSJoin/PPJoin technique: Xiao et al.,
"Efficient Similarity Joins for Near Duplicate Detection", WWW 2008).

Finds every pair with Jaccard(tokens_a, tokens_b) >= t WITHOUT a blocking
key and WITHOUT the quadratic pair space: tokens are ranked by global
document frequency (rare first); any qualifying pair must share a token
within each side's first |x| - ceil(t|x|) + 1 rare-ordered tokens, so
candidate generation is an equi self-join on prefix tokens only. Two
exact integer prunes run before verification:

- size ratio: J >= t ⇒ den·min(|x|,|y|) >= num·max(|x|,|y|)
- positional: a pair first meeting at prefix ranks (r_a, r_b) overlaps at
  most 1 + min(|x|-r_a, |y|-r_b) tokens; below the required
  alpha = ceil(num(|x|+|y|)/(num+den)) it can never reach t

Verification computes ONE array_intersect per surviving pair and filters
in exact integer arithmetic, so the result is lossless — the
dedup_jaccard_ppjoin registry query proves it against a full quadratic
DuckDB oracle. At corpus scale rare-token postings bound the join;
frequent tokens never enter candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ppjoin_pairs(
    d: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "words",
    thr_num: int = 3,
    thr_den: int = 5,
) -> DataFrame:
    """All (id_a < id_b) pairs with Jaccard >= thr_num/thr_den.

    ``d``: one row per document with a DISTINCT-token array column.
    Returns (id_a, id_b, jaccard). The input is persisted (it is read by
    the frequency pass, the prefix pass, and twice at verification).
    """
    # persist() + transient registry (r15): the persisted frame is what
    # the four consumers (frequency pass, prefix pass, two verification
    # reads) share — but a bare persist pins it in the session
    # CacheManager forever, so the handle registers for explicit
    # release at the caller's query boundary (operators/transient.py;
    # bench.py's hygiene calls it). A lazy localCheckpoint in its place
    # measured 5x the CPU (the planner loses the shared relation).
    from .transient import register_transient

    d = register_transient(
        d.select(F.col(id_col).alias("__id"), F.col(tokens_col).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .persist()
    )
    freq = (
        d.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tok = d.select("__id", "__n", F.explode("__toks").alias("tok")).join(
        freq, "tok"
    )
    w = Window.partitionBy("__id").orderBy("df", "tok")
    ceil_tn = F.floor(
        (F.col("__n") * thr_num + thr_den - 1) / thr_den
    ).cast("int")
    prefix = tok.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= F.col("__n") - ceil_tn + 1
    )
    pa = prefix.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("n_a"),
        F.col("r").alias("r_a"),
        "tok",
    )
    pb = prefix.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("n_b"),
        F.col("r").alias("r_b"),
        "tok",
    )
    alpha = F.floor(
        ((F.col("n_a") + F.col("n_b")) * thr_num + (thr_num + thr_den) - 1)
        / (thr_num + thr_den)
    )
    cand = (
        pa.join(pb, "tok")
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
        )
        .select("id_a", "id_b")
        .distinct()
    )
    av = d.select(
        F.col("__id").alias("id_a"),
        F.col("__toks").alias("toks_a"),
        F.col("__n").alias("n_a"),
    )
    bv = d.select(
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
    d.unpersist()
    return out
