"""Skew-handling operators (the 100 TB design checklist: 'skewed keys →
salting or AQE skew-join').

AQE's skew-join split (on in session.get_spark) handles most cases at
runtime by splitting oversized shuffle partitions. These helpers cover the
cases AQE cannot fix:

- ``salted_join``: a hot fact key whose rows exceed one executor's memory
  joined to a non-broadcastable dim — replicate the dim per salt, spread
  the fact side deterministically.
- ``salted_aggregate``: COUNT(DISTINCT)-like state concentration — partial
  aggregate on (key, salt), final on key.

Both are pure DataFrame compositions; Catalyst still plans each phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with salt: fact rows get a deterministic salt from a hash
    of the whole row; dim rows replicate across all salts. The shuffle key
    becomes (key, salt), splitting a hot key across ``salt_buckets``
    partitions. Dim-side cost: ×salt_buckets rows — use only when dim is
    too big to broadcast but small enough to replicate.

    ``how`` is restricted to joins that preserve each fact row exactly
    once (inner/left/left_semi/left_anti): the dim side is replicated
    across all salt buckets, so right/full outer would emit every
    unmatched dim row ``salt_buckets`` times.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            "salted_join replicates the dim per salt; right/full outer "
            f"would duplicate unmatched dim rows (got how={how!r})"
        )
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)),
    )
    dim_salted = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = fact_salted.join(dim_salted, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase distinct count under key skew: phase 1 dedups (keys,
    value) on (keys, salt-of-value) partitions, phase 2 merges per-salt
    partial counts. The hot key's distinct-state is spread over
    ``salt_buckets`` tasks instead of one.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial = (
        salted.groupBy(*keys, "__salt")
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").alias(f"n_distinct_{value_col}")
    )
