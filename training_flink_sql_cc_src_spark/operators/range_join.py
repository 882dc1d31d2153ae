"""Range-bucketed join — the scale path for PURE time-range joins.

Flink's interval join (SURVEY.md §2.3; enabled by the S9/S10 watermark
DDL, terraform/lab-joins/main.tf:531,564) usually rides an equi key and
stays a hash join. But a range predicate with NO equi component ("all
events within 10 minutes of each other, across all keys") plans as a
broadcast-nested-loop or cartesian product — O(|L|·|R|) compares, a
non-starter at 100 TB.

This operator turns the range predicate into an equi join on a derived
bucket key: choose bucket width = (upper - lower), assign each right row
to the single bucket containing its timestamp, and explode each left row
to the (at most TWO) buckets its window [ts+lower, ts+upper] intersects.
Any qualifying pair must then share a bucket, so an equi join on the
bucket id produces a candidate superset — refined by the exact range
predicate. Each (l, r) pair appears at most once because the right row's
bucket is unique.

Cost: |L| ≤ 2× exploded, one hash shuffle on the bucket id, candidates =
pairs within ~2 bucket widths instead of all pairs. Bucket ids are
monotone in time, so at cluster scale the shuffle also range-clusters —
friendly to AQE skew splitting if event rates spike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows where right.ts is within [left.ts + lower_s, left.ts +
    upper_s] (seconds), without an equi key and without a nested loop.

    Works in microseconds internally so sub-second timestamps bucket
    exactly; the final refine uses the original timestamp columns.
    """
    if how != "inner":
        # The refine predicate is applied as a post-join filter; outer
        # joins would null-extend unmatched rows that then FAIL the refine
        # and vanish (silently degrading to inner), and unmatched left
        # rows are duplicated across their exploded buckets. Outer range
        # semantics need refine-in-condition + bucket dedup — not offered.
        raise ValueError("range_bucket_join supports how='inner' only")
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width_us = (upper_s - lower_s) * 1_000_000
    lo_us = lower_s * 1_000_000
    hi_us = upper_s * 1_000_000

    r = right.withColumn(
        "__rbucket", F.floor(F.unix_micros(F.col(right_ts)) / width_us)
    )
    l_lo = F.floor((F.unix_micros(F.col(left_ts)) + lo_us) / width_us)
    l_hi = F.floor((F.unix_micros(F.col(left_ts)) + hi_us) / width_us)
    l = left.withColumn("__rbucket", F.explode(F.sequence(l_lo, l_hi)))

    refine: Column = (
        F.unix_micros(F.col(right_ts))
        >= F.unix_micros(F.col(left_ts)) + lo_us
    ) & (F.unix_micros(F.col(right_ts)) <= F.unix_micros(F.col(left_ts)) + hi_us)
    return l.join(r, on="__rbucket", how=how).filter(refine).drop("__rbucket")
