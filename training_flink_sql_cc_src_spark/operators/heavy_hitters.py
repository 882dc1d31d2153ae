"""Mergeable heavy-hitters sketches — the frequent-items analog of the
HLL / quantile-sketch pattern (SURVEY.md §2.4 mergeable sketches): build
a small per-segment top-K count summary in one pass, store it, merge any
subset of segments later without touching the raw data. At 100 TB you
sketch the token/URL/domain frequency per (day, source) once and answer
"top items over any date range" from kilobytes.

Sketch = the segment's K highest-count items with their EXACT in-segment
counts (a truncated frequency table — the Misra-Gries / SpaceSaving
guarantee specialized to stored summaries). Merging sums per-item counts
across segments. Error bound: an item absent from one segment's sketch
can hide at most that segment's K-th count, so a merged count
underestimates by at most Σ_i kth_count_i — returned alongside the
estimate as ``max_missed`` so callers can threshold on guaranteed counts
(est + max_missed bounds the true count from above; items whose estimate
exceeds every other item's upper bound are EXACT top items).

Everything is built-in expressions: rank-window truncation per segment,
explode + re-aggregate for the merge. One shuffle per phase, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def heavy_hitter_sketch(
    df: DataFrame,
    segment_cols: list[str],
    item_col: str,
    k: int = 32,
) -> DataFrame:
    """One summary row per segment: ``items`` = array of struct(item,
    cnt) for the K most frequent items (count desc, item asc tie-break),
    ``kth_cnt`` = the bound on what truncation can hide — the K-th
    (smallest kept) count when the segment was truncated, 0 when it had
    fewer than K distinct items (nothing was dropped, so nothing can be
    hidden and merged counts over such segments are EXACT) — and
    ``kept_rows`` = the sum of kept counts (= segment row count whenever
    kth_cnt = 0). Two aggregations, both keyed by segment (+item) —
    partial map-side combine applies to each."""
    counts = df.groupBy(*segment_cols, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(*segment_cols).orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    kept = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return kept.groupBy(*segment_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("item", "cnt"))
        ).alias("items"),
        F.when(F.count(F.lit(1)) < k, F.lit(0))
        .otherwise(F.min("cnt"))
        .cast("long")
        .alias("kth_cnt"),
        F.sum("cnt").alias("kept_rows"),
    )


def merge_heavy_hitter_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Top items per group from PRE-BUILT sketches. Returns one row per
    (group, item) for the ``top`` highest summed counts: ``est`` (sum of
    stored counts — a lower bound on the true count) and ``max_missed``
    (sum of kth_cnt over the group's segments minus the segments that DID
    report the item... conservatively: over segments not reporting it),
    so ``est <= true <= est + max_missed``."""
    seg_bounds = sketches.groupBy(*group_cols).agg(
        F.sum("kth_cnt").alias("sum_kth")
    )
    exploded = sketches.select(
        *group_cols,
        F.col("kth_cnt"),
        F.explode("items").alias("it"),
    ).select(
        *group_cols,
        F.col("it.item").alias("item"),
        F.col("it.cnt").alias("cnt"),
        "kth_cnt",
    )
    merged = exploded.groupBy(*group_cols, "item").agg(
        F.sum("cnt").alias("est"),
        # bound contributed by segments that DID report the item — they
        # cannot also hide it, so subtract their kth from the group total
        F.sum("kth_cnt").alias("reported_kth"),
    )
    if group_cols:
        joined = merged.join(seg_bounds, group_cols)
    else:  # global merge: seg_bounds is one row — broadcast cross join
        joined = merged.join(F.broadcast(seg_bounds))
    out = joined.select(
        *group_cols,
        "item",
        "est",
        (F.col("sum_kth") - F.col("reported_kth")).alias("max_missed"),
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("est").desc(), F.col("item").asc()
    )
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top)
        .drop("rnk")
    )
