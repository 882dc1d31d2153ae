"""Mergeable quantile sketches — the percentile analog of the HLL
pattern (SURVEY.md §2.4 mergeable sketches): build small per-segment
summaries in ONE pass, store them, merge any subset later without
touching the raw data. At 100 TB you sketch per (day, source) once and
answer "p95 over any date range" from kilobytes.

Sketch = K evenly-spaced quantile points per segment (a uniform
"centroid" summary, t-digest's simplest cousin) + the segment row count.
Merging treats each point as count/K rows at that value and takes the
weighted quantile — rank error is bounded by sum(count_i/K)/total = 1/K
of the mass, independent of data size or skew of segment sizes.

Everything is built-in expressions: percentile_approx(probabilities=
array) builds a whole summary in one aggregate; the merge is
explode → window cumulative weight → first point at-or-past the target
rank. No Python, no UDAF, one shuffle per phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_sketch(
    df: DataFrame,
    segment_cols: list[str],
    value_col: str,
    k: int = 32,
    accuracy: int = 10_000,
) -> DataFrame:
    """One summary row per segment: ``points`` = K evenly-spaced
    quantiles of ``value_col`` (array<double>), ``cnt`` = segment rows.
    One aggregate pass; the summary is what you persist."""
    probs = F.array(*[F.lit(i / (k - 1)) for i in range(k)])
    return df.groupBy(*segment_cols).agg(
        F.percentile_approx(F.col(value_col), probs, F.lit(accuracy)).alias(
            "points"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    q: float,
) -> DataFrame:
    """Quantile ``q`` per group from PRE-BUILT sketches (each input row
    is one segment summary; groups may span any subset of segments).
    Each sketch point carries weight cnt/K; the answer is the first
    point whose cumulative weight reaches q of the group total."""
    exploded = sketches.select(
        *group_cols,
        (F.col("cnt").cast("double") / F.size("points")).alias("w"),
        F.explode("points").alias("v"),
    )
    w_order = (
        Window.partitionBy(*group_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = exploded.withColumn(
        "cum_w", F.sum("w").over(w_order)
    ).withColumn("total_w", F.sum("w").over(w_all))
    hits = ranked.filter(
        F.col("cum_w") >= F.lit(q) * F.col("total_w")
    )
    return hits.groupBy(*group_cols).agg(
        F.min("v").alias(f"q{int(q * 100)}")
    )
