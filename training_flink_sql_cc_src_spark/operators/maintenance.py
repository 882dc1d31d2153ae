"""Table-maintenance operators: compaction + clustering (SCALE.md §1).

A streaming ingest (the reference's Kafka-connector world) lands many
small files; a 100 TB table touched by micro-batch writers degrades into
millions of them, and scan cost becomes task-scheduling cost. The two
standard maintenance moves, expressed Spark-native:

- **Compaction** (`compact_table`): rewrite a fragmented parquet table
  into ~target-size files. Pure repartition + write — the OPTIMIZE of
  Delta/Iceberg without the table format.
- **Z-ordering** (`compact_table(zorder_by=...)`): Morton-interleave the
  bucket bits of 2+ columns so per-file min-max ranges narrow on EVERY
  participating dimension at once — multi-column data skipping, the
  OPTIMIZE ZORDER of Delta/Iceberg.
- **Clustering** (`compact_table(cluster_by=...)`): range-partition by a
  clustering key and sort within files, so per-file/row-group min-max
  stats become DISJOINT ranges and any engine's predicate pushdown
  (Spark row-group skipping, DuckDB zone maps) prunes whole files for
  selective range filters — the data-skipping layout that turns a
  100 TB time-range query into a read of the few files covering it.

`file_range_stats` exposes the per-file min/max a maintenance job uses
to verify layout quality (and that tests assert on).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    # single-file input (compact_table accepts "parquet dir or file"):
    # os.walk would yield nothing and size it to 0 → always 1 output file
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def zorder_value(
    df: DataFrame, columns: list[str], bits: int = 12
) -> Column:
    """Z-order (Morton) value over 2+ numeric columns, JVM-only: each
    column is quantized to ``bits`` uniform buckets between its min and
    max (ONE tiny aggregate collect for the bounds), then the bucket
    bits are interleaved — files sorted by this value are clustered in
    EVERY participating dimension at once, the multi-column data-
    skipping layout of Delta/Iceberg OPTIMIZE ZORDER. Uniform buckets
    assume roughly uniform columns; for heavy skew, pre-bucket with
    approxQuantile cutoffs and interleave the bucket ids the same way
    (the interleave below is bucket-source-agnostic)."""
    if len(columns) < 2:
        raise ValueError("zorder needs >= 2 columns (use cluster_by for 1)")
    if len(columns) * bits > 62:
        raise ValueError(f"{len(columns)} cols x {bits} bits overflows long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in columns],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in columns],
    ).collect()[0]
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for ci, c in enumerate(columns):
        lo = float(bounds[f"lo_{c}"])
        hi = float(bounds[f"hi_{c}"])
        span = (hi - lo) or 1.0
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                    * F.lit(n_buckets)).cast("long"),
        )
        for b in range(bits):
            # bit b of this column's bucket -> interleaved position
            pos = b * len(columns) + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)), pos
                )
            )
    return z


def compact_table(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    target_file_mb: int = 128,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Rewrite ``input_path`` (parquet dir or file) into ``output_path``
    with ~``target_file_mb`` files, optionally range-clustered + sorted
    on ``cluster_by``, or multi-dimensionally clustered on ``zorder_by``
    (Morton-interleaved buckets — narrows per-file ranges on EVERY
    z-ordered column simultaneously). Returns the number of output
    files.

    Sizing uses the INPUT's on-disk bytes (already-compressed parquet →
    a faithful estimate of output size). Range partitioning samples the
    key distribution, so skew in the clustering key yields balanced
    files anyway — the property that matters at 100 TB, where a naive
    hash-on-day layout would put 10% of the table in one file.
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    df = spark.read.parquet(input_path)
    n_files = max(1, math.ceil(_dir_bytes(input_path) / (target_file_mb << 20)))
    if zorder_by:
        out = (
            df.withColumn("__z", zorder_value(df, zorder_by))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif cluster_by:
        out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(output_path)
    written = [
        f
        for f in os.listdir(output_path)
        if f.endswith(".parquet") or f.startswith("part-")
    ]
    return len([f for f in written if not f.endswith(".crc")])


def file_range_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) of ``column`` from parquet footer
    metadata — no data read. This is what a maintenance job (or a
    metadata-pruning scan planner) inspects to measure clustering
    quality: disjoint ranges = perfect skipping."""
    import pyarrow.parquet as pq

    out = []
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((os.path.basename(f), min(mins), max(maxs)))
    return out


def overlap_fraction(ranges: list[tuple[str, object, object]]) -> float:
    """Fraction of file pairs whose [min, max] ranges overlap — 0.0 for a
    perfectly clustered layout, ~1.0 for random placement. The quality
    metric a maintenance scheduler thresholds on.

    Exact in O(n log n) via a sweep in min-order (NOT the naive O(n²)
    pair loop): processing intervals by ascending lo, every previously
    seen interval j already satisfies lo_j <= lo_i <= hi_i, so the pair
    overlaps iff hi_j >= lo_i — a bisect over the sorted his of processed
    intervals. Usable as-is at real file counts (millions of footers)."""
    from bisect import bisect_left, insort

    n = len(ranges)
    if n < 2:
        return 0.0
    intervals = sorted((lo, hi) for _, lo, hi in ranges)
    his: list = []
    overlaps = 0
    for lo, hi in intervals:
        overlaps += len(his) - bisect_left(his, lo)
        insort(his, hi)
    return overlaps / (n * (n - 1) / 2)
