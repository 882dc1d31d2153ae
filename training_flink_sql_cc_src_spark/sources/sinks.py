"""Sinks (SURVEY.md §2.2): partitioned/bucketed parquet writes — the batch
analog of the reference's partitioned topics (partitions_count = 3,
terraform/lab-aggregations/main.tf:104) and ``DISTRIBUTED INTO n BUCKETS``
sink tables (S1/S3/S5), plus the compacted-topic (latest-per-key) write.

At 100 TB these choices are where write-side performance lives:
partitionBy prunes downstream scans to touched partitions; bucketBy
pre-shuffles on the join key once at write time so every later join/agg on
that key is shuffle-free; the compacted write materializes the upsert view
so readers skip the window scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import latest_per_key


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: downstream filters on the partition
    columns become directory pruning (PartitionFilters in the scan)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata needs a
    catalog table): joins/aggs on the bucket columns read co-located
    buckets with no shuffle. The DISTRIBUTED INTO n BUCKETS analog."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def write_compacted(
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    mode: str = "overwrite",
) -> None:
    """Compacted (latest-per-key) write — the cleanup.policy=compact analog
    (terraform/lab-joins/main.tf:105-107): materialize the upsert view so
    readers get one row per key without re-running the window."""
    latest_per_key(df, keys=keys, order_col=order_col).write.mode(mode).parquet(path)
