"""Compaction + clustering maintenance (operators/maintenance.py): the
small-files rewrite must preserve rows exactly, hit the file-count
target, and clustering must produce (near-)disjoint per-file ranges the
scan planner can skip on."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from training_flink_sql_cc_src_spark.operators.maintenance import (
    compact_table,
    file_range_stats,
    overlap_fraction,
)
from training_flink_sql_cc_src_spark.queries._util import t


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """The events fixture written as 64 randomly-placed small files —
    the layout a micro-batch ingest degrades into."""
    sf_small = "/root/testdata/sf0.001"
    path = str(tmp_path_factory.mktemp("frag") / "events_frag")
    ev = t(spark, sf_small, "events")
    # shuffle rows so every small file spans the full ts range
    ev.repartition(64, "event_id").write.mode("overwrite").parquet(path)
    return path, ev


def test_compact_preserves_rows_and_reduces_files(spark, fragmented):
    frag_path, ev = fragmented
    out = os.path.join(tempfile.mkdtemp(), "events_compact")
    n = compact_table(spark, frag_path, out, target_file_mb=1)
    assert n < 64
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert sorted(got.columns) == sorted(
        spark.read.parquet(frag_path).columns
    )
    a = {tuple(r) for r in got.select("event_id", "user_id").collect()}
    b = {tuple(r) for r in ev.select("event_id", "user_id").collect()}
    assert a == b


def test_clustering_makes_ranges_disjoint(spark, fragmented):
    frag_path, _ev = fragmented
    # fragmented layout: every file spans ~the whole ts range
    frag_ranges = file_range_stats(frag_path, "ts")
    assert overlap_fraction(frag_ranges) > 0.9

    out = os.path.join(tempfile.mkdtemp(), "events_clustered")
    # tiny target so several files exist and disjointness is non-trivial
    df = spark.read.parquet(frag_path)
    df.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(out)
    ranges = file_range_stats(out, "ts")
    assert len(ranges) >= 4
    # range clustering: overlap only possibly at file boundaries
    assert overlap_fraction(ranges) <= 0.1


def test_overlap_fraction_sweep_matches_naive_and_scales():
    """The O(n log n) sweep must agree exactly with the definitional
    O(n²) pair loop, and stay fast at file counts where the naive loop
    would be unusable (>2k synthetic ranges)."""
    import random
    import time

    rng = random.Random(7)

    def naive(ranges):
        n = len(ranges)
        if n < 2:
            return 0.0
        ov = 0
        for i in range(n):
            for j in range(i + 1, n):
                _, lo_i, hi_i = ranges[i]
                _, lo_j, hi_j = ranges[j]
                if lo_i <= hi_j and lo_j <= hi_i:
                    ov += 1
        return ov / (n * (n - 1) / 2)

    # random, disjoint, identical, and touching-boundary layouts
    for mk in (
        lambda i: (rng.uniform(0, 100), rng.uniform(0, 30)),
        lambda i: (i * 10.0, 5.0),
        lambda i: (0.0, 1.0),
        lambda i: (float(i), 1.0),  # hi_i == lo_{i+1}: inclusive overlap
    ):
        ranges = []
        for i in range(300):
            lo, width = mk(i)
            ranges.append((f"f{i}", lo, lo + width))
        assert overlap_fraction(ranges) == pytest.approx(naive(ranges))

    big = []
    for i in range(5000):
        lo = rng.uniform(0, 1000)
        big.append((f"f{i}", lo, lo + rng.uniform(0, 50)))
    start = time.monotonic()
    frac = overlap_fraction(big)
    assert time.monotonic() - start < 1.0
    assert 0.0 < frac < 1.0
    assert overlap_fraction([]) == 0.0
    assert overlap_fraction([("f", 0, 1)]) == 0.0


def test_compact_single_file_input(spark):
    """compact_table accepts a plain .parquet FILE: sizing must use the
    file's bytes (not 0), so a small target still yields multiple output
    files."""
    single = "/root/testdata/sf0.01/events.parquet"
    sz_mb = os.path.getsize(single) / (1 << 20)
    assert sz_mb > 0.1  # precondition: big enough to split at 0.1 MB
    out = os.path.join(tempfile.mkdtemp(), "events_from_file")
    # target well under the input size → more than one output file
    n = compact_table(spark, single, out, target_file_mb=1)
    import math

    assert n == max(1, math.ceil(sz_mb / 1))
    assert spark.read.parquet(out).count() == spark.read.parquet(single).count()


def test_clustered_filter_prunes_row_groups(spark, fragmented):
    """A selective ts-range filter over the clustered layout must return
    identical rows to the fragmented layout (pruning is a pure
    optimization), and the filter must be pushed to the scan."""
    frag_path, _ev = fragmented
    out = os.path.join(tempfile.mkdtemp(), "events_clustered2")
    compact_table(spark, frag_path, out, target_file_mb=1, cluster_by=["ts"])
    lo = "2024-01-01 01:00:00"
    hi = "2024-12-31 23:00:00"
    frag = spark.read.parquet(frag_path).filter(F.col("ts") < hi).filter(
        F.col("ts") > lo
    )
    clus = spark.read.parquet(out).filter(F.col("ts") < hi).filter(
        F.col("ts") > lo
    )
    assert {r.event_id for r in clus.collect()} == {
        r.event_id for r in frag.collect()
    }
    plan = clus._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts)" in plan or "GreaterThan(ts" in plan


def test_zorder_narrows_ranges_on_both_columns(spark, fragmented):
    """Z-order clustering (Morton-interleaved buckets): per-file spans
    shrink on BOTH z-ordered columns simultaneously — the multi-column
    data-skipping property a single-column range clustering cannot give
    (clustering on user_id alone leaves event_id ranges full-width)."""
    from training_flink_sql_cc_src_spark.operators.maintenance import (
        zorder_value,
    )

    frag_path, _ev = fragmented
    out = os.path.join(tempfile.mkdtemp(), "events_zorder")
    df = spark.read.parquet(frag_path)
    # 8 files so per-dimension narrowing is non-trivial (the tiny fixture
    # compacts to one file under a byte target — same setup as the range-
    # clustering test above)
    (
        df.withColumn("__z", zorder_value(df, ["user_id", "event_id"]))
        .repartitionByRange(8, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out)
    )

    def mean_span_frac(path, col):
        ranges = file_range_stats(path, col)
        lo = min(r[1] for r in ranges)
        hi = max(r[2] for r in ranges)
        span = (hi - lo) or 1
        return sum((r[2] - r[1]) / span for r in ranges) / len(ranges)

    # fragmented baseline: every file spans ~the full range of both cols
    base_user = mean_span_frac(frag_path, "user_id")
    base_eid = mean_span_frac(frag_path, "event_id")
    assert base_user > 0.8 and base_eid > 0.8
    # z-ordered: both dimensions narrowed at once
    z_user = mean_span_frac(out, "user_id")
    z_eid = mean_span_frac(out, "event_id")
    assert z_user < 0.65 * base_user, z_user
    assert z_eid < 0.65 * base_eid, z_eid
    # rows preserved end-to-end through the compact_table entry point too
    out2 = os.path.join(tempfile.mkdtemp(), "events_zorder_ct")
    compact_table(
        spark, frag_path, out2, target_file_mb=1,
        zorder_by=["user_id", "event_id"],
    )
    assert spark.read.parquet(out2).count() == df.count()


def test_zorder_guards(spark, fragmented):
    frag_path, _ev = fragmented
    df = spark.read.parquet(frag_path)
    from training_flink_sql_cc_src_spark.operators.maintenance import (
        zorder_value,
    )

    with pytest.raises(ValueError, match=">= 2"):
        zorder_value(df, ["user_id"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_value(df, ["user_id", "value", "event_id"], bits=32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_table(
            spark, frag_path, "/tmp/never", cluster_by=["ts"],
            zorder_by=["user_id", "value"],
        )
