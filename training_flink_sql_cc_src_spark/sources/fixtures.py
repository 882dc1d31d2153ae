"""Parquet fixture source (SURVEY.md §3 EP2 fixture mode).

The reference auto-exposes Kafka topics as tables via Schema Registry
(shoe_customers is readable with no in-repo CREATE —
terraform/lab-aggregations/main.tf:431 vs connector :248-278). Batch
analog: every parquet under the scale-factor dir registers as a temp view.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import TABLES

#: Below this row count a single-task scan is cheaper than re-layout.
_RELAYOUT_MIN_ROWS = 100_000
#: Target row groups for the re-laid-out copy (= max scan parallelism; a
#: multiple of the 32-core session so every core gets work).
_RELAYOUT_GROUPS = 32
_relayout_cache: dict[tuple[str, float, int], str] = {}


def _splittable_path(path: str) -> str:
    """Ingest-time file re-layout: Spark cannot split a parquet scan below
    row-group granularity, so a large single-row-group file (the driver's
    regenerated testdata writes exactly that) pins the whole scan — and
    every map-side stage above it — to ONE task regardless of cluster
    size. Rewrite such files once per session into a spool copy with
    _RELAYOUT_GROUPS row groups and read that instead: identical rows,
    parallel scan. This is the local analog of the compaction/splitting
    every warehouse does at ingest; at 100 TB the same rule is "write
    row groups ≤ the split size" on the ingest path, and this branch
    never fires because distributed writers already do.

    Cache key includes mtime+size so a regenerated source file re-spools.
    """
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return path
    try:
        st = os.stat(path)
        key = (path, st.st_mtime, st.st_size)
        hit = _relayout_cache.get(key)
        if hit is not None and os.path.exists(hit):
            return hit
        meta = pq.ParquetFile(path).metadata
        if meta.num_row_groups > 1 or meta.num_rows < _RELAYOUT_MIN_ROWS:
            _relayout_cache[key] = path
            return path
        spool = os.path.join(
            tempfile.gettempdir(),
            "sparkgraft-relayout",
            f"{os.path.basename(path)}-{st.st_size}-{int(st.st_mtime)}",
        )
        if not os.path.exists(spool):
            os.makedirs(os.path.dirname(spool), exist_ok=True)
            tbl = pq.read_table(path)
            tmp = f"{spool}.tmp-{os.getpid()}"
            pq.write_table(
                tbl,
                tmp,
                row_group_size=max(1, -(-meta.num_rows // _RELAYOUT_GROUPS)),
            )
            os.replace(tmp, spool)  # atomic: concurrent loaders see whole files
        _relayout_cache[key] = spool
        return spool
    except OSError:
        return path


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing ``events.ts`` to TimestampType.

    The driver's events.parquet encoding has varied across testdata
    generations — TIMESTAMP(NANOS) (readable only as long nanos via the
    legacy flag) and plain timestamp[us] (read as TIMESTAMP_NTZ). Dispatch
    on the type Spark actually reads so every generation lands on the same
    session-TZ TimestampType column with identical microsecond values
    (DuckDB reads the same file natively, so oracle parity holds).

    Session timezone is pinned to UTC here (idempotent): timestamp-derived
    values (year/date casts, date_trunc) evaluate in session TZ, and the
    DuckDB oracle is UTC-naive — a non-UTC caller session would shift
    every date field. The NTZ→TZ cast below is value-preserving only
    under UTC, which this pin guarantees.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _splittable_path(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long nanos
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type == "timestamp_ntz":  # timestamp[us], no TZ metadata
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already TimestampType
    return spark.read.parquet(path)


def register_fixture_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_fixture(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
