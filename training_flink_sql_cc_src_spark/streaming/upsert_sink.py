"""Streaming upsert sink via foreachBatch merge (SURVEY.md §1.1: the
Spark emulation of Flink writing a PK'd/compacted table — 'in streaming,
foreachBatch MERGE').

Each micro-batch is merged into a parquet-backed keyed table: union with
the current state, collapse to latest-row-per-key ordered by (stored seq,
batch id), overwrite. The read-modify-write is safe because the current
state is localCheckpoint'ed (materialized) before the overwrite.

Scale notes: this local-parquet variant is the test/demo backend; on a
real deployment the same ``foreachBatch`` body targets a table format with
real MERGE (Delta/Iceberg), where the per-batch cost is one keyed merge
instead of a full rewrite. The operator contract (latest-per-key under a
monotone sequence) is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key


def start_upsert_sink(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    order_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query that maintains ``path`` as the
    latest-per-key materialization of the stream (PK = ``keys``).

    ``order_col``: optional event-time/version column that breaks ties
    WITHIN a micro-batch (arrival order across batches is the primary
    ordering, mirroring Kafka compaction's offset order)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        incoming = batch_df.withColumn("__seq", F.lit(batch_id))
        if os.path.exists(path):
            current = spark.read.parquet(path).localCheckpoint(eager=True)
            combined = current.unionByName(incoming)
        else:
            combined = incoming
        ordering = ["__seq"] if order_col is None else ["__seq", order_col]
        merged = latest_per_key(combined, keys=keys, order_col=ordering)
        merged.write.mode("overwrite").parquet(path)

    writer = stream_df.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
