"""Batch↔stream parity harness (SURVEY.md §5: 'streaming-parity tests
running the same query through readStream on a memory source vs batch and
diffing results').

Every engine query function is written against a plain DataFrame, so the
same function body runs on a streaming frame. This module replays a batch
DataFrame as a file stream (parquet spool → readStream with the identical
schema), applies the query, drains it into a memory sink with
``processAllAvailable``, and returns the materialized result for diffing
against the batch output.

Changelog-mode → output-mode mapping (SURVEY.md §1.1/§2.6): append tables
stream with ``append``; upsert/retract tables (PK'd sinks, S1/S3/S5's
``changelog.mode=retract``) stream with ``update``/``complete`` — in batch
the distinction vanishes (the oracle sees final state), which is what the
driver's DuckDB comparison checks.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

OUTPUT_MODE_FOR_CHANGELOG = {
    "append": "append",
    "upsert": "update",
    "retract": "complete",
}


def stream_from_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    n_files: int = 4,
    order_by: str | None = None,
) -> DataFrame:
    """Replay a batch DataFrame as a bounded file stream: spool to parquet
    in n_files chunks (so several micro-batches fire), then readStream with
    the exact batch schema. maxFilesPerTrigger=1 forces incremental
    processing, exercising real streaming state merging.

    ``order_by``: spool with range partitioning on that column so files
    replay in its order (FileStreamSource processes ties-in-modtime by
    path, and part-file names follow range-partition order) — an in-order
    event-time replay where the watermark advances monotonically. Without
    it the replay is round-robin, i.e. heavily out-of-order.
    """
    import glob
    import os
    import time

    spool = tempfile.mkdtemp(prefix=f"sparkgraft-stream-{uuid.uuid4().hex[:8]}-")
    if order_by is not None:
        spooled = batch_df.repartitionByRange(n_files, order_by)
    else:
        spooled = batch_df.repartition(n_files)
    spooled.write.mode("overwrite").parquet(spool)
    if order_by is not None:
        # FileStreamSource replays by (modification time, path); parallel
        # task completion randomizes mtimes, so stamp them in part-file
        # order (= range-partition order) to get a true in-order replay
        base = time.time() - 3600
        for i, f in enumerate(sorted(glob.glob(os.path.join(spool, "part-*")))):
            os.utime(f, (base + i, base + i))
    return (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


def run_stream_over_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    transform,
    output_mode: str = "complete",
    n_files: int = 4,
    order_by: str | None = None,
) -> DataFrame:
    """Run ``transform(streaming_df)`` over a replay of ``batch_df`` and
    return the fully-drained result as a batch DataFrame (memory sink).

    ``output_mode='complete'`` for aggregations (final state ==
    batch-recompute); ``'append'`` for stateless/watermark-closed
    transforms. ``order_by`` replays in that column's order (see
    stream_from_batch).
    """
    stream = stream_from_batch(spark, batch_df, n_files=n_files, order_by=order_by)
    out = transform(stream)
    sink = f"parity_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
