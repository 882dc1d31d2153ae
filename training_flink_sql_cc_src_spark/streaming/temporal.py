"""Continuous temporal (FOR SYSTEM_TIME AS OF) join — the lab-joins
versioned-dim exercise (reference: terraform/lab-joins/main.tf:531,564
sets the S9/S10 watermarks; the joined dims are the S1/S3 PK'd tables).

Flink's event-time temporal join keeps every version of the PK'd dim in
keyed state and joins each probe row against the version valid at the
row's event time. Structured Streaming has no versioned-state join, so
the engine re-expresses it as VERDICT r7 prescribed:

1. The dim stream is drained into a VERSION-HISTORY snapshot — an
   append parquet sink via foreachBatch (`start_version_history_sink`),
   which also `refreshByPath`s the snapshot so readers re-list files.
   All versions are kept (the validity-interval rewrite needs them, not
   just latest-per-key); on a real deployment the same body targets a
   table format with compaction + watermark-based version pruning.
2. The probe stream runs the UNCHANGED temporal-join statement through
   ``Engine.sql_stream`` with the snapshot registered as a batch view:
   Catalyst plans a per-microbatch STREAM-STATIC join against the
   router's validity-interval rewrite (LEAD(version_ts) per PK bounds
   each version's lifetime — plans/router.py:_rewrite_temporal_joins).

Semantics: each probe micro-batch sees the snapshot as of its own
execution — versions that arrived before the probe row is processed
participate exactly as in Flink; a version arriving AFTER a probe row
was already emitted cannot retract it (append mode), which is Flink's
behavior too when the watermark has passed. With the dim drained ahead
of the probe replay, stream == batch exactly (parity-tested).

100 TB: the history sink is an append of K dim-update rows per batch;
the probe side joins against a snapshot whose size is versions-per-key
x keys — prune old versions by compacting with a watermark lower bound
when the dim churns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def start_version_history_sink(
    dim_stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain ``path`` as the append-only VERSION HISTORY of the dim
    stream (every update row kept — the temporal rewrite derives each
    version's validity interval with LEAD per PK). Each batch also
    refreshes Spark's cached file listing for ``path`` so a running
    probe query's stream-static join re-lists on its next micro-batch."""

    def append(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(path)
        spark.catalog.refreshByPath(path)

    writer = dim_stream.writeStream.foreachBatch(append).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_view(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    """Register the version-history snapshot as a batch view ``name`` —
    the static side of the per-microbatch stream-static temporal join."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    return df


def temporal_join_stream(
    engine,
    stmt: str,
    probe_sources: dict[str, DataFrame],
    dim_name: str,
    dim_stream: DataFrame,
    workdir: str,
    drain_dim_first: bool = True,
):
    """One-call composition: drain/start the dim's version-history sink,
    register the snapshot under ``dim_name``, and run ``stmt`` (the
    verbatim FOR SYSTEM_TIME AS OF statement) through
    ``engine.sql_stream`` with the probe stream(s).

    ``drain_dim_first=True`` (availableNow) replays the whole dim before
    the probe starts — exact event-time semantics for a bounded replay;
    ``False`` starts a continuous sink and the probe joins each
    micro-batch against the freshest snapshot (processing-time temporal
    semantics, Flink's lookup-join analog)."""
    path = os.path.join(workdir, f"__temporal_{dim_name}")
    ckpt = os.path.join(workdir, f"__temporal_{dim_name}_ckpt")
    sink = start_version_history_sink(
        dim_stream, path, ckpt, trigger_available_now=drain_dim_first
    )
    if drain_dim_first:
        sink.awaitTermination()
        dim_handle = None
    else:
        dim_handle = sink
    snapshot_view(engine.spark, path, dim_name)
    out = engine.sql_stream(stmt, probe_sources)
    return out, dim_handle
