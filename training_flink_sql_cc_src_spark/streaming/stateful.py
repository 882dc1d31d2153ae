"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.8 / the build brief's 'applyInPandasWithState for custom
stateful operators').

This is the escape hatch for streaming semantics the built-in operators
can't express: arbitrary per-key state evolved across micro-batches, with
Arrow-batched Python at the group boundary. State is a tuple snapshot per
key, checkpointed by Spark; at scale state volume is
O(distinct keys × state width) spread across executors — the same cost
model as a Flink keyed process function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum, max) maintained across micro-batches —
    the canonical keyed-process-function example. Emits the updated totals
    for each key touched in each batch (changelog/update semantics, like a
    Flink non-windowed keyed aggregate)."""

    out_schema = f"{key_col} long, n long, total double, peak double"
    state_schema = "n long, total double, peak double"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, peak = state.get
        else:
            n, total, peak = 0, 0.0, float("-inf")
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            peak = max(peak, float(pdf[value_col].max()))
        state.update((n, total, peak))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total], "peak": [peak]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
