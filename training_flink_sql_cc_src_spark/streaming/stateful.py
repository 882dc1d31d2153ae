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


def adjacent_pattern_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_type: str,
    second_type: str,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming adjacent-pattern matcher — the continuous-query leg of
    the MATCH_RECOGNIZE lowering (plans/match_recognize.py lowers the
    batch side to LEAD chains; a LEAD over a stream is not expressible,
    so the stream side keeps per-key state instead, exactly Flink CEP's
    keyed NFA model).

    PATTERN (A B) with A: type == first_type, B: type == second_type —
    emits (key, first_ts, second_ts) whenever a B event IMMEDIATELY
    follows an A event in the key's event sequence (any intervening event
    of any type breaks adjacency), optionally within ``within_seconds``.
    State per key is one tuple (last event's type + timestamp), so a
    match whose A and B arrive in DIFFERENT micro-batches is still found
    — the cross-batch case a per-batch LEAD would silently drop. State
    volume is O(distinct keys), the floor for any CEP operator.

    Requires per-key event-time-ordered delivery (replay fixtures with
    ``order_by=ts``; a production source provides it per partition-key).
    ``tiebreak_col`` breaks equal-timestamp ordering the same way the
    batch lowering's ORDER BY does, keeping the two legs comparable.
    """
    out_schema = f"{key_col} long, first_ts timestamp, second_ts timestamp"
    state_schema = "last_type string, last_ts timestamp"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_type, last_ts = state.get if state.exists else (None, None)
        firsts, seconds = [], []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            for row in pdf.itertuples(index=False):
                cur_type = getattr(row, type_col)
                cur_ts = getattr(row, ts_col)
                if (
                    last_type == first_type
                    and cur_type == second_type
                    and (
                        within_seconds is None
                        or (cur_ts - last_ts).total_seconds() <= within_seconds
                    )
                ):
                    firsts.append(last_ts)
                    seconds.append(cur_ts)
                last_type, last_ts = cur_type, cur_ts
        state.update((last_type, last_ts))
        if firsts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(firsts),
                    "first_ts": firsts,
                    "second_ts": seconds,
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
