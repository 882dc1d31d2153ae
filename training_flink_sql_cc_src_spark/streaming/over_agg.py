"""Continuous OVER aggregation — Flink's "Over Aggregation" statement.

Flink streams ``agg(x) OVER (PARTITION BY k ORDER BY rowtime RANGE|ROWS
BETWEEN ... PRECEDING AND CURRENT ROW)`` by keeping, per key, exactly
the frame's rows in keyed state and emitting one result row per input
row (an append-only stream). Structured Streaming rejects window
functions over streams outright, so this is the same re-expression the
CEP matchers use: ``applyInPandasWithState`` with the frame buffer in
the state — O(frame) per key, the identical cost Flink's
OverWindow operator pays.

Semantics mirrored from the batch window plan:

- RANGE frames include ALL peer rows (equal order-column values): rows
  sharing an event time are buffered together and every one of them
  gets the same aggregate over the full peer group — exactly Spark's /
  SQL's RANGE ... CURRENT ROW peer semantics. ROWS frames are
  arrival-ordered (ties broken by arrival, like any ROWS frame under a
  non-unique ordering).
- A row older than its key's already-emitted frontier is DROPPED — the
  same late-row behavior as Flink's rowtime OVER operator (state for
  past frames is gone; emitting would retract published results).
  With an in-order replay nothing drops and stream == batch exactly.

Aggregates: SUM / COUNT / AVG / MIN / MAX over a numeric column (or
COUNT(*)). Values aggregate as doubles (exact for integers below 2^53);
SUM of an integer column is emitted as double to keep one output type
per function. 100 TB: one shuffle on the partition key; state is
bounded by frame span x per-key rate, never corpus-sized.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_TYPE = {"sum": "double", "count": "long", "avg": "double",
             "min": "double", "max": "double"}


def _agg_value(fn: str, vals: list) -> float | int | None:
    vv = [v for v in vals if v is not None]
    if fn == "count":
        return len(vv)
    if not vv:
        return None
    if fn == "sum":
        return float(sum(vv))
    if fn == "avg":
        return float(sum(vv)) / len(vv)
    if fn == "min":
        return float(min(vv))
    return float(max(vv))


def over_agg_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    frame: tuple,
    aggs: list[tuple],
    passthrough: list[str],
) -> DataFrame:
    """``frame`` = ("range", seconds) or ("rows", n_preceding);
    ``aggs`` = [(fn, src_col_or_None_for_count_star, alias), ...];
    ``passthrough`` = source columns to carry through (must include
    ``ts_col``). Emits one row per (non-late) input row with the
    passthrough columns and each aggregate over its frame."""
    kind, span = frame
    field_types = {f.name: f.dataType.simpleString() for f in
                   stream_df.schema}
    src_cols = sorted({c for _, c, _ in aggs if c is not None})
    for c in src_cols + [ts_col, key_col]:
        if c not in field_types:
            raise ValueError(f"over_agg_stream: unknown column {c!r}")
    out_schema = ", ".join(
        [f"{c} {field_types[c]}" for c in passthrough]
        + [f"{alias} {_OUT_TYPE[fn]}" for fn, _, alias in aggs]
    )
    state_schema = (
        "frontier timestamp, ts_buf array<timestamp>, "
        + ", ".join(f"buf_{c} array<double>" for c in src_cols)
    )
    if not src_cols:
        state_schema = "frontier timestamp, ts_buf array<timestamp>"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals = state.get
            frontier = vals[0]
            ts_buf = list(vals[1] or [])
            bufs = {
                c: list(vals[2 + i] or []) for i, c in enumerate(src_cols)
            }
        else:
            frontier, ts_buf = None, []
            bufs = {c: [] for c in src_cols}

        def evict(cur_ts):
            if kind == "range":
                lo = cur_ts - pd.Timedelta(seconds=span)
                while ts_buf and ts_buf[0] < lo:
                    ts_buf.pop(0)
                    for c in src_cols:
                        bufs[c].pop(0)
            else:
                while len(ts_buf) > span + 1:
                    ts_buf.pop(0)
                    for c in src_cols:
                        bufs[c].pop(0)

        for pdf in batches:
            pdf = pdf.sort_values(ts_col, kind="stable")
            out_rows: list[dict] = []
            n = len(pdf)
            recs = pdf.to_dict("records")
            i = 0
            while i < n:
                cur_ts = recs[i][ts_col]
                if frontier is not None and cur_ts < frontier:
                    i += 1  # late row: frame state already released
                    continue
                # peer group: all rows sharing this event time (RANGE
                # frames aggregate peers together; ROWS frames keep
                # arrival order inside the group)
                j = i
                while j < n and recs[j][ts_col] == cur_ts:
                    j += 1
                peers = recs[i:j]
                if kind == "range":
                    for r in peers:
                        ts_buf.append(cur_ts)
                        for c in src_cols:
                            v = r[c]
                            bufs[c].append(
                                None if pd.isna(v) else float(v)
                            )
                    evict(cur_ts)
                    agg_vals = {
                        alias: _agg_value(
                            fn, bufs[c] if c is not None else ts_buf
                        )
                        for fn, c, alias in aggs
                    }
                    for r in peers:
                        out_rows.append(
                            {c: r[c] for c in passthrough} | agg_vals
                        )
                else:
                    for r in peers:
                        ts_buf.append(cur_ts)
                        for c in src_cols:
                            v = r[c]
                            bufs[c].append(
                                None if pd.isna(v) else float(v)
                            )
                        evict(cur_ts)
                        out_rows.append(
                            {c: r[c] for c in passthrough}
                            | {
                                alias: _agg_value(
                                    fn,
                                    bufs[c] if c is not None else ts_buf,
                                )
                                for fn, c, alias in aggs
                            }
                        )
                frontier = cur_ts
                i = j
            if out_rows:
                yield pd.DataFrame(out_rows)
        st = [frontier, ts_buf] + [bufs[c] for c in src_cols]
        state.update(tuple(st))

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
