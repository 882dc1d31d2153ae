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
- Late contract (Flink's RowTimeRangeBoundedPrecedingFunction keeps a
  ``lastTriggeringTs`` and DROPS rows at or below it): once a peer
  group at time T has been emitted, any later-arriving row with
  ``ts <= T`` is dropped — including an equal-time peer that a
  micro-batch boundary split away from its group. Emitted results are
  therefore never partial-then-contradicted: the streamed output always
  equals the batch window plan evaluated over exactly the rows that
  were NOT dropped (append mode cannot retract, so accepting an
  equal-to-frontier peer would leave the already-emitted peers with an
  unexplainable partial aggregate). With an in-order replay that keeps
  equal-time rows in one micro-batch (repartitionByRange does), nothing
  drops and stream == batch over the full input.

Aggregates: SUM / COUNT / AVG / MIN / MAX over a numeric column (or
COUNT(*)). Output types follow the batch plan: COUNT → bigint, AVG →
double, SUM → bigint over integral inputs (exact integer accumulation,
no 2^53 rounding) / double over float inputs, MIN/MAX → the source
column type. 100 TB: one shuffle on the partition key; state is
bounded by frame span x per-key rate, never corpus-sized.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_FLOATING = {"float", "double"}


def _out_type(fn: str, col: str | None, field_types: dict) -> str:
    """Output type of one OVER aggregate, matching the batch window plan
    (Spark: SUM(int)→bigint, MIN/MAX keep the source type, AVG→double)."""
    if fn == "count":
        return "bigint"
    src = field_types[col]
    if src not in _INTEGRAL and src not in _FLOATING:
        raise ValueError(
            f"over_agg_stream: {fn} over non-numeric/decimal column "
            f"{col!r} ({src}) is not routed — use the batch plan"
        )
    if fn == "avg":
        return "double"
    if fn == "sum":
        return "bigint" if src in _INTEGRAL else "double"
    return src  # min/max keep the source type


def _agg_value(fn: str, vals: list):
    """Aggregate a frame buffer. Buffers hold python ints for integral
    sources (exact sums) and floats otherwise; None = SQL NULL, skipped
    by every aggregate except COUNT(*) (whose buffer has no Nones)."""
    vv = [v for v in vals if v is not None]
    if fn == "count":
        return len(vv)
    if not vv:
        return None
    if fn == "sum":
        return sum(vv)
    if fn == "avg":
        return float(sum(vv)) / len(vv)
    if fn == "min":
        return min(vv)
    return max(vv)


def over_agg_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    frame: tuple,
    aggs: list[tuple],
    passthrough: list[str],
) -> DataFrame:
    """``frame`` = ("range", seconds) or ("rows", n_preceding);
    ``aggs`` = [(fn, src_col_or_None_for_count_star, alias)] or
    [(fn, col, alias, forced_out_type)] — the 4-tuple form forces the
    emitted type (the router uses it for the CAST(SUM(CAST(x AS
    DECIMAL))...AS DOUBLE) canonical shape: integral accumulation stays
    exact, only the emitted value is double);
    ``passthrough`` = source columns to carry through (must include
    ``ts_col``). Emits one row per (non-late) input row with the
    passthrough columns and each aggregate over its frame."""
    kind, span = frame
    field_types = {f.name: f.dataType.simpleString() for f in
                   stream_df.schema}
    aggs = [tuple(a) + (None,) * (4 - len(a)) for a in aggs]
    src_cols = sorted({c for _, c, _, _ in aggs if c is not None})
    for c in src_cols + [ts_col, key_col]:
        if c not in field_types:
            raise ValueError(f"over_agg_stream: unknown column {c!r}")
    out_types = {
        alias: forced or _out_type(fn, c, field_types)
        for fn, c, alias, forced in aggs
    }
    integral = {c: field_types[c] in _INTEGRAL for c in src_cols}
    out_schema = ", ".join(
        [f"{c} {field_types[c]}" for c in passthrough]
        + [f"{alias} {out_types[alias]}" for _, _, alias, _ in aggs]
    )
    state_schema = "frontier timestamp, ts_buf array<timestamp>"
    if src_cols:
        state_schema += ", " + ", ".join(
            f"buf_{c} array<{'bigint' if integral[c] else 'double'}>"
            for c in src_cols
        )

    def conv(c, v):
        if pd.isna(v):
            return None
        return int(v) if integral[c] else float(v)

    def emit_cast(alias, v):
        if v is None:
            return None
        return float(v) if out_types[alias] in (
            "double", "float") else v

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
                if frontier is not None and cur_ts <= frontier:
                    # late row — Flink's lastTriggeringTs contract: the
                    # peer group at this time already triggered (possibly
                    # in an earlier micro-batch); its frame state is
                    # released and append mode cannot retract, so the
                    # row drops entirely (never a partial re-aggregate)
                    i += 1
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
                            bufs[c].append(conv(c, r[c]))
                    evict(cur_ts)
                    agg_vals = {
                        alias: emit_cast(alias, _agg_value(
                            fn, bufs[c] if c is not None else ts_buf
                        ))
                        for fn, c, alias, _ in aggs
                    }
                    for r in peers:
                        out_rows.append(
                            {c: r[c] for c in passthrough} | agg_vals
                        )
                else:
                    for r in peers:
                        ts_buf.append(cur_ts)
                        for c in src_cols:
                            bufs[c].append(conv(c, r[c]))
                        evict(cur_ts)
                        out_rows.append(
                            {c: r[c] for c in passthrough}
                            | {
                                alias: emit_cast(alias, _agg_value(
                                    fn,
                                    bufs[c] if c is not None else ts_buf,
                                ))
                                for fn, c, alias, _ in aggs
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
