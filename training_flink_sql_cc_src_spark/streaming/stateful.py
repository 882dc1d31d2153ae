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

import os
import re
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


def sequence_pattern_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    types: list[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming matcher for an adjacent sequence of ANY fixed length —
    the continuous-query leg of the generalized MATCH_RECOGNIZE lowering
    (plans/match_recognize.py): PATTERN (T1 T2 ... TL) where row i's
    ``type_col`` equals ``types[i]``, all L events adjacent in the key's
    sequence, optionally first→last within ``within_seconds``.

    State per key is the last L-1 (type, ts) events — a fixed-width
    sliding window (Flink CEP's partial-match state for a linear pattern),
    O(distinct keys × (L-1)) total, spread across executors. Matches
    spanning micro-batch boundaries are found; AFTER MATCH SKIP TO NEXT
    ROW semantics (every start row can match, like the batch lowering
    with overlapping patterns allowed).

    Requires per-key event-time-ordered delivery (replay fixtures with
    ``order_by=ts``); ``tiebreak_col`` aligns equal-ts ordering with the
    batch lowering's ORDER BY. Emits (key, ts_1 .. ts_L) per match."""
    length = len(types)
    if length < 2:
        raise ValueError("sequence pattern needs at least 2 steps")
    hist = length - 1
    out_schema = f"{key_col} long, " + ", ".join(
        f"ts_{i + 1} timestamp" for i in range(length)
    )
    state_schema = ", ".join(
        f"t{i} string, s{i} timestamp" for i in range(1, hist + 1)
    )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        window: list[tuple] = []
        if state.exists:
            vals = state.get
            window = [
                (vals[2 * i], vals[2 * i + 1])
                for i in range(hist)
                if vals[2 * i] is not None
            ]
        matches: list[list] = []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            for row in pdf.itertuples(index=False):
                cur = (getattr(row, type_col), getattr(row, ts_col))
                seq = window + [cur]
                if len(seq) == length and all(
                    t == want for (t, _), want in zip(seq, types)
                ):
                    if (
                        within_seconds is None
                        or (seq[-1][1] - seq[0][1]).total_seconds()
                        <= within_seconds
                    ):
                        matches.append([s for _, s in seq])
                window = seq[-hist:]
        flat: list = []
        for tname, ts in window:
            flat += [tname, ts]
        while len(flat) < 2 * hist:  # pad oldest slots when history short
            flat = [None, None] + flat
        state.update(tuple(flat))
        if matches:
            data = {key_col: [key[0]] * len(matches)}
            for i in range(length):
                data[f"ts_{i + 1}"] = [m[i] for m in matches]
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_pattern_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    run_type: str,
    end_type: str,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming matcher for PATTERN (A+ B) — the unbounded maximal-run
    shape (continuous leg of plans/match_recognize._lower_plus) under
    AFTER MATCH SKIP PAST LAST ROW semantics: one match per maximal
    consecutive run of ``run_type`` rows immediately followed by an
    ``end_type`` row, with the optional WITHIN bound measured from the
    run's FIRST row (the match start).

    State per key is O(1) — (in_run, run_start_ts, last_run_ts) — at ANY
    run length, exactly Flink CEP's partial-match state for a linear
    greedy pattern with disjoint predicates. Runs spanning micro-batch
    boundaries are matched. Emits (key, first_ts, last_ts, end_ts)."""
    out_schema = (
        f"{key_col} long, first_ts timestamp, last_ts timestamp, "
        "end_ts timestamp"
    )
    state_schema = "in_run boolean, run_start timestamp, run_last timestamp"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        in_run, run_start, run_last = (
            state.get if state.exists else (False, None, None)
        )
        firsts, lasts, ends = [], [], []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            for row in pdf.itertuples(index=False):
                cur_type = getattr(row, type_col)
                cur_ts = getattr(row, ts_col)
                if cur_type == run_type:
                    if not in_run:
                        in_run, run_start = True, cur_ts
                    run_last = cur_ts
                elif in_run and cur_type == end_type:
                    if (
                        within_seconds is None
                        or (cur_ts - run_start).total_seconds()
                        <= within_seconds
                    ):
                        firsts.append(run_start)
                        lasts.append(run_last)
                        ends.append(cur_ts)
                    in_run = False
                else:
                    in_run = False
        state.update((in_run, run_start, run_last))
        if firsts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(firsts),
                    "first_ts": firsts,
                    "last_ts": lasts,
                    "end_ts": ends,
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
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


def mid_run_pattern_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    run_type: str,
    end_type: str,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming matcher for PATTERN (A B+ C) — an unbounded run at a
    MIDDLE position (continuous leg of plans/match_recognize._lower_nfa
    for the disjoint eq-type funnel): a ``start_type`` row, one-or-more
    consecutive ``run_type`` rows, then an ``end_type`` row.

    State per key is O(1) at any run length — (phase, a_ts, run_start,
    run_last, run_len): phase 0 idle, 1 after the A row, 2 inside the
    B-run. Any non-matching row resets; a new A row restarts the partial
    match (with disjoint predicates no other start can succeed first, so
    the single-candidate state machine equals the batch NFA). The WITHIN
    bound is measured from the A row (the match start). Matches spanning
    micro-batch boundaries are found. Emits (key, a_ts, run_len,
    run_last_ts, end_ts)."""
    out_schema = (
        f"{key_col} long, a_ts timestamp, run_len long, "
        "run_last_ts timestamp, end_ts timestamp"
    )
    state_schema = (
        "phase int, a_ts timestamp, run_start timestamp, "
        "run_last timestamp, run_len long"
    )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        phase, a_ts, run_start, run_last, run_len = (
            state.get if state.exists else (0, None, None, None, 0)
        )
        a_out, len_out, last_out, end_out = [], [], [], []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            for row in pdf.itertuples(index=False):
                cur_type = getattr(row, type_col)
                cur_ts = getattr(row, ts_col)
                if cur_type == start_type:
                    # a fresh A always restarts the partial match
                    phase, a_ts = 1, cur_ts
                    run_start = run_last = None
                    run_len = 0
                elif cur_type == run_type and phase in (1, 2):
                    if phase == 1:
                        run_start = cur_ts
                        run_len = 0
                    phase, run_last = 2, cur_ts
                    run_len += 1
                elif cur_type == end_type and phase == 2:
                    if (
                        within_seconds is None
                        or (cur_ts - a_ts).total_seconds() <= within_seconds
                    ):
                        a_out.append(a_ts)
                        len_out.append(run_len)
                        last_out.append(run_last)
                        end_out.append(cur_ts)
                    phase, a_ts = 0, None
                    run_start = run_last = None
                    run_len = 0
                else:
                    phase, a_ts = 0, None
                    run_start = run_last = None
                    run_len = 0
        state.update((phase, a_ts, run_start, run_last, run_len))
        if a_out:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(a_out),
                    "a_ts": a_out,
                    "run_len": len_out,
                    "run_last_ts": last_out,
                    "end_ts": end_out,
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sequence_flags_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    flag_cols: list[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
    skip_past: bool = False,
    prev_spec: tuple | None = None,
    payload_spec: tuple | None = None,
    next_spec: tuple | None = None,
) -> DataFrame:
    """Streaming matcher for an adjacent fixed-length sequence with
    ARBITRARY row-local predicates — the general-predicate continuous
    leg of the MATCH_RECOGNIZE lowering (round-7: beyond equality
    literals). ``flag_cols[i]`` is a BOOLEAN column (compiled JVM-side
    from variable i's DEFINE, exactly like the batch NFA's precomputed
    per-variable booleans) that row i of the window must satisfy.

    Because predicates may OVERLAP (one row can satisfy several
    variables), state keeps the last L-1 rows' flag BITMASKS + ts — a
    fixed-width window, same O(distinct keys x (L-1)) cost as the
    eq-literal matcher. With overlapping predicates the skip mode
    MATTERS (matches can share rows): ``skip_past=False`` gives AFTER
    MATCH SKIP TO NEXT ROW (every start may match); ``skip_past=True``
    clears the window after each match — exactly the batch scan
    resuming past the consumed rows. ``prev_spec`` adds physical
    PREV(col, n) comparison conjuncts per flag, evaluated against the
    last max(n) rows kept in the same state (see module note above).
    ``payload_spec`` = ([(position, col), ...], {col: sql_type}) carries
    MEASURE columns of matched rows through the window state: the
    window keeps the union of needed source columns per row and a match
    emits each requested (position, col) as ``v{position+1}_{col}`` —
    Flink CEP's per-variable measure payloads, still O(L) state.
    ``next_spec`` = (checks_per_position, {col: sql_type}) adds
    NEXT(col, n) comparison conjuncts that resolve INSIDE the candidate
    window (position + n <= L-1), evaluated once the full window is
    assembled — bounded lookahead without future-row buffering.
    Emits (key, ts_1 .. ts_L [, v*_*...])."""
    length = len(flag_cols)
    if length < 2:
        raise ValueError("sequence pattern needs at least 2 steps")
    hist = length - 1
    pay_pairs, pay_types = [], {}
    if payload_spec is not None:
        pay_pairs, pay_types = payload_spec
    nxt_checks, nxt_types = [], {}
    if next_spec is not None:
        nxt_checks, nxt_types = next_spec
    # window rows carry the union of measure-payload and NEXT-conjunct
    # columns; both index into the same per-row value tuple
    pcols = sorted({c for _, c in pay_pairs} | set(nxt_types))
    wtypes = {**pay_types, **nxt_types}
    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, " + ", ".join(
        [f"ts_{i + 1} timestamp" for i in range(length)]
        + [f"v{pos + 1}_{c} {pay_types[c]}" for pos, c in pay_pairs]
    )
    state_schema = ", ".join(
        f"m{i} long, s{i} timestamp"
        + "".join(f", w{i}_{c} {wtypes[c]}" for c in pcols)
        for i in range(1, hist + 1)
    )
    stride = 2 + len(pcols)
    checks_per_flag, need_cols, max_prev = [], [], 0
    if prev_spec is not None:
        checks_per_flag, need_cols, max_prev, col_types = prev_spec
        state_schema += ", " + _prev_schema_suffix(
            need_cols, max_prev, col_types
        )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # window rows oldest-first: (mask, ts, (payload vals in pcols order))
        window: list[tuple] = []
        vhist: list[dict] = []  # needed cols of the last max_prev rows
        if state.exists:
            vals = state.get
            window = [
                (
                    vals[stride * i],
                    vals[stride * i + 1],
                    tuple(vals[stride * i + 2 : stride * (i + 1)]),
                )
                for i in range(hist)
                if vals[stride * i] is not None
            ]
            if max_prev:
                vhist = _prev_load(vals, stride * hist, need_cols, max_prev)
        matches: list[list] = []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            flags = [
                pdf[c].fillna(False).to_numpy(dtype=bool) for c in flag_cols
            ]
            ts_vals = list(pdf[ts_col])
            need_vals = {c: list(pdf[c]) for c in need_cols}
            pay_vals = {c: list(pdf[c]) for c in pcols}
            for r in range(len(pdf)):
                cur_vals = None
                if max_prev:
                    cur_vals = {
                        c: _scalar(need_vals[c][r]) for c in need_cols
                    }
                mask = 0
                for i in range(length):
                    if flags[i][r] and (
                        not checks_per_flag
                        or not checks_per_flag[i]
                        or _prev_ok(checks_per_flag[i], cur_vals, vhist)
                    ):
                        mask |= 1 << i
                if max_prev:
                    vhist.append(cur_vals)
                    vhist = vhist[-max_prev:]
                cur = (
                    mask,
                    ts_vals[r],
                    tuple(_scalar(pay_vals[c][r]) for c in pcols),
                )
                seq = window + [cur]
                matched_here = False
                if (
                    len(seq) == length
                    and all(s[0] & (1 << i) for i, s in enumerate(seq))
                    and _next_ok(nxt_checks, seq, pcols)
                ):
                    if (
                        within_seconds is None
                        or (seq[-1][1] - seq[0][1]).total_seconds()
                        <= within_seconds
                    ):
                        matches.append(
                            [s[1] for s in seq]
                            + [
                                seq[pos][2][pcols.index(c)]
                                for pos, c in pay_pairs
                            ]
                        )
                        matched_here = True
                window = [] if (skip_past and matched_here) else seq[-hist:]
        flat: list = []
        for mask, ts, pv in window:
            flat += [mask, ts, *pv]
        while len(flat) < stride * hist:
            flat = [None] * stride + flat
        if max_prev:
            flat += _prev_flat(vhist, need_cols, max_prev)
        state.update(tuple(flat))
        if matches:
            data = {key_col: [key[0]] * len(matches)}
            for i in range(length):
                data[f"ts_{i + 1}"] = [m[i] for m in matches]
            for j, (pos, c) in enumerate(pay_pairs):
                data[f"v{pos + 1}_{c}"] = [m[length + j] for m in matches]
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_flags_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    run_flag_col: str,
    end_flag_col: str,
    tiebreak_col: str | None = None,
    prev_spec: tuple | None = None,
    payload_spec: tuple | None = None,
    agg_spec: list | None = None,
) -> DataFrame:
    """Streaming matcher for PATTERN (A+ B) with ARBITRARY row-local
    predicates that may OVERLAP (a row can satisfy both A and B) —
    reproducing the batch NFA's greedy backtracking under AFTER MATCH
    SKIP PAST LAST ROW with O(1) state per key:

    - a run row satisfying BOTH predicates is consumed greedily as A but
      remembered as the latest in-run end candidate (``pend``);
    - when a row breaks the run (fails A): if it satisfies B the longest
      match emits (run, break row); otherwise the remembered candidate
      emits ((run up to pend-1), pend) — rows after ``pend`` cannot
      contain a later candidate (pend is the LAST B-satisfying run row)
      and the break row kills any remainder run, so a full reset is
      exact.

    A match is finalized only when a row fails A — the same
    longest-match-needs-a-terminator contract as Flink CEP's greedy
    unbounded quantifier. WITHIN is not supported here: a too-old run
    start would require re-anchoring the match start mid-run, which
    needs the run rows' timestamps (unbounded state); the router
    rejects that combination loudly. ``prev_spec`` adds physical
    PREV(col, n) comparison conjuncts per flag (run flag, then end
    flag), evaluated against the last max(n) rows kept in the same
    state (see module note above).

    ``payload_spec`` = ([(role, col), ...], {col: sql_type}) carries
    MEASURE columns through bounded state, emitted as ``{role}_{col}``:
    role "last" / "last{j}" reads the run's final A row / the j-th row
    before it (SQL:2016 LAST(A.col, j) — round 9: the state keeps the
    last K+1 run-row payload tuples where K is the largest offset
    requested, a COMPILE-TIME bound, so state stays O(K) per key;
    offsets past the run length emit NULL); "first" / "first{j}" reads
    the run's first rows (the first K+1 payloads, frozen as they
    arrive — the pend backtrack keeps the same start row, and entries
    past the BACKTRACKED run length are gated off at emission); "end"
    reads the single B row (any offset >= 1 on it is NULL by
    definition — the engine emits that literal without a payload).
    The pend snapshot copies the pre-pend history so the backtracked
    match reads exactly its own rows. ``agg_spec`` =
    [(fn, role, col_or_None, alias, out_type), ...] adds AGGREGATE
    measures: role "run" aggregates over the run's rows through O(1)
    ACCUMULATORS (count/sum/min/max maintained incrementally, with a
    pend snapshot for the backtrack candidate — exactly how Flink CEP
    folds aggregates into partial-match state); role "end" reads the
    single B row. Emits (key, first_ts, last_ts, end_ts
    [, last_*/first_*/end_*..., agg aliases...])."""
    pay_pairs, pay_types = [], {}
    if payload_spec is not None:
        pay_pairs, pay_types = payload_spec
    aggs = list(agg_spec or [])
    end_agg_cols = {
        c for _, role, c, _, _ in aggs if role == "end" and c is not None
    }
    arun_cols = sorted(
        {c for _, role, c, _, _ in aggs if role == "run" and c is not None}
    )
    pcols = sorted({c for _, c in pay_pairs} | end_agg_cols)

    def _role(role: str) -> tuple[str, int]:
        m = re.fullmatch(r"(last|first|end)(\d*)", role)
        if m is None:
            raise ValueError(f"run matcher payload role {role!r}")
        return m.group(1), int(m.group(2) or 0)

    roles = [(_role(role), c) for role, c in pay_pairs]
    # K: largest logical offset any measure requests — the history
    # depth kept in state (compile-time bound; 0 = classic single slots)
    K = max((off for (_, off), _ in roles), default=0)
    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, first_ts timestamp, last_ts timestamp, "
        "end_ts timestamp"
        + "".join(f", {role}_{c} {pay_types[c]}" for role, c in pay_pairs)
        + "".join(f", {alias} {out_t}" for _, _, _, alias, out_t in aggs)
    )
    state_schema = (
        "run_start timestamp, run_last timestamp, "
        "pend timestamp, pend_prev timestamp"
        # payload histories: last K+1 run rows (rl), their pend snapshot
        # (pp), first K+1 run rows (fs), and the pend row itself (pe)
        + "".join(
            f", {tag}{i}_{c} {pay_types[c]}"
            for tag in ("rl", "pp", "fs")
            for i in range(K + 1)
            for c in pcols
        )
        + "".join(f", pe_{c} {pay_types[c]}" for c in pcols)
    )
    npay = len(pcols)
    hist_w = npay * (K + 1)
    pay_state_off = 4
    n_ac = len(arun_cols)
    agg_state = bool(aggs)
    len_state = agg_state or K > 0  # run lengths gate offset validity
    if K > 0 and not agg_state:
        state_schema += ", rlen long, p_rlen long"
    if agg_state:
        # run length + per-run-agg-col accumulators (count, sum, min,
        # max) and their pend snapshots
        state_schema += ", rlen long, p_rlen long" + "".join(
            f", {t}_{c} {ty}"
            for c in arun_cols
            for t, ty in (
                ("ac", "long"), ("asm", "double"),
                ("amn", "double"), ("amx", "double"),
                ("qc", "long"), ("qsm", "double"),
                ("qmn", "double"), ("qmx", "double"),
            )
        )
    agg_off = pay_state_off + 3 * hist_w + npay
    len_width = 2 if len_state else 0
    agg_width = len_width + (8 * n_ac if agg_state else 0)
    checks_per_flag, need_cols, max_prev = [], [], 0
    if prev_spec is not None:
        checks_per_flag, need_cols, max_prev, col_types = prev_spec
        state_schema += ", " + _prev_schema_suffix(
            need_cols, max_prev, col_types
        )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        vhist: list[dict] = []
        none_pay = (None,) * npay

        def _load_hist(vals, off, n):
            """History slots -> the first ``n`` payload tuples. The
            length comes from the TRACKED run lengths, never from
            None-sniffing — a payload row whose measured columns are
            all legitimately NULL must keep its slot."""
            return [
                tuple(vals[off + i * npay : off + (i + 1) * npay])
                for i in range(n)
            ]

        def _flat_hist(hist):
            pad = [none_pay] * (K + 1 - len(hist))
            flat: list = []
            for tup in list(hist) + pad:
                flat += list(tup)
            return flat

        rl_hist: list[tuple] = []
        pp_hist: list[tuple] = []
        fs_hist: list[tuple] = []
        pe_pay = none_pay
        # run-aggregate accumulators: {col: [cnt, sum, min, max]} for
        # the live run and the pend snapshot, plus the run lengths
        rlen = p_rlen = 0
        acc = {c: [0, 0.0, None, None] for c in arun_cols}
        pacc = {c: [0, 0.0, None, None] for c in arun_cols}
        if state.exists:
            vals = state.get
            run_start, run_last, pend, pend_prev = vals[:4]
            if len_state:
                rlen = vals[agg_off] or 0
                p_rlen = vals[agg_off + 1] or 0
            else:
                # K == 0, no aggregates: single-slot histories whose
                # lengths follow from the run/pend liveness alone
                rlen = 0 if run_start is None else 1
                p_rlen = 0 if pend is None else 1
            if npay:
                n_live = 0 if run_start is None else min(rlen, K + 1)
                n_pend = 0 if pend is None else min(p_rlen, K + 1)
                rl_hist = _load_hist(vals, pay_state_off, n_live)
                pp_hist = _load_hist(vals, pay_state_off + hist_w, n_pend)
                fs_hist = _load_hist(
                    vals, pay_state_off + 2 * hist_w, n_live
                )
                pe_pay = tuple(
                    vals[pay_state_off + 3 * hist_w :
                         pay_state_off + 3 * hist_w + npay]
                )
            if agg_state:
                for i, c in enumerate(arun_cols):
                    base = agg_off + 2 + 8 * i
                    acc[c] = [
                        vals[base] or 0, vals[base + 1] or 0.0,
                        vals[base + 2], vals[base + 3],
                    ]
                    pacc[c] = [
                        vals[base + 4] or 0, vals[base + 5] or 0.0,
                        vals[base + 6], vals[base + 7],
                    ]
            if max_prev:
                vhist = _prev_load(
                    vals, agg_off + agg_width, need_cols, max_prev
                )
        else:
            run_start, run_last, pend, pend_prev = None, None, None, None
        firsts, lasts, ends = [], [], []
        # per match: (last_hist, end_pay, first_hist, match_run_len)
        pays: list[tuple] = []
        agg_outs: list[list] = []

        def _acc_add(c, v):
            if v is None:
                return
            a = acc[c]
            v = float(v)
            a[0] += 1
            a[1] += v
            a[2] = v if a[2] is None else min(a[2], v)
            a[3] = v if a[3] is None else max(a[3], v)

        def _finalize(run_len, accs, end_tuple):
            return _agg_finalize(
                aggs, pcols, run_len, accs, {"end": end_tuple}
            )
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            a_flags = pdf[run_flag_col].fillna(False).to_numpy(dtype=bool)
            b_flags = pdf[end_flag_col].fillna(False).to_numpy(dtype=bool)
            ts_vals = list(pdf[ts_col])
            need_vals = {c: list(pdf[c]) for c in need_cols}
            pay_vals = {c: list(pdf[c]) for c in pcols}
            arun_vals = {c: list(pdf[c]) for c in arun_cols}
            for r in range(len(pdf)):
                a, b, cur_ts = a_flags[r], b_flags[r], ts_vals[r]
                cur_pay = (
                    tuple(_scalar(pay_vals[c][r]) for c in pcols)
                    if npay
                    else none_pay
                )
                if max_prev:
                    cur_vals = {
                        c: _scalar(need_vals[c][r]) for c in need_cols
                    }
                    if a and checks_per_flag[0]:
                        a = _prev_ok(checks_per_flag[0], cur_vals, vhist)
                    if b and checks_per_flag[1]:
                        b = _prev_ok(checks_per_flag[1], cur_vals, vhist)
                    vhist.append(cur_vals)
                    vhist = vhist[-max_prev:]
                if run_start is None:
                    if a:
                        run_start = run_last = cur_ts
                        rl_hist = [cur_pay]
                        fs_hist = [cur_pay]
                        pend = pend_prev = None
                        rlen, p_rlen = 1, 0
                        if agg_state:
                            acc = {
                                c: [0, 0.0, None, None]
                                for c in arun_cols
                            }
                            pacc = {
                                c: [0, 0.0, None, None]
                                for c in arun_cols
                            }
                            for c in arun_cols:
                                _acc_add(c, _scalar(arun_vals[c][r]))
                elif a:
                    if b:
                        pend, pend_prev = cur_ts, run_last
                        pe_pay = cur_pay
                        # backtrack snapshot: run BEFORE this row
                        pp_hist = list(rl_hist)
                        p_rlen = rlen
                        if agg_state:
                            pacc = {c: list(acc[c]) for c in arun_cols}
                    run_last = cur_ts
                    rl_hist = (rl_hist + [cur_pay])[-(K + 1):]
                    if len(fs_hist) <= K:
                        fs_hist.append(cur_pay)
                    rlen += 1
                    if agg_state:
                        for c in arun_cols:
                            _acc_add(c, _scalar(arun_vals[c][r]))
                elif b:
                    firsts.append(run_start)
                    lasts.append(run_last)
                    ends.append(cur_ts)
                    pays.append((rl_hist, cur_pay, fs_hist, rlen))
                    if agg_state:
                        agg_outs.append(_finalize(rlen, acc, cur_pay))
                    run_start = run_last = pend = pend_prev = None
                    rl_hist, pp_hist, fs_hist = [], [], []
                    rlen = p_rlen = 0
                else:
                    if pend is not None:
                        # the backtracked match starts at the SAME run
                        # start row, so fs_hist carries over; entries
                        # past the backtracked length gate off via the
                        # emitted match_run_len
                        firsts.append(run_start)
                        lasts.append(pend_prev)
                        ends.append(pend)
                        pays.append((pp_hist, pe_pay, fs_hist, p_rlen))
                        if agg_state:
                            agg_outs.append(
                                _finalize(p_rlen, pacc, pe_pay)
                            )
                    run_start = run_last = pend = pend_prev = None
                    rl_hist, pp_hist, fs_hist = [], [], []
                    rlen = p_rlen = 0
        st = [run_start, run_last, pend, pend_prev]
        if npay:
            st += (
                _flat_hist(rl_hist) + _flat_hist(pp_hist)
                + _flat_hist(fs_hist) + list(pe_pay)
            )
        if len_state:
            st += [rlen, p_rlen]
        if agg_state:
            for c in arun_cols:
                st += list(acc[c]) + list(pacc[c])
        if max_prev:
            st += _prev_flat(vhist, need_cols, max_prev)
        state.update(tuple(st))
        if firsts:
            data = {
                key_col: [key[0]] * len(firsts),
                "first_ts": firsts,
                "last_ts": lasts,
                "end_ts": ends,
            }
            for ((base, off), c), (role, _c2) in zip(roles, pay_pairs):
                ci = pcols.index(c)

                def val(p, base=base, off=off, ci=ci):
                    last_hist, end_pay, first_hist, mlen = p
                    if base == "end":
                        return end_pay[ci] if off == 0 else None
                    if mlen <= off:
                        return None  # offset past the mapped run rows
                    if base == "first":
                        return first_hist[off][ci]
                    return last_hist[-1 - off][ci]

                data[f"{role}_{c}"] = [val(p) for p in pays]
            for j, (_, _, _, alias, _) in enumerate(aggs):
                data[alias] = pd.Series(
                    [row[j] for row in agg_outs], dtype=object
                )
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ast_max_len(node) -> int:
    """Maximum rows a bounded pattern AST can consume (raises on an
    unbounded quantifier — those stream through the run matchers or
    stay batch-only)."""
    kind = node[0]
    if kind == "var":
        return 1
    if kind in ("seq", "permute"):
        return sum(ast_max_len(c) for c in node[1])
    if kind == "alt":
        return max(ast_max_len(c) for c in node[1])
    _, child, _, hi, _ = node
    if hi is None:
        raise ValueError("unbounded quantifier in a bounded-window plan")
    return hi * ast_max_len(child)


def _agg_finalize(aggs, pcols, run_len, accs, single_rows):
    """Aggregate-measure values at match emission for the O(1)-state
    run matchers. ``aggs`` = [(fn, role, col_or_None, alias, out_type)];
    a role in ``single_rows`` reads one row's payload tuple (indexed by
    ``pcols``); the run role reads the incremental accumulators
    ``accs[col] = [cnt, sum, min, max]`` and ``run_len`` for COUNT(*).
    Integral out types cast back from the double accumulators (exact
    below 2^53 — the batch pandas int64 sum differs only beyond that)."""
    out = []
    for fn, role, c, _, out_t in aggs:
        integral = out_t in ("tinyint", "smallint", "int", "bigint")
        if role in single_rows:
            row = single_rows[role]
            v = None if c is None else row[pcols.index(c)]
            if fn == "count":
                out.append(1 if (c is None or v is not None) else 0)
            elif v is None:
                out.append(None)
            elif fn == "avg":
                out.append(float(v))
            else:
                out.append(v)
            continue
        if fn == "count" and c is None:
            out.append(run_len)
            continue
        cnt, sm, mn, mx = accs[c]
        if fn == "count":
            out.append(cnt)
        elif cnt == 0:
            out.append(None)
        elif fn == "sum":
            out.append(int(sm) if integral else sm)
        elif fn == "avg":
            out.append(sm / cnt)
        elif fn == "min":
            out.append(int(mn) if integral else mn)
        else:
            out.append(int(mx) if integral else mx)
    return out


def _skip_drop(mp, skip_past, skip_to):
    """Rows to drop from the window head after a match at its head —
    the AFTER MATCH walk: SKIP TO NEXT ROW slides one, SKIP PAST LAST
    ROW consumes through the match, SKIP TO FIRST/LAST <var> resumes
    AT the target row (inclusive — overlapping matches by design); a
    target equal to the match start raises exactly as the batch scan
    (and Flink) do."""
    if skip_to is not None:
        nav, tvar = skip_to
        rows_v = [i for vv, i in mp if vv == tvar]
        if not rows_v:
            return mp[-1][1] + 1
        t = rows_v[0] if nav == "FIRST" else rows_v[-1]
        if t <= 0:
            raise ValueError(
                f"AFTER MATCH SKIP TO {nav} {tvar}: the skip target IS "
                "the match start — resuming there would loop forever "
                "(Flink raises the same error)"
            )
        return t
    return mp[-1][1] + 1 if skip_past else 1


def _match_bounded(
    ast, window, var_bit, lim, cross_checks=None, val_at=None,
    next_checks=None,
):
    """Preferred match anchored at window index 0 — the SAME preference
    order as the batch NFA's AST generator backtracker
    (plans/match_recognize._lower_nfa match_from_ast): alternation
    branches left-first, quantifiers greedy (more repetitions first)
    unless lazy, zero-width repetitions skipped. Returns the match as a
    list of (var, window_index) or None. Row i satisfies variable v iff
    bit var_bit[v] is set in window[i][0], i <= lim (the WITHIN
    horizon), and its cross-variable conjuncts hold against the
    partial match (``cross_checks``: var -> [(self_col, op, other_var,
    other_col, nav)], values read through ``val_at(i, col)`` — the
    batch cross_ok, verbatim semantics: an unmatched reference or NULL
    operand is FALSE)."""

    def next_ok(v, i):
        """Physical NEXT(col, n) conjuncts of variable v at window row
        i — the decision wait guarantees i + n exists for every
        candidate row; a NULL operand (or one past the buffered
        window) compares FALSE, the batch NULL semantics."""
        if not next_checks:
            return True
        for lhs, op, rhs in next_checks.get(v, ()):

            def _side(sd):
                if sd[0] == "lit":
                    return sd[1]
                if sd[0] == "col":
                    return val_at(i, sd[1])
                j = i + sd[2]
                if j >= len(window):
                    return None
                return val_at(j, sd[1])

            a, b = _side(lhs), _side(rhs)
            if a is None or b is None:
                return False
            try:
                if not _CMP_OPS[op](a, b):
                    return False
            except TypeError:
                return False
        return True

    def cross_ok(v, i, acc):
        # the batch cross_ok, verbatim semantics: SELF refs include
        # the current candidate row (LAST(B.v, 1) in B's own DEFINE =
        # the previous B row); out-of-range / NULL operand -> FALSE
        if not cross_checks:
            return True
        for chk in cross_checks.get(v, ()):
            if chk[0] == "__rich__":
                # rich expression part (round 12): compiled by
                # plans.match_recognize.compile_rich_cross, evaluated
                # against the decision window's partial match exactly
                # like the batch NFA
                from ..plans.match_recognize import eval_rich_cross

                if not eval_rich_cross(
                    [(chk[1], chk[2])], v, i, acc, val_at
                ):
                    return False
                continue
            sc, op, ov, oc, nav, off = chk
            rows_o = [r for w, r in acc if w == ov]
            if ov == v:
                rows_o = rows_o + [i]
            if len(rows_o) <= off:
                return False
            ref = rows_o[off] if nav == "FIRST" else rows_o[-1 - off]
            a, b = val_at(i, sc), val_at(ref, oc)
            if a is None or b is None:
                return False
            try:
                if not _CMP_OPS[op](a, b):
                    return False
            except TypeError:
                return False
        return True

    def gen(node, i, acc):
        kind = node[0]
        if kind == "var":
            v = node[1]
            if (
                i <= lim
                and window[i][0] & (1 << var_bit[v])
                and next_ok(v, i)
                and cross_ok(v, i, acc)
            ):
                yield [(v, i)]
            return
        if kind == "seq":
            children = node[1]

            def seq_gen(idx, j, acc2):
                if idx == len(children):
                    yield []
                    return
                for head in gen(children[idx], j, acc2):
                    for rest in seq_gen(idx + 1, j + len(head), acc2 + head):
                        yield head + rest

            yield from seq_gen(0, i, acc)
            return
        if kind == "alt":
            for child in node[1]:
                yield from gen(child, i, acc)
            return
        if kind == "permute":
            # matched-set automaton — the batch generator's permute
            # branch, kept identical (plans/match_recognize
            # match_from_ast): declaration-order successor expansion =
            # lexicographic preference; dead-(row, mask) memo sound
            # only without cross-variable checks
            children = node[1]
            full = (1 << len(children)) - 1
            dead = set()
            use_memo = not cross_checks

            def p_gen(j, mask, acc2):
                if mask == full:
                    yield []
                    return
                if use_memo and (j, mask) in dead:
                    return
                produced = False
                for bi, ch in enumerate(children):
                    if mask & (1 << bi):
                        continue
                    for head in gen(ch, j, acc2):
                        for rest in p_gen(
                            j + len(head), mask | (1 << bi), acc2 + head
                        ):
                            produced = True
                            yield head + rest
                if use_memo and not produced:
                    dead.add((j, mask))

            yield from p_gen(i, 0, acc)
            return
        _, child, lo, hi, lazy = node

        def q_gen(j, done, acc2):
            # stop options follow the child's preference order — the
            # batch generator's zero-width hygiene, kept identical
            can_more = hi is None or done < hi
            yielded_stop = False
            if lazy and done >= lo:
                yield []
                yielded_stop = True
            if can_more:
                for head in gen(child, j, acc2):
                    if not head:
                        if not yielded_stop:
                            yield []
                            yielded_stop = True
                        continue
                    for rest in q_gen(j + len(head), done + 1, acc2 + head):
                        yield head + rest
            if not yielded_stop and done >= lo:
                yield []

        yield from q_gen(i, 0, acc)

    for mp in gen(ast, 0, []):
        if mp:
            return mp
    return None


#: time-bounded window safety valve: a key whose undecided window
#: exceeds this many rows raises loudly instead of growing state
#: silently (the analog of Flink's state-size alerts for a WITHIN
#: span x rate that outgrows the executor). Deployments whose genuine
#: break-free stretches exceed the default raise it via
#: SPARK_GRAFT_CEP_ROW_CAP (sized to rows-per-key that fit executor
#: memory) instead of editing code — the error message names the knob.
TIME_WINDOW_ROW_CAP = int(os.environ.get("SPARK_GRAFT_CEP_ROW_CAP", "4096"))


def bounded_nfa_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    var_flags: dict[str, str],
    pattern_vars: list[str],
    ast,
    skip_past: bool = False,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
    payload_spec: tuple | None = None,
    agg_spec: list | None = None,
    skip_to: tuple | None = None,
    cross_spec: tuple | None = None,
    prev_spec: tuple | None = None,
    next_spec: tuple | None = None,
    time_bounded: bool = False,
    break_decided: bool = False,
) -> DataFrame:
    """Streaming matcher for ANY BOUNDED pattern — quantifiers A{n,m} /
    A? / A{n}, alternation groups (A|B), quantified groups (A|B){n,m},
    NESTED groups, and PERMUTE (as an alternation of its variants) —
    with arbitrary, possibly overlapping row-local predicates.

    The pattern's maximum length Lmax is finite, so a window of the
    last Lmax rows per key decides every match start exactly: when the
    window is full, the start at its head either matches (the batch
    AST generator's preference order, run on the full window) or
    provably never will — later rows cannot join a match anchored
    there. SKIP TO NEXT ROW slides the window by one either way; SKIP
    PAST LAST ROW drops through the match's last row. State is
    O(distinct keys x (Lmax - 1)), the same contract as the
    fixed-sequence matcher; a start is decided once Lmax rows from it
    have arrived (at stream end, trailing starts with fewer rows stay
    undecided — the bounded analog of the run matchers' terminator
    contract). ``var_flags`` maps each pattern variable to its
    precompiled BOOLEAN flag column; ``payload_spec`` =
    ([(var, col), ...], {col: sql_type}) carries measure columns — a
    match emits each requested (var, col, nav) as
    ``{var}_{col}_{nav}`` from the variable's LAST (the Flink
    bare-Var.col binding) or FIRST matched row, NULL when the variable
    mapped no row. ``agg_spec`` =
    [(fn, var, col_or_None, alias, sql_type), ...] adds AGGREGATE
    measures (COUNT/SUM/AVG/MIN/MAX over the variable's matched rows —
    the full window is present, so they compute exactly; col None =
    COUNT(Var.*)). Emits (key, {var}_last_ts... [, {var}_{col}...,
    {agg aliases}...]).

    ``time_bounded=True``: the TIME-bounded variant for patterns with
    UNBOUNDED quantifiers under a WITHIN bound — no finite Lmax exists,
    but WITHIN W means a start at the window head is decided the moment
    a row with ts > head_ts + W arrives (in arrival order, every row
    that could still join a match anchored there has been seen — the
    same horizon rule as the batch lim). The window holds a VARIABLE
    number of rows in array-typed state: O(per-key rate x W), exactly
    the state Flink's CEP operator keeps for a WITHIN pattern, with a
    loud row cap (TIME_WINDOW_ROW_CAP) instead of silent growth.
    Trailing starts whose horizon never passes stay undecided at stream
    end — the same terminator contract as the row-bounded leg.

    ``break_decided=True``: the BREAK-ROW variant for UNBOUNDED
    patterns with NO WITHIN bound. Every matched row maps to some
    pattern variable, so no match can span a row whose flag mask is 0
    (a BREAK row — exclusions still map their rows): the head start is
    decided as soon as a break row sits in the window (matches anchored
    at the head are confined to the rows before it). State is the rows
    between breaks — O(longest break-free stretch) per key, exactly the
    partial-match state Flink CEP keeps for an unbounded quantifier,
    with the same loud row cap. A key whose predicates never all fail
    hits the cap instead of growing silently."""
    nchecks, ncols, max_next, ntypes = {}, [], 0, {}
    if next_spec is not None:
        nchecks, ncols, max_next, ntypes = next_spec
    var_state = time_bounded or break_decided
    if time_bounded and break_decided:
        raise ValueError("time_bounded and break_decided are exclusive")
    if time_bounded:
        if within_seconds is None:
            raise ValueError("time_bounded needs within_seconds")
        max_len, hist = 2, None
    elif break_decided:
        max_len, hist = 2, None
    else:
        max_len = ast_max_len(ast)
        if max_len < 2:
            raise ValueError("bounded pattern must span at least 2 rows")
        # NEXT lookahead defers each head decision by max_next rows,
        # so the retained window grows by the same amount
        hist = max_len - 1 + max_next
    var_bit = {v: i for i, v in enumerate(pattern_vars)}
    pay_pairs, pay_types = [], {}
    if payload_spec is not None:
        pay_pairs, pay_types = payload_spec
    aggs = list(agg_spec or [])
    # window rows store the union of payload and agg SOURCE columns;
    # source types come from the stream schema (agg out types differ)
    field_types = {
        f.name: f.dataType.simpleString() for f in stream_df.schema
    }
    agg_srcs = {c for _, _, c, _, _ in aggs if c is not None}
    cross_checks, cross_cols = (
        cross_spec if cross_spec is not None else (None, set())
    )
    wtypes = {
        **{c: field_types[c] for c in set(agg_srcs) | set(cross_cols)},
        **pay_types,
        **ntypes,
    }
    pcols = sorted(
        {c for _, c, _, _ in pay_pairs}
        | agg_srcs
        | set(cross_cols)
        | set(ncols)
    )
    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, " + ", ".join(
        [f"{v}_last_ts timestamp" for v in pattern_vars]
        + [
            f"{var}_{c}_{nav}{off or ''} {pay_types[c]}"
            for var, c, nav, off in pay_pairs
        ]
        + [f"{alias} {out_t}" for _, _, _, alias, out_t in aggs]
    )
    if var_state:
        state_schema = "ms array<long>, ss array<timestamp>" + "".join(
            f", w_{c} array<{wtypes[c]}>" for c in pcols
        )
    else:
        state_schema = ", ".join(
            f"m{i} long, s{i} timestamp"
            + "".join(f", w{i}_{c} {wtypes[c]}" for c in pcols)
            for i in range(1, hist + 1)
        )
    stride = 2 + len(pcols)
    flag_cols = [var_flags[v] for v in pattern_vars]
    pchecks, need_cols, max_prev = {}, [], 0
    if prev_spec is not None:
        pchecks, need_cols, max_prev, prev_col_types = prev_spec
        state_schema += ", " + _prev_schema_suffix(
            need_cols, max_prev, prev_col_types
        )

    def _decidable(window) -> bool:
        if time_bounded:
            # the head start is decided once a strictly LATER-than-
            # horizon row exists: every row with ts <= head + W has
            # arrived (arrival order)
            return (
                len(window) >= 2
                and (window[-1][1] - window[0][1]).total_seconds()
                > within_seconds
            )
        if break_decided:
            # the head start is decided once a BREAK row (flag mask 0)
            # sits in the window — no match can span it, so matches
            # anchored at the head are confined to the rows before the
            # first break; NEXT conjuncts additionally wait for their
            # targets (up to max_next rows past the last matchable row)
            if window and window[0][0] == 0:
                return True  # break at the head: no match anchors here
            for j in range(1, len(window)):
                if window[j][0] == 0:
                    return len(window) >= j + max_next
            return False
        return len(window) >= max_len + max_next

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        window: list[tuple] = []
        vhist: list[dict] = []
        if state.exists:
            vals = state.get
            if var_state:
                ms = list(vals[0] or [])
                ss = list(vals[1] or [])
                pv_arrays = [
                    list(vals[2 + ci] or []) for ci in range(len(pcols))
                ]
                window = [
                    (
                        ms[j],
                        ss[j],
                        tuple(arr[j] for arr in pv_arrays),
                    )
                    for j in range(len(ms))
                ]
                if max_prev:
                    vhist = _prev_load(
                        vals, stride, need_cols, max_prev
                    )
            else:
                window = [
                    (
                        vals[stride * i],
                        vals[stride * i + 1],
                        tuple(vals[stride * i + 2 : stride * (i + 1)]),
                    )
                    for i in range(hist)
                    if vals[stride * i] is not None
                ]
                if max_prev:
                    vhist = _prev_load(
                        vals, stride * hist, need_cols, max_prev
                    )
        out_rows: list[list] = []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            flags = [
                pdf[c].fillna(False).to_numpy(dtype=bool)
                for c in flag_cols
            ]
            ts_vals = list(pdf[ts_col])
            pay_vals = {c: list(pdf[c]) for c in pcols}
            need_vals = {c: list(pdf[c]) for c in need_cols}
            for r in range(len(pdf)):
                cur_vals = None
                if max_prev:
                    cur_vals = {
                        c: _scalar(need_vals[c][r]) for c in need_cols
                    }
                mask = 0
                for b in range(len(pattern_vars)):
                    pv = pattern_vars[b]
                    if flags[b][r] and (
                        not pchecks.get(pv)
                        or _prev_ok(pchecks[pv], cur_vals, vhist)
                    ):
                        mask |= 1 << b
                if max_prev:
                    vhist.append(cur_vals)
                    vhist = vhist[-max_prev:]
                window.append(
                    (
                        mask,
                        ts_vals[r],
                        tuple(_scalar(pay_vals[c][r]) for c in pcols),
                    )
                )
                while _decidable(window):
                    if break_decided and window[0][0] == 0:
                        # break row at the head: no match anchors here
                        window = window[1:]
                        continue
                    if within_seconds is None:
                        lim = len(window) - 1 - max_next
                    else:
                        t0 = window[0][1]
                        lim = 0
                        while (
                            lim + 1 < len(window)
                            and (
                                window[lim + 1][1] - t0
                            ).total_seconds()
                            <= within_seconds
                        ):
                            lim += 1
                        if not time_bounded:
                            # bounded pattern: a head-anchored match
                            # uses at most max_len rows, so NEXT
                            # targets past that are never consulted —
                            # without this cap a WITHIN span reaching
                            # the window end stalls the decision
                            # forever at stream end
                            lim = min(lim, max_len - 1)
                    if max_next and len(window) - 1 - lim < max_next:
                        # NEXT targets for rows near the horizon have
                        # not arrived yet — wait for more successors
                        break
                    mp = _match_bounded(
                        ast, window, var_bit, lim,
                        cross_checks=cross_checks,
                        val_at=lambda i, c: window[i][2][pcols.index(c)],
                        next_checks=nchecks or None,
                    )
                    if mp:
                        rows_of: dict[str, list[int]] = {}
                        for v, i in mp:
                            rows_of.setdefault(v, []).append(i)
                        row: list = []
                        for v in pattern_vars:
                            idxs = rows_of.get(v)
                            row.append(
                                window[idxs[-1]][1] if idxs else None
                            )
                        for var, c, nav, noff in pay_pairs:
                            idxs = rows_of.get(var) or []
                            row.append(
                                window[
                                    idxs[noff]
                                    if nav == "first"
                                    else idxs[-1 - noff]
                                ][2][pcols.index(c)]
                                if len(idxs) > noff
                                else None
                            )
                        for fn, var, c, _, _ in aggs:
                            idxs = rows_of.get(var, [])
                            if c is None:
                                row.append(
                                    len(idxs) if fn == "count" else None
                                )
                                continue
                            ci = pcols.index(c)
                            nn = [
                                window[i][2][ci]
                                for i in idxs
                                if window[i][2][ci] is not None
                            ]
                            if fn == "count":
                                row.append(len(nn))
                            elif not nn:
                                row.append(None)
                            elif fn == "sum":
                                row.append(sum(nn))
                            elif fn == "avg":
                                row.append(float(sum(nn)) / len(nn))
                            elif fn == "min":
                                row.append(min(nn))
                            else:
                                row.append(max(nn))
                        out_rows.append(row)
                        window = window[_skip_drop(mp, skip_past, skip_to):]
                    else:
                        window = window[1:]
        if var_state:
            if len(window) > TIME_WINDOW_ROW_CAP:
                raise ValueError(
                    f"WITHIN window for key {key[0]!r} holds "
                    f"{len(window)} undecided rows (> "
                    f"{TIME_WINDOW_ROW_CAP}): "
                    + (
                        "no BREAK row (a row matching no pattern "
                        "variable) arrived to bound the partial-match "
                        "state — add a WITHIN bound, raise "
                        "SPARK_GRAFT_CEP_ROW_CAP, or run the "
                        "statement in batch"
                        if break_decided
                        else "the per-key rate x WITHIN span outgrows "
                        "the streaming state bound — shorten WITHIN, "
                        "raise SPARK_GRAFT_CEP_ROW_CAP, or run the "
                        "statement in batch"
                    )
                )
            flat = [
                [m for m, _, _ in window],
                [ts for _, ts, _ in window],
                *[
                    [pv[ci] for _, _, pv in window]
                    for ci in range(len(pcols))
                ],
            ]
        else:
            flat = []
            for mask, ts, pv in window:
                flat += [mask, ts, *pv]
            while len(flat) < stride * hist:
                flat = [None] * stride + flat
        if max_prev:
            flat += _prev_flat(vhist, need_cols, max_prev)
        state.update(tuple(flat))
        if out_rows:
            data: dict = {key_col: [key[0]] * len(out_rows)}
            for ci, v in enumerate(pattern_vars):
                data[f"{v}_last_ts"] = [row[ci] for row in out_rows]
            off = len(pattern_vars)
            for j, (var, c, nav, noff) in enumerate(pay_pairs):
                data[f"{var}_{c}_{nav}{noff or ''}"] = [
                    row[off + j] for row in out_rows
                ]
            off += len(pay_pairs)
            for j, (_, _, _, alias, _) in enumerate(aggs):
                data[alias] = pd.Series(
                    [row[off + j] for row in out_rows], dtype=object
                )
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bounded_nfa_all_rows_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    var_flags: dict[str, str],
    pattern_vars: list[str],
    ast,
    src_cols: list[str],
    measures: list[tuple],
    measure_spec: dict,
    skip_past: bool = False,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
    skip_to: tuple | None = None,
    cross_checks: dict | None = None,
    prev_spec: tuple | None = None,
    next_spec: tuple | None = None,
    time_bounded: bool = False,
    break_decided: bool = False,
) -> DataFrame:
    """ALL ROWS PER MATCH for bounded patterns over a stream: the same
    Lmax-window decision procedure as ``bounded_nfa_stream``, but the
    window carries FULL source rows and a match emits one output row
    per matched input row — RUNNING measures by default (prefix scope,
    the Flink ALL ROWS default), FINAL on request, CLASSIFIER() /
    MATCH_NUMBER() (per-key counter held in the same state),
    aggregate measures, {- X -} exclusions, and WITH UNMATCHED ROWS
    (a row emits with NULL measures once its last possible covering
    start is decided). ``measures`` = [(var, col, alias), ...] with
    the sentinels from plans.match_recognize; ``measure_spec`` carries
    {"modes", "agg", "nav", "excluded", "with_unmatched", "out_types"}
    mirroring the batch NFA's emission exactly. State is
    O(keys x (Lmax - 1) x row width) plus one match counter — the
    Flink CEP ALL ROWS contract."""
    from ..plans.match_recognize import CLASSIFIER, MATCH_NUMBER

    nchecks, max_next = {}, 0
    if next_spec is not None:
        nchecks, _ncols, max_next, _ntypes = next_spec
    var_state = time_bounded or break_decided
    if time_bounded and break_decided:
        raise ValueError("time_bounded and break_decided are exclusive")
    if time_bounded:
        # WITHIN-horizon variant (see bounded_nfa_stream): unbounded
        # quantifiers allowed, variable-length array state bounded by
        # the WITHIN span x per-key rate with the loud row cap
        if within_seconds is None:
            raise ValueError("time_bounded needs within_seconds")
        max_len, hist = 2, None
    elif break_decided:
        # BREAK-ROW variant (see bounded_nfa_stream): unbounded
        # quantifiers with NO WITHIN — the head decides at the first
        # flag-mask-0 row; state = rows between breaks, loud cap
        max_len, hist = 2, None
    else:
        # NEXT under WITHIN is fine here: the within-lim caps at
        # max_len - 1, so decisions fire at max_len + max_next rows
        # and the fixed-slot state never overflows
        max_len = ast_max_len(ast)
        if max_len < 2:
            raise ValueError("bounded pattern must span at least 2 rows")
        hist = max_len - 1 + max_next
    var_bit = {v: i for i, v in enumerate(pattern_vars)}
    field_types = {
        f.name: f.dataType.simpleString() for f in stream_df.schema
    }
    modes = measure_spec.get("modes", {})
    agg = measure_spec.get("agg", {})
    nav = measure_spec.get("nav", {})
    nav_offset = measure_spec.get("nav_offset", {})
    excluded = set(measure_spec.get("excluded", ()))
    with_unmatched = bool(measure_spec.get("with_unmatched", False))
    out_types = measure_spec["out_types"]  # alias -> sql type
    out_schema = ", ".join(
        [f"{c} {field_types[c]}" for c in src_cols]
        + [f"{alias} {out_types[alias]}" for _, _, alias in measures]
    )
    # per window row: mask, covered flag, then the full source row
    stride = 2 + len(src_cols)
    if var_state:
        state_schema = (
            "mn long, ms array<long>, cs array<boolean>"
            + "".join(
                f", w_{c} array<{field_types[c]}>" for c in src_cols
            )
        )
    else:
        state_schema = "mn long, " + ", ".join(
            f"m{i} long, c{i} boolean"
            + "".join(f", w{i}_{c} {field_types[c]}" for c in src_cols)
            for i in range(1, hist + 1)
        )
    flag_cols = [var_flags[v] for v in pattern_vars]
    ts_idx = src_cols.index(ts_col)
    pchecks, need_cols, max_prev = {}, [], 0
    if prev_spec is not None:
        pchecks, need_cols, max_prev, prev_col_types = prev_spec
        state_schema += ", " + _prev_schema_suffix(
            need_cols, max_prev, prev_col_types
        )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # window rows: [mask, covered, (src values...)]
        window: list[list] = []
        vhist: list[dict] = []
        mn = 0
        if state.exists:
            vals = state.get
            mn = vals[0] or 0
            if var_state:
                ms = list(vals[1] or [])
                cs = list(vals[2] or [])
                col_arrays = [
                    list(vals[3 + ci] or [])
                    for ci in range(len(src_cols))
                ]
                window = [
                    [
                        ms[j],
                        bool(cs[j]),
                        tuple(arr[j] for arr in col_arrays),
                    ]
                    for j in range(len(ms))
                ]
                if max_prev:
                    vhist = _prev_load(
                        vals, 3 + len(src_cols), need_cols, max_prev
                    )
            else:
                for i in range(hist):
                    off = 1 + stride * i
                    if vals[off] is not None:
                        window.append(
                            [
                                vals[off],
                                bool(vals[off + 1]),
                                tuple(vals[off + 2 : off + stride]),
                            ]
                        )
                if max_prev:
                    vhist = _prev_load(
                        vals, 1 + stride * hist, need_cols, max_prev
                    )
        out_rows: list[list] = []

        def measure_row(mp, t, row_var):
            """Measure values for matched-row index t of match mp —
            the batch NFA's ALL ROWS emission, verbatim semantics."""
            vals_out = []
            for var, col, alias in measures:
                final = modes.get(alias, "RUNNING") == "FINAL"
                scope = mp if final else mp[: t + 1]
                vrows = [j for w, j in scope if w == var]
                if var == MATCH_NUMBER:
                    v = mn
                elif var == CLASSIFIER:
                    v = row_var
                elif alias in agg:
                    fn = agg[alias].lower()
                    if col == "*":
                        v = len(vrows) if fn == "count" else None
                    else:
                        ci = src_cols.index(col)
                        nn = [
                            window[j][2][ci]
                            for j in vrows
                            if window[j][2][ci] is not None
                        ]
                        if fn == "count":
                            v = len(nn)
                        elif not nn:
                            v = None
                        elif fn == "sum":
                            v = sum(nn)
                        elif fn == "avg":
                            v = float(sum(nn)) / len(nn)
                        elif fn == "min":
                            v = min(nn)
                        else:
                            v = max(nn)
                elif len(vrows) <= nav_offset.get(alias, 0):
                    # not reached yet / SQL:2016 offset past the mapped
                    # count -> NULL
                    v = None
                else:
                    noff = nav_offset.get(alias, 0)
                    j = (
                        vrows[noff]
                        if nav.get(alias) == "FIRST"
                        else vrows[-1 - noff]
                    )
                    v = window[j][2][src_cols.index(col)]
                vals_out.append(v)
            return vals_out

        def drop_head(k_rows: int):
            nonlocal window
            for row in window[:k_rows]:
                if with_unmatched and not row[1]:
                    out_rows.append(
                        list(row[2]) + [None] * len(measures)
                    )
            window = window[k_rows:]

        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            flags = [
                pdf[c].fillna(False).to_numpy(dtype=bool)
                for c in flag_cols
            ]
            src_vals = {c: list(pdf[c]) for c in src_cols}
            for r in range(len(pdf)):
                cur_vals = None
                if max_prev:
                    cur_vals = {
                        c: _scalar(src_vals[c][r]) for c in need_cols
                    }
                mask = 0
                for b in range(len(pattern_vars)):
                    pv = pattern_vars[b]
                    if flags[b][r] and (
                        not pchecks.get(pv)
                        or _prev_ok(pchecks[pv], cur_vals, vhist)
                    ):
                        mask |= 1 << b
                if max_prev:
                    vhist.append(cur_vals)
                    vhist = vhist[-max_prev:]
                window.append(
                    [
                        mask,
                        False,
                        tuple(_scalar(src_vals[c][r]) for c in src_cols),
                    ]
                )
                def _dec() -> bool:
                    if time_bounded:
                        return (
                            len(window) >= 2
                            and (
                                window[-1][2][ts_idx]
                                - window[0][2][ts_idx]
                            ).total_seconds()
                            > within_seconds
                        )
                    if break_decided:
                        if window and window[0][0] == 0:
                            return True
                        for j in range(1, len(window)):
                            if window[j][0] == 0:
                                return len(window) >= j + max_next
                        return False
                    return len(window) >= max_len + max_next

                while _dec():
                    if break_decided and window[0][0] == 0:
                        # break row at the head: no match anchors here
                        # (drop_head still emits it as unmatched when
                        # WITH UNMATCHED ROWS asks)
                        drop_head(1)
                        continue
                    if within_seconds is None:
                        lim = len(window) - 1 - max_next
                    else:
                        t0 = window[0][2][ts_idx]
                        lim = 0
                        while (
                            lim + 1 < len(window)
                            and (
                                window[lim + 1][2][ts_idx] - t0
                            ).total_seconds()
                            <= within_seconds
                        ):
                            lim += 1
                        if not time_bounded:
                            # bounded pattern: cap at max_len rows so
                            # a WITHIN span reaching the window end
                            # cannot stall the max_next wait forever
                            # at stream end (see bounded_nfa_stream)
                            lim = min(lim, max_len - 1)
                    if max_next and len(window) - 1 - lim < max_next:
                        break  # successors not yet arrived
                    mp = _match_bounded(
                        ast,
                        [(row[0], None, None) for row in window],
                        var_bit,
                        lim,
                        cross_checks=cross_checks,
                        val_at=lambda i, c: window[i][2][
                            src_cols.index(c)
                        ],
                        next_checks=nchecks or None,
                    )
                    if mp:
                        mn += 1
                        for j_var, j in mp:
                            window[j][1] = True
                        for t, (row_var, j) in enumerate(mp):
                            if row_var in excluded:
                                continue
                            out_rows.append(
                                list(window[j][2])
                                + measure_row(mp, t, row_var)
                            )
                        drop_head(_skip_drop(mp, skip_past, skip_to))
                    else:
                        drop_head(1)
        if var_state:
            if len(window) > TIME_WINDOW_ROW_CAP:
                raise ValueError(
                    f"WITHIN window for key {key[0]!r} holds "
                    f"{len(window)} undecided rows (> "
                    f"{TIME_WINDOW_ROW_CAP}): "
                    + (
                        "no BREAK row (a row matching no pattern "
                        "variable) arrived to bound the partial-match "
                        "state — add a WITHIN bound, raise "
                        "SPARK_GRAFT_CEP_ROW_CAP, or run the "
                        "statement in batch"
                        if break_decided
                        else "the per-key rate x WITHIN span outgrows "
                        "the streaming state bound — shorten WITHIN, "
                        "raise SPARK_GRAFT_CEP_ROW_CAP, or run the "
                        "statement in batch"
                    )
                )
            flat = [
                mn,
                [row[0] for row in window],
                [row[1] for row in window],
                *[
                    [row[2][ci] for row in window]
                    for ci in range(len(src_cols))
                ],
            ]
        else:
            flat = [mn]
            for mask, covered, vals_t in window:
                flat += [mask, covered, *vals_t]
            flat += [None] * (1 + stride * hist - len(flat))
        if max_prev:
            flat += _prev_flat(vhist, need_cols, max_prev)
        state.update(tuple(flat))
        if out_rows:
            data: dict = {}
            for ci, c in enumerate(src_cols):
                data[c] = pd.Series(
                    [row[ci] for row in out_rows], dtype=object
                )
            off = len(src_cols)
            for j, (_, _, alias) in enumerate(measures):
                data[alias] = pd.Series(
                    [row[off + j] for row in out_rows], dtype=object
                )
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def mid_run_flags_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    start_flag_col: str,
    run_flag_col: str,
    end_flag_col: str,
    tiebreak_col: str | None = None,
    prev_spec: tuple | None = None,
    payload_spec: tuple | None = None,
    agg_spec: list | None = None,
) -> DataFrame:
    """Streaming matcher for PATTERN (A B+ C) with ARBITRARY row-local
    predicates that may OVERLAP — the general-predicate funnel,
    reproducing the batch NFA's greedy backtracking under AFTER MATCH
    SKIP PAST LAST ROW with O(1) state per key:

    - after the A row, B rows extend the run greedily; a run row
      satisfying BOTH B and C is consumed as B but remembered as the
      latest backtrack candidate (``pend`` = that row as C, with the
      run snapshot before it);
    - when a row breaks the run (fails B): if it satisfies C the
      longest match emits (A, run, break row); else if ``pend`` is set
      the remembered candidate emits — rows between pend and the break
      row all fail C (pend is the LAST C-satisfying run row), so no
      alternative start inside them can complete before the break row
      kills every remainder run, making the reset exact; either way
      the break row is then re-examined as a fresh A start (with
      overlapping predicates it may open the next match).

    Leftmost-start priority resolves overlap: a row satisfying A and B
    while a candidate is open is consumed as B (continuing the earliest
    start); if that candidate dies without a match, every start inside
    its span is provably doomed too (its B rows' C-windows are subsets
    of the dead candidate's), so the O(1) single-candidate machine
    equals the batch NFA. A match is finalized only when a row fails B
    — the same longest-match-needs-a-terminator contract as
    ``run_flags_stream``. WITHIN is not supported (a too-old A would
    need re-anchoring to starts inside the run — unbounded state); the
    router rejects it loudly. ``prev_spec`` adds physical PREV(col, n)
    comparison conjuncts per flag (start, run, end), evaluated against
    the last max(n) rows kept in the same state. ``payload_spec`` =
    ([(role, col), ...], {col: sql_type}) with role "start" (the A
    row), "last"/"last{j}" (the run's final B row / the j-th before it
    — SQL:2016 LAST(B.col, j), read from the last K+1 run-row payload
    history where K is the largest offset, a compile-time state bound,
    with a pend snapshot so the backtracked candidate reads its own
    rows; round 9), "first"/"first{j}" (the run's first rows, gated by
    the emitted match's run length) or "end" (the C row), emitted as
    ``{role}_{c}``. Emits (key, a_ts, run_len, run_last_ts, end_ts
    [, start_*/last_*/first_*/end_*...])."""
    pay_pairs, pay_types = [], {}
    if payload_spec is not None:
        pay_pairs, pay_types = payload_spec
    aggs = list(agg_spec or [])
    single_agg_cols = {
        c
        for _, role, c, _, _ in aggs
        if role in ("start", "end") and c is not None
    }
    arun_cols = sorted(
        {c for _, role, c, _, _ in aggs if role == "run" and c is not None}
    )
    pcols = sorted({c for _, c in pay_pairs} | single_agg_cols)

    def _role(role: str) -> tuple[str, int]:
        m = re.fullmatch(r"(start|last|first|end)(\d*)", role)
        if m is None:
            raise ValueError(f"funnel matcher payload role {role!r}")
        return m.group(1), int(m.group(2) or 0)

    roles = [(_role(role), c) for role, c in pay_pairs]
    # K: largest logical offset on the B+ run — the history depth kept
    # in state (compile-time bound; 0 = classic single slots)
    K = max((off for (_, off), _ in roles), default=0)
    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, a_ts timestamp, run_len long, "
        "run_last_ts timestamp, end_ts timestamp"
        + "".join(f", {role}_{c} {pay_types[c]}" for role, c in pay_pairs)
        + "".join(f", {alias} {out_t}" for _, _, _, alias, out_t in aggs)
    )
    state_schema = (
        "phase int, a_ts timestamp, run_last timestamp, run_len long, "
        "pend timestamp, pend_run_last timestamp, pend_run_len long"
        # payloads: A row (ap), last K+1 run rows (rl), their pend
        # snapshot (pl), the pend row (pe), first K+1 run rows (fb)
        + "".join(f", ap_{c} {pay_types[c]}" for c in pcols)
        + "".join(
            f", {tag}{i}_{c} {pay_types[c]}"
            for tag in ("rl", "pl", "fb")
            for i in range(K + 1)
            for c in pcols
        )
        + "".join(f", pe_{c} {pay_types[c]}" for c in pcols)
    )
    npay = len(pcols)
    hist_w = npay * (K + 1)
    base_off = 7
    n_ac = len(arun_cols)
    agg_state = bool(aggs)
    if agg_state:
        state_schema += "".join(
            f", {t}_{c} {ty}"
            for c in arun_cols
            for t, ty in (
                ("ac", "long"), ("asm", "double"),
                ("amn", "double"), ("amx", "double"),
                ("qc", "long"), ("qsm", "double"),
                ("qmn", "double"), ("qmx", "double"),
            )
        )
    agg_off = base_off + 2 * npay + 3 * hist_w
    agg_width = 8 * n_ac if agg_state else 0
    checks_per_flag, need_cols, max_prev = [], [], 0
    if prev_spec is not None:
        checks_per_flag, need_cols, max_prev, col_types = prev_spec
        state_schema += ", " + _prev_schema_suffix(
            need_cols, max_prev, col_types
        )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        vhist: list[dict] = []
        none_pay = (None,) * npay
        ap_pay = pe_pay = none_pay
        rl_hist: list[tuple] = []
        pl_hist: list[tuple] = []
        fb_hist: list[tuple] = []

        def _load_hist(vals, off, n):
            # lengths derive from the TRACKED run lengths, never from
            # None-sniffing (an all-NULL payload row keeps its slot)
            return [
                tuple(vals[off + i * npay : off + (i + 1) * npay])
                for i in range(n)
            ]

        if state.exists:
            vals = state.get
            (
                phase, a_ts, run_last, run_len,
                pend, pend_run_last, pend_run_len,
            ) = vals[:7]
            if npay:
                ap_pay = tuple(vals[7 : 7 + npay])
                n_live = 0 if phase != 2 else min(run_len or 0, K + 1)
                n_pend = (
                    0 if pend is None else min(pend_run_len or 0, K + 1)
                )
                rl_hist = _load_hist(vals, 7 + npay, n_live)
                pl_hist = _load_hist(vals, 7 + npay + hist_w, n_pend)
                fb_hist = _load_hist(
                    vals, 7 + npay + 2 * hist_w, n_live
                )
                pe_pay = tuple(
                    vals[7 + npay + 3 * hist_w :
                         7 + npay + 3 * hist_w + npay]
                )
        else:
            phase, a_ts, run_last, run_len = 0, None, None, 0
            pend, pend_run_last, pend_run_len = None, None, 0
        acc = {c: [0, 0.0, None, None] for c in arun_cols}
        pacc = {c: [0, 0.0, None, None] for c in arun_cols}
        if state.exists and agg_state:
            vals0 = state.get
            for i, c in enumerate(arun_cols):
                base = agg_off + 8 * i
                acc[c] = [
                    vals0[base] or 0, vals0[base + 1] or 0.0,
                    vals0[base + 2], vals0[base + 3],
                ]
                pacc[c] = [
                    vals0[base + 4] or 0, vals0[base + 5] or 0.0,
                    vals0[base + 6], vals0[base + 7],
                ]
        if state.exists and max_prev:
            vhist = _prev_load(
                state.get, agg_off + agg_width, need_cols, max_prev
            )

        def _acc_add(c, v):
            if v is None:
                return
            a = acc[c]
            v = float(v)
            a[0] += 1
            a[1] += v
            a[2] = v if a[2] is None else min(a[2], v)
            a[3] = v if a[3] is None else max(a[3], v)
        a_out, len_out, last_out, end_out = [], [], [], []
        # per match: (start_pay, last_hist, end_pay, first_hist, mlen)
        pays: list[tuple] = []
        agg_outs: list[list] = []
        for pdf in batches:
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            fa_arr = pdf[start_flag_col].fillna(False).to_numpy(dtype=bool)
            fb_arr = pdf[run_flag_col].fillna(False).to_numpy(dtype=bool)
            fc_arr = pdf[end_flag_col].fillna(False).to_numpy(dtype=bool)
            ts_vals = list(pdf[ts_col])
            need_vals = {c: list(pdf[c]) for c in need_cols}
            pay_vals = {c: list(pdf[c]) for c in pcols}
            arun_vals = {c: list(pdf[c]) for c in arun_cols}
            for r in range(len(pdf)):
                fa, fb, fc = fa_arr[r], fb_arr[r], fc_arr[r]
                cur_ts = ts_vals[r]
                cur_pay = (
                    tuple(_scalar(pay_vals[c][r]) for c in pcols)
                    if npay
                    else none_pay
                )
                if max_prev:
                    cur_vals = {
                        c: _scalar(need_vals[c][r]) for c in need_cols
                    }
                    if fa and checks_per_flag[0]:
                        fa = _prev_ok(checks_per_flag[0], cur_vals, vhist)
                    if fb and checks_per_flag[1]:
                        fb = _prev_ok(checks_per_flag[1], cur_vals, vhist)
                    if fc and checks_per_flag[2]:
                        fc = _prev_ok(checks_per_flag[2], cur_vals, vhist)
                    vhist.append(cur_vals)
                    vhist = vhist[-max_prev:]
                if phase == 2:
                    if fb:
                        if fc:
                            # backtrack candidate: this row as C, run
                            # snapshot BEFORE consuming it as B
                            pend = cur_ts
                            pend_run_last, pend_run_len = run_last, run_len
                            pl_hist, pe_pay = list(rl_hist), cur_pay
                            if agg_state:
                                pacc = {
                                    c: list(acc[c]) for c in arun_cols
                                }
                        run_last, run_len = cur_ts, run_len + 1
                        rl_hist = (rl_hist + [cur_pay])[-(K + 1):]
                        if len(fb_hist) <= K:
                            fb_hist.append(cur_pay)
                        if agg_state:
                            for c in arun_cols:
                                _acc_add(c, _scalar(arun_vals[c][r]))
                        continue
                    if fc:
                        a_out.append(a_ts)
                        len_out.append(run_len)
                        last_out.append(run_last)
                        end_out.append(cur_ts)
                        pays.append(
                            (ap_pay, rl_hist, cur_pay, fb_hist, run_len)
                        )
                        if agg_state:
                            agg_outs.append(
                                _agg_finalize(
                                    aggs, pcols, run_len, acc,
                                    {"start": ap_pay, "end": cur_pay},
                                )
                            )
                            acc = {
                                c: [0, 0.0, None, None]
                                for c in arun_cols
                            }
                        phase, a_ts, run_last, run_len = 0, None, None, 0
                        pend, pend_run_last, pend_run_len = None, None, 0
                        rl_hist, pl_hist, fb_hist = [], [], []
                        continue
                    if pend is not None:
                        a_out.append(a_ts)
                        len_out.append(pend_run_len)
                        last_out.append(pend_run_last)
                        end_out.append(pend)
                        # the pend run started at the SAME first B
                        # row, so fb_hist carries over; entries past
                        # the backtracked length gate off via mlen
                        pays.append(
                            (ap_pay, pl_hist, pe_pay, fb_hist,
                             pend_run_len)
                        )
                        if agg_state:
                            agg_outs.append(
                                _agg_finalize(
                                    aggs, pcols, pend_run_len, pacc,
                                    {"start": ap_pay, "end": pe_pay},
                                )
                            )
                    phase, a_ts, run_last, run_len = 0, None, None, 0
                    pend, pend_run_last, pend_run_len = None, None, 0
                    rl_hist, pl_hist, fb_hist = [], [], []
                    if agg_state:
                        acc = {
                            c: [0, 0.0, None, None] for c in arun_cols
                        }
                    # the break row may itself open the next match
                    if fa:
                        phase, a_ts, ap_pay = 1, cur_ts, cur_pay
                    continue
                if phase == 1:
                    if fb:
                        phase, run_last, run_len = 2, cur_ts, 1
                        rl_hist = [cur_pay]
                        fb_hist = [cur_pay]
                        if agg_state:
                            acc = {
                                c: [0, 0.0, None, None]
                                for c in arun_cols
                            }
                            for c in arun_cols:
                                _acc_add(c, _scalar(arun_vals[c][r]))
                    elif fa:
                        a_ts, ap_pay = cur_ts, cur_pay
                    else:
                        phase, a_ts = 0, None
                    continue
                if fa:
                    phase, a_ts, ap_pay = 1, cur_ts, cur_pay
        st = [phase, a_ts, run_last, run_len, pend, pend_run_last,
              pend_run_len]
        if npay:

            def _flat_hist(hist):
                pad = [none_pay] * (K + 1 - len(hist))
                flat: list = []
                for tup in list(hist) + pad:
                    flat += list(tup)
                return flat

            st += (
                list(ap_pay) + _flat_hist(rl_hist) + _flat_hist(pl_hist)
                + _flat_hist(fb_hist) + list(pe_pay)
            )
        if agg_state:
            for c in arun_cols:
                st += list(acc[c]) + list(pacc[c])
        if max_prev:
            st += _prev_flat(vhist, need_cols, max_prev)
        state.update(tuple(st))
        if a_out:
            data = {
                key_col: [key[0]] * len(a_out),
                "a_ts": a_out,
                "run_len": len_out,
                "run_last_ts": last_out,
                "end_ts": end_out,
            }
            for ((base, off), c), (role, _c2) in zip(roles, pay_pairs):
                ci = pcols.index(c)

                def val(p, base=base, off=off, ci=ci):
                    start_pay, last_hist, end_pay, first_hist, mlen = p
                    if base == "start":
                        return start_pay[ci] if off == 0 else None
                    if base == "end":
                        return end_pay[ci] if off == 0 else None
                    if mlen <= off:
                        return None  # offset past the mapped run rows
                    if base == "first":
                        return first_hist[off][ci]
                    return last_hist[-1 - off][ci]

                data[f"{role}_{c}"] = [val(p) for p in pays]
            for j, (_, _, _, alias, _) in enumerate(aggs):
                data[alias] = pd.Series(
                    [row[j] for row in agg_outs], dtype=object
                )
            yield pd.DataFrame(data)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def topn_stream(
    stream_df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    descending: bool,
    n: int,
) -> DataFrame:
    """Continuous (non-windowed) Top-N — Flink's Top-N operator: per
    key, keep the N best rows seen so far in keyed state and emit the
    key's CURRENT top-N (with ranks) whenever it changes — update
    changelog semantics; a downstream upsert sink keyed by
    (keys, rn) holds exactly the live top-N. State is O(keys x N x
    row width), the identical bound Flink documents for its
    AppendFastStrategy. NULL order values sort as the SMALLEST value in
    both directions — Spark's default null ordering (ASC NULLS FIRST,
    DESC NULLS LAST), so the ranking matches the batch ROW_NUMBER plan
    this operator replaces. Ranks tie-break by the full row tuple for
    determinism when the row is totally comparable (falling back to
    arrival order if some non-order column type is not); the ranking
    matches a batch ROW_NUMBER exactly only when the order columns are
    key-unique, as any Top-N contract requires.
    Emits every source column + ``rn``."""
    src_cols = stream_df.columns
    field_types = {
        f.name: f.dataType.simpleString() for f in stream_df.schema
    }
    out_schema = ", ".join(
        [f"{c} {field_types[c]}" for c in src_cols] + ["rn int"]
    )
    state_schema = ", ".join(
        f"r{i}_{c} {field_types[c]}"
        for i in range(n)
        for c in src_cols
    )
    width = len(src_cols)
    oidx = [src_cols.index(c) for c in order_cols]
    # a NULL anywhere in an integral column makes pandas deliver the
    # whole column as float64 — coerce survivors back to int, or the
    # int-typed state field silently drops them on the next restore
    _ints = [
        field_types[c] in ("tinyint", "smallint", "int", "bigint")
        for c in src_cols
    ]

    def _typed(r) -> tuple:
        return tuple(
            int(s) if (isint and s is not None) else s
            for s, isint in zip((_scalar(v) for v in r), _ints)
        )

    def null_safe(vals):
        # NULL = smallest in both directions (Spark default: ASC NULLS
        # FIRST, DESC NULLS LAST — both mean "null is the smallest
        # value"); flags compare before values, so mixed (0, None-slot)
        # vs (1, typed-value) never compares across types
        return tuple((v is not None, 0 if v is None else v) for v in vals)

    def sort_key(row: tuple):
        # order columns first, then the full row as deterministic
        # tie-break
        return null_safe([row[i] for i in oidx] + list(row))

    def sort_key_orders_only(row: tuple):
        return null_safe(row[i] for i in oidx)

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        top: list[tuple] = []
        if state.exists:
            vals = state.get
            for i in range(n):
                row = tuple(vals[width * i : width * (i + 1)])
                if any(v is not None for v in row):
                    top.append(row)
        before = list(top)
        for pdf in batches:
            for r in pdf[src_cols].itertuples(index=False):
                top.append(_typed(r))
        try:
            top.sort(key=sort_key, reverse=descending)
        except TypeError:
            # a non-order tie-break column is not totally comparable
            # (e.g. arrays with nested nulls): rank by the order
            # columns alone, ties staying in arrival order (stable sort)
            top.sort(key=sort_key_orders_only, reverse=descending)
        top = top[:n]
        flat: list = []
        for row in top:
            flat += list(row)
        flat += [None] * (width * n - len(flat))
        state.update(tuple(flat))
        if top != before:
            data = {
                c: pd.Series(
                    [row[ci] for row in top], dtype=object
                )
                for ci, c in enumerate(src_cols)
            }
            data["rn"] = list(range(1, len(top) + 1))
            yield pd.DataFrame(data)

    return stream_df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- PREV-navigation support for the flag matchers -------------------------
#
# Physical PREV(col, n) comparisons cannot be materialized by a separate
# stateful lag pre-pass (Spark rejects two chained applyInPandasWithState
# operators in one streaming query), so the flag matchers evaluate them
# INSIDE their keyed state: a ``prev_spec`` carries, per flag column, the
# comparison conjuncts referencing preceding partition rows, and the
# matcher keeps the needed columns of the last max(n) rows alongside its
# match state. Semantics mirror the batch lowering's lag helper columns:
# a reference before the partition head is NULL and any comparison with
# it is FALSE.
#
# prev_spec = (checks_per_flag, need_cols, max_prev, col_types) where
# checks_per_flag[i] is a list of (lhs, op, rhs) and each operand is
# ("col", name) | ("prev", name, n) | ("lit", value).

_CMP_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
}


def _scalar(v):
    """numpy/pandas scalar -> plain python (None for NaN/NaT) for the
    GroupState tuple and for type-stable comparisons."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, pd.Timestamp):
        try:
            return item()
        except (TypeError, ValueError):
            return v
    return v


def _prev_schema_suffix(need_cols, max_prev, col_types):
    """State fields appended after a matcher's own: a valid-row count
    (a real history row may be all-NULL, so presence can't be inferred
    from values) then max_prev rows x need_cols, oldest first."""
    return ", ".join(
        ["__ph_n int"]
        + [
            f"__ph{i}_{c} {col_types[c]}"
            for i in range(max_prev)
            for c in need_cols
        ]
    )


def _prev_load(vals, offset, need_cols, max_prev):
    """Rebuild the value history (list of col->value dicts, oldest
    first) from the state tuple starting at ``offset``."""
    ncols = len(need_cols)
    hn = vals[offset] or 0
    hist = []
    for i in range(max_prev - hn, max_prev):
        row = vals[offset + 1 + i * ncols : offset + 1 + (i + 1) * ncols]
        hist.append(dict(zip(need_cols, row)))
    return hist


def _prev_flat(hist, need_cols, max_prev):
    """Flatten the history back to the state-tuple suffix."""
    flat: list = [len(hist)]
    pad = max_prev - len(hist)
    flat += [None] * (pad * len(need_cols))
    for row in hist:
        flat += [row[c] for c in need_cols]
    return flat


def _next_ok(nxt_checks, seq, pcols):
    """Evaluate a candidate window's NEXT conjuncts. ``nxt_checks[vi]``
    holds variable vi's (lhs, op, rhs) comparisons; a ("next", col, n)
    operand reads window row vi+n (the engine guarantees vi+n stays
    inside the window), a ("col", name) operand reads row vi itself.
    NULL operands make the comparison false — the batch semantics."""
    if not nxt_checks:
        return True
    for vi, checks in enumerate(nxt_checks):
        for lhs, op, rhs in checks:

            def operand(spec):
                if spec[0] == "lit":
                    return spec[1]
                pos = vi if spec[0] == "col" else vi + spec[2]
                return seq[pos][2][pcols.index(spec[1])]

            a, b = operand(lhs), operand(rhs)
            if a is None or b is None:
                return False
            try:
                if not _CMP_OPS[op](a, b):
                    return False
            except TypeError:
                return False
    return True


def _prev_ok(checks, cur, hist):
    """Evaluate a flag's PREV conjuncts: cur = current row's needed
    values, hist = preceding rows (oldest first). NULL operands (or a
    reference before the partition head) make the comparison false —
    the batch NULL-comparison semantics."""

    def operand(spec):
        kind = spec[0]
        if kind == "lit":
            return spec[1]
        if kind == "col":
            return cur[spec[1]]
        n = spec[2]
        if len(hist) < n:
            return None
        return hist[-n][spec[1]]

    for lhs, op, rhs in checks:
        a, b = operand(lhs), operand(rhs)
        if a is None or b is None:
            return False
        try:
            if not _CMP_OPS[op](a, b):
                return False
        except TypeError:
            return False
    return True
