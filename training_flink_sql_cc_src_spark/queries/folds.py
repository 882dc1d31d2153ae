"""Fold suites: one driver row attesting a whole family of shapes.

Round 11's verdict (#3) flagged the driver-rotation arithmetic: 236
registry names with ~50 driver slots per round is a 4.7-round recheck
cycle — saturating the rotation's own "evidence no older than
current-4" guard, with no headroom to add operators. The registry's
MATCH_RECOGNIZE / scalar-function / window-SQL families each carry many
near-duplicate entries whose value is breadth of SHAPE coverage, not
breadth of code path; this module folds those shapes into parameterized
multi-shape suite queries so ONE driver row (hash-checked against a
DuckDB oracle built from the SAME member oracles) attests the whole set,
and the member entries leave the driver-facing registry (they stay
registered — bench, scale runs, and tests/test_oracle_parity.py still
exercise each one individually through ``all_queries()``).

Mechanics: each member's result is canonicalized to a single
``row_repr`` string — every column COALESCE'd through a NULL sentinel,
doubles mapped through ``floor(x * 1e6)`` (identical doubles floor
identically in both engines; no rounding-rule ambiguity), everything
else CAST to string — then tagged with the member name and UNION ALL'd.
The oracle applies the SAME canonicalization on top of each member's
registered oracle SQL, so the fold inherits full per-row, per-column
fidelity: any member regression changes its row_reprs and fails the
fold's hash. Column order and kinds are pinned in ``SPECS`` (generated
from the members' driver-verified schemas); a member whose output
schema drifts from its spec raises loudly rather than hashing garbage.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import registry
from ..registry import register

# the fold oracles are built FROM the members' registered oracle SQL,
# so the member modules are a hard import dependency (this also makes
# importing queries.folds directly — e.g. from a test — order-safe)
from . import scalar_fns, time_windows  # noqa: F401  (self-register)

#: NULL sentinel: a code point that never appears in fixture data, so a
#: NULL can never collide with a real value under concat_ws.
_NULL = "\u2400"

#: fold -> member -> [(column, kind)]; kind "f6" = double via
#: floor(x*1e6) -> BIGINT, "str" = CAST AS STRING. Generated from the
#: members' actual output schemas at sf0.001 (see module docstring).
SPECS: dict[str, dict[str, list[tuple[str, str]]]] = {
    "pattern_mr_fold_quantifiers": {
        "pattern_match_recognize_plus": [("user_id", "str"), ("last_click_epoch", "str"), ("purchase_epoch", "str")],
        "pattern_match_recognize_star": [("user_id", "str"), ("first_click_epoch", "str"), ("signup_epoch", "str")],
        "pattern_match_recognize_opt": [("user_id", "str"), ("view_epoch", "str"), ("purchase_epoch", "str"), ("n_view", "str")],
        "pattern_match_recognize_quant": [("user_id", "str"), ("last_click_epoch", "str"), ("last_click_id", "str"), ("purchase_epoch", "str")],
        "pattern_match_recognize_group_quant": [("user_id", "str"), ("view_event", "str"), ("n_click", "str"), ("n_error", "str"), ("purchase_event", "str")],
        "pattern_match_recognize_mid_plus": [("user_id", "str"), ("view_event", "str"), ("n_clicks", "str"), ("purchase_event", "str")],
        "pattern_match_recognize_all_rows_quant": [("user_id", "str"), ("row_epoch", "str"), ("cls", "str")],
    },
    "pattern_mr_fold_alt_nav": {
        "pattern_match_recognize_alt": [("user_id", "str"), ("view_epoch", "str"), ("click_epoch", "str"), ("error_epoch", "str"), ("cls", "str")],
        "pattern_match_recognize_multi_alt": [("user_id", "str"), ("view_epoch", "str"), ("click_epoch", "str"), ("outcome_epoch", "str"), ("cls", "str")],
        "pattern_match_recognize_nested": [("user_id", "str"), ("view_event", "str"), ("n_pairs", "str"), ("error_event", "str")],
        "pattern_match_recognize_nav": [("user_id", "str"), ("start_epoch", "str"), ("start_value", "f6"), ("n_down", "str"), ("recovery_value", "f6"), ("recovery_epoch", "str")],
        "pattern_match_recognize_next": [("user_id", "str"), ("a_event", "str"), ("b_event", "str"), ("b_value", "f6")],
        "pattern_match_recognize_prev": [("user_id", "str"), ("view_epoch", "str"), ("view_value", "f6"), ("click_value", "f6")],
        "pattern_match_recognize_prev_run": [("user_id", "str"), ("first_down", "str"), ("n_down", "str"), ("recovery_event", "str"), ("recovery_value", "f6")],
    },
    "pattern_mr_fold_rows_skip": {
        "pattern_match_recognize_all_rows": [("user_id", "str"), ("row_epoch", "str"), ("row_event_id", "str"), ("cls", "str"), ("view_epoch", "str"), ("click_epoch", "str")],
        "pattern_match_recognize_all_rows_plus": [("user_id", "str"), ("event_id", "str"), ("value", "f6"), ("cls", "str"), ("mn", "str"), ("n_a", "str"), ("b_value", "f6")],
        "pattern_match_recognize_skip_past": [("user_id", "str"), ("first_click", "str"), ("n_clicks", "str"), ("purchase_event", "str")],
        "pattern_match_recognize_skip_to": [("user_id", "str"), ("a_event", "str"), ("n_b", "str"), ("last_b", "str")],
        "pattern_match_recognize_overlap": [("user_id", "str"), ("start_event", "str"), ("end_event", "str"), ("n_a", "str")],
        "pattern_match_recognize_unmatched": [("user_id", "str"), ("row_event_id", "str"), ("cls", "str"), ("view_epoch", "str")],
        "pattern_match_recognize_measure_nav": [("user_id", "str"), ("f0", "f6"), ("f1", "f6"), ("l1", "f6"), ("l3", "f6"), ("n_run", "str"), ("end_event", "str")],
    },
    "pattern_mr_fold_binding": {
        "pattern_match_recognize_crossvar": [("user_id", "str"), ("click_epoch", "str"), ("click_value", "f6"), ("purchase_epoch", "str"), ("purchase_value", "f6")],
        "pattern_match_recognize_crossvar_run": [("user_id", "str"), ("first_low", "str"), ("run_len", "str"), ("spike_event", "str"), ("spike_value", "f6")],
        "pattern_match_recognize_permute": [("user_id", "str"), ("view_event", "str"), ("click_event", "str"), ("purchase_event", "str")],
        "pattern_match_recognize_permute5": [("user_id", "str"), ("view_event", "str"), ("click_event", "str"), ("purchase_event", "str"), ("signup_event", "str"), ("error_event", "str")],
        "pattern_match_recognize_vshape": [("user_id", "str"), ("start_epoch", "str"), ("start_value", "f6"), ("bottom_value", "f6"), ("end_value", "f6"), ("n_down", "str"), ("n_up", "str")],
        "pattern_match_recognize_agg": [("user_id", "str"), ("n_clicks", "str"), ("min_click_value", "f6"), ("max_click_value", "f6"), ("purchase_epoch", "str")],
        "pattern_match_recognize_self_nav": [("user_id", "str"), ("start_event", "str"), ("n_run", "str"), ("last_b_event", "str")],
        "pattern_match_recognize_mod_define": [("user_id", "str"), ("a_event", "str"), ("a_value", "f6"), ("b_event", "str"), ("b_value", "f6")],
    },
    "scalar_fold_core": {
        "scalar_string": [("custkey", "str"), ("tag", "str"), ("name_prefix", "str"), ("name_id_str", "str"), ("name_len", "str"), ("short_name", "str"), ("trimmed", "str"), ("digits", "str"), ("is_customer", "str")],
        "scalar_datetime": [("order_id", "str"), ("yr", "str"), ("mo", "str"), ("dy", "str"), ("hr", "str"), ("dow_sun1", "str"), ("ym", "str"), ("month_start_epoch", "str"), ("days_since_2024", "str"), ("due_date", "str")],
        "scalar_math": [("orderkey", "str"), ("linenumber", "str"), ("abs_disc", "f6"), ("ceil_price", "str"), ("floor_price", "str"), ("qty_sq", "f6"), ("key_mod7", "str"), ("qty_hi", "f6"), ("tax_lo", "f6"), ("sqrt_qty", "f6"), ("sign_disc", "f6")],
        "scalar_conditional": [("order_id", "str"), ("price_band", "str"), ("status_label", "str"), ("is_top_priority", "str")],
        "scalar_bitwise": [("orderkey", "str"), ("low_byte", "str"), ("with_flag", "str"), ("xored", "str"), ("shl2", "str"), ("shr3", "str"), ("popcount", "str")],
        "scalar_null_semantics": [("orderkey", "str"), ("s_null", "str"), ("coalesced", "str"), ("distinct_from", "str"), ("null_safe_is_null", "str"), ("bad_cast", "str"), ("guarded", "str")],
        "scalar_decimal_arithmetic": [("orderkey", "str"), ("price_dec", "f6"), ("with_tax", "f6"), ("doubled", "f6"), ("rounded_dec", "f6"), ("mod_100", "f6")],
    },
    "scalar_fold_nested": {
        "scalar_array_struct": [("nationkey", "str"), ("arr_len", "str"), ("arr_first", "str"), ("has_two", "str"), ("struct_k", "str"), ("region_map", "str")],
        "scalar_array_advanced": [("nationkey", "str"), ("sorted_arr", "str"), ("flat", "str"), ("sliced", "str"), ("pos30", "str"), ("seq_arr", "str"), ("weighted_sum", "str")],
        "scalar_map_functions": [("nationkey", "str"), ("mkeys", "str"), ("mvals", "str"), ("rk_lookup", "str"), ("msize", "str"), ("has_nk", "str"), ("nk_not_null", "str")],
        "scalar_json": [("event_id", "str"), ("k_str", "str"), ("k_int", "str"), ("missing", "str")],
        "scalar_json_struct": [("event_id", "str"), ("k_parsed", "str"), ("k_doubled", "str"), ("has_k", "str")],
        "scalar_string_extended": [("nationkey", "str"), ("padded", "str"), ("rpadded", "str"), ("reversed", "str"), ("first_code", "str"), ("letter", "str"), ("rep2x3", "str"), ("l3", "str"), ("r3", "str"), ("has_an", "str"), ("starts_a", "str"), ("ends_a", "str"), ("a_pos", "str")],
        "scalar_string_datetime_extras": [("doc_id", "str"), ("devoweled", "str"), ("the_pos", "str"), ("l_trimmed", "str"), ("r_trimmed", "str"), ("lang_b64", "str"), ("source_hex", "str"), ("word_count", "str")],
    },
    "window_fold_sql_variants": {
        "window_cumulate_offset_sql": [("window_start", "str"), ("window_end", "str"), ("n_events", "str")],
        "window_dedup_first": [("window_start", "str"), ("user_id", "str"), ("first_ts_epoch", "str"), ("first_event_id", "str")],
        "window_dedup_sql": [("window_start", "str"), ("user_id", "str"), ("first_ts_epoch", "str"), ("first_event_id", "str")],
        "window_distinct_users": [("window_start", "str"), ("event_type", "str"), ("n_users", "str"), ("n_events", "str")],
        "window_join_sql": [("window_start", "str"), ("n_clicks", "str"), ("n_purchases", "str"), ("purchase_value", "f6")],
        "window_session_sql": [("user_id", "str"), ("session_start", "str"), ("session_last", "str"), ("n_events", "str")],
        "window_topn_sql": [("window_start", "str"), ("event_type", "str"), ("n_events", "str"), ("rnk", "str")],
    },
}


def spec_hash(fold_name: str) -> str:
    """Canonical hash of a fold's member composition: member names +
    column/kind specs + each member's oracle SQL and implementation
    source. The driver rotation compares this against the composition
    recorded at the fold's last green driver row (DRIVER_ATTESTED.json):
    a fold whose members, specs, oracles, or member implementations
    changed since that row is treated as NEVER-VERIFIED and fronts the
    next round's sample. This closes the r13 staleness hole where a
    brand-new member (pattern_match_recognize_mod_define) rode the
    fold's pre-existing r12 evidence and would not have been
    oracle-checked for ~3 rounds — and its member-source component
    extends the same guarantee to reimplemented members.
    """
    import hashlib
    import json

    parts = [json.dumps(SPECS[fold_name], sort_keys=True)]
    for member in SPECS[fold_name]:
        e = registry._REGISTRY[member]
        parts.append(member)
        parts.append(e.oracle or "")
        # full package-local helper closure, same rationale as
        # registry.entry_spec_hash: a member's behavior includes the
        # shared helpers it calls, so a helper replan voids the fold's
        # evidence too (r15 generalization of the r13 staleness fix)
        parts.append(registry.spec_closure_sources(e.fn))
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def _spark_repr(df: DataFrame, member: str, spec) -> DataFrame:
    want = [c for c, _k in spec]
    if df.columns != want:
        raise ValueError(
            f"fold member {member} schema drifted: {df.columns} != {want}"
        )
    cols = []
    for col, kind in spec:
        c = F.col(col)
        if kind == "f6":
            c = F.floor(c * F.lit(1_000_000)).cast("long")
        cols.append(F.coalesce(c.cast("string"), F.lit(_NULL)))
    return df.select(
        F.lit(member).alias("member"),
        F.concat_ws("|", *cols).alias("row_repr"),
    )


def _oracle_repr(member: str, spec) -> str:
    canon = []
    for col, kind in spec:
        inner = (
            f"CAST(floor(({col}) * 1000000) AS BIGINT)"
            if kind == "f6"
            else col
        )
        canon.append(f"coalesce(CAST({inner} AS VARCHAR), '{_NULL}')")
    member_sql = registry._REGISTRY[member].oracle
    assert member_sql, f"fold member {member} has no oracle"
    return (
        f"SELECT '{member}' AS member, concat_ws('|', {', '.join(canon)})"
        f" AS row_repr FROM ({member_sql}) AS __{member}"
    )


def _make_fold(fold_name: str, members: dict) -> None:
    oracle = "\nUNION ALL\n".join(
        _oracle_repr(m, spec) for m, spec in members.items()
    )

    def fold(spark: SparkSession, sf_dir: str, _members=members) -> DataFrame:
        parts = [
            _spark_repr(registry._REGISTRY[m].fn(spark, sf_dir), m, spec)
            for m, spec in _members.items()
        ]
        return reduce(DataFrame.unionAll, parts)

    fold.__name__ = fold_name
    fold.__doc__ = (
        f"Fold suite over {len(members)} registered member shapes "
        f"({', '.join(members)}); see module docstring for the "
        "canonicalization contract."
    )
    register(
        fold_name,
        oracle=oracle,
        doc=fold.__doc__,
        driver=True,
    )(fold)
    # members stay registered (bench/tests), but leave the driver rotation
    registry.hide_from_driver(members)


for _fold_name, _members in SPECS.items():
    _make_fold(_fold_name, _members)
