"""MATCH_RECOGNIZE subset lowering (plans/match_recognize.py).

The adjacent-sequence subset must lower exactly; everything beyond must
raise the instructive CEP error, never a silent wrong answer."""

from __future__ import annotations

import pytest

from training_flink_sql_cc_src_spark.plans.match_recognize import (
    UnsupportedPatternError,
    parse_match_recognize,
)
from training_flink_sql_cc_src_spark.plans.router import StatementRouter


def _mr(body: str) -> str:
    return f"SELECT * FROM ev MATCH_RECOGNIZE ({body}) AS m"


BASE = """
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES A.ts AS a_ts, B.ts AS b_ts
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A B)
    DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click'
"""


def test_parse_supported_shape():
    spec = parse_match_recognize(_mr(BASE))
    assert spec.table == "ev"
    assert spec.pattern == ["A", "B"]
    assert spec.partition_by == ["user_id"]
    assert spec.order_by == ["ts", "event_id"]
    assert [a for _, _, a in spec.measures] == ["a_ts", "b_ts"]
    assert spec.skip_past_last and spec.within_seconds is None
    assert spec.out_alias == "m"


def test_parse_within_clause():
    spec = parse_match_recognize(
        _mr(BASE.replace("PATTERN (A B)", "PATTERN (A B)\n    WITHIN INTERVAL '1' HOUR"))
    )
    assert spec.within_seconds == 3600


def test_no_match_recognize_returns_none():
    assert parse_match_recognize("SELECT 1") is None


def test_quantifiers_rejected():
    with pytest.raises(UnsupportedPatternError, match="quantifiers"):
        parse_match_recognize(_mr(BASE.replace("PATTERN (A B)", "PATTERN (A+ B)")))


def test_skip_past_last_needs_disjoint_predicates():
    body = BASE.replace(
        "DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click'",
        "DEFINE A AS A.value > 1, B AS B.value > 2",
    )
    with pytest.raises(UnsupportedPatternError, match="disjoint"):
        parse_match_recognize(_mr(body))
    # same predicates are fine under SKIP TO NEXT ROW (overlap allowed)
    spec = parse_match_recognize(
        _mr(body.replace("SKIP PAST LAST ROW", "SKIP TO NEXT ROW"))
    )
    assert not spec.skip_past_last


def test_cross_row_define_rejected():
    with pytest.raises(UnsupportedPatternError, match="current-row"):
        parse_match_recognize(
            _mr(
                BASE.replace(
                    "B AS B.event_type = 'click'",
                    "B AS B.ts > A.ts",
                )
            )
        )


def test_all_rows_per_match_rejected():
    with pytest.raises(UnsupportedPatternError, match="ALL ROWS"):
        parse_match_recognize(
            _mr(BASE.replace("ONE ROW PER MATCH", "ALL ROWS PER MATCH"))
        )


def test_three_step_lowering_matches_lead_chain(spark, sf_small):
    """PATTERN (A B C) over the real events fixture == a hand-built
    double-LEAD query (same partition/order/predicates)."""
    from training_flink_sql_cc_src_spark.queries._util import t

    t(spark, sf_small, "events").createOrReplaceTempView("__mr_t3")
    got = StatementRouter(spark).execute(
        """
        SELECT user_id, CAST(a_ts AS LONG) AS a_e, CAST(c_ts AS LONG) AS c_e
        FROM __mr_t3
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, C.ts AS c_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B C)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'purchase'
        )
        """
    )
    want = spark.sql(
        """
        WITH seq AS (
            SELECT user_id, ts,
                   LEAD(event_type, 1) OVER w AS t1,
                   LEAD(event_type, 2) OVER w AS t2,
                   LEAD(ts, 2) OVER w AS ts2,
                   event_type
            FROM __mr_t3
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(ts AS LONG) AS a_e, CAST(ts2 AS LONG) AS c_e
        FROM seq
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        """
    )
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.count() > 0 or want.count() == 0


def test_unsupported_raises_instructive_router_error(spark):
    spark.range(1).selectExpr(
        "CAST(id AS STRING) AS event_type", "id AS user_id", "id AS ts"
    ).createOrReplaceTempView("__mr_bad")
    with pytest.raises(NotImplementedError, match="applyInPandasWithState"):
        StatementRouter(spark).execute(
            """
            SELECT * FROM __mr_bad
            MATCH_RECOGNIZE (
                PARTITION BY user_id
                ORDER BY ts
                MEASURES A.ts AS a_ts
                PATTERN (A+ B)
                DEFINE A AS A.event_type = 'x', B AS B.event_type = 'y'
            )
            """
        )
