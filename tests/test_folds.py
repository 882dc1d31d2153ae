"""Fold-suite mechanics (queries/folds.py): the canonicalization must be
able to FAIL — a fold whose hash can't change when a member's values
change verifies nothing — and the driver-facing registry arithmetic
must hold (tests/test_registry_rotation.py owns the <=200 bound)."""

from __future__ import annotations

import pytest

from training_flink_sql_cc_src_spark.queries.folds import (
    _NULL,
    SPECS,
    _oracle_repr,
    _spark_repr,
)


def test_schema_drift_raises_not_hashes_garbage(spark):
    """A member whose output columns drift from the pinned spec must
    raise loudly — silently concatenating the wrong columns would hash
    garbage against the oracle's pinned order."""
    df = spark.createDataFrame([(1, "x")], "wrong_a long, wrong_b string")
    spec = [("user_id", "str"), ("view_epoch", "str")]
    with pytest.raises(ValueError, match="schema drifted"):
        _spark_repr(df, "member_x", spec)


def test_value_change_changes_row_repr(spark):
    """Canonicalization sensitivity: any value change — including in a
    double routed through floor(x*1e6) — changes row_repr, so a member
    regression fails the fold's hash."""
    spec = [("a", "str"), ("b", "f6")]
    base = spark.createDataFrame([(1, 2.5)], "a long, b double")
    tweaked_int = spark.createDataFrame([(2, 2.5)], "a long, b double")
    tweaked_dbl = spark.createDataFrame(
        [(1, 2.5000011)], "a long, b double"
    )
    r = lambda df: _spark_repr(df, "m", spec).collect()[0].row_repr  # noqa: E731
    assert r(base) != r(tweaked_int)
    assert r(base) != r(tweaked_dbl)
    assert r(base) == r(spark.createDataFrame([(1, 2.5)], "a long, b double"))


def test_null_sentinel_distinguishes_null_from_empty(spark):
    spec = [("a", "str"), ("b", "str")]
    with_null = spark.createDataFrame([("x", None)], "a string, b string")
    with_empty = spark.createDataFrame([("x", "")], "a string, b string")
    rn = _spark_repr(with_null, "m", spec).collect()[0].row_repr
    re_ = _spark_repr(with_empty, "m", spec).collect()[0].row_repr
    assert rn != re_ and _NULL in rn


def test_oracle_repr_mirrors_spec_order_and_member_sql():
    """The oracle side must wrap the MEMBER's registered SQL and canon
    each column in spec order with the same NULL sentinel / f6 rule."""
    from training_flink_sql_cc_src_spark import registry

    registry._load_all()
    fold = "window_fold_sql_variants"
    member = "window_dedup_sql"
    sql = _oracle_repr(member, SPECS[fold][member])
    assert f"'{member}' AS member" in sql
    assert registry._REGISTRY[member].oracle.strip()[:30] in sql
    assert _NULL in sql
    # spec order is the concat order
    cols = [c for c, _ in SPECS[fold][member]]
    assert sql.index(cols[0]) < sql.index(cols[-1])


def test_every_fold_member_is_registered_and_oracled():
    from training_flink_sql_cc_src_spark import registry

    registry._load_all()
    for fold, members in SPECS.items():
        assert registry._REGISTRY[fold].oracle
        for m in members:
            assert m in registry._REGISTRY, (fold, m)
            assert registry._REGISTRY[m].oracle, (fold, m)
