"""Query registry backing the driver contract (__spark_entry__.py).

Every operator declared in SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair. ``spark_fn(spark, sf_dir) -> DataFrame`` is the
PySpark implementation; ``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs
over the same parquet (views pre-registered by the driver). Non-SQL-
expressible ops register with ``oracle=None`` → driver's weaker rows-only
check.

Hash-matching rules encoded here (see BASELINE.md derived targets):
- every computed column is aliased identically in both implementations;
- double aggregations go through DECIMAL(38,6) so partial/final aggregation
  order (Spark) vs single-node order (DuckDB) cannot produce ULP drift;
- window starts/ends are emitted as BIGINT epoch seconds so timestamp
  type/timezone representation differences cannot affect the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    fn: SparkQuery
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = Entry(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {k: v.fn for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in _REGISTRY.items() if v.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        aggregates,
        analytic,
        attested,
        composite,
        joins,
        llm_dedup,
        llm_pipeline,
        llm_similarity,
        llm_text,
        multimodal,
        relational,
        scalar_fns,
        time_windows,
        tpch_more,
        udf_surface,
    )

    _LOADED = True
