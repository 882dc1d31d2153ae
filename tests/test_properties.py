"""Hypothesis property tests for the custom operators (SURVEY.md §5
'property-style checks'): latest-per-key and the as-of join checked
against direct Python references on generated inputs.

One shared Spark-roundtrip budget: hypothesis drives small generated
datasets (deadline disabled — Spark jobs are slow relative to hypothesis
defaults, examples capped instead).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from training_flink_sql_cc_src_spark.operators.dedup import latest_per_key
from training_flink_sql_cc_src_spark.queries.joins import asof_join

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=50),  # version/ts
        st.integers(min_value=0, max_value=999),  # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS)
def test_latest_per_key_property(spark, rows):
    """latest_per_key == python max-by-(order, stable) per key, for rows
    with unique (key, version) pairs (ties deduped to keep the reference
    well-defined)."""
    seen = {}
    for k, v, p in rows:
        seen[(k, v)] = p  # dedupe ties: last writer wins in both references
    uniq = [(k, v, p) for (k, v), p in seen.items()]
    df = spark.createDataFrame(uniq, "k int, v int, p int")
    got = {r.k: (r.v, r.p) for r in latest_per_key(df, ["k"], "v").collect()}
    want = {}
    for k, v, p in uniq:
        if k not in want or v > want[k][0]:
            want[k] = (v, p)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_property(spark, left, right):
    """asof_join == python 'latest right payload with ts <= left ts per
    key' (right deduped on (key, ts) so the reference is unique)."""
    left = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    rseen = {}
    for k, ts, p in right:
        rseen[(k, ts)] = p
    runiq = [(k, ts, p) for (k, ts), p in rseen.items()]
    ldf = spark.createDataFrame(left, "lid int, k int, ts int")
    rdf = spark.createDataFrame(runiq, "k int, ts int, payload int")
    out = asof_join(
        ldf, rdf, key="k", left_ts="ts", right_ts="ts", right_payload=["payload"]
    )
    got = {r.lid: r.payload for r in out.collect()}
    want = {}
    for lid, k, lts in left:
        cands = [(ts, p) for (kk, ts, p) in runiq if kk == k and ts <= lts]
        want[lid] = max(cands)[1] if cands else None
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.sets(st.integers(0, 11), min_size=1, max_size=9),  # dense vocab
        min_size=2,
        max_size=14,
    ),
    thr=st.sampled_from([(1, 2), (3, 5), (4, 5)]),
)
def test_ppjoin_matches_bruteforce(spark, docs, thr):
    """ppjoin_pairs (prefix + positional + size filters) == quadratic
    brute-force Jaccard, for every threshold — the filters must be
    lossless and introduce no false positives, including on tiny dense
    vocabularies where every prefix bucket collides."""
    from training_flink_sql_cc_src_spark.operators.ppjoin import ppjoin_pairs

    num, den = thr
    rows = [(i, sorted(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, words array<int>")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ppjoin_pairs(
            df, "doc_id", "words", thr_num=num, thr_den=den
        ).collect()
    }
    want = {}
    for i, a in enumerate(docs):
        for j, b in enumerate(docs):
            if i < j:
                inter = len(a & b)
                jac = inter / (len(a) + len(b) - inter)
                if inter * (num + den) >= (len(a) + len(b)) * num:
                    want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lts=st.lists(st.integers(0, 3600), min_size=1, max_size=15),
    rts=st.lists(st.integers(0, 3600), min_size=1, max_size=15),
    bounds=st.tuples(st.integers(-900, 880), st.integers(20, 900)),
)
def test_range_bucket_join_matches_bruteforce(spark, lts, rts, bounds):
    """range_bucket_join == brute-force range scan for arbitrary bounds
    and timestamps — the bucket explode must produce every qualifying
    pair exactly once (the right row's bucket is unique)."""
    from pyspark.sql import functions as F

    from training_flink_sql_cc_src_spark.operators.range_join import (
        range_bucket_join,
    )

    lo, width = bounds
    hi = lo + width
    # build timestamps from epoch offsets for exactness
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "lid int, off int"
    ).select("lid", F.timestamp_seconds(F.col("off") + 1_700_000_000).alias("lts"))
    right = spark.createDataFrame(
        [(j, t) for j, t in enumerate(rts)], "rid int, off int"
    ).select("rid", F.timestamp_seconds(F.col("off") + 1_700_000_000).alias("rts"))
    got = {
        (r.lid, r.rid)
        for r in range_bucket_join(
            left, right, "lts", "rts", lo, hi
        ).collect()
    }
    want = {
        (i, j)
        for i, lt in enumerate(lts)
        for j, rt in enumerate(rts)
        if lt + lo <= rt <= lt + hi
    }
    assert got == want
