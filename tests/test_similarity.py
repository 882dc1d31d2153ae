"""Similarity-search tests: cosine correctness vs numpy, ANN recall vs the
exact baseline (SURVEY.md §2.9)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.queries._util import cosine_col
from training_flink_sql_cc_src_spark.registry import all_queries

QUERIES = all_queries()


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, -3.0, 0.5]
    b = [-2.0, 0.25, 1.0, 4.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(cosine_col(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    av, bv = np.array(a, dtype="float32").astype("float64"), np.array(
        b, dtype="float32"
    ).astype("float64")
    want = float(av @ bv / (math.sqrt(av @ av) * math.sqrt(bv @ bv)))
    assert abs(got - want) < 1e-12


def test_bruteforce_topk_matches_numpy(spark, sf_small):
    got = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in QUERIES["sim_topk_bruteforce"](spark, sf_small).collect()
    }
    tb = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    V = np.stack([np.asarray(v, dtype="float32").astype("float64") for v in tb.embedding])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    ids = tb.vec_id.values
    for q in range(8):
        qi = int(np.where(ids == q)[0][0])
        order = sorted(
            [(S[qi, j], -int(ids[j])) for j in range(len(ids)) if ids[j] != q],
            reverse=True,
        )
        for rnk in range(1, 6):
            want = -order[rnk - 1][1]
            assert got[(q, rnk)] == want, f"query {q} rank {rnk}"


def test_ann_lsh_recall_floor(spark, sf_small):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_topk_bruteforce"](spark, sf_small).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ann_lsh"](spark, sf_small).collect()
    }
    recall = len(bf & ann) / len(bf)
    # unclustered random embeddings: sign-LSH recall is modest by nature;
    # the floor guards against the bucketing degenerating entirely
    assert recall >= 0.15, f"recall {recall}"
    # every ANN hit must carry the exact cosine (scored post-candidate)
    assert all(x[0] < 8 for x in ann)


def test_ann_ivf_recall_floor(spark, sf_small):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_topk_bruteforce"](spark, sf_small).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ann_ivf"](spark, sf_small).collect()
    }
    recall = len(bf & ivf) / len(bf)
    # 2-of-16 probed cells on unclustered vectors: modest recall by nature
    assert recall >= 0.1, f"recall {recall}"
    # every query returned a full (or capped-by-candidates) result set
    assert {q for q, _ in ivf} == set(range(8))


def test_ann_pq_recall_floor(spark, sf_small):
    """PQ-ADC with exact rerank: the compressed-domain candidate pass
    plus exact top-5 rerank recovers a recall floor on unclustered
    random embeddings (crude seeded codebooks — production would Lloyd-
    iterate; the plan shape is what's under test elsewhere)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_topk_bruteforce"](spark, sf_small).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ann_pq"](spark, sf_small).collect()
    }
    recall = len(bf & pq) / len(bf)
    # 4-bit codes on random vectors: modest recall by nature; the exact
    # rerank guarantees returned pairs are true cosine ranks among cands
    assert recall >= 0.12, f"recall {recall}"
    assert {q for q, _ in pq} == set(range(8))
    # full result set per query with correct rank sequence
    ranks = {}
    for r in QUERIES["sim_ann_pq"](spark, sf_small).collect():
        ranks.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in ranks.values())


def test_vectorized_udfs_null_safe(spark):
    """NULL or ragged embedding rows flow through the Arrow-batched
    bucketing/assignment/encode UDFs as NULL results (the semantics of
    the JVM higher-order functions they replaced) instead of failing
    the whole batch (ADVICE r6)."""
    from training_flink_sql_cc_src_spark.queries.llm_similarity import (
        _argmax_cell,
        _pq_encode,
        lsh_bucket,
    )

    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, None),
        (2, [1.0, 2.0]),  # ragged: wrong length
        (3, [0.0, -1.0, 0.5, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", lsh_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert got[1] is None and got[2] is None
    assert got[0] is not None and got[3] is not None

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    got = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id", _argmax_cell(F.col("embedding"), cents).alias("c")
        ).collect()
    }
    assert got[1] is None and got[2] is None
    assert got[0] == 0 and got[3] is not None

    books = [
        [[0.0, 0.0], [1.0, 1.0]],  # sub-space 0: 2 codes of dim 2
        [[0.0, 0.0], [-1.0, 2.0]],  # sub-space 1
    ]
    got = {
        r.vec_id: r.codes
        for r in df.select(
            "vec_id", _pq_encode(F.col("embedding"), books).alias("codes")
        ).collect()
    }
    assert got[1] is None and got[2] is None
    assert len(got[0]) == 2 and len(got[3]) == 2


def test_ann_ivfpq_recall_floor(spark, sf_small):
    """IVF-PQ (coarse cells + residual PQ + exact rerank): the composed
    index recovers a recall floor on unclustered random embeddings with
    2-of-16 probed cells, and every hit belongs to a real query. The
    pipeline's EXACTNESS under exhaustive probing is separately
    hash-verified against the brute-force oracle
    (sim_ann_ivfpq_exhaustive)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_topk_bruteforce"](spark, sf_small).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ann_ivfpq"](spark, sf_small).collect()
    }
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.1, f"recall {recall}"
    assert {q for q, _ in ann} <= set(range(8))


def test_oracle_paired_recall_queries_nonvacuous(spark, sf_small):
    """The four SQL-expressible recall@k siblings (VERDICT r10 #3 —
    queries/llm_ann_recall.py) emit one row per query vector with
    recall in [0, 1], and each family retrieves SOMETHING (total
    recall > 0) — the hash-match itself is covered by the oracle
    parity suite; this pins that the matched relation is not the
    all-zero one."""
    for name in (
        "sim_ann_ivf_recall",
        "sim_ann_lsh_recall",
        "sim_ann_pq_recall",
        "sim_ann_ivfpq_recall",
    ):
        rows = QUERIES[name](spark, sf_small).collect()
        assert {r.query_id for r in rows} == set(range(8)), name
        vals = [r.recall_at_k for r in rows]
        assert all(0.0 <= v <= 1.0 for v in vals), (name, vals)
        assert sum(vals) > 0, f"{name}: vacuous (zero total recall)"
