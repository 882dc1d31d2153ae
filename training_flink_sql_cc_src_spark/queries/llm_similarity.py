"""[C] Similarity search over the embeddings table (SURVEY.md §2.9):
brute-force cosine top-k as the exact baseline, random-projection LSH as
the scale path.

Scale notes (100 TB): the query set is broadcast (a handful of vectors vs
billions of rows), scoring is a map-only stage over the scan, and top-k per
query is a shuffle of only `k × n_queries` pre-reduced rows — we pre-filter
with a per-partition rank so the window shuffle never sees the full corpus.
The LSH variant hashes each vector to sign-bit buckets map-side; candidate
generation is an equi join on the bucket key (hash shuffle, no cross join).

Cosine determinism: both engines compute the same left-associated double
fold (queries/_util.dot_col / dot_sql), so scores are bit-identical and
rank ties are broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import cosine_sql, dot_col, norm_col, t

N_QUERY = 8  # vec_id < 8 are the query vectors
TOP_K = 5


def _batch_matrix(col: pd.Series, dim: int):
    """(n, dim) float64 matrix + validity mask for a batch of embedding
    rows. NULL or ragged (wrong-length) rows are zero-filled and masked
    instead of raising, so the vectorized UDFs preserve the NULL-in →
    NULL-out semantics of the JVM higher-order functions they replaced
    (one malformed row no longer fails the whole batch/job)."""
    vals = col.tolist()
    valid = np.fromiter(
        (v is not None and len(v) == dim for v in vals),
        dtype=bool,
        count=len(vals),
    )
    x = np.zeros((len(vals), dim), dtype=np.float64)
    idx = np.flatnonzero(valid)
    if idx.size:
        # inner None elements become NaN here (float conversion), which
        # propagates to a NaN score — same poison behavior as the JVM
        # fold's NULL arithmetic
        x[idx] = np.asarray([vals[i] for i in idx], dtype=np.float64)
    return x, valid


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    -- query side pre-filtered in a CTE so the planner can never defer the
    -- 8-row restriction past the inequality join: the pair space is
    -- N_QUERY x n (linear in corpus), not n^2, at every scale factor
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               {cosine_sql('q.embedding', 'v.embedding')} AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'v.embedding')} DESC,
                            v.vec_id
               ) AS rnk
        FROM q
        INNER JOIN embeddings v ON v.vec_id <> q.vec_id
    ) WHERE rnk <= {TOP_K}
    """,
    doc="Brute-force cosine top-k nearest neighbors (the exact ANN "
    "baseline, SURVEY.md §2.9). Query vectors broadcast against the "
    "corpus; scoring map-side; per-query top-k via window. At 100 TB the "
    "corpus scan dominates and parallelizes linearly.",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    # norms once per side (norm_col): per candidate row only dot(q, v)
    # folds — bit-identical scores, 3x less per-pair work
    corpus = e.select(
        "vec_id", "embedding", norm_col(F.col("embedding")).alias("v_norm")
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_norm"),
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "sim_threshold_pairs_blocked",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
           {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a
    INNER JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.35
    """,
    doc="Embedding-cosine near-duplicate pairs, blocked by label "
    "(SURVEY.md §2.9 embedding-cosine near-dup): candidate pairs come from "
    "an equi join on the blocking key — a hash shuffle that scales with "
    "block sizes, never an n² cross join.",
)
def sim_threshold_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label"),
        F.col("embedding").alias("emb_a"),
        norm_col(F.col("embedding")).alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
        norm_col(F.col("embedding")).alias("norm_b"),
    )
    return (
        a.join(b, (a.label == b.label_b) & (a.id_a < b.id_b))
        .withColumn(
            "cos_sim",
            dot_col(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "label", "cos_sim")
    )


def _hyperplanes(n_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-bit LSH (seed fixed so the
    bucketing is reproducible across runs/executors)."""
    rng = np.random.RandomState(42)
    return rng.standard_normal((n_planes, dim)).tolist()


def _dot_plane(plane, emb):
    """dot(plane literal element, embedding column) — the fold used inside
    transform() lambdas (plane elements are already double)."""
    return F.aggregate(
        F.zip_with(plane, emb, lambda x, y: x * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(emb, planes: list[list[float]]):
    """Sign-bit bucket id of an embedding column via a VECTORIZED
    Arrow-batched pandas UDF: one BLAS matmul against the plane matrix
    per batch, signs folded acc*2 + bit in plane order. Replaces the
    transform/aggregate higher-order functions, which interpret
    n_planes x dim lambda calls per row (~1 s per 2k rows at 16x64 —
    the same hotspot the PQ encode had). Sign flips vs the old fold are
    possible only when |dot| is within one ulp of zero — irrelevant to
    an LSH bucketing whose guarantees are probabilistic (recall floors
    property-tested)."""
    pmat = np.asarray(planes, dtype=np.float64)  # (P, D)

    @F.pandas_udf("long")
    def bucketize(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="Int64")
        x, valid = _batch_matrix(col, pmat.shape[1])  # (n, D)
        bits = (x @ pmat.T) >= 0  # (n, P)
        out = np.zeros(len(x), dtype=np.int64)
        for k in range(pmat.shape[0]):
            out = out * 2 + bits[:, k].astype(np.int64)
        res = pd.Series(out, dtype="Int64")
        res[~valid] = pd.NA
        return res

    return bucketize(emb)


@register(
    "sim_ann_lsh",
    oracle=None,  # LSH bucketing is engine-side; recall vs brute force is
    # asserted in tests/test_similarity.py
    doc="Approximate nearest neighbors via random-projection (sign-bit) "
    "LSH — the scale path for similarity search (SURVEY.md §2.9): "
    "16 hyperplanes → 2^16 buckets; candidates share the query's bucket "
    "in at least one of 4 band views (4-bit bands of the signature), "
    "scored exactly, top-k per query. Bucketing is map-only; candidate "
    "join is equi on (band, band_bits).",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    sig = e.withColumn("bucket", lsh_bucket(F.col("embedding"), planes)).withColumn(
        "v_norm", norm_col(F.col("embedding"))
    )
    # 4 bands of 4 bits: candidate = shares any band value with the query
    bands = sig.select(
        "vec_id",
        "embedding",
        "v_norm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("bucket"), b * 4)
                        .bitwiseAND(F.lit(15))
                        .alias("band_bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", "v_norm", "bb.band", "bb.band_bits")
    q = bands.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        F.col("band"),
        F.col("band_bits"),
    )
    # Score BEFORE deduplicating: a pair matching in k bands appears k
    # times, but cosine is a cheap map-side JVM expression, while
    # dropDuplicates on un-scored candidates would shuffle the 64-float
    # embedding arrays. Scoring first means the dedup (groupBy = map-side
    # partial agg) shuffles only narrow (query_id, neighbor_id, cos)
    # rows — at 100 TB that's the difference between shuffling vectors
    # and shuffling scalars.
    scored = (
        bands.join(F.broadcast(q), ["band", "band_bits"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def _cell_scores(emb, centroids: list[tuple[int, list[float]]]):
    """Per-cell dot products as ONE transform over a nested centroid
    literal (cell id == array index) — small tree, map-only."""
    cent_lit = F.lit([[float(x) for x in c] for _, c in centroids])
    return F.transform(cent_lit, lambda c: _dot_plane(c, emb))


def _argmax_cell(emb, centroids: list[tuple[int, list[float]]]):
    """Index of the nearest centroid (max dot product) via a vectorized
    Arrow-batched pandas UDF — one matmul per batch instead of
    n_cells x dim interpreted lambda calls per row; ties resolve to the
    lowest cell id (numpy argmax takes the first maximum)."""
    cmat = np.asarray([c for _, c in centroids], dtype=np.float64)

    @F.pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="Int32")
        x, valid = _batch_matrix(col, cmat.shape[1])
        res = pd.Series(
            (x @ cmat.T).argmax(axis=1).astype("int32"), dtype="Int32"
        )
        res[~valid] = pd.NA
        return res

    return assign(emb)


@register(
    "sim_ann_ivf",
    oracle=None,  # centroid choice is engine-side; recall vs brute force
    # asserted in tests/test_similarity.py
    doc="Approximate nearest neighbors via IVF (inverted-file) coarse "
    "quantization — the second scale path beside LSH (SURVEY.md §2.9): "
    "16 deterministic coarse centroids (every n/16-th vector), each corpus "
    "vector assigned to its nearest cell map-side (argmax over broadcast "
    "centroid dot products, JVM-only), queries probe their 2 nearest "
    "cells, candidates scored exactly, top-k per query. Candidate "
    "generation is an equi join on cell id — scan cost 2/16 of the corpus "
    "per query at scale.",
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, n_probes=2)


def _ivf_topk(
    spark: SparkSession, sf_dir: str, n_probes: int
) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    n_cells = 16
    # Coarse centroids from a seeded sample + limit: ONE partial scan
    # (CollectLimit stops early), no count() — at 100 TB the old
    # count+filter seeding cost two full corpus passes before the real
    # query. 16 rows driver-side is a bounded collect. orderBy(vec_id) on
    # the 16-row local result only pins determinism of cell ids.
    seed_rows = e.sample(fraction=0.2, seed=42).limit(n_cells).collect()
    if len(seed_rows) < n_cells:  # tiny fixture fallback (sf<=0.001)
        seed_rows = e.limit(n_cells).collect()
    seed_rows.sort(key=lambda r: r.vec_id)
    cents = [(i, list(r.embedding)) for i, r in enumerate(seed_rows)]
    assigned = e.withColumn(
        "cell", _argmax_cell(F.col("embedding"), cents)
    ).withColumn("v_norm", norm_col(F.col("embedding")))
    # queries probe their top-2 cells (explode the 2-best struct array)
    q = e.filter(F.col("vec_id") < N_QUERY)
    scores = _cell_scores(F.col("embedding"), cents)
    scored_cells = F.transform(
        scores, lambda s, i: F.struct(s.alias("s"), i.alias("cell"))
    )
    q_scored = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_norm"),
        F.slice(
            F.reverse(F.array_sort(scored_cells)), 1, n_probes
        ).alias("probes"),
    ).select(
        "query_id",
        "q_emb",
        "q_norm",
        F.explode(F.col("probes").getField("cell")).alias("cell"),
    )
    # score before dedup: the 2-probe expansion can emit a pair once per
    # probed cell; dedup AFTER scoring shuffles narrow scalar rows with a
    # map-side partial max instead of shuffling embedding arrays
    scored = (
        assigned.join(F.broadcast(q_scored), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------- PQ / ADC
M_SUB = 8        # subspaces (dim 64 -> 8 dims each)
K_CODES = 16     # codes per subspace (4-bit)
REFINE = 4       # rerank the top REFINE*TOP_K ADC candidates exactly


def _pq_codebooks(seed_rows) -> list[list[list[float]]]:
    """codebooks[m][k] = k-th code vector of subspace m, taken from the
    deterministic seed sample's m-th subvectors (production would run a
    few Lloyd iterations per subspace on the same sample; the seeded
    pick keeps the operator deterministic and the driver work bounded —
    the plan shape is identical either way)."""
    dim_sub = len(seed_rows[0].embedding) // M_SUB
    return [
        [
            [float(x) for x in r.embedding[m * dim_sub : (m + 1) * dim_sub]]
            for r in seed_rows[:K_CODES]
        ]
        for m in range(M_SUB)
    ]


def _pq_encode(emb, codebooks):
    """8 x 4-bit code array per vector via an Arrow-batched VECTORIZED
    pandas UDF — one BLAS matmul per subspace per batch: dist(s, c) =
    ||c||^2 - 2 s.c (||s||^2 is constant per row, argmin-invariant),
    argmin over the 16 codes. Chosen over the two JVM alternatives
    measured at sf0.1: higher-order functions (transform/aggregate)
    interpret ~2M lambda calls per 2k rows (2.4 s), and the expanded
    1024-term codegen expression pays ~9 s of janino compile; the
    numpy batch path is <10 ms per 10k-row batch and scales per-core
    at 100 TB (the industry-standard FAISS encode shape)."""
    books = np.asarray(codebooks, dtype=np.float64)  # (M, K, d)
    n_sub, _, dim_sub = books.shape
    c_norms = (books**2).sum(axis=2)  # (M, K)

    @F.pandas_udf("array<int>")
    def enc(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x, valid = _batch_matrix(s, n_sub * dim_sub)  # (n, D)
        out = np.empty((len(x), n_sub), dtype=np.int32)
        for m in range(n_sub):
            sub = x[:, m * dim_sub : (m + 1) * dim_sub]  # (n, d)
            dist = c_norms[m][None, :] - 2.0 * (sub @ books[m].T)
            out[:, m] = dist.argmin(axis=1)
        return pd.Series(
            [row if ok else None for row, ok in zip(out, valid)]
        )

    return enc(emb)


def _adc_scorer(luts, q_norms, qc_by_cell=None, probe_mask=None):
    """Vectorized ADC scoring UDF: (codes[, cell], v_norm) -> array of
    per-query approximate cosines, one numpy GATHER per subspace per
    Arrow batch. Replaces the zip_with/aggregate higher-order-function
    scorer (round 13): Catalyst interprets HOF lambdas per element —
    ~1.5 s for 16k scored pairs at sf0.1, the whole query's budget —
    while the gather path is <10 ms per 10k-row batch and keeps the
    8-byte codes relation as the only scanned input at 100 TB (the
    FAISS IVFADC scan shape, Jegou et al. 2011 §IV).

    ``luts``: (Q, M, K) per-query dot(q_sub, code) tables.
    ``q_norms``: (Q,) true query norms.
    ``qc_by_cell``/``probe_mask``: (Q, n_cells) IVF coarse terms and
    probed-cell mask — when given, the scorer adds dot(q, centroid) and
    nulls out unprobed (query, cell) pairs so only inverted-list
    members survive the explode."""
    luts_np = np.asarray(luts, dtype=np.float64)
    qn = np.asarray(q_norms, dtype=np.float64)
    n_q, n_sub, _ = luts_np.shape

    def _score(codes: pd.Series, vn: pd.Series, cells=None):
        valid = codes.notna().to_numpy()
        if not valid.any():
            return pd.Series([None] * len(codes), dtype=object)
        C = np.stack(codes[valid].to_numpy()).astype(np.int64)
        v = vn.to_numpy(dtype=np.float64)[valid]
        acc = np.zeros((len(C), n_q), dtype=np.float64)
        for m in range(n_sub):
            acc += luts_np[:, m, C[:, m]].T
        if cells is not None:
            cl = cells.to_numpy(dtype=np.int64)[valid]
            acc += qc_by_cell[:, cl].T
        approx = acc / (qn[None, :] * v[:, None])
        if cells is not None:
            keep = probe_mask[:, cl].T  # (n, Q)
            rows = [
                [x if k else None for x, k in zip(row, kr)]
                for row, kr in zip(approx, keep)
            ]
        else:
            rows = [list(row) for row in approx]
        out = np.full(len(codes), None, dtype=object)
        for i, row in zip(np.flatnonzero(valid), rows):
            out[i] = row
        return pd.Series(out)

    if qc_by_cell is None:

        @F.pandas_udf("array<double>")
        def adc(codes: pd.Series, v_norm: pd.Series) -> pd.Series:
            return _score(codes, v_norm)

        return adc

    qc_by_cell = np.asarray(qc_by_cell, dtype=np.float64)
    probe_mask = np.asarray(probe_mask, dtype=bool)

    @F.pandas_udf("array<double>")
    def adc_ivf(
        cell: pd.Series, codes: pd.Series, v_norm: pd.Series
    ) -> pd.Series:
        return _score(codes, v_norm, cells=cell)

    return adc_ivf


def _adc_explode(encoded, scorer, query_ids, cell_col=None):
    """codes relation -> (query_id, vec_id, approx) rows: score every
    vector against all Q queries in one map-side UDF call, positional-
    explode the length-Q array, map position -> query id via a literal
    Q-element lookup (Q = 8, bounded). Nulls (unprobed IVF pairs,
    invalid embeddings) are dropped — same pairs the old per-(query,
    cell) join produced."""
    qid_lit = F.array(*[F.lit(int(q)) for q in query_ids])
    args = ([F.col(cell_col)] if cell_col else []) + [
        F.col("codes"), F.col("v_norm")
    ]
    return (
        encoded.select(
            "vec_id",
            F.posexplode_outer(scorer(*args)).alias("qidx", "approx"),
        )
        .filter(F.col("approx").isNotNull())
        .select(
            F.element_at(qid_lit, F.col("qidx") + 1).alias("query_id"),
            "vec_id",
            "approx",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )


@register(
    "sim_ann_pq",
    oracle=None,  # codebook choice is engine-side; recall vs brute force
    # asserted in tests/test_similarity.py
    doc="Approximate nearest neighbors via PRODUCT QUANTIZATION with "
    "asymmetric distance (ADC) — the memory-bandwidth scale path beside "
    "LSH and IVF (SURVEY.md §2.9; Jegou et al. 2011, PAPERS.md): each "
    "64-dim vector compresses map-side to 8 x 4-bit codes (argmin-L2 "
    "against 16 broadcast codes per subspace) plus its true norm — 8 "
    "bytes + 8 scan bytes instead of 256, a 16x bandwidth cut at 100 "
    "TB. Queries precompute 8x16 dot-product lookup tables driver-side "
    "(1 KB per query, broadcast); the approximate inner product is 8 "
    "table lookups per candidate, scored map-side over the NARROW codes "
    "relation. The top 4k ADC candidates per query (scalar-row shuffle "
    "only) are reranked EXACTLY against the full vectors via a "
    "broadcast candidate semi-join — candidates-sized, not "
    "corpus-sized. Deterministic: seeded codebook sample, "
    "first-match argmin ties, exact rerank ordered by (score, vec_id).",
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_topk(spark, sf_dir, refine_k=REFINE * TOP_K)


def _pq_topk(
    spark: SparkSession, sf_dir: str, refine_k: int
) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    seed_rows = e.sample(fraction=0.2, seed=7).limit(K_CODES).collect()
    if len(seed_rows) < K_CODES:  # tiny fixture fallback (sf<=0.001)
        seed_rows = e.limit(K_CODES).collect()
    seed_rows.sort(key=lambda r: r.vec_id)
    books = _pq_codebooks(seed_rows)
    dim_sub = len(books[0][0])

    # corpus -> (vec_id, codes[8], v_norm): the stored PQ representation
    encoded = e.select(
        "vec_id",
        _pq_encode(F.col("embedding"), books).alias("codes"),
        norm_col(F.col("embedding")).alias("v_norm"),
    )

    # query LUTs driver-side: lut[m][k] = dot(q_sub_m, code_mk) — 8x16
    # doubles per query, baked into the vectorized scorer's closure
    # (shipped once per executor with the UDF, not per row)
    q_rows = sorted(
        e.filter(F.col("vec_id") < N_QUERY).collect(),
        key=lambda r: r.vec_id,
    )
    lut_rows = []
    for r in q_rows:
        q = [float(x) for x in r.embedding]
        qn = float(np.sqrt(sum(x * x for x in q)))
        lut = [
            [
                float(sum(a * b for a, b in zip(
                    q[m * dim_sub : (m + 1) * dim_sub], code)))
                for code in books[m]
            ]
            for m in range(M_SUB)
        ]
        lut_rows.append((r.vec_id, lut, qn))

    # ADC scoring: one numpy LUT gather per subspace per Arrow batch
    # over the narrow codes relation (round 13 — see _adc_scorer)
    scorer = _adc_scorer(
        [lut for _, lut, _ in lut_rows], [qn for *_, qn in lut_rows]
    )
    scored = _adc_explode(
        encoded, scorer, [qid for qid, *_ in lut_rows]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id")
    )
    cands = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= refine_k)
        .select("query_id", "vec_id")
    )

    # exact rerank: candidates (tiny) broadcast against the full vectors
    qv = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_norm"),
    )
    exact = (
        e.join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * norm_col(F.col("embedding"))),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos_sim",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_BRUTE_ORACLE = f"""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               {cosine_sql('q.embedding', 'v.embedding')} AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'v.embedding')} DESC,
                            v.vec_id
               ) AS rnk
        FROM q
        INNER JOIN embeddings v ON v.vec_id <> q.vec_id
    ) WHERE rnk <= {TOP_K}
"""


@register(
    "sim_ann_ivf_exhaustive",
    oracle=_BRUTE_ORACLE,
    doc="IVF with EXHAUSTIVE probing (all 16 cells) — the exact-subset "
    "oracle trick (cf. agg_heavy_hitters_merge_exact): when queries "
    "probe every cell, the candidate set is the whole corpus and the "
    "result must EQUAL brute-force top-k, which DuckDB can state in "
    "SQL. A green hash here verifies the entire IVF pipeline — cell "
    "assignment loses no vector, probe explode/dedup keeps exactly one "
    "score per pair, exact scoring and rank tie-breaks match — "
    "leaving only the recall/probe trade (property-tested) outside "
    "the oracle. Runs the same _ivf_topk code as sim_ann_ivf.",
)
def sim_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, n_probes=16)


@register(
    "sim_ann_pq_exhaustive",
    oracle=_BRUTE_ORACLE,
    doc="PQ-ADC with an EXHAUSTIVE rerank window (refine_k >= corpus) — "
    "the exact-subset oracle for the PQ pipeline: every vector survives "
    "ADC candidate selection, so the exact rerank must reproduce "
    "brute-force top-k bit-for-bit. A green hash verifies codebook "
    "broadcast, Arrow-batched encoding, LUT scoring, candidate "
    "plumbing, and the rerank joins; the compression/recall trade of "
    "the REAL refine window stays covered by the recall-floor test. "
    "Runs the same _pq_topk code as sim_ann_pq.",
)
def sim_ann_pq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_topk(spark, sf_dir, refine_k=1_000_000_000)


K_CLUSTERS = 8  # deterministic seed: vec_id < 8 are the centroids


_KMEANS_ASSIGN_SQL = f"""
    WITH c AS (
        SELECT vec_id AS cid, embedding AS ce FROM embeddings
        WHERE vec_id < {K_CLUSTERS}
    )
    SELECT vec_id, cluster_id, cos_sim FROM (
        SELECT v.vec_id, c.cid AS cluster_id,
               {cosine_sql('v.embedding', 'c.ce')} AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {cosine_sql('v.embedding', 'c.ce')} DESC,
                            c.cid
               ) AS rnk
        FROM embeddings v CROSS JOIN c
    ) WHERE rnk = 1
"""


_SEED_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _kmeans_seed_centroids(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[float]]]:
    """The K deterministic seed centroids (vec_id < K) as driver-side
    (cid, components) pairs — a bounded K-row collect, the same contract
    as the IVF/PQ seeds. Memoized per sf_dir (the seeds are a pure
    function of the immutable parquet), so repeated queries in one
    session pay the K-row scan once."""
    if sf_dir not in _SEED_CACHE:
        rows = (
            t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < K_CLUSTERS)
            .select("vec_id", "embedding")
            .collect()
        )
        rows.sort(key=lambda r: r.vec_id)
        _SEED_CACHE[sf_dir] = [
            (int(r.vec_id), list(r.embedding)) for r in rows
        ]
    return _SEED_CACHE[sf_dir]


def _argmax_cosine(emb, centroids: list[tuple[int, list[float]]]):
    """Centroid id of the max-cosine centroid via a vectorized
    Arrow-batched pandas UDF — the zero-shuffle assignment used for IVF
    cell choice (_argmax_cell), adapted to arbitrary centroid ids and
    cosine: centroid rows are L2-normalized once driver-side, so
    argmax_c dot(v, c/|c|) == argmax_c cos(v, c) (|v| is constant per
    row). Ties resolve to the SMALLEST centroid id (ids sorted
    ascending; numpy argmax takes the first maximum) — the oracle's
    (cos DESC, cid ASC) order. NULL/ragged embeddings → NULL id.

    Marked non-deterministic (it is pure — this is purely an optimizer
    fence, guide §4.4): every caller filters on the returned id
    (isNotNull), and Catalyst answers a filter over a UDF-computed
    column by pushing the filter DOWN and re-evaluating the UDF above
    it — two ArrowEvalPython nodes per call site. In
    _kmeans_update_stats the duplicate landed ABOVE the 64-way
    posexplode, so every vector crossed the Python boundary and paid
    the matmul 64 extra times (measured: the one-pass update stage ran
    ~5x slower; see OPTIMIZATION_r15.md). The fence keeps ONE
    evaluation below the filter and the explode."""
    cmat = np.asarray([c for _, c in centroids], dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    ids = np.asarray([cid for cid, _ in centroids], dtype=np.int64)
    assert list(ids) == sorted(ids)

    @F.pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="Int64")
        x, valid = _batch_matrix(col, cmat.shape[1])
        res = pd.Series(
            ids[(x @ cmat.T).argmax(axis=1)], dtype="Int64"
        )
        res[~valid] = pd.NA
        return res

    return assign.asNondeterministic()(emb)


def _kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means assignment step: every vector to its
    max-cosine centroid (deterministic seed = vec_id < K, ties to the
    smaller centroid id — see _argmax_cosine). ZERO-exchange plan: ONE
    Arrow-batched UDF does both the matmul argmax (one BLAS call per
    batch instead of K scored rows + a rank exchange per vector) and
    the reported cosine — computed against only the CHOSEN centroid
    with a dimension-ordered vectorized += loop, which IS the
    left-associated IEEE fold of the oracle's cosine_sql, so the value
    hash holds without any JVM fold expression. 100 TB: one corpus
    scan, no Exchange at all — the old WindowGroupLimit plan shuffled
    K rows per vector."""
    import math

    e = t(spark, sf_dir, "embeddings")
    cents = _kmeans_seed_centroids(spark, sf_dir)
    cmat = np.asarray([c for _, c in cents], dtype=np.float64)
    unit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    assert list(ids) == sorted(ids)
    c_norm = np.empty(len(cents), dtype=np.float64)
    for k, (_, ce) in enumerate(cents):
        # python floats ARE IEEE doubles, so this left-fold is
        # bit-identical to SQRT(dot_sql(ce, ce)) / norm_col
        s = 0.0
        for x in ce:
            s = s + float(x) * float(x)
        c_norm[k] = math.sqrt(s)

    @F.pandas_udf("struct<cluster_id: long, cos_sim: double>")
    def assign_scored(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"cluster_id": [], "cos_sim": []})
        x, valid = _batch_matrix(col, cmat.shape[1])
        # argmax over the normalized matmul (|v| constant per row);
        # ties -> first max -> smallest cid (ids ascending)
        k = (x @ unit.T).argmax(axis=1)
        chosen = cmat[k]
        # the reported cosine re-derives bit-identically to the
        # oracle's cosine_sql: a dimension-ordered += over vectorized
        # columns IS the left-associated IEEE fold of dot_sql, applied
        # to every row at once
        dots = np.zeros(len(x), dtype=np.float64)
        vv = np.zeros(len(x), dtype=np.float64)
        for j in range(cmat.shape[1]):
            dots += x[:, j] * chosen[:, j]
            vv += x[:, j] * x[:, j]
        cos = dots / (np.sqrt(vv) * c_norm[k])
        cid = pd.Series(ids[k], dtype="Int64")
        cid[~valid] = pd.NA
        cos[~valid] = np.nan
        return pd.DataFrame({"cluster_id": cid, "cos_sim": cos})

    return e.select(
        "vec_id", assign_scored(F.col("embedding")).alias("a")
    ).select(
        "vec_id",
        F.col("a.cluster_id").alias("cluster_id"),
        F.col("a.cos_sim").alias("cos_sim"),
    )


@register(
    "cluster_kmeans_assign",
    oracle=_KMEANS_ASSIGN_SQL,
    doc="Spherical k-means ASSIGNMENT step over the embedding corpus "
    "(the workhorse of embedding-space corpus organization/curation — "
    "cluster-then-sample, SemDeDup-style cluster scoping): every "
    "vector to its max-cosine centroid with a deterministic seed "
    "(vec_id < 8) so the oracle can state the same computation. "
    "One Arrow-matmul UDF: map-side argmax + fold-exact cosine, "
    "zero Exchange (plan-pinned in tests/test_plans.py).",
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kmeans_assign(spark, sf_dir)


@register(
    "cluster_kmeans_update",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cid, embedding AS ce FROM embeddings
        WHERE vec_id < {K_CLUSTERS}
    ), assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cosine_sql('v.embedding', 'c.ce')} DESC,
                                c.cid
                   ) AS rnk
            FROM embeddings v CROSS JOIN c
        ) WHERE rnk = 1
    )
    SELECT a.cluster_id, t.i AS dim_pos,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(ROUND(CAST(e.embedding[t.i] AS DOUBLE), 9)
                    AS DECIMAL(20,10))) AS DOUBLE) AS comp_sum
    FROM assign a
    JOIN embeddings e ON e.vec_id = a.vec_id,
         UNNEST(GENERATE_SERIES(1, 64)) AS t(i)
    GROUP BY a.cluster_id, t.i
    """,
    doc="K-means UPDATE step (one Lloyd iteration's centroid "
    "recomputation): per (cluster, dimension), the member count and "
    "component sum — the caller divides for the new centroid. Sum "
    "emitted instead of mean, components ROUNDed to 9 decimals then "
    "summed as DECIMAL(20,10): order-exact and engine-exact (ROUND "
    "half-away-from-zero agrees across engines; a raw double->decimal "
    "cast does not — HALF_UP vs HALF_EVEN ties). Scale: the posexplode "
    "shuffle carries n x 64 scalar rows with map-side partial "
    "aggregation; cluster count is fixed, so the result is K x 64 "
    "rows regardless of corpus size — the standard distributed-"
    "k-means reduce.",
)
def cluster_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = _kmeans_seed_centroids(spark, sf_dir)
    return _kmeans_update_stats(t(spark, sf_dir, "embeddings"), cents)


def _kmeans_update_stats(e: DataFrame, cents) -> DataFrame:
    """One Lloyd update's (cluster_id, dim_pos, n_members, comp_sum)
    against the given centroids: map-side argmax assignment (no join —
    the embedding rides the same row), posexplode, one K x 64-cell
    aggregate with map-side partials."""
    # assignment FIRST (one Arrow hop on n rows), posexplode SECOND: a
    # single select would put the Python eval above the Generate — 64x
    # the rows across the boundary and 64 matmuls per vector. The
    # nondeterministic fence on _argmax_cosine keeps CollapseProject
    # from inlining the UDF back into the Generate's projection, and
    # the isNotNull filter evaluates between the two (guide §4.4 —
    # plan pinned in tests/test_plans.py::test_kmeans_update_single_udf_eval).
    assigned = e.select(
        _argmax_cosine(F.col("embedding"), cents).alias("cluster_id"),
        "embedding",
    ).filter(F.col("cluster_id").isNotNull())
    comps = assigned.select(
        "cluster_id", F.posexplode("embedding").alias("pos", "comp")
    )
    return comps.groupBy(
        "cluster_id", (F.col("pos") + 1).alias("dim_pos")
    ).agg(
        F.count("*").alias("n_members"),
        F.sum(
            F.round(F.col("comp").cast("double"), 9).cast("decimal(20,10)")
        )
        .cast("double")
        .alias("comp_sum"),
    )


N_LLOYD = 2  # fixed iteration count so the oracle can unroll it exactly


def _kmeans_assign_sql(cent_cte: str) -> str:
    """Oracle argmax-assignment CTE body against a (cid, ce) centroid
    relation — the window formulation the fast matmul path replaces."""
    return f"""
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cosine_sql('v.embedding', 'c.ce')} DESC,
                                c.cid
                   ) AS rnk
            FROM embeddings v CROSS JOIN {cent_cte} c
        ) WHERE rnk = 1
    """


_KMEANS_STATS_SQL = """
    SELECT a.cluster_id, t.i AS dim_pos,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(ROUND(CAST(e.embedding[t.i] AS DOUBLE), 9)
                    AS DECIMAL(20,10))) AS DOUBLE) AS comp_sum
    FROM {a} a
    JOIN embeddings e ON e.vec_id = a.vec_id,
         UNNEST(GENERATE_SERIES(1, 64)) AS t(i)
    GROUP BY a.cluster_id, t.i
"""


@register(
    "cluster_kmeans_fit",
    oracle=f"""
    WITH c0 AS (
        SELECT vec_id AS cid, embedding AS ce FROM embeddings
        WHERE vec_id < {K_CLUSTERS}
    ), a1 AS ({_kmeans_assign_sql('c0')}
    ), s1 AS ({_KMEANS_STATS_SQL.format(a='a1')}
    ), c1 AS (
        SELECT cluster_id AS cid,
               list(comp_sum / n_members ORDER BY dim_pos) AS ce
        FROM s1 GROUP BY cluster_id
    ), a2 AS ({_kmeans_assign_sql('c1')}
    )
    {_KMEANS_STATS_SQL.format(a='a2')}
    """,
    doc=f"Spherical k-means FIT: {N_LLOYD} full Lloyd iterations in-"
    "engine (assign -> recompute centroids -> re-assign -> final "
    "stats), completing the cluster-then-sample curation story "
    "(SemDeDup / balanced sampling no longer assume externally-given "
    "centroids). Each iteration is the zero-shuffle matmul assignment "
    "plus the K x 64-cell distributed-Lloyd reduce; between "
    "iterations only the K x 64 centroid stats are collected (a "
    "bounded ~512-row driver hop, like the CC-loop convergence "
    "scalar), so lineage never compounds and no checkpoint is needed. "
    "New centroid components divide the ROUND/DECIMAL-exact component "
    "sums by the member count — bit-identical in both engines, so the "
    "iteration-2 assignment agrees and the final (cluster, dim) stats "
    "hash-match the oracle's unrolled 2-iteration CTE. The iteration "
    "count is a compile-time constant (N_LLOYD) — a loud bound, never "
    "a data-dependent loop. 100 TB: per iteration one corpus scan + "
    "one K x 64 aggregate; clusters that lose all members drop out of "
    "the next round in both engines.",
)
def cluster_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    cents = _kmeans_seed_centroids(spark, sf_dir)
    for _ in range(N_LLOYD - 1):
        rows = _kmeans_update_stats(e, cents).collect()  # K x 64 rows
        by_cid: dict[int, list] = {}
        for r in rows:
            by_cid.setdefault(int(r["cluster_id"]), [0.0] * 64)[
                int(r["dim_pos"]) - 1
            ] = r["comp_sum"] / r["n_members"]
        cents = sorted(by_cid.items())
    return _kmeans_update_stats(e, cents)


@register(
    "pipeline_cluster_balanced_sample",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cid, embedding AS ce FROM embeddings
        WHERE vec_id < {K_CLUSTERS}
    ), assign AS (
        SELECT vec_id, cluster_id FROM (
            SELECT v.vec_id, c.cid AS cluster_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cosine_sql('v.embedding', 'c.ce')} DESC,
                                c.cid
                   ) AS rnk
            FROM embeddings v CROSS JOIN c
        ) WHERE rnk = 1
    )
    SELECT cluster_id, vec_id, CAST(srn AS BIGINT) AS srn FROM (
        SELECT cluster_id, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster_id
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS srn
        FROM assign
    ) WHERE srn <= 40
    """,
    doc="Cluster-balanced corpus sampling (the cluster-then-sample "
    "curation move: spherical k-means assignment, then an equal quota "
    "of documents per cluster in a DETERMINISTIC pseudo-random order — "
    "md5 of the id, so the sample is reproducible and engine-exact "
    "without a seeded RNG). Scale: the assignment is the broadcast-"
    "centroid map-side argmax; the per-cluster quota is "
    "WindowGroupLimit (rank filter pushes map-side, O(quota) rows per "
    "cluster reach the final shuffle) — never a full sort of a "
    "cluster.",
)
def pipeline_cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cents = _kmeans_seed_centroids(spark, sf_dir)
    assign = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        _argmax_cosine(F.col("embedding"), cents).alias("cluster_id"),
    ).filter(F.col("cluster_id").isNotNull())
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assign.withColumn("srn", F.row_number().over(w))
        .filter(F.col("srn") <= 40)
        .select(
            "cluster_id", "vec_id", F.col("srn").cast("long").alias("srn")
        )
    )


def _ivfpq_topk(
    spark: SparkSession, sf_dir: str, n_probes: int, refine_k: int
) -> DataFrame:
    """IVF-PQ composition (Jegou et al. 2011 §IV, PAPERS.md — the
    canonical billion-scale ANN index): a 16-cell coarse quantizer
    routes each vector to one inverted list, and PQ encodes the
    RESIDUAL x - c(x) (residuals concentrate near the origin, so the
    same code budget quantizes them far more finely than raw vectors).
    Approximate inner product decomposes exactly as
    q.x = q.c(x) + q.r(x): the first term is one scalar per
    (query, probed cell) computed driver-side, the second is 8 LUT
    lookups against the query's residual tables. Each corpus vector
    lives in exactly ONE cell, so multi-probe candidate generation
    emits each (query, vector) pair at most once — no dedup stage at
    all (unlike LSH banding). Candidates shuffle as narrow scalar rows;
    the top refine_k rerank exactly against the full vectors."""
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    n_cells = 16
    seed_rows = e.sample(fraction=0.2, seed=42).limit(n_cells).collect()
    if len(seed_rows) < n_cells:  # tiny fixture fallback
        seed_rows = e.limit(n_cells).collect()
    seed_rows.sort(key=lambda r: r.vec_id)
    cents = [(i, list(r.embedding)) for i, r in enumerate(seed_rows)]
    cmat = np.asarray([c for _, c in cents], dtype=np.float64)

    # residual codebooks: the PQ seed sample's residuals vs the SAME
    # coarse centroids, computed driver-side (bounded: K_CODES rows)
    pq_seed = e.sample(fraction=0.2, seed=7).limit(K_CODES).collect()
    if len(pq_seed) < K_CODES:
        pq_seed = e.limit(K_CODES).collect()
    pq_seed.sort(key=lambda r: r.vec_id)

    class _Row:
        def __init__(self, emb):
            self.embedding = emb

    res_seed = []
    for r in pq_seed:
        x = np.asarray(list(r.embedding), dtype=np.float64)
        cell = int((cmat @ x).argmax())
        res_seed.append(_Row((x - cmat[cell]).tolist()))
    books = _pq_codebooks(res_seed)
    dim_sub = len(books[0][0])

    cent_lit = F.lit([[float(x) for x in c] for _, c in cents])
    assigned = e.withColumn(
        "cell", _argmax_cell(F.col("embedding"), cents)
    )
    residual = F.zip_with(
        F.col("embedding"),
        F.element_at(cent_lit, F.col("cell") + 1),
        lambda a, b: a.cast("double") - b,
    )
    encoded = assigned.select(
        "vec_id",
        "cell",
        _pq_encode(residual, books).alias("codes"),
        norm_col(F.col("embedding")).alias("v_norm"),
    )

    # per query: residual LUT, true norm, and the (qc, probed-cell)
    # coarse terms — all driver-side scalars (Q x n_cells bounded),
    # baked into the vectorized scorer's closure; unprobed (query,
    # cell) pairs are nulled out so only inverted-list members survive
    q_rows = sorted(
        e.filter(F.col("vec_id") < N_QUERY).collect(),
        key=lambda r: r.vec_id,
    )
    luts, q_norms, qids = [], [], []
    n_cells = cmat.shape[0]
    qc_by_cell = np.zeros((len(q_rows), n_cells))
    probe_mask = np.zeros((len(q_rows), n_cells), dtype=bool)
    for qi, r in enumerate(q_rows):
        q = np.asarray(list(r.embedding), dtype=np.float64)
        q_norms.append(float(np.sqrt((q * q).sum())))
        luts.append(
            [
                [
                    float(
                        np.dot(q[m * dim_sub : (m + 1) * dim_sub], code)
                    )
                    for code in books[m]
                ]
                for m in range(M_SUB)
            ]
        )
        qc_all = cmat @ q
        qc_by_cell[qi] = qc_all
        order = np.argsort(-qc_all, kind="stable")[:n_probes]
        probe_mask[qi, order] = True
        qids.append(int(r.vec_id))

    # ADC scoring: numpy LUT gather + coarse-term add per Arrow batch
    # (round 13 — see _adc_scorer); the codes relation stays the only
    # scanned input, no per-(query, cell) row explosion before the scan
    scorer = _adc_scorer(
        luts, q_norms, qc_by_cell=qc_by_cell, probe_mask=probe_mask
    )
    scored = _adc_explode(encoded, scorer, qids, cell_col="cell")
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id")
    )
    cands = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= refine_k)
        .select("query_id", "vec_id")
    )
    qv = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_norm"),
    )
    exact = (
        e.join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * norm_col(F.col("embedding"))),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos_sim",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "sim_ann_ivfpq",
    oracle=None,  # centroid/codebook choice is engine-side; recall vs
    # brute force asserted in tests/test_similarity.py
    doc="Approximate nearest neighbors via IVF-PQ — the coarse "
    "quantizer + residual product quantization COMPOSITION that "
    "billion-scale indexes actually deploy (Jegou 2011 §IV, FAISS "
    "IVFPQ): 16 inverted lists route the scan to 2 probed cells per "
    "query (1/8 of the corpus), residual PQ codes (8 x 4-bit + one "
    "norm) cut the scanned bytes ~16x, and q.x decomposes exactly "
    "into the driver-computed q.centroid scalar plus 8 residual-LUT "
    "lookups. One cell per vector means multi-probe candidates need "
    "no dedup; the ADC top-20 per query rerank exactly. Deterministic "
    "end to end (seeded samples, stable argsort, tie-broken ranks).",
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfpq_topk(spark, sf_dir, n_probes=2, refine_k=REFINE * TOP_K)


@register(
    "sim_ann_ivfpq_exhaustive",
    oracle=_BRUTE_ORACLE,
    doc="IVF-PQ with exhaustive probing (all 16 cells) AND an "
    "exhaustive rerank window — the exact-subset oracle for the "
    "composed pipeline: every vector is a candidate exactly once "
    "(one cell each), so the exact rerank must reproduce brute-force "
    "top-k bit-for-bit. A green hash verifies coarse assignment, "
    "residual computation (JVM zip_with against the broadcast "
    "centroid literal), Arrow-batched residual encoding, the "
    "qc + LUT decomposition plumbing, and the rerank joins; the "
    "recall/probe trade of the real 2-probe index stays covered by "
    "the recall-floor test. Runs the same _ivfpq_topk code as "
    "sim_ann_ivfpq.",
)
def sim_ann_ivfpq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfpq_topk(spark, sf_dir, n_probes=16, refine_k=1_000_000_000)
