"""[C] ORACLE-PAIRED recall@k for each ANN family (VERDICT r10 #3).

The production ANN queries (queries/llm_similarity.py: sim_ann_lsh /
ivf / pq / ivfpq) are rows-only by design — their index state (random
hyperplanes, sampled centroids, BLAS-order matmuls) is engine-side and
not reproducible in ANSI SQL. These SIBLINGS close that contract gap:
each implements the same retrieval structure with a SQL-derivable
index — anchors, coarse centroids, and PQ codebooks taken from FIXED
corpus rows (vec_id ranges), every float produced by the repo's
deterministic left-fold dot product (queries/_util.dot_col == dot_sql,
bit-identical IEEE doubles across engines) — and emits the
deterministic relation (query_id, recall_at_k) against the brute-force
truth, which DuckDB recomputes end-to-end: index build, retrieval,
truth, and the recall join all hash-match.

A coarse quantizer does not need k-means to be an IVF (FAISS accepts
arbitrary coarse quantizers); seeded-row centroids keep the exact plan
shape — broadcast centroid relation, map-side assignment, equi-join
candidate generation, windowed top-k — while making every intermediate
SQL-expressible.

100 TB: corpus-sized relations are only ever on the probe side of
broadcast joins (centroids/anchors/codebooks/queries are all
vec_id-range-bounded: 8-16 rows); assignment and encoding are map-side
with partial-aggregate argmin/argmax; candidate generation is an equi
join on cell/bucket/code keys. The brute-force truth side is the one
corpus×queries scan — the same cost contract as sim_topk_bruteforce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import cosine_sql, dot_col, dot_sql, fan_out, norm_col, t
from .llm_similarity import N_QUERY, TOP_K

#: fixed index rows: anchors (LSH planes / PQ codebooks) and coarse
#: centroids are corpus vectors at known vec_ids — SQL can select the
#: identical rows, so the index is reproducible in both engines
ANCHORS = (N_QUERY, N_QUERY + 8)        # vec_id 8..15  (8 anchors)
CENTS = (N_QUERY, N_QUERY + 16)         # vec_id 8..23  (16 cells)
M_SUB, DIM_SUB, K_CODES = 8, 8, 8       # 64-dim -> 8 subspaces, 8 codes
REFINE_K = 4 * TOP_K                    # ADC shortlist before exact rerank

_DOT8 = lambda a, b: dot_sql(a, b, DIM_SUB)  # noqa: E731


# --------------------------------------------------------- shared SQL pieces

_SQL_TRUTH = f"""
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id < {N_QUERY}
),
pairs AS (
    SELECT q.query_id, v.vec_id AS neighbor_id,
           {cosine_sql('q.q_emb', 'v.embedding')} AS cos_sim
    FROM q INNER JOIN embeddings v ON v.vec_id <> q.query_id
),
truth AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM pairs) WHERE rnk <= {TOP_K}
)"""

_SQL_RECALL_TAIL = f"""
SELECT t.query_id AS query_id,
       CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM truth t
LEFT JOIN ann a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id
"""


def _pairs(e: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cos_sim) for every query x corpus pair —
    the exact-score relation truth ranking and reranks share (norms
    precomputed per side; doubles identical to cosine_sql)."""
    corpus = e.select(
        "vec_id", "embedding", norm_col(F.col("embedding")).alias("v_norm")
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_norm"),
    )
    return (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )


def _truth(pairs: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def _recall(truth: DataFrame, ann: DataFrame) -> DataFrame:
    """recall@k per query: COUNT of ann hits among the truth rows / k —
    an exact long/int division cast to double, hash-identical."""
    return (
        truth.join(
            ann.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            (F.count("hit").cast("double") / F.lit(TOP_K)).alias(
                "recall_at_k"
            )
        )
    )


def _topk_exact(cand: DataFrame, pairs: DataFrame, k: int) -> DataFrame:
    """Exact-cosine top-k of a (query_id, neighbor_id) candidate set."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(pairs, ["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )


# ------------------------------------------------------------------ IVF-flat


@register(
    "sim_ann_ivf_recall",
    oracle=f"""
    WITH {_SQL_TRUTH},
    cents AS (
        SELECT vec_id AS cid, embedding AS cemb FROM embeddings
        WHERE vec_id >= {CENTS[0]} AND vec_id < {CENTS[1]}
    ),
    vc AS (
        SELECT v.vec_id AS vec_id, c.cid AS cid,
               {dot_sql('v.embedding', 'c.cemb')} AS d
        FROM embeddings v CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
            FROM vc) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
            FROM vc WHERE vec_id < {N_QUERY}) WHERE rn <= 2
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY s.cos_sim DESC, a.vec_id) AS rnk
            FROM probes p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN pairs s ON s.query_id = p.query_id
                        AND s.neighbor_id = a.vec_id
        ) WHERE rnk <= {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="recall@5 of IVF-flat retrieval vs brute-force truth (VERDICT "
    "r10 #3): coarse cells are 16 FIXED corpus rows (vec_id 8..23), "
    "assignment is argmax dot per vector (map-side partial struct-min "
    "over a broadcast centroid cross join), queries probe their 2 best "
    "cells, in-cell candidates rank by exact cosine. Every float is "
    "the deterministic left-fold dot, so DuckDB reproduces the INDEX "
    "itself, not just the truth — the recall value hash-matches.",
)
def sim_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    pairs = _pairs(e)
    cents = e.filter(
        (F.col("vec_id") >= CENTS[0]) & (F.col("vec_id") < CENTS[1])
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb"))
    # centroid relation is vec_id-range-bounded (16 rows by construction)
    # -> broadcast cross join is the map-side assignment scan
    vc = (
        fan_out(e.select("vec_id", "embedding"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d", dot_col(F.col("embedding"), F.col("cemb")))
        .select("vec_id", "cid", "d")
    )
    assigned = (
        vc.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (F.col("d") * -1).alias("nd"), F.col("cid").alias("cid")
                )
            ).alias("best")
        )
        .select("vec_id", F.col("best.cid").alias("cell"))
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), "cid")
    probes = (
        vc.filter(F.col("vec_id") < N_QUERY)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"))
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ann = _topk_exact(cand, pairs, TOP_K)
    return _recall(_truth(pairs), ann)


# ------------------------------------------------------------- sign-bit LSH


@register(
    "sim_ann_lsh_recall",
    oracle=f"""
    WITH {_SQL_TRUTH},
    anch AS (
        SELECT vec_id - {ANCHORS[0]} AS aid, embedding AS aemb
        FROM embeddings
        WHERE vec_id >= {ANCHORS[0]} AND vec_id < {ANCHORS[1]}
    ),
    bits AS (
        SELECT v.vec_id AS vec_id,
               SUM(CASE WHEN {dot_sql('v.embedding', 'a.aemb')} >= 0
                        THEN (1 << a.aid) ELSE 0 END) AS bucket
        FROM embeddings v CROSS JOIN anch a
        GROUP BY v.vec_id
    ),
    bands AS (
        SELECT vec_id, b.band,
               CASE WHEN b.band = 0 THEN bucket & 15
                    ELSE (bucket >> 4) & 15 END AS band_bits
        FROM bits CROSS JOIN (VALUES (0), (1)) b(band)
    ),
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id AS neighbor_id
        FROM bands qb
        JOIN bands vb ON vb.band = qb.band
                     AND vb.band_bits = qb.band_bits
                     AND vb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {N_QUERY}
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT c.query_id, c.neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY s.cos_sim DESC, c.neighbor_id) AS rnk
            FROM cand c
            JOIN pairs s ON s.query_id = c.query_id
                        AND s.neighbor_id = c.neighbor_id
        ) WHERE rnk <= {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="recall@5 of sign-bit LSH retrieval vs brute-force truth "
    "(VERDICT r10 #3): the 8 'hyperplanes' are FIXED corpus rows "
    "(vec_id 8..15), bit b = sign of the deterministic left-fold "
    "dot(v, anchor_b) — identical doubles in both engines, so the "
    "bucket ids (and thus candidates, ranking, recall) hash-match; "
    "candidates share either 4-bit band of the 8-bit signature. "
    "Bucketing is a map-side broadcast join + integer fold; the band "
    "join is equi on (band, band_bits) — the production sim_ann_lsh "
    "plan shape with a SQL-reproducible plane matrix.",
)
def sim_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    pairs = _pairs(e)
    anch = e.filter(
        (F.col("vec_id") >= ANCHORS[0]) & (F.col("vec_id") < ANCHORS[1])
    ).select(
        (F.col("vec_id") - ANCHORS[0]).alias("aid"),
        F.col("embedding").alias("aemb"),
    )
    bits = (
        fan_out(e.select("vec_id", "embedding"))
        .crossJoin(F.broadcast(anch))
        .withColumn("d", dot_col(F.col("embedding"), F.col("aemb")))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN d >= 0 THEN shiftleft(1, aid) ELSE 0 END")
            ).alias("bucket")
        )
    )
    bands = bits.select(
        "vec_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("bucket").bitwiseAND(F.lit(15)).alias("band_bits"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftright(F.col("bucket"), 4)
                    .bitwiseAND(F.lit(15))
                    .alias("band_bits"),
                ),
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.band_bits")
    qb = bands.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), "band", "band_bits"
    )
    cand = (
        bands.join(F.broadcast(qb), ["band", "band_bits"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    ann = _topk_exact(cand, pairs, TOP_K)
    return _recall(_truth(pairs), ann)


# ----------------------------------------------------------------- PQ / ADC

_SQL_PQ_CODEBOOK = f"""
subs AS (SELECT CAST(m AS INT) AS m FROM range({M_SUB}) t(m)),
codes AS (
    SELECT s.m AS m, CAST(a.vec_id - {ANCHORS[0]} AS INT) AS k,
           a.embedding[s.m*{DIM_SUB}+1 : s.m*{DIM_SUB}+{DIM_SUB}] AS cw
    FROM (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id >= {ANCHORS[0]} AND vec_id < {ANCHORS[1]}) a
    CROSS JOIN subs s
),
codes_n AS (SELECT m, k, cw, {_DOT8('cw', 'cw')} AS cwn FROM codes),
vsub AS (
    SELECT v.vec_id AS vec_id, s.m AS m,
           v.embedding[s.m*{DIM_SUB}+1 : s.m*{DIM_SUB}+{DIM_SUB}] AS sub
    FROM embeddings v CROSS JOIN subs s
)"""

#: left-associated 8-term fold — matches Spark's F.aggregate(...) fold
#: (((0.0+v1)+v2)+...)+v8 bit-for-bit
_SQL_ADC_FOLD = "(0.0 + " + " + ".join(
    f"vals[{i}]" for i in range(1, M_SUB + 1)
) + ")"


def _spark_pq_relations(spark: SparkSession, e: DataFrame):
    """(codes_n, vsub): the broadcastable codebook relation (m, k, cw,
    cwn) and the per-(vector, subspace) slice relation — the shared
    skeleton of the PQ and IVF-PQ recall queries."""
    subs = spark.range(M_SUB).select(F.col("id").cast("int").alias("m"))
    anch = e.filter(
        (F.col("vec_id") >= ANCHORS[0]) & (F.col("vec_id") < ANCHORS[1])
    ).select(
        (F.col("vec_id") - ANCHORS[0]).cast("int").alias("k"),
        F.col("embedding").alias("aemb"),
    )
    codes = (
        anch.crossJoin(F.broadcast(subs))
        .withColumn("cw", F.expr(f"slice(aemb, m*{DIM_SUB}+1, {DIM_SUB})"))
        .select("m", "k", "cw")
    )
    codes_n = codes.withColumn("cwn", dot_col(F.col("cw"), F.col("cw")))
    vsub = (
        fan_out(e.select("vec_id", "embedding"))
        .crossJoin(F.broadcast(subs))
        .withColumn(
            "sub", F.expr(f"slice(embedding, m*{DIM_SUB}+1, {DIM_SUB})")
        )
        .select("vec_id", "m", "sub")
    )
    return codes_n, vsub


def _adc_fold_col():
    """Ordered 8-term left fold of the collected (m, val) structs —
    deterministic aggregation order, unlike a plain SUM over doubles."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "val"))),
            lambda s: s["val"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register(
    "sim_ann_pq_recall",
    oracle=f"""
    WITH {_SQL_TRUTH},
    {_SQL_PQ_CODEBOOK},
    vdist AS (
        SELECT vs.vec_id, vs.m, c.k,
               (c.cwn - 2.0 * {_DOT8('vs.sub', 'c.cw')}) AS dist
        FROM vsub vs JOIN codes_n c ON c.m = vs.m
    ),
    enc AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, m ORDER BY dist ASC, k) AS rn
            FROM vdist) WHERE rn = 1
    ),
    lut AS (
        SELECT vs.vec_id AS query_id, vs.m, c.k,
               {_DOT8('vs.sub', 'c.cw')} AS val
        FROM vsub vs JOIN codes_n c ON c.m = vs.m
        WHERE vs.vec_id < {N_QUERY}
    ),
    adc AS (
        SELECT query_id, neighbor_id, {_SQL_ADC_FOLD} AS adc FROM (
            SELECT l.query_id, e.vec_id AS neighbor_id,
                   list(l.val ORDER BY l.m) AS vals
            FROM enc e
            JOIN lut l ON l.m = e.m AND l.k = e.code
            WHERE e.vec_id <> l.query_id
            GROUP BY l.query_id, e.vec_id)
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc DESC, neighbor_id) AS rn
            FROM adc) WHERE rn <= {REFINE_K}
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT sl.query_id, sl.neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY sl.query_id
                       ORDER BY p.cos_sim DESC, sl.neighbor_id) AS rnk
            FROM shortlist sl
            JOIN pairs p ON p.query_id = sl.query_id
                        AND p.neighbor_id = sl.neighbor_id
        ) WHERE rnk <= {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="recall@5 of PQ-ADC retrieval vs brute-force truth (VERDICT "
    "r10 #3; Jegou 2011): 8 subspaces x 8 codes, codebooks are the "
    "subvectors of 8 FIXED corpus rows (vec_id 8..15); encode = argmin "
    "||sub-cw||^2 via the cwn - 2*dot identity; ADC = 8 LUT lookups "
    "folded in subspace order (a LEFT-ASSOCIATED fold, not a plain "
    "SUM, so the double is aggregation-order-deterministic and "
    "hash-matches DuckDB's explicit 8-term sum); top-20 ADC shortlist "
    "reranked exactly. The full PQ pipeline — encode, LUT, ADC rank, "
    "rerank, recall — reproduces bit-for-bit in SQL.",
)
def sim_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    pairs = _pairs(e)
    codes_n, vsub = _spark_pq_relations(spark, e)
    vdist = vsub.join(F.broadcast(codes_n), "m").withColumn(
        "dist",
        F.col("cwn") - F.lit(2.0) * dot_col(F.col("sub"), F.col("cw")),
    )
    enc = (
        vdist.groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(F.col("dist").alias("dist"), F.col("k").alias("k"))
            ).alias("best")
        )
        .select("vec_id", "m", F.col("best.k").alias("code"))
    )
    lut = (
        vsub.filter(F.col("vec_id") < N_QUERY)
        .join(F.broadcast(codes_n), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "k",
            dot_col(F.col("sub"), F.col("cw")).alias("val"),
        )
    )
    lutr = lut.withColumnRenamed("m", "lm").withColumnRenamed("k", "lk")
    adc = (
        enc.join(
            F.broadcast(lutr),
            (F.col("lm") == F.col("m")) & (F.col("lk") == F.col("code")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(_adc_fold_col().alias("adc"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= REFINE_K)
        .select("query_id", "neighbor_id")
    )
    ann = _topk_exact(shortlist, pairs, TOP_K)
    return _recall(_truth(pairs), ann)


# ----------------------------------------------------------- IVF-PQ (resid)


@register(
    "sim_ann_ivfpq_recall",
    oracle=f"""
    WITH {_SQL_TRUTH},
    {_SQL_PQ_CODEBOOK},
    cents AS (
        SELECT vec_id AS cid, embedding AS cemb FROM embeddings
        WHERE vec_id >= {CENTS[0]} AND vec_id < {CENTS[1]}
    ),
    vc AS (
        SELECT v.vec_id AS vec_id, c.cid AS cid,
               {dot_sql('v.embedding', 'c.cemb')} AS d
        FROM embeddings v CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
            FROM vc) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
            FROM vc WHERE vec_id < {N_QUERY}) WHERE rn <= 2
    ),
    csub AS (
        SELECT c.cid, s.m,
               c.cemb[s.m*{DIM_SUB}+1 : s.m*{DIM_SUB}+{DIM_SUB}] AS sub
        FROM cents c CROSS JOIN subs s
    ),
    cdot AS (
        SELECT cs.cid, cs.m, c.k, {_DOT8('cs.sub', 'c.cw')} AS dc
        FROM csub cs JOIN codes_n c ON c.m = cs.m
    ),
    vdot AS (
        SELECT vs.vec_id, vs.m, c.k, c.cwn,
               {_DOT8('vs.sub', 'c.cw')} AS dv
        FROM vsub vs JOIN codes_n c ON c.m = vs.m
    ),
    enc AS (
        SELECT vec_id, m, k AS code FROM (
            SELECT vd.vec_id, vd.m, vd.k,
                   ROW_NUMBER() OVER (
                       PARTITION BY vd.vec_id, vd.m
                       ORDER BY (vd.cwn - 2.0 * (vd.dv - cd.dc)) ASC,
                                vd.k) AS rn
            FROM vdot vd
            JOIN assigned a ON a.vec_id = vd.vec_id
            JOIN cdot cd ON cd.cid = a.cell AND cd.m = vd.m
                        AND cd.k = vd.k
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT p.query_id, p.cell, vd.m, vd.k, (vd.dv - cd.dc) AS val
        FROM probes p
        JOIN vdot vd ON vd.vec_id = p.query_id
        JOIN cdot cd ON cd.cid = p.cell AND cd.m = vd.m AND cd.k = vd.k
    ),
    adc AS (
        SELECT query_id, neighbor_id, {_SQL_ADC_FOLD} AS adc FROM (
            SELECT l.query_id, a.vec_id AS neighbor_id,
                   list(l.val ORDER BY l.m) AS vals
            FROM probes p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN enc e ON e.vec_id = a.vec_id
            JOIN lut l ON l.query_id = p.query_id AND l.cell = p.cell
                      AND l.m = e.m AND l.k = e.code
            GROUP BY l.query_id, a.vec_id)
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc DESC, neighbor_id) AS rn
            FROM adc) WHERE rn <= {REFINE_K}
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT sl.query_id, sl.neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY sl.query_id
                       ORDER BY p.cos_sim DESC, sl.neighbor_id) AS rnk
            FROM shortlist sl
            JOIN pairs p ON p.query_id = sl.query_id
                        AND p.neighbor_id = sl.neighbor_id
        ) WHERE rnk <= {TOP_K}
    )
    {_SQL_RECALL_TAIL}
    """,
    doc="recall@5 of residual IVF-PQ retrieval vs brute-force truth "
    "(VERDICT r10 #3; Jegou 2011 composition): coarse cells = 16 fixed "
    "corpus rows; each vector PQ-encodes its RESIDUAL against its "
    "cell's centroid via the dot-identity dist = cwn - 2*(dv - dc) "
    "(dv, dc both left-fold dots, so DuckDB reproduces the codes); "
    "query LUTs are per probed cell (residual dv - dc), ADC is the "
    "order-deterministic 8-term fold, top-20 shortlist reranked "
    "exactly. Index build, probing, residual encode, ADC, rerank, and "
    "the recall join all hash-match.",
)
def sim_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    pairs = _pairs(e)
    codes_n, vsub = _spark_pq_relations(spark, e)
    cents = e.filter(
        (F.col("vec_id") >= CENTS[0]) & (F.col("vec_id") < CENTS[1])
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb"))
    subs = spark.range(M_SUB).select(F.col("id").cast("int").alias("m"))
    vc = (
        fan_out(e.select("vec_id", "embedding"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d", dot_col(F.col("embedding"), F.col("cemb")))
        .select("vec_id", "cid", "d")
    )
    assigned = (
        vc.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (F.col("d") * -1).alias("nd"), F.col("cid").alias("cid")
                )
            ).alias("best")
        )
        .select("vec_id", F.col("best.cid").alias("cell"))
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), "cid")
    probes = (
        vc.filter(F.col("vec_id") < N_QUERY)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"))
    )
    csub = (
        cents.crossJoin(F.broadcast(subs))
        .withColumn("sub", F.expr(f"slice(cemb, m*{DIM_SUB}+1, {DIM_SUB})"))
        .select("cid", "m", "sub")
    )
    # centroid-side and code-side columns carry distinct names (cm/ck,
    # lm/lk) so every join below resolves unambiguously
    cdot = (
        csub.join(F.broadcast(codes_n), "m")
        .select(
            "cid",
            F.col("m").alias("cm"),
            F.col("k").alias("ck"),
            dot_col(F.col("sub"), F.col("cw")).alias("dc"),
        )
    )
    vdot = vsub.join(F.broadcast(codes_n), "m").select(
        "vec_id",
        "m",
        "k",
        "cwn",
        dot_col(F.col("sub"), F.col("cw")).alias("dv"),
    )
    enc = (
        vdot.join(assigned, "vec_id")
        .join(
            F.broadcast(cdot),
            (F.col("cell") == F.col("cid"))
            & (F.col("m") == F.col("cm"))
            & (F.col("k") == F.col("ck")),
        )
        .withColumn(
            "dist",
            F.col("cwn") - F.lit(2.0) * (F.col("dv") - F.col("dc")),
        )
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(F.col("dist").alias("dist"), F.col("k").alias("k"))
            ).alias("best")
        )
        .select("vec_id", "m", F.col("best.k").alias("code"))
    )
    lut = (
        F.broadcast(probes)
        .join(
            vdot.withColumnRenamed("vec_id", "qv"),
            F.col("query_id") == F.col("qv"),
        )
        .join(
            F.broadcast(cdot),
            (F.col("cell") == F.col("cid"))
            & (F.col("m") == F.col("cm"))
            & (F.col("k") == F.col("ck")),
        )
        .select(
            F.col("query_id").alias("lq"),
            F.col("cell").alias("lcell"),
            F.col("m").alias("lm"),
            F.col("k").alias("lk"),
            (F.col("dv") - F.col("dc")).alias("val"),
        )
    )
    adc = (
        F.broadcast(probes)
        .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(
            enc.withColumnRenamed("vec_id", "ev"),
            F.col("ev") == F.col("neighbor_id"),
        )
        .join(
            F.broadcast(lut),
            (F.col("lq") == F.col("query_id"))
            & (F.col("lcell") == F.col("cell"))
            & (F.col("lm") == F.col("m"))
            & (F.col("lk") == F.col("code")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(_adc_fold_col().alias("adc"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= REFINE_K)
        .select("query_id", "neighbor_id")
    )
    ann = _topk_exact(shortlist, pairs, TOP_K)
    return _recall(_truth(pairs), ann)
