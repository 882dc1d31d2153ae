"""Scale-fixture generator (VERDICT r9 #1): tile a driver sf dir by an
integer FACTOR into a larger benchmark fixture, preserving the data's
statistical shape the way a real corpus grows.

    python scripts/gen_scale.py 10 /root/testdata/sf0.1 .scale/sf1

Design — each source table is crossed with a FACTOR-row replica
dimension (a broadcast map-side explode, no shuffle) and every replica
gets disjoint key spaces so referential integrity and join selectivity
are preserved EXACTLY (an orders row in replica r joins the customer
replica r carried from the same source row):

- region/nation: fixed dims, copied once (real catalogs don't grow 10x).
- customer/supplier/part/orders/lineitem: all keys (PK and FK alike)
  offset by r * (source table's key cardinality).
- events: event_id/user_id offset; ts shifted by r * 31 days — the
  stream grows forward in time with constant per-key density, so
  windowed state per key stays flat while window COUNT scales (the
  realistic growth mode for an event stream).
- documents: doc_id offset; replica r > 0 rotates the vocabulary
  (token w -> w§<r>; the separator keeps rotation injective — plain
  digit suffixing collided replica tokens, ADVICE r10), so
  within-replica duplicate/near-dup structure is preserved verbatim
  while replicas share no tokens — near-dup TRUTH grows linearly, as
  new real content does, instead of every replica being a spurious
  duplicate of replica 0. (Blocking keys like (lang, len_band) still
  mix replicas, so blocked candidate generation sees honest block
  growth.) n_chars is recomputed from the new text. With --zipf,
  Zipf-distributed stopwords shared across the WHOLE corpus are
  additionally injected per doc (bounded so cross-replica pairs stay
  below every registry threshold) — the heavy-hitter posting-list
  distribution real text has and the flat rotation lacks (VERDICT r10
  #3).
- embeddings: vec_id offset; the vector is rolled by r positions
  (norm-preserving, direction-changing), so ANN neighborhoods grow
  linearly instead of collapsing into 10-way exact ties.

Output tables are parquet DIRECTORIES (one per table name, written by
Spark with multiple part files) — splittable scans with no relayout
spool needed. This is a PERFORMANCE fixture: bench.py runs on it
unchanged; correctness stays on the driver's oracle-checked sf dirs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# key column -> source cardinality is derived from the data (max+1), so
# the generator works on any sf input. Columns listed per table are the
# ones that live in that key space (PK and FKs elsewhere share entries).
KEY_SPACES = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_ONCE = ("region", "nation")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _cardinalities(spark: SparkSession, src: str) -> dict[str, int]:
    card: dict[str, int] = {}
    for table, col in set(KEY_SPACES.values()):
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        card[col] = int(df.agg(F.max(col)).first()[0]) + 1
    return card


#: Zipf stopword vocabulary size and per-doc injection bound. Stopword
#: rank is drawn log-uniformly over [1, ZIPF_VOCAB] (density ~ 1/k —
#: Zipf s=1), so rank-1 lands in ~1/log(V) ≈ 10% of injected slots and
#: its corpus-wide posting list is huge: exactly the distribution that
#: stresses token-cooccurrence candidate plans (VERDICT r10 #1/#3).
ZIPF_VOCAB = 1024


def _inject_zipf_stopwords(out: DataFrame) -> DataFrame:
    """Append Zipf-distributed stopword tokens to each document's text
    (zipf mode). Per doc, s = floor(n_distinct/4) stopwords are drawn
    deterministically from a hash of (doc_id, slot); the stopword
    vocabulary ('zz§§<rank>') is SHARED across replicas — heavy-hitter
    posting lists span the whole corpus, as in real Zipfian text.

    Truth stays replica-linear BY BOUND, not by token disjointness:
    cross-replica pairs can only share stopwords, and per doc the
    distinct-stopword count is <= n_distinct/4, so cross-replica
    containment <= (n/4)/(n + s_d) < 0.8 and Jaccard
    <= (n/4)/(2n) < 0.6 — no spurious cross-replica truth at the
    registry thresholds. Within-replica scores do shift vs the source
    corpus (the injected tokens join each side's sets); correctness on
    the zipf fixture is checked against the quadratic oracle ON the
    fixture itself, so the truth is whatever the corpus holds."""
    words = F.split("text", " ")
    n_distinct = F.size(F.array_distinct(words))
    s = F.floor(n_distinct / 4).cast("int")
    stop_arr = F.when(
        s >= 1,
        F.transform(
            F.sequence(F.lit(1), s),
            lambda i: F.concat(
                F.lit("zz§§"),
                F.ceil(
                    F.pow(
                        F.lit(float(ZIPF_VOCAB)),
                        F.pmod(
                            F.xxhash64(F.col("doc_id"), F.col("__r"), i),
                            F.lit(1 << 20),
                        )
                        / F.lit(float(1 << 20)),
                    )
                ).cast("string"),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return out.withColumn(
        "text",
        F.when(
            F.size(stop_arr) > 0,
            F.concat(F.col("text"), F.lit(" "), F.array_join(stop_arr, " ")),
        ).otherwise(F.col("text")),
    )


def _tile(
    spark: SparkSession,
    src: str,
    name: str,
    factor: int,
    card: dict[str, int],
    zipf: bool = False,
) -> DataFrame:
    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in COPY_ONCE:
        return df
    rep = F.broadcast(spark.range(factor).select(F.col("id").alias("__r")))
    out = df.crossJoin(rep)
    for col in df.columns:
        space = KEY_SPACES.get(col)
        if space is not None:
            out = out.withColumn(
                col, F.col(col) + F.col("__r") * F.lit(card[space[1]])
            )
    if name == "events":
        # interval arithmetic works on both TIMESTAMP and TIMESTAMP_NTZ
        # (the raw driver parquet encodes ts as NTZ) and preserves the
        # source type, so the fixture loader's normalization still applies
        out = out.withColumn(
            "ts", F.expr("ts + make_dt_interval(__r * 31, 0, 0, 0)")
        )
    if name == "documents":
        # '§' separator: plain digit suffixing is not injective
        # (replica-0 'tok11' == 'tok1'+'1'; for FACTOR >= 10,
        # 'x1'+'1' in r=1 == 'x'+'11' in r=11), which injected spurious
        # cross-replica near-dup truth (ADVICE r10). Source tokens are
        # ASCII, so the separator cannot appear in them.
        rotated = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.concat(
                    w, F.lit("§"), F.col("__r").cast("string")
                ),
            ),
            " ",
        )
        out = out.withColumn(
            "text", F.when(F.col("__r") == 0, F.col("text")).otherwise(rotated)
        )
        if zipf:
            out = _inject_zipf_stopwords(out)
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        dim = len(df.select("embedding").first()[0])
        roll = F.concat(
            F.expr(f"slice(embedding, __r + 1, {dim} - __r)"),
            F.expr("slice(embedding, 1, __r)"),
        )
        out = out.withColumn(
            "embedding",
            F.when(F.col("__r") == 0, F.col("embedding")).otherwise(roll),
        )
    return out.drop("__r")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--zipf"]
    zipf = "--zipf" in sys.argv[1:]
    factor = int(args[0])
    src = args[1]
    dst = args[2]
    from training_flink_sql_cc_src_spark.session import get_spark

    spark = get_spark("spark-graft-genscale")
    spark.sparkContext.setLogLevel("ERROR")
    card = _cardinalities(spark, src)
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        out = _tile(spark, src, name, factor, card, zipf=zipf)
        n_parts = 1 if name in COPY_ONCE else min(16, max(4, factor))
        path = os.path.join(dst, f"{name}.parquet")
        out.repartition(n_parts).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path}")


if __name__ == "__main__":
    main()
