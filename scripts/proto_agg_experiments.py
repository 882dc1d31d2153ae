"""r16 experiments: why does the containment pair-dedup aggregate cost
~120 s at sf3z, and how selective is a Bloom-signature prefilter?

    python scripts/proto_agg_experiments.py /root/repo/.scale/sf3z [exp...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from training_flink_sql_cc_src_spark.session import get_spark
from training_flink_sql_cc_src_spark.queries.llm_dedup import (
    _token_sketch,
)


def build_matched(d):
    probe_band = F.explode(
        F.array(F.col("len_band") - 1, F.col("len_band"), F.col("len_band") + 1)
    ).alias("band")
    plen_expr = F.greatest(
        F.col("n_words") - F.floor((F.col("n_words") * 4 + 4) / 5).cast("int") + 1,
        F.lit(1),
    )
    pa = d.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        probe_band,
        F.col("n_words").alias("n_a"),
        F.posexplode(F.slice("words", F.lit(1), plen_expr)).alias("r0", "w"),
    ).withColumn("r_a", F.col("r0") + 1)
    pb = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_band").alias("band_b"),
        F.col("n_words").alias("n_b"),
        F.posexplode("words").alias("rb0", "wb"),
    ).withColumn("r_b", F.col("rb0") + 1)
    alpha = F.floor((F.col("n_a") * 4 + 4) / 5)
    return (
        pa.hint("merge")
        .join(
            pb.hint("merge"),
            (F.col("lang") == F.col("lang_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("w") == F.col("wb")),
        )
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("n_b") * 5 >= F.col("n_a") * 4)
            & (
                1
                + F.least(
                    F.col("n_a") - F.col("r_a"), F.col("n_b") - F.col("r_b")
                )
                >= alpha
            )
        )
    )


def main() -> None:
    sf_dir = sys.argv[1]
    exps = sys.argv[2:] or ["base", "parts", "pairkey", "bloom"]
    spark = get_spark("proto-agg-exp")
    spark.sparkContext.setLogLevel("ERROR")

    small_vocab, d = _token_sketch(spark, sf_dir)
    d.write.format("noop").mode("overwrite").save()
    assert not small_vocab

    if "base" in exps:
        m = build_matched(d)
        t0 = time.time()
        n = m.select("id_a", "id_b").distinct().count()
        print(f"[base] distinct 32 parts: {n}  ({time.time()-t0:.1f}s)")

    if "parts" in exps:
        spark.conf.set("spark.sql.shuffle.partitions", "256")
        m = build_matched(d)
        t0 = time.time()
        n = m.select("id_a", "id_b").distinct().count()
        print(f"[parts] distinct 256 parts: {n}  ({time.time()-t0:.1f}s)")
        spark.conf.set("spark.sql.shuffle.partitions", "32")

    if "pairkey" in exps:
        # single 128-bit-ish pair key: two ids packed into one long pair
        # struct vs two columns — does the agg key width matter?
        m = build_matched(d)
        t0 = time.time()
        n = (
            m.select(
                (F.col("id_a") * F.lit(1 << 20) + F.col("id_b")).alias("pk")
            )
            .distinct()
            .count()
        )
        print(f"[pairkey] distinct packed key: {n}  ({time.time()-t0:.1f}s)")

    if "bloom" in exps:
        # selectivity of a 256-bit token-set signature as an upper bound:
        # shared(A,B) <= |{t in A : bit(t) set in sig_b}|
        sig = d.select(
            F.col("doc_id").alias("id_b"),
            *[
                F.expr(
                    "aggregate(filter(words, w -> "
                    f"pmod(shiftrightunsigned(w, 6), 4) = {i}), 0L, "
                    "(acc, w) -> acc | shiftleft(1L, int(pmod(w, 64))))"
                ).alias(f"sb{i}")
                for i in range(4)
            ],
        )
        m = build_matched(d)
        cand = m.groupBy("id_a", "id_b").agg(F.first("n_a").alias("n_a"))
        av = d.select(
            F.col("doc_id").alias("id_a"), F.col("words").alias("words_a")
        )
        t0 = time.time()
        withsig = cand.join(sig, "id_b").join(av, "id_a")
        hit = F.expr(
            "size(filter(words_a, w -> ("
            "shiftrightunsigned(CASE pmod(shiftrightunsigned(w, 6), 4) "
            "WHEN 0 THEN sb0 WHEN 1 THEN sb1 WHEN 2 THEN sb2 ELSE sb3 END, "
            "int(pmod(w, 64))) & 1L) = 1L))"
        )
        surv = withsig.filter(hit * 5 >= F.col("n_a") * 4)
        n = surv.count()
        print(f"[bloom] survivors of 256-bit sig bound: {n}  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
