"""Prototype (r16): containment candidate pipeline with
(a) build-side positional pre-prune via per-block min probe size, and
(b) per-pair aggregate + lossless suffix bound instead of distinct().

Measures selectivity + wall of each stage at a given fixture.
    python scripts/proto_containment_v2.py /root/repo/.scale/sf3z
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
    release_token_sketch_cache,
)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("proto-containment-v2")
    spark.sparkContext.setLogLevel("ERROR")

    small_vocab, d = _token_sketch(spark, sf_dir)
    d.write.format("noop").mode("overwrite").save()
    assert not small_vocab

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

    # (a) per-(lang, band) minimum probe n_a: a build row with
    # r_b > n_b - ceil(0.8*min_n_a) + 1 can never pass the positional
    # filter for ANY probe doc in the block -> drop it before the join.
    blk_min = (
        d.select(
            "lang",
            probe_band,
            F.col("n_words").alias("n_a"),
        )
        .groupBy("lang", "band")
        .agg(F.min("n_a").alias("min_n_a"))
    )
    pb0 = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_band").alias("band_b"),
        F.col("n_words").alias("n_b"),
        F.posexplode("words").alias("rb0", "wb"),
    ).withColumn("r_b", F.col("rb0") + 1)
    pb = pb0.join(
        F.broadcast(
            blk_min.select(
                F.col("lang").alias("lang_b"),
                F.col("band").alias("band_b"),
                "min_n_a",
            )
        ),
        ["lang_b", "band_b"],
    ).filter(
        F.col("r_b")
        <= F.col("n_b") - F.floor((F.col("min_n_a") * 4 + 4) / 5) + 1
    )

    t0 = time.time()
    n_pb = pb.count()
    print(f"build rows after block-min prune: {n_pb}  ({time.time()-t0:.1f}s)")

    alpha = F.floor((F.col("n_a") * 4 + 4) / 5)
    t0 = time.time()
    matched = (
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
    n_m = matched.count()
    print(f"matched rows post row-filter: {n_m}  ({time.time()-t0:.1f}s)")

    # (b) per-pair aggregate: c = exact count of shared tokens in A's
    # prefix; mrb = max B-position among them. All shared tokens beyond
    # A's prefix are globally more frequent than every matched token, so
    # they sit after mrb in B and after A's prefix in A:
    #   overlap <= c + min(n_a - plen_a, n_b - mrb)
    t0 = time.time()
    agg = matched.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("r_b").alias("mrb"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    plen_a = (
        F.col("n_a") - F.floor((F.col("n_a") * 4 + 4) / 5).cast("int") + 1
    )
    bound = F.col("c") + F.least(
        F.col("n_a") - plen_a, F.col("n_b") - F.col("mrb")
    )
    cand = agg.filter(bound >= alpha).select("id_a", "id_b", "n_a")
    n_cand = cand.count()
    print(f"suffix-bound survivors: {n_cand}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    av = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("words").alias("words_a"),
    )
    bv = d.select(
        F.col("doc_id").alias("id_b"), F.col("words").alias("words_b")
    )
    pairs = cand.join(av, "id_a").join(bv, "id_b")
    inter = F.size(F.array_intersect("words_a", "words_b"))
    out = pairs.filter(inter * 5 >= F.col("n_a") * 4)
    n_out = out.count()
    print(f"verified output pairs: {n_out}  ({time.time()-t0:.1f}s)")

    release_token_sketch_cache()


if __name__ == "__main__":
    main()
