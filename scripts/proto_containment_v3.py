"""r16 prototype v3: containment with per-doc 256-bit token-set masks
riding the posting rows; a lossless codegen upper bound on |A inter B|
prunes matched rows BEFORE the pair-dedup aggregate:

  |A inter B| <= sum_i bit_count(ma_i & mb_i)
                 + min(n_a - popcount(ma), n_b - popcount(mb))

(each shared token sets a common bit; tokens lost to within-doc bit
collisions are bounded by n - popcount(mask) on either side).

    python scripts/proto_containment_v3.py /root/repo/.scale/sf3z [k_longs]
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
from bench import run_one


def containment_v3(spark, sf_dir, k_longs=4):
    small_vocab, d = _token_sketch(spark, sf_dir)
    assert not small_vocab

    # per-doc k_longs*64-bit token-set mask + collision-correction count
    mask_cols = [
        F.expr(
            f"aggregate(filter(words, w -> (shiftrightunsigned(w, 6) & "
            f"{k_longs - 1}) = {i}), 0L, "
            "(acc, w) -> acc | shiftleft(1L, int(w & 63)))"
        ).alias(f"m{i}")
        for i in range(k_longs)
    ]
    dm = d.select("doc_id", "lang", "len_band", "n_words", "words", *mask_cols)
    pc = sum(F.bit_count(F.col(f"m{i}")) for i in range(k_longs))
    dm = dm.withColumn("cc", F.col("n_words") - pc)

    probe_band = F.explode(
        F.array(F.col("len_band") - 1, F.col("len_band"), F.col("len_band") + 1)
    ).alias("band")
    plen_expr = F.greatest(
        F.col("n_words") - F.floor((F.col("n_words") * 4 + 4) / 5).cast("int") + 1,
        F.lit(1),
    )
    pa = dm.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        probe_band,
        F.col("n_words").alias("n_a"),
        F.col("cc").alias("cc_a"),
        *[F.col(f"m{i}").alias(f"ma{i}") for i in range(k_longs)],
        F.posexplode(F.slice("words", F.lit(1), plen_expr)).alias("r0", "w"),
    ).withColumn("r_a", F.col("r0") + 1)
    pb = dm.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_band").alias("band_b"),
        F.col("n_words").alias("n_b"),
        F.col("cc").alias("cc_b"),
        *[F.col(f"m{i}").alias(f"mb{i}") for i in range(k_longs)],
        F.posexplode("words").alias("rb0", "wb"),
    ).withColumn("r_b", F.col("rb0") + 1)

    alpha = F.floor((F.col("n_a") * 4 + 4) / 5)
    inter_bound = sum(
        F.bit_count(F.col(f"ma{i}").bitwiseAND(F.col(f"mb{i}")))
        for i in range(k_longs)
    ) + F.least("cc_a", "cc_b")
    cand = (
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
            & (inter_bound >= alpha)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    av = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("words").alias("words_a"),
        F.col("n_words").alias("n_a"),
    )
    bv = d.select(
        F.col("doc_id").alias("id_b"), F.col("words").alias("words_b")
    )
    pairs = cand.join(av, "id_a").join(bv, "id_b")
    inter = F.size(F.array_intersect("words_a", "words_b"))
    return (
        pairs.filter(inter * 5 >= F.col("n_a") * 4)
        .withColumn("containment", inter.cast("double") / F.col("n_a"))
        .select("id_a", "id_b", "containment")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    k_longs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("proto-containment-v3")
    spark.sparkContext.setLogLevel("ERROR")
    _token_sketch(spark, sf_dir)
    fn = lambda s, sd: containment_v3(s, sd, k_longs)  # noqa: E731
    times = [run_one(spark, fn, sf_dir) for _ in range(2)]
    print(f"containment_v3 k={k_longs}: {[round(t,2) for t in times]}")


if __name__ == "__main__":
    main()
