"""Instrumented profile of dedup_containment_pairs at a given fixture:
counts each stage of the large-vocab prefix-filter pipeline so the r16
optimization targets the real cost driver (guide §1 measure-first).

    python scripts/profile_containment.py /root/repo/.scale/sf3z
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
    spark = get_spark("profile-containment")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    small_vocab, d = _token_sketch(spark, sf_dir)
    d.write.format("noop").mode("overwrite").save()
    print(f"sketch build: {time.time()-t0:.1f}s small_vocab={small_vocab}")
    assert not small_vocab

    probe_band = F.explode(
        F.array(F.col("len_band") - 1, F.col("len_band"), F.col("len_band") + 1)
    ).alias("band")
    alpha = F.floor((F.col("n_a") * 4 + 4) / 5)
    plen = F.greatest(
        F.col("n_words") - F.floor((F.col("n_words") * 4 + 4) / 5).cast("int") + 1,
        F.lit(1),
    )
    pa = d.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        probe_band,
        F.col("n_words").alias("n_a"),
        F.posexplode(F.slice("words", F.lit(1), plen)).alias("r0", "w"),
    ).withColumn("r_a", F.col("r0") + 1)
    pb = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_band").alias("band_b"),
        F.col("n_words").alias("n_b"),
        F.posexplode("words").alias("rb0", "wb"),
    ).withColumn("r_b", F.col("rb0") + 1)

    t0 = time.time()
    n_pa = pa.count()
    print(f"probe rows (pa): {n_pa}  ({time.time()-t0:.1f}s)")
    t0 = time.time()
    n_pb = pb.count()
    print(f"build rows (pb): {n_pb}  ({time.time()-t0:.1f}s)")

    # raw equi-join matches (before any residual filter)
    t0 = time.time()
    raw = pa.hint("merge").join(
        pb.hint("merge"),
        (F.col("lang") == F.col("lang_b"))
        & (F.col("band") == F.col("band_b"))
        & (F.col("w") == F.col("wb")),
    )
    n_raw = raw.count()
    print(f"raw equi matches: {n_raw}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    filt = raw.filter(
        (F.col("id_a") != F.col("id_b"))
        & (F.col("n_b") * 5 >= F.col("n_a") * 4)
        & (
            1 + F.least(F.col("n_a") - F.col("r_a"), F.col("n_b") - F.col("r_b"))
            >= alpha
        )
    )
    n_filt = filt.count()
    print(f"after size+positional filter: {n_filt}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    cand = filt.select("id_a", "id_b").distinct()
    n_cand = cand.count()
    print(f"distinct candidate pairs: {n_cand}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
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
    out = pairs.filter(inter * 5 >= F.col("n_a") * 4)
    n_out = out.count()
    print(f"verified output pairs: {n_out}  ({time.time()-t0:.1f}s)")

    release_token_sketch_cache()


if __name__ == "__main__":
    main()
