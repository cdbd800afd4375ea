#!/usr/bin/env python
"""One-off bisect harness for the ext_near_dedup_minhash bench regression
(VERDICT r2 item #1). Times the query end-to-end plus instrumented stage
variants at the bench layout dir. Not part of the shipped package."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timeit(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: best-of-{n} {best:.3f}s", flush=True)
    return best


def main():
    from habits_etl_spark.session import get_spark
    from habits_etl_spark.plans import QUERIES
    from habits_etl_spark.sources import load_table

    spark = get_spark("bisect")
    bench_dir = "/tmp/bench_layout/sf0.1"

    d = load_table(spark, bench_dir, "documents")
    print("scan partitions:", d.rdd.getNumPartitions(), flush=True)

    # warmup
    QUERIES["ext_near_dedup_minhash"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    def run():
        QUERIES["ext_near_dedup_minhash"](spark, bench_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timeit("full query (current code)", run, n=5)

    # stage costs in isolation
    wcol = F.col("w")
    _SHINGLE_N = 3
    words = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(wcol) - (_SHINGLE_N - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(wcol, i),
                F.element_at(wcol, i + 1),
                F.element_at(wcol, i + 2),
            ),
        )
    )
    base_plain = words.filter(F.size(wcol) >= _SHINGLE_N).select(
        "doc_id", shingles.alias("sh_arr")
    )

    def shingle_only():
        base_plain.write.format("noop").mode("overwrite").save()

    timeit("shingle arrays only (no repartition)", shingle_only, n=3)

    def shingle_repart():
        words2 = d.repartition(32, "doc_id").select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
        )
        words2.filter(F.size(wcol) >= _SHINGLE_N).select(
            "doc_id", shingles.alias("sh_arr")
        ).write.format("noop").mode("overwrite").save()

    timeit("shingle arrays w/ repartition", shingle_repart, n=3)

    xs = base_plain.withColumn(
        "xs",
        F.transform(
            "sh_arr",
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
        ),
    )

    def md5_conv():
        xs.write.format("noop").mode("overwrite").save()

    timeit("+ md5->conv per shingle", md5_conv, n=3)

    # alternative: xxhash64 (native 64-bit hash, no hex/string roundtrip)
    xs2 = base_plain.withColumn(
        "xs", F.transform("sh_arr", lambda s: F.xxhash64(s))
    )

    def xx():
        xs2.write.format("noop").mode("overwrite").save()

    timeit("+ xxhash64 per shingle (alt)", xx, n=3)


if __name__ == "__main__":
    main()
