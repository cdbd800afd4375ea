#!/usr/bin/env python
"""Stage-by-stage cost breakdown of ext_near_dedup_minhash internals."""

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
    from habits_etl_spark.sources import load_table
    from habits_etl_spark.plans.ext_text import (
        _SHINGLE_N,
        _N_HASHES,
        _N_BANDS,
        _MH_P,
        _mh_params,
        _JACCARD_THRESHOLD,
    )

    spark = get_spark("bisect2")
    bench_dir = "/tmp/bench_layout/sf0.1"
    d = load_table(spark, bench_dir, "documents")

    wcol = F.col("w")
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
    base = (
        words.filter(F.size(wcol) >= _SHINGLE_N)
        .select("doc_id", shingles.alias("sh_arr"))
        .withColumn("n", F.size("sh_arr"))
        .withColumn(
            "xs",
            F.transform(
                "sh_arr",
                lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
            ),
        )
        .cache()
    )
    base.count()  # populate cache

    def perm(h):
        a, b = _mh_params(h)
        return F.array_min(
            F.transform("xs", lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MH_P))
        ).alias(f"m{h}")

    sig = base.select("doc_id", *[perm(h) for h in range(_N_HASHES)])
    timeit("sig (16 perms, cached base)", lambda: sig.write.format("noop").mode("overwrite").save())

    bands = None
    for b in range(_N_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws(":", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).alias("v"),
        )
        bands = part if bands is None else bands.unionByName(part)
    timeit("bands union(8)", lambda: bands.write.format("noop").mode("overwrite").save())

    # explode variant: single pass
    bexpr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(":", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).alias("v"),
                )
                for b in range(_N_BANDS)
            ]
        )
    ).alias("bv")
    bands2 = sig.select("doc_id", bexpr).select("doc_id", "bv.band", "bv.v")
    timeit("bands explode(1 pass)", lambda: bands2.write.format("noop").mode("overwrite").save())

    a = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    timeit("cand (union bands self-join)", lambda: cand.write.format("noop").mode("overwrite").save())

    a2 = bands2.alias("a")
    b2 = bands2.alias("b")
    cand2 = (
        a2.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    timeit("cand (explode bands self-join)", lambda: cand2.write.format("noop").mode("overwrite").save())

    # cached bands variant
    bands3 = bands2.cache()
    bands3.count()
    a3 = bands3.alias("a")
    b3 = bands3.alias("b")
    cand3 = (
        a3.join(
            b3,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    timeit("cand (cached bands self-join)", lambda: cand3.write.format("noop").mode("overwrite").save())

    arr_a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a"), F.col("n").alias("na")
    )
    arr_b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b"), F.col("n").alias("nb")
    )
    for nm, c in [("union", cand), ("explode", cand2)]:
        inter = (
            arr_a.join(F.broadcast(c), "doc_a")
            .join(arr_b, "doc_b")
            .withColumn("n_common", F.size(F.array_intersect("arr_a", "arr_b")))
        )
        jac = F.col("n_common").cast("double") / (
            F.col("na") + F.col("nb") - F.col("n_common")
        )
        full = inter.filter(jac >= _JACCARD_THRESHOLD).select(
            "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
        )
        timeit(f"full verify ({nm} cand)", lambda: full.write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
