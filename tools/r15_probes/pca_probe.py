import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pyspark.sql import functions as F
from habits_etl_spark.session import get_spark
from habits_etl_spark.plans.common import t

spark = get_spark("pca_probe")
sf = "/root/testdata/sf0.1"
e = t(spark, sf, "embeddings")
emb = e.select("vec_id", F.transform("embedding", lambda c: c.cast("double")).alias("arr"))
xc = emb.cache(); xc.count()
D = 64

def dot_arrlits(ws):
    return F.aggregate(
        F.zip_with(F.col("arr"), F.array(*[F.lit(float(w)) for w in ws]),
                   lambda xv, w: (xv * w).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(28,12)"),
        lambda acc, term: (acc + term).cast("decimal(28,12)")).cast("double")

def dot_listlit(ws):
    return F.aggregate(
        F.zip_with(F.col("arr"), F.lit([float(w) for w in ws]),
                   lambda xv, w: (xv * w).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(28,12)"),
        lambda acc, term: (acc + term).cast("decimal(28,12)")).cast("double")

def round_explode(dot, ws):
    return (xc.select(dot(ws).alias("score"), "arr")
            .select("score", F.posexplode("arr").alias("dim", "val"))
            .groupBy("dim")
            .agg(F.sum((F.col("val") * F.col("score")).cast("decimal(28,12)")).cast("double").alias("u"))
            .orderBy("dim").collect())

def round_columnar(dot, ws):
    return (xc.select(dot(ws).alias("score"), "arr")
            .agg(*[F.sum((F.col("arr")[i] * F.col("score")).cast("decimal(28,12)")).cast("double").alias(f"u{i}") for i in range(D)])
            .first())

import itertools
variants = {
    "explode+arrlits": lambda ws: round_explode(dot_arrlits, ws),
    "explode+listlit": lambda ws: round_explode(dot_listlit, ws),
    "columnar+arrlits": lambda ws: round_columnar(dot_arrlits, ws),
    "columnar+listlit": lambda ws: round_columnar(dot_listlit, ws),
}
for name, fn in variants.items():
    # 4 rounds with CHANGING weights (fresh literals each round, like the real loop)
    ws = [1.0 / (D ** 0.5)] * D
    t0 = time.perf_counter()
    for r in range(4):
        fn([w + r * 1e-9 for w in ws])
    dt = time.perf_counter() - t0
    print(f"{name:22s} {dt/4:.3f} s/round")
