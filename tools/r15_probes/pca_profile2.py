import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pyspark.sql import functions as F
from habits_etl_spark.session import get_spark
from habits_etl_spark.plans.common import t

spark = get_spark("pca_profile2")
sf = "/root/testdata/sf0.1"
e = t(spark, sf, "embeddings")
emb = e.select("vec_id", F.transform("embedding", lambda c: c.cast("double")).alias("arr"))
xc = emb.cache(); xc.count()
D = 64

def dec_dot(ws):
    return F.aggregate(
        F.zip_with(F.col("arr"), F.lit([float(w) for w in ws]),
                   lambda xv, w: (xv * w).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(28,12)"),
        lambda acc, term: (acc + term).cast("decimal(28,12)")).cast("double")

def rnd(ws, order):
    df = (xc.select(dec_dot(ws).alias("score"), "arr")
       .select("score", F.posexplode("arr").alias("dim", "val"))
       .groupBy("dim").agg(F.sum((F.col("val") * F.col("score")).cast("decimal(28,12)")).cast("double").alias("u")))
    if order:
        return [r.u for r in df.orderBy("dim").collect()]
    return [r.u for r in sorted(df.collect(), key=lambda r: r.dim)]

ws = [1.0 / (D ** 0.5)] * D
for tag, order in (("orderBy", True), ("pysort", False), ("orderBy2", True), ("pysort2", False)):
    rnd(ws, order)  # variant warm
    t0 = time.perf_counter()
    for r in range(4):
        u1 = rnd([w + (r+1)*1e-9 for w in ws], order)
    print(f"{tag:9s} {(time.perf_counter()-t0)/4:.3f} s/round")
# value identity check
a = rnd(ws, True); b = rnd(ws, False)
print("identical:", a == b)
