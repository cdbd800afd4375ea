import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from pyspark.sql import functions as F
from habits_etl_spark.session import get_spark
from habits_etl_spark.plans.common import t

spark = get_spark("pca_profile")
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

ws = [1.0 / (D ** 0.5)] * D
# warm two rounds
for r in range(2):
    (xc.select(dec_dot(ws).alias("score"), "arr")
       .select("score", F.posexplode("arr").alias("dim", "val"))
       .groupBy("dim").agg(F.sum((F.col("val") * F.col("score")).cast("decimal(28,12)")).cast("double").alias("u"))
       .orderBy("dim").collect())

for r in range(3):
    w2 = [w + (r+1)*1e-9 for w in ws]
    t0 = time.perf_counter()
    df = (xc.select(dec_dot(w2).alias("score"), "arr")
       .select("score", F.posexplode("arr").alias("dim", "val"))
       .groupBy("dim").agg(F.sum((F.col("val") * F.col("score")).cast("decimal(28,12)")).cast("double").alias("u"))
       .orderBy("dim"))
    t1 = time.perf_counter()
    # force analysis+physical plan without execution
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    rows = df.collect()
    t3 = time.perf_counter()
    print(f"round{r}: build={t1-t0:.3f} plan={t2-t1:.3f} exec+collect={t3-t2:.3f}")
