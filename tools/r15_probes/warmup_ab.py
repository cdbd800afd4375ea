import os, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
mode = sys.argv[1]
from concurrent.futures import ThreadPoolExecutor
from bench import HEADLINE, HEADLINE2, CURATION, WARMUP_SF_DIR, optimize_layout
from habits_etl_spark.plans import QUERIES
from habits_etl_spark.session import get_spark

spark = get_spark("warmup_ab")
optimize_layout(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
names = HEADLINE + HEADLINE2 + CURATION
par = [n for n in names if not n.startswith("stream_")]
ser = [n for n in names if n.startswith("stream_")]
prev = spark.conf.get("spark.sql.shuffle.partitions")

def warm(name):
    try:
        QUERIES[name](spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

t0 = time.perf_counter()
if mode == "serial":
    for n in names: warm(n)
else:
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(warm, par))
    for n in ser: warm(n)
spark.conf.set("spark.sql.shuffle.partitions", prev)
print(f"{mode} warmup: {time.perf_counter()-t0:.1f} s")
