"""Isolated per-query timing: bench-style eval (xxhash64 bit_xor) AND
noop-sink timing (guide §1.4), N repeats each, min+median reported.

Usage: python scratch/time_queries.py name1,name2 [repeats] [sf_dir]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import REGISTRY, load_views
from snowflake_emulator_spark.session_factory import build_spark

names = sys.argv[1].split(",")
n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spark = build_spark(app_name="time-queries")
spark.range(1).count()
load_views(spark, sf_dir)
# same warmups as bench.py
spark.sql("SELECT count(*), sum(l_quantity), max(length(l_returnflag)) FROM lineitem").collect()
spark.sql("SELECT max(length(text)) FROM documents").collect()
spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
spark.sql("SELECT max(length(o_orderpriority)) FROM orders").collect()
spark.sql("SELECT max(length(props)) FROM events").collect()
_warm = F.pandas_udf(lambda s: s * 1.0, "double")
spark.range(10000).repartition(32).select(_warm(F.col("id").cast("double"))).count()
def _wb(batches):
    for pdf in batches:
        yield pdf
spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()
spark.sql("SELECT max(md5(regexp_replace(CAST(id AS STRING), '[0-9]+', 'x'))) FROM range(100000)").collect()
spark.sql("SELECT max(aggregate(zip_with(sequence(1, 32), sequence(1, 32), (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)) FROM range(1000)").collect()

for name in names:
    fn, _ = REGISTRY[name]
    hash_t, noop_t = [], []
    for i in range(n_rep):
        spark.sparkContext.setJobDescription(f"{name} hash#{i}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
        hash_t.append(round(time.time() - t0, 3))
    for i in range(n_rep):
        spark.sparkContext.setJobDescription(f"{name} noop#{i}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noop_t.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"RESULT {name}: hash min={min(hash_t)} med={statistics.median(hash_t)} all={hash_t} | "
          f"noop min={min(noop_t)} med={statistics.median(noop_t)} all={noop_t}", flush=True)
spark.stop()
