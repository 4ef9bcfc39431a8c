import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import (
    load_views, _doc_components, _quality_filter_pipeline)
from snowflake_emulator_spark.operators import mixture
from snowflake_emulator_spark.session_factory import build_spark

SRC = "/root/testdata/sf0.1"
spark = build_spark(app_name="probe_ks2", master="local[32]", shuffle_partitions=32)
load_views(spark, SRC)
d = spark.table("documents")
comps = _doc_components(spark, SRC)
rates = {"src0": 1.0, "src1": 0.8, "src2": 0.5, "src3": 0.25, "src4": 0.1}
removals = (comps.filter(F.col("node") != F.col("comp"))
            .select(F.col("node").alias("doc_id")).distinct())
quality_keep = _quality_filter_pipeline(spark, SRC).filter("keep").select("doc_id")
sampled = mixture.mixture_sample(d, rates, default_rate=0.05)

def timeit(label, df):
    t0 = time.time()
    df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
    print(f"  {label}: {time.time()-t0:.2f}s", flush=True)

timeit("sampled_only", sampled.select("doc_id", "source"))
timeit("sampled_anti_removals", sampled.join(removals, "doc_id", "left_anti").select("doc_id", "source"))
timeit("sampled_semi_quality", sampled.join(quality_keep, "doc_id", "left_semi").select("doc_id", "source"))
timeit("quality_keep_only", quality_keep)
full = (sampled.join(removals, "doc_id", "left_anti")
        .join(quality_keep, "doc_id", "left_semi"))
t0 = time.time()
full.groupBy("source").agg(F.count("*")).collect()
print(f"  full: {time.time()-t0:.2f}s")
print(full._jdf.queryExecution().executedPlan().toString()[:6000])
