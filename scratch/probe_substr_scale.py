"""One-off 10x scale probe for doc_substring_dedup (VERDICT r10 item 7:
'sf1 stress ratio recorded'). Same replica synthesis as scale_stress."""
import sys, time, tempfile, shutil, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
spark = build_spark(app_name="substr_scale", master="local[32]", shuffle_partitions=32)
work = tempfile.mkdtemp(prefix="substr_scale_")
load_views(spark, SRC)
reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
docs = spark.table("documents")
n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
alpha = "abcdefghijklmnopqrstuvwxyz"
def _rot(r): return alpha[r % 26:] + alpha[: r % 26]
(docs.crossJoin(F.broadcast(reps))
     .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs)
     .withColumn("text", F.element_at(F.array(*[
         F.translate(F.lower(F.col("text")), alpha, _rot(r))
         for r in range(REPLICAS)]), F.col("rep").cast("int") + 1))
     .drop("rep").repartition(32)
     .write.mode("overwrite").parquet(f"{work}/documents.parquet"))

def run(df, tag):
    best = None
    for _ in range(2):
        t0 = time.time()
        out = dedup.substring_dedup(df, gram=40)
        out.select(F.xxhash64("doc_id", "n_spans", "n_removed", "cleaned").alias("h")) \
           .agg(F.bit_xor("h")).collect()
        e = time.time() - t0
        best = e if best is None or e < best else best
    print(f"{tag}: {best:.2f}s", flush=True)
    return best

b = run(spark.table("documents"), "sf0.1")
s = run(spark.read.parquet(f"{work}/documents.parquet"), "sf0.1x10")
print(f"ratio: {s/b:.2f}x")
shutil.rmtree(work)
