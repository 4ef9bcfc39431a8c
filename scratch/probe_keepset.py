"""Decompose pipeline_keep_set's sf0.1x10 cost: which stage is the
8.56x ratio hiding in? Rebuilds the stress harness's scaled documents
table, then times each pipeline piece separately."""
import sys, time, tempfile, shutil, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import (
    load_views, _doc_components, _quality_filter_pipeline)
from snowflake_emulator_spark.operators import mixture
from snowflake_emulator_spark import inventory as _inv
from snowflake_emulator_spark.session_factory import build_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
spark = build_spark(app_name="probe_keepset", master="local[32]", shuffle_partitions=32)
work = tempfile.mkdtemp(prefix="probe_ks_")
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
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","embeddings"):
    os.symlink(f"{SRC}/{t}.parquet", f"{work}/{t}.parquet")
print("scaled built")

def timeit(label, df):
    t0 = time.time()
    df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
    print(f"  {label}: {time.time()-t0:.2f}s", flush=True)

for sf_dir, tag in ((SRC, "base"), (work, "10x")):
    load_views(spark, sf_dir)
    d = spark.table("documents")
    t0 = time.time(); comps = _doc_components(spark, sf_dir)
    print(f"{tag} comps: {time.time()-t0:.2f}s", flush=True)
    timeit(f"{tag} quality_pipeline", _quality_filter_pipeline(spark, sf_dir))
    rates = {"src0": 1.0, "src1": 0.8, "src2": 0.5, "src3": 0.25, "src4": 0.1}
    timeit(f"{tag} mixture", mixture.mixture_sample(d, rates, default_rate=0.05))
    removals = (comps.filter(F.col("node") != F.col("comp"))
                .select(F.col("node").alias("doc_id")).distinct())
    quality_keep = _quality_filter_pipeline(spark, sf_dir).filter("keep").select("doc_id")
    sampled = mixture.mixture_sample(d, rates, default_rate=0.05)
    kept = (sampled.join(removals, "doc_id", "left_anti")
            .join(quality_keep, "doc_id", "left_semi"))
    timeit(f"{tag} full_composition", kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("kept_id_sum")))
shutil.rmtree(work)
