"""100x events + 100x embeddings fixture (documents & dims symlinked at
1x) for the r17 MATCH_RECOGNIZE / PQ-encode core-scaling runs. Events
scale by user/event id offsets (100x the USERS — per-user group sizes
constant, the realistic event-log axis). Embeddings scale by vec_id
offset + per-replica coordinate rotation (pair structure is irrelevant
to top-k entries; PQ encode/train cost is what must parallelize).
Usage: python scratch/r17_build_scaled100.py <outdir> [replicas]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import TABLES, load_views
from snowflake_emulator_spark.session_factory import build_spark

OUT = sys.argv[1]
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
spark = build_spark(app_name="r17-build-100x")
load_views(spark, SRC)
reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")

ev = spark.table("events")
n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
(ev.crossJoin(F.broadcast(reps))
   .withColumn("user_id", F.col("user_id") + F.col("rep") * n_users)
   .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
   .drop("rep")
   .repartition(64)
   .write.mode("overwrite").parquet(f"{OUT}/events.parquet"))

emb = spark.table("embeddings")
n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
dim = len(emb.select("embedding").first()[0])
shifted = F.array(*[
    F.array(*[F.col("embedding")[(i + r * 7) % dim] for i in range(dim)])
    for r in range(REPLICAS)])
(emb.crossJoin(F.broadcast(reps))
    .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_emb)
    .withColumn("embedding",
                F.element_at(shifted, F.col("rep").cast("int") + 1))
    .drop("rep")
    .repartition(64)
    .write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet"))

for t in TABLES:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print(f"100x fixture ready at {OUT}")
spark.stop()
