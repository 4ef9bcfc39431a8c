"""Build the 10x scaled fixture (same synthesis as scale_stress.py —
caesar-rotated documents, coordinate-rotated embeddings, user-offset
events, symlinked dims) into a PERSISTENT directory for the r17
core-count scaling runs. Usage: python scratch/r17_build_scaled.py <outdir> [replicas]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import TABLES, load_views
from snowflake_emulator_spark.session_factory import build_spark

OUT = sys.argv[1]
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
spark = build_spark(app_name="r17-build-scaled")
load_views(spark, SRC)
reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")

docs = spark.table("documents")
n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
alpha = "abcdefghijklmnopqrstuvwxyz"


def _rot(r: int) -> str:
    return alpha[r % 26:] + alpha[: r % 26]


(docs.crossJoin(F.broadcast(reps))
     .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs)
     .withColumn("text", F.element_at(F.array(*[
         F.translate(F.lower(F.col("text")), alpha, _rot(r))
         for r in range(REPLICAS)]), F.col("rep").cast("int") + 1))
     .drop("rep")
     .repartition(32)
     .write.mode("overwrite").parquet(f"{OUT}/documents.parquet"))

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
    .repartition(32)
    .write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet"))

ev = spark.table("events")
n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
(ev.crossJoin(F.broadcast(reps))
   .withColumn("user_id", F.col("user_id") + F.col("rep") * n_users)
   .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
   .drop("rep")
   .repartition(32)
   .write.mode("overwrite").parquet(f"{OUT}/events.parquet"))

for t in TABLES:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print(f"scaled fixture ready at {OUT} ({REPLICAS}x)")
spark.stop()
