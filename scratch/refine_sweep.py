"""r16: recall with the exact re-rank (refine) stage at base and
10x-scaled embeddings — the empirical basis for the embed_ivfpq_topk
refine=4 config."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import similarity
from snowflake_emulator_spark.session_factory import build_spark

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

spark = build_spark(app_name="refine_sweep", master="local[16]",
                    shuffle_partitions=16)
load_views(spark, SRC)
emb = spark.table("embeddings")
n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
dim = len(emb.select("embedding").first()[0])
reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
shifted = F.array(*[
    F.array(*[F.col("embedding")[(i + r * 7) % dim] for i in range(dim)])
    for r in range(REPLICAS)])
scaled = (emb.crossJoin(F.broadcast(reps))
          .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_emb)
          .withColumn("embedding",
                      F.element_at(shifted, F.col("rep").cast("int") + 1))
          .drop("rep").repartition(32).persist())

for name, e in (("base", emb), ("scaled", scaled)):
    n = e.count()
    qs = [0, 1, 2, 3, 4]
    ex = {(r["query_id"], r["neighbor_id"])
          for r in similarity.cosine_topk_bruteforce(e, qs, k=10).collect()}
    for refine in (2, 4):
        t0 = time.time()
        ap = {(r["query_id"], r["neighbor_id"])
              for r in similarity.ivfpq_topk(
                  e, qs, k=10, n_centroids=None, nprobe=None,
                  m=32, ksub=128, train_rounds=3, coarse_train_rounds=2,
                  refine=refine).collect()}
        rec = len(ex & ap) / len(ex)
        print(f"{name} n={n} refine={refine}: recall@10 = {rec:.3f} "
              f"[{time.time() - t0:.1f}s]", flush=True)
