"""Scale-stress harness (r8): run the heavy pipeline operators at ~10x
the bench scale (sf0.1 replicated 10x => ~sf1-equivalent row counts)
to verify the plans hold when the data grows — candidate counts stay
bucketed (no quadratic blowup), wall time grows roughly linearly, and
nothing collects unbounded driver state.

Synthesizes the scaled tables in /tmp (NEVER touches /root/testdata):
documents replicated with doc_id offsets and per-replica text salting
(so MinHash/SimHash signatures differ across replicas and near-dup
structure is preserved within each replica, not trivially multiplied
across them); embeddings replicated with id offsets and a tiny
per-replica rotation of the vector values.

Usage: python scratch/scale_stress.py [replicas=10]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.operators import dedup, similarity
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.session_factory import build_spark

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = "/root/testdata/sf0.1"


def main() -> None:
    spark = build_spark(app_name="scale_stress")
    load_views(spark, SRC)
    workdir = tempfile.mkdtemp(prefix="scale_stress_")
    try:
        docs = spark.table("documents")
        n_docs = docs.count()
        reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
        scaled_docs = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (n_docs + 1))
            # per-replica salt token keeps cross-replica pairs below
            # any shingle-overlap threshold
            .withColumn("text", F.concat_ws(" ", F.col("text"),
                                            F.concat(F.lit("rep"), F.col("rep"))))
            .drop("rep"))
        scaled_docs.write.mode("overwrite").parquet(f"{workdir}/documents")
        emb = spark.table("embeddings")
        n_emb = emb.count()
        scaled_emb = (
            emb.crossJoin(F.broadcast(reps))
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * (n_emb + 1))
            .withColumn("embedding", F.transform(
                "embedding",
                lambda v, i: v + (F.col("rep") % 7).cast("float") * 0.01
                * F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))))
            .drop("rep"))
        scaled_emb.write.mode("overwrite").parquet(f"{workdir}/embeddings")

        sdocs = spark.read.parquet(f"{workdir}/documents")
        semb = spark.read.parquet(f"{workdir}/embeddings")
        sdocs.createOrReplaceTempView("documents")
        semb.createOrReplaceTempView("embeddings")
        nd, ne = sdocs.count(), semb.count()
        print(f"scaled: {nd} documents, {ne} embeddings "
              f"({REPLICAS}x sf0.1)", flush=True)

        results = {}

        def timed(label, fn):
            t0 = time.time()
            out = fn()
            e = round(time.time() - t0, 1)
            results[label] = (out, e)
            print(f"{label}: {out} in {e}s", flush=True)

        d = spark.table("documents")
        timed("dedup_exact_groups", lambda: dedup.exact_dedup_keys(d).count())
        timed("minhash_lsh_candidates",
              lambda: dedup.minhash_lsh_pairs(
                  d, num_perm=16, bands=4, shingle=5).count())
        timed("ngram_jaccard_pairs(prefiltered)",
              lambda: dedup.ngram_jaccard_pairs(
                  d, shingle=5, threshold=0.5,
                  candidates=dedup.minhash_lsh_pairs(
                      d, num_perm=16, bands=4, shingle=5)).count())
        e_df = spark.table("embeddings")
        timed("rp_lsh_near_pairs",
              lambda: similarity.cosine_near_pairs(
                  e_df, threshold=0.92, n_planes=8, n_bands=2).count())
        timed("ivf_topk(50q)",
              lambda: similarity.ivf_topk(
                  e_df, query_ids=list(range(0, 50)), k=10,
                  n_centroids=16, nprobe=4).count())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
