"""Interleaved A/B: dedup_incremental — current form (each side's
shingle relation evaluated twice: band hashes + exact-Jaccard side) vs
localCheckpoint-shared shingle tables. Output equality asserted first.

Usage: python scratch/ab_incremental.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.operators.dedup import (
    _band_hashes, normalized_text, shingle_table)
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = build_spark(app_name="ab-incremental")
spark.range(1).count()
load_views(spark, SF_DIR)


def old_impl():
    d = spark.table("documents")
    new = d.filter((F.col("doc_id") % 7) == 0)
    corpus = d.filter((F.col("doc_id") % 7) != 0)
    return dedup.incremental_dedup(new, corpus, threshold=0.5).orderBy("doc_id")


def new_impl():
    d = spark.table("documents")
    new_df = d.filter((F.col("doc_id") % 7) == 0)
    corpus_df = d.filter((F.col("doc_id") % 7) != 0)
    id_col, text_col = "doc_id", "text"
    num_perm, bands, shingle, threshold = 16, 4, 5, 0.5

    new_fp = new_df.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fp"))
    corpus_fp = corpus_df.select(
        F.md5(normalized_text(F.col(text_col))).alias("fp")).distinct()
    exact = (new_fp.join(corpus_fp, "fp", "left_semi")
             .select(F.col(id_col)).distinct()
             .withColumn("__exact", F.lit(True)))

    new_sh = shingle_table(new_df, text_col, id_col, shingle).localCheckpoint(eager=False)
    corpus_sh = shingle_table(corpus_df, text_col, id_col, shingle).localCheckpoint(eager=False)
    new_band = _band_hashes(new_sh, id_col, num_perm, bands).select(
        F.col(id_col).alias("new_id"), "band", "band_hash")
    corpus_band = _band_hashes(corpus_sh, id_col, num_perm, bands).select(
        F.col(id_col).alias("corpus_id"), "band", "band_hash")
    cands = (new_band.join(corpus_band, ["band", "band_hash"])
             .select("new_id", "corpus_id").distinct())
    a_sh = new_sh.select(F.col(id_col).alias("new_id"), "sh").distinct()
    b_sh = corpus_sh.select(F.col(id_col).alias("corpus_id"), "sh").distinct()
    inter = (cands.join(a_sh, "new_id")
             .join(b_sh, ["corpus_id", "sh"])
             .groupBy("new_id", "corpus_id")
             .agg(F.count("*").alias("n_inter")))
    sa = a_sh.groupBy("new_id").agg(F.count("*").alias("n_a"))
    sb = b_sh.groupBy("corpus_id").agg(F.count("*").alias("n_b"))
    near = (inter.join(sa, "new_id").join(sb, "corpus_id")
            .filter(F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
                    >= threshold)
            .select(F.col("new_id").alias(id_col)).distinct()
            .withColumn("__near", F.lit(True)))
    return (new_df.select(id_col)
            .join(exact, id_col, "left")
            .join(near, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("__exact"), F.lit(False)).alias("exact_dup"),
                    (F.coalesce(F.col("__near"), F.lit(False))
                     & ~F.coalesce(F.col("__exact"), F.lit(False))).alias("near_dup"))
            .orderBy("doc_id"))


a = [tuple(r) for r in old_impl().collect()]
b = [tuple(r) for r in new_impl().collect()]
assert a == b, (len(a), len(b))
print(f"IDENTICAL: {len(a)} rows")

times = {"old": [], "new": []}
for rep in range(5):
    for name, fn in (("old", old_impl), ("new", new_impl)):
        t0 = time.time()
        df = fn()
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")).collect()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}  "
          f"all {[round(t, 3) for t in ts]}")
