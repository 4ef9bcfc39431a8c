"""Interleaved A/B: dsir_importance_weights — current form (the exploded
bigram relation evaluated 4x: corpus LM, target LM, target ctx, final
scoring join) vs lazy-checkpointed variants.

Usage: python scratch/ab_dsir.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import textstats
from snowflake_emulator_spark.operators.textstats import bigram_table
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="ab-dsir")
spark.range(1).count()
load_views(spark, SF_DIR)


def old_impl():
    d = spark.table("documents")
    return textstats.dsir_importance_weights(d, "source = 'src0'").orderBy("doc_id")


def make_new(ckpt_bg, ckpt_bgt):
    def new_impl():
        df = spark.table("documents")
        target_filter, text_col, id_col = "source = 'src0'", "text", "doc_id"
        alpha, vocab = 1.0, 37

        bg = bigram_table(df, text_col, id_col)
        if ckpt_bg:
            bg = bg.localCheckpoint(eager=False)
        target_ids = df.filter(target_filter).select(id_col)
        bg_t = bg.join(broadcast(target_ids), id_col, "left_semi")
        if ckpt_bgt:
            bg_t = bg_t.localCheckpoint(eager=False)

        def _lm(rel):
            lm = rel.groupBy("bg").agg(F.count("*").alias("n_bg")).withColumn(
                "c1", F.substring("bg", 1, 1))
            ctx = lm.groupBy("c1").agg(F.sum("n_bg").alias("n_c1"))
            return lm.join(ctx, "c1").select(
                "bg",
                ((F.col("n_bg") + F.lit(alpha))
                 / (F.col("n_c1") + F.lit(alpha * vocab))).alias("p"))

        corpus_lm = _lm(bg).withColumnRenamed("p", "p_corpus")
        target_lm = _lm(bg_t).withColumnRenamed("p", "p_target")
        target_ctx = (bg_t.withColumn("c1", F.substring("bg", 1, 1))
                      .groupBy("c1").agg(F.count("*").alias("n_c1_t")))
        models = (corpus_lm.withColumn("c1", F.substring("bg", 1, 1))
                  .join(target_lm, "bg", "left")
                  .join(broadcast(target_ctx), "c1", "left")
                  .select("bg", "p_corpus",
                          F.coalesce(
                              "p_target",
                              F.lit(alpha) / (F.coalesce("n_c1_t", F.lit(0))
                                              + F.lit(alpha * vocab)))
                          .alias("p_target")))
        return (bg.join(broadcast(models), "bg")
                .groupBy(id_col)
                .agg(F.round(F.avg(F.log2("p_target") - F.log2("p_corpus")), 6)
                     .alias("dsir_weight"))
                .orderBy("doc_id"))
    return new_impl


variants = {"old": old_impl,
            "ckpt_bg": make_new(True, False),
            "ckpt_both": make_new(True, True)}

ref = [tuple(r) for r in old_impl().collect()]
for name, fn in variants.items():
    if name == "old":
        continue
    got = [tuple(r) for r in fn().collect()]
    assert got == ref, (name, len(got), len(ref))
print(f"IDENTICAL: {len(ref)} rows (all variants)")

times = {k: [] for k in variants}
for rep in range(5):
    for name, fn in variants.items():
        t0 = time.time()
        df = fn()
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")).collect()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}  "
          f"all {[round(t, 3) for t in ts]}")
