"""A/B: lazy checkpoints on the twice/4x-consumed size relations (r17).

New = library at HEAD (ngram_jaccard_pairs checkpoints `sizes`;
incremental_dedup checkpoints a_sh/b_sh/sa/sb). Old forms inline
replicate HEAD-minus-checkpoints (prefilter present, no checkpoints).
Asserts identical output for: direct-mode jaccard, incremental_dedup,
and the LSH->Jaccard pipeline (benched headline entry — must not
regress). Then interleaved timing + scheduler job/stage counts.

Usage: python scratch/ab_sizes_ckpt_r17.py [sf_dir] [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.operators.dedup import (
    _band_hashes, normalized_text, shingle_table,
)
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
T = 0.5

spark = build_spark(app_name="ab-sizes-ckpt")
sc = spark.sparkContext
load_views(spark, SF_DIR)
spark.sql("SELECT max(length(text)) FROM documents").collect()
d = spark.table("documents")


def old_direct(d):
    sh = shingle_table(d, shingle=5).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    shz = sh.join(sizes, "doc_id")
    l, r = shz.alias("l"), shz.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh"))
               & (F.col("l.doc_id") < F.col("r.doc_id"))
               & (F.least(F.col("l.n_sh"), F.col("r.n_sh"))
                  >= (T - 1e-6) * F.greatest(F.col("l.n_sh"), F.col("r.n_sh"))))
        .groupBy(F.col("l.doc_id").alias("id_a"),
                 F.col("r.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b")
                                                - F.col("n_inter")), 6)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= T).orderBy("id_a", "id_b"))


def new_direct(d):
    return dedup.ngram_jaccard_pairs(d, shingle=5, threshold=T) \
        .orderBy("id_a", "id_b")


def old_incremental(new_df, corpus_df):
    new_fp = new_df.select(
        F.col("doc_id"), F.md5(normalized_text(F.col("text"))).alias("fp"))
    corpus_fp = corpus_df.select(
        F.md5(normalized_text(F.col("text"))).alias("fp")).distinct()
    exact = (new_fp.join(corpus_fp, "fp", "left_semi")
             .select(F.col("doc_id")).distinct()
             .withColumn("__exact", F.lit(True)))
    new_sh = shingle_table(new_df, shingle=5).localCheckpoint(eager=False)
    corpus_sh = shingle_table(corpus_df, shingle=5).localCheckpoint(eager=False)
    new_band = _band_hashes(new_sh, "doc_id", 16, 4).select(
        F.col("doc_id").alias("new_id"), "band", "band_hash")
    corpus_band = _band_hashes(corpus_sh, "doc_id", 16, 4).select(
        F.col("doc_id").alias("corpus_id"), "band", "band_hash")
    cands = (new_band.join(corpus_band, ["band", "band_hash"])
             .select("new_id", "corpus_id").distinct())
    a_sh = new_sh.select(F.col("doc_id").alias("new_id"), "sh").distinct()
    b_sh = corpus_sh.select(F.col("doc_id").alias("corpus_id"), "sh").distinct()
    sa = a_sh.groupBy("new_id").agg(F.count("*").alias("n_a"))
    sb = b_sh.groupBy("corpus_id").agg(F.count("*").alias("n_b"))
    cands = (cands.join(sa, "new_id").join(sb, "corpus_id")
             .filter(F.least("n_a", "n_b")
                     >= (T - 1e-6) * F.greatest("n_a", "n_b"))
             .select("new_id", "corpus_id"))
    inter = (cands.join(a_sh, "new_id").join(b_sh, ["corpus_id", "sh"])
             .groupBy("new_id", "corpus_id").agg(F.count("*").alias("n_inter")))
    near = (inter.join(sa, "new_id").join(sb, "corpus_id")
            .filter(F.col("n_inter") / (F.col("n_a") + F.col("n_b")
                                        - F.col("n_inter")) >= T)
            .select(F.col("new_id").alias("doc_id")).distinct()
            .withColumn("__near", F.lit(True)))
    return (new_df.select("doc_id")
            .join(exact, "doc_id", "left").join(near, "doc_id", "left")
            .select(F.col("doc_id"),
                    F.coalesce(F.col("__exact"), F.lit(False)).alias("exact_dup"),
                    (F.coalesce(F.col("__near"), F.lit(False))
                     & ~F.coalesce(F.col("__exact"), F.lit(False)))
                    .alias("near_dup")))


half = d.filter(F.col("doc_id") % 7 == 0)
rest = d.filter(F.col("doc_id") % 7 != 0)


def new_incremental():
    return dedup.incremental_dedup(half, rest, threshold=T).orderBy("doc_id")


def old_incr_sorted():
    return old_incremental(half, rest).orderBy("doc_id")


def old_pipeline(d):
    sh = shingle_table(d, shingle=5).localCheckpoint(eager=False)
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5,
                                    shingled=sh)
    cand = cands.select("id_a", "id_b").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    cand = (cand.join(sa, "id_a").join(sb, "id_b")
            .filter(F.least("n_a", "n_b") >= (T - 1e-6) * F.greatest("n_a", "n_b"))
            .select("id_a", "id_b"))
    a_sh = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b_sh = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (cand.join(a_sh, "id_a").join(b_sh, ["id_b", "sh"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b")
                                                - F.col("n_inter")), 6)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= T).orderBy("id_a", "id_b"))


def new_pipeline(d):
    sh = shingle_table(d, shingle=5).localCheckpoint(eager=False)
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5,
                                    shingled=sh)
    return dedup.ngram_jaccard_pairs(
        d, shingle=5, threshold=T, candidates=cands, shingled=sh
    ).orderBy("id_a", "id_b")


def sig(df):
    row = (df.select(F.xxhash64(*df.columns).alias("h"))
           .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("s"))
           .collect()[0])
    return (row["n"], row["s"])


for label, old_fn, new_fn in [
    ("direct", lambda: old_direct(d), lambda: new_direct(d)),
    ("incremental", old_incr_sorted, new_incremental),
    ("pipeline", lambda: old_pipeline(d), lambda: new_pipeline(d)),
]:
    so, sn = sig(old_fn()), sig(new_fn())
    assert so == sn, (label, so, sn)
    print(f"RESULT {label} output identical: {sn}", flush=True)


def jobs_for(fn, group):
    sc.setJobGroup(group, group)
    t0 = time.time()
    fn().collect()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    n_stages = sum(
        len(sc.statusTracker().getJobInfo(j).stageIds)
        for j in jobs if sc.statusTracker().getJobInfo(j) is not None)
    return len(jobs), n_stages, round(wall, 3)


for label, old_fn, new_fn in [
    ("direct", lambda: old_direct(d), lambda: new_direct(d)),
    ("incremental", old_incr_sorted, new_incremental),
    ("pipeline", lambda: old_pipeline(d), lambda: new_pipeline(d)),
]:
    jo = jobs_for(old_fn, f"old-{label}")
    jn = jobs_for(new_fn, f"new-{label}")
    print(f"RESULT {label} jobs/stages/wall old={jo} new={jn}", flush=True)


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


for label, old_fn, new_fn in [
    ("direct", lambda: old_direct(d), lambda: new_direct(d)),
    ("incremental", old_incr_sorted, new_incremental),
    ("pipeline", lambda: old_pipeline(d), lambda: new_pipeline(d)),
]:
    res = {"old": [], "new": []}
    for i in range(REPS):
        t0 = time.time(); old_fn().collect()
        res["old"].append(round(time.time() - t0, 3))
        t0 = time.time(); new_fn().collect()
        res["new"].append(round(time.time() - t0, 3))
        print(f"RESULT {label} rep {i}: old={res['old'][-1]} "
              f"new={res['new'][-1]} floor={probe()}", flush=True)
    for k, v in res.items():
        print(f"RESULT {label} {k}: min={min(v)} med={statistics.median(v)}"
              f" {v}", flush=True)
spark.stop()
