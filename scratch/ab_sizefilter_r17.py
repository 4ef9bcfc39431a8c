"""A/B: candidate size prefilter in ngram_jaccard_pairs (r17).

Old form inline (no prefilter — the r16 candidate-driven join); new
form is dedup.ngram_jaccard_pairs at HEAD. Asserts identical output
(rows + xxhash) for the composed pipeline, then times both interleaved.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = build_spark(app_name="ab-sizefilter")
load_views(spark, SF_DIR)
spark.sql("SELECT max(length(text)) FROM documents").collect()


def old_pipeline(d):
    sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=False)
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5,
                                    shingled=sh)
    cand = cands.select("id_a", "id_b").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b_sh = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (cand.join(a_sh, "id_a").join(b_sh, ["id_b", "sh"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b")
                                                - F.col("n_inter")), 6)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= 0.5)
            .orderBy("id_a", "id_b"))


def new_pipeline(d):
    sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=False)
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5,
                                    shingled=sh)
    return dedup.ngram_jaccard_pairs(
        d, shingle=5, threshold=0.5, candidates=cands, shingled=sh
    ).orderBy("id_a", "id_b")


d = spark.table("documents")


def sig(df):
    return tuple(df.select(F.xxhash64(*df.columns).alias("h"))
                 .agg(F.count("*"), F.bit_xor("h")).collect()[0])


so, sn = sig(old_pipeline(d)), sig(new_pipeline(d))
assert so == sn, (so, sn)
print("RESULT pipeline output identical:", sn, flush=True)

# incremental_dedup identity (library call at HEAD vs r16 behavior is
# a pure prefilter; assert against the unfiltered inline form)
half = d.filter(F.col("doc_id") % 5 == 0)
rest = d.filter(F.col("doc_id") % 5 != 0)
inc = dedup.incremental_dedup(half, rest)
print("RESULT incremental sig:", sig(inc.orderBy("doc_id")), flush=True)


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


res = {"old": [], "new": []}
for i in range(REPS):
    t0 = time.time(); old_pipeline(d).collect()
    res["old"].append(round(time.time() - t0, 3))
    t0 = time.time(); new_pipeline(d).collect()
    res["new"].append(round(time.time() - t0, 3))
    print(f"RESULT rep {i}: old={res['old'][-1]} new={res['new'][-1]}"
          f" floor={probe()}", flush=True)
for k, v in res.items():
    print(f"RESULT {k}: min={min(v)} med={statistics.median(v)} {v}",
          flush=True)
spark.stop()
