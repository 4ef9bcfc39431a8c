"""r17 A/B: dedup_lsh_jaccard_pipeline — per-stage shingle recompute
(r16 shape) vs ONE checkpointed shingle relation feeding both stages
(VERDICT r16 item 4). Interleaved in one session; output equality
asserted first. Usage: python scratch/ab_jaccard_pipeline_r17.py [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF = "/root/testdata/sf0.1"

spark = build_spark(app_name="ab-jaccard-r17")
load_views(spark, SF)
spark.sql("SELECT max(length(text)) FROM documents").collect()


def old_form():
    d = spark.table("documents")
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5)
    return dedup.ngram_jaccard_pairs(
        d, shingle=5, threshold=0.5, candidates=cands).orderBy("id_a", "id_b")


def new_form():
    d = spark.table("documents")
    sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=False)
    cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5,
                                    shingled=sh)
    return dedup.ngram_jaccard_pairs(
        d, shingle=5, threshold=0.5, candidates=cands,
        shingled=sh).orderBy("id_a", "id_b")


a = [tuple(r) for r in old_form().collect()]
b = [tuple(r) for r in new_form().collect()]
assert a == b, f"OUTPUT MISMATCH: {len(a)} vs {len(b)} rows"
print(f"outputs identical: {len(a)} rows", flush=True)


def evaluate(df):
    df.select(F.xxhash64(*df.columns).alias("__h")).agg(
        F.bit_xor("__h").alias("__s")).collect()


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


told, tnew = [], []
for i in range(REPS):
    for label, fn, acc in (("old", old_form, told), ("new", new_form, tnew)):
        t0 = time.time()
        evaluate(fn())
        acc.append(round(time.time() - t0, 3))
    print(f"rep {i}: old={told[-1]} new={tnew[-1]} floor={probe()}",
          flush=True)
print(f"old: min={min(told)} med={statistics.median(told)} {told}")
print(f"new: min={min(tnew)} med={statistics.median(tnew)} {tnew}")
spark.stop()
