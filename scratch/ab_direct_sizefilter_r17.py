"""A/B: size prefilter in ngram_jaccard_pairs DIRECT mode (r17).

New form = dedup.ngram_jaccard_pairs at HEAD (direct self-join WITH
the size-bound prune pre-aggregation); old form inline replicates the
pre-change branch (plain self-join, no prune). Asserts identical
output (rows + xxhash), probes the pruned self-join volume, then
times both interleaved.

Usage: python scratch/ab_direct_sizefilter_r17.py [sf_dir] [reps]
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
THRESHOLD = 0.5

spark = build_spark(app_name="ab-direct-sizefilter")
load_views(spark, SF_DIR)
spark.sql("SELECT max(length(text)) FROM documents").collect()


def old_form(d):
    # the pre-r17 direct branch, inline
    sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("id_a"),
                 F.col("r.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b",
                F.round(F.col("n_inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                        6).alias("jaccard"))
        .filter(F.col("jaccard") >= THRESHOLD)
        .orderBy("id_a", "id_b")
    )


def new_form(d):
    return dedup.ngram_jaccard_pairs(
        d, shingle=5, threshold=THRESHOLD
    ).orderBy("id_a", "id_b")


d = spark.table("documents")


def sig(df):
    row = (df.select(F.xxhash64(*df.columns).alias("h"))
           .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("s"))
           .collect()[0])
    return (row["n"], row["s"])


# pruned-volume probe: how many self-join rows does the bound drop?
sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=False)
sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
shz = sh.join(sizes, "doc_id")
l, r = shz.alias("l"), shz.alias("r")
base = l.join(r, (F.col("l.sh") == F.col("r.sh"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
tot = base.count()
kept = base.filter(
    F.least(F.col("l.n_sh"), F.col("r.n_sh"))
    >= (THRESHOLD - 1e-6) * F.greatest(F.col("l.n_sh"), F.col("r.n_sh"))
).count()
print(f"RESULT selfjoin rows total={tot} kept={kept} "
      f"pruned={100 * (tot - kept) / max(tot, 1):.1f}%", flush=True)

so, sn = sig(old_form(d)), sig(new_form(d))
assert so == sn, (so, sn)
print("RESULT output identical:", sn, flush=True)


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


res = {"old": [], "new": []}
for i in range(REPS):
    t0 = time.time(); old_form(d).collect()
    res["old"].append(round(time.time() - t0, 3))
    t0 = time.time(); new_form(d).collect()
    res["new"].append(round(time.time() - t0, 3))
    print(f"RESULT rep {i}: old={res['old'][-1]} new={res['new'][-1]}"
          f" floor={probe()}", flush=True)
for k, v in res.items():
    print(f"RESULT {k}: min={min(v)} med={statistics.median(v)} {v}",
          flush=True)
spark.stop()
