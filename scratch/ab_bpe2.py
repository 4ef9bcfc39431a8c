"""Interleaved A/B: OLD window-relational BPE (from git HEAD) vs NEW module impl."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from pyspark.sql import types as T
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import textstats
from snowflake_emulator_spark.session_factory import build_spark

spark = build_spark(app_name="ab-bpe2")
spark.range(1).count()
load_views(spark, "/root/testdata/sf0.1")
spark.sql("SELECT max(length(text)) FROM documents").collect()
def _wb(b):
    for pdf in b: yield pdf
spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()

def old_bpe(df, rounds=6, text_col="text", id_col="doc_id"):
    norm = ("trim(regexp_replace(regexp_replace(lower(" + text_col
            + "), '[^a-z0-9 \\\\t\\\\n\\\\r]', ''), '[ \\\\t\\\\n\\\\r]+', ' '))")
    words = (df.select(F.col(id_col), F.posexplode(F.split(F.expr(norm), " "))
             .alias("w", "word")).filter(F.length("word") > 0))
    toks = (words.select(id_col, "w",
            F.posexplode(F.split("word", "")).alias("pos", "tok"))
            .filter(F.col("tok") != ""))
    ww = Window.partitionBy(id_col, "w").orderBy("pos")
    merges = []
    prev_ckpt = None
    for r in range(rounds):
        pairs = toks.withColumn("nxt", F.lead("tok").over(ww))
        best = (pairs.filter(F.col("nxt").isNotNull())
                .groupBy("tok", "nxt").count()
                .orderBy(F.desc("count"), "tok", "nxt").limit(1).collect())
        if not best:
            break
        l_tok, r_tok, freq = best[0][0], best[0][1], int(best[0][2])
        merges.append((r + 1, l_tok, r_tok, freq))
        hit = ((F.col("tok") == l_tok) & (F.col("nxt") == r_tok)).cast("int")
        marked = pairs.withColumn("hit", hit)
        runs = marked.withColumn(
            "grp", F.col("pos") - F.row_number().over(
                Window.partitionBy(id_col, "w", "hit").orderBy("pos")))
        keep = runs.withColumn(
            "mrg", F.when((F.col("hit") == 1)
                   & ((F.row_number().over(
                       Window.partitionBy(id_col, "w", "hit", "grp")
                       .orderBy("pos")) - 1) % 2 == 0), 1).otherwise(0))
        toks = (keep.withColumn("pmrg", F.lag("mrg").over(ww))
                .filter((F.col("pmrg").isNull()) | (F.col("pmrg") == 0))
                .select(id_col, "w", F.row_number().over(ww).alias("pos"),
                        F.when(F.col("mrg") == 1, F.concat("tok", "nxt"))
                        .otherwise(F.col("tok")).alias("tok")))
        new_ckpt = toks.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            try:
                prev_ckpt._jdf.rdd().unpersist(False)
            except Exception:
                pass
        toks = new_ckpt
        prev_ckpt = new_ckpt
    return spark.createDataFrame(merges, T.StructType([
        T.StructField("merge_round", T.IntegerType()),
        T.StructField("l_tok", T.StringType()),
        T.StructField("r_tok", T.StringType()),
        T.StructField("freq", T.LongType())]))

d = spark.table("documents")

def run(f):
    t0 = time.time()
    m = f(d, rounds=6).orderBy("merge_round")
    rows = [tuple(r) for r in m.collect()]
    return round(time.time() - t0, 3), rows

t_old, r_old = run(old_bpe)
t_new, r_new = run(lambda df, rounds: textstats.bpe_train_merges(df, rounds=rounds))
print("MERGES", "IDENTICAL" if r_old == r_new else "MISMATCH")
res = {"old": [], "new": []}
for rep in range(4):
    res["old"].append(run(old_bpe)[0])
    res["new"].append(run(lambda df, rounds: textstats.bpe_train_merges(df, rounds=rounds))[0])
print("RESULT old:", min(res["old"]), res["old"])
print("RESULT new:", min(res["new"]), res["new"])
spark.stop()
