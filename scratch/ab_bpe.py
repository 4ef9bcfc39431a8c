"""A/B: window-relational BPE trainer vs array+kernel form."""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import textstats
from snowflake_emulator_spark.session_factory import build_spark

spark = build_spark(app_name="ab-bpe")
spark.range(1).count()
load_views(spark, "/root/testdata/sf0.1")
spark.sql("SELECT max(length(text)) FROM documents").collect()
def _wb(b):
    for pdf in b: yield pdf
spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()

def array_bpe(d, rounds=6):
    norm = ("trim(regexp_replace(regexp_replace(lower(text), "
            "'[^a-z0-9 \\\\t\\\\n\\\\r]', ''), '[ \\\\t\\\\n\\\\r]+', ' '))")
    words = (d.select(F.col("doc_id"), F.posexplode(F.split(F.expr(norm), " "))
             .alias("w", "word")).filter(F.length("word") > 0))
    arr = words.select(
        "doc_id", "w",
        F.filter(F.split("word", ""), lambda x: x != "").alias("toks"))
    merges = []
    cur = arr.localCheckpoint(eager=True)
    for r in range(rounds):
        pairs = cur.select(
            F.explode(F.zip_with(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("tok"), b.alias("nxt")))).alias("p"))
        best = (pairs.select("p.tok", "p.nxt").groupBy("tok", "nxt").count()
                .orderBy(F.desc("count"), "tok", "nxt").limit(1).collect())
        if not best:
            break
        l_tok, r_tok, freq = best[0][0], best[0][1], int(best[0][2])
        merges.append((r + 1, l_tok, r_tok, freq))

        def rewrite(batches, _l=l_tok, _r=r_tok):
            for pdf in batches:
                out = []
                for toks in pdf["toks"]:
                    n = len(toks)
                    res = []
                    i = 0
                    while i < n:
                        if i + 1 < n and toks[i] == _l and toks[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "w": pdf["w"],
                                    "toks": out})
        cur = cur.mapInPandas(rewrite, T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("toks", T.ArrayType(T.StringType())),
        ])).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(merges, T.StructType([
        T.StructField("merge_round", T.IntegerType()),
        T.StructField("l_tok", T.StringType()),
        T.StructField("r_tok", T.StringType()),
        T.StructField("freq", T.LongType())]))
    return merges_df, cur

d = spark.table("documents")

def run_orig():
    t0 = time.time()
    m = textstats.bpe_train_merges(d, rounds=6).orderBy("merge_round")
    rows = [tuple(r) for r in m.collect()]
    return round(time.time() - t0, 3), rows

def run_arr():
    t0 = time.time()
    m, _ = array_bpe(d, rounds=6)
    rows = [tuple(r) for r in m.orderBy("merge_round").collect()]
    return round(time.time() - t0, 3), rows

t1, rows1 = run_orig()
t2, rows2 = run_arr()
print("MERGES", "IDENTICAL" if rows1 == rows2 else f"MISMATCH {rows1} vs {rows2}")
# also compare final token-relation counts per doc (the encode surface)
_, toks_o = textstats.bpe_train_merges(d, rounds=6, return_tokens=True)
co = sorted(map(tuple, toks_o.groupBy("doc_id").count().collect()))
_, cur = array_bpe(d, rounds=6)
ca = sorted(map(tuple, cur.select("doc_id", F.size("toks").alias("n"))
                 .groupBy("doc_id").agg(F.sum("n").alias("count")).collect()))
print("COUNTS", "IDENTICAL" if co == ca else "MISMATCH")
res = {"orig": [], "arr": []}
for rep in range(3):
    res["orig"].append(run_orig()[0])
    res["arr"].append(run_arr()[0])
print("RESULT orig:", min(res["orig"]), res["orig"])
print("RESULT arr:", min(res["arr"]), res["arr"])
spark.stop()
