"""A/B: BPE trainer eager-checkpoint loop (r16) vs lazy fused loop (r17).

Old form inline (eager localCheckpoint per rewrite = separate job per
round); new form is textstats.bpe_train_merges at HEAD. Asserts the
merge table AND the final token relation are identical, then times the
two full entries (train + encode shapes) interleaved with floor probes.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import textstats
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = build_spark(app_name="ab-bpe-lazy")
load_views(spark, SF_DIR)
spark.sql("SELECT max(length(text)) FROM documents").collect()


def _wb(b):
    for pdf in b:
        yield pdf


spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()


def old_bpe(df, rounds=6, return_tokens=False):
    id_col, text_col = "doc_id", "text"
    norm = ("trim(regexp_replace(regexp_replace(lower(" + text_col
            + "), '[^a-z0-9 \\\\t\\\\n\\\\r]', ''), '[ \\\\t\\\\n\\\\r]+', ' '))")
    words = (
        df.select(F.col(id_col), F.posexplode(F.split(F.expr(norm), " "))
                  .alias("w", "word"))
        .filter(F.length("word") > 0)
    )
    arr_schema = T.StructType([
        words.schema[id_col],
        T.StructField("w", T.IntegerType()),
        T.StructField("toks", T.ArrayType(T.StringType())),
    ])
    cur = words.select(
        F.col(id_col), F.col("w"),
        F.filter(F.split("word", ""), lambda x: x != "").alias("toks"))
    merges = []
    prev_ckpt = None
    for r in range(rounds):
        if prev_ckpt is None:
            cur = cur.localCheckpoint(eager=True)
            prev_ckpt = cur
        pairs = cur.select(
            F.explode(F.zip_with(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("tok"), b.alias("nxt"))
            )).alias("p"))
        best = (
            pairs.select("p.tok", "p.nxt")
            .groupBy("tok", "nxt").count()
            .orderBy(F.desc("count"), "tok", "nxt").limit(1).collect()
        )
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
                yield pd.DataFrame({id_col: pdf[id_col], "w": pdf["w"],
                                    "toks": out})

        new_ckpt = cur.mapInPandas(rewrite, arr_schema) \
            .localCheckpoint(eager=True)
        try:
            prev_ckpt._jdf.rdd().unpersist(False)
        except Exception:
            pass
        cur = new_ckpt
        prev_ckpt = new_ckpt
    merges_df = spark.createDataFrame(
        merges,
        T.StructType([
            T.StructField("merge_round", T.IntegerType()),
            T.StructField("l_tok", T.StringType()),
            T.StructField("r_tok", T.StringType()),
            T.StructField("freq", T.LongType()),
        ]))
    if return_tokens:
        toks_rel = cur.select(
            F.col(id_col), F.col("w"),
            F.posexplode("toks").alias("pos", "tok"))
        return merges_df, toks_rel
    return merges_df


d = spark.table("documents")

# ---- equivalence: merge tables and token relations identical --------
om, ot = old_bpe(d, rounds=6, return_tokens=True)
nm, nt = textstats.bpe_train_merges(d, rounds=6, return_tokens=True)
om_rows = sorted(tuple(r) for r in om.collect())
nm_rows = sorted(tuple(r) for r in nm.collect())
assert om_rows == nm_rows, (om_rows, nm_rows)


def rel_sig(rel):
    return tuple(rel.select(F.xxhash64("doc_id", "w", "pos", "tok")
                            .alias("h"))
                 .agg(F.count("*"), F.bit_xor("h")).collect()[0])


so, sn = rel_sig(ot), rel_sig(nt)
assert so == sn, (so, sn)
print("RESULT merge tables identical:", nm_rows)
print("RESULT token relation sig identical:", sn, flush=True)


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


def time_train(fn):
    t0 = time.time()
    fn(d, rounds=6).collect()
    return round(time.time() - t0, 3)


def time_encode(fn):
    t0 = time.time()
    _m, toks = fn(d, rounds=6, return_tokens=True)
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    (d.select("doc_id", "source").join(per_doc, "doc_id", "left")
     .groupBy("source")
     .agg(F.count("*"), F.sum(F.coalesce("n_tok", F.lit(0))))
     .collect())
    return round(time.time() - t0, 3)


res = {"train_old": [], "train_new": [], "enc_old": [], "enc_new": []}
for i in range(REPS):
    res["train_old"].append(time_train(old_bpe))
    res["train_new"].append(time_train(textstats.bpe_train_merges))
    print(f"RESULT rep {i}: train old={res['train_old'][-1]}"
          f" new={res['train_new'][-1]} floor={probe()}", flush=True)
for i in range(REPS):
    res["enc_old"].append(time_encode(old_bpe))
    res["enc_new"].append(time_encode(textstats.bpe_train_merges))
    print(f"RESULT rep {i}: encode old={res['enc_old'][-1]}"
          f" new={res['enc_new'][-1]} floor={probe()}", flush=True)
for k, v in res.items():
    print(f"RESULT {k}: min={min(v)} med={statistics.median(v)} {v}",
          flush=True)
print(json.dumps(res))
spark.stop()
