"""Interleaved A/B: old (join-rescore) vs new (in-kernel fold) LSH near-pairs."""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import similarity
from snowflake_emulator_spark.operators.similarity import _hyperplane, _norm, _dot
from snowflake_emulator_spark.session_factory import build_spark

spark = build_spark(app_name="ab-nearpairs")
spark.range(1).count()
load_views(spark, "/root/testdata/sf0.1")
spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
def _wb(b):
    for pdf in b: yield pdf
spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()

threshold, dim, n_planes, n_bands = 0.42, 64, 4, 16
planes = np.array([_hyperplane(dim, b * n_planes + p)
                   for b in range(n_bands) for p in range(n_planes)])

def old_impl():
    emb = spark.table("embeddings")
    id_col, vec_col = "vec_id", "embedding"
    assign_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(vec_col, T.ArrayType(T.FloatType())),
        T.StructField("buckets", T.ArrayType(T.IntegerType()))])
    def assign(batches):
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            bits = (m @ planes.T) >= 0
            buckets = [bits[:, band*n_planes:(band+1)*n_planes] @ weights for band in range(n_bands)]
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: pdf[vec_col],
                                "buckets": [np.array(r, dtype="int32") for r in zip(*buckets)]})
    b = emb.select(id_col, vec_col).mapInPandas(assign, assign_schema).select(
        F.col(id_col), F.col(vec_col), F.posexplode("buckets").alias("band", "bucket"))
    out_schema = T.StructType([T.StructField("id_a", T.LongType()),
                               T.StructField("id_b", T.LongType()),
                               T.StructField("cosine_sim", T.DoubleType())])
    pre_threshold = threshold - 1e-4
    def block(pdf):
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        norms = np.sqrt((m*m).sum(axis=1)); mn = m / norms[:, None]
        n = len(ids); chunk = max(64, 4_000_000 // max(n,1)); cols = np.arange(n)
        oa, ob, os_ = [], [], []
        for s0 in range(0, n, chunk):
            sims = mn[s0:s0+chunk] @ mn.T
            rows = np.arange(s0, s0+sims.shape[0])
            mask = (cols[None,:] > rows[:,None]) & (sims >= pre_threshold)
            ri, ci = np.nonzero(mask)
            oa.append(ids[rows[ri]]); ob.append(ids[ci]); os_.append(np.round(sims[ri,ci],6))
        if not oa: return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame({"id_a": np.concatenate(oa), "id_b": np.concatenate(ob),
                             "cosine_sim": np.concatenate(os_)})
    pairs = b.groupBy("band","bucket").applyInPandas(block, out_schema).dropDuplicates(["id_a","id_b"])
    vecs = emb.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"),
                      _norm(F.col(vec_col), None).alias("__n"))
    sides = pairs.select("id_a","id_b",
        F.posexplode(F.array(F.col("id_a"), F.col("id_b"))).alias("__side","__vid"))
    assembled = (sides.join(vecs, "__vid").groupBy("id_a","id_b").agg(
        F.first(F.when(F.col("__side")==0, F.col("__v")), ignorenulls=True).alias("__va"),
        F.first(F.when(F.col("__side")==0, F.col("__n")), ignorenulls=True).alias("__na"),
        F.first(F.when(F.col("__side")==1, F.col("__v")), ignorenulls=True).alias("__vb"),
        F.first(F.when(F.col("__side")==1, F.col("__n")), ignorenulls=True).alias("__nb")))
    return (assembled.select("id_a","id_b",
        F.round(_dot(F.col("__va"), F.col("__vb"), None)
                / F.nullif(F.col("__na")*F.col("__nb"), F.lit(0.0)), 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)).orderBy("id_a","id_b")

def new_impl():
    return similarity.cosine_near_pairs(
        spark.table("embeddings"), threshold=threshold, dim=dim,
        n_planes=n_planes, n_bands=n_bands, exact_rescore=True).orderBy("id_a","id_b")

def run(f):
    t0 = time.time()
    df = f()
    df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
    return round(time.time() - t0, 3)

# value-equality check first
old_rows = sorted(map(tuple, old_impl().collect()))
new_rows = sorted(map(tuple, new_impl().collect()))
print("IDENTICAL" if old_rows == new_rows else "MISMATCH", len(old_rows), len(new_rows), flush=True)

res = {"old": [], "new": []}
for rep in range(6):
    res["old"].append(run(old_impl))
    res["new"].append(run(new_impl))
for s, ts in res.items():
    print(f"RESULT {s}: min={min(ts)} med={statistics.median(ts)} all={ts}", flush=True)
spark.stop()
