"""r17 A/B: _lloyd_train_codebook — r16 two-pass round (assign kernel
returns the full relation through Arrow, posexplode + JVM avg) vs the
r17 fused assign+partial-sums kernel. Asserts the trained codebooks are
IDENTICAL (every rounded centroid value), then times the pq/ivfpq
registry entries with each trainer interleaved in one session.
Usage: python scratch/ab_lloyd_r17.py [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import similarity
from snowflake_emulator_spark.session_factory import build_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF = "/root/testdata/sf0.1"


def old_lloyd(subs, codebook, rounds):
    """The r16 round body, inlined from git (two Arrow passes/round)."""
    spark = subs.sparkSession
    cb_schema = T.StructType([
        T.StructField("sub", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("c", T.ArrayType(T.DoubleType())),
    ])
    current = {(r["sub"], r["code"]): [float(x) for x in r["c"]]
               for r in codebook.collect()}
    sub_d = len(next(iter(current.values())))
    subs = subs.select("sub", F.col("sv").cast("array<double>").alias("sv"))
    subs.persist()
    try:
        for _ in range(rounds):
            import numpy as np

            by_sub = {}
            for (s, c), v in sorted(current.items()):
                by_sub.setdefault(s, []).append(v)
            subm = {s: np.array(v, dtype="float64") for s, v in by_sub.items()}

            def assign_codes(batches, _subm=subm):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    sarr = pdf["sub"].to_numpy()
                    x = np.stack(pdf["sv"].to_numpy()).astype("float64")
                    codes = np.empty(len(pdf), dtype="int32")
                    for s in np.unique(sarr):
                        mask = sarr == s
                        cmat = _subm[int(s)]
                        xs = x[mask]
                        acc = np.zeros((xs.shape[0], cmat.shape[0]))
                        for j in range(xs.shape[1]):
                            diff = xs[:, j, None] - cmat[None, :, j]
                            acc = acc + diff * diff
                        codes[mask] = np.argmin(acc, axis=1)
                    yield pd.DataFrame(
                        {"sub": pdf["sub"], "sv": pdf["sv"], "code": codes})

            assigned = subs.mapInPandas(
                assign_codes,
                T.StructType([
                    T.StructField("sub", T.IntegerType()),
                    T.StructField("sv", T.ArrayType(T.DoubleType())),
                    T.StructField("code", T.IntegerType()),
                ]))
            upd = (
                assigned.select("sub", "code",
                                F.posexplode("sv").alias("pos", "val"))
                .groupBy("sub", "code", "pos")
                .agg(F.round(F.avg("val"), 6).alias("mval"))
            )
            fresh = {}
            for r in upd.collect():
                fresh.setdefault((r["sub"], r["code"]),
                                 [0.0] * sub_d)[r["pos"]] = float(r["mval"])
            current.update(fresh)
    finally:
        subs.unpersist()
    return spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(current.items())], cb_schema)


spark = build_spark(app_name="ab-lloyd-r17")
load_views(spark, SF)
spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()

# --- codebook equality at the registry entry's exact config ----------
e = spark.table("embeddings")
m, ksub, dim, rounds = 32, 128, 64, 3
sub_d = dim // m
vecs = e.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
subs = vecs.select(
    F.col("vec_id"),
    F.posexplode(F.array(*[F.slice("v", s * sub_d + 1, sub_d)
                           for s in range(m)])).alias("sub", "sv"))
from pyspark.sql import Window
cw = Window.partitionBy("sub").orderBy("vec_id")
seed = (vecs.orderBy(F.col("vec_id")).limit(ksub)
        .select(F.col("vec_id"), F.posexplode(F.array(*[
            F.slice("v", s * sub_d + 1, sub_d) for s in range(m)
        ])).alias("sub", "c"))
        .select("sub", (F.row_number().over(cw) - 1).alias("code"), "c"))

cb_old = sorted(tuple(r) for r in old_lloyd(subs, seed, rounds).collect())
cb_new = sorted(tuple(r) for r in
                similarity._lloyd_train_codebook(subs, seed, rounds).collect())
assert cb_old == cb_new, "TRAINED CODEBOOK MISMATCH"
print(f"trained codebooks identical: {len(cb_new)} rows "
      f"(m={m}, ksub={ksub}, rounds={rounds})", flush=True)

# --- interleaved timing of the training phase alone ------------------
def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


told, tnew = [], []
for i in range(REPS):
    t0 = time.time()
    old_lloyd(subs, seed, rounds).collect()
    told.append(round(time.time() - t0, 3))
    t0 = time.time()
    similarity._lloyd_train_codebook(subs, seed, rounds).collect()
    tnew.append(round(time.time() - t0, 3))
    print(f"rep {i}: old={told[-1]} new={tnew[-1]} floor={probe()}",
          flush=True)
print(f"old trainer: min={min(told)} med={statistics.median(told)} {told}")
print(f"new trainer: min={min(tnew)} med={statistics.median(tnew)} {tnew}")
spark.stop()
