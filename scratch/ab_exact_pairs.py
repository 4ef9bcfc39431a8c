"""Interleaved A/B: exact all-pairs cosine — BNLJ + interpreted HOF fold
(old, the inventory formulation) vs broadcast-matrix mapInPandas kernel
with strict sequential per-dim accumulation (new; round/threshold stay
JVM-side per the change-#1 recipe). Asserts tuple-identical output
(every rounded double), then interleaved timing.

Usage: python scratch/ab_exact_pairs.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import similarity
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
THRESHOLD = 0.42

spark = build_spark(app_name="ab-exact-pairs")
spark.range(1).count()
load_views(spark, SF_DIR)
spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()


def _wb(b):
    for pdf in b:
        yield pdf


spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()


def old_impl():
    e = spark.table("embeddings")
    base = e.select("vec_id", "embedding",
                    similarity._norm(F.col("embedding"), None).alias("nrm"))
    l = base.select(F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("va"), F.col("nrm").alias("na"))
    r = base.select(F.col("vec_id").alias("id_b"),
                    F.col("embedding").alias("vb"), F.col("nrm").alias("nb"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(similarity._dot(F.col("va"), F.col("vb"), None)
                        / (F.col("na") * F.col("nb")), 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= THRESHOLD)
        .orderBy("id_a", "id_b")
    )


def new_impl():
    e = spark.table("embeddings").filter(F.col("vec_id").isNotNull())
    rows = e.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    dim = M.shape[1]
    bc = spark.sparkContext.broadcast((ids, M))
    pre = THRESHOLD - 1e-6

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("dot", T.DoubleType()),
        T.StructField("na", T.DoubleType()),
        T.StructField("nb", T.DoubleType()),
    ])

    def kernel(batches):
        idsM, m = bc.value
        # norms of the broadcast side, strict sequential fold order
        nacc = np.zeros(len(idsM))
        for d in range(dim):
            nacc = nacc + m[:, d] * m[:, d]
        nrm = np.sqrt(nacc)
        for pdf in batches:
            if not len(pdf):
                continue
            ida = pdf["vec_id"].to_numpy()
            A = np.array(list(pdf["embedding"]), dtype=np.float64)
            acc = np.zeros((len(ida), len(idsM)))
            for d in range(dim):
                acc = acc + A[:, d:d + 1] * m[None, :, d]
            na_acc = np.zeros(len(ida))
            for d in range(dim):
                na_acc = na_acc + A[:, d] * A[:, d]
            na = np.sqrt(na_acc)
            cos = acc / (na[:, None] * nrm[None, :])
            mask = (idsM[None, :] > ida[:, None]) & (cos >= pre)
            ri, ci = np.nonzero(mask)
            if not len(ri):
                continue
            yield pd.DataFrame({
                "id_a": ida[ri], "id_b": idsM[ci],
                "dot": acc[ri, ci], "na": na[ri], "nb": nrm[ci]})

    raw = e.select("vec_id", "embedding").mapInPandas(kernel, out_schema)
    return (
        raw.select("id_a", "id_b",
                   F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                   .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= THRESHOLD)
        .orderBy("id_a", "id_b")
    )


a = [tuple(r) for r in old_impl().collect()]
b = [tuple(r) for r in new_impl().collect()]
assert a == b, (len(a), len(b),
                [x for x, y in zip(a, b) if x != y][:5] if len(a) == len(b)
                else "count mismatch")
print(f"IDENTICAL: {len(a)} pairs")

times = {"old": [], "new": []}
for rep in range(6):
    for name, fn in (("old", old_impl), ("new", new_impl)):
        t0 = time.time()
        df = fn()
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")).collect()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}  "
          f"all {[round(t, 3) for t in ts]}")
