"""Interleaved A/B: simhash_near_pairs — current form (the fingerprint
pipeline appears once per block-join side: 8 evaluations, 16 parquet
scans, zero ReusedExchange in the plan) vs one lazy localCheckpoint of
the blocked fingerprint relation read by all 8 sides.

Usage: python scratch/ab_simhash.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="ab-simhash")
spark.range(1).count()
load_views(spark, SF_DIR)


def old_impl():
    d = spark.table("documents")
    return dedup.simhash_near_pairs(d, bits=48, max_hamming=3).orderBy("id_a", "id_b")


def new_impl():
    d = spark.table("documents")
    id_col, bits, max_hamming = "doc_id", 48, 3
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    fps = dedup.simhash(d, "text", id_col, bits)
    blocked = fps.select(
        id_col, "simhash",
        *[F.shiftright(F.col("simhash"), i * width)
          .bitwiseAND(F.lit((1 << width) - 1)).alias(f"blk{i}")
          for i in range(n_blocks)],
    ).localCheckpoint(eager=False)
    l, r = blocked.alias("l"), blocked.alias("r")

    def _block(i):
        return (
            l.join(r, (F.col(f"l.blk{i}") == F.col(f"r.blk{i}"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.simhash").alias("__sim_a"),
                    F.col("r.simhash").alias("__sim_b"))
        )

    cand = _block(0)
    for i in range(1, n_blocks):
        cand = cand.unionAll(_block(i))
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    return (cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
            .orderBy("id_a", "id_b"))


a = [tuple(r) for r in old_impl().collect()]
b = [tuple(r) for r in new_impl().collect()]
assert a == b, (len(a), len(b))
print(f"IDENTICAL: {len(a)} rows")

times = {"old": [], "new": []}
for rep in range(5):
    for name, fn in (("old", old_impl), ("new", new_impl)):
        t0 = time.time()
        df = fn()
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")).collect()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}  "
          f"all {[round(t, 3) for t in ts]}")
