"""Interleaved A/B: simhash_near_pairs — r16 shape (every agreeing
block emits the pair; up to n_blocks copies flow through the union,
hamming filter and distinct exchange) vs r17 first-match pigeonhole
(blk_j differs for all j < i added to block i's join condition, so each
qualifying pair is emitted exactly once, at its minimum agreeing
block). Asserts identical output, reports union-input volume + timings.

Usage: python scratch/ab_simhash_firstmatch_r17.py [sf_dir] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
spark = build_spark(app_name="ab-simhash-firstmatch")
spark.range(1).count()
load_views(spark, SF_DIR)

ID, BITS, MAXH = "doc_id", 48, 3
N_BLOCKS = MAXH + 1
WIDTH = BITS // N_BLOCKS


def _blocked():
    d = spark.table("documents")
    fps = dedup.simhash(d, "text", ID, BITS)
    return fps.select(
        ID, "simhash",
        *[F.shiftright(F.col("simhash"), i * WIDTH)
          .bitwiseAND(F.lit((1 << WIDTH) - 1)).alias(f"blk{i}")
          for i in range(N_BLOCKS)],
    ).localCheckpoint(eager=False)


def _pairs(first_match: bool):
    blocked = _blocked()
    l, r = blocked.alias("l"), blocked.alias("r")

    def _block(i):
        cond = (F.col(f"l.blk{i}") == F.col(f"r.blk{i}")) & (
            F.col(f"l.{ID}") < F.col(f"r.{ID}"))
        if first_match:
            for j in range(i):
                cond = cond & (F.col(f"l.blk{j}") != F.col(f"r.blk{j}"))
        return (
            l.join(r, cond)
            .select(F.col(f"l.{ID}").alias("id_a"),
                    F.col(f"r.{ID}").alias("id_b"),
                    F.col("l.simhash").alias("__sim_a"),
                    F.col("r.simhash").alias("__sim_b"))
        )

    cand = _block(0)
    for i in range(1, N_BLOCKS):
        cand = cand.unionAll(_block(i))
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    return (cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= MAXH)
            .distinct()
            .orderBy("id_a", "id_b"))


def old_impl():
    return _pairs(first_match=False)


def new_impl():
    return _pairs(first_match=True)


def run(fn):
    t0 = time.time()
    df = fn()
    sig = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("id_a", "id_b", "hamming")).alias("x"),
    ).collect()[0]
    return time.time() - t0, (sig["n"], sig["x"])


# union-volume evidence (pre-filter candidate rows reaching the union)
def union_volume(first_match: bool):
    blocked = _blocked()
    l, r = blocked.alias("l"), blocked.alias("r")
    tot = 0
    for i in range(N_BLOCKS):
        cond = (F.col(f"l.blk{i}") == F.col(f"r.blk{i}")) & (
            F.col(f"l.{ID}") < F.col(f"r.{ID}"))
        if first_match:
            for j in range(i):
                cond = cond & (F.col(f"l.blk{j}") != F.col(f"r.blk{j}"))
        tot += l.join(r, cond).count()
    return tot


print("union volume old:", union_volume(False))
print("union volume new:", union_volume(True))

old_t, new_t = [], []
sig_old = sig_new = None
for rep in range(REPS):
    t, s = run(old_impl)
    old_t.append(t)
    sig_old = s
    t, s = run(new_impl)
    new_t.append(t)
    sig_new = s
    print(f"rep {rep}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s")

assert sig_old == sig_new, (sig_old, sig_new)
print("output identical:", sig_old)
old_t.sort(); new_t.sort()
import statistics
print(f"old min {old_t[0]:.3f} med {statistics.median(old_t):.3f}")
print(f"new min {new_t[0]:.3f} med {statistics.median(new_t):.3f}")
spark.stop()
