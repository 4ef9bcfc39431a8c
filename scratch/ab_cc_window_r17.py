"""r17 A/B: connected_components round body — groupBy+join per star
phase (r16) vs window-aggregate formulation (min over partitionBy(src)
— the same exchange serves both the min and the re-pointing, guide
§2.4 "two operations keyed the same way share one exchange").

Asserts identical (node, comp) output on the real embed pair graph and
on synthetic chains, then times the CC phase on the sf0.1 document
graph interleaved. Usage: python scratch/ab_cc_window_r17.py [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators import dedup
from snowflake_emulator_spark.session_factory import build_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF = "/root/testdata/sf0.1"


def cc_window(pairs, id_a="id_a", id_b="id_b", max_iterations=20):
    """Window-formulated large-star/small-star (candidate r17 shape)."""
    from pyspark.sql import Window

    from snowflake_emulator_spark.operators.dedup import (
        _release_local_checkpoint)

    base = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    nodes = (
        base.select(F.col("a").alias("node"))
        .unionAll(base.select(F.col("b").alias("node")))
        .distinct()
    )
    edges = (
        base.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("src"), F.least("a", "b").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("src")
    prev_sig = None
    converged = False
    for it in range(max_iterations):
        sym = edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        # large-star: ONE exchange — the window partitioning serves both
        # the neighborhood min and the per-row re-pointing
        lm = F.least(F.min("dst").over(w), F.col("src"))
        large = (
            sym.select("src", "dst", lm.alias("__m"))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        e2 = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst")).distinct()
        sm = F.min("dst").over(w)
        e2m = e2.select("src", "dst", sm.alias("__m"))
        new_edges = (
            e2m.filter(F.col("dst") != F.col("__m"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .unionAll(e2m.select("src", F.col("__m").alias("dst")))
            .distinct()
        )
        new_edges = new_edges.localCheckpoint(eager=False)
        sig = tuple(new_edges.agg(
            F.count("*"), F.bit_xor(F.xxhash64("src", "dst"))).collect()[0])
        _release_local_checkpoint(edges)
        edges = new_edges
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    mapping = (
        nodes.join(edges, nodes["node"] == edges["src"], "left")
        .select(nodes["node"], F.coalesce(edges["dst"], nodes["node"]).alias("comp"))
    )
    assert converged
    final = mapping.localCheckpoint(eager=True)
    _release_local_checkpoint(edges)
    _release_local_checkpoint(base)
    return final


spark = build_spark(app_name="ab-cc-r17")
sc = spark.sparkContext
load_views(spark, SF)
spark.sql("SELECT max(length(text)) FROM documents").collect()

# --- output equality on synthetic shapes ------------------------------
chain = spark.createDataFrame(
    [(i, i + 1) for i in range(63)] + [(100, 101), (200, 201), (201, 200)],
    ["id_a", "id_b"])
a = sorted(tuple(r) for r in dedup.connected_components(chain).collect())
b = sorted(tuple(r) for r in cc_window(chain).collect())
assert a == b, "chain mismatch"
print(f"chain identical: {len(a)} nodes", flush=True)

# --- output equality on the real document pair graph ------------------
d = spark.table("documents")
sh = dedup.shingle_table(d, shingle=5).localCheckpoint(eager=True)
cands = dedup.minhash_lsh_pairs(d, num_perm=16, bands=4, shingle=5, shingled=sh)
pairs = dedup.ngram_jaccard_pairs(d, shingle=5, threshold=0.5,
                                  candidates=cands, shingled=sh
                                  ).localCheckpoint(eager=True)
a = sorted(tuple(r) for r in dedup.connected_components(pairs).collect())
b = sorted(tuple(r) for r in cc_window(pairs).collect())
assert a == b, "doc graph mismatch"
print(f"doc graph identical: {len(a)} nodes", flush=True)

# --- job counts + interleaved timing on the materialized pair graph ---
def run(fn, tag, i):
    g = f"{tag}{i}"
    sc.setJobGroup(g, g)
    t0 = time.time()
    fn(pairs).count()
    dt = round(time.time() - t0, 3)
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(g)
    st = sum(len(sc.statusTracker().getJobInfo(j).stageIds) for j in jobs)
    return dt, len(jobs), st


def probe():
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    return round(time.time() - t0, 3)


told, tnew = [], []
for i in range(REPS):
    o = run(dedup.connected_components, "old", i)
    n = run(cc_window, "new", i)
    told.append(o[0])
    tnew.append(n[0])
    print(f"rep {i}: old={o} new={n} floor={probe()}", flush=True)
print(f"old: min={min(told)} med={statistics.median(told)} {told}")
print(f"new: min={min(tnew)} med={statistics.median(tnew)} {tnew}")
spark.stop()
