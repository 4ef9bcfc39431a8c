"""Scale-stress harness (r8 item 7, executed r10): run the SIX most
expensive registry operators at sf0.1 and at ~sf1 (sf0.1 replicated
REPLICAS times with re-salted ids) through the SAME registry code path
the bench uses, and report the sf1/sf0.1 wall-time ratios. A plan that
holds at scale should grow roughly linearly (ratio ≲ REPLICAS, with
~12x the working tolerance from the r8 plan): candidate sets stay
bucketed (no quadratic blowup), per-user/partition state stays bounded,
nothing collects unbounded driver state.

Synthesizes the scaled tables in /tmp (NEVER touches /root/testdata):
- documents: doc_id offset per replica + a per-replica ALPHABET
  ROTATION of the text (caesar shift of a-z by the replica index), so
  cross-replica documents share essentially NO character shingles
  while within-replica near-dup structure is preserved exactly (the
  dedup stack shingles CHARACTERS, dedup.shingle_table). Two earlier
  attempts measured the data instead of the plan: a one-token end
  salt (r8) left cross-replica copies as genuine near-dups, and a
  per-word suffix (first r10 run) still shared every in-word char
  gram — both inflate candidates QUADRATICALLY in the replica count.
- embeddings: vec_id offset + tiny per-replica vector perturbation.
- events: user_id/event_id offsets per replica — 10x the data as 10x
  the USERS, so per-user sessionization state stays constant (the
  realistic scale-out axis for event logs).
- all other tables: symlinked unchanged.

Usage: python scratch/scale_stress.py [replicas=10] [runs=2]
Emits one JSON line at the end for the round notes.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import REGISTRY, TABLES, load_views
from snowflake_emulator_spark.session_factory import build_spark

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SRC = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_survivors",
    "embed_near_pairs_lsh",
    "pipeline_keep_set",
    "text_tfidf_topterms",
    "events_sessionize",
    # r11 addition: exact-substring span removal (anchor relation is
    # the largest exploded intermediate in the repo)
    "doc_substring_dedup",
    # r13 (VERDICT item 6): the trained ANN paths — newest scale-path
    # claims; training cost is corpus-size-bound (one argmin pass +
    # one tiny partial-agg shuffle per round)
    "embed_pq_topk",
    "embed_ivfpq_topk",
    # r14 (VERDICT item 1): the rewritten per-source top-quantile —
    # range-partitioned rank, no per-group single-partition sort
    "doc_top_quantile_filter",
    # r15: the full crawl-to-corpus composition (WARC -> extract ->
    # dedup -> quantile -> resample -> pack) — the heaviest declared
    # pipeline, must scale like its parts
    "pipeline_crawl_to_corpus",
    # r16: the mixed-format codec kernel (synth encode + sniff +
    # decode per row in one mapInPandas pass) — embarrassingly
    # parallel by construction, the ratio gate proves no hidden
    # driver-side or skew bottleneck crept into the dispatch layer
    "multimodal_mixed_features",
]
# SCALE_STRESS_ONLY=a,b,c restricts the run for focused profiling
_only = os.environ.get("SCALE_STRESS_ONLY")
if _only:
    QUERIES = [q for q in QUERIES if q in set(_only.split(","))]
RATIO_TOLERANCE = 12.0  # r8 plan: sf1/sf0.1 <= ~12x on a 10x replica


def evaluate_full(df) -> None:
    """Same full-output evaluation as bench.py: hash every output column
    into one aggregate so nothing gets column-pruned away."""
    df.select(F.xxhash64(*df.columns).alias("__h")) \
        .agg(F.bit_xor("__h").alias("__s")).collect()


def time_queries(spark, sf_dir: str, label: str) -> dict:
    from snowflake_emulator_spark import inventory as _inv

    out = {}
    for name in QUERIES:
        fn, _oracle = REGISTRY[name]
        best = None
        for _ in range(RUNS):
            # r17: the components memo is gone from inventory.py (every
            # run computes the full pipeline); nothing to clear
            assert not hasattr(_inv, "_comps_cache")
            t0 = time.time()
            evaluate_full(fn(spark, sf_dir))
            e = time.time() - t0
            best = e if best is None or e < best else best
        out[name] = round(best, 2)
        print(f"  {label} {name}: {out[name]}s", flush=True)
    return out


def build_scaled(spark, workdir: str) -> None:
    load_views(spark, SRC)
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")

    docs = spark.table("documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def _rot(r: int) -> str:
        return alpha[r % 26:] + alpha[: r % 26]

    (docs.crossJoin(F.broadcast(reps))
         .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs)
         # per-replica caesar rotation: char shingles are disjoint
         # across replicas, identical structure within each replica
         .withColumn("text", F.element_at(F.array(*[
             F.translate(F.lower(F.col("text")), alpha, _rot(r))
             for r in range(REPLICAS)]), F.col("rep").cast("int") + 1))
         .drop("rep")
         # spread the 10x corpus over the executor width: the scaled
         # parquet is only ~6 MB compressed, which would otherwise scan
         # as 1-2 input partitions and serialize the shingle explosion
         .repartition(32)
         .write.mode("overwrite").parquet(f"{workdir}/documents.parquet"))

    emb = spark.table("embeddings")
    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # r13: per-replica coordinate ROTATION (circular shift by rep*7)
    # instead of the old tiny per-replica perturbation. The perturbation
    # kept every vector's 10 replica copies mutual near-dups (cos~0.999
    # and exact twins at rep%7 collisions), so pair-emitting queries
    # measured QUADRATIC pair growth in the data, not the plan: 424
    # pairs at sf0.1 ballooned to 328,856 at 10x (the same class of
    # artifact the documents build fixed twice — one-token salt, then
    # per-word suffix). A coordinate permutation is ORTHOGONAL: every
    # within-replica cosine is preserved EXACTLY (per-replica pair
    # structure == base), while cross-replica copies decorrelate to
    # ~random cosine — 10x data means ~10x pairs, which is what a
    # plan-scaling harness must hold constant.
    dim = len(emb.select("embedding").first()[0])
    shifted = F.array(*[
        F.array(*[F.col("embedding")[(i + r * 7) % dim]
                  for i in range(dim)])
        for r in range(REPLICAS)])
    (emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_emb)
        .withColumn("embedding",
                    F.element_at(shifted, F.col("rep").cast("int") + 1))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{workdir}/embeddings.parquet"))

    ev = spark.table("events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (ev.crossJoin(F.broadcast(reps))
       .withColumn("user_id", F.col("user_id") + F.col("rep") * n_users)
       .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
       .drop("rep")
       .repartition(32)
       .write.mode("overwrite").parquet(f"{workdir}/events.parquet"))

    for t in TABLES:
        dst = f"{workdir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def ivfpq_recall(spark, sf_dir: str) -> dict:
    """r14 (VERDICT item 3): recall measurement — not just a time
    ratio — for the scale-aware trained IVF-PQ, at the given dir.
    Recall@10 of the registry entry's exact config vs brute-force
    cosine top-10 over the same 5 query ids, plus the nc/nprobe the
    rules picked."""
    from snowflake_emulator_spark.operators import similarity

    load_views(spark, sf_dir)
    e = spark.table("embeddings")
    n = e.count()
    nc = similarity.scale_aware_nc(n)
    npr = similarity.scale_aware_nprobe(nc)
    qs = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk_bruteforce(e, qs, k=10)
    approx = similarity.ivfpq_topk(
        e, qs, k=10, n_centroids=None, nprobe=None,
        m=32, ksub=128, train_rounds=3, coarse_train_rounds=2, refine=4)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    return {"n": n, "nc": nc, "nprobe": npr,
            "recall_at_10": round(len(ex & ap) / len(ex), 3)}


def _clustered_embeddings(spark, n: int, dim: int = 64,
                          group_size: int = 11):
    """Deterministic embedding table with PLANTED near-neighbor groups
    for the large-n ANN stress: vectors come in groups of 11 sharing a
    hash-derived center plus a tiny per-member offset, unit-normalized.
    Each query's true cosine top-10 is exactly its 10 group twins (the
    near-dup structure ANN exists for at crawl scale) — so recall
    measures whether coarse probing + ADC find and rank a REAL
    neighborhood, not tie-noise among equidistant uniform points (a
    first draft with uniform offsets measured exactly that and sat at
    0.58 regardless of the index). No RNG (replayable); unit norm so
    the cosine oracle and the L2 coarse/residual path agree on
    ordering; no duplicate vectors (distinct member offsets)."""
    g = F.col("vec_id") - (F.col("vec_id") % group_size)  # group anchor
    coords = []
    for j in range(dim):
        center = ((((g * 91 + j * 7919) % 1048576) * 2654435761)
                  % 4294967296) / 4294967296.0 - 0.5
        off = (((F.col("vec_id") * 31 + j * 17) * 40503) % 997) / 997.0 \
            * 0.01 - 0.005
        coords.append(center + off)
    vec = F.array(*coords)
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(vec, lambda x: (x / norm).cast("float"))
    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .select("vec_id", unit.alias("embedding")))


def ivfpq_recall_large(spark, n_target: int = 204800) -> dict:
    """r15 (VERDICT order #3): stress row at n=200k+, where the old
    nc=64 cap would bind — isqrt(204800/25) = 90 > 64 — proving the
    seed budget is a knob, not a structural limit. Same entry config
    (scale-aware nc/nprobe, trained coarse + residual codebooks),
    recall@10 vs brute-force cosine, gate >= 0.6 enforced by exit
    code in main()."""
    from snowflake_emulator_spark.operators import similarity

    emb = _clustered_embeddings(spark, n_target).persist()
    n = emb.count()
    nc = similarity.scale_aware_nc(n)
    npr = similarity.scale_aware_nprobe(nc)
    # five queries in five DISTINCT planted groups (ids 0-4 would all
    # share group 0's neighborhood)
    qs = [0, 11011, 55005, 110003, 180004]
    exact = similarity.cosine_topk_bruteforce(emb, qs, k=10)
    approx = similarity.ivfpq_topk(
        emb, qs, k=10, n_centroids=None, nprobe=None,
        m=32, ksub=128, train_rounds=3, coarse_train_rounds=2, refine=4)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    emb.unpersist()
    return {"n": n, "nc": nc, "nprobe": npr,
            "old_cap_would_bind": nc > 64,
            "recall_at_10": round(len(ex & ap) / len(ex), 3)}


def quantile_partition_spread(spark, sf_dir: str) -> dict:
    """r14 (VERDICT item 1 'done' clause): at 10x documents, every
    source must span MORE than one range partition in the rewritten
    top_quantile_per_group — the r13 weak plan pinned each source to
    exactly one task regardless of shuffle width. Mirrors the
    operator's repartitionByRange key (corpus.py top_quantile_per_group)
    and counts distinct physical partitions per source."""
    from snowflake_emulator_spark.operators import textstats

    load_views(spark, sf_dir)
    scored = spark.table("documents").select(
        "doc_id", "source",
        textstats.quality_score(F.col("text")).alias("q"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_src = (
        scored.repartitionByRange(n_parts, F.col("source"),
                                  F.col("q").desc(), F.col("doc_id"))
        .select(F.spark_partition_id().alias("__pid"), "source")
        .groupBy("source")
        .agg(F.countDistinct("__pid").alias("nparts"))
        .collect())
    counts = {r["source"]: int(r["nparts"]) for r in per_src}
    return {"n_range_partitions": n_parts,
            "min_partitions_per_source": min(counts.values()),
            "max_partitions_per_source": max(counts.values()),
            "sources": len(counts)}


def main() -> None:
    spark = build_spark(app_name="scale_stress")
    print(f"baseline at {SRC} (best of {RUNS}):", flush=True)
    base = time_queries(spark, SRC, "sf0.1")

    workdir = tempfile.mkdtemp(prefix="scale_stress_")
    try:
        t0 = time.time()
        build_scaled(spark, workdir)
        print(f"scaled tables built ({REPLICAS}x) in "
              f"{time.time()-t0:.0f}s", flush=True)
        scaled = time_queries(spark, workdir, f"sf0.1x{REPLICAS}")
        spread = quantile_partition_spread(spark, workdir)
        recall = {"base": ivfpq_recall(spark, SRC),
                  "scaled": ivfpq_recall(spark, workdir)}
        print(f"ivfpq recall: {recall}", flush=True)
        t0 = time.time()
        recall["large"] = ivfpq_recall_large(spark)
        recall["large"]["sec"] = round(time.time() - t0, 1)
        print(f"ivfpq recall large-n: {recall['large']}", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    ratios = {n: round(scaled[n] / base[n], 2) for n in QUERIES}
    flagged = {n: r for n, r in ratios.items() if r > RATIO_TOLERANCE}
    print(json.dumps({
        "replicas": REPLICAS, "runs": RUNS,
        "base_sec": base, "scaled_sec": scaled, "ratios": ratios,
        "tolerance": RATIO_TOLERANCE, "superlinear": flagged,
        "top_quantile_partition_spread": spread,
        "ivfpq_recall": recall,
    }))
    sys.exit(1 if flagged or spread["min_partitions_per_source"] <= 1
             or recall["base"]["recall_at_10"] < 0.75
             or recall["scaled"]["recall_at_10"] < 0.75
             or recall["large"]["recall_at_10"] < 0.75
             or not recall["large"]["old_cap_would_bind"]
             else 0)


if __name__ == "__main__":
    main()
