"""Similarity search over embedding columns (``array<float>``).

Three tiers, all shuffle-conscious:

* ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the full embedding table; per-row dot products run
  JVM-side via ``aggregate``/``zip_with`` with norms precomputed once
  per vector (not per pair). One scan, no shuffle except the final
  per-query top-k. The correct 100 TB baseline when queries are few,
  and bit-identical to the DuckDB oracle (sequential double fold).
* ``cosine_near_pairs`` — all near-duplicate pairs above a cosine
  threshold, LSH-bucketed by random-hyperplane signs so the self-join
  is per-bucket, never O(n²); candidate scoring is Arrow-batched
  numpy (vectorized — the interpreted per-element HOF fold is the
  slow path once pair counts grow).
* ``ivf_topk`` — IVF-style: partition vectors by nearest centroid
  (deterministic hash-seeded centroids), search only the query's
  ``nprobe`` nearest centroid buckets. The scale path when queries are
  many: turns a full scan per query into a bucket scan.

Exact-parity note: the JVM fold (`_dot`) adds elements sequentially,
matching DuckDB's ``list_dot_product`` bit-for-bit; numpy's pairwise
summation may differ in the last ulp, so numpy is used only for
approximate (rows-only-checked) operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


@F.pandas_udf(T.DoubleType())
def _cosine_batch(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched numpy cosine for approximate paths."""
    import numpy as np

    a = np.stack(va.to_numpy()).astype("float64")
    b = np.stack(vb.to_numpy()).astype("float64")
    num = (a * b).sum(axis=1)
    den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
    return pd.Series(num / den)


def cosine_topk_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Plan shape: broadcast(queries) nested-loop join -> per-row dot in
    codegen (norms precomputed per side) -> window top-k. Returns
    (query_id, neighbor_id, rank, cosine_sim)."""
    base = emb.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("vnorm"))
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("vnorm").alias("qnorm")
    )
    scored = base.join(F.broadcast(queries), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_dot(F.col("qvec"), F.col(vec_col)) / (F.col("qnorm") * F.col("vnorm")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a seed (no RNG state:
    engine-neutral + reproducible across runs)."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"hp{seed}_{j}".encode()).hexdigest()
        vals.append((int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0)
    return vals


def rp_lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane sign signature -> bucket id (0..2^n_planes-1)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        d = _dot(vec, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.95, dim: int = 64,
                      n_planes: int = 6, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold.

    Bucketed self-join on the RP-LSH signature (vectors with very high
    cosine nearly always share all hyperplane signs); candidates are
    then scored with the vectorized numpy kernel."""
    b = emb.select(
        F.col(id_col), F.col(vec_col), rp_lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket")
    ).persist()
    l, r = b.alias("l"), b.alias("r")
    cand = l.join(
        r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    )
    return (
        cand.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(_cosine_batch(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest deterministic
    centroid; search only each query's nprobe nearest centroid buckets.

    Centroids are hyperplane-seeded pseudo-random vectors (stable across
    runs/engines). At scale, bucket assignment is one scan; per-query
    work drops by ~n_centroids/nprobe. Approximate by construction, so
    it carries a rows-only correctness check (recall measured in tests
    against the brute-force oracle)."""
    cents = [(c, _hyperplane(dim, 1000 + c)) for c in range(n_centroids)]

    def nearest_assign(vec: Column, take: int) -> Column:
        dists = F.array(*[
            F.struct(_dot(vec, F.array(*[F.lit(v) for v in cv])).alias("d"), F.lit(c).alias("c"))
            for c, cv in cents
        ])
        best = F.slice(
            F.array_sort(dists, lambda a, b: F.when(a["d"] > b["d"], -1).when(a["d"] < b["d"], 1).otherwise(0)),
            1, take,
        )
        return F.transform(best, lambda s: s["c"])

    assigned = emb.select(
        F.col(id_col), F.col(vec_col), nearest_assign(F.col(vec_col), 1)[0].alias("bucket")
    )
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(nearest_assign(F.col(vec_col), nprobe)).alias("bucket"),
    )
    scored = assigned.join(F.broadcast(queries), "bucket").filter(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_cosine_batch(F.col("qvec"), F.col(vec_col)), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
