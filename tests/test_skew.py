"""salted_join: skew-resistant equi-join (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from snowflake_emulator_spark.operators.skew import (
    SALT_COL,
    salt_column,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 (the hot key)
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("lv"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], "k long, rv string"
    )
    return left, right


def test_salted_inner_matches_plain_join(skewed):
    left, right = skewed
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert salted.columns == plain.columns


def test_salted_left_keeps_unmatched_once(skewed):
    left, _ = skewed
    right = left.sparkSession.createDataFrame([(0, "only_hot")], "k long, rv string")
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], salt=4, how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_spreads_hot_key(skewed):
    left, _ = skewed
    hot = salt_column(left, 8).where(F.col("k") == 0)
    n_salts = hot.select(SALT_COL).distinct().count()
    # the hot key must occupy most of the 8 sub-keys, not 1
    assert n_salts >= 6


def test_rejects_right_and_full_joins(skewed):
    left, right = skewed
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, ["k"], how=how)


def test_join_condition_includes_salt(skewed):
    left, right = skewed
    plan = salted_join(left, right, ["k"], salt=8)._jdf.queryExecution().toString()
    assert SALT_COL in plan


# ---------------------------------------------------------------------------
# hot-bucket stress for the LSH/banding joins (r3 verdict item 6): the
# design claims skew-safety under AQE for the per-(band, hash) bucketed
# self-joins and bounded memory via chunked BLAS in near-pairs scoring.
# One pathologically hot bucket (~30% identical docs / one shared LSH
# cell) must complete in bounded time with correct output.
# ---------------------------------------------------------------------------

def test_minhash_lsh_hot_bucket_completes(spark):
    """30% of docs are byte-identical -> every band hash of the hot
    group collides into ONE (band, hash) bucket. The bucketed self-join
    must complete (AQE splits the hot bucket; no cross join) and emit
    exactly the hot clique plus nothing across groups."""
    import time

    from snowflake_emulator_spark.operators import dedup

    n, hot = 600, 180
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 5)
            for i in range(hot)]
    rows += [(i, f"unique document body number {i} with distinct words "
                 f"{i * 7} {i * 13} {i * 31} and no shared shingles")
             for i in range(hot, n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(df).collect()
    elapsed = time.time() - t0
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    expected_hot = {(a, b) for a in range(hot) for b in range(a + 1, hot)}
    # the identical clique is fully recalled; nothing links hot to cold
    assert expected_hot <= got
    assert all(a < hot and b < hot or (a >= hot and b >= hot) for a, b in got)
    # bounded completion: a cross-join regression would blow past this
    assert elapsed < 120, f"hot-bucket LSH join took {elapsed:.0f}s"


def test_near_pairs_hot_bucket_chunked_blas(spark):
    """One bucket holds n=2200 IDENTICAL vectors — far above the
    chunked-BLAS chunk size (max(64, 4e6/2200) ~ 1818), so the scorer
    must loop over >=2 chunks rather than materializing the n x n sims
    matrix. All C(n,2) pairs are near-duplicates; the count must be
    exact (every chunk boundary handled) and the job must finish in
    bounded time."""
    import time

    from snowflake_emulator_spark.operators import similarity

    dim, n = 16, 2200
    v = [1.0] + [0.5] * (dim - 1)
    emb = spark.createDataFrame([(i, v) for i in range(n)],
                                "vec_id long, embedding array<float>")
    t0 = time.time()
    got = similarity.cosine_near_pairs(
        emb, threshold=0.99, dim=dim, n_planes=4, n_bands=2).count()
    elapsed = time.time() - t0
    assert got == n * (n - 1) // 2
    assert elapsed < 120, f"hot-bucket near-pairs took {elapsed:.0f}s"


def test_near_pairs_planted_clique_exact(spark):
    """A planted identical 5-clique among deterministic noise vectors:
    with a threshold above every cross-pair cosine (asserted with a
    numpy oracle in-test), the exact-rescore path must return the
    clique and nothing else, with JVM-exact cosine 1.0."""
    import numpy as np

    from snowflake_emulator_spark.operators import similarity

    dim, n = 16, 40
    vecs = []
    for i in range(n):
        if i < 5:
            v = [1.0] + [0.25] * (dim - 1)
        else:
            # deterministic signed pseudo-noise (md5-seeded, no RNG
            # state): random signed 16-dim vectors have pairwise
            # cosines well below the threshold
            v = similarity._hyperplane(dim, 5000 + i)
        vecs.append(v)
    m = np.array(vecs)
    mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
    sims = mn @ mn.T
    np.fill_diagonal(sims, 0.0)
    cross_max = max(sims[i, j] for i in range(n) for j in range(n)
                    if not (i < 5 and j < 5))
    threshold = 0.999
    assert cross_max < threshold - 1e-3, "fixture degenerate"
    out = similarity.cosine_near_pairs(
        emb := spark.createDataFrame(list(enumerate(vecs)),
                                     "vec_id long, embedding array<float>"),
        threshold=threshold, dim=dim, n_planes=4, n_bands=2,
        exact_rescore=True).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    clique = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    assert got == clique
    assert all(abs(r["cosine_sim"] - 1.0) < 1e-9 for r in out)


def test_near_pairs_rescore_bitwise_matches_jvm_fold(spark):
    """r16: the exact-rescore path computes dot/norms INSIDE the bucket
    kernel (numpy, strict left-associated float64 fold) instead of
    re-joining the vectors and folding in the JVM. Assert the emitted
    cosine is BIT-IDENTICAL to the JVM sequential aggregate(zip_with)
    fold over the same vectors — the invariant that keeps the DuckDB
    list_dot_product oracle hash-green."""
    import struct

    from pyspark.sql import functions as F

    from snowflake_emulator_spark.operators import similarity

    dim, n = 16, 40
    vecs = [similarity._hyperplane(dim, 7000 + i) for i in range(n)]
    emb = spark.createDataFrame(list(enumerate(vecs)),
                                "vec_id long, embedding array<float>")
    out = similarity.cosine_near_pairs(
        emb, threshold=-1.0, dim=dim, n_planes=1, n_bands=2,
        exact_rescore=True).collect()
    assert out, "no candidate pairs emitted"
    # JVM reference: sequential fold over the same float32 vectors
    base = emb.select("vec_id", "embedding",
                      similarity._norm(F.col("embedding"), None).alias("nrm"))
    l = base.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                    F.col("nrm").alias("na"))
    r = base.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                    F.col("nrm").alias("nb"))
    ref = {(row["id_a"], row["id_b"]): row["cos"] for row in
           l.join(r, F.col("id_a") < F.col("id_b")).select(
               "id_a", "id_b",
               F.round(similarity._dot(F.col("va"), F.col("vb"), None)
                       / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
                       6).alias("cos")).collect()}
    for row in out:
        expect = ref[(row["id_a"], row["id_b"])]
        got = row["cosine_sim"]
        assert struct.pack("<d", got) == struct.pack("<d", expect), (
            f"pair ({row['id_a']},{row['id_b']}): kernel {got!r} != JVM fold {expect!r}")
