"""r17 optimization-round regression tests: exact_cosine_pairs column
tiling (guide §5 memory bound) and null handling, match_recognize
null-partition-key grouping."""

import numpy as np
import pytest

from snowflake_emulator_spark.operators import similarity


def _mk_emb(spark, n=150, dim=8, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    for i in range(0, n, 5):
        m[i + 1] = m[i] + rng.normal(scale=0.05, size=dim)
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_exact_cosine_pairs_tiled_kernel_matches_join_form(spark, monkeypatch):
    """The r17 column-tiled kernel must stay bit-identical to the
    relational theta-join fallback under a FORCED tiny tile (7 columns
    over 150 ids -> 22 tiles, boundaries mid-run everywhere), including
    every rounded double. This is the tile-math assertion ADVICE r16
    asked for: correctness is tile-size-invariant, so the production
    tile (8192) bounds per-task memory without touching values."""
    emb = _mk_emb(spark)
    monkeypatch.setattr(similarity, "_PAIRS_COL_TILE", 7)
    kernel = [tuple(r) for r in
              similarity.exact_cosine_pairs(emb, threshold=0.6)
              .orderBy("id_a", "id_b").collect()]
    join = [tuple(r) for r in
            similarity.exact_cosine_pairs(emb, threshold=0.6,
                                          max_broadcast_rows=0)
            .orderBy("id_a", "id_b").collect()]
    assert kernel == join
    assert len(kernel) >= 150 // 5


def test_exact_cosine_pairs_tile_memory_bound():
    """Tile math: at the broadcast cap and the default 10k-row Arrow
    batch, the kernel's three live (rows x tile) float64 temporaries
    stay under 2 GB per task (vs ~48 GB untiled at the 200k cap)."""
    rows_per_batch = 10_000
    tile = similarity._PAIRS_COL_TILE
    bytes_per_temp = rows_per_batch * tile * 8
    assert 3 * bytes_per_temp < 2 * 1024**3
    # and the cap itself is the shared driver_bounds policy value
    from snowflake_emulator_spark.operators.driver_bounds import (
        EXACT_PAIRS_MAX_BROADCAST_ROWS)
    assert EXACT_PAIRS_MAX_BROADCAST_ROWS == 200_000


def test_exact_cosine_pairs_null_embedding_dropped(spark):
    """ADVICE r16: a NULL embedding must be dropped (the pre-r16
    theta-join dropped it via a NULL cosine) — on BOTH paths, instead
    of raising np.stack errors in the kernel."""
    base = _mk_emb(spark, n=50)
    withnull = base.unionAll(spark.createDataFrame(
        [(999, None), (998, None)], base.schema))
    got_k = [tuple(r) for r in
             similarity.exact_cosine_pairs(withnull, threshold=0.6)
             .orderBy("id_a", "id_b").collect()]
    got_j = [tuple(r) for r in
             similarity.exact_cosine_pairs(withnull, threshold=0.6,
                                           max_broadcast_rows=0)
             .orderBy("id_a", "id_b").collect()]
    want = [tuple(r) for r in
            similarity.exact_cosine_pairs(base, threshold=0.6)
            .orderBy("id_a", "id_b").collect()]
    assert got_k == want
    assert got_j == want


@pytest.mark.parametrize("all_rows", [False, True])
def test_match_recognize_null_partition_key_one_group(spark, all_rows):
    """ADVICE r16: a nullable partition key arrives in pandas as
    NaN/None, and NaN != NaN would make every null-key row a singleton
    group — the pre-r16 groupBy().applyInPandas matched the whole null
    group together. The pattern needs 3 consecutive rows, so it only
    matches if the null rows form ONE group."""
    from snowflake_emulator_spark.operators.match_recognize import (
        match_recognize)

    rows = [(None, 1, 1.0), (None, 2, 2.0), (None, 3, 3.0),
            (7, 1, 1.0), (7, 2, 2.0), (7, 3, 3.0)]
    df = spark.createDataFrame(rows, "u INT, seq INT, v DOUBLE")
    m = match_recognize(
        df, "u", ["seq"],
        define={"A": "v > 0"},
        pattern="A A A",
        measure_cols=None if all_rows else ["v"],
        all_rows=all_rows,
        all_rows_measures=[("COUNT", "*", "rn", False)] if all_rows
        else None,
    )
    got = m.collect()
    if all_rows:
        # every row of both groups matched, one match per group
        assert len(got) == 6
        assert {r["match_number"] for r in got} == {1}
        assert sorted(r["rn"] for r in got if r["u"] is None) == [1, 2, 3]
    else:
        # exactly one 3-row match per group incl. the null group
        nulls = [r for r in got if r["u"] is None]
        assert len(got) == 2 and len(nulls) == 1
        assert nulls[0]["n_rows"] == 3


def test_simhash_pigeonhole_candidates_emit_once(spark):
    """The r17 first-match pigeonhole must emit each candidate pair
    EXACTLY ONCE across the per-block join union (identical
    fingerprints agree on every block and previously flowed through
    the union once per block), while still covering every pair within
    the Hamming bound — so the trailing distinct's input is minimal
    and its output unchanged."""
    from pyspark.sql import functions as F

    from snowflake_emulator_spark.operators import dedup

    # 7 distinct texts x ~6 copies: many identical-fingerprint pairs
    # (agree on ALL blocks) plus cross-text pairs
    rows = [(i, f"common shared tokens alpha beta gamma delta epsilon "
                f"doc {i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bits, max_hamming = 48, 3
    n_blocks, width = max_hamming + 1, 48 // (max_hamming + 1)
    fps = dedup.simhash(df, bits=bits)
    blocked = fps.select(
        "doc_id", "simhash",
        *[F.shiftright(F.col("simhash"), i * width)
          .bitwiseAND(F.lit((1 << width) - 1)).alias(f"blk{i}")
          for i in range(n_blocks)],
    )
    cand = dedup._pigeonhole_candidates(blocked, "doc_id", n_blocks)
    emitted = [(r["id_a"], r["id_b"]) for r in cand.collect()]
    # exactly once per candidate pair — no duplicates reach the union
    assert len(emitted) == len(set(emitted))
    # full recall: every within-bound pair is still among the candidates
    fp = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    expect = {(a, b) for a in fp for b in fp
              if a < b and bin(fp[a] ^ fp[b]).count("1") <= max_hamming}
    assert expect <= set(emitted)
    # identical-text pairs exist in this fixture (the all-blocks-agree case)
    assert any(a % 7 == b % 7 for a, b in expect)


def test_jaccard_size_prefilter_keeps_borderline_pairs(spark):
    """The r17 candidate size prefilter (J <= min/max size ratio) must
    never change output: candidate-driven scoring with an ALL-PAIRS
    candidate set equals direct-mode scoring, on a corpus that
    includes a ratio-below-threshold candidate (pruned, but its J was
    sub-threshold anyway) and a near-dup pair of UNEQUAL sizes whose
    ratio sits just above the threshold (must NOT be pruned)."""
    from itertools import combinations

    from snowflake_emulator_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river"
    docs = [
        (1, base),
        (2, base + " bank"),                      # near-dup, ratio ~0.93
        (3, base + " and then runs far away into the deep dark woods "
            "beyond the hills for many long hours"),  # shares prefix, low ratio
        (4, "entirely different text about parquet shuffles and arrow"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    all_pairs = spark.createDataFrame(
        [(a, b) for a, b in combinations([1, 2, 3, 4], 2)],
        ["id_a", "id_b"])
    direct = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              dedup.ngram_jaccard_pairs(df, shingle=5, threshold=0.5)
              .collect()}
    cand = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            dedup.ngram_jaccard_pairs(df, shingle=5, threshold=0.5,
                                      candidates=all_pairs).collect()}
    assert (1, 2) in cand          # unequal-size near-dup survives
    assert direct == cand          # prefilter changes nothing
    # sanity: the filter really has something to prune here (1,3) —
    # sizes differ by >2x so the ratio bound excludes it
    sizes = {r["doc_id"]: r["n"] for r in
             dedup.shingle_table(df, shingle=5)
             .groupBy("doc_id").count().withColumnRenamed("count", "n")
             .collect()}
    assert min(sizes[1], sizes[3]) / max(sizes[1], sizes[3]) < 0.5
    # independent brute-force cross-check (r17: direct mode now also
    # carries the prefilter, so direct==cand alone could mask a shared
    # wrong prune): replicate normalize->distinct-5-gram->jaccard in
    # pure Python and compare the surviving pairs AND scores.
    import re

    def _norm(s):
        s = re.sub(r"[^a-z0-9\s]", "", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    def _shingles(s, n=5):
        t = _norm(s)
        return {t} if len(t) < n else {t[i:i + n]
                                       for i in range(len(t) - n + 1)}

    sets = {i: _shingles(t) for i, t in docs}
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
        if j >= 0.5:
            expect[(a, b)] = j
    assert direct == expect
