"""Extension-operator tests: dedup, similarity, text stats, multimodal,
streaming — verified on the sf0.001 driver fixtures."""

import pytest
from pyspark.sql import functions as F

from snowflake_emulator_spark.operators import (
    decontaminate,
    dedup,
    multimodal,
    similarity,
    textstats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(docs):
    out = dedup.exact_dedup_keys(docs)
    assert out.columns == ["fp", "keep_id", "n_dups"]
    total = out.agg(F.sum("n_dups")).collect()[0][0]
    assert total == docs.count()


def test_minhash_lsh_finds_exact_dups(docs):
    # exact duplicates (same normalized text) must collide in every band
    dup_classes = dedup.exact_dedup_keys(docs).filter(F.col("n_dups") > 1)
    pairs = dedup.minhash_lsh_pairs(docs, num_perm=16, bands=4)
    if dup_classes.count() > 0:
        assert pairs.count() > 0
    # sanity: pair ids ordered
    bad = pairs.filter(F.col("id_a") >= F.col("id_b")).count()
    assert bad == 0


def test_simhash_stability(docs):
    fp1 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, bits=16).collect()}
    fp2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, bits=16).collect()}
    assert fp1 == fp2
    assert all(0 <= v < (1 << 16) for v in fp1.values())


def test_ngram_jaccard_self_similarity(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text about spark engines")],
        ["doc_id", "text"],
    )
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.9).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)
    assert pairs[0]["jaccard"] == 1.0


def test_cosine_topk(emb):
    out = similarity.cosine_topk_bruteforce(emb, [0, 1], k=5)
    rows = out.collect()
    assert len(rows) == 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        sims = [r["cosine_sim"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_ivf_recall_against_bruteforce(emb):
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1, 2], k=5)
    approx = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_text_stats_expressions(docs):
    out = docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tok"),
        textstats.quality_score(F.col("text")).alias("q"),
        textstats.language_guess(F.col("text")).alias("lang_guess"),
        textstats.fingerprint(F.col("text")).alias("fp"),
    )
    rows = out.collect()
    assert all(r["n_tok"] > 0 for r in rows)
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
    assert all(len(r["fp"]) == 32 for r in rows)


def test_multimodal_feature_extraction(spark):
    media = multimodal.make_fake_media(spark, n=12)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 12
    assert all(r["decode_ok"] for r in feats)
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic across runs
    feats2 = multimodal.extract_features(multimodal.make_fake_media(spark, n=12), fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_decode_unknown_container_raises():
    """r15: decode_image dispatches on magic bytes to the real
    decoders (see test_multimodal_mixed.py); unsniffable content now
    raises ValueError — the r14 NotImplementedError is gone."""
    with pytest.raises(ValueError, match="unrecognized media container"):
        multimodal.decode_image(b"xx", fake=False)


def test_frame_sampling(spark):
    media = multimodal.make_fake_media(spark, n=9)
    frames = multimodal.sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert len(rows) == 3 * 6  # 3 videos x (0..5000 step 1000)


def test_asof_join_semantics(spark):
    from snowflake_emulator_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 25), (3, "A", 31), (4, "B", 5)],
        ["trade_id", "sym", "t"],
    )
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 30, 102.0), ("B", 9, 50.0)],
        ["sym", "t", "px"],
    )
    out = asof_join(trades, quotes, by=["sym"], left_time="t", right_time="t",
                    value_cols=["px"], suffix="")
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    # t=10 matches the quote AT 10; t=25 takes the 20 quote; t=31 the 30
    # quote; B's trade at 5 has no prior quote -> NULL
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None}


def test_simhash_near_pairs_full_recall(spark):
    """Multi-block pigeonhole must find every pair within max_hamming —
    verify against a brute-force driver-side check on a small corpus."""
    rows = [(i, f"common shared tokens alpha beta gamma delta epsilon doc {i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, bits=48).collect()}
    expect = set()
    for a in fps:
        for b in fps:
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3:
                expect.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.simhash_near_pairs(df, bits=48, max_hamming=3).collect()}
    assert got == expect


def test_simhash_near_pairs_no_nested_loop(spark):
    """The blocking must compile to equi-joins, never a
    BroadcastNestedLoopJoin (the r1 OR-join scale-killer)."""
    df = spark.createDataFrame([(i, f"t {i}") for i in range(4)], ["doc_id", "text"])
    plan = dedup.simhash_near_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_near_pairs_chunked(spark):
    """Chunked per-bucket scoring returns the same pairs as a
    brute-force check even when the bucket exceeds the chunk size."""
    import math
    import random

    random.seed(7)
    dim = 4
    # 3 clusters of near-identical vectors + noise, n > chunk floor (64)
    base = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    rows = []
    for i in range(300):
        b = base[i % 3]
        v = [x + random.uniform(-0.01, 0.01) for x in b]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.cosine_near_pairs(emb, threshold=0.999, dim=dim, n_planes=2).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    vecs = dict(rows)
    # brute-force restricted to same-LSH-bucket pairs (the operator is
    # bucket-approximate by design); near-identical cluster members
    # share all hyperplane signs
    expect = set()
    for a in range(300):
        for b in range(a + 1, 300):
            if a % 3 == b % 3 and cos(vecs[a], vecs[b]) >= 0.999:
                expect.add((a, b))
    assert expect and got.issuperset(expect)


def test_cosine_near_pairs_multi_chunk_exact(spark):
    """Force the per-bucket scorer across multiple chunks
    (n > 4M/n => n > 2000) and compare against a whole-matrix numpy
    reference — catches chunk-offset indexing bugs."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim = 2600, 4
    m = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    thr = 0.995
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.cosine_near_pairs(emb, threshold=thr, dim=dim, n_planes=1).collect()}

    mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
    from snowflake_emulator_spark.operators.similarity import _hyperplane
    plane = np.array(_hyperplane(dim, 0))
    bucket = (m @ plane >= 0).astype(int)
    sims = mn @ mn.T
    iu = np.triu_indices(n, 1)
    sel = (sims[iu] >= thr) & (bucket[iu[0]] == bucket[iu[1]])
    expect = {(int(a), int(b)) for a, b in zip(iu[0][sel], iu[1][sel])}
    assert len(expect) > 50 and got == expect


def test_decontaminate_ngram_overlap(spark):
    """A corpus doc sharing a benchmark n-gram is flagged with the
    right counts; clean docs and sub-n-word docs are not flagged."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares "quick brown fox jumps" and "brown fox jumps over"
            (1, "a quick brown fox jumps over fences all day"),
            (2, "completely unrelated text about databases and joins"),
            (3, "fox jumps"),  # shorter than n: no grams, never flagged
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            decontaminate.contaminated_docs(corpus, bench, n=4).collect()}
    assert set(rows) == {1}
    r = rows[1]
    # doc 1 has 6 distinct 4-grams; 2 of them appear in the benchmark
    assert r["n_grams"] == 6 and r["n_hit_grams"] == 2
    assert abs(r["hit_ratio"] - round(2 / 6, 6)) < 1e-9


def test_word_ngrams_short_doc_empty(spark):
    """sequence(1,0) descending-gotcha guard: docs shorter than n yield
    zero grams instead of corrupt slices."""
    df = spark.createDataFrame([(1, "only three words"), (2, "a b c d")],
                               ["doc_id", "text"])
    got = decontaminate.word_ngrams(df, 4).collect()
    assert [(r["doc_id"], r["gram"]) for r in got] == [(2, "a b c d")]


def test_cosine_near_pairs_banding_recall(spark):
    """OR-amplification: multi-band LSH recovers moderate-similarity
    pairs a single signature misses, without emitting duplicates or
    false positives."""
    import numpy as np

    rng = np.random.default_rng(5)
    n, dim = 400, 16
    m = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    thr = 0.5  # moderate similarity: single-band recall is poor here

    mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
    sims = mn @ mn.T
    iu = np.triu_indices(n, 1)
    sel = sims[iu] >= thr
    truth = {(int(a), int(b)) for a, b in zip(iu[0][sel], iu[1][sel])}
    assert len(truth) >= 10

    one = similarity.cosine_near_pairs(emb, threshold=thr, dim=dim,
                                       n_planes=4, n_bands=1).collect()
    many_rows = similarity.cosine_near_pairs(emb, threshold=thr, dim=dim,
                                             n_planes=4, n_bands=16).collect()
    many = {(r["id_a"], r["id_b"]) for r in many_rows}
    # no cross-band duplicates, no false positives, recall amplified
    assert len(many_rows) == len(many)
    assert many.issubset(truth)
    assert len(many) > len({(r["id_a"], r["id_b"]) for r in one})
    assert len(many) >= 0.8 * len(truth)


def test_exact_cosine_pairs_kernel_matches_join_form(spark):
    """r16: exact_cosine_pairs' Arrow-kernel path (strict per-dim
    left-fold accumulation, round/threshold JVM-side) must be
    bit-identical to the relational theta-join fallback — forced via
    max_broadcast_rows=0 — including every rounded double and the
    threshold boundary behavior."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim = 150, 8
    m = rng.normal(size=(n, dim))
    # plant exact near-dup structure so the threshold has real work
    for i in range(0, n, 5):
        m[i + 1] = m[i] + rng.normal(scale=0.05, size=dim)
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>")

    kernel = [tuple(r) for r in
              similarity.exact_cosine_pairs(emb, threshold=0.6)
              .orderBy("id_a", "id_b").collect()]
    join = [tuple(r) for r in
            similarity.exact_cosine_pairs(emb, threshold=0.6,
                                          max_broadcast_rows=0)
            .orderBy("id_a", "id_b").collect()]
    assert kernel == join
    assert len(kernel) >= n // 5  # the planted pairs are present


def test_connected_components_synthetic(spark):
    """Large-star/small-star (r11) finds transitive clusters: a 4-chain
    (whose endpoints never share an LSH bucket) collapses to one
    component."""
    from snowflake_emulator_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        ["id_a", "id_b"],
    )
    cached_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    got = {(r["node"], r["comp"])
           for r in dedup.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (20, 20), (21, 20)}
    # all INTERMEDIATE caches released (long-lived-server hygiene);
    # the single new surviving entry is the returned frame's own
    # localCheckpoint, freed by the ContextCleaner when callers drop it
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= cached_before + 1


def test_chunk_documents_windows(spark):
    from snowflake_emulator_spark.operators import chunking

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only three tokens"), (3, "")],
        ["doc_id", "text"],
    )
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_toks"], r["chunk_text"])
           for r in chunking.chunk_documents(df, chunk_tokens=4, stride=3).collect()}
    # doc 1: 10 tokens, starts 0,3,6,9 -> window sizes 4,4,4,1
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)][1].startswith("t3")  # 1-token overlap (4-3)
    assert got[(1, 3)] == (1, "t9")
    # doc 2: single window, not padded
    assert got[(2, 0)] == (3, "only three tokens")
    # empty text emits ZERO chunks (r4 fix: the phantom 1-token empty
    # chunk poisoned token accounting downstream)
    assert not any(doc == 3 for doc, _ in got)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_tokens=0)


def test_pii_redact_and_counts(spark):
    from snowflake_emulator_spark.operators import textstats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("mail a.b@x.io or https://x.io/p?q=1 call 555-123-4567 done",)], ["t"])
    row = df.select(
        textstats.pii_redact(F.col("t")).alias("clean"),
        *[c.alias(k) for k, c in textstats.pii_counts(F.col("t")).items()],
    ).collect()[0]
    assert row["clean"] == "mail [EMAIL] or [URL] call [PHONE] done"
    assert (row["email"], row["url"], row["phone"]) == (1, 1, 1)


def test_ngram_jaccard_hot_shingle_cap(spark):
    """max_shingle_df: candidates come from rare shingles only, but
    scores stay EXACT (hot shingles still count in the intersection) —
    results equal the uncapped run whenever pairs share any rare
    shingle."""
    # every doc shares the ubiquitous prefix; near-dup pairs also share
    # distinctive tails
    docs = [
        (1, "common prefix shared by all docs alpha beta gamma delta"),
        (2, "common prefix shared by all docs alpha beta gamma DELTA"),
        (3, "common prefix shared by all docs wholly different ending"),
        (4, "common prefix shared by all docs another unrelated tail x"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uncapped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                dedup.ngram_jaccard_pairs(df, shingle=5, threshold=0.6).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              dedup.ngram_jaccard_pairs(df, shingle=5, threshold=0.6,
                                        max_shingle_df=3).collect()}
    assert (1, 2) in uncapped and uncapped == capped


def test_incremental_dedup_tiers(spark):
    """Exact duplicates of corpus docs land in the exact tier; modified
    near-copies in the near tier; novel docs in neither."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely different corpus content about spark and parquet files")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and again"),  # exact
         (101, "the quick brown fox jumps over the lazy dog again and AGAIN!"),  # near (norm-equal -> exact)
         (102, "the quick brown fox jumps over the lazy cat again and again"),  # near
         (103, "entirely novel text with no overlap whatsoever to anything here")],
        ["doc_id", "text"])
    out = {r["doc_id"]: (r["exact_dup"], r["near_dup"])
           for r in dedup.incremental_dedup(new, corpus, num_perm=16, bands=8,
                                            threshold=0.4).collect()}
    assert out[100] == (True, False)
    assert out[101] == (True, False)  # normalization strips punctuation/case
    assert out[102] == (False, True)
    assert out[103] == (False, False)


def test_bigram_logprob_orders_gibberish_last(spark):
    """Docs made of corpus-typical bigrams score higher than gibberish
    under the corpus-trained bigram LM."""
    rows = [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(8)]
    rows.append((100, "zx qv jk wq xx zq kj vv zz qq"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = {r["doc_id"]: r["avg_logp"]
              for r in textstats.bigram_logprob_scores(df).collect()}
    assert scores[100] < scores[0]


def test_centroid_distances_flags_outlier(spark):
    """A vector opposite its cluster scores far below cluster members."""
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, [v + 0.01 * i for v in base], 0) for i in range(5)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0], 0))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["vec_id"]: r["cos_centroid"]
           for r in similarity.centroid_distances(df).collect()}
    assert out[99] < 0 < min(out[i] for i in range(5))


def test_max_token_run_gaps_islands(spark):
    """Runs of consecutive equal tokens measured exactly."""
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "x y x y x y"), (3, "z")],
        ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_tokens"], r["max_run"])
           for r in textstats.max_token_run_lengths(df).collect()}
    assert out == {1: (6, 3), 2: (6, 1), 3: (1, 1)}


def test_kmeans_separates_obvious_clusters(spark):
    """Two well-separated blobs end in different clusters with fixed
    seeding (first k ids as centroids)."""
    rows = [(i, [10.0 + 0.1 * i, 0.0]) for i in range(3)]          # blob A
    rows += [(10 + i, [-10.0 - 0.1 * i, 0.0]) for i in range(3)]   # blob B
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.kmeans_fixed_rounds(df, k=2, rounds=2).collect()
    sizes = sorted(r["n_vecs"] for r in out)
    assert sizes == [3, 3]
    assert all(r["mean_dist"] < 1.0 for r in out)


def test_match_recognize_funnel_semantics(spark):
    """V C+ P row-pattern matching: non-overlapping matches, measures
    from the matched slice, mutual-exclusion violation raises."""
    from snowflake_emulator_spark.operators.match_recognize import match_recognize

    rows = [(1, 1, "view"), (1, 2, "click"), (1, 3, "click"), (1, 4, "purchase"),
            (1, 5, "view"), (1, 6, "purchase"),
            (2, 1, "view"), (2, 2, "click"), (2, 3, "purchase"),
            (2, 4, "view"), (2, 5, "click"), (2, 6, "purchase"),
            (3, 1, "click")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    define = {"V": "event_type = 'view'", "C": "event_type = 'click'",
              "P": "event_type = 'purchase'"}
    out = sorted(tuple(r) for r in match_recognize(
        df, "user_id", ["ts"], define, "V C+ P", measure_cols=["ts"]).collect())
    # (user, match_no, n_rows, ts_first, ts_last)
    assert out == [(1, 1, 4, 1, 4), (2, 1, 3, 1, 3), (2, 2, 3, 4, 6)]
    # r10: overlapping symbol predicates work (pattern position decides —
    # B matches EVERY row here, the bitmask matcher resolves A-then-B)
    over = {"A": "event_type = 'view'", "B": "ts < 100"}
    out2 = sorted(tuple(r) for r in match_recognize(
        df, "user_id", ["ts"], over, "A B", measure_cols=["ts"]).collect())
    assert out2 == [(1, 1, 2, 1, 2), (1, 2, 2, 5, 6),
                    (2, 1, 2, 1, 2), (2, 2, 2, 4, 5)]
    # r10: AFTER MATCH SKIP TO NEXT ROW yields overlapping matches
    allb = {"B": "ts < 100"}
    out3 = sorted(tuple(r) for r in match_recognize(
        df, "user_id", ["ts"], allb, "B B", measure_cols=["ts"],
        after_match="next_row").collect())
    assert [t[:2] for t in out3 if t[0] == 3] == []  # 1-row group: no pair
    assert [t for t in out3 if t[0] == 1] == [
        (1, 1, 2, 1, 2), (1, 2, 2, 2, 3), (1, 3, 2, 3, 4),
        (1, 4, 2, 4, 5), (1, 5, 2, 5, 6)]


def test_match_recognize_alias_collision(spark):
    """A symbol alias that equals another symbol's assigned alphabet
    letter must not be rewritten twice: define order {X, A} maps
    X->'A', A->'B'; pattern 'X A' must compile to 'AB' (X-row then
    A-row), not 'BB'. Single-pass alternation regression test."""
    from snowflake_emulator_spark.operators.match_recognize import match_recognize

    rows = [(1, 1, "x"), (1, 2, "a"),     # X then A -> one match
            (2, 1, "a"), (2, 2, "a")]     # A A -> no match under 'X A'
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    define = {"X": "event_type = 'x'", "A": "event_type = 'a'"}
    out = sorted(tuple(r) for r in match_recognize(
        df, "user_id", ["ts"], define, "X A", measure_cols=["ts"]).collect())
    assert out == [(1, 1, 2, 1, 2)]


def test_dsir_weights_favor_target_domain(spark):
    """Docs written in the target domain's bigram distribution score
    higher than off-domain docs."""
    rows = [(i, "the model trains on tokens and weights and layers", "src0")
            for i in range(6)]
    rows += [(100 + i, "zq zq xv xv jj kk qq ww pp", "src9") for i in range(3)]
    rows.append((200, "the model trains on tokens", "src9"))  # target-like text, other source
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["doc_id"]: r["dsir_weight"]
           for r in textstats.dsir_importance_weights(df, "source = 'src0'").collect()}
    assert out[200] > out[100]           # target-like beats gibberish
    assert out[0] > out[100]             # in-domain beats off-domain


def test_coverage_sample_properties(emb):
    """Coverage sampling keeps <= k prototypes per bucket, every kept
    vector exists in the corpus, ranks are 1..k by descending
    prototypicality, and the selection is deterministic across runs."""
    out = similarity.coverage_sample(emb, k=2, n_centroids=4)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for b, rs in by_bucket.items():
        assert 1 <= len(rs) <= 2
        rs = sorted(rs, key=lambda x: x["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        protos = [r["proto"] for r in rs]
        assert protos == sorted(protos, reverse=True)
        assert all(r["vec_id"] in all_ids for r in rs)
    again = similarity.coverage_sample(emb, k=2, n_centroids=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_curriculum_interleave_proportional_prefixes(docs):
    """Stride scheduling: at every prefix of the curriculum a weight-3
    source has seen ~3x the docs of a weight-1 source (within one
    stride), and the order is deterministic across runs."""
    from snowflake_emulator_spark.operators.mixture import curriculum_interleave

    out = curriculum_interleave(
        docs, {"src0": 3.0}, default_weight=1.0).orderBy("global_pos")
    rows = out.collect()
    assert [r["global_pos"] for r in rows] == list(range(1, len(rows) + 1))
    # prefix proportionality: after any virtual time t, src0 has
    # emitted floor(3t) docs vs floor(t) for each weight-1 source
    seen = {}
    for r in rows[: len(rows) // 2]:
        seen[r["source"]] = seen.get(r["source"], 0) + 1
        others = [v for k, v in seen.items() if k != "src0"]
        if others and "src0" in seen:
            assert seen["src0"] >= max(others)  # heavier source never behind
    again = curriculum_interleave(
        docs, {"src0": 3.0}, default_weight=1.0).orderBy("global_pos").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_semantic_decontaminate_flags_planted_leak(spark, emb):
    """A corpus vector identical to a benchmark vector must be flagged
    with max_sim 1.0; benchmark rows themselves never appear."""
    bench_row = emb.filter(F.col("vec_id") == 0).collect()[0]
    leaked = spark.createDataFrame(
        [(9999, bench_row["embedding"])], emb.select("vec_id", "embedding").schema)
    corpus = emb.select("vec_id", "embedding").union(leaked)
    out = similarity.semantic_decontaminate(
        corpus, F.col("vec_id") < 3, threshold=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert 9999 in rows and rows[9999]["max_sim"] == 1.0
    assert all(v >= 3 for v in rows)  # benchmark side excluded


def test_substring_dedup_spans(spark):
    """r11: exact-substring dedup (Lee et al.) — duplicated >=gram-char
    spans are found via hashed anchors, merged by gaps-and-islands, and
    spliced out; unique docs pass through untouched."""
    shared = "0123456789" * 3  # 30 chars duplicated across docs 1 and 2
    d1 = "AAAA" + shared + "BBBB"
    d2 = "CCCCCC" + shared + "DD"
    d3 = "completely unique text with no repeats at all!"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup(df, gram=20).collect()}
    # every 20-gram inside `shared` occurs in both docs -> one merged
    # span covering exactly the 30 shared chars in each
    assert got[1]["n_spans"] == 1 and got[1]["n_removed"] == 30
    assert got[1]["cleaned"] == "AAAA" + "BBBB"
    assert got[2]["n_spans"] == 1 and got[2]["n_removed"] == 30
    assert got[2]["cleaned"] == "CCCCCC" + "DD"
    assert got[3]["n_spans"] == 0 and got[3]["cleaned"] == d3
    # doc shorter than the gram emits no anchors and passes through
    short = spark.createDataFrame([(9, "tiny")], ["doc_id", "text"])
    r = dedup.substring_dedup(short, gram=20).collect()[0]
    assert r["n_spans"] == 0 and r["cleaned"] == "tiny"


def test_substring_dedup_within_doc_and_multi_span(spark):
    # within-doc repetition: the same 25-char run appears twice in ONE
    # doc -> both occurrences are duplicated anchors
    run = "abcdefghijklmnopqrstuvwxy"  # 25 chars
    d1 = run + "-MIDDLE-" + run
    df = spark.createDataFrame([(1, d1)], ["doc_id", "text"])
    r = dedup.substring_dedup(df, gram=25).collect()[0]
    assert r["n_spans"] == 2 and r["n_removed"] == 50
    assert r["cleaned"] == "-MIDDLE-"
    # fully-duplicated docs clean to the empty string
    df2 = spark.createDataFrame(
        [(1, "Z" * 40), (2, "Z" * 40)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup(df2, gram=30).collect()}
    assert got[1]["cleaned"] == "" and got[2]["cleaned"] == ""
    assert got[1]["n_removed"] == 40


def test_pq_topk_recall_and_shape(emb):
    """r11: product-quantization ANN — top-k by ADC code distance must
    recall a reasonable fraction of the exact cosine top-k (seeded
    codebooks, no training — the floor for recall), and the scoring
    join must be broadcast (codes-only corpus scan, no nested loop over
    raw vectors)."""
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1, 2], k=10)
    approx = similarity.pq_topk(emb, [0, 1, 2], k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"PQ recall too low even for seed codebooks: {recall}"
    # determinism: same inputs -> identical ranked lists
    r1 = [tuple(r) for r in similarity.pq_topk(emb, [0], k=5).collect()]
    r2 = [tuple(r) for r in similarity.pq_topk(emb, [0], k=5).collect()]
    assert sorted(r1) == sorted(r2)
    plan = similarity.pq_topk(emb, [0], k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_topk_recall_and_shape(emb):
    """r11: IVF-PQ — coarse bucket pruning + residual PQ codes must
    still recall a fraction of the exact top-k, and the scoring path
    must stay equi-joins over codes (no nested loop over raw vectors)."""
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1, 2], k=10)
    approx = similarity.ivfpq_topk(emb, [0, 1, 2], k=10,
                                   n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # UNTRAINED seed codebooks are the recall FLOOR by design (the
    # hash gate checks the encode/ADC arithmetic; production Lloyd-
    # trains codebooks). Measured on this fixture: pq ~0.3, ivf-pq
    # ~0.1 (residual quantization error compounds the coarse split).
    assert recall >= 0.05, f"IVF-PQ recall below floor: {recall}"
    plan = similarity.ivfpq_topk(emb, [0], k=5, n_centroids=8, nprobe=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ivfpq_refine_exact_rerank(emb):
    """r16 (VERDICT item 3): the refine stage re-scores the ADC top
    k*refine with EXACT squared L2. With every bucket probed and a
    shortlist wide enough to hold all candidates, the refined output
    must equal the exact L2 top-k — ADC's only remaining job is
    candidate selection, which a full shortlist makes lossless."""
    n = emb.count()
    out = similarity.ivfpq_topk(emb, [0, 1], k=5, n_centroids=4,
                                nprobe=4, m=32, ksub=128,
                                train_rounds=1, refine=(n // 5) + 1)
    rows = out.collect()
    assert out.columns == ["query_id", "neighbor_id", "rank", "exact_d2"]
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1], k=5)
    # unit-norm-free check: exact L2 rank == this fixture's cosine rank
    # only if vectors share norms, so recompute L2 directly instead
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def d2(a, b):
        return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))

    for q in (0, 1):
        got = [(r["neighbor_id"], r["exact_d2"]) for r in rows
               if r["query_id"] == q]
        want = sorted(((round(d2(vecs[q], v), 6), i)
                       for i, v in vecs.items() if i != q))[:5]
        assert [g[0] for g in got] == [w[1] for w in want]
        for (nid, gd2), (wd2, _) in zip(got, want):
            assert gd2 == pytest.approx(wd2, abs=1e-6)
    # recall with the production-shaped shortlist beats ADC-only
    a_ref = {(r["query_id"], r["neighbor_id"])
             for r in similarity.ivfpq_topk(
                 emb, [0, 1, 2], k=10, n_centroids=4, nprobe=2, m=32,
                 ksub=128, train_rounds=1, refine=4).collect()}
    a_adc = {(r["query_id"], r["neighbor_id"])
             for r in similarity.ivfpq_topk(
                 emb, [0, 1, 2], k=10, n_centroids=4, nprobe=2, m=32,
                 ksub=128, train_rounds=1).collect()}
    e = {(r["query_id"], r["neighbor_id"])
         for r in similarity.cosine_topk_bruteforce(
             emb, [0, 1, 2], k=10).collect()}
    assert len(e & a_ref) >= len(e & a_adc)


def test_pq_trained_recall_gate(emb):
    """r13 (VERDICT r11/r12 item 1): Lloyd-TRAINED PQ codebooks must
    clear the quality gate — recall >= 0.7 vs exact cosine top-10 at
    the fixture scale (measured 0.83; the untrained seed floor is
    ~0.3). Training is 3 fixed relational rounds with rounded centroid
    means, so the result — and therefore this gate — is deterministic."""
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1, 2], k=10)
    approx = similarity.pq_topk(emb, [0, 1, 2], k=10,
                                m=32, ksub=128, train_rounds=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"trained PQ recall below gate: {recall}"
    # plan contract unchanged by training: codes-only scan, no BNLJ
    plan = similarity.pq_topk(emb, [0], k=5, m=32, ksub=128,
                              train_rounds=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_trained_recall_gate(emb):
    """r13: Lloyd-trained residual codebooks must lift IVF-PQ past the
    0.5 recall gate (measured 0.73 at the fixture scale; the seed floor
    is ~0.1). nc=4/nprobe=3 is the fixture-scale coarse config — at
    real corpus scale nc grows ~sqrt(n) and nprobe/nc shrinks."""
    exact = similarity.cosine_topk_bruteforce(emb, [0, 1, 2], k=10)
    approx = similarity.ivfpq_topk(emb, [0, 1, 2], k=10, n_centroids=4,
                                   nprobe=3, m=32, ksub=128,
                                   train_rounds=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"trained IVF-PQ recall below gate: {recall}"


def test_lloyd_training_determinism_and_empty_codes(spark):
    """r13: the trained codebook is a pure function of the input —
    two trainings yield identical ranked output — and codes that
    attract no members keep their seed centroid (ksub > n rows forces
    empty codes; the operator must not drop or NaN them)."""
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(8)])
            for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # ksub=4 < 6 rows, m=2, dim=8: train 2 rounds twice -> identical
    r1 = [tuple(r) for r in similarity.pq_topk(
        df, [0], k=3, m=2, ksub=4, dim=8, train_rounds=2).collect()]
    r2 = [tuple(r) for r in similarity.pq_topk(
        df, [0], k=3, m=2, ksub=4, dim=8, train_rounds=2).collect()]
    assert r1 == r2 and len(r1) == 3
    # ksub == n rows: every code seeds from one vector; with 6 distinct
    # vectors some codes may end empty after reassignment — output must
    # still rank all 5 non-query neighbors without nulls
    out = similarity.pq_topk(df, [0], k=5, m=2, ksub=6, dim=8,
                             train_rounds=2).collect()
    assert len(out) == 5
    assert all(r["approx_d2"] is not None for r in out)


def test_connected_components_nonconvergence_safety_net(spark):
    """r12 (ADVICE): when max_iterations exhausts before the star-round
    fixpoint, the final mapping must still emit EXACTLY one row per node
    (min-aggregate safety net), never silent conflicting duplicates."""
    from snowflake_emulator_spark.operators import dedup

    # a 12-node chain: one star round cannot root it
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"])
    # r16 (VERDICT item 5): strict by default — exhaustion raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="max_iterations exhausted"):
        dedup.connected_components(pairs, max_iterations=1).collect()
    rows = dedup.connected_components(
        pairs, max_iterations=1, allow_partial=True).collect()
    assert len(rows) == 12
    assert len({r["node"] for r in rows}) == 12  # one row per node
    # converged run still gives the exact minimum labels
    rows2 = dedup.connected_components(pairs).collect()
    assert {(r["node"], r["comp"]) for r in rows2} == {
        (i, 1) for i in range(1, 13)}


def test_bpe_train_merges_greedy_semantics(spark):
    """r13: relational BPE trainer — greedy LEFT-TO-RIGHT
    non-overlapping merging (run-parity trick), lexicographic
    tie-break, cross-round token composition, word-boundary isolation,
    early stop when no pairs remain."""
    from snowflake_emulator_spark.operators import textstats

    # "aaaa" has three overlapping 'aa' starts; greedy merges exactly
    # two: [aa][aa]. 'aa' count is 3 (overlapping counting), beating
    # 'ab' (2). Word boundary: 'a b' contributes no cross-word pair.
    df = spark.createDataFrame(
        [(1, "aaaa ab ab"), (2, "a b")], ["doc_id", "text"])
    got = [tuple(r) for r in
           textstats.bpe_train_merges(df, rounds=2).collect()]
    assert got[0] == (1, "a", "a", 3)
    # round 2: tokens are now [aa, aa] [a, b] [a, b] [a] [b] ->
    # pairs: (aa,aa)=1, (a,b)=2 -> 'ab' wins
    assert got[1] == (2, "a", "b", 2)
    # cross-round composition: after merging 'ab', a third round on
    # "ababab" composes (ab, ab)
    df2 = spark.createDataFrame([(1, "ababab xy")], ["doc_id", "text"])
    got2 = [tuple(r) for r in
            textstats.bpe_train_merges(df2, rounds=2).collect()]
    assert got2[0] == (1, "a", "b", 3)
    # [ab][ab][ab] -> two overlapping (ab,ab) pair starts
    assert got2[1] == (2, "ab", "ab", 2)
    # early stop: single-char words have no pairs at all
    df3 = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert textstats.bpe_train_merges(df3, rounds=3).count() == 0


def test_bpe_encode_token_counts(spark):
    """r13: return_tokens=True exposes the post-merge token relation —
    token counts shrink by exactly the number of applied merges."""
    from snowflake_emulator_spark.operators import textstats

    df = spark.createDataFrame([(1, "aaaa ab ab")], ["doc_id", "text"])
    # before any merge: 4 + 2 + 2 = 8 char tokens
    _m0, t0 = textstats.bpe_train_merges(df, rounds=0, return_tokens=True)
    assert t0.count() == 8
    # round 1 merges 'aa' twice (greedy on "aaaa"): 8 - 2 = 6
    _m1, t1 = textstats.bpe_train_merges(df, rounds=1, return_tokens=True)
    assert t1.count() == 6
    # round 2 merges 'ab' twice more: 6 - 2 = 4
    _m2, t2 = textstats.bpe_train_merges(df, rounds=2, return_tokens=True)
    assert t2.count() == 4
    toks = sorted(r["tok"] for r in t2.collect())
    assert toks == ["aa", "aa", "ab", "ab"]


def test_weighted_sample_k_es_properties(spark):
    """r13: Efraimidis-Spirakis sampling — key monotone in weight for a
    fixed id (raising a doc's weight never worsens its rank),
    deterministic across runs, w<=0 rows excluded, distributed top-k
    plan (TakeOrderedAndProject, no global-window shuffle of the
    corpus)."""
    from snowflake_emulator_spark.operators import mixture

    rows = [(i, "s", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    got1 = [(r["rank"], r["doc_id"]) for r in
            mixture.weighted_sample_k(df, 20, "w").collect()]
    got2 = [(r["rank"], r["doc_id"]) for r in
            mixture.weighted_sample_k(df, 20, "w").collect()]
    assert got1 == got2 and len(got1) == 20
    # monotone in weight: multiply doc 0's weight by 100 -> its rank
    # can only improve (u is fixed by the id, key = u^(1/w) grows in w)
    base_rank = {d: rk for rk, d in got1}
    boosted = spark.createDataFrame(
        [(i, "s", (100.0 if i == 0 else 1.0) * (1 + i % 7))
         for i in range(200)], ["doc_id", "source", "w"])
    brank = {r["doc_id"]: r["rank"] for r in
             mixture.weighted_sample_k(boosted, 200, "w").collect()}
    full = {r["doc_id"]: r["rank"] for r in
            mixture.weighted_sample_k(df, 200, "w").collect()}
    assert brank[0] <= full[0]
    # zero/negative weights excluded
    dfz = spark.createDataFrame(
        [(1, "s", 0.0), (2, "s", -1.0), (3, "s", 2.0)],
        ["doc_id", "source", "w"])
    out = mixture.weighted_sample_k(dfz, 10, "w").collect()
    assert [r["doc_id"] for r in out] == [3]
    # plan: distributed top-k, not a global window over the corpus
    plan = mixture.weighted_sample_k(df, 5, "w") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_temperature_weights_properties(spark):
    """r13: p_i ~ n_i^alpha — alpha=1 reproduces natural proportions
    (upsample 1.0), alpha=0 is uniform, alpha in (0,1) upweights small
    sources and downweights large ones; probabilities sum to 1."""
    from snowflake_emulator_spark.operators import mixture

    rows = [(i, "big") for i in range(90)] + \
           [(90 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in
           mixture.temperature_weights(df, alpha=0.7).collect()}
    assert abs(out["big"]["p_temp"] + out["small"]["p_temp"] - 1.0) < 1e-6
    assert out["small"]["upsample_factor"] > 1.0 > out["big"]["upsample_factor"]
    nat = {r["source"]: r for r in
           mixture.temperature_weights(df, alpha=1.0).collect()}
    assert abs(nat["big"]["upsample_factor"] - 1.0) < 1e-6
    uni = {r["source"]: r for r in
           mixture.temperature_weights(df, alpha=0.0).collect()}
    assert abs(uni["big"]["p_temp"] - 0.5) < 1e-6
    with pytest.raises(ValueError):
        mixture.temperature_weights(df, alpha=-1.0)


def test_top_quantile_per_group(spark):
    """r13: per-group relative filtering — keep ceil(frac*n) rows per
    group by (score desc, id); deterministic on ties; frac=1 keeps
    everything; invalid frac rejected."""
    from snowflake_emulator_spark.operators import corpus

    rows = [(i, "a", float(i)) for i in range(10)] + \
           [(100 + i, "b", 5.0) for i in range(4)]  # all-tied group
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    kept = corpus.top_quantile_per_group(df, 0.3, "score").collect()
    by = {}
    for r in kept:
        by.setdefault(r["source"], []).append(r["doc_id"])
    # group a: ceil(0.3*10)=3 -> top scores 9,8,7
    assert sorted(by["a"]) == [7, 8, 9]
    # group b: ceil(0.3*4)=2 -> tie broken by id asc
    assert sorted(by["b"]) == [100, 101]
    assert corpus.top_quantile_per_group(df, 1.0, "score").count() == 14
    import pytest as _pt
    with _pt.raises(ValueError):
        corpus.top_quantile_per_group(df, 0.0, "score")


def test_top_quantile_rank_offsets_match_window(spark):
    """r14 (VERDICT item 1): the range-partition + prefix-offset rank
    must equal the window-rank reference exactly — including q_rank and
    group_n values — on a frame with skewed group sizes, score ties,
    and rows spread across many input partitions; the produced plan
    must contain NO per-group window sort."""
    from pyspark.sql import Window

    from snowflake_emulator_spark.operators import corpus

    rows = []
    for i in range(600):
        src = "big" if i % 3 else ("mid" if i % 7 else "tiny")
        rows.append((i, src, float((i * 37) % 50)))  # heavy tie mass
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"]) \
        .repartition(16)
    got = corpus.top_quantile_per_group(df, 0.4, "score")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "per-group window sort resurfaced"
    w = Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    wn = Window.partitionBy("source")
    ref = (df.withColumn("q_rank", F.row_number().over(w).cast("bigint"))
           .withColumn("group_n", F.count("*").over(wn).cast("bigint"))
           .filter(F.col("q_rank") <= F.ceil(0.4 * F.col("group_n"))))
    key = lambda r: (r["source"], r["q_rank"])  # noqa: E731
    got_rows = sorted((tuple(r) for r in got.collect()), key=lambda t: t[:2])
    ref_rows = sorted((tuple(r) for r in ref.collect()), key=lambda t: t[:2])
    assert got.columns == ref.columns
    assert got_rows == ref_rows and len(got_rows) > 0


def test_top_quantile_empty_and_fallback(spark, monkeypatch):
    """r14: empty input returns an empty frame with the q_rank/group_n
    columns; above _MAX_LOOKUP_GROUPS distinct groups the function
    falls back to the hash-window plan (the correct shape for many
    small groups) with identical semantics."""
    from snowflake_emulator_spark.operators import corpus

    empty = spark.createDataFrame([], "doc_id INT, source STRING, score DOUBLE")
    out = corpus.top_quantile_per_group(empty, 0.5, "score")
    assert out.columns == ["doc_id", "source", "score", "q_rank", "group_n"]
    assert out.count() == 0

    monkeypatch.setattr(corpus, "_max_lookup_groups", lambda n_parts: 3)
    rows = [(i, f"s{i % 5}", float(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    kept = corpus.top_quantile_per_group(df, 0.25, "score")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # fallback path chosen
    per = {}
    for r in kept.collect():
        per.setdefault(r["source"], []).append(r["q_rank"])
    assert all(sorted(v) == list(range(1, 3)) for v in per.values())  # ceil(.25*8)=2


def test_lookup_groups_threshold_is_width_aware(spark):
    """r15 (VERDICT order #4): the broadcast rank-offset lookup ships
    numPartitions x ngroups rows through the driver, so the group
    threshold scales INVERSELY with shuffle width (cap the product at
    ~1M rows, floor 1024) — and the hash-window fallback must trigger
    at the SCALED threshold, not a fixed 4096."""
    from snowflake_emulator_spark.operators import corpus

    assert corpus._max_lookup_groups(32) == 31250
    assert corpus._max_lookup_groups(1) == 1_000_000
    assert corpus._max_lookup_groups(500) == 2000
    assert corpus._max_lookup_groups(10_000) == 1024      # floor binds
    assert corpus._max_lookup_groups(1_000_000) == 1024
    # product stays bounded at every width
    for w in (1, 32, 977, 10_000, 250_000):
        assert w * corpus._max_lookup_groups(w) <= max(1_000_000, 1024 * w)

    rows = [(i, f"s{i % 1100}", float(i)) for i in range(2200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # at a simulated 500k-partition cluster width the threshold
        # floors at 1024 < 1100 groups -> hash-window fallback
        spark.conf.set("spark.sql.shuffle.partitions", "500000")
        wide = corpus.rank_within_group(df, "score")
        assert "Window" in wide._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # at the session's real width (32 -> threshold 31250) the same 1100
    # groups take the broadcast prefix-offset path: no Window
    narrow = corpus.rank_within_group(df, "score")
    assert "Window" not in narrow._jdf.queryExecution().executedPlan().toString()
    # identical semantics on both paths
    a = sorted((r.doc_id, r.q_rank, r.group_n) for r in wide.collect())
    b = sorted((r.doc_id, r.q_rank, r.group_n) for r in narrow.collect())
    assert a == b


def test_scale_aware_nc_nprobe_rules():
    """r14 (VERDICT item 3): the deterministic coarse-quantizer rules —
    nc = min(1024, max(4, floor(sqrt(n/25)))) and
    nprobe = max(3, ceil(nc/4)) — at the boundaries the SQL replay
    must also hit (for integer n, floor(sqrt(n/25)) == isqrt(n//25))."""
    assert similarity.scale_aware_nc(0) == 4
    assert similarity.scale_aware_nc(500) == 4       # sf0.01 fixture
    assert similarity.scale_aware_nc(399) == 4
    assert similarity.scale_aware_nc(400) == 4
    assert similarity.scale_aware_nc(625) == 5       # 25*5^2 boundary
    assert similarity.scale_aware_nc(624) == 4
    assert similarity.scale_aware_nc(2000) == 8      # sf0.1 fixture
    assert similarity.scale_aware_nc(20000) == 28    # 10x stress build
    assert similarity.scale_aware_nc(204800) == 90   # r15: past old 64 cap
    assert similarity.scale_aware_nc(10**9) == 1024  # r15 lifted cap
    assert similarity.scale_aware_nprobe(4) == 3
    assert similarity.scale_aware_nprobe(8) == 3
    assert similarity.scale_aware_nprobe(28) == 7
    assert similarity.scale_aware_nprobe(64) == 16


def test_ivfpq_scale_aware_recall_gate_sf01(spark):
    """r14 (VERDICT item 3 'done' clause): at sf0.1 (2000 vectors) the
    scale-aware rules pick nc=8/nprobe=3 and the Lloyd-TRAINED coarse
    quantizer must clear recall >= 0.6 vs exact cosine top-10
    (measured 0.76-0.80; the r13 random-hyperplane coarse measured
    0.56 — residuals against genuine cluster means are what make ADC
    accurate). Deterministic: fixed rounds, rounded centroid means."""
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = e.count()
    assert similarity.scale_aware_nc(n) == 8
    qs = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk_bruteforce(e, qs, k=10)
    approx = similarity.ivfpq_topk(
        e, qs, k=10, n_centroids=None, nprobe=None,
        m=32, ksub=128, train_rounds=3, coarse_train_rounds=2)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"scale-aware trained IVF-PQ recall: {recall}"


def test_lloyd_cross_engine_bit_identity_adversarial_scales(spark):
    """r14 (VERDICT item 6): property test — Spark's trainer and the
    DuckDB replay (same CTE chain the oracles embed) produce
    BIT-IDENTICAL codebooks across adversarial value scales (x1, x1e3,
    x1e5 of a non-terminating-fraction base), and the trainer REFUSES
    scales past the documented 1e6 grain bound instead of risking a
    rounding-boundary flip."""
    import duckdb

    from snowflake_emulator_spark.inventory import _pq_training_ctes

    dim, m, ksub, rounds = 8, 2, 4, 2
    sub_d = dim // m
    base = [(i, [((i * 37 + j * 11) % 23 + 1) / 7.0 for j in range(dim)])
            for i in range(12)]
    for scale in (1.0, 1e3, 1e5):
        rows = [(i, [x * scale for x in v]) for i, v in base]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        subs = df.select(
            "vec_id",
            F.posexplode(F.array(*[
                F.slice(F.col("embedding").cast("array<double>"),
                        s * sub_d + 1, sub_d)
                for s in range(m)])).alias("sub", "sv"))
        from pyspark.sql import Window as W
        cw = W.partitionBy("sub").orderBy("vec_id")
        seed = (subs.orderBy("vec_id").limit(ksub * m)
                .filter(F.col("vec_id") < ksub)
                .select("sub", (F.row_number().over(cw) - 1).alias("code"),
                        F.col("sv").alias("c")))
        trained = similarity._lloyd_train_codebook(subs, seed, rounds)
        got = {(r["sub"], r["code"]): [float(x) for x in r["c"]]
               for r in trained.collect()}

        con = duckdb.connect()
        vals = ",".join(
            f"({i}, {v!r}::DOUBLE[])" for i, v in
            [(i, [x * scale for x in vv]) for i, vv in base])
        ctes, cb = _pq_training_ctes("cb0", "allsubs", rounds, sub_d)
        sql = f"""
WITH v(vec_id, v) AS (VALUES {vals}),
allsubs AS MATERIALIZED (
  SELECT vec_id, CAST(s.range AS INTEGER) AS sub,
         v[CAST(s.range * {sub_d} + 1 AS INTEGER):CAST(s.range * {sub_d} + {sub_d} AS INTEGER)] AS sv
  FROM v, range({m}) s),
cb0 AS (
  SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS c
  FROM allsubs WHERE vec_id < {ksub}),
{",".join(ctes)}
SELECT sub, code, c FROM {cb} ORDER BY sub, code"""
        exp = {(r[0], r[1]): [float(x) for x in r[2]]
               for r in con.execute(sql).fetchall()}
        assert got == exp, f"codebooks diverge at scale {scale}"

    big = [(i, [x * 1e7 for x in v]) for i, v in base]
    dfb = spark.createDataFrame(big, ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="1e6 bound|grain"):
        similarity.pq_topk(dfb, [0], k=3, m=m, ksub=ksub, dim=dim,
                           train_rounds=1)


def test_temperature_resample_counts_and_composition(spark):
    """r14 (VERDICT item 5): the materialized temperature resampler —
    per-source output counts equal floor(f)*n + floor(frac(f)*n + 0.5)
    exactly; alpha=1 is the identity stream; sample_id is unique and
    feeds curriculum_interleave directly."""
    import math

    from snowflake_emulator_spark.operators import mixture

    rows = [(i, "big" if i % 5 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture.temperature_resample(df, alpha=0.5)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    src_n = {"big": 160, "small": 40}
    N, z = 200, sum(n ** 0.5 for n in src_n.values())
    for s, n in src_n.items():
        f = round((n ** 0.5 / z) / (n / N), 6)
        exp = math.floor(f) * n + math.floor((f - math.floor(f)) * n + 0.5)
        assert got[s] == exp, (s, f, exp, got[s])
    # sample_id unique across copies
    assert out.select("sample_id").distinct().count() == out.count()
    # alpha=1: factors are exactly 1.0 -> identity stream, copy_idx=1
    ident = mixture.temperature_resample(df, alpha=1.0)
    assert ident.count() == 200
    assert ident.agg(F.max("copy_idx")).collect()[0][0] == 1
    # composition: the resampled stream interleaves on sample_id
    ordered = mixture.curriculum_interleave(
        out, weights={"small": 2.0}, source_col="source",
        id_col="sample_id")
    n_out = ordered.count()
    assert n_out == out.count()
    pos = [r["global_pos"] for r in ordered.collect()]
    assert sorted(pos) == list(range(1, n_out + 1))
