"""Extension-operator tests: dedup, similarity, text stats, multimodal,
streaming — verified on the sf0.001 driver fixtures."""

import pytest
from pyspark.sql import functions as F

from snowflake_emulator_spark.operators import dedup, multimodal, similarity, textstats

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


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
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
