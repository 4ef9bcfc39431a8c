"""Corpus-curation operators (operators/corpus.py): paragraph-level
exact dedup, OOV rate, token-budget sampling, source overlap."""

from pyspark.sql import functions as F

from snowflake_emulator_spark.operators import corpus


def test_paragraph_dedup_keeps_first_occurrence(spark):
    """A 4-token segment duplicated across (and within) documents
    survives only at its lowest (doc_id, position); fully-duplicated
    documents disappear."""
    seg_a = "alpha beta gamma delta"
    seg_b = "one two three four"
    rows = [
        (1, f"{seg_a} {seg_b}"),          # both segments first here
        (2, f"{seg_a} unique words here more"),  # seg_a dropped
        (3, seg_b),                        # entirely duplicate -> gone
        (4, f"{seg_b} {seg_b}"),           # internal dup also dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           corpus.paragraph_dedup(df, segment_tokens=4).collect()}
    assert out[1]["clean_text"] == f"{seg_a} {seg_b}"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == "unique words here more"
    assert out[2]["n_kept"] == 1 and out[2]["n_dropped"] == 1
    assert 3 not in out          # all segments were duplicates
    assert 4 not in out
    # order preserved when a middle segment drops
    df2 = spark.createDataFrame(
        [(1, "a b c d w x y z"), (2, "p q r s a b c d e f g h")],
        "doc_id long, text string")
    out2 = {r["doc_id"]: r["clean_text"] for r in
            corpus.paragraph_dedup(df2, segment_tokens=4).collect()}
    assert out2[2] == "p q r s e f g h"


def test_oov_rate_flags_noise(spark):
    """Tokens below the df threshold count as OOV occurrences."""
    rows = [(i, "common words shared everywhere") for i in range(3)]
    rows.append((10, "common words zzqq jjxx"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus.oov_rate(df, min_df=3).collect()}
    assert out[0]["oov_rate"] == 0.0
    # doc 10: 'common','words' in-vocab; 'zzqq','jjxx' df=1 -> 2/4
    assert out[10]["n_toks"] == 4 and out[10]["oov_rate"] == 0.5


def test_token_budget_sample_prefix_and_determinism(spark):
    """Within a source, the md5-ordered prefix fitting the budget is
    kept; unknown sources drop; two runs agree exactly."""
    rows = [(i, "s1", "tok " * 10) for i in range(20)]
    rows += [(100 + i, "s2", "tok " * 10) for i in range(5)]
    rows += [(200 + i, "other", "tok " * 10) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = corpus.token_budget_sample(df, {"s1": 55, "s2": 1000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # each doc is 10 tokens; budget 55 -> exactly 5 docs of s1
    assert len(by_src["s1"]) == 5
    assert max(r["cum_toks"] for r in by_src["s1"]) == 50
    assert len(by_src["s2"]) == 5          # all fit
    assert "other" not in by_src
    again = corpus.token_budget_sample(df, {"s1": 55, "s2": 1000}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_dup_ngram_fraction_semantics(spark):
    """Docs sharing an 8-gram span score it as duplicated in BOTH; a
    doc with all-unique grams scores 0; too-short docs emit (0, 0.0);
    intra-doc repetition alone does not count (df is per-document)."""
    from snowflake_emulator_spark.operators import corpus

    span = "one two three four five six seven eight"   # exactly 8 tokens
    rows = [
        (1, f"{span} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"{span} iota kappa lmbda mu nu xi omicron pi"),
        (3, "totally unique words q w e r t y u i"),
        (4, "short doc"),                               # < 8 tokens
        (5, f"rep rep rep rep rep rep rep rep rep"),    # intra-doc only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus.dup_ngram_fraction(df, n=8).collect()}
    # 16 tokens -> 9 grams; only the first (the shared span) is dup
    assert out[1]["n_grams"] == 9 and out[1]["dup_frac"] == round(1 / 9, 6)
    assert out[2]["dup_frac"] == round(1 / 9, 6)
    assert out[3]["dup_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[5]["dup_frac"] == 0.0      # repeats within one doc only


def test_source_overlap_jaccard_bounds(spark):
    """Identical sources -> jaccard 1.0; disjoint -> no row (inner
    join on shared shingles); partial overlap in between."""
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words entirely unrelated content here"
    rows = [(1, "a", t1), (2, "b", t1),       # identical shingle sets
            (3, "c", t2)]                      # disjoint from a/b
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["source_a"], r["source_b"]): r["jaccard"]
           for r in corpus.source_overlap(df).collect()}
    assert out[("a", "b")] == 1.0
    assert ("a", "c") not in out and ("b", "c") not in out


def test_html_to_text_extraction(spark):
    """r14: the HTML->text chain drops script/style/comments, keeps
    block boundaries as newlines, decodes entities once (never
    double-decodes &amp;lt;), collapses whitespace, and is pure
    JVM (no PythonUDF in the plan)."""
    from pyspark.sql import functions as F

    from snowflake_emulator_spark.operators.textstats import html_to_text

    rows = [
        (1, "<html><head><script>if (1 < 2) x();</script>"
            "<style>a{b:c}</style></head><body><h1>Title</h1>"
            "<!-- note --><p>a &amp; b &lt;x&gt;</p><div>tail</div>"
            "</body></html>"),
        (2, "plain text, no markup"),
        (3, "<p>&amp;lt;</p>"),          # decodes to "&lt;" exactly once
        (4, "<ul><li>one</li><li>two</li></ul>"),
        (5, "<P CLASS='x'>upper</P><BR/>case"),
    ]
    df = spark.createDataFrame(rows, ["id", "html"])
    sel = df.select("id", html_to_text(F.col("html")).alias("t"))
    out = {r["id"]: r["t"] for r in sel.collect()}
    assert out[1] == "Title\na & b <x>\ntail"
    assert out[2] == "plain text, no markup"
    assert out[3] == "&lt;"
    assert out[4] == "one\ntwo"
    assert out[5] == "upper\ncase"
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
