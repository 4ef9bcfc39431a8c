"""Text-analysis operators for large-scale training-data pipelines.

All of these are pure Spark ``Column`` expressions (JVM-side, inside
whole-stage codegen — no Python UDFs in the hot path), so they run at
full scan speed over a 100 TB ``documents`` table and are expressible
1:1 in ANSI SQL for the DuckDB oracle.

Operators:
* ``token_count``        — whitespace tokenization count
* ``word_count_distinct``— distinct-token count
* ``quality_score``      — length / punctuation / stopword-ratio blend
* ``language_guess``     — stopword-frequency n-gram heuristic
* ``fingerprint``        — normalized bag-of-words md5 (doc fingerprint)
* ``char_ngrams``        — character n-gram array (shingles for minhash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword marker sets for the heuristic language id.
# Counting is done with the replace-length trick so the identical SQL runs
# on DuckDB: (len(s) - len(replace(s, w, ''))) / len(w).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " de la "],
}

STOPWORDS_EN = ["the", "and", "of", "a", "to", "in", "is", "it", "for", "on"]


def _count_occurrences(col: Column, needle: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish heuristic upper bound)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


def word_count_distinct(text: Column) -> Column:
    # same empty guard as token_count: split('') yields [''] (size 1),
    # which reported one distinct word for an empty document
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(F.trim(text), r"\s+"))))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^a-zA-Z0-9\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in STOPWORDS_EN[:5]:
        c = _count_occurrences(padded, f" {w} ")
        hits = c if hits is None else hits + c
    return hits / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: favors mid-length docs, low punctuation
    noise, natural stopword density. Deterministic arithmetic only."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round(0.5 * len_score + 0.3 * stop_score + 0.2 * (1.0 - punct_penalty), 6)


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-stopword density per language (columns to project)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((_count_occurrences(padded, w) for w in words), F.lit(0.0))
        for lang, words in LANG_MARKERS.items()
    }


def language_pick(scores: dict[str, Column]) -> Column:
    """Argmax with ties to the earliest language in LANG_MARKERS order;
    'und' when nothing matches.

    Expects *projected columns* (not raw expressions): building the
    argmax directly over the replace-count expressions duplicates each
    score tree ~2^n times through the When-chain — 29s -> ~1s at sf0.1
    when scores go through a projection boundary first."""
    m = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(scores)):
        out = F.when(scores[lang] == m, F.lit(lang)).otherwise(out)
    return F.when(m <= 0, F.lit("und")).otherwise(out)


def language_guess(text: Column) -> Column:
    """Single-expression convenience (fine for small data; pipelines
    should project language_scores first and use language_pick)."""
    return language_pick(language_scores(text))


def word_ngram_array(words: Column, n: int) -> Column:
    """Word n-gram array. Docs shorter than n yield an empty array —
    Spark's sequence(1, 0) is DESCENDING, so the guard is mandatory,
    not defensive.

    Built as a ``zip_with`` chain over n shifted slices (r11), NOT a
    ``transform`` whose lambda slices ``words`` per element: Catalyst's
    predicate pushdown substitutes alias definitions into filter
    conditions with no cost guard, so a downstream ``filter`` on a
    derived boolean (quality_filter_pipeline's ``keep``) inlines the
    whole expression INTO the lambda — the per-element slice then
    re-evaluates the words expression per gram, O(len²) per row
    (measured 40x on pipeline_keep_set at sf0.1x10). zip_with evaluates
    its array arguments ONCE per row and its lambda is element-wise, so
    the expression stays O(len) per row no matter where the optimizer
    inlines it. Equivalent to array_join(slice(words, i, n), ' ') for
    NULL-free word arrays (split() output — our only caller shape)."""
    m = F.size(words) - (n - 1)
    acc = F.slice(words, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(words, k + 1, m),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(words) >= n, acc) \
        .otherwise(F.array().cast("array<string>"))


def ngram_repetition_ratio(grams: Column) -> Column:
    """Gopher-style intra-document repetition: the fraction of word
    n-grams that are repeats of an earlier gram (1 - distinct/total).
    Boilerplate, spam and templated text score high; clean prose scores
    near 0. Map-only — array ops in codegen, no shuffle, no Python.

    Pass a *projected* gram-array column: the expression references it
    twice (distinct + total), so an unprojected heavy gram expression
    would be evaluated twice per row."""
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / total, 6)
    )


def normalized_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form used for fingerprinting and exact dedup."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token bag of the normalized text."""
    toks = F.array_sort(F.array_distinct(F.split(normalized_text(text), " ")))
    return F.md5(F.array_join(toks, " "))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of the normalized text (array<string>).

    Built with ``sequence`` + ``transform`` — stays in codegen, no UDF.

    PERFORMANCE: the input expression is referenced inside the
    ``transform`` lambda, where Catalyst re-evaluates it per array
    element. Pass a *plain column* (pre-normalized via a projection),
    not a heavy expression — ``char_ngrams(normalized_text(col))``
    re-runs two regex passes per character. Pipelines should do
    ``df.select(normalized_text(col).alias("t")).select(char_ngrams(col("t")))``."""
    t = text
    return F.when(F.length(t) < n, F.array(t)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene): pure regexp Column expressions.
# Patterns are restricted to syntax shared by Java regex and RE2 so the
# identical pattern strings run on DuckDB for the oracle (no \b-free
# lookarounds, no backrefs).
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "url": (r"https?://[^\s]+", "[URL]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
}


def pii_redact(text: Column) -> Column:
    """Replace emails, URLs and phone numbers with typed placeholders.
    Chained JVM regexp_replace — one codegen projection, no Python."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII hit counts (regexp_extract_all size)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        for kind, (pattern, _) in PII_PATTERNS.items()
    }


# ---------------------------------------------------------------------------
# Statistical-LM quality scoring (perplexity proxy): a char-bigram
# language model TRAINED ON THE CORPUS ITSELF in one aggregation pass,
# then every document scored by its average log2 probability under that
# model. Low scores flag machine-generated gibberish / encoding damage /
# boilerplate — the classic cheap quality gate before an expensive
# neural filter. All relational: explode -> two groupBys -> broadcast
# join back; no Python in the hot path.
# ---------------------------------------------------------------------------


def bigram_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, bg): one row per char-bigram occurrence position of the
    normalized text (duplicates KEPT — counts need multiplicity)."""
    return df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__t")
    ).select(
        F.col(id_col), F.col("__t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("__t") - 1, F.lit(1)))
        ).alias("__pos"),
    ).select(
        F.col(id_col), F.col("__t").substr(F.col("__pos"), F.lit(2)).alias("bg")
    ).filter(F.length("bg") == 2)


def bigram_logprob_scores(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", alpha: float = 1.0,
                          vocab: int = 37) -> DataFrame:
    """Per-doc avg log2 P(c2|c1) under the corpus-trained add-alpha
    char-bigram LM. Returns (id, n_bigrams, avg_logp).

    Scale: the exploded bigram relation is ~len(text) rows per doc (the
    same order as the shingle table dedup already builds); the LM itself
    is at most |alphabet|^2 rows (~1.4k) — broadcast to every executor,
    so scoring is one map-side join + one groupBy(id). vocab=37 is the
    normalized alphabet (26 letters + 10 digits + space) for the
    smoothing denominator. r16: the bigram relation is lazily
    localCheckpointed — its two consumers (LM aggregation, scoring
    join) each re-evaluated the scan→normalize→posexplode pipeline;
    A/B at sf0.1: identical output, median 1.57 → 1.39 s."""
    bg = bigram_table(df, text_col, id_col).localCheckpoint(eager=False)
    lm = (
        bg.groupBy("bg").agg(F.count("*").alias("n_bg"))
        .withColumn("c1", F.substring("bg", 1, 1))
    )
    ctx = lm.groupBy("c1").agg(F.sum("n_bg").alias("n_c1"))
    lm = lm.join(ctx, "c1").select(
        "bg",
        ((F.col("n_bg") + F.lit(alpha))
         / (F.col("n_c1") + F.lit(alpha * vocab))).alias("p"),
    )
    from pyspark.sql.functions import broadcast

    return (
        bg.join(broadcast(lm), "bg")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(F.log2("p")), 6).alias("avg_logp"),
        )
    )


def max_token_run_lengths(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Longest run of consecutively repeated tokens per document —
    the classic degeneration signal ("word word word …") that n-gram
    repetition ratios under-weight. Returns (id, n_tokens, max_run).

    Gaps-and-islands, fully relational: tokens with positions, a run
    starts where the token differs from its predecessor (lag), run ids
    via running sum of starts, then two aggregations. One shuffle on
    the doc id (the window and both groupBys share it — Catalyst reuses
    the exchange), no Python anywhere."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = toks.withColumn(
        "new_run",
        (F.lag("tok").over(w).isNull() | (F.col("tok") != F.lag("tok").over(w))).cast("int"),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.groupBy(id_col, "run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy(id_col)
        .agg(
            F.sum("run_len").cast("bigint").alias("n_tokens"),
            F.max("run_len").cast("bigint").alias("max_run"),
        )
    )


# GPT-2-style pre-tokenizer pattern, restricted to the Java/RE2-shared
# regex subset so the identical string runs on DuckDB for the oracle:
# contractions, letter runs, digit runs, single punctuation marks.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: the GPT-2 pre-tokenizer split (the unit BPE
    merges start from) — a far better sequence-length estimate than
    whitespace words for budget/packing decisions. One JVM
    regexp_extract_all, no Python."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))).cast("bigint")


def dsir_importance_weights(df: DataFrame, target_filter: str,
                            text_col: str = "text", id_col: str = "doc_id",
                            alpha: float = 1.0, vocab: int = 37) -> DataFrame:
    """DSIR-style importance weights (Xie et al., data selection via
    importance resampling): score every document by how much more
    likely its char-bigrams are under a TARGET-domain LM than under the
    corpus-wide LM — avg( log2 P_target(bg) - log2 P_corpus(bg) ).
    Positive = looks like the target domain; used to up-sample
    target-like data in a pretraining mix.

    Scale: both LMs are ≤ |alphabet|² rows regardless of corpus size
    (one aggregation pass each over the same exploded bigram relation);
    the joined two-model table broadcasts, so scoring is one map-side
    join + one groupBy(id). r16: the bigram relation is lazily
    localCheckpointed — the planner does not share it across its four
    consumers (corpus LM, target LM, target ctx, scoring join: 4 full
    scan→normalize→posexplode evaluations in the before plan), and the
    checkpoint measured 2.56 → 1.83 s min at sf0.1 with identical
    output (scratch/ab_dsir.py; checkpointing the target slice too
    adds nothing — it is bounded by the broadcast semi-join anyway)."""
    from pyspark.sql.functions import broadcast

    bg = bigram_table(df, text_col, id_col).localCheckpoint(eager=False)
    target_ids = df.filter(target_filter).select(id_col)
    bg_t = bg.join(broadcast(target_ids), id_col, "left_semi")

    def _lm(rel: DataFrame) -> DataFrame:
        lm = rel.groupBy("bg").agg(F.count("*").alias("n_bg")).withColumn(
            "c1", F.substring("bg", 1, 1))
        ctx = lm.groupBy("c1").agg(F.sum("n_bg").alias("n_c1"))
        return lm.join(ctx, "c1").select(
            "bg",
            ((F.col("n_bg") + F.lit(alpha))
             / (F.col("n_c1") + F.lit(alpha * vocab))).alias("p"),
        )

    corpus_lm = _lm(bg).withColumnRenamed("p", "p_corpus")
    target_lm = _lm(bg_t).withColumnRenamed("p", "p_target")
    # bigrams unseen in the target slice must fall back to the REAL
    # add-alpha probability alpha / (n_c1_target + alpha*vocab) — a
    # flat 1/vocab ignored the context count and scored rare gibberish
    # bigrams far ABOVE their corpus probability, up-weighting exactly
    # the junk DSIR is supposed to down-weight (1/vocab is correct
    # only when the context itself is unseen, i.e. n_c1_target = 0)
    target_ctx = (
        bg_t.withColumn("c1", F.substring("bg", 1, 1))
        .groupBy("c1").agg(F.count("*").alias("n_c1_t"))
    )
    models = (
        corpus_lm.withColumn("c1", F.substring("bg", 1, 1))
        .join(target_lm, "bg", "left")
        .join(broadcast(target_ctx), "c1", "left")
        .select(
            "bg", "p_corpus",
            F.coalesce(
                "p_target",
                F.lit(alpha) / (F.coalesce("n_c1_t", F.lit(0))
                                + F.lit(alpha * vocab)),
            ).alias("p_target"),
        )
    )
    return (
        bg.join(broadcast(models), "bg")
        .groupBy(id_col)
        .agg(F.round(F.avg(F.log2("p_target") - F.log2("p_corpus")), 6)
             .alias("dsir_weight"))
    )


def bpe_train_merges(df: DataFrame, rounds: int = 6,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     return_tokens: bool = False):
    """Corpus-level BPE merge training (r13) — ``rounds`` fixed
    iterations of the classical byte-pair-encoding trainer (Sennrich et
    al. 2016), expressed relationally so an external SQL engine replays
    TRAINING end-to-end (the same design as the Lloyd-trained PQ
    codebooks in operators/similarity.py):

    * tokenize: lowercase/strip-normalized text -> words -> one CHAR
      token per (doc, word, pos); merges never cross word boundaries.
    * per round: count adjacent (tok, next) pairs over the whole
      corpus, pick the most frequent pair — ties break on the
      lexicographically smallest (l, r), so both engines pick
      identically — and REWRITE the token relation by greedy
      LEFT-TO-RIGHT non-overlapping merging.
    * the winning pair is COLLECTED per round (the merge table IS the
      model artifact — k rows regardless of corpus size, like MLlib
      centroids), and the token relation is localCheckpoint'ed so k
      rounds cost k linear passes, not a k^2 lineage recompute.

    r16 (guide §2.4/§4.2): the token relation is carried as ONE ROW
    PER WORD with an ``array<string>`` token column instead of one row
    per token. Pair counting is then a per-row ``zip_with`` of two
    shifted slices + explode (zero window exchanges — the r13 form
    paid a hashpartitioning(id, w) exchange per window, several per
    round), and the greedy merge is an Arrow-batched kernel whose
    left-to-right scan IS the textbook algorithm (the r13 relational
    form emulated it with the run-parity/two-window trick — measured
    equivalent output, ~30% slower end-to-end). String merging is
    exact, so outputs are identical by construction; the DuckDB oracle
    still replays training end-to-end and hash-gates both entries.
    Per-row memory is O(len(word)) — bounded by the tokenizer's word
    split, not by document length.

    Returns the merge table: (merge_round, l_tok, r_tok, freq). Stops
    early if no adjacent pairs remain. ``return_tokens=True``
    additionally returns the post-merge token relation
    (id, w, pos, tok) as a second value — the ENCODE output for
    token-count / compression-ratio analyses. ``pos`` is the 0-based
    in-word token position (r16 change, noted per ADVICE: the r13 form
    numbered post-merge tokens 1-based via row_number and 0-based only
    when no merge ran; it is now consistently 0-based — no in-repo
    consumer reads ``pos``, and the declared entries aggregate counts,
    so their outputs are unchanged)."""
    import pandas as pd

    spark = df.sparkSession
    norm = ("trim(regexp_replace(regexp_replace(lower(" + text_col
            + "), '[^a-z0-9 \\\\t\\\\n\\\\r]', ''), '[ \\\\t\\\\n\\\\r]+', ' '))")
    words = (
        df.select(F.col(id_col), F.posexplode(F.split(F.expr(norm), " "))
                  .alias("w", "word"))
        .filter(F.length("word") > 0)
    )
    arr_schema = T.StructType([
        words.schema[id_col],
        T.StructField("w", T.IntegerType()),
        T.StructField("toks", T.ArrayType(T.StringType())),
    ])
    cur = words.select(
        F.col(id_col), F.col("w"),
        F.filter(F.split("word", ""), lambda x: x != "").alias("toks"))
    merges: list[tuple] = []
    # r17 (guide §2.2): every checkpoint in the loop is LAZY — round
    # r's pair-count collect() is the action that materializes round
    # r-1's rewrite, so each round costs ONE fused
    # read-rewrite-count pass instead of an eager rewrite job PLUS a
    # count job (jobs per round 2 -> 1), and the final round's rewrite
    # is never computed at all unless ``return_tokens`` consumes it.
    # The blocks a pending lazy checkpoint still depends on are only
    # released AFTER the collect() that materializes it.
    cur = cur.localCheckpoint(eager=False)
    pending_release = None
    for r in range(rounds):
        # adjacent pairs per row: zip two shifted slices — no window,
        # no (id, w) exchange; 1-token words slice to empty arrays
        pairs = cur.select(
            F.explode(F.zip_with(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("tok"), b.alias("nxt"))
            )).alias("p"))
        best = (
            pairs.select("p.tok", "p.nxt")
            .groupBy("tok", "nxt").count()
            .orderBy(F.desc("count"), "tok", "nxt").limit(1).collect()
        )
        # ^ this action materialized cur's checkpoint: the previous
        # round's blocks are no longer reachable from any live plan
        if pending_release is not None:
            try:
                pending_release._jdf.rdd().unpersist(False)
            except Exception:  # noqa: BLE001 — best-effort release
                pass
            pending_release = None
        if not best:
            break
        l_tok, r_tok, freq = best[0][0], best[0][1], int(best[0][2])
        merges.append((r + 1, l_tok, r_tok, freq))

        def rewrite(batches, _l=l_tok, _r=r_tok):
            # the textbook greedy left-to-right non-overlapping merge,
            # per word, in the Arrow batch kernel
            for pdf in batches:
                out = []
                for toks in pdf["toks"]:
                    n = len(toks)
                    res = []
                    i = 0
                    while i < n:
                        if i + 1 < n and toks[i] == _l and toks[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({id_col: pdf[id_col], "w": pdf["w"],
                                    "toks": out})

        new_ckpt = cur.mapInPandas(rewrite, arr_schema) \
            .localCheckpoint(eager=False)
        pending_release = cur
        cur = new_ckpt
    if pending_release is not None and not return_tokens:
        # train-only: the final rewrite is never consumed, so its
        # parent blocks can go now; with return_tokens the caller's
        # action materializes `cur` THROUGH those blocks — keep them.
        try:
            pending_release._jdf.rdd().unpersist(False)
        except Exception:  # noqa: BLE001 — best-effort release
            pass
    merges_df = spark.createDataFrame(
        merges,
        T.StructType([
            T.StructField("merge_round", T.IntegerType()),
            T.StructField("l_tok", T.StringType()),
            T.StructField("r_tok", T.StringType()),
            T.StructField("freq", T.LongType()),
        ]))
    if return_tokens:
        # same (id, w, pos, tok) relation shape as r13 (pos is the
        # 0-based in-word position; consumers count/inspect tokens)
        toks_rel = cur.select(
            F.col(id_col), F.col("w"),
            F.posexplode("toks").alias("pos", "tok"))
        return merges_df, toks_rel
    return merges_df


# ---------------------------------------------------------------------------
# HTML -> text extraction (r14): the stage between WARC crawl records
# and the documents table. ONE chained JVM regexp_replace projection —
# whole-stage codegen, no Python, and every pattern stays inside the
# Java-regex/RE2 common subset (no backreferences) so the DuckDB
# oracle replays the identical chain.
# ---------------------------------------------------------------------------

# (pattern, replacement) pairs applied in order; all global
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines before tags are stripped
    (r"(?is)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote"
     r"|section|article|header|footer|title)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]
# exact-string entity decodes, ampersand LAST (never double-decode)
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


# Explicit whitespace class for the edge-trim step: Java's \s includes
# \x0b (vertical tab) but RE2's does not, so spell the class out to keep
# the Spark chain and the DuckDB oracle replay byte-identical on
# vertical-tab edges (r15 ADVICE fix).
EDGE_WS = " \t\r\n\x0b\f"


def html_to_text(html: Column) -> Column:
    """Boilerplate-free text from HTML: drop script/style/comments,
    turn block-level tags into newlines, strip remaining tags, decode
    the common entities, collapse whitespace. A heuristic extractor in
    the trafilatura/jusText family's cheap tier — good enough for
    quality scoring and dedup keys at 100 TB, where per-doc Python
    parsing would dominate the pipeline."""
    out = html
    for pattern, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pattern, rep)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"[ \t\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    # Spark's trim() strips spaces only — strip edge newlines by regex
    return F.regexp_replace(out, f"^[{EDGE_WS}]+|[{EDGE_WS}]+$", "")
