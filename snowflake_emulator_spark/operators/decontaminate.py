"""Benchmark decontamination for training-data pipelines, Spark-first.

The standard n-gram-overlap decontamination step (as popularized by the
GPT-3 / PaLM data cards): a training document is contaminated if it
shares any word n-gram with a document in the evaluation/benchmark set.
At 100 TB the corpus side is huge but the benchmark side is tiny (a few
MB of eval questions), so the whole operator is:

  corpus scan -> explode word n-grams (one narrow map stage)
  broadcast-join against the distinct benchmark n-gram set
  groupBy(doc_id) -> hit counts

One shuffle (the per-doc aggregation, map-side combinable); the
benchmark grams broadcast to every executor. Nothing here is quadratic
and no Python touches the hot path — n-gram construction is a codegen
``transform(sequence(...))`` over the split word array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text


def word_ngrams(df: DataFrame, n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-grams per document: (id_col, gram).

    A document shorter than ``n`` words contributes no grams (matching
    the convention of the published decontamination recipes: an n-gram
    filter cannot fire on a doc that has no n-grams)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    # guard: Spark's sequence(1, 0) yields DESCENDING [1, 0], not empty,
    # so a short doc must short-circuit to an empty gram array
    grams = F.when(
        F.size(F.col("__words")) >= n,
        F.expr(
            f"transform(sequence(1, size(__words) - {n - 1}), "
            f"i -> array_join(slice(__words, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), words.alias("__words"))
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        # normalized_text('') -> '' -> split -> [''] would make every
        # blank doc share the empty gram with any blank benchmark doc
        .filter(F.col("gram") != "")
        .distinct()
    )


def contaminated_docs(corpus: DataFrame, benchmark: DataFrame, n: int = 8,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus documents sharing >= 1 word n-gram with the benchmark set.

    Returns (doc_id, n_hit_grams, n_grams, hit_ratio) for contaminated
    docs only — the removal list a pipeline anti-joins against the
    corpus. The benchmark gram set is broadcast: it is small by contract
    (eval suites are KBs-to-MBs; if yours is bigger, drop the broadcast
    hint and let AQE pick the join).
    """
    corpus_grams = word_ngrams(corpus, n, text_col, id_col)
    bench_grams = word_ngrams(benchmark, n, text_col, id_col).select(
        "gram").distinct().withColumn("__hit", F.lit(True))
    # ONE corpus pass: a LEFT broadcast join marks benchmark grams and
    # a single groupBy counts totals and hits together (two separate
    # aggregations re-ran the corpus scan + gram explode + distinct)
    marked = corpus_grams.join(F.broadcast(bench_grams), "gram", "left")
    sized = marked.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.col("__hit").isNotNull().cast("bigint")).alias("n_hit_grams"),
    ).filter(F.col("n_hit_grams") > 0)
    return sized.select(
        id_col,
        "n_hit_grams",
        "n_grams",
        F.round(F.col("n_hit_grams") / F.col("n_grams"), 6).alias("hit_ratio"),
    )
