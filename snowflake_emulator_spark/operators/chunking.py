"""Document chunking for training-data pipelines: fixed-size
overlapping token windows per document.

Spark-first design: tokenization (``split``), window starts
(``sequence`` + ``posexplode``) and window extraction (``slice`` +
``array_join``) are all JVM Column expressions inside one narrow
projection — NO shuffle and NO Python in the path, so chunking a
100 TB corpus is a pure map stage that scales linearly with
executors. (A groupBy/applyInPandas formulation would Arrow-transfer
every byte through Python for no semantic gain.)

Beyond the reference (a SQL engine has no chunker); modeled on the
windowing idiom used by public LLM-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    chunk_tokens: int = 100, stride: int = 80) -> DataFrame:
    """Explode each document into overlapping token windows.

    Returns (id_col, chunk_idx, n_toks, chunk_text). ``stride`` <
    ``chunk_tokens`` gives ``chunk_tokens - stride`` tokens of overlap
    between consecutive chunks (standard for context-window packing).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # empty/NULL documents emit ZERO chunks: split(trim('')) is ['']
    # (size 1), which produced a phantom chunk with n_toks=1 and empty
    # text; NULL text produced a row of NULLs
    base = (
        df.filter(F.col(text_col).isNotNull()
                  & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
    )
    starts = F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride))
    exploded = base.select(
        F.col(id_col), F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    window = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(window).cast("bigint").alias("n_toks"),
        F.array_join(window, " ").alias("chunk_text"),
    )
