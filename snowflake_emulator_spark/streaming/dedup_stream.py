"""Streaming deduplication (beyond-reference, training-pipeline shape).

Continuous-ingest dedup is the streaming twin of the batch
``operators/dedup.py`` family: documents arrive as files, each gets the
same engine-neutral normalized-text fingerprint, and
``dropDuplicates`` within a watermark suppresses re-deliveries.

Scale design: Spark keeps ONE state entry per fingerprint in the state
store, partitioned by the dedup key across executors; the watermark
bounds state size (fingerprints older than the horizon are evicted), so
state is O(unique docs per watermark window), not O(stream history).
Without a watermark, streaming dropDuplicates state grows forever —
that mode is deliberately not exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_doc_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def _fingerprint(text_col) -> F.Column:
    """THE batch normalizer (textstats.normalized_text) + md5: batch
    and streaming must agree on duplicate identity byte-for-byte — a
    re-implemented recipe here diverged on \\f/\\x0b whitespace."""
    from ..operators.textstats import normalized_text

    return F.md5(normalized_text(text_col))


def dedup_stream(docs: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Emit only the first-seen document per content fingerprint.

    ``dropDuplicatesWithinWatermark`` on (fp): duplicates inside the
    watermark horizon are suppressed AND state is actually evicted
    once the watermark passes an entry — plain ``dropDuplicates([fp])``
    without the event-time column in the key set never cleans state in
    Structured Streaming, growing forever on a long-running stream.
    """
    return (
        docs.withColumn("fp", _fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "ts", "fp", "text")
    )


def incremental_dedup_stream(docs: DataFrame, corpus: DataFrame,
                             text_col: str = "text",
                             watermark: str = "10 minutes") -> DataFrame:
    """New-vs-corpus streaming dedup — the streaming twin of
    ``operators/dedup.incremental_dedup``'s exact tier: arriving
    documents whose content fingerprint already exists in the STATIC
    corpus are dropped (stream-static left-anti join — Structured
    Streaming re-plans the static side per micro-batch, so a corpus
    refreshed between batches is picked up), then re-deliveries inside
    the stream are suppressed by watermark-bounded dropDuplicates
    state.

    Scale: the corpus side joins on the fingerprint key (broadcast
    below threshold, shuffled hash join above — per-batch Catalyst
    choice); streaming state is one entry per NEW unique fingerprint
    within the watermark horizon, independent of corpus size —
    ``dropDuplicatesWithinWatermark`` evicts entries the watermark has
    passed (plain dropDuplicates on [fp] would never clean state).
    """
    corpus_fp = corpus.select(
        _fingerprint(F.col(text_col)).alias("fp")).distinct()
    return (
        docs.withColumn("fp", _fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .join(corpus_fp, "fp", "left_anti")
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "ts", "fp", "text")
    )
