"""Structured Streaming extension (beyond-reference).

The reference supports no streams (`/root/reference/README.md:300-304`).
As a forward-looking extension for the ``events`` table shape, this
module provides a file-source streaming pipeline with event-time
windowed aggregation + watermarked late-data handling — the canonical
Spark pattern a production deployment of this engine would use for
continuous ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 minute",
                    watermark: str = "2 minutes") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str = "events_agg", timeout_s: int = 60,
                       output_mode: str = "complete"):
    """Start the query with a memory sink (tests / demos).

    Default mode is ``complete``: with ``append`` + watermark, a window
    only emits once the watermark passes its end — a finite
    ``availableNow`` batch with no trailing data would emit nothing."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
