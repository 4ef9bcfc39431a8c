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
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        # a silent partial read would hash-compare a mid-run snapshot
        raise TimeoutError(
            f"memory-sink stream {name!r} did not finish within {timeout_s}s")
    return q


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

# open-session state per user: bounds as epoch micros (long) so the
# state row stays a flat fixed-width tuple
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-user session windows via
    ``applyInPandasWithState`` (beyond-reference; the batch analog is the
    ``events_sessionize`` inventory query).

    A session closes when (a) a later event for the user arrives more
    than ``gap_seconds`` after the session's last event — emitted
    eagerly in the trigger that observes the gap — or (b) the event-time
    watermark passes last_event + gap (state timeout), covering users
    who simply stop sending. State per user is one fixed-width row;
    partitioning is by user hash, so the operator scales horizontally
    with no global coordination."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        uid = key[0]
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000
        vals = rows["value"].astype("float64")
        cur = list(state.get) if state.exists else None
        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if cur is None:
                cur = [t, t, 0, 0.0]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(v)
        state.update(tuple(cur))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
