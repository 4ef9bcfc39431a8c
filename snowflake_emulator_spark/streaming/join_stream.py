"""Watermarked stream-stream join (beyond-reference; the reference has
no streaming at all, README.md:300-304).

The canonical attribution pattern: a *click* stream joins the
*impression* stream that caused it, within a bounded event-time
interval. Both sides carry watermarks, so Spark's state store holds
only rows younger than ``watermark`` (+ the join interval) per side —
state is bounded no matter how long the streams run, which is the
property that matters at production scale: an unbounded-state join
would OOM a long-lived cluster regardless of size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    clicks: DataFrame,
    impressions: DataFrame,
    *,
    key: str = "user_id",
    watermark: str = "2 minutes",
    within: str = "1 minute",
) -> DataFrame:
    """Inner-join each click to impressions of the same ``key`` whose
    event time lies in ``[click.ts - within, click.ts]``.

    Output columns: key, click_ts, imp_ts, click_value, imp_value.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    i = impressions.withWatermark("ts", watermark).alias("i")
    cond = F.expr(
        f"c.{key} = i.{key} AND c.ts >= i.ts AND "
        f"c.ts <= i.ts + INTERVAL {within}"
    )
    return c.join(i, cond, "inner").select(
        F.col(f"c.{key}").alias(key),
        F.col("c.ts").alias("click_ts"),
        F.col("i.ts").alias("imp_ts"),
        F.col("c.value").alias("click_value"),
        F.col("i.value").alias("imp_value"),
    )
