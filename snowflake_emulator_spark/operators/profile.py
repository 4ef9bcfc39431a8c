"""Single-pass data profiling (data-quality step of a training
pipeline): per-column row/null/distinct counts and min/max in ONE scan.

All columns' aggregates evaluate in one partial+final aggregation pass
(Spark computes the full aggregate list per input row map-side), then
the wide one-row result unpivots into (column, metric...) rows with a
stack() projection — no second scan, no per-column jobs. At 100 TB the
difference between this and the naive one-query-per-column profiler is
a factor of |columns| in scan cost.

COUNT(DISTINCT c1), COUNT(DISTINCT c2), ... in one aggregate triggers
Spark's EXPAND-based multi-distinct rewrite (one pass, |distinct-cols|x
row multiplication before partial aggregation) — still one scan; swap
in approx_count_distinct per column for the sketch-accuracy trade at
extreme widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols``: (column, n_rows, n_nulls, n_distinct, min_val,
    max_val) — min/max stringified for a uniform schema across types."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(column_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
