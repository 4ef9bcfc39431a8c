"""Skew-resistant join utilities.

The reference engine has no counterpart (single-node DuckDB execution
never shuffles); on a 1000-executor cluster a single hot join key
becomes one straggler task that dominates the stage. Spark's AQE skew
join (``spark.sql.adaptive.skewJoin.enabled``, on in
``session_factory.build_spark``) splits oversized partitions
automatically — but only when the skew is visible at partition
granularity and the join is sort-merge. ``salted_join`` is the
explicit recipe for the remaining cases: the hot key is spread over
``salt`` sub-keys on the large side while the other side is
replicated ``salt``×, so the hot key's rows land on ``salt``
different reducers.

Cost model: replication multiplies the small side's shuffle volume by
``salt`` — use when |right| * salt << |left|'s hot-key mass. The salt
is derived from ``monotonically_increasing_id`` (pure executor-side
counter, no Python, no extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salt_column(df: DataFrame, salt: int) -> DataFrame:
    """Attach a uniform salt in [0, salt) derived executor-side from the
    row's partition/offset counter (xxhash64 mixes the counter so the
    hot key's rows spread evenly even within one input partition)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )


def replicate_column(df: DataFrame, salt: int) -> DataFrame:
    """Replicate every row once per salt value (explode over a literal
    range — a Generate, not a join)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (the skewed, large side) to ``right`` on the
    ``on`` columns, spreading each key over ``salt`` shuffle partitions.

    Only ``inner`` and ``left`` joins are well-defined: an unmatched
    right row exists once per replica, so right/full joins would emit
    it ``salt`` times. Result columns = left columns + right's
    non-key columns (same shape as ``left.join(right, on, how)``).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: "
            "the replicated side would duplicate unmatched rows"
        )
    l = salt_column(left, salt)
    r = replicate_column(right, salt)
    # rename right-side join keys so the output keeps exactly one copy
    for k in on:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = [l[k] == r[f"__r_{k}"] for k in on]
    cond.append(l[SALT_COL] == r[SALT_COL])
    joined = l.join(r, cond, how)
    drop = [r[SALT_COL], l[SALT_COL]] + [r[f"__r_{k}"] for k in on]
    for c in drop:
        joined = joined.drop(c)
    return joined
