"""salted_join: skew-resistant equi-join (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from snowflake_emulator_spark.operators.skew import (
    SALT_COL,
    salt_column,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 (the hot key)
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("lv"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], "k long, rv string"
    )
    return left, right


def test_salted_inner_matches_plain_join(skewed):
    left, right = skewed
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert salted.columns == plain.columns


def test_salted_left_keeps_unmatched_once(skewed):
    left, _ = skewed
    right = left.sparkSession.createDataFrame([(0, "only_hot")], "k long, rv string")
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], salt=4, how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_spreads_hot_key(skewed):
    left, _ = skewed
    hot = salt_column(left, 8).where(F.col("k") == 0)
    n_salts = hot.select(SALT_COL).distinct().count()
    # the hot key must occupy most of the 8 sub-keys, not 1
    assert n_salts >= 6


def test_rejects_right_and_full_joins(skewed):
    left, right = skewed
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, ["k"], how=how)


def test_join_condition_includes_salt(skewed):
    left, right = skewed
    plan = salted_join(left, right, ["k"], salt=8)._jdf.queryExecution().toString()
    assert SALT_COL in plan
