"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001; ``queries()``/``oracle_sql()`` expose the full
declared inventory from ``snowflake_emulator_spark.inventory`` — one
entry per operator from SURVEY.md §2 plus the large-scale-pipeline
extension operators (dedup, similarity, text analysis, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowflake_emulator_spark import inventory  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = inventory.queries()["q1_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    approximate / non-SQL-expressible operators, which carry the
    weaker rows-only check)."""
    return inventory.oracle_sql()
