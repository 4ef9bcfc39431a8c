"""snowflake_emulator_spark — a PySpark-native re-implementation of the
capability surface of nnnkkk7/snowflake-emulator.

The reference is a Go HTTP server that translates Snowflake SQL to
DuckDB SQL and delegates relational execution to an embedded DuckDB
(`/root/reference/README.md:40-44`). This package occupies the same
architectural seat with Spark SQL/Catalyst as the engine: a
Snowflake-compatibility layer (classifier, translator, catalog,
sessions, statements, COPY INTO, MERGE INTO, bindings, type mapping,
result shaping) implemented idiomatically on SparkSession / DataFrame /
spark.sql(), plus beyond-reference large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).
"""

from .engine import Engine
from .session_factory import build_spark

__all__ = ["Engine", "build_spark"]
__version__ = "0.1.0"
