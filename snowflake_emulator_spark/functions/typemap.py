"""Snowflake <-> Spark type mapping.

Reproduces the reference's three type maps (see SURVEY.md §1.3):

1. Snowflake -> storage type (reference:
   ``/root/reference/pkg/contentdata/repository.go:191-246``): here
   Snowflake type names map to Spark ``DataType``s.
2. Storage -> Snowflake result-metadata name (reference:
   ``/root/reference/pkg/query/type_mapper.go:24-56``): here Spark
   ``DataType``s map back to Snowflake type names for result metadata.

Design choices (documented divergences the reference itself has):
VARIANT/OBJECT/ARRAY are stored as JSON text in a ``StringType`` column
(matches ``contentdata/repository.go:235-237``; the reference's other
map at ``pkg/types/snowflake.go:45-76`` uses a JSON storage type —
we pick the canonical VARCHAR/JSON-text map so DuckDB-oracle output
formatting is stable).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_DECIMAL_RE = re.compile(r"^(NUMBER|DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$", re.I)
_VARCHAR_RE = re.compile(r"^(VARCHAR|CHAR|CHARACTER|STRING|TEXT)\s*(?:\(\s*\d+\s*\))?$", re.I)


def snowflake_to_spark(sf_type: str) -> T.DataType:
    """Map a Snowflake column type to the Spark storage type.

    Mirrors ``/root/reference/pkg/contentdata/repository.go:191-246``.
    """
    s = sf_type.strip().upper()
    m = _DECIMAL_RE.match(s)
    if m:
        p = int(m.group(2)) if m.group(2) else 38
        sc = int(m.group(3)) if m.group(3) else 0
        return T.DecimalType(min(p, 38), min(sc, 37))
    if _VARCHAR_RE.match(s):
        return T.StringType()
    base = s.split("(")[0].strip()
    mapping: dict[str, T.DataType] = {
        "INT": T.IntegerType(),
        "INTEGER": T.IntegerType(),
        "BIGINT": T.LongType(),
        "SMALLINT": T.ShortType(),
        "TINYINT": T.ByteType(),
        "BYTEINT": T.ByteType(),
        "FLOAT": T.DoubleType(),
        "FLOAT8": T.DoubleType(),
        "DOUBLE": T.DoubleType(),
        "DOUBLE PRECISION": T.DoubleType(),
        "REAL": T.FloatType(),
        "FLOAT4": T.FloatType(),
        "BINARY": T.BinaryType(),
        "VARBINARY": T.BinaryType(),
        "BOOLEAN": T.BooleanType(),
        "DATE": T.DateType(),
        "TIME": T.StringType(),  # Spark has no TIME; store "HH:MM:SS" text
        "DATETIME": T.TimestampNTZType(),
        "TIMESTAMP": T.TimestampNTZType(),
        "TIMESTAMP_NTZ": T.TimestampNTZType(),
        "TIMESTAMP_LTZ": T.TimestampType(),
        "TIMESTAMP_TZ": T.TimestampType(),
        # VARIANT family is JSON text (contentdata/repository.go:235-237)
        "VARIANT": T.StringType(),
        "OBJECT": T.StringType(),
        "ARRAY": T.StringType(),
        "GEOGRAPHY": T.StringType(),  # WKT text (pkg/types/snowflake.go:71-72)
        "GEOMETRY": T.StringType(),
    }
    return mapping.get(base, T.StringType())


def spark_to_snowflake_name(dt: T.DataType) -> str:
    """Map a Spark result type to the Snowflake type name used in result
    metadata. Mirrors ``/root/reference/pkg/query/type_mapper.go:24-56``:
    every integer width -> NUMBER, floats -> FLOAT, strings -> TEXT, etc.
    """
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)):
        return "NUMBER"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "FLOAT"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP_NTZ"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP_TZ"
    if isinstance(dt, T.BinaryType):
        return "BINARY"
    if isinstance(dt, T.ArrayType):
        return "ARRAY"
    if isinstance(dt, (T.MapType, T.StructType)):
        return "OBJECT"
    if isinstance(dt, T.VariantType) if hasattr(T, "VariantType") else False:  # Spark 4 VARIANT
        return "VARIANT"
    return "TEXT"


def snowflake_to_spark_ddl(sf_type: str) -> str:
    """Snowflake type name -> Spark SQL DDL type string (for CAST rewrites
    and CREATE TABLE translation)."""
    return snowflake_to_spark(sf_type).simpleString()
