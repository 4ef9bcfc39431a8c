"""Result materialization and protocol shaping.

Mirrors the reference's ``Result`` struct and its two serializations
(`/root/reference/pkg/query/result.go:23-47`,
`server/handlers/query.go:179-193` all-strings gosnowflake rowset,
`server/handlers/rest_api_v2.go:223-254` typed REST v2 rows).
"""

from __future__ import annotations

import datetime as dt
import decimal
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .functions.typemap import spark_to_snowflake_name


@dataclass
class ColumnMetadata:
    name: str
    type: str  # Snowflake type name (NUMBER/FLOAT/TEXT/…)
    nullable: bool = True


@dataclass
class Result:
    columns: list[str] = field(default_factory=list)
    column_types: list[ColumnMetadata] = field(default_factory=list)
    rows: list[list] = field(default_factory=list)
    # DML/COPY/MERGE counters (result.go:35-47)
    rows_loaded: int = 0
    rows_inserted: int = 0
    rows_updated: int = 0
    rows_deleted: int = 0
    files_loaded: int = 0
    errors: list[str] = field(default_factory=list)
    message: str = ""
    # set by the executor; lets RESULT_SCAN(<id>) re-serve this result
    query_id: str = ""
    # original Spark schema when the result came from a DataFrame, so
    # RESULT_SCAN reproduces types exactly (None for status results)
    spark_schema: object | None = None

    @classmethod
    def from_dataframe(cls, df: DataFrame) -> "Result":
        collected = df.collect()
        cols = [f.name for f in df.schema.fields]
        ctypes = [ColumnMetadata(f.name, spark_to_snowflake_name(f.dataType), f.nullable)
                  for f in df.schema.fields]
        return cls(columns=cols, column_types=ctypes, rows=[list(r) for r in collected],
                   spark_schema=df.schema)

    @classmethod
    def status(cls, message: str, **counters) -> "Result":
        r = cls(columns=["status"], column_types=[ColumnMetadata("status", "TEXT")],
                rows=[[message]], message=message)
        for k, v in counters.items():
            setattr(r, k, v)
        return r

    @property
    def row_count(self) -> int:
        return len(self.rows)

    # -- protocol serializations ------------------------------------------

    def rowset_strings(self) -> list[list[str | None]]:
        """gosnowflake-protocol rowset: every value stringified, NULL as
        None (query.go:179-193)."""
        return [[_stringify(v) for v in row] for row in self.rows]

    def rowset_typed(self) -> list[list]:
        """REST v2 typed JSON rows (rest_api_v2.go:237-253)."""
        return [[_jsonify(v) for v in row] for row in self.rows]

    def row_type(self) -> list[dict]:
        return [
            {"name": c.name, "type": c.type, "nullable": c.nullable,
             "length": 0, "precision": 38 if c.type == "NUMBER" else 0,
             "scale": 0, "byteLength": 0}
            for c in self.column_types
        ]


def _stringify(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Go fmt %v-compatible enough for ints-as-floats; keep repr for rest
        return repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, dict)):
        import json

        return json.dumps(v, separators=(",", ":"), default=str)
    return str(v)


def _jsonify(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return _stringify(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v
