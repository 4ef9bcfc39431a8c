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
    # NUMBER precision/scale carried into rowType (the reference copies
    # DuckDB's DecimalSize() into ColumnMetadata — type_mapper.go:89-95;
    # Snowflake itself reports integers as NUMBER(38,0))
    precision: int = 0
    scale: int = 0
    length: int = 0


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
    def from_dataframe(cls, df: DataFrame,
                       stream_threshold: int | None = None) -> "Result":
        """Materialize small results; keep large ones streaming.

        Probes with ``limit(threshold+1).collect()`` — when the result
        fits the threshold that probe IS the full rowset (byte-
        identical to the historical ``df.collect()`` path, and Spark
        executes CollectLimit incrementally so small results stay one
        cheap job). Above the threshold the rows are NOT held on the
        driver: a :class:`StreamedResult` keeps the DataFrame and the
        protocol layer drains it batch-by-batch (r8, beyond reference
        — the reference buffers every rowset,
        pkg/query/executor.go:99-119)."""
        from . import config

        threshold = (config.RESULT_STREAM_THRESHOLD
                     if stream_threshold is None else stream_threshold)
        cols = [f.name for f in df.schema.fields]
        ctypes = [_column_meta(f) for f in df.schema.fields]
        probe = df.limit(threshold + 1).collect()
        if len(probe) <= threshold:
            return cls(columns=cols, column_types=ctypes,
                       rows=[list(r) for r in probe], spark_schema=df.schema)
        return StreamedResult(df, columns=cols, column_types=ctypes)

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

    # -- batched iteration (shared by the streaming protocol path) --------

    def iter_rows(self, batch_size: int | None = None):
        """Yield the rows as lists in batches of ``batch_size``. The
        base implementation slices the materialized list; StreamedResult
        overrides it to drain toLocalIterator without materializing."""
        from . import config

        bs = batch_size or config.RESULT_STREAM_BATCH
        for i in range(0, len(self.rows), bs):
            yield self.rows[i:i + bs]

    def iter_rowset_strings(self, batch_size: int | None = None):
        """Batched gosnowflake all-strings serialization — one batch of
        stringified rows at a time, for chunked HTTP emission."""
        for batch in self.iter_rows(batch_size):
            yield [[_stringify(v) for v in row] for row in batch]

    # -- protocol serializations ------------------------------------------

    def rowset_strings(self) -> list[list[str]]:
        """gosnowflake-protocol rowset: every value stringified; NULL
        encodes as "" (query.go:184-186) — indistinguishable from an
        empty string on this wire, a documented gosnowflake
        limitation. The Arrow path carries real nulls."""
        return [[_stringify(v) for v in row] for row in self.rows]

    def rowset_typed(self) -> list[list]:
        """REST v2 typed JSON rows (rest_api_v2.go:237-253)."""
        return [[_jsonify(v) for v in row] for row in self.rows]

    def rowset_arrow_base64(self) -> str:
        """gosnowflake Arrow result format: the rowset as ONE Arrow IPC
        stream, base64-encoded into ``rowsetBase64`` (what real
        Snowflake sends when the session negotiates
        GO_QUERY_RESULT_FORMAT=arrow — the reference emulator is
        JSON-only, so this is a beyond-reference upgrade).

        Columns use Snowflake's PHYSICAL Arrow layout, the concrete
        array types gosnowflake's ``arrowToValue`` type-asserts
        (gosnowflake converter.go): FIXED as int64 (scale 0) or
        decimal128(p,s), both with ``scale``/``precision`` field
        metadata; TIMESTAMP_NTZ/_LTZ as int64 epoch units at the
        field's ``scale`` (6 = microseconds here); TIMESTAMP_TZ as
        struct{epoch int64 seconds, fraction int32 nanos, timezone
        int32 offset-minutes+1440}; DATE as date32; REAL as float64;
        TEXT as utf8; BINARY as binary."""
        import base64
        import io

        import pyarrow as pa

        fields, encoders = [], []
        for i, cm in enumerate(self.column_types):
            pa_type, logical, meta = _arrow_physical_for(cm, self.spark_schema, i)
            md = {"logicalType": logical}
            md.update(meta)
            if logical == "TIMESTAMP_NTZ":
                # int64 epoch units at scale=6 (gosnowflake reads the
                # non-struct branch: extractEpoch(value, scale))
                def enc_ntz(values):
                    return pa.array(values, type=pa.timestamp("us")) \
                        .cast(pa.int64())

                field_type, enc = pa.int64(), enc_ntz
            elif logical == "TIMESTAMP_TZ":
                struct_t = pa.struct([
                    pa.field("epoch", pa.int64()),
                    pa.field("fraction", pa.int32()),
                    pa.field("timezone", pa.int32())])

                def enc_tz(values):
                    us = pa.array(values, type=pa.timestamp("us", tz="UTC")) \
                        .cast(pa.int64()).to_pylist()
                    # Python floor-div/mod keep fraction in [0, 1e9)
                    # for pre-epoch instants, matching Go
                    # time.Unix(epoch, frac)
                    epoch = [None if v is None else v // 1_000_000 for v in us]
                    frac = [None if v is None else (v % 1_000_000) * 1000
                            for v in us]
                    # Snowflake wire encoding: UTC-offset minutes + 1440
                    tzm = [None if v is None else 1440 for v in us]
                    return pa.StructArray.from_arrays(
                        [pa.array(epoch, pa.int64()),
                         pa.array(frac, pa.int32()),
                         pa.array(tzm, pa.int32())],
                        names=["epoch", "fraction", "timezone"],
                        mask=pa.array([v is None for v in us], pa.bool_()))

                field_type, enc = struct_t, enc_tz
            else:
                def enc_plain(values, _t=pa_type):
                    if pa.types.is_string(_t):
                        # complex values (arrays/maps/rows) ride as JSON
                        values = [v if v is None or isinstance(v, str)
                                  else _stringify(v) for v in values]
                    return pa.array(values, type=_t)

                field_type, enc = pa_type, enc_plain
            fields.append(pa.field(cm.name, field_type, nullable=True,
                                   metadata=md))
            encoders.append(enc)
        schema = pa.schema(fields)
        sink = io.BytesIO()
        # batch-by-batch encoding (r8): a StreamedResult's iter_rows
        # drains toLocalIterator, so even the Arrow path never holds
        # the row objects — peak memory is one batch + the IPC payload
        wrote = False
        with pa.ipc.new_stream(sink, schema) as writer:
            for batch in self.iter_rows():
                cols = list(zip(*batch)) if batch else []
                arrays = [encoders[i](list(cols[i]) if batch else [])
                          for i in range(len(self.column_types))]
                writer.write_batch(
                    pa.record_batch(arrays, schema=schema))
                wrote = True
            if not wrote:
                arrays = [encoders[i]([]) for i in
                          range(len(self.column_types))]
                writer.write_batch(pa.record_batch(arrays, schema=schema))
        return base64.b64encode(sink.getvalue()).decode("ascii")

    def row_type(self) -> list[dict]:
        return [
            {"name": c.name, "type": c.type, "nullable": c.nullable,
             "length": c.length, "precision": c.precision,
             "scale": c.scale, "byteLength": 0}
            for c in self.column_types
        ]


class StreamedResult(Result):
    """A SELECT result above ``config.RESULT_STREAM_THRESHOLD`` rows:
    holds the DataFrame instead of the rowset. ``iter_rows`` drains
    ``toLocalIterator(prefetchPartitions=True)`` so driver memory is
    bounded by one batch; ``row_count`` is a distributed ``count()``
    (cached), not a materialization. Accessing ``.rows`` directly is a
    COMPATIBILITY FALLBACK that materializes once and caches — the
    protocol paths (server/app.py streaming JSON emission) never touch
    it; RESULT_SCAN re-serves and REST v2 typed rows may. (r8, beyond
    reference — the reference buffers every rowset.)"""

    def __init__(self, df: DataFrame, columns: list[str],
                 column_types: list[ColumnMetadata]):
        self._rows_cache: list | None = None
        self._df = df
        self._total: int | None = None
        super().__init__(columns=columns, column_types=column_types,
                         rows=[], spark_schema=df.schema)

    # dataclass __init__ assigns the ``rows`` field; route it through a
    # property so the assignment of the empty default keeps the result
    # lazy while a genuine replacement (nobody does today) sticks
    @property
    def rows(self) -> list:  # type: ignore[override]
        if self._rows_cache is None:
            self._rows_cache = [list(r) for r in
                                self._df.toLocalIterator(prefetchPartitions=True)]
            self._total = len(self._rows_cache)
        return self._rows_cache

    @rows.setter
    def rows(self, v) -> None:
        self._rows_cache = v if v else None

    @property
    def row_count(self) -> int:  # type: ignore[override]
        if self._total is None:
            self._total = self._df.count()
        return self._total

    def iter_rows(self, batch_size: int | None = None):
        from . import config

        if self._rows_cache is not None:  # already materialized: slice
            yield from super().iter_rows(batch_size)
            return
        bs = batch_size or config.RESULT_STREAM_BATCH
        batch: list[list] = []
        for r in self._df.toLocalIterator(prefetchPartitions=True):
            batch.append(list(r))
            if len(batch) >= bs:
                yield batch
                batch = []
        if batch:
            yield batch


def _arrow_physical_for(cm: ColumnMetadata, spark_schema, i: int):
    """(pyarrow type, Snowflake logicalType, extra field metadata) for a
    result column in Snowflake's physical Arrow layout; uses the
    original Spark schema when present, else the Snowflake name.
    Timestamp columns return their VALUE-side arrow type here — the
    encoder rewrites them to the int64/struct physical arrays."""
    import pyarrow as pa
    from pyspark.sql import types as T

    dt = spark_schema.fields[i].dataType if spark_schema is not None and i < len(
        spark_schema.fields) else None
    if isinstance(dt, T.DecimalType):
        return (pa.decimal128(dt.precision, dt.scale), "FIXED",
                {"precision": str(dt.precision), "scale": str(dt.scale)})
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return pa.int64(), "FIXED", {"precision": "38", "scale": "0"}
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return pa.float64(), "REAL", {}
    if isinstance(dt, T.BooleanType):
        return pa.bool_(), "BOOLEAN", {}
    if isinstance(dt, T.DateType):
        return pa.date32(), "DATE", {"scale": "0"}
    if isinstance(dt, (T.TimestampNTZType,)):
        # (an LTZ mapping would share this int64-epoch branch; Spark
        # has no separate LTZ type, so only NTZ/TZ are reachable)
        return pa.timestamp("us"), "TIMESTAMP_NTZ", {"scale": "6"}
    if isinstance(dt, T.TimestampType):
        # struct{epoch, fraction(nanos), timezone}: fraction carries
        # nanosecond resolution regardless of source precision
        return pa.timestamp("us", tz="UTC"), "TIMESTAMP_TZ", {"scale": "9"}
    if isinstance(dt, T.BinaryType):
        return pa.binary(), "BINARY", {}
    if dt is None and cm.type == "NUMBER":
        return pa.int64(), "FIXED", {"precision": "38", "scale": "0"}
    if dt is None and cm.type == "FLOAT":
        return pa.float64(), "REAL", {}
    # strings, VARIANT-as-text, arrays/maps serialized as JSON text
    return pa.string(), "TEXT", {}


def _column_meta(f) -> ColumnMetadata:
    """Build rowType metadata from a Spark StructField.

    Precision/scale mirror the reference's pass-through of DuckDB's
    ``DecimalSize()`` (`type_mapper.go:89-95`) — decimals carry their
    declared (p, s); integer widths report Snowflake's canonical
    NUMBER(38,0)."""
    from pyspark.sql import types as T

    sf_name = spark_to_snowflake_name(f.dataType)
    prec = scale = 0
    if isinstance(f.dataType, T.DecimalType):
        prec, scale = f.dataType.precision, f.dataType.scale
    elif sf_name == "NUMBER":
        prec, scale = 38, 0
    length = 16777216 if sf_name == "TEXT" else 0
    return ColumnMetadata(f.name, sf_name, f.nullable, prec, scale, length)


def _stringify(v) -> str | None:
    """gosnowflake all-strings cell: Go ``fmt.Sprintf("%v", val)`` parity
    with the reference's `convertRowsToStrings` (query.go:179-193):
    NULL -> "" (query.go:186), floats in Go shortest-'g' form (no
    trailing ".0", scientific only below 1e-4 / at 1e21 and above),
    time values in Go ``time.Time.String()`` form. Bytes diverge
    deliberately (hex, not Go's space-separated decimal dump)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _go_float(v)
    if isinstance(v, dt.datetime):
        return _go_time(v)
    if isinstance(v, dt.date):
        # DuckDB DATE scans into a midnight time.Time in Go
        return f"{v.isoformat()} 00:00:00 +0000 UTC"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, dict)):
        import json

        return json.dumps(v, separators=(",", ":"), default=str)
    return str(v)


def _go_time(v: dt.datetime) -> str:
    """Go ``time.Time.String()``: ``2006-01-02 15:04:05.999999999 -0700
    MST`` — fractional seconds trimmed of trailing zeros and omitted when
    zero; Spark NTZ values surface as UTC like DuckDB's driver."""
    base = v.strftime("%Y-%m-%d %H:%M:%S")
    if v.microsecond:
        base += ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
    if v.tzinfo is not None:
        off = v.utcoffset() or dt.timedelta(0)
        total = int(off.total_seconds())
        sign = "+" if total >= 0 else "-"
        hh, mm = divmod(abs(total) // 60, 60)
        return f"{base} {sign}{hh:02d}{mm:02d} {v.tzname() or 'UTC'}"
    return f"{base} +0000 UTC"


def _go_float(f: float) -> str:
    """Go ``strconv.FormatFloat(f, 'g', -1, 64)`` (the %v default):
    shortest round-trip digits; scientific iff decimal exponent < -4 or
    >= 21 (Python's repr switches at 1e16, so reformat explicitly)."""
    import math

    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    if f == 0.0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    sign = "-" if f < 0 else ""
    d = decimal.Decimal(repr(abs(f)))
    _, digits, dexp = d.as_tuple()
    digits_s = "".join(map(str, digits))
    exp10 = len(digits_s) + dexp - 1  # exponent of leading digit
    digits_s = digits_s.rstrip("0") or "0"
    if exp10 < -4 or exp10 >= 21:
        mant = digits_s[0] + ("." + digits_s[1:] if len(digits_s) > 1 else "")
        return f"{sign}{mant}e{'+' if exp10 >= 0 else '-'}{abs(exp10):02d}"
    if exp10 >= len(digits_s) - 1:
        return sign + digits_s + "0" * (exp10 - len(digits_s) + 1)
    if exp10 >= 0:
        return sign + digits_s[: exp10 + 1] + "." + digits_s[exp10 + 1:]
    return sign + "0." + "0" * (-exp10 - 1) + digits_s


def _jsonify(v):
    if isinstance(v, dt.datetime):
        # Go time.Time marshals itself as RFC3339 in the v2 handler's
        # json.Encoder pass-through (rest_api_v2.go:238-239)
        return v.isoformat(sep="T") + ("" if v.tzinfo else "Z")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v
