"""Minimal pure-Python Avro Object Container File codec.

The Spark distribution in this environment ships the Avro *core* jars
but not the ``spark-avro`` DataSource module, and no Python avro
package is installed — so ``COPY ... FILE_FORMAT=(TYPE=AVRO)`` would
otherwise be the only COPY format that errors instead of working
(the reference supports CSV/JSON only,
/root/reference/pkg/query/copy_processor.go:266-268, so AVRO is
beyond-reference surface either way).

This module implements the Avro 1.11 Object Container File spec
(public: https://avro.apache.org/docs/1.11.1/specification/) for FLAT
RECORD schemas — the shape stage files loaded into tables have:

- primitives: null, boolean, int, long, float, double, bytes, string
- nullable fields as ``["null", T]`` / ``[T, "null"]`` unions
- logical types date (int), timestamp-micros / timestamp-millis (long),
  decimal is surfaced as its underlying bytes (documented)
- codecs: ``null`` and ``deflate`` (raw zlib, both directions)

SCALE NOTE: this codec is the in-sandbox fallback and runs on the
DRIVER (COPY stage files are driver-local in this emulator, exactly
like the reference's per-file loads). ``CopyProcessor._read_avro``
tries ``spark.read.format("avro")`` FIRST, so a deployment that ships
the spark-avro jar gets the fully distributed JVM path with no code
change here.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint decode."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else ((-n) << 1) - 1


def _write_varlong(out: bytearray, value: int) -> None:
    n = _zigzag(value)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_varlong(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------

def _field_type(t) -> tuple[str, bool, str | None]:
    """Return (primitive_name, nullable, logical_type) for a field's
    schema node; raises on nested records/arrays/maps (flat rows only,
    matching what COPY can land in a table)."""
    nullable = False
    logical = None
    if isinstance(t, list):  # union
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or len(t) > 2:
            raise NotImplementedError(f"unsupported Avro union: {t}")
        nullable = len(non_null) != len(t)
        t = non_null[0]
    if isinstance(t, dict):
        logical = t.get("logicalType")
        t = t.get("type")
    if t in ("record", "array", "map", "enum", "fixed"):
        raise NotImplementedError(
            f"nested Avro type '{t}' is not supported for COPY loads "
            "(flat record rows only)")
    if t not in ("null", "boolean", "int", "long", "float", "double",
                 "bytes", "string"):
        raise NotImplementedError(f"unsupported Avro type: {t}")
    return t, nullable, logical


def _decode_value(buf: io.BytesIO, prim: str, logical: str | None):
    if prim == "null":
        return None
    if prim == "boolean":
        return buf.read(1) == b"\x01"
    if prim in ("int", "long"):
        v = _read_long(buf)
        if logical == "date":
            import datetime

            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        if logical in ("timestamp-micros", "timestamp-millis"):
            import datetime

            micros = v if logical == "timestamp-micros" else v * 1_000
            return (datetime.datetime(1970, 1, 1)
                    + datetime.timedelta(microseconds=micros))
        return v
    if prim == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if prim == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if prim == "bytes":
        return bytearray(_read_bytes(buf))
    if prim == "string":
        return _read_bytes(buf).decode("utf-8")
    raise NotImplementedError(prim)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def read_ocf(path: str) -> tuple[list[tuple[str, str, bool]], list[tuple]]:
    """Read an Avro Object Container File.

    Returns ``(fields, rows)`` where fields is a list of
    ``(name, primitive_type, nullable)`` and rows are Python tuples.
    """
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{os.path.basename(path)} is not an Avro "
                         "object container file (bad magic)")
    # file metadata map: blocks of (count, k/v pairs), 0-terminated
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:  # spec: negative count is followed by byte size
            _read_long(buf)
            count = -count
        for _ in range(count):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"unsupported Avro codec: {codec}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    if schema.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    fields: list[tuple[str, str, bool]] = []
    decoders: list[tuple] = []
    for fld in schema["fields"]:
        prim, nullable, logical = _field_type(fld["type"])
        raw = fld["type"]
        null_first = isinstance(raw, list) and raw and raw[0] == "null"
        fields.append((fld["name"], prim, nullable))
        decoders.append((prim, nullable, logical, null_first,
                         isinstance(raw, list)))
    rows: list[tuple] = []
    while buf.tell() < len(data):
        n_records = _read_long(buf)
        block_len = _read_long(buf)
        block = buf.read(block_len)
        if buf.read(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            row = []
            for prim, nullable, logical, null_first, is_union in decoders:
                if is_union:
                    idx = _read_long(bbuf)
                    is_null = (idx == 0) == null_first
                    if is_null:
                        row.append(None)
                        continue
                row.append(_decode_value(bbuf, prim, logical))
            rows.append(tuple(row))
    return fields, rows


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean", "int": "int", "integer": "int", "smallint": "int",
    "tinyint": "int", "bigint": "long", "long": "long", "float": "float",
    "double": "double", "string": "string", "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "timestamp-micros"},
}


def _encode_value(out: bytearray, v, prim) -> None:
    logical = None
    if isinstance(prim, dict):
        logical = prim.get("logicalType")
        prim = prim["type"]
    if prim == "boolean":
        out.append(1 if v else 0)
    elif prim in ("int", "long"):
        if logical == "date":
            import datetime

            v = (v - datetime.date(1970, 1, 1)).days
        elif logical == "timestamp-micros":
            import calendar

            v = (calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond)
        _write_varlong(out, int(v))
    elif prim == "float":
        out.extend(struct.pack("<f", float(v)))
    elif prim == "double":
        out.extend(struct.pack("<d", float(v)))
    elif prim == "bytes":
        _write_bytes(out, bytes(v))
    elif prim == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    else:
        raise NotImplementedError(f"unsupported Avro write type: {prim}")


def write_ocf(path: str, names: list[str], spark_types: list[str],
              rows, codec: str = "deflate",
              record_name: str = "row") -> int:
    """Write rows (iterable of tuples) as an Avro OCF with an all-
    nullable flat record schema derived from Spark simple type names.
    Returns the number of records written."""
    avro_fields = []
    prims = []
    for name, st in zip(names, spark_types):
        base = st.split("(")[0].lower()
        at = _SPARK_TO_AVRO.get(base)
        if at is None:
            if base == "decimal":
                at = "double"  # documented narrowing for the fallback path
            else:
                at = "string"
        avro_fields.append({"name": name, "type": ["null", at]})
        prims.append(at)
    schema = {"type": "record", "name": record_name, "fields": avro_fields}
    sync = os.urandom(16)
    header = bytearray()
    header.extend(_MAGIC)
    _write_varlong(header, 2)  # metadata map: one block, two entries
    _write_bytes(header, b"avro.schema")
    _write_bytes(header, json.dumps(schema).encode("utf-8"))
    _write_bytes(header, b"avro.codec")
    _write_bytes(header, codec.encode())
    _write_varlong(header, 0)  # end of metadata map
    header.extend(sync)

    body = bytearray()
    n = 0
    for row in rows:
        for v, prim in zip(row, prims):
            if v is None:
                _write_varlong(body, 0)  # union branch: null (index 0)
            else:
                _write_varlong(body, 1)
                _encode_value(body, v, prim)
        n += 1
    block = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        block = comp.compress(block) + comp.flush()
    out = bytearray(header)
    if n:
        _write_varlong(out, n)
        _write_varlong(out, len(block))
        out.extend(block)
        out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
    return n
