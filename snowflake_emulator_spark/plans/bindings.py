"""Positional / qmark binding substitution.

Port of the reference's literal-substitution pre-pass
(`/root/reference/pkg/query/executor.go:134-280`): bindings arrive as
``{"1": {"type": "TEXT", "value": "x"}}`` (named positional ``:N``) or
are applied in order to ``?`` placeholders. Values are validated and
quoted per type — TEXT escapes ``''``, numbers are parse-checked,
DATE/TIME/TIMESTAMP are regex-validated and emitted as typed literals —
and ``:N`` substitution runs in descending key order so ``:1`` does not
clobber ``:10`` (executor.go:154-160).

Spark 3.4+ offers ``spark.sql(sql, args=...)`` server-side parameters;
we keep literal substitution to reproduce the reference's validation
error surface, but the executor can route through either.
"""

from __future__ import annotations

import re

from .. import errors

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TIME_RE = re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$")
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def format_binding_value(btype: str, value) -> str:
    """Render one typed binding as a SQL literal
    (cf. executor.go:219-280)."""
    t = (btype or "TEXT").upper()
    if value is None:
        return "NULL"
    s = str(value)
    if t in ("TEXT", "VARCHAR", "CHAR", "STRING"):
        return "'" + s.replace("'", "''") + "'"
    if t in ("FIXED", "INTEGER", "INT", "BIGINT", "NUMBER"):
        if not _INT_RE.match(s):
            raise errors.invalid_parameter(f"invalid integer binding value: {s!r}")
        return s
    if t in ("REAL", "FLOAT", "DOUBLE"):
        if not _FLOAT_RE.match(s):
            raise errors.invalid_parameter(f"invalid float binding value: {s!r}")
        return s
    if t == "BOOLEAN":
        low = s.lower()
        if low not in ("true", "false", "0", "1"):
            raise errors.invalid_parameter(f"invalid boolean binding value: {s!r}")
        return "TRUE" if low in ("true", "1") else "FALSE"
    if t == "DATE":
        if not _DATE_RE.match(s):
            raise errors.invalid_parameter(f"invalid date binding value: {s!r}")
        return f"DATE '{s}'"
    if t == "TIME":
        if not _TIME_RE.match(s):
            raise errors.invalid_parameter(f"invalid time binding value: {s!r}")
        return f"'{s}'"  # TIME stored as text (SURVEY §1.3)
    if t in ("TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ", "TIMESTAMP_TZ", "DATETIME"):
        if not _TS_RE.match(s):
            raise errors.invalid_parameter(f"invalid timestamp binding value: {s!r}")
        return f"TIMESTAMP '{s.replace('T', ' ')}'"
    # default: treat as text
    return "'" + s.replace("'", "''") + "'"


def apply_bindings(sql: str, bindings: dict[str, dict] | None) -> str:
    """Substitute ``:N`` (descending key order) then ``?`` (in order)."""
    if not bindings:
        return sql
    numeric = sorted((int(k) for k in bindings if str(k).isdigit()), reverse=True)
    for k in numeric:
        b = bindings[str(k)]
        lit = format_binding_value(b.get("type", "TEXT"), b.get("value"))
        sql = re.sub(rf":{k}\b", lit.replace("\\", "\\\\"), sql)
    if "?" in sql:
        ordered = [bindings[k] for k in sorted(bindings, key=lambda x: int(x) if str(x).isdigit() else 0)]
        parts = _split_on_qmarks(sql)
        out = [parts[0]]
        for i, part in enumerate(parts[1:]):
            if i < len(ordered):
                b = ordered[i]
                out.append(format_binding_value(b.get("type", "TEXT"), b.get("value")))
            else:
                out.append("?")
            out.append(part)
        sql = "".join(out)
    return sql


def _split_on_qmarks(sql: str) -> list[str]:
    """Split on ``?`` placeholders outside string literals."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(sql[i : j + 1])
            i = j + 1
            continue
        if c == "?":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts
