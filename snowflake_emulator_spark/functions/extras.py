"""Snowflake scalar functions with no Spark builtin equivalent:
SOUNDEX_P123 and GET_IGNORE_CASE.

Both are Arrow-batched pandas UDFs (same pattern as
``textsim.jarowinkler_similarity``): inherently per-row string/JSON
kernels, vectorized at the batch boundary. Neither sits on a declared
hot path — GET_IGNORE_CASE is a metadata-access convenience, and
phonetic encoding is a short-string kernel that amortizes over Arrow
batches at scale.

Reference behavior contracts (public Snowflake docs):
- ``SOUNDEX`` (Spark's builtin matches Snowflake: 'Pfister' -> 'P236',
  adjacent same-code letters collapse *including* against the first
  letter).
- ``SOUNDEX_P123`` is identical EXCEPT when the second letter encodes
  to the same digit as the first letter: SOUNDEX drops it,
  SOUNDEX_P123 keeps it — 'Pfister' -> 'P123' (hence the name).
- ``GET_IGNORE_CASE(v, 'key')`` is GET with case-insensitive
  first-level key lookup over an OBJECT; exact-case match wins when
  present, else the first case-insensitive match in key order. Output
  convention matches our GET/GET_PATH (``get_json_object``): string
  values come back unquoted, everything else as compact JSON text.
"""

from __future__ import annotations

import json

import pandas as pd

_SOUNDEX_CODE = {}
for digit, letters in (
    ("1", "BFPV"), ("2", "CGJKQSXZ"), ("3", "DT"),
    ("4", "L"), ("5", "MN"), ("6", "R"),
):
    for ch in letters:
        _SOUNDEX_CODE[ch] = digit
# H and W are transparent (the classic H/W rule: letters separated
# only by H/W still collapse); vowels break a run but emit nothing.
_TRANSPARENT = {"H", "W"}


def soundex_p123(s: str) -> str:
    """Soundex keeping the second letter's code even when it matches
    the first letter's code ('Pfister' -> 'P123'). Mirrors Spark/
    Snowflake SOUNDEX in every other respect, including the H/W
    transparency rule and non-alpha passthrough (Spark's soundex
    returns the input unchanged when it does not start with a
    letter)."""
    if not s:
        return s
    up = s.upper()
    first = up[0]
    if not ("A" <= first <= "Z"):
        return s
    out = [first]
    # The P123 variant: the previous code starts EMPTY, so a second
    # letter sharing the first letter's code is still emitted. The
    # classic variant seeds prev with the first letter's code instead.
    prev = ""
    for ch in up[1:]:
        if not ("A" <= ch <= "Z"):
            prev = ""
            continue
        if ch in _TRANSPARENT:
            continue  # transparent: do not reset the run
        code = _SOUNDEX_CODE.get(ch)
        if code is None:  # vowel: breaks the run, emits nothing
            prev = ""
            continue
        if code != prev:
            out.append(code)
            if len(out) == 4:
                break
        prev = code
    return "".join(out).ljust(4, "0")


def get_ignore_case(variant: str, key: str) -> str | None:
    """Case-insensitive first-level OBJECT key lookup over VARIANT
    (JSON text). Exact-case match first, then first lower-equal match
    in document key order; None for non-objects / absent keys."""
    if variant is None or key is None:
        return None
    try:
        obj = json.loads(variant)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    if key in obj:
        val = obj[key]
    else:
        folded = key.lower()
        for k, v in obj.items():
            if k.lower() == folded:
                val = v
                break
        else:
            return None
    if val is None:
        return None
    if isinstance(val, str):
        return val  # match get_json_object: strings come back unquoted
    return json.dumps(val, separators=(",", ":"))


def register_extras(spark) -> None:
    """Idempotently register soundex_p123 and get_ignore_case."""
    if getattr(spark, "_sf_extras_registered", False):
        return
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _soundex_p123(col: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else soundex_p123(str(v)) for v in col],
            dtype="object")

    @pandas_udf("string")
    def _get_ignore_case(v: pd.Series, k: pd.Series) -> pd.Series:
        return pd.Series(
            [get_ignore_case(a, b) for a, b in zip(v, k)], dtype="object")

    spark.udf.register("soundex_p123", _soundex_p123)
    spark.udf.register("get_ignore_case", _get_ignore_case)
    spark._sf_extras_registered = True
