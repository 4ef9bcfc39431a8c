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

    @pandas_udf("string")
    def _sf_regexp_replace(subj: pd.Series, pat: pd.Series, rep: pd.Series,
                           pos: pd.Series, occ: pd.Series,
                           prm: pd.Series) -> pd.Series:
        return pd.Series([
            sf_regexp_replace_py(a, b, c, d, e, f)
            for a, b, c, d, e, f in zip(subj, pat, rep, pos, occ, prm)])

    @pandas_udf("long")
    def _sf_regexp_instr(subj: pd.Series, pat: pd.Series, pos: pd.Series,
                         occ: pd.Series, opt: pd.Series, prm: pd.Series,
                         grp: pd.Series) -> pd.Series:
        return pd.Series([
            sf_regexp_instr_py(a, b, c, d, e, f, g)
            for a, b, c, d, e, f, g in zip(subj, pat, pos, occ, opt,
                                           prm, grp)],
            dtype="object")

    spark.udf.register("soundex_p123", _soundex_p123)
    spark.udf.register("get_ignore_case", _get_ignore_case)
    spark.udf.register("sf_regexp_replace", _sf_regexp_replace)
    spark.udf.register("sf_regexp_instr", _sf_regexp_instr)
    spark._sf_extras_registered = True


# ---------------------------------------------------------------------
# r10: full-surface REGEXP_REPLACE / REGEXP_INSTR kernels. The common
# argument forms stay pure Spark SQL (translator fast paths); only the
# occurrence/option/group_num forms Spark cannot express route here —
# cold path by construction, Arrow-batched like every other UDF.
# Semantics per public Snowflake docs:
# - parameters: 'c' case-sensitive (default) / 'i' insensitive (last
#   one wins), 's' dot-matches-newline, 'm' multi-line; 'e' (extract)
#   defaults REGEXP_INSTR's group_num to 1 when it is omitted (r11).
# - position < 1 raises (Snowflake: invalid-argument error) instead of
#   silently slicing from the string's end (r11).
# - REGEXP_REPLACE occurrence: 0 = all (default), N = only the Nth
#   match at/after position; backreferences \\1..\\9 in replacement.
# - REGEXP_INSTR returns the 1-based start (option=0) or end+1
#   (option=1) of the occurrence-th match, 0 when absent; group_num
#   addresses a capture group's span.
# ---------------------------------------------------------------------

import re as _re_mod


def _sf_re_flags(params: str | None) -> int:
    flags = 0
    ci = False
    for ch in (params or "c").lower():
        if ch == "i":
            ci = True
        elif ch == "c":
            ci = False
        elif ch == "s":
            flags |= _re_mod.DOTALL
        elif ch == "m":
            flags |= _re_mod.MULTILINE
    return flags | (_re_mod.IGNORECASE if ci else 0)


def sf_regexp_replace_py(subject, pattern, repl, pos, occ, params):
    if subject is None or pattern is None:
        return None
    pos = 1 if pos is None else int(pos)
    if pos < 1:
        raise ValueError(
            f"Invalid argument: REGEXP_REPLACE position must be >= 1, "
            f"got {pos}")
    occ = 0 if occ is None else int(occ)
    repl = "" if repl is None else str(repl)
    rx = _re_mod.compile(str(pattern), _sf_re_flags(params))
    prefix, body = str(subject)[: pos - 1], str(subject)[pos - 1:]
    if occ == 0:
        return prefix + rx.sub(lambda m: m.expand(repl), body)
    n = 0

    def one(m):
        nonlocal n
        n += 1
        return m.expand(repl) if n == occ else m.group(0)

    return prefix + rx.sub(one, body)


def sf_regexp_instr_py(subject, pattern, pos, occ, option, params, group):
    if subject is None or pattern is None:
        return None
    pos = 1 if pos is None else int(pos)
    if pos < 1:
        raise ValueError(
            f"Invalid argument: REGEXP_INSTR position must be >= 1, "
            f"got {pos}")
    occ = 1 if occ is None else int(occ)
    option = 0 if option is None else int(option)
    if group is None or pd.isna(group):
        # group_num omitted (NULL sentinel from the translator; NaN
        # after Arrow null transport): 'e' (extract) defaults it to
        # capture group 1 (Snowflake semantics, r11); else full match
        group = 1 if "e" in (params or "").lower() else 0
    else:
        group = int(group)
    rx = _re_mod.compile(str(pattern), _sf_re_flags(params))
    body = str(subject)[pos - 1:]
    for i, m in enumerate(rx.finditer(body), 1):
        if i == occ:
            try:
                st, en = m.span(group) if group > 0 else m.span()
            except (IndexError, _re_mod.error):
                return 0
            if st < 0:  # group did not participate in the match
                return 0
            return (pos - 1) + (en if option else st) + 1
    return 0
