"""Differential-fuzz expression generator (r5 verdict item 10).

Generates random Snowflake-dialect scalar expressions per translator
function family, each paired with its DuckDB-oracle equivalent; the
runner executes both over the same parquet fixtures and compares
normalized results. This institutionalizes the per-batch manual sweeps
that caught SPLIT's regex-delimiter bug and the reversed 2-arg TRIM in
r5 — every template below is a (snowflake, duckdb) semantic pair, and
randomized arguments probe corners a hand-written golden list misses.

Deterministic: the pytest entry uses a FIXED seed so CI is stable;
``scratch/fuzz_differential.py`` runs open-ended with any seed.

Columns (sf0.001 fixtures): customer(c_custkey BIGINT, c_name VARCHAR,
c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR),
orders(o_orderkey, o_orderstatus, o_totalprice, o_orderdate TIMESTAMP,
o_orderpriority).
"""

from __future__ import annotations

import random

# string columns / numeric columns / timestamp column on the ORDERS x
# CUSTOMER probe row set defined by the runner
_STR_COLS = ["c_name", "c_mktsegment", "o_orderpriority", "o_orderstatus"]
_NUM_COLS = ["c_custkey", "c_nationkey", "o_orderkey"]
_FLOAT_COLS = ["c_acctbal", "o_totalprice"]
_TS_COL = "o_orderdate"

# safe literal pools (no regex metacharacters where the template
# treats the literal as a plain string; patterns drawn separately)
_WORDS = ["Customer", "BUILDING", "aa", "0", " x ", "#", "-", "é", ""]
_CHARS = ["a", "e", "0", "#", " ", "C"]
# no bare backslashes here: Snowflake AND Spark process string-literal
# escapes ('\d' collapses to 'd') while DuckDB keeps them — the
# dedicated escaped-digit template below covers that semantic on
# purpose with correctly doubled backslashes on the Snowflake side
_PATTERNS = ["[0-9]+", "[A-Z][a-z]+", "e+", "o.", "[aeiou]", "#[0-9]*"]
_DATE_PARTS = ["year", "quarter", "month", "week", "day", "hour"]

# Each template: (family, snowflake_sql, duckdb_sql, arggen)
# arggen(rng) -> dict of substitutions applied to BOTH sides.


def _n(rng):
    return rng.choice([0, 1, 2, 3, 5, 7, 10, -1, -3])


def _pos(rng):
    return rng.choice([1, 2, 3, 4, 7])


TEMPLATES = [
    # ---- conditional family -------------------------------------------
    ("cond", "IFF({nc} % {m} = 0, '{w}', {sc})",
     "CASE WHEN {nc} % {m} = 0 THEN '{w}' ELSE {sc} END",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": r.choice([2, 3, 5]),
                "w": r.choice(_WORDS), "sc": r.choice(_STR_COLS)}),
    ("cond", "NVL(NULLIF({sc}, '{w}'), 'fallback')",
     "coalesce(nullif({sc}, '{w}'), 'fallback')",
     lambda r: {"sc": r.choice(_STR_COLS), "w": r.choice(_WORDS)}),
    ("cond", "NVL2(NULLIF({sc}, '{w}'), 'have', 'none')",
     "CASE WHEN nullif({sc}, '{w}') IS NOT NULL THEN 'have' ELSE 'none' END",
     lambda r: {"sc": r.choice(_STR_COLS), "w": r.choice(_WORDS)}),
    ("cond", "ZEROIFNULL(NULLIF({nc} % {m}, 0))",
     "coalesce(nullif({nc} % {m}, 0), 0)",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": r.choice([2, 3, 4])}),
    ("cond", "DECODE({nc} % 3, 0, 'zero', 1, 'one', 'other')",
     "CASE WHEN {nc} % 3 = 0 THEN 'zero' WHEN {nc} % 3 = 1 THEN 'one' "
     "ELSE 'other' END",
     lambda r: {"nc": r.choice(_NUM_COLS)}),
    ("cond", "GREATEST({nc} % 11, {m}, 4)", "greatest({nc} % 11, {m}, 4)",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": _n(r)}),
    ("cond", "LEAST({nc} % 11, {m})", "least({nc} % 11, {m})",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": _n(r)}),
    # ---- string family ------------------------------------------------
    ("string", "SUBSTR({sc}, {p}, {ln})", "substr({sc}, {p}, {ln})",
     lambda r: {"sc": r.choice(_STR_COLS), "p": _pos(r), "ln": r.choice([1, 2, 5, 30])}),
    ("string", "LPAD({sc}, {ln}, '{ch}')", "lpad({sc}, {ln}, '{ch}')",
     lambda r: {"sc": r.choice(_STR_COLS), "ln": r.choice([3, 8, 15]),
                "ch": r.choice(["*", "ab", "0"])}),
    ("string", "RPAD({sc}, {ln}, '{ch}')", "rpad({sc}, {ln}, '{ch}')",
     lambda r: {"sc": r.choice(_STR_COLS), "ln": r.choice([3, 8, 15]),
                "ch": r.choice(["*", "ab", "0"])}),
    ("string", "REPEAT('{ch}', CAST({nc} % 4 AS INTEGER))",
     "repeat('{ch}', CAST({nc} % 4 AS INTEGER))",
     lambda r: {"ch": r.choice(_CHARS), "nc": r.choice(_NUM_COLS)}),
    ("string", "REVERSE({sc})", "reverse({sc})",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    # Snowflake INITCAP capitalizes after EVERY non-alphanumeric (not
    # just whitespace — r6 translator rewrite); the oracle replays the
    # per-char rule as a correlated subquery
    ("string", "INITCAP({sc})",
     "(SELECT coalesce(string_agg(CASE WHEN t.i = 1 OR NOT regexp_matches("
     "substr(lower({sc}), CAST(t.i AS INTEGER) - 1, 1), '[a-z0-9]') "
     "THEN upper(substr(lower({sc}), CAST(t.i AS INTEGER), 1)) "
     "ELSE substr(lower({sc}), CAST(t.i AS INTEGER), 1) END, '' "
     "ORDER BY t.i), '') FROM range(1, 65) t(i) "
     "WHERE t.i <= length({sc}))",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    ("string", "TRANSLATE({sc}, 'aeo', 'AE')",
     "translate({sc}, 'aeo', 'AE')",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    ("string", "SPLIT_PART({sc}, '{ch}', {p})",
     "split_part({sc}, '{ch}', {p})",
     lambda r: {"sc": r.choice(_STR_COLS), "ch": r.choice(["#", " ", "e"]),
                "p": _pos(r)}),
    ("string", "TRIM({sc}, '{ch}')", "trim({sc}, '{ch}')",
     lambda r: {"sc": r.choice(_STR_COLS), "ch": r.choice(["Ce", "# ", "0"])}),
    ("string", "LTRIM({sc}, '{ch}')", "ltrim({sc}, '{ch}')",
     lambda r: {"sc": r.choice(_STR_COLS), "ch": r.choice(["C", "# ", "0"])}),
    ("string", "RTRIM({sc}, '{ch}')", "rtrim({sc}, '{ch}')",
     lambda r: {"sc": r.choice(_STR_COLS), "ch": r.choice(["e", "# ", "0"])}),
    ("string", "STARTSWITH({sc}, '{w}')", "starts_with({sc}, '{w}')",
     lambda r: {"sc": r.choice(_STR_COLS), "w": r.choice(["C", "BU", ""])}),
    ("string", "ENDSWITH({sc}, '{w}')", "ends_with({sc}, '{w}')",
     lambda r: {"sc": r.choice(_STR_COLS), "w": r.choice(["G", "e", ""])}),
    ("string", "POSITION('{ch}', {sc})", "strpos({sc}, '{ch}')",
     lambda r: {"ch": r.choice(_CHARS), "sc": r.choice(_STR_COLS)}),
    ("string", "LEN(CONCAT({sc}, '{w}'))", "length(concat({sc}, '{w}'))",
     lambda r: {"sc": r.choice(_STR_COLS), "w": r.choice(_WORDS)}),
    ("string", "INSERT({sc}, {p}, {ln}, '{w}')",
     "concat(substr({sc}, 1, {p} - 1), '{w}', substr({sc}, {p} + {ln}))",
     lambda r: {"sc": r.choice(_STR_COLS), "p": _pos(r),
                "ln": r.choice([0, 1, 3]), "w": r.choice(["XX", "-"])}),
    # ---- numeric family ----------------------------------------------
    ("numeric", "ROUND({fc}, {d})", "round({fc}, {d})",
     lambda r: {"fc": r.choice(_FLOAT_COLS), "d": r.choice([0, 1, 2])}),
    ("numeric", "TRUNC({fc})", "trunc({fc})",
     lambda r: {"fc": r.choice(_FLOAT_COLS)}),
    ("numeric", "ABS({nc} - 1000)", "abs({nc} - 1000)",
     lambda r: {"nc": r.choice(_NUM_COLS)}),
    ("numeric", "SIGN({nc} - 1000)", "sign({nc} - 1000)",
     lambda r: {"nc": r.choice(_NUM_COLS)}),
    ("numeric", "MOD({nc}, {m})", "mod({nc}, {m})",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": r.choice([2, 7, 13])}),
    ("numeric", "ROUND(SQRT(ABS({fc})), 4)", "round(sqrt(abs({fc})), 4)",
     lambda r: {"fc": r.choice(_FLOAT_COLS)}),
    ("numeric", "ROUND(POWER({nc} % 9, {m}), 2)",
     "round(pow({nc} % 9, {m}), 2)",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": r.choice([0, 1, 2, 3])}),
    ("numeric", "FLOOR({fc} / {m})", "floor({fc} / {m})",
     lambda r: {"fc": r.choice(_FLOAT_COLS), "m": r.choice([3, 10, 100])}),
    ("numeric", "CEIL({fc} / {m})", "ceil({fc} / {m})",
     lambda r: {"fc": r.choice(_FLOAT_COLS), "m": r.choice([3, 10, 100])}),
    ("numeric", "DIV0({nc}, {nc2} % {m})",
     "CASE WHEN ({nc2} % {m}) = 0 THEN 0 ELSE {nc} / ({nc2} % {m}) END",
     lambda r: {"nc": r.choice(_NUM_COLS), "nc2": r.choice(_NUM_COLS),
                "m": r.choice([2, 3])}),
    ("numeric", "NULLIFZERO({nc} % {m})", "nullif({nc} % {m}, 0)",
     lambda r: {"nc": r.choice(_NUM_COLS), "m": r.choice([2, 4])}),
    # ---- date family --------------------------------------------------
    # DuckDB date_trunc returns DATE for day-and-above parts where
    # Spark returns TIMESTAMP — cast the oracle side up to align
    ("date", "DATE_TRUNC('{dp}', {ts})",
     "CAST(date_trunc('{dp}', {ts}) AS TIMESTAMP)",
     lambda r: {"dp": r.choice(_DATE_PARTS), "ts": _TS_COL}),
    ("date", "CAST(DATEADD(day, {m}, {ts}) AS DATE)",
     "CAST({ts} + INTERVAL ({m}) DAY AS DATE)",
     lambda r: {"m": _n(r), "ts": _TS_COL}),
    ("date", "CAST(DATEADD(month, {m}, CAST({ts} AS DATE)) AS DATE)",
     "CAST(CAST({ts} AS DATE) + to_months({m}) AS DATE)",
     lambda r: {"m": r.choice([1, 2, 6, 12, -1]), "ts": _TS_COL}),
    ("date", "DATEDIFF(day, CAST({ts} AS DATE), DATE '1998-01-01')",
     "datediff('day', CAST({ts} AS DATE), DATE '1998-01-01')",
     lambda r: {"ts": _TS_COL}),
    ("date", "DATEDIFF(month, CAST({ts} AS DATE), DATE '1998-06-15')",
     "datediff('month', CAST({ts} AS DATE), DATE '1998-06-15')",
     lambda r: {"ts": _TS_COL}),
    ("date", "DATEDIFF(year, CAST({ts} AS DATE), DATE '1999-02-03')",
     "datediff('year', CAST({ts} AS DATE), DATE '1999-02-03')",
     lambda r: {"ts": _TS_COL}),
    ("date", "YEAR({ts}) * 100 + MONTH({ts})",
     "year({ts}) * 100 + month({ts})",
     lambda r: {"ts": _TS_COL}),
    ("date", "DAYOFWEEK({ts})", "dayofweek({ts})",
     lambda r: {"ts": _TS_COL}),
    ("date", "DAYNAME({ts})", "strftime({ts}, '%a')",
     lambda r: {"ts": _TS_COL}),
    ("date", "MONTHNAME({ts})", "strftime({ts}, '%b')",
     lambda r: {"ts": _TS_COL}),
    ("date", "LAST_DAY(CAST({ts} AS DATE))", "last_day(CAST({ts} AS DATE))",
     lambda r: {"ts": _TS_COL}),
    ("date", "CAST(DATE_PART(day, {ts}) AS BIGINT)",
     "CAST(date_part('day', {ts}) AS BIGINT)",
     lambda r: {"ts": _TS_COL}),
    # ---- regexp family ------------------------------------------------
    ("regexp", "REGEXP_COUNT({sc}, '{pat}')",
     "len(regexp_extract_all({sc}, '{pat}'))",
     lambda r: {"sc": r.choice(_STR_COLS), "pat": r.choice(_PATTERNS)}),
    ("regexp", "NVL(REGEXP_SUBSTR({sc}, '{pat}'), '<none>')",
     "coalesce(nullif(regexp_extract({sc}, '{pat}', 0), ''), '<none>')",
     lambda r: {"sc": r.choice(_STR_COLS), "pat": r.choice(_PATTERNS)}),
    ("regexp", "REGEXP_REPLACE({sc}, '{pat}', '_')",
     "regexp_replace({sc}, '{pat}', '_', 'g')",
     lambda r: {"sc": r.choice(_STR_COLS), "pat": r.choice(_PATTERNS)}),
    ("regexp", "IFF(REGEXP_LIKE({sc}, '{pat}.*'), 1, 0)",
     "CASE WHEN regexp_full_match({sc}, '{pat}.*') THEN 1 ELSE 0 END",
     lambda r: {"sc": r.choice(_STR_COLS), "pat": r.choice(_PATTERNS)}),
    # escape semantics: Snowflake/Spark literals need '\\\\d' to reach
    # the regex engine as \d; DuckDB literals pass '\d' through as-is
    ("regexp", "REGEXP_COUNT({sc}, '\\\\d+')",
     "len(regexp_extract_all({sc}, '\\d+'))",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    # ---- textsim family -----------------------------------------------
    # low-similarity pairs on purpose: the Winkler prefix bonus only
    # applies above jaro 0.7 (r6 advice) — short substrings vs unrelated
    # words land on both sides of the threshold
    ("textsim", "JAROWINKLER_SIMILARITY(SUBSTR({sc}, {p}, {ln}), '{w}')",
     "CAST(round(jaro_winkler_similarity(lower(substr({sc}, {p}, {ln})), "
     "lower('{w}')) * 100) AS INTEGER)",
     lambda r: {"sc": r.choice(_STR_COLS), "p": _pos(r),
                "ln": r.choice([1, 2, 3, 5]),
                "w": r.choice(["zz", "qx#", "Customer", "eu", "9", "BUILD"])}),
    ("textsim", "EDITDISTANCE(SUBSTR({sc}, {p}, {ln}), '{w}')",
     "levenshtein(substr({sc}, {p}, {ln}), '{w}')",
     lambda r: {"sc": r.choice(_STR_COLS), "p": _pos(r),
                "ln": r.choice([1, 3, 6]),
                "w": r.choice(["zz", "Custom", "e", ""])}),
    # ---- codec family -------------------------------------------------
    ("codec", "MD5({sc})", "md5({sc})",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    ("codec", "SHA2({sc}, 256)", "sha256({sc})",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    ("codec", "BASE64_ENCODE({sc})", "to_base64(CAST({sc} AS BLOB))",
     lambda r: {"sc": r.choice(_STR_COLS)}),
    ("codec", "HEX_ENCODE({sc})", "upper(hex(CAST({sc} AS BLOB)))",
     lambda r: {"sc": r.choice(_STR_COLS)}),
]


def generate(seed: int, count: int) -> list[tuple[str, str, str]]:
    """Return ``count`` randomized (family, snow_expr, duck_expr)
    triples, deterministic for a given seed."""
    rng = random.Random(seed)
    out = []
    for _ in range(count):
        family, snow_t, duck_t, arggen = rng.choice(TEMPLATES)
        args = arggen(rng)
        out.append((family, snow_t.format(**args), duck_t.format(**args)))
    return out


# The probe row set: a deterministic 40-row join sample spanning NULLs
# is unnecessary — fixture columns are non-null; corner values come
# from NULLIF inside templates. One scan, tiny.
PROBE_SQL = (
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, "
    "o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    "FROM customer JOIN orders ON o_custkey = c_custkey "
    "WHERE o_orderkey <= 160 "
)


def normalize(v):
    """Engine-neutral value form: floats rounded (libm ulps), datetimes
    ISO-stringified, ints widened."""
    import datetime
    import decimal
    import math

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v
