"""r8b scalar/table-function family: PARSE_URL, UNIFORM/RANDSTR/NORMAL,
APPROX_TOP_K, COLLATE (postfix + function form), STRTOK_SPLIT_TO_TABLE,
SOUNDEX_P123, GET_IGNORE_CASE.

Behavior contracts are public Snowflake docs; the reference implements
none of these (beyond-reference additions to the translator surface,
/root/reference/pkg/query/translator.go is the scope being extended).
"""

import pytest

from snowflake_emulator_spark.functions.extras import (
    get_ignore_case,
    soundex_p123,
)
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.plans.translator import Translator, _spark_collation

from conftest import SF_DIR


@pytest.fixture(autouse=True)
def _views(spark):
    load_views(spark, SF_DIR)


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


# -- PARSE_URL --------------------------------------------------------------

def test_parse_url_full(engine):
    [(v,)] = rows(engine, "SELECT PARSE_URL('https://ex.com:8080/p/q?a=1&b=2#frag') AS u")
    assert v == (
        '{"fragment":"frag","host":"ex.com",'
        '"parameters":{"a":"1","b":"2"},"path":"p/q","port":"8080",'
        '"query":"a=1&b=2","scheme":"https"}'
    )


def test_parse_url_minimal_keeps_null_keys(engine):
    # absent parts stay as explicit nulls (Snowflake keeps all 7 keys)
    [(v,)] = rows(engine, "SELECT PARSE_URL('mailto:x') AS u")
    assert v == (
        '{"fragment":null,"host":null,"parameters":null,"path":null,'
        '"port":null,"query":null,"scheme":"mailto"}'
    )


# -- RANDOM-generator family ------------------------------------------------

def test_uniform_inclusive_bounds_and_seed(engine):
    [(lo, hi, rep)] = rows(engine, """
        SELECT MIN(u) AS lo, MAX(u) AS hi,
               COUNT_IF(u2 = u2r) AS rep
        FROM (SELECT UNIFORM(1, 3, RANDOM()) AS u,
                     UNIFORM(1, 100000, RANDOM(42)) AS u2,
                     UNIFORM(1, 100000, RANDOM(42)) AS u2r
              FROM lineitem LIMIT 400)
    """)
    # inclusive both ends: P(miss over 400 draws of 1..3) ~ 0
    assert (lo, hi) == (1, 3)
    assert rep == 400  # same seed -> identical stream per row


def test_randstr_shape(engine):
    [(n_ok,)] = rows(engine, """
        SELECT COUNT_IF(r RLIKE '^[A-Za-z0-9]{16}$') AS n_ok
        FROM (SELECT RANDSTR(16, RANDOM()) AS r FROM orders LIMIT 100)
    """)
    assert n_ok == 100


def test_normal_moments(engine):
    [(m, s)] = rows(engine, """
        SELECT AVG(z) AS m, STDDEV(z) AS s
        FROM (SELECT NORMAL(10, 2, RANDOM(7)) AS z FROM lineitem LIMIT 2000)
    """)
    assert abs(m - 10) < 0.5 and abs(s - 2) < 0.5


# -- APPROX_TOP_K -----------------------------------------------------------

def test_approx_top_k_json_shape(engine):
    [(v,)] = rows(engine, """
        SELECT APPROX_TOP_K(x, 2) AS t
        FROM (SELECT 'a' AS x UNION ALL SELECT 'a' UNION ALL SELECT 'a'
              UNION ALL SELECT 'b' UNION ALL SELECT 'b' UNION ALL SELECT 'c')
    """)
    # VARIANT array of [value, count] pairs, most frequent first;
    # strings JSON-quoted, counts bare
    assert v == '[["a",3],["b",2]]'


def test_approx_top_k_numeric_items_unquoted(engine):
    [(v,)] = rows(engine, """
        SELECT APPROX_TOP_K(x, 1) AS t
        FROM (SELECT 5 AS x UNION ALL SELECT 5 UNION ALL SELECT 9)
    """)
    assert v == "[[5,2]]"


# -- COLLATE ----------------------------------------------------------------

def test_collate_postfix_and_function(engine):
    [(a, b, c)] = rows(engine, """
        SELECT 'Abc' = 'ABC' COLLATE 'en-ci' AS a,
               COLLATE('abc', 'ci') = 'ABC' AS b,
               'abc' = 'ABC' AS c
    """)
    assert (a, b, c) == (True, True, False)


def test_collate_orders_case_insensitively(engine):
    got = rows(engine, """
        SELECT v FROM (SELECT 'b' AS v UNION ALL SELECT 'A' UNION ALL SELECT 'C')
        ORDER BY COLLATE(v, 'en-ci')
    """)
    assert [v for (v,) in got] == ["A", "b", "C"]


def test_collation_spec_mapping():
    assert _spark_collation("'utf8'") == "UTF8_BINARY"
    assert _spark_collation("en-ci") == "en_CI"
    assert _spark_collation("ci") == "UTF8_LCASE"
    assert _spark_collation("ci-ai") == "UNICODE_CI_AI"
    assert _spark_collation("de-ai") == "de_AI"
    assert _spark_collation("en-cs-as") == "en"
    with pytest.raises(ValueError):
        _spark_collation("en-ci-pi")  # punctuation-insensitive: unsupported
    with pytest.raises(ValueError):
        _spark_collation("upper")


# -- STRTOK_SPLIT_TO_TABLE --------------------------------------------------

def test_strtok_split_to_table_drops_empties(engine):
    got = rows(engine, """
        SELECT t.index, t.value
        FROM (SELECT 'a,b,,c;d' AS s) x, TABLE(STRTOK_SPLIT_TO_TABLE(x.s, ',;')) t
        ORDER BY t.index
    """)
    # delimiter is a SET of chars; empties dropped; index is 1-based
    # over the POST-drop sequence
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_split_to_table_keeps_empties(engine):
    got = rows(engine, """
        SELECT t.index, t.value
        FROM (SELECT 'a,b,,c' AS s) x, TABLE(SPLIT_TO_TABLE(x.s, ',')) t
        ORDER BY t.index
    """)
    assert got == [(1, "a"), (2, "b"), (3, ""), (4, "c")]


def test_split_to_table_bare_from_form(engine):
    # FROM TABLE(...) as the sole source (no preceding table)
    got = rows(engine, """
        SELECT t.value FROM TABLE(STRTOK_SPLIT_TO_TABLE('x y  z', ' ')) t
        ORDER BY t.index
    """)
    assert got == [("x",), ("y",), ("z",)]


def test_strtok_table_translation_shape():
    out = Translator().translate(
        "SELECT t.value FROM d, TABLE(STRTOK_SPLIT_TO_TABLE(d.s, ',;')) t")
    assert "posexplode(filter(split(d.s, '[,;]'), x -> x != ''))" in out
    assert "JOIN LATERAL" in out


# -- SOUNDEX_P123 / GET_IGNORE_CASE ----------------------------------------

def test_soundex_p123_vs_soundex(engine):
    [(p, s)] = rows(engine,
                    "SELECT SOUNDEX_P123('Pfister') AS p, SOUNDEX('Pfister') AS s")
    # second letter sharing the first letter's code: P123 keeps it,
    # classic soundex drops it
    assert (p, s) == ("P123", "P236")


@pytest.mark.parametrize("name,code", [
    ("Robert", "R163"), ("Rupert", "R163"), ("Tymczak", "T522"),
    ("Ashcraft", "A261"),  # H/W transparency: s-c collapse across H
    ("Honeyman", "H555"), ("", ""), ("123", "123"),
])
def test_soundex_p123_vectors(name, code):
    assert soundex_p123(name) == code


def test_get_ignore_case_semantics(engine):
    got = rows(engine, """
        SELECT GET_IGNORE_CASE(PARSE_JSON('{"Key":"Val","KEY":"V2","k2":5}'), 'KEY') AS exact,
               GET_IGNORE_CASE(PARSE_JSON('{"Key":"Val","k2":5}'), 'kEy') AS ci,
               GET_IGNORE_CASE(PARSE_JSON('{"Key":"Val","k2":5}'), 'K2') AS num,
               GET_IGNORE_CASE(PARSE_JSON('[1,2]'), 'x') AS arr,
               GET_IGNORE_CASE(PARSE_JSON('{"a":1}'), 'b') AS absent
    """)
    # exact-case match wins; else first ci match in key order; numbers
    # come back as compact JSON; non-objects/absent keys -> NULL
    assert got == [("V2", "Val", "5", None, None)]


def test_get_ignore_case_unit():
    assert get_ignore_case('{"a":{"b":1}}', "A") == '{"b":1}'
    assert get_ignore_case("not json", "a") is None
    assert get_ignore_case(None, "a") is None
    assert get_ignore_case('{"a":null}', "a") is None


def test_initcap_delimiter_form(spark):
    """r10: INITCAP(expr, delimiters) — only characters in the set
    start words; NULL delimiters capitalizes the first char only."""
    from snowflake_emulator_spark.plans.translator import translate

    def q(expr):
        return spark.sql(translate(f"SELECT {expr} AS r")).collect()[0][0]

    assert q("INITCAP('the sky  is-blue', ' ')") == "The Sky  Is-blue"
    assert q("INITCAP('the sky  is-blue', '-')") == "The sky  is-Blue"
    assert q("INITCAP('TEST', '')") == "Test"
    assert q("INITCAP('one two-three', CAST(NULL AS STRING))") == "One two-three"
