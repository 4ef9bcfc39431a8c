"""r8c surface: array/object constant literals (``[...]`` / ``{...}``),
the mergeable HLL sketch family (HLL_ACCUMULATE / HLL_COMBINE /
HLL_ESTIMATE), VECTOR_* distance functions, and ARRAY_REMOVE_AT.

Behavior contracts are public Snowflake docs (constants:
"Working with arrays/objects"; sketches: HLL_ACCUMULATE et al.;
vectors: VECTOR_COSINE_SIMILARITY et al.). The reference implements
none of these — beyond-reference additions to the translator surface
(/root/reference/pkg/query/translator.go is the scope being extended).
"""

import json
import math

import pytest

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.plans.translator import Translator

from conftest import SF_DIR


@pytest.fixture(autouse=True)
def _views(spark):
    load_views(spark, SF_DIR)


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


# -- array / object constants ----------------------------------------------

def test_array_constant(engine):
    # arrays surface as native lists at the result layer (same shape
    # as ARRAY_CONSTRUCT, which `[...]` is sugar for)
    [(v,)] = rows(engine, "SELECT [1, 2, 3] AS a")
    assert list(v) == [1, 2, 3]


def test_array_constant_exprs_and_nesting(engine):
    [(a, n)] = rows(engine, "SELECT [1 + 1, 2 * 3] AS a, [[1], [2, 3]] AS n")
    assert list(a) == [2, 6]
    assert [list(x) for x in n] == [[1], [2, 3]]


def test_object_constant(engine):
    [(v,)] = rows(engine, "SELECT {'k': 1, 'arr': [1, 2]} AS o")
    assert json.loads(v) == {"k": 1, "arr": [1, 2]}


def test_object_constant_identifier_keys(engine):
    # unquoted and double-quoted keys are both Snowflake-legal
    [(v,)] = rows(engine, 'SELECT {k1: 7, "k 2": 8} AS o')
    assert json.loads(v) == {"k1": 7, "k 2": 8}


def test_mixed_subscript_and_constant(engine):
    # '[' after ']' is subscript access (0-based, Snowflake and Spark
    # agree), while the leading '[' is a constant
    [(v,)] = rows(engine, "SELECT [10, 20, 30][2] AS x")
    assert v == 30


def test_empty_object_and_array(engine):
    [(a, o)] = rows(engine, "SELECT [] AS a, {} AS o")
    assert list(a) == [] and json.loads(o) == {}


def test_braces_inside_string_untouched(engine):
    [(v,)] = rows(engine, "SELECT '[not an array] {x: 1}' AS s")
    assert v == "[not an array] {x: 1}"


def test_in_list_still_works(engine):
    # `IN (...)` uses parens; but ensure a '[' after IN keyword-space
    # contexts doesn't break ordinary predicates
    [(n,)] = rows(
        engine,
        "SELECT COUNT(*) AS n FROM region WHERE r_regionkey IN (0, 1)")
    assert n == 2


# -- HLL sketch family ------------------------------------------------------

def test_hll_accumulate_combine_estimate(engine):
    # two-level rollup: per-group sketches merged to a grand total —
    # the associative-merge pattern that scales to 100 TB
    [(est,)] = rows(engine, """
        SELECT HLL_ESTIMATE(HLL_COMBINE(s)) AS est
        FROM (SELECT HLL_ACCUMULATE(o_custkey) AS s
              FROM orders GROUP BY o_orderpriority)
    """)
    [(exact,)] = rows(
        engine, "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders")
    assert abs(est - exact) / exact < 0.05


def test_hll_estimate_single_level(engine):
    [(est,)] = rows(engine, """
        SELECT HLL_ESTIMATE(HLL_COMBINE(s)) AS est
        FROM (SELECT HLL_ACCUMULATE(l_partkey) AS s FROM lineitem)
    """)
    [(exact,)] = rows(
        engine, "SELECT COUNT(DISTINCT l_partkey) AS n FROM lineitem")
    assert abs(est - exact) / exact < 0.05


def test_hll_export_raises(engine):
    with pytest.raises(Exception, match="HLL_EXPORT"):
        engine.execute("SELECT HLL_EXPORT(HLL_ACCUMULATE(1))")


# -- VECTOR_* ---------------------------------------------------------------

def test_vector_inner_product(engine):
    [(v,)] = rows(
        engine, "SELECT VECTOR_INNER_PRODUCT([1, 2, 3], [4, 5, 6]) AS d")
    assert v == pytest.approx(32.0)


def test_vector_l2_distance(engine):
    [(v,)] = rows(
        engine, "SELECT VECTOR_L2_DISTANCE([0, 0], [3, 4]) AS d")
    assert v == pytest.approx(5.0)


def test_vector_cosine_similarity(engine):
    [(v,)] = rows(
        engine,
        "SELECT VECTOR_COSINE_SIMILARITY([1, 0], [1, 1]) AS c")
    assert v == pytest.approx(1 / math.sqrt(2))


def test_vector_cosine_on_embeddings_table(engine):
    # runs against the real embeddings parquet — array<float> column
    [(n,)] = rows(engine, """
        SELECT COUNT(*) AS n FROM (
            SELECT VECTOR_COSINE_SIMILARITY(embedding, embedding) AS c
            FROM embeddings LIMIT 50
        ) WHERE ABS(c - 1.0) < 1e-6
    """)
    assert n == 50


# -- ARRAY_REMOVE_AT --------------------------------------------------------

def test_array_remove_at(engine):
    [(v,)] = rows(engine, "SELECT ARRAY_REMOVE_AT([1, 2, 3], 1) AS a")
    assert list(v) == [1, 3]


def test_array_remove_at_negative(engine):
    [(v,)] = rows(engine, "SELECT ARRAY_REMOVE_AT([1, 2, 3], -1) AS a")
    assert list(v) == [1, 2]


def test_array_remove_at_out_of_range(engine):
    [(v,)] = rows(engine, "SELECT ARRAY_REMOVE_AT([1, 2, 3], 9) AS a")
    assert list(v) == [1, 2, 3]


def test_array_remove_at_null_pos(engine):
    [(v,)] = rows(
        engine, "SELECT ARRAY_REMOVE_AT([1, 2], CAST(NULL AS INT)) AS a")
    assert v is None


# -- VARIANT subscripts -----------------------------------------------------

def test_parse_json_int_subscript(engine):
    [(v,)] = rows(engine, "SELECT PARSE_JSON('[5,6,7]')[1] AS x")
    assert json.loads(v) == 6


def test_parse_json_key_then_index(engine):
    [(v,)] = rows(
        engine,
        """SELECT PARSE_JSON('{"k": [10, 11]}')['k'][1] AS x""")
    assert json.loads(v) == 11


def test_object_construct_subscript(engine):
    [(v,)] = rows(engine, "SELECT OBJECT_CONSTRUCT('a', 41 + 1)['a'] AS x")
    assert json.loads(v) == 42


def test_parse_json_nonliteral_subscript(engine):
    [(v,)] = rows(engine, """
        SELECT PARSE_JSON('[5,6,7]')[i] AS x
        FROM (SELECT 2 AS i)
    """)
    assert json.loads(v) == 7


# -- translator-unit checks -------------------------------------------------

def test_translate_literal_positions():
    t = Translator()
    # constant at expression-start positions
    assert t.translate_expr("[1,2]").startswith("array(")
    assert "array(" in t.translate_expr("WHERE x = [1]")
    # subscript after identifier / ')' / ']' untouched
    assert t.translate_expr("arr[0]") == "arr[0]"
    assert t.translate_expr("f(x)[0]") == "f(x)[0]"
    assert "array(1,2)[1]" in t.translate_expr("[1,2][1]")


def test_translate_object_fallback_keeps_braces():
    # a '{...}' that is not key:value pairs is left alone
    t = Translator()
    assert t.translate_expr("'{a}'") == "'{a}'"
