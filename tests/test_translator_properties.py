"""Property-based translator tests (hypothesis) — an upgrade over the
reference's purely golden-case suite (SURVEY §5: no property testing
exists in the reference)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from snowflake_emulator_spark.plans.translator import Translator, translate

ident = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@given(ident, ident, ident)
@settings(max_examples=50)
def test_iff_rewrite_any_identifiers(a, b, c):
    out = translate(f"SELECT IFF({a} > 1, '{b}', '{c}') FROM t")
    assert out == f"SELECT if({a} > 1, '{b}', '{c}') FROM t"


@given(st.text(alphabet=string.printable, max_size=60))
@settings(max_examples=100)
def test_string_literals_never_rewritten(s):
    """Anything inside a single-quoted literal must pass through
    untouched (modulo the quote escaping that defines the literal)."""
    lit = s.replace("'", "''")
    sql = f"SELECT '{lit}' FROM t"
    assert translate(sql) == sql


@given(st.lists(st.sampled_from(["IFF(a,b,c)", "NVL(x,y)", "col1", "'IFF(1,2,3)'", "LEN(s)"]),
                min_size=1, max_size=5))
@settings(max_examples=50)
def test_idempotence(parts):
    """Translating twice equals translating once (rewrites target only
    Snowflake-isms, whose outputs contain no Snowflake-isms)."""
    sql = "SELECT " + ", ".join(parts) + " FROM t"
    once = translate(sql)
    assert translate(once) == once


@given(st.integers(min_value=-10**6, max_value=10**6))
@settings(max_examples=30)
def test_dateadd_numeric_arg(n):
    out = translate(f"SELECT DATEADD(day, {n}, d) FROM t")
    assert out == f"SELECT timestampadd(DAY, {n}, d) FROM t"


def test_split_args_nesting_and_quotes():
    t = Translator()
    cases = {
        "a, b, c": ["a", "b", "c"],
        "f(x, y), z": ["f(x, y)", "z"],
        "'a,b', c": ["'a,b'", "c"],
        "nested(f(g(1,2), 3), 'x,y'), last": ["nested(f(g(1,2), 3), 'x,y')", "last"],
        "a": ["a"],
    }
    for src, want in cases.items():
        assert [p.strip() for p in t._split_args(src)] == want
