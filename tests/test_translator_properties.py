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


@given(ident, ident, ident)
@settings(max_examples=50)
def test_conditional_change_event_property(col, part, order):
    """CCE rewrite is shape-stable for any identifiers: one injected
    lag subquery, one running sum, tail preserved."""
    sql = (f"SELECT {part}, CONDITIONAL_CHANGE_EVENT({col}) "
           f"OVER (PARTITION BY {part} ORDER BY {order}) AS ph "
           f"FROM t ORDER BY {part}")
    out = translate(sql)
    assert f"lag({col}) OVER (PARTITION BY {part} ORDER BY {order}) AS __cce_0" in out
    assert out.count("__cce_0") >= 3  # lag alias + two predicate uses
    assert out.rstrip().endswith(f"ORDER BY {part}")


@given(st.integers(min_value=1, max_value=16))
@settings(max_examples=16)
def test_minhash_k_parallel_mins(k):
    out = translate(f"SELECT MINHASH({k}, v) FROM t GROUP BY g")
    assert out.count("min(") == k


@given(st.floats(min_value=-1e25, max_value=1e25, allow_nan=False))
@settings(max_examples=200)
def test_go_float_round_trips(f):
    """The Go-format float string parses back to the exact same double
    (shortest-round-trip contract of strconv 'g' -1)."""
    from snowflake_emulator_spark.result import _go_float

    s = _go_float(f)
    assert float(s) == f
