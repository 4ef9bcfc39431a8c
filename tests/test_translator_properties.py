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
    assert (f"lag({col}) OVER (PARTITION BY {part} "
            f"ORDER BY {order} NULLS LAST) AS __cce_0") in out
    assert out.count("__cce_0") >= 3  # lag alias + two predicate uses
    assert out.rstrip().endswith(f"ORDER BY {part} NULLS LAST")


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


# ---------------------------------------------------------------------------
# _split_statements: quote/$$/comment-aware splitting (r4 ADVICE fix)
# ---------------------------------------------------------------------------

_seg = st.one_of(
    st.text(alphabet="abc XY,=()", min_size=0, max_size=8).map(
        lambda s: s.replace(";", "")),
    st.text(alphabet="ab;'", min_size=1, max_size=6).map(
        lambda s: "'" + s.replace("'", "''") + "'"),      # quoted literal
    st.text(alphabet="ab; '", min_size=0, max_size=6).map(
        lambda s: "$$" + s.replace("$$", "") + "$$"),     # dollar body
    st.text(alphabet="ab;'x", min_size=0, max_size=6).map(
        lambda s: "-- " + s.replace("\n", "") + "\n"),    # line comment
    st.text(alphabet="ab;'x", min_size=0, max_size=6).map(
        lambda s: "/* " + s.replace("*/", "") + " */"),   # block comment
)


@given(st.lists(st.lists(_seg, min_size=1, max_size=4), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_split_statements_property(stmt_segs):
    """Joining arbitrary statements (each built from plain text, quoted
    literals, $$ bodies and comments) with ';' then splitting recovers
    one piece per non-empty statement: semicolons inside literals,
    $$ bodies and comments never split; leading comments are stripped;
    apostrophes in comments never open a string."""
    from snowflake_emulator_spark.engine import (
        _split_statements,
        _strip_leading_comments,
    )

    stmts = ["".join(segs) for segs in stmt_segs]
    script = ";".join(stmts)
    parts = _split_statements(script)
    expected = [x for x in (_strip_leading_comments(s) for s in stmts) if x]
    assert parts == expected
