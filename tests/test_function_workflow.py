"""Advanced-function workflow with value assertions, mirroring the
reference's integration suite
(`/root/reference/tests/integration/server_integration_test.go:457-657`)
over the FUNCTION_TEST fixture (FIXTURES.md §1)."""

import pytest

from snowflake_emulator_spark.executor import SessionContext


@pytest.fixture()
def ft(engine):
    ctx = SessionContext()
    engine.execute(
        """CREATE TABLE function_test (
             id INTEGER PRIMARY KEY,
             name VARCHAR NOT NULL,
             email VARCHAR,
             score INTEGER,
             created_at DATE NOT NULL,
             data VARCHAR)""",
        ctx,
    )
    engine.execute(
        """INSERT INTO function_test VALUES
           (1, 'Alice', 'alice@example.com', 95, DATE '2024-01-15', '{"role": "admin"}'),
           (2, 'Bob', NULL, 80, DATE '2024-02-20', NULL),
           (3, 'Charlie', 'charlie@example.com', NULL, DATE '2024-03-25', '{"role": "user"}')""",
        ctx,
    )
    return ctx


def _rows(res):
    return [tuple(r) for r in res.rows]


def test_nvl_nvl2(engine, ft):
    res = engine.execute(
        """SELECT name, NVL(email, 'no-email') AS email_c,
                  NVL2(email, 'has', 'none') AS has_email
           FROM function_test ORDER BY id""",
        ft,
    )
    assert _rows(res) == [
        ("Alice", "alice@example.com", "has"),
        ("Bob", "no-email", "none"),
        ("Charlie", "charlie@example.com", "has"),
    ]


def test_iff_nvl2_grading(engine, ft):
    """The reference's combined grading query
    (server_integration_test.go:583-657 spirit)."""
    res = engine.execute(
        """SELECT name,
                  NVL2(score, IFF(score >= 90, 'A', 'B'), 'N/A') AS grade
           FROM function_test ORDER BY id""",
        ft,
    )
    assert _rows(res) == [("Alice", "A"), ("Bob", "B"), ("Charlie", "N/A")]


def test_dateadd_datediff(engine, ft):
    res = engine.execute(
        """SELECT id,
                  CAST(DATEADD(day, 30, created_at) AS DATE) AS due,
                  DATEDIFF(day, created_at, DATE '2024-04-01') AS days_left,
                  DATEDIFF(month, created_at, DATE '2024-04-01') AS months_left
           FROM function_test ORDER BY id""",
        ft,
    )
    import datetime as dt

    assert _rows(res) == [
        (1, dt.date(2024, 2, 14), 77, 3),
        (2, dt.date(2024, 3, 21), 41, 2),
        (3, dt.date(2024, 4, 24), 7, 1),
    ]


def test_object_construct_and_variant(engine, ft):
    res = engine.execute(
        """SELECT OBJECT_CONSTRUCT('name', name, 'id', CAST(id AS VARCHAR)) AS obj,
                  TO_VARIANT(data) AS v
           FROM function_test WHERE id = 1""",
        ft,
    )
    assert _rows(res) == [('{"name":"Alice","id":"1"}', '{"role": "admin"}')]


def test_json_path_on_variant(engine, ft):
    res = engine.execute(
        "SELECT id, data:role AS role FROM function_test ORDER BY id", ft
    )
    assert _rows(res) == [(1, "admin"), (2, None), (3, "user")]


def test_listagg(engine, ft):
    res = engine.execute(
        "SELECT LISTAGG(name, ',') WITHIN GROUP (ORDER BY name) AS names FROM function_test",
        ft,
    )
    assert _rows(res) == [("Alice,Bob,Charlie",)]


def test_result_metadata_type_names(engine, ft):
    """Result metadata carries Snowflake type names
    (pkg/query/type_mapper.go:24-56)."""
    res = engine.execute("SELECT id, name, created_at, score FROM function_test LIMIT 1", ft)
    types = {c.name: c.type for c in res.column_types}
    assert types == {"id": "NUMBER", "name": "TEXT", "created_at": "DATE", "score": "NUMBER"}


def test_semistructured_round2(engine, ft):
    """TO_ARRAY/GET/OBJECT_* family over VARIANT-as-JSON-text."""
    res = engine.execute(
        """SELECT id,
                  GET(data, 'role') AS role,
                  TRY_PARSE_JSON(data) AS parsed,
                  CHECK_JSON(data) AS err,
                  OBJECT_DELETE(data, 'role') AS wiped,
                  OBJECT_INSERT(data, 'lvl', 3) AS with_lvl
           FROM function_test WHERE id = 1""",
        SessionContext(),
    )
    row = _rows(res)[0]
    assert row == (1, "admin", '{"role": "admin"}', None, "{}",
                   '{"role":"admin","lvl":3}')
    res = engine.execute(
        """SELECT GET(ARRAY_CONSTRUCT(10, 20, 30), 0) AS first_el,
                  ARRAY_SUM(ARRAY_CONSTRUCT(1.5, 2.5)) AS asum,
                  TO_ARRAY(42) AS wrapped,
                  IS_NULL_VALUE('null') AS jn,
                  CHECK_JSON('oops') AS bad""",
        SessionContext(),
    )
    assert _rows(res) == [(10, 4.0, [42], True, "invalid JSON")]


def test_object_insert_duplicate_key_semantics(engine, ft):
    """Snowflake OBJECT_INSERT: the 3-arg form RAISES on an existing
    key (Spark's mapKeyDedupPolicy=EXCEPTION supplies the error); only
    updateFlag=TRUE overwrites; updateFlag=FALSE behaves like 3-arg."""
    import pytest as _pytest

    ctx = SessionContext()
    with _pytest.raises(Exception, match="[Dd]uplicate"):
        engine.execute(
            "SELECT OBJECT_INSERT(data, 'role', 'user') AS o "
            "FROM function_test WHERE id = 1", ctx)
    res = engine.execute(
        "SELECT OBJECT_INSERT(data, 'role', 'user', TRUE) AS o "
        "FROM function_test WHERE id = 1", ctx)
    assert _rows(res) == [('{"role":"user"}',)]
    res = engine.execute(
        "SELECT OBJECT_INSERT(data, 'lvl', 3, FALSE) AS o "
        "FROM function_test WHERE id = 1", ctx)
    assert _rows(res) == [('{"role":"admin","lvl":3}',)]


def test_get_nonliteral_key(engine, ft):
    """GET with a computed (non-literal) key resolves at runtime over
    the VARIANT JSON text: object-field first, then array-index."""
    ctx = SessionContext()
    res = engine.execute(
        "SELECT GET(data, CONCAT('ro', 'le')) AS role "
        "FROM function_test WHERE id = 1", ctx)
    assert _rows(res) == [("admin",)]
    res = engine.execute(
        "SELECT GET('[10,20,30]', 1 + 1) AS third", ctx)
    assert _rows(res) == [("30",)]


def test_sql_udf_lifecycle(engine):
    """CREATE FUNCTION (SQL scalar UDF, beyond reference): call sites
    inline by macro expansion before translation — the body may use the
    Snowflake function surface, UDFs may call UDFs, NUMBER(p,s) args
    parse, and SHOW USER FUNCTIONS / DROP FUNCTION manage the catalog."""
    ctx = SessionContext()
    engine.execute(
        "CREATE FUNCTION udf_area(r DOUBLE) RETURNS DOUBLE AS 'PI() * r * r'", ctx)
    engine.execute(
        "CREATE FUNCTION udf_tax(amount NUMBER(12,2), rate DOUBLE) "
        "RETURNS DOUBLE AS $$ amount * rate $$", ctx)
    engine.execute(
        "CREATE FUNCTION udf_initials(s VARCHAR) RETURNS VARCHAR "
        "AS 'UPPER(LEFT(s, 1))'", ctx)  # Snowflake fn in body
    engine.execute(
        "CREATE FUNCTION udf_area2(r DOUBLE) RETURNS DOUBLE AS 'udf_area(r) * 2'",
        ctx)  # nested UDF call
    res = engine.execute(
        "SELECT ROUND(udf_area(2.0), 4) AS a, ROUND(udf_tax(100.00, 0.07), 2) AS t, "
        "udf_initials('hello') AS i, ROUND(udf_area2(1.0), 4) AS a2", ctx)
    assert _rows(res) == [(12.5664, 7.0, "H", 6.2832)]
    names = [r[0] for r in engine.execute("SHOW USER FUNCTIONS", ctx).rows]
    assert {"UDF_AREA", "UDF_TAX", "UDF_INITIALS", "UDF_AREA2"} <= set(names)
    # duplicate without OR REPLACE raises; OR REPLACE swaps the body
    import pytest as _pytest
    with _pytest.raises(Exception, match="already exists"):
        engine.execute(
            "CREATE FUNCTION udf_area(r DOUBLE) RETURNS DOUBLE AS 'r'", ctx)
    engine.execute(
        "CREATE OR REPLACE FUNCTION udf_area(r DOUBLE) RETURNS DOUBLE AS 'r + 1'", ctx)
    assert _rows(engine.execute("SELECT udf_area(1.0) AS a", ctx)) == [(2.0,)]
    engine.execute("DROP FUNCTION udf_area2", ctx)
    assert "UDF_AREA2" not in [
        r[0] for r in engine.execute("SHOW USER FUNCTIONS", ctx).rows]
    with _pytest.raises(Exception):
        engine.execute("DROP FUNCTION udf_missing", ctx)
    engine.execute("DROP FUNCTION IF EXISTS udf_missing", ctx)  # no raise


def test_sql_udf_no_macro_capture(engine):
    """Two-phase argument substitution: an argument whose text is a
    LATER parameter's name must not be re-substituted by that
    parameter's value — udf(rate, 0.07) keeps the `rate` COLUMN as the
    first argument instead of silently computing 0.07 * 0.07. Parameter
    names inside string literals in the body also stay verbatim."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE cap_t (amount DOUBLE, rate DOUBLE)", ctx)
    engine.execute("INSERT INTO cap_t VALUES (100.0, 0.5)", ctx)
    engine.execute(
        "CREATE FUNCTION udf_cap_tax(amount DOUBLE, rate DOUBLE) "
        "RETURNS DOUBLE AS 'amount * rate'", ctx)
    res = engine.execute(
        "SELECT ROUND(udf_cap_tax(rate, 0.07), 4) AS v FROM cap_t", ctx)
    assert _rows(res) == [(0.035,)]  # rate column (0.5) * 0.07, not 0.0049
    engine.execute(
        "CREATE FUNCTION udf_cap_lbl(x VARCHAR) RETURNS VARCHAR "
        "AS $$ 'x=' || x $$", ctx)
    res = engine.execute("SELECT udf_cap_lbl('hi') AS v", ctx)
    assert _rows(res) == [("x=hi",)]


def test_sql_udtf_table_function(engine):
    """CREATE FUNCTION … RETURNS TABLE(…): SQL UDTF inlined as a derived
    table at TABLE(f(args)) call sites, declared output names/types
    applied via column-list alias; composes with WHERE and aliases."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE udtf_orders (id INTEGER, amt DOUBLE)", ctx)
    engine.execute("INSERT INTO udtf_orders VALUES (1, 10.0), (2, 25.0), (3, 50.0)", ctx)
    engine.execute(
        "CREATE FUNCTION udtf_big(min_amt DOUBLE) RETURNS TABLE (oid NUMBER, amount DOUBLE) "
        "AS $$ SELECT id, amt FROM udtf_orders WHERE amt >= min_amt $$", ctx)
    res = engine.execute(
        "SELECT oid, amount FROM TABLE(udtf_big(20.0)) ORDER BY oid", ctx)
    assert [(int(r[0]), r[1]) for r in res.rows] == [(2, 25.0), (3, 50.0)]
    res = engine.execute(
        "SELECT t.oid FROM TABLE(udtf_big(5.0)) t WHERE t.amount < 30 ORDER BY 1", ctx)
    assert [int(r[0]) for r in res.rows] == [1, 2]
    assert "UDTF_BIG" in [r[0] for r in engine.execute("SHOW USER FUNCTIONS", ctx).rows]


def test_describe_function(engine):
    ctx = SessionContext()
    engine.execute(
        "CREATE FUNCTION descf(x NUMBER, s VARCHAR) RETURNS VARCHAR "
        "AS 'CONCAT(s, x)'", ctx)
    rows = dict(engine.execute("DESCRIBE FUNCTION descf", ctx).rows)
    assert rows["signature"] == "(NUMBER, VARCHAR)"
    assert rows["returns"] == "VARCHAR" and rows["language"] == "SQL"
    assert rows["body"] == "CONCAT(s, x)"


def test_split_literal_semantics_matrix(engine):
    """SPLIT treats its delimiter as a LITERAL for every regex
    metacharacter (Spark's split is regex-based — the translator
    \\Q-quotes); compared cell-for-cell against Python str.split."""
    ctx = SessionContext()
    cases = [
        ("a.b.c", "."), ("a|b|c", "|"), ("a*b", "*"), ("x+y+z", "+"),
        ("p(q)r", "("), ("p(q)r", ")"), ("m[n]o", "["), ("m[n]o", "]"),
        ("u{v}w", "{"), ("a^b", "^"), ("a$b", "$"), ("a?b", "?"),
        ("a..b", ".."), ("nosep", ","), ("a--b--c", "--"),
    ]
    for s, d in cases:
        res = engine.execute(
            f"SELECT TO_JSON(SPLIT('{s}', '{d}')) AS v", ctx)
        import json as _json

        got = _json.loads(res.rows[0][0])
        assert got == s.split(d), (s, d, got)


def test_trim_charset_semantics_matrix(engine):
    """2-arg TRIM/LTRIM/RTRIM trim the CHARACTER SET from the first
    argument (Spark's deprecated 2-arg form has reversed args);
    compared against Python strip/lstrip/rstrip."""
    ctx = SessionContext()
    cases = [("xyhixy", "xy"), ("0042.00", "0"), ("  pad  ", " "),
             ("aabZbaa", "ab"), ("hi", "xyz")]
    for s, chars in cases:
        res = engine.execute(
            f"SELECT TRIM('{s}', '{chars}') AS t, "
            f"LTRIM('{s}', '{chars}') AS l, "
            f"RTRIM('{s}', '{chars}') AS r", ctx)
        t, l, r = res.rows[0]
        assert t == s.strip(chars) and l == s.lstrip(chars) \
            and r == s.rstrip(chars), (s, chars, t, l, r)


def test_order_by_null_defaults_snowflake(engine):
    """Snowflake sorts NULLS LAST on ASC and NULLS FIRST on DESC by
    default — the opposite of Spark — so ORDER BY ... LIMIT must pick
    the non-null rows first."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE nulls_t (id INTEGER, v INTEGER)", ctx)
    engine.execute(
        "INSERT INTO nulls_t VALUES (1, 10), (2, NULL), (3, 5), (4, NULL)", ctx)
    r = engine.execute("SELECT id FROM nulls_t ORDER BY v LIMIT 2", ctx)
    assert [x[0] for x in r.rows] == [3, 1]          # nulls last on ASC
    r = engine.execute("SELECT id FROM nulls_t ORDER BY v DESC, id LIMIT 3", ctx)
    assert [x[0] for x in r.rows] == [2, 4, 1]       # nulls first on DESC
    r = engine.execute(
        "SELECT id FROM nulls_t ORDER BY v NULLS FIRST, id LIMIT 2", ctx)
    assert [x[0] for x in r.rows] == [2, 4]          # explicit wins


def test_python_udf_create_call_dropped(engine):
    """CREATE FUNCTION ... LANGUAGE PYTHON HANDLER='f' registers a
    Spark Python UDF callable from SQL (Snowflake-real surface the
    reference rules out entirely); GET_DDL reconstructs the statement;
    a missing handler raises."""
    ctx = SessionContext()
    engine.execute(
        "CREATE FUNCTION py_double(x NUMBER) RETURNS NUMBER "
        "LANGUAGE PYTHON RUNTIME_VERSION='3.11' HANDLER='dbl' AS $$\n"
        "def dbl(x):\n"
        "    return None if x is None else x * 2\n"
        "$$", ctx)
    engine.execute("CREATE TABLE pyt (n INTEGER)", ctx)
    engine.execute("INSERT INTO pyt VALUES (1), (2), (NULL)", ctx)
    r = engine.execute(
        "SELECT n, py_double(n) AS d FROM pyt ORDER BY n", ctx)
    assert [tuple(x) for x in r.rows] == [(1, 2), (2, 4), (None, None)]
    d = engine.execute("SELECT GET_DDL('FUNCTION', 'py_double') AS d",
                       ctx).rows[0][0]
    assert "LANGUAGE PYTHON" in d and "HANDLER='dbl'" in d
    rows = engine.execute(
        "SELECT function_language FROM information_schema.functions "
        "WHERE function_name = 'PY_DOUBLE'", ctx).rows
    assert rows == [["PYTHON"]]
    import pytest as _pytest

    with _pytest.raises(Exception, match="HANDLER"):
        engine.execute(
            "CREATE FUNCTION py_bad(x NUMBER) RETURNS NUMBER "
            "LANGUAGE PYTHON HANDLER='missing' AS $$\n"
            "def other(x):\n"
            "    return x\n"
            "$$", ctx)
    engine.execute("DROP FUNCTION py_double", ctx)


def test_python_udf_string_and_sql_udf_coexist(engine):
    """A Python UDF and a SQL macro UDF compose in one query."""
    ctx = SessionContext()
    engine.execute(
        "CREATE FUNCTION py_shout(s VARCHAR) RETURNS VARCHAR "
        "LANGUAGE PYTHON HANDLER='go' AS $$\n"
        "def go(s):\n"
        "    return None if s is None else s.upper() + '!'\n"
        "$$", ctx)
    engine.execute(
        "CREATE FUNCTION sql_wrap(s VARCHAR) RETURNS VARCHAR AS "
        "$$ '<' || s || '>' $$", ctx)
    r = engine.execute("SELECT sql_wrap(py_shout('hi')) AS v", ctx)
    assert r.rows == [["<HI!>"]]


def test_python_udf_drop_deregisters_and_schemas_isolate(engine):
    """DROP FUNCTION on a PYTHON UDF must stop it resolving (the Spark
    registration is removed, not just the catalog row), and same-named
    PYTHON UDFs in different schemas must not clobber one another
    (r5 ADVICE: uid-mangled registration + catalog call-site rewrite)."""
    import pytest as _pytest

    ctx = SessionContext()
    engine.execute("CREATE SCHEMA other_sch", ctx)
    engine.execute(
        "CREATE FUNCTION py_tag(x NUMBER) RETURNS VARCHAR "
        "LANGUAGE PYTHON HANDLER='f' AS $$\n"
        "def f(x):\n"
        "    return f'public:{x}'\n"
        "$$", ctx)
    engine.execute(
        "CREATE FUNCTION other_sch.py_tag(x NUMBER) RETURNS VARCHAR "
        "LANGUAGE PYTHON HANDLER='f' AS $$\n"
        "def f(x):\n"
        "    return f'other:{x}'\n"
        "$$", ctx)
    # bare name binds to the session schema; qualified names pick each
    r = engine.execute("SELECT py_tag(1) AS a, other_sch.py_tag(1) AS b", ctx)
    assert [tuple(x) for x in r.rows] == [("public:1", "other:1")]
    # dropping the other-schema one leaves the session one resolving
    engine.execute("DROP FUNCTION other_sch.py_tag", ctx)
    assert engine.execute("SELECT py_tag(2) AS a", ctx).rows == [["public:2"]]
    with _pytest.raises(Exception):
        engine.execute("SELECT other_sch.py_tag(2) AS b", ctx)
    # dropping the last one stops bare-name resolution too
    engine.execute("DROP FUNCTION py_tag", ctx)
    with _pytest.raises(Exception):
        engine.execute("SELECT py_tag(3) AS a", ctx)
