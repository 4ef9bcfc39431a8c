"""r8 session-2 batch 2: epoch/doy/nanosecond date parts (DATE_PART +
EXTRACT spellings), TRY_TO_TIMESTAMP_* aliases, BOOLXOR_AGG,
GETVARIABLE, and the REGEXP_SUBSTR capture-group forms (5th/6th args —
previously the group/params args were silently ignored and the whole
match came back).

Behavior contracts are public Snowflake docs; beyond-reference
additions to the translator surface."""


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


def one(engine, sql):
    return rows(engine, sql)[0]


def test_epoch_parts(engine):
    ts = "'2024-01-01 00:00:10.123456'::TIMESTAMP"
    assert one(engine, f"SELECT DATE_PART('epoch_second', {ts}) AS a, "
                       f"DATE_PART('epoch_millisecond', {ts}) AS b, "
                       f"DATE_PART('epoch_microsecond', {ts}) AS c, "
                       f"DATE_PART('epoch_nanosecond', {ts}) AS d") == (
        1704067210, 1704067210123, 1704067210123456, 1704067210123456000)


def test_extract_epoch_and_quoted_part(engine):
    assert one(engine, "SELECT EXTRACT(EPOCH FROM '2024-01-01'::TIMESTAMP) AS v") == (
        1704067200,)
    assert one(engine, "SELECT EXTRACT('month' FROM '2024-03-05'::DATE) AS v") == (3,)
    assert one(engine, "SELECT EXTRACT(YEAR FROM '2024-01-01'::DATE) AS v") == (2024,)


def test_dayofyear_and_nanosecond_parts(engine):
    assert one(engine, "SELECT DATE_PART('dayofyear', '2024-02-01'::DATE) AS a, "
                       "DATE_PART(doy, '2024-02-01'::DATE) AS b") == (32, 32)
    assert one(engine, "SELECT DATE_PART('nanosecond', "
                       "'2024-01-01 00:00:00.123456'::TIMESTAMP) AS v") == (
        123456000,)


def test_try_to_timestamp_flavors(engine):
    assert one(engine, "SELECT TRY_TO_TIMESTAMP_NTZ('garbage') AS a, "
                       "TRY_TO_TIMESTAMP_LTZ('garbage') AS b, "
                       "TRY_TO_TIMESTAMP_TZ('garbage') AS c") == (None, None, None)
    [(v,)] = rows(engine, "SELECT TRY_TO_TIMESTAMP_NTZ('2024-01-01 10:00:00') AS v")
    assert v is not None


def test_boolxor_agg(engine):
    engine.execute("CREATE TABLE bx_t (g INTEGER, x BOOLEAN)")
    engine.execute("INSERT INTO bx_t VALUES (1, true), (1, true), "
                   "(2, true), (2, false), (3, NULL)")
    got = rows(engine, "SELECT g, BOOLXOR_AGG(x) AS v FROM bx_t GROUP BY g ORDER BY g")
    assert got == [(1, False), (2, True), (3, None)]


def test_getvariable(engine):
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("SET tier = 'gold'", ctx)
    assert [tuple(r) for r in engine.execute(
        "SELECT GETVARIABLE('TIER') AS a, GETVARIABLE('tier') AS b, "
        "GETVARIABLE('MISSING') AS c", ctx).rows] == [("gold", "gold", None)]
    # inside a string literal the call text is data, not a call
    assert engine.execute("SELECT 'GETVARIABLE(''TIER'')' AS s", ctx).rows == [
        ["GETVARIABLE('TIER')"]]


def test_to_char_numeric_rounds_to_picture_scale(engine):
    """Spark's to_char overflows to '###' when the value has more
    decimals than the picture; Snowflake rounds half-up — the
    translator pre-casts to the picture's scale."""
    assert one(engine, "SELECT TO_CHAR(12345.678, '999,999.99') AS v") == (
        " 12,345.68",)
    assert one(engine, "SELECT TO_CHAR(12345.678, '$99,999.99') AS v") == (
        "$12,345.68",)
    assert one(engine, "SELECT TO_CHAR(454.5, '999') AS v") == ("455",)
    assert one(engine, "SELECT TO_CHAR(42, '00000') AS v") == ("00042",)
    # date pictures still route to date_format
    assert one(engine, "SELECT TO_CHAR('2024-01-05'::DATE, 'YYYY-MM') AS v") == (
        "2024-01",)


def test_to_number_format_picture(engine):
    import decimal

    assert one(engine, "SELECT TO_NUMBER('12,345', '99,999') AS v") == (
        decimal.Decimal("12345"),)
    assert one(engine, "SELECT TO_NUMBER('12,345.67', '99,999.99', 10, 2) AS v") == (
        decimal.Decimal("12345.67"),)
    assert one(engine, "SELECT TRY_TO_NUMBER('garbage', '99,999') AS v") == (None,)
    # precision/scale (numeric-arg) form unchanged
    assert one(engine, "SELECT TO_NUMBER('123.456', 10, 2) AS v") == (
        decimal.Decimal("123.46"),)


def test_connect_by_level(engine):
    engine.execute("CREATE TABLE cb_emp (id INTEGER, mgr INTEGER, name VARCHAR)")
    engine.execute("INSERT INTO cb_emp VALUES (1, NULL, 'ceo'), (2, 1, 'vp'), "
                   "(3, 2, 'ic'), (4, 2, 'ic2')")
    got = rows(engine, "SELECT id, LEVEL AS lvl FROM cb_emp "
                       "START WITH mgr IS NULL CONNECT BY PRIOR id = mgr "
                       "ORDER BY id")
    assert got == [(1, 1), (2, 2), (3, 3), (4, 3)]


def test_regexp_substr_group_forms(engine):
    # 6-arg: explicit group_num
    assert one(engine, "SELECT REGEXP_SUBSTR('a1b2', '([a-z])(\\\\d)', 1, 1, 'e', 2) AS v") == ("1",)
    # 5-arg with 'e': defaults to group 1, occurrence honored
    assert one(engine, "SELECT REGEXP_SUBSTR('a1b2', '([a-z])\\\\d', 1, 2, 'e') AS v") == ("b",)
    # 'i' flag
    assert one(engine, "SELECT REGEXP_SUBSTR('XAY', '(a)', 1, 1, 'ie', 1) AS v") == ("A",)
    # 4-arg keeps whole-match semantics
    assert one(engine, "SELECT REGEXP_SUBSTR('a1b2', '[a-z]\\\\d', 1, 2) AS v") == ("b2",)
    # no match -> NULL
    assert one(engine, "SELECT REGEXP_SUBSTR('abc', '(\\\\d)', 1, 1, 'e') AS v") == (None,)


def test_select_star_rename(engine):
    """SELECT * RENAME (a AS x) — Spark has no star-RENAME; the
    translator folds the sources into EXCEPT and appends aliases (the
    renamed column moves to the end; Snowflake keeps its position —
    documented divergence, name-sorted comparisons unaffected)."""
    engine.execute("CREATE TABLE sr_t (a INTEGER, b VARCHAR, c DOUBLE)")
    engine.execute("INSERT INTO sr_t VALUES (1, 'x', 1.5)")
    r = engine.execute("SELECT * RENAME (b AS name) FROM sr_t")
    assert [c.upper() for c in r.columns] == ["A", "C", "NAME"]
    r = engine.execute("SELECT * EXCLUDE (c) RENAME (b AS name) FROM sr_t")
    assert [c.upper() for c in r.columns] == ["A", "NAME"]
    r = engine.execute("SELECT * RENAME b AS name FROM sr_t")
    assert [c.upper() for c in r.columns] == ["A", "C", "NAME"]


def test_quoted_variant_path_segments(engine):
    """props:"a"."b" and segments with spaces (bracket JSON-path form,
    quote-escaped in the emitted literal); OBJECT_CONSTRUCT(*) builds
    one object from all columns (null fields dropped)."""
    engine.execute("CREATE TABLE qvp_t (id INTEGER, props VARIANT)")
    engine.execute("""INSERT INTO qvp_t SELECT 1 AS id,
        PARSE_JSON('{"a": {"b": 7}, "odd key": 5}') AS props""")
    assert one(engine, 'SELECT props:"a"."b" AS v FROM qvp_t') == ("7",)
    assert one(engine, 'SELECT props:"odd key" AS v FROM qvp_t') == ("5",)
    assert one(engine, 'SELECT props:a."b" AS v FROM qvp_t') == ("7",)
    [(o,)] = rows(engine, "SELECT OBJECT_CONSTRUCT(*) AS o FROM "
                          "(SELECT 1 AS x, 'y' AS s, CAST(NULL AS INTEGER) AS z)")
    assert o == '{"x":1,"s":"y"}'


def test_snowflake_interval_literal_forms(engine):
    """Comma-separated multi-part bodies and abbreviated units map onto
    Spark's space-separated full-name interval grammar; a bare quantity
    means seconds (Snowflake default)."""
    import datetime

    assert one(engine, "SELECT '2024-01-01'::TIMESTAMP + "
                       "INTERVAL '1 day, 2 hours' AS v") == (
        datetime.datetime(2024, 1, 2, 2, 0),)
    assert one(engine, "SELECT '2024-01-01'::TIMESTAMP + INTERVAL '3 h' AS v") == (
        datetime.datetime(2024, 1, 1, 3, 0),)
    assert one(engine, "SELECT '2024-01-01'::TIMESTAMP + INTERVAL '90' AS v") == (
        datetime.datetime(2024, 1, 1, 0, 1, 30),)
    # interval text inside a string literal is data, not a literal
    assert one(engine, "SELECT 'INTERVAL ''3 h''' AS v") == ("INTERVAL '3 h'",)


def test_to_time_with_format_picture(engine):
    assert one(engine, "SELECT TO_TIME('13-45-10', 'HH24-MI-SS') AS v") == (
        "13:45:10",)
    assert one(engine, "SELECT TRY_TO_TIME('13-45-10', 'HH24-MI-SS') AS v") == (
        "13:45:10",)


def test_last_query_id_offsets(engine):
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    res = engine.execute("SELECT 1 AS x", ctx)
    assert engine.execute("SELECT LAST_QUERY_ID(-1) AS v", ctx).rows[0][0] == res.query_id
    # deeper history is not tracked per session: NULL, not an error
    assert engine.execute("SELECT LAST_QUERY_ID(-2) AS v", ctx).rows[0][0] is None


def test_ignore_nulls_inside_parens(engine):
    """Snowflake allows IGNORE|RESPECT NULLS inside the window
    function's parens; Spark wants it outside — the translator moves it
    (string literals untouched)."""
    engine.execute("CREATE TABLE inw_t (g INTEGER, v INTEGER)")
    engine.execute("INSERT INTO inw_t VALUES (1,10),(1,NULL),(1,30)")
    assert one(engine,
               "SELECT LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY g ORDER BY v "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv "
               "FROM inw_t LIMIT 1") == (30,)
    assert one(engine, "SELECT 'LAST_VALUE(v IGNORE NULLS)' AS s") == (
        "LAST_VALUE(v IGNORE NULLS)",)


def test_regexp_replace_instr_full_surface(spark):
    """r10: REGEXP_REPLACE occurrence/parameters and REGEXP_INSTR
    occurrence/option/parameters/group_num — previously documented
    NotImplementedError boundaries, now routed to Arrow-batched UDF
    kernels (common forms keep their pure-SQL fast paths)."""
    from snowflake_emulator_spark.plans.translator import translate

    def q(expr):
        return spark.sql(translate(f"SELECT {expr} AS r")).collect()[0][0]

    assert q("REGEXP_REPLACE('a1b2c3', '[0-9]', 'X', 1, 2)") == "a1bXc3"
    assert q("REGEXP_REPLACE('a1b2c3', '[0-9]', 'X', 1, 0)") == "aXbXcX"
    assert q("REGEXP_REPLACE('a1b2c3', '[0-9]', 'X', 4, 1)") == "a1bXc3"
    assert q("REGEXP_REPLACE('AbAb', 'a', 'x', 1, 0, 'i')") == "xbxb"
    assert q(r"REGEXP_REPLACE('john smith', '(\\w+) (\\w+)', "
             r"'\\2 \\1', 1, 1)") == "smith john"
    assert q("REGEXP_INSTR('a1b2c3', '[0-9]', 1, 2)") == 4
    assert q("REGEXP_INSTR('a1b2c3', '[0-9]', 1, 2, 1)") == 5
    assert q("REGEXP_INSTR('a1b2c3', '[0-9]', 1, 9)") == 0
    assert q("REGEXP_INSTR('nevermore1, nevermore2', "
             "'nevermore(\\\\d)', 1, 2, 0, 'e', 1)") == 22
    # r11: 'e' with group_num OMITTED defaults to capture group 1
    # (Snowflake extract semantics), not the full match
    assert q("REGEXP_INSTR('nevermore1, nevermore2', "
             "'nevermore(\\\\d)', 1, 2, 0, 'e')") == 22
    # without 'e' the omitted group_num still means the full match
    assert q("REGEXP_INSTR('nevermore1, nevermore2', "
             "'nevermore(\\\\d)', 1, 2, 0, 'i')") == 13
    # NULL subject propagates
    assert q("REGEXP_REPLACE(CAST(NULL AS STRING), 'a', 'b', 1, 2)") is None
    # r11: position < 1 raises (Snowflake invalid-argument), never
    # silently slices from the string's end
    import pytest as _pytest

    from snowflake_emulator_spark.functions.extras import (
        sf_regexp_instr_py, sf_regexp_replace_py)
    with _pytest.raises(ValueError, match="position"):
        sf_regexp_replace_py("abc", "b", "x", 0, 0, "c")
    with _pytest.raises(ValueError, match="position"):
        sf_regexp_instr_py("abc", "b", -1, 1, 0, "c", 0)
