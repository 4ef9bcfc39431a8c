"""Snowflake multi-table INSERT ALL|FIRST (r8 s2, beyond reference):
one source scan (cached), per-clause WHEN filters and VALUES mappings,
FIRST's first-match-only routing, ELSE catch-all. Plus DEFAULT tokens
in single-table VALUES and COPY GRANTS acceptance."""

import pytest

from snowflake_emulator_spark import errors


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


def test_unconditional_all(engine):
    engine.execute("CREATE TABLE mt_a (a INTEGER, b VARCHAR)")
    engine.execute("CREATE TABLE mt_b (a INTEGER, b VARCHAR)")
    r = engine.execute("INSERT ALL INTO mt_a INTO mt_b SELECT 1 AS a, 'x' AS b")
    assert r.rows == [[2]]
    assert rows(engine, "SELECT * FROM mt_a") == [(1, "x")]
    assert rows(engine, "SELECT * FROM mt_b") == [(1, "x")]


def test_conditional_all_with_else_and_values(engine):
    engine.execute("CREATE TABLE mt_small (x INTEGER)")
    engine.execute("CREATE TABLE mt_big (x INTEGER)")
    engine.execute("CREATE TABLE mt_other (x INTEGER)")
    r = engine.execute("""INSERT ALL
      WHEN v < 10 THEN INTO mt_small (x) VALUES (v)
      WHEN v < 100 THEN INTO mt_big (x) VALUES (v * 10)
      ELSE INTO mt_other (x) VALUES (v)
    SELECT v FROM (SELECT 5 AS v UNION ALL SELECT 50 UNION ALL SELECT 500)""")
    assert r.rows == [[4]]
    assert rows(engine, "SELECT * FROM mt_small") == [(5,)]
    assert rows(engine, "SELECT * FROM mt_big ORDER BY x") == [(50,), (500,)]
    assert rows(engine, "SELECT * FROM mt_other") == [(500,)]


def test_first_routes_to_first_match_only(engine):
    engine.execute("CREATE TABLE mt_f1 (x INTEGER)")
    engine.execute("CREATE TABLE mt_f2 (x INTEGER)")
    r = engine.execute("""INSERT FIRST
      WHEN v < 100 THEN INTO mt_f1 (x) VALUES (v)
      WHEN v < 1000 THEN INTO mt_f2 (x) VALUES (v)
    SELECT v FROM (SELECT 5 AS v UNION ALL SELECT 500)""")
    assert r.rows == [[2]]
    assert rows(engine, "SELECT * FROM mt_f1") == [(5,)]
    assert rows(engine, "SELECT * FROM mt_f2") == [(500,)]


def test_multi_insert_without_into_errors(engine):
    with pytest.raises(errors.SnowflakeError):
        engine.execute("INSERT ALL SELECT 1 AS v")


def test_values_default_token(engine):
    engine.execute("CREATE TABLE dv_t (a INTEGER, b VARCHAR DEFAULT 'dd')")
    engine.execute("INSERT INTO dv_t VALUES (1, DEFAULT), (2, 'x')")
    assert rows(engine, "SELECT * FROM dv_t ORDER BY a") == [
        (1, "dd"), (2, "x")]
    # DEFAULT on a column without a declared default becomes NULL
    engine.execute("INSERT INTO dv_t VALUES (DEFAULT, 'y')")
    assert rows(engine, "SELECT b FROM dv_t WHERE a IS NULL") == [("y",)]
    # the word DEFAULT inside a string literal is data
    engine.execute("INSERT INTO dv_t VALUES (4, 'DEFAULT')")
    assert rows(engine, "SELECT b FROM dv_t WHERE a = 4") == [("DEFAULT",)]


def test_copy_grants_accepted(engine):
    engine.execute("CREATE OR REPLACE TABLE cg_t COPY GRANTS AS SELECT 1 AS k")
    assert rows(engine, "SELECT COUNT(*) AS n FROM cg_t") == [(1,)]


def test_multi_insert_rolls_back_atomically(engine):
    """Both targets' writes are dirty-captured under an open
    transaction; ROLLBACK restores both."""
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE mtx1 (x INTEGER)", ctx)
    engine.execute("CREATE TABLE mtx2 (x INTEGER)", ctx)
    engine.execute("BEGIN", ctx)
    engine.execute("INSERT ALL INTO mtx1 INTO mtx2 SELECT 7 AS x", ctx)
    assert rows(engine, "SELECT COUNT(*) AS n FROM mtx1") == [(1,)]
    engine.execute("ROLLBACK", ctx)
    assert rows(engine, "SELECT COUNT(*) AS n FROM mtx1") == [(0,)]
    assert rows(engine, "SELECT COUNT(*) AS n FROM mtx2") == [(0,)]


def test_null_when_condition_routes_to_else_and_later_first(engine):
    """r10 (found by the mti fuzz family): a NULL WHEN condition is
    "not matched", so the row must still reach ELSE — and in FIRST
    mode a later matching branch. Bare NOT (c1 OR c2) propagated NULL
    and silently dropped the row."""
    engine.execute("CREATE TABLE mt_n1 (x INTEGER)")
    engine.execute("CREATE TABLE mt_n2 (x INTEGER)")
    engine.execute("CREATE TABLE mt_nelse (x INTEGER)")
    r = engine.execute("""INSERT ALL
      WHEN v % 2 = 0 THEN INTO mt_n1 (x) VALUES (v)
      ELSE INTO mt_nelse (x) VALUES (id)
    SELECT id, v FROM (SELECT 1 AS id, CAST(NULL AS INTEGER) AS v
                       UNION ALL SELECT 2, 4 UNION ALL SELECT 3, 5)""")
    assert r.rows == [[3]]
    assert rows(engine, "SELECT * FROM mt_n1") == [(4,)]
    # NULL-cond row (id=1) and odd row (id=3) both land in ELSE
    assert rows(engine, "SELECT * FROM mt_nelse ORDER BY x") == [(1,), (3,)]
    # FIRST: NULL first-clause condition must not block later branches
    engine.execute("CREATE TABLE mt_f1 (x INTEGER)")
    engine.execute("CREATE TABLE mt_f2 (x INTEGER)")
    r = engine.execute("""INSERT FIRST
      WHEN v > 100 THEN INTO mt_f1 (x) VALUES (v)
      WHEN id = 1 THEN INTO mt_f2 (x) VALUES (id)
    SELECT id, v FROM (SELECT 1 AS id, CAST(NULL AS INTEGER) AS v)""")
    assert r.rows == [[1]]
    assert rows(engine, "SELECT * FROM mt_f2") == [(1,)]
