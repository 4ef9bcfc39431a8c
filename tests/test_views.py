"""Named views (beyond reference: the reference's metadata model declares
a VIEW table type, pkg/metadata/repository.go:46, but never implements
the DDL). Views store the SELECT text and re-plan lazily against the
current table versions."""

import pytest

from snowflake_emulator_spark import errors
from snowflake_emulator_spark.executor import SessionContext


def _rows(res):
    return [tuple(r) for r in res.rows]


@pytest.fixture()
def vctx(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE vt (id INTEGER, grp VARCHAR, score INTEGER)", ctx)
    engine.execute(
        "INSERT INTO vt VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)", ctx)
    return ctx


def test_create_select_drop_view(engine, vctx):
    engine.execute("CREATE VIEW v_hi AS SELECT id, score FROM vt WHERE score >= 20", vctx)
    res = engine.execute("SELECT id, score FROM v_hi ORDER BY id", vctx)
    assert _rows(res) == [(2, 20), (3, 30), (4, 40)]
    # qualified reference
    res = engine.execute("SELECT count(*) AS n FROM PUBLIC.v_hi", vctx)
    assert _rows(res) == [(3,)]
    engine.execute("DROP VIEW v_hi", vctx)
    with pytest.raises(errors.SnowflakeError):
        engine.execute("SELECT * FROM v_hi", vctx)


def test_view_tracks_base_table_changes(engine, vctx):
    engine.execute("CREATE VIEW v_agg AS SELECT grp, sum(score) AS total FROM vt GROUP BY grp", vctx)
    res = engine.execute("SELECT grp, total FROM v_agg ORDER BY grp", vctx)
    assert _rows(res) == [("a", 30), ("b", 70)]
    engine.execute("INSERT INTO vt VALUES (5,'a',100)", vctx)
    res = engine.execute("SELECT grp, total FROM v_agg ORDER BY grp", vctx)
    assert _rows(res) == [("a", 130), ("b", 70)]


def test_view_column_rename_and_or_replace(engine, vctx):
    engine.execute("CREATE VIEW v_cols (vid, vscore) AS SELECT id, score FROM vt WHERE id <= 2", vctx)
    res = engine.execute("SELECT vid, vscore FROM v_cols ORDER BY vid", vctx)
    assert _rows(res) == [(1, 10), (2, 20)]
    engine.execute("CREATE OR REPLACE VIEW v_cols (vid, vscore) AS SELECT id, score FROM vt WHERE id > 2", vctx)
    res = engine.execute("SELECT vid, vscore FROM v_cols ORDER BY vid", vctx)
    assert _rows(res) == [(3, 30), (4, 40)]


def test_view_on_view_and_join(engine, vctx):
    engine.execute("CREATE VIEW v_base AS SELECT id, grp, score FROM vt WHERE score >= 20", vctx)
    engine.execute("CREATE VIEW v_top AS SELECT grp, max(score) AS mx FROM v_base GROUP BY grp", vctx)
    res = engine.execute(
        "SELECT t.id, v.mx FROM vt t JOIN v_top v ON t.grp = v.grp AND t.score = v.mx ORDER BY t.id", vctx)
    assert _rows(res) == [(2, 20), (4, 40)]


def test_view_name_collisions(engine, vctx):
    engine.execute("CREATE VIEW v_c AS SELECT id FROM vt", vctx)
    with pytest.raises(errors.SnowflakeError):
        engine.execute("CREATE TABLE v_c (x INTEGER)", vctx)
    with pytest.raises(errors.SnowflakeError):
        engine.execute("CREATE VIEW vt AS SELECT 1 AS one", vctx)
    # IF NOT EXISTS is a no-op on an existing view
    engine.execute("CREATE VIEW IF NOT EXISTS v_c AS SELECT grp FROM vt", vctx)
    res = engine.execute("SELECT id FROM v_c ORDER BY id LIMIT 1", vctx)
    assert _rows(res) == [(1,)]


def test_invalid_view_definition_rejected(engine, vctx):
    with pytest.raises(errors.SnowflakeError):
        engine.execute("CREATE VIEW v_bad AS SELECT nope FROM does_not_exist", vctx)
    # rejected views are not left behind in the catalog
    res = engine.execute("SHOW VIEWS", vctx)
    assert all(r[0] != "V_BAD" for r in res.rows)


def test_show_views(engine, vctx):
    engine.execute("CREATE VIEW v_s1 AS SELECT id FROM vt", vctx)
    engine.execute("CREATE VIEW v_s2 COMMENT = 'top scores' AS SELECT score FROM vt", vctx)
    res = engine.execute("SHOW VIEWS", vctx)
    names = {r[0] for r in res.rows}
    assert {"V_S1", "V_S2"} <= names
    res = engine.execute("SHOW VIEWS LIKE 'v_s2'", vctx)
    assert len(res.rows) == 1 and res.rows[0][4] == "top scores"


def test_dml_through_base_table_not_view(engine, vctx):
    engine.execute("CREATE VIEW v_ro AS SELECT id FROM vt", vctx)
    with pytest.raises(errors.SnowflakeError):
        engine.execute("INSERT INTO v_ro VALUES (9)", vctx)


def test_describe_view(engine, vctx):
    engine.execute("CREATE VIEW v_desc AS SELECT id, grp FROM vt", vctx)
    res = engine.execute("DESCRIBE VIEW v_desc", vctx)
    assert [r[0] for r in res.rows] == ["ID", "GRP"]


def test_dynamic_table_create_refresh_drop(engine):
    """CREATE DYNAMIC TABLE materializes the query; ALTER ... REFRESH
    re-runs it against current sources into a new immutable version."""
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE dt_src (k INTEGER, v INTEGER)", ctx)
    engine.execute("INSERT INTO dt_src VALUES (1, 10), (1, 20), (2, 5)", ctx)
    engine.execute(
        "CREATE DYNAMIC TABLE dt_roll TARGET_LAG = '10 minutes' AS "
        "SELECT k, CAST(sum(v) AS BIGINT) AS total FROM dt_src GROUP BY k", ctx)
    res = engine.execute("SELECT k, total FROM dt_roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 30), (2, 5)]
    # stale until refreshed (materialized, not a live view)
    engine.execute("INSERT INTO dt_src VALUES (2, 95)", ctx)
    res = engine.execute("SELECT k, total FROM dt_roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 30), (2, 5)]
    engine.execute("ALTER DYNAMIC TABLE dt_roll REFRESH", ctx)
    res = engine.execute("SELECT k, total FROM dt_roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 30), (2, 100)]
    # listed with its kind; dropping removes the definition
    res = engine.execute("SHOW TABLES", ctx)
    assert any(r[0] == "DT_ROLL" and r[3] == "DYNAMIC TABLE" for r in res.rows)
    engine.execute("DROP DYNAMIC TABLE dt_roll", ctx)
    import pytest as _pytest
    with _pytest.raises(Exception):
        engine.execute("SELECT * FROM dt_roll", ctx)


def test_show_dynamic_tables_and_objects(engine):
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE sdt_base (k INTEGER)", ctx)
    engine.execute("INSERT INTO sdt_base VALUES (1)", ctx)
    engine.execute(
        "CREATE DYNAMIC TABLE sdt_d TARGET_LAG = '1 hour' AS SELECT k FROM sdt_base", ctx)
    engine.execute("CREATE VIEW sdt_v AS SELECT k FROM sdt_base", ctx)
    res = engine.execute("SHOW DYNAMIC TABLES", ctx)
    assert [r[0] for r in res.rows] == ["SDT_D"]
    assert res.rows[0][3] == "1 hour"
    names = {(r[0], r[3]) for r in engine.execute("SHOW OBJECTS", ctx).rows}
    assert ("SDT_BASE", "TABLE") in names and ("SDT_V", "VIEW") in names \
        and ("SDT_D", "DYNAMIC TABLE") in names


def test_materialized_view_lifecycle(engine):
    """CREATE MATERIALIZED VIEW materializes the SELECT (same machinery
    as dynamic tables); querying reads the materialization (stale until
    ALTER … REFRESH — Snowflake's background refresh made explicit);
    SHOW MATERIALIZED VIEWS lists it; DROP removes it."""
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE mv_src (id INTEGER, amt INTEGER)", ctx)
    engine.execute("INSERT INTO mv_src VALUES (1, 10), (2, 20)", ctx)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv_sum AS "
        "SELECT CAST(sum(amt) AS BIGINT) AS total FROM mv_src", ctx)
    assert engine.execute("SELECT total FROM mv_sum", ctx).rows == [[30]]
    engine.execute("INSERT INTO mv_src VALUES (3, 30)", ctx)
    # stale until refreshed
    assert engine.execute("SELECT total FROM mv_sum", ctx).rows == [[30]]
    engine.execute("ALTER MATERIALIZED VIEW mv_sum REFRESH", ctx)
    assert engine.execute("SELECT total FROM mv_sum", ctx).rows == [[60]]
    rows = engine.execute("SHOW MATERIALIZED VIEWS", ctx).rows
    assert any(r[0] == "MV_SUM" and "sum(amt)" in r[3] for r in rows)
    engine.execute("DROP MATERIALIZED VIEW mv_sum", ctx)
    assert all(r[0] != "MV_SUM"
               for r in engine.execute("SHOW MATERIALIZED VIEWS", ctx).rows)
    engine.execute("DROP MATERIALIZED VIEW IF EXISTS mv_sum", ctx)  # no raise
