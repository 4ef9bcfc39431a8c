"""CDC streams over versioned tables (Snowflake CREATE STREAM; beyond
the reference — its change model has no stream objects). The stream
offset pins a table version; reading the stream diffs current contents
against the pinned version with METADATA$ columns."""

import pytest

from snowflake_emulator_spark.executor import SessionContext


def _rows(res):
    return [tuple(r) for r in res.rows]


def test_stream_insert_delete_and_consume(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE st (id INTEGER, v VARCHAR)", ctx)
    engine.execute("INSERT INTO st VALUES (1, 'pre'), (2, 'pre2')", ctx)
    engine.execute("CREATE STREAM st_s ON TABLE st", ctx)
    # stream is empty at creation
    res = engine.execute("SELECT count(*) AS n FROM st_s", ctx)
    assert _rows(res) == [(0,)]
    # inserts show up with METADATA$ACTION = INSERT
    engine.execute("INSERT INTO st VALUES (3, 'new'), (4, 'new2')", ctx)
    res = engine.execute(
        "SELECT id, METADATA$ACTION FROM st_s ORDER BY id", ctx)
    assert _rows(res) == [(3, "INSERT"), (4, "INSERT")]
    # a delete of a pre-existing row shows as DELETE
    engine.execute("DELETE FROM st WHERE id = 1", ctx)
    res = engine.execute(
        "SELECT id, METADATA$ACTION FROM st_s ORDER BY id", ctx)
    assert _rows(res) == [(1, "DELETE"), (3, "INSERT"), (4, "INSERT")]
    # consuming via INSERT..SELECT advances the offset; stream drains
    engine.execute("CREATE TABLE st_tgt (id INTEGER, v VARCHAR)", ctx)
    r = engine.execute(
        "INSERT INTO st_tgt SELECT id, v FROM st_s WHERE METADATA$ACTION = 'INSERT'", ctx)
    assert r.rows_inserted == 2
    assert _rows(engine.execute("SELECT count(*) AS n FROM st_s", ctx)) == [(0,)]
    # update after consumption = DELETE old + INSERT new (full-row diff)
    engine.execute("UPDATE st SET v = 'upd' WHERE id = 3", ctx)
    res = engine.execute(
        "SELECT v, METADATA$ACTION FROM st_s ORDER BY METADATA$ACTION", ctx)
    assert _rows(res) == [("new", "DELETE"), ("upd", "INSERT")]


def test_stream_append_only_and_show_drop(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE sa (id INTEGER)", ctx)
    engine.execute("CREATE STREAM sa_s ON TABLE sa APPEND_ONLY = TRUE", ctx)
    engine.execute("INSERT INTO sa VALUES (1), (2)", ctx)
    engine.execute("DELETE FROM sa WHERE id = 1", ctx)
    # append-only: the delete is invisible, only the insert of id=2
    # survives (id=1 was inserted then deleted -> net absent from diff)
    res = engine.execute("SELECT id, METADATA$ACTION FROM sa_s", ctx)
    assert _rows(res) == [(2, "INSERT")]
    res = engine.execute("SHOW STREAMS", ctx)
    assert any(r[0] == "SA_S" and r[4] == "APPEND_ONLY" for r in _rows(res))
    engine.execute("DROP STREAM sa_s", ctx)
    with pytest.raises(Exception):
        engine.execute("SELECT * FROM sa_s", ctx)
    assert _rows(engine.execute("SHOW STREAMS", ctx)) == []


def test_stream_offset_survives_many_writes_gc(engine):
    """The stream's pinned offset version must survive version GC
    (keep=3) across many subsequent writes."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE sg (id INTEGER)", ctx)
    engine.execute("INSERT INTO sg VALUES (0)", ctx)
    engine.execute("CREATE STREAM sg_s ON TABLE sg", ctx)
    for i in range(1, 7):
        engine.execute(f"INSERT INTO sg VALUES ({i})", ctx)
    res = engine.execute("SELECT count(*) AS n FROM sg_s", ctx)
    assert _rows(res) == [(6,)]


def test_stream_stale_after_table_replace(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE sr (id INTEGER)", ctx)
    engine.execute("CREATE STREAM sr_s ON TABLE sr", ctx)
    engine.execute("CREATE OR REPLACE TABLE sr (id INTEGER, v VARCHAR)", ctx)
    with pytest.raises(Exception):
        engine.execute("SELECT * FROM TEST_DB.PUBLIC.sr_s", ctx)


def test_stream_merge_consumption(engine):
    """MERGE USING <stream> applies the delta and advances the offset."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE msrc (id INTEGER, v VARCHAR)", ctx)
    engine.execute("CREATE TABLE mtgt (id INTEGER, v VARCHAR)", ctx)
    engine.execute("CREATE STREAM m_s ON TABLE msrc APPEND_ONLY = TRUE", ctx)
    engine.execute("INSERT INTO msrc VALUES (1, 'a'), (2, 'b')", ctx)
    r = engine.execute(
        "MERGE INTO mtgt USING m_s AS s ON mtgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)", ctx)
    assert r.rows_inserted == 2
    # offset advanced: stream drained
    assert _rows(engine.execute("SELECT count(*) AS n FROM m_s", ctx)) == [(0,)]


def test_stream_incremental_rollup_maintenance(engine):
    """The incremental-materialized-view pattern this engine is built
    for at 100 TB: a per-key rollup maintained from a CDC stream's
    delta via MERGE — each refresh touches only changed keys, never
    rescans the fact table. (Snowflake docs call this the
    TASK + STREAM + MERGE recipe; here driven manually.)"""
    ctx = SessionContext()
    engine.execute("CREATE TABLE fact (k INTEGER, amt INTEGER)", ctx)
    engine.execute("CREATE TABLE roll (k INTEGER, total INTEGER)", ctx)
    engine.execute("INSERT INTO fact VALUES (1, 10), (2, 20)", ctx)
    # initial full build, then the stream tracks everything after it
    engine.execute("INSERT INTO roll SELECT k, sum(amt) FROM fact GROUP BY k", ctx)
    engine.execute("CREATE STREAM fact_delta ON TABLE fact APPEND_ONLY = TRUE", ctx)

    def refresh():
        engine.execute(
            "MERGE INTO roll USING ("
            "  SELECT k, sum(amt) AS d FROM fact_delta"
            "  WHERE METADATA$ACTION = 'INSERT' GROUP BY k"
            ") delta ON roll.k = delta.k "
            "WHEN MATCHED THEN UPDATE SET total = roll.total + delta.d "
            "WHEN NOT MATCHED THEN INSERT (k, total) VALUES (delta.k, delta.d)",
            ctx,
        )

    engine.execute("INSERT INTO fact VALUES (1, 5), (3, 30)", ctx)
    refresh()
    res = engine.execute("SELECT k, total FROM roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 15), (2, 20), (3, 30)]
    # the MERGE consumed the stream: refresh again is a no-op
    refresh()
    res = engine.execute("SELECT k, total FROM roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 15), (2, 20), (3, 30)]
    # next batch only carries the new delta
    engine.execute("INSERT INTO fact VALUES (2, -20)", ctx)
    refresh()
    res = engine.execute("SELECT k, total FROM roll ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 15), (2, 0), (3, 30)]


def test_task_lifecycle_and_incremental_refresh(engine):
    """CREATE TASK stores the refresh SQL; EXECUTE TASK runs it —
    the Snowflake stream+task+MERGE triad driven on demand."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE f2 (k INTEGER, amt INTEGER)", ctx)
    engine.execute("CREATE TABLE r2 (k INTEGER, total INTEGER)", ctx)
    engine.execute("CREATE STREAM f2_delta ON TABLE f2 APPEND_ONLY = TRUE", ctx)
    engine.execute(
        "CREATE TASK refresh_r2 SCHEDULE = '5 MINUTE' COMMENT = 'rollup' AS "
        "MERGE INTO r2 USING ("
        "  SELECT k, sum(amt) AS d FROM f2_delta"
        "  WHERE METADATA$ACTION = 'INSERT' GROUP BY k"
        ") delta ON r2.k = delta.k "
        "WHEN MATCHED THEN UPDATE SET total = r2.total + delta.d "
        "WHEN NOT MATCHED THEN INSERT (k, total) VALUES (delta.k, delta.d)",
        ctx,
    )
    res = engine.execute("SHOW TASKS", ctx)
    row = next(r for r in res.rows if r[0] == "REFRESH_R2")
    assert row[3] == "5 MINUTE" and row[4] == "suspended"
    engine.execute("ALTER TASK refresh_r2 RESUME", ctx)
    assert next(r for r in engine.execute("SHOW TASKS", ctx).rows
                if r[0] == "REFRESH_R2")[4] == "started"
    engine.execute("INSERT INTO f2 VALUES (1, 10), (2, 20)", ctx)
    engine.execute("EXECUTE TASK refresh_r2", ctx)
    res = engine.execute("SELECT k, total FROM r2 ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 10), (2, 20)]
    engine.execute("INSERT INTO f2 VALUES (1, 5)", ctx)
    engine.execute("EXECUTE TASK refresh_r2", ctx)
    res = engine.execute("SELECT k, total FROM r2 ORDER BY k", ctx)
    assert [tuple(r) for r in res.rows] == [(1, 15), (2, 20)]
    engine.execute("DROP TASK refresh_r2", ctx)
    assert all(r[0] != "REFRESH_R2" for r in engine.execute("SHOW TASKS", ctx).rows)


def test_show_tasks_scoped_to_current_database(engine):
    """SHOW TASKS lists only the session database's tasks, like the
    other SHOW handlers (Snowflake per-DB scoping)."""
    ctx = SessionContext()
    engine.execute("CREATE TASK scoped_task SCHEDULE = '1 HOUR' AS SELECT 1", ctx)
    assert any(r[0] == "SCOPED_TASK" for r in engine.execute("SHOW TASKS", ctx).rows)
    engine.execute("CREATE DATABASE other_task_db", ctx)
    other = SessionContext(database="OTHER_TASK_DB")
    assert all(r[0] != "SCOPED_TASK"
               for r in engine.execute("SHOW TASKS", other).rows)
    engine.execute("DROP TASK scoped_task", ctx)
