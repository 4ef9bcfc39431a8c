"""CREATE SEQUENCE / NEXTVAL (beyond reference). Snowflake sequence
semantics: unique, allowed to have gaps — implemented as per-statement
block reservation + executor-side monotonically_increasing_id, so
drawing values over a 100 TB source stays a coordination-free map."""

import pytest

from snowflake_emulator_spark import errors
from snowflake_emulator_spark.executor import SessionContext


def _rows(res):
    return [tuple(r) for r in res.rows]


def test_sequence_in_insert_values(engine):
    ctx = SessionContext()
    engine.execute("CREATE SEQUENCE sq1", ctx)
    engine.execute("CREATE TABLE sq_t (id BIGINT, v VARCHAR)", ctx)
    engine.execute("INSERT INTO sq_t VALUES (sq1.NEXTVAL, 'a'), (sq1.NEXTVAL, 'b')", ctx)
    engine.execute("INSERT INTO sq_t VALUES (sq1.NEXTVAL, 'c')", ctx)
    rows = _rows(engine.execute("SELECT id, v FROM sq_t ORDER BY v", ctx))
    ids = [r[0] for r in rows]
    assert len(set(ids)) == 3  # unique across statements
    assert all(isinstance(i, int) for i in ids)


def test_sequence_in_insert_select_distributed(engine):
    ctx = SessionContext()
    engine.execute("CREATE SEQUENCE sq2 START = 100 INCREMENT = 5", ctx)
    engine.execute("CREATE TABLE sq_src (x INTEGER)", ctx)
    engine.execute("INSERT INTO sq_src VALUES " + ",".join(f"({i})" for i in range(50)), ctx)
    engine.execute("CREATE TABLE sq_dst (id BIGINT, x INTEGER)", ctx)
    engine.execute("INSERT INTO sq_dst SELECT sq2.NEXTVAL, x FROM sq_src", ctx)
    rows = _rows(engine.execute("SELECT id FROM sq_dst", ctx))
    ids = [r[0] for r in rows]
    assert len(set(ids)) == 50  # unique across partitions
    assert min(ids) >= 100
    assert all((i - 100) % 5 == 0 for i in ids)  # increment respected
    # a second statement's block never collides with the first's
    engine.execute("INSERT INTO sq_dst SELECT sq2.NEXTVAL, x FROM sq_src", ctx)
    ids2 = [r[0] for r in _rows(engine.execute("SELECT id FROM sq_dst", ctx))]
    assert len(set(ids2)) == 100


def test_sequence_ddl_and_show(engine):
    ctx = SessionContext()
    engine.execute("CREATE SEQUENCE sq3 START = 7", ctx)
    with pytest.raises(errors.SnowflakeError):
        engine.execute("CREATE SEQUENCE sq3", ctx)
    res = engine.execute("SHOW SEQUENCES LIKE 'sq3'", ctx)
    assert _rows(res) == [("SQ3", "TEST_DB", "PUBLIC", 7, 1)]
    engine.execute("DROP SEQUENCE sq3", ctx)
    assert engine.execute("SHOW SEQUENCES LIKE 'sq3'", ctx).rows == []
    with pytest.raises(errors.SnowflakeError):
        engine.execute("DROP SEQUENCE sq3", ctx)
