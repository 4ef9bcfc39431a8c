"""Schema evolution DDL (r8 session 2): ALTER TABLE SWAP WITH (pure
metadata-pointer swap, no data rewrite — Snowflake's metadata-only
semantics) and ALTER TABLE ALTER COLUMN (SET DATA TYPE / NOT NULL /
DEFAULT / COMMENT). Beyond reference: the reference's ALTER surface is
database-level only (pkg/handlers DDL routes)."""

import pytest

from snowflake_emulator_spark import errors


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


@pytest.fixture()
def two_tables(engine):
    engine.execute("CREATE TABLE swap_a (id INTEGER, v VARCHAR)")
    engine.execute("INSERT INTO swap_a VALUES (1, 'a1'), (2, 'a2')")
    engine.execute("CREATE TABLE swap_b (id INTEGER, w DOUBLE)")
    engine.execute("INSERT INTO swap_b VALUES (10, 1.5)")
    return engine


def test_swap_exchanges_contents_and_schema(two_tables):
    e = two_tables
    e.execute("ALTER TABLE swap_a SWAP WITH swap_b")
    assert rows(e, "SELECT id, w FROM swap_a ORDER BY id") == [(10, 1.5)]
    assert rows(e, "SELECT id, v FROM swap_b ORDER BY id") == [(1, "a1"), (2, "a2")]
    # DESCRIBE follows the swap
    d = e.execute("DESCRIBE TABLE swap_a")
    assert [r[0] for r in d.rows] == ["ID", "W"]


def test_swap_then_write_goes_to_new_identity(two_tables):
    e = two_tables
    e.execute("ALTER TABLE swap_a SWAP WITH swap_b")
    e.execute("INSERT INTO swap_a VALUES (11, 2.5)")
    assert rows(e, "SELECT COUNT(*) AS n FROM swap_a") == [(2,)]
    assert rows(e, "SELECT COUNT(*) AS n FROM swap_b") == [(2,)]


def test_swap_with_self_errors(two_tables):
    with pytest.raises(errors.SnowflakeError):
        two_tables.execute("ALTER TABLE swap_a SWAP WITH swap_a")


def test_swap_missing_target_errors(two_tables):
    with pytest.raises(errors.SnowflakeError):
        two_tables.execute("ALTER TABLE swap_a SWAP WITH nope_t")
    # IF EXISTS form is a silent no-op on a missing source
    two_tables.execute("ALTER TABLE IF EXISTS nope_t SWAP WITH swap_a")


def test_alter_column_set_data_type(engine):
    engine.execute("CREATE TABLE ac_t (id INTEGER, amt NUMBER(6,2))")
    engine.execute("INSERT INTO ac_t VALUES (1, 12.34)")
    engine.execute("ALTER TABLE ac_t ALTER COLUMN amt SET DATA TYPE NUMBER(12,4)")
    d = engine.execute("DESCRIBE TABLE ac_t")
    assert d.rows[1][1] == "NUMBER(12,4)"
    assert rows(engine, "SELECT amt FROM ac_t")[0][0] is not None
    # widening VARCHAR works on the modify spelling too
    engine.execute("ALTER TABLE ac_t MODIFY id VARCHAR(10)")
    assert rows(engine, "SELECT id FROM ac_t") == [("1",)]


def test_alter_column_not_null_roundtrip(engine):
    engine.execute("CREATE TABLE nn_t (id INTEGER, v VARCHAR)")
    engine.execute("INSERT INTO nn_t VALUES (1, 'x')")
    engine.execute("ALTER TABLE nn_t ALTER COLUMN v SET NOT NULL")
    d = engine.execute("DESCRIBE TABLE nn_t")
    assert d.rows[1][3] == "N"
    engine.execute("ALTER TABLE nn_t ALTER COLUMN v DROP NOT NULL")
    d = engine.execute("DESCRIBE TABLE nn_t")
    assert d.rows[1][3] == "Y"


def test_alter_column_set_not_null_rejects_nulls(engine):
    engine.execute("CREATE TABLE nn2_t (id INTEGER, v VARCHAR)")
    engine.execute("INSERT INTO nn2_t VALUES (1, NULL)")
    with pytest.raises(errors.SnowflakeError):
        engine.execute("ALTER TABLE nn2_t ALTER COLUMN v SET NOT NULL")


def test_alter_column_default_and_comment(engine):
    engine.execute("CREATE TABLE dc_t (id INTEGER, v VARCHAR)")
    engine.execute("ALTER TABLE dc_t ALTER COLUMN v SET DEFAULT 'unset'")
    d = engine.execute("DESCRIBE TABLE dc_t")
    assert d.rows[1][4] == "'unset'"
    # default applies to INSERTs that omit the column
    engine.execute("INSERT INTO dc_t (id) VALUES (1)")
    assert rows(engine, "SELECT v FROM dc_t") == [("unset",)]
    engine.execute("ALTER TABLE dc_t ALTER COLUMN v DROP DEFAULT")
    d = engine.execute("DESCRIBE TABLE dc_t")
    assert d.rows[1][4] is None
    engine.execute("ALTER TABLE dc_t ALTER COLUMN v COMMENT 'freeform'")
    engine.execute("ALTER TABLE dc_t ALTER COLUMN v UNSET COMMENT")


def test_alter_multi_column_paren_form(engine):
    engine.execute("CREATE TABLE mc_t (a INTEGER, b INTEGER NOT NULL)")
    engine.execute("ALTER TABLE mc_t ALTER (COLUMN a SET NOT NULL, "
                   "COLUMN b DROP NOT NULL)")
    d = engine.execute("DESCRIBE TABLE mc_t")
    assert [(r[0], r[3]) for r in d.rows] == [("A", "N"), ("B", "Y")]


def test_sample_system_block_tablesample(engine):
    """SYSTEM/BLOCK sampling emulated as row sampling; bare TABLESAMPLE
    is the Snowflake synonym of SAMPLE."""
    engine.execute("CREATE TABLE smp_t (id INTEGER)")
    engine.execute("INSERT INTO smp_t SELECT EXPLODE(SEQUENCE(1, 100)) AS id")
    for q in ["SELECT COUNT(*) AS n FROM smp_t SAMPLE SYSTEM (50)",
              "SELECT COUNT(*) AS n FROM smp_t SAMPLE BLOCK (50) SEED (7)",
              "SELECT COUNT(*) AS n FROM smp_t TABLESAMPLE (50)"]:
        [(n,)] = rows(engine, q)
        assert 20 <= n <= 80
    assert rows(engine, "SELECT COUNT(*) AS n FROM smp_t TABLESAMPLE (10 ROWS)") == [(10,)]


def test_alter_column_unknown_column_errors(engine):
    engine.execute("CREATE TABLE uk_t (id INTEGER)")
    with pytest.raises(errors.SnowflakeError):
        engine.execute("ALTER TABLE uk_t ALTER COLUMN ghost SET NOT NULL")


def test_comment_on_column_and_desc_namespace(engine):
    engine.execute("CREATE TABLE cc_t (a INTEGER)")
    engine.execute("COMMENT ON COLUMN cc_t.a IS 'the a column'")
    d = engine.execute("DESCRIBE DATABASE test_db")
    assert ["PUBLIC"] == sorted({r[0] for r in d.rows if r[0] == "PUBLIC"})
    s = engine.execute("DESCRIBE SCHEMA public")
    assert ("CC_T", "TABLE") in {tuple(r) for r in s.rows}
    with pytest.raises(errors.SnowflakeError):
        engine.execute("COMMENT ON COLUMN cc_t.ghost IS 'x'")


def test_truncate_if_exists_and_alter_view_rename(engine):
    engine.execute("CREATE TABLE tr_t (a INTEGER)")
    engine.execute("INSERT INTO tr_t VALUES (1)")
    engine.execute("TRUNCATE TABLE IF EXISTS tr_t")
    assert rows(engine, "SELECT COUNT(*) AS n FROM tr_t") == [(0,)]
    engine.execute("TRUNCATE TABLE IF EXISTS ghost_t")  # silent no-op
    engine.execute("CREATE VIEW rv AS SELECT 7 AS x")
    engine.execute("ALTER VIEW rv RENAME TO rv2")
    assert rows(engine, "SELECT x FROM rv2") == [(7,)]
    with pytest.raises(errors.SnowflakeError):
        engine.execute("SELECT x FROM rv")
