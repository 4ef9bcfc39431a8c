"""COPY INTO edge cases mirroring the reference's copy-processor suite
(`/root/reference/pkg/query/copy_processor_test.go:241-485`): JSON
strip-outer-array and $1-VARIANT modes, delimiters, NULL_IF, PURGE,
pattern filtering, ON_ERROR, parquet (beyond-reference upgrade)."""

import pytest

from snowflake_emulator_spark.executor import SessionContext


@pytest.fixture()
def ctx():
    return SessionContext()


def _stage_with(engine, tmp_path, name, files):
    engine.execute(f"CREATE STAGE {name}")
    stage = engine.catalog.get_stage(name)
    for fname, content in files.items():
        p = tmp_path / fname
        if isinstance(content, bytes):
            p.write_bytes(content)
        else:
            p.write_text(content)
        engine.stages.put_file(stage, str(p))
    return stage


def test_copy_csv_delimiter_and_nulls(engine, tmp_path, ctx):
    engine.execute("CREATE TABLE c1 (id INTEGER, name VARCHAR, score INTEGER)", ctx)
    _stage_with(engine, tmp_path, "s1", {"d.csv": "1|Alice|90\n2||85\n3|Carol|\n"})
    r = engine.execute("COPY INTO c1 FROM @s1 FILE_FORMAT=(TYPE=CSV FIELD_DELIMITER='|')", ctx)
    assert r.rows_loaded == 3
    rows = [tuple(x) for x in engine.execute("SELECT * FROM c1 ORDER BY id", ctx).rows]
    assert rows == [(1, "Alice", 90), (2, None, 85), (3, "Carol", None)]


def test_copy_json_strip_outer_array(engine, tmp_path, ctx):
    engine.execute("CREATE TABLE j1 (id INTEGER, name VARCHAR)", ctx)
    _stage_with(engine, tmp_path, "s2", {"d.json": '[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]'})
    r = engine.execute("COPY INTO j1 FROM @s2 FILE_FORMAT=(TYPE=JSON STRIP_OUTER_ARRAY=TRUE)", ctx)
    assert r.rows_loaded == 2
    rows = [tuple(x) for x in engine.execute("SELECT * FROM j1 ORDER BY id", ctx).rows]
    assert rows == [(1, "a"), (2, "b")]


def test_copy_json_variant_mode(engine, tmp_path, ctx):
    """Non-strip mode: each element lands as JSON text in a single
    VARIANT column (copy_processor.go:399-416)."""
    engine.execute("CREATE TABLE j2 (v VARIANT)", ctx)
    _stage_with(engine, tmp_path, "s3", {"d.json": '[{"a": 1}, {"a": 2}]'})
    r = engine.execute("COPY INTO j2 FROM @s3 FILE_FORMAT=(TYPE=JSON)", ctx)
    assert r.rows_loaded == 2
    rows = sorted(x[0] for x in engine.execute("SELECT v FROM j2", ctx).rows)
    assert rows == ['{"a":1}', '{"a":2}']


def test_copy_pattern_and_purge(engine, tmp_path, ctx):
    engine.execute("CREATE TABLE c2 (id INTEGER)", ctx)
    stage = _stage_with(engine, tmp_path, "s4", {"a.csv": "1\n", "b.csv": "2\n", "c.txt": "3\n"})
    r = engine.execute("COPY INTO c2 FROM @s4 PATTERN='.*[.]csv' PURGE=TRUE", ctx)
    assert r.files_loaded == 2
    assert engine.stages.list_files(stage) == ["c.txt"]  # purged loaded files only


def test_copy_on_error_skip_file(engine, tmp_path, ctx):
    engine.execute("CREATE TABLE c3 (id INTEGER, v INTEGER)", ctx)
    _stage_with(engine, tmp_path, "s5", {"good.csv": "1,10\n", "bad.csv": "1,2,3,4\n"})
    r = engine.execute("COPY INTO c3 FROM @s5 ON_ERROR=SKIP_FILE", ctx)
    assert r.files_loaded == 1
    assert len(r.errors) == 1
    # ABORT mode raises
    engine.execute("CREATE TABLE c4 (id INTEGER, v INTEGER)", ctx)
    with pytest.raises(Exception):
        engine.execute("COPY INTO c4 FROM @s5 ON_ERROR=ABORT_STATEMENT", ctx)


def test_copy_parquet(engine, tmp_path, ctx):
    """Parquet loading — declared but unimplemented in the reference
    (copy_processor.go:266-268); a free upgrade on Spark."""
    engine.execute("CREATE TABLE p1 (id BIGINT, name VARCHAR)", ctx)
    df = engine.spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])
    local = tmp_path / "part.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pq"))
    import glob
    import shutil

    src = glob.glob(str(tmp_path / "pq" / "*.parquet"))[0]
    shutil.copy(src, local)
    engine.execute("CREATE STAGE s6", ctx)
    engine.stages.put_file(engine.catalog.get_stage("s6"), str(local), "data.parquet")
    r = engine.execute("COPY INTO p1 FROM @s6 FILE_FORMAT=(TYPE=PARQUET)", ctx)
    assert r.rows_loaded == 2
    rows = [tuple(x) for x in engine.execute("SELECT * FROM p1 ORDER BY id", ctx).rows]
    assert rows == [(1, "x"), (2, "y")]


def test_copy_file_format_object(engine, tmp_path, ctx):
    """COPY with a named FILE FORMAT object (D9 + S4)."""
    engine.execute("CREATE FILE FORMAT my_fmt TYPE='CSV' FIELD_DELIMITER=';' SKIP_HEADER=1", ctx)
    engine.execute("CREATE TABLE c5 (id INTEGER, name VARCHAR)", ctx)
    _stage_with(engine, tmp_path, "s7", {"d.csv": "id;name\n1;x\n"})
    r = engine.execute("COPY INTO c5 FROM @s7 FILE_FORMAT=(FORMAT_NAME='MY_FMT')", ctx)
    assert r.rows_loaded == 1
    assert [tuple(x) for x in engine.execute("SELECT * FROM c5", ctx).rows] == [(1, "x")]


def test_copy_unload_parquet_roundtrip(engine, tmp_path):
    """COPY INTO @stage FROM ... (export, beyond reference): parquet
    shards written distributed, then loaded back via COPY INTO table."""
    ctx = SessionContext()
    engine.execute("CREATE STAGE unload_st", ctx)
    engine.execute("CREATE TABLE u_src (id INTEGER, name VARCHAR)", ctx)
    engine.execute("INSERT INTO u_src VALUES (1,'a'),(2,'b'),(3,'c')", ctx)
    r = engine.execute(
        "COPY INTO @unload_st/out FROM (SELECT id, name FROM u_src WHERE id <= 2) "
        "FILE_FORMAT = (TYPE = PARQUET) OVERWRITE = TRUE", ctx)
    assert r.rows[0][0] == 2
    # round-trip: load the exported shards into a fresh table
    engine.execute("CREATE TABLE u_dst (id INTEGER, name VARCHAR)", ctx)
    r2 = engine.execute(
        "COPY INTO u_dst FROM @unload_st/out FILE_FORMAT = (TYPE = PARQUET) "
        "PATTERN = '.*parquet'", ctx)
    assert r2.rows_loaded == 2
    res = engine.execute("SELECT id, name FROM u_dst ORDER BY id", ctx)
    assert [tuple(r) for r in res.rows] == [(1, "a"), (2, "b")]


def test_copy_unload_csv_header(engine, tmp_path):
    ctx = SessionContext()
    engine.execute("CREATE STAGE unload_csv", ctx)
    engine.execute("CREATE TABLE u2_src (id INTEGER, v VARCHAR)", ctx)
    engine.execute("INSERT INTO u2_src VALUES (7,'x')", ctx)
    r = engine.execute(
        "COPY INTO @unload_csv/c FROM u2_src FILE_FORMAT = (TYPE = CSV) "
        "HEADER = TRUE OVERWRITE = TRUE", ctx)
    assert r.rows[0][0] == 1
    import glob as _glob
    stage = engine.catalog.get_stage("unload_csv")
    from snowflake_emulator_spark.sources.stage import StageManager
    root = StageManager(engine.catalog)._resolve_inside(stage, "c")
    files = [f for f in _glob.glob(root + "/*.csv")]
    assert files
    content = open(files[0]).read()
    assert content.splitlines()[0] == "ID,V" or content.splitlines()[0] == "id,v"
    assert "7,x" in content


def test_copy_orc_roundtrip(engine, tmp_path):
    """ORC unload + load (beyond reference: Spark-native columnar
    format alongside PARQUET)."""
    ctx = SessionContext()
    engine.execute("CREATE STAGE orc_st", ctx)
    engine.execute("CREATE TABLE orc_src (id INTEGER, name VARCHAR)", ctx)
    engine.execute("INSERT INTO orc_src VALUES (1,'a'),(2,'b')", ctx)
    r = engine.execute(
        "COPY INTO @orc_st/o FROM orc_src FILE_FORMAT = (TYPE = ORC) "
        "OVERWRITE = TRUE", ctx)
    assert r.rows[0][0] == 2
    engine.execute("CREATE TABLE orc_dst (id INTEGER, name VARCHAR)", ctx)
    r2 = engine.execute(
        "COPY INTO orc_dst FROM @orc_st/o FILE_FORMAT = (TYPE = ORC) "
        "PATTERN = '.*orc'", ctx)
    assert r2.rows_loaded == 2
    res = engine.execute("SELECT id, name FROM orc_dst ORDER BY id", ctx)
    assert [tuple(x) for x in res.rows] == [(1, "a"), (2, "b")]


def test_copy_transformation_select(engine, tmp_path):
    """COPY INTO t FROM (SELECT $1, <expr>($2), … FROM @stage): real
    Snowflake load-time transform (beyond reference — it has no
    transform path). $N positional columns, translated functions in the
    select list, output cast into the table schema."""
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE xform_t (id INTEGER, name VARCHAR, score INTEGER)", ctx)
    engine.execute("CREATE STAGE xform_stage", ctx)
    stage = engine.catalog.get_stage("xform_stage")
    (tmp_path / "raw.csv").write_text("1,  alice ,90\n2, bob ,80\n")
    engine.stages.put_file(stage, str(tmp_path / "raw.csv"))
    r = engine.execute(
        "COPY INTO xform_t FROM (SELECT $1, UPPER(TRIM($2)), IFF($3 >= 85, $3 + 10, $3) "
        "FROM @xform_stage) FILE_FORMAT=(TYPE=CSV)", ctx)
    assert r.rows_loaded == 2
    res = engine.execute("SELECT id, name, score FROM xform_t ORDER BY id", ctx)
    assert [tuple(x) for x in res.rows] == [(1, "ALICE", 100), (2, "BOB", 80)]


def test_copy_xml_load_and_unload(engine, tmp_path, ctx):
    """XML round trip — beyond reference (it supports only CSV/JSON):
    COPY INTO table FROM @stage with TYPE=XML + ROW_TAG, and COPY INTO
    @stage unload with ROOT_TAG/ROW_TAG. Spark 4 ships the XML source
    built-in."""
    engine.execute("CREATE TABLE x1 (id BIGINT, name VARCHAR)", ctx)
    xml = ("<rows><row><id>1</id><name>x</name></row>"
           "<row><id>2</id><name>y</name></row></rows>")
    local = tmp_path / "data.xml"
    local.write_text(xml)
    engine.execute("CREATE STAGE sx1", ctx)
    engine.stages.put_file(engine.catalog.get_stage("sx1"), str(local), "data.xml")
    r = engine.execute(
        "COPY INTO x1 FROM @sx1 FILE_FORMAT=(TYPE=XML ROW_TAG='row')", ctx)
    assert r.rows_loaded == 2
    rows = [tuple(x) for x in
            engine.execute("SELECT * FROM x1 ORDER BY id", ctx).rows]
    assert rows == [(1, "x"), (2, "y")]
    # unload back out as XML and re-read via Spark to close the loop
    r = engine.execute(
        "COPY INTO @sx1/out/ FROM x1 FILE_FORMAT=(TYPE=XML ROW_TAG='row')", ctx)
    assert r.rows_loaded == 2
    stage_dir = engine.catalog.get_stage("sx1").directory
    back = (engine.spark.read.format("xml").option("rowTag", "row")
            .load(stage_dir + "/out"))
    # unloaded tags carry the catalog's uppercase column names
    assert sorted((x["ID"], x["NAME"]) for x in back.collect()) == [
        (1, "x"), (2, "y")]


def test_copy_avro_corrupt_file_clear_error(engine, tmp_path, ctx):
    """A corrupt AVRO file raises a clear COPY error (truncated
    metadata), not a silent partial load."""
    import pytest as _pytest

    engine.execute("CREATE TABLE avbad (id BIGINT)", ctx)
    local = tmp_path / "a.avro"
    local.write_bytes(b"Obj\x01fake")
    engine.execute("CREATE STAGE savbad", ctx)
    engine.stages.put_file(engine.catalog.get_stage("savbad"), str(local), "a.avro")
    with _pytest.raises(Exception, match="(?i)avro|truncated|COPY failed"):
        engine.execute("COPY INTO avbad FROM @savbad FILE_FORMAT=(TYPE=AVRO)", ctx)


def test_copy_load_history_and_force(engine, tmp_path, ctx):
    """Snowflake load-history semantics: re-running the same COPY
    skips already-loaded files (LOAD_SKIPPED), FORCE=TRUE reloads, and
    an overwritten file (new signature) re-qualifies."""
    engine.execute("CREATE TABLE lh (id INTEGER, name VARCHAR)", ctx)
    _stage_with(engine, tmp_path, "slh", {"a.csv": "1,x\n2,y\n"})
    r = engine.execute("COPY INTO lh FROM @slh FILE_FORMAT=(TYPE=CSV)", ctx)
    assert r.rows_loaded == 2
    # identical re-COPY: nothing loads, the file reports LOAD_SKIPPED
    r = engine.execute("COPY INTO lh FROM @slh FILE_FORMAT=(TYPE=CSV)", ctx)
    assert r.rows_loaded == 0
    assert [row[1] for row in r.rows] == ["LOAD_SKIPPED"]
    n = engine.execute("SELECT count(*) AS n FROM lh", ctx).rows[0][0]
    assert n == 2
    # FORCE=TRUE reloads regardless of history
    r = engine.execute(
        "COPY INTO lh FROM @slh FILE_FORMAT=(TYPE=CSV) FORCE=TRUE", ctx)
    assert r.rows_loaded == 2
    # an overwritten file (different content/signature) re-qualifies
    import time as _time

    _time.sleep(0.01)  # ensure a distinct mtime_ns
    stage = engine.catalog.get_stage("slh")
    local = tmp_path / "a2.csv"
    local.write_text("1,x\n2,y\n3,z\n")
    engine.stages.put_file(stage, str(local), "a.csv")
    r = engine.execute("COPY INTO lh FROM @slh FILE_FORMAT=(TYPE=CSV)", ctx)
    assert r.rows_loaded == 3


def test_pipe_create_refresh_show_drop(engine, tmp_path, ctx):
    """Snowpipe-lite: CREATE PIPE stores a COPY; ALTER PIPE REFRESH
    runs it, and load history makes each refresh incremental (only
    files not yet in the table load)."""
    import pytest as _pytest

    engine.execute("CREATE TABLE pt (id INTEGER, name VARCHAR)", ctx)
    _stage_with(engine, tmp_path, "sp", {"f1.csv": "1,a\n"})
    engine.execute(
        "CREATE PIPE p1 AS COPY INTO pt FROM @sp FILE_FORMAT=(TYPE=CSV)", ctx)
    rows = engine.execute("SHOW PIPES", ctx).rows
    assert any(r[0] == "P1" and "COPY INTO" in r[3] for r in rows)
    engine.execute("ALTER PIPE p1 REFRESH", ctx)
    assert engine.execute("SELECT count(*) AS n FROM pt", ctx).rows == [[1]]
    # a second refresh with no new files loads nothing
    engine.execute("ALTER PIPE p1 REFRESH", ctx)
    assert engine.execute("SELECT count(*) AS n FROM pt", ctx).rows == [[1]]
    # new file arrives -> only it loads on the next refresh
    stage = engine.catalog.get_stage("sp")
    local = tmp_path / "f2.csv"
    local.write_text("2,b\n3,c\n")
    engine.stages.put_file(stage, str(local), "f2.csv")
    engine.execute("ALTER PIPE p1 REFRESH", ctx)
    assert engine.execute("SELECT count(*) AS n FROM pt", ctx).rows == [[3]]
    engine.execute("DROP PIPE p1", ctx)
    with _pytest.raises(Exception):
        engine.execute("ALTER PIPE p1 REFRESH", ctx)
    engine.execute("DROP PIPE IF EXISTS p1", ctx)  # no raise


def test_get_ddl_pipe(engine, tmp_path, ctx):
    engine.execute("CREATE TABLE gd_t (id INTEGER)", ctx)
    _stage_with(engine, tmp_path, "sgd", {"x.csv": "1\n"})
    engine.execute(
        "CREATE PIPE gd_p AS COPY INTO gd_t FROM @sgd FILE_FORMAT=(TYPE=CSV)", ctx)
    d = engine.execute("SELECT GET_DDL('PIPE', 'gd_p') AS d", ctx).rows[0][0]
    assert d.startswith("CREATE OR REPLACE PIPE GD_P AS COPY INTO gd_t")


def test_copy_xml_nested_into_variant(engine, tmp_path, ctx):
    """Semistructured XML into a single VARIANT column: the whole
    record serializes as JSON (Snowflake's one-VARIANT-per-row XML
    load); a nested element becomes a JSON object, not a cast error."""
    engine.execute("CREATE TABLE xv (v VARIANT)", ctx)
    xml = ("<rows><row><id>1</id><who><name>ann</name><age>7</age></who></row>"
           "<row><id>2</id><who><name>bo</name><age>9</age></who></row></rows>")
    local = tmp_path / "n.xml"
    local.write_text(xml)
    engine.execute("CREATE STAGE sxv", ctx)
    engine.stages.put_file(engine.catalog.get_stage("sxv"), str(local), "n.xml")
    r = engine.execute(
        "COPY INTO xv FROM @sxv FILE_FORMAT=(TYPE=XML ROW_TAG='row')", ctx)
    assert r.rows_loaded == 2
    rows = engine.execute(
        "SELECT GET_PATH(v, 'who.name') AS nm FROM xv ORDER BY nm", ctx).rows
    assert [x[0] for x in rows] == ["ann", "bo"]


def test_copy_load_history_rolls_back_with_transaction(engine, tmp_path, ctx):
    """A COPY inside BEGIN...ROLLBACK reverts BOTH the rows and the
    per-file load-history entry: the retried COPY must actually load
    the file again, not report LOAD_SKIPPED over an empty table
    (r5 ADVICE item)."""
    engine.execute("CREATE TABLE ch1 (id INTEGER)", ctx)
    _stage_with(engine, tmp_path, "sh1", {"h.csv": "1\n2\n"})
    engine.execute("BEGIN", ctx)
    r = engine.execute("COPY INTO ch1 FROM @sh1", ctx)
    assert r.rows_loaded == 2
    engine.execute("ROLLBACK", ctx)
    assert engine.execute("SELECT count(*) AS n FROM ch1", ctx).rows[0][0] == 0
    # retry outside the transaction: history was reverted, so it loads
    r2 = engine.execute("COPY INTO ch1 FROM @sh1", ctx)
    assert r2.rows_loaded == 2
    assert [row[1] for row in r2.rows] == ["LOADED"]
    assert engine.execute("SELECT count(*) AS n FROM ch1", ctx).rows[0][0] == 2
    # and a third run IS dedup-skipped (committed history persists)
    r3 = engine.execute("COPY INTO ch1 FROM @sh1", ctx)
    assert [row[1] for row in r3.rows] == ["LOAD_SKIPPED"]


def test_copy_history_commit_preserved_across_other_tx_rollback(engine, tmp_path, ctx):
    """ROLLBACK only reverts history for tables the transaction wrote:
    a committed COPY on another table keeps its dedup marker."""
    from snowflake_emulator_spark.executor import SessionContext

    engine.execute("CREATE TABLE ch2 (id INTEGER)", ctx)
    engine.execute("CREATE TABLE ch3 (id INTEGER)", ctx)
    _stage_with(engine, tmp_path, "sh2", {"x.csv": "1\n"})
    engine.execute("COPY INTO ch2 FROM @sh2", ctx)  # committed load
    engine.execute("BEGIN", ctx)
    engine.execute("COPY INTO ch3 FROM @sh2", ctx)
    engine.execute("ROLLBACK", ctx)
    # ch2's committed history survives the unrelated rollback
    r = engine.execute("COPY INTO ch2 FROM @sh2", ctx)
    assert [row[1] for row in r.rows] == ["LOAD_SKIPPED"]


def test_pipe_refresh_resolves_in_pipe_schema(engine, tmp_path, ctx):
    """ALTER PIPE ... REFRESH executes the stored COPY in the PIPE's
    own database/schema, so unqualified names resolve as they did at
    CREATE PIPE time even when the refreshing session has switched
    schema (r5 ADVICE item; Snowflake pins a pipe to its schema)."""
    from snowflake_emulator_spark.executor import SessionContext

    engine.execute("CREATE SCHEMA pipe_sch", ctx)
    pctx = SessionContext(schema="PIPE_SCH")
    engine.execute("CREATE TABLE pp (id INTEGER)", pctx)
    _stage_with(engine, tmp_path, "pipe_sch.spp", {"p.csv": "7\n8\n"})
    engine.execute(
        "CREATE PIPE pipe_sch.pr AS COPY INTO pp FROM @spp "
        "FILE_FORMAT=(TYPE=CSV)", pctx)
    # a decoy same-named table in the refreshing session's schema must
    # NOT receive the rows
    engine.execute("CREATE TABLE pp (id INTEGER)", ctx)
    engine.execute("ALTER PIPE pipe_sch.pr REFRESH", ctx)
    assert engine.execute(
        "SELECT count(*) AS n FROM pipe_sch.pp", ctx).rows[0][0] == 2
    assert engine.execute("SELECT count(*) AS n FROM pp", ctx).rows[0][0] == 0


def test_copy_avro_load_and_unload(engine, tmp_path, ctx):
    """AVRO load + unload via the pure-Python OCF codec fallback
    (sources/avro_ocf.py — validated against the official Java Avro
    library; spark-avro takes over transparently when deployed).
    Beyond reference: it supports CSV/JSON only
    (copy_processor.go:266-268)."""
    from snowflake_emulator_spark.sources.avro_ocf import read_ocf, write_ocf

    engine.execute("CREATE TABLE av1 (id BIGINT, name VARCHAR, score DOUBLE)", ctx)
    src = tmp_path / "in.avro"
    write_ocf(str(src), ["id", "name", "score"],
              ["bigint", "string", "double"],
              [(1, "a", 0.5), (2, None, -1.25), (None, "c", None)])
    _stage_with(engine, tmp_path, "sav", {})
    engine.stages.put_file(engine.catalog.get_stage("sav"), str(src), "in.avro")
    r = engine.execute("COPY INTO av1 FROM @sav FILE_FORMAT=(TYPE=AVRO)", ctx)
    assert r.rows_loaded == 3
    rows = [tuple(x) for x in engine.execute(
        "SELECT * FROM av1 ORDER BY id NULLS FIRST", ctx).rows]
    assert rows == [(None, "c", None), (1, "a", 0.5), (2, None, -1.25)]
    # unload back to a stage prefix and re-read with the codec
    engine.execute(
        "COPY INTO @sav/out FROM av1 FILE_FORMAT=(TYPE=AVRO) OVERWRITE=TRUE", ctx)
    import glob
    import os as _os

    stage_dir = engine.catalog.get_stage("sav").directory
    files = glob.glob(_os.path.join(stage_dir, "out", "*.avro"))
    assert files
    got = []
    for f in files:
        _fields, rws = read_ocf(f)
        got.extend(rws)
    assert sorted(got, key=lambda r: (r[0] is None, r[0] or 0)) == [
        (1, "a", 0.5), (2, None, -1.25), (None, "c", None)]


def test_copy_avro_transform_select(engine, tmp_path, ctx):
    """COPY transform SELECT over an AVRO source ($N positional refs)."""
    from snowflake_emulator_spark.sources.avro_ocf import write_ocf

    engine.execute("CREATE TABLE av2 (id BIGINT, shout VARCHAR)", ctx)
    src = tmp_path / "t.avro"
    write_ocf(str(src), ["id", "name"], ["bigint", "string"],
              [(7, "abc"), (8, "xyz")], codec="null")
    _stage_with(engine, tmp_path, "sav2", {})
    engine.stages.put_file(engine.catalog.get_stage("sav2"), str(src), "t.avro")
    r = engine.execute(
        "COPY INTO av2 FROM (SELECT $1, UPPER($2) FROM @sav2) "
        "FILE_FORMAT=(TYPE=AVRO)", ctx)
    assert r.rows_loaded == 2
    rows = [tuple(x) for x in engine.execute(
        "SELECT * FROM av2 ORDER BY id", ctx).rows]
    assert rows == [(7, "ABC"), (8, "XYZ")]
