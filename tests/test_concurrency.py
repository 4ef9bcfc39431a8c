"""Concurrency: reads concurrent, writes serialized by the catalog lock
(reference analog: pkg/connection/manager.go:16-63 write mutex;
tests/integration/server_integration_test.go:323 concurrent sessions)."""

import threading

from snowflake_emulator_spark.executor import SessionContext


def test_concurrent_reads_and_writes(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE conc (id INTEGER, v INTEGER)", ctx)
    engine.execute("INSERT INTO conc VALUES (0, 0)", ctx)

    errors: list[Exception] = []

    def writer(i: int):
        try:
            c = SessionContext()
            engine.execute(f"INSERT INTO conc VALUES ({i}, {i * 10})", c)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            c = SessionContext()
            engine.execute("SELECT count(*) AS n FROM conc", c)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, 6)]
    threads += [threading.Thread(target=reader) for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    res = engine.execute("SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM conc", ctx)
    # every write must have landed exactly once (serialized appends)
    assert tuple(res.rows[0]) == (6, sum(i * 10 for i in range(1, 6)))


def test_concurrent_sessions_isolated_namespaces(engine):
    engine.execute("CREATE DATABASE cdb1")
    engine.execute("CREATE DATABASE cdb2")
    ctx1 = SessionContext("CDB1", "PUBLIC")
    ctx2 = SessionContext("CDB2", "PUBLIC")
    engine.execute("CREATE TABLE t (x INTEGER)", ctx1)
    engine.execute("CREATE TABLE t (x INTEGER)", ctx2)
    engine.execute("INSERT INTO t VALUES (1)", ctx1)
    engine.execute("INSERT INTO t VALUES (2),(3)", ctx2)
    r1 = engine.execute("SELECT count(*) AS n FROM cdb1.public.t", ctx1)
    r2 = engine.execute("SELECT count(*) AS n FROM cdb2.public.t", ctx2)
    assert tuple(r1.rows[0]) == (1,)
    assert tuple(r2.rows[0]) == (2,)


def test_concurrent_identical_copy_loads_once(engine, tmp_path):
    """Two threads racing the SAME COPY must load the file once — the
    per-table COPY mutex makes the history check/load/record sequence
    atomic (Snowflake load-history semantics)."""
    import threading

    from snowflake_emulator_spark.sessions import SessionContext

    ctx = SessionContext()
    engine.execute("CREATE TABLE cc_lh (id INTEGER)", ctx)
    engine.execute("CREATE STAGE cc_s", ctx)
    p = tmp_path / "r.csv"
    p.write_text("1\n2\n3\n")
    engine.stages.put_file(engine.catalog.get_stage("cc_s"), str(p))
    errs = []

    def run():
        try:
            engine.execute(
                "COPY INTO cc_lh FROM @cc_s FILE_FORMAT=(TYPE=CSV)",
                SessionContext())
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert engine.execute("SELECT count(*) AS n FROM cc_lh", ctx).rows == [[3]]
