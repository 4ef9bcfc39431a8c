"""Wire-level replay of the reference's gosnowflake end-to-end suite.

Mirrors ``/root/reference/tests/e2e/gosnowflake_test.go:533-912``
(``TestGosnowflake_AllSQLOperations``): ONE login session drives
CREATE TABLE -> INSERT -> SELECT -> IFF/NVL translation -> UPDATE ->
DELETE -> SHOW TABLES -> DESCRIBE -> ALTER TABLE ADD COLUMN ->
BEGIN/COMMIT -> BEGIN/ROLLBACK -> MERGE INTO -> EXPLAIN -> DROP, each
step asserting the rowset the Go driver would observe. The actual Go
client library does not exist in this environment, so the wire calls
are issued with urllib against the same HTTP surface gosnowflake
speaks (all-strings rowset, ``Snowflake Token="…"`` auth) — the
closest environment-feasible parity to the reference run.
"""

import json
import urllib.request

import pytest

from snowflake_emulator_spark.server.app import SnowflakeServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from snowflake_emulator_spark.engine import Engine

    eng = Engine(spark, base_dir=str(tmp_path_factory.mktemp("e2e_wh")))
    srv = SnowflakeServer(eng, port=0)
    srv.start()
    yield srv
    srv.stop()


def _call(server, method, path, body=None, token=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(url, data=data if method != "GET" else None, method=method)
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f'Snowflake Token="{token}"')
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


def test_e2e_all_sql_operations(server):
    def q(sql, token):
        st, out = _call(server, "POST", "/queries/v1/query-request",
                        {"sqlText": sql}, token)
        assert st == 200, (sql, st, out)
        assert out["success"], (sql, out)
        return out["data"]

    # login (gosnowflake_test.go:537-552: DSN login + ping)
    st, out = _call(server, "POST", "/session/v1/login-request", {"data": {}})
    assert st == 200 and out["success"]
    token = out["data"]["token"]

    # DDL_CREATE_TABLE (:555-566) — typed columns incl. PRIMARY KEY and
    # DEFAULT CURRENT_TIMESTAMP, which the DDL parser must accept
    q("""CREATE TABLE test_operations (
            id INTEGER PRIMARY KEY,
            name VARCHAR(100),
            score INTEGER,
            created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
        )""", token)

    # DML_INSERT (:569-580)
    q("""INSERT INTO test_operations (id, name, score) VALUES
            (1, 'Alice', 95), (2, 'Bob', 87), (3, 'Charlie', 92)""", token)

    # Query_SELECT (:584-603): 3 rows, all-strings rowset in id order
    d = q("SELECT id, name, score FROM test_operations ORDER BY id", token)
    assert d["rowset"] == [["1", "Alice", "95"], ["2", "Bob", "87"],
                           ["3", "Charlie", "92"]]

    # Query_SELECT_IFF (:607-625): Alice/Charlie -> A, Bob -> B
    d = q("SELECT name, IFF(score >= 90, 'A', 'B') AS grade "
          "FROM test_operations ORDER BY name", token)
    assert d["rowset"] == [["Alice", "A"], ["Bob", "B"], ["Charlie", "A"]]

    # Query_SELECT_NVL (:629-644)
    d = q("SELECT NVL(NULL, 'default_value') AS result", token)
    assert d["rowset"] == [["default_value"]]

    # DML_UPDATE (:648-664) + verification select
    q("UPDATE test_operations SET score = 88 WHERE name = 'Bob'", token)
    d = q("SELECT score FROM test_operations WHERE name = 'Bob'", token)
    assert d["rowset"] == [["88"]]

    # DML_DELETE (:668-690): insert a doomed row, delete it, verify 0
    q("INSERT INTO test_operations (id, name, score) VALUES (99, 'ToDelete', 0)", token)
    q("DELETE FROM test_operations WHERE id = 99", token)
    d = q("SELECT COUNT(*) AS n FROM test_operations WHERE id = 99", token)
    assert d["rowset"] == [["0"]]

    # Query_SHOW_TABLES (:694-729): test_operations must be listed
    d = q("SHOW TABLES", token)
    assert any("TEST_OPERATIONS" in " ".join(map(str, row)).upper()
               for row in d["rowset"])

    # Query_DESCRIBE_TABLE (:733-748): >= 1 column description row
    d = q("DESCRIBE TABLE test_operations", token)
    assert len(d["rowset"]) >= 4  # id, name, score, created_at

    # DDL_ALTER_TABLE (:752-758)
    q("ALTER TABLE test_operations ADD COLUMN email VARCHAR(255)", token)
    d = q("DESCRIBE TABLE test_operations", token)
    assert any("EMAIL" in str(row[0]).upper() for row in d["rowset"])

    # Transaction_BEGIN_COMMIT (:762-786)
    q("BEGIN", token)
    q("INSERT INTO test_operations (id, name, score) VALUES (10, 'TxTest', 100)", token)
    q("COMMIT", token)
    d = q("SELECT COUNT(*) AS n FROM test_operations WHERE id = 10", token)
    assert d["rowset"] == [["1"]]

    # Transaction_BEGIN_ROLLBACK (:790-813)
    q("BEGIN", token)
    q("INSERT INTO test_operations (id, name, score) VALUES (20, 'RollbackTest', 100)", token)
    q("ROLLBACK", token)
    d = q("SELECT COUNT(*) AS n FROM test_operations WHERE id = 20", token)
    assert d["rowset"] == [["0"]]

    # DML_MERGE_INTO (:817-860): update Alice, insert NewPerson
    q("CREATE TABLE merge_src (id INTEGER, name VARCHAR, score INTEGER)", token)
    q("INSERT INTO merge_src VALUES (1, 'Alice Updated', 98), (100, 'NewPerson', 85)", token)
    q("""MERGE INTO test_operations t
         USING merge_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET name = s.name, score = s.score
         WHEN NOT MATCHED THEN INSERT (id, name, score) VALUES (s.id, s.name, s.score)""",
      token)
    d = q("SELECT name, score FROM test_operations WHERE id = 1", token)
    assert d["rowset"] == [["Alice Updated", "98"]]
    d = q("SELECT name, score FROM test_operations WHERE id = 100", token)
    assert d["rowset"] == [["NewPerson", "85"]]

    # Query_EXPLAIN (:864-878)
    d = q("EXPLAIN SELECT * FROM test_operations", token)
    assert len(d["rowset"]) >= 1

    # DDL_DROP_TABLE (:882-888) + CREATE/DROP SCHEMA (:891-905)
    q("DROP TABLE merge_src", token)
    q("CREATE SCHEMA test_schema", token)
    q("DROP SCHEMA test_schema", token)

    # Cleanup (:908-914)
    q("DROP TABLE IF EXISTS test_operations", token)
    st, out = _call(server, "POST", "/queries/v1/query-request",
                    {"sqlText": "SELECT * FROM test_operations"}, token)
    assert out["success"] is False  # table truly gone


def test_e2e_rest_v2_all_sql_operations(server):
    """REST v2 counterpart (rest_api_v2_test.go:1194-1405,
    TestRESTAPIV2_AllSQLOperations): the same choreography over
    /api/v2/statements with TYPED data rows. REST v2 is connectionless,
    but the reference executes every statement against one shared
    handle, so BEGIN/COMMIT/ROLLBACK span successive POSTs — the
    server threads one transaction owner across requests to match."""

    def q(sql, expect_error=False):
        st, out = _call(server, "POST", "/api/v2/statements",
                        {"statement": sql})
        if expect_error:
            assert st != 200 or out.get("status") == "failed", (sql, out)
            return out
        assert st == 200 and out["status"] == "success", (sql, st, out)
        return out

    # DDL_CREATE_TABLE (:1217-1223)
    q("CREATE TABLE ops_test (id INTEGER PRIMARY KEY, name VARCHAR, value DOUBLE)")
    # DML_INSERT (:1227-1232)
    q("INSERT INTO ops_test VALUES (1, 'Alice', 100.5), (2, 'Bob', 200.0), (3, 'Charlie', 150.0)")
    # Query_SELECT (:1236-1245): 3 typed rows
    out = q("SELECT * FROM ops_test ORDER BY id")
    assert len(out["data"]) == 3
    assert out["data"][0][0] == 1 and out["data"][0][1] == "Alice"
    # Query_IFF_Translation (:1249-1268): Alice LOW, Bob HIGH
    out = q("SELECT name, IFF(value > 150, 'HIGH', 'LOW') AS tier "
            "FROM ops_test ORDER BY id")
    assert out["data"][0][1] == "LOW" and out["data"][1][1] == "HIGH"
    # Query_NVL_Translation (:1272-1285)
    q("INSERT INTO ops_test VALUES (4, NULL, 400.0)")
    out = q("SELECT id, NVL(name, 'Unknown') AS name FROM ops_test WHERE id = 4")
    assert out["data"][0][1] == "Unknown"
    # DML_UPDATE (:1289-1303)
    q("UPDATE ops_test SET value = 999.0 WHERE id = 1")
    out = q("SELECT value FROM ops_test WHERE id = 1")
    assert float(out["data"][0][0]) == 999.0
    # DML_DELETE (:1307-1320)
    q("DELETE FROM ops_test WHERE id = 4")
    out = q("SELECT COUNT(*) AS n FROM ops_test WHERE id = 4")
    assert int(out["data"][0][0]) == 0
    # Transaction_BEGIN_COMMIT (:1324-1349): spans three POSTs
    q("BEGIN")
    q("INSERT INTO ops_test VALUES (5, 'Eve', 500.0)")
    q("COMMIT")
    out = q("SELECT COUNT(*) AS n FROM ops_test WHERE id = 5")
    assert int(out["data"][0][0]) == 1
    # Transaction_BEGIN_ROLLBACK (:1353-1378)
    q("BEGIN")
    q("INSERT INTO ops_test VALUES (99, 'Rollback', 999.0)")
    q("ROLLBACK")
    out = q("SELECT COUNT(*) AS n FROM ops_test WHERE id = 99")
    assert int(out["data"][0][0]) == 0
    # DDL_ALTER_TABLE (:1382-1389)
    q("ALTER TABLE ops_test ADD COLUMN email VARCHAR(255)")
    # DDL_DROP_TABLE (:1393-1398) + IF EXISTS on a missing table (:1402)
    q("DROP TABLE ops_test")
    q("DROP TABLE IF EXISTS nonexistent_table")
