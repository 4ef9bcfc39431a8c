"""Context functions (CURRENT_USER/ROLE/WAREHOUSE/DATABASE/...).

Beyond reference: the reference accepts ACCOUNT_NAME/LOGIN_NAME in the
login body (`/root/reference/server/types/types.go:16-17`) but exposes
no context functions; we evaluate them per-session at query time, the
way Snowflake does (a view body sees the QUERYING session's identity).
"""

import json
import urllib.request

import pytest

from snowflake_emulator_spark import config
from snowflake_emulator_spark.executor import SessionContext


def _rows(engine, sql, ctx):
    return engine.execute(sql, ctx).rows


def test_defaults(engine):
    ctx = SessionContext()
    assert _rows(engine, "SELECT CURRENT_USER() AS u, CURRENT_ROLE() AS r", ctx) == [
        [config.DEFAULT_USER, config.DEFAULT_ROLE]]
    assert _rows(engine, "SELECT CURRENT_DATABASE() AS d, CURRENT_SCHEMA() AS s", ctx) == [
        ["TEST_DB", "PUBLIC"]]
    assert _rows(engine, "SELECT CURRENT_WAREHOUSE() AS w, CURRENT_ACCOUNT() AS a", ctx) == [
        [config.DEFAULT_WAREHOUSE, config.DEFAULT_ACCOUNT]]
    assert _rows(engine, "SELECT CURRENT_VERSION() AS v", ctx) == [
        [config.EMULATOR_VERSION]]


def test_bare_ansi_forms(engine):
    """CURRENT_USER / CURRENT_ROLE are valid without parentheses."""
    ctx = SessionContext()
    assert _rows(engine, "SELECT CURRENT_USER AS u, CURRENT_ROLE AS r", ctx) == [
        [config.DEFAULT_USER, config.DEFAULT_ROLE]]


def test_string_literals_untouched(engine):
    ctx = SessionContext()
    assert _rows(engine, "SELECT 'CURRENT_USER() kept' AS s", ctx) == [
        ["CURRENT_USER() kept"]]


def test_use_warehouse_and_role(engine):
    ctx = SessionContext()
    engine.execute("USE WAREHOUSE etl_wh", ctx)
    engine.execute("USE ROLE sysadmin", ctx)
    assert _rows(engine, "SELECT CURRENT_WAREHOUSE() AS w, CURRENT_ROLE() AS r", ctx) == [
        ["ETL_WH", "SYSADMIN"]]


def test_current_transaction_null_outside_tx(engine):
    ctx = SessionContext()
    assert _rows(engine, "SELECT CURRENT_TRANSACTION() AS t", ctx) == [[None]]
    engine.execute("BEGIN", ctx)
    txid = _rows(engine, "SELECT CURRENT_TRANSACTION() AS t", ctx)[0][0]
    assert txid is not None and txid.isdigit()
    # stable for the life of the transaction
    assert _rows(engine, "SELECT CURRENT_TRANSACTION() AS t", ctx)[0][0] == txid
    engine.execute("COMMIT", ctx)
    assert _rows(engine, "SELECT CURRENT_TRANSACTION() AS t", ctx) == [[None]]


def test_context_fns_in_dml(engine):
    """INSERT audit-column pattern: VALUES (CURRENT_USER())."""
    ctx = SessionContext()
    engine.execute("CREATE TABLE ctx_audit (who VARCHAR, act VARCHAR)", ctx)
    engine.execute(
        "INSERT INTO ctx_audit VALUES (CURRENT_USER(), 'create')", ctx)
    assert _rows(engine, "SELECT who FROM ctx_audit", ctx) == [
        [config.DEFAULT_USER]]


def test_view_sees_querying_session(engine):
    """Snowflake semantics: CURRENT_ROLE() inside a view evaluates at
    query time with the caller's session, not the view creator's."""
    ctx = SessionContext()
    engine.execute("CREATE VIEW ctx_v AS SELECT CURRENT_ROLE() AS r", ctx)
    engine.execute("USE ROLE analyst", ctx)
    assert _rows(engine, "SELECT r FROM ctx_v", ctx) == [["ANALYST"]]


def test_not_served_from_result_cache(engine):
    """Two sessions, same SQL text: each must see its own identity."""
    ctx1, ctx2 = SessionContext(), SessionContext()
    engine.execute("USE ROLE role_one", ctx1)
    engine.execute("USE ROLE role_two", ctx2)
    sql = "SELECT CURRENT_ROLE() AS r"
    assert _rows(engine, sql, ctx1) == [["ROLE_ONE"]]
    assert _rows(engine, sql, ctx2) == [["ROLE_TWO"]]


def test_show_roles_and_users(engine):
    ctx = SessionContext()
    engine.execute("USE ROLE pipeline_role", ctx)
    r = engine.execute("SHOW ROLES", ctx)
    assert r.columns == ["name", "is_current"]
    assert r.rows == [["PIPELINE_ROLE", "Y"]]
    u = engine.execute("SHOW USERS", ctx)
    assert u.rows == [[config.DEFAULT_USER, "PIPELINE_ROLE"]]


def test_describe_result(engine):
    ctx = SessionContext()
    res = engine.execute("SELECT 1 AS one, 'a' AS letter", ctx)
    d = engine.execute(f"DESCRIBE RESULT '{res.query_id}'", ctx)
    assert d.columns == ["name", "type", "kind", "null?"]
    assert [r[0] for r in d.rows] == ["ONE", "LETTER"]
    assert d.rows[0][1] == "NUMBER" and d.rows[1][1] == "TEXT"
    # LAST_QUERY_ID() form describes the most recent result
    engine.execute("SELECT CAST(2.5 AS DOUBLE) AS dbl", ctx)
    d2 = engine.execute("DESCRIBE RESULT LAST_QUERY_ID()", ctx)
    assert d2.rows[0][0] == "DBL"


def test_describe_result_expired(engine):
    ctx = SessionContext()
    import pytest as _pytest

    from snowflake_emulator_spark import errors
    with _pytest.raises(errors.SnowflakeError):
        engine.execute("DESCRIBE RESULT '01gone-doesnotexist'", ctx)


# ---------------------------------------------------------------------
# protocol layer: login-body identity -> context functions
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from snowflake_emulator_spark.engine import Engine
    from snowflake_emulator_spark.server.app import SnowflakeServer

    eng = Engine(spark, base_dir=str(tmp_path_factory.mktemp("ctx_wh")))
    srv = SnowflakeServer(eng, port=0)
    srv.start()
    yield srv
    srv.stop()


def _call(server, method, path, body=None, token=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(
        url, data=data if method != "GET" else None, method=method)
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f'Snowflake Token="{token}"')
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def test_login_identity_flows_to_context_fns(server):
    st, out = _call(server, "POST", "/session/v1/login-request", {
        "data": {"LOGIN_NAME": "testuser", "ACCOUNT_NAME": "testaccount",
                 "warehouseName": "wh_login", "roleName": "r_login"}})
    assert st == 200 and out["success"]
    token = out["data"]["token"]
    sid = out["data"]["sessionId"]

    st, out = _call(server, "POST", "/queries/v1/query-request", {
        "sqlText": "SELECT CURRENT_USER() AS u, CURRENT_ACCOUNT() AS a, "
                   "CURRENT_WAREHOUSE() AS w, CURRENT_ROLE() AS r, "
                   "CURRENT_SESSION() AS s"}, token)
    assert out["success"], out
    assert out["data"]["rowset"] == [
        ["TESTUSER", "TESTACCOUNT", "WH_LOGIN", "R_LOGIN", sid]]

    # USE ROLE persists across requests on the same session
    st, out = _call(server, "POST", "/queries/v1/query-request",
                    {"sqlText": "USE ROLE later_role"}, token)
    assert out["success"], out
    st, out = _call(server, "POST", "/queries/v1/query-request",
                    {"sqlText": "SELECT CURRENT_ROLE() AS r"}, token)
    assert out["data"]["rowset"] == [["LATER_ROLE"]]


def test_show_in_scope(engine):
    """SHOW <objects> IN ACCOUNT | DATABASE d | SCHEMA d.s scoping
    (previously the IN clause was ignored and the CURRENT database's
    objects came back)."""
    ctx = SessionContext()
    engine.execute("CREATE DATABASE scope_db", ctx)
    engine.execute("CREATE SCHEMA scope_db.s1", ctx)
    engine.execute("CREATE TABLE scope_db.s1.remote_t (id INTEGER)", ctx)
    engine.execute("CREATE TABLE local_scope_t (id INTEGER)", ctx)

    def names(r):
        return sorted({row[0] for row in r.rows})

    assert names(engine.execute("SHOW TABLES IN DATABASE scope_db", ctx)) == [
        "REMOTE_T"]
    assert names(engine.execute("SHOW TABLES IN SCHEMA scope_db.s1", ctx)) == [
        "REMOTE_T"]
    in_account = names(engine.execute("SHOW TABLES IN ACCOUNT", ctx))
    assert "REMOTE_T" in in_account and "LOCAL_SCOPE_T" in in_account
    assert "REMOTE_T" not in names(engine.execute("SHOW TABLES", ctx))
    assert names(engine.execute("SHOW SCHEMAS IN DATABASE scope_db", ctx)) == [
        "PUBLIC", "S1"]
    # SHOW COLUMNS IN <table> keeps its table-form IN
    cols = engine.execute("SHOW COLUMNS IN local_scope_t", ctx)
    assert [r[2] for r in cols.rows] == ["ID"]


def test_grant_all_and_future_in_schema(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE gr_a (x INTEGER)", ctx)
    engine.execute("CREATE TABLE gr_b (x INTEGER)", ctx)
    engine.execute("GRANT SELECT ON ALL TABLES IN SCHEMA public TO ROLE an1", ctx)
    got = {r[2] for r in engine.execute("SHOW GRANTS TO ROLE an1", ctx).rows}
    assert {"TEST_DB.PUBLIC.GR_A", "TEST_DB.PUBLIC.GR_B"} <= got
    engine.execute("GRANT SELECT, INSERT ON FUTURE TABLES IN SCHEMA public "
                   "TO ROLE ld1", ctx)
    rows_ = engine.execute("SHOW GRANTS TO ROLE ld1", ctx).rows
    assert {(r[0], r[2]) for r in rows_} == {
        ("SELECT", "TEST_DB.PUBLIC.<FUTURE TABLES>"),
        ("INSERT", "TEST_DB.PUBLIC.<FUTURE TABLES>")}
