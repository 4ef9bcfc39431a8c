"""HTTP protocol layer: gosnowflake wire protocol + Snowflake REST API v2.

Stdlib-only (no FastAPI/Flask in this environment): a threaded
``http.server`` with hand-routed endpoints mirroring the reference's
route table (`/root/reference/cmd/server/main.go:88-127`):

gosnowflake protocol:
* ``POST /session/v1/login-request``      — login, returns token pair
* ``POST /session/token-request``         — renew via master token
* ``POST /session/renew``                 — legacy alias of token-request
* ``POST /session/heartbeat``             — keepalive
* ``POST /session/logout``                — logout (token in body)
* ``POST /session/use``                   — switch database/schema
* ``POST /session?delete=true``           — close session (token in header)
* ``POST /queries/v1/query-request``      — execute SQL (all-strings rowset)
* ``POST /queries/v1/abort-request``      — cancel a running query by id

REST API v2:
* ``POST /api/v2/statements``             — submit statement
* ``GET  /api/v2/statements/{handle}``    — poll statement
* ``POST /api/v2/statements/{handle}/cancel``
* CRUD + GET-by-name + PUT(alter comment):
  ``/api/v2/databases[/{db}[/schemas[/{schema}[/tables[/{table}]]]]]``,
  ``/api/v2/warehouses[/{wh}]`` (+ ``:resume`` / ``:suspend``)
  (creates return 201, deletes 204, lookups 404 when absent —
  matching `server/handlers/rest_api_v2.go` status usage)

Error envelope: HTTP 200 + ``success:false`` + Snowflake code for the
gosnowflake protocol (server/handlers/query.go), typed JSON errors for
REST v2 (server/apierror/error.go:11-58).
"""

from __future__ import annotations

import datetime
import json
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

from .. import config, errors
from ..engine import Engine
from ..executor import SessionContext
from ..plans.classifier import StatementType, classify
from ..result import StreamedResult
from ..sessions import SessionManager, extract_token
from ..statements import StatementManager, StatementStatus


class _StreamingJSONBody:
    """HTTP body for a large (StreamedResult) gosnowflake rowset:
    serializes the JSON envelope once with a collision-proof sentinel
    where ``data.rowset`` goes, then writes prefix + batched rows +
    suffix incrementally — the full rowset never exists in driver
    memory (r8; the reference buffers every response,
    server/handlers/query.go:179-193). Sent with ``Connection: close``
    and no Content-Length; the client reads to EOF."""

    def __init__(self, envelope: dict, result):
        self.envelope = envelope   # data dict WITHOUT the rowset key
        self.result = result

    def write_to(self, wfile) -> None:
        sentinel = "@@ROWSET-" + uuid.uuid4().hex + "@@"
        env = dict(self.envelope)
        env_data = dict(env["data"])
        env_data["rowset"] = sentinel
        env["data"] = env_data
        prefix, suffix = json.dumps(env, default=str).split(
            '"' + sentinel + '"')
        wfile.write(prefix.encode() + b"[")
        first = True
        for batch in self.result.iter_rowset_strings():
            payload = ",".join(json.dumps(r) for r in batch)
            if not first:
                payload = "," + payload
            first = False
            wfile.write(payload.encode())
        wfile.write(b"]" + suffix.encode())


class SnowflakeServer:
    """Protocol server over one Engine instance."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 8085):
        self.engine = engine
        self.sessions = SessionManager()
        self.statements = StatementManager(engine.spark)
        # one transaction owner for the connectionless REST v2 surface
        # (see the /api/v2/statements handler)
        self._restv2_tx_owner = object()
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # running gosnowflake queries: requestId/queryId -> Spark job group
        self._running: dict[str, str] = {}
        self._running_lock = threading.Lock()
        # async queries (gosnowflake asyncExec, beyond reference):
        # queryId -> {status, result|error, cls, sql} — the submit
        # returns code 333334 immediately; the client polls
        # GET /monitoring/queries/{qid} and fetches the finished rowset
        # from GET /queries/{qid}/result
        self._async: dict[str, dict] = {}
        self._async_lock = threading.Lock()

    # ------------------------------------------------------------------

    def _query_result_payload(self, res, qid: str, cls, ctx, sql: str):
        """Standard gosnowflake query-response data payload for a
        finished Result — shared by the synchronous path and the async
        getResultUrl fetch (same shape either way)."""
        data = {
            "queryId": qid,
            "rowtype": res.row_type(),
            "total": res.row_count,
            "returned": res.row_count,
            "statementTypeId": cls.statement_type_id,
        }
        child_ids = getattr(res, "child_result_ids", None)
        if child_ids and len(child_ids) > 1:
            # multi-statement request: every child result is
            # independently fetchable via RESULT_SCAN('<id>')
            # (gosnowflake reads data.resultIds for MULTI_STATEMENT)
            from ..engine import _split_statements

            data["resultIds"] = ",".join(child_ids)
            data["resultTypes"] = ",".join(
                str(classify(p).statement_type_id)
                for p in _split_statements(sql))
        # Arrow negotiation (beyond reference — it is JSON-only):
        # when the session's GO_QUERY_RESULT_FORMAT is arrow, ship
        # the rowset as one base64 Arrow IPC stream like Snowflake
        fmt = str(ctx.parameters.get(
            "GO_QUERY_RESULT_FORMAT", config.QUERY_RESULT_FORMAT_JSON)).lower()
        if fmt == "arrow":
            data["queryResultFormat"] = "arrow"
            data["rowsetBase64"] = res.rowset_arrow_base64()
            data["rowset"] = []
        else:
            data["queryResultFormat"] = config.QUERY_RESULT_FORMAT_JSON
            if isinstance(res, StreamedResult):
                # above-threshold result: stream the rowset to the
                # wire batch-by-batch (never materialized)
                return _StreamingJSONBody(
                    {"data": data, "success": True}, res), 200
            data["rowset"] = res.rowset_strings()
        return {"data": data, "success": True}, 200

    def start(self) -> None:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logs
                pass

            def do_POST(self):
                server._route(self, "POST")

            def do_GET(self):
                server._route(self, "GET")

            def do_PUT(self):
                server._route(self, "PUT")

            def do_DELETE(self):
                server._route(self, "DELETE")

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()

    # ------------------------------------------------------------------

    def _route(self, h: BaseHTTPRequestHandler, method: str) -> None:
        path, _, qs = h.path.partition("?")
        params = {k: v[0] for k, v in parse_qs(qs).items()}
        body = {}
        length = int(h.headers.get("Content-Length") or 0)
        if length:
            try:
                body = json.loads(h.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                body = {}
        try:
            out, status = self._handle(method, path, h.headers, body, params)
        except errors.SnowflakeError as e:
            if path.startswith("/api/v2/"):
                # typed REST error (shape of types.StatementResponse as
                # used by rest_api_v2.go sendError): 404 for missing
                # objects, 422 for failed statements, else 400
                if e.code in ("002043", "390144"):
                    # missing objects AND missing statement handles are
                    # 404 (rest_api_v2.go: lookups 404 when absent) —
                    # only a FAILED statement's payload is 422
                    http = 404
                elif path.startswith("/api/v2/statements"):
                    http = 422
                else:
                    http = 400
                out, status = {"code": e.code, "message": e.message, "sqlState": e.sqlstate}, http
            else:
                out, status = e.envelope(), 200
        except Exception as e:  # noqa: BLE001
            out, status = {"message": str(e), "success": False}, 500
        if status == 204:  # No Content must not carry a body
            h.send_response(status)
            h.end_headers()
            return
        if isinstance(out, _StreamingJSONBody):
            # large rowset: incremental write, connection-delimited body
            h.send_response(status)
            h.send_header("Content-Type", "application/json")
            h.send_header("Connection", "close")
            h.end_headers()
            out.write_to(h.wfile)
            h.close_connection = True
            return
        data = json.dumps(out, default=str).encode()
        h.send_response(status)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(data)))
        h.end_headers()
        h.wfile.write(data)

    # ------------------------------------------------------------------

    @staticmethod
    def _rfc3339(ts: float) -> str:
        return datetime.datetime.fromtimestamp(ts, tz=datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )

    @staticmethod
    def _require_name(body) -> str:
        """REST v2 create bodies must carry a 'name' — malformed input
        is a typed 400, not a KeyError-turned-500."""
        if not isinstance(body, dict) or not body.get("name"):
            raise errors.invalid_parameter("request body must include 'name'")
        return body["name"]

    def _handle(self, method: str, path: str, headers, body: dict, params: dict | None = None):
        params = params or {}
        # telemetry: accept and ignore, like the reference
        # (cmd/server/main.go:130-134 — gosnowflake sends batches)
        if path == "/telemetry/send" and method == "POST":
            return {"success": True}, 200
        if path == "/health" and method == "GET":
            return {"status": "OK"}, 200
        # ---- gosnowflake session endpoints
        if path == "/session/v1/login-request" and method == "POST":
            data = body.get("data") or {}
            if not isinstance(data, dict):
                return {"success": False, "message": "malformed login body",
                        "code": "000900"}, 400
            sp = data.get("SESSION_PARAMETERS") or {}
            # gosnowflake carries the login namespace as databaseName/
            # schemaName (types.go json tags) and ALSO as URL query
            # params; accept all spellings
            db = (sp.get("DATABASE") or data.get("DATABASE")
                  or data.get("databaseName") or params.get("databaseName"))
            schema = (sp.get("SCHEMA") or data.get("SCHEMA")
                      or data.get("schemaName") or params.get("schemaName"))
            s = self.sessions.create(db, schema)
            # identity fields from the login body (gosnowflake sends
            # LOGIN_NAME/ACCOUNT_NAME — reference server/types/types.go:16-17
            # — plus warehouse/role as URL params or body keys)
            login = data.get("LOGIN_NAME") or data.get("loginName")
            if login:
                s.user = str(login).upper()
            acct = data.get("ACCOUNT_NAME") or data.get("accountName")
            if acct:
                s.account = str(acct).upper()
            wh = (sp.get("WAREHOUSE") or data.get("warehouseName")
                  or params.get("warehouseName") or params.get("warehouse"))
            if wh:
                s.warehouse = str(wh).upper()
            role = (sp.get("ROLE") or data.get("roleName")
                    or params.get("roleName") or params.get("role"))
            if role:
                s.role = str(role).upper()
            # client SESSION_PARAMETERS (e.g. GO_QUERY_RESULT_FORMAT)
            # negotiate at login, not only via later ALTER SESSION
            for k, v in sp.items():
                if k.upper() not in ("DATABASE", "SCHEMA", "WAREHOUSE", "ROLE"):
                    s.parameters[k.upper()] = v
            return {
                "data": {
                    "token": s.token,
                    "masterToken": s.master_token,
                    "sessionId": s.id,
                    "validityInSeconds": self.sessions.validity,
                    "masterValidityInSeconds": self.sessions.validity * config.MASTER_TOKEN_VALIDITY_FACTOR,
                    "sessionInfo": {"databaseName": s.database, "schemaName": s.schema},
                    "parameters": [{"name": k, "value": v} for k, v in s.parameters.items()],
                },
                "success": True,
            }, 200
        # legacy alias: reference RenewSession delegates to TokenRequest
        # (server/handlers/session.go:225-228, route main.go:85)
        if path in ("/session/token-request", "/session/renew") and method == "POST":
            s = self.sessions.renew(body.get("oldSessionToken") and extract_token(headers.get("Authorization")) or "",
                                    body.get("oldSessionToken", ""))
            return {
                "data": {"sessionToken": s.token, "masterToken": s.master_token,
                         "validityInSecondsST": self.sessions.validity,
                         "validityInSecondsMT": self.sessions.validity * config.MASTER_TOKEN_VALIDITY_FACTOR},
                "success": True,
            }, 200
        if path == "/session/heartbeat" and method == "POST":
            self.sessions.heartbeat(extract_token(headers.get("Authorization")))
            return {"success": True}, 200
        # reference serves /session/logout with the token in the BODY
        # (server/handlers/session.go:230-254, route main.go:86);
        # /session/logout-request kept as a tolerant alias
        if path in ("/session/logout", "/session/logout-request") and method == "POST":
            try:
                self.engine.cleanup_session(self.sessions.logout(
                    body.get("token") or extract_token(headers.get("Authorization"))
                ))
            except errors.SnowflakeError:
                pass
            return {"success": True}, 200
        # USE DATABASE/SCHEMA context switch (session.go:256-283)
        if path == "/session/use" and method == "POST":
            token = body.get("token") or extract_token(headers.get("Authorization"))
            self.sessions.use(token, body.get("database"), body.get("schema"))
            return {"success": True}, 200
        # gosnowflake sends POST /session?delete=true to close
        # (session.go:296-325): token from the header; already-closed
        # sessions still report success
        if path == "/session" and method == "POST":
            try:
                self.engine.cleanup_session(
                    self.sessions.logout(extract_token(headers.get("Authorization"))))
            except errors.SnowflakeError:
                pass
            return {"success": True, "data": None}, 200

        # ---- gosnowflake query endpoint
        if path == "/queries/v1/query-request" and method == "POST":
            sess = self.sessions.validate(extract_token(headers.get("Authorization")))
            sql = body.get("sqlText", "")
            bindings = body.get("bindings") or None
            ctx = sess.context()
            cls = classify(sql)
            qid = "01" + format(int(time.time() * 1000), "x") + "-" + uuid.uuid4().hex[:12]
            # describeOnly (gosnowflake PrepareContext / metadata
            # pre-fetch): return the result schema WITHOUT executing —
            # a LIMIT 0 plan for queries (no data scanned, no side
            # effects), and an empty statement-shaped payload otherwise
            if body.get("describeOnly"):
                data = {"queryId": qid, "total": 0, "returned": 0,
                        "statementTypeId": cls.statement_type_id,
                        "queryResultFormat": config.QUERY_RESULT_FORMAT_JSON,
                        "rowset": []}
                if cls.type == StatementType.QUERY:
                    # side-effect-free path: no sequence block draw, no
                    # leaked time-travel read pins (executor.describe_result)
                    data["rowtype"] = self.engine.executor.describe_result(
                        sql, ctx, bindings).row_type()
                else:
                    data["rowtype"] = []
                return {"data": data, "success": True}, 200
            # asyncExec (gosnowflake WithAsyncMode, beyond reference):
            # run on a worker thread, return code 333334 + getResultUrl
            # immediately; the client polls /monitoring/queries/{qid}
            # and fetches the rowset from /queries/{qid}/result
            if body.get("asyncExec"):
                entry = {"status": "RUNNING", "cls": cls, "ctx": ctx, "sql": sql}
                with self._async_lock:
                    self._async[qid] = entry
                    while len(self._async) > 200:  # bounded like results
                        self._async.pop(next(iter(self._async)))

                def _worker():
                    group_a = f"qreq-{qid}"
                    with self._running_lock:
                        self._running[qid] = group_a
                    self.engine.spark.sparkContext.setJobGroup(group_a, sql[:100], True)
                    try:
                        r = self.engine.execute(sql, ctx, bindings, query_id=qid)
                        sess.database, sess.schema = ctx.database, ctx.schema
                        sess.last_query_id = (getattr(ctx, "last_query_id", None)
                                              or sess.last_query_id)
                        with self._async_lock:
                            entry.update(status="SUCCESS", result=r)
                    except Exception as e:  # noqa: BLE001 — surfaced to poller
                        with self._async_lock:
                            entry.update(status="FAILED_WITH_ERROR", error=e)
                    finally:
                        self.engine.spark.sparkContext.setJobGroup("", "")
                        with self._running_lock:
                            self._running.pop(qid, None)

                threading.Thread(target=_worker, daemon=True,
                                 name=f"async-{qid}").start()
                return {"code": "333334", "success": True,
                        "data": {"queryId": qid,
                                 "getResultUrl": f"/queries/{qid}/result"}}, 200
            # run inside a per-query Spark job group so an abort-request
            # (by gosnowflake requestId or by our queryId) can interrupt
            # the running jobs from another thread
            group = f"qreq-{qid}"
            req_id = params.get("requestId")
            with self._running_lock:
                self._running[qid] = group
                if req_id:
                    self._running[req_id] = group
            self.engine.spark.sparkContext.setJobGroup(group, sql[:100], True)
            try:
                bind_stage = body.get("bindStage") or ""
                if bind_stage:
                    # gosnowflake bulk array binds: rows live in a
                    # staged CSV, not the inline bindings field
                    res = self.engine.execute_bind_stage(
                        sql, bind_stage, ctx, query_id=qid)
                else:
                    res = self.engine.execute(sql, ctx, bindings, query_id=qid)
            finally:
                self.engine.spark.sparkContext.setJobGroup("", "")
                with self._running_lock:
                    self._running.pop(qid, None)
                    if req_id:
                        self._running.pop(req_id, None)
            sess.database, sess.schema = ctx.database, ctx.schema
            sess.last_query_id = getattr(ctx, "last_query_id", None) or sess.last_query_id
            return self._query_result_payload(res, qid, cls, ctx, sql)

        # async result fetch (gosnowflake getResultUrl, beyond reference)
        m = re.match(r"^/queries/([\w-]+)/result$", path)
        if m and method == "GET":
            self.sessions.validate(extract_token(headers.get("Authorization")))
            with self._async_lock:
                entry = self._async.get(m.group(1))
            if entry is None:
                return {"success": False, "message": f"unknown query {m.group(1)}",
                        "code": "000605"}, 200
            if entry["status"] == "RUNNING":
                return {"code": "333334", "success": True,
                        "data": {"queryId": m.group(1),
                                 "getResultUrl": f"/queries/{m.group(1)}/result"}}, 200
            if entry["status"] != "SUCCESS":
                err = entry["error"]
                return {"success": False, "message": str(err),
                        "code": getattr(err, "code", "100037"),
                        "data": {"queryId": m.group(1),
                                 "sqlState": getattr(err, "sqlstate", "P0000")}}, 200
            return self._query_result_payload(
                entry["result"], m.group(1), entry["cls"], entry["ctx"], entry["sql"])

        # async status poll (gosnowflake checkQueryStatus shape)
        m = re.match(r"^/monitoring/queries/([\w-]+)$", path)
        if m and method == "GET":
            self.sessions.validate(extract_token(headers.get("Authorization")))
            with self._async_lock:
                entry = self._async.get(m.group(1))
            if entry is None:
                return {"data": {"queries": []}, "success": True}, 200
            err = entry.get("error")
            return {"data": {"queries": [{
                "id": m.group(1),
                "status": entry["status"],
                "errorCode": getattr(err, "code", "") if err else "",
                "errorMessage": str(err) if err else "",
            }]}, "success": True}, 200

        # (async routes above; cancellation below)
        # query cancellation (query.go:149-166 returns success without
        # cancelling; we actually interrupt the job group when the id is
        # known, and stay lenient — success either way — like the ref)
        if path == "/queries/v1/abort-request" and method == "POST":
            qid = body.get("queryId") or body.get("requestId") or ""
            with self._running_lock:
                group = self._running.get(qid)
            if group:
                self.engine.spark.sparkContext.cancelJobGroup(group)
                return {"success": True, "message": "query aborted"}, 200
            return {"success": True, "message": "query not running"}, 200

        # ---- REST v2 statements
        if path == "/api/v2/statements" and method == "POST":
            sql = body.get("statement", "")
            bindings = body.get("bindings") or None
            st = self.statements.create(sql)
            db = body.get("database")
            schema = body.get("schema")
            ctx = SessionContext(db, schema)
            # REST v2 is connectionless, but the reference executes every
            # statement against ONE shared engine handle, so transactions
            # span successive POSTs (rest_api_v2_test.go BEGIN/COMMIT
            # choreography). Thread a server-lifetime owner object so the
            # engine's tx bookkeeping sees one owner across requests.
            ctx._session = self._restv2_tx_owner
            self.statements.run(st, lambda: self.engine.execute(sql, ctx, bindings,
                                                                query_id=st.handle))
            return self._statement_payload(st)
        m = re.match(r"^/api/v2/statements/([\w-]+)$", path)
        if m and method == "GET":
            part = params.get("partition")
            return self._statement_payload(
                self.statements.get(m.group(1)),
                partition=int(part) if part is not None else None)
        m = re.match(r"^/api/v2/statements/([\w-]+)/cancel$", path)
        if m and method == "POST":
            st = self.statements.cancel(m.group(1))
            return {"statementHandle": st.handle, "status": st.status.value}, 200

        # ---- REST v2 databases / schemas / tables
        # response field names / status codes mirror the reference's
        # types (server/types/rest_api_v2.go:85-175) and handlers
        # (rest_api_v2.go: creates 201, deletes 204, missing 404)
        cat = self.engine.catalog

        def _db_payload(db: str) -> dict:
            v = cat.databases[db]
            return {"name": db, "comment": v.get("comment"),
                    "created_on": self._rfc3339(v.get("created_on", 0.0))}

        def _schema_payload(db: str, sch: str) -> dict:
            v = cat.schemas[(db, sch)]
            return {"name": sch, "database_name": db, "comment": v.get("comment"),
                    "created_on": self._rfc3339(v.get("created_on", 0.0))}

        def _table_payload(tm) -> dict:
            return {"name": tm.name, "database_name": tm.database,
                    "schema_name": tm.schema, "table_type": "BASE TABLE",
                    "comment": tm.comment,
                    "created_on": self._rfc3339(tm.created_on)}

        def _wh_payload(w) -> dict:
            return {"name": w.name, "state": w.state, "size": w.size,
                    "type": "STANDARD", "comment": w.comment,
                    "created_on": self._rfc3339(w.created_on)}

        def _404(kind: str, name: str):
            return ({"code": "002043",
                     "message": f"{kind} not found: {name}", "sqlState": "02000"}, 404)

        if path == "/api/v2/databases" and method == "POST":
            name = self._require_name(body)
            cat.create_database(name, comment=body.get("comment"))
            return _db_payload(name.upper()), 201
        if path == "/api/v2/databases" and method == "GET":
            return [_db_payload(db) for db in sorted(cat.databases)], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)$", path)
        if m:
            db = m.group(1).upper()
            if method == "GET":
                return (_db_payload(db), 200) if db in cat.databases else _404("database", db)
            if method == "PUT":
                if db not in cat.databases:
                    return _404("database", db)
                if body.get("comment") is not None:
                    cat.alter_database_comment(db, body["comment"])
                return _db_payload(db), 200
            if method == "DELETE":
                cat.drop_database(db)
                return {}, 204
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas$", path)
        if m and method == "POST":
            name = self._require_name(body)
            cat.create_schema(m.group(1), name)
            return _schema_payload(m.group(1).upper(), name.upper()), 201
        if m and method == "GET":
            db = m.group(1).upper()
            return [_schema_payload(d, sch) for (d, sch) in sorted(cat.schemas) if d == db], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)$", path)
        if m:
            db, sch = m.group(1).upper(), m.group(2).upper()
            if method == "GET":
                return ((_schema_payload(db, sch), 200) if (db, sch) in cat.schemas
                        else _404("schema", sch))
            if method == "DELETE":
                cat.drop_schema(db, sch)
                return {}, 204
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)/tables$", path)
        if m and method == "POST":
            from ..catalog import ColumnDef

            cols = [
                ColumnDef(c["name"].upper(), c.get("datatype", c.get("type", "VARCHAR")),
                          nullable=c.get("nullable", True))
                for c in body.get("columns", [])
            ]
            tm = cat.create_table(self._require_name(body), cols, m.group(1), m.group(2),
                                  comment=body.get("comment"))
            return _table_payload(tm), 201
        if m and method == "GET":
            db, sch = m.group(1).upper(), m.group(2).upper()
            return [_table_payload(cat.tables[k]) for k in sorted(cat.tables)
                    if k[0] == db and k[1] == sch], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)/tables/([\w$]+)$", path)
        if m:
            db, sch, tbl = (m.group(i).upper() for i in (1, 2, 3))
            if method == "GET":
                return ((_table_payload(cat.tables[(db, sch, tbl)]), 200)
                        if (db, sch, tbl) in cat.tables else _404("table", tbl))
            if method == "PUT":
                if (db, sch, tbl) not in cat.tables:
                    return _404("table", tbl)
                if body.get("comment") is not None:
                    cat.alter_table_comment(tbl, body["comment"], db, sch)
                return _table_payload(cat.tables[(db, sch, tbl)]), 200
            if method == "DELETE":
                cat.drop_table(tbl, db, sch)
                return {}, 204

        # ---- REST v2 warehouses
        if path == "/api/v2/warehouses" and method == "POST":
            w = self.engine.warehouses.create(self._require_name(body), body.get("warehouse_size", "X-SMALL"),
                                              comment=body.get("comment"))
            return _wh_payload(w), 201
        if path == "/api/v2/warehouses" and method == "GET":
            return [_wh_payload(w) for w in self.engine.warehouses.list()], 200
        m = re.match(r"^/api/v2/warehouses/([\w$]+):(resume|suspend)$", path)
        if m and method == "POST":
            self.engine.warehouses.set_state(m.group(1), m.group(2).upper())
            return {}, 200
        m = re.match(r"^/api/v2/warehouses/([\w$]+)$", path)
        if m:
            wh = m.group(1).upper()
            if method == "GET":
                try:
                    return _wh_payload(self.engine.warehouses.get(wh)), 200
                except errors.SnowflakeError:
                    return _404("warehouse", wh)
            if method == "DELETE":
                self.engine.warehouses.drop(wh)
                return {}, 204

        raise errors.SnowflakeError("390404", f"unknown endpoint {method} {path}", "02000")

    def _statement_payload(self, st, partition: int | None = None):
        if st.status == StatementStatus.FAILED and st.error is not None:
            return {
                "statementHandle": st.handle,
                "status": st.status.value,
                "code": st.error.code,
                "message": st.error.message,
                "sqlState": st.error.sqlstate,
            }, 422
        payload = {
            "statementHandle": st.handle,
            "status": st.status.value,
            "statementStatusUrl": f"/api/v2/statements/{st.handle}",
            # epoch MILLISECONDS (rest_api_v2.go:35 CreatedOn int64;
            # the reference's e2e asserts the ms range explicitly)
            "createdOn": int(st.created_at * 1000),
        }
        if st.result is not None:
            res = st.result
            total = res.row_count
            bs = config.RESULT_STREAM_BATCH
            from ..result import StreamedResult, _jsonify

            streamed = isinstance(res, StreamedResult)
            if streamed:
                # Snowflake SQL-API partition shape: clients fetch
                # ?partition=N per entry; a streamed result never holds
                # the full rowset (r8 — beyond reference)
                n_parts = max(1, (total + bs - 1) // bs)
                counts = ([bs] * (total // bs)
                          + ([total % bs] if total % bs else []))
            else:
                n_parts, counts = 1, [total]
            payload["resultSetMetaData"] = {
                "numRows": total,
                "format": "jsonv2",
                "rowType": res.row_type(),
                "partitionInfo": [{"rowCount": c} for c in counts],
            }
            want = partition or 0
            if want < 0 or want >= n_parts:
                raise errors.invalid_parameter(
                    f"partition {want} out of range (0..{n_parts - 1})")
            if streamed:
                rows = self._fetch_partition(st, want, bs)
                payload["data"] = [[_jsonify(v) for v in r] for r in rows]
            else:
                payload["data"] = res.rowset_typed()
        return payload, 200

    def _fetch_partition(self, st, n: int, bs: int) -> list:
        """Sequential partition cursor over a StreamedResult: serves
        partition N by draining the result's batched iterator forward,
        caching only the LAST served partition (bounded memory).
        Fetching an earlier partition restarts the iterator — clients
        walk partitions in order, so the common path is one pass."""
        cur = getattr(st, "_part_cursor", None)
        if cur is None:
            cur = st._part_cursor = {"gen": None, "next": 0,
                                     "last": (None, None),
                                     "lock": threading.Lock()}
        with cur["lock"]:  # concurrent fetches of one handle serialize
            if cur["last"][0] == n:
                return cur["last"][1]
            if cur["gen"] is None or n < cur["next"]:
                cur["gen"] = st.result.iter_rows(bs)
                cur["next"] = 0
            rows: list = []
            while cur["next"] <= n:
                rows = next(cur["gen"], [])
                cur["next"] += 1
            cur["last"] = (n, rows)
            return rows
