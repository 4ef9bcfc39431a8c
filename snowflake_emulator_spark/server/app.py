"""HTTP protocol layer: gosnowflake wire protocol + Snowflake REST API v2.

Stdlib-only (no FastAPI/Flask in this environment): a threaded
``http.server`` with hand-routed endpoints mirroring the reference's
route table (`/root/reference/cmd/server/main.go:88-127`):

gosnowflake protocol:
* ``POST /session/v1/login-request``      — login, returns token pair
* ``POST /session/token-request``         — renew via master token
* ``POST /session/heartbeat``             — keepalive
* ``POST /session/logout-request``        — logout
* ``POST /queries/v1/query-request``      — execute SQL (all-strings rowset)

REST API v2:
* ``POST /api/v2/statements``             — submit statement
* ``GET  /api/v2/statements/{handle}``    — poll statement
* ``POST /api/v2/statements/{handle}/cancel``
* CRUD: ``/api/v2/databases[/{db}/schemas[/{schema}/tables]]``,
  ``/api/v2/warehouses`` (+ ``:resume`` / ``:suspend``)

Error envelope: HTTP 200 + ``success:false`` + Snowflake code for the
gosnowflake protocol (server/handlers/query.go), typed JSON errors for
REST v2 (server/apierror/error.go:11-58).
"""

from __future__ import annotations

import json
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .. import config, errors
from ..engine import Engine
from ..executor import SessionContext
from ..plans.classifier import classify
from ..sessions import SessionManager, extract_token
from ..statements import StatementManager, StatementStatus


class SnowflakeServer:
    """Protocol server over one Engine instance."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 8085):
        self.engine = engine
        self.sessions = SessionManager()
        self.statements = StatementManager(engine.spark)
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------

    def start(self) -> None:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logs
                pass

            def do_POST(self):
                server._route(self, "POST")

            def do_GET(self):
                server._route(self, "GET")

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
        path = h.path.split("?")[0]
        body = {}
        length = int(h.headers.get("Content-Length") or 0)
        if length:
            try:
                body = json.loads(h.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                body = {}
        try:
            out, status = self._handle(method, path, h.headers, body)
        except errors.SnowflakeError as e:
            if path.startswith("/api/v2/"):
                out, status = {"code": e.code, "message": e.message, "sqlState": e.sqlstate}, 422
            else:
                out, status = e.envelope(), 200
        except Exception as e:  # noqa: BLE001
            out, status = {"message": str(e), "success": False}, 500
        data = json.dumps(out, default=str).encode()
        h.send_response(status)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(data)))
        h.end_headers()
        h.wfile.write(data)

    # ------------------------------------------------------------------

    def _handle(self, method: str, path: str, headers, body: dict):
        # ---- gosnowflake session endpoints
        if path == "/session/v1/login-request" and method == "POST":
            data = body.get("data", {})
            db = data.get("SESSION_PARAMETERS", {}).get("DATABASE") or data.get("DATABASE")
            schema = data.get("SESSION_PARAMETERS", {}).get("SCHEMA") or data.get("SCHEMA")
            s = self.sessions.create(db, schema)
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
        if path == "/session/token-request" and method == "POST":
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
        if path == "/session/logout-request" and method == "POST":
            try:
                self.sessions.logout(extract_token(headers.get("Authorization")))
            except errors.SnowflakeError:
                pass
            return {"success": True}, 200

        # ---- gosnowflake query endpoint
        if path == "/queries/v1/query-request" and method == "POST":
            sess = self.sessions.validate(extract_token(headers.get("Authorization")))
            sql = body.get("sqlText", "")
            bindings = body.get("bindings") or None
            ctx = sess.context()
            cls = classify(sql)
            res = self.engine.execute(sql, ctx, bindings)
            sess.database, sess.schema = ctx.database, ctx.schema
            qid = "01" + format(int(time.time() * 1000), "x") + "-" + uuid.uuid4().hex[:12]
            return {
                "data": {
                    "queryId": qid,
                    "rowtype": res.row_type(),
                    "rowset": res.rowset_strings(),
                    "total": res.row_count,
                    "returned": res.row_count,
                    "statementTypeId": cls.statement_type_id,
                    "queryResultFormat": config.QUERY_RESULT_FORMAT_JSON,
                },
                "success": True,
            }, 200

        # ---- REST v2 statements
        if path == "/api/v2/statements" and method == "POST":
            sql = body.get("statement", "")
            bindings = body.get("bindings") or None
            st = self.statements.create(sql)
            db = body.get("database")
            schema = body.get("schema")
            ctx = SessionContext(db, schema)
            self.statements.run(st, lambda: self.engine.execute(sql, ctx, bindings))
            return self._statement_payload(st)
        m = re.match(r"^/api/v2/statements/([\w-]+)$", path)
        if m and method == "GET":
            return self._statement_payload(self.statements.get(m.group(1)))
        m = re.match(r"^/api/v2/statements/([\w-]+)/cancel$", path)
        if m and method == "POST":
            st = self.statements.cancel(m.group(1))
            return {"statementHandle": st.handle, "status": st.status.value}, 200

        # ---- REST v2 databases / schemas / tables
        if path == "/api/v2/databases" and method == "POST":
            self.engine.catalog.create_database(body["name"], comment=body.get("comment"))
            return {"name": body["name"].upper()}, 200
        if path == "/api/v2/databases" and method == "GET":
            return [{"name": db, "comment": v.get("comment")} for db, v in
                    sorted(self.engine.catalog.databases.items())], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)$", path)
        if m and method == "DELETE":
            self.engine.catalog.drop_database(m.group(1))
            return {}, 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas$", path)
        if m and method == "POST":
            self.engine.catalog.create_schema(m.group(1), body["name"])
            return {"name": body["name"].upper()}, 200
        if m and method == "GET":
            db = m.group(1).upper()
            return [{"name": sch} for (d, sch) in sorted(self.engine.catalog.schemas) if d == db], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)$", path)
        if m and method == "DELETE":
            self.engine.catalog.drop_schema(m.group(1), m.group(2))
            return {}, 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)/tables$", path)
        if m and method == "POST":
            from ..catalog import ColumnDef

            cols = [
                ColumnDef(c["name"].upper(), c.get("datatype", c.get("type", "VARCHAR")),
                          nullable=c.get("nullable", True))
                for c in body.get("columns", [])
            ]
            self.engine.catalog.create_table(body["name"], cols, m.group(1), m.group(2))
            return {"name": body["name"].upper()}, 200
        if m and method == "GET":
            db, sch = m.group(1).upper(), m.group(2).upper()
            return [{"name": t} for (d, s, t) in sorted(self.engine.catalog.tables) if d == db and s == sch], 200
        m = re.match(r"^/api/v2/databases/([\w$]+)/schemas/([\w$]+)/tables/([\w$]+)$", path)
        if m and method == "DELETE":
            self.engine.catalog.drop_table(m.group(3), m.group(1), m.group(2))
            return {}, 200

        # ---- REST v2 warehouses
        if path == "/api/v2/warehouses" and method == "POST":
            self.engine.warehouses.create(body["name"], body.get("warehouse_size", "X-SMALL"))
            return {"name": body["name"].upper()}, 200
        if path == "/api/v2/warehouses" and method == "GET":
            return [{"name": w.name, "state": w.state, "size": w.size}
                    for w in self.engine.warehouses.list()], 200
        m = re.match(r"^/api/v2/warehouses/([\w$]+):(resume|suspend)$", path)
        if m and method == "POST":
            self.engine.warehouses.set_state(m.group(1), m.group(2).upper())
            return {}, 200
        m = re.match(r"^/api/v2/warehouses/([\w$]+)$", path)
        if m and method == "DELETE":
            self.engine.warehouses.drop(m.group(1))
            return {}, 200

        raise errors.SnowflakeError("390404", f"unknown endpoint {method} {path}", "02000")

    def _statement_payload(self, st):
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
        }
        if st.result is not None:
            payload["resultSetMetaData"] = {
                "numRows": st.result.row_count,
                "format": "jsonv2",
                "rowType": st.result.row_type(),
            }
            payload["data"] = st.result.rowset_typed()
        return payload, 200
