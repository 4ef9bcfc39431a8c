"""Session manager: token-addressed sessions with expiry + renewal.

Mirrors `/root/reference/pkg/session/manager.go`: login creates a
session with token + master token (master valid 4x as long,
manager.go:48-108); renewal requires the master token
(manager.go:205-267); USE updates current database/schema
(manager.go:162-184). Token extraction accepts both
``Snowflake Token="x"`` and ``Bearer x`` headers
(server/handlers/session.go:329-355).
"""

from __future__ import annotations

import re
import threading
import time
import uuid
from dataclasses import dataclass, field

from . import config, errors
from .executor import SessionContext


@dataclass
class Session:
    id: str
    token: str
    master_token: str
    database: str = config.DEFAULT_DATABASE
    schema: str = config.DEFAULT_SCHEMA
    # identity from the login body (LOGIN_NAME/ACCOUNT_NAME, reference
    # server/types/types.go:16-17) / USE WAREHOUSE / USE ROLE — read
    # back by the CURRENT_* context functions
    user: str = config.DEFAULT_USER
    role: str = config.DEFAULT_ROLE
    warehouse: str = config.DEFAULT_WAREHOUSE
    account: str = config.DEFAULT_ACCOUNT
    parameters: dict[str, str] = field(default_factory=lambda: dict(config.DEFAULT_SESSION_PARAMETERS))
    variables: dict[str, object] = field(default_factory=dict)
    created_at: float = field(default_factory=time.time)
    token_expiry: float = 0.0
    master_expiry: float = 0.0
    # survives across HTTP requests so LAST_QUERY_ID()/RESULT_SCAN
    # work request-to-request (a fresh ctx per request otherwise
    # forgets it)
    last_query_id: str | None = None

    def context(self) -> SessionContext:
        ctx = SessionContext(self.database, self.schema)
        ctx.parameters = self.parameters
        ctx.variables = self.variables
        ctx.last_query_id = self.last_query_id
        ctx.user = self.user
        ctx.role = self.role
        ctx.warehouse = self.warehouse
        ctx.account = self.account
        ctx.session_id = self.id
        # keep ctx and session namespace in sync
        ctx._session = self  # type: ignore[attr-defined]
        return ctx


class SessionManager:
    def __init__(self, validity_secs: int = config.SESSION_TOKEN_VALIDITY_SECS):
        self._lock = threading.Lock()
        self._by_token: dict[str, Session] = {}
        self._by_id: dict[str, Session] = {}
        self.validity = validity_secs

    def create(self, database: str | None = None, schema: str | None = None) -> Session:
        now = time.time()
        s = Session(
            id=uuid.uuid4().hex,
            token=uuid.uuid4().hex + uuid.uuid4().hex,
            master_token=uuid.uuid4().hex + uuid.uuid4().hex,
            database=(database or config.DEFAULT_DATABASE).upper(),
            schema=(schema or config.DEFAULT_SCHEMA).upper(),
            token_expiry=now + self.validity,
            master_expiry=now + self.validity * config.MASTER_TOKEN_VALIDITY_FACTOR,
        )
        with self._lock:
            self._by_token[s.token] = s
            self._by_id[s.id] = s
        return s

    def validate(self, token: str) -> Session:
        s = self._by_token.get(token)
        if s is None:
            raise errors.invalid_token()
        if time.time() > s.token_expiry:
            raise errors.session_expired()
        return s

    def renew(self, master_token: str, old_token: str) -> Session:
        """Issue a fresh token pair given a valid master token
        (manager.go:205-267)."""
        with self._lock:
            s = self._by_token.get(old_token)
            if s is None or s.master_token != master_token:
                raise errors.invalid_token("Invalid master token")
            if time.time() > s.master_expiry:
                raise errors.master_token_expired()
            # pop, not del: a racing logout/renew may have removed the
            # old token already — a KeyError here surfaced as HTTP 500
            self._by_token.pop(old_token, None)
            now = time.time()
            s.token = uuid.uuid4().hex + uuid.uuid4().hex
            s.master_token = uuid.uuid4().hex + uuid.uuid4().hex
            s.token_expiry = now + self.validity
            s.master_expiry = now + self.validity * config.MASTER_TOKEN_VALIDITY_FACTOR
            self._by_token[s.token] = s
        return s

    def heartbeat(self, token: str) -> None:
        s = self.validate(token)
        s.token_expiry = time.time() + self.validity

    def logout(self, token: str) -> "Session | None":
        """Close the session; returns the closed Session (or None if
        already gone) so callers can run end-of-session cleanup
        (temporary-table drop)."""
        with self._lock:
            s = self._by_token.pop(token, None)
            if s is not None:
                self._by_id.pop(s.id, None)
            return s

    def use(self, token: str, database: str | None = None, schema: str | None = None) -> Session:
        s = self.validate(token)
        if database:
            s.database = database.upper()
        if schema:
            s.schema = schema.upper()
        return s


_TOKEN_RE = re.compile(r'Snowflake\s+Token="([^"]+)"', re.I)
_BEARER_RE = re.compile(r"Bearer\s+(\S+)", re.I)


def extract_token(auth_header: str | None) -> str:
    """Accept Snowflake Token="x" or Bearer x
    (session.go:329-355)."""
    if not auth_header:
        raise errors.missing_token()
    m = _TOKEN_RE.search(auth_header)
    if m:
        return m.group(1)
    m = _BEARER_RE.search(auth_header)
    if m:
        return m.group(1)
    raise errors.missing_token()
