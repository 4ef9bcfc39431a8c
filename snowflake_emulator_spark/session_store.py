"""Optional session persistence (reference analog:
`/root/reference/pkg/session/store.go:33-208`, the `_sessions` table).

Sessions are serialized to a JSON sidecar so a restarted server can
resume token validation. Persistence is opt-in, mirroring the
reference's optional store.
"""

from __future__ import annotations

import json
import os
import tempfile

from .sessions import Session, SessionManager


class FileSessionStore:
    def __init__(self, path: str):
        self.path = path

    def save(self, manager: SessionManager) -> None:
        with manager._lock:
            sessions = list(manager._by_id.values())
        payload = [
            {
                "id": s.id,
                "token": s.token,
                "master_token": s.master_token,
                "database": s.database,
                "schema": s.schema,
                "parameters": s.parameters,
                "created_at": s.created_at,
                "token_expiry": s.token_expiry,
                "master_expiry": s.master_expiry,
            }
            for s in sessions
        ]
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)  # atomic swap

    def load(self, manager: SessionManager) -> int:
        if not os.path.exists(self.path):
            return 0
        with open(self.path) as f:
            payload = json.load(f)
        n = 0
        with manager._lock:
            for rec in payload:
                s = Session(
                    id=rec["id"],
                    token=rec["token"],
                    master_token=rec["master_token"],
                    database=rec["database"],
                    schema=rec["schema"],
                    parameters=rec.get("parameters", {}),
                    created_at=rec.get("created_at", 0.0),
                    token_expiry=rec.get("token_expiry", 0.0),
                    master_expiry=rec.get("master_expiry", 0.0),
                )
                manager._by_token[s.token] = s
                manager._by_id[s.id] = s
                n += 1
        return n
