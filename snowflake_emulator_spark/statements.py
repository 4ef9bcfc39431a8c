"""Statement manager: async-looking handles over synchronous execution.

Mirrors `/root/reference/pkg/query/statement_manager.go`: handles are
``"01" + 32 hex chars`` (statement_manager.go:204-207), statements move
pending -> running -> success/failed/canceled, results are stored on the
handle, and a TTL GC evicts old handles (181-201). Cancellation hooks
into Spark job groups (the analog of the reference's context
cancelFunc): each statement runs under a job group that
``cancel`` interrupts via ``sparkContext.cancelJobGroup``.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

from . import errors
from .result import Result


class StatementStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    CANCELED = "canceled"


@dataclass
class Statement:
    handle: str
    sql: str
    status: StatementStatus = StatementStatus.PENDING
    result: Result | None = None
    error: errors.SnowflakeError | None = None
    created_at: float = field(default_factory=time.time)
    job_group: str | None = None


class StatementManager:
    def __init__(self, spark=None, ttl_secs: int = 3600):
        self.spark = spark
        self.ttl = ttl_secs
        self._lock = threading.Lock()
        self._stmts: dict[str, Statement] = {}

    def create(self, sql: str) -> Statement:
        handle = "01" + uuid.uuid4().hex  # handle format: statement_manager.go:204-207
        st = Statement(handle=handle, sql=sql, job_group=f"stmt-{handle}")
        with self._lock:
            self._stmts[handle] = st
        self._gc()
        return st

    def get(self, handle: str) -> Statement:
        with self._lock:
            st = self._stmts.get(handle)
        if st is None:
            raise errors.statement_not_found(handle)
        return st

    def run(self, st: Statement, fn) -> Statement:
        """Execute ``fn() -> Result`` under the statement's job group so
        cancel() can interrupt in-flight Spark jobs.

        Status transitions happen under the manager lock and CANCELED
        always wins: a cancel landing before the run starts skips
        execution, and one landing during/after execution is never
        overwritten by SUCCESS or FAILED (the interrupt usually
        surfaces as an exception — reporting that as FAILED hid the
        cancellation from polling clients)."""
        with self._lock:
            if st.status == StatementStatus.CANCELED:
                return st
            st.status = StatementStatus.RUNNING
        if self.spark is not None and st.job_group:
            self.spark.sparkContext.setJobGroup(st.job_group, st.sql[:100], interruptOnCancel=True)
        try:
            result = fn()
            with self._lock:
                if st.status != StatementStatus.CANCELED:
                    st.result = result
                    st.status = StatementStatus.SUCCESS
        except errors.SnowflakeError as e:
            with self._lock:
                if st.status != StatementStatus.CANCELED:
                    st.status = StatementStatus.FAILED
                    st.error = e
        except Exception as e:  # noqa: BLE001
            with self._lock:
                if st.status != StatementStatus.CANCELED:
                    st.status = StatementStatus.FAILED
                    st.error = errors.execution_error(str(e))
        finally:
            if self.spark is not None:
                self.spark.sparkContext.setJobGroup("", "")
        return st

    def cancel(self, handle: str) -> Statement:
        st = self.get(handle)
        with self._lock:
            should_interrupt = st.status in (
                StatementStatus.PENDING, StatementStatus.RUNNING)
            if should_interrupt:
                st.status = StatementStatus.CANCELED
        if should_interrupt and self.spark is not None and st.job_group:
            self.spark.sparkContext.cancelJobGroup(st.job_group)
        return st

    def _gc(self) -> None:
        """Evict handles older than the TTL (statement_manager.go:181-201)."""
        cutoff = time.time() - self.ttl
        with self._lock:
            for h in [h for h, st in self._stmts.items() if st.created_at < cutoff]:
                del self._stmts[h]
