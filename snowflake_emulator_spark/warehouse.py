"""Virtual warehouse manager — pure metadata with a state machine.

The reference's warehouses hold "no actual compute resources"
(`/root/reference/pkg/warehouse/manager.go:25-40`); size is validated
against the Snowflake size list and RESUME/SUSPEND flips a state field
(`manager.go:111-161`). We mirror that exactly; optionally a size could
map to ``spark.sql.shuffle.partitions`` but reference semantics require
nothing.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from . import config, errors
from .naming import normalize_ident


@dataclass
class Warehouse:
    name: str
    size: str = "X-SMALL"
    state: str = "ACTIVE"
    comment: str | None = None
    created_on: float = field(default_factory=time.time)


class WarehouseManager:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._whs: dict[str, Warehouse] = {}

    def create(self, name: str, size: str = "X-SMALL", comment: str | None = None,
               or_replace: bool = False, if_not_exists: bool = False) -> Warehouse:
        size = size.upper()
        if size not in config.WAREHOUSE_SIZES:
            raise errors.invalid_parameter(f"invalid warehouse size: {size}")
        with self._lock:
            key = normalize_ident(name)
            if key in self._whs:
                if if_not_exists:
                    return self._whs[key]
                if not or_replace:
                    raise errors.object_exists(key)
            wh = Warehouse(key, size=size, comment=comment)
            self._whs[key] = wh
            return wh

    def get(self, name: str) -> Warehouse:
        wh = self._whs.get(normalize_ident(name))
        if wh is None:
            raise errors.object_not_found(normalize_ident(name))
        return wh

    def set_state(self, name: str, state: str) -> Warehouse:
        """RESUME -> ACTIVE, SUSPEND -> SUSPENDED
        (manager.go:111-161 state transitions).

        Lookup AND mutation under one lock: the old lookup-outside-lock
        let a concurrent DROP orphan the object while set_state
        reported success."""
        with self._lock:
            wh = self._whs.get(normalize_ident(name))
            if wh is None:
                raise errors.object_not_found(normalize_ident(name))
            if state == "RESUME":
                wh.state = "ACTIVE"
            elif state == "SUSPEND":
                wh.state = "SUSPENDED"
            else:
                raise errors.invalid_parameter(f"invalid warehouse state change: {state}")
            return wh

    def drop(self, name: str, if_exists: bool = False) -> None:
        with self._lock:
            if self._whs.pop(normalize_ident(name), None) is None and not if_exists:
                raise errors.object_not_found(normalize_ident(name))

    def list(self) -> list[Warehouse]:
        with self._lock:   # snapshot: concurrent create/drop mutates the dict
            whs = list(self._whs.values())
        return sorted(whs, key=lambda w: w.name)
