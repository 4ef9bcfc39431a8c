"""Stage manager: named file landing zones.

Mirrors `/root/reference/pkg/stage/manager.go`: a stage is a directory
(`manager.go:252-254`), PUT/GET/REMOVE are sanitized file operations
(`manager.go:89-162`, `221-249`), LIST is a recursive walk with glob
matching (`manager.go:165-218`). Driver-side I/O is correct here — on a
cluster the stage directory would live on shared/object storage and
``spark.read`` does the distributed part.
"""

from __future__ import annotations

import fnmatch
import os
import shutil

from .. import errors
from ..catalog import Catalog, StageMeta


class StageManager:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def _resolve_inside(self, stage: StageMeta, rel: str) -> str:
        """Path-traversal-sanitized join (manager.go:89-105)."""
        rel = rel.lstrip("/")
        dest = os.path.normpath(os.path.join(stage.directory, rel))
        base = os.path.normpath(stage.directory)
        if not (dest == base or dest.startswith(base + os.sep)):
            raise errors.invalid_parameter(f"illegal stage path: {rel!r}")
        return dest

    @staticmethod
    def _require_file_dest(stage: StageMeta, dest: str) -> None:
        """PUT destinations must be files: '' or '/' resolve to the
        stage root and open(dir) raised a raw IsADirectoryError."""
        if os.path.normpath(dest) == os.path.normpath(stage.directory) \
                or os.path.isdir(dest):
            raise errors.invalid_parameter(
                "stage PUT destination must be a file path, not a directory")

    def put_file(self, stage: StageMeta, local_path: str, dest_rel: str | None = None) -> str:
        dest = self._resolve_inside(stage, dest_rel or os.path.basename(local_path))
        self._require_file_dest(stage, dest)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy2(local_path, dest)
        return dest

    def put_bytes(self, stage: StageMeta, data: bytes, dest_rel: str) -> str:
        dest = self._resolve_inside(stage, dest_rel)
        self._require_file_dest(stage, dest)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as f:
            f.write(data)
        return dest

    def get_file(self, stage: StageMeta, rel: str) -> bytes:
        path = self._resolve_inside(stage, rel)
        if not os.path.isfile(path):
            raise errors.object_not_found(rel)
        with open(path, "rb") as f:
            return f.read()

    def remove_file(self, stage: StageMeta, rel: str) -> None:
        path = self._resolve_inside(stage, rel)
        if os.path.isfile(path):
            os.remove(path)

    def list_files(self, stage: StageMeta, pattern: str | None = None,
                   prefix: str | None = None) -> list[str]:
        """Recursive walk + glob match, returning stage-relative paths
        (manager.go:165-218)."""
        out: list[str] = []
        base = stage.directory
        for root, _dirs, files in os.walk(base):
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), base)
                if prefix and not rel.startswith(prefix.lstrip("/")):
                    continue
                if pattern and not (fnmatch.fnmatch(rel, pattern) or fnmatch.fnmatch(fn, pattern)):
                    continue
                out.append(rel)
        return sorted(out)
