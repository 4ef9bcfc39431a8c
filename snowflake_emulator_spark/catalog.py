"""Snowflake-shaped catalog over Spark-managed parquet tables.

Reference model (`/root/reference/pkg/metadata/repository.go`):
database -> schema -> table/stage/file-format, with unquoted identifiers
uppercased and the 3-level namespace flattened onto the engine's
2-level one (``DB.SCHEMA_TABLE``, `pkg/query/table_naming.go:23-40`).

Spark-first design decisions:

* Tables are **immutable versioned parquet directories**
  ``<base>/<DB>/<SCHEMA>/<TABLE>/v<N>``; every write (insert / update /
  delete / merge / copy) produces a new version directory and atomically
  bumps the catalog's version pointer. This sidesteps the
  read-modify-overwrite self-read hazard of rewriting a parquet dir in
  place, makes concurrent readers safe, and gives BEGIN/ROLLBACK real
  semantics (restore version pointers) that the reference gets from
  DuckDB's ACID (`pkg/query/executor.go:399-426`) — see
  ``Engine.begin/commit/rollback``.
* Each table version is registered as a Spark temp view under its
  flattened physical name (``DB__SCHEMA__TABLE``); name resolution in
  SQL happens by rewriting qualified names onto those views.
* Column metadata (Snowflake type text, nullable, default, primary key)
  lives driver-side, mirroring the serialized coldefs of the reference
  (`pkg/metadata/repository.go:584-661`); Spark neither enforces PK nor
  DEFAULT, same as DuckDB-side enforcement being the reference's only
  enforcement.
"""

from __future__ import annotations

import itertools
import json
import os
import re
import shutil
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import config, errors
from .functions.typemap import snowflake_to_spark, spark_to_snowflake_name
from .naming import normalize_ident, physical_name, split_qualified


@dataclass
class ColumnDef:
    name: str
    sf_type: str
    nullable: bool = True
    default: str | None = None
    primary_key: bool = False
    # ALTER TABLE ... ALTER COLUMN c COMMENT 'x' (surfaced by DESCRIBE)
    comment: str | None = None
    # attached masking policy name (ALTER TABLE ... SET MASKING POLICY);
    # resolved in the owning table's namespace, enforced on every read
    masking_policy: str | None = None

    def spark_field(self) -> T.StructField:
        return T.StructField(self.name, snowflake_to_spark(self.sf_type), self.nullable)


@dataclass
class TableMeta:
    database: str
    schema: str
    name: str
    columns: list[ColumnDef] = field(default_factory=list)
    comment: str | None = None
    clustering_key: str | None = None
    kind: str = "TABLE"
    version: int = 0
    location: str | None = None  # base dir holding v<N> subdirs
    created_on: float = field(default_factory=time.time)
    # unique per TableMeta instance: lets caches distinguish a table
    # that was dropped and re-created (same name, same version number)
    uid: int = field(default_factory=itertools.count().__next__)
    # bumped when files are appended IN PLACE (COPY fast path) without a
    # new version: view caches keyed on (uid, version, data_epoch) then
    # refresh their file listing
    data_epoch: int = 0
    # versions kept for time travel beyond the live one (the
    # DATA_RETENTION_TIME_IN_DAYS analog in an emulator whose history
    # unit is the write, not the day); ALTER TABLE ... SET
    # DATA_RETENTION_VERSIONS = n widens/narrows the AT() window
    retention_versions: int = 3
    # set when the table enters the UNDROP graveyard (SHOW TABLES
    # HISTORY surfaces it as dropped_on)
    dropped_on: float | None = None
    # attached row access policy (ALTER TABLE ... ADD ROW ACCESS POLICY
    # p ON (cols)): policy name + the table columns bound to its args
    row_access_policy: str | None = None
    row_access_columns: list[str] = field(default_factory=list)

    @property
    def physical(self) -> str:
        return physical_name(self.database, self.schema, self.name)

    def version_path(self, v: int | None = None) -> str:
        assert self.location
        return os.path.join(self.location, f"v{self.version if v is None else v}")

    def spark_schema(self) -> T.StructType:
        return T.StructType([c.spark_field() for c in self.columns])


@dataclass
class StreamMeta:
    """CDC stream over a versioned table (Snowflake CREATE STREAM;
    beyond the reference). The stream's offset is a pinned version of
    the source table; reading the stream diffs the table's current
    contents against that version. The offset version is exempt from
    GC and from in-place fast-append while the stream exists."""
    database: str
    schema: str
    name: str
    src: tuple[str, str, str]
    src_uid: int
    offset_version: int
    append_only: bool = False
    comment: str | None = None
    created_on: float = field(default_factory=time.time)

    @property
    def physical(self) -> str:
        return physical_name(self.database, self.schema, self.name) + "__stream"


@dataclass
class ViewMeta:
    """Named view: a stored SELECT, re-planned lazily against the
    CURRENT table versions whenever referenced (Snowflake CREATE VIEW;
    the reference declares a VIEW table type in its metadata model,
    pkg/metadata/repository.go:46, but never implements the DDL — this
    is a beyond-reference upgrade). The definition binds to the view's
    own database/schema, like Snowflake."""
    database: str
    schema: str
    name: str
    sql_text: str
    column_names: list[str] | None = None
    comment: str | None = None
    created_on: float = field(default_factory=time.time)
    uid: int = field(default_factory=itertools.count().__next__)

    @property
    def physical(self) -> str:
        return physical_name(self.database, self.schema, self.name) + "__view"


@dataclass
class SequenceMeta:
    """CREATE SEQUENCE (beyond reference). Snowflake sequences
    guarantee uniqueness and per-statement monotonicity but NOT
    gaplessness — which is exactly what a distributed engine can
    provide cheaply: each statement referencing NEXTVAL reserves a
    block of values up-front (one driver-side counter bump), and rows
    inside the statement draw from the block via
    monotonically_increasing_id (unique per row, executor-parallel,
    no shuffle and no coordination)."""
    database: str
    schema: str
    name: str
    start: int = 1
    increment: int = 1
    next_base: int = 0  # statements reserve [next_base, next_base+block)


@dataclass
class MaskingPolicyMeta:
    """CREATE MASKING POLICY p AS (val <type>) RETURNS <type> -> <body>
    (beyond reference; Snowflake dynamic data masking). The body is a
    Snowflake-SQL expression over the single argument; the executor
    substitutes the masked column for the argument and evaluates the
    expression — including CURRENT_ROLE()-style context functions —
    with the QUERYING session's identity at read time."""
    database: str
    schema: str
    name: str
    arg_name: str
    arg_type: str
    returns: str
    body: str
    comment: str | None = None
    created_on: float = field(default_factory=time.time)


@dataclass
class RowAccessPolicyMeta:
    """CREATE ROW ACCESS POLICY p AS (a <t> [, b <t> ...]) RETURNS
    BOOLEAN -> <predicate> (beyond reference; Snowflake row-level
    security). Attached to a table with ALTER TABLE ... ADD ROW ACCESS
    POLICY p ON (col [, col ...]); reads keep only rows where the
    predicate — evaluated with the querying session's identity — is
    true."""
    database: str
    schema: str
    name: str
    arg_names: list[str]
    arg_types: list[str]
    body: str
    comment: str | None = None
    created_on: float = field(default_factory=time.time)


@dataclass
class FunctionMeta:
    """CREATE FUNCTION — SQL scalar UDF (beyond reference: the
    reference's README rules UDFs out). The body is a single SQL
    expression over the named arguments; call sites are expanded by
    textual macro substitution BEFORE translation, so the body may use
    the full Snowflake function surface and the expansion stays
    JVM-side (zero runtime dispatch cost — exactly how Snowflake
    inlines SQL UDFs into the calling query plan)."""
    database: str
    schema: str
    name: str
    arg_names: list[str]
    arg_types: list[str]
    returns: str
    body: str
    comment: str | None = None
    # RETURNS TABLE(col TYPE, …) — set for SQL UDTFs; the body is then a
    # SELECT inlined as a derived table at TABLE(f(…)) call sites
    table_columns: list[tuple[str, str]] | None = None
    # LANGUAGE PYTHON functions register as Spark Python UDFs instead
    # of macro-expanding; ``handler`` names the entry point in the body
    language: str = "SQL"
    handler: str | None = None


@dataclass
class TaskMeta:
    """CREATE TASK (beyond the reference): stored SQL with a schedule
    string. The emulator runs tasks on demand (EXECUTE TASK) — the
    stream+task+MERGE incremental-maintenance triad — rather than
    hosting a scheduler thread; SCHEDULE is carried as metadata the way
    the reference carries CLUSTER BY."""
    database: str
    schema: str
    name: str
    sql_text: str
    schedule: str | None = None
    warehouse: str | None = None
    comment: str | None = None
    state: str = "suspended"  # Snowflake tasks start suspended
    created_on: float = field(default_factory=time.time)
    last_run_on: float | None = None


@dataclass
class StageMeta:
    database: str
    schema: str
    name: str
    url: str | None = None
    comment: str | None = None
    directory: str = ""


@dataclass
class FileFormatMeta:
    database: str
    schema: str
    name: str
    format_type: str = "CSV"
    options: dict = field(default_factory=dict)


class Catalog:
    """Driver-side metadata store + Spark-backed table storage."""

    def __init__(self, spark: SparkSession, base_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir or os.path.join(
            os.environ.get("SNOWEMU_DATA_DIR", "/tmp/snowemu_warehouse"), str(os.getpid())
        )
        os.makedirs(self.base_dir, exist_ok=True)
        self._lock = threading.RLock()
        # per-table write locks: long-running write jobs must not
        # serialize against writes to OTHER tables (N10 analog —
        # reference serializes all writes behind one mutex,
        # connection/manager.go:39-43; per-table is the scalable design)
        self._table_locks: dict[tuple[str, str, str], threading.Lock] = {}
        # versions referenced by open transaction snapshots (table key
        # -> set of protected version numbers): GC must not delete them
        # and COPY fast-append must not mutate them
        self._protected: dict[tuple[str, str, str], set[int]] = {}
        # time-travel read pins: key -> {version: [pin timestamps]}
        # (see pin_version_for_read below)
        self._tt_pins: dict[tuple[str, str, str], dict[int, list[float]]] = {}
        # thread-local sink collecting table keys written by the
        # statement currently executing on this thread (set by
        # Engine.execute while a transaction is open, so ROLLBACK can
        # restore only tables the transaction itself touched)
        self._dirty_tl = threading.local()
        self.databases: dict[str, dict] = {}
        self.schemas: dict[tuple[str, str], dict] = {}
        self.tables: dict[tuple[str, str, str], TableMeta] = {}
        # UNDROP retention: most recent dropped table per key, its data
        # dir renamed aside (O(1)); replaced when the same name is
        # dropped again (older graveyard dir is purged then)
        self.dropped_tables: dict[tuple[str, str, str], TableMeta] = {}
        self.streams: dict[tuple[str, str, str], StreamMeta] = {}
        self.tasks: dict[tuple[str, str, str], TaskMeta] = {}
        self.views: dict[tuple[str, str, str], ViewMeta] = {}
        # monotonic catalog-state counter, bumped on any table-data or
        # view-definition change; view temp-view registrations cache on
        # it so an unchanged catalog costs zero Spark calls per query
        self.mutation: int = 0
        self.stages: dict[tuple[str, str, str], StageMeta] = {}
        self.sequences: dict[tuple[str, str, str], SequenceMeta] = {}
        self.functions: dict[tuple[str, str, str], FunctionMeta] = {}
        # column masking policies (beyond reference; Snowflake dynamic
        # data masking): enforced at read time by the executor
        self.masking_policies: dict[tuple[str, str, str], MaskingPolicyMeta] = {}
        self.row_access_policies: dict[tuple[str, str, str], RowAccessPolicyMeta] = {}
        # metadata-only RBAC records: (priv, obj_type, obj_name,
        # grantee_type, grantee) — recorded + listable, not enforced
        self.grants: list[tuple[str, str, str, str, str]] = []
        self.file_formats: dict[tuple[str, str, str], FileFormatMeta] = {}
        # TEMPORARY tables -> owning session object (strong ref: the
        # owner is compared by identity at cleanup, and holding the
        # ref prevents CPython id-reuse confusing ownership)
        self.temp_owners: dict[tuple[str, str, str], object] = {}
        # COPY load history per table: stage-relative file -> (size,
        # mtime_ns) signature. Snowflake skips already-loaded files on
        # re-COPY unless FORCE=TRUE; keyed per table, cleared on drop.
        # In-memory for the process lifetime (Snowflake's is 64 days).
        self.copy_load_history: dict[tuple[str, str, str], dict[str, tuple]] = {}
        # CREATE PIPE name AS COPY INTO ... — stored COPY text,
        # executed by ALTER PIPE ... REFRESH (Snowpipe's REFRESH
        # trigger; no auto-ingest daemon in this emulator)
        self.pipes: dict[tuple[str, str, str], str] = {}
        self._copy_locks: dict[tuple[str, str, str], threading.Lock] = {}
        # default namespace exists from the start, like the reference's
        # auto-created TEST_DB.PUBLIC (server/handlers/session.go:94-102)
        self.create_database(config.DEFAULT_DATABASE, if_not_exists=True)
        self.create_schema(config.DEFAULT_DATABASE, config.DEFAULT_SCHEMA, if_not_exists=True)

    # ---------------- databases / schemas ----------------

    def create_database(self, name: str, comment: str | None = None, if_not_exists: bool = False,
                        or_replace: bool = False) -> None:
        with self._lock:
            db = normalize_ident(name)
            if db in self.databases:
                if or_replace:
                    self.drop_database(db)
                elif if_not_exists:
                    return
                else:
                    raise errors.object_exists(db)
            self.databases[db] = {"comment": comment, "created_on": time.time()}
            self.schemas.setdefault((db, config.DEFAULT_SCHEMA), {"comment": None, "created_on": time.time()})

    def drop_database(self, name: str, if_exists: bool = False) -> None:
        with self._lock:
            db = normalize_ident(name)
            if db not in self.databases:
                if if_exists:
                    return
                raise errors.object_not_found(db)
            for key in [k for k in self.tables if k[0] == db]:
                self._drop_table_key(key)
            self.schemas = {k: v for k, v in self.schemas.items() if k[0] != db}
            self.stages = {k: v for k, v in self.stages.items() if k[0] != db}
            self.file_formats = {k: v for k, v in self.file_formats.items() if k[0] != db}
            # every schema-level object namespace must empty too, or a
            # recreated database inherits stale views/streams/UDFs that
            # block same-named tables and stay listable forever
            self._drop_namespace_objects(lambda k: k[0] == db)
            del self.databases[db]

    def alter_database_comment(self, name: str, comment: str) -> None:
        with self._lock:
            db = normalize_ident(name)
            if db not in self.databases:
                raise errors.object_not_found(db)
            self.databases[db]["comment"] = comment

    def create_schema(self, db: str, name: str, comment: str | None = None,
                      if_not_exists: bool = False) -> None:
        with self._lock:
            db, sch = normalize_ident(db), normalize_ident(name)
            if db not in self.databases:
                raise errors.object_not_found(db)
            if (db, sch) in self.schemas:
                if if_not_exists:
                    return
                raise errors.object_exists(f"{db}.{sch}")
            self.schemas[(db, sch)] = {"comment": comment, "created_on": time.time()}

    def drop_schema(self, db: str, name: str, if_exists: bool = False) -> None:
        with self._lock:
            db, sch = normalize_ident(db), normalize_ident(name)
            if (db, sch) not in self.schemas:
                if if_exists:
                    return
                raise errors.object_not_found(f"{db}.{sch}")
            for key in [k for k in self.tables if k[0] == db and k[1] == sch]:
                self._drop_table_key(key)
            self._drop_namespace_objects(lambda k: k[0] == db and k[1] == sch)
            del self.schemas[(db, sch)]

    def _drop_namespace_objects(self, pred) -> None:
        """Remove schema-level objects matching the key predicate (used
        by DROP DATABASE/SCHEMA). Caller holds self._lock."""
        for store_name in ("views", "streams", "tasks", "sequences",
                           "functions", "procedures", "masking_policies",
                           "row_access_policies"):
            store = getattr(self, store_name, None)
            if isinstance(store, dict):
                for k in [k for k in store if pred(k)]:
                    del store[k]
        self.mutation += 1

    # ---------------- tables ----------------

    def resolve(self, name: str, database: str | None = None, schema: str | None = None) -> tuple[str, str, str]:
        return split_qualified(name, database, schema)

    def get_table(self, name: str, database: str | None = None, schema: str | None = None) -> TableMeta:
        key = self.resolve(name, database, schema)
        tm = self.tables.get(key)
        if tm is None:
            raise errors.object_not_found(".".join(key))
        return tm

    def has_table(self, name: str, database: str | None = None, schema: str | None = None) -> bool:
        return self.resolve(name, database, schema) in self.tables

    def create_table(self, name: str, columns: list[ColumnDef], database: str | None = None,
                     schema: str | None = None, comment: str | None = None,
                     if_not_exists: bool = False, or_replace: bool = False,
                     df: DataFrame | None = None, clustering_key: str | None = None) -> TableMeta:
        """Create a managed table; optionally seed with ``df`` (CTAS)."""
        with self._lock:
            db, sch, tbl = self.resolve(name, database, schema)
            if db not in self.databases:
                raise errors.object_not_found(db)
            if (db, sch) not in self.schemas:
                raise errors.object_not_found(f"{db}.{sch}")
            if (db, sch, tbl) in self.tables:
                if or_replace:
                    self._drop_table_key((db, sch, tbl))
                elif if_not_exists:
                    return self.tables[(db, sch, tbl)]
                else:
                    raise errors.object_exists(f"{db}.{sch}.{tbl}")
            if (db, sch, tbl) in self.views:
                if not or_replace:
                    raise errors.object_exists(f"{db}.{sch}.{tbl} (a view with that name exists)")
                self.views.pop((db, sch, tbl))
                self.mutation += 1
            tm = TableMeta(db, sch, tbl, columns=columns, comment=comment,
                           clustering_key=clustering_key,
                           location=os.path.join(self.base_dir, db, sch, tbl))
            seed = df if df is not None else self.spark.createDataFrame([], tm.spark_schema())
            os.makedirs(tm.location, exist_ok=True)
            self._write_version(tm, seed, first=True)
            self.tables[(db, sch, tbl)] = tm
            return tm

    def alter_table_comment(self, name: str, comment: str, database: str | None = None,
                            schema: str | None = None) -> None:
        """ALTER TABLE ... SET COMMENT (REST v2 PUT /tables/{table};
        reference rest_api_v2.go:731-... UpdateTableComment)."""
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.tables:
                raise errors.object_not_found(".".join(key))
            self.tables[key].comment = comment

    def drop_table(self, name: str, database: str | None = None, schema: str | None = None,
                   if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.tables:
                if if_exists:
                    return
                raise errors.object_not_found(".".join(key))
            self._drop_table_key(key)

    def copy_table_lock(self, key: tuple[str, str, str]) -> threading.Lock:
        """Per-table mutex serializing COPY's history-check/load/record
        sequence (see CopyProcessor.execute)."""
        with self._lock:
            return self._copy_locks.setdefault(key, threading.Lock())

    def mark_table_kind(self, tm: TableMeta, kindkw: str, owner: object) -> None:
        """Apply a CREATE-time table kind (TEMP/TEMPORARY/TRANSIENT)."""
        with self._lock:
            if kindkw in ("TEMP", "TEMPORARY"):
                tm.kind = "TEMPORARY"
                self.temp_owners[(tm.database, tm.schema, tm.name)] = owner
            elif kindkw == "TRANSIENT":
                tm.kind = "TRANSIENT"
                tm.retention_versions = 1
            self.mutation += 1

    def drop_temp_tables(self, owner: object) -> list[tuple[str, str, str]]:
        """Drop every TEMPORARY table owned by ``owner`` (identity
        compare); called at session close. Returns the dropped keys."""
        with self._lock:
            keys = [k for k, o in self.temp_owners.items() if o is owner]
            for k in keys:
                self.temp_owners.pop(k, None)
                if k in self.tables:
                    self._drop_table_key(k)
            return keys

    def _drop_table_key(self, key: tuple[str, str, str]) -> None:
        tm = self.tables.pop(key)
        self.temp_owners.pop(key, None)
        self.copy_load_history.pop(key, None)
        self.mutation += 1
        self.spark.catalog.dropTempView(tm.physical)
        if not tm.location or not os.path.exists(tm.location) or tm.kind == "EXTERNAL":
            return
        # UNDROP retention (Snowflake time-travel drop semantics, beyond
        # the reference): rename the data dir aside — O(1) metadata move,
        # no data copy — and keep the meta so UNDROP TABLE can restore
        # it. Only the most recent drop per name is retained.
        prev = self.dropped_tables.pop(key, None)
        if prev is not None and prev.location and os.path.exists(prev.location):
            shutil.rmtree(prev.location, ignore_errors=True)
        grave = f"{tm.location}.dropped.{tm.uid}"
        try:
            os.rename(tm.location, grave)
        except OSError:
            shutil.rmtree(tm.location, ignore_errors=True)
            return
        tm.location = grave
        tm.dropped_on = time.time()
        self.dropped_tables[key] = tm

    def undrop_table(self, name: str, database: str | None = None,
                     schema: str | None = None) -> TableMeta:
        """UNDROP TABLE: restore the most recently dropped table of this
        name from its renamed-aside data dir (zero data movement unless
        the canonical path is free again, in which case it is renamed
        back). Errors if an object of the name currently exists, like
        Snowflake."""
        with self._lock:
            key = self.resolve(name, database, schema)
            if key in self.tables:
                raise errors.object_exists(".".join(key))
            tm = self.dropped_tables.pop(key, None)
            if tm is None:
                raise errors.object_not_found(".".join(key))
            canonical = os.path.join(self.base_dir, *key)
            if not os.path.exists(canonical):
                try:
                    os.rename(tm.location, canonical)
                    tm.location = canonical
                except OSError:
                    pass  # keep serving from the graveyard dir
            tm.dropped_on = None
            self.tables[key] = tm
            self.register_view(tm)
            return tm

    def clone_table(self, src: TableMeta, dst_name: str, database: str | None = None,
                    schema: str | None = None, at_version: int | None = None,
                    if_not_exists: bool = False, or_replace: bool = False) -> TableMeta:
        """CREATE TABLE ... CLONE — zero-copy clone (beyond the
        reference; Snowflake-signature feature that falls out of the
        immutable version-dir design): hard-link the source version's
        parquet files into the clone's v1. O(files) metadata work, no
        data bytes moved — the only viable clone at 100 TB. Combined
        with AT(VERSION|OFFSET|TIMESTAMP => ...) it clones a historical
        version. Subsequent writes to either table diverge naturally
        because every write creates a fresh version dir (in-place COPY
        fast-append only ever ADDS files to a dir the other table does
        not list)."""
        import copy as _copy
        with self._lock:
            db, sch, tbl = self.resolve(dst_name, database, schema)
            if (db, sch, tbl) in self.tables:
                if or_replace:
                    self._drop_table_key((db, sch, tbl))
                elif if_not_exists:
                    return self.tables[(db, sch, tbl)]
                else:
                    raise errors.object_exists(f"{db}.{sch}.{tbl}")
            tm = TableMeta(db, sch, tbl, columns=_copy.deepcopy(src.columns),
                           comment=src.comment, clustering_key=src.clustering_key,
                           location=os.path.join(self.base_dir, db, sch, tbl),
                           version=1,
                           # Snowflake: a clone retains the source's
                           # masking (deep-copied columns) AND row
                           # access policy associations
                           row_access_policy=src.row_access_policy,
                           row_access_columns=list(src.row_access_columns))
            src_dir = src.version_path(at_version)
            if not os.path.isdir(src_dir):
                raise errors.execution_error(
                    f"clone source version not available: {src_dir}")
            dst_dir = tm.version_path(1)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in os.listdir(src_dir):
                s, d = os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                if os.path.isfile(s):
                    try:
                        os.link(s, d)
                    except OSError:
                        shutil.copy2(s, d)
            self.tables[(db, sch, tbl)] = tm
            self.register_view(tm)
            return tm

    def read_table(self, tm: TableMeta) -> DataFrame:
        if tm.kind == "EXTERNAL":
            return getattr(tm, "read_df")
        return self.spark.read.schema(tm.spark_schema()).parquet(tm.version_path())

    def _write_version(self, tm: TableMeta, df: DataFrame, first: bool = False) -> None:
        """Write a new immutable version dir and re-register the view.

        The enforced write schema is the table's declared schema; inputs
        are cast column-by-column positionally (Snowflake/DuckDB-style
        implicit cast on INSERT)."""
        target = tm.spark_schema()
        if tm.columns and len(df.schema.fields) != len(target.fields):
            raise errors.execution_error(
                f"column count mismatch for {tm.physical}: got {len(df.schema.fields)}, want {len(target.fields)}"
            )
        cols = [df[src.name].cast(f.dataType).alias(f.name)
                for f, src in zip(target.fields, df.schema.fields)]
        out = df.select(*cols) if tm.columns else df
        if tm.clustering_key:
            # CLUSTER BY: co-locate rows sharing the clustering key so
            # downstream equi-joins/aggs on it avoid a shuffle (the
            # reference stores the key as metadata only,
            # pkg/metadata/repository.go:135-146 — we act on it)
            keys = [k.strip() for k in tm.clustering_key.split(",") if k.strip()]
            try:
                out = out.repartition(*keys).sortWithinPartitions(*keys)
            except Exception:
                pass  # bad key: fall back to unclustered write
        new_version = tm.version + 1 if not first else 1
        path = tm.version_path(new_version)
        out.write.mode("overwrite").parquet(path)
        tm.version = new_version
        self._mark_dirty(tm)
        self.register_view(tm)
        self._gc_versions(tm)

    def _table_lock(self, tm: TableMeta) -> threading.Lock:
        key = (tm.database, tm.schema, tm.name)
        with self._lock:
            return self._table_locks.setdefault(key, threading.Lock())

    # ---------------- masking policies ----------------

    def create_masking_policy(self, name: str, arg_name: str, arg_type: str,
                              returns: str, body: str,
                              database: str | None = None, schema: str | None = None,
                              or_replace: bool = False, if_not_exists: bool = False,
                              comment: str | None = None) -> MaskingPolicyMeta:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key in self.masking_policies:
                if if_not_exists:
                    return self.masking_policies[key]
                if not or_replace:
                    raise errors.object_exists(".".join(key))
            pm = MaskingPolicyMeta(key[0], key[1], key[2], arg_name.upper(),
                                   arg_type.upper(), returns.upper(), body.strip(),
                                   comment=comment)
            self.masking_policies[key] = pm
            self.mutation += 1
            return pm

    def drop_masking_policy(self, name: str, database: str | None = None,
                            schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.masking_policies:
                if if_exists:
                    return
                raise errors.object_not_found(".".join(key))
            # Snowflake refuses to drop a policy still attached to a column
            for tm in self.tables.values():
                for c in tm.columns:
                    if c.masking_policy and self.resolve(
                            c.masking_policy, tm.database, tm.schema) == key:
                        raise errors.execution_error(
                            f"masking policy {key[2]} is attached to "
                            f"{tm.name}.{c.name}; detach it first")
            del self.masking_policies[key]
            self.mutation += 1

    def get_masking_policy(self, name: str, database: str | None = None,
                           schema: str | None = None) -> MaskingPolicyMeta:
        key = self.resolve(name, database, schema)
        pm = self.masking_policies.get(key)
        if pm is None:
            raise errors.object_not_found(".".join(key))
        return pm

    def create_row_access_policy(self, name: str, arg_names: list[str],
                                 arg_types: list[str], body: str,
                                 database: str | None = None, schema: str | None = None,
                                 or_replace: bool = False, if_not_exists: bool = False,
                                 comment: str | None = None) -> RowAccessPolicyMeta:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key in self.row_access_policies:
                if if_not_exists:
                    return self.row_access_policies[key]
                if not or_replace:
                    raise errors.object_exists(".".join(key))
            pm = RowAccessPolicyMeta(
                key[0], key[1], key[2],
                [a.upper() for a in arg_names],
                [t.upper() for t in arg_types], body.strip(), comment=comment)
            self.row_access_policies[key] = pm
            self.mutation += 1
            return pm

    def drop_row_access_policy(self, name: str, database: str | None = None,
                               schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.row_access_policies:
                if if_exists:
                    return
                raise errors.object_not_found(".".join(key))
            for tm in self.tables.values():
                if tm.row_access_policy and self.resolve(
                        tm.row_access_policy, tm.database, tm.schema) == key:
                    raise errors.execution_error(
                        f"row access policy {key[2]} is attached to "
                        f"{tm.name}; detach it first")
            del self.row_access_policies[key]
            self.mutation += 1

    def get_row_access_policy(self, name: str, database: str | None = None,
                              schema: str | None = None) -> RowAccessPolicyMeta:
        key = self.resolve(name, database, schema)
        pm = self.row_access_policies.get(key)
        if pm is None:
            raise errors.object_not_found(".".join(key))
        return pm

    def swap_tables(self, name_a: str, name_b: str,
                    database: str | None = None, schema: str | None = None) -> tuple:
        """ALTER TABLE a SWAP WITH b (Snowflake): atomically exchange the
        two tables' contents AND metadata. Pure pointer swap — the
        TableMeta objects (location, versions, columns, uid) trade
        catalog keys and identity fields; no data is read or rewritten,
        exactly like Snowflake's metadata-only swap. DDL is
        non-transactional (Snowflake: implicit commit), so an open
        transaction's per-key snapshots intentionally track the KEY, not
        the swapped object."""
        key_a = self.resolve(name_a, database, schema)
        key_b = self.resolve(name_b, database, schema)
        if key_a == key_b:
            raise errors.execution_error(
                f"cannot swap table {'.'.join(key_a)} with itself")
        with self._lock:
            ta = self.tables.get(key_a)
            tb = self.tables.get(key_b)
            if ta is None:
                raise errors.object_not_found(".".join(key_a))
            if tb is None:
                raise errors.object_not_found(".".join(key_b))
            # both write locks, key-ordered to dodge AB/BA deadlock
            locks = sorted((key_a, key_b))
            l0 = self._table_locks.setdefault(locks[0], threading.Lock())
            l1 = self._table_locks.setdefault(locks[1], threading.Lock())
        with l0, l1:
            with self._lock:
                self.tables[key_a], self.tables[key_b] = tb, ta
                (tb.database, tb.schema, tb.name) = key_a
                (ta.database, ta.schema, ta.name) = key_b
                self.mutation += 1
        return ta, tb

    def write_table(self, tm: TableMeta, df: DataFrame, mode: str = "overwrite") -> None:
        """``mode`` 'overwrite' replaces contents; 'append' unions with
        the current version (still writes a full new version — parquet
        append into the live dir would break snapshot isolation).

        Holds only this table's write lock for the duration of the
        Spark job, so concurrent writes to different tables proceed in
        parallel."""
        if tm.kind == "EXTERNAL" or not tm.location:
            raise errors.execution_error(
                f"cannot write to external table {tm.name}")
        with self._table_lock(tm):
            if mode == "append":
                cur = self.read_table(tm)
                target_fields = tm.spark_schema().fields
                if len(df.schema.fields) > len(target_fields):
                    # zip truncation would silently DISCARD the extra
                    # values; Snowflake raises 'too many values'
                    raise errors.execution_error(
                        f"INSERT has more expressions than target columns "
                        f"({len(df.schema.fields)} vs {len(target_fields)})")
                aligned = df.select(*[df[c.name].cast(f.dataType).alias(f.name)
                                      for c, f in zip(df.schema.fields, target_fields)])
                df = cur.unionByName(aligned, allowMissingColumns=False)
            self._write_version(tm, df)

    def revert_to_version(self, tm: TableMeta, version: int) -> None:
        """Move the live-version pointer back to ``version`` (statement
        rollback after a post-write constraint violation, e.g. strict
        MERGE's nondeterminism check). Versions are immutable dirs, so
        reverting is metadata-only; the abandoned newer dir is
        overwritten by the next write (version numbers reuse it)."""
        with self._table_lock(tm):
            tm.version = version
            self._mark_dirty(tm)
            self.register_view(tm)

    def append_files_fast(self, tm: TableMeta, df: DataFrame) -> None:
        """COPY-INTO fast path: append new parquet files into the
        *current* version directory without rewriting existing data.
        Safe because COPY only adds files and parquet readers list the
        dir at query planning time. At 100 TB scale this is the only
        viable ingest pattern (no O(table) rewrite per load).

        Exception: when the current version is pinned by an open
        transaction snapshot, appending in place would mutate the
        supposedly immutable snapshot (COPY inside BEGIN..ROLLBACK
        would survive the rollback). In that case the existing data
        files are hard-linked into a fresh version dir first — still
        O(files), not O(bytes) — and the append lands there."""
        if tm.kind == "EXTERNAL" or not tm.location:
            raise errors.execution_error(
                f"cannot write to external table {tm.name}")
        with self._table_lock(tm):
            target = tm.spark_schema()
            aligned = df.select(*[df[src.name].cast(f.dataType).alias(f.name)
                                  for src, f in zip(df.schema.fields, target.fields)])
            key = (tm.database, tm.schema, tm.name)
            with self._lock:
                pinned = tm.version in (
                    self._protected.get(key, set()) | self._stream_pins(key)
                    | self._read_pins(key))
            if pinned:
                src_dir = tm.version_path()
                new_version = tm.version + 1
                dst_dir = tm.version_path(new_version)
                # an abandoned dir from a rolled-back write may already
                # sit at this version number — reusing it as-is would
                # RESURRECT the rolled-back rows (the overwrite path
                # clears it via Spark's mode('overwrite'); this
                # hard-link path must clear it explicitly)
                if os.path.isdir(dst_dir):
                    shutil.rmtree(dst_dir)
                os.makedirs(dst_dir, exist_ok=True)
                for fname in os.listdir(src_dir):
                    s, d = os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                    if os.path.isfile(s):
                        try:
                            os.link(s, d)
                        except OSError:
                            shutil.copy2(s, d)
                tm.version = new_version
            aligned.write.mode("append").parquet(tm.version_path())
            tm.data_epoch += 1
            self._mark_dirty(tm)
            self.register_view(tm)
            self._gc_versions(tm)

    def register_view(self, tm: TableMeta) -> None:
        self.mutation += 1  # every data change routes through here
        self.read_table(tm).createOrReplaceTempView(tm.physical)

    def register_all_views(self) -> None:
        for tm in self.tables.values():
            self.register_view(tm)

    def _gc_versions(self, tm: TableMeta, keep: int | None = None) -> None:
        if keep is None:
            keep = max(1, tm.retention_versions)
        if not tm.location or not os.path.isdir(tm.location):
            return
        # never GC a protected version: an open transaction's snapshot
        # must survive arbitrarily many writes so its ROLLBACK can
        # restore it (see Engine transaction handling); likewise a
        # stream's offset version must stay readable for the diff
        key = (tm.database, tm.schema, tm.name)
        protected = (self._protected.get(key, set()) | self._stream_pins(key)
                     | self._read_pins(key))
        versions = sorted(
            (int(d[1:]) for d in os.listdir(tm.location) if re.fullmatch(r"v\d+", d)),
        )
        for v in versions[:-keep]:
            if v != tm.version and v not in protected:
                shutil.rmtree(os.path.join(tm.location, f"v{v}"), ignore_errors=True)

    # ---------------- time-travel read pins ----------------
    # an AT(...) read pins its resolved version for the duration of the
    # executing statement so concurrent writers' GC cannot delete the
    # version dir mid-read. Pins are counted (concurrent readers of the
    # same version) and carry a timestamp: a pin older than
    # _READ_PIN_TTL seconds is ignored by GC, so a leaked pin (a lazy
    # DataFrame handed out by query_df and never consumed) degrades to
    # the old behavior instead of pinning disk forever.

    _READ_PIN_TTL = 600.0

    def pin_version_for_read(self, key: tuple[str, str, str], v: int) -> None:
        with self._lock:
            self._tt_pins.setdefault(key, {}).setdefault(v, []).append(time.time())

    def unpin_version_for_read(self, key: tuple[str, str, str], v: int) -> None:
        with self._lock:
            stamps = self._tt_pins.get(key, {}).get(v)
            if stamps:
                stamps.pop()
                if not stamps:
                    self._tt_pins[key].pop(v, None)
                    if not self._tt_pins[key]:
                        self._tt_pins.pop(key, None)

    def _read_pins(self, key: tuple[str, str, str]) -> set[int]:
        now = time.time()
        return {v for v, stamps in self._tt_pins.get(key, {}).items()
                if any(now - t < self._READ_PIN_TTL for t in stamps)}

    def set_protected_versions(self, protected: dict[tuple[str, str, str], set[int]] | None) -> None:
        """Versions pinned by open transaction snapshots (union over all
        open transactions; pass None/{} to clear). Protected versions
        are exempt from GC and from in-place fast-append mutation."""
        with self._lock:
            self._protected = {k: set(v) for k, v in (protected or {}).items()}

    # ---------------- dirty-table capture (transactions) ----------------

    def begin_dirty_capture(self, sink: set[tuple[str, str, str]]) -> None:
        """Route this thread's subsequent table writes into ``sink`` so
        the owning transaction learns which tables it modified."""
        self._dirty_tl.sink = sink

    def end_dirty_capture(self) -> None:
        self._dirty_tl.sink = None

    def _mark_dirty(self, tm: TableMeta) -> None:
        sink = getattr(self._dirty_tl, "sink", None)
        if sink is not None:
            sink.add((tm.database, tm.schema, tm.name))

    # ---------------- version snapshots (transactions) ----------------

    def snapshot_versions(self) -> dict[tuple[str, str, str], int]:
        with self._lock:
            return {k: tm.version for k, tm in self.tables.items()}

    def snapshot_load_history(self) -> dict[tuple[str, str, str], dict]:
        """Per-table COPY load-history snapshot, taken at BEGIN so a
        ROLLBACK can revert the history entries alongside the data —
        otherwise a rolled-back COPY leaves its files marked loaded and
        the retry silently reports LOAD_SKIPPED."""
        with self._lock:
            return {k: dict(v) for k, v in self.copy_load_history.items()}

    def restore_load_history(self, snap: dict[tuple[str, str, str], dict],
                             keys: set[tuple[str, str, str]]) -> None:
        """Restore COPY load history for ``keys`` (the transaction's
        dirty tables) to its snapshotted state."""
        with self._lock:
            for key in keys:
                prior = snap.get(key)
                if prior is None:
                    self.copy_load_history.pop(key, None)
                else:
                    # replace contents in place: copy_into holds a live
                    # reference from setdefault()
                    live = self.copy_load_history.setdefault(key, {})
                    live.clear()
                    live.update(prior)

    def restore_versions(self, snap: dict[tuple[str, str, str], int]) -> None:
        """Best-effort rollback: restore version pointers for tables that
        still exist and whose snapshotted version dir is still on disk."""
        with self._lock:
            for key, v in snap.items():
                tm = self.tables.get(key)
                if tm is not None and tm.version != v and os.path.isdir(tm.version_path(v)):
                    tm.version = v
                    self.register_view(tm)

    # ---------------- streams (CDC, beyond reference) ----------------

    def create_stream(self, name: str, on_table: str, database: str | None = None,
                      schema: str | None = None, append_only: bool = False,
                      comment: str | None = None, if_not_exists: bool = False,
                      or_replace: bool = False) -> StreamMeta:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key in self.streams:
                if if_not_exists:
                    return self.streams[key]
                if not or_replace:
                    raise errors.object_exists(".".join(key))
            tm = self.get_table(on_table, database or key[0], schema or key[1])
            sm = StreamMeta(*key, src=(tm.database, tm.schema, tm.name),
                            src_uid=tm.uid, offset_version=tm.version,
                            append_only=append_only, comment=comment)
            self.streams[key] = sm
            return sm

    def get_stream(self, name: str, database: str | None = None,
                   schema: str | None = None) -> StreamMeta:
        key = self.resolve(name, database, schema)
        sm = self.streams.get(key)
        if sm is None:
            raise errors.object_not_found(".".join(key))
        return sm

    def create_task(self, name: str, sql_text: str, database: str | None = None,
                    schema: str | None = None, schedule: str | None = None,
                    warehouse: str | None = None, comment: str | None = None,
                    if_not_exists: bool = False, or_replace: bool = False) -> TaskMeta:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key in self.tasks:
                if if_not_exists:
                    return self.tasks[key]
                if not or_replace:
                    raise errors.object_exists(".".join(key))
            t = TaskMeta(*key, sql_text=sql_text, schedule=schedule,
                         warehouse=warehouse, comment=comment)
            self.tasks[key] = t
            return t

    def get_task(self, name: str, database: str | None = None,
                 schema: str | None = None) -> TaskMeta:
        key = self.resolve(name, database, schema)
        if key not in self.tasks:
            raise errors.object_not_found(".".join(key))
        return self.tasks[key]

    def drop_task(self, name: str, database: str | None = None,
                  schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.tasks:
                if if_exists:
                    return
                raise errors.object_not_found(".".join(key))
            del self.tasks[key]

    def drop_stream(self, name: str, database: str | None = None,
                    schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            sm = self.streams.pop(key, None)
            if sm is None and not if_exists:
                raise errors.object_not_found(".".join(key))
            if sm is not None:
                try:
                    self.spark.catalog.dropTempView(sm.physical)
                except Exception:
                    pass

    def advance_stream(self, sm: StreamMeta) -> None:
        """Move the stream offset to the source table's current version
        (called after a DML that consumed the stream commits)."""
        with self._lock:
            tm = self.tables.get(sm.src)
            if tm is not None and tm.uid == sm.src_uid:
                sm.offset_version = tm.version

    def _stream_pins(self, key: tuple[str, str, str]) -> set[int]:
        """Versions of table ``key`` pinned as stream offsets."""
        return {sm.offset_version for sm in self.streams.values()
                if sm.src == key}

    def stream_changes_df(self, sm: StreamMeta) -> DataFrame:
        """Row-level delta of the source table since the stream offset:
        multiset diff (exceptAll both ways — one hash shuffle per side,
        fully distributed) with Snowflake's METADATA$ columns. ISUPDATE
        is always false: without engine row tracking an UPDATE surfaces
        as a DELETE + INSERT pair, which is the documented semantics of
        this implementation (and exactly what consumers of the
        reference's change model must handle anyway)."""
        from pyspark.sql import functions as F
        tm = self.tables.get(sm.src)
        if tm is None or tm.uid != sm.src_uid:
            raise errors.execution_error(
                f"stream {sm.name} is stale: source table {'.'.join(sm.src)} "
                "was dropped or replaced")
        cur = self.read_table(tm)
        old = self.spark.read.schema(tm.spark_schema()).parquet(
            tm.version_path(sm.offset_version))
        data_cols = [c.name for c in tm.columns]
        def with_meta(df: DataFrame, action: str) -> DataFrame:
            row_id = F.md5(F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                          for c in data_cols]))
            return (df.withColumn("METADATA$ACTION", F.lit(action))
                      .withColumn("METADATA$ISUPDATE", F.lit(False))
                      .withColumn("METADATA$ROW_ID", row_id))
        inserts = with_meta(cur.exceptAll(old), "INSERT")
        if sm.append_only:
            return inserts
        return inserts.unionByName(with_meta(old.exceptAll(cur), "DELETE"))

    # ---------------- views (beyond reference) ----------------

    def create_view(self, name: str, sql_text: str, database: str | None = None,
                    schema: str | None = None, column_names: list[str] | None = None,
                    comment: str | None = None, if_not_exists: bool = False,
                    or_replace: bool = False) -> ViewMeta:
        with self._lock:
            db, sch, v = self.resolve(name, database, schema)
            if (db, sch) not in self.schemas:
                raise errors.object_not_found(f"{db}.{sch}")
            key = (db, sch, v)
            if key in self.tables:
                raise errors.object_exists(f"{db}.{sch}.{v} (a table with that name exists)")
            if key in self.views:
                if if_not_exists:
                    return self.views[key]
                if not or_replace:
                    raise errors.object_exists(f"{db}.{sch}.{v}")
            vm = ViewMeta(db, sch, v, sql_text=sql_text, column_names=column_names,
                          comment=comment)
            self.views[key] = vm
            self.mutation += 1
            return vm

    def get_view(self, name: str, database: str | None = None,
                 schema: str | None = None) -> ViewMeta:
        key = self.resolve(name, database, schema)
        vm = self.views.get(key)
        if vm is None:
            raise errors.object_not_found(".".join(key))
        return vm

    def drop_view(self, name: str, database: str | None = None,
                  schema: str | None = None, if_exists: bool = False) -> ViewMeta | None:
        with self._lock:
            key = self.resolve(name, database, schema)
            vm = self.views.pop(key, None)
            if vm is None and not if_exists:
                raise errors.object_not_found(".".join(key))
            if vm is not None:
                self.mutation += 1
            return vm

    # ---------------- SQL UDFs (beyond reference) ----------------

    def create_function(self, name: str, arg_names: list[str], arg_types: list[str],
                        returns: str, body: str, comment: str | None = None,
                        database: str | None = None, schema: str | None = None,
                        or_replace: bool = False,
                        table_columns: list[tuple[str, str]] | None = None,
                        language: str = "SQL",
                        handler: str | None = None) -> FunctionMeta:
        with self._lock:
            db, sch, fn = self.resolve(name, database, schema)
            key = (db, sch, fn)
            if key in self.functions and not or_replace:
                raise errors.object_exists(f"{db}.{sch}.{fn}")
            fm = FunctionMeta(db, sch, fn, [a.upper() for a in arg_names],
                              arg_types, returns, body, comment,
                              table_columns=table_columns,
                              language=language.upper(), handler=handler)
            self.functions[key] = fm
            self.mutation += 1
            return fm

    def drop_function(self, name: str, database: str | None = None,
                      schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if key not in self.functions:
                if if_exists:
                    return
                raise errors.object_not_found(".".join(key))
            del self.functions[key]
            self.mutation += 1

    # ---------------- sequences (beyond reference) ----------------

    # per-statement NEXTVAL block: monotonically_increasing_id is
    # structured as partitionId * 2^33 + rowInPartition, so a block
    # must cover the largest id a statement can emit — 2^48 covers
    # 32k partitions x 8.5e9 rows/partition, leaving 2^15 NEXTVAL
    # statements in the int64 value space at increment 1. Exhaustion
    # overflows loudly under ANSI mode rather than wrapping silently.
    SEQUENCE_BLOCK = 1 << 48

    def create_sequence(self, name: str, start: int = 1, increment: int = 1,
                        database: str | None = None, schema: str | None = None,
                        if_not_exists: bool = False, or_replace: bool = False) -> SequenceMeta:
        with self._lock:
            db, sch, sq = self.resolve(name, database, schema)
            key = (db, sch, sq)
            if key in self.sequences:
                if if_not_exists:
                    return self.sequences[key]
                if not or_replace:
                    raise errors.object_exists(f"{db}.{sch}.{sq}")
            sm = SequenceMeta(db, sch, sq, start=start, increment=increment)
            self.sequences[key] = sm
            return sm

    def get_sequence(self, name: str, database: str | None = None,
                     schema: str | None = None) -> SequenceMeta:
        key = self.resolve(name, database, schema)
        sm = self.sequences.get(key)
        if sm is None:
            raise errors.object_not_found(".".join(key))
        return sm

    def drop_sequence(self, name: str, database: str | None = None,
                      schema: str | None = None, if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if self.sequences.pop(key, None) is None and not if_exists:
                raise errors.object_not_found(".".join(key))

    def next_sequence_value(self, sm: SequenceMeta) -> int:
        """Draw ONE value (driver-side; used for inline VALUES rows,
        where Spark forbids nondeterministic expressions)."""
        with self._lock:
            val = sm.start + sm.next_base * sm.increment
            sm.next_base += 1
            return val

    def reserve_sequence_block(self, sm: SequenceMeta) -> int:
        """Reserve one statement's value block; returns the first value
        of the block (a single counter bump under the catalog lock —
        rows then draw values executor-side without coordination)."""
        with self._lock:
            base = sm.start + sm.next_base * sm.increment
            sm.next_base += self.SEQUENCE_BLOCK
            return base

    # ---------------- stages / file formats ----------------

    def create_stage(self, name: str, database: str | None = None, schema: str | None = None,
                     url: str | None = None, comment: str | None = None,
                     if_not_exists: bool = False, or_replace: bool = False,
                     stage_root: str | None = None) -> StageMeta:
        with self._lock:
            db, sch, stg = self.resolve(name, database, schema)
            if (db, sch, stg) in self.stages:
                if if_not_exists:
                    return self.stages[(db, sch, stg)]
                if not or_replace:
                    raise errors.object_exists(stg)
            directory = url or os.path.join(stage_root or os.path.join(self.base_dir, "_stages"), db, sch, stg)
            os.makedirs(directory, exist_ok=True)
            sm = StageMeta(db, sch, stg, url=url, comment=comment, directory=directory)
            self.stages[(db, sch, stg)] = sm
            return sm

    def get_stage(self, name: str, database: str | None = None, schema: str | None = None) -> StageMeta:
        key = self.resolve(name, database, schema)
        sm = self.stages.get(key)
        if sm is None:
            raise errors.object_not_found("@" + ".".join(key))
        return sm

    def drop_stage(self, name: str, database: str | None = None, schema: str | None = None,
                   if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            sm = self.stages.pop(key, None)
            if sm is None:
                if if_exists:
                    return
                raise errors.object_not_found("@" + ".".join(key))
            if sm.url is None and os.path.isdir(sm.directory):
                shutil.rmtree(sm.directory, ignore_errors=True)

    def create_file_format(self, name: str, format_type: str, options: dict,
                           database: str | None = None, schema: str | None = None,
                           or_replace: bool = False, if_not_exists: bool = False) -> FileFormatMeta:
        with self._lock:
            db, sch, ff = self.resolve(name, database, schema)
            if (db, sch, ff) in self.file_formats:
                if if_not_exists:
                    return self.file_formats[(db, sch, ff)]
                if not or_replace:
                    raise errors.object_exists(ff)
            fm = FileFormatMeta(db, sch, ff, format_type.upper(), options)
            self.file_formats[(db, sch, ff)] = fm
            return fm

    def get_file_format(self, name: str, database: str | None = None, schema: str | None = None) -> FileFormatMeta:
        key = self.resolve(name, database, schema)
        fm = self.file_formats.get(key)
        if fm is None:
            raise errors.object_not_found(".".join(key))
        return fm

    def drop_file_format(self, name: str, database: str | None = None, schema: str | None = None,
                         if_exists: bool = False) -> None:
        with self._lock:
            key = self.resolve(name, database, schema)
            if self.file_formats.pop(key, None) is None and not if_exists:
                raise errors.object_not_found(".".join(key))

    # ---------------- external registration (driver fixtures) ----------------

    def register_external_source(self, name: str, path: str, fmt: str = "PARQUET",
                                 options: dict | None = None,
                                 database: str | None = None,
                                 schema: str | None = None,
                                 or_replace: bool = False) -> TableMeta:
        """CREATE EXTERNAL TABLE: a read-only table over files at
        ``path`` (a resolved stage directory). The file list snapshots
        at CREATE (Snowflake external tables do the same — new files
        appear after ALTER EXTERNAL TABLE ... REFRESH, see
        ``refresh_external``). Reads are zero-copy Spark scans of the
        stage directory; writes are rejected by the EXTERNAL kind."""
        options = options or {}
        with self._lock:
            db, sch, tbl = self.resolve(name, database, schema)
            if (db, sch, tbl) in self.tables and not or_replace:
                raise errors.object_exists(".".join((db, sch, tbl)))
            df = self._read_external(path, fmt.upper(), options)
            cols = [ColumnDef(f.name, spark_to_snowflake_name(f.dataType), f.nullable)
                    for f in df.schema.fields]
            tm = TableMeta(db, sch, tbl, columns=cols, kind="EXTERNAL", location=None)
            df.createOrReplaceTempView(tm.physical)
            tm.read_df = df  # type: ignore[attr-defined]
            tm.external_path = path  # type: ignore[attr-defined]
            tm.external_format = fmt.upper()  # type: ignore[attr-defined]
            tm.external_options = dict(options)  # type: ignore[attr-defined]
            self.tables[(db, sch, tbl)] = tm
            self.mutation += 1
            return tm

    def refresh_external(self, tm: TableMeta) -> None:
        """ALTER EXTERNAL TABLE ... REFRESH: re-snapshot the file list
        (and schema) from the external location."""
        with self._lock:
            if tm.kind != "EXTERNAL" or not getattr(tm, "external_path", None):
                raise errors.invalid_parameter(f"{tm.name} is not an external table")
            df = self._read_external(tm.external_path, tm.external_format,
                                     tm.external_options)
            tm.columns = [ColumnDef(f.name, spark_to_snowflake_name(f.dataType), f.nullable)
                          for f in df.schema.fields]
            df.createOrReplaceTempView(tm.physical)
            tm.read_df = df  # type: ignore[attr-defined]
            # namespace-view caches key on (uid, version, data_epoch);
            # the refresh changes data without a new version
            tm.data_epoch += 1
            self.mutation += 1

    def _read_external(self, path: str, fmt: str, options: dict) -> DataFrame:
        if fmt == "PARQUET":
            return self.spark.read.parquet(path)
        if fmt == "ORC":
            return self.spark.read.orc(path)
        if fmt == "JSON":
            return self.spark.read.json(path)
        if fmt == "CSV":
            skip_header = int(options.get("SKIP_HEADER", "1") or 0)
            return (self.spark.read
                    .option("header", "true" if skip_header >= 1 else "false")
                    .option("sep", options.get("FIELD_DELIMITER", ","))
                    .option("inferSchema", "true").csv(path))
        if fmt == "XML":
            return (self.spark.read.format("xml")
                    .option("rowTag", options.get("ROW_TAG", "row")).load(path))
        raise errors.invalid_parameter(f"unsupported external table format: {fmt}")

    def register_external_parquet(self, name: str, path: str, database: str | None = None,
                                  schema: str | None = None) -> TableMeta:
        """Register a read-only external parquet file as a catalog table
        (used to expose the driver's /root/testdata fixtures as
        TEST_DB.PUBLIC_<NAME> per FIXTURES.md §2)."""
        with self._lock:
            db, sch, tbl = self.resolve(name, database, schema)
            df = self.spark.read.parquet(path)
            cols = [ColumnDef(f.name, spark_to_snowflake_name(f.dataType), f.nullable) for f in df.schema.fields]
            tm = TableMeta(db, sch, tbl, columns=cols, kind="EXTERNAL", location=None)
            df.createOrReplaceTempView(tm.physical)
            tm.read_df = df  # type: ignore[attr-defined]
            self.tables[(db, sch, tbl)] = tm
            return tm

    def describe_table(self, name: str, database: str | None = None, schema: str | None = None) -> list[dict]:
        tm = self.get_table(name, database, schema)
        return [
            {
                "name": c.name,
                "type": c.sf_type.upper(),
                "kind": "COLUMN",
                "null?": "Y" if c.nullable else "N",
                "default": c.default,
                "primary key": "Y" if c.primary_key else "N",
            }
            for c in tm.columns
        ]

    def export_meta(self) -> str:
        return json.dumps(
            {
                "databases": list(self.databases),
                "schemas": [list(k) for k in self.schemas],
                "tables": {"|".join(k): [c.__dict__ for c in tm.columns] for k, tm in self.tables.items()},
            },
            indent=2,
        )
