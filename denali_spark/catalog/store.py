"""Metadata store: the three catalog tables and the 20 queries, over
SQLite (default) or PostgreSQL (the scale-out backend).

DDL mirrors /root/reference/sqlgen/migrations/{sqlite,postgres}/0001_init.sql
(namespaces with denormalized parent_path, namespace_properties KV, objects
discriminated by type TABLE|VIEW). Query set mirrors SURVEY §2.E
(/root/reference/sqlgen/queries/{ns,tables,views}.sql) including the CAS
table commit (tables.sql:12-15). One deliberate fix: views get the same
CAS guard tables have (reference's UpdateView lacks it, views.sql:12-14).

Dialect story (reference parity: logic/state.go:219-227 whitelists
sqlite|postgres): all queries are written once with `?` placeholders; the
Postgres backend rewrites them to `$n` and binds over the wire protocol
(denali_spark.catalog.pgwire — the environment has Postgres server
binaries but no Python driver). Postgres is the horizontal-scaling story:
N stateless catalog servers share one database and serialize commits
through the same CAS UPDATE; correctness under concurrency rests on that
row-level compare-and-swap in both dialects, exactly as in the reference
("Performant & Scalable", README).

Concurrency (single process): one connection guarded by an RLock. Catalog
operations are single-row point lookups/updates — the lock is never the
bottleneck.
"""

from __future__ import annotations

import sqlite3
import threading
from contextlib import contextmanager
from dataclasses import dataclass

from denali_spark.catalog.errors import (
    AlreadyExists,
    NamespaceNotEmpty,
    NoSuchNamespace,
)

_SQLITE_DDL = """
CREATE TABLE IF NOT EXISTS namespaces (
    pk INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT NOT NULL,
    parent_pk INTEGER,
    -- Denormalized dotted path for O(1) arbitrary-depth lookups
    -- (reference comment at 0001_init.sql:7-9: avoided LTree for portability)
    parent_path TEXT NOT NULL,
    UNIQUE (name, parent_path),
    FOREIGN KEY (parent_pk) REFERENCES namespaces (pk) ON DELETE RESTRICT
);

CREATE TABLE IF NOT EXISTS namespace_properties (
    namespace_pk INTEGER NOT NULL,
    key TEXT NOT NULL,
    value TEXT,
    PRIMARY KEY (namespace_pk, key),
    FOREIGN KEY (namespace_pk) REFERENCES namespaces (pk) ON DELETE CASCADE
);

CREATE TABLE IF NOT EXISTS objects (
    pk INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT NOT NULL,
    type TEXT NOT NULL CHECK (type IN ('TABLE', 'VIEW')),
    namespace_pk INTEGER NOT NULL,
    last_sequence_number INTEGER NOT NULL DEFAULT 0,
    metadata_location TEXT NOT NULL,
    UNIQUE (name, namespace_pk),
    FOREIGN KEY (namespace_pk) REFERENCES namespaces (pk) ON DELETE RESTRICT
);
"""

# Mirrors sqlgen/migrations/postgres/0001_init.sql (identity PKs, enum
# object_type, the same constraint set); duplicate-object errors are
# tolerated so N servers can race to migrate the shared database.
_PG_DDL = [
    """CREATE TABLE namespaces (
        pk BIGINT NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        name VARCHAR NOT NULL,
        parent_pk BIGINT,
        parent_path VARCHAR NOT NULL,
        CONSTRAINT ns_uq_name_pk UNIQUE (name, parent_pk),
        CONSTRAINT ns_uq_name_path UNIQUE (name, parent_path),
        CONSTRAINT ns_fk_parent FOREIGN KEY (parent_pk)
        REFERENCES namespaces(pk) ON DELETE RESTRICT
    )""",
    """CREATE TABLE namespace_properties (
        key VARCHAR NOT NULL,
        value VARCHAR,
        namespace_pk BIGINT NOT NULL,
        PRIMARY KEY (namespace_pk, key),
        CONSTRAINT nsprop_fk_namespace FOREIGN KEY (namespace_pk)
        REFERENCES namespaces(pk) ON DELETE CASCADE
    )""",
    "CREATE TYPE object_type AS ENUM ('TABLE', 'VIEW')",
    """CREATE TABLE objects (
        pk BIGINT NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        name VARCHAR NOT NULL,
        type object_type NOT NULL,
        namespace_pk BIGINT NOT NULL,
        last_sequence_number BIGINT NOT NULL DEFAULT 0,
        metadata_location VARCHAR NOT NULL,
        CONSTRAINT obj_uq_name_pk UNIQUE (name, namespace_pk),
        CONSTRAINT obj_fk_namespace FOREIGN KEY (namespace_pk)
        REFERENCES namespaces(pk) ON DELETE RESTRICT
    )""",
]


class StoreIntegrityError(Exception):
    """Dialect-neutral unique/FK violation (callers map to 409/conflict)."""


@dataclass
class ObjectInfo:
    pk: int
    last_sequence_number: int
    metadata_location: str


class _BaseStore:
    """The 20 catalog queries, written once. Subclasses provide:
    _tx() transaction context, _q(sql, params) -> rows,
    _exec(sql, params) -> rowcount, _insert_pk(sql, params) -> new pk —
    raising StoreIntegrityError on constraint violations."""

    # --- namespaces (ns.sql:5-33) ----------------------------------------

    def namespace_pk(self, levels: list[str]) -> int:
        """GetNamespacePKHelper: resolve a multi-level namespace via the
        denormalized parent_path (logic/ns.go:16-26)."""
        if not levels:
            raise NoSuchNamespace("empty namespace")
        parent_path = ".".join(levels[:-1])
        rows = self._q(
            "SELECT pk FROM namespaces WHERE parent_path = ? AND name = ?",
            (parent_path, levels[-1]),
        )
        if not rows:
            raise NoSuchNamespace(f"namespace {'.'.join(levels)} not found")
        return rows[0][0]

    def namespace_exists(self, levels: list[str]) -> bool:
        try:
            self.namespace_pk(levels)
            return True
        except NoSuchNamespace:
            return False

    def child_namespace_names(self, parent_levels: list[str]) -> list[str]:
        parent_path = ".".join(parent_levels)
        if parent_levels and not self.namespace_exists(parent_levels):
            raise NoSuchNamespace(f"namespace {parent_path} not found")
        rows = self._q(
            "SELECT name FROM namespaces WHERE parent_path = ? ORDER BY name",
            (parent_path,),
        )
        return [r[0] for r in rows]

    def create_namespace(self, levels: list[str], properties: dict[str, str]) -> int:
        parent_path = ".".join(levels[:-1])
        parent_pk = self.namespace_pk(levels[:-1]) if levels[:-1] else None
        with self._tx():
            try:
                pk = self._insert_pk(
                    "INSERT INTO namespaces (name, parent_pk, parent_path)"
                    " VALUES (?, ?, ?)",
                    (levels[-1], parent_pk, parent_path),
                )
            except StoreIntegrityError:
                raise AlreadyExists(
                    f"namespace {'.'.join(levels)} already exists"
                ) from None
            for k, v in properties.items():
                self._exec(
                    "INSERT INTO namespace_properties (namespace_pk, key, value)"
                    " VALUES (?, ?, ?)",
                    (pk, k, v),
                )
        return pk

    def namespace_properties(self, pk: int) -> dict[str, str]:
        rows = self._q(
            "SELECT key, value FROM namespace_properties WHERE namespace_pk = ?",
            (pk,),
        )
        return dict(rows)

    def upsert_namespace_property(self, pk: int, key: str, value: str) -> None:
        """UpdateNamespaceProperty (ns.sql:21-25, INSERT ON CONFLICT)."""
        with self._tx():
            self._exec(
                "INSERT INTO namespace_properties (namespace_pk, key, value)"
                " VALUES (?, ?, ?)"
                " ON CONFLICT (namespace_pk, key) DO UPDATE SET value = excluded.value",
                (pk, key, value),
            )

    def delete_namespace_property(self, pk: int, key: str) -> bool:
        with self._tx():
            n = self._exec(
                "DELETE FROM namespace_properties WHERE namespace_pk = ? AND key = ?",
                (pk, key),
            )
        return n > 0

    def drop_namespace(self, levels: list[str]) -> None:
        pk = self.namespace_pk(levels)
        try:
            with self._tx():
                self._exec("DELETE FROM namespaces WHERE pk = ?", (pk,))
        except StoreIntegrityError:
            # FK RESTRICT from objects/child namespaces (0001_init.sql:16-17,49-50)
            raise NamespaceNotEmpty(
                f"namespace {'.'.join(levels)} is not empty"
            ) from None

    # --- objects: tables & views (tables.sql / views.sql) ----------------

    def list_objects(self, ns_pk: int, obj_type: str) -> list[str]:
        rows = self._q(
            "SELECT name FROM objects WHERE namespace_pk = ? AND type = ?"
            " ORDER BY name",
            (ns_pk, obj_type),
        )
        return [r[0] for r in rows]

    def get_object(self, ns_pk: int, name: str, obj_type: str) -> ObjectInfo | None:
        rows = self._q(
            "SELECT pk, last_sequence_number, metadata_location FROM objects"
            " WHERE namespace_pk = ? AND name = ? AND type = ?",
            (ns_pk, name, obj_type),
        )
        return ObjectInfo(*rows[0]) if rows else None

    def register_object(
        self, ns_pk: int, name: str, obj_type: str, metadata_location: str,
        sequence_number: int = 0,
    ) -> int:
        try:
            with self._tx():
                return self._insert_pk(
                    "INSERT INTO objects"
                    " (name, type, namespace_pk, last_sequence_number, metadata_location)"
                    " VALUES (?, ?, ?, ?, ?)",
                    (name, obj_type, ns_pk, sequence_number, metadata_location),
                )
        except StoreIntegrityError:
            raise AlreadyExists(f"{obj_type.lower()} {name} already exists") from None

    def cas_update_object(
        self, pk: int, new_metadata_location: str, expected_seq: int
    ) -> bool:
        """The optimistic-concurrency commit (tables.sql:12-15): bump the
        sequence number only if nobody committed in between. rowcount==0
        means a concurrent commit won → caller raises 409. This row-level
        CAS is what lets N stateless servers share one Postgres."""
        with self._tx():
            n = self._exec(
                "UPDATE objects SET metadata_location = ?,"
                " last_sequence_number = last_sequence_number + 1"
                " WHERE pk = ? AND last_sequence_number = ?",
                (new_metadata_location, pk, expected_seq),
            )
        return n > 0

    def cas_update_objects(self, changes: list[tuple[int, str, int]]) -> bool:
        """All-or-nothing multi-row CAS — the commit step of a multi-table
        transaction (/v1/transactions/commit, which the reference 501s:
        routes/tables.go:454-456). Every (pk, new_location, expected_seq)
        row must win its individual CAS inside ONE store transaction; any
        stale row rolls back every other update and returns False (caller
        raises 409). Atomicity rides on the database transaction, so it
        holds across N catalog servers sharing one Postgres."""

        class _CASFailed(Exception):
            pass

        try:
            with self._tx():
                for pk, new_location, expected_seq in changes:
                    n = self._exec(
                        "UPDATE objects SET metadata_location = ?,"
                        " last_sequence_number = last_sequence_number + 1"
                        " WHERE pk = ? AND last_sequence_number = ?",
                        (new_location, pk, expected_seq),
                    )
                    if n == 0:
                        raise _CASFailed()
        except _CASFailed:
            return False
        return True

    def rename_object(
        self, pk: int, new_name: str, new_ns_pk: int | None = None
    ) -> None:
        try:
            with self._tx():
                if new_ns_pk is None:
                    self._exec(
                        "UPDATE objects SET name = ? WHERE pk = ?", (new_name, pk)
                    )
                else:
                    self._exec(
                        "UPDATE objects SET name = ?, namespace_pk = ? WHERE pk = ?",
                        (new_name, new_ns_pk, pk),
                    )
        except StoreIntegrityError:
            raise AlreadyExists(f"object {new_name} already exists") from None

    def drop_object(self, pk: int) -> None:
        with self._tx():
            self._exec("DELETE FROM objects WHERE pk = ?", (pk,))

    def close(self) -> None:  # pragma: no cover - trivial
        pass


class Store(_BaseStore):
    """SQLite backend (stdlib sqlite3) — the zero-dependency default,
    mirroring the reference's sqlite dialect."""

    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute("PRAGMA foreign_keys = ON")
        if path != ":memory:":
            # WAL lets concurrent catalog-server processes share the file:
            # readers never block the (single) writer and vice versa — the
            # closest SQLite gets to the Postgres multi-server story.
            self._conn.execute("PRAGMA journal_mode = WAL")
            self._conn.execute("PRAGMA busy_timeout = 10000")
        self._lock = threading.RLock()
        with self._lock, self._conn:
            self._conn.executescript(_SQLITE_DDL)
            # Seed the default namespace (0001_init.sql:22).
            self._conn.execute(
                "INSERT OR IGNORE INTO namespaces (name, parent_pk, parent_path)"
                " VALUES ('default', NULL, '')"
            )

    @contextmanager
    def _tx(self):
        with self._lock, self._conn:
            yield

    def _run(self, sql: str, params: tuple):
        # Convert at the statement (not transaction) boundary so callers'
        # except StoreIntegrityError blocks see it synchronously.
        try:
            return self._conn.execute(sql, params)
        except sqlite3.IntegrityError as exc:
            raise StoreIntegrityError(str(exc)) from None

    def _q(self, sql: str, params: tuple = ()) -> list[tuple]:
        with self._lock:
            return self._run(sql, params).fetchall()

    def _exec(self, sql: str, params: tuple = ()) -> int:
        with self._lock:
            return self._run(sql, params).rowcount

    def _insert_pk(self, sql: str, params: tuple = ()) -> int:
        with self._lock:
            return self._run(sql, params).lastrowid

    def close(self) -> None:
        self._conn.close()


class PostgresStore(_BaseStore):
    """PostgreSQL backend over the pure-Python wire client. Accepts a
    postgresql:// URI (see pgwire.parse_postgres_uri) or explicit
    connection kwargs. Safe to point many processes at one database."""

    def __init__(self, uri: str | None = None, **kwargs):
        from denali_spark.catalog.pgwire import PGConnection, PGError, parse_postgres_uri

        self._PGError = PGError
        self._PGConnection = PGConnection
        if uri:
            kwargs = {**parse_postgres_uri(uri), **kwargs}
        self._connect_kwargs = kwargs
        self._conn = PGConnection(**kwargs)
        self._lock = threading.RLock()
        self._migrate()

    def _migrate(self) -> None:
        for ddl in _PG_DDL:
            try:
                self._conn.execute(ddl)
            except self._PGError as exc:
                if not exc.is_duplicate_ddl:
                    raise
        self._conn.execute(
            "INSERT INTO namespaces (name, parent_path) VALUES ('default', '')"
            " ON CONFLICT (name, parent_path) DO NOTHING"
        )

    @staticmethod
    def _translate(sql: str) -> str:
        """`?` placeholders → `$1..$n` (our SQL never contains a literal ?).
        sqlite's `excluded.` upsert alias is shared Postgres syntax."""
        out, n = [], 0
        for ch in sql:
            if ch == "?":
                n += 1
                out.append(f"${n}")
            else:
                out.append(ch)
        return "".join(out)

    @contextmanager
    def _tx(self):
        with self._lock:
            # BEGIN is idempotent (opens a tx, changes no state): safe to
            # reconnect-and-retry here if the link died idle.
            self._run("BEGIN", (), idempotent=True)
            self._in_tx = True
            try:
                yield
            except self._PGError as exc:
                self._rollback()
                if exc.is_integrity_violation:
                    raise StoreIntegrityError(str(exc)) from None
                raise
            except BaseException:
                self._rollback()
                raise
            else:
                self._conn.execute("COMMIT")
            finally:
                self._in_tx = False

    def _rollback(self) -> None:
        try:
            self._conn.execute("ROLLBACK")
        except (self._PGError, ConnectionError, OSError):
            # A dead link already rolled back server-side on disconnect;
            # don't mask the original error with the rollback's.
            pass

    def _run(
        self, sql: str, params: tuple, idempotent: bool = False, _retried: bool = False
    ):
        try:
            return self._conn.execute(self._translate(sql), params)
        except self._PGError as exc:
            if exc.is_integrity_violation:
                raise StoreIntegrityError(str(exc)) from None
            raise
        except (ConnectionError, OSError):
            # Server restart / idle-connection reset. Reconnect so the NEXT
            # statement works, but only auto-retry statements declared
            # idempotent (reads): a write whose connection died mid-flight
            # has an INDETERMINATE outcome — the server may have committed
            # before the link dropped, and re-running an INSERT would
            # double-insert / re-running a CAS UPDATE that raced another
            # writer could apply against the wrong precondition. Those must
            # surface to the caller, who reloads state and decides. Never
            # retry inside an open transaction either (a fresh connection
            # has no BEGIN; the statement would silently detach from its
            # transaction).
            in_tx = getattr(self, "_in_tx", False)
            if not in_tx:
                try:
                    self._conn = self._PGConnection(**self._connect_kwargs)
                except (ConnectionError, OSError):
                    pass  # server still down: surface the original error
            if _retried or in_tx or not idempotent:
                raise
            return self._run(sql, params, idempotent=True, _retried=True)

    def _q(self, sql: str, params: tuple = ()) -> list[tuple]:
        with self._lock:
            rows, _ = self._run(sql, params, idempotent=True)
        return rows

    def _exec(self, sql: str, params: tuple = ()) -> int:
        with self._lock:
            _, n = self._run(sql, params)
        return n

    def _insert_pk(self, sql: str, params: tuple = ()) -> int:
        with self._lock:
            rows, _ = self._run(sql + " RETURNING pk", params)
        return rows[0][0]

    def close(self) -> None:
        self._conn.close()


def make_store(db: str | None = None):
    """Backend factory: None/':memory:'/file path → SQLite;
    postgres[ql]:// URI → Postgres (reference dialect whitelist,
    logic/state.go:219-227)."""
    if db and (db.startswith("postgres://") or db.startswith("postgresql://")):
        return PostgresStore(uri=db)
    return Store(db or ":memory:")
