"""SQLite metadata store: the three catalog tables and the 20 queries.

DDL mirrors /root/reference/sqlgen/migrations/sqlite/0001_init.sql:3-51
(namespaces with denormalized parent_path, namespace_properties KV,
objects discriminated by type TABLE|VIEW). Query set mirrors SURVEY §2.E
(/root/reference/sqlgen/queries/{ns,tables,views}.sql) including the CAS
table commit (tables.sql:12-15). One deliberate fix: views get the same
CAS guard tables have (reference's UpdateView lacks it, views.sql:12-14).

Concurrency: a single connection guarded by an RLock. Catalog operations
are single-row point lookups/updates — the lock is never the bottleneck;
correctness under concurrent commits rests on the CAS update exactly as in
the reference ("Performant & Scalable", README).
"""

from __future__ import annotations

import sqlite3
import threading
from dataclasses import dataclass

from denali_spark.catalog.errors import (
    AlreadyExists,
    NamespaceNotEmpty,
    NoSuchNamespace,
)

_DDL = """
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


@dataclass
class ObjectInfo:
    pk: int
    last_sequence_number: int
    metadata_location: str


class Store:
    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute("PRAGMA foreign_keys = ON")
        self._lock = threading.RLock()
        with self._lock, self._conn:
            self._conn.executescript(_DDL)
            # Seed the default namespace (0001_init.sql:22).
            self._conn.execute(
                "INSERT OR IGNORE INTO namespaces (name, parent_pk, parent_path)"
                " VALUES ('default', NULL, '')"
            )

    # --- namespaces (ns.sql:5-33) ----------------------------------------

    def namespace_pk(self, levels: list[str]) -> int:
        """GetNamespacePKHelper: resolve a multi-level namespace via the
        denormalized parent_path (logic/ns.go:16-26)."""
        if not levels:
            raise NoSuchNamespace("empty namespace")
        parent_path = ".".join(levels[:-1])
        with self._lock:
            row = self._conn.execute(
                "SELECT pk FROM namespaces WHERE parent_path = ? AND name = ?",
                (parent_path, levels[-1]),
            ).fetchone()
        if row is None:
            raise NoSuchNamespace(f"namespace {'.'.join(levels)} not found")
        return row[0]

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
        with self._lock:
            rows = self._conn.execute(
                "SELECT name FROM namespaces WHERE parent_path = ? ORDER BY name",
                (parent_path,),
            ).fetchall()
        return [r[0] for r in rows]

    def create_namespace(self, levels: list[str], properties: dict[str, str]) -> int:
        parent_path = ".".join(levels[:-1])
        parent_pk = self.namespace_pk(levels[:-1]) if levels[:-1] else None
        with self._lock, self._conn:
            try:
                cur = self._conn.execute(
                    "INSERT INTO namespaces (name, parent_pk, parent_path)"
                    " VALUES (?, ?, ?)",
                    (levels[-1], parent_pk, parent_path),
                )
            except sqlite3.IntegrityError:
                raise AlreadyExists(
                    f"namespace {'.'.join(levels)} already exists"
                ) from None
            pk = cur.lastrowid
            for k, v in properties.items():
                self._conn.execute(
                    "INSERT INTO namespace_properties (namespace_pk, key, value)"
                    " VALUES (?, ?, ?)",
                    (pk, k, v),
                )
        return pk

    def namespace_properties(self, pk: int) -> dict[str, str]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT key, value FROM namespace_properties WHERE namespace_pk = ?",
                (pk,),
            ).fetchall()
        return dict(rows)

    def upsert_namespace_property(self, pk: int, key: str, value: str) -> None:
        """UpdateNamespaceProperty (ns.sql:21-25, INSERT ON CONFLICT)."""
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT INTO namespace_properties (namespace_pk, key, value)"
                " VALUES (?, ?, ?)"
                " ON CONFLICT (namespace_pk, key) DO UPDATE SET value = excluded.value",
                (pk, key, value),
            )

    def delete_namespace_property(self, pk: int, key: str) -> bool:
        with self._lock, self._conn:
            cur = self._conn.execute(
                "DELETE FROM namespace_properties WHERE namespace_pk = ? AND key = ?",
                (pk, key),
            )
        return cur.rowcount > 0

    def drop_namespace(self, levels: list[str]) -> None:
        pk = self.namespace_pk(levels)
        with self._lock, self._conn:
            try:
                self._conn.execute("DELETE FROM namespaces WHERE pk = ?", (pk,))
            except sqlite3.IntegrityError:
                # FK RESTRICT from objects/child namespaces (0001_init.sql:16-17,49-50)
                raise NamespaceNotEmpty(
                    f"namespace {'.'.join(levels)} is not empty"
                ) from None

    # --- objects: tables & views (tables.sql / views.sql) ----------------

    def list_objects(self, ns_pk: int, obj_type: str) -> list[str]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT name FROM objects WHERE namespace_pk = ? AND type = ?"
                " ORDER BY name",
                (ns_pk, obj_type),
            ).fetchall()
        return [r[0] for r in rows]

    def get_object(self, ns_pk: int, name: str, obj_type: str) -> ObjectInfo | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT pk, last_sequence_number, metadata_location FROM objects"
                " WHERE namespace_pk = ? AND name = ? AND type = ?",
                (ns_pk, name, obj_type),
            ).fetchone()
        return ObjectInfo(*row) if row else None

    def register_object(
        self, ns_pk: int, name: str, obj_type: str, metadata_location: str,
        sequence_number: int = 0,
    ) -> int:
        with self._lock, self._conn:
            try:
                cur = self._conn.execute(
                    "INSERT INTO objects"
                    " (name, type, namespace_pk, last_sequence_number, metadata_location)"
                    " VALUES (?, ?, ?, ?, ?)",
                    (name, obj_type, ns_pk, sequence_number, metadata_location),
                )
            except sqlite3.IntegrityError:
                raise AlreadyExists(f"{obj_type.lower()} {name} already exists") from None
        return cur.lastrowid

    def cas_update_object(
        self, pk: int, new_metadata_location: str, expected_seq: int
    ) -> bool:
        """The optimistic-concurrency commit (tables.sql:12-15): bump the
        sequence number only if nobody committed in between. rowcount==0
        means a concurrent commit won → caller raises 409."""
        with self._lock, self._conn:
            cur = self._conn.execute(
                "UPDATE objects SET metadata_location = ?,"
                " last_sequence_number = last_sequence_number + 1"
                " WHERE pk = ? AND last_sequence_number = ?",
                (new_metadata_location, pk, expected_seq),
            )
        return cur.rowcount > 0

    def rename_object(
        self, pk: int, new_name: str, new_ns_pk: int | None = None
    ) -> None:
        with self._lock, self._conn:
            try:
                if new_ns_pk is None:
                    self._conn.execute(
                        "UPDATE objects SET name = ? WHERE pk = ?", (new_name, pk)
                    )
                else:
                    self._conn.execute(
                        "UPDATE objects SET name = ?, namespace_pk = ? WHERE pk = ?",
                        (new_name, new_ns_pk, pk),
                    )
            except sqlite3.IntegrityError:
                raise AlreadyExists(f"object {new_name} already exists") from None

    def drop_object(self, pk: int) -> None:
        with self._lock, self._conn:
            self._conn.execute("DELETE FROM objects WHERE pk = ?", (pk,))
