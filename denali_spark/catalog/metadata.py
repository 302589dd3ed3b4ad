"""Iceberg table/view metadata construction and warehouse IO.

Counterpart of /root/reference/logic/table.go:59-139 (CreateTableMetadata +
WriteTableMetadata) and logic/view.go:120-145 + iceberg-overload/view
(gzip view metadata). Metadata JSON follows the Iceberg V2 table spec /
V1 view spec field names so any spec-compliant reader can parse it.

Fixes over the reference applied here:
- metadata files are written atomically (tmp + rename); the reference
  leaks unclosed handles and ignores write errors (logic/table.go:127-137).
- file writes happen before the DB transaction, and orphans are tolerated:
  the CAS row is the source of truth (SURVEY §7.4 risk 4).
"""

from __future__ import annotations

import gzip
import json
import os
import time
import uuid

from denali_spark.catalog.errors import BadRequest

# Iceberg convention: partition field ids start after 999 (logic/table.go:84-92).
INITIAL_PARTITION_ID = 999
MAIN_BRANCH = "main"


def now_ms() -> int:
    return int(time.time() * 1000)


def _normalize_schema(schema: dict | None) -> dict:
    if not schema:
        return {"type": "struct", "schema-id": 0, "fields": []}
    out = dict(schema)
    out.setdefault("type", "struct")
    out.setdefault("schema-id", 0)
    out.setdefault("fields", [])
    return out


def _max_field_id(schema: dict) -> int:
    def walk(typ) -> int:
        best = 0
        if isinstance(typ, dict):
            if typ.get("type") == "struct":
                for f in typ.get("fields", []):
                    best = max(best, f.get("id", 0), walk(f.get("type")))
            elif typ.get("type") == "list":
                best = max(best, typ.get("element-id", 0), walk(typ.get("element")))
            elif typ.get("type") == "map":
                best = max(
                    best,
                    typ.get("key-id", 0),
                    typ.get("value-id", 0),
                    walk(typ.get("key")),
                    walk(typ.get("value")),
                )
        return best

    return walk(schema)


def new_table_metadata(
    warehouse: str,
    schema: dict | None,
    partition_spec: dict | None = None,
    write_order: dict | None = None,
    properties: dict | None = None,
) -> dict:
    """Build a fresh MetadataV2 dict (logic/table.go:59-112 semantics):
    fresh UUID, location = <warehouse>/<uuid> (path rule logic/state.go:296-299),
    single schema, one partition spec, one sort order, explicitly-empty
    snapshot structures (logic/table.go:104-109 — serialize [] / {} not null).
    """
    table_uuid = str(uuid.uuid4())
    schema = _normalize_schema(schema)
    spec = partition_spec or {"spec-id": 0, "fields": []}
    spec.setdefault("spec-id", 0)
    order = write_order or {"order-id": 0, "fields": []}
    order.setdefault("order-id", 0)
    last_partition_id = max(
        [INITIAL_PARTITION_ID] + [f.get("field-id", 0) for f in spec.get("fields", [])]
    )
    return {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": f"{warehouse.rstrip('/')}/{table_uuid}",
        "last-sequence-number": 0,
        "last-updated-ms": now_ms(),
        "last-column-id": _max_field_id(schema),
        "current-schema-id": schema["schema-id"],
        "schemas": [schema],
        "default-spec-id": spec["spec-id"],
        "partition-specs": [spec],
        "last-partition-id": last_partition_id,
        "default-sort-order-id": order["order-id"],
        "sort-orders": [order],
        "properties": dict(properties or {}),
        "current-snapshot-id": None,
        "refs": {},
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# --- blob-store scheme dispatch ------------------------------------------
#
# Counterpart of the reference's object-store IO (iceberg-overload/io/
# blob.go:150-195 + io.go:89-103): its LoadFS dispatches on scheme but
# ships with s3 commented out, so blob.go is read-only dead code there.
# Here the dispatch is live and pluggable: file:// and bare paths use the
# local store; s3:// and gs:// resolve to handlers that raise a clear
# capability error unless the optional client library is importable (none
# are in this build environment) or a caller registers a real handler via
# `register_scheme` (how a deployment plugs in its own object store).


class _LocalBlobStore:
    def read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_atomic(self, path: str, data: bytes) -> None:
        _atomic_write(path, data)


class _CloudBlobStore:
    """Import-gated s3://../gs:// handler. The probe is at first USE, not
    import, so local-only deployments never pay for (or fail on) the
    optional dependency."""

    def __init__(self, scheme: str, modules: tuple[str, ...]):
        self.scheme = scheme
        self.modules = modules

    def _client_missing(self) -> str:
        import importlib.util

        def absent(mod: str) -> bool:
            try:
                # find_spec imports parent packages, so a missing parent
                # raises instead of returning None
                return importlib.util.find_spec(mod) is None
            except ModuleNotFoundError:
                return True

        missing = [m for m in self.modules if absent(m)]
        return (
            f"{self.scheme}:// metadata IO needs one of {self.modules} installed"
            if missing == list(self.modules)
            else ""
        )

    def read(self, path: str) -> bytes:
        raise NotImplementedError(
            self._client_missing()
            or f"{self.scheme}:// handler stub: register a real store via "
            "register_scheme() — the built-in stub only verifies dispatch"
        )

    def write_atomic(self, path: str, data: bytes) -> None:
        self.read(path)  # same capability error


_SCHEMES: dict[str, object] = {
    "file": _LocalBlobStore(),
    "s3": _CloudBlobStore("s3", ("boto3",)),
    "gs": _CloudBlobStore("gs", ("gcsfs", "google.cloud.storage")),
}


def register_scheme(scheme: str, store) -> None:
    """Plug in a blob store for `scheme` (needs .read(path)->bytes and
    .write_atomic(path, data)). Replaces any built-in handler."""
    _SCHEMES[scheme] = store


def split_location(location: str) -> tuple[str, str]:
    """(scheme, path-without-scheme); bare paths map to ('file', path)."""
    if "://" in location:
        scheme, _, rest = location.partition("://")
        return scheme, rest
    return "file", location


def _store_for(location: str):
    scheme, rest = split_location(location)
    store = _SCHEMES.get(scheme)
    if store is None:
        raise BadRequest(f"unsupported warehouse scheme in {location!r}")
    return store, rest


def read_blob(location: str) -> bytes:
    store, path = _store_for(location)
    return store.read(path)


def write_blob_atomic(location: str, data: bytes) -> None:
    store, path = _store_for(location)
    store.write_atomic(path, data)


def join_location(location: str, *parts: str) -> str:
    """Scheme-aware join: URL-style '/' for scheme'd locations, os.path for
    bare local paths (identical bytes to the old behavior on posix)."""
    if "://" in location:
        return "/".join([location.rstrip("/"), *parts])
    return os.path.join(location, *parts)


def write_table_metadata(metadata: dict, sequence_number: int) -> str:
    """Write `<location>/metadata/v{seq}-{uuid}.metadata.json` (filename
    template logic/table.go:119). Old versions stay = free time travel."""
    location = metadata["location"]
    fname = f"v{sequence_number}-{uuid.uuid4()}.metadata.json"
    write_blob_atomic(
        join_location(location, "metadata", fname),
        json.dumps(metadata, indent=2).encode(),
    )
    return f"{location.rstrip('/')}/metadata/{fname}"


def read_table_metadata(metadata_location: str) -> dict:
    return json.loads(read_blob(metadata_location))


def _fs_path(location: str) -> str:
    """LOCAL-plane path mapping (data/manifest files are always local in
    this build): file:// and bare paths only, like the reference's LoadFS
    (iceberg-overload/io/io.go:89-103 — s3 commented out). Metadata IO goes
    through the scheme-dispatched blob layer above instead."""
    if location.startswith("file://"):
        return location[len("file://") :]
    if "://" in location:
        raise BadRequest(f"unsupported warehouse scheme in {location!r}")
    return location


# --- view metadata (iceberg-overload/view/metadata.go:35-58) -------------


def new_view_metadata(
    warehouse: str,
    schema: dict | None,
    sql_representations: list[dict],
    default_namespace: list[str],
    properties: dict | None = None,
) -> dict:
    view_uuid = str(uuid.uuid4())
    schema = _normalize_schema(schema)
    version = {
        "version-id": 1,
        "timestamp-ms": now_ms(),
        "schema-id": schema["schema-id"],
        "summary": {"operation": "create"},
        "representations": sql_representations,
        "default-namespace": default_namespace,
    }
    return {
        "view-uuid": view_uuid,
        "format-version": 1,
        "location": f"{warehouse.rstrip('/')}/{view_uuid}",
        "schemas": [schema],
        "current-version-id": 1,
        "versions": [version],
        "version-log": [{"timestamp-ms": version["timestamp-ms"], "version-id": 1}],
        "properties": dict(properties or {}),
    }


def write_view_metadata(metadata: dict, sequence_number: int) -> str:
    """gzip JSON named %05d-{uuid}.gz.metadata.json (logic/view.go:120-145,
    gzip at :137-139)."""
    location = metadata["location"]
    fname = f"{sequence_number:05d}-{uuid.uuid4()}.gz.metadata.json"
    write_blob_atomic(
        join_location(location, "metadata", fname),
        gzip.compress(json.dumps(metadata, indent=2).encode()),
    )
    return f"{location.rstrip('/')}/metadata/{fname}"


def read_view_metadata(metadata_location: str) -> dict:
    return json.loads(gzip.decompress(read_blob(metadata_location)))
