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


def write_table_metadata(metadata: dict, sequence_number: int) -> str:
    """Write `<location>/metadata/v{seq}-{uuid}.metadata.json` (filename
    template logic/table.go:119). Old versions stay = free time travel."""
    location = metadata["location"]
    fname = f"v{sequence_number}-{uuid.uuid4()}.metadata.json"
    path = os.path.join(_fs_path(location), "metadata", fname)
    _atomic_write(path, json.dumps(metadata, indent=2).encode())
    return f"{location.rstrip('/')}/metadata/{fname}"


def read_table_metadata(metadata_location: str) -> dict:
    with open(_fs_path(metadata_location), "rb") as f:
        return json.loads(f.read())


def _fs_path(location: str) -> str:
    """scheme dispatch: only file:// and bare paths, like the reference's
    LoadFS (iceberg-overload/io/io.go:89-103 — s3 commented out)."""
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
    path = os.path.join(_fs_path(location), "metadata", fname)
    _atomic_write(path, gzip.compress(json.dumps(metadata, indent=2).encode()))
    return f"{location.rstrip('/')}/metadata/{fname}"


def read_view_metadata(metadata_location: str) -> dict:
    with open(_fs_path(metadata_location), "rb") as f:
        return json.loads(gzip.decompress(f.read()))
