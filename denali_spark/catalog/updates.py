"""Metadata update operators — the heart of the commit protocol.

Counterpart of /root/reference/logic/updates.go: tableUpdateMap (17 actions,
:470-488), viewUpdateMap (8 actions, :514-523), applied as pure in-memory
mutations of the metadata dict; persistence happens in the route (SURVEY
§3.2). Reference bugs NOT replicated (SURVEY §7.5):

- ``set-default-spec`` sets default-spec-id (reference wrote LastPartitionID,
  logic/updates.go:229-231);
- ``set-current-schema`` validates the id exists (TODO at :183);
- ``-1`` means "last added" for set-current-schema / set-default-spec /
  set-default-sort-order per the Iceberg spec.
"""

from __future__ import annotations

from denali_spark.catalog.errors import BadRequest
from denali_spark.catalog.metadata import MAIN_BRANCH, now_ms

# --- table ops (logic/updates.go:32-415) ---------------------------------


def _assign_uuid(md: dict, u: dict) -> None:
    # logic/updates.go:32-42 — unsupported by design (UUID fixed at create).
    raise BadRequest("assign-uuid is not supported")


def _upgrade_format_version(md: dict, u: dict) -> None:
    v = u.get("format-version")
    cur = md["format-version"]
    if v not in (1, 2):
        raise BadRequest(f"invalid format-version {v}")
    if v < cur:
        raise BadRequest("cannot downgrade format-version")
    md["format-version"] = v


def _add_schema(md: dict, u: dict) -> None:
    schema = u.get("schema")
    if not isinstance(schema, dict):
        raise BadRequest("add-schema requires a schema")
    ids = [s["schema-id"] for s in md["schemas"]]
    if schema.get("schema-id") is None or schema["schema-id"] in ids:
        schema = dict(schema)
        schema["schema-id"] = max(ids, default=-1) + 1
    md["schemas"] = md["schemas"] + [schema]
    last = u.get("last-column-id")
    if last is not None:
        md["last-column-id"] = max(md.get("last-column-id", 0), last)


def _set_location(md: dict, u: dict) -> None:
    # logic/updates.go:102-112 — unsupported by design.
    raise BadRequest("set-location is not supported")


def _set_properties(md: dict, u: dict) -> None:
    updates = u.get("updates") or {}
    md["properties"] = {**md.get("properties", {}), **updates}


def _remove_properties(md: dict, u: dict) -> None:
    removals = u.get("removals") or []
    props = dict(md.get("properties", {}))
    for key in removals:
        if key not in props:
            raise BadRequest(f"property {key!r} does not exist")
        del props[key]
    md["properties"] = props


def _set_current_schema(md: dict, u: dict) -> None:
    sid = u.get("schema-id")
    ids = [s["schema-id"] for s in md["schemas"]]
    if sid == -1:
        sid = md["schemas"][-1]["schema-id"]
    if sid not in ids:
        raise BadRequest(f"schema-id {sid} not found")
    md["current-schema-id"] = sid


def _add_spec(md: dict, u: dict) -> None:
    spec = u.get("spec")
    if not isinstance(spec, dict):
        raise BadRequest("add-spec requires a spec")
    ids = [s["spec-id"] for s in md["partition-specs"]]
    if spec.get("spec-id") is None or spec["spec-id"] in ids:
        spec = dict(spec)
        spec["spec-id"] = max(ids, default=-1) + 1
    md["partition-specs"] = md["partition-specs"] + [spec]
    md["last-partition-id"] = max(
        [md.get("last-partition-id", 999)]
        + [f.get("field-id", 0) for f in spec.get("fields", [])]
    )


def _set_default_spec(md: dict, u: dict) -> None:
    sid = u.get("spec-id")
    ids = [s["spec-id"] for s in md["partition-specs"]]
    if sid == -1:
        sid = md["partition-specs"][-1]["spec-id"]
    if sid not in ids:
        raise BadRequest(f"spec-id {sid} not found")
    md["default-spec-id"] = sid


def _add_sort_order(md: dict, u: dict) -> None:
    order = u.get("sort-order")
    if not isinstance(order, dict):
        raise BadRequest("add-sort-order requires a sort-order")
    ids = [s["order-id"] for s in md["sort-orders"]]
    if order.get("order-id") is None or order["order-id"] in ids:
        order = dict(order)
        order["order-id"] = max(ids, default=-1) + 1
    md["sort-orders"] = md["sort-orders"] + [order]


def _set_default_sort_order(md: dict, u: dict) -> None:
    oid = u.get("sort-order-id")
    ids = [s["order-id"] for s in md["sort-orders"]]
    if oid == -1:
        oid = md["sort-orders"][-1]["order-id"]
    if oid not in ids:
        raise BadRequest(f"sort-order-id {oid} not found")
    md["default-sort-order-id"] = oid


def _add_snapshot(md: dict, u: dict) -> None:
    snap = u.get("snapshot")
    if not isinstance(snap, dict) or "snapshot-id" not in snap:
        raise BadRequest("add-snapshot requires a snapshot")
    if any(s["snapshot-id"] == snap["snapshot-id"] for s in md["snapshots"]):
        raise BadRequest(f"snapshot {snap['snapshot-id']} already exists")
    md["snapshots"] = md["snapshots"] + [snap]
    md["last-sequence-number"] = max(
        md.get("last-sequence-number", 0), snap.get("sequence-number", 0)
    )
    # Iceberg V3 row lineage: a snapshot carrying first-row-id advances the
    # table's next-row-id high-water mark by the rows it assigned (the
    # writer stamps the count in the added-rows summary key).
    if "first-row-id" in snap:
        assigned = int(snap.get("summary", {}).get("added-rows", 0))
        md["next-row-id"] = max(
            int(md.get("next-row-id", 0)),
            int(snap["first-row-id"]) + assigned,
        )


def _set_snapshot_ref(md: dict, u: dict) -> None:
    """Upsert a named branch/tag ref; `main` also moves current-snapshot-id
    and appends to snapshot-log (logic/updates.go:297-352, minus the debug
    prints at :315,:321,:347-348)."""
    ref_name = u.get("ref-name")
    snap_id = u.get("snapshot-id")
    ref_type = u.get("type", "branch")
    if ref_name is None or snap_id is None:
        raise BadRequest("set-snapshot-ref requires ref-name and snapshot-id")
    if not any(s["snapshot-id"] == snap_id for s in md["snapshots"]):
        raise BadRequest(f"snapshot {snap_id} not found")
    ref = {"snapshot-id": snap_id, "type": ref_type}
    for opt in ("min-snapshots-to-keep", "max-snapshot-age-ms", "max-ref-age-ms"):
        if u.get(opt) is not None:
            ref[opt] = u[opt]
    md.setdefault("refs", {})[ref_name] = ref
    if ref_name == MAIN_BRANCH:
        md["current-snapshot-id"] = snap_id
        md["snapshot-log"] = md.get("snapshot-log", []) + [
            {"timestamp-ms": now_ms(), "snapshot-id": snap_id}
        ]


def _remove_snapshots(md: dict, u: dict) -> None:
    ids = set(u.get("snapshot-ids") or [])
    # Ref-protected expire: a snapshot referenced by a branch/tag in the
    # CURRENT metadata must never be dropped. This is evaluated under the
    # commit lock, so it also catches a ref created AFTER the expiring
    # client loaded the table — a race the client's assert-ref-snapshot-id
    # requirements cannot see (it can only pin refs it observed). Without
    # this, the client's post-commit manifest cleanup would turn that
    # metadata race into irreversible data-plane loss.
    from denali_spark.catalog.errors import CommitConflict

    still_referenced = {
        name: r["snapshot-id"]
        for name, r in md.get("refs", {}).items()
        if r["snapshot-id"] in ids
    }
    if still_referenced:
        raise CommitConflict(
            "remove-snapshots would drop snapshots currently referenced by "
            f"refs {still_referenced}: expire must exclude ref targets "
            "(reload and recompute)"
        )
    md["snapshots"] = [s for s in md["snapshots"] if s["snapshot-id"] not in ids]
    # Matching Iceberg's expire behavior: snapshot-log entries pointing at a
    # removed snapshot are dropped in the same commit, so TIMESTAMP AS OF
    # over the remaining log can never land on a missing snapshot.
    md["snapshot-log"] = [
        e for e in md.get("snapshot-log", []) if e["snapshot-id"] not in ids
    ]
    # ... and so are statistics entries keyed to removed snapshots (Iceberg
    # expires statistics files together with their snapshot).
    for key in ("statistics", "partition-statistics"):
        if key in md:
            md[key] = [s for s in md[key] if s["snapshot-id"] not in ids]


def _remove_snapshot_ref(md: dict, u: dict) -> None:
    ref_name = u.get("ref-name")
    md.get("refs", {}).pop(ref_name, None)


def _upsert_stats(md: dict, key: str, entry: dict) -> None:
    sid = entry["snapshot-id"]
    kept = [s for s in md.get(key, []) if s["snapshot-id"] != sid]
    md[key] = kept + [entry]


def _remove_stats(md: dict, key: str, u: dict) -> None:
    sid = u.get("snapshot-id")
    if sid is None:
        raise BadRequest("snapshot-id is required")
    md[key] = [s for s in md.get(key, []) if s["snapshot-id"] != sid]


def _set_statistics(md: dict, u: dict) -> None:
    """Upsert a Puffin statistics file for a snapshot (one per snapshot).
    The reference rejects this op (logic/updates.go:399-407); implemented
    spec-correctly here — table stats are what a CBO prunes and reorders
    joins with at scale."""
    stats = u.get("statistics")
    if not isinstance(stats, dict) or "snapshot-id" not in stats:
        raise BadRequest("set-statistics requires a statistics file object")
    _upsert_stats(md, "statistics", stats)


def _remove_statistics(md: dict, u: dict) -> None:
    _remove_stats(md, "statistics", u)


def _set_partition_statistics(md: dict, u: dict) -> None:
    # Spec-defined (openapi.yml:2098-2099) but absent from the reference's
    # dispatch map entirely — same upsert-by-snapshot shape as statistics.
    stats = u.get("partition-statistics")
    if not isinstance(stats, dict) or "snapshot-id" not in stats:
        raise BadRequest(
            "set-partition-statistics requires a partition-statistics object"
        )
    _upsert_stats(md, "partition-statistics", stats)


def _remove_partition_statistics(md: dict, u: dict) -> None:
    _remove_stats(md, "partition-statistics", u)


# --- view ops (logic/updates.go:419-453) ---------------------------------


def _add_view_version(md: dict, u: dict) -> None:
    version = u.get("view-version")
    if not isinstance(version, dict) or "version-id" not in version:
        raise BadRequest("add-view-version requires a view-version")
    if any(v["version-id"] == version["version-id"] for v in md["versions"]):
        raise BadRequest(f"view version {version['version-id']} already exists")
    md["versions"] = md["versions"] + [version]
    md["version-log"] = md.get("version-log", []) + [
        {"timestamp-ms": now_ms(), "version-id": version["version-id"]}
    ]


def _set_current_view_version(md: dict, u: dict) -> None:
    vid = u.get("view-version-id")
    if vid == -1:
        vid = md["versions"][-1]["version-id"]
    if not any(v["version-id"] == vid for v in md["versions"]):
        raise BadRequest(f"view version {vid} not found")
    md["current-version-id"] = vid


# Dispatch maps (logic/updates.go:470-488 and :514-523).
TABLE_UPDATE_OPS = {
    "assign-uuid": _assign_uuid,
    "upgrade-format-version": _upgrade_format_version,
    "add-schema": _add_schema,
    "set-location": _set_location,
    "set-properties": _set_properties,
    "remove-properties": _remove_properties,
    "set-current-schema": _set_current_schema,
    "add-spec": _add_spec,
    "set-default-spec": _set_default_spec,
    "add-sort-order": _add_sort_order,
    "set-default-sort-order": _set_default_sort_order,
    "add-snapshot": _add_snapshot,
    "set-snapshot-ref": _set_snapshot_ref,
    "remove-snapshots": _remove_snapshots,
    "remove-snapshot-ref": _remove_snapshot_ref,
    "set-statistics": _set_statistics,
    "remove-statistics": _remove_statistics,
    "set-partition-statistics": _set_partition_statistics,
    "remove-partition-statistics": _remove_partition_statistics,
}

VIEW_UPDATE_OPS = {
    "assign-uuid": _assign_uuid,
    "upgrade-format-version": _upgrade_format_version,
    "add-schema": _add_schema,
    "set-location": _set_location,
    "set-properties": _set_properties,
    "remove-properties": _remove_properties,
    "add-view-version": _add_view_version,
    "set-current-view-version": _set_current_view_version,
}


def apply_table_updates(md: dict, updates: list[dict]) -> dict:
    """Polymorphic-JSON dispatch (CreateTableUpdate, logic/updates.go:490-512)."""
    for u in updates:
        action = u.get("action")
        op = TABLE_UPDATE_OPS.get(action)
        if op is None:
            raise BadRequest(f"unknown table update action {action!r}")
        op(md, u)
    return md


def apply_view_updates(md: dict, updates: list[dict]) -> dict:
    for u in updates:
        action = u.get("action")
        op = VIEW_UPDATE_OPS.get(action)
        if op is None:
            raise BadRequest(f"unknown view update action {action!r}")
        op(md, u)
    return md
