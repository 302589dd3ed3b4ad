"""Commit requirement predicates (optimistic-concurrency assertions).

Counterpart of /root/reference/logic/reqs.go:16-171 — with the crucial fix
that they are actually EVALUATED before applying updates: the reference
parses them in updateTable but never calls Check (routes/tables.go:246-253;
SURVEY §7.5). A failed requirement aborts the commit with 409.
"""

from __future__ import annotations

from denali_spark.catalog.errors import BadRequest, CommitConflict


def _req_assert_create(md: dict | None, r: dict) -> None:
    # reqs.go:21-29 — table must not exist. Reaching requirement evaluation
    # means the table row exists, so this always conflicts here.
    if md is not None:
        raise CommitConflict("assert-create failed: table already exists")


def _req_table_uuid(md: dict, r: dict) -> None:
    if md.get("table-uuid") != r.get("uuid"):
        raise CommitConflict(
            f"assert-table-uuid failed: expected {r.get('uuid')},"
            f" found {md.get('table-uuid')}"
        )


def _req_ref_snapshot_id(md: dict, r: dict) -> None:
    ref = md.get("refs", {}).get(r.get("ref"))
    expected = r.get("snapshot-id")
    actual = ref["snapshot-id"] if ref else None
    if actual != expected:
        raise CommitConflict(
            f"assert-ref-snapshot-id failed for ref {r.get('ref')!r}:"
            f" expected {expected}, found {actual}"
        )


def _req_last_assigned_field_id(md: dict, r: dict) -> None:
    if md.get("last-column-id") != r.get("last-assigned-field-id"):
        raise CommitConflict("assert-last-assigned-field-id failed")


def _req_current_schema_id(md: dict, r: dict) -> None:
    if md.get("current-schema-id") != r.get("current-schema-id"):
        raise CommitConflict("assert-current-schema-id failed")


def _req_last_assigned_partition_id(md: dict, r: dict) -> None:
    if md.get("last-partition-id") != r.get("last-assigned-partition-id"):
        raise CommitConflict("assert-last-assigned-partition-id failed")


def _req_default_spec_id(md: dict, r: dict) -> None:
    if md.get("default-spec-id") != r.get("default-spec-id"):
        raise CommitConflict("assert-default-spec-id failed")


def _req_default_sort_order_id(md: dict, r: dict) -> None:
    if md.get("default-sort-order-id") != r.get("default-sort-order-id"):
        raise CommitConflict("assert-default-sort-order-id failed")


TABLE_REQUIREMENTS = {
    "assert-create": _req_assert_create,
    "assert-table-uuid": _req_table_uuid,
    "assert-ref-snapshot-id": _req_ref_snapshot_id,
    "assert-last-assigned-field-id": _req_last_assigned_field_id,
    "assert-current-schema-id": _req_current_schema_id,
    "assert-last-assigned-partition-id": _req_last_assigned_partition_id,
    "assert-default-spec-id": _req_default_spec_id,
    "assert-default-sort-order-id": _req_default_sort_order_id,
}


def check_table_requirements(md: dict, requirements: list[dict]) -> None:
    for r in requirements:
        typ = r.get("type")
        check = TABLE_REQUIREMENTS.get(typ)
        if check is None:
            raise BadRequest(f"unknown requirement type {typ!r}")
        check(md, r)


def check_view_requirements(md: dict, requirements: list[dict]) -> None:
    """Views have a single requirement: assert-view-uuid
    (inlined in the reference at routes/views.go:150-167)."""
    for r in requirements:
        typ = r.get("type")
        if typ != "assert-view-uuid":
            raise BadRequest(f"unknown view requirement type {typ!r}")
        if md.get("view-uuid") != r.get("uuid"):
            raise CommitConflict(
                f"assert-view-uuid failed: expected {r.get('uuid')},"
                f" found {md.get('view-uuid')}"
            )
