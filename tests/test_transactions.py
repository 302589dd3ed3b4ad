"""Multi-table transaction tests (/v1/transactions/commit — the endpoint
the reference 501s; implemented beyond parity with all-or-nothing
semantics riding on one store transaction)."""

from __future__ import annotations

import pytest

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.catalog.client import CatalogClient, CatalogHTTPError

SCHEMA = {
    "type": "struct",
    "fields": [{"id": 1, "name": "x", "type": "int", "required": False}],
}


@pytest.fixture()
def client(tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    c = CatalogClient(server.uri)
    c.create_namespace(["tx"])
    for t in ("a", "b"):
        c.create_table(["tx"], t, SCHEMA)
    yield c
    server.stop()


def _change(name, updates, requirements=None):
    return {
        "identifier": {"namespace": ["tx"], "name": name},
        "requirements": requirements or [],
        "updates": updates,
    }


def _props(c, name):
    return c.load_table(["tx"], name)["metadata"].get("properties", {})


def test_two_tables_commit_atomically(client):
    client.commit_transaction([
        _change("a", [{"action": "set-properties", "updates": {"k": "va"}}]),
        _change("b", [{"action": "set-properties", "updates": {"k": "vb"}}]),
    ])
    assert _props(client, "a")["k"] == "va"
    assert _props(client, "b")["k"] == "vb"


def test_requirement_failure_rolls_back_all_tables(client):
    """Table b's requirement fails → table a's update must NOT land even
    though a's change was valid on its own."""
    with pytest.raises(CatalogHTTPError) as exc:
        client.commit_transaction([
            _change("a", [{"action": "set-properties", "updates": {"k": "va"}}]),
            _change(
                "b",
                [{"action": "set-properties", "updates": {"k": "vb"}}],
                requirements=[
                    {"type": "assert-ref-snapshot-id", "ref": "main",
                     "snapshot-id": 12345}  # stale: table is empty
                ],
            ),
        ])
    assert exc.value.status == 409
    assert "k" not in _props(client, "a")
    assert "k" not in _props(client, "b")


def test_late_requirement_failure_rolls_back_earlier_table(client):
    """The failing table is the LAST one staged — table a's metadata file
    was already written when b 409s, so this proves rollback, not just
    early exit."""
    with pytest.raises(CatalogHTTPError) as exc:
        client.commit_transaction([
            _change("a", [{"action": "set-properties", "updates": {"k": "x"}}]),
            _change("b", [], requirements=[
                {"type": "assert-create"}  # b exists → 409
            ]),
        ])
    assert exc.value.status == 409
    assert "k" not in _props(client, "a")


def test_same_table_twice_conflicts(client):
    with pytest.raises(CatalogHTTPError) as exc:
        client.commit_transaction([
            _change("a", [{"action": "set-properties", "updates": {"k": "1"}}]),
            _change("a", [{"action": "set-properties", "updates": {"k": "2"}}]),
        ])
    assert exc.value.status == 409
    assert "k" not in _props(client, "a")


def test_empty_transaction_rejected(client):
    with pytest.raises(CatalogHTTPError) as exc:
        client.commit_transaction([])
    assert exc.value.status == 400


def test_transaction_with_per_table_requirements(client):
    """The WAP-style publish shape: one atomic transaction marks both
    tables, each guarded by its own assert-table-uuid requirement."""
    mds = [(t, client.load_table(["tx"], t)["metadata"]) for t in ("a", "b")]
    client.commit_transaction([
        _change(t, [{"action": "set-properties", "updates": {"published": "yes"}}],
                requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}])
        for t, md in mds
    ])
    for t, _ in mds:
        assert _props(client, t)["published"] == "yes"
