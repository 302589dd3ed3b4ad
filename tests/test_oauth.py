"""OAuth (/v1/oauth/tokens): RFC 6749 client_credentials exchange and
bearer enforcement — the endpoint the Iceberg REST spec defines and the
reference leaves unimplemented (SURVEY §2.A note; beyond-parity here)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.catalog.client import CatalogClient, CatalogHTTPError


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    state = make_state(
        str(tmp_path_factory.mktemp("wh")), credential="svc:s3cr3t"
    )
    srv = CatalogServer(state).start()
    yield srv
    srv.stop()


def _post_form(uri, data: dict):
    from urllib.parse import urlencode

    req = urllib.request.Request(
        f"{uri}/v1/oauth/tokens", data=urlencode(data).encode(),
        method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read() or b"{}")


def test_requests_without_token_are_401(server):
    with pytest.raises(CatalogHTTPError) as ei:
        CatalogClient(server.uri).list_namespaces()
    assert ei.value.status == 401
    # /status stays open for health probes
    assert CatalogClient(server.uri).status_ok()


def test_client_credentials_exchange_and_use(server):
    client = CatalogClient(server.uri)
    token = client.authenticate("svc", "s3cr3t")
    assert token and client.token == token
    client.create_namespace(["oauthed"])
    assert client.namespace_exists(["oauthed"])
    # a second client constructed with the raw token works too
    other = CatalogClient(server.uri, token=token)
    assert other.load_namespace(["oauthed"])["namespace"] == ["oauthed"]


def test_oauth_error_shapes(server):
    status, payload = _post_form(server.uri, {
        "grant_type": "password", "client_id": "svc", "client_secret": "x",
    })
    assert status == 400 and payload["error"] == "unsupported_grant_type"
    status, payload = _post_form(server.uri, {
        "grant_type": "client_credentials", "client_id": "svc",
        "client_secret": "wrong",
    })
    assert status == 401 and payload["error"] == "invalid_client"
    status, payload = _post_form(server.uri, {
        "grant_type": "client_credentials",
    })
    assert status == 400 and payload["error"] == "invalid_request"


def test_bad_token_rejected_and_open_catalog_has_no_auth(server, tmp_path):
    with pytest.raises(CatalogHTTPError) as ei:
        CatalogClient(server.uri, token="forged").list_namespaces()
    assert ei.value.status == 401
    # a catalog without a credential stays open (the default everywhere
    # else in the suite) and refuses the token grant with invalid_request
    open_srv = CatalogServer(make_state(str(tmp_path / "wh2"))).start()
    try:
        assert CatalogClient(open_srv.uri).list_namespaces()  # open, no 401
        status, payload = _post_form(open_srv.uri, {
            "grant_type": "client_credentials", "client_id": "a",
            "client_secret": "b",
        })
        assert status == 400 and payload["error"] == "invalid_request"
    finally:
        open_srv.stop()
