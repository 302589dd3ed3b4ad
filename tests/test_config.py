"""TOML config discovery + precedence tests (reference parity:
logic/state.go:119-231, template.config.toml)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from denali_spark.catalog.config import (
    config_search_paths,
    load_config_file,
    resolve_config,
)

TOML = """
[api]
port = 18231

[warehouse]
path = "{wh}"

[database]
url = "{db}"
dialect = "sqlite"
"""


def test_explicit_path_wins(tmp_path, monkeypatch):
    monkeypatch.delenv("DENALI_PORT", raising=False)
    monkeypatch.delenv("DENALI_WAREHOUSE", raising=False)
    monkeypatch.delenv("DENALI_DB", raising=False)
    p = tmp_path / "my.toml"
    p.write_text(TOML.format(wh=str(tmp_path / "wh"), db=str(tmp_path / "c.db")))
    cfg = resolve_config(str(p))
    assert cfg["port"] == 18231
    assert cfg["warehouse"] == str(tmp_path / "wh")
    assert cfg["db"] == str(tmp_path / "c.db")
    assert cfg["source_file"] == str(p)


def test_env_overrides_file(tmp_path, monkeypatch):
    p = tmp_path / "my.toml"
    p.write_text(TOML.format(wh="/from/file", db="/from/file.db"))
    monkeypatch.setenv("DENALI_PORT", "9999")
    monkeypatch.setenv("DENALI_WAREHOUSE", "/from/env")
    monkeypatch.setenv("DENALI_DB", "postgresql://u@h:5/d")
    cfg = resolve_config(str(p))
    assert cfg == {
        "port": 9999, "warehouse": "/from/env",
        "db": "postgresql://u@h:5/d", "credential": None,
        "source_file": str(p),
    }


def test_search_path_order(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "xdgh"))
    monkeypatch.setenv("XDG_CONFIG_DIRS", f"{tmp_path}/d1:{tmp_path}/d2")
    paths = config_search_paths("/explicit.toml")
    assert paths[0] == "/explicit.toml"
    assert paths[1] == "config.toml"  # cwd
    assert paths[2] == str(tmp_path / "xdgh" / "iceberg-server" / "config.toml")
    assert paths[3] == str(tmp_path / "d1" / "iceberg-server" / "config.toml")
    assert paths[4] == str(tmp_path / "d2" / "iceberg-server" / "config.toml")


def test_xdg_discovery(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)  # keep cwd free of a config.toml
    d = tmp_path / "iceberg-server"
    d.mkdir()
    (d / "config.toml").write_text(TOML.format(wh="/xdg/wh", db="x.db"))
    cfg, path = load_config_file()
    assert path == str(d / "config.toml")
    assert cfg["warehouse"]["path"] == "/xdg/wh"


def test_postgres_dialect_builds_uri(tmp_path):
    p = tmp_path / "pg.toml"
    p.write_text(
        '[database]\nurl = "db-host:5432/denali"\ndialect = "postgres"\n'
    )
    cfg, _ = load_config_file(str(p))
    from denali_spark.catalog.config import _db_from_sections

    assert _db_from_sections(cfg) == "postgresql://db-host:5432/denali"
    # full URIs pass through untouched
    p.write_text('[database]\nurl = "postgresql://u@h/d"\ndialect = "pgx"\n')
    cfg, _ = load_config_file(str(p))
    assert _db_from_sections(cfg) == "postgresql://u@h/d"


def test_bad_dialect_and_bad_toml(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text('[database]\nurl = "x"\ndialect = "oracle"\n')
    cfg, _ = load_config_file(str(p))
    from denali_spark.catalog.config import _db_from_sections

    with pytest.raises(ValueError, match="dialect"):
        _db_from_sections(cfg)
    p.write_text("not [valid toml")
    with pytest.raises(ValueError, match="invalid TOML"):
        load_config_file(str(p))


def test_cli_starts_with_config_file(tmp_path):
    """End-to-end: the CLI boots from a TOML file alone (no flags), prints
    the config source and the bound port from the file's settings."""
    wh = tmp_path / "wh"
    p = tmp_path / "config.toml"
    p.write_text(TOML.format(wh=str(wh), db=str(tmp_path / "c.db")).replace("18231", "0"))
    proc = subprocess.Popen(
        [sys.executable, "-m", "denali_spark.catalog", "start",
         "--config", str(p)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
    )
    try:
        lines = [proc.stdout.readline() for _ in range(2)]
        assert f"loaded config from {p}" in lines[0]
        assert "catalog listening on http://" in lines[1]
        assert str(wh) in lines[1]
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_credential_from_env_and_file(tmp_path, monkeypatch):
    from denali_spark.catalog.config import resolve_config

    p = tmp_path / "c.toml"
    p.write_text('[api]\ncredential = "file:secret"\n')
    monkeypatch.delenv("DENALI_CREDENTIAL", raising=False)
    assert resolve_config(str(p))["credential"] == "file:secret"
    monkeypatch.setenv("DENALI_CREDENTIAL", "env:secret")
    assert resolve_config(str(p))["credential"] == "env:secret"
