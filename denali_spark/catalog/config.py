"""TOML config discovery + precedence, mirroring the reference
(/root/reference/logic/state.go:119-231, template.config.toml).

Schema (template.config.toml):

    [api]       port = 8080
    [warehouse] path = "/data/warehouse"
    [database]  url = "catalog.db"        # path or postgresql:// URI
                dialect = "sqlite"        # sqlite | postgres

Discovery order (state.go FindConfigPath, Linux arm of the switch):

    1. an explicit --config path,
    2. ./config.toml in the working directory,
    3. $XDG_CONFIG_HOME (default ~/.config) /iceberg-server/config.toml,
    4. each $XDG_CONFIG_DIRS entry (default /etc) /iceberg-server/config.toml.

Precedence (reference: TOML decoded first, then DENALI_* env overwrites,
then CLI flags in main.go): **CLI args > DENALI_* env > config file >
defaults** — resolve_config implements the last two layers; the CLI layer
stays in __main__ where the flags live.
"""

from __future__ import annotations

import os
import tomllib

FOLDER_NAME = "iceberg-server"  # reference logic/state.go:67
CONFIG_NAME = "config.toml"


def config_search_paths(explicit: str | None = None) -> list[str]:
    paths: list[str] = []
    if explicit:
        paths.append(explicit)
    paths.append(CONFIG_NAME)  # cwd, state.go:156-158
    xdg_home = os.environ.get("XDG_CONFIG_HOME") or os.path.join(
        os.path.expanduser("~"), ".config"
    )
    paths.append(os.path.join(xdg_home, FOLDER_NAME, CONFIG_NAME))
    xdg_dirs = os.environ.get("XDG_CONFIG_DIRS") or "/etc"
    for d in xdg_dirs.split(":"):
        if d:
            paths.append(os.path.join(d, FOLDER_NAME, CONFIG_NAME))
    return paths


def load_config_file(explicit: str | None = None) -> tuple[dict, str | None]:
    """First readable config file on the search path → (parsed dict, path);
    ({}, None) when none exists (every setting then comes from env/CLI/
    defaults — unlike the reference, which interactively creates a template
    file, a poor fit for a server process)."""
    for path in config_search_paths(explicit):
        try:
            with open(path, "rb") as f:
                return tomllib.load(f), path
        except FileNotFoundError:
            continue
        except tomllib.TOMLDecodeError as exc:
            raise ValueError(f"invalid TOML in config file {path!r}: {exc}") from None
    return {}, None


def _db_from_sections(cfg: dict) -> str | None:
    db = cfg.get("database") or {}
    url = db.get("url") or None
    dialect = (db.get("dialect") or db.get("type") or "").lower()
    if not url:
        return None
    if dialect in ("postgres", "pgx", "postgresql"):
        # Accept either a full URI or host[:port]/db shorthand.
        if not url.startswith(("postgres://", "postgresql://")):
            return f"postgresql://{url}"
        return url
    if dialect in ("", "sqlite", "sqlite3"):
        return url
    raise ValueError(
        f"unsupported database dialect {dialect!r} (allowed: postgres, sqlite)"
    )


def resolve_config(explicit_path: str | None = None) -> dict:
    """Effective {port, warehouse, db, credential, source_file} from env >
    file > defaults. CLI flags override on top of this in __main__."""
    cfg, path = load_config_file(explicit_path)
    api = cfg.get("api") or {}
    warehouse = (cfg.get("warehouse") or {}).get("path") or None
    port = api.get("port") or 0
    db = _db_from_sections(cfg)
    credential = api.get("credential") or None
    # DENALI_* env overwrites file values (state.go:194-198).
    if os.environ.get("DENALI_PORT"):
        port = int(os.environ["DENALI_PORT"])
    if os.environ.get("DENALI_WAREHOUSE"):
        warehouse = os.environ["DENALI_WAREHOUSE"]
    if os.environ.get("DENALI_DB"):
        db = os.environ["DENALI_DB"]
    if os.environ.get("DENALI_CREDENTIAL"):
        credential = os.environ["DENALI_CREDENTIAL"]
    return {
        "port": int(port),
        "warehouse": warehouse,
        "db": db or ":memory:",
        "credential": credential,
        "source_file": path,
    }
