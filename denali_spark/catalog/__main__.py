"""CLI: ``python -m denali_spark.catalog start [--port N] [--temp]
[--warehouse DIR] [--db FILE] [--config FILE]``.

Counterpart of the reference CLI (/root/reference/main.go:88-150):
``--temp`` = in-memory SQLite + temp-dir warehouse (main.go:120-131), the
mode its tests run in. Config precedence mirrors the reference
(logic/state.go:119-231): CLI flags > DENALI_PORT / DENALI_WAREHOUSE /
DENALI_DB env vars > discovered TOML config file > defaults.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from denali_spark.catalog.config import resolve_config
from denali_spark.catalog.service import CatalogServer, make_state


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="denali-spark-catalog")
    sub = parser.add_subparsers(dest="cmd", required=True)
    start = sub.add_parser("start", help="start the catalog server")
    start.add_argument("--config", default=None,
                       help="explicit TOML config file path")
    start.add_argument("--port", type=int, default=None)
    start.add_argument("--warehouse", default=None)
    start.add_argument(
        "--db", default=None,
        help="SQLite path / ':memory:', or a postgresql:// URI for the "
             "shared multi-server backend",
    )
    start.add_argument(
        "--temp", action="store_true",
        help="ephemeral mode: in-memory DB + temp warehouse",
    )
    start.add_argument(
        "--credential", default=None, metavar="ID:SECRET",
        help="enable OAuth: clients must exchange this client credential "
             "at /v1/oauth/tokens for a bearer token",
    )
    args = parser.parse_args(argv)

    cfg = resolve_config(args.config)  # env > file > defaults
    port = args.port if args.port is not None else cfg["port"]
    warehouse = args.warehouse or cfg["warehouse"]
    db = args.db or cfg["db"]
    if args.temp or not warehouse:
        warehouse = tempfile.mkdtemp(prefix="denali-warehouse-")
        db = ":memory:"
    if cfg["source_file"]:
        print(f"loaded config from {cfg['source_file']}", flush=True)
    credential = args.credential or cfg.get("credential")
    server = CatalogServer(
        make_state(warehouse, db, credential=credential), port=port
    ).start()
    print(f"catalog listening on {server.uri} (warehouse={warehouse})", flush=True)
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
