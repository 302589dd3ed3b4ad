"""CLI: ``python -m denali_spark.catalog start [--port N] [--temp]
[--warehouse DIR] [--db FILE]``.

Counterpart of the reference CLI (/root/reference/main.go:88-150):
``--temp`` = in-memory SQLite + temp-dir warehouse (main.go:120-131), the
mode its tests run in. Config may also come from env vars DENALI_PORT /
DENALI_WAREHOUSE / DENALI_DB (logic/state.go:194-198 env-override pattern).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

from denali_spark.catalog.service import CatalogServer, make_state


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="denali-spark-catalog")
    sub = parser.add_subparsers(dest="cmd", required=True)
    start = sub.add_parser("start", help="start the catalog server")
    start.add_argument("--port", type=int,
                       default=int(os.environ.get("DENALI_PORT", "0")))
    start.add_argument("--warehouse", default=os.environ.get("DENALI_WAREHOUSE"))
    start.add_argument(
        "--db", default=os.environ.get("DENALI_DB", ":memory:"),
        help="SQLite path / ':memory:', or a postgresql:// URI for the "
             "shared multi-server backend",
    )
    start.add_argument(
        "--temp", action="store_true",
        help="ephemeral mode: in-memory DB + temp warehouse",
    )
    args = parser.parse_args(argv)

    warehouse = args.warehouse
    db = args.db
    if args.temp or not warehouse:
        warehouse = tempfile.mkdtemp(prefix="denali-warehouse-")
        db = ":memory:"
    server = CatalogServer(make_state(warehouse, db), port=args.port).start()
    print(f"catalog listening on {server.uri} (warehouse={warehouse})", flush=True)
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
