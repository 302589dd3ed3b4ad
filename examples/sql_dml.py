"""Round-7 SQL surface walkthrough: statement-level DML
(DELETE / UPDATE / MERGE routed copy-on-write or merge-on-read by table
properties), metadata-relation addressing (`ns.t.snapshots` and friends),
incremental ANALYZE, and an OAuth-protected catalog.

The reference's client flow (examples/pyspark_example.py) drives an
Iceberg-aware Spark through SQL; this is the same ergonomics without the
runtime jar — every statement below round-trips through the catalog's
REST commit protocol.
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.catalog.client import CatalogClient
from denali_spark.engine.session import get_spark
from denali_spark.sources import SparkCatalogIO, analyze_table, analyze_table_incremental

spark = get_spark("sql-dml")
spark.sparkContext.setLogLevel("ERROR")

# --- an OAuth-protected catalog ------------------------------------------
server = CatalogServer(
    make_state(tempfile.mkdtemp(prefix="denali-example-wh-"),
               credential="svc:s3cr3t")
).start()
client = CatalogClient(server.uri)
client.authenticate("svc", "s3cr3t")  # RFC 6749 client_credentials
io = SparkCatalogIO(spark, server.uri, token=client.token)
print(f"authenticated against {server.uri}")

# --- CTAS + trickle DML ---------------------------------------------------
io.sql(
    "CREATE TABLE shop.orders AS "
    "SELECT id AS order_id, id % 7 AS customer_id, id * 10 AS cents "
    "FROM range(1000)"
)
print("rows:", io.sql("SELECT COUNT(*) AS n FROM shop.orders").collect()[0]["n"])

# copy-on-write DELETE (the default): matching files are rewritten
out = io.sql("DELETE FROM shop.orders WHERE order_id BETWEEN 100 AND 199").collect()[0]
print("delete:", out["mode"], "->", io.sql(
    "SELECT COUNT(*) AS n FROM shop.orders").collect()[0]["n"], "rows left")

# switch the table to merge-on-read: deletes become deletion vectors
md = io.client.load_table(["shop"], "orders")["metadata"]
io.client.commit_table(
    ["shop"], "orders",
    requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
    updates=[{"action": "set-properties", "updates": {
        "write.delete.mode": "merge-on-read",
        "write.update.mode": "merge-on-read",
    }}],
)
io.sql("DELETE FROM shop.orders WHERE customer_id = 3")
io.sql("UPDATE shop.orders SET cents = cents + 5 WHERE order_id < 10")

# predicates OUTSIDE the prunable scan grammar (modulo, functions) fall
# back to an exact raw-SQL match — full-candidate read, same semantics
io.sql("UPDATE shop.orders SET cents = cents + 1 WHERE order_id % 100 = 7")

# ANSI correlation names: an unaliased table reference exposes its bare
# table name, so qualified column references resolve without an alias
print("raw-predicate rows:", io.sql(
    "SELECT COUNT(*) AS n FROM shop.orders "
    "WHERE orders.order_id % 100 = 7"
).collect()[0]["n"])

# MERGE: the upsert/CDC-apply shape
io.sql(
    "MERGE INTO shop.orders USING "
    "(SELECT 0 AS order_id, 0 AS customer_id, 999 AS cents "
    " UNION ALL SELECT 5000, 1, 1) s "
    "ON (order_id) WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT"
)
print("after merge:", io.sql(
    "SELECT COUNT(*) AS n, SUM(cents) AS total FROM shop.orders"
).collect()[0].asDict())

# --- metadata relations, addressable from SQL ----------------------------
print("\nsnapshot history:")
for r in io.sql(
    "SELECT snapshot_id, operation FROM shop.orders.snapshots ORDER BY committed_at"
).collect():
    print("  ", r["snapshot_id"], r["operation"])
print("delete files:", io.sql(
    "SELECT COUNT(*) AS n FROM shop.orders.delete_files").collect()[0]["n"])

# --- ANALYZE: full once, then incremental on appends ---------------------
analyze_table(io, ["shop"], "orders", columns=["customer_id"],
              bloom_columns=["customer_id"])
io.sql("INSERT INTO shop.orders SELECT 9000 + id, id % 7, 1 FROM range(50)")
res = analyze_table_incremental(io, ["shop"], "orders")
print("\nincremental analyze:", res["mode"], "over", res["new-files"],
      "new files; ndv(customer_id) =", res["ndv"]["customer_id"])

server.stop()
print("\ndone")
