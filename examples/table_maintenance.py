"""Table operations day-2 walkthrough: inspect a table through its metadata
tables, watch row-level changes with the changelog read, Z-order the layout
so stats prune on two dimensions, then expire history — the maintenance
loop a production Iceberg deployment runs on every table."""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.engine.session import get_spark
from denali_spark.sources import (
    SparkCatalogIO,
    equality_delete,
    expire_snapshots,
    metadata_table,
    read_changes,
    rewrite_clustered,
)

spark = get_spark("table-maintenance")
spark.sparkContext.setLogLevel("ERROR")
server = CatalogServer(make_state(tempfile.mkdtemp(prefix="denali-example-wh-"))).start()
io = SparkCatalogIO(spark, server.uri)
ns, name = ["ops"], "grid"

# a few appends in shuffled order → wide per-file stats, the layout Z-order fixes
for k in range(4):
    chunk = (
        spark.range(0, 4000)
        .select(
            "id",
            (F.col("id") / 64).cast("long").alias("a"),
            (F.col("id") % 64).alias("b"),
        )
        .where((F.col("id") * 2654435761 % 4) == k)
        .coalesce(1)
    )
    io.write_table(chunk, ns, name, mode="append")
first = metadata_table(io, ns, name, "snapshots").orderBy("committed_at").first()

# 1. inspect: every Iceberg metadata relation is a DataFrame
print("snapshots:")
metadata_table(io, ns, name, "snapshots").select(
    "snapshot_id", "operation", "parent_id"
).show(truncate=False)
print("files (count, rows):",
      metadata_table(io, ns, name, "files").count(),
      metadata_table(io, ns, name, "files").agg(F.sum("record_count")).first()[0])

# 2. CDC: what changed after the first commit?
equality_delete(io, ns, name, spark.createDataFrame([(7,), (8,)], "id long"), on=["id"])
print("changes since first commit, by type:")
read_changes(io, ns, name, from_snapshot_id=first.snapshot_id).groupBy(
    "_change_type"
).count().show()

# 3. layout: Z-order on (a, b) so point predicates on EITHER column prune files
rewrite_clustered(io, ns, name, sort_by=["a", "b"], strategy="zorder",
                  target_file_size_bytes=4 * 1024)
files = metadata_table(io, ns, name, "files")
print("after zorder:", files.count(), "files; per-file (a, b) bounds:")
files.select(
    F.col("lower_bounds.a").alias("a_min"), F.col("upper_bounds.a").alias("a_max"),
    F.col("lower_bounds.b").alias("b_min"), F.col("upper_bounds.b").alias("b_max"),
).show(16, truncate=False)

# 4. statistics: ANALYZE writes HLL ndv sketches + per-file bloom filters
# into one Puffin statistics file, registered on the current snapshot
from denali_spark.sources import analyze_table, table_statistics
from denali_spark.sources import expressions as E

res = analyze_table(io, ns, name, columns=["a", "b"], bloom_columns=["a"])
print("analyze:", res["row-count"], "rows; ndv:", res["ndv"])
print("read back from the sketch bytes:", table_statistics(io, ns, name)["columns"])
pointed = io.read_table(ns, name, where=E.eq("a", 3))
print("point lookup a=3 scans",
      len([f for f in pointed.inputFiles() if f.endswith('.parquet')]),
      "of", metadata_table(io, ns, name, "files").count(),
      "files (min/max + bloom pruning)")

# 5. server-side scan planning (REST PlanTableScan): the catalog walks
# the manifests and stat-prunes; the engine just consumes the plan
plan = io.client.plan_table_scan(ns, name, filter=E.eq("a", 3))
print("server plan:", len(plan["file-scan-tasks"]), "task(s) after pruning;",
      "residual echoed:", plan["file-scan-tasks"][0]["residual-filter"])
print("server-planned read rows:",
      io.read_table(ns, name, where=E.eq("a", 3), server_plan=True).count())

# 6. retention: per-ref policies (Iceberg semantics) drive the expiry —
# the audit branch keeps 3 snapshots of ancestry, the nightly tag ages
# out after 1h, and everything unprotected beyond keep_last expires
io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE BRANCH audit "
       "WITH SNAPSHOT RETENTION 3 SNAPSHOTS")
io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE TAG nightly RETAIN 1 HOURS")
refs = io.client.load_table(ns, name)["metadata"]["refs"]
print("retention on refs:", {r: {k: v for k, v in refs[r].items() if k != 'snapshot-id'}
                             for r in ("audit", "nightly")})
expire_snapshots(io, ns, name, keep_last=1)
print("after expire, snapshots left:",
      metadata_table(io, ns, name, "snapshots").count(),
      "(audit ancestry retained)")
server.stop()
