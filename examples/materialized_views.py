"""Materialized views, end to end through the SQL surface: CREATE with
COUNT/SUM/AVG/MIN/NDV and a WHERE predicate, incremental REFRESH after
appends AND deletes, SHOW CREATE round-trip, the drift-check procedure,
a maintained fact-join-dim view, and run_maintenance refreshing
dependents before snapshot expiry so no watermark is ever stranded."""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.engine.session import get_spark
from denali_spark.sources import SparkCatalogIO, run_maintenance

spark = get_spark("materialized-views")
spark.sparkContext.setLogLevel("ERROR")
server = CatalogServer(make_state(tempfile.mkdtemp(prefix="denali-example-wh-"))).start()
io = SparkCatalogIO(spark, server.uri)


def sales(lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 5).alias("k"),
        (F.col("id").cast("decimal(18,2)") / 4).cast("decimal(18,2)").alias("amount"),
    ).coalesce(1)


io.write_table(sales(0, 10_000), ["shop"], "sales", mode="append")

# one statement declares the maintained rollup; the parsed spec rides the
# target's table properties, so every later step needs only the name
io.sql("""
    CREATE MATERIALIZED VIEW shop.sales_mv AS
    SELECT k, COUNT(*) AS n_rows,
           SUM(CAST(amount AS DECIMAL(18,2))) AS amount_sum,
           AVG(CAST(amount AS DECIMAL(18,2))) AS avg_amount,
           MIN(amount) AS amount_min,
           APPROX_COUNT_DISTINCT(id) AS uniq_ids
    FROM shop.sales WHERE amount > 10 GROUP BY k
""")
io.sql("SELECT k, n_rows, avg_amount, amount_min FROM shop.sales_mv "
       "ORDER BY k").show()

# appends fold; a delete that may have removed a group minimum rescans
# JUST those groups (see the refresh report's rescanned_groups)
io.write_table(sales(10_000, 12_000), ["shop"], "sales", mode="append")
io.sql("DELETE FROM shop.sales WHERE id < 500")
io.sql("REFRESH MATERIALIZED VIEW shop.sales_mv").show()

# SHOW CREATE renders executable MV DDL (round-trips to an equal spec)
stmt = io.sql("SHOW CREATE TABLE shop.sales_mv").collect()[0].createtab_stmt
print(stmt, "\n")

# trust but verify: recompute-and-diff as a stored procedure
io.sql("CALL system.verify_materialized_view('shop.sales_mv')").show()

# join views maintain too: a dim relabel folds only the facts that
# reference the changed keys, never a fact rescan
regions = spark.createDataFrame(
    [(k, r) for k, r in enumerate(["east", "east", "west", "west", "north"])],
    "k long, region string",
)
io.write_table(regions.coalesce(1), ["shop"], "regions", mode="overwrite")
io.sql("""
    CREATE MATERIALIZED VIEW shop.sales_by_region AS
    SELECT region, COUNT(*) AS n_rows,
           SUM(CAST(amount AS DECIMAL(18,2))) AS amount_sum
    FROM shop.sales JOIN shop.regions ON sales.k = regions.k
    GROUP BY region
""")
io.sql("UPDATE shop.regions SET region = 'south' WHERE k = 4")
io.sql("REFRESH MATERIALIZED VIEW shop.sales_by_region").show()

# round 14: COUNT(expr) folds as an indicator sum, and MIN/MAX maintain
# THROUGH the join (net-removal groups rescan the pinned join only)
io.sql("""
    CREATE MATERIALIZED VIEW shop.region_ext AS
    SELECT region, COUNT(*) AS n_rows,
           COUNT(CASE WHEN amount > 100 THEN id END) AS n_big,
           MIN(amount) AS amount_min, MAX(id) AS id_max
    FROM shop.sales JOIN shop.regions ON sales.k = regions.k
    GROUP BY region
""")
io.sql("DELETE FROM shop.sales WHERE id < 1000")
io.sql("REFRESH MATERIALIZED VIEW shop.region_ext").show()

# discoverability: list every maintained view with freshness, and
# DESCRIBE marks an MV with its sources + watermark
io.sql("SHOW MATERIALIZED VIEWS").show(truncate=False)
io.sql("DESCRIBE shop.region_ext").show(truncate=False)

# round 14: MV-backed query rewrite — a coarser GROUP BY through io.sql
# is answered from the maintained summary when it provably subsumes the
# query (io.mv_rewrite: fresh-only | refresh | stale-ok | off)
io.sql("REFRESH MATERIALIZED VIEW shop.sales_mv")
df = io.sql("SELECT k, COUNT(*) AS n, MIN(amount) AS lo "
            "FROM shop.sales WHERE amount > 10 GROUP BY k")
df.show()
print("answered from:", io.last_mv_rewrite)
assert io.last_mv_rewrite is not None

# round 15: HAVING tails commute with the reduction — the portable raw
# aggregate spelling maps through the maintained columns (computed as
# hidden summary aggregates, even when not in the select list), and
# EXPLAIN heads the resolved plan with the rewrite verdict
df = io.sql("SELECT k, COUNT(*) AS n FROM shop.sales WHERE amount > 10 "
            "GROUP BY k HAVING SUM(CAST(amount AS DECIMAL(18,2))) > 100 "
            "ORDER BY n DESC LIMIT 3")
df.show()
assert io.last_mv_rewrite is not None
assert io.last_mv_rewrite["having_mapped_aggs"] == 1
print(io.sql("EXPLAIN SELECT k, COUNT(*) AS n FROM shop.sales "
             "WHERE amount > 10 GROUP BY k").collect()[0].plan
      .split("\n")[1][:120])

# round 15: with SEVERAL subsuming MVs the rewrite serves from the one
# with the FEWEST summary rows (snapshot total-records — metadata only):
# the finer (k, id) rollup below also subsumes GROUP BY k, but the
# 5-row shop.sales_mv summary wins over its ~11.5k rows
io.sql("""
    CREATE MATERIALIZED VIEW shop.sales_fine AS
    SELECT k, id, COUNT(*) AS n_rows, MIN(amount) AS amount_min
    FROM shop.sales WHERE amount > 10 GROUP BY k, id
""")
io.sql("SELECT k, COUNT(*) AS n FROM shop.sales WHERE amount > 10 GROUP BY k")
info = io.last_mv_rewrite
print("cheapest subsumer:", info["view"], "summary_rows:",
      info["summary_rows"], "of", info["candidates"], "candidates")
assert info["view"] == "shop.sales_mv" and info["candidates"] == 2
io.sql("DROP MATERIALIZED VIEW shop.sales_fine")

io.sql("DROP MATERIALIZED VIEW shop.region_ext")

# round 16: AVG rides the maintained hidden sum / non-null-count pair —
# bit-identical to the base plan (the quotient rounds at Spark's own
# Average scale), and the policy knobs have a SQL spelling now
io.sql("""
    CREATE MATERIALIZED VIEW shop.sales_avg AS
    SELECT k, COUNT(*) AS n_rows,
           AVG(CAST(amount AS DECIMAL(18,2))) AS avg_amount
    FROM shop.sales GROUP BY k
""")
df = io.sql("SELECT k, AVG(CAST(amount AS DECIMAL(18,2))) AS a "
            "FROM shop.sales GROUP BY k")
df.show(3)
assert io.last_mv_rewrite is not None

# round 16: 'topup' answers FRESH from a STALE view without a refresh
# commit — the changelog since the watermark folds into the read-time
# re-aggregation (the lambda-serving shape; insert-only windows serve
# MIN/MAX too). The view stays stale; no snapshot lands.
io.write_table(
    spark.range(30_000, 31_000).select(
        "id", (F.col("id") % 5).alias("k"),
        (F.col("id").cast("decimal(18,2)") / 100)
        .cast("decimal(18,2)").alias("amount"),
    ),
    ["shop"], "sales", mode="append",
)
io.sql("SET mv_rewrite = 'topup'")
df = io.sql("SELECT k, COUNT(*) AS n, "
            "AVG(CAST(amount AS DECIMAL(18,2))) AS a "
            "FROM shop.sales GROUP BY k")
df.show(3)
info = io.last_mv_rewrite
print("topup:", info["view"], "delta rows:", info["topup_delta_rows"],
      "fresh:", info["fresh"])
assert info["fresh"] and info["topup_delta_rows"] is not None
io.sql("SET mv_rewrite = 'fresh-only'")
io.sql("DROP MATERIALIZED VIEW shop.sales_avg")

# day-2 ops: maintenance refreshes dependent MVs BEFORE snapshot expiry,
# so the aggressive keep_last below can never strand a watermark
report = run_maintenance(io, ["shop"], "sales", keep_last=1)
print("maintenance:", report)
print("steady state:",
      io.sql("REFRESH MATERIALIZED VIEW shop.sales_mv").collect()[0].kind)

io.sql("DROP MATERIALIZED VIEW shop.sales_by_region")
io.sql("DROP MATERIALIZED VIEW shop.sales_mv")
server.stop()
spark.stop()
