"""Round-9 SQL DDL lifecycle walkthrough: the reference client example's
day-1 session (examples/pyspark_example.py — CREATE NAMESPACE, create a
table, insert, query) driven entirely through ``io.sql()``, then the rest
of an object's life: ALTER, SHOW/DESCRIBE introspection, a SHOW CREATE
TABLE round-trip, views, INSERT OVERWRITE, TRUNCATE, and DROP.
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.engine.session import get_spark
from denali_spark.sources import SparkCatalogIO

spark = get_spark("sql-ddl-lifecycle")
spark.sparkContext.setLogLevel("ERROR")
server = CatalogServer(
    make_state(tempfile.mkdtemp(prefix="denali-example-wh-"))
).start()
io = SparkCatalogIO(spark, server.uri)

# --- the reference example's first statements, as SQL ---------------------
io.sql("CREATE NAMESPACE westeros")
io.sql(
    """
    CREATE TABLE westeros.my_table (
      id bigint NOT NULL COMMENT 'pk',
      name string,
      what_they_know double DEFAULT 0.0
    ) USING iceberg TBLPROPERTIES ('owner' = 'ned')
    """
)
io.sql("INSERT INTO westeros.my_table SELECT 1, 'jon_snow', 0.0")
print(io.sql("SELECT * FROM westeros.my_table").toPandas())

# --- evolve + introspect ---------------------------------------------------
io.sql("ALTER TABLE westeros.my_table ADD COLUMNS (house string, since date)")
io.sql("ALTER TABLE westeros.my_table ALTER COLUMN name COMMENT 'given name'")
print(io.sql("DESCRIBE westeros.my_table").toPandas())
cols = [r["col_name"] for r in io.sql("SHOW COLUMNS IN westeros.my_table").collect()]
print("columns:", cols)

# SHOW CREATE TABLE output re-parses through the CREATE TABLE path
stmt = io.sql("SHOW CREATE TABLE westeros.my_table").collect()[0]["createtab_stmt"]
print(stmt)
io.sql(stmt.replace("westeros.my_table", "westeros.my_table_copy", 1))
print("round-trip columns:", [
    r["col_name"]
    for r in io.sql("SHOW COLUMNS IN westeros.my_table_copy").collect()
])

# --- views -----------------------------------------------------------------
io.sql("CREATE VIEW westeros.who AS SELECT id, name FROM westeros.my_table")
io.sql(
    "CREATE OR REPLACE VIEW westeros.who AS "
    "SELECT id, name, what_they_know FROM westeros.my_table"
)
print(io.sql("SELECT * FROM westeros.who").toPandas())

# --- data replacement ------------------------------------------------------
io.sql("INSERT OVERWRITE westeros.my_table_copy SELECT 2, 'arya', 1.0, 'stark', DATE'0299-01-01'")
print("after overwrite:", io.sql(
    "SELECT COUNT(*) AS n FROM westeros.my_table_copy").collect()[0]["n"])
io.sql("TRUNCATE TABLE westeros.my_table_copy")
print("after truncate:", io.sql(
    "SELECT COUNT(*) AS n FROM westeros.my_table_copy").collect()[0]["n"])

# --- teardown --------------------------------------------------------------
io.sql("DROP VIEW westeros.who")
io.sql("DROP TABLE westeros.my_table_copy PURGE")
io.sql("DROP TABLE westeros.my_table PURGE")
io.sql("DROP NAMESPACE westeros")
print("namespaces left:", io.sql("SHOW NAMESPACES").count())
server.stop()
