"""The reference example flow (examples/pyspark_example.py there): create a
namespace, write a table, read it back, time-travel — against the local
catalog service with SparkCatalogIO as the data plane."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.engine.session import get_spark
from denali_spark.sources import SparkCatalogIO

import tempfile

spark = get_spark("catalog-quickstart")
spark.sparkContext.setLogLevel("ERROR")
wh = tempfile.mkdtemp(prefix="denali-example-wh-")
server = CatalogServer(make_state(wh)).start()
io = SparkCatalogIO(spark, server.uri)

df = spark.createDataFrame(
    [(1, "jon_snow", 0.0), (2, "tyrion", 9.5)],
    "id long, name string, what_they_know double",
)
io.write_table(df, ["westeros"], "my_table", mode="overwrite")
print("namespaces:", io.client.list_namespaces())
print("rows:", io.read_table(["westeros"], "my_table").collect())

snap1 = io.client.load_table(["westeros"], "my_table")["metadata"]["current-snapshot-id"]
io.write_table(
    spark.createDataFrame([(3, "arya", 7.0)], "id long, name string, what_they_know double"),
    ["westeros"], "my_table",
)
print("now:", io.read_table(["westeros"], "my_table").count(), "rows")
print("as of snapshot", snap1, ":", io.read_table(["westeros"], "my_table", snapshot_id=snap1).count(), "rows")

# The reference example's literal query shape
# (/root/reference/examples/pyspark_example.py:36) — SQL straight against
# catalog tables, plus writes and time travel in SQL:
print(io.sql("select * from westeros.my_table").toPandas())
io.sql(
    "CREATE TABLE westeros.informed AS "
    "SELECT * FROM westeros.my_table WHERE what_they_know > 1"
)
io.sql("INSERT INTO westeros.informed SELECT 4, 'bran', 10.0")
print("informed:", io.sql("SELECT COUNT(*) AS n FROM westeros.informed").collect()[0]["n"])
print("time travel:",
      io.sql(f"SELECT COUNT(*) AS n FROM westeros.my_table FOR VERSION AS OF {snap1}")
      .collect()[0]["n"], "rows at snapshot", snap1)
server.stop()
