"""The catalog as a native Spark data source: read, write, and stream
catalog tables with spark.read/write/readStream/writeStream.format("denali")
— the PySpark-4 Python Data Source registered by register_denali_source."""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.engine.session import get_spark
from denali_spark.sources import SparkCatalogIO
from denali_spark.sources.datasource import register_denali_source

spark = get_spark("datasource-example")
spark.sparkContext.setLogLevel("ERROR")
register_denali_source(spark)
server = CatalogServer(make_state(tempfile.mkdtemp(prefix="denali-example-wh-"))).start()
io = SparkCatalogIO(spark, server.uri)

# seed a table through the engine, then talk to it purely via format("denali")
io.write_table(
    spark.range(0, 5).select("id", (F.col("id") * 10).alias("score")),
    ["demo"], "events", mode="append",
)
opts = {"uri": server.uri, "namespace": "demo", "table": "events"}

# 1. batch write: a native DataFrame append commits one snapshot
spark.range(5, 8).select("id", (F.col("id") * 10).alias("score")).write.format(
    "denali"
).options(**opts).mode("append").save()

# 2. batch read (+ time travel against the pre-append snapshot)
df = spark.read.format("denali").options(**opts).load()
print("rows now:", df.count())
first = io.client.load_table(["demo"], "events")["metadata"]["snapshots"][0]
old = (
    spark.read.format("denali").options(**opts)
    .option("snapshot_id", str(first["snapshot-id"])).load()
)
print("rows at first snapshot:", old.count())

# 3. streaming read: snapshot ids are the offsets — each micro-batch is
#    exactly the newly appended files
stream = (
    spark.readStream.format("denali").options(**opts)
    .option("starting", "earliest").load()
)
q = (
    stream.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("score").alias("s"))
    .writeStream.format("memory").queryName("agg").outputMode("complete").start()
)
q.processAllAvailable()
io.write_table(  # a new append lands while the stream runs...
    spark.range(100, 102).select("id", (F.col("id") * 10).alias("score")),
    ["demo"], "events", mode="append",
)
q.processAllAvailable()  # ...and the next trigger picks up only its files
spark.sql("select * from agg").show()
q.stop()
server.stop()
