"""Vector search over the materialized LSH bucket index: corpus top-k, then
an external probe batch through the same ingest-time index."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from denali_spark.engine.session import get_spark
from denali_spark.operators.similarity import sim_lsh_bucket_topk, sim_lsh_search

SF = "/root/testdata/sf0.001"

spark = get_spark("ann-search")
spark.sparkContext.setLogLevel("ERROR")

# Ingest-time step: materialize the LSH bucket index for this corpus
# (build-once/read-many; a no-op when the fingerprinted cache already
# exists — every search below is a pure index read).
from denali_spark.operators.similarity import lsh_bucket_index

print("bucket index rows:", lsh_bucket_index(spark, SF).count())

print("corpus self-search (top-5 per probe):")
print(sim_lsh_bucket_topk(spark, SF).orderBy("query_id", "rn").limit(10).toPandas().to_string(index=False))

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
probes = emb.filter(F.col("vec_id") % 101 == 7).select(
    F.col("vec_id").alias("query_id"),
    F.transform("embedding", lambda x: x.cast("double")).alias("e"),
)
print("external probes:", probes.count())
hits = sim_lsh_search(spark, SF, probes, k=3)
print(hits.orderBy("query_id", "rn").limit(9).toPandas().to_string(index=False))
