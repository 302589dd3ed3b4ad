"""Link analysis off the materialized co-purchase indexes: build the
pair-support + adjacency artifacts once (the ingest-time step), then run
PageRank, k-core, clustering coefficients, and frequent pairs as parquet
reads — plus MMR-diversified vector retrieval over the PQ index."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from denali_spark.engine.session import get_spark
from denali_spark.operators.graph import (
    adjacency_index,
    graph_clustering_coefficient,
    graph_frequent_pairs,
    graph_kcore_peel,
    graph_pagerank_parts,
    pair_support_index,
)
from denali_spark.operators.similarity import sim_mmr_diversify

SF = "/root/testdata/sf0.001"

spark = get_spark("graph-analytics")
spark.sparkContext.setLogLevel("ERROR")

# Ingest-time step: materialize the pair-support relation and the
# degree-annotated adjacency (build-once/read-many; no-ops when the
# fingerprinted caches already exist). Every query below is a parquet
# read — the basket self-join never runs at query time.
print("pair-support rows:", pair_support_index(spark, SF).count())
print("adjacency rows:", adjacency_index(spark, SF).count())

print("\ntop-5 PageRank parts (integer fixed-point):")
print(graph_pagerank_parts(spark, SF).limit(5).toPandas().to_string(index=False))

print("\nfrequent co-purchase pairs:", graph_frequent_pairs(spark, SF).count())

kcore = graph_kcore_peel(spark, SF)
print("3-core survivors:", kcore.count())

cc = graph_clustering_coefficient(spark, SF)
print("\nmost clique-like parts (clustering ppm):")
print(
    cc.orderBy(cc.clustering_ppm.desc(), "part_key")
    .limit(5).toPandas().to_string(index=False)
)

print("\nMMR-diversified top-3 per probe (int8 dots off the PQ index):")
mmr = sim_mmr_diversify(spark, SF)
print(mmr.orderBy("query_id", "mmr_rank").limit(9).toPandas().to_string(index=False))

spark.stop()
print("OK")
