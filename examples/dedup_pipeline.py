"""Near-duplicate pipeline end-to-end over the synthetic documents corpus:
MinHash+LSH pairs -> connected components -> keep-best per cluster ->
materialized deduped corpus."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from denali_spark.engine.session import get_spark
from denali_spark.operators.dedup import (
    dedup_connected_components,
    dedup_minhash_lsh_pairs,
)
from denali_spark.operators.text_analysis import text_dedup_keep_best

SF = "/root/testdata/sf0.001"

spark = get_spark("dedup-pipeline")
spark.sparkContext.setLogLevel("ERROR")

# Ingest-time step: materialize the MinHash signature index for this
# corpus (build-once/read-many; a no-op when the fingerprinted cache
# already exists — every dedup stage below reads it).
from denali_spark.operators.dedup import minhash_signature_index

print("signature index rows:", minhash_signature_index(spark, SF).count())

pairs = dedup_minhash_lsh_pairs(spark, SF)
print("near-dup pairs:", pairs.count())

clusters = dedup_connected_components(spark, SF)
n_clusters = clusters.filter("is_canonical").count()
print("documents:", clusters.count(), "-> clusters:", n_clusters)

decisions = text_dedup_keep_best(spark, SF)
kept = decisions.filter("keep")
print("kept (best per cluster):", kept.count())
print(kept.orderBy("component").limit(5).toPandas().to_string(index=False))

# The component labels above were served from the materialized
# cluster-label index (built once per corpus; every consumer below is a
# parquet read). The label-keyed downstream decisions:
from denali_spark.operators.dedup import (
    dedup_cluster_source_purity,
    dedup_sampling_weights,
    sample_cluster_holdout,
)

weights = dedup_sampling_weights(spark, SF)
print("min sampling weight (ppm):", weights.agg({"weight_ppm": "min"}).first()[0])

split = sample_cluster_holdout(spark, SF).groupBy("split").count()
print(split.orderBy("split").toPandas().to_string(index=False))

print("cluster source purity:")
print(
    dedup_cluster_source_purity(spark, SF)
    .orderBy("n_sources").toPandas().to_string(index=False)
)
