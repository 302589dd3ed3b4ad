"""The complete online vector-index lifecycle: micro-batches of embeddings
stream into a bucket/vector store, searches graft the streamed partitions
onto the immutable base index, and a periodic FOLD compacts everything
into a new index generation — after which searches read one index again
and the streamed store is empty. The same generational kernel runs the
document signature fold (streaming/fold.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tempfile

from pyspark.sql import functions as F

from denali_spark.engine.session import get_spark
from denali_spark.operators.similarity import sim_lsh_search
from denali_spark.streaming import (
    fold_streamed_index,
    make_embedding_index_sink,
    read_folded_index,
    read_streamed_buckets,
    read_streamed_vectors,
)

SF = "/root/testdata/sf0.001"

spark = get_spark("online-index-lifecycle")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="denali-example-fold-")
bucket_dir, vec_dir, index_root = (
    f"{work}/buckets", f"{work}/vecs", f"{work}/index",
)

# two micro-batches of late-arriving vectors: a near-copy of corpus vec 0
# (searchable twin) and two unrelated vectors
base = spark.read.parquet(f"{SF}/embeddings.parquet")
sink = make_embedding_index_sink(bucket_dir, vec_dir)
sink(
    base.filter(F.col("vec_id") == 0).select(
        F.lit(1_000_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: (x * 0.999).cast("float")).alias(
            "embedding"
        ),
    ),
    0,
)
sink(
    spark.createDataFrame(
        [(1_000_001 + i, [float((i + 2) * (j % 7) - 3.0) for j in range(64)])
         for i in range(2)],
        "vec_id long, embedding array<float>",
    ),
    1,
)

probes = base.filter(F.col("vec_id") == 0).select(
    F.lit(0).cast("long").alias("query_id"),
    F.transform("embedding", lambda x: x.cast("double")).alias("e"),
)

# before the fold: search grafts the streamed partitions onto the base
grafted = sim_lsh_search(
    spark, SF, probes, k=3,
    extra_buckets=read_streamed_buckets(spark, bucket_dir),
    extra_vecs=read_streamed_vectors(spark, vec_dir),
).collect()
print("grafted search:", [(r["neighbor_id"], round(r["cos"], 4)) for r in grafted])

# fold: streamed partitions compact into generation 1; replay is a no-op
print("fold #1:", fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root))
print("replay :", fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root))

# after the fold: one index read, no grafts, identical results
fb, fv = read_folded_index(spark, index_root)
folded = sim_lsh_search(spark, SF, probes, k=3, base_buckets=fb, base_vecs=fv).collect()
print("folded search :", [(r["neighbor_id"], round(r["cos"], 4)) for r in folded])
assert [(r["neighbor_id"], r["rn"]) for r in folded] == [
    (r["neighbor_id"], r["rn"]) for r in grafted
]
assert read_streamed_buckets(spark, bucket_dir) is None  # store truncated

# --- the same lifecycle for the co-purchase graph (ADDITIVE fold) -----------
# New order lines stream in; each batch appends pair-support partials; the
# graft read re-aggregates base ∪ partials to one row per pair, and the fold
# SUMS supports into the next generation (FoldRelation.merge).
from denali_spark.streaming import (
    fold_pair_support,
    make_pair_support_sink,
    pair_support_with_grafts,
    read_lineitem_stream,
)

glanding = tempfile.mkdtemp(prefix="denali-example-graph-landing-")
gstore = tempfile.mkdtemp(prefix="denali-example-graph-store-")
groot = tempfile.mkdtemp(prefix="denali-example-graph-fold-")
spark.createDataFrame(
    [(10**9 + 1, 11), (10**9 + 1, 12), (10**9 + 2, 11), (10**9 + 2, 12)],
    "l_orderkey long, l_partkey long",
).coalesce(1).write.mode("append").parquet(glanding)
gq = (
    read_lineitem_stream(spark, glanding)
    .writeStream.foreachBatch(make_pair_support_sink(gstore))
    .option("checkpointLocation", tempfile.mkdtemp(prefix="denali-example-graph-ck-"))
    .start()
)
gq.processAllAvailable()
gq.stop()
grafted_pairs = pair_support_with_grafts(spark, SF, gstore)
delta = grafted_pairs.filter("part_a = 11 AND part_b = 12").collect()
print("grafted (11,12) support:", delta[0]["support"])
assert delta[0]["support"] >= 2  # the two streamed orders
print("graph fold:", fold_pair_support(spark, SF, gstore, groot))
folded_pairs = pair_support_with_grafts(spark, SF, gstore, index_root=groot)
assert folded_pairs.filter("part_a = 11 AND part_b = 12").collect()[0]["support"] == delta[0]["support"]

spark.stop()
print("OK")
