"""Online co-purchase graph maintenance: the pair-support index through
the ingest→graft→fold lifecycle (the SIXTH relation family on the shared
fold kernel, and the first ADDITIVE one).

New order lines land as files; each micro-batch computes its own canonical
pair-support partials (the self-join is batch-confined — the expensive
O(Σ basket²) work only ever touches new orders) and appends them as one
parquet partition. Readers graft: base index ∪ committed partials,
re-aggregated by pair key, so supports stay one row per pair however many
batches ran. The fold compacts base + partials into the next generation
with the same re-aggregation (FoldRelation.merge) — pair counts are
ADDITIVE, which is exactly what makes the union-then-sum fold correct.

Contract: drops carry NEW, COMPLETE orders (the append-only fact
convention — an order's lines arrive together, order keys never reappear).
A split basket would undercount its cross-drop pairs and a re-keyed one
would double-count; order-grain CDC upstreams guarantee both properties.

At 100 TB this is how the link-analysis plane stays queryable while the
fact stream runs: PageRank/k-core/triangles read ONE index layout (the
current generation plus a bounded tail of unfolded batches), and the
basket self-join is amortized over ingest instead of replayed per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEITEM_STREAM_SCHEMA = "l_orderkey long, l_partkey long"


def read_lineitem_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of (l_orderkey, l_partkey) parquet drops — the
    order-lines landing pattern; at scale the same code over an
    object-store path with maxFilesPerTrigger bounding batch size."""
    reader = spark.readStream.schema(LINEITEM_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def _batch_pair_support(batch_df: DataFrame) -> DataFrame:
    """Canonical (part_a < part_b, support) partials for ONE batch's
    complete orders — the same aggregation pair_support_index builds over
    the whole corpus, confined to the batch."""
    baskets = batch_df.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    return (
        a.join(b, on=[F.col("a.l_orderkey") == F.col("b.l_orderkey")])
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )


def _merge_pairs(df: DataFrame) -> DataFrame:
    """Re-aggregate a union of pair-support relations to one row per pair
    — the additive merge shared by the graft read and the fold."""
    return df.groupBy("part_a", "part_b").agg(
        F.sum("support").cast("long").alias("support")
    )


def make_pair_support_sink(store_dir: str):
    """foreachBatch sink: write the batch's pair-support partials to
    ``store_dir/batch_id=N/``. Overwriting the batch's own partition keeps
    at-least-once replays exactly-once in effect (the events_stream stamp
    discipline); Spark's _SUCCESS marker is the commit gate the graft and
    fold readers require."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _batch_pair_support(batch_df).write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    return _sink


def _committed_parts(store_dir: str, exclude: set[int] | None = None) -> list[str]:
    if not os.path.isdir(store_dir):
        return []
    return [
        os.path.join(store_dir, d)
        for d in sorted(os.listdir(store_dir))
        if d.startswith("batch_id=")
        and int(d.split("=", 1)[1]) not in (exclude or set())
        and os.path.exists(os.path.join(store_dir, d, "_SUCCESS"))
    ]


def pair_support_with_grafts(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    index_root: str | None = None,
) -> DataFrame:
    """Current pair-support relation: the committed folded generation (or
    the corpus-derived base index if no fold ran) grafted with every
    committed, not-yet-folded batch partition, re-aggregated to one row
    per pair. The read a link-analysis query issues mid-stream."""
    from denali_spark.operators.graph import pair_support_index
    from denali_spark.streaming.fold import read_folded

    base = None
    exclude: set[int] = set()
    if index_root is not None:
        got = read_folded(spark, index_root, ("pairs",))
        if got is not None:
            base = got["pairs"]
            import json

            with open(os.path.join(index_root, "state.json")) as f:
                exclude = set(json.load(f)["folded_batches"])
    if base is None:
        base = pair_support_index(spark, sf_dir)
    parts = _committed_parts(store_dir, exclude)
    if not parts:
        return base
    fresh = spark.read.parquet(*parts).select("part_a", "part_b", "support")
    return _merge_pairs(base.select("part_a", "part_b", "support").unionByName(fresh))


def fold_pair_support(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    index_root: str,
    keep_generations: int = 2,
) -> dict:
    """One fold cycle for the streamed pair-support store: rebuild the
    pair relation from (current generation + committed partials) with the
    additive merge, commit the next generation, truncate what was folded
    (crash-safe per the shared kernel's protocol)."""
    from denali_spark.engine.index_cache import index_file_count
    from denali_spark.operators.graph import graph_index_path, pair_support_index
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    return fold_streamed_partitions(
        spark,
        index_root,
        corpus_key=os.path.basename(graph_index_path(sf_dir)),
        relations=[
            FoldRelation(
                "pairs",
                store_dir,
                lambda: pair_support_index(spark, sf_dir),
                ("part_a", "part_b", "support"),
                index_file_count(sf_dir, "lineitem"),
                distribute_by=("part_a",),
                merge=_merge_pairs,
            )
        ],
        keep_generations=keep_generations,
    )
