"""Online near-dup CLUSTER-LABEL maintenance: the cluster-label index
through the ingest→graft→fold lifecycle — the EIGHTH relation family on
the shared fold kernel, and the first whose merge is a FIXPOINT rather
than a union (signatures/buckets/lists/codes/fingerprints) or a sum
(pair supports).

Representation: a label relation IS an edge relation in contracted form.
Each generation stores one STAR EDGE per document — (i=doc_id,
j=component), singletons as self-loops (i=j) so the node set rides
in-band — which preserves the base graph's connectivity exactly while
contracting every cluster to diameter ≤ 2, and makes the state
schema-compatible with the streamed PAIR partials (i, j). The fold is
then `base ∪ partials → propagate_min_labels → next generation of star
edges`: exact, because labels are global min doc-ids and the contracted
union has the same connectivity as the full pair graph (twin-tested
against from-scratch clustering of the combined corpus).

Per micro-batch the sink writes the batch's full near-dup pair relation
(batch-vs-corpus off the signature index, batch-vs-previously-streamed
off the grown signature store, batch-vs-itself) — NOT just best-match
verdicts: a doc matching two different clusters must merge them, which a
single dup_of edge cannot express. ALL batch signatures join the store
(duplicates too — a future doc may near-match a duplicate only), unlike
the dedup sink's novel-only store.

Contract: doc ids are unique and never reappear across batches (the
append-only document convention). At 100 TB this is how cluster-keyed
decisions (sampling weights, leakage-safe splits, survivorship) stay
current while the corpus streams: the ~diameter-round propagation runs
over contracted state ∪ new pairs at fold time — O(shard) work,
independent of corpus size — and consumers read one label layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _labels_as_star_edges(labels: DataFrame) -> DataFrame:
    return labels.select(F.col("doc_id").alias("i"), F.col("component").alias("j"))


def _star_edges_as_labels(star: DataFrame) -> DataFrame:
    return star.select(
        F.col("i").alias("doc_id"),
        F.col("j").alias("component"),
        (F.col("i") == F.col("j")).alias("is_canonical"),
    )


def _labels_fixpoint(df: DataFrame) -> DataFrame:
    """The fold merge: df is (prev generation's star edges ∪ new pair
    partials); one min-label propagation over the union returns the next
    generation's star edges (one row per node — self-loops keep
    singletons)."""
    from denali_spark.operators.dedup import propagate_min_labels

    nodes = (
        df.select(F.col("i").alias("doc_id"))
        .unionByName(df.select(F.col("j").alias("doc_id")))
        .distinct()
    )
    return _labels_as_star_edges(propagate_min_labels(df.select("i", "j"), nodes))


def make_cc_pair_sink(
    sf_dir: str,
    store_dir: str,
    sig_dir: str | None = None,
    threshold: float = 0.3,
):
    """foreachBatch sink: write the batch's full near-dup PAIR relation to
    ``store_dir/batch_id=N/`` and the batch's signatures (all of them) to
    ``sig_dir/batch_id=N/``. Overwriting the batch's own partitions keeps
    at-least-once replays exactly-once in effect; Spark's _SUCCESS marker
    is the commit gate the graft and fold readers require (a batch counts
    as committed only when BOTH stores carry it — the shared kernel's
    all-stores rule)."""
    sig_dir = sig_dir if sig_dir is not None else f"{store_dir}_sigs"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.dedup import (
            _lsh_pairs,
            _with_signatures,
            dedup_incremental_pairs,
            minhash_signature_index,
        )
        from denali_spark.streaming.documents_stream import _read_prior_sigs

        spark = batch_df.sparkSession
        fresh = _with_signatures(batch_df).persist()
        corpus = minhash_signature_index(spark, sf_dir)
        prior = _read_prior_sigs(spark, sig_dir, batch_id)
        if prior is not None:
            corpus = corpus.unionByName(prior.select(*corpus.columns))
        cross = dedup_incremental_pairs(
            spark, sf_dir, batch_df, threshold, corpus_sig=corpus, new_sig=fresh
        ).select(F.col("new_doc_id").alias("i"), F.col("corpus_doc_id").alias("j"))
        intra = _lsh_pairs(fresh, threshold).select("i", "j")
        # Signatures FIRST: a pairs partition may only become visible once
        # the signatures later batches pair against are durable (a crash
        # between the writes then leaves the batch uncommitted — replayed
        # whole — instead of committed-but-unpairable-against).
        fresh.write.mode("overwrite").parquet(f"{sig_dir}/batch_id={batch_id}")
        cross.unionByName(intra).write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )
        fresh.unpersist()

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


def cc_labels_with_grafts(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    index_root: str | None = None,
) -> DataFrame:
    """Current cluster labels (doc_id, component, is_canonical): the
    committed folded generation's star edges (or the corpus-derived label
    index if no fold ran) plus every committed, not-yet-folded pair
    partition, resolved by one propagation over the contracted union —
    the read a cluster-keyed decision issues mid-stream. With no pending
    partials this is a pure parquet read (no propagation)."""
    from denali_spark.operators.dedup import cc_label_index
    from denali_spark.streaming.fold import read_folded

    star = None
    exclude: set[int] = set()
    if index_root is not None:
        got = read_folded(spark, index_root, ("labels",))
        if got is not None:
            star = got["labels"].select("i", "j")
            import json

            with open(os.path.join(index_root, "state.json")) as f:
                exclude = set(json.load(f)["folded_batches"])
    if star is None:
        star = _labels_as_star_edges(cc_label_index(spark, sf_dir))
    parts = _committed_parts(store_dir, exclude)
    if not parts:
        return _star_edges_as_labels(star)
    fresh = spark.read.parquet(*parts).select("i", "j")
    return _star_edges_as_labels(_labels_fixpoint(star.unionByName(fresh)))


def fold_cc_labels(
    spark: SparkSession,
    sf_dir: str,
    store_dir: str,
    index_root: str,
    keep_generations: int = 2,
) -> dict:
    """One fold cycle for the streamed cluster-label store: rebuild the
    star-edge relation from (current generation + committed pair
    partials) with the fixpoint merge, commit the next generation,
    truncate what was folded (crash-safe per the shared kernel's
    protocol). The signature store is NOT folded here — it belongs to the
    signature family's own fold."""
    from denali_spark.engine.index_cache import index_file_count
    from denali_spark.operators.dedup import cc_label_index, cc_label_index_path
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    return fold_streamed_partitions(
        spark,
        index_root,
        corpus_key=os.path.basename(cc_label_index_path(sf_dir)),
        relations=[
            FoldRelation(
                "labels",
                store_dir,
                lambda: _labels_as_star_edges(cc_label_index(spark, sf_dir)),
                ("i", "j"),
                index_file_count(sf_dir, "documents"),
                distribute_by=("i",),
                merge=_labels_fixpoint,
            )
        ],
        keep_generations=keep_generations,
    )
