"""Streaming cluster-label lifecycle: the star-edge fold family must reach
the EXACT from-scratch fixpoint however the shard arrives (one batch, many
batches, replayed batches, graft reads mid-stream, folds between drops) —
labels are global min doc-ids, so equality is literal, not approximate."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _shard(spark, lo: int, hi: int):
    """Re-keyed corpus docs (guaranteed near-dups of their originals) —
    doc_id % 100 in [lo, hi) shifted by +1e6."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.filter(
        (F.col("doc_id") % 100 >= lo) & (F.col("doc_id") % 100 < hi)
    ).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")


@pytest.fixture()
def scratch_labels(spark, tmp_path_factory):
    """From-scratch cluster labels of corpus ∪ the full test shard
    (doc_id % 100 in [3, 5))."""
    import pyarrow.parquet as pq

    from denali_spark.operators.dedup import cc_label_index

    d = str(tmp_path_factory.mktemp("combined"))
    t = pq.read_table(f"{SF}/documents.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    extra = docs.filter((F.col("doc_id") % 100 >= 3) & (F.col("doc_id") % 100 < 5)).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        *[c for c in t.schema.names if c != "doc_id"],
    )
    docs.select(*t.schema.names).unionByName(extra).toPandas().to_parquet(
        os.path.join(d, "documents.parquet")
    )
    return {
        r["doc_id"]: r["component"]
        for r in cc_label_index(spark, d).collect()
    }


def _labels_dict(df) -> dict:
    return {r["doc_id"]: r["component"] for r in df.collect()}


def test_graft_fold_graft_matches_from_scratch(spark, tmp_path, scratch_labels):
    """Two drops with a fold between them: the graft read after drop 1,
    the fold, the graft read after drop 2, and the final fold must all
    agree with from-scratch clustering of whatever has arrived."""
    from denali_spark.streaming.cc_stream import (
        cc_labels_with_grafts,
        fold_cc_labels,
        make_cc_pair_sink,
    )

    store = str(tmp_path / "pairs")
    root = str(tmp_path / "fold")
    sink = make_cc_pair_sink(SF, store)

    sink(_shard(spark, 3, 4), 0)
    got0 = _labels_dict(cc_labels_with_grafts(spark, SF, store, root))
    # every drop-0 doc labeled; labels agree with the full-scratch map on
    # the subset that has arrived (drop-1 docs can't affect drop-0 labels:
    # components are min ids and re-keyed ids are all > corpus ids)
    for k, v in got0.items():
        assert scratch_labels[k] == v

    r1 = fold_cc_labels(spark, SF, store, root)
    assert not r1["noop"] and r1["generation"] == 1
    # folded partition truncated; generation readable with zero pendings
    assert not os.path.isdir(os.path.join(store, "batch_id=0"))
    got_gen1 = _labels_dict(cc_labels_with_grafts(spark, SF, store, root))
    assert got_gen1 == got0

    sink(_shard(spark, 4, 5), 1)
    got1 = _labels_dict(cc_labels_with_grafts(spark, SF, store, root))
    assert got1 == scratch_labels

    r2 = fold_cc_labels(spark, SF, store, root)
    assert not r2["noop"] and r2["generation"] == 2
    assert _labels_dict(cc_labels_with_grafts(spark, SF, store, root)) == scratch_labels


def test_single_batch_matches_incremental_kernel(spark, tmp_path):
    """One drop, no fold: the graft read equals the batch-mode
    incremental_cc_labels kernel over the same shard."""
    from denali_spark.operators.dedup import incremental_cc_labels
    from denali_spark.streaming.cc_stream import (
        cc_labels_with_grafts,
        make_cc_pair_sink,
    )

    store = str(tmp_path / "pairs")
    shard = _shard(spark, 3, 5)
    make_cc_pair_sink(SF, store)(shard, 0)
    got = _labels_dict(cc_labels_with_grafts(spark, SF, store))
    want = _labels_dict(incremental_cc_labels(spark, SF, shard))
    assert got == want


def test_replayed_batch_and_fold_are_idempotent(spark, tmp_path):
    from denali_spark.streaming.cc_stream import (
        cc_labels_with_grafts,
        fold_cc_labels,
        make_cc_pair_sink,
    )

    store = str(tmp_path / "pairs")
    root = str(tmp_path / "fold")
    sink = make_cc_pair_sink(SF, store)
    batch = _shard(spark, 3, 4)

    sink(batch, 0)
    first = _labels_dict(cc_labels_with_grafts(spark, SF, store, root))
    sink(batch, 0)  # foreachBatch replay after restart
    assert _labels_dict(cc_labels_with_grafts(spark, SF, store, root)) == first

    assert not fold_cc_labels(spark, SF, store, root)["noop"]
    after_fold = _labels_dict(cc_labels_with_grafts(spark, SF, store, root))
    assert after_fold == first
    assert fold_cc_labels(spark, SF, store, root)["noop"]  # replayed fold
    sink(batch, 0)  # replayed sink write AFTER the fold: swept, not refolded
    assert fold_cc_labels(spark, SF, store, root)["noop"]
    assert _labels_dict(cc_labels_with_grafts(spark, SF, store, root)) == first


def test_cc_pair_sink_leak_free(spark, tmp_path):
    """Same executed persist/unpersist balance check as the other guard
    sinks (tests/test_streaming_sink_leaks.py)."""
    from denali_spark.streaming.cc_stream import make_cc_pair_sink

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    make_cc_pair_sink(SF, str(tmp_path / "pairs"))(_shard(spark, 3, 4), 0)
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"sink leaked cached relations: {after - before}"
