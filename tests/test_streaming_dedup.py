"""Streaming online dedup: documents land as files, each micro-batch flags
its docs against the corpus via the materialized signature index, verdicts
land one partition per batch. Checked against the batch-mode kernel over the
same documents, plus explicit replay idempotence."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from denali_spark.operators.dedup import online_dedup
from denali_spark.streaming.documents_stream import (
    make_online_dedup_sink,
    read_document_stream,
    read_verdicts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def doc_landing(spark, tmp_path):
    """Two file drops: corpus copies (re-keyed, guaranteed dups) and novel
    docs that match nothing."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "doc-landing")
    copies = docs.filter(F.col("doc_id") % 100 == 7).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    copies.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    novel = spark.createDataFrame(
        [(2_000_000 + i, f"completely novel text {i} qqq www eee rrr ttt yyy uuu")
         for i in range(3)],
        "doc_id long, text string",
    )
    novel.coalesce(1).write.mode("append").parquet(src)
    all_docs = copies.unionByName(novel)
    return src, all_docs


def test_streaming_verdicts_match_batch_kernel(spark, doc_landing, tmp_path):
    src, all_docs = doc_landing
    out = str(tmp_path / "verdicts")
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(make_online_dedup_sink(SF, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_verdicts(spark, out).collect()
    }
    expect = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in online_dedup(spark, SF, all_docs).collect()
    }
    assert got == expect
    # sanity on content: every corpus copy is flagged against its source,
    # every novel doc is clean
    for doc_id, (dup, dup_of) in got.items():
        if doc_id >= 2_000_000:
            assert not dup and dup_of is None
        else:
            assert dup and dup_of == doc_id - 1_000_000


def test_replayed_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "verdicts")
    sink = make_online_dedup_sink(SF, out)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    batch = docs.filter(F.col("doc_id") == 11).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    sink(batch, 0)
    n = read_verdicts(spark, out).count()
    sink(batch, 0)  # foreachBatch replay after restart: same partition
    assert read_verdicts(spark, out).count() == n
    assert set(os.listdir(out)) >= {"batch_id=0"}
