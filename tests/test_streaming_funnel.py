"""Streaming quality-filter funnel: the batch cascade's six scan-local
stages run per micro-batch, and the dedup-exact stage runs against the
corpus-so-far (prior batches' accepted hashes + intra-batch keep-first) —
the same growing-corpus semantics as the online dedup sink. Checked for
stage agreement with the batch kernel, cross-batch exactly-once
acceptance, and replay idempotence."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from denali_spark.operators.text_analysis import funnel_depths
from denali_spark.streaming.documents_stream import (
    make_filter_funnel_sink,
    read_document_stream,
    read_verdicts,
)

# Passes all six scan-local stages: >80 chars, low punctuation, >=10
# tokens of sane mean length, plenty of English stopwords.
GOOD = (
    "the cat and the dog went to the market in the morning and it was "
    "a fine day for everyone involved in that long walk to town"
)
SHORT = "too short"  # fails length_band


def test_funnel_sink_stages_and_growing_corpus(spark, tmp_path):
    out = str(tmp_path / "fv")
    sink = make_filter_funnel_sink(out)
    b0 = spark.createDataFrame(
        [(1, GOOD), (2, SHORT), (3, GOOD)], "doc_id long, text string"
    )
    sink(b0, 0)
    got0 = {
        r["doc_id"]: (r["depth"], r["kept"])
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    # doc 1 survives all stages incl. intra-batch keep-first; doc 3 is its
    # exact dup (higher id -> dropped at dedup, depth stays 6); doc 2
    # fails the length band (depth 1)
    assert got0 == {1: (7, True), 2: (1, False), 3: (6, False)}
    # scan-local depths agree with the batch kernel
    batch_depths = {
        r["doc_id"]: r["depth"] for r in funnel_depths(b0).collect()
    }
    assert batch_depths == {1: 6, 2: 1, 3: 6}

    # batch 1 re-sends GOOD under a new id: the hash store grew, so it is
    # dropped at the dedup stage — accepted exactly once across batches
    b1 = spark.createDataFrame(
        [(10, GOOD), (11, GOOD + " extra tail of words")],
        "doc_id long, text string",
    )
    sink(b1, 1)
    got1 = {
        r["doc_id"]: (r["depth"], r["kept"])
        for r in spark.read.parquet(f"{out}/batch_id=1").collect()
    }
    assert got1[10] == (6, False)   # seen in batch 0
    assert got1[11] == (7, True)    # genuinely new text
    assert sorted(os.listdir(f"{out}_hashes")) == ["batch_id=0", "batch_id=1"]


def test_funnel_sink_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "fv")
    sink = make_filter_funnel_sink(out)
    b0 = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, GOOD)], "doc_id long, text string")
    sink(b0, 0)
    sink(b1, 1)
    before = sorted(
        (r["doc_id"], r["depth"], r["kept"])
        for r in read_verdicts(spark, out).collect()
    )
    assert before == [(1, 7, True), (2, 6, False)]
    # foreachBatch replay after restart: batch 1 rewrites only its own
    # partitions and sees the same prior-corpus view -> identical verdicts
    sink(b1, 1)
    after = sorted(
        (r["doc_id"], r["depth"], r["kept"])
        for r in read_verdicts(spark, out).collect()
    )
    assert after == before


def test_funnel_sink_through_stream(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "fv")
    spark.createDataFrame(
        [(1, GOOD), (2, SHORT)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, GOOD)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(make_filter_funnel_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["doc_id"]: r["kept"] for r in read_verdicts(spark, out).collect()
    }
    assert rows[2] is False
    # GOOD is accepted exactly once regardless of how the file source
    # grouped the two drops into batches
    assert sorted([rows[1], rows[3]]) == [False, True] or (
        # single-batch grouping: keep-first wins on the lower id
        rows[1] is True and rows[3] is False
    )
    kept_count = sum(
        1 for r in read_verdicts(spark, out).collect() if r["kept"]
    )
    assert kept_count == 1
