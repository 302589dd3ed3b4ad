"""Executed cache-leak twins for the streaming guard sinks (r12 verdict
task 7): each sink persists its batch-derived relations internally and must
unpersist every one of them before returning — an unbalanced persist inside
a foreachBatch sink accretes one CacheManager entry PER MICRO-BATCH, which
on a long-running 100 TB ingest stream is an unbounded executor-memory leak
the batch-query sweeps (tests/test_plans.py, tests/test_text_filters.py)
cannot see. Each test wraps ONE direct sink invocation in the same
before/after getPersistentRDDs check the batch twins use: localCheckpoint
blocks left by earlier suites in this shared session are tolerated, NEW
entries are not."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _persistent(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _doc_batch(spark, i: int = 0):
    text = f"leakprobe{i} " + " ".join(f"tok{i}x{j}" for j in range(10))
    return spark.createDataFrame(
        [(4_000_000 + i, text)], "doc_id long, text string"
    )


def _assert_sink_leak_free(spark, sink, batch) -> None:
    before = _persistent(spark)
    sink(batch, 0)
    after = _persistent(spark)
    assert after <= before, f"sink leaked cached relations: {after - before}"


def test_signature_guard_sink_leak_free(spark, tmp_path):
    from denali_spark.streaming.documents_stream import make_online_dedup_sink

    sink = make_online_dedup_sink(SF, str(tmp_path / "verdicts"))
    _assert_sink_leak_free(spark, sink, _doc_batch(spark, 0))


def test_simhash_guard_sink_leak_free(spark, tmp_path):
    from denali_spark.streaming.documents_stream import make_simhash_guard_sink

    sink = make_simhash_guard_sink(SF, str(tmp_path / "verdicts"))
    _assert_sink_leak_free(spark, sink, _doc_batch(spark, 1))


def test_embedding_dedup_sink_leak_free(spark, tmp_path):
    from denali_spark.streaming.embeddings_stream import make_embedding_dedup_sink

    sink = make_embedding_dedup_sink(SF, str(tmp_path / "verdicts"))
    batch = spark.createDataFrame(
        [(5_000_000, [float((j % 5) - 2.0) for j in range(64)])],
        "vec_id long, embedding array<float>",
    )
    _assert_sink_leak_free(spark, sink, batch)


def test_embedding_drift_sink_leak_free(spark, tmp_path):
    from denali_spark.streaming.embeddings_stream import make_embedding_drift_sink

    sink = make_embedding_drift_sink(SF, str(tmp_path / "drift"))
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = base.filter(F.col("label") == 0).limit(3).select(
        (F.col("vec_id") + 6_000_000).alias("vec_id"), "label", "embedding"
    )
    _assert_sink_leak_free(spark, sink, batch)


def test_decontaminate_and_funnel_sinks_leak_free(spark, tmp_path):
    """The non-guard document sinks run the same discipline — one
    invocation each under the same check."""
    from denali_spark.streaming.documents_stream import (
        make_decontaminate_sink,
        make_filter_funnel_sink,
    )

    batch = _doc_batch(spark, 2)
    _assert_sink_leak_free(
        spark, make_decontaminate_sink(SF, str(tmp_path / "decon")), batch
    )
    _assert_sink_leak_free(
        spark, make_filter_funnel_sink(str(tmp_path / "funnel")), batch
    )
