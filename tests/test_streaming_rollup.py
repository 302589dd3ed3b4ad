"""Continuous materialized views: the foreachBatch rollup sink must keep
maintained rollups equal to a from-scratch recompute as micro-batches
land, and at-least-once replays must have exactly-once effect (the append
is batch-id-deduped; the refresh is watermark-idempotent)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import RollupSpec, SparkCatalogIO
from denali_spark.sources.ivm import _aggregate_full
from denali_spark.streaming import make_rollup_refresh_sink

NS = ["live"]


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


SPEC = RollupSpec(
    source_namespace=NS, source_name="facts",
    target_namespace=NS, target_name="facts_by_k",
    group_by=["k"],
    sums={"amount_sum": "CAST(amount AS DECIMAL(18,2))"},
    mins={"amount_min": "amount"},
    ndvs={"uniq_ids": "id"},
)

SCHEMA = "id long, k long, amount decimal(18,2)"


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 5).alias("k"),
        (F.col("id").cast("decimal(18,2)") / 4)
        .cast("decimal(18,2)")
        .alias("amount"),
    )


def _assert_matches(io):
    tgt = io.read_table(NS, "facts_by_k")
    plain = [c for c in tgt.columns if c != "uniq_ids"]
    est = F.hll_sketch_estimate("uniq_ids").alias("uniq_est")

    def rows(df):
        return {tuple(r) for r in df.select(*plain, est).collect()}

    assert rows(tgt) == rows(_aggregate_full(io, SPEC))


def _seed(spark, io):
    from denali_spark.sources import create_rollup

    io.write_table(_rows(spark, 0, 100).coalesce(1), NS, "facts", mode="append")
    create_rollup(io, SPEC)


def test_stream_end_to_end(spark, tmp_path, io):
    _seed(spark, io)
    landing = str(tmp_path / "landing")
    _rows(spark, 100, 160).coalesce(1).write.mode("append").parquet(landing)
    time.sleep(1.1)
    _rows(spark, 160, 240).coalesce(1).write.mode("append").parquet(landing)

    sink = make_rollup_refresh_sink(io.client.uri, NS, "facts", [SPEC])
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    _assert_matches(io)
    assert io.read_table(NS, "facts").count() == 240


def test_replay_is_exactly_once(spark, io):
    _seed(spark, io)
    sink = make_rollup_refresh_sink(io.client.uri, NS, "facts", [SPEC])
    b0 = _rows(spark, 100, 150)
    sink(b0, 0)
    _assert_matches(io)
    before = io.read_table(NS, "facts").count()
    tgt_snap_before = io.client.load_table(NS, "facts_by_k")["metadata"][
        "current-snapshot-id"
    ]
    # at-least-once delivery: the SAME batch id arrives again
    sink(b0, 0)
    assert io.read_table(NS, "facts").count() == before
    tgt_snap_after = io.client.load_table(NS, "facts_by_k")["metadata"][
        "current-snapshot-id"
    ]
    assert tgt_snap_after == tgt_snap_before  # refresh no-oped too
    _assert_matches(io)
    # and the stream continues normally afterwards
    sink(_rows(spark, 150, 190), 1)
    _assert_matches(io)


def test_crash_between_append_and_refresh_heals(spark, io):
    _seed(spark, io)
    # simulate the crash: batch 0's append lands WITHOUT its refresh
    io.write_table(
        _rows(spark, 100, 130).coalesce(1), NS, "facts", mode="append",
        summary_extra={"streaming-batch-id": "0"},
    )
    sink = make_rollup_refresh_sink(io.client.uri, NS, "facts", [SPEC])
    # the replayed batch 0 skips the (deduped) append and folds the
    # pending delta — watermark range, not batch boundaries
    sink(_rows(spark, 100, 130), 0)
    _assert_matches(io)
    assert io.read_table(NS, "facts").count() == 130


def test_mv_name_dispatch(spark, io):
    io.write_table(_rows(spark, 0, 100).coalesce(1), NS, "facts", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW live.mv_counts AS
        SELECT k, COUNT(*) AS n_rows,
               SUM(CAST(amount AS DECIMAL(18,2))) AS amount_sum
        FROM live.facts GROUP BY k
    """)
    sink = make_rollup_refresh_sink(
        io.client.uri, NS, "facts", ["live.mv_counts"]
    )
    sink(_rows(spark, 100, 140), 0)
    got = {(r.k, r.n_rows) for r in io.sql(
        "SELECT k, n_rows FROM live.mv_counts").collect()}
    assert got == {(k, 28) for k in range(5)}


def test_replay_after_snapshot_expiry_is_still_deduped(spark, io):
    """The batch-membership check consults snapshot summaries, which
    snapshot expiry trims; the `streaming-batch-id.high-watermark` table
    property must keep a late replay a no-op anyway."""
    from denali_spark.sources import expire_snapshots

    _seed(spark, io)
    sink = make_rollup_refresh_sink(io.client.uri, NS, "facts", [SPEC])
    for bid in range(3):
        sink(_rows(spark, 100 + bid * 50, 150 + bid * 50), bid)
    _assert_matches(io)
    md = io.client.load_table(NS, "facts")["metadata"]
    assert md["properties"]["streaming-batch-id.high-watermark"] == "2"

    # expire everything but the newest snapshot: batches 0..1 lose their
    # summary stamps entirely
    expire_snapshots(io, NS, "facts", keep_last=1)
    md = io.client.load_table(NS, "facts")["metadata"]
    stamped = {
        s.get("summary", {}).get("streaming-batch-id")
        for s in md["snapshots"]
    } - {None}
    assert "0" not in stamped

    before = io.read_table(NS, "facts").count()
    sink(_rows(spark, 100, 150), 0)  # late replay of batch 0
    assert io.read_table(NS, "facts").count() == before
    _assert_matches(io)


def test_write_table_dedupe_requires_summary_key(spark, io):
    io.write_table(_rows(spark, 0, 10).coalesce(1), NS, "facts", mode="append")
    with pytest.raises(ValueError, match="requires summary_extra"):
        io.write_table(
            _rows(spark, 10, 20), NS, "facts", mode="append",
            dedupe_summary_key="streaming-batch-id",
        )


def test_continuous_mv_serves_bounded_staleness_reads(spark, io):
    """r15: the streaming-maintained rollup is the rewrite plane's
    freshest summary — after each micro-batch fold, a fresh-only SELECT
    through io.sql answers from it; between the source append and the
    next fold, a stale-ok read with a generous staleness bound still
    serves the watermark state while a zero bound degrades to the base
    path."""
    # CREATE through SQL to exercise the end-to-end DDL surface here —
    # not because it's required for discoverability: both the SQL and the
    # programmatic create paths stamp ivm.spec, so either is listed as an
    # MV (test_run_maintenance_protects_programmatic_rollups pins the
    # programmatic side)
    io.write_table(_rows(spark, 0, 100).coalesce(1), NS, "facts",
                   mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW live.facts_by_k AS
        SELECT k, COUNT(*) AS n_rows,
               SUM(CAST(amount AS DECIMAL(18,2))) AS amount_sum,
               MIN(amount) AS amount_min,
               APPROX_COUNT_DISTINCT(id) AS uniq_ids
        FROM live.facts GROUP BY k
    """)
    sink = make_rollup_refresh_sink(io.client.uri, NS, "facts", [SPEC])
    sink(_rows(spark, 100, 150), 0)

    q = ("SELECT k, COUNT(*) AS n, "
         "SUM(CAST(amount AS DECIMAL(18,2))) AS total "
         "FROM live.facts GROUP BY k")
    io.mv_rewrite = "fresh-only"
    df = io.sql(q)
    assert io.last_mv_rewrite is not None  # fold left the MV fresh
    assert {r.n for r in df.collect()} == {30}

    # a source append lands but its fold has not run yet
    io.write_table(_rows(spark, 150, 200).coalesce(1), NS, "facts",
                   mode="append")
    io.sql(q)
    assert io.last_mv_rewrite is None  # fresh-only degrades
    io.mv_rewrite = "stale-ok"
    io.mv_rewrite_max_staleness_ms = 24 * 3600 * 1000
    df = io.sql(q)
    assert io.last_mv_rewrite is not None
    assert io.last_mv_rewrite["fresh"] is False
    assert {r.n for r in df.collect()} == {30}  # the watermark state
    io.mv_rewrite_max_staleness_ms = 0
    io.sql(q)
    assert io.last_mv_rewrite is None  # bound tighter than the lag
    io.mv_rewrite_max_staleness_ms = None

    # the next micro-batch folds the lag away; fresh-only serves again
    io.mv_rewrite = "fresh-only"
    sink(spark.createDataFrame([], SCHEMA), 1)
    df = io.sql(q)
    assert io.last_mv_rewrite is not None
    assert {r.n for r in df.collect()} == {40}
