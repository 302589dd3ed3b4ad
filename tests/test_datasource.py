"""Python Data Source tests: spark.read.format("denali") batch reads with
time travel, the snapshot-offset streaming source, and scope errors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import SparkCatalogIO, equality_delete
from denali_spark.sources.datasource import register_denali_source


@pytest.fixture()
def io(spark, tmp_path):
    register_denali_source(spark)
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _append(spark, io, ns, name, lo, hi):
    df = spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")).coalesce(1)
    io.write_table(df, ns, name, mode="append")
    return io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]


def _fmt(spark, io, name):
    return (
        spark.read.format("denali")
        .option("uri", io.client.uri)
        .option("namespace", "dsrc")
        .option("table", name)
    )


def test_batch_read_matches_io(spark, io):
    ns = ["dsrc"]
    s1 = _append(spark, io, ns, "t", 0, 10)
    _append(spark, io, ns, "t", 10, 15)
    df = _fmt(spark, io, "t").load()
    assert sorted((r.id, r.v) for r in df.collect()) == [
        (i, 2 * i) for i in range(15)
    ]
    # time travel by snapshot id
    old = _fmt(spark, io, "t").option("snapshot_id", str(s1)).load()
    assert old.count() == 10
    # and by ref
    io.create_tag(ns, "t", "v1")
    by_ref = _fmt(spark, io, "t").option("ref", "v1").load()
    assert by_ref.count() == 15


def test_batch_read_empty_table(spark, io):
    io.client.create_namespace(["dsrc"])
    io.client.create_table(
        ["dsrc"], "empty",
        {"type": "struct", "schema-id": 0,
         "fields": [{"id": 1, "name": "id", "type": "long", "required": False}]},
    )
    df = _fmt(spark, io, "empty").load()
    assert df.count() == 0 and df.columns == ["id"]


def test_batch_read_refuses_pending_mor_deletes(spark, io):
    ns = ["dsrc"]
    _append(spark, io, ns, "mor", 0, 10)
    equality_delete(io, ns, "mor", spark.createDataFrame([(3,)], "id long"), on=["id"])
    with pytest.raises(Exception, match="merge-on-read"):
        _fmt(spark, io, "mor").load().collect()


def test_stream_consumes_snapshots_incrementally(spark, io):
    ns = ["dsrc"]
    _append(spark, io, ns, "s", 0, 5)
    stream = (
        spark.readStream.format("denali")
        .option("uri", io.client.uri)
        .option("namespace", "dsrc")
        .option("table", "s")
        .option("starting", "earliest")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dsrc_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = sorted(r.id for r in spark.sql("select * from dsrc_stream").collect())
        assert first == list(range(5))

        _append(spark, io, ns, "s", 5, 9)
        q.processAllAvailable()
        both = sorted(r.id for r in spark.sql("select * from dsrc_stream").collect())
        assert both == list(range(9))
    finally:
        q.stop()


def test_stream_default_start_is_latest(spark, io):
    ns = ["dsrc"]
    _append(spark, io, ns, "s2", 0, 5)  # pre-existing data: skipped by default
    stream = (
        spark.readStream.format("denali")
        .option("uri", io.client.uri)
        .option("namespace", "dsrc")
        .option("table", "s2")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dsrc_latest")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from dsrc_latest").count() == 0
        _append(spark, io, ns, "s2", 100, 103)
        q.processAllAvailable()
        got = sorted(r.id for r in spark.sql("select * from dsrc_latest").collect())
        assert got == [100, 101, 102]
    finally:
        q.stop()
