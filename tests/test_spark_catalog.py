"""End-to-end Spark ⇄ catalog tests: the reference's example flow
(/root/reference/examples/pyspark_example.py — FIXTURES.md §A.3) plus
time travel, concurrent-commit retries, zero-copy adoption of the testdata,
and view execution."""

from __future__ import annotations

import pytest

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import SparkCatalogIO
from tests.conftest import SF_SMOKE


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def test_westeros_end_to_end(spark, io):
    """CREATE NAMESPACE westeros → write → SELECT * (example flow)."""
    df = spark.createDataFrame(
        [(1, "jon_snow", 0.0)], "id long, name string, what_they_know double"
    )
    io.write_table(df, ["westeros"], "my_table", mode="overwrite")
    back = io.read_table(["westeros"], "my_table")
    rows = back.collect()
    assert len(rows) == 1
    assert rows[0].name == "jon_snow"
    assert ["westeros"] in io.client.list_namespaces()


def test_append_and_time_travel(spark, io):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    first = io.write_table(df1, ["tt"], "t")
    snap1 = first["metadata"]["current-snapshot-id"]
    io.write_table(df2, ["tt"], "t")

    assert io.read_table(["tt"], "t").count() == 3
    # VERSION AS OF the first snapshot
    assert io.read_table(["tt"], "t", snapshot_id=snap1).count() == 2
    md = io.client.load_table(["tt"], "t")["metadata"]
    assert len(md["snapshots"]) == 2
    assert len(md["snapshot-log"]) == 2
    assert md["snapshots"][1]["parent-snapshot-id"] == snap1


def test_timestamp_as_of(spark, io):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    io.write_table(df1, ["tt"], "ts")
    md = io.client.load_table(["tt"], "ts")["metadata"]
    t1 = md["snapshot-log"][-1]["timestamp-ms"]
    io.write_table(df2, ["tt"], "ts")
    md = io.client.load_table(["tt"], "ts")["metadata"]
    t2 = md["snapshot-log"][-1]["timestamp-ms"]

    # TIMESTAMP AS OF each commit time, and in-between times floor backward
    assert io.read_table(["tt"], "ts", as_of_ms=t1).count() == 1
    assert io.read_table(["tt"], "ts", as_of_ms=t2).count() == 2
    assert io.read_table(["tt"], "ts", as_of_ms=t2 + 10_000).count() == 2
    if t2 > t1 + 1:
        assert io.read_table(["tt"], "ts", as_of_ms=t2 - 1).count() == 1
    with pytest.raises(ValueError, match="no snapshot"):
        io.read_table(["tt"], "ts", as_of_ms=t1 - 1)


def test_overwrite_replaces(spark, io):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(9, "z")], "id long, v string")
    io.write_table(df1, ["ow"], "t")
    io.write_table(df2, ["ow"], "t", mode="overwrite")
    rows = io.read_table(["ow"], "t").collect()
    assert [(r.id, r.v) for r in rows] == [(9, "z")]


def test_empty_table_read(spark, io):
    io.client.create_namespace(["empty"])
    io.client.create_table(
        ["empty"], "t",
        {"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"}]},
    )
    df = io.read_table(["empty"], "t")
    assert df.count() == 0
    assert df.columns == ["id", "v"]


def test_register_parquet_zero_copy(spark, io):
    """Adopt the sf0.001 lineitem parquet without copying, then query it
    through the catalog and compare against a direct read."""
    path = f"{SF_SMOKE}/lineitem.parquet"
    io.register_parquet_table(["tpch"], "lineitem", path)
    via_catalog = io.read_table(["tpch"], "lineitem")
    direct = spark.read.parquet(path)
    assert via_catalog.count() == direct.count()
    a = via_catalog.groupBy("l_returnflag").count().collect()
    b = direct.groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stale_base_commit_retries(spark, io):
    """A writer holding a stale snapshot ref must refresh-and-retry (the
    409 path) and still commit without losing the other writer's rows."""
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    io.write_table(df1, ["race"], "t")

    # Simulate a lost CAS race: another writer commits between our load and
    # commit. We monkeypatch load_table to return a stale metadata once.
    real_load = io.client.load_table
    stale = real_load(["race"], "t")

    other = spark.createDataFrame([(2, "b")], "id long, v string")
    io.write_table(other, ["race"], "t")  # moves main forward

    calls = {"n": 0}

    def flaky_load(ns, name):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale  # first read returns the stale view
        return real_load(ns, name)

    io.client.load_table = flaky_load
    try:
        df3 = spark.createDataFrame([(3, "c")], "id long, v string")
        io.write_table(df3, ["race"], "t")
    finally:
        io.client.load_table = real_load
    assert io.read_table(["race"], "t").count() == 3


def test_view_roundtrip_executes_sql(spark, io):
    spark.range(5).createOrReplaceTempView("numbers_vw_src")
    io.create_view(["analytics"], "evens",
                   "SELECT id FROM numbers_vw_src WHERE id % 2 = 0")
    out = io.read_view(["analytics"], "evens").collect()
    assert sorted(r.id for r in out) == [0, 2, 4]


def test_schema_preserved_through_catalog(spark, io):
    df = spark.createDataFrame(
        [(1, 1.5, "x", True)], "a long, b double, c string, d boolean"
    )
    io.write_table(df, ["sch"], "t")
    md = io.client.load_table(["sch"], "t")["metadata"]
    fields = {f["name"]: f["type"] for f in md["schemas"][0]["fields"]}
    assert fields == {"a": "long", "b": "double", "c": "string", "d": "boolean"}
    back = io.read_table(["sch"], "t")
    assert dict(back.dtypes) == {"a": "bigint", "b": "double", "c": "string",
                                 "d": "boolean"}


def test_write_audit_publish(spark, io):
    """WAP flow: stage on a branch, audit, fast-forward main — main readers
    never see unvalidated data; publish is one atomic metadata commit."""
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    io.write_table(df1, ["wap"], "t")
    io.create_branch(["wap"], "t", "audit")
    io.create_tag(["wap"], "t", "v1.0")

    staged = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
    io.write_table(staged, ["wap"], "t", branch="audit")

    # main untouched; branch sees staged rows; tag pinned at 2
    assert io.read_table(["wap"], "t").count() == 2
    assert io.read_table(["wap"], "t", ref="audit").count() == 4
    assert io.read_table(["wap"], "t", ref="v1.0").count() == 2

    # audit passes → publish
    io.publish_branch(["wap"], "t", "audit")
    assert io.read_table(["wap"], "t").count() == 4
    # tag still time-pinned after publish
    assert io.read_table(["wap"], "t", ref="v1.0").count() == 2

    io.drop_ref(["wap"], "t", "audit")
    with pytest.raises(ValueError, match="not found"):
        io.read_table(["wap"], "t", ref="audit")


def test_branch_write_requires_existing_branch(spark, io):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    io.write_table(df, ["wap"], "t2")
    with pytest.raises(ValueError, match="create_branch"):
        io.write_table(df, ["wap"], "t2", branch="nope")


def test_create_ref_conflicts_if_exists(spark, io):
    from denali_spark.catalog.client import CatalogHTTPError

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    io.write_table(df, ["wap"], "t3")
    io.create_branch(["wap"], "t3", "b1")
    with pytest.raises(CatalogHTTPError) as exc:
        io.create_branch(["wap"], "t3", "b1")
    assert exc.value.status == 409


def test_read_posts_scan_report(spark, io):
    """report_metrics=True fires the Iceberg REST scan report after
    planning (the reference accepts + discards; ours does too, 204)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 10).select("id", (F.col("id") * 2).alias("v"))
    io.write_table(df, ["mx"], "t")
    assert io.read_table(["mx"], "t", report_metrics=True).count() == 10
    # direct endpoint parity: a bare report is accepted with 204
    io.client.report_metrics(["mx"], "t", {"report-type": "scan-report"})


# --- rollback & cherry-pick (round 5) --------------------------------------


def test_rollback_to_snapshot(spark, io):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    snap1 = io.write_table(df1, ["rb"], "t")["metadata"]["current-snapshot-id"]
    io.write_table(df2, ["rb"], "t")
    assert io.read_table(["rb"], "t").count() == 2

    io.rollback_to_snapshot(["rb"], "t", snap1)
    assert io.read_table(["rb"], "t").count() == 1
    # nothing expired: the rolled-past snapshot stays readable by id, and
    # rolling forward again is just another rollback-shaped ref move denied
    md = io.client.load_table(["rb"], "t")["metadata"]
    assert len(md["snapshots"]) == 2


def test_rollback_refuses_non_ancestor(spark, io):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    io.write_table(df1, ["rb"], "t2")
    io.create_branch(["rb"], "t2", "side")
    side_snap = io.write_table(df2, ["rb"], "t2", branch="side")[
        "metadata"]["refs"]["side"]["snapshot-id"]
    with pytest.raises(ValueError, match="not an ancestor"):
        io.rollback_to_snapshot(["rb"], "t2", side_snap)


def test_cherry_pick_diverged_branch(spark, io):
    """WAP branch diverges from main (main moved on) → fast-forward publish
    would drop main's commit; cherry-pick applies the branch append on top
    so ALL rows survive."""
    a = spark.createDataFrame([(1, "a")], "id long, v string")
    b = spark.createDataFrame([(2, "b")], "id long, v string")
    c = spark.createDataFrame([(3, "c")], "id long, v string")
    io.write_table(a, ["cp"], "t")
    io.create_branch(["cp"], "t", "audit")
    io.write_table(b, ["cp"], "t")  # main moves on
    staged = io.write_table(c, ["cp"], "t", branch="audit")[
        "metadata"]["refs"]["audit"]["snapshot-id"]

    io.cherry_pick_snapshot(["cp"], "t", staged)
    got = sorted(r.v for r in io.read_table(["cp"], "t").collect())
    assert got == ["a", "b", "c"]
    md = io.client.load_table(["cp"], "t")["metadata"]
    head = next(s for s in md["snapshots"]
                if s["snapshot-id"] == md["refs"]["main"]["snapshot-id"])
    assert head["summary"]["source-snapshot-id"] == str(staged)
    # re-applying the same pick is rejected, not silently duplicated
    with pytest.raises(ValueError, match="already"):
        io.cherry_pick_snapshot(["cp"], "t", staged)


def test_cherry_pick_rejects_non_append(spark, io):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    io.write_table(df1, ["cp"], "t3")
    io.create_branch(["cp"], "t3", "side")
    ow = io.write_table(df2, ["cp"], "t3", mode="overwrite", branch="side")[
        "metadata"]["refs"]["side"]["snapshot-id"]
    with pytest.raises(NotImplementedError, match="append"):
        io.cherry_pick_snapshot(["cp"], "t3", ow)
