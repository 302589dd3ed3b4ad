"""Metadata-table (table inspection) tests: the `tbl.snapshots` /
`tbl.files` / ... surface over catalog tables — schemas, row content,
time travel, delete-file visibility, and partition tallies."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import SparkCatalogIO, equality_delete, metadata_table


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _two_appends(spark, io, ns="meta", name="t"):
    for k in range(2):
        df = spark.range(k * 10, (k + 1) * 10).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("grp"),
        ).coalesce(1)
        io.write_table(df, [ns], name, mode="append")
    return [ns], name


def test_snapshots_and_history(spark, io):
    ns, name = _two_appends(spark, io)
    snaps = metadata_table(io, ns, name, "snapshots").orderBy("committed_at").collect()
    assert len(snaps) == 2
    assert snaps[0].parent_id is None
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert all(s.operation in ("append", "overwrite") for s in snaps)
    assert all(s.manifest_list for s in snaps)
    assert all("operation" in s.summary for s in snaps)

    hist = metadata_table(io, ns, name, "history").orderBy("made_current_at").collect()
    assert [h.snapshot_id for h in hist] == [s.snapshot_id for s in snaps]
    assert all(h.is_current_ancestor is True for h in hist)


def test_history_marks_rolled_back_snapshot_non_ancestor(spark, io):
    ns, name = _two_appends(spark, io)
    snaps = metadata_table(io, ns, name, "snapshots").orderBy("committed_at").collect()
    io.rollback_to_snapshot(ns, name, snaps[0].snapshot_id)
    hist = {
        h.snapshot_id: h.is_current_ancestor
        for h in metadata_table(io, ns, name, "history").collect()
    }
    assert hist[snaps[0].snapshot_id] is True
    assert hist[snaps[1].snapshot_id] is False


def test_refs_lists_branches_and_tags(spark, io):
    ns, name = _two_appends(spark, io)
    io.create_branch(ns, name, "audit")
    io.create_tag(ns, name, "v1")
    refs = {r.name: r for r in metadata_table(io, ns, name, "refs").collect()}
    assert refs["main"].type == "BRANCH"
    assert refs["audit"].type == "BRANCH"
    assert refs["v1"].type == "TAG"
    assert refs["v1"].snapshot_id == refs["main"].snapshot_id


def test_manifests_split_data_and_deletes(spark, io):
    ns, name = _two_appends(spark, io)
    keys = spark.createDataFrame([(3,)], "id long")
    equality_delete(io, ns, name, keys, on=["id"])
    mf = metadata_table(io, ns, name, "manifests").collect()
    contents = sorted(m.content for m in mf)
    assert 0 in contents and 1 in contents
    assert all(m.length > 0 and m.added_snapshot_id for m in mf)


def test_files_and_entries_shapes(spark, io):
    ns, name = _two_appends(spark, io)
    files = metadata_table(io, ns, name, "files").collect()
    assert len(files) == 2  # one coalesced file per append
    total = sum(f.record_count for f in files)
    assert total == 20
    f0 = files[0]
    assert f0.file_format == "PARQUET"
    assert f0.file_size_in_bytes > 0
    assert "id" in f0.lower_bounds and "id" in f0.upper_bounds
    assert f0.null_value_counts["id"] == 0

    entries = metadata_table(io, ns, name, "entries").collect()
    assert {e.data_file.file_path for e in entries} == {f.file_path for f in files}
    assert all(e.status == 1 for e in entries)
    assert all(e.snapshot_id is not None for e in entries)


def test_delete_files_kind(spark, io):
    ns, name = _two_appends(spark, io)
    keys = spark.createDataFrame([(3,), (12,)], "id long")
    equality_delete(io, ns, name, keys, on=["id"])
    dfiles = metadata_table(io, ns, name, "delete_files").collect()
    assert len(dfiles) == 1
    assert dfiles[0].content == 2  # equality deletes
    assert dfiles[0].equality_ids  # field ids recorded
    datafiles = metadata_table(io, ns, name, "data_files").collect()
    assert all(f.content == 0 for f in datafiles)
    assert len(datafiles) == 2


def test_partitions_tallies(spark, io):
    df = spark.range(0, 30).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    io.write_table(df, ["meta"], "pt", mode="overwrite", partition_by=["grp"])
    parts = {
        tuple(sorted(p.partition.items())): p
        for p in metadata_table(io, ["meta"], "pt", "partitions").collect()
    }
    assert len(parts) == 3
    for p in parts.values():
        assert p.record_count == 10
        assert p.file_count >= 1
        assert p.delete_file_count == 0
        assert p.total_data_file_size_in_bytes > 0


def test_files_time_travel(spark, io):
    ns, name = _two_appends(spark, io)
    first = (
        metadata_table(io, ns, name, "snapshots")
        .orderBy("committed_at").first().snapshot_id
    )
    old = metadata_table(io, ns, name, "files", snapshot_id=first).collect()
    assert len(old) == 1 and old[0].record_count == 10
    io.create_tag(ns, name, "t0")  # ref-addressed inspection
    by_ref = metadata_table(io, ns, name, "files", ref="main").collect()
    assert len(by_ref) == 2


def test_all_manifests_and_all_files_cover_history(spark, io):
    ns, name = _two_appends(spark, io)
    io.write_table(
        spark.range(100, 105).select(
            F.col("id"), F.lit("x").alias("grp")
        ),
        ns, name, mode="overwrite",
    )
    snaps = metadata_table(io, ns, name, "snapshots").collect()
    am = metadata_table(io, ns, name, "all_manifests").collect()
    assert {m.reference_snapshot_id for m in am} == {s.snapshot_id for s in snaps}
    all_paths = {f.file_path for f in metadata_table(io, ns, name, "all_files").collect()}
    cur_paths = {f.file_path for f in metadata_table(io, ns, name, "files").collect()}
    # overwrite replaced the data; history still reaches the old files
    assert cur_paths < all_paths


def test_metadata_log_and_empty_table(spark, io):
    ns, name = _two_appends(spark, io)
    log = metadata_table(io, ns, name, "metadata_log_entries").collect()
    assert len(log) >= 2
    assert log[-1].latest_snapshot_id is not None

    io.client.create_table(
        ["meta"], "empty",
        {"type": "struct", "schema-id": 0,
         "fields": [{"id": 1, "name": "id", "type": "long", "required": False}]},
    )
    for kind in ("files", "partitions", "manifests", "entries"):
        assert metadata_table(io, ["meta"], "empty", kind).count() == 0

    with pytest.raises(ValueError):
        metadata_table(io, ns, name, "nope")


def test_files_table_over_typed_partition_manifests(spark, io):
    """The files/entries metadata tables must decode manifests written with
    the typed r102 partition struct (regression: the second manifest reader
    missed the partition_typed flag and crashed in json.loads)."""
    from pyspark.sql import functions as F

    from denali_spark.sources.metadata_tables import metadata_table

    df = spark.range(0, 60).select(
        "id", (F.col("id") % 4).cast("int").alias("k"),
        F.to_timestamp(F.lit("2024-03-05 10:00:00")).alias("ts"),
    )
    io.write_table(
        df, ["mtp"], "t", mode="overwrite",
        partition_by=[("k", "bucket[4]"), ("ts", "month")],
    )
    files = metadata_table(io, ["mtp"], "t", "files")
    rows = files.collect()
    assert rows
    import json

    for r in rows:
        part = r["partition"]  # map<string,string>: values JSON-encoded
        assert set(part.keys()) == {"k_bucket", "ts_month"}
        assert json.loads(part["ts_month"]) == "2024-03"
        assert isinstance(json.loads(part["k_bucket"]), str)
        assert json.loads(part["k_bucket"]).isdigit()


def test_snapshot_summaries_carry_totals(spark, io):
    """Every commit stamps Iceberg's total-* summary properties derived
    from the snapshot's full entry set."""
    from pyspark.sql import functions as F

    from denali_spark.sources import delete_where_mor
    from denali_spark.sources import expressions as E

    ns = ["tot"]
    for k in range(2):
        io.write_table(
            spark.range(k * 10, (k + 1) * 10).select("id").coalesce(1),
            ns, "t", mode="append",
        )
    delete_where_mor(io, ns, "t", E.lt("id", 3))
    md = io.client.load_table(ns, "t")["metadata"]
    snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
    s_append, s_del = snaps[1]["summary"], snaps[2]["summary"]
    assert s_append["total-data-files"] == "2"
    assert s_append["total-records"] == "20"
    assert s_append["total-delete-files"] == "0"
    assert s_del["total-data-files"] == "2"
    assert s_del["total-delete-files"] == "1"
    assert int(s_append["total-files-size"]) > 0

def test_all_entries_and_content_splits(spark, io):
    """all_entries keeps entry status across every snapshot's manifests;
    all_data_files / all_delete_files split all_files by content."""
    ns, name = _two_appends(spark, io, name="alle")
    keys = spark.createDataFrame([(3,)], "id long")
    equality_delete(io, ns, name, keys, on=["id"])
    entries = metadata_table(io, ns, name, "all_entries").collect()
    assert {e.status for e in entries} <= {0, 1, 2}
    assert len(entries) >= 3  # 2 data appends + 1 delete, plus carried rows
    adf = metadata_table(io, ns, name, "all_data_files").collect()
    addel = metadata_table(io, ns, name, "all_delete_files").collect()
    # all_* kinds may repeat a file once per snapshot whose manifests list
    # it (Iceberg documents the same duplicate-row caveat) — assert on the
    # distinct file sets
    assert all(f.content == 0 for f in adf)
    assert len({f.file_path for f in adf}) == 2
    assert all(f.content != 0 for f in addel)
    assert len({f.file_path for f in addel}) == 1


def test_position_deletes_table(spark, io):
    """position_deletes surfaces (file_path, pos, delete_file_path) rows
    decoded from V3 deletion vectors (and V2 positional parquet when
    present); equality deletes are out of scope for this kind."""
    from denali_spark.sources import expressions as E
    from denali_spark.sources.mor import delete_where_dv

    df = spark.range(0, 20).select("id").coalesce(1)
    io.write_table(df, ["meta"], "pdel", mode="overwrite")
    # empty before any delete
    assert metadata_table(io, ["meta"], "pdel", "position_deletes").count() == 0
    delete_where_dv(
        io, ["meta"], "pdel", E.and_(E.gt_eq("id", 5), E.lt("id", 9))
    )
    rows = metadata_table(io, ["meta"], "pdel", "position_deletes").collect()
    assert sorted(r.pos for r in rows) == [5, 6, 7, 8]
    assert all(r.delete_file_path.endswith(".puffin") for r in rows)
    assert len({r.file_path for r in rows}) == 1
    # the surviving read agrees with the delete positions
    ids = [r.id for r in io.read_table(["meta"], "pdel").collect()]
    assert sorted(ids) == [i for i in range(20) if not (5 <= i < 9)]


def test_metrics_reports_round_trip(spark, io):
    """r10 verdict item 8: the metrics endpoint PERSISTS reports (the
    reference accepts-and-discards, routes/tables.go:432-435) and the
    `metrics_reports` relation surfaces them — a read with
    report_metrics=True makes planned-file counts queryable, and a
    posted CommitReport lands alongside."""
    ns, name = _two_appends(spark, io)
    # empty before any report
    assert metadata_table(io, ns, name, "metrics_reports").count() == 0

    io.read_table(ns, name, report_metrics=True).count()
    snap = io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]
    io.client.report_metrics(ns, name, {
        "report-type": "commit-report",
        "table-name": f"{ns[0]}.{name}",
        "snapshot-id": snap,
        "operation": "append",
        "metrics": {"added-data-files": {"unit": "count", "value": 3}},
    })

    rows = metadata_table(io, ns, name, "metrics_reports").orderBy(
        "received_at"
    ).collect()
    assert [r.report_type for r in rows] == ["scan-report", "commit-report"]
    scan, commit = rows
    # the scan report's planned-file count is queryable (2 appends = 2 files)
    assert scan.metrics["result-data-files"] == "2"
    assert scan.snapshot_id == snap
    assert commit.operation == "append"
    assert commit.metrics["added-data-files"] == "3"
    assert all(r.table_name == f"{ns[0]}.{name}" for r in rows)

    # SQL-addressable like every other metadata relation
    got = io.sql(
        f"SELECT report_type, metrics FROM {ns[0]}.{name}.metrics_reports"
    ).collect()
    assert {r.report_type for r in got} == {"scan-report", "commit-report"}
