"""Incremental append scans + orphan-file cleanup (the two standard
Iceberg procedures a polling pipeline and a janitor job run)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import (
    SparkCatalogIO,
    delete_where,
    expire_snapshots,
    read_incremental,
    remove_orphan_files,
)
from denali_spark.sources import expressions as E
from denali_spark.sources.catalog_io import split_entries


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _append(spark, io, ns, name, lo, hi):
    df = spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")).coalesce(1)
    io.write_table(df, ns, name, mode="append")
    return io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]


# --- incremental reads ------------------------------------------------------


def test_incremental_reads_only_new_rows(spark, io):
    ns, name = ["inc"], "t"
    s1 = _append(spark, io, ns, name, 0, 10)
    s2 = _append(spark, io, ns, name, 10, 25)
    s3 = _append(spark, io, ns, name, 25, 30)
    got = {r["id"] for r in read_incremental(io, ns, name, s1).collect()}
    assert got == set(range(10, 30))
    got = {r["id"] for r in read_incremental(io, ns, name, s1, s2).collect()}
    assert got == set(range(10, 25))
    # since-creation and empty range
    assert read_incremental(io, ns, name, None, s1).count() == 10
    assert read_incremental(io, ns, name, s3, s3).count() == 0


def test_incremental_rejects_non_append_ranges(spark, io):
    ns, name = ["inc"], "t2"
    s1 = _append(spark, io, ns, name, 0, 10)
    delete_where(io, ns, name, E.lt("id", 3))  # copy-on-write delete
    _append(spark, io, ns, name, 10, 20)
    with pytest.raises(ValueError, match="non-append"):
        read_incremental(io, ns, name, s1)


def test_incremental_unrelated_snapshot_errors(spark, io):
    ns, name = ["inc"], "t3"
    _append(spark, io, ns, name, 0, 10)
    with pytest.raises(ValueError, match="not found|not an ancestor"):
        read_incremental(io, ns, name, 123456789)


# --- orphan cleanup ---------------------------------------------------------


def _live_paths(io, ns, name):
    md = io.client.load_table(ns, name)["metadata"]
    snap = io._resolve_snapshot(md)
    data, deletes = split_entries(io._manifest_entries(snap["manifest-list"]))
    return [e["path"] for e in data + deletes]


def _future_ms():
    import time

    return int(time.time() * 1000) + 60_000


def test_orphans_from_uncommitted_write_are_removed(spark, io):
    ns, name = ["orph"], "t"
    _append(spark, io, ns, name, 0, 10)
    md = io.client.load_table(ns, name)["metadata"]
    # simulate a failed commit: data files written, commit never happened
    df = spark.range(100, 110).select("id", (F.col("id") * 2).alias("v"))
    orphans = [e["path"] for e in io._write_data_files(df, md["location"])]
    assert all(os.path.exists(p) for p in orphans)
    report = remove_orphan_files(io, ns, name, older_than_ms=_future_ms(), force=True)
    assert set(report["removed"]) == set(orphans)
    assert all(not os.path.exists(p) for p in orphans)
    # live data untouched, table still reads
    assert all(os.path.exists(p) for p in _live_paths(io, ns, name))
    assert io.read_table(ns, name).count() == 10


def test_default_args_never_touch_inflight_writes(spark, io):
    """Regression (round-3 VERDICT / round-2 ADVICE medium): a default-args
    remove_orphan_files must keep the files of an in-flight uncommitted
    write. The default cutoff is now − 3 days, so anything written recently
    survives; an explicit cutoff in the future requires force=True."""
    ns, name = ["orph"], "t_inflight"
    _append(spark, io, ns, name, 0, 5)
    md = io.client.load_table(ns, name)["metadata"]
    df = spark.range(90, 95).select("id", (F.col("id") * 2).alias("v"))
    inflight = [e["path"] for e in io._write_data_files(df, md["location"])]
    report = remove_orphan_files(io, ns, name)  # default args = safe
    assert report["removed"] == []
    assert all(os.path.exists(p) for p in inflight)
    with pytest.raises(ValueError, match="in-flight"):
        remove_orphan_files(io, ns, name, older_than_ms=_future_ms())
    assert all(os.path.exists(p) for p in inflight)


def test_dry_run_and_freshness_guard(spark, io):
    ns, name = ["orph"], "t2"
    _append(spark, io, ns, name, 0, 5)
    md = io.client.load_table(ns, name)["metadata"]
    df = spark.range(50, 55).select("id", (F.col("id") * 2).alias("v"))
    orphans = [e["path"] for e in io._write_data_files(df, md["location"])]
    # dry run reports but deletes nothing
    report = remove_orphan_files(io, ns, name, older_than_ms=_future_ms(), force=True, dry_run=True)
    assert set(report["removed"]) == set(orphans)
    assert all(os.path.exists(p) for p in orphans)
    # freshness guard: cutoff in the past → just-written orphans are kept
    report = remove_orphan_files(io, ns, name, older_than_ms=1)
    assert report["removed"] == []
    assert all(os.path.exists(p) for p in orphans)


def test_expire_then_cleanup_reclaims_rewritten_files(spark, io):
    """The full janitor cycle: a CoW delete rewrites files (old ones stay
    referenced by the old snapshot), expire_snapshots drops that snapshot,
    and cleanup reclaims the now-unreferenced originals."""
    ns, name = ["orph"], "t3"
    _append(spark, io, ns, name, 0, 20)
    before = set(_live_paths(io, ns, name))
    delete_where(io, ns, name, E.lt("id", 5))
    after = set(_live_paths(io, ns, name))
    rewritten = before - after
    assert rewritten  # the delete rewrote at least one file
    # still referenced by the pre-delete snapshot → cleanup keeps them
    assert remove_orphan_files(io, ns, name, older_than_ms=_future_ms(), force=True)["removed"] == []
    expire_snapshots(io, ns, name, keep_last=1)
    removed = set(remove_orphan_files(io, ns, name, older_than_ms=_future_ms(), force=True)["removed"])
    assert rewritten <= removed
    assert io.read_table(ns, name).count() == 15


def test_expire_snapshots_deletes_expired_manifest_files(spark, io):
    """Iceberg expire semantics: the expired snapshots' manifest-list and
    manifest files leave the disk (metadata growth is bounded); the live
    snapshot's manifests survive and the table still reads."""
    ns, name = ["orph"], "t_manifests"
    for i in range(3):
        _append(spark, io, ns, name, i * 10, (i + 1) * 10)
    md = io.client.load_table(ns, name)["metadata"]
    lists = {s["snapshot-id"]: s["manifest-list"] for s in md["snapshots"]}
    live_id = md["current-snapshot-id"]
    assert all(os.path.exists(p) for p in lists.values())
    expire_snapshots(io, ns, name, keep_last=1)
    for sid, p in lists.items():
        assert os.path.exists(p) == (sid == live_id), (sid, p)
    # the live manifest files referenced by the surviving list still exist
    for e in io._manifest_entries(lists[live_id]):
        assert os.path.exists(e["path"])
    assert io.read_table(ns, name).count() == 30


def test_orphan_manifests_from_failed_commit_are_removed(spark, io):
    """A failed commit stages its manifest list + manifests before the CAS;
    those metadata/ artifacts must be reclaimable like orphan data files —
    while live manifests and the metadata-log JSON versions are untouched."""
    ns, name = ["orph"], "t_failed_commit"
    _append(spark, io, ns, name, 0, 10)
    md = io.client.load_table(ns, name)["metadata"]
    data_files = io._write_data_files(
        spark.range(50, 60).select("id", (F.col("id") * 2).alias("v")), md["location"]
    )
    # stage the manifest set for a commit that never happens
    orphan_list = io._write_manifest_list(md, 999_999, data_files)
    orphan_manifests = [
        e["manifest_path"]
        for e in _manifest_file_records(orphan_list)
    ]
    live_list = io._resolve_snapshot(md)["manifest-list"]
    report = remove_orphan_files(io, ns, name, older_than_ms=_future_ms(), force=True)
    assert orphan_list in report["removed"]
    assert set(orphan_manifests) <= set(report["removed"])
    assert os.path.exists(live_list)
    # metadata-log versions untouched, table still reads
    assert io.read_table(ns, name).count() == 10
    assert io.client.load_table(ns, name)["metadata"]["metadata-log"]


def _manifest_file_records(list_path):
    from denali_spark.sources.avro_ocf import read_ocf

    schema, rows = read_ocf(list_path)
    names = [f["name"] for f in schema["fields"]]
    return [dict(zip(names, r)) for r in rows]


def test_expire_is_ref_protected_against_concurrent_tag(spark, io, monkeypatch):
    """Round-4 ADVICE (medium): a tag created between the expirer's load
    and its commit must not lose its snapshot's manifest files. The first
    expire commit races a concurrent tag onto an expiring snapshot; the
    server's ref-protected remove-snapshots 409s it, expire recomputes
    against fresh metadata, and the tagged snapshot + manifests survive
    while the untagged ancestor still expires."""
    from denali_spark.catalog.metadata import _fs_path

    ns, name = ["exp"], "t_ref_race"
    s1 = _append(spark, io, ns, name, 0, 10)
    s2 = _append(spark, io, ns, name, 10, 20)
    s3 = _append(spark, io, ns, name, 20, 30)
    md = io.client.load_table(ns, name)["metadata"]
    lists = {s["snapshot-id"]: _fs_path(s["manifest-list"]) for s in md["snapshots"]}

    real_commit = io.client.commit_table
    fired = {"done": False}

    def racing_commit(levels, name_, requirements, updates):
        if not fired["done"] and any(
            u.get("action") == "remove-snapshots" for u in updates
        ):
            fired["done"] = True
            # concurrent client tags an expiring snapshot AFTER our load
            real_commit(
                levels, name_, requirements=[],
                updates=[{"action": "set-snapshot-ref", "ref-name": "keep",
                          "snapshot-id": s1, "type": "tag"}],
            )
        return real_commit(levels, name_, requirements, updates)

    monkeypatch.setattr(io.client, "commit_table", racing_commit)
    expire_snapshots(io, ns, name, keep_last=1)

    md = io.client.load_table(ns, name)["metadata"]
    ids = {s["snapshot-id"] for s in md["snapshots"]}
    assert s1 in ids and s3 in ids and s2 not in ids
    # the tagged snapshot's manifest list survived the cleanup; the
    # expired one is gone
    assert os.path.exists(lists[s1])
    assert not os.path.exists(lists[s2])
    assert io.read_table(ns, name, ref="keep").count() == 10


def test_remove_snapshots_refuses_referenced_snapshot(spark, io):
    """Server-side guard: remove-snapshots dropping a snapshot a ref points
    at is a 409 even when every pinned requirement passes."""
    from denali_spark.sources.catalog_io import CatalogHTTPError

    ns, name = ["exp"], "t_guard"
    s1 = _append(spark, io, ns, name, 0, 5)
    with pytest.raises(CatalogHTTPError) as exc:
        io.client.commit_table(
            ns, name, requirements=[],
            updates=[{"action": "remove-snapshots", "snapshot-ids": [s1]}],
        )
    assert exc.value.status == 409
