"""Per-ref snapshot retention (Iceberg RemoveSnapshots semantics):
branches keep ancestry per min-snapshots-to-keep / max-snapshot-age-ms,
non-main refs past max-ref-age-ms expire with their snapshots, and
set_ref_retention round-trips options without clobbering siblings.
`now_ms` is injected throughout so age math is deterministic."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import SparkCatalogIO, expire_snapshots


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _append(spark, io, ns, name, lo, hi):
    df = spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")).coalesce(1)
    io.write_table(df, ns, name, mode="append")
    return io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]


def _snap_ids(io, ns, name):
    md = io.client.load_table(ns, name)["metadata"]
    return {s["snapshot-id"] for s in md.get("snapshots", [])}, md


def test_branch_min_snapshots_to_keep_protects_ancestry(spark, io):
    ns, name = ["ret"], "minkeep"
    sids = [_append(spark, io, ns, name, i * 5, (i + 1) * 5) for i in range(5)]
    io.set_ref_retention(ns, name, "main", min_snapshots_to_keep=3)
    expire_snapshots(io, ns, name, keep_last=1, clean_manifests=False)
    alive, md = _snap_ids(io, ns, name)
    # newest 3 stay on main's ancestry; the 2 oldest expire
    assert alive == set(sids[2:])
    assert md["refs"]["main"]["min-snapshots-to-keep"] == 3


def test_branch_max_snapshot_age_protects_young_ancestors(spark, io):
    ns, name = ["ret"], "maxage"
    sids = [_append(spark, io, ns, name, i * 5, (i + 1) * 5) for i in range(4)]
    md = io.client.load_table(ns, name)["metadata"]
    ts = {s["snapshot-id"]: s["timestamp-ms"] for s in md["snapshots"]}
    # derive the cutoff from the REAL commit timestamps so the age test
    # discriminates regardless of how fast the appends ran: s2 must land
    # under max_age, s1 (one real commit gap older) over it
    gap = ts[sids[2]] - ts[sids[1]]
    if gap < 1:
        pytest.skip("commits landed in the same millisecond")
    now = ts[sids[2]] + 1_000
    max_age = 1_000 + gap // 2
    io.set_ref_retention(ns, name, "main", max_snapshot_age_ms=max_age)
    expire_snapshots(io, ns, name, keep_last=1, clean_manifests=False, now_ms=now)
    alive, _ = _snap_ids(io, ns, name)
    assert sids[3] in alive and sids[2] in alive  # head + young ancestor
    assert sids[0] not in alive and sids[1] not in alive


def test_aged_out_tag_expires_with_its_snapshot(spark, io):
    ns, name = ["ret"], "refage"
    s1 = _append(spark, io, ns, name, 0, 5)
    io.create_tag(ns, name, "release-1")
    io.set_ref_retention(ns, name, "release-1", max_ref_age_ms=10_000)
    s2 = _append(spark, io, ns, name, 5, 10)
    md = io.client.load_table(ns, name)["metadata"]
    t1 = next(s["timestamp-ms"] for s in md["snapshots"] if s["snapshot-id"] == s1)
    # young tag: protects its snapshot
    expire_snapshots(
        io, ns, name, keep_last=1, clean_manifests=False, now_ms=t1 + 5_000
    )
    alive, md = _snap_ids(io, ns, name)
    assert alive == {s1, s2} and "release-1" in md["refs"]
    # aged tag: removed, and s1 (protected only by it) expires in the
    # same commit
    expire_snapshots(
        io, ns, name, keep_last=1, clean_manifests=False, now_ms=t1 + 10_001
    )
    alive, md = _snap_ids(io, ns, name)
    assert alive == {s2} and "release-1" not in md["refs"]


def test_aged_tag_removal_alone_is_not_a_noop(spark, io):
    """A run where nothing is snapshot-expirable but a ref aged out must
    still commit the ref removal."""
    ns, name = ["ret"], "refonly"
    s1 = _append(spark, io, ns, name, 0, 5)
    io.create_tag(ns, name, "old-tag")
    io.set_ref_retention(ns, name, "old-tag", max_ref_age_ms=1_000)
    md = io.client.load_table(ns, name)["metadata"]
    t1 = next(s["timestamp-ms"] for s in md["snapshots"])
    out = expire_snapshots(
        io, ns, name, keep_last=1, clean_manifests=False, now_ms=t1 + 2_000
    )
    assert not out.get("noop")
    alive, md = _snap_ids(io, ns, name)
    # the snapshot survives (it is main's head) but the tag is gone
    assert alive == {s1} and "old-tag" not in md["refs"]


def test_refs_without_retention_keep_head_only_behavior(spark, io):
    """Backward compat: no retention options anywhere -> only ref heads
    are protected, exactly the pre-retention contract."""
    ns, name = ["ret"], "legacy"
    sids = [_append(spark, io, ns, name, i * 5, (i + 1) * 5) for i in range(3)]
    expire_snapshots(io, ns, name, keep_last=1, clean_manifests=False)
    alive, _ = _snap_ids(io, ns, name)
    assert alive == {sids[-1]}


def test_table_props_supply_branch_retention_defaults(spark, io):
    ns, name = ["ret"], "propdefaults"
    sids = [_append(spark, io, ns, name, i * 5, (i + 1) * 5) for i in range(4)]
    io.client.commit_table(
        ns, name, requirements=[],
        updates=[{
            "action": "set-properties",
            "updates": {"history.expire.min-snapshots-to-keep": "2"},
        }],
    )
    expire_snapshots(io, ns, name, keep_last=1, clean_manifests=False)
    alive, _ = _snap_ids(io, ns, name)
    assert alive == set(sids[2:])


def test_set_ref_retention_preserves_existing_options(spark, io):
    ns, name = ["ret"], "merge"
    _append(spark, io, ns, name, 0, 5)
    io.create_branch(ns, name, "dev")
    io.set_ref_retention(ns, name, "dev", min_snapshots_to_keep=4)
    io.set_ref_retention(ns, name, "dev", max_snapshot_age_ms=123_456)
    md = io.client.load_table(ns, name)["metadata"]
    ref = md["refs"]["dev"]
    assert ref["min-snapshots-to-keep"] == 4
    assert ref["max-snapshot-age-ms"] == 123_456
    assert ref["type"] == "branch"


def test_sql_create_branch_with_retention_clauses(spark, io):
    """Iceberg Spark SQL extension syntax: RETAIN + WITH SNAPSHOT
    RETENTION land as ref options and expire honors them."""
    ns, name = ["ret"], "sqlddl"
    _append(spark, io, ns, name, 0, 5)
    io.sql(
        f"ALTER TABLE {ns[0]}.{name} CREATE BRANCH audit "
        "RETAIN 30 DAYS WITH SNAPSHOT RETENTION 5 SNAPSHOTS 7 DAYS"
    )
    md = io.client.load_table(ns, name)["metadata"]
    ref = md["refs"]["audit"]
    assert ref["max-ref-age-ms"] == 30 * 86_400_000
    assert ref["min-snapshots-to-keep"] == 5
    assert ref["max-snapshot-age-ms"] == 7 * 86_400_000


def test_sql_create_tag_retain_hours(spark, io):
    ns, name = ["ret"], "sqltag"
    _append(spark, io, ns, name, 0, 5)
    io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE TAG nightly RETAIN 48 HOURS")
    md = io.client.load_table(ns, name)["metadata"]
    assert md["refs"]["nightly"]["max-ref-age-ms"] == 48 * 3_600_000
    # plain create still works with no retention attached
    io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE TAG plain")
    assert "max-ref-age-ms" not in io.client.load_table(ns, name)[
        "metadata"]["refs"]["plain"]


def test_refs_metadata_table_surfaces_retention(spark, io):
    """Iceberg's refs metadata table columns: retention policy rides
    along (null = unset)."""
    from denali_spark.sources import metadata_table

    ns, name = ["ret"], "refmeta"
    _append(spark, io, ns, name, 0, 5)
    io.sql(
        f"ALTER TABLE {ns[0]}.{name} CREATE BRANCH dev "
        "WITH SNAPSHOT RETENTION 4 SNAPSHOTS 2 DAYS"
    )
    rows = {r["name"]: r for r in metadata_table(io, ns, name, "refs").collect()}
    assert rows["dev"]["min_snapshots_to_keep"] == 4
    assert rows["dev"]["max_snapshot_age_in_ms"] == 2 * 86_400_000
    assert rows["dev"]["max_reference_age_in_ms"] is None
    assert rows["main"]["min_snapshots_to_keep"] is None


def test_ddl_rejects_retention_clauses_out_of_scope(spark, io):
    """r11-ADVICE-low regression: Iceberg's grammar scopes retention —
    DROP takes no clauses, and WITH SNAPSHOT RETENTION is branch-only
    (the ancestry walk never consults a tag's min-snapshots-to-keep).
    Both must raise instead of silently ignoring/storing dead options."""
    ns, name = ["ret"], "ddlscope"
    _append(spark, io, ns, name, 0, 5)
    io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE BRANCH dev")
    with pytest.raises(ValueError, match="takes no"):
        io.sql(f"ALTER TABLE {ns[0]}.{name} DROP BRANCH dev RETAIN 5 DAYS")
    with pytest.raises(ValueError, match="branches only"):
        io.sql(
            f"ALTER TABLE {ns[0]}.{name} CREATE TAG t1 "
            "WITH SNAPSHOT RETENTION 3 SNAPSHOTS"
        )
    # the rejected statements must not have mutated refs
    md = io.client.load_table(ns, name)["metadata"]
    assert "dev" in md["refs"] and "t1" not in md["refs"]
    # the legal shapes still work
    io.sql(f"ALTER TABLE {ns[0]}.{name} CREATE TAG t1 RETAIN 2 DAYS")
    io.sql(f"ALTER TABLE {ns[0]}.{name} DROP BRANCH dev")
    md = io.client.load_table(ns, name)["metadata"]
    assert "t1" in md["refs"] and "dev" not in md["refs"]
