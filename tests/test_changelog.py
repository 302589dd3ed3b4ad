"""Changelog (CDC) read tests: inserts from appends, delete+insert pairs
from copy-on-write rewrites, merge-on-read delete deltas, overwrites, and
range/lineage error handling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import (
    SparkCatalogIO,
    delete_where,
    equality_delete,
    read_changes,
)
from denali_spark.sources import expressions as E


@pytest.fixture()
def io(spark, tmp_path):
    server = CatalogServer(make_state(str(tmp_path / "wh"))).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _append(spark, io, ns, name, lo, hi):
    df = spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")).coalesce(1)
    io.write_table(df, ns, name, mode="append")
    return io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]


def test_appends_are_inserts_with_ordinals(spark, io):
    ns, name = ["cdc"], "t"
    s1 = _append(spark, io, ns, name, 0, 10)
    s2 = _append(spark, io, ns, name, 10, 15)

    full = read_changes(io, ns, name).collect()
    assert len(full) == 15
    assert all(r._change_type == "insert" for r in full)
    by_snap = {}
    for r in full:
        by_snap.setdefault(r._commit_snapshot_id, []).append(r)
    assert {len(v) for v in by_snap.values()} == {10, 5}
    assert {r._change_ordinal for r in by_snap[s1]} == {0}
    assert {r._change_ordinal for r in by_snap[s2]} == {1}

    # incremental: only the second commit
    inc = read_changes(io, ns, name, from_snapshot_id=s1).collect()
    assert sorted(r.id for r in inc) == list(range(10, 15))
    assert {r._commit_snapshot_id for r in inc} == {s2}
    assert {r._change_ordinal for r in inc} == {0}


def test_cow_delete_emits_delete_and_rewrite_insert(spark, io):
    ns, name = ["cdc"], "cow"
    _append(spark, io, ns, name, 0, 10)
    s1 = _append(spark, io, ns, name, 10, 20)
    delete_where(io, ns, name, E.lt("id", 5))

    ch = read_changes(io, ns, name, from_snapshot_id=s1).collect()
    dels = sorted(r.id for r in ch if r._change_type == "delete")
    ins = sorted(r.id for r in ch if r._change_type == "insert")
    # the whole first file is reported deleted; survivors re-inserted
    assert dels == list(range(0, 10))
    assert ins == list(range(5, 10))
    # net view equals the table state change
    assert sorted(r.id for r in io.read_table(ns, name).collect()) == list(range(5, 20))


def test_mor_delete_emits_only_vanished_rows(spark, io):
    ns, name = ["cdc"], "mor"
    _append(spark, io, ns, name, 0, 10)
    s1 = _append(spark, io, ns, name, 10, 20)
    keys = spark.createDataFrame([(3,), (12,)], "id long")
    equality_delete(io, ns, name, keys, on=["id"])

    ch = read_changes(io, ns, name, from_snapshot_id=s1).collect()
    assert sorted((r._change_type, r.id) for r in ch) == [("delete", 3), ("delete", 12)]


def test_overwrite_reports_full_swap(spark, io):
    ns, name = ["cdc"], "ow"
    _append(spark, io, ns, name, 0, 5)
    s1 = io.client.load_table(ns, name)["metadata"]["current-snapshot-id"]
    io.write_table(
        spark.range(100, 103).select("id", (F.col("id") * 2).alias("v")),
        ns, name, mode="overwrite",
    )
    ch = read_changes(io, ns, name, from_snapshot_id=s1).collect()
    assert sorted(r.id for r in ch if r._change_type == "delete") == [0, 1, 2, 3, 4]
    assert sorted(r.id for r in ch if r._change_type == "insert") == [100, 101, 102]


def test_changelog_errors(spark, io):
    ns, name = ["cdc"], "err"
    io.client.create_namespace(ns)
    io.client.create_table(
        ns, name,
        {"type": "struct", "schema-id": 0,
         "fields": [{"id": 1, "name": "id", "type": "long", "required": False},
                    {"id": 2, "name": "v", "type": "long", "required": False}]},
    )
    with pytest.raises(ValueError, match="no snapshots"):
        read_changes(io, ns, name)
    _append(spark, io, ns, name, 0, 3)
    with pytest.raises(ValueError, match="not an ancestor|not found"):
        read_changes(io, ns, name, from_snapshot_id=123456789)


def test_empty_range_from_equals_to(spark, io):
    ns, name = ["cdc"], "same"
    s1 = _append(spark, io, ns, name, 0, 4)
    df = read_changes(io, ns, name, from_snapshot_id=s1, to_snapshot_id=s1)
    assert df.count() == 0
    assert {"_change_type", "_change_ordinal", "_commit_snapshot_id"} <= set(df.columns)


def test_changelog_replay_reconstructs_state(spark, io):
    """Replay property: over any commit sequence, inserts ⊖ deletes
    (multiset difference, matching exceptAll semantics) == final table
    state. Exercises appends, CoW delete, MoR equality delete, and a
    partial overwrite in one lineage."""
    import random

    rng = random.Random(7)
    ns, name = ["cdc"], "replay"
    lo = 0
    for step in range(8):
        op = rng.choice(["append", "append", "cow", "mor"])
        if op == "append" or lo == 0:
            _append(spark, io, ns, name, lo, lo + rng.randint(3, 8))
            lo += 20
        elif op == "cow":
            bound = rng.randint(1, lo)
            delete_where(io, ns, name, E.and_(E.gt_eq("id", bound - 3), E.lt("id", bound)))
        else:
            present = [r.id for r in io.read_table(ns, name).collect()]
            if present:
                keys = spark.createDataFrame(
                    [(int(k),) for k in rng.sample(present, min(2, len(present)))],
                    "id long",
                )
                equality_delete(io, ns, name, keys, on=["id"])

    ch = read_changes(io, ns, name)
    ins = ch.where("_change_type = 'insert'").select("id", "v")
    dels = ch.where("_change_type = 'delete'").select("id", "v")
    replayed = sorted((r.id, r.v) for r in ins.exceptAll(dels).collect())
    state = sorted((r.id, r.v) for r in io.read_table(ns, name).collect())
    assert replayed == state and state  # non-vacuous


def test_mor_candidate_pruning_is_metadata_only():
    """One targeted delete must not pull every carried file into the
    before/after diff: sequence and stats pruning confine the candidates."""
    from denali_spark.sources.changelog import _mor_candidates

    fa = {"path": "/d/a.parquet", "sequence-number": 1,
          "stats": {"id": {"min": 0, "max": 9}}}
    fb = {"path": "/d/b.parquet", "sequence-number": 1,
          "stats": {"id": {"min": 10, "max": 19}}}
    fc = {"path": "/d/c.parquet", "sequence-number": 6,
          "stats": {"id": {"min": 0, "max": 99}}}
    eq = {"path": "/d/eq.parquet", "content": "equality-deletes",
          "sequence-number": 5, "equality-columns": ["id"],
          "stats": {"id": {"min": 3, "max": 3}}}
    # eq delete on id=3: touches a (range overlap), not b (disjoint range),
    # not c (appended AFTER the delete's sequence number)
    assert [e["path"] for e in _mor_candidates([fa, fb, fc], [eq])] == ["/d/a.parquet"]

    pos = {"path": "/d/pd.parquet", "content": "position-deletes",
           "sequence-number": 5,
           "stats": {"file_path": {"min": "/d/b.parquet", "max": "/d/b.parquet"}}}
    assert [e["path"] for e in _mor_candidates([fa, fb, fc], [pos])] == ["/d/b.parquet"]

    # missing stats: conservative — everything stays a candidate
    blind = {"path": "/d/pd2.parquet", "content": "position-deletes",
             "sequence-number": 5}
    assert len(_mor_candidates([fa, fb, fc], [blind])) == 3


def test_mor_candidate_pruning_null_keys_disable_ranges():
    """A NULL-keyed equality delete matches NULL rows via eqNullSafe, which
    min/max ranges cannot see — pruning must keep every older file."""
    from denali_spark.sources.changelog import _mor_candidates

    fa = {"path": "/d/a.parquet", "sequence-number": 1,
          "stats": {"id": {"min": 100, "max": 200, "null-count": 3}}}
    fb = {"path": "/d/b.parquet", "sequence-number": 1,
          "stats": {"id": {"min": 10, "max": 19, "null-count": 0}}}
    eq_null = {"path": "/d/eqn.parquet", "content": "equality-deletes",
               "sequence-number": 5, "equality-columns": ["id"],
               "stats": {"id": {"min": 5, "max": 5, "null-count": 1}}}
    assert {e["path"] for e in _mor_candidates([fa, fb], [eq_null])} == {
        "/d/a.parquet", "/d/b.parquet"
    }
