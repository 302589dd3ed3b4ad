"""Generational-fold retention semantics (r10 verdict item 7): the fold
must give concurrent readers the same guarantee expired-snapshot
retention gives table readers — a reader holding the PREVIOUS
generation's DataFrames keeps working while the next fold commits, and
once a later fold prunes past ``keep_generations`` the stale reader
fails LOUDLY (missing files), never silently returning partial rows.
Also pins the crashed-fold temp-dir sweep."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from denali_spark.streaming.fold import (
    FoldRelation,
    fold_streamed_partitions,
    read_folded,
)


def _write_batch(spark, store_dir: str, batch_id: int, lo: int, hi: int):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch_id={batch_id}")
    )


def _rel(store_dir: str, spark) -> FoldRelation:
    return FoldRelation(
        name="rel",
        store_dir=store_dir,
        base=lambda: spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        columns=("k", "v"),
        num_files=2,
    )


def test_concurrent_reader_survives_one_fold_then_fails_loud(spark, tmp_path):
    root = str(tmp_path / "idx")
    store = str(tmp_path / "store")
    rel = _rel(store, spark)

    _write_batch(spark, store, 0, 10, 20)
    r1 = fold_streamed_partitions(spark, root, "corpus-A", [rel])
    assert r1 == {"generation": 1, "folded_batches": [0], "noop": False}

    # reader pinned to gen-1 (the DataFrame holds the gen-1 file listing)
    reader_gen1 = read_folded(spark, root, ("rel",))["rel"]
    assert reader_gen1.count() == 20

    # fold 2 commits while the gen-1 reader is live: retention
    # (keep_generations=2) keeps gen-1 on disk, so the stale reader
    # STILL returns its full, consistent snapshot — not gen-2's rows
    _write_batch(spark, store, 1, 20, 30)
    r2 = fold_streamed_partitions(spark, root, "corpus-A", [rel])
    assert r2["generation"] == 2
    assert reader_gen1.count() == 20
    assert read_folded(spark, root, ("rel",))["rel"].count() == 30

    reader_gen2 = read_folded(spark, root, ("rel",))["rel"]

    # fold 3 prunes gen-1 (beyond keep_generations): the gen-1 reader
    # must now fail loudly — missing files, never a silent subset
    _write_batch(spark, store, 2, 30, 40)
    r3 = fold_streamed_partitions(spark, root, "corpus-A", [rel])
    assert r3["generation"] == 3
    assert not os.path.isdir(os.path.join(root, "gen-1"))
    with pytest.raises(Exception) as exc:
        reader_gen1.count()
    assert "gen-1" in str(exc.value) or "FileNotFound" in str(exc.value) or (
        "PATH_NOT_FOUND" in str(exc.value)
    )
    # gen-2 (inside retention) still reads; current gen has all rows
    assert reader_gen2.count() == 30
    assert read_folded(spark, root, ("rel",))["rel"].count() == 40


def test_stale_crashed_fold_tmp_dirs_are_swept(spark, tmp_path):
    root = str(tmp_path / "idx")
    store = str(tmp_path / "store")
    rel = _rel(store, spark)
    os.makedirs(root, exist_ok=True)
    # a fold that died mid-write under another pid: its temp dir would
    # otherwise never be reused (pid-suffixed names) and leak forever
    stale = os.path.join(root, "gen-1.tmp-99999")
    os.makedirs(os.path.join(stale, "rel"), exist_ok=True)
    with open(os.path.join(stale, "rel", "junk.parquet"), "w") as f:
        f.write("partial")

    _write_batch(spark, store, 0, 10, 20)
    rep = fold_streamed_partitions(spark, root, "corpus-A", [rel])
    assert rep["generation"] == 1
    assert not os.path.isdir(stale)
    leftovers = [n for n in os.listdir(root) if ".tmp-" in n]
    assert leftovers == []
    assert read_folded(spark, root, ("rel",))["rel"].count() == 20
