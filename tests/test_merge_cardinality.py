"""MERGE ON-clause cardinality: a target row matched by more than one
source row must raise (the Spark/Iceberg MERGE rule) in BOTH the
copy-on-write and merge-on-read paths — silently applying duplicates as
delete-once/append-N duplicates rows. Duplicate keys among UNMATCHED
source rows stay legal: they both insert."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.catalog import CatalogServer, make_state
from denali_spark.sources import SparkCatalogIO, merge_into, merge_into_mor


@pytest.fixture(scope="module")
def io(spark, tmp_path_factory):
    server = CatalogServer(
        make_state(str(tmp_path_factory.mktemp("wh")))
    ).start()
    yield SparkCatalogIO(spark, server.uri)
    server.stop()


def _fresh(spark, io, name):
    io.write_table(
        spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")),
        ["mc"], name, mode="overwrite",
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


@pytest.mark.parametrize("merge", [merge_into, merge_into_mor])
def test_duplicate_matched_source_keys_raise(spark, io, merge):
    name = f"t_{merge.__name__}"
    _fresh(spark, io, name)
    dup = _src(spark, [(3, 100), (3, 200), (5, 300)])
    with pytest.raises(ValueError, match="cardinality"):
        merge(io, ["mc"], name, dup, on=["id"])
    # the failed merge must not have committed anything
    out = io.read_table(["mc"], name)
    assert out.count() == 20
    assert out.where("id = 3").collect()[0]["v"] == 6


@pytest.mark.parametrize("merge", [merge_into, merge_into_mor])
def test_duplicate_unmatched_source_keys_both_insert(spark, io, merge):
    name = f"u_{merge.__name__}"
    _fresh(spark, io, name)
    src = _src(spark, [(5, 500), (100, 1), (100, 2)])
    merge(io, ["mc"], name, src, on=["id"])
    out = io.read_table(["mc"], name)
    assert out.where("id = 100").count() == 2  # both unmatched rows inserted
    assert out.where("id = 5").collect()[0]["v"] == 500
    assert out.count() == 22
