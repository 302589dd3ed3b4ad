"""Testdata table access.

The driver's synthetic TPC-H-ish tables (TESTDATA.md / FIXTURES.md §B) are one
parquet file per table under ``/root/testdata/sf*/``. All query callables take
``(spark, sf_dir)`` and read through these helpers so that:

- column pruning + predicate pushdown reach the parquet scan (we never cache
  eagerly or materialize);
- the same callables work against any scale factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can mix DataFrame and SQL freely."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
