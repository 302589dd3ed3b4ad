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
from pyspark.sql.types import StructType

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


# Schema memo for parquet reads. A production engine resolves table schemas
# from a catalog (metastore) instead of re-running footer schema inference on
# every query build; ``spark.read.parquet(path)`` costs ~90ms of driver time
# per call (file listing + an inference job) vs ~18ms with an explicit
# schema, and a bench run issues 100+ such reads. The memo holds ONLY the
# StructType — never data, never a DataFrame — keyed on the path's file
# identity (size + mtime_ns, per part file for directories), so regenerating
# a corpus in place invalidates the entry and the next read re-infers.
_SCHEMA_MEMO: dict[str, tuple[tuple, StructType]] = {}


def _path_identity(path: str) -> tuple:
    st = os.stat(path)
    if os.path.isdir(path):
        return tuple(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in sorted(os.scandir(path), key=lambda e: e.name)
            if e.name.endswith(".parquet") or e.name == "_SUCCESS"
        )
    return (st.st_size, st.st_mtime_ns)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with schema-inference memoization (see _SCHEMA_MEMO)."""
    try:
        ident = _path_identity(path)
    except OSError:
        return spark.read.parquet(path)
    hit = _SCHEMA_MEMO.get(path)
    if hit is not None and hit[0] == ident:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_MEMO[path] = (ident, df.schema)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TIMESTAMP_NTZ regardless of the
    parquet physical encoding. Testdata generations have shipped it as either
    TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as raw
    longs via ``nanosAsLong``) or plain ``timestamp[us]``; hard-coding one
    shape broke every events consumer when the other appeared, so inspect the
    schema and convert conditionally. The engine pins the session to UTC so
    the LTZ→NTZ cast is the identity and all downstream time functions are
    timezone-independent.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # TIMESTAMP(NANOS) read as raw nanos: truncate to micros like DuckDB.
        ts = F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    elif isinstance(ts_type, TimestampNTZType):
        ts = F.col("ts")
    else:
        ts = F.col("ts").cast("timestamp_ntz")
    return df.withColumn("ts", ts)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can mix DataFrame and SQL freely."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
