"""Partition transforms for catalog-table writes.

The reference's REST spec declares the Iceberg partition-transform vocabulary
(/root/reference/routes/openapi.yml:1733-1770 — identity, year, month, day,
hour, bucket[N], truncate[W]) and its catalog carries partition specs in
table metadata (/root/reference/logic/table.go:84-92); applying transforms to
rows is client-engine work. This module is that client side: each transform
lowers to a built-in Spark Column expression (JVM-side, codegen-friendly —
never a Python UDF), the writer lays files out hive-style by transformed
value, and manifests record each file's partition tuple.

Value encoding is human-readable (month → '2024-03') rather than Iceberg's
ordinal ints, and bucket uses Spark's murmur3 `hash` rather than Iceberg's
bucket hash — documented deviations; partition values only need to be
self-consistent within this engine.

Scale notes: partition-aligned layout is the clustering that makes file
pruning effective — rows sharing a partition value land in the same files,
so min/max footer stats per file become tight ranges and a selective
predicate on the partition source column prunes to O(files-per-partition)
instead of O(all files). This composes with the stats pruner in
expressions.py without any transform-aware predicate rewriting.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE = re.compile(r"^truncate\[(\d+)\]$")


def normalize_partition_by(
    partition_by: list[str | tuple[str, str]],
) -> list[tuple[str, str]]:
    """Accept bare column names (identity) or (column, transform) pairs."""
    out = []
    for p in partition_by:
        if isinstance(p, str):
            out.append((p, "identity"))
        else:
            out.append((p[0], p[1]))
    return out


def partition_field_name(column: str, transform: str) -> str:
    if transform == "identity":
        return column
    base = re.sub(r"\[\d+\]$", "", transform)
    return f"{column}_{base}"


def transform_column(column: str, transform: str, dtype=None) -> Column:
    """Lower a partition transform to a built-in Spark expression; `dtype`
    (the column's Spark DataType) disambiguates truncate semantics."""
    from pyspark.sql.types import StringType

    c = F.col(column)
    if transform == "identity":
        return c
    if transform == "year":
        return F.year(c)
    if transform == "month":
        return F.date_format(c, "yyyy-MM")
    if transform == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if transform == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    m = _BUCKET.match(transform)
    if m:
        return F.pmod(F.hash(c), F.lit(int(m.group(1))))
    m = _TRUNCATE.match(transform)
    if m:
        w = int(m.group(1))
        # Iceberg semantics: strings → width-W prefix; integers → floor to a
        # multiple of W (correct for negatives via double-pmod).
        if isinstance(dtype, StringType):
            return F.substring(c, 1, w)
        return c - F.pmod(F.pmod(c, F.lit(w)) + F.lit(w), F.lit(w))
    raise ValueError(f"unknown partition transform {transform!r}")


def build_partition_spec(
    partition_by: list[tuple[str, str]], iceberg_schema: dict
) -> dict:
    """PartitionSpec JSON for createTable, resolving source field ids from
    the Iceberg schema (field-ids start at the 999+ convention offset the
    reference uses, logic/table.go:84-92)."""
    by_name = {f["name"]: f["id"] for f in iceberg_schema["fields"]}
    fields = []
    for i, (col, transform) in enumerate(partition_by):
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        fields.append(
            {
                "name": partition_field_name(col, transform),
                "transform": transform,
                "source-id": by_name[col],
                "field-id": 1000 + i,
            }
        )
    return {"spec-id": 0, "fields": fields}


DIR_PREFIX = "_p_"


def apply_partition_layout(
    df: DataFrame, partition_by: list[tuple[str, str]]
) -> tuple[DataFrame, list[str]]:
    """Add transformed partition columns under a `_p_` prefix; returns
    (df, dir column names) ready for `write.partitionBy(...)`. Hive layout
    strips the partitionBy columns from data files — prefixing means only
    the DERIVED columns are stripped, so identity-partitioned source
    columns still land in the files (matching Iceberg, where partition
    values are metadata and data files stay complete)."""
    names = []
    out = df
    for col, transform in partition_by:
        name = DIR_PREFIX + partition_field_name(col, transform)
        out = out.withColumn(
            name, transform_column(col, transform, df.schema[col].dataType)
        )
        names.append(name)
    return out, names


def partition_values_from_path(path: str, dir_names: list[str]) -> dict:
    """Recover a file's partition tuple (iceberg field name → value) from
    its hive-style path segments."""
    from urllib.parse import unquote

    values = {}
    for seg in path.split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in dir_names:
                values[k[len(DIR_PREFIX):]] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
    return values


def spec_to_partition_by(md: dict) -> list[tuple[str, str]] | None:
    """Reverse of build_partition_spec: map a table's CURRENT default
    partition spec back to [(column, transform)] using the current schema's
    field ids — how the write path honors partition-spec evolution (a
    writer must lay out new files by the spec in force NOW, not the one the
    table was created with). Returns None for unpartitioned tables."""
    spec = next(
        (
            s
            for s in md.get("partition-specs", [])
            if s.get("spec-id") == md.get("default-spec-id", 0)
        ),
        None,
    )
    if not spec or not spec.get("fields"):
        return None
    schema = next(
        (
            s
            for s in md.get("schemas", [])
            if s.get("schema-id") == md.get("current-schema-id", 0)
        ),
        {},
    )
    by_id = {f["id"]: f["name"] for f in schema.get("fields", [])}
    missing = [f for f in spec["fields"] if f["source-id"] not in by_id]
    if missing:
        # Unlike a dropped SORT column (safe to degrade to unsorted), a
        # dropped partition-source column means the table's layout contract
        # can no longer be honored — surface it instead of silently writing
        # a different layout.
        names = [f.get("name", f["source-id"]) for f in missing]
        raise ValueError(
            f"default partition spec references dropped column(s) {names}; "
            "evolve the partition spec before writing"
        )
    return [(by_id[f["source-id"]], f["transform"]) for f in spec["fields"]]
