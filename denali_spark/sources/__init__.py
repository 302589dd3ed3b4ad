from denali_spark.sources.catalog_io import SparkCatalogIO
from denali_spark.sources.maintenance import compact_data_files, expire_snapshots
from denali_spark.sources.row_ops import delete_where, merge_into, update_where
from denali_spark.sources.schema_evolution import (
    add_column,
    drop_column,
    rename_column,
)

__all__ = [
    "SparkCatalogIO",
    "add_column",
    "compact_data_files",
    "delete_where",
    "drop_column",
    "expire_snapshots",
    "merge_into",
    "rename_column",
    "update_where",
]
