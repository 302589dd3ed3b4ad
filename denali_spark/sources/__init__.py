from denali_spark.sources.catalog_io import SparkCatalogIO
from denali_spark.sources.maintenance import compact_data_files, expire_snapshots
from denali_spark.sources.row_ops import delete_where, merge_into, update_where

__all__ = [
    "SparkCatalogIO",
    "compact_data_files",
    "delete_where",
    "expire_snapshots",
    "merge_into",
    "update_where",
]
