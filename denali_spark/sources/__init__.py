from denali_spark.sources.catalog_io import SparkCatalogIO
from denali_spark.sources.changelog import read_changes
from denali_spark.sources.datasource import register_denali_source
from denali_spark.sources.incremental import read_incremental
from denali_spark.sources.ivm import (
    JoinRollupSpec,
    RollupSpec,
    create_join_rollup,
    create_rollup,
    refresh_join_rollup,
    refresh_rollup,
)
from denali_spark.sources.maintenance import (
    analyze_partitions,
    analyze_table,
    analyze_table_incremental,
    compact_data_files,
    expire_snapshots,
    partition_statistics,
    run_maintenance,
    table_statistics,
    remove_orphan_files,
    rewrite_clustered,
)
from denali_spark.sources.metadata_tables import metadata_table
from denali_spark.sources.mor import (
    convert_deletes_to_dvs,
    delete_where_dv,
    delete_where_mor,
    equality_delete,
    merge_into_mor,
    rewrite_deletes,
    update_where_mor,
)
from denali_spark.sources.row_ops import delete_where, merge_into, update_where
from denali_spark.sources.schema_evolution import (
    add_column,
    drop_column,
    rename_column,
)

__all__ = [
    "JoinRollupSpec",
    "RollupSpec",
    "SparkCatalogIO",
    "create_join_rollup",
    "create_rollup",
    "refresh_join_rollup",
    "refresh_rollup",
    "add_column",
    "analyze_partitions",
    "analyze_table",
    "analyze_table_incremental",
    "partition_statistics",
    "run_maintenance",
    "compact_data_files",
    "table_statistics",
    "delete_where",
    "convert_deletes_to_dvs",
    "delete_where_dv",
    "delete_where_mor",
    "drop_column",
    "equality_delete",
    "merge_into_mor",
    "update_where_mor",
    "expire_snapshots",
    "merge_into",
    "metadata_table",
    "read_changes",
    "read_incremental",
    "register_denali_source",
    "remove_orphan_files",
    "rename_column",
    "rewrite_clustered",
    "rewrite_deletes",
    "update_where",
]
