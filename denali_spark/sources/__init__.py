from denali_spark.sources.catalog_io import SparkCatalogIO

__all__ = ["SparkCatalogIO"]
