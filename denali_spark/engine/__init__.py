from denali_spark.engine.session import get_spark, stop_spark
from denali_spark.engine.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "stop_spark", "TABLES", "load_table", "register_views"]
