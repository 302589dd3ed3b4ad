"""denali_spark — a PySpark-native analytics engine with the capabilities of
Bodo-inc/denali (an Apache Iceberg REST catalog), rebuilt Spark-first.

Two halves, mirroring the reference architecture (SURVEY.md §7.1):

- ``denali_spark.catalog``: a pure-Python Iceberg REST catalog service
  (namespaces / tables / views / commit protocol), the counterpart of the
  reference's Go service (``/root/reference/main.go``, ``routes/``, ``logic/``).
  Not Spark-based — Spark is a *client* of the catalog.
- ``denali_spark.engine`` + ``operators`` + ``functions`` + ``sources`` +
  ``streaming``: the PySpark data plane. The reference delegates all query
  execution to client engines (``/root/reference/examples/pyspark_example.py``);
  here that surface is first-class: relational operators via DataFrame/SQL
  (Catalyst-optimized), plus LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"
