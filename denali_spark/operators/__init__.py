"""Operator/query surface of the engine.

Every operator is registered in ``denali_spark.operators.registry`` with a
PySpark callable ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
an equivalent ANSI-SQL oracle string for the DuckDB correctness gate.

Importing this package imports every operator module, populating the registry.
"""

from denali_spark.operators.registry import REGISTRY, Query, all_oracles, all_queries

# Import for registration side effects.
from denali_spark.operators import (  # noqa: E402,F401
    relational,
    subqueries,
    joins,
    aggregates,
    windows,
    setops,
    scalar_funcs,
    timeseries,
    graph,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    ivm_queries,
)

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracles"]
