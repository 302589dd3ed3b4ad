"""Central query/operator registry.

Each entry pairs a PySpark implementation with a DuckDB-runnable ANSI-SQL
oracle (column names aligned — the driver's compare sorts columns by name and
hashes values, so every computed column is aliased identically on both sides).

Float determinism policy: aggregates over monetary/quantity doubles are cast
to DECIMAL *before* summation on BOTH sides (exact integer arithmetic,
order-insensitive), and the final value is cast back to DOUBLE. This makes
Spark-vs-DuckDB value hashes bit-identical regardless of partitioning or
aggregation order — which also means results are stable between a local[32]
run and a 1000-executor run.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an operator implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
