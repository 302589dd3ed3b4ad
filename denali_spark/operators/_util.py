"""Shared helpers for oracle-exact arithmetic.

The driver hash-compares Spark results against DuckDB. Double-precision SUM/AVG
are order-dependent, and shuffle partitioning changes summation order — so any
float aggregate would be flaky locally and diverge on a real cluster. Policy:

- Cast monetary/quantity doubles (all generated with <=2 decimals) to DECIMAL
  before arithmetic/aggregation → exact, order-insensitive integer math.
- Cast the final aggregate back to DOUBLE → both engines round the *same exact
  decimal* to nearest-double, giving bit-identical results.
- Keep decimal precision small enough that Spark never hits its 38-digit cap
  (where ``allowPrecisionLoss`` would silently truncate): prices decimal(12,2),
  rates decimal(3,2).

Ratios/averages are computed as (exact double) / (exact double) — IEEE
division of identical inputs is identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D_PRICE = "decimal(12,2)"  # prices, quantities (< 10^10, 2 decimals)
D_RATE = "decimal(3,2)"  # discount / tax rates in [0, 1]


def dec(c: str | Column, typ: str = D_PRICE) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def dsum(c: str | Column, alias: str, typ: str = D_PRICE) -> Column:
    """Exact decimal SUM, surfaced as DOUBLE."""
    return F.sum(dec(c, typ)).cast("double").alias(alias)


def davg(c: str | Column, alias: str, typ: str = D_PRICE) -> Column:
    """Exact-sum / count average (deterministic double)."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col, typ)).cast("double") / F.count(col)).alias(alias)


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    one = F.lit(1).cast(D_RATE)
    return dec("l_extendedprice") * (one - dec("l_discount", D_RATE))


def charge_col() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax) in exact decimal."""
    one = F.lit(1).cast(D_RATE)
    return revenue_col() * (one + dec("l_tax", D_RATE))


# --- DuckDB oracle SQL fragments (must mirror the Spark expressions above) ---

SQL_DEC = "CAST({c} AS DECIMAL(12,2))"
SQL_RATE = "CAST({c} AS DECIMAL(3,2))"
SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
SQL_CHARGE = SQL_REVENUE + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def sql_dsum(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) AS {alias}"


def sql_davg(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({c}) AS {alias}"
