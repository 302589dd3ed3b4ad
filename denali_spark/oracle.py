"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names/dtypes, and an
order-insensitive value hash. Used by tests and by the dev loop:

    python -m denali_spark.oracle [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

from denali_spark.engine.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    if len(s) == len(d):
        for col in s.columns:
            sv = [_norm_cell(v) for v in s[col]]
            dv = [_norm_cell(v) for v in d[col]]
            if sv != dv:
                bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
                problems.append(
                    f"values differ in {col!r} (row {bad}): spark={sv[bad]} duck={dv[bad]}"
                )
    return problems


def run_check(spark, con, name: str, sf_dir: str) -> list[str]:
    from denali_spark.operators import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    ddf = con.execute(q.oracle).df()
    return compare(sdf, ddf)


def main() -> int:
    from denali_spark.engine.session import get_spark
    from denali_spark.operators import REGISTRY

    import time

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    failures = 0
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            problems = run_check(spark, con, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        status = "OK " if not problems else "FAIL"
        if problems:
            failures += 1
        oracle_tag = "" if REGISTRY[name].oracle else " (rows-only)"
        print(f"[{status}] {name}{oracle_tag}  ({dt:.2f}s)")
        for p in problems:
            print(f"       {p}")
    print(
        f"\n{len(names) - failures}/{len(names)} queries match"
        f"  (total {time.perf_counter() - t_all:.1f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
