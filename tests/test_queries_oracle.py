"""Every registered query must run, and (when it declares an oracle) must
hash-match DuckDB on the smoke scale factor. This mirrors the driver's t2
gate so regressions surface locally first."""

from __future__ import annotations

import pytest

from denali_spark.operators import REGISTRY
from denali_spark.oracle import compare
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    pdf = sdf.toPandas()
    assert pdf is not None
    if q.oracle is None:
        return
    ddf = duck.execute(q.oracle).df()
    problems = compare(pdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)


def test_driver_priority_names_are_valid():
    """The coverage-ordering list must reference real queries (a typo here
    silently demotes a query to the tail of a budget-capped driver sweep)."""
    from denali_spark.operators.registry import DRIVER_PRIORITY, REGISTRY, _ordered_names

    unknown = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert unknown == [], f"DRIVER_PRIORITY names not in REGISTRY: {unknown}"
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY), "duplicates"
    ordered = _ordered_names()
    assert sorted(ordered) == sorted(REGISTRY)  # permutation, nothing lost
    assert ordered[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY


def test_doc_query_counts_match_registry():
    """SURVEY.md §8 and README.md state the registry size; r12's verdict
    caught them drifting after a late-round query landed. Pin the prose to
    `len(all_queries())`/`len(all_oracles())` so the drift fails CI."""
    import re

    from denali_spark.operators.registry import all_oracles, all_queries

    n_q, n_o = len(all_queries()), len(all_oracles())
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"\((\d+) queries, (\d+) DuckDB-oracle-checked", survey)
    assert m, "SURVEY.md §8 query-count sentence missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o)
    readme = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) registered queries", readme)
    assert m and int(m.group(1)) == n_q
    m = re.search(r"(\d+) are hash-checked", readme)
    assert m and int(m.group(1)) == n_o
