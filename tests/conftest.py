from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from denali_spark.engine.session import get_spark

    spark = get_spark("denali-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from denali_spark.oracle import duck_connection

    con = duck_connection(SF_SMOKE)
    yield con
    con.close()
