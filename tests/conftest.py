from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_smoke():
    return SF0001


@pytest.fixture(scope="session")
def sf_correctness():
    return SF001
