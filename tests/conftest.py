from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_gate():
    return SF_GATE


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running resilience/e2e tests (subprocess Spark sessions)"
    )
