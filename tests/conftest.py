from __future__ import annotations

import pytest

from conveyorbelt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("conveyorbelt-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf001() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01() -> str:
    return "/root/testdata/sf0.01"
