from __future__ import annotations

import pytest

from killrweather_spark.session import get_session

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="killrweather_spark_tests", shuffle_partitions=8)
    yield s
