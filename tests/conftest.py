from __future__ import annotations

import pytest

from killrweather_spark.session import get_session

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_session(
        app_name="killrweather_spark_tests",
        shuffle_partitions=8,
        extra_conf={
            # static conf: must be set at session creation (catalog tables in
            # the bucketed-layout tests land in a throwaway warehouse)
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
