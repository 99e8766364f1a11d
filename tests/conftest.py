from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_project_spark.session import get_spark

    s = get_spark("etl-project-spark-tests", cpus=8, driver_memory="6g")
    yield s
    s.stop()
