from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
# Default to the DRIVER's t2 scale: float-rounding boundaries differ
# between scale factors (a half-cent ROUND divergence reproduced only
# at sf0.01), so parity must be proven where the driver checks it.
# Override with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a
# faster inner loop while iterating.
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from etl_project_spark.session import get_spark

    s = get_spark("etl-project-spark-tests", cpus=8, driver_memory="6g")
    yield s
    s.stop()
