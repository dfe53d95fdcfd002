from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minarrow_spark.session import get_spark  # noqa: E402

TESTDATA = "/root/testdata"
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MID = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "minarrow_spark_tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)
