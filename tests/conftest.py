from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyft_presto_spark.session import build_session  # noqa: E402

# sf0.001 keeps the suite fast; set SPARK_GRAFT_TEST_SF=sf0.01 to run at the
# driver's correctness scale.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/" + os.environ.get("SPARK_GRAFT_TEST_SF", "sf0.001"))


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="lyft_presto_spark_tests", cpus="8", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
