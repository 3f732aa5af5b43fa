from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from txf_continuous_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("txf_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_sessionstart(session):
    # Testdata drift tripwire (round-3 lesson): print each table's
    # parquet timestamp flavor so a driver-side regeneration of
    # /root/testdata shows up as a diff line, not a crash hunt.
    import json

    from txf_continuous_data_pipeline_spark.sources.io import (
        timestamp_flavors,
    )

    print(f"ts_flavors[{SF_DIR}]: " + json.dumps(timestamp_flavors(SF_DIR)))
