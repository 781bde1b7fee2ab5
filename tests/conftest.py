import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresml_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def jobs_snapshot(spark):
    """Default-group job ids with the listener bus DRAINED first.

    statusTracker() is fed by the async listener bus: under heavy host
    load a PREVIOUS action's job can register seconds late and land
    between a test's before/after snapshots (observed round 8 — the
    'new' job's callsite was the prior test's exact-path collect).
    Draining on BOTH snapshots also closes the false-pass window where
    a genuinely-launched job hasn't registered yet."""
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    return spark.sparkContext.statusTracker().getJobIdsForGroup(None)
