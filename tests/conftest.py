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


class assert_no_spark_jobs:
    """Context manager pinning 'this code launches NO Spark job'.

    Default-group before/after snapshots are racy even with a drained
    bus — any other source (a prior test's straggler event under
    load) can land inside the window. Instead the body runs under a
    UNIQUE job group: jobs the body launches (including async
    broadcast futures, which capture the group thread-locally) land
    in that group; anything else doesn't. The assertion is that the
    group stays empty."""

    def __init__(self, spark, label="no-spark-job assertion"):
        self.spark = spark
        self.label = label

    def __enter__(self):
        import uuid

        self.group = f"nojob-{uuid.uuid4().hex[:10]}"
        self.spark.sparkContext.setJobGroup(self.group, self.label)
        return self

    def __exit__(self, exc_type, exc, tb):
        sc = self.spark.sparkContext
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        if exc_type is None:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
            launched = sc.statusTracker().getJobIdsForGroup(self.group)
            assert not launched, (
                f"{self.label}: launched Spark jobs {sorted(launched)}"
            )
        return False
