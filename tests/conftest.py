"""Shared test fixtures.

One Hive-enabled local session per test process, with a fresh temp
warehouse + embedded Derby metastore (the per-process pattern the
reference documents at /root/reference/TESTING.md:46-53,80-85 and
implements in HiveTableDeletionJobIntegrationTest.java:42-53).
"""

from __future__ import annotations

import os

import pytest

from bd_delete_records_from_external_hive_table_spark.session import SessionFactory

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = SessionFactory.create(
        app_name="bd-engine-tests",
        master="local[4]",
        hive=True,
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
