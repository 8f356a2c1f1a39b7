"""Shared session-scoped SparkSession for the test suite (local[4])."""

from __future__ import annotations

import pytest

from data_quality_checker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dqc-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
