"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from moira_spark.session import build_session

    sp = build_session(app_name="moira-spark-tests", cores=4, shuffle_partitions=8)
    yield sp
    sp.stop()
