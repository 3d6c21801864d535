from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kafka_streams_app_spark.engine import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kafka-streams-app-spark-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.01"
