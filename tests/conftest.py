from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from openair_spark.spark.session import get_spark

    session = get_spark("openair-spark-tests", cpus=4, shuffle_partitions=8)
    yield session
    session.stop()
