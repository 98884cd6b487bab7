from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from goskyr_spark.spark.session import build_session

    s = build_session(app_name="goskyr-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
