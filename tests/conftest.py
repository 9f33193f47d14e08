from __future__ import annotations

import pytest

from kubenetmon_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kubenetmon-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
