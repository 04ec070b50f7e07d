from __future__ import annotations

import numpy as np
import pytest

from zcurve_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"  # smallest, for fast unit-level e2e
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="zcurve-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
