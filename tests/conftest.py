import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from satellitetools_spark.datagen import ensure_geodata  # noqa: E402
from satellitetools_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app="satellitetools-spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def geodata_small():
    """Tiny deterministic geo dataset (2 AOIs x 4 dates + 1 duplicate)."""
    return ensure_geodata("sf0.001")


@pytest.fixture(scope="session")
def geodata_mid():
    """Correctness-scale dataset (7 AOIs x 10 dates)."""
    return ensure_geodata("sf0.01")
