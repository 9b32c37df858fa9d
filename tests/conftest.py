import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "spark: test requires a SparkSession")


@pytest.fixture(scope="session")
def spark():
    from frizbee_spark.session import get_spark

    # small core count keeps test startup/shuffle overhead low
    s = get_spark("frizbee-spark-tests", cores=8)
    yield s
    s.stop()
