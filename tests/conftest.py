import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scicat_ingestor_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute soak/e2e tests (run in the full suite)"
    )


@pytest.fixture(scope="session")
def spark():
    session = get_session(app_name="scicat_ingestor_spark_tests")
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
