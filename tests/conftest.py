import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("STARLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from starlake_spark.session import get_spark

    s = get_spark("starlake-tests")
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = str(tmp_path / "tbl")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running cross-process soak tests")
