import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    s = build_spark(app_name="snowemu-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def engine(spark, tmp_path):
    from snowflake_emulator_spark.engine import Engine

    return Engine(spark, base_dir=str(tmp_path / "wh"))


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
