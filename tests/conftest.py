import os
import shutil
import tempfile

import pytest

from data_warehouse_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_lake():
    d = tempfile.mkdtemp(prefix="lake-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_CORRECT = "/root/testdata/sf0.01"
