import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from aws_etl_bank_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def scratch(tmp_path_factory):
    path = tmp_path_factory.mktemp("engine_scratch")
    yield str(path)
    shutil.rmtree(str(path), ignore_errors=True)
