import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from iniz_exporters_spark.session import get_spark

    spark = get_spark("iniz-exporters-spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
