import pytest

from dataqualitycontroltool_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dqc-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
