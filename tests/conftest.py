import pytest

from entitylinking_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="entitylinking-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
