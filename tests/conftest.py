import pytest

from driftdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small local parallelism: the test tables are tiny and scheduler
    # overhead dominates; correctness is partition-count-independent.
    s = get_spark(app_name="driftdb_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
