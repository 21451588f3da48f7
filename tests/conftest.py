import pytest

from events_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="evspark-tests", cores=4, shuffle_partitions=4)
    yield s
