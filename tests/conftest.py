import pytest


@pytest.fixture(scope="session")
def spark():
    from textract_demo_spark.engine.session import get_spark
    s = get_spark(master="local[4]", app="textract-tests",
                  shuffle_partitions=4)
    yield s
