import pytest

from bela_spark.session import get_spark


def executed_plan(df) -> str:
    """Physical-plan string of a DataFrame (shared by the plan-shape tests)."""
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bela-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
