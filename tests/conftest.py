import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from judy_graph_db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("judy-tests", shuffle_partitions=4)
    yield s
