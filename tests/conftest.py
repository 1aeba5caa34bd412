import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dataqtor_spark.session import get_spark

    s = get_spark("dataqtor-tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from dataqtor_spark.queries import _t

    names = ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "documents", "embeddings"]
    return {n: _t(spark, SF_DIR, n) for n in names}
