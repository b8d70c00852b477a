import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from mahout_spark.session import get_spark

    s = get_spark(cpus=8, app_name="mahout_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_docs_df(spark):
    from tests.fixtures_tiny import TINY_DOCS

    return spark.createDataFrame(
        [(k, v) for k, v in TINY_DOCS.items()], ["doc_id", "content"]
    )
