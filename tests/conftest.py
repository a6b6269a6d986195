import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="linkgraph-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR


def load_csv_edges(spark, name, data_dir=DATA_DIR):
    """Space-delimited `src dst weight` int/int/float (reference dataset
    format, tests/utils.py:231-243)."""
    return spark.read.csv(
        os.path.join(data_dir, name),
        sep=" ",
        schema="src LONG, dst LONG, weight DOUBLE",
    )
