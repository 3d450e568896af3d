import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="docetl_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def df_rows(df, *cols):
    """Collected, sorted, hashable row tuples for order-insensitive asserts."""
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())
