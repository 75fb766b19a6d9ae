from __future__ import annotations

import datetime
import shutil

import pytest

from plateau_spark.core.store import Store
from plateau_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("plateau-spark-tests", **{"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture()
def store(tmp_path):
    yield Store(str(tmp_path / "store"))


@pytest.fixture()
def cluster_df(spark):
    """The reference's canonical two-cluster fixture (FIXTURES.md F1,
    /root/reference/tests/conftest.py:283-305)."""
    return spark.createDataFrame(
        [
            (1, 1, 1, datetime.date(2010, 1, 1)),
            (2, 2, 2, datetime.date(2009, 12, 31)),
        ],
        "P long, L long, TARGET long, DATE date",
    )


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
