from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tenzir_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tenzir_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    # every operator releases its persists on all paths (incl. early
    # returns and exceptions); a leftover cached RDD here is a leak.
    # gc first: `repeat` ties its localCheckpoint release to DataFrame
    # collection, which is correct but nondeterministic until a gc pass.
    import gc
    gc.collect()
    leaked = s.sparkContext._jsc.getPersistentRDDs()
    assert leaked.isEmpty(), (
        f"persisted RDDs leaked by the suite: {leaked}")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


