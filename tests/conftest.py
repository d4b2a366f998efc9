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
    # returns and exceptions); an UNRECLAIMABLE cached RDD here is a
    # leak. GC-tied localCheckpoint blocks (near_dup join path) release
    # via the JVM ContextCleaner only after a JVM GC, so force one and
    # poll before declaring a leak.
    import gc
    import time
    for _ in range(20):
        gc.collect()
        s._jvm.System.gc()
        if s.sparkContext._jsc.getPersistentRDDs().isEmpty():
            break
        time.sleep(0.5)
    leaked = s.sparkContext._jsc.getPersistentRDDs()
    assert leaked.isEmpty(), (
        f"persisted RDDs leaked by the suite (unreclaimed after forced "
        f"JVM GC): {leaked}")


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



