import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_common_python_spark import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from gdal_common_python_spark.session import get_spark

    s = get_spark(app="pytest", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return synth.ensure("sf0.001")


@pytest.fixture(scope="session")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents_spans.parquet"))


@pytest.fixture(scope="session")
def zones(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "zones.parquet"))


@pytest.fixture(scope="session")
def rasters(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "rasters.parquet"))


@pytest.fixture(scope="session")
def tiles(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))


@pytest.fixture(scope="session")
def near_points(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "near_points.parquet"))


# ---- cache-hygiene helpers (shared by test_cache_hygiene / test_pipeline_ops)

def persistent_ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def assert_no_new_persistent(spark, ids_before: set, timeout: float = 10.0):
    """Assert the op under test left no NEW persistent RDDs. Unpersist is
    async (blocking=False), so an EARLIER test's release() can complete
    between the before-snapshot and this check — raw count equality flakes
    under full-suite ordering. Compare id sets (new ids only) and give any
    in-flight unpersist of the op's own handles a short grace window."""
    import time

    deadline = time.time() + timeout
    while True:
        new = persistent_ids(spark) - ids_before
        if not new:
            return
        if time.time() > deadline:
            raise AssertionError(f"leaked persistent RDDs: {sorted(new)}")
        time.sleep(0.2)
