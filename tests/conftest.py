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
