"""zonal_value_counts / zonal_majority — consistency + tie semantics."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    zones = spark.read.parquet(os.path.join(sf_dir, "zones.parquet"))
    rasters = spark.read.parquet(os.path.join(sf_dir, "rasters.parquet"))
    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    return zones, rasters, tiles


def test_majority_consistent_with_counts(spark, tables):
    from gdal_common_python_spark.operators import rasterize

    zones, rasters, tiles = tables
    vc = rasterize.zonal_value_counts(spark, zones, rasters, tiles, "r0", 1)
    per = {}
    for r in vc.collect():
        per.setdefault(r.zone_id, []).append((r.value, r.cnt))
    maj = {r.zone_id: r for r in rasterize.zonal_majority(spark, zones, rasters, tiles, "r0", 1).collect()}
    assert set(per) == set(maj)
    for zid, pairs in per.items():
        m = maj[zid]
        maxc = max(c for _, c in pairs)
        minc = min(c for _, c in pairs)
        assert m.majority == min(v for v, c in pairs if c == maxc)
        assert m.minority == min(v for v, c in pairs if c == minc)
        assert m.variety == len(pairs)
        assert m.n_valid == sum(c for _, c in pairs)


def test_counts_match_zonal_pixel_counts(spark, tables):
    """sum of value counts per zone == the A5 zonal pixel count for r0."""
    from gdal_common_python_spark.operators import rasterize, zonal

    zones, rasters, tiles = tables
    vc = rasterize.zonal_value_counts(spark, zones, rasters, tiles, "r0", 1)
    got = {r.zone_id: r.n for r in vc.groupBy("zone_id").agg(F.sum("cnt").alias("n")).collect()}
    r0 = rasters.filter("raster_id='r0' AND band=1")
    _, counts = zonal.zonal_statistics(spark, zones, r0, tiles.filter("raster_id='r0' AND band=1"))
    want = {r.zone_id: r.pixel_count for r in counts.collect() if r.pixel_count > 0}
    assert got == want


def test_percentiles_match_numpy_nearest_rank(spark, tables):
    import math

    from gdal_common_python_spark.operators import rasterize

    zones, rasters, tiles = tables
    vc = rasterize.zonal_value_counts(spark, zones, rasters, tiles, "r0", 1)
    per = {}
    for r in vc.collect():
        per.setdefault(r.zone_id, []).extend([r.value] * r.cnt)
    got = {
        r.zone_id: r
        for r in rasterize.zonal_percentiles(
            spark, zones, rasters, tiles, "r0", 1, ps=(0.25, 0.5, 0.75)
        ).collect()
    }
    assert set(per) == set(got)
    for zid, vals in per.items():
        vals.sort()
        n = len(vals)
        r = got[zid]
        assert r.n_valid == n
        for p, col in ((0.25, r.p25), (0.5, r.p50), (0.75, r.p75)):
            assert col == vals[math.ceil(p * n) - 1], (zid, p)


def test_percentiles_validation(spark, tables):
    from gdal_common_python_spark.operators import rasterize

    zones, rasters, tiles = tables
    with pytest.raises(ValueError, match="percentile fractions"):
        rasterize.zonal_percentiles(spark, zones, rasters, tiles, "r0", 1, ps=(0.0,))
