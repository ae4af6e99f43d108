"""rasterize_burn — structural invariants (exactness is the driver gate)."""

import os

import pytest


@pytest.fixture(scope="module")
def burned(spark, sf_dir):
    from gdal_common_python_spark.operators import rasterize

    zones = spark.read.parquet(os.path.join(sf_dir, "zones.parquet"))
    rasters = spark.read.parquet(os.path.join(sf_dir, "rasters.parquet"))
    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    out = rasterize.rasterize_burn(spark, zones, rasters, tiles, "r0", 1)
    return zones, rasters, out.collect()


def test_nonempty_unique_pixels(burned):
    _, _, rows = burned
    assert len(rows) > 0
    keys = [(r.gc, r.gr) for r in rows]
    assert len(keys) == len(set(keys))


def test_burn_values_are_zone_ids(burned):
    zones, _, rows = burned
    ids = {r.zone_id for r in zones.select("zone_id").collect()}
    assert all(r.burn_value in ids for r in rows)


def test_pixels_inside_target_grid(burned):
    _, rasters, rows = burned
    m = rasters.filter("raster_id='r0' AND band=1").first()
    for r in rows:
        assert 0 <= r.gc < m.width and 0 <= r.gr < m.height


def test_stable_under_repartitioning(spark, sf_dir, burned):
    from gdal_common_python_spark.operators import rasterize

    zones = spark.read.parquet(os.path.join(sf_dir, "zones.parquet")).repartition(7)
    rasters = spark.read.parquet(os.path.join(sf_dir, "rasters.parquet"))
    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet")).repartition(5)
    again = rasterize.rasterize_burn(spark, zones, rasters, tiles, "r0", 1).collect()
    _, _, rows = burned
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


class TestCutline:
    def test_cutline_matches_zonal_membership(self, spark, zones, rasters, tiles):
        """Cutline pixels = union over zones of valid in-zone pixels, and
        each pixel appears exactly once even under overlapping zones."""
        from gdal_common_python_spark.operators import rasterize as rast_ops

        out = rast_ops.cutline_extract(spark, zones, rasters, tiles, "r0", 1)
        rows = out.collect()
        keys = [(r.gc, r.gr) for r in rows]
        assert len(keys) == len(set(keys))  # deduped
        assert len(rows) > 0
        # cross-check against the burn op: cutline covers a subset of the
        # burned coverage (burn keeps nodata pixels, cutline drops them)
        burned = {
            (r.gc, r.gr)
            for r in rast_ops.rasterize_burn(
                spark, zones, rasters, tiles, "r0", 1
            ).collect()
        }
        assert set(keys) <= burned
