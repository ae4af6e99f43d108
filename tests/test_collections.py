"""explode_collections + compare_rasters — semantics + plan shape."""

import os

import pytest
from pyspark.sql import functions as F


class TestExplodeCollections:
    @pytest.fixture(scope="class")
    def zones(self, spark):
        def sq(x0, y0, s):
            return [[float(x0), float(y0)], [float(x0 + s), float(y0)],
                    [float(x0 + s), float(y0 + s)], [float(x0), float(y0 + s)]]

        def hole(x0, y0, s):
            return [[float(x0), float(y0)], [float(x0), float(y0 + s)],
                    [float(x0 + s), float(y0 + s)], [float(x0 + s), float(y0)]]
        rows = [
            (1, [sq(0, 0, 10)]),                                  # simple
            (2, [sq(0, 0, 10), hole(2, 2, 2)]),                   # outer + hole
            (3, [sq(0, 0, 4), sq(20, 0, 4)]),                     # two parts
            (4, [sq(0, 0, 10), hole(1, 1, 2), sq(20, 0, 4)]),     # mixed
        ]
        return spark.createDataFrame(
            rows, "zone_id long, rings4326 array<array<array<double>>>"
        )

    def test_part_assignment(self, spark, zones):
        from gdal_common_python_spark.operators import collections as coll

        out = {(r.zone_id, r.ri): r for r in coll.explode_collections(zones).collect()}
        assert out[(1, 0)].part_idx == 1 and out[(1, 0)].is_outer
        assert out[(2, 0)].part_idx == 1 and not out[(2, 1)].is_outer
        assert out[(2, 1)].part_idx == 1  # hole stays with its outer
        assert out[(3, 0)].part_idx == 1 and out[(3, 1)].part_idx == 2
        assert [out[(4, i)].part_idx for i in range(3)] == [1, 1, 2]

    def test_hole_area_negative(self, spark, zones):
        from gdal_common_python_spark.operators import collections as coll

        out = {(r.zone_id, r.ri): r for r in coll.explode_collections(zones).collect()}
        assert out[(2, 0)].area_q > 0 > out[(2, 1)].area_q

    def test_no_python_in_plan(self, spark, zones):
        from gdal_common_python_spark.operators import collections as coll

        plan = coll.explode_collections(zones)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestCompareRasters:
    def test_self_compare_is_clean(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
        r = rasterinfo.compare_rasters(tiles, ("r0", 1), ("r0", 1)).first()
        assert r.n_diff == 0 and r.n_nodata_mismatch == 0 and r.max_abs_diff == 0.0
        assert r.n_pixels == 128 * 128

    def test_distinct_rasters_differ(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
        r = rasterinfo.compare_rasters(tiles, ("r0", 1), ("r2", 1)).first()
        assert r.n_diff > 0 and 0 < r.max_abs_diff <= 255.0


class TestXyzAndSlippy:
    def test_xyz_counts_and_world_coords(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
        out = rasterinfo.raster_to_xyz(tiles, "r3", 1, skip_nodata=False)
        rows = out.collect()
        assert len(rows) == 96 * 96
        r = next(x for x in rows if x.gx == 0 and x.gy == 0)
        assert r.x == -119.87 + 0.5 * 0.2 and r.y == 44.63 - 0.5 * 0.2

    def test_xyz_skip_nodata(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
        kept = rasterinfo.raster_to_xyz(tiles, "r3", 1).count()
        assert 0 < kept < 96 * 96  # ~5% nodata stripped

    def test_xyz_plan_shuffle_free(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
        plan = rasterinfo.raster_to_xyz(tiles, "r3", 1)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_slippy_known_tile(self, spark, sf_dir):
        from gdal_common_python_spark.operators import rasterinfo

        rasters = spark.read.parquet(os.path.join(sf_dir, "rasters.parquet"))
        r = {x.raster_id: x for x in rasterinfo.slippy_tiles(rasters, 6).collect()}["r0"]
        # lon -120 at z6: (-120+180)/360*64 = 10.66 -> 10; lat 45 -> ty 23
        assert r.tx0 == 10 and r.ty0 == 23
        assert r.tx1 >= r.tx0 and r.ty1 >= r.ty0
        assert r.n_tiles == (r.tx1 - r.tx0 + 1) * (r.ty1 - r.ty0 + 1)
