"""grid_average (gdal_grid analog) — semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

T = dict(origin_x=0.0, origin_y=10.0, px_x=1.0, px_y=-1.0, width=10, height=10)


@pytest.fixture(scope="module")
def pts(spark):
    # one point at the center of pixel (2, 3); one isolated far away at (8.5, 1.5)
    rows = [(1, 2.5, 6.5, 10.0), (2, 2.5, 6.5, 20.0), (3, 8.5, 1.5, 7.0)]
    return spark.createDataFrame(rows, ["point_id", "x", "y", "v"])


def test_windowed_average(spark, pts):
    from gdal_common_python_spark.operators import grid

    out = {(r.gc, r.gr): r for r in grid.grid_average(pts, T, radius=0.4).collect()}
    # radius 0.4 < half-pixel: only the containing pixel centers hit
    assert set(out) == {(2, 3), (8, 8)}
    assert out[(2, 3)].n_points == 2 and out[(2, 3)].value == 15.0
    assert out[(8, 8)].n_points == 1 and out[(8, 8)].value == 7.0


def test_radius_reach(spark, pts):
    from gdal_common_python_spark.operators import grid

    out = {(r.gc, r.gr): r.n_points for r in grid.grid_average(pts, T, radius=1.0).collect()}
    # distance from (2.5,6.5) to 4-neighbor pixel centers is exactly 1.0
    for k in [(2, 3), (1, 3), (3, 3), (2, 2), (2, 4)]:
        assert out[k] == 2


def test_empty_pixels_absent(spark, pts):
    from gdal_common_python_spark.operators import grid

    rows = grid.grid_average(pts, T, radius=0.4).collect()
    assert len(rows) == 2  # sparse output only


def test_validation(spark, pts):
    from gdal_common_python_spark.operators import grid

    with pytest.raises(ValueError, match="radius"):
        grid.grid_average(pts, T, radius=0)
    with pytest.raises(ValueError, match="north-up"):
        grid.grid_average(pts, dict(T, px_y=1.0), radius=1)


def test_no_python_in_plan(spark, pts):
    from gdal_common_python_spark.operators import grid

    plan = grid.grid_average(pts, T, radius=1.0)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure codegen — no UDF stage


class TestIdw:
    def test_exact_hit_dominates(self, spark, pts):
        from gdal_common_python_spark.operators import grid

        out = {(r.gc, r.gr): r for r in grid.grid_idw(pts, T, radius=0.4, smoothing=0.001).collect()}
        # points 1+2 sit exactly at pixel (2,3)'s center: equal max weights
        # -> value = mean(10, 20) to quantization precision
        assert out[(2, 3)].n_points == 2
        assert abs(out[(2, 3)].value - 15.0) < 0.05

    def test_closer_point_weighs_more(self, spark):
        from gdal_common_python_spark.operators import grid

        rows = [(1, 2.4, 6.5, 0.0), (2, 3.4, 6.5, 100.0)]  # nearer=0, farther=100
        df = spark.createDataFrame(rows, ["point_id", "x", "y", "v"])
        out = {(r.gc, r.gr): r for r in grid.grid_idw(df, T, radius=2.0).collect()}
        v = out[(2, 3)].value  # center (2.5, 6.5): d=0.1 vs d=0.9
        assert v < 10.0  # dominated by the nearby 0-valued point

    def test_validation(self, spark, pts):
        from gdal_common_python_spark.operators import grid

        with pytest.raises(ValueError, match="smoothing"):
            grid.grid_idw(pts, T, radius=1.0, smoothing=0.0)

    def test_no_python_in_plan(self, spark, pts):
        from gdal_common_python_spark.operators import grid

        plan = grid.grid_idw(pts, T, radius=1.0)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestMetrics:
    def test_metrics_values(self, spark, pts):
        from gdal_common_python_spark.operators import grid

        out = {(r.gc, r.gr): r for r in grid.grid_metrics(pts, T, radius=0.4).collect()}
        assert set(out) == {(2, 3), (8, 8)}
        m = out[(2, 3)]
        assert m.n_points == 2
        assert (m.vmin, m.vmax, m.vrange) == (10.0, 20.0, 10.0)
        assert m.avg_dist == 0.0  # both points sit ON the pixel center
        s = out[(8, 8)]
        assert s.n_points == 1 and s.vrange == 0.0 and s.avg_dist == 0.0

    def test_avg_dist_quantized(self, spark):
        from gdal_common_python_spark.operators import grid

        # one point exactly 1.0 from the 4-neighbor pixel centers
        pts1 = spark.createDataFrame([(1, 2.5, 6.5, 5.0)], ["point_id", "x", "y", "v"])
        out = {(r.gc, r.gr): r.avg_dist for r in grid.grid_metrics(pts1, T, radius=1.0).collect()}
        assert out[(1, 3)] == 1.0 and out[(2, 2)] == 1.0
        assert out[(2, 3)] == 0.0

    def test_metrics_pure_codegen(self, spark, pts):
        from gdal_common_python_spark.operators import grid

        plan = grid.grid_metrics(pts, T, radius=1.0)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert plan.count("Exchange") == 1  # ONE pixel-groupBy shuffle
