"""Distributed convex hull: the two-level chain must equal a single-array
chain on all points regardless of partitioning; strictly-convex contract
(collinear boundary points excluded); hull invariants."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import hull


def _df(spark, pts, parts=7):
    return spark.createDataFrame(
        pd.DataFrame(pts, columns=["x", "y"])
    ).repartition(parts)


class TestHull:
    def test_matches_single_level(self, spark):
        rng = np.random.default_rng(54)
        pts = rng.normal(size=(800, 2)) * np.array([10.0, 3.0])
        got = {
            (r.x, r.y) for r in hull.convex_hull(_df(spark, pts)).collect()
        }
        expect = {tuple(p) for p in hull.monotone_chain(pts)}
        assert got == expect
        assert 3 <= len(got) < 60

    def test_partitioning_invariance(self, spark):
        rng = np.random.default_rng(55)
        pts = rng.uniform(-5, 5, size=(300, 2))
        a = {(r.x, r.y) for r in hull.convex_hull(_df(spark, pts, parts=1)).collect()}
        b = {(r.x, r.y) for r in hull.convex_hull(_df(spark, pts, parts=13)).collect()}
        assert a == b

    def test_strictly_convex_excludes_collinear(self, spark):
        pts = np.array(
            [[0.0, 0.0], [2.0, 0.0], [1.0, 0.0], [2.0, 2.0], [0.0, 2.0], [1.0, 1.0]]
        )
        got = {(r.x, r.y) for r in hull.convex_hull(_df(spark, pts, parts=3)).collect()}
        # (1,0) lies on the bottom edge, (1,1) is interior: both excluded
        assert got == {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}

    def test_all_points_inside(self, spark):
        rng = np.random.default_rng(56)
        pts = rng.uniform(size=(200, 2))
        h = hull.monotone_chain(pts)
        # every input point is left-of-or-on every CCW hull edge
        for i in range(len(h)):
            a, b = h[i], h[(i + 1) % len(h)]
            cr = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
            assert (cr >= -1e-12).all()


def test_point_on_surface_is_interior(spark, zones, sf_dir):
    import os

    from gdal_common_python_spark.functions import measures
    from gdal_common_python_spark.kernels import geom

    edges = spark.read.parquet(os.path.join(sf_dir, "zone_edges.parquet"))
    pos = measures.point_on_surface(zones, edges).toPandas()
    import numpy as np

    rings = {
        r["zone_id"]: geom.rings_from_cell(r["rings4326"])
        for r in zones.select("zone_id", "rings4326").collect()
    }
    assert len(pos) == len(rings)
    for r in pos.itertuples():
        e = geom.rings_to_edges(rings[r.zone_id])
        inside = geom.points_in_rings(np.array([r.pos_x]), np.array([r.pos_y]), e)
        assert inside[0], r.zone_id
