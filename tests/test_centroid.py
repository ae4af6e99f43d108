"""Quantized shoelace centroid: exact on symmetric shapes (quantization
cancels), physically correct on asymmetric ones, holes subtract."""

import numpy as np
import pandas as pd
import pytest

from gdal_common_python_spark.functions import measures


def _df(spark, rings_list):
    return spark.createDataFrame(
        pd.DataFrame(
            [dict(zone_id=i, rings4326=r) for i, r in enumerate(rings_list)]
        )
    )


def _sq(x0, y0, s, ccw=True):
    pts = [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]
    return pts if ccw else pts[::-1]


class TestCentroid:
    def test_square_and_hole(self, spark):
        # unit square centered at (0.5, 0.5); same square with a CW hole in
        # the NE quadrant pulls the centroid toward the SW
        plain = [_sq(0.0, 0.0, 1.0)]
        holed = [_sq(0.0, 0.0, 1.0), _sq(0.5, 0.5, 0.5, ccw=False)]
        rows = {
            r.zone_id: (r.centroid_x, r.centroid_y)
            for r in measures.centroid(_df(spark, [plain, holed])).collect()
        }
        assert rows[0] == pytest.approx((0.5, 0.5), abs=1e-5)
        # exact continuous answer: (0.4166..., 0.4166...)
        assert rows[1] == pytest.approx((5 / 12, 5 / 12), abs=1e-4)

    def test_translation_equivariance(self, spark):
        base = [_sq(0.0, 0.0, 2.0)]
        moved = [_sq(10.0, -3.0, 2.0)]
        rows = {
            r.zone_id: (r.centroid_x, r.centroid_y)
            for r in measures.centroid(_df(spark, [base, moved])).collect()
        }
        assert rows[1][0] == pytest.approx(rows[0][0] + 10.0, abs=1e-5)
        assert rows[1][1] == pytest.approx(rows[0][1] - 3.0, abs=1e-5)

    def test_degenerate_is_null(self, spark):
        line = [[[0.0, 0.0], [1.0, 1.0]]]  # zero-area "ring"
        rows = measures.centroid(_df(spark, [line])).collect()
        assert rows[0].centroid_x is None and rows[0].centroid_y is None
