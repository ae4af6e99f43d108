"""segmentize — max-length invariant, vertex preservation, plan shape."""

import math

import pytest


@pytest.fixture(scope="module")
def square(spark):
    # 10x10 open square ring
    ring = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    return spark.createDataFrame([(1, [ring])], "zone_id long, rings4326 array<array<array<double>>>")


def test_even_split(spark, square):
    from gdal_common_python_spark.operators import segmentize

    rows = sorted(
        (r.idx, r.x, r.y) for r in segmentize.segmentize(square, 3.0).collect()
    )
    # each 10-long edge splits into ceil(10/3)=4 parts -> 16 vertices total
    assert len(rows) == 16
    # originals preserved at positions 0,4,8,12
    assert rows[0][1:] == (0.0, 0.0)
    assert rows[4][1:] == (10.0, 0.0)
    assert rows[8][1:] == (10.0, 10.0)
    assert rows[12][1:] == (0.0, 10.0)
    # inserted points evenly spaced on the first edge
    assert rows[1][1:] == (2.5, 0.0) and rows[2][1:] == (5.0, 0.0)


def test_max_len_invariant(spark, square):
    from gdal_common_python_spark.operators import segmentize

    rows = sorted(
        (r.idx, r.x, r.y) for r in segmentize.segmentize(square, 2.7).collect()
    )
    pts = [(x, y) for _, x, y in rows]
    for a, b in zip(pts, pts[1:] + pts[:1]):
        assert math.dist(a, b) <= 2.7 + 1e-12


def test_short_edges_untouched(spark, square):
    from gdal_common_python_spark.operators import segmentize

    rows = segmentize.segmentize(square, 50.0).collect()
    assert len(rows) == 4  # nothing inserted


def test_zero_shuffle_zero_python(spark, square):
    from gdal_common_python_spark.operators import segmentize

    plan = segmentize.segmentize(square, 3.0)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_validation(spark, square):
    from gdal_common_python_spark.operators import segmentize

    with pytest.raises(ValueError, match="max_len"):
        segmentize.segmentize(square, 0.0)
