"""grid_nearest: brute-force parity + deterministic ties + plan shape."""

import numpy as np
import pytest

from gdal_common_python_spark.operators.grid import grid_nearest

_T = dict(origin_x=0.0, origin_y=8.0, px_x=1.0, px_y=-1.0, width=8, height=8)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "x double, y double, v double")


def test_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    rows = [
        (float(x), float(y), float(v))
        for x, y, v in zip(
            rng.uniform(-1, 9, 40), rng.uniform(-1, 9, 40), rng.integers(0, 9, 40)
        )
    ]
    r = 1.7
    got = {
        (q.gc, q.gr): (q.n_points, q.d2, q.value)
        for q in grid_nearest(_pts(spark, rows), _T, radius=r).collect()
    }
    want = {}
    for gc in range(8):
        for gr in range(8):
            cx, cy = 0.0 + (gc + 0.5) * 1.0, 8.0 + (gr + 0.5) * -1.0
            cands = sorted(
                ((cx - x) ** 2 + (cy - y) ** 2, x, y, v)
                for x, y, v in rows
                if (cx - x) ** 2 + (cy - y) ** 2 <= r * r
            )
            if cands:
                want[(gc, gr)] = (len(cands), cands[0][0], cands[0][3])
    assert got == want


def test_tie_break_is_deterministic(spark):
    # two points equidistant from pixel (0,0)'s center (0.5, 7.5): the
    # (d2, x, y, v)-lexicographic minimum wins -> smaller x
    rows = [(0.0, 7.5, 9.0), (1.0, 7.5, 1.0)]
    out = grid_nearest(_pts(spark, rows), _T, radius=0.6).collect()
    px = {(r.gc, r.gr): r.value for r in out}
    assert px[(0, 0)] == 9.0


def test_radius_validation(spark):
    with pytest.raises(ValueError, match="radius"):
        grid_nearest(_pts(spark, [(0.0, 0.0, 1.0)]), _T, radius=0.0)


def test_no_python_and_partial_agg(spark):
    out = grid_nearest(_pts(spark, [(0.5, 7.5, 1.0)]), _T, radius=1.0)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan
    # map-side combine before the pixel shuffle (struct-min lowers to
    # SortAggregate)
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
