"""Track analytics: planted-case semantics + partitioning invariance.
The driver gates (track_stats, track_dwells) hash-pin sf0.01 vs SQL
window / recursive-CTE oracles.
"""

import math

import pandas as pd
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import tracks


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "offset", "x", "y"])
    )


class TestTrackStats:
    def test_planted_track(self, spark):
        # a 3-4-5 triangle walk: hops 3, 4, 5
        pts = _pts(
            spark,
            [(1, 0, 0.0, 0.0), (1, 1, 3.0, 0.0), (1, 2, 3.0, 4.0), (1, 3, 0.0, 0.0)],
        )
        r = tracks.track_stats(pts).collect()[0]
        assert r.n_points == 4
        assert r.len_micro == 12_000_000
        assert r.max_hop_micro == 5_000_000
        assert (r.min_x, r.min_y, r.max_x, r.max_y) == (0.0, 0.0, 3.0, 4.0)

    def test_singleton_track(self, spark):
        r = tracks.track_stats(_pts(spark, [(9, 0, 1.0, 2.0)])).collect()[0]
        assert r.n_points == 1 and r.len_micro == 0 and r.max_hop_micro == 0

    def test_partitioning_invariant(self, spark):
        import numpy as np

        rng = np.random.default_rng(23)
        rows = [
            (int(i % 37), int(i), float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10)))
            for i in range(1500)
        ]
        a = {r.track_id: r.len_micro for r in tracks.track_stats(_pts(spark, rows)).collect()}
        b = {
            r.track_id: r.len_micro
            for r in tracks.track_stats(_pts(spark, rows).repartition(11)).collect()
        }
        assert a == b


class TestDwells:
    def test_anchor_rule(self, spark):
        # jitter around (0,0) within r=1, then jump to (10,0) and jitter there
        pts = _pts(
            spark,
            [
                (1, 0, 0.0, 0.0),
                (1, 1, 0.5, 0.2),   # within 1.0 of anchor (0,0)
                (1, 2, 0.9, 0.0),
                (1, 3, 10.0, 0.0),  # new dwell
                (1, 4, 10.4, 0.3),  # within 1.0 of (10,0)
                (1, 5, 12.0, 0.0),  # leaves (10,0) disk -> third dwell
            ],
        )
        rows = sorted(
            tracks.dwell_points(pts, radius=1.0).collect(), key=lambda r: r.dwell_ix
        )
        assert [(r.dwell_ix, r.n_points, r.anchor_x) for r in rows] == [
            (1, 3, 0.0),
            (2, 2, 10.0),
            (3, 1, 12.0),
        ]

    def test_boundary_is_inclusive(self, spark):
        # a point EXACTLY at radius stays in the dwell (strict > starts new)
        pts = _pts(spark, [(1, 0, 0.0, 0.0), (1, 1, 1.0, 0.0)])
        rows = tracks.dwell_points(pts, radius=1.0).collect()
        assert len(rows) == 1 and rows[0].n_points == 2


def test_line_interpolate_midpoint_properties(spark, docs):
    import numpy as np

    from gdal_common_python_spark.operators import spatial_join as sj
    from gdal_common_python_spark.operators import tracks

    pts = sj.geo_points(docs)
    mid = tracks.line_interpolate(pts, 1, 2).toPandas()
    pdf = pts.toPandas().sort_values(["doc_id", "offset"])
    by = {k: g[["x", "y"]].to_numpy() for k, g in pdf.groupby("doc_id")}
    assert len(mid) > 0
    for r in mid.itertuples():
        p = by[r.track_id]
        seg = np.floor(np.sqrt(((p[1:] - p[:-1]) ** 2).sum(axis=1)) * 1e6).astype(np.int64)
        total = seg.sum()
        assert total > 0
        target = total // 2
        cum = np.cumsum(seg)
        i = int(np.argmax((cum >= target) & (seg > 0)))
        t = (target - (cum[i] - seg[i])) / seg[i]
        exp = p[i] + t * (p[i + 1] - p[i])
        assert abs(r.pos_x - exp[0]) < 1e-12 and abs(r.pos_y - exp[1]) < 1e-12
    # f=0 -> first point of every multi-point track with nonzero length
    z = tracks.line_interpolate(pts, 0, 1).toPandas()
    for r in z.itertuples():
        assert abs(r.pos_x - by[r.track_id][0][0]) < 1e-12
    # f=1 -> cumulative end: pos equals last vertex of the quantized walk
    e = tracks.line_interpolate(pts, 1, 1).toPandas()
    assert set(e.track_id) == set(z.track_id)


def test_track_resample_straight_line(spark):
    from gdal_common_python_spark.operators import tracks

    # straight track 0..4 on the x axis: 5-point resample = unit spacing
    pts = _pts(spark, [(1, i, float(i), 0.0) for i in range(5)])
    out = sorted(
        (r.k, r.pos_x, r.pos_y) for r in tracks.track_resample(pts, 5).collect()
    )
    assert [k for k, _, _ in out] == [0, 1, 2, 3, 4]
    for k, x, y in out:
        assert abs(x - float(k)) < 1e-9 and y == 0.0


def test_track_resample_degenerate_and_validation(spark):
    import pytest

    from gdal_common_python_spark.operators import tracks

    # single-point and coincident-point tracks emit no rows
    pts = _pts(spark, [(1, 0, 1.0, 1.0), (2, 0, 3.0, 3.0), (2, 1, 3.0, 3.0)])
    assert tracks.track_resample(pts, 4).count() == 0
    with pytest.raises(ValueError):
        tracks.track_resample(pts, 1)


def test_track_resample_points_on_polyline(spark):
    """Property: every resampled point lies on some segment of its track
    (within float tolerance) and k covers the full 0..n-1 grid for tracks
    with nonzero quantized length."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for tid in range(12):
        m = rng.integers(2, 8)
        xs = rng.uniform(-50, 50, m)
        ys = rng.uniform(-50, 50, m)
        rows += [(tid, i, float(xs[i]), float(ys[i])) for i in range(m)]
    pts = _pts(spark, rows)
    out = tracks.track_resample(pts, 6).toPandas()
    pdf = pts.toPandas().sort_values(["doc_id", "offset"])
    by = {k: g[["x", "y"]].to_numpy() for k, g in pdf.groupby("doc_id")}
    for tid, g in out.groupby("track_id"):
        assert sorted(g.k) == list(range(6))
        p = by[tid]
        for r in g.itertuples():
            a, b = p[:-1], p[1:]
            ab = b - a
            L2 = (ab ** 2).sum(axis=1)
            L2[L2 == 0] = 1.0
            t = (((r.pos_x - a[:, 0]) * ab[:, 0] + (r.pos_y - a[:, 1]) * ab[:, 1]) / L2)
            t = np.clip(t, 0, 1)
            c = a + t[:, None] * ab
            d = np.sqrt(((c - [r.pos_x, r.pos_y]) ** 2).sum(axis=1)).min()
            assert d < 1e-6, (tid, r.k, d)
