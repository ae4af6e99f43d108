"""Raster point sampling (gdallocationinfo analog): tiled sampling must
match a direct numpy lookup on the untiled raster, including the R1
trunc-toward-zero quirk (a point < 1 px left/above the origin aliases into
column/row 0 — rasters.py:113-116 parity) and nodata masking."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import sample

NODATA = -9999.0


def _raster_df(spark, arr: np.ndarray, tile: int, ox=10.0, oy=20.0, px=0.5):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            th, tw = min(tile, h - ty), min(tile, w - tx)
            rows.append(
                dict(
                    raster_id="t", band=1, nodata=NODATA,
                    origin_x=ox, origin_y=oy, px_x=px, px_y=-px,
                    width=w, height=h,
                    tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                    pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def _points_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame([dict(point_id=i, x=x, y=y) for i, (x, y) in enumerate(pts)])
    )


class TestSample:
    def test_matches_untiled_lookup(self, spark):
        rng = np.random.default_rng(49)
        arr = rng.integers(0, 100, size=(19, 27)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.1] = NODATA
        h, w = arr.shape
        ox, oy, px = 10.0, 20.0, 0.5
        pts = [
            (ox + rng.uniform(-2, w * px + 2), oy - rng.uniform(-2, h * px + 2))
            for _ in range(200)
        ]
        tiles = _raster_df(spark, arr, tile=8, ox=ox, oy=oy, px=px)
        got = {
            r.point_id: (r.px, r.py, r.value, r.value_masked)
            for r in sample.sample_raster_at_points(
                _points_df(spark, pts), tiles, tile_size=8
            ).collect()
        }
        expect = {}
        for i, (x, y) in enumerate(pts):
            gx = int(np.trunc((x - ox) / px))
            gy = int(np.trunc((y - oy) / -px))
            if 0 <= gx < w and 0 <= gy < h:
                v = arr[gy, gx]
                expect[i] = (gx, gy, v, None if v == NODATA else v)
        assert got == expect

    def test_trunc_alias_quirk(self, spark):
        arr = np.arange(16, dtype=np.float64).reshape(4, 4)
        tiles = _raster_df(spark, arr, tile=4, ox=0.0, oy=0.0, px=1.0)
        # x=-0.5 is OUTSIDE the extent but trunc-toward-zero -> col 0 (R1 parity)
        pts = [(-0.5, -0.5), (-1.5, -0.5), (3.5, -3.5)]
        rows = sample.sample_raster_at_points(
            _points_df(spark, pts), tiles, tile_size=4
        ).collect()
        got = {r.point_id: (r.px, r.py, r.value) for r in rows}
        assert got == {0: (0, 0, 0.0), 2: (3, 3, 15.0)}  # point 1 truly outside


class TestTrackProfile:
    def test_planted_track_gain_loss(self, spark):
        # raster: one row of increasing-then-dipping values; px=0.5, origin
        # (10, 20), py negative -> y just below 20 samples row 0
        arr = np.array([[5.0, 8.0, 3.0, 3.0, NODATA, 11.0]])
        tiles = _raster_df(spark, arr, tile=4)
        # track visits columns 0,1,2,3,4(nodata),5 left to right
        spans = [
            ("geo", f"POINT({10.0 + 0.25 + 0.5 * i} {20.0 - 0.1})", None, i)
            for i in range(6)
        ]
        docs = spark.createDataFrame(
            [("d0", spans)],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )
        out = sample.track_profile(docs, tiles, tile_size=4).collect()
        assert len(out) == 1
        r = out[0]
        # kept values in order: 5, 8, 3, 3, 11 (nodata dropped)
        assert r.n_samples == 5
        assert (r.vmin, r.vmax) == (3.0, 11.0)
        assert r.gain_micro == int(3e6) + int(8e6)   # 5->8, 3->11
        assert r.loss_micro == int(5e6)              # 8->3
