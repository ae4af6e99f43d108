"""gdal_sieve analog: the distributed one-pass sieve must equal a scalar
reference (flood-fill labels, cross-value adjacency, largest-neighbor
absorb with min-id tie-break) on the untiled raster, including regions and
adjacencies that span tile borders."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import polygonize

NODATA = -9999.0
PID = 1 << 32


def _tile_df(spark, arr: np.ndarray, tile: int):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            th, tw = min(tile, h - ty), min(tile, w - tx)
            rows.append(
                dict(
                    raster_id="t", band=1, nodata=NODATA,
                    tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                    pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def _reference(arr: np.ndarray, threshold: int):
    """Scalar sieve: flood-fill 4-connected equal-value regions (region id
    = min global pixel id), then the one-pass largest-neighbor merge."""
    h, w = arr.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    for i in range(h):
        for j in range(w):
            if arr[i, j] == NODATA or lab[i, j] >= 0:
                continue
            stack, members = [(i, j)], []
            seen = {(i, j)}
            while stack:
                y, x = stack.pop()
                members.append((y, x))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (
                        0 <= yy < h and 0 <= xx < w and (yy, xx) not in seen
                        and arr[yy, xx] == arr[i, j]
                    ):
                        seen.add((yy, xx))
                        stack.append((yy, xx))
            rid = min(y * PID + x for y, x in members)
            for y, x in members:
                lab[y, x] = rid
    sizes, values = {}, {}
    for i in range(h):
        for j in range(w):
            if lab[i, j] >= 0:
                sizes[lab[i, j]] = sizes.get(lab[i, j], 0) + 1
                values[lab[i, j]] = arr[i, j]
    adj = set()
    for i in range(h):
        for j in range(w):
            if lab[i, j] < 0:
                continue
            for dy, dx in ((1, 0), (0, 1)):
                yy, xx = i + dy, j + dx
                if yy < h and xx < w and lab[yy, xx] >= 0 and lab[yy, xx] != lab[i, j]:
                    adj.add((lab[i, j], lab[yy, xx]))
                    adj.add((lab[yy, xx], lab[i, j]))
    out = {}
    for r, n in sizes.items():
        tgt = r
        if n < threshold:
            nbrs = [b for a, b in adj if a == r]
            if nbrs:
                tgt = min(nbrs, key=lambda b: (-sizes[b], b))
        out[r] = (values[r], n, tgt, values[tgt])
    return out


class TestSieve:
    def test_matches_untiled_reference(self, spark):
        rng = np.random.default_rng(52)
        # few distinct values -> regions of many sizes, some spanning tiles
        arr = rng.integers(0, 4, size=(20, 28)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.04] = NODATA
        got = {
            r.region: (r.value, r.n_pixels, r.new_region, r.new_value)
            for r in polygonize.sieve_regions(
                spark, _tile_df(spark, arr, tile=8), threshold=5, tile_size=8
            ).collect()
        }
        assert got == _reference(arr, 5)

    def test_tie_break_and_big_regions_stay(self, spark):
        # a 1-pixel island (value 9) between two equal-size neighbors:
        # tie-break -> the neighbor region with the SMALLER id (the north one)
        arr = np.full((6, 6), 1.0)
        arr[3:, :] = 2.0
        arr[2, 3] = 9.0
        got = {
            r.region: r
            for r in polygonize.sieve_regions(
                spark, _tile_df(spark, arr, tile=4), threshold=3, tile_size=4
            ).collect()
        }
        island = got[2 * PID + 3]
        north, south = got[0], got[3 * PID]
        assert north.n_pixels == 17 and south.n_pixels == 18
        # island touches north(17px) and south(18px): south is larger
        assert island.new_region == south.region and island.new_value == 2.0
        assert north.new_region == north.region  # big regions untouched
        assert south.new_region == south.region
