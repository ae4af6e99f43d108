"""gdal_viewshed analog: bounded-radius visibility from observer pixels.

No reference analog (reference raster ops stop at zonal/mosaic) — fifth
consumer of the shared halo-exchange machinery (`focal.py`). gdal_viewshed
computes, for an observer cell, which cells within ``-md maxdist`` have an
unobstructed line of sight.

Pinned EXACT semantic (floats never compared):
- the sight line from observer o to target t is the integer DDA path with
  n = Chebyshev(o, t) steps; step i sits at
      (ox + floor((i*dx)/n + 0.5),  oy + floor((i*dy)/n + 0.5))
  — the division is one IEEE double op on identical trees both engines;
- target t (elevation h_t, valid) is VISIBLE iff no intermediate step i
  (0 < i < n) satisfies   (h_i - h0) * n >= (h_t - h0) * i   with all
  quantities int64 (integer-raster discipline) and h0 = observer elevation
  + obs_height — cross-multiplied angle comparison, no division at all;
- nodata intermediates are opaque (block), nodata targets emit no row,
  the observer pixel itself is visible.

Distributed shape: observers ride a tile-key join onto ONE
halo_exchange(radius=R) pass (R <= tile edge, the proximity constraint);
each observer's full disk lives inside its tile's padded window, so the
kernel is embarrassingly parallel per tile and shuffle stays
∝ tile perimeter × R + observers. Output is sparse visible-pixel rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .focal import halo_exchange, assemble_padded, grouped_tile_apply

_VIS_T = T.StructType(
    [
        T.StructField("obs_id", T.IntegerType()),
        T.StructField("gxs", T.ArrayType(T.LongType())),
        T.StructField("gys", T.ArrayType(T.LongType())),
    ]
)


def _paths(R: int):
    """offset -> (ys, xs) integer DDA step offsets (excluding endpoints),
    cached per radius. floor((i*d)/n + 0.5) — the pinned rounding tree."""
    table: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            n = max(abs(dx), abs(dy))
            if n <= 1:
                table[(dy, dx)] = (np.empty(0, np.int64), np.empty(0, np.int64))
                continue
            i = np.arange(1, n, dtype=np.float64)
            ys = np.floor((i * dy) / n + 0.5).astype(np.int64)
            xs = np.floor((i * dx) / n + 0.5).astype(np.int64)
            table[(dy, dx)] = (ys, xs)
    return table


def viewshed(
    tiles: DataFrame,
    raster_id: str,
    band: int,
    observers: list[tuple[int, int]],
    maxdist: int,
    obs_height: int = 2,
    tile_size: int = 32,
) -> DataFrame:
    """Visible pixels within Chebyshev ``maxdist`` of each observer
    (observers are (gx, gy) pixel coords; obs_id = list index) ->
    (obs_id, gx, gy) sparse rows."""
    R = int(maxdist)
    if R < 1:
        raise ValueError(f"maxdist must be >= 1, got {maxdist}")
    src = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == int(band)))
    obs = [(int(i), int(gx), int(gy)) for i, (gx, gy) in enumerate(observers)]
    by_tile: dict[tuple[int, int], list] = {}
    for i, gx, gy in obs:
        by_tile.setdefault((gx // tile_size, gy // tile_size), []).append((i, gx, gy))
    # observer locality: only tiles within 1 tile of an observer tile can
    # contribute halo pixels (R <= tile edge) — prune BEFORE the exchange,
    # so the shuffle scales with the observer set, not the raster
    near = {
        (tx + dx, ty + dy)
        for (tx, ty) in by_tile
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    }
    def _key(tx, ty):  # single prunable int64 key (tile_y >= 0 always)
        return tx * (1 << 32) + ty

    src = src.filter(
        (F.col("tile_x").cast("long") * (1 << 32) + F.col("tile_y")).isin(
            [_key(tx, ty) for tx, ty in sorted(near)]
        )
    )
    halos = halo_exchange(src, radius=R)
    # and only observer-owning groups run the kernel
    halos = halos.filter(
        (F.col("tile_x").cast("long") * (1 << 32) + F.col("tile_y")).isin(
            [_key(tx, ty) for tx, ty in sorted(by_tile)]
        )
    )
    cols = [f.name for f in _VIS_T.fields]
    paths = _paths(R)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, R)
        if got is None:
            return pd.DataFrame(columns=cols)
        c, pad = got
        mine = by_tile.get((int(c.tile_x), int(c.tile_y)), [])
        if not mine:
            return pd.DataFrame(columns=cols)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        gx0 = int(c.tile_x) * tile_size
        gy0 = int(c.tile_y) * tile_size
        rows = []
        for obs_id, ogx, ogy in mine:
            py, px = ogy - gy0 + R, ogx - gx0 + R  # observer in padded coords
            # observers past a truncated edge tile's real extent are
            # out-of-raster: skip them like nodata observers instead of
            # indexing past the padded array
            if py < 0 or py >= pad.shape[0] or px < 0 or px >= pad.shape[1]:
                continue
            if not valid[py, px]:
                continue
            h0 = int(pad[py, px]) + int(obs_height)
            vis_x: list[int] = []
            vis_y: list[int] = []
            for dy in range(-R, R + 1):
                ty = py + dy
                if ty < 0 or ty >= pad.shape[0]:
                    continue
                for dx in range(-R, R + 1):
                    tx = px + dx
                    if tx < 0 or tx >= pad.shape[1] or not valid[ty, tx]:
                        continue
                    n = max(abs(dx), abs(dy))
                    if n <= 1:
                        vis_x.append(ogx + dx)
                        vis_y.append(ogy + dy)
                        continue
                    ht = int(pad[ty, tx])
                    ys, xs = paths[(dy, dx)]
                    iy = py + ys
                    ix = px + xs
                    hv = pad[iy, ix]
                    vv = valid[iy, ix]
                    ii = np.arange(1, n, dtype=np.int64)
                    hi = np.where(vv, hv, 0).astype(np.int64)
                    blocked = (~vv) | ((hi - h0) * n >= (ht - h0) * ii)
                    if not blocked.any():
                        vis_x.append(ogx + dx)
                        vis_y.append(ogy + dy)
            if vis_x:
                rows.append((obs_id, [int(v) for v in vis_x], [int(v) for v in vis_y]))
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows, columns=cols)

    t = grouped_tile_apply(halos, kernel, _VIS_T)
    return t.select(
        "obs_id", F.explode(F.arrays_zip("gxs", "gys")).alias("z")
    ).select("obs_id", F.col("z.gxs").alias("gx"), F.col("z.gys").alias("gy"))


def viewshed_oracle_sql(
    tiles_rel: str,
    raster_id: str,
    band: int,
    observers: list[tuple[int, int]],
    maxdist: int,
    obs_height: int = 2,
    tile_size: int = 32,
) -> str:
    """DuckDB mirror — identical DDA rounding tree + identical integer
    cross-multiplied blocking predicate."""
    R = int(maxdist)
    obs_vals = ", ".join(
        f"({i}, {int(gx)}, {int(gy)})" for i, (gx, gy) in enumerate(observers)
    )
    return f"""
WITH px AS (
  SELECT CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v, nodata
  FROM (
    SELECT tile_x, tile_y, tile_w, nodata,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
    WHERE raster_id = '{raster_id}' AND band = {int(band)}
  )
),
obs AS (
  SELECT o.obs_id, o.ogx, o.ogy, CAST(p.v AS BIGINT) + {int(obs_height)} AS h0
  FROM (VALUES {obs_vals}) AS o(obs_id, ogx, ogy)
  JOIN px p ON p.gx = o.ogx AND p.gy = o.ogy AND p.v != p.nodata
),
tgt AS (
  SELECT o.obs_id, o.ogx, o.ogy, o.h0, p.gx, p.gy, CAST(p.v AS BIGINT) AS ht,
         greatest(abs(p.gx - o.ogx), abs(p.gy - o.ogy)) AS n
  FROM obs o
  JOIN px p ON p.gx BETWEEN o.ogx - {R} AND o.ogx + {R}
           AND p.gy BETWEEN o.ogy - {R} AND o.ogy + {R}
           AND p.v != p.nodata
),
steps AS (
  SELECT t.obs_id, t.gx, t.gy, t.h0, t.ht, t.n, CAST(i AS BIGINT) AS i,
         t.ogx + CAST(floor((i * (t.gx - t.ogx)) / t.n + 0.5) AS BIGINT) AS sx,
         t.ogy + CAST(floor((i * (t.gy - t.ogy)) / t.n + 0.5) AS BIGINT) AS sy
  FROM tgt t, LATERAL unnest(range(1, CAST(t.n AS BIGINT))) AS u(i)
  WHERE t.n > 1
),
blocked AS (
  SELECT DISTINCT st.obs_id, st.gx, st.gy
  FROM steps st
  LEFT JOIN px s ON s.gx = st.sx AND s.gy = st.sy
  WHERE s.gx IS NULL OR s.v = s.nodata
     OR (CAST(s.v AS BIGINT) - st.h0) * st.n >= (st.ht - st.h0) * st.i
)
SELECT t.obs_id, t.gx, t.gy
FROM tgt t
LEFT JOIN blocked b ON b.obs_id = t.obs_id AND b.gx = t.gx AND b.gy = t.gy
WHERE b.obs_id IS NULL
"""
