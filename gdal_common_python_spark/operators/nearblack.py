"""nearblack analog: edge-collar detection over the tiled raster table.

No reference analog (the reference raster ops stop at zonal/mosaic,
`lib/zonal.py`) — this mirrors GDAL's ``nearblack`` utility semantics,
simplified to one band at a time: scanning inward from each of the four
raster edges, a pixel belongs to the collar for that edge iff EVERY pixel
between the edge and it (inclusive) is "near black", i.e.

    |v - black| <= near

The scan stops at the first non-near pixel (GDAL's ``-nb 0`` behavior;
the ``-nb k`` skip-tolerance and multi-band AND are not modeled). Nodata
pixels are treated as regular values — a nodata value far from ``black``
stops the scan, which is deterministic and shared with the oracle.

Hash-exact by construction: the only arithmetic is |v - black| <= near
(one IEEE subtract + compare, bit-identical in Spark and DuckDB) and
integer run bookkeeping.

Distributed shape (the segmented-scan split):
  1. per-tile kernel (mapInPandas, NO halo, NO grouping — each tile is
     independent): vectorized leading/trailing near-run lengths for every
     tile row and column — output one summary row per tile with arrays;
  2. the per-(raster, band, scanline) merge across tiles is a window over
     tile positions: a tile's run counts toward the global leading run
     iff every tile before it on the scanline is fully near (exclusive
     prefix min of the full flag), then one groupBy sums contributions —
     shuffle ∝ pixels / tile_size (scanline summaries), never pixels;
  3. collar pixels come from a native posexplode of the tile table joined
     to the tiny per-row / per-column limit tables (size-gated broadcast:
     H + W rows per raster), so pixel rows are never shuffled.

At 100 TB: step 1 is embarrassingly parallel, step 2's window partitions
are one scanline of tile summaries (width/tile_size entries — bounded),
step 3 is broadcast-only. No stage materializes a full raster anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

_RUNS_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("bw", T.IntegerType()),
        T.StructField("bh", T.IntegerType()),
        T.StructField("lruns", T.ArrayType(T.IntegerType())),
        T.StructField("rruns", T.ArrayType(T.IntegerType())),
        T.StructField("truns", T.ArrayType(T.IntegerType())),
        T.StructField("bruns", T.ArrayType(T.IntegerType())),
    ]
)


def _leading_runs(mask: np.ndarray) -> np.ndarray:
    """Per-row length of the leading all-True run of a 2-D bool mask."""
    first_false = np.argmax(~mask, axis=1)
    return np.where(mask.all(axis=1), mask.shape[1], first_false).astype(np.int32)


def _tile_runs_kernel(black: float, near: float):
    def kernel(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                bw = int(r.tile_w)
                arr = np.asarray(r.pixels, dtype=np.float64).reshape(-1, bw)
                bh = arr.shape[0]
                mask = np.abs(arr - black) <= near
                out.append(
                    (
                        r.raster_id, int(r.band), int(r.tile_x), int(r.tile_y),
                        bw, bh,
                        _leading_runs(mask).tolist(),
                        _leading_runs(mask[:, ::-1]).tolist(),
                        _leading_runs(mask.T).tolist(),
                        _leading_runs(mask.T[:, ::-1]).tolist(),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in _RUNS_T.fields])

    return kernel


def _scanline_limits(runs: DataFrame, axis_rows: bool, tile_size: int) -> DataFrame:
    """Merge per-tile run summaries into per-scanline global limits
    (raster_id, band, gidx, lead, trail, n): ``lead``/``trail`` are the
    collar run lengths from the two ends of the scanline, ``n`` its total
    length. ``axis_rows=True`` merges row scans (gidx = gy), else column
    scans (gidx = gx)."""
    if axis_rows:
        fwd, rev, li_to_g, tpos, w = "lruns", "rruns", "tile_y", "tile_x", "bw"
    else:
        fwd, rev, li_to_g, tpos, w = "truns", "bruns", "tile_x", "tile_y", "bh"
    ex = runs.select(
        "raster_id", "band",
        F.col(tpos).alias("tpos"), F.col(w).alias("w"),
        (F.col(li_to_g).cast("long") * tile_size).alias("gbase"),
        F.posexplode(F.arrays_zip(fwd, rev)).alias("li", "z"),
    ).select(
        "raster_id", "band", "tpos", "w",
        (F.col("gbase") + F.col("li")).alias("gidx"),
        F.col(f"z.{fwd}").alias("fr"),
        F.col(f"z.{rev}").alias("rr"),
    )
    key = ["raster_id", "band", "gidx"]
    asc = Window.partitionBy(*key).orderBy(F.col("tpos").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    desc = Window.partitionBy(*key).orderBy(F.col("tpos").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    full_f = (F.col("fr") == F.col("w")).cast("int")
    full_r = (F.col("rr") == F.col("w")).cast("int")
    contrib = ex.select(
        *key, "w",
        (F.coalesce(F.min(full_f).over(asc), F.lit(1)) * F.col("fr")).alias("cf"),
        (F.coalesce(F.min(full_r).over(desc), F.lit(1)) * F.col("rr")).alias("cr"),
    )
    return contrib.groupBy(*key).agg(
        F.sum("cf").alias("lead"),
        F.sum("cr").alias("trail"),
        F.sum("w").alias("n"),
    )


def nearblack_pixels(
    tiles: DataFrame,
    black: float = 0.0,
    near: float = 0.0,
    tile_size: int = 32,
) -> DataFrame:
    """Collar pixels -> (raster_id, band, gx, gy, v, from_left, from_right,
    from_top, from_bottom); flag columns are 0/1 ints, one row per pixel
    reachable from at least one edge through an unbroken near-black run."""
    base = tiles.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w", "pixels"
    )
    runs = base.mapInPandas(
        _tile_runs_kernel(float(black), float(near)), schema=_RUNS_T
    )
    row_lim = _scanline_limits(runs, axis_rows=True, tile_size=tile_size)
    col_lim = _scanline_limits(runs, axis_rows=False, tile_size=tile_size)

    px = tiles.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("idx0", "v"),
    ).select(
        "raster_id", "band", "v",
        (F.col("tile_x").cast("long") * tile_size + F.col("idx0") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("idx0") / F.col("tile_w")).cast("long")).alias("gy"),
    )
    j = px.join(
        F.broadcast(row_lim.withColumnsRenamed({"gidx": "gy", "lead": "rl", "trail": "rt", "n": "rn"})),
        ["raster_id", "band", "gy"],
    ).join(
        F.broadcast(col_lim.withColumnsRenamed({"gidx": "gx", "lead": "cl", "trail": "ct", "n": "cn"})),
        ["raster_id", "band", "gx"],
    )
    fl = (F.col("gx") < F.col("rl")).cast("int")
    fr = (F.col("gx") >= F.col("rn") - F.col("rt")).cast("int")
    ft = (F.col("gy") < F.col("cl")).cast("int")
    fb = (F.col("gy") >= F.col("cn") - F.col("ct")).cast("int")
    return j.where((fl == 1) | (fr == 1) | (ft == 1) | (fb == 1)).select(
        "raster_id", "band", "gx", "gy", "v",
        fl.alias("from_left"), fr.alias("from_right"),
        ft.alias("from_top"), fb.alias("from_bottom"),
    )


def nearblack_oracle_sql(
    tiles_rel: str,
    black: float = 0.0,
    near: float = 0.0,
    tile_size: int = 32,
) -> str:
    """DuckDB mirror of :func:`nearblack_pixels`: the same |v-black|<=near
    predicate, collar membership as the running MIN of the near flag along
    each scanline from each of the four edges."""
    b, nr, ts = float(black), float(near), int(tile_size)
    return f"""
WITH px AS (
  SELECT raster_id, band,
         CAST(tile_x AS BIGINT) * {ts} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {ts} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
),
m AS (
  SELECT *, CASE WHEN abs(v - {b!r}) <= {nr!r} THEN 1 ELSE 0 END AS nb FROM px
),
f AS (
  SELECT *,
    min(nb) OVER (PARTITION BY raster_id, band, gy ORDER BY gx
                  ROWS UNBOUNDED PRECEDING) AS fl,
    min(nb) OVER (PARTITION BY raster_id, band, gy ORDER BY gx DESC
                  ROWS UNBOUNDED PRECEDING) AS fr,
    min(nb) OVER (PARTITION BY raster_id, band, gx ORDER BY gy
                  ROWS UNBOUNDED PRECEDING) AS ft,
    min(nb) OVER (PARTITION BY raster_id, band, gx ORDER BY gy DESC
                  ROWS UNBOUNDED PRECEDING) AS fb
  FROM m
)
SELECT raster_id, band, gx, gy, v,
       CAST(fl AS INTEGER) AS from_left, CAST(fr AS INTEGER) AS from_right,
       CAST(ft AS INTEGER) AS from_top, CAST(fb AS INTEGER) AS from_bottom
FROM f
WHERE fl = 1 OR fr = 1 OR ft = 1 OR fb = 1
"""
