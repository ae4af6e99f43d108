"""gdaladdo analog: factor-2 overview (pyramid) level, average-resampled.

Completes the raster toolbox (info/dem/contour/proximity/sieve/fillnodata/
warp/translate/rasterize/grid/merge/polygonize all exist). GDAL's
``gdaladdo -r average 2`` builds a half-resolution level where each output
pixel averages its 2x2 source block, nodata excluded; all-nodata blocks
stay nodata.

ZERO shuffle, pure codegen, zero UDF: tiles are even-sized and aligned,
so 2x2 blocks NEVER cross tile boundaries — the whole level is one
narrow map over the tile table (native `transform` over the output
sequence + four bounds-checked `element_at` gathers). Exactness by the
fillnodata discipline: the <=4 participating values are int64-quantized
at 2^20 and summed as integers (order-free), one correctly-rounded
double division reports the average.

Emitted per half-res pixel: (raster_id, band, gx, gy, n_valid, value)
with gx/gy in level-1 pixel coords (world grid = source origin with
doubled pixel size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_QBITS = 20
_QF = float(1 << _QBITS)


def overview_level(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """One factor-2 average overview level for EVERY (raster_id, band)."""
    ow = F.ceil(F.col("tile_w") / 2).cast("int")
    oh = F.ceil(F.col("tile_h") / 2).cast("int")
    base = tiles.select(
        "raster_id", "band", "nodata", "tile_x", "tile_y", "tile_w", "tile_h",
        "pixels", ow.alias("ow"), oh.alias("oh"),
    )

    def out_pixel(i):
        oc = i % F.col("ow")
        orr = F.floor(i / F.col("ow"))
        q = F.lit(0).cast("long")
        c = F.lit(0).cast("long")
        for dy in (0, 1):
            for dx in (0, 1):
                sx = oc * 2 + dx
                sy = orr * 2 + dy
                v = F.when(
                    (sx < F.col("tile_w")) & (sy < F.col("tile_h")),
                    F.element_at(
                        F.col("pixels"), (sy * F.col("tile_w") + sx + 1).cast("int")
                    ),
                )
                ok = v.isNotNull() & (v != F.col("nodata"))
                q = q + F.when(ok, F.floor(v * F.lit(_QF) + F.lit(0.5)).cast("long")).otherwise(F.lit(0).cast("long"))
                c = c + F.when(ok, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        val = F.when(
            c > 0, q.cast("double") / (c.cast("double") * F.lit(_QF))
        ).otherwise(F.col("nodata"))
        return F.struct(c.alias("n_valid"), val.alias("value"))

    half = tile_size // 2
    ex = base.select(
        "raster_id", "band", "tile_x", "tile_y", "ow",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.col("ow").cast("long") * F.col("oh") - 1),
                ),
                out_pixel,
            )
        ).alias("i", "s"),
    )
    return ex.select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * half + F.col("i") % F.col("ow")).alias("gx"),
        (F.col("tile_y").cast("long") * half + (F.col("i") / F.col("ow")).cast("long")).alias("gy"),
        F.col("s.n_valid").alias("n_valid"),
        F.col("s.value").alias("value"),
    )


def overview_oracle_sql(tiles_rel: str, tile_size: int = 32) -> str:
    """DuckDB mirror: global 2x2 block groupBy (blocks never cross tiles,
    so global == per-tile blocking), identical quantized average."""
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
)
SELECT raster_id, band, gx // 2 AS gx, gy // 2 AS gy,
       CAST(count(*) FILTER (v != nodata) AS BIGINT) AS n_valid,
       CASE WHEN count(*) FILTER (v != nodata) > 0
            THEN CAST(sum(CAST(floor(v * {_QF!r} + 0.5) AS BIGINT)) FILTER (v != nodata) AS DOUBLE)
                 / (CAST(count(*) FILTER (v != nodata) AS DOUBLE) * {_QF!r})
            ELSE any_value(nodata) END AS value
FROM px
GROUP BY raster_id, band, gx // 2, gy // 2
"""
