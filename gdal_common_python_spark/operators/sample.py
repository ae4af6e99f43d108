"""Raster point sampling (gdallocationinfo analog), Spark-first.

No reference analog (the reference's raster ops stop at zonal/mosaic) but
the pixel addressing is exactly the reference's R1 rule: world -> pixel by
truncation toward zero (rasters.py:113-116, mirrored in
`kernels.raster.pixel_coordinate`) — including its quirk that a point less
than one pixel left/above the origin aliases into column/row 0.

Plan — 100 % native Columns, zero Python in the hot path:

1. points x (raster, band) metadata: broadcast nested-loop join against the
   deduplicated per-(raster, band) geotransform dimension (tiny — one row
   per band, never per tile).
2. R1 pixel coords as codegen arithmetic; out-of-extent points filtered
   BEFORE the tile join (no wasted shuffle rows).
3. tile-key equi-join against the tile table (both sides hash-partitioned
   on the same key — co-located at cluster scale; a point never touches
   more than one tile per band) and a single `element_at` on the pixel
   array. Shuffle ∝ in-bounds points + tiles, not pixels.

Hash-exact by construction: the only float ops are the two geotransform
divisions (identical IEEE in Spark and DuckDB), the pixel value is returned
verbatim from the array, and Spark's double->long CAST truncates toward
zero exactly like the oracle's CAST(trunc(..) AS BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sample_raster_at_points(
    points: DataFrame, tiles: DataFrame, tile_size: int = 32
) -> DataFrame:
    """Value of every raster band at every point ->
    (point_id, raster_id, band, px, py, value, value_masked).

    `value` is the raw stored pixel (hash-stable); `value_masked` nulls out
    nodata hits (the gdallocationinfo report). Points outside a raster's
    extent produce no row for that raster, matching gdallocationinfo's
    "location off this file" behavior.
    """
    meta = (
        tiles.select(
            "raster_id", "band", "origin_x", "origin_y", "px_x", "px_y", "width", "height"
        )
        .dropDuplicates(["raster_id", "band"])
    )
    p = points.select("point_id", "x", "y").crossJoin(F.broadcast(meta))
    gx = ((F.col("x") - F.col("origin_x")) / F.col("px_x")).cast("long")
    gy = ((F.col("y") - F.col("origin_y")) / F.col("px_y")).cast("long")
    located = (
        p.withColumn("px", gx)
        .withColumn("py", gy)
        .where(
            (F.col("px") >= 0)
            & (F.col("px") < F.col("width"))
            & (F.col("py") >= 0)
            & (F.col("py") < F.col("height"))
        )
        .select(
            "point_id", "raster_id", "band", "px", "py",
            F.floor(F.col("px") / tile_size).cast("int").alias("tile_x"),
            F.floor(F.col("py") / tile_size).cast("int").alias("tile_y"),
        )
    )
    t = tiles.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w", "nodata", "pixels"
    )
    joined = located.join(t, ["raster_id", "band", "tile_x", "tile_y"])
    value = F.element_at(
        "pixels",
        (
            (F.col("py") - F.col("tile_y").cast("long") * tile_size) * F.col("tile_w")
            + (F.col("px") - F.col("tile_x").cast("long") * tile_size)
            + 1
        ).cast("int"),
    )
    return joined.select(
        "point_id", "raster_id", "band", "px", "py",
        value.alias("value"),
        F.when(value == F.col("nodata"), F.lit(None).cast("double"))
        .otherwise(value)
        .alias("value_masked"),
    )


def sample_oracle_sql(points_rel: str, tiles_rel: str, tile_size: int = 32) -> str:
    """DuckDB oracle for :func:`sample_raster_at_points` — same R1 trunc
    rule, same tile addressing, same array indexing."""
    return f"""
WITH meta AS (
  SELECT raster_id, band,
         any_value(origin_x) AS ox, any_value(origin_y) AS oy,
         any_value(px_x) AS rx, any_value(px_y) AS ry,
         any_value(width) AS w, any_value(height) AS h
  FROM {tiles_rel}
  GROUP BY 1, 2
),
pt AS (
  SELECT p.point_id, m.raster_id, m.band,
         CAST(trunc((p.x - m.ox) / m.rx) AS BIGINT) AS px,
         CAST(trunc((p.y - m.oy) / m.ry) AS BIGINT) AS py,
         m.w, m.h
  FROM {points_rel} p CROSS JOIN meta m
),
ok AS (
  SELECT * FROM pt WHERE px >= 0 AND px < w AND py >= 0 AND py < h
),
v AS (
  SELECT o.point_id, o.raster_id, o.band, o.px, o.py, t.nodata,
         t.pixels[CAST((o.py - CAST(t.tile_y AS BIGINT) * {tile_size}) * t.tile_w
                       + (o.px - CAST(t.tile_x AS BIGINT) * {tile_size}) + 1 AS INT)] AS value
  FROM ok o
  JOIN {tiles_rel} t
    ON t.raster_id = o.raster_id AND t.band = o.band
   AND t.tile_x = o.px // {tile_size} AND t.tile_y = o.py // {tile_size}
)
SELECT point_id, raster_id, band, px, py, value,
       CASE WHEN value = nodata THEN NULL ELSE value END AS value_masked
FROM v
"""
