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


def sample_raster_bilinear(
    points: DataFrame, tiles: DataFrame, tile_size: int = 32
) -> DataFrame:
    """Bilinear point sampling (gdallocationinfo / warp -r bilinear at
    points) -> (point_id, raster_id, band, value). Pixel-CENTER
    convention: fx = (x - ox)/rx - 0.5; the four neighbors (floor(fx) +
    {0,1}) x (floor(fy) + {0,1}) blend with weights (1-wx)(1-wy) etc.
    Only points whose FULL 2x2 neighborhood is in-raster emit a row
    (edge semantics like the terrain family); value is NULL when any
    neighbor is nodata (gdal's nodata propagation, un-renormalized).

    Hash-exact without quantization: weights and the blend are one fixed
    IEEE expression tree evaluated identically by both engines — the four
    corner values are PIVOTED into fixed columns (max-of-case per corner)
    rather than summed in aggregation order, so no float accumulation
    order exists at all.

    Scale shape: the 2x2 corners explode to exactly 4 rows per in-range
    point before ONE tile-key equi-join (corners may straddle up to 4
    tiles), then a map-side-combinable groupBy(point) pivot. Shuffle ∝
    4 x points + tiles, never pixels."""
    meta = (
        tiles.select(
            "raster_id", "band", "origin_x", "origin_y", "px_x", "px_y", "width", "height"
        )
        .dropDuplicates(["raster_id", "band"])
    )
    p = points.select("point_id", "x", "y").crossJoin(F.broadcast(meta))
    fx = (F.col("x") - F.col("origin_x")) / F.col("px_x") - F.lit(0.5)
    fy = (F.col("y") - F.col("origin_y")) / F.col("px_y") - F.lit(0.5)
    p = (
        p.withColumn("x0", F.floor(fx).cast("long"))
        .withColumn("y0", F.floor(fy).cast("long"))
        .withColumn("wx", fx - F.floor(fx))
        .withColumn("wy", fy - F.floor(fy))
        .where(
            (F.col("x0") >= 0) & (F.col("x0") + 1 < F.col("width"))
            & (F.col("y0") >= 0) & (F.col("y0") + 1 < F.col("height"))
        )
    )
    corners = p.select(
        "point_id", "raster_id", "band", "x0", "y0", "wx", "wy",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("dx"),
    ).select(
        "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("dy")
    ).select(
        "point_id", "raster_id", "band", "wx", "wy",
        (F.col("dy") * 2 + F.col("dx")).alias("corner"),
        (F.col("x0") + F.col("dx")).alias("gx"),
        (F.col("y0") + F.col("dy")).alias("gy"),
    ).withColumn("tile_x", F.floor(F.col("gx") / tile_size).cast("int")) \
     .withColumn("tile_y", F.floor(F.col("gy") / tile_size).cast("int"))
    t = tiles.select("raster_id", "band", "tile_x", "tile_y", "tile_w", "nodata", "pixels")
    j = corners.join(t, ["raster_id", "band", "tile_x", "tile_y"])
    v = F.element_at(
        "pixels",
        (
            (F.col("gy") - F.col("tile_y").cast("long") * tile_size) * F.col("tile_w")
            + (F.col("gx") - F.col("tile_x").cast("long") * tile_size)
            + 1
        ).cast("int"),
    )
    vm = F.when(v == F.col("nodata"), F.lit(None).cast("double")).otherwise(v)
    g = j.select("point_id", "raster_id", "band", "wx", "wy", "corner", vm.alias("v"))
    agg = g.groupBy("point_id", "raster_id", "band").agg(
        F.max("wx").alias("wx"), F.max("wy").alias("wy"),
        *[F.max(F.when(F.col("corner") == k, F.col("v"))).alias(f"v{k}") for k in range(4)],
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_bad"),
    )
    one = F.lit(1.0)
    blend = (one - F.col("wy")) * (
        (one - F.col("wx")) * F.col("v0") + F.col("wx") * F.col("v1")
    ) + F.col("wy") * (
        (one - F.col("wx")) * F.col("v2") + F.col("wx") * F.col("v3")
    )
    return agg.select(
        "point_id", "raster_id", "band",
        F.when(F.col("n_bad") > 0, F.lit(None).cast("double")).otherwise(blend).alias("value"),
    )


def sample_bilinear_oracle_sql(points_rel: str, tiles_rel: str, tile_size: int = 32) -> str:
    """DuckDB mirror of :func:`sample_raster_bilinear` — identical
    floor/weight/blend expression tree, VALUES-list corners, max-of-case
    pivot."""
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
         CAST(floor((p.x - m.ox) / m.rx - 0.5) AS BIGINT) AS x0,
         CAST(floor((p.y - m.oy) / m.ry - 0.5) AS BIGINT) AS y0,
         ((p.x - m.ox) / m.rx - 0.5) - floor((p.x - m.ox) / m.rx - 0.5) AS wx,
         ((p.y - m.oy) / m.ry - 0.5) - floor((p.y - m.oy) / m.ry - 0.5) AS wy,
         m.w, m.h
  FROM {points_rel} p CROSS JOIN meta m
),
ok AS (
  SELECT * FROM pt
  WHERE x0 >= 0 AND x0 + 1 < w AND y0 >= 0 AND y0 + 1 < h
),
corner AS (
  SELECT o.point_id, o.raster_id, o.band, o.wx, o.wy,
         c.dy * 2 + c.dx AS corner, o.x0 + c.dx AS gx, o.y0 + c.dy AS gy
  FROM ok o
  CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) c(dx, dy)
),
v AS (
  SELECT cr.point_id, cr.raster_id, cr.band, cr.wx, cr.wy, cr.corner,
         CASE WHEN t.pixels[CAST((cr.gy - CAST(t.tile_y AS BIGINT) * {tile_size}) * t.tile_w
                                 + (cr.gx - CAST(t.tile_x AS BIGINT) * {tile_size}) + 1 AS INT)] = t.nodata
              THEN NULL
              ELSE t.pixels[CAST((cr.gy - CAST(t.tile_y AS BIGINT) * {tile_size}) * t.tile_w
                                 + (cr.gx - CAST(t.tile_x AS BIGINT) * {tile_size}) + 1 AS INT)] END AS v
  FROM corner cr
  JOIN {tiles_rel} t
    ON t.raster_id = cr.raster_id AND t.band = cr.band
   AND t.tile_x = cr.gx // {tile_size} AND t.tile_y = cr.gy // {tile_size}
),
a AS (
  SELECT point_id, raster_id, band,
         max(wx) AS wx, max(wy) AS wy,
         max(CASE WHEN corner = 0 THEN v END) AS v0,
         max(CASE WHEN corner = 1 THEN v END) AS v1,
         max(CASE WHEN corner = 2 THEN v END) AS v2,
         max(CASE WHEN corner = 3 THEN v END) AS v3,
         sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_bad
  FROM v
  GROUP BY 1, 2, 3
)
SELECT point_id, raster_id, band,
       CASE WHEN n_bad > 0 THEN NULL
            ELSE (1.0 - wy) * ((1.0 - wx) * v0 + wx * v1)
                 + wy * ((1.0 - wx) * v2 + wx * v3) END AS value
FROM a
"""


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
