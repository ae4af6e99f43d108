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
    points: DataFrame,
    tiles: DataFrame,
    tile_size: int = 32,
    id_cols: tuple[str, ...] = ("point_id",),
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
    ids = list(id_cols)
    p = points.select(*ids, "x", "y").crossJoin(F.broadcast(meta))
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
            *ids, "raster_id", "band", "px", "py",
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
        *ids, "raster_id", "band", "px", "py",
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


def track_profile(
    docs: DataFrame, tiles: DataFrame, tile_size: int = 32
) -> DataFrame:
    """Raster profile along each document track -> (doc_id, raster_id,
    band, n_samples, vmin, vmax, gain_micro, loss_micro): every geo POINT
    span sampled against every raster band (the R1 trunc rule shared with
    :func:`sample_raster_at_points`), nodata/off-raster points dropped,
    and the surviving values walked in span-offset order — the "terrain
    under the trajectory" report (elevation gain/loss, range).

    Exactness: consecutive-sample deltas floor-quantize to int64
    micro-units BEFORE the gain/loss sums (the tracks-module discipline —
    order-independent exact integers); vmin/vmax are order-free doubles.

    100 TB shape: the sampling is the proven broadcast-meta + tile-key
    equi-join (shuffle ∝ in-bounds samples); the profile is one window
    pass + one groupBy sharing the same (doc, raster, band) hash
    partition."""
    from pyspark.sql.window import Window

    from .spatial_join import geo_points  # local import: avoid cycle at module load

    pts = geo_points(docs)
    s = sample_raster_at_points(
        pts, tiles, tile_size=tile_size, id_cols=("doc_id", "offset")
    ).where(F.col("value_masked").isNotNull())
    w = Window.partitionBy("doc_id", "raster_id", "band").orderBy("offset")
    prev = F.lag("value_masked").over(w)
    dq = F.floor((F.col("value_masked") - prev) * 1e6).cast("long")
    seg = s.select(
        "doc_id", "raster_id", "band", "value_masked",
        F.when(prev.isNull(), F.lit(0)).otherwise(F.greatest(dq, F.lit(0))).alias("__gain"),
        F.when(prev.isNull(), F.lit(0)).otherwise(F.greatest(-dq, F.lit(0))).alias("__loss"),
    )
    return seg.groupBy("doc_id", "raster_id", "band").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.min("value_masked").alias("vmin"),
        F.max("value_masked").alias("vmax"),
        F.sum("__gain").cast("long").alias("gain_micro"),
        F.sum("__loss").cast("long").alias("loss_micro"),
    )


def track_profile_oracle_sql(
    pts_cte: str, tiles_rel: str, tile_size: int = 32
) -> str:
    """DuckDB mirror of :func:`track_profile`; ``pts_cte`` must yield
    (doc_id, off, px, py) coordinate columns (the shared PIP point CTE)."""
    return f"""
WITH pts AS ({pts_cte}),
meta AS (
  SELECT raster_id, band,
         any_value(origin_x) AS ox, any_value(origin_y) AS oy,
         any_value(px_x) AS rx, any_value(px_y) AS ry,
         any_value(width) AS w, any_value(height) AS h
  FROM {tiles_rel}
  GROUP BY 1, 2
),
loc AS (
  SELECT p.doc_id, p.off, m.raster_id, m.band,
         CAST(trunc((p.px - m.ox) / m.rx) AS BIGINT) AS gx,
         CAST(trunc((p.py - m.oy) / m.ry) AS BIGINT) AS gy,
         m.w, m.h
  FROM pts p CROSS JOIN meta m
),
ok AS (
  SELECT * FROM loc WHERE gx >= 0 AND gx < w AND gy >= 0 AND gy < h
),
v AS (
  SELECT o.doc_id, o.off, o.raster_id, o.band,
         t.pixels[CAST((o.gy - CAST(t.tile_y AS BIGINT) * {tile_size}) * t.tile_w
                       + (o.gx - CAST(t.tile_x AS BIGINT) * {tile_size}) + 1 AS INT)]
           AS value,
         t.nodata
  FROM ok o
  JOIN {tiles_rel} t
    ON t.raster_id = o.raster_id AND t.band = o.band
   AND t.tile_x = o.gx // {tile_size} AND t.tile_y = o.gy // {tile_size}
),
kept AS (
  SELECT doc_id, off, raster_id, band, value
  FROM v WHERE value != nodata
),
seg AS (
  SELECT doc_id, raster_id, band, value,
         CAST(floor((value - lag(value) OVER w) * 1e6) AS BIGINT) AS dq
  FROM kept
  WINDOW w AS (PARTITION BY doc_id, raster_id, band ORDER BY off)
)
SELECT doc_id, raster_id, band,
       CAST(count(*) AS BIGINT) AS n_samples,
       min(value) AS vmin, max(value) AS vmax,
       CAST(sum(CASE WHEN dq IS NULL THEN 0 ELSE greatest(dq, 0) END) AS BIGINT)
         AS gain_micro,
       CAST(sum(CASE WHEN dq IS NULL THEN 0 ELSE greatest(-dq, 0) END) AS BIGINT)
         AS loss_micro
FROM seg
GROUP BY doc_id, raster_id, band
"""
