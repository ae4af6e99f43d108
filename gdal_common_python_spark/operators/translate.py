"""gdal_translate analog: windowed subset + linear value rescale.

The reference reads raster subwindows through GDAL's ReadAsArray window
glue (rasters.py:143-174); gdal_translate's core batch surface on top of
that is ``-srcwin`` (pixel-window subset) and ``-scale src_min src_max
dst_min dst_max`` (affine value rescale, exact given explicit bounds —
the auto-bounds form scans for min/max first and is one aggregate away).

Pure whole-stage codegen, zero UDF, zero Python:
- the tile table is FILTERED to tiles overlapping the source window
  (partition pruning by construction — at 100 TB only the requested
  window's tiles are ever read), then each tile's pixel array is sliced
  and re-indexed NATIVELY (one `transform` over the output row sequence,
  `element_at` gathers) into the re-originated output tile;
- the rescale is one arithmetic map over the array (`transform`), nodata
  passed through untouched, optional clip to the dst range
  (gdal_translate clips by default).

Output tiles sit on a fresh (0,0)-anchored grid of the same tile size;
partial edge tiles carry exact tile_w/tile_h like the synth layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def translate_window(
    tiles: DataFrame,
    raster_id: str,
    band: int,
    srcwin: tuple[int, int, int, int],
    scale: tuple[float, float, float, float] | None = None,
    clip: bool = True,
    tile_size: int = 32,
    out_tile_size: int | None = None,
) -> DataFrame:
    """Subset (xoff, yoff, xsize, ysize) of one (raster_id, band) ->
    output tile table (tile_x, tile_y, tile_w, tile_h, pixels) on a
    re-originated grid; optional ``scale=(src_min, src_max, dst_min,
    dst_max)`` affine rescale of valid (non-nodata) pixels.

    ``out_tile_size`` re-grids the output onto a DIFFERENT tile size
    (default: same as the source) — the gdal_retile primitive; see
    :func:`retile`.

    The output covers the FULL requested window: window pixels outside the
    source raster are nodata-filled, whether their output tile is partially
    or entirely beyond the source (same enumerated-target-grid semantics as
    ``warp_raster``). A (raster_id, band) with no tiles yields an empty
    result."""
    xoff, yoff, xs, ys = (int(v) for v in srcwin)
    if xs <= 0 or ys <= 0:
        raise ValueError(f"srcwin size must be positive, got {srcwin}")
    ots = int(out_tile_size or tile_size)
    if ots <= 0:
        raise ValueError(f"out_tile_size must be positive, got {out_tile_size}")
    base = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    src = base
    # output tile grid
    ntx = (xs + ots - 1) // ots
    nty = (ys + ots - 1) // ots
    ts = tile_size
    # source tiles overlapping the window
    tx0, tx1 = xoff // ts, (xoff + xs - 1) // ts
    ty0, ty1 = yoff // ts, (yoff + ys - 1) // ts
    src = src.filter(
        (F.col("tile_x").between(tx0, tx1)) & (F.col("tile_y").between(ty0, ty1))
    )
    # fan each source tile to the output tiles it overlaps — bounded <= 4
    # when out tile size == source tile size, (ceil(ts/ots)+1)^2 when
    # re-gridding finer; always O(tile area ratio), never data-dependent
    gx0 = F.col("tile_x") * ts - F.lit(xoff)  # source tile's origin in window coords
    gy0 = F.col("tile_y") * ts - F.lit(yoff)
    otx0 = F.greatest(F.floor(gx0 / ots), F.lit(0)).cast("int")
    otx1 = F.least(F.floor((gx0 + F.col("tile_w") - 1) / ots), F.lit(ntx - 1)).cast("int")
    oty0 = F.greatest(F.floor(gy0 / ots), F.lit(0)).cast("int")
    oty1 = F.least(F.floor((gy0 + F.col("tile_h") - 1) / ots), F.lit(nty - 1)).cast("int")
    fan = (
        src.where((otx0 <= otx1) & (oty0 <= oty1))
        .withColumn("otx", F.explode(F.sequence(otx0, otx1)))
        .withColumn("oty", F.explode(F.sequence(oty0, oty1)))
    )
    ow = F.least(F.lit(ots), F.lit(xs) - F.col("otx") * ots).cast("int")
    oh = F.least(F.lit(ots), F.lit(ys) - F.col("oty") * ots).cast("int")
    fan = fan.select(
        "tile_x", "tile_y", "tile_w", "tile_h", "pixels",
        "otx", "oty", ow.alias("ow"), oh.alias("oh"),
    )

    def _gather(i):
        """Value of output pixel i (row-major in the output tile) taken
        from THIS source tile, or null when i falls outside it."""
        wx = F.col("otx") * ots + i % F.col("ow")  # window coords
        wy = F.col("oty") * ots + F.floor(i / F.col("ow"))
        sx = wx + F.lit(xoff) - F.col("tile_x") * ts  # source-tile-local
        sy = wy + F.lit(yoff) - F.col("tile_y") * ts
        return F.when(
            sx.between(0, F.col("tile_w") - 1) & sy.between(0, F.col("tile_h") - 1),
            F.element_at(F.col("pixels"), (sy * F.col("tile_w") + sx + 1).cast("int")),
        )

    gather = fan.select(
        "otx", "oty", "ow", "oh",
        F.transform(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("ow").cast("long") * F.col("oh") - 1),
            ),
            _gather,
        ).alias("part"),
    )
    # fold the (<=4) source-tile parts of each output tile: first non-null wins
    folded = gather.groupBy(F.col("otx").alias("tile_x"), F.col("oty").alias("tile_y")).agg(
        F.aggregate(
            F.collect_list("part"),
            F.expr("cast(null as array<double>)"),
            lambda acc, p: F.when(acc.isNull(), p).otherwise(
                F.zip_with(acc, p, lambda a, b: F.coalesce(a, b))
            ),
        ).alias("__px"),
    )
    # full output coverage: enumerate the ntx*nty output grid and left-join
    # the folded parts, so a srcwin extending past the source raster gets
    # CONSISTENT edge semantics — fully-outside tiles emit nodata arrays,
    # exactly like partially-covered tiles (mirrors warp_raster's enumerated
    # target grid). The grid side is output-tile-sized; the folded side is
    # already hash-partitioned on (tile_x, tile_y) from its groupBy, so the
    # extra exchange is grid-side only. A (raster_id, band) with no tiles at
    # all has no nodata value to fill with and yields an empty result.
    spark = tiles.sparkSession
    grid = spark.range(ntx * nty).select(
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        F.floor(F.col("id") / ntx).cast("int").alias("tile_y"),
    )
    nd_row = base.agg(F.min("nodata").alias("__nd"))
    gw = F.least(F.lit(ots), F.lit(xs) - F.col("tile_x") * ots).cast("int")
    gh = F.least(F.lit(ots), F.lit(ys) - F.col("tile_y") * ots).cast("int")
    folded = (
        grid.crossJoin(F.broadcast(nd_row))
        .where(F.col("__nd").isNotNull())
        .select("tile_x", "tile_y", gw.alias("tile_w"), gh.alias("tile_h"), "__nd")
        .join(folded, ["tile_x", "tile_y"], "left")
    )
    out_px: Column = F.coalesce(
        F.transform(F.col("__px"), lambda v: F.coalesce(v, F.col("__nd"))),
        F.array_repeat(F.col("__nd"), F.col("tile_w") * F.col("tile_h")),
    )
    if scale is not None:
        s0, s1, d0, d1 = (float(v) for v in scale)
        if s1 == s0:
            raise ValueError("scale src_min == src_max")
        k = (d1 - d0) / (s1 - s0)

        def rescale(v):
            y = (v - F.lit(s0)) * F.lit(k) + F.lit(d0)
            if clip:
                y = F.greatest(F.least(y, F.lit(max(d0, d1))), F.lit(min(d0, d1)))
            return F.when(v == F.col("__nd"), v).otherwise(y)

        out_px = F.transform(out_px, rescale)
    return folded.select(
        "tile_x", "tile_y", "tile_w", "tile_h", out_px.alias("pixels")
    )


def retile(
    tiles: DataFrame,
    raster_id: str,
    band: int,
    out_tile_size: int,
    tile_size: int = 32,
) -> DataFrame:
    """gdal_retile analog: re-chunk one (raster_id, band) onto a new tile
    grid, full extent, pixel-preserving (no resampling — retiling is pure
    data movement). Raster width/height come from the tile table's own
    metadata columns (one dimension-sized aggregate); everything else is
    :func:`translate_window`'s bounded fan + fold, so the shuffle carries
    each pixel exactly once regardless of the size ratio."""
    base = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    meta = base.agg(F.min("width").alias("w"), F.min("height").alias("h")).first()
    if meta is None or meta.w is None:
        raise ValueError(f"no tiles for ({raster_id!r}, band {band})")
    return translate_window(
        tiles, raster_id, band, (0, 0, int(meta.w), int(meta.h)),
        tile_size=tile_size, out_tile_size=out_tile_size,
    )


def translate_oracle_sql(
    tiles_rel: str,
    raster_id: str,
    band: int,
    srcwin: tuple[int, int, int, int],
    scale: tuple[float, float, float, float] | None = None,
    clip: bool = True,
    tile_size: int = 32,
    out_tile_size: int | None = None,
) -> str:
    """DuckDB mirror, exploded per output pixel (tile_x, tile_y, idx,
    value) with idx 1-based — identical affine expression tree."""
    xoff, yoff, xs, ys = (int(v) for v in srcwin)
    ts = tile_size
    ots = int(out_tile_size or tile_size)
    if scale is not None:
        s0, s1, d0, d1 = (float(v) for v in scale)
        k = (d1 - d0) / (s1 - s0)
        # string-parsed doubles: DuckDB's DECIMAL-literal -> DOUBLE cast is
        # 1 ulp off at full precision, while VARCHAR -> DOUBLE is correctly
        # rounded (verified); engine literals must match bit-for-bit
        def fl(x: float) -> str:
            return f"CAST('{x!r}' AS DOUBLE)"

        expr = f"(v - {fl(s0)}) * {fl(k)} + {fl(d0)}"
        if clip:
            expr = f"greatest(least({expr}, {fl(max(d0, d1))}), {fl(min(d0, d1))})"
        vexpr = f"CASE WHEN v = nodata THEN v ELSE {expr} END"
    else:
        vexpr = "v"
    return f"""
WITH px AS (
  SELECT nodata,
         CAST(tile_x AS BIGINT) * {ts} + (idx - 1) % tile_w - {xoff} AS wx,
         CAST(tile_y AS BIGINT) * {ts} + (idx - 1) // tile_w - {yoff} AS wy,
         v
  FROM (
    SELECT nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
    WHERE raster_id = '{raster_id}' AND band = {int(band)}
  )
),
nd AS (
  SELECT min(nodata) AS gnd FROM {tiles_rel}
  WHERE raster_id = '{raster_id}' AND band = {int(band)}
),
grid AS (
  SELECT CAST(g1.wx AS BIGINT) AS wx, CAST(g2.wy AS BIGINT) AS wy
  FROM generate_series(0, {xs - 1}) g1(wx), generate_series(0, {ys - 1}) g2(wy)
)
SELECT CAST(wx // {ots} AS INT) AS tile_x,
       CAST(wy // {ots} AS INT) AS tile_y,
       CAST((wy % {ots}) * least({ots}, {xs} - (wx // {ots}) * {ots})
            + (wx % {ots}) + 1 AS INT) AS idx,
       CASE WHEN v IS NULL THEN gnd ELSE {vexpr} END AS value
FROM grid CROSS JOIN nd LEFT JOIN px USING (wx, wy)
WHERE gnd IS NOT NULL
"""
