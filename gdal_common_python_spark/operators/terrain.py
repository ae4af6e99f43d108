"""gdaldem-style terrain analysis (slope / aspect / hillshade), Spark-first.

No reference analog (the reference wraps no gdaldem surface; its raster ops
stop at zonal/mosaic) — this extends the halo-exchange focal machinery
(`focal.halo_exchange`) to gradient kernels: Horn's 3x3 finite-difference
stencil needs the 8 neighbors of every pixel, so tiles ship only their
1-pixel border strips (shuffle ∝ perimeter), then each tile computes its
gradients locally.

Hash-exact by construction: the Horn numerators

    gx_num = (c + 2f + i) - (a + 2d + g)      # east-west
    gy_num = (g + 2h + i) - (a + 2b + c)      # north-south (y-down grid)

are exact int64 for integer-valued rasters, and every derived value
(slope tangent, hillshade 0-255, slope class, aspect octant) uses only
+ - * / sqrt on doubles plus Python-computed literal constants — all
IEEE-754 correctly-rounded operations, so Spark (JVM Math) and DuckDB
(libm) produce bit-identical results when the expression shapes match.
The trig of azimuth/altitude never runs in either engine: the light
vector components are embedded as full-precision ``repr`` literals in
BOTH the Column expressions and the oracle SQL (`light_vector`).

Edge semantics match gdaldem's default (no ``-compute_edges``): a pixel
is emitted only when its full 3x3 window is inside the raster and free of
nodata.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .focal import halo_exchange, assemble_padded, grouped_tile_apply

_GRAD_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("gxs", T.ArrayType(T.LongType())),
        T.StructField("gys", T.ArrayType(T.LongType())),
        T.StructField("idxs", T.ArrayType(T.IntegerType())),
    ]
)


def light_vector(azimuth_deg: float, altitude_deg: float) -> tuple[float, float, float]:
    """Unit vector toward the light source in (east, north, up) — computed
    once on the driver so both the engine and the oracle consume the same
    full-precision literals (no trig inside either engine)."""
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    return (math.cos(alt) * math.sin(az), math.cos(alt) * math.cos(az), math.sin(alt))


def horn_gradient_pixels(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """Per-pixel Horn gradient numerators over a tiled raster table ->
    (raster_id, band, gx, gy, px_x, px_y, gx_num, gy_num) for every pixel
    whose full 3x3 window is in-raster and nodata-free.

    Plan: halo_exchange(radius=1) -> groupBy(tile) applyInPandas running
    the stencil as 8 whole-array shifts (no per-pixel Python) -> native
    posexplode to pixel rows. px_x / |px_y| ride along per row so
    downstream slope/hillshade handle mixed-resolution rasters without
    driver-side knowledge."""
    res = tiles.select(
        "raster_id", "band", F.col("px_x").alias("_rx"), F.abs("px_y").alias("_ry")
    ).dropDuplicates(["raster_id", "band"])

    halos = halo_exchange(tiles, radius=1)

    def grad(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, 1)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _GRAD_T.fields])
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        v = np.where(valid, pad, 0.0)
        # window cells by compass position (y down):  a b c / d e f / g h i
        def sub(dy, dx):
            return v[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

        def ok(dy, dx):
            return valid[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

        a, b, cc = sub(-1, -1), sub(-1, 0), sub(-1, 1)
        d, f = sub(0, -1), sub(0, 1)
        g, hh, i = sub(1, -1), sub(1, 0), sub(1, 1)
        # .copy(): ok() returns views into `valid`; an in-place &= on a view
        # would corrupt the later window reads
        full = ok(0, 0).copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                full &= ok(dy, dx)
        gx_num = ((cc + 2 * f + i) - (a + 2 * d + g)).astype(np.int64)
        gy_num = ((g + 2 * hh + i) - (a + 2 * b + cc)).astype(np.int64)
        idxs = np.flatnonzero(full.ravel())
        if len(idxs) == 0:
            return pd.DataFrame(columns=[f.name for f in _GRAD_T.fields])
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), int(c.tile_x), int(c.tile_y), w,
                    gx_num.ravel()[idxs].tolist(),
                    gy_num.ravel()[idxs].tolist(),
                    idxs.astype(np.int32).tolist(),
                )
            ],
            columns=[f.name for f in _GRAD_T.fields],
        )

    t = grouped_tile_apply(halos, grad, _GRAD_T)
    ex = t.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.explode(F.arrays_zip("idxs", "gxs", "gys")).alias("z"),
    ).select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * tile_size + F.col("z.idxs") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("z.idxs") / F.col("tile_w")).cast("long")).alias("gy"),
        F.col("z.gxs").alias("gx_num"),
        F.col("z.gys").alias("gy_num"),
    )
    # tiny per-(raster, band) resolution dimension — broadcast by size
    return ex.join(F.broadcast(res), ["raster_id", "band"]).withColumnsRenamed(
        {"_rx": "px_x", "_ry": "px_y"}
    )


def hillshade_pixels(
    tiles: DataFrame,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    slope_breaks_deg: tuple[float, ...] = (5.0, 15.0, 30.0, 45.0),
    tile_size: int = 32,
) -> DataFrame:
    """gdaldem hillshade + slope-class + aspect-octant in one pass ->
    (raster_id, band, gx, gy, gx_num, gy_num, hillshade, slope_class,
    aspect_octant).

    hillshade = floor(255 * max(0, n.L / |n|)) with surface normal
    n = (-dzdx, -dzdy_north, 1) and light L from `light_vector` — only
    correctly-rounded IEEE ops, so the DuckDB oracle hash-matches.
    slope_class = #(tan^2 breaks <= dzdx^2+dzdy^2); aspect_octant buckets
    the steepest-descent direction into N..NW (0..7, -1 flat) with
    tan(22.5 deg) literal boundaries."""
    lx, ly, lz = light_vector(azimuth_deg, altitude_deg)
    gpx = horn_gradient_pixels(tiles, tile_size=tile_size)
    dzdx = F.col("gx_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_x"))
    # y-down numerator -> north-up gradient flips sign
    dzdy = -F.col("gy_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_y"))
    t2 = dzdx * dzdx + dzdy * dzdy
    ndotl = F.lit(lz) - F.lit(lx) * dzdx - F.lit(ly) * dzdy
    shade = F.floor(F.lit(255.0) * F.greatest(ndotl / F.sqrt(F.lit(1.0) + t2), F.lit(0.0)))

    slope_class = F.lit(0)
    for k, deg in enumerate(slope_breaks_deg):
        slope_class = F.when(t2 >= F.lit(math.tan(math.radians(deg)) ** 2), F.lit(k + 1)).otherwise(slope_class)

    fx, fy = -dzdx, -dzdy  # steepest descent, (east, north)
    tan225 = math.tan(math.radians(22.5))
    octant = (
        F.when((F.col("gx_num") == 0) & (F.col("gy_num") == 0), F.lit(-1))
        .when((fy > 0) & (F.abs(fx) <= F.lit(tan225) * fy), F.lit(0))       # N
        .when((fy < 0) & (F.abs(fx) <= F.lit(tan225) * -fy), F.lit(4))      # S
        .when((fx > 0) & (F.abs(fy) <= F.lit(tan225) * fx), F.lit(2))       # E
        .when((fx < 0) & (F.abs(fy) <= F.lit(tan225) * -fx), F.lit(6))      # W
        .when((fx > 0) & (fy > 0), F.lit(1))                                 # NE
        .when((fx > 0) & (fy < 0), F.lit(3))                                 # SE
        .when((fx < 0) & (fy < 0), F.lit(5))                                 # SW
        .otherwise(F.lit(7))                                                 # NW
    )
    return gpx.select(
        "raster_id", "band", "gx", "gy", "gx_num", "gy_num",
        shade.cast("long").alias("hillshade"),
        slope_class.cast("int").alias("slope_class"),
        octant.cast("int").alias("aspect_octant"),
    )


_RUG_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tris", T.ArrayType(T.LongType())),
        T.StructField("tpis", T.ArrayType(T.LongType())),
        T.StructField("roughs", T.ArrayType(T.LongType())),
        T.StructField("idxs", T.ArrayType(T.IntegerType())),
    ]
)


def ruggedness_pixels(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """gdaldem TRI / TPI / roughness in one pass over the tiled raster ->
    (raster_id, band, gx, gy, tri_num, tpi_num, roughness, tri, tpi).

    Integer-exact by construction (same contract as the Horn gradients):

        tri_num   = sum_{8 neighbors} |n - c|        (Wilson TRI numerator)
        tpi_num   = 8*c - sum_{8 neighbors} n        (TPI numerator)
        roughness = max(3x3 window) - min(3x3 window)

    are exact int64 for integer-valued rasters; tri = tri_num / 8.0 and
    tpi = tpi_num / 8.0 divide an exactly-representable integer by a power
    of two — correctly rounded IEEE, so the DuckDB neighbor-join oracle
    hash-matches bit-for-bit. Edge semantics match gdaldem's default: a
    pixel is emitted only when its full 3x3 window is in-raster and
    nodata-free.

    Plan: halo_exchange(radius=1) (shuffle ∝ tile perimeter) -> groupBy
    applyInPandas running the stencil as 8 whole-array shifts -> native
    posexplode to pixel rows. No reference analog (reference raster ops
    stop at zonal/mosaic, `lib/zonal.py`)."""
    halos = halo_exchange(tiles, radius=1)

    def stats(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, 1)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _RUG_T.fields])
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        v = np.where(valid, pad, 0.0)

        def sub(dy, dx):
            return v[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

        def ok(dy, dx):
            return valid[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

        center = sub(0, 0)
        full = ok(0, 0).copy()
        tri = np.zeros((h, w))
        nsum = np.zeros((h, w))
        mx, mn = center.copy(), center.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                full &= ok(dy, dx)
                if (dy, dx) == (0, 0):
                    continue
                n = sub(dy, dx)
                tri += np.abs(n - center)
                nsum += n
                np.maximum(mx, n, out=mx)
                np.minimum(mn, n, out=mn)
        idxs = np.flatnonzero(full.ravel())
        if len(idxs) == 0:
            return pd.DataFrame(columns=[f.name for f in _RUG_T.fields])
        tri_num = tri.astype(np.int64).ravel()[idxs]
        tpi_num = (8 * center - nsum).astype(np.int64).ravel()[idxs]
        rough = (mx - mn).astype(np.int64).ravel()[idxs]
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), int(c.tile_x), int(c.tile_y), w,
                    tri_num.tolist(), tpi_num.tolist(), rough.tolist(),
                    idxs.astype(np.int32).tolist(),
                )
            ],
            columns=[f.name for f in _RUG_T.fields],
        )

    t = grouped_tile_apply(halos, stats, _RUG_T)
    return t.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.explode(F.arrays_zip("idxs", "tris", "tpis", "roughs")).alias("z"),
    ).select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * tile_size + F.col("z.idxs") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("z.idxs") / F.col("tile_w")).cast("long")).alias("gy"),
        F.col("z.tris").alias("tri_num"),
        F.col("z.tpis").alias("tpi_num"),
        F.col("z.roughs").alias("roughness"),
        (F.col("z.tris") / F.lit(8.0)).alias("tri"),
        (F.col("z.tpis") / F.lit(8.0)).alias("tpi"),
    )


def ruggedness_oracle_sql(tiles_rel: str, tile_size: int = 32) -> str:
    """The DuckDB oracle for :func:`ruggedness_pixels`: the same 3x3
    neighbor self-join as the hillshade oracle, aggregating |n-c| sums,
    the TPI numerator, and the window min/max (HAVING count(*) = 9
    enforces the full-window edge semantics)."""
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
),
valid AS (SELECT * FROM px WHERE v != nodata),
w AS (
  SELECT a.raster_id, a.band, a.gx, a.gy,
         CAST(sum(abs(b.v - a.v)) AS BIGINT) AS tri_num,
         CAST(9 * any_value(a.v) - sum(b.v) AS BIGINT) AS tpi_num,
         CAST(max(b.v) - min(b.v) AS BIGINT) AS roughness
  FROM valid a
  JOIN valid b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx BETWEEN a.gx - 1 AND a.gx + 1
   AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
  GROUP BY 1, 2, 3, 4
  HAVING count(*) = 9
)
SELECT raster_id, band, gx, gy, tri_num, tpi_num, roughness,
       tri_num / 8.0 AS tri, tpi_num / 8.0 AS tpi
FROM w
"""


def slope_pixels(
    tiles: DataFrame,
    z_factor: float = 1.0,
    tile_size: int = 32,
) -> DataFrame:
    """gdaldem slope ``-p`` (percent) analog -> (raster_id, band, gx, gy,
    slope_pct) with slope_pct = 100 * sqrt(dzdx^2 + dzdy^2) over the Horn
    gradient. Percent form ONLY, deliberately: it is sqrt/mul/div of
    exactly-derived doubles (all correctly-rounded IEEE, so the DuckDB
    oracle hash-matches); the degree form needs atan, whose last-ulp libm
    rounding Spark and DuckDB do not pin — callers wanting degrees apply
    ``degrees(atan(slope_pct / 100))`` themselves with that caveat. Same
    halo-exchange plan and edge semantics as :func:`hillshade_pixels`."""
    gpx = horn_gradient_pixels(tiles, tile_size=tile_size)
    dzdx = F.col("gx_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_x"))
    dzdy = -F.col("gy_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_y"))
    t2 = dzdx * dzdx + dzdy * dzdy
    return gpx.select(
        "raster_id", "band", "gx", "gy",
        (F.lit(100.0) * F.sqrt(t2)).alias("slope_pct"),
    )


def _horn_grad_cte(tiles_rel: str, z_factor: float, tile_size: int) -> str:
    """Shared DuckDB CTE: tiled raster -> per-pixel Horn numerators and
    dzdx/dzdy (weighted 3x3 neighbor self-join; HAVING count(*) = 9
    enforces the full-window edge semantics). Used by the hillshade and
    slope oracles so both stay in lockstep with the engine expressions."""
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata, px_x, abs(px_y) AS px_y,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, nodata, px_x, px_y, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
),
valid AS (SELECT * FROM px WHERE v != nodata),
grad AS (
  SELECT a.raster_id, a.band, a.gx, a.gy,
         any_value(a.px_x) AS px_x, any_value(a.px_y) AS px_y,
         CAST(sum(b.v * CASE b.gx - a.gx WHEN 1 THEN (CASE b.gy - a.gy WHEN 0 THEN 2 ELSE 1 END)
                                         WHEN -1 THEN -(CASE b.gy - a.gy WHEN 0 THEN 2 ELSE 1 END)
                                         ELSE 0 END) AS BIGINT) AS gx_num,
         CAST(sum(b.v * CASE b.gy - a.gy WHEN 1 THEN (CASE b.gx - a.gx WHEN 0 THEN 2 ELSE 1 END)
                                         WHEN -1 THEN -(CASE b.gx - a.gx WHEN 0 THEN 2 ELSE 1 END)
                                         ELSE 0 END) AS BIGINT) AS gy_num
  FROM valid a
  JOIN valid b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx BETWEEN a.gx - 1 AND a.gx + 1
   AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
  GROUP BY 1, 2, 3, 4
  HAVING count(*) = 9
),
d AS (
  SELECT raster_id, band, gx, gy, gx_num, gy_num,
         gx_num * {float(z_factor)!r} / (8.0 * px_x) AS dzdx,
         -gy_num * {float(z_factor)!r} / (8.0 * px_y) AS dzdy
  FROM grad
)"""


def hillshade_oracle_sql(
    tiles_rel: str,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    slope_breaks_deg: tuple[float, ...] = (5.0, 15.0, 30.0, 45.0),
    tile_size: int = 32,
) -> str:
    """The DuckDB oracle for :func:`hillshade_pixels`, generated from the
    SAME driver-side constants so engine and oracle stay in lockstep."""
    lx, ly, lz = light_vector(azimuth_deg, altitude_deg)
    tan225 = math.tan(math.radians(22.5))
    cls = "0"
    for k, deg in enumerate(slope_breaks_deg):
        t = math.tan(math.radians(deg)) ** 2
        cls = f"CASE WHEN t2 >= {t!r} THEN {k + 1} ELSE {cls} END"
    return f"""{_horn_grad_cte(tiles_rel, z_factor, tile_size)},
s AS (
  SELECT *, dzdx * dzdx + dzdy * dzdy AS t2,
         {lz!r} - {lx!r} * dzdx - {ly!r} * dzdy AS ndotl
  FROM d
)
SELECT raster_id, band, gx, gy, gx_num, gy_num,
       CAST(floor(255.0 * greatest(ndotl / sqrt(1.0 + t2), 0.0)) AS BIGINT) AS hillshade,
       CAST({cls} AS INT) AS slope_class,
       CAST(CASE
         WHEN gx_num = 0 AND gy_num = 0 THEN -1
         WHEN -dzdy > 0 AND abs(-dzdx) <= {tan225!r} * (-dzdy) THEN 0
         WHEN -dzdy < 0 AND abs(-dzdx) <= {tan225!r} * -(-dzdy) THEN 4
         WHEN -dzdx > 0 AND abs(-dzdy) <= {tan225!r} * (-dzdx) THEN 2
         WHEN -dzdx < 0 AND abs(-dzdy) <= {tan225!r} * -(-dzdx) THEN 6
         WHEN -dzdx > 0 AND -dzdy > 0 THEN 1
         WHEN -dzdx > 0 AND -dzdy < 0 THEN 3
         WHEN -dzdx < 0 AND -dzdy < 0 THEN 5
         ELSE 7
       END AS INT) AS aspect_octant
FROM s
"""


def slope_oracle_sql(
    tiles_rel: str,
    z_factor: float = 1.0,
    tile_size: int = 32,
) -> str:
    """The DuckDB oracle for :func:`slope_pixels` — same Horn CTE, final
    expression 100 * sqrt(dzdx^2 + dzdy^2) (identical expression shape)."""
    return f"""{_horn_grad_cte(tiles_rel, z_factor, tile_size)}
SELECT raster_id, band, gx, gy,
       100.0 * sqrt(dzdx * dzdx + dzdy * dzdy) AS slope_pct
FROM d
"""


def aspect_pixels(
    tiles: DataFrame,
    z_factor: float = 1.0,
    tile_size: int = 32,
    flat_value: float = -1.0,
) -> DataFrame:
    """gdaldem aspect analog -> (raster_id, band, gx, gy, aspect_deg):
    compass azimuth of steepest DESCENT in degrees clockwise from north
    (0 = N, 90 = E), ``flat_value`` where the Horn gradient is exactly
    zero. Engine-surface convenience WITHOUT a hash gate: the atan2 last
    ulp is not pinned across engines (the documented slope/hillshade
    caveat — gates use the exact octant form `aspect_octant` instead);
    pytest covers it against numpy within 1e-9 deg. Same halo-exchange
    plan and full-3x3-window edge semantics as :func:`slope_pixels`."""
    gpx = horn_gradient_pixels(tiles, tile_size=tile_size)
    dzdx = F.col("gx_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_x"))
    dzdy = -F.col("gy_num") * F.lit(float(z_factor)) / (F.lit(8.0) * F.col("px_y"))
    fx, fy = -dzdx, -dzdy  # steepest descent (east, north)
    deg = F.atan2(fx, fy) * F.lit(180.0 / math.pi)
    az = F.when(deg < 0, deg + F.lit(360.0)).otherwise(deg)
    return gpx.select(
        "raster_id", "band", "gx", "gy",
        F.when(
            (F.col("gx_num") == 0) & (F.col("gy_num") == 0),
            F.lit(float(flat_value)),
        ).otherwise(az).alias("aspect_deg"),
    )
