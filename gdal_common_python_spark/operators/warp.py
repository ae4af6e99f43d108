"""Raster warp — SRS-to-SRS raster reprojection (the gdalwarp analog the
reference reaches through GDAL; its own grid math is broken — see
operators/resample.py header — so semantics here are engine-defined).

Nearest-neighbour inverse-mapping warp: every TARGET pixel center
(in the destination SRS) is inverse-projected into the SOURCE SRS and
sampled with a floor pixel rule. Supported SRS pairs are the closed-form
subset of kernels/proj.py: {4326, 4269} <-> 3857 and identity. 3310
(Albers) is excluded — its inverse is iterative, not expressible as one
IEEE expression tree on both engines.

Bit-stability across libm implementations (numpy vs DuckDB) is pinned by
QUANTIZATION, the repo's centroid/track discipline: the inverse-projected
lon/lat and the source grid parameters are quantized to 1e-9 degrees
(floor(v * 1e9 + 0.5), exact in float64 up to 2^53) BEFORE the index rule

    sx = floor((qlon - q_origin_x) / q_px)

so a <= few-ulp transcendental disagreement between engines can flip a
pixel only if the quantized coordinate ALSO lands exactly on a pixel
boundary multiple — a double coincidence with probability ~1e-9 per pixel
instead of ~1e-5. Both engines evaluate the identical formula tree:
lon = degrees(x / R); lat = degrees(2*atan(exp(y / R)) - pi/2).

Distributed plan (the resample/zonal shape): enumerate target tiles
natively, inverse-project each tile's world corners to a source-pixel
window IN THE PLAN (exp/atan are native Spark expressions; the closed
forms are axis-monotone so corners bound the tile), explode to overlapped
source tile coords, equi-join the source tile table, and sample per
target tile in one grouped Arrow kernel. Only overlapping source tiles
are ever shuffled — at 100 TB the join moves O(target area / tile area)
tile rows, never pixels individually.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..kernels import proj

_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)

_GEOGRAPHIC = {4326, 4269}
_Q = 1e9  # quantization: 1e-9 degrees


def _check_pair(src_srid: int, dst_srid: int) -> str:
    """Validate the SRS pair; return the dst->src inverse kind."""
    if src_srid == dst_srid or (src_srid in _GEOGRAPHIC and dst_srid in _GEOGRAPHIC):
        return "identity"
    if src_srid in _GEOGRAPHIC and dst_srid == 3857:
        return "merc_inv"  # dst meters -> src lon/lat
    if src_srid == 3857 and dst_srid in _GEOGRAPHIC:
        return "merc_fwd"  # dst lon/lat -> src meters
    raise ValueError(
        f"warp supports the closed-form pairs {{4326,4269}}<->3857, got "
        f"{src_srid}->{dst_srid} (3310/Albers inverse is iterative — out of scope)"
    )


def _inv_cols(kind: str, x: Column, y: Column) -> tuple[Column, Column]:
    """Native dst->src coordinate transform (same formula tree as numpy)."""
    R = F.lit(proj.R_MERC)
    if kind == "identity":
        return x, y
    if kind == "merc_inv":
        lon = F.degrees(x / R)
        lat = F.degrees(F.lit(2.0) * F.atan(F.exp(y / R)) - F.lit(np.pi / 2.0))
        return lon, lat
    # merc_fwd: dst is geographic, src is mercator
    mx = R * F.radians(x)
    my = R * F.log(F.tan(F.lit(np.pi / 4.0) + F.radians(y) / F.lit(2.0)))
    return mx, my


def _inv_np(kind: str, x: np.ndarray, y: np.ndarray):
    if kind == "identity":
        return x, y
    if kind == "merc_inv":
        return proj.mercator_to_lonlat(x, y)
    return proj.lonlat_to_mercator(x, y)


def _quant(v):
    return np.floor(v * _Q + 0.5)


def warp_raster(
    spark: SparkSession,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    target: dict,
    dst_srid: int,
    src_srid: int = 4326,
    tile_size: int = 32,
) -> DataFrame:
    """Warp one (raster_id, band) onto `target` (origin_x, origin_y, px_x,
    px_y, width, height — in ``dst_srid`` coordinates) -> target tile table
    (tile_x, tile_y, tile_w, tile_h, pixels)."""
    kind = _check_pair(src_srid, dst_srid)
    src = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    meta = src.select("origin_x", "origin_y", "px_x", "px_y", "width", "height", "nodata").first()
    if meta is None:
        raise ValueError(f"no tiles for {raster_id}/{band}")
    s_ox, s_oy, s_px, s_py = meta.origin_x, meta.origin_y, meta.px_x, meta.px_y
    s_w, s_h, nodata = int(meta.width), int(meta.height), float(meta.nodata)
    t_ox, t_oy = float(target["origin_x"]), float(target["origin_y"])
    t_px, t_py = float(target["px_x"]), float(target["px_y"])
    t_w, t_h = int(target["width"]), int(target["height"])
    # quantized source grid (floats holding exact integers <= 2^53)
    q_ox, q_oy = _quant(np.float64(s_ox)), _quant(np.float64(s_oy))
    q_px, q_py = _quant(np.float64(s_px)), _quant(np.float64(s_py))

    ntx = (t_w + tile_size - 1) // tile_size
    nty = (t_h + tile_size - 1) // tile_size
    tgrid = (
        spark.range(ntx).select(F.col("id").cast("int").alias("t_tx"))
        .crossJoin(spark.range(nty).select(F.col("id").cast("int").alias("t_ty")))
    )
    # target tile world bbox -> source coords (corner inverses bound the
    # tile: both closed forms are monotone per axis) -> source tile range
    x0 = F.lit(t_ox) + F.col("t_tx") * tile_size * t_px
    x1 = F.lit(t_ox) + F.least((F.col("t_tx") + 1) * F.lit(tile_size), F.lit(t_w)) * t_px
    y0 = F.lit(t_oy) + F.col("t_ty") * tile_size * t_py
    y1 = F.lit(t_oy) + F.least((F.col("t_ty") + 1) * F.lit(tile_size), F.lit(t_h)) * t_py
    lo_x, _ = _inv_cols(kind, F.least(x0, x1), F.lit(0.0))
    hi_x, _ = _inv_cols(kind, F.greatest(x0, x1), F.lit(0.0))
    _, lo_y = _inv_cols(kind, F.lit(0.0), F.least(y0, y1))
    _, hi_y = _inv_cols(kind, F.lit(0.0), F.greatest(y0, y1))
    # source pixel range (pad 1 pixel; y axis flips when s_py < 0)
    sxa = F.floor((lo_x - F.lit(s_ox)) / F.lit(s_px))
    sxb = F.floor((hi_x - F.lit(s_ox)) / F.lit(s_px))
    sya = F.floor((lo_y - F.lit(s_oy)) / F.lit(s_py))
    syb = F.floor((hi_y - F.lit(s_oy)) / F.lit(s_py))
    ts = F.lit(tile_size)
    tgrid = (
        tgrid.withColumn("stx0", F.greatest((F.least(sxa, sxb) - 1) / ts, F.lit(0)).cast("int"))
        .withColumn("stx1", F.least((F.greatest(sxa, sxb) + 1) / ts, F.floor(F.lit((s_w - 1) // tile_size))).cast("int"))
        .withColumn("sty0", F.greatest((F.least(sya, syb) - 1) / ts, F.lit(0)).cast("int"))
        .withColumn("sty1", F.least((F.greatest(sya, syb) + 1) / ts, F.floor(F.lit((s_h - 1) // tile_size))).cast("int"))
    )
    tgrid = tgrid.withColumn("stx", F.explode(F.sequence("stx0", "stx1"))).withColumn(
        "sty", F.explode(F.sequence("sty0", "sty1"))
    )
    cand = tgrid.join(
        src.select(
            F.col("tile_x").alias("stx"),
            F.col("tile_y").alias("sty"),
            "tile_w",
            "tile_h",
            "pixels",
        ),
        ["stx", "sty"],
        "left",
    )

    def kernel(key, pdf):
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, t_w - t_tx * tile_size)
        th = min(tile_size, t_h - t_ty * tile_size)
        cx = t_ox + (t_tx * tile_size + np.arange(tw) + 0.5) * t_px
        cy = t_oy + (t_ty * tile_size + np.arange(th) + 0.5) * t_py
        ix, _ = _inv_np(kind, cx, np.zeros(1))
        _, iy = _inv_np(kind, np.zeros(1), cy)
        sx = np.floor((_quant(ix) - q_ox) / q_px).astype(np.int64)
        sy = np.floor((_quant(iy) - q_oy) / q_py).astype(np.int64)
        out = np.full((th, tw), nodata)
        for row in pdf.itertuples(index=False):
            if row.pixels is None:
                continue
            gx0 = int(row.stx) * tile_size
            gy0 = int(row.sty) * tile_size
            patch = np.asarray(row.pixels, dtype=np.float64).reshape(
                int(row.tile_h), int(row.tile_w)
            )
            in_x = (sx >= gx0) & (sx < gx0 + int(row.tile_w))
            in_y = (sy >= gy0) & (sy < gy0 + int(row.tile_h))
            if not in_x.any() or not in_y.any():
                continue
            xi = np.where(in_x)[0]
            yi = np.where(in_y)[0]
            out[np.ix_(yi, xi)] = patch[np.ix_(sy[yi] - gy0, sx[xi] - gx0)]
        oob_x = (sx < 0) | (sx >= s_w)
        oob_y = (sy < 0) | (sy >= s_h)
        out[:, oob_x] = nodata
        out[oob_y, :] = nodata
        return pd.DataFrame(
            [dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, pixels=out.ravel().tolist())]
        )

    # per-partition batching (halo-family discipline): one Python
    # roundtrip per partition, not per target tile; the kernel writes
    # DISJOINT pixel regions per source tile (tiles partition the source
    # grid), so candidate-row order cannot change the output
    from .focal import grouped_tile_apply

    return grouped_tile_apply(cand, kernel, _SCHEMA, keys=("t_tx", "t_ty"))


def warp_average(
    spark: SparkSession,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    target: dict,
    dst_srid: int,
    src_srid: int = 4326,
    tile_size: int = 32,
    value_quant: float = 1e6,
) -> DataFrame:
    """gdalwarp ``-r average`` analog, FORWARD-scatter and 100% native
    codegen (zero Python, unlike the nearest kernel): every SOURCE pixel
    center forward-projects into the target SRS, lands in a target pixel
    under the same 1e-9-quantized floor index rule as :func:`warp_raster`,
    and each target pixel averages its contributors (source nodata
    excluded; target pixels with no contributor emit the source nodata).
    -> long-format rows (tile_x, tile_y, idx, value), idx 1-based within
    the target tile.

    Exactness discipline: values quantize to ``value_quant`` (floor(v*Q
    + 0.5), integer-valued doubles) so the per-pixel sum is order-free
    exact while |sum| < 2^53 (~9e9 contributors at |v| <= 1e3 — beyond
    any real downsampling factor); the average is then two
    correctly-rounded divisions, so the DuckDB oracle is bit-equal.

    Scale shape: posexplode + the projection/index expressions stay in
    ONE codegen stage with the partial aggregate — the exchange carries
    one row per (partition, distinct target pixel), i.e. shuffle ∝ the
    DOWNSAMPLED output, never source pixels. The final left join from the
    enumerated target grid (splittable range x range) restores empty
    pixels, exactly like translate's full-coverage semantics."""
    kind = _check_pair(dst_srid, src_srid)  # src coords -> dst coords
    src = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    meta = src.select("origin_x", "origin_y", "px_x", "px_y", "width", "height", "nodata").first()
    if meta is None:
        raise ValueError(f"no tiles for {raster_id}/{band}")
    s_ox, s_oy, s_px, s_py = meta.origin_x, meta.origin_y, meta.px_x, meta.px_y
    nodata = float(meta.nodata)
    t_ox, t_oy = float(target["origin_x"]), float(target["origin_y"])
    t_px, t_py = float(target["px_x"]), float(target["px_y"])
    t_w, t_h = int(target["width"]), int(target["height"])
    q_tox, q_toy = float(_quant(np.float64(t_ox))), float(_quant(np.float64(t_oy)))
    q_tpx, q_tpy = float(_quant(np.float64(t_px))), float(_quant(np.float64(t_py)))
    ts = tile_size

    px = src.select(
        "tile_x", "tile_y", "tile_w", "tile_h",
        F.posexplode("pixels").alias("i", "v"),
    )
    gx = F.col("tile_x").cast("long") * ts + F.col("i") % F.col("tile_w")
    gy = F.col("tile_y").cast("long") * ts + (F.col("i") / F.col("tile_w")).cast("long")
    wx = F.lit(s_ox) + (gx + F.lit(0.5)) * F.lit(s_px)
    wy = F.lit(s_oy) + (gy + F.lit(0.5)) * F.lit(s_py)
    dx, dy = _inv_cols(kind, wx, wy)
    tx = F.floor((F.floor(dx * F.lit(_Q) + F.lit(0.5)) - F.lit(q_tox)) / F.lit(q_tpx))
    ty = F.floor((F.floor(dy * F.lit(_Q) + F.lit(0.5)) - F.lit(q_toy)) / F.lit(q_tpy))
    vq = F.floor(F.col("v") * F.lit(value_quant) + F.lit(0.5))
    agg = (
        px.withColumn("tx", tx).withColumn("ty", ty)
        .filter(
            (F.col("v") != F.lit(nodata))
            & (F.col("tx") >= 0) & (F.col("tx") < t_w)
            & (F.col("ty") >= 0) & (F.col("ty") < t_h)
        )
        .groupBy("tx", "ty")
        .agg(F.sum(vq).alias("s"), F.count("*").alias("c"))
    )
    grid = (
        spark.range(t_w).select(F.col("id").alias("oc"))
        .crossJoin(spark.range(t_h).select(F.col("id").alias("orr")))
    )
    tw_tile = F.when(
        ((F.col("oc") / ts).cast("long") + 1) * ts <= t_w, F.lit(ts)
    ).otherwise(F.lit(t_w % ts))
    return (
        grid.join(agg, (F.col("oc") == F.col("tx")) & (F.col("orr") == F.col("ty")), "left")
        .select(
            (F.col("oc") / ts).cast("int").alias("tile_x"),
            (F.col("orr") / ts).cast("int").alias("tile_y"),
            ((F.col("orr") % ts) * tw_tile + F.col("oc") % ts + 1).cast("int").alias("idx"),
            F.coalesce(
                (F.col("s") / F.col("c")) / F.lit(value_quant), F.lit(nodata)
            ).alias("value"),
        )
    )


def _sql_fwd(kind: str) -> tuple[str, str]:
    """DuckDB expression templates (X/Y placeholders) for a coordinate
    transform of `kind` — shared by the nearest and average oracles."""
    R = proj.R_MERC
    if kind == "identity":
        return "X", "Y"
    if kind == "merc_inv":
        return (
            f"degrees(X / {R!r})",
            f"degrees(2.0 * atan(exp(Y / {R!r})) - {np.pi / 2.0!r})",
        )
    return (
        f"{R!r} * radians(X)",
        f"{R!r} * ln(tan({np.pi / 4.0!r} + radians(Y) / 2.0))",
    )


def warp_average_oracle_sql(
    tiles_rel: str,
    raster_id: str,
    band: int,
    target: dict,
    dst_srid: int,
    src_srid: int = 4326,
    tile_size: int = 32,
    value_quant: float = 1e6,
) -> str:
    """DuckDB mirror of :func:`warp_average` — verbatim formula tree,
    same quantizations, same grid enumeration."""
    kind = _check_pair(dst_srid, src_srid)
    fx, fy = _sql_fwd(kind)
    t_ox, t_oy = float(target["origin_x"]), float(target["origin_y"])
    t_px, t_py = float(target["px_x"]), float(target["px_y"])
    t_w, t_h = int(target["width"]), int(target["height"])
    q_tox = float(_quant(np.float64(t_ox)))
    q_toy = float(_quant(np.float64(t_oy)))
    q_tpx = float(_quant(np.float64(t_px)))
    q_tpy = float(_quant(np.float64(t_py)))
    ts = tile_size
    fx = fx.replace("X", "wx")
    fy = fy.replace("Y", "wy")
    return f"""
WITH meta AS (
  SELECT DISTINCT nodata
  FROM {tiles_rel} WHERE raster_id = '{raster_id}' AND band = {int(band)}
),
px AS (
  SELECT tile_x, tile_y, tile_w, nodata, origin_x, origin_y, px_x, px_y,
         generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
  FROM {tiles_rel}
  WHERE raster_id = '{raster_id}' AND band = {int(band)}
),
valid AS (SELECT * FROM px WHERE v != nodata),
w AS (
  SELECT v,
         origin_x + ((CAST(tile_x AS BIGINT) * {ts} + (idx - 1) % tile_w) + 0.5) * px_x AS wx,
         origin_y + ((CAST(tile_y AS BIGINT) * {ts} + (idx - 1) // tile_w) + 0.5) * px_y AS wy
  FROM valid
),
g AS (
  SELECT * FROM (
    SELECT floor(v * {value_quant!r} + 0.5) AS vq,
           floor((floor(({fx}) * {_Q!r} + 0.5) - {q_tox!r}) / {q_tpx!r}) AS tx,
           floor((floor(({fy}) * {_Q!r} + 0.5) - {q_toy!r}) / {q_tpy!r}) AS ty
    FROM w
  )
  WHERE tx >= 0 AND tx < {t_w} AND ty >= 0 AND ty < {t_h}
),
a AS (
  SELECT tx, ty, sum(vq) AS s, count(*) AS c
  FROM g
  GROUP BY 1, 2
),
nd AS (SELECT any_value(nodata) AS nodata FROM meta),
grid AS (
  SELECT oc, orr FROM
    (SELECT unnest(range(0, {t_w})) AS oc),
    (SELECT unnest(range(0, {t_h})) AS orr)
)
SELECT CAST(grid.oc // {ts} AS INT) AS tile_x,
       CAST(grid.orr // {ts} AS INT) AS tile_y,
       CAST((grid.orr % {ts}) * (CASE WHEN (grid.oc // {ts} + 1) * {ts} <= {t_w}
                 THEN {ts} ELSE {t_w} % {ts} END) + grid.oc % {ts} + 1 AS INT) AS idx,
       coalesce((a.s / a.c) / {value_quant!r}, nd.nodata) AS value
FROM grid
CROSS JOIN nd
LEFT JOIN a ON a.tx = grid.oc AND a.ty = grid.orr
"""


def warp_oracle_sql(
    tiles_rel: str,
    raster_id: str,
    band: int,
    target: dict,
    dst_srid: int,
    src_srid: int = 4326,
    tile_size: int = 32,
) -> str:
    """DuckDB mirror of :func:`warp_raster`, exploded per pixel:
    (tile_x, tile_y, idx, value) with idx 1-based within the target tile.
    Identical formula tree + identical 1e-9 quantization."""
    kind = _check_pair(src_srid, dst_srid)
    t_ox, t_oy = float(target["origin_x"]), float(target["origin_y"])
    t_px, t_py = float(target["px_x"]), float(target["px_y"])
    t_w, t_h = int(target["width"]), int(target["height"])
    R = proj.R_MERC
    if kind == "identity":
        inv_x, inv_y = "X", "Y"
    elif kind == "merc_inv":
        inv_x = f"degrees(X / {R!r})"
        inv_y = f"degrees(2.0 * atan(exp(Y / {R!r})) - {np.pi / 2.0!r})"
    else:
        inv_x = f"{R!r} * radians(X)"
        inv_y = f"{R!r} * ln(tan({np.pi / 4.0!r} + radians(Y) / 2.0))"
    return f"""
WITH meta AS (
  SELECT DISTINCT origin_x, origin_y, px_x, px_y, width, height, nodata
  FROM {tiles_rel} WHERE raster_id = '{raster_id}' AND band = {int(band)}
),
qmeta AS (
  SELECT *, floor(origin_x * 1e9 + 0.5) AS q_ox, floor(origin_y * 1e9 + 0.5) AS q_oy,
         floor(px_x * 1e9 + 0.5) AS q_px, floor(px_y * 1e9 + 0.5) AS q_py
  FROM meta
),
px AS (
  SELECT CAST(oc AS INT) AS oc, CAST(orr AS INT) AS orr,
         {t_ox!r} + (oc + 0.5) * {t_px!r} AS X,
         {t_oy!r} + (orr + 0.5) * {t_py!r} AS Y
  FROM (SELECT unnest(range(0, {t_w})) AS oc) oc,
       (SELECT unnest(range(0, {t_h})) AS orr) orr
),
idx AS (
  SELECT oc, orr,
         floor((floor(({inv_x}) * 1e9 + 0.5) - m.q_ox) / m.q_px) AS sx,
         floor((floor(({inv_y}) * 1e9 + 0.5) - m.q_oy) / m.q_py) AS sy,
         m.width AS s_w, m.height AS s_h, m.nodata AS nodata
  FROM px, qmeta m
)
SELECT CAST(i.oc // {tile_size} AS INT) AS tile_x,
       CAST(i.orr // {tile_size} AS INT) AS tile_y,
       CAST((i.orr % {tile_size}) * (CASE WHEN (i.oc // {tile_size} + 1) * {tile_size} <= {t_w}
                 THEN {tile_size} ELSE {t_w} % {tile_size} END) + (i.oc % {tile_size}) + 1 AS INT) AS idx,
       CASE WHEN i.sx >= 0 AND i.sx < i.s_w AND i.sy >= 0 AND i.sy < i.s_h
            THEN coalesce(t.pixels[CAST((i.sy - t.tile_y * {tile_size}) * t.tile_w
                                        + (i.sx - t.tile_x * {tile_size}) + 1 AS INT)], i.nodata)
            ELSE i.nodata END AS value
FROM idx i
LEFT JOIN {tiles_rel} t
  ON t.raster_id = '{raster_id}' AND t.band = {int(band)}
 AND t.tile_x = CAST(floor(i.sx / {tile_size}) AS INT)
 AND t.tile_y = CAST(floor(i.sy / {tile_size}) AS INT)
"""
