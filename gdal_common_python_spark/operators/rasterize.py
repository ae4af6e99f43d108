"""gdal_rasterize analog: burn vector zones into a raster grid.

The reference reaches rasterization through OGR/GDAL glue for zonal reads
(lib/conversionfeature.py:67-76); this exposes the same R3 pixel-center
even-odd kernel (kernels/raster.py — already oracle-matched by every zonal
gate) as a first-class burn operator:

    every pixel of the target (raster_id, band) grid whose CENTER lies
    inside a zone (even-odd, R1-quantized vertices) gets that zone's burn
    attribute; overlapping zones resolve by MAX(burn) (gdal_rasterize's
    last-layer-wins made deterministic and order-free).

Output is SPARSE: one row per covered pixel (gc, gr, burn_value) — the
dense raster is a left join + nodata coalesce away, and at 100 TB sparse
rows are the shape the next operator wants anyway.

Distributed shape (the zonal plan): window snap -> overlapped-tile
equi-join (partition pruning by construction, window side broadcast while
dimension-sized) -> per-zone grouped Arrow kernel (quantized-ring cache
per window) -> pixel groupBy max. Shuffle ∝ covered pixels + tile rows,
never the full raster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom, proj
from ..kernels import raster as rk
from .zonal import window_tiles

_BURN_T = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("gcs", T.ArrayType(T.LongType())),
        T.StructField("grs", T.ArrayType(T.LongType())),
    ]
)


def rasterize_burn(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    tile_size: int = 32,
) -> DataFrame:
    """Burn zones into the (raster_id, band) grid ->
    (gc, gr, burn_value) sparse covered-pixel rows, burn = max zone_id."""
    r1 = rasters.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    t1 = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    # the burn op never reads pixel VALUES — drop the array before the
    # grouped kernel so column pruning keeps the heavy column out of the
    # window join and the Arrow transfer entirely
    cand = window_tiles(zones, r1, t1, tile_size).drop("pixels")
    if "rings4326" in zones.columns:
        zr = zones.select(
            "zone_id", F.col("rings4326").alias("__rings"), F.lit(4326).alias("__srid")
        )
    else:
        zr = zones.select(
            "zone_id", F.col("rings").alias("__rings"), F.col("srid").alias("__srid")
        )
    cand = cand.join(zr, "zone_id")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        zid = int(pdf["zone_id"].iloc[0])
        rings = geom.rings_from_cell(pdf["__rings"].iloc[0])
        srid = int(pdf["__srid"].iloc[0])
        if srid != 4326:
            rings = proj.transform_rings(rings, srid, 4326)
        gcs: list[int] = []
        grs: list[int] = []
        qcache: dict[tuple, list] = {}
        for row in pdf.itertuples(index=False):
            key = (row.win_ox, row.win_oy, row.px_x, row.px_y)
            edges = qcache.get(key)
            if edges is None:
                q = rk.quantize_rings(rings, row.win_ox, row.win_oy, row.px_x, row.px_y)
                edges = geom.rings_to_edges(q)
                qcache[key] = edges
            tgx = int(row.tile_x) * tile_size
            tgy = int(row.tile_y) * tile_size
            c0 = max(int(row.off_x), tgx) - int(row.off_x)
            c1 = min(int(row.off_x + row.res_x), tgx + row.tile_w) - int(row.off_x)
            r0 = max(int(row.off_y), tgy) - int(row.off_y)
            r1_ = min(int(row.off_y + row.res_y), tgy + row.tile_h) - int(row.off_y)
            if c1 <= c0 or r1_ <= r0:
                continue
            m = rk.mask_subwindow(edges, c0, c1, r0, r1_)
            my, mx = np.nonzero(m)
            gcs.extend((mx + c0 + int(row.off_x)).tolist())
            grs.extend((my + r0 + int(row.off_y)).tolist())
        if not gcs:
            return pd.DataFrame(columns=[f.name for f in _BURN_T.fields])
        return pd.DataFrame([(zid, gcs, grs)], columns=[f.name for f in _BURN_T.fields])

    per_zone = cand.groupBy("zone_id").applyInPandas(kernel, schema=_BURN_T)
    return (
        per_zone.select("zone_id", F.explode(F.arrays_zip("gcs", "grs")).alias("z"))
        .select("zone_id", F.col("z.gcs").alias("gc"), F.col("z.grs").alias("gr"))
        .groupBy("gc", "gr")
        .agg(F.max("zone_id").alias("burn_value"))
    )


_VC_T = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def zonal_value_counts(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    tile_size: int = 32,
) -> DataFrame:
    """(zone_id, value, cnt) — per-zone histogram of the (raster_id, band)
    pixels whose centers fall inside the zone (same membership kernel as
    the zonal gates), nodata excluded. The value-level table behind the
    MODE-family zonal statistics (:func:`zonal_majority`). Shuffle ∝
    zones × distinct values, never pixels."""
    r1 = rasters.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    t1 = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    cand = window_tiles(zones, r1, t1, tile_size)
    if "rings4326" in zones.columns:
        zr = zones.select(
            "zone_id", F.col("rings4326").alias("__rings"), F.lit(4326).alias("__srid")
        )
    else:
        zr = zones.select(
            "zone_id", F.col("rings").alias("__rings"), F.col("srid").alias("__srid")
        )
    cand = cand.join(zr, "zone_id")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        zid = int(pdf["zone_id"].iloc[0])
        rings = geom.rings_from_cell(pdf["__rings"].iloc[0])
        srid = int(pdf["__srid"].iloc[0])
        if srid != 4326:
            rings = proj.transform_rings(rings, srid, 4326)
        counts: dict[float, int] = {}
        qcache: dict[tuple, list] = {}
        for row in pdf.itertuples(index=False):
            key = (row.win_ox, row.win_oy, row.px_x, row.px_y)
            edges = qcache.get(key)
            if edges is None:
                q = rk.quantize_rings(rings, row.win_ox, row.win_oy, row.px_x, row.px_y)
                edges = geom.rings_to_edges(q)
                qcache[key] = edges
            tgx = int(row.tile_x) * tile_size
            tgy = int(row.tile_y) * tile_size
            c0 = max(int(row.off_x), tgx) - int(row.off_x)
            c1 = min(int(row.off_x + row.res_x), tgx + row.tile_w) - int(row.off_x)
            r0 = max(int(row.off_y), tgy) - int(row.off_y)
            r1_ = min(int(row.off_y + row.res_y), tgy + row.tile_h) - int(row.off_y)
            if c1 <= c0 or r1_ <= r0:
                continue
            m = rk.mask_subwindow(edges, c0, c1, r0, r1_)
            px = np.asarray(row.pixels, dtype=np.float64).reshape(row.tile_h, row.tile_w)
            lc0 = c0 + int(row.off_x) - tgx
            lr0 = r0 + int(row.off_y) - tgy
            vals = px[lr0 : lr0 + (r1_ - r0), lc0 : lc0 + (c1 - c0)][m]
            vals = vals[vals != row.nodata]
            uv, uc = np.unique(vals, return_counts=True)
            for v, c in zip(uv, uc):
                counts[float(v)] = counts.get(float(v), 0) + int(c)
        if not counts:
            return pd.DataFrame(columns=[f.name for f in _VC_T.fields])
        ks = sorted(counts)
        return pd.DataFrame(
            [(zid, ks, [counts[k] for k in ks])],
            columns=[f.name for f in _VC_T.fields],
        )

    per_zone = cand.groupBy("zone_id").applyInPandas(kernel, schema=_VC_T)
    return per_zone.select(
        "zone_id", F.explode(F.arrays_zip("vals", "cnts")).alias("z")
    ).select("zone_id", F.col("z.vals").alias("value"), F.col("z.cnts").alias("cnt"))


def zonal_majority(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    tile_size: int = 32,
) -> DataFrame:
    """MODE-family zonal statistics (the gdal/QGIS zonal set beyond the
    reference's A6 moments): per zone with >= 1 valid pixel inside,
    (zone_id, majority, minority, variety, n_valid) — majority = the most
    frequent pixel value (ties -> smallest value), minority = the rarest
    (ties -> smallest), variety = distinct value count. Deterministic and
    order-free by construction (integer counts + struct-ordered max/min)."""
    vc = zonal_value_counts(spark, zones, rasters, tiles, raster_id, band, tile_size)
    return vc.groupBy("zone_id").agg(
        (-F.max(F.struct(F.col("cnt"), (-F.col("value")).alias("nv")))["nv"]).alias("majority"),
        F.min(F.struct(F.col("cnt"), F.col("value")))["value"].alias("minority"),
        F.count("*").alias("variety"),
        F.sum("cnt").alias("n_valid"),
    )
