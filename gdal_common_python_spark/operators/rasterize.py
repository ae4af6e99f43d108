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

Distributed shape (the re-keyed zonal plan): window snap -> overlapped-tile
equi-join (partition pruning by construction, window side broadcast while
dimension-sized) -> mapInPandas over the candidate rows: each (zone, tile)
row is masked where it sits (zero shuffle into the kernel; quantized-ring
cache per (zone, window) per task) -> pixel groupBy max. A zone covering a
continent spreads over as many tasks as it has tiles — never one task per
zone. Shuffle ∝ covered pixels + tile rows, never the full raster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

from .zonal import join_zone_rings, joined_rings_of, row_tile_mask, window_tiles

_BURN_T = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("gc", T.LongType()),
        T.StructField("gr", T.LongType()),
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
    # tile kernel so column pruning keeps the heavy column out of the
    # window join and the Arrow transfer entirely
    cand = join_zone_rings(window_tiles(zones, r1, t1, tile_size).drop("pixels"), zones)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qcache: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            rings_of = joined_rings_of(pdf)
            out_z: list[int] = []
            out_c: list[np.ndarray] = []
            out_r: list[np.ndarray] = []
            cols = [c for c in pdf.columns if not c.startswith("__")]
            for i, row in enumerate(pdf[cols].itertuples(index=False)):
                zid = int(row.zone_id)
                hit = row_tile_mask(row, rings_of(i, zid), tile_size, qcache)
                if hit is None:
                    continue
                m, c0, r0, _lc0, _lr0 = hit
                my, mx = np.nonzero(m)
                if len(mx) == 0:
                    continue
                out_z.extend([zid] * len(mx))
                out_c.append(mx.astype(np.int64) + (c0 + int(row.off_x)))
                out_r.append(my.astype(np.int64) + (r0 + int(row.off_y)))
            yield pd.DataFrame(
                {
                    "zone_id": pd.Series(out_z, dtype="int64"),
                    "gc": pd.Series(
                        np.concatenate(out_c) if out_c else [], dtype="int64"
                    ),
                    "gr": pd.Series(
                        np.concatenate(out_r) if out_r else [], dtype="int64"
                    ),
                }
            )

    covered = cand.mapInPandas(kernel, schema=_BURN_T)
    return covered.groupBy("gc", "gr").agg(F.max("zone_id").alias("burn_value"))


_VC_T = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
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
    MODE-family zonal statistics (:func:`zonal_majority`). Emitted per
    (zone, tile) by the shared mapInPandas kernel, merged by a map-side
    combined groupBy — shuffle ∝ zones × distinct values, never pixels,
    and no per-zone Python task anywhere."""
    r1 = rasters.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    t1 = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    cand = join_zone_rings(window_tiles(zones, r1, t1, tile_size), zones)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qcache: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            rings_of = joined_rings_of(pdf)
            out_z, out_v, out_c = [], [], []
            cols = [c for c in pdf.columns if not c.startswith("__")]
            for i, row in enumerate(pdf[cols].itertuples(index=False)):
                zid = int(row.zone_id)
                hit = row_tile_mask(row, rings_of(i, zid), tile_size, qcache)
                if hit is None:
                    continue
                m, _c0, _r0, lc0, lr0 = hit
                px = np.asarray(row.pixels, dtype=np.float64).reshape(
                    row.tile_h, row.tile_w
                )
                vals = px[lr0 : lr0 + m.shape[0], lc0 : lc0 + m.shape[1]][m]
                vals = vals[vals != row.nodata]
                if len(vals) == 0:
                    continue
                uv, uc = np.unique(vals, return_counts=True)
                out_z.extend([zid] * len(uv))
                out_v.extend(uv.tolist())
                out_c.extend(uc.tolist())
            yield pd.DataFrame(
                {
                    "zone_id": pd.Series(out_z, dtype="int64"),
                    "value": pd.Series(out_v, dtype="float64"),
                    "cnt": pd.Series(out_c, dtype="int64"),
                }
            )

    hist = cand.mapInPandas(kernel, schema=_VC_T)
    return hist.groupBy("zone_id", "value").agg(F.sum("cnt").alias("cnt"))


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


def zonal_percentiles(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75),
    tile_size: int = 32,
) -> DataFrame:
    """Exact zonal percentiles from the per-(zone, tile) value-count
    histogram -> (zone_id, n_valid, p25, p50, ...) with one column per
    requested fraction, named p<round(100p)>.

    Nearest-rank convention: percentile p = the value at 1-based rank
    ceil(p * n) of the zone's sorted valid pixels — the lib/zonal.py:237
    perc90 rule generalized, so every output is an actual pixel value
    (count arithmetic + value selection only; no float interpolation,
    hash-exact by construction).

    Scale shape inherits :func:`zonal_value_counts`: per-(zone, tile)
    kernel (no per-zone Python task), map-side-combined histogram merge,
    then ONE window pass over (zone, distinct value) rows — shuffle ∝
    zones x distinct values, never pixels.
    """
    ps = tuple(float(p) for p in ps)
    if not ps or any(not 0.0 < p <= 1.0 for p in ps):
        raise ValueError(f"percentile fractions must be in (0, 1], got {ps}")
    vc = zonal_value_counts(spark, zones, rasters, tiles, raster_id, band, tile_size)
    wz = (
        Window.partitionBy("zone_id")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = (
        Window.partitionBy("zone_id")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zh = vc.withColumn("n", F.sum("cnt").over(wz)).withColumn(
        "cum", F.sum("cnt").over(wo)
    )
    aggs = [F.max("n").alias("n_valid")]
    for p in ps:
        rank = F.ceil(F.col("n") * F.lit(p))
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("value"))).alias(
                f"p{round(p * 100)}"
            )
        )
    return zh.groupBy("zone_id").agg(*aggs)


_CUT_T = T.StructType(
    [
        T.StructField("gc", T.LongType()),
        T.StructField("gr", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def cutline_extract(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    tile_size: int = 32,
) -> DataFrame:
    """gdalwarp ``-cutline`` analog: crop the (raster_id, band) grid to the
    union of the zone polygons -> sparse (gc, gr, value) rows for every
    VALID pixel whose center falls inside >= 1 zone (R3 pixel-center
    even-odd membership, identical to the zonal gates); everything outside
    the cutline or nodata emits no row.

    100 TB shape: the same window-join + per-(zone, tile) mapInPandas mask
    kernel as the zonal family (no per-zone Python task, shuffle of the
    window join ∝ candidate tiles), then ONE map-side-combined
    groupBy(pixel) that dedupes pixels covered by overlapping zones
    (min(v) — the value is the same pixel's, so any combiner works). A
    disjoint cutline makes that final shuffle pure dedupe overhead;
    callers who KNOW zones are disjoint can dissolve first, but
    correctness never depends on it.
    """
    r1 = rasters.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    t1 = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    cand = join_zone_rings(window_tiles(zones, r1, t1, tile_size), zones)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qcache: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            rings_of = joined_rings_of(pdf)
            out_c, out_r, out_v = [], [], []
            cols = [c for c in pdf.columns if not c.startswith("__")]
            for i, row in enumerate(pdf[cols].itertuples(index=False)):
                zid = int(row.zone_id)
                hit = row_tile_mask(row, rings_of(i, zid), tile_size, qcache)
                if hit is None:
                    continue
                m, c0, r0, lc0, lr0 = hit
                px = np.asarray(row.pixels, dtype=np.float64).reshape(
                    row.tile_h, row.tile_w
                )
                sub = px[lr0 : lr0 + m.shape[0], lc0 : lc0 + m.shape[1]]
                my, mx = np.nonzero(m & (sub != row.nodata))
                if len(mx) == 0:
                    continue
                out_c.append(mx.astype(np.int64) + (c0 + int(row.off_x)))
                out_r.append(my.astype(np.int64) + (r0 + int(row.off_y)))
                out_v.append(sub[(my, mx)])
            yield pd.DataFrame(
                {
                    "gc": pd.Series(
                        np.concatenate(out_c) if out_c else [], dtype="int64"
                    ),
                    "gr": pd.Series(
                        np.concatenate(out_r) if out_r else [], dtype="int64"
                    ),
                    "value": pd.Series(
                        np.concatenate(out_v) if out_v else [], dtype="float64"
                    ),
                }
            )

    covered = cand.mapInPandas(kernel, schema=_CUT_T)
    return covered.groupBy("gc", "gr").agg(F.min("value").alias("value"))
