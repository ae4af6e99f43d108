"""Zonal statistics (A5/A6 + R3/R4/R6) as a distributed plan — SURVEY §2.6.

Reference lifecycle (lib/zonal.py:11-172): per feature, snap a window (R2),
rasterize a mask (R3), collect masked pixels per raster (R4), then compute
MIN/MAX/MEAN/MEDIAN/VARIANCE/STDEV/PERC90 over the COMBINED pixel pool with
per-raster counts (lib/zonal.py:141-162). Single-threaded, per-pixel Python.

Engine plan (two shuffles):
  1. windows = tile_assign(zones x raster entries)   [native codegen]
  2. explode windows to overlapped tile coords, equi-join raster_tiles on
     (raster_id, band, tile_x, tile_y)               [broadcast or SMJ]
  3. groupBy(zone_id).applyInPandas(kernel): per distinct grid+window the
     zone's rings are quantized ONCE and the mask is evaluated only on each
     tile's slice (mask_subwindow) — the identical-raster fast path
     (lib/zonal.py:69-89,130-137) falls out of the layout: entries sharing a
     grid share the quantized rings.
  4. zones with no window/tiles are restored with all-zero rows
     (lib/zonal.py:201-208 empty semantics) via a left anti-join union.

Two stat modes:
- ``exact_formulas`` (default): the A6 reference formulas verbatim
  (incremental mean sum(v/n), two-pass population variance) — floating-point
  faithful to the reference up to summation order.
- ``hash_safe``: identical values computed from exact integer moments
  (sum, sum of squares are exact in float64 for integral pixel values), so
  the result is bit-reproducible across engines — used by the driver
  correctness gate where the DuckDB oracle computes the same expressions.

Output is long-format counts plus per-zone stats; the reference's wide
``count_i`` columns (lib/zonal.py:156-157) are a pivot away (see
``counts_wide``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels import geom, proj, raster as rk
from .tile_assign import tile_assign

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("count_total", T.LongType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("median", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("stdev", T.DoubleType()),
        T.StructField("perc90", T.DoubleType()),
    ]
)

_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("pixel_count", T.LongType()),
    ]
)


def window_tiles(
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    tile_size: int,
    window_broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Step 1+2: window snap then equi-join to overlapped tiles only —
    the distributed analog of the reference's windowed read
    (rasters.py:143-174): partition pruning by construction.

    The window side (zones x raster entries) broadcasts only while it is
    dimension-sized (bounded limit+count probe x entry count); at
    multi-million zones the hint is dropped and the equi-join on
    (raster_id, band, tile_x, tile_y) shuffles both sides — same rows,
    no driver-memory ceiling (the same auto-dispatch pattern as
    rings_mode)."""
    w = tile_assign(zones, rasters)
    ts = F.lit(tile_size).cast("long")
    w = (
        w.withColumn("tx0", (F.col("off_x") / ts).cast("long"))
        .withColumn("tx1", ((F.col("off_x") + F.col("res_x") - 1) / ts).cast("long"))
        .withColumn("ty0", (F.col("off_y") / ts).cast("long"))
        .withColumn("ty1", ((F.col("off_y") + F.col("res_y") - 1) / ts).cast("long"))
    )
    w = (
        w.withColumn("tile_xl", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("tile_yl", F.explode(F.sequence("ty0", "ty1")))
        .withColumn("tile_x", F.col("tile_xl").cast("int"))
        .withColumn("tile_y", F.col("tile_yl").cast("int"))
        .drop("tx0", "tx1", "ty0", "ty1", "tile_xl", "tile_yl")
    )
    t = tiles.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w", "tile_h", "pixels"
    )
    # broadcast the WINDOW side (zones x raster entries — small) so the tile
    # table, which is the 100TB-scale side, streams without a shuffle; past
    # the limit fall back to a plain equi-join (AQE picks the exchange)
    n_entries = max(rasters.select("raster_id", "band").distinct().count(), 1)
    zone_cap = window_broadcast_limit // n_entries
    if zones.limit(zone_cap + 1).count() <= zone_cap:
        w = F.broadcast(w)
    return t.join(w, ["raster_id", "band", "tile_x", "tile_y"])


_STAT_NAMES = ("min", "max", "mean", "median", "var", "stdev", "perc90")

# reference-accepted aliases (lib/zonal.py:175-201 name dispatch)
_STAT_ALIASES = {
    "minimum": "min",
    "maximum": "max",
    "average": "mean",
    "avg": "mean",
    "variance": "var",
    "stddev": "stdev",
    "std": "stdev",
}


def zonal_statistics(
    spark: SparkSession,
    zones: DataFrame,
    rasters: DataFrame,
    tiles: DataFrame,
    tile_size: int = 32,
    ignore_nodata: bool = True,
    ignore_values=None,
    statistics: list[str] | None = None,
    hash_safe: bool = False,
    rings_mode: str = "auto",
    broadcast_zone_limit: int = 500_000,
):
    """Returns (stats_df, counts_df).

    stats_df: one row per zone (all zones — empty ones zero-filled),
    restricted to the requested ``statistics`` names when given (validated
    up front like the reference's dry-run, lib/zonal.py:112-117; names from
    MIN/MAX/MEAN/MEDIAN/VAR/STDEV/PERC90, case-insensitive).
    counts_df: one row per (zone, raster entry) incl. zero rows.

    ``ignore_values``: list of pixel values to exclude, or a callable
    applied to the value ARRAY returning an exclusion mask — the
    reference's list-or-callback surface (lib/zonal.py:25-28,91-97)
    vectorized per batch instead of per pixel.

    rings_mode: 'broadcast' collects the zone rings once to a broadcast dict
    (dimension-sized zone layers — no per-row ring payload through the
    shuffle); 'join' ships rings as a joined column into the grouped kernel
    — zero driver-side zone materialization, the path for zone sides too
    large to collect. 'auto' counts the zone side and picks.
    """
    if statistics is not None:
        if not statistics:
            # reference raises on an empty selection (lib/zonal.py:112-113)
            raise ValueError("No statistics supplied")
        requested = [_STAT_ALIASES.get(s.lower(), s.lower()) for s in statistics]
        bad = [s for s in requested if s not in _STAT_NAMES]
        if bad:
            raise ValueError(
                f"unknown statistics {bad}; valid: {list(_STAT_NAMES)} "
                f"(+ aliases {sorted(_STAT_ALIASES)})"
            )
    else:
        requested = None
    # scalar -> list (reference wraps scalars, lib/zonal.py:92-96); convert
    # once here, not per tile-row in the kernel
    if ignore_values is not None and not callable(ignore_values):
        if not isinstance(ignore_values, (list, tuple, set)):
            ignore_values = [ignore_values]
        ignore_values = np.asarray(list(ignore_values), dtype=np.float64)
    if rings_mode == "auto":
        # byte-aware gate on the ring payload that would actually collect:
        # a row cap alone admits an oversized driver dict when zone rings
        # are detailed (operators.util rationale)
        from .util import broadcastable

        ring_cols = (
            zones.select("zone_id", "rings4326")
            if "rings4326" in zones.columns
            else zones.select("zone_id", "srid", "rings")
        )
        rings_mode = "broadcast" if broadcastable(ring_cols, broadcast_zone_limit) else "join"

    cand = window_tiles(zones, rasters, tiles, tile_size)
    if rings_mode == "broadcast":
        if "rings4326" in zones.columns:
            zones_pdf = zones.select("zone_id", "rings4326").toPandas()
            rect = {
                int(z): geom.rings_from_cell(r)
                for z, r in zip(zones_pdf["zone_id"], zones_pdf["rings4326"])
            }
        else:
            zones_pdf = zones.select("zone_id", "srid", "rings").toPandas()
            rect = {}
            for zid, srid, rings in zip(zones_pdf["zone_id"], zones_pdf["srid"], zones_pdf["rings"]):
                rect[int(zid)] = proj.transform_rings(geom.rings_from_cell(rings), int(srid), 4326)
        bc_rings = spark.sparkContext.broadcast({z: [r.tolist() for r in rr] for z, rr in rect.items()})

        def get_rings(pdf: pd.DataFrame):
            zid = int(pdf["zone_id"].iloc[0])
            return [np.asarray(r, dtype=np.float64) for r in bc_rings.value.get(zid, [])]

    else:
        if "rings4326" in zones.columns:
            zr = zones.select(
                "zone_id", F.col("rings4326").alias("__rings"), F.lit(4326).alias("__srid")
            )
        else:
            zr = zones.select("zone_id", F.col("rings").alias("__rings"), F.col("srid").alias("__srid"))
        cand = cand.join(zr, "zone_id")

        def get_rings(pdf: pd.DataFrame):
            rr = geom.rings_from_cell(pdf["__rings"].iloc[0])
            srid = int(pdf["__srid"].iloc[0])
            return rr if srid == 4326 else proj.transform_rings(rr, srid, 4326)

    def kernel(pdf: pd.DataFrame):
        zid = int(pdf["zone_id"].iloc[0])
        rings = get_rings(pdf)
        counts: dict[tuple, int] = {}
        values = []
        qcache: dict[tuple, np.ndarray] = {}
        for row in pdf.itertuples(index=False):
            key = (row.win_ox, row.win_oy, row.px_x, row.px_y)
            edges = qcache.get(key)
            if edges is None:
                q = rk.quantize_rings(rings, row.win_ox, row.win_oy, row.px_x, row.px_y)
                edges = geom.rings_to_edges(q)
                qcache[key] = edges
            # global tile pixel origin (nominal tile_size grid; edge tiles
            # may be smaller than tile_size but sit on the nominal grid)
            tgx = int(row.tile_x) * tile_size
            tgy = int(row.tile_y) * tile_size
            c0 = max(int(row.off_x), tgx) - int(row.off_x)
            c1 = min(int(row.off_x + row.res_x), tgx + row.tile_w) - int(row.off_x)
            r0 = max(int(row.off_y), tgy) - int(row.off_y)
            r1 = min(int(row.off_y + row.res_y), tgy + row.tile_h) - int(row.off_y)
            if c1 <= c0 or r1 <= r0:
                n_vals = 0
            else:
                m = rk.mask_subwindow(edges, c0, c1, r0, r1)
                px = np.asarray(row.pixels, dtype=np.float64).reshape(row.tile_h, row.tile_w)
                # same slice in tile-local coords
                lc0 = c0 + int(row.off_x) - tgx
                lr0 = r0 + int(row.off_y) - tgy
                sl = px[lr0 : lr0 + (r1 - r0), lc0 : lc0 + (c1 - c0)]
                vals = sl[m]
                if ignore_nodata:
                    vals = vals[vals != row.nodata]
                if ignore_values is not None:
                    if callable(ignore_values):
                        vals = vals[~np.asarray(ignore_values(vals), dtype=bool)]
                    else:
                        vals = vals[~np.isin(vals, ignore_values)]
                values.append(vals)
                n_vals = len(vals)
            k = (row.raster_id, int(row.band))
            counts[k] = counts.get(k, 0) + n_vals
        v = np.concatenate(values) if values else np.array([], dtype=np.float64)
        st = _stats_values(v, hash_safe)
        out = [
            {
                "zone_id": zid,
                "raster_id": rid,
                "band": b,
                "pixel_count": c,
                **st,
                "count_total": int(len(v)),
            }
            for (rid, b), c in counts.items()
        ]
        return pd.DataFrame(out)

    combined_schema = T.StructType(list(_COUNTS_SCHEMA.fields) + [f for f in _STATS_SCHEMA.fields if f.name != "zone_id"])
    grouped = cand.groupBy("zone_id").applyInPandas(kernel, schema=combined_schema)
    # two consumers (counts + stats) read the expensive kernel output — a
    # legit barrier; the SAME handle rides both results, so util.release()
    # belongs after BOTH are consumed (util.release docstring)
    grouped = grouped.cache()

    counts = grouped.select("zone_id", "raster_id", "band", "pixel_count")
    stats = grouped.select(
        "zone_id", "count_total", "min", "max", "mean", "median", "var", "stdev", "perc90"
    ).dropDuplicates(["zone_id"])

    # zero rows for zones with no candidates and (zone, entry) pairs with no tiles
    entries = rasters.select("raster_id", "band").distinct()
    all_pairs = zones.select("zone_id").crossJoin(F.broadcast(entries))
    counts = (
        all_pairs.join(counts, ["zone_id", "raster_id", "band"], "left")
        .select("zone_id", "raster_id", "band", F.coalesce("pixel_count", F.lit(0)).alias("pixel_count"))
    )
    zero = F.lit(0.0)
    keep = list(_STAT_NAMES) if requested is None else [s for s in _STAT_NAMES if s in requested]
    stats = (
        zones.select("zone_id")
        .join(stats, "zone_id", "left")
        .select(
            "zone_id",
            F.coalesce("count_total", F.lit(0)).alias("count_total"),
            *[F.coalesce(c, zero).alias(c) for c in keep],
        )
    )
    from .util import track_persisted

    return track_persisted(stats, grouped), track_persisted(counts, grouped)


def _stats_values(v: np.ndarray, hash_safe: bool) -> dict:
    if len(v) == 0:
        return {k: 0.0 for k in ("min", "max", "mean", "median", "var", "stdev", "perc90")}
    n = len(v)
    if hash_safe:
        s = float(np.sum(v))
        sq = float(np.sum(v * v))
        mean = s / n
        var = sq / n - mean * mean
        srt = np.sort(v)
        return {
            "min": float(srt[0]),
            "max": float(srt[-1]),
            "mean": mean,
            "median": float(srt[rk.median_index(n)]),
            "var": var,
            "stdev": var**0.5,
            "perc90": float(srt[rk.perc90_index(n)]),
        }
    return rk.stats(v)


def counts_wide(counts: DataFrame, rasters: DataFrame) -> DataFrame:
    """Reference-shaped wide counts: count_1..count_N columns ordered by
    (input_rank, band) like the rasters argument order (lib/zonal.py:156-157)."""
    order = [
        (r.raster_id, r.band)
        for r in rasters.select("raster_id", "band", "input_rank").distinct().orderBy("input_rank", "band").collect()
    ]
    out = counts.groupBy("zone_id").agg(
        F.sum("pixel_count").alias("count_total"),
        *[
            F.sum(
                F.when((F.col("raster_id") == rid) & (F.col("band") == b), F.col("pixel_count")).otherwise(0)
            ).alias(f"count_{i + 1}")
            for i, (rid, b) in enumerate(order)
        ],
    )
    return out
