"""Zonal statistics (A5/A6 + R3/R4/R6) as a distributed plan — SURVEY §2.6.

Reference lifecycle (lib/zonal.py:11-172): per feature, snap a window (R2),
rasterize a mask (R3), collect masked pixels per raster (R4), then compute
MIN/MAX/MEAN/MEDIAN/VARIANCE/STDEV/PERC90 over the COMBINED pixel pool with
per-raster counts (lib/zonal.py:141-162). Single-threaded, per-pixel Python.

Engine plan (re-keyed per (zone, tile) — no per-zone task anywhere):
  1. windows = tile_assign(zones x raster entries)   [native codegen]
  2. explode windows to overlapped tile coords, equi-join raster_tiles on
     (raster_id, band, tile_x, tile_y)               [broadcast or SMJ]
  3. mapInPandas over the join output: each candidate (zone, tile) row is
     masked WHERE IT SITS (zero shuffle into the kernel; the zone's rings
     are quantized once per (zone, window) per task and the mask is
     evaluated only on the tile's slice) and emits the tile's masked VALUE
     HISTOGRAM rows (zone_id, raster_id, band, value, cnt). A
     continent-sized zone therefore spreads over as many tasks as it has
     candidate tiles — the one-task-per-zone straggler/OOM of the previous
     groupBy(zone_id).applyInPandas shape is gone, and what shuffles
     downstream is counts per distinct value, never the pixel multiset.
  4. counts: groupBy(zone, raster, band).sum(cnt)    [map-side combined]
  5. stats: merge the per-zone histogram natively (groupBy(zone, value)
     then one window pass) and read every statistic off the count
     histogram — min/max/mean/var from exact moments, median/perc90 by
     NEAREST RANK over the cumulative counts with the exact reference
     index conventions (lib/zonal.py:235,237; the same technique as
     operators/quantiles.py). No Python past step 3.
  6. zones with no window/tiles/valid pixels are restored with all-zero
     rows (lib/zonal.py:201-208 empty semantics) via a left join.

Two stat modes:
- ``exact_formulas`` (default): the A6 reference formulas re-read off the
  histogram — mean is the sum-of-(v/n) form (lib/zonal.py:213-215) summed
  in ascending-value order, variance the two-pass population form —
  floating-point faithful to the reference up to summation order (the
  previous per-zone kernel was already order-nondeterministic; this form
  is deterministic).
- ``hash_safe``: identical values computed from exact integer moments
  (sum, sum of squares are exact in float64 for integral pixel values), so
  the result is bit-reproducible across engines — used by the driver
  correctness gate where the DuckDB oracle computes the same expressions.

Output is long-format counts plus per-zone stats; the reference's wide
``count_i`` columns (lib/zonal.py:156-157) are a pivot away (see
``counts_wide``).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

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

_HIST_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
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


def join_zone_rings(cand: DataFrame, zones: DataFrame) -> DataFrame:
    """Attach the zone ring payload (``__rings``/``__srid``) to candidate
    rows — the zero-driver-materialization path shared by every re-keyed
    tile kernel (zonal stats, rasterize burn, value counts)."""
    if "rings4326" in zones.columns:
        zr = zones.select(
            "zone_id", F.col("rings4326").alias("__rings"), F.lit(4326).alias("__srid")
        )
    else:
        zr = zones.select(
            "zone_id", F.col("rings").alias("__rings"), F.col("srid").alias("__srid")
        )
    return cand.join(zr, "zone_id")


def joined_rings_of(pdf: pd.DataFrame) -> Callable:
    """Per-batch ring accessor for kernels over :func:`join_zone_rings`
    output: ``rings_of(i, zone_id)`` -> 4326 rings, cached per zone so a
    task touching many tiles of one zone parses/reprojects once."""
    cells = pdf["__rings"].tolist()
    srids = pdf["__srid"].tolist()
    cache: dict[int, list] = {}

    def rings_of(i: int, zid: int):
        rr = cache.get(zid)
        if rr is None:
            rr = geom.rings_from_cell(cells[i])
            srid = int(srids[i])
            if srid != 4326:
                rr = proj.transform_rings(rr, srid, 4326)
            cache[zid] = rr
        return rr

    return rings_of


def row_tile_mask(row, rings, tile_size: int, qcache: dict):
    """Mask ONE candidate (zone, tile) row's slice of its zone window —
    the shared geometric core of every tile kernel. Quantizes the zone's
    rings once per (zone, window) per task (``qcache``), evaluates the R3
    pixel-center even-odd mask only on the tile's sub-window.

    Returns ``None`` when the tile-window overlap is empty, else
    ``(mask, c0, r0, lc0, lr0)`` — mask over the overlap slice, (c0, r0)
    the slice origin in window coords, (lc0, lr0) in tile-local coords."""
    zid = int(row.zone_id)
    key = (zid, row.win_ox, row.win_oy, row.px_x, row.px_y)
    edges = qcache.get(key)
    if edges is None:
        q = rk.quantize_rings(rings, row.win_ox, row.win_oy, row.px_x, row.px_y)
        edges = geom.rings_to_edges(q)
        qcache[key] = edges
    # global tile pixel origin (nominal tile_size grid; edge tiles may be
    # smaller than tile_size but sit on the nominal grid)
    tgx = int(row.tile_x) * tile_size
    tgy = int(row.tile_y) * tile_size
    c0 = max(int(row.off_x), tgx) - int(row.off_x)
    c1 = min(int(row.off_x + row.res_x), tgx + row.tile_w) - int(row.off_x)
    r0 = max(int(row.off_y), tgy) - int(row.off_y)
    r1 = min(int(row.off_y + row.res_y), tgy + row.tile_h) - int(row.off_y)
    if c1 <= c0 or r1 <= r0:
        return None
    m = rk.mask_subwindow(edges, c0, c1, r0, r1)
    lc0 = c0 + int(row.off_x) - tgx
    lr0 = r0 + int(row.off_y) - tgy
    return m, c0, r0, lc0, lr0


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
    shuffle); 'join' ships rings as a joined column into the tile kernel
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

        def make_rings_of(pdf: pd.DataFrame, task_cache: dict) -> Callable:
            def rings_of(i: int, zid: int):
                rr = task_cache.get(zid)
                if rr is None:
                    rr = [np.asarray(r, dtype=np.float64) for r in bc_rings.value.get(zid, [])]
                    task_cache[zid] = rr
                return rr

            return rings_of

    else:
        cand = join_zone_rings(cand, zones)

        def make_rings_of(pdf: pd.DataFrame, task_cache: dict) -> Callable:
            return joined_rings_of(pdf)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qcache: dict[tuple, np.ndarray] = {}
        rcache: dict[int, list] = {}
        for pdf in batches:
            rings_of = make_rings_of(pdf, rcache)
            out_z, out_r, out_b, out_v, out_c = [], [], [], [], []
            cols = [c for c in pdf.columns if not c.startswith("__")]
            for i, row in enumerate(pdf[cols].itertuples(index=False)):
                zid = int(row.zone_id)
                hit = row_tile_mask(row, rings_of(i, zid), tile_size, qcache)
                if hit is None:
                    continue
                m, _c0, _r0, lc0, lr0 = hit
                px = np.asarray(row.pixels, dtype=np.float64).reshape(row.tile_h, row.tile_w)
                sl = px[lr0 : lr0 + m.shape[0], lc0 : lc0 + m.shape[1]]
                vals = sl[m]
                if ignore_nodata:
                    vals = vals[vals != row.nodata]
                if ignore_values is not None:
                    if callable(ignore_values):
                        vals = vals[~np.asarray(ignore_values(vals), dtype=bool)]
                    else:
                        vals = vals[~np.isin(vals, ignore_values)]
                if len(vals) == 0:
                    continue
                uv, uc = np.unique(vals, return_counts=True)
                out_z.extend([zid] * len(uv))
                out_r.extend([row.raster_id] * len(uv))
                out_b.extend([int(row.band)] * len(uv))
                out_v.extend(uv.tolist())
                out_c.extend(uc.tolist())
            yield pd.DataFrame(
                {
                    "zone_id": pd.Series(out_z, dtype="int64"),
                    "raster_id": pd.Series(out_r, dtype="object"),
                    "band": pd.Series(out_b, dtype="int32"),
                    "value": pd.Series(out_v, dtype="float64"),
                    "cnt": pd.Series(out_c, dtype="int64"),
                }
            )

    hist = cand.mapInPandas(kernel, schema=_HIST_SCHEMA)
    # two consumers (counts + stats) read the kernel output — a legit
    # barrier; the SAME handle rides both results, so util.release()
    # belongs after BOTH are consumed (util.release docstring)
    hist = hist.cache()

    counts = hist.groupBy("zone_id", "raster_id", "band").agg(
        F.sum("cnt").alias("pixel_count")
    )
    stats = _stats_from_histogram(hist, hash_safe)

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

    return track_persisted(stats, hist), track_persisted(counts, hist)


def _stats_from_histogram(hist: DataFrame, hash_safe: bool) -> DataFrame:
    """A6 statistics read entirely off the (zone, value, cnt) histogram —
    native plan, no Python. Median/perc90 are NEAREST RANK over the
    cumulative counts with the exact reference index conventions:

    - median 1-based rank = ((round_half_even(0.5*n) - 1 + n) mod n) + 1
      (lib/zonal.py:235 incl. the n==1 wraparound; ``F.bround`` is IEEE
      half-even on the exact binary 0.5*n, identical to the Python rule);
    - perc90 1-based rank = ceil(0.9*n) (lib/zonal.py:237).

    ``hash_safe`` reads mean/var from exact moments (sum, sum-of-squares);
    the default reads the reference's sum-of-(v/n) mean and two-pass
    population variance, summed in ascending-value order.
    """
    zh = hist.groupBy("zone_id", "value").agg(F.sum("cnt").alias("c"))
    # full-frame window ordered by value: shares ONE (zone_id, value) sort
    # with the cumulative window AND pins the float summation order
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
    zh = zh.withColumn("n", F.sum("c").over(wz)).withColumn(
        "cum", F.sum("c").over(wo)
    )
    v, c, n = F.col("value"), F.col("c"), F.col("n")
    if hash_safe:
        zh = zh.withColumn("zmean", F.sum(v * c).over(wz) / n)
        var_agg = (
            F.sum(v * v * c) / F.max("n") - F.max("zmean") * F.max("zmean")
        ).alias("var")
    else:
        zh = zh.withColumn("zmean", F.sum(v / n * c).over(wz))
        var_agg = F.sum((v - F.col("zmean")) * (v - F.col("zmean")) / n * c).alias("var")
    rank_med = ((F.bround(n * 0.5).cast("long") - 1 + n) % n) + 1
    rank_p90 = F.ceil(n * 0.9)
    out = zh.groupBy("zone_id").agg(
        F.max("n").alias("count_total"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.max("zmean").alias("mean"),
        F.min(F.when(F.col("cum") >= rank_med, v)).alias("median"),
        var_agg,
        F.min(F.when(F.col("cum") >= rank_p90, v)).alias("perc90"),
    )
    return out.select(
        "zone_id", "count_total", "min", "max", "mean", "median", "var",
        F.sqrt("var").alias("stdev"), "perc90",
    )


def _stats_values(v: np.ndarray, hash_safe: bool) -> dict:
    """Local (numpy) A6 stats kernel over a value array — the single-node
    reference for what :func:`_stats_from_histogram` computes distributed;
    kept for unit tests and small in-process use."""
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
