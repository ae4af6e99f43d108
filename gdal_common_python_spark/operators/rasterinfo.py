"""Raster-level summaries and rendering: histogram (gdalinfo -hist analog)
and color relief (gdaldem color-relief analog), Spark-first.

No reference analog (reference raster ops stop at zonal/mosaic). Both are
100 % native Column expressions over one posexplode of the tile pixel
arrays — zero Python, zero extra shuffle beyond the histogram's single
map-side-combined aggregation. The color ramp is driver-side literals, so
the generated oracle SQL shares the identical CASE tree (the hillshade
light-literal discipline); channel rounding is floor(x + 0.5) — pure IEEE,
never an engine round() whose half-even/half-up convention could differ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def explode_pixels(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """(raster_id, band, gx, gy, v) for every non-nodata pixel — native
    posexplode, no Python."""
    return (
        tiles.select(
            "raster_id", "band", "nodata", "tile_x", "tile_y", "tile_w",
            F.posexplode("pixels").alias("idx", "v"),
        )
        .where(F.col("v") != F.col("nodata"))
        .select(
            "raster_id", "band",
            (F.col("tile_x").cast("long") * tile_size + F.col("idx") % F.col("tile_w")).alias("gx"),
            (F.col("tile_y").cast("long") * tile_size + (F.col("idx") / F.col("tile_w")).cast("long")).alias("gy"),
            "v",
        )
    )


def raster_histogram(
    tiles: DataFrame, lo: float, hi: float, n_buckets: int, tile_size: int = 32
) -> DataFrame:
    """gdalinfo -hist analog: fixed-width bucket counts per (raster, band)
    over [lo, hi) -> (raster_id, band, bucket, n). Out-of-range pixels are
    excluded (gdalinfo's -hist includes them in edge buckets only with
    explicit min/max flags; documented divergence). One map-side-combined
    groupBy — shuffle ∝ rasters × buckets, never pixels."""
    width = (float(hi) - float(lo)) / int(n_buckets)
    px = explode_pixels(tiles, tile_size)
    return (
        px.where((F.col("v") >= float(lo)) & (F.col("v") < float(hi)))
        .groupBy(
            "raster_id", "band",
            F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)).cast("int").alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )


def histogram_oracle_sql(
    tiles_rel: str, lo: float, hi: float, n_buckets: int, tile_size: int = 32
) -> str:
    width = (float(hi) - float(lo)) / int(n_buckets)
    return f"""
SELECT raster_id, band,
       CAST(floor((v - {float(lo)!r}) / {width!r}) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT raster_id, band, nodata, unnest(pixels) AS v FROM {tiles_rel}
)
WHERE v != nodata AND v >= {float(lo)!r} AND v < {float(hi)!r}
GROUP BY 1, 2, 3
"""


_CALC_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
}


def raster_calc(
    tiles: DataFrame,
    a: tuple[str, int],
    b: tuple[str, int],
    op: str = "sub",
    tile_size: int = 32,
) -> DataFrame:
    """gdal_calc analog for two same-grid bands ->
    (gx, gy, value) with NULL where either side is nodata.

    Plan: tile-key equi-join of the two band selections (co-partitioned on
    the same key at cluster scale — a tile meets exactly its twin) and one
    native `zip_with` over the pixel arrays — the whole element-wise
    arithmetic stays JVM-side; posexplode only to emit the gate's pixel
    rows (a tile-shaped writer would skip it). Same-grid is a contract
    (gdal_calc's own precondition); mixed grids compose with
    `operators.resample` first, as mosaic does."""
    if op not in _CALC_OPS:
        raise ValueError(f"op must be one of {sorted(_CALC_OPS)}, got {op!r}")
    fn = _CALC_OPS[op]

    def side(rid: str, band: int, tag: str) -> DataFrame:
        return tiles.where(
            (F.col("raster_id") == rid) & (F.col("band") == band)
        ).select(
            "tile_x", "tile_y", "tile_w",
            F.col("nodata").alias(f"nd_{tag}"),
            F.col("pixels").alias(f"px_{tag}"),
        )

    j = side(a[0], a[1], "a").join(side(b[0], b[1], "b"), ["tile_x", "tile_y", "tile_w"])
    out = j.withColumn(
        "px_o",
        F.zip_with(
            "px_a", "px_b",
            lambda x, y: F.when(
                (x == F.col("nd_a")) | (y == F.col("nd_b")), F.lit(None)
            ).otherwise(fn(x, y)),
        ),
    )
    return out.select(
        "tile_x", "tile_y", "tile_w", F.posexplode("px_o").alias("idx", "value")
    ).select(
        (F.col("tile_x").cast("long") * tile_size + F.col("idx") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("idx") / F.col("tile_w")).cast("long")).alias("gy"),
        "value",
    )


_CALC_SQL_OPS = {
    "add": "va + vb",
    "sub": "va - vb",
    "mul": "va * vb",
    "min": "least(va, vb)",
    "max": "greatest(va, vb)",
}


def raster_calc_oracle_sql(
    tiles_rel: str, a: tuple[str, int], b: tuple[str, int], op: str = "sub",
    tile_size: int = 32,
) -> str:
    expr = _CALC_SQL_OPS[op]
    px = """
  SELECT CAST(tile_x AS BIGINT) * {ts} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {ts} + (idx - 1) // tile_w AS gy,
         v, nodata
  FROM (
    SELECT tile_x, tile_y, tile_w, nodata,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {rel} WHERE raster_id = '{rid}' AND band = {band}
  )
"""
    pa = px.format(ts=tile_size, rel=tiles_rel, rid=a[0], band=a[1])
    pb = px.format(ts=tile_size, rel=tiles_rel, rid=b[0], band=b[1])
    return f"""
WITH pa AS ({pa}), pb AS ({pb})
SELECT pa.gx, pa.gy,
       CASE WHEN pa.v = pa.nodata OR pb.v = pb.nodata THEN NULL
            ELSE {expr.replace("va", "pa.v").replace("vb", "pb.v")} END AS value
FROM pa JOIN pb ON pa.gx = pb.gx AND pa.gy = pb.gy
"""


Ramp = list[tuple[float, int, int, int]]


def _channel_expr(ramp: Ramp, ch: int):
    """Piecewise-linear color channel as a chained CASE of driver literals:
    below the first entry -> its color, above the last -> its color,
    else floor(c0 + (v - e0)/(e1 - e0) * (c1 - c0) + 0.5)."""
    v = F.col("v")
    expr = F.lit(int(ramp[-1][1 + ch]))
    for (e0, *c0), (e1, *c1) in zip(ramp[:-1], ramp[1:]):
        a, b = int(c0[ch]), int(c1[ch])
        interp = F.floor(
            F.lit(float(a))
            + (v - F.lit(float(e0))) / F.lit(float(e1) - float(e0)) * F.lit(float(b - a))
            + F.lit(0.5)
        )
        expr = F.when(v < F.lit(float(e1)), interp).otherwise(expr)
    return F.when(v <= F.lit(float(ramp[0][0])), F.lit(int(ramp[0][1 + ch]))).otherwise(expr)


def color_relief(tiles: DataFrame, ramp: Ramp, tile_size: int = 32) -> DataFrame:
    """gdaldem color-relief analog -> (raster_id, band, gx, gy, r, g, b).
    `ramp` = [(elevation, r, g, b), ...] ascending (gdaldem's color text
    file). Pure codegen projection — no shuffle at all."""
    if sorted(e for e, *_ in ramp) != [e for e, *_ in ramp]:
        raise ValueError("ramp elevations must be ascending")
    px = explode_pixels(tiles, tile_size)
    return px.select(
        "raster_id", "band", "gx", "gy",
        _channel_expr(ramp, 0).cast("long").alias("r"),
        _channel_expr(ramp, 1).cast("long").alias("g"),
        _channel_expr(ramp, 2).cast("long").alias("b"),
    )


def color_relief_oracle_sql(tiles_rel: str, ramp: Ramp, tile_size: int = 32) -> str:
    """Oracle generated from the SAME ramp literals and CASE nesting as
    :func:`_channel_expr`."""

    def channel(ch: int) -> str:
        expr = str(int(ramp[-1][1 + ch]))
        for (e0, *c0), (e1, *c1) in zip(ramp[:-1], ramp[1:]):
            a, b = int(c0[ch]), int(c1[ch])
            interp = (
                f"floor({float(a)!r} + (v - {float(e0)!r}) / {float(e1) - float(e0)!r}"
                f" * {float(b - a)!r} + 0.5)"
            )
            expr = f"CASE WHEN v < {float(e1)!r} THEN {interp} ELSE {expr} END"
        return (
            f"CAST(CASE WHEN v <= {float(ramp[0][0])!r} THEN {int(ramp[0][1 + ch])} "
            f"ELSE {expr} END AS BIGINT)"
        )

    return f"""
SELECT raster_id, band,
       CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
       CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
       {channel(0)} AS r,
       {channel(1)} AS g,
       {channel(2)} AS b
FROM (
  SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
         generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
  FROM {tiles_rel}
)
WHERE v != nodata
"""


def raster_info(tiles: DataFrame) -> DataFrame:
    """gdalinfo -stats analog: per-(raster_id, band) global statistics
    (n_valid, vmin, vmax, mean, stdev), nodata excluded.

    Exactness rides the A6 integer-raster discipline (kernels/raster.py
    stats header): pixel values are integers, so the shuffled partial sums
    of v and v*v are exact at any accumulation order (every partial stays
    an integer < 2^53); mean and population stdev are then single
    correctly-rounded divisions/sqrt on identical IEEE trees.

    100 TB shape: ONE `aggregate` HOF collapses each tile to a 5-field
    struct BEFORE the shuffle (no pixel explode — the exchange carries one
    row per tile), then a map-side-combined groupBy over rasters x bands.
    """
    zero = F.struct(
        F.lit(0.0).alias("s"),
        F.lit(0.0).alias("sq"),
        F.lit(None).cast("double").alias("mn"),
        F.lit(None).cast("double").alias("mx"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(acc, v):
        ok = v != F.col("nodata")
        return F.struct(
            (acc["s"] + F.when(ok, v).otherwise(F.lit(0.0))).alias("s"),
            (acc["sq"] + F.when(ok, v * v).otherwise(F.lit(0.0))).alias("sq"),
            F.when(ok, F.least(F.coalesce(acc["mn"], v), v)).otherwise(acc["mn"]).alias("mn"),
            F.when(ok, F.greatest(F.coalesce(acc["mx"], v), v)).otherwise(acc["mx"]).alias("mx"),
            (acc["n"] + F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long")).alias("n"),
        )

    per_tile = tiles.select(
        "raster_id", "band", F.aggregate("pixels", zero, step).alias("t")
    )
    agg = per_tile.groupBy("raster_id", "band").agg(
        F.sum(F.col("t.n")).alias("n_valid"),
        F.min(F.col("t.mn")).alias("vmin"),
        F.max(F.col("t.mx")).alias("vmax"),
        F.sum(F.col("t.s")).alias("s"),
        F.sum(F.col("t.sq")).alias("sq"),
    )
    mean = F.col("s") / F.col("n_valid")
    var = F.col("sq") / F.col("n_valid") - mean * mean
    return agg.select(
        "raster_id", "band", "n_valid", "vmin", "vmax",
        F.when(F.col("n_valid") > 0, mean).otherwise(F.lit(0.0)).alias("mean"),
        F.when(F.col("n_valid") > 0, F.sqrt(var)).otherwise(F.lit(0.0)).alias("stdev"),
    )


def raster_minmax(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """gdalinfo ``-mm`` + locations: per (raster_id, band) the min and max
    VALID pixel value with their global pixel coordinates, tie rule pinned
    by lexicographic struct ordering on (v, gy, gx): the min reports its
    FIRST row-major occurrence, the max its LAST — deterministic under any
    partitioning, no window, no second scan.

    100 TB shape: posexplode + one map-side-combined groupBy — the
    partial struct-min/max collapse per input partition before the
    exchange, so the shuffle carries one row per (partition, raster,
    band), never pixels."""
    ts = tile_size
    px = tiles.select(
        "raster_id", "band", "nodata", "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("i", "v"),
    ).filter(F.col("v") != F.col("nodata"))
    gx = F.col("tile_x").cast("long") * ts + F.col("i") % F.col("tile_w")
    gy = F.col("tile_y").cast("long") * ts + (F.col("i") / F.col("tile_w")).cast("long")
    s = F.struct(F.col("v"), gy.alias("gy"), gx.alias("gx"))
    agg = px.groupBy("raster_id", "band").agg(
        F.count("*").alias("n_valid"),
        F.min(s).alias("mn"),
        F.max(s).alias("mx"),
    )
    return agg.select(
        "raster_id", "band", "n_valid",
        F.col("mn.v").alias("vmin"),
        F.col("mn.gx").alias("min_gx"), F.col("mn.gy").alias("min_gy"),
        F.col("mx.v").alias("vmax"),
        F.col("mx.gx").alias("max_gx"), F.col("mx.gy").alias("max_gy"),
    )


def raster_minmax_oracle_sql(tiles_rel: str, tile_size: int = 32) -> str:
    """DuckDB mirror of :func:`raster_minmax` — identical struct ordering
    (struct_pack preserves field order, comparison is lexicographic)."""
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
         generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
  FROM {tiles_rel}
),
valid AS (SELECT * FROM px WHERE v != nodata),
g AS (
  SELECT raster_id, band,
         struct_pack(v := v,
                     gy := CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w,
                     gx := CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w) AS s
  FROM valid
),
a AS (
  SELECT raster_id, band, count(*) AS n_valid, min(s) AS mn, max(s) AS mx
  FROM g GROUP BY 1, 2
)
SELECT raster_id, band, n_valid,
       mn.v AS vmin, mn.gx AS min_gx, mn.gy AS min_gy,
       mx.v AS vmax, mx.gx AS max_gx, mx.gy AS max_gy
FROM a
"""


def raster_info_oracle_sql(tiles_rel: str) -> str:
    """DuckDB mirror of :func:`raster_info` — identical moment tree."""
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata, unnest(pixels) AS v FROM {tiles_rel}
),
agg AS (
  SELECT raster_id, band,
         CAST(count(*) FILTER (v != nodata) AS BIGINT) AS n_valid,
         min(v) FILTER (v != nodata) AS vmin,
         max(v) FILTER (v != nodata) AS vmax,
         sum(v) FILTER (v != nodata) AS s,
         sum(v * v) FILTER (v != nodata) AS sq
  FROM px GROUP BY raster_id, band
)
SELECT raster_id, band, n_valid, vmin, vmax,
       CASE WHEN n_valid > 0 THEN s / n_valid ELSE 0.0 END AS mean,
       CASE WHEN n_valid > 0
            THEN sqrt(sq / n_valid - (s / n_valid) * (s / n_valid))
            ELSE 0.0 END AS stdev
FROM agg
"""


def compare_rasters(
    tiles: DataFrame,
    a: tuple[str, int],
    b: tuple[str, int],
) -> DataFrame:
    """gdalcompare analog: pixel-level comparison of two same-grid
    (raster_id, band) entries -> ONE row (n_pixels, n_diff, n_nodata_mismatch,
    max_abs_diff):

    - n_diff counts pixels whose stored values differ at all;
    - n_nodata_mismatch counts pixels nodata on exactly one side;
    - max_abs_diff is over both-valid pixels (0.0 when none differ).

    Pure codegen: ONE tile-key equi-join (both sides pruned to their
    entry), per-tile fold via a single zip_with + aggregate HOF (the
    exchange carries one 4-field struct per tile), then a global
    aggregate. Exact for the integer-raster discipline (max over exact
    values; counts are counts)."""
    ta = tiles.filter(
        (F.col("raster_id") == a[0]) & (F.col("band") == int(a[1]))
    ).select("tile_x", "tile_y", F.col("nodata").alias("nd_a"), F.col("pixels").alias("pa"))
    tb = tiles.filter(
        (F.col("raster_id") == b[0]) & (F.col("band") == int(b[1]))
    ).select("tile_x", "tile_y", F.col("nodata").alias("nd_b"), F.col("pixels").alias("pb"))
    j = ta.join(tb, ["tile_x", "tile_y"])
    zero = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("d"),
        F.lit(0).cast("long").alias("m"),
        F.lit(0.0).alias("x"),
    )

    def step(acc, pair):
        va, vb = pair["va"], pair["vb"]
        a_nd = va == F.col("nd_a")
        b_nd = vb == F.col("nd_b")
        mism = a_nd != b_nd
        both = ~a_nd & ~b_nd
        diff = F.when(both, F.abs(va - vb)).otherwise(F.lit(0.0))
        return F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["d"] + F.when(va != vb, 1).otherwise(0).cast("long")).alias("d"),
            (acc["m"] + F.when(mism, 1).otherwise(0).cast("long")).alias("m"),
            F.greatest(acc["x"], diff).alias("x"),
        )

    per_tile = j.select(
        F.aggregate(
            F.zip_with("pa", "pb", lambda x, y: F.struct(x.alias("va"), y.alias("vb"))),
            zero,
            step,
        ).alias("t")
    )
    # coalesce: two entries sharing no tile keys must yield the same
    # zero-row as the oracle's coalesce over an empty join, not NULLs
    return per_tile.agg(
        F.coalesce(F.sum(F.col("t.n")), F.lit(0).cast("long")).alias("n_pixels"),
        F.coalesce(F.sum(F.col("t.d")), F.lit(0).cast("long")).alias("n_diff"),
        F.coalesce(F.sum(F.col("t.m")), F.lit(0).cast("long")).alias("n_nodata_mismatch"),
        F.coalesce(F.max(F.col("t.x")), F.lit(0.0)).alias("max_abs_diff"),
    )


def compare_rasters_oracle_sql(
    tiles_rel: str, a: tuple[str, int], b: tuple[str, int]
) -> str:
    """DuckDB mirror of :func:`compare_rasters`."""
    return f"""
WITH pa AS (
  SELECT tile_x, tile_y, nodata AS nd_a,
         generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS va
  FROM {tiles_rel} WHERE raster_id = '{a[0]}' AND band = {int(a[1])}
),
pb AS (
  SELECT tile_x, tile_y, nodata AS nd_b,
         generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS vb
  FROM {tiles_rel} WHERE raster_id = '{b[0]}' AND band = {int(b[1])}
),
j AS (SELECT * FROM pa JOIN pb USING (tile_x, tile_y, idx))
SELECT CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(count(*) FILTER (va != vb) AS BIGINT) AS n_diff,
       CAST(count(*) FILTER ((va = nd_a) != (vb = nd_b)) AS BIGINT) AS n_nodata_mismatch,
       coalesce(max(CASE WHEN va != nd_a AND vb != nd_b THEN abs(va - vb) END), 0.0)
         AS max_abs_diff
FROM j
"""


def raster_to_xyz(
    tiles: DataFrame,
    raster_id: str,
    band: int,
    skip_nodata: bool = True,
    tile_size: int = 32,
) -> DataFrame:
    """gdal2xyz analog: one row per pixel (gx, gy, x, y, value) with
    world coordinates at pixel CENTERS. Pure codegen (posexplode +
    arithmetic); ``skip_nodata`` mirrors gdal2xyz's -skipnodata.
    Shuffle-free — the export is a narrow map over the tile table."""
    src = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == int(band)))
    ex = src.select(
        "nodata", "origin_x", "origin_y", "px_x", "px_y", "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("i", "value"),
    )
    gx = F.col("tile_x").cast("long") * tile_size + F.col("i") % F.col("tile_w")
    gy = F.col("tile_y").cast("long") * tile_size + (F.col("i") / F.col("tile_w")).cast("long")
    out = ex.select(
        gx.alias("gx"),
        gy.alias("gy"),
        (F.col("origin_x") + (gx + F.lit(0.5)) * F.col("px_x")).alias("x"),
        (F.col("origin_y") + (gy + F.lit(0.5)) * F.col("px_y")).alias("y"),
        "value",
        "nodata",
    )
    if skip_nodata:
        out = out.where(F.col("value") != F.col("nodata"))
    return out.drop("nodata")


def raster_to_xyz_oracle_sql(
    tiles_rel: str, raster_id: str, band: int, skip_nodata: bool = True, tile_size: int = 32
) -> str:
    nd = "WHERE v != nodata" if skip_nodata else ""
    return f"""
WITH px AS (
  SELECT nodata, origin_x, origin_y, px_x, px_y,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT nodata, origin_x, origin_y, px_x, px_y, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
    WHERE raster_id = '{raster_id}' AND band = {int(band)}
  )
)
SELECT gx, gy,
       origin_x + (gx + 0.5) * px_x AS x,
       origin_y + (gy + 0.5) * px_y AS y,
       v AS value
FROM px {nd}
"""


def slippy_tiles(
    rasters: DataFrame,
    zoom: int,
) -> DataFrame:
    """gdal2tiles analog (the tile-scheme assignment step): for every
    raster entry, the XYZ/slippy-map tile range its extent covers at
    ``zoom`` — (raster_id, band, zoom, tx0, ty0, tx1, ty1, n_tiles).
    Standard Web-Mercator scheme: tx = floor((lon+180)/360 * 2^z),
    ty = floor((1 - ln(tan(lat) + sec(lat)) / pi) / 2 * 2^z), identical
    IEEE trees both engines (rasters carry 4326 extents). Pure codegen."""
    n = float(1 << int(zoom))

    def tx(lon):
        return F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")

    def ty(lat):
        rad = F.radians(lat)
        return F.floor(
            (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(np.pi))
            / F.lit(2.0)
            * F.lit(n)
        ).cast("long")

    lon0 = F.col("origin_x")
    lon1 = F.col("origin_x") + F.col("width") * F.col("px_x")
    lat0 = F.col("origin_y")  # north edge (px_y < 0)
    lat1 = F.col("origin_y") + F.col("height") * F.col("px_y")
    # clamp the east/south EDGES inward by half a pixel so an extent ending
    # exactly on a tile boundary does not claim the next (empty) tile row
    e = lon1 - F.col("px_x") * F.lit(0.5)
    s = lat1 - F.col("px_y") * F.lit(0.5)
    out = rasters.select(
        "raster_id", "band",
        F.lit(int(zoom)).alias("zoom"),
        tx(lon0).alias("tx0"), ty(lat0).alias("ty0"),
        tx(e).alias("tx1"), ty(s).alias("ty1"),
    )
    return out.withColumn(
        "n_tiles",
        ((F.col("tx1") - F.col("tx0") + 1) * (F.col("ty1") - F.col("ty0") + 1)).cast("long"),
    )


def slippy_tiles_oracle_sql(rasters_rel: str, zoom: int) -> str:
    n = float(1 << int(zoom))
    pi = repr(np.pi)

    def tx(lon):
        return f"CAST(floor((({lon}) + 180.0) / 360.0 * {n!r}) AS BIGINT)"

    def ty(lat):
        return (
            f"CAST(floor((1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat}))) / {pi})"
            f" / 2.0 * {n!r}) AS BIGINT)"
        )

    return f"""
WITH b AS (
  SELECT raster_id, band,
         origin_x AS lon0, origin_y AS lat0,
         origin_x + width * px_x - px_x * 0.5 AS lone,
         origin_y + height * px_y - px_y * 0.5 AS lats
  FROM {rasters_rel}
)
SELECT raster_id, band, {int(zoom)} AS zoom,
       {tx('lon0')} AS tx0, {ty('lat0')} AS ty0,
       {tx('lone')} AS tx1, {ty('lats')} AS ty1,
       ({tx('lone')} - {tx('lon0')} + 1) * ({ty('lats')} - {ty('lat0')} + 1) AS n_tiles
FROM b
"""


def tile_stats(tiles: DataFrame) -> DataFrame:
    """Per-TILE statistics index (raster_id, band, tile_x, tile_y,
    n_valid, vmin, vmax) — the raster analog of parquet row-group min/max
    stats: a downstream reader (zonal with value filters, reclass, calc
    thresholds) can prune whole tiles against a value predicate before
    touching pixel arrays, exactly how the Iceberg-layout manifest prunes
    files. ZERO shuffle, zero UDF — one aggregate HOF per tile row;
    all-nodata tiles report n_valid = 0 with null bounds."""
    zero = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(None).cast("double").alias("mn"),
        F.lit(None).cast("double").alias("mx"),
    )

    def step(acc, v):
        ok = v != F.col("nodata")
        return F.struct(
            (acc["n"] + F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long")).alias("n"),
            F.when(ok, F.least(F.coalesce(acc["mn"], v), v)).otherwise(acc["mn"]).alias("mn"),
            F.when(ok, F.greatest(F.coalesce(acc["mx"], v), v)).otherwise(acc["mx"]).alias("mx"),
        )

    return tiles.select(
        "raster_id", "band", "tile_x", "tile_y",
        F.aggregate("pixels", zero, step).alias("t"),
    ).select(
        "raster_id", "band", "tile_x", "tile_y",
        F.col("t.n").alias("n_valid"),
        F.col("t.mn").alias("vmin"),
        F.col("t.mx").alias("vmax"),
    )


def tile_stats_oracle_sql(tiles_rel: str) -> str:
    return f"""
SELECT raster_id, band, tile_x, tile_y,
       CAST(count(*) FILTER (v != nodata) AS BIGINT) AS n_valid,
       min(v) FILTER (v != nodata) AS vmin,
       max(v) FILTER (v != nodata) AS vmax
FROM (
  SELECT raster_id, band, tile_x, tile_y, nodata, unnest(pixels) AS v
  FROM {tiles_rel}
)
GROUP BY raster_id, band, tile_x, tile_y
"""


def tile_index(rasters: DataFrame) -> DataFrame:
    """gdaltindex analog: one footprint record per (raster_id, band) entry
    of the raster catalog -> (raster_id, band, location, ul_x, ul_y, ur_x,
    ur_y, lr_x, lr_y, ll_x, ll_y, min_x, min_y, max_x, max_y).

    gdaltindex walks input files and writes a vector layer with each
    raster's extent polygon plus a ``location`` attribute (the path). Here
    the catalog IS the file list (the Iceberg-layout manifest), so the op
    is a pure projection: corners derive from the affine geotransform
    (origin + size x pixel size; north-up px_y < 0 handled by min/max over
    the two y edges). ZERO shuffle, zero UDF, exact IEEE arithmetic — the
    DuckDB oracle shares the identical expression tree. The ring is emitted
    as flat corner columns (ul->ur->lr->ll, gdaltindex vertex order) —
    axis-aligned footprints carry no more information than their corners.
    """
    x0 = F.col("origin_x")
    x1 = F.col("origin_x") + F.col("width") * F.col("px_x")
    y0 = F.col("origin_y")
    y1 = F.col("origin_y") + F.col("height") * F.col("px_y")
    return rasters.select(
        "raster_id", "band",
        F.concat(F.col("raster_id"), F.lit("_b"), F.col("band").cast("string"), F.lit(".tif")).alias("location"),
        x0.alias("ul_x"), y0.alias("ul_y"),
        x1.alias("ur_x"), y0.alias("ur_y"),
        x1.alias("lr_x"), y1.alias("lr_y"),
        x0.alias("ll_x"), y1.alias("ll_y"),
        F.least(x0, x1).alias("min_x"), F.least(y0, y1).alias("min_y"),
        F.greatest(x0, x1).alias("max_x"), F.greatest(y0, y1).alias("max_y"),
    )


def tile_index_oracle_sql(rasters_rel: str) -> str:
    """DuckDB mirror of :func:`tile_index` — identical affine tree."""
    return f"""
WITH b AS (
  SELECT raster_id, band,
         origin_x AS x0, origin_x + width * px_x AS x1,
         origin_y AS y0, origin_y + height * px_y AS y1
  FROM {rasters_rel}
)
SELECT raster_id, band,
       raster_id || '_b' || CAST(band AS VARCHAR) || '.tif' AS location,
       x0 AS ul_x, y0 AS ul_y, x1 AS ur_x, y0 AS ur_y,
       x1 AS lr_x, y1 AS lr_y, x0 AS ll_x, y1 AS ll_y,
       least(x0, x1) AS min_x, least(y0, y1) AS min_y,
       greatest(x0, x1) AS max_x, greatest(y0, y1) AS max_y
FROM b
"""


_FP_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("min_gx", T.LongType()),
        T.StructField("min_gy", T.LongType()),
        T.StructField("max_gx", T.LongType()),
        T.StructField("max_gy", T.LongType()),
        T.StructField("n_boundary", T.LongType()),
        T.StructField("n_pairs", T.LongType()),
    ]
)


def footprint(tiles: DataFrame, tile_size: int = 32) -> DataFrame:
    """gdal_footprint analog — exact valid-data footprint summary per
    (raster_id, band): pixel count, bounding box, boundary-pixel count
    (valid pixels with any invalid/out-of-raster 4-neighbor, i.e. the
    pixels the footprint polygon's edge runs through), and the EXACT
    footprint perimeter in pixel edges, including interior holes:

        perimeter = 4 * n_valid - 2 * n_adjacent_pairs

    — every quantity is an integer sum/min/max, so the result is
    accumulation-order-free and the DuckDB neighbor-join oracle
    hash-matches bit-for-bit.

    100 TB shape: ONE halo_exchange(radius=1) pass (shuffle ∝ tile
    perimeter) -> per-tile numpy partials (each pixel owns its RIGHT and
    DOWN pair, so cross-tile pairs count exactly once via the halo) ->
    one tiny map-side-combined groupBy(raster, band). The full pixel set
    never shuffles and nothing ever materializes per-region, so a raster
    that is one giant connected blob costs the same as a shattered one
    (the recursive-closure trap a polygonize-based footprint would hit).
    """
    from .focal import halo_exchange, assemble_padded, grouped_tile_apply

    halos = halo_exchange(tiles, radius=1)

    def stats(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, 1)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _FP_T.fields])
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        core = valid[1 : 1 + h, 1 : 1 + w]
        n_valid = int(core.sum())
        if n_valid == 0:
            return pd.DataFrame(columns=[f.name for f in _FP_T.fields])
        gx0 = int(c.tile_x) * tile_size
        gy0 = int(c.tile_y) * tile_size
        ys, xs = np.nonzero(core)
        right = valid[1 : 1 + h, 2 : 2 + w]
        down = valid[2 : 2 + h, 1 : 1 + w]
        left = valid[1 : 1 + h, 0:w]
        up = valid[0:h, 1 : 1 + w]
        n_pairs = int((core & right).sum() + (core & down).sum())
        n_boundary = int((core & ~(right & down & left & up)).sum())
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), n_valid,
                    gx0 + int(xs.min()), gy0 + int(ys.min()),
                    gx0 + int(xs.max()), gy0 + int(ys.max()),
                    n_boundary, n_pairs,
                )
            ],
            columns=[f.name for f in _FP_T.fields],
        )

    t = grouped_tile_apply(halos, stats, _FP_T)
    return t.groupBy("raster_id", "band").agg(
        F.sum("n_valid").alias("n_valid"),
        F.min("min_gx").alias("min_gx"),
        F.min("min_gy").alias("min_gy"),
        F.max("max_gx").alias("max_gx"),
        F.max("max_gy").alias("max_gy"),
        F.sum("n_boundary").alias("n_boundary"),
        (F.lit(4) * F.sum("n_valid") - F.lit(2) * F.sum("n_pairs")).alias("perimeter"),
    )


def footprint_oracle_sql(tiles_rel: str, tile_size: int = 32) -> str:
    """DuckDB mirror of :func:`footprint`: valid-pixel CTE, two directed
    EQUALITY self-joins (right / down — hash-joinable, unlike a single
    OR/abs 4-neighbor predicate, which planned as a per-band quadratic
    filter join) for adjacent pairs; per-pixel degree = endpoint count
    over both pair lists, boundary = pixels with degree < 4."""
    return f"""
WITH px AS (
  SELECT raster_id, band,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy
  FROM (
    SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
  WHERE v != nodata
),
pr AS (
  SELECT a.raster_id, a.band, a.gx AS agx, a.gy AS agy, b.gx AS bgx, b.gy AS bgy
  FROM px a JOIN px b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gy = a.gy AND b.gx = a.gx + 1
),
pd AS (
  SELECT a.raster_id, a.band, a.gx AS agx, a.gy AS agy, b.gx AS bgx, b.gy AS bgy
  FROM px a JOIN px b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx = a.gx AND b.gy = a.gy + 1
),
pairs AS (
  SELECT raster_id, band, count(*) AS n_pairs
  FROM (SELECT * FROM pr UNION ALL SELECT * FROM pd)
  GROUP BY 1, 2
),
ends AS (
  SELECT raster_id, band, agx AS gx, agy AS gy FROM pr
  UNION ALL SELECT raster_id, band, bgx, bgy FROM pr
  UNION ALL SELECT raster_id, band, agx, agy FROM pd
  UNION ALL SELECT raster_id, band, bgx, bgy FROM pd
),
deg AS (
  SELECT raster_id, band, gx, gy, count(*) AS nnb
  FROM ends GROUP BY 1, 2, 3, 4
),
interior AS (
  SELECT raster_id, band, count(*) AS n_int
  FROM deg WHERE nnb = 4 GROUP BY 1, 2
),
agg AS (
  SELECT raster_id, band, CAST(count(*) AS BIGINT) AS n_valid,
         min(gx) AS min_gx, min(gy) AS min_gy,
         max(gx) AS max_gx, max(gy) AS max_gy
  FROM px GROUP BY 1, 2
)
SELECT a.raster_id, a.band, a.n_valid, a.min_gx, a.min_gy, a.max_gx, a.max_gy,
       CAST(a.n_valid - COALESCE(i.n_int, 0) AS BIGINT) AS n_boundary,
       4 * a.n_valid - 2 * COALESCE(p.n_pairs, 0) AS perimeter
FROM agg a
LEFT JOIN pairs p ON p.raster_id = a.raster_id AND p.band = a.band
LEFT JOIN interior i ON i.raster_id = a.raster_id AND i.band = a.band
"""


def histogram_match(
    tiles: DataFrame,
    src: tuple[str, int],
    ref: tuple[str, int],
    tile_size: int = 32,
) -> DataFrame:
    """Histogram matching (imagery normalization): map each distinct SOURCE
    band value to the smallest REFERENCE band value whose CDF reaches the
    source value's CDF -> the remap table (value, matched_value, n_pixels).
    Applying the match is then a broadcast map join / `reclass`-style
    lookup over the source tiles; the remap table IS the operator output
    (value-domain-sized, never pixel-sized).

    Exactness: the pick ``min{ r : cum_ref(r) * N_src >= cum_src(v) * N_ref }``
    is a cross-multiplied INTEGER comparison — no float CDF ever forms, so
    the result is hash-exact across engines. Exact while
    ``max(cum) * N < 2^63`` (both sides under ~3e9 pixels); past that,
    quantize the cumulative counts to parts-per-1e9 first (same pick to
    1 ppb — the remap is a monotone step function either way).

    100 TB shape: two map-side-combined groupBy(v) histograms (shuffle ∝
    distinct values, never pixels), value-domain-sized window cumsums, and
    one theta-join + min over the two value dimensions. Nodata pixels are
    excluded on both sides (explode_pixels)."""
    from pyspark.sql.window import Window

    def hist(rid: str, band: int, tag: str) -> DataFrame:
        h = (
            explode_pixels(
                tiles.where(
                    (F.col("raster_id") == rid) & (F.col("band") == int(band))
                ),
                tile_size,
            )
            .groupBy(F.col("v").alias(f"{tag}_v"))
            .agg(F.count("*").alias(f"{tag}_n"))
        )
        w = Window.partitionBy(F.lit(tag)).orderBy(f"{tag}_v")
        return h.select(
            f"{tag}_v",
            f"{tag}_n",
            F.sum(f"{tag}_n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(f"{tag}_cum"),
            F.sum(f"{tag}_n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias(f"{tag}_total"),
        )

    s, r = hist(*src, "s"), hist(*ref, "r")
    return (
        s.join(
            F.broadcast(r),
            F.col("r_cum") * F.col("s_total") >= F.col("s_cum") * F.col("r_total"),
        )
        .groupBy("s_v", "s_n")
        .agg(F.min("r_v").alias("matched_value"))
        .select(
            F.col("s_v").alias("value"),
            "matched_value",
            F.col("s_n").alias("n_pixels"),
        )
    )


def histogram_match_oracle_sql(
    tiles_rel: str, src: tuple[str, int], ref: tuple[str, int]
) -> str:
    """DuckDB mirror of :func:`histogram_match` — identical histograms,
    window cumsums, and cross-multiplied integer pick."""

    def hist(rid: str, band: int) -> str:
        return f"""
  SELECT v, count(*) AS n,
         sum(count(*)) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         sum(count(*)) OVER () AS total
  FROM (SELECT unnest(pixels) AS v, nodata FROM {tiles_rel}
        WHERE raster_id = '{rid}' AND band = {int(band)})
  WHERE v != nodata
  GROUP BY v
"""

    return f"""
WITH s AS ({hist(*src)}),
r AS ({hist(*ref)})
SELECT s.v AS value, min(r.v) AS matched_value,
       CAST(s.n AS BIGINT) AS n_pixels
FROM s JOIN r ON r.cum * s.total >= s.cum * r.total
GROUP BY s.v, s.n
"""
