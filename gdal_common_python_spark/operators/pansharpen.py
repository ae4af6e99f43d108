"""gdal_pansharpen analog — weighted-Brovey pansharpening, Spark-first.

The reference wraps the GDAL utility family per feature (mosaic = gdal_merge
in lib/merge.py, windowed reads in rasters.py:143-174); pansharpening is the
remaining member of that public utility surface (gdal_pansharpen.py) with a
genuinely distributed shape, so the engine carries it with the same tile-table
model. Semantics follow the utility's weighted Brovey transform:

    pseudo_pan = w_1*ms_1 + ... + w_k*ms_k   (MS resampled onto the pan grid)
    out_i      = ms_i * pan / pseudo_pan

Distributed plan (zero driver materialization of pixels):
1. MS bands already on the pan grid pass through untouched; off-grid bands
   nearest-resample onto the pan grid with the existing R7 resample operator
   (per-target-tile Arrow kernel; source tiles pruned by construction).
2. One equi-join on (tile_x, tile_y) co-locates the pan tile with its k MS
   tiles — all sides share the pan tile grid, so the join keys are dense and
   skew-free; AQE picks broadcast vs shuffle by size.
3. The Brovey combine is pure whole-stage codegen: ``arrays_zip`` +
   ``transform`` evaluate pseudo-pan and the per-band ratio elementwise —
   no Python in the combine, no shuffle after the join.

nodata (gdal_pansharpen's all-or-nothing rule): a pixel is nodata in EVERY
output band when the pan pixel or ANY MS pixel is nodata (incl. MS pixels
that fell outside their source raster during resample), or pseudo_pan == 0.

At 100 TB the plan's shuffle volume is bounded by the resampled MS tiles
(each k-th the pan band count in practice); the pan band — the big side —
streams straight from the scan into the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .resample import resample

_GRID_KEYS = ("origin_x", "origin_y", "px_x", "px_y", "width", "height")


def pansharpen(
    spark: SparkSession,
    tiles: DataFrame,
    pan: tuple[str, int],
    ms: list[tuple[str, int]],
    weights: list[float] | None = None,
    tile_size: int = 32,
) -> DataFrame:
    """Weighted-Brovey pansharpen of ``ms`` bands against the ``pan`` band.

    tiles: the raster tile table (synth.py schema — grid meta on each row).
    pan / ms: (raster_id, band) selectors into ``tiles``.
    weights: pseudo-pan weights per MS band (default: equal 1/k).

    Returns one row per (out_band, tile_x, tile_y) on the PAN grid:
    (out_band 1..k in ``ms`` order, tile_x, tile_y, tile_w, tile_h, pixels).
    """
    if not ms:
        raise ValueError("pansharpen needs at least one multispectral band")
    if weights is None:
        weights = [1.0 / len(ms)] * len(ms)
    if len(weights) != len(ms):
        raise ValueError(f"{len(weights)} weights for {len(ms)} ms bands")

    prid, pband = pan
    psrc = tiles.filter((F.col("raster_id") == prid) & (F.col("band") == int(pband)))
    meta = psrc.select(*_GRID_KEYS, "nodata").first()
    if meta is None:
        raise ValueError(f"no tiles for pan band {prid}/{pband}")
    pgrid = {k: getattr(meta, k) for k in _GRID_KEYS}
    nodata = float(meta.nodata)

    out = psrc.select(
        "tile_x", "tile_y", "tile_w", "tile_h", F.col("pixels").alias("pan_px")
    )
    ms_cols: list[str] = []
    for i, (rid, b) in enumerate(ms):
        msrc = tiles.filter((F.col("raster_id") == rid) & (F.col("band") == int(b)))
        mmeta = msrc.select(*_GRID_KEYS).first()
        if mmeta is None:
            raise ValueError(f"no tiles for ms band {rid}/{b}")
        col = f"ms{i}"
        if all(getattr(mmeta, k) == pgrid[k] for k in _GRID_KEYS):
            # already on the pan grid: identity, no kernel
            mdf = msrc.select("tile_x", "tile_y", F.col("pixels").alias(col))
        else:
            mdf = resample(
                spark, tiles, rid, int(b), pgrid, tile_size=tile_size, method="nearest"
            ).select("tile_x", "tile_y", F.col("pixels").alias(col))
        out = out.join(mdf, ["tile_x", "tile_y"])
        ms_cols.append(col)

    zipped = F.arrays_zip(F.col("pan_px"), *[F.col(c) for c in ms_cols])
    nd = F.lit(nodata)

    def _pseudo(x) -> Column:
        # left-associated weighted sum — the oracle writes the identical
        # w0*m0 + w1*m1 + ... tree, so IEEE doubles match bit-for-bit
        e = F.lit(weights[0]) * x[ms_cols[0]]
        for w, c in zip(weights[1:], ms_cols[1:]):
            e = e + F.lit(w) * x[c]
        return e

    def _invalid(x) -> Column:
        cond = x["pan_px"] == nd
        for c in ms_cols:
            cond = cond | (x[c] == nd)
        return cond | (_pseudo(x) == F.lit(0.0))

    def _band(c: str) -> Column:
        # closure factory, NOT a default-arg lambda: F.transform inspects
        # the callable's arity, so a second parameter would receive the
        # element index instead of the captured name
        return F.transform(
            zipped,
            lambda x: F.when(_invalid(x), nd).otherwise(
                x[c] * x["pan_px"] / _pseudo(x)
            ),
        )

    band_arrays = [_band(c) for c in ms_cols]
    return out.select(
        "tile_x",
        "tile_y",
        "tile_w",
        "tile_h",
        F.posexplode(F.array(*band_arrays)).alias("b0", "pixels"),
    ).select(
        (F.col("b0") + 1).cast("int").alias("out_band"),
        "tile_x",
        "tile_y",
        "tile_w",
        "tile_h",
        "pixels",
    )
